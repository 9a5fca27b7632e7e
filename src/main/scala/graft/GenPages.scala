package graft

import org.apache.spark.sql.SparkSession
import graft.sources.WebCorpus

/** spark-submit-able generator for the deterministic synthetic web-page
  * corpus — the input of the Pipeline CLI scaling runs (north rule: same job
  * at N and 4N, so both levels must read the SAME materialized input rather
  * than regenerate it in-session).
  *
  * {{{
  * spark-submit --class graft.GenPages <classpath> \
  *   --out /tmp/scaling/pages.parquet [--n-base 100000] [--n-hosts 60] \
  *   [--dup-fraction 0.25] [--seed 42] [--raw]
  * }}}
  *
  * Default output is [[WebCorpus.linkInput]] — the linkage-ready projection
  * the flagship bench links on (page_id, title, mid3, tail3, tok1, lang,
  * n_tokens, block). `--raw` writes the `input_hint` page table instead
  * (url, warc_ts, html, text, lang) for drives that exercise extraction.
  */
object GenPages {
  def main(argv: Array[String]): Unit = {
    val raw = argv.contains("--raw") // flag (no value) — strip before pairing
    val known = Set("out", "n-base", "n-hosts", "dup-fraction", "seed")
    val m = argv.filterNot(_ == "--raw").grouped(2)
      .map {
        // a misspelled flag must fail, not silently fall back to defaults —
        // a default-sized corpus would feed the scaling runs wrong evidence
        case Array(k, v) if k.startsWith("--") && known(k.stripPrefix("--")) =>
          k.stripPrefix("--") -> v
        case other => throw new IllegalArgumentException(
          s"unrecognized or unpaired argument: ${other.mkString(" ")} " +
            s"(known: ${known.map("--" + _).mkString(", ")}, --raw)")
      }.toMap
    val out = m.getOrElse("out",
      throw new IllegalArgumentException("missing required --out"))
    val p = WebCorpus.Params(
      nBase = m.get("n-base").map(_.toLong).getOrElse(100000L),
      dupFraction = m.get("dup-fraction").map(_.toDouble).getOrElse(0.25),
      nHosts = m.get("n-hosts").map(_.toInt).getOrElse(60),
      seed = m.get("seed").map(_.toLong).getOrElse(42L))
    val builder = SparkSession.builder().appName("graft-gen-pages")
    val spark = (if (new org.apache.spark.SparkConf().contains("spark.master"))
      builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = if (raw) WebCorpus.table(spark, p) else WebCorpus.linkInput(spark, p)
    df.write.mode("overwrite").parquet(out)
    val n = spark.read.parquet(out).count()
    println(s"""{"out":"$out","rows":$n,"n_base":${p.nBase},""" +
      s""""n_hosts":${p.nHosts},"dup_fraction":${p.dupFraction},"seed":${p.seed},""" +
      s""""raw":$raw}""")
    spark.stop()
  }
}
