package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking-key construction + candidate-pair generation.
  *
  * The reference compares all |A|x|B| pairs densely
  * (`/root/reference/src/DiBitMatrix.jl`) — impossible at web scale. The
  * Spark-native replacement is deterministic blocking: pairs are generated
  * only inside blocks (equi-join on the key), with MinHash-band keys for
  * text similarity recall, explicit skew controls (block-size capping +
  * salted sub-blocks), and AQE skew-join splitting on top.
  */
object Blocking {

  /** Host extracted from a URL (no parse_url: regexp is codegen'd). */
  def host(url: Column): Column = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)

  def compositeKey(cols: Column*): Column = xxhash64(cols: _*)

  /** Token n-gram shingles of a text column (lowercased, whitespace-split). */
  def tokenShingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => length(s) > 0)
  }

  /** MinHash signature: for seed i, min over shingles of xxhash64(shingle, i). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** LSH band keys from a MinHash signature: `bands` keys, each hashing
    * `rowsPerBand` consecutive signature entries. Two texts share a band key
    * with probability ~ 1-(1-J^r)^b. Returned as an array; explode + group to
    * block on it.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Per-block sizes — the skew diagnostic feeding capping decisions. */
  def blockSizes(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("block_key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_pairs", col("n") * (col("n") - 1) / 2)

  /** Caps block size by deterministically splitting oversized blocks into
    * salted sub-blocks of <= maxSize expected rows. Bounds the largest
    * join task at the cost of missing cross-sub-block pairs inside capped
    * (pathological) blocks — the documented recall trade of every
    * at-scale blocking scheme. Rows in blocks <= maxSize keep salt 0.
    */
  def capBlocks(df: DataFrame, keyCol: String, idCol: String, maxSize: Long): DataFrame = {
    val sizes = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__bn"))
    df.join(broadcast(sizes.filter(col("__bn") > maxSize)), Seq(keyCol), "left")
      .withColumn("__salt",
        when(col("__bn").isNull, lit(0L))
          .otherwise(pmod(xxhash64(col(idCol)), ceil(col("__bn") / maxSize).cast("long"))))
      .withColumn(keyCol, concat_ws("#", col(keyCol), col("__salt")))
      .drop("__bn", "__salt")
  }

  /** Dedupe-mode candidate pairs within blocks: self-join on the key with
    * id_a < id_b (each unordered pair once).
    */
  def pairsWithinBlocks(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val a = df.select(col(keyCol), col(idCol).as("id_a"))
    val b = df.select(col(keyCol), col(idCol).as("id_b"))
    a.join(b, Seq(keyCol), "inner").filter(col("id_a") < col("id_b"))
  }

  /** LSH candidate pairs: explode band keys, self-join per (band, key),
    * distinct. `distinct` dedupes pairs sharing several bands before any
    * expensive verification.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      text: Column,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val keyed = df
      .select(col(idCol).as("__id"),
        posexplode(bandKeys(minhashSignature(tokenShingles(text, shingleSize), numHashes),
          bands, rows)).as(Seq("__band", "__key")))
    val a = keyed.select(col("__band"), col("__key"), col("__id").as("id_a"))
    val b = keyed.select(col("__band"), col("__key"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__key"), "inner")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }
}
