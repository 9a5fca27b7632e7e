package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection and removal — substring-granular dedup in
  * the style of Lee et al. 2021 ("Deduplicating Training Data Makes Language
  * Models Better"): find every k-token window whose exact normalized form
  * occurs at least `minCount` times anywhere in the corpus (intra-document
  * repeats count), merge overlapping hits per document into maximal spans,
  * and optionally strip every occurrence but the globally first. Document-
  * level dedup ([[Dedup.exactGroups]], MinHash/SimHash) misses the classic
  * web failure mode this catches: distinct pages sharing a long boilerplate
  * paragraph, licence block, or quoted passage.
  *
  * Scale shape: the positional explode is O(total tokens) rows — the honest
  * cost of substring granularity (Lee et al. pay a suffix array over the
  * same token stream). The corpus-wide duplication test is ONE shuffle of
  * those rows keyed by an 8-byte window hash (a count window — positions
  * must survive per occurrence, so an aggregate could not replace it); the
  * span merge then shuffles only the DUPLICATED positions (typically a small
  * fraction) keyed by doc_id. No join ever fans out to document pairs and no
  * stage is quadratic in anything.
  *
  * Tokens are materialized once per row before the explode (array lambdas
  * are interpreted, not codegen — same invariant as [[Dedup]]).
  */
object SpanDedup {

  /** Non-empty tokens of [[Dedup.normalizeText]]-normalized text. Span
    * positions index THIS token stream (0-based, inclusive ends).
    */
  def normTokens(text: Column): Column =
    filter(split(Dedup.normalizeText(text), " "), t => t =!= lit(""))

  /** (doc_id, pos, sh_hash) for every k-token window of every document with
    * at least k tokens. The 64-bit xxhash of the \u0001-joined window keeps
    * the corpus-wide shuffle payload at 8 bytes per position instead of the
    * window text itself; collision odds (~n²/2⁶⁵) are negligible against
    * at-scale I/O, and the DuckDB oracle groups by the raw window STRING, so
    * a real collision would surface as a gate mismatch, not pass silently.
    * Hashing is the one-pass codegen kernel `window_hashes` (a pure
    * projection; the interpreted HOF twin re-slices the array per window
    * and never enters whole-stage codegen — [[hofWindowHashes]] keeps that
    * form alive for the bit-parity test).
    */
  private def positionalShingles(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"span window size must be >= 2 tokens, got $k")
    // NOT spread (Dedup.spreadIfNarrow): the window-hash kernel is cheap
    // enough that the extra raw-text exchange measured net-negative here
    // (q_span_dedup 0.89 -> 1.23 s with the spread) — the positional
    // stream's own shuffle right after is the parallelization point
    docs
      .select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.windowHashes(col("__toks"), k)))
      .withColumnRenamed("col", "sh_hash")
  }

  /** The interpreted HOF twin of the `window_hashes` kernel — bit-equal by
    * contract (SpanDedupSpec asserts it); the form the kernel replaced.
    */
  def hofWindowHashes(toks: Column, k: Int): Column =
    transform(sequence(lit(0), size(toks) - k),
      i => xxhash64(concat_ws("\u0001", slice(toks, i + lit(1), lit(k)))))

  /** Merge overlapping [pos, pos+k-1] window hits per document into maximal
    * spans (gaps-and-islands over a running-max window; overlap only —
    * merely adjacent windows stay separate spans, since the k-gram crossing
    * their boundary was NOT itself duplicated). Input: (doc_id, pos).
    */
  private def mergeSpans(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(k - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__new", when(col("pos") > coalesce(prevEnd, lit(-1)), 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + lit(k - 1)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .select("doc_id", "span_start", "span_end", "span_len")
  }

  /** Positions of corpus-duplicated windows, by one of two scale shapes:
    *
    *  - window path (default): ONE shuffle of the full positional stream
    *    keyed by sh_hash, count window, filter. Always works; the full
    *    stream crosses the wire exactly once.
    *  - broadcast path: map-side-combined count aggregate (shuffles ~distinct
    *    windows, not positions) -> filter to duplicated hashes -> BROADCAST
    *    left_semi back onto the positional projection. The positional stream
    *    then never shuffles at all — the right shape at 100 TB whenever the
    *    duplicated-hash set fits in executor memory (typical for corpora
    *    where boilerplate was already stripped upstream). The caller asserts
    *    that fit by passing broadcastDupHashes = true; a silent auto-gate
    *    would need an extra counting action per call.
    */
  private def dupPositions(
      sh: DataFrame, minCount: Long, broadcastDupHashes: Boolean): DataFrame =
    if (broadcastDupHashes) {
      val dup = sh.groupBy("sh_hash")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= minCount)
        .select("sh_hash")
      sh.join(broadcast(dup), Seq("sh_hash"), "left_semi")
    } else {
      sh.withColumn("__n", count(lit(1)).over(Window.partitionBy("sh_hash")))
        .filter(col("__n") >= minCount)
        .drop("__n")
    }

  /** Maximal duplicated spans per document: every merged region of k-token
    * windows occurring >= minCount times corpus-wide. Output
    * (doc_id, span_start, span_end, span_len); indices are 0-based inclusive
    * over the normalized token stream ([[normTokens]]).
    */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minCount: Long = 2L,
      broadcastDupHashes: Boolean = false): DataFrame = {
    val sh = positionalShingles(docs, idCol, textCol, k)
    mergeSpans(dupPositions(sh, minCount, broadcastDupHashes)
      .select("doc_id", "pos"), k)
  }

  /** Spans of `target` documents covered by k-token windows present anywhere
    * in `corpus` — span-granular benchmark decontamination, the positional
    * cousin of [[Dedup.contaminationPairs]]: not just WHICH page is
    * contaminated but WHERE. left_semi join on the window hash; the corpus
    * side is reduced to distinct hashes first (its positions are irrelevant),
    * so the join's build side is one long per distinct corpus window.
    */
  def contaminatedSpans(
      target: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      broadcastCorpus: Boolean = false): DataFrame = {
    val tsh = positionalShingles(target, idCol, textCol, k)
    val csh = positionalShingles(corpus, idCol, textCol, k)
      .select("sh_hash").distinct()
    // benchmark suites are tiny next to a training corpus: broadcasting the
    // distinct benchmark hashes makes the semi-join shuffle-free on the
    // target side — the decontamination shape to use at 100 TB
    val cside = if (broadcastCorpus) broadcast(csh) else csh
    mergeSpans(tsh.join(cside, Seq("sh_hash"), "left_semi")
      .select("doc_id", "pos"), k)
  }

  /** [[contaminatedSpans]] with a broadcast-Bloom gate on the target side —
    * bit-identical OUTPUT: the Bloom (no false negatives) prunes the
    * token-scale positional stream to ~(hit + fpp) selectivity with a
    * codegen filter riding the scan, and the exact semi-join then
    * adjudicates the survivors (false positives die there — the Bloom is
    * never the final membership test, since spans have no downstream
    * verify stage). The regime between the default shuffle semi-join and
    * `broadcastCorpus = true`: the benchmark window-hash set is too big to
    * broadcast exactly but fits as ~1.2 bytes/window at fpp=0.01 — and the
    * semi-join's input is no longer the full target stream but its
    * Bloom-surviving sliver, so the remaining shuffle is near-free.
    */
  def contaminatedSpansBloom(
      target: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      fpp: Double = 0.01,
      expectedWindows: Long = -1L): DataFrame = {
    val tsh = positionalShingles(target, idCol, textCol, k)
    val csh = positionalShingles(corpus, idCol, textCol, k)
      .select("sh_hash").distinct()
    val n =
      if (expectedWindows > 0) expectedWindows
      else math.max(1000L,
        csh.agg(approx_count_distinct(col("sh_hash"))).head().getLong(0) * 2)
    val bloom = graft.functions.BloomFilters.longBloom(csh, "sh_hash", n, fpp)
    mergeSpans(
      tsh.filter(graft.functions.GraftFunctions.bloomMightContain(col("sh_hash"), bloom))
        .join(csh, Seq("sh_hash"), "left_semi")
        .select("doc_id", "pos"), k)
  }

  /** Keep-one span removal (Lee et al.'s policy): for every duplicated
    * k-token window, the globally first occurrence (min (doc_id, pos)) stays;
    * all later occurrences are marked, merged into maximal removal spans per
    * document, and stripped from the token stream. Returns one row per input
    * document: (doc_id, n_tokens, n_kept, n_removed, clean_text) where
    * clean_text is the kept normalized tokens re-joined by single spaces.
    *
    * The per-document span list is collected into an array (bounded by
    * n_tokens/1, in practice n_tokens/k) and applied with interpreted array
    * lambdas — O(tokens × spans) per row, still row-scale, never pair-scale.
    */
  def removeDuplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minCount: Long = 2L,
      broadcastDupHashes: Boolean = false): DataFrame = {
    val sh = positionalShingles(docs, idCol, textCol, k)
    // keep-first needs a global rank per duplicated hash; ranking AFTER
    // dupPositions means the row_number window sorts only the duplicated
    // positions (on the broadcast path the full stream never shuffles; on
    // the window path count + row_number share one exchange)
    val removals = dupPositions(sh, minCount, broadcastDupHashes)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("sh_hash").orderBy("doc_id", "pos")))
      .filter(col("__rn") > 1)
      .select("doc_id", "pos")
    val perDoc = mergeSpans(removals, k)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))

    val keptToks = filter(col("__toks"), (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("span_start") && i <= sp.getField("span_end")))

    docs
      .select(col(idCol).as("doc_id"), normTokens(col(textCol)).as("__toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks")).otherwise(keptToks))
      .select(
        col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        size(col("__kept")).as("n_kept"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }
}
