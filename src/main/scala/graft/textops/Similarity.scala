package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (query set x corpus, broadcast the
  * small side). Scale path: sign-random-projection (SRP) LSH bucketing — at
  * 100 TB the corpus is bucketed once and each query probes its bucket.
  * All vector math is `zip_with`/`aggregate` column arithmetic (codegen),
  * no UDFs.
  */
object Similarity {

  /** Dot product of two array<float/double> columns. Codegen expression —
    * the HOF form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates its
    * lambdas interpreted, which is O(pairs)-hostile on the joined side.
    */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.GraftFunctions.cosineSim(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. The query side is broadcast (it is the small side by
    * contract); ranking is a window over query id — the corpus never
    * shuffles by itself, only the (queries x corpus) scored pairs.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a hash-derived value in [-1, 1). Replaces driver-side RNG so the
    * bucketing is reproducible across runs and cluster sizes.
    */
  private def planeComponent(p: Column, i: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), p, i), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Sign-random-projection signature: `planes` bits, bit p = sign of
    * <v, h_p> where h_p is the deterministic hash-derived hyperplane.
    */
  def srpSignature(vec: Column, planes: Int, seed: Long = 42L): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(lit(p), i, seed)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** LSH candidate pairs by SRP bucket (exact signature match). Two vectors
    * with cosine ~1 share all sign bits with high probability. Keeps the
    * paired vectors as `__va`/`__vb` for immediate verification.
    */
  def srpCandidatePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 12,
      seed: Long = 42L): DataFrame = {
    val sig = vectors.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      srpSignature(col(vecCol), planes, seed).as("__bucket"))
    val a = sig.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("__va"))
    val b = sig.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("__vb"))
    a.join(b, "__bucket").filter(col("id_a") < col("id_b"))
  }

  /** Brute-force cosine-threshold pairs (id_a < id_b). The oracle-expressible
    * form of embedding near-dup detection; [[Dedup.embeddingDupPairs]] is the
    * LSH-bucketed scale path over the same kernel.
    */
  def bruteForceDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Per-row nearest-centroid id as ONE projection expression: the centroid
    * matrix rides along as an array<array<double>> literal (tiny — nCells x
    * dim doubles, broadcast with the task binary) and the codegen argmax
    * kernel ([[graft.functions.VectorKernels.nearestCell]]) picks the cell.
    * Zero shuffle, zero row fan-out — the crossJoin(centroids) +
    * row_number() window form this replaces shuffled nCells x |corpus| rows
    * (at a realistic nCells=1024 over a 100 TB corpus, ~1000x the corpus)
    * to compute the same per-row argmax. Ties: lowest centroid id (`cents`
    * is sorted by id here, and the kernel breaks ties to the lowest index),
    * matching the (cos desc, cent_id asc) ordering of the window form.
    */
  def nearestCentId(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    element_at(
      typedLit(sorted.map(_._1)),
      graft.functions.GraftFunctions.nearestCell(vec, typedLit(sorted.map(_._2))) + 1)
  }

  /** Collected (cent_id, centroid) seed set: the `nCells` lowest-id vectors
    * (deterministic). nCells x dim doubles — driver-tiny by construction.
    */
  private def seedCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int): Seq[(Long, Seq[Double])] =
    corpus
      .select(col(idCol).cast("long").as("__cent_id"),
        transform(col(vecCol), x => x.cast("double")).as("__cent"))
      .orderBy("__cent_id").limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  /** Spherical k-means refinement of IVF centroids, driver-local state only:
    * start from the `nCells` lowest-id vectors (deterministic), then `iters`
    * rounds of assign-to-nearest (the shuffle-free [[nearestCentId]]
    * projection — the corpus NEVER shuffles to assign) + per-cell
    * per-dimension mean (posexplode -> partial+final hash aggregate,
    * O(rows * dim) map-side, <= nCells * dim result rows collected). A
    * centroid that receives zero assignments in a round keeps its previous
    * position instead of being dropped — the cell count a caller asked for
    * is part of the index contract (a silently shrunk index lowers recall at
    * a given nProbe).
    */
  def kmeansCentroidsLocal(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    var cents = seedCentroids(corpus, idCol, vecCol, nCells)
    for (_ <- 1 to iters) {
      val meanRows = corpus
        .select(nearestCentId(col(vecCol), cents).as("__cent_id"),
          posexplode(transform(col(vecCol), x => x.cast("double")))
            .as(Seq("__pos", "__x")))
        .groupBy("__cent_id", "__pos").agg(avg(col("__x")).as("__m"))
        .collect()
      val means = meanRows
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.map { case (id, prev) => (id, means.getOrElse(id, prev)) }
    }
    cents
  }


  /** IVF (inverted-file) ANN: the corpus is assigned once to its nearest of
    * `nCells` coarse centroids; each query probes only its `nProbe` nearest
    * cells. With `nProbe = nCells` the search is exhaustive (= brute force);
    * smaller `nProbe` trades recall for touching 1/nCells of the corpus per
    * probe — the 100 TB path, where the cell assignment is a one-off batch
    * job and queries join against a cell-partitioned (bucketed) corpus.
    *
    * Centroids are deterministic: the `nCells` lowest-id seed vectors,
    * refined by `kmeansIters` spherical-k-means rounds
    * ([[kmeansCentroidsLocal]]; 0 = raw seeds). The corpus side assigns via
    * the shuffle-free [[nearestCentId]] projection; the query side (small by
    * contract) ranks its `nProbe` nearest cells via a broadcast crossJoin —
    * the corpus never shuffles except for the final per-query top-k window.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      kmeansIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      if (kmeansIters > 0) kmeansCentroidsLocal(corpus, idCol, vecCol, nCells, kmeansIters)
      else seedCentroids(corpus, idCol, vecCol, nCells)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      nearestCentId(col(vecCol), cents).as("__cent_id"))
    val centsDf = cents.toDF("__cent_id", "__cent")
    val wq = Window.partitionBy("query_id").orderBy(col("__cos").desc, col("__cent_id").asc)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(centsDf))
      .withColumn("__cos", cosine(col("__qv"), col("__cent")))
      .withColumn("__p", row_number().over(wq))
      .filter(col("__p") <= nProbe)
      .drop("__cos", "__p", "__cent")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    // each corpus vector lives in exactly one cell, so (query, neighbor)
    // appears at most once — no dedup needed after the cell join. The probed
    // query side is broadcast: the corpus must not shuffle on <= nCells keys.
    c.join(broadcast(q), "__cent_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Writes a PERSISTED cell-partitioned IVF index: the corpus is assigned
    * once to its nearest (k-means-refined) centroid and written
    * `partitionBy(cell)`; centroids land beside it. At 100 TB this is the
    * one-off batch indexing job — queries then touch only their probed
    * cells' files (partition pruning), never the full corpus.
    */
  def writeIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCells: Int = 16,
      kmeansIters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      if (kmeansIters > 0) kmeansCentroidsLocal(corpus, idCol, vecCol, nCells, kmeansIters)
      else seedCentroids(corpus, idCol, vecCol, nCells)
    // one shuffle-free projection assigns every corpus row to its cell
    corpus
      .select(col(idCol).as("id"), transform(col(vecCol), x => x.cast("double")).as("vec"),
        nearestCentId(col(vecCol), cents).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cents.toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_graft_centroids")
  }

  /** Appends new vectors to an EXISTING persisted IVF index — the 100 TB
    * maintenance path (daily increments land in the index without touching
    * existing files or re-running the one-off k-means). Cells come from the
    * index's own centroid sidecar, so assignment stays consistent with the
    * original build; rows are assigned via the same shuffle-free argmax
    * projection and appended to their `cell=` directories.
    */
  def appendToIvfIndex(
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$path/_graft_centroids")
      .select(col("cell"), col("vec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    require(cents.nonEmpty, s"no centroid sidecar at $path/_graft_centroids")
    // cast to the EXISTING index schema: an increment whose id column is a
    // narrower/wider type would otherwise produce mixed-schema parquet files
    // under one index directory (reader picks one footer's schema, fails or
    // misreads the rest)
    val idType = spark.read.parquet(path).schema("id").dataType
    newVectors
      .select(col(idCol).cast(idType).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"),
        nearestCentId(col(vecCol), cents).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Top-k search against a persisted IVF index: queries are assigned to
    * their `nProbe` nearest centroids (broadcast of the tiny centroid
    * table), the probed cell set is collected (|queries| * nProbe distinct
    * values — driver-small by contract), and the index scan carries an
    * explicit `cell IN (...)` partition filter — the physical plan reads
    * ONLY the probed directories (assertable via PartitionFilters in the
    * scan node; PlanSpec does).
    */
  def queryIvfIndex(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$path/_graft_centroids")
      .select(col("cell").as("__cent_id"), col("vec").as("__cent"))
    val wq = Window.partitionBy("query_id").orderBy(col("__cos").desc, col("__cent_id").asc)
    val q = queries
      .select(col(idCol).as("query_id"), transform(col(vecCol), x => x.cast("double")).as("__qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", cosine(col("__qv"), col("__cent")))
      .withColumn("__p", row_number().over(wq))
      .filter(col("__p") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cent_id").as("cell"))
    val probedCells = q.select("cell").distinct().collect().map(_.getLong(0))
    val index = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells: _*)) // static partition pruning
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    index.withColumnRenamed("id", "neighbor_id")
      .join(q, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Bucketed ANN top-k: probe the query's SRP bucket, plus (multi-probe)
    * every bucket within `probeBits` sign-bit flips — a vector near a
    * hyperplane lands on either side with near-even odds, so flipping the
    * least-confident bits recovers most cross-bucket neighbors at the cost
    * of `sum_{i<=probeBits} C(planes, i)` probes per query. The corpus is
    * bucketed ONCE (the 100 TB path: bucket-partitioned corpus, queries
    * explode to their probe set and equi-join).
    *
    * HONEST SCOPE: SRP buckets retrieve *angularly close* neighbors
    * (cosine >~ 0.9 — near-duplicate detection, the dedup use case). For
    * general ANN over vectors whose nearest neighbors sit at cosine ~0.5
    * (uniform-ish embeddings), P(same bucket) ~ (1 - theta/pi)^planes is
    * tiny — measured recall@3 on the uniform test embeddings: 0.003
    * single-probe, 0.06 at 1 flip, 0.18 at 2 flips. Use [[ivfTopK]] (data-
    * adaptive cells) or [[bruteForceTopK]] for that regime.
    */
  def srpTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 8,
      seed: Long = 42L,
      probeBits: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probeBits <= 2, "probeBits > 2 explodes the probe set; raise planes instead")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      srpSignature(col(vecCol), planes, seed).as("__bucket"))
    val sig = srpSignature(col(vecCol), planes, seed)
    // probe set: signature with 0, 1, (and 2) bits flipped
    val flips1 = (0 until planes).map(b => sig.bitwiseXOR(shiftleft(lit(1L), b)))
    val flips2 =
      if (probeBits < 2) Seq.empty
      else for { a <- 0 until planes; b <- a + 1 until planes }
        yield sig.bitwiseXOR(shiftleft(lit(1L), a)).bitwiseXOR(shiftleft(lit(1L), b))
    val probes = sig +: ((if (probeBits >= 1) flips1 else Seq.empty) ++ flips2)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(array(probes: _*)).as("__bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(q, "__bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      // multi-probe can reach the same neighbor once per probe bucket — but
      // (query, neighbor) resolves to ONE corpus bucket, so duplicates only
      // arise if probe buckets collide; array is distinct by construction
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Lossless prefix-filtered IDF-weighted cosine similarity self-join —
    * the AllPairs / prefix-filtering family (Bayardo, Ma & Srikant, WWW'07):
    * emits EVERY unordered doc pair whose cosine over IDF-weighted distinct
    * tokens is >= `threshold`, with NO probabilistic miss (the complete
    * complement to MinHash/SimHash, whose candidate recall is a probability).
    *
    * Semantics (mirrored exactly by the DuckDB oracle):
    *  - tokens: distinct normalized tokens per doc (set semantics, empty
    *    token dropped); weight = ln(N/df), so tokens present in EVERY doc
    *    weigh 0 and are dropped — they cannot change any cosine, and
    *    removing them keeps the hottest join keys out of the posting lists;
    *  - per-doc vectors are unit-normalized; docs with no weighted tokens
    *    can never reach cosine > 0 and are excluded;
    *  - `cosine` is rounded to 6 decimals BEFORE the threshold test.
    *
    * Why it is complete: order each doc's tokens by DESCENDING weight (ties
    * by token, so the order is total and deterministic) and take the
    * shortest prefix whose remaining suffix has norm < t. If a pair shares
    * no token from doc x's prefix, every shared token lies in x's suffix,
    * so dot(x,y) <= |x_suffix| * |y| < t. Hence any pair at cosine >= t
    * shares at least one PREFIX token of each member, and joining prefix
    * tokens against full posting lists generates every qualifying pair;
    * false candidates die in the exact map-dot verification.
    *
    * Scale shape (100 TB): every stage is row-scale except the candidate
    * equi-join on token — and the prefix trick is what tames it: prefixes
    * hold each doc's RAREST tokens (highest IDF first), so hot tokens
    * almost never appear on the build side of the join, inverting the usual
    * skew problem. Shuffles: one token df aggregate, one token-keyed weight
    * join, one per-doc aggregate, the candidate join + pair distinct, and
    * two id-keyed verify joins. No cross join exists at any scale. Intended
    * for near-dup thresholds (>= ~0.5): as t -> 0 prefixes approach the
    * whole document and the join degrades toward all-pairs-sharing-a-token.
    */
  /** (__id, __t) distinct normalized tokens per doc, empty tokens dropped.
    * Raw text is spread before the tokenize+explode projection so the
    * derivation parallelizes off a one-partition local scan.
    */
  private def docTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.spreadIfNarrow(docs.select(col(idCol).as("__id"), col(textCol)), "__id")
      .select(col("__id"), explode(Dedup.distinctTokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")

  /** Per-doc unit vectors from a (__id, __t) token table and a positive
    * (__t, __idf) weight table: one row per doc with
    *  - `__toks`: tokens in DESCENDING-weight order (ties by token — a
    *    total, deterministic order; sort_array canonicalizes collect_list),
    *  - `__pref`: the shortest prefix of `__toks` whose remaining suffix
    *    has norm < `threshold` (the lossless AllPairs bound; the 1e-9 slack
    *    only ever ENLARGES the prefix — more candidates, never a miss),
    *  - `__sw`: the same vector re-sorted by TOKEN (binary UTF8String
    *    order), the shape the codegen sorted_weighted_dot kernel merges in
    *    O(na+nb) — per-pair verification never runs an interpreted lambda.
    * Docs with no weighted tokens cannot reach cosine > 0 and are excluded.
    */
  private def weightedSides(
      tok: DataFrame, weights: DataFrame, threshold: Double): DataFrame = {
    val arr = tok.join(weights, "__t")
      .groupBy("__id")
      .agg(
        sort_array(collect_list(struct(col("__idf"), col("__t"))), asc = false)
          .as("__ws"),
        sqrt(sum(col("__idf") * col("__idf"))).as("__nm"))
      .filter(col("__nm") > 0)
      .select(col("__id"),
        transform(col("__ws"),
          e => struct(e("__t").as("t"), (e("__idf") / col("__nm")).as("u")))
          .as("__ws"))
    // Prefixes are sized for an EFFECTIVE threshold t' = t - 5e-7, not t:
    // pair membership is decided on round(cosine, 6) >= t, and a pair with
    // raw cosine in [t - 5e-7, t) rounds UP into the result — the suffix
    // bound must therefore guarantee candidacy down to t', or a boundary
    // pair could qualify without being generated. Enlarging the bound only
    // ever lengthens prefixes (more candidates, never a miss). The prefix
    // count itself is one codegen O(k) pass (prefix_length) — the previous
    // interpreted cumulative-array form allocated O(k^2) per doc.
    val tEff = math.max(threshold - 5e-7, 0.0)
    val bound = 1.0 - tEff * tEff + 1e-9
    val prefLen = graft.functions.GraftFunctions.prefixLength(col("__ws"), bound)
    arr
      .withColumn("__toks", transform(col("__ws"), e => e("t")))
      .withColumn("__pref", slice(col("__toks"), lit(1), prefLen))
      .withColumn("__sw",
        sort_array(transform(col("__ws"), e => struct(e("t"), e("u")))))
      .drop("__ws")
  }

  /** `maxDfFraction` truncates the effective vocabulary to tokens appearing
    * in at most that fraction of documents BEFORE weighting — the standard
    * stop-word/df cut, a SEMANTIC parameter (cosine is then defined over
    * the truncated vocabulary; the DuckDB oracle applies the same cut, and
    * completeness holds with respect to it). Why it exists: the prefix
    * trick's selectivity comes from rare tokens, which real open-vocabulary
    * (Zipfian) text always has; on a closed-small-vocabulary corpus EVERY
    * token's df grows linearly with N, posting lists balloon, and the
    * candidate join degenerates (measured: a 13 MB 80k-doc synthetic corpus
    * spilled > 80 GB at the join). 1.0 (default) = no cut.
    */
  /** `broadcastVectors` switches the two per-pair verification joins from
    * sort-merge to broadcast-hash on the per-doc vector table.
    * `Some(false)` is the cluster-correct general shape — the wide vector
    * column rides one shuffle whose spill bandwidth scales with executors ×
    * disks — but measured on ONE local disk the 8-thread level
    * spill-thrashes (verify stage 157 s @8t vs 135 s @2t on 22.5 M
    * candidates, 80k docs). When the vector table fits executor memory
    * (row-scale: |docs| × ~tokens·16 B — e.g. ~150 MB at 80k docs),
    * broadcasting removes both candidate-side shuffles entirely: candidates
    * stream through two broadcast joins + the codegen dot with zero wide
    * exchange.
    *
    * The default `None` COST-GATES the choice (the `Gamma.distinctRatio`
    * pattern): the persisted vector table's entry count is measured by the
    * same aggregate that materializes the cache (an action the candidate
    * join would otherwise pay), its broadcast size is estimated at a
    * conservative 64 B/entry + 48 B/row, and the broadcast path is taken
    * iff the estimate fits `broadcastMaxBytes` (default 256 MB — modest
    * against the 8 GB broadcast hard cap and typical multi-GB executor
    * heaps; production clusters with bigger executors can raise it).
    *
    * CACHE LIFETIME: the per-doc vector table is persisted and stays
    * cached until the session ends or `spark.catalog.clearCache()` —
    * returning a lazy result means it cannot be unpersisted here. Repeated
    * invocations in one long-lived session accumulate one cached table
    * each; loop callers should clearCache between invocations (the bench
    * harness does). Same contract in [[queryCosineIndex]].
    */
  def prefixCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxDfFraction: Double = 1.0,
      broadcastVectors: Option[Boolean] = None,
      broadcastMaxBytes: Long = 256L << 20): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    val n = docs.count() // one row-scale scalar (parquet: footer metadata)
    val tok = docTokens(docs, idCol, textCol)
    val dfT = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
      .filter(col("__df") < n)
      .filter(col("__df") <= lit(math.max(1.0, maxDfFraction * n)))
      .withColumn("__idf", log(lit(n.toDouble) / col("__df")))
      .select("__t", "__idf")
    // persisted: four consumers below (prefix postings, full postings, and
    // both verify sides) would otherwise each recompute the whole
    // tokenize→df→weight→per-doc-aggregate pipeline — column pruning gives
    // each branch a differently-narrowed aggregate, so ReuseExchange never
    // fires (measured: 8 scans / 4 doc-aggregates in the un-persisted
    // plan). One row per doc with its arrays = O(corpus tokens), the
    // operator's working set; MEMORY_AND_DISK spills rather than OOMs.
    val sides = weightedSides(tok, dfT, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val doBroadcast = broadcastVectors.getOrElse {
      // forces the cache (the candidate join pays this materialization
      // anyway) and reads back the exact row/entry counts for the estimate
      val row = sides.agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("__sw"))), lit(0L)).as("e")).head()
      row.getLong(0) * 48L + row.getLong(1) * 64L <= broadcastMaxBytes
    }
    val pref = sides.select(col("__id").as("__pa"), explode(col("__pref")).as("__t"))
    val full = sides.select(col("__id").as("__pb"), explode(col("__toks")).as("__t"))
    val cand = pref.join(full, "__t")
      .filter(col("__pa") =!= col("__pb"))
      .select(least(col("__pa"), col("__pb")).as("id_a"),
        greatest(col("__pa"), col("__pb")).as("id_b"))
      .distinct()
    def side(df: DataFrame): DataFrame = if (doBroadcast) broadcast(df) else df
    val ma = side(sides.select(col("__id").as("id_a"), col("__sw").as("__wa")))
    val mb = side(sides.select(col("__id").as("id_b"), col("__sw").as("__wb")))
    cand.join(ma, "id_a").join(mb, "id_b")
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.sortedWeightedDot(col("__wa"), col("__wb")),
        6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Persisted text-cosine index — the write-once / query-many form of
    * [[prefixCosinePairs]] (the text twin of [[writeIvfIndex]]): at 100 TB
    * the corpus statistics and postings are built ONCE, and each query
    * batch (an increment to dedupe, a stream of new crawl pages) joins
    * against the stored artifact instead of re-weighting the corpus.
    *
    * Layout under `path`:
    *  - `vectors/`  (id, sw)    — per-doc token-sorted unit vectors,
    *  - `postings/` (id, token) — each doc's PREFIX tokens only: the
    *    lossless candidate index (rarest tokens ⇒ short posting lists),
    *  - `_graft_vocab` (token, df, idf) — the FULL frozen vocabulary,
    *    including idf = 0 rows (df = N), so a query can distinguish
    *    "seen but ubiquitous" (weight 0, dropped) from "never seen"
    *    (the OOV rule below),
    *  - `_graft_meta` (n, threshold) — the frozen corpus size + the
    *    threshold the prefixes were sized for.
    *
    * Frozen-statistics contract: query-side weights come from the stored
    * vocabulary, NOT from the query batch — results are reproducible and
    * append-consistent. Out-of-vocabulary tokens weigh ln(N) (df treated
    * as 1, maximal rarity): they count toward the query's norm — novel
    * content *reduces* similarity to the indexed corpus, which is the
    * honest direction — and contribute 0 to every dot against original
    * corpus docs (no stored vector contains them). The rule is
    * deterministic, so appended docs and later queries sharing the same
    * OOV token agree on its weight.
    *
    * Completeness: a (query, corpus) pair at cosine >= t must share a
    * token in the CORPUS doc's prefix (its suffix-norm is < t by
    * construction, and the dot only counts tokens the corpus doc has), so
    * joining the query's full token list against the prefix postings
    * generates every qualifying pair; exact sorted-merge dot verifies.
    */
  def writeCosineIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double,
      maxDfFraction: Double = 1.0): Unit = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    val tok = docTokens(corpus, idCol, textCol)
    // df-capped tokens (see prefixCosinePairs' maxDfFraction doc) get
    // idf = 0, NOT removal: they must stay in the stored vocabulary as
    // "seen but unweighted" so probes skip them instead of applying the
    // OOV ln N rule to a stop word
    val vocab = tok.groupBy("__t").agg(count(lit(1)).as("__df"))
      .withColumn("__idf",
        when(col("__df") <= lit(math.max(1.0, maxDfFraction * n)),
          log(lit(n.toDouble) / col("__df"))).otherwise(lit(0.0)))
    vocab.select(col("__t").as("token"), col("__df").as("df"), col("__idf").as("idf"))
      .write.mode("overwrite").parquet(s"$path/_graft_vocab")
    // weight the corpus from the JUST-WRITTEN vocabulary parquet, not the
    // live `vocab` lineage: the lineage form re-ran the whole tokenize → df
    // aggregate inside the vector-build job (shuffle reuse never crosses
    // jobs), while the read-back is a token-scale scan of a file this job
    // already paid to produce
    val storedW = spark.read.parquet(s"$path/_graft_vocab")
      .filter(col("idf") > 0)
      .select(col("token").as("__t"), col("idf").as("__idf"))
    val sides = weightedSides(tok, storedW, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // `pref` rides the vector row so a consumer holding a candidate pair
    // can dedupe it WITHOUT a stateful distinct (keep only the row whose
    // join token is the smallest shared prefix token — a pure projection;
    // the streaming matcher depends on this). Batch readers that don't
    // need it prune the column at the scan.
    sides.select(col("__id").as("id"), col("__sw").as("sw"), col("__pref").as("pref"))
      .write.mode("overwrite").parquet(s"$path/vectors")
    sides.select(col("__id").as("id"), explode(col("__pref")).as("token"))
      .write.mode("overwrite").parquet(s"$path/postings")
    sides.unpersist()
    Seq((n, threshold)).toDF("n", "threshold")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_graft_meta")
  }

  /** Appends new documents to an EXISTING cosine index under its frozen
    * vocabulary — the daily-increment maintenance path: no stored file is
    * rewritten and the one-off corpus statistics pass never re-runs. OOV
    * tokens follow the index's deterministic ln(N) rule (see
    * [[writeCosineIndex]]), so later queries sharing them score
    * consistently. The caller owns id-disjointness (same contract as
    * [[appendToIvfIndex]]).
    */
  def appendToCosineIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(s"$path/_graft_meta").select("n", "threshold").head()
    val n = meta.getLong(0)
    val threshold = meta.getDouble(1)
    val idType = spark.read.parquet(s"$path/vectors").schema("id").dataType
    val tok = docTokens(
      newDocs.select(col(idCol).cast(idType).as(idCol), col(textCol)),
      idCol, textCol)
    // the SAME weight rule as the query paths (queryWeights): OOV tokens at
    // ln(N), weight-0 (ubiquitous) dropped — a bare inner join against the
    // vocabulary would silently DROP an appended doc's novel tokens, so an
    // identical later query (which weights them) could never score 1.0
    // against it
    val weights = queryWeights(tok, frozenWeights(spark, path, n), n)
    val sides = weightedSides(tok, weights, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sides.select(col("__id").as("id"), col("__sw").as("sw"), col("__pref").as("pref"))
      .write.mode("append").parquet(s"$path/vectors")
    sides.select(col("__id").as("id"), explode(col("__pref")).as("token"))
      .write.mode("append").parquet(s"$path/postings")
    sides.unpersist()
  }

  /** (__t, __idf) as stored: the FULL frozen vocabulary INCLUDING the
    * idf = 0 (ubiquitous) rows — pass through [[queryWeights]] to apply
    * the probe-side rule (OOV → ln N, weight-0 dropped); never join this
    * directly, or OOV tokens silently vanish.
    */
  private def frozenWeights(
      spark: org.apache.spark.sql.SparkSession, path: String, n: Long): DataFrame =
    spark.read.parquet(s"$path/_graft_vocab")
      .select(col("token").as("__t"), col("idf").as("__idf"))

  /** Weight table for a query-side token table under the frozen vocab:
    * left join, OOV -> ln(N), zero-weight (ubiquitous) tokens dropped.
    */
  private def queryWeights(tok: DataFrame, vocab: DataFrame, n: Long): DataFrame =
    tok.select("__t").distinct()
      .join(vocab, Seq("__t"), "left_outer")
      .select(col("__t"),
        coalesce(col("__idf"), lit(math.log(n.toDouble))).as("__idf"))
      .filter(col("__idf") > 0)

  /** Driver-collected broadcast of an index's FULL vocabulary (token → idf,
    * INCLUDING the weight-0 rows — a probe must distinguish "seen but
    * ubiquitous" (skip) from "never seen" (the OOV ln N rule)). One-time
    * cost per consumer: the vocabulary is token-scale, orders of magnitude
    * below the corpus, and this is the standard broadcast-dimension move —
    * the price of weighting a STREAM with a pure projection instead of an
    * aggregate.
    */
  def broadcastVocab(
      spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double]] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double]()
    // df-floor: hapax tokens (df = 1) carry idf = ln(N/1) = ln N — EXACTLY
    // the deterministic OOV weight every probe applies to tokens absent
    // from the map — so they are dropped from the collect with zero effect
    // on any score. Open-vocabulary crawls are hapax-dominated, so this
    // caps the driver collect at O(df >= 2 tokens) instead of O(vocab) (the
    // one driver-side scaling hazard the r5 audit flagged). idf <= 0 rows
    // ("seen but ubiquitous") must stay regardless of df: a probe has to
    // SKIP them, not weight them ln N via the OOV rule.
    spark.read.parquet(s"$path/_graft_vocab")
      .filter(col("df") >= 2 || col("idf") <= 0.0)
      .select("token", "idf").collect()
      .foreach { r =>
        m.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          java.lang.Double.valueOf(r.getDouble(1)))
      }
    spark.sparkContext.broadcast(m)
  }

  /** Matches a query batch against a persisted cosine index: emits every
    * (query_id, corpus_id) pair with frozen-weight cosine >= the index's
    * threshold — complete by the corpus-side prefix bound (see
    * [[writeCosineIndex]]). The query batch is typically orders of
    * magnitude smaller than the index; nothing here rescans or re-weights
    * the corpus beyond the candidate-hit posting rows and their vectors.
    */
  def queryCosineIndex(
      queries: DataFrame,
      idCol: String,
      textCol: String,
      path: String): DataFrame = {
    val spark = queries.sparkSession
    val meta = spark.read.parquet(s"$path/_graft_meta").select("n", "threshold").head()
    val n = meta.getLong(0)
    val threshold = meta.getDouble(1)
    val vocab = frozenWeights(spark, path, n)
    val tok = docTokens(queries, idCol, textCol)
    val qsides = weightedSides(tok, queryWeights(tok, vocab, n), threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidates: query FULL tokens vs stored PREFIX postings. Join
    // strategy is left to AQE: the query batch is small by contract and
    // converts to broadcast at runtime from real sizes; forcing it here
    // measured SLOWER (each explicit BroadcastExchange is an extra eager
    // job; AQE's conversion reuses the already-shuffled stats instead).
    val cand = qsides
      .select(col("__id").as("query_id"), explode(col("__toks")).as("token"))
      .join(spark.read.parquet(s"$path/postings"), "token")
      .select(col("query_id"), col("id").as("corpus_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .distinct()
    cand
      .join(qsides.select(col("__id").as("query_id"), col("__sw").as("__qw")), "query_id")
      .join(spark.read.parquet(s"$path/vectors")
        .select(col("id").as("corpus_id"), col("sw").as("__cw")), "corpus_id")
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.sortedWeightedDot(col("__qw"), col("__cw")),
        6))
      .filter(col("cosine") >= threshold)
      .select("query_id", "corpus_id", "cosine")
  }
}
