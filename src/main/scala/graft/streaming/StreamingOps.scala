package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.config.MatchConfig
import graft.operators.{EmLink, Gamma, Patterns}
import graft.textops.Dedup

/** Structured Streaming surface: the incremental versions of the batch
  * pipeline's front ends. The reference engine is batch-only (SURVEY.md
  * §2.9), but a web-scale ingest is a stream — these operators make the
  * dedup / profiling stages incremental without changing their semantics.
  *
  * Scale shape: `firstSeenByText` state is partitioned by text-hash key
  * (HDFS/RocksDB state store on a real cluster), so state size is
  * O(distinct documents) spread across executors; `windowedLangCounts` is a
  * standard watermarked streaming aggregation whose state is bounded by the
  * watermark horizon.
  */
object StreamingOps {

  case class KeyedDoc(key: String, id: Long, text: String)

  /** Stateful streaming exact-dedup: emits only the FIRST document seen per
    * normalized-text hash (within a batch, the lowest id wins —
    * deterministic). Duplicate arrivals in any later micro-batch are
    * suppressed by per-key state. The streaming twin of
    * [[graft.textops.Dedup.dropExactDuplicates]].
    */
  def firstSeenByText(docs: DataFrame, idCol: String, textCol: String): Dataset[KeyedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      md5(Dedup.normalizeText(col(textCol))).as("key"),
      col(idCol).cast("long").as("id"),
      col(textCol).as("text")).as[KeyedDoc]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.id))
          })
  }

  case class BandedDoc(bucket: Long, id: Long, sig: Seq[Long])
  case class NearDupHit(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Stateful streaming NEAR-duplicate detection: incoming documents are
    * MinHash-banded; per band bucket, the state holds the (id, signature)
    * of previously seen members (capped at `maxPerBucket` — the streaming
    * twin of the batch degenerate-bucket cap) and each arrival is compared
    * against them by signature-estimated Jaccard (fraction of agreeing
    * minhash components — the standard one-pass proxy; the batch path
    * [[graft.textops.Dedup.minhashDupPairs]] verifies with TRUE shingle
    * Jaccard, which a stream cannot without retaining every shingle set.
    * [[graft.textops.Dedup.verifyPairs]] is the batch bridge: join the
    * emitted candidate pairs back to the stored corpus and re-score with
    * true Jaccard — stream + bridge equals the batch path's answer).
    * Emits (id_a, id_b, est_jaccard) with id_a < id_b; a pair colliding in
    * several bands can be emitted once per band — `.dropDuplicates` within
    * the consumer's sink if exact-once pairs matter.
    *
    * Scale shape: state is O(docs * bands) rows of (long + numHashes
    * longs), partitioned by bucket key across the state store; per-arrival
    * cost is |bucket| signature comparisons, bounded by the cap.
    */
  /** Overflow observability + bounded state:
    *  - `overflowAcc` (a named accumulator, visible per-query in the Spark
    *    UI / StreamingQueryProgress) counts arrivals that were COMPARED but
    *    not retained because their bucket hit `maxPerBucket`: later
    *    near-duplicates of an overflowed doc are missed, and this counter is
    *    how that coverage loss becomes observable instead of silent. Each
    *    call mints its OWN uniquely-named accumulator by default (pass one
    *    explicitly to observe it), so concurrent nearDupStream queries on a
    *    session never conflate counts. Accumulator caveat applies: task
    *    retries/speculation re-add, so the value is an approximate upper
    *    bound, not an exact count.
    *  - `stateTtl = Some(d)` switches the state to a processing-time TTL:
    *    a bucket idle for `d` is evicted (state stays bounded over the
    *    stream's lifetime — without it, NoTimeout state grows with every
    *    distinct bucket ever seen). Eviction trades recall for memory:
    *    a duplicate arriving after its twin's bucket expired is missed,
    *    the standard streaming-dedup horizon trade.
    */
  def nearDupStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      maxPerBucket: Int = 1000,
      stateTtl: Option[java.time.Duration] = None,
      overflowAcc: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.Blocking
    val overflow = overflowAcc.getOrElse(bucketOverflowAcc(spark))
    val rows = numHashes / bands
    // one-pass codegen kernel, value-identical to the HOF form
    // Blocking.minhashSignature (and per-arrival cost matters here); also
    // yields MaxValue (not null) components for shingle-less docs, which the
    // Seq[Long] encoder would reject
    val shingles = Dedup.distinctShingles(col(textCol), shingleSize)
    val sig = graft.functions.GraftFunctions.minhashSig(shingles, numHashes)
    val banded = docs
      // shingle-less docs (text shorter than the shingle size) all share the
      // kernel's sentinel all-MaxValue signature — unfiltered they collide in
      // every band bucket and emit spurious est=1.0 "near-dup" pairs with
      // every other empty doc; the batch path applies the same cut
      .where(size(shingles) > 0)
      .select(col(idCol).cast("long").as("id"), sig.as("sig"))
      .select(col("id"), col("sig"),
        posexplode(Blocking.bandKeys(col("sig"), bands, rows)).as(Seq("band", "bucket")))
      .select(col("bucket"), col("id"), col("sig")).as[BandedDoc]
    val timeout = stateTtl.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        nearDupStateFn(threshold, maxPerBucket, overflow, stateTtl.map(_.toMillis)))
  }

  /** The near-dup bucket state-transition function, factored out so it is
    * unit-testable against `TestGroupState` (the TTL branch in particular —
    * driving ProcessingTimeTimeout through a memory-sink query turns the
    * trigger into a continuous empty-batch loop, which is the production
    * behavior but not a test vehicle).
    */
  private[graft] def nearDupStateFn(
      threshold: Double,
      maxPerBucket: Int,
      overflow: org.apache.spark.util.LongAccumulator,
      ttlMs: Option[Long])
      : (Long, Iterator[BandedDoc], GroupState[List[(Long, Seq[Long])]]) => Iterator[NearDupHit] =
    (_: Long, arrivals: Iterator[BandedDoc], state: GroupState[List[(Long, Seq[Long])]]) => {
      if (state.hasTimedOut) {
        state.remove() // idle bucket evicted at its TTL
        Iterator.empty
      } else {
        var seen = state.getOption.getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
        arrivals.toSeq.sortBy(_.id).foreach { d =>
          if (!seen.exists(_._1 == d.id)) {
            seen.foreach { case (pid, psig) =>
              val matches = psig.zip(d.sig).count { case (a, b) => a == b }
              val est = matches.toDouble / psig.size
              if (est >= threshold)
                out += NearDupHit(math.min(pid, d.id), math.max(pid, d.id), est)
            }
            if (seen.size < maxPerBucket) seen = (d.id, d.sig) :: seen
            else overflow.add(1L) // compared but NOT retained — observable
          }
        }
        state.update(seen)
        ttlMs.foreach(state.setTimeoutDuration)
        out.iterator
      }
    }

  /** Mints a FRESH uniquely-named bucket-overflow accumulator for one
    * [[nearDupStream]] query (values survive across that query's
    * micro-batches). Was a shared per-session accumulator, which conflated
    * counts across concurrent nearDupStream queries; the per-call unique
    * name keeps each query's coverage-loss metric its own.
    */
  def bucketOverflowAcc(spark: org.apache.spark.sql.SparkSession): org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator(
      s"graft.nearDupStream.bucketOverflow#${overflowAccSeq.incrementAndGet()}")
  private val overflowAccSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Incremental linkage: link a STREAM of incoming records against a
    * static reference table, scoring with EM parameters estimated offline by
    * the batch engine ([[graft.operators.Linker.link]]). Per micro-batch:
    * stream-static equi-join on the blocking columns (stateless — Spark
    * re-plans the static side each batch), the same codegen gamma ladder as
    * batch, then a broadcast join against the batch EM's tiny pattern table;
    * rows with `zeta_j >= threshold` are emitted with their pattern stats.
    *
    * Scale shape: identical to one batch comparison pass — the only
    * per-batch cost beyond the join is a broadcast of the <= 4^k pattern
    * stats. Flat (non-hierarchical) configs only: child-stage binarization
    * needs its own EM per stage, which is an offline (batch) concern.
    */
  def linkStream(
      stream: DataFrame,
      static: DataFrame,
      cfg: MatchConfig,
      em: EmLink.EmResult,
      blockCols: Seq[String],
      threshold: Option[Double] = None): DataFrame = {
    require(cfg.comparisons.children.isEmpty,
      "streaming linkage supports flat configs; run hierarchical stages in batch")
    val spark = static.sparkSession
    val specs = cfg.comparisons.allVariables
    def side(df: DataFrame, id: String, suffix: String): DataFrame =
      df.select(
        (col(id).as(s"id$suffix") +:
          (specs.map(s => col(s.varname).as(s"${s.varname}$suffix")) ++
            blockCols.map(col))): _*)
    val pairs = side(stream, cfg.idA, "_a")
      .join(side(static, cfg.idB, "_b"), blockCols, "inner")
      .drop(blockCols: _*)
    val withG = Gamma.addGammaColumns(pairs, specs)
    val t = threshold.getOrElse(em.thresholdMatch)
    Patterns.attach(withG, Patterns.statsDf(spark, em), specs.map(_.varname))
      .filter(col("zeta_j") >= t)
      .drop(specs.flatMap(s => Seq(s"${s.varname}_a", s"${s.varname}_b")): _*)
  }

  /** Streaming near-duplicate matching against a persisted cosine index
    * ([[graft.textops.Similarity.writeCosineIndex]]): every incoming doc is
    * scored against the indexed corpus under the index's FROZEN statistics,
    * emitting (query_id, corpus_id, cosine >= index threshold) — exactly
    * [[graft.textops.Similarity.queryCosineIndex]]'s contract (parity is
    * tested), but with ZERO streaming state:
    *
    *  - the query vector is a PROJECTION, not an aggregate: the codegen
    *    `weighted_unit_vector` expression weights the doc's token array
    *    against the broadcast vocabulary (OOV → ln N, weight-0 skipped)
    *    and returns the token-sorted unit vector per row;
    *  - candidates are a stream-static equi-join of exploded query tokens
    *    against the stored PREFIX postings (append-mode-safe; complete by
    *    the corpus-side suffix-norm bound);
    *  - pair dedup needs no stateful `distinct`: the vector row carries the
    *    corpus doc's prefix, so keeping only the row whose join token is
    *    the SMALLEST shared prefix token (`array_min(array_intersect(...))`)
    *    emits each qualifying pair exactly once — a pure filter;
    *  - verification is the same codegen sorted-merge dot as batch.
    *
    * Scale shape: the only per-batch costs are the posting join against
    * the (rare-token, short-list) prefix index and vector fetches for the
    * candidate hits; the corpus is never rescanned or re-weighted.
    *
    * INDEX SNAPSHOT CONTRACT: the postings/vectors file listings (and the
    * broadcast vocabulary) are resolved when the stream is CONSTRUCTED —
    * documents appended via [[graft.textops.Similarity.appendToCosineIndex]]
    * after the stream starts are invisible to subsequent micro-batches.
    * Restart the stream after appends to pick them up.
    */
  def cosineMatchStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String): DataFrame = {
    import graft.textops.Similarity
    val spark = stream.sparkSession
    val meta = spark.read.parquet(s"$indexPath/_graft_meta").select("n", "threshold").head()
    val n = meta.getLong(0)
    val threshold = meta.getDouble(1)
    val vocabBc = Similarity.broadcastVocab(spark, indexPath)
    val q = stream
      .select(col(idCol).as("query_id"),
        graft.functions.GraftFunctions.weightedUnitVector(
          Dedup.distinctTokens(col(textCol)), vocabBc, math.log(n.toDouble))
          .as("__qw"))
      .filter(size(col("__qw")) > 0)
      .withColumn("__qtoks", transform(col("__qw"), e => e("t")))
    val postings = spark.read.parquet(s"$indexPath/postings")
      .select(col("token"), col("id").as("corpus_id"))
    val vectors = spark.read.parquet(s"$indexPath/vectors")
      .select(col("id").as("corpus_id"), col("sw"), col("pref"))
    q.select(col("query_id"), col("__qw"), col("__qtoks"),
        explode(col("__qtoks")).as("token"))
      .join(postings, "token")
      .filter(col("query_id") =!= col("corpus_id"))
      .join(vectors, "corpus_id")
      .filter(col("token") ===
        array_min(array_intersect(col("__qtoks"), col("pref"))))
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.sortedWeightedDot(col("__qw"), col("sw")), 6))
      .filter(col("cosine") >= threshold)
      .select("query_id", "corpus_id", "cosine")
  }

  /** Watermarked tumbling-window ingest profile: documents per (window,
    * lang). Late data beyond `watermarkDelay` is dropped and the window
    * state evicted — bounded state at any corpus rate.
    */
  def windowedLangCounts(
      docs: DataFrame,
      tsCol: String,
      langCol: String,
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(langCol))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col(langCol), col("n_docs"))
}
