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
  */
object Dedup {

  /** Canonical text normalization shared by exact-dup hashing and
    * fingerprinting: lowercase, strip non-alphanumerics (keep spaces),
    * collapse whitespace, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

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

  /** True token-set Jaccard similarity between two text columns. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(split(normalizeText(a), " "))
    val tb = array_distinct(split(normalizeText(b), " "))
    val inter = size(array_intersect(ta, tb)).cast("double")
    val uni = size(array_union(ta, tb)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** N-gram (shingle-set) Jaccard between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(Blocking.tokenShingles(a, n))
    val sb = array_distinct(Blocking.tokenShingles(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** MinHash+LSH near-duplicate pairs: shingle -> minhash -> band ->
    * bucket-join -> verify candidates with true n-gram Jaccard >= threshold.
    * Output: (id_a, id_b, jaccard). The band parameters trade recall for
    * candidate volume: P(candidate) = 1-(1-J^r)^b.
    */
  def minhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16): DataFrame = {
    val cands = Blocking.lshCandidatePairs(docs, idCol, col(textCol), shingleSize,
      numHashes, bands)
    val a = docs.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val b = docs.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    cands
      .join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", ngramJaccard(col("__ta"), col("__tb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: per-bit majority vote of token
    * hashes. Expressed as pure column arithmetic (64 bit-count aggregates
    * over the token array, no UDF): for each bit position, count tokens with
    * that bit set vs total, set the bit if votes > half.
    */
  def simhash64(text: Column): Column = {
    val tokens = split(normalizeText(text), " ")
    val hashes = transform(tokens, t => xxhash64(t))
    val n = size(tokens)
    // fold over 64 bits; each bit is derived with aggregate() over the
    // hash array — stays inside codegen'd higher-order functions
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftrightunsigned(h, bit).bitwiseAND(lit(1L)))
      when(votes * 2 > n.cast("long"), shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidate pairs: block on bit-bands of the simhash
    * (4 bands of 16 bits — Hamming-distance<=3 dups almost surely collide in
    * one band), verify by Hamming distance <= maxHamming.
    */
  def simhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = docs.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__sig"))
    val banded = withSig.select(col("__id"), col("__sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftrightunsigned", col("__sig"), lit(16) * b)
          .bitwiseAND(lit(0xFFFFL))))
        .as(Seq("__band", "__key")))
    val a = banded.select(col("__band"), col("__key"), col("__id").as("id_a"), col("__sig").as("__sa"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("id_b"), col("__sig").as("__sb"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs among LSH candidates — see
    * [[Similarity]] for the ANN machinery; this is the convenience wrapper
    * for dedup-by-embedding.
    */
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
