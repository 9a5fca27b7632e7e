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

  /** Token n-gram shingles from a token array column — a codegen'd native
    * expression (graft.functions.TokenShingles); the equivalent HOF form
    * (`filter(transform(sequence(...), i => concat_ws(" ", slice(...))))`)
    * evaluates interpreted and re-evaluates subexpressions per element,
    * ~2 ms/doc at 100-token documents.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    graft.functions.GraftFunctions.tokenShingles(toks, n)

  /** Token n-gram shingles of a text column (lowercased, whitespace-split).
    * Convenience form; inlines the split into the lambda, so use only where
    * the column is evaluated once per row (small inputs / tests).
    */
  def tokenShingles(text: Column, n: Int): Column =
    shinglesFromTokens(split(lower(trim(text)), "\\s+"), n)

  /** MinHash signature: for seed i, min over shingles of xxhash64(shingle, i).
    *
    * Expression form (higher-order functions) — fine for one-off column use,
    * but NOTE: Spark evaluates HOF lambdas interpreted and re-evaluates
    * non-lambda subexpressions per array element, so nesting this inside
    * further expressions multiplies work. The scale path is
    * [[minhashBandKeys]] (explode + codegen'd min-aggregates).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** LSH band keys from a MinHash signature array (same caveat as
    * [[minhashSignature]]).
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Scale-path MinHash banding: input (idCol, shingle array column) ->
    * output (idCol, __band, __key), one row per (doc, band).
    *
    * Shape: ONE codegen kernel pass per doc computing all `numHashes`
    * minima ([[graft.functions.TextKernels.minhashSig]] — bit-identical to
    * the former explode + min-aggregate form) -> band keys as plain column
    * hashes over signature elements -> posexplode. A pure projection: no
    * exploded row stream through an aggregate hashmap, no exchange — the
    * signature stage now scales with the scan's partitioning alone. Docs
    * with no shingles are filtered (the aggregate form had no rows for
    * them, hence no signature — same semantics, now explicit).
    */
  def minhashBandKeys(
      docsWithShingles: DataFrame,
      idCol: String,
      shingleCol: String,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = docsWithShingles
      .filter(size(col(shingleCol)) > 0)
      .select(col(idCol),
        graft.functions.GraftFunctions.minhashSig(col(shingleCol), numHashes).as("__sig"))
    val keys = (0 until bands).map { b =>
      xxhash64((lit(b) +: (1 to rows).map(r => element_at(col("__sig"), b * rows + r))): _*)
    }
    sig.select(col(idCol), posexplode(array(keys: _*)).as(Seq("__band", "__key")))
  }

  /** Drops every row of a group larger than `max` — the shared
    * degenerate-bucket cap of all the LSH/blocking self-join paths
    * (minhash/simhash bands, multi-key blocking). Implemented as ONE
    * `count()` window over the group columns, NOT an aggregate + broadcast
    * anti-join: the anti-join form re-evaluates the (possibly expensive)
    * upstream key-derivation pipeline once for the hot list and once per
    * downstream self-join side, while the window is a single shuffle of the
    * row-scale table whose (groupCols) partitioning the self-join then
    * reuses (identical canonicalized subtree -> ReusedExchange).
    */
  def capHotGroups(df: DataFrame, groupCols: Seq[String], max: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__gsz", count(lit(1)).over(w))
      .filter(col("__gsz") <= max)
      .drop("__gsz")
  }

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

  /** North-star composite blocking key set for web pages
    * (BASELINE.json: "host + lang + text-shingle MinHash band"): each row
    * emits ONE `hl|host|lang` key plus one key per MinHash band of its
    * text shingles. Two pages become candidates if they share ANY key —
    * same-site near-duplicates via host+lang, cross-site mirrors /
    * syndicated copies via the text bands, which no host-based key can
    * reach. Output: (`__id`, `__key` string), multi-row per page; feed to
    * [[multiKeyCandidatePairs]].
    */
  def webPageBlockKeys(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      langCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val hostLang = df.select(col(idCol).as("__id"),
      concat_ws("|", lit("hl"), host(col(urlCol)), col(langCol)).as("__key"))
    val sh = df.select(col(idCol).as("__id"),
      array_distinct(tokenShingles(col(textCol), shingleSize)).as("__sh"))
    val bandKeys = minhashBandKeys(sh, "__id", "__sh", numHashes, bands)
      .select(col("__id"), concat_ws("|", lit("b"), col("__band"), col("__key")).as("__key"))
    hostLang.union(bandKeys)
  }

  /** Candidate pairs from ANY multi-key blocking table (`__id`, `__key`):
    * pairs sharing at least one key, each unordered pair once. Keys held by
    * more than `maxKeySize` rows are dropped first (degenerate buckets —
    * same cap rationale as the LSH paths: an information-free key's
    * self-join output is quadratic in one shuffle group).
    */
  def multiKeyCandidatePairs(keys: DataFrame, maxKeySize: Long = 10000): DataFrame = {
    val pruned = capHotGroups(keys, Seq("__key"), maxKeySize)
    pruned.select(col("__key"), col("__id").as("id_a"))
      .join(pruned.select(col("__key"), col("__id").as("id_b")), Seq("__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** LSH candidate pairs: band keys via the one-pass kernel projection
    * ([[minhashBandKeys]]), self-join per (band, key), distinct. `distinct`
    * dedupes pairs sharing several bands before any expensive verification.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      text: Column,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      array_distinct(tokenShingles(text, shingleSize)).as("__sh"))
    val keyed = minhashBandKeys(sh, "__id", "__sh", numHashes, bands)
    val a = keyed.select(col("__band"), col("__key"), col("__id").as("id_a"))
    val b = keyed.select(col("__band"), col("__key"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__key"), "inner")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }
}
