package graft

import org.apache.spark.sql.functions._
import graft.textops._
import graft.sources.WebCorpus

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    // deterministic docs with planted exact + near dups
    val base = WebCorpus.pages(spark, WebCorpus.Params(nBase = 300, dupFraction = 0.3, nHosts = 10))
      .select(col("page_id").as("doc_id"), col("text"))
    base.cache()
  }

  test("exact dedup finds planted exact duplicates and only them") {
    val withDup = docs.select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .limit(20).union(docs)
    val groups = Dedup.exactGroups(withDup, "doc_id", "text")
    assert(groups.count() >= 20)
    val total = withDup.count()
    val kept = Dedup.dropExactDuplicates(withDup, "doc_id", "text").count()
    val distinctTexts = withDup.select(Dedup.normalizeText(col("text"))).distinct().count()
    assert(kept == distinctTexts)
    assert(kept < total)
  }

  test("minhash LSH dup pairs = brute-force ngram-jaccard pairs at threshold (100% recall here)") {
    // keep whole clusters (doc_id = base*1e6 + dup_idx) so near-dups exist
    val small = docs.filter(col("doc_id") / 1000000L < 80).cache()
    val lsh = Dedup.minhashDupPairs(small, "doc_id", "text",
      threshold = 0.5, shingleSize = 3, numHashes = 32, bands = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force ground truth
    val a = small.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = small.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("j", Dedup.ngramJaccard(col("ta"), col("tb"), 3))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    assert(lsh == truth, s"missed=${(truth -- lsh).size} extra=${(lsh -- truth).size}")
  }

  test("minhash/simhash kernels are bit-identical to the explode+aggregate forms") {
    // the one-pass codegen kernels replaced the explode + min-aggregate /
    // 64-column vote-aggregate pipelines; the old forms (rebuilt here) are
    // the oracle — any drift silently changes every LSH bucket
    val edge = Seq((9000001L, ""), (9000002L, "one"), (9000003L, "  spaced   out  "))
      .toDF("doc_id", "text")
    val corpus = docs.limit(120).union(edge)
    val k = 8
    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3).cache()
    val aggSig = sh.select(col("__id"), explode(col("__sh")).as("__s"))
      .groupBy("__id")
      .agg(min(xxhash64(col("__s"), lit(1))).as("__h1"),
        (2 to k).map(i => min(xxhash64(col("__s"), lit(i))).as(s"__h$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(i => r.getLong(i))).toMap
    val kernelSig = sh.filter(size(col("__sh")) > 0)
      .select(col("__id"),
        graft.functions.GraftFunctions.minhashSig(col("__sh"), k).as("__sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Long]](1).toSeq).toMap
    assert(kernelSig.keySet == aggSig.keySet) // shingle-less docs absent in both
    kernelSig.foreach { case (id, sig) => assert(sig == aggSig(id), s"doc $id") }

    val aggSim = corpus.select(col("doc_id").as("__id"),
        explode(split(Dedup.normalizeText(col("text")), " ")).as("__t"))
      .select(col("__id"), xxhash64(col("__t")).as("__h"))
      .groupBy("__id")
      .agg(sum(shiftrightunsigned(col("__h"), 0).bitwiseAND(lit(1L))).as("__b0"),
        ((1 until 64).map(b =>
          sum(shiftrightunsigned(col("__h"), b).bitwiseAND(lit(1L))).as(s"__b$b")) :+
          count(lit(1)).as("__n")): _*)
      .select(col("__id"),
        (0 until 64).map { b =>
          when(col(s"__b$b") * 2 > col("__n"), shiftleft(lit(1L), b)).otherwise(lit(0L))
        }.reduce(_.bitwiseOR(_)).as("__sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernelSim = Dedup.simhashTable(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelSim == aggSim)
  }

  test("simhash dup pairs are near-dups, hamming symmetric bound") {
    val small = docs.limit(150)
    val pairs = Dedup.simhashDupPairs(small, "doc_id", "text", maxHamming = 6).cache()
    assert(pairs.filter(col("hamming") > 6).count() == 0)
    // every simhash pair should have decent token jaccard (sanity, not exact)
    val a = small.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = small.select(col("doc_id").as("id_b"), col("text").as("tb"))
    val verified = pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("j", Dedup.tokenJaccard(col("ta"), col("tb")))
    val lowJ = verified.filter(col("j") < 0.3).count()
    assert(lowJ == 0, s"$lowJ simhash pairs with jaccard < 0.3")
  }

  test("dot/cosine reject unequal-length vectors (corrupt embeddings must surface)") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++ Option(t.getCause).toSeq.flatMap(rootMessages)
    assert(rootMessages(e).exists(_.contains("length mismatch")), e.toString)
    // equal lengths still score
    val ok = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
  }

  test("brute-force cosine top-k matches hand computation") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(topk.map(_.getLong(2)).toSeq == Seq(2L, 3L))
    assert(math.abs(topk(0).getDouble(3) - 0.9 / math.sqrt(0.82)) < 1e-6)
  }

  test("SRP-bucketed top-k finds the same #1 neighbor for near-identical vectors") {
    val n = 100
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0).cast("float"))
        .as("embedding"))
    // plant a twin of vector 0 with id 1000 (tiny perturbation on one dim)
    val twin = vecs.filter($"vec_id" === 0)
      .select(lit(1000L).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"))
    val corpus = vecs.union(twin)
    val res = Similarity.srpTopK(corpus, twin, "vec_id", "embedding", k = 1, planes = 8)
      .collect()
    assert(res.length == 1 && res(0).getLong(2) == 0L)
    assert(res(0).getDouble(3) > 0.999)
  }

  test("multi-probe SRP dominates single-probe: best cosine per query never worse") {
    val n = 150
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0).cast("float"))
        .as("embedding")).cache()
    val queries = vecs.filter($"vec_id" < 20)
    def best(probeBits: Int): Map[Long, Double] =
      Similarity.srpTopK(vecs, queries, "vec_id", "embedding", k = 1,
          planes = 10, probeBits = probeBits)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val single = best(0)
    val multi = best(1)
    // multi-probe sees a superset of candidates per query
    assert(multi.size >= single.size)
    single.foreach { case (q, c) =>
      assert(multi(q) >= c - 1e-12, s"query $q: multi ${multi(q)} < single $c")
    }
    // and strictly improves somewhere on this fixture (1-bit-away buckets exist)
    assert(multi.size > single.size ||
      single.exists { case (q, c) => multi(q) > c + 1e-12 })
  }

  test("IVF top-k: exhaustive probe equals brute force; partial probe keeps high recall") {
    val n = 120
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0).cast("float"))
        .as("embedding")).cache()
    val queries = vecs.filter($"vec_id" < 10)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = asSet(Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3))
    val full = asSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 3,
      nCells = 8, nProbe = 8))
    assert(full == brute, "nProbe = nCells must be exhaustive")
    val partial = asSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 3,
      nCells = 8, nProbe = 3))
    val recall = (partial & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 with 3/8 cells probed = $recall")
  }

  test("IVF k-means refinement beats degenerate lowest-id centroids at partial probe") {
    // clustered corpus where the nCells lowest ids all sit in only 4 of the
    // 8 clusters — the raw-seed worst case the k-means pass exists to fix
    val n = 160
    val dim = 8
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val cluster = when(col("id") < 8, (col("id") / 2).cast("int"))
          .otherwise(pmod(col("id"), lit(8)).cast("int"))
        val center = when(d === cluster, lit(1.0)).otherwise(lit(0.05))
        val noise = (pmod(xxhash64(col("id"), d), lit(200)).cast("double") - 100.0) / 2000.0
        center + noise
      }).as("embedding")).cache()
    val queries = vecs.filter($"vec_id" >= 40 && $"vec_id" < 60)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = asSet(Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3))
    def recall(kmIters: Int): Double = {
      val got = asSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 3,
        nCells = 8, nProbe = 1, kmeansIters = kmIters))
      (got & brute).size.toDouble / brute.size
    }
    val raw = recall(0)
    val refined = recall(2)
    assert(refined > raw, s"k-means recall $refined must beat raw-seed recall $raw")
    assert(refined >= 0.9, s"k-means recall@3 at nProbe=1 on separable clusters = $refined")
  }

  test("image decode: real PNG bytes -> exact dims, deterministic features, unit histogram") {
    val png = Multimodal.syntheticPng(7L)
    val f = Multimodal.decodeImage(png, 16)
    assert(f != null && f.length == 16)
    assert(f(0) == 8.0f && f(1) == 8.0f) // true decoded dimensions
    assert(f.drop(5).sum > 0.999f && f.drop(5).sum < 1.001f) // histogram mass
    // deterministic: same bytes -> same features; different seed -> different
    assert(Multimodal.decodeImage(png, 16).toSeq == f.toSeq)
    assert(Multimodal.decodeImage(Multimodal.syntheticPng(8L), 16).toSeq != f.toSeq)
    // corrupt payload -> null (not a crash)
    assert(Multimodal.decodeImage("not a png".getBytes, 16) == null)
    // and the batched pipeline routes image rows through the real decoder
    val media = Multimodal.syntheticMedia(docs.limit(30), "doc_id", "text")
    val img = media.filter($"kind" === "image").select("media_id").collect()
      .map(_.getLong(0)).toSet
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getAs[Seq[Float]](1)).toMap
    img.foreach { id => assert(feats(id)(0) == 8.0f && feats(id)(1) == 8.0f) }
  }

  test("persisted IVF index: exhaustive probe = brute force; partial probe prunes partitions") {
    val n = 120
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0))
        .as("embedding")).cache()
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.writeIvfIndex(vecs, "vec_id", "embedding", dir, nCells = 8, kmeansIters = 1)
    val queries = vecs.filter($"vec_id" < 10)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = asSet(Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3))
    val full = asSet(Similarity.queryIvfIndex(queries, "vec_id", "embedding", dir, 3, nProbe = 8))
    assert(full == brute, "exhaustive probe over the persisted index must equal brute force")
    // partial probe: the scan must carry a `cell IN (...)` partition filter
    // with STRICTLY fewer cells than the index has (one query probing 2 of 8
    // cells — pruning must be real, not an IN-list of every partition)
    val oneQ = vecs.filter($"vec_id" === 0)
    val pruned = Similarity.queryIvfIndex(oneQ, "vec_id", "embedding", dir, 3, nProbe = 2)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
      .find(s => s.contains(dir.split('/').last) && !s.contains("_graft_centroids"))
      .getOrElse(pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString)
    val inList = "cell#\\d+ IN \\(([-0-9,]+)\\)".r.findFirstMatchIn(scan)
    assert(scan.contains("PartitionFilters:") && inList.isDefined,
      s"no cell IN partition filter in scan:\n$scan")
    assert(inList.get.group(1).split(',').length == 2,
      s"expected exactly the 2 probed cells in the partition filter, got: ${inList.get}")
    val partial = Similarity.queryIvfIndex(queries, "vec_id", "embedding", dir, 3, nProbe = 2)
    val recall = (asSet(partial) & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 with 2/8 cells probed = $recall")
    // incremental maintenance: append new vectors using the SAME sidecar
    // centroids; an exhaustive query over the grown index = brute force
    // over the grown corpus
    val extra = spark.range(n, n + 30).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0))
        .as("embedding")).cache()
    Similarity.appendToIvfIndex(extra, "vec_id", "embedding", dir)
    val grown = vecs.union(extra)
    val bruteGrown = asSet(Similarity.bruteForceTopK(grown, queries, "vec_id", "embedding", 3))
    val fullGrown = asSet(Similarity.queryIvfIndex(queries, "vec_id", "embedding", dir, 3, nProbe = 8))
    assert(fullGrown == bruteGrown,
      "exhaustive probe after append must equal brute force over the grown corpus")
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("embedding dup pairs: brute-force threshold pairs; LSH path is a subset with the twin found") {
    val n = 80
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0).cast("float"))
        .as("embedding"))
    val twin = vecs.filter($"vec_id" === 0)
      .select(lit(1000L).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"))
    val corpus = vecs.union(twin).cache()
    val brute = Similarity.bruteForceDupPairs(corpus, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((0L, 1000L)))
    val lsh = Dedup.embeddingDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.999, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH pairs must verify against the true cosine")
    assert(lsh.contains((0L, 1000L)), "near-identical twin must share all SRP sign bits")
  }

  test("canonicalize keep-policy: best copy wins, ties to min id, uniques self-map") {
    val df = Seq(
      (1L, "The cat sat!", 10),  // dup group (normalizes equal)
      (2L, "the cat sat", 50),   // best pref -> keeper
      (3L, "THE CAT SAT.", 50),  // tied pref -> loses to lower id 2
      (4L, "something else", 1)  // unique -> itself
    ).toDF("doc_id", "text", "pref")
    val got = Dedup.canonicalize(df, "doc_id", "text", "pref")
      .select("doc_id", "canonical_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("hash split is deterministic, partitioning, and near the target fraction") {
    val df = spark.range(2000).select(col("id").as("doc_id"))
    val s1 = Sampling.hashSplit(df, "doc_id", 0.8).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(s1("train") / 2000.0 - 0.8) < 0.05, s1.toString)
    // repeat run = identical assignment (hash of id, no RNG)
    val a1 = Sampling.hashSplit(df, "doc_id", 0.8).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a2 = Sampling.hashSplit(df.repartition(7), "doc_id", 0.8).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a1 == a2, "assignment must not depend on partition layout")
    // hashSample(f) keeps exactly the train side of hashSplit(f)
    val kept = Sampling.hashSample(df, "doc_id", 0.8).collect().map(_.getLong(0)).toSet
    assert(kept == a1.filter(_._2 == "train").map(_._1))
    // different salt -> different assignment
    val salted = Sampling.hashSplit(df, "doc_id", 0.8, salt = "x").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted != a1)
  }

  test("weightedMix: per-stratum rates, unlisted strata dropped, monotone in rate") {
    val df = spark.range(3000).select(col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(3))).as("stratum"))
    val in = df.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.weightedMix(df, "doc_id", "stratum",
      Map("s0" -> 1.0, "s1" -> 0.5))
    val byS = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("s0") == in("s0"))               // rate 1.0 keeps everything
    assert(!byS.contains("s2"))                 // unlisted stratum -> dropped
    assert(math.abs(byS("s1").toDouble / in("s1") - 0.5) < 0.06, byS.toString)
    // deterministic and layout-independent
    val ids1 = out.collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.weightedMix(df.repartition(7), "doc_id", "stratum",
      Map("s0" -> 1.0, "s1" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // monotone: the rate-0.25 sample is a subset of the rate-0.5 sample
    val q = Sampling.weightedMix(df, "doc_id", "stratum", Map("s1" -> 0.25))
      .collect().map(_.getLong(0)).toSet
    val h = Sampling.weightedMix(df, "doc_id", "stratum", Map("s1" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    assert(q.subsetOf(h) && q.nonEmpty && q.size < h.size)
  }

  test("contamination: a planted benchmark copy surfaces its training source") {
    val train = docs.limit(40).select(col("doc_id"), col("text"))
    val bench = train.filter($"doc_id" % 4 === 0)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val hits = Dedup.contaminationPairs(bench, train, "doc_id", "text",
        shingleSize = 3, minShared = 5, maxShingleDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expectedSources = train.filter($"doc_id" % 4 === 0).collect().map(_.getLong(0)).toSet
    expectedSources.foreach { src =>
      assert(hits.exists(h => h._1 == src + 5000L && h._2 == src),
        s"planted copy of $src not flagged")
    }
    // the copy pair shares the most shingles among that bench doc's hits
    expectedSources.foreach { src =>
      val mine = hits.filter(_._1 == src + 5000L)
      assert(mine.maxBy(_._3)._2 == src)
    }
  }

  test("bloom filters: no false negatives for strings and longs; fpp holds; no-FN parity") {
    import graft.functions.{BloomFilters, GraftFunctions}
    val members = (0 until 1000).map(i => s"shingle token run $i")
    val strDf = members.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val bloom = BloomFilters.stringBloom(strDf, "s", expectedItems = 1000)
    // no false negatives: every inserted string must probe true
    val fn = strDf.filter(!GraftFunctions.bloomMightContain($"s", bloom)).count()
    assert(fn == 0)
    // false-positive rate on 10k non-members stays near the configured 1%
    val nonMembers = (0 until 10000).map(i => (i.toLong, s"absent value $i")).toDF("id", "s")
    val fp = nonMembers.filter(GraftFunctions.bloomMightContain($"s", bloom)).count()
    assert(fp < 500, s"false-positive count $fp way above the configured fpp")
    // long variant
    val longDf = (0L until 1000L).map(i => Tuple1(i * 7919L)).toDF("h")
    val lbloom = BloomFilters.longBloom(longDf, "h", expectedItems = 1000)
    assert(longDf.filter(!GraftFunctions.bloomMightContain($"h", lbloom)).count() == 0)
  }

  test("bloom-gated contamination == exact operator; bloom filter in the plan") {
    val train = docs.limit(40).select(col("doc_id"), col("text"))
    val bench = train.filter($"doc_id" % 4 === 0)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val exact = Dedup.contaminationPairs(bench, train, "doc_id", "text",
      shingleSize = 3, minShared = 5, maxShingleDf = 100)
    val bloomed = Dedup.contaminationPairsBloom(bench, train, "doc_id", "text",
      shingleSize = 3, minShared = 5, maxShingleDf = 100)
    assert(exact.collect().toSet == bloomed.collect().toSet)
    assert(exact.count() > 0)
    assert(bloomed.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
  }

  test("prefix-filtered cosine join == brute-force IDF cosine (lossless), and prunes") {
    // plant near-copies (one appended token) so pairs exist at the threshold
    val corpus = docs.limit(100).union(
      docs.limit(15).select((col("doc_id") + 9000000000L).as("doc_id"),
        concat(col("text"), lit(" zqxj"), col("doc_id").cast("string")).as("text")))
    val t = 0.6
    val got = Similarity.prefixCosinePairs(corpus, "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute-force twin: identical weight definition, ALL pairs scored
    val n = corpus.count()
    val tok = corpus.select(col("doc_id"), explode(Dedup.distinctTokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    val dfT = tok.groupBy("t").agg(count(lit(1)).as("df")).filter(col("df") < n)
      .withColumn("idf", log(lit(n.toDouble) / col("df")))
    val w = tok.join(dfT, "t")
      .withColumn("nm", sqrt(sum(col("idf") * col("idf"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))))
      .withColumn("u", col("idf") / col("nm"))
    val exp = w.select(col("doc_id").as("id_a"), col("t"), col("u").as("ua"))
      .join(w.select(col("doc_id").as("id_b"), col("t"), col("u").as("ub")), "t")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(round(sum(col("ua") * col("ub")), 6).as("cosine"))
      .filter(col("cosine") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exp, s"prefix join must be lossless: missing=${exp -- got}, extra=${got -- exp}")
    assert(got.nonEmpty, "test corpus must contain near-dup pairs at the threshold")

    // the prefix actually prunes: candidate postings strictly smaller than
    // the full posting lists for a corpus of non-trivial documents
    val full = tok.count()
    val prefixed = Similarity.prefixCosinePairs(corpus, "doc_id", "text", t)
    assert(prefixed.queryExecution.executedPlan.toString.contains("SortMergeJoin") ||
      prefixed.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "candidate generation must be an equi-join, not a cartesian product")
    assert(full > n * 5, "fixture sanity: docs must be non-trivial")
  }

  test("prefix cosine join: df-fraction vocabulary cap == brute force over the truncated vocab") {
    val corpus = docs.limit(100)
    val t = 0.5
    val frac = 0.02
    val got = Similarity.prefixCosinePairs(corpus, "doc_id", "text", t, maxDfFraction = frac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val n = corpus.count()
    val tok = corpus.select(col("doc_id"), explode(Dedup.distinctTokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    val dfT = tok.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") < n).filter(col("df") <= math.max(1.0, frac * n))
      .withColumn("idf", log(lit(n.toDouble) / col("df")))
    val w = tok.join(dfT, "t")
      .withColumn("nm", sqrt(sum(col("idf") * col("idf"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))))
      .withColumn("u", col("idf") / col("nm"))
    val exp = w.select(col("doc_id").as("id_a"), col("t"), col("u").as("ua"))
      .join(w.select(col("doc_id").as("id_b"), col("t"), col("u").as("ub")), "t")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(round(sum(col("ua") * col("ub")), 6).as("cosine"))
      .filter(col("cosine") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exp, s"missing=${exp -- got}, extra=${got -- exp}")
    // the cut genuinely removes vocabulary on this corpus (not a no-op)
    val full = tok.join(tok.groupBy("t").agg(count(lit(1)).as("df")).filter(col("df") < n), "t")
    assert(dfT.count() < full.select("t").distinct().count())
  }

  test("prefix cosine join: determinism across row order; zero-norm docs excluded") {
    val special = Seq(
      (1L, "common common common"), // single distinct token, shared by all
      (2L, "common unique alpha beta gamma"),
      (3L, "common unique alpha beta gamma"), // exact dup of 2 -> cosine 1.0
      (4L, ""),                               // no tokens at all
      (5L, "common")).toDF("doc_id", "text")
    val got = Similarity.prefixCosinePairs(special, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // docs 1, 4, 5: zero weighted tokens ("common" df < 5, so it DOES carry
    // weight... but docs 1 and 5 reduce to the single token "common" which
    // has df=4 < n=5, norm > 0 -> they are identical unit vectors
    assert(got.contains((2L, 3L, 1.0)))
    assert(got.contains((1L, 5L, 1.0)), "single-shared-token docs are identical unit vectors")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "empty doc must never pair")
    val reordered = Similarity.prefixCosinePairs(
      special.orderBy(desc("doc_id")).repartition(3), "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(reordered == got)
  }

  test("persisted cosine index: query == frozen-weight brute force; append is consistent") {
    val dir = java.nio.file.Files.createTempDirectory("cosidx").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val corpus = docs.limit(80)
    val t = 0.6
    Similarity.writeCosineIndex(corpus, "doc_id", "text", path, t)

    // queries: exact copies (must hit at 1.0), light edits, one all-OOV doc
    val queries = corpus.limit(10)
      .select((col("doc_id") + 9100000000L).as("doc_id"),
        concat(col("text"), lit(" zw"), col("doc_id").cast("string")).as("text"))
      .union(Seq((9999999999L, "qqq www eee rrr ttt yyy uuu")).toDF("doc_id", "text"))
    val got = Similarity.queryCosineIndex(queries, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // frozen-weight brute-force twin: corpus df/N stats, query OOV -> ln(N)
    val n = corpus.count()
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), explode(Dedup.distinctTokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
    val vocab = toks(corpus).groupBy("t").agg(count(lit(1)).as("df"))
      .withColumn("idf", log(lit(n.toDouble) / col("df")))
    def unitW(tk: org.apache.spark.sql.DataFrame, w: org.apache.spark.sql.DataFrame) =
      tk.join(w, "t")
        .withColumn("nm", sqrt(sum(col("idf") * col("idf"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))))
        .withColumn("u", col("idf") / col("nm"))
    val cw = unitW(toks(corpus), vocab.filter(col("idf") > 0).select("t", "idf"))
    val qw = unitW(toks(queries),
      toks(queries).select("t").distinct()
        .join(vocab.select("t", "idf"), Seq("t"), "left_outer")
        .select(col("t"), coalesce(col("idf"), lit(math.log(n.toDouble))).as("idf"))
        .filter(col("idf") > 0))
    val exp = qw.select(col("doc_id").as("query_id"), col("t"), col("u").as("uq"))
      .join(cw.select(col("doc_id").as("corpus_id"), col("t"), col("u").as("uc")), "t")
      .groupBy("query_id", "corpus_id")
      .agg(round(sum(col("uq") * col("uc")), 6).as("cosine"))
      .filter(col("cosine") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exp, s"missing=${exp -- got}, extra=${got -- exp}")
    assert(got.nonEmpty && got.exists(_._3 > 0.9), "light edits of corpus docs must score high")
    assert(!got.exists(_._1 == 9999999999L), "the all-OOV query matches nothing")

    // append: new docs land under the frozen stats; a re-query finds them
    val increment = corpus.limit(5)
      .select((col("doc_id") + 9200000000L).as("doc_id"), col("text"))
    Similarity.appendToCosineIndex(increment, "doc_id", "text", path)
    val after = Similarity.queryCosineIndex(queries, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after.filter(_._2 < 9200000000L) == got,
      "pairs against the original corpus must be unchanged by the append")
    assert(after.exists(_._2 >= 9200000000L),
      "queries must also hit the appended near-copies")

    // OOV consistency: an appended doc containing NOVEL tokens and an
    // identical later query must agree on their weights (both ln N) and
    // score exactly 1.0 — the inner-join form silently dropped the OOV
    // tokens from the appended vector and broke this
    val oovText = "zzqx wwqx novel tokens beside common prose here today"
    Similarity.appendToCosineIndex(
      Seq((9500000000L, oovText)).toDF("doc_id", "text"), "doc_id", "text", path)
    val hit = Similarity.queryCosineIndex(
        Seq((9600000000L, oovText)).toDF("doc_id", "text"), "doc_id", "text", path)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(hit.contains((9500000000L, 1.0)),
      s"identical OOV-bearing doc must score 1.0 against its appended twin, got $hit")
  }

  test("broadcastVocab df-floor: O(df>=2) map, weights identical to the full map") {
    val dir = java.nio.file.Files.createTempDirectory("cosvocab").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val corpus = docs.limit(60)
    Similarity.writeCosineIndex(corpus, "doc_id", "text", path, 0.6)
    val vocabDf = spark.read.parquet(s"$path/_graft_vocab")
    val flooredRows = vocabDf.filter(col("df") >= 2 || col("idf") <= 0.0).count()
    val hapax = vocabDf.filter(col("df") === 1 && col("idf") > 0).count()
    assert(hapax > 0, "corpus must carry hapax tokens for the floor to matter")
    val bc = Similarity.broadcastVocab(spark, path)
    assert(bc.value.size() == flooredRows,
      s"collected map must be the df-floored vocabulary: ${bc.value.size()} vs $flooredRows")
    // identity: a hapax token's stored idf is ln(N/1) = ln N = the OOV
    // weight, so the floored map weights EVERY text identically to the full
    // vocabulary map (hapax and never-seen tokens both take oovWeight)
    val full = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Double]()
    vocabDf.select("token", "idf").collect().foreach { r =>
      full.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        java.lang.Double.valueOf(r.getDouble(1)))
    }
    val fullBc = spark.sparkContext.broadcast(full)
    val n = corpus.count()
    val oov = math.log(n.toDouble)
    val probes = corpus.select(col("doc_id"), col("text"))
      .union(Seq((1L, "zzqx unseen tokens beside the usual prose"))
        .toDF("doc_id", "text"))
    val diff = probes.select(
        graft.functions.GraftFunctions.weightedUnitVector(
          Dedup.distinctTokens(col("text")), bc, oov).as("a"),
        graft.functions.GraftFunctions.weightedUnitVector(
          Dedup.distinctTokens(col("text")), fullBc, oov).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0, "floored-map weights must equal full-map weights")
  }

  test("token frequencies match a hand count") {
    val df = Seq((1L, "the cat and the dog"), (2L, "THE cat!")).toDF("doc_id", "text")
    val got = TextStats.tokenFrequencies(df, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("the") == ((3L, 2L)))
    assert(got("cat") == ((2L, 2L)))
    assert(got("dog") == ((1L, 1L)))
    assert(!got.contains(""))
  }

  test("language id identifies stopword-bearing text") {
    val samples = Seq(
      ("the cat and the dog walked to the park in the morning", "en"),
      ("der hund und die katze, das haus ist hier und der baum", "de"),
      ("le chat et la maison, les arbres et des fleurs dans le jardin", "fr"),
      ("el perro y la casa, los arboles en una calle", "es"),
      ("zzz qqq xxx", "und")).toDF("text", "expected")
    val wrong = samples.withColumn("pred", TextStats.langId(col("text")))
      .filter(col("pred") =!= col("expected")).collect()
    assert(wrong.isEmpty, wrong.mkString(";"))
  }

  test("token counts, quality, fingerprint are deterministic and sane") {
    val df = Seq((1L, "Hello, World! This is a test."), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val stats = TextStats.documentStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats(1L).getAs[Int]("n_tokens") == 6)
    assert(stats(2L).getAs[Int]("n_tokens") == 0)
    assert(stats(3L).getAs[Int]("n_tokens") == 0)
    val q = stats(1L).getAs[Double]("quality")
    assert(q > 0 && q <= 1)
    assert(stats(1L).getAs[String]("fingerprint").length == 16)
    // rolling fingerprint is order-sensitive
    val fp = Seq(("a b c", 1), ("c b a", 2)).toDF("text", "i")
      .select(TextStats.fingerprint64(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) != fp(1))
  }

  test("multimodal: batched feature extraction shape + determinism, frame sampling") {
    val media = Multimodal.syntheticMedia(docs.limit(50), "doc_id", "text").cache()
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 7)
    val rows = f1.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[Seq[Float]]("features").length == 16))
    val f2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 50).collect()
    assert(rows.map(r => (r.getLong(0), r.getAs[Seq[Float]](1))).toMap ==
      f2.map(r => (r.getLong(0), r.getAs[Seq[Float]](1))).toMap)
    val frames = Multimodal.sampleFrames(media, intervalMs = 60000L)
    val expected = media.filter($"kind" === "video")
      .agg(sum(ceil($"duration_ms".cast("double") / 60000.0).cast("long"))).head().getLong(0)
    assert(frames.count() == expected)
  }

  test("multimodal audio: planted WAV decodes deterministically via javax.sound") {
    // direct kernel: a synthetic 8 kHz sine WAV yields its true sample rate,
    // frame-exact duration, mono channel, and a plausible RMS/peak
    val wav = Multimodal.syntheticWav(7L)
    val f = Multimodal.decodeAudio(wav, 16)
    assert(f != null && f.length == 16)
    assert(f(0) == 8000f, s"sample rate ${f(0)}")
    val nFrames = 400 + (7 % 800)
    assert(math.abs(f(1) - nFrames * 1000.0 / 8000.0) < 0.5, s"duration ms ${f(1)}")
    assert(f(2) == 1f)
    assert(f(3) > 0.1f && f(3) < 1.0f, s"rms ${f(3)}") // fading sine: rms well inside (0,1)
    assert(f(4) > f(3) && f(4) <= 1.0f, s"peak ${f(4)}")
    // fade-out: early-segment energy exceeds late-segment energy
    assert(f(5) > f(15), s"envelope not decaying: ${f.mkString(",")}")
    // determinism + corrupt-payload null
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(7L), 16).toSeq == f.toSeq)
    assert(Multimodal.decodeAudio("not audio".getBytes, 16) == null)
    // through the pipeline: audio rows get real decoded features (feature[0]
    // = 8000 Hz is the fingerprint of the real decoder, not the stub)
    val media = Multimodal.syntheticMedia(docs.limit(60), "doc_id", "text")
    val audioFeats = Multimodal.extractFeatures(media.filter($"kind" === "audio"), dim = 16)
      .collect()
    assert(audioFeats.nonEmpty)
    assert(audioFeats.forall(_.getAs[Seq[Float]]("features").head == 8000f))
  }

  test("real multi-frame video (animated GIF) decode: frame count + luminance envelope") {
    // planted multi-frame payload decodes for real: frame count, dims,
    // per-frame luminance — not the stub's payload-hash pseudo-features
    val gif = Multimodal.syntheticGif(5L)
    val f = Multimodal.decodeVideo(gif, 16)
    assert(f != null && f.length == 16)
    val nFrames = 2 + 5 % 4 // syntheticGif contract
    assert(f(0) == nFrames.toFloat, s"frame count ${f(0)}")
    assert(f(1) == 8f && f(2) == 8f)
    (0 until nFrames).foreach { i =>
      assert(f(3 + i) > 0f && f(3 + i) < 1f, s"frame $i luminance ${f(3 + i)}")
    }
    // determinism; different seed -> different envelope
    assert(Multimodal.decodeVideo(Multimodal.syntheticGif(5L), 16).toSeq == f.toSeq)
    assert(Multimodal.decodeVideo(Multimodal.syntheticGif(6L), 16).toSeq != f.toSeq)
    // codec formats / unreadable payloads fall back to the marked stub
    val junk = "not a video".getBytes
    assert(Multimodal.decodeVideo(junk, 16).toSeq == Multimodal.decodeStub(junk, 16).toSeq)
    // contract: null features ONLY for a null payload — a dim too small for
    // the [count,w,h,lum...] layout degrades to stub features, never null
    assert(Multimodal.decodeVideo(gif, 3).toSeq == Multimodal.decodeStub(gif, 3).toSeq)
    assert(Multimodal.decodeVideo(null, 16) == null)
    // through the pipeline: video rows get real decoded features (feature[1]
    // = feature[2] = 8 px and frame count 2..5 fingerprint the GIF decoder)
    val media = Multimodal.syntheticMedia(docs.limit(60), "doc_id", "text")
    val videoFeats = Multimodal.extractFeatures(media.filter($"kind" === "video"), dim = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]]("features")).toMap
    assert(videoFeats.nonEmpty)
    videoFeats.foreach { case (id, v) =>
      assert(v(0) == (2 + math.floorMod(id, 4L)).toFloat, s"media $id frames ${v(0)}")
      assert(v(1) == 8f && v(2) == 8f)
    }
  }

  test("URL canonicalization: case, ports, tracking params, fragments, param order") {
    def canon(u: String): String = {
      val df = spark.createDataFrame(Seq(Tuple1(u))).toDF("url")
      df.select(UrlOps.canonicalUrl(col("url"))).collect()(0).getString(0)
    }
    // the full gauntlet in one URL
    assert(canon("HTTP://user@WWW.Example.COM.:80/A/b?utm_source=x&b=2&a=1&fbclid=z#frag")
      == "http://www.example.com/A/b?a=1&b=2")
    // https default port dropped; explicit non-default kept
    assert(canon("HTTPS://Host.ORG:443") == "https://host.org/")
    assert(canon("https://host.org:8080/p") == "https://host.org:8080/p")
    // http:443 is NOT a default port for http — kept
    assert(canon("http://host.org:443/p") == "http://host.org:443/p")
    // empty query / only-tracking query both vanish
    assert(canon("https://h.io/p?") == "https://h.io/p")
    assert(canon("https://h.io/p?utm_medium=rss&gclid=1") == "https://h.io/p")
    // path case is PRESERVED (paths are case-sensitive), params byte-sorted
    assert(canon("https://h.io/CaseSensitive?z=1&A=2") == "https://h.io/CaseSensitive?A=2&z=1")
    // the query starts at the FIRST '?': a literal '?' inside a parameter
    // value (redirect/return-url params) must not shift the query start —
    // a greedy prefix regex backtracked to the LAST '?' and silently
    // deleted "redirect=/x"
    assert(canon("http://h.io/p?redirect=/x?y=1&a=2")
      == "http://h.io/p?a=2&redirect=/x?y=1")
    // ALL trailing host dots strip, keeping canonicalization idempotent
    assert(canon("http://example.com../p") == "http://example.com/p")
    assert(canon("http://example.com./p") == "http://example.com/p")
    // other schemes pass through the same rules
    assert(canon("FTP://Mirror.NET/file") == "ftp://mirror.net/file")
    // scheme-less / junk values pass through unchanged (total over crawl dirt)
    assert(canon("not a url at all") == "not a url at all")
    assert(canon("example.com/path") == "example.com/path")
    // null stays null
    val nullRow = spark.sql("select cast(null as string) as url")
      .select(UrlOps.canonicalUrl(col("url"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("URL canonicalization differential-fuzz vs java.net.URI on 10k seeded URLs") {
    // canonicalUrl is regex-built; two of its edge-case bugs (query-start
    // backtracking, trailing-dot pinning) were caught by review, so pin the
    // parser against an independent oracle: wherever java.net.URI parses the
    // input, OUR canonical form must agree with URI's read of scheme, host,
    // port, path, and query multiset. Everywhere (parseable or junk) the
    // canonical form must be idempotent; junk must pass through unchanged.
    val rnd = new scala.util.Random(20260818L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val schemes = Seq("http", "HTTP", "https", "HtTpS", "ftp", "ws+x-1.a", "")
    val userinfos = Seq("", "", "", "user@", "u:p@", "A%20b@")
    val hostLabels = Seq("example", "EXAMPLE", "ex-ample", "a1", "9to5", "xn--bcher-kva")
    val tlds = Seq("com", "ORG", "co.uk", "io", "net")
    val ports = Seq("", "", "", ":80", ":443", ":8080", ":1", ":65535")
    val pathSegs = Seq("", "A", "b", "a%2Fb", "~u", "..", ".", "x.y", "UPPER")
    val keys = Seq("a", "B", "z", "utm_source", "utm_campaign", "fbclid", "gclid",
      "key", "redirect", "q")
    val vals = Seq("1", "x", "", "a/b", "x?y=1", "A%26B", "==", "HTTP://nested.example/p")
    def genUrl(): String = {
      val scheme = pick(schemes)
      if (scheme.isEmpty) pick(Seq("no scheme here", "example.com/path", "", "::::"))
      else {
        val host = (Seq.fill(rnd.nextInt(3) + 1)(pick(hostLabels)) :+ pick(tlds))
          .mkString(".") + ("." * rnd.nextInt(3))
        val path = if (rnd.nextInt(4) == 0) ""
          else "/" + Seq.fill(rnd.nextInt(4))(pick(pathSegs)).mkString("/")
        val query = if (rnd.nextInt(3) == 0) ""
          else "?" + Seq.fill(rnd.nextInt(5))(
            if (rnd.nextInt(8) == 0) "" // empty component ("a=1&&b=2")
            else if (rnd.nextInt(8) == 0) pick(keys) // key-only
            else s"${pick(keys)}=${pick(vals)}").mkString("&")
        val frag = if (rnd.nextInt(3) == 0) "" else "#" + pick(Seq("x", "a?b=1", "/f", ""))
        s"$scheme://${pick(userinfos)}$host${pick(ports)}$path$query$frag"
      }
    }
    val urls = Seq.fill(10000)(genUrl()).distinct
    import spark.implicits._
    val rows = urls.toDF("url").select(
      col("url"),
      UrlOps.canonicalUrl(col("url")).as("canon"),
      UrlOps.canonicalUrl(UrlOps.canonicalUrl(col("url"))).as("canon2"),
      UrlOps.surtKey(col("url")).as("surt"),
      UrlOps.surtKey(UrlOps.canonicalUrl(col("url"))).as("surt2"))
      .collect()
    // independent twin of the canonQuery kernel's contract (ASCII inputs:
    // String order == UTF8 byte order)
    val tracking = graft.textops.UrlOps.trackingParamRegex.r
    def expectQuery(raw: String): Seq[String] =
      raw.split("&", -1).filter(p => p.nonEmpty && tracking.findFirstIn(p).isEmpty)
        .sorted.toSeq
    var checked = 0
    rows.foreach { r =>
      val (url, canon, canon2, surt, surt2) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(canon == canon2, s"not idempotent: $url -> $canon -> $canon2")
      assert(surt == surt2, s"surt not canonical-stable: $url")
      if (!url.matches("^[^:/?#]+://.*")) assert(canon == url, s"junk mutated: $url")
      val parsed =
        try {
          val u = new java.net.URI(url)
          if (u.isAbsolute && u.getHost != null && u.getRawPath != null) Some(u) else None
        } catch { case _: java.net.URISyntaxException => None }
      parsed.foreach { u =>
        checked += 1
        val c = new java.net.URI(canon) // canonical form must itself parse
        assert(c.getScheme == u.getScheme.toLowerCase(java.util.Locale.ROOT),
          s"scheme: $url -> $canon")
        val expHost = u.getHost.toLowerCase(java.util.Locale.ROOT).replaceAll("\\.+$", "")
        assert(c.getHost == expHost, s"host: $url -> $canon (URI says $expHost)")
        assert(c.getUserInfo == null, s"userinfo survived: $url -> $canon")
        assert(c.getFragment == null && !canon.contains("#"),
          s"fragment survived: $url -> $canon")
        val scheme = u.getScheme.toLowerCase(java.util.Locale.ROOT)
        val expPort =
          if ((scheme == "http" && u.getPort == 80) ||
            (scheme == "https" && u.getPort == 443)) -1
          else u.getPort
        assert(c.getPort == expPort, s"port: $url -> $canon (expected $expPort)")
        val expPath = if (u.getRawPath.isEmpty) "/" else u.getRawPath
        assert(c.getRawPath == expPath, s"path: $url -> $canon (URI says $expPath)")
        val expQ = expectQuery(Option(u.getRawQuery).getOrElse(""))
        val gotQ = Option(c.getRawQuery).map(_.split("&", -1).toSeq).getOrElse(Nil)
        assert(gotQ == expQ, s"query: $url -> $canon (URI params $expQ, got $gotQ)")
      }
    }
    // the generator must actually exercise the oracle (not all-junk)
    assert(checked > 3000, s"only $checked URI-parseable URLs — generator broken")
  }

  test("SQL-registered kernels are callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT canon_query('b=2&utm_source=x&a=1') AS q,
        | reverse_labels('www.example.com') AS h,
        | round(jw_sim('MARTHA', 'MARHTA'), 4) AS jw,
        | simhash64(array('a', 'b')) AS sh,
        | deflate_ratio(repeat('spam ', 50)) AS dr,
        | deflate_ratio('') AS dr_empty,
        | sorted_weighted_dot(
        |   array(struct('a' AS t, 0.6D AS u), struct('b' AS t, 0.8D AS u)),
        |   array(struct('b' AS t, 1.0D AS u))) AS swd""".stripMargin).head()
    assert(r.getString(0) == "a=1&b=2")
    assert(r.getString(1) == "com,example,www")
    assert(r.getDouble(2) == 0.9611)
    assert(r.getDouble(4) < 0.2 && r.getDouble(5) == 1.0)
    assert(math.abs(r.getDouble(6) - 0.8) < 1e-12)
    // value parity with the column API
    import spark.implicits._
    val viaCol = Seq(Tuple1(Seq("a", "b"))).toDF("t")
      .select(graft.functions.GraftFunctions.simhash64(col("t"))).head().getLong(0)
    assert(r.getLong(3) == viaCol)
  }

  test("URL canonicalization is idempotent over generated messy URLs") {
    // canonical output must be a FIXED POINT: re-canonicalizing a canonical
    // URL (e.g. a url column that was already cleaned upstream) must be a
    // no-op, or repeated pipeline runs would keep mutating the dedup key
    val messy = spark.range(200).select(
      concat(
        when(pmod(col("id"), lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://User@WWW.h"), col("id"), lit(".Example.COM"),
        when(pmod(col("id"), lit(5)) === 0, lit(".")).otherwise(lit("")),
        when(pmod(col("id"), lit(3)) === 0, lit(":443")).otherwise(lit(":8080")),
        when(pmod(col("id"), lit(7)) === 0, lit(""))
          .otherwise(concat(lit("/P/"), col("id"))),
        lit("?z=9&utm_campaign=x&a=1#frag")).as("url"))
    val twice = messy.select(
      UrlOps.canonicalUrl(col("url")).as("once"),
      UrlOps.canonicalUrl(UrlOps.canonicalUrl(col("url"))).as("twice"),
      UrlOps.surtKey(col("url")).as("surt_of_messy"))
    assert(twice.filter(col("once") =!= col("twice")).count() == 0)
    // and the SURT of the canonical form equals the SURT of the messy form
    val surtStable = messy.select(
      UrlOps.surtKey(col("url")).as("a"),
      UrlOps.surtKey(UrlOps.canonicalUrl(col("url"))).as("b"))
    assert(surtStable.filter(col("a") =!= col("b")).count() == 0)
  }

  test("SURT key reverses host labels and carries the canonical tail") {
    def surt(u: String): String = {
      val df = spark.createDataFrame(Seq(Tuple1(u))).toDF("url")
      df.select(UrlOps.surtKey(col("url"))).collect()(0).getString(0)
    }
    assert(surt("http://www.example.com/a") == "com,example,www)/a")
    // same domain, different subdomains: prefix-adjacent under range sort
    assert(surt("https://News.Example.COM/x?b=1&a=2") == "com,example,news)/x?a=2&b=1")
    assert(surt("https://example.com") == "com,example)/")
    assert(surt("nonsense") == "nonsense")
    // canonical-URL equality collapses the synthetic messy variants the
    // driver query builds: two spellings of one resource, one key
    val variants = Seq(
      "HTTP://WWW.src1.Example.COM:80/Docs/en/7?b=2&a=1#x",
      "http://www.src1.example.com./Docs/en/7?a=1&utm_source=f&b=2")
    val keys = spark.createDataFrame(variants.map(Tuple1(_))).toDF("url")
      .select(UrlOps.canonicalUrl(col("url"))).distinct().collect()
    assert(keys.length == 1 &&
      keys(0).getString(0) == "http://www.src1.example.com/Docs/en/7?a=1&b=2")
  }
}
