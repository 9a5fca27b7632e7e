package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels over Catalyst `ArrayData`, called from generated
  * code (see [[VectorKernels]] for the rationale: interpreted HOF lambdas
  * re-evaluate per element and never enter whole-stage codegen).
  */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** Token n-gram shingles of a token array: one shingle per window start
    * `i in 0..max(len-n, 0)` (a short array yields one shingle of the whole
    * array), tokens joined by a single space with nulls skipped, empty
    * results dropped. Exactly the semantics of the previous HOF form
    * `filter(transform(sequence(...), i => concat_ws(" ", slice(toks,i+1,n))),
    * length(_) > 0)`.
    */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val total = math.max(sz - n, 0) + 1
    val out = new java.util.ArrayList[UTF8String](total)
    var i = 0
    while (i < total) {
      val hi = math.min(i + n, sz)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) {
        parts(j - i) = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      val s = UTF8String.concatWs(Space, parts: _*)
      if (s != null && s.numBytes() > 0) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray())
  }

  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** MinHash signature of a shingle array in ONE pass: element `i-1` is
    * `min over shingles s of xxhash64(s, i)` for seeds `i = 1..numHashes` —
    * bit-identical to the explode + `min(xxhash64(col, lit(i)))` aggregate
    * form (`xxhash64(s, i)` = `XXH64.hashInt(i, XXH64.hashUTF8String(s, 42))`;
    * a null element contributes `hashInt(i, 42)`, exactly what the hash
    * expression yields when a null child leaves the seed untouched). The
    * per-shingle string hash is computed once and re-seeded per minhash —
    * same op count as the aggregate, but as a pure projection: no exploded
    * row stream through an aggregate hashmap, no exchange.
    *
    * An EMPTY array yields all-`Long.MaxValue` — callers that need parity
    * with the aggregate form (where a shingle-less doc simply has no rows,
    * hence no signature) must filter `size(shingles) > 0` first.
    */
  def minhashSig(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 = if (sh.isNullAt(j)) 42L else XXH64.hashUTF8String(sh.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i + 1, h0)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  private val SpanSep = UTF8String.fromString("\u0001")

  /** 64-bit hash of every k-token window, one pass: element `i` is
    * `xxhash64(concat_ws("\u0001", toks[i..i+k-1]))` with Spark's default
    * seed 42 — bit-identical to the HOF form
    * `transform(sequence(0, len-k), i -> xxhash64(concat_ws(...slice...)))`
    * (parity-tested), but evaluated inside whole-stage codegen instead of an
    * interpreted per-window lambda that re-slices the array. An array
    * shorter than k yields an EMPTY result: positional span semantics — no
    * whole-array fallback, unlike [[shingles]].
    */
  def windowHashes(toks: ArrayData, k: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](sz - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < out.length) {
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(SpanSep, parts: _*), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sparse dot product of two (token, weight) vectors stored as
    * `array<struct<t:string,u:double>>` arrays SORTED by token (binary
    * UTF8String order — exactly `sort_array`'s StringType ordering, which
    * callers use to canonicalize): one O(na+nb) merge, no map build, no
    * per-pair interpreted lambda. Null tokens cannot occur by construction
    * (callers filter empty/null tokens before aggregation).
    */
  def sortedWeightedDot(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0.0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) {
        s += ra.getDouble(1) * rb.getDouble(1)
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  /** AllPairs prefix length over a DESC-weight-sorted unit vector
    * `array<struct<t:string,u:double>>`: the shortest prefix whose remaining
    * suffix has squared norm below `bound` — i.e.
    * `min(n, |{i : sum_{j<=i} u_j^2 <= bound}| + 1)`, the exact count the
    * previous interpreted form computed by materializing the cumulative
    * array (`aggregate(...concat...)`, O(k^2) allocation per doc) and
    * filtering it. One O(k) pass, same left-to-right double accumulation.
    */
  def prefixLength(ws: ArrayData, bound: Double): Int = {
    val n = ws.numElements()
    var cum = 0.0
    var cnt = 0
    var i = 0
    while (i < n) {
      val u = ws.getStruct(i, 2).getDouble(1)
      cum += u * u
      if (cum <= bound) cnt += 1
      i += 1
    }
    math.min(n, cnt + 1)
  }

  /** IDF-weighted unit vector from a token array under a broadcast-style
    * vocabulary map — the projection form of the cosine index's query-side
    * weighting, usable where a groupBy is unavailable (streaming): weights
    * come from `vocab` (UTF8String → idf), absent tokens get `oovWeight`
    * (the index's deterministic ln N rule), zero-weight ("seen but
    * ubiquitous") and empty tokens are skipped, the vector is
    * unit-normalized and returned TOKEN-SORTED (binary UTF8String order) as
    * `array<struct<t,u>>` — exactly the shape [[sortedWeightedDot]] merges.
    * Duplicate tokens are the caller's contract (distinct-token input), as
    * in the aggregate form. No weighted tokens → empty array.
    */
  def weightedUnitVector(
      toks: ArrayData,
      vocab: java.util.HashMap[UTF8String, java.lang.Double],
      oovWeight: Double): ArrayData = {
    val n = toks.numElements()
    val ts = new java.util.ArrayList[UTF8String](n)
    val ws = new java.util.ArrayList[Double](n)
    var i = 0
    var sumSq = 0.0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0) {
          val v = vocab.get(t)
          val w = if (v == null) oovWeight else v.doubleValue()
          if (w > 0.0) {
            ts.add(t); ws.add(w); sumSq += w * w
          }
        }
      }
      i += 1
    }
    val m = ts.size()
    if (m == 0 || sumSq <= 0.0) return new GenericArrayData(Array.empty[Any])
    val nm = math.sqrt(sumSq)
    val idx = Array.tabulate(m)(identity)
    // sort indices by token binary order (UTF8String.compareTo)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        ts.get(a.intValue()).compareTo(ts.get(b.intValue()))
    })
    val rows = new Array[Any](m)
    var k = 0
    while (k < m) {
      val j = boxed(k).intValue()
      rows(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](ts.get(j), ws.get(j) / nm))
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** One reusable raw-deflate instance per executor thread: `Deflater`
    * wraps native zlib state whose allocation dwarfs small-document
    * compression; `reset()` between rows keeps the output identical to a
    * fresh instance. Raw mode (`nowrap = true`) drops the 6-byte zlib
    * header+checksum that would bias short documents' ratios upward.
    */
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** Deflate compression ratio of the UTF-8 bytes: compressed/raw size at
    * zlib level 6 — the classic web-pipeline "compressibility" repetition
    * signal (highly templated or repetitive pages compress far below
    * natural prose, which sits around ~0.4–0.7; near-random text can
    * exceed 1.0). Whole-document and encoding-level, so it catches
    * repetition that token-level n-gram fractions miss (markup churn,
    * repeated punctuation runs, byte-level boilerplate). Empty text → 1.0
    * (no evidence of repetition). Deterministic for a given JDK's zlib at
    * the pinned level; cross-engine portability is NOT claimed — tests pin
    * ordering/band properties, not exact bytes.
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflaterTL.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length
  }

  private val Amp = UTF8String.fromString("&")
  private val Comma = UTF8String.fromString(",")
  /** Query parameters dropped by [[canonQuery]]: pure click-tracking
    * identifiers that never change the resource (the standard list).
    */
  val trackingParamRegex: String =
    "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$"
  private val trackingPattern = java.util.regex.Pattern.compile(trackingParamRegex)

  /** Canonical query string: split on `&`, drop empty components and
    * click-tracking parameters, byte-sort the survivors (UTF8String binary
    * order — the order DuckDB's varchar sort and Spark's string `<` use for
    * the ASCII range query strings live in), join with `&`. One kernel call
    * instead of filter/array_sort/array_join HOF lambdas, which are
    * CodegenFallback and would knock URL canonicalization out of
    * whole-stage codegen.
    */
  def canonQuery(query: UTF8String): UTF8String = {
    val parts = query.toString.split("&", -1)
    val kept = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !trackingPattern.matcher(p).matches())
        kept.add(UTF8String.fromString(p))
      i += 1
    }
    java.util.Collections.sort(kept) // UTF8String: binary byte order
    UTF8String.concatWs(Amp, kept.toArray(new Array[UTF8String](0)).toSeq: _*)
  }

  /** Host labels reversed and comma-joined (`www.example.com` →
    * `com,example,www`) — the SURT sort-key core, as one kernel call for the
    * same codegen reason as [[canonQuery]].
    */
  def reverseLabels(host: UTF8String): UTF8String = {
    val parts = host.toString.split("\\.", -1)
    val out = new Array[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = UTF8String.fromString(parts(parts.length - 1 - i))
      i += 1
    }
    UTF8String.concatWs(Comma, out.toSeq: _*)
  }

  /** 64-bit SimHash of a token array in ONE pass: per-bit majority vote of
    * `xxhash64(token)` (= `XXH64.hashUTF8String(t, 42)`; null token → 42,
    * matching the hash expression's null-child behavior), bit set iff
    * `2 * votes > nTokens`. Bit-identical to the explode + 64-column vote
    * aggregate form, as a pure projection. An empty array yields 0L.
    */
  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = if (toks.isNullAt(j)) 42L else XXH64.hashUTF8String(toks.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        votes(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2L > n) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
