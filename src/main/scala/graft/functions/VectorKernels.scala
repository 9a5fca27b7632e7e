package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels over Catalyst `ArrayData` (array<double> columns),
  * called directly from generated code by the expressions in
  * [[expressions]]. Spark's higher-order array functions
  * (`zip_with`/`aggregate`) evaluate their lambdas interpreted — fine at
  * O(rows), catastrophic at O(pairs). These loops keep the pair-scale
  * vector math inside whole-stage codegen.
  *
  * Accumulation order matches the HOF forms they replace
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`: left-to-right sum starting
  * at 0.0), so on non-degenerate input (equal lengths, non-zero norms)
  * results agree with the DuckDB `list_cosine_similarity` oracle at
  * comparison precision. Edge semantics differ from the old Column form by
  * design: `dot` REJECTS unequal-length inputs (corrupt embedding data must
  * surface, not silently score on a truncated prefix), and `cosine` of a
  * zero-norm vector is 0.0 — NOT NaN, which Spark
  * orders ABOVE every double and would rank a zero vector #1 in every
  * cosine top-k window — and not NULL either (these are non-nullSafe
  * codegen kernels).
  */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot: vector length mismatch ($n vs ${b.numElements()}) — corrupt embedding data")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = dot(a, a)
    val nb = dot(b, b)
    if (na == 0.0 || nb == 0.0) 0.0
    else dot(a, b) / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 0-based index of the centroid (array<array<double>>) with the highest
    * cosine to `v`; ties break to the LOWEST index — with centroids sorted by
    * id this reproduces the (cos desc, cent_id asc) window ordering it
    * replaces. This is the IVF cell-assignment kernel: a per-row argmax over
    * a broadcast-literal centroid array, i.e. a single projection — the
    * crossJoin(centroids) + row_number window form it replaces shuffled
    * nCells x |corpus| rows to pick the same argmax.
    */
  def nearestCell(v: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = 0
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val cos = cosine(v, cents.getArray(i))
      if (cos > bestCos) { bestCos = cos; best = i }
      i += 1
    }
    best
  }
}
