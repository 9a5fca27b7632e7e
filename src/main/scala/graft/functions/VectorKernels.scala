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
  * at 0.0), so results are bit-identical to the previous implementation and
  * to the DuckDB `list_cosine_similarity` oracle at comparison precision.
  */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
}
