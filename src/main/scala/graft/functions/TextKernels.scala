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
}
