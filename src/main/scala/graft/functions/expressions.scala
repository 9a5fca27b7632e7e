package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the string-similarity kernels.
  *
  * These stay inside whole-stage codegen (each `doGenCode` emits a direct
  * static call into [[StringSim]]), unlike Scala UDFs which break the codegen
  * pipeline with serialization + null-boxing. They are the hot path of the
  * engine: every candidate pair evaluates one of these per fuzzy variable
  * (reference: `/root/reference/src/gammas/gammaCKpar.jl:103`).
  */
abstract class StringSimExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  /** Fully-qualified static method in [[StringSim]] taking two UTF8Strings. */
  def staticMethod: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.$staticMethod($a, $b)")
}

case class JaroWinklerSim(left: Expression, right: Expression, p: Double = 0.1)
    extends StringSimExpression {
  override def staticMethod: String = throw new UnsupportedOperationException
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinklerUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.jaroWinklerUTF8($a, $b, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler_sim"
}

case class JaroSim(left: Expression, right: Expression) extends StringSimExpression {
  override def staticMethod: String = "jaroUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_sim"
}

case class LevenshteinSim(left: Expression, right: Expression) extends StringSimExpression {
  override def staticMethod: String = "levenshteinSimUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.levenshteinSimUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "levenshtein_sim"
}

case class OsaSim(left: Expression, right: Expression) extends StringSimExpression {
  override def staticMethod: String = "osaSimUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.osaSimUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "osa_sim"
}

case class DamerauLevenshteinSim(left: Expression, right: Expression)
    extends StringSimExpression {
  override def staticMethod: String = "damerauLevenshteinSimUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerauLevenshteinSimUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein_sim"
}

case class HammingSim(left: Expression, right: Expression) extends StringSimExpression {
  override def staticMethod: String = "hammingSimUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.hammingSimUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_sim"
}

case class RatcliffObershelpSim(left: Expression, right: Expression)
    extends StringSimExpression {
  override def staticMethod: String = "ratcliffObershelpSimUTF8"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.ratcliffObershelpSimUTF8(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "ratcliff_obershelp_sim"
}

/** Codegen vector kernels over array<double> columns — see [[VectorKernels]]
  * for why these exist (interpreted HOF lambdas are O(pairs)-hostile).
  * Declares input types so the analyzer coerces e.g. SQL decimal-literal
  * arrays to array<double> before the kernel sees them.
  */
abstract class VectorExpression extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(DoubleType))
  def staticMethod: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.$staticMethod($a, $b)")
}

case class CosineSim(left: Expression, right: Expression) extends VectorExpression {
  override def staticMethod: String = "cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Codegen token-shingle expression — see [[TextKernels.shingles]]. */
case class TokenShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "token_shingles"
}

/** One-pass MinHash signature — see [[TextKernels.minhashSig]]. Turns the
  * LSH signature stage into a pure projection (the explode + min-aggregate
  * form shuffles one combiner row per doc and streams every exploded shingle
  * through an aggregate hashmap first).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** Per-position k-token window hashes — see [[TextKernels.windowHashes]].
  * `posexplode` of this column is the span-dedup positional stream: the
  * element index IS the window's start position.
  */
case class WindowHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.windowHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.windowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

/** Membership probe of a broadcast [[org.apache.spark.util.sketch.BloomFilter]]
  * (built by [[BloomFilters]]) — codegen'd, so a Bloom PRE-filter ahead of an
  * exact equi/semi-join stays inside the scan's WholeStageCodegen span
  * instead of breaking it with a UDF. The filter object rides the codegen
  * references array (`addReferenceObj`), never the generated source.
  * String children probe their UTF-8 bytes, long children `mightContainLong`
  * — exactly the put forms [[BloomFilters]] uses, so no false negatives by
  * construction. Callers cast the child to string/long (same contract as the
  * other GraftFunctions wrappers).
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override protected def nullSafeEval(input: Any): Any = input match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      bloom.value.mightContainBinary(s.getBytes)
    case l: Long => bloom.value.mightContainLong(l)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val bf = s"((org.apache.spark.util.sketch.BloomFilter)$ref.value())"
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        defineCodeGen(ctx, ev, c => s"$bf.mightContainBinary($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** Sparse (token, weight) dot product over token-sorted struct arrays —
  * see [[TextKernels.sortedWeightedDot]]. No ImplicitCastInputTypes: the
  * caller builds the exact `array<struct<t,u>>` shape; an analysis error on
  * mismatch beats a silent cast.
  */
case class SortedWeightedDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedWeightedDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.sortedWeightedDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_weighted_dot"
}

/** AllPairs prefix length over a desc-weight-sorted unit vector — see
  * [[TextKernels.prefixLength]]. No ImplicitCastInputTypes for the same
  * reason as [[SortedWeightedDot]]: the caller builds the exact
  * `array<struct<t,u>>` shape.
  */
case class PrefixLength(child: Expression, bound: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.prefixLength(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bound)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.prefixLength($c, ${bound}D)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "prefix_length"
}

/** Broadcast-vocabulary weighted unit vector — see
  * [[TextKernels.weightedUnitVector]]. The vocabulary map rides the codegen
  * references array (`addReferenceObj`, same pattern as
  * [[BloomMightContain]]), never the generated source.
  */
case class WeightedUnitVector(
    child: Expression,
    vocab: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double]],
    oovWeight: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("u", DoubleType, nullable = false))),
      containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.weightedUnitVector(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vocab.value, oovWeight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.weightedUnitVector($c, " +
        s"(java.util.HashMap)$ref.value(), ${oovWeight}D)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "weighted_unit_vector"
}

/** Deflate compression ratio — see [[TextKernels.deflateRatio]]. */
case class DeflateRatio(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}

/** Canonical query string — see [[TextKernels.canonQuery]]. */
case class CanonQuery(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.canonQuery(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.canonQuery($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "canon_query"
}

/** Reversed host labels — see [[TextKernels.reverseLabels]]. */
case class ReverseLabels(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.reverseLabels(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.reverseLabels($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "reverse_labels"
}

/** One-pass 64-bit SimHash — see [[TextKernels.simhash64]]. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** 0-based argmax-cosine centroid index — see [[VectorKernels.nearestCell]].
  * `right` is a (foldable, broadcast-as-literal) array<array<double>> of
  * centroids; evaluating this inside a plain projection is the shuffle-free
  * IVF cell assignment.
  */
case class NearestCell(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(DoubleType)))
  override protected def nullSafeEval(v: Any, cents: Any): Any =
    VectorKernels.nearestCell(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cents.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.VectorKernels.nearestCell($v, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_cell"
}

case class DotProduct(left: Expression, right: Expression) extends VectorExpression {
  override def staticMethod: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Column-level facade + SQL function registration. */
object GraftFunctions {
  private def col(e: Expression): Column = columnOf(e)
  private def expr(c: Column): Expression = expressionOf(c.cast("string"))
  private def exprVec(c: Column): Expression = expressionOf(c.cast("array<double>"))

  def cosineSim(a: Column, b: Column): Column = col(CosineSim(exprVec(a), exprVec(b)))
  def dotProduct(a: Column, b: Column): Column = col(DotProduct(exprVec(a), exprVec(b)))
  def nearestCell(vec: Column, cents: Column): Column =
    col(NearestCell(exprVec(vec), expressionOf(cents.cast("array<array<double>>"))))
  def tokenShingles(toks: Column, n: Int): Column =
    col(TokenShingles(expressionOf(toks.cast("array<string>")), n))
  def minhashSig(shingles: Column, numHashes: Int): Column =
    col(MinHashSig(expressionOf(shingles.cast("array<string>")), numHashes))
  def simhash64(toks: Column): Column =
    col(SimHash64(expressionOf(toks.cast("array<string>"))))
  def windowHashes(toks: Column, k: Int): Column =
    col(WindowHashes(expressionOf(toks.cast("array<string>")), k))
  /** Bloom membership probe; `c` must already be a string or long column
    * matching the filter's put type ([[BloomFilters]]).
    */
  def bloomMightContain(
      c: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      : Column =
    col(BloomMightContain(expressionOf(c), bloom))
  def canonQuery(query: Column): Column = col(CanonQuery(expr(query)))
  def reverseLabels(host: Column): Column = col(ReverseLabels(expr(host)))
  def deflateRatio(text: Column): Column = col(DeflateRatio(expr(text)))
  /** `a`/`b` must already be token-sorted `array<struct<t:string,u:double>>`. */
  def sortedWeightedDot(a: Column, b: Column): Column =
    col(SortedWeightedDot(expressionOf(a), expressionOf(b)))
  /** `ws` must be a desc-weight-sorted `array<struct<t:string,u:double>>`. */
  def prefixLength(ws: Column, bound: Double): Column =
    col(PrefixLength(expressionOf(ws), bound))
  /** `toks` must be a distinct-token `array<string>` column. */
  def weightedUnitVector(
      toks: Column,
      vocab: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double]],
      oovWeight: Double): Column =
    col(WeightedUnitVector(expressionOf(toks.cast("array<string>")), vocab, oovWeight))

  def jaroWinklerSim(a: Column, b: Column, p: Double = 0.1): Column =
    col(JaroWinklerSim(expr(a), expr(b), p))
  def jaroSim(a: Column, b: Column): Column = col(JaroSim(expr(a), expr(b)))
  def levenshteinSim(a: Column, b: Column): Column = col(LevenshteinSim(expr(a), expr(b)))
  def osaSim(a: Column, b: Column): Column = col(OsaSim(expr(a), expr(b)))
  def damerauLevenshteinSim(a: Column, b: Column): Column =
    col(DamerauLevenshteinSim(expr(a), expr(b)))
  def hammingSim(a: Column, b: Column): Column = col(HammingSim(expr(a), expr(b)))
  def ratcliffObershelpSim(a: Column, b: Column): Column =
    col(RatcliffObershelpSim(expr(a), expr(b)))

  /** Registers SQL-callable forms, e.g. `jw_sim(a, b)` / `jw_sim(a, b, 0.1)`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def two(name: String, f: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => f(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jw_sim", {
      case Seq(a, b) => JaroWinklerSim(a, b)
      case Seq(a, b, p) =>
        JaroWinklerSim(a, b,
          p.eval().toString.toDouble)
    }, "scala_udf")
    two("jaro_sim", JaroSim)
    two("lev_sim", LevenshteinSim)
    two("osa_sim", OsaSim)
    two("dl_sim", DamerauLevenshteinSim)
    two("hamming_sim", HammingSim)
    two("ro_sim", RatcliffObershelpSim)
    two("cosine_sim", CosineSim)
    two("dot_product", DotProduct)
    reg.createOrReplaceTempFunction("token_shingles", {
      case Seq(toks, n) => TokenShingles(toks, n.eval().toString.toInt)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig", {
      case Seq(sh, k) => MinHashSig(sh, k.eval().toString.toInt)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("window_hashes", {
      case Seq(toks, k) => WindowHashes(toks, k.eval().toString.toInt)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", {
      case Seq(toks) => SimHash64(toks)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("canon_query", {
      case Seq(q) => CanonQuery(q)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("reverse_labels", {
      case Seq(h) => ReverseLabels(h)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("deflate_ratio", {
      case Seq(t) => DeflateRatio(t)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("sorted_weighted_dot", {
      case Seq(a, b) => SortedWeightedDot(a, b)
    }, "scala_udf")
  }
}
