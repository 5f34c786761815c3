package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector math kernels for the similarity family.
  *
  * The composed form — three `aggregate(zip_with(...))` folds per pair —
  * is semantically right and whole-stage-codegen'd, but Catalyst
  * evaluates each higher-order lambda through per-element closure
  * dispatch and allocates the zipped intermediate array; on the ANN hot
  * paths (candidate verify, IVF assignment) the pair count × 64 dims
  * makes that the dominant cost. [[CosineSim]] is the fused kernel: one
  * pass, three scalar accumulators, zero allocation.
  *
  * Bit-compatibility contract (what keeps every oracle hash-exact): each
  * accumulator adds left-to-right in index order — exactly the fold order
  * of `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _ + _)` — floats
  * widen to double before multiplying, and the final combination is
  * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with IEEE-rounded ops in
  * that exact shape. Identical bits to the composed form, verified by
  * VectorOpsSpec over the real embeddings and by every s-family oracle.
  */
object VectorAlgos {

  /** Out-of-contract inputs must fail LOUDLY: without this, a longer left
    * array would throw a bare ArrayIndexOutOfBounds and a shorter one
    * would silently truncate the dot product — corrupted similarity
    * scores, not an error. One predictable branch per pair; the loops
    * below stay branch-free.
    */
  @inline private def checkLen(la: Int, lb: Int): Unit =
    if (la != lb) throw new IllegalArgumentException(
      s"cosine_sim: embedding length mismatch ($la vs $lb); " +
        "operands must be same-dimension vectors")

  /** cos(a, b) with the composed form's exact fold order. Arrays must be
    * same length (checked) and null-free (the embedding contract).
    */
  def cosineFF(a: Array[Float], b: Array[Float]): Double = {
    checkLen(a.length, b.length)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  def cosineDD(a: Array[Double], b: Array[Double]): Double = {
    checkLen(a.length, b.length)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i)
      val y = b(i)
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  def cosineFD(a: Array[Float], b: Array[Double]): Double = {
    checkLen(a.length, b.length)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i)
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  /** |a ∩ b| for sorted-ascending distinct long arrays: two-pointer merge. */
  def intersectCountSorted(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** cosine_sim(array<float|double>, array<float|double>) → double.
  *
  * Null-element contract: elements are read through the primitive array
  * copy, so a null slot is read as 0.0 — unlike the composed
  * aggregate/zip_with form, which null-propagates the whole result. The
  * embedding pipeline never produces null elements (parquet arrays are
  * declared nullable but carry none, which is why this cannot be rejected
  * statically); feeding genuinely null-holed vectors is outside the
  * contract, as with [[IntersectCountSorted]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> inputs")
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val lf = left.dataType == ArrayType(FloatType, false) ||
    left.dataType == ArrayType(FloatType, true)
  private lazy val rf = right.dataType == ArrayType(FloatType, false) ||
    right.dataType == ArrayType(FloatType, true)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    (lf, rf) match {
      case (true, true) => VectorAlgos.cosineFF(ad.toFloatArray(), bd.toFloatArray())
      case (false, false) => VectorAlgos.cosineDD(ad.toDoubleArray(), bd.toDoubleArray())
      case (true, false) => VectorAlgos.cosineFD(ad.toFloatArray(), bd.toDoubleArray())
      case (false, true) =>
        // swap is safe: all three accumulators are symmetric under (a,b)
        // exchange except sab, whose per-element product x*y is commutative
        VectorAlgos.cosineFD(bd.toFloatArray(), ad.toDoubleArray())
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = (lf, rf) match {
      case (true, true) => "cosineFF"
      case (false, false) => "cosineDD"
      case (true, false) => "cosineFD"
      case (false, true) => "cosineFD" // swapped below
    }
    val swap = !lf && rf
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y) = if (swap) (b, a) else (a, b)
      val xa = if (lf || swap) s"$x.toFloatArray()" else s"$x.toDoubleArray()"
      val ya = if (f == "cosineFF") s"$y.toFloatArray()" else s"$y.toDoubleArray()"
      s"${ev.value} = graft.functions.VectorAlgos.$f($xa, $ya);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** intersect_count_sorted(array<long>, array<long>) → int: |a ∩ b| for
  * SORTED-ascending distinct arrays (the [[ShingleHash]] output contract)
  * via a two-pointer merge — no hash-set build, no result-array
  * allocation, unlike `size(array_intersect(a, b))`, whose count it
  * equals exactly (integers; nothing fp to match). The Jaccard verify
  * runs this once per candidate pair, which is the dedup pipelines' inner
  * loop at scale.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs")
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_count_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgos.intersectCountSorted(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorAlgos.intersectCountSorted(" +
        s"$a.toLongArray(), $b.toLongArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object gvec {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def intersectCountSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntersectCountSorted(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
