package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import graft.functions.VectorOps

/**
 * Native Catalyst expressions for the four hot distance kernels
 * (SURVEY §4 "promote the hot distances to Expression if bench demands").
 *
 * Why not the Scala UDFs in [[graft.functions.VectorFunctions]]: a UDF
 * over `array<float>` deserializes into `Seq[Float]` — one boxed
 * `java.lang.Float` per element per row. These expressions read the
 * columnar `ArrayData` via `toFloatArray()` (a primitive bulk copy) and
 * run the same double-accumulation kernels, so the hot loop is
 * allocation-free apart from one primitive array per side.
 *
 * Codegen: the generated code calls straight into the static kernel
 * (`VectorOps`), keeping the expression inside whole-stage codegen spans
 * instead of falling back to interpreted eval.
 */
abstract class FloatArrayBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Fully-qualified static method on VectorOps to invoke. */
  protected def kernel: String

  protected def eval2(a: Array[Float], b: Array[Float]): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(DistanceExpressions.noNulls(a.asInstanceOf[ArrayData]).toFloatArray(),
      DistanceExpressions.noNulls(b.asInstanceOf[ArrayData]).toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.VectorOps.$kernel(
         |  graft.plans.DistanceExpressions.noNulls($a).toFloatArray(),
         |  graft.plans.DistanceExpressions.noNulls($b).toFloatArray());""".stripMargin)
}

case class L2DistanceExpr(left: Expression, right: Expression) extends FloatArrayBinaryExpression {
  override def prettyName: String = "vector_l2_distance"
  protected def kernel: String = "l2"
  protected def eval2(a: Array[Float], b: Array[Float]): Double = VectorOps.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class CosineDistanceExpr(left: Expression, right: Expression) extends FloatArrayBinaryExpression {
  override def prettyName: String = "vector_cosine_distance"
  protected def kernel: String = "cosineDistance"
  protected def eval2(a: Array[Float], b: Array[Float]): Double = VectorOps.cosineDistance(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class InnerProductExpr(left: Expression, right: Expression) extends FloatArrayBinaryExpression {
  override def prettyName: String = "vector_inner_product"
  protected def kernel: String = "innerProductDistance"
  protected def eval2(a: Array[Float], b: Array[Float]): Double = VectorOps.innerProductDistance(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class DotProductExpr(left: Expression, right: Expression) extends FloatArrayBinaryExpression {
  override def prettyName: String = "vector_dot"
  protected def kernel: String = "dot"
  protected def eval2(a: Array[Float], b: Array[Float]): Double = VectorOps.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class L1DistanceExpr(left: Expression, right: Expression) extends FloatArrayBinaryExpression {
  override def prettyName: String = "vector_l1_distance"
  protected def kernel: String = "l1"
  protected def eval2(a: Array[Float], b: Array[Float]): Double = VectorOps.l1(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object DistanceExpressions {

  /** Shared by interpreted eval and codegen (via the object's static
    * forwarder): reject null ELEMENTS before the bulk copy —
    * `ArrayData.toFloatArray` silently reads a null slot as 0.0f, which
    * would corrupt the distance, and the UDF path errors on the same
    * input during Seq[Float] deserialization. One bitmap-read branch per
    * element, negligible next to the kernel arithmetic. */
  def noNulls(a: ArrayData): ArrayData = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"vector contains a null element at index $i")
      i += 1
    }
    a
  }

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.classic.GraftShim.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.classic.GraftShim.expression(c)

  def l2(a: Column, b: Column): Column = toCol(L2DistanceExpr(ex(a), ex(b)))
  def cosine(a: Column, b: Column): Column = toCol(CosineDistanceExpr(ex(a), ex(b)))
  def innerProduct(a: Column, b: Column): Column = toCol(InnerProductExpr(ex(a), ex(b)))
  def dot(a: Column, b: Column): Column = toCol(DotProductExpr(ex(a), ex(b)))
  def l1(a: Column, b: Column): Column = toCol(L1DistanceExpr(ex(a), ex(b)))
}
