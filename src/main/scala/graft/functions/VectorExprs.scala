package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector kernels over float-array columns. The declarative
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` formulation runs
  * interpreted (higher-order functions are not codegen'd) at ~µs per
  * element-pair; these imperative kernels are the difference between
  * an ANN sweep being compute-bound and lambda-dispatch-bound.
  *
  * Summation is sequential left-to-right — bit-identical to the
  * sequential `aggregate()` fold it replaces, so oracle results are
  * unchanged.
  */
abstract class VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def kernel(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecExpr", this, classOf[VectorBinary].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = (Double) $ref.nullSafeEval($l, $r);")
  }
}

/** dot(a, b) with elements widened float→double. */
case class ArrayDot(left: Expression, right: Expression) extends VectorBinary {
  protected def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

/** Squared L2 distance. */
case class ArraySqDist(left: Expression, right: Expression) extends VectorBinary {
  protected def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySqDist =
    copy(left = l, right = r)
  override def prettyName: String = "array_sq_dist"
}

object VectorExprs {
  def arrayDot(a: Column, b: Column): Column =
    graftshim.toColumn(ArrayDot(graftshim.toExpression(a), graftshim.toExpression(b)))

  def arraySqDist(a: Column, b: Column): Column =
    graftshim.toColumn(ArraySqDist(graftshim.toExpression(a), graftshim.toExpression(b)))
}
