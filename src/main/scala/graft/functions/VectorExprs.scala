package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  /** Element accessor resolved from the child's array element type —
    * float arrays (raw embeddings) and double arrays (k-means
    * centroids: per-dim means) both widen to double, so mixed-type
    * distance sweeps stay in one native kernel.
    */
  protected def getter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"vector kernel needs array<float|double>, got $other")
    }

  @transient protected lazy val getL: (ArrayData, Int) => Double = getter(left)
  @transient protected lazy val getR: (ArrayData, Int) => Double = getter(right)

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
    while (i < n) { acc += getL(a, i) * getR(b, i); i += 1 }
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
      val d = getL(a, i) - getR(b, i)
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
