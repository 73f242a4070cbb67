package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a string array, as a native Catalyst
  * expression.
  *
  * Rationale: the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` runs
  * interpreted (higher-order functions are CodegenFallback and evaluate
  * a lambda per element) and measured ~40 µs/row on 300-token docs —
  * 10 s for 5 k docs, recomputed on every join branch. This imperative
  * single-pass version is ~100× cheaper and keeps the same semantics:
  * order-of-first-occurrence distinct shingles, exactly what
  * `array_distinct(transform(...))` produces.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Codegen: call into this expression object. A plain CodegenFallback
    * would eject the WHOLE stage from whole-stage codegen (every
    * downstream expression in the stage then runs interpreted — md5
    * chains got 5-10× slower); delegating via a reference object keeps
    * the stage compiled.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val sep = Shingles.space
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object Shingles {
  private[functions] val space = UTF8String.fromString(" ")
}

/** ALL n-word shingles in order, multiplicity kept — the non-distinct
  * sibling of [[Shingles]], for repetition statistics (top-n-gram
  * frequency needs counts, which dedup would destroy). Same codegen
  * delegation, same single-pass eval.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramsExpr", this, classOf[NGrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Shingles.space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)

  override def prettyName: String = "ngrams"
}

object TextExprs {
  /** Register SQL-callable functions; idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles",
      exprs => Shingles(exprs.head, 3),
      "builtin")
  }

  import org.apache.spark.sql.graftshim

  /** Column API: distinct n-word shingles of a split-words array. */
  def shingles(words: Column, n: Int = 3): Column =
    graftshim.toColumn(Shingles(graftshim.toExpression(words), n))

  /** Column API: all n-word shingles, multiplicity kept. */
  def ngrams(words: Column, n: Int): Column =
    graftshim.toColumn(NGrams(graftshim.toExpression(words), n))
}
