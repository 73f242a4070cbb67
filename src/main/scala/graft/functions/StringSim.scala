package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Winkler 1990, "String Comparator
  * Metrics and Enhanced Decision Rules in the Fellegi-Sunter Model of
  * Record Linkage") — the record-linkage scorer Spark lacks natively
  * (it ships levenshtein only). Semantics match the common library
  * definition (DuckDB / rapidfuzz): standard Jaro with matching window
  * `max(|a|,|b|)/2 − 1`, and the Winkler prefix boost
  * `j + ℓ·0.1·(1−j)` applied only when `j > 0.7`, prefix capped at 4.
  *
  * Native `BinaryExpression` with `doGenCode`, so blocked-pair linkage
  * scans stay inside whole-stage codegen (B21 preference order: native
  * expression over UDF).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object StringSim {

  /** Column API. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    graftshim.toColumn(JaroWinkler(
      graftshim.toExpression(a), graftshim.toExpression(b)))

  /** The scalar kernel — static so generated code calls it directly. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def jaro(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val matched1 = new Array[Boolean](n1)
    val matched2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var k = lo
      var found = false
      while (!found && k <= hi) {
        if (!matched2(k) && s1.charAt(i) == s2.charAt(k)) {
          matched1(i) = true
          matched2(k) = true
          m += 1
          found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / n1 + md / n2 + (md - t / 2) / md) / 3.0
  }
}
