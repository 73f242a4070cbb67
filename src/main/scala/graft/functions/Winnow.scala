package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 "Winnowing: Local Algorithms for Document
  * Fingerprinting"): polynomial rolling hash over character k-grams,
  * then the minimum hash of every w-hash window, deduplicated. Two
  * documents sharing any substring of length ≥ w+k-1 are guaranteed to
  * share a fingerprint — the candidate-generation property plagiarism/
  * near-dup detectors rely on.
  *
  * Emitted as a native expression for the same reason as Shingles: the
  * inner loop is per-character and must not pay interpreted-expression
  * dispatch. Output: array<long> of distinct selected hashes (order of
  * first selection).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 2, "winnow needs k >= 2 and w >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Polynomial hash over Z/M with M = 2^31-1 (Mersenne prime) and base
  // B = 1000003. Mod-prime (not wrapping-64-bit) arithmetic is chosen
  // deliberately: any engine with 64-bit integers can replay the exact
  // hash family (sum of byte*B^j mod M never exceeds 2^43), which is
  // what lets q43's oracle recompute these fingerprints in portable
  // SQL. 31-bit fingerprints admit ~2^-31 per-pair collisions — noise
  // for candidate GENERATION, where downstream verification filters
  // false positives anyway.
  private val B = 1000003L
  private val M = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // rolling hashes of all k-grams, each normalized into [0, M)
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    var pow = 1L // B^(k-1) mod M
    var i = 0
    while (i < k) {
      h = (h * B + (bytes(i) & 0xff)) % M
      if (i < k - 1) pow = pow * B % M
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < m) {
      val t = (h - (bytes(i - 1) & 0xff) * pow) % M // in (-M, M)
      h = (t * B + (bytes(i + k - 1) & 0xff)) % M
      if (h < 0) h += M
      hashes(i) = h
      i += 1
    }
    // winnow: min of each w-window (rightmost min on ties, per paper)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= w) {
      var best = hashes(0); i = 1
      while (i < m) { if (hashes(i) <= best) best = hashes(i); i += 1 }
      seen.add(best)
    } else {
      var start = 0
      while (start + w <= m) {
        var best = hashes(start)
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= best) best = hashes(j); j += 1 }
        seen.add(best)
        start += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprint"
}

object Winnow {
  /** Column API: winnowing fingerprints of a text column. */
  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    graftshim.toColumn(WinnowFingerprint(graftshim.toExpression(text), k, w))
}
