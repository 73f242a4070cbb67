package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing invariants (the paper's guarantees, tested — not the
  * implementation's own arithmetic).
  */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  private val k = 8
  private val w = 16

  private def fp(c: org.apache.spark.sql.Column) =
    Winnow.winnowFingerprint(c, k, w)

  test("identical documents produce identical fingerprint sets") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again"),
      ("b", "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
      .select(col("id"), array_sort(fp(col("text"))).as("fps"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](1) === rows(1).getSeq[Long](1))
    assert(rows(0).getSeq[Long](1).nonEmpty)
  }

  test("documents sharing a long substring share at least one fingerprint") {
    // guarantee: common substring of length >= w + k - 1 (= 23) => a
    // shared fingerprint
    val common = "x" * 5 + " shared substring fragment of ample length " + "y" * 5
    val df = Seq(
      ("a", s"prefix one $common suffix alpha"),
      ("b", s"completely different start $common and другой end"))
      .toDF("id", "text")
      .select(col("id"), fp(col("text")).as("fps"))
    val Seq(fa, fb) = df.collect().toSeq.map(_.getSeq[Long](1).toSet)
    assert(fa.intersect(fb).nonEmpty)
  }

  test("disjoint documents share no fingerprints (overwhelming probability)") {
    val df = Seq(
      ("a", "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll"),
      ("b", "mmmm nnnn oooo pppp qqqq rrrr ssss tttt uuuu vvvv wwww xxxx"))
      .toDF("id", "text")
      .select(col("id"), fp(col("text")).as("fps"))
    val Seq(fa, fb) = df.collect().toSeq.map(_.getSeq[Long](1).toSet)
    assert(fa.intersect(fb).isEmpty)
  }

  test("short text yields empty or single fingerprint, never crashes") {
    val df = Seq(("a", ""), ("b", "tiny"), ("c", "exactly8"), ("d", "just over k"))
      .toDF("id", "text")
      .select(col("id"), fp(col("text")).as("fps"))
    val sizes = df.select(size(col("fps"))).as[Int].collect()
    assert(sizes(0) === 0) // empty
    assert(sizes(1) === 0) // < k chars
    assert(sizes(2) === 1) // one k-gram -> one fingerprint
  }

  test("density: fingerprints per char bounded by ~2/(w+1) expectation") {
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 20)
    val n = Seq(("a", text)).toDF("id", "text")
      .select(size(fp(col("text")))).head().getInt(0)
    // winnowing selects ≈ 2/(w+1) of positions; allow generous slack
    val positions = text.length - k + 1
    assert(n > 0 && n < positions * 4.0 / (w + 1),
      s"selected $n of $positions k-grams")
  }
}
