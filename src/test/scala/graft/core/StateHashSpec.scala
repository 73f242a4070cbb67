package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Injectivity of the format-2 checksum rendering (ADVICE r11): with
  * format 1's unescaped join delimiters, leaf content could forge
  * structure — Map("a" -> "b,c=d") and Map("a" -> "b", "c" -> "d")
  * both rendered "{a=b,c=d}", so artifact-based state:modified could
  * silently SKIP a genuinely edited node. These cases pin the
  * length-prefixed scheme; the format constant is pinned so any future
  * rendering change is forced to bump it (saved artifacts from a
  * different format must not silently compare — Artifacts errors on a
  * mismatch).
  */
class StateHashSpec extends AnyFunSuite {

  test("map leaf content cannot forge map structure") {
    val forged = Map("a" -> "b,c=d")
    val real = Map("a" -> "b", "c" -> "d")
    assert(StateHash.stable(forged) != StateHash.stable(real))
  }

  test("set leaf content cannot forge set structure") {
    assert(StateHash.stable(Set("a,b")) != StateHash.stable(Set("a", "b")))
  }

  test("length-prefix digits in a leaf cannot forge a prefix") {
    // "3:abc" as LITERAL leaf content vs the leaf "abc" (rendered 3:abc)
    assert(StateHash.stable(Seq("3:abc")) != StateHash.stable(Seq("abc", "")))
    assert(StateHash.stable(Seq("1:x")) != StateHash.stable(Seq("x")))
  }

  test("product field content cannot forge sibling fields") {
    case class P(a: String, b: String)
    assert(StateHash.stable(P("x),P(y", "z")) != StateHash.stable(P("x", "y")))
    // a one-field and two-field product with gluable content differ
    case class Q(a: String)
    assert(StateHash.stable(Q("x,y")) != StateHash.stable(P("x", "y")))
  }

  test("null renders distinctly from its lookalike strings") {
    assert(StateHash.stable(Seq(null)) != StateHash.stable(Seq("~")))
    assert(StateHash.stable(Seq(null)) != StateHash.stable(Seq("null")))
  }

  test("empty and equal-content collections of different kinds differ") {
    assert(StateHash.stable(Map.empty[String, String]) !=
      StateHash.stable(Set.empty[String]))
    assert(StateHash.stable(Set("a")) != StateHash.stable(Seq("a")))
    assert(StateHash.stable(Set("1:a=1:b")) !=
      StateHash.stable(Map("a" -> "b")))
  }

  test("map ordering is canonical (HashMap iteration order leaks)") {
    val m1 = Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v3")
    val m2 = List("k3" -> "v3", "k1" -> "v1", "k2" -> "v2").toMap
    assert(StateHash.stable(m1) == StateHash.stable(m2))
  }

  test("distinct random string structures render distinctly (property)") {
    // tokens drawn from the delimiter-heavy alphabet that broke format 1
    // (bare scalacheck Gen with explicit seeds — the scalatest bridge
    // artifact isn't on the offline classpath, same as PropertySpec)
    val token = Gen.listOfN(4,
      Gen.oneOf(',', '=', ':', '{', '}', '(', ')', 'a', '1')).map(_.mkString)
    val structure: Gen[Any] = Gen.oneOf(
      Gen.listOf(token).map(_.toSeq),
      Gen.mapOf(Gen.zip(token, token)),
      Gen.listOf(token).map(_.toSet))
    val params = Gen.Parameters.default
    val samples = (1 to 400).flatMap(i =>
      structure.apply(params, Seed(0xC0FFEE + i.toLong)))
    for (x <- samples; y <- samples.take(40); if x != y)
      assert(StateHash.stable(x) != StateHash.stable(y),
        s"collision: $x vs $y")
  }

  test("format constant pins the rendering scheme") {
    // if stable() changes, this hash changes — and so must Format
    val fingerprint = StateHash.sha(StateHash.stable(
      Map("a" -> Seq("b,c=d", null), "e" -> Set("f", "1:x"))))
    assert(StateHash.Format == "3")
    assert(fingerprint ==
      "28bbc39ba940c8f897d147ca67fc6cc7aa686ca112299e2c38c5ba92c914a54d",
      "stable() rendering changed: bump StateHash.Format and regenerate artifacts")
  }
}
