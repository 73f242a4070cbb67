package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Injectivity of the format-4 checksum rendering (ADVICE r11 + r12):
  * format 1's unescaped join delimiters let leaf content forge
  * structure — Map("a" -> "b,c=d") and Map("a" -> "b", "c" -> "d")
  * both rendered "{a=b,c=d}"; format 3 rendered products by bare
  * `productPrefix`, so the string leaf ":(1:~,5:Nil())" forged
  * `List(null)` (cons class `::` begins with the leaf discriminator).
  * Either collision makes artifact-based state:modified silently SKIP
  * a genuinely edited node. These cases pin the length-prefixed,
  * discriminator-tagged scheme; the format constant is pinned so any
  * future rendering change is forced to bump it (saved artifacts from
  * a different format must not silently compare — Artifacts errors on
  * a mismatch).
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

  test("string leaf cannot forge a List (the format-3 `::` collision)") {
    // format 3: stable(List(null)) == "::(1:~,5:Nil())" == stable of the
    // string leaf ":(1:~,5:Nil())" — the exact ADVICE r12 forgery
    assert(StateHash.stable(List(null)) !=
      StateHash.stable(":(1:~,5:Nil())"))
    assert(StateHash.stable(Seq(List(null))) !=
      StateHash.stable(Seq(":(1:~,5:Nil())")))
    // and a leaf shaped like a product rendering cannot forge a product
    case class R(a: String)
    val rendered = StateHash.stable(R("x"))
    assert(StateHash.stable(rendered) != rendered,
      "a string leaf equal to a product rendering must not re-render to it")
  }

  test("same-named case classes in different scopes render distinctly") {
    object A { case class T(x: String) }
    object B { case class T(x: String) }
    assert(StateHash.stable(A.T("v")) != StateHash.stable(B.T("v")),
      "products must be keyed on the fully-qualified class name")
  }

  test("equal-content Seq-likes normalize to one rendering") {
    assert(StateHash.stable(List("a", "b")) ==
      StateHash.stable(Vector("a", "b")))
    assert(StateHash.stable(List("a", "b")) ==
      StateHash.stable(Array("a", "b")))
    // a collection-TYPE change is not a modification; an ORDER change is
    assert(StateHash.stable(List("a", "b")) !=
      StateHash.stable(List("b", "a")))
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

  test("distinct random NESTED structures render distinctly (property)") {
    // ADVICE r12: the old sweep drew flat 4-char tokens over three
    // container shapes and compared each sample against only the first
    // 40 — it could not reach the `::` forgery. This one nests
    // containers two deep, draws longer delimiter-heavy tokens
    // INCLUDING ":"-prefixed strings shaped like renderings, and
    // checks ALL pairs by hash-bucketing on the rendering: a bucket
    // with two semantically different members is a collision. Seq
    // generation uses List only, so semantic equality is plain ==
    // (List/Vector normalization can't mask a real difference).
    // (Bare scalacheck Gen with explicit seeds — the scalatest bridge
    // artifact isn't on the offline classpath, same as PropertySpec.)
    val token: Gen[String] = for {
      n <- Gen.choose(0, 8)
      cs <- Gen.listOfN(n, Gen.oneOf(
        ',', '=', ':', '{', '}', '(', ')', '<', '>', '[', ']', '!', '~',
        'a', '1'))
    } yield cs.mkString
    def structure(depth: Int): Gen[Any] =
      if (depth == 0) Gen.oneOf(token, Gen.const(null), token.map(":" + _))
      else Gen.oneOf(
        Gen.listOf(structure(depth - 1)).map(_.take(4)),
        Gen.mapOf(Gen.zip(token, structure(depth - 1))).map(_.take(4)),
        Gen.listOf(token).map(_.take(4).toSet),
        structure(0))
    val params = Gen.Parameters.default
    val samples: Seq[Any] = (1 to 3000).flatMap(i =>
      structure(2).apply(params, Seed(0xC0FFEE + i.toLong)))
    val buckets = samples.groupBy(StateHash.stable)
    for ((rendering, members) <- buckets; x <- members; y <- members)
      assert(x == y, s"collision on $rendering: $x vs $y")
  }

  test("format constant pins the rendering scheme") {
    // if stable() changes, this hash changes — and so must Format
    val fingerprint = StateHash.sha(StateHash.stable(
      Map("a" -> Seq("b,c=d", null), "e" -> Set("f", "1:x"),
        "p" -> (("x", 1)))))
    assert(StateHash.Format == "4")
    assert(fingerprint ==
      "ee1286a33539a0380ba0e33e114041bf7214473520b46cdae5bd2dcf268cd6c7",
      "stable() rendering changed: bump StateHash.Format and regenerate artifacts")
  }
}
