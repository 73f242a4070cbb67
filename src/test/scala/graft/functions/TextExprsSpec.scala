package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Unit + property coverage for the native text expressions: the
  * Shingles/NGrams pair and the PairCombos posting-list kernel that
  * q26/q48 build on.
  */
class TextExprsSpec extends SparkSpec {

  private def wordsDf(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("text").select(split(col("text"), " ").as("w"))
  }

  test("shingles are distinct, ngrams keep multiplicity") {
    val df = wordsDf(Seq("a b a b a"))
    val sh = df.select(TextExprs.shingles(col("w"), 2).as("s")).head().getSeq[String](0)
    val ng = df.select(TextExprs.ngrams(col("w"), 2).as("n")).head().getSeq[String](0)
    assert(sh === Seq("a b", "b a"))
    assert(ng === Seq("a b", "b a", "a b", "b a"))
    // under-length arrays produce empty results, not errors
    val short = wordsDf(Seq("only")).select(
      TextExprs.shingles(col("w"), 3).as("s"), TextExprs.ngrams(col("w"), 3).as("n")).head()
    assert(short.getSeq[String](0).isEmpty && short.getSeq[String](1).isEmpty)
  }

  test("pairCombos emits normalized i<j pairs with cardinalities") {
    import spark.implicits._
    val postings = Seq((5L, 10L), (2L, 20L), (9L, 30L))
      .toDF("doc_id", "n")
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
    val pairs = postings
      .select(explode(TextExprs.pairCombos(col("ds"))).as("p"))
      .select("p.doc_a", "p.na", "p.doc_b", "p.nb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._3))
    assert(pairs.length === 3) // k(k-1)/2
    assert(pairs.forall(p => p._1 < p._3)) // doc_a < doc_b always
    assert(pairs.contains((2L, 20L, 5L, 10L))) // swapped AND cardinalities follow
    assert(pairs.contains((2L, 20L, 9L, 30L)))
    assert(pairs.contains((5L, 10L, 9L, 30L)))
  }

  test("property: posting-list pairs equal the self-join formulation") {
    import spark.implicits._
    val gen = Gen.listOfN(40, for {
      doc <- Gen.choose(0L, 11L)
      fp <- Gen.choose(0, 7)
    } yield (doc, fp))
    val params = Gen.Parameters.default
    for (seedN <- 1 to 5) {
      val rows = gen.apply(params, rng.Seed(seedN.toLong)).get
        .distinct // one posting per (doc, fp), like distinct shingles
      val df = rows.toDF("doc_id", "fp").withColumn("n", lit(1L))
      // reference: self-join on fp
      val expected = df.as("a").join(df.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      // kernel under test: grouped posting lists + pairCombos
      val actual = df.groupBy("fp")
        .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(TextExprs.pairCombos(col("ds"))).as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      assert(expected.exceptAll(actual).isEmpty && actual.exceptAll(expected).isEmpty,
        s"seed $seedN: pair multisets diverge")
    }
  }

  test("property: normalizeText equals the lower/regex/trim chain") {
    import spark.implicits._
    // alphabet stresses every branch: case folding, digits, kept and
    // dropped punctuation, space runs, unicode letters (dropped after
    // lowercasing), leading/trailing whitespace
    val alphabet = "aAzZ09 .,!-_Éé世  \t"
    val gen = Gen.listOfN(120,
      Gen.choose(0, alphabet.length - 1).map(alphabet.charAt))
    val params = Gen.Parameters.default
    val cases = (1 to 50).map(n =>
      gen.apply(params, rng.Seed(n.toLong)).get.mkString) ++ Seq(
      "", " ", "   ", "a.b", "a . b", "A  B", ".,!", "  hi  THERE  9 ",
      "café touché", "İstanbul", "tab\there")
    val df = cases.toDF("s")
    val viaChain = df.select(col("s"),
      trim(regexp_replace(
        regexp_replace(lower(col("s")), "[^a-z0-9 ]+", ""),
        " +", " ")).as("expected"),
      TextExprs.normalizeText(col("s")).as("actual"))
    val diverging = viaChain.filter(col("expected") =!= col("actual"))
    assert(diverging.count() === 0,
      diverging.collect().take(5).mkString("; "))
    // punctToSpace mode: non-alnum runs -> one space, then trim
    val viaChain2 = df.select(col("s"),
      trim(regexp_replace(lower(col("s")), "[^a-z0-9]+", " "))
        .as("expected"),
      TextExprs.normalizeText(col("s"), punctToSpace = true).as("actual"))
    val diverging2 = viaChain2.filter(col("expected") =!= col("actual"))
    assert(diverging2.count() === 0,
      diverging2.collect().take(5).mkString("; "))
    // null in, null out — same as the regex chain
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextExprs.normalizeText(col("s"))).head()
    assert(n.isNullAt(0))
  }
}
