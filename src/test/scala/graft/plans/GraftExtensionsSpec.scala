package graft.plans

import graft.SparkSpec
import graft.functions.{TextExprs, VectorExprs, Winnow}
import org.apache.spark.sql.functions._

/** The SQL function surface must agree exactly with the Column API it
  * wraps — same expressions, so same codegen, same results.
  */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  GraftExtensions.installInto(spark)

  test("shingles/ngrams callable from SQL, equal to the Column API") {
    Seq(("d1", "the quick brown fox jumps")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT shingles(split(text, ' '), 3) AS sh,
        |       shingles(split(text, ' ')) AS sh_default,
        |       ngrams(split(text, ' '), 2) AS ng
        |FROM ext_docs""".stripMargin).head()
    val viaApi = spark.table("ext_docs")
      .select(TextExprs.shingles(split(col("text"), " "), 3).as("sh"),
        TextExprs.ngrams(split(col("text"), " "), 2).as("ng")).head()
    assert(viaSql.getSeq[String](0) === viaApi.getSeq[String](0))
    assert(viaSql.getSeq[String](1) === viaApi.getSeq[String](0)) // default n=3
    assert(viaSql.getSeq[String](2) === viaApi.getSeq[String](1))
  }

  test("vector + winnow functions callable from SQL") {
    val row = spark.sql(
      """SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       array_sq_dist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d2,
        |       winnow_fingerprint('the quick brown fox jumps over the lazy dog') AS fp
        |""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 8.0)
    val viaApi = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(Winnow.winnowFingerprint(col("t")).as("fp")).head().getSeq[Long](0)
    assert(row.getSeq[Long](2) === viaApi)
  }

  test("pair_combos generates doc pairs from a posting list in SQL") {
    val pairs = spark.sql(
      """SELECT pair_combos(array(named_struct('doc_id', 1L, 'n', 10L),
        |                         named_struct('doc_id', 2L, 'n', 20L),
        |                         named_struct('doc_id', 3L, 'n', 30L))) AS ps
        |""".stripMargin)
      .select(explode(col("ps")).as("p"))
      .select("p.doc_a", "p.doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("non-literal n is rejected with a clear error") {
    val e = intercept[Exception](
      spark.sql("SELECT shingles(array('a'), 1 + 2)").head())
    assert(e.getMessage.contains("integer literal"))
  }
}
