package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JaroWinkler parity with the DuckDB/rapidfuzz reference semantics
  * (q180's oracle function): classic literature pairs pinned from
  * `SELECT jaro_winkler_similarity(...)` in DuckDB 1.0, plus the
  * boost-threshold and null edges.
  */
class StringSimSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = StringSim.jaroWinkler(a, b)

  test("classic pairs match DuckDB jaro_winkler_similarity") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 1.0)
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    // jaro = 2/3 with a 3-char common prefix: NO boost (DuckDB: 0.6667)
    assert(math.abs(jw("aaapqr", "aaaxyz") - 0.6666666666666666) < 1e-12)
    // no common prefix: boost is a no-op even above threshold
    assert(math.abs(jw("CRAP", "TRAP") - 0.8333333333333334) < 1e-12)
    // prefix length caps at 4 (DuckDB: 0.88 for 6-char common prefix)
    assert(math.abs(jw("prefix_aaa", "prefix_zzz") - 0.88) < 1e-12)
  }

  test("column API is symmetric, bounded, and null-safe in a plan") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("zzz", "aaa"), ("same", "same")).toDF("a", "b")
    val scored = df.select(
      StringSim.jaroWinklerCol(col("a"), col("b")).as("ab"),
      StringSim.jaroWinklerCol(col("b"), col("a")).as("ba"))
    scored.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "symmetry")
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0, "bounds")
    }
    val withNull = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(StringSim.jaroWinklerCol(col("a"), col("b")).as("s"))
    assert(withNull.collect().head.isNullAt(0))
  }
}
