package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract indexes queries by name (`SparkEntry.queries` is
  * a Map) — a duplicate name across registries would silently shadow an
  * earlier query and its oracle. Enforce uniqueness here, plus the
  * naming conventions the gate tooling (Verify name-prefix args, Bench's
  * q-filter) relies on.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across all registries") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("names follow the q<digits>_/m<digits>_ convention Bench filters on") {
    val bad = SparkEntry.allQueries.map(_.name)
      .filterNot(_.matches("[qm]\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"unconventional names: ${bad.mkString(", ")}")
  }

  test("every analytical q-query carries a DuckDB oracle") {
    val missing = SparkEntry.allQueries
      .filter(q => q.name.startsWith("q") && q.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"q-queries without oracle: ${missing.mkString(", ")}")
  }

  test("isThroughput partitions the registry exactly along the q/m split") {
    // Bench's headline set is the TYPED flag, not the name prefix
    // (VERDICT r12 nit): this pins that the two stay in agreement, so
    // a new m-gate accidentally left isThroughput=true (it would be
    // timed against scratch warehouses) or a q-query flagged false (it
    // would silently vanish from the bench) both fail structurally.
    val misflagged = SparkEntry.allQueries
      .filter(q => q.isThroughput != q.name.startsWith("q")).map(_.name)
    assert(misflagged.isEmpty,
      s"isThroughput/name-prefix disagreement: ${misflagged.mkString(", ")}")
    assert(SparkEntry.allQueries.count(_.isThroughput) > 200)
    assert(SparkEntry.allQueries.exists(!_.isThroughput))
  }
}
