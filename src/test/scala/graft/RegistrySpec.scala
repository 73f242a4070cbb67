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
}
