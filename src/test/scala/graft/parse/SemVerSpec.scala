package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Semver semantics (reference `core/dbt/semver.py`): parsing,
  * prerelease ordering, range reduction, installable filtering.
  */
class SemVerSpec extends AnyFunSuite {
  import SemVer._

  private def v(s: String) = parseVersion(s)

  test("version parsing and ordering") {
    assert(v("1.2.3") === Version(1, 2, 3, None))
    assert(v("1.0.0-rc.1").prerelease === Some("rc.1"))
    assert(v("1.0.0+build.5") === Version(1, 0, 0, None)) // build metadata ignored
    assert(v("0.9.9") < v("0.10.0"))
    assert(v("1.0.0-rc.1") < v("1.0.0")) // prerelease below its release
    assert(v("1.0.0-rc.1") < v("1.0.0-rc.2"))
    assert(v("1.0.0-alpha") < v("1.0.0-beta"))
    assert(v("1.0.0-rc.2") < v("1.0.0-rc.11")) // numeric ids compare numerically
    assert(v("1.0.0-1") < v("1.0.0-alpha")) // numeric < alphanumeric
    assert(v("1.0.0-rc") < v("1.0.0-rc.1")) // longer prerelease is higher
    intercept[IllegalArgumentException](parseVersion("1.2"))
  }

  test("specifier parsing: bare versions pin exactly") {
    assert(parseSpecifier("0.8.5") === Specifier("=", v("0.8.5")))
    assert(parseSpecifier(">=0.8.0").matcher === ">=")
    assert(parseSpecifier("<0.9.0").satisfiedBy(v("0.8.9")))
    assert(!parseSpecifier("<0.9.0").satisfiedBy(v("0.9.0")))
    assert(parseSpecifier("<=0.9.0").satisfiedBy(v("0.9.0")))
  }

  test("resolve picks the highest version inside the merged range") {
    val avail = Seq("0.8.0", "0.8.5", "0.9.0", "1.0.0").map(v)
    assert(resolve(Seq(parseSpecifier(">=0.8.0"), parseSpecifier("<0.9.0")),
      avail, installPrerelease = false) === Right(v("0.8.5")))
    assert(resolve(Seq(parseSpecifier(">=0.8.0")), avail, false) === Right(v("1.0.0")))
    assert(resolve(Seq(parseSpecifier("0.8.0")), avail, false) === Right(v("0.8.0")))
  }

  test("prereleases only install when asked for or pinned") {
    val avail = Seq(v("0.9.0"), v("1.0.0-rc.1"))
    assert(resolve(Seq(parseSpecifier(">=0.9.0")), avail, false) === Right(v("0.9.0")))
    assert(resolve(Seq(parseSpecifier(">=0.9.0")), avail, true) === Right(v("1.0.0-rc.1")))
    assert(resolve(Seq(parseSpecifier("1.0.0-rc.1")), avail, false) ===
      Right(v("1.0.0-rc.1")))
  }

  test("disjoint ranges and conflicting pins are compatibility errors") {
    val avail = Seq(v("0.8.0"), v("0.9.0"))
    assert(resolve(Seq(parseSpecifier(">=0.9.0"), parseSpecifier("<0.9.0")),
      avail, false).left.exists(_.contains("not compatible")))
    assert(resolve(Seq(parseSpecifier("0.8.0"), parseSpecifier("0.9.0")),
      avail, false).left.exists(_.contains("not compatible")))
    assert(resolve(Seq(parseSpecifier("0.8.0"), parseSpecifier(">=0.8.5")),
      avail, false).left.exists(_.contains("not compatible")))
    // compatible range with nothing available is a different error
    assert(resolve(Seq(parseSpecifier(">=2.0.0")), avail, false)
      .left.exists(_.contains("no installable version")))
  }
}
