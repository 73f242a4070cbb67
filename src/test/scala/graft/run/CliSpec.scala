package graft.run

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("option parsing: flags, values, multi-values, booleans") {
    val opts = Cli.parseOpts(List(
      "--project", "/p", "--select", "a", "b+", "--threads", "8",
      "--full-refresh", "--vars", "k=v,x=y"))
    assert(opts("project") === "/p")
    assert(opts("select") === "a b+")
    assert(opts("threads") === "8")
    assert(opts("full-refresh") === "true")
    assert(opts("vars") === "k=v,x=y")
  }

  test("trailing boolean flag and empty args") {
    assert(Cli.parseOpts(Nil) === Map.empty)
    val opts = Cli.parseOpts(List("--warehouse", "/w", "--full-refresh"))
    assert(opts === Map("warehouse" -> "/w", "full-refresh" -> "true"))
  }
}
