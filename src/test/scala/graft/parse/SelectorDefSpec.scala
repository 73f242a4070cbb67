package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** selectors.yml definition flattening — the YAML grammar corners that
  * don't need a Spark session.
  */
class SelectorDefSpec extends AnyFunSuite {

  private def parse(yamlText: String): (Seq[String], Seq[String]) = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    ProjectLoader.parseSelectorDef(yaml.load[Object](yamlText))
  }

  test("bare string definition") {
    assert(parse("tag:nightly") === (Seq("tag:nightly"), Nil))
  }

  test("method with graph-operator flags and depths") {
    assert(parse(
      """method: fqn
        |value: m1
        |parents: true
        |parents_depth: 2
        |children: true
        |""".stripMargin) === (Seq("2+fqn:m1+"), Nil))
    assert(parse(
      """method: tag
        |value: core
        |childrens_parents: true
        |""".stripMargin) === (Seq("@tag:core"), Nil))
    assert(parse(
      """method: tag
        |value: core
        |children: true
        |children_depth: 3
        |""".stripMargin) === (Seq("tag:core+3"), Nil))
  }

  test("union collects atoms and excludes") {
    assert(parse(
      """union:
        |  - tag:a
        |  - method: group
        |    value: core
        |  - exclude:
        |      - tag:skip
        |      - fqn:tmp
        |""".stripMargin) === (Seq("tag:a", "group:core"), Seq("tag:skip", "fqn:tmp")))
  }

  test("intersection joins atoms with commas") {
    assert(parse(
      """intersection:
        |  - tag:a
        |  - tag:b
        |""".stripMargin) === (Seq("tag:a,tag:b"), Nil))
  }

  test("union nested inside intersection is rejected") {
    val e = intercept[Exception](parse(
      """intersection:
        |  - tag:a
        |  - union: [tag:b, tag:c]
        |""".stripMargin))
    assert(e.getMessage.contains("not supported"))
  }

  test("method without value is an error") {
    val e = intercept[Exception](parse("method: tag"))
    assert(e.getMessage.contains("value"))
  }
}
