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

  test("union nested inside intersection distributes (DNF)") {
    assert(parse(
      """intersection:
        |  - tag:a
        |  - union: [tag:b, tag:c]
        |""".stripMargin) === (Seq("tag:a,tag:b", "tag:a,tag:c"), Nil))
    // two nested unions: full cross product, left-to-right
    assert(parse(
      """intersection:
        |  - union: [tag:a, tag:b]
        |  - union: [tag:c, tag:d]
        |""".stripMargin) ===
      (Seq("tag:a,tag:c", "tag:a,tag:d", "tag:b,tag:c", "tag:b,tag:d"), Nil))
    // intersection nested inside the union branch flattens into each term
    assert(parse(
      """intersection:
        |  - tag:a
        |  - union:
        |      - intersection: [tag:b, tag:c]
        |      - tag:d
        |""".stripMargin) === (Seq("tag:a,tag:b,tag:c", "tag:a,tag:d"), Nil))
    // exclude inside an intersection floats to the global exclude set
    assert(parse(
      """intersection:
        |  - tag:a
        |  - exclude: [tag:skip]
        |""".stripMargin) === (Seq("tag:a"), Seq("tag:skip")))
  }

  test("pathological intersection expansion is capped") {
    val wide = "union: [t:1, t:2, t:3, t:4, t:5, t:6, t:7, t:8, t:9]"
    val e = intercept[Exception](parse(
      s"""intersection:
         |  - $wide
         |  - $wide
         |""".stripMargin))
    assert(e.getMessage.contains("max 64"))
  }

  test("method without value is an error") {
    val e = intercept[Exception](parse("method: tag"))
    assert(e.getMessage.contains("value"))
  }
}
