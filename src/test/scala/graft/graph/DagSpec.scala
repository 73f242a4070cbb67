package graft.graph

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {

  private def model(name: String, deps: Seq[String] = Nil, tags: Set[String] = Set.empty) =
    ModelNode(name, "SELECT 1", config = NodeConfig(tags = tags),
      dependsOn = deps.map(d => s"model.graft.$d"))

  private val manifest = Manifest(Seq(
    model("a"),
    model("b", Seq("a")),
    model("c", Seq("a"), tags = Set("nightly")),
    model("d", Seq("b", "c")),
    model("e", Seq("d"))).map(n => n.uniqueId -> (n: Node)).toMap)

  private val dag = Dag.fromManifest(manifest)

  test("topo sort respects dependencies") {
    val order = dag.topoSort
    def idx(n: String) = order.indexOf(s"model.graft.$n")
    assert(idx("a") < idx("b")); assert(idx("a") < idx("c"))
    assert(idx("b") < idx("d")); assert(idx("c") < idx("d"))
    assert(idx("d") < idx("e"))
  }

  test("cycle detection") {
    val cyc = Manifest(Seq(
      model("x", Seq("y")), model("y", Seq("x")))
      .map(n => n.uniqueId -> (n: Node)).toMap)
    assertThrows[IllegalStateException](Dag.fromManifest(cyc).topoSort)
  }

  test("ancestors / descendants") {
    assert(dag.ancestors("model.graft.d") ===
      Set("model.graft.a", "model.graft.b", "model.graft.c"))
    assert(dag.descendants("model.graft.a") ===
      Set("model.graft.b", "model.graft.c", "model.graft.d", "model.graft.e"))
    assert(dag.ancestors("model.graft.d", maxDepth = 1) ===
      Set("model.graft.b", "model.graft.c"))
  }

  test("selector: name, graph operators, tag, set ops") {
    def sel(inc: String*) = Selector.select(manifest, dag, inc.toSeq)
      .map(_.stripPrefix("model.graft."))
    assert(sel("b") === Set("b"))
    assert(sel("+d") === Set("a", "b", "c", "d"))
    assert(sel("b+") === Set("b", "d", "e"))
    assert(sel("1+d+1") === Set("b", "c", "d", "e"))
    assert(sel("tag:nightly") === Set("c"))
    assert(sel("b", "c") === Set("b", "c")) // union
    assert(sel("+d,tag:nightly") === Set("c")) // intersection
    assert(Selector.select(manifest, dag, Seq("b+"), exclude = Seq("e"))
      .map(_.stripPrefix("model.graft.")) === Set("b", "d"))
  }

  test("selector: resource_type and source methods") {
    val src = graft.core.SourceNode("main", "raw_orders", "/dev/null")
    val m2 = Manifest(manifest.nodes + (src.uniqueId -> (src: Node)))
    val d2 = Dag.fromManifest(m2)
    assert(Selector.select(m2, d2, Seq("resource_type:source"))
      === Set("source.graft.main.raw_orders"))
    assert(Selector.select(m2, d2, Seq("source:main"))
      === Set("source.graft.main.raw_orders"))
    assert(Selector.select(m2, d2, Seq("source:main.raw_orders"))
      === Set("source.graft.main.raw_orders"))
    assert(Selector.select(m2, d2, Seq("resource_type:model")).size === 5)
    assertThrows[IllegalArgumentException](
      Selector.select(m2, d2, Seq("unknown_method:x")))
  }

  test("selector: group/access/config/test/exposure/metric/result methods") {
    val grouped = ModelNode("g1", "SELECT 1",
      config = NodeConfig(materialized = "table", group = Some("finance"),
        access = "private", schema = Some("mart")))
    val gtest = TestNode("unique_g1_id", "SELECT id FROM g1 GROUP BY id HAVING count(*)>1",
      genericTest = Some("unique"))
    val stest = TestNode("assert_positive", "SELECT * FROM g1 WHERE id < 0")
    val expo = ExposureNode("weekly_dash", refs = Seq("g1"))
    val metric = MetricNode("revenue", "g1", "sum(x)")
    val m2 = Manifest(manifest.nodes ++ Seq(
      grouped, gtest, stest, expo, metric).map(n => n.uniqueId -> (n: Node)))
    val d2 = Dag.fromManifest(m2)
    def sel(inc: String*) = Selector.select(m2, d2, inc.toSeq)
    assert(sel("group:finance") === Set("model.graft.g1"))
    assert(sel("access:private") === Set("model.graft.g1"))
    assert(sel("config.materialized:table") === Set("model.graft.g1"))
    assert(sel("config.schema:mart") === Set("model.graft.g1"))
    assert(sel("test_type:generic") === Set(gtest.uniqueId))
    assert(sel("test_type:singular") === Set(stest.uniqueId))
    assert(sel("test_name:unique") === Set(gtest.uniqueId))
    assert(sel("exposure:weekly_dash") === Set(expo.uniqueId))
    assert(sel("metric:revenue") === Set(metric.uniqueId))
    assertThrows[IllegalArgumentException](sel("result:error"))
    val byResult = Selector.withResults(Map(
      "model.graft.g1" -> "error", "model.graft.a" -> "success")) {
      sel("result:error")
    }
    assert(byResult === Set("model.graft.g1"))
  }

  test("@ operator: descendants plus their ancestors") {
    val sel = Selector.select(manifest, dag, Seq("@c")).map(_.stripPrefix("model.graft."))
    assert(sel === Set("a", "b", "c", "d", "e"))
  }

  test("graph queue releases nodes in dependency order") {
    val q = new GraphQueue(dag, dag.nodes)
    val first = q.poll().get
    assert(first === "model.graft.a")
    assert(q.poll() === None) // b,c blocked until a done
    q.markDone(first)
    val next = Set(q.poll().get, q.poll().get)
    assert(next === Set("model.graft.b", "model.graft.c"))
  }

  test("graph queue failure skips descendants") {
    val q = new GraphQueue(dag, dag.nodes)
    val a = q.poll().get
    val skipped = q.markFailed(a)
    assert(skipped === Set("model.graft.b", "model.graft.c", "model.graft.d", "model.graft.e"))
    assert(q.isComplete)
  }

  test("depth scores") {
    val s = dag.depthScores
    assert(s("model.graft.a") === 0)
    assert(s("model.graft.d") === 2)
    assert(s("model.graft.e") === 3)
  }
}
