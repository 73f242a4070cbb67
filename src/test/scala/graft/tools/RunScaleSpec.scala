package graft.tools

import graft.SparkSpec

/** Execution-scale bound (VERDICT r15 item 4): the 2000-node build
  * wall — scheduler + materialization + test-runner overhead at node
  * scale — on the same synthetic DAG RunScaleBench measures
  * (RUN_SCALE_r15.json: warm cycle ~22 s at local[32]/16 threads; this
  * spec runs on the shared local[4] test session, so the bound is
  * generous, catching regressions in kind — an accidental O(n²)
  * scheduler or a per-node Spark action leak — not machine noise).
  * ParsePerfSpec pins the parse phase alone at < 5 s.
  */
class RunScaleSpec extends SparkSpec {

  test("2000-node DAG builds end-to-end under the scale bound") {
    val proj = SparkSpec.registerScratch(RunScaleBench.genProject(1800, 100))
    val c = RunScaleBench.oneCycle(spark, proj, threads = 8)
    info(f"parse ${c.parseSec}%.2f s, init ${c.initSec}%.2f s, " +
      f"run ${c.runSec}%.2f s, test ${c.testSec}%.2f s")
    // every node executed: 1800 views + 100 tables succeed, 100 tests pass
    assert(c.nSuccess === 1900)
    assert(c.nPass === 100)
    val total = c.parseSec + c.initSec + c.runSec + c.testSec
    assert(total < 150.0,
      f"2000-node build took $total%.1f s — scheduler/materialization " +
        "overhead regressed (RUN_SCALE_r15.json baseline: ~22 s warm at local[32])")
  }
}
