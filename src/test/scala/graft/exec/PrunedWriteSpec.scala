package graft.exec

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-pruned write edge cases beyond the m40 happy-path gate:
  * the guards that route a merge BACK to the full rewrite (layout
  * mismatch, unsafe/null partition values, >256 touched partitions)
  * and the carried-by-reference invariants (old commit intact,
  * key-move partitions rewritten).
  */
class PrunedWriteSpec extends SparkSpec {

  import spark.implicits._

  private def mkWh() = new Warehouse(spark, tmpDir("pw_wh"))

  private def base = (1L to 300L).map(i => (i, i % 5, s"r$i"))
    .toDF("id", "p", "payload")

  test("writeTablePruned: carried partitions hard-link; old commit intact") {
    val wh = mkWh()
    wh.writeTable("t", base, partitionBy = Seq("p"))
    val newContent = base.filter(col("p") === 2)
      .withColumn("payload", lit("updated"))
    val (carried, linked) = wh.writeTablePruned("t", newContent,
      Seq("p"), Set(Seq("2")))
    assert(carried == 4 && linked > 0)
    // read-back: partition 2 replaced, others untouched
    val out = wh.read("t")
    assert(out.filter(col("p") === 2 && col("payload") =!= "updated").count() == 0)
    assert(out.filter(col("p") =!= 2).count() == 240)
    assert(out.count() == 300)
    // the previous version dir still reads standalone (vacuum fence /
    // in-flight reader guarantee)
    val v0 = spark.read.parquet(s"${wh.root}/t/v0")
    assert(v0.count() == 300)
  }

  test("two-level partitioning: tuples classify at leaf depth") {
    val wh = mkWh()
    val df = (1L to 240L).map(i => (i, i % 3, i % 4, s"r$i"))
      .toDF("id", "p", "q", "payload")
    wh.writeTable("t2", df, partitionBy = Seq("p", "q"))
    assert(wh.canWritePruned("t2", Seq("p", "q")))
    // touch exactly (p=1, q=2); the other 11 leaf partitions carry
    val touched = df.filter(col("p") === 1 && col("q") === 2)
      .withColumn("payload", lit("upd"))
    val (carried, linked) = wh.writeTablePruned("t2", touched,
      Seq("p", "q"), Set(Seq("1", "2")))
    assert(carried == 11 && linked > 0,
      s"expected 11 carried leaves, got $carried ($linked linked)")
    val out = wh.read("t2")
    assert(out.count() == 240)
    assert(out.filter(col("p") === 1 && col("q") === 2 &&
      col("payload") =!= "upd").count() == 0)
    assert(out.filter(col("payload") === "upd").count() == 20)
  }

  test("vacuum after a pruned write: old commit dir GC'd, links survive") {
    val wh = mkWh()
    wh.writeTable("t", base, partitionBy = Seq("p"))
    wh.writeTablePruned("t",
      base.filter(col("p") === 1).withColumn("payload", lit("v2")),
      Seq("p"), Set(Seq("1")))
    // immediate GC (retention fence 0): v0 is an orphan now
    assert(wh.vacuum("t", retainSeconds = 0L) == 1)
    assert(!new java.io.File(s"${wh.root}/t/v0").exists())
    // hard links share inodes — the carried partitions read intact
    val out = wh.read("t")
    assert(out.count() == 300)
    assert(out.filter(col("p") === 1 && col("payload") =!= "v2").count() == 0)
    assert(out.filter(col("p") =!= 1).count() == 240)
  }

  test("canWritePruned: false for unpartitioned layout and for views") {
    val wh = mkWh()
    wh.writeTable("flat", base) // no partitionBy -> data files at depth 0
    assert(!wh.canWritePruned("flat", Seq("p")))
    wh.createView("v", base)
    assert(!wh.canWritePruned("v", Seq("p")))
    wh.writeTable("part", base, partitionBy = Seq("p"))
    assert(wh.canWritePruned("part", Seq("p")))
    // depth mismatch: asking for two levels over a one-level layout
    assert(!wh.canWritePruned("part", Seq("p", "id")))
  }

  test("canWritePruned: false when stored dirs carry a DIFFERENT partition column") {
    val wh = mkWh()
    // stored as region=... but the new config says partition_by=[yr]:
    // linking region dirs under yr= names would silently corrupt — the
    // guard must reject on the dir NAME, not just nesting depth
    wh.writeTable("renamed", base.withColumnRenamed("p", "region"),
      partitionBy = Seq("region"))
    assert(!wh.canWritePruned("renamed", Seq("yr")))
    assert(wh.canWritePruned("renamed", Seq("region")))
  }

  test("canWritePruned: false when stored layout is DEEPER than partition_by") {
    val wh = mkWh()
    // stored [p, q]; new config [p]: the p= leaves hold q= subdirs, not
    // data files — a carried leaf would link zero files (silent loss)
    wh.writeTable("two", base.withColumn("q", col("id") % 2),
      partitionBy = Seq("p", "q"))
    assert(!wh.canWritePruned("two", Seq("p")))
    assert(wh.canWritePruned("two", Seq("p", "q")))
    // and stored [p] with new [q, p]: first-level name mismatch
    wh.writeTable("one", base, partitionBy = Seq("p"))
    assert(!wh.canWritePruned("one", Seq("q")))
  }

  test("merge falls back to full rewrite when partition values are unsafe") {
    val wh = mkWh()
    val eng = new graft.run.Engine(spark, graft.core.Manifest(Map.empty), wh.root)
    // partition values contain spaces -> hive-escaped dirs -> fallback;
    // correctness must be unaffected either way
    (1L to 100L).map(i => (i, s"grp ${i % 3}", i * 2))
      .toDF("id", "p", "v").createOrReplaceTempView("pw_src")
    val full = "SELECT id, p, v FROM pw_src"
    Materializer.incremental(eng.wh, "pw_unsafe", full, full, "merge",
      Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    Materializer.lastPrunedWrite.set(None)
    Materializer.incremental(eng.wh, "pw_unsafe", full,
      "SELECT id, p, v * 10 AS v FROM pw_src WHERE id <= 10", "merge",
      Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    assert(Materializer.lastPrunedWrite.get().isEmpty,
      "unsafe partition values must not take the pruned path")
    val out = eng.wh.read("pw_unsafe")
    assert(out.filter(col("id") <= 10 && col("v") =!= col("id") * 20).count() == 0)
    assert(out.count() == 100)
  }

  test("merge falls back when a partition value is null") {
    val wh = mkWh()
    val eng = new graft.run.Engine(spark, graft.core.Manifest(Map.empty), wh.root)
    (1L to 50L).map(i => (i, if (i % 7 == 0) None else Some(i % 3), i))
      .toDF("id", "p", "v").createOrReplaceTempView("pw_null_src")
    val full = "SELECT id, p, v FROM pw_null_src"
    Materializer.incremental(eng.wh, "pw_null", full, full, "merge",
      Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    Materializer.lastPrunedWrite.set(None)
    Materializer.incremental(eng.wh, "pw_null", full,
      "SELECT id, p, v + 1000 AS v FROM pw_null_src WHERE id % 7 = 0", "merge",
      Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    assert(Materializer.lastPrunedWrite.get().isEmpty,
      "null partition values must not take the pruned path")
    assert(eng.wh.read("pw_null").filter(col("v") >= 1000).count() == 7)
  }

  test("key-move: the key's OLD partition is rewritten, not carried") {
    val wh = mkWh()
    val eng = new graft.run.Engine(spark, graft.core.Manifest(Map.empty), wh.root)
    (1L to 100L).map(i => (i, i % 4, i)).toDF("id", "p", "v")
      .createOrReplaceTempView("pw_mv_src")
    val full = "SELECT id, p, v FROM pw_mv_src"
    Materializer.incremental(eng.wh, "pw_mv", full, full, "merge",
      Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    Materializer.lastPrunedWrite.set(None)
    // id=8 lives in p=0; the delta moves it to p=3
    Materializer.incremental(eng.wh, "pw_mv", full,
      "SELECT CAST(8 AS BIGINT) AS id, CAST(3 AS BIGINT) AS p, CAST(999 AS BIGINT) AS v",
      "merge", Seq("id"), "ignore", Seq("p"), fullRefresh = false)
    val Some((_, rewritten, carried, _)) = Materializer.lastPrunedWrite.get()
    assert(rewritten == 2 && carried == 2,
      s"touched must be {0,3}: rewritten=$rewritten carried=$carried")
    val out = eng.wh.read("pw_mv")
    assert(out.filter(col("id") === 8).select("p", "v").as[(Long, Long)]
      .collect().toSeq == Seq((3L, 999L)))
    assert(out.count() == 100)
  }
}
