package graft.exec

import graft.SparkSpec
import graft.core._
import graft.run.Engine
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5 port strategy): SCD2 invariants —
  * validity intervals partition time per key, exactly one open row per
  * live key — and incremental merge ≡ full rebuild, across randomized
  * mutation scripts. (Bare scalacheck Gen with explicit seeds — the
  * scalatest bridge artifact isn't on the offline classpath.)
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private val keyCount = 12

  /** A batch = per-key (present?, payloadVersion). */
  private val batchGen: Gen[Seq[(Long, Boolean, Int)]] =
    Gen.sequence[Seq[(Long, Boolean, Int)], (Long, Boolean, Int)](
      (1L to keyCount).map(k =>
        for {
          present <- Gen.frequency(4 -> true, 1 -> false)
          ver <- Gen.choose(0, 3)
        } yield (k, present, ver)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(42L + i))
      .getOrElse(fail("generator produced no value")))

  test("SCD2 check-strategy invariants hold under random mutation scripts") {
    samples(Gen.listOfN(3, batchGen), 8).foreach { batches =>
      val wh = new Engine(spark, Manifest(Map.empty), tmpDir("prop_wh")).wh
      var t = 0
      batches.foreach { batch =>
        val rows = batch.collect { case (k, true, ver) => (k, s"v$ver") }
        if (rows.nonEmpty) {
          rows.toDF("id", "payload").createOrReplaceTempView("prop_src")
          val clock: Materializer.Clock =
            () => new java.sql.Timestamp(1000000000L + t * 86400000L)
          Materializer.snapshot(wh, "prop_snap", "SELECT * FROM prop_src",
            Seq("id"), CheckStrategy(Some(Seq("payload"))),
            invalidateHardDeletes = true, clock)
          t += 1
        }
      }
      if (wh.exists("prop_snap")) {
        val snap = wh.read("prop_snap").cache()
        try {
          // at most one open row per key
          val openDupes = snap.filter(col("dbt_valid_to").isNull)
            .groupBy("id").count().filter(col("count") > 1).count()
          assert(openDupes === 0, "more than one open row for a key")
          // intervals never invert
          assert(snap.filter(col("dbt_valid_to") < col("dbt_valid_from")).count() === 0)
          // closed intervals don't overlap per key: sort by valid_from,
          // each next valid_from >= previous valid_to
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("id").orderBy("dbt_valid_from")
          val overlaps = snap
            .withColumn("prev_to", lag("dbt_valid_to", 1).over(w))
            .filter(col("prev_to").isNotNull && col("dbt_valid_from") < col("prev_to"))
            .count()
          assert(overlaps === 0, "overlapping validity intervals")
        } finally snap.unpersist()
      }
    }
  }

  test("incremental merge over random batches equals full rebuild of latest state") {
    samples(Gen.listOfN(3, batchGen), 8).foreach { batches =>
      val wh = new Engine(spark, Manifest(Map.empty), tmpDir("prop_wh2")).wh
      // latest-wins reference state maintained in plain Scala
      val expected = scala.collection.mutable.Map[Long, String]()
      var wrote = false
      batches.foreach { batch =>
        val rows = batch.collect { case (k, true, ver) => (k, s"v$ver") }
        if (rows.nonEmpty) {
          rows.foreach { case (k, v) => expected(k) = v }
          rows.toDF("id", "payload").createOrReplaceTempView("prop_inc_src")
          Materializer.incremental(wh, "prop_inc",
            "SELECT * FROM prop_inc_src", "SELECT * FROM prop_inc_src",
            "merge", Seq("id"), "ignore", Nil, fullRefresh = false)
          wrote = true
        }
      }
      if (wrote) {
        val actual = wh.read("prop_inc").as[(Long, String)].collect().toMap
        assert(actual === expected.toMap)
      }
    }
  }

  // (the q48 min-label propagation property test moved to
  // graft.queries.TextOpsSpec, where it runs the real kernel)

  test("Hamilton allocation: exact order sums, every line within 1 cent of its share") {
    val orderGen: Gen[(Long, Long, Seq[Long])] = for {
      key <- Gen.choose(1L, 1000000L)
      total <- Gen.choose(1L, 100000000L)
      nLines <- Gen.choose(1, 9)
      exts <- Gen.listOfN(nLines, Gen.choose(1L, 5000000L))
    } yield (key, total, exts)
    val orders = samples(orderGen, 60).distinctBy(_._1)
    val li = orders.flatMap { case (k, _, exts) =>
      exts.zipWithIndex.map { case (e, i) => (k, i + 1, e) }
    }.toDF("l_orderkey", "l_linenumber", "ext_cents")
    val o = orders.map { case (k, t, _) => (k, t) }
      .toDF("o_orderkey", "order_cents")
    val alloc = graft.queries.Ext6.hamiltonAllocate(li, o).collect()
    val byOrder = alloc.groupBy(_.getLong(0))
    val expect = orders.map(t => t._1 -> t).toMap
    byOrder.foreach { case (k, lines) =>
      val (_, total, exts) = expect(k)
      assert(lines.map(_.getLong(4)).sum === total,
        s"order $k: allocation must sum exactly to its cents")
      val tot = exts.sum
      lines.foreach { r =>
        val ext = exts(r.getInt(1) - 1)
        val exact = total.toDouble * ext / tot
        assert(math.abs(r.getLong(4) - exact) < 1.0,
          s"order $k line ${r.getInt(1)}: ${r.getLong(4)} vs exact $exact")
      }
    }
  }

  test("time travel reads append-log prefixes; vacuum removes replace orphans") {
    import spark.implicits._
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("prop_wh3")).wh
    wh.writeTable("tt", Seq((1L, "a")).toDF("id", "v"))
    wh.appendTable("tt", Seq((2L, "b")).toDF("id", "v"))
    wh.appendTable("tt", Seq((3L, "c")).toDF("id", "v"))
    assert(wh.versions("tt") === Seq(0, 1, 2))
    // as-of each commit: strictly growing prefixes
    assert(wh.readAsOf("tt", 0).count() === 1)
    assert(wh.readAsOf("tt", 1).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    assert(wh.readAsOf("tt", 2).count() === 3)
    intercept[IllegalArgumentException] { wh.readAsOf("tt", -1) }
    // replace orphans the three old dirs
    wh.writeTable("tt", Seq((9L, "z")).toDF("id", "v"))
    // default retention fence: fresh orphans survive (in-flight readers
    // registered before the replace stay readable)...
    assert(wh.vacuum("tt") === 0)
    // ...and retainSeconds=0 forces the immediate GC of exactly them
    assert(wh.vacuum("tt", retainSeconds = 0) === 3)
    assert(wh.read("tt").as[(Long, String)].collect().toSet === Set((9L, "z")))
    // durability: a recovered warehouse sees the vacuumed state
    val wh2 = new graft.exec.Warehouse(spark, wh.root)
    assert(wh2.read("tt").count() === 1)
    assert(wh2.vacuum("tt", retainSeconds = 0) === 0)
  }

  test("readers holding a snapshot survive interleaved replace+vacuum (fence)") {
    import spark.implicits._
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("prop_wh4")).wh
    def rows(n: Int) = (1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v")

    // sequential interleaving first — the exact r5-advice scenario: a
    // lazy DataFrame obtained BEFORE a replace must evaluate correctly
    // after replace + retention-fenced vacuum
    wh.writeTable("cc", rows(100))
    val snap0 = wh.read("cc")
    wh.appendTable("cc", rows(50))
    val asOf0 = wh.readAsOf("cc", 0)
    wh.writeTable("cc", rows(200)) // replace orphans v0+v1
    assert(wh.vacuum("cc") === 0, "fresh orphans stay inside the fence")
    assert(snap0.count() === 100, "pre-replace snapshot must stay readable")
    assert(asOf0.count() === 100, "as-of snapshot must stay readable")
    assert(wh.read("cc").count() === 200)

    // concurrent interleaving: writers replace+vacuum while readers
    // loop; every observed count must equal SOME committed version's
    // count — never a partial or mixed state
    val validCounts = Set(200L, 300L, 400L, 500L)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 2).map(_ => new Thread(() => {
      while (!stop.get()) {
        try {
          val c = wh.read("cc").count()
          if (!validCounts.contains(c)) errors.add(s"saw count $c")
        } catch { case e: Throwable => errors.add(s"reader failed: ${e.getMessage}") }
      }
    }))
    readers.foreach(_.start())
    try {
      Seq(300, 400, 500).foreach { n =>
        wh.writeTable("cc", rows(n))
        wh.vacuum("cc") // fenced: never deletes what a reader may hold
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }
    assert(errors.isEmpty, errors.toArray.take(5).mkString("; "))
    assert(wh.read("cc").count() === 500)

    // after the fence is lifted (retainSeconds=0), orphans GC and a
    // stale snapshot fails CLOSED — an error, never silent wrong data
    assert(wh.vacuum("cc", retainSeconds = 0) > 0)
    intercept[Exception] { snap0.count() }
  }
}
