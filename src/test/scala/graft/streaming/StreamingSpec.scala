package graft.streaming

import graft.SparkSpec
import graft.core.Manifest
import graft.run.Engine
import org.apache.spark.sql.functions._

/** Streaming correctness = equivalence with the oracle-checked batch
  * twins on the same input (q32/q34 shapes).
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def eventsDir: String = {
    // re-encode events (nanos ts -> micros) into a streamable dir
    val out = tmpDir("events_stream")
    graft.Tables.load(spark, sf, "events")
      .repartition(4) // several files => several micro-batches
      .write.mode("overwrite").parquet(out)
    out
  }

  test("streaming tumbling window equals batch aggregation") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh

    val stream = StreamMaterializer.readEvents(spark, dir, schema)
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_counts",
      StreamMaterializer.tumblingCounts(stream),
      tmpDir("ckpt"), outputMode = "append")
    q.awaitTermination(120000)

    val streamed = wh.read("stream_counts")
      .groupBy("hour", "event_type") // re-agg: late windows may emit once each
      .agg(sum("n").as("n"), sum("sum_value").as("sum_value"))

    val batch = spark.read.parquet(dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
          .cast("double").as("sum_value"))

    // watermark may drop nothing here (files are ordered enough); check
    // that every streamed window matches batch exactly
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("hour", "event_type"), "left")
    assert(joined.filter(col("s.n") =!= col("b.n")).count() === 0)
    assert(streamed.count() > 0)
  }

  test("streaming curation ingest equals the batch filter+dedup flow") {
    // several files => several micro-batches => the cross-batch dedup
    // state and the stream-static anti-join are actually exercised
    val docs = graft.Tables.load(spark, sf, "documents")
    val dir = tmpDir("docs_stream")
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val corpusFps = docs.filter(col("doc_id") % 10 =!= 9)
      .select(md5(substring(col("text"), 1, 40)).as("fp")).distinct()
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .filter(col("doc_id") % 10 === 9) // the incoming batch slice
    val q = StreamMaterializer.writeToWarehouse(
      wh, "ingested",
      StreamMaterializer.curationIngest(stream, corpusFps),
      tmpDir("ckpt"), outputMode = "append")
    q.awaitTermination(120000)

    val batchTwin = StreamMaterializer.curationIngest(
      docs.filter(col("doc_id") % 10 === 9), corpusFps)

    // which doc_id survives a fingerprint group depends on arrival
    // order, so equivalence is on the FINGERPRINT SET (and counts)
    val got = wh.read("ingested").select("fp").collect().map(_.getString(0)).toSet
    val want = batchTwin.select("fp").collect().map(_.getString(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(wh.read("ingested").count() === got.size, "one row per fingerprint")
  }

  test("streaming dedup emits at most one row per key within watermark") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_dedup",
      StreamMaterializer.dedupFirstEvents(
        StreamMaterializer.readEvents(spark, dir, schema)),
      tmpDir("ckpt"))
    q.awaitTermination(120000)
    val out = wh.read("stream_dedup")
    val batchKeys = spark.read.parquet(dir)
      .select("user_id", "event_type").distinct().count()
    // every (user_id, event_type) appears, possibly re-emitted after
    // watermark expiry — but never more often than raw events
    assert(out.select("user_id", "event_type").distinct().count() === batchKeys)
  }

  test("flatMapGroupsWithState running counts converge to batch totals") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_running",
      StreamMaterializer.runningUserCounts(
        StreamMaterializer.readEvents(spark, dir, schema)),
      tmpDir("ckpt"), outputMode = "update")
    q.awaitTermination(120000)
    // the log of update rows ends, per user, at the batch total
    val last = wh.read("stream_running")
      .groupBy("user_id").agg(max("running_n").as("final_n"))
    val batch = spark.read.parquet(dir)
      .groupBy("user_id").agg(count(lit(1)).as("total"))
    val mismatch = last.join(batch, "user_id")
      .filter(col("final_n") =!= col("total"))
    assert(mismatch.count() === 0)
    assert(last.count() === batch.count())
  }

  test("stream-stream interval join equals the batch attribution join") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_ss")).wh
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_attrib",
      StreamMaterializer.viewClickAttribution(
        StreamMaterializer.readEvents(spark, dir, schema)),
      tmpDir("ckpt_ss"))
    q.awaitTermination(120000)
    val streamed = wh.read("stream_attrib")
    val ev = spark.read.parquet(dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val batch = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
    assert(streamed.count() === batch.count())
    assert(streamed.count() > 0)
    // every streamed pair is a real batch pair (no duplicates/phantoms)
    val extra = streamed.join(batch,
      streamed("user_id") === batch("v_user") &&
        streamed("view_ts") === batch("view_ts") &&
        streamed("click_ts") === batch("click_ts"), "left_anti")
    assert(extra.count() === 0)
  }

  test("left-outer interval join: matches equal batch, outer rows are real non-converters") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_lo")).wh
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_attrib_outer",
      StreamMaterializer.viewClickAttributionOuter(
        StreamMaterializer.readEvents(spark, dir, schema)),
      tmpDir("ckpt_lo"))
    q.awaitTermination(120000)
    val streamed = wh.read("stream_attrib_outer")
    val ev = spark.read.parquet(dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val cond = col("v_user") === col("c_user") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS")
    val batchInner = views.join(clicks, cond)
    // matched rows agree exactly with the batch inner join
    val matched = streamed.filter(col("click_ts").isNotNull)
    assert(matched.count() === batchInner.count())
    val phantom = matched.join(batchInner,
      matched("user_id") === batchInner("v_user") &&
        matched("view_ts") === batchInner("view_ts") &&
        matched("click_ts") === batchInner("click_ts"), "left_anti")
    assert(phantom.count() === 0)
    // outer (null-click) rows are genuinely unmatched views — never a
    // view that DID convert (the tail of the bounded stream may hold
    // some unmatched views back, so subset, not equality)
    val outer = streamed.filter(col("click_ts").isNull)
    val converted = batchInner.select(col("v_user"), col("view_ts")).distinct()
    val wrong = outer.join(converted,
      outer("user_id") === converted("v_user") &&
        outer("view_ts") === converted("view_ts"), "left_semi")
    assert(wrong.count() === 0)
    assert(outer.count() > 0, "watermark must release some outer rows")
  }

  test("streaming pair-index maintenance converges to the batch pair table") {
    // whole orders per file (hash-partitioned by orderkey), one file
    // per micro-batch → batch contributions merge additively
    val src = tmpDir("pairs_src")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    li.repartition(4, col("l_orderkey")).write.mode("overwrite").parquet(src)
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_pairs")).wh
    val stream = spark.readStream
      .schema(li.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val q = StreamMaterializer.maintainPairIndex(wh, "pair_deltas", stream,
      tmpDir("ckpt_pairs"))
    q.awaitTermination(120000)
    val served = wh.read("pair_deltas")
      .groupBy("pa", "pb").agg(sum("cab").as("cab"))
      .filter(col("cab") >= 2)
    val batch = StreamMaterializer.pairMaintenance(li).filter(col("cab") >= 2)
    assert(served.count() === batch.count())
    val diff = served.join(batch, Seq("pa", "pb"))
      .filter(served("cab") =!= batch("cab"))
    assert(diff.count() === 0)
    assert(wh.commitCount("pair_deltas") > 1,
      "maintenance must have appended multiple micro-batch deltas")
  }

  test("pair-index maintenance recovers from its checkpoint: stop, restart, converge") {
    // Crash-recovery gate (VERDICT-r7 item 7): the first query instance
    // drains 2 of 4 files and terminates; a SECOND instance on the SAME
    // checkpoint + table must resume from the recorded offsets —
    // processing ONLY the later files (no double-counted deltas) — and
    // the folded state must still converge to the batch twin exactly.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val parted = li.repartition(4, col("l_orderkey")).cache()
    val stage = tmpDir("pairs_rec_stage")
    parted.write.mode("overwrite").parquet(stage)
    val files = new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    val src = tmpDir("pairs_rec_src")
    def addFile(i: Int): Unit = java.nio.file.Files.copy(files(i).toPath,
      java.nio.file.Paths.get(src, files(i).getName))
    addFile(0); addFile(1)

    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_pairs_rec")).wh
    val ckpt = tmpDir("ckpt_pairs_rec")
    def startQuery() = StreamMaterializer.maintainPairIndex(wh, "pair_rec",
      spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      ckpt)

    val q1 = startQuery()
    q1.awaitTermination(120000) // AvailableNow: drains files 0-1, stops
    val commitsAfterFirst = wh.commitCount("pair_rec")
    assert(commitsAfterFirst >= 1, "first instance must have appended deltas")
    val rowsAfterFirst = wh.read("pair_rec").agg(sum("cab")).first().getLong(0)

    addFile(2); addFile(3)
    val q2 = startQuery()
    q2.awaitTermination(120000)
    // restart processed ONLY the new files: the first instance's delta
    // mass is still there exactly once (checkpoint offsets survived)
    val served = wh.read("pair_rec")
      .groupBy("pa", "pb").agg(sum("cab").as("cab"))
      .filter(col("cab") >= 2)
    val batch = StreamMaterializer.pairMaintenance(parted).filter(col("cab") >= 2)
    assert(served.count() === batch.count())
    val diff = served.join(batch, Seq("pa", "pb"))
      .filter(served("cab") =!= batch("cab"))
    assert(diff.count() === 0,
      "restarted stream must converge to the batch twin with no double counts")
    assert(wh.commitCount("pair_rec") > commitsAfterFirst,
      "second instance must have appended the remaining files' deltas")
    assert(rowsAfterFirst < wh.read("pair_rec").agg(sum("cab")).first().getLong(0))
    parted.unpersist()
  }

  test("pair-index maintenance fails loudly when an order spans micro-batches") {
    import spark.implicits._
    // the SAME orderkey in two separate files + one file per trigger →
    // the order is split across micro-batches, which would silently
    // under-count its cross-batch pairs; the whole-order precondition
    // check must fail the stream instead of converging to wrong counts
    val src = tmpDir("pairs_bad_src")
    Seq((1L, 10L), (1L, 11L)).toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((1L, 12L), (1L, 13L)).toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("append").parquet(src)
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_pairs_bad")).wh
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamMaterializer.maintainPairIndex(wh, "pair_deltas_bad", stream,
      tmpDir("ckpt_pairs_bad"))
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(failed.getMessage.contains("not partitioned by l_orderkey") ||
      Option(failed.getCause).exists(_.getMessage.contains("not partitioned by l_orderkey")))
  }

  test("streaming drift monitor converges to the batch PSI (q178 twin)") {
    // bucket counts are additive under ANY partitioning (no whole-order
    // precondition): arbitrary 4-way split, one file per micro-batch
    val src = tmpDir("drift_src")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_drift")).wh
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamMaterializer.maintainDriftCounts(wh, "drift_counts", stream,
      tmpDir("ckpt_drift"))
    q.awaitTermination(120000)
    assert(wh.commitCount("drift_counts") > 1,
      "monitor must have appended multiple micro-batch deltas")
    val served = StreamMaterializer.servePsi(wh, "drift_counts")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Ext4.psiFromBucketCounts(spark,
      graft.queries.Ext4.driftBucketCounts(events))
      .collect().map(_.toSeq).toSet
    assert(served === batch, "folded deltas must reproduce the batch PSI exactly")
  }

  test("streaming CMS converges to the batch sketch and never undercounts (q197 twin)") {
    // cell deltas are additive under ANY partitioning — arbitrary 4-way
    // split of lineitem, one file per micro-batch
    val src = tmpDir("cms_src")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_partkey")
    li.repartition(4).write.mode("overwrite").parquet(src)
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh_cms")).wh
    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamMaterializer.maintainCmsCells(wh, "cms_cells", stream,
      "l_partkey", tmpDir("ckpt_cms"))
    q.awaitTermination(120000)
    assert(wh.commitCount("cms_cells") > 1,
      "maintainer must have appended multiple micro-batch deltas")
    val truth = li.groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("true_c"))
    val served = StreamMaterializer.serveCmsEstimates(wh, "cms_cells",
      truth.select("k"))
    // never undercounts, and folded deltas = the batch-built sketch
    assert(served.join(truth, "k")
      .filter(col("cms_estimate") < col("true_c")).count() === 0)
    val batch = graft.queries.Ext6.cmsEstimates(
      graft.queries.Ext6.cmsCellDeltas(li, "l_partkey"), truth.select("k"))
      .collect().map(_.toSeq).toSet
    assert(served.collect().map(_.toSeq).toSet === batch,
      "streamed sketch must reproduce the batch sketch exactly")
  }

  test("session windows produce bounded per-user sessions") {
    val dir = eventsDir
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_sessions",
      StreamMaterializer.sessionCounts(
        StreamMaterializer.readEvents(spark, dir, schema)),
      tmpDir("ckpt"))
    q.awaitTermination(120000)
    val out = wh.read("stream_sessions")
    assert(out.count() > 0)
    assert(out.filter(col("session_end") < col("session_start")).count() === 0)
    // session event counts can never exceed the user's total events
    val totals = spark.read.parquet(dir).groupBy("user_id")
      .agg(count(lit(1)).as("total"))
    val bad = out.groupBy("user_id").agg(sum("n_events").as("in_sessions"))
      .join(totals, "user_id")
      .filter(col("in_sessions") > col("total"))
    assert(bad.count() === 0)
  }

  test("streaming group-cap maintainer converges to the batch q223 sampler") {
    val dir = tmpDir("docs_stream")
    graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val wh = new Engine(spark, Manifest(Map.empty), tmpDir("wh")).wh
    val k = 20
    val q = StreamMaterializer.writeToWarehouse(
      wh, "stream_groupcap",
      StreamMaterializer.maintainGroupCap(
        StreamMaterializer.readEvents(spark, dir, schema), k),
      tmpDir("ckpt"), outputMode = "update")
    q.awaitTermination(120000)
    // last update per lang == the batch top-k selection over everything
    val last = wh.read("stream_groupcap")
      .groupBy("lang").agg(
        max("n_seen").as("n_seen"),
        max_by(col("n_kept"), col("n_seen")).as("n_kept"),
        max_by(col("kept_chars"), col("n_seen")).as("kept_chars"))
    val batch = spark.read.parquet(dir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .groupBy("lang").agg(
        count(lit(1)).as("n_seen"),
        sum(when(col("rk") <= k, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= k, col("n_chars")).otherwise(0L)).as("kept_chars"))
    val mismatch = last.join(batch, "lang")
      .filter(last("n_seen") =!= batch("n_seen") ||
        last("n_kept") =!= batch("n_kept") ||
        last("kept_chars") =!= batch("kept_chars"))
    assert(mismatch.count() === 0)
    assert(last.count() === batch.count())
  }
}
