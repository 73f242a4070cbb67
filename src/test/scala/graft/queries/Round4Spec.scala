package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-4 operator invariants: PQ-ADC search, paragraph dedup,
  * temperature mixing, RAG chunking, MinHash estimator calibration,
  * Bloom decontamination. Cross-checked against independent formulas
  * (token counts, exact joins) rather than re-running the same code.
  */
class Round4Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q73: ADC LUTs broadcast; exactly top-3 per query, adc ascending") {
    val df = run("q73_pq_adc_topk")
    val p = df.queryExecution.executedPlan.toString
    // the code scan joins the per-query lookup tables map-side — the
    // corpus codes must not shuffle to meet a 10×16-row LUT
    assert(p.contains("BroadcastHashJoin"), p)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10 && byQ.values.forall(_.length === 3))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(w => w(0) <= w(1)),
        "adc must be non-decreasing in rank")
    }
  }

  test("q74: segment count = ceil(n_tokens/16); ratios within [0,1]") {
    val seg = run("q74_paragraph_dedup")
    val tok = run("q21_token_stats").select(col("doc_id"), col("n_tokens"))
    val joined = seg.join(tok, "doc_id")
      .select(col("n_segments"), col("n_tokens"),
        col("n_dup_segments"), col("dup_ratio")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nSeg, nTok) = (r.getLong(0), r.getLong(1))
      assert(nSeg === (nTok + 15) / 16, s"nSeg=$nSeg nTok=$nTok")
      assert(r.getLong(2) <= nSeg)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q75: temperature flattens — smallest lang keeps at a rate >= largest") {
    val rows = run("q75_temperature_mixing").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, total, bp, kept) =>
      assert(bp >= 0 && bp <= 10000)
      assert(kept <= total)
    }
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    assert(smallest._3 >= largest._3,
      s"sqrt-temperature must up-weight the small language: $smallest vs $largest")
  }

  test("q76: chunk count = floor((n-1)/24)+1; 32-cap; full coverage") {
    val ch = run("q76_rag_chunking")
    val perDoc = ch.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max("chunk_tokens").as("max_ct"),
      sum("chunk_tokens").as("sum_ct"))
    val tok = run("q21_token_stats").select(col("doc_id"), col("n_tokens"))
    perDoc.join(tok, "doc_id").collect().foreach { r =>
      val (nCh, maxCt, nTok) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nCh === (nTok - 1) / 24 + 1, s"nCh=$nCh nTok=$nTok")
      assert(maxCt <= 32)
      // stride 24 < size 32 ⇒ windows cover every token at least once:
      // sum of chunk lengths >= n_tokens
      assert(r.getLong(3) >= nTok)
    }
  }

  test("q77: candidate set = q27's; estimator within 12-hash resolution") {
    val est = run("q77_minhash_jaccard_estimate")
    val cand = run("q27_minhash_lsh_candidates")
    assert(est.select("doc_a", "doc_b").except(cand).isEmpty
      && cand.except(est.select("doc_a", "doc_b")).isEmpty,
      "q77 must score exactly the LSH candidate pairs")
    est.collect().foreach { r =>
      val nAgree = r.getLong(2)
      assert(nAgree >= 0 && nAgree <= 12)
      assert(math.abs(r.getDouble(3) - nAgree / 12.0) < 1e-3)
    }
  }

  test("q84: matrix mass equals the q27 candidate-pair count") {
    val matrixTotal = run("q84_cross_source_dup_matrix")
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    val candTotal = run("q27_minhash_lsh_candidates").count()
    assert(matrixTotal === candTotal,
      s"every candidate pair must land in exactly one matrix bucket: $matrixTotal vs $candTotal")
  }

  test("q83: OOV bounds; corpus OOV mass matches an independent vocab probe") {
    val rows = run("q83_oov_rate").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // independent recomputation: total OOV tokens = total tokens minus
    // occurrences of the top-100 vocabulary
    import spark.implicits._
    val tok = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val freq = tok.groupBy("w").count()
    val vocabMass = freq.orderBy(col("count").desc, col("w")).limit(100)
      .agg(sum("count")).collect()(0).getLong(0)
    val totalMass = tok.count()
    assert(rows.map(_.getLong(2)).sum === totalMass - vocabMass)
  }

  test("partitionedComponents == CC fixpoint on RANDOM cell-keyed graphs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random graphs: 3 cells, nodes drawn per cell, random edge sets —
    // stresses chains, cycles, singleton merges, and late-arriving
    // minimum labels far beyond the fixed case below
    val edgeGen: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(40, for {
        cell <- Gen.choose(1L, 3L)
        a <- Gen.choose(0L, 14L)
        b0 <- Gen.choose(0L, 13L)
      } yield {
        val b = if (b0 >= a) b0 + 1 else b0 // b != a, no filter retries
        (cell, cell * 100 + a, cell * 100 + b)
      })
    def brute(edges: Seq[(Long, Long, Long)]): Set[(Long, Long)] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (_, a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._2, e._3)).toSet.map((n: Long) => (n, find(n)))
    }
    (0 until 4).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(1234L + i))
        .getOrElse(fail("generator produced no value"))
      val df = edges.toDF("key", "doc_a", "doc_b")
      val grouped = TextOps.partitionedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(grouped === brute(edges), s"random graph $i diverged")
    }
  }

  test("partitionedComponents == distributed CC fixpoint on cell-keyed edges") {
    import spark.implicits._
    // 3 cells; chains, a triangle, and a 2-cycle — incl. a chain whose
    // min enters late (stresses min-label propagation)
    val edges = Seq(
      (1L, 10L, 11L), (1L, 11L, 12L), (1L, 12L, 3L),
      (2L, 20L, 21L), (2L, 21L, 22L), (2L, 20L, 22L),
      (3L, 31L, 30L)
    ).toDF("key", "doc_a", "doc_b")
    val grouped = TextOps.partitionedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixpoint = TextOps.connectedComponents(edges.drop("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grouped === fixpoint)
    assert(grouped.contains((10L, 3L)), "chain min must reach every node")
  }

  test("q86: five BPE merges strictly shrink the weighted unit count") {
    val freq = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val out = run("q86_bpe_train")
      .join(freq, col("word") === col("w"))
    val r = out.agg(
      sum(col("f") * col("n_units")),
      sum(col("f") * length(col("word")))).collect()(0)
    val (after, before) = (r.getLong(0), r.getLong(1))
    // each of the 5 merge rounds replaces >= 1 weighted pair occurrence
    assert(after <= before - 5, s"after=$after before=$before")
    // and no word gained units
    assert(out.filter(col("n_units") > length(col("word"))).count() === 0)
  }

  test("q90: encode totals equal the trainer's weighted unit count") {
    val enc = run("q90_bpe_encode")
    // corpus-wide subword units via the encode path...
    val encUnits = enc.agg(sum("n_bpe_units")).collect()(0).getLong(0)
    // ...must equal the trainer's frequency-weighted per-word units
    val freq = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val trainUnits = run("q86_bpe_train")
      .join(freq, col("word") === col("w"))
      .agg(sum(col("f") * col("n_units"))).collect()(0).getLong(0)
    assert(encUnits === trainUnits,
      s"encode/train disagree on corpus units: $encUnits vs $trainUnits")
    enc.collect().foreach { r =>
      val (nTok, nUnits, nChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nUnits >= nTok, "every word is at least one unit")
      assert(nUnits <= nChars, "merging never exceeds character count")
      assert(r.getDouble(4) >= 1.0, "chars per unit >= 1 by construction")
    }
  }

  test("q91: bigram count = n_tokens - 1; inverse probability >= 1") {
    val sur = run("q91_bigram_surprisal")
    val tok = run("q21_token_stats").select(col("doc_id"), col("n_tokens"))
    sur.join(tok, "doc_id").collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(3) - 1,
        "one bigram per adjacent token pair")
      // c(w1) >= c(w1 w2) for every transition, so the mean inverse
      // transition probability can never drop below 1
      if (r.getLong(1) > 0) assert(r.getDouble(2) >= 1.0)
    }
  }

  test("q92: decision consistent with an independent double recompute") {
    val rows = run("q92_quality_classifier").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ttr, mwl) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(ttr >= 0.0 && ttr <= 1.0)
      assert(mwl > 0.0)
      val recomputed = -1.2 + 0.016 * n + 2.5 * ttr - 0.3 * mwl
      // the query rounds its score to 4 decimals; allow the half-step
      assert(math.abs(r.getDouble(4) - recomputed) < 5.1e-5,
        s"score drifted from its published weights: ${r.getDouble(4)} vs $recomputed")
      // away from the rounding boundary, keep must track the score sign
      if (math.abs(r.getDouble(4)) > 1e-3)
        assert(r.getBoolean(5) === (r.getDouble(4) > 0.0),
          "keep must be exactly score > 0")
    }
  }

  test("q93: leakage exists at this SF and doc counts bound fp counts") {
    val rows = run("q93_split_leakage").collect()
    assert(rows.nonEmpty, "boilerplate fingerprints must collide across splits")
    assert(rows.length <= 3)
    rows.foreach { r =>
      val (nFp, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nFp > 0 && na >= nFp && nb >= nFp,
        "each shared fingerprint contributes at least one doc per side")
    }
  }

  test("q94: redaction count equals an independent token probe") {
    val rows = run("q94_redact_apply").collect()
    // the corpus has no PII shapes, so every redaction is the denylist
    // term — recompute occurrences by exact token equality
    val expected = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), _ === "key")).cast("long").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists(_.getLong(1) > 0), "denylist term must fire at this SF")
    rows.foreach { r =>
      assert(r.getLong(1) === expected(r.getLong(0)))
      assert(r.getBoolean(2) === (r.getLong(1) > 0))
    }
  }

  test("q95: confusion matrix mass = corpus size; labels and preds bounded") {
    val rows = run("q95_langid_confusion").collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.Tables.load(spark, sf, "documents").count())
    val langs = Set("de", "en", "es", "fr", "unknown")
    rows.foreach { r =>
      assert(langs.contains(r.getString(1)), r.getString(1))
      assert(r.getLong(2) > 0)
    }
  }

  test("q96: coverage is monotone in k and bounded by 1") {
    val rows = run("q96_vocab_coverage").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(10L, 100L, 1000L))
    val covs = rows.map(_.getDouble(3))
    assert(covs.sliding(2).forall(w => w(0) <= w(1)), covs.mkString(","))
    assert(covs.forall(c => c > 0.0 && c <= 1.0))
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("q97: same groups as q48; exactly one best per group; best maximizes score") {
    val best = run("q97_dedup_keep_best")
    val q48 = run("q48_dedup_groups")
    assert(best.select("doc_id", "group_id")
      .except(q48.select("doc_id", "group_id")).isEmpty
      && q48.select("doc_id", "group_id")
        .except(best.select("doc_id", "group_id")).isEmpty,
      "keep-best must rank exactly q48's components")
    val perGroup = best.groupBy("group_id").agg(
      sum(when(col("keep_best"), 1).otherwise(0)).as("n_best"),
      max("score").as("mx"))
    perGroup.collect().foreach(r => assert(r.getLong(1) === 1L))
    val kept = best.filter(col("keep_best"))
      .select(col("group_id"), col("score").as("kept_score"))
    kept.join(perGroup, "group_id").collect().foreach { r =>
      assert(r.getDouble(1) === r.getDouble(3),
        "the kept doc must carry the group's max score")
    }
  }

  test("q98: diff classes partition both corpus versions") {
    val m = run("q98_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.load(spark, sf, "documents").count()
    // v2 = all docs: added + changed + unchanged = |v2|
    assert(m.getOrElse("added", 0L) + m.getOrElse("changed", 0L)
      + m.getOrElse("unchanged", 0L) === total)
    // v1 drops shard doc_id%10==7; those ids are exactly the "added" set
    val shard = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 7).count()
    assert(m.getOrElse("added", 0L) === shard)
    // the mutated shard (doc_id%20==4) is disjoint from the dropped one
    val mutated = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 20 === 4).count()
    assert(m.getOrElse("changed", 0L) === mutated)
    assert(m.getOrElse("removed", 0L) === 0L)
  }

  test("q99: targets sum to ~budget and epochs = target/actual") {
    val rows = run("q99_epoch_plan").collect()
    val targetSum = rows.map(_.getLong(2)).sum
    // floor() loses < 1 token per language
    assert(targetSum <= 200000L && targetSum > 200000L - rows.length)
    rows.foreach { r =>
      val expect = r.getLong(2).toDouble / r.getLong(1)
      assert(math.abs(r.getDouble(3) - expect) < 5.1e-5)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q100: scores exactly the val/test docs; held-out >= in-corpus surprisal") {
    val held = run("q100_heldout_surprisal")
    // scored docs = exactly the non-train split members with >= 2 tokens
    val bucket = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)") % 100
    val expected = graft.Tables.load(spark, sf, "documents")
      .filter(bucket >= 80 && size(split(col("text"), " ")) >= 2)
      .select("doc_id")
    assert(held.select("doc_id").except(expected).isEmpty
      && expected.except(held.select("doc_id")).isEmpty)
    // held-out scoring can only look worse than in-corpus scoring:
    // every transition's train count <= its full-corpus count, and
    // unseen transitions pay the backoff premium
    val both = held.select(col("doc_id"), col("mean_surprisal").as("ho"))
      .join(run("q91_bigram_surprisal")
        .select(col("doc_id"), col("mean_inv_prob").as("ic")), "doc_id")
    // (not strictly per-doc — train-table denominators shrink too — so
    // assert on the mean, where the backoff premium dominates)
    val r = both.agg(avg("ho"), avg("ic")).collect()(0)
    assert(r.getDouble(0) >= r.getDouble(1),
      s"held-out mean ${r.getDouble(0)} vs in-corpus ${r.getDouble(1)}")
    held.collect().foreach(x => assert(x.getDouble(2) >= 1.0))
  }

  test("q101: phash groups are exactly pixel-identity groups") {
    val out = run("q101_image_phash_dedup")
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(out.count() === docs.count())
    // group count must equal the generator's distinct raster count
    val distinctRasters = docs
      .select((col("n_chars") % 4).as("a"), (col("n_chars") % 3).as("b"),
        (col("doc_id") % 5).as("c")).distinct().count()
    assert(out.select("group_id").distinct().count() === distinctRasters)
    // every group's members carry byte-identical payloads (decode-free
    // cross-check of the decode-based grouping)
    val assets = graft.functions.Multimodal.thumbnailAssets(docs)
      .select(col("asset_id"), md5(col("content")).as("cm"))
    val perGroup = out.join(assets, "asset_id")
      .groupBy("group_id").agg(countDistinct("cm").as("n_payloads"))
    assert(perGroup.filter(col("n_payloads") =!= 1).count() === 0)
    // keep-min accounting
    val n = out.count()
    val dups = out.filter(col("is_dup")).count()
    assert(dups === n - distinctRasters)
  }

  test("q102: fingerprint groups are exactly sample-identity groups") {
    val out = run("q102_audio_fingerprint_dedup")
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(out.count() === docs.count())
    val distinctClips = docs
      .select((col("n_chars") % 6).as("a"), (col("doc_id") % 5).as("b"))
      .distinct().count()
    assert(out.select("group_id").distinct().count() === distinctClips)
    // byte-identical payload cross-check, like q101's
    val assets = graft.functions.Multimodal.audioThumbnails(docs)
      .select(col("asset_id"), md5(col("content")).as("cm"))
    val perGroup = out.join(assets, "asset_id")
      .groupBy("group_id").agg(countDistinct("cm").as("n_payloads"))
    assert(perGroup.filter(col("n_payloads") =!= 1).count() === 0)
  }

  test("q103: signature groups are exactly stream-identity groups") {
    val out = run("q103_video_signature_dedup")
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(out.count() === docs.count())
    val distinctClips = docs
      .select((col("n_chars") % 3).as("a"), (col("n_chars") % 2).as("b"),
        (col("n_chars") % 4).as("c"), (col("doc_id") % 5).as("d"))
      .distinct().count()
    assert(out.select("group_id").distinct().count() === distinctClips)
    val assets = graft.functions.Multimodal.videoThumbnails(docs)
      .select(col("asset_id"), md5(col("content")).as("cm"))
    val perGroup = out.join(assets, "asset_id")
      .groupBy("group_id").agg(countDistinct("cm").as("n_payloads"))
    assert(perGroup.filter(col("n_payloads") =!= 1).count() === 0)
  }

  test("q104: every base and new vector lands in exactly one cell") {
    val rows = run("q104_ivf_incremental_update").collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val nOld = emb.filter(col("vec_id") % 10 =!= 9).count()
    val nNew = emb.filter(col("vec_id") % 10 === 9).count()
    assert(rows.map(_.getLong(1)).sum === nOld,
      "base assignment must partition the historical corpus")
    assert(rows.map(_.getLong(2)).sum === nNew,
      "incremental assignment must partition the batch")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("q105: drop/keep partitions the train split; dropped = q58 docs over threshold") {
    val rows = run("q105_decontaminate_apply").collect()
    val nTrain = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 50 =!= 0).count()
    assert(rows.map(_.getLong(1)).sum === nTrain)
    rows.foreach(r => assert(r.getLong(2) + r.getLong(3) === r.getLong(1)))
    // cross-check against q58's overlap scores
    val q58drop = run("q58_decontamination")
      .filter(col("n_shared") >= 3).count()
    assert(rows.map(_.getLong(2)).sum === q58drop,
      "dropped docs must be exactly q58's over-threshold docs")
  }

  test("q110: hits bound candidates and truth; counts match q27/q48 inputs") {
    val r = run("q110_lsh_quality").collect()(0)
    val (nCand, nTruth, nHits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHits <= nCand && nHits <= nTruth)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    // the candidate universe is exactly q27's
    assert(nCand === run("q27_minhash_lsh_candidates").count())
    // truth is the q48 edge set (same kernel, same threshold): a
    // component of k nodes needs at least k-1 edges, so truth pairs
    // must cover sum(k-1) over the non-singleton components
    val comp = run("q48_dedup_groups").filter(col("group_size") > 1)
    val nodesInDup = comp.count()
    val nGroups = comp.select("group_id").distinct().count()
    assert(nTruth >= nodesInDup - nGroups,
      s"spanning-tree bound violated: $nTruth < $nodesInDup - $nGroups")
  }

  test("q111: boilerplate injection can only lower mean quality") {
    val rows = run("q111_quality_drift").collect()
    assert(rows.nonEmpty)
    // appending repeated stopwords lowers the type/token ratio of every
    // mutated doc, so no source's mean may rise
    rows.foreach { r =>
      assert(r.getDouble(4) <= 1e-9,
        s"drift must be <= 0 for ${r.getString(0)}: ${r.getDouble(4)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(2) - r.getDouble(4)) < 2e-4)
    }
    // and at least one source contains a mutated doc at this SF
    assert(rows.exists(_.getDouble(4) < 0.0))
  }

  test("q112: probe covers the batch; reported distances are true Hamming") {
    val rows = run("q112_simhash_incremental").collect()
    val batch = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 9).count()
    assert(rows.length.toLong === batch)
    rows.foreach { r =>
      val (nn, ham, dup) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert((nn == -1L) == (ham == -1L))
      if (ham >= 0) {
        assert(nn % 10 !== 9L, "neighbor must come from the index side")
        assert(dup === (ham <= 12)) // 64-bit scale of the 6-of-32 bar
      } else assert(!dup)
    }
    // brute-force check against the REAL 64-bit fingerprints: every
    // reported distance must be the true Hamming distance to that
    // neighbor, and never beat the global minimum. (The stop-band cap
    // — buckets > 128 index members are dropped as non-discriminative
    // — means the global minimum itself may be reachable only through
    // a capped bucket, so equality with the global min is asserted
    // only when the probe's nearest survives banding.)
    val sh = TextOps.simhashes64(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hd(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val idx = sh.filter(_._1 % 10 != 9)
    rows.take(20).foreach { r =>
      val mine = sh(r.getLong(0))
      val (nn, reported) = (r.getLong(1), r.getLong(2))
      if (reported >= 0) {
        assert(hd(mine, sh(nn)) === reported,
          s"doc ${r.getLong(0)}: reported $reported is not the true distance to $nn")
        val globalMin = idx.values.map(hd(mine, _)).min
        assert(reported >= globalMin,
          s"doc ${r.getLong(0)}: reported $reported beats global min $globalMin")
      }
    }
  }

  test("q78: no false negatives; false-positive count near the 1% design point") {
    val rows = run("q78_bloom_decontamination").collect()
    assert(rows.forall(_.getBoolean(2)), "bloom filter lost an exact hit")
    // recompute the probe side to measure the fp rate the query doesn't
    // expose (bit patterns are engine-specific, so it can't be oracled)
    val f = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(substring(col("text"), 1, 40)).as("fp"))
    val bloom = f.filter(col("doc_id") % 50 === 0)
      .select("fp").distinct().stat.bloomFilter("fp", 100000L, 0.01)
    val train = f.filter(col("doc_id") % 50 =!= 0).collect()
    val exactHits = rows.count(_.getBoolean(1))
    val bloomHits = train.count(r => bloom.mightContain(r.getString(1)))
    val falsePos = bloomHits - exactHits
    assert(falsePos >= 0)
    assert(falsePos <= math.max(10, train.length / 20),
      s"fp rate far above design: $falsePos of ${train.length}")
  }
}
