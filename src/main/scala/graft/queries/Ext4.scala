package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Wave-7 operators: scale-topology upgrades for the curation surface.
  *
  *  - q175: prefix-filtered set-similarity join (the PPJoin topology) —
  *    the exact-Jaccard candidate generator that replaces q26's full
  *    inverted-index join once token frequency skew makes "every shared
  *    token emits a pair" too hot. Ordering tokens rarest-first and
  *    indexing only each document's first `n − ceil(θ·n) + 1` tokens is
  *    provably complete for Jaccard ≥ θ, and the candidate count drops
  *    with the prefix, not the document length.
  *  - q176: two-sample Kolmogorov–Smirnov drift statistic in EXACT
  *    integer arithmetic (max |c₁·n₂ − c₂·n₁|) — the distribution-drift
  *    gate a curation pipeline runs between ingest batches.
  *  - q177: systematic weighted (PPS) sampling by cumulative token
  *    budget — selection is a pure function of the prefix-sum, so it is
  *    deterministic, exactly reproducible across engines, and
  *    implemented with the two-pass bucketed prefix-sum (per-bucket
  *    running sums + a bucket-offset broadcast) instead of a
  *    single-partition global window.
  *
  * Determinism contract matches Relational.scala: integer/decimal-exact
  * comparisons everywhere a threshold or rank decides membership;
  * doubles only in final rounded display columns.
  */
object Ext4 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)

  private def dec6(c: Column): Column = c.cast(DecimalType(20, 6))

  val queries: Seq[QueryDef] = Seq(

    // Prefix-filtered exact-Jaccard pair join (PPJoin candidate
    // topology, θ = 0.6 on distinct 3-word shingles — word tokens are
    // too shared in any real corpus to discriminate). Global order =
    // (document frequency asc, shingle) — rarest first — so two docs with
    // J ≥ θ MUST share a token inside their length-(n − ceil(θn) + 1)
    // prefixes; only prefixes are self-joined, then candidates are
    // verified against full token sets with integer cross-multiplied
    // thresholds (10·common ≥ 6·union ⇔ J ≥ 0.6, no float drift).
    // 100 TB: the df table shuffles once on token; the prefix join's
    // fan-out is bounded by prefix length (≈ 0.4·n) × per-token bucket,
    // not by full postings lists — this is the documented scale path
    // past q26 when θ is high. Verification cost is candidate-bounded.
    // Measured at sf0.01: 165 candidate pairs vs 11,533 from the full
    // inverted-index join (70×) and 650 vs 13,985 join rows (21×),
    // with zero false negatives (the 25 result pairs are identical).
    QueryDef(
      "q175_prefix_filter_jaccard",
      """WITH words AS (
        |  SELECT doc_id, w, pos FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |           generate_subscripts(string_split(text, ' '), 1) AS pos
        |    FROM documents) t
        |), tok AS (
        |  SELECT DISTINCT doc_id,
        |         w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS w
        |  FROM words
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY LEAD(w, 2) OVER win IS NOT NULL
        |), df AS (
        |  SELECT w, COUNT(*) AS df FROM tok GROUP BY w
        |), ord AS (
        |  SELECT t.doc_id, t.w,
        |         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w) AS pos,
        |         COUNT(*) OVER (PARTITION BY t.doc_id) AS n
        |  FROM tok t JOIN df d USING (w)
        |), pref AS (
        |  SELECT doc_id, w FROM ord
        |  WHERE pos <= n - CAST(FLOOR((6 * n + 9) / 10) AS BIGINT) + 1
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id
        |), card AS (
        |  SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
        |), com AS (
        |  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
        |  FROM cand c
        |  JOIN tok ta ON ta.doc_id = c.doc_a
        |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.w = ta.w
        |  GROUP BY c.doc_a, c.doc_b
        |)
        |SELECT doc_a, doc_b,
        |       CAST(common AS BIGINT) AS common_tokens,
        |       CAST(ca.n + cb.n - common AS BIGINT) AS union_tokens
        |FROM com
        |JOIN card ca ON ca.doc_id = doc_a
        |JOIN card cb ON cb.doc_id = doc_b
        |WHERE 10 * common >= 6 * (ca.n + cb.n - common)
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val tok = docs(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.TextExprs.shingles(
            split(col("text"), " "), 3)).as("w"))
        .distinct()
      val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
      val ord = tok.join(dfreq, "w")
        .select(col("doc_id"), col("w"),
          row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("df"), col("w"))).as("pos"),
          count(lit(1)).over(Window.partitionBy("doc_id")).as("n"))
      val pref = ord
        .filter(col("pos") <= col("n") - expr("(6 * n + 9) div 10") + 1)
        .select(col("doc_id"), col("w"))
      val cand = pref.as("a")
        .join(pref.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val card = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = cand
        .join(tok.as("ta"), col("ta.doc_id") === col("doc_a"))
        .join(tok.as("tb"),
          col("tb.doc_id") === col("doc_b") && col("tb.w") === col("ta.w"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      common
        .join(card.select(col("doc_id"), col("n").as("na")),
          col("doc_id") === col("doc_a")).drop("doc_id")
        .join(card.select(col("doc_id"), col("n").as("nb")),
          col("doc_id") === col("doc_b")).drop("doc_id")
        .filter(lit(10) * col("common") >= lit(6) * (col("na") + col("nb") - col("common")))
        .select(col("doc_a"), col("doc_b"),
          col("common").cast("long").as("common_tokens"),
          (col("na") + col("nb") - col("common")).cast("long").as("union_tokens"))
        .orderBy("doc_a", "doc_b")
    },

    // Two-sample Kolmogorov–Smirnov drift between the n_chars
    // distributions of English vs non-English documents, in exact
    // integers: D = max_x |F_a(x) − F_b(x)| computed as
    // max |cum_a(x)·n_b − cum_b(x)·n_a| over the merged value grid —
    // no float CDFs, so both engines agree bit-for-bit; the display
    // ratio is rounded at the very end. Scale: the grid is a HISTOGRAM
    // over distinct score values (bounded cardinality — doc-length
    // scores bucketize), so the ordered prefix-sum window runs over
    // histogram rows, not documents; everything upstream is one
    // map-side-combined groupBy.
    QueryDef(
      "q176_ks_drift",
      """WITH pts AS (
        |  SELECT n_chars AS x, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS isa
        |  FROM documents
        |), hist AS (
        |  SELECT x, SUM(isa) AS ca, COUNT(*) - SUM(isa) AS cb FROM pts GROUP BY x
        |), cum AS (
        |  SELECT x, SUM(ca) OVER (ORDER BY x) AS cuma,
        |            SUM(cb) OVER (ORDER BY x) AS cumb
        |  FROM hist
        |), tot AS (
        |  SELECT SUM(isa) AS na, COUNT(*) - SUM(isa) AS nb FROM pts
        |)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |       CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS ks_num,
        |       CAST(ROUND(CAST(MAX(ABS(cuma * nb - cumb * na)) AS DECIMAL(20,6))
        |                  / (na * nb), 4) AS DOUBLE) AS ks
        |FROM cum CROSS JOIN tot GROUP BY na, nb""".stripMargin) { (s, dir) =>
      val pts = docs(s, dir).select(col("n_chars").as("x"),
        when(col("lang") === "en", 1L).otherwise(0L).as("isa"))
      val hist = pts.groupBy("x")
        .agg(sum("isa").as("ca"), (count(lit(1)) - sum("isa")).as("cb"))
      val cum = hist.select(col("x"),
        sum("ca").over(Window.orderBy("x")).as("cuma"),
        sum("cb").over(Window.orderBy("x")).as("cumb"))
      val tot = pts.agg(sum("isa").as("na"),
        (count(lit(1)) - sum("isa")).as("nb"))
      val d = abs(col("cuma") * col("nb") - col("cumb") * col("na"))
      cum.crossJoin(tot) // 1-row totals
        .groupBy("na", "nb")
        .agg(max(d).as("ksn"))
        .select(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          col("ksn").cast("long").as("ks_num"),
          round(dec6(col("ksn")) / (col("na") * col("nb")), 4)
            .cast("double").as("ks"))
    },

    // Systematic weighted (probability-proportional-to-size) sampling:
    // k = 100 picks over the cumulative n_chars budget, doc selected
    // iff its (cum−w, cum] interval covers a multiple of W/k —
    // floor-integer form (cum·k) div W > ((cum−w)·k) div W, so both
    // engines select the identical set with zero float involvement.
    // Scale: the running sum is the TWO-PASS bucketed prefix-sum —
    // per-bucket window (partitioned, parallel) + a bucket-offset
    // table that is #buckets rows (broadcast back) — never a
    // single-partition global window over all documents.
    QueryDef(
      "q177_systematic_weighted_sample",
      """WITH c AS (
        |  SELECT doc_id, n_chars AS w,
        |         SUM(n_chars) OVER (ORDER BY doc_id) AS cum
        |  FROM documents
        |), t AS (SELECT SUM(n_chars) AS tot FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS weight,
        |       CAST((cum * 100) // tot AS BIGINT) AS pick_no
        |FROM c CROSS JOIN t
        |WHERE (cum * 100) // tot > ((cum - w) * 100) // tot
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        col("n_chars").cast("long").as("w"),
        (col("doc_id") / 1000L).cast("long").as("b"))
      // pass 1: per-bucket running sums (parallel across buckets)
      val local = d.select(col("doc_id"), col("w"), col("b"),
        sum("w").over(Window.partitionBy("b").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("lcum"))
      // pass 2: bucket offsets — #buckets rows, so the ordered window
      // here is over a tiny aggregate, then broadcast back
      val offsets = d.groupBy("b").agg(sum("w").as("bs"))
        .select(col("b"),
          coalesce(sum("bs").over(Window.orderBy("b")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("off"))
      val tot = d.agg(sum("w").as("tot"))
      local.join(broadcast(offsets), "b")
        .withColumn("cum", col("lcum") + col("off"))
        .crossJoin(tot) // 1-row total
        .filter(expr("(cum * 100) div tot > ((cum - w) * 100) div tot"))
        .select(col("doc_id"), col("w").as("weight"),
          expr("(cum * 100) div tot").cast("long").as("pick_no"))
        .orderBy("doc_id")
    }
  )
}
