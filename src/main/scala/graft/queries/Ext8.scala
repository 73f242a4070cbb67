package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Wave-13 operators (round-6 third session, cont.): IR and privacy
  * kernels for training-data pipelines.
  *
  *  - q210: positional-index phrase search — exact 3-token phrase
  *    occurrence via posting-list position joins (the inverted-index
  *    kernel; at 100 TB postings are hash-partitioned by term and the
  *    join drives from the rarest term — here the full trigram stats
  *    feed a top-k).
  *  - q211: k-anonymity audit — equivalence-class size histogram over
  *    a quasi-identifier tuple (nation, order year, price band); the
  *    re-identification-risk profile a privacy review runs before a
  *    dataset release.
  *  - q212: deterministic Laplace release — the DP mechanism's exact
  *    shape (inverse-CDF noise at epsilon=1) drawn from md5 uniforms
  *    so both engines add the IDENTICAL noise; the audit columns show
  *    the noise scale actually delivered. (Determinism is for the
  *    gate: a production release would draw real randomness.)
  */
object Ext8 {

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q210_phrase_search",
      """WITH p AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |), tri AS (
        |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS phrase
        |  FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |           JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |), agg AS (
        |  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tri GROUP BY 1
        |), rk AS (
        |  SELECT phrase, n_docs, n_occurrences,
        |         ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, phrase) AS rk
        |  FROM agg QUALIFY rk <= 5
        |)
        |SELECT CAST(rk AS BIGINT) AS rk, phrase, n_docs, n_occurrences
        |FROM rk ORDER BY rk""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
        .select(col("doc_id"), col("w"), (col("pos0") + 1).as("pos"))
      val tri = p.as("a")
        .join(p.as("b"), expr("b.doc_id = a.doc_id AND b.pos = a.pos + 1"))
        .join(p.as("c"), expr("c.doc_id = a.doc_id AND c.pos = a.pos + 2"))
        .select(col("a.doc_id").as("doc_id"),
          concat_ws(" ", col("a.w"), col("b.w"), col("c.w")).as("phrase"))
      val agg = tri.groupBy("phrase")
        .agg(count(lit(1)).cast("long").as("n_occurrences"),
          countDistinct("doc_id").cast("long").as("n_docs"))
      agg.orderBy(col("n_occurrences").desc, col("phrase")).limit(5)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("phrase"))).cast("long"))
        .select(col("rk"), col("phrase"), col("n_docs"), col("n_occurrences"))
        .orderBy("rk")
    },

    QueryDef(
      "q211_k_anonymity",
      """WITH q AS (
        |  SELECT c.c_nationkey AS nk,
        |         CAST(YEAR(o.o_orderdate) AS BIGINT) AS yr,
        |         CAST(CAST(o.o_totalprice AS BIGINT) // 50000 AS BIGINT) AS band
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |), cls AS (
        |  SELECT nk, yr, band, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM q GROUP BY 1, 2, 3
        |)
        |SELECT CAST(LEAST(sz, 6) AS BIGINT) AS k_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_classes,
        |       CAST(SUM(sz) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val q = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").as("nk"),
          year(col("o_orderdate")).cast("long").as("yr"),
          expr("cast(o_totalprice as bigint) div 50000").cast("long").as("band"))
      val cls = q.groupBy("nk", "yr", "band")
        .agg(count(lit(1)).cast("long").as("sz"))
      cls.groupBy(least(col("sz"), lit(6L)).cast("long").as("k_bucket"))
        .agg(count(lit(1)).cast("long").as("n_classes"),
          sum("sz").cast("long").as("n_rows"))
        .orderBy("k_bucket")
    },

    QueryDef(
      "q212_dp_laplace_release",
      """WITH c AS (
        |  SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS true_n
        |  FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        |       JOIN nation n ON n.n_nationkey = cu.c_nationkey
        |  GROUP BY 1
        |), u AS (
        |  SELECT nation, true_n,
        |         (CAST(('0x' || SUBSTR(MD5(nation), 1, 8)) AS BIGINT) + 1) / 4294967296.0 AS p
        |  FROM c
        |)
        |SELECT nation, true_n,
        |       CAST(ROUND(CAST(true_n AS DOUBLE)
        |                  - (CASE WHEN p >= 0.5 THEN 1.0 ELSE -1.0 END)
        |                    * LN(1.0 - 2.0 * ABS(p - 0.5)), 4) AS DOUBLE) AS noisy_n,
        |       CAST(ROUND(ABS((CASE WHEN p >= 0.5 THEN 1.0 ELSE -1.0 END)
        |                      * LN(1.0 - 2.0 * ABS(p - 0.5))), 4) AS DOUBLE) AS abs_noise
        |FROM u ORDER BY nation""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).cast("long").as("true_n"))
      val p = (expr("cast(conv(substring(md5(nation), 1, 8), 16, 10) as bigint)") + 1) /
        lit(4294967296.0)
      val noise = when(p >= 0.5, lit(1.0)).otherwise(lit(-1.0)) *
        log(lit(1.0) - lit(2.0) * abs(p - lit(0.5)))
      c.select(col("nation"), col("true_n"),
          round(col("true_n").cast("double") - noise, 4).cast("double").as("noisy_n"),
          round(abs(noise), 4).cast("double").as("abs_noise"))
        .orderBy("nation")
    }
  )
}
