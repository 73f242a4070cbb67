package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor surface over `embeddings` (64-dim
  * float vectors).
  *
  * Oracle determinism: scores are computed in double (per-element
  * products are IEEE-identical in both engines; the 64-term summation
  * order differs only at ~1e-16 relative), then rounded to 6 decimals
  * BEFORE ranking — both engines rank identical rounded values, and
  * rounding-induced ties break on vec_id. (Decimal-sum was tried and
  * rejected: double→decimal casts at scale 12 round shortest-repr in
  * Spark vs exact-binary in DuckDB and diverge ~1e-4 of the time.)
  *
  * Scale path: q30 (brute force) is O(Q·N) with the corpus broadcast —
  * fine when Q·N fits a stage or as a per-bucket kernel; q31 (IVF,
  * probe=1) is the 100 TB topology: assign every vector to its nearest
  * centroid (tiny broadcast), then search only the query's own cell —
  * the candidate join keys on the cell id, so it shuffles instead of
  * cross-joining. Swapping the deterministic stand-in centroids for
  * k-means output changes recall, not the plan shape.
  */
object Similarity {

  /** Native codegen-friendly kernels (graft.functions.VectorExprs):
    * the `aggregate(zip_with(...))` formulation runs interpreted per
    * element and dominated ANN wall-clock. Same left-to-right summation
    * order, so values are bit-identical.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.arrayDot(a, b)

  private def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExprs.arraySqDist(a, b)

  /** embeddings spread across cores before the O(N·C) distance sweeps —
    * single small parquet file would otherwise single-thread them.
    */
  private def embParallel(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)

  /** DuckDB twin of dot(): positional list indexing over a 1..64 range. */
  private def duckDot(a: String, b: String): String =
    s"SUM(CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE))"

  private def duckSqDist(a: String, b: String): String =
    s"""SUM((CAST($a.embedding[i] AS DOUBLE) - CAST($b.embedding[i] AS DOUBLE))
       |    * (CAST($a.embedding[i] AS DOUBLE) - CAST($b.embedding[i] AS DOUBLE)))""".stripMargin

  private def loadEmb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Seq[QueryDef] = Seq(

    // Vector norms — sanity kernel shared by both ANN variants.
    QueryDef(
      "q29_vector_norms",
      s"""SELECT vec_id,
         |       CAST(ROUND(${duckDot("e", "e")}, 6) AS DOUBLE) AS sq_norm,
         |       CAST(len(embedding) AS BIGINT) AS dim
         |FROM embeddings e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
         |GROUP BY vec_id, len(embedding)
         |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      embParallel(s, dir)
        .select(
          col("vec_id"),
          round(dot(col("embedding"), col("embedding")), 6).as("sq_norm"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy("vec_id")
    },

    // Brute-force top-5 cosine neighbors for query vectors vec_id < 10.
    QueryDef(
      "q30_knn_bruteforce",
      s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         |dots AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         CAST(ROUND(${duckDot("q", "c")}
         |                    / SQRT(${duckDot("q", "q")} * ${duckDot("c", "c")}),
         |                    6) AS DOUBLE) AS cosine
         |  FROM embeddings q
         |  JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
         |  CROSS JOIN idx
         |  GROUP BY q.vec_id, c.vec_id
         |)
         |SELECT qid, cid, cosine,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS BIGINT) AS rn
         |FROM dots
         |QUALIFY rn <= 5
         |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
      val emb = embParallel(s, dir)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val dots = q.join(broadcast(c), col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          round(dot(col("qv"), col("cv"))
            / sqrt(dot(col("qv"), col("qv")) * dot(col("cv"), col("cv"))), 6)
            .as("cosine"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
      dots
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },

    // IVF-style ANN, probe=1: centroids = vec_id % 97 == 0 (stand-in
    // for k-means; deterministic), assign all vectors to their nearest
    // centroid by squared L2, then top-3 within the query's own cell.
    QueryDef(
      "q31_ivf_topk",
      s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         |cents AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |          WHERE vec_id % 97 = 0),
         |d2 AS (
         |  SELECT e.vec_id, c.cent_id,
         |         CAST(ROUND(${duckSqDist("e", "c")}, 6) AS DOUBLE) AS sqdist
         |  FROM embeddings e CROSS JOIN cents c CROSS JOIN idx
         |  GROUP BY e.vec_id, c.cent_id
         |), assign AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT vec_id, cent_id,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqdist, cent_id) AS rn
         |    FROM d2) t WHERE rn = 1
         |), pairs AS (
         |  SELECT qa.vec_id AS qid, ca.vec_id AS cid, qa.cent_id AS cell,
         |         CAST(ROUND(${duckSqDist("q", "c")}, 6) AS DOUBLE) AS sqdist
         |  FROM assign qa
         |  JOIN assign ca ON qa.cent_id = ca.cent_id AND qa.vec_id <> ca.vec_id
         |  JOIN embeddings q ON q.vec_id = qa.vec_id
         |  JOIN embeddings c ON c.vec_id = ca.vec_id
         |  CROSS JOIN idx
         |  WHERE qa.vec_id < 10
         |  GROUP BY qa.vec_id, ca.vec_id, qa.cent_id
         |)
         |SELECT qid, cid, cell, sqdist,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sqdist, cid) AS BIGINT) AS rn
         |FROM pairs
         |QUALIFY rn <= 3
         |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
      val emb = embParallel(s, dir)
      val cents = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
      val d2 = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          round(sqDist(col("embedding"), col("centv")), 6).as("sqdist"))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("sqdist"), col("cent_id"))
      val assign = d2.withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1).select("vec_id", "cent_id")
      val withVec = assign.join(emb, "vec_id")
      val qside = withVec.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cent_id").as("cell"),
          col("embedding").as("qv"))
      val cside = withVec
        .select(col("vec_id").as("cid"), col("cent_id").as("ccell"),
          col("embedding").as("cv"))
      val pairs = qside.join(cside,
          col("cell") === col("ccell") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), col("cell"),
          round(sqDist(col("qv"), col("cv")), 6).as("sqdist"))
      val w = Window.partitionBy("qid").orderBy(col("sqdist"), col("cid"))
      pairs.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("qid", "cid", "cell", "sqdist", "rn")
        .orderBy("qid", "rn")
    },

    // IVF, nprobe=2: queries search their TWO nearest cells — the
    // standard recall knob (missed neighbors usually sit just across a
    // cell boundary). Database side stays rn=1-assigned, so cells are
    // disjoint and candidates can't duplicate; the probe fan-out
    // multiplies candidate volume by ~2, not the shuffle count. Same
    // plan as q31 otherwise: tiny centroid broadcast, candidate join
    // keyed on the cell id.
    QueryDef(
      "q50_ivf_probe2",
      s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         |cents AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |          WHERE vec_id % 97 = 0),
         |d2 AS (
         |  SELECT e.vec_id, c.cent_id,
         |         CAST(ROUND(${duckSqDist("e", "c")}, 6) AS DOUBLE) AS sqdist
         |  FROM embeddings e CROSS JOIN cents c CROSS JOIN idx
         |  GROUP BY e.vec_id, c.cent_id
         |), ranked AS (
         |  SELECT vec_id, cent_id,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqdist, cent_id) AS rn
         |  FROM d2
         |), assign AS (
         |  SELECT vec_id, cent_id FROM ranked WHERE rn = 1
         |), probe AS (
         |  SELECT vec_id, cent_id FROM ranked WHERE rn <= 2 AND vec_id < 10
         |), pairs AS (
         |  SELECT qa.vec_id AS qid, ca.vec_id AS cid, ca.cent_id AS cell,
         |         CAST(ROUND(${duckSqDist("q", "c")}, 6) AS DOUBLE) AS sqdist
         |  FROM probe qa
         |  JOIN assign ca ON qa.cent_id = ca.cent_id AND qa.vec_id <> ca.vec_id
         |  JOIN embeddings q ON q.vec_id = qa.vec_id
         |  JOIN embeddings c ON c.vec_id = ca.vec_id
         |  CROSS JOIN idx
         |  GROUP BY qa.vec_id, ca.vec_id, ca.cent_id
         |)
         |SELECT qid, cid, cell, sqdist,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sqdist, cid) AS BIGINT) AS rn
         |FROM pairs
         |QUALIFY rn <= 3
         |ORDER BY qid, rn""".stripMargin) { (s, dir) =>
      val emb = embParallel(s, dir)
      val cents = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
      val d2 = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          round(sqDist(col("embedding"), col("centv")), 6).as("sqdist"))
      val wAssign = Window.partitionBy("vec_id").orderBy(col("sqdist"), col("cent_id"))
      val ranked = d2.withColumn("rn", row_number().over(wAssign))
      val assign = ranked.filter(col("rn") === 1).select("vec_id", "cent_id")
      val probe = ranked.filter(col("rn") <= 2 && col("vec_id") < 10)
        .select("vec_id", "cent_id")
      val qside = probe.join(emb, "vec_id")
        .select(col("vec_id").as("qid"), col("cent_id").as("cell"),
          col("embedding").as("qv"))
      val cside = assign.join(emb, "vec_id")
        .select(col("vec_id").as("cid"), col("cent_id").as("ccell"),
          col("embedding").as("cv"))
      val pairs = qside.join(cside,
          col("cell") === col("ccell") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), col("ccell").as("cell"),
          round(sqDist(col("qv"), col("cv")), 6).as("sqdist"))
      val w = Window.partitionBy("qid").orderBy(col("sqdist"), col("cid"))
      pairs.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("qid", "cid", "cell", "sqdist", "rn")
        .orderBy("qid", "rn")
    },

    // Sign-random-projection LSH (Charikar 2002): 8 deterministic
    // ±1 hyperplanes (signs seeded from md5 parity, identical in both
    // engines) → 8-bit signature → bucket-equality join = candidate
    // pairs → exact cosine verify. The third ANN topology next to IVF
    // (q31/q50): no centroids, no training, candidates shuffle on the
    // signature. Projection dots are rounded to 6 decimals BEFORE the
    // sign so engine summation order can't flip a boundary bit.
    QueryDef(
      "q56_srp_lsh_candidates",
      s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         |bits AS (SELECT unnest(range(8)) AS j),
         |signs AS (
         |  SELECT i, j, CASE WHEN STRPOS('01234567', SUBSTR(MD5(i || 'x' || j), 1, 1)) > 0
         |               THEN 1.0 ELSE -1.0 END AS sgn
         |  FROM idx CROSS JOIN bits
         |), proj AS (
         |  SELECT e.vec_id, s.j,
         |         ROUND(SUM(CAST(e.embedding[s.i] AS DOUBLE) * s.sgn), 6) AS dot
         |  FROM embeddings e CROSS JOIN signs s GROUP BY e.vec_id, s.j
         |), sig AS (
         |  SELECT vec_id,
         |         STRING_AGG(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
         |  FROM proj GROUP BY vec_id
         |), pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.sig AS sig
         |  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
         |), scored AS (
         |  SELECT p.vec_a, p.vec_b, p.sig,
         |         ROUND(${duckDot("ea", "eb")}
         |               / SQRT(${duckDot("ea", "ea")} * ${duckDot("eb", "eb")}), 6) AS cosine
         |  FROM pairs p
         |  JOIN embeddings ea ON ea.vec_id = p.vec_a
         |  JOIN embeddings eb ON eb.vec_id = p.vec_b
         |  CROSS JOIN idx
         |  GROUP BY p.vec_a, p.vec_b, p.sig
         |)
         |SELECT vec_a, vec_b, sig, CAST(cosine AS DOUBLE) AS cosine
         |FROM scored WHERE cosine >= 0.2
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      def md5hex(t: String): String = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // hyperplane j, dimension i (1-indexed like the SQL): ±1 by the
      // first md5 hex char's parity — data-independent, tiny, exact
      val signs: Seq[Array[Float]] = (0 until 8).map(j =>
        (1 to 64).map(i =>
          if ("01234567".contains(md5hex(s"${i}x$j").charAt(0))) 1.0f else -1.0f
        ).toArray)
      val emb = embParallel(s, dir)
      val bitCols = signs.map(arr =>
        when(round(dot(col("embedding"), typedLit(arr)), 6) >= 0, "1").otherwise("0"))
      val sig = emb.select(col("vec_id"), col("embedding"),
        concat(bitCols: _*).as("sig"))
      val aSide = sig.select(col("vec_id").as("vec_a"), col("embedding").as("va"),
        col("sig"))
      val bSide = sig.select(col("vec_id").as("vec_b"), col("embedding").as("vb"),
        col("sig").as("sigb"))
      val cosine = round(
        dot(col("va"), col("vb"))
          / sqrt(dot(col("va"), col("va")) * dot(col("vb"), col("vb"))), 6)
      aSide.join(bSide, col("sig") === col("sigb") && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), col("sig"), cosine.as("cosine"))
        .filter(col("cosine") >= 0.2)
        .orderBy("vec_a", "vec_b")
    }
  )
}
