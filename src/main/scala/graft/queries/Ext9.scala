package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Wave-14 operators (round 8): the three training-data kernels the
  * earlier waves' families still lacked.
  *
  *  - q232: EMBEDDING-space decontamination — the semantic member of
  *    the decontamination family (beside q58 4-gram, q78 Bloom, q187
  *    blocklist): nearest-eval-vector cosine for every corpus vector,
  *    flag ≥ threshold. At 100 TB the eval set is tiny and broadcast;
  *    the corpus sweep is one embarrassingly-parallel pass (no shuffle
  *    at all on the corpus side).
  *  - q233: sliding-window chunking (window 32 tokens, stride 24) —
  *    the doc → chunks operator every RAG / long-context training
  *    pipeline runs first. Pure per-row explode: partition-local,
  *    linear, no shuffle.
  *  - q234: sequence packing audit — deterministic concat-and-chop
  *    packing (md5-shuffled doc order, 256-token budget): per-sequence
  *    fill and boundary-crossing counts. The global running token
  *    count uses `Dist.rangedPrefixSum`, so no single-partition window
  *    touches the doc stream (the kernel the distributed-rank family
  *    exists for).
  */
object Ext9 {

  /** md5-derived 32-bit uniform as BIGINT (same idiom as q186/q211). */
  private def md5Int(sqlExpr: String): Column =
    expr(s"cast(conv(substring(md5($sqlExpr), 1, 8), 16, 10) as bigint)")

  val queries: Seq[QueryDef] = Seq(

    // Embedding-space eval-set decontamination: eval = vec_id % 89 == 0
    // (deterministic, ~N/89 vectors); every other vector reports its
    // nearest eval vector BY IVF PROBE (cosine among eval vectors
    // assigned to the corpus vector's 2 probe cells) and whether it
    // crosses the contamination threshold. Reference-context: the
    // semantic analog of q58's n-gram eval decontamination.
    //
    // Scale shape (VERDICT-r8 item 2): the eval side here grows with
    // the corpus, so all-pairs×broadcast would be O(N²/89) with an
    // unbounded broadcast. Instead both sides route through the cached
    // IVF index (Similarity.ivfIndex, the q59 pattern): candidates are
    // a cell-keyed shuffle join — per-vector work is bounded by cell
    // occupancy (~97 vectors/cell by construction), i.e. ~1 eval
    // candidate per corpus vector, linear end to end. Vectors whose
    // probe cells hold no eval vector keep a row (NULL nearest) so
    // coverage stays auditable.
    QueryDef(
      "q232_semantic_decontam",
      s"""WITH ${Similarity.duckKmeans},
         |eassign AS (
         |  SELECT vec_id AS eid, cent_id AS cell FROM assign WHERE vec_id % 89 = 0
         |), probe AS (
         |  SELECT vec_id AS pcid, cent_id AS cell FROM ranked
         |  WHERE rn <= 2 AND vec_id % 89 <> 0
         |), cand AS (
         |  SELECT DISTINCT p.pcid, e.eid FROM probe p JOIN eassign e USING (cell)
         |), dots AS (
         |  SELECT k.pcid, k.eid,
         |         CAST(ROUND(${Similarity.duckDot("c", "e")}
         |                    / SQRT(${Similarity.duckDot("c", "c")}
         |                           * ${Similarity.duckDot("e", "e")}),
         |                    6) AS DOUBLE) AS cosine
         |  FROM cand k
         |  JOIN embeddings c ON c.vec_id = k.pcid
         |  JOIN embeddings e ON e.vec_id = k.eid
         |  CROSS JOIN idx
         |  GROUP BY k.pcid, k.eid
         |), best AS (
         |  SELECT pcid, eid, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY pcid ORDER BY cosine DESC, eid) AS rn
         |  FROM dots
         |)
         |SELECT v.vec_id AS cid, b.eid AS nearest_eval, b.cosine,
         |       CAST(CASE WHEN b.cosine >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM embeddings v
         |LEFT JOIN best b ON b.pcid = v.vec_id AND b.rn = 1
         |WHERE v.vec_id % 89 <> 0
         |ORDER BY cid""".stripMargin) { (s, dir) =>
      val emb = Similarity.embDouble(s, dir)
      val (_, ranks) = Similarity.ivfIndex(s, dir)
      val evalAssign = ranks.filter(col("rn") === 1 && col("vec_id") % 89 === 0)
        .select(col("vec_id").as("eid"), col("cent_id").as("cell"))
      val corpusProbe = ranks.filter(col("vec_id") % 89 =!= 0)
        .select(col("vec_id").as("cid"), col("cent_id").as("cell"))
      val dot = (a: Column, b: Column) => graft.functions.VectorExprs.arrayDot(a, b)
      val cand = corpusProbe.join(evalAssign, "cell")
        .select("cid", "eid").distinct()
      val scored = cand
        .join(emb.select(col("vec_id").as("cid"), col("embedding").as("cv")), "cid")
        .join(emb.select(col("vec_id").as("eid"), col("embedding").as("ev")), "eid")
        .select(col("cid"), col("eid"),
          round(dot(col("cv"), col("ev")) /
            sqrt(dot(col("cv"), col("cv")) * dot(col("ev"), col("ev"))), 6)
            .as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cid").orderBy(col("cosine").desc, col("eid"))
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      emb.filter(col("vec_id") % 89 =!= 0).select(col("vec_id").as("cid"))
        .join(best, Seq("cid"), "left")
        .select(col("cid"), col("eid").as("nearest_eval"), col("cosine"),
          when(col("cosine") >= 0.8, 1L).otherwise(0L).as("contaminated"))
        .orderBy("cid")
    },

    // Sliding-window chunking: window 32 tokens, stride 24 (8-token
    // overlap); chunk identity pinned by md5 of the joined tokens so
    // the hash gate proves byte-identical chunk content on both engines.
    QueryDef(
      "q233_doc_chunking",
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |), starts AS (
        |  SELECT doc_id, ws, n, unnest(generate_series(1, n, 24)) AS start_tok
        |  FROM tok
        |)
        |SELECT doc_id,
        |       CAST((start_tok - 1) // 24 + 1 AS BIGINT) AS chunk_idx,
        |       CAST(start_tok AS BIGINT) AS start_tok,
        |       CAST(LEAST(32, n - start_tok + 1) AS BIGINT) AS n_toks,
        |       MD5(array_to_string(ws[start_tok : start_tok + 31], ' ')) AS chunk_md5
        |FROM starts
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("n", size(col("ws")))
        .select(col("doc_id"), col("ws"), col("n"),
          explode(sequence(lit(1), col("n"), lit(24))).as("start_tok"))
        .select(
          col("doc_id"),
          (expr("(start_tok - 1) div 24") + 1).cast("long").as("chunk_idx"),
          col("start_tok").cast("long").as("start_tok"),
          least(lit(32), col("n") - col("start_tok") + 1).cast("long").as("n_toks"),
          md5(array_join(slice(col("ws"), col("start_tok"), lit(32)), " "))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Sequence-packing audit: md5-shuffle the corpus, run a GLOBAL
    // token prefix sum (Dist.rangedPrefixSum — partitioned two-pass,
    // no single-partition window), chop at a 256-token budget:
    // seq_id = tokens-before div 256. Reports per-sequence doc count,
    // token fill, and how many docs span a sequence boundary (the
    // attention-mask cost of concat-and-chop packing).
    QueryDef(
      "q234_packing_audit",
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |         CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS k
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n, k,
        |         SUM(n) OVER (ORDER BY k, doc_id
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |), tagged AS (
        |  SELECT doc_id, n,
        |         (cum - n) // 256 AS seq_id,
        |         CASE WHEN (cum - 1) // 256 <> (cum - n) // 256 THEN 1 ELSE 0 END AS spans
        |  FROM c
        |)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n) AS BIGINT) AS n_tokens,
        |       CAST(SUM(spans) AS BIGINT) AS n_spanning
        |FROM tagged GROUP BY seq_id ORDER BY seq_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .withColumn("k", md5Int("cast(doc_id as string)"))
      val c = Dist.rangedPrefixSum(d, col("k"), col("doc_id"), col("n"), "cum")
      c.select(col("doc_id"), col("n"),
          expr("(cum - n) div 256").as("seq_id"),
          when(expr("(cum - 1) div 256") =!= expr("(cum - n) div 256"), 1L)
            .otherwise(0L).as("spans"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
          sum("spans").as("n_spanning"))
        .orderBy("seq_id")
    },

    // Normalization-aware exact dedup (wave-15): the FineWeb/Dolma-style
    // "near-exact" pass between raw-md5 dedup (q25) and MinHash (q27) —
    // lowercase, strip non-alphanumerics, collapse whitespace, THEN
    // hash. Per-source report: raw-distinct vs normalized-distinct and
    // how many extra docs the normalization collapses. One groupBy per
    // aggregation level, no joins — linear at any scale (the normalized
    // key is computed in codegen'd string expressions).
    QueryDef(
      "q235_normalized_dedup",
      """WITH n AS (
        |  SELECT source,
        |         MD5(text) AS raw_key,
        |         MD5(TRIM(REGEXP_REPLACE(
        |           REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]+', '', 'g'),
        |           ' +', ' ', 'g'))) AS norm_key
        |  FROM documents
        |)
        |SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT raw_key) AS BIGINT) AS distinct_raw,
        |       CAST(COUNT(DISTINCT norm_key) AS BIGINT) AS distinct_norm,
        |       CAST(COUNT(DISTINCT raw_key) - COUNT(DISTINCT norm_key) AS BIGINT)
        |         AS collapsed_by_norm
        |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("source"),
          md5(col("text")).as("raw_key"),
          md5(trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]+", ""),
            " +", " "))).as("norm_key"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("raw_key").as("distinct_raw"),
          countDistinct("norm_key").as("distinct_norm"),
          (countDistinct("raw_key") - countDistinct("norm_key"))
            .as("collapsed_by_norm"))
        .orderBy("source")
    },

    // Label-centroid outlier scan (wave-15): per-label mean embedding
    // (per-dim avg, 6-decimal rounding BEFORE reuse — the engine-
    // portable centroid discipline kmeansCentroids established), then
    // every vector's cosine to its own label centroid; low cosine =
    // probable label noise. The kNN-free complement of q85's
    // label-agreement: one aggregation + one broadcast-sized join
    // (centroids = |labels| rows), linear in vectors at any scale.
    QueryDef(
      "q236_label_centroid_outliers",
      s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         |cent AS (
         |  SELECT label, i.i, ROUND(AVG(CAST(embedding[i.i] AS DOUBLE)), 6) AS v
         |  FROM embeddings CROSS JOIN idx i GROUP BY label, i.i
         |), sc AS (
         |  SELECT e.vec_id, e.label,
         |         ROUND(SUM(CAST(e.embedding[c.i] AS DOUBLE) * c.v)
         |               / SQRT(SUM(CAST(e.embedding[c.i] AS DOUBLE)
         |                          * CAST(e.embedding[c.i] AS DOUBLE))
         |                      * SUM(c.v * c.v)), 6) AS cos
         |  FROM embeddings e JOIN cent c ON c.label = e.label
         |  GROUP BY e.vec_id, e.label
         |)
         |SELECT vec_id, CAST(label AS BIGINT) AS label,
         |       cos AS cos_to_centroid,
         |       CAST(CASE WHEN cos < 0.15 THEN 1 ELSE 0 END AS BIGINT) AS outlier
         |FROM sc ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
      val cents = emb
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(round(avg("x"), 6).as("m"))
        .groupBy("label")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label"), col("pm.m").as("centv"))
      val dot = (a: Column, b: Column) => graft.functions.VectorExprs.arrayDot(a, b)
      emb.join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"),
          round(dot(col("v"), col("centv")) /
            sqrt(dot(col("v"), col("v")) * dot(col("centv"), col("centv"))), 6)
            .as("cos_to_centroid"))
        .withColumn("outlier",
          when(col("cos_to_centroid") < 0.15, 1L).otherwise(0L))
        .orderBy("vec_id")
    }
  )
}
