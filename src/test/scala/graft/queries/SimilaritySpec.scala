package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN kernel checks: trained-centroid recall vs the modulo stand-in,
  * and the q41 sub-band skew guard.
  */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  /** recall@3 of an IVF assignment against brute-force top-3 for the
    * query set vec_id < 10. */
  private def recallAt3(assign: org.apache.spark.sql.DataFrame): Double =
    recallAt3On(Similarity.embDouble(spark, sf), assign)

  private def recallAt3On(emb: org.apache.spark.sql.DataFrame,
      assign: org.apache.spark.sql.DataFrame, nQueries: Long = 10L): Double = {
    val dot = graft.functions.VectorExprs.arrayDot _
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sqdist"), col("cid"))
    val truth = q.join(c, col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(graft.functions.VectorExprs.arraySqDist(col("qv"), col("cv")), 6)
          .as("sqdist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "cid")
    val cells = assign
    val found = truth
      .join(cells.select(col("vec_id").as("qid"), col("cent_id").as("qcell")), "qid")
      .join(cells.select(col("vec_id").as("cid"), col("cent_id").as("ccell")), "cid")
      .filter(col("qcell") === col("ccell"))
      .count()
    found.toDouble / truth.count()
  }

  test("k-means IVF recall@3 >= modulo stand-in recall@3") {
    val emb = Similarity.embDouble(spark, sf)
    val trained = Similarity.nearestCell(emb, Similarity.kmeansCentroids(emb))
    val standIn = Similarity.nearestCell(emb,
      emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv")))
    val rTrained = recallAt3(trained)
    val rStandIn = recallAt3(standIn)
    info(s"recall@3 trained=$rTrained standin=$rStandIn")
    assert(rTrained >= rStandIn,
      s"k-means recall $rTrained < stand-in recall $rStandIn")
  }

  test("sample-trained centroids keep recall where the train stride binds") {
    // 20k dim-8 vectors in 80 planted clusters; maxCentroids=64 makes
    // stride = ceil(20000/64) = 313 and trainStride = 313/64 = 4, so
    // the sampled path trains on 25% of the corpus — the same regime
    // the production cap reaches at ~524k vectors. Recall of the
    // sampled training must match full-corpus training (small epsilon:
    // both are 2-iteration Lloyd, neither is "the" optimum).
    val emb = spark.range(20000).select(
      col("id").as("vec_id"),
      array((0 until 8).map(j =>
        sin(col("id") % 80 * 7 + lit(j)) * 10.0 +
          sin(col("id") * 13 + lit(j)) * 6.0): _*).as("embedding"))
      .cache()
    val sampled = Similarity.nearestCell(emb,
      Similarity.kmeansCentroidsWith(emb, Similarity.TrainPerCell, 64L))
    val full = Similarity.nearestCell(emb,
      Similarity.kmeansCentroidsWith(emb, Long.MaxValue, 64L))
    val rSampled = recallAt3On(emb, sampled, nQueries = 100L)
    val rFull = recallAt3On(emb, full, nQueries = 100L)
    info(s"recall@3 sampled=$rSampled full=$rFull")
    assert(rSampled >= rFull - 0.10,
      s"sampled-training recall $rSampled lags full-training $rFull")
  }

  test("sub-band guard caps one overloaded cell's pair fan-out") {
    // 40 vectors forced into ONE cell, in two antipodal clusters of 20
    // (opposite SRP signatures). cap=30 < 40 → the join key picks up
    // the signature: only intra-cluster pairs (2 × C(20,2) = 380)
    // survive. An uncapped join would emit C(40,2) = 780 pairs.
    val base = (0 until 64).map(i => math.sin(i + 1)).toArray
    val vecs = (0L until 40L).map { id =>
      val s = if (id % 2 == 0) 1.0 else -1.0
      // tiny per-id jitter keeps vectors distinct but firmly same-sign
      (id, 0L, base.map(v => s * (v + 0.001 * (id % 7))))
    }
    val withVec = vecs.toDF("vec_id", "cell", "embedding")
    val capped = Similarity.subBandedCellPairs(withVec, cap = 30).collect()
    val uncapped = Similarity.subBandedCellPairs(withVec, cap = 1000).collect()
    assert(uncapped.length === 780, "no cap: full quadratic fan-out")
    assert(capped.length === 380,
      s"cap must keep only intra-band pairs, got ${capped.length}")
    // the surviving pairs are exactly the near-dup ones (same cluster
    // → cosine ~ 1); the guard dropped only cross-cluster pairs
    assert(capped.forall(_.getAs[Double]("cosine") > 0.9))
  }
}
