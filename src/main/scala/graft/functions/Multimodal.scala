package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata, processed with per-partition batch
  * functions (`mapPartitions` — the Scala analog of `mapInPandas`,
  * same batch-at-a-time shape).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features
  * from the bytes. Everything around it — schema, batching,
  * partitioning, metadata propagation — is real and is what matters at
  * 100 TB: rows carry ~MB payloads, so operators must (a) never
  * collect, (b) repartition by byte budget not row count, (c) keep
  * features columnar once extracted.
  */
object Multimodal {

  /** Asset schema: opaque payload + typed metadata (mirrors
    * image/audio lakehouse layouts).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build an asset table from documents (payload = utf8 bytes) — a
    * deterministic stand-in for real blobs so the pipeline is testable.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))

  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      feature: Array[Float])

  /** STUB decode: bytes → fixed-size feature vector. A real deployment
    * replaces the body with an image/audio codec call; the signature,
    * batching and schema stay identical.
    */
  def decodeStub(content: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition feature extraction — one JVM-side batch loop per
    * partition (no per-row UDF overhead, no driver involvement).
    */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, mt, bytes) =>
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          AssetFeatures(id, mt, bytes.length.toLong, sum, decodeStub(bytes))
        }
      }
  }

  /** STUB resize: recompute target metadata (aspect-preserving fit
    * into a bounding box) and re-derive a payload of proportional
    * size. A real deployment swaps the payload body for a codec
    * resize; the metadata math and schema flow are the real thing.
    */
  def resizeStub(assets: DataFrame, maxW: Int, maxH: Int): DataFrame =
    assets
      .withColumn("__scale", least(
        lit(maxW.toDouble) / col("meta.width"),
        lit(maxH.toDouble) / col("meta.height"),
        lit(1.0)))
      // payload shrinks with area (scale²), floor 1 byte — computed
      // BEFORE meta is replaced so the scale refers to the original
      .withColumn("content", expr(
        "substring(content, 1, cast(greatest(1.0, length(content) * __scale * __scale) as int))"))
      .withColumn("meta", struct(
        floor(col("meta.width") * col("__scale")).cast("int").as("width"),
        floor(col("meta.height") * col("__scale")).cast("int").as("height"),
        col("meta.duration_ms")))
      .drop("__scale")

  /** Frame/chunk sampling: slice the payload into fixed-size chunks and
    * keep every `stride`-th one (the video-frame-sampling shape) —
    * explode stays on executors, output rows carry small slices.
    */
  def sampleChunks(assets: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val chunks = assets.select("asset_id", "content")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => (id, idx, chunk) }
      }
    chunks.toDF("asset_id", "chunk_index", "chunk")
  }

  /** Byte-budget repartitioning: aim for ~`targetBytes` per partition
    * using the metadata size column — the knob that keeps ~MB-payload
    * rows from blowing past executor memory at scale.
    */
  def repartitionByBytes(assets: DataFrame, sizeCol: String, targetBytes: Long): DataFrame = {
    val total = assets.agg(sum(col(sizeCol))).head().getLong(0)
    val parts = math.max(1, math.min(10000, (total / math.max(1L, targetBytes)).toInt))
    assets.repartition(parts)
  }
}
