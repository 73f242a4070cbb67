package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.assetsFromDocuments(
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")).cache()

  test("asset table schema: binary payload + typed metadata") {
    assert(assets.schema("content").dataType.typeName === "binary")
    assert(assets.schema("meta").dataType.typeName === "struct")
    assert(assets.count() > 0)
  }

  test("feature extraction is deterministic and distributed") {
    val f1 = Multimodal.extractFeatures(assets)
    assert(f1.head().feature.length === 8)
    // checksum matches md5 of payload computed independently via SQL
    val viaSql = assets.select(col("asset_id"), md5(col("content")).as("sum"))
    val joined = f1.toDF().join(viaSql, "asset_id")
      .filter(col("checksum") =!= col("sum"))
    assert(joined.count() === 0)
    // n_bytes equals utf8 length of the source text
    val bad = f1.toDF().join(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id").as("asset_id"), octet_length(col("text")).as("len")),
      "asset_id").filter(col("n_bytes") =!= col("len"))
    assert(bad.count() === 0)
  }

  test("resize stub fits metadata into the box and shrinks payloads") {
    val resized = Multimodal.resizeStub(assets, maxW = 64, maxH = 48)
    val bad = resized.filter(col("meta.width") > 64 || col("meta.height") > 48)
    assert(bad.count() === 0)
    // no payload grows, none vanishes
    val joined = resized.select(col("asset_id"),
        octet_length(col("content")).as("after"))
      .join(assets.select(col("asset_id"),
        octet_length(col("content")).as("before")), "asset_id")
    assert(joined.filter(col("after") > col("before")).count() === 0)
    assert(joined.filter(col("after") < 1).count() === 0)
    // already-small assets are untouched (scale clamps at 1.0)
    val small = Multimodal.resizeStub(assets, maxW = 10000, maxH = 10000)
      .select(col("asset_id"), octet_length(col("content")).as("after"))
      .join(assets.select(col("asset_id"),
        octet_length(col("content")).as("before")), "asset_id")
    assert(small.filter(col("after") =!= col("before")).count() === 0)
  }

  test("chunk sampling keeps every stride-th chunk") {
    val chunks = Multimodal.sampleChunks(assets, chunkBytes = 32, stride = 2)
    assert(chunks.count() > 0)
    // indices are all even (stride 2)
    assert(chunks.filter(col("chunk_index") % 2 =!= 0).count() === 0)
    // chunk payloads never exceed the chunk size
    assert(chunks.filter(octet_length(col("chunk")) > 32).count() === 0)
  }

  test("byte-budget repartitioning") {
    val sized = assets.withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val rep = Multimodal.repartitionByBytes(sized, "n_bytes", targetBytes = 4096)
    assert(rep.rdd.getNumPartitions >= 1)
    assert(rep.count() === assets.count())
  }

  test("real image codec: png round-trip, features, corrupt-row tolerance") {
    val png = Multimodal.ImageCodec.encodePng(20, 12, seed = 7L)
    assert(png.length > 8 &&
      (png(1) & 0xff) == 'P' && (png(2) & 0xff) == 'N' && (png(3) & 0xff) == 'G')
    val meta = Multimodal.ImageCodec.decode(png).get
    assert(meta.width === 20 && meta.height === 12)
    // hash-noise raster: channel means sit near mid-range
    assert(meta.meanR > 64 && meta.meanR < 192)
    assert(Multimodal.ImageCodec.decode("not an image".getBytes) === None)
    // determinism: same seed, same bytes
    assert(Multimodal.ImageCodec.encodePng(20, 12, 7L).toSeq === png.toSeq)
  }

  test("real audio codec: wav round-trip, duration math, rms sanity") {
    val wav = Multimodal.AudioCodec.encodeWav(nFrames = 1600, sampleRate = 8000, seed = 5L)
    assert(new String(wav, 0, 4, "ASCII") === "RIFF")
    val meta = Multimodal.AudioCodec.decode(wav).get
    assert(meta.sampleRate === 8000 && meta.nFrames === 1600L)
    assert(meta.durationMs === 200L) // 1600 frames @ 8 kHz
    // hash-noise samples: rms near uniform-distribution expectation
    assert(meta.rms > 0.4 && meta.rms < 0.7, meta.rms.toString)
    assert(Multimodal.AudioCodec.decode("junk".getBytes) === None)
    assert(Multimodal.AudioCodec.encodeWav(1600, 8000, 5L).toSeq === wav.toSeq)
  }

  test("real image pipeline: distributed decode + resize with true dims") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(30)
    val imgs = Multimodal.imageAssetsFromDocuments(docs)
    val feats = Multimodal.extractImageFeatures(imgs).toDF()
    assert(feats.count() === 30)
    assert(feats.filter(col("decoded") === false).count() === 0)
    // decoded dims equal the metadata dims the encoder declared
    val mismatch = feats.join(imgs, "asset_id")
      .filter(col("width") =!= col("meta.width") ||
        col("height") =!= col("meta.height"))
    assert(mismatch.count() === 0)
    // real resize: no result exceeds the box, none upscaled
    val small = Multimodal.resizeImages(imgs, maxW = 10, maxH = 10)
    val dims = Multimodal.extractImageFeatures(small).toDF()
    assert(dims.count() === 30)
    assert(dims.filter(col("width") > 10 || col("height") > 10).count() === 0)
    // channel means survive the downscale approximately (bilinear)
    val joined = feats.select(col("asset_id"), col("mean_r").as("r0"))
      .join(dims.select(col("asset_id"), col("mean_r").as("r1")), "asset_id")
    assert(joined.filter(abs(col("r0") - col("r1")) > 40).count() === 0)
  }
}
