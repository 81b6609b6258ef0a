package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    MediaItem(1L, "image", Array[Byte](10, 20, 3, 4, 5)),
    MediaItem(2L, "audio", Array[Byte](-1, 0, 1, 2, 3)),
    MediaItem(3L, "video", Array[Byte](127, 127, 0, 0, 0))).toDS()

  test("decodeMeta: typed metadata from the binary header, batched per partition") {
    val meta = decodeMeta(corpus()).collect().sortBy(_.media_id)
    assert(meta(0) == DecodedMedia(1L, "image", 11, 21, 8300, 1400L, "png"))
    // byte -1 → unsigned 255 → & 0x7f = 127 → width 128
    assert(meta(1).width == 128 && meta(1).format == "wav")
    assert(meta(2).format == "mp4")
  }

  test("extractFeatures: fixed-width vectors composable with similarity search") {
    val feats = extractFeatures(corpus(), 8).collect().sortBy(_.media_id)
    assert(feats.forall(_.features.length == 8))
    assert(feats(0).features(0) == (10 - 128) / 128.0f)
  }

  test("resize rewrites content; frame sampling explodes inside the partition") {
    val resized = resize(corpus(), 4, 3).collect()
    assert(resized.forall(_.content.length == 12))
    val frames = sampleFrames(corpus(), 4)
    assert(frames.count() == 12)
    assert(frames.filter(col("media_id") === 1L && col("frame_idx") === 0).count() == 1)
  }

  test("synthesizeFromDocs: md5-byte blobs with deterministic kinds") {
    val docs = Seq((0L, "hello"), (1L, "world")).toDF("doc_id", "text")
    val m = synthesizeFromDocs(docs).collect().sortBy(_.media_id)
    assert(m(0).kind == "image" && m(1).kind == "audio")
    assert(m(0).content.length == 16) // md5 = 16 bytes
    // md5("hello") = 5d41402a... → first byte 0x5d = 93
    assert((m(0).content(0) & 0xff) == 0x5d)
  }

  test("repartitionForDecode spreads rows across the requested partitions") {
    val ds = repartitionForDecode(corpus(), 3)
    assert(ds.rdd.getNumPartitions == 3)
  }
}
