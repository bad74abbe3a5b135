package graft.multimodal

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.MediaPipeline._

class MediaPipelineSpec extends AnyFunSuite with SparkTestSession {

  private def mediaDf(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"payload-$i", "image", "image/png"))
      .toDF("id", "text", "kind", "mime")
      .withColumn("payload", encode(col("text"), "UTF-8"))
  }

  test("batched decode covers every record across batch boundaries") {
    val ds = fromBinary(mediaDf(100).repartition(3), "id", "payload", "kind", "mime")
    val out = decodeFeatures(ds, batchSize = 7).collect()
    assert(out.length == 100)
    assert(out.map(_.media_id).sorted.toSeq == (0L until 100L))
    assert(out.forall(_.feature.length == 8))
  }

  test("features are the md5-derived deterministic fake") {
    val ds = fromBinary(mediaDf(1), "id", "payload", "kind", "mime")
    val f = decodeFeatures(ds).collect().head
    val hex = DigestUtils.md5Hex("payload-0".getBytes("UTF-8"))
    assert(f.content_hash == hex)
    assert(f.byte_len == "payload-0".length)
    assert(f.feature(0) == Integer.parseInt(hex.take(2), 16) / 256.0f)
    assert(f.kind == "image")
  }

  test("resize and frame-sample stubs are deterministic") {
    val bytes = "0123456789abcdef0123".getBytes("UTF-8")
    val r1 = MediaDecoder.resizeImage(bytes, 64, 64)
    val r2 = MediaDecoder.resizeImage(bytes, 64, 64)
    assert(r1.toSeq == r2.toSeq)
    assert(new String(r1.take(12), "UTF-8") == "resized:64x6")
    val frames = MediaDecoder.sampleFrames(bytes, 3)
    assert(frames.length == 3)
    assert(frames.forall(_.length <= 16))
  }

  test("typed batched resize maps every record and matches the decoder stub") {
    val ds = fromBinary(mediaDf(50).repartition(3), "id", "payload", "kind", "mime")
    val out = resizeImages(ds, 64, 64, batchSize = 7).collect()
    assert(out.length == 50)
    assert(out.map(_.media_id).sorted.toSeq == (0L until 50L))
    val direct = MediaDecoder.resizeImage("payload-0".getBytes("UTF-8"), 64, 64)
    assert(out.find(_.media_id == 0L).get.resized.toSeq == direct.toSeq)
  }

  test("typed frame sampling emits n indexed frames per object") {
    val ds = fromBinary(mediaDf(5), "id", "payload", "kind", "mime")
    val frames = sampleFrames(ds, n = 4).collect()
    assert(frames.length == 20)
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSet.size == 20)
    assert(frames.forall(_.frame_idx < 4))
    // deterministic: matches the decoder stub applied directly
    val direct = MediaDecoder.sampleFrames("payload-0".getBytes("UTF-8"), 4)
    val got = frames.filter(_.media_id == 0L).sortBy(_.frame_idx).map(_.frame.toSeq)
    assert(got.toSeq == direct.map(_.toSeq))
  }
}
