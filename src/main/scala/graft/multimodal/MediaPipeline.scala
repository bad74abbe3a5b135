package graft.multimodal

import org.apache.commons.codec.digest.DigestUtils

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder prompt / SURVEY §7.7): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as *batched* partition
  * functions — the Scala-Spark equivalent of `mapInPandas` is a typed
  * `mapPartitions` over an iterator that is consumed in fixed-size batches
  * (so a real decoder could amortize model/codec initialization per batch,
  * exactly like an Arrow batch UDF).
  *
  * The actual byte-level decoders are STUBS — this container has no
  * image/audio codecs — implemented as clearly-marked deterministic fakes
  * (md5-derived features) so the Spark-side plumbing (schema, batching,
  * partitioning, end-to-end lineage) is real and testable. Swapping in a
  * real decoder changes only [[MediaDecoder.decodeBatch]]'s body.
  */
object MediaPipeline {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,             // image | audio | video | text
      mime: String,
      bytes: Array[Byte],
      width: Option[Int],       // images/video
      height: Option[Int],
      duration_ms: Option[Long] // audio/video
  )

  /** Decoded per-object features. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      content_hash: String,
      feature: Array[Float])

  /** Lift a DataFrame with (idCol: long, payloadCol: binary, kindCol,
    * mimeCol: string) into the typed media Dataset. */
  def fromBinary(
      df: DataFrame, idCol: String, payloadCol: String,
      kindCol: String, mimeCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        col(kindCol).as("kind"),
        col(mimeCol).as("mime"),
        col(payloadCol).cast("binary").as("bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Batched decode → features. `batchSize` is the Arrow-batch-equivalent
    * unit a real decoder would process at once. */
  def decodeFeatures(
      ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(MediaDecoder.decodeBatch)
    }
  }

  /** One resized media object. */
  case class MediaResized(media_id: Long, resized: Array[Byte])

  /** Batched resize through the decoder boundary (STUB resample standing
    * in for decode→resample→re-encode): same mapPartitions batch shape as
    * [[decodeFeatures]] — a real implementation initializes the codec
    * once per batch. Embarrassingly parallel per input row. */
  def resizeImages(ds: Dataset[MediaRecord], width: Int, height: Int,
      batchSize: Int = 64): Dataset[MediaResized] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(r =>
        MediaResized(r.media_id, MediaDecoder.resizeImage(r.bytes, width, height))))
    }
  }

  /** One sampled frame of a media object. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling as a typed flatMap: `n` frames per object via the
    * decoder boundary (STUB slices standing in for keyframe seeks) — the
    * row-multiplying stage of a video pipeline, still embarrassingly
    * parallel per input row. */
  def sampleFrames(ds: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      MediaDecoder.sampleFrames(r.bytes, n).zipWithIndex.map {
        case (f, i) => MediaFrame(r.media_id, i, f)
      }
    }
  }
}

/** The per-batch decoder boundary. Everything in here is a STUB standing in
  * for real codecs (PIL/ffmpeg/torchvision equivalents) that are absent in
  * this environment; each fake is deterministic so pipelines built on top
  * are testable end-to-end.
  */
object MediaDecoder {
  import MediaPipeline._

  private val FeatureDim = 8

  /** STUB decode: a real implementation would initialize the codec once
    * per batch and decode each payload (image → pixels → embedding,
    * audio → PCM → spectrogram, ...). The fake derives a deterministic
    * pseudo-feature from the payload's md5 so downstream plumbing
    * (schema, batching, joins, similarity) is fully exercisable. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val hex = DigestUtils.md5Hex(r.bytes)
      val feature = (0 until FeatureDim).map { i =>
        // two hex chars (one byte) per dim, scaled to [0, 1)
        Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16) / 256.0f
      }.toArray
      MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, hex, feature)
    }

  /** STUB resize: a real implementation decodes, resamples, re-encodes.
    * The fake tags the payload so tests can assert the call happened. */
  def resizeImage(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
    s"resized:${width}x$height:".getBytes("UTF-8") ++ bytes.take(16)

  /** STUB frame sampling: a real implementation seeks keyframes; the fake
    * returns `n` deterministic byte slices. */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val start = if (bytes.isEmpty) 0 else (i * bytes.length / math.max(n, 1)) % math.max(bytes.length, 1)
      bytes.slice(start, math.min(start + 16, bytes.length))
    }
}
