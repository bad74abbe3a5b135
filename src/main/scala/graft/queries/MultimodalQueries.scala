package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.MediaPipeline

/** Multimodal pipeline exercised through the oracle gate: document text
  * payloads stand in for media bytes (the only binary-able column in the
  * testdata), flowing through the real typed `mapPartitions` batch-decode
  * path. The stubbed decoder's md5-derived features are exact binary
  * fractions (hexbyte/256), so even the float feature is oracle-checkable.
  */
object MultimodalQueries {

  // m01 — binary ingestion → batched decode → per-object features.
  def m01MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), col("text"),
      lit("text").as("kind"), lit("text/plain").as("mime"))
    val media = MediaPipeline.fromBinary(
      docs.withColumn("payload", encode(col("text"), "UTF-8")),
      "doc_id", "payload", "kind", "mime")
    MediaPipeline.decodeFeatures(media, batchSize = 64)
      .toDF()
      .select(
        col("media_id"), col("kind"), col("byte_len"), col("content_hash"),
        col("feature")(0).cast("double").as("f0"))
      .orderBy("media_id")
  }

  val m01Oracle: String =
    """SELECT doc_id AS media_id, 'text' AS kind,
      |  CAST(strlen(text) AS BIGINT) AS byte_len,
      |  md5(text) AS content_hash,
      |  CAST(('0x' || substr(md5(text), 1, 2)) AS INT)/256.0 AS f0
      |FROM documents ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> (m01MediaFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "m01_media_features" -> m01Oracle,
  )
}
