package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EventWindowsSpec extends AnyFunSuite with SparkTestSession {

  test("watermarked tumbling-window counts over a file stream") {
    val dir = Files.createTempDirectory("evwin").toFile
    Files.write(new java.io.File(dir, "events1.json").toPath, Seq(
      """{"ts":"2024-01-01T00:01:10Z","event_type":"click"}""",
      """{"ts":"2024-01-01T00:01:50Z","event_type":"click"}""",
      """{"ts":"2024-01-01T00:02:30Z","event_type":"view"}""",
      """{"ts":"2024-01-01T00:07:05Z","event_type":"click"}"""
    ).mkString("\n").getBytes)

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema).json(dir.getPath)

    val q = EventWindows.windowedCounts(stream, "ts", "event_type", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("ev_windows")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val rows = spark.table("ev_windows").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(2), r.getLong(3)))
      .toSet
    assert(rows == Set(
      ("2024-01-01T00:00:00Z", "click", 2L),
      ("2024-01-01T00:00:00Z", "view", 1L),
      ("2024-01-01T00:05:00Z", "click", 1L)))
  }
}
