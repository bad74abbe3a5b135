package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingDedupSpec extends AnyFunSuite with SparkTestSession {
  import StreamingDedup.KeyedRecord

  test("first occurrence per key survives within and across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sdedup").toFile
    val checkpoint = new java.io.File(dir, "ckpt").getPath
    val in = new java.io.File(dir, "in"); in.mkdirs()

    def line(file: String, pos: Long, ts: Long) =
      s"""{"binlog_file":"$file","binlog_position":$pos,"source_timestamp":$ts}"""

    // batch 1: k1 twice (in-batch dup) + k2; batch 2: k1 again + k3
    Files.write(new java.io.File(in, "b1.json").toPath, Seq(
      line("f", 1, 10), line("f", 1, 11), line("f", 2, 20)).mkString("\n").getBytes)
    Files.write(new java.io.File(in, "b2.json").toPath, Seq(
      line("f", 1, 12), line("f", 3, 30)).mkString("\n").getBytes)

    val schema = StructType(Seq(
      StructField("binlog_file", StringType),
      StructField("binlog_position", LongType),
      StructField("source_timestamp", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.getPath)
      .as[KeyedRecord]

    val q = StreamingDedup.firstOccurrence(stream)
      .writeStream.format("memory").queryName("sdedup")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sdedup").as[KeyedRecord].collect()
      .map(r => (r.binlog_file, r.binlog_position)).sorted.toSeq
    assert(out == Seq(("f", 1L), ("f", 2L), ("f", 3L)))
  }
}
