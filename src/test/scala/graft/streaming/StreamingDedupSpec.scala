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

  test("bounded retention: dup suppressed inside window, state expires after") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sdedupb").toFile
    val checkpoint = new java.io.File(dir, "ckpt").getPath
    val in = new java.io.File(dir, "in"); in.mkdirs()

    def line(file: String, pos: Long, ts: Long) =
      s"""{"binlog_file":"$file","binlog_position":$pos,"source_timestamp":$ts}"""

    // retention 10s. batch1: k1@1s. batch2: k1 dup @2s (inside window ⇒
    // suppressed) + k2@1000s (advances watermark far past k1's timeout).
    // batch3: k3 only — k1 has no data this batch, so its timed-out state
    // is dropped here. batch4: k1 again — state gone ⇒ re-emitted.
    // distinct mtimes: the file source orders batches by modification time
    def put(name: String, content: String, mtime: Long): Unit = {
      val f = new java.io.File(in, name)
      Files.write(f.toPath, content.getBytes)
      assert(f.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    put("b1.json", line("f", 1, 1000), t0)
    put("b2.json", Seq(line("f", 1, 2000), line("f", 2, 1000000)).mkString("\n"), t0 + 1000)
    put("b3.json", line("f", 3, 2000000), t0 + 2000)
    put("b4.json", line("f", 1, 2000100), t0 + 3000)

    val schema = StructType(Seq(
      StructField("binlog_file", StringType),
      StructField("binlog_position", LongType),
      StructField("source_timestamp", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.getPath)
      .as[KeyedRecord]

    val q = StreamingDedup.firstOccurrence(stream, Some(java.time.Duration.ofSeconds(10)))
      .writeStream.format("memory").queryName("sdedupb")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sdedupb").as[KeyedRecord].collect()
      .map(r => (r.binlog_file, r.binlog_position, r.source_timestamp)).sorted.toSeq
    assert(out == Seq(("f", 1L, 1000L), ("f", 1L, 2000100L),
      ("f", 2L, 1000000L), ("f", 3L, 2000000L)))
  }
}
