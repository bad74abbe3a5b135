package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SchemaEpochsSpec extends AnyFunSuite with SparkTestSession {
  import SchemaEpochs.{EpochedRows, TableEvent}

  test("epochs carry across micro-batches; within-batch log order recovered by sort") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sepoch").toFile
    val checkpoint = new java.io.File(dir, "ckpt").getPath
    val in = new java.io.File(dir, "in"); in.mkdirs()

    def line(tbl: String, fs: Long, ei: Long, alter: Boolean, n: Long, ks: Long) =
      s"""{"tbl":"$tbl","file_seq":$fs,"event_index":$ei,"is_alter":$alter,"n_rows":$n,"key_sum":$ks}"""

    // batch 1 (file b1): events WRITTEN OUT OF LOG ORDER — the row at
    // event_index 3 precedes the ALTER at 2 in file order, so an
    // implementation folding the iterator unsorted would tag it epoch 0.
    // Log order: row@1 (epoch 0), ALTER@2, row@3 (epoch 1).
    Files.write(new java.io.File(in, "b1.json").toPath, Seq(
      line("orders", 1, 3, alter = false, 5, 50),
      line("orders", 1, 1, alter = false, 2, 20),
      line("orders", 1, 2, alter = true, 0, 0)).mkString("\n").getBytes)
    // batch 2 (file b2): state must carry the one ALTER from batch 1 —
    // row@1 is epoch 1 (not 0); a second ALTER bumps row@3 to epoch 2.
    // A second table's events interleave and must NOT share state.
    Files.write(new java.io.File(in, "b2.json").toPath, Seq(
      line("orders", 2, 1, alter = false, 3, 30),
      line("orders", 2, 2, alter = true, 0, 0),
      line("orders", 2, 3, alter = false, 4, 40),
      line("users", 2, 4, alter = false, 7, 70)).mkString("\n").getBytes)
    // FileStreamSource orders batches by modification time; two
    // back-to-back writes can share an mtime on coarse-granularity
    // filesystems, which would let b2 drain first and break the
    // cross-batch assertion — pin the order explicitly
    val b1 = new java.io.File(in, "b1.json")
    val b2 = new java.io.File(in, "b2.json")
    Files.setLastModifiedTime(b2.toPath,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(b1.toPath).toMillis + 2000))

    val schema = StructType(Seq(
      StructField("tbl", StringType),
      StructField("file_seq", LongType),
      StructField("event_index", LongType),
      StructField("is_alter", BooleanType),
      StructField("n_rows", LongType),
      StructField("key_sum", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.getPath)
      .as[TableEvent]

    val q = SchemaEpochs.assign(stream)
      .writeStream.format("memory").queryName("sepoch")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sepoch").as[EpochedRows].collect()
      .map(r => (r.tbl, r.epoch, r.n_rows, r.key_sum)).sorted.toSeq
    assert(out == Seq(
      ("orders", 0L, 2L, 20L),  // b1 row@1, before the ALTER
      ("orders", 1L, 3L, 30L),  // b2 row@1: batch-1 ALTER carried in state
      ("orders", 1L, 5L, 50L),  // b1 row@3, after the ALTER despite file order
      ("orders", 2L, 4L, 40L),  // b2 row@3, after the second ALTER
      ("users", 0L, 7L, 70L)))  // separate key: no state bleed
  }
}
