package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingScd2Spec extends AnyFunSuite with SparkTestSession {
  import StreamingScd2.{Change, Version}

  test("open version carries across micro-batches; DELETE closes without " +
      "emitting; within-batch order recovered by sort") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sscd2").toFile
    val checkpoint = new java.io.File(dir, "ckpt").getPath
    val in = new java.io.File(dir, "in"); in.mkdirs()

    def line(uid: Long, ms: Long, ct: String, pos: Long) =
      s"""{"user_id":$uid,"src_ms":$ms,"ct":"$ct","pos":$pos}"""

    // batch 1, WRITTEN OUT OF CHANGE ORDER: key 1's UPDATE@200 precedes
    // its INSERT@100 in file order — the fold must sort by (src_ms, pos).
    // Key 2 gets one INSERT that stays open across the batch boundary.
    Files.write(new java.io.File(in, "b1.json").toPath, Seq(
      line(1, 200, "UPDATE", 11),
      line(1, 100, "INSERT", 10),
      line(2, 150, "INSERT", 20)).mkString("\n").getBytes)
    // batch 2: key 1's DELETE closes the open UPDATE without emitting a
    // version of its own; key 2's UPDATE must close the INSERT held in
    // STATE from batch 1 (valid_to 300), then stay open itself.
    Files.write(new java.io.File(in, "b2.json").toPath, Seq(
      line(1, 400, "DELETE", 12),
      line(2, 300, "UPDATE", 21)).mkString("\n").getBytes)
    val b1 = new java.io.File(in, "b1.json")
    val b2 = new java.io.File(in, "b2.json")
    Files.setLastModifiedTime(b2.toPath,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(b1.toPath).toMillis + 2000))

    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("src_ms", LongType),
      StructField("ct", StringType),
      StructField("pos", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.getPath)
      .as[Change]

    val q = StreamingScd2.build(stream)
      .writeStream.format("memory").queryName("sscd2")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000),
      "drain did not finish within 60s — assertions below would see a partial table")

    val raw = spark.table("sscd2").as[Version].collect().toSeq
    // raw emissions: provisional opens + closes (a superseded version
    // appears twice — that is the documented reconciliation contract)
    val reconciled = raw.groupBy(v => (v.user_id, v.version_pos))
      .map { case (_, vs) => vs.find(_.valid_to_ms.isDefined).getOrElse(vs.head) }
      .toSeq
      .map(v => (v.user_id, v.version_pos, v.change_type,
        v.valid_from_ms, v.valid_to_ms))
      .sorted
    assert(reconciled == Seq(
      (1L, 10L, "INSERT", 100L, Some(200L)), // closed within batch 1
      (1L, 11L, "UPDATE", 200L, Some(400L)), // closed by batch-2 DELETE
      (2L, 20L, "INSERT", 150L, Some(300L)), // closed ACROSS the boundary
      (2L, 21L, "UPDATE", 300L, None)))      // still current
    // the DELETE itself emitted no version
    assert(!raw.exists(_.change_type == "DELETE"))
    // each version closes at most once
    assert(raw.count(_.valid_to_ms.isDefined) == 3)
  }
}
