package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cdc.{Comparator, Schemas}
import graft.ingest.Sources

/** Stream-static CDC comparison: the Avro feed as a file-source stream
  * against a static binlog snapshot, asserting per-row statuses match the
  * batch comparator's semantics for the streamable status family.
  */
class StreamingComparatorSpec extends AnyFunSuite with SparkTestSession {
  import Schemas.Status

  private val binlogLines = Seq(
    """{"event_type":"WriteRowsEventV2","immediate_commmit_timestamp":"2024-05-01T12:00:00Z","log_position":1000,"binlog_file":"mysql-bin.000001"}""",
    """{"event_type":"UpdateRowsEventV2","immediate_commmit_timestamp":"2024-05-01T12:00:00Z","log_position":2000,"binlog_file":"mysql-bin.000001"}""")

  private def avroLine(pos: Long, tsMs: Long) =
    s"""{"source_timestamp":$tsMs,"source_metadata":{"database":"shop","table":"orders","binlog_file":{"string":"mysql-bin.000001"},"binlog_position":{"long":$pos},"primary_keys":["id"]},"payload":{}}"""

  test("micro-batch emits MATCH / MISMATCH_TS / AVRO_ONLY with batch semantics") {
    val t0 = 1714564800000L // 2024-05-01T12:00:00Z
    val dir = Files.createTempDirectory("cdcstream").toFile
    val binlogFile = new java.io.File(dir, "binlog_metadata.json")
    Files.write(binlogFile.toPath, binlogLines.mkString("\n").getBytes)
    val streamDir = new java.io.File(dir, "avro"); streamDir.mkdirs()
    Files.write(new java.io.File(streamDir, "batch1.json").toPath, Seq(
      avroLine(1000, t0 + 50),   // MATCH
      avroLine(2000, t0 + 500),  // MISMATCH_TS
      avroLine(3000, t0)         // AVRO_ONLY
    ).mkString("\n").getBytes)

    // The static side of a stream-static join must avoid expressions the
    // streaming checker rejects (e.g. monotonically_increasing_id) — use a
    // stable input-order column, as BinlogTextParser.seqColumn does.
    val binlogStatic = Comparator.prepareBinlog(
      Sources.binlogJson(spark, binlogFile.getPath)
        .filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      col("log_position"))

    val avroStream = Comparator.prepareAvro(Comparator.flattenWrappedAvro(
      StreamingComparator.avroJsonStream(spark, streamDir.getPath)
        .drop("_corrupt_record")))

    val q = StreamingComparator.compareStream(avroStream, binlogStatic)
      .select("position", "status")
      .writeStream.format("memory").queryName("cdc_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val rows = spark.table("cdc_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(
      1000L -> Status.Match,
      2000L -> Status.MismatchTs,
      3000L -> Status.AvroOnly))
  }
}
