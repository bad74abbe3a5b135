package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.cdc.{Comparator, Schemas}
import graft.ingest.{AvroSink, BinlogBinaryParser, BinlogBinaryWriter}

/** The full native-format LIVE configuration: a raw binlog binary tail
  * (`readStream.format("binlog")`) compared against an Avro container
  * tail (`readStream.format("avrofile")`) through the watermarked
  * stream-stream comparator — no JSON intermediates, no external
  * decoders, both sides the engine's own connectors end to end.
  */
class NativeStreamEndToEndSpec extends AnyFunSuite with SparkTestSession {
  import Schemas.Status

  private val T0 = 1714564800L // 2024-05-01T12:00:00Z

  test("binlog-binary tail vs avrofile tail through compareStreams") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("nativee2e").toFile
    val binDir = new java.io.File(root, "binlogs"); binDir.mkdirs()
    val avroDir = new java.io.File(root, "avro"); avroDir.mkdirs()

    // --- binlog side: one transaction with one WRITE_ROWS image ---
    import BinlogBinaryWriter._
    val f = new FileBuilder(checksums = true)
    f.fde(T0)
    f.event(T0, 33, gtidBody((1 to 16).map(_.toByte).toArray, 9))
    f.event(T0, 2, queryBody("shop", "BEGIN"))
    f.event(T0, 19, tableMapBody(3, "shop", "orders", Seq(ColDef.longlong)))
    val writePos = f.event(T0, 30, rowsBody(3, 1, Seq(Seq(Some(encLongLong(42))))))
    f.event(T0, 16, xidBody(7))
    Files.write(new java.io.File(binDir, "mysql-bin.000001").toPath, f.bytes)
    // confirm the fixture's key via the batch decoder
    assert(BinlogBinaryParser.decodeFile(f.bytes, "mysql-bin.000001")
      .find(_.event_type == "WriteRowsEventV2").get.log_position.contains(writePos))
    // a later binlog transaction pushes the BINLOG-side watermark (the
    // query's watermark is the min across both inputs)
    val farSec = T0 + 3600L * 24 + 10
    val f2 = new FileBuilder(checksums = true)
    f2.fde(farSec)
    f2.event(farSec, 19, tableMapBody(3, "shop", "orders", Seq(ColDef.longlong)))
    f2.event(farSec, 30, rowsBody(3, 1, Seq(Seq(Some(encLongLong(43))))))
    Files.write(new java.io.File(binDir, "mysql-bin.000002").toPath, f2.bytes)

    // --- avro side: resolved-form change records, two container files so
    // the far-future row lands in a LATER micro-batch and advances the
    // watermark past the first batch's join windows ---
    val far = (T0 + 3600L * 24) * 1000
    def writeContainer(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val df = rows.toDF("source_timestamp", "change_type", "binlog_position")
        .select(col("source_timestamp"), struct(
          lit("shop").as("database"), lit("orders").as("table"),
          col("change_type"), lit("").as("gtid"),
          lit("mysql-bin.000001").as("binlog_file"), col("binlog_position"),
          lit(false).as("is_deleted"),
          array(lit("id")).as("primary_keys")).as("source_metadata"))
      val tmp = new java.io.File(root, s"tmp_$name").getPath
      AvroSink.write(df.repartition(1), tmp)
      val container = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      Files.move(container.toPath, new java.io.File(avroDir, s"$name.avro").toPath)
    }
    writeContainer("changes-0001", Seq(
      (T0 * 1000 + 50, "INSERT", writePos),       // pairs with the write → MATCH
      (T0 * 1000, "INSERT", 999999L)))            // no binlog partner → AVRO_ONLY
    writeContainer("changes-0002", Seq(
      (far, "INSERT", 888888L)))                  // watermark pusher

    // --- live comparison ---
    val binlogStream = Comparator.normalizeBinlog(
      spark.readStream.format("binlog").load(binDir.getPath))
    val avroStream = Comparator.prepareAvro(Comparator.flattenResolvedAvro(
      spark.readStream.format("avrofile")
        .option("maxFilesPerTrigger", 1).load(avroDir.getPath)))
    // a live trigger (not AvailableNow): the outer join's null side flushes
    // in the batch AFTER the watermark advances, which needs the engine's
    // no-data micro-batches — poll the sink until the flush lands
    val q = StreamingComparator.compareStreams(
        avroStream, binlogStream, maxSkew = "10 minutes", watermarkDelay = "1 second")
      .select("position", "status")
      .writeStream.format("memory").queryName("native_e2e")
      .trigger(Trigger.ProcessingTime(250)).start()
    try {
      val deadline = System.nanoTime() + 90L * 1000000000L
      def seen(): Map[Long, String] = spark.table("native_e2e").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      var statuses = seen()
      while (!statuses.contains(999999L) && System.nanoTime() < deadline) {
        Thread.sleep(500); statuses = seen()
      }
      assert(statuses.get(writePos).contains(Status.Match), s"got $statuses")
      assert(statuses.get(999999L).contains(Status.AvroOnly), s"got $statuses")
    } finally q.stop()
  }

  test("huge single-file tail range-splits its micro-batch via the offset index") {
    // one large rotated binlog arriving in a tail used to decode as ONE
    // task per micro-batch (the r6 gap); with splitIndex wired into the
    // stream it fans out like the batch scan, with identical output
    import BinlogBinaryWriter._
    val root = Files.createTempDirectory("binsplitstream").toFile
    val binDir = new java.io.File(root, "binlogs"); binDir.mkdirs()
    val cols = Seq(ColDef.longlong, ColDef.varchar(64))
    val sid = (1 to 16).map(_.toByte).toArray
    val f = new FileBuilder(checksums = true)
    f.fde(T0)
    (0 until 60).foreach { tx =>
      f.event(T0 + tx, 33, gtidBody(sid, tx + 1L))
      f.event(T0 + tx, 2, queryBody("app", "BEGIN"))
      f.event(T0 + tx, 19, tableMapBody(7, "app", "t", cols))
      f.event(T0 + tx, 30, rowsBody(7, cols.size, (0 until 20).map(r =>
        Seq(Some(encLongLong(tx * 100L + r)),
          Some(encVarchar(s"row-$tx-$r-" + "x" * 40, 64))))))
      f.event(T0 + tx, 16, xidBody(9000L + tx))
    }
    Files.write(new java.io.File(binDir, "mysql-bin.000001").toPath, f.bytes)

    val index = new java.io.File(root, "idx").getPath
    val stream = spark.readStream.format("binlog")
      .option("splitIndex", index)
      .option("splitIndexAutoBuild", "true")
      .option("splitBytes", "8192")
      .load(binDir.getPath)
    val cs = Seq("event_type", "event_index", "xid", "log_position", "gtid_next")
    val maxParts = new java.util.concurrent.atomic.AtomicInteger(0)
    val streamed = collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        maxParts.getAndUpdate(m => math.max(m, df.rdd.getNumPartitions))
        streamed.synchronized {
          streamed ++= df.select(cs.map(col): _*).collect().map(_.toSeq)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(90000), "stream did not drain")

    assert(maxParts.get > 1,
      s"single-file micro-batch planned ${maxParts.get} partition(s) — not range-split")
    val batch = spark.read.format("binlog").load(binDir.getPath)
      .select(cs.map(col): _*).collect().map(_.toSeq)
    assert(streamed.sortBy(_.toString) == batch.toSeq.sortBy(_.toString),
      "streamed output != batch decode")
    // the auto-built shard persists for the next restart / batch scan
    assert(new java.io.File(index).isDirectory &&
      new java.io.File(index).listFiles().exists(_.getName.endsWith(".idx")))
  }
}
