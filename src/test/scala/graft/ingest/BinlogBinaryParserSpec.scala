package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** S1 — raw binlog binary decode: synthetic v4 binlog files built
  * byte-for-byte per the public format, decoded to ParsedBinlogEvent and
  * flowed through the full comparator.
  */
class BinlogBinaryParserSpec extends AnyFunSuite with SparkTestSession {

  // ---- binary fixture builder -------------------------------------------

  private class FileBuilder {
    private val out = new ByteArrayOutputStream()
    out.write(BinlogBinaryParser.Magic)
    private var logPos = 4L

    def event(tsSec: Long, typeCode: Int, body: Array[Byte],
        serverId: Long = 1, flags: Int = 0): Long = {
      val size = 19 + body.length
      logPos += size
      val h = ByteBuffer.allocate(19).order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(tsSec.toInt).put(typeCode.toByte).putInt(serverId.toInt)
        .putInt(size).putInt(logPos.toInt).putShort(flags.toShort)
      out.write(h.array())
      out.write(body)
      logPos
    }

    def bytes: Array[Byte] = out.toByteArray
  }

  private def le(n: Int, width: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n.toLong)
    b.array().take(width)
  }

  private def queryBody(schema: String, sql: String): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(le(7, 4))                      // slave_proxy_id
    o.write(le(0, 4))                      // execution_time
    o.write(schema.length)                 // schema_len
    o.write(le(0, 2))                      // error_code
    o.write(le(0, 2))                      // status_vars_len (none)
    o.write(schema.getBytes("UTF-8")); o.write(0)
    o.write(sql.getBytes("UTF-8"))
    o.toByteArray
  }

  private def tableMapBody(tableId: Long, schema: String, table: String): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    (0 until 6).foreach(i => o.write(((tableId >> (8 * i)) & 0xFF).toInt))
    o.write(le(0, 2))                      // flags
    o.write(schema.length); o.write(schema.getBytes("UTF-8")); o.write(0)
    o.write(table.length); o.write(table.getBytes("UTF-8")); o.write(0)
    o.write(1)                             // column count (packed int, 1 byte)
    o.write(3)                             // column type: MYSQL_TYPE_LONG
    o.toByteArray
  }

  private def rowsBody(tableId: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    (0 until 6).foreach(i => o.write(((tableId >> (8 * i)) & 0xFF).toInt))
    o.write(le(0, 2))                      // flags (no extra-data for v2 test)
    o.toByteArray
  }

  private def gtidBody(sid: Array[Byte], gno: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(1)                             // commit flag
    o.write(sid)
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(gno)
    o.write(b.array())
    o.toByteArray
  }

  private def xidBody(xid: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(xid).array()

  private val T0 = 1714564800L // 2024-05-01T12:00:00Z

  private def buildFixture(): Array[Byte] = {
    val f = new FileBuilder
    f.event(T0, 15, new Array[Byte](84))   // FORMAT_DESCRIPTION (body unused)
    val sid = (1 to 16).map(_.toByte).toArray
    f.event(T0, 33, gtidBody(sid, 42))     // GTID uuid:42
    f.event(T0, 2, queryBody("shop", "BEGIN"))
    f.event(T0, 19, tableMapBody(7, "shop", "orders"))
    f.event(T0 + 1, 30, rowsBody(7))       // WRITE_ROWS v2
    f.event(T0 + 1, 16, xidBody(777))      // XID
    f.event(T0 + 2, 19, tableMapBody(8, "shop", "items"))
    f.event(T0 + 2, 32, rowsBody(8))       // DELETE_ROWS v2 (no GTID scope now)
    f.bytes
  }

  test("decodes the v4 event chain with stateful table/gtid association") {
    val evs = BinlogBinaryParser.decodeFile(buildFixture(), "mysql-bin.000007").toSeq
    assert(evs.map(_.event_type) == Seq("FormatDescription", "Gtid", "Query",
      "TableMap", "WriteRowsEventV2", "XID", "TableMap", "DeleteRowsEventV2"))

    val write = evs(4)
    assert(write.schema == "shop" && write.table == "orders")
    assert(write.gtid_next == "01020304-0506-0708-090a-0b0c0d0e0f10:42")
    assert(write.timestamp == "2024-05-01T12:00:01Z")
    assert(write.binlog_file == "mysql-bin.000007" && write.file_seq.contains(7L))

    // log_position is the END position, cumulative from offset 4
    assert(evs.head.log_position.contains(4L + 19 + 84))
    assert(evs.map(_.event_index) == (0L to 7L))

    val q = evs(2)
    assert(q.query == "BEGIN" && q.schema == "shop")
    assert(evs(5).xid.contains(777L))

    // XID closed the gtid scope: the second rows event carries none
    val del = evs(7)
    assert(del.gtid_next == "" && del.table == "items")
  }

  test("bad magic fails loudly; truncated tail stops cleanly") {
    intercept[IllegalArgumentException] {
      BinlogBinaryParser.decodeFile("nope".getBytes, "f").toSeq
    }
    val truncated = buildFixture().dropRight(5)
    val evs = BinlogBinaryParser.decodeFile(truncated, "mysql-bin.000007").toSeq
    assert(evs.size == 7) // last event dropped, no crash
  }

  test("malformed event body degrades to header-only, stream continues") {
    val f = new FileBuilder
    // QUERY event whose declared schema_len exceeds the body
    val bad = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 99 /* schema_len */, 0, 0)
    f.event(T0, 2, bad)
    f.event(T0, 16, xidBody(5))
    val evs = BinlogBinaryParser.decodeFile(f.bytes, "mysql-bin.000001").toSeq
    assert(evs.size == 2)
    assert(evs.head.event_type == "Query" && evs.head.query == "")
    assert(evs.head.extra.contains("body_decode_error"))
    assert(evs(1).xid.contains(5L)) // decode continued past the bad body
  }

  test("binary source drives the full comparison end to end") {
    val dir = Files.createTempDirectory("binbin").toFile
    Files.write(new java.io.File(dir, "mysql-bin.000007").toPath, buildFixture())

    val spark2 = spark
    import spark2.implicits._
    val parsed = BinlogBinaryParser.parse(spark, dir.getPath)
    val binlog = graft.cdc.Comparator.prepareBinlog(
      parsed.toDF(), BinlogBinaryParser.seqColumn)

    // avro side: one record matching the WRITE_ROWS key (end_log_pos of
    // event 5), one at a key with no binlog event
    val writePos = BinlogBinaryParser.decodeFile(buildFixture(), "mysql-bin.000007")
      .toSeq(4).log_position.get
    val avro = graft.cdc.Comparator.prepareAvro(Seq(
      ((T0 + 1) * 1000L, "shop", "orders", "INSERT", "", "mysql-bin.000007", writePos),
      ((T0 + 9) * 1000L, "shop", "orders", "INSERT", "", "mysql-bin.000007", 999999L)
    ).toDF("source_timestamp", "database", "table", "change_type", "gtid",
      "binlog_file", "binlog_position"))

    val compared = graft.cdc.Comparator.compare(binlog, avro)
    val statuses = compared.select("position", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses(writePos) == graft.cdc.Schemas.Status.Match)
    assert(statuses(999999L) == graft.cdc.Schemas.Status.AvroOnly)
    // the DELETE rows event is binlog-only DML
    val delPos = BinlogBinaryParser.decodeFile(buildFixture(), "mysql-bin.000007")
      .toSeq(7).log_position.get
    assert(statuses(delPos) == graft.cdc.Schemas.Status.BinlogOnly)
  }
}
