package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{Dataset, SparkSession}

/** S1 — native decoder for raw MySQL binlog *binary* files (binlog format
  * v4, the public format documented in the MySQL internals manual), the one
  * source the reference delegates to an external tool (`go-binlogparser
  * -offset 4`, comparator.sh:91-93; README.md:35-52) and SURVEY §7.6 lists
  * as the deferred hard part of the domain.
  *
  * Layout decoded here:
  *   - 4-byte magic `0xFE 'b' 'i' 'n'` (the `-offset 4` skip);
  *   - per event, the v4 common header (19 bytes, little-endian):
  *     timestamp u32, type_code u8, server_id u32, event_size u32,
  *     end_log_pos u32, flags u16;
  *   - event-specific post-headers/bodies for the types the comparison
  *     consumes: FORMAT_DESCRIPTION(15), QUERY(2), XID(16), TABLE_MAP(19),
  *     GTID(33), ROTATE(4), WRITE/UPDATE/DELETE_ROWS v1(23/24/25) and
  *     v2(30/31/32). Every other type decodes header-only.
  *
  * The decode is inherently *stateful within a file* (a TABLE_MAP names the
  * schema/table for the row events that follow; a GTID event scopes the
  * transaction after it), so the parallelism unit is the file — one task
  * per file over `binaryFiles`, the same unit as the reference's per-file
  * loop and as [[BinlogTextParser]]. Binlog files are bounded (max_binlog_
  * size caps them ~1 GiB), so at 100 TB the fan-out is the file count.
  *
  * Output rows are [[ParsedBinlogEvent]] — identical shape to the text
  * parser, so `Comparator.prepareBinlog(parse(...), seqColumn)` runs the
  * whole comparison off raw binlogs with no external process. Event-type
  * names match the text parser's classifier (E4): canonical
  * `WriteRowsEventV2` / `UpdateRowsEventV2` / `DeleteRowsEventV2`, `XID`,
  * `Query`, `Gtid`, … (one trailing "Event" stripped).
  */
object BinlogBinaryParser {

  val Magic: Array[Byte] = Array(0xFE.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)

  /** type_code → canonical event-type name (after E4's Event-suffix strip). */
  val eventTypeNames: Map[Int, String] = Map(
    0 -> "Unknown", 1 -> "StartV3", 2 -> "Query", 3 -> "Stop", 4 -> "Rotate",
    5 -> "Intvar", 15 -> "FormatDescription", 16 -> "XID", 17 -> "BeginLoadQuery",
    18 -> "ExecuteLoadQuery", 19 -> "TableMap",
    23 -> "WriteRowsV1", 24 -> "UpdateRowsV1", 25 -> "DeleteRowsV1",
    26 -> "Incident", 27 -> "Heartbeat", 28 -> "Ignorable", 29 -> "RowsQuery",
    30 -> "WriteRowsEventV2", 31 -> "UpdateRowsEventV2", 32 -> "DeleteRowsEventV2",
    33 -> "Gtid", 34 -> "AnonymousGtid", 35 -> "PreviousGtids",
    36 -> "TransactionContext", 37 -> "ViewChange", 38 -> "XAPrepareLog",
    39 -> "PartialUpdateRows", 40 -> "TransactionPayload", 41 -> "HeartbeatV2")

  /** Read a directory/glob of raw `.bin`/`mysql-bin.NNNNNN` files. */
  def parse(spark: SparkSession, path: String): Dataset[ParsedBinlogEvent] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (p, stream) =>
        val base = p.split('/').last
        decodeFile(stream.toArray(), base)
      }
      .toDS()
  }

  /** Decode one whole binlog file (pure function — unit-testable). Malformed
    * trailing bytes end the scan (warn-and-stop, the binary analogue of the
    * reference's skip-malformed semantics); a bad magic fails loudly. */
  def decodeFile(bytes: Array[Byte], basename: String): Iterator[ParsedBinlogEvent] = {
    require(bytes.length >= 4 &&
      bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3),
      s"$basename: not a binlog file (bad magic)")
    val fileSeq = "\\.(\\d+)$".r.findFirstMatchIn(basename).map(_.group(1).toLong)

    val out = collection.mutable.ArrayBuffer.empty[ParsedBinlogEvent]
    var pos = 4
    var index = 0L
    // file-scoped decoder state
    var curSchema = ""
    var curTable = ""
    var curGtid = ""

    while (pos + 19 <= bytes.length) {
      val buf = ByteBuffer.wrap(bytes, pos, bytes.length - pos).order(ByteOrder.LITTLE_ENDIAN)
      val tsSec = buf.getInt & 0xFFFFFFFFL
      val typeCode = buf.get & 0xFF
      val serverId = buf.getInt & 0xFFFFFFFFL
      val eventSize = (buf.getInt & 0xFFFFFFFFL).toInt
      val endLogPos = buf.getInt & 0xFFFFFFFFL
      val flags = buf.getShort & 0xFFFF
      if (eventSize < 19 || pos + eventSize > bytes.length) {
        pos = bytes.length // malformed tail: stop (reference warns + skips)
      } else {
        val body = ByteBuffer.wrap(bytes, pos + 19, eventSize - 19)
          .order(ByteOrder.LITTLE_ENDIAN)
        val name = eventTypeNames.getOrElse(typeCode, s"Type$typeCode")
        var query = ""
        var xid: Option[Long] = None
        var gtidNext = ""
        var evSchema = ""
        var evTable = ""
        val extra = collection.mutable.LinkedHashMap.empty[String, String]
        extra("server_id") = serverId.toString
        extra("flags") = flags.toString

        // A malformed BODY degrades to a header-only event (the binary
        // analogue of the reference's warn-and-skip, P6) — the common
        // header already carried type/position/time, which is what the
        // comparison consumes.
        try typeCode match {
          case 2 => // QUERY: proxy_id u32, exec_time u32, schema_len u8,
            // error_code u16, status_len u16, status, schema, \0, query
            val proxyId = body.getInt & 0xFFFFFFFFL
            val execTime = body.getInt & 0xFFFFFFFFL
            val schemaLen = body.get & 0xFF
            val errorCode = body.getShort & 0xFFFF
            val statusLen = body.getShort & 0xFFFF
            body.position(body.position() + statusLen)
            val schemaBytes = new Array[Byte](schemaLen)
            body.get(schemaBytes)
            body.get() // trailing NUL
            val queryBytes = new Array[Byte](body.remaining())
            body.get(queryBytes)
            evSchema = new String(schemaBytes, "UTF-8")
            query = new String(queryBytes, "UTF-8")
            extra("slave_proxy_id") = proxyId.toString
            extra("execution_time") = execTime.toString
            extra("error_code") = errorCode.toString
          case 16 => // XID: u64 transaction id; ends the transaction scope
            xid = Some(body.getLong)
          case 19 => // TABLE_MAP: table_id u48, flags u16, schema_len u8,
            // schema, \0, table_len u8, table, \0, ...
            val tableId = readUInt48(body)
            body.getShort // flags
            val sl = body.get & 0xFF
            val sb = new Array[Byte](sl); body.get(sb); body.get()
            val tl = body.get & 0xFF
            val tb = new Array[Byte](tl); body.get(tb); body.get()
            curSchema = new String(sb, "UTF-8")
            curTable = new String(tb, "UTF-8")
            evSchema = curSchema
            evTable = curTable
            extra("tableid") = tableId.toString
          case 33 | 34 => // GTID / ANONYMOUS_GTID: flags u8, sid 16B, gno u64
            body.get() // commit flag
            val sid = new Array[Byte](16); body.get(sid)
            val gno = body.getLong
            curGtid = if (typeCode == 33) s"${formatUuid(sid)}:$gno" else ""
            gtidNext = curGtid
          case 4 => // ROTATE: position u64, next file name
            val rpos = body.getLong
            val nb = new Array[Byte](body.remaining()); body.get(nb)
            extra("next_file") = new String(nb, "UTF-8")
            extra("rotate_position") = rpos.toString
          case 23 | 24 | 25 | 30 | 31 | 32 => // ROWS v1/v2: table_id u48, flags u16
            val tableId = readUInt48(body)
            body.getShort
            evSchema = curSchema
            evTable = curTable
            gtidNext = curGtid
            extra("tableid") = tableId.toString
          case _ => () // header-only decode for everything else
        } catch {
          case e: RuntimeException =>
            extra("body_decode_error") = e.getClass.getSimpleName
        }

        val rfc = Instant.ofEpochSecond(tsSec).atOffset(ZoneOffset.UTC)
          .format(DateTimeFormatter.ISO_OFFSET_DATE_TIME)
        out += ParsedBinlogEvent(
          event_type = name,
          timestamp = rfc,
          immediate_commmit_timestamp = "",
          orignal_commmit_timestamp = "",
          log_position = Some(endLogPos),
          table = evTable,
          schema = evSchema,
          query = query,
          gtid_next = gtidNext,
          xid = xid,
          binlog_file = basename,
          file_seq = fileSeq,
          event_index = index,
          extra = extra.toMap)
        index += 1
        if (typeCode == 16) curGtid = "" // XID closes the transaction
        pos += eventSize
      }
    }
    out.iterator
  }

  private def readUInt48(b: ByteBuffer): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v |= (b.get & 0xFFL) << (8 * i); i += 1 }
    v
  }

  private def formatUuid(sid: Array[Byte]): String = {
    val hex = sid.map(b => f"${b & 0xFF}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** Input-order sequence column — same contract as the text parser's. */
  def seqColumn: org.apache.spark.sql.Column = BinlogTextParser.seqColumn
}
