package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Golden tests for the stateful binlog text-block parser (SURVEY §2.10,
  * reference json_parser.go): block assembly, E3-E7 normalizations, the two
  * E6 high-precision layouts, and the Spark wholetext read path.
  */
class BinlogTextParserSpec extends AnyFunSuite with SparkTestSession {

  private val decoderText =
    """preamble line ignored
      |=== QueryEvent ===
      |Date: 2024-05-01 11:59:59
      |Log position: 1420
      |Schema: shop
      |Query: BEGIN
      |--
      |=== WriteRowsEventV2 ===
      |Date: 2024-05-01 12:00:00
      |Log position: 1573
      |Table: orders
      |Schema: shop
      |Immediate commmit timestamp: 1714564800123456 (2024-05-01T12:00:00.123456789Z)
      |Orignal commmit timestamp: 2024-05-01 12:00:00.5 +0000 UTC
      |GTID_NEXT: uuid:42
      |
      |=== XidEvent ===
      |Date: 2024-05-01 12:00:01
      |Log position: 1604
      |XID: 77
      |Event type: UpdateRowsEventV2 (42)
      |""".stripMargin

  private lazy val events =
    BinlogTextParser.parseFile("mysql-bin.000007", decoderText.linesIterator).toSeq

  test("blocks assembled; pre-header content skipped") {
    assert(events.map(_.event_type) == Seq("Query", "WriteRowsEventV2", "UpdateRowsEventV2"))
    assert(events.map(_.event_index) == Seq(0L, 1L, 2L))
  }

  test("E4: strip one trailing Event; canonical V2 names win incl. `Event type:` override") {
    assert(events(0).event_type == "Query")         // QueryEvent → Query
    assert(events(2).event_type == "UpdateRowsEventV2") // XidEvent overridden by Event type value
  }

  test("E5: seconds-precision Date becomes RFC3339") {
    assert(events(0).timestamp == "2024-05-01T11:59:59Z")
  }

  test("E6a: parenthesized RFC3339Nano suffix extracted") {
    assert(events(1).immediate_commmit_timestamp == "2024-05-01T12:00:00.123456789Z")
  }

  test("E6b: Go-layout timestamp reformatted to RFC3339Nano") {
    assert(events(1).orignal_commmit_timestamp == "2024-05-01T12:00:00.5Z")
  }

  test("E7/typed fields: log position, table, schema, gtid, xid") {
    val w = events(1)
    assert(w.log_position.contains(1573L))
    assert(w.table == "orders" && w.schema == "shop" && w.gtid_next == "uuid:42")
    assert(events(2).xid.contains(77L))
  }

  test("E14/E15: file basename + natural-order sequence") {
    assert(events.forall(_.binlog_file == "mysql-bin.000007"))
    assert(events.forall(_.file_seq.contains(7L)))
  }

  test("unparseable high-precision value kept raw") {
    assert(BinlogTextParser.parseHighPrecision("not a timestamp") == "not a timestamp")
  }

  test("Spark wholetext path parses files in place") {
    val dir = Files.createTempDirectory("binlogtxt").toFile
    Files.write(new java.io.File(dir, "mysql-bin.000007").toPath, decoderText.getBytes)
    val ds = BinlogTextParser.parse(spark, dir.getPath)
    val rows = ds.collect().sortBy(_.event_index)
    assert(rows.map(_.event_type).toSeq == Seq("Query", "WriteRowsEventV2", "UpdateRowsEventV2"))
    // feeds straight into the comparator input contract
    val input = BinlogTextParser.toComparatorInput(ds)
    assert(input.columns.contains("immediate_commmit_timestamp"))
  }
}
