package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed binlog sink ↔ native binlog source round-trip: what the
  * executors encode, the DSv2 scan must decode back row-identically —
  * the cdc43 mutual-inverse discipline applied to the binlog write side
  * (BinlogRoundTripSpec covers the single-file byte layout; this covers
  * the PARTITIONED write: file-per-partition naming, empty-partition
  * skip, multi-event batching). */
class BinlogSinkSpec extends AnyFunSuite with SparkTestSession {

  test("writeKeyedStrings round-trips through format(binlog), one file per non-empty partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_").toString
    // 250 rows → multiple 100-row WRITE_ROWS events per partition; one
    // partition keyed to be EMPTY (keys chosen mod 4 ≠ 3 is not
    // guaranteed by hash partitioning, so force it with a 1-key spread)
    val df = (0 until 250).map(i => (i.toLong, s"payload_$i")).toDF("k", "v")
      .repartition(4, col("k"))
    BinlogSink.writeKeyedStrings(df, dir, maxLen = 20)
    // the Hadoop local FS adds hidden .crc integrity sidecars — data files
    // are the visible ones
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.startsWith("mysql-bin.")),
      files.mkString(","))
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .as[(Long, String)].collect().toSet
    assert(back == (0 until 250).map(i => (i.toLong, s"payload_$i")).toSet)
  }

  test("writeChanges encodes +1 as WRITE_ROWS and -1 as DELETE_ROWS, order preserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_c_").toString
    // alternating ops force multiple events per file (one event per op run)
    val rows = (0 until 60).map(i =>
      (if (i % 3 == 0) -1 else 1, i.toLong, s"g${i % 2}"))
    val df = rows.toDF("op", "k", "v").coalesce(1)
    BinlogSink.writeChanges(df, dir)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type").isin("WriteRowsEventV2", "DeleteRowsEventV2"))
      .select(col("event_type"), col("event_index"),
        explode(col("row_images")).as("img"))
      .select(col("event_type"),
        element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .collect()
    val expectIns = rows.filter(_._1 == 1).map(r => (r._2, r._3)).toSet
    val expectDel = rows.filter(_._1 == -1).map(r => (r._2, r._3)).toSet
    assert(back.filter(_.getString(0) == "WriteRowsEventV2")
      .map(r => (r.getLong(1), r.getString(2))).toSet == expectIns)
    assert(back.filter(_.getString(0) == "DeleteRowsEventV2")
      .map(r => (r.getLong(1), r.getString(2))).toSet == expectDel)
  }

  test("writeChanges rejects an op outside +1/-1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_o_").toString
    val e = intercept[org.apache.spark.SparkException] {
      BinlogSink.writeChanges(Seq((2, 1L, "x")).toDF("op", "k", "v"), dir)
    }
    assert(e.getMessage != null)
  }

  test("maxLen >= 256 takes the 2-byte VARCHAR length prefix path (d32's text payloads)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_w_").toString
    val rows = Seq((1L, "x" * 300), (2L, "y" * 255), (3L, "short"))
    BinlogSink.writeKeyedStrings(rows.toDF("k", "v").coalesce(1), dir,
      maxLen = 2048)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("explicit file: URI routes through the Hadoop FileSystem API") {
    import spark.implicits._
    val raw = java.nio.file.Files.createTempDirectory("graft_binlog_sink_u_")
    val dir = "file://" + raw.toString // scheme-qualified, as HDFS/S3 would be
    val df = (0 until 20).map(i => (i.toLong, s"u_$i")).toDF("k", "v")
      .repartition(2, col("k"))
    BinlogSink.writeKeyedStrings(df, dir)
    val files = raw.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.startsWith("mysql-bin.")))
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .as[(Long, String)].collect().toSet
    assert(back == (0 until 20).map(i => (i.toLong, s"u_$i")).toSet)
  }

  test("caller columns named op/_op/_k cannot shadow the sink's internals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_s_").toString
    // a payload column literally named "op" and a key named "_op": the
    // positional toDF rename must keep resolution unambiguous
    val df = Seq((1, 10L, "a"), (-1, 11L, "b")).toDF("_k", "_op", "op")
    BinlogSink.writeChanges(df, dir)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type").isin("WriteRowsEventV2", "DeleteRowsEventV2"))
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"))
      .as[Long].collect().toSet
    assert(back == Set(10L, 11L))
  }

  test("multi-column changelog round-trips: BIGINT + INT + two VARCHARs, nulls on the bitmap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_m_").toString
    // (op, id BIGINT, qty INT, tag STRING?, note STRING) — the r13 wide
    // shape; tag carries nulls, which must ride the row image's null
    // bitmap and decode back as null cells, not fail or become ""
    val rows = (0 until 40).map { i =>
      (if (i % 5 == 0) -1 else 1, i.toLong, i * 3,
        if (i % 4 == 0) null else s"tag$i", s"note_${i}_" + ("z" * (i % 7)))
    }
    val df = rows.toDF("op", "id", "qty", "tag", "note").coalesce(1)
    BinlogSink.writeChanges(df, dir) // VARCHAR bounds derived from the data
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type").isin("WriteRowsEventV2", "DeleteRowsEventV2"))
      .select(col("event_type"), explode(col("row_images")).as("img"))
      .select(
        (when(col("event_type") === "WriteRowsEventV2", 1).otherwise(-1)).as("op"),
        element_at(col("img"), 1).cast("long").as("id"),
        element_at(col("img"), 2).cast("int").as("qty"),
        element_at(col("img"), 3).as("tag"),
        element_at(col("img"), 4).as("note"))
      .as[(Int, Long, Int, Option[String], String)].collect().toSet
    val expect = rows.map { case (op, id, q, t, n) =>
      (op, id, q, Option(t), n) }.toSet
    assert(back == expect)
  }

  test("derived VARCHAR bound crosses the 2-byte prefix threshold from the data alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_d_").toString
    // no explicit maxLen: one 300-byte payload forces a derived bound
    // >= 256, which must flip the wire to the 2-byte length prefix
    val rows = Seq((1L, "x" * 300), (2L, "short"))
    BinlogSink.writeKeyedStrings(rows.toDF("k", "v").coalesce(1), dir)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("writeDml: UPDATE_ROWS carries paired before/after images; inserts/deletes pick theirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_u2_").toString
    // (op, before_k, before_v, after_k, after_v) — FULL row images
    val rows = Seq(
      (1, 0L, null.asInstanceOf[String], 10L, "ten"),    // insert: after only
      (0, 10L, "ten", 10L, "TEN"),                       // update: both
      (1, 0L, null.asInstanceOf[String], 11L, "eleven"),
      (-1, 11L, "eleven", 0L, null.asInstanceOf[String]), // delete: before only
      (0, 10L, "TEN", 12L, "moved"))                     // key-changing update
    BinlogSink.writeDml(
      rows.toDF("op", "bk", "bv", "ak", "av").coalesce(1), dir)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type")
        .isin("WriteRowsEventV2", "UpdateRowsEventV2", "DeleteRowsEventV2"))
      .select(col("event_type"), col("event_index"), col("row_images"))
      .collect()
    // updates: row_images alternate (before, after) as consecutive entries
    val upd = back.filter(_.getString(0) == "UpdateRowsEventV2")
      .flatMap(_.getSeq[scala.collection.Seq[String]](2)).map(img => (img(0).toLong, img(1)))
    assert(upd.toSeq.grouped(2).map(p => (p(0), p(1))).toSet ==
      Set(((10L, "ten"), (10L, "TEN")), ((10L, "TEN"), (12L, "moved"))))
    val ins = back.filter(_.getString(0) == "WriteRowsEventV2")
      .flatMap(_.getSeq[scala.collection.Seq[String]](2)).map(img => (img(0).toLong, img(1))).toSet
    assert(ins == Set((10L, "ten"), (11L, "eleven")))
    val del = back.filter(_.getString(0) == "DeleteRowsEventV2")
      .flatMap(_.getSeq[scala.collection.Seq[String]](2)).map(img => (img(0).toLong, img(1))).toSet
    assert(del == Set((11L, "eleven")))
  }

  test("FLOAT/DOUBLE columns round-trip bit-exactly through the wire") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_f_").toString
    // adversarial values: subnormal, negative zero, float-imprecise
    // decimals, extremes — Float.toString's shortest-representation
    // contract must parse back to identical bits through the decoder
    val rows = Seq(
      (1L, 0.1f, 0.1), (2L, -0.0f, -0.0), (3L, Float.MinPositiveValue, 2.5e-308),
      (4L, 3.4028235e38f, 1.7976931348623157e308), (5L, -1.5f, 3.141592653589793))
    BinlogSink.writeChanges(
      rows.map(r => (1, r._1, r._2, r._3)).toDF("op", "k", "f", "d").coalesce(1), dir)
    val back = spark.read.format("binlog").load(dir)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).cast("float").as("f"),
        element_at(col("img"), 3).cast("double").as("d"))
      .as[(Long, Float, Double)].collect().toSet
    // compare raw BITS (== would pass -0.0 against 0.0)
    def bits(s: Set[(Long, Float, Double)]) = s.map { case (k, f, d) =>
      (k, java.lang.Float.floatToRawIntBits(f), java.lang.Double.doubleToRawLongBits(d)) }
    assert(bits(back) == bits(rows.toSet))
  }

  test("unsupported wire type is rejected loudly at plan time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_t_").toString
    val e = intercept[IllegalArgumentException] {
      BinlogSink.writeChanges(Seq((1, 1L, true)).toDF("op", "k", "x"), dir)
    }
    assert(e.getMessage.contains("unsupported wire type"))
  }

  test("null payload fails with a clear message, not an NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_n_").toString
    val df = Seq((1L, "ok"), (2L, null: String)).toDF("k", "v").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      BinlogSink.writeKeyedStrings(df, dir)
    }
    assert(e.getMessage.contains("null payload")
      || Option(e.getCause).exists(_.getMessage.contains("null payload")))
  }

  test("rowsPerTxn frames many transactions per file; every row still decodes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_x_").toString
    // 25 rows at 7 rows/txn → 4 transactions (7+7+7+4) in ONE file:
    // 4 GTIDs, 4 BEGINs, 4 XIDs, events never spanning a txn boundary
    val rows = (0 until 25).map(i => (1, i.toLong, s"t$i"))
    BinlogSink.writeChanges(rows.toDF("op", "k", "v").coalesce(1), dir,
      rowsPerEvent = 3, rowsPerTxn = 7)
    val ev = spark.read.format("binlog").load(dir)
      .select("event_type", "event_index", "row_images", "gtid_next")
      .collect()
    assert(ev.count(_.getString(0) == "XID") == 4)
    assert(ev.count(_.getString(0) == "Gtid") == 4)
    assert(ev.count(r => r.getString(0) == "Query") == 4) // BEGINs
    // the GTID gnos are distinct (one per transaction)
    assert(ev.filter(_.getString(0) == "Gtid")
      .map(_.getString(3)).distinct.length == 4)
    // row batches between consecutive XIDs sum to the txn sizes
    val back = ev.filter(_.getString(0) == "WriteRowsEventV2")
      .flatMap(_.getSeq[scala.collection.Seq[String]](2))
      .map(img => (img(0).toLong, img(1))).toSet
    assert(back == rows.map(r => (r._2, r._3)).toSet)
    // no WRITE_ROWS event crosses an XID with more rows than the txn cap
    val ordered = ev.sortBy(_.getLong(1))
    var inTxn = 0
    ordered.foreach { r =>
      r.getString(0) match {
        case "WriteRowsEventV2" =>
          inTxn += r.getSeq[scala.collection.Seq[String]](2).size
          assert(inTxn <= 7, s"transaction carried $inTxn rows (cap 7)")
        case "XID" => inTxn = 0
        case _ => ()
      }
    }
  }

  test("table/tableId/fileSeqStart: two tables staged separately merge into one ordered feed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_2t_").toString
    val feed = new java.io.File(dir, "feed"); feed.mkdirs()
    val stA = new java.io.File(dir, "a").getPath
    val stB = new java.io.File(dir, "b").getPath
    BinlogSink.writeChanges(
      (0 until 10).map(i => (1, i.toLong, s"a$i")).toDF("op", "k", "v")
        .coalesce(1), stA, table = "ta", tableId = 21L)
    BinlogSink.writeChanges(
      (0 until 8).map(i => (1, i.toLong, i * 10L)).toDF("op", "k", "x")
        .coalesce(1), stB, table = "tb", tableId = 22L, fileSeqStart = 101)
    Seq(stA, stB).foreach { st =>
      new java.io.File(st).listFiles().filterNot(_.getName.startsWith("."))
        .foreach(f => assert(f.renameTo(new java.io.File(feed, f.getName))))
    }
    val names = feed.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(names sameElements Array("mysql-bin.000001", "mysql-bin.000101"),
      names.mkString(","))
    val rows = spark.read.format("binlog").load(feed.getPath)
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(col("table"), explode(col("row_images")).as("img"))
      .select(col("table"), element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
      .as[(String, Long, String)].collect()
    assert(rows.filter(_._1 == "ta").map(r => (r._2, r._3)).toSet ==
      (0 until 10).map(i => (i.toLong, s"a$i")).toSet)
    assert(rows.filter(_._1 == "tb").map(r => (r._2, r._3.toLong)).toSet ==
      (0 until 8).map(i => (i.toLong, i * 10L)).toSet)
  }

  test("empty input writes no files; decoder sees an empty directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_e_").toString
    val df = Seq.empty[(Long, String)].toDF("k", "v").repartition(3)
    BinlogSink.writeKeyedStrings(df, dir)
    assert(new java.io.File(dir).listFiles().isEmpty)
  }

  test("over-long payload fails the encoder loudly, not by truncation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binlog_sink_l_").toString
    val df = Seq((1L, "x" * 40)).toDF("k", "v")
    val e = intercept[org.apache.spark.SparkException] {
      BinlogSink.writeKeyedStrings(df, dir, maxLen = 20)
    }
    assert(e.getMessage != null)
    // commit protocol: the failed attempt wrote only a hidden temp file
    // and deleted it — no truncated file may survive under a final name
    val left = new java.io.File(dir).listFiles()
      .map(_.getName).filterNot(_.startsWith("."))
    assert(left.isEmpty, s"failed write left visible files: ${left.mkString(",")}")
  }
}
