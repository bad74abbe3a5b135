package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ingest.{BinlogBinaryWriter, BinlogOffsetIndex}

/** Intra-file splitting of huge binlog files via the transaction-aligned
  * offset index (BinlogOffsetIndex + the `splitIndex` scan option): a
  * single file decodes on MULTIPLE partitions with output identical to the
  * whole-file decode — same rows, same event_index sequence, same
  * checksum validation. */
class BinlogSplitSpec extends AnyFunSuite with SparkTestSession {

  /** One checksummed binlog file with `nTx` transactions
    * (GTID/BEGIN/TABLE_MAP/WRITE/XID each), ~row data sized so the file
    * spans many split boundaries at tiny splitBytes. */
  private def writeFixture(dir: java.io.File, name: String, nTx: Int): Unit = {
    import BinlogBinaryWriter._
    val cols = Seq(ColDef.longlong, ColDef.varchar(64))
    val sid = (1 to 16).map(_.toByte).toArray
    val f = new FileBuilder(checksums = true)
    val t0 = 1714564800L
    f.fde(t0)
    (0 until nTx).foreach { tx =>
      f.event(t0 + tx, 33, gtidBody(sid, tx + 1L))
      f.event(t0 + tx, 2, queryBody("app", "BEGIN"))
      f.event(t0 + tx, 19, tableMapBody(7, "app", "t", cols))
      val images = (0 until 20).map { r =>
        Seq(Some(encLongLong(tx * 100L + r)),
          Some(encVarchar(s"row-$tx-$r-" + "x" * 40, 64)))
      }
      f.event(t0 + tx, 30, rowsBody(7, cols.size, images))
      f.event(t0 + tx, 16, xidBody(9000L + tx))
    }
    Files.write(new java.io.File(dir, name).toPath, f.bytes)
  }

  test("offset index range-splits one file; split == unsplit output") {
    val dir = Files.createTempDirectory("binsplit").toFile
    writeFixture(dir, "mysql-bin.000001", nTx = 60)

    val index = new java.io.File(dir.getParentFile, dir.getName + ".idx").getPath
    val n = BinlogOffsetIndex.build(spark, dir.getPath, index, splitBytes = 8192)
    val file = new java.io.File(dir, "mysql-bin.000001").getPath
    val ranges = BinlogOffsetIndex.loadFile(
      spark.sparkContext.hadoopConfiguration, index, file)
    assert(n == ranges.size)
    assert(ranges.size > 3, s"expected several ranges, got ${ranges.size}")
    // ranges tile the file exactly and start at transaction boundaries
    assert(ranges.head.start == 0)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a.end == b.start) }
    assert(ranges.last.end == ranges.last.fileLen)

    val whole = spark.read.format("binlog").load(dir.getPath)
    val split = spark.read.format("binlog")
      .option("splitIndex", index).load(dir.getPath)

    assert(whole.rdd.getNumPartitions == 1)
    assert(split.rdd.getNumPartitions == ranges.size)

    val cols = Seq("event_type", "timestamp", "log_position", "table", "schema",
      "query", "gtid_next", "xid", "binlog_file", "file_seq", "event_index")
    val w = whole.select(cols.map(col): _*).orderBy("event_index").collect()
    val s = split.select(cols.map(col): _*).orderBy("event_index").collect()
    assert(w.length == s.length && w.length == 60 * 5 + 1)
    assert(w.toSeq == s.toSeq)

    // row images survive the split identically too (checksum length was
    // seeded correctly — a wrong seed would shift every image boundary)
    val wImg = whole.filter(col("event_type") === "WriteRowsEventV2")
      .select(col("event_index"), col("row_images")).orderBy("event_index").collect()
    val sImg = split.filter(col("event_type") === "WriteRowsEventV2")
      .select(col("event_index"), col("row_images")).orderBy("event_index").collect()
    assert(wImg.toSeq == sImg.toSeq && wImg.length == 60)
  }

  test("split across TransactionPayload containers keeps event_index consistent") {
    import BinlogBinaryWriter._
    val dir = Files.createTempDirectory("binsplitp").toFile
    val cols = Seq(ColDef.longlong, ColDef.varchar(32))
    val sid = (1 to 16).map(_.toByte).toArray
    val f = new FileBuilder(checksums = true)
    val t0 = 1714564800L
    f.fde(t0)
    (0 until 30).foreach { tx =>
      f.event(t0 + tx, 33, gtidBody(sid, tx + 1L))
      if (tx % 2 == 0) {
        // whole transaction as a (zstd on even/4) payload container —
        // the index walk must count its INNER events or every later
        // range's event_index seed is off
        val inner = innerEventStream(Seq(
          (t0 + tx, 19, tableMapBody(7, "app", "t", cols)),
          (t0 + tx, 30, rowsBody(7, 2, (0 until 5).map(r =>
            Seq(Some(encLongLong(tx * 100L + r)),
              Some(encVarchar(s"p-$tx-$r-" + "y" * 16, 32)))))),
          (t0 + tx, 16, xidBody(7000L + tx))))
        f.event(t0 + tx, 40, transactionPayloadBody(inner, compress = tx % 4 == 0))
      } else {
        f.event(t0 + tx, 2, queryBody("app", "BEGIN"))
        f.event(t0 + tx, 19, tableMapBody(7, "app", "t", cols))
        f.event(t0 + tx, 30, rowsBody(7, 2, (0 until 5).map(r =>
          Seq(Some(encLongLong(tx * 100L + r)),
            Some(encVarchar(s"q-$tx-$r-" + "z" * 16, 32))))))
        f.event(t0 + tx, 16, xidBody(7000L + tx))
      }
    }
    Files.write(new java.io.File(dir, "mysql-bin.000001").toPath, f.bytes)

    val index = new java.io.File(dir.getParentFile, dir.getName + ".idx").getPath
    val nRanges = BinlogOffsetIndex.build(spark, dir.getPath, index, splitBytes = 2048)
    assert(nRanges > 2, s"expected several ranges, got $nRanges")

    val whole = spark.read.format("binlog").load(dir.getPath)
    val split = spark.read.format("binlog").option("splitIndex", index).load(dir.getPath)
    val cs = Seq("event_type", "event_index", "xid", "gtid_next", "row_images")
    val w = whole.select(cs.map(col): _*).orderBy("event_index").collect()
    val s = split.select(cs.map(col): _*).orderBy("event_index").collect()
    assert(w.length == s.length)
    assert(w.toSeq == s.toSeq)
  }

  test("splitIndexAutoBuild: first scan builds the index at planning") {
    val dir = Files.createTempDirectory("binsplit3").toFile
    writeFixture(dir, "mysql-bin.000001", nTx = 40)
    val index = new java.io.File(dir.getParentFile, dir.getName + ".idx").getPath
    assert(!new java.io.File(index).exists())

    val df = spark.read.format("binlog")
      .option("splitIndex", index)
      .option("splitIndexAutoBuild", "true")
      .option("splitBytes", "8192")
      .load(dir.getPath)
    assert(df.rdd.getNumPartitions > 2, "auto-built index did not range-split")
    assert(new java.io.File(index).exists(), "index file not written")
    assert(df.filter(col("event_type") === "XID").count() == 40)

    // second scan loads the existing index (same fan-out, no rebuild)
    val again = spark.read.format("binlog")
      .option("splitIndex", index).load(dir.getPath)
    assert(again.rdd.getNumPartitions == df.rdd.getNumPartitions)
  }

  test("duplicate basenames across directories: path-keyed per-file shards") {
    // two per-shard dirs both holding mysql-bin.000001 (different
    // content) under one glob — the ADVICE r6 hazard: a basename-keyed
    // index would apply one file's ranges to the other. Also pins shard
    // independence: corrupting one file's shard must not affect another
    // file's load (nothing reads sibling shards).
    val root = Files.createTempDirectory("binmulti").toFile
    val d1 = new java.io.File(root, "server1"); d1.mkdir()
    val d2 = new java.io.File(root, "server2"); d2.mkdir()
    writeFixture(d1, "mysql-bin.000001", nTx = 40)
    writeFixture(d2, "mysql-bin.000001", nTx = 12)
    val index = new java.io.File(root, "idx").getPath
    val glob = root.getPath + "/server*"
    BinlogOffsetIndex.build(spark, glob, index, splitBytes = 8192)

    val conf = spark.sparkContext.hadoopConfiguration
    val f1 = new java.io.File(d1, "mysql-bin.000001").getPath
    val f2 = new java.io.File(d2, "mysql-bin.000001").getPath
    val r1 = BinlogOffsetIndex.loadFile(conf, index, f1)
    val r2 = BinlogOffsetIndex.loadFile(conf, index, f2)
    assert(r1.nonEmpty && r2.nonEmpty)
    // ranges carry the qualified (scheme-prefixed) identity of THEIR file
    assert(r1.forall(_.path.endsWith(f1)) && r2.forall(_.path.endsWith(f2)))
    assert(r1.last.fileLen != r2.last.fileLen, "fixtures should differ in length")

    // per-file shard isolation: corrupt f2's shard, f1 is untouched and
    // f2 falls back to whole-file instead of failing the plan
    val shard2 = new java.io.File(index, BinlogOffsetIndex.shardName(conf, f2))
    assert(shard2.exists())
    Files.write(shard2.toPath, "garbage line, wrong shape".getBytes("UTF-8"))
    assert(BinlogOffsetIndex.loadFile(conf, index, f1) == r1)
    assert(BinlogOffsetIndex.loadFile(conf, index, f2).isEmpty)

    val df = spark.read.format("binlog").option("splitIndex", index).load(glob)
    assert(df.rdd.getNumPartitions == r1.size + 1,
      "f1 range-split + f2 whole-file fallback expected")
    assert(df.filter(col("event_type") === "XID").count() == 40 + 12)
  }

  test("stale index (file length mismatch) falls back to whole-file decode") {
    val dir = Files.createTempDirectory("binsplit2").toFile
    writeFixture(dir, "mysql-bin.000001", nTx = 10)
    val index = new java.io.File(dir.getParentFile, dir.getName + ".idx").getPath
    BinlogOffsetIndex.build(spark, dir.getPath, index, splitBytes = 4096)
    // "rotate" more data into the file after indexing
    writeFixture(dir, "mysql-bin.000001", nTx = 20)

    val df = spark.read.format("binlog").option("splitIndex", index).load(dir.getPath)
    assert(df.rdd.getNumPartitions == 1, "stale index must not range-split")
    assert(df.filter(col("event_type") === "XID").count() == 20)
  }
}
