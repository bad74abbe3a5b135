package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ingest.{AvroSink, BinlogBinaryParser}

/** The SQL-DDL/catalog route over the DSv2 connectors: a cluster user
  * should be able to say `CREATE TABLE ... USING binlog OPTIONS(...)` (or
  * `USING avrofile`) and query the catalog table from pure SQL — the same
  * provider resolution thrift/JDBC clients get — with results identical
  * to the `spark.read.format(...)` route. */
class CatalogDdlSpec extends AnyFunSuite with SparkTestSession {

  private def writeBinlog(dir: java.io.File, name: String, nEvents: Int,
      t0: Long): Unit = {
    val out = new ByteArrayOutputStream()
    out.write(BinlogBinaryParser.Magic)
    var logPos = 4L
    (0 until nEvents).foreach { i =>
      val body = new Array[Byte](8) // XID body
      val size = 19 + body.length
      logPos += size
      val h = ByteBuffer.allocate(19).order(ByteOrder.LITTLE_ENDIAN)
      h.putInt((t0 + i).toInt).put(16.toByte).putInt(1).putInt(size)
        .putInt(logPos.toInt).putShort(0.toShort)
      out.write(h.array()); out.write(body)
    }
    Files.write(new java.io.File(dir, name).toPath, out.toByteArray)
  }

  test("CREATE TABLE ... USING binlog: catalog route equals format route") {
    val dir = Files.createTempDirectory("ddlbin").toFile
    writeBinlog(dir, "mysql-bin.000001", 3, 1714564800L)
    writeBinlog(dir, "mysql-bin.000002", 2, 1714564900L)

    spark.sql("DROP TABLE IF EXISTS binlog_ddl")
    spark.sql(
      s"CREATE TABLE binlog_ddl USING binlog OPTIONS (path '${dir.getPath}')")
    try {
      val viaCatalog = spark.table("binlog_ddl")
        .select("binlog_file", "file_seq", "event_index", "event_type",
          "log_position")
        .collect().toSet
      val viaFormat = spark.read.format("binlog").load(dir.getPath)
        .select("binlog_file", "file_seq", "event_index", "event_type",
          "log_position")
        .collect().toSet
      assert(viaCatalog == viaFormat && viaCatalog.size == 5)

      // pure-SQL access with a file-pruning predicate through the catalog
      val tail = spark.sql(
        "SELECT count(*) FROM binlog_ddl WHERE file_seq >= 2").collect().head.getLong(0)
      assert(tail == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS binlog_ddl")
  }

  test("CREATE TABLE ... USING avrofile: catalog route equals format route") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("ddlavro").toFile.getPath + "/out"
    AvroSink.write(
      (1 to 100).map(i => (i.toLong, s"payload_$i")).toDF("id", "s").repartition(1),
      dir)

    spark.sql("DROP TABLE IF EXISTS avro_ddl")
    spark.sql(s"CREATE TABLE avro_ddl USING avrofile OPTIONS (path '$dir')")
    try {
      val viaCatalog = spark.table("avro_ddl").collect().toSet
      val viaFormat = spark.read.format("avrofile").load(dir).collect().toSet
      assert(viaCatalog == viaFormat && viaCatalog.size == 100)
      assert(spark.sql("SELECT sum(id) FROM avro_ddl").as[Long].head()
        == 100L * 101 / 2)
    } finally spark.sql("DROP TABLE IF EXISTS avro_ddl")
  }
}
