package graft.ingest

import java.io.File
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Native Avro container read (SURVEY §7.4): ["null", T] unions resolve to
  * nullable columns, nested records flatten to struct columns, logical
  * timestamp types map to TimestampType — no avro-tools fork, no JSON
  * intermediate.
  */
class AvroSourceSpec extends AnyFunSuite with SparkTestSession {

  private def writeFixture(dir: File): Schema = {
    val schema = SchemaBuilder.record("ChangeRecord").fields()
      .requiredLong("source_timestamp")
      .name("source_metadata").`type`(
        SchemaBuilder.record("SourceMetadata").fields()
          .requiredString("table")
          .name("binlog_file").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
          .name("binlog_position").`type`().unionOf().nullType().and().longType().endUnion().nullDefault()
          .name("is_deleted").`type`().unionOf().nullType().and().booleanType().endUnion().nullDefault()
          .endRecord())
      .noDefault()
      .name("primary_keys").`type`().array().items().stringType().noDefault()
      .name("commit_ts").`type`(
        org.apache.avro.LogicalTypes.timestampMillis()
          .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .endRecord()

    val metaSchema = schema.getField("source_metadata").schema()
    def rec(ts: Long, table: String, file: String, pos: java.lang.Long): GenericRecord = {
      val meta = new GenericData.Record(metaSchema)
      meta.put("table", table)
      meta.put("binlog_file", file)
      meta.put("binlog_position", pos)
      meta.put("is_deleted", null)
      val r = new GenericData.Record(schema)
      r.put("source_timestamp", ts)
      r.put("source_metadata", meta)
      r.put("primary_keys", java.util.List.of("id"))
      r.put("commit_ts", ts)
      r
    }

    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, new File(dir, "part1.avro"))
    writer.append(rec(1714564800000L, "orders", "mysql-bin.000001", 1573L))
    writer.append(rec(1714564801000L, "orders", "mysql-bin.000001", null))
    writer.close()
    schema
  }

  test("reads containers with resolved unions, nested structs, logical types") {
    val dir = Files.createTempDirectory("avrosrc").toFile
    writeFixture(dir)
    val df = AvroSource.read(spark, dir.getPath)

    val schema = df.schema
    assert(schema("source_timestamp").dataType.typeName == "long")
    val meta = schema("source_metadata").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta("binlog_file").dataType.typeName == "string" && meta("binlog_file").nullable)
    assert(schema("commit_ts").dataType.typeName == "timestamp")

    val rows = df.orderBy("source_timestamp").collect()
    assert(rows.length == 2)
    val m0 = rows(0).getStruct(rows(0).fieldIndex("source_metadata"))
    assert(m0.getString(m0.fieldIndex("table")) == "orders")
    assert(m0.getLong(m0.fieldIndex("binlog_position")) == 1573L)
    val m1 = rows(1).getStruct(rows(1).fieldIndex("source_metadata"))
    assert(m1.isNullAt(m1.fieldIndex("binlog_position")))
    assert(rows(0).getSeq[String](rows(0).fieldIndex("primary_keys")) == Seq("id"))
    assert(rows(0).getTimestamp(rows(0).fieldIndex("commit_ts")).getTime == 1714564800000L)
  }

  private def writeOne(dir: File, name: String, schema: Schema,
      put: GenericRecord => Unit): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir, name))
    val r = new GenericData.Record(schema)
    put(r)
    w.append(r)
    w.close()
  }

  test("evolved writer schema resolves via reader defaults, not silent nulls") {
    val dir = Files.createTempDirectory("avroevolve").toFile
    val full = SchemaBuilder.record("R").fields()
      .requiredLong("a")
      .name("b").`type`().stringType().stringDefault("dflt")
      .endRecord()
    val old = SchemaBuilder.record("R").fields().requiredLong("a").endRecord()
    // part1 (lexicographically first) supplies the reader schema
    writeOne(dir, "part1.avro", full, r => { r.put("a", 1L); r.put("b", "real") })
    writeOne(dir, "part2.avro", old, r => r.put("a", 2L))

    val rows = AvroSource.read(spark, dir.getPath).orderBy("a").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("real", "dflt"))
  }

  test("incompatible writer schema fails loudly") {
    val dir = Files.createTempDirectory("avrobad").toFile
    val full = SchemaBuilder.record("R").fields()
      .requiredLong("a").requiredString("b") // no default for b
      .endRecord()
    val old = SchemaBuilder.record("R").fields().requiredLong("a").endRecord()
    writeOne(dir, "part1.avro", full, r => { r.put("a", 1L); r.put("b", "x") })
    writeOne(dir, "part2.avro", old, r => r.put("a", 2L))
    val e = intercept[org.apache.spark.SparkException] {
      AvroSource.read(spark, dir.getPath).collect()
    }
    assert(e.getMessage != null)
  }

  test("AvroSink round-trips through AvroSource (write then read back)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("avroroundtrip").toFile
    val out = new File(dir, "out").getPath
    val df = Seq(
      (1L, "a", Some(10), Seq("x", "y"), Map("k" -> 1L),
        new java.sql.Timestamp(1714564800123L)),
      (2L, "b", None, Seq.empty[String], Map.empty[String, Long],
        new java.sql.Timestamp(1714564800456L))
    ).toDF("id", "name", "opt", "tags", "props", "ts")
    AvroSink.write(df.repartition(2), out)

    val back = AvroSource.read(spark, out)
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a")
    assert(rows(0).getInt(rows(0).fieldIndex("opt")) == 10)
    assert(rows(1).isNullAt(rows(1).fieldIndex("opt")))
    assert(rows(0).getSeq[String](rows(0).fieldIndex("tags")) == Seq("x", "y"))
    assert(rows(0).getMap[String, Long](rows(0).fieldIndex("props")) == Map("k" -> 1L))
    assert(rows(0).getTimestamp(rows(0).fieldIndex("ts")).getTime == 1714564800123L)
  }

  test("decimal and date logical types round-trip through sink and source") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("avrodec").toFile.getPath + "/out"
    val df = Seq(
      (1L, "123456.78", "2024-05-01"),
      (2L, "-0.01", "1969-12-31"),       // negative decimal, pre-epoch date
      (3L, null, null),                  // nullable logical-typed columns
    ).toDF("id", "dec_str", "date_str")
      .select(col("id"),
        col("dec_str").cast("decimal(12,2)").as("amount"),
        col("date_str").cast("date").as("day"))
    AvroSink.write(df.repartition(1), dir)

    // the writer schema carries the logical types
    val schema = AvroSource.readSchema(spark, dir)
    val amountS = schema.getField("amount").schema().getTypes.get(1)
    assert(amountS.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Decimal])
    assert(schema.getField("day").schema().getTypes.get(1)
      .getLogicalType.getName == "date")

    val back = AvroSource.read(spark, dir)
    assert(back.schema("amount").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(back.schema("day").dataType == org.apache.spark.sql.types.DateType)
    val got = back.orderBy("id")
      .select(col("id"), col("amount").cast("string"), col("day").cast("string"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "123456.78", "2024-05-01"),
      (2L, "-0.01", "1969-12-31"),
      (3L, null, null)))
  }

  test("flattened records flow into the comparator avro contract") {
    val dir = Files.createTempDirectory("avrosrc2").toFile
    writeFixture(dir)
    val df = AvroSource.read(spark, dir.getPath)
    // resolved (union-free) shape → the same flatten the engine applies
    val flat = df.selectExpr(
      "source_timestamp",
      "source_metadata.table AS table",
      "source_metadata.binlog_file AS binlog_file",
      "source_metadata.binlog_position AS binlog_position")
    val prepared = graft.cdc.Comparator.prepareAvro(
      flat.withColumn("database", org.apache.spark.sql.functions.lit(""))
        .withColumn("gtid", org.apache.spark.sql.functions.lit(""))
        .withColumn("change_type", org.apache.spark.sql.functions.lit("")))
    assert(prepared.count() == 1) // the null-position row is P5-filtered
  }
}
