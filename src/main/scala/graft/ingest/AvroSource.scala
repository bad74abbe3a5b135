package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S3 — native Avro container-file source (SURVEY §7.4).
  *
  * The reference shells out to `avro-tools tojson` once per file
  * (avro_to_json.sh:52-70); here the container files are read in place with
  * `AvroKeyInputFormat` (splittable by Avro block, so large files fan out
  * across tasks) and `["null", T]` unions resolve directly to nullable `T` —
  * no union-wrapper structs, no per-file JVM forks, no JSON intermediate.
  *
  * The environment has `avro-1.12.1` + `avro-mapred-1.12.1` but no
  * `spark-avro` connector, hence the hadoop-input-format route.
  */
object AvroSource {

  /** Read `.avro` container files (a concrete path, directory, or glob) into
    * a DataFrame. The reader schema is taken from the first file's header on
    * the driver (one cheap metadata read) and set as
    * `avro.schema.input.key`, so `AvroKeyInputFormat` performs real Avro
    * schema resolution per file: a file written with a compatibly-evolved
    * schema resolves by field name/default, and an incompatible writer
    * schema (missing field, no default) fails the task loudly instead of
    * silently null-filling (ADVICE r01).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = readSchema(spark, path)
    val sparkSchema = toStructType(avroSchema)
    val schemaJson = avroSchema.toString // Schema isn't serializable-friendly; ship JSON
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    org.apache.avro.mapreduce.AvroJob.setInputKeySchema(job, avroSchema)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val structType = toStructType(schema)
        it.map { case (k, _) => toRow(k.datum(), schema, structType) }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Resolve the writer schema from the first matching file's header. */
  def readSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val first =
      if (fs.isFile(p)) p
      else {
        // globStatus returns null (not empty) for a non-glob missing path
        val files = Option(fs.globStatus(new Path(
            if (path.endsWith(".avro")) path else path.stripSuffix("/") + "/*.avro")))
          .getOrElse(Array.empty)
          .filter(_.isFile).map(_.getPath)
        require(files.nonEmpty, s"no .avro files under $path")
        files.minBy(_.getName)
      }
    val reader = new DataFileReader[GenericRecord](
      new FsInput(first, conf),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try reader.getSchema
    finally reader.close()
  }

  /** Avro schema → Spark StructType. `["null", T]` unions become nullable
    * `T`; logical types timestamp-millis/micros map to TimestampType. */
  def toStructType(schema: Schema): StructType = {
    toDataType(schema) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"top-level Avro schema must be a record, got $other")
    }
  }

  private def toDataType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), toDataType(f.schema()), nullable = isNullable(f.schema()))
      })
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only ['null', T] unions supported, got ${schema.getTypes}")
      toDataType(branches.head)
    case Schema.Type.ARRAY =>
      ArrayType(toDataType(schema.getElementType),
        containsNull = isNullable(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toDataType(schema.getValueType),
        valueContainsNull = isNullable(schema.getValueType))
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case l if l != null && l.getName == "date" => DateType
        case _ => IntegerType
      }
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case l if l != null && (l.getName == "timestamp-millis" || l.getName == "timestamp-micros") =>
          TimestampType
        case _ => LongType
      }
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** GenericRecord → Row against the derived StructType. */
  private def toRow(rec: GenericRecord, schema: Schema, structType: StructType): Row = {
    val values = schema.getFields.asScala.toSeq.map { f =>
      convert(rec.get(f.name()), nonNull(f.schema()))
    }
    Row.fromSeq(values)
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def convert(v: Any, s: Schema): Any = v match {
    case null => null
    case r: GenericRecord =>
      Row.fromSeq(s.getFields.asScala.toSeq.map(f => convert(r.get(f.name()), nonNull(f.schema()))))
    case u: org.apache.avro.util.Utf8 => u.toString
    case l: java.lang.Long =>
      s.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" =>
          java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(l))
        case lt if lt != null && lt.getName == "timestamp-micros" =>
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L))
        case _ => l
      }
    case i: java.lang.Integer =>
      s.getLogicalType match {
        case lt if lt != null && lt.getName == "date" =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
        case _ => i
      }
    case a: java.util.Collection[_] =>
      a.asScala.toSeq.map(convert(_, nonNull(s.getElementType)))
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> convert(vv, nonNull(s.getValueType)) }.toMap
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      decimalOr(s, arr, arr)
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case f: org.apache.avro.generic.GenericFixed =>
      val arr = f.bytes().clone()
      decimalOr(s, arr, arr)
    case other => other
  }

  /** Decimal logical type: big-endian unscaled bytes + schema scale →
    * BigDecimal; otherwise the raw bytes. */
  private def decimalOr(s: Schema, bytes: Array[Byte], orElse: Any): Any =
    s.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal =>
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
      case _ => orElse
    }
}
