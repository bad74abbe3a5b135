package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Schemas

/** File sources (SURVEY §2.1). Each returns a DataFrame with the declared
  * read schema so Catalyst prunes columns at the scan and pushes filters
  * down; malformed lines land in `_corrupt_record` (PERMISSIVE mode), the
  * Spark equivalent of the reference's warn-and-skip (compare_timestamps.go:
  * 113-116,171-174) with a quarantine side-channel instead of stderr (K3).
  */
object Sources {

  /** S6 — `binlog_metadata.json` JSON-lines scan with explicit schema.
    * Accepts globs / directories / multi-paths (the reference's per-file
    * append loop is a multi-path UNION ALL, SURVEY §2.7). */
  def binlogJson(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(Schemas.binlogReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** S7 — `avro_rows.json` (avro-tools `tojson` output, union-wrapped). */
  def avroJson(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(Schemas.avroWrappedReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** Split malformed rows out of a PERMISSIVE read: (clean, quarantine).
    * The quarantine side carries the raw line for K3-style diagnostics.
    *
    * Spark refuses queries whose only referenced column is the internal
    * corrupt-record column (SPARK-21610), so the parsed frame is cached and
    * both sides read from it — one scan, both outputs.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val bad = cached.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    val good = cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    (good, bad)
  }

  /** S5/E15 — enrich a file-sourced DataFrame with the binlog natural order:
    * `file_seq` from the numeric filename suffix (`ls -v` order,
    * comparator.sh:85) and `binlog_file` basename (E14). */
  def withBinlogFileOrder(df: DataFrame): DataFrame = {
    val base = graft.cdc.Normalize.basename(input_file_name())
    df.withColumn("binlog_file_from_path", base)
      .withColumn("file_seq", graft.cdc.Normalize.fileSeq(base))
  }
}
