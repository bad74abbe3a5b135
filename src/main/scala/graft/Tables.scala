package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md). One parquet per
  * table; explicit handling for the `events` table whose `ts` column is
  * INT64 TIMESTAMP(NANOS) — Spark's parquet reader rejects nanos unless
  * `spark.sql.legacy.parquet.nanosAsLong` is on, in which case `ts` arrives
  * as a Long of epoch nanoseconds (the precision-preserving choice; DuckDB
  * reads the same column via `epoch_ns`).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` as epoch-nanos Long (see object doc).
    *
    * The generated parquet has shipped `ts` as both INT64 TIMESTAMP(NANOS)
    * (reads as epoch-nanos Long under `nanosAsLong`) and TIMESTAMP(MICROS)
    * (reads as TIMESTAMP_NTZ). Every consumer — and every DuckDB oracle,
    * via `epoch_ns(ts)` — is written against the epoch-nanos-Long contract,
    * so normalize both layouts to it here. The NTZ wall-clock is epoch UTC
    * (writer is tz-naive; session tz pinned to UTC), so the
    * cast-to-timestamp → `unix_micros` → ×1000 route is exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** Exact integer cents from a 2-decimal-valued double column. The testdata
    * generators emit money columns rounded to 2 decimals, so
    * `round(x*100)` recovers the exact integer in both Spark and DuckDB —
    * downstream arithmetic in longs is then bit-identical across engines
    * (no float summation order, no decimal-width divergence). */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}
