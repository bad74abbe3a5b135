package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout pruning: a dataset written partitioned by a filter
  * column is read with PartitionFilters (directory-level skipping), the
  * at-scale answer to "this scan reads everything for a one-key query".
  */
class PartitionPruningSpec extends AnyFunSuite with SparkTestSession {

  test("partitioned write + filtered read prunes at the directory level") {
    val base = Files.createTempDirectory("partlayout").toFile.getPath
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").partitionBy("event_type").parquet(base)

    val clicks = spark.read.parquet(base).filter(col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = events.filter(col("event_type") === "click").count()
    assert(clicks.count() == expected)
  }
}
