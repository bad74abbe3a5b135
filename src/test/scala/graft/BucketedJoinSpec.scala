package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing as the shuffle-elimination strategy for repeated co-located
  * joins (the 100 TB answer to "this join shuffles every run"): two tables
  * bucketed on the join key join with ZERO exchanges in the physical plan.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestSession {

  test("join of co-bucketed tables plans without a shuffle") {
    val base = Files.createTempDirectory("buckets").toFile.getPath
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_b1")
    spark.sql("DROP TABLE IF EXISTS graft_b2")
    (1L to 1000L).map(k => (k, k * 2.0)).toDF("k", "v")
      .write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/b1").saveAsTable("graft_b1")
    (1L to 1000L).map(k => (k, s"name-$k")).toDF("k", "name")
      .write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/b2").saveAsTable("graft_b2")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so the bucket layout is what avoids the
      // shuffle; AQE off so the compiled plan is the executed plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_b1").join(spark.table("graft_b2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }
}
