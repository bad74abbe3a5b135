package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The IVM state discipline at the unit level (cdc45/47/48/49 gate it
  * end-to-end against oracles; this pins the write semantics alone). */
class ViewMaintenanceSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vm_$tag").toString + "/state"

  test("applyIdempotent: a redelivered batch replaces, never double-counts") {
    import spark.implicits._
    val state = tmp("idem")
    val b0 = Seq(("a", 10L), ("b", 5L)).toDF("k", "v")
    val b1 = Seq(("a", 7L)).toDF("k", "v")
    ViewMaintenance.applyIdempotent(b0, state, 0L)
    ViewMaintenance.applyIdempotent(b1, state, 1L)
    ViewMaintenance.applyIdempotent(b0, state, 0L) // the redelivery
    val out = ViewMaintenance.readState(spark, state,
        "k STRING, v BIGINT, batch_id BIGINT")
      .groupBy("k").agg(sum("v").as("v"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 17L, "b" -> 5L))
  }

  test("appendBatch: plain at-least-once append accumulates") {
    import spark.implicits._
    val state = tmp("app")
    ViewMaintenance.appendBatch(Seq(("a", 1L)).toDF("k", "v"), state)
    ViewMaintenance.appendBatch(Seq(("a", 2L)).toDF("k", "v"), state)
    val out = ViewMaintenance.readState(spark, state, "k STRING, v BIGINT")
      .groupBy("k").agg(sum("v").as("v")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L))
  }

  test("readState: a never-written state is an empty view, not an error") {
    val state = tmp("empty")
    val df = ViewMaintenance.readState(spark, state, "k STRING, v BIGINT")
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("k", "v"))
  }

  test("explicit file: URI routes through the Hadoop FileSystem API") {
    import spark.implicits._
    // scheme-qualified, as an HDFS/S3 state dir would be — the pre-create
    // and the idempotent write must resolve the SAME filesystem
    val state = "file://" + tmp("uri")
    assert(ViewMaintenance.readState(spark, state, "k STRING, v BIGINT")
      .count() == 0) // pre-creates via Hadoop FS, no java.io
    ViewMaintenance.applyIdempotent(Seq(("a", 4L)).toDF("k", "v"), state, 0L)
    val out = ViewMaintenance.readState(spark, state,
        "k STRING, v BIGINT, batch_id BIGINT")
      .select("k", "v").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 4L)))
  }
}
