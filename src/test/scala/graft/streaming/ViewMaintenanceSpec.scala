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

  test("compact: folds covered partitions into a base; live rule ignores a recreated covered batch") {
    import spark.implicits._
    val state = tmp("cmp")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, -1L) // seed
    ViewMaintenance.applyIdempotent(Seq(("a", 2L), ("b", 3L)).toDF("k", "v"), state, 0L)
    ViewMaintenance.applyIdempotent(Seq(("b", 4L)).toDF("k", "v"), state, 1L)
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(
      _.groupBy("k").agg(sum("v").as("v")))
    def folded = ViewMaintenance.readState(spark, state, schema)
      .groupBy("k").agg(sum("v").as("v")).as[(String, Long)].collect().toMap
    assert(folded == Map("a" -> 3L, "b" -> 7L))
    // covered partitions GC'd; exactly one base dir on disk
    val dirs = new java.io.File(state).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs == Seq("batch_id=-1000000000", "batch_id=1"), dirs)
    // a COVERED batch redelivered after compaction: partition reappears
    // on disk but the live rule must ignore it
    ViewMaintenance.applyIdempotent(Seq(("a", 2L), ("b", 3L)).toDF("k", "v"), state, 0L)
    assert(folded == Map("a" -> 3L, "b" -> 7L))
    // an IN-FLIGHT batch redelivered: partition overwrite absorbs it
    ViewMaintenance.applyIdempotent(Seq(("b", 4L)).toDF("k", "v"), state, 1L)
    assert(folded == Map("a" -> 3L, "b" -> 7L))
    // a SECOND compaction folds the previous base + newly covered batches
    ViewMaintenance.applyIdempotent(Seq(("c", 9L)).toDF("k", "v"), state, 2L)
    ViewMaintenance.compact(spark, state, schema, upto = 1L)(
      _.groupBy("k").agg(sum("v").as("v")))
    assert(folded == Map("a" -> 3L, "b" -> 7L, "c" -> 9L))
    val dirs2 = new java.io.File(state).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs2 == Seq("batch_id=-1000000001", "batch_id=2"), dirs2)
  }

  test("compact: refuses to shrink coverage, negative upto, and non-batch_id states") {
    import spark.implicits._
    val state = tmp("cmpreq")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, 0L)
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, 1L)
    ViewMaintenance.compact(spark, state, schema, upto = 1L)(df => df)
    intercept[IllegalArgumentException] {
      ViewMaintenance.compact(spark, state, schema, upto = 0L)(df => df)
    }
    intercept[IllegalArgumentException] {
      ViewMaintenance.compact(spark, state, schema, upto = -1L)(df => df)
    }
    intercept[IllegalArgumentException] {
      ViewMaintenance.compact(spark, state, "k STRING, v BIGINT", 0L)(df => df)
    }
  }

  test("maybeCompact: fires only past maxLive, keeps keepLast batches live, composes") {
    import spark.implicits._
    val state = tmp("pol")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("v").as("v"))
    def dirs = new java.io.File(state).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).sorted.toSeq
    (0 to 2).foreach { i =>
      ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, i.toLong)
    }
    // 3 live > maxLive=2 → compacts everything but the last 1 (upto = 1)
    assert(ViewMaintenance.maybeCompact(spark, state, schema,
      maxLive = 2, keepLast = 1)(fold))
    assert(dirs == Seq("batch_id=-1000000001", "batch_id=2"), dirs)
    // base + 1 live → declines
    assert(!ViewMaintenance.maybeCompact(spark, state, schema,
      maxLive = 2, keepLast = 1)(fold))
    // two more batches → 3 live again → recompacts on top of the base
    (3 to 4).foreach { i =>
      ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, i.toLong)
    }
    assert(ViewMaintenance.maybeCompact(spark, state, schema,
      maxLive = 2, keepLast = 1)(fold))
    assert(dirs == Seq("batch_id=-1000000003", "batch_id=4"), dirs)
    val out = ViewMaintenance.readState(spark, state, schema)
      .groupBy("k").agg(sum("v").as("v")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 5L))
  }

  test("readState's live rule is a PartitionFilter: covered dirs pruned at the scan") {
    import spark.implicits._
    // the 100-TB point of compaction is that a serve-time read never
    // SCANS covered partitions — the live rule must land in the scan's
    // PartitionFilters (metadata pruning), not in a post-scan Filter
    val state = tmp("prune")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, 0L)
    ViewMaintenance.applyIdempotent(Seq(("b", 2L)).toDF("k", "v"), state, 1L)
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(df => df)
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, 0L) // covered replay
    val df = ViewMaintenance.readState(spark, state, schema)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [((batch_id")
      || (p.contains("PartitionFilters: [") && p.contains("batch_id#")), p)
    assert(df.select("k", "v").as[(String, Long)].collect().toSet ==
      Set(("a", 1L), ("b", 2L)))
  }

  test("stateMetrics: one row per partition with real counts; bases carry coverage") {
    import spark.implicits._
    val state = tmp("met")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    ViewMaintenance.applyIdempotent(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), state, 0L)
    ViewMaintenance.applyIdempotent(Seq(("c", 3L)).toDF("k", "v"), state, 1L)
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(df => df)
    val m = ViewMaintenance.stateMetrics(spark, state, schema)
      .as[(Long, Boolean, Long, Long, Long, Long)].collect().toSeq
    assert(m.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((-1000000000L, true, 0L, 2L), (1L, false, -1L, 1L)))
    assert(m.forall(r => r._5 >= 1L && r._6 > 0L)) // n_files, bytes real
  }

  test("readStateAsOf: live marks, retained coverages, refusal inside a compacted region") {
    import spark.implicits._
    val state = tmp("asof")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("v").as("v"))
    (0 to 3).foreach { i => // batch i contributes 2^i
      ViewMaintenance.applyIdempotent(
        Seq(("a", 1L << i)).toDF("k", "v"), state, i.toLong)
    }
    def at(m: Long): Long = ViewMaintenance.readStateAsOf(spark, state, schema, m)
      .agg(sum("v")).head().getLong(0)
    assert(at(1L) == 3L) // pure delta chain: every mark readable
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(fold)
    ViewMaintenance.compact(spark, state, schema, upto = 2L, retainBases = 1)(fold)
    assert(at(0L) == 1L)  // retained base, exactly
    assert(at(2L) == 7L)  // current base alone
    assert(at(3L) == 15L) // base + live delta
    assert(at(99L) == 15L) // beyond the frontier = the frontier
    val e = intercept[IllegalArgumentException](at(1L))
    assert(e.getMessage.contains("compacted region") &&
      e.getMessage.contains("{0}"), e.getMessage)
    assert(ViewMaintenance.asOfHorizon(spark, state) == (Seq(0L, 2L), Seq(3L)))
    // a recreated COVERED partition (crash-after-commit redelivery) is
    // invisible to as-of reads by the same live rule readState uses
    ViewMaintenance.applyIdempotent(Seq(("a", 2L)).toDF("k", "v"), state, 1L)
    assert(at(3L) == 15L)
    // an appendBatch state has no batch marks: loud, not obscure
    val noMarks = intercept[IllegalArgumentException](
      ViewMaintenance.readStateAsOf(spark, state, "k STRING, v BIGINT", 0L))
    assert(noMarks.getMessage.contains("applyIdempotent"))
  }

  test("compact retainBases: bounded history — oldest retained mark ages out; readState unaffected") {
    import spark.implicits._
    val state = tmp("retain")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("v").as("v"))
    (0 to 3).foreach { i =>
      ViewMaintenance.applyIdempotent(
        Seq(("a", 1L << i)).toDF("k", "v"), state, i.toLong)
    }
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(fold)
    ViewMaintenance.compact(spark, state, schema, upto = 1L, retainBases = 1)(fold)
    // third compaction keeps only the NEWEST superseded base: coverage 1
    // survives, coverage 0 ages out of the bounded window
    ViewMaintenance.compact(spark, state, schema, upto = 2L, retainBases = 1)(fold)
    assert(ViewMaintenance.asOfHorizon(spark, state) == (Seq(1L, 2L), Seq(3L)))
    val gone = intercept[IllegalArgumentException](
      ViewMaintenance.readStateAsOf(spark, state, schema, 0L))
    assert(gone.getMessage.contains("compacted region"))
    // the serving read never sees retained history: newest base + live
    val out = ViewMaintenance.readState(spark, state, schema)
      .groupBy("k").agg(sum("v").as("v")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 15L))
  }

  test("readStateDiff: cheap path is delta-partitions-only; fallback negates across a compaction") {
    import spark.implicits._
    val state = tmp("diff")
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(sum("v").as("v"))
    def negate(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("v", -col("v"))
    (0 to 3).foreach { i => // batch i contributes 2^i
      ViewMaintenance.applyIdempotent(
        Seq(("a", 1L << i)).toDF("k", "v"), state, i.toLong)
    }
    ViewMaintenance.compact(spark, state, schema, upto = 0L)(fold)
    ViewMaintenance.compact(spark, state, schema, upto = 1L, retainBases = 1)(fold)
    def diff(from: Long, to: Long): Long =
      ViewMaintenance.readStateDiff(spark, state, schema, from, to)(negate)
        .agg(coalesce(sum("v"), lit(0L))).head().getLong(0)
    // cheap: from = coverage → ONLY the live partitions in (from, to]
    // ride the scan; neither base (current nor retained) is touched
    val cheap = ViewMaintenance.readStateDiff(spark, state, schema, 1L, 3L)(negate)
    assert(cheap.select("batch_id").as[Long].collect().toSet == Set(2L, 3L))
    assert(diff(1L, 3L) == 12L) // 4 + 8
    assert(diff(2L, 3L) == 8L)  // live-only within the live region
    assert(diff(3L, 3L) == 0L)  // empty span folds to zero
    // fallback: marks separated by the compaction — base(1) + negated
    // retained base(0) nets to batch 1's contribution
    assert(diff(0L, 1L) == 2L)
    assert(diff(0L, 3L) == 14L) // base(1) + live − base(0)
    // an unreadable `from` refuses via the as-of horizon contract
    ViewMaintenance.compact(spark, state, schema, upto = 2L)(fold)
    val e = intercept[IllegalArgumentException](diff(1L, 3L))
    assert(e.getMessage.contains("compacted region"))
    val order = intercept[IllegalArgumentException](diff(3L, 1L))
    assert(order.getMessage.contains("from <= to"))
  }

  test("publishMark: forward-only, idempotent, GC-bounded listing") {
    val group = tmp("pub")
    assert(ViewMaintenance.publishedMark(spark, group).isEmpty)
    ViewMaintenance.publishMark(spark, group, 0L)
    assert(ViewMaintenance.publishedMark(spark, group).contains(0L))
    ViewMaintenance.publishMark(spark, group, 2L)
    assert(ViewMaintenance.publishedMark(spark, group).contains(2L))
    // a redelivered batch re-publishing an OLDER mark cannot move the
    // max backwards, and re-publishing an existing mark is a no-op
    ViewMaintenance.publishMark(spark, group, 1L)
    ViewMaintenance.publishMark(spark, group, 2L)
    assert(ViewMaintenance.publishedMark(spark, group).contains(2L))
    // GC keeps the listing bounded: a newer publish removes older marks
    ViewMaintenance.publishMark(spark, group, 3L)
    val files = new java.io.File(group, "_published").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")) // .crc sidecars
      .map(_.getName).toSeq
    assert(files == Seq("3"), files)
  }

  test("readStateAtPublished: consistent group read at the published " +
      "mark; loud before the first publish") {
    import spark.implicits._
    val group = tmp("pubread")
    val state = new java.io.File(group, "tables/t1").getPath
    val schema = "k STRING, v BIGINT, batch_id BIGINT"
    ViewMaintenance.applyIdempotent(Seq(("a", 1L)).toDF("k", "v"), state, 0L)
    // before any publish: loud, not an empty view (the writer protocol
    // publishes AFTER every state's batch lands — no mark means no
    // consistent snapshot exists yet)
    val ex = intercept[IllegalArgumentException](
      ViewMaintenance.readStateAtPublished(spark, group, state, schema))
    assert(ex.getMessage.contains("no published mark"), s"got: $ex")
    ViewMaintenance.publishMark(spark, group, 0L)
    // batch 1 landed but is NOT yet published: the consistent read
    // serves mark 0 — mid-batch state is invisible (cdc76's point)
    ViewMaintenance.applyIdempotent(Seq(("a", 2L)).toDF("k", "v"), state, 1L)
    val v0 = ViewMaintenance.readStateAtPublished(spark, group, state, schema)
      .agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
    assert(v0 == 1L)
    ViewMaintenance.publishMark(spark, group, 1L)
    val v1 = ViewMaintenance.readStateAtPublished(spark, group, state, schema)
      .agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
    assert(v1 == 3L)
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
