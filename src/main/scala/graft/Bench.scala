package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (a bare `count()` would let Catalyst prune most of the work), and
  * prints one JSON line with per-query and total wall seconds.
  *
  * CRASH-DURABLE + DEADLINE-AWARE (r15: the driver's official run hit its
  * wall-clock limit mid-suite — rc 124 — and the end-of-run-only artifact
  * write lost every number):
  *
  *   - the FULL artifact (per-query best-so-far mins + per-pass samples +
  *     `passes_completed`) is rewritten after the warmup and after EVERY
  *     pass, and a short summary line prints per pass — a kill at any
  *     point leaves both a parseable file and a parseable stdout tail;
  *   - a deadline budget (`SPARK_GRAFT_BENCH_DEADLINE_S`, default 3000 s
  *     of bench wall time) degrades the pass count 3→2→1: a pass after
  *     the first starts only if the previous pass's duration fits the
  *     remaining budget, and stops mid-pass at the hard reserve — pass 1
  *     always runs to completion so every query gets at least one timed
  *     sample;
  *   - the sf0.01 warmup (codegen JIT priming) skips the drain-shaped
  *     streaming gates: their cost is micro-batch fixed overhead, not
  *     codegen, so warming them buys nothing and costs nearly a full
  *     extra pass; min-of-3 absorbs their pass-1 JIT instead.
  */
object Bench {

  /** Drain-shaped gates — queries whose runtime is dominated by streaming
    * micro-batch fixed overhead (per-file `maxFilesPerTrigger` drains,
    * state-store commits, checkpoint I/O) rather than per-row compute.
    * Advisory, WARMUP-SKIP ONLY: a misclassification never affects the
    * timing methodology or results — an unlisted streaming gate merely
    * gets a useless warmup run, a listed compute gate pays its codegen
    * JIT in pass 1 and min-of-3 absorbs it. Derived from the call graph
    * (gates reaching Drains/readStream/ViewMaintenance transitively);
    * new gates default to being warmed, which is the safe side. */
  private val drainGates: Set[String] = Set(
    "cdc12_stream_drain", "cdc13_stream_binlog", "cdc14_stream_dedup",
    "cdc15_stream_windows", "cdc16_stream_parity", "cdc18_restart_parity",
    "cdc19_schema_evolution", "cdc34_stream_sessions", "cdc38_gtid_coverage",
    "cdc39_stream_route", "cdc40_rotate_chain", "cdc41_stream_ddl_epoch",
    "cdc42_stream_scd2", "cdc44_multi_watermark", "cdc45_stream_ivm",
    "cdc47_stream_retract", "cdc48_idempotent_sink", "cdc49_stream_sketch",
    "cdc50_stream_band", "cdc51_compacted_ivm", "cdc52_stream_stream_band",
    "cdc53_restart_ivm", "cdc55_wire_evolution", "cdc57_multi_table_demux",
    "cdc58_tail_active", "cdc59_compact_restart", "cdc60_snapshot_cutover",
    "cdc61_demux_lifecycle", "cdc62_sketch_compaction", "cdc63_tail_demux",
    "cdc64_tail_rotate", "cdc65_tail_cutover", "cdc66_gtid_failover",
    "cdc67_tail_lag", "cdc68_checkpoint_upgrade", "cdc69_sharded_union",
    "cdc70_gtid_durable", "cdc71_tail_purge", "cdc72_purge_sharded_union",
    "cdc73_gtid_set_cutover", "cdc74_gtid_sharded_failover",
    "cdc75_time_travel", "cdc76_consistent_demux", "cdc77_release_diff",
    "d20_incremental_dedup", "d32_stream_lsh_ingest",
    "d33_stream_decontaminate", "g16_stream_degree_retract",
    "g17_restart_degree", "m10_stream_manifest", "m11_stream_media_dedup",
    "m12_compacted_media_dedup", "m13_restart_media_dedup",
    "p14_stream_quota_admission", "p15_state_metrics", "p16_state_evolution",
    "s12_ann_ivfpq_persisted", "s36_graph_persisted",
    "s42_stream_index_ingest", "s43_stream_search",
    "s51_stream_graph_maintain", "s52_stream_graph_delete",
    "s53_graph_repair", "s54_wire_vector_ingest", "s55_lifecycle_serve",
    "s56_sharded_wire_vectors", "s57_serve_through_retention",
    "s58_pinned_index", "t30_stream_quality")

  def main(args: Array[String]): Unit = {
    val benchStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // total bench wall budget: passes after the first are skipped or cut
    // short so the run always ENDS (and writes + prints) inside it; sized
    // under the driver's observed ~1h window with margin for JVM startup
    val deadlineS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "3000").toDouble
    // hard reserve kept for the end-of-run calibration + artifact write
    val reserveS = 45.0
    // dev-only subset (comma-separated name prefixes) — e.g. the top-10
    // under a constrained heap for the spill-safety demonstration; the
    // driver never sets it, so the official artifact is always the full set
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // SQL function surface
      .config("spark.sql.shuffle.partitions", cpus)
      // Small-file scan parallelism: the sf0.1 parquet tables are one or
      // two row groups, so compute-heavy SCAN stages (shingle hashing,
      // cosine, simhash) would otherwise run on ≤2 of the 32 cores.
      // minPartitionNum splits the scan to the core count — the local
      // analogue of sizing maxPartitionBytes to the cluster; at real
      // scale file volume provides this parallelism on its own.
      .config("spark.sql.files.minPartitionNum", cpus)
      // Evaluated and NOT adopted (r9): lowering the AQE coalesce floor
      // (spark.sql.adaptive.coalescePartitions.minPartitionSize=64KB) to
      // spread p01's 2-task shingle stages looked like a win in isolated
      // consecutive runs (2.2 s → 1.4 s) but in the full bench context it
      // left p01 flat (~2.24 s — the residual is driver-side codegen
      // re-JIT + 10 sequential AQE job barriers, not task skew) while
      // slowing the whole d-family 1.2–1.46× (finer partitions = more
      // task overhead on already-fast queries). docs/PLANS.md has the
      // stage-level attribution.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1)

    // Locale.ROOT: the default-locale `f` interpolator would emit comma
    // decimal separators (invalid JSON) on comma-decimal locales
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

    // Warmup pass: run the COMPUTE queries once at a small SF first, so
    // each plan's janino codegen is compiled and the JIT is hot before any
    // timing starts — r2/r3 showed one-off codegen/GC stalls landing on
    // random queries and swinging the one-shot total by ±20%. Drain-shaped
    // gates are skipped (see [[drainGates]]); the warmup also stops early
    // if it ever eats into the pass budget (deadline × 0.35), counting
    // what it skipped — an unwarmed compute gate just pays its JIT in
    // pass 1 and min-of-3 recovers.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    var warmed = 0
    var warmupTruncated = false
    ordered.foreach { case (name, fn) =>
      if (!drainGates.contains(name)) {
        if (elapsedS > deadlineS * 0.35) warmupTruncated = true
        else {
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          warmed += 1
        }
      }
    }
    val warmupJson = s"""{"warmed":$warmed,"drain_skipped":${
      ordered.count(q => drainGates.contains(q._1))},"truncated":$warmupTruncated}"""

    // CALIBRATION PROBE (r14 verdict task: the VM differs between rounds,
    // and a uniform environment shift across an artifact-to-artifact
    // comparison manufactured 111 false "movers" in r14). A fixed set of
    // byte-stable pure-compute queries is timed warm min-of-3 at the
    // START and END of the bench; the judge normalizes cross-round
    // ratios by the calibration delta before adjudicating movers, and
    // start-vs-end disagreement flags a mid-bench load shift from the
    // artifact alone.
    val calibrationSet = Seq("q16_scalar_exprs", "t01_token_stats",
      "s01_ann_bruteforce").filter(SparkEntry.queries.contains)
    def calibrate(): Map[String, Double] = calibrationSet.map { name =>
      val fn = SparkEntry.queries(name)
      // a failed run records -1 (the once() convention), never its
      // time-to-exception — a bogus 50 ms "sample" would corrupt the
      // normalization this probe exists to provide
      val samples = (1 to 3).map { _ =>
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }.filter(_ >= 0)
      name -> (if (samples.isEmpty) -1.0 else samples.min)
    }.toMap
    def calJson(m: Map[String, Double]): String = calibrationSet
      .map(n => "\"" + n + "\":" + fmt(m.getOrElse(n, -1.0)))
      .mkString("{", ",", "}")

    // PROFILE MODE (dev-only, SPARK_GRAFT_BENCH_PROFILE=1): a listener
    // tallies jobs/tasks/task-time so each query's wall clock can be
    // split into parallel task work vs driver-side overhead (planning,
    // scheduling, micro-batch machinery) — the guide's "measure first"
    // step. Off by default; the timed path is unchanged either way (the
    // listener bus is async and its counters are read outside the
    // timed region).
    val profile = sys.env.contains("SPARK_GRAFT_BENCH_PROFILE")
    val profJobs = new java.util.concurrent.atomic.AtomicLong
    val profTasks = new java.util.concurrent.atomic.AtomicLong
    val profTaskMs = new java.util.concurrent.atomic.AtomicLong
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          profJobs.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          profTasks.incrementAndGet()
          Option(t.taskMetrics).foreach(m =>
            profTaskMs.addAndGet(m.executorRunTime))
        }
      })

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        val (j0, t0n, m0) = (profJobs.get, profTasks.get, profTaskMs.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        if (profile) {
          Thread.sleep(80) // let the async listener bus drain
          System.err.println(f"[profile] $name jobs=${profJobs.get - j0} " +
            f"tasks=${profTasks.get - t0n} " +
            f"taskTimeS=${(profTaskMs.get - m0) / 1e3}%.2f wallS=$wall%.2f")
        }
        wall
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }

    // Three SEPARATED full passes, min per query, each pass in a DIFFERENT
    // query order. Rationale (rounds 7/8 both produced misleading official
    // artifacts): machine-load stalls cluster in TIME, so when every pass
    // visits queries in the same alphabetical order, one multi-minute stall
    // window covers the same contiguous query block in all passes and
    // min() cannot remove it (r8: q04–q13 reported at 2.8–6× their true
    // times). With pass 1 forward, pass 2 reversed, and pass 3 in a
    // fixed-seed shuffle, a stall window taints a given query in at most
    // one pass, and min-of-3 recovers the true time. Per-pass values are
    // emitted in the JSON ("passes") so a stall is adjudicable from the
    // artifact alone: a query whose three samples disagree wildly was
    // stalled, not regressed. The DEADLINE budget may degrade 3→2→1
    // passes; `passes_completed` records how many fully ran.
    val shuffled = new scala.util.Random(20260813L).shuffle(ordered)
    val orders = Seq(ordered, ordered.reverse, shuffled)
    val passes = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    var passesCompleted = 0

    // ARTIFACT SNAPSHOT — rewritten after warmup and after every pass
    // with best-so-far mins, so a kill at ANY point leaves a complete
    // parseable file (r15: the end-only write + driver timeout produced
    // `parsed: null`; never again). Atomic-ish: write a temp then move.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    def snapshot(calibStart: Map[String, Double],
        calibEnd: Option[Map[String, Double]]): (String, String, Double) = {
      val results = ordered.map { case (name, _) =>
        val samples = passes.flatMap(_.get(name)).filter(_ >= 0)
        name -> (if (samples.isEmpty) -1.0 else samples.min)
      }
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val perPass = ordered.map { case (name, _) =>
        "\"" + name + "\":[" +
          passes.flatMap(_.get(name)).map(fmt).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val calibration = s"""{"start":${calJson(calibStart)},"end":${
        calibEnd.map(calJson).getOrElse("null")}}"""
      val top10 = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val meta = s""""passes_completed":$passesCompleted,"passes_started":${
        passes.size},"deadline_s":${fmt(deadlineS)},"elapsed_s":${
        fmt(elapsedS)},"warmup":$warmupJson"""
      val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"passes":$perPass,"calibration":$calibration,$meta,"sf":"$sfDir"}"""
      val short = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"top10":$top10,"calibration":$calibration,$meta,"sf":"$sfDir","full_payload":"$outFile"}"""
      (full, short, total)
    }
    def writeSnapshot(calibStart: Map[String, Double],
        calibEnd: Option[Map[String, Double]]): (String, String, Double) = {
      val (full, short, total) = snapshot(calibStart, calibEnd)
      try {
        val tmp = java.nio.file.Paths.get(outFile + ".tmp")
        java.nio.file.Files.write(tmp,
          (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(outFile),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
      }
      (full, short, total)
    }

    val calibStart = calibrate()
    writeSnapshot(calibStart, None)

    var deadlineHit = false
    for ((order, idx) <- orders.zipWithIndex if !deadlineHit) {
      val passNo = idx + 1
      // a pass after the first starts only if the previous pass's cost
      // fits the remaining budget (pass 1 ALWAYS runs in full — every
      // query must get at least one timed sample)
      val prevPassCost = passes.lastOption
        .map(_.values.filter(_ >= 0).sum).getOrElse(0.0)
      if (passNo > 1 && elapsedS + prevPassCost + reserveS > deadlineS) {
        System.err.println(s"[bench] deadline: skipping pass $passNo " +
          s"(elapsed ${fmt(elapsedS)} s + est ${fmt(prevPassCost)} s " +
          s"would cross ${fmt(deadlineS)} s)")
        deadlineHit = true
      } else {
        val acc = scala.collection.mutable.Map.empty[String, Double]
        var cut = false
        order.foreach { case (name, fn) =>
          // mid-pass deadline stop (passes ≥2 only): already-timed
          // queries keep this pass's samples, the rest keep earlier ones
          if (!cut && passNo > 1 && elapsedS + reserveS > deadlineS) {
            cut = true; deadlineHit = true
            System.err.println(s"[bench] deadline: pass $passNo cut " +
              s"after ${acc.size}/${order.size} queries")
          }
          if (!cut) acc(name) = once(name, fn)
        }
        passes += acc.toMap
        if (!cut) passesCompleted += 1
        val (_, short, _) = writeSnapshot(calibStart, None)
        println(short)
      }
    }

    val calibEnd = calibrate()
    val (_, short, _) = writeSnapshot(calibStart, Some(calibEnd))
    // FINAL line is a short (~600 B) pure-JSON summary: the driver keeps
    // only the tail of stdout, and the full per-query line outgrows it at
    // 258 queries (r10's BENCH artifact parsed as null). A tail capture
    // of any plausible size always contains this whole line.
    println(short)
    spark.stop()
  }
}
