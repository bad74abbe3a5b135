package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (a bare `count()` would let Catalyst prune most of the work), and
  * prints one JSON line with per-query and total wall seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // Warmup pass: run EVERY query once at a small SF first, so each
    // plan's janino codegen is compiled and the JIT is hot before any
    // timing starts — r2/r3 showed one-off codegen/GC stalls landing on
    // random queries and swinging the one-shot total by ±20%.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

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
    val calibStart = calibrate()

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
    // stalled, not regressed.
    val ordered = SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1)
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    def sweep(order: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Map[String, Double] =
      order.map { case (name, fn) => name -> once(name, fn) }.toMap
    val shuffled = new scala.util.Random(20260813L).shuffle(ordered)
    val passes = Seq(sweep(ordered), sweep(ordered.reverse), sweep(shuffled))
    val calibEnd = calibrate()
    val results = ordered.map { case (name, _) =>
      val samples = passes.map(_(name)).filter(_ >= 0)
      name -> (if (samples.isEmpty) -1.0 else samples.min)
    }
    // Locale.ROOT: the default-locale `f` interpolator would emit comma
    // decimal separators (invalid JSON) on comma-decimal locales
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val perPass = ordered.map { case (name, _) =>
      "\"" + name + "\":[" + passes.map(p => fmt(p(name))).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def calJson(m: Map[String, Double]): String = calibrationSet
      .map(n => "\"" + n + "\":" + fmt(m.getOrElse(n, -1.0)))
      .mkString("{", ",", "}")
    val calibration =
      s"""{"start":${calJson(calibStart)},"end":${calJson(calibEnd)}}"""
    // Artifact durability (r9: the driver's capture kept only the last
    // 2000 chars of the ~14 KB 207-query line, and its parse came back
    // null): the FULL payload — per-query mins plus the three per-pass
    // samples — is written to a file, and the printed line drops
    // "passes" (3× the bulk) and ends with the slowest-10 digest + sf,
    // so even a tail-truncated capture still carries the headline.
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"passes":$perPass,"calibration":$calibration,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    val top10 = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"n_queries":${results.size},"top10":$top10,"calibration":$calibration,"sf":"$sfDir"}""")
    // FINAL line is a short (~500 B) pure-JSON summary: the driver keeps
    // only the tail of stdout, and the full per-query line above outgrows
    // it at 258 queries (r10's BENCH artifact parsed as null). A tail
    // capture of any plausible size always contains this whole line.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"top10":$top10,"calibration":$calibration,"sf":"$sfDir","full_payload":"$outFile"}""")
    spark.stop()
  }
}
