package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only, not a test): per-stage wall/task time for
  * p01_training_mix — the round-8 verdict asked for an attribution of its
  * flat ~2.3 s before any further claims about it. Run with
  * `Test/runMain graft.tools.ProfileP01`. */
object ProfileP01 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        println(f"  STAGE ${s.stageInfo.stageId}%3d tasks=${s.stageInfo.numTasks}%3d " +
          f"run=${s.stageInfo.taskMetrics.executorRunTime}ms " +
          f"cpu=${s.stageInfo.taskMetrics.executorCpuTime / 1000000}ms " +
          f"gc=${s.stageInfo.taskMetrics.jvmGCTime}ms  ${s.stageInfo.name.takeWhile(_ != '\n')}")
      }
    })

    def timed(name: String)(f: => Unit): Unit = {
      jobs = 0; stages = 0; taskMs = 0
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"PROF $name%-28s wall=$dt%6.3f s jobs=$jobs stages=$stages taskTime=${taskMs / 1000.0}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm once
    noop(graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir))

    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", graft.ops.TextOps.markerHits(col("toks"), Seq("the", "a")))
      .withColumn("tok_chars", graft.ops.TextOps.tokenCharSum(col("toks")))
    val quality = docs.filter(
      col("n_tokens") >= 25 &&
      col("n_stop").cast("double") / col("n_tokens") <= 0.125 &&
      col("tok_chars").cast("double") / col("n_tokens") >= 3.5)
    val exact = quality
      .groupBy(md5(col("text")).as("_h"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("source"),
          col("toks"), col("n_tokens")),
        col("doc_id")).as("_v"))
      .select(col("_v.*"))
    val sh = exact
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles",
        graft.functions.TextHashFunctions.shingleHash60(col("toks")))
      .withColumn("n_sh", size(col("shingles")))

    timed("scan+tokenize")(noop(docs))
    timed("quality")(noop(quality))
    timed("exact-dedup")(noop(exact))
    timed("shingle")(noop(sh))
    timed("pair-counts")(noop(graft.ops.Dedup.jaccardPairCounts(sh, "doc_id")))
    timed("p01-full")(noop(graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)))
    timed("p01-full-2")(noop(graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)))
    spark.stop()
  }
}
