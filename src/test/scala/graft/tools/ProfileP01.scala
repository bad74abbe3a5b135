package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

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

    // the REAL pipeline's stage prefixes (shared definition — profiling a
    // hand-copied lookalike is how stage attributions drift)
    val st = graft.queries.PipelineQueries.p01Stages(spark, sfDir)
    timed("scan+tokenize")(noop(st.docs))
    timed("quality")(noop(st.quality))
    timed("exact-dedup")(noop(st.exact))
    timed("shingle")(noop(st.sh))
    timed("pair-counts")(noop(st.pairCounts))
    timed("p01-full")(noop(graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)))
    timed("p01-full-2")(noop(graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)))
    spark.stop()
  }
}
