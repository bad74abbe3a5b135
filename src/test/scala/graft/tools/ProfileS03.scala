package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiler (dev-only, not a test): counts jobs/stages and
  * per-phase wall time for s03. Run with
  * `Test/runMain graft.tools.ProfileS03`. */
object ProfileS03 {
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

    // warm everything once
    graft.queries.SimilarityQueries.s03AnnIvf(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val emb = graft.Tables.embeddings(spark, sfDir)
    timed("scan-only")(emb.write.format("noop").mode("overwrite").save())
    timed("buildCentroids")(
      graft.ops.Similarity.buildCentroids(emb, 64, 1024)
        .write.format("noop").mode("overwrite").save())
    val cent = graft.ops.Similarity.buildCentroids(emb, 64, 1024)
    timed("assign")(
      graft.ops.Similarity.assignToCentroids(
        emb.select("vec_id", "embedding"), cent, Seq("vec_id"))
        .write.format("noop").mode("overwrite").save())
    timed("s03-full")(
      graft.queries.SimilarityQueries.s03AnnIvf(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    timed("s03-full-2")(
      graft.queries.SimilarityQueries.s03AnnIvf(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    timed("s04-full")(
      graft.queries.SimilarityQueries.s04AnnIvfProbe(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    timed("p01-full")(
      graft.queries.PipelineQueries.p01TrainingMix(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    timed("d02-full")(
      graft.queries.DedupQueries.d02NgramJaccard(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
