package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's incremental-view-maintenance state discipline, as a
  * public surface (extracted from the cdc45/47/48/49 gates so library
  * users maintain views with the same guarantees the gates prove):
  *
  *   - a maintained view's STATE is a parquet table of mergeable
  *     PARTIALS (additive sums/counts, signed retraction weights, or
  *     idempotent register maxima) — the serve-time read folds them;
  *     the view is never rewritten or rescanned per batch;
  *   - [[appendBatch]] is the plain at-least-once append (correct when
  *     the source guarantees effectively-once delivery, e.g. a fresh
  *     checkpoint per run);
  *   - [[applyIdempotent]] is the exactly-once form: each batch lands in
  *     its own `batch_id=` partition via dynamic partition overwrite, so
  *     a REDELIVERED batch (sink write committed, checkpoint offset
  *     lost — foreachBatch's documented at-least-once hazard) replaces
  *     its own partition instead of double-counting (cdc48 injects that
  *     redelivery and gates the absorption);
  *   - [[readState]] pre-creates the directory and reads with an
  *     explicit schema, so a quiet period (zero batches, zero files) is
  *     an empty view, not a schema-inference error.
  */
object ViewMaintenance {

  /** At-least-once partial append (pair with a fresh checkpoint). */
  def appendBatch(partials: DataFrame, stateDir: String): Unit =
    partials.write.mode("append").parquet(stateDir)

  /** Exactly-once partial write: batch `id` overwrites ONLY its own
    * `batch_id=` partition, making a redelivered batch a no-op. */
  def applyIdempotent(partials: DataFrame, stateDir: String, id: Long): Unit =
    partials
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(stateDir)

  /** Read the state table (empty view when no batch has landed yet).
    * `schema` is the partials schema in DDL form; include `batch_id
    * BIGINT` when the state was written by [[applyIdempotent]]. */
  def readState(spark: SparkSession, stateDir: String, schema: String): DataFrame = {
    // Hadoop FS, not java.io: stateDir may live on HDFS/object storage on
    // a real cluster — resolve it with the session's conf like every
    // source does, so the pre-create lands where the writes will.
    val p = new org.apache.hadoop.fs.Path(stateDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    spark.read.schema(schema).parquet(stateDir)
  }
}
