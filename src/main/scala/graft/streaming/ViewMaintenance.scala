package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.hadoop.fs.Path

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
  def applyIdempotent(partials: DataFrame, stateDir: String, id: Long): Unit = {
    require(id > BaseMark,
      s"batch ids at or below $BaseMark are reserved for base snapshots (got $id)")
    partials
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(stateDir)
  }

  /** Read the state table (empty view when no batch has landed yet).
    * `schema` is the partials schema in DDL form; include `batch_id
    * BIGINT` when the state was written by [[applyIdempotent]].
    *
    * Compaction-aware: when a base snapshot exists (see [[compact]]),
    * the read returns the NEWEST base plus only the batch partitions it
    * does not cover — partitions a compaction folded are ignored even if
    * their directories still exist (GC is correctness-free), and a
    * COVERED batch redelivered after its compaction (applyIdempotent
    * recreates its `batch_id=` partition) is absorbed by this filter
    * instead of by the partition overwrite. The filter is a literal
    * predicate on the partition column (partition-pruned at the scan, no
    * extra job); detecting the base costs one driver-side FS listing. */
  def readState(spark: SparkSession, stateDir: String, schema: String): DataFrame = {
    // Hadoop FS, not java.io: stateDir may live on HDFS/object storage on
    // a real cluster — resolve it with the session's conf like every
    // source does, so the pre-create lands where the writes will.
    val p = new Path(stateDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    val df = spark.read.schema(schema).parquet(stateDir)
    newestBase(spark, stateDir) match {
      case Some(nb) if hasBatchId(schema) =>
        df.filter(col("batch_id") === lit(nb) ||
          col("batch_id") > lit(BaseMark - nb))
      case _ => df
    }
  }

  /** An applyIdempotent state is recognized by an EXACT `batch_id` field
    * in the parsed DDL — a substring test would false-positive on a
    * schema containing e.g. "batch_idx BIGINT" and then fail later at
    * analysis with an obscure unresolved-column error (r13 ADVICE). */
  private def hasBatchId(schema: String): Boolean =
    org.apache.spark.sql.types.StructType.fromDDL(schema)
      .fieldNames.contains("batch_id")

  /** Reserved `batch_id` region for base snapshots: a compaction covering
    * `upto` lands at `batch_id = BaseMark - upto`, so base ids are
    * `<= BaseMark` and coverage is recoverable from the id alone (newer
    * bases are MORE negative). Caller batch ids — including negative
    * seed partitions like cdc48's state₀ at −1/−2 — must stay above
    * this mark; [[applyIdempotent]] enforces it. */
  val BaseMark: Long = -1000000000L

  /** The newest base snapshot's batch_id under `stateDir`, from one
    * driver-side FS listing of the `batch_id=` partition directories. */
  private def newestBase(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
      .filter(_ <= BaseMark)
      .sorted.headOption
  }

  /** The compaction POLICY companion to [[compact]]: fold when the LIVE
    * batch-partition count exceeds `maxLive`, covering everything except
    * the `keepLast` most recent batches. keepLast is an efficiency
    * courtesy, not a correctness need — a covered batch's redelivery is
    * absorbed by the read-side live rule anyway — but leaving the most
    * recent batches uncovered lets their redeliveries take the cheap
    * partition-overwrite path instead of landing dead partitions that
    * wait for the next GC. Call it from the maintenance loop after each
    * batch; it costs one FS listing when it declines. Returns true when
    * a compaction ran. */
  def maybeCompact(spark: SparkSession, stateDir: String, schema: String,
      maxLive: Int = 64, keepLast: Int = 2)
      (fold: DataFrame => DataFrame): Boolean = {
    require(maxLive >= 1 && keepLast >= 0,
      s"need maxLive >= 1 (got $maxLive) and keepLast >= 0 (got $keepLast)")
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val ids = fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
    val covered = ids.filter(_ <= BaseMark).sorted.headOption
      .map(BaseMark - _).getOrElse(Long.MinValue)
    val live = ids.filter(id => id > BaseMark && id > covered).sorted
    val upto = live.dropRight(keepLast).lastOption
    if (live.size <= maxLive || upto.isEmpty || upto.get < 0L) false
    else { compact(spark, stateDir, schema, upto.get)(fold); true }
  }

  /** Operational health view of a maintained state — the "is my view
    * healthy" diagnostic every IVM user otherwise hand-writes: one row
    * per `batch_id=` partition on disk (bases AND live batches — a
    * diagnostic shows what EXISTS, not just what serves) with row, file,
    * and byte counts. Row counts come from one partition-grouped
    * aggregate over the state (parquet footer counts — no data pages
    * read); file/byte counts from a driver-side FS listing, which is
    * bounded by the partition count — the very quantity [[compact]]
    * keeps small. Base snapshots report their coverage in
    * `covered_upto`; live batches carry −1 there. */
  def stateMetrics(spark: SparkSession, stateDir: String,
      schema: String): DataFrame = {
    import org.apache.spark.sql.functions.count
    // same loud guard compact gives: the per-partition grouping below
    // needs an applyIdempotent state — without it the caller would get
    // an obscure AnalysisException instead of this message (r13 ADVICE)
    require(hasBatchId(schema),
      "stateMetrics needs an applyIdempotent state (an exact batch_id " +
        "field in the schema); appendBatch states have no partition " +
        "manifest to report")
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val manifest: Seq[(Long, Boolean, Long, Long, Long)] =
      fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.startsWith("batch_id="))
        .map { d =>
          val id = d.getName.stripPrefix("batch_id=").toLong
          val files = fs.listStatus(d).toSeq.filter(f => f.isFile && {
            val n = f.getPath.getName
            !n.startsWith(".") && !n.startsWith("_")
          })
          (id, id <= BaseMark, if (id <= BaseMark) BaseMark - id else -1L,
            files.size.toLong, files.map(_.getLen).sum)
        }
    import spark.implicits._
    val fsSide = manifest
      .toDF("batch_id", "is_base", "covered_upto", "n_files", "bytes")
    val rowCounts = spark.read.schema(schema).parquet(stateDir)
      .groupBy("batch_id").agg(count(lit(1)).as("n_rows"))
    fsSide.join(rowCounts, Seq("batch_id"), "left")
      .na.fill(0L, Seq("n_rows"))
      .select("batch_id", "is_base", "covered_upto", "n_rows",
        "n_files", "bytes")
      .orderBy("batch_id")
  }

  /** Fold every live partition with `batch_id <= upto` — the previous
    * base (if any) plus the covered batch partitions — into ONE new base
    * snapshot, atomically: the folded partials are written to a hidden
    * temp directory inside the state (dot-prefixed — invisible to
    * readers), then ONE Hadoop-FS rename to `batch_id=<BaseMark - upto>`
    * is the commit point (the BinlogSink first-attempt-wins discipline:
    * a refused rename whose target exists means a sibling compactor won
    * — discard our temp; any other refusal fails loudly). Covered
    * partition directories are then deleted as garbage collection — a
    * reader between the rename and the deletes still reads correctly,
    * because [[readState]]'s live rule ignores covered partitions
    * whether or not their directories exist. A crash at ANY point leaves
    * a readable state: before the rename nothing changed (dot-dirs are
    * invisible); after it, the new base governs.
    *
    * `fold` receives the covered rows WITHOUT `batch_id` and must return
    * the collapsed partials (additive sums summed, signed sums summed,
    * register maxima maxed, set states distinct'd — every
    * ViewMaintenance state is mergeable by construction, which is what
    * makes this safe). Partitions with `batch_id > upto` are untouched,
    * so [[applyIdempotent]]'s redelivery contract survives for in-flight
    * batches; a redelivered batch `<= upto` is absorbed by the read-side
    * live rule instead. `upto` must be `>= 0` (the base-id encoding) and
    * at least the current coverage (shrinking a base is meaningless).
    *
    * Single-maintainer discipline: compaction runs in the maintenance
    * loop between (or inside) batches of the ONE writer — concurrent
    * compactions to the same `upto` are safe (first-attempt-wins), but
    * compaction concurrent with a write of a COVERED batch is the
    * caller's race to avoid, exactly as for any table maintenance. */
  def compact(spark: SparkSession, stateDir: String, schema: String,
      upto: Long)(fold: DataFrame => DataFrame): Unit = {
    require(hasBatchId(schema),
      "compact needs an applyIdempotent state (an exact batch_id field " +
        "in the schema)")
    require(upto >= 0L, s"compaction coverage must be >= 0, got $upto")
    val coverage = newestBase(spark, stateDir).map(BaseMark - _)
    require(coverage.forall(_ <= upto),
      s"compaction cannot shrink coverage: current ${coverage.get}, asked $upto")
    val newBaseId = BaseMark - upto
    val covered = readState(spark, stateDir, schema)
      .filter(col("batch_id") <= upto)
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // GC ALL crashed attempts' leftovers, not just this upto's: upto
    // grows monotonically, so a temp orphaned by a crash at an earlier
    // coverage would otherwise persist forever — invisible to readers
    // (dot-dirs) but inflating storage and the listing cost compaction
    // exists to bound
    fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".compact_attempt_"))
      .foreach(d => fs.delete(d, true))
    val tmp = new Path(p, s".compact_attempt_$upto")
    fold(covered.drop("batch_id")).write.mode("overwrite")
      .parquet(tmp.toString)
    val fin = new Path(p, s"batch_id=$newBaseId")
    if (!fs.rename(tmp, fin)) {
      if (fs.exists(fin)) { fs.delete(tmp, true); return } // sibling won
      throw new java.io.IOException(
        s"state compaction commit failed: rename $tmp -> $fin")
    }
    // GC: covered batch partitions and superseded (older) bases. Pure
    // cleanup — the live rule already ignores them — but a failed delete
    // is surfaced: leaking one partition per compaction forever would
    // quietly defeat compaction's listing-cost point.
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath)
      .filter { d =>
        val n = d.getName
        n.startsWith("batch_id=") && {
          val v = n.stripPrefix("batch_id=").toLong
          (v > BaseMark && v <= upto) || (v <= BaseMark && v > newBaseId)
        }
      }
      .foreach { d =>
        if (!fs.delete(d, true) && fs.exists(d))
          throw new java.io.IOException(s"compaction GC failed to delete $d")
      }
  }
}
