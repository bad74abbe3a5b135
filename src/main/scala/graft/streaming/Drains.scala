package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The streaming-gate drain scaffolds — the fixture/drain machinery every
  * streaming-maintenance gate shares (promoted from CdcQueries in r13 so
  * query families depend on the streaming package, not on a sibling
  * queries file). Three layers:
  *
  *   - [[tmpFixtureDir]]/[[streamDirs]]/[[withDrainPartitions]] — fixture
  *     roots and the micro-batch shuffle-partition dial;
  *   - [[drainBinlogFeed]] — the binlog source file-by-file
  *     (`maxFilesPerTrigger=1`), `foreachBatch`, AvailableNow to
  *     completion;
  *   - [[drainWithRedelivery]]/[[drainIdempotentWithRedelivery]] — the
  *     exactly-once proof scaffold: record which file(s) batch 0 ACTUALLY
  *     processed, then re-apply batch 0 from them after the drain — the
  *     injected crash-after-commit redelivery a replay-safe sink must
  *     absorb bit-for-bit (foreachBatch's documented at-least-once
  *     hazard, made concrete).
  */
object Drains {

  /** Pin `spark.sql.shuffle.partitions` to the drain dial for `body`.
    *
    * Gates pair with a fresh checkpoint per run (tmpFixtureDir wipes stale
    * state), so the state partition count is a per-run dial, not a
    * compatibility surface — and the drained results (status counts,
    * keyed rows) are partition-count-invariant. At the batch default of
    * 32, each micro-batch of a few-hundred-row fixture pays 32
    * state-store commits PER stateful operator (a stream-stream join
    * carries four stores per partition), which is pure fixed cost; 4
    * partitions keep identical output at an eighth of it. Streaming pins
    * the value into the checkpoint's offset metadata at query start, so
    * the conf is held across the whole drain and restored after — a
    * restart drain (cdc18) re-reads the pinned value from the checkpoint
    * regardless. At 100 TB this dial goes the other way (hundreds of
    * partitions); the point is that it IS the deployment dial, per feed
    * volume. */
  def withDrainPartitions[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try body finally spark.conf.set(key, prev)
  }

  /** A per-(prefix, dir) fixture root under java.io.tmpdir, wiped clean on
    * entry. NOT created here: the Hadoop committer behind AvroSink-style
    * writes requires its output path to not exist; text-fixture writers
    * mkdirs(). */
  def tmpFixtureDir(prefix: String, dir: String): java.io.File = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map(b => f"${b & 0xFF}%02x").mkString
    val out = new java.io.File(System.getProperty("java.io.tmpdir"), prefix + tag)
    if (out.exists()) {
      // Files.walk holds directory handles — close it, or every fixture
      // call leaks an fd until GC (dozens of gates per sweep JVM)
      val walk = java.nio.file.Files.walk(out.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    out
  }

  /** The (feed, state, ckpt) path triple every streaming-IVM gate uses,
    * under a fresh per-(prefix, dir) fixture root. */
  def streamDirs(prefix: String, dir: String): (String, String, String) = {
    val root = tmpFixtureDir(prefix, dir)
    root.mkdirs()
    (new java.io.File(root, "feed").getPath,
      new java.io.File(root, "state").getPath,
      new java.io.File(root, "ckpt").getPath)
  }

  /** The shared streaming drain: the binlog source file-by-file
    * (maxFilesPerTrigger=1 — the delta arrives across MULTIPLE
    * micro-batches), `apply` per batch, AvailableNow to completion,
    * under the drain partition dial. */
  def drainBinlogFeed(spark: SparkSession, feed: String,
      ckpt: String)(apply: (DataFrame, Long) => Unit): Unit =
    withDrainPartitions(spark) {
      val q = spark.readStream.format("binlog")
        .option("maxFilesPerTrigger", 1)
        .load(feed)
        .writeStream
        .foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  /** The ACTIVE-file drain (cdc58/cdc63): the `tailActive` binlog source
    * — (file, byte-frontier) offsets, torn tail held back in-source —
    * file-completion-per-trigger, AvailableNow to completion. Gates call
    * it once per installment against ONE checkpoint, appending bytes to
    * the growing last file between runs. */
  def drainBinlogTail(spark: SparkSession, feed: String,
      ckpt: String)(apply: (DataFrame, Long) => Unit): Unit =
    drainBinlogTailUnion(spark, Seq(feed), ckpt)(apply)

  /** The PURGE-SAFE tail drain (cdc71): suffix-keyed offsets, so files
    * below the committed frontier may be DELETED between runs — the
    * binlog-retention posture neither index-keyed stream survives. */
  def drainBinlogPurgeTail(spark: SparkSession, feed: String,
      ckpt: String)(apply: (DataFrame, Long) => Unit): Unit =
    withDrainPartitions(spark) {
      val q = spark.readStream.format("binlog")
        .option("tailActive", "true")
        .option("purgeSafe", "true")
        .option("maxFilesPerTrigger", 1)
        .load(feed)
        .writeStream
        .foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  /** The SHARDED tail drain (cdc69): one streaming query over the UNION
    * of N shards' tailActive binlog sources — Spark's offset log tracks
    * each source independently (one offset line per source per batch),
    * so every shard gets its own (file, byte-frontier) progress and torn
    * -tail holdback while the downstream apply sees ONE batch stream.
    * This is the scale-out ingest shape: a fleet of database shards
    * into one maintained state, one checkpoint. */
  def drainBinlogTailUnion(spark: SparkSession, feeds: Seq[String],
      ckpt: String)(apply: (DataFrame, Long) => Unit): Unit =
    drainTailUnion(spark, feeds, ckpt, purgeSafe = false)(apply)

  /** The PURGE-SAFE sharded drain (cdc72): cdc69's N-feed union with
    * every source in the `purgeSafe` posture — per-source SUFFIX-keyed
    * offsets under the one checkpoint, so each shard's retention can
    * delete its own consumed files independently of the others. This is
    * the year-long N-shard deployment shape: the union keeps one offset
    * line per source (each a `{"seq":…}` form), a restart resumes every
    * shard from its own suffix frontier, and a listing that shrank on
    * one shard shifts nothing anywhere. */
  def drainBinlogPurgeTailUnion(spark: SparkSession, feeds: Seq[String],
      ckpt: String)(apply: (DataFrame, Long) => Unit): Unit =
    drainTailUnion(spark, feeds, ckpt, purgeSafe = true)(apply)

  private def drainTailUnion(spark: SparkSession, feeds: Seq[String],
      ckpt: String, purgeSafe: Boolean)
      (apply: (DataFrame, Long) => Unit): Unit =
    withDrainPartitions(spark) {
      require(feeds.nonEmpty, "the tail union drain needs at least one feed")
      def src(feed: String): DataFrame = {
        val r = spark.readStream.format("binlog")
          .option("tailActive", "true")
          .option("maxFilesPerTrigger", 1)
        (if (purgeSafe) r.option("purgeSafe", "true") else r).load(feed)
      }
      val q = feeds.map(src).reduce(_ unionByName _)
        .writeStream
        .foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  /** Batch-0 capture + unambiguous name→feed routing for UNION drains
    * (cdc72/cdc74's injected crash-after-commit redelivery; cdc69/s56
    * predate it and keep their settled inline copies): record the file
    * names batch 0 actually processed (bounded by maxFilesPerTrigger=1
    * per source), then resolve each name back to the ONE feed holding
    * it — a name present in several feeds is REFUSED, because routing
    * it to the first match would silently rebuild batch 0 from one
    * shard's copy only and fail the gate with a misleading
    * sink-not-replay-safe diagnosis. Keep per-shard file numbering
    * disjoint. Fixture-side scaffold (local files by design — real
    * redelivery is Spark's own offset-range replay). */
  final class UnionBatch0(feeds: Seq[String]) {
    private val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(batch: DataFrame, id: Long): Unit =
      if (id == 0L && names.isEmpty)
        names ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
    def nonEmpty: Boolean = names.nonEmpty
    def paths: Seq[String] = names.toSeq.map { n =>
      val hits = feeds.map(f => new java.io.File(f, n)).filter(_.isFile)
      require(hits.length == 1,
        s"batch-0 file '$n' resolves to ${hits.length} feeds — union " +
          "redelivery needs disjoint per-shard file numbering")
      hits.head.getPath
    }
  }

  /** The shared EXACTLY-ONCE drain: per batch, land `partials(batch)` in
    * its own batch_id partition (ViewMaintenance.applyIdempotent),
    * recording which feed file(s) batch 0 ACTUALLY processed (≤1 by
    * maxFilesPerTrigger=1 — a bounded fixture-side collect) rather than
    * inferring "the lexicographically smallest": if natural-version order
    * ever diverged from name order, an inferred redelivery would replace
    * batch 0's partition with DIFFERENT partials and fail spuriously
    * instead of isolating a sink bug. After the drain, batch 0's write is
    * re-applied from the recorded file(s) — the injected
    * crash-after-commit redelivery the partition overwrite must absorb
    * bit-for-bit. (An empty feed — a legal quiet period — wrote no files
    * and ran no batches: nothing to redeliver.) */
  def drainIdempotentWithRedelivery(spark: SparkSession,
      feed: String, ckpt: String, state: String)
      (partials: DataFrame => DataFrame): Unit =
    drainWithRedelivery(spark, feed, ckpt)((batch, id) =>
      ViewMaintenance.applyIdempotent(partials(batch), state, id))

  /** The RESTART-mid-drain scaffold: binlog files staged under `staging`
    * are delivered into `feed` in two installments against ONE
    * checkpoint — deliver half, drain to completion, the query STOPS;
    * deliver the rest, drain again from the same checkpoint. The second
    * run's offset log must skip every file run 1 committed while picking
    * up every new one (the count-based offset encoding makes the watched
    * dir append-only in natural-version order — staged files carry
    * strictly increasing `mysql-bin.N` numbers, so later deliveries
    * always sort after consumed ones), and batch ids CONTINUE across the
    * seam, so a batch_id-partitioned sink state is never rewritten by
    * run 2. This composes cdc18's source-restart proof with the
    * maintenance sinks' replay-safety — and then goes one further: after
    * run 2, the recorded batch-0 file is re-applied (the injected
    * crash-after-commit redelivery), now landing ACROSS the restart
    * boundary. */
  def drainBinlogRestartWithRedelivery(spark: SparkSession,
      staging: String, feed: String, ckpt: String)
      (apply: (DataFrame, Long) => Unit): Unit = {
    val fd = new java.io.File(feed); fd.mkdirs()
    val staged = Option(new java.io.File(staging).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getName)
    val (h1, h2) = staged.splitAt((staged.length + 1) / 2)
    def deliver(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      require(f.renameTo(new java.io.File(fd, f.getName)),
        s"fixture deliver failed: $f")
    }
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyRec(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      apply(batch, id)
    }
    deliver(h1)
    drainBinlogFeed(spark, feed, ckpt)(applyRec)
    deliver(h2)
    drainBinlogFeed(spark, feed, ckpt)(applyRec)
    if (batch0Files.nonEmpty) {
      applyRec(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"$feed/$f"): _*), 0L)
    }
  }

  /** The record-and-redeliver scaffold alone, for gates whose per-batch
    * apply manages its own (possibly multiple) replay-safe states (m11's
    * strict-probe flags + idempotent keeper minima; p14's
    * batch_id-filtered quota state): drain the binlog feed, remember
    * which file(s) batch 0 processed, then re-apply batch 0 from them —
    * the injected crash-after-commit replay the gate must absorb. */
  def drainWithRedelivery(spark: SparkSession,
      feed: String, ckpt: String)
      (apply: (DataFrame, Long) => Unit): Unit = {
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      apply(batch, id)
    }
    drainBinlogFeed(spark, feed, ckpt)(applyBatch)
    if (batch0Files.nonEmpty) {
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"$feed/$f"): _*), 0L)
    }
  }
}
