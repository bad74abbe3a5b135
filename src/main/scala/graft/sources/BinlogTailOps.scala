package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ingest.BinlogOffsetIndex

/** Observability for the ACTIVE-file tail ([[BinlogTailMicroBatchStream]]):
  * how far behind the feed a consumer's CHECKPOINT is, split into the two
  * quantities an operator actually alerts on —
  *
  *   - `committedLagBytes`: bytes between the checkpointed offset and the
  *     feed's CURRENT committed frontier — work the next trigger would
  *     consume. A growing value means the consumer is falling behind.
  *   - `heldBackBytes`: bytes past the committed frontier (an in-flight
  *     transaction's rows, a torn tail). Nonzero is NORMAL on a live
  *     feed; a value that grows without ever flushing means an upstream
  *     writer died mid-transaction.
  *
  * The split matters because naive `EOF - offset` lag conflates them: a
  * consumer that has consumed everything consumable looks "behind" by
  * exactly the torn tail it is CORRECT to hold back.
  *
  * Reads the consumer's own checkpoint (Spark's offset log: the last
  * COMMITTED batch's end offset — `offsets/N` gated on `commits/N`), so
  * it runs out-of-band of the stream, driver-side only: one listing, one
  * offset-file read, and a header walk of the active file's bytes past
  * the offset (for a caught-up consumer that is just the new growth; a
  * badly-behind one pays a walk of the whole active file, same as the
  * stream's own next trigger) — at 100 TB nothing here scales with
  * history size. The walk mirrors the stream's admission-control
  * frontier ([[BinlogTailMicroBatchStream]]'s `frontierTarget`, minus
  * its per-trigger budgets) — a change to frontier semantics there must
  * land here too, or the metric disagrees with what the stream will
  * consume. The reference has no monitoring surface at all (its
  * pipeline is one-shot batch, comparator.sh:78-123).
  */
object BinlogTailOps {

  import BinlogTailMicroBatchStream.TailOffset

  /** Lag of a tail consumer's checkpoint against its feed directory.
    *
    * @param filesListed     natural-order listing size now
    * @param filesConsumed   files the checkpoint has fully consumed
    * @param frontierFile    file the checkpointed offset points into
    *                        ("" when everything listed is consumed)
    * @param frontierPos     committed byte frontier inside it
    * @param frontierIdx     decoder event index at the frontier (events
    *                        with `event_index >= frontierIdx` in
    *                        `frontierFile` are NOT yet consumed)
    * @param committedLagBytes bytes the next trigger would consume
    * @param heldBackBytes   bytes past the feed's committed frontier
    *                        (in-flight / torn tail — correctly held)
    */
  final case class TailLag(filesListed: Int, filesConsumed: Int,
      frontierFile: String, frontierPos: Long, frontierIdx: Long,
      committedLagBytes: Long, heldBackBytes: Long)

  /** The last COMMITTED offset line in a tail stream's checkpoint: from
    * `offsets/N` for the highest N present in `commits/`. None when no
    * batch has committed (or the checkpoint doesn't exist yet) — the
    * consumer is at the initial offset. */
  def latestCommittedOffsetJson(ckpt: String, conf: Configuration)
      : Option[String] = {
    val commits = new Path(ckpt, "commits")
    val fs = commits.getFileSystem(conf)
    if (!fs.exists(commits)) return None
    val ids = fs.listStatus(commits).toSeq
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong)
    if (ids.isEmpty) return None
    val off = new Path(new Path(ckpt, "offsets"), ids.max.toString)
    val in = fs.open(off)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // line 0: "v1"; line 1: batch metadata; line 2+: ONE offset line per
    // source. A union query (drainBinlogTailUnion) writes several — and
    // "the last line" would silently be some OTHER feed's offset applied
    // to this feed's listing. Refuse until told which source is which.
    require(lines.length == 3,
      s"checkpoint $ckpt has ${lines.length - 2} source offset lines; " +
        "lagMetrics reads single-source tail checkpoints only — for a " +
        "union query, compute lag per feed from its own offset line")
    Some(lines.last)
  }

  /** The last COMMITTED offset, index-form (plain-tail checkpoints). */
  def latestCommittedOffset(ckpt: String, conf: Configuration)
      : Option[(Int, Long, Long, Int)] =
    latestCommittedOffsetJson(ckpt, conf).map { j =>
      val o = TailOffset.fromJson(j)
      (o.n, o.pos, o.idx, o.ck)
    }

  /** Lag metrics for a tail consumer: checkpointed offset vs the feed's
    * current state. Reads BOTH offset forms — the plain tail's
    * listing-index form and the purge-safe suffix-keyed form (resolved
    * against the current listing, where consumed prefixes may have been
    * purged away). Driver-side; safe to call while the stream runs
    * (the offset log is written atomically per batch). */
  def lagMetrics(spark: SparkSession, feed: String, ckpt: String): TailLag = {
    val conf = spark.sparkContext.hadoopConfiguration
    val listing = BinlogScan.listFiles(feed).toIndexedSeq
    def seqOf(f: String): Long = BinlogScan.fileSeqKey(f.split('/').last)
    val (n0, pos0, idx0, ck0) =
      latestCommittedOffsetJson(ckpt, conf) match {
        case None => (0, 0L, 0L, 0)
        case Some(json) if json.contains("\"seq\"") =>
          val o = BinlogPurgeTailMicroBatchStream.SeqOffset
            .fromJsonOrLegacy(json, () => listing, seqOf)
          val i = listing.indexWhere(f => seqOf(f) >= o.seq)
          if (i == -1) (listing.length, 0L, 0L, 0) // everything consumed
          else {
            require(seqOf(listing(i)) == o.seq || o.pos == 0L,
              s"frontier file with suffix ${o.seq} has unconsumed bytes " +
                s"past ${o.pos} but is missing — purged too aggressively")
            if (seqOf(listing(i)) == o.seq) (i, o.pos, o.idx, o.ck)
            else (i, 0L, 0L, 0)
          }
        case Some(json) =>
          val o = TailOffset.fromJson(json)
          (o.n, o.pos, o.idx, o.ck)
      }
    def len(f: String): Long = {
      val p = new Path(f)
      try p.getFileSystem(conf).getFileStatus(p).getLen
      catch { case _: java.io.IOException => 0L }
    }
    if (listing.isEmpty || n0 >= listing.length)
      return TailLag(listing.length, n0, "", pos0, idx0, 0L, 0L)
    val maxN = listing.length - 1
    // closed files between the offset and the active file read whole
    var lag = 0L
    (n0 until maxN).foreach { i =>
      lag += math.max(0L, len(listing(i)) - (if (i == n0) pos0 else 0L))
    }
    // the active file: committed frontier past the offset is consumable
    // lag; anything past the frontier is correctly-held-back
    // when the offset is mid-active-file, seed the walk with its decoder
    // state; otherwise walk the active file from its FDE
    val (sp, si, sc) = if (n0 == maxN) (pos0, idx0, ck0) else (0L, 0L, 0)
    val (cp, _, _) = BinlogOffsetIndex.commitFrontier(
      listing(maxN), sp, si, sc, conf)
    lag += math.max(0L, cp - sp)
    val held = math.max(0L, len(listing(maxN)) - cp)
    TailLag(listing.length, n0,
      new Path(listing(n0)).getName, pos0, idx0, lag, held)
  }
}
