package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful SCD2 HISTORY build over a CDC change stream — the streaming
  * face of cdc21's batch `lead`-window history (SURVEY §2.9's custom-state
  * family, like [[SchemaEpochs]]): a warehouse applier tailing a live feed
  * must close each key's open version the moment the NEXT change for that
  * key arrives — in a stream that "next change" is a piece of STATE (the
  * currently-open version per key), not a window over a complete feed.
  *
  * Per key, state carries the one open version (pos, type, valid-from).
  * A micro-batch's slice for the key arrives UNORDERED in the group
  * iterator, so each invocation sorts its slice by (src_ms, pos) and folds
  * in change order: every arriving change closes the open version (emitting
  * it with `valid_to_ms` = the closer's timestamp — a DELETE closes without
  * opening, cdc21's convention), every non-DELETE then opens itself and is
  * emitted PROVISIONALLY with `valid_to_ms` NULL. A version superseded in a
  * later batch is thus emitted twice — open, then closed — and the reader
  * reconciles last-wins on (key, version): the closed emission supersedes
  * the provisional one (each version closes at most once, so the
  * reconciliation is deterministic). Cross-batch correctness rests on the
  * source's time-ordered batches (the same offset contract [[SchemaEpochs]]
  * documents); reordering/lateness is the watermark comparator's domain
  * (cdc16), not this fold's.
  *
  * State is ONE version per key — bounded by live-key count, independent of
  * feed length; the per-invocation sort buffers one key's slice of one
  * micro-batch. At 100 TB the stream shuffles once on the key — the same
  * co-location the batch SCD2 uses — and the history table appends
  * partition-locally per trigger.
  */
object StreamingScd2 {

  /** One feed change (cdc17's feed shape). */
  case class Change(user_id: Long, src_ms: Long, ct: String, pos: Long)

  /** One emitted SCD2 version row; `valid_to_ms` None = still open as of
    * emission (provisional until a later change closes it). */
  case class Version(user_id: Long, version_pos: Long, change_type: String,
      valid_from_ms: Long, valid_to_ms: Option[Long])

  /** Per-key state: the currently-open version. */
  case class OpenVersion(pos: Long, ct: String, fromMs: Long)

  def build(ds: Dataset[Change]): Dataset[Version] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVersion, Version](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[OpenVersion]) =>
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Version]
          rows.toSeq.sortBy(c => (c.src_ms, c.pos)).foreach { c =>
            open.foreach { o =>
              // a cross-batch late event (earlier than the open version it
              // closes) would silently write an INVERTED interval
              // (valid_to < valid_from) — undetectable downstream. The
              // in-batch sort makes this impossible within a batch, so it
              // can only mean the source broke its time-ordered-offsets
              // contract; fail the trigger loudly instead of corrupting
              // history rows.
              require(c.src_ms >= o.fromMs,
                s"SCD2 ordering violation for key $uid: change at " +
                  s"src_ms=${c.src_ms} closes a version opened at " +
                  s"${o.fromMs} — source batches are not time-ordered")
              out += Version(uid, o.pos, o.ct, o.fromMs, Some(c.src_ms))
            }
            if (c.ct != "DELETE") {
              open = Some(OpenVersion(c.pos, c.ct, c.src_ms))
              out += Version(uid, c.pos, c.ct, c.src_ms, None)
            } else open = None
          }
          open match {
            case Some(o) => state.update(o)
            case None => if (state.exists) state.remove()
          }
          out.iterator
      }
  }
}
