package graft.streaming

import java.time.Duration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming dedup over the CDC key (SURVEY §2.9's custom-state
  * building block): emit only the FIRST record seen per
  * (binlog_file, binlog_position), across and within micro-batches, via
  * `flatMapGroupsWithState`.
  *
  * This is the streaming face of the batch last-wins/first-wins dedup
  * family: state is one boolean per key, partitioned by the key exactly
  * like the batch aggregate. Pass `retention` to bound the state store:
  * keys are forgotten once the event-time watermark passes their latest
  * occurrence by the retention window — the binlog retention window is the
  * natural setting, since a duplicate can only arrive while its source
  * binlog still exists. Unbounded (`retention = None`) keeps every key
  * forever, which is exact but grows state monotonically.
  */
object StreamingDedup {

  case class KeyedRecord(binlog_file: String, binlog_position: Long,
      source_timestamp: Long)

  /** Internal shape for the bounded variant — public only because Spark's
    * codegen'd deserializer needs constructor access. */
  case class TimedRecord(binlog_file: String, binlog_position: Long,
      source_timestamp: Long, event_time: java.sql.Timestamp)

  /** Exact dedup, unbounded state (NoTimeout). */
  def firstOccurrence(ds: Dataset[KeyedRecord]): Dataset[KeyedRecord] =
    firstOccurrence(ds, None)

  /** Dedup with optional bounded state. With `retention = Some(d)` the
    * input gets a watermark of `d` on `source_timestamp` (event time,
    * epoch millis) and each key's state expires on an event-time timeout
    * `d` past its latest occurrence — after expiry a re-arriving
    * duplicate would be re-emitted, the standard bounded-memory tradeoff
    * (state size = keys active within one retention window, not all keys
    * ever). */
  def firstOccurrence(ds: Dataset[KeyedRecord], retention: Option[Duration])
      : Dataset[KeyedRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    retention match {
      case None =>
        ds.groupByKey(r => (r.binlog_file, r.binlog_position))
          .flatMapGroupsWithState[Boolean, KeyedRecord](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (_, rows, state: GroupState[Boolean]) =>
              if (state.exists) Iterator.empty
              else {
                state.update(true)
                rows.take(1)
              }
          }
      case Some(d) =>
        val retentionMs = d.toMillis
        // the watermarked column must stay visible to flatMapGroupsWithState
        // (Spark's streaming checker), so it rides along in TimedRecord
        ds.withColumn("event_time", timestamp_millis(col("source_timestamp")))
          .withWatermark("event_time", s"$retentionMs milliseconds")
          .as[TimedRecord]
          .groupByKey(r => (r.binlog_file, r.binlog_position))
          .flatMapGroupsWithState[Boolean, KeyedRecord](
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            case (_, rows, state: GroupState[Boolean]) =>
              if (state.hasTimedOut) { state.remove(); Iterator.empty }
              else {
                val first = rows.next()
                val maxTs = rows.foldLeft(first.source_timestamp)(
                  (m, r) => math.max(m, r.source_timestamp))
                val isNew = !state.exists
                if (isNew) state.update(true)
                // Spark cancels any previously-set timeout whenever the
                // function is invoked for a key, so re-arm on EVERY arrival:
                // the key expires `retention` past its latest occurrence
                // (and always past the current watermark, a Spark rule).
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + retentionMs)
                if (isNew)
                  Iterator.single(KeyedRecord(
                    first.binlog_file, first.binlog_position, first.source_timestamp))
                else Iterator.empty
              }
          }
    }
  }
}
