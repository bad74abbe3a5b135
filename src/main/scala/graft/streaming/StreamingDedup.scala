package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming dedup over the CDC key (SURVEY §2.9's custom-state
  * building block): emit only the FIRST record seen per
  * (binlog_file, binlog_position), across and within micro-batches, via
  * `flatMapGroupsWithState`.
  *
  * This is the streaming face of the batch last-wins/first-wins dedup
  * family: state is one boolean per key, partitioned by the key exactly
  * like the batch aggregate. With a real retention requirement the
  * NoTimeout below becomes an event-time timeout bounded by the binlog
  * retention window, which also bounds the state store size at scale.
  */
object StreamingDedup {

  case class KeyedRecord(binlog_file: String, binlog_position: Long,
      source_timestamp: Long)

  def firstOccurrence(ds: Dataset[KeyedRecord]): Dataset[KeyedRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
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
  }
}
