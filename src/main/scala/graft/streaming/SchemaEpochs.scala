package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful SCHEMA-EPOCH assignment over a CDC event stream — the
  * streaming face of cdc37's batch running-count window (SURVEY §2.9's
  * custom-state family, like [[StreamingDedup]]): every row event must be
  * decoded under the schema version in force at its log position, and in
  * a stream that version is a piece of STATE — the count of ALTER
  * statements the applier has passed — not a window over a complete log.
  *
  * Per table key, state carries one long (ALTERs seen so far). A
  * micro-batch's events for the key arrive UNORDERED in the group
  * iterator (Spark does not sort groups), so each invocation sorts its
  * slice by (file_seq, event_index) and folds in log order, tagging every
  * row event with the epoch in force at its position. Cross-batch
  * correctness rests on the source's offset discipline: the binlog
  * micro-batch source plans offsets in log order, so a batch never
  * carries events earlier than a previous batch's — exactly the contract
  * a real applier has with its log reader. State is one long per table —
  * bounded by the table count, the smallest state class in the engine;
  * the per-invocation sort buffers one table's slice of one micro-batch
  * (the per-trigger working set every flatMapGroups fold holds).
  */
object SchemaEpochs {

  /** One relevant log event: an ALTER boundary or a row batch.
    * Irrelevant event types must be filtered out upstream. */
  case class TableEvent(tbl: String, file_seq: Long, event_index: Long,
      is_alter: Boolean, n_rows: Long, key_sum: Long)

  /** A row event tagged with its schema epoch. */
  case class EpochedRows(tbl: String, epoch: Long, n_rows: Long, key_sum: Long)

  def assign(ds: Dataset[TableEvent]): Dataset[EpochedRows] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.tbl)
      .flatMapGroupsWithState[Long, EpochedRows](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (tbl, rows, state: GroupState[Long]) =>
          var alters = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(e => (e.file_seq, e.event_index))
            .flatMap { e =>
              if (e.is_alter) { alters += 1; None }
              else Some(EpochedRows(tbl, alters, e.n_rows, e.key_sum))
            }
          state.update(alters)
          out.iterator
      }
  }
}
