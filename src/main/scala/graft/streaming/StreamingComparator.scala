package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{Comparator, Schemas}

/** Structured Streaming variant of the CDC comparison (SURVEY §2.9).
  *
  * The reference is strictly batch, but its domain is a CDC stream and its
  * probe loop (compare_timestamps.go:168) is trivially incremental. The
  * streaming mapping:
  *
  *   - the Avro change-record feed is the *stream* side (`readStream` on a
  *     directory of JSON-lines files — new files picked up per
  *     micro-batch);
  *   - the binlog snapshot is the *static* side of a stream-static
  *     left-outer join (the build map of the reference, refreshed per
  *     batch restart);
  *   - each micro-batch emits MATCH / MISMATCH_* / AVRO_ONLY rows with
  *     exactly the batch semantics (same comparison expressions, shared
  *     with [[graft.cdc.Comparator]]);
  *   - BINLOG_ONLY is *not* streamable: it requires knowing the stream has
  *     ended (full-outer knowledge). It stays a batch reconciliation step
  *     — `Comparator.compare` over the accumulated output — matching the
  *     reference, which also only reports binlog-only rows after the full
  *     probe pass (compare_timestamps.go:253-274).
  *
  * At scale: the static side is the per-day/per-shard binlog snapshot; the
  * stream-static join broadcasts or shuffles by the same (file, position)
  * key as the batch plan, and the aggregation below it is a standard
  * streaming stateful agg bounded by the snapshot's key space.
  */
object StreamingComparator {

  /** Open the Avro-JSON feed directory as a stream (schema'd, PERMISSIVE —
    * same contract as the batch `Sources.avroJson`). */
  def avroJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.avroWrappedReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)

  /** Per-row comparison of a streaming (flattened+prepared) Avro feed
    * against a static prepared binlog snapshot. Emits one row per Avro
    * record with the same columns/status as the batch comparator minus the
    * BINLOG_ONLY family.
    *
    * The static snapshot must be prepared with a *stable* input-order seq
    * (e.g. `BinlogTextParser.seqColumn`, or any file/row-derived column):
    * Spark's streaming checker rejects `monotonically_increasing_id`
    * anywhere in the joined plan, static side included.
    */
  def compareStream(
      avroStream: DataFrame,
      binlogStatic: DataFrame,
      cfg: Comparator.Config = Comparator.Config()): DataFrame =
    Comparator.compareJoined(binlogStatic, avroStream, cfg, "left_outer")
}
