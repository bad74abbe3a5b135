package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase D — summary counters and verdict (SURVEY A1/A2; reference
  * compare_timestamps.go:279-290). One global aggregate: partial (map-side)
  * counts per partition, a six-long final row — no driver-side iteration, no
  * collect of detail rows.
  */
object Report {
  import Schemas.Status

  /** The reference's five counters plus the verdict, from a `Comparator.compare`
    * result:
    *   - `matched`      — Avro rows that found a binlog key (:195), mismatched
    *                      or not;
    *   - `mismatches`   — timestamp parse failures + tolerance violations
    *                      within the matched set (:209,:217); GTID/change-type
    *                      flags are *excluded*, as in the reference
    *                      (:228,:245);
    *   - `avro_only`    — probe misses (:188);
    *   - `binlog_only`  — unmatched binlog keys that are DML (:253-274);
    *   - `consistent`   — A2 verdict (:286-290).
    */
  def summary(compared: DataFrame): DataFrame = {
    val matchedRow = col("_a_present") && col("_b_present")
    compared.agg(
      count(when(matchedRow, 1)).as("matched"),
      count(when(matchedRow && col("ts_mismatch"), 1)).as("mismatches"),
      count(when(col("status") === Status.AvroOnly, 1)).as("avro_only"),
      count(when(col("status") === Status.BinlogOnly, 1)).as("binlog_only")
    ).withColumn("consistent",
      col("mismatches") === 0L && col("avro_only") === 0L && col("binlog_only") === 0L)
  }

  /** Generalized breakdown the reference can't produce but trivially collapses
    * to its numbers: counts per (schema, table, status) (SURVEY §2.4). */
  def breakdown(compared: DataFrame): DataFrame =
    compared
      .filter(col("status") =!= Status.BinlogOnlySuppressed)
      .groupBy(
        coalesce(nullif(col("b_schema"), lit("")), col("a_database"), lit("")).as("schema"),
        coalesce(nullif(col("b_table"), lit("")), col("a_table"), lit("")).as("table"),
        col("status"))
      .count()

  /** Detail report — everything the reference prints line-by-line
    * (AVRO_ONLY / MISMATCH / BINLOG_ONLY streams), as data. Suppressed
    * non-DML unmatched binlog rows are excluded, matching the printed output.
    */
  def detail(compared: DataFrame): DataFrame =
    compared
      .filter(col("status") =!= Status.Match &&
              col("status") =!= Status.BinlogOnlySuppressed)
      .orderBy(col("binlog_file"), col("position"))
}
