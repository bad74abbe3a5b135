package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators (the surface behind q20/q21): gap-based
  * sessionization and as-of (last-before) association — both single-shuffle
  * window plans keyed on the entity.
  */
object Sessions {

  /** Gap-based session ids: a new session starts when the gap to the
    * previous event (per `entityCol`, ordered by `tsCol` then `tieCol`)
    * exceeds `gapUs` microseconds. Adds `session_id` (1-based per entity).
    * One shuffle on the entity; the running sum stays in the same window
    * sort. */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(wRun))
      .drop("_gap", "_new")
  }

  /** As-of association: for every row where `isTarget`, the most recent
    * preceding row (same entity, by `tsCol`/`tieCol` order) where
    * `isSource`, as `asof_<c>` columns for each requested source column.
    * The classic "last click before purchase" — one window shuffle, no
    * join. */
  def lastBefore(df: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, isTarget: Column, isSource: Column,
      sourceCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val withAsof = sourceCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"asof_$c",
        last(when(isSource, col(c)), ignoreNulls = true).over(w))
    }
    withAsof.filter(isTarget)
  }

  /** Cross-table as-of join (inclusive): for each left row, the value
    * columns of the matching right row within the same `keyCol` —
    * backward (default): the right row with the greatest `tsCol` ≤ the
    * left row's (DuckDB `ASOF LEFT JOIN … ON l.key = r.key AND
    * l.ts >= r.ts`, the rate-lookup / point-in-time-dimension join);
    * `forward = true`: the right row with the SMALLEST `tsCol` ≥ the
    * left's (`l.ts <= r.ts` — the next-scheduled-event / next-quote
    * lookup). Forward is the same tagged-union single-window plan with
    * the sort reversed — right rows still order before left at ts ties,
    * so equal timestamps match in both directions (inclusive).
    *
    * Plan shape: the tagged-union single-window formulation — union both
    * sides on (key, ts), sort right rows before left rows at ts ties,
    * carry the last right value forward with an IGNORE NULLS running
    * window, keep left rows. ONE shuffle on the key and no range
    * expansion, vs. the naive inequality join whose candidate set is
    * |left|×|right-per-key| — the only formulation that survives a dense
    * right side at 100 TB. Contract: right is unique per (key, ts) (pre-
    * aggregate it) and `rightCols` are non-null (a null right value would
    * make the carry skip back past its row). Null-`tsCol` right rows are
    * dropped up front — ASOF's `l.ts >= r.ts` never matches them, while
    * an ascending window sort would put them FIRST and carry their value
    * into every pre-first-match left row. */
  def asOfJoin(left: DataFrame, right0: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String],
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    require(!leftCols.contains("_side") && !rightCols.contains("_side"),
      "asOfJoin: '_side' is reserved")
    require(leftCols.intersect(rightCols).isEmpty,
      s"asOfJoin: value column names collide across sides: " +
        leftCols.intersect(rightCols).mkString(", "))
    require(!rightCols.contains(keyCol) && !rightCols.contains(tsCol),
      "asOfJoin: rightCols must not repeat the key/ts columns")
    require(leftCols.intersect(rightCols.map("asof_" + _)).isEmpty,
      "asOfJoin: left column collides with an asof_* output name")
    val right = right0.filter(col(tsCol).isNotNull)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col): _*)
    // null-ts LEFT rows must see no carry in either direction (ASOF's
    // inequality never matches NULL): asc puts them first already;
    // desc needs nulls_first explicitly
    val tsOrder = if (forward) col(tsCol).desc_nulls_first else col(tsCol).asc
    val w = Window.partitionBy(keyCol).orderBy(tsOrder, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lTagged.unionByName(rTagged)) { (acc, c) =>
      acc.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"asof_$c")): _*)
  }

  /** Salted two-phase aggregation for skewed keys: partial aggregate on
    * (key, salt) — `saltBuckets`-way fan-out of each hot key — then final
    * aggregate on the key. `partials` maps each value column to a pair of
    * (partial agg, final agg over the partial). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = df.withColumn("_salt", pmod(saltSource, lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"),
        sum(col("_n")).as("n_rows"))
  }
}
