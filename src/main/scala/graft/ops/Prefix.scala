package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix (running) aggregates over a total order.
  *
  * A bare `Window.orderBy(t)` computes the running aggregate correctly but
  * moves EVERY row to one partition (WindowExec's "No Partition Defined"
  * warning) — the single-executor sort that dies first at 100 TB. The
  * scale-safe plan for a running sum/max over a total order is the classic
  * two-phase prefix scan:
  *
  *   1. bucket the rows by a coarse key that is MONOTONE in the order
  *      column (hour of an event time, `pos div 2^20` of a log position,
  *      file_seq of a rotation chain) — so bucket order == total order;
  *   2. run the running aggregate INSIDE each bucket (per-bucket window —
  *      partitioned, parallel);
  *   3. aggregate one total per bucket (map-side partial agg, tiny table),
  *      run the running aggregate over the BUCKET TOTALS (a window over
  *      the aggregated table: rows = bucket count, orders of magnitude
  *      smaller — a 1e12-row feed at 2^20 rows/bucket carries ~1e6
  *      one-row totals, a few MB on one partition), producing each
  *      bucket's carry-in;
  *   4. broadcast-join the carry back and combine with the local prefix.
  *
  * Identical results to the single-partition window — same oracle rows —
  * with the only total-order structure left being the bucket-totals table.
  *
  * CONTRACT (all helpers): the bucket, order, and value expressions must
  * be NON-NULL. A NULL bucket would drop its row at the carry join (the
  * original window keeps it, NULLS FIRST), and a NULL value would make
  * `carry + local` diverge from the window's skip-nulls fold whenever a
  * bucket's prefix is all-NULL. Every current caller feeds non-null
  * aggregates/keys; a nullable caller must coalesce first.
  */
object Prefix {

  private def uniq(tag: String): String = s"_pfx_$tag"

  /** Running SUM of each `(valueCol -> outCol)` pair, inclusive of the
    * current row, over the total order `orderCols`. `bucket` must be
    * monotone non-decreasing in that order.
    */
  def runningSumsInclusive(df: DataFrame, orderCols: Seq[String],
      bucket: Column, sums: Seq[(String, String)]): DataFrame = {
    val bk = uniq("bk")
    val b = df.withColumn(bk, bucket)
    val wLoc = Window.partitionBy(bk).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(b) { case (d, (v, out)) =>
      d.withColumn(uniq(out), sum(col(v)).over(wLoc))
    }
    val totals = b.groupBy(col(bk))
      .agg(sums.head match { case (v, out) => sum(col(v)).as(uniq(s"t_$out")) },
        sums.tail.map { case (v, out) => sum(col(v)).as(uniq(s"t_$out")) }: _*)
    // carry = exclusive running sum over the per-bucket totals: this IS a
    // global-order window, but over the aggregated bucket table — the one
    // place a single partition is by design (see class doc, step 3)
    val wCarry = Window.orderBy(col(bk))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sums.foldLeft(totals) { case (d, (_, out)) =>
      d.withColumn(uniq(s"c_$out"),
        coalesce(sum(col(uniq(s"t_$out"))).over(wCarry), lit(0L)))
    }.select(col(bk) +: sums.map { case (_, out) => col(uniq(s"c_$out")) }: _*)
    val joined = local.join(broadcast(carry), Seq(bk))
    sums.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out, col(uniq(s"c_$out")) + col(uniq(out)))
        .drop(uniq(out), uniq(s"c_$out"))
    }.drop(bk)
  }

  /** Two-phase global `row_number` over a total order: per-bucket counts
    * aggregate to one row per distinct bucket value; their exclusive
    * running sum (a window over the AGGREGATED bucket table — the
    * by-design single-partition step) is each bucket's rank offset,
    * broadcast back; within-bucket ranks come from a bucket-partitioned
    * window over `tieCols`. Bit-identical to `row_number().over(
    * Window.orderBy(<global order>))` provided (a) the bucket is MONOTONE
    * in the global order (equal-order rows share a bucket), and (b)
    * `tieCols` IS the global order restricted within a bucket — so when
    * the bucket is a coarsening (e.g. `score div 2^16`), `tieCols` must
    * lead with the full score before the tie-break. The bucket must be
    * non-null and its cardinality bounded (a quantized score, an hour —
    * never a unique id): the offset table is what broadcasts. */
  def runningRank(df: DataFrame, bucket: Column, bucketDesc: Boolean,
      tieCols: Seq[Column], outCol: String): DataFrame = {
    val bk = uniq("bk"); val nC = uniq("n"); val offC = uniq("off")
    val b = df.withColumn(bk, bucket)
    val totals = b.groupBy(col(bk)).agg(count(lit(1)).as(nC))
    val ord = if (bucketDesc) col(bk).desc else col(bk).asc
    val wCarry = Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)
    val off = totals
      .withColumn(offC, coalesce(sum(col(nC)).over(wCarry), lit(0L)))
      .select(col(bk), col(offC))
    val wIn = Window.partitionBy(col(bk)).orderBy(tieCols: _*)
    b.join(broadcast(off), Seq(bk))
      .withColumn(outCol, col(offC) + row_number().over(wIn))
      .drop(bk, offC)
  }

  /** Running MAX of `valueCol` over all STRICTLY EARLIER rows in the total
    * order `orderCol` (frame `[unboundedPreceding, -1]` — the high-
    * watermark shape: "what had I seen when this row arrived"). NULL for
    * the first row, exactly like the single-partition window. `bucket`
    * must be monotone non-decreasing in `orderCol`.
    */
  def runningMaxExclusive(df: DataFrame, orderCol: String, valueCol: String,
      bucket: Column, outCol: String): DataFrame = {
    val bk = uniq("bk")
    val loc = uniq("loc")
    val cr = uniq("carry")
    val b = df.withColumn(bk, bucket)
    val wLoc = Window.partitionBy(bk).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = b.withColumn(loc, max(col(valueCol)).over(wLoc))
    val totals = b.groupBy(col(bk)).agg(max(col(valueCol)).as(uniq("tot")))
    val wCarry = Window.orderBy(col(bk))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = totals
      .withColumn(cr, max(col(uniq("tot"))).over(wCarry))
      .select(col(bk), col(cr))
    // greatest() skips NULLs: first row of the first bucket gets NULL
    // (no earlier row anywhere), first row of a later bucket gets the
    // carry — the single-partition window's exact semantics
    local.join(broadcast(carry), Seq(bk))
      .withColumn(outCol, greatest(col(cr), col(loc)))
      .drop(bk, loc, cr)
  }
}
