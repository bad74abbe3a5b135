package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two-phase prefix helpers must be BIT-IDENTICAL to the
  * single-partition windows they replace — same rows, same values, for
  * any bucket granularity (including buckets the data never fills). */
class PrefixSpec extends AnyFunSuite with SparkTestSession {

  // deterministic, collision-rich: repeated values, repeated buckets,
  // a gap in the order key, values out of insertion order
  private def df = {
    import spark.implicits._
    Seq(
      (3L, 10L), (1L, 5L), (7L, 2L), (2L, 5L), (15L, 9L),
      (8L, 9L), (40L, 1L), (41L, 1L), (42L, 30L), (99L, 4L)
    ).toDF("t", "v").repartition(7)
  }

  test("runningSumsInclusive == single-partition inclusive window sum") {
    val expected = df
      .withColumn("run", sum(col("v")).over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("t", "run").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = Prefix.runningSumsInclusive(df, Seq("t"),
        expr("t div 8"), Seq("v" -> "run"))
      .select("t", "run").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("runningMaxExclusive == single-partition exclusive window max (null first row)") {
    val expected = df
      .withColumn("hwm", max(col("v")).over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select("t", "hwm").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted
    val got = Prefix.runningMaxExclusive(df, "t", "v", expr("t div 8"), "hwm")
      .select("t", "hwm").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted
    assert(got.toSeq == expected.toSeq)
    assert(got.head._2.isEmpty, "first row in the total order must have a NULL watermark")
  }

  test("runningRank == global row_number over (bucket desc, tie asc) incl. tied buckets") {
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc, col("t"))).cast("long"))
      .select("t", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = Prefix.runningRank(df, col("v"), bucketDesc = true,
        Seq(col("t")), "rn")
      .select("t", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("runningRank ascending bucket order") {
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").asc, col("t"))).cast("long"))
      .select("t", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = Prefix.runningRank(df, col("v"), bucketDesc = false,
        Seq(col("t")), "rn")
      .select("t", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expected.toSeq)
  }
}
