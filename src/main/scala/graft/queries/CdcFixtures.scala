package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fixture builders shared by the CDC and lifecycle query families (the
  * [[graft.streaming.Drains]] pattern applied to query-domain fixtures:
  * a dedicated shared object, so neither family imports the other's
  * scaffolds).
  *
  *   - [[fixtureBase]] — the `events` projection every wire-fixture gate
  *     synthesizes from;
  *   - [[IvmFixture]]/[[ivmFixture]]/[[decodeIvmDelta]]/[[ivmReport]] —
  *     q66's incremental-view splits, shared by every consumer of q66's
  *     oracle (q66 itself, cdc45/48 in CdcQueries, cdc51/53/58/59 in
  *     LifecycleQueries) so none can drift from the decomposition the
  *     oracle gates.
  */
object CdcFixtures {

  /** The `events` projection the wire-fixture gates synthesize from. */
  def fixtureBase(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("ts div 1000000000").as("sec"))

  /** q66's fixture splits, shared by cdc45/cdc48 so the three consumers
    * of q66's oracle (q66 itself, the streaming IVM, the idempotent
    * sink) cannot drift from the decomposition the oracle gates. */
  case class IvmFixture(orders: DataFrame, line: DataFrame,
      aBase: DataFrame, aDelta: DataFrame,
      bBase: DataFrame, bDelta: DataFrame) {
    def partials(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("c")).as("cents"), count(lit(1)).as("n"))
  }

  def ivmFixture(spark: SparkSession, dir: String): IvmFixture = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val line = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), Tables.cents(col("l_extendedprice")).as("c"))
    IvmFixture(orders, line,
      orders.filter(col("o_orderkey") % 5 =!= 0),
      orders.filter(col("o_orderkey") % 5 === 0),
      line.filter(col("l_orderkey") % 7 =!= 0),
      line.filter(col("l_orderkey") % 7 === 0))
  }

  /** The binlog-decoded ΔA projection cdc45/cdc48 share. */
  def decodeIvmDelta(batch: DataFrame): DataFrame = batch
    .filter(col("event_type") === "WriteRowsEventV2")
    .select(explode(col("row_images")).as("img"))
    .select(element_at(col("img"), 1).cast("long").as("o_orderkey"),
      element_at(col("img"), 2).as("o_orderpriority"))

  /** The q66 output shape over a maintained state table — full recompute
    * next to the streamed incremental, q66's oracle columns. */
  def ivmReport(fx: IvmFixture, state: DataFrame): DataFrame = {
    val incr = state
      .groupBy("o_orderpriority")
      .agg(sum(col("cents")).as("incr_cents"), sum(col("n")).as("n_rows_incr"))
    fx.partials(fx.orders, fx.line)
      .withColumnRenamed("cents", "full_cents")
      .withColumnRenamed("n", "n_rows_full")
      .join(incr, "o_orderpriority")
      .select(col("o_orderpriority"), col("full_cents"), col("incr_cents"),
        col("n_rows_full"), col("n_rows_incr"))
      .orderBy("o_orderpriority")
  }
}
