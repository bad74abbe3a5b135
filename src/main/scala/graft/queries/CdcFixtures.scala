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

  /** Bounded fixture-class collect every byte-crafted tail gate shares:
    * the rows of `base` (shape `(k BIGINT, v STRING)`) with
    * `k % modulus == m`, ordered, capped — mid-event tears are exactly
    * what the distributed sink refuses to produce, so these classes are
    * built driver-side and must stay bounded test vectors (cdc56's
    * discipline). */
  def boundedClass(base: DataFrame, gate: String, m: Long,
      modulus: Long = 131L, cap: Int = 200000)
      : Array[org.apache.spark.sql.Row] = {
    val rs = base.filter(col("k") % modulus === m).orderBy("k")
      .limit(cap + 1).collect()
    require(rs.length <= cap,
      s"$gate fixture class $m must stay a bounded test vector, got " +
        s"${rs.length} rows (cap $cap)")
    rs
  }

  /** Byte-level feed writer for the `(k BIGINT, v STRING)` wire shape
    * every tail gate crafts (cdc58, cdc64–cdc70): VARCHAR bound derived
    * from ALL classes up front (so every file in the gate shares one
    * column definition), transactions as GTID/BEGIN/(TABLE_MAP+ROWS)…/
    * XID with the row grouping and the commit record both controllable —
    * the torn shapes are made by omitting the XID (`commit = false`) or
    * slicing the returned offsets. One writer per gate replaces the
    * per-gate copies of this block that round 14's own notes caught
    * drifting (cdc69's bulk-filter overlap). */
  final class TailFeedWriter(classes: Seq[Array[org.apache.spark.sql.Row]],
      sid: Array[Byte] = (1 to 16).map(_.toByte).toArray) {
    import graft.ingest.BinlogBinaryWriter._

    val t0 = 1714564800L
    private val bound = math.max(20,
      classes.flatten.map(_.getString(1).getBytes("UTF-8").length)
        .foldLeft(0)(math.max) + 16)
    private val cols = Seq(ColDef.longlong, ColDef.varchar(bound))
    private def img(r: org.apache.spark.sql.Row): Seq[Option[Array[Byte]]] =
      Seq(Some(encLongLong(r.getLong(0))),
        Some(encVarchar(r.getString(1), bound)))

    /** A fresh file with its FDE written; returns (builder, offset after
      * the FDE — the clean-cut fallback when no transaction precedes). */
    def newFile(): (FileBuilder, Long) = {
      val f = new FileBuilder(checksums = true)
      val off = f.fde(t0)
      (f, off)
    }

    /** One transaction appending `rs`; returns (offset after the LAST
      * rows event — the mid-XID tear point is this + 7 — and the offset
      * after the XID, or -1 when `commit = false` leaves it torn). */
    def txn(f: FileBuilder, gno: Long, xid: Long,
        rs: Array[org.apache.spark.sql.Row], perEvent: Int = 100,
        commit: Boolean = true): (Long, Long) = {
      f.event(t0, 33, gtidBody(sid, gno))
      f.event(t0, 2, queryBody("sf", "BEGIN"))
      var lastRows = 0L
      rs.grouped(perEvent).foreach { b =>
        f.event(t0, 19, tableMapBody(11, "sf", "delta", cols))
        lastRows = f.event(t0, 30, rowsBody(11, cols.size, b.toSeq.map(img)))
      }
      (lastRows, if (commit) f.event(t0, 16, xidBody(xid)) else -1L)
    }

    /** The server's rotation record at the end of a closed file. */
    def rotate(f: FileBuilder, next: String): Long =
      f.event(t0, 4, rotateBody(next))
  }

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
