package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CdcFixtures.{boundedClass, fixtureBase, ivmFixture,
  decodeIvmDelta, ivmReport, TailFeedWriter}
import graft.streaming.Drains.{drainBinlogFeed, drainBinlogTail,
  drainWithRedelivery, streamDirs, tmpFixtureDir}

/** The maintained-state LIFECYCLE family (split out of CdcQueries in r14
  * — the r13 verdict's mechanics task): the gates a long-running CDC
  * deployment exercises beyond steady-state ingestion — mid-stream state
  * compaction (cdc51), restart-mid-drain (cdc53), full-DML wire apply
  * (cdc54), wire schema evolution (cdc55), torn-tail transactional
  * holdback (cdc56), and multi-table demultiplex (cdc57). Registered
  * names are unchanged from their CdcQueries days, so correctness
  * artifacts stay comparable across rounds. cdc52 (the stream-STREAM
  * tolerance band) stays in CdcQueries with the other comparator/
  * tolerance postures — it shares the comparator fixture feeds, not this
  * family's lifecycle machinery.
  *
  * Fixtures come from [[CdcFixtures]] (shared with CdcQueries so q66's
  * oracle consumers cannot drift); drain scaffolds from
  * [[graft.streaming.Drains]].
  */
object LifecycleQueries {

  // cdc51 — MID-STREAM STATE COMPACTION (the IVM lifecycle gap: every
  // ViewMaintenance state appends one batch_id partition per micro-batch
  // forever — correct at any scale, but a year-long stream lists
  // hundreds of thousands of partitions on every serve-time read). This
  // is cdc48's exactly-once IVM with `ViewMaintenance.compact` run
  // INSIDE the drain: after batch 1 lands, the state₀ seeds (−1/−2) and
  // batch 0 fold into ONE base snapshot (additive sums summed — the
  // mergeable-partials contract is precisely what makes the fold
  // lossless), committed by a single Hadoop-FS rename; batches ≥ 1 stay
  // live partitions. The gate then injects BOTH redelivery classes a
  // compacted state must absorb: (a) a COVERED batch (batch 0, via the
  // shared scaffold) — its recreated partition is ignored by the
  // read-side live rule, the compaction-specific failure mode; and (b)
  // an IN-FLIGHT post-compaction batch (the last batch, recorded
  // in-drain) — absorbed by the batch_id partition overwrite, proving
  // the cdc48 contract SURVIVES compaction for uncovered batches.
  // Shares q66's oracle: any double-count (either replay) or fold loss
  // (the compaction) is a hash mismatch. At 100 TB this is the
  // difference between a serve-time read that lists |batches| parquet
  // partitions and one that lists (1 base + in-flight few) — compaction
  // cost is one fold over ≤|groups|·|batches| partial rows, amortized
  // at the caller's cadence.
  def cdc51CompactedIvm(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val (feed, state, ckpt) = streamDirs("graft_cdc51_", dir)
    val fx = ivmFixture(spark, dir)
    graft.ingest.BinlogSink.writeKeyedStrings(
      fx.aDelta.repartition(4, col("o_orderkey")), feed)
    val bPrime = fx.bBase.unionByName(fx.bDelta).localCheckpoint(true)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bBase), state, -1L)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bDelta), state, -2L)
    val stateSchema =
      "o_orderpriority STRING, cents BIGINT, n BIGINT, batch_id BIGINT"
    def foldPartials(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))
    // the last batch's file set, recorded in-drain (bounded:
    // maxFilesPerTrigger=1) for the in-flight replay below
    val lateFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    var lateId = -1L
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      ViewMaintenance.applyIdempotent(
        fx.partials(decodeIvmDelta(batch), bPrime), state, id)
      if (id == 1L) // MID-stream: seeds + batch 0 → base; batch 1+ live
        ViewMaintenance.compact(spark, state, stateSchema, upto = 0L)(foldPartials)
      if (id > 0L) {
        lateFiles.clear()
        lateFiles ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
        lateId = id
      }
    }
    // drain + injected replay (a): the scaffold re-applies batch 0 — a
    // COVERED batch whose recreated partition the live rule must ignore
    drainWithRedelivery(spark, feed, ckpt)(applyBatch)
    // injected replay (b): the last (post-compaction, in-flight) batch —
    // absorbed by its own partition overwrite, the cdc48 contract
    if (lateFiles.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(lateFiles.toSeq.map(f => s"$feed/$f"): _*), lateId)
    ivmReport(fx,
      ViewMaintenance.readState(spark, state, stateSchema).drop("batch_id"))
  }

  // cdc53 — RESTART-MID-DRAIN for the maintenance matrix (additive
  // member): cdc18 proves the offset seam for the comparator's parquet
  // sink; every r12 maintenance gate absorbs a redelivered BATCH; this
  // proves the two COMPOSE on a maintained state — cdc48's exactly-once
  // IVM drained as two Trigger.AvailableNow runs against the SAME
  // checkpoint, with the second half of the feed files arriving between
  // them (strictly later natural-version numbers — the count-based
  // offset contract). Run 2's offset log must skip run 1's files and
  // its batch ids must CONTINUE (a restarted counter would overwrite
  // run 1's batch_id partitions with run 2's partials — exactly the
  // corruption this gate would catch); the recorded batch-0 file is
  // then re-applied ACROSS the restart boundary (the injected
  // redelivery). Shares q66's oracle: reprocessed files, restarted
  // counters, and unabsorbed replays are all hash mismatches.
  def cdc53RestartIvm(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc53_", dir)
    root.mkdirs()
    val staging = new java.io.File(root, "staging").getPath
    val feed = new java.io.File(root, "feed").getPath
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val fx = ivmFixture(spark, dir)
    graft.ingest.BinlogSink.writeKeyedStrings(
      fx.aDelta.repartition(4, col("o_orderkey")), staging)
    val bPrime = fx.bBase.unionByName(fx.bDelta).localCheckpoint(true)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bBase), state, -1L)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bDelta), state, -2L)
    graft.streaming.Drains.drainBinlogRestartWithRedelivery(
        spark, staging, feed, ckpt) { (batch, id) =>
      ViewMaintenance.applyIdempotent(
        fx.partials(decodeIvmDelta(batch), bPrime), state, id)
    }
    ivmReport(fx, ViewMaintenance.readState(spark, state,
      "o_orderpriority STRING, cents BIGINT, n BIGINT, batch_id BIGINT")
      .drop("batch_id"))
  }

  // cdc54 — FULL-DML WIRE APPLY: the last wire shape the distributed
  // sink didn't speak (writeChanges carries WRITE/DELETE; real
  // changelogs also UPDATE). A deterministic insert→update→delete
  // lifecycle per key rides the wire as native WRITE_ROWS /
  // UPDATE_ROWS (type 31, paired before/after FULL row images) /
  // DELETE_ROWS via BinlogSink.writeDml, decodes through the binary
  // source, and the canonical CDC consumer applies it: per key,
  // last-wins by the wire's own total order (file, event_index, image
  // position — range-partitioned keys keep each key's lifecycle in one
  // file, in order), UPDATE upserting its AFTER image (odd row_images
  // positions — the decoder's documented pairing), DELETE tombstoning.
  // The oracle reconstructs the surviving snapshot from the lifecycle
  // rules directly — so a wrong image picked from an update pair, a
  // misordered event, or a dropped delete is a hash mismatch. This is
  // cdc17's apply semantics fed by the real wire instead of a
  // synthesized feed: together with cdc05 (decode) and cdc43
  // (roundtrip) it closes the loop a CDC consumer actually runs. The
  // apply is the fully GENERAL one — an update's BEFORE image
  // tombstones its old key and its AFTER image upserts the new one, so
  // KEY-CHANGING updates (the %11 class moves to k + max(k) + 1 — a
  // DATA-DERIVED offset, so no scale factor can collide moved keys with
  // base keys; the VARCHAR-bound lesson applied to key spaces) relocate
  // rows correctly; for same-key updates the pair collapses to an
  // upsert because the after image's position wins the per-key order.
  // At 100 TB: one shuffle on the key (max_by hash agg), the cdc17 plan.
  def cdc54WireDmlApply(spark: SparkSession, dir: String): DataFrame = {
    val root = tmpFixtureDir("graft_cdc54_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"), col("user_id"))
    val maxKRow = base.agg(max(col("k"))).head()
    val moveOff = (if (maxKRow.isNullAt(0)) 0L else maxKRow.getLong(0)) + 1L
    val nullK = lit(null).cast("bigint")
    val nullV = lit(null).cast("string")
    val v0 = concat(lit("v0:"), col("user_id"))
    val v1 = concat(lit("v1:"), (col("user_id") + 7L))
    val v2 = concat(lit("v2:"), (col("user_id") + 9L))
    val isUpd = col("k") % 3 === 0
    val isMove = col("k") % 3 =!= 0 && col("k") % 11 === 0
    val curKey = when(isMove, col("k") + moveOff).otherwise(col("k"))
    val curVal = when(isUpd, v1).when(isMove, v2).otherwise(v0)
    val ins = base.select(lit(1).as("op"), nullK.as("bk"), nullV.as("bv"),
      col("k").as("ak"), v0.as("av"))
    val upd = base.filter(isUpd)
      .select(lit(0).as("op"), col("k").as("bk"), v0.as("bv"),
        col("k").as("ak"), v1.as("av"))
    // the key-changing class: the row MOVES to k + max(k) + 1 (past
    // the base keyspace by construction) — the before image carries the
    // old identity
    val mov = base.filter(isMove)
      .select(lit(0).as("op"), col("k").as("bk"), v0.as("bv"),
        (col("k") + moveOff).as("ak"), v2.as("av"))
    // deletes target the row's CURRENT identity (post-move)
    val del = base.filter(col("k") % 5 === 0)
      .select(lit(-1).as("op"), curKey.as("bk"), curVal.as("bv"),
        nullK.as("ak"), nullV.as("av"))
    // each lifecycle step lands in the file of the key it TARGETS
    // (coalesce(ak, bk)), in insert<update<delete order within the file;
    // a move's tombstone-of-old-key rides the update event in the NEW
    // key's (later) file, which still orders after the old key's insert
    graft.ingest.BinlogSink.writeDml(
      ins.unionByName(upd).unionByName(mov).unionByName(del)
        .withColumn("_key", coalesce(col("ak"), col("bk")))
        .withColumn("_ord",
          when(col("op") === 1, 0).when(col("op") === 0, 1).otherwise(2))
        .repartitionByRange(4, col("_key"))
        .sortWithinPartitions("_key", "_ord")
        .select("op", "bk", "bv", "ak", "av"),
      feed)
    val ev = spark.read.format("binlog").load(feed)
      .filter(col("event_type").isin(
        "WriteRowsEventV2", "UpdateRowsEventV2", "DeleteRowsEventV2"))
      .select(col("binlog_file"), col("event_index"), col("event_type"),
        posexplode(col("row_images")).as(Seq("pos", "img")))
    // the general apply: WRITE images upsert; DELETE images tombstone;
    // an UPDATE's even positions (BEFORE images — the decoder pairs
    // before,after consecutively) tombstone their key and its odd
    // positions (AFTER images) upsert theirs — same-key updates collapse
    // because the after position wins the per-key max_by
    val applied = ev.select(
        element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"),
        when(col("event_type") === "DeleteRowsEventV2", -1)
          .when(col("event_type") === "UpdateRowsEventV2" && col("pos") % 2 === 0, -1)
          .otherwise(1).as("op"),
        struct(col("binlog_file"), col("event_index"), col("pos")).as("seq"))
    applied.groupBy("k")
      .agg(max_by(struct(col("op"), col("v")), col("seq")).as("w"))
      .filter(col("w.op") === 1)
      .select(col("k"), substring(col("w.v"), 1, 2).as("ver"))
      .groupBy("ver")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("key_sum"))
      .orderBy("ver")
  }

  // cdc55 — SCHEMA EVOLUTION ON THE WIRE (the seam p16 left open: p16
  // evolved the maintained STATE's partials, but its feed never changed
  // shape — real CDC evolution starts upstream, with an ALTER TABLE
  // emitting a NEW TABLE_MAP mid-binlog). The changelog's early files
  // carry (k, v); from a data-derived midpoint the table gains a BIGINT
  // column and later files carry (k, v, w) — each file's TABLE_MAP
  // declares its own arity, the decoder's per-file registry applies the
  // right layout to each ROWS event (no global schema, exactly as MySQL
  // replicas handle ALTER), and the drain normalizes every batch to the
  // wide shape (absent column = NULL — the image's size says which
  // epoch the row crossed in). Mid-drain, maybeCompact folds narrow AND
  // wide partitions into one wide-schema base (the p16 boundary fold,
  // now fed by the wire), and the injected batch-0 redelivery lands as
  // a COVERED narrow-epoch replay that the read-side live rule absorbs.
  // The oracle rebuilds both epochs from the midpoint rule, so a
  // misaligned image (wrong arity applied), a dropped narrow row, or a
  // fold that loses the late column is a hash mismatch. At 100 TB this
  // is a zero-downtime column add: no feed rewrite, no dual-write
  // window, old rows age into the base with the column NULL.
  def cdc55WireEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc55_", dir)
    root.mkdirs()
    val stageN = new java.io.File(root, "stage_narrow").getPath
    val stageW = new java.io.File(root, "stage_wide").getPath
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"), col("user_id"))
    val maxRow = base.agg(max(col("k"))).head()
    val mid = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) / 2
    val v = concat(lit("u"), col("user_id"))
    // pre-ALTER installment: (op, k, v) — 2-column TABLE_MAPs
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") <= mid)
        .select(lit(1).as("op"), col("k"), v.as("v"))
        .repartitionByRange(2, col("k")),
      stageN)
    // post-ALTER installment: (op, k, v, w) — 3-column TABLE_MAPs,
    // numbered to sort strictly after the narrow files
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") > mid)
        .select(lit(1).as("op"), col("k"), v.as("v"),
          (col("k") * 3L + 1L).as("w"))
        .repartitionByRange(2, col("k")),
      stageW, fileSeqStart = 101)
    Seq(stageN, stageW).foreach { st =>
      Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    val wideSchema = "k BIGINT, v STRING, w BIGINT, batch_id BIGINT"
    drainWithRedelivery(spark, feed.getPath, ckpt) { (batch, id) =>
      // normalize EACH batch to the wide shape: the image's own arity
      // (the TABLE_MAP that framed it) decides whether w exists
      val norm = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(explode(col("row_images")).as("img"))
        .select(
          element_at(col("img"), 1).cast("long").as("k"),
          element_at(col("img"), 2).as("v"),
          when(size(col("img")) >= 3,
            element_at(col("img"), 3).cast("long")).as("w"))
      ViewMaintenance.applyIdempotent(norm, state, id)
      // compaction SPANS the evolution boundary: narrow partitions read
      // as w = NULL under the wide schema and fold (identity — the
      // state is an exactly-once row set) into a wide-schema base
      ViewMaintenance.maybeCompact(spark, state, wideSchema,
        maxLive = 2, keepLast = 1)(df => df)
    }
    ViewMaintenance.readState(spark, state, wideSchema)
      .withColumn("epoch", when(col("w").isNull, "narrow").otherwise("wide"))
      .groupBy("epoch")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(coalesce(col("w"), lit(0L))).as("w_sum"))
      .orderBy("epoch")
  }

  // cdc56 — TRANSACTIONAL (XID-BOUNDED) APPLY WITH TORN-TAIL HOLDBACK.
  // The reference carries XID events through its whole pipeline (P3
  // keeps them next to the row events, compare_timestamps.go:118-127)
  // but never makes them load-bearing; a real CDC consumer must — a
  // binlog's unit of atomicity is the transaction, and a file can END
  // mid-transaction (the database crashed after flushing row events
  // but before the commit record). This gate applies a feed
  // TRANSACTION-at-a-time: a row event's changes are visible iff a
  // later XID in the SAME file covers them, so the torn tail (rows
  // written, no commit) is held back rather than half-applied. The
  // fixture: the sink slice rides multi-transaction files (rowsPerTxn —
  // many XIDs per file, every boundary honored), plus one crafted tail
  // file holding a COMMITTED transaction followed by a transaction the
  // file ends inside (bounded fixture classes k % 131 ∈ {0, 1}; the
  // torn class is ~1/131 of the corpus at any SF). The apply computes
  // each file's LAST-XID frontier (one tiny per-file aggregate over the
  // sparse XID events — broadcast back against the row events, never a
  // shuffle of the data side) and keeps rows with event_index below it;
  // files with no XID contribute nothing. The oracle excludes exactly
  // the torn class, so a half-applied transaction (torn rows leaking
  // through) adds a row group and any dropped committed transaction
  // (over-eager holdback) loses one — both hash mismatches. At 100 TB
  // the frontier side is |files| rows; the data side is untouched until
  // the one broadcast-joined filter.
  def cdc56TxnAtomicApply(spark: SparkSession, dir: String): DataFrame = {
    val root = tmpFixtureDir("graft_cdc56_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // committed bulk: many transactions per file through the sink
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 2)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    // the tail file: txn A commits, txn B is torn (no XID — EOF inside
    // the transaction). Bounded fixture classes, written driver-side
    // with the byte-level builder because the torn shape is precisely
    // what the distributed sink refuses to produce.
    // explicit bound on the fixture collect (the other fixture writers'
    // limit + require discipline): the two 1/131 classes are a few
    // hundred rows at sf0.1; hitting the cap means the fixture stopped
    // being a bounded test vector, which must fail loudly, not OOM
    val fixtureCap = 200000
    val t1 = base.filter(col("k") % 131 === 0).orderBy("k")
      .limit(fixtureCap + 1).collect()
    val t2 = base.filter(col("k") % 131 === 1).orderBy("k")
      .limit(fixtureCap + 1).collect()
    require(t1.length <= fixtureCap && t2.length <= fixtureCap,
      s"cdc56 fixture classes must stay bounded test vectors, got " +
        s"${t1.length}/${t2.length} rows (cap $fixtureCap)")
    if (t1.nonEmpty || t2.nonEmpty) {
      import graft.ingest.BinlogBinaryWriter._
      val bound = math.max(20,
        (t1 ++ t2).map(_.getString(1).getBytes("UTF-8").length).max + 16)
      val cols = Seq(ColDef.longlong, ColDef.varchar(bound))
      def img(r: org.apache.spark.sql.Row): Seq[Option[Array[Byte]]] =
        Seq(Some(encLongLong(r.getLong(0))),
          Some(encVarchar(r.getString(1), bound)))
      val t0 = 1714564800L
      val sid = (1 to 16).map(_.toByte).toArray
      val f = new FileBuilder(checksums = true)
      f.fde(t0)
      f.event(t0, 33, gtidBody(sid, 901L))
      f.event(t0, 2, queryBody("sf", "BEGIN"))
      t1.grouped(100).foreach { b =>
        f.event(t0, 19, tableMapBody(11, "sf", "delta", cols))
        f.event(t0, 30, rowsBody(11, cols.size, b.toSeq.map(img)))
      }
      f.event(t0, 16, xidBody(9001L))
      // txn B: opened, rows flushed, never committed — the file ends here
      f.event(t0, 33, gtidBody(sid, 902L))
      f.event(t0, 2, queryBody("sf", "BEGIN"))
      t2.grouped(100).foreach { b =>
        f.event(t0, 19, tableMapBody(11, "sf", "delta", cols))
        f.event(t0, 30, rowsBody(11, cols.size, b.toSeq.map(img)))
      }
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000501").toPath, f.bytes)
    }
    val ev = spark.read.format("binlog").load(feed.getPath)
    // per-file commit frontier: the last XID's event_index (XIDs are
    // sparse — this side is |files| rows, broadcast below)
    val frontier = ev.filter(col("event_type") === "XID")
      .groupBy("binlog_file").agg(max(col("event_index")).as("last_xid_idx"))
    val committed = ev.filter(col("event_type") === "WriteRowsEventV2")
      .select(col("binlog_file"), col("event_index"),
        explode(col("row_images")).as("img"))
      .join(broadcast(frontier), Seq("binlog_file"), "left")
      // no XID after the row (or none in the file) ⇒ the transaction
      // never committed ⇒ held back
      .filter(col("event_index") < coalesce(col("last_xid_idx"), lit(-1L)))
      .select(element_at(col("img"), 1).cast("long").as("k"))
    committed
      .withColumn("src", when(col("k") % 131 === 0, "torn_file_committed")
        .otherwise("sink"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  // cdc57 — MULTI-TABLE DEMULTIPLEX: a real binlog is one totally-
  // ordered stream carrying EVERY table's changes (the reference's
  // events all carry schema/table attribution from their TABLE_MAPs,
  // json_parser.go's whitelist keeps both keys); a CDC consumer fans
  // that single feed out into per-table maintained states without
  // re-reading it once per table. Here two tables with different
  // shapes — ta(k, v STRING) and tb(k, x BIGINT), distinct table_ids —
  // interleave file-by-file in one watched dir (fileSeqStart staggers
  // the installments so natural-version order ALTERNATES tables), and
  // the drain routes each micro-batch by the decoded `table` column:
  // one localCheckpoint per batch (the feed is read ONCE), then one
  // applyIdempotent per table state. A batch holding only ta's file
  // writes tb an empty batch — the exactly-once discipline holds
  // per-state regardless of which tables a batch touches, and the
  // injected batch-0 replay (a ta file) must be absorbed by BOTH
  // states (ta by partition overwrite, tb by the empty write being a
  // no-op). The oracle rebuilds both tables' aggregates from the base
  // relation, so cross-table leakage (a tb row landing in ta's state),
  // a dropped table, or a double-fed replay all hash-mismatch. At
  // 100 TB this is THE deployment shape: one binlog subscription, N
  // states — the alternative (N subscriptions filtering one table
  // each) reads the feed N times.
  def cdc57MultiTableDemux(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc57_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val stateA = new java.io.File(root, "state_ta").getPath
    val stateB = new java.io.File(root, "state_tb").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"), col("user_id"))
    val maxRow = base.agg(max(col("k"))).head()
    val mid = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) / 2
    // four staged installments, numbered so the feed ALTERNATES tables
    // in natural-version order: ta(1), tb(2), ta(3), tb(4)
    def stage(name: String, df: DataFrame, table: String, tableId: Long,
        seq: Int): Unit = {
      val st = new java.io.File(root, name).getPath
      graft.ingest.BinlogSink.writeChanges(df.coalesce(1), st,
        table = table, tableId = tableId, fileSeqStart = seq)
      Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    val ta = base.select(lit(1).as("op"), col("k"),
      concat(lit("u"), col("user_id")).as("v"))
    val tb = base.select(lit(1).as("op"), col("k"),
      (col("user_id") * 3L).as("x"))
    stage("st1", ta.filter(col("k") <= mid), "ta", 21L, seq = 1)
    stage("st2", tb.filter(col("k") <= mid), "tb", 22L, seq = 2)
    stage("st3", ta.filter(col("k") > mid), "ta", 21L, seq = 3)
    stage("st4", tb.filter(col("k") > mid), "tb", 22L, seq = 4)
    drainWithRedelivery(spark, feed.getPath, ckpt) { (batch, id) =>
      // ONE pass over the batch, N routed state writes
      val b = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(col("table"), explode(col("row_images")).as("img"))
        .localCheckpoint(true)
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "ta")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).as("v")),
        stateA, id)
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "tb")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).cast("long").as("x")),
        stateB, id)
    }
    val servedA = ViewMaintenance.readState(spark, stateA,
        "k BIGINT, v STRING, batch_id BIGINT")
      .withColumn("tbl", lit("ta"))
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(length(col("v"))).as("payload_sum"))
    val servedB = ViewMaintenance.readState(spark, stateB,
        "k BIGINT, x BIGINT, batch_id BIGINT")
      .withColumn("tbl", lit("tb"))
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(col("x")).as("payload_sum"))
    servedA.unionByName(servedB).orderBy("tbl")
  }

  val cdc57Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT 'ta' AS tbl, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(SUM(LENGTH('u' || CAST(user_id AS VARCHAR))) AS BIGINT) AS payload_sum
      |FROM base
      |UNION ALL
      |SELECT 'tb', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(SUM(user_id * 3) AS BIGINT)
      |FROM base
      |ORDER BY tbl""".stripMargin

  val cdc56Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'torn_file_committed'
      |            ELSE 'sink' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val cdc55Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |), mx AS (
      |  SELECT MAX(k) // 2 AS mid FROM base
      |)
      |SELECT CASE WHEN k <= mid THEN 'narrow' ELSE 'wide' END AS epoch,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(SUM(CASE WHEN k > mid THEN 3 * k + 1 ELSE 0 END) AS BIGINT) AS w_sum
      |FROM base, mx GROUP BY 1 ORDER BY 1""".stripMargin

  val cdc54Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |), mo AS (
      |  SELECT MAX(k) + 1 AS off FROM base
      |), fin AS (
      |  SELECT CASE WHEN k % 3 <> 0 AND k % 11 = 0
      |              THEN k + off ELSE k END AS cur_k,
      |    CASE WHEN k % 3 = 0 THEN 'v1'
      |         WHEN k % 11 = 0 THEN 'v2' ELSE 'v0' END AS ver
      |  FROM base, mo WHERE k % 5 <> 0
      |)
      |SELECT ver, COUNT(*) AS n_rows, CAST(SUM(cur_k) AS BIGINT) AS key_sum
      |FROM fin GROUP BY ver ORDER BY ver""".stripMargin

  // cdc58 — TAILING THE ACTIVE, GROWING BINLOG FILE (the one deployment
  // posture no earlier gate could serve: every streaming posture so far
  // consumed closed, immutable files — the reference's own workaround is
  // FLUSH BINARY LOGS before copying, README.md:68-73; a real CDC
  // consumer tails mysql-bin.000042 WHILE the server appends to it).
  // The source's `tailActive=true` mode replaces file-count offsets with
  // (file, committed-byte-frontier) offsets: each trigger walks only the
  // bytes that appeared since the last frontier and stops at the last
  // transaction-closing XID (BinlogOffsetIndex.commitFrontier — cdc56's
  // torn-tail rule, now INSIDE the source), so an in-flight transaction
  // is held back, never half-applied. The fixture: sink-written closed
  // bulk files plus ONE byte-crafted active file holding four fixture
  // classes (k % 131): txn A (0) committed before run 1; txn B (1) torn
  // at run 1 — the first installment ends 7 bytes INTO B's XID header —
  // and completed by the appended bytes; txn C (2) committed in the
  // appended bytes; txn D (3) torn forever. Two AvailableNow runs on ONE
  // checkpoint with the append in between, each batch applied
  // exactly-once (applyIdempotent), plus the recorded batch-0 (whole
  // closed file) redelivered after run 2 — the cdc48 injection. The
  // oracle excludes exactly class 3, so: a torn row leaking early (the
  // naive end-of-file frontier) adds D's rows; a frontier that loses
  // track across the append drops B or C; a re-read of run-1 bytes in
  // run 2 double-counts into a different batch partition — all hash
  // mismatches. At 100 TB: per trigger the driver walks only the feed's
  // GROWTH (header-only), and executors receive byte ranges exactly like
  // the split-index path — nothing scales with history size.
  def cdc58TailActive(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc58_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // closed bulk: three sink-written files, delivered complete up front
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    // the ACTIVE file: bounded fixture classes, byte-crafted because a
    // mid-event tear is precisely what the distributed sink refuses to
    // produce (cdc56's discipline; cap + bound logic shared via
    // CdcFixtures.boundedClass/TailFeedWriter)
    val (ta, tb, tc, td) = (boundedClass(base, "cdc58", 0),
      boundedClass(base, "cdc58", 1), boundedClass(base, "cdc58", 2),
      boundedClass(base, "cdc58", 3))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    val appendTail: Option[Array[Byte]] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty && td.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc, td))
        val (f, fdeOff) = w.newFile()
        // the clean fallback cut when txn B is empty: after A's commit
        // (or after the FDE when A is empty too)
        var cleanCut = fdeOff
        // txn A: committed entirely inside installment 1
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L, 8001L, ta)._2
        // txn B: rows in installment 1, XID only in the appended bytes
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 802L, 8002L, tb)._1 else cleanCut
        // txn C: committed, entirely in the appended bytes
        if (tc.nonEmpty) w.txn(f, 803L, 8003L, tc)
        // txn D: torn FOREVER — the file (and the fixture) end inside it
        if (td.nonEmpty) w.txn(f, 804L, 8004L, td, commit = false)
        val all = f.bytes
        // installment 1 tears 7 bytes into B's XID header when B exists,
        // else cleanly after A's commit
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        java.nio.file.Files.write(activeFile.toPath, all.slice(0, cut))
        Some(all.slice(cut, all.length))
      }
    // two AvailableNow runs on ONE checkpoint, the append in between;
    // batch 0's file(s) recorded for the injected redelivery
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    appendTail.foreach { tail =>
      java.nio.file.Files.write(activeFile.toPath, tail,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainTail()
    // injected crash-after-commit redelivery of batch 0 (a whole closed
    // file — byte-range batches replay through the checkpoint instead)
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_a")
        .when(col("k") % 131 === 1, "txn_b")
        .when(col("k") % 131 === 2, "txn_c").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  // cdc64 — ROTATION MID-TAIL (the one tail posture cdc58/cdc63 never
  // exercise: there the active file stays LAST forever; a real server
  // rotates — `FLUSH BINARY LOGS`, size limits — so the file a consumer
  // is mid-way through CLOSES and a new active file appears). The offset
  // seam under test: drain 1 leaves a MID-FILE committed frontier (plus
  // decoder seed state) inside mysql-bin.000500; between drains the
  // server completes the torn transaction, appends one more committed
  // transaction and a trailing ROTATE, and opens mysql-bin.000501 with
  // one committed and one forever-torn transaction. Drain 2 must (a)
  // consume 000500's remainder PAST the recorded frontier to EOF without
  // a walk (rotation closed it — MySQL never splits a transaction across
  // files), resuming the decoder from the checkpointed (pos, idx, ck)
  // seed; (b) emit the ROTATE event's file without rows (it is not DML);
  // (c) walk 000501 to its committed frontier, holding back the torn
  // tail; and a third, idle drain must be a NO-OP (nothing grew — a
  // quiet server must not re-emit). A batch-0 whole-file redelivery is
  // injected after everything (the cdc48 contract). Fixture classes
  // (k % 131): 0 = txn A committed in installment 1; 1 = txn B torn at
  // the cut (7 bytes into its XID header) and completed by the append;
  // 2 = txn C committed in the append, before the ROTATE; 3 = txn D
  // committed in the NEW file; 4 = txn E torn forever; bulk = the rest.
  // The oracle excludes exactly class 4 — a re-read of pre-frontier
  // bytes double-counts B, a frontier lost across the rotation drops C
  // or D, a leaked torn tail adds E: all hash mismatches. At 100 TB
  // rotation is the COMMON case (every binlog file ends with ROTATE);
  // the per-trigger cost stays one listing + a walk of the new bytes.
  def cdc64TailRotate(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc64_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // closed bulk: sink-written files, delivered complete up front
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 5)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (ta, tb, tc, td, te) = (boundedClass(base, "cdc64", 0),
      boundedClass(base, "cdc64", 1), boundedClass(base, "cdc64", 2),
      boundedClass(base, "cdc64", 3), boundedClass(base, "cdc64", 4))
    val file500 = new java.io.File(feed, "mysql-bin.000500")
    val file501 = new java.io.File(feed, "mysql-bin.000501")
    // (500's appended remainder, 501's full contents) — None on an empty
    // fixture (degenerate inputs: no active files at all)
    val rotation: Option[(Array[Byte], Array[Byte])] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty && td.isEmpty && te.isEmpty)
        None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc, td, te))
        // file 500: A committed | cut | B's XID, C committed, ROTATE
        val (f5, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f5, 801L, 8001L, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f5, 802L, 8002L, tb)._1 else cleanCut
        if (tc.nonEmpty) w.txn(f5, 803L, 8003L, tc)
        w.rotate(f5, "mysql-bin.000501")
        val all5 = f5.bytes
        // the installment-1 cut: 7 bytes INTO B's XID header (mid-event),
        // or cleanly after A's commit when B is empty
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all5.length.toLong)
          else cleanCut).toInt
        java.nio.file.Files.write(file500.toPath, all5.slice(0, cut))
        // file 501: D committed, E torn forever
        val (f6, _) = w.newFile()
        if (td.nonEmpty) w.txn(f6, 804L, 8004L, td)
        if (te.nonEmpty) w.txn(f6, 805L, 8005L, te, commit = false)
        Some((all5.slice(cut, all5.length), f6.bytes))
      }
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    var applied = 0L
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      applied += 1
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    rotation.foreach { case (rest500, bytes501) =>
      java.nio.file.Files.write(file500.toPath, rest500,
        java.nio.file.StandardOpenOption.APPEND)
      java.nio.file.Files.write(file501.toPath, bytes501)
    }
    drainTail()
    // the idle drain: a quiet server — no growth, so NO batch may run
    // (a re-emit would land a new batch id and double-count: a hash
    // mismatch; the counter makes the no-op explicit too)
    val beforeIdle = applied
    drainTail()
    require(applied == beforeIdle,
      s"idle tail drain must run no batches, ran ${applied - beforeIdle}")
    // injected crash-after-commit redelivery of batch 0
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_a")
        .when(col("k") % 131 === 1, "txn_b")
        .when(col("k") % 131 === 2, "txn_c")
        .when(col("k") % 131 === 3, "txn_d").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc64Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_a'
      |            WHEN k % 131 = 1 THEN 'txn_b'
      |            WHEN k % 131 = 2 THEN 'txn_c'
      |            WHEN k % 131 = 3 THEN 'txn_d'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 4
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc74 — GTID FAILOVER ACROSS THE SHARDED UNION (the composition
  // matrix's last live cell: cdc69/cdc72 prove N shards under one
  // checkpoint, cdc66/cdc70 prove one shard's failover against a
  // durable executed set — a real fleet has BOTH: any shard can fail
  // over to its replica at any time. Here both shards fail over
  // between two drains of ONE union-tail checkpoint: each replica
  // re-serves that shard's overlap transaction under the SAME
  // per-shard gtid (sids differ per shard — server A is 33.., server
  // B is 65..) in a higher-numbered, differently-framed file. The
  // consumer maintains ONE durable executed-set state for the whole
  // fleet (per-sid max gno, written exactly-once per batch alongside
  // the data — cdc70's fold, now fed by rows from BOTH shards in the
  // same batches), STOPS, recovers the per-sid marks from the state,
  // and discards post-failover rows covered by the set via cdc73's
  // broadcast join — sid-keyed, so the one filter serves every shard
  // without knowing which source a row rode in on. The batch-0
  // redelivery (a bulk file, routed to its shard) replays with the
  // marks ALREADY recovered: the file_seq guard keeps pre-failover
  // rows untouched, so the overwrite is bit-identical. Oracle
  // excludes exactly the torn class per shard: a set that blended
  // sids discards shard B's new txns with shard A's marks; a mark
  // that died with the process double-counts both overlaps; a
  // frontier crossing between shards re-serves whole files — all
  // hash mismatches. At 100 TB: one broadcast of |fleet sids| rows,
  // one hashed probe per event, and failover remains a per-shard
  // routine event that never pauses the other shards' ingestion.
  def cdc74GtidShardedFailover(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc74_", dir)
    root.mkdirs()
    val feedA = new java.io.File(root, "feed_a")
    val feedB = new java.io.File(root, "feed_b")
    val state = new java.io.File(root, "state").getPath
    val gtidState = new java.io.File(root, "gtid_state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // per-shard closed bulk, disjoint numbering (redelivery routing)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 0 && col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedA.getPath, rowsPerTxn = 50, fileSeqStart = 1)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 1 && col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedB.getPath, rowsPerTxn = 50, fileSeqStart = 101)
    val failoverSeq = 800L
    // per shard: (server file P+Q, replica file Q@50+R+S-torn) under
    // that shard's own server sid
    def craft(shard: Long): Option[(Array[Byte], Array[Byte])] = {
      val shardBase = base.filter(col("k") % 2 === shard)
      val (tp, tq, tr, ts) = (boundedClass(shardBase, s"cdc74/$shard", 0),
        boundedClass(shardBase, s"cdc74/$shard", 1),
        boundedClass(shardBase, s"cdc74/$shard", 2),
        boundedClass(shardBase, s"cdc74/$shard", 3))
      if (tp.isEmpty && tq.isEmpty && tr.isEmpty && ts.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(tp, tq, tr, ts),
          sid = (1 to 16).map(b => (b + 32 * (shard + 1)).toByte).toArray)
        val (fA, _) = w.newFile()
        if (tp.nonEmpty) w.txn(fA, 9001L, 17001L + shard, tp)
        if (tq.nonEmpty) w.txn(fA, 9002L, 17002L + shard, tq)
        val (fB, _) = w.newFile()
        if (tq.nonEmpty) w.txn(fB, 9002L, 17002L + shard, tq, perEvent = 50)
        if (tr.nonEmpty) w.txn(fB, 9003L, 17003L + shard, tr)
        if (ts.nonEmpty) w.txn(fB, 9004L, 17004L + shard, ts, commit = false)
        Some((fA.bytes, fB.bytes))
      }
    }
    val craftedA = craft(0)
    val craftedB = craft(1)
    // crafted names stay DISJOINT per shard (A: 500/800, B: 600/900 —
    // cdc72's discipline): the redelivery routes names back to feeds
    craftedA.foreach { case (a, _) => java.nio.file.Files.write(
      new java.io.File(feedA, "mysql-bin.000500").toPath, a) }
    craftedB.foreach { case (a, _) => java.nio.file.Files.write(
      new java.io.File(feedB, "mysql-bin.000600").toPath, a) }
    val gno = substring_index(col("gtid_next"), ":", -1).cast("long")
    // the recovered fleet-wide marks: None before the failover restart,
    // then a FROZEN broadcast (sid, exec_gno) table read from the state
    var marks: Option[DataFrame] = None
    val batch0 = new graft.streaming.Drains.UnionBatch0(
      Seq(feedA.getPath, feedB.getPath))
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      batch0.record(batch, id)
      val rows = batch.filter(col("event_type") === "WriteRowsEventV2")
        .localCheckpoint(true) // one decode: set agg + apply
      val kept = marks match {
        case None => rows
        case Some(m) => rows
          .withColumn("__sid", substring_index(col("gtid_next"), ":", 1))
          .join(broadcast(m), col("__sid") === col("sid"), "left")
          .filter(!(col("file_seq") >= failoverSeq &&
            col("exec_gno").isNotNull && gno <= col("exec_gno")))
      }
      ViewMaintenance.applyIdempotent(
        kept.select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
      // ONE durable executed set for the whole fleet: per-sid max gno
      // this batch, whichever shard the rows rode in on
      ViewMaintenance.applyIdempotent(
        rows.filter(col("gtid_next") =!= "")
          .select(substring_index(col("gtid_next"), ":", 1).as("sid"),
            gno.as("gno"))
          .groupBy("sid").agg(max(col("gno")).as("gno")),
        gtidState, id)
    }
    def drain(): Unit = graft.streaming.Drains.drainBinlogTailUnion(
      spark, Seq(feedA.getPath, feedB.getPath), ckpt)(applyBatch)
    // run 1: both servers healthy; the process then STOPS (marks still
    // live only in the state)
    drain()
    // BOTH shards fail over: each replica's file arrives (disjoint
    // names; both >= failoverSeq so the discard guard covers them)
    craftedA.foreach { case (_, b) => java.nio.file.Files.write(
      new java.io.File(feedA, "mysql-bin.000800").toPath, b) }
    craftedB.foreach { case (_, b) => java.nio.file.Files.write(
      new java.io.File(feedB, "mysql-bin.000900").toPath, b) }
    // the restarted consumer recovers the fleet's executed set FROM
    // THE STATE before resubscribing
    marks = Some(ViewMaintenance.readState(spark, gtidState,
        "sid STRING, gno BIGINT, batch_id BIGINT")
      .groupBy("sid").agg(max(col("gno")).as("exec_gno"))
      .localCheckpoint(true))
    drain()
    // injected batch-0 redelivery (bulk, pre-failover): the file_seq
    // guard keeps the recovered marks away from it — bit-identical
    if (batch0.nonEmpty)
      applyBatch(spark.read.format("binlog").load(batch0.paths: _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("shard", (col("k") % 2).cast("long"))
      .withColumn("src", when(col("k") % 131 === 0, "txn_p")
        .when(col("k") % 131 === 1, "txn_q")
        .when(col("k") % 131 === 2, "txn_r").otherwise("bulk"))
      .groupBy("shard", "src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("shard", "src")
  }

  val cdc74Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT k % 2 AS shard,
      |  CASE WHEN k % 131 = 0 THEN 'txn_p'
      |       WHEN k % 131 = 1 THEN 'txn_q'
      |       WHEN k % 131 = 2 THEN 'txn_r'
      |       ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // cdc73 — SNAPSHOT CUTOVER ON THE EXECUTED-GTID SET (the r14 verdict's
  // second task: cdc60's bootstrap discards by (file_seq, event_index) —
  // a PER-SERVER coordinate that dies on failover; cdc66/cdc70 proved
  // GTIDs are the durable identity. Composed: the day-1 bootstrap takes
  // its snapshot and records the executed-GTID SET — per-sid max gno,
  // persisted as a maintained state of its own, cdc70's durable-set
  // class — as THE cutover mark, no positional coordinate anywhere.
  // The backfill then subscribes from the beginning and discards every
  // wire row whose (sid, gno) the snapshot set covers, via a broadcast
  // join against the frozen set. Mid-backfill the source FAILS OVER:
  // the replica's higher-numbered file re-serves the overlap
  // transaction Q under the SAME gtid but different framing (rows
  // regrouped 100 → 50 per event) and position — the GTID mark
  // discards it; a positional mark recorded at snapshot time would
  // ADMIT it (higher file_seq) and double-count. The gate carries that
  // negative proof structurally: it counts the replica rows the
  // snapshot set discards but the snapshot position would admit, and
  // requires the count positive whenever Q exists. Two replays are
  // injected: batch 0 (entirely covered by the set — an EMPTY
  // partition overwrite) and the failover batch (partially discarded,
  // absorbed by its own overwrite; the frozen set keeps the filter
  // bit-for-bit deterministic). Shares cdc66's oracle: exactly the
  // torn class is excluded — a set that missed a sid discards too
  // little (bulk double-counts), a mark that died with the process
  // re-admits Q, an over-eager filter loses R; all hash mismatches.
  // At 100 TB the set is a few rows per sid broadcast to the scan —
  // one hashed lookup per event — and the bootstrap survives any
  // number of failovers because the mark never references a file.
  def cdc73GtidSetCutover(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc73_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val gtidState = new java.io.File(root, "gtid_state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // pre-snapshot history: bulk under the sink's sid, then server A's
    // last file (P, Q) — everything the snapshot will cover
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (tp, tq, tr, ts) = (boundedClass(base, "cdc73", 0),
      boundedClass(base, "cdc73", 1), boundedClass(base, "cdc73", 2),
      boundedClass(base, "cdc73", 3))
    // (no uuid formatting here: unlike cdc66/cdc70, the discard keys on
    // the raw per-sid set state, not on one hand-picked server's uuid)
    val sidA = (33 to 48).map(_.toByte).toArray
    val failoverSeq = 800L
    val crafted: Option[(Array[Byte], Array[Byte])] =
      if (tp.isEmpty && tq.isEmpty && tr.isEmpty && ts.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(tp, tq, tr, ts), sid = sidA)
        val (fA, _) = w.newFile()
        if (tp.nonEmpty) w.txn(fA, 9001L, 17001L, tp)
        if (tq.nonEmpty) w.txn(fA, 9002L, 17002L, tq)
        val (fB, _) = w.newFile()
        if (tq.nonEmpty) w.txn(fB, 9002L, 17002L, tq, perEvent = 50) // overlap
        if (tr.nonEmpty) w.txn(fB, 9003L, 17003L, tr)
        if (ts.nonEmpty) w.txn(fB, 9004L, 17004L, ts, commit = false)
        Some((fA.bytes, fB.bytes))
      }
    crafted.foreach { case (bytesA, _) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000500").toPath, bytesA)
    }
    val gno = substring_index(col("gtid_next"), ":", -1).cast("long")
    // THE SNAPSHOT: state₀ = everything currently in the feed, and the
    // executed-GTID set — per-sid max gno — persisted WITH it as its
    // own maintained state (the durable mark; no position recorded).
    // The positional high-water below is computed ONLY for the in-gate
    // negative proof that such a mark would break on failover.
    var posMark: Option[(Long, Long)] = None
    val hasFiles = Option(feed.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(f => f.isFile && !f.getName.startsWith("."))
    if (hasFiles) {
      val snap = spark.read.format("binlog").load(feed.getPath)
        .filter(col("event_type") === "WriteRowsEventV2")
        .localCheckpoint(true)
      ViewMaintenance.applyIdempotent(
        snap.select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, -1L)
      ViewMaintenance.applyIdempotent(
        snap.filter(col("gtid_next") =!= "")
          .select(substring_index(col("gtid_next"), ":", 1).as("sid"),
            gno.as("gno"))
          .groupBy("sid").agg(max(col("gno")).as("gno")),
        gtidState, -1L)
      val pm = snap.agg(max(struct(col("file_seq"), col("event_index")))).head()
      if (!pm.isNullAt(0)) {
        val r = pm.getStruct(0)
        posMark = Some((r.getLong(0), r.getLong(1)))
      }
    }
    // FAILOVER, before the backfill begins: the replica's file arrives
    // under a higher number, re-serving Q under the same gtid
    crafted.foreach { case (_, bytesB) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000800").toPath, bytesB)
    }
    // the backfill consumer recovers the mark FROM THE SET STATE (a
    // restart-survivable read, cdc70's discipline), frozen thereafter —
    // a tiny per-sid table broadcast into every batch's discard join
    val executed = ViewMaintenance.readState(spark, gtidState,
        "sid STRING, gno BIGINT, batch_id BIGINT")
      .groupBy("sid").agg(max(col("gno")).as("exec_gno"))
      .localCheckpoint(true)
    def keptRows(ev: DataFrame): DataFrame = ev
      .filter(col("event_type") === "WriteRowsEventV2")
      .withColumn("__sid", substring_index(col("gtid_next"), ":", 1))
      .join(broadcast(executed), col("__sid") === col("sid"), "left")
      .filter(col("exec_gno").isNull || gno > col("exec_gno"))
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    val failoverFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    var failoverId = -1L
    var failoverEnd = (0L, 0L) // the batch's recorded end position
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      if (failoverFiles.isEmpty) {
        // one bounded aggregate: does this batch carry replica rows,
        // and where does it END? (the replay below reconstructs the
        // batch from files, and must stop at the recorded end — a
        // whole-file read would include the torn tail the STREAM's
        // offset range correctly excluded)
        val f = batch.agg(
          max(when(col("file_seq") >= failoverSeq, 1).otherwise(0)),
          max(struct(col("file_seq"), col("event_index")))).head()
        if (!f.isNullAt(0) && f.getInt(0) == 1) {
          failoverFiles ++= batch.select(col("binlog_file")).distinct()
            .collect().map(_.getString(0))
          failoverId = id
          val e = f.getStruct(1)
          failoverEnd = (e.getLong(0), e.getLong(1))
        }
      }
      ViewMaintenance.applyIdempotent(
        keptRows(batch)
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    // the NEGATIVE proof: replica rows the GTID set discards but the
    // snapshot-time positional mark would ADMIT — the double-count a
    // positional bootstrap suffers on failover. Must exist whenever
    // the overlap transaction does. Guarded on `crafted`: a bulk-only
    // fixture sets posMark (bulk rows ARE the snapshot) but never
    // writes the replica file this block reads.
    if (crafted.isDefined) posMark.foreach { case (ms, mi) =>
      val admittedByPos = spark.read.format("binlog")
        .load(s"${feed.getPath}/mysql-bin.000800")
        .filter(col("event_type") === "WriteRowsEventV2")
        .withColumn("__sid", substring_index(col("gtid_next"), ":", 1))
        .join(broadcast(executed), col("__sid") === col("sid"), "left")
        .filter(col("exec_gno").isNotNull && gno <= col("exec_gno"))
        .filter(col("file_seq") > ms ||
          (col("file_seq") === ms && col("event_index") > mi))
        .count()
      require((admittedByPos > 0) == tq.nonEmpty,
        s"the positional mark must diverge from the GTID set exactly on " +
          s"the re-served overlap (got $admittedByPos admitted rows, " +
          s"overlap ${tq.length} keys)")
    }
    // injected replays: batch 0 (entirely covered by the set — an empty
    // overwrite) and the failover batch (partially discarded)
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    if (failoverFiles.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(failoverFiles.toSeq.map(f => s"${feed.getPath}/$f"): _*)
        .filter(col("file_seq") < failoverEnd._1 ||
          (col("file_seq") === failoverEnd._1 &&
            col("event_index") <= failoverEnd._2)),
        failoverId)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_p")
        .when(col("k") % 131 === 1, "txn_q")
        .when(col("k") % 131 === 2, "txn_r").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  // cdc72 — PURGE-SAFE × SHARDED UNION (the r14 verdict's top task: the
  // year-long N-shard deployment. cdc69 proved N growing feeds under ONE
  // checkpoint; cdc71 proved retention under suffix-keyed offsets —
  // composed here: one streaming query unions BOTH shards' purge-safe
  // tails, so the offset log carries one `{"seq":…}` line per source,
  // and each shard's retention deletes its own consumed files without
  // touching the other's frontier. The fixture is cdc69's shape (per-
  // shard closed bulk with disjoint numbering, one active file each with
  // a committed / torn-then-appended / torn-forever class mix); between
  // the two drains EVERY consumed bulk file on BOTH shards is purged
  // (structural requires pin that each listing really shrank to just its
  // active file) and both actives grow. Per-source observability rides
  // the same gate: after the final drain, BinlogTailOps.lagMetricsUnion
  // must report zero consumable lag on both shards and a held-back tail
  // exactly where a torn-forever class exists. Shares cdc69's oracle —
  // an offset that shifted with either shard's shrunken listing
  // re-serves or skips whole files; a lag pairing that crossed feeds
  // trips the requires; both are failures. At 100 TB this is N
  // subscriptions × years of retention on one checkpoint: per trigger
  // the driver pays one listing + growth walk per shard, and purges
  // stay a server-side policy on every shard independently.
  def cdc72PurgeShardedUnion(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc72_", dir)
    root.mkdirs()
    val feedA = new java.io.File(root, "feed_a")
    val feedB = new java.io.File(root, "feed_b")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // per-shard closed bulk, disjoint file numbering (redelivery routing)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 0 && col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedA.getPath, rowsPerTxn = 50, fileSeqStart = 1)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 1 && col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedB.getPath, rowsPerTxn = 50, fileSeqStart = 101)
    // one active file per shard: (installment 1, append, has-torn-class)
    // or None when the shard's live classes are all empty
    def craft(shard: Long): Option[(Array[Byte], Array[Byte], Boolean)] = {
      val shardBase = base.filter(col("k") % 2 === shard)
      val (ta, tb, tc) = (boundedClass(shardBase, s"cdc72/$shard", 0),
        boundedClass(shardBase, s"cdc72/$shard", 1),
        boundedClass(shardBase, s"cdc72/$shard", 2))
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc),
          sid = (1 to 16).map(b => (b + 16 * shard).toByte).toArray)
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L + shard, 8001L + shard, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 811L + shard, 8011L + shard, tb)._1
          else cleanCut
        if (tc.nonEmpty)
          w.txn(f, 821L + shard, 8021L + shard, tc, commit = false) // torn
        val all = f.bytes
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        Some((all.slice(0, cut), all.slice(cut, all.length), tc.nonEmpty))
      }
    }
    val craftedA = craft(0)
    val craftedB = craft(1)
    val activeA = new java.io.File(feedA, "mysql-bin.000500")
    val activeB = new java.io.File(feedB, "mysql-bin.000600")
    craftedA.foreach { case (i1, _, _) =>
      java.nio.file.Files.write(activeA.toPath, i1) }
    craftedB.foreach { case (i1, _, _) =>
      java.nio.file.Files.write(activeB.toPath, i1) }
    val batch0 = new graft.streaming.Drains.UnionBatch0(
      Seq(feedA.getPath, feedB.getPath))
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      batch0.record(batch, id)
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drain(): Unit = graft.streaming.Drains.drainBinlogPurgeTailUnion(
      spark, Seq(feedA.getPath, feedB.getPath), ckpt)(applyBatch)
    drain()
    // crash-after-commit redelivery happens BEFORE retention purges;
    // recorded names route back to their shard (disjoint numbering)
    if (batch0.nonEmpty)
      applyBatch(spark.read.format("binlog").load(batch0.paths: _*), 0L)
    // retention on BOTH shards: every consumed closed file vanishes —
    // each listing shrinks to just its active file, which shifts every
    // index under any index-keyed offset on either source
    def purge(feed: java.io.File, active: java.io.File,
        crafted: Option[_]): Unit = {
      Option(feed.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          f.getName != active.getName)
        .foreach(f => require(f.delete(), s"purge failed: $f"))
      val left = Option(feed.listFiles()).getOrElse(Array.empty[java.io.File])
        .count(f => f.isFile && !f.getName.startsWith("."))
      require(left == (if (crafted.isDefined) 1 else 0),
        s"the purge must leave only the active file in $feed, got $left")
    }
    purge(feedA, activeA, craftedA)
    purge(feedB, activeB, craftedB)
    // BOTH shards grow past the purge
    craftedA.foreach { case (_, i2, _) =>
      java.nio.file.Files.write(activeA.toPath, i2,
        java.nio.file.StandardOpenOption.APPEND) }
    craftedB.foreach { case (_, i2, _) =>
      java.nio.file.Files.write(activeB.toPath, i2,
        java.nio.file.StandardOpenOption.APPEND) }
    drain()
    // per-source lag: one row per shard, paired in union plan order —
    // a drained consumer has no consumable lag anywhere, and held-back
    // bytes appear exactly on the shards with a torn-forever class
    val lags = graft.sources.BinlogTailOps.lagMetricsUnion(
      spark, Seq(feedA.getPath, feedB.getPath), ckpt)
    lags.zip(Seq(craftedA, craftedB)).zipWithIndex.foreach {
      case ((lag, crafted), shard) =>
        require(lag.committedLagBytes == 0L,
          s"drained shard $shard must have zero consumable lag: $lag")
        val torn = crafted.exists(_._3)
        require((lag.heldBackBytes > 0L) == torn,
          s"shard $shard held-back bytes must track its torn-forever " +
            s"class (torn=$torn): $lag")
    }
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("shard", (col("k") % 2).cast("long"))
      .withColumn("src", when(col("k") % 131 === 0, "live_committed")
        .when(col("k") % 131 === 1, "live_appended").otherwise("bulk"))
      .groupBy("shard", "src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("shard", "src")
  }

  // cdc71 — BINLOG RETENTION: PURGE-SAFE TAIL (every other streaming
  // posture — count-based AND plain tail — keys its offsets by INDEX
  // into the directory listing, so the watched dir must stay
  // append-only for the checkpoint's whole life. A real server runs
  // `PURGE BINARY LOGS` / expire_logs_days: old consumed files VANISH.
  // `purgeSafe=true` keys offsets by the file's own numeric suffix —
  // MySQL's native (file, pos) coordinate — so retention below the
  // committed frontier is invisible to the consumer). The gate: drain
  // the feed (closed bulk + an active file whose txn B is torn 7 bytes
  // into its XID header); inject the batch-0 redelivery (crash-after-
  // commit happens BEFORE retention); then DELETE every bulk file —
  // the listing shrinks to just the active file, which shifts every
  // index-based offset and is exactly what the suffix-keyed form must
  // not notice; append B's completion, committed C, torn-forever D;
  // drain again. A structural require pins that the purge really
  // happened (one file left on disk). Oracle excludes exactly the torn
  // class: an offset that shifted with the listing re-serves or skips
  // whole files — either is a hash mismatch. At 100 TB this is the
  // difference between a consumer that runs for a week and one that
  // runs for years: retention stays a server-side policy, not a
  // stream-breaking event.
  def cdc71TailPurge(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    import graft.streaming.Drains.drainBinlogPurgeTail
    val root = tmpFixtureDir("graft_cdc71_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (ta, tb, tc, td) = (boundedClass(base, "cdc71", 0),
      boundedClass(base, "cdc71", 1), boundedClass(base, "cdc71", 2),
      boundedClass(base, "cdc71", 3))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    val appendTail: Option[Array[Byte]] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty && td.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc, td))
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L, 8001L, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 802L, 8002L, tb)._1 else cleanCut
        if (tc.nonEmpty) w.txn(f, 803L, 8003L, tc)
        if (td.nonEmpty) w.txn(f, 804L, 8004L, td, commit = false) // torn
        val all = f.bytes
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        java.nio.file.Files.write(activeFile.toPath, all.slice(0, cut))
        Some(all.slice(cut, all.length))
      }
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    drainBinlogPurgeTail(spark, feed.getPath, ckpt)(applyBatch)
    // crash-after-commit redelivery happens BEFORE retention purges
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    // retention: every consumed closed file vanishes; only the active
    // file survives — every index-based offset just shifted
    Option(feed.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        f.getName != activeFile.getName)
      .foreach(f => require(f.delete(), s"purge failed: $f"))
    if (appendTail.isDefined) {
      val left = Option(feed.listFiles()).getOrElse(Array.empty[java.io.File])
        .count(f => f.isFile && !f.getName.startsWith("."))
      require(left == 1, s"the purge must leave only the active file, $left")
    }
    appendTail.foreach { tail =>
      java.nio.file.Files.write(activeFile.toPath, tail,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainBinlogPurgeTail(spark, feed.getPath, ckpt)(applyBatch)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_a")
        .when(col("k") % 131 === 1, "txn_b")
        .when(col("k") % 131 === 2, "txn_c").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc71Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_a'
      |            WHEN k % 131 = 1 THEN 'txn_b'
      |            WHEN k % 131 = 2 THEN 'txn_c'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc69 — SHARDED MULTI-SOURCE TAIL (the scale-out ingest shape: a
  // fleet of database SHARDS, each with its own growing binlog, tailed
  // by ONE streaming query into ONE maintained state on ONE checkpoint.
  // Spark's offset log carries one offset line per source per batch, so
  // each shard keeps its own (file, byte-frontier) progress and its own
  // torn-tail holdback independently — shard A's torn transaction must
  // not stall shard B's committed one, and a restart seam must resume
  // BOTH frontiers). The fixture shards the table by k % 2; each shard
  // gets sink-written closed bulk (its k % 131 >= 3 rows) plus one
  // byte-crafted active file: class 0 committed before drain 1, class 1
  // torn at drain 1 (cut 7 bytes into its XID header) and completed by
  // the append, class 2 torn forever — BOTH shards' active files grow
  // between the two AvailableNow runs. File numbering is disjoint per
  // shard (bulk 1.. vs 101.., active 500 vs 600) so the injected
  // batch-0 redelivery can route recorded file names back to their
  // shard's directory. The oracle excludes exactly class 2 on both
  // shards, grouped by (shard, class): a shard whose frontier stalled
  // or crossed into the other's offsets, a torn row leaked from either
  // active file, or a replay absorbed into the wrong shard's rows are
  // all hash mismatches. At 100 TB this is N subscriptions' worth of
  // ingest under one checkpoint: per trigger the driver does one
  // listing + growth walk PER SHARD, and the union is plan-level —
  // no extra shuffle before the apply.
  def cdc69ShardedUnion(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc69_", dir)
    root.mkdirs()
    val feedA = new java.io.File(root, "feed_a")
    val feedB = new java.io.File(root, "feed_b")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // per-shard closed bulk, disjoint file numbering
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 0 && col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedA.getPath, rowsPerTxn = 50, fileSeqStart = 1)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 2 === 1 && col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(2, col("k")),
      feedB.getPath, rowsPerTxn = 50, fileSeqStart = 101)
    // one active file per shard: (installment 1, append) or None when
    // the shard's live classes are all empty; each shard writes under
    // its own server uuid
    def craft(shard: Long): Option[(Array[Byte], Array[Byte])] = {
      val shardBase = base.filter(col("k") % 2 === shard)
      val (ta, tb, tc) = (boundedClass(shardBase, s"cdc69/$shard", 0),
        boundedClass(shardBase, s"cdc69/$shard", 1),
        boundedClass(shardBase, s"cdc69/$shard", 2))
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc),
          sid = (1 to 16).map(b => (b + 16 * shard).toByte).toArray)
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L + shard, 8001L + shard, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 811L + shard, 8011L + shard, tb)._1
          else cleanCut
        if (tc.nonEmpty)
          w.txn(f, 821L + shard, 8021L + shard, tc, commit = false) // torn
        val all = f.bytes
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        Some((all.slice(0, cut), all.slice(cut, all.length)))
      }
    }
    val craftedA = craft(0)
    val craftedB = craft(1)
    val activeA = new java.io.File(feedA, "mysql-bin.000500")
    val activeB = new java.io.File(feedB, "mysql-bin.000600")
    craftedA.foreach { case (i1, _) =>
      java.nio.file.Files.write(activeA.toPath, i1) }
    craftedB.foreach { case (i1, _) =>
      java.nio.file.Files.write(activeB.toPath, i1) }
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drain(): Unit = graft.streaming.Drains.drainBinlogTailUnion(
      spark, Seq(feedA.getPath, feedB.getPath), ckpt)(applyBatch)
    drain()
    // BOTH shards grow between the runs
    craftedA.foreach { case (_, i2) =>
      java.nio.file.Files.write(activeA.toPath, i2,
        java.nio.file.StandardOpenOption.APPEND) }
    craftedB.foreach { case (_, i2) =>
      java.nio.file.Files.write(activeB.toPath, i2,
        java.nio.file.StandardOpenOption.APPEND) }
    drain()
    // injected batch-0 redelivery: recorded names route back to their
    // shard's directory (disjoint numbering makes this unambiguous)
    if (batch0Files.nonEmpty) {
      val paths = batch0Files.toSeq.map { f =>
        val inA = new java.io.File(feedA, f)
        if (inA.isFile) inA.getPath else new java.io.File(feedB, f).getPath
      }
      applyBatch(spark.read.format("binlog").load(paths: _*), 0L)
    }
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("shard", (col("k") % 2).cast("long"))
      .withColumn("src", when(col("k") % 131 === 0, "live_committed")
        .when(col("k") % 131 === 1, "live_appended").otherwise("bulk"))
      .groupBy("shard", "src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("shard", "src")
  }

  val cdc69Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT k % 2 AS shard,
      |  CASE WHEN k % 131 = 0 THEN 'live_committed'
      |       WHEN k % 131 = 1 THEN 'live_appended'
      |       ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 2
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // cdc68 — IN-PLACE CHECKPOINT UPGRADE, count-based → tailActive (how
  // an EXISTING deployment adopts tailing: every count-based consumer
  // built since cdc12 owns a checkpoint whose offsets say "N whole
  // files consumed" — `{"n":N}`. Re-snapshotting a 100 TB table to
  // switch sources is exactly the cost the tail mode exists to avoid,
  // so TailOffset.fromJson accepts the count-based form directly,
  // defaulting the missing byte-frontier fields to 0: N whole files,
  // frontier at the start of file N — semantically exact, because the
  // count-based source consumes whole files only. The reverse
  // (tail → count with a MID-FILE pos) is rejected loudly by the
  // count-based parser — silently reading just `n` would re-serve the
  // consumed prefix. The gate: run 1 drains the closed bulk with the
  // COUNT-BASED source (the existing deployment); the active file then
  // appears and run 2 flips tailActive=true on the SAME checkpoint —
  // batch ids continue, txn A lands, torn txn B is held; the append
  // completes B and tears C forever; run 3 (still tailing) lands B and
  // holds C; the recorded batch-0 bulk file is redelivered after
  // everything. Oracle excludes exactly the torn class: a re-served
  // bulk file (an upgrade that reset the offset) double-counts, a
  // dropped installment loses B — hash mismatches either way.
  def cdc68CheckpointUpgrade(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc68_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (ta, tb, tc) = (boundedClass(base, "cdc68", 0),
      boundedClass(base, "cdc68", 1), boundedClass(base, "cdc68", 2))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    // (installment for run 2: A committed + B torn; append for run 3:
    // B's completion + C torn forever)
    val crafted: Option[(Array[Byte], Array[Byte])] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc))
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L, 8001L, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 802L, 8002L, tb)._1 else cleanCut
        if (tc.nonEmpty) w.txn(f, 803L, 8003L, tc, commit = false) // torn
        val all = f.bytes
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        Some((all.slice(0, cut), all.slice(cut, all.length)))
      }
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    // run 1: the EXISTING deployment — count-based source, closed bulk
    drainBinlogFeed(spark, feed.getPath, ckpt)(applyBatch)
    // the active file appears; the deployment upgrades IN PLACE
    crafted.foreach { case (inst1, _) =>
      java.nio.file.Files.write(activeFile.toPath, inst1)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    crafted.foreach { case (_, inst2) =>
      java.nio.file.Files.write(activeFile.toPath, inst2,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainTail()
    // injected crash-after-commit redelivery of batch 0 (a bulk file
    // consumed under the OLD source — the upgrade must not disturb its
    // partition's absorbability)
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_a")
        .when(col("k") % 131 === 1, "txn_b").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc68Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_a'
      |            WHEN k % 131 = 1 THEN 'txn_b'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc67 — TAIL LAG OBSERVABILITY (the surface an operator actually
  // alerts on: every tail gate so far proves the torn tail is held back;
  // none lets anyone SEE it. BinlogTailOps.lagMetrics reads the
  // consumer's own checkpoint out-of-band — last committed offset from
  // Spark's offset log — and splits naive `EOF - offset` lag into
  // consumable committedLagBytes vs correctly-held heldBackBytes, with
  // the frontier's (file, event_index) exposed so the held tail can be
  // INSPECTED). The gate makes observability falsifiable: after cdc58's
  // drains (bulk + active file with a committed / torn-then-completed /
  // appended-committed / torn-forever class mix), it requires
  // committedLagBytes == 0 (a drained consumer has no consumable lag)
  // and then DECODES the held-back tail — a batch read of the frontier
  // file filtered to event_index >= frontierIdx — and emits it NEXT TO
  // the served state. The oracle is the feed's FULL partition with NO
  // exclusion: every row is either served (its class) or observably
  // held ('held_back' = exactly the torn-forever class). A frontier
  // index off by one event leaks the last committed transaction into
  // held_back; a lag computation that conflates the two misses rows
  // entirely — both hash mismatches. At 100 TB the metric is one
  // listing + one offset read + a header walk of the new bytes,
  // driver-side, callable while the stream runs.
  def cdc67TailLag(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc67_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (ta, tb, tc, td) = (boundedClass(base, "cdc67", 0),
      boundedClass(base, "cdc67", 1), boundedClass(base, "cdc67", 2),
      boundedClass(base, "cdc67", 3))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    val appendTail: Option[Array[Byte]] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty && td.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc, td))
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L, 8001L, ta)._2
        val afterBRows =
          if (tb.nonEmpty) w.txn(f, 802L, 8002L, tb)._1 else cleanCut
        if (tc.nonEmpty) w.txn(f, 803L, 8003L, tc)
        if (td.nonEmpty) w.txn(f, 804L, 8004L, td, commit = false) // torn
        val all = f.bytes
        val cut = (if (tb.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        java.nio.file.Files.write(activeFile.toPath, all.slice(0, cut))
        Some(all.slice(cut, all.length))
      }
    def applyBatch(batch: DataFrame, id: Long): Unit =
      ViewMaintenance.applyIdempotent(
        batch.filter(col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    appendTail.foreach { tail =>
      java.nio.file.Files.write(activeFile.toPath, tail,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainTail()
    // the observability surface under test
    val lag = graft.sources.BinlogTailOps.lagMetrics(spark, feed.getPath, ckpt)
    require(lag.committedLagBytes == 0L,
      s"a drained consumer must have zero consumable lag, got $lag")
    require(appendTail.isEmpty || lag.heldBackBytes > 0L == td.nonEmpty,
      s"held-back bytes must track the torn-forever class exactly: $lag")
    // decode the held tail from the frontier the metric exposes: these
    // rows were never applied — together with the state they must
    // partition the feed exactly
    val held: DataFrame =
      if (lag.frontierFile.isEmpty || lag.heldBackBytes == 0L)
        spark.emptyDataFrame.select(lit(0L).as("k")).limit(0)
      else
        spark.read.format("binlog")
          .load(s"${feed.getPath}/${lag.frontierFile}")
          .filter(col("event_index") >= lag.frontierIdx &&
            col("event_type") === "WriteRowsEventV2")
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k"))
    val served = ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .select(col("k"),
        when(col("k") % 131 === 0, "txn_a")
          .when(col("k") % 131 === 1, "txn_b")
          .when(col("k") % 131 === 2, "txn_c").otherwise("bulk").as("src"))
    served.unionByName(held.select(col("k"), lit("held_back").as("src")))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc67Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_a'
      |            WHEN k % 131 = 1 THEN 'txn_b'
      |            WHEN k % 131 = 2 THEN 'txn_c'
      |            WHEN k % 131 = 3 THEN 'held_back'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc70 — DURABLE EXECUTED-GTID SET, FAILOVER ACROSS A RESTART
  // (cdc66's deliberate weakness made durable: there the executed
  // high-water lives in a driver variable, which is exactly what a
  // crash loses — a real consumer persists its executed set WITH its
  // data so the failover mark survives. Here the set is a maintained
  // state of its own — per-sid max gno, the idempotent-maxima fold
  // class cdc62 proved through compaction — written exactly-once per
  // batch alongside the data state). Run 1 drains server A's feed,
  // landing (sid, max gno) per batch; the process STOPS (the driver
  // variable dies with it); the replica's higher-numbered file arrives,
  // re-serving the overlap transaction under the same GTID; run 2
  // resumes the SAME checkpoint and reads the failover mark FROM THE
  // STATE — max gno for A's uuid — before its first batch, then
  // discards re-served (sid, gno ≤ mark) rows positionally below the
  // replica's file_seq boundary. The injected batch-0 redelivery after
  // run 2 must be absorbed by BOTH states (data: partition overwrite;
  // set: max is idempotent). Shares cdc66's oracle — a mark that died
  // with the process double-counts the overlap; a set state that
  // missed a batch discards too little; both hash mismatches. At
  // 100 TB the set state is a few rows per batch and compacts under
  // the register-max fold.
  def cdc70GtidDurable(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc70_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val gtidState = new java.io.File(root, "gtid_state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (tp, tq, tr, ts) = (boundedClass(base, "cdc70", 0),
      boundedClass(base, "cdc70", 1), boundedClass(base, "cdc70", 2),
      boundedClass(base, "cdc70", 3))
    val sidA = (33 to 48).map(_.toByte).toArray
    val uuidA = {
      val h = sidA.map(b => f"${b & 0xff}%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20)}"
    }
    val failoverSeq = 800L
    val crafted: Option[(Array[Byte], Array[Byte])] =
      if (tp.isEmpty && tq.isEmpty && tr.isEmpty && ts.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(tp, tq, tr, ts), sid = sidA)
        val (fA, _) = w.newFile()
        if (tp.nonEmpty) w.txn(fA, 9001L, 17001L, tp)
        if (tq.nonEmpty) w.txn(fA, 9002L, 17002L, tq)
        val (fB, _) = w.newFile()
        if (tq.nonEmpty) w.txn(fB, 9002L, 17002L, tq, perEvent = 50) // overlap
        if (tr.nonEmpty) w.txn(fB, 9003L, 17003L, tr)
        if (ts.nonEmpty) w.txn(fB, 9004L, 17004L, ts, commit = false)
        Some((fA.bytes, fB.bytes))
      }
    crafted.foreach { case (bytesA, _) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000500").toPath, bytesA)
    }
    val gno = substring_index(col("gtid_next"), ":", -1).cast("long")
    // the recovered failover mark: read at run-2 start from the SET
    // STATE, not from any in-memory variable (None before failover)
    var recoveredMark: Option[Long] = None
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      val rows = batch.filter(col("event_type") === "WriteRowsEventV2")
        .localCheckpoint(true)
      val reServed = recoveredMark match {
        case Some(g) => col("file_seq") >= failoverSeq &&
          col("gtid_next").startsWith(uuidA + ":") && gno <= g
        case None => lit(false)
      }
      ViewMaintenance.applyIdempotent(
        rows.filter(!reServed)
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
      // the DURABLE executed set: per-sid max gno this batch, written
      // exactly-once next to the data (the idempotent-maxima fold class)
      ViewMaintenance.applyIdempotent(
        rows.filter(col("gtid_next") =!= "")
          .select(substring_index(col("gtid_next"), ":", 1).as("sid"),
            gno.as("gno"))
          .groupBy("sid").agg(max(col("gno")).as("gno")),
        gtidState, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    // run 1: server A; the process then STOPS (nothing survives in
    // memory — recoveredMark is still None)
    drainTail()
    // failover: the replica's file arrives; the restarted consumer
    // recovers its executed set FROM THE STATE before subscribing
    crafted.foreach { case (_, bytesB) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000800").toPath, bytesB)
    }
    val markRow = ViewMaintenance.readState(spark, gtidState,
        "sid STRING, gno BIGINT, batch_id BIGINT")
      .filter(col("sid") === uuidA)
      .agg(max(col("gno"))).head()
    recoveredMark = if (markRow.isNullAt(0)) None else Some(markRow.getLong(0))
    drainTail()
    // injected batch-0 redelivery: both states must absorb it
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_p")
        .when(col("k") % 131 === 1, "txn_q")
        .when(col("k") % 131 === 2, "txn_r").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  // cdc66 — GTID-IDENTITY FAILOVER (the reason GTIDs exist: byte
  // positions are PER-SERVER — after a failover the consumer points at a
  // replica whose binlog files have different numbers and different
  // event framing, and the only durable identity is the executed GTID
  // set. cdc60/cdc65 cut over POSITIONALLY, which is exactly what breaks
  // here). The posture: drain server A's feed, tracking the executed
  // high-water gno for A's server-uuid from each batch (the consumer's
  // own executed-GTID set — one bounded 1-row aggregate per batch, the
  // same class as cdc60's straddle flags); at failover RECORD it once
  // (frozen — the cutover mark, cdc60's discipline transplanted from
  // positions to GTIDs); then the replica's file arrives under a HIGHER
  // file number (the watched-dir append-only contract holds across
  // failover) re-serving an overlap transaction under the SAME gtid but
  // a DIFFERENT event framing (rows regrouped 100 → 50 per event — the
  // replica's own batching), plus new transactions. The apply discards
  // post-failover rows whose (sid = A's uuid, gno ≤ recorded mark) —
  // one codegen'd comparison on the decoder's gtid_next column, fully
  // deterministic, so the injected batch-0 redelivery replays
  // bit-for-bit (the filter doesn't touch pre-failover file_seqs).
  // Fixture classes (k % 131): 0 = txn P (gno 9001, server A); 1 = txn
  // Q (gno 9002, served by BOTH servers — the overlap that must count
  // ONCE); 2 = txn R (gno 9003, replica-only); 3 = txn S (gno 9004,
  // torn forever on the replica); bulk = sink-written history under the
  // sink's own server-uuid (a second sid in the set — per-sid
  // high-waters must not mix, or the sink's gnos would swallow the
  // replica's). The oracle excludes exactly class 3: a positional
  // consumer double-counts Q; a set that mixes sids discards R; a
  // leaked torn tail adds S — all hash mismatches. At 100 TB failover
  // is routine; the filter is one comparison per event and the
  // executed-set tracking one tiny aggregate per batch.
  def cdc66GtidFailover(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc66_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // server A's closed history: the sink's own sid (a SECOND server
    // uuid in the executed set)
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 4)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(3, col("k")),
      feed.getPath, rowsPerTxn = 50)
    val (tp, tq, tr, ts) = (boundedClass(base, "cdc66", 0),
      boundedClass(base, "cdc66", 1), boundedClass(base, "cdc66", 2),
      boundedClass(base, "cdc66", 3))
    // server A's uuid: sid bytes 33..48 (distinct from the sink's 1..16)
    val sidA = (33 to 48).map(_.toByte).toArray
    val uuidA = {
      val h = sidA.map(b => f"${b & 0xff}%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20)}"
    }
    val failoverSeq = 800L
    // the two byte-crafted files: A's last (P, Q @100 rows/event) and
    // the replica's first (Q again @50 rows/event, R, S torn) — None on
    // an empty fixture
    val crafted: Option[(Array[Byte], Array[Byte])] =
      if (tp.isEmpty && tq.isEmpty && tr.isEmpty && ts.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(tp, tq, tr, ts), sid = sidA)
        val (fA, _) = w.newFile()
        if (tp.nonEmpty) w.txn(fA, 9001L, 17001L, tp)
        if (tq.nonEmpty) w.txn(fA, 9002L, 17002L, tq)
        val (fB, _) = w.newFile()
        if (tq.nonEmpty) w.txn(fB, 9002L, 17002L, tq, perEvent = 50) // overlap
        if (tr.nonEmpty) w.txn(fB, 9003L, 17003L, tr)
        if (ts.nonEmpty) w.txn(fB, 9004L, 17004L, ts, commit = false)
        Some((fA.bytes, fB.bytes))
      }
    crafted.foreach { case (bytesA, _) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000500").toPath, bytesA)
    }
    // the consumer's executed-GTID high-water for A's uuid, tracked per
    // batch while on server A, FROZEN at failover (the recorded mark)
    var executedG = -1L
    var frozen = false
    val gno = substring_index(col("gtid_next"), ":", -1).cast("long")
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      val rows = batch.filter(col("event_type") === "WriteRowsEventV2")
        .localCheckpoint(true) // one decode: the set agg + the apply
      if (!frozen) {
        val g = rows.filter(col("gtid_next").startsWith(uuidA + ":"))
          .agg(max(gno)).head()
        if (!g.isNullAt(0)) executedG = math.max(executedG, g.getLong(0))
      }
      // the failover discard: replica file, A's sid, already executed
      val reServed = col("file_seq") >= failoverSeq &&
        col("gtid_next").startsWith(uuidA + ":") && gno <= executedG
      ViewMaintenance.applyIdempotent(
        rows.filter(!reServed)
          .select(explode(col("row_images")).as("img"))
          .select(element_at(col("img"), 1).cast("long").as("k")),
        state, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    frozen = true // failover: record the executed set ONCE
    crafted.foreach { case (_, bytesB) =>
      java.nio.file.Files.write(
        new java.io.File(feed, "mysql-bin.000800").toPath, bytesB)
    }
    drainTail()
    // injected crash-after-commit redelivery of batch 0 (pre-failover —
    // the discard filter must leave it untouched, bit-for-bit)
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    ViewMaintenance.readState(spark, state, "k BIGINT, batch_id BIGINT")
      .withColumn("src", when(col("k") % 131 === 0, "txn_p")
        .when(col("k") % 131 === 1, "txn_q")
        .when(col("k") % 131 === 2, "txn_r").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc66Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_p'
      |            WHEN k % 131 = 1 THEN 'txn_q'
      |            WHEN k % 131 = 2 THEN 'txn_r'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc59 — COMPACTION × RESTART COMPOSITION (the seam cdc51 and cdc53
  // each prove alone: cdc51 compacts mid-drain, cdc53 restarts mid-drain;
  // a year-long deployment does BOTH on one checkpoint). Run 1 drains the
  // first half of the feed and compacts at batch 1 (seeds −1/−2 + batch 0
  // fold into a base snapshot); the query stops; the rest of the feed
  // arrives; run 2 resumes from the SAME checkpoint — its batch ids must
  // continue ABOVE the base (a restarted counter would land batch 0's id
  // again and the live rule would silently ignore real data); finally the
  // recorded batch-0 file is re-applied AFTER the restart — a COVERED
  // batch redelivered across both seams at once, absorbed by the
  // read-side live rule, not by partition overwrite. Shares q66's oracle:
  // reprocessed files, restarted counters, a base that swallowed too
  // much, and unabsorbed covered replays are all hash mismatches. The
  // composition is free by construction (the live rule is a read-side
  // filter; the checkpoint never learns compaction happened) — this gate
  // PROVES it, per the r13 verdict.
  def cdc59CompactRestartIvm(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc59_", dir)
    root.mkdirs()
    val staging = new java.io.File(root, "staging").getPath
    val feed = new java.io.File(root, "feed").getPath
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val fx = ivmFixture(spark, dir)
    graft.ingest.BinlogSink.writeKeyedStrings(
      fx.aDelta.repartition(4, col("o_orderkey")), staging)
    val bPrime = fx.bBase.unionByName(fx.bDelta).localCheckpoint(true)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bBase), state, -1L)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bDelta), state, -2L)
    val stateSchema =
      "o_orderpriority STRING, cents BIGINT, n BIGINT, batch_id BIGINT"
    def foldPartials(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))
    graft.streaming.Drains.drainBinlogRestartWithRedelivery(
        spark, staging, feed, ckpt) { (batch, id) =>
      ViewMaintenance.applyIdempotent(
        fx.partials(decodeIvmDelta(batch), bPrime), state, id)
      if (id == 1L) // RUN 1, mid-drain: seeds + batch 0 fold into a base
        ViewMaintenance.compact(spark, state, stateSchema, upto = 0L)(foldPartials)
    }
    ivmReport(fx,
      ViewMaintenance.readState(spark, state, stateSchema).drop("batch_id"))
  }

  // cdc60 — SNAPSHOT-BOOTSTRAP → STREAM CUTOVER AT A RECORDED POSITION
  // (the Datastream day-1 posture, the r13 verdict's third task): a new
  // CDC consumer bulk-loads the table's current contents as state₀,
  // records the binlog position the snapshot corresponds to, then
  // subscribes to the feed FROM THE BEGINNING — and must DISCARD every
  // wire event at or before the mark with a POSITIONAL filter
  // ((file_seq, event_index) — binlog positions are event boundaries),
  // not rely on idempotence: the snapshot rows and the pre-mark wire
  // rows are the same data, but they land under different batch ids, so
  // an unfiltered replay would double-count. The mark deliberately falls
  // MID-FILE (the data-derived median event index of the middle file),
  // so one batch straddles it — the true cutover batch, partially
  // discarded. Two replays are injected: batch 0 (entirely pre-mark —
  // its redelivery must produce an EMPTY partition overwrite, proving
  // the discard path is replay-safe) and the straddling cutover batch
  // (absorbed by its own partition overwrite, the cdc48 contract). The
  // oracle is the full batch apply: an off-by-one in the positional
  // comparison (>= for >) double-counts the mark event's rows; an
  // over-eager filter loses post-mark rows — both hash mismatches. At
  // 100 TB the filter is one codegen'd comparison per event, and the
  // bulk snapshot never rides the wire at all.
  def cdc60SnapshotCutover(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val (feed, state, ckpt) = streamDirs("graft_cdc60_", dir)
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    graft.ingest.BinlogSink.writeChanges(
      base.select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(4, col("k")),
      feed, rowsPerTxn = 50)
    // the recorded position: the data-derived median row-event index of
    // the MIDDLE file — a mark no file boundary aligns with
    val files = Option(new java.io.File(feed).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq
    val (markSeq, markIdx) =
      if (files.isEmpty) (0L, -1L)
      else {
        val markFile = files((files.length - 1) / 2)
        val mi = spark.read.format("binlog").load(s"$feed/$markFile")
          .filter(col("event_type") === "WriteRowsEventV2")
          .agg(min(col("event_index")), max(col("event_index"))).head()
        val seq = "\\.(\\d+)$".r.findFirstMatchIn(markFile).get.group(1).toLong
        if (mi.isNullAt(0)) (seq, -1L)
        else (seq, (mi.getLong(0) + mi.getLong(1)) / 2)
      }
    val atOrBeforeMark = col("file_seq") < markSeq ||
      (col("file_seq") === markSeq && col("event_index") <= markIdx)
    def rows(ev: DataFrame): DataFrame = ev
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(col("file_seq"), col("event_index"),
        explode(col("row_images")).as("img"))
      .select(col("file_seq"), col("event_index"),
        element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
    // state₀: the bulk snapshot AS OF the mark (the batch-side apply of
    // everything at-or-before it) — in a real deployment this is the
    // table dump; here it is reconstructed from the same wire so the
    // oracle covers both paths
    if (files.nonEmpty)
      ViewMaintenance.applyIdempotent(
        rows(spark.read.format("binlog").load(feed)).filter(atOrBeforeMark)
          .select("k", "v"),
        state, -1L)
    // the cutover drain: subscribe from the BEGINNING, discard at-or-
    // before-mark POSITIONALLY, land the rest exactly-once; record the
    // straddling batch for the second injected replay
    val straddleFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    var straddleId = -1L
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      val r = rows(batch).localCheckpoint(true) // one decode, two probes
      if (straddleFiles.isEmpty) {
        // one aggregate decides "does this batch straddle the mark"
        val flags = r.agg(
          max(when(atOrBeforeMark, 1).otherwise(0)).as("pre"),
          max(when(atOrBeforeMark, 0).otherwise(1)).as("post")).head()
        if (!flags.isNullAt(0) && flags.getInt(0) == 1 && flags.getInt(1) == 1) {
          straddleFiles ++= batch.select(col("binlog_file")).distinct()
            .collect().map(_.getString(0))
          straddleId = id
        }
      }
      ViewMaintenance.applyIdempotent(
        r.filter(!atOrBeforeMark).select("k", "v"), state, id)
    }
    drainWithRedelivery(spark, feed, ckpt)(applyBatch)
    // injected replay (b): the straddling cutover batch (replay (a),
    // batch 0 — entirely pre-mark — is the scaffold's)
    if (straddleFiles.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(straddleFiles.toSeq.map(f => s"$feed/$f"): _*), straddleId)
    ViewMaintenance.readState(spark, state, "k BIGINT, v STRING, batch_id BIGINT")
      .groupBy((col("k") % 10).as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(length(col("v"))).as("payload_sum"))
      .orderBy("grp")
  }

  // cdc65 — SNAPSHOT BOOTSTRAP → LIVE-TAIL CUTOVER (cdc60's Datastream
  // day-1 posture composed with cdc58's growing active file — the two
  // halves of how a real consumer actually starts: bulk-load the table
  // as state₀ at a recorded (file_seq, event_index) position, then TAIL
  // the live, growing binlog from the beginning, discarding at-or-before
  // the mark POSITIONALLY. cdc60 proved the discard over closed files;
  // here the feed's last file keeps GROWING while the subscription is
  // live, so the discard must compose with byte-frontier offsets: the
  // cutover batch is a whole closed file (byte-frontier batches complete
  // closed files whole), the active file's batches are growth-sized byte
  // ranges whose event_index continues from the checkpointed decoder
  // seed — a broken seed would mis-number events and the positional
  // filter would discard live rows. The mark: the data-derived median
  // row-event index of the middle CLOSED file; the active file (classes
  // k % 131 = 0 committed before drain 1, 1 committed by the append, 2
  // torn forever) is entirely post-mark. Replays injected: batch 0
  // (entirely pre-mark — must land an EMPTY partition overwrite) and the
  // straddling cutover batch (absorbed by its own partition overwrite).
  // The oracle is the full batch apply minus the torn class — an
  // off-by-one at the mark, a lost frontier, or a leaked torn row are
  // all hash mismatches. At 100 TB: the snapshot never rides the wire,
  // the filter is one codegen'd comparison, and the tail costs one
  // header walk of the growth per trigger.
  def cdc65TailCutover(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc65_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed")
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id")).as("v"))
    // closed bulk (the table's history): everything but the live classes
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v"))
        .repartitionByRange(4, col("k")),
      feed.getPath, rowsPerTxn = 50)
    // the recorded snapshot position: median row-event index of the
    // middle closed file (mid-file — no boundary aligns with it)
    val files = Option(feed.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq
    val (markSeq, markIdx) =
      if (files.isEmpty) (0L, -1L)
      else {
        val markFile = files((files.length - 1) / 2)
        val mi = spark.read.format("binlog").load(s"${feed.getPath}/$markFile")
          .filter(col("event_type") === "WriteRowsEventV2")
          .agg(min(col("event_index")), max(col("event_index"))).head()
        val seq = "\\.(\\d+)$".r.findFirstMatchIn(markFile).get.group(1).toLong
        if (mi.isNullAt(0)) (seq, -1L)
        else (seq, (mi.getLong(0) + mi.getLong(1)) / 2)
      }
    val atOrBeforeMark = col("file_seq") < markSeq ||
      (col("file_seq") === markSeq && col("event_index") <= markIdx)
    def rows(ev: DataFrame): DataFrame = ev
      .filter(col("event_type") === "WriteRowsEventV2")
      .select(col("file_seq"), col("event_index"),
        explode(col("row_images")).as("img"))
      .select(col("file_seq"), col("event_index"),
        element_at(col("img"), 1).cast("long").as("k"),
        element_at(col("img"), 2).as("v"))
    // state₀: the bulk snapshot AS OF the mark
    if (files.nonEmpty)
      ViewMaintenance.applyIdempotent(
        rows(spark.read.format("binlog").load(feed.getPath))
          .filter(atOrBeforeMark).select("k", "v"),
        state, -1L)
    // the LIVE side: one active file, growing between the two drains
    val (ta, tb, tc) = (boundedClass(base, "cdc65", 0),
      boundedClass(base, "cdc65", 1), boundedClass(base, "cdc65", 2))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    val appendTail: Option[Array[Byte]] =
      if (ta.isEmpty && tb.isEmpty && tc.isEmpty) None
      else {
        val w = new TailFeedWriter(Seq(ta, tb, tc))
        val (f, fdeOff) = w.newFile()
        var cleanCut = fdeOff
        if (ta.nonEmpty) cleanCut = w.txn(f, 801L, 8001L, ta)._2
        // installment 1 ends cleanly after A's commit; the append brings
        // B (committed) and C (torn forever)
        if (tb.nonEmpty) w.txn(f, 802L, 8002L, tb)
        if (tc.nonEmpty) w.txn(f, 803L, 8003L, tc, commit = false)
        val all = f.bytes
        val cut = cleanCut.toInt
        java.nio.file.Files.write(activeFile.toPath, all.slice(0, cut))
        Some(all.slice(cut, all.length))
      }
    // the cutover drain: subscribe from the beginning, discard pre-mark
    // positionally; record batch 0 and the straddling batch for replays
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    val straddleFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    var straddleId = -1L
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      val r = rows(batch).localCheckpoint(true) // one decode, two probes
      if (straddleFiles.isEmpty) {
        val flags = r.agg(
          max(when(atOrBeforeMark, 1).otherwise(0)).as("pre"),
          max(when(atOrBeforeMark, 0).otherwise(1)).as("post")).head()
        if (!flags.isNullAt(0) && flags.getInt(0) == 1 && flags.getInt(1) == 1) {
          straddleFiles ++= batch.select(col("binlog_file")).distinct()
            .collect().map(_.getString(0))
          straddleId = id
        }
      }
      ViewMaintenance.applyIdempotent(
        r.filter(!atOrBeforeMark).select("k", "v"), state, id)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    appendTail.foreach { tail =>
      java.nio.file.Files.write(activeFile.toPath, tail,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainTail()
    // injected replays: batch 0 (entirely pre-mark — an EMPTY overwrite)
    // and the straddling cutover batch (both whole closed files — the
    // tail source completes closed files whole, so the file-name replay
    // reproduces the batch exactly)
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    if (straddleFiles.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(straddleFiles.toSeq.map(f => s"${feed.getPath}/$f"): _*),
        straddleId)
    ViewMaintenance.readState(spark, state, "k BIGINT, v STRING, batch_id BIGINT")
      .groupBy((col("k") % 10).as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(length(col("v"))).as("payload_sum"))
      .orderBy("grp")
  }

  val cdc65Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT k % 10 AS grp, COUNT(*) AS n_rows,
      |  CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(SUM(LENGTH('u' || CAST(user_id AS VARCHAR))) AS BIGINT)
      |    AS payload_sum
      |FROM base WHERE k % 131 <> 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc61 — THE LIFECYCLE INSIDE THE DEMUX (cdc57's deployment shape with
  // cdc51/m12/p15's maintenance discipline composed in, the r13 verdict's
  // fourth task): one feed read once, N routed exactly-once states, and
  // after EVERY batch each routed state runs its own maybeCompact — the
  // maintenance loop a real N-table consumer runs — so each state folds
  // into its own base snapshot on its own schedule (ta's live batches
  // trip the policy after its second file, tb's after its second). The
  // injected batch-0 replay (a ta file) then lands as a COVERED replay
  // for ta (its recreated partition must be ignored by the read-side
  // live rule and show up ONLY in the metrics as a ghost) and as an
  // empty no-op for tb. The output folds the served aggregates WITH the
  // stateMetrics surface: n_bases pins that each state compacted to
  // exactly one base, base_rows that the base covers the table's whole
  // delta, ghost_rows that the covered replay's partition exists on disk
  // for ta only — all data-derived except the structural n_bases = 1.
  // At 100 TB: the per-state listing maybeCompact pays is exactly the
  // quantity compaction keeps bounded, and the demux still reads the
  // feed once.
  def cdc61DemuxLifecycle(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc61_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val stateA = new java.io.File(root, "state_ta").getPath
    val stateB = new java.io.File(root, "state_tb").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"), col("user_id"))
    val maxRow = base.agg(max(col("k"))).head()
    val mid = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) / 2
    def stage(name: String, df: DataFrame, table: String, tableId: Long,
        seq: Int): Unit = {
      val st = new java.io.File(root, name).getPath
      graft.ingest.BinlogSink.writeChanges(df.coalesce(1), st,
        table = table, tableId = tableId, fileSeqStart = seq)
      Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    val ta = base.select(lit(1).as("op"), col("k"),
      concat(lit("u"), col("user_id")).as("v"))
    val tb = base.select(lit(1).as("op"), col("k"),
      (col("user_id") * 3L).as("x"))
    stage("st1", ta.filter(col("k") <= mid), "ta", 21L, seq = 1)
    stage("st2", tb.filter(col("k") <= mid), "tb", 22L, seq = 2)
    stage("st3", ta.filter(col("k") > mid), "ta", 21L, seq = 3)
    stage("st4", tb.filter(col("k") > mid), "tb", 22L, seq = 4)
    val schemaA = "k BIGINT, v STRING, batch_id BIGINT"
    val schemaB = "k BIGINT, x BIGINT, batch_id BIGINT"
    drainWithRedelivery(spark, feed.getPath, ckpt) { (batch, id) =>
      val b = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(col("table"), explode(col("row_images")).as("img"))
        .localCheckpoint(true) // the feed is read ONCE per batch
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "ta")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).as("v")),
        stateA, id)
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "tb")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).cast("long").as("x")),
        stateB, id)
      // the maintenance loop: EVERY routed state, EVERY batch — the
      // exactly-once row sets fold by identity
      ViewMaintenance.maybeCompact(spark, stateA, schemaA,
        maxLive = 1, keepLast = 0)(df => df)
      ViewMaintenance.maybeCompact(spark, stateB, schemaB,
        maxLive = 1, keepLast = 0)(df => df)
    }
    def report(stateDir: String, schema: String, tbl: String,
        served: DataFrame): DataFrame = {
      val m = ViewMaintenance.stateMetrics(spark, stateDir, schema)
      val shape = m.agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_bases"),
        sum(when(col("is_base"), col("n_rows")).otherwise(0L)).as("base_rows"),
        sum(when(!col("is_base"), col("n_rows")).otherwise(0L)).as("ghost_rows"))
      // 1-row broadcast combine (the PlanAudit-pinned scalar BNLJ shape)
      served.crossJoin(broadcast(shape)).withColumn("tbl", lit(tbl))
        .select("tbl", "n_rows", "k_sum", "n_bases", "base_rows", "ghost_rows")
    }
    val servedA = ViewMaintenance.readState(spark, stateA, schemaA)
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
    val servedB = ViewMaintenance.readState(spark, stateB, schemaB)
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
    report(stateA, schemaA, "ta", servedA)
      .unionByName(report(stateB, schemaB, "tb", servedB))
      .orderBy("tbl")
  }

  // cdc62 — SKETCH-STATE COMPACTION (the third fold class through
  // `compact`, the r13 verdict's fifth task: cdc51/cdc59 prove additive
  // sums, m12 proves set and min/max folds — this proves IDEMPOTENT
  // REGISTER MAXIMA, the fold class a 100-TB deployment actually
  // compacts, because HLL registers are bytes where distinct-sets are
  // terabytes). cdc49's HLL view re-drained under the exactly-once
  // discipline (applyIdempotent instead of appendBatch) with the
  // maintenance loop running maybeCompact after every batch: register
  // partials fold by groupBy(group, reg).max(rho) — the state's natural
  // monoid — into a base snapshot mid-drain, and the injected batch-0
  // replay lands as a COVERED replay the read-side live rule absorbs
  // (register max would absorb a double-count anyway; the recreated
  // partition still proves the filter, not the algebra, is doing the
  // work — the same isolation m12 gives sets). Shares cdc49's oracle:
  // identical registers, register-sums, and estimates through the
  // compaction boundary, or hash mismatch.
  def cdc62SketchCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val (feed, state, ckpt) = streamDirs("graft_cdc62_", dir)
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
    graft.ingest.BinlogSink.writeKeyedStrings(
      base.select(col("user_id"), col("event_type"))
        .repartition(4, col("user_id")), feed)
    val regSchema = "event_type STRING, reg BIGINT, r INT, batch_id BIGINT"
    def regFold(df: DataFrame): DataFrame =
      df.groupBy("event_type", "reg").agg(max(col("r")).as("r"))
    drainWithRedelivery(spark, feed, ckpt) { (batch, id) =>
      ViewMaintenance.applyIdempotent(
        graft.ops.Hll.withRegRho(
            batch.filter(col("event_type") === "WriteRowsEventV2")
              .select(explode(col("row_images")).as("img"))
              .select(element_at(col("img"), 1).cast("long").as("user_id"),
                element_at(col("img"), 2).as("event_type")),
            col("user_id"))
          .groupBy("event_type", "reg").agg(max(col("rho")).as("r")),
        state, id)
      ViewMaintenance.maybeCompact(spark, state, regSchema,
        maxLive = 2, keepLast = 1)(regFold)
    }
    val regs = ViewMaintenance.readState(spark, state, regSchema)
      .groupBy("event_type", "reg").agg(max(col("r")).as("r"))
    val sums = regs.groupBy("event_type")
      .agg(graft.ops.Hll.sum48OverR.as("sum48"),
        count(lit(1)).as("n_regs_hit"))
    val exact = base.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    sums.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_regs_hit"),
        col("sum48"), graft.ops.Hll.estExpr("sum48").as("est"))
      .orderBy("event_type")
  }

  // cdc63 — THE FULL DEPLOYMENT SHAPE, ONE GATE: a GROWING binlog
  // carrying TWO tables' changes, tailed live (cdc58's tailActive
  // source), demultiplexed into per-table exactly-once states (cdc57),
  // each running its own compaction loop (cdc61), across an
  // append-between-runs restart seam on one checkpoint, with the torn
  // tail held back in-source (cdc56's rule, now inside the offsets) and
  // a batch-0 whole-file redelivery absorbed after everything. This is
  // the configuration a real CDC consumer actually runs — every piece
  // is proven alone by its own gate; this proves the COMPOSITION. The
  // fixture: per-table closed sink files (classes k % 13 ∉ {9..12}),
  // plus one byte-crafted ACTIVE file interleaving both tables'
  // transactions — txn A (ta, class 9) committed before run 1; txn B
  // (tb, class 10) torn at run 1 (cut mid-XID-header) and completed by
  // the append; txn C (ta, class 11) committed in the append; txn D
  // (tb, class 12) torn forever. The oracle expects ALL of ta and all
  // of tb except class 12 — so a leaked torn row, a lost frontier, a
  // cross-table routing error, a compaction that swallowed a live
  // batch, or an unabsorbed replay is a hash mismatch. At 100 TB: one
  // subscription reads the feed once at wire-growth granularity; N
  // states stay compacted; nothing scales with history.
  def cdc63TailDemux(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc63_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val stateA = new java.io.File(root, "state_ta").getPath
    val stateB = new java.io.File(root, "state_tb").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"), col("user_id"))
    // each table's closed file carries everything EXCEPT the classes that
    // ride the active file for THAT table (ta: 9/11, tb: 10/12) — both
    // tables' full row sets are on the wire exactly once
    val closedA = col("k") % 13 =!= 9 && col("k") % 13 =!= 11
    val closedB = col("k") % 13 =!= 10 && col("k") % 13 =!= 12
    // closed per-table files: ta then tb in natural-version order
    def stageClosed(name: String, df: DataFrame, table: String,
        tableId: Long, seq: Int): Unit = {
      val st = new java.io.File(root, name).getPath
      graft.ingest.BinlogSink.writeChanges(df.coalesce(1), st,
        table = table, tableId = tableId, fileSeqStart = seq, rowsPerTxn = 50)
      Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    stageClosed("stA", base.filter(closedA)
      .select(lit(1).as("op"), col("k"),
        concat(lit("u"), col("user_id")).as("v")), "ta", 21L, seq = 1)
    stageClosed("stB", base.filter(closedB)
      .select(lit(1).as("op"), col("k"),
        (col("user_id") * 3L).as("x")), "tb", 22L, seq = 2)
    // the ACTIVE file: both tables' transactions interleaved, built
    // byte-level (bounded classes, cdc56/cdc58's cap discipline)
    val fixtureCap = 200000
    def cls(m: Long): Array[org.apache.spark.sql.Row] = {
      val rows = base.filter(col("k") % 13 === m).orderBy("k")
        .limit(fixtureCap + 1).collect()
      require(rows.length <= fixtureCap,
        s"cdc63 fixture class $m must stay a bounded test vector, got " +
          s"${rows.length} rows (cap $fixtureCap)")
      rows
    }
    val (ta9, tb10, ta11, tb12) = (cls(9), cls(10), cls(11), cls(12))
    val activeFile = new java.io.File(feed, "mysql-bin.000500")
    val appendTail: Option[Array[Byte]] =
      if (ta9.isEmpty && tb10.isEmpty && ta11.isEmpty && tb12.isEmpty) None
      else {
        import graft.ingest.BinlogBinaryWriter._
        val boundA = math.max(20,
          (ta9 ++ ta11).map(r => 1 + r.getLong(1).toString.length)
            .foldLeft(0)(math.max) + 16)
        val colsA = Seq(ColDef.longlong, ColDef.varchar(boundA))
        val colsB = Seq(ColDef.longlong, ColDef.longlong)
        def imgA(r: org.apache.spark.sql.Row): Seq[Option[Array[Byte]]] =
          Seq(Some(encLongLong(r.getLong(0))),
            Some(encVarchar("u" + r.getLong(1), boundA)))
        def imgB(r: org.apache.spark.sql.Row): Seq[Option[Array[Byte]]] =
          Seq(Some(encLongLong(r.getLong(0))),
            Some(encLongLong(r.getLong(1) * 3L)))
        val t0 = 1714564800L
        val sid = (1 to 16).map(_.toByte).toArray
        val f = new FileBuilder(checksums = true)
        var lastRows = f.fde(t0)
        var cleanCut = lastRows
        def open(gno: Long): Unit = {
          f.event(t0, 33, gtidBody(sid, gno))
          f.event(t0, 2, queryBody("sf", "BEGIN"))
        }
        def rowsA(rs: Array[org.apache.spark.sql.Row]): Unit =
          rs.grouped(100).foreach { b =>
            f.event(t0, 19, tableMapBody(21L, "sf", "ta", colsA))
            lastRows = f.event(t0, 30, rowsBody(21L, colsA.size, b.toSeq.map(imgA)))
          }
        def rowsB(rs: Array[org.apache.spark.sql.Row]): Unit =
          rs.grouped(100).foreach { b =>
            f.event(t0, 19, tableMapBody(22L, "sf", "tb", colsB))
            lastRows = f.event(t0, 30, rowsBody(22L, colsB.size, b.toSeq.map(imgB)))
          }
        // txn A (ta): committed entirely inside installment 1
        if (ta9.nonEmpty) {
          open(821L); rowsA(ta9); cleanCut = f.event(t0, 16, xidBody(8201L))
        }
        // txn B (tb): rows in installment 1, XID only in the append
        if (tb10.nonEmpty) { open(822L); rowsB(tb10) }
        val afterBRows = lastRows
        if (tb10.nonEmpty) f.event(t0, 16, xidBody(8202L))
        // txn C (ta): committed, entirely in the append
        if (ta11.nonEmpty) {
          open(823L); rowsA(ta11); f.event(t0, 16, xidBody(8203L))
        }
        // txn D (tb): torn FOREVER
        if (tb12.nonEmpty) { open(824L); rowsB(tb12) }
        val all = f.bytes
        val cut = (if (tb10.nonEmpty) math.min(afterBRows + 7, all.length.toLong)
          else cleanCut).toInt
        java.nio.file.Files.write(activeFile.toPath, all.slice(0, cut))
        Some(all.slice(cut, all.length))
      }
    val schemaA = "k BIGINT, v STRING, batch_id BIGINT"
    val schemaB = "k BIGINT, x BIGINT, batch_id BIGINT"
    val batch0Files = scala.collection.mutable.ArrayBuffer.empty[String]
    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (id == 0L && batch0Files.isEmpty)
        batch0Files ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      // ONE pass over the batch, N routed exactly-once writes, then the
      // per-state maintenance loop (cdc61's discipline)
      val b = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(col("table"), explode(col("row_images")).as("img"))
        .localCheckpoint(true)
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "ta")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).as("v")),
        stateA, id)
      ViewMaintenance.applyIdempotent(
        b.filter(col("table") === "tb")
          .select(element_at(col("img"), 1).cast("long").as("k"),
            element_at(col("img"), 2).cast("long").as("x")),
        stateB, id)
      ViewMaintenance.maybeCompact(spark, stateA, schemaA,
        maxLive = 1, keepLast = 0)(df => df)
      ViewMaintenance.maybeCompact(spark, stateB, schemaB,
        maxLive = 1, keepLast = 0)(df => df)
    }
    def drainTail(): Unit = drainBinlogTail(spark, feed.getPath, ckpt)(applyBatch)
    drainTail()
    appendTail.foreach { tail =>
      java.nio.file.Files.write(activeFile.toPath, tail,
        java.nio.file.StandardOpenOption.APPEND)
    }
    drainTail()
    // injected crash-after-commit redelivery of batch 0 (ta's closed
    // file): ta absorbs it as a covered ghost, tb as an empty no-op
    if (batch0Files.nonEmpty)
      applyBatch(spark.read.format("binlog")
        .load(batch0Files.toSeq.map(f => s"${feed.getPath}/$f"): _*), 0L)
    val servedA = ViewMaintenance.readState(spark, stateA, schemaA)
      .withColumn("tbl", lit("ta"))
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(length(col("v"))).as("payload_sum"))
    val servedB = ViewMaintenance.readState(spark, stateB, schemaB)
      .withColumn("tbl", lit("tb"))
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
        sum(col("x")).as("payload_sum"))
    servedA.unionByName(servedB).orderBy("tbl")
  }

  val cdc63Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT 'ta' AS tbl, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(SUM(LENGTH('u' || CAST(user_id AS VARCHAR))) AS BIGINT)
      |    AS payload_sum
      |FROM base
      |UNION ALL
      |SELECT 'tb', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(SUM(user_id * 3) AS BIGINT)
      |FROM base WHERE k % 13 <> 12
      |ORDER BY tbl""".stripMargin

  val cdc60Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT k % 10 AS grp, COUNT(*) AS n_rows,
      |  CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(SUM(LENGTH('u' || CAST(user_id AS VARCHAR))) AS BIGINT)
      |    AS payload_sum
      |FROM base GROUP BY 1 ORDER BY 1""".stripMargin

  val cdc61Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |), mx AS (
      |  SELECT MAX(k) // 2 AS mid FROM base
      |)
      |SELECT 'ta' AS tbl, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum,
      |  CAST(1 AS BIGINT) AS n_bases, COUNT(*) AS base_rows,
      |  CAST(SUM(CASE WHEN k <= mid THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ghost_rows
      |FROM base, mx
      |UNION ALL
      |SELECT 'tb', COUNT(*), CAST(SUM(k) AS BIGINT),
      |  CAST(1 AS BIGINT), COUNT(*), CAST(0 AS BIGINT)
      |FROM base
      |ORDER BY tbl""".stripMargin

  val cdc58Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_a'
      |            WHEN k % 131 = 1 THEN 'txn_b'
      |            WHEN k % 131 = 2 THEN 'txn_c'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base WHERE k % 131 <> 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // cdc75 — TIME-TRAVEL READ over a maintained state (the REPRODUCIBILITY
  // residual of the maintenance layer: cdc51/59/62 prove the serving read
  // survives compaction, but a training-data deployment also needs to
  // re-read the state AS OF an earlier mark — "what did release N train
  // on" — months after compaction folded those batches away). The drain
  // lands four delta installments whose membership is DATA-DERIVED
  // (o_orderkey % 20 picks the class, one binlog file per class with
  // explicit ascending sequence numbers), so batch i IS class i and the
  // oracle can recompute every historical mark with modulo predicates —
  // a hash-partitioned feed would make batch composition unreproducible
  // in SQL. Two mid-drain compactions exercise the whole retention
  // contract: the first base (coverage 0) is RETAINED by the second
  // (coverage 2, retainBases = 1), batch 3 stays live — so the state
  // ends with readable marks {0 exactly} ∪ [2, 3]. The gate reads marks
  // 0 (a retained base alone), 2 (the current base alone), and 3 (base +
  // one live delta); the oracle recomputes each from orders × lineitem
  // directly, so a fold loss, a wrong base picked, a GC'd delta leaking
  // in, or a mark served from the wrong side of a compaction is a hash
  // mismatch. (The REFUSAL inside the compacted region — mark 1 — is
  // pinned in ViewMaintenanceSpec; a refusal cannot ride a DataFrame.)
  // At 100 TB: as-of reads cost exactly what serving reads cost (one
  // driver listing + partition-pruned literal predicates); history
  // retention is bounded by retainBases snapshots, not by replaying a
  // log.
  def cdc75TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val state = reproFixtureDrain(spark, dir, "graft_cdc75_")
    def asOf(m: Long): DataFrame =
      reproFold(ViewMaintenance.readStateAsOf(spark, state, reproStateSchema, m))
        .withColumn("as_of", lit(m))
    asOf(0L).unionByName(asOf(2L)).unionByName(asOf(3L))
      .select("as_of", "o_orderpriority", "cents", "n")
      .orderBy("as_of", "o_orderpriority")
  }

  /** cdc75/cdc77's shared state shape: q66's priority partials under the
    * exactly-once discipline. */
  private val reproStateSchema =
    "o_orderpriority STRING, cents BIGINT, n BIGINT, batch_id BIGINT"
  private def reproFold(df: DataFrame): DataFrame =
    df.groupBy("o_orderpriority")
      .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))

  /** cdc75/cdc77's shared fixture drain (factored so the two gates over
    * the same retention posture cannot drift): four delta installments
    * with DATA-DERIVED membership (o_orderkey % 20 picks the class, one
    * binlog file per class with ascending sequence numbers — batch i IS
    * class i, so oracles recompute any mark with modulo predicates),
    * q66's -1/-2 seeds, exactly-once apply, and the release discipline —
    * compact to coverage 0 after batch 1, then to coverage 2 after
    * batch 3 RETAINING the first base; batch 3 stays live. The returned
    * state dir ends with readable marks {0} ∪ [2, 3]. */
  private def reproFixtureDrain(spark: SparkSession, dir: String,
      prefix: String): String = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir(prefix, dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val state = new java.io.File(root, "state").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val fx = ivmFixture(spark, dir)
    val bPrime = fx.bBase.unionByName(fx.bDelta).localCheckpoint(true)
    (0 until 4).foreach { i =>
      val stg = new java.io.File(root, s"stage$i")
      graft.ingest.BinlogSink.writeChanges(
        fx.aDelta.filter(col("o_orderkey") % 20 === lit(5L * i))
          .select(lit(1).as("op"), col("o_orderkey"), col("o_orderpriority"))
          .repartition(1),
        stg.getPath, fileSeqStart = i + 1)
      val files = Option(stg.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith("."))
      require(files.nonEmpty, s"$prefix fixture class $i wrote no file — an " +
        "empty delta class would shift every later batch id")
      files.foreach { f =>
        require(f.renameTo(new java.io.File(feed, f.getName)),
          s"fixture deliver failed: $f")
      }
    }
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bBase), state, -1L)
    ViewMaintenance.applyIdempotent(fx.partials(fx.aBase, fx.bDelta), state, -2L)
    drainBinlogFeed(spark, feed.getPath, ckpt) { (batch, id) =>
      ViewMaintenance.applyIdempotent(
        fx.partials(decodeIvmDelta(batch), bPrime), state, id)
      if (id == 1L) // first base: seeds + batch 0 folded, coverage 0
        ViewMaintenance.compact(spark, state, reproStateSchema,
          upto = 0L)(reproFold)
      if (id == 3L) // second base RETAINS the first; batch 3 stays live
        ViewMaintenance.compact(spark, state, reproStateSchema, upto = 2L,
          retainBases = 1)(reproFold)
    }
    state
  }

  val cdc75Oracle: String =
    """WITH j AS (
      |  SELECT o.o_orderkey AS k, o.o_orderpriority,
      |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS c
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |), marks AS (
      |  SELECT CAST(0 AS BIGINT) AS as_of
      |  UNION ALL SELECT 2 UNION ALL SELECT 3
      |)
      |SELECT m.as_of, j.o_orderpriority, CAST(SUM(j.c) AS BIGINT) AS cents,
      |  COUNT(*) AS n
      |FROM marks m CROSS JOIN j
      |WHERE j.k % 5 <> 0 OR j.k % 20 <= 5 * m.as_of
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // cdc76 — CONSISTENT CROSS-TABLE DEMUX READ (the visibility seam the
  // demux layer leaves open: inside one batch the per-table states land
  // SEQUENTIALLY, so a crash after table A's write but before the batch
  // completes leaves A at batch N and B at N−1 — a reader joining the
  // demuxed tables sees a TORN transaction. The published-mark protocol
  // closes it: the writer publishes mark N only after EVERY table's
  // batch N landed — atomic create, forward-only — and a consistent
  // reader reads each table with readStateAsOf(published): consistency
  // and cdc75's time travel are the SAME primitive.) The feed pairs
  // ta's and tb's installments by ascending sequence number, two files
  // per trigger, so BOTH tables ride every batch; the drain skips the
  // final publish — the injected crash window — and the gate reads the
  // group both ways: consistent (each table as-of the published mark)
  // and raw (whatever is on disk — the torn view, one whole batch
  // ahead). The redelivery + publish then completes the batch (the
  // restart), and the consistent view catches up. The oracle recomputes
  // all three stages from the class predicates, so a torn batch leaking
  // into the consistent view, a mark published before its batch
  // completed, or a redelivery double-count is a hash mismatch. At
  // 100 TB: the mark costs one create-exclusive + bounded GC per batch;
  // the consistent read costs exactly a serving read per table.
  def cdc76ConsistentDemux(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc76_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val group = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id").cast("string")).as("v"))
    // file 1: ta class 0 (k%4=0) · file 2: tb class 0 (k%4=1) ·
    // file 3: ta class 1 (k%4=2) · file 4: tb class 1 (k%4=3) —
    // two files per trigger pairs each class's ta+tb into ONE batch
    Seq((1, "ta", 11L, 0L), (2, "tb", 12L, 1L),
        (3, "ta", 11L, 2L), (4, "tb", 12L, 3L)).foreach {
      case (seq, tbl, tid, cls) =>
        val stg = new java.io.File(root, s"stage$seq")
        graft.ingest.BinlogSink.writeChanges(
          base.filter(col("k") % 4 === lit(cls))
            .select(lit(1).as("op"), col("k"), col("v")).repartition(1),
          stg.getPath, table = tbl, tableId = tid, fileSeqStart = seq)
        val files = Option(stg.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && !f.getName.startsWith("."))
        require(files.nonEmpty, s"cdc76 fixture file $seq wrote nothing — " +
          "an empty class would unpair the per-batch table installments")
        files.foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    val sch = "k BIGINT, v STRING, batch_id BIGINT"
    val lastFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    var maxBatchId = -1L
    def applyBatch(batch: DataFrame, id: Long, publish: Boolean): Unit = {
      maxBatchId = math.max(maxBatchId, id)
      val b = batch.filter(col("event_type") === "WriteRowsEventV2")
        .select(col("table").as("tbl"), explode(col("row_images")).as("img"))
        .select(col("tbl"), element_at(col("img"), 1).cast("long").as("k"),
          element_at(col("img"), 2).as("v"))
        .localCheckpoint(true)
      Seq("ta", "tb").foreach { t =>
        ViewMaintenance.applyIdempotent(
          b.filter(col("tbl") === t).drop("tbl"), s"$group/tables/$t", id)
      }
      if (publish) ViewMaintenance.publishMark(spark, group, id)
      if (id == 1L) {
        lastFiles.clear()
        lastFiles ++= batch.select(col("binlog_file")).distinct()
          .collect().map(_.getString(0))
      }
    }
    graft.streaming.Drains.withDrainPartitions(spark) {
      val q = spark.readStream.format("binlog")
        .option("maxFilesPerTrigger", 2)
        .load(feed.getPath)
        .writeStream
        // the crash window: batch 1's states land, its publish does NOT
        .foreachBatch((b: DataFrame, id: Long) =>
          applyBatch(b, id, publish = id < 1L))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def readGroup(stage: String, consistent: Boolean): DataFrame = {
      // ONE mark resolution per group read — resolving inside the
      // per-table loop would re-open the torn window under a concurrent
      // publisher (table A at mark N, table B at N+1)
      val mark =
        if (consistent)
          Some(ViewMaintenance.publishedMark(spark, group).getOrElse(
            sys.error("cdc76: no published mark after the drain")))
        else None
      val reads = Seq("ta", "tb").map { t =>
        val st = mark match {
          case Some(m) =>
            ViewMaintenance.readStateAsOf(spark, s"$group/tables/$t", sch, m)
          case None => ViewMaintenance.readState(spark, s"$group/tables/$t", sch)
        }
        st.agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"),
            sum(length(col("v"))).as("payload_sum"))
          .select(lit(stage).as("stage"), lit(t).as("tbl"),
            col("n_rows"), col("k_sum"), col("payload_sum"))
      }
      reads.reduce(_ unionByName _)
    }
    val before = readGroup("consistent_before", consistent = true)
      .unionByName(readGroup("raw_before", consistent = false))
      .localCheckpoint(true) // materialize BEFORE the restart completes it
    // the restart: redeliver batch 1 (absorbed by its own partitions)
    // and complete its publish — the mark moves 0 → 1
    require(lastFiles.nonEmpty, "cdc76: the drain never saw batch 1")
    // PACING PRECONDITION (r15 ADVICE): the fixture's whole design is
    // that maxFilesPerTrigger=2 over the 4 staged files pairs each
    // class's ta+tb installments into exactly two (2,2) batches. If the
    // source's pacing ever split them (2,1,1), the gate would fail at
    // the oracle with a misleading consistency diagnosis — assert the
    // precondition itself so a pacing change surfaces as a clear
    // fixture failure instead.
    require(maxBatchId == 1L && lastFiles.length == 2,
      s"cdc76 fixture precondition broke: expected exactly 2 batches of " +
        s"2 files each, saw max batch id $maxBatchId with " +
        s"${lastFiles.length} file(s) in batch 1 — the per-trigger " +
        "pairing this gate is built on no longer holds")
    applyBatch(spark.read.format("binlog")
      .load(lastFiles.toSeq.map(f => s"${feed.getPath}/$f"): _*), 1L,
      publish = true)
    before.unionByName(readGroup("consistent_after", consistent = true))
      .orderBy("stage", "tbl")
  }

  val cdc76Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k, user_id FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |), r AS (
      |  SELECT k, CASE WHEN k % 2 = 0 THEN 'ta' ELSE 'tb' END AS tbl,
      |    k % 4 AS c, LENGTH('u' || CAST(user_id AS VARCHAR)) AS pl
      |  FROM base
      |), stages AS (
      |  SELECT 'consistent_before' AS stage UNION ALL
      |  SELECT 'raw_before' UNION ALL SELECT 'consistent_after'
      |)
      |SELECT s.stage, r.tbl, COUNT(*) AS n_rows,
      |  CAST(SUM(r.k) AS BIGINT) AS k_sum, CAST(SUM(r.pl) AS BIGINT) AS payload_sum
      |FROM stages s CROSS JOIN r
      |WHERE s.stage <> 'consistent_before' OR r.c < 2
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // cdc77 — RELEASE DIFF (the question after cdc75's "what did release N
  // train on": what CHANGED between two releases — audit a regression,
  // bill an incremental delivery, or ship only the delta downstream).
  // readStateDiff's two paths are both on the gate's hook, over cdc75's
  // exact fixture shape (four modulo-derived delta installments, two
  // mid-drain compactions, first base retained, batch 3 live):
  //   - span live_2to3: from = current coverage → the CHEAP path — the
  //     diff IS the live delta partitions in (2, 3], partition-pruned;
  //     at 100 TB this reads only the bytes written between the marks,
  //     never the base;
  //   - span compacted_0to2: marks separated by a compaction → the
  //     FALLBACK — base(2) unioned with the sign-flipped retained
  //     base(0), folded to the net change of classes 1+2.
  // The oracle recomputes both spans directly from orders × lineitem
  // with the class predicates, so a diff that scans the wrong
  // partitions, a negate that misses a measure, or a fold that loses a
  // class is a hash mismatch. (The refusal for an unreadable `from`
  // and the cheap path's partition pruning are pinned in
  // ViewMaintenanceSpec.)
  def cdc77ReleaseDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val state = reproFixtureDrain(spark, dir, "graft_cdc77_")
    // the negate flips BOTH additive measures; keys/batch_id untouched
    def negate(df: DataFrame): DataFrame =
      df.withColumn("cents", -col("cents")).withColumn("n", -col("n"))
    def span(tag: String, from: Long, to: Long): DataFrame =
      reproFold(
        ViewMaintenance.readStateDiff(spark, state, reproStateSchema,
          from, to)(negate).drop("batch_id"))
        .withColumn("span", lit(tag))
    span("compacted_0to2", 0L, 2L).unionByName(span("live_2to3", 2L, 3L))
      .select("span", "o_orderpriority", "cents", "n")
      .orderBy("span", "o_orderpriority")
  }

  val cdc77Oracle: String =
    """WITH j AS (
      |  SELECT o.o_orderkey AS k, o.o_orderpriority,
      |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS c
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |), spans AS (
      |  SELECT 'compacted_0to2' AS span, 5 AS lo, 10 AS hi
      |  UNION ALL SELECT 'live_2to3', 15, 15
      |)
      |SELECT s.span, j.o_orderpriority, CAST(SUM(j.c) AS BIGINT) AS cents,
      |  COUNT(*) AS n
      |FROM spans s CROSS JOIN j
      |WHERE j.k % 5 = 0 AND j.k % 20 >= s.lo AND j.k % 20 <= s.hi
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // cdc78 — THE OPERABLE FOLLOW SURFACE UNDER THE ORACLE (r16: the CLI's
  // --follow write path was rewritten — one dynamic-partition-overwrite
  // job per batch, census from one partitioned read, --as-of/--diff read
  // modes — so the CLI composition itself joins the gate registry
  // instead of living on spec assertions alone). Four single-class
  // binlog files (ta c0, tb c1, ta c2, tb c3 — cdc76's modulo split)
  // drain through cli.Main.follow at one file per trigger, landing
  // batches/marks 0..3 (precondition-asserted via the published mark,
  // the cdc76 discipline); the output stacks three CLI reads:
  //   - full:      Main.census — the live partition set, one scan;
  //   - asof_1:    Main.censusAtMark at mark 1 — classes 0+1 only
  //                (tb's c3 installment and ta's c2 are the future);
  //   - diff_1_3:  Main.censusDiff (1, 3] — exactly the later two
  //                installments, partition-pruned.
  // n_events pins the WIRE framing too: writeChanges groups 100 rows
  // per WRITE_ROWS event in one single-partition file per class, so
  // the oracle's ceil(cnt/100) counts the events the decoder must have
  // produced — a split or merged event is a hash mismatch, not just a
  // row-count one.
  def cdc78FollowCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc78_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val out = new java.io.File(root, "out").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id").cast("string")).as("v"))
    Seq((1, "ta", 11L, 0L), (2, "tb", 12L, 1L),
        (3, "ta", 11L, 2L), (4, "tb", 12L, 3L)).foreach {
      case (seq, tbl, tid, cls) =>
        val stg = new java.io.File(root, s"stage$seq")
        graft.ingest.BinlogSink.writeChanges(
          base.filter(col("k") % 4 === lit(cls))
            .select(lit(1).as("op"), col("k"), col("v")).coalesce(1),
          stg.getPath, table = tbl, tableId = tid, fileSeqStart = seq)
        val files = Option(stg.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && !f.getName.startsWith("."))
        require(files.nonEmpty, s"cdc78 fixture class $cls is empty — the " +
          "class->mark arithmetic this gate pins needs all four " +
          "installments (run at sf >= 0.01)")
        files.foreach { f =>
          require(f.renameTo(new java.io.File(feed, f.getName)),
            s"fixture deliver failed: $f")
        }
    }
    graft.streaming.Drains.withDrainPartitions(spark) {
      // follow drains eagerly (AvailableNow to completion); its returned
      // census frame is discarded — the gate re-reads through the three
      // CLI read surfaces below
      graft.cli.Main.follow(spark, Seq(feed.getPath), out,
        purgeSafe = false, maxFilesPerTrigger = Some(1),
        maxBytesPerTrigger = None)
    }
    // pacing precondition: 4 files at one per trigger == marks 0..3
    require(ViewMaintenance.publishedMark(spark, out).contains(3L),
      "cdc78 precondition broke: 4 staged files at maxFilesPerTrigger=1 " +
        "must land as batches 0..3 (published mark 3) — the source's " +
        "pacing changed")
    val tablesRoot = s"$out/tables"
    def stage(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("stage"), col("tbl"), col("n_events"),
        col("n_rows"))
    stage("full", graft.cli.Main.census(spark, tablesRoot))
      .unionByName(stage("asof_1",
        graft.cli.Main.censusAtMark(spark, out, tablesRoot, "1")._2))
      .unionByName(stage("diff_1_3",
        graft.cli.Main.censusDiff(spark, tablesRoot, 1L, 3L)))
      .orderBy("stage", "tbl")
  }

  val cdc78Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |), cls AS (
      |  SELECT CASE WHEN k % 2 = 0 THEN 'sf.ta' ELSE 'sf.tb' END AS tbl,
      |    k % 4 AS c, COUNT(*) AS cnt
      |  FROM base GROUP BY 1, 2
      |), stages AS (
      |  SELECT 'full' AS stage, 0 AS lo, 3 AS hi UNION ALL
      |  SELECT 'asof_1', 0, 1 UNION ALL
      |  SELECT 'diff_1_3', 2, 3
      |)
      |SELECT s.stage, cls.tbl,
      |  CAST(SUM(CAST(CEIL(cls.cnt / 100.0) AS BIGINT)) AS BIGINT)
      |    AS n_events,
      |  CAST(SUM(cls.cnt) AS BIGINT) AS n_rows
      |FROM stages s JOIN cls ON cls.c BETWEEN s.lo AND s.hi
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // cdc79 — THE OPERABLE GTID FAILOVER UNDER THE ORACLE (r16's second
  // CLI gate: cdc74 proves the engine's executed-set discard; MainSpec
  // drives the flag; this puts cli.Main.follow's --gtid-state /
  // --gtid-discard-from composition itself on the oracle hook). One
  // server identity (BinlogSink and TailFeedWriter share the default
  // sid): a bulk insert file (gno 1), then a crafted server file
  // (seq 500) with txns P (gno 9001) and Q (gno 9002) — drained with
  // the executed set maintained under <out>/gtid. FAILOVER: the
  // replica's file (seq 800) re-serves Q under the SAME gtid with
  // different framing (50-row events) and adds txn R (gno 9003); the
  // recovery run passes gtidDiscardFrom = 800 and must land R exactly
  // once while the re-served Q vanishes against the recovered set. The
  // oracle counts every class ONCE: a double-counted Q (set not
  // recovered), a missing R (over-discard), or a re-served bulk (seq
  // guard broken) are all hash mismatches.
  def cdc79FollowGtid(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ViewMaintenance
    val root = tmpFixtureDir("graft_cdc79_", dir)
    root.mkdirs()
    val feed = new java.io.File(root, "feed"); feed.mkdirs()
    val out = new java.io.File(root, "out").getPath
    val base = fixtureBase(spark, dir)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_id").as("k"),
        concat(lit("u"), col("user_id").cast("string")).as("v"))
    // bulk: everything outside the three crafted txn classes, gno 1
    val stg = new java.io.File(root, "stage_bulk").getPath
    graft.ingest.BinlogSink.writeChanges(
      base.filter(col("k") % 131 >= 3)
        .select(lit(1).as("op"), col("k"), col("v")).coalesce(1),
      stg, fileSeqStart = 1)
    Option(new java.io.File(stg).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .foreach { f =>
        require(f.renameTo(new java.io.File(feed, f.getName)),
          s"fixture deliver failed: $f")
      }
    val (tp, tq, tr) = (boundedClass(base, "cdc79", 0),
      boundedClass(base, "cdc79", 1), boundedClass(base, "cdc79", 2))
    val w = new TailFeedWriter(Seq(tp, tq, tr))
    val (fServer, _) = w.newFile()
    if (tp.nonEmpty) w.txn(fServer, 9001L, 17001L, tp)
    if (tq.nonEmpty) w.txn(fServer, 9002L, 17002L, tq)
    java.nio.file.Files.write(
      new java.io.File(feed, "mysql-bin.000500").toPath, fServer.bytes)
    graft.streaming.Drains.withDrainPartitions(spark) {
      graft.cli.Main.follow(spark, Seq(feed.getPath), out,
        purgeSafe = false, maxBytesPerTrigger = Some(1L << 30),
        gtidState = true)
    }
    // the failover: the replica re-serves Q (same gtid, 50-row framing)
    // and appends R under a higher-numbered file
    val (fReplica, _) = w.newFile()
    if (tq.nonEmpty) w.txn(fReplica, 9002L, 18002L, tq, perEvent = 50)
    if (tr.nonEmpty) w.txn(fReplica, 9003L, 18003L, tr)
    java.nio.file.Files.write(
      new java.io.File(feed, "mysql-bin.000800").toPath, fReplica.bytes)
    graft.streaming.Drains.withDrainPartitions(spark) {
      graft.cli.Main.follow(spark, Seq(feed.getPath), out,
        purgeSafe = false, maxBytesPerTrigger = Some(1L << 30),
        gtidState = true, gtidDiscardFrom = Some(800L))
    }
    // both wire shapes land in sf.delta (the sink and the crafted writer
    // share the default table identity)
    val state = graft.cli.Main.tableStateDir(s"$out/tables", "sf", "delta")
    ViewMaintenance.readState(spark, state,
        "event_type STRING, binlog_file STRING, file_seq BIGINT, " +
          "event_index BIGINT, xid BIGINT, " +
          "row_images ARRAY<ARRAY<STRING>>, batch_id BIGINT")
      .select(explode(col("row_images")).as("img"))
      .select(element_at(col("img"), 1).cast("long").as("k"))
      .withColumn("src", when(col("k") % 131 === 0, "txn_p")
        .when(col("k") % 131 === 1, "txn_q")
        .when(col("k") % 131 === 2, "txn_r").otherwise("bulk"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
      .orderBy("src")
  }

  val cdc79Oracle: String =
    """WITH base AS (
      |  SELECT event_id AS k FROM events
      |  WHERE event_type IN ('purchase', 'click', 'view')
      |)
      |SELECT CASE WHEN k % 131 = 0 THEN 'txn_p'
      |            WHEN k % 131 = 1 THEN 'txn_q'
      |            WHEN k % 131 = 2 THEN 'txn_r'
      |            ELSE 'bulk' END AS src,
      |  COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS k_sum
      |FROM base
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc79_follow_gtid" -> (cdc79FollowGtid _),
    "cdc78_follow_census" -> (cdc78FollowCensus _),
    "cdc77_release_diff" -> (cdc77ReleaseDiff _),
    "cdc76_consistent_demux" -> (cdc76ConsistentDemux _),
    "cdc75_time_travel" -> (cdc75TimeTravel _),
    "cdc74_gtid_sharded_failover" -> (cdc74GtidShardedFailover _),
    "cdc73_gtid_set_cutover" -> (cdc73GtidSetCutover _),
    "cdc72_purge_sharded_union" -> (cdc72PurgeShardedUnion _),
    "cdc71_tail_purge" -> (cdc71TailPurge _),
    "cdc70_gtid_durable" -> (cdc70GtidDurable _),
    "cdc69_sharded_union" -> (cdc69ShardedUnion _),
    "cdc68_checkpoint_upgrade" -> (cdc68CheckpointUpgrade _),
    "cdc67_tail_lag" -> (cdc67TailLag _),
    "cdc66_gtid_failover" -> (cdc66GtidFailover _),
    "cdc65_tail_cutover" -> (cdc65TailCutover _),
    "cdc64_tail_rotate" -> (cdc64TailRotate _),
    "cdc63_tail_demux" -> (cdc63TailDemux _),
    "cdc62_sketch_compaction" -> (cdc62SketchCompaction _),
    "cdc61_demux_lifecycle" -> (cdc61DemuxLifecycle _),
    "cdc60_snapshot_cutover" -> (cdc60SnapshotCutover _),
    "cdc59_compact_restart" -> (cdc59CompactRestartIvm _),
    "cdc58_tail_active" -> (cdc58TailActive _),
    "cdc57_multi_table_demux" -> (cdc57MultiTableDemux _),
    "cdc56_txn_atomic_apply" -> (cdc56TxnAtomicApply _),
    "cdc55_wire_evolution" -> (cdc55WireEvolution _),
    "cdc54_wire_dml_apply" -> (cdc54WireDmlApply _),
    "cdc53_restart_ivm" -> (cdc53RestartIvm _),
    "cdc51_compacted_ivm" -> (cdc51CompactedIvm _),
  )

  val oracles: Map[String, String] = Map(
    // both diff paths recomputed as direct class sums — partition
    // selection, the sign-flip, and the fold are all on the hook
    "cdc79_follow_gtid" -> cdc79Oracle,
    "cdc78_follow_census" -> cdc78Oracle,
    "cdc77_release_diff" -> cdc77Oracle,
    // three stages recomputed from the class predicates — the torn raw
    // view, the mark-bounded consistent view, and the completed batch
    "cdc76_consistent_demux" -> cdc76Oracle,
    // each mark recomputed from scratch with the class-membership
    // predicates — base choice, retention, and fold are all on the hook
    "cdc75_time_travel" -> cdc75Oracle,
    "cdc74_gtid_sharded_failover" -> cdc74Oracle,
    // the set-keyed bootstrap applies exactly what the failover gate
    // applies — snapshot + replica-only txns, torn class excluded
    "cdc73_gtid_set_cutover" -> cdc66Oracle,
    // purge-safe union serves exactly what the plain union serves —
    // retention below each shard's frontier is invisible by design
    "cdc72_purge_sharded_union" -> cdc69Oracle,
    "cdc71_tail_purge" -> cdc71Oracle,
    // the durable set changes WHERE the mark lives, not what is applied
    "cdc70_gtid_durable" -> cdc66Oracle,
    "cdc69_sharded_union" -> cdc69Oracle,
    "cdc68_checkpoint_upgrade" -> cdc68Oracle,
    "cdc67_tail_lag" -> cdc67Oracle,
    "cdc66_gtid_failover" -> cdc66Oracle,
    "cdc65_tail_cutover" -> cdc65Oracle,
    "cdc64_tail_rotate" -> cdc64Oracle,
    "cdc63_tail_demux" -> cdc63Oracle,
    // register-max fold through compact == the uncompacted sketch view
    "cdc62_sketch_compaction" -> CdcQueries.cdc49Oracle,
    "cdc61_demux_lifecycle" -> cdc61Oracle,
    "cdc60_snapshot_cutover" -> cdc60Oracle,
    // compaction composed with restart ⇒ still q66's exact decomposition
    "cdc59_compact_restart" -> AnalyticQueries.q66Oracle,
    "cdc58_tail_active" -> cdc58Oracle,
    "cdc57_multi_table_demux" -> cdc57Oracle,
    "cdc56_txn_atomic_apply" -> cdc56Oracle,
    "cdc55_wire_evolution" -> cdc55Oracle,
    "cdc54_wire_dml_apply" -> cdc54Oracle,
    // mid-stream compaction + covered AND in-flight replays absorbed =>
    // still q66's exact decomposition (isolates the compaction machinery)
    "cdc51_compacted_ivm" -> AnalyticQueries.q66Oracle,
    // two-run drain on one checkpoint + cross-restart replay absorbed =>
    // still q66's exact decomposition (isolates the offset/restart seam)
    "cdc53_restart_ivm" -> AnalyticQueries.q66Oracle,
  )
}
