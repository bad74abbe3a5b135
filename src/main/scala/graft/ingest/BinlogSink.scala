package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, max, octet_length}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.TaskContext
import org.apache.hadoop.fs.Path

/** Distributed binlog binary SINK — the write-side complement of
  * [[graft.sources.BinlogDataSource]], as [[AvroSink]] is to the Avro
  * source: each NON-EMPTY partition of the input encodes into ONE real
  * binlog-v4 file (FDE + GTID/BEGIN, TABLE_MAP/WRITE_ROWS in bounded
  * event batches, XID — CRC32-checksummed throughout, the cdc05 wire
  * discipline), named `mysql-bin.NNNNNN` by partition id so the source's
  * natural-version file order replays partitions deterministically.
  *
  * The encode runs inside `foreachPartition` — NO driver collect, unlike
  * the fixture writers whose 200-row test-vector bound is a contract
  * (`CdcQueries.writeCdc05Fixture`): this sink scales with the data, the
  * same way the reference's binlog artifacts are produced upstream by
  * the database, not funneled through one process. Its first consumer is
  * the streaming-IVM gate (cdc45), which replays a relational delta as a
  * genuine binlog change feed.
  *
  * IO goes through the Hadoop FileSystem API — `dir` is resolved with
  * `Path.getFileSystem` against the session's conf (captured driver-side
  * and broadcast into tasks, exactly as the read side does in
  * `BinlogDataSource`), so the sink is correct on HDFS/object storage,
  * not just a shared POSIX mount: executors write through `fs.create`,
  * never to their own local disks. Events STREAM to the output as they
  * are encoded (heap holds one event, not the file), so a partition's
  * file size is bounded by storage, not executor memory.
  *
  * Row shapes (r13): any arity of BIGINT / INT / STRING / FLOAT /
  * DOUBLE data columns — LONGLONG / LONG / VARCHAR / FLOAT / DOUBLE on
  * the wire, nulls carried by the row image's null bitmap. Floats
  * round-trip EXACTLY: the wire carries IEEE bytes and the decoder
  * renders java.lang.Float.toString, whose shortest-representation
  * contract parses back to the identical bits. VARCHAR bounds are DERIVED FROM THE DATA by
  * default (max UTF-8 byte length + headroom, one extra aggregate pass
  * over the input — pass an explicit `maxLen` to skip it when the input
  * is expensive to recompute), so a fixture-generator change at a new
  * scale factor can never trip a hard-coded bound (the r12-advice
  * d33/m11 2048-byte cliff).
  */
object BinlogSink {

  /** Write `df`'s first two columns (BIGINT key, STRING payload) as
    * checksummed binlog files under `dir`, one file per non-empty
    * partition — the keyed-insert convenience over [[writeChanges]].
    * Nulls are REJECTED loudly (a null key or payload in a keyed insert
    * feed is a caller bug, not a changelog value); use [[writeChanges]]
    * directly for nullable columns. `maxLen <= 0` (the default) derives
    * the VARCHAR bound from the data; a positive value pins it (longer
    * payloads fail the encoder loudly). `rowsPerEvent` bounds WRITE_ROWS
    * event size so a large partition becomes many bounded events, not
    * one giant one. */
  def writeKeyedStrings(df: DataFrame, dir: String, maxLen: Int = 0,
      rowsPerEvent: Int = 100): Unit =
    // col(), not selectExpr: a column name that parses as an expression
    // ("k-1", "user.id") must stay a name, never arithmetic or a struct
    // path. toDF renames positionally first, so the injected "_op" can
    // never collide with a caller column that happens to share the name.
    writeChangesImpl(df.select(col(df.columns(0)), col(df.columns(1)))
      .toDF("_k", "_v")
      .select(lit(1).as("_op"), col("_k").cast("bigint"), col("_v")),
      dir, maxLen, rowsPerEvent, allowNulls = false)

  /** Write a CHANGELOG: `df`'s first column is INT op = +1 (insert) or
    * −1 (delete); every following column is a data column encoded by its
    * Spark type — `BIGINT` → LONGLONG, `INT` → LONG, `STRING` → VARCHAR,
    * `FLOAT` → FLOAT, `DOUBLE` → DOUBLE (any other type is rejected
    * loudly). Inserts encode as WRITE_ROWS
    * events, deletes as DELETE_ROWS events — the binlog's NATIVE
    * retraction — batched in partition order so a decoder replaying the
    * file in event order reconstructs the exact signed multiset. NULL
    * data values ride the row image's null bitmap and decode back as
    * null `row_images` cells. One file per non-empty partition, as
    * [[writeKeyedStrings]]. The output directory is OVERWRITTEN at the
    * job level (DataFrame `mode("overwrite")` semantics) — required by
    * the first-attempt-wins task commit, which never deletes an
    * already-committed file.
    *
    * Wire identity and framing knobs (all default to the r12 shapes —
    * defaults produce byte-identical files to before they existed):
    *   - `table`/`tableId` name the TABLE_MAP target, so one FEED can
    *     carry several tables' changelogs (stage per-table sink runs,
    *     deliver into one watched dir — the decoder's per-file registry
    *     keys on table_id and every event carries `schema`/`table`);
    *   - `fileSeqStart` offsets the `mysql-bin.NNNNNN` numbering, so a
    *     second installment (later delivery, another table, an evolved
    *     schema) sorts strictly AFTER an earlier one in the source's
    *     natural-version order instead of colliding with it;
    *   - `rowsPerTxn` > 0 closes the transaction (XID) and opens a new
    *     one (GTID, BEGIN) every N rows, producing the many-transactions-
    *     per-file layout real binlogs have; 0 keeps one transaction per
    *     file. An event never spans a transaction boundary.
    *
    * DETERMINISM PRECONDITION: `df` must be deterministic under
    * recomputation. Two places rely on it — (a) the first-attempt-wins
    * task commit keeps whichever attempt's file landed first, which is a
    * correct encode only because sibling attempts carry the same row
    * multiset, and (b) the derived-VARCHAR pass (`maxLen <= 0`) computes
    * bounds in a first aggregate pass and encodes in a second, so a
    * nondeterministic payload (e.g. rand()-derived) could exceed its own
    * declared bound mid-write (loud, but after temp files exist).
    * localCheckpoint a nondeterministic frame before the sink, or pin
    * `maxLen`. */
  def writeChanges(df: DataFrame, dir: String, maxLen: Int = 0,
      rowsPerEvent: Int = 100, table: String = "delta", tableId: Long = 11L,
      fileSeqStart: Int = 1, rowsPerTxn: Int = 0): Unit =
    writeChangesImpl(df, dir, maxLen, rowsPerEvent, allowNulls = true,
      dml = false, table = table, tableId = tableId,
      fileSeqStart = fileSeqStart, rowsPerTxn = rowsPerTxn)

  /** Write a FULL-DML changelog — the one wire shape [[writeChanges]]
    * does not speak: `df`'s first column is INT op ∈ {+1 insert,
    * 0 update, −1 delete}; the remaining 2N columns are the BEFORE
    * image (N columns) followed by the AFTER image (N columns, same
    * types — the binlog_row_image=FULL layout every real changelog
    * carries). Inserts encode their AFTER image as WRITE_ROWS, deletes
    * their BEFORE image as DELETE_ROWS, and updates BOTH as
    * UPDATE_ROWS (type 31, paired images — the decoder surfaces them
    * as two consecutive `row_images` entries, before then after).
    * Unused images (an insert's before half, a delete's after half)
    * are ignored and may be null. Types/bounds/nulls as
    * [[writeChanges]]; a VARCHAR column's derived bound covers both
    * its images, and the same wire identity/framing knobs apply. */
  def writeDml(df: DataFrame, dir: String, maxLen: Int = 0,
      rowsPerEvent: Int = 100, table: String = "delta", tableId: Long = 11L,
      fileSeqStart: Int = 1, rowsPerTxn: Int = 0): Unit =
    writeChangesImpl(df, dir, maxLen, rowsPerEvent, allowNulls = true,
      dml = true, table = table, tableId = tableId,
      fileSeqStart = fileSeqStart, rowsPerTxn = rowsPerTxn)

  private def writeChangesImpl(df: DataFrame, dir: String, maxLen: Int,
      rowsPerEvent: Int, allowNulls: Boolean, dml: Boolean = false,
      table: String = "delta", tableId: Long = 11L,
      fileSeqStart: Int = 1, rowsPerTxn: Int = 0): Unit = {
    require(fileSeqStart >= 1, s"fileSeqStart must be >= 1, got $fileSeqStart")
    require(rowsPerTxn >= 0, s"rowsPerTxn must be >= 0, got $rowsPerTxn")
    import BinlogBinaryWriter._
    val sconf = org.apache.spark.graftshim.SerializableHadoopConf.session()
    val dirPath = new Path(dir)
    val driverFs = dirPath.getFileSystem(sconf.value)
    // OVERWRITE semantics at the JOB level (Spark's mode("overwrite")):
    // clear the target before the job, because task commits are
    // first-attempt-wins (an existing committed file is KEPT — see the
    // rename protocol below), so stale files from a previous job must
    // not survive into this one's output.
    driverFs.delete(dirPath, true)
    driverFs.mkdirs(dirPath)
    // qualified URI string, so executors resolve the SAME filesystem the
    // driver did even when `dir` was scheme-less
    val dirUri = driverFs.makeQualified(dirPath).toString
    // Alias the positional columns to internal names FIRST: the
    // downstream select resolves by name, and a caller whose own columns
    // shadow the aliases (e.g. a payload column literally named "_op")
    // must not make col("_op") ambiguous. toDF renames ALL columns
    // positionally, so no caller name can collide.
    val c = df.columns
    require(c.length >= 2,
      s"writeChanges needs (op, data columns...); got ${c.length}")
    // dml mode: (op, before-image columns, after-image columns) — the
    // wire table has nWire columns, each data row carries 2 images
    val nData = c.length - 1
    require(!dml || (nData % 2 == 0 && nData >= 2),
      s"writeDml needs (op, before x N, after x N); got $nData data columns")
    val nWire = if (dml) nData / 2 else nData
    val dataNames = (1 until c.length).map(i => s"_c$i")
    val prepared = df.select(c.toIndexedSeq.map(col): _*)
      .toDF(("_op" +: dataNames): _*)
      .select(col("_op").cast("int") +: dataNames.map(col): _*)
    val types: Seq[DataType] = prepared.schema.drop(1).map(_.dataType)
    types.zipWithIndex.foreach { case (t, i) =>
      require(t == LongType || t == IntegerType || t == StringType ||
          t == FloatType || t == DoubleType,
        s"unsupported wire type for data column ${i + 1}: $t " +
          "(supported: BIGINT -> LONGLONG, INT -> LONG, STRING -> VARCHAR, " +
          "FLOAT -> FLOAT, DOUBLE -> DOUBLE)")
    }
    if (dml) (0 until nWire).foreach { i =>
      require(types(i) == types(i + nWire),
        s"writeDml before/after type mismatch at wire column $i: " +
          s"${types(i)} vs ${types(i + nWire)}")
    }
    // VARCHAR bounds: pinned by the caller, or derived from the data
    // (max UTF-8 byte length + headroom, floor 20) in ONE aggregate —
    // the TABLE_MAP must declare a bound every payload honors, and a
    // literal bound is a silent cliff at the next scale factor. The
    // derive pass RECOMPUTES the input (see the determinism
    // precondition in the scaladoc): pass-1 bounds cover pass-2
    // payloads only for a deterministic frame.
    val strIdx = types.zipWithIndex.collect { case (StringType, i) => i }
    val bounds: Map[Int, Int] =
      if (maxLen > 0) strIdx.map(_ -> maxLen).toMap
      else if (strIdx.isEmpty) Map.empty[Int, Int]
      else {
        val aggs = strIdx.map(i =>
          max(octet_length(col(dataNames(i)))).as(s"_m$i"))
        val row = prepared.agg(aggs.head, aggs.tail: _*).head()
        strIdx.zipWithIndex.map { case (i, j) =>
          i -> math.max((if (row.isNullAt(j)) 0 else row.getInt(j)) + 16, 20)
        }.toMap
      }
    // a VARCHAR wire column's bound covers BOTH its images in dml mode
    val wireBounds: Map[Int, Int] =
      if (!dml) bounds
      else bounds.keys.map(_ % nWire).map { i =>
        i -> math.max(bounds.getOrElse(i, 0), bounds.getOrElse(i + nWire, 0))
      }.toMap
    val cols: Seq[ColDef] = types.take(nWire).zipWithIndex.map {
      case (LongType, _) => ColDef.longlong
      case (IntegerType, _) => ColDef.long
      case (FloatType, _) => ColDef.float
      case (DoubleType, _) => ColDef.double
      case (StringType, i) => ColDef.varchar(wireBounds(i))
      case (t, i) => throw new IllegalStateException(s"unreachable: $t at $i")
    }
    prepared.rdd.foreachPartition { rows =>
        if (rows.hasNext) {
          val tc = TaskContext.get()
          val pid = tc.partitionId()
          val t0 = 1714564800L
          val sid = (1 to 16).map(_.toByte).toArray
          // task-commit protocol: write to a hidden per-ATTEMPT temp path,
          // rename into place only after a fully-written close — a failed
          // or speculative attempt never leaves a truncated file under the
          // final name (readers skip "."-prefixed names), and concurrent
          // attempts never contend on one path. Commit is FIRST-attempt-
          // wins: a committed file is never deleted (a zombie attempt
          // deleting the winner's file and then dying would silently lose
          // the partition), and a loser discards its own temp — the two
          // attempts carry the same row multiset, so either file is a
          // correct encode of the partition. Hadoop rename/delete report
          // failure by RETURNING false, not throwing — every result is
          // checked, so a failed commit fails the task loudly instead of
          // reporting success with no output.
          val fin = new Path(dirUri, f"mysql-bin.${fileSeqStart + pid}%06d")
          val tmp = new Path(dirUri,
            f".mysql-bin.${fileSeqStart + pid}%06d.attempt${tc.taskAttemptId()}")
          val fs = fin.getFileSystem(sconf.value)
          val os = fs.create(tmp, true)
          var committed = false
          try {
            val f = new FileBuilder(checksums = true,
              sink = new java.io.BufferedOutputStream(os, 1 << 16))
            f.fde(t0)
            // transaction framing: txnIdx 0 reproduces the historical
            // single-transaction gno/xid values exactly at the default
            // fileSeqStart=1; later txns step by a stride far past any
            // realistic partition id. fileSeqStart is folded into the
            // base so multi-installment staging into one watched dir
            // gets (sid, gno) pairs exactly as distinct as its file
            // numbering — two installments can collide on wire identity
            // only if their file names would collide too. Remaining
            // bound (documented, not closed): a feed with >100,000
            // partitions aliases pid into a later txnIdx's stride.
            val txnBase = fileSeqStart.toLong - 1L + pid
            var txnIdx = 0
            var rowsInTxn = 0
            def openTxn(): Unit = {
              f.event(t0, 33, gtidBody(sid, txnBase + 1L + 100000L * txnIdx))
              f.event(t0, 2, queryBody("sf", "BEGIN"))
            }
            def closeTxn(): Unit = {
              f.event(t0, 16, xidBody(1000L + txnBase + 100000L * txnIdx))
              txnIdx += 1
              rowsInTxn = 0
            }
            openTxn()
            // group CONSECUTIVE same-op rows into one event (an event has
            // one type), preserving partition order on the wire
            val it = rows.map { r =>
              val op = r.getInt(0)
              require(op == 1 || op == -1 || (dml && op == 0),
                if (dml) s"op must be +1/0/-1, got $op"
                else s"op must be +1/-1, got $op")
              val cells: Seq[Option[Array[Byte]]] =
                types.zipWithIndex.map { case (t, i) =>
                  val fi = i + 1
                  if (r.isNullAt(fi)) {
                    require(allowNulls,
                      if (i == 0) "null key: the wire key column is a NOT " +
                        "NULL LONGLONG; filter or fill nulls before the sink"
                      else s"null payload for key ${r.get(1)}: the wire " +
                        "column is declared NOT NULL VARCHAR; filter or " +
                        "fill nulls before the sink")
                    None
                  } else Some(t match {
                    case LongType => encLongLong(r.getLong(fi))
                    case IntegerType => encLong(r.getInt(fi))
                    case FloatType => encFloat(r.getFloat(fi))
                    case DoubleType => encDouble(r.getDouble(fi))
                    case StringType =>
                      val s = r.getString(fi)
                      // the TABLE_MAP declares VARCHAR(bound); a longer
                      // payload would still self-describe on the wire but
                      // lie to every schema-aware consumer — reject it
                      val b = if (dml) wireBounds(i % nWire) else bounds(i)
                      require(s.getBytes("UTF-8").length <= b,
                        s"payload exceeds declared VARCHAR($b): '$s'")
                      encVarchar(s, b)
                    case other => throw new IllegalStateException(
                      s"unreachable wire type $other")
                  })
                }
              // (op, before image, after image): non-dml rows carry ONE
              // image (both halves point at it); dml rows split 2N cells
              if (dml) { val (b, a) = cells.splitAt(nWire); (op, b, a) }
              else (op, cells, cells)
            }.buffered
            while (it.hasNext) {
              if (rowsPerTxn > 0 && rowsInTxn >= rowsPerTxn) {
                closeTxn(); openTxn()
              }
              val op = it.head._1
              // an event never spans a transaction boundary: cap the
              // batch at whichever comes first — the event bound or the
              // rows left in this transaction
              val cap =
                if (rowsPerTxn > 0) math.min(rowsPerEvent, rowsPerTxn - rowsInTxn)
                else rowsPerEvent
              val batch = scala.collection.mutable.ArrayBuffer
                .empty[(Seq[Option[Array[Byte]]], Seq[Option[Array[Byte]]])]
              while (it.hasNext && it.head._1 == op && batch.size < cap) {
                val t = it.next(); batch += ((t._2, t._3))
              }
              rowsInTxn += batch.size
              f.event(t0, 19, tableMapBody(tableId, "sf", table, cols))
              op match {
                case 1 => f.event(t0, 30, rowsBody(tableId, cols.size,
                  batch.toSeq.map(_._2)))             // insert: AFTER image
                case -1 => f.event(t0, 32, rowsBody(tableId, cols.size,
                  batch.toSeq.map(_._1)))             // delete: BEFORE image
                case 0 => f.event(t0, 31, updateRowsBody(tableId, cols.size,
                  batch.toSeq))                       // update: both, paired
              }
            }
            closeTxn()
            f.flush()
            committed = true
          } finally {
            // failure path: a close() throwing on an already-broken stream
            // must not mask the root cause or skip the temp delete — leaked
            // "."-files are skipped by readers, so cleanup is best-effort
            if (committed) {
              os.close()
              // First-attempt-wins: a committed file is never replaced.
              // HDFS rename refuses an existing destination by itself; a
              // local FS delegates to POSIX rename(2), which silently
              // REPLACES — so check exists BEFORE renaming there too. The
              // check-then-rename window (TOCTOU) remains open on local
              // FS and is documented rather than closed: sibling attempts
              // encode the same row multiset, so a racing replacement is
              // still a correct encode of the partition.
              if (fs.exists(fin)) fs.delete(tmp, false) // sibling committed
              else if (!fs.rename(tmp, fin)) {
                if (fs.exists(fin)) fs.delete(tmp, false) // lost the race
                else throw new java.io.IOException(
                  s"binlog sink commit failed: rename $tmp -> $fin")
              }
            } else {
              // failure path: close() often throws on an already-broken
              // stream — suppress it so the ROOT-CAUSE exception
              // propagates and the temp delete still runs (leaked
              // "."-files would be skipped by readers anyway; this keeps
              // cleanup deterministic, not just best-effort)
              try os.close()
              catch { case scala.util.control.NonFatal(_) => () }
              fs.delete(tmp, false) // failed attempt leaves nothing
            }
          }
        }
      }
  }
}
