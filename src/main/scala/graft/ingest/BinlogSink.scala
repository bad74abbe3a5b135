package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
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
  * Shape supported: (BIGINT key, STRING payload) — LONGLONG + VARCHAR on
  * the wire. Wider rows belong to the fixture writers until a caller
  * needs them distributed; this sink deliberately starts at the shape
  * its gate exercises rather than shipping untested encoders.
  */
object BinlogSink {

  /** Write `df`'s first two columns (BIGINT, STRING) as checksummed
    * binlog files under `dir`, one file per non-empty partition.
    * `maxLen` bounds the VARCHAR payload (longer strings fail the
    * encoder loudly); `rowsPerEvent` bounds WRITE_ROWS event size so a
    * large partition becomes many bounded events, not one giant one. */
  def writeKeyedStrings(df: DataFrame, dir: String, maxLen: Int = 20,
      rowsPerEvent: Int = 100): Unit =
    // col(), not selectExpr: a column name that parses as an expression
    // ("k-1", "user.id") must stay a name, never arithmetic or a struct
    // path. toDF renames positionally first, so the injected "_op" can
    // never collide with a caller column that happens to share the name.
    writeChanges(df.select(col(df.columns(0)), col(df.columns(1)))
      .toDF("_k", "_v").select(lit(1).as("_op"), col("_k"), col("_v")),
      dir, maxLen, rowsPerEvent)

  /** Write a CHANGELOG: `df`'s first three columns are (INT op, BIGINT
    * key, STRING payload) with op = +1 (insert) or −1 (delete). Inserts
    * encode as WRITE_ROWS events, deletes as DELETE_ROWS events — the
    * binlog's NATIVE retraction — batched in partition order so a
    * decoder replaying the file in event order reconstructs the exact
    * signed multiset. One file per non-empty partition, as
    * [[writeKeyedStrings]]. The output directory is OVERWRITTEN at the
    * job level (DataFrame `mode("overwrite")` semantics) — required by
    * the first-attempt-wins task commit, which never deletes an
    * already-committed file. */
  def writeChanges(df: DataFrame, dir: String, maxLen: Int = 20,
      rowsPerEvent: Int = 100): Unit = {
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
    val cols = Seq(ColDef.longlong, ColDef.varchar(maxLen))
    // Alias the three positional columns to internal names FIRST: the
    // downstream select resolves by name, and a caller whose own columns
    // shadow the aliases (e.g. a payload column literally named "_op")
    // must not make col("_op") ambiguous. toDF renames ALL columns
    // positionally, so no caller name can collide.
    val c = df.columns
    require(c.length >= 3,
      s"writeChanges needs (op, key, payload) columns; got ${c.length}")
    df.select(col(c(0)), col(c(1)), col(c(2))).toDF("_op", "_k", "_v")
      .select(col("_op").cast("int"), col("_k").cast("bigint"), col("_v"))
      .rdd.foreachPartition { rows =>
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
          val fin = new Path(dirUri, f"mysql-bin.${pid + 1}%06d")
          val tmp = new Path(dirUri,
            f".mysql-bin.${pid + 1}%06d.attempt${tc.taskAttemptId()}")
          val fs = fin.getFileSystem(sconf.value)
          val os = fs.create(tmp, true)
          var committed = false
          try {
            val f = new FileBuilder(checksums = true,
              sink = new java.io.BufferedOutputStream(os, 1 << 16))
            f.fde(t0)
            f.event(t0, 33, gtidBody(sid, pid + 1L))
            f.event(t0, 2, queryBody("sf", "BEGIN"))
            // group CONSECUTIVE same-op rows into one event (an event has
            // one type), preserving partition order on the wire
            val it = rows.map { r =>
              val op = r.getInt(0)
              require(op == 1 || op == -1, s"op must be +1/-1, got $op")
              require(!r.isNullAt(1),
                "null key: the wire key column is a NOT NULL LONGLONG; " +
                "filter or fill nulls before the sink")
              require(!r.isNullAt(2),
                s"null payload for key ${r.getLong(1)}: the wire column is " +
                "declared NOT NULL VARCHAR; filter or fill nulls before the sink")
              val s = r.getString(2)
              // the TABLE_MAP declares VARCHAR(maxLen); a longer payload
              // would still self-describe on the wire but lie to every
              // schema-aware consumer — reject it at the sink
              require(s.getBytes("UTF-8").length <= maxLen,
                s"payload exceeds declared VARCHAR($maxLen): '$s'")
              (op, Seq(Some(encLongLong(r.getLong(1))),
                Some(encVarchar(s, maxLen))))
            }.buffered
            while (it.hasNext) {
              val op = it.head._1
              val batch = scala.collection.mutable.ArrayBuffer
                .empty[Seq[Option[Array[Byte]]]]
              while (it.hasNext && it.head._1 == op && batch.size < rowsPerEvent)
                batch += it.next()._2
              f.event(t0, 19, tableMapBody(11, "sf", "delta", cols))
              f.event(t0, if (op == 1) 30 else 32,
                rowsBody(11, cols.size, batch.toSeq))
            }
            f.event(t0, 16, xidBody(1000L + pid))
            f.flush()
            committed = true
          } finally {
            os.close()
            if (committed) {
              if (!fs.rename(tmp, fin)) {
                // rename refuses when fin exists: a sibling attempt
                // already committed this partition — keep ITS file,
                // discard ours; any other refusal is a real commit
                // failure and must fail the task
                if (fs.exists(fin)) fs.delete(tmp, false)
                else throw new java.io.IOException(
                  s"binlog sink commit failed: rename $tmp -> $fin")
              }
            } else fs.delete(tmp, false) // failed attempt leaves nothing
          }
        }
      }
  }
}
