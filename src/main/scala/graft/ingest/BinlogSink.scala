package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.TaskContext

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
      rowsPerEvent: Int = 100): Unit = {
    import BinlogBinaryWriter._
    val out = new java.io.File(dir)
    out.mkdirs()
    val dirPath = out.getPath
    val cols = Seq(ColDef.longlong, ColDef.varchar(maxLen))
    df.selectExpr("cast(" + df.columns(0) + " as bigint)", df.columns(1))
      .rdd.foreachPartition { rows =>
        if (rows.hasNext) {
          val pid = TaskContext.getPartitionId()
          val t0 = 1714564800L
          val sid = (1 to 16).map(_.toByte).toArray
          val f = new FileBuilder(checksums = true)
          f.fde(t0)
          f.event(t0, 33, gtidBody(sid, pid + 1L))
          f.event(t0, 2, queryBody("sf", "BEGIN"))
          rows.grouped(rowsPerEvent).foreach { batch =>
            val images = batch.map { r =>
              val s = r.getString(1)
              // the TABLE_MAP declares VARCHAR(maxLen); a longer payload
              // would still self-describe on the wire but lie to every
              // schema-aware consumer — reject it at the sink
              require(s.getBytes("UTF-8").length <= maxLen,
                s"payload exceeds declared VARCHAR($maxLen): '$s'")
              Seq(Some(encLongLong(r.getLong(0))), Some(encVarchar(s, maxLen)))
            }.toSeq
            f.event(t0, 19, tableMapBody(11, "sf", "delta", cols))
            f.event(t0, 30, rowsBody(11, cols.size, images))
          }
          f.event(t0, 16, xidBody(1000L + pid))
          java.nio.file.Files.write(
            new java.io.File(dirPath, f"mysql-bin.${pid + 1}%06d").toPath,
            f.bytes)
        }
      }
  }
}
