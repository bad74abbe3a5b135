package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Intra-file split index for huge binlog binary files — the last per-file
  * serialization in S1 (one binlog file = one task). A binlog has no sync
  * markers: events chain head-to-tail and rows events depend on the
  * TABLE_MAP/GTID state before them, so unlike Avro (sync-seek,
  * [[graft.sources.AvroDataSource]]) a byte range is not independently
  * decodable. The standard fix is an offset index: one header-only pass
  * records transaction-start boundaries — GTID/ANONYMOUS_GTID events begin
  * a transaction, and every transaction re-emits the TABLE_MAPs its rows
  * events need (row-based replication writes a TABLE_MAP per statement) —
  * and later scans range-split huge files at those boundaries, seeding the
  * decoder state (event index, CRC32 tail length) from the index.
  *
  * The index pass is itself distributed (one task per file) and reads
  * headers only: bodies are skipped except FORMAT_DESCRIPTION (checksum
  * algorithm) and TRANSACTION_PAYLOAD (inner-event count, needed so
  * event_index stays globally consistent across ranges), so it runs at
  * sequential-IO speed, not decode speed. Reference analogue: the
  * sequential per-file loop `/root/reference/comparator.sh:85-101` — the
  * engine splits what the reference serializes.
  *
  * Binlog files are immutable once rotated; the index stores the file
  * length it walked and the scan falls back to whole-file decode when the
  * length no longer matches — the index is an optimization, never a
  * correctness dependency.
  */
object BinlogOffsetIndex {

  /** One independently-decodable byte range of one file. `start == 0`
    * means "from the magic" (decode normally); otherwise `start` is a
    * transaction boundary and `startIndex`/`checksumLen` seed the state
    * the skipped prefix would have produced. Keyed by the FULL path, not
    * the basename: a glob spanning subdirectories can hold duplicate
    * basenames (per-shard `mysql-bin.000001`), and applying one file's
    * ranges to another whenever lengths coincide would silently decode
    * garbage (ADVICE r6). */
  case class SplitRange(path: String, start: Long, end: Long,
      startIndex: Long, checksumLen: Int, fileLen: Long) {
    def basename: String = path.split('/').last
  }

  /** Shard file name for one binlog file: basename for readability plus a
    * path digest for identity — two `mysql-bin.000001` in different
    * directories get distinct shards. Hashes the QUALIFIED path (scheme +
    * authority), so `/data/x` and `file:/data/x` agree. */
  def shardName(conf: org.apache.hadoop.conf.Configuration, file: String): String = {
    val q = qualify(conf, file)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(q.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"${q.split('/').last}.$hex.idx"
  }

  /** Fully-qualified form of a path (fs scheme + authority made explicit)
    * — index identity must not depend on how the caller spelled the
    * path. */
  private def qualify(conf: org.apache.hadoop.conf.Configuration,
      file: String): String = {
    val p = new Path(file)
    p.getFileSystem(conf).makeQualified(p).toString
  }

  /** Walk every binlog file under `path` (one Spark task per file),
    * recording a split boundary at the first transaction start at or
    * after each `splitBytes` multiple. The index is a DIRECTORY at
    * `indexPath` holding ONE SHARD PER BINLOG FILE (tab-separated, one
    * line per range), each written atomically (temp + rename) by the task
    * that walked the file: nothing funnels through the driver — at 100 TB
    * (~800 k ranges) a single collected index file would be a driver
    * choke and one huge rename — and readers load only the shards of the
    * files they scan. Returns the number of ranges written. */
  def build(spark: SparkSession, path: String, indexPath: String,
      splitBytes: Long = 128L << 20): Long =
    buildFiles(spark, graft.sources.BinlogScan.listFiles(path).toSeq,
      indexPath, splitBytes)

  /** [[build]] restricted to an explicit file list — the streaming tail
    * indexes just the files that appeared since the last trigger. */
  def buildFiles(spark: SparkSession, files: Seq[String], indexPath: String,
      splitBytes: Long = 128L << 20): Long = {
    if (files.isEmpty) return 0L
    val sb = splitBytes
    val ip = indexPath
    // executors must resolve paths with the SESSION's Hadoop conf
    // (spark.hadoop.* credentials / fs impls), not a bare Configuration()
    val confBc = spark.sparkContext.broadcast(
      org.apache.spark.graftshim.SerializableHadoopConf.session())
    val dir = new Path(indexPath)
    val dirFs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirFs.mkdirs(dir)
    spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .map { f =>
        val ranges = walkFile(f, sb, confBc.value.value)
        writeShard(confBc.value.value, ip, f, ranges)
        ranges.length.toLong
      }
      .sum().toLong
  }

  /** Atomically write one file's shard. Write-then-rename: a reader must
    * never observe a partial shard — a truncation landing exactly on a
    * line boundary would parse as a complete (wrong) index, which the
    * malformed-line fallback cannot catch. */
  private def writeShard(conf: org.apache.hadoop.conf.Configuration,
      indexPath: String, file: String, ranges: Seq[SplitRange]): Unit = {
    val out = new Path(indexPath, shardName(conf, file))
    val fs = out.getFileSystem(conf)
    val tmp = new Path(out.getParent,
      "." + out.getName + ".inprogress." + java.util.UUID.randomUUID())
    val os = fs.create(tmp, true)
    try os.write(ranges.map(r =>
      s"${r.path}\t${r.start}\t${r.end}\t${r.startIndex}\t${r.checksumLen}\t${r.fileLen}")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally os.close()
    fs.delete(out, false)
    require(fs.rename(tmp, out), s"could not move index shard into place at $out")
  }

  /** Read ONE file's ranges from its shard, in order — reads only this
    * file's shard, never the siblings'. A missing, truncated,
    * partially-written (concurrent auto-build), or otherwise malformed
    * shard — or one whose recorded path is not `file` (digest collision /
    * hand-moved index) — yields an EMPTY seq: the scan then decodes the
    * whole file, honoring the "optimization, never a correctness
    * dependency" contract instead of failing at planning. */
  def loadFile(conf: org.apache.hadoop.conf.Configuration,
      indexPath: String, file: String): Seq[SplitRange] =
    try {
      val q = qualify(conf, file)
      val p = new Path(indexPath, shardName(conf, file))
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val ranges = text.linesIterator.filter(_.nonEmpty).map { line =>
          val a = line.split('\t')
          require(a.length == 6, s"malformed index line: $line")
          SplitRange(a(0), a(1).toLong, a(2).toLong, a(3).toLong, a(4).toInt, a(5).toLong)
        }.toSeq
        require(ranges.forall(_.path == q),
          s"shard ${p.getName} does not describe $q")
        ranges.sortBy(_.start)
      }
    } catch {
      case e @ (_: RuntimeException | _: java.io.IOException) =>
        System.err.println(
          s"[graft] split-index shard for $file unreadable (${e.getMessage}); " +
            "falling back to whole-file decode")
        Seq.empty
    }

  /** Does the index directory exist yet? The planning short-circuit:
    * an absent directory means no file has a shard, so [[loadFiles]]
    * callers skip the per-file shard probes entirely (one round trip
    * instead of one per file on a never-built index). A present
    * directory with a missing shard = that file appeared after the
    * build and decodes whole. */
  def exists(conf: org.apache.hadoop.conf.Configuration, indexPath: String): Boolean =
    try {
      val p = new Path(indexPath)
      p.getFileSystem(conf).exists(p)
    } catch { case _: java.io.IOException => false }

  /** Bound on one parallel planning sweep (shard loads or stats). On
    * expiry the caller degrades instead of hanging: ranges fall back to
    * whole-file decode, stats to a direct per-file call — the
    * "optimization, never a correctness dependency" contract again. */
  private val PlanningSweepTimeout = scala.concurrent.duration.Duration(5, "min")

  /** Driver-side parallel sweep over planning-time filesystem round trips
    * (IO-bound → fixed 32-thread daemon pool). The pool is PER SWEEP and
    * `shutdownNow()`'d on exit: `Await.result`'s timeout abandons but does
    * not cancel in-flight futures, so on a shared pool a wedged filesystem
    * call would occupy a thread forever and repeated timeouts would starve
    * every later sweep into silent whole-file-decode degradation (r8
    * ADVICE). shutdownNow interrupts the stragglers and the pool dies with
    * the sweep. */
  private def parallelSweep[A](files: Seq[String], what: String)(
      one: String => A): Option[Map[String, A]] = {
    import scala.concurrent.{Await, Future}
    val exec = java.util.concurrent.Executors.newFixedThreadPool(
      32,
      (r: Runnable) => {
        val t = new Thread(r, "graft-idx-load")
        t.setDaemon(true)
        t
      })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(exec)
    try Some(Await.result(
      Future.traverse(files)(f => Future(f -> one(f))), PlanningSweepTimeout).toMap)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          s"[graft] parallel $what sweep over ${files.length} files exceeded " +
            s"$PlanningSweepTimeout; degrading (a hung filesystem call would " +
            "otherwise block planning forever)")
        None
    } finally exec.shutdownNow()
  }

  /** [[loadFile]] over many files with the shard reads in parallel —
    * batch planning would otherwise pay one filesystem round trip PER
    * FILE serially (r7 ADVICE); on an object store with thousands of
    * binlog files that serial chain dominates `planInputPartitions`.
    * Short-circuits to all-empty (= whole-file decode everywhere) when
    * the index directory has never been built, and degrades to all-empty
    * if the sweep times out (a hung remote read must not hang planning). */
  def loadFiles(conf: org.apache.hadoop.conf.Configuration, indexPath: String,
      files: Seq[String]): Map[String, Seq[SplitRange]] = {
    if (files.isEmpty) return Map.empty
    if (!exists(conf, indexPath)) return files.map(_ -> Seq.empty[SplitRange]).toMap
    parallelSweep(files, "index-shard")(f => loadFile(conf, indexPath, f))
      .getOrElse(files.map(_ -> Seq.empty[SplitRange]).toMap)
  }

  /** Parallel `getFileStatus` lengths for the kept files — the range
    * validity check (`fileLen` matches the index entry) otherwise pays
    * the same serial per-file metadata chain [[loadFiles]] removes.
    * Files whose stat fails (or a timed-out sweep) are simply absent;
    * callers fall back to a direct call or whole-file decode. */
  def statLens(conf: org.apache.hadoop.conf.Configuration,
      files: Seq[String]): Map[String, Long] = {
    if (files.isEmpty) return Map.empty
    parallelSweep(files, "file-stat") { f =>
      try {
        val p = new Path(f)
        Some(p.getFileSystem(conf).getFileStatus(p).getLen)
      } catch { case _: java.io.IOException => None }
    } match {
      case Some(m) => m.collect { case (f, Some(len)) => f -> len }
      case None => Map.empty
    }
  }

  /** Header-only walk of one file → its split ranges (a single whole-file
    * range when no boundary lands past `splitBytes`). */
  private[ingest] def walkFile(file0: String, splitBytes: Long,
      conf: org.apache.hadoop.conf.Configuration): Seq[SplitRange] = {
    val file = qualify(conf, file0) // ranges carry the canonical identity
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val base = p.getName
    val in = new java.io.BufferedInputStream(fs.open(p), 1 << 16)
    try {
      val magic = new Array[Byte](4)
      require(readFully(in, magic) && java.util.Arrays.equals(magic, BinlogBinaryParser.Magic),
        s"$base: not a binlog file (bad magic)")
      var pos = 4L
      var index = 0L
      var ckLen = 0
      var nextTarget = splitBytes
      // (boundary offset, event index there, checksum length there)
      val bounds = collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      val hdr = new Array[Byte](19)
      var done = false
      while (!done) {
        if (!readFully(in, hdr)) done = true
        else {
          val buf = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
          buf.getInt // timestamp
          val typeCode = buf.get & 0xFF
          buf.getInt // server id
          val eventSize = buf.getInt & 0xFFFFFFFFL
          if (eventSize < 19 || eventSize > Int.MaxValue) done = true
          else {
            if ((typeCode == 33 || typeCode == 34) && pos >= nextTarget) {
              bounds += ((pos, index, ckLen))
              nextTarget = pos + splitBytes
            }
            val bodyLen = eventSize.toInt - 19
            typeCode match {
              case 15 => // FORMAT_DESCRIPTION: checksum algorithm tail
                val body = new Array[Byte](bodyLen)
                if (!readFully(in, body)) done = true
                else if (bodyLen >= 62) {
                  val alg = body(bodyLen - 5) & 0xFF
                  if (alg == 1) ckLen = 4 else if (alg == 0) ckLen = 0
                }
              case 40 => // TRANSACTION_PAYLOAD: inner events share the
                // file's event_index sequence, so count them
                val body = new Array[Byte](bodyLen)
                if (!readFully(in, body)) done = true
                else index += countPayloadEvents(body, ckLen, 1)
              case _ =>
                if (!skipFully(in, bodyLen)) done = true
            }
            if (!done) { index += 1; pos += eventSize }
          }
        }
      }
      if (bounds.isEmpty) Seq(SplitRange(file, 0L, fileLen, 0L, 0, fileLen))
      else {
        val starts = (0L, 0L, 0) +: bounds.toSeq
        val ends = bounds.toSeq.map(_._1) :+ fileLen
        starts.zip(ends).map { case ((s, idx, ck), e) =>
          SplitRange(file, s, e, idx, ck, fileLen)
        }
      }
    } finally in.close()
  }

  /** Header-only walk of one file from a known decode state, returning
    * the COMMIT FRONTIER: the byte position just past the last event that
    * CLOSES a transaction at or after `fromPos`, with the decoder state
    * (event index, checksum length) there — the safe stop for a
    * micro-batch tail of a GROWING binlog file (the torn tail past it —
    * rows flushed, commit record not yet written — is held back, cdc56's
    * class, resumed from the returned state next trigger). Closing
    * events: XID (type 16) and a fully-readable TRANSACTION_PAYLOAD
    * (type 40 — compressed transactions carry their XID INSIDE the
    * container, so the container's own end is the boundary). A torn
    * trailing event (partial header or body at EOF) or garbage sizes end
    * the walk without advancing the frontier; a file torn inside the
    * 4-byte magic returns the input state unchanged. Same walk state
    * discipline as [[walkFile]] (FDE checksum algorithm, payload inner-
    * event counting), so the returned (index, checksumLen) seed
    * [[BinlogBinaryParser.decodeStream]] exactly.
    *
    * Runs wherever the caller is (the tail source calls it driver-side
    * at offset planning); per trigger it reads only the bytes past the
    * previous frontier — bounded by feed growth, not file size.
    *
    * `byteBudget` is the SOFT batch-size cap (the tail source's
    * `maxBytesPerTrigger`): once the walk has found at least one commit
    * boundary past `fromPos` and consumed the budget, it stops there —
    * so a consumer restarted against a weekend of growth advances in
    * budget-sized batches instead of planning one giant one, while a
    * single transaction larger than the budget still advances the
    * frontier by one whole transaction (the progress guarantee; commits
    * are the only legal stops, so the cap is soft exactly like Spark's
    * file-source maxBytesPerTrigger). */
  private[graft] def commitFrontier(file: String, fromPos: Long,
      fromIndex: Long, fromCk: Int,
      conf: org.apache.hadoop.conf.Configuration,
      byteBudget: Long = Long.MaxValue): (Long, Long, Int) = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    try {
      var pos = fromPos
      var index = fromIndex
      var ckLen = fromCk
      if (fromPos == 0L) {
        val magic = new Array[Byte](4)
        if (!readFully(raw, magic) ||
            !java.util.Arrays.equals(magic, BinlogBinaryParser.Magic))
          return (fromPos, fromIndex, fromCk)
        pos = 4L
      } else raw.seek(fromPos)
      val in = new java.io.BufferedInputStream(raw, 1 << 16)
      var fPos = fromPos
      var fIdx = fromIndex
      var fCk = fromCk
      val hdr = new Array[Byte](19)
      var done = false
      while (!done) {
        // soft byte budget: stop at the last commit boundary once the
        // budget is consumed AND the frontier has advanced (see scaladoc)
        if (fPos > fromPos && pos - fromPos >= byteBudget) done = true
        else if (!readFully(in, hdr)) done = true
        else {
          val buf = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
          buf.getInt // timestamp
          val typeCode = buf.get & 0xFF
          buf.getInt // server id
          val eventSize = buf.getInt & 0xFFFFFFFFL
          if (eventSize < 19 || eventSize > Int.MaxValue) done = true
          else {
            val bodyLen = eventSize.toInt - 19
            typeCode match {
              case 15 =>
                val body = new Array[Byte](bodyLen)
                if (!readFully(in, body)) done = true
                else if (bodyLen >= 62) {
                  val alg = body(bodyLen - 5) & 0xFF
                  if (alg == 1) ckLen = 4 else if (alg == 0) ckLen = 0
                }
              case 40 =>
                val body = new Array[Byte](bodyLen)
                if (!readFully(in, body)) done = true
                else index += countPayloadEvents(body, ckLen, 1)
              case _ =>
                if (!skipFully(in, bodyLen)) done = true
            }
            if (!done) {
              index += 1
              pos += eventSize
              if (typeCode == 16 || typeCode == 40) {
                fPos = pos; fIdx = index; fCk = ckLen
              }
            }
          }
        }
      }
      (fPos, fIdx, fCk)
    } finally raw.close()
  }

  /** How many events [[BinlogBinaryParser]]'s payload expansion will emit
    * for this TRANSACTION_PAYLOAD body — 0 on any malformation, exactly
    * mirroring the decoder's throw→`body_decode_error`→no-expansion path.
    * Recurses into (pathological) nested containers like the decoder,
    * with the decoder's shared nesting bound so counts stay identical. */
  private def countPayloadEvents(bodyBytes: Array[Byte], ckLen: Int,
      depth: Int): Long = {
    if (depth > BinlogBinaryParser.MaxPayloadNesting) return 0L
    try {
      val body = ByteBuffer.wrap(bodyBytes).order(ByteOrder.LITTLE_ENDIAN)
      var compression = 255L
      var uncompressedSize = -1L
      var payloadSize = -1L
      var done = false
      while (!done) {
        BinlogBinaryParser.readPackedLong(body) match {
          case 0 => done = true
          case t =>
            val len = BinlogBinaryParser.readPackedLong(body).toInt
            val start = body.position()
            val v = BinlogBinaryParser.readPackedLong(body)
            body.position(start + len)
            t match {
              case 1 => payloadSize = v
              case 2 => compression = v
              case 3 => uncompressedSize = v
              case _ => ()
            }
        }
      }
      val rawLen = body.remaining() - ckLen
      if (rawLen < 0 || payloadSize > rawLen) return 0L
      val raw = new Array[Byte](if (payloadSize >= 0) payloadSize.toInt else rawLen)
      body.get(raw)
      val inner = compression match {
        case 0 =>
          if (uncompressedSize < 0 || uncompressedSize > Int.MaxValue) return 0L
          com.github.luben.zstd.Zstd.decompress(raw, uncompressedSize.toInt)
        case 255 => raw
        case _ => return 0L
      }
      var p = 0
      var n = 0L
      var ok = true
      while (ok && p + 19 <= inner.length) {
        val itc = inner(p + 4) & 0xFF
        val isz = (ByteBuffer.wrap(inner, p + 9, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt & 0xFFFFFFFFL).toInt
        if (isz < 19 || p + isz > inner.length) ok = false
        else {
          n += 1
          if (itc == 40) // nested container: decoder expands recursively
            n += countPayloadEvents(
              java.util.Arrays.copyOfRange(inner, p + 19, p + isz), 0, depth + 1)
          p += isz
        }
      }
      n
    } catch { case _: RuntimeException => 0L }
  }

  private def readFully(in: java.io.InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) return false
      off += r
    }
    true
  }

  private def skipFully(in: java.io.InputStream, n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() < 0) return false // skip() stalled: probe a byte
      else left -= 1
    }
    true
  }
}
