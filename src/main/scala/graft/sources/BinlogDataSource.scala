package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.{BinlogBinaryParser, ParsedBinlogEvent}

/** DataSourceV2 connector for raw MySQL binlog binary files — the custom
  * file-format route SURVEY §7.6 reserves for this source:
  *
  *   spark.read.format("binlog").load("/path/to/binlogs")
  *
  * (registered via DataSourceRegister; the full class name works too).
  *
  * Layout: one `InputPartition` per file (the decode is stateful within a
  * file — TABLE_MAP/GTID association — so the file is the parallelism
  * unit, exactly like [[BinlogBinaryParser.parse]]'s RDD route; binlog
  * files are bounded by max_binlog_size, so at 100 TB the fan-out is the
  * file count). Column pruning is pushed into the reader: unprojected
  * columns are never materialized into rows.
  */
class BinlogDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "binlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinlogDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BinlogTable(BinlogScan.resolvePaths(properties),
      Option(properties.get("maxFilesPerTrigger")).map(_.toInt),
      Option(properties.get("splitIndex")),
      Option(properties.get("splitIndexAutoBuild")).exists(_.toBoolean),
      Option(properties.get("splitBytes")).map(_.toLong),
      Option(properties.get("tailActive")).exists(_.toBoolean),
      Option(properties.get("maxBytesPerTrigger")).map(_.toLong),
      Option(properties.get("purgeSafe")).exists(_.toBoolean))

  override def supportsExternalMetadata(): Boolean = false
}

object BinlogDataSource {
  /** The event schema — ParsedBinlogEvent flattened, `extra` as a map. */
  val schema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("immediate_commmit_timestamp", StringType),
    StructField("orignal_commmit_timestamp", StringType),
    StructField("log_position", LongType),
    StructField("table", StringType),
    StructField("schema", StringType),
    StructField("query", StringType),
    StructField("gtid_next", StringType),
    StructField("xid", LongType),
    StructField("binlog_file", StringType),
    StructField("file_seq", LongType),
    StructField("event_index", LongType),
    StructField("extra", MapType(StringType, StringType)),
    StructField("row_images", ArrayType(ArrayType(StringType)))
  ))
}

private class BinlogTable(paths: Seq[String], maxFilesPerTrigger: Option[Int],
    splitIndex: Option[String] = None, autoBuild: Boolean = false,
    splitBytes: Option[Long] = None, tailActive: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None, purgeSafe: Boolean = false)
    extends Table with SupportsRead {
  require(paths.nonEmpty, "binlog source requires a path (use .load(path))")

  override def name(): String = s"binlog(${paths.mkString(", ")})"
  override def schema(): StructType = BinlogDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BinlogScanBuilder(paths, maxFilesPerTrigger, splitIndex, autoBuild,
      splitBytes, tailActive, maxBytesPerTrigger, purgeSafe)
}

private class BinlogScanBuilder(paths: Seq[String], maxFilesPerTrigger: Option[Int] = None,
    splitIndex: Option[String] = None, autoBuild: Boolean = false,
    splitBytes: Option[Long] = None, tailActive: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None, purgeSafe: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = BinlogDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** File-pruning pushdown: predicates on `binlog_file`/`file_seq` are
    * decidable per FILE, so matching filters skip whole files at planning
    * (the source's partition pruning — at 100 TB a `file_seq >= N` tail
    * read touches only the N+ files). All filters are also returned as
    * residual so Spark re-evaluates them — pruning is an optimization,
    * never a correctness dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(BinlogFilePruning.prunable)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new BinlogScan(paths, required, pushed, maxFilesPerTrigger, splitIndex,
      autoBuild, splitBytes, tailActive, maxBytesPerTrigger, purgeSafe)
}

private object BinlogFilePruning {
  private val cols = Set("binlog_file", "file_seq")

  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => cols(a)
    case In(a, _) => cols(a)
    case GreaterThan("file_seq", _) | GreaterThanOrEqual("file_seq", _) |
         LessThan("file_seq", _) | LessThanOrEqual("file_seq", _) => true
    case _ => false
  }

  /** Does a file with this (basename, seq) possibly satisfy the filter?
    * Conservative by construction: a null or non-numeric comparison value
    * is undecidable per-file, so it keeps the file (pruning is a pure
    * optimization — Spark re-evaluates every filter as residual; a pushed
    * `IN (1, NULL)` must not fail the scan at planning, ADVICE r3). */
  def keeps(f: Filter, name: String, seq: Option[Long]): Boolean = f match {
    case EqualTo("binlog_file", v) => name == v
    case In("binlog_file", vs) => vs.contains(name)
    case EqualTo("file_seq", v) => asLong(v).forall(l => seq.contains(l))
    case In("file_seq", vs) => vs.exists(v => asLong(v).forall(l => seq.contains(l)))
    case GreaterThan("file_seq", v) => asLong(v).forall(l => seq.exists(_ > l))
    case GreaterThanOrEqual("file_seq", v) => asLong(v).forall(l => seq.exists(_ >= l))
    case LessThan("file_seq", v) => asLong(v).forall(l => seq.exists(_ < l))
    case LessThanOrEqual("file_seq", v) => asLong(v).forall(l => seq.exists(_ <= l))
    case _ => true
  }

  /** None = undecidable (null / non-numeric) → caller keeps the file. */
  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case n: Number => Some(n.longValue())
    case _ => None
  }

  def fileSeq(name: String): Option[Long] =
    "\\.(\\d+)$".r.findFirstMatchIn(name).map(_.group(1).toLong)
}

private class BinlogScan(paths: Seq[String], required: StructType,
    pushed: Array[Filter] = Array.empty,
    maxFilesPerTrigger: Option[Int] = None,
    splitIndex: Option[String] = None,
    autoBuild: Boolean = false,
    splitBytes: Option[Long] = None,
    tailActive: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None,
    purgeSafe: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per file; with a `splitIndex` option (a shard directory
    * built by [[graft.ingest.BinlogOffsetIndex.build]]) huge files fan out
    * into one partition per transaction-aligned byte range — each file's
    * ranges load lazily from ITS OWN shard, never the siblings'. With
    * `splitIndexAutoBuild=true`, files with no (readable) shard are walked
    * right here at planning (the distributed header-only walk runs as its
    * own small job before this scan's tasks launch) — the "first pass
    * records offsets" pattern with no separate orchestration step, and new
    * files appearing after an earlier build get shards too. A file whose
    * length no longer matches the index entry decodes whole-file — the
    * index is an optimization, never a correctness dependency. */
  override def planInputPartitions(): Array[InputPartition] = {
    // the SESSION's Hadoop conf, not a bare new Configuration(): index
    // paths on filesystems configured via spark.hadoop.* (credentials,
    // fs impls) must resolve with the same conf build() wrote through
    lazy val hadoopConf =
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val kept = BinlogScan.listFiles(paths)
      .filter { p =>
        val name = p.split('/').last
        val seq = BinlogFilePruning.fileSeq(name)
        pushed.forall(BinlogFilePruning.keeps(_, name, seq))
      }
    splitIndex match {
      case None => kept.map(p => BinlogInputPartition(p): InputPartition)
      case Some(ip) =>
        // shard probes run in parallel (and skip entirely on a never-built
        // index directory); a serial per-file loop here put one filesystem
        // round trip per binlog file on the planning path (r7 ADVICE)
        val idx = graft.ingest.BinlogOffsetIndex
        var ranges = idx.loadFiles(hadoopConf, ip, kept.toSeq)
        if (autoBuild) {
          val missing = kept.filter(f => ranges(f).isEmpty)
          if (missing.nonEmpty) {
            idx.buildFiles(org.apache.spark.sql.SparkSession.active,
              missing.toSeq, ip, splitBytes.getOrElse(128L << 20))
            ranges = ranges ++ idx.loadFiles(hadoopConf, ip, missing.toSeq)
          }
        }
        // lengths for the validity check fetched in one parallel sweep
        // (only files that actually have ranges need a stat); a missing
        // stat falls through to whole-file decode
        val lens = idx.statLens(hadoopConf,
          kept.filter(f => ranges(f).nonEmpty).toSeq)
        kept.flatMap { p =>
          ranges(p) match {
            case rs if rs.nonEmpty && lens.get(p).contains(rs.head.fileLen) =>
              rs.map(r => BinlogInputPartition(
                p, r.start, r.end, r.startIndex, r.checksumLen): InputPartition)
            case _ => Seq(BinlogInputPartition(p): InputPartition)
          }
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BinlogReaderFactory(required,
      org.apache.spark.graftshim.SerializableHadoopConf.session())

  /** Two streaming postures: the default count-based stream consumes
    * whole (closed, immutable) files; `tailActive=true` switches to
    * (file, byte-frontier) offsets so the GROWING last file yields its
    * newly-committed bytes each trigger ([[BinlogTailMicroBatchStream]]).
    * Checkpoint compatibility is deliberately ONE-WAY: a count-based
    * checkpoint (`{"n":N}`, whole files only) upgrades to the tail
    * posture in place (TailOffset.fromJson defaults the missing
    * frontier fields), but a tail checkpoint with a MID-FILE frontier
    * cannot drive the count-based source — its parser rejects a
    * nonzero `pos` loudly rather than re-serve the consumed prefix. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // multi-path is a BATCH convenience (replays, ad-hoc unions of named
    // files); a stream's offsets index ONE naturally-ordered listing. To
    // consume several feeds in one query, union N single-path streams —
    // each gets its own offsets in the checkpoint (cdc69/cdc72's
    // posture; graft.streaming.Drains.drainBinlogTailUnion /
    // drainBinlogPurgeTailUnion are the canonical drains, and
    // BinlogTailOps.lagMetricsUnion reads the per-source lag).
    // DECIDED (r15): this stays the supported shape rather than a
    // native multi-dir stream. A composite in-source offset would
    // re-encode what Spark's offset log already does natively (one
    // line per source, independent admission and replay), gain no
    // plan-level behavior (the union is already plan-level, no extra
    // shuffle), and strand existing union checkpoints — their
    // per-source offset lines have no in-place translation into a
    // composite form, which would violate the family's in-place
    // upgrade discipline (cdc68/cdc71).
    require(paths.length == 1,
      s"a binlog STREAM watches exactly one directory, got ${paths.length} " +
        "paths — union one readStream per feed instead (each keeps its " +
        "own offsets in the shared checkpoint)")
    // purgeSafe exists to survive retention; silently handing back the
    // index-keyed count stream would break on the very purge the user
    // opted into surviving
    require(tailActive || !purgeSafe,
      "purgeSafe=true requires tailActive=true — the count-based stream " +
        "keys offsets by listing index and cannot survive a purge")
    if (tailActive && purgeSafe)
      new BinlogPurgeTailMicroBatchStream(paths.head, required,
        maxFilesPerTrigger, maxBytesPerTrigger)
    else if (tailActive)
      new BinlogTailMicroBatchStream(paths.head, required, maxFilesPerTrigger,
        maxBytesPerTrigger)
    else
      new BinlogMicroBatchStream(paths.head, required, maxFilesPerTrigger,
        splitIndex, autoBuild, splitBytes)
  }

  override def description(): String =
    s"binlog(${paths.mkString(", ")}) prunedBy=[${pushed.mkString(", ")}]"
}

private[graft] object BinlogScan {
  /** The DSv2 path contract: `.load(p)` arrives as the `path` property,
    * `.load(p1, p2, …)` as a JSON-array `paths` property (plus an
    * optional `path`) — resolve both forms. Jackson is Spark's own
    * bundled JSON mapper, so the array parse matches what Spark wrote. */
  def resolvePaths(properties: util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(properties.get("path")).toSeq
    (single ++ multi).distinct
  }

  /** Natural-order listing across SEVERAL roots (multi-path batch read):
    * each root lists as usual, then the union re-sorts globally by the
    * same (numeric suffix, basename) key — duplicate files named twice
    * count once. The dedup works on FULLY-QUALIFIED paths: directory
    * and glob listings come back qualified from the filesystem, and
    * the explicit single-file branch qualifies too, so the same file
    * reached via two spellings (relative vs absolute, `//`, scheme
    * present vs defaulted) collapses onto one entry instead of being
    * read twice. */
  def listFiles(paths: Seq[String]): Array[String] =
    paths.flatMap(p => listFiles(p)).distinct.toArray
      .sortBy(p => (fileSeqKey(p.split('/').last), p.split('/').last))

  // compiled once — the purge-tail planning paths call this O(listing)
  // times per trigger
  private val SeqSuffix = "\\.(\\d+)$".r

  private[sources] def fileSeqKey(name: String): Long =
    SeqSuffix.findFirstMatchIn(name).map(_.group(1).toLong)
      .getOrElse(Long.MaxValue)

  /** All binlog files under `path`, in natural (`ls -v`) order: numeric
    * suffix first, then name — the reference's processing order
    * (comparator.sh:85). */
  def listFiles(path: String): Array[String] = {
    val hadoopPath = new Path(path)
    // driver-side listing with the session's conf (spark.hadoop.*
    // credentials / fs impls); bare Configuration() only as the
    // sessionless fallback
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = hadoopPath.getFileSystem(conf)
    // hidden-file convention (Spark's file sources do the same): "."/"_"
    // prefixed names are metadata (checksum sidecars, _SUCCESS markers,
    // in-progress temp files), never binlog data. Applied to DIRECTORY
    // and glob LISTINGS only — a caller who names one file explicitly
    // gets exactly that file, hidden-looking or not.
    def visible(p: Path): Boolean =
      !p.getName.startsWith(".") && !p.getName.startsWith("_")
    val files: Array[Path] =
      // qualified like the listing branches below (listStatus/globStatus
      // return qualified paths), so multi-path dedup compares one form
      if (fs.exists(hadoopPath) && fs.getFileStatus(hadoopPath).isFile)
        Array(fs.makeQualified(hadoopPath))
      else (Option(fs.globStatus(hadoopPath)) match {
        case Some(matches) if matches.nonEmpty =>
          matches.flatMap { st =>
            if (st.isFile) Array(st.getPath)
            else fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath)
          }
        case _ => fs.listStatus(hadoopPath).filter(_.isFile).map(_.getPath)
      }).filter(visible)
    files.map(_.toString)
      .sortBy(p => (fileSeqKey(p.split('/').last), p.split('/').last))
  }
}

/** Micro-batch binlog tail: the offset is a position in the naturally-
  * ordered file list (binlog files are created with strictly increasing
  * suffixes and never rewritten once rotated). Each trigger consumes the
  * files that appeared since the last committed offset — whole files
  * only, so run `FLUSH BINARY LOGS` (reference README.md:68-73) or copy
  * completed files into the watched directory. State is one integer;
  * that encoding requires the watched directory to be APPEND-ONLY while
  * the stream (or its checkpoint) is live — purging old files would
  * shift the listing under a count-based offset.
  *
  * With `splitIndex` (+ `splitIndexAutoBuild`), each consumed file fans
  * out into one task per transaction-aligned range, exactly like the
  * batch scan — a multi-hundred-MB rotated binlog no longer serializes
  * its micro-batch into one task. Auto-build walks just the files new to
  * this trigger (a small header-only job at planning) and writes their
  * shards, so the next stream restart finds them pre-indexed.
  */
private class BinlogMicroBatchStream(path: String, required: StructType,
    maxFilesPerTrigger: Option[Int] = None,
    splitIndex: Option[String] = None, autoBuild: Boolean = false,
    splitBytes: Option[Long] = None)
    extends FileCountMicroBatchStream[String](
      () => BinlogScan.listFiles(path).toIndexedSeq, maxFilesPerTrigger) {

  // ranges + file lengths for the current trigger's slice, loaded (and
  // auto-built) once in prepareSlice — makePartitions itself stays
  // side-effect-free and pays no per-file filesystem round trip
  @volatile private var sliceRanges
      : Map[String, Seq[graft.ingest.BinlogOffsetIndex.SplitRange]] = Map.empty
  @volatile private var sliceLens: Map[String, Long] = Map.empty

  /** One shard probe pass and (with `splitIndexAutoBuild`) ONE buildFiles
    * job for all files new to this trigger — the per-file form launched a
    * single-task Spark job plus a conf broadcast per new file per trigger
    * (r7 ADVICE). */
  override protected def prepareSlice(files: Seq[String]): Unit =
    splitIndex match {
      case None => ()
      case Some(ip) =>
        val spark = org.apache.spark.sql.SparkSession.active
        val conf = spark.sparkContext.hadoopConfiguration
        val idx = graft.ingest.BinlogOffsetIndex
        var ranges = idx.loadFiles(conf, ip, files)
        if (autoBuild) {
          val missing = files.filter(f => ranges(f).isEmpty)
          if (missing.nonEmpty) {
            idx.buildFiles(spark, missing, ip, splitBytes.getOrElse(128L << 20))
            ranges = ranges ++ idx.loadFiles(conf, ip, missing)
          }
        }
        sliceRanges = ranges
        sliceLens = idx.statLens(conf, files.filter(f => ranges(f).nonEmpty))
    }

  override protected def makePartitions(file: String): Seq[InputPartition] =
    splitIndex match {
      case None => Seq(BinlogInputPartition(file))
      case Some(_) =>
        val ranges = sliceRanges.getOrElse(file, Seq.empty)
        if (ranges.nonEmpty && sliceLens.get(file).contains(ranges.head.fileLen))
          ranges.map(r =>
            BinlogInputPartition(file, r.start, r.end, r.startIndex, r.checksumLen))
        else Seq(BinlogInputPartition(file))
    }

  // bytesBehind for the in-band metrics: one best-effort stat per
  // not-yet-consumed file per progress event (0-on-error is fine for
  // an observability number)
  override protected def byteLen(f: String): Long =
    TailWalk.statLen(f,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createReaderFactory(): PartitionReaderFactory =
    new BinlogReaderFactory(required,
      org.apache.spark.graftshim.SerializableHadoopConf.session())
}

/** `start == 0 && end == Long.MaxValue` is the whole-file partition; any
  * other range comes from the transaction-aligned offset index. */
private case class BinlogInputPartition(file: String, start: Long = 0L,
    end: Long = Long.MaxValue, startIndex: Long = 0L, checksumLen: Int = 0)
    extends InputPartition

/** Factory construction happens on the DRIVER, where the session conf is
  * capturable; the readers themselves run executor-side and must receive
  * it (a bare `new Configuration()` there would lose `spark.hadoop.*`
  * credentials / fs impls on object stores; `SparkSession.active` would
  * throw). Hence `conf` is REQUIRED — no default that only works
  * driver-side. */
private class BinlogReaderFactory(required: StructType,
    conf: org.apache.spark.graftshim.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BinlogPartitionReader(
      partition.asInstanceOf[BinlogInputPartition], required, conf)
}

/** Streams one file-range's events through the incremental decoder — heap
  * holds one event body at a time (not the file), so arbitrarily large
  * binlogs (≥2 GiB included) decode correctly. Projects only the required
  * columns. */
private class BinlogPartitionReader(part: BinlogInputPartition, required: StructType,
    sconf: org.apache.spark.graftshim.SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private var stream: java.io.InputStream = _

  private lazy val events: Iterator[ParsedBinlogEvent] = {
    val p = new Path(part.file)
    val fs = p.getFileSystem(sconf.value)
    val raw = fs.open(p)
    if (part.start > 0) raw.seek(part.start) // range partition: event boundary
    val in = new java.io.BufferedInputStream(raw, 1 << 16)
    stream = in
    // column pruning reaches the DECODER: when row_images is not
    // projected, the reader skips image value decoding (the dominant
    // decode cost) — header-only CDC scans don't pay for payloads
    BinlogBinaryParser.decodeStream(in, p.getName,
      withRowImages = required.fieldNames.contains("row_images"),
      startOffset = part.start, endOffset = part.end,
      startIndex = part.startIndex, initialChecksumLen = part.checksumLen)
  }

  private var current: ParsedBinlogEvent = _

  override def next(): Boolean =
    if (events.hasNext) { current = events.next(); true } else false

  override def get(): InternalRow = {
    val values = required.fields.map { f =>
      f.name match {
        case "event_type" => UTF8String.fromString(current.event_type)
        case "timestamp" => UTF8String.fromString(current.timestamp)
        case "immediate_commmit_timestamp" =>
          UTF8String.fromString(current.immediate_commmit_timestamp)
        case "orignal_commmit_timestamp" =>
          UTF8String.fromString(current.orignal_commmit_timestamp)
        case "log_position" => current.log_position.map(Long.box).orNull
        case "table" => UTF8String.fromString(current.table)
        case "schema" => UTF8String.fromString(current.schema)
        case "query" => UTF8String.fromString(current.query)
        case "gtid_next" => UTF8String.fromString(current.gtid_next)
        case "xid" => current.xid.map(Long.box).orNull
        case "binlog_file" => UTF8String.fromString(current.binlog_file)
        case "file_seq" => current.file_seq.map(Long.box).orNull
        case "event_index" => Long.box(current.event_index)
        case "extra" =>
          ArrayBasedMapData(
            current.extra.keys.map(k => UTF8String.fromString(k)).toArray,
            current.extra.values.map(v => UTF8String.fromString(v)).toArray)
        case "row_images" =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            current.row_images.map { img =>
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                img.map(v =>
                  if (v == null) null else UTF8String.fromString(v)).toArray[Any])
            }.toArray[Any])
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit =
    if (stream != null) {
      try stream.close() catch { case _: java.io.IOException => () }
    }
}
