package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** Shared micro-batch tail over an append-only file listing (the binlog
  * and avrofile sources): the offset is a POSITION IN THE SORTED FILE
  * LIST — files are created with increasing names and never rewritten
  * once rotated, so each trigger consumes the files that appeared since
  * the last committed offset, whole files only. State is one integer;
  * that encoding requires the watched directory to be APPEND-ONLY while
  * the stream (or its checkpoint) is live — purging old files would
  * shift the listing under a count-based offset.
  *
  * `A` is the lister's element (file path, FileStatus, …); listing and
  * partition planning happen on the driver only.
  */
private[sources] abstract class FileCountMicroBatchStream[A](
    list: () => IndexedSeq[A],
    maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow
    with ReportsSourceMetrics {

  /** The partitions for one consumed file — usually one, but a source
    * with an intra-file split index fans a huge file into several. */
  protected def makePartitions(a: A): Seq[InputPartition]

  /** Byte length of one unconsumed listing element for the in-band
    * `bytesBehind` metric; a negative return means "unknown" and
    * suppresses the byte metric (the file-count metric always
    * reports). Subclasses whose lister already carries lengths (avro)
    * answer for free; the binlog subclass pays one stat per
    * not-yet-consumed file per progress event. */
  protected def byteLen(a: A): Long = -1L

  /** Called once per [[planInputPartitions]] with the trigger's whole
    * slice, before any [[makePartitions]] call — a source needing a batch
    * side effect (e.g. building the split-index shards for every file new
    * to this trigger in ONE job) does it here instead of once per file. */
  protected def prepareSlice(files: Seq[A]): Unit = ()

  private case class FileCountOffset(n: Int) extends Offset {
    override def json(): String = s"""{"n":$n}"""
  }

  // snapshot the listing per planning cycle so latestOffset and
  // planInputPartitions agree within one trigger
  @volatile private var lastListing: IndexedSeq[A] = Vector.empty
  // AvailableNow bound: files present when the trigger started
  @volatile private var availableNowCap: Option[Int] = None

  override def initialOffset(): Offset = FileCountOffset(0)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(list().length)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    lastListing = list()
    val total = availableNowCap.fold(lastListing.length)(math.min(_, lastListing.length))
    val s = start.asInstanceOf[FileCountOffset].n
    val capped = limit match {
      case m: ReadMaxFiles => math.min(total, s + m.maxFiles)
      case _ => total
    }
    FileCountOffset(capped)
  }

  override def reportLatestOffset(): Offset = FileCountOffset(lastListing.length)

  override def deserializeOffset(json: String): Offset = {
    // a tail-source checkpoint mid-file (nonzero pos) has no whole-file
    // representation: silently reading just `n` would re-serve the
    // consumed prefix of file n. Upgrading count→tail is supported
    // (TailOffset.fromJson defaults the missing fields); downgrading
    // tail→count is only safe at a file boundary — reject loudly.
    "\"pos\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .filter(_.group(1).toLong != 0L)
      .foreach { m =>
        throw new IllegalArgumentException(
          s"checkpoint offset $json was written by the tailActive source " +
            s"mid-file (pos=${m.group(1)}); the count-based source cannot " +
            "resume it — keep tailActive=true on this checkpoint")
      }
    FileCountOffset("\"n\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad file-tail offset: $json")))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileCountOffset].n
    val e = end.asInstanceOf[FileCountOffset].n
    // keep the snapshot when re-listing (a restart re-executes its
    // pending batch through here before any latestOffset call — the
    // metrics for that batch must not see an empty listing)
    val listing = if (lastListing.length >= e) lastListing else list()
    lastListing = listing
    val slice = listing.slice(s, e)
    prepareSlice(slice)
    slice.flatMap(makePartitions).toArray
  }

  /** In-band lag for `StreamingQueryProgress.sources[].metrics`, the
    * count-based analogue of the tail streams' [[TailMetrics]]:
    * `filesBehind` vs the planning cycle's listing snapshot, plus
    * `bytesBehind` when [[byteLen]] answers. Raw serialized offsets
    * (the pending-batch re-execution path) convert via the json form,
    * never a blind cast. */
  // rotated files never change size, so their byteLen is cached after
  // the first stat; only the LAST listed file (possibly still growing)
  // is re-measured per progress event — without this a file-capped
  // drain over a B-file backlog would pay ~B^2/2 stats
  private val lenCache = scala.collection.mutable.HashMap.empty[A, Long]

  override def metrics(latestConsumedOffset: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val listing = lastListing
    val n =
      if (!latestConsumedOffset.isPresent) 0
      else latestConsumedOffset.get match {
        case f: FileCountOffset => f.n
        case o => deserializeOffset(o.json()).asInstanceOf[FileCountOffset].n
      }
    val m = new java.util.HashMap[String, String]()
    m.put("filesBehind", math.max(0, listing.length - n).toString)
    val behind = listing.drop(math.max(0, n))
    val lens = behind.zipWithIndex.map { case (a, i) =>
      if (i == behind.length - 1) byteLen(a) // the active file: fresh
      else lenCache.getOrElseUpdate(a, byteLen(a))
    }
    if (lens.forall(_ >= 0L)) m.put("bytesBehind", lens.sum.toString)
    m
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
