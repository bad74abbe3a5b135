package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Empty- and one-row-input sweep over EVERY SparkEntry query (r8 VERDICT
  * stretch #8): the fixture writers guard sizes and the kernels fuzz edge
  * paths at the unit level, but nothing previously executed the full 70+
  * query inventory against degenerate tables. Contract pinned here:
  *
  *   - a query either EXECUTES (collect succeeds — usually to an empty or
  *     tiny result), or
  *   - fails with a DOCUMENTED, intelligible error: AnalysisException /
  *     IllegalArgumentException with a non-empty message (e.g. the PQ
  *     family's "codebook must be non-empty" on an empty corpus — a PQ
  *     index over zero vectors is meaningless and must say so);
  *   - opaque executor-side crashes (NPE, ClassCast, ArrayIndexOOB —
  *     including wrapped inside a SparkException) are failures.
  *
  * Both fixture dirs carry the exact testdata schemas (copied from
  * sf0.001), so this is the driver's table contract at cardinality 0/1.
  */
class DegenerateInputSpec extends AnyFunSuite with SparkTestSession {

  private val src = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val (emptyDir, oneDir) = {
    val root = Files.createTempDirectory("graft_degen").toFile
    val e = new java.io.File(root, "empty"); e.mkdirs()
    val o = new java.io.File(root, "one"); o.mkdirs()
    // events.ts has shipped as both INT64 TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS); under the legacy conf a nanos column copies as a
    // plain LONG ts, a micros column as TIMESTAMP_NTZ — Tables.events
    // normalizes BOTH layouts to the epoch-nanos-Long contract, so the
    // copies are consumable either way. Conf restored after the build:
    // SparkTestSession is one JVM-wide session, and leaving the legacy
    // conf set would contaminate later suites' reads.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.limit(0).coalesce(1).write.parquet(s"${e.getPath}/$t.parquet")
      df.limit(1).coalesce(1).write.parquet(s"${o.getPath}/$t.parquet")
    } finally prior match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None => spark.conf.unset(nanosKey)
    }
    (e.getPath, o.getPath)
  }

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && c.getCause != c) c = c.getCause
    c
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            val root = rootCause(e)
            val documented = (e.isInstanceOf[AnalysisException] ||
              e.isInstanceOf[IllegalArgumentException] ||
              root.isInstanceOf[AnalysisException] ||
              root.isInstanceOf[IllegalArgumentException]) &&
              Option(root.getMessage).exists(_.nonEmpty)
            if (documented) None
            else Some(s"$name [$label]: ${root.getClass.getName}: ${root.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query survives an EMPTY copy of the testdata schema") {
    sweep(emptyDir, "empty")
  }

  test("every query survives a ONE-ROW copy of the testdata schema") {
    sweep(oneDir, "1-row")
  }
}
