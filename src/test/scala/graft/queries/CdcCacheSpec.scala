package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The comparison-frame cache must have a release path: a long-lived
  * session otherwise accumulates persisted partitions per (session, dir)
  * forever (ADVICE r2/r3). Assertions are scoped to the RDDs this test
  * materializes — the session (and its cache manager) is shared across
  * suites, so global emptiness is not observable here. */
class CdcCacheSpec extends AnyFunSuite with SparkTestSession {

  test("releaseCache unpersists every materialized comparison frame") {
    CdcQueries.releaseCache() // start from a clean comparison cache
    val baseline = spark.sparkContext.getPersistentRDDs.keySet

    CdcQueries.cdc01StatusCounts(spark, "/root/testdata/sf0.001").collect()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(added.nonEmpty, "expected the shared comparison frame to be persisted")

    CdcQueries.releaseCache()
    val leftover = spark.sparkContext.getPersistentRDDs.keySet.intersect(added)
    assert(leftover.isEmpty, s"releaseCache left persisted RDDs behind: $leftover")

    // the cache re-materializes transparently on the next query
    assert(CdcQueries.cdc01StatusCounts(spark, "/root/testdata/sf0.001")
      .collect().nonEmpty)
    CdcQueries.releaseCache()
  }
}
