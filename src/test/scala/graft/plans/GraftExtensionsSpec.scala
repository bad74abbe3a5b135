package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions work through a spark.sql-only session.
  *
  * Other suites share one default session (SparkTestSession) which
  * `getOrCreate` would return unchanged — extensions apply only at session
  * construction — so this suite clears the default, builds its own session
  * (reusing the JVM's SparkContext), and restores the prior default after.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prior.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  test("cosine_sim usable from SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("simhash32 / word_shingles / minhash_sig usable from SQL") {
    val r = spark.sql(
      "SELECT simhash32(array('a','b')) AS h, " +
        "word_shingles(array('a','b','c','d')) AS s, " +
        "size(minhash_sig(array('a b c'))) AS m").head()
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getInt(2) == 16)
  }
}
