package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface (GraftExtensions): every registered function must
  * resolve from `spark.sql(...)` and agree exactly with its Column-API
  * twin (same Catalyst expression underneath). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {

  test("SQL and Column routes agree for every registered function") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id,
        |  simhash32(split(text, ' ')) AS sh,
        |  shingle_hash60(split(text, ' '), 3) AS sh60,
        |  minhash_sig(shingle_hash60(split(text, ' ')), 16) AS mh,
        |  word_shingles(split(text, ' '), 2) AS ws,
        |  marker_count(split(text, ' '), array('the', 'a')) AS mc,
        |  token_char_sum(split(text, ' ')) AS tcs,
        |  rolling_fp(split(text, ' ')) AS rfp,
        |  shingle_pos60(split(text, ' '), 3) AS sp60
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val viaCols = docs.select(col("id"),
        graft.functions.TextHashFunctions.simHash32(split(col("text"), " ")).as("sh"),
        graft.functions.TextHashFunctions.shingleHash60(split(col("text"), " "), 3).as("sh60"),
        graft.functions.TextHashFunctions.minHashSig(
          graft.functions.TextHashFunctions.shingleHash60(split(col("text"), " ")), 16).as("mh"),
        graft.functions.TextHashFunctions.wordShingles(split(col("text"), " "), 2).as("ws"),
        graft.functions.FoldFunctions.markerCount(
          split(col("text"), " "), Seq("the", "a")).as("mc"),
        graft.functions.FoldFunctions.tokenCharSum(split(col("text"), " ")).as("tcs"),
        graft.functions.FoldFunctions.rollingFingerprint(
          split(col("text"), " ")).as("rfp"),
        graft.functions.TextHashFunctions.shinglePos60(
          split(col("text"), " "), 3).as("sp60"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaCols.toSeq)
  }

  test("SQL and Column routes agree for the vector fold kernels") {
    val viaSql = spark.sql(
      """SELECT
        |  vec_field_sum(array(
        |    named_struct('id', 1L, 'emb', array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        |    named_struct('id', 2L, 'emb', array(CAST(0.5 AS FLOAT), CAST(4.0 AS FLOAT)))),
        |    'emb', 2) AS s,
        |  vec_field_mean(array(
        |    named_struct('c', 0L, 'psum', array(3.0D, 6.0D), 'pcnt', 2L),
        |    named_struct('c', 1L, 'psum', array(1.0D, 2.0D), 'pcnt', 2L)),
        |    'psum', 'pcnt', 2) AS m""".stripMargin).collect().head
    assert(viaSql.getSeq[Double](0) == Seq(1.5, 6.0))
    assert(viaSql.getSeq[Float](1) == Seq(1.0f, 2.0f))
  }

  test("cosine_sim and geom_hex_to_wkt resolve in SQL") {
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |  geom_hex_to_wkt('00000000' ||
        |    '0101000000000000000000f03f0000000000000040') AS w""".stripMargin)
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getString(1) == "POINT(1 2)")
  }

  test("posting_pairs expands a posting list as a SQL generator") {
    val rows = spark.sql(
      """SELECT p.* FROM (SELECT array(
        |  named_struct('doc_id', 1L, 'n_sh', 5),
        |  named_struct('doc_id', 2L, 'n_sh', 7),
        |  named_struct('doc_id', 3L, 'n_sh', 9)) AS ds)
        |LATERAL VIEW posting_pairs(ds) p AS doc_a, na, doc_b, nb""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("bad arguments fail as AnalysisException with standard error classes") {
    import org.apache.spark.sql.AnalysisException
    val e = intercept[AnalysisException](spark.sql("SELECT cosine_sim(array(1))").collect())
    assert(e.getMessage.contains("cosine_sim"))
    assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    // genuinely non-foldable (a column reference) → standard error class
    val e2 = intercept[AnalysisException](
      spark.sql("SELECT shingle_hash60(array('a'), id) FROM RANGE(1)").collect())
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT")
    assert(e2.getMessage.contains("shingle_hash60"))
  }

  test("foldable-but-not-folded parameters are evaluated, not rejected") {
    // constant folding has not run at function-builder time; `1 + 2` must
    // behave exactly like the literal 3 (r7 ADVICE: the old builder
    // rejected it with a message claiming the argument must be foldable
    // when it already was)
    val folded = spark.sql("SELECT shingle_hash60(array('a','b','c','d'), 1 + 2) AS s")
      .collect().head.getSeq[Long](0)
    val literal = spark.sql("SELECT shingle_hash60(array('a','b','c','d'), 3) AS s")
      .collect().head.getSeq[Long](0)
    assert(folded == literal && folded.size == 2)
  }

  test("the documented --conf spark.sql.extensions=graft.GraftExtensions route works") {
    // a cluster user configures the extensions by class NAME — Spark
    // instantiates it reflectively at session construction. A builder
    // config can't reach a pre-existing local SparkContext's static conf,
    // so pin the same mechanism directly: load by the documented name,
    // apply to a fresh session, and require the functions resolve.
    import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-conf-route")
        .withExtensions(ext)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
