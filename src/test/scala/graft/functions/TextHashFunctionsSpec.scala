package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextHashFunctions._

class TextHashFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import TextHash.P

  private def refShingles(toks: Seq[String], n: Int = 3): Seq[String] =
    toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq.distinct

  private def refHash(s: String, hexLen: Int): Long =
    java.lang.Long.parseLong(DigestUtils.md5Hex(s.getBytes("UTF-8")).take(hexLen), 16)

  test("wordShingles matches sliding-window distinct reference") {
    import spark.implicits._
    val toks = Seq("a", "b", "c", "a", "b", "c", "a")
    val got = Seq(Tuple1(toks)).toDF("toks")
      .select(wordShingles(col("toks")).as("s")).head().getSeq[String](0)
    assert(got == refShingles(toks))
  }

  test("wordShingles on short input is empty") {
    import spark.implicits._
    val got = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(wordShingles(col("toks")).as("s")).head().getSeq[String](0)
    assert(got.isEmpty)
  }

  test("minHashSig equals explicit per-permutation minimum") {
    import spark.implicits._
    val sh = Seq("x y z", "y z w", "q r s")
    val got = Seq(Tuple1(sh)).toDF("sh")
      .select(minHashSig(col("sh")).as("sig")).head().getSeq[Long](0)
    val expected = (0 until 16).map { j =>
      sh.map { s =>
        val h = refHash(s, 15) % P
        (TextHash.permA(j) * h + TextHash.permB(j)) % P
      }.min
    }
    assert(got == expected)
  }

  test("minHashSig on an empty array is null and declared nullable") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(minHashSig(col("sh")).as("sig"))
    assert(df.schema("sig").nullable)
    assert(df.head().isNullAt(0))
    // a non-null filter over it must actually filter (NullPropagation
    // would elide it if the expression lied about nullability)
    assert(df.filter(col("sig").isNotNull).count() == 0)
  }

  test("minHashSig is order- and duplicate-invariant") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq("x y z", "y z w")),
      Tuple1(Seq("y z w", "x y z", "x y z"))).toDF("sh")
      .select(minHashSig(col("sh")).as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
  }

  test("shingleHash60 == md5-60bit of each wordShingle, order preserved") {
    import spark.implicits._
    val toks = Seq("a", "b", "c", "d", "a", "b", "c")
    val row = Seq(Tuple1(toks)).toDF("toks")
      .select(shingleHash60(col("toks")).as("h"), wordShingles(col("toks")).as("s"))
      .head()
    val hashes = row.getSeq[Long](0)
    val strings = row.getSeq[String](1)
    assert(hashes == strings.map(refHash(_, 15)))
  }

  test("minHashSig over pre-hashed longs equals the string path") {
    import spark.implicits._
    val sh = Seq("x y z", "y z w", "q r s")
    val row = Seq(Tuple1(sh)).toDF("sh")
      .select(minHashSig(col("sh")).as("a"),
        minHashSig(expr("transform(sh, g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT))")).as("b"))
      .head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
  }

  private def refBigrams(toks: Seq[String]): Seq[Int] =
    if (toks.length < 2) Seq(0, 0, 0)
    else {
      val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      Seq(toks.length - 1, counts.size, counts.values.max)
    }

  test("bigramStats matches a plain-Scala sliding-count reference (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "bb", "ccc", "d d", "e") // "d d" exercises aliasing
    val cases = Seq.fill(60)(Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))) ++
      Seq(Seq.empty[String], Seq("x"), Seq("x", "x"), Seq("x", "x", "x"))
    val rows = cases.map(Tuple1(_)).toDF("toks")
      .select(bigramStats(col("toks")).as("bs")).collect()
    rows.zip(cases).foreach { case (row, toks) =>
      assert(row.getSeq[Int](0) == refBigrams(toks), s"for $toks")
    }
  }

  test("bigramStats: null token and null row contaminate to null; nullable declared") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", null, "b")), Tuple1(null: Seq[String]))
      .toDF("toks").select(bigramStats(col("toks")).as("bs"))
    assert(df.schema("bs").nullable)
    assert(df.collect().forall(_.isNullAt(0)))
    assert(df.filter(col("bs").isNotNull).count() == 0)
  }

  test("bigram_stats SQL route equals the Column route and rejects bad arity/type") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b", "a", "b", "a"))).toDF("toks")
    df.createOrReplaceTempView("bs_in")
    val viaSql = spark.sql("SELECT bigram_stats(toks) AS bs FROM bs_in").head().getSeq[Int](0)
    val viaCol = df.select(bigramStats(col("toks")).as("bs")).head().getSeq[Int](0)
    assert(viaSql == viaCol && viaCol == Seq(4, 2, 2))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bigram_stats(toks, 2) FROM bs_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bigram_stats(1) FROM bs_in").collect()
    }
  }

  test("simHash32 equals explicit bit-vote reference") {
    import spark.implicits._
    val toks = Seq("spark", "query", "spark", "join")
    val got = Seq(Tuple1(toks)).toDF("toks")
      .select(simHash32(col("toks")).as("h")).head().getLong(0)
    val votes = Array.fill(32)(0)
    toks.foreach { t =>
      val h = refHash(t, 8)
      (0 until 32).foreach(b => votes(b) += (((h >> b) & 1L).toInt * 2) - 1)
    }
    val expected = (0 until 32).foldLeft(0L) { (acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc
    }
    assert(got == expected)
  }

  test("shinglePos60 == the transform(sequence) HOF route, 1-based, every occurrence") {
    import spark.implicits._
    // repeated window ("a b c" twice) — both positions must survive (no
    // distinct). The HOF reference needs an explicit size guard because
    // sequence(1, 0) is DESCENDING [1, 0] in Spark — the raw
    // transform(sequence(1, size-2)) route crashes in slice(toks, 0, n)
    // on arrays shorter than the window, one of the hazards the native
    // kernel removes.
    val df = Seq(
      Tuple1(Seq("a", "b", "c", "d", "a", "b", "c")),
      Tuple1(Seq("x", "y", "z", "w"))).toDF("toks")
      .select(
        shinglePos60(col("toks"), 3).as("native"),
        expr("""transform(
          sequence(1, size(toks) - 2),
          i -> struct(CAST(i AS INT) AS pos,
            CAST(conv(substr(md5(concat_ws(' ', slice(toks, i, 3))), 1, 15), 16, 10) AS BIGINT) AS gv))""")
          .as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
    // short and empty arrays: native yields empty, totally
    val shorts = Seq(Tuple1(Seq("x", "y")), Tuple1(Seq[String]())).toDF("toks")
      .select(shinglePos60(col("toks"), 3).as("native"))
    shorts.collect().foreach(r => assert(r.getSeq[org.apache.spark.sql.Row](0).isEmpty))
    // null elements skip like concat_ws (no NPE): window (a, NULL, b)
    // hashes the same bytes as "a b"
    val withNull = spark.sql(
      """SELECT shingle_pos60(array('a', CAST(NULL AS STRING), 'b'), 3) AS g,
        |       shingle_pos60(array('a', 'b'), 2) AS ref""".stripMargin).head()
    assert(withNull.getSeq[org.apache.spark.sql.Row](0).head.getLong(1) ==
      withNull.getSeq[org.apache.spark.sql.Row](1).head.getLong(1))
  }
}
