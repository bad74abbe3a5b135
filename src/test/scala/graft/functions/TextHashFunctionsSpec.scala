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
}
