package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property check for the round-8 fold kernels: on RANDOM token arrays
  * (unicode, empties, marker-heavy, long runs) each native kernel must
  * equal the interpreted HOF it replaced, row for row. The oracle CTEs
  * mirror the HOF formulations, so this is the cross-engine-divergence
  * fuzz. Fixed-seed sampling, like ComparatorPropertySpec (scalatestplus
  * is not in the offline cache). */
class FoldFunctionsPropertySpec extends AnyFunSuite with SparkTestSession {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(14), Seed(4242L + i)))

  private val token: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "a", "le", "und"),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("héllo", "wörld", "日本", "", "x" * 40),
    Gen.asciiPrintableStr.map(_.take(8).replace(" ", "_")))

  private val doc: Gen[List[String]] = Gen.listOfN(20, token).map(_.take(20))

  test("token kernels equal their HOFs on random unicode token arrays") {
    val spark2 = spark
    import spark2.implicits._
    val docs = samples(doc, 60).map(_.toArray)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")

    val rows = df.select(
      col("id"),
      FoldFunctions.markerCount(col("toks"), Seq("the", "a")).as("mc"),
      size(filter(col("toks"), x => x.isin("the", "a"))).as("mc_hof"),
      FoldFunctions.tokenCharSum(col("toks")).as("tcs"),
      expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("tcs_hof"),
      FoldFunctions.rollingFingerprint(col("toks")).as("rfp"),
      expr("aggregate(transform(toks, x -> CAST(length(x) * 131 + " +
        "ascii(substring(x, 1, 1)) AS BIGINT)), 0L, " +
        "(acc, c) -> (acc * 1000003 + c) % 2147483647)").as("rfp_hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"marker_count diverged on row ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"token_char_sum diverged on row ${r.getLong(0)}")
      assert(r.getLong(5) == r.getLong(6), s"rolling_fp diverged on row ${r.getLong(0)}")
    }
  }

  test("PQ kernels equal a plain-Scala reference on random vectors and codebooks") {
    val spark2 = spark
    import spark2.implicits._
    val m = 4
    val dim = 8
    val sub = dim / m
    val floatGen: Gen[Float] = Gen.chooseNum(-4f, 4f)
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dim, floatGen)
    val cbGen: Gen[Seq[(Long, Seq[Float])]] = for {
      k <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(k, vecGen)
    } yield cs.zipWithIndex.map { case (c, i) => (i.toLong * 3, c) } // sparse labels

    def refCodes(cb: Seq[(Long, Seq[Float])], v: Seq[Float]): Seq[Long] =
      (0 until m).map { s =>
        cb.map { case (label, cf) =>
          var dot = 0.0
          (0 until sub).foreach(j => dot += v(s * sub + j).toDouble * cf(s * sub + j).toDouble)
          (label, dot)
        }.reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }._1
      }

    samples(cbGen, 8).foreach { cb =>
      val vecs = samples(vecGen, 25)
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "emb")
        .select(col("id"), PqFunctions.pqCodes(col("emb"), cb, m).as("codes"))
        .orderBy("id").collect()
      rows.zip(vecs).foreach { case (r, v) =>
        assert(r.getSeq[Long](1) == refCodes(cb, v),
          s"pq_codes diverged for $v with codebook $cb")
      }
    }
  }

  test("vector fold kernels equal their HOFs on random ragged inputs") {
    val spark2 = spark
    import spark2.implicits._
    val dim = 6
    val vec: Gen[Seq[Float]] = for {
      n <- Gen.chooseNum(0, dim + 2) // short, exact, and over-length vectors
      vs <- Gen.listOfN(n, Gen.chooseNum(-8f, 8f))
    } yield vs
    val group: Gen[List[(Long, Seq[Float])]] = for {
      n <- Gen.chooseNum(0, 8)
      vs <- Gen.listOfN(n, vec)
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

    val df = samples(group, 40).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }
      .toDF("label", "raw")
      .select(col("label"),
        expr("transform(raw, r -> named_struct('id', r._1, 'emb', r._2))").as("vs"))

    val rows = df.select(
      col("label"),
      FoldFunctions.vecFieldSum(col("vs"), "emb", dim).as("native"),
      expr(s"transform(sequence(1, $dim), d -> aggregate(vs, CAST(0.0 AS DOUBLE), " +
        "(s, v) -> s + CAST(try_element_at(v.emb, d) AS DOUBLE)))").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"vec_field_sum diverged on label ${r.getLong(0)}")
    }
  }
}
