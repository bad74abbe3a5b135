package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The PQ kernels vs a plain-Scala reference implementation: encode
  * argmax (ties to the smallest label), ADC score as the sum of the
  * encoded codewords' subspace dots, and the null/short guard rails. */
class PqFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private val m = 2
  private val dim = 4
  private val codebook: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 1f),
    1L -> Seq(0f, 1f, 1f, 0f),
    2L -> Seq(1f, 0f, 0f, 1f)) // duplicate of 0 — exercises the tie rule

  private def refCodes(v: Seq[Float]): Seq[Long] =
    (0 until m).map { s =>
      codebook.map { case (label, cf) =>
        val dot = (0 until dim / m).map(j =>
          v(s * dim / m + j).toDouble * cf(s * dim / m + j).toDouble).sum
        (label, dot)
      }.sortBy { case (label, dot) => (-dot, label) }.head._1
    }

  private def refScore(q: Seq[Float], codes: Seq[Long]): Double =
    (0 until m).map { s =>
      val cf = codebook.find(_._1 == codes(s)).get._2
      (0 until dim / m).map(j =>
        q(s * dim / m + j).toDouble * cf(s * dim / m + j).toDouble).sum
    }.sum

  test("PqCodes matches the reference argmax incl. the smallest-label tie") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = Seq(
      Seq(2f, 1f, 1f, 2f),   // subspace ties between labels 0 and 2 → 0
      Seq(0f, 3f, 3f, 0f),   // label 1 wins both
      Seq(1f, 1f, 1f, 1f))   // full tie → smallest label per subspace
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .select(col("id"), PqFunctions.pqCodes(col("emb"), codebook, m).as("codes"))
      .orderBy("id").collect()
    rows.zip(vecs).foreach { case (r, v) =>
      assert(r.getSeq[Long](1) == refCodes(v), s"vector $v")
    }
  }

  test("PqCodes NaN ranks first — strictly above +Infinity, position-independent") {
    val spark2 = spark
    import spark2.implicits._
    // dim 2, m 1: an Inf embedding value gives dot = +Inf against a
    // codeword with a non-zero first dim and dot = NaN (Inf * 0) against
    // a zero first dim. DuckDB's ORDER BY d DESC, clabel codes the NaN
    // codeword (NaN sorts above Inf) — both label orders must agree, and
    // collapsing NaN to +Inf (the r9 first fix) would wrongly let the
    // label tie-break pick the Inf codeword when it has the lower label.
    val inf = Float.PositiveInfinity
    def code(cb: Seq[(Long, Seq[Float])]): Long =
      Seq((1L, Seq(inf, 1f))).toDF("id", "emb")
        .select(PqFunctions.pqCodes(col("emb"), cb, 1).as("c"))
        .collect().head.getSeq[Long](0).head
    // NaN codeword carries the HIGHER label → must still win
    assert(code(Seq(0L -> Seq(1f, 1f), 1L -> Seq(0f, 1f))) == 1L)
    // NaN codeword carries the LOWER label → wins too
    assert(code(Seq(0L -> Seq(0f, 1f), 1L -> Seq(1f, 1f))) == 0L)
    // two NaN codewords → label tie-break
    assert(code(Seq(0L -> Seq(0f, 1f), 1L -> Seq(0f, 2f))) == 0L)
  }

  test("PqLut + PqLutScore equal the sum of encoded subspace dots") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(Seq(2f, 1f, 1f, 2f), Seq(0f, 3f, 3f, 0f))
    val q = Seq(1f, 2f, 2f, 1f)
    val rows = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v, q) }
      .toDF("id", "emb", "qv")
      .select(col("id"),
        PqFunctions.pqLutScore(
          PqFunctions.pqLut(col("qv"), codebook, m),
          PqFunctions.pqCodes(col("emb"), codebook, m), codebook, m).as("score"))
      .orderBy("id").collect()
    rows.zip(corpus).foreach { case (r, v) =>
      assert(r.getDouble(1) == refScore(q, refCodes(v)), s"vector $v")
    }
  }

  test("null / short / unknown-code inputs yield null, never a wrong bucket") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Option(Seq(1f, 2f)), Option(Seq(0L, 1L))),   // short vector
      (2L, Option.empty[Seq[Float]], Option(Seq(0L, 1L))), // null vector
      (3L, Option(Seq(1f, 2f, 3f, 4f)), Option(Seq(0L, 99L)))) // unknown code
      .toDF("id", "emb", "codes")
    val rows = df.select(col("id"),
        PqFunctions.pqCodes(col("emb"), codebook, m).as("c"),
        PqFunctions.pqLutScore(
          PqFunctions.pqLut(col("emb"), codebook, m), col("codes"),
          codebook, m).as("s"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2)) // short → null both
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // null vector
    assert(rows(2).isNullAt(2)) // unknown codeword label
  }

  private def refSqError(v: Seq[Float], codes: Seq[Long]): Seq[Double] =
    (0 until m).map { s =>
      val cf = codebook.find(_._1 == codes(s)).get._2
      (0 until dim / m).map { j =>
        val d = v(s * dim / m + j).toDouble - cf(s * dim / m + j).toDouble
        d * d
      }.sum
    }

  test("PqSqError matches the reference per-subspace reconstruction error") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = Seq(Seq(2f, 1f, 1f, 2f), Seq(0f, 3f, 3f, 0f), Seq(1f, 1f, 1f, 1f))
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .select(col("id"), col("emb"),
        PqFunctions.pqSqError(col("emb"),
          PqFunctions.pqCodes(col("emb"), codebook, m), codebook, m).as("errs"))
      .orderBy("id").collect()
    rows.zip(vecs).foreach { case (r, v) =>
      assert(r.getSeq[Double](2) == refSqError(v, refCodes(v)), s"vector $v")
    }
    // a perfectly-representable vector (a codeword itself) has zero error
    val zero = Seq((0L, Seq(0f, 1f, 1f, 0f))).toDF("id", "emb")
      .select(PqFunctions.pqSqError(col("emb"),
        PqFunctions.pqCodes(col("emb"), codebook, m), codebook, m))
      .head().getSeq[Double](0)
    assert(zero == Seq(0.0, 0.0))
  }

  test("PqSqError null rails mirror PqCodes; stale label is LOUD") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Option(Seq(1f, 2f)), Option(Seq(0L, 1L))),      // short vector
      (2L, Option.empty[Seq[Float]], Option(Seq(0L, 1L))), // null vector
      (3L, Option(Seq(1f, 2f, 3f, 4f)), Option.empty[Seq[Long]])) // null codes
      .toDF("id", "emb", "codes")
    val rows = df.select(col("id"),
        PqFunctions.pqSqError(col("emb"), col("codes"), codebook, m).as("e"))
      .orderBy("id").collect()
    assert(rows.forall(_.isNullAt(1)))
    // unknown label = stale codes or wrong codebook → loud config error
    // (local mode surfaces the IAE directly; a cluster wraps it in
    // SparkException — assert on the message, not the wrapper)
    val boom = intercept[Exception] {
      Seq((1L, Seq(1f, 2f, 3f, 4f), Seq(0L, 99L))).toDF("id", "emb", "codes")
        .select(PqFunctions.pqSqError(col("emb"), col("codes"), codebook, m))
        .collect()
    }
    assert(boom.getMessage.contains("99") ||
      Option(boom.getCause).exists(_.getMessage.contains("99")))
  }
}
