package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property check for the SQ8 kernels: on RANDOM vectors (including
  * out-of-bounds, negative, NaN, and boundary-exact values) the native
  * encode must equal the plain-Scala reference of the documented
  * arithmetic, and decode∘encode must reconstruct within one scale step
  * on every in-bounds finite dimension. Fixed-seed sampling like the
  * sibling property specs (scalatestplus is not in the offline cache). */
class Sq8FunctionsPropertySpec extends AnyFunSuite with SparkTestSession {

  private val dim = 8
  private val mins = Seq(-2f, 0f, 1f, -5f, 3f, -1f, 0f, 2f)
  private val maxs = Seq(2f, 1f, 1f, 5f, 4f, 0f, 255f, 2.5f) // dim 2 degenerate
  private val scales = mins.zip(maxs).map { case (mn, mx) =>
    (mx.toDouble - mn.toDouble) / 255.0 }

  private def refCodes(v: Seq[Float]): Seq[Long] =
    (0 until dim).map { i =>
      val s = scales(i)
      val x = v(i)
      if (s == 0 || x.isNaN) 0L
      else {
        val lvl = math.floor((x.toDouble - mins(i).toDouble) / s)
        if (lvl < 0) 0L else if (lvl > 255) 255L else lvl.toLong
      }
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(16), Seed(1717L + i)))

  private val component: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-10f, 10f),
    Gen.oneOf(Float.NaN, -0.0f, 0.0f, 255f, 256f, -5f, 5f, 2.5f),
    Gen.chooseNum(-1000f, 1000f))

  private val vec: Gen[List[Float]] = Gen.listOfN(dim, component)

  test("native encode equals the reference arithmetic on random vectors") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = samples(vec, 120)
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .select(col("id"), Sq8Functions.sq8Codes(col("emb"), mins, scales).as("c"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    got.zip(vecs).foreach { case (g, v) =>
      assert(g == refCodes(v), s"vector $v")
    }
  }

  test("decode(encode(x)) is within one scale step on in-bounds finite dims") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = samples(vec, 60)
    val rec = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .select(col("id"), Sq8Functions.sq8Decode(
        Sq8Functions.sq8Codes(col("emb"), mins, scales), mins, scales).as("r"))
      .orderBy("id").collect().map(_.getSeq[Float](1))
    rec.zip(vecs).foreach { case (r, v) =>
      (0 until dim).foreach { i =>
        val x = v(i)
        if (!x.isNaN && scales(i) > 0 && x >= mins(i) && x <= maxs(i)) {
          assert(math.abs(r(i) - x) <= scales(i) + 1e-5,
            s"dim $i of $v reconstructed to ${r(i)}")
        }
      }
    }
  }
}
