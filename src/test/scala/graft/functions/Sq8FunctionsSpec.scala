package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The SQ8 kernels vs a plain-Scala reference: quantize/clamp/degenerate
  * rules, decode reconstruction, and the null guard rails. */
class Sq8FunctionsSpec extends AnyFunSuite with SparkTestSession {

  private val mins = Seq(0f, -1f, 5f)
  private val scales = Seq(1.0 / 255.0, 2.0 / 255.0, 0.0) // dim 2 degenerate

  test("encode: floor-quantize, clamp to [0,255], degenerate and NaN dims to 0") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, Seq(0.5f, 0f, 5f)),           // mid-range
      (2L, Seq(-3f, 99f, 7f)),           // below min / above max → clamp
      (3L, Seq(1f, Float.NaN, 5f))       // NaN dim → level 0
    ).toDF("id", "emb")
      .select(col("id"), Sq8Functions.sq8Codes(col("emb"), mins, scales).as("c"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    assert(rows(0) == Seq(127L, 127L, 0L)) // floor(0.5*255)=127; floor(1/(2/255))=127
    assert(rows(1) == Seq(0L, 255L, 0L))
    assert(rows(2) == Seq(255L, 0L, 0L))  // 1.0 over a [0,1] range clamps to 255
  }

  test("decode reconstructs min + level*scale as float; round-trip error <= scale") {
    val spark2 = spark
    import spark2.implicits._
    val x = Seq(0.42f, 0.13f, 5f)
    val rec = Seq((1L, x)).toDF("id", "emb")
      .select(Sq8Functions.sq8Decode(
        Sq8Functions.sq8Codes(col("emb"), mins, scales), mins, scales).as("r"))
      .collect().head.getSeq[Float](0)
    assert(math.abs(rec(0) - x(0)) <= scales(0) + 1e-7)
    assert(math.abs(rec(1) - x(1)) <= scales(1) + 1e-7)
    assert(rec(2) == 5f) // degenerate dim decodes to its min exactly
  }

  test("null / short inputs yield null; bad bounds fail analysis loudly") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq((1L, Seq(1f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "emb")
      .select(Sq8Functions.sq8Codes(col("emb"), mins, scales).as("c"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "emb")
        .select(Sq8Functions.sq8Codes(col("emb"), Seq(0f), Seq(1.0, 2.0)))
        .collect()
    }
    assert(e.getMessage.contains("mins/scales"))
  }
}
