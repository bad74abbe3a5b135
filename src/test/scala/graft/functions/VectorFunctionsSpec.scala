package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.VectorFunctions.cosineSim

class VectorFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def run(a: Seq[Float], b: Seq[Float], codegen: Boolean): java.lang.Double = {
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      import spark.implicits._
      Seq((a, b)).toDF("a", "b")
        .select(cosineSim(col("a"), col("b")).as("c"))
        .head().getAs[java.lang.Double]("c")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  private def reference(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = a.map(x => x.toDouble * x.toDouble).sum
    val nb = b.map(x => x.toDouble * x.toDouble).sum
    dot / math.sqrt(na * nb)
  }

  test("matches reference fold in both codegen and interpreted modes") {
    val a = Seq(0.1f, -0.5f, 0.25f, 3.0f)
    val b = Seq(1.5f, 0.25f, -2.0f, 0.75f)
    assert(run(a, b, codegen = true) == reference(a, b))
    assert(run(a, b, codegen = false) == reference(a, b))
  }

  test("identical vectors give cosine 1") {
    val v = Seq(0.3f, -0.7f, 0.2f)
    assert(math.abs(run(v, v, codegen = true) - 1.0) < 1e-12)
  }

  test("orthogonal vectors give cosine 0") {
    assert(run(Seq(1f, 0f), Seq(0f, 1f), codegen = true) == 0.0)
  }

  test("null input gives null") {
    import spark.implicits._
    val r = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("vecSub: double-subtract-then-round semantics, null guards") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Option(Seq(1.5f, 2.5f, 0.1f)), Option(Seq(0.5f, 1.0f, 0.3f))),
      (2L, Option(Seq(1.0f, 2.0f, 3.0f)), Option(Seq(1.0f, 2.0f))), // right short
      (3L, Option.empty[Seq[Float]], Option(Seq(1.0f))))            // null left
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        graft.functions.VectorFunctions.vecSub(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    val expected = Seq(1.5f, 2.5f, 0.1f).zip(Seq(0.5f, 1.0f, 0.3f))
      .map { case (x, y) => (x.toDouble - y.toDouble).toFloat }
    assert(rows(0).getSeq[Float](1) == expected)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("rejects non-float-array inputs at analysis") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
        .select(cosineSim(col("a"), col("b"))).head()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>"))
  }
}
