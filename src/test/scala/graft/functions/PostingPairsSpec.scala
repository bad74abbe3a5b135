package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.PostingPairs.postingPairs

class PostingPairsSpec extends AnyFunSuite with SparkTestSession {

  private def expand(posting: Seq[(Long, Int)]): Seq[(Long, Int, Long, Int)] = {
    val s = posting.sortBy(_._1)
    for {
      i <- s.indices
      j <- (i + 1) until s.size
    } yield (s(i)._1, s(i)._2, s(j)._1, s(j)._2)
  }

  test("emits sorted unordered pairs, k(k-1)/2 of them") {
    import spark.implicits._
    val posting = Seq((30L, 3), (10L, 1), (20L, 2))
    val got = Seq(Tuple1(posting)).toDF("ds")
      .select(postingPairs(col("ds")).as(Seq("doc_a", "na", "doc_b", "nb")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    assert(got == expand(posting).sorted)
    assert(got.size == 3)
    assert(got.forall { case (a, _, b, _) => a < b })
  }

  test("singleton and empty lists emit nothing") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq((1L, 5))), Tuple1(Seq.empty[(Long, Int)])).toDF("ds")
    assert(df.select(postingPairs(col("ds"))).count() == 0)
  }

  test("agrees with the interpreted HOF formulation") {
    import spark.implicits._
    val posting = (1L to 9L).map(i => (i * 7 % 10, i.toInt)) // unsorted ids
    val df = Seq(Tuple1(posting)).toDF("ds")
    val viaGen = df
      .select(postingPairs(col("ds")).as(Seq("doc_a", "na", "doc_b", "nb")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    val viaHof = df
      .withColumn("ds", expr("array_sort(transform(ds, x -> struct(x._1 AS doc_id, x._2 AS n_sh)))"))
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ds) - 1), i -> " +
          "transform(slice(ds, i + 1, size(ds) - i), y -> struct(" +
          "element_at(ds, i).doc_id AS doc_a, element_at(ds, i).n_sh AS na, " +
          "y.doc_id AS doc_b, y.n_sh AS nb))))")).as("p"))
      .select("p.*")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    assert(viaGen == viaHof)
  }
}
