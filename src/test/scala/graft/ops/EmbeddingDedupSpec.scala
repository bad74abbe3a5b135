package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Correctness of the embedding near-dup operators:
  *
  *   - the block-partitioned exact pair join must equal the all-pairs
  *     ground truth for any block count (blocking is a layout, not a
  *     semantic);
  *   - the LSH banding path must always return a SUBSET of the exact
  *     pairs (the verify pass is exact — false positives impossible) and
  *     reach near-total recall at true near-dup cosine levels (the
  *     banding S-curve knee sits far below cos ≈ 0.95).
  */
class EmbeddingDedupSpec extends AnyFunSuite with SparkTestSession {

  private val dim = 64

  /** Deterministic synthetic corpus: `n` pseudo-random unit-ish vectors
    * plus, for the first `dups` of them, a slightly perturbed copy (cosine
    * to the original ≥ ~0.99 — a true near-dup). */
  private def corpus(n: Int, dups: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0 until n).map(i => (i.toLong, vec()))
    val perturbed = base.take(dups).map { case (i, v) =>
      (1000L + i, v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
    }
    val rows = (base ++ perturbed).map { case (i, v) => Row(i, v.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** All-pairs ground truth via a plain crossJoin (test-only). */
  private def bruteForce(df: org.apache.spark.sql.DataFrame, minCos: Double) = {
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.VectorFunctions.cosineSim(col("_va"), col("_vb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  test("blocked exact pair join equals all-pairs ground truth for several block counts") {
    val df = corpus(120, 15).cache()
    val truth = pairSet(bruteForce(df, 0.4))
    assert(truth.nonEmpty, "fixture produced no qualifying pairs")
    for (blocks <- Seq(1, 2, 7, 16)) {
      val got = pairSet(Dedup.embeddingNearDups(df, "vec_id", "embedding", 0.4, blocks))
      assert(got == truth, s"blocks=$blocks diverged from ground truth")
    }
    df.unpersist()
  }

  test("LSH path: subset of exact result; full recall on true near-dups") {
    val planeTables = graft.queries.SimilarityQueries.lshTables.map(_.map(_.map(_.toDouble)))
    val df = corpus(150, 20).cache()
    // at a true near-dup threshold the perturbed copies all qualify
    val exact = pairSet(bruteForce(df, 0.95))
    assert(exact.size >= 20, s"expected the 20 planted near-dup pairs, got ${exact.size}")
    val lsh = pairSet(Dedup.embeddingNearDupsLsh(df, "vec_id", "embedding", 0.95, planeTables))
    assert(lsh.subsetOf(exact), "LSH returned a pair the exact verify should have rejected")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9 at cos≥0.95 (S-curve should be ≈1 here)")
    df.unpersist()
  }
}
