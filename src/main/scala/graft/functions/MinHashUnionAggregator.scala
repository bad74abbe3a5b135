package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` unioning MinHash signatures: the element-wise minimum
  * of per-document signatures IS the signature of the union of their
  * shingle sets — so grouping documents and unioning their sketches yields
  * a constant-size corpus sketch per group, and the fraction of equal
  * components between two group sketches estimates their Jaccard
  * similarity. This is SURVEY §7.3's "custom Aggregator arrives with the
  * north-star extensions (MinHash sketches for dedup)".
  *
  * Scale: the buffer is 16 longs regardless of group size, merges are
  * associative/commutative, and Spark runs it as a partial (map-side)
  * aggregate like any built-in — sketching a 100 TB corpus shuffles only
  * one tiny sketch per group per partition.
  */
object MinHashUnionAggregator
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  val NumPerms = 16

  override def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      var j = 0
      while (j < NumPerms && j < sig.length) {
        if (sig(j) < buf(j)) buf(j) = sig(j)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumPerms) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form: `minhashUnion(sigCol)` over an `array<bigint>` column. */
  def column(sig: Column): Column =
    udaf(this, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(sig)
}
