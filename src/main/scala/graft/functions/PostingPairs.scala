package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Candidate-pair expansion of one shingle posting list: input is the
  * posting array `array<struct<doc_id: bigint, n_sh: int>>` for a single
  * shingle; output is one row per unordered doc pair `(doc_a, na, doc_b,
  * nb)` with `doc_a < doc_b` — k·(k−1)/2 rows for a k-doc list.
  *
  * This is the hot loop of the n-gram-Jaccard inverted index (DedupQueries
  * .jaccardPairCounts): the equivalent built-in formulation (nested
  * `transform` + `slice` + `flatten` + `explode`) evaluates an interpreted
  * lambda per emitted struct — millions of dispatches per corpus — while
  * this Generator emits the pairs from one tight loop per posting list,
  * exactly like the built-in `explode` (also a Generator) but fused with
  * the pair construction. Input order doesn't matter: the list is sorted
  * by doc_id in-place here, so callers don't need an `array_sort`
  * (interpreted struct comparator) upstream.
  */
case class PostingPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, IntegerType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<struct<bigint, int>>, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Nil
    val arr = value.asInstanceOf[ArrayData]
    val k = arr.numElements()
    if (k < 2) return Nil
    val ids = new Array[Long](k)
    val ns = new Array[Int](k)
    var i = 0
    while (i < k) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      ns(i) = s.getInt(1)
      i += 1
    }
    // insertion sort by doc_id (posting lists are short — bounded upstream)
    i = 1
    while (i < k) {
      val id = ids(i); val n = ns(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) { ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1 }
      ids(j + 1) = id; ns(j + 1) = n
      i += 1
    }
    // lazy pair stream: k·(k−1)/2 can be huge for an uncapped posting
    // list, so never materialize the expansion — GenerateExec consumes
    // the iterator row by row
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < k - 1
      override def next(): InternalRow = {
        val row = new GenericInternalRow(
          Array[Any](ids(a), ns(a), ids(b), ns(b)))
        b += 1
        if (b >= k) { a += 1; b = a + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): PostingPairs =
    copy(child = c)
}

object PostingPairs {
  /** Pair-expansion column over an `array<struct<doc_id, n_sh>>` posting
    * list; select it like `explode` (it IS a Generator). */
  def postingPairs(posting: Column): Column =
    ColumnShim.column(PostingPairs(ColumnShim.expression(posting)))
}
