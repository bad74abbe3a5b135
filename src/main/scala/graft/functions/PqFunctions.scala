package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Product-quantization kernels for the ANN compression path (s05): the
  * embedding splits into `m` contiguous subspaces; each subspace is
  * encoded as the label of the codebook entry with the LARGEST subspace
  * dot product (asymmetric MIPS-flavored PQ — the codebook here is the
  * deterministic bounded-fold centroid table, so both engines hold
  * bit-identical codewords). A 64-dim float vector compresses to `m` = 8
  * longs — at 100 TB the difference between 256 bytes and 64 bytes per
  * corpus row in every scan, shuffle, and cache.
  *
  * Both expressions take the codebook as a CONSTRUCTOR parameter (the
  * [[HyperplaneBucket]] pattern): encoding is then a NARROW map over the
  * corpus — no crossJoin, no shuffle — which is the scale-defining
  * property (an aggregate-argmax formulation would shuffle k× the
  * corpus).
  *
  * Cross-engine exactness (mirrored by the s05 DuckDB CTEs): each
  * subspace dot is an ascending-index left fold in double precision over
  * dims [s·sub, (s+1)·sub); argmax ties break to the SMALLEST label;
  * comparison is IEEE `>` / `==` (so -0.0 ties 0.0, like SQL equality).
  */
private[functions] object PqKernels {
  /** codebook as (label, centroid) arrays, validated rectangular. */
  def matrix(codebook: Seq[(Long, Seq[Float])]): (Array[Long], Array[Array[Float]]) =
    (codebook.map(_._1).toArray, codebook.map(_._2.toArray).toArray)
}

/** PQ encode: `array<float>` embedding → `array<long>` of `m` codeword
  * labels (see [[PqFunctions]] header). Null/short embeddings yield null
  * (a row that cannot encode must not silently land in codeword 0's
  * candidate set). */
case class PqCodes(child: Expression, codebook: Seq[(Long, Seq[Float])], m: Int)
    extends UnaryExpression with CodegenFallback {

  private lazy val (labels, cents) = PqKernels.matrix(codebook)
  private lazy val dim = codebook.head._2.size
  private lazy val sub = dim / m

  override def checkInputDataTypes(): TypeCheckResult =
    if (codebook.isEmpty || codebook.exists(_._2.size != codebook.head._2.size))
      TypeCheckResult.TypeCheckFailure(
        "pq_codes: codebook must be non-empty and rectangular")
    else if (m < 1 || codebook.head._2.size % m != 0)
      TypeCheckResult.TypeCheckFailure(
        s"pq_codes: m=$m must divide the codeword dimension ${codebook.head._2.size}")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { // null element → cannot encode (matches null-in)
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      var bestLabel = 0L
      var bestDot = Double.NegativeInfinity
      var first = true
      var c = 0
      while (c < labels.length) {
        val cf = cents(c)
        var dot = 0.0
        var j = 0
        while (j < sub) {
          dot += arr.getFloat(base + j).toDouble * cf(base + j).toDouble
          j += 1
        }
        if (first || dot > bestDot ||
            (dot == bestDot && labels(c) < bestLabel)) {
          bestDot = dot; bestLabel = labels(c); first = false
        }
        c += 1
      }
      codes(s) = bestLabel
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

/** Asymmetric-distance (ADC) score of a query against a PQ-encoded row:
  * Σ_s dot(query_s, codebook(codes(s))_s), subspace folds and the outer
  * sum both ascending. Semantically identical to the per-query LUT
  * formulation (LUT[s][code] memoizes exactly these dots); executors are
  * free to memoize per (query, codeword) without changing any value.
  * Null inputs or an unknown code yield null. */
case class PqAdcScore(left: Expression, right: Expression,
    codebook: Seq[(Long, Seq[Float])], m: Int)
    extends BinaryExpression with CodegenFallback {

  private lazy val (labels, cents) = PqKernels.matrix(codebook)
  private lazy val dim = codebook.head._2.size
  private lazy val sub = dim / m
  private lazy val byLabel: java.util.HashMap[Long, Array[Float]] = {
    val mp = new java.util.HashMap[Long, Array[Float]](labels.length * 2)
    labels.indices.foreach(i => mp.put(labels(i), cents(i)))
    mp
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (codebook.isEmpty || codebook.exists(_._2.size != codebook.head._2.size))
      TypeCheckResult.TypeCheckFailure(
        "pq_adc_score: codebook must be non-empty and rectangular")
    else if (m < 1 || codebook.head._2.size % m != 0)
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score: m=$m must divide the codeword dimension ${codebook.head._2.size}")
    else (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<float>, array<long>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, codesIn: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (qv.numElements() < dim || codes.numElements() != m) return null
    var score = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val cf = byLabel.get(codes.getLong(s))
      if (cf == null) return null
      val base = s * sub
      var dot = 0.0
      var j = 0
      while (j < sub) {
        if (qv.isNullAt(base + j)) return null
        dot += qv.getFloat(base + j).toDouble * cf(base + j).toDouble
        j += 1
      }
      score += dot
      s += 1
    }
    score
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  /** PQ codes column (see [[PqCodes]]). */
  def pqCodes(emb: Column, codebook: Seq[(Long, Seq[Float])], m: Int): Column =
    ColumnShim.column(PqCodes(ColumnShim.expression(emb), codebook, m))

  /** ADC approximate score column (see [[PqAdcScore]]). */
  def pqAdcScore(qv: Column, codes: Column, codebook: Seq[(Long, Seq[Float])],
      m: Int): Column =
    ColumnShim.column(PqAdcScore(
      ColumnShim.expression(qv), ColumnShim.expression(codes), codebook, m))
}
