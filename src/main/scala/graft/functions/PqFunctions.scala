package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Product-quantization kernels for the ANN compression path (s05/s06):
  * the embedding splits into `m` contiguous subspaces; each subspace is
  * encoded as the label of the codebook entry with the LARGEST subspace
  * dot product (asymmetric MIPS-flavored PQ — the codebook here is the
  * deterministic bounded-fold centroid table, so both engines hold
  * bit-identical codewords). A 64-dim float vector compresses to `m` = 8
  * longs — at 100 TB the difference between 256 bytes and 64 bytes per
  * corpus row in every scan, shuffle, and cache.
  *
  * The expressions take the codebook as a CONSTRUCTOR parameter (the
  * [[HyperplaneBucket]] pattern): encoding is then a NARROW map over the
  * corpus — no crossJoin, no shuffle — which is the scale-defining
  * property (an aggregate-argmax formulation would shuffle k× the
  * corpus). Scoring follows the standard ADC split: [[PqLut]] computes
  * the k×m table of subspace dots ONCE per query (on the small,
  * broadcast side), and [[PqLutScore]] reduces each candidate to `m`
  * array reads + adds — not a recomputed dot product per pair.
  *
  * Cross-engine exactness (mirrored by the s05/s06 DuckDB CTEs): each
  * subspace dot is an ascending-index left fold in double precision over
  * dims [s·sub, (s+1)·sub); the score is the ascending-s sum of the
  * encoded codewords' dots; argmax ties break to the SMALLEST label;
  * comparison is IEEE `>` / `==` (so -0.0 ties 0.0, like SQL equality).
  */
private[functions] object PqKernels {
  /** codebook as (label, centroid) arrays. */
  def matrix(codebook: Seq[(Long, Seq[Float])]): (Array[Long], Array[Array[Float]]) =
    (codebook.map(_._1).toArray, codebook.map(_._2.toArray).toArray)

  /** Shared analysis-time validation of the (codebook, m) parameters —
    * one definition so a rule added for one PQ expression cannot be
    * missed in the others. */
  def validate(fn: String, codebook: Seq[(Long, Seq[Float])], m: Int)
      : Option[TypeCheckResult] =
    if (codebook.isEmpty || codebook.exists(_._2.size != codebook.head._2.size))
      Some(TypeCheckResult.TypeCheckFailure(
        s"$fn: codebook must be non-empty and rectangular"))
    else if (codebook.map(_._1).distinct.size != codebook.size)
      Some(TypeCheckResult.TypeCheckFailure(
        s"$fn: codebook labels must be distinct"))
    else if (m < 1 || codebook.head._2.size % m != 0)
      Some(TypeCheckResult.TypeCheckFailure(
        s"$fn: m=$m must divide the codeword dimension ${codebook.head._2.size}"))
    else None
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
    PqKernels.validate("pq_codes", codebook, m).getOrElse(child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects array<float>, got ${other.simpleString}")
    })

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
      var bestNaN = false
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
        // NaN subspace dot (zero/NaN/Inf-contaminated operands) ranks
        // FIRST — strictly above +Infinity — matching the oracle's
        // `ORDER BY d DESC` (DuckDB sorts NaN greatest, above Inf).
        // Tracked as an explicit flag rather than mapped to +Infinity:
        // a +Inf dot (an Inf embedding value against a non-zero
        // codeword dim) and a NaN dot (the same value against a zero
        // dim, Inf*0) can coexist in one argmax, and collapsing NaN to
        // +Inf would let the label tie-break pick the Inf candidate
        // where DuckDB codes the NaN one. Without any handling the
        // argmax was asymmetric: a NaN at codebook index 0 won
        // permanently (first=true) while a later NaN never could
        // (`dot > NaN` is false). Ties among NaNs (and among equal
        // non-NaNs) fall to the label, row_number's `, clabel` order.
        val nan = java.lang.Double.isNaN(dot)
        val better =
          if (first) true
          else if (nan || bestNaN)
            (nan && !bestNaN) || (nan && bestNaN && labels(c) < bestLabel)
          else dot > bestDot || (dot == bestDot && labels(c) < bestLabel)
        if (better) {
          bestDot = dot; bestLabel = labels(c); bestNaN = nan; first = false
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

/** The per-query ADC lookup table: `array<float>` query → `array<double>`
  * of k×m subspace dots, laid out `lut(c*m + s) = dot(query_s,
  * codebook(c)_s)` in codebook order. Computed ONCE per query row (the
  * small/broadcast side of the candidate join); [[PqLutScore]] then
  * scores each candidate with `m` reads. Null/short queries yield null. */
case class PqLut(child: Expression, codebook: Seq[(Long, Seq[Float])], m: Int)
    extends UnaryExpression with CodegenFallback {

  private lazy val (_, cents) = PqKernels.matrix(codebook)
  private lazy val dim = codebook.head._2.size
  private lazy val sub = dim / m

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernels.validate("pq_lut", codebook, m).getOrElse(child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_lut expects array<float>, got ${other.simpleString}")
    })

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    if (qv.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (qv.isNullAt(i)) return null
      i += 1
    }
    val lut = new Array[Double](cents.length * m)
    var c = 0
    while (c < cents.length) {
      val cf = cents(c)
      var s = 0
      while (s < m) {
        val base = s * sub
        var dot = 0.0
        var j = 0
        while (j < sub) {
          dot += qv.getFloat(base + j).toDouble * cf(base + j).toDouble
          j += 1
        }
        lut(c * m + s) = dot
        s += 1
      }
      c += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

/** ADC score from a precomputed [[PqLut]] table and a row's
  * [[PqCodes]]: Σ_s lut(idx(codes(s))·m + s), ascending s — `m` array
  * reads + adds per candidate, value-identical to recomputing
  * Σ_s dot(query_s, codebook(codes(s))_s) directly (the LUT entries ARE
  * those dots). Null inputs or an unknown code yield null. */
case class PqLutScore(left: Expression, right: Expression,
    codebook: Seq[(Long, Seq[Float])], m: Int)
    extends BinaryExpression with CodegenFallback {

  private lazy val labelIndex: java.util.HashMap[Long, Integer] = {
    val mp = new java.util.HashMap[Long, Integer](codebook.size * 2)
    codebook.map(_._1).zipWithIndex.foreach { case (l, i) => mp.put(l, i) }
    mp
  }

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernels.validate("pq_lut_score", codebook, m).getOrElse(
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_lut_score expects (array<double> lut, array<long> codes), got " +
            s"${l.simpleString} and ${r.simpleString}")
      })

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(lutIn: Any, codesIn: Any): Any = {
    val lut = lutIn.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (codes.numElements() != m || lut.numElements() != codebook.size * m)
      return null
    var score = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = labelIndex.get(codes.getLong(s))
      if (idx == null) return null
      score += lut.getDouble(idx * m + s)
      s += 1
    }
    score
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutScore =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace squared RECONSTRUCTION error of an encoded row —
  * `array<float>` embedding × `array<long>` codes → `array<double>` of
  * `m` errors, err(s) = Σ_j (e[s·sub+j] − codeword[codes(s)][s·sub+j])²
  * as an ascending-j double fold (each square is one widen-subtract-
  * multiply — no `pow`, whose libm need not be exact even for p = 2).
  * This is the distortion diagnostic FAISS reports at train time; s22
  * aggregates it corpus-wide per subspace. Null embedding / short
  * embedding / null codes row → null (mirrors [[PqCodes]]: a row that
  * never encoded contributes no distortion). A label absent from the
  * codebook is a CONFIG bug, not a data condition — loud
  * IllegalArgumentException naming the label, the collectCodebook
  * discipline. */
case class PqSqError(left: Expression, right: Expression,
    codebook: Seq[(Long, Seq[Float])], m: Int)
    extends BinaryExpression with CodegenFallback {

  private lazy val (labels, cents) = PqKernels.matrix(codebook)
  private lazy val dim = codebook.head._2.size
  private lazy val sub = dim / m
  private lazy val labelIndex: java.util.HashMap[Long, Integer] = {
    val mp = new java.util.HashMap[Long, Integer](codebook.size * 2)
    labels.zipWithIndex.foreach { case (l, i) => mp.put(l, i) }
    mp
  }

  override def checkInputDataTypes(): TypeCheckResult =
    PqKernels.validate("pq_sq_error", codebook, m).getOrElse(
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_sq_error expects (array<float> embedding, array<long> codes), " +
            s"got ${l.simpleString} and ${r.simpleString}")
      })

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(embIn: Any, codesIn: Any): Any = {
    val arr = embIn.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    if (arr.numElements() < dim || codes.numElements() != m) return null
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val errs = new Array[Double](m)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val label = codes.getLong(s)
      val idx = labelIndex.get(label)
      if (idx == null) throw new IllegalArgumentException(
        s"pq_sq_error: code label $label at subspace $s is not in the " +
          s"${codebook.size}-entry codebook — stale codes or wrong codebook")
      val cf = cents(idx)
      val base = s * sub
      var err = 0.0
      var j = 0
      while (j < sub) {
        val d = arr.getFloat(base + j).toDouble - cf(base + j).toDouble
        err += d * d
        j += 1
      }
      errs(s) = err
      s += 1
    }
    new GenericArrayData(errs)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSqError =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  /** PQ codes column (see [[PqCodes]]). */
  def pqCodes(emb: Column, codebook: Seq[(Long, Seq[Float])], m: Int): Column =
    ColumnShim.column(PqCodes(ColumnShim.expression(emb), codebook, m))

  /** Per-query ADC lookup table column (see [[PqLut]]). */
  def pqLut(qv: Column, codebook: Seq[(Long, Seq[Float])], m: Int): Column =
    ColumnShim.column(PqLut(ColumnShim.expression(qv), codebook, m))

  /** ADC score from a LUT and a codes column (see [[PqLutScore]]). */
  def pqLutScore(lut: Column, codes: Column, codebook: Seq[(Long, Seq[Float])],
      m: Int): Column =
    ColumnShim.column(PqLutScore(
      ColumnShim.expression(lut), ColumnShim.expression(codes), codebook, m))

  /** Per-subspace squared reconstruction error (see [[PqSqError]]). */
  def pqSqError(emb: Column, codes: Column, codebook: Seq[(Long, Seq[Float])],
      m: Int): Column =
    ColumnShim.column(PqSqError(
      ColumnShim.expression(emb), ColumnShim.expression(codes), codebook, m))
}
