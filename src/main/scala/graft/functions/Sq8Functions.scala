package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels for the ANN compression path (s14):
  * every dimension quantizes independently to an 8-bit level against
  * per-dimension corpus [min, max] bounds —
  * `code_i = clamp(floor((x_i − min_i) / scale_i), 0, 255)` with
  * `scale_i = (max_i − min_i) / 255` — the FAISS `SQ8` flat layout. A
  * 64-dim float vector compresses to 64 byte-valued levels: 4× less
  * memory traffic than raw floats in every scan at 100 TB, with none of
  * PQ's codebook training (the bounds are two 64-float aggregates).
  *
  * Like the PQ family, the bounds ride in as CONSTRUCTOR parameters
  * (broadcast-sized: dim mins + dim scales), so encode/decode are NARROW
  * maps over the corpus — no join, no shuffle. Decode reconstructs
  * `min_i + code_i · scale_i` rounded to float, so the approximate
  * ranking reuses the codegen'd [[CosineSimilarity]] over reconstructed
  * vectors.
  *
  * Cross-engine exactness (mirrored by the s14 DuckDB CTEs): the float
  * bounds are exact min/max (order-independent); scale and the quantize
  * expression are single IEEE double ops (subtract, divide, floor —
  * each exactly rounded); a degenerate dimension (`max == min`, scale 0)
  * encodes to level 0 and decodes to `min_i`; NaN input dims encode to
  * level 0 (DuckDB's `floor(NaN)` path is never reached because the
  * oracle maps NaN the same way explicitly). Null/short inputs yield
  * null, the PQ convention. */
private[functions] object Sq8Kernels {
  def validate(fn: String, mins: Seq[Float], scales: Seq[Double])
      : Option[TypeCheckResult] =
    if (mins.isEmpty || mins.size != scales.size)
      Some(TypeCheckResult.TypeCheckFailure(
        s"$fn: bounds must be non-empty and mins/scales the same length " +
          s"(got ${mins.size}/${scales.size})"))
    else if (scales.exists(s => s < 0 || s.isNaN || s.isInfinite))
      Some(TypeCheckResult.TypeCheckFailure(
        s"$fn: scales must be finite and non-negative"))
    else None
}

/** SQ8 encode: `array<float>` → `array<long>` of per-dimension levels in
  * [0, 255]. */
case class Sq8Codes(child: Expression, mins: Seq[Float], scales: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  private lazy val mn = mins.toArray
  private lazy val sc = scales.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    Sq8Kernels.validate("sq8_codes", mins, scales).getOrElse(child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_codes expects array<float>, got ${other.simpleString}")
    })

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = mn.length
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Long](dim)
    i = 0
    while (i < dim) {
      val s = sc(i)
      val x = arr.getFloat(i)
      codes(i) =
        if (s == 0 || java.lang.Float.isNaN(x)) 0L
        else {
          val lvl = math.floor((x.toDouble - mn(i).toDouble) / s)
          if (lvl < 0) 0L else if (lvl > 255) 255L else lvl.toLong
        }
      i += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Sq8Codes =
    copy(child = c)
}

/** SQ8 decode: `array<long>` levels → reconstructed `array<float>`
  * (`min_i + code_i · scale_i`, rounded to float). */
case class Sq8Decode(child: Expression, mins: Seq[Float], scales: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  private lazy val mn = mins.toArray
  private lazy val sc = scales.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    Sq8Kernels.validate("sq8_decode", mins, scales).getOrElse(child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_decode expects array<bigint>, got ${other.simpleString}")
    })

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = mn.length
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) {
      out(i) = (mn(i).toDouble + arr.getLong(i) * sc(i)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Sq8Decode =
    copy(child = c)
}

object Sq8Functions {
  def sq8Codes(emb: Column, mins: Seq[Float], scales: Seq[Double]): Column =
    ColumnShim.column(Sq8Codes(ColumnShim.expression(emb), mins, scales))

  def sq8Decode(codes: Column, mins: Seq[Float], scales: Seq[Double]): Column =
    ColumnShim.column(Sq8Decode(ColumnShim.expression(codes), mins, scales))
}
