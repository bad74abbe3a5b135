package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity between two float-vector columns as a native Catalyst
  * expression with whole-stage codegen — the hot-loop primitive for the
  * similarity/ANN operators (builder prompt: "custom Expression beats a
  * Scala UDF").
  *
  * Versus `zip_with`+`aggregate` built-ins this avoids materializing an
  * intermediate array per row and fuses the dot product and both norms into
  * one pass; versus a UDF it stays inside WholeStageCodegen with no
  * (de)serialization.
  *
  * Semantics (mirrored exactly by the DuckDB oracle SQL): ascending-index
  * left fold in double precision of `dot`, `na`, `nb`; result
  * `dot / sqrt(na * nb)`. Division by a zero norm follows IEEE (NaN/Inf)
  * in both engines.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of an `array<float>` embedding: bit j of
  * the result is set iff `dot(emb, planes(j)) > 0` — the signature primitive
  * behind s02/d07's bucketed candidate generation.
  *
  * This replaces the earlier nested `aggregate` higher-order-function
  * formulation, which interpreted one lambda call per vector ELEMENT per
  * plane (HOFs are CodegenFallback in Spark) and dominated d07's runtime;
  * here the whole planes × dims loop is one tight JVM loop per row.
  * CodegenFallback by choice, like [[MinHashSignature]]: per-row work is
  * hundreds of flops, so row-level dispatch overhead is noise.
  *
  * Exact-match semantics (mirrored by the DuckDB oracle SQL and identical
  * to the HOF it replaces): per plane, an ascending-index left fold of
  * `emb(i)·plane(i)` in double precision; a NULL or shorter-than-`dim`
  * embedding contributes no set bits (bucket 0, never NULL — matching
  * `aggregate` over the plane sequence, whose null dots fold to 0). */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(planes.nonEmpty && planes.forall(_.size == planes.head.size),
    "planes must be a non-empty rectangular matrix")

  private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray
  private lazy val dim = planes.head.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() < dim) 0L
      else {
        // a NULL element nulls every plane's dot in the HOF this replaces
        // (null propagates through the fold, every `when(dot > 0)` falls
        // to 0) — match that: bucket 0, not a bucket from the remainder
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i)) return 0L
          i += 1
        }
        var bucket = 0L
        var j = 0
        while (j < mat.length) {
          val row = mat(j)
          var dot = 0.0
          i = 0
          while (i < dim) { dot += arr.getFloat(i).toDouble * row(i); i += 1 }
          if (dot > 0.0) bucket |= 1L << j
          j += 1
        }
        bucket
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
    copy(child = c)
}

/** Elementwise float difference via DOUBLE subtraction rounded back to
  * float — `CAST(CAST(a[i] AS DOUBLE) - CAST(b[i] AS DOUBLE) AS FLOAT)`,
  * textually the DuckDB route the s08 oracle uses. The two routes are in
  * fact provably identical for binary32 operands (the f32 difference is
  * exactly representable in binary64 — 53 ≥ 2·24+2 — so the second
  * rounding is innocuous); the double-route is chosen purely to MIRROR
  * the oracle's SQL expression shape, keeping the two engines' residual
  * text in one-to-one correspondence, not because the results can
  * differ. The two arrays must have EQUAL length —
  * any mismatch (either direction) yields null, so a mis-wired operand
  * fails loudly downstream instead of silently truncating; null
  * elements/inputs also yield null. */
case class VecSubToFloat(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = (x.getFloat(i).toDouble - y.getFloat(i).toDouble).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSubToFloat =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Elementwise float difference (see [[VecSubToFloat]]). */
  def vecSub(a: Column, b: Column): Column =
    ColumnShim.column(VecSubToFloat(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column-level cosine similarity over two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column-level hyperplane-LSH bucket (see [[HyperplaneBucket]]). */
  def hyperplaneBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    ColumnShim.column(HyperplaneBucket(ColumnShim.expression(emb), planes))
}
