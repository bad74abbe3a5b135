package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native ordered-fold kernels replacing the interpreted higher-order
  * functions (`aggregate`/`filter`/`transform` lambdas are CodegenFallback
  * in Spark — one interpreted lambda dispatch per ELEMENT) in the engine's
  * hot loops: the IVF centroid build (s03/s04) and the token statistics
  * behind the quality gate (t03, p01, t02). Each expression fuses the whole
  * per-row fold into one tight JVM loop, like [[HyperplaneBucket]] /
  * [[MinHashSignature]] before it. CodegenFallback by choice: per-row work
  * is O(dim × elems) or O(tokens), so row-level dispatch overhead is noise.
  *
  * Fold-order contract (mirrored by the DuckDB oracle SQL): every sum is an
  * ascending-index left fold in double (vectors) or long (token counts)
  * arithmetic — element-for-element identical to the `aggregate` HOFs these
  * replace, so oracle hashes are unchanged. Null semantics also match the
  * HOFs exactly: a missing/short/null element nulls the affected dimension
  * (null contaminates the rest of that dimension's fold), a null input row
  * yields a null result.
  */
private[functions] object FoldKernels {
  /** Resolve `field` inside `array<struct<...>>`, or None. Exact match
    * first; otherwise a UNIQUE case-insensitive match when the session
    * is case-insensitive (Spark's default field resolution) — an
    * ambiguous case-insensitive match stays unresolved rather than
    * guessing. */
  def structField(arrType: DataType, field: String): Option[(Int, DataType)] =
    arrType match {
      case ArrayType(st: StructType, _) =>
        val exact = st.fieldNames.indexOf(field)
        if (exact >= 0) Some((exact, st.fields(exact).dataType))
        else if (org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis) None
        else st.fieldNames.zipWithIndex
          .filter(_._1.equalsIgnoreCase(field)) match {
          case Array((_, i)) => Some((i, st.fields(i).dataType))
          case _ => None
        }
      case _ => None
    }
}

/** Elementwise ordered sum of a vector-valued struct field over an
  * `array<struct<...>>` column: out(d) = Σ_i vs(i).`field`(d), an
  * ascending-i left fold in double precision, exactly
  * `transform(sequence(1, dim), d -> aggregate(vs, 0.0D, (s, v) ->
  * s + CAST(try_element_at(v.field, d) AS DOUBLE)))`. Output length is
  * always `dim`; a dimension whose fold touches a null struct, null
  * vector, short vector, or null element is null (null contaminates the
  * fold: `try_element_at` out-of-bounds → null → null-absorbing `+` — the
  * kernel never errors, unlike plain `element_at` under ANSI mode). The
  * level-1 kernel of [[graft.ops.Similarity.buildCentroids]].
  */
case class OrderedVecFieldSum(child: Expression, field: String, dim: Int)
    extends UnaryExpression with CodegenFallback {

  private lazy val (fieldIdx, fieldType) =
    FoldKernels.structField(child.dataType, field).get
  private lazy val numStructFields = child.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 0
  }
  private lazy val isFloat = fieldType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // parameter validation lives here, not in a constructor require(): the
  // SQL route must surface bad arguments as AnalysisException (standard
  // DATATYPE_MISMATCH), never a raw IllegalArgumentException
  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1) TypeCheckResult.TypeCheckFailure(
      s"vec_field_sum: dim must be positive, got $dim")
    else FoldKernels.structField(child.dataType, field) match {
      case Some((_, ArrayType(FloatType | DoubleType, _))) =>
        TypeCheckResult.TypeCheckSuccess
      case Some((_, other)) => TypeCheckResult.TypeCheckFailure(
        s"vec_field_sum: field `$field` must be array<float|double>, got ${other.simpleString}")
      case None => TypeCheckResult.TypeCheckFailure(
        s"vec_field_sum expects array<struct<...$field...>>, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sum = new Array[Double](dim)
    val isNull = new Array[Boolean](dim)
    var liveDims = dim // once every dimension is nulled the result is fixed
    var i = 0
    while (i < n && liveDims > 0) {
      if (arr.isNullAt(i)) {
        java.util.Arrays.fill(isNull, true); liveDims = 0
      } else {
        val row = arr.getStruct(i, numStructFields)
        if (row.isNullAt(fieldIdx)) {
          java.util.Arrays.fill(isNull, true); liveDims = 0
        } else {
          val vec = row.getArray(fieldIdx)
          val len = vec.numElements()
          var d = 0
          while (d < dim) {
            if (!isNull(d)) {
              if (d >= len || vec.isNullAt(d)) { isNull(d) = true; liveDims -= 1 }
              else sum(d) += (if (isFloat) vec.getFloat(d).toDouble
                              else vec.getDouble(d))
            }
            d += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](dim)
    var d = 0
    while (d < dim) {
      if (!isNull(d)) out(d) = java.lang.Double.valueOf(sum(d))
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): OrderedVecFieldSum =
    copy(child = c)
}

/** Elementwise ordered mean: out(d) = CAST(Σ_i ps(i).`sumField`(d) /
  * Σ_i ps(i).`cntField` AS FLOAT), both sums ascending-i left folds —
  * exactly the level-2 `transform(sequence(1, dim), d ->
  * CAST(aggregate(ps, 0.0D, (s, p) -> s + try_element_at(p.sumField, d)) /
  * aggregate(ps, 0L, (s, p) -> s + p.cntField) AS FLOAT))` of
  * [[graft.ops.Similarity.buildCentroids]]. Null semantics as in
  * [[OrderedVecFieldSum]]; a null count anywhere nulls every dimension.
  */
case class OrderedVecFieldMean(child: Expression, sumField: String,
    cntField: String, dim: Int)
    extends UnaryExpression with CodegenFallback {

  private lazy val sumIdx =
    FoldKernels.structField(child.dataType, sumField).get._1
  private lazy val cntIdx =
    FoldKernels.structField(child.dataType, cntField).get._1
  private lazy val numStructFields = child.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1) TypeCheckResult.TypeCheckFailure(
      s"vec_field_mean: dim must be positive, got $dim")
    else (FoldKernels.structField(child.dataType, sumField),
      FoldKernels.structField(child.dataType, cntField)) match {
      case (Some((_, ArrayType(DoubleType, _))), Some((_, LongType))) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_field_mean expects array<struct<...>> with `$sumField` array<double> " +
          s"and `$cntField` bigint, got ${child.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sum = new Array[Double](dim)
    val isNull = new Array[Boolean](dim)
    var cnt = 0L
    var cntNull = false
    var liveDims = dim // all-null dims (or a null count) fix the result
    var i = 0
    while (i < n && liveDims > 0 && !cntNull) {
      if (arr.isNullAt(i)) {
        java.util.Arrays.fill(isNull, true)
        cntNull = true
      } else {
        val row = arr.getStruct(i, numStructFields)
        if (row.isNullAt(cntIdx)) cntNull = true
        else cnt += row.getLong(cntIdx)
        if (row.isNullAt(sumIdx)) {
          java.util.Arrays.fill(isNull, true); liveDims = 0
        } else {
          val vec = row.getArray(sumIdx)
          val len = vec.numElements()
          var d = 0
          while (d < dim) {
            if (!isNull(d)) {
              if (d >= len || vec.isNullAt(d)) { isNull(d) = true; liveDims -= 1 }
              else sum(d) += vec.getDouble(d)
            }
            d += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](dim)
    var d = 0
    while (d < dim) {
      if (!isNull(d) && !cntNull)
        out(d) = java.lang.Float.valueOf((sum(d) / cnt).toFloat)
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): OrderedVecFieldMean =
    copy(child = c)
}

/** Count of tokens contained in a fixed marker set — exactly
  * `size(filter(toks, x -> x IN (words)))`: null tokens are not counted
  * (IN over a null is null, which `filter` drops), null input yields null.
  * The kernel behind the language-ID hits and stopword counts (t02, t03,
  * p01). */
case class MarkerCount(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  // analysis-time validation (not a constructor require) so the SQL
  // route reports AnalysisException with a standard error class
  override def checkInputDataTypes(): TypeCheckResult =
    if (words.isEmpty) TypeCheckResult.TypeCheckFailure(
      "marker_count: the marker word set must be non-empty")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<string>, got ${other.simpleString}")
    }

  private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): MarkerCount =
    copy(child = c)
}

/** Total character count of a token array — exactly
  * `aggregate(toks, 0L, (acc, x) -> acc + length(x))`: character (not
  * byte) lengths summed as longs; a null token nulls the fold (null
  * absorbs `+`), a null input yields null. The `tok_chars` kernel of the
  * quality gate (t03, p01). */
case class TokenCharSum(child: Expression)
    extends UnaryExpression with StringArrayInput with CodegenFallback {

  override def dataType: DataType = LongType

  // a null ELEMENT nulls the fold even over a non-null input array, so the
  // default child-derived nullability would be wrong for arrays with
  // containsNull = true
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      total += arr.getUTF8String(i).numChars().toLong
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(c: Expression): TokenCharSum =
    copy(child = c)
}

/** Modular rolling hash over per-token codes — exactly
  * `aggregate(transform(toks, x -> CAST(length(x) * 131 +
  * ascii(substring(x, 1, 1)) AS BIGINT)), 0L,
  * (acc, c) -> (acc * 1000003 + c) % 2147483647)`: character length and
  * first-CODEPOINT value (Spark's `ascii`; 0 for an empty token), folded
  * in ascending token order. The fold stays < 2^51, so BIGINT arithmetic
  * is identical in DuckDB. A null token nulls the fold; null input yields
  * null. The t04 fingerprint kernel. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with StringArrayInput with CodegenFallback {

  // like TokenCharSum: a null ELEMENT nulls the fold, so nullability
  // cannot derive from the child alone
  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val t = arr.getUTF8String(i)
      val first = if (t.numChars() == 0) 0L
        else t.substring(0, 1).toString.codePointAt(0).toLong
      val code = t.numChars().toLong * 131L + first
      acc = (acc * 1000003L + code) % 2147483647L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

object FoldFunctions {
  /** Elementwise ordered sum of a vector struct field (see
    * [[OrderedVecFieldSum]]). */
  def vecFieldSum(arr: Column, field: String, dim: Int): Column =
    ColumnShim.column(OrderedVecFieldSum(ColumnShim.expression(arr), field, dim))

  /** Elementwise ordered mean from partial (sum, count) structs (see
    * [[OrderedVecFieldMean]]). */
  def vecFieldMean(arr: Column, sumField: String, cntField: String,
      dim: Int): Column =
    ColumnShim.column(OrderedVecFieldMean(
      ColumnShim.expression(arr), sumField, cntField, dim))

  /** Count of tokens in a fixed marker word set (see [[MarkerCount]]). */
  def markerCount(toks: Column, words: Seq[String]): Column =
    ColumnShim.column(MarkerCount(ColumnShim.expression(toks), words))

  /** Total character count of a token array (see [[TokenCharSum]]). */
  def tokenCharSum(toks: Column): Column =
    ColumnShim.column(TokenCharSum(ColumnShim.expression(toks)))

  /** Modular rolling hash of a token array (see [[RollingFingerprint]]). */
  def rollingFingerprint(toks: Column): Column =
    ColumnShim.column(RollingFingerprint(ColumnShim.expression(toks)))
}
