package graft.functions

import org.apache.commons.codec.digest.DigestUtils

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the text-dedup hot loops (MinHash
  * signatures, SimHash). The built-in route — nested `transform`/`aggregate`
  * higher-order functions — evaluates one interpreted lambda call per
  * array element (HOFs are CodegenFallback in Spark) and recomputes md5
  * through per-element expression dispatch; these expressions fuse the
  * whole signature computation into one tight JVM loop per row. They are
  * themselves CodegenFallback by choice: per-row cost is hundreds of md5
  * calls, so row-level dispatch overhead is noise (unlike
  * [[CosineSimilarity]], whose per-row work is small and codegen'd).
  *
  * Cross-engine exactness (mirrored by the DuckDB oracle SQL):
  * element hash = first 15 (MinHash) / 8 (SimHash) hex chars of md5,
  * parsed as a BIGINT — identical to `conv(substr(md5(x),1,k),16,10)` and
  * DuckDB's `('0x'||substr(md5(x),1,k))::BIGINT`. MinHash permutations are
  * ((1664525j+1013904223) mod p)·h + (22695477j+12345) mod p, all mod
  * p = 2^31−1; every product stays below 2^62.
  */
object TextHash {
  val P: Long = 2147483647L

  def permA(j: Int): Long = (1664525L * j + 1013904223L) % P
  def permB(j: Int): Long = (22695477L * j + 12345L) % P

  /** 60-bit md5-prefix hash reduced mod p (MinHash element hash). */
  def shingleHash(s: Array[Byte]): Long =
    java.lang.Long.parseLong(DigestUtils.md5Hex(s).substring(0, 15), 16) % P

  /** 32-bit md5-prefix hash (SimHash token hash). */
  def tokenHash32(s: Array[Byte]): Long =
    java.lang.Long.parseLong(DigestUtils.md5Hex(s).substring(0, 8), 16)

  /** 60-bit md5-prefix hash (wide-SimHash token hash — 15 hex digits,
    * the [[shingleHash]] width WITHOUT the mod-p reduction: simhash
    * wants raw independent bits, not residues). */
  def tokenHash60(s: Array[Byte]): Long =
    java.lang.Long.parseLong(DigestUtils.md5Hex(s).substring(0, 15), 16)
}

private[functions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string>, got ${other.simpleString}")
  }
}

/** MinHash signature (`numPerms` longs) over either raw shingle strings
  * (hashed internally) or pre-hashed 60-bit shingle longs (see
  * [[ShingleHash60]] — hashing before the shuffle keeps exchange payloads
  * small); null on empty input (matching `array_min` of an empty list). */
case class MinHashSignature(child: Expression, numPerms: Int = 16)
    extends UnaryExpression with CodegenFallback {

  private lazy val fromStrings = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> or array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // returns null on an EMPTY (not just null) input, so the default
  // child-derived nullability would let NullPropagation miscompile
  // is-null checks over non-nullable children
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h =
        if (fromStrings) TextHash.shingleHash(arr.getUTF8String(i).getBytes)
        else arr.getLong(i) % TextHash.P
      var j = 0
      while (j < numPerms) {
        val v = (TextHash.permA(j) * h + TextHash.permB(j)) % TextHash.P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Distinct 60-bit md5 hashes of the n-gram word shingles of a token array
  * — [[WordShingles]] fused with the hash so shuffles carry 8-byte longs
  * instead of shingle strings. Hash = first 15 md5-hex chars as BIGINT,
  * identical to `('0x'||substr(md5(s),1,15))::BIGINT` over the space-joined
  * shingle. First-occurrence order; empty when fewer than `n` tokens. */
case class ShingleHash60(child: Expression, n: Int = 3)
    extends UnaryExpression with StringArrayInput with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]
    val sep = " ".getBytes("UTF-8")
    var i = 0
    while (i + n <= total) {
      val bos = new java.io.ByteArrayOutputStream(64)
      var k = 0
      while (k < n) {
        if (k > 0) bos.write(sep)
        bos.write(arr.getUTF8String(i + k).getBytes)
        k += 1
      }
      out.add(java.lang.Long.parseLong(
        DigestUtils.md5Hex(bos.toByteArray).substring(0, 15), 16))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { res(idx) = it.next(); idx += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHash60 =
    copy(child = c)
}

/** POSITIONED 60-bit n-gram hashes: one `struct<pos:int, gv:bigint>` per
  * window start (1-based, every occurrence — no distinct), the
  * substring-LOCATION primitive behind span measurement/clipping (d29/
  * d30), where [[ShingleHash60]]'s set form would lose the alignment.
  * Same hash math: first 15 md5-hex chars of the space-joined window as
  * BIGINT, identical to
  * `('0x'||substr(md5(array_to_string(list_slice(toks,i,i+n-1),' ')),1,15))::BIGINT`.
  * Fused single loop per row vs the transform(sequence(...)) HOF route's
  * interpreted lambda + expression-dispatch md5 per window. */
case class ShinglePos60(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("gv", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val m = math.max(total - n + 1, 0)
    val out = new Array[Any](m)
    val sep = " ".getBytes("UTF-8")
    var i = 0
    while (i < m) {
      val bos = new java.io.ByteArrayOutputStream(64)
      // null elements are SKIPPED, matching concat_ws / array_to_string
      // (the documented oracle equivalence) — not dereferenced (NPE)
      var wrote = false
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(i + k)) {
          if (wrote) bos.write(sep)
          bos.write(arr.getUTF8String(i + k).getBytes)
          wrote = true
        }
        k += 1
      }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i + 1,
        java.lang.Long.parseLong(
          DigestUtils.md5Hex(bos.toByteArray).substring(0, 15), 16))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShinglePos60 =
    copy(child = c)
}

/** 32-bit SimHash of a token array: per-bit ±1 frequency votes over the
  * tokens' 32-bit hashes; bit set iff its vote sum is positive. */
case class SimHash32(child: Expression)
    extends UnaryExpression with StringArrayInput with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = TextHash.tokenHash32(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) {
        votes(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

/** 60-bit SimHash of a token array — [[SimHash32]]'s SCALE variant:
  * the wider fingerprint exists so the pigeonhole bands can be 15 bits
  * (4 × 15 at maxHamming 3), giving a 2^15 band-value space — 128× the
  * 32-bit layout's 2^8, which at corpus scale is the difference between
  * a band bucket holding N/2^8-ish docs (quadratic candidate blowup)
  * and one holding a true near-dup cluster. Same ±1 frequency-vote
  * construction, 60-bit md5-prefix token hashes (15 hex digits — the
  * shingleHash width, un-reduced). */
case class SimHash60(child: Expression)
    extends UnaryExpression with StringArrayInput with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = TextHash.tokenHash60(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 60) {
        votes(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

/** Distinct n-gram word shingles of a token array, space-joined — the fused
  * form of `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))`
  * (each of whose element lambdas would otherwise evaluate interpreted).
  * First-occurrence order, like `array_distinct`. Empty result when the
  * input has fewer than `n` tokens.
  */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with StringArrayInput with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i + n <= total) {
      var s = arr.getUTF8String(i)
      var k = 1
      while (k < n) {
        s = org.apache.spark.unsafe.types.UTF8String.concat(
          s, org.apache.spark.unsafe.types.UTF8String.fromString(" "),
          arr.getUTF8String(i + k))
        k += 1
      }
      out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Per-document bigram repetition statistics over an `array<string>` token
  * column: `[total, distinct, top]` — the number of adjacent token pairs,
  * the number of distinct pairs, and the occurrence count of the most
  * frequent pair. These are the integer inputs of the Gopher-style
  * repetition quality gate (duplicate-n-gram fraction, top-n-gram
  * fraction): all downstream fractions derive from them in plain double
  * division, so the cross-engine contract stays integer-exact. A pair is
  * keyed by its space-joined text (`l[i] || ' ' || l[i+1]`), mirroring
  * the oracle SQL — tokens that themselves contain spaces alias the same
  * way in both engines. Fewer than 2 tokens → `[0, 0, 0]`; a null input
  * row or a null token element → null (null contaminates, matching the
  * engine's fold kernels). One tight counting loop per row instead of a
  * sequence→transform→explode→double-aggregate HOF pipeline
  * (one interpreted lambda dispatch per element).
  */
case class BigramStats(child: Expression)
    extends UnaryExpression with StringArrayInput with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array[Any](0, 0, 0))
    var i = 0
    while (i < n) { // null token → null result, before any counting
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Integer]
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var top = 0
    i = 0
    while (i + 1 < n) {
      val b = org.apache.spark.unsafe.types.UTF8String.concat(
        arr.getUTF8String(i), space, arr.getUTF8String(i + 1))
      val c = counts.getOrDefault(b, 0) + 1
      counts.put(b, c)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Any](n - 1, counts.size, top))
  }

  override protected def withNewChildInternal(c: Expression): BigramStats =
    copy(child = c)
}

object TextHashFunctions {
  /** Distinct space-joined n-gram shingles over an `array<string>` column. */
  def wordShingles(tokens: Column, n: Int = 3): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(tokens), n))

  /** MinHash signature column over an `array<string>` shingle column. */
  def minHashSig(shingles: Column, numPerms: Int = 16): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(shingles), numPerms))

  /** 32-bit SimHash column over an `array<string>` token column. */
  def simHash32(tokens: Column): Column =
    ColumnShim.column(SimHash32(ColumnShim.expression(tokens)))

  /** 60-bit SimHash column over an `array<string>` token column (the
    * wide-band scale variant — see [[SimHash60]]). */
  def simHash60(tokens: Column): Column =
    ColumnShim.column(SimHash60(ColumnShim.expression(tokens)))

  /** Distinct 60-bit hashed n-gram shingles over an `array<string>` column. */
  def shingleHash60(tokens: Column, n: Int = 3): Column =
    ColumnShim.column(ShingleHash60(ColumnShim.expression(tokens), n))

  /** Positioned (1-based, non-distinct) 60-bit n-gram hashes:
    * `array<struct<pos:int, gv:bigint>>`. */
  def shinglePos60(tokens: Column, n: Int): Column =
    ColumnShim.column(ShinglePos60(ColumnShim.expression(tokens), n))

  /** `[total, distinct, top]` bigram counts over an `array<string>` column
    * (the Gopher-style repetition-signal inputs). */
  def bigramStats(tokens: Column): Column =
    ColumnShim.column(BigramStats(ColumnShim.expression(tokens)))
}
