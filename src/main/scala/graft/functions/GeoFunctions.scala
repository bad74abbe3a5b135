package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Typed surface for the GEOMETRY row-image values the binlog decoder
  * emits as lowercase hex (`BinlogBinaryParser`, type 255): MySQL stores
  * `4-byte LE SRID + WKB`, and this expression renders that payload as
  * WKT text — `SRID=4326;POINT(1 2)` (the EWKT convention) or plain
  * `POINT(1 2)` when SRID is 0.
  *
  * The row-image schema is `array<array<string>>` by design (one dynamic
  * shape for every column type), so "GEOMETRY as a BinaryType column"
  * would fork the event schema; the typed surface is instead this
  * function over the hex string — `geomHexToWkt(element_at(img, i))` —
  * which is also where a WKB consumer would plug in `unhex` directly.
  *
  * Supported WKB (the public OGC core): Point, LineString, Polygon,
  * MultiPoint, MultiLineString, MultiPolygon, GeometryCollection, both
  * byte orders, recursively. Malformed input → NULL (SQL convention for
  * a scalar conversion), never a task failure. Coordinates format as
  * integers when integral (WKT convention), else `Double.toString`;
  * list separators are bare commas (`LINESTRING(0 0,1 1)`), matching
  * MySQL `ST_AsText` output byte-for-byte (MySQL emits no space after
  * the comma).
  */
case class WkbHexToWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"geom_hex_to_wkt expects a hex string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hex = input.asInstanceOf[UTF8String].toString
    try {
      if (hex.length < 10 || hex.length % 2 != 0) return null
      val bytes = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < bytes.length) {
        bytes(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      val srid = (bytes(0) & 0xFFL) | ((bytes(1) & 0xFFL) << 8) |
        ((bytes(2) & 0xFFL) << 16) | ((bytes(3) & 0xFFL) << 24)
      val sb = new StringBuilder
      if (srid != 0) sb.append("SRID=").append(srid).append(';')
      val end = WkbParse.geometry(bytes, 4, sb)
      // the geometry must consume the whole payload: trailing bytes mean
      // corruption (or a concatenated second value) → NULL, not a
      // plausible-looking prefix
      if (end != bytes.length) null else UTF8String.fromString(sb.toString)
    } catch { case _: RuntimeException => null }
  }

  override protected def withNewChildInternal(c: Expression): WkbHexToWkt =
    copy(child = c)
}

private[functions] object WkbParse {

  private def u32(b: Array[Byte], p: Int, le: Boolean): Long = {
    if (p + 4 > b.length) return -1L
    if (le) (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    else (b(p + 3) & 0xFFL) | ((b(p + 2) & 0xFFL) << 8) |
      ((b(p + 1) & 0xFFL) << 16) | ((b(p) & 0xFFL) << 24)
  }

  private def dbl(b: Array[Byte], p: Int, le: Boolean): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) {
      val idx = if (le) p + i else p + 7 - i
      bits |= (b(idx) & 0xFFL) << (8 * i)
      i += 1
    }
    java.lang.Double.longBitsToDouble(bits)
  }

  private def coord(v: Double): String =
    if (v == Math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Append one point's "x y". Returns next offset or -1. */
  private def point(b: Array[Byte], p: Int, le: Boolean, sb: StringBuilder): Int = {
    if (p + 16 > b.length) return -1
    sb.append(coord(dbl(b, p, le))).append(' ').append(coord(dbl(b, p + 8, le)))
    p + 16
  }

  /** Append a parenthesized point list. Returns next offset or -1. */
  private def ring(b: Array[Byte], p0: Int, le: Boolean, sb: StringBuilder): Int = {
    val n = u32(b, p0, le)
    if (n < 0 || n > Int.MaxValue) return -1
    var p = p0 + 4
    sb.append('(')
    var i = 0L
    while (i < n) {
      if (i > 0) sb.append(',')
      p = point(b, p, le, sb)
      if (p < 0) return -1
      i += 1
    }
    sb.append(')')
    p
  }

  /** Nesting bound for GEOMETRYCOLLECTION recursion: real data nests a
    * handful of levels; a crafted payload of repeated collection headers
    * would otherwise drive the parser StackOverflowError-deep — an Error
    * the never-fail contract's RuntimeException catch cannot contain. */
  private val MaxDepth = 32

  /** Parse one geometry (byte-order flag + type + body), appending WKT.
    * Returns the offset after it, or -1 on malformation. */
  def geometry(b: Array[Byte], p0: Int, sb: StringBuilder, depth: Int = 0): Int = {
    if (depth > MaxDepth) return -1
    if (p0 + 5 > b.length) return -1
    val le = b(p0) match {
      case 1 => true
      case 0 => false
      case _ => return -1
    }
    val tpe = u32(b, p0 + 1, le)
    var p = p0 + 5
    tpe match {
      case 1 => // Point
        sb.append("POINT(")
        p = point(b, p, le, sb)
        if (p < 0) return -1
        sb.append(')'); p
      case 2 => // LineString
        sb.append("LINESTRING")
        ring(b, p, le, sb)
      case 3 => // Polygon: n rings
        val n = u32(b, p, le); if (n < 0) return -1
        p += 4
        sb.append("POLYGON(")
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          p = ring(b, p, le, sb)
          if (p < 0) return -1
          i += 1
        }
        sb.append(')'); p
      case 4 | 5 | 6 => // Multi*: n full WKB children, rendered WITHOUT
        // their type tags (MySQL ST_AsText convention:
        // MULTIPOINT(1 2,3 4), MULTIPOLYGON(((...))) )
        val n = u32(b, p, le); if (n < 0) return -1
        p += 4
        sb.append(tpe match {
          case 4 => "MULTIPOINT("
          case 5 => "MULTILINESTRING("
          case _ => "MULTIPOLYGON("
        })
        val childType = tpe - 3 // 4→Point, 5→LineString, 6→Polygon
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          if (p + 5 > b.length) return -1
          val cle = b(p) match {
            case 1 => true
            case 0 => false
            case _ => return -1
          }
          if (u32(b, p + 1, cle) != childType) return -1
          p += 5
          childType match {
            case 1 => p = point(b, p, cle, sb)
            case 2 => p = ring(b, p, cle, sb)
            case _ => // polygon body: n rings
              val nr = u32(b, p, cle); if (nr < 0) return -1
              p += 4
              sb.append('(')
              var r = 0L
              while (r < nr) {
                if (r > 0) sb.append(',')
                p = ring(b, p, cle, sb)
                if (p < 0) return -1
                r += 1
              }
              sb.append(')')
          }
          if (p < 0) return -1
          i += 1
        }
        sb.append(')'); p
      case 7 => // GeometryCollection: children keep their type tags
        val n = u32(b, p, le); if (n < 0) return -1
        p += 4
        sb.append("GEOMETRYCOLLECTION(")
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          p = geometry(b, p, sb, depth + 1)
          if (p < 0) return -1
          i += 1
        }
        sb.append(')'); p
      case _ => -1
    }
  }
}

object GeoFunctions {
  /** WKT rendering of a MySQL GEOMETRY hex string (SRID + WKB); NULL on
    * malformed input. See [[WkbHexToWkt]]. */
  def geomHexToWkt(hex: Column): Column =
    ColumnShim.column(WkbHexToWkt(ColumnShim.expression(hex)))
}
