package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GeoFunctions.geomHexToWkt

/** WKT rendering of MySQL GEOMETRY values (4-byte SRID + WKB) — the typed
  * surface over the hex strings the binlog decoder emits. */
class GeoFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02x").mkString

  private def wkbPoint(x: Double, y: Double, le: Boolean = true): Array[Byte] = {
    val buf = ByteBuffer.allocate(21)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.put(if (le) 1.toByte else 0.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  private def srid(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def wkt(hexStr: String): Option[String] = {
    val spark2 = spark
    import spark2.implicits._
    Seq(hexStr).toDF("g").select(geomHexToWkt(col("g"))).collect()
      .headOption.flatMap(r => Option(r.getString(0)))
  }

  test("POINT with and without SRID, both byte orders") {
    assert(wkt(hex(srid(0) ++ wkbPoint(1, 2))).contains("POINT(1 2)"))
    assert(wkt(hex(srid(4326) ++ wkbPoint(-1.5, 2))).contains("SRID=4326;POINT(-1.5 2)"))
    assert(wkt(hex(srid(0) ++ wkbPoint(7, 8, le = false))).contains("POINT(7 8)"))
  }

  test("LINESTRING / POLYGON / MULTI* / GEOMETRYCOLLECTION") {
    def pts(le: Boolean, ps: (Double, Double)*): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 16 * ps.size)
        .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      buf.putInt(ps.size)
      ps.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
      buf.array()
    }
    def geomHeader(tpe: Int): Array[Byte] =
      ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
        .put(1.toByte).putInt(tpe).array()

    val line = geomHeader(2) ++ pts(le = true, (0, 0), (1, 1), (2, 0))
    assert(wkt(hex(srid(0) ++ line)).contains("LINESTRING(0 0,1 1,2 0)"))

    val ringBytes = pts(le = true, (0, 0), (4, 0), (4, 4), (0, 0))
    val poly = geomHeader(3) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(1).array() ++ ringBytes
    assert(wkt(hex(srid(0) ++ poly)).contains("POLYGON((0 0,4 0,4 4,0 0))"))

    val mp = geomHeader(4) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(2).array() ++
      wkbPoint(1, 2) ++ wkbPoint(3, 4)
    assert(wkt(hex(srid(0) ++ mp)).contains("MULTIPOINT(1 2,3 4)"))

    val coll = geomHeader(7) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(2).array() ++
      wkbPoint(5, 6) ++ line
    assert(wkt(hex(srid(0) ++ coll))
      .contains("GEOMETRYCOLLECTION(POINT(5 6),LINESTRING(0 0,1 1,2 0))"))
  }

  test("malformed input is NULL, never a task failure") {
    assert(wkt("").isEmpty)
    assert(wkt("zz").isEmpty)
    assert(wkt("0000").isEmpty)                       // too short
    assert(wkt(hex(srid(0)) + "09").isEmpty)          // bad byte-order flag
    assert(wkt(hex(srid(0) ++ wkbPoint(1, 2)).dropRight(4)).isEmpty) // truncated
    // unknown geometry type 99
    val bad = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(99).array()
    assert(wkt(hex(srid(0) ++ bad)).isEmpty)
    // trailing garbage after a complete geometry: corruption, not a prefix
    assert(wkt(hex(srid(0) ++ wkbPoint(1, 2) ++ Array[Byte](1, 2, 3))).isEmpty)
    // pathological nesting: depth-bounded NULL, never a StackOverflowError
    val collHeader = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(7).putInt(1).array()
    val deep = srid(0) ++ Array.fill(100000)(collHeader).flatten
    assert(wkt(hex(deep)).isEmpty)
  }
}
