package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** Minimal ST_* spatial core over OGC well-known binary (WKB).
  *
  * The reference preloads DuckDB's spatial extension and registers GeoArrow
  * extension types on the wire (`/root/reference/src/common/
  * gizmosql_library.cpp:820-827`, `tests/test_geoarrow.py`); the engine
  * already round-trips GeoArrow WKB column metadata
  * ([[graft.types.TypeMapping]]). This module adds EVALUATION for the core
  * of that surface, pure-Scala (no geometry jars exist in the environment):
  * 2-D POINT / LINESTRING / POLYGON (with holes), little- or big-endian
  * WKB, EWKB SRID headers tolerated and skipped.
  *
  * Functions (DuckDB spatial names, registered via
  * [[GraftExtensions]] as codegen `StaticInvoke` calls — one static method
  * per row, same WholeStageCodegen posture as [[StrDist]]):
  * st_point, st_x, st_y, st_xmin/st_xmax/st_ymin/st_ymax, st_makeenvelope,
  * st_geomfromtext, st_astext, st_geometrytype, st_npoints, st_area,
  * st_length, st_perimeter, st_distance, st_dwithin, st_intersects,
  * st_contains, st_within.
  *
  * Declared scope, stated honestly: planar (Euclidean) geometry only (plus
  * the spherical st_*_sphere family) — no curves. EMPTY geometries (r14)
  * parse/print/round-trip (`TYPE EMPTY`, zero-count WKB, NaN point);
  * predicates treat them as the empty set, measures are 0, overlay applies
  * identity/annihilator laws, coordinate accessors fail loudly.
  * Multi-geometries
  * (MULTIPOINT / MULTILINESTRING / MULTIPOLYGON / nested
  * GEOMETRYCOLLECTION) parse, print, and evaluate across the whole surface
  * (r12): measures sum over members, predicates distribute per member
  * (containment per-part — exact for OGC-valid inputs whose members have
  * disjoint interiors), centroid weighs highest-dimension members only
  * (GEOS semantics). Overlay (st_intersection / st_difference / st_union)
  * is TOTAL on simple hole-free polygon pairs (r13): exact interval
  * arithmetic for rectangle pairs, Sutherland–Hodgman for a convex side,
  * ear-clipping triangulation of a concave clip — results are exact in
  * area/extent but may be piece decompositions (edge-sharing MULTIPOLYGON
  * members) rather than minimal outlines; polygons with holes are in the
  * overlay scope since r14 (hole-free piece decomposition per side).
  * st_contains follows OGC
  * semantics for polygon⊃point (boundary points are NOT contained);
  * polygon⊃polygon/linestring is decided by vertices-inside + no
  * edge-crossings, exact for simple (non-self-intersecting) inputs, which
  * WKB polygons are required to be. Geometry predicates between two
  * non-area geometries use exact segment tests. Scale posture: every
  * function is a per-row O(vertices²) worst-case kernel with no state — it
  * rides whatever partitioning the surrounding plan has, like any scalar.
  */
object Wkb {

  // ---- decoded form ---------------------------------------------------------

  /** kind: 1=point, 2=linestring, 3=polygon, 4=multipoint,
    * 5=multilinestring, 6=multipolygon, 7=geometrycollection. rings: flat
    * (x,y) pairs; for polygons ring 0 is the shell, the rest are holes.
    * Multi-geometries (kind >= 4) carry their members in `parts` (rings
    * empty); members of 4/5/6 are homogeneous, 7 is mixed and may nest.
    *
    * CURVE kinds (r14): 8=circularstring (rings(0) = 2n+1 control points,
    * consecutive point triples are arcs), 9=compoundcurve (parts = kind-2
    * line pieces and kind-8 arcs), 10=curvepolygon (parts = rings, each a
    * kind-2/8/9 closed curve), 11=multicurve, 12=multisurface. Curve kinds
    * live ONLY between st_geomfromtext/st_astext/st_curvetoline — the
    * computational kernel ([[parse]]) rejects them loudly so no predicate
    * or measure silently approximates an arc; st_curvetoline is the
    * explicit bridge to the linear kernel.
    */
  final case class Geom(kind: Int, rings: Array[Array[Double]],
      parts: Array[Geom] = Array.empty) {
    def vertices: Iterator[(Double, Double)] =
      if (kind >= 4 && kind != 8) parts.iterator.flatMap(_.vertices)
      else rings.iterator.flatMap(r =>
        (0 until r.length / 2).iterator.map(i => (r(2 * i), r(2 * i + 1))))
  }

  /** Flatten to simple (kind 1-3) members; identity for simple geometries. */
  private def simples(g: Geom): Seq[Geom] =
    if (g.kind <= 3) Seq(g) else g.parts.toSeq.flatMap(simples)

  /** EMPTY (r14: in scope): a geometry with no vertices — `TYPE EMPTY` in
    * WKT, zero-count (or NaN-point) WKB. Predicates treat empties as the
    * empty point set; accessors that need coordinates fail loudly.
    */
  private def isEmptyG(g: Geom): Boolean =
    if (g.kind >= 4 && g.kind != 8) g.parts.forall(isEmptyG) else g.rings.isEmpty

  def isEmpty(wkb: Array[Byte]): Boolean = isEmptyG(parseCurved(wkb))

  private def hasCurve(g: Geom): Boolean =
    g.kind >= 8 || g.parts.exists(hasCurve)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"st_*: $msg")

  def parse(wkb: Array[Byte]): Geom = {
    val g = parseCurved(wkb)
    // the computational kernel is LINEAR-only: reject curve kinds loudly
    // instead of silently approximating an arc (st_curvetoline is the
    // explicit, parameterized bridge)
    if (hasCurve(g))
      fail("curved geometry (CIRCULARSTRING/COMPOUNDCURVE/CURVEPOLYGON/" +
        "MULTICURVE/MULTISURFACE) — apply st_curvetoline first")
    g
  }

  /** Like [[parse]] but admits curve kinds (st_astext / st_geometrytype /
    * st_isempty / st_curvetoline only).
    */
  def parseCurved(wkb: Array[Byte]): Geom = {
    // Per-thread decoded-geometry memo: a blocked spatial join verifies the
    // SAME few polygons against many co-celled points, re-parsing the
    // polygon WKB per candidate row (each row hands the expression a fresh
    // byte array with identical content). A tiny content-keyed LRU turns
    // that into one parse per distinct geometry per task thread. Points
    // (21 bytes) skip the memo — hashing them costs as much as parsing.
    if (wkb.length <= 21) return readGeom(new Cursor(wkb))
    val cache = parseCache.get()
    val key = new BytesKey(wkb)
    val hit = cache.get(key)
    if (hit != null) return hit
    val g = readGeom(new Cursor(wkb))
    cache.put(key, g)
    g
  }

  private final class BytesKey(val b: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(b)
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey => java.util.Arrays.equals(b, k.b)
      case _ => false
    }
  }

  private val parseCache: ThreadLocal[java.util.LinkedHashMap[BytesKey, Geom]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[BytesKey, Geom](128, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[BytesKey, Geom]): Boolean =
          size() > 64
      })

  private final class Cursor(val b: Array[Byte]) {
    var pos = 0
    var little = true
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u32(): Long = {
      if (pos + 4 > b.length) fail("truncated WKB")
      val v =
        if (little)
          (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) | ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)
        else
          (b(pos + 3) & 0xffL) | ((b(pos + 2) & 0xffL) << 8) | ((b(pos + 1) & 0xffL) << 16) | ((b(pos) & 0xffL) << 24)
      pos += 4
      v
    }
    def f64(): Double = {
      if (pos + 8 > b.length) fail("truncated WKB")
      var bits = 0L
      var i = 0
      while (i < 8) {
        val idx = if (little) pos + i else pos + 7 - i
        bits |= (b(idx) & 0xffL) << (8 * i)
        i += 1
      }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  private def readGeom(in: Cursor): Geom = {
    in.little = in.u8() match {
      case 0 => false
      case 1 => true
      case o => fail(s"bad WKB byte-order flag $o")
    }
    var t = in.u32()
    if ((t & 0x20000000L) != 0) { t &= ~0x20000000L; in.u32() } // EWKB SRID: skip
    // extra per-vertex doubles beyond x,y: EWKB flags Z/M in the high bits,
    // ISO WKB adds 1000 (Z), 2000 (M), 3000 (ZM) to the type code
    var extra = 0
    if ((t & 0x80000000L) != 0) { extra += 1; t &= ~0x80000000L } // EWKB Z
    if ((t & 0x40000000L) != 0) { extra += 1; t &= ~0x40000000L } // EWKB M
    extra += ((t / 1000).toInt match {
      case 0 => 0
      case 1 | 2 => 1
      case 3 => 2
      case o => fail(s"unsupported WKB dimension code ${o}000")
    })
    val kind = (t % 1000).toInt
    val dims = 2 + extra
    def coords(n: Int): Array[Double] = {
      val out = new Array[Double](2 * n)
      var i = 0
      while (i < n) {
        out(2 * i) = in.f64(); out(2 * i + 1) = in.f64()
        var d = 2
        while (d < dims) { in.f64(); d += 1 } // drop Z/M
        i += 1
      }
      out
    }
    kind match {
      case 1 =>
        val c = coords(1)
        // POINT EMPTY is conventionally WKB-encoded as (NaN, NaN)
        if (c(0).isNaN && c(1).isNaN) Geom(1, Array.empty) else Geom(1, Array(c))
      case 2 =>
        val n = in.u32().toInt
        if (n == 0) Geom(2, Array.empty) else Geom(2, Array(coords(n)))
      case 3 =>
        val nRings = in.u32().toInt
        Geom(3, Array.tabulate(nRings)(_ => coords(in.u32().toInt)))
      case 8 =>
        val n = in.u32().toInt
        if (n == 0) Geom(8, Array.empty) else Geom(8, Array(coords(n)))
      case 4 | 5 | 6 | 7 | 9 | 10 | 11 | 12 =>
        // each member is a complete WKB geometry with its own byte-order
        // flag; readGeom resets the cursor's endianness per member
        val n = in.u32().toInt
        val parts = Array.tabulate(n) { _ =>
          val p = readGeom(in)
          val legal = kind match {
            case 4 | 5 | 6 => p.kind == kind - 3
            case 9 => p.kind == 2 || p.kind == 8 // compound: lines + arcs
            case 10 => p.kind == 2 || p.kind == 8 || p.kind == 9 // rings
            case 11 => p.kind == 2 || p.kind == 8 || p.kind == 9
            case 12 => p.kind == 3 || p.kind == 10
            case _ => true
          }
          if (!legal)
            fail(s"WKB multi-geometry type $kind contains a member of type ${p.kind}")
          p
        }
        Geom(kind, Array.empty, parts)
      case o => fail(s"unsupported WKB geometry type $o")
    }
  }

  private def sizeOf(g: Geom): Int = {
    val n = g.rings.iterator.map(_.length / 2).sum
    g.kind match {
      case 1 => 5 + 16
      case 2 | 8 => 9 + 16 * n
      case 3 => 9 + 4 * g.rings.length + 16 * n
      case _ => 9 + g.parts.iterator.map(sizeOf).sum
    }
  }

  private def writeInto(g: Geom, buf: java.nio.ByteBuffer): Unit = {
    buf.put(1.toByte).putInt(g.kind)
    g.kind match {
      case 1 =>
        if (g.rings.isEmpty) buf.putDouble(Double.NaN).putDouble(Double.NaN)
        else buf.putDouble(g.rings(0)(0)).putDouble(g.rings(0)(1))
        ()
      case 2 | 8 =>
        if (g.rings.isEmpty) buf.putInt(0)
        else {
          buf.putInt(g.rings(0).length / 2)
          g.rings(0).foreach(buf.putDouble)
        }
      case 3 =>
        buf.putInt(g.rings.length)
        g.rings.foreach { r => buf.putInt(r.length / 2); r.foreach(buf.putDouble) }
      case _ =>
        buf.putInt(g.parts.length)
        g.parts.foreach(writeInto(_, buf))
    }
  }

  private def writeGeom(g: Geom): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(sizeOf(g)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    writeInto(g, buf)
    buf.array()
  }

  // ---- constructors ---------------------------------------------------------

  def point(x: Double, y: Double): Array[Byte] =
    writeGeom(Geom(1, Array(Array(x, y))))

  /** LINESTRING from flat (x, y) pairs (backing st_makeline_agg). */
  def lineOf(coords: Array[Double]): Array[Byte] =
    writeGeom(Geom(2, Array(coords)))

  def makeEnvelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    writeGeom(Geom(3, Array(Array(
      xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin))))

  def fromText(wkt: UTF8String): Array[Byte] = writeGeom(parseWkt(wkt.toString))

  /** Recursive-descent WKT parser: POINT/LINESTRING/POLYGON plus the multi
    * forms and (nested) GEOMETRYCOLLECTION. MULTIPOINT accepts both the
    * wrapped `((1 2), (3 4))` and the bare `(1 2, 3 4)` spelling.
    * `TYPE EMPTY` parses to the empty point set of that type (r14).
    */
  private def parseWkt(s: String): Geom = {
    var pos = 0
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def peek(): Char = { skipWs(); if (pos >= s.length) ' ' else s.charAt(pos) }
    def expect(c: Char): Unit = {
      if (peek() != c) fail(s"WKT: expected '$c' at offset $pos in '$s'")
      pos += 1
    }
    def word(): String = {
      skipWs(); val st = pos
      while (pos < s.length && s.charAt(pos).isLetter) pos += 1
      if (st == pos) fail(s"WKT: expected a geometry keyword at offset $pos in '$s'")
      s.substring(st, pos).toUpperCase
    }
    def number(): Double = {
      skipWs(); val st = pos
      while (pos < s.length && !s.charAt(pos).isWhitespace &&
        s.charAt(pos) != ',' && s.charAt(pos) != ')' && s.charAt(pos) != '(') pos += 1
      if (st == pos) fail(s"WKT: expected a number at offset $pos in '$s'")
      try s.substring(st, pos).toDouble
      catch { case _: NumberFormatException =>
        fail(s"WKT: bad number '${s.substring(st, pos)}' in '$s'") }
    }
    def commaList[T](item: () => T): Seq[T] = {
      expect('(')
      val out = scala.collection.mutable.ArrayBuffer[T]()
      var done = false
      while (!done) {
        out += item()
        if (peek() == ',') pos += 1 else { expect(')'); done = true }
      }
      out.toSeq
    }
    def coordSeq(): Array[Double] =
      commaList(() => { val x = number(); val y = number(); (x, y) })
        .flatMap { case (x, y) => Seq(x, y) }.toArray
    def ringList(): Array[Array[Double]] = commaList(() => coordSeq()).toArray
    // `TYPE EMPTY` (r14): the empty point set of that type
    def tryEmpty(): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, "EMPTY", 0, 5)) { pos += 5; true } else false
    }
    def geom(): Geom = word() match {
      case "POINT" =>
        if (tryEmpty()) Geom(1, Array.empty)
        else {
          val c = coordSeq()
          if (c.length != 2) fail(s"POINT needs exactly one x y pair: '$s'")
          Geom(1, Array(c))
        }
      case "LINESTRING" =>
        if (tryEmpty()) Geom(2, Array.empty) else Geom(2, Array(coordSeq()))
      case "POLYGON" =>
        if (tryEmpty()) Geom(3, Array.empty) else Geom(3, ringList())
      case "MULTIPOINT" =>
        if (tryEmpty()) Geom(4, Array.empty)
        else {
          val pts = commaList { () =>
            val wrapped = peek() == '('
            if (wrapped) pos += 1
            val x = number(); val y = number()
            if (wrapped) expect(')')
            Geom(1, Array(Array(x, y)))
          }
          Geom(4, Array.empty, pts.toArray)
        }
      case "MULTILINESTRING" =>
        if (tryEmpty()) Geom(5, Array.empty)
        else Geom(5, Array.empty, ringList().map(r => Geom(2, Array(r))))
      case "MULTIPOLYGON" =>
        if (tryEmpty()) Geom(6, Array.empty)
        else Geom(6, Array.empty, commaList(() => Geom(3, ringList())).toArray)
      case "GEOMETRYCOLLECTION" =>
        if (tryEmpty()) Geom(7, Array.empty)
        else Geom(7, Array.empty, commaList(() => geom()).toArray)
      case "CIRCULARSTRING" =>
        if (tryEmpty()) Geom(8, Array.empty)
        else {
          val c = coordSeq()
          val np = c.length / 2
          if (np < 3 || np % 2 == 0)
            fail(s"CIRCULARSTRING needs an odd number of points >= 3, got $np")
          Geom(8, Array(c))
        }
      case "COMPOUNDCURVE" =>
        // members: CIRCULARSTRING (...) arcs or bare (x y, ...) line pieces
        def piece(): Geom = {
          if (peek() == '(') Geom(2, Array(coordSeq()))
          else geom() match {
            case p if p.kind == 8 || p.kind == 2 => p
            case p => fail(s"COMPOUNDCURVE member must be an arc or line, got kind ${p.kind}")
          }
        }
        if (tryEmpty()) Geom(9, Array.empty)
        else Geom(9, Array.empty, commaList(() => piece()).toArray)
      case "CURVEPOLYGON" =>
        def ring(): Geom = {
          if (peek() == '(') Geom(2, Array(coordSeq()))
          else geom() match {
            case p if p.kind == 2 || p.kind == 8 || p.kind == 9 => p
            case p => fail(s"CURVEPOLYGON ring must be a curve, got kind ${p.kind}")
          }
        }
        if (tryEmpty()) Geom(10, Array.empty)
        else Geom(10, Array.empty, commaList(() => ring()).toArray)
      case "MULTICURVE" =>
        def member(): Geom = {
          if (peek() == '(') Geom(2, Array(coordSeq()))
          else geom() match {
            case p if p.kind == 2 || p.kind == 8 || p.kind == 9 => p
            case p => fail(s"MULTICURVE member must be a curve, got kind ${p.kind}")
          }
        }
        if (tryEmpty()) Geom(11, Array.empty)
        else Geom(11, Array.empty, commaList(() => member()).toArray)
      case "MULTISURFACE" =>
        def member(): Geom = {
          if (peek() == '(') Geom(3, ringList())
          else geom() match {
            case p if p.kind == 3 || p.kind == 10 => p
            case p => fail(s"MULTISURFACE member must be a surface, got kind ${p.kind}")
          }
        }
        if (tryEmpty()) Geom(12, Array.empty)
        else Geom(12, Array.empty, commaList(() => member()).toArray)
      case o => fail(s"unsupported WKT geometry '$o'")
    }
    val g = geom()
    skipWs()
    if (pos != s.length) fail(s"WKT: trailing characters after offset $pos in '$s'")
    g
  }

  // ---- accessors ------------------------------------------------------------

  def x(wkb: Array[Byte]): Double = {
    val g = parse(wkb)
    if (g.kind != 1) fail("st_x expects a POINT")
    if (g.rings.isEmpty) fail("st_x: POINT EMPTY has no coordinates")
    g.rings(0)(0)
  }

  def y(wkb: Array[Byte]): Double = {
    val g = parse(wkb)
    if (g.kind != 1) fail("st_y expects a POINT")
    if (g.rings.isEmpty) fail("st_y: POINT EMPTY has no coordinates")
    g.rings(0)(1)
  }

  private def extentOf(wkb: Array[Byte], fn: String): Geom = {
    val g = parse(wkb)
    if (isEmptyG(g)) fail(s"$fn: EMPTY geometry has no extent")
    g
  }

  def xmin(wkb: Array[Byte]): Double = extentOf(wkb, "st_xmin").vertices.map(_._1).min
  def xmax(wkb: Array[Byte]): Double = extentOf(wkb, "st_xmax").vertices.map(_._1).max
  def ymin(wkb: Array[Byte]): Double = extentOf(wkb, "st_ymin").vertices.map(_._2).min
  def ymax(wkb: Array[Byte]): Double = extentOf(wkb, "st_ymax").vertices.map(_._2).max

  def npoints(wkb: Array[Byte]): Int = parseCurved(wkb).vertices.size

  def geometryType(wkb: Array[Byte]): UTF8String =
    UTF8String.fromString(kindName(parseCurved(wkb).kind))

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  def asText(wkb: Array[Byte]): UTF8String =
    UTF8String.fromString(wktOf(parseCurved(wkb)))

  private def wktOf(g: Geom): String = {
    def ringText(r: Array[Double]): String =
      (0 until r.length / 2).map(i => s"${fmt(r(2 * i))} ${fmt(r(2 * i + 1))}").mkString(", ")
    def polyBody(p: Geom): String =
      s"(${p.rings.map(r => s"(${ringText(r)})").mkString(", ")})"
    if (isEmptyG(g) && (g.kind <= 3 || g.kind == 8 || g.parts.isEmpty))
      return kindName(g.kind) + " EMPTY"
    g.kind match {
      case 1 => s"POINT (${ringText(g.rings(0))})"
      case 2 => s"LINESTRING (${ringText(g.rings(0))})"
      case 3 => s"POLYGON ${polyBody(g)}"
      // an EMPTY member mixed with non-empty ones passes the isEmptyG gate
      // above; print it as EMPTY (PostGIS style) instead of crashing on
      // rings(0)
      case 4 => s"MULTIPOINT (${g.parts.map(p =>
        if (p.rings.isEmpty) "EMPTY" else s"(${ringText(p.rings(0))})").mkString(", ")})"
      case 5 => s"MULTILINESTRING (${g.parts.map(p =>
        if (p.rings.isEmpty) "EMPTY" else s"(${ringText(p.rings(0))})").mkString(", ")})"
      case 6 => s"MULTIPOLYGON (${g.parts.map(p =>
        if (p.rings.isEmpty) "EMPTY" else polyBody(p)).mkString(", ")})"
      case 8 => s"CIRCULARSTRING (${ringText(g.rings(0))})"
      case 9 => s"COMPOUNDCURVE (${g.parts.map(p =>
        if (p.kind == 2 && p.rings.nonEmpty) s"(${ringText(p.rings(0))})" else wktOf(p)).mkString(", ")})"
      case 10 => s"CURVEPOLYGON (${g.parts.map(p =>
        if (p.kind == 2 && p.rings.nonEmpty) s"(${ringText(p.rings(0))})" else wktOf(p)).mkString(", ")})"
      case 11 => s"MULTICURVE (${g.parts.map(p =>
        if (p.kind == 2 && p.rings.nonEmpty) s"(${ringText(p.rings(0))})" else wktOf(p)).mkString(", ")})"
      case 12 => s"MULTISURFACE (${g.parts.map(p =>
        if (p.kind == 3 && p.rings.nonEmpty) polyBody(p) else wktOf(p)).mkString(", ")})"
      case _ => s"GEOMETRYCOLLECTION (${g.parts.map(wktOf).mkString(", ")})"
    }
  }

  private def kindName(kind: Int): String = kind match {
    case 1 => "POINT"; case 2 => "LINESTRING"; case 3 => "POLYGON"
    case 4 => "MULTIPOINT"; case 5 => "MULTILINESTRING"; case 6 => "MULTIPOLYGON"
    case 8 => "CIRCULARSTRING"; case 9 => "COMPOUNDCURVE"
    case 10 => "CURVEPOLYGON"; case 11 => "MULTICURVE"; case 12 => "MULTISURFACE"
    case _ => "GEOMETRYCOLLECTION"
  }

  // ---- measures -------------------------------------------------------------

  /** Shoelace area of the shell minus the holes; 0 for points/linestrings
    * (DuckDB spatial semantics).
    */
  def area(wkb: Array[Byte]): Double = areaG(parse(wkb))

  private def areaG(g: Geom): Double = {
    if (g.kind >= 4) return g.parts.iterator.map(areaG).sum
    if (g.kind != 3) return 0.0
    var total = 0.0
    var ri = 0
    while (ri < g.rings.length) {
      val a = math.abs(shoelace(g.rings(ri)))
      total += (if (ri == 0) a else -a)
      ri += 1
    }
    total
  }

  private def shoelace(r: Array[Double]): Double = {
    val n = r.length / 2
    if (n < 3) return 0.0
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
      i += 1
    }
    s / 2.0
  }

  /** Linestring length; 0 for points and polygons (DuckDB: perimeter is a
    * separate function).
    */
  def length(wkb: Array[Byte]): Double = lengthG(parse(wkb))

  private def lengthG(g: Geom): Double = g.kind match {
    case 2 => if (g.rings.isEmpty) 0.0 else ringLength(g.rings(0), closed = false)
    case k if k >= 4 => g.parts.iterator.map(lengthG).sum
    case _ => 0.0
  }

  def perimeter(wkb: Array[Byte]): Double = perimeterG(parse(wkb))

  private def perimeterG(g: Geom): Double = g.kind match {
    case 3 => g.rings.map(ringLength(_, closed = true)).sum
    case k if k >= 4 => g.parts.iterator.map(perimeterG).sum
    case _ => 0.0
  }

  private def ringLength(r: Array[Double], closed: Boolean): Double = {
    val n = r.length / 2
    var s = 0.0
    var i = 0
    val last = if (closed) n else n - 1
    while (i < last) {
      val j = (i + 1) % n
      s += math.hypot(r(2 * j) - r(2 * i), r(2 * j + 1) - r(2 * i + 1))
      i += 1
    }
    s
  }

  // ---- predicates & distance -------------------------------------------------

  /** Even-odd ray cast over every ring (holes flip parity back out). */
  private def inside(g: Geom, px: Double, py: Double): Boolean = {
    if (g.kind >= 4) return g.parts.exists(inside(_, px, py))
    var in = false
    var ri = 0
    while (ri < g.rings.length) {
      val r = g.rings(ri)
      val n = r.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = r(2 * i); val yi = r(2 * i + 1)
        val xj = r(2 * j); val yj = r(2 * j + 1)
        if ((yi > py) != (yj > py) &&
            px < (xj - xi) * (py - yi) / (yj - yi) + xi) in = !in
        j = i
        i += 1
      }
      ri += 1
    }
    in
  }

  private def onBoundary(g: Geom, px: Double, py: Double): Boolean =
    segments(g).exists { case (x1, y1, x2, y2) => pointSegDist(px, py, x1, y1, x2, y2) == 0.0 }

  /** All segments of a geometry (rings closed for polygons; none for points). */
  private def segments(g: Geom): Seq[(Double, Double, Double, Double)] = g.kind match {
    case 1 => Nil
    case k if k >= 4 => g.parts.toSeq.flatMap(segments)
    case 2 =>
      if (g.rings.isEmpty) return Nil // LINESTRING EMPTY member of a multi
      val r = g.rings(0); val n = r.length / 2
      (0 until n - 1).map(i => (r(2 * i), r(2 * i + 1), r(2 * i + 2), r(2 * i + 3)))
    case _ =>
      g.rings.toSeq.flatMap { r =>
        val n = r.length / 2
        (0 until n).map { i =>
          val j = (i + 1) % n
          (r(2 * i), r(2 * i + 1), r(2 * j), r(2 * j + 1))
        }
      }
  }

  private def pointSegDist(px: Double, py: Double,
      x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
    math.hypot(px - (x1 + t * dx), py - (y1 + t * dy))
  }

  private def segsCross(a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): Boolean = {
    def orient(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val (p1x, p1y, p2x, p2y) = a
    val (q1x, q1y, q2x, q2y) = b
    val d1 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    val d2 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    val d3 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    val d4 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    // collinear touch counts as intersecting
    def onSeg(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =
      math.min(ax, bx) <= cx && cx <= math.max(ax, bx) &&
        math.min(ay, by) <= cy && cy <= math.max(ay, by)
    (d1 == 0 && onSeg(q1x, q1y, q2x, q2y, p1x, p1y)) ||
      (d2 == 0 && onSeg(q1x, q1y, q2x, q2y, p2x, p2y)) ||
      (d3 == 0 && onSeg(p1x, p1y, p2x, p2y, q1x, q1y)) ||
      (d4 == 0 && onSeg(p1x, p1y, p2x, p2y, q2x, q2y))
  }

  def intersects(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    intersectsG(a, b)
  }

  private def intersectsG(a: Geom, b: Geom): Boolean =
    if (isEmptyG(a) || isEmptyG(b)) false
    else if (a.kind >= 4 || b.kind >= 4)
      simples(a).exists(pa => simples(b).exists(pb => intersectsG(pa, pb)))
    else {
      if (a.kind == 3 && b.vertices.exists { case (px, py) =>
        inside(a, px, py) || onBoundary(a, px, py) }) return true
      if (b.kind == 3 && a.vertices.exists { case (px, py) =>
        inside(b, px, py) || onBoundary(b, px, py) }) return true
      val sa = segments(a); val sb = segments(b)
      if (sa.exists(s1 => sb.exists(s2 => segsCross(s1, s2)))) return true
      // degenerate sides (points): vertex-to-vertex / vertex-to-segment contact
      minVertexDist(a, b) == 0.0
    }

  private def minVertexDist(a: Geom, b: Geom): Double = {
    var m = Double.PositiveInfinity
    val sa = segments(a); val sb = segments(b)
    a.vertices.foreach { case (px, py) =>
      if (sb.isEmpty) b.vertices.foreach { case (qx, qy) =>
        m = math.min(m, math.hypot(px - qx, py - qy)) }
      else sb.foreach { case (x1, y1, x2, y2) =>
        m = math.min(m, pointSegDist(px, py, x1, y1, x2, y2)) }
    }
    b.vertices.foreach { case (px, py) =>
      if (sa.nonEmpty) sa.foreach { case (x1, y1, x2, y2) =>
        m = math.min(m, pointSegDist(px, py, x1, y1, x2, y2)) }
    }
    m
  }

  /** Planar minimum distance; 0 when the geometries intersect (including a
    * point interior to a polygon).
    */
  def distance(wa: Array[Byte], wb: Array[Byte]): Double = {
    val a = parse(wa); val b = parse(wb)
    if (intersectsG(a, b)) 0.0 else minVertexDist(a, b)
  }

  def dwithin(wa: Array[Byte], wb: Array[Byte], d: Double): Boolean =
    distance(wa, wb) <= d

  /** OGC Contains. polygon⊃point: strict interior (boundary → false).
    * point⊃point: equality. polygon⊃linestring/polygon: every vertex
    * inside-or-on, no edge crossing, at least one interior point — exact
    * for simple inputs.
    */
  def contains(wa: Array[Byte], wb: Array[Byte]): Boolean =
    containsG(parse(wa), parse(wb))

  /** Multi-geometry containment is decided PER PART: every simple member of
    * b must be contained in some simple member of a. Declared
    * approximation: two adjacent members of a multipolygon are not unioned,
    * so a candidate spanning their shared boundary tests false — exact for
    * disjoint members, which OGC-valid multipolygons are (interiors may not
    * overlap).
    */
  private def containsG(a: Geom, b: Geom): Boolean = {
    if (isEmptyG(a) || isEmptyG(b)) return false
    if (a.kind >= 4 || b.kind >= 4)
      return simples(b).forall(pb => simples(a).exists(pa => containsG(pa, pb)))
    (a.kind, b.kind) match {
      case (1, 1) =>
        a.rings(0)(0) == b.rings(0)(0) && a.rings(0)(1) == b.rings(0)(1)
      case (3, 1) =>
        val px = b.rings(0)(0); val py = b.rings(0)(1)
        inside(a, px, py) && !onBoundary(a, px, py)
      case (3, _) =>
        val verts = b.vertices.toSeq
        val allInOrOn = verts.forall { case (px, py) =>
          inside(a, px, py) || onBoundary(a, px, py) }
        def strictIn(px: Double, py: Double): Boolean =
          inside(a, px, py) && !onBoundary(a, px, py)
        // "some b interior point in a's interior": vertices alone miss a
        // thin b whose EVERY vertex sits on a's boundary (r14 property
        // finding) — probe a guaranteed-interior point for polygons and
        // segment midpoints for lines (a chord through a's interior
        // contains even when both its endpoints are boundary points)
        lazy val anyInterior = verts.exists { case (px, py) => strictIn(px, py) } ||
          (b.kind match {
            case 3 =>
              val p = parse(pointOnSurface(writeGeom(b)))
              strictIn(p.rings(0)(0), p.rings(0)(1))
            case 2 =>
              segments(b).exists { case (x1, y1, x2, y2) =>
                strictIn((x1 + x2) / 2, (y1 + y2) / 2) }
            case _ => false
          })
        lazy val noCross = {
          val sa = segments(a); val sb = segments(b)
          // shared-boundary touches are allowed by Contains; a PROPER
          // crossing (strict sign change on both sides) is not
          !sa.exists(s1 => sb.exists(s2 => properCross(s1, s2)))
        }
        allInOrOn && anyInterior && noCross && noHoleStrictlyInside(a, b)
      case _ => false
    }
  }

  /** A hole of `a` lying strictly inside polygon `b` removes part of b's
    * interior from a even when every b vertex is in a and no edges properly
    * cross (r11 ADVICE): reject when any interior-ring vertex of a is
    * strictly inside b. A hole only PARTIALLY overlapping b's interior has
    * either a vertex strictly inside b (caught here) or a proper
    * ring-crossing (caught by noCross); the residual approximation is a
    * hole touching b's boundary exclusively at shared vertices while its
    * interior dips into b — a non-simple contact configuration.
    */
  private def noHoleStrictlyInside(a: Geom, b: Geom): Boolean =
    b.kind != 3 || a.rings.iterator.drop(1).forall { ring =>
      !ring.grouped(2).exists(p => inside(b, p(0), p(1)) && !onBoundary(b, p(0), p(1)))
    }

  private def properCross(a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): Boolean = {
    def orient(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val (p1x, p1y, p2x, p2y) = a
    val (q1x, q1y, q2x, q2y) = b
    val d1 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    val d2 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    val d3 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    val d4 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  def within(wa: Array[Byte], wb: Array[Byte]): Boolean = contains(wb, wa)

  def disjoint(wa: Array[Byte], wb: Array[Byte]): Boolean = !intersects(wa, wb)

  /** OGC Covers: like contains but boundary-INCLUSIVE (a point on a's
    * boundary IS covered). polygon covers point/linestring/polygon: every
    * vertex inside-or-on and no proper edge crossing; line covers
    * point/line: exact on-segment containment (b's segments split at a's
    * vertices, each sub-segment must lie within a single a segment —
    * MULTILINESTRING members flatten into one segment soup, so a line
    * spanning two touching members IS covered, r14); point covers point:
    * equality. Other multi-geometries recurse per-member: a part of b must
    * be covered by a single part of a (exact for disjoint-interior
    * members, which OGC-valid multipolygons are).
    */
  def covers(wa: Array[Byte], wb: Array[Byte]): Boolean =
    coversG(parse(wa), parse(wb))

  private def coversG(a: Geom, b: Geom): Boolean = {
    if (isEmptyG(a) || isEmptyG(b)) return false
    // (multi)line covers (multi)point/line: the segment-containment kernel
    // flattens a's members into one segment soup (segments/onBoundary
    // already recurse), so a line spanning two touching members of a
    // MULTILINESTRING is covered — the per-member recursion below would
    // declare it not-covered (r14: the approximation removed)
    if ((a.kind == 2 || a.kind == 5) &&
        (b.kind == 1 || b.kind == 2 || b.kind == 4 || b.kind == 5))
      return simples(b).forall { pb =>
        if (isEmptyG(pb)) true
        else if (pb.kind == 1) onBoundary(a, pb.rings(0)(0), pb.rings(0)(1))
        else lineCoversLine(a, pb)
      }
    if (a.kind >= 4 || b.kind >= 4)
      return simples(b).forall(pb => simples(a).exists(pa => coversG(pa, pb)))
    (a.kind, b.kind) match {
      case (1, 1) =>
        a.rings(0)(0) == b.rings(0)(0) && a.rings(0)(1) == b.rings(0)(1)
      case (2, 1) =>
        onBoundary(a, b.rings(0)(0), b.rings(0)(1))
      case (2, 2) => lineCoversLine(a, b)
      case (3, _) =>
        val allInOrOn = b.vertices.forall { case (px, py) =>
          inside(a, px, py) || onBoundary(a, px, py) }
        lazy val noCross = {
          val sa = segments(a); val sb = segments(b)
          !sa.exists(s1 => sb.exists(s2 => properCross(s1, s2)))
        }
        allInOrOn && noCross && noHoleStrictlyInside(a, b)
      case _ => false
    }
  }

  def coveredBy(wa: Array[Byte], wb: Array[Byte]): Boolean = covers(wb, wa)

  /** Line(-soup) covers line: every segment of b must lie on the union of
    * a's segments (a may be a LINESTRING or a MULTILINESTRING — `segments`
    * flattens). Split each b segment at every a-vertex that lies on it;
    * within each maximal sub-segment, coverage by any collinear a segment
    * is then all-or-nothing, so "covered" is exactly "some single a
    * segment contains both sub-segment endpoints".
    */
  private def lineCoversLine(a: Geom, b: Geom): Boolean = {
    val sa = segments(a)
    segments(b).forall { case (x1, y1, x2, y2) =>
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      if (len2 == 0.0) onBoundary(a, x1, y1)
      else {
        val ts = scala.collection.mutable.ArrayBuffer(0.0, 1.0)
        sa.foreach { case (ax1, ay1, ax2, ay2) =>
          var pi = 0
          while (pi < 2) {
            val px = if (pi == 0) ax1 else ax2
            val py = if (pi == 0) ay1 else ay2
            if (pointSegDist(px, py, x1, y1, x2, y2) == 0.0) {
              val t = ((px - x1) * dx + (py - y1) * dy) / len2
              if (t > 0 && t < 1) ts += t
            }
            pi += 1
          }
        }
        val sorted = ts.distinct.sorted
        sorted.iterator.zip(sorted.iterator.drop(1)).forall { case (t0, t1) =>
          val p0x = x1 + t0 * dx; val p0y = y1 + t0 * dy
          val p1x = x1 + t1 * dx; val p1y = y1 + t1 * dy
          sa.exists { case (ax1, ay1, ax2, ay2) =>
            pointSegDist(p0x, p0y, ax1, ay1, ax2, ay2) == 0.0 &&
              pointSegDist(p1x, p1y, ax1, ay1, ax2, ay2) == 0.0
          }
        }
      }
    }
  }

  // ---- interior-interior intersection + the remaining OGC predicates (r14) --

  /** Is `p` a point of the INTERIOR of g? Polygon: strictly inside; line:
    * on the line but not a (mod-2) endpoint; point: equality (a point's
    * boundary is empty, so the point IS its interior).
    */
  private def pointInInterior(g: Geom, px: Double, py: Double): Boolean = g.kind match {
    case 1 => g.rings.nonEmpty && g.rings(0)(0) == px && g.rings(0)(1) == py
    case 2 | 5 =>
      onBoundary(g, px, py) && !lineEndpoints(g).contains((px, py))
    case 3 | 6 => inside(g, px, py) && !onBoundary(g, px, py)
    case _ => g.parts.exists(pointInInterior(_, px, py))
  }

  /** The (multi)linestring's boundary points under the OGC mod-2 rule. */
  private def lineEndpoints(g: Geom): Set[(Double, Double)] = {
    val counts = scala.collection.mutable.HashMap.empty[(Double, Double), Int]
    simples(g).filter(m => m.kind == 2 && m.rings.nonEmpty).foreach { m =>
      val r = m.rings(0)
      val n = r.length / 2
      val closed = r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)
      if (!closed) Seq((r(0), r(1)), (r(2 * (n - 1)), r(2 * (n - 1) + 1))).foreach { p =>
        counts(p) = counts.getOrElse(p, 0) + 1
      }
    }
    // NOTE: .collect over a Map with a tuple-valued function would rebuild
    // a MAP keyed on the tuple's first element (endpoints sharing an x
    // overwrite each other) — iterate explicitly
    counts.iterator.collect { case (p, c) if c % 2 == 1 => p }.toSet
  }

  /** Do the INTERIORS of a and b share a point (the DE-9IM II entry)?
    * Decided from the kernels this engine already has: proper edge
    * crossings, vertices in the other's interior, positive-length
    * collinear line overlap, segment midpoints, and (for area pairs) a
    * guaranteed-interior pointOnSurface probe — exact for simple inputs;
    * the residual blind spot is an area-overlap region avoiding every
    * vertex, midpoint, and pointOnSurface probe with no proper crossing,
    * which cannot occur for simple polygons (any positive-area overlap of
    * simple polygons has a proper crossing or a vertex/probe inside).
    */
  private def interiorsIntersect(a: Geom, b: Geom): Boolean = {
    if (isEmptyG(a) || isEmptyG(b)) return false
    // Lineal x lineal BEFORE multi decomposition: the mod-2 rule is a
    // property of the WHOLE geometry (a contact point that is a
    // member-endpoint on both sides but with even multiplicity is interior
    // of both multis); per-member recursion would call it boundary and
    // wrongly report touches=true / crosses=false (r14 ADVICE).
    // segments/vertices/pointInInterior all operate on multis directly.
    if ((a.kind == 2 || a.kind == 5) && (b.kind == 2 || b.kind == 5)) {
      val sa = segments(a); val sb = segments(b)
      if (sa.exists(s1 => sb.exists(s2 => properCross(s1, s2)))) return true
      // positive-length collinear overlap: interiors share a segment
      if (sa.exists { case (x1, y1, x2, y2) =>
        sb.exists { case (x3, y3, x4, y4) =>
          collinearOverlap(x1, y1, x2, y2, x3, y3, x4, y4) } }) return true
      // isolated contact points: vertices of one lying on the other,
      // interiors decided by whole-geometry mod-2 (lineEndpoints)
      val contacts = a.vertices.filter { case (px, py) => onBoundary(b, px, py) } ++
        b.vertices.filter { case (px, py) => onBoundary(a, px, py) }
      return contacts.exists { case (px, py) =>
        pointInInterior(a, px, py) && pointInInterior(b, px, py) }
    }
    if (a.kind >= 4 || b.kind >= 4)
      return simples(a).exists(pa => simples(b).exists(pb => interiorsIntersect(pa, pb)))
    (a.kind, b.kind) match {
      case (1, _) => pointInInterior(b, a.rings(0)(0), a.rings(0)(1))
      case (_, 1) => pointInInterior(a, b.rings(0)(0), b.rings(0)(1))
      case (2, 3) => lineAreaInteriors(a, b)
      case (3, 2) => lineAreaInteriors(b, a)
      case (3, 3) =>
        // EXACT via the overlay kernel: interiors of two simple polygons
        // meet iff their intersection has positive area. (An earlier
        // vertex/probe heuristic missed stacked rectangles sharing both
        // side edges — every vertex and both pointOnSurface probes landed
        // on boundaries; the property test caught it.)
        val inter = intersection(writeGeom(a), writeGeom(b))
        inter != null && areaG(parse(inter)) > 0.0
      case _ => false
    }
  }

  /** line interior x polygon interior: a line vertex or segment midpoint
    * strictly inside, or a proper boundary crossing (which forces the line
    * interior into the polygon's interior on one side).
    */
  private def lineAreaInteriors(line: Geom, poly: Geom): Boolean = {
    val sl = segments(line); val sp = segments(poly)
    sl.exists(s1 => sp.exists(s2 => properCross(s1, s2))) ||
      line.vertices.exists { case (px, py) =>
        inside(poly, px, py) && !onBoundary(poly, px, py) } ||
      sl.exists { case (x1, y1, x2, y2) =>
        val mx = (x1 + x2) / 2; val my = (y1 + y2) / 2
        inside(poly, mx, my) && !onBoundary(poly, mx, my)
      }
  }

  /** Positive-length overlap of two collinear segments. */
  private def collinearOverlap(x1: Double, y1: Double, x2: Double, y2: Double,
      x3: Double, y3: Double, x4: Double, y4: Double): Boolean = {
    def orient(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (orient(x1, y1, x2, y2, x3, y3) != 0 || orient(x1, y1, x2, y2, x4, y4) != 0)
      return false
    val dx = x2 - x1; val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return false
    val t3 = ((x3 - x1) * dx + (y3 - y1) * dy) / len2
    val t4 = ((x4 - x1) * dx + (y4 - y1) * dy) / len2
    math.min(math.max(t3, t4), 1.0) - math.max(math.min(t3, t4), 0.0) > 0
  }

  /** OGC Touches: the geometries intersect, but only on their boundaries
    * (DE-9IM II empty, intersection nonempty).
    */
  def touches(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    intersectsG(a, b) && !interiorsIntersect(a, b)
  }

  /** OGC Crosses: interiors intersect in a lower dimension than the
    * higher-dimensional input — line/line meeting at points, line passing
    * through a polygon's interior AND outside it. Area/area and
    * point-involved pairs are false per the OGC matrix.
    */
  def crosses(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    def dimOf(g: Geom): Int = g.kind match {
      case 1 | 4 => 0; case 2 | 5 => 1; case 3 | 6 => 2
      case _ => if (g.parts.isEmpty) 0 else g.parts.map(dimOf).max
    }
    (dimOf(a), dimOf(b)) match {
      case (1, 1) =>
        // interiors meet at isolated points only: any II contact without a
        // positive-length collinear overlap
        interiorsIntersect(a, b) && !simples(a).exists(pa => simples(b).exists(pb =>
          segments(pa).exists { case (x1, y1, x2, y2) =>
            segments(pb).exists { case (x3, y3, x4, y4) =>
              collinearOverlap(x1, y1, x2, y2, x3, y3, x4, y4) } }))
      case (1, 2) => interiorsIntersect(a, b) && !covers(wb, wa)
      case (2, 1) => interiorsIntersect(a, b) && !covers(wa, wb)
      case _ => false
    }
  }

  /** OGC Overlaps: same dimension, interiors intersect, and neither covers
    * the other.
    */
  def overlaps(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    def dimOf(g: Geom): Int = g.kind match {
      case 1 | 4 => 0; case 2 | 5 => 1; case 3 | 6 => 2
      case _ => if (g.parts.isEmpty) 0 else g.parts.map(dimOf).max
    }
    dimOf(a) == dimOf(b) && interiorsIntersect(a, b) &&
      !covers(wa, wb) && !covers(wb, wa)
  }

  /** PostGIS ST_ContainsProperly: b intersects a's interior ONLY — no
    * contact with a's boundary (stricter than contains).
    */
  def containsProperly(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    if (isEmptyG(a) || isEmptyG(b)) return false
    // every b vertex strictly inside a, and a's boundary never reaches b:
    // no proper crossing, no a-vertex on or inside b, no collinear edge
    // contact (a concave a-vertex dipping onto/into b violates 'properly')
    val strictVerts = b.vertices.forall { case (px, py) =>
      inside(a, px, py) && !onBoundary(a, px, py) }
    lazy val noBoundaryContact = {
      val sa = segments(a); val sb = segments(b)
      !sa.exists(s1 => sb.exists(s2 => properCross(s1, s2))) &&
        !a.vertices.exists { case (px, py) =>
          (b.kind != 1 && onBoundary(b, px, py)) ||
            (inside(b, px, py) && !onBoundary(b, px, py)) } &&
        !sa.exists { case (x1, y1, x2, y2) =>
          sb.exists { case (x3, y3, x4, y4) =>
            collinearOverlap(x1, y1, x2, y2, x3, y3, x4, y4) } }
    }
    strictVerts && noBoundaryContact
  }

  // ---- constructors & transforms (tranche 2) --------------------------------

  def makeLine(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val a = parse(wa); val b = parse(wb)
    if (a.kind != 1 || b.kind != 1) fail("st_makeline expects two POINTs")
    writeGeom(Geom(2, Array(Array(a.rings(0)(0), a.rings(0)(1), b.rings(0)(0), b.rings(0)(1)))))
  }

  def translate(wkb: Array[Byte], dx: Double, dy: Double): Array[Byte] =
    writeGeom(mapCoords(parse(wkb))((x, y) => (x + dx, y + dy)))

  /** Apply a coordinate transform to every vertex, recursing into parts. */
  private def mapCoords(g: Geom)(f: (Double, Double) => (Double, Double)): Geom =
    if (g.kind >= 4) Geom(g.kind, g.rings, g.parts.map(mapCoords(_)(f)))
    else Geom(g.kind, g.rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0
      while (i < r.length) {
        val (nx, ny) = f(r(i), r(i + 1))
        out(i) = nx; out(i + 1) = ny
        i += 2
      }
      out
    })

  def flipCoordinates(wkb: Array[Byte]): Array[Byte] =
    writeGeom(mapCoords(parse(wkb))((x, y) => (y, x)))

  /** Axis-aligned bounding box of any geometry, as a polygon. */
  def envelopeOf(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    val xs = g.vertices.map(_._1).toSeq; val ys = g.vertices.map(_._2).toSeq
    makeEnvelope(xs.min, ys.min, xs.max, ys.max)
  }

  /** Area centroid for polygons (holes subtracted, shoelace moments),
    * length-weighted midpoint for linestrings, identity for points.
    * Degenerate (zero-area polygon / zero-length line) falls back to the
    * vertex mean.
    */
  def centroid(wkb: Array[Byte]): Array[Byte] = centroidG(parse(wkb))

  private def centroidG(g: Geom): Array[Byte] = {
    g.kind match {
      case k if k >= 4 =>
        // GEOS semantics: only the highest-dimension members contribute
        // (a point member does not shift a multipolygon's centroid)
        val ss = simples(g)
        if (ss.isEmpty) fail("st_centroid: empty geometry collection")
        val dim = ss.map(_.kind).max
        val rel = ss.filter(_.kind == dim)
        val weighted = rel.map { p =>
          val c = parse(centroidG(p))
          val w = dim match {
            case 3 => areaG(p)
            case 2 => lengthG(p)
            case _ => 1.0
          }
          (c.rings(0)(0), c.rings(0)(1), w)
        }
        val total = weighted.map(_._3).sum
        if (total == 0.0) vertexMean(g)
        else point(
          weighted.map(t => t._1 * t._3).sum / total,
          weighted.map(t => t._2 * t._3).sum / total)
      case 1 => point(g.rings(0)(0), g.rings(0)(1))
      case 2 =>
        val r = g.rings(0); val n = r.length / 2
        var len = 0.0; var cx = 0.0; var cy = 0.0
        var i = 0
        while (i < n - 1) {
          val l = math.hypot(r(2 * i + 2) - r(2 * i), r(2 * i + 3) - r(2 * i + 1))
          cx += l * (r(2 * i) + r(2 * i + 2)) / 2
          cy += l * (r(2 * i + 1) + r(2 * i + 3)) / 2
          len += l
          i += 1
        }
        if (len == 0.0) vertexMean(g) else point(cx / len, cy / len)
      case _ =>
        var a = 0.0; var cx = 0.0; var cy = 0.0
        var ri = 0
        while (ri < g.rings.length) {
          val r = g.rings(ri); val n = r.length / 2
          val sign = if (ri == 0) 1.0 else -1.0
          val ringArea = shoelace(r)
          // orient every ring's contribution consistently: shell adds its
          // |area| moments, holes subtract theirs
          val s = sign * (if (ringArea < 0) -1.0 else 1.0)
          var i = 0
          while (i < n) {
            val j = (i + 1) % n
            val cross = r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
            cx += s * (r(2 * i) + r(2 * j)) * cross
            cy += s * (r(2 * i + 1) + r(2 * j + 1)) * cross
            i += 1
          }
          a += sign * math.abs(ringArea)
          ri += 1
        }
        if (a == 0.0) vertexMean(g) else point(cx / (6 * a), cy / (6 * a))
    }
  }

  private def vertexMean(g: Geom): Array[Byte] = {
    val vs = g.vertices.toSeq
    point(vs.map(_._1).sum / vs.size, vs.map(_._2).sum / vs.size)
  }

  // ---- ring / line accessors --------------------------------------------------

  def startPoint(wkb: Array[Byte]): Array[Byte] = pointN(wkb, 1)

  def endPoint(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 2) fail("st_endpoint expects a LINESTRING")
    pointN(wkb, g.rings(0).length / 2)
  }

  /** 1-based vertex of a linestring (OGC ST_PointN). */
  def pointN(wkb: Array[Byte], n: Int): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 2) fail("st_pointn expects a LINESTRING")
    val count = g.rings(0).length / 2
    if (n < 1 || n > count) fail(s"st_pointn index $n out of range 1..$count")
    point(g.rings(0)(2 * (n - 1)), g.rings(0)(2 * (n - 1) + 1))
  }

  def exteriorRing(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 3) fail("st_exteriorring expects a POLYGON")
    writeGeom(Geom(2, Array(g.rings(0))))
  }

  def numInteriorRings(wkb: Array[Byte]): Int = {
    val g = parse(wkb)
    if (g.kind != 3) fail("st_numinteriorrings expects a POLYGON")
    g.rings.length - 1
  }

  /** 1-based nth hole as a LINESTRING (PostGIS ST_InteriorRingN); NULL
    * past the hole count, like PostGIS.
    */
  def interiorRingN(wkb: Array[Byte], n: Int): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 3) fail("st_interiorringn expects a POLYGON")
    if (n < 1 || n > g.rings.length - 1) null
    else writeGeom(Geom(2, Array(g.rings(n).clone())))
  }

  /** Geodesic length in meters on the IUGG mean sphere: haversine summed
    * over the segments of a (MULTI)LINESTRING of (lon, lat)-degree
    * vertices; polygons measure their ring perimeters.
    */
  def lengthSphere(wkb: Array[Byte]): Double = {
    def segLen(lon1d: Double, lat1d: Double, lon2d: Double, lat2d: Double): Double = {
      val lat1 = math.toRadians(lat1d); val lat2 = math.toRadians(lat2d)
      val sdLat = math.sin((lat2 - lat1) / 2)
      val sdLon = math.sin(math.toRadians(lon2d - lon1d) / 2)
      val h = sdLat * sdLat + math.cos(lat1) * math.cos(lat2) * sdLon * sdLon
      2 * 6371008.8 * math.asin(math.min(1.0, math.sqrt(h)))
    }
    segments(parse(wkb)).iterator.map { case (x1, y1, x2, y2) =>
      segLen(x1, y1, x2, y2)
    }.sum
  }

  /** Scale about the origin (PostGIS ST_Scale two-factor form). */
  def scale(wkb: Array[Byte], sx: Double, sy: Double): Array[Byte] =
    writeGeom(mapCoords(parse(wkb))((x, y) => (x * sx, y * sy)))

  /** Rotate counterclockwise by `rad` about the origin (PostGIS ST_Rotate). */
  def rotate(wkb: Array[Byte], rad: Double): Array[Byte] = {
    val c = math.cos(rad); val s = math.sin(rad)
    writeGeom(mapCoords(parse(wkb))((x, y) => (c * x - s * y, s * x + c * y)))
  }

  // ---- multi-geometry accessors -------------------------------------------------

  /** Member count: 1 for simple geometries (PostGIS semantics). */
  def numGeometries(wkb: Array[Byte]): Int = {
    val g = parse(wkb)
    if (g.kind <= 3) 1 else g.parts.length
  }

  /** 1-based member of a multi-geometry; the geometry itself for n=1 on a
    * simple geometry (PostGIS ST_GeometryN).
    */
  def geometryN(wkb: Array[Byte], n: Int): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind <= 3) {
      if (n != 1) fail(s"st_geometryn index $n out of range on a simple geometry")
      wkb.clone()
    } else {
      if (n < 1 || n > g.parts.length)
        fail(s"st_geometryn index $n out of range 1..${g.parts.length}")
      writeGeom(g.parts(n - 1))
    }
  }

  /** Members of the requested kind (1=point, 2=line, 3=polygon), collected
    * into the matching multi-geometry (PostGIS ST_CollectionExtract).
    */
  def collectionExtract(wkb: Array[Byte], kind: Int): Array[Byte] = {
    if (kind < 1 || kind > 3) fail(s"st_collectionextract kind $kind must be 1, 2, or 3")
    val matched = simples(parse(wkb)).filter(_.kind == kind)
    // No member of the requested kind -> NULL, consistent with the engine's
    // declared no-EMPTY-geometry scope (st_intersection does the same on
    // disjoint input). A zero-member multi would print as 'MULTIPOINT ()',
    // which fromText itself rejects and the accessors throw on.
    if (matched.isEmpty) null
    else writeGeom(Geom(kind + 3, Array.empty, matched.toArray))
  }

  // ---- CRS transform / GeoJSON / equality / boundary (r13 tranche 3) --------

  /** Reproject between the two CRSs that cover the vast majority of
    * analytic data: EPSG:4326 (lon/lat degrees) and EPSG:3857 (Web
    * Mercator meters, spherical, the web-tile standard). A full proj
    * pipeline needs the EPSG database (no jars in this environment —
    * declared); these two are closed-form:
    *   x = R·λ,  y = R·ln(tan(π/4 + φ/2)),  R = 6378137 (WGS84 semi-major,
    * the sphere 3857 is DEFINED on). Latitudes beyond ±85.06° fail loudly
    * like PROJ does (y diverges).
    */
  def transform(wkb: Array[Byte], from: UTF8String, to: UTF8String): Array[Byte] = {
    val f = from.toString.toUpperCase.trim
    val t = to.toString.toUpperCase.trim
    val R = 6378137.0
    (f, t) match {
      case ("EPSG:4326", "EPSG:3857") =>
        writeGeom(mapCoords(parse(wkb)) { (lon, lat) =>
          if (math.abs(lat) > 85.06113)
            fail(s"st_transform: latitude $lat outside the Web Mercator domain (±85.06)")
          (R * math.toRadians(lon),
            R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
        })
      case ("EPSG:3857", "EPSG:4326") =>
        writeGeom(mapCoords(parse(wkb)) { (x, y) =>
          (math.toDegrees(x / R),
            math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))
        })
      case (a, b) if a == b => wkb.clone()
      case _ => fail(s"st_transform: only EPSG:4326 <-> EPSG:3857 are supported " +
        s"(no proj database in this environment — declared), got $f -> $t")
    }
  }

  /** GeoJSON geometry object for the geometry (RFC 7946); numbers print
    * like WKT (integral values without a decimal point).
    */
  def asGeoJson(wkb: Array[Byte]): UTF8String = UTF8String.fromString(geoJsonOf(parse(wkb)))

  private def geoJsonOf(g: Geom): String = {
    def num(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
    def pos(x: Double, y: Double) = s"[${num(x)},${num(y)}]"
    def ringArr(r: Array[Double]): String =
      (0 until r.length / 2).map(i => pos(r(2 * i), r(2 * i + 1))).mkString("[", ",", "]")
    g.kind match {
      case 1 => s"""{"type":"Point","coordinates":${pos(g.rings(0)(0), g.rings(0)(1))}}"""
      case 2 => s"""{"type":"LineString","coordinates":${ringArr(g.rings(0))}}"""
      case 3 =>
        s"""{"type":"Polygon","coordinates":${g.rings.map(ringArr).mkString("[", ",", "]")}}"""
      case 4 => s"""{"type":"MultiPoint","coordinates":${
        g.parts.map(p => pos(p.rings(0)(0), p.rings(0)(1))).mkString("[", ",", "]")}}"""
      case 5 => s"""{"type":"MultiLineString","coordinates":${
        g.parts.map(p => ringArr(p.rings(0))).mkString("[", ",", "]")}}"""
      case 6 => s"""{"type":"MultiPolygon","coordinates":${
        g.parts.map(p => p.rings.map(ringArr).mkString("[", ",", "]")).mkString("[", ",", "]")}}"""
      case _ => s"""{"type":"GeometryCollection","geometries":${
        g.parts.map(geoJsonOf).mkString("[", ",", "]")}}"""
    }
  }

  /** Parse a GeoJSON geometry object (RFC 7946 subset: the seven geometry
    * types, 2-D positions; Feature/FeatureCollection wrappers and foreign
    * members are out of scope, loudly).
    */
  def fromGeoJson(json: UTF8String): Array[Byte] = {
    val s = json.toString
    var pos = 0
    def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def expect(c: Char): Unit = {
      ws()
      if (pos >= s.length || s.charAt(pos) != c)
        fail(s"st_geomfromgeojson: expected '$c' at $pos in $s")
      pos += 1
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') { sb.append(s.charAt(pos)); pos += 1 }
      expect('"')
      sb.toString
    }
    def number(): Double = {
      ws()
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail(s"st_geomfromgeojson: expected a number at $start")
      s.substring(start, pos).toDouble
    }
    def position(): (Double, Double) = {
      expect('['); val x = number(); expect(','); val y = number()
      ws()
      // tolerate (and drop) an altitude third element
      if (pos < s.length && s.charAt(pos) == ',') { pos += 1; number() }
      expect(']')
      (x, y)
    }
    def array[T](elem: () => T): Seq[T] = {
      expect('[')
      val out = scala.collection.mutable.ArrayBuffer.empty[T]
      ws()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return out.toSeq }
      out += elem()
      ws()
      while (pos < s.length && s.charAt(pos) == ',') { pos += 1; out += elem(); ws() }
      expect(']')
      out.toSeq
    }
    def ringOf(ps: Seq[(Double, Double)]): Array[Double] = {
      val r = new Array[Double](2 * ps.length)
      ps.zipWithIndex.foreach { case ((x, y), i) => r(2 * i) = x; r(2 * i + 1) = y }
      r
    }
    def obj(): Geom = {
      expect('{')
      var typ: String = null
      var geom: Geom = null
      var done = false
      while (!done) {
        ws()
        val key = string()
        expect(':')
        key match {
          case "type" => typ = string()
          case "coordinates" =>
            // `type` before `coordinates` (the universal emitter order;
            // the reverse is declared out of scope)
            if (typ == null) fail("st_geomfromgeojson: coordinates before type unsupported")
            geom = typ match {
              case "Point" => val (x, y) = position(); Geom(1, Array(Array(x, y)))
              case "LineString" => Geom(2, Array(ringOf(array(() => position()))))
              case "Polygon" =>
                Geom(3, array(() => ringOf(array(() => position()))).toArray)
              case "MultiPoint" => Geom(4, Array.empty,
                array(() => position()).map { case (x, y) => Geom(1, Array(Array(x, y))) }.toArray)
              case "MultiLineString" => Geom(5, Array.empty,
                array(() => ringOf(array(() => position()))).map(r => Geom(2, Array(r))).toArray)
              case "MultiPolygon" => Geom(6, Array.empty,
                array(() => array(() => ringOf(array(() => position()))).toArray)
                  .map(rs => Geom(3, rs)).toArray)
              case other => fail(s"st_geomfromgeojson: '$other' takes no coordinates")
            }
          case "geometries" =>
            geom = Geom(7, Array.empty, array(() => obj()).toArray)
          case other => fail(s"st_geomfromgeojson: unsupported member '$other' " +
            "(Feature wrappers and foreign members are out of scope)")
        }
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      if (geom == null) fail("st_geomfromgeojson: no coordinates/geometries member")
      geom
    }
    val g = obj()
    writeGeom(g)
  }

  /** Topological equality: each covers the other (same point set), so
    * ring rotation, orientation, and redundant collinear vertices don't
    * matter (PostGIS ST_Equals semantics over this engine's covers scope).
    */
  def geomEquals(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    // two empties are the same (empty) point set regardless of type tag
    if (isEmptyG(a) || isEmptyG(b)) return isEmptyG(a) && isEmptyG(b)
    coversG(a, b) && coversG(b, a)
  }

  /** OGC boundary: polygon -> its ring(s) as (MULTI)LINESTRING, linestring
    * -> MULTIPOINT of its endpoints (NULL when closed — no EMPTY geometry,
    * declared), point -> NULL. Multi-geometries follow the OGC mod-2 rule:
    * a MULTILINESTRING's boundary keeps only endpoints shared by an odd
    * number of members (a point where two members meet is interior), and a
    * MULTIPOLYGON's boundary is the MULTILINESTRING of all its rings.
    * Heterogeneous GEOMETRYCOLLECTIONs stay per-member (declared
    * approximation — OGC leaves collection boundaries undefined).
    */
  def boundary(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (isEmptyG(g)) return null
    g.kind match {
      case 1 | 4 => null
      case 2 =>
        val r = g.rings(0)
        val n = r.length / 2
        if (r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)) null
        else writeGeom(Geom(4, Array.empty, Array(
          Geom(1, Array(Array(r(0), r(1)))),
          Geom(1, Array(Array(r(2 * (n - 1)), r(2 * (n - 1) + 1)))))))
      case 3 =>
        if (g.rings.length == 1) writeGeom(Geom(2, Array(g.rings(0).clone())))
        else writeGeom(Geom(5, Array.empty,
          g.rings.map(r => Geom(2, Array(r.clone())))))
      case 5 =>
        // mod-2 rule: count endpoint multiplicity across open members, keep
        // points that appear an odd number of times
        val counts = scala.collection.mutable.LinkedHashMap.empty[(Double, Double), Int]
        g.parts.filter(_.rings.nonEmpty).foreach { p =>
          val r = p.rings(0)
          val n = r.length / 2
          val closed = r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)
          if (!closed) {
            Seq((r(0), r(1)), (r(2 * (n - 1)), r(2 * (n - 1) + 1))).foreach { pt =>
              counts(pt) = counts.getOrElse(pt, 0) + 1
            }
          }
        }
        val odd = counts.collect { case ((x, y), c) if c % 2 == 1 => Geom(1, Array(Array(x, y))) }.toArray
        if (odd.isEmpty) null
        else if (odd.length == 1) writeGeom(odd(0))
        else writeGeom(Geom(4, Array.empty, odd))
      case 6 =>
        val rings = g.parts.flatMap(_.rings.map(r => Geom(2, Array(r.clone()))))
        if (rings.isEmpty) null
        else if (rings.length == 1) writeGeom(rings(0))
        else writeGeom(Geom(5, Array.empty, rings))
      case _ =>
        val parts = g.parts.flatMap(p => Option(boundary(writeGeom(p))).map(parse))
        if (parts.isEmpty) null
        else if (parts.length == 1) writeGeom(parts(0))
        else writeGeom(Geom(7, Array.empty, parts))
    }
  }

  // ---- point/line utilities (r13 tranche 2) ---------------------------------

  /** Reverse the vertex order of every ring/line (PostGIS ST_Reverse). */
  def reverse(wkb: Array[Byte]): Array[Byte] = writeGeom(reverseG(parse(wkb)))

  private def reverseG(g: Geom): Geom =
    if (g.kind >= 4) Geom(g.kind, g.rings, g.parts.map(reverseG))
    else Geom(g.kind, g.rings.map { r =>
      val n = r.length / 2
      val out = new Array[Double](r.length)
      var i = 0
      while (i < n) {
        out(2 * i) = r(2 * (n - 1 - i)); out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
        i += 1
      }
      out
    })

  /** Collapse consecutive duplicate vertices (PostGIS
    * ST_RemoveRepeatedPoints with tolerance 0; rings keep their closing
    * vertex).
    */
  def removeRepeatedPoints(wkb: Array[Byte]): Array[Byte] = {
    def clean(g: Geom): Geom =
      if (g.kind >= 4) Geom(g.kind, g.rings, g.parts.map(clean))
      else Geom(g.kind, g.rings.map { r =>
        val out = new scala.collection.mutable.ArrayBuffer[Double](r.length)
        var i = 0
        while (i < r.length) {
          if (i == 0 || r(i) != out(out.length - 2) || r(i + 1) != out(out.length - 1)) {
            out += r(i); out += r(i + 1)
          }
          i += 2
        }
        out.toArray
      })
    writeGeom(clean(parse(wkb)))
  }

  /** Snap every coordinate to the nearest multiple of `size` (half away
    * from the origin rounds up, PostGIS ST_SnapToGrid's practical core).
    */
  def snapToGrid(wkb: Array[Byte], size: Double): Array[Byte] = {
    if (size <= 0) fail("st_snaptogrid: size must be > 0")
    // sign-aware: halfway values round away from the origin (-0.5 @ size 1
    // snaps to -1, +0.5 to +1), matching PostGIS's symmetric rounding
    // "+ 0.0" strips the -0.0 that signum(-eps) * 0 would otherwise emit
    def snap(v: Double): Double =
      math.signum(v) * math.floor(math.abs(v) / size + 0.5) * size + 0.0
    writeGeom(mapCoords(parse(wkb))((x, y) => (snap(x), snap(y))))
  }

  /** North-based clockwise azimuth from point a to point b in [0, 2*pi)
    * (PostGIS ST_Azimuth); fails loudly on coincident points.
    */
  def azimuth(wa: Array[Byte], wb: Array[Byte]): Double = {
    val a = parse(wa); val b = parse(wb)
    if (a.kind != 1 || b.kind != 1) fail("st_azimuth expects two POINTs")
    val dx = b.rings(0)(0) - a.rings(0)(0)
    val dy = b.rings(0)(1) - a.rings(0)(1)
    if (dx == 0 && dy == 0) fail("st_azimuth: coincident points")
    val az = math.atan2(dx, dy)
    if (az < 0) az + 2 * math.Pi else az
  }

  /** Point at `frac` (0..1) of the linestring's length (PostGIS
    * ST_LineInterpolatePoint).
    */
  def lineInterpolatePoint(wkb: Array[Byte], frac: Double): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 2) fail("st_lineinterpolatepoint expects a LINESTRING")
    if (frac < 0 || frac > 1) fail(s"st_lineinterpolatepoint: fraction $frac outside [0, 1]")
    val r = g.rings(0)
    val n = r.length / 2
    val total = lengthG(g)
    if (total == 0) return point(r(0), r(1))
    var target = frac * total
    var i = 0
    while (i < n - 1) {
      val segLen = math.hypot(r(2 * i + 2) - r(2 * i), r(2 * i + 3) - r(2 * i + 1))
      if (target <= segLen && segLen > 0) {
        val t = target / segLen
        return point(r(2 * i) + t * (r(2 * i + 2) - r(2 * i)),
          r(2 * i + 1) + t * (r(2 * i + 3) - r(2 * i + 1)))
      }
      target -= segLen
      i += 1
    }
    point(r(2 * (n - 1)), r(2 * (n - 1) + 1))
  }

  /** The point ON `a` nearest to `b` (PostGIS ST_ClosestPoint). When the
    * geometries intersect the contact is taken from b's side that meets a
    * (a vertex of b inside area-a, or a crossing vertex projection) —
    * exact for the non-intersecting case, which is the analytic use.
    */
  def closestPoint(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val a = parse(wa); val b = parse(wb)
    // b (or one of its vertices) inside area-a: that vertex is on/in a
    if (a.kind == 3 || a.kind >= 4) {
      val hit = simples(a).filter(_.kind == 3).iterator.flatMap { pa =>
        b.vertices.find { case (px, py) => inside(pa, px, py) || onBoundary(pa, px, py) }
      }.iterator
      if (hit.hasNext) { val (px, py) = hit.next(); return point(px, py) }
    }
    val sa = segments(a)
    var best = Double.PositiveInfinity
    var bx = 0.0; var by = 0.0
    if (sa.isEmpty) {
      // a is a point (or multipoint): nearest vertex of a to b
      a.vertices.foreach { case (px, py) =>
        val d = distance(point(px, py), wb)
        if (d < best) { best = d; bx = px; by = py }
      }
    } else {
      // project every vertex of b on every segment of a...
      b.vertices.foreach { case (px, py) =>
        sa.foreach { case (x1, y1, x2, y2) =>
          val dx = x2 - x1; val dy = y2 - y1
          val len2 = dx * dx + dy * dy
          val t = if (len2 == 0) 0.0
            else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
          val cx = x1 + t * dx; val cy = y1 + t * dy
          val d = math.hypot(px - cx, py - cy)
          if (d < best) { best = d; bx = cx; by = cy }
        }
      }
      // ...and every vertex of a against b (the nearest point of a pair of
      // segments is always a vertex projection on one side or the other)
      a.vertices.foreach { case (px, py) =>
        val d = distance(point(px, py), wb)
        if (d < best) { best = d; bx = px; by = py }
      }
    }
    point(bx, by)
  }

  /** Two-point LINESTRING joining the closest points of a and b (PostGIS
    * ST_ShortestLine); degenerate (zero-length) when they intersect.
    */
  def shortestLine(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val pa = closestPoint(wa, wb)
    val pb = closestPoint(wb, pa)
    val a = parse(pa); val b = parse(pb)
    writeGeom(Geom(2, Array(Array(
      a.rings(0)(0), a.rings(0)(1), b.rings(0)(0), b.rings(0)(1)))))
  }

  /** A point guaranteed in the polygon's interior (PostGIS
    * ST_PointOnSurface): subtract the holes with the triangulated-overlay
    * kernel (pieces are hole-free with interiors inside shell-minus-holes
    * by construction), then take the largest ear triangle's centroid of
    * the largest piece — a triangle interior point, so strictly interior
    * with no scanline epsilon games. Linestrings interpolate their
    * midpoint; points return themselves; multis use the largest member of
    * the highest dimension present.
    */
  def pointOnSurface(wkb: Array[Byte]): Array[Byte] = posG(parse(wkb))

  private def posG(g: Geom): Array[Byte] = g.kind match {
    case 1 => point(g.rings(0)(0), g.rings(0)(1))
    case 2 => lineInterpolatePoint(writeGeom(g), 0.5)
    case 3 =>
      var pieces: Seq[Array[Double]] =
        Seq(openShellCcw(Geom(3, Array(g.rings(0))), "st_pointonsurface"))
      g.rings.drop(1).foreach { h =>
        val hr = openShellCcw(Geom(3, Array(h)), "st_pointonsurface")
        clipRings(hr).foreach { t => pieces = pieces.flatMap(p => diffConvexRing(p, t)) }
      }
      if (pieces.isEmpty)
        fail("st_pointonsurface: holes cover the whole shell (invalid polygon)")
      val big = pieces.maxBy(p => math.abs(shoelace(p)))
      val tri = triangulate(big).maxBy(t => math.abs(shoelace(t)))
      point((tri(0) + tri(2) + tri(4)) / 3.0, (tri(1) + tri(3) + tri(5)) / 3.0)
    case _ =>
      val members = simples(g)
      val dim = members.map(_.kind).max
      val pick = members.filter(_.kind == dim).maxBy(m =>
        if (dim == 3) areaG(m) else if (dim == 2) lengthG(m) else 0.0)
      posG(pick)
  }

  // ---- validity (r13) -------------------------------------------------------

  /** OGC validity, practical subset (documented): POINT always valid;
    * LINESTRING valid with >= 2 vertices; POLYGON requires every ring
    * SIMPLE (no self-crossing or self-touch, no duplicate consecutive
    * vertices, no spikes, nonzero area), every hole STRICTLY inside the
    * shell (a point-touch against the shell — OGC-legal but MakeValid
    * territory — reads invalid here, declared stricter-than-OGC), holes
    * pairwise disjoint. Multi-geometries validate per member;
    * member-interior disjointness (the MULTIPOLYGON overlap rule) is NOT
    * checked — that is the overlay machinery this engine scopes out.
    */
  def isValid(wkb: Array[Byte]): Boolean = isValidG(parse(wkb))

  /** Repair self-intersecting rings (PostGIS ST_MakeValid's common case,
    * r14): node each ring at its proper self-intersection points, then
    * walk it extracting a loop whenever a noded vertex repeats — a bowtie
    * becomes its two triangles, a figure-eight its two loops. Zero-area
    * loops drop; the result is the valid POLYGON/MULTIPOLYGON with the
    * same filled point set (even-odd semantics). Valid input passes
    * through unchanged (bit-identical). Holes are re-attached to the shell
    * piece that contains them after both are repaired; multi inputs repair
    * per member. Out of scope, loudly: rings whose self-contact needs
    * snapping (nearly-but-not-exactly-equal coordinates).
    */
  def makeValid(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (isValidG(g)) return wkb
    def repairRing(r: Array[Double]): Seq[Array[Double]] = {
      val open = openRing(r)
      val n = open.length / 2
      if (n < 3) return Nil
      // node: for each directed edge, collect proper intersection points
      // with every non-adjacent edge, sorted along the edge
      def seg(i: Int) = (open(2 * i), open(2 * i + 1),
        open(2 * ((i + 1) % n)), open(2 * ((i + 1) % n) + 1))
      val noded = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var i = 0
      while (i < n) {
        val (x1, y1, x2, y2) = seg(i)
        noded += ((x1, y1))
        val cuts = scala.collection.mutable.ArrayBuffer.empty[(Double, (Double, Double))]
        var j = 0
        while (j < n) {
          val adjacent = j == i || (j + 1) % n == i || (i + 1) % n == j
          if (!adjacent) {
            val (x3, y3, x4, y4) = seg(j)
            if (properCross((x1, y1, x2, y2), (x3, y3, x4, y4))) {
              // exact line-line intersection via the parametric form
              val d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
              val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
              cuts += ((t, (x1 + t * (x2 - x1), y1 + t * (y2 - y1))))
            }
          }
          j += 1
        }
        cuts.sortBy(_._1).foreach { case (_, p) => noded += p }
        i += 1
      }
      // walk, popping a loop whenever a vertex repeats
      val stack = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val index = scala.collection.mutable.HashMap.empty[(Double, Double), Int]
      val loops = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      def emit(from: Int): Unit = {
        val loop = stack.slice(from, stack.length)
        if (loop.length >= 3) {
          val flat = new Array[Double](2 * loop.length)
          loop.indices.foreach { k => flat(2 * k) = loop(k)._1; flat(2 * k + 1) = loop(k)._2 }
          if (math.abs(shoelace(flat)) > 0.0) loops += flat
        }
        stack.remove(from, stack.length - from)
        index.clear()
        stack.indices.foreach(k => index(stack(k)) = k) // rebuild positions
      }
      (noded :+ noded.head).foreach { p =>
        index.get(p) match {
          case Some(at) =>
            emit(at)
            stack += p; index(p) = stack.length - 1
          case None =>
            stack += p; index(p) = stack.length - 1
        }
      }
      // the closing vertex re-visits the start: emit(0) captured the outer
      // loop; anything left on the stack (shouldn't happen) is dropped
      loops.toSeq
    }
    def repair(m: Geom): Seq[Geom] = m.kind match {
      case 3 =>
        val shells = repairRing(m.rings(0))
        val holePieces = m.rings.drop(1).toSeq.flatMap(repairRing)
        shells.map { s =>
          val mine = holePieces.filter(h => inside(Geom(3, Array(s)), h(0), h(1)) ||
            onBoundary(Geom(3, Array(s)), h(0), h(1)))
          Geom(3, (closeRing(s) +: mine.map(closeRing)).toArray)
        }
      case k if k >= 4 => m.parts.toSeq.flatMap(repair)
      case _ => Seq(m) // points/lines: validity issues out of this scope
    }
    val pieces = repair(g)
    if (pieces.isEmpty) fail("st_makevalid: repair produced no positive-area rings")
    val out =
      if (pieces.length == 1) writeGeom(pieces.head)
      else writeGeom(Geom(6, Array.empty, pieces.toArray))
    // loud-beats-wrong: noding only handles PROPER crossings and exact
    // vertex re-visits; anything still invalid (collinear self-overlap,
    // near-coincident coordinates needing snapping) is declared, not fudged
    if (!isValid(out))
      fail("st_makevalid: could not repair (self-contact needs snapping or " +
        "collinear-overlap resolution — out of the noding scope)")
    out
  }

  /** Douglas-Peucker simplification that never invalidates: each polygon
    * ring simplifies independently, but a ring whose simplified form would
    * self-intersect or collapse below 3 distinct vertices KEEPS its
    * original vertices (PostGIS ST_SimplifyPreserveTopology's single-
    * geometry core; cross-ring/cross-member collisions are not introduced
    * because every original ring is a valid fallback).
    */
  def simplifyPreserveTopology(wkb: Array[Byte], tol: Double): Array[Byte] = {
    val g = parse(wkb)
    def walk(m: Geom): Geom = m.kind match {
      case 3 =>
        Geom(3, m.rings.map { r =>
          // plain simplify fails LOUDLY on ring collapse — here collapse
          // means "keep the original ring", the preserve-topology contract
          try {
            val simple = parse(simplify(writeGeom(Geom(3, Array(r))), tol)).rings(0)
            val open = openRing(simple)
            if (open.length / 2 >= 3 && polygonValid(Geom(3, Array(simple)))) simple
            else r
          } catch { case _: IllegalArgumentException => r }
        })
      case 2 => parse(simplify(writeGeom(m), tol))
      case k if k >= 4 => Geom(k, m.rings, m.parts.map(walk))
      case _ => m
    }
    writeGeom(walk(g))
  }

  private def isValidG(g: Geom): Boolean =
    if (isEmptyG(g)) true // OGC: empty geometries are valid
    else g.kind match {
      case 1 => true
      case 2 => g.rings(0).length / 2 >= 2
      case 3 => polygonValid(g)
      case _ => g.parts.nonEmpty && g.parts.forall(isValidG)
    }

  /** Drop the closing duplicate vertex if present. */
  private def openRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val closed = n >= 2 && r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)
    if (closed) java.util.Arrays.copyOf(r, 2 * (n - 1)) else r
  }

  private def ringSegs(open: Array[Double]): Array[(Double, Double, Double, Double)] = {
    val n = open.length / 2
    Array.tabulate(n) { i =>
      val j = (i + 1) % n
      (open(2 * i), open(2 * i + 1), open(2 * j), open(2 * j + 1))
    }
  }

  private def ringSimple(r: Array[Double]): Boolean = {
    val o = openRing(r)
    val n = o.length / 2
    if (n < 3) return false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val l = (i + 2) % n
      // duplicate consecutive vertices (zero-length segment)
      if (o(2 * i) == o(2 * j) && o(2 * i + 1) == o(2 * j + 1)) return false
      // spike: three consecutive collinear vertices doubling back
      val cross = (o(2 * j) - o(2 * i)) * (o(2 * l + 1) - o(2 * j + 1)) -
        (o(2 * j + 1) - o(2 * i + 1)) * (o(2 * l) - o(2 * j))
      val dot = (o(2 * j) - o(2 * i)) * (o(2 * l) - o(2 * j)) +
        (o(2 * j + 1) - o(2 * i + 1)) * (o(2 * l + 1) - o(2 * j + 1))
      if (cross == 0.0 && dot < 0.0) return false
      i += 1
    }
    if (math.abs(shoelace(o)) == 0.0) return false
    // non-adjacent segment pairs may neither cross nor touch (a
    // figure-eight self-touch makes the ring non-simple). O(n^2) per ring,
    // the same per-row kernel bound as every other predicate here.
    val segs = ringSegs(o)
    i = 0
    while (i < n) {
      var j = i + 2
      val jMax = if (i == 0) n - 1 else n
      while (j < jMax) {
        if (segsCross(segs(i), segs(j))) return false
        j += 1
      }
      i += 1
    }
    true
  }

  private def polygonValid(g: Geom): Boolean = {
    if (!g.rings.forall(ringSimple)) return false
    val shell = Geom(3, Array(g.rings(0)))
    val shellSegs = ringSegs(openRing(g.rings(0)))
    val holes = g.rings.drop(1)
    val holeOk = holes.forall { h =>
      val o = openRing(h)
      val inShell = (0 until o.length / 2).forall(i => inside(shell, o(2 * i), o(2 * i + 1)))
      inShell && !ringSegs(o).exists(hs => shellSegs.exists(ss => segsCross(hs, ss)))
    }
    if (!holeOk) return false
    // holes pairwise disjoint: no vertex of one inside another, no crossing
    holes.indices.forall { i =>
      val hi = Geom(3, Array(holes(i)))
      val si = ringSegs(openRing(holes(i)))
      (i + 1 until holes.length).forall { j =>
        val hj = Geom(3, Array(holes(j)))
        val oj = openRing(holes(j)); val oi = openRing(holes(i))
        val vIn = (0 until oj.length / 2).exists(k => inside(hi, oj(2 * k), oj(2 * k + 1))) ||
          (0 until oi.length / 2).exists(k => inside(hj, oi(2 * k), oi(2 * k + 1)))
        !vIn && !ringSegs(oj).exists(hs => si.exists(ss => segsCross(hs, ss)))
      }
    }
  }

  /** Combine members into one geometry (backing st_collect_agg):
    * homogeneous simple members -> the matching MULTI, anything else ->
    * GEOMETRYCOLLECTION. Members are sorted by their WKT (lexicographic) so
    * the result is canonical regardless of aggregation order.
    */
  def collect(members: Array[Array[Byte]]): Array[Byte] = {
    val parsed = members.map(parse).sortBy(wktOf)
    val kinds = parsed.map(_.kind).distinct
    if (kinds.length == 1 && kinds(0) <= 3)
      writeGeom(Geom(kinds(0) + 3, Array.empty, parsed))
    else writeGeom(Geom(7, Array.empty, parsed))
  }

  // ---- overlay (axis-aligned scope) ---------------------------------------------

  /** True when g is a hole-free polygon whose single ring traces an
    * axis-aligned rectangle (4 corners, closed or open ring).
    */
  private def asAxisRect(g: Geom): Option[(Double, Double, Double, Double)] = {
    if (g.kind != 3 || g.rings.length != 1) return None
    val r = g.rings(0)
    val n = r.length / 2
    val m = if (n >= 2 && r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)) n - 1 else n
    if (m != 4) return None
    val xs = (0 until m).map(i => r(2 * i)).distinct.sorted
    val ys = (0 until m).map(i => r(2 * i + 1)).distinct.sorted
    if (xs.length != 2 || ys.length != 2) return None
    // every corner of the rectangle spanned by (xs, ys) appears exactly once
    val corners = (0 until m).map(i => (r(2 * i), r(2 * i + 1))).toSet
    if (corners != Set((xs(0), ys(0)), (xs(0), ys(1)), (xs(1), ys(0)), (xs(1), ys(1))))
      return None
    Some((xs(0), ys(0), xs(1), ys(1)))
  }

  /** Polygon intersection, total on simple pairs — holes included (r14:
    * each side decomposes to hole-free disjoint pieces first, so donut
    * parcels clip exactly).
    * Axis-aligned rectangle pairs take the exact interval-arithmetic path
    * (edge/corner contact yields the degenerate shared rectangle, matching
    * boundary-inclusive st_intersects); a pair with a convex side clips
    * with Sutherland–Hodgman in one piece; a concave-concave pair clips
    * per ear triangle of the clip side, returning a MULTIPOLYGON of
    * disjoint-interior pieces (members share triangulation edges — the
    * area/extent/centroid algebra is exact; the minimal outline is not
    * traced, documented). A concave SUBJECT against one convex piece can
    * return a disconnected result as one polygon with zero-width connector
    * edges, whose area algebra is still exact because connectors cancel.
    * NULL when disjoint or touching boundary-only (no EMPTY geometry —
    * declared; PostGIS returns POLYGON EMPTY / a lower-dimensional
    * geometry).
    */
  def intersection(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val a = parse(wa); val b = parse(wb)
    // EMPTY inputs (r14): X ∩ ∅ = ∅ -> NULL (the engine's empty-result
    // convention, declared)
    if (isEmptyG(a) || isEmptyG(b)) return null
    (asAxisRect(a), asAxisRect(b)) match {
      case (Some((ax1, ay1, ax2, ay2)), Some((bx1, by1, bx2, by2))) =>
        val x1 = math.max(ax1, bx1); val y1 = math.max(ay1, by1)
        val x2 = math.min(ax2, bx2); val y2 = math.min(ay2, by2)
        if (x1 > x2 || y1 > y2) null else makeEnvelope(x1, y1, x2, y2)
      case _ if a.rings.length == 1 && b.rings.length == 1 =>
        val (subj, clip) = clipPair(a, b, "st_intersection")
        piecesToWkb(clipRings(clip).flatMap { t =>
          val p = clipConvex(subj, t)
          if (p.length >= 6 && math.abs(shoelace(p)) > 0.0) Some(p) else None
        })
      case _ =>
        // holed pair (r14): A ∩ B over the hole-free piece decompositions —
        // (∪ pa) ∩ (∪ pb) = ∪ (pa ∩ pb), interiors disjoint on both sides
        piecesToWkb(intersectPieces(
          polygonPieces(a, "st_intersection"), b, "st_intersection"))
    }
  }

  private def closeRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val closed = java.util.Arrays.copyOf(r, 2 * n + 2)
    closed(2 * n) = r(0); closed(2 * n + 1) = r(1)
    closed
  }

  /** Piece rings -> NULL / POLYGON / MULTIPOLYGON (members may share
    * edges — interiors are disjoint, which the area/extent algebra needs).
    */
  private def piecesToWkb(pieces: Seq[Array[Double]]): Array[Byte] =
    if (pieces.isEmpty) null
    else if (pieces.length == 1) writeGeom(Geom(3, Array(closeRing(pieces.head))))
    else writeGeom(Geom(6, Array.empty,
      pieces.map(p => Geom(3, Array(closeRing(p)))).toArray))

  // ---- general convex clipping (Sutherland–Hodgman, r13) -------------------------

  /** Shell of a hole-free polygon as an OPEN CCW ring (closing duplicate
    * dropped, orientation normalized) — the form the clipping kernel works
    * in.
    */
  private def openShellCcw(g: Geom, fn: String): Array[Double] = {
    if (g.kind != 3) fail(s"$fn expects POLYGON arguments")
    if (g.rings.length != 1)
      fail(s"$fn supports hole-free polygons (declared scope)")
    val r = g.rings(0)
    val n = r.length / 2
    val closed = n >= 2 && r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)
    val m = if (closed) n - 1 else n
    if (m < 3) fail(s"$fn: degenerate polygon (${m} distinct vertices)")
    val open = java.util.Arrays.copyOf(r, 2 * m)
    if (shoelace(open) >= 0) open
    else {
      val rev = new Array[Double](2 * m)
      var i = 0
      while (i < m) {
        rev(2 * i) = open(2 * (m - 1 - i)); rev(2 * i + 1) = open(2 * (m - 1 - i) + 1)
        i += 1
      }
      rev
    }
  }

  /** Convexity of an open CCW ring: every turn is left-or-straight. */
  private def isConvexRing(r: Array[Double]): Boolean = {
    val n = r.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cross = (r(2 * j) - r(2 * i)) * (r(2 * k + 1) - r(2 * j + 1)) -
        (r(2 * j + 1) - r(2 * i + 1)) * (r(2 * k) - r(2 * j))
      if (cross < 0) return false
      i += 1
    }
    true
  }

  /** Ear-clipping triangulation of a simple open CCW ring (r13): repeatedly
    * remove a convex vertex whose ear triangle contains no other remaining
    * vertex. O(n^2) per ring — a per-row kernel like every predicate here.
    * Triangulating the CLIP side turns concave-concave overlay into a fold
    * of the convex Sutherland-Hodgman kernel (piece interiors disjoint
    * because the triangles are), so intersection/difference/union stay
    * EXACT in area/extent for any simple hole-free pair; the price is a
    * non-minimal output (edge-sharing MULTIPOLYGON members), documented.
    */
  private def triangulate(ring: Array[Double]): Seq[Array[Double]] = {
    val n0 = ring.length / 2
    if (n0 < 3) return Nil
    if (n0 == 3) return Seq(ring)
    val idx = scala.collection.mutable.ArrayBuffer.tabulate(n0)(identity)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def x(i: Int) = ring(2 * i); def y(i: Int) = ring(2 * i + 1)
    def cross(a: Int, b: Int, c: Int): Double =
      (x(b) - x(a)) * (y(c) - y(a)) - (y(b) - y(a)) * (x(c) - x(a))
    def inTri(a: Int, b: Int, c: Int, p: Int): Boolean = {
      val d1 = cross(a, b, p); val d2 = cross(b, c, p); val d3 = cross(c, a, p)
      d1 >= 0 && d2 >= 0 && d3 >= 0 // boundary-inclusive for a CCW ear
    }
    while (idx.length > 3) {
      val m = idx.length
      var earAt = -1
      var i = 0
      while (earAt < 0 && i < m) {
        val a = idx((i + m - 1) % m); val b = idx(i); val c = idx((i + 1) % m)
        if (cross(a, b, c) > 0) {
          var blocked = false
          var j = 0
          while (!blocked && j < m) {
            val p = idx(j)
            if (p != a && p != b && p != c && inTri(a, b, c, p)) blocked = true
            j += 1
          }
          if (!blocked) earAt = i
        }
        i += 1
      }
      if (earAt < 0) {
        // numeric tie on a degenerate (collinear) vertex: drop one zero-area
        // corner to make progress; a simple ring always has an ear otherwise
        val flat = (0 until m).find { i2 =>
          cross(idx((i2 + m - 1) % m), idx(i2), idx((i2 + 1) % m)) == 0
        }.getOrElse(fail("triangulate: no ear found (self-intersecting ring?)"))
        idx.remove(flat)
      } else {
        val a = idx((earAt + m - 1) % m); val b = idx(earAt); val c = idx((earAt + 1) % m)
        out += Array(x(a), y(a), x(b), y(b), x(c), y(c))
        idx.remove(earAt)
      }
    }
    val Seq(a, b, c) = idx.toSeq
    if (cross(a, b, c) != 0) out += Array(x(a), y(a), x(b), y(b), x(c), y(c))
    out.toSeq
  }

  /** Convex-or-triangulated clip rings for the overlay path: a convex
    * argument clips in one piece; a concave one clips per ear triangle.
    */
  private def clipRings(r: Array[Double]): Seq[Array[Double]] =
    if (isConvexRing(r)) Seq(r) else triangulate(r)

  /** pieces − one simple ring, via the triangulated convex-diff kernel;
    * shared explosion guard for every overlay fold.
    */
  private def subtractRing(pieces: Seq[Array[Double]], ring: Array[Double],
      fn: String): Seq[Array[Double]] = {
    var cur = pieces
    clipRings(ring).foreach { t =>
      cur = cur.flatMap(p => diffConvexRing(p, t))
      if (cur.length > 4096)
        fail(s"$fn: piece explosion (> 4096) — inputs too complex for the " +
          "triangulated overlay scope; st_simplify or st_convexhull can coarsen")
    }
    cur
  }

  /** Decompose a (possibly holed) polygon into disjoint-interior hole-free
    * piece rings: shell minus each hole ring, the same fold
    * st_pointonsurface ships (r13), promoted to the overlay entry points —
    * r14 brings POLYGONS WITH HOLES into the total overlay scope.
    */
  private def polygonPieces(g: Geom, fn: String): Seq[Array[Double]] = {
    if (g.kind != 3) fail(s"$fn expects POLYGON arguments")
    var pieces: Seq[Array[Double]] =
      Seq(openShellCcw(Geom(3, Array(g.rings(0))), fn))
    g.rings.drop(1).foreach { h =>
      pieces = subtractRing(pieces, openShellCcw(Geom(3, Array(h)), fn), fn)
    }
    pieces
  }

  /** pieces ∩ one (possibly holed) polygon: fold each piece through the
    * clip side's hole-free decomposition. Interiors stay disjoint (clip
    * pieces are disjoint; subject pieces are disjoint).
    */
  private def intersectPieces(pieces: Seq[Array[Double]], clip: Geom,
      fn: String): Seq[Array[Double]] = {
    val out = for {
      pc <- polygonPieces(clip, fn)
      t <- clipRings(pc)
      pa <- pieces
      p = clipConvex(pa, t)
      if p.length >= 6 && math.abs(shoelace(p)) > 0.0
    } yield p
    if (out.length > 4096)
      fail(s"$fn: piece explosion (> 4096) — inputs too complex for the " +
        "triangulated overlay scope; st_simplify or st_convexhull can coarsen")
    out
  }

  /** Resolve (subject, clip) for the general overlay path; the convex
    * argument (if any) becomes the clip to keep the common case one piece.
    */
  private def clipPair(a: Geom, b: Geom, fn: String): (Array[Double], Array[Double]) = {
    val ra = openShellCcw(a, fn); val rb = openShellCcw(b, fn)
    if (isConvexRing(rb)) (ra, rb)
    else if (isConvexRing(ra)) (rb, ra)
    else (ra, rb)
  }

  /** One Sutherland–Hodgman step: keep the part of `subj` on the left of
    * (closed, boundary-inclusive) the directed line a->b.
    */
  private def clipHalfPlane(subj: Array[Double], ax: Double, ay: Double,
      bx: Double, by: Double): Array[Double] = {
    val n = subj.length / 2
    if (n == 0) return subj
    val out = new scala.collection.mutable.ArrayBuffer[Double](2 * n + 4)
    def side(x: Double, y: Double): Double = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val cx = subj(2 * i); val cy = subj(2 * i + 1)
      val dx = subj(2 * j); val dy = subj(2 * j + 1)
      val sc = side(cx, cy); val sd = side(dx, dy)
      if (sc >= 0) { out += cx; out += cy }
      if ((sc > 0 && sd < 0) || (sc < 0 && sd > 0)) {
        val t = sc / (sc - sd)
        out += cx + t * (dx - cx); out += cy + t * (dy - cy)
      }
      i += 1
    }
    dedupRing(out.toArray)
  }

  /** Drop consecutive duplicate vertices (clip lines through a vertex emit
    * it twice); keeps the ring open.
    */
  private def dedupRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    if (n == 0) return r
    val out = new scala.collection.mutable.ArrayBuffer[Double](r.length)
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (r(2 * i) != r(2 * j) || r(2 * i + 1) != r(2 * j + 1)) {
        out += r(2 * i); out += r(2 * i + 1)
      }
      i += 1
    }
    out.toArray
  }

  /** Clip `subj` against every edge of the convex CCW `clip` ring. */
  private def clipConvex(subj: Array[Double], clip: Array[Double]): Array[Double] = {
    val n = clip.length / 2
    var cur = subj
    var i = 0
    while (i < n && cur.length >= 6) {
      val j = (i + 1) % n
      cur = clipHalfPlane(cur, clip(2 * i), clip(2 * i + 1), clip(2 * j), clip(2 * j + 1))
      i += 1
    }
    cur
  }

  /** subject − one CONVEX clip ring: the complement of a convex region
    * decomposes into the half-planes outside each edge, so the difference
    * is the disjoint pieces
    *   piece_i = subject ∩ outside(edge_i) ∩ inside(edge_0..i-1),
    * each computed by the same Sutherland–Hodgman kernel — exact.
    */
  private def diffConvexRing(subj: Array[Double], clip: Array[Double]): Seq[Array[Double]] = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var inside = subj
    val n = clip.length / 2
    var i = 0
    while (i < n && inside.length >= 6) {
      val j = (i + 1) % n
      val ax = clip(2 * i); val ay = clip(2 * i + 1)
      val bx = clip(2 * j); val by = clip(2 * j + 1)
      // outside of a CCW edge = right side = left of the REVERSED edge
      val piece = clipHalfPlane(inside, bx, by, ax, ay)
      if (piece.length >= 6 && math.abs(shoelace(piece)) > 0.0) pieces += piece
      inside = clipHalfPlane(inside, ax, ay, bx, by)
      i += 1
    }
    pieces.toSeq
  }

  /** subject − clip piece rings; a concave clip subtracts per ear triangle
    * (A − (T1 ∪ … ∪ Tn) = (…(A − T1) − …) − Tn, order-independent).
    * Holed inputs (r14): with A = Sa − Ha and B = Sb − Hb,
    *   A − B = (A − Sb) ∪ (A ∩ Hb_1) ∪ … ∪ (A ∩ Hb_m)
    * — what B's holes exclude from B, A keeps. The unions are disjoint
    * (outside Sb vs inside distinct holes of Sb), so the piece interiors
    * stay disjoint and the area/extent algebra stays exact.
    */
  private def diffRings(a: Geom, b: Geom, fn: String): Seq[Array[Double]] = {
    val aPieces = polygonPieces(a, fn)
    if (b.kind != 3) fail(s"$fn expects POLYGON arguments")
    val outsideShell = subtractRing(aPieces,
      openShellCcw(Geom(3, Array(b.rings(0))), fn), fn)
    val inHoles = b.rings.drop(1).toSeq.flatMap { h =>
      intersectPieces(aPieces, Geom(3, Array(h)), fn)
    }
    outsideShell ++ inHoles
  }

  /** Polygon difference subject − clip (r13; r14: holes in scope on both
    * sides): exact for any simple pair — a convex clip subtracts via
    * half-plane decomposition, a concave clip per ear triangle, holes
    * decompose per [[diffRings]]. Returns the subject's piece decomposition
    * when disjoint, one POLYGON or a MULTIPOLYGON of disjoint-interior
    * pieces otherwise, and NULL when the subject is fully covered (no
    * EMPTY geometry — declared).
    */
  def difference(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val a = parse(wa); val b = parse(wb)
    // EMPTY inputs (r14): ∅ − X = ∅ -> NULL; X − ∅ = X unchanged
    if (isEmptyG(a)) return null
    if (isEmptyG(b)) return wa
    piecesToWkb(diffRings(a, b, "st_difference"))
  }

  /** Union of two simple polygons, holes included (r13: total on
    * hole-free; r14: holed). Axis-aligned
    * rectangle pairs keep their exact closed forms — covering rectangle
    * under containment or full-edge tiling, a two-member MULTIPOLYGON when
    * interiors are disjoint (a corner touch is OGC-valid; a partial shared
    * edge technically is not, but the area/extent algebra over it is
    * exact, which is what this scope serves). Every other pair — including
    * partially overlapping rectangles and concave-concave — returns the
    * exact-area decomposition (a − b pieces) + b: interiors disjoint, so
    * st_area/st_xmin/etc. over the result are exact; the outline is NOT
    * traced (members share edges, documented).
    */
  def union(wa: Array[Byte], wb: Array[Byte]): Array[Byte] = {
    val a = parse(wa); val b = parse(wb)
    // EMPTY inputs (r14): the other side unchanged; both empty -> NULL
    if (isEmptyG(a) && isEmptyG(b)) return null
    if (isEmptyG(a)) return wb
    if (isEmptyG(b)) return wa
    (asAxisRect(a), asAxisRect(b)) match {
      case (Some((ax1, ay1, ax2, ay2)), Some((bx1, by1, bx2, by2))) =>
        val aCoversB = ax1 <= bx1 && ay1 <= by1 && ax2 >= bx2 && ay2 >= by2
        val bCoversA = bx1 <= ax1 && by1 <= ay1 && bx2 >= ax2 && by2 >= ay2
        val interiorsDisjoint = ax2 <= bx1 || bx2 <= ax1 || ay2 <= by1 || by2 <= ay1
        val tiles =
          ((ax2 == bx1 || bx2 == ax1) && ay1 == by1 && ay2 == by2) ||
            ((ay2 == by1 || by2 == ay1) && ax1 == bx1 && ax2 == bx2)
        if (aCoversB) makeEnvelope(ax1, ay1, ax2, ay2)
        else if (bCoversA) makeEnvelope(bx1, by1, bx2, by2)
        else if (tiles) makeEnvelope(math.min(ax1, bx1), math.min(ay1, by1),
          math.max(ax2, bx2), math.max(ay2, by2))
        else if (interiorsDisjoint) writeGeom(Geom(6, Array.empty, Array(a, b)))
        else generalUnion(a, b)
      case _ => generalUnion(a, b)
    }
  }

  /** Fold one polygon (or multipolygon) into a disjoint-interior piece list
    * — the incremental union step backing st_union_agg (r14):
    * U ∪ P = (U − P) ⊎ pieces(P). Non-polygon input fails loudly.
    */
  def unionPieces(pieces: Seq[Array[Double]], poly: Array[Byte]): Seq[Array[Double]] = {
    val g = parse(poly)
    if (isEmptyG(g)) return pieces
    val members = simples(g)
    if (members.exists(_.kind != 3))
      fail("st_union/st_union_agg expects POLYGON/MULTIPOLYGON inputs")
    members.foldLeft(pieces) { (acc, p) =>
      val pp = polygonPieces(p, "st_union_agg")
      pp.foldLeft(acc)((a, r) => subtractRing(a, r, "st_union_agg")) ++ pp
    }
  }

  /** Disjoint piece list -> NULL / POLYGON / MULTIPOLYGON (st_union_agg
    * evaluate; the same edge-sharing decomposition contract as st_union).
    */
  def pieceUnionWkb(pieces: Seq[Array[Double]]): Array[Byte] = piecesToWkb(pieces)

  /** pieces − one hole-free CCW piece ring (st_union_agg merge step). */
  def subtractPieceRing(pieces: Seq[Array[Double]],
      ring: Array[Double]): Seq[Array[Double]] =
    subtractRing(pieces, ring, "st_union_agg")

  private def generalUnion(a: Geom, b: Geom): Array[Byte] = {
    // A ∪ B = (A − B) ⊎ B when B is one holed polygon (B rides along
    // AS-IS, its holes stay holes — fewest pieces); MULTIPOLYGON operands
    // (r14, e.g. chained unions) fold both sides through the
    // disjoint-piece union instead. Area/extent stay exact either way.
    if (a.kind == 3 && b.kind == 3) {
      val pieces = diffRings(a, b, "st_union")
      val bMember = Geom(3, b.rings)
      if (pieces.isEmpty) writeGeom(bMember) // a ⊆ b
      else writeGeom(Geom(6, Array.empty,
        pieces.map(p => Geom(3, Array(closeRing(p)))).toArray :+ bMember))
    } else
      piecesToWkb(unionPieces(unionPieces(Seq.empty, writeGeom(a)), writeGeom(b)))
  }

  // ---- conversions & structure accessors (r14 tranche 2) --------------------

  /** Geometry values ARE standard little-endian WKB in this engine, so the
    * WKB conversions are identity / hex codecs (DuckDB ST_AsWKB /
    * ST_GeomFromWKB / the HEXWKB pair).
    */
  def asWkb(wkb: Array[Byte]): Array[Byte] = { parseCurved(wkb); wkb }

  def fromWkb(bytes: Array[Byte]): Array[Byte] = {
    // re-encode (validates, normalizes endianness/EWKB headers to the
    // engine's canonical little-endian form)
    writeGeom(parseCurved(bytes))
  }

  def asHexWkb(wkb: Array[Byte]): UTF8String = {
    parseCurved(wkb)
    val sb = new java.lang.StringBuilder(wkb.length * 2)
    wkb.foreach(b => sb.append(f"${b & 0xff}%02X"))
    UTF8String.fromString(sb.toString)
  }

  def fromHexWkb(hex: UTF8String): Array[Byte] = {
    val s = hex.toString
    if (s.length % 2 != 0) fail("st_geomfromhexwkb: odd-length hex string")
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    fromWkb(out)
  }

  /** Topological dimension: point 0, line 1, polygon 2; multis take the
    * max over members (PostGIS ST_Dimension). EMPTY fails loudly.
    */
  def dimension(wkb: Array[Byte]): Int = {
    val g = parse(wkb)
    if (isEmptyG(g)) fail("st_dimension: EMPTY geometry")
    def dim(g0: Geom): Int = g0.kind match {
      case 1 | 4 => 0
      case 2 | 5 => 1
      case 3 | 6 => 2
      case _ => g0.parts.map(dim).max
    }
    dim(g)
  }

  /** Closed: first vertex equals last (linestrings; per-member for
    * multilinestrings; points and polygons are closed by definition,
    * PostGIS ST_IsClosed).
    */
  def isClosed(wkb: Array[Byte]): Boolean = {
    def cl(g: Geom): Boolean = g.kind match {
      case 1 | 3 => true
      case 2 =>
        if (g.rings.isEmpty) fail("st_isclosed: EMPTY geometry")
        val r = g.rings(0)
        val n = r.length / 2
        n >= 2 && r(0) == r(2 * (n - 1)) && r(1) == r(2 * (n - 1) + 1)
      case _ =>
        if (g.parts.isEmpty) fail("st_isclosed: EMPTY geometry")
        g.parts.forall(cl)
    }
    cl(parse(wkb))
  }

  /** Ring: a closed linestring whose segments are simple (no
    * self-intersection beyond the closing vertex) — PostGIS ST_IsRing.
    */
  def isRing(wkb: Array[Byte]): Boolean = {
    val g = parse(wkb)
    if (g.kind != 2) fail("st_isring expects a LINESTRING")
    if (!isClosed(wkb)) return false
    // simplicity: treat the closed line as a polygon ring and reuse the
    // polygon-ring validity walk (proper self-crossings reject)
    val r = g.rings(0)
    val n = r.length / 2
    if (n < 4) return false // a ring needs >= 3 distinct vertices + closure
    isValid(writeGeom(Geom(3, Array(r))))
  }

  /** LINESTRING ring (closed) -> POLYGON; optional hole rings (PostGIS
    * ST_MakePolygon single-arg form).
    */
  def makePolygon(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (g.kind != 2) fail("st_makepolygon expects a LINESTRING shell")
    if (!isClosed(wkb)) fail("st_makepolygon: shell must be closed")
    if (g.rings(0).length / 2 < 4) fail("st_makepolygon: shell needs >= 3 distinct vertices")
    writeGeom(Geom(3, Array(g.rings(0).clone())))
  }

  /** Wrap a simple geometry in its MULTI form (PostGIS ST_Multi); multis
    * and collections pass through unchanged.
    */
  def multi(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    g.kind match {
      case 1 | 2 | 3 => writeGeom(Geom(g.kind + 3, Array.empty, Array(g)))
      case _ => wkb
    }
  }

  /** The simple members of a geometry, in order (PostGIS ST_Dump without
    * the path column) — explode the result for per-member rows.
    */
  def dump(wkb: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      simples(parse(wkb)).map(writeGeom).toArray[Any])

  /** Scalar ST_Collect over a LIST of geometries (DuckDB's list form) —
    * same combine as the aggregate, null elements skipped, NULL for an
    * all-null/empty list.
    */
  def collectList(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val members = (0 until arr.numElements())
      .filterNot(arr.isNullAt)
      .map(arr.getBinary)
      .toArray
    if (members.isEmpty) null else collect(members)
  }

  /** Bounding-box-only intersects (DuckDB ST_Intersects_Extent): the cheap
    * pre-filter — true whenever the envelopes overlap, regardless of the
    * exact geometries.
    */
  def intersectsExtent(wa: Array[Byte], wb: Array[Byte]): Boolean = {
    val a = parse(wa); val b = parse(wb)
    if (isEmptyG(a) || isEmptyG(b)) return false
    val (ax1, ax2) = { val xs = a.vertices.map(_._1).toSeq; (xs.min, xs.max) }
    val (ay1, ay2) = { val ys = a.vertices.map(_._2).toSeq; (ys.min, ys.max) }
    val (bx1, bx2) = { val xs = b.vertices.map(_._1).toSeq; (xs.min, xs.max) }
    val (by1, by2) = { val ys = b.vertices.map(_._2).toSeq; (ys.min, ys.max) }
    ax1 <= bx2 && bx1 <= ax2 && ay1 <= by2 && by1 <= ay2
  }

  /** Snap coordinates to a precision grid with round-half-even (GEOS
    * ReducePrecision's deterministic core; "+ 0.0" strips -0.0 so the
    * driver's byte-hash never sees a signed zero).
    */
  def reducePrecision(wkb: Array[Byte], grid: Double): Array[Byte] = {
    if (grid <= 0) fail("st_reduceprecision: grid size must be > 0")
    writeGeom(mapCoords(parse(wkb))((x, y) =>
      (math.rint(x / grid) * grid + 0.0, math.rint(y / grid) * grid + 0.0)))
  }

  /** Bing-maps quadkey of a lon/lat POINT at `level` (DuckDB ST_QuadKey):
    * Web Mercator tile walk, one base-4 digit per level.
    */
  def quadKey(wkb: Array[Byte], level: Int): UTF8String = {
    if (level < 1 || level > 23) fail(s"st_quadkey: level must be in [1, 23], got $level")
    val g = parse(wkb)
    if (g.kind != 1 || g.rings.isEmpty) fail("st_quadkey expects a POINT")
    val lon = g.rings(0)(0); val lat = g.rings(0)(1)
    if (lon < -180 || lon > 180 || lat < -85.05112878 || lat > 85.05112878)
      fail(s"st_quadkey: ($lon, $lat) outside Web Mercator bounds")
    val sinLat = math.sin(lat * math.Pi / 180)
    val n = 1L << level
    val tx = math.min(n - 1, math.max(0L, ((lon + 180) / 360 * n).toLong))
    val ty = math.min(n - 1, math.max(0L,
      ((0.5 - math.log((1 + sinLat) / (1 - sinLat)) / (4 * math.Pi)) * n).toLong))
    val sb = new java.lang.StringBuilder(level)
    var i = level - 1
    while (i >= 0) {
      var digit = 0
      if (((tx >> i) & 1) != 0) digit += 1
      if (((ty >> i) & 1) != 0) digit += 2
      sb.append(digit)
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Hilbert-curve index of a geometry's bbox center within `box`, 16 bits
    * per axis (DuckDB ST_Hilbert(geom, box) shape): spatially-close inputs
    * get close indices — the ORDER BY key for locality clustering, a
    * curve with better locality than the Morton/Z-order in
    * [[graft.plans.ZOrder]].
    */
  def hilbert(wkb: Array[Byte], box: Array[Byte]): Long = {
    val g = parse(wkb)
    if (isEmptyG(g)) fail("st_hilbert: EMPTY geometry")
    val bxs = parse(box).vertices.map(_._1).toSeq
    val bys = parse(box).vertices.map(_._2).toSeq
    val (x1, x2) = (bxs.min, bxs.max); val (y1, y2) = (bys.min, bys.max)
    if (x2 <= x1 || y2 <= y1) fail("st_hilbert: degenerate bounds box")
    val xs = g.vertices.map(_._1).toSeq; val ys = g.vertices.map(_._2).toSeq
    val cx = (xs.min + xs.max) / 2; val cy = (ys.min + ys.max) / 2
    val order = 16
    val n = 1L << order
    def clampCell(v: Double, lo: Double, hi: Double): Long =
      math.min(n - 1, math.max(0L, ((v - lo) / (hi - lo) * n).toLong))
    var x = clampCell(cx, x1, x2)
    var y = clampCell(cy, y1, y2)
    // standard xy -> d walk with quadrant rotation
    var rx = 0L; var ry = 0L; var d = 0L
    var s = n / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Merge a (multi)linestring's members into maximal lines by stitching
    * shared endpoints (PostGIS ST_LineMerge): chains join only where
    * exactly two member-ends meet (junction vertices stay split, like
    * GEOS). Returns LINESTRING when one chain remains, else
    * MULTILINESTRING in canonical order.
    */
  def lineMerge(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    val lines = simples(g).filter(m => m.kind == 2 && m.rings.nonEmpty)
    if (lines.isEmpty) fail("st_linemerge expects (MULTI)LINESTRING input")
    type Pt = (Double, Double)
    // endpoint degree: how many member-ends meet at each vertex
    val degree = scala.collection.mutable.HashMap.empty[Pt, Int]
    def ends(r: Array[Double]): (Pt, Pt) = {
      val n = r.length / 2
      ((r(0), r(1)), (r(2 * (n - 1)), r(2 * (n - 1) + 1)))
    }
    lines.foreach { m =>
      val (a, b) = ends(m.rings(0))
      degree(a) = degree.getOrElse(a, 0) + 1
      degree(b) = degree.getOrElse(b, 0) + 1
    }
    val unused = scala.collection.mutable.ArrayBuffer.from(lines.map(_.rings(0)))
    def rev(r: Array[Double]): Array[Double] = {
      val n = r.length / 2
      val out = new Array[Double](r.length)
      var i = 0
      while (i < n) {
        out(2 * i) = r(2 * (n - 1 - i)); out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
        i += 1
      }
      out
    }
    val chains = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    while (unused.nonEmpty) {
      var chain = unused.remove(0)
      var grew = true
      while (grew) {
        grew = false
        val (_, tail) = ends(chain)
        // extend forward through a degree-2 joint
        if (degree(tail) == 2) {
          val i = unused.indexWhere { r =>
            val (a, b) = ends(r); a == tail || b == tail
          }
          if (i >= 0) {
            val nxt = unused.remove(i)
            val (a, _) = ends(nxt)
            val seg = if (a == tail) nxt else rev(nxt)
            chain = chain ++ seg.drop(2)
            grew = true
          }
        }
        if (!grew) {
          val (head, _) = ends(chain)
          if (degree(head) == 2) {
            val i = unused.indexWhere { r =>
              val (a, b) = ends(r); a == head || b == head
            }
            if (i >= 0) {
              val nxt = unused.remove(i)
              val (_, b) = ends(nxt)
              val seg = if (b == head) nxt else rev(nxt)
              chain = seg ++ chain.drop(2)
              grew = true
            }
          }
        }
      }
      chains += chain
    }
    if (chains.length == 1) writeGeom(Geom(2, Array(chains.head)))
    else {
      val ordered = chains.sortBy(r => (r(0), r(1))).toArray
      writeGeom(Geom(5, Array.empty, ordered.map(r => Geom(2, Array(r)))))
    }
  }

  /** st_curvetoline (r14): linearize curve kinds into the linear kernel's
    * types — CIRCULARSTRING -> LINESTRING, COMPOUNDCURVE -> LINESTRING,
    * CURVEPOLYGON -> POLYGON, MULTICURVE -> MULTILINESTRING, MULTISURFACE
    * -> MULTIPOLYGON; linear kinds pass through unchanged. Each arc triple
    * (p0, p1, p2) sweeps its circumcircle from p0 through p1 to p2 with
    * `quadSegs` chords per quarter circle (PostGIS ST_CurveToLine
    * semantics; default 8); collinear triples emit straight segments;
    * p0 == p2 sweeps the full circle. Arc endpoints are the ORIGINAL
    * control points bit-exactly, so compound joints stay watertight.
    */
  def curveToLine(wkb: Array[Byte], quadSegs: Int): Array[Byte] = {
    if (quadSegs < 1) fail(s"st_curvetoline quad_segs must be >= 1, got $quadSegs")
    writeGeom(linearize(parseCurved(wkb), quadSegs))
  }

  def curveToLine(wkb: Array[Byte]): Array[Byte] = curveToLine(wkb, 8)

  private def linearize(g: Geom, quadSegs: Int): Geom = g.kind match {
    case 8 =>
      if (g.rings.isEmpty) Geom(2, Array.empty)
      else Geom(2, Array(arcPoints(g.rings(0), quadSegs)))
    case 9 =>
      if (g.parts.isEmpty) Geom(2, Array.empty)
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Double]
        g.parts.foreach { p =>
          val pts = linearize(p, quadSegs).rings.headOption.getOrElse(Array.empty[Double])
          // drop the duplicated joint vertex between consecutive pieces
          val from = if (out.length >= 2 && pts.length >= 2 &&
            out(out.length - 2) == pts(0) && out(out.length - 1) == pts(1)) 2 else 0
          var i = from
          while (i < pts.length) { out += pts(i); i += 1 }
        }
        Geom(2, Array(out.toArray))
      }
    case 10 =>
      if (g.parts.isEmpty) Geom(3, Array.empty)
      else Geom(3, g.parts.map { r =>
        val l = linearize(r, quadSegs)
        if (l.rings.isEmpty) fail("st_curvetoline: empty CURVEPOLYGON ring")
        l.rings(0)
      })
    case 11 => Geom(5, Array.empty, g.parts.map(linearize(_, quadSegs)))
    case 12 => Geom(6, Array.empty, g.parts.map(linearize(_, quadSegs)))
    case k if k >= 4 => Geom(k, g.rings, g.parts.map(linearize(_, quadSegs)))
    case _ => g
  }

  private def arcPoints(c: Array[Double], quadSegs: Int): Array[Double] = {
    val np = c.length / 2
    if (np < 3 || np % 2 == 0)
      fail(s"CIRCULARSTRING needs an odd number of points >= 3, got $np")
    val out = scala.collection.mutable.ArrayBuffer[Double](c(0), c(1))
    var i = 0
    while (i + 2 < np) {
      val ax = c(2 * i); val ay = c(2 * i + 1)
      val bx = c(2 * i + 2); val by = c(2 * i + 3)
      val cx = c(2 * i + 4); val cy = c(2 * i + 5)
      val d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      if (ax == cx && ay == cy && (ax != bx || ay != by)) {
        // closed arc (p0 == p2): a FULL circle with p1 diametrically
        // opposite p0 (PostGIS convention), swept CCW
        val ux = (ax + bx) / 2; val uy = (ay + by) / 2
        val r = math.hypot(ax - ux, ay - uy)
        val a0 = math.atan2(ay - uy, ax - ux)
        val nSeg = math.max(4, 4 * quadSegs)
        var k = 1
        while (k < nSeg) {
          val a = a0 + 2 * math.Pi * k / nSeg
          out += ux + r * math.cos(a); out += uy + r * math.sin(a)
          k += 1
        }
        out += cx; out += cy
      } else if (d == 0.0) {
        // collinear arc degenerates to straight segments through the middle
        out += bx; out += by; out += cx; out += cy
      } else {
        val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
          (cx * cx + cy * cy) * (ay - by)) / d
        val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
          (cx * cx + cy * cy) * (bx - ax)) / d
        val r = math.hypot(ax - ux, ay - uy)
        val a0 = math.atan2(ay - uy, ax - ux)
        var a1 = math.atan2(by - uy, bx - ux)
        var a2 = math.atan2(cy - uy, cx - ux)
        val ccw = d > 0 // circumcenter denominator sign = orientation of (p0, p1, p2)
        if (ccw) {
          while (a1 <= a0) a1 += 2 * math.Pi
          while (a2 <= a1) a2 += 2 * math.Pi
        } else {
          while (a1 >= a0) a1 -= 2 * math.Pi
          while (a2 >= a1) a2 -= 2 * math.Pi
        }
        val sweep = a2 - a0
        val nSeg = math.max(2, math.ceil(math.abs(sweep) / (math.Pi / 2) * quadSegs).toInt)
        var k = 1
        while (k < nSeg) {
          val a = a0 + sweep * k / nSeg
          out += ux + r * math.cos(a); out += uy + r * math.sin(a)
          k += 1
        }
        out += cx; out += cy // the original control point, bit-exact
      }
      i += 2
    }
    out.toArray
  }

  /** Minimal-outline tracing (r14, `st_outline`): turn an edge-sharing
    * piece decomposition (the st_union / st_union_agg output contract)
    * into the true boundary polygons — shells with holes, no interior
    * edges. Method:
    *
    *   1. Normalize every ring (member shells CCW, holes CW = interior of
    *      the union on the LEFT of every directed edge).
    *   2. Split each edge at every other vertex lying on it (T-junctions
    *      from triangulation cuts), so shared boundary is edge-by-edge
    *      identical.
    *   3. Cancel opposite-direction duplicates: interior (shared) edges
    *      vanish, boundary edges survive exactly once.
    *   4. Stitch survivors into rings, taking the most-counterclockwise
    *      turn at junctions (keeps the interior on the left, so two shells
    *      touching at a corner come out as two simple rings, not a
    *      figure-eight).
    *   5. Signed area classifies shells (CCW) vs holes (CW); each hole
    *      attaches to the smallest shell containing it. Rings start at
    *      their lexicographically smallest vertex and members are ordered
    *      by (xmin, ymin) — canonical, GROUP BY-stable output.
    *
    * Exactness contract (honest): cancellation matches edges BIT-exactly.
    * Pieces produced by this engine's overlay over well-conditioned
    * coordinates share identical cut vertices; inputs whose pieces abut
    * only approximately leave unpaired edges, and the trace fails LOUDLY
    * instead of emitting a broken ring.
    */
  def outlineOf(wkb: Array[Byte]): Array[Byte] = {
    val g = parse(wkb)
    if (isEmptyG(g)) return wkb
    val members = simples(g)
    if (members.exists(_.kind != 3))
      fail("st_outline expects POLYGON/MULTIPOLYGON input")
    // loud guard: tracing assumes DISJOINT-INTERIOR members (the union
    // piece contract). Crossing or nested members would trace a wrong
    // outline silently — reject them instead (full-overlay flattening of
    // arbitrary overlaps is st_union's job, per pair).
    for (i <- members.indices; j <- members.indices if i < j) {
      val si = segments(members(i)); val sj = segments(members(j))
      if (si.exists(s1 => sj.exists(s2 => properCross(s1, s2))))
        fail("st_outline: members cross — not a disjoint-interior decomposition")
      def strictlyInsideOther(a: Geom, b: Geom): Boolean =
        b.vertices.exists { case (px, py) =>
          inside(a, px, py) && !onBoundary(a, px, py) }
      if (strictlyInsideOther(members(i), members(j)) ||
          strictlyInsideOther(members(j), members(i)))
        fail("st_outline: members nest/overlap — not a disjoint-interior decomposition")
    }
    type Pt = (Double, Double)
    val dirEdges = scala.collection.mutable.ArrayBuffer.empty[(Pt, Pt)]
    members.foreach { m =>
      val shell = openShellCcw(Geom(3, Array(m.rings(0))), "st_outline")
      def ringEdges(r: Array[Double], reverse: Boolean): Unit = {
        val n = r.length / 2
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val a = (r(2 * i), r(2 * i + 1)); val b = (r(2 * j), r(2 * j + 1))
          if (a != b) dirEdges += (if (reverse) (b, a) else (a, b))
          i += 1
        }
      }
      ringEdges(shell, reverse = false)
      m.rings.drop(1).foreach { h =>
        ringEdges(openShellCcw(Geom(3, Array(h)), "st_outline"), reverse = true)
      }
    }
    // T-junction split at every vertex lying on an edge's interior
    val verts: Array[Pt] = dirEdges.iterator.flatMap(e => Iterator(e._1, e._2)).toArray.distinct
    val split = dirEdges.iterator.flatMap { case (a, b) =>
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val len2 = dx * dx + dy * dy
      val ts = scala.collection.mutable.ArrayBuffer(0.0, 1.0)
      verts.foreach { v =>
        if (v != a && v != b && pointSegDist(v._1, v._2, a._1, a._2, b._1, b._2) == 0.0) {
          val t = ((v._1 - a._1) * dx + (v._2 - a._2) * dy) / len2
          if (t > 0 && t < 1) ts += t
        }
      }
      val sorted = ts.distinct.sorted
      sorted.iterator.zip(sorted.iterator.drop(1)).map { case (t0, t1) =>
        // endpoints snap to the EXACT splitting vertex (not interpolation)
        def at(t: Double): Pt =
          if (t == 0.0) a else if (t == 1.0) b
          else verts.find(v => v != a && v != b &&
            pointSegDist(v._1, v._2, a._1, a._2, b._1, b._2) == 0.0 &&
            ((v._1 - a._1) * dx + (v._2 - a._2) * dy) / len2 == t).getOrElse(
            (a._1 + t * dx, a._2 + t * dy))
        (at(t0), at(t1))
      }
    }.toSeq
    // cancel opposite-direction pairs via a net count per undirected key
    val net = scala.collection.mutable.LinkedHashMap.empty[(Pt, Pt), Int]
    val ord = implicitly[Ordering[Pt]]
    split.foreach { case (a, b) =>
      val (key, d) = if (ord.lt(a, b)) ((a, b), 1) else ((b, a), -1)
      val n = net.getOrElse(key, 0) + d
      if (n == 0) net.remove(key) else net(key) = n
    }
    val survivors = scala.collection.mutable.LinkedHashMap.empty[Pt, scala.collection.mutable.ArrayBuffer[Pt]]
    net.foreach { case ((a, b), n) =>
      if (math.abs(n) > 1)
        fail("st_outline: a boundary edge appears more than once (members " +
          "overlap rather than tile — outline requires a disjoint-interior " +
          "piece decomposition)")
      val (from, to) = if (n > 0) (a, b) else (b, a)
      survivors.getOrElseUpdate(from, scala.collection.mutable.ArrayBuffer.empty) += to
    }
    if (survivors.isEmpty)
      fail("st_outline: no boundary edges survived (degenerate input)")
    // stitch rings, most-counterclockwise turn at junctions
    def turnAngle(ux: Double, uy: Double, wx: Double, wy: Double): Double =
      math.atan2(ux * wy - uy * wx, ux * wx + uy * wy) // signed CCW turn
    val rings = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var guard = 0
    val guardMax = 4 * split.length + 16
    while (survivors.nonEmpty) {
      val start = survivors.keysIterator.min(ord)
      val first = survivors(start).min(ord)
      val ring = scala.collection.mutable.ArrayBuffer[Pt](start)
      var prev = start
      var cur = first
      def consume(from: Pt, to: Pt): Unit = {
        val outs = survivors(from)
        outs.remove(outs.indexOf(to))
        if (outs.isEmpty) survivors.remove(from)
        ()
      }
      consume(start, first)
      while (cur != start) {
        guard += 1
        if (guard > guardMax) fail("st_outline: boundary walk did not close " +
          "(unpaired edges — pieces do not share bit-exact boundaries)")
        ring += cur
        val outs = survivors.getOrElse(cur,
          fail("st_outline: boundary walk hit a dead end (unpaired edges — " +
            "pieces do not share bit-exact boundaries)"))
        val ux = cur._1 - prev._1; val uy = cur._2 - prev._2
        val next =
          if (outs.length == 1) outs.head
          else outs.maxBy(w => turnAngle(ux, uy, w._1 - cur._1, w._2 - cur._2))
        consume(cur, next)
        prev = cur
        cur = next
      }
      // drop collinear pass-through vertices left by the T-junction split
      val m = ring.length
      val keep = (0 until m).filter { i =>
        val a = ring((i + m - 1) % m); val b = ring(i); val c = ring((i + 1) % m)
        (b._1 - a._1) * (c._2 - b._2) - (b._2 - a._2) * (c._1 - b._1) != 0.0
      }.map(ring(_))
      if (keep.length >= 3) {
        // canonical start: lexicographically smallest vertex
        val s = keep.indices.minBy(i => keep(i))
        val rot = (keep.drop(s) ++ keep.take(s)).toArray
        val flat = new Array[Double](2 * rot.length)
        rot.indices.foreach { i => flat(2 * i) = rot(i)._1; flat(2 * i + 1) = rot(i)._2 }
        rings += flat
      }
    }
    // classify + attach holes to the smallest containing shell
    val shells = rings.filter(shoelace(_) > 0)
    val holes = rings.filter(shoelace(_) < 0)
    if (shells.isEmpty) fail("st_outline: no shell ring traced")
    val shellGeoms = shells.map(s => (s, scala.collection.mutable.ArrayBuffer.empty[Array[Double]]))
    holes.foreach { h =>
      val inside_ = shellGeoms.filter { case (s, _) =>
        inside(Geom(3, Array(s)), h(0), h(1)) || onBoundary(Geom(3, Array(s)), h(0), h(1))
      }
      if (inside_.isEmpty) fail("st_outline: a hole ring lies in no shell")
      inside_.minBy { case (s, _) => math.abs(shoelace(s)) }._2 += h
    }
    val polys = shellGeoms.sortBy { case (s, _) => (s(0), s(1)) }.map { case (s, hs) =>
      Geom(3, (closeRing(s) +: hs.map(closeRing).toSeq).toArray)
    }
    if (polys.length == 1) writeGeom(polys.head)
    else writeGeom(Geom(6, Array.empty, polys.toArray))
  }

  /** Convex hull (Andrew's monotone chain, O(n log n)): a POLYGON for >= 3
    * non-collinear input vertices, the 2-point LINESTRING for a collinear
    * set, the POINT itself for a single point. Works over every geometry
    * kind (vertices of all members for multis).
    */
  def convexHull(wkb: Array[Byte]): Array[Byte] = {
    val vs = parse(wkb).vertices.toArray.distinct.sortBy(p => (p._1, p._2))
    if (vs.isEmpty) fail("st_convexhull: no vertices")
    if (vs.length == 1) return point(vs(0)._1, vs(0)._2)
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def chain(pts: Array[(Double, Double)]): List[(Double, Double)] =
      pts.foldLeft(List.empty[(Double, Double)]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h(1), h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = chain(vs).reverse
    val upper = chain(vs.reverse).reverse
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    if (hull.length == 2)
      return writeGeom(Geom(2, Array(Array(
        hull(0)._1, hull(0)._2, hull(1)._1, hull(1)._2))))
    // closed CCW shell ring
    val ring = new Array[Double](2 * (hull.length + 1))
    hull.zipWithIndex.foreach { case ((x, y), i) => ring(2 * i) = x; ring(2 * i + 1) = y }
    ring(2 * hull.length) = hull(0)._1; ring(2 * hull.length + 1) = hull(0)._2
    writeGeom(Geom(3, Array(ring)))
  }

  /** POINT buffer: the regular 4*quadSegs-gon with vertices ON the circle
    * of radius r (CCW from angle 0) — the same inscribed-polygon
    * approximation GEOS uses (PostGIS quad_segs, default 8 -> 32-gon).
    * Declared scope: points only — line/polygon buffers need offset-curve
    * construction (out of scope with general clipping).
    */
  def buffer(wkb: Array[Byte], r: Double, quadSegs: Int): Array[Byte] = {
    val g = parse(wkb)
    if (r <= 0) fail(s"st_buffer radius must be positive, got $r")
    if (quadSegs < 1) fail(s"st_buffer quad_segs must be >= 1, got $quadSegs")
    val n = 4 * quadSegs
    // inscribed n-gon direction; multiples of 90 degrees are EXACT so the
    // union cuts along axis-aligned edges stay closed-form (cos(pi/2) in
    // FP is 6e-17, which would smear an exact oracle area)
    def dirAt(k: Int): (Double, Double) =
      if (4 * k % n == 0) (4 * k / n) match {
        case 0 => (1.0, 0.0); case 1 => (0.0, 1.0)
        case 2 => (-1.0, 0.0); case _ => (0.0, -1.0)
      }
      else { val a = 2 * math.Pi * k / n; (math.cos(a), math.sin(a)) }
    def ngon(cx: Double, cy: Double): Array[Double] = {
      val ring = new Array[Double](2 * n)
      var i = 0
      while (i < n) {
        val (dx, dy) = dirAt(i)
        ring(2 * i) = cx + r * dx; ring(2 * i + 1) = cy + r * dy
        i += 1
      }
      ring
    }
    if (g.kind == 1 && g.rings.nonEmpty) {
      // fast path: the historical point form, one closed n-gon polygon
      val ring = ngon(g.rings(0)(0), g.rings(0)(1))
      return writeGeom(Geom(3, Array(closeRing(ring))))
    }
    if (isEmptyG(g)) return writeGeom(Geom(3, Array.empty)) // buffer(∅) = ∅
    // General dilation (r14): Minkowski sum with the inscribed n-gon disc
    // = union of per-vertex n-gons + per-segment oriented rectangles +
    // (for polygons) the subject's own pieces — rectangles on HOLE edges
    // grow inward, eroding the hole, which is exactly Minkowski semantics.
    // The result is the engine's exact-area piece decomposition (union
    // contract); negative radii (erosion) stay out of scope, loudly via
    // the r <= 0 check above.
    var pieces: Seq[Array[Double]] = Seq.empty
    def add(ring: Array[Double]): Unit =
      pieces = subtractRing(pieces, ring, "st_buffer") :+ ring
    simples(g).foreach { m =>
      if (!isEmptyG(m)) {
        m.vertices.foreach { case (vx, vy) => add(ngon(vx, vy)) }
        segments(m).foreach { case (x1, y1, x2, y2) =>
          val len = math.hypot(x2 - x1, y2 - y1)
          if (len > 0) {
            val nx = -(y2 - y1) / len * r; val ny = (x2 - x1) / len * r
            add(Array(x1 + nx, y1 + ny, x1 - nx, y1 - ny,
              x2 - nx, y2 - ny, x2 + nx, y2 + ny))
          }
        }
        if (m.kind == 3)
          polygonPieces(m, "st_buffer").foreach(add)
      }
    }
    piecesToWkb(pieces)
  }

  def buffer(wkb: Array[Byte], r: Double): Array[Byte] = buffer(wkb, r, 8)

  /** Douglas-Peucker simplification with perpendicular-distance tolerance
    * `tol`. Declared scope: LINESTRING / MULTILINESTRING (points pass
    * through; polygon rings need the split-at-farthest-vertex closed-ring
    * variant — out of scope). Endpoints always survive.
    */
  def simplify(wkb: Array[Byte], tol: Double): Array[Byte] = {
    if (tol < 0) fail(s"st_simplify tolerance must be >= 0, got $tol")
    def simp(g: Geom): Geom = g.kind match {
      case 1 => g
      case 2 => Geom(2, Array(dp(g.rings(0), tol)))
      case 3 =>
        // Douglas-Peucker per ring (r13): run DP on the CLOSED sequence —
        // both anchors are the ring's start vertex, so closure is
        // preserved; the anchor choice is the start vertex, like GEOS. A
        // ring simplified below 3 distinct vertices fails loudly (PostGIS
        // silently returns invalid output; loud beats invalid here).
        Geom(3, g.rings.map { r0 =>
          val n0 = r0.length / 2
          val alreadyClosed = n0 >= 2 && r0(0) == r0(2 * (n0 - 1)) &&
            r0(1) == r0(2 * (n0 - 1) + 1)
          val out = dp(if (alreadyClosed) r0 else closeRing(r0), tol)
          if (out.length / 2 < 4)
            fail(s"st_simplify: tolerance $tol collapses a polygon ring " +
              "below 3 distinct vertices")
          out
        })
      case 5 | 6 | 7 => Geom(g.kind, g.rings, g.parts.map(simp))
      case _ => fail("st_simplify supports LINESTRING and POLYGON geometries " +
        "(declared scope)")
    }
    writeGeom(simp(parse(wkb)))
  }

  /** Canonical form (PostGIS ST_Normalize flavor): every ring rotated to
    * start at its lexicographically smallest (x, y) vertex, shells CCW and
    * holes CW, holes sorted by their start vertex, multi members sorted by
    * WKT — so semantically identical geometries (rotated/reversed rings,
    * reordered members) become byte-identical WKB. That is what makes
    * GROUP BY / join / exact-dedup on a geometry column deterministic.
    */
  def normalize(wkb: Array[Byte]): Array[Byte] = writeGeom(normalizeG(parse(wkb)))

  private def normalizeG(g: Geom): Geom = g.kind match {
    case 1 | 2 => g
    case 3 =>
      def canon(r0: Array[Double], ccw: Boolean): Array[Double] = {
        val o0 = openRing(r0)
        val o = if ((shoelace(o0) >= 0) == ccw) o0 else {
          val m = o0.length / 2
          Array.tabulate(2 * m)(j =>
            if (j % 2 == 0) o0(2 * (m - 1 - j / 2)) else o0(2 * (m - 1 - j / 2) + 1))
        }
        val m = o.length / 2
        var best = 0
        var i = 1
        while (i < m) {
          if (o(2 * i) < o(2 * best) ||
            (o(2 * i) == o(2 * best) && o(2 * i + 1) < o(2 * best + 1))) best = i
          i += 1
        }
        val rot = new Array[Double](2 * m + 2)
        i = 0
        while (i < m) {
          rot(2 * i) = o(2 * ((best + i) % m)); rot(2 * i + 1) = o(2 * ((best + i) % m) + 1)
          i += 1
        }
        rot(2 * m) = rot(0); rot(2 * m + 1) = rot(1)
        rot
      }
      val shell = canon(g.rings(0), ccw = true)
      val holes = g.rings.drop(1).map(canon(_, ccw = false))
        .sortBy(h => (h(0), h(1)))
      Geom(3, shell +: holes)
    case _ =>
      Geom(g.kind, g.rings, g.parts.map(normalizeG).sortBy(wktOf))
  }

  private def dp(r: Array[Double], tol: Double): Array[Double] = {
    val n = r.length / 2
    if (n <= 2) return r.clone()
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def rec(i: Int, j: Int): Unit = {
      if (j <= i + 1) return
      var best = -1.0; var bi = -1
      var k = i + 1
      while (k < j) {
        val d = pointSegDist(r(2 * k), r(2 * k + 1),
          r(2 * i), r(2 * i + 1), r(2 * j), r(2 * j + 1))
        if (d > best) { best = d; bi = k }
        k += 1
      }
      if (best > tol) { keep(bi) = true; rec(i, bi); rec(bi, j) }
    }
    rec(0, n - 1)
    val out = new Array[Double](2 * keep.count(identity))
    var k = 0; var i = 0
    while (i < n) {
      if (keep(i)) { out(2 * k) = r(2 * i); out(2 * k + 1) = r(2 * i + 1); k += 1 }
      i += 1
    }
    out
  }

  // ---- spherical distance ------------------------------------------------------

  /** Haversine great-circle distance in meters between two POINTs whose
    * coordinates are (longitude, latitude) degrees, on the IUGG mean-radius
    * sphere R = 6371008.8 m (declared constant — the oracle recomputes the
    * same formula).
    */
  def distanceSphere(wa: Array[Byte], wb: Array[Byte]): Double = {
    val a = parse(wa); val b = parse(wb)
    if (a.kind != 1 || b.kind != 1) fail("st_distance_sphere expects two POINTs")
    val lon1 = math.toRadians(a.rings(0)(0)); val lat1 = math.toRadians(a.rings(0)(1))
    val lon2 = math.toRadians(b.rings(0)(0)); val lat2 = math.toRadians(b.rings(0)(1))
    val sdLat = math.sin((lat2 - lat1) / 2)
    val sdLon = math.sin((lon2 - lon1) / 2)
    val h = sdLat * sdLat + math.cos(lat1) * math.cos(lat2) * sdLon * sdLon
    2 * 6371008.8 * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** Spherical polygon area in m² on the same IUGG mean sphere as
    * st_distance_sphere (R = 6371008.8 m), vertices (lon, lat) degrees:
    * Girard's theorem, area = (Σ interior angles − (n−2)π) · R². Interior
    * angles come from the tangent-plane directions of the two incident
    * great-circle edges at each vertex (atan2 of the perpendicular/parallel
    * components — exact spherical trig, no small-polygon approximation).
    * Scope: simple hole-free polygons smaller than a hemisphere, vertices
    * not at the poles on consecutive duplicate meridians; multis sum over
    * members. The sphere (not the WGS84 ellipsoid) is the declared datum —
    * DuckDB's ST_Area_Spheroid differs by up to ~0.5%, so the oracle
    * recomputes closed forms on the SAME sphere rather than comparing
    * engines' datums.
    */
  def areaSphere(wkb: Array[Byte]): Double = {
    val g = parse(wkb)
    if (g.kind >= 4) return simples(g).map(m => areaSphere(writeGeom(m))).sum
    if (g.kind != 3) return 0.0
    if (g.rings.length != 1) fail("st_area_sphere supports hole-free polygons")
    // open the ring and normalize to CCW in the lon/lat chart (valid away
    // from the antimeridian — declared scope), so reflex vertices are
    // detectable by sign below
    val open0 = openRing(g.rings(0))
    val open = if (shoelace(open0) >= 0) open0 else {
      val m = open0.length / 2
      Array.tabulate(2 * m)(j =>
        if (j % 2 == 0) open0(2 * (m - 1 - j / 2)) else open0(2 * (m - 1 - j / 2) + 1))
    }
    val n = open.length / 2
    if (n < 3) fail("st_area_sphere: degenerate polygon")
    // unit vectors
    val vx = new Array[Double](n); val vy = new Array[Double](n); val vz = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lon = math.toRadians(open(2 * i)); val lat = math.toRadians(open(2 * i + 1))
      vx(i) = math.cos(lat) * math.cos(lon)
      vy(i) = math.cos(lat) * math.sin(lon)
      vz(i) = math.sin(lat)
      i += 1
    }
    // interior angle at B between great circles B->A and B->C: project A
    // and C onto the tangent plane at B; the unsigned angle flips to
    // 2π − angle at a REFLEX vertex, detected by (tC × tA)·vB < 0 on the
    // CCW-normalized ring
    def angleAt(b: Int, a: Int, c: Int): Double = {
      def tangent(t: Int): (Double, Double, Double) = {
        val dot = vx(b) * vx(t) + vy(b) * vy(t) + vz(b) * vz(t)
        (vx(t) - dot * vx(b), vy(t) - dot * vy(b), vz(t) - dot * vz(b))
      }
      val (ax, ay, az) = tangent(a)
      val (cx, cy, cz) = tangent(c)
      val dot = ax * cx + ay * cy + az * cz
      val crx = cy * az - cz * ay; val cry = cz * ax - cx * az; val crz = cx * ay - cy * ax
      val unsignedA = math.atan2(math.sqrt(crx * crx + cry * cry + crz * crz), dot)
      val sign = crx * vx(b) + cry * vy(b) + crz * vz(b)
      if (sign >= 0) unsignedA else 2 * math.Pi - unsignedA
    }
    var sum = 0.0
    i = 0
    while (i < n) {
      sum += angleAt(i, (i + n - 1) % n, (i + 1) % n)
      i += 1
    }
    val excess = sum - (n - 2) * math.Pi
    if (excess <= 0)
      fail("st_area_sphere: non-positive spherical excess (self-intersecting " +
        "or larger-than-hemisphere input is out of scope)")
    excess * 6371008.8 * 6371008.8
  }

  /** WGS84 ellipsoidal distance in meters between two (lon, lat)-degree
    * POINTs via Lambert's formula on reduced latitudes — first-order in the
    * flattening (~10 m accuracy over thousands of km, vs ~0.5% for the
    * sphere). Chosen over Vincenty because every step is closed-form
    * elementary trig, so the DuckDB oracle reproduces the identical
    * computation in SQL (results compared at 0.1 m granularity per the
    * float-oracle rule — libm trig is not bit-stable cross-engine).
    */
  def distanceSpheroid(wa: Array[Byte], wb: Array[Byte]): Double = {
    val a = parse(wa); val b = parse(wb)
    if (a.kind != 1 || b.kind != 1) fail("st_distance_spheroid expects two POINTs")
    val A = 6378137.0
    val F = 1.0 / 298.257223563
    val lon1 = math.toRadians(a.rings(0)(0)); val lat1 = math.toRadians(a.rings(0)(1))
    val lon2 = math.toRadians(b.rings(0)(0)); val lat2 = math.toRadians(b.rings(0)(1))
    val b1 = math.atan((1 - F) * math.tan(lat1))
    val b2 = math.atan((1 - F) * math.tan(lat2))
    // central angle on the auxiliary sphere (haversine on reduced latitudes)
    val sdLat = math.sin((b2 - b1) / 2)
    val sdLon = math.sin((lon2 - lon1) / 2)
    val h = sdLat * sdLat + math.cos(b1) * math.cos(b2) * sdLon * sdLon
    val sigma = 2 * math.asin(math.min(1.0, math.sqrt(h)))
    if (sigma == 0.0) return 0.0
    val p = (b1 + b2) / 2
    val q = (b2 - b1) / 2
    val cosHalf = math.cos(sigma / 2); val sinHalf = math.sin(sigma / 2)
    val x = (sigma - math.sin(sigma)) *
      math.pow(math.sin(p) * math.cos(q) / cosHalf, 2)
    val y = (sigma + math.sin(sigma)) *
      math.pow(math.cos(p) * math.sin(q) / sinHalf, 2)
    A * (sigma - F / 2 * (x + y))
  }
}
