package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** WKB kernel edge cases the grid oracles can't reach: holes, boundary
  * semantics, big-endian and EWKB input, WKT errors, degenerate geometry.
  */
class SpatialSpec extends AnyFunSuite {

  private def wkt(s: String): Array[Byte] = Wkb.fromText(UTF8String.fromString(s))
  private def text(b: Array[Byte]): String = Wkb.asText(b).toString

  test("point round-trips through WKB and WKT") {
    val p = Wkb.point(1.5, -2.0)
    assert(Wkb.x(p) == 1.5 && Wkb.y(p) == -2.0)
    assert(text(p) == "POINT (1.5 -2)")
    assert(text(wkt("point(3 4)")) == "POINT (3 4)")
    assert(Wkb.geometryType(p).toString == "POINT")
    intercept[IllegalArgumentException](Wkb.x(wkt("LINESTRING (0 0, 1 1)")))
  }

  test("polygon with a hole: area subtracts, containment respects the hole") {
    val g = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(Wkb.area(g) == 96.0)
    assert(Wkb.perimeter(g) == 48.0)
    assert(Wkb.contains(g, Wkb.point(2, 2)))
    assert(!Wkb.contains(g, Wkb.point(5, 5)), "a point in the hole is not contained")
    assert(!Wkb.contains(g, Wkb.point(0, 5)), "boundary points are not contained (OGC)")
    assert(Wkb.intersects(g, Wkb.point(0, 5)), "...but they do intersect")
  }

  test("distance: point/segment/box cases, zero when intersecting") {
    assert(Wkb.distance(Wkb.point(0, 0), Wkb.point(3, 4)) == 5.0)
    assert(Wkb.distance(wkt("LINESTRING (0 0, 10 0)"), Wkb.point(5, 2)) == 2.0)
    // crossing linestrings -> 0 even though no vertex touches
    assert(Wkb.distance(wkt("LINESTRING (0 0, 2 2)"), wkt("LINESTRING (0 2, 2 0)")) == 0.0)
    // point interior to a polygon -> 0
    val env = Wkb.makeEnvelope(0, 0, 4, 4)
    assert(Wkb.distance(env, Wkb.point(2, 2)) == 0.0)
    assert(Wkb.dwithin(env, Wkb.point(7, 4), 3.0))
    assert(!Wkb.dwithin(env, Wkb.point(7, 4), 2.9))
  }

  test("contains/within for polygon-polygon incl. shared boundary; crossing rejected") {
    val outer = Wkb.makeEnvelope(0, 0, 10, 10)
    assert(Wkb.contains(outer, Wkb.makeEnvelope(0, 0, 5, 5)),
      "shared boundary with interior overlap IS contained")
    assert(Wkb.within(Wkb.makeEnvelope(0, 0, 5, 5), outer))
    assert(!Wkb.contains(outer, Wkb.makeEnvelope(5, 5, 12, 12)), "crossing is not containment")
    assert(Wkb.intersects(outer, Wkb.makeEnvelope(5, 5, 12, 12)))
    assert(!Wkb.intersects(outer, Wkb.makeEnvelope(11, 11, 12, 12)))
  }

  test("big-endian WKB and EWKB SRID headers parse") {
    // big-endian point (1 2): flag 0, type 00000001, doubles big-endian
    val be = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(Wkb.x(be.array()) == 1.0 && Wkb.y(be.array()) == 2.0)
    // EWKB little-endian point with SRID flag + srid 4326
    val ew = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ew.put(1.toByte).putInt(0x20000001).putInt(4326).putDouble(3.0).putDouble(4.0)
    assert(Wkb.x(ew.array()) == 3.0 && Wkb.y(ew.array()) == 4.0)
    // ISO WKB PointZ (1001): Z coordinate dropped
    val z = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte).putInt(1001).putDouble(5.0).putDouble(6.0).putDouble(7.0)
    assert(Wkb.x(z.array()) == 5.0 && Wkb.y(z.array()) == 6.0)
  }

  test("WKT errors are loud and scoped") {
    // (POINT EMPTY and curve types parse since r14 — see their tests)
    intercept[IllegalArgumentException](wkt("POINT (1 2 3 4 5)"))
    intercept[IllegalArgumentException](wkt("POLYHEDRALSURFACE (((0 0, 1 0, 1 1, 0 0)))"))
    intercept[IllegalArgumentException](wkt("POLYGON ((0 0, 1 0, 1 1)) junk"))
  }

  test("multi-geometries: parse, print, measures sum, accessors (r12)") {
    // MULTIPOLYGON of two unit squares: measures sum over members
    val mp = wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))")
    assert(Wkb.area(mp) == 2.0 && Wkb.perimeter(mp) == 8.0)
    assert(Wkb.npoints(mp) == 10 && Wkb.numGeometries(mp) == 2)
    assert(Wkb.xmin(mp) == 0.0 && Wkb.xmax(mp) == 3.0)
    assert(Wkb.geometryType(mp).toString == "MULTIPOLYGON")
    assert(text(mp) ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))")
    // WKB round-trip: print -> parse -> print is a fixpoint
    assert(text(wkt(text(mp))) == text(mp))
    // centroid: area-weighted mean of the two squares' centers
    assert(Wkb.x(Wkb.centroid(mp)) == 1.5 && Wkb.y(Wkb.centroid(mp)) == 0.5)
    // member access
    assert(text(Wkb.geometryN(mp, 2)) == "POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))")
    intercept[IllegalArgumentException](Wkb.geometryN(mp, 3))
    // MULTIPOINT, both spellings; MULTILINESTRING length sums
    val mpt = wkt("MULTIPOINT (0 0, 2 0, 2 2)")
    assert(Wkb.numGeometries(mpt) == 3 && Wkb.npoints(mpt) == 3)
    assert(text(mpt) == "MULTIPOINT ((0 0), (2 0), (2 2))")
    assert(text(wkt(text(mpt))) == text(mpt))
    val mls = wkt("MULTILINESTRING ((0 0, 3 0), (0 1, 0 5))")
    assert(Wkb.length(mls) == 7.0 && Wkb.geometryType(mls).toString == "MULTILINESTRING")
    // nested GEOMETRYCOLLECTION: type-filtered extraction, centroid uses
    // highest-dimension members only (the point does not shift it)
    val gc = wkt("GEOMETRYCOLLECTION (POINT (9 9), MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0))))")
    assert(Wkb.area(gc) == 4.0 && Wkb.numGeometries(gc) == 2)
    assert(Wkb.x(Wkb.centroid(gc)) == 1.0 && Wkb.y(Wkb.centroid(gc)) == 1.0)
    assert(text(Wkb.collectionExtract(gc, 1)) == "MULTIPOINT ((9 9))")
    assert(text(Wkb.collectionExtract(gc, 3)) == "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))")
    // no member of the requested kind -> NULL, never an empty multi whose
    // WKT the engine's own fromText would reject (r12 ADVICE)
    assert(Wkb.collectionExtract(gc, 2) == null)
    assert(text(wkt(text(gc))) == text(gc))
  }

  test("multi-geometries: predicates distribute over members (r12)") {
    val mp = wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))")
    // intersects/contains hit the correct member; the gap between them is neither
    assert(Wkb.intersects(mp, Wkb.point(0.5, 0.5)))
    assert(Wkb.intersects(mp, Wkb.point(2.5, 0.5)))
    assert(!Wkb.intersects(mp, Wkb.point(1.5, 0.5)), "the gap between members")
    assert(Wkb.contains(mp, Wkb.point(2.5, 0.5)))
    assert(!Wkb.contains(mp, Wkb.point(1, 0.5)), "member boundary is not contained (OGC)")
    assert(Wkb.covers(mp, Wkb.point(1, 0.5)))
    // multipoint within a polygon: ALL members must be covered
    val env = Wkb.makeEnvelope(0, 0, 3, 3)
    assert(Wkb.covers(env, wkt("MULTIPOINT (1 1, 2 2)")))
    assert(!Wkb.covers(env, wkt("MULTIPOINT (1 1, 9 9)")))
    // distance is the min over member pairs; zero when any member touches
    assert(Wkb.distance(mp, Wkb.point(5, 0.5)) == 2.0)
    assert(Wkb.distance(mp, wkt("MULTIPOINT (9 9, 1.5 0.5)")) == 0.5)
    assert(Wkb.distance(mp, Wkb.point(2, 0.5)) == 0.0)
    // a multipolygon within a larger envelope
    assert(Wkb.within(mp, env) && Wkb.contains(env, mp))
  }

  test("overlay: axis-aligned st_intersection / st_union, loud out-of-scope (r12)") {
    val a = Wkb.makeEnvelope(0, 0, 4, 4)
    val b = Wkb.makeEnvelope(2, 2, 6, 6)
    assert(text(Wkb.intersection(a, b)) == "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(Wkb.area(Wkb.intersection(a, b)) == 4.0)
    // union area via inclusion-exclusion (the documented recipe)
    assert(Wkb.area(a) + Wkb.area(b) - Wkb.area(Wkb.intersection(a, b)) == 28.0)
    // disjoint -> NULL intersection, multipolygon union
    val far = Wkb.makeEnvelope(10, 10, 11, 11)
    assert(Wkb.intersection(a, far) == null)
    val u = Wkb.union(a, far)
    assert(Wkb.geometryType(u).toString == "MULTIPOLYGON" && Wkb.area(u) == 17.0)
    // containment -> the covering rectangle
    assert(text(Wkb.union(a, Wkb.makeEnvelope(1, 1, 2, 2))) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // edge contact: degenerate zero-area strip, not NULL
    assert(Wkb.area(Wkb.intersection(a, Wkb.makeEnvelope(4, 0, 8, 4))) == 0.0)
    // tiling contact: shared full edge + aligned extents -> the exact
    // covering rectangle, both axes (r12 ADVICE: this used to fail loud)
    assert(text(Wkb.union(a, Wkb.makeEnvelope(4, 0, 8, 4))) ==
      "POLYGON ((0 0, 8 0, 8 4, 0 4, 0 0))")
    assert(text(Wkb.union(Wkb.makeEnvelope(0, 4, 4, 9), a)) ==
      "POLYGON ((0 0, 4 0, 4 9, 0 9, 0 0))")
    // corner / partial-edge contact: interiors disjoint but no tiling ->
    // the two-member MULTIPOLYGON, area exact
    val corner = Wkb.union(a, Wkb.makeEnvelope(4, 4, 6, 6))
    assert(Wkb.geometryType(corner).toString == "MULTIPOLYGON" && Wkb.area(corner) == 20.0)
    val partialEdge = Wkb.union(a, Wkb.makeEnvelope(4, 1, 6, 3))
    assert(Wkb.geometryType(partialEdge).toString == "MULTIPOLYGON" && Wkb.area(partialEdge) == 20.0)
    // partial rectangle overlap: total since r13 — the exact-area piece
    // decomposition (a-b pieces) + b, inclusion-exclusion area 16+16-4
    val pu = Wkb.union(a, b)
    assert(Wkb.geometryType(pu).toString == "MULTIPOLYGON" && Wkb.area(pu) == 28.0)
    assert(Wkb.xmin(pu) == 0.0 && Wkb.xmax(pu) == 6.0)
    // rect x triangle union: 16 + 1 - 1 (triangle inside a)
    assert(Wkb.area(Wkb.union(a, wkt("POLYGON ((0 0, 2 0, 1 2, 0 0))"))) == 16.0)
  }

  test("general clipping: Sutherland-Hodgman intersection / difference with a convex side (r13)") {
    def sq(x: Double, y: Double) = Wkb.makeEnvelope(x, y, x + 1, y + 1)
    val tri = wkt("POLYGON ((0 0, 6 0, 0 6, 0 0))") // x>=0, y>=0, x+y<=6
    // fully inside: the subject comes back unchanged
    assert(text(Wkb.intersection(sq(1, 2), tri)) == "POLYGON ((1 2, 2 2, 2 3, 1 3, 1 2))")
    assert(Wkb.difference(sq(1, 2), tri) == null, "fully covered -> NULL (no EMPTY geometry)")
    // straddling the hypotenuse (x+y=5 corner): exact half-square triangles
    assert(text(Wkb.intersection(sq(2, 3), tri)) == "POLYGON ((2 3, 3 3, 2 4, 2 3))")
    assert(text(Wkb.difference(sq(2, 3), tri)) == "POLYGON ((3 3, 3 4, 2 4, 3 3))")
    assert(Wkb.area(Wkb.intersection(sq(2, 3), tri)) == 0.5)
    // beyond the hypotenuse: disjoint -> NULL intersection, identity difference
    assert(Wkb.intersection(sq(3, 3), tri) == null)
    assert(text(Wkb.difference(sq(3, 3), tri)) == "POLYGON ((3 3, 4 3, 4 4, 3 4, 3 3))")
    // corner touch only (x+y=6 at one vertex): boundary-only -> NULL
    assert(Wkb.intersection(wkt("POLYGON ((6 0, 7 0, 7 1, 6 1, 6 0))"), tri) == null)
    // argument order: the convex side is found on either side
    assert(Wkb.area(Wkb.intersection(tri, sq(2, 3))) == 0.5)
    // a CW-wound subject is normalized before clipping
    assert(Wkb.area(Wkb.intersection(
      wkt("POLYGON ((2 3, 2 4, 3 4, 3 3, 2 3))"), tri)) == 0.5)
    // concave SUBJECT x convex clip is exact when the result is connected:
    // L-shape (area 12) clipped to the box (1,1)-(3,3) keeps exactly 3
    val ell = wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val box = Wkb.makeEnvelope(1, 1, 3, 3)
    assert(text(Wkb.intersection(ell, box)) ==
      "POLYGON ((3 2, 2 2, 2 3, 1 3, 1 1, 3 1, 3 2))")
    assert(Wkb.area(Wkb.intersection(ell, box)) == 3.0)
    // difference decomposes into per-edge pieces: L minus the box
    val dl = Wkb.difference(ell, box)
    assert(Wkb.geometryType(dl).toString == "MULTIPOLYGON" && Wkb.area(dl) == 9.0)
    // exact additivity over the whole fixture grid: inter + diff == subject
    for (x <- 0 to 4; y <- 0 to 4) {
      val i = Option(Wkb.intersection(sq(x, y), tri)).map(Wkb.area).getOrElse(0.0)
      val d = Option(Wkb.difference(sq(x, y), tri)).map(Wkb.area).getOrElse(0.0)
      assert(i + d == 1.0, s"additivity at ($x,$y): $i + $d")
    }
    // r14: holes are IN scope — additivity holds for a donut subject too
    val donut9 = wkt("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (4 4, 5 4, 5 5, 4 5, 4 4))")
    val di = Option(Wkb.intersection(donut9, tri)).map(Wkb.area).getOrElse(0.0)
    val dd = Option(Wkb.difference(donut9, tri)).map(Wkb.area).getOrElse(0.0)
    assert(di + dd == Wkb.area(donut9), s"holed additivity: $di + $dd")
  }

  test("concave-concave overlay via ear-triangulated clips: exact area algebra (r13)") {
    // L-shapes: ell covers [0,4]x[0,2] + [0,2]x[2,4] (area 12); ell2 is
    // ell shifted by (1,1). Overlap = 3 + 1 + 1 = 5 by direct accounting.
    val ell = wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val ell2 = wkt("POLYGON ((1 1, 5 1, 5 3, 3 3, 3 5, 1 5, 1 1))")
    assert(Wkb.area(Wkb.intersection(ell, ell2)) == 5.0)
    // identity: X ∩ X tiles X
    assert(Wkb.area(Wkb.intersection(ell, ell)) == 12.0)
    // difference both ways + inclusion-exclusion union, all exact
    assert(Wkb.area(Wkb.difference(ell, ell2)) == 7.0)
    assert(Wkb.area(Wkb.difference(ell2, ell)) == 7.0)
    val u = Wkb.union(ell, ell2)
    assert(Wkb.geometryType(u).toString == "MULTIPOLYGON" && Wkb.area(u) == 19.0)
    assert(Wkb.xmin(u) == 0.0 && Wkb.xmax(u) == 5.0 && Wkb.ymax(u) == 5.0)
    // concave clip against a convex subject: box minus L leaves the notch
    val env = Wkb.makeEnvelope(0, 0, 4, 4)
    assert(Wkb.area(Wkb.difference(env, ell)) == 4.0, "the [2,4]x[2,4] notch")
    assert(Wkb.difference(ell, env) == null, "L fully covered by its bounding box")
    // subject fully inside a concave clip arm -> covered
    assert(Wkb.difference(Wkb.makeEnvelope(0.5, 0.5, 1.5, 1.5), ell) == null)
    // additivity over a grid of unit squares against the L-shape
    for (x <- 0 to 4; y <- 0 to 4) {
      val s = Wkb.makeEnvelope(x, y, x + 1, y + 1)
      val i = Option(Wkb.intersection(s, ell)).map(Wkb.area).getOrElse(0.0)
      val d = Option(Wkb.difference(s, ell)).map(Wkb.area).getOrElse(0.0)
      assert(i + d == 1.0, s"additivity at ($x,$y): $i + $d")
    }
  }

  test("tranche 2: centroid (holes shift it), covers vs contains, accessors, transforms") {
    // centroid of a box is its center; a hole pulls it away from the hole
    val box = Wkb.makeEnvelope(0, 0, 4, 2)
    assert(Wkb.x(Wkb.centroid(box)) == 2.0 && Wkb.y(Wkb.centroid(box)) == 1.0)
    val holed = wkt("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0), (3 0, 4 0, 4 1, 3 1, 3 0))")
    assert(Wkb.x(Wkb.centroid(holed)) < 2.0, "hole on the right pulls the centroid left")
    // linestring centroid is length-weighted, not the vertex mean
    assert(Wkb.y(Wkb.centroid(wkt("LINESTRING (0 0, 10 0, 10 1)"))) < 0.1)
    // covers is boundary-inclusive where contains is not
    val env = Wkb.makeEnvelope(0, 0, 2, 2)
    val edge = Wkb.point(0, 1)
    assert(!Wkb.contains(env, edge) && Wkb.covers(env, edge) && Wkb.coveredBy(edge, env))
    assert(Wkb.disjoint(env, Wkb.point(5, 5)) && !Wkb.disjoint(env, edge))
    // line accessors + transforms round-trip
    val line = wkt("LINESTRING (1 2, 3 4, 5 6)")
    assert(Wkb.x(Wkb.startPoint(line)) == 1.0 && Wkb.y(Wkb.endPoint(line)) == 6.0)
    assert(Wkb.x(Wkb.pointN(line, 2)) == 3.0)
    intercept[IllegalArgumentException](Wkb.pointN(line, 4))
    assert(Wkb.y(Wkb.flipCoordinates(Wkb.point(7, 8))) == 7.0)
    assert(Wkb.x(Wkb.translate(Wkb.point(1, 1), 0.5, -0.5)) == 1.5)
    assert(text(Wkb.envelopeOf(line)) == "POLYGON ((1 2, 5 2, 5 6, 1 6, 1 2))")
    assert(Wkb.numInteriorRings(holed) == 1)
    assert(Wkb.length(Wkb.exteriorRing(box)) == 12.0)
    // haversine: one degree of latitude on the IUGG sphere ~ 111.195 km
    val d = Wkb.distanceSphere(Wkb.point(0, 0), Wkb.point(0, 1))
    assert(math.abs(d - 111195.0) < 10.0, s"got $d")
  }

  test("SQL surface: st_* functions resolve and codegen end-to-end") {
    val spark = graft.GraftSession.local()
    val row = spark.sql(
      "SELECT st_astext(st_point(1.0D, 2.0D)) AS t, " +
      "ROUND(st_distance(st_geomfromtext('POINT (0 0)'), st_point(3.0D, 4.0D)), 6) AS d, " +
      "st_contains(st_makeenvelope(0.0D, 0.0D, 2.0D, 2.0D), st_point(1.0D, 1.0D)) AS c, " +
      "st_npoints(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) AS n")
      .collect().head
    assert(row.getString(0) == "POINT (1 2)")
    assert(row.getDouble(1) == 5.0)
    assert(row.getBoolean(2))
    assert(row.getInt(3) == 5)
  }

  test("point/line utilities: reverse, dedupe, snap, azimuth, interpolate, closest, surface point (r13)") {
    // reverse + removerepeatedpoints round out the line toolkit
    assert(text(Wkb.reverse(wkt("LINESTRING (0 0, 1 0, 1 1)"))) == "LINESTRING (1 1, 1 0, 0 0)")
    assert(text(Wkb.reverse(Wkb.makeEnvelope(0, 0, 1, 1))) ==
      "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")
    assert(text(Wkb.removeRepeatedPoints(wkt("LINESTRING (0 0, 0 0, 1 0, 1 0, 1 1)"))) ==
      "LINESTRING (0 0, 1 0, 1 1)")
    assert(text(Wkb.snapToGrid(wkt("POINT (1.3 2.7)"), 1.0)) == "POINT (1 3)")
    assert(text(Wkb.snapToGrid(wkt("LINESTRING (0.26 0, 0.74 0.5)"), 0.5)) ==
      "LINESTRING (0.5 0, 0.5 0.5)")
    // azimuth: clockwise from north
    assert(Wkb.azimuth(Wkb.point(0, 0), Wkb.point(0, 5)) == 0.0)
    assert(Wkb.azimuth(Wkb.point(0, 0), Wkb.point(5, 0)) == math.Pi / 2)
    assert(Wkb.azimuth(Wkb.point(0, 0), Wkb.point(0, -1)) == math.Pi)
    assert(Wkb.azimuth(Wkb.point(0, 0), Wkb.point(-1, 0)) == 3 * math.Pi / 2)
    intercept[IllegalArgumentException](Wkb.azimuth(Wkb.point(1, 1), Wkb.point(1, 1)))
    // interpolation along a multi-segment line
    val line = wkt("LINESTRING (0 0, 4 0, 4 4)")
    assert(text(Wkb.lineInterpolatePoint(line, 0.0)) == "POINT (0 0)")
    assert(text(Wkb.lineInterpolatePoint(line, 0.25)) == "POINT (2 0)")
    assert(text(Wkb.lineInterpolatePoint(line, 0.75)) == "POINT (4 2)")
    assert(text(Wkb.lineInterpolatePoint(line, 1.0)) == "POINT (4 4)")
    intercept[IllegalArgumentException](Wkb.lineInterpolatePoint(line, 1.5))
    // closest point / shortest line between disjoint geometries
    val env = Wkb.makeEnvelope(0, 0, 2, 2)
    assert(text(Wkb.closestPoint(env, Wkb.point(5, 1))) == "POINT (2 1)")
    assert(text(Wkb.closestPoint(Wkb.point(5, 1), env)) == "POINT (5 1)")
    assert(text(Wkb.shortestLine(env, Wkb.point(5, 1))) == "LINESTRING (2 1, 5 1)")
    assert(Wkb.length(Wkb.shortestLine(env, Wkb.point(5, 1))) == 3.0)
    // segment-to-segment nearest is a vertex projection on one side
    assert(text(Wkb.shortestLine(wkt("LINESTRING (0 0, 0 4)"),
      wkt("LINESTRING (3 1, 6 1)"))) == "LINESTRING (0 1, 3 1)")
    // a point inside the polygon is its own closest point
    assert(text(Wkb.closestPoint(env, Wkb.point(1, 1))) == "POINT (1 1)")
    // point on surface: always interior, even for concave and holed shapes
    val ell = wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    assert(Wkb.contains(ell, Wkb.pointOnSurface(ell)))
    val donut = wkt("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))")
    assert(Wkb.contains(donut, Wkb.pointOnSurface(donut)))
    assert(text(Wkb.pointOnSurface(Wkb.point(7, 8))) == "POINT (7 8)")
    assert(text(Wkb.pointOnSurface(wkt("LINESTRING (0 0, 4 0)"))) == "POINT (2 0)")
  }

  test("interior rings, geodesic length, scale/rotate (r13)") {
    val donut = wkt("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))")
    assert(text(Wkb.interiorRingN(donut, 1)) == "LINESTRING (3 3, 6 3, 6 6, 3 6, 3 3)")
    assert(Wkb.interiorRingN(donut, 2) == null, "past the hole count -> NULL (PostGIS)")
    assert(Wkb.interiorRingN(Wkb.makeEnvelope(0, 0, 1, 1), 1) == null)
    // geodesic length: a quarter of the equator and a quarter meridian
    val R = 6371008.8
    assert(math.abs(Wkb.lengthSphere(wkt("LINESTRING (0 0, 90 0)")) - R * math.Pi / 2) < 1e-6)
    assert(math.abs(Wkb.lengthSphere(wkt("LINESTRING (0 0, 0 90)")) - R * math.Pi / 2) < 1e-6)
    // segments sum; 2-point lines agree with st_distance_sphere exactly
    val two = wkt("LINESTRING (10 20, 30 -15)")
    assert(Wkb.lengthSphere(two) ==
      Wkb.distanceSphere(Wkb.point(10, 20), Wkb.point(30, -15)))
    // affine: area scales by sx*sy; rotation preserves lengths
    assert(Wkb.area(Wkb.scale(Wkb.makeEnvelope(0, 0, 2, 3), 2.0, 3.0)) == 36.0,
      "area scales by sx*sy")
    val rot = Wkb.rotate(Wkb.point(1, 0), math.Pi / 2)
    assert(math.abs(Wkb.x(rot)) < 1e-15 && math.abs(Wkb.y(rot) - 1.0) < 1e-15)
    assert(math.abs(Wkb.length(Wkb.rotate(wkt("LINESTRING (0 0, 3 4)"), 1.234)) - 5.0) < 1e-12)
  }

  test("st_isvalid: ring simplicity, spikes, holes strictly inside and disjoint (r13)") {
    assert(Wkb.isValid(Wkb.makeEnvelope(0, 0, 4, 4)))
    assert(Wkb.isValid(wkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")), "proper donut")
    // bowtie: the two diagonals cross
    assert(!Wkb.isValid(wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")))
    // duplicate consecutive vertex
    assert(!Wkb.isValid(wkt("POLYGON ((0 0, 2 0, 2 0, 2 2, 0 2, 0 0))")))
    // spike doubling back along an edge
    assert(!Wkb.isValid(wkt("POLYGON ((0 0, 4 0, 2 0, 2 2, 0 0))")))
    // collinear zero-area ring
    assert(!Wkb.isValid(wkt("POLYGON ((0 0, 1 0, 2 0, 0 0))")))
    // self-touch at a vertex (figure-eight)
    assert(!Wkb.isValid(wkt(
      "POLYGON ((0 0, 1 1, 2 0, 1 -1, 0 0, -1 1, -2 0, -1 -1, 0 0))")))
    // hole outside / poking out / touching the shell (strictly-inside rule)
    assert(!Wkb.isValid(wkt(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (10 10, 11 10, 11 11, 10 11, 10 10))")))
    assert(!Wkb.isValid(wkt(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (2 2, 6 2, 6 3, 2 3, 2 2))")))
    assert(!Wkb.isValid(wkt(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (0 1, 1 1, 1 2, 0 2, 0 1))")),
      "hole touching the shell edge reads invalid (declared stricter than OGC)")
    // overlapping holes
    assert(!Wkb.isValid(wkt(
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 4 1, 4 4, 1 4, 1 1), (3 3, 6 3, 6 6, 3 6, 3 3))")))
    // disjoint holes stay valid
    assert(Wkb.isValid(wkt(
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))")))
    // non-area kinds; multis validate per member
    assert(Wkb.isValid(Wkb.point(1, 2)))
    assert(Wkb.isValid(wkt("LINESTRING (0 0, 1 1)")))
    assert(Wkb.isValid(wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))")))
    assert(!Wkb.isValid(wkt(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 2 2, 2 0, 0 2, 0 0)))")),
      "one bowtie member poisons the multi")
  }

  test("spatial aggregates: st_extent_agg / st_collect_agg group-wise, order-insensitive (r13)") {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    // two groups, deliberately unsorted input; one row with a NULL geometry
    Seq((1, "POINT (3 1)"), (1, "POINT (0 0)"), (1, "POINT (1 4)"),
        (2, "LINESTRING (0 0, 2 0)"), (2, "POINT (5 5)"), (2, null))
      .toDF("g", "wkt").createOrReplaceTempView("sagg")
    val rows = spark.sql(
      "SELECT g, st_astext(st_extent_agg(st_geomfromtext(wkt))) AS ext, " +
      "st_astext(st_collect_agg(st_geomfromtext(wkt))) AS col, " +
      "st_numgeometries(st_collect_agg(st_geomfromtext(wkt))) AS n " +
      "FROM sagg GROUP BY g ORDER BY g").collect()
    assert(rows(0).getString(1) == "POLYGON ((0 0, 3 0, 3 4, 0 4, 0 0))")
    // homogeneous points -> MULTIPOINT in canonical (lexicographic-WKT) order
    assert(rows(0).getString(2) == "MULTIPOINT ((0 0), (1 4), (3 1))")
    assert(rows(0).getInt(3) == 3)
    // mixed kinds -> GEOMETRYCOLLECTION; the NULL row is skipped
    assert(rows(1).getString(2) == "GEOMETRYCOLLECTION (LINESTRING (0 0, 2 0), POINT (5 5))")
    assert(rows(1).getString(1) == "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")
    assert(rows(1).getInt(3) == 2)
    // an all-NULL group aggregates to NULL, like min/max
    val nulls = spark.sql(
      "SELECT st_extent_agg(g2) AS e, st_collect_agg(g2) AS c FROM " +
      "(SELECT CAST(NULL AS BINARY) AS g2 FROM range(3))").collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // a lone point folds to the degenerate zero-extent envelope
    assert(spark.sql("SELECT st_area(st_extent_agg(st_point(1.0D, 1.0D))) AS a " +
      "FROM range(1)").collect().head.getDouble(0) == 0.0)
    // st_makeline_agg: trip assembly ordered by seq, not arrival
    val trip = spark.sql(
      "SELECT st_astext(st_makeline_agg(st_point(x, y), s)) AS l FROM VALUES " +
      "(3.0D, 0.5D, 3), (1.0D, 1.0D, 1), (2.0D, 2.0D, 2) AS t(x, y, s)")
      .collect().head.getString(0)
    assert(trip == "LINESTRING (1 1, 2 2, 3 0.5)")
    // below 2 points there is no line -> NULL
    assert(spark.sql("SELECT st_makeline_agg(st_point(1.0D, 1.0D), 1) AS l " +
      "FROM range(1)").collect().head.isNullAt(0))
  }

  test("convex hull: rectangle from noisy points, collinear degrades, point identity (r12)") {
    val hull = Wkb.convexHull(wkt(
      "MULTIPOINT (0 0, 4 0, 4 3, 0 3, 2 1.5, 2 0, 0 1, 3.9 2.9)"))
    assert(text(hull) == "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")
    assert(Wkb.area(hull) == 12.0 && Wkb.npoints(hull) == 5)
    // collinear set -> the extreme-point linestring
    assert(text(Wkb.convexHull(wkt("MULTIPOINT (1 1, 3 3, 2 2, 5 5)"))) ==
      "LINESTRING (1 1, 5 5)")
    // single point -> itself; works over any geometry's vertices
    assert(text(Wkb.convexHull(Wkb.point(7, 8))) == "POINT (7 8)")
    assert(text(Wkb.convexHull(wkt("LINESTRING (0 0, 1 1, 2 0)"))) ==
      "POLYGON ((0 0, 2 0, 1 1, 0 0))")
    // duplicate points collapse
    assert(text(Wkb.convexHull(wkt("MULTIPOINT (1 1, 1 1, 1 1)"))) == "POINT (1 1)")
  }

  test("transform, GeoJSON, equals, boundary (r13)") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    // 4326 -> 3857: equator/prime-meridian fixpoints and a round-trip
    val R = 6378137.0
    val m = Wkb.transform(Wkb.point(90, 0), u8("EPSG:4326"), u8("EPSG:3857"))
    // y(equator) is ln(tan(pi/4)) ~ -1 ulp of 0, not exactly 0
    assert(Wkb.x(m) == R * math.Pi / 2 && math.abs(Wkb.y(m)) < 1e-8)
    val back = Wkb.transform(
      Wkb.transform(Wkb.point(12.5, 47.25), u8("EPSG:4326"), u8("EPSG:3857")),
      u8("EPSG:3857"), u8("EPSG:4326"))
    assert(math.abs(Wkb.x(back) - 12.5) < 1e-9 && math.abs(Wkb.y(back) - 47.25) < 1e-9)
    intercept[IllegalArgumentException](
      Wkb.transform(Wkb.point(0, 89), u8("EPSG:4326"), u8("EPSG:3857")))
    intercept[IllegalArgumentException](
      Wkb.transform(Wkb.point(0, 0), u8("EPSG:4326"), u8("EPSG:2154")))
    // GeoJSON: emit + parse round-trips through the same WKT
    val shapes = Seq(
      "POINT (1 2)", "LINESTRING (0 0, 1.5 2, 3 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((0 0), (2 3))", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))",
      "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 0))")
    shapes.foreach { w =>
      val g = wkt(w)
      val json = Wkb.asGeoJson(g)
      assert(text(Wkb.fromGeoJson(json)) == w, s"round-trip of $w via $json")
    }
    assert(Wkb.asGeoJson(Wkb.point(1, 2)).toString ==
      """{"type":"Point","coordinates":[1,2]}""")
    // altitude elements are tolerated and dropped; junk is loud
    assert(text(Wkb.fromGeoJson(u8(
      """{"type":"Point","coordinates":[3, 4, 99]}"""))) == "POINT (3 4)")
    intercept[IllegalArgumentException](
      Wkb.fromGeoJson(u8("""{"type":"Feature","geometry":null}""")))
    // st_equals: rotation/orientation/collinear-vertex insensitive
    assert(Wkb.geomEquals(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      wkt("POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))")))
    assert(Wkb.geomEquals(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      wkt("POLYGON ((0 0, 2 0, 4 0, 4 4, 0 4, 0 0))")), "collinear vertex added")
    assert(!Wkb.geomEquals(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4.5, 0 0))")))
    // boundary: rings, hole rings, line endpoints, closed line, point
    assert(text(Wkb.boundary(Wkb.makeEnvelope(0, 0, 2, 2))) ==
      "LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)")
    assert(Wkb.geometryType(Wkb.boundary(wkt(
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 4 3, 4 4, 3 4, 3 3))"))).toString ==
      "MULTILINESTRING")
    assert(text(Wkb.boundary(wkt("LINESTRING (0 0, 5 5)"))) == "MULTIPOINT ((0 0), (5 5))")
    assert(Wkb.boundary(wkt("LINESTRING (0 0, 1 0, 0 0)")) == null, "closed line")
    assert(Wkb.boundary(Wkb.point(1, 1)) == null)
  }

  test("st_simplify on polygon rings + st_normalize canonical form (r13)") {
    // a 1-unit bump on the bottom edge disappears at tol 2, closure kept
    val bumpy = wkt("POLYGON ((0 0, 4 1, 8 0, 8 8, 0 8, 0 0))")
    assert(text(Wkb.simplify(bumpy, 2.0)) == "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))")
    // tolerance too aggressive for the ring -> loud, never invalid output
    intercept[IllegalArgumentException](Wkb.simplify(bumpy, 100.0))
    // holes simplify too
    val holed = wkt("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 4 2.1, 6 2, 6 6, 2 6, 2 2))")
    assert(Wkb.numInteriorRings(Wkb.simplify(holed, 1.0)) == 1)
    assert(Wkb.npoints(Wkb.simplify(holed, 1.0)) == 10, "bump vertex dropped from the hole")
    // normalize: rotated + reversed ring and reordered members converge to
    // byte-identical WKB — the GROUP BY / exact-dedup determinism property
    val a = Wkb.normalize(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    val b = Wkb.normalize(wkt("POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))"))
    val c = Wkb.normalize(wkt("POLYGON ((0 4, 4 4, 4 0, 0 0, 0 4))")) // CW
    assert(java.util.Arrays.equals(a, b) && java.util.Arrays.equals(a, c))
    assert(text(a) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    // shells CCW, holes CW, holes sorted by start vertex
    val d1 = Wkb.normalize(wkt(
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5), (1 1, 2 1, 2 2, 1 2, 1 1))"))
    assert(text(d1) ==
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1), (5 5, 5 6, 6 6, 6 5, 5 5))")
    // multi members sort canonically
    assert(text(Wkb.normalize(wkt("MULTIPOINT ((5 5), (1 1), (3 3))"))) ==
      "MULTIPOINT ((1 1), (3 3), (5 5))")
  }

  test("spherical area: Girard excess nails the textbook identities (r13)") {
    val R = 6371008.8
    def rel(a: Double, b: Double) = math.abs(a - b) / b
    // hemisphere bounded by the equator: exactly 2*pi*R^2
    val hemi = Wkb.areaSphere(wkt("POLYGON ((0 0, 90 0, 180 0, 270 0, 0 0))"))
    assert(rel(hemi, 2 * math.Pi * R * R) < 1e-12)
    // octant: pi*R^2/2
    val oct = Wkb.areaSphere(wkt("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
    assert(rel(oct, math.Pi * R * R / 2) < 1e-12)
    // polar triangle with equatorial base dLon: excess = dLon exactly
    val pol = Wkb.areaSphere(wkt("POLYGON ((0 0, 30 0, 0 90, 0 0))"))
    assert(rel(pol, math.toRadians(30) * R * R) < 1e-12)
    // a small polygon converges to its planar area; a CONCAVE small L-shape
    // exercises the reflex-vertex branch (unsigned Girard would overshoot)
    val mPerDeg = math.Pi * R / 180
    val sq = Wkb.areaSphere(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert(rel(sq, mPerDeg * mPerDeg) < 1e-3)
    val ell = Wkb.areaSphere(wkt("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"))
    assert(rel(ell, 3 * mPerDeg * mPerDeg) < 1e-3, s"concave L: $ell")
    // orientation-insensitive; non-polygons are 0; loud on degenerate
    assert(Wkb.areaSphere(wkt("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")) ==
      Wkb.areaSphere(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))
    assert(Wkb.areaSphere(wkt("LINESTRING (0 0, 1 1)")) == 0.0)
    intercept[IllegalArgumentException](
      Wkb.areaSphere(wkt("POLYGON ((0 0, 1 0, 2 0, 0 0))")))
  }

  test("spheroid distance: Lambert vs sphere sanity (r12)") {
    val d0 = Wkb.distanceSpheroid(Wkb.point(0, 0), Wkb.point(0, 0))
    assert(d0 == 0.0)
    // one degree of latitude at the equator on WGS84 ~ 110.57 km (vs the
    // sphere's 111.19 km) — the flattening correction must pull it DOWN
    val dLat = Wkb.distanceSpheroid(Wkb.point(0, 0), Wkb.point(0, 1))
    assert(math.abs(dLat - 110574.0) < 100.0, s"got $dLat")
    // one degree of longitude at the equator ~ 111.32 km (equatorial radius)
    val dLon = Wkb.distanceSpheroid(Wkb.point(0, 0), Wkb.point(1, 0))
    assert(math.abs(dLon - 111319.0) < 100.0, s"got $dLon")
    // symmetric, and within 0.5% of the sphere at mid-latitudes
    val a = Wkb.point(10, 40); val b = Wkb.point(11, 41)
    assert(Wkb.distanceSpheroid(a, b) == Wkb.distanceSpheroid(b, a))
    val sph = Wkb.distanceSphere(a, b)
    assert(math.abs(Wkb.distanceSpheroid(a, b) - sph) / sph < 0.005)
  }

  test("point buffer: 32-gon approximation, loud out-of-scope (r12)") {
    val buf = Wkb.buffer(Wkb.point(2, 3), 1.0)
    assert(Wkb.npoints(buf) == 33 && Wkb.geometryType(buf).toString == "POLYGON")
    assert(math.abs(Wkb.area(buf) - 16 * math.sin(math.Pi / 16)) < 1e-12)
    assert(Wkb.contains(buf, Wkb.point(2, 3)))
    assert(Wkb.xmin(buf) == 1.0 && Wkb.xmax(buf) == 3.0)
    // quad_segs scales the fidelity: more segments -> area closer to pi r^2
    val fine = Wkb.buffer(Wkb.point(0, 0), 1.0, 64)
    assert(math.abs(Wkb.area(fine) - math.Pi) < 1e-3)
    intercept[IllegalArgumentException](Wkb.buffer(Wkb.point(0, 0), -1.0))
  }

  test("line/polygon buffer: Minkowski dilation, exact closed-form areas (r14)") {
    // straight line: 2rL rectangle + one full inscribed 32-gon from the
    // two end half-discs (n-gon vertices sit EXACTLY on the axes, so the
    // union cuts are closed-form)
    val lb = Wkb.buffer(wkt("LINESTRING (1 1, 4 1)"), 0.5)
    val a32 = 16 * 0.25 * math.sin(math.Pi / 16)
    assert(math.abs(Wkb.area(lb) - (3.0 + a32)) < 1e-12, s"got ${Wkb.area(lb)}")
    assert(Wkb.xmin(lb) == 0.5 && Wkb.xmax(lb) == 4.5 && Wkb.ymax(lb) == 1.5)
    assert(Wkb.contains(lb, Wkb.point(2.5, 1.0)))
    assert(!Wkb.intersects(lb, Wkb.point(6.0, 1.0)))
    // L-shaped line: rects overlap at the corner; area stays within the
    // capsule bounds (2rL + full disc <= area <= + corner fan)
    val el = Wkb.buffer(wkt("LINESTRING (0 0, 2 0, 2 2)"), 0.5)
    assert(Wkb.area(el) > 2 * 0.5 * 4 && Wkb.area(el) < 2 * 0.5 * 4 + 2 * a32)
    // polygon dilation: unit square + 4 edge rects + corner quarter-fans
    val pb = Wkb.buffer(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"), 0.5)
    assert(math.abs(Wkb.area(pb) - (1.0 + 2.0 + a32)) < 1e-12, s"got ${Wkb.area(pb)}")
    assert(Wkb.xmin(pb) == -0.5 && Wkb.ymax(pb) == 1.5)
    // donut dilation: the hole ERODES by r — its midpoint is covered once
    // the remaining hole is smaller than the 2r shrink... here hole 2x2,
    // r = 0.5 leaves a 1x1 open center
    val db = Wkb.buffer(
      wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"), 0.5)
    assert(Wkb.contains(db, Wkb.point(4.2, 4.2)), "hole shrank by r")
    assert(!Wkb.contains(db, Wkb.point(5.0, 5.0)), "hole center still open")
    // EMPTY buffers to EMPTY
    assert(Wkb.isEmpty(Wkb.buffer(wkt("POLYGON EMPTY"), 1.0)))
  }

  test("simplify: Douglas-Peucker keeps structure above tolerance (r12)") {
    val zig = wkt("LINESTRING (0 0, 1 0.1, 2 0, 3 5, 4 0, 5 0.1, 6 0)")
    // tol 1: the 0.1 wiggles collapse; the spike survives AND re-anchors
    // the recursion, so its shoulder points (1.7 from the sub-chords) stay
    assert(text(Wkb.simplify(zig, 1.0)) == "LINESTRING (0 0, 2 0, 3 5, 4 0, 6 0)")
    // tol 10: everything between the endpoints collapses
    assert(text(Wkb.simplify(zig, 10.0)) == "LINESTRING (0 0, 6 0)")
    // tol 0: every vertex survives (nothing is within 0 of a chord)
    assert(Wkb.npoints(Wkb.simplify(zig, 0.0)) == 7)
    // multilinestring recurses; points pass through; a polygon is in scope
    // since r13 (an envelope has no removable vertex at any tolerance)
    assert(Wkb.npoints(Wkb.simplify(
      wkt("MULTILINESTRING ((0 0, 1 0.1, 2 0), (0 0, 9 9))"), 1.0)) == 4)
    assert(text(Wkb.simplify(Wkb.point(1, 2), 1.0)) == "POINT (1 2)")
    assert(text(Wkb.simplify(Wkb.makeEnvelope(0, 0, 1, 1), 0.5)) ==
      text(Wkb.makeEnvelope(0, 0, 1, 1)))
  }

  test("covers/st_equals on linestrings: exact on-segment containment (r14)") {
    val a = wkt("LINESTRING (0 0, 2 0, 2 2)")
    assert(Wkb.geomEquals(a, a), "identity")
    assert(Wkb.geomEquals(a, wkt("LINESTRING (2 2, 2 0, 0 0)")), "reversed")
    assert(Wkb.geomEquals(a, wkt("LINESTRING (0 0, 1 0, 2 0, 2 2)")),
      "collinear vertex added")
    // sub-line that spans an interior vertex of a
    assert(Wkb.covers(a, wkt("LINESTRING (1 0, 2 0, 2 1)")))
    // point on a line's interior and at a vertex
    assert(Wkb.covers(a, Wkb.point(1, 0)) && Wkb.covers(a, Wkb.point(2, 2)))
    assert(!Wkb.covers(a, Wkb.point(1, 1)))
    // extends beyond / chord off the path / shorter line is NOT equal
    assert(!Wkb.covers(a, wkt("LINESTRING (0 0, 3 0)")))
    assert(!Wkb.covers(a, wkt("LINESTRING (0 0, 2 2)")))
    assert(!Wkb.geomEquals(a, wkt("LINESTRING (0 0, 2 0)")))
    assert(Wkb.covers(wkt("LINESTRING (0 0, 2 0)"), a) == false)
    // byte-identical multilinestrings are equal (per-member recursion)
    val m = wkt("MULTILINESTRING ((0 0, 1 0), (2 0, 3 0))")
    assert(Wkb.geomEquals(m, m))
    // a line spanning two TOUCHING members of a multilinestring is covered
    // (segment-soup flattening, r14 — previously a declared approximation)
    val touching = wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 3 0))")
    assert(Wkb.covers(touching, wkt("LINESTRING (0 0, 2 0)")))
    assert(Wkb.geomEquals(touching, wkt("LINESTRING (0 0, 3 0)")),
      "a split line equals its merged form")
    assert(!Wkb.covers(m, wkt("LINESTRING (0 0, 3 0)")),
      "a GAP between members still breaks coverage")
  }

  test("boundary follows the OGC mod-2 rule on multi-geometries (r14)") {
    // shared endpoint appears twice -> interior, dropped
    assert(text(Wkb.boundary(wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))"))) ==
      "MULTIPOINT ((0 0), (2 0))")
    // a 3-way junction appears three times -> odd, kept
    assert(text(Wkb.boundary(wkt(
      "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 1))"))) ==
      "MULTIPOINT ((0 0), (1 0), (2 0), (1 1))")
    // all-closed members -> no boundary (NULL, no EMPTY geometry — declared)
    assert(Wkb.boundary(wkt("MULTILINESTRING ((0 0, 1 0, 1 1, 0 0))")) == null)
    // multipolygon boundary is a MULTILINESTRING of all rings (incl. holes)
    val mp = Wkb.boundary(wkt(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 4 2, 4 4, 2 4, 2 2), (2.5 2.5, 3 2.5, 3 3, 2.5 3, 2.5 2.5)))"))
    assert(Wkb.geometryType(mp).toString == "MULTILINESTRING")
    assert(text(mp).split("\\(").length - 1 == 4, "outer x2 + hole rings, one line each")
    // multipoint has no boundary
    assert(Wkb.boundary(wkt("MULTIPOINT ((0 0), (1 1))")) == null)
  }

  test("overlay on polygons with holes: donut clip/diff/union, exact area algebra (r14)") {
    val donut = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(Wkb.area(donut) == 96.0)
    val r37 = Wkb.makeEnvelope(3, 3, 7, 7)
    // intersection loses the hole's part: 16 - 4
    assert(Wkb.area(Wkb.intersection(donut, r37)) == 12.0)
    assert(Wkb.area(Wkb.intersection(r37, donut)) == 12.0, "commutative with a holed side")
    // a rect fully inside the hole intersects nothing
    assert(Wkb.intersection(donut, Wkb.makeEnvelope(4.5, 4.5, 5.5, 5.5)) == null)
    // difference both ways: donut loses the non-hole overlap; the rect
    // KEEPS what sits in the donut's hole
    assert(Wkb.area(Wkb.difference(donut, r37)) == 84.0)
    assert(Wkb.area(Wkb.difference(r37, donut)) == 4.0)
    // subtracting the donut from its own shell leaves exactly the hole
    val hole = Wkb.difference(Wkb.makeEnvelope(0, 0, 10, 10), donut)
    assert(Wkb.area(hole) == 4.0)
    assert(Wkb.xmin(hole) == 4.0 && Wkb.xmax(hole) == 6.0)
    // union: inclusion-exclusion + exact extents
    val uni = Wkb.union(donut, r37)
    assert(Wkb.area(uni) == 96.0 + 16.0 - 12.0)
    assert(Wkb.xmin(uni) == 0.0 && Wkb.xmax(uni) == 10.0)
    // donut x donut, B's hole outside A: (Sa ∩ Sb) − Ha = 64 - 4
    val donutB = wkt(
      "POLYGON ((2 2, 12 2, 12 12, 2 12, 2 2), (10.5 10.5, 11.5 10.5, 11.5 11.5, 10.5 11.5, 10.5 10.5))")
    assert(Wkb.area(donutB) == 99.0)
    assert(Wkb.area(Wkb.intersection(donut, donutB)) == 60.0)
    assert(Wkb.area(Wkb.difference(donut, donutB)) == 96.0 - 60.0)
    val uniBB = Wkb.union(donut, donutB)
    assert(Wkb.area(uniBB) == 96.0 + 99.0 - 60.0)
    // union keeps B's hole a hole (it lies outside A, so nothing fills it)
    assert(!Wkb.contains(uniBB, Wkb.point(11.0, 11.0)))
    assert(Wkb.contains(uniBB, Wkb.point(5.0, 5.0)),
      "donut A's hole is covered by B in the union")
  }

  test("st_union_agg: cascaded dissolve — exact area/extent, hole plugging, NULLs (r14)") {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    // group 1: two overlapping rects (union 6) + a disjoint unit rect = 7
    // group 2: a donut + the exact rect plugging its hole = solid 10x10
    Seq((1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (1, "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))"),
        (1, "POLYGON ((5 0, 6 0, 6 1, 5 1, 5 0))"),
        (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"),
        (2, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),
        (2, null))
      .toDF("g", "wkt").createOrReplaceTempView("sunion")
    val rows = spark.sql(
      "SELECT g, ROUND(st_area(st_union_agg(st_geomfromtext(wkt))), 6) AS a, " +
      "st_xmin(st_union_agg(st_geomfromtext(wkt))) AS x1, " +
      "st_xmax(st_union_agg(st_geomfromtext(wkt))) AS x2, " +
      "st_contains(st_union_agg(st_geomfromtext(wkt)), st_point(5.0D, 5.0D)) AS mid " +
      "FROM sunion GROUP BY g ORDER BY g").collect()
    assert(rows(0).getDouble(1) == 7.0 && rows(0).getDouble(2) == 0.0 &&
      rows(0).getDouble(3) == 6.0)
    assert(rows(1).getDouble(1) == 100.0, "plugged donut dissolves to the full square")
    assert(rows(1).getBoolean(4), "the plugged hole's midpoint is inside the dissolve")
    assert(!rows(0).getBoolean(4))
    // all-NULL group -> NULL, like the other aggregates
    val n = spark.sql("SELECT st_union_agg(g2) AS u FROM " +
      "(SELECT CAST(NULL AS BINARY) AS g2 FROM range(3))").collect().head
    assert(n.isNullAt(0))
    // non-polygon input fails loudly
    intercept[Exception](spark.sql(
      "SELECT st_union_agg(st_point(1.0D, 1.0D)) FROM range(1)").collect())
  }

  test("touches/crosses/overlaps/containsproperly: the remaining OGC predicates (r14)") {
    val sq = Wkb.makeEnvelope(0, 0, 4, 4)
    // touches: edge contact, corner contact; overlap and containment do NOT touch
    assert(Wkb.touches(sq, Wkb.makeEnvelope(4, 0, 8, 4)), "shared edge")
    assert(Wkb.touches(sq, Wkb.makeEnvelope(4, 4, 6, 6)), "corner contact")
    assert(!Wkb.touches(sq, Wkb.makeEnvelope(2, 2, 6, 6)), "overlap is not touch")
    assert(!Wkb.touches(sq, Wkb.makeEnvelope(1, 1, 2, 2)), "containment is not touch")
    assert(!Wkb.touches(sq, sq), "self is not touch")
    assert(!Wkb.touches(sq, Wkb.makeEnvelope(10, 10, 11, 11)), "disjoint")
    // line touches polygon along the edge; line ENDING on the edge touches;
    // line passing through does not
    assert(Wkb.touches(wkt("LINESTRING (0 4, 4 4)"), sq))
    assert(Wkb.touches(wkt("LINESTRING (8 2, 4 2)"), sq), "line ends on the boundary")
    assert(!Wkb.touches(wkt("LINESTRING (-1 2, 5 2)"), sq), "line passes through")
    // line-line: endpoint meeting touches, T-contact touches (the shared
    // point is an ENDPOINT of one side, so II is empty), crossing doesn't
    val l1 = wkt("LINESTRING (0 0, 2 0)")
    assert(Wkb.touches(l1, wkt("LINESTRING (2 0, 4 1)")), "endpoint to endpoint")
    assert(Wkb.touches(l1, wkt("LINESTRING (1 0, 1 5)")), "T-contact")
    assert(Wkb.touches(wkt("LINESTRING (1 0, 1 5)"), l1), "symmetric")
    assert(!Wkb.touches(l1, wkt("LINESTRING (1 -1, 1 1)")), "proper crossing")
    assert(!Wkb.touches(l1, wkt("LINESTRING (1 0, 3 0)")), "collinear overlap")
    // crosses
    assert(Wkb.crosses(wkt("LINESTRING (1 -1, 1 1)"), l1), "line x line at a point")
    assert(!Wkb.crosses(wkt("LINESTRING (1 0, 3 0)"), l1), "collinear overlap is not a cross")
    assert(Wkb.crosses(wkt("LINESTRING (-1 2, 5 2)"), sq), "line through the area")
    assert(!Wkb.crosses(wkt("LINESTRING (1 1, 3 3)"), sq), "line fully inside does not cross")
    assert(!Wkb.crosses(sq, Wkb.makeEnvelope(2, 2, 6, 6)), "area x area never crosses")
    // overlaps
    assert(Wkb.overlaps(sq, Wkb.makeEnvelope(2, 2, 6, 6)))
    assert(!Wkb.overlaps(sq, Wkb.makeEnvelope(1, 1, 2, 2)), "containment is not overlap")
    assert(!Wkb.overlaps(sq, sq), "equal is not overlap")
    assert(!Wkb.overlaps(sq, Wkb.makeEnvelope(4, 0, 8, 4)), "touch is not overlap")
    assert(Wkb.overlaps(l1, wkt("LINESTRING (1 0, 3 0)")), "partial collinear lines overlap")
    assert(!Wkb.overlaps(sq, l1), "mixed dimensions never overlap")
    // containsproperly
    assert(Wkb.containsProperly(sq, Wkb.makeEnvelope(1, 1, 2, 2)))
    assert(!Wkb.containsProperly(sq, Wkb.makeEnvelope(0, 0, 2, 2)),
      "boundary contact disqualifies")
    assert(!Wkb.containsProperly(sq, sq))
    assert(Wkb.containsProperly(sq, Wkb.point(2, 2)))
    assert(!Wkb.containsProperly(sq, Wkb.point(0, 2)), "point on boundary")
  }

  test("structure accessors: wkb/hex codecs, dump, isclosed/isring, makepolygon, multi (r14)") {
    val sq = Wkb.makeEnvelope(0, 0, 2, 2)
    // hex round-trip and canonicalizing wkb round-trip
    assert(java.util.Arrays.equals(Wkb.fromHexWkb(Wkb.asHexWkb(sq)), sq))
    assert(java.util.Arrays.equals(Wkb.asWkb(sq), sq))
    assert(java.util.Arrays.equals(Wkb.fromWkb(sq), sq))
    // big-endian input canonicalizes to little-endian
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte).putInt(1).putDouble(3.0).putDouble(4.0)
    assert(text(Wkb.fromWkb(be.array())) == "POINT (3 4)")
    assert(Wkb.dimension(sq) == 2 && Wkb.dimension(Wkb.point(0, 0)) == 0 &&
      Wkb.dimension(wkt("LINESTRING (0 0, 1 1)")) == 1)
    assert(Wkb.dimension(wkt("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))")) == 1)
    // isclosed / isring / makepolygon
    val ring = wkt("LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)")
    assert(Wkb.isClosed(ring) && !Wkb.isClosed(wkt("LINESTRING (0 0, 1 1)")))
    assert(Wkb.isRing(ring))
    assert(!Wkb.isRing(wkt("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")), "bowtie is closed but not simple")
    assert(Wkb.area(Wkb.makePolygon(ring)) == 4.0)
    intercept[IllegalArgumentException](Wkb.makePolygon(wkt("LINESTRING (0 0, 1 1)")))
    // multi / dump
    assert(text(Wkb.multi(Wkb.point(1, 2))) == "MULTIPOINT ((1 2))")
    assert(text(Wkb.multi(sq)).startsWith("MULTIPOLYGON"))
    val parts = Wkb.dump(wkt("MULTIPOINT ((0 0), (1 1))"))
    assert(parts.numElements() == 2)
    assert(text(parts.getBinary(0)) == "POINT (0 0)")
  }

  test("st_makevalid nodes self-crossings; simplifypreservetopology never invalidates (r14)") {
    // bowtie -> two triangles, same filled area (even-odd), now valid
    val bowtie = wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert(!Wkb.isValid(bowtie))
    val fixed = Wkb.makeValid(bowtie)
    assert(Wkb.isValid(fixed))
    assert(Wkb.geometryType(fixed).toString == "MULTIPOLYGON")
    assert(Wkb.area(fixed) == 2.0, "two unit triangles")
    assert(Wkb.npoints(fixed) == 8)
    // vertex-revisit figure-eight splits at the shared vertex
    val eight = wkt("POLYGON ((0 0, 1 1, 2 0, 1 -1, 1 1, 0 2, -1 1, 1 1, 0 0))")
    val fixed8 = Wkb.makeValid(eight)
    assert(Wkb.isValid(fixed8))
    // valid input passes through bit-identical
    val ok = Wkb.makeEnvelope(0, 0, 3, 3)
    assert(java.util.Arrays.equals(Wkb.makeValid(ok), ok))
    // simplifypreservetopology: aggressive tolerance would collapse this
    // thin zigzag ring — the ring keeps its original vertices instead
    val thin = wkt("POLYGON ((0 0, 4 0, 4 0.2, 0 0.2, 0 0))")
    val spt = Wkb.simplifyPreserveTopology(thin, 10.0)
    assert(Wkb.isValid(spt) && Wkb.area(spt) == Wkb.area(thin))
    // where plain simplify stays valid, both agree
    val poly = wkt("POLYGON ((0 0, 2 0.05, 4 0, 4 4, 0 4, 0 0))")
    assert(text(Wkb.simplifyPreserveTopology(poly, 0.1)) == text(Wkb.simplify(poly, 0.1)))
    // lines simplify as usual
    assert(Wkb.npoints(Wkb.simplifyPreserveTopology(
      wkt("LINESTRING (0 0, 1 0.01, 2 0)"), 0.5)) == 2)
  }

  test("linemerge/hilbert/quadkey/reduceprecision/intersects_extent/collect-list (r14)") {
    // linemerge: two chains join through a degree-2 joint; a 3-way
    // junction stays split (GEOS semantics)
    val merged = Wkb.lineMerge(wkt(
      "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (2 0, 3 1))"))
    assert(text(merged) == "LINESTRING (0 0, 1 0, 2 0, 3 1)")
    val junction = Wkb.lineMerge(wkt(
      "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 1))"))
    assert(Wkb.geometryType(junction).toString == "MULTILINESTRING",
      "3-way junction must not merge")
    assert(Wkb.npoints(junction) == 6)
    // reversed orientation still merges
    assert(text(Wkb.lineMerge(wkt("MULTILINESTRING ((1 0, 0 0), (1 0, 2 0))"))) ==
      "LINESTRING (0 0, 1 0, 2 0)" ||
      text(Wkb.lineMerge(wkt("MULTILINESTRING ((1 0, 0 0), (1 0, 2 0))"))) ==
      "LINESTRING (2 0, 1 0, 0 0)")
    // hilbert: locality — neighbors closer than far points, bounded range
    val box = Wkb.makeEnvelope(0, 0, 100, 100)
    val h1 = Wkb.hilbert(Wkb.point(10, 10), box)
    val h2 = Wkb.hilbert(Wkb.point(10.01, 10.01), box)
    val h3 = Wkb.hilbert(Wkb.point(90, 90), box)
    assert(math.abs(h1 - h2) < math.abs(h1 - h3), "hilbert preserves locality")
    assert(h1 >= 0 && h1 < (1L << 32))
    // quadkey: known Bing example — (-122.349693, 47.620171) level 3 = "021"
    assert(Wkb.quadKey(Wkb.point(-122.349693, 47.620171), 3).toString == "021")
    assert(Wkb.quadKey(Wkb.point(0.1, 0.1), 1).toString == "1")
    intercept[IllegalArgumentException](Wkb.quadKey(Wkb.point(200, 0), 3))
    // reduceprecision: half-even, no -0.0 leak
    assert(text(Wkb.reducePrecision(Wkb.point(1.26, -0.04), 0.1)) == "POINT (1.3 0)")
    assert(java.lang.Double.doubleToRawLongBits(
      Wkb.x(Wkb.reducePrecision(Wkb.point(-0.04, 0), 0.1))) == 0L)
    // intersects_extent: bbox-only (true even when exact geometries miss)
    val tri1 = wkt("POLYGON ((0 0, 4 0, 0 4, 0 0))")
    val tri2 = wkt("POLYGON ((4 4, 3 4, 4 3, 4 4))")
    assert(Wkb.intersectsExtent(tri1, tri2), "bboxes overlap")
    assert(!Wkb.intersects(tri1, tri2), "...but the triangles do not")
    assert(!Wkb.intersectsExtent(tri1, Wkb.makeEnvelope(10, 10, 11, 11)))
  }

  test("curve geometries: parse/print round-trip, st_curvetoline linearization (r14)") {
    // WKT round-trips for every curve kind (and their EMPTY forms)
    val texts = Seq(
      "CIRCULARSTRING (0 0, 1 1, 2 0)",
      "CIRCULARSTRING (0 0, 1 1, 2 0, 3 -1, 4 0)",
      "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 4 0))",
      "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 0 0)))",
      "CURVEPOLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), CIRCULARSTRING (1 1, 2 2, 3 1, 2 0.5, 1 1))",
      "MULTICURVE ((0 0, 1 0), CIRCULARSTRING (0 0, 1 1, 2 0))",
      "MULTISURFACE (((0 0, 1 0, 1 1, 0 1, 0 0)), CURVEPOLYGON (CIRCULARSTRING (4 0, 5 1, 6 0, 5 -1, 4 0)))",
      "CIRCULARSTRING EMPTY", "COMPOUNDCURVE EMPTY", "CURVEPOLYGON EMPTY",
      "MULTICURVE EMPTY", "MULTISURFACE EMPTY")
    texts.foreach { t =>
      assert(text(wkt(t)) == t, s"WKT round-trip of '$t'")
      // WKB round-trip too (write + re-read)
      assert(Wkb.asText(Wkb.fromText(Wkb.asText(wkt(t)))).toString == t)
    }
    assert(Wkb.geometryType(wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")).toString == "CIRCULARSTRING")
    assert(Wkb.npoints(wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")) == 3)
    assert(Wkb.isEmpty(wkt("CURVEPOLYGON EMPTY")))
    // the linear kernel refuses curves LOUDLY (no silent approximation)
    intercept[IllegalArgumentException](Wkb.area(wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 1 1, 2 0, 1 -1, 0 0))")))
    intercept[IllegalArgumentException](Wkb.intersects(
      wkt("CIRCULARSTRING (0 0, 1 1, 2 0)"), Wkb.point(1, 1)))
    // semicircle linearization: 16 chords at quad_segs 8, exact endpoints,
    // closed-form chord-sum length 32 sin(pi/32)
    val semi = Wkb.curveToLine(wkt("CIRCULARSTRING (0 0, 1 1, 2 0)"))
    assert(Wkb.geometryType(semi).toString == "LINESTRING" && Wkb.npoints(semi) == 17)
    assert(math.abs(Wkb.length(semi) - 32 * math.sin(math.Pi / 32)) < 1e-12)
    assert(Wkb.xmin(semi) == 0.0 && Wkb.xmax(semi) == 2.0, "control endpoints bit-exact")
    assert(math.abs(Wkb.ymax(semi) - 1.0) < 1e-15)
    // half-disc CURVEPOLYGON -> polygon, area = half the inscribed 32-gon
    val half = Wkb.curveToLine(wkt(
      "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 0 0)))"))
    assert(Wkb.geometryType(half).toString == "POLYGON")
    assert(math.abs(Wkb.area(half) - 8 * math.sin(math.Pi / 16)) < 1e-12)
    // full circle via p0 == p2: one closed ring, area of the inscribed 32-gon
    val circle = Wkb.curveToLine(wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0))"))
    assert(math.abs(Wkb.area(circle) - 16 * math.sin(math.Pi / 16)) < 1e-12)
    // quad_segs scales fidelity toward pi r^2
    val fine = Wkb.curveToLine(wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 2 0, 0 0))"), 64)
    assert(math.abs(Wkb.area(fine) - math.Pi) < 1e-3)
    // collinear arc degenerates to the straight segments
    assert(text(Wkb.curveToLine(wkt("CIRCULARSTRING (0 0, 1 0, 2 0)"))) ==
      "LINESTRING (0 0, 1 0, 2 0)")
    // multisurface -> multipolygon; multicurve -> multilinestring
    assert(Wkb.geometryType(Wkb.curveToLine(wkt(
      "MULTISURFACE (((0 0, 1 0, 1 1, 0 1, 0 0)), CURVEPOLYGON (CIRCULARSTRING (4 0, 6 0, 4 0)))"))).toString == "MULTIPOLYGON")
    assert(Wkb.geometryType(Wkb.curveToLine(wkt(
      "MULTICURVE ((0 0, 1 0), CIRCULARSTRING (0 0, 1 1, 2 0))"))).toString == "MULTILINESTRING")
    // linear kinds pass through unchanged
    assert(text(Wkb.curveToLine(Wkb.makeEnvelope(0, 0, 1, 1))) ==
      text(Wkb.makeEnvelope(0, 0, 1, 1)))
  }

  test("st_outline: minimal boundary from piece decompositions (r14)") {
    // partial-overlap union -> the true L-corner octagon, canonical start
    val u = Wkb.union(Wkb.makeEnvelope(0, 0, 4, 4), Wkb.makeEnvelope(2, 2, 6, 6))
    assert(text(Wkb.outlineOf(u)) ==
      "POLYGON ((0 0, 4 0, 4 2, 6 2, 6 6, 2 6, 2 4, 0 4, 0 0))")
    assert(Wkb.area(Wkb.outlineOf(u)) == Wkb.area(u), "outline preserves area")
    // concave x concave union (L-shapes): area preserved, single shell
    val ell = wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val ell2 = Wkb.translate(ell, 1.0, 1.0)
    val uo = Wkb.outlineOf(Wkb.union(ell, ell2))
    assert(Wkb.area(uo) == 19.0 && Wkb.geometryType(uo).toString == "POLYGON")
    // disjoint members stay two shells, ordered by (xmin, ymin)
    val two = Wkb.outlineOf(Wkb.union(
      Wkb.makeEnvelope(10, 10, 11, 11), Wkb.makeEnvelope(0, 0, 1, 1)))
    assert(text(two) ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 11 10, 11 11, 10 11, 10 10)))")
    // corner touch -> two simple rings, not a figure-eight
    val touch = Wkb.outlineOf(Wkb.union(
      Wkb.makeEnvelope(0, 0, 1, 1), Wkb.makeEnvelope(1, 1, 2, 2)))
    assert(Wkb.geometryType(touch).toString == "MULTIPOLYGON")
    assert(Wkb.area(touch) == 2.0)
    // four rects tiling a frame -> shell + CW hole
    val frame = Seq(
      Wkb.makeEnvelope(0, 0, 1, 3), Wkb.makeEnvelope(2, 0, 3, 3),
      Wkb.makeEnvelope(1, 0, 2, 1), Wkb.makeEnvelope(1, 2, 2, 3))
      .reduce((a, b) => Wkb.union(a, b))
    assert(text(Wkb.outlineOf(frame)) ==
      "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))")
    // plugging a donut's hole dissolves to the solid square
    val donut = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val plugged = Wkb.union(donut, wkt("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"))
    assert(text(Wkb.outlineOf(plugged)) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // identity on an already-minimal polygon; loud on non-tiling members
    assert(text(Wkb.outlineOf(Wkb.makeEnvelope(0, 0, 2, 2))) ==
      "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    intercept[IllegalArgumentException](Wkb.outlineOf(wkt(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))")))
  }

  test("EMPTY geometries: parse/print round-trip, empty-set semantics (r14)") {
    val types = Seq("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
      "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")
    for (t <- types) {
      val e = wkt(s"$t EMPTY")
      assert(text(e) == s"$t EMPTY", s"$t WKT round-trip")
      // WKB round-trip (parse of the written bytes)
      assert(text(Wkb.fromText(Wkb.asText(e))) == s"$t EMPTY")
      assert(Wkb.isEmpty(e) && Wkb.geometryType(e).toString == t)
      assert(Wkb.area(e) == 0.0 && Wkb.npoints(e) == 0)
      assert(Wkb.isValid(e), "OGC: empty geometries are valid")
    }
    val e = wkt("POLYGON EMPTY")
    val box = Wkb.makeEnvelope(0, 0, 2, 2)
    assert(!Wkb.isEmpty(box))
    // predicates: the empty set intersects/contains/covers nothing
    assert(!Wkb.intersects(e, box) && !Wkb.intersects(box, e))
    assert(!Wkb.contains(box, e) && !Wkb.covers(box, e) && !Wkb.contains(e, box))
    assert(Wkb.disjoint(e, box))
    // equality: two empties are the same (empty) point set
    assert(Wkb.geomEquals(e, wkt("LINESTRING EMPTY")))
    assert(!Wkb.geomEquals(e, box) && !Wkb.geomEquals(box, e))
    // overlay identity/annihilator laws
    assert(Wkb.intersection(box, e) == null && Wkb.intersection(e, box) == null)
    assert(Wkb.area(Wkb.difference(box, e)) == 4.0)
    assert(Wkb.difference(e, box) == null)
    assert(Wkb.area(Wkb.union(box, e)) == 4.0 && Wkb.area(Wkb.union(e, box)) == 4.0)
    assert(Wkb.union(e, wkt("POINT EMPTY")) == null)
    // boundary of nothing is nothing; length 0
    assert(Wkb.boundary(wkt("LINESTRING EMPTY")) == null)
    assert(Wkb.length(wkt("LINESTRING EMPTY")) == 0.0)
    // coordinate accessors fail LOUDLY instead of crashing obscurely
    intercept[IllegalArgumentException](Wkb.x(wkt("POINT EMPTY")))
    intercept[IllegalArgumentException](Wkb.xmin(e))
  }

  test("snapToGrid rounds halfway values away from the origin (r14)") {
    assert(text(Wkb.snapToGrid(Wkb.point(-0.5, 0.5), 1.0)) == "POINT (-1 1)")
    assert(text(Wkb.snapToGrid(Wkb.point(-1.5, 1.5), 1.0)) == "POINT (-2 2)")
    // no -0.0 leaks out of the sign-aware form (the driver hashes raw bits)
    val z = Wkb.snapToGrid(Wkb.point(-0.2, -0.4), 1.0)
    assert(java.lang.Double.doubleToRawLongBits(Wkb.x(z)) == 0L)
    assert(java.lang.Double.doubleToRawLongBits(Wkb.y(z)) == 0L)
  }

  test("EMPTY members inside multis + whole-geometry mod-2 II (r15 ADVICE)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built WKB: MULTILINESTRING (EMPTY, (0 0, 1 1)) — zero-count
    // member mixed with a real one passes the isEmptyG gate; previously
    // wktOf/boundary crashed on rings(0)
    val lb = ByteBuffer.allocate(9 + 9 + 9 + 32).order(ByteOrder.LITTLE_ENDIAN)
    lb.put(1.toByte).putInt(5).putInt(2)
    lb.put(1.toByte).putInt(2).putInt(0) // LINESTRING EMPTY member
    lb.put(1.toByte).putInt(2).putInt(2)
    lb.putDouble(0).putDouble(0).putDouble(1).putDouble(1)
    val mls = lb.array()
    assert(text(mls) == "MULTILINESTRING (EMPTY, (0 0, 1 1))")
    assert(text(Wkb.boundary(mls)) == "MULTIPOINT ((0 0), (1 1))",
      "boundary's mod-2 fold skips the empty member")
    // MULTIPOINT mixing a NaN-encoded EMPTY member with a real one
    val pb = ByteBuffer.allocate(9 + 21 + 21).order(ByteOrder.LITTLE_ENDIAN)
    pb.put(1.toByte).putInt(4).putInt(2)
    pb.put(1.toByte).putInt(1).putDouble(Double.NaN).putDouble(Double.NaN)
    pb.put(1.toByte).putInt(1).putDouble(2).putDouble(3)
    assert(text(pb.array()) == "MULTIPOINT (EMPTY, (2 3))")

    // mod-2 applies to the WHOLE multi: (1,1) is a member-endpoint on both
    // sides but with even multiplicity -> interior of BOTH -> the point
    // contact is II -> crosses, not touches (per-member recursion got this
    // backwards)
    val a = wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))")
    val b = wkt("MULTILINESTRING ((0 2, 1 1), (1 1, 2 2))")
    assert(Wkb.crosses(a, b), "even-multiplicity contact is interior-interior")
    assert(!Wkb.touches(a, b))
    // odd multiplicity on one side (a true boundary point of c) still touches
    val c = wkt("MULTILINESTRING ((1 1, 3 3), (3 3, 4 0))")
    assert(Wkb.touches(a, c) && !Wkb.crosses(a, c))
  }
}
