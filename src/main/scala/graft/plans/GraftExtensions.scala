package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, registered via `spark.sql.extensions` — the public
  * Spark extension point (SURVEY.md §2 custom-operator preference (b)):
  * native codegen expressions for the vector-similarity hot path, callable
  * from SQL and the DataFrame API as `graft_cosine(a, b)` / `graft_dot(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(PseudoFunctionFold)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - single-pass cosine similarity of two double arrays"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8"),
      info("graft_sq8", "graft_sq8(a) - symmetric absmax int8 scalar quantization of a double array"),
      (children: Seq[Expression]) => Sq8Quantize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      info("graft_lsh_buckets",
        "graft_lsh_buckets(a[, bitsPerBand, bands]) - hyperplane-LSH band buckets of a double array"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => HyperplaneBuckets(v)
        case Seq(v, b, n) => HyperplaneBuckets(v,
          b.eval().asInstanceOf[Number].intValue(), n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("graft_lsh_buckets takes 1 or 3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      info("graft_zorder",
        "graft_zorder(x, y) - Morton/Z-order interleave of the low 16 bits of two integral keys"),
      (children: Seq[Expression]) => ZOrderValue(children(0), children(1))))
    // DuckDB-dialect aliases (string_split, list_*, regexp_matches) so
    // reference-dialect SQL runs verbatim — see DuckDbCompat.
    DuckDbCompat.functions.foreach(ext.injectFunction)
    // ST_* spatial core over WKB (the reference preloads DuckDB spatial;
    // see plans.Wkb for the declared scope). Each function is a codegen'd
    // static call (StaticInvoke) into the Wkb kernel.
    spatialFunctions.foreach(ext.injectFunction)
    // Spatial AGGREGATES (r13): the analyzer wraps a bare AggregateFunction
    // from a function builder in AggregateExpression, same as built-ins.
    ext.injectFunction((
      FunctionIdentifier("st_extent_agg"),
      new ExpressionInfo(classOf[StExtentAgg].getName, null, "st_extent_agg",
        "st_extent_agg(geom) - envelope of a group (constant-space min/max fold)", ""),
      (children: Seq[Expression]) => StExtentAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("st_collect_agg"),
      new ExpressionInfo(classOf[StCollectAgg].getName, null, "st_collect_agg",
        "st_collect_agg(geom) - group members as MULTI*/GEOMETRYCOLLECTION, canonical order", ""),
      (children: Seq[Expression]) => StCollectAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("st_makeline_agg"),
      new ExpressionInfo(classOf[StMakeLineAgg].getName, null, "st_makeline_agg",
        "st_makeline_agg(point, seq) - the group's points as a LINESTRING in seq order " +
          "(trip assembly); NULL below 2 points", ""),
      (children: Seq[Expression]) => StMakeLineAgg(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("st_union_agg"),
      new ExpressionInfo(classOf[StUnionAgg].getName, null, "st_union_agg",
        "st_union_agg(geom) - cascaded polygon union (dissolve); exact in " +
          "area/extent, piece decomposition not outline-traced", ""),
      (children: Seq[Expression]) => StUnionAgg(children.head)))
  }

  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.types._

  private val B = BinaryType
  private val D = DoubleType

  private def st(name: String, method: String, ret: DataType, args: Seq[DataType],
      usage: String): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(Wkb.getClass.getName, null, name, usage, ""),
    (children: Seq[Expression]) => {
      if (children.length != args.length)
        throw new IllegalArgumentException(s"$name takes ${args.length} argument(s)")
      StaticInvoke(Wkb.getClass, ret, method, children, inputTypes = args)
    })

  /** DuckDB-spatial-named surface; geometry values are WKB binary columns
    * (the same encoding [[graft.types.TypeMapping]] tags as GeoArrow on the
    * wire).
    */
  private def spatialFunctions = Seq(
    st("st_point", "point", B, Seq(D, D), "st_point(x, y) - WKB point"),
    st("st_makeenvelope", "makeEnvelope", B, Seq(D, D, D, D),
      "st_makeenvelope(xmin, ymin, xmax, ymax) - axis-aligned WKB polygon"),
    st("st_geomfromtext", "fromText", B, Seq(StringType),
      "st_geomfromtext(wkt) - parse POINT/LINESTRING/POLYGON WKT to WKB"),
    st("st_astext", "asText", StringType, Seq(B), "st_astext(geom) - WKT text"),
    st("st_geometrytype", "geometryType", StringType, Seq(B),
      "st_geometrytype(geom) - POINT | LINESTRING | POLYGON"),
    st("st_x", "x", D, Seq(B), "st_x(point) - x coordinate"),
    st("st_y", "y", D, Seq(B), "st_y(point) - y coordinate"),
    st("st_xmin", "xmin", D, Seq(B), "st_xmin(geom) - minimum x"),
    st("st_xmax", "xmax", D, Seq(B), "st_xmax(geom) - maximum x"),
    st("st_ymin", "ymin", D, Seq(B), "st_ymin(geom) - minimum y"),
    st("st_ymax", "ymax", D, Seq(B), "st_ymax(geom) - maximum y"),
    st("st_npoints", "npoints", IntegerType, Seq(B), "st_npoints(geom) - vertex count"),
    st("st_area", "area", D, Seq(B), "st_area(geom) - shoelace area (holes subtracted)"),
    st("st_length", "length", D, Seq(B), "st_length(geom) - linestring length"),
    st("st_perimeter", "perimeter", D, Seq(B), "st_perimeter(geom) - polygon ring length"),
    st("st_distance", "distance", D, Seq(B, B),
      "st_distance(a, b) - planar minimum distance (0 when intersecting)"),
    st("st_dwithin", "dwithin", BooleanType, Seq(B, B, D),
      "st_dwithin(a, b, d) - st_distance(a, b) <= d"),
    st("st_intersects", "intersects", BooleanType, Seq(B, B),
      "st_intersects(a, b) - geometries share at least one point"),
    st("st_contains", "contains", BooleanType, Seq(B, B),
      "st_contains(a, b) - OGC contains (boundary points not contained)"),
    st("st_within", "within", BooleanType, Seq(B, B), "st_within(a, b) - st_contains(b, a)"),
    st("st_disjoint", "disjoint", BooleanType, Seq(B, B),
      "st_disjoint(a, b) - NOT st_intersects(a, b)"),
    st("st_covers", "covers", BooleanType, Seq(B, B),
      "st_covers(a, b) - OGC covers (boundary-inclusive contains)"),
    st("st_coveredby", "coveredBy", BooleanType, Seq(B, B),
      "st_coveredby(a, b) - st_covers(b, a)"),
    st("st_centroid", "centroid", B, Seq(B),
      "st_centroid(geom) - area/length-weighted centroid point"),
    st("st_envelope", "envelopeOf", B, Seq(B),
      "st_envelope(geom) - axis-aligned bounding-box polygon"),
    st("st_makeline", "makeLine", B, Seq(B, B),
      "st_makeline(a, b) - two-point linestring"),
    st("st_translate", "translate", B, Seq(B, D, D),
      "st_translate(geom, dx, dy) - shifted geometry"),
    st("st_flipcoordinates", "flipCoordinates", B, Seq(B),
      "st_flipcoordinates(geom) - swap x and y of every vertex"),
    st("st_startpoint", "startPoint", B, Seq(B), "st_startpoint(line) - first vertex"),
    st("st_endpoint", "endPoint", B, Seq(B), "st_endpoint(line) - last vertex"),
    st("st_pointn", "pointN", B, Seq(B, IntegerType),
      "st_pointn(line, n) - 1-based nth vertex"),
    st("st_numpoints", "npoints", IntegerType, Seq(B),
      "st_numpoints(geom) - vertex count (alias of st_npoints)"),
    st("st_exteriorring", "exteriorRing", B, Seq(B),
      "st_exteriorring(polygon) - shell ring as a linestring"),
    st("st_numinteriorrings", "numInteriorRings", IntegerType, Seq(B),
      "st_numinteriorrings(polygon) - hole count"),
    st("st_distance_sphere", "distanceSphere", D, Seq(B, B),
      "st_distance_sphere(a, b) - haversine meters on the IUGG mean sphere, (lon, lat) degrees"),
    st("st_numgeometries", "numGeometries", IntegerType, Seq(B),
      "st_numgeometries(geom) - member count (1 for simple geometries)"),
    st("st_geometryn", "geometryN", B, Seq(B, IntegerType),
      "st_geometryn(geom, n) - 1-based member of a multi-geometry"),
    st("st_collectionextract", "collectionExtract", B, Seq(B, IntegerType),
      "st_collectionextract(geom, kind) - members of kind 1/2/3 as a multi-geometry"),
    st("st_intersection", "intersection", B, Seq(B, B),
      "st_intersection(a, b) - polygon clip, total on simple hole-free pairs " +
        "(interval path for rectangles, Sutherland-Hodgman with ear-triangulated " +
        "concave clips; NULL when disjoint)"),
    st("st_union", "union", B, Seq(B, B),
      "st_union(a, b) - covering rectangle for nested/tiling rectangles, else the " +
        "exact-area piece decomposition (a-b pieces) + b"),
    st("st_difference", "difference", B, Seq(B, B),
      "st_difference(a, b) - a minus b (half-plane decomposition per convex piece; " +
        "NULL when fully covered)"),
    st("st_convexhull", "convexHull", B, Seq(B),
      "st_convexhull(geom) - monotone-chain convex hull (polygon/line/point by rank)"),
    st("st_distance_spheroid", "distanceSpheroid", D, Seq(B, B),
      "st_distance_spheroid(a, b) - WGS84 Lambert ellipsoidal meters, (lon, lat) degrees"),
    st("st_buffer", "buffer", B, Seq(B, D),
      "st_buffer(geom, r) - Minkowski dilation by an inscribed 32-gon disc " +
        "(GEOS quad_segs=8; points/lines/polygons incl. holes; r > 0)"),
    st("st_simplify", "simplify", B, Seq(B, D),
      "st_simplify(geom, tol) - Douglas-Peucker (linestrings + polygon rings)"),
    st("st_isvalid", "isValid", BooleanType, Seq(B),
      "st_isvalid(geom) - OGC validity (simple rings, holes strictly inside, " +
        "holes disjoint; per-member for multis)"),
    st("st_isempty", "isEmpty", BooleanType, Seq(B),
      "st_isempty(geom) - TRUE for the empty point set (TYPE EMPTY)"),
    st("st_touches", "touches", BooleanType, Seq(B, B),
      "st_touches(a, b) - intersect on boundaries only (DE-9IM II empty)"),
    st("st_crosses", "crosses", BooleanType, Seq(B, B),
      "st_crosses(a, b) - interiors meet in a lower dimension (line/line points, line through area)"),
    st("st_overlaps", "overlaps", BooleanType, Seq(B, B),
      "st_overlaps(a, b) - same dimension, interiors intersect, neither covers the other"),
    st("st_containsproperly", "containsProperly", BooleanType, Seq(B, B),
      "st_containsproperly(a, b) - b intersects only a's interior (no boundary contact)"),
    st("st_aswkb", "asWkb", B, Seq(B), "st_aswkb(geom) - the WKB bytes (identity encoding)"),
    st("st_geomfromwkb", "fromWkb", B, Seq(B),
      "st_geomfromwkb(blob) - validate + canonicalize WKB (big-endian/EWKB accepted)"),
    st("st_ashexwkb", "asHexWkb", StringType, Seq(B), "st_ashexwkb(geom) - uppercase hex WKB"),
    st("st_geomfromhexwkb", "fromHexWkb", B, Seq(StringType),
      "st_geomfromhexwkb(text) - parse hex WKB"),
    st("st_dimension", "dimension", IntegerType, Seq(B),
      "st_dimension(geom) - topological dimension 0/1/2"),
    st("st_isclosed", "isClosed", BooleanType, Seq(B),
      "st_isclosed(geom) - first vertex equals last (per member)"),
    st("st_isring", "isRing", BooleanType, Seq(B),
      "st_isring(line) - closed and simple"),
    st("st_makepolygon", "makePolygon", B, Seq(B),
      "st_makepolygon(line) - closed linestring shell -> polygon"),
    st("st_multi", "multi", B, Seq(B),
      "st_multi(geom) - wrap a simple geometry in its MULTI form"),
    st("st_dump", "dump", ArrayType(BinaryType), Seq(B),
      "st_dump(geom) - array of the simple members (explode for rows)"),
    st("st_collect", "collectList", B, Seq(ArrayType(BinaryType)),
      "st_collect(list) - combine a geometry list into MULTI*/GEOMETRYCOLLECTION"),
    st("st_intersects_extent", "intersectsExtent", BooleanType, Seq(B, B),
      "st_intersects_extent(a, b) - bounding boxes overlap (cheap pre-filter)"),
    st("st_reduceprecision", "reducePrecision", B, Seq(B, D),
      "st_reduceprecision(geom, grid) - snap coordinates to the grid (round-half-even)"),
    st("st_quadkey", "quadKey", StringType, Seq(B, IntegerType),
      "st_quadkey(point, level) - Bing quadkey of a lon/lat point"),
    st("st_hilbert", "hilbert", LongType, Seq(B, B),
      "st_hilbert(geom, box) - 16-bit-per-axis Hilbert index of the bbox center within box"),
    st("st_linemerge", "lineMerge", B, Seq(B),
      "st_linemerge(lines) - stitch shared-endpoint members into maximal lines"),
    st("st_makevalid", "makeValid", B, Seq(B),
      "st_makevalid(geom) - node self-intersecting rings into valid polygons; " +
        "valid input unchanged; loud when snapping would be needed"),
    st("st_simplifypreservetopology", "simplifyPreserveTopology", B, Seq(B, D),
      "st_simplifypreservetopology(geom, tol) - Douglas-Peucker that keeps any " +
        "ring whose simplified form would self-intersect or collapse"),
    st("st_outline", "outlineOf", B, Seq(B),
      "st_outline(geom) - minimal boundary polygons of an edge-sharing " +
        "piece decomposition (st_union/st_union_agg output); loud on " +
        "non-tiling input"),
    (FunctionIdentifier("st_curvetoline"),
      new ExpressionInfo(Wkb.getClass.getName, null, "st_curvetoline",
        "st_curvetoline(geom[, quad_segs]) - linearize CIRCULARSTRING/" +
          "COMPOUNDCURVE/CURVEPOLYGON/MULTICURVE/MULTISURFACE arcs " +
          "(quad_segs chords per quarter circle, default 8)", ""),
      (children: Seq[Expression]) => children match {
        case Seq(g) =>
          StaticInvoke(Wkb.getClass, B, "curveToLine", Seq(g), inputTypes = Seq(B))
        case Seq(g, q) =>
          StaticInvoke(Wkb.getClass, B, "curveToLine", Seq(g, q),
            inputTypes = Seq(B, IntegerType))
        case _ =>
          throw new IllegalArgumentException("st_curvetoline takes 1 or 2 arguments")
      }),
    st("st_reverse", "reverse", B, Seq(B),
      "st_reverse(geom) - vertex order reversed per ring/line"),
    st("st_removerepeatedpoints", "removeRepeatedPoints", B, Seq(B),
      "st_removerepeatedpoints(geom) - consecutive duplicate vertices collapsed"),
    st("st_snaptogrid", "snapToGrid", B, Seq(B, D),
      "st_snaptogrid(geom, size) - coordinates snapped to the nearest grid multiple"),
    st("st_azimuth", "azimuth", D, Seq(B, B),
      "st_azimuth(a, b) - north-based clockwise bearing in [0, 2*pi) radians"),
    st("st_lineinterpolatepoint", "lineInterpolatePoint", B, Seq(B, D),
      "st_lineinterpolatepoint(line, frac) - point at the length fraction [0, 1]"),
    st("st_closestpoint", "closestPoint", B, Seq(B, B),
      "st_closestpoint(a, b) - the point on a nearest to b"),
    st("st_shortestline", "shortestLine", B, Seq(B, B),
      "st_shortestline(a, b) - two-point linestring joining the closest points"),
    st("st_pointonsurface", "pointOnSurface", B, Seq(B),
      "st_pointonsurface(geom) - a point guaranteed interior (largest ear-triangle centroid)"),
    st("st_area_sphere", "areaSphere", D, Seq(B),
      "st_area_sphere(geom) - Girard spherical-excess area in m^2 on the IUGG mean " +
        "sphere, (lon, lat) degrees"),
    st("st_transform", "transform", B, Seq(B, StringType, StringType),
      "st_transform(geom, from, to) - EPSG:4326 <-> EPSG:3857 reprojection (closed form)"),
    st("st_asgeojson", "asGeoJson", StringType, Seq(B),
      "st_asgeojson(geom) - RFC 7946 GeoJSON geometry object"),
    st("st_geomfromgeojson", "fromGeoJson", B, Seq(StringType),
      "st_geomfromgeojson(json) - parse a GeoJSON geometry object (2-D, no Feature wrappers)"),
    st("st_equals", "geomEquals", BooleanType, Seq(B, B),
      "st_equals(a, b) - topological equality (mutual covers)"),
    st("st_boundary", "boundary", B, Seq(B),
      "st_boundary(geom) - ring(s) of a polygon / endpoints of a line (NULL for points)"),
    st("st_normalize", "normalize", B, Seq(B),
      "st_normalize(geom) - canonical form: rings rotated to min vertex, CCW shells / " +
        "CW holes, sorted members (GROUP BY-stable WKB)"),
    st("st_interiorringn", "interiorRingN", B, Seq(B, IntegerType),
      "st_interiorringn(polygon, n) - 1-based nth hole as a linestring (NULL past count)"),
    st("st_length_sphere", "lengthSphere", D, Seq(B),
      "st_length_sphere(geom) - haversine meters summed over segments, (lon, lat) degrees"),
    st("st_scale", "scale", B, Seq(B, D, D),
      "st_scale(geom, sx, sy) - scale about the origin"),
    st("st_rotate", "rotate", B, Seq(B, D),
      "st_rotate(geom, radians) - counterclockwise rotation about the origin"))
}
