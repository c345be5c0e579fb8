package graft.operators

import graft.Tables

/** ST_* spatial surface, oracle-checked. The reference serves DuckDB's
  * spatial extension (`/root/reference/src/common/gizmosql_library.cpp:
  * 820-827`); the rebuild evaluates the core in [[graft.plans.Wkb]]. The
  * container's DuckDB cannot load the spatial extension (zero egress), so
  * the oracles express the same geometry in plain arithmetic — points on an
  * integer grid derived from `nation`, so every predicate and distance has
  * a closed form the oracle recomputes exactly (distances rounded to 6 dp
  * on both sides per the float-oracle rule).
  */
object SpatialOps {

  // the shared 5x5 integer grid: nation key -> (x, y)
  private val sparkPts =
    "WITH pts AS (SELECT n_nationkey, CAST(n_nationkey % 5 AS DOUBLE) AS x, " +
      "CAST(n_nationkey DIV 5 AS DOUBLE) AS y FROM nation) "
  private val duckPts =
    "WITH pts AS (SELECT n_nationkey, CAST(n_nationkey % 5 AS DOUBLE) AS x, " +
      "CAST(n_nationkey // 5 AS DOUBLE) AS y FROM nation) "
  private val sparkPtsInt =
    "WITH pts AS (SELECT n_nationkey, CAST(n_nationkey % 5 AS INT) AS x, " +
      "CAST(n_nationkey DIV 5 AS INT) AS y FROM nation) "
  private val duckPtsInt =
    "WITH pts AS (SELECT n_nationkey, CAST(n_nationkey % 5 AS INTEGER) AS x, " +
      "CAST(n_nationkey // 5 AS INTEGER) AS y FROM nation) "

  val ops: Seq[Op] = Seq(

    // Point constructors, accessors, point-vs-envelope predicates, distance.
    // st_contains is boundary-EXCLUSIVE for points (OGC), st_intersects
    // boundary-inclusive — the oracle uses strict vs closed inequalities.
    Op("spatial_core",
      duckPts +
      "SELECT n_nationkey, x AS px, y AS py, " +
      "ROUND(sqrt((x-2)*(x-2) + (y-2)*(y-2)), 6) AS dist, " +
      "(x > 1 AND x < 3 AND y > 1 AND y < 3) AS inside, " +
      "(x >= 1 AND x <= 3 AND y >= 1 AND y <= 3) AS touches, " +
      "(sqrt((x-2)*(x-2) + (y-2)*(y-2)) <= 2.0) AS near " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPts +
        "SELECT n_nationkey, st_x(st_point(x, y)) AS px, st_y(st_point(x, y)) AS py, " +
        "ROUND(st_distance(st_point(x, y), st_point(2.0D, 2.0D)), 6) AS dist, " +
        "st_contains(st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D), st_point(x, y)) AS inside, " +
        "st_intersects(st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D), st_point(x, y)) AS touches, " +
        "st_dwithin(st_point(x, y), st_point(2.0D, 2.0D), 2.0D) AS near " +
        "FROM pts ORDER BY n_nationkey")
    },

    // WKT round-trip (parse + print), type/vertex introspection, measures:
    // an L-shaped linestring of length x+y, an (x+1)x(y+1) envelope's area
    // and perimeter, bbox extrema — every value has grid closed form.
    Op("spatial_measures",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "'POINT (' || x || ' ' || y || ')' AS wkt_pt, " +
      "'LINESTRING' AS gtype, " +
      "ROUND(CAST(x + y AS DOUBLE), 6) AS len, " +
      "3 AS np, " +
      "ROUND(CAST((x+1)*(y+1) AS DOUBLE), 6) AS area, " +
      "ROUND(CAST(2*(x+y+2) AS DOUBLE), 6) AS perim, " +
      "CAST(x AS DOUBLE) AS bxmax, CAST(y AS DOUBLE) AS bymax " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, ', x, ' 0, ', x, ' ', y, ')')) AS line, " +
        "st_makeenvelope(0.0D, 0.0D, CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)) AS env " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "st_astext(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE))) AS wkt_pt, " +
        "st_geometrytype(line) AS gtype, " +
        "ROUND(st_length(line), 6) AS len, " +
        "st_npoints(line) AS np, " +
        "ROUND(st_area(env), 6) AS area, " +
        "ROUND(st_perimeter(env), 6) AS perim, " +
        "st_xmax(line) AS bxmax, st_ymax(line) AS bymax " +
        "FROM g ORDER BY n_nationkey")
    },

    // Tranche-2 surface: centroid, envelope, line accessors, affine
    // transforms, covers/disjoint (boundary-inclusive vs negated), haversine
    // sphere distance — each with a closed grid form. The L-line is
    // (0,0)-(x,0)-(x,y); the envelope is (0,0)-(x+1,y+1).
    Op("spatial_extras",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "CAST((x+1) AS DOUBLE)/2 AS cx, CAST((y+1) AS DOUBLE)/2 AS cy, " +
      "ROUND(CAST(x*y AS DOUBLE), 6) AS env_area, " +
      "CAST(0 AS DOUBLE) AS spx, CAST(y AS DOUBLE) AS epy, CAST(x AS DOUBLE) AS p2x, " +
      "(NOT (x >= 1 AND x <= 3 AND y >= 1 AND y <= 3)) AS disj, " +
      "(x >= 1 AND x <= 3 AND y >= 1 AND y <= 3) AS cov, " +
      "(x >= 1 AND x <= 3 AND y >= 1 AND y <= 3) AS covby, " +
      "CAST(x AS DOUBLE) + 1.5 AS tx, CAST(x AS DOUBLE) AS fy, " +
      "ROUND(CAST(2*(x+y+2) AS DOUBLE), 6) AS ring_len, 0 AS nholes, " +
      "ROUND(sqrt(CAST(x*x + y*y AS DOUBLE)), 6) AS ml_len, " +
      "ROUND(2*6371008.8*asin(sqrt(pow(sin(radians(CAST(y AS DOUBLE))/2),2) + " +
      "cos(0)*cos(radians(CAST(y AS DOUBLE)))*pow(sin(radians(CAST(x AS DOUBLE))/2),2)))/1000, 4) AS dsph_km " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS pt, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, ', x, ' 0, ', x, ' ', y, ')')) AS line, " +
        "st_makeenvelope(0.0D, 0.0D, CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)) AS env, " +
        "st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D) AS box FROM pts) " +
        "SELECT n_nationkey, " +
        "st_x(st_centroid(env)) AS cx, st_y(st_centroid(env)) AS cy, " +
        "ROUND(st_area(st_envelope(line)), 6) AS env_area, " +
        "st_x(st_startpoint(line)) AS spx, st_y(st_endpoint(line)) AS epy, " +
        "st_x(st_pointn(line, 2)) AS p2x, " +
        "st_disjoint(box, pt) AS disj, " +
        "st_covers(box, pt) AS cov, st_coveredby(pt, box) AS covby, " +
        "st_x(st_translate(pt, 1.5D, -0.5D)) AS tx, " +
        "st_y(st_flipcoordinates(pt)) AS fy, " +
        "ROUND(st_length(st_exteriorring(env)), 6) AS ring_len, " +
        "st_numinteriorrings(env) AS nholes, " +
        "ROUND(st_length(st_makeline(st_point(0.0D, 0.0D), pt)), 6) AS ml_len, " +
        "ROUND(st_distance_sphere(st_point(0.0D, 0.0D), pt)/1000, 4) AS dsph_km " +
        "FROM g ORDER BY n_nationkey")
    },

    // Polygon-vs-polygon relations: containment (boundary contact allowed
    // when an interior point exists), box overlap, and min distance between
    // disjoint boxes (closed form via per-axis gap).
    Op("spatial_polygons",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "(x >= 1 AND x <= 3 AND y >= 1 AND y <= 3) AS cont, " +
      "(x >= 1 AND x <= 3 AND y >= 1 AND y <= 3) AS winn, " +
      "(x <= 3 AND x+2 >= 1 AND y <= 3 AND y+2 >= 1) AS isect, " +
      "ROUND(sqrt(GREATEST(0, x-3, 1-(x+2))*GREATEST(0, x-3, 1-(x+2)) + " +
      "GREATEST(0, y-3, 1-(y+2))*GREATEST(0, y-3, 1-(y+2))), 6) AS pdist " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+2 AS DOUBLE), CAST(y+2 AS DOUBLE)) AS b FROM pts) " +
        "SELECT n_nationkey, " +
        "st_contains(st_makeenvelope(1.0D, 1.0D, 5.0D, 5.0D), b) AS cont, " +
        "st_within(b, st_makeenvelope(1.0D, 1.0D, 5.0D, 5.0D)) AS winn, " +
        "st_intersects(st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D), b) AS isect, " +
        "ROUND(st_distance(st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D), b), 6) AS pdist " +
        "FROM g ORDER BY n_nationkey")
    },

    // Multi-geometries (r12): MULTIPOLYGON of two unit squares at (x,0) and
    // (x+2,0), MULTIPOINT/MULTILINESTRING, nested GEOMETRYCOLLECTION —
    // measures sum over members, centroid is the area-weighted member mean,
    // predicates distribute per member (the midpoint between the squares
    // intersects neither), and WKT round-trips to the same text. Every
    // value has the grid closed form the oracle recomputes.
    Op("spatial_multi",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "'MULTIPOLYGON (((' || x || ' 0, ' || (x+1) || ' 0, ' || (x+1) || ' 1, ' || x || ' 1, ' || x || ' 0)), " +
      "((' || (x+2) || ' 0, ' || (x+3) || ' 0, ' || (x+3) || ' 1, ' || (x+2) || ' 1, ' || (x+2) || ' 0)))' AS mp_wkt, " +
      "'MULTIPOLYGON' AS mp_type, " +
      "ROUND(CAST(2 AS DOUBLE), 6) AS mp_area, ROUND(CAST(8 AS DOUBLE), 6) AS mp_perim, " +
      "10 AS mp_np, 2 AS mp_ngeom, " +
      "CAST(x AS DOUBLE) AS mp_xmin, CAST(x+3 AS DOUBLE) AS mp_xmax, " +
      "CAST(x AS DOUBLE) + 1.5 AS mp_cx, CAST(0.5 AS DOUBLE) AS mp_cy, " +
      "'POLYGON ((' || (x+2) || ' 0, ' || (x+3) || ' 0, ' || (x+3) || ' 1, ' || (x+2) || ' 1, ' || (x+2) || ' 0))' AS mp_g2, " +
      "FALSE AS gap_hit, TRUE AS m2_in, " +
      "3 AS mpt_n, ROUND(CAST(x + y AS DOUBLE), 6) AS mls_len, " +
      "ROUND(CAST(2 AS DOUBLE), 6) AS gc_area, 1 AS gc_pts " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_geomfromtext(CONCAT('MULTIPOLYGON (((', x, ' 0, ', x+1, ' 0, ', x+1, ' 1, ', x, ' 1, ', x, ' 0)), " +
        "((', x+2, ' 0, ', x+3, ' 0, ', x+3, ' 1, ', x+2, ' 1, ', x+2, ' 0)))')) AS mp, " +
        "st_geomfromtext(CONCAT('MULTIPOINT (', x, ' ', y, ', ', x+1, ' ', y, ', ', x, ' ', y+1, ')')) AS mpt, " +
        "st_geomfromtext(CONCAT('MULTILINESTRING ((0 0, ', x, ' 0), (0 1, ', y, ' 1))')) AS mls, " +
        "st_geomfromtext(CONCAT('GEOMETRYCOLLECTION (POINT (9 9), MULTIPOLYGON (((', x, ' 0, ', x+1, ' 0, ', x+1, ' 1, ', x, ' 1, ', x, ' 0)), " +
        "((', x+2, ' 0, ', x+3, ' 0, ', x+3, ' 1, ', x+2, ' 1, ', x+2, ' 0))))')) AS gc " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "st_astext(mp) AS mp_wkt, st_geometrytype(mp) AS mp_type, " +
        "ROUND(st_area(mp), 6) AS mp_area, ROUND(st_perimeter(mp), 6) AS mp_perim, " +
        "st_npoints(mp) AS mp_np, st_numgeometries(mp) AS mp_ngeom, " +
        "st_xmin(mp) AS mp_xmin, st_xmax(mp) AS mp_xmax, " +
        "st_x(st_centroid(mp)) AS mp_cx, st_y(st_centroid(mp)) AS mp_cy, " +
        "st_astext(st_geometryn(mp, 2)) AS mp_g2, " +
        "st_intersects(mp, st_point(CAST(x AS DOUBLE) + 1.5, 0.5D)) AS gap_hit, " +
        "st_contains(mp, st_point(CAST(x AS DOUBLE) + 2.5, 0.5D)) AS m2_in, " +
        "st_numgeometries(mpt) AS mpt_n, " +
        "ROUND(st_length(mls), 6) AS mls_len, " +
        "ROUND(st_area(gc), 6) AS gc_area, " +
        "st_numgeometries(st_collectionextract(gc, 1)) AS gc_pts " +
        "FROM g ORDER BY n_nationkey")
    },

    // Overlay, axis-aligned scope (r12): rectangle intersection against the
    // fixed box (1,1)-(3,3) — NULL when disjoint, degenerate zero-area strip
    // on edge contact — plus the inclusion-exclusion union area and the two
    // in-scope st_union shapes (covering rectangle, disjoint multipolygon).
    // The oracle recomputes the clip arithmetic per axis.
    Op("spatial_overlay",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "ROUND(CAST(GREATEST(0, LEAST(x+2, 3) - GREATEST(x, 1)) * " +
      "GREATEST(0, LEAST(y+2, 3) - GREATEST(y, 1)) AS DOUBLE), 6) AS inter_area, " +
      "(LEAST(x+2, 3) < GREATEST(x, 1) OR LEAST(y+2, 3) < GREATEST(y, 1)) AS inter_null, " +
      "ROUND(CAST(8 - GREATEST(0, LEAST(x+2, 3) - GREATEST(x, 1)) * " +
      "GREATEST(0, LEAST(y+2, 3) - GREATEST(y, 1)) AS DOUBLE), 6) AS union_area, " +
      "'MULTIPOLYGON' AS far_type, ROUND(CAST(5 AS DOUBLE), 6) AS far_area, " +
      "ROUND(CAST(4 AS DOUBLE), 6) AS sub_area " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+2 AS DOUBLE), CAST(y+2 AS DOUBLE)) AS a, " +
        "st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D) AS box, " +
        "st_makeenvelope(CAST(x+10 AS DOUBLE), CAST(y+10 AS DOUBLE), " +
        "CAST(x+11 AS DOUBLE), CAST(y+11 AS DOUBLE)) AS far, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)) AS sub FROM pts) " +
        "SELECT n_nationkey, " +
        "ROUND(COALESCE(st_area(st_intersection(a, box)), 0.0D), 6) AS inter_area, " +
        "(st_intersection(a, box) IS NULL) AS inter_null, " +
        "ROUND(st_area(a) + st_area(box) - COALESCE(st_area(st_intersection(a, box)), 0.0D), 6) AS union_area, " +
        "st_geometrytype(st_union(a, far)) AS far_type, " +
        "ROUND(st_area(st_union(a, far)), 6) AS far_area, " +
        "ROUND(st_area(st_union(a, sub)), 6) AS sub_area " +
        "FROM g ORDER BY n_nationkey")
    },

    // Convex hull (monotone chain) + WGS84 ellipsoidal distance (r12). Hull
    // input = the 4 corners of (0,0)-(x+1,y+1) plus a strictly-interior
    // center and a collinear bottom-edge midpoint — the hull must be exactly
    // the corner rectangle (area/perimeter/vertex-count/WKT all closed
    // form); a fully collinear set degrades to the extreme-point
    // LINESTRING. The spheroid oracle reproduces Lambert's formula in SQL
    // (reduced latitude, auxiliary-sphere haversine, X/Y flattening
    // correction) and compares at 0.1 m granularity — the same trig-rounding
    // rule as st_distance_sphere.
    Op("spatial_hull_spheroid",
      duckPtsInt +
      ", s AS (SELECT n_nationkey, x, y, " +
      "atan((1 - 1/298.257223563) * tan(radians(CAST(y AS DOUBLE)))) AS b2, " +
      "radians(CAST(x AS DOUBLE)) AS dlon FROM pts), " +
      "t AS (SELECT n_nationkey, x, y, b2, " +
      "2*asin(sqrt(pow(sin(b2/2), 2) + cos(b2)*pow(sin(dlon/2), 2))) AS sg FROM s) " +
      "SELECT n_nationkey, " +
      "'POLYGON ((0 0, ' || (x+1) || ' 0, ' || (x+1) || ' ' || (y+1) || ', 0 ' || (y+1) || ', 0 0))' AS hull_wkt, " +
      "ROUND(CAST((x+1)*(y+1) AS DOUBLE), 6) AS hull_area, " +
      "ROUND(CAST(2*(x+y+2) AS DOUBLE), 6) AS hull_perim, " +
      "5 AS hull_np, 'POLYGON' AS hull_type, " +
      "'LINESTRING (0 0, ' || (2*x+2) || ' 0)' AS lin_wkt, " +
      "ROUND(CAST(2*x+2 AS DOUBLE), 6) AS lin_len, " +
      // Douglas-Peucker on the unit-deviation tent (0 0, x+1 1, 2x+2 0):
      // tol 2 drops the apex (straight 2-point chord), tol 0.5 keeps it
      "2 AS simp_coarse_np, 'LINESTRING (0 0, ' || (2*x+2) || ' 0)' AS simp_coarse_wkt, " +
      "3 AS simp_fine_np, " +
      "ROUND(CASE WHEN sg = 0 THEN 0 ELSE " +
      "6378137.0*(sg - (1/298.257223563)/2*(" +
      "(sg - sin(sg))*pow(sin(b2/2)*cos(b2/2)/cos(sg/2), 2) + " +
      "(sg + sin(sg))*pow(cos(b2/2)*sin(b2/2)/sin(sg/2), 2))) END / 1000, 4) AS dsph_km " +
      "FROM t ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_convexhull(st_geomfromtext(CONCAT('MULTIPOINT (0 0, ', x+1, ' 0, ', x+1, ' ', y+1, ', 0 ', y+1, ', ', " +
        "(x+1)/2.0D, ' ', (y+1)/2.0D, ', ', (x+1)/2.0D, ' 0)'))) AS hull, " +
        "st_convexhull(st_geomfromtext(CONCAT('MULTIPOINT (0 0, ', x+1, ' 0, ', 2*x+2, ' 0)'))) AS lin, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, ', x+1, ' 1, ', 2*x+2, ' 0)')) AS tent, " +
        "st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS pt FROM pts) " +
        "SELECT n_nationkey, " +
        "st_astext(hull) AS hull_wkt, " +
        "ROUND(st_area(hull), 6) AS hull_area, " +
        "ROUND(st_perimeter(hull), 6) AS hull_perim, " +
        "st_npoints(hull) AS hull_np, st_geometrytype(hull) AS hull_type, " +
        "st_astext(lin) AS lin_wkt, ROUND(st_length(lin), 6) AS lin_len, " +
        "st_npoints(st_simplify(tent, 2.0D)) AS simp_coarse_np, " +
        "st_astext(st_simplify(tent, 2.0D)) AS simp_coarse_wkt, " +
        "st_npoints(st_simplify(tent, 0.5D)) AS simp_fine_np, " +
        "ROUND(st_distance_spheroid(st_point(0.0D, 0.0D), pt) / 1000, 4) AS dsph_km " +
        "FROM g ORDER BY n_nationkey")
    },

    // Point buffer (r12): a radius-(x+1) 32-gon around each grid point. The
    // regular-polygon closed forms — area 16 r^2 sin(pi/16), perimeter
    // 64 r sin(pi/32), vertex at angle 0 exactly r from the center — are
    // recomputed by the oracle; the angle-0 vertex makes the
    // distance-to-(x+2r, y) check EXACTLY r, integer-valued.
    Op("spatial_buffer",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "ROUND(16 * CAST((x+1)*(x+1) AS DOUBLE) * sin(pi()/16), 6) AS buf_area, " +
      "ROUND(64 * CAST(x+1 AS DOUBLE) * sin(pi()/32), 6) AS buf_perim, " +
      "33 AS buf_np, " +
      "CAST(x AS DOUBLE) AS buf_cx, CAST(y AS DOUBLE) AS buf_cy, " +
      "CAST(x - (x+1) AS DOUBLE) AS buf_xmin, " +
      "TRUE AS center_in, " +
      "ROUND(CAST(x+1 AS DOUBLE), 6) AS edge_dist, " +
      // r14 dilation closed forms: straight line r=0.5 -> 2rL rect + one
      // full inscribed 32-gon (A32 = 16 r^2 sin(pi/16)); unit square ->
      // square + 4 edge rects + 4 corner quarter-fans = 1 + 2 + A32
      "ROUND(3 + 4 * sin(pi()/16), 6) AS lb_area, " +
      "ROUND(CAST(x AS DOUBLE) - 0.5, 6) AS lb_xmin, " +
      "ROUND(1 + 2 + 4 * sin(pi()/16), 6) AS sb_area, " +
      "ROUND(CAST(y AS DOUBLE) + 1.5, 6) AS sb_ymax " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_buffer(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), CAST(x+1 AS DOUBLE)) AS buf, " +
        "st_buffer(st_geomfromtext(CONCAT('LINESTRING (', x, ' ', y, ', ', x+3, ' ', y, ')')), 0.5D) AS lbuf, " +
        "st_buffer(st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)), 0.5D) AS sbuf " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "ROUND(st_area(buf), 6) AS buf_area, " +
        "ROUND(st_perimeter(buf), 6) AS buf_perim, " +
        "st_npoints(buf) AS buf_np, " +
        "ROUND(st_x(st_centroid(buf)), 6) AS buf_cx, ROUND(st_y(st_centroid(buf)), 6) AS buf_cy, " +
        "ROUND(st_xmin(buf), 6) AS buf_xmin, " +
        "st_contains(buf, st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE))) AS center_in, " +
        "ROUND(st_distance(buf, st_point(CAST(x AS DOUBLE) + 2*(x+1), CAST(y AS DOUBLE))), 6) AS edge_dist, " +
        "ROUND(st_area(lbuf), 6) AS lb_area, " +
        "ROUND(st_xmin(lbuf), 6) AS lb_xmin, " +
        "ROUND(st_area(sbuf), 6) AS sb_area, " +
        "ROUND(st_ymax(sbuf), 6) AS sb_ymax " +
        "FROM g ORDER BY n_nationkey")
    },

    // General clipping (r13): unit squares against the convex triangle
    // x>=0, y>=0, x+y<=6 via Sutherland-Hodgman, plus st_difference's
    // half-plane decomposition and a concave-subject case (L-shape clipped
    // by a box). With s = x+y the square is fully inside for s<=4,
    // straddles the hypotenuse exactly at the corner for s=5 (half-square
    // triangles, ring order deterministic from the clip-edge walk), and is
    // disjoint for s>=6 — the oracle spells every output WKT and area in
    // closed form, including the additivity identity inter+diff == 1.
    Op("spatial_clip",
      duckPtsInt +
      ", c AS (SELECT n_nationkey, x, y, x + y AS s FROM pts) " +
      "SELECT n_nationkey, " +
      "CASE WHEN s <= 4 THEN 'POLYGON ((' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', ' || (x+1) || ' ' || (y+1) || ', ' || x || ' ' || (y+1) || ', ' || x || ' ' || y || '))' " +
      "WHEN s = 5 THEN 'POLYGON ((' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', ' || x || ' ' || (y+1) || ', ' || x || ' ' || y || '))' END AS inter_wkt, " +
      "ROUND(CAST(CASE WHEN s <= 4 THEN 1 WHEN s = 5 THEN 0.5 ELSE 0 END AS DOUBLE), 6) AS inter_area, " +
      "(s >= 6) AS inter_null, " +
      "CASE WHEN s = 5 THEN 'POLYGON ((' || (x+1) || ' ' || y || ', ' || (x+1) || ' ' || (y+1) || ', ' || x || ' ' || (y+1) || ', ' || (x+1) || ' ' || y || '))' " +
      "WHEN s >= 6 THEN 'POLYGON ((' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', ' || (x+1) || ' ' || (y+1) || ', ' || x || ' ' || (y+1) || ', ' || x || ' ' || y || '))' END AS diff_wkt, " +
      "ROUND(CAST(CASE WHEN s <= 4 THEN 0 WHEN s = 5 THEN 0.5 ELSE 1 END AS DOUBLE), 6) AS diff_area, " +
      "(s <= 4) AS diff_null, " +
      "ROUND(CAST(1 AS DOUBLE), 6) AS additivity, " +
      "'POLYGON ((3 2, 2 2, 2 3, 1 3, 1 1, 3 1, 3 2))' AS l_wkt, " +
      "ROUND(CAST(3 AS DOUBLE), 6) AS l_area, " +
      "'MULTIPOLYGON' AS ld_type, ROUND(CAST(9 AS DOUBLE), 6) AS ld_area, 4 AS ld_n, " +
      // concave clips (r13 triangulated path): the unit square against the
      // L-shape [0,4]x[0,2] + [0,2]x[2,4] — per-arm interval accounting
      "ROUND(CAST(GREATEST(0, LEAST(x+1, 4) - x) * GREATEST(0, LEAST(y+1, 2) - y) + " +
      "GREATEST(0, LEAST(x+1, 2) - x) * GREATEST(0, LEAST(y+1, 4) - GREATEST(y, 2)) AS DOUBLE), 6) AS ell_inter, " +
      "ROUND(CAST(1 - (GREATEST(0, LEAST(x+1, 4) - x) * GREATEST(0, LEAST(y+1, 2) - y) + " +
      "GREATEST(0, LEAST(x+1, 2) - x) * GREATEST(0, LEAST(y+1, 4) - GREATEST(y, 2))) AS DOUBLE), 6) AS ell_diff, " +
      "ROUND(CAST(13 - (GREATEST(0, LEAST(x+1, 4) - x) * GREATEST(0, LEAST(y+1, 2) - y) + " +
      "GREATEST(0, LEAST(x+1, 2) - x) * GREATEST(0, LEAST(y+1, 4) - GREATEST(y, 2))) AS DOUBLE), 6) AS ell_union, " +
      "ROUND(CAST(5 AS DOUBLE), 6) AS ll_inter, ROUND(CAST(7 AS DOUBLE), 6) AS ll_diff, " +
      "ROUND(CAST(19 AS DOUBLE), 6) AS ll_union, ROUND(CAST(4 AS DOUBLE), 6) AS env_diff, " +
      // r14 donut cases: shell [0,5]^2 with hole [2,3]^2 (area 24). The unit
      // grid square coincides with the hole exactly at (2,2); the donut
      // pair is the donut vs its (1,1) translate: 16 - 1 - 1 = 14 overlap.
      "ROUND(CAST(CASE WHEN x = 2 AND y = 2 THEN 0 ELSE 1 END AS DOUBLE), 6) AS donut_inter, " +
      "ROUND(CAST(CASE WHEN x = 2 AND y = 2 THEN 1 ELSE 0 END AS DOUBLE), 6) AS donut_diff, " +
      "ROUND(CAST(CASE WHEN x = 2 AND y = 2 THEN 25 ELSE 24 END AS DOUBLE), 6) AS donut_union, " +
      "ROUND(CAST(8 AS DOUBLE), 6) AS donut_box_inter, " +
      "ROUND(CAST(1 AS DOUBLE), 6) AS donut_hole_area, " +
      "ROUND(CAST(14 AS DOUBLE), 6) AS dd_inter, " +
      "ROUND(CAST(34 AS DOUBLE), 6) AS dd_union " +
      "FROM c ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)) AS sq, " +
        "st_geomfromtext('POLYGON ((0 0, 6 0, 0 6, 0 0))') AS tri, " +
        "st_geomfromtext('POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))') AS ell, " +
        "st_makeenvelope(1.0D, 1.0D, 3.0D, 3.0D) AS box, " +
        "st_geomfromtext('POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))') AS donut, " +
        "st_makeenvelope(1.0D, 1.0D, 4.0D, 4.0D) AS dbox FROM pts) " +
        "SELECT n_nationkey, " +
        "st_astext(st_intersection(sq, tri)) AS inter_wkt, " +
        "ROUND(COALESCE(st_area(st_intersection(sq, tri)), 0.0D), 6) AS inter_area, " +
        "(st_intersection(sq, tri) IS NULL) AS inter_null, " +
        "st_astext(st_difference(sq, tri)) AS diff_wkt, " +
        "ROUND(COALESCE(st_area(st_difference(sq, tri)), 0.0D), 6) AS diff_area, " +
        "(st_difference(sq, tri) IS NULL) AS diff_null, " +
        "ROUND(COALESCE(st_area(st_intersection(sq, tri)), 0.0D) + " +
        "COALESCE(st_area(st_difference(sq, tri)), 0.0D), 6) AS additivity, " +
        "st_astext(st_intersection(ell, box)) AS l_wkt, " +
        "ROUND(st_area(st_intersection(ell, box)), 6) AS l_area, " +
        "st_geometrytype(st_difference(ell, box)) AS ld_type, " +
        "ROUND(st_area(st_difference(ell, box)), 6) AS ld_area, " +
        "st_numgeometries(st_difference(ell, box)) AS ld_n, " +
        "ROUND(COALESCE(st_area(st_intersection(sq, ell)), 0.0D), 6) AS ell_inter, " +
        "ROUND(COALESCE(st_area(st_difference(sq, ell)), 0.0D), 6) AS ell_diff, " +
        "ROUND(st_area(st_union(sq, ell)), 6) AS ell_union, " +
        "ROUND(st_area(st_intersection(ell, st_translate(ell, 1.0D, 1.0D))), 6) AS ll_inter, " +
        "ROUND(st_area(st_difference(ell, st_translate(ell, 1.0D, 1.0D))), 6) AS ll_diff, " +
        "ROUND(st_area(st_union(ell, st_translate(ell, 1.0D, 1.0D))), 6) AS ll_union, " +
        "ROUND(st_area(st_difference(st_makeenvelope(0.0D, 0.0D, 4.0D, 4.0D), ell)), 6) AS env_diff, " +
        "ROUND(COALESCE(st_area(st_intersection(sq, donut)), 0.0D), 6) AS donut_inter, " +
        "ROUND(COALESCE(st_area(st_difference(sq, donut)), 0.0D), 6) AS donut_diff, " +
        "ROUND(st_area(st_union(sq, donut)), 6) AS donut_union, " +
        "ROUND(st_area(st_intersection(donut, dbox)), 6) AS donut_box_inter, " +
        "ROUND(st_area(st_difference(st_makeenvelope(0.0D, 0.0D, 5.0D, 5.0D), donut)), 6) AS donut_hole_area, " +
        "ROUND(st_area(st_intersection(donut, st_translate(donut, 1.0D, 1.0D))), 6) AS dd_inter, " +
        "ROUND(st_area(st_union(donut, st_translate(donut, 1.0D, 1.0D))), 6) AS dd_union " +
        "FROM g ORDER BY n_nationkey")
    },

    // Spatial aggregates (r13): st_extent_agg folds each group to 4 doubles
    // (codegen Least/Greatest, map-side partial — the shuffle carries one
    // 32-byte buffer per group per partition), st_collect_agg assembles the
    // members in canonical (lexicographic-WKT) order so the result is
    // deterministic under unordered aggregation. Oracle recomputes both
    // from MIN/MAX and an ORDER BY'd string_agg.
    Op("spatial_agg",
      duckPtsInt +
      ", c AS (SELECT n_nationkey, n_nationkey % 3 AS g, x, y FROM pts) " +
      "SELECT g, " +
      "'LINESTRING (' || string_agg(x || ' ' || y, ', ' ORDER BY n_nationkey) || ')' AS trip_wkt, " +
      "'POLYGON ((' || min(x) || ' ' || min(y) || ', ' || max(x) || ' ' || min(y) || ', ' || " +
      "max(x) || ' ' || max(y) || ', ' || min(x) || ' ' || max(y) || ', ' || min(x) || ' ' || min(y) || '))' AS ext_wkt, " +
      "ROUND(CAST((max(x) - min(x)) * (max(y) - min(y)) AS DOUBLE), 6) AS ext_area, " +
      "CAST(min(x) AS DOUBLE) AS ext_xmin, CAST(max(y) AS DOUBLE) AS ext_ymax, " +
      "'MULTIPOINT (' || string_agg('(' || x || ' ' || y || ')', ', ' ORDER BY x, y) || ')' AS col_wkt, " +
      "'MULTIPOINT' AS col_type, CAST(COUNT(*) AS INTEGER) AS col_n " +
      "FROM c GROUP BY g ORDER BY g") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", c AS (SELECT n_nationkey, n_nationkey % 3 AS g, " +
        "st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS pt FROM pts) " +
        "SELECT g, " +
        "st_astext(st_makeline_agg(pt, n_nationkey)) AS trip_wkt, " +
        "st_astext(st_extent_agg(pt)) AS ext_wkt, " +
        "ROUND(st_area(st_extent_agg(pt)), 6) AS ext_area, " +
        "st_xmin(st_extent_agg(pt)) AS ext_xmin, st_ymax(st_extent_agg(pt)) AS ext_ymax, " +
        "st_astext(st_collect_agg(pt)) AS col_wkt, " +
        "st_geometrytype(st_collect_agg(pt)) AS col_type, " +
        "st_numgeometries(st_collect_agg(pt)) AS col_n " +
        "FROM c GROUP BY g ORDER BY g")
    },

    // Validity (r13): per-row geometries cycle valid square / self-crossing
    // bowtie / square-with-escaped-hole by n % 3, so st_isvalid's verdict
    // has the closed form (n % 3 = 0); fixed columns pin the donut,
    // overlapping-hole, spike, and per-member-multi cases.
    Op("spatial_validity",
      duckPtsInt +
      "SELECT n_nationkey, (n_nationkey % 3 = 0) AS ok, " +
      "TRUE AS donut_ok, FALSE AS holes_overlap_ok, FALSE AS spike_ok, " +
      "TRUE AS line_ok, FALSE AS multi_bad_ok " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, " +
        "CASE WHEN n_nationkey % 3 = 0 THEN " +
        "CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y, ', ', x+2, ' ', y+2, ', ', x, ' ', y+2, ', ', x, ' ', y, '))') " +
        "WHEN n_nationkey % 3 = 1 THEN " +
        "CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y+2, ', ', x+2, ' ', y, ', ', x, ' ', y+2, ', ', x, ' ', y, '))') " +
        "ELSE " +
        "CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y, ', ', x+2, ' ', y+2, ', ', x, ' ', y+2, ', ', x, ' ', y, '), " +
        "(', x+10, ' ', y+10, ', ', x+11, ' ', y+10, ', ', x+11, ' ', y+11, ', ', x+10, ' ', y+11, ', ', x+10, ' ', y+10, '))') " +
        "END AS wkt FROM pts) " +
        "SELECT n_nationkey, st_isvalid(st_geomfromtext(wkt)) AS ok, " +
        "st_isvalid(st_geomfromtext('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))')) AS donut_ok, " +
        "st_isvalid(st_geomfromtext('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 4 1, 4 4, 1 4, 1 1), (3 3, 6 3, 6 6, 3 6, 3 3))')) AS holes_overlap_ok, " +
        "st_isvalid(st_geomfromtext('POLYGON ((0 0, 4 0, 2 0, 2 2, 0 0))')) AS spike_ok, " +
        "st_isvalid(st_geomfromtext('LINESTRING (0 0, 1 1)')) AS line_ok, " +
        "st_isvalid(st_geomfromtext('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 2 2, 2 0, 0 2, 0 0)))')) AS multi_bad_ok " +
        "FROM g ORDER BY n_nationkey")
    },

    // Point/line utilities (r13 tranche 2): reverse, repeated-point
    // removal, grid snap, azimuth, length interpolation, closest point /
    // shortest line (clamped rectangle projection), point-on-surface
    // (ear-triangle centroid). All closed forms over the integer grid.
    Op("spatial_fns2",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "'LINESTRING (' || (x+1) || ' ' || (y+1) || ', ' || (x+1) || ' 0, 0 0)' AS rev_wkt, " +
      "3 AS rrp_np, " +
      "'POINT (' || x || ' ' || (y+1) || ')' AS snap_wkt, " +
      "ROUND(atan2(CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)), 6) AS az, " +
      "ROUND(CAST(x+1 AS DOUBLE) / 2, 6) AS lip_x, ROUND(CAST(0 AS DOUBLE), 6) AS lip_y, " +
      "'POINT (' || (x+1) || ' ' || y || ')' AS cp_wkt, " +
      "ROUND(CAST(4 AS DOUBLE), 6) AS sl_len, " +
      "TRUE AS pos_ell_in, TRUE AS pos_donut_in, " +
      "ROUND(CAST(x+1 AS DOUBLE) / 3, 6) AS pos_tri_x, " +
      "ROUND(CAST(y+1 AS DOUBLE) / 3, 6) AS pos_tri_y, " +
      // r13: polygon-ring Douglas-Peucker (the 1-unit bump drops at tol 2)
      // and canonical normalization of a rotated CW ring
      "5 AS simp_poly_np, " +
      "'POLYGON ((' || x || ' ' || y || ', ' || (x+2) || ' ' || y || ', ' || (x+2) || ' ' || (y+2) || ', ' || x || ' ' || (y+2) || ', ' || x || ' ' || y || '))' AS norm_wkt " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, ', x+1, ' 0, ', x+1, ' ', y+1, ')')) AS line, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, 0 0, ', x+1, ' 0, ', x+1, ' 0, ', x+1, ' ', y+1, ')')) AS dupline, " +
        "st_point(CAST(x AS DOUBLE) + 0.3, CAST(y AS DOUBLE) + 0.7) AS offpt, " +
        "st_geomfromtext(CONCAT('LINESTRING (0 0, ', x+1, ' 0)')) AS flat, " +
        "st_makeenvelope(0.0D, 0.0D, CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)) AS env, " +
        "st_point(CAST(x+5 AS DOUBLE), CAST(y AS DOUBLE)) AS far, " +
        "st_geomfromtext('POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))') AS ell, " +
        "st_geomfromtext('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))') AS donut, " +
        "st_geomfromtext(CONCAT('POLYGON ((0 0, ', x+1, ' 0, 0 ', y+1, ', 0 0))')) AS tri " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "st_astext(st_reverse(line)) AS rev_wkt, " +
        "st_npoints(st_removerepeatedpoints(dupline)) AS rrp_np, " +
        "st_astext(st_snaptogrid(offpt, 1.0D)) AS snap_wkt, " +
        "ROUND(st_azimuth(st_point(0.0D, 0.0D), st_point(CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE))), 6) AS az, " +
        "ROUND(st_x(st_lineinterpolatepoint(flat, 0.5D)), 6) AS lip_x, " +
        "ROUND(st_y(st_lineinterpolatepoint(flat, 0.5D)), 6) AS lip_y, " +
        "st_astext(st_closestpoint(env, far)) AS cp_wkt, " +
        "ROUND(st_length(st_shortestline(env, far)), 6) AS sl_len, " +
        "st_contains(ell, st_pointonsurface(ell)) AS pos_ell_in, " +
        "st_contains(donut, st_pointonsurface(donut)) AS pos_donut_in, " +
        "ROUND(st_x(st_pointonsurface(tri)), 6) AS pos_tri_x, " +
        "ROUND(st_y(st_pointonsurface(tri)), 6) AS pos_tri_y, " +
        "st_npoints(st_simplify(st_geomfromtext(CONCAT('POLYGON ((0 0, ', x+5, " +
        "' 1, ', 2*x+10, ' 0, ', 2*x+10, ' 20, 0 20, 0 0))')), 2.0D)) AS simp_poly_np, " +
        "st_astext(st_normalize(st_geomfromtext(CONCAT('POLYGON ((', x+2, ' ', y+2, ', ', " +
        "x+2, ' ', y, ', ', x, ' ', y, ', ', x, ' ', y+2, ', ', x+2, ' ', y+2, '))')))) AS norm_wkt " +
        "FROM g ORDER BY n_nationkey")
    },

    // Spherical polygon area (r13): Girard's excess on the IUGG mean
    // sphere. The polar triangle (0 0, dLon 0, 0 90) has excess EXACTLY
    // dLon radians (two right angles at the equator + dLon at the pole),
    // so the oracle is pure closed-form arithmetic — no spherical trig to
    // mismatch; the hemisphere (2*pi*R^2) and octant (pi*R^2/2) constants
    // pin the absolute scale. Compared in km^2 at 3 dp (fp slack ~1e-7).
    Op("spatial_area_sphere",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "ROUND(radians(CAST(x+1 AS DOUBLE)) * 6371008.8 * 6371008.8 / 1e6, 3) AS polar_km2, " +
      "ROUND(2 * pi() * 6371008.8 * 6371008.8 / 1e6, 3) AS hemi_km2, " +
      "ROUND(pi() * 6371008.8 * 6371008.8 / 2e6, 3) AS octant_km2 " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, " +
        "st_geomfromtext(CONCAT('POLYGON ((0 0, ', x+1, ' 0, 0 90, 0 0))')) AS polar " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "ROUND(st_area_sphere(polar) / 1e6, 3) AS polar_km2, " +
        "ROUND(st_area_sphere(st_geomfromtext('POLYGON ((0 0, 90 0, 180 0, 270 0, 0 0))')) / 1e6, 3) AS hemi_km2, " +
        "ROUND(st_area_sphere(st_geomfromtext('POLYGON ((0 0, 90 0, 0 90, 0 0))')) / 1e6, 3) AS octant_km2 " +
        "FROM g ORDER BY n_nationkey")
    },

    // Conversions (r13): Web Mercator closed form (the oracle re-derives
    // the same R*ln(tan(pi/4 + phi/2)) expression), GeoJSON emit + parse
    // round-trip as strings, topological st_equals (rotated ring), and
    // OGC boundary — all over the integer grid.
    Op("spatial_convert",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "ROUND(6378137 * radians(CAST(x AS DOUBLE)) / 1000, 3) AS merc_x, " +
      // "+ 0.0" canonicalizes IEEE signed zero: at y=0 DuckDB's ROUND keeps the
      // -0.0 produced by ln(tan(pi/4)) ~ -7e-13, while Spark's ROUND normalizes
      // to +0.0; the driver hashes raw double bytes, so the signs must agree.
      "ROUND(6378137 * ln(tan(pi()/4 + radians(CAST(y AS DOUBLE))/2)) / 1000, 3) + 0.0 AS merc_y, " +
      "'{\"type\":\"Point\",\"coordinates\":[' || x || ',' || y || ']}' AS gj, " +
      "'POLYGON ((' || x || ' ' || y || ', ' || (x+2) || ' ' || y || ', ' || (x+2) || ' ' || (y+2) || ', ' || x || ' ' || (y+2) || ', ' || x || ' ' || y || '))' AS gj_rt, " +
      "TRUE AS eq_rotated, FALSE AS eq_other, " +
      "'LINESTRING (' || x || ' ' || y || ', ' || (x+2) || ' ' || y || ', ' || (x+2) || ' ' || (y+2) || ', ' || x || ' ' || (y+2) || ', ' || x || ' ' || y || ')' AS bnd_wkt, " +
      "'MULTIPOINT ((0 0), (' || (x+1) || ' ' || (y+1) || '))' AS bnd_pts, " +
      // r13 tail: hole accessor, equator+meridian geodesic length, affine
      "'LINESTRING (' || (x+1) || ' ' || (y+1) || ', ' || (x+2) || ' ' || (y+1) || ', ' || (x+2) || ' ' || (y+2) || ', ' || (x+1) || ' ' || (y+2) || ', ' || (x+1) || ' ' || (y+1) || ')' AS irn_wkt, " +
      "TRUE AS irn_null, " +
      "ROUND(6371008.8 * (radians(CAST(x AS DOUBLE)) + radians(CAST(y AS DOUBLE))) / 1000, 3) AS len_sph_km, " +
      "ROUND(CAST(6 * (x+1) * (y+1) AS DOUBLE), 6) AS scale_area, " +
      "ROUND(CAST(-(x+1) AS DOUBLE), 6) AS rot_x, ROUND(CAST(0 AS DOUBLE), 6) AS rot_y " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+2 AS DOUBLE), CAST(y+2 AS DOUBLE)) AS env, " +
        "st_geomfromtext(CONCAT('POLYGON ((', x+2, ' ', y+2, ', ', x, ' ', y+2, ', ', " +
        "x, ' ', y, ', ', x+2, ' ', y, ', ', x+2, ' ', y+2, '))')) AS rot, " +
        "CONCAT('{\"type\":\"Polygon\",\"coordinates\":[[[', x, ',', y, '],[', x+2, ',', y, '],[', " +
        "x+2, ',', y+2, '],[', x, ',', y+2, '],[', x, ',', y, ']]]}') AS gjpoly " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "ROUND(st_x(st_transform(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), " +
        "'EPSG:4326', 'EPSG:3857')) / 1000, 3) AS merc_x, " +
        "ROUND(st_y(st_transform(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), " +
        "'EPSG:4326', 'EPSG:3857')) / 1000, 3) AS merc_y, " +
        "st_asgeojson(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE))) AS gj, " +
        "st_astext(st_geomfromgeojson(gjpoly)) AS gj_rt, " +
        "st_equals(env, rot) AS eq_rotated, " +
        "st_equals(env, st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+2 AS DOUBLE), CAST(y+3 AS DOUBLE))) AS eq_other, " +
        "st_astext(st_boundary(env)) AS bnd_wkt, " +
        "st_astext(st_boundary(st_geomfromtext(CONCAT('LINESTRING (0 0, ', x+1, ' ', y+1, ')')))) AS bnd_pts, " +
        "st_astext(st_interiorringn(st_geomfromtext(CONCAT('POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (', " +
        "x+1, ' ', y+1, ', ', x+2, ' ', y+1, ', ', x+2, ' ', y+2, ', ', x+1, ' ', y+2, ', ', x+1, ' ', y+1, '))')), 1)) AS irn_wkt, " +
        "(st_interiorringn(env, 1) IS NULL) AS irn_null, " +
        "ROUND(st_length_sphere(st_geomfromtext(CONCAT('LINESTRING (0 0, ', x, ' 0, ', x, ' ', y, ')'))) / 1000, 3) AS len_sph_km, " +
        "ROUND(st_area(st_scale(st_makeenvelope(0.0D, 0.0D, CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE)), 2.0D, 3.0D)), 6) AS scale_area, " +
        "ROUND(st_x(st_rotate(st_point(CAST(x+1 AS DOUBLE), 0.0D), pi())), 6) AS rot_x, " +
        "ROUND(st_y(st_rotate(st_point(CAST(x+1 AS DOUBLE), 0.0D), pi())), 6) AS rot_y " +
        "FROM g ORDER BY n_nationkey")
    },

    // EMPTY geometries (r14): alternate rows carry POLYGON EMPTY vs a real
    // 2x2 box — round-trip text, emptiness, measures, predicate and overlay
    // identity/annihilator laws, all against a closed-form oracle.
    Op("spatial_empty",
      "WITH pts AS (SELECT n_nationkey, n_nationkey % 2 AS m FROM nation) " +
      "SELECT n_nationkey, " +
      "CASE WHEN m = 0 THEN 'POLYGON EMPTY' ELSE 'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))' END AS g_wkt, " +
      "(m = 0) AS g_isempty, " +
      "ROUND(CAST(CASE WHEN m = 0 THEN 0 ELSE 4 END AS DOUBLE), 6) AS g_area, " +
      "(m = 1) AS g_intersects, " +
      "CAST(CASE WHEN m = 0 THEN 0 ELSE 5 END AS INTEGER) AS g_npoints, " +
      "TRUE AS g_valid, " +
      "ROUND(CAST(CASE WHEN m = 0 THEN 1 ELSE 4 END AS DOUBLE), 6) AS u_area, " +
      "(m = 0) AS i_null " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(
        "WITH pts AS (SELECT n_nationkey, n_nationkey % 2 AS m FROM nation), " +
        "g AS (SELECT n_nationkey, CASE WHEN m = 0 THEN st_geomfromtext('POLYGON EMPTY') " +
        "ELSE st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') END AS geo, " +
        "st_makeenvelope(0.0D, 0.0D, 1.0D, 1.0D) AS unitbox FROM pts) " +
        "SELECT n_nationkey, st_astext(geo) AS g_wkt, st_isempty(geo) AS g_isempty, " +
        "ROUND(st_area(geo), 6) AS g_area, st_intersects(geo, unitbox) AS g_intersects, " +
        "st_npoints(geo) AS g_npoints, st_isvalid(geo) AS g_valid, " +
        "ROUND(st_area(st_union(geo, unitbox)), 6) AS u_area, " +
        "(st_intersection(geo, unitbox) IS NULL) AS i_null " +
        "FROM g ORDER BY n_nationkey")
    },

    // st_outline (r14): minimal boundary tracing over piece
    // decompositions — the partial-overlap union of two 2x2 squares
    // becomes the true corner octagon (closed-form WKT per row), and a
    // 4-rect frame dissolve traces shell + CW hole.
    Op("spatial_outline",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "'POLYGON ((' || x || ' ' || y || ', ' || (x+2) || ' ' || y || ', ' || (x+2) || ' ' || (y+1) || ', ' || " +
      "(x+3) || ' ' || (y+1) || ', ' || (x+3) || ' ' || (y+3) || ', ' || (x+1) || ' ' || (y+3) || ', ' || " +
      "(x+1) || ' ' || (y+2) || ', ' || x || ' ' || (y+2) || ', ' || x || ' ' || y || '))' AS oct_wkt, " +
      "ROUND(CAST(7 AS DOUBLE), 6) AS oct_area, " +
      "'POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))' AS frame_wkt " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, " +
        "st_union(st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), " +
        "CAST(x+2 AS DOUBLE), CAST(y+2 AS DOUBLE)), " +
        "st_makeenvelope(CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE), " +
        "CAST(x+3 AS DOUBLE), CAST(y+3 AS DOUBLE))) AS u FROM pts) " +
        "SELECT n_nationkey, st_astext(st_outline(u)) AS oct_wkt, " +
        "ROUND(st_area(st_outline(u)), 6) AS oct_area, " +
        "(SELECT st_astext(st_outline(st_union_agg(env))) FROM (" +
        "SELECT st_makeenvelope(0.0D, 0.0D, 1.0D, 3.0D) AS env UNION ALL " +
        "SELECT st_makeenvelope(2.0D, 0.0D, 3.0D, 3.0D) UNION ALL " +
        "SELECT st_makeenvelope(1.0D, 0.0D, 2.0D, 1.0D) UNION ALL " +
        "SELECT st_makeenvelope(1.0D, 2.0D, 2.0D, 3.0D))) AS frame_wkt " +
        "FROM g ORDER BY n_nationkey")
    },

    // Remaining OGC predicates + structure accessors (r14): touches /
    // crosses / overlaps / containsproperly on grid envelopes with
    // closed-form truth, plus dimension/isclosed/isring/makepolygon/
    // multi/dump/hex-WKB round-trip.
    Op("spatial_relations",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "TRUE AS t_edge, FALSE AS t_overlap, FALSE AS t_self, " +
      "TRUE AS o_partial, FALSE AS o_contain, FALSE AS o_touch, " +
      "TRUE AS c_through, FALSE AS c_inside, " +
      "TRUE AS cp_strict, FALSE AS cp_corner, " +
      "CAST(2 AS INTEGER) AS dim_mix, " +
      "TRUE AS ring_ok, FALSE AS ring_bowtie, " +
      "ROUND(CAST(4 AS DOUBLE), 6) AS mp_area, " +
      "'MULTIPOLYGON' AS multi_type, CAST(2 AS INTEGER) AS dump_n, " +
      "'POINT (' || x || ' ' || y || ')' AS hex_rt, " +
      // r14 tail: linemerge chain, quadkey closed form (tile walk at level
      // 2 over the small-positive-lon/lat grid), reduceprecision
      // round-half-even, bbox-only intersects, list-collect, hilbert origin
      "'LINESTRING (' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', ' || (x+2) || ' ' || y || ')' AS lm_wkt, " +
      "CASE WHEN y = 0 THEN '30' ELSE '12' END AS qk, " +
      "'POINT (' || x || '.5 ' || y || ')' AS rp_wkt, " +
      "TRUE AS ie_near, FALSE AS ie_far, " +
      "'MULTIPOINT ((' || x || ' ' || y || '), (' || (x+1) || ' ' || y || '))' AS cl_wkt, " +
      "CAST(0 AS BIGINT) AS hil_zero, " +
      // makevalid: the per-row bowtie nodes into two unit triangles;
      // simplifypreservetopology keeps the thin ring plain simplify would
      // collapse (area preserved)
      "ROUND(CAST(2 AS DOUBLE), 6) AS mv_area, TRUE AS mv_valid, " +
      "'MULTIPOLYGON' AS mv_type, " +
      "ROUND(CAST(0.8 AS DOUBLE), 6) AS spt_area " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), CAST(x+2 AS DOUBLE), CAST(y+2 AS DOUBLE)) AS a, " +
        "st_makeenvelope(CAST(x+2 AS DOUBLE), CAST(y AS DOUBLE), CAST(x+4 AS DOUBLE), CAST(y+2 AS DOUBLE)) AS edge_b, " +
        "st_makeenvelope(CAST(x+1 AS DOUBLE), CAST(y+1 AS DOUBLE), CAST(x+3 AS DOUBLE), CAST(y+3 AS DOUBLE)) AS over_b, " +
        "st_geomfromtext(CONCAT('LINESTRING (', x-1, ' ', y+1, ', ', x+3, ' ', y+1, ')')) AS thru, " +
        "st_geomfromtext(CONCAT('LINESTRING (', x, ' ', y, ', ', x+2, ' ', y, ', ', x+2, ' ', y+2, ', ', x, ' ', y+2, ', ', x, ' ', y, ')')) AS ring, " +
        "st_geomfromtext('LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)') AS bowtie " +
        "FROM pts) " +
        "SELECT n_nationkey, " +
        "st_touches(a, edge_b) AS t_edge, st_touches(a, over_b) AS t_overlap, " +
        "st_touches(a, a) AS t_self, " +
        "st_overlaps(a, over_b) AS o_partial, " +
        "st_overlaps(a, st_makeenvelope(CAST(x AS DOUBLE) + 0.5D, CAST(y AS DOUBLE) + 0.5D, CAST(x AS DOUBLE) + 1.0D, CAST(y AS DOUBLE) + 1.0D)) AS o_contain, " +
        "st_overlaps(a, edge_b) AS o_touch, " +
        "st_crosses(thru, a) AS c_through, " +
        "st_crosses(st_geomfromtext(CONCAT('LINESTRING (', x, ' ', y, ', ', x+1, ' ', y+1, ')')), a) AS c_inside, " +
        "st_containsproperly(a, st_makeenvelope(CAST(x AS DOUBLE) + 0.5D, CAST(y AS DOUBLE) + 0.5D, CAST(x AS DOUBLE) + 1.0D, CAST(y AS DOUBLE) + 1.0D)) AS cp_strict, " +
        "st_containsproperly(a, st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), CAST(x AS DOUBLE) + 1.0D, CAST(y AS DOUBLE) + 1.0D)) AS cp_corner, " +
        "st_dimension(st_geomfromtext(CONCAT('GEOMETRYCOLLECTION (POINT (', x, ' ', y, '), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))'))) AS dim_mix, " +
        "st_isring(ring) AS ring_ok, st_isring(bowtie) AS ring_bowtie, " +
        "ROUND(st_area(st_makepolygon(ring)), 6) AS mp_area, " +
        "st_geometrytype(st_multi(a)) AS multi_type, " +
        "CAST(size(st_dump(st_multi(st_union(a, st_makeenvelope(CAST(x AS DOUBLE) + 10.0D, CAST(y AS DOUBLE), CAST(x AS DOUBLE) + 11.0D, CAST(y AS DOUBLE) + 1.0D))))) AS INT) AS dump_n, " +
        "st_astext(st_geomfromhexwkb(st_ashexwkb(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE))))) AS hex_rt, " +
        "st_astext(st_linemerge(st_geomfromtext(CONCAT('MULTILINESTRING ((', x, ' ', y, ', ', x+1, ' ', y, '), (', x+1, ' ', y, ', ', x+2, ' ', y, '))')))) AS lm_wkt, " +
        "st_quadkey(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), 2) AS qk, " +
        "st_astext(st_reduceprecision(st_point(CAST(x AS DOUBLE) + 0.26D, CAST(y AS DOUBLE)), 0.5D)) AS rp_wkt, " +
        "st_intersects_extent(st_geomfromtext(CONCAT('POLYGON ((', x, ' ', y, ', ', x+4, ' ', y, ', ', x, ' ', y+4, ', ', x, ' ', y, '))')), " +
        "st_geomfromtext(CONCAT('POLYGON ((', x+4, ' ', y+4, ', ', x+3, ' ', y+4, ', ', x+4, ' ', y+3, ', ', x+4, ' ', y+4, '))'))) AS ie_near, " +
        "st_intersects_extent(a, st_makeenvelope(CAST(x AS DOUBLE) + 10.0D, CAST(y AS DOUBLE), CAST(x AS DOUBLE) + 11.0D, CAST(y AS DOUBLE) + 1.0D)) AS ie_far, " +
        "st_astext(st_collect(array(st_point(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), st_point(CAST(x+1 AS DOUBLE), CAST(y AS DOUBLE))))) AS cl_wkt, " +
        "st_hilbert(st_point(0.0D, 0.0D), st_makeenvelope(0.0D, 0.0D, 100.0D, 100.0D)) AS hil_zero, " +
        "ROUND(st_area(st_makevalid(st_geomfromtext(CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y+2, ', ', x+2, ' ', y, ', ', x, ' ', y+2, ', ', x, ' ', y, '))')))), 6) AS mv_area, " +
        "st_isvalid(st_makevalid(st_geomfromtext(CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y+2, ', ', x+2, ' ', y, ', ', x, ' ', y+2, ', ', x, ' ', y, '))')))) AS mv_valid, " +
        "st_geometrytype(st_makevalid(st_geomfromtext(CONCAT('POLYGON ((', x, ' ', y, ', ', x+2, ' ', y+2, ', ', x+2, ' ', y, ', ', x, ' ', y+2, ', ', x, ' ', y, '))')))) AS mv_type, " +
        "ROUND(st_area(st_simplifypreservetopology(st_makeenvelope(CAST(x AS DOUBLE), CAST(y AS DOUBLE), CAST(x+4 AS DOUBLE), CAST(y AS DOUBLE) + 0.2D), 10.0D)), 6) AS spt_area " +
        "FROM g ORDER BY n_nationkey")
    },

    // Curve geometries (r14): per-row semicircle CIRCULARSTRINGs round-trip
    // through WKT and linearize with closed-form chord sums — 16 chords of
    // 2 sin(pi/32) each for the half circle, half/full inscribed-32-gon
    // areas for the curve polygons.
    Op("spatial_curve",
      duckPtsInt +
      "SELECT n_nationkey, " +
      "'CIRCULARSTRING (' || x || ' ' || y || ', ' || (x+1) || ' ' || (y+1) || ', ' || (x+2) || ' ' || y || ')' AS cs_wkt, " +
      "'CIRCULARSTRING' AS cs_type, FALSE AS cs_empty, " +
      "CAST(17 AS INTEGER) AS line_np, " +
      "ROUND(32 * sin(pi()/32), 6) AS line_len, " +
      "ROUND(CAST(x AS DOUBLE), 6) AS line_xmin, " +
      "ROUND(8 * sin(pi()/16), 6) AS half_area, " +
      "ROUND(16 * sin(pi()/16), 6) AS circle_area " +
      "FROM pts ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(sparkPtsInt +
        ", g AS (SELECT n_nationkey, x, y, " +
        "st_geomfromtext(CONCAT('CIRCULARSTRING (', x, ' ', y, ', ', x+1, ' ', y+1, ', ', x+2, ' ', y, ')')) AS cs, " +
        "st_geomfromtext(CONCAT('CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (', x, ' ', y, ', ', x+1, ' ', y+1, ', ', x+2, ' ', y, '), (', x+2, ' ', y, ', ', x, ' ', y, ')))')) AS hd, " +
        "st_geomfromtext(CONCAT('CURVEPOLYGON (CIRCULARSTRING (', x, ' ', y, ', ', x+2, ' ', y, ', ', x, ' ', y, '))')) AS fc " +
        "FROM pts) " +
        "SELECT n_nationkey, st_astext(cs) AS cs_wkt, " +
        "st_geometrytype(cs) AS cs_type, st_isempty(cs) AS cs_empty, " +
        "st_npoints(st_curvetoline(cs)) AS line_np, " +
        "ROUND(st_length(st_curvetoline(cs)), 6) AS line_len, " +
        "ROUND(st_xmin(st_curvetoline(cs)), 6) AS line_xmin, " +
        "ROUND(st_area(st_curvetoline(hd)), 6) AS half_area, " +
        "ROUND(st_area(st_curvetoline(fc)), 6) AS circle_area " +
        "FROM g ORDER BY n_nationkey")
    },

    // st_union_agg (r14): per-region dissolve of overlapping 1.5x1.5
    // envelopes on the nation grid. The oracle computes the union area in
    // closed form by counting covered 0.5-cells (the envelopes are
    // 0.5-aligned, so the half-cell cover is exact); extent is min/max
    // arithmetic. The Spark side is the cascaded piece-fold aggregate.
    Op("spatial_union_agg",
      "WITH pts AS (SELECT n_regionkey AS r, CAST(n_nationkey % 5 AS DOUBLE) AS x, " +
      "CAST(n_nationkey // 5 AS DOUBLE) AS y FROM nation), " +
      "cells AS (SELECT i % 20 AS cx, i // 20 AS cy FROM range(400) t(i)), " +
      "covered AS (SELECT r, cx, cy FROM pts, cells " +
      "WHERE cx * 0.5 >= x AND (cx + 1) * 0.5 <= x + 1.5 " +
      "AND cy * 0.5 >= y AND (cy + 1) * 0.5 <= y + 1.5 GROUP BY r, cx, cy) " +
      "SELECT c.r, ROUND(CAST(c.cnt * 0.25 AS DOUBLE), 6) AS union_area, e.ux1, e.uy2 " +
      "FROM (SELECT r, COUNT(*) AS cnt FROM covered GROUP BY r) c JOIN " +
      "(SELECT r, ROUND(CAST(MIN(x) AS DOUBLE), 6) AS ux1, " +
      "ROUND(CAST(MAX(y) + 1.5 AS DOUBLE), 6) AS uy2 FROM pts GROUP BY r) e " +
      "USING (r) ORDER BY r") { (s, d) =>
      Tables.ensure(s, d)
      s.sql(
        "WITH pts AS (SELECT n_regionkey AS r, CAST(n_nationkey % 5 AS DOUBLE) AS x, " +
        "CAST(n_nationkey DIV 5 AS DOUBLE) AS y FROM nation), " +
        "g AS (SELECT r, st_makeenvelope(x, y, x + 1.5D, y + 1.5D) AS env FROM pts) " +
        "SELECT r, ROUND(st_area(st_union_agg(env)), 6) AS union_area, " +
        "ROUND(st_xmin(st_union_agg(env)), 6) AS ux1, " +
        "ROUND(st_ymax(st_union_agg(env)), 6) AS uy2 " +
        "FROM g GROUP BY r ORDER BY r")
    })
}
