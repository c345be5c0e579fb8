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
    })
}
