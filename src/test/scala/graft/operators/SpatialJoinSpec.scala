package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Grid-blocked spatial joins: exact results on constructed geometry
  * (negative coordinates, boundary cases) and the SCALE-SHAPE assertion —
  * the join must be a hash equi-join on cell keys, never the nested-loop
  * cartesian Spark plans for an opaque spatial predicate.
  */
class SpatialJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local()

  test("point-in-polygon: exact pairs incl. negative coords; plan is a cell equi-join") {
    import spark.implicits._
    val pts = Seq((1L, -1.5, -1.5), (2L, 0.5, 0.5), (3L, 5.0, 5.0), (4L, 2.0, 2.0))
      .toDF("pid", "x", "y")
    val polys = Seq(
      (10L, -2.0, -2.0, 0.0, 0.0), // catches p1 (and p2? no: 0.5 > 0) — p1 only, p2 on nothing
      (20L, 0.0, 0.0, 2.0, 2.0), // catches p2 interior, p4 on its corner (boundary)
      (30L, 4.0, 4.0, 6.0, 6.0)) // catches p3
      .toDF("gid", "xmin", "ymin", "xmax", "ymax")
      .withColumn("geom", call_function("st_makeenvelope",
        col("xmin"), col("ymin"), col("xmax"), col("ymax")))
    val joined = SpatialJoin.pointInPolygon(pts, polys,
      col("x"), col("y"), col("geom"), cellSize = 2.0)
      .select("pid", "gid")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (4L, 20L), (3L, 30L)),
      "intersects is boundary-inclusive: the corner point pairs with its box")
    // boundary-exclusive form drops the corner contact
    val strict = SpatialJoin.pointInPolygon(pts, polys,
      col("x"), col("y"), col("geom"), cellSize = 2.0, boundaryExclusive = true)
      .select("pid", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // scale shape: a blocked equi-join, not a nested loop
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"spatial join must stay a cell equi-join, got:\n$plan")
  }

  test("auto cell size derives from mean polygon bbox and matches the explicit result") {
    import spark.implicits._
    val pts = Seq((1L, 0.5, 0.5), (2L, 3.0, 3.0), (3L, 9.0, 9.0)).toDF("pid", "x", "y")
    val polys = Seq((10L, 0.0, 0.0, 2.0, 2.0), (20L, 2.5, 2.5, 4.5, 4.5))
      .toDF("gid", "a", "b", "c", "dd")
      .withColumn("geom", call_function("st_makeenvelope",
        col("a"), col("b"), col("c"), col("dd")))
    val auto = SpatialJoin.pointInPolygon(pts, polys, col("x"), col("y"), col("geom"))
      .select("pid", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicitC = SpatialJoin.pointInPolygon(pts, polys,
      col("x"), col("y"), col("geom"), cellSize = 2.0)
      .select("pid", "gid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == Set((1L, 10L), (2L, 20L)) && auto == explicitC)
  }

  test("radius join: symmetric pairs once, radius > cellSize rejected") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.9, 0.9), (4L, 10.0, 10.0))
      .toDF("id", "x", "y")
    val got = SpatialJoin.pointsWithin(pts, col("x"), col("y"), col("id"),
      radius = 1.5, cellSize = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)), "isolated point pairs with nothing")
    intercept[IllegalArgumentException](
      SpatialJoin.pointsWithin(pts, col("x"), col("y"), col("id"), 3.0, 2.0))
  }
}
