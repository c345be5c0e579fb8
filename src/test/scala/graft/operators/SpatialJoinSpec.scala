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

  test("knn join: exact k nearest with ties and a starved far point; plan is a cell equi-join (r13)") {
    import spark.implicits._
    // right side: a dense cluster near the origin plus two distant points;
    // ids 2 and 3 are EQUIDISTANT from (0,0) — the id tie-break decides
    val r = Seq((1L, 0.0, 1.0), (2L, 1.0, 0.0), (3L, 0.0, -1.0), (4L, 2.0, 0.0),
      (5L, 50.0, 50.0), (6L, 51.0, 50.0)).toDF("rid", "x", "y")
    // left: origin (solved in round 1 by the density heuristic) and a FAR
    // point whose neighbors only appear after radius doubling
    val l = Seq((100L, 0.0, 0.0), (200L, 49.0, 50.0)).toDF("lid", "x", "y")
    val out = SpatialJoin.knnJoin(l, col("lid"), col("x"), col("y"),
      r, col("rid"), col("x"), col("y"), k = 3)
    val got = out.collect().map(x => (x.getLong(0), x.getInt(3), x.getLong(1), x.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    // (49,50) -> (2,0): 47^2 + 50^2 = 4709
    val d3 = BigDecimal(math.sqrt(4709.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (100L, 1, 1L, 1.0), (100L, 2, 2L, 1.0), (100L, 3, 3L, 1.0),
      (200L, 1, 5L, 1.0), (200L, 2, 6L, 2.0), (200L, 3, 4L, d3)),
      s"ties at dist 1 resolve by id (1 < 2 < 3); far point needs expanded rounds: $got")
    // k larger than the right side: every right point comes back, ranked
    val all = SpatialJoin.knnJoin(l.limit(1), col("lid"), col("x"), col("y"),
      r, col("rid"), col("x"), col("y"), k = 10)
    assert(all.count() == 6 && all.agg(max("rnk")).collect().head.getInt(0) == 6)
    // empty right side -> empty result, schema intact
    val none = SpatialJoin.knnJoin(l, col("lid"), col("x"), col("y"),
      r.where(lit(false)), col("rid"), col("x"), col("y"), k = 2)
    assert(none.columns.toSeq == Seq("id_a", "id_b", "dist", "rnk") && none.isEmpty)
    // scale shape: every round is a cell equi-join, never a nested loop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"knn join must stay a cell equi-join, got:\n$plan")
  }

  test("polygon join: overlap/containment/corner-touch exact, each pair once, cell equi-join plan (r14)") {
    import spark.implicits._
    val a = Seq(
      (1L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), // big box
      (2L, "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"), // far box
      (3L, "POLYGON ((0 6, 4 6, 4 8, 2 8, 2 10, 0 10, 0 6))")) // concave L
      .toDF("aid", "awkt")
      .withColumn("ageom", call_function("st_geomfromtext", col("awkt")))
    val b = Seq(
      (10L, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"), // strictly inside a1 (no edge cross)
      (20L, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"), // overlaps a1 across 4 shared cells
      (30L, "POLYGON ((3 8, 5 8, 5 9, 3 9, 3 8))"), // edge-touches the L's arm at y=8
      (40L, "POLYGON ((12 12, 13 12, 13 13, 12 13, 12 12))")) // corner-touches a2
      .toDF("bid", "bwkt")
      .withColumn("bgeom", call_function("st_geomfromtext", col("bwkt")))
    val out = SpatialJoin.polygonJoin(a, col("ageom"), b, col("bgeom"), cellSize = 2.0)
      .select("aid", "bid")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    // sorted LIST, not set: a pair surviving in more than one shared cell
    // would appear twice and fail here
    assert(got == List((1L, 10L), (1L, 20L), (2L, 40L), (3L, 30L)),
      s"containment without edge crossing, boundary touches, exactly-once: $got")
    // auto cell size agrees
    val auto = SpatialJoin.polygonJoin(a, col("ageom"), b, col("bgeom"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(auto == got)
    // scale shape: a blocked equi-join, never a nested loop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"polygon join must stay a cell equi-join, got:\n$plan")
  }

  test("knn join: exact for ANY maxRounds (terminal round runs at coverage radius); blocks freed (r14)") {
    import spark.implicits._
    val r = Seq((1L, 0.0, 1.0), (2L, 1.0, 0.0), (3L, 0.0, -1.0), (4L, 2.0, 0.0),
      (5L, 50.0, 50.0), (6L, 51.0, 50.0)).toDF("rid", "x", "y")
    val l = Seq((100L, 0.0, 0.0), (200L, 49.0, 50.0)).toDF("lid", "x", "y")
    val want = Set((100L, 1L), (100L, 2L), (100L, 3L), (200L, 5L), (200L, 6L), (200L, 4L))
    // with maxRounds <= 3 the round terminal BY COUNT must still run at the
    // coverage bound — previously it accepted rank <= k at a starved radius
    for (mr <- Seq(1, 2, 3, 4)) {
      val got = SpatialJoin.knnJoin(l, col("lid"), col("x"), col("y"),
        r, col("rid"), col("x"), col("y"), k = 3, maxRounds = mr)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"maxRounds=$mr must stay exact: $got")
    }
    // block lifetime: after the op returns only the RESULT's checkpoint is
    // pinned (per-round kept/remainder blocks freed eagerly), and the
    // result itself is releasable once consumed
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SpatialJoin.knnJoin(l, col("lid"), col("x"), col("y"),
      r, col("rid"), col("x"), col("y"), k = 3)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size <= 1, s"per-round kNN blocks must be freed at return, still pinned: $pinned")
    assert(out.count() == 6)
    SpatialJoin.freeLocalCheckpoint(out)
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leftover.isEmpty, s"consumed kNN result must be releasable: $leftover")
  }
}
