package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

/** Distributed skyline: dominance semantics vs a brute-force reference,
  * tie handling, degenerate cases. The cross-engine value check is the
  * `pipeline_pareto_front` oracle (NOT EXISTS dominance in DuckDB).
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Double)]): Set[Long] = {
    // maximize a, minimize b
    def dom(x: (Long, Double, Double), y: (Long, Double, Double)): Boolean =
      x._2 >= y._2 && x._3 <= y._3 && (x._2 > y._2 || x._3 < y._3)
    rows.filter(r => !rows.exists(o => dom(o, r))).map(_._1).toSet
  }

  test("matches brute-force dominance on random data across partitionings") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map(i =>
      (i, (rnd.nextInt(50)).toDouble, (rnd.nextInt(50)).toDouble))
    val expected = brute(rows)
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("id", "a", "b").repartition(parts)
      val got = Skyline.skyline(df, Seq(("a", true), ("b", false)))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("ties survive together; dominated duplicates of a frontier point do not exist") {
    val df = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 4.0, 6.0), (4L, 6.0, 4.0))
      .toDF("id", "a", "b")
    val got = Skyline.skyline(df, Seq(("a", true), ("b", false)))
      .select("id").collect().map(_.getLong(0)).toSet
    // 4 dominates 1,2,3 (higher a, lower b) -> only 4 survives
    assert(got == Set(4L))
    val tied = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0)).toDF("id", "a", "b")
    assert(Skyline.skyline(tied, Seq(("a", true), ("b", false))).count() == 2)
  }

  test("single maximize dimension degenerates to the arg-max set") {
    val df = Seq((1L, 3.0), (2L, 9.0), (3L, 9.0), (4L, 1.0)).toDF("id", "v")
    val got = Skyline.skyline(df, Seq(("v", true)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("the global refine joins local-skyline candidates, not the full input") {
    // correlated dims -> tiny frontier; the anti-join's inputs are the
    // mapPartitions local skylines (plan shows the serialize/mapPartitions
    // boundary feeding the join), so the quadratic phase never sees the
    // raw table
    val rows = (0L until 2000L).map(i => (i, i.toDouble, (2000 - i).toDouble))
    val df = rows.toDF("id", "a", "b").repartition(8)
    val sky = Skyline.skyline(df, Seq(("a", true), ("b", false)))
    assert(sky.count() == 1 && sky.collect()(0).getLong(0) == 1999L)
    val plan = sky.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      s"local-skyline phase missing from plan:\n$plan")
  }
}
