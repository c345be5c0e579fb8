package graft.tools

import org.apache.spark.sql.functions._

/** Pathological-cell skew probe for the grid-blocked spatial join (r11
  * verdict #4): ALL points land in ONE grid cell (a city block), so the
  * entire candidate set hashes to a single join key. Measures the blocked
  * point-in-polygon join on (a) a uniform point cloud and (b) the one-cell
  * cloud at the same row counts, and (c) the one-cell cloud with a smaller
  * cell size (the documented retuning story) — wall + output rows each.
  *
  * Expected shape: the skewed cell serializes the candidate verify on one
  * task (the cost model's quadratic-within-a-cell bound), and shrinking
  * cellSize restores parallelism by splitting the block — the same
  * retuning contract as any blocking join. Recorded in ARCHITECTURE.md.
  */
object SpatialSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val polys = 64
    val spark = graft.GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // polygons: a polys x 1 strip of unit squares along x = 0..polys
    val g = spark.range(polys).select(
      col("id").as("poly_id"),
      call_function("st_makeenvelope", col("id").cast("double"), lit(0.0),
        col("id").cast("double") + 1.0, lit(1.0)).as("geom"))

    def run(tag: String, pts: org.apache.spark.sql.DataFrame, cell: Double): Unit = {
      val t0 = System.nanoTime()
      val out = graft.operators.SpatialJoin.pointInPolygon(
        pts, g, col("px"), col("py"), col("geom"), cellSize = cell).count()
      println(f"[spatialskew] $tag%-28s cell=$cell%6.3f wall=${(System.nanoTime() - t0) / 1e9}%7.3f s out=$out")
    }

    // uniform: points spread across the strip (each cell holds n/polys)
    val uniform = spark.range(n).select(
      (pmod(xxhash64(col("id")), lit(polys * 1000)).cast("double") / 1000.0).as("px"),
      (pmod(xxhash64(col("id") + 7), lit(1000)).cast("double") / 1000.0).as("py"))
      .localCheckpoint(true)
    // one-cell: every point inside polygon 0's unit square
    val oneCell = spark.range(n).select(
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 1000.0).as("px"),
      (pmod(xxhash64(col("id") + 7), lit(1000)).cast("double") / 1000.0).as("py"))
      .localCheckpoint(true)

    run("warmup", uniform.limit(10000), 1.0)
    run("one-cell pass1 (jit)", oneCell, 1.0)
    run("uniform pass1 (jit)", uniform, 1.0)
    run("uniform", uniform, 1.0)
    run("one-cell (skewed)", oneCell, 1.0)
    run("uniform again", uniform, 1.0)
    run("one-cell, cell/8 retune", oneCell, 0.125)
    run("one-cell, cell/32 retune", oneCell, 0.03125)
    spark.stop()
  }
}
