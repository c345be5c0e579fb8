package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the expanding-radius kNN join (r13): uniform point
  * clouds at 1x/10x/30x row counts with CONSTANT density (the extent grows
  * with n, so the density-derived starting radius and per-point candidate
  * count ~9k should stay flat and the wall should track n — the linear
  * contract), plus one fixed-extent run (density grows 30x; the radius
  * heuristic must shrink to keep candidates bounded, not balloon the
  * join). Output rows must equal |left| * k exactly at every scale —
  * the correctness check rides along. Recorded in ARCHITECTURE.md.
  */
object KnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toInt else 200000
    val k = 8
    val spark = graft.GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cloud(n: Int, extent: Double, salt: Int) = spark.range(n).select(
      col("id"),
      (pmod(xxhash64(col("id") + salt), lit(1000000)).cast("double") / 1000000.0 * extent).as("x"),
      (pmod(xxhash64(col("id") + salt + 13), lit(1000000)).cast("double") / 1000000.0 * extent).as("y"))
      .localCheckpoint(true)

    def run(tag: String, scale: Int, extent: Double): Unit = {
      val r = cloud(base * scale, extent, 7)
      val l = cloud(base * scale / 10, extent, 91)
      val t0 = System.nanoTime()
      val out = graft.operators.SpatialJoin.knnJoin(
        l, col("id"), col("x"), col("y"), r, col("id"), col("x"), col("y"), k).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val expect = (base * scale / 10).toLong * k
      println(f"[knnscale] $tag%-24s n=${base * scale}%9d extent=$extent%8.1f " +
        f"wall=$wall%7.3f s out=$out%9d expect=$expect%9d ${if (out == expect) "OK" else "MISMATCH"}")
      r.unpersist(); l.unpersist()
    }

    // constant density: extent side grows with sqrt(n)
    run("1x  const-density", 1, 1000.0)
    run("10x const-density", 10, 1000.0 * math.sqrt(10))
    run("30x const-density", 30, 1000.0 * math.sqrt(30))
    // fixed extent, 30x density: the derived radius must shrink with it
    run("30x fixed-extent", 30, 1000.0)
    spark.stop()
  }
}
