package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scale posture of the r11 atomic autocommit DML: on a partitioned table,
  * a bare UPDATE touching ONE partition must cost O(affected partition) —
  * the snapshot writes only that partition and hardlinks the rest, the fold
  * dynamic-overwrites only that partition — while the journal+manifest
  * protocol rides along at O(metadata). Contrast with the same UPDATE
  * forced down the unscoped path (full post-image, full fold).
  *
  * Run: sbt "runMain graft.tools.DmlScaleProbe [N]" (orders x N, 64 hash
  * partitions, update one).
  */
object DmlScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, "/root/testdata/sf0.1")
    val copies = spark.range(n).select(col("id").as("copy"))
    // 64 partitions (a day-partitioned table's shape, scaled down), update
    // ONE: the scoped path should cost O(1/64 of the table) + metadata
    val big = spark.table("orders").crossJoin(copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("copy") * 100000000L)
      .withColumn("bucket", pmod(col("o_orderkey"), lit(64)).cast("int"))
      .drop("copy")

    def fresh(): Unit = {
      spark.sql("DROP TABLE IF EXISTS dml_scale_t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "dml_scale_t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      big.write.partitionBy("bucket").saveAsTable("dml_scale_t")
    }

    fresh()
    val total = spark.table("dml_scale_t").count()
    println(f"[dmlscale] table: $total rows, 64 partitions, ${n}x")

    // unscoped first (it also pays the write-path JIT warmup): the full
    // post-image path
    var t0 = System.nanoTime()
    val full = graft.sources.RowDml.execute(spark,
      "UPDATE dml_scale_t SET o_totalprice = o_totalprice * 1.01 WHERE bucket = 7",
      allowPartitionScope = false).collect().head.getLong(0)
    val fullS = (System.nanoTime() - t0) / 1e9
    println(f"[dmlscale] full-rewrite UPDATE at ${n}x: $fullS%.2f s ($full rows)")

    // scoped: the default engine path (partition-scoped snapshot via
    // hardlink composition, dynamic fold)
    fresh()
    t0 = System.nanoTime()
    val scoped = graft.sources.RowDml.execute(spark,
      "UPDATE dml_scale_t SET o_totalprice = o_totalprice * 1.01 WHERE bucket = 7")
      .collect().head.getLong(0)
    val scopedS = (System.nanoTime() - t0) / 1e9
    println(f"[dmlscale] scoped one-partition UPDATE at ${n}x: $scopedS%.2f s ($scoped rows, " +
      f"full = ${fullS / scopedS}%.1fx the scoped path)")
    spark.sql("DROP TABLE IF EXISTS dml_scale_t")
    spark.stop()
  }
}
