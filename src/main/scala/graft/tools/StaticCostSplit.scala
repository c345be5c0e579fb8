package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
/** Split a static-pinned query's per-call cost: physical planning (ofRows +
  * executedPlan force) vs execution (collect). */
object StaticCostSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val clone = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    clone.conf.set("spark.sql.shuffle.partitions", "8")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_h05", "join_inner_h03", "join_self_nation", "tpch_h09", "join_left_hist")
    names.foreach { n =>
      val op = SparkEntry.allOps.find(_.name == n).get
      val opt = op.run(spark, sfDir).groupBy().count().queryExecution.optimizedPlan
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val df = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, opt)
        df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      (1 to 3).foreach(_ => once())
      val runs = (1 to 5).map(_ => once())
      val plan = runs.map(_._1).sorted.apply(2); val exec = runs.map(_._2).sorted.apply(2)
      println(f"$n%-20s plan=$plan%5.0f ms exec=$exec%5.0f ms")
    }
    spark.stop()
  }
}
