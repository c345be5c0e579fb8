package graft.tools
import graft.{GraftSession, Tables}
import graft.operators.TextPipeline
object R17JaccardAb2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents").select("doc_id", "text")
    def gated(): Long = {
      val r = TextPipeline.jaccardPairsGated(docs, 0.12, 1 << 12, 16)
      val n = r.count()
      r.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      }
      n
    }
    def staticCached(): Long =
      graft.engine.PlanCache.count(spark, "r17:jac-static")(
        TextPipeline.jaccardPairs(docs, 0.12, 1 << 12, 16))
    def med(f: () => Long): Double = {
      (1 to 3).foreach(_ => f())
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }.sorted.apply(3)
    }
    val g1 = med(gated _); val s1 = med(staticCached _)
    val g2 = med(gated _); val s2 = med(staticCached _)
    println(f"[jab2] gatedEager=$g1%6.1f/$g2%6.1f ms  staticCached=$s1%6.1f/$s2%6.1f ms  " +
      s"rows gated=${gated()} static=${staticCached()}")
    spark.stop()
  }
}
