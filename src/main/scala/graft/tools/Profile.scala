package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.TextPipeline

/** Scratch profiler for operator hotspots (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.ensure(spark, dir)
    val docs = spark.table("documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val n = time("minhash candidates")(TextPipeline.minhashCandidates(docs).count())
    println(s"[profile] candidate pairs: $n")
    val n2 = time("minhash candidates (2nd)")(TextPipeline.minhashCandidates(docs).count())
    val j = time("jaccard pairs")(TextPipeline.jaccardPairs(docs, 0.12).count())
    println(s"[profile] jaccard pairs: $j")
    val sh = time("simhash")(TextPipeline.simhash(docs).count())
    spark.stop()
  }
}
