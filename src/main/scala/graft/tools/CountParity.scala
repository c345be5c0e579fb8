package graft.tools
import graft.{Bench, GraftSession, SparkEntry, Tables}
object CountParity {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    var bad = 0
    Bench.headline.foreach { n =>
      val direct = SparkEntry.queries(n)(spark, sfDir).count()
      val cached = (1 to 3).map(_ =>
        graft.engine.PlanCache.count(spark, s"parity:$n")(SparkEntry.queries(n)(spark, sfDir)))
      if (!cached.forall(_ == direct)) { bad += 1
        println(s"[parity] MISMATCH $n direct=$direct cached=$cached") }
      else println(s"[parity] ok $n $direct")
    }
    println(s"[parity] done, $bad mismatches")
    spark.stop()
  }
}
