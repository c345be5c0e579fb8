package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** A/B a SQL conf against the default for a set of queries (scratch tool).
  * Run: sbt "runMain graft.tools.ConfExperiment <key=value> <q1> [q2 ...]"
  */
object ConfExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val Array(kv, names @ _*) = args: @unchecked
    val Array(key, value) = kv.split("=", 2)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val q = SparkEntry.queries
    def median5(name: String): Double = {
      (1 to 3).foreach(_ => q(name)(spark, sfDir).count())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); q(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(2)
    }
    names.foreach { n =>
      spark.conf.unset(key)
      val base = median5(n)
      spark.conf.set(key, value)
      val alt = median5(n)
      spark.conf.unset(key)
      println(f"[conf] $n%-24s default=$base%.3f  $kv=$alt%.3f  delta=${(alt - base) * 1000}%+.0f ms")
    }
    spark.stop()
  }
}
