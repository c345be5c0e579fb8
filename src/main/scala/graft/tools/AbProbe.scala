package graft.tools
import graft.{GraftSession, Tables}
object AbProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, "/root/testdata/sf0.1")
    val old =
      """SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/7.0,2) AS avg_yearly FROM lineitem JOIN part ON p_partkey=l_partkey
        |WHERE p_brand='Brand#1' AND l_quantity < (SELECT 0.2*AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey=p_partkey)""".stripMargin
    val nw =
      """WITH l AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN (SELECT p_partkey FROM part WHERE p_brand='Brand#1') p
        |  ON p_partkey = l_partkey)
        |SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/7.0,2) AS avg_yearly
        |FROM l JOIN (SELECT l_partkey AS pk, 0.2*AVG(l_quantity) AS lim FROM l GROUP BY l_partkey) t
        |  ON l.l_partkey = t.pk
        |WHERE l_quantity < lim""".stripMargin
    def time(sql: String): (Double, Any) = {
      (1 to 3).foreach(_ => spark.sql(sql).collect())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val r = spark.sql(sql).collect()(0).get(0)
        ((System.nanoTime() - t0) / 1e6, r)
      }
      (ts.map(_._1).sorted.apply(2), ts.head._2)
    }
    // interleave to share noise
    val (o1, ov) = time(old); val (n1, nv) = time(nw)
    val (o2, _) = time(old); val (n2, _) = time(nw)
    println(f"[ab] old=${math.min(o1,o2)}%.1f ms new=${math.min(n1,n2)}%.1f ms oldVal=$ov newVal=$nv")
    spark.stop()
  }
}
