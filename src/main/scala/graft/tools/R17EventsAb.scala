package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import graft.operators.Money
object R17EventsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val ev = spark.table("events")
    def cur = ev.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(Money.dec2("value")), 2).cast("double").as("v"))
      .orderBy("h", "event_type")
    // group on floor-to-hour SECONDS (integer ops in the hot path), rebuild
    // the truncated timestamp over the 3.6k output rows only
    def alt = {
      val secs = unix_seconds(col("ts").cast("timestamp"))
      ev.groupBy((secs - pmod(secs, lit(3600L))).as("hb"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum(Money.dec2("value")), 2).cast("double").as("v"))
        .select(timestamp_seconds(col("hb")).cast("timestamp_ntz").as("h"),
          col("event_type"), col("c"), col("v"))
        .orderBy("h", "event_type")
    }
    def med(key: String)(build: => org.apache.spark.sql.DataFrame): Double = {
      def f() = graft.engine.PlanCache.count(spark, key)(build)
      (1 to 3).foreach(_ => f())
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }.sorted.apply(3)
    }
    val c1 = med("ev:cur")(cur); val a1 = med("ev:alt")(alt)
    val c2 = med("ev:cur")(cur); val a2 = med("ev:alt")(alt)
    val eq = cur.collect().map(_.toString).toSeq == alt.collect().map(_.toString).toSeq
    val schemaEq = cur.schema == alt.schema
    println(f"[evab] cur=$c1%5.1f/$c2%5.1f  alt=$a1%5.1f/$a2%5.1f ms  rowsEqual=$eq schemaEqual=$schemaEq")
    spark.stop()
  }
}
