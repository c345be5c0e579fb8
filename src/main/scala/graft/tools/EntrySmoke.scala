package graft.tools

/** Driver-contract smoke: `SparkEntry.entry` must return rows and `Bench`'s
  * JSON line must parse — the two things the round driver gates on before
  * anything else.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
