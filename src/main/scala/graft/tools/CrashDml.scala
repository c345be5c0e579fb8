package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-JVM driver for the REAL kill -9 autocommit drill (DmlCrashSpec).
  *
  * Each invocation is one process with its own SparkSession over a shared
  * warehouse directory — the filesystem is the only state that survives,
  * exactly like a crashed-and-restarted server:
  *
  *   setup <wh>    create the table, seed rows, exit
  *   update <wh>   run a bare UPDATE with the crash-window widener armed —
  *                 the statement journals + publishes, then sleeps inside
  *                 the redo window; the PARENT kill -9s this process
  *   recover <wh>  fresh "bootstrap": run journal recovery, print the rows
  *
  * The table is EXTERNAL (explicit LOCATION) so each fresh process can
  * re-register it over the surviving files, the way a restarted server's
  * init SQL re-attaches its catalog.
  */
object CrashDml {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val wh = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"crash-dml-$mode")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sql("CREATE TABLE IF NOT EXISTS crash_t (id INT, v DOUBLE) " +
        s"USING parquet LOCATION '$wh/crash_t'")
      mode match {
        case "setup" =>
          spark.sql("INSERT INTO crash_t VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
          println("[crashdml] READY")
        case "update" =>
          spark.conf.set("spark.graft.dml.crashTestDelayMs", "120000")
          println("[crashdml] UPDATING")
          graft.sources.RowDml.execute(spark, "UPDATE crash_t SET v = v * 10")
          println("[crashdml] UNEXPECTED: update completed") // parent kills us first
        case "recover" =>
          val redone = graft.engine.TxnJournal.recover(spark)
          val rows = spark.table("crash_t").orderBy("id")
            .collect().map(_.getDouble(1)).mkString(",")
          println(s"[crashdml] REDONE:${redone.size} ROWS:$rows")
        case "inc" =>
          // concurrent-writer drill (two of these run at once): the widened
          // publish-to-fold window makes an unfenced lost-update near-certain
          // — without the cross-process CommitLock fence both processes read
          // the same pre-image and one increment vanishes
          spark.conf.set("spark.graft.dml.crashTestDelayMs", "2000")
          graft.sources.RowDml.execute(spark, "UPDATE crash_t SET v = v + 1")
          val rows = spark.table("crash_t").orderBy("id")
            .collect().map(_.getDouble(1)).mkString(",")
          println(s"[crashdml] INCED ROWS:$rows")
        case other => sys.error(s"unknown mode $other")
      }
    } finally spark.stop()
  }
}
