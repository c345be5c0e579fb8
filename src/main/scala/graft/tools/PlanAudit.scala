package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Physical-plan audit for the headline queries: prints `explain formatted`
  * plus mechanical checks — are filters pushed into the parquet scan, is the
  * read schema pruned, did the small side broadcast, how many exchanges.
  * Run: sbt "runMain graft.tools.PlanAudit [opName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Tables.ensure(spark, dir)
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    val queries = SparkEntry.queries
    names.filter(queries.contains).foreach { name =>
      val df = queries(name)(spark, dir)
      // Materialize THIS df's own query execution (count() would plan a
      // different query) so AQE finalizes and codegen spans appear.
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length -
        "BroadcastExchange".r.findAllIn(plan).length
      val summary = Seq(
        s"broadcasts=${"BroadcastExchange".r.findAllIn(plan).length}",
        s"shuffles=$exchanges",
        s"codegenSpans=${"\\*\\(\\d+\\)".r.findAllIn(plan).map(identity).toSet.size}",
        s"pushedFilters=${if (plan.contains("PushedFilters: [")) !plan.contains("PushedFilters: []") else false}",
        s"sorts=${"(?m)^\\s*[+:]?-? *Sort ".r.findAllIn(plan).length}",
        s"partitionPruned=${"PartitionFilters: \\[[^\\]]".r.findAllIn(plan).nonEmpty}"
      ).mkString(" ")
      println(s"== $name: $summary")
      if (sys.env.contains("PLAN_FULL")) {
        df.explain("formatted")
      } else {
        // one-line scan summaries: pushed filters + read schema width
        "(?m)PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).foreach(f => println(s"   $f"))
        "(?m)ReadSchema: [^\n]*".r.findAllIn(plan).foreach(f =>
          println(s"   ${f.take(160)}"))
      }
    }
    spark.stop()
  }
}
