package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.GraftDatasetShim
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Replicates PlanCache.prepareOptimized's eligibility flags for one query
  * and prints each, for debugging why a shape is not static-pinned.
  */
object R17WhyNotStatic {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val clone = GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    args.foreach { n =>
      val opt = SparkEntry.allOps.find(_.name == n).get.run(spark, sfDir)
        .queryExecution.optimizedPlan
      val df = GraftDatasetShim.ofRowsPreOptimized(clone, opt)
      def fragments(p: SparkPlan): Seq[SparkPlan] = p +: p.subqueries.flatMap(fragments)
      val all = fragments(df.queryExecution.executedPlan)
      val shuffledJoin = all.exists(_.exists {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      })
      val leaves = all.flatMap(_.collectLeaves())
      val allFileLeaves = leaves.nonEmpty && leaves.forall {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.LocalTableScanExec => true
        case _ => false
      }
      val totalInputBytes = leaves.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.sizeInBytes
      }.sum
      val rowMultiplier = all.exists(_.exists {
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
        case _: org.apache.spark.sql.execution.GenerateExec => true
        case _: org.apache.spark.sql.execution.ExpandExec => true
        case _ => false
      })
      val derived = all.flatMap(_.collect {
        case b: BroadcastExchangeExec =>
          val agg = b.child.exists {
            case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
            case _ => false
          }
          val shuffleExchange = b.child.exists {
            case _: ShuffleExchangeExec => true
            case r: ReusedExchangeExec => r.child.isInstanceOf[ShuffleExchangeExec]
            case _ => false
          }
          (shuffleExchange, agg)
      })
      val badLeaves = leaves.filterNot {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.LocalTableScanExec => true
        case _ => false
      }.map(_.getClass.getSimpleName).distinct
      println(s"== $n: shuffledJoin=$shuffledJoin allFileLeaves=$allFileLeaves " +
        s"badLeaves=$badLeaves inputBytes=$totalInputBytes rowMultiplier=$rowMultiplier " +
        s"builds(shufEx,agg)=$derived")
    }
    spark.stop()
  }
}
