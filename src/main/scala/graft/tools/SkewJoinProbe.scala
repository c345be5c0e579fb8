package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** A/B probe for the r8 salted gram join at corpus scale: take the sf0.1
  * documents table (50k docs) and append one shared "boilerplate" phrase to
  * 20% of them, so a single gram has df = 10k and the exact-Jaccard pair
  * join owes C(10k,2) = 50M intermediate pairs for that gram alone. Measure
  * the unsalted shape (hot cap = MaxValue: all pairs of the hot gram land
  * in ONE shuffle task) against the salted default (cap 4096, S=16: the
  * same work spread over 136 (gram,i,j) blocks), reporting wall time and
  * the MAX single-task duration of the pair stage — the straggler number
  * that decides whether a cluster waits on one core.
  *
  * Usage: sbt "runMain graft.tools.SkewJoinProbe [sfDir]"
  */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(10)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    // replicate the corpus `scale`x with distinct ids (copies contribute
    // ordinary near-dup pairs, identical on both sides of the A/B), then
    // append the shared phrase to 20% — at scale=10 over sf0.1 that is one
    // gram with df=10k, i.e. C(10k,2) ~ 50M pair rows owed by a single gram
    val base = spark.table("documents").select("doc_id", "text")
    val n = base.count()
    val docs = base
      .withColumn("copy", explode(sequence(lit(0), lit(scale - 1))))
      .select((col("doc_id") + col("copy") * n).as("doc_id"),
        concat(col("text"),
          when((col("doc_id") + col("copy") * n) % 5 === 0,
            lit(" zzhot1 zzhot2 zzhot3")).otherwise(lit("")))
          .as("text"))

    @volatile var maxTaskMs = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          val d = t.taskInfo.duration
          if (d > maxTaskMs) maxTaskMs = d
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(label: String, cap: Int): Long = {
      maxTaskMs = 0L
      val t0 = System.nanoTime()
      val n = graft.operators.TextPipeline.jaccardPairs(docs, 0.5, cap, 16).count()
      Thread.sleep(500)
      println(f"[skew] $label%-10s pairs=$n%d wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  maxTask=${maxTaskMs / 1000.0}%7.2f s")
      n
    }

    // Untimed warm pass first: the initial run absorbs page-cache fill and
    // the C2 compilation of the join/aggregate codegen, which otherwise
    // lands entirely in whichever measure goes first (observed: 111 s vs
    // 21 s max-task for the SAME salted shape measured first vs last).
    graft.operators.TextPipeline.jaccardPairs(docs, 0.5, 1000, 16).count(): Unit
    val b = measure("salted", 1000)
    val a = measure("unsalted", Int.MaxValue)
    assert(a == b, s"salting changed the result: $a vs $b")
    println("[skew] results identical")

    // df ~= cap crossover: the constructed hot gram has df = scale*n/5.
    // Pin that the cold (df <= cap) and salted (df > cap) routes agree at
    // the boundary by straddling it one doc apart — the exact regime where
    // a row must take exactly one branch of the static cold/hot union.
    val hotDf = (n * scale / 5).toInt
    val atCap = measure(s"cap=df", hotDf) // hot gram goes COLD (df <= cap)
    val below = measure(s"cap=df-1", hotDf - 1) // hot gram stays SALTED
    assert(atCap == below, s"cap boundary changed the result: $atCap vs $below")
    println(s"[skew] cap-boundary crossover identical at df=$hotDf")
    spark.stop()
  }
}
