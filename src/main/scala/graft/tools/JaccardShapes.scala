package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.TextPipeline

/** Same-JVM, same-window A/B/C of jaccard join shapes on the benign sf
  * corpus (scratch tool): (a) r7 unsalted join on gram alone, (b) r8
  * salted-everything on (gram, i, j), (c) the static cold/hot union split,
  * (d) the split without the post-window materialization exchange. Answers
  * "what does skew insurance cost when there is no skew" without
  * cross-window host noise.
  */
object JaccardShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    val threshold = 0.12

    def finish(pairsIn: DataFrame): DataFrame = {
      val pairs = pairsIn
        .groupBy(
          least(col("ld"), col("rd")).as("id_a"),
          greatest(col("ld"), col("rd")).as("id_b"),
          when(col("ld") < col("rd"), col("ln")).otherwise(col("rn")).as("na"),
          when(col("ld") < col("rd"), col("rn")).otherwise(col("ln")).as("nb"))
        .agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      pairs.filter(jac >= threshold)
        .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }

    def g2base: DataFrame = TextPipeline.shingleHashes(docs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("df") >= 2)

    // (a) r7: unsalted, join on gram, no materialization exchange
    def unsalted: DataFrame = {
      val g2 = g2base.drop("df")
      finish(g2.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
        .hint("shuffle_hash")
        .join(g2.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
        .filter(col("ld") < col("rd")))
    }

    // (b) r8: every row salted, join on (gram, i, j)
    def saltedAll(cap: Int, salts: Int): DataFrame = {
      val g2 = g2base
        .withColumn("hot", col("df") > cap)
        .withColumn("salt", when(col("hot"),
          pmod(xxhash64(col("doc_id")), lit(salts)).cast("int")).otherwise(lit(0)))
        .drop("df")
      val lhs = g2.withColumn("j", explode(sequence(col("salt"),
          when(col("hot"), lit(salts - 1)).otherwise(col("salt")))))
        .select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"),
          col("salt").as("i"), col("j"))
      val rhs = g2.withColumn("i", explode(sequence(
          when(col("hot"), lit(0)).otherwise(col("salt")), col("salt"))))
        .select(col("gram"), col("doc_id").as("rd"), col("n").as("rn"),
          col("i"), col("salt").as("j"))
      finish(lhs.hint("shuffle_hash").join(rhs, Seq("gram", "i", "j"))
        .filter(col("i") =!= col("j") || col("ld") < col("rd"))
        .select("ld", "rd", "ln", "rn"))
    }

    // (c)/(d) static cold/hot split, with/without the materialization point
    def split(materialize: Boolean, cap: Int, salts: Int): DataFrame = {
      val g2 = if (materialize) g2base.repartition(col("gram")) else g2base
      val cold = g2.filter(col("df") <= cap).drop("df")
      val hot = g2.filter(col("df") > cap).drop("df")
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      val coldPairs = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
        .hint("shuffle_hash")
        .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
        .filter(col("ld") < col("rd"))
        .select("ld", "rd", "ln", "rn")
      val lhs = hot.withColumn("j", explode(sequence(col("salt"), lit(salts - 1))))
        .select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"),
          col("salt").as("i"), col("j"))
      val rhs = hot.withColumn("i", explode(sequence(lit(0), col("salt"))))
        .select(col("gram"), col("doc_id").as("rd"), col("n").as("rn"),
          col("i"), col("salt").as("j"))
      val hotPairs = lhs.hint("shuffle_hash").join(rhs, Seq("gram", "i", "j"))
        .filter(col("i") =!= col("j") || col("ld") < col("rd"))
        .select("ld", "rd", "ln", "rn")
      finish(coldPairs.unionByName(hotPairs))
    }

    // (e) cold-only: what the plan would cost if a df-sketch gate removed
    // the (empty) hot branch entirely on this benign corpus — the upper
    // bound on what VERDICT r10 #6's gating could save.
    def coldOnly: DataFrame = {
      val g2 = g2base.repartition(col("gram")).drop("df")
      finish(g2.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
        .hint("shuffle_hash")
        .join(g2.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
        .filter(col("ld") < col("rd")))
    }

    // (f) df-sketch gate over an eagerly pinned index: materialize the gram
    // index ONCE (localCheckpoint preserves the repartition's gram
    // clustering), probe max-df from the pinned blocks (~ms), and only
    // build the salted branch when a hot gram exists.
    def gated(cap: Int, salts: Int): DataFrame = {
      val g2 = g2base.repartition(col("gram")).localCheckpoint(true)
      val anyHot = !g2.filter(col("df") > cap).isEmpty
      if (!anyHot) {
        val cold = g2.drop("df")
        finish(cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
          .hint("shuffle_hash")
          .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
          .filter(col("ld") < col("rd")))
      } else {
        val cold = g2.filter(col("df") <= cap).drop("df")
        val hot = g2.filter(col("df") > cap).drop("df")
          .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
        val coldPairs = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
          .hint("shuffle_hash")
          .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
          .filter(col("ld") < col("rd"))
          .select("ld", "rd", "ln", "rn")
        val lhs = hot.withColumn("j", explode(sequence(col("salt"), lit(salts - 1))))
          .select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"),
            col("salt").as("i"), col("j"))
        val rhs = hot.withColumn("i", explode(sequence(lit(0), col("salt"))))
          .select(col("gram"), col("doc_id").as("rd"), col("n").as("rn"),
            col("i"), col("salt").as("j"))
        val hotPairs = lhs.hint("shuffle_hash").join(rhs, Seq("gram", "i", "j"))
          .filter(col("i") =!= col("j") || col("ld") < col("rd"))
          .select("ld", "rd", "ln", "rn")
        finish(coldPairs.unionByName(hotPairs))
      }
    }

    // (g) pin the WINDOW OUTPUT itself (localCheckpoint preserves its
    // hash(gram) clustering — no separate repartition materialization
    // point needed), probe max-df from the pinned blocks, gate the hot
    // branch on the probe.
    def gatedPin(cap: Int, salts: Int): DataFrame = {
      val g2 = g2base.localCheckpoint(true)
      val anyHot = !g2.filter(col("df") > cap).isEmpty
      if (!anyHot) {
        val cold = g2.drop("df")
        finish(cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
          .hint("shuffle_hash")
          .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
          .filter(col("ld") < col("rd")))
      } else {
        val cold = g2.filter(col("df") <= cap).drop("df")
        val hot = g2.filter(col("df") > cap).drop("df")
          .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
        val coldPairs = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
          .hint("shuffle_hash")
          .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
          .filter(col("ld") < col("rd"))
          .select("ld", "rd", "ln", "rn")
        val lhs = hot.withColumn("j", explode(sequence(col("salt"), lit(salts - 1))))
          .select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"),
            col("salt").as("i"), col("j"))
        val rhs = hot.withColumn("i", explode(sequence(lit(0), col("salt"))))
          .select(col("gram"), col("doc_id").as("rd"), col("n").as("rn"),
            col("i"), col("salt").as("j"))
        val hotPairs = lhs.hint("shuffle_hash").join(rhs, Seq("gram", "i", "j"))
          .filter(col("i") =!= col("j") || col("ld") < col("rd"))
          .select("ld", "rd", "ln", "rn")
        finish(coldPairs.unionByName(hotPairs))
      }
    }

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "a_unsalted" -> (() => unsalted),
      "b_salted_all" -> (() => saltedAll(1 << 12, 16)),
      "c_split_mat" -> (() => split(materialize = true, 1 << 12, 16)),
      "d_split_nomat" -> (() => split(materialize = false, 1 << 12, 16)),
      "e_cold_only" -> (() => coldOnly),
      "f_gated" -> (() => gated(1 << 12, 16)),
      "g_gated_pin" -> (() => gatedPin(1 << 12, 16)))

    // interleave rounds so host drift hits all shapes equally
    shapes.foreach { case (_, f) => f().count(); f().count() } // warm
    val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      shapes.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().count()
        times(name) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    shapes.foreach { case (name, f) =>
      val med = times(name).sorted.apply(times(name).length / 2)
      println(f"[jshapes] $name%-14s median=$med%.3f s  all=${times(name).reverse.map(t => f"$t%.3f").mkString(",")}  rows=${f().count()}")
    }
    spark.stop()
  }
}
