package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the ASOF temporal-join kernel (r16, VERDICT r15 #6):
  * the union + single-window carry-forward formulation
  * (`operators/TemporalJoins.scala`) claims NO range explosion — cost is
  * one shuffle on the key plus one per-partition sort, linear in rows,
  * unlike a range self-join whose pair count grows with per-key density.
  *
  * Two axes, mirroring KnnScaleProbe:
  *   - constant density (more USERS, same events/user): per-partition
  *     window work is constant, wall should track n — the linear contract;
  *   - fixed keys, 30x density (same users, 30x events/user): a range-join
  *     formulation would blow up ~quadratically per key here; the window
  *     kernel must stay ~linear because carry-forward is one pass over the
  *     sorted partition regardless of density.
  *
  * Output rows must equal |left| exactly (as-of joins preserve the left
  * side 1:1) at every scale — the correctness check rides along.
  * Measured numbers recorded in ARCHITECTURE.md.
  */
object AsofScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toInt else 300000
    val spark = graft.GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** n events over `users` keys, ~uniform hashed timestamps; `salt`
      * decorrelates the two sides.
      */
    def side(n: Long, users: Long, salt: Int) = spark.range(n).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id") + salt), lit(users)).as("user_id"),
      timestamp_millis(
        (pmod(xxhash64(col("id") + salt + 13), lit(86400000L)) + 1600000000000L))
        .as("ts"),
      (pmod(xxhash64(col("id") + salt + 29), lit(1000)).cast("double") / 10.0).as("value"))
      .localCheckpoint(true)

    def run(tag: String, n: Long, users: Long): Unit = {
      val l = side(n, users, 7)
      val r = side(n, users, 91)
      val t0 = System.nanoTime()
      val out = graft.operators.TemporalJoins.asofBackward(
        l, r, "user_id", "ts", Seq("value")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[asofscale] $tag%-26s n=$n%9d users=$users%8d wall=$wall%7.3f s " +
        f"out=$out%9d ${if (out == n) "OK" else s"MISMATCH expect=$n"}")
      l.unpersist(); r.unpersist()
    }

    // warmup: codegen + JIT for the union/window shape, not measured
    run("0x  warmup", base / 10L, base / 300L)
    // constant density: users scale with n (events/user flat)
    run("1x  const-density", base.toLong, base / 30L)
    run("10x const-density", base * 10L, base * 10L / 30L)
    run("30x const-density", base * 30L, base.toLong)
    // fixed keys, 30x density: the range-explosion axis — 30x events on the
    // SAME user population; a range join would pair-explode, this must not
    run("30x fixed-keys", base * 30L, base / 30L)
    spark.stop()
  }
}
