package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestHarness, Tables}
import graft.plans.ZOrderValue

class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestHarness.spark
  import spark.implicits._

  /** Naive bit-by-bit interleave, the executable definition the magic-number
    * version is checked against.
    */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave16 matches the bit-by-bit definition") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (65536L, 65537L)) ++
      Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs))
    cases.foreach { case (x, y) =>
      assert(ZOrderValue.interleave16(x, y) == naive(x & 0xffffL, y & 0xffffL),
        s"mismatch at ($x, $y)")
    }
  }

  test("graft_zorder SQL function: values, ordering locality, nulls") {
    val df = spark.sql(
      "SELECT graft_zorder(3, 5) AS a, graft_zorder(CAST(NULL AS INT), 5) AS b, " +
      "graft_zorder(65539, 2) AS c")
    val r = df.collect()(0)
    assert(r.getLong(0) == naive(3, 5))
    assert(r.isNullAt(1))
    // low-16-bit truncation: 65539 = 65536 + 3
    assert(r.getLong(2) == naive(3, 2))
    // interpreted eval agrees with codegen (project over a non-literal input
    // exercises doGenCode; the literal-only case above was constant-folded)
    val pairs = Seq((511L, 66L), (1907L, 4L), (12345L, 54321L)).toDF("x", "y")
    val viaDf = pairs.select(ZOrderValue.zorder(col("x"), col("y"))).as[Long].collect()
    assert(viaDf.toSeq == Seq(naive(511, 66), naive(1907, 4), naive(12345, 54321)))
  }

  test("Z-order layout prunes a 2-D box better than a single-key sort") {
    Tables.ensure(spark, "/root/testdata/sf0.01")
    // Keys min-max scaled to fill the 16 interleaved bits (partkey spans
    // ~2^11, suppkey ~2^7 here; unscaled, the curve's high bits would come
    // from partkey alone and the suppkey dimension would barely cluster —
    // the normalization every real layout pass does before interleaving).
    val li = spark.table("lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        ZOrderValue.zorder(col("l_partkey") * 32, col("l_suppkey") * 512).as("zv"))

    // 64 equal-count segments under each layout = the files a
    // repartitionByRange(sortKey).write would produce; per-segment min/max
    // on both keys = exactly the parquet footer stats pruning reads.
    def segStats(sortKeys: Seq[org.apache.spark.sql.Column]) =
      Windows.globalNtile(li, 64, sortKeys, "seg")
        .groupBy("seg")
        .agg(min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
        .collect()

    // A selective 2-D box: the middle 1/8 of each key range.
    val (pkLo, pkHi) = (875L, 1125L)   // partkey in [0, 2000]
    val (skLo, skHi) = (44L, 56L)      // suppkey in [0, 100]
    def overlapping(stats: Array[org.apache.spark.sql.Row]): Int =
      stats.count { r =>
        r.getLong(1) <= pkHi && r.getLong(2) >= pkLo &&
          r.getLong(3) <= skHi && r.getLong(4) >= skLo
      }

    val zOverlap = overlapping(segStats(
      Seq(col("zv"), col("l_orderkey"), col("l_linenumber"))))
    val linearOverlap = overlapping(segStats(
      Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))))

    // Single-key sort: partkey bounds are tight but every segment spans the
    // full suppkey range, so pruning only uses one dimension. Z-order bounds
    // both; the box touches a fraction of the curve.
    assert(zOverlap < linearOverlap,
      s"z-order should prune better: z=$zOverlap linear=$linearOverlap")
    assert(zOverlap <= 16, s"z-order overlap unexpectedly broad: $zOverlap")
  }

  test("globalNtile tile sizes stay uniform on 60k rows (AQE double-eval regression)") {
    Tables.ensure(spark, "/root/testdata/sf0.01")
    val zdf = spark.table("lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ZOrderValue.zorder(col("l_partkey") % 65536, col("l_suppkey") % 65536).as("zv"))
    val sizes = Windows.globalNtile(zdf, 64,
        Seq(col("zv"), col("l_orderkey"), col("l_linenumber")), "z_seg")
      .groupBy("z_seg").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum
    val base = total / 64
    assert(sizes.size == 64)
    val bad = sizes.filter { case (_, n) => n != base && n != base + 1 }
    assert(bad.isEmpty, s"non-uniform tiles (base=$base): ${bad.toSeq.sortBy(_._1)}")
  }
}
