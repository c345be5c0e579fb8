package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites share the forked
  * test JVM; building SparkSession per suite would dominate test time).
  */
object SparkTestHarness {
  lazy val spark: SparkSession = GraftSession.builder("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // unique warehouse per JVM: managed-table locations must not leak between
    // test runs (the in-memory catalog resets but the filesystem would not)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
