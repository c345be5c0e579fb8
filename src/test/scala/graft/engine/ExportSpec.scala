package graft.engine

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** EXPORT DATABASE / IMPORT DATABASE round trip (DuckDB-shaped surface the
  * reference delegates to its backend).
  */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private lazy val global = new GlobalSettings
  private lazy val sessions = new SessionManager(spark, global)

  private lazy val admin = sessions.getOrCreate("expspec-admin", "alice", "admin")
  private lazy val user = sessions.getOrCreate("expspec-user", "bob", "user")

  private def run(s: SessionState, sql: String) =
    Statement.create(sessions, s, global, sql).collect()

  test("EXPORT DATABASE writes data + scripts and IMPORT replays them") {
    val src = admin.spark
    src.range(5).selectExpr("id", "id * 2 AS doubled")
      .createOrReplaceTempView("expspec_t1")
    src.sql("SELECT 'a' AS k, array(1,2) AS xs")
      .createOrReplaceTempView("expspec_t2")
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString

    val out = run(admin, s"EXPORT DATABASE '$dir'")
    assert(out.head.getString(0).contains("exported"))
    assert(new java.io.File(s"$dir/schema.sql").isFile)
    assert(new java.io.File(s"$dir/load.sql").isFile)
    assert(new java.io.File(s"$dir/expspec_t1").isDirectory)

    // Import into a fresh session: views come back with identical contents.
    val fresh = sessions.getOrCreate("expspec-fresh", "alice", "admin")
    run(fresh, s"IMPORT DATABASE '$dir'")
    val rows = fresh.spark.sql("SELECT SUM(doubled) AS s FROM expspec_t1").collect()
    assert(rows.head.getLong(0) == 20L)
    assert(fresh.spark.sql("SELECT * FROM expspec_t2").count() == 1L)
  }

  test("CSV format flattens nested columns to JSON strings") {
    val src = admin.spark
    src.sql("SELECT 1 AS id, array(1,2,3) AS xs").createOrReplaceTempView("expspec_csv")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-csv").toString
    run(admin, s"EXPORT DATABASE '$dir' (FORMAT CSV)")
    val fresh = sessions.getOrCreate("expspec-csvr", "alice", "admin")
    run(fresh, s"IMPORT DATABASE '$dir'")
    val row = fresh.spark.sql("SELECT xs FROM expspec_csv WHERE id = 1").collect().head
    assert(row.getString(0) == "[1,2,3]")
  }

  test("CSV round trip preserves exact types (no inference drift)") {
    val src = admin.spark
    // '001' must stay VARCHAR (inference would read it back as INT), the
    // decimal must keep its precision/scale, and the timestamp its type.
    src.sql("SELECT '001' AS code, CAST(1.50 AS DECIMAL(10,2)) AS amt, " +
        "TIMESTAMP '2024-03-01 12:34:56' AS ts")
      .createOrReplaceTempView("expspec_types")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-types").toString
    run(admin, s"EXPORT DATABASE '$dir' (FORMAT CSV)")
    val fresh = sessions.getOrCreate("expspec-typesr", "alice", "admin")
    run(fresh, s"IMPORT DATABASE '$dir'")
    val re = fresh.spark.table("expspec_types")
    assert(re.schema("code").dataType === org.apache.spark.sql.types.StringType)
    assert(re.schema("amt").dataType === org.apache.spark.sql.types.DecimalType(10, 2))
    assert(re.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val row = re.collect().head
    assert(row.getString(0) === "001")
    assert(row.getDecimal(1).toPlainString === "1.50")
  }

  test("EXPORT/IMPORT are admin-only; bad import path is a client error") {
    intercept[SecurityException](run(user, "EXPORT DATABASE '/tmp/x'"))
    intercept[SecurityException](run(user, "IMPORT DATABASE '/tmp/x'"))
    intercept[IllegalArgumentException](
      run(admin, "IMPORT DATABASE '/definitely/not/exported'"))
  }
}
