package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Whole-database EXPORT / IMPORT, re-expressing DuckDB's
  * `EXPORT DATABASE 'dir' (FORMAT ...)` / `IMPORT DATABASE 'dir'` surface
  * that the reference passes through to its backend (the reference's SQL
  * layer delegates verbatim; DuckDB writes `schema.sql` + `load.sql` + one
  * data file per table, and IMPORT replays the scripts).
  *
  * Spark-first shape: each table is written by a DISTRIBUTED `df.write`
  * (parquet or csv part-files per partition — no driver materialization, so
  * a 100 TB table exports at cluster width), `schema.sql` records the DDL,
  * and `load.sql` is an executable script of `CREATE TEMPORARY VIEW ...
  * USING` statements. IMPORT simply replays `load.sql` through the session,
  * so the round trip re-registers every table without copying data.
  */
object DatabaseExport {

  /** CSV cannot carry nested types; serialize them as JSON strings (the
    * same lossy-but-explicit choice DuckDB's CSV export makes for lists).
    */
  private def csvSafe(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)

  /** Export every table visible in the session's current namespace (managed
    * tables and temp views alike — this engine's catalog is view-backed by
    * design). Returns the table count.
    */
  def exportDatabase(spark: SparkSession, dir: String, format: String): Int = {
    val fmt = format.toLowerCase
    require(fmt == "parquet" || fmt == "csv", s"unsupported export format '$format'")
    Files.createDirectories(Paths.get(dir))
    val tables = spark.catalog.listTables().collect().map(_.name).distinct.sorted
    if (tables.isEmpty) throw new IllegalArgumentException("no tables to export")
    val schemaSql = new StringBuilder
    val loadSql = new StringBuilder
    tables.foreach { t =>
      val df = spark.table(t)
      val path = s"$dir/$t"
      fmt match {
        case "parquet" => df.write.mode("overwrite").parquet(path)
        case "csv" => csvSafe(df).write.mode("overwrite")
          .option("header", "true").csv(path)
      }
      schemaSql.append(s"CREATE TABLE $t (${df.schema.toDDL});\n")
      // CSV views carry the recorded schema explicitly (nested columns were
      // JSON-stringified by csvSafe, so the view schema is the written one).
      // inferSchema would degrade types on re-import — '001' becomes INT,
      // decimals widen to double — where DuckDB's IMPORT DATABASE replays
      // schema.sql first and keeps exact types.
      val (viewSchema, options) =
        if (fmt == "parquet") ("", s"path '$path'")
        else (s" (${csvSafe(df).schema.toDDL})", s"path '$path', header 'true'")
      loadSql.append(s"CREATE OR REPLACE TEMPORARY VIEW $t$viewSchema USING $fmt OPTIONS ($options);\n")
    }
    Files.write(Paths.get(s"$dir/schema.sql"),
      schemaSql.toString.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$dir/load.sql"),
      loadSql.toString.getBytes(StandardCharsets.UTF_8))
    tables.length
  }

  /** Replay an exported database's `load.sql` into this session. Returns the
    * number of statements executed.
    */
  def importDatabase(spark: SparkSession, dir: String): Int = {
    val load = Paths.get(s"$dir/load.sql")
    if (!Files.isReadable(load))
      throw new IllegalArgumentException(s"'$dir' is not an exported database (no load.sql)")
    val script = new String(Files.readAllBytes(load), StandardCharsets.UTF_8)
    val stmts = InitSql.split(script)
    stmts.foreach(spark.sql(_))
    stmts.length
  }
}
