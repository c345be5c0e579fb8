package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** DuckDB's column-level ALTER TABLE on plain Parquet tables, by
  * copy-on-write — Spark's v1 parquet catalog only supports ADD COLUMNS
  * natively, so DROP / RENAME / retype (and ADD with a DEFAULT backfill)
  * rewrite the table: stage the transformed rows, create under a temp
  * name, then drop + rename — a failed rewrite leaves the original table
  * intact (the same safe-swap rule as CREATE OR REPLACE TABLE).
  *
  * Scale note: the rewrite is one distributed read → transform → write of
  * the table (projection-only, codegen'd, no shuffle); on a cluster it
  * runs at full width, which is exactly what a schema migration costs on
  * any copy-on-write format.
  */
object AlterTable {

  private val Col = """(?:`([^`]+)`|([A-Za-z_][\w]*))"""
  private val DropColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+DROP\\s+(?:COLUMN\\s+)?(IF\\s+EXISTS\\s+)?$Col\\s*;?\\s*$$""".r
  private val RenameColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+RENAME\\s+(?:COLUMN\\s+)?$Col\\s+TO\\s+$Col\\s*;?\\s*$$""".r
  private val AlterTypeRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+ALTER\\s+(?:COLUMN\\s+)?$Col\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+([A-Za-z0-9_()\\s,]+?)\\s*;?\\s*$$""".r
  private val AddColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+ADD\\s+COLUMN\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$Col\\s+([A-Za-z0-9_()\\s,]+?)(?:\\s+DEFAULT\\s+(.+?))?\\s*;?\\s*$$""".r

  def handles(sql: String): Boolean = sql match {
    case DropColRe(_*) | RenameColRe(_*) | AlterTypeRe(_*) | AddColRe(_*) => true
    case _ => false
  }

  private def pick(quoted: String, bare: String): String =
    Option(quoted).getOrElse(bare)

  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
    case DropColRe(table, ifExists, q, b) =>
      val c = pick(q, b)
      transform(spark, table, s"dropped column $c") { df =>
        if (!df.columns.exists(_.equalsIgnoreCase(c))) {
          if (ifExists != null) None
          else throw new IllegalArgumentException(s"column $c does not exist in $table")
        } else {
          if (df.columns.length == 1) throw new IllegalArgumentException(
            s"cannot drop the only column of $table")
          Some(df.drop(c))
        }
      }
    case RenameColRe(table, q1, b1, q2, b2) =>
      val (from, to) = (pick(q1, b1), pick(q2, b2))
      transform(spark, table, s"renamed $from to $to") { df =>
        if (!df.columns.exists(_.equalsIgnoreCase(from)))
          throw new IllegalArgumentException(s"column $from does not exist in $table")
        if (df.columns.exists(_.equalsIgnoreCase(to)))
          throw new IllegalArgumentException(s"column $to already exists in $table")
        Some(df.withColumnRenamed(from, to))
      }
    case AlterTypeRe(table, q, b, dtype) =>
      val c = pick(q, b)
      transform(spark, table, s"retyped $c to ${dtype.trim}") { df =>
        if (!df.columns.exists(_.equalsIgnoreCase(c)))
          throw new IllegalArgumentException(s"column $c does not exist in $table")
        Some(df.withColumn(c, col(s"`$c`").cast(dtype.trim)))
      }
    case AddColRe(table, ifNotExists, q, b, dtype, default) =>
      val c = pick(q, b)
      transform(spark, table, s"added column $c") { df =>
        if (df.columns.exists(_.equalsIgnoreCase(c))) {
          if (ifNotExists != null) None
          else throw new IllegalArgumentException(s"column $c already exists in $table")
        } else {
          val v = Option(default).map(d => expr(d)).getOrElse(lit(null))
          Some(df.withColumn(c, v.cast(dtype.trim)))
        }
      }
    case other => throw new IllegalArgumentException(s"unsupported ALTER TABLE form: $other")
  }

  /** Stage → create temp → drop old → rename: the original table survives
    * any failure before the final (cheap, catalog-only) steps.
    */
  private def transform(spark: SparkSession, table: String, what: String)(
      f: DataFrame => Option[DataFrame]): DataFrame = {
    if (!spark.catalog.tableExists(table))
      throw new IllegalArgumentException(s"table $table does not exist")
    val isView = spark.catalog.listTables()
      .filter(s"name = '${table.split('.').last}'")
      .collect().headOption.exists(_.tableType == "TEMPORARY")
    if (isView) throw new IllegalArgumentException(
      s"$table is a view; column ALTERs apply to managed tables")
    f(spark.table(table)).foreach { out =>
      val tmp = s"${table}__graft_alter_tmp"
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      out.write.saveAsTable(tmp)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
    import spark.implicits._
    Seq(what).toDF("result")
  }
}
