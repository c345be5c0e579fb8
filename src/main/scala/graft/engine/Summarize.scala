package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** DuckDB's `SUMMARIZE <table>` profiling statement: one row per column
  * with min/max/approx_unique/avg/std/quartiles/count/null_percentage —
  * the exact column set DuckDB emits, so reference users read the same
  * report shape.
  *
  * Scale: ONE wide aggregation job computes every statistic for every
  * column in a single pass over the data (Spark's partial aggregation
  * handles the fan-in); only the final transpose to row-per-column runs on
  * the driver, over #columns values — metadata-sized, like DuckDB's own
  * pivot of its internal stats query.
  */
object Summarize {

  def summarize(spark: SparkSession, table: String): DataFrame =
    summarizeDf(spark, spark.table(table))

  /** SUMMARIZE over an arbitrary query's result (DuckDB's
    * `SUMMARIZE SELECT ...` form).
    */
  def summarizeDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val fields = df.schema.fields

    def isNumeric(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _ => false
    }
    // min/max make sense for orderable atomic types; arrays/maps/structs get
    // nulls there, like DuckDB prints NULL for unsupported stats.
    def isOrderable(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | DateType | TimestampType |
          TimestampNTZType | BooleanType => true
      case _ => false
    }

    val aggs = fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      val base = Seq(
        (if (isOrderable(f.dataType)) min(c).cast("string")
         else lit(null).cast("string")).as(s"${f.name}__min"),
        (if (isOrderable(f.dataType)) max(c).cast("string")
         else lit(null).cast("string")).as(s"${f.name}__max"),
        approx_count_distinct(c).as(s"${f.name}__uniq"),
        count(c).as(s"${f.name}__cnt"))
      val numeric =
        if (isNumeric(f.dataType)) Seq(
          avg(c).cast("string").as(s"${f.name}__avg"),
          stddev_samp(c).cast("string").as(s"${f.name}__std"),
          percentile_approx(c, lit(0.25), lit(10000)).cast("string").as(s"${f.name}__q25"),
          percentile_approx(c, lit(0.5), lit(10000)).cast("string").as(s"${f.name}__q50"),
          percentile_approx(c, lit(0.75), lit(10000)).cast("string").as(s"${f.name}__q75"))
        else Seq.empty
      base ++ numeric
    } :+ count(lit(1)).as("__total")

    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = r.getAs[Long]("__total")

    val outSchema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("column_type", StringType, nullable = false),
      StructField("min", StringType, nullable = true),
      StructField("max", StringType, nullable = true),
      StructField("approx_unique", LongType, nullable = false),
      StructField("avg", StringType, nullable = true),
      StructField("std", StringType, nullable = true),
      StructField("q25", StringType, nullable = true),
      StructField("q50", StringType, nullable = true),
      StructField("q75", StringType, nullable = true),
      StructField("count", LongType, nullable = false),
      StructField("null_percentage", DoubleType, nullable = false)))

    def s(name: String): String =
      if (r.schema.fieldNames.contains(name)) Option(r.getAs[String](name)).orNull
      else null

    val rows = fields.map { f =>
      val cnt = r.getAs[Long](s"${f.name}__cnt")
      val nullPct =
        if (total == 0) 0.0
        else math.rint((total - cnt).toDouble / total * 10000) / 100
      Row(f.name, f.dataType.sql, s(s"${f.name}__min"), s(s"${f.name}__max"),
        r.getAs[Long](s"${f.name}__uniq"),
        s(s"${f.name}__avg"), s(s"${f.name}__std"),
        s(s"${f.name}__q25"), s(s"${f.name}__q50"), s(s"${f.name}__q75"),
        total, nullPct)
    }.toList
    spark.createDataFrame(rows.asJava, outSchema)
  }
}
