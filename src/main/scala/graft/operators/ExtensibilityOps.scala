package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.SystemCatalog

/** UDF / UDAF surface (SURVEY.md §2.B "UDF / UDAF / UDTF") plus the catalog
  * metadata endpoints exposed as oracle-checkable queries, plus the
  * regex scalar functions and the sliding-window batch check.
  */
object ExtensibilityOps {

  /** Geometric mean as a typed `Aggregator` (the idiomatic Spark UDAF path):
    * buffer = (sum of logs, count); merge is associative so Spark runs it
    * partial+final like any built-in aggregate.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  val ops: Seq[Op] = Seq(
    // Metadata endpoint as a query — DoGetTableTypes (SURVEY §2.A row 18).
    Op("meta_table_types",
      "SELECT * FROM (VALUES ('BASE TABLE'),('LOCAL TEMPORARY'),('VIEW')) t(table_type) ORDER BY table_type") { (s, _) =>
      SystemCatalog.tableTypes(s).orderBy("table_type")
    },

    // Session-scoped scalar UDF registered and invoked through SQL.
    Op("udf_scalar",
      "SELECT o_orderkey, CAST(o_orderkey*2+1 AS BIGINT) AS doubled FROM orders ORDER BY o_orderkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.udf.register("graft_double_it", (x: Long) => x * 2 + 1)
      s.sql("SELECT o_orderkey, graft_double_it(o_orderkey) AS doubled FROM orders ORDER BY o_orderkey LIMIT 100")
    },

    Op("udaf_geomean",
      "SELECT l_returnflag, ROUND(EXP(AVG(LN(l_extendedprice))),2) AS geomean FROM lineitem " +
      "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, d) =>
      Tables.ensure(s, d)
      s.udf.register("graft_geomean", udaf(GeoMean))
      s.sql("SELECT l_returnflag, ROUND(graft_geomean(l_extendedprice),2) AS geomean FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")
    },

    Op("fn_regex",
      "SELECT p_partkey, REGEXP_EXTRACT(p_name,'([a-z]+)',1) AS first_word, " +
      "REGEXP_REPLACE(p_name,'[aeiou]','*','g') AS starred, REGEXP_MATCHES(p_name,'ring|bolt') AS has_rb " +
      "FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
        col("p_name").rlike("ring|bolt").as("has_rb")
      ).orderBy("p_partkey").limit(100)
    },

    // Sliding-window aggregate, batch face of EventStreams.slidingAgg
    // (1h window / 30min slide -> each event lands in exactly two windows).
    Op("events_sliding",
      "WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events), " +
      "w AS (SELECT UNNEST([CAST(FLOOR(us/1800000000)*1800000000 AS BIGINT), " +
      "CAST(FLOOR(us/1800000000)*1800000000 - 1800000000 AS BIGINT)]) AS ws, event_type FROM e) " +
      "SELECT make_timestamp(ws) AS wstart, event_type, COUNT(*) AS c FROM w GROUP BY 1,2 ORDER BY 1,2") { (s, d) =>
      Tables.ensure(s, d)
      s.table("events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .select(col("w.start").as("wstart"), col("event_type"), col("c"))
        .orderBy("wstart", "event_type")
    }
  )
}
