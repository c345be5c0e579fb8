package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, registered via `spark.sql.extensions` — the public
  * Spark extension point (SURVEY.md §2 custom-operator preference (b)):
  * native codegen expressions for the vector-similarity hot path, callable
  * from SQL and the DataFrame API as `graft_cosine(a, b)` / `graft_dot(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(PseudoFunctionFold)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - single-pass cosine similarity of two double arrays"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8"),
      info("graft_sq8", "graft_sq8(a) - symmetric absmax int8 scalar quantization of a double array"),
      (children: Seq[Expression]) => Sq8Quantize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      info("graft_lsh_buckets",
        "graft_lsh_buckets(a[, bitsPerBand, bands]) - hyperplane-LSH band buckets of a double array"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => HyperplaneBuckets(v)
        case Seq(v, b, n) => HyperplaneBuckets(v,
          b.eval().asInstanceOf[Number].intValue(), n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("graft_lsh_buckets takes 1 or 3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      info("graft_zorder",
        "graft_zorder(x, y) - Morton/Z-order interleave of the low 16 bits of two integral keys"),
      (children: Seq[Expression]) => ZOrderValue(children(0), children(1))))
    // DuckDB-dialect aliases (string_split, list_*, regexp_matches) so
    // reference-dialect SQL runs verbatim — see DuckDbCompat.
    DuckDbCompat.functions.foreach(ext.injectFunction)
  }
}
