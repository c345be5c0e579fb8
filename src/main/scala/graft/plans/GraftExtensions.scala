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
  }
}
