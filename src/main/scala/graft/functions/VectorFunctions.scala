package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `ArrayType(Float|Double)` embedding
  * columns, built from codegen-friendly higher-order functions
  * (`zip_with`/`aggregate`) — no UDFs, so they stay inside WholeStageCodegen
  * and distribute trivially (pure per-row expressions; the only shuffles in a
  * similarity-search plan come from the join/top-k around them).
  *
  * Reference has no vector ops (absence, SURVEY.md §2.B) — this is the
  * additive training-data-pipeline scope.
  */
object VectorFunctions {

  /** Dot product via the native codegen expression (graft.plans.DotProduct,
    * registered by GraftExtensions). Left-to-right accumulation matches
    * DuckDB's list functions so cross-engine doubles agree bit-for-bit.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — single fused codegen loop
    * (graft.plans.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Composable (built-ins only) formulations, kept as the reference
    * implementation the codegen expressions are tested against. Higher-order
    * functions are CodegenFallback, so these are the slow path.
    */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosineComposable(a: Column, b: Column): Column =
    dotComposable(a, b) / (sqrt(dotComposable(a, a)) * sqrt(dotComposable(b, b)))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

  /** Hyperplane-LSH band buckets (graft.plans.HyperplaneBuckets): all sign
    * bits of the fixed plane set in one fused codegen pass, packed per band.
    * The parameterized overload widens the band shape for larger corpora
    * (bucket space must track ~log2(corpus) or random collisions go
    * quadratic).
    */
  def lshBuckets(a: Column): Column = call_function("graft_lsh_buckets", a)

  def lshBuckets(a: Column, bitsPerBand: Int, bands: Int): Column =
    call_function("graft_lsh_buckets", a, lit(bitsPerBand), lit(bands))

  /** Symmetric absmax int8 scalar quantization (graft.plans.Sq8Quantize):
    * codes in [-127, 127], zero vector -> all zeros. Integer outputs stay
    * exactly reproducible across engines.
    */
  def sq8(a: Column): Column = call_function("graft_sq8", a)

  /** Cast a float embedding to double once, up front (exact widening). */
  def asDouble(a: Column): Column = a.cast("array<double>")
}
