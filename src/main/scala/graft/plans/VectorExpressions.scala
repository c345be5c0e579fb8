package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Single-pass cosine similarity over two `array<double>` columns as a native
  * codegen'd Catalyst expression.
  *
  * Why custom (SURVEY.md §7.2 "custom only where built-ins can't express"):
  * the composable formulation — `aggregate(zip_with(a,b,*),…) /
  * (sqrt(...)*sqrt(...))` — is three interpreted higher-order passes plus an
  * allocated intermediate array per row; higher-order functions are
  * CodegenFallback, so on a 100 TB embedding corpus the scan drops out of
  * WholeStageCodegen exactly in its hottest expression. This fuses dot
  * product and both norms into one generated loop, no allocation.
  *
  * Accumulation is left-to-right, matching both the composable version and
  * DuckDB's `list_cosine_similarity` loop, so oracle results are unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  // Null ELEMENT within the read prefix => null result, same policy as
  // graft_sq8/graft_lsh_buckets: getDouble over a null slot reads garbage
  // and would silently mis-score. Nullable only when an input can actually
  // carry a null element, so the common containsNull=false scan keeps the
  // original fused non-null code.
  override def nullable: Boolean =
    left.nullable || right.nullable || VectorExpressions.elemsNullable(left, right)
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (VectorExpressions.elemsNullable(left, right)) {
      var k = 0
      while (k < n) { if (x.isNullAt(k) || y.isNullAt(k)) return null; k += 1 }
    }
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val compute =
        s"""
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $x.getDouble($i);
           |  double $yi = $y.getDouble($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${VectorExpressions.nullScanGen(VectorExpressions.elemsNullable(left, right),
              ctx, ev, s"$x.isNullAt($i) || $y.isNullAt($i)", n, i, compute)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product (same rationale). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  // Same null-element => null policy as graft_cosine (see there).
  override def nullable: Boolean =
    left.nullable || right.nullable || VectorExpressions.elemsNullable(left, right)
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (VectorExpressions.elemsNullable(left, right)) {
      var k = 0
      while (k < n) { if (x.isNullAt(k) || y.isNullAt(k)) return null; k += 1 }
    }
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val compute =
        s"""
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${VectorExpressions.nullScanGen(VectorExpressions.elemsNullable(left, right),
              ctx, ev, s"$x.isNullAt($i) || $y.isNullAt($i)", n, i, compute)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric absmax int8 scalar quantization of an `array<double>` embedding:
  * code_i = round_half_away_from_zero(x_i / max|x| * 127), codes in
  * [-127, 127]; a zero vector quantizes to all zeros. One fused codegen loop
  * (two passes over the row's array, no allocation beyond the code array) —
  * the memory-compression step of a large-scale ANN index (4x smaller than
  * float32, 8x than double). Integer outputs are exactly reproducible in any
  * engine, which keeps the operator oracle-checkable (unlike float
  * aggregates, whose summation order varies).
  *
  * Rounding is half-away-from-zero explicitly (DuckDB ROUND semantics);
  * `Math.round` is half-toward-positive-infinity and would differ on
  * negative midpoints.
  */
case class Sq8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // A null ELEMENT nulls the whole result (the output array is
  // containsNull=false, so a per-element null cannot be represented; DuckDB's
  // list_transform would propagate it). Nullable — and null-scanned — only
  // when the input can actually carry one, so the common
  // containsNull=false scan keeps the original two-pass code.
  override def nullable: Boolean =
    child.nullable || VectorExpressions.elemsNullable(child)
  override def prettyName: String = "graft_sq8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    if (VectorExpressions.elemsNullable(child)) {
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    }
    var am = 0.0
    i = 0
    while (i < n) { val v = math.abs(x.getDouble(i)); if (v > am) am = v; i += 1 }
    val out = new Array[Int](n)
    if (am > 0.0) {
      i = 0
      while (i < n) {
        val s = x.getDouble(i) / am * 127.0
        out(i) = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val am = ctx.freshName("am")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val compute =
        s"""
           |double $am = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = java.lang.Math.abs($x.getDouble($i));
           |  if ($v > $am) $am = $v;
           |}
           |int[] $out = new int[$n];
           |if ($am > 0.0) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $s = $x.getDouble($i) / $am * 127.0;
           |    $out[$i] = (int) ($s >= 0 ? java.lang.Math.floor($s + 0.5)
           |                              : java.lang.Math.ceil($s - 0.5));
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      s"""
         |int $n = $x.numElements();
         |${VectorExpressions.nullScanGen(VectorExpressions.elemsNullable(child),
              ctx, ev, s"$x.isNullAt($i)", n, i, compute)}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Quantize =
    copy(child = newChild)
}

/** Deterministic random-hyperplane LSH parameters, shared bit-for-bit with
  * the DuckDB oracle: plane component r[j][i] = md5-derived 60-bit hash of
  * "hp_j_i" mapped to [-1, 1). Both engines compute the same planes, the
  * same sequential dot products, and therefore the same sign bits.
  */
object HyperplaneLsh {
  val dim = 64
  // Oracle-pinned defaults. The bucket space (2^bitsPerBand per band) must
  // grow ~log2 with corpus size or random collisions make the candidate set
  // quadratic — callers at larger scales widen the bands (the fused
  // expression makes extra bits nearly free) and raise the threshold to the
  // high-similarity regime wide bands are selective for.
  val bitsPerBand = 8
  val bands = 16
  val numBits: Int = bitsPerBand * bands

  def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Plane matrices keyed by bit count — one md5-derived plane family, a
    * prefix of which is every narrower configuration.
    */
  private val matrices = scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Double]]]
  def matrixFor(bits: Int): Array[Array[Double]] =
    matrices.getOrElseUpdate(bits, Array.tabulate(bits, dim)((j, i) =>
      h60(s"hp_${j}_${i}").toDouble / (1L << 60).toDouble * 2 - 1))

  /** The same 60-bit md5 hash in DuckDB SQL over a string column `s`. */
  def hex60Sql: String =
    (1 to 15).map { k =>
      s"(strpos('0123456789abcdef', substr(md5(s), $k, 1)) - 1) * ${1L << (4 * (15 - k))}"
    }.mkString("(", " + ", ")")

  /** Corpus-derived band shape. The bucket space must track corpus size:
    * random collisions contribute ~n^2/2^bits candidate pairs per band, so
    * bits >= ~log2(n) keeps the candidate set linear (measured on the 10x
    * scale fixture: 8-bit bands 26 s, 16-bit 1.1 s). Bands scale with bits
    * to hold recall in the high-similarity regime this operator serves
    * (cos 0.9: ~97% at 13x26, ~92% at 17x34; recall falls toward ~70% at
    * the 24-bit cost cap — extreme corpora trade recall or add bands
    * explicitly). Below the pinned fixture default the shape stays 8x16.
    */
  def autoShape(n: Long): (Int, Int) = {
    val log2ceil = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n - 1, 1))
    val bits = math.max(bitsPerBand, math.min(24, log2ceil + 2))
    val autoBands = if (bits <= bitsPerBand) bands else math.min(64, 2 * bits)
    (bits, autoBands)
  }
}

/** All `HyperplaneLsh.numBits` sign-bit dot products of one embedding against
  * the fixed plane matrix, packed into the band buckets, in ONE fused codegen
  * loop: `array<long>` of `bands` entries. The composable form — crossJoin
  * against a broadcast plane table — replicates every vector row once per
  * PLANE (x128) through a join, a projection, and a re-aggregation; this
  * expression reads each vector exactly once (measured on the 10x scale
  * fixture: 25 s -> ~2 s for the LSH dedup). Accumulation order matches the
  * per-plane `graft_dot` (ascending index), so buckets — and the oracle
  * comparison — are bit-identical.
  */
case class HyperplaneBuckets(child: Expression,
    bitsPerBand: Int = HyperplaneLsh.bitsPerBand,
    bands: Int = HyperplaneLsh.bands) extends UnaryExpression {
  import HyperplaneLsh.{dim, matrixFor}

  private def numBits: Int = bitsPerBand * bands
  require(bitsPerBand >= 1 && bitsPerBand <= 62 && bands >= 1,
    s"invalid LSH band shape ${bitsPerBand}x$bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Null ELEMENT => null result (cannot represent per-element nulls in the
  // containsNull=false bucket array, and a sign bit over garbage would
  // silently mis-bucket the vector). The scan covers only the read prefix
  // min(numElements, dim) — a null in the unread tail cannot affect any
  // bucket — and is skipped entirely for containsNull=false inputs.
  override def nullable: Boolean =
    child.nullable || VectorExpressions.elemsNullable(child)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val planes = matrixFor(numBits)
    val n = math.min(v.numElements(), dim)
    if (VectorExpressions.elemsNullable(child)) {
      var k = 0
      while (k < n) { if (v.isNullAt(k)) return null; k += 1 }
    }
    val out = new Array[Long](bands)
    var j = 0
    while (j < numBits) {
      val row = planes(j)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * row(i); i += 1 }
      if (dot >= 0) out(j / bitsPerBand) |= 1L << (j % bitsPerBand)
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("planes", matrixFor(numBits), "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val compute =
        s"""
           |long[] $out = new long[$bands];
           |for (int $j = 0; $j < $numBits; $j++) {
           |  double[] $row = $planes[$j];
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $dot += $v.getDouble($i) * $row[$i]; }
           |  if ($dot >= 0) $out[$j / $bitsPerBand] |= 1L << ($j % $bitsPerBand);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |${VectorExpressions.nullScanGen(VectorExpressions.elemsNullable(child),
              ctx, ev, s"$v.isNullAt($i)", n, i, compute)}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object VectorExpressions {
  /** Both inputs must be array<double> (AbstractDataType is private[sql], so
    * the check is spelled out instead of ExpectsInputTypes).
    */
  def checkDoubleArrays(name: String, left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<double>, array<double>), got ($l, $r)")
    }

  /** Whether any input's ELEMENTS can be null. Unresolved/unexpected types
    * answer true (scan defensively until analysis pins the type down).
    */
  def elemsNullable(inputs: Expression*): Boolean = inputs.exists { e =>
    !e.resolved || (e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
  }

  /** Shared codegen shape for the null-element => null-result policy: when
    * the input can carry a null element, scan the read prefix [0, n) for one
    * and null the result; otherwise emit `compute` bare so the
    * containsNull=false hot path keeps the original fused loop with no
    * per-row scan.
    */
  def nullScanGen(elemsNullable: Boolean, ctx: CodegenContext, ev: ExprCode,
      nullCond: String, n: String, i: String, compute: String): String = {
    if (!elemsNullable) compute
    else {
      val hasNull = ctx.freshName("hasNull")
      s"""
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullCond) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |$compute
         |}
       """.stripMargin
    }
  }
}
