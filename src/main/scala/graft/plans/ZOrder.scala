package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve value of two integral keys as a native codegen'd
  * Catalyst expression: bit i of `x` lands on output bit 2i, bit i of `y` on
  * bit 2i+1, so sorting by the result clusters rows that are close in BOTH
  * dimensions — the multi-dimensional data-layout trick behind lakehouse
  * Z-order clustering (Delta/Iceberg `OPTIMIZE ZORDER BY`): per-file min/max
  * ranges stay tight on every participating column, so a 2-D selective scan
  * prunes files that a single-column sort can only prune on its leading key.
  *
  * Inputs are truncated to their low 16 bits (the interleave uses the key's
  * LOW bits here because the TPC-H fixture keys are dense integers; a
  * production layout pass would map each column to its quantile rank first).
  * The 32-bit result never sets the sign bit, so downstream arithmetic —
  * including the DuckDB oracle's — stays in non-negative BIGINT range.
  *
  * Bit spreading uses the binary-magic-numbers interleave (public domain,
  * Stanford "Bit Twiddling Hacks", Sean Eron Anderson), which is also
  * directly expressible in portable SQL for the oracle.
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == IntegerType || e.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave16(asLong(left, a), asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZOrderValue.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave16((long) $x, (long) $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderValue =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {
  /** DataFrame-API entry: `zorder(x, y)` as a Column (requires the
    * GraftExtensions function registry, like the vector expressions).
    */
  def zorder(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_zorder", x, y)

  /** Spread the low 16 bits of `v` onto the even bit positions of a 32-bit
    * value: 0b...b2 b1 b0 -> 0b...0 b2 0 b1 0 b0.
    */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton interleave of the low 16 bits of each key (x -> even bits,
    * y -> odd bits); result is in [0, 2^32).
    */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
