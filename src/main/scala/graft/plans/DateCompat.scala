package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB's date/time dialect pieces that need more than a rename.
  *
  * `date_diff(part, a, b)` counts PART BOUNDARIES CROSSED, signed — not
  * complete intervals (probed: date_diff('month', 2020-01-31, 2020-02-01)
  * = 1; 'minute' over 10:59:59→11:00:00 = 1; b < a goes negative). The
  * expansion truncates both operands to the part and diffs in part units,
  * which is exactly "boundaries crossed" for any sign. All results are
  * BIGINT like DuckDB's.
  *
  * `time_bucket(width, ts)` floors to a fixed-width grid anchored at
  * DuckDB/Timescale's origin: 2000-01-03 00:00:00 (a Monday — probed:
  * 1-week buckets land on Mondays, 2000-01-01 falls in the 1999-12-27
  * bucket) for day/time widths, and 2000-01-01 for month-granularity
  * widths (3-month buckets of 2024-05-05 → 2024-04-01). Sign-safe flooring
  * via Pmod, so pre-2000 inputs bucket correctly too.
  */
object DateCompat {

  /** Epoch micros of 2000-01-03T00:00:00 — the day/time-width bucket origin. */
  private val OriginUs = 946857600000000L
  private val DayUs = 86400000000L

  private def lit(s: String) = Literal.create(s, StringType)

  /** The date_diff expansion for a literal part name. */
  def dateDiff(part: String, a: Expression, b: Expression): Expression = {
    def months(x: Expression): Expression = {
      val d = Cast(x, DateType)
      Add(Multiply(Subtract(Year(d), Literal(2000)), Literal(12)), Subtract(Month(d), Literal(1)))
    }
    def quarters(x: Expression): Expression = {
      val d = Cast(x, DateType)
      Add(Multiply(Subtract(Year(d), Literal(2000)), Literal(4)),
        new IntegralDivide(Subtract(Month(d), Literal(1)), Literal(3)))
    }
    def usBucketDiff(unitUs: Long): Expression = {
      def bucket(x: Expression): Expression = {
        val t = UnixMicros(Cast(x, TimestampType))
        Subtract(t, Pmod(t, Literal(unitUs)))
      }
      new IntegralDivide(Subtract(bucket(b), bucket(a)), Literal(unitUs))
    }
    val diff = part.toLowerCase match {
      case "year" | "years" | "y" =>
        Subtract(Year(Cast(b, DateType)), Year(Cast(a, DateType)))
      case "quarter" | "quarters" => Subtract(quarters(b), quarters(a))
      case "month" | "months" | "mon" => Subtract(months(b), months(a))
      case "week" | "weeks" | "w" =>
        new IntegralDivide(
          DateDiff(TruncDate(Cast(b, DateType), lit("week")),
                   TruncDate(Cast(a, DateType), lit("week"))),
          Literal(7))
      case "day" | "days" | "d" => DateDiff(Cast(b, DateType), Cast(a, DateType))
      case "hour" | "hours" | "h" => usBucketDiff(3600000000L)
      case "minute" | "minutes" | "m" => usBucketDiff(60000000L)
      case "second" | "seconds" | "s" => usBucketDiff(1000000L)
      case "millisecond" | "milliseconds" | "ms" => usBucketDiff(1000L)
      case "microsecond" | "microseconds" | "us" =>
        Subtract(UnixMicros(Cast(b, TimestampType)), UnixMicros(Cast(a, TimestampType)))
      case other => throw new IllegalArgumentException(
        s"date_diff: unsupported part '$other'")
    }
    Cast(diff, LongType)
  }

  /** Builds the time_bucket replacement once the input's type is resolved.
    *
    * Every timezone-aware node (the Casts, MicrosToTimestamp) gets the
    * session timezone EXPLICITLY: this tree is born inside a lazy
    * RuntimeReplaceable AFTER the analyzer's ResolveTimeZone pass has run,
    * so nothing would ever fill it in (symptom: "replacement is
    * unresolved" / None.get in SpecialDatetimeValues).
    */
  private[plans] def timeBucketReplacement(width: Expression, child: Expression): Expression = {
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val (monthsW, usW): (Int, Long) = width match {
      case Literal(m: Int, _: YearMonthIntervalType) => (m, 0L)
      case Literal(us: Long, _: DayTimeIntervalType) => (0, us)
      case Literal(ci: CalendarInterval, CalendarIntervalType) =>
        if (ci.months != 0) {
          require(ci.days == 0 && ci.microseconds == 0,
            "time_bucket: mixed month/day interval widths are not supported")
          (ci.months, 0L)
        } else (0, ci.days * DayUs + ci.microseconds)
      case _ => throw new IllegalArgumentException(
        "time_bucket requires a literal INTERVAL width")
    }
    if (monthsW > 0) {
      val d = Cast(child, DateType, tz)
      val ms = Add(Multiply(Subtract(Year(d), Literal(2000)), Literal(12)),
        Subtract(Month(d), Literal(1)))
      val floored = Subtract(ms, Pmod(ms, Literal(monthsW)))
      val res = AddMonths(Cast(lit("2000-01-01"), DateType, tz), floored)
      child.dataType match {
        case DateType => res
        case t => Cast(res, t, tz)
      }
    } else {
      require(usW > 0, "time_bucket: width must be a positive interval")
      val t = UnixMicros(Cast(child, TimestampType, tz))
      val bucket = Subtract(t, Pmod(Subtract(t, Literal(OriginUs)), Literal(usW)))
      val ts = MicrosToTimestamp(bucket)
      child.dataType match {
        case DateType => Cast(ts, DateType, tz)
        case tt => Cast(ts, tt, tz)
      }
    }
  }
}

/** `time_bucket(INTERVAL width, ts_or_date)` — RuntimeReplaceable because
  * the result type (DATE in / DATE out) needs the resolved input type,
  * which the function-registry builder doesn't have yet (same pattern as
  * DuckLen).
  */
case class TimeBucket(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override lazy val replacement: Expression =
    DateCompat.timeBucketReplacement(left, right)
  override def prettyName: String = "time_bucket"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TimeBucket =
    copy(left = l, right = r)
}

/** gcd/lcm over BIGINT, as in DuckDB (Spark has no builtin). One static
  * call per row from generated code, same shape as the StrDist family.
  */
object GraftMath {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)
}

/** Inputs are cast to LongType by the registry builder (AbstractDataType —
  * the implicit-cast trait's vocabulary — is private[sql]).
  */
abstract class LongPairExpression extends BinaryExpression {
  protected def method: String
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint)")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.GraftMath.$method($x, $y);")
}

case class GcdExpression(left: Expression, right: Expression)
    extends LongPairExpression {
  override def prettyName: String = "gcd"
  override protected def method: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftMath.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class LcmExpression(left: Expression, right: Expression)
    extends LongPairExpression {
  override def prettyName: String = "lcm"
  override protected def method: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftMath.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
