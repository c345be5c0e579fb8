package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-similarity family as native codegen'd expressions:
  * `damerau_levenshtein`, `hamming`/`mismatches`, `jaccard`,
  * `jaro_similarity`, `jaro_winkler_similarity` (the reference engine
  * exposes all of them; `levenshtein`/`editdist3` map to Spark's builtin).
  *
  * Semantics probed against DuckDB 1.0 and pinned by the `fn_strdist*`
  * oracles:
  *   - damerau_levenshtein is the TRUE DL distance (unrestricted adjacent
  *     transposition: 'ca'→'abc' = 2), not the cheaper OSA variant (= 3).
  *   - hamming/mismatches REQUIRE equal lengths (loud error, like DuckDB's
  *     "Strings must be of equal length").
  *   - jaccard is case-sensitive character-SET similarity (multiset
  *     collapses: jaccard('aabbb','ab') = 1.0); empty input is an error in
  *     DuckDB ("argument too short") and here.
  *   - jaro/jaro-winkler: standard definitions; either side empty → 0.0;
  *     winkler prefix boost (p=0.1, prefix ≤ 4) applies only when the jaro
  *     score exceeds 0.7 (probed: a 0.5-jaro pair with common prefix stays
  *     0.5 under jaro_winkler in DuckDB).
  *
  * Each row is one static call (`StrDist.xxx`) from generated code, so the
  * surrounding scan/filter stays inside WholeStageCodegen — the same shape
  * Spark's own Levenshtein builtin uses. The DP tables are per-call local
  * arrays sized by the operand lengths (document-scale strings: O(len²)
  * work is inherent to edit distance; pipelines bound it by blocking first,
  * see `dedup_editdist`).
  */
object StrDist {

  def damerau(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    // Lowrance–Wagner: DP over (la+2) x (lb+2) with a last-occurrence map.
    val inf = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(1) = i; h(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { h(1)(j + 1) = j; h(0)(j + 1) = inf; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = { val v = last.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue() }
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val trans = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    h(la + 1)(lb + 1)
  }

  def hamming(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString; val b = ub.toString
    if (a.length != b.length) throw new IllegalArgumentException(
      "hamming/mismatches: strings must be of equal length")
    var d = 0; var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  def jaccard(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    if (a.isEmpty || b.isEmpty) throw new IllegalArgumentException(
      "jaccard: arguments must be non-empty (DuckDB: 'An argument too short')")
    val sa = new java.util.HashSet[Character]()
    val sb = new java.util.HashSet[Character]()
    var i = 0
    while (i < a.length) { sa.add(a.charAt(i)); i += 1 }
    i = 0
    while (i < b.length) { sb.add(b.charAt(i)); i += 1 }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    val union = sa.size() + sb.size() - inter
    inter.toDouble / union.toDouble
  }

  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    jaroImpl(a, b)
  }

  private def jaroImpl(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - half).toDouble / m) / 3.0
  }

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val j = jaroImpl(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Shared shape for the two-string distance expressions: string inputs,
  * null-safe, one static call per row in both eval and generated code.
  */
abstract class StrDistExpression extends BinaryExpression {
  /** StrDist method name; the generated code calls it verbatim. */
  protected def method: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.StrDist.$method($x, $y);")
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StrDistExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override protected def method: String = "damerau"
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDist.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class HammingDistance(left: Expression, right: Expression)
    extends StrDistExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming"
  override protected def method: String = "hamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDist.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class CharSetJaccard(left: Expression, right: Expression)
    extends StrDistExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"
  override protected def method: String = "jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDist.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends StrDistExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override protected def method: String = "jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDist.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StrDistExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def method: String = "jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDist.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
