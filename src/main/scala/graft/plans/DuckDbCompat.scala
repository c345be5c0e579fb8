package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** DuckDB-dialect function aliases, so queries written against the
  * reference engine run VERBATIM here (the migration contract: "a user of
  * the reference could switch and run every query they run today"). Each
  * alias maps a DuckDB spelling onto the equivalent Catalyst expression —
  * no UDFs, so everything stays codegen'd and optimizable.
  *
  * Dialect notes, honestly stated:
  *   - `string_split(s, sep)` splits on a LITERAL separator in DuckDB;
  *     Spark's split takes a regex, so the separator is regex-quoted
  *     (\Q...\E) — byte-for-byte literal semantics for any separator.
  *   - `list_slice(l, a, b)` is the inclusive [a, b] form (positive
  *     indices; DuckDB's negative-index extension is not mapped).
  *   - `list_unique` returns BIGINT-ish counts in DuckDB; cast in SQL when
  *     an exact cross-engine dtype is needed.
  *   - Vector functions map onto the native codegen expressions
  *     (`graft_dot`/`graft_cosine`), whose left-to-right accumulation
  *     matches DuckDB's list functions bit-for-bit on double arrays.
  */
object DuckDbCompat {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  private def lit(s: String) = Literal.create(s, org.apache.spark.sql.types.StringType)

  // DuckDB list_position/list_indexof: 1-based, NULL when absent (Spark's
  // array_position returns 0 there).
  private def duckListPosition(l: Expression, v: Expression): Expression = {
    val pos = ArrayPosition(l, v)
    If(EqualTo(pos, Literal(0L)),
      Literal.create(null, org.apache.spark.sql.types.LongType), pos)
  }

  private def literalText(e: Expression, fn: String): String = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn requires a literal format string")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("string_split"),
      info("string_split", "string_split(s, sep) - split on a literal separator (DuckDB dialect)"),
      (c: Seq[Expression]) => StringSplit(c(0), Concat(Seq(lit("\\Q"), c(1), lit("\\E"))), Literal(-1))),
    (FunctionIdentifier("list_contains"),
      info("list_contains", "list_contains(l, v) - DuckDB alias of array_contains"),
      (c: Seq[Expression]) => ArrayContains(c(0), c(1))),
    (FunctionIdentifier("list_transform"),
      info("list_transform", "list_transform(l, x -> e) - DuckDB alias of transform"),
      (c: Seq[Expression]) => ArrayTransform(c(0), c(1))),
    (FunctionIdentifier("list_filter"),
      info("list_filter", "list_filter(l, x -> p) - DuckDB alias of filter"),
      (c: Seq[Expression]) => ArrayFilter(c(0), c(1))),
    (FunctionIdentifier("list_slice"),
      info("list_slice", "list_slice(l, a, b) - inclusive [a, b] slice (DuckDB dialect)"),
      (c: Seq[Expression]) => Slice(c(0), c(1), Add(Subtract(c(2), c(1)), Literal(1)))),
    (FunctionIdentifier("list_distinct"),
      info("list_distinct", "list_distinct(l) - DuckDB alias of array_distinct"),
      (c: Seq[Expression]) => ArrayDistinct(c(0))),
    (FunctionIdentifier("list_unique"),
      info("list_unique", "list_unique(l) - number of distinct elements"),
      (c: Seq[Expression]) => Size(ArrayDistinct(c(0)))),
    (FunctionIdentifier("list_sort"),
      info("list_sort", "list_sort(l[, 'ASC'|'DESC']) - sort (DuckDB default ASC)"),
      (c: Seq[Expression]) =>
        if (c.length < 2) SortArray(c(0), Literal(true))
        else c(1) match {
          // A silently-ignored order argument would return ASC for a DESC
          // request — the literal is decoded or the call fails loudly.
          case Literal(o, _) if o != null && o.toString.equalsIgnoreCase("desc") =>
            SortArray(c(0), Literal(false))
          case Literal(o, _) if o != null && o.toString.equalsIgnoreCase("asc") =>
            SortArray(c(0), Literal(true))
          case _ => throw new IllegalArgumentException(
            "list_sort: order must be the literal 'ASC' or 'DESC'")
        }),
    (FunctionIdentifier("list_reduce"),
      info("list_reduce",
        "list_reduce(l, (acc, x) -> e) - DuckDB fold: first element seeds the accumulator"),
      (c: Seq[Expression]) => {
        val r = NamedLambdaVariable("r",
          org.apache.spark.sql.types.DoubleType, nullable = true)
        ArrayAggregate(
          Slice(c(0), Literal(2), Add(Size(c(0)), Literal(-1))),
          ElementAt(c(0), Literal(1)),
          c(1) match {
            case lf: LambdaFunction => lf
            case other => throw new IllegalArgumentException(
              s"list_reduce requires a 2-arg lambda, got $other")
          },
          LambdaFunction(r, Seq(r)))
      }),
    (FunctionIdentifier("list_indexof"),
      info("list_indexof",
        "list_indexof(l, v) - DuckDB alias of list_position (1-based, NULL when absent)"),
      (c: Seq[Expression]) => duckListPosition(c(0), c(1))),
    (FunctionIdentifier("list_value"),
      info("list_value", "list_value(x1, ...) - DuckDB alias of array(...)"),
      (c: Seq[Expression]) => CreateArray(c)),
    (FunctionIdentifier("list_append"),
      info("list_append", "list_append(l, v) - append one element"),
      (c: Seq[Expression]) => Concat(Seq(c(0), CreateArray(Seq(c(1)))))),
    (FunctionIdentifier("regexp_matches"),
      info("regexp_matches", "regexp_matches(s, p) - DuckDB alias of rlike"),
      (c: Seq[Expression]) => RLike(c(0), c(1))),
    (FunctionIdentifier("list_dot_product"),
      info("list_dot_product", "list_dot_product(a, b) - native codegen dot product"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    (FunctionIdentifier("list_inner_product"),
      info("list_inner_product", "list_inner_product(a, b) - native codegen dot product"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    (FunctionIdentifier("list_cosine_similarity"),
      info("list_cosine_similarity", "list_cosine_similarity(a, b) - native codegen cosine"),
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    (FunctionIdentifier("list_distance"),
      info("list_distance", "list_distance(a, b) - Euclidean distance via the 3-dot identity"),
      (c: Seq[Expression]) => Sqrt(Add(Subtract(DotProduct(c(0), c(0)),
        Multiply(Literal(2.0), DotProduct(c(0), c(1)))), DotProduct(c(1), c(1))))),
    (FunctionIdentifier("len"),
      info("len", "len(x) - string length or list cardinality (DuckDB dialect)"),
      (c: Seq[Expression]) => DuckLen(c(0))),
    (FunctionIdentifier("array_to_string"),
      info("array_to_string", "array_to_string(l, sep) - DuckDB alias of array_join"),
      (c: Seq[Expression]) => ArrayJoin(c(0), c(1), None)),
    (FunctionIdentifier("list_concat"),
      info("list_concat", "list_concat(a, b, ...) - concatenate lists"),
      (c: Seq[Expression]) => Concat(c)),
    (FunctionIdentifier("list_reverse"),
      info("list_reverse", "list_reverse(l) - DuckDB alias of reverse"),
      (c: Seq[Expression]) => Reverse(c(0))),
    (FunctionIdentifier("list_max"),
      info("list_max", "list_max(l) - DuckDB alias of array_max"),
      (c: Seq[Expression]) => ArrayMax(c(0))),
    (FunctionIdentifier("list_min"),
      info("list_min", "list_min(l) - DuckDB alias of array_min"),
      (c: Seq[Expression]) => ArrayMin(c(0))),
    (FunctionIdentifier("strpos"),
      info("strpos", "strpos(s, sub) - 1-based position, 0 if absent (DuckDB dialect)"),
      (c: Seq[Expression]) => StringLocate(c(1), c(0), Literal(1))),
    (FunctionIdentifier("regexp_extract_all"),
      info("regexp_extract_all",
        "regexp_extract_all(s, p[, group]) - DuckDB defaults to group 0"),
      (c: Seq[Expression]) => RegExpExtractAll(c(0), c(1),
        if (c.length > 2) c(2) else Literal(0))),
    (FunctionIdentifier("epoch_us"),
      info("epoch_us", "epoch_us(ts) - microseconds since the epoch"),
      (c: Seq[Expression]) => UnixMicros(Cast(c(0),
        org.apache.spark.sql.types.TimestampType))),
    (FunctionIdentifier("epoch_ms"),
      info("epoch_ms", "epoch_ms(ts) - milliseconds since the epoch"),
      (c: Seq[Expression]) => UnixMillis(Cast(c(0),
        org.apache.spark.sql.types.TimestampType))),
    (FunctionIdentifier("generate_series"),
      info("generate_series",
        "generate_series(a, b[, step]) - INCLUSIVE range, same as Spark sequence"),
      (c: Seq[Expression]) => new Sequence(c(0), c(1),
        if (c.length > 2) Some(c(2)) else None)),
    (FunctionIdentifier("graft_slice"),
      info("graft_slice",
        "graft_slice(x, lo, hi) - DuckDB 1-based inclusive slice on strings " +
          "and lists (NULL bound = open end, negatives count from the end)"),
      (c: Seq[Expression]) => GraftSlice(c(0), c(1), c(2))),
    (FunctionIdentifier("list_aggregate"),
      info("list_aggregate",
        "list_aggregate(l, 'sum'|'min'|'max'|'count') - the common reducers"),
      (c: Seq[Expression]) => c(1) match {
        case Literal(fn, _) => fn.toString.toLowerCase match {
          case "sum" => {
            val acc = NamedLambdaVariable("acc",
              org.apache.spark.sql.types.DoubleType, nullable = true)
            val x = NamedLambdaVariable("x",
              org.apache.spark.sql.types.DoubleType, nullable = true)
            ArrayAggregate(
              ArrayTransform(c(0), {
                val e = NamedLambdaVariable("e",
                  org.apache.spark.sql.types.DoubleType, nullable = true)
                LambdaFunction(Cast(e, org.apache.spark.sql.types.DoubleType), Seq(e))
              }),
              Literal(0.0),
              LambdaFunction(Add(acc, x), Seq(acc, x)),
              {
                val r = NamedLambdaVariable("r",
                  org.apache.spark.sql.types.DoubleType, nullable = true)
                LambdaFunction(r, Seq(r))
              })
          }
          case "min" => ArrayMin(c(0))
          case "max" => ArrayMax(c(0))
          case "count" => Size(c(0))
          case other => throw new IllegalArgumentException(
            s"list_aggregate: unsupported reducer '$other' (sum/min/max/count)")
        }
        case _ => throw new IllegalArgumentException(
          "list_aggregate requires a literal function name")
      }),
    (FunctionIdentifier("unnest"),
      info("unnest", "unnest(l) - DuckDB's list unnest, as Spark's explode generator"),
      (c: Seq[Expression]) => Explode(c(0))),
    (FunctionIdentifier("list_reverse_sort"),
      info("list_reverse_sort", "list_reverse_sort(l) - descending sort"),
      (c: Seq[Expression]) => SortArray(c(0), Literal(false))),
    (FunctionIdentifier("list_has_any"),
      info("list_has_any", "list_has_any(a, b) - DuckDB alias of arrays_overlap"),
      (c: Seq[Expression]) => ArraysOverlap(c(0), c(1))),
    (FunctionIdentifier("list_has_all"),
      info("list_has_all", "list_has_all(l, sub) - every element of sub present in l"),
      (c: Seq[Expression]) => EqualTo(Size(ArrayExcept(c(1), c(0))), Literal(0))),
    (FunctionIdentifier("list_position"),
      info("list_position",
        "list_position(l, v) - 1-based index, NULL when absent (DuckDB; Spark's array_position returns 0)"),
      (c: Seq[Expression]) => duckListPosition(c(0), c(1))),
    (FunctionIdentifier("list_extract"),
      info("list_extract", "list_extract(l, i) - 1-based element access (element_at)"),
      (c: Seq[Expression]) => ElementAt(c(0), c(1))),
    (FunctionIdentifier("array_length"),
      info("array_length", "array_length(l) - DuckDB alias of cardinality"),
      (c: Seq[Expression]) => Size(c(0))),
    // Aggregate aliases: the registry builder returns the bare
    // AggregateFunction — the analyzer wraps it into an AggregateExpression,
    // exactly as it does for the built-in spellings.
    (FunctionIdentifier("arg_max"),
      info("arg_max", "arg_max(arg, val) - arg at the maximum val (DuckDB alias of max_by)"),
      (c: Seq[Expression]) => aggregate.MaxBy(c(0), c(1))),
    (FunctionIdentifier("arg_min"),
      info("arg_min", "arg_min(arg, val) - arg at the minimum val (DuckDB alias of min_by)"),
      (c: Seq[Expression]) => aggregate.MinBy(c(0), c(1))),
    // DuckDB's string_agg/group_concat: separator defaults to ','; element
    // order is unspecified in both engines unless an ordering is given
    // (DuckDB: `ORDER BY` inside the call; here: LISTAGG ... WITHIN GROUP,
    // which Spark's parser accepts natively).
    (FunctionIdentifier("string_agg"),
      info("string_agg", "string_agg(s[, sep]) - concatenate group values (DuckDB dialect)"),
      (c: Seq[Expression]) => aggregate.ListAgg(c(0),
        if (c.length > 1) c(1) else lit(","))),
    (FunctionIdentifier("group_concat"),
      info("group_concat", "group_concat(s[, sep]) - DuckDB alias of string_agg"),
      (c: Seq[Expression]) => aggregate.ListAgg(c(0),
        if (c.length > 1) c(1) else lit(","))),
    (FunctionIdentifier("quantile_cont"),
      info("quantile_cont",
        "quantile_cont(x, q) - linearly interpolated quantile (DuckDB alias of percentile)"),
      (c: Seq[Expression]) => new aggregate.Percentile(c(0), c(1))),
    (FunctionIdentifier("quantile_disc"),
      info("quantile_disc",
        "quantile_disc(x, q) - discrete quantile: smallest element with cume_dist >= q"),
      (c: Seq[Expression]) => aggregate.PercentileDisc(c(0), c(1), false, 0, 0, false)),
    (FunctionIdentifier("sha256"),
      info("sha256", "sha256(s) - lowercase hex digest (DuckDB alias of sha2(s, 256))"),
      (c: Seq[Expression]) => Sha2(c(0), Literal(256))),
    (FunctionIdentifier("to_hex"),
      info("to_hex", "to_hex(n) - uppercase hex (DuckDB alias of hex)"),
      (c: Seq[Expression]) => Hex(c(0))),
    (FunctionIdentifier("from_hex"),
      info("from_hex", "from_hex(s) - hex decode to binary (DuckDB alias of unhex)"),
      (c: Seq[Expression]) => Unhex(c(0))),
    (FunctionIdentifier("gen_random_uuid"),
      info("gen_random_uuid",
        "gen_random_uuid() - random v4 uuid (DuckDB dialect; STRING here, UUID type there)"),
      (c: Seq[Expression]) => Uuid()),
    (FunctionIdentifier("string_to_array"),
      info("string_to_array", "string_to_array(s, sep) - DuckDB alias of string_split"),
      (c: Seq[Expression]) => StringSplit(c(0), Concat(Seq(lit("\\Q"), c(1), lit("\\E"))), Literal(-1))),
    // DuckDB's log(x) is BASE-10 (ln is natural); Spark's builtin log(x) is
    // natural. The migration contract says reference queries win: 1-arg log
    // is re-pointed at log10, the 2-arg log(base, x) form is identical in
    // both engines. (Spark-dialect users keep ln/log10/log2, which agree.)
    (FunctionIdentifier("log"),
      info("log", "log(x) - base-10 (DuckDB dialect); log(b, x) - arbitrary base"),
      (c: Seq[Expression]) => c match {
        case Seq(x) => Log10(x)
        case Seq(b, x) => Logarithm(b, x)
        case _ => throw new IllegalArgumentException("log expects 1 or 2 arguments")
      }),
    // list_zip: pairwise struct fields named list_1/list_2 exactly as
    // DuckDB names them; both engines pad to the longer list with NULLs.
    (FunctionIdentifier("list_zip"),
      info("list_zip", "list_zip(a, b) - zip to structs {list_1, list_2} (DuckDB dialect)"),
      (c: Seq[Expression]) => {
        // unresolved lambda variables, exactly as the parser builds them —
        // ResolveLambdaVariables assigns the element types during analysis
        val x = UnresolvedNamedLambdaVariable(Seq("zip_l"))
        val y = UnresolvedNamedLambdaVariable(Seq("zip_r"))
        ZipWith(c(0), c(1), LambdaFunction(
          CreateNamedStruct(Seq(lit("list_1"), x, lit("list_2"), y)), Seq(x, y)))
      }),
    // DuckDB strftime/strptime use C-style codes (%Y-%m-%d); Spark's
    // date_format/to_timestamp use Java patterns. The format is translated
    // at bind time (literal formats only — a computed format would need a
    // per-row translator, which no reference query uses), then execution is
    // the plain codegen'd built-in.
    (FunctionIdentifier("strftime"),
      info("strftime", "strftime(ts, '%Y-%m-%d') - C-style timestamp formatting (DuckDB dialect)"),
      (c: Seq[Expression]) => DateFormatClass(
        Cast(c(0), org.apache.spark.sql.types.TimestampType),
        lit(StrfTime.toJavaPattern(literalText(c(1), "strftime"))))),
    (FunctionIdentifier("strptime"),
      info("strptime", "strptime(s, '%Y-%m-%d') - C-style timestamp parsing (DuckDB dialect)"),
      (c: Seq[Expression]) => new ParseToTimestamp(c(0),
        lit(StrfTime.toJavaPattern(literalText(c(1), "strptime"))))),
    (FunctionIdentifier("printf"),
      info("printf", "printf(fmt, ...) - C-style formatting (both engines use %-codes)"),
      (c: Seq[Expression]) => FormatString(c: _*)),
    // DuckDB's regexp_replace takes an OPTIONS string as the 4th argument
    // ('g' = global, 'i' = case-insensitive); Spark's 4th argument is a
    // start POSITION. Disambiguate by the literal's type: a string literal
    // is DuckDB options (global is Spark's default; 'i'/'m'/'s' fold into
    // the pattern), anything else keeps Spark's position semantics.
    // Declared narrowing: the 3-arg form keeps Spark's replace-ALL
    // semantics (DuckDB's default is first-only; Spark has no builtin
    // replaceFirst) — append 'g' for the portable spelling.
    (FunctionIdentifier("regexp_replace"),
      info("regexp_replace",
        "regexp_replace(s, p, r[, options|position]) - DuckDB options string or Spark position"),
      (c: Seq[Expression]) => c match {
        case Seq(s, p, r) => RegExpReplace(s, p, r)
        case Seq(s, p, r, Literal(flags, org.apache.spark.sql.types.StringType)) =>
          val f = String.valueOf(flags)
          val unknown = f.filterNot("gims".contains(_))
          if (unknown.nonEmpty) throw new IllegalArgumentException(
            s"regexp_replace: unsupported option(s) '$unknown' (g/i/m/s)")
          val inline = f.filter(_ != 'g')
          val pat = if (inline.isEmpty) p else Concat(Seq(lit(s"(?$inline)"), p))
          RegExpReplace(s, pat, r)
        case Seq(s, p, r, pos) => RegExpReplace(s, p, r, pos)
        case _ => throw new IllegalArgumentException(
          "regexp_replace expects 3 or 4 arguments")
      }),
    // --- string-similarity family (see plans/StringDistances.scala) ---
    (FunctionIdentifier("editdist3"),
      info("editdist3", "editdist3(a, b) - DuckDB alias of levenshtein"),
      (c: Seq[Expression]) => Levenshtein(c(0), c(1))),
    (FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - true DL distance (adjacent transpositions)"),
      (c: Seq[Expression]) => DamerauLevenshtein(c(0), c(1))),
    (FunctionIdentifier("hamming"),
      info("hamming", "hamming(a, b) - differing positions; equal lengths required"),
      (c: Seq[Expression]) => HammingDistance(c(0), c(1))),
    (FunctionIdentifier("mismatches"),
      info("mismatches", "mismatches(a, b) - DuckDB alias of hamming"),
      (c: Seq[Expression]) => HammingDistance(c(0), c(1))),
    (FunctionIdentifier("jaccard"),
      info("jaccard", "jaccard(a, b) - character-set Jaccard similarity"),
      (c: Seq[Expression]) => CharSetJaccard(c(0), c(1))),
    (FunctionIdentifier("jaro_similarity"),
      info("jaro_similarity", "jaro_similarity(a, b) - Jaro similarity in [0, 1]"),
      (c: Seq[Expression]) => JaroSimilarity(c(0), c(1))),
    (FunctionIdentifier("jaro_winkler_similarity"),
      info("jaro_winkler_similarity",
        "jaro_winkler_similarity(a, b) - Jaro with prefix boost above 0.7"),
      (c: Seq[Expression]) => JaroWinklerSimilarity(c(0), c(1))),
    // --- date/time dialect (see plans/DateCompat.scala) ---
    // date_diff/datediff with a QUOTED part are parser-shadowed spellings;
    // FunctionRenames redirects them here (see plans/FunctionRenames.scala).
    (FunctionIdentifier("graft_date_diff"),
      info("graft_date_diff",
        "date_diff('part', a, b) - part boundaries crossed, signed (DuckDB dialect)"),
      (c: Seq[Expression]) => c match {
        case Seq(p, a, b) => DateCompat.dateDiff(literalText(p, "date_diff"), a, b)
        case _ => throw new IllegalArgumentException(
          "date_diff expects ('part', start, end)")
      }),
    (FunctionIdentifier("time_bucket"),
      info("time_bucket",
        "time_bucket(INTERVAL w, ts) - fixed-width bucket, origin 2000-01-03 / 2000-01"),
      (c: Seq[Expression]) => {
        if (c.length != 2) throw new IllegalArgumentException(
          "time_bucket(width, ts): only the 2-argument form is supported")
        TimeBucket(c(0), c(1))
      }),
    (FunctionIdentifier("dayname"),
      info("dayname", "dayname(d) - full weekday name (DuckDB dialect)"),
      (c: Seq[Expression]) => DateFormatClass(
        Cast(c(0), org.apache.spark.sql.types.TimestampType), lit("EEEE"))),
    (FunctionIdentifier("monthname"),
      info("monthname", "monthname(d) - full month name (DuckDB dialect)"),
      (c: Seq[Expression]) => DateFormatClass(
        Cast(c(0), org.apache.spark.sql.types.TimestampType), lit("MMMM"))),
    // --- misc renames onto builtins ---
    (FunctionIdentifier("ord"),
      info("ord", "ord(s) - code point of the first character"),
      (c: Seq[Expression]) => Ascii(c(0))),
    (FunctionIdentifier("unicode"),
      info("unicode", "unicode(s) - code point of the first character"),
      (c: Seq[Expression]) => Ascii(c(0))),
    (FunctionIdentifier("regexp_split_to_array"),
      info("regexp_split_to_array",
        "regexp_split_to_array(s, pattern) - regex split (both engines)"),
      (c: Seq[Expression]) => StringSplit(c(0), c(1), Literal(-1))),
    (FunctionIdentifier("to_base64"),
      info("to_base64", "to_base64(b) - DuckDB alias of base64"),
      (c: Seq[Expression]) => Base64(Cast(c(0), org.apache.spark.sql.types.BinaryType))),
    (FunctionIdentifier("from_base64"),
      info("from_base64", "from_base64(s) - DuckDB alias of unbase64"),
      (c: Seq[Expression]) => UnBase64(c(0))),
    (FunctionIdentifier("uuid"),
      info("uuid", "uuid() - DuckDB alias of gen_random_uuid"),
      (c: Seq[Expression]) => Uuid()),
    (FunctionIdentifier("prefix"),
      info("prefix", "prefix(s, p) - DuckDB alias of starts_with"),
      (c: Seq[Expression]) => StartsWith(c(0), c(1))),
    (FunctionIdentifier("suffix"),
      info("suffix", "suffix(s, p) - DuckDB alias of ends_with"),
      (c: Seq[Expression]) => EndsWith(c(0), c(1))),
    (FunctionIdentifier("to_base"),
      info("to_base",
        "to_base(n, radix[, min_len]) - uppercase digits, zero-padded to min_len"),
      (c: Seq[Expression]) => {
        val conv = Conv(Cast(c(0), org.apache.spark.sql.types.StringType),
          Literal(10), c(1))
        if (c.length > 2) StringLPad(conv, c(2), lit("0")) else conv
      }),
    (FunctionIdentifier("gcd"),
      info("gcd", "gcd(a, b) - greatest common divisor over BIGINT"),
      (c: Seq[Expression]) => GcdExpression(
        Cast(c(0), org.apache.spark.sql.types.LongType),
        Cast(c(1), org.apache.spark.sql.types.LongType))),
    (FunctionIdentifier("lcm"),
      info("lcm", "lcm(a, b) - least common multiple over BIGINT"),
      (c: Seq[Expression]) => LcmExpression(
        Cast(c(0), org.apache.spark.sql.types.LongType),
        Cast(c(1), org.apache.spark.sql.types.LongType))),
    // DuckDB's fmt-style format(): bare {} placeholders expand to
    // stringified args at bind time (Concat of casts, fully codegen'd).
    // Format SPECS ({:.2f}-style) are rejected loudly — DuckDB's fmt
    // engine is a superset nothing in the fixtures needs.
    (FunctionIdentifier("format"),
      info("format", "format('{} ...', args) - fmt-style formatting, bare {} only"),
      (c: Seq[Expression]) => {
        val fmt = literalText(c(0), "format")
        val args = c.drop(1)
        val parts = scala.collection.mutable.ArrayBuffer.empty[Expression]
        var rest = fmt
        var argIdx = 0
        while (rest.nonEmpty) {
          val open = rest.indexOf('{')
          if (open < 0) { parts += lit(rest); rest = "" }
          else {
            if (open > 0) parts += lit(rest.substring(0, open))
            val close = rest.indexOf('}', open)
            if (close < 0) throw new IllegalArgumentException(
              s"format: unbalanced '{' in '$fmt'")
            val spec = rest.substring(open + 1, close)
            if (!(spec.isEmpty || spec == ":d" || spec == ":s"))
              throw new IllegalArgumentException(
                s"format: unsupported spec '{$spec}' (bare {} only)")
            if (argIdx >= args.length) throw new IllegalArgumentException(
              s"format: more placeholders than arguments in '$fmt'")
            parts += Cast(args(argIdx), org.apache.spark.sql.types.StringType)
            argIdx += 1
            rest = rest.substring(close + 1)
          }
        }
        if (parts.isEmpty) lit("") else if (parts.length == 1) parts.head
        else Concat(parts.toSeq)
      }))
}

/** C-style (strftime) → Spark datetime pattern translation. Literal text
  * between codes is single-quoted so pattern letters in it (e.g. "Day")
  * cannot be interpreted; unknown codes are rejected loudly rather than
  * silently mis-formatting.
  */
object StrfTime {
  private val codes: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'g' -> "SSS",
    'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'p' -> "a", 'Z' -> "zzz")

  def toJavaPattern(fmt: String): String = {
    val out = new StringBuilder
    val literalRun = new StringBuilder
    def flush(): Unit = if (literalRun.nonEmpty) {
      val run = literalRun.toString
      // Quote any run containing a letter (potential pattern char); quotes
      // inside the run are doubled per java.time quoting rules.
      if (run.exists(_.isLetter) || run.contains("'"))
        out.append("'").append(run.replace("'", "''")).append("'")
      else out.append(run)
      literalRun.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val c = fmt.charAt(i + 1)
        if (c == '%') { literalRun.append('%'); i += 2 }
        else codes.get(c) match {
          case Some(p) => flush(); out.append(p); i += 2
          case None => throw new IllegalArgumentException(
            s"strftime/strptime: unsupported format code '%$c' in '$fmt'")
        }
      } else { literalRun.append(fmt.charAt(i)); i += 1 }
    }
    flush()
    out.toString
  }
}

/** DuckDB bracket-slice semantics `x[a:b]` as one type-dispatching
  * expression: 1-based INCLUSIVE bounds on strings and lists, negative
  * indices count from the end (-1 = the last element), NULL bound = open
  * end, out-of-range bounds clamp (DuckDB `'abcdef'[2:100]` = 'bcdef').
  * The `ListSyntax` rewrite emits this for slice syntax — which Spark's
  * parser rejects outright, so claiming it flips no host query — and for
  * subscripted STRING LITERALS (also invalid host syntax). Plain
  * `arr[i]` subscripts keep Spark's 0-based host semantics, per the
  * documented ListSyntax decision.
  */
case class GraftSlice(input: Expression, lo: Expression, hi: Expression)
    extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {
  import org.apache.spark.sql.types.IntegerType
  override def first: Expression = input
  override def second: Expression = lo
  override def third: Expression = hi
  private def ix(e: Expression): Expression = Cast(e, IntegerType)
  // NULL -> default (open end); negative -> n + i + 1; then clamp below.
  private def norm(e: Expression, dflt: Expression, n: Expression): Expression =
    If(IsNull(e), dflt,
      If(LessThan(ix(e), Literal(0)), Add(Add(n, ix(e)), Literal(1)), ix(e)))
  override lazy val replacement: Expression = {
    val isArray = input.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val n: Expression = if (isArray) Size(input) else Length(input)
    val loC = Greatest(Seq(Literal(1), norm(lo, Literal(1), n)))
    val hiC = Least(Seq(n, norm(hi, n, n)))
    val len = Greatest(Seq(Literal(0), Add(Subtract(hiC, loC), Literal(1))))
    if (isArray) Slice(input, loC, len) else Substring(input, loC, len)
  }
  override def prettyName: String = "graft_slice"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftSlice =
    copy(input = f, lo = s, hi = t)
}

/** DuckDB `len`: string length on strings, cardinality on lists — the
  * dispatch happens at resolution time through RuntimeReplaceable (the
  * replacement reads the resolved child's dataType; ReplaceExpressions then
  * swaps it in, so execution runs the plain built-in).
  */
case class DuckLen(child: Expression) extends RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: org.apache.spark.sql.types.ArrayType => Size(child)
    case _ => Length(child)
  }
  override def prettyName: String = "len"
  override protected def withNewChildInternal(newChild: Expression): DuckLen =
    copy(child = newChild)
}
