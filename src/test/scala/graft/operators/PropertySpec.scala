package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness
import graft.plans.ZOrderValue

/** ScalaCheck properties for the bit-level primitives: randomized inputs
  * with shrinking, complementing the example-based specs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Inverse of interleave16: gather even bits into x, odd bits into y. */
  private def deinterleave(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < 16) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("zorder interleave16 is a bijection on 16-bit pairs (round-trips)") {
    check(Prop.forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)) {
      (x, y) => deinterleave(ZOrderValue.interleave16(x, y)) == ((x, y))
    })
  }

  test("zorder truncation: only the low 16 bits of each key matter") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(0L, Long.MaxValue)) {
      (x, y) =>
        ZOrderValue.interleave16(x, y) ==
          ZOrderValue.interleave16(x & 0xffffL, y & 0xffffL)
    })
  }

  test("dialect rewrites never touch string literals, for arbitrary literal content") {
    // Any literal body (quotes escaped as '') must survive the full rewrite
    // chain byte-for-byte — the property that keeps logged SQL, regexes,
    // and prose safe from the keyword scanners.
    val word = Gen.oneOf("QUALIFY", "EXCLUDE", "read_parquet('f')", "UNION",
      "plain text", "FROM x QUALIFY y",
      // the round-7 statement surface: every new scanner must skip literals
      "USING SAMPLE 10%", "a ASOF JOIN b ON x >= y", "REPLACE (a AS b)",
      "PIVOT t ON c USING sum(x)", "UNPIVOT t ON a INTO NAME n VALUE v",
      "[1, 2, 3]", "[x FOR x IN y IF x]", "COLUMNS('n_.*')",
      "INSERT INTO t BY NAME SELECT 1", "CREATE MACRO f(x) AS x + 1",
      "FROM t SELECT a")
    val gen = for {
      ws <- Gen.listOfN(3, word)
    } yield ws.mkString(" ")
    check(Prop.forAll(gen) { body =>
      val lit = body.replace("'", "''")
      val sql = s"SELECT '$lit' AS s FROM region"
      graft.plans.Dialect.rewrite(sql) == sql &&
        graft.plans.Dialect.rewrite(sql, spark) == sql
    }, n = 100)
  }

  test("the text-only dialect rewrite is idempotent on its own output") {
    // a rewrite that re-matches its own output would corrupt statements on
    // any double application (prepare + execute paths both rewrite)
    val stmt = Gen.oneOf(
      "SELECT * EXCLUDE (a) FROM t",
      "SELECT * REPLACE (a + 1 AS a) FROM t",
      "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
      "FROM t SELECT a WHERE a > 1",
      "SELECT [x + 1 FOR x IN l] AS r FROM t",
      "SELECT [1, 2] AS l FROM t",
      "SELECT * FROM t USING SAMPLE 10%",
      "SELECT * FROM read_parquet('/p/f.parquet')",
      "UNPIVOT m ON a, b INTO NAME n VALUE v",
      "SELECT a, b FROM t WHERE a IN (1, 2) ORDER BY b")
    check(Prop.forAll(stmt) { sql =>
      val once = graft.plans.Dialect.rewrite(sql)
      graft.plans.Dialect.rewrite(once) == once
    }, n = 50)
  }

  test("macro expansion never touches literals or same-named function calls") {
    val reg = new graft.engine.Macros.Registry
    reg.put(graft.engine.Macros.MacroDef("m", Seq(("x", None)), "x + 1", isTable = false),
      orReplace = true)
    val word = Gen.oneOf("m(1)", "m (2)", "trim(s)", "plain")
    check(Prop.forAll(Gen.listOfN(3, word)) { ws =>
      val body = ws.mkString(" ").replace("'", "''")
      val sql = s"SELECT '$body' AS s, trim(x) AS t FROM r"
      // the literal and the non-macro call survive; only real m(...) calls
      // outside literals expand
      val out = graft.engine.Macros.expand(sql, reg)
      out.contains(s"'$body'") && out.contains("trim(x)")
    }, n = 100)
  }

  test("salted Jaccard pair join is equivalent to the unsalted join for arbitrary corpora") {
    // the triangle-block decomposition must be invisible in the RESULT for
    // any corpus, cap, and salt count — each Spark job is expensive, so
    // fewer, larger random cases (each corpus exercises many grams/groups)
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.chooseNum(3, 8).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpus = Gen.chooseNum(8, 24).flatMap(n => Gen.listOfN(n, doc))
    val genCase = for {
      docs <- corpus
      cap <- Gen.oneOf(1, 2, 3, 1000)
      salts <- Gen.oneOf(2, 3, 5)
      thr <- Gen.oneOf(0.1, 0.4, 0.8)
    } yield (docs, cap, salts, thr)
    check(Prop.forAll(genCase) { case (docs, cap, salts, thr) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pairs(c: Int, s: Int) =
        TextPipeline.jaccardPairs(df, thr, c, s)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      pairs(cap, salts) == pairs(Int.MaxValue, 16)
    }, n = 12)
  }

  test("WKB round-trips: parse(print(g)) == g for arbitrary points/lines/polygons") {
    import graft.plans.Wkb
    val coord = Gen.chooseNum(-1000000, 1000000).map(_ / 128.0) // dyadic: exact in FP and WKT
    val pointGen = Gen.zip(coord, coord).map { case (x, y) => Wkb.point(x, y) }
    val lineGen = Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(2 * n, coord)).map { cs =>
      Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
        "LINESTRING (" + cs.grouped(2).map(p => s"${fmtD(p.head)} ${fmtD(p(1))}").mkString(", ") + ")"))
    }
    val envGen = Gen.zip(coord, coord, Gen.chooseNum(1, 1000), Gen.chooseNum(1, 1000))
      .map { case (x, y, w, h) => Wkb.makeEnvelope(x, y, x + w, y + h) }
    val simpleGen = Gen.oneOf(pointGen, lineGen, envGen)
    // multi forms (r12): homogeneous multis built from the simple members,
    // plus a one-level GEOMETRYCOLLECTION of arbitrary members
    val multiGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, pointGen)).map(ps =>
        collectWkts("MULTIPOINT", ps.map(p => stripHead(Wkb.asText(p).toString)))),
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, lineGen)).map(ls =>
        collectWkts("MULTILINESTRING", ls.map(l => stripHead(Wkb.asText(l).toString)))),
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, envGen)).map(es =>
        collectWkts("MULTIPOLYGON", es.map(e => stripHead(Wkb.asText(e).toString)))),
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, simpleGen)).map(gs =>
        Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
          "GEOMETRYCOLLECTION (" + gs.map(g => Wkb.asText(g).toString).mkString(", ") + ")"))))
    val geomGen = Gen.oneOf(simpleGen, multiGen)
    // WKT print -> parse -> print is a fixpoint, and the binary round-trip
    // preserves every accessor the engine computes from
    check(Prop.forAll(geomGen) { g =>
      val wkt1 = Wkb.asText(g)
      val g2 = Wkb.fromText(wkt1)
      Wkb.asText(g2).toString == wkt1.toString &&
        Wkb.npoints(g2) == Wkb.npoints(g) &&
        Wkb.xmin(g2) == Wkb.xmin(g) && Wkb.ymax(g2) == Wkb.ymax(g) &&
        Wkb.area(g2) == Wkb.area(g)
    }, n = 200)
    // symmetry + triangle-ish sanity of distance on random point triples
    check(Prop.forAll(Gen.zip(coord, coord, coord, coord)) { case (ax, ay, bx, by) =>
      val d1 = Wkb.distance(Wkb.point(ax, ay), Wkb.point(bx, by))
      val d2 = Wkb.distance(Wkb.point(bx, by), Wkb.point(ax, ay))
      d1 == d2 && d1 >= 0 &&
        Wkb.contains(Wkb.point(ax, ay), Wkb.point(ax, ay))
    }, n = 200)
  }

  test("overlay algebra: additivity, inclusion-exclusion, commutativity for random polygon pairs") {
    import graft.plans.Wkb
    def poly(pts: Seq[(Int, Int)]): Array[Byte] =
      Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
        "POLYGON ((" + (pts :+ pts.head).map(p => s"${p._1} ${p._2}").mkString(", ") + "))"))
    val c = Gen.chooseNum(-20, 20)
    val side = Gen.chooseNum(1, 10)
    val rectGen = Gen.zip(c, c, side, side).map { case (x, y, w, h) =>
      poly(Seq((x, y), (x + w, y), (x + w, y + h), (x, y + h))) }
    val triGen = Gen.zip(c, c, c, c, c, c)
      .suchThat { case (ax, ay, bx, by, cx, cy) =>
        (bx - ax).toLong * (cy - ay) - (by - ay).toLong * (cx - ax) != 0 }
      .map { case (ax, ay, bx, by, cx, cy) => poly(Seq((ax, ay), (bx, by), (cx, cy))) }
    val ellGen = Gen.zip(c, c, Gen.chooseNum(2, 10), Gen.chooseNum(2, 10),
      Gen.chooseNum(1, 9), Gen.chooseNum(1, 9))
      .suchThat { case (_, _, w, h, w2, h1) => w2 < w && h1 < h }
      .map { case (x, y, w, h, w2, h1) =>
        poly(Seq((x, y), (x + w, y), (x + w, y + h1), (x + w2, y + h1),
          (x + w2, y + h), (x, y + h))) }
    // r14: donut subjects — a rect shell with a 1x1 hole strictly inside,
    // exercising the holed overlay decomposition in the same algebra
    val donutGen = Gen.zip(c, c, Gen.chooseNum(4, 10), Gen.chooseNum(4, 10),
      Gen.chooseNum(1, 2), Gen.chooseNum(1, 2))
      .map { case (x, y, w, h, dx, dy) =>
        Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
          s"POLYGON (($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y), " +
          s"(${x + dx} ${y + dy}, ${x + dx + 1} ${y + dy}, ${x + dx + 1} ${y + dy + 1}, " +
          s"${x + dx} ${y + dy + 1}, ${x + dx} ${y + dy}))"))
      }
    val anyPoly = Gen.oneOf(rectGen, triGen, ellGen, donutGen)
    def areaOf(g: Array[Byte]): Double = if (g == null) 0.0 else Wkb.area(g)
    // intersection points on diagonal edges are rationals (t = c1/(c1-c2)),
    // so the algebra holds to FP accumulation, not bit-exactly
    def near(a: Double, b: Double, scale: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, scale)
    check(Prop.forAll(Gen.zip(anyPoly, anyPoly)) { case (s, cgeom) =>
      val aS = Wkb.area(s); val aC = Wkb.area(cgeom)
      val inter = areaOf(Wkb.intersection(s, cgeom))
      val interRev = areaOf(Wkb.intersection(cgeom, s))
      val diff = areaOf(Wkb.difference(s, cgeom))
      val uni = Wkb.union(s, cgeom)
      val uniArea = Wkb.area(uni)
      near(inter, interRev, aS + aC) &&                  // commutative area
        near(inter + diff, aS, aS + aC) &&               // additivity
        near(uniArea, aS + aC - inter, aS + aC) &&       // inclusion-exclusion
        inter <= math.min(aS, aC) + 1e-9 &&
        Wkb.xmin(uni) == math.min(Wkb.xmin(s), Wkb.xmin(cgeom)) &&  // exact extents
        Wkb.ymax(uni) == math.max(Wkb.ymax(s), Wkb.ymax(cgeom))
    }, n = 300)
  }

  private def fmtD(v: Double): String =
    if (v == math.rint(v)) v.toLong.toString else v.toString

  // "POLYGON ((...))" -> "((...))": member body for building multi WKT
  private def stripHead(wkt: String): String = wkt.substring(wkt.indexOf('('))

  private def collectWkts(head: String, bodies: Seq[String]): Array[Byte] =
    graft.plans.Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
      s"$head (${bodies.mkString(", ")})"))

  test("OGC relation matrix: every predicate matches interval closed forms on random rect pairs (r14)") {
    import graft.plans.Wkb
    val c = Gen.chooseNum(-10, 10)
    val side = Gen.chooseNum(1, 6)
    val rectGen = Gen.zip(c, c, side, side).map { case (x, y, w, h) =>
      (x, y, x + w, y + h) }
    // forAllNoShrink: tuple shrinking would fabricate inverted rects
    // (x2 < x1) that no generator produced
    check(Prop.forAllNoShrink(Gen.zip(rectGen, rectGen)) {
      case ((ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2)) =>
        val a = Wkb.makeEnvelope(ax1, ay1, ax2, ay2)
        val b = Wkb.makeEnvelope(bx1, by1, bx2, by2)
        // interval closed forms
        val ix = ax1 <= bx2 && bx1 <= ax2 && ay1 <= by2 && by1 <= ay2
        val strict = ax1 < bx2 && bx1 < ax2 && ay1 < by2 && by1 < ay2 // interiors meet
        val bInA = bx1 >= ax1 && bx2 <= ax2 && by1 >= ay1 && by2 <= ay2
        val aInB = ax1 >= bx1 && ax2 <= bx2 && ay1 >= by1 && ay2 <= by2
        val bStrictInA = bx1 > ax1 && bx2 < ax2 && by1 > ay1 && by2 < ay2
        val eq = ax1 == bx1 && ay1 == by1 && ax2 == bx2 && ay2 == by2
        val checks = Seq(
          "intersects" -> (Wkb.intersects(a, b) == ix),
          "touches" -> (Wkb.touches(a, b) == (ix && !strict)),
          "overlaps" -> (Wkb.overlaps(a, b) == (strict && !bInA && !aInB)),
          "contains" -> (Wkb.contains(a, b) == bInA),
          "covers" -> (Wkb.covers(a, b) == bInA),
          "containsProperly" -> (Wkb.containsProperly(a, b) == bStrictInA),
          "equals" -> (Wkb.geomEquals(a, b) == eq),
          "crosses(area,area)" -> !Wkb.crosses(a, b),
          "disjoint" -> (Wkb.disjoint(a, b) == !ix),
          "intersects_extent" -> (Wkb.intersectsExtent(a, b) == ix))
        val bad = checks.collect { case (name, ok) if !ok => name }
        if (bad.nonEmpty)
          println(s"RELATION MISMATCH $bad for a=($ax1,$ay1,$ax2,$ay2) b=($bx1,$by1,$bx2,$by2)")
        bad.isEmpty
    }, n = 300)
  }

  test("OGC relation matrix, mixed dimensions: axis line x rect against closed forms (r14)") {
    import graft.plans.Wkb
    val c = Gen.chooseNum(-8, 8)
    val side = Gen.chooseNum(1, 6)
    val rectGen = Gen.zip(c, c, side, side).map { case (x, y, w, h) =>
      (x, y, x + w, y + h) }
    val lineGen = Gen.zip(c, c, side, Gen.oneOf(true, false)).map {
      case (x, y, len, horiz) => (x, y, len, horiz) }
    check(Prop.forAllNoShrink(Gen.zip(lineGen, rectGen)) {
      case ((lx, ly, len, horiz), (rx1, ry1, rx2, ry2)) =>
        // the line runs along one axis; closed forms are interval algebra
        // in (main axis span) x (cross-axis position)
        val (a1, a2, cross) = (if (horiz) lx else ly, (if (horiz) lx else ly) + len,
          if (horiz) ly else lx)
        val (m1, m2, c1, c2) =
          if (horiz) (rx1, rx2, ry1, ry2) else (ry1, ry2, rx1, rx2)
        val line = graft.plans.Wkb.fromText(org.apache.spark.unsafe.types.UTF8String.fromString(
          if (horiz) s"LINESTRING ($lx $ly, ${lx + len} $ly)"
          else s"LINESTRING ($lx $ly, $lx ${ly + len})"))
        val rect = Wkb.makeEnvelope(rx1, ry1, rx2, ry2)
        val ix = cross >= c1 && cross <= c2 && a1 <= m2 && m1 <= a2
        val interiorsMeet = cross > c1 && cross < c2 && math.max(a1, m1) < math.min(a2, m2)
        val lineInClosed = cross >= c1 && cross <= c2 && a1 >= m1 && a2 <= m2
        val checks = Seq(
          "intersects" -> (Wkb.intersects(line, rect) == ix),
          "touches" -> (Wkb.touches(line, rect) == (ix && !interiorsMeet)),
          "touchesSym" -> (Wkb.touches(rect, line) == (ix && !interiorsMeet)),
          "crosses" -> (Wkb.crosses(line, rect) == (interiorsMeet && !lineInClosed)),
          "contains" -> (Wkb.contains(rect, line) == (lineInClosed && interiorsMeet)),
          "covers" -> (Wkb.covers(rect, line) == lineInClosed),
          "within" -> (Wkb.within(line, rect) == (lineInClosed && interiorsMeet)),
          "overlaps" -> !Wkb.overlaps(line, rect),
          "containsRev" -> !Wkb.contains(line, rect))
        val bad = checks.collect { case (name, ok) if !ok => name }
        if (bad.nonEmpty)
          println(s"MIXED MISMATCH $bad line=($lx,$ly,len=$len,h=$horiz) rect=($rx1,$ry1,$rx2,$ry2)")
        bad.isEmpty
    }, n = 300)
  }

  test("curve linearization: st_curvetoline invariants on random arcs (r15)") {
    import graft.plans.Wkb
    import org.apache.spark.unsafe.types.UTF8String
    def fmtD(v: Double): String = java.math.BigDecimal.valueOf(v).toPlainString
    // random circle (integer center/radius) and a proper CCW arc across a
    // 16-slot angle grid; the CIRCULARSTRING runs start -> mid -> end
    val gen = for {
      cx <- Gen.chooseNum(-5, 5); cy <- Gen.chooseNum(-5, 5)
      r <- Gen.chooseNum(1, 5)
      s <- Gen.chooseNum(0, 15)
      span <- Gen.chooseNum(2, 14)
      segs <- Gen.oneOf(8, 16, 32)
    } yield (cx, cy, r, s, span, segs)
    check(Prop.forAllNoShrink(gen) { case (cx, cy, r, s, span, segs) =>
      def pt(i: Int): (Double, Double) = {
        val th = 2 * math.Pi * i / 16.0
        (cx + r * math.cos(th), cy + r * math.sin(th))
      }
      val (x1, y1) = pt(s); val (xm, ym) = pt(s + span / 2); val (x2, y2) = pt(s + span)
      val arc = Wkb.fromText(UTF8String.fromString(
        s"CIRCULARSTRING (${fmtD(x1)} ${fmtD(y1)}, ${fmtD(xm)} ${fmtD(ym)}, ${fmtD(x2)} ${fmtD(y2)})"))
      val line = Wkb.curveToLine(arc, segs)
      val theta = span * math.Pi / 8.0
      val vertices = {
        val g = line
        // walk via WKT: LINESTRING (x y, x y, ...)
        val body = Wkb.asText(g).toString
        body.substring(body.indexOf('(') + 1, body.lastIndexOf(')'))
          .split(",").map(_.trim.split("\\s+").map(_.toDouble)).map(a => (a(0), a(1)))
      }
      val checks = Seq(
        // linearization output is LINEAR — no curve kind survives
        "kind" -> (Wkb.geometryType(line).toString == "LINESTRING"),
        // endpoints are the arc's own anchor points
        "start" -> (math.hypot(vertices.head._1 - x1, vertices.head._2 - y1) < 1e-9),
        "end" -> (math.hypot(vertices.last._1 - x2, vertices.last._2 - y2) < 1e-9),
        // every vertex sits ON the circle (radius preserved within fp noise)
        "on-circle" -> vertices.forall { case (x, y) =>
          math.abs(math.hypot(x - cx, y - cy) - r) < 1e-9 },
        // chordal length converges to r*theta from below; >= 8 segments per
        // quadrant bounds the relative gap far under 2%
        "len-upper" -> (Wkb.length(line) <= r * theta + 1e-9),
        "len-lower" -> (Wkb.length(line) >= r * theta * 0.98),
        // enough vertices to honor the segmentization request
        "segments" -> (vertices.length >= 3))
      val bad = checks.collect { case (name, ok) if !ok => name }
      if (bad.nonEmpty)
        println(s"CURVE MISMATCH $bad c=($cx,$cy) r=$r s=$s span=$span segs=$segs " +
          s"len=${Wkb.length(line)} expected=${r * theta}")
      bad.isEmpty
    }, n = 300)
  }

  test("EMPTY x predicate laws: fixed truth values regardless of the other operand (r15)") {
    import graft.plans.Wkb
    import org.apache.spark.unsafe.types.UTF8String
    def w(s: String): Array[Byte] = Wkb.fromText(UTF8String.fromString(s))
    val c = Gen.chooseNum(-8, 8); val side = Gen.chooseNum(1, 5)
    val geomGen: Gen[(String, Array[Byte])] = Gen.oneOf(
      Gen.zip(c, c).map { case (x, y) => ("point", w(s"POINT ($x $y)")) },
      Gen.zip(c, c, side).map { case (x, y, l) =>
        ("line", w(s"LINESTRING ($x $y, ${x + l} $y)")) },
      Gen.zip(c, c, side, side).map { case (x, y, ww, h) =>
        ("rect", Wkb.makeEnvelope(x, y, x + ww, y + h)) })
    val emptyGen = Gen.oneOf("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
      "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION").map(t => w(s"$t EMPTY"))
    check(Prop.forAllNoShrink(Gen.zip(geomGen, emptyGen)) { case ((kind, g), e) =>
      // empty-set semantics (the r14 contract): every positive predicate
      // with an EMPTY operand is false, disjoint is true, intersection /
      // difference-from-empty are empty, and union/difference-by-empty are
      // identity on the non-empty side — INDEPENDENT of g
      val base = Seq(
        "intersects" -> (!Wkb.intersects(e, g) && !Wkb.intersects(g, e)),
        "disjoint" -> (Wkb.disjoint(e, g) && Wkb.disjoint(g, e)),
        "touches" -> (!Wkb.touches(e, g) && !Wkb.touches(g, e)),
        "crosses" -> (!Wkb.crosses(e, g) && !Wkb.crosses(g, e)),
        "overlaps" -> (!Wkb.overlaps(e, g) && !Wkb.overlaps(g, e)),
        "contains" -> (!Wkb.contains(g, e) && !Wkb.contains(e, g)),
        "covers" -> (!Wkb.covers(g, e) && !Wkb.covers(e, g)),
        "within" -> (!Wkb.within(e, g) && !Wkb.within(g, e)),
        "equals" -> (!Wkb.geomEquals(e, g) && !Wkb.geomEquals(g, e)),
        "intersection" -> (Wkb.intersection(e, g) == null && Wkb.intersection(g, e) == null))
      // overlay identities exercised on area inputs (the kernel's overlay
      // domain); lower-dimension identities are covered by the r14 unit test
      val overlay = if (kind == "rect") Seq(
        "union-id" -> (math.abs(Wkb.area(Wkb.union(g, e)) - Wkb.area(g)) < 1e-9 &&
          math.abs(Wkb.area(Wkb.union(e, g)) - Wkb.area(g)) < 1e-9),
        "diff-id" -> (math.abs(Wkb.area(Wkb.difference(g, e)) - Wkb.area(g)) < 1e-9),
        "diff-empty" -> (Wkb.difference(e, g) == null)) else Nil
      val bad = (base ++ overlay).collect { case (name, ok) if !ok => name }
      if (bad.nonEmpty)
        println(s"EMPTY-LAW MISMATCH $bad kind=$kind empty=${Wkb.asText(e)}")
      bad.isEmpty
    }, n = 300)
  }

  test("misraGries: presence + error bound hold for arbitrary skewed streams") {
    // Small alphabet so heavy hitters actually occur; random partitioning so
    // the mergeable-summaries combOp path is exercised, not just seqOp.
    val genStream = for {
      n <- Gen.chooseNum(200, 1500)
      alpha <- Gen.chooseNum(3, 30)
      toks <- Gen.listOfN(n, Gen.chooseNum(1, alpha).map(i => s"w${i * i % alpha}"))
      parts <- Gen.chooseNum(1, 6)
      k <- Gen.chooseNum(2, 12)
    } yield (toks, parts, k)
    check(Prop.forAll(genStream) { case (toks, parts, k) =>
      val sketch = CorpusPrep.misraGries(
        spark.sparkContext.parallelize(toks, parts), k)
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = toks.size.toDouble / k
      val heavyRetained = exact.forall { case (t, c) => c <= bound || sketch.contains(t) }
      val withinBound = sketch.forall { case (t, est) =>
        val ex = exact.getOrElse(t, 0L)
        est <= ex && ex - est <= bound
      }
      heavyRetained && withinBound && sketch.size <= k
    }, n = 25)
  }
}
