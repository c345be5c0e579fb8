package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Spatial aggregate functions (r13) over the [[Wkb]] kernel — the
  * group-wise half of the DuckDB-spatial surface the reference preloads
  * (ST_Extent_Agg / ST_Collect-style aggregation in
  * `/root/reference/src/common/gizmosql_library.cpp:820-827`).
  *
  * st_extent_agg is a [[DeclarativeAggregate]]: the buffer is four doubles
  * (xmin/ymin/xmax/ymax) folded with Least/Greatest over codegen
  * StaticInvoke calls into the Wkb accessors, so the whole aggregation
  * stays inside WholeStageCodegen with map-side partial merge — at scale
  * each task reduces its partition to 4 doubles and the shuffle carries
  * one 32-byte buffer per (group, partition). The envelope polygon is
  * materialized once per group at evaluate.
  */
case class StExtentAgg(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_extent_agg"

  private lazy val bXmin = AttributeReference("xmin", DoubleType)()
  private lazy val bYmin = AttributeReference("ymin", DoubleType)()
  private lazy val bXmax = AttributeReference("xmax", DoubleType)()
  private lazy val bYmax = AttributeReference("ymax", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bXmin, bYmin, bXmax, bYmax)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.PositiveInfinity), Literal(Double.PositiveInfinity),
    Literal(Double.NegativeInfinity), Literal(Double.NegativeInfinity))

  private def acc(method: String): Expression =
    StaticInvoke(Wkb.getClass, DoubleType, method, Seq(child),
      inputTypes = Seq(BinaryType), returnNullable = false)

  // Least/Greatest skip nulls, so a null geometry row (acc propagates the
  // null) leaves the buffer untouched — no branch needed.
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Least(Seq(bXmin, acc("xmin"))), Least(Seq(bYmin, acc("ymin"))),
    Greatest(Seq(bXmax, acc("xmax"))), Greatest(Seq(bYmax, acc("ymax"))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(bXmin.left, bXmin.right)), Least(Seq(bYmin.left, bYmin.right)),
    Greatest(Seq(bXmax.left, bXmax.right)), Greatest(Seq(bYmax.left, bYmax.right)))

  // An untouched buffer (no non-null input) still holds +inf -> NULL, the
  // same contract as min/max. A single point yields the degenerate
  // zero-extent envelope, like DuckDB's ST_Extent_Agg.
  override lazy val evaluateExpression: Expression = If(
    EqualTo(bXmin, Literal(Double.PositiveInfinity)),
    Literal(null, BinaryType),
    StaticInvoke(Wkb.getClass, BinaryType, "makeEnvelope",
      Seq(bXmin, bYmin, bXmax, bYmax), inputTypes = Seq.fill(4)(DoubleType),
      returnNullable = false))

  override protected def withNewChildInternal(newChild: Expression): StExtentAgg =
    copy(child = newChild)
}

/** st_makeline_agg(point, seq): the group's points as one LINESTRING in
  * ascending `seq` order (ties broken by arrival — make seq unique for
  * full determinism) — the trip-assembly primitive (GPS pings ordered by
  * timestamp -> path), PostGIS's `ST_MakeLine(geom ORDER BY ts)`.
  * Buffer = the group's (seq, x, y) triples: 24 bytes a point, bounded by
  * the entity's ping count like any per-entity assembly.
  */
case class StMakeLineAgg(point: Expression, seq: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double, Double)]]
  with ImplicitCastInputTypes {

  // ImplicitCastInputTypes: integer/long seq arguments cast to double
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def children: Seq[Expression] = Seq(point, seq)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_makeline_agg"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double, Double)] = {
    val p = point.eval(input)
    val s = seq.eval(input)
    if (p != null && s != null) {
      val wkb = p.asInstanceOf[Array[Byte]]
      val ord = s match {
        case n: java.lang.Number => n.doubleValue()
        case other => fail("st_makeline_agg: seq must be numeric, got " + other.getClass)
      }
      buf += ((ord, Wkb.x(wkb), Wkb.y(wkb)))
    }
    buf
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  override def merge(b1: ArrayBuffer[(Double, Double, Double)],
      b2: ArrayBuffer[(Double, Double, Double)]): ArrayBuffer[(Double, Double, Double)] = {
    b1 ++= b2; b1
  }

  override def eval(buf: ArrayBuffer[(Double, Double, Double)]): Any =
    if (buf.length < 2) null // a line needs 2 points; 0/1-ping groups -> NULL
    else {
      val sorted = buf.sortBy(_._1)
      val ring = new Array[Double](2 * sorted.length)
      var i = 0
      sorted.foreach { case (_, x, y) => ring(2 * i) = x; ring(2 * i + 1) = y; i += 1 }
      Wkb.lineOf(ring)
    }

  override def serialize(buf: ArrayBuffer[(Double, Double, Double)]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 24 * buf.length)
    out.putInt(buf.length)
    buf.foreach { case (s, x, y) => out.putDouble(s); out.putDouble(x); out.putDouble(y) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double, Double)] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[(Double, Double, Double)](n)
    var i = 0
    while (i < n) { buf += ((in.getDouble, in.getDouble, in.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StMakeLineAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StMakeLineAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StMakeLineAgg =
    copy(point = newChildren(0), seq = newChildren(1))
}

/** st_collect_agg(geom): the group's geometries as one MULTI geometry
  * (homogeneous simple members) or GEOMETRYCOLLECTION (mixed), NULL for an
  * all-null group. Members are ordered canonically (lexicographic WKT), so
  * the result is deterministic under Spark's unordered aggregation — the
  * property the oracle comparison and any downstream hashing rely on.
  *
  * Scale posture: like collect_list, the buffer is the group's rows — this
  * is per-entity geometry assembly (trip points -> path, parcel parts ->
  * multipolygon), bounded by the entity's size, NOT a whole-table fold;
  * st_extent_agg is the constant-space alternative when only the bound is
  * needed.
  */
case class StCollectAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Byte]]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_collect_agg"

  override def createAggregationBuffer(): ArrayBuffer[Array[Byte]] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Array[Byte]], input: InternalRow): ArrayBuffer[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Array[Byte]]
    buf
  }

  override def merge(b1: ArrayBuffer[Array[Byte]], b2: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = {
    b1 ++= b2; b1
  }

  override def eval(buf: ArrayBuffer[Array[Byte]]): Any =
    if (buf.isEmpty) null else Wkb.collect(buf.toArray)

  override def serialize(buf: ArrayBuffer[Array[Byte]]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + buf.iterator.map(4 + _.length).sum)
    out.putInt(buf.length)
    buf.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Byte]] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.getInt)
      in.get(b)
      buf += b
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): StCollectAgg =
    copy(child = newChild)
}

/** st_union_agg(geom): the cascaded union of a group's polygons (r14) —
  * DuckDB-spatial's dissolve primitive. The buffer is the running union as
  * a DISJOINT-INTERIOR piece list of hole-free rings; each input polygon P
  * folds in as U ∪ P = (U − P) ⊎ pieces(P) via the triangulated overlay
  * kernel, so area/extent over the result are exact. Holed inputs
  * decompose first (r14 overlay scope); non-polygons fail loudly; all-null
  * groups yield NULL.
  *
  * Determinism contract: the result's POINT SET (hence st_area, st_extent,
  * containment) is order-independent, but the piece decomposition itself
  * depends on Spark's unordered fold — compare unions by measures, not by
  * WKT (the declared st_union piece-decomposition contract, aggregated).
  *
  * Scale posture: per-group state is O(vertices of the group's union
  * decomposition) — per-entity dissolve (parcel rows -> one parcel), NOT a
  * whole-table fold; the subtractRing explosion guard (4096 pieces) bounds
  * pathological groups loudly. st_extent_agg is the constant-space
  * alternative when only the bound is needed.
  */
case class StUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Double]]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_union_agg"

  override def createAggregationBuffer(): ArrayBuffer[Array[Double]] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Array[Double]],
      input: InternalRow): ArrayBuffer[Array[Double]] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val out = Wkb.unionPieces(buf.toSeq, v.asInstanceOf[Array[Byte]])
      buf.clear(); buf ++= out; buf
    }
  }

  override def merge(b1: ArrayBuffer[Array[Double]],
      b2: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] = {
    // b2's pieces are pairwise disjoint: subtract each from b1's side once,
    // then adopt them — (U1 − U2) ⊎ U2
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val reduced = b2.foldLeft(b1.toSeq)((acc, r) => Wkb.subtractPieceRing(acc, r))
    val out = ArrayBuffer.empty[Array[Double]]
    out ++= reduced ++= b2
    out
  }

  override def eval(buf: ArrayBuffer[Array[Double]]): Any =
    Wkb.pieceUnionWkb(buf.toSeq)

  override def serialize(buf: ArrayBuffer[Array[Double]]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(
      4 + buf.iterator.map(4 + 8 * _.length).sum)
    out.putInt(buf.length)
    buf.foreach { r => out.putInt(r.length); r.foreach(out.putDouble) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Double]] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new ArrayBuffer[Array[Double]](n)
    var i = 0
    while (i < n) {
      val r = new Array[Double](in.getInt)
      var j = 0
      while (j < r.length) { r(j) = in.getDouble; j += 1 }
      buf += r
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): StUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): StUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): StUnionAgg =
    copy(child = newChild)
}
