package graft.sources

import graft.types.TypeMapping
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, MapVector, StructVector}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.jdk.CollectionConverters._

/** Arrow IPC stream export/import — the wire format of the reference's
  * result streams (`/root/reference/src/duckdb/duckdb_statement.cpp:2248-2331`,
  * batches over gRPC) and its bulk-ingest input. With no Flight/gRPC jars in
  * this environment the transport stops at IPC stream bytes; a Flight SQL
  * endpoint would wrap these calls 1:1.
  *
  * Batched via `toLocalIterator` so only `batchSize` rows are resident on the
  * driver at a time — the executors stream partitions sequentially.
  *
  * Value coverage: all atomic types, arrays of atomics, structs of atomics,
  * and maps with atomic keys/values (schema mapping in
  * [[graft.types.TypeMapping]]; deeper nesting throws a clear error).
  */
object ArrowIO {

  /** Export a DataFrame as one Arrow IPC stream (schema + record batches). */
  def toArrowStream(df: DataFrame, batchSize: Int = 4096): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeArrowStream(df, out, batchSize): Unit
    out.toByteArray
  }

  /** Stream a DataFrame as an Arrow IPC stream directly onto `out` — the
    * transport path for results larger than driver memory: only one
    * `batchSize` batch is resident at a time, written as it fills.
    */
  /** Output columns whose defining expression produces WKB geometry — a
    * StaticInvoke into the [[graft.plans.Wkb]] kernel returning BINARY.
    * Export auto-tags these with `ARROW:extension:name = geoarrow.wkb`, the
    * reference's GeoArrow contract for GEOMETRY results
    * (`gizmosql_library.cpp:820-827`, `test_geoarrow.cpp:138-245`): a
    * GeoArrow-aware client reads `SELECT st_point(...)` as geometry, not
    * opaque bytes. Pre-tagged columns (ingested GeoArrow) keep their own
    * metadata; detection failures degrade to untagged binary, never error.
    */
  private def geometryOutputs(df: DataFrame): Set[String] = try {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    val plan = df.queryExecution.analyzed
    def isGeom(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = e match {
      case si: StaticInvoke =>
        si.dataType == org.apache.spark.sql.types.BinaryType &&
          si.staticObject == graft.plans.Wkb.getClass
      case a: Alias => isGeom(a.child)
      case _ => false
    }
    val geomIds = plan.collect { case p => p }.flatMap(_.expressions).flatMap(_.collect {
      case a: Alias if isGeom(a.child) => a.exprId
    }).toSet
    plan.output.filter(at => geomIds.contains(at.exprId)).map(_.name).toSet
  } catch { case scala.util.control.NonFatal(_) => Set.empty }

  /** Returns the number of rows streamed (instrumentation's rows_fetched). */
  def writeArrowStream(df: DataFrame, out: java.io.OutputStream, batchSize: Int = 4096): Long = {
    val schema = df.schema
    val arrowSchema = TypeMapping.toArrowSchema(schema, geometryOutputs(df))
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    var total = 0L
    try {
      writer.start()
      val it = df.toLocalIterator()
      val buffer = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
      def flush(): Unit = if (buffer.nonEmpty) {
        root.allocateNew()
        buffer.zipWithIndex.foreach { case (row, i) => writeRow(root, schema, row, i) }
        root.setRowCount(buffer.size)
        writer.writeBatch()
        total += buffer.size
        buffer.clear()
      }
      while (it.hasNext) {
        buffer += it.next()
        if (buffer.size >= batchSize) flush()
      }
      flush()
      writer.end()
      total
    } finally {
      writer.close(); root.close(); allocator.close()
    }
  }

  private def writeRow(root: VectorSchemaRoot, schema: StructType, row: Row, i: Int): Unit = {
    schema.fields.zipWithIndex.foreach { case (f, c) =>
      val vec = root.getVector(c)
      if (row.isNullAt(c)) vec.asInstanceOf[FieldVector].setNull(i)
      else writeAny(vec, f.dataType, row.get(c), i)
    }
  }

  private def writeAny(vec: FieldVector, dt: DataType, value: Any, i: Int): Unit =
    (vec, dt) match {
      case (v: BitVector, BooleanType) => v.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (v: TinyIntVector, ByteType) => v.setSafe(i, value.asInstanceOf[Byte])
      case (v: SmallIntVector, ShortType) => v.setSafe(i, value.asInstanceOf[Short])
      case (v: IntVector, IntegerType) => v.setSafe(i, value.asInstanceOf[Int])
      case (v: BigIntVector, LongType) => v.setSafe(i, value.asInstanceOf[Long])
      case (v: Float4Vector, FloatType) => v.setSafe(i, value.asInstanceOf[Float])
      case (v: Float8Vector, DoubleType) => v.setSafe(i, value.asInstanceOf[Double])
      case (v: DecimalVector, _: DecimalType) =>
        v.setSafe(i, value.asInstanceOf[java.math.BigDecimal])
      case (v: VarCharVector, StringType) =>
        v.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case (v: VarBinaryVector, BinaryType) => v.setSafe(i, value.asInstanceOf[Array[Byte]])
      case (v: DateDayVector, DateType) =>
        v.setSafe(i, value.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case (v: TimeStampMicroVector, TimestampNTZType) =>
        val ldt = value.asInstanceOf[java.time.LocalDateTime]
        v.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
      case (v: TimeStampMicroTZVector, TimestampType) =>
        val ts = value.asInstanceOf[java.sql.Timestamp]
        v.setSafe(i, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
      case (v: MapVector, MapType(kt, vt, _)) =>
        val entries = value.asInstanceOf[scala.collection.Map[Any, Any]]
        val w = v.getWriter
        w.setPosition(i)
        w.startMap()
        entries.foreach { case (k, mv) =>
          w.startEntry()
          writeScalar(w.key(), kt, k)
          writeScalar(w.value(), vt, mv)
          w.endEntry()
        }
        w.endMap()
      case (v: StructVector, StructType(fields)) =>
        val struct = value.asInstanceOf[Row]
        fields.zipWithIndex.foreach { case (f, j) =>
          val child = v.getChild(f.name)
          if (struct.isNullAt(j)) child.setNull(i)
          else writeAny(child, f.dataType, struct.get(j), i)
        }
        v.setIndexDefined(i)
      case (v: ListVector, ArrayType(elem, _)) =>
        val values = value.asInstanceOf[scala.collection.Seq[Any]]
        val w = v.getWriter
        w.setPosition(i)
        w.startList()
        values.foreach { x => writeScalar(w, elem, x) }
        w.endList()
      case other =>
        throw new IllegalArgumentException(s"Arrow export unsupported for $dt -> ${other._1.getClass}")
    }

  /** Scalar write through any BaseWriter (list elements, map keys/values).
    * Nulls must be written explicitly — casting null to a primitive would
    * silently corrupt the wire value to 0.
    */
  private def writeScalar(w: org.apache.arrow.vector.complex.writer.BaseWriter.ListWriter,
      dt: DataType, x: Any): Unit =
    if (x == null) dt match {
      case BooleanType => w.bit().writeNull()
      case IntegerType => w.integer().writeNull()
      case LongType => w.bigInt().writeNull()
      case FloatType => w.float4().writeNull()
      case DoubleType => w.float8().writeNull()
      case StringType => w.varChar().writeNull()
      case other => throw new IllegalArgumentException(s"Arrow nested null unsupported for $other")
    } else dt match {
      case BooleanType => w.bit().writeBit(if (x.asInstanceOf[Boolean]) 1 else 0)
      case IntegerType => w.integer().writeInt(x.asInstanceOf[Int])
      case LongType => w.bigInt().writeBigInt(x.asInstanceOf[Long])
      case FloatType => w.float4().writeFloat4(x.asInstanceOf[Float])
      case DoubleType => w.float8().writeFloat8(x.asInstanceOf[Double])
      case StringType =>
        w.varChar().writeVarChar(new org.apache.arrow.vector.util.Text(x.asInstanceOf[String]))
      case other => throw new IllegalArgumentException(s"Arrow nested-scalar export unsupported for $other")
    }

  /** Import an Arrow IPC stream into a DataFrame (the ingest direction):
    * schema via TypeMapping, values batch-by-batch.
    */
  def fromArrowStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val allocator = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val schema = TypeMapping.fromArrowSchema(root.getSchema)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { i =>
          rows += Row.fromSeq(schema.fields.indices.map(c => readValue(root.getVector(c), schema.fields(c).dataType, i)))
        }
      }
      spark.createDataFrame(rows.asJava, schema)
    } finally {
      reader.close(); allocator.close()
    }
  }

  private def readValue(vec: FieldVector, dt: DataType, i: Int): Any = {
    if (vec.isNull(i)) return null
    (vec, dt) match {
      case (v: BitVector, BooleanType) => v.get(i) == 1
      case (v: TinyIntVector, ByteType) => v.get(i)
      case (v: SmallIntVector, ShortType) => v.get(i)
      case (v: IntVector, IntegerType) => v.get(i)
      case (v: BigIntVector, LongType) => v.get(i)
      case (v: Float4Vector, FloatType) => v.get(i)
      case (v: Float8Vector, DoubleType) => v.get(i)
      case (v: DecimalVector, _: DecimalType) => v.getObject(i)
      case (v: VarCharVector, StringType) => new String(v.get(i), "UTF-8")
      case (v: VarBinaryVector, BinaryType) => v.get(i)
      case (v: DateDayVector, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i)))
      case (v: TimeStampMicroVector, TimestampNTZType) =>
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(v.get(i), 1000000L),
          (Math.floorMod(v.get(i), 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (v: TimeStampMicroTZVector, TimestampType) =>
        val micros = v.get(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case (v: MapVector, MapType(kt, vt, _)) =>
        v.getObject(i).asInstanceOf[java.util.List[_]].asScala.map { e =>
          val m = e.asInstanceOf[java.util.Map[String, AnyRef]]
          fromArrowObject(m.get(MapVector.KEY_NAME), kt) -> fromArrowObject(m.get(MapVector.VALUE_NAME), vt)
        }.toMap
      case (v: StructVector, StructType(fields)) =>
        val m = v.getObject(i).asInstanceOf[java.util.Map[String, AnyRef]]
        Row.fromSeq(fields.toSeq.map(f => fromArrowObject(m.get(f.name), f.dataType)))
      case (v: ListVector, ArrayType(elem, _)) =>
        v.getObject(i).asScala.toSeq.map(x => fromArrowObject(x.asInstanceOf[AnyRef], elem))
      case other => throw new IllegalArgumentException(s"Arrow import unsupported for $dt")
    }
  }

  /** Convert a raw Arrow getObject value to the Spark-facing value. */
  private def fromArrowObject(x: AnyRef, dt: DataType): Any = x match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case other => other
  }
}
