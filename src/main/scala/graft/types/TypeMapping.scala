package graft.types

import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Arrow ⇄ Spark type mapping implementing SURVEY.md §1.2 exactly, including
  * the reference's own narrowings (uint64→int64 at
  * `/root/reference/src/duckdb/duckdb_statement.cpp:656-657`, ns→µs
  * truncation `:639-646`, TIME surfaced as timestamp `:638-640`).
  *
  * One deliberate improvement over the reference: its ingest converts
  * Decimal128 via string→double (lossy, `duckdb_server.cpp:563-576`); here
  * decimals map exactly in both directions.
  */
object TypeMapping {

  /** Spark → Arrow (the result-set export direction). */
  def toArrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case _: DayTimeIntervalType => new ArrowType.Duration(TimeUnit.MICROSECOND)
    case NullType => ArrowType.Null.INSTANCE
    case other => throw new IllegalArgumentException(s"No Arrow mapping for $other")
  }

  def toArrowField(name: String, dt: DataType, nullable: Boolean): Field = dt match {
    case ArrayType(elem, containsNull) =>
      new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
        List(toArrowField("element", elem, containsNull)).asJava)
    case StructType(fields) =>
      new Field(name, new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
        fields.map(f => toArrowField(f.name, f.dataType, f.nullable)).toList.asJava)
    case MapType(k, v, valueContainsNull) =>
      val entries = new Field("entries", new FieldType(false, ArrowType.Struct.INSTANCE, null),
        List(toArrowField("key", k, nullable = false),
          toArrowField("value", v, valueContainsNull)).asJava)
      new Field(name, new FieldType(nullable, new ArrowType.Map(false), null), List(entries).asJava)
    case other =>
      new Field(name, new FieldType(nullable, toArrowType(other), null), Nil.asJava)
  }

  /** Arrow extension-type passthrough — the GeoArrow declared-parity shim.
    * The reference preloads DuckDB's spatial extension and exports GEOMETRY
    * columns as GeoArrow (`/root/reference/src/common/gizmosql_library.cpp:
    * 820-827`, `tests/test_geoarrow.py`). Spark has no geometry type, so
    * geometry travels as WKB in a BINARY column whose Spark column metadata
    * carries the Arrow extension keys; export copies every
    * `ARROW:extension:*` key onto the Arrow field and import preserves them
    * back, so a WKB-tagged column round-trips with
    * `ARROW:extension:name = geoarrow.wkb` (+ its CRS metadata) intact and
    * any GeoArrow-aware client reads the stream as geometry. ST_* function
    * evaluation is declared out of scope (ARCHITECTURE.md).
    */
  private val ExtensionKeys =
    Seq("ARROW:extension:name", "ARROW:extension:metadata")

  private def extensionMeta(f: StructField): Map[String, String] =
    ExtensionKeys.flatMap(k =>
      if (f.metadata.contains(k)) Some(k -> f.metadata.getString(k)) else None).toMap

  private def withFieldMeta(f: StructField, extra: Map[String, String]): Field = {
    val base = toArrowField(f.name, f.dataType, f.nullable)
    val meta = extensionMeta(f) ++ extra
    if (meta.isEmpty) base
    else new Field(f.name,
      new FieldType(base.isNullable, base.getType, null, meta.asJava),
      base.getChildren)
  }

  def toArrowSchema(schema: StructType): Schema =
    new Schema(schema.fields.map(f => withFieldMeta(f, Map.empty)).toList.asJava)

  /** Export with GeoArrow auto-tagging: `geometryCols` (WKB-producing
    * ST_* outputs, detected by [[graft.sources.ArrowIO]]) gain
    * `ARROW:extension:name = geoarrow.wkb` unless the column already
    * carries its own extension metadata (ingested GeoArrow wins).
    */
  def toArrowSchema(schema: StructType, geometryCols: Set[String]): Schema =
    new Schema(schema.fields.map { f =>
      val auto =
        if (geometryCols.contains(f.name) && !f.metadata.contains("ARROW:extension:name"))
          Map("ARROW:extension:name" -> "geoarrow.wkb")
        else Map.empty[String, String]
      withFieldMeta(f, auto)
    }.toList.asJava)

  /** Schema export with the Flight SQL column-metadata contract
    * (`/root/reference/tests/test_v1_22_1_features.py:102` — GetTables
    * include_schema carries real NOT NULL and comments): a Spark column
    * COMMENT surfaces as `ARROW:FLIGHT:SQL:REMARKS` on its Arrow field;
    * columns without a comment get NO remarks key, matching the reference.
    * (IS_AUTO_INCREMENT has no Spark counterpart — no sequences — and is
    * deliberately never set.)
    */
  def toArrowSchemaWithRemarks(schema: StructType): Schema =
    new Schema(schema.fields.map { f =>
      val comment = if (f.metadata.contains("comment"))
        Option(f.metadata.getString("comment")).filter(_.nonEmpty) else None
      withFieldMeta(f,
        comment.map("ARROW:FLIGHT:SQL:REMARKS" -> _).toMap)
    }.toList.asJava)

  /** Arrow → Spark (the ingest direction). Mirrors the reference's widenings:
    * unsigned ints widen one step; uint64 narrows to long; ns truncates to µs.
    */
  def fromArrowType(t: ArrowType): DataType = t match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getIsSigned =>
      i.getBitWidth match {
        case 8 => ByteType; case 16 => ShortType; case 32 => IntegerType; case 64 => LongType
      }
    case i: ArrowType.Int => // unsigned: widen (uint64 deliberately narrows to long)
      i.getBitWidth match {
        case 8 => ShortType; case 16 => IntegerType; case 32 => LongType; case 64 => LongType
      }
    case f: ArrowType.FloatingPoint =>
      if (f.getPrecision == FloatingPointPrecision.SINGLE) FloatType else DoubleType
    case d: ArrowType.Decimal =>
      if (d.getPrecision <= 38) DecimalType(d.getPrecision, d.getScale)
      else throw new IllegalArgumentException(s"decimal precision ${d.getPrecision} > 38 unsupported (documented limit)")
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary | _: ArrowType.FixedSizeBinary => BinaryType
    case _: ArrowType.Date => DateType
    case ts: ArrowType.Timestamp =>
      if (ts.getTimezone == null) TimestampNTZType else TimestampType
    case _: ArrowType.Time => TimestampNTZType // reference quirk: TIME surfaces as timestamp
    case _: ArrowType.Duration | _: ArrowType.Interval => DayTimeIntervalType()
    case _: ArrowType.Null => NullType
    case other => throw new IllegalArgumentException(s"No Spark mapping for Arrow $other")
  }

  def fromArrowField(f: Field): StructField = {
    val base = fromArrowFieldBase(f)
    // preserve Arrow extension metadata (GeoArrow WKB tags) into the Spark
    // column metadata so export⇄import round-trips the extension type
    val ext = Option(f.getMetadata).map(_.asScala.toMap).getOrElse(Map.empty)
      .filter { case (k, _) => k.startsWith("ARROW:extension:") }
    if (ext.isEmpty) base
    else base.copy(metadata = ext.foldLeft(new MetadataBuilder()) {
      case (b, (k, v)) => b.putString(k, v)
    }.build())
  }

  private def fromArrowFieldBase(f: Field): StructField = f.getType match {
    case _: ArrowType.List =>
      val elem = fromArrowField(f.getChildren.get(0))
      StructField(f.getName, ArrayType(elem.dataType, elem.nullable), f.isNullable)
    case _: ArrowType.Struct =>
      StructField(f.getName,
        StructType(f.getChildren.asScala.map(fromArrowField).toArray), f.isNullable)
    case _: ArrowType.Map =>
      val entries = f.getChildren.get(0)
      val k = fromArrowField(entries.getChildren.get(0))
      val v = fromArrowField(entries.getChildren.get(1))
      StructField(f.getName, MapType(k.dataType, v.dataType, v.nullable), f.isNullable)
    case _: ArrowType.FixedSizeList =>
      val elem = fromArrowField(f.getChildren.get(0))
      StructField(f.getName, ArrayType(elem.dataType, elem.nullable), f.isNullable)
    case _ =>
      StructField(f.getName, fromArrowType(f.getType), f.isNullable)
  }

  def fromArrowSchema(schema: Schema): StructType =
    StructType(schema.getFields.asScala.map(fromArrowField).toArray)
}
