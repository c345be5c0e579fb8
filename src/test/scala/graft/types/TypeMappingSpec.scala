package graft.types

import org.apache.arrow.vector.types.TimeUnit
import org.apache.arrow.vector.types.pojo.ArrowType
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class TypeMappingSpec extends AnyFunSuite {

  private val atomicTypes: Seq[DataType] = Seq(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType, TimestampNTZType,
    DecimalType(15, 2), DecimalType(38, 6))

  // Exhaustive cross-product: every atomic type nested under array/struct/map.
  private val nestedTypes: Seq[DataType] = for {
    elem <- atomicTypes
    dt <- Seq[DataType](
      ArrayType(elem),
      StructType(Seq(StructField("x", elem), StructField("y", StringType))),
      MapType(StringType, elem),
      ArrayType(StructType(Seq(StructField("inner", ArrayType(elem))))))
  } yield dt

  test("atomic types round-trip Spark -> Arrow -> Spark") {
    atomicTypes.foreach { dt =>
      val schema = StructType(Seq(StructField("c", dt, nullable = true)))
      assert(TypeMapping.fromArrowSchema(TypeMapping.toArrowSchema(schema)) == schema, s"for $dt")
    }
  }

  test("nested types round-trip Spark -> Arrow -> Spark") {
    nestedTypes.foreach { dt =>
      val schema = StructType(Seq(StructField("c", dt, nullable = true)))
      assert(TypeMapping.fromArrowSchema(TypeMapping.toArrowSchema(schema)) == schema, s"for $dt")
    }
  }

  test("nullability round-trips") {
    val schema = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(TypeMapping.fromArrowSchema(TypeMapping.toArrowSchema(schema)) == schema)
  }

  test("reference narrowings: unsigned ints widen, uint64 -> long") {
    assert(TypeMapping.fromArrowType(new ArrowType.Int(8, false)) == ShortType)
    assert(TypeMapping.fromArrowType(new ArrowType.Int(16, false)) == IntegerType)
    assert(TypeMapping.fromArrowType(new ArrowType.Int(32, false)) == LongType)
    // the reference deliberately narrows uint64 to int64 (duckdb_statement.cpp:656-657)
    assert(TypeMapping.fromArrowType(new ArrowType.Int(64, false)) == LongType)
  }

  test("reference quirk: TIME surfaces as timestamp; ns truncates to us") {
    assert(TypeMapping.fromArrowType(
      new ArrowType.Time(TimeUnit.MICROSECOND, 64)) == TimestampNTZType)
    assert(TypeMapping.fromArrowType(
      new ArrowType.Timestamp(TimeUnit.NANOSECOND, null)) == TimestampNTZType)
    assert(TypeMapping.fromArrowType(
      new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")) == TimestampType)
  }

  test("decimal beyond precision 38 is a declared error") {
    intercept[IllegalArgumentException] {
      TypeMapping.fromArrowType(new ArrowType.Decimal(40, 2, 256))
    }
  }
}
