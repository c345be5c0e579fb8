package graft.sources

import java.io.File

import graft.SparkTestHarness
import org.scalatest.funsuite.AnyFunSuite

/** Layout-normalization cache keying: regenerating a fixture must
  * invalidate the cache even when name, length, AND mtime collide (mtime
  * has second granularity — the r15 fingerprint missed a same-second
  * same-length rewrite; the tail CRC closes that).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def writeParquet(path: File, values: Seq[Int]): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-spec").toFile
    values.toDF("v").coalesce(1).write
      .option("compression", "uncompressed")
      .option("parquet.enable.dictionary", "false")
      .mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, path.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  test("fingerprint changes when content changes, even with identical " +
      "name / length / mtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-fp").toFile
    val f = new File(dir, "t.parquet")
    writeParquet(f, 1 to 256)
    val mtime = 1700000000000L
    assert(f.setLastModified(mtime))
    val len1 = f.length
    val fp1 = Layout.fingerprint(Seq(f))

    // regenerate in place: same multiset of values, different order —
    // uncompressed plain encoding keeps the byte LENGTH identical while the
    // data pages (and so the tail CRC) differ
    writeParquet(f, (1 to 256).reverse)
    assert(f.setLastModified(mtime))
    val fp2 = Layout.fingerprint(Seq(f))
    assert(f.length == len1 && f.lastModified == mtime,
      "test precondition: the legacy (name,length,mtime) key collides")
    assert(fp1 != fp2, "content change must invalidate the layout cache")

    // and identical bytes fingerprint identically (cache stays warm)
    val fp3 = Layout.fingerprint(Seq(f))
    assert(fp2 == fp3)
  }
}

/** GeoArrow auto-tagging on export (reference `test_geoarrow.cpp:138-245`):
  * WKB-producing ST_* result columns carry
  * `ARROW:extension:name = geoarrow.wkb` on the Arrow field; scalar ST_*
  * results and plain columns stay untagged; pre-tagged ingested GeoArrow
  * keeps its own metadata.
  */
class GeoArrowExportSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("ST_* geometry results export as geoarrow.wkb; scalars stay untagged") {
    val df = spark.sql(
      "SELECT st_point(1.0, 2.0) AS geom, st_astext(st_point(3.0, 4.0)) AS wkt, " +
        "st_area(st_makeenvelope(0.0, 0.0, 2.0, 2.0)) AS area, 7 AS id")
    val back = ArrowIO.fromArrowStream(spark, ArrowIO.toArrowStream(df))
    def tag(name: String): Option[String] = {
      val f = back.schema(name)
      if (f.metadata.contains("ARROW:extension:name"))
        Some(f.metadata.getString("ARROW:extension:name")) else None
    }
    assert(tag("geom").contains("geoarrow.wkb"),
      "a WKB-producing ST_ result must carry the GeoArrow extension tag")
    assert(tag("wkt").isEmpty && tag("area").isEmpty && tag("id").isEmpty,
      "scalar ST_ results and plain columns stay untagged")
    // the bytes round-trip as real WKB: re-read them with an ST_ accessor
    back.createOrReplaceTempView("geoarrow_back")
    val xy = spark.sql("SELECT st_x(geom) AS x, st_y(geom) AS y FROM geoarrow_back")
      .collect()(0)
    assert(xy.getDouble(0) == 1.0 && xy.getDouble(1) == 2.0)
    spark.catalog.dropTempView("geoarrow_back")
  }

  test("various geometry types tag consistently (test_geoarrow VariousGeometryTypes)") {
    val df = spark.sql(
      "SELECT st_geomfromtext('LINESTRING (0 0, 1 1)') AS line, " +
        "st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS poly, " +
        "st_makeenvelope(0.0, 0.0, 1.0, 1.0) AS env")
    val schema = graft.types.TypeMapping.toArrowSchema(df.schema,
      Set("line", "poly", "env"))
    (0 until 3).foreach { i =>
      assert(schema.getFields.get(i).getMetadata
        .get("ARROW:extension:name") == "geoarrow.wkb")
    }
  }
}
