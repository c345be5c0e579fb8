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
