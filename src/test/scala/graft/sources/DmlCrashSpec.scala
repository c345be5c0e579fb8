package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** REAL kill -9 drill for autocommit DML (the r10 verdict's literal "done"
  * criterion): a separate JVM runs a bare UPDATE, gets SIGKILLed inside
  * the journal-to-fold window, and a fresh "bootstrap" JVM must recover the
  * table to exactly the post-image — while the crashed-but-unrecovered
  * table reads as exactly the pre-image. Three processes over one shared
  * warehouse directory; only the filesystem survives between them, like a
  * crashed-and-restarted server.
  */
class DmlCrashSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar").flatMap(m => Seq("--add-opens", s"$m=ALL-UNNAMED"))

  private def child(wh: Path, mode: String): ProcessBuilder = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = (Seq(java, "-Xmx2g") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CrashDml", mode, wh.toString)).asJava
    new ProcessBuilder(cmd).redirectErrorStream(true)
  }

  private def runToEnd(pb: ProcessBuilder): String = {
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"child timed out:\n$out")
    assert(p.exitValue() == 0, s"child failed (rc=${p.exitValue()}):\n$out")
    out
  }

  test("kill -9 between journal and fold: pre-image while down, post-image after recovery") {
    val wh = Files.createTempDirectory("graft-crash-wh")
    val spark = graft.GraftSession.local() // observer only; reads raw parquet paths

    assert(runToEnd(child(wh, "setup")).contains("READY"))
    val preImage = spark.read.parquet(s"$wh/crash_t")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(preImage == Seq(10.0, 20.0, 30.0))

    // Launch the UPDATE and SIGKILL it once the commit journal exists —
    // i.e., inside the window where the post-image is staged and journaled
    // but the base table is not yet folded.
    val journalDir = wh.resolve("_graft_txn_journal")
    val updater = child(wh, "update").start()
    val deadline = System.nanoTime() + 150L * 1000 * 1000 * 1000
    def journalPresent: Boolean = Files.isDirectory(journalDir) && {
      val s = Files.list(journalDir)
      try s.iterator().asScala.exists(_.getFileName.toString.endsWith(".journal"))
      finally s.close()
    }
    while (!journalPresent && System.nanoTime() < deadline && updater.isAlive)
      Thread.sleep(100)
    assert(journalPresent, "update child never reached the journal write")
    updater.destroyForcibly()
    updater.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)

    // Crashed, not yet recovered: the base table is EXACTLY the pre-image
    // (no partial fold), and the journal + staged post-image survive.
    val duringCrash = spark.read.parquet(s"$wh/crash_t")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(duringCrash == Seq(10.0, 20.0, 30.0),
      "crashed statement must leave the base table at the pre-image")
    assert(journalPresent, "journal must survive the crash")

    // Fresh-JVM bootstrap: recovery must redo the fold to the post-image
    // and clear the journal.
    val out = runToEnd(child(wh, "recover"))
    assert(out.contains("REDONE:1"), s"expected one redone entry:\n$out")
    assert(out.contains("ROWS:100.0,200.0,300.0"), s"expected the post-image:\n$out")
    assert(!journalPresent, "recovery must clear the journal")

    // And the files themselves agree (read by the observer session).
    val postImage = spark.read.parquet(s"$wh/crash_t")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(postImage == Seq(100.0, 200.0, 300.0))
  }

  test("two concurrent writer PROCESSES on one warehouse serialize (cross-process fence)") {
    // r11 verdict #3: the in-process CommitLock cannot order two live engine
    // PROCESSES. Two JVMs run `UPDATE ... SET v = v + 1` concurrently with
    // the publish-to-fold window widened to 2 s — without the OS-file-lock
    // fence both read the same pre-image inside the overlap and one
    // increment is silently lost (final +1); with it the statements
    // serialize and BOTH effects survive (final +2).
    val wh = Files.createTempDirectory("graft-conc-wh")
    val spark = graft.GraftSession.local()

    assert(runToEnd(child(wh, "setup")).contains("READY"))
    val a = child(wh, "inc").start()
    val b = child(wh, "inc").start()
    val outA = new String(a.getInputStream.readAllBytes())
    val outB = new String(b.getInputStream.readAllBytes())
    assert(a.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"writer A timed out:\n$outA")
    assert(b.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), s"writer B timed out:\n$outB")
    assert(a.exitValue() == 0, s"writer A failed:\n$outA")
    assert(b.exitValue() == 0, s"writer B failed:\n$outB")

    val finalRows = spark.read.parquet(s"$wh/crash_t")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(finalRows == Seq(12.0, 22.0, 32.0),
      s"both increments must survive in some serial order; got $finalRows\nA:\n$outA\nB:\n$outB")
    // the second-to-finish writer must have observed the first's post-image
    assert(Seq(outA, outB).exists(_.contains("ROWS:12.0,22.0,32.0")),
      s"one writer must observe both increments:\nA:\n$outA\nB:\n$outB")
  }
}
