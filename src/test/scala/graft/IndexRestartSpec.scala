package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[IndexRestartMain]] as two real JVM processes: the persisted
  * IVF-PQ index must serve a later session's external-query batch
  * bit-equal to the build session, with zero retraining — the
  * build-once / persist / search-forever lifecycle a production ANN
  * deployment runs. (A same-JVM reload spec exists in OpsSpec; the
  * process boundary here is what proves nothing rides along in memory.) */
class IndexRestartSpec extends AnyFunSuite {

  test("persisted IVF-PQ index serves a brand-new JVM bit-equal") {
    val work = Files.createTempDirectory("graft-ixrestart").toString
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def run(mode: String): (Int, String) = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
        "-cp", sys.props("java.class.path"),
        "graft.IndexRestartMain", mode, work)
      val out = new StringBuilder
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val src = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
      try src.getLines().foreach(l => out.append(l).append('\n'))
      finally src.close()
      (p.waitFor(), out.toString)
    }
    val (wc, wout) = run("write")
    assert(wc == 0 && wout.contains("WRITE_OK"),
      s"index build process failed:\n${wout.takeRight(4000)}")
    val (rc, rout) = run("read")
    assert(rc == 0 && rout.contains("RESTART_OK"),
      s"restarted JVM lost or corrupted the persisted index:\n${rout.takeRight(4000)}")
  }
}
