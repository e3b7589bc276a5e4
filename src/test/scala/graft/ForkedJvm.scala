package graft

import java.io.File
import java.nio.file.Files

/** Fork a real child JVM running a test-tree main on the current test
  * classpath — the cross-PROCESS proof harness. Thread-based fuzz shares
  * one JVM's lock table and memory model; O_EXCL creates, renames and
  * conditional puts are OS primitives whose semantics only a second
  * process actually exercises (the reference gets its cross-process
  * guarantees from a daemon, proto/transaction.proto:33-48 — ours must
  * come from the filesystem primitives themselves). */
object ForkedJvm {
  // mirrors build.sbt's jdk17AddOpens (Spark 4.x catalyst on JDK 17)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  final case class Handle(process: Process, log: File) {
    def logText: String =
      try new String(Files.readAllBytes(log.toPath))
      catch { case _: Throwable => "" }

    /** wait for clean exit; dump the child's log on timeout/failure */
    def awaitOk(timeoutSec: Long = 300): Unit = {
      val done = process.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) process.destroyForcibly()
      assert(done,
        s"forked JVM timed out after ${timeoutSec}s; log tail:\n${logText.takeRight(4000)}")
      assert(process.exitValue() == 0,
        s"forked JVM exited ${process.exitValue()}; log tail:\n${logText.takeRight(4000)}")
    }
  }

  /** launch `mainClass` (test tree) in a fresh JVM; stdout+stderr go to a
    * temp log file (never a pipe — a chatty child must not block). */
  def start(mainClass: String, args: Seq[String]): Handle = {
    val java = new File(new File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val log = File.createTempFile("forkedjvm-", ".log")
    // Test/fork := true, so java.class.path IS the real test classpath
    val cmd = (Seq(java) ++ addOpens ++ Seq("-Xmx1g", "-cp",
      System.getProperty("java.class.path"), mainClass)) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    Handle(pb.start(), log)
  }
}
