package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Tables.localSession(4)
  val sf: String = "/root/testdata/sf0.001"

  private val tracked =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  sys.addShutdownHook {
    tracked.forEach { p =>
      try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      catch { case _: Throwable => () }
    }
  }

  /** temp dir registered for deletion at JVM exit — suites must use this
    * instead of raw Files.createTempDirectory so repeated test runs don't
    * accumulate garbage under /tmp */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tracked.add(p)
    p.toString
  }
}

trait GraftSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)
  def tempDir(prefix: String): String = TestSpark.tempDir(prefix)
}
