package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Tables.localSession(4)
  val sf: String = "/root/testdata/sf0.001"
}

trait GraftSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
  def run(name: String) = SparkEntry.queries(name)(spark, sf)
}
