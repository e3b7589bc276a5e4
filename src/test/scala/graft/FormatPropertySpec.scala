package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

/** Property-style round-trip tests for the gpx format (SURVEY §5 plan):
  * randomized rows (seeded, reproducible) of a mixed schema — nulls,
  * extreme values, NaN/Inf, unicode — must survive write->read
  * bit-exactly across several generations. */
class FormatPropertySpec extends AnyFunSuite {
  private val sp = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("rid", LongType, nullable = false),
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("s", StringType), StructField("b", BooleanType),
    // engineered to engage the delta (monotonic, range > FOR width) and
    // Gorilla-XOR (runs of irrationals + nulls) encodings specifically
    StructField("mono", LongType),
    StructField("drift", DoubleType)))

  private def genRows(seed: Long, n: Int): Seq[Row] = {
    val r = new Random(seed)
    val specialD = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, Double.MinPositiveValue, Double.MaxValue)
    val specialS = Array("", " ", "😀 空 ß", "ab", "\\n", "''\"")
    def opt[A](v: => A): Any = if (r.nextInt(5) == 0) null else v
    (0 until n).map { idx =>
      Row(
        idx.toLong,
        opt(r.nextInt()),
        opt(r.nextLong()),
        opt(if (r.nextInt(4) == 0) specialD(r.nextInt(specialD.length))
        else r.nextDouble() * 2e18 - 1e18),
        opt(r.nextFloat() * 2e9f - 1e9f),
        opt(if (r.nextInt(4) == 0) specialS(r.nextInt(specialS.length))
        else r.alphanumeric.take(r.nextInt(40)).mkString),
        opt(r.nextBoolean()),
        opt(1000000000000L + idx.toLong * 100000000L + r.nextInt(1000)),
        opt(math.Pi * (1 + idx / 16)))
    }
  }

  test("gpx round-trips randomized rows (NaN/Inf, unicode, nulls) x5 seeds") {
    (1L to 5L).foreach { seed =>
      val rows = genRows(seed, 300)
      val dir = Files.createTempDirectory("gpxprop").toString
      val df = sp.createDataFrame(sp.sparkContext.parallelize(rows, 3), schema)
      df.write.format("gpx").mode("overwrite")
        .option("rowGroupRows", "64").save(dir)
      val back = sp.read.format("gpx").load(dir)
      val a = df.orderBy("rid").collect().map(_.toSeq)
      val b = back.orderBy("rid").collect().map(_.toSeq)
      assert(a.length == b.length)
      a.zip(b).foreach { case (ra, rb) =>
        ra.zip(rb).foreach {
          case (x: Double, y: Double) =>
            assert(java.lang.Double.compare(x, y) == 0, s"seed=$seed: $x != $y")
          case (x: Float, y: Float) =>
            assert(java.lang.Float.compare(x, y) == 0, s"seed=$seed: $x != $y")
          case (x, y) => assert(x == y, s"seed=$seed: $x != $y in $ra vs $rb")
        }
      }
    }
  }
}
