package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.util.Random

/** Differential fuzzing of the gpx format against parquet: the same rows
  * are written to both formats, then a seeded stream of random
  * projection/filter/aggregation queries must return identical results
  * from both scans. One suite exercises, in combination, what the
  * targeted specs cover one at a time: every encoding (RLE / FOR /
  * delta / dict / scaled-decimal / XOR / plain), zone-map skipping at
  * row-group AND pixel granularity (rowGroupRows=1000, pixelRows=250
  * put many boundaries inside the data), filter + projection pushdown,
  * and null/NaN/empty-string/unicode edge values — against Spark's own
  * parquet reader as ground truth.
  */
class GpxFuzzSpec extends GraftSpec {
  private val sp = TestSpark.spark

  private val N = 20000
  private val seed = 20260812

  /** Columns engineered so each encoding path is actually chosen
    * somewhere: monotonic (delta), narrow-range (FOR), constant runs
    * (RLE), low-cardinality strings (dict), random doubles with
    * NaN/±Inf (XOR probe), money-like doubles (scaled-decimal), plus
    * nulls interleaved through everything. */
  private def makeData(): DataFrame = {
    val rnd = new Random(seed)
    val langs = Array("en", "de", "fr", "zh", "ar", "hi")
    val rows = (0 until N).map { i =>
      def nul(every: Int, v: Any): Any = if (i % every == 13) null else v
      Row(
        i.toLong, // id: monotonic -> delta
        nul(7, (rnd.nextInt(200) + 1000).toLong), // narrow -> FOR
        (i / 512).toLong, // long runs -> RLE
        nul(11, langs(rnd.nextInt(langs.length))), // low-card -> dict
        nul(13, i match { // doubles with specials -> XOR/plain
          case x if x % 997 == 0 => Double.NaN
          case x if x % 499 == 0 => Double.PositiveInfinity
          case _ => rnd.nextDouble() * 1e6 - 5e5
        }),
        nul(17, math.round(rnd.nextDouble() * 10000) / 100.0), // scaled
        rnd.nextInt(100), // int
        i % 3 == 0, // boolean
        nul(19, s"s${rnd.nextInt(50)}_${"é中"}${rnd.nextInt(10)}"), // unicode strings
        nul(23, BigDecimal(rnd.nextInt(1000000)) / 100) // decimal(18,2)
      )
    }
    sp.createDataFrame(
      sp.sparkContext.parallelize(rows, 8),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("narrow", LongType),
        StructField("runs", LongType, nullable = false),
        StructField("lang", StringType),
        StructField("x", DoubleType),
        StructField("money", DoubleType),
        StructField("small", IntegerType, nullable = false),
        StructField("flag", BooleanType, nullable = false),
        StructField("s", StringType),
        StructField("dec", DecimalType(18, 2)))))
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map { r =>
      r.toSeq.map {
        case null => "NULL"
        case d: Double => if (d.isNaN) "NaN" else f"$d%.9e"
        case f: Float => f"${f.toDouble}%.9e"
        case b: java.math.BigDecimal => b.stripTrailingZeros.toPlainString
        case x => x.toString
      }.mkString("|")
    }.sorted.toSeq
  }

  test("random projections/filters/aggregations agree with parquet") {
    val data = makeData()
    val gDir = Files.createTempDirectory("fuzz_gpx").toString
    val pDir = Files.createTempDirectory("fuzz_parq").toString
    data.coalesce(2).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").option("pixelRows", "250").save(gDir)
    data.coalesce(2).write.mode("overwrite").parquet(pDir)
    val g = sp.read.format("gpx").load(gDir)
    val p = sp.read.parquet(pDir)
    assert(g.count() == N && p.count() == N)

    val rnd = new Random(seed * 31)
    val allCols = data.columns
    def somePredicate(): org.apache.spark.sql.Column = rnd.nextInt(10) match {
      case 0 => col("id") > rnd.nextInt(N).toLong
      case 1 => col("id").between(
        rnd.nextInt(N / 2).toLong, (N / 2 + rnd.nextInt(N / 2)).toLong)
      case 2 => col("narrow") <= (1000 + rnd.nextInt(200)).toLong
      case 3 => col("runs") === rnd.nextInt(N / 512).toLong
      case 4 => col("lang").isin("en", "de", "zh")
      case 5 => if (rnd.nextBoolean()) col("x").isNull else col("x").isNotNull
      case 6 => col("x") > (rnd.nextDouble() * 1e6 - 5e5)
      case 7 => col("small") < rnd.nextInt(100)
      case 8 => col("s").startsWith(s"s${rnd.nextInt(50)}_")
      case 9 => col("dec") >= BigDecimal(rnd.nextInt(10000))
    }

    for (iter <- 0 until 30) {
      val nPred = rnd.nextInt(3) // 0..2 ANDed predicates
      val preds = Seq.fill(nPred)(somePredicate())
      val proj = rnd.shuffle(allCols.toList)
        .take(1 + rnd.nextInt(allCols.length)).sorted
      val useAgg = rnd.nextInt(3) == 0 && proj.contains("lang")
      def shaped(df: DataFrame): DataFrame = {
        val f = preds.foldLeft(df)((d, c) => d.filter(c))
        if (useAgg)
          f.groupBy(col("lang")).agg(
            count(lit(1)).as("n"),
            sum(col("small")).as("ss"),
            min(col("id")).as("mi"),
            max(col("runs")).as("mr"))
        else f.select(proj.map(col): _*)
      }
      val got = canon(shaped(g))
      val want = canon(shaped(p))
      assert(got == want,
        s"fuzz iter $iter diverged: preds=$preds proj=$proj agg=$useAgg " +
          s"gpx=${got.size} rows parquet=${want.size} rows; " +
          s"first diff: ${got.zipAll(want, "<missing>", "<missing>")
            .find(t => t._1 != t._2)}")
    }
  }

  test("fuzz: pushed top-N sort-key multiset equals the unpruned sort") {
    import sp.implicits._
    val rnd = new Random(20260814)
    for (iter <- 0 until 6) {
      val n = 2000 + rnd.nextInt(8000)
      val useDouble = iter % 2 == 1
      // heavy duplicates, negatives, nulls; doubles add NaN and ±0.0
      val longs: Seq[Option[Long]] = (0 until n).map { _ =>
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.nextInt(40).toLong - 20L)
      }
      val dbls: Seq[Option[Double]] = (0 until n).map { _ =>
        rnd.nextInt(12) match {
          case 0 => None
          case 1 => Some(Double.NaN)
          case 2 => Some(if (rnd.nextBoolean()) 0.0 else -0.0)
          case _ => Some((rnd.nextInt(40) - 20) / 4.0)
        }
      }
      val dir = Files.createTempDirectory("gpx_topn_fuzz").toString
      val df =
        if (useDouble) dbls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("rid", "k")
        else longs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("rid", "k")
      val maybeSorted = if (rnd.nextBoolean()) df.orderBy("k") else df
      var w = maybeSorted.coalesce(1 + rnd.nextInt(3))
        .write.format("gpx").mode("overwrite")
        .option("rowGroupRows", (200 + rnd.nextInt(800)).toString)
      if (rnd.nextBoolean()) w = w.option("sortBy", "k")
      w.save(dir)
      val t = sp.read.format("gpx").load(dir)
      val k = 1 + rnd.nextInt(50)
      val desc = rnd.nextBoolean()
      val got = (if (desc) t.orderBy(col("k").desc) else t.orderBy(col("k")))
        .limit(k).select(col("k")).collect()
        .map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
      // ties make row identity non-deterministic: compare the KEY
      // multiset of the top k against ground truth computed in Scala
      // with Spark's ordering (nulls first ASC / last DESC via reverse;
      // NaN > +Inf; ±0.0 normalized below since Spark treats them equal)
      val all: Seq[Any] =
        if (useDouble) dbls.map(_.map(java.lang.Double.valueOf).orNull)
        else longs.map(_.map(java.lang.Long.valueOf).orNull)
      val cmp: Ordering[Any] = new Ordering[Any] {
        def compare(a: Any, b: Any): Int = (a, b) match {
          case (null, null) => 0
          case (null, _) => -1 // null smallest (ASC nulls first)
          case (_, null) => 1
          case (x: java.lang.Double, y: java.lang.Double) =>
            java.lang.Double.compare(x, y) // NaN largest, -0.0 < 0.0
          case (x: java.lang.Long, y: java.lang.Long) =>
            java.lang.Long.compare(x, y)
          case _ => 0
        }
      }
      val sortedAll = all.sorted(cmp)
      val want = (if (desc) sortedAll.reverse else sortedAll).take(k)
      def keyList(s: Seq[Any]): Seq[String] = s.map {
        case null => "null"
        case d: java.lang.Double if d.isNaN => "NaN"
        case d: java.lang.Double if d == 0.0 => "0" // ±0.0: Spark orders them equal
        case v => v.toString
      }
      assert(keyList(got) == keyList(want),
        s"topN fuzz iter $iter diverged (double=$useDouble desc=$desc k=$k): " +
          s"got=${keyList(got)} want=${keyList(want)}")
    }
  }

  test("top-N prune keeps +0.0 groups tying a -0.0 threshold (tie-break key)") {
    import sp.implicits._
    // Row group 1 holds four -0.0 rows (rids 4-7), row group 2 four +0.0
    // rows (rids 0-3). Under ORDER BY k, rid LIMIT 2 the true answer is
    // rids 0,1 from group 2: Spark orders -0.0 == +0.0, so the rid
    // tie-break decides. An encoding that splits ±0.0 lets the coverage
    // threshold land on -0.0 and prune group 2 — returning rids 4,5.
    val rows = Seq(
      (4L, -0.0), (5L, -0.0), (6L, -0.0), (7L, -0.0),
      (0L, 0.0), (1L, 0.0), (2L, 0.0), (3L, 0.0),
      (8L, 1.0), (9L, 1.0), (10L, 2.0), (11L, 2.0))
    val dir = Files.createTempDirectory("gpx_topn_zero").toString
    rows.toDF("rid", "k").coalesce(1)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "4").save(dir)
    val t = sp.read.format("gpx").load(dir)
    val got = t.orderBy(col("k"), col("rid")).limit(2)
      .select("rid").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L), s"±0.0 tie-break prune returned rids $got")
    // mirror: DESC NULLS LAST with a -0.0 group above the +0.0 threshold
    val gotDesc = t.orderBy(col("k").desc, col("rid")).limit(2)
      .select("rid").as[Long].collect().toSeq
    assert(gotDesc == Seq(10L, 11L), s"desc ±0.0 prune returned $gotDesc")
  }
}
