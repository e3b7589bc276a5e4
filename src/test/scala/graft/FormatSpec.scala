package graft

import graft.format.{GpxFileReader, GpxFormat}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.{Date, Timestamp}

class FormatSpec extends GraftSpec {
  private val sp = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("gpx").toString

  test("round-trip all supported types incl. nulls") {
    import sp.implicits._
    val df = sp.createDataFrame(sp.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1, 10L, 1.5, 2.5f, "alpha", true,
        Date.valueOf("2020-01-01"), Timestamp.valueOf("2020-01-01 12:34:56.789"),
        BigDecimal("12345.67"), Array[Byte](1, 2, 3), 7.toShort, 3.toByte),
      org.apache.spark.sql.Row(2, null, null, null, null, null,
        null, null, null, null, null, null),
      org.apache.spark.sql.Row(3, 30L, -1.5, -2.5f, "beta", false,
        Date.valueOf("1999-12-31"), Timestamp.valueOf("1999-12-31 23:59:59.999"),
        BigDecimal("-0.01"), Array[Byte](), 8.toShort, 4.toByte))),
      StructType(Seq(
        StructField("i", IntegerType), StructField("l", LongType),
        StructField("d", DoubleType), StructField("f", FloatType),
        StructField("s", StringType), StructField("b", BooleanType),
        StructField("dt", DateType), StructField("ts", TimestampType),
        StructField("dec", DecimalType(18, 2)), StructField("bin", BinaryType),
        StructField("sh", ShortType), StructField("by", ByteType))))
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("i").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    })
    val b = back.orderBy("i").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    })
    assert(a.toSeq == b.toSeq)
  }

  test("batch commit protocol: zombie attempts and uncommitted output stay invisible") {
    import graft.format.{GpxBatchWrite, GpxTable}
    val schema = StructType(Seq(StructField("x", LongType)))
    val dir = tmp()
    val conf = new Configuration()
    val bw = new GpxBatchWrite(schema, dir, false, 1024, 256, -1L, None)
    val factory = bw.createBatchWriterFactory(null)
    val w1 = factory.createWriter(0, 1L)
    w1.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    val winner = w1.commit()
    // a zombie attempt of the same partition: stages its own file, its
    // task-level commit message is never delivered to the driver
    val zombie = factory.createWriter(0, 2L)
    zombie.write(org.apache.spark.sql.catalyst.InternalRow(99L))
    zombie.commit()
    // BEFORE driver commit: nothing visible (all-or-nothing batch)
    assert(GpxTable.listFiles(Seq(dir), conf).isEmpty)
    bw.commit(Array(winner))
    val back = sp.read.format("gpx").load(dir).collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L), back.toSeq)
    // staging swept, zombie output gone
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_batch_")))
  }

  test("vacuum sweeps orphaned staging dirs, spares live ones and data") {
    import graft.format.GpxMaintenance
    val dir = tmp()
    val sp2 = sp
    import sp2.implicits._
    Seq(1L, 2L).toDF("x").coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    // a crash leftover: staged file whose writer died before commit
    val orphan = new java.io.File(dir, "_batch_deadbeef")
    orphan.mkdirs()
    val partial = new java.io.File(orphan, "part-0-1.gpx")
    java.nio.file.Files.write(partial.toPath, Array[Byte](1, 2, 3))
    partial.setLastModified(System.currentTimeMillis() - 3600_000)
    orphan.setLastModified(System.currentTimeMillis() - 3600_000)
    // a LIVE staging dir (fresh mtime) must be spared
    val live = new java.io.File(dir, "_batch_cafebabe")
    live.mkdirs()
    // a crashed delete-sidecar writer's temp (publish = rename, so any
    // aged .tmp.* in _del is dead); a LIVE sidecar must be spared
    val delDir = new java.io.File(dir, "_del")
    delDir.mkdirs()
    val tmpSidecar = new java.io.File(delDir, ".tmp.x.gpx.t-1.abcd1234.del")
    java.nio.file.Files.write(tmpSidecar.toPath, Array[Byte](9))
    tmpSidecar.setLastModified(System.currentTimeMillis() - 3600_000)
    val liveSidecar = new java.io.File(delDir, "x.gpx.t-1.abcd1234.del")
    java.nio.file.Files.write(liveSidecar.toPath, Array[Byte](9))
    liveSidecar.setLastModified(System.currentTimeMillis() - 3600_000)
    val swept = GpxMaintenance.vacuum(dir, ttlMs = 600_000)
    assert(swept.exists(_.endsWith("_batch_deadbeef")), swept)
    assert(!orphan.exists() && live.exists())
    assert(!tmpSidecar.exists(), "aged sidecar temp must be swept")
    assert(liveSidecar.exists(), "published sidecars are never swept")
    assert(sp.read.format("gpx").load(dir).count() == 2)
  }

  test("round-trip lineitem sf0.001 exactly (timestamp_ntz included)") {
    val li = Tables.lineitem(sp, sf)
    val dir = tmp()
    li.write.format("gpx").mode("overwrite").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.count() == li.count())
    assert(back.schema == li.schema)
    // exact content compare
    assert(back.exceptAll(li).count() == 0)
    assert(li.exceptAll(back).count() == 0)
  }

  test("column pruning and filter pushdown appear in the plan") {
    val li = Tables.lineitem(sp, sf)
    val dir = tmp()
    li.write.format("gpx").mode("overwrite").save(dir)
    val q = sp.read.format("gpx").load(dir)
      .filter(col("l_quantity") < 5)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GpxScan[l_orderkey,l_quantity]") ||
      plan.contains("l_orderkey,l_quantity"), plan)
    assert(q.count() == li.filter(col("l_quantity") < 5).count())
  }

  test("zone-map skipping prunes row groups on sorted data") {
    val li = Tables.lineitem(sp, sf).orderBy("l_orderkey")
    val dir = tmp()
    li.coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "500").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    assert(footer.rowGroups.length > 5)
    // a selective key predicate must keep only a few row groups
    val hi = GreaterThan("l_orderkey", 1400L)
    val kept = footer.rowGroups.count(GpxFileReader.mayMatch(hi, footer.schema, _))
    assert(kept < footer.rowGroups.length / 2,
      s"kept $kept of ${footer.rowGroups.length}")
    // and results are still correct end-to-end
    val got = sp.read.format("gpx").load(dir)
      .filter(col("l_orderkey") > 1400L).count()
    val want = Tables.lineitem(sp, sf).filter(col("l_orderkey") > 1400L).count()
    assert(got == want)
  }

  test("RLE and dictionary encodings engage and decode correctly") {
    import sp.implicits._
    val df = (0 until 10000)
      .map(i => (i / 1000, if (i % 2 == 0) "even" else "odd", i.toLong))
      .toDF("run_int", "dict_str", "plain_long")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    val encs = footer.rowGroups.head.chunks.map(_.encoding)
    assert(encs(0) == GpxFormat.EncRleLong)
    assert(encs(1) == GpxFormat.EncDictString)
    val back = sp.read.format("gpx").load(dir)
    assert(back.agg(sum("plain_long")).head.getLong(0) ==
      (0 until 10000).map(_.toLong).sum)
    val before = GpxFileReader.dictColumnsFilled.get()
    assert(back.filter($"dict_str" === "even").count() == 5000)
    // the dict column rode Spark's dictionary ColumnVector (encoded-vector
    // fast path), not per-row byte materialization
    assert(GpxFileReader.dictColumnsFilled.get() > before)
  }

  test("VECTOR (array<float>) columns round-trip incl. null arrays/elements") {
    import sp.implicits._
    val df = Seq(
      (0, Some(Seq(Some(1.5f), Some(-2.5f), None))),
      (1, None),
      (2, Some(Seq.empty[Option[Float]]))).toDF("id", "vec")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    // whole embeddings table
    val emb = Tables.embeddings(sp, sf)
    val dir2 = tmp()
    emb.write.format("gpx").mode("overwrite").save(dir2)
    val back2 = sp.read.format("gpx").load(dir2)
    assert(back2.count() == emb.count())
    assert(back2.exceptAll(emb).count() == 0)
  }

  test("footer-proven containsNull=false narrows VECTOR reads; null elements keep it nullable") {
    import sp.implicits._
    val conf = new Configuration()
    // 1) no null elements anywhere: the footer claims the column, the
    //    inferred schema narrows to containsNull=false, and the vector
    //    kernels' STATIC null-gate engages on the scan's resolved output
    val clean = Seq((0, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0))).toDF("id", "vec")
    val dir = tmp()
    clean.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    assert(GpxFileReader.readFooter(file, conf).noNullElemCols == Seq("vec"))
    val back = sp.read.format("gpx").load(dir)
    assert(back.schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = false))
    val attr = back.queryExecution.analyzed.output.find(_.name == "vec").get
    assert(!org.apache.spark.sql.graft.VectorKernels.elemsNullable(attr),
      "static null-gate must engage on a claimed gpx-read array")
    assert(back.select(graft.functions.VectorFunctions
        .cos_sim(col("vec"), col("vec")).as("c"))
      .collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))

    // 2) a null ELEMENT voids the claim: schema stays nullable and the
    //    kernel still null-propagates (correctness not given back)
    val dirty = Seq((0, Seq[Option[Double]](Some(1.0), None)),
      (1, Seq[Option[Double]](Some(2.0), Some(3.0)))).toDF("id", "vec")
    val dir2 = tmp()
    dirty.coalesce(1).write.format("gpx").mode("overwrite").save(dir2)
    val file2 = graft.format.GpxTable.listFiles(Seq(dir2), conf).head
    assert(GpxFileReader.readFooter(file2, conf).noNullElemCols.isEmpty)
    val back2 = sp.read.format("gpx").load(dir2)
    assert(back2.schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = true))
    val sims = back2.orderBy("id").select(graft.functions.VectorFunctions
      .cos_sim(col("vec"), col("vec")).as("c")).collect()
    assert(sims(0).isNullAt(0), "null element must null-propagate")
    assert(math.abs(sims(1).getDouble(0) - 1.0) < 1e-12)

    // 3) a table mixing a claimed file with an unclaimed one stays
    //    conservatively nullable (claims intersect across files)
    val mixed = tmp()
    clean.coalesce(1).write.format("gpx").mode("overwrite").save(mixed)
    val src = new java.io.File(graft.format.GpxTable
      .listFiles(Seq(dir2), conf).head.stripPrefix("file:"))
    java.nio.file.Files.copy(src.toPath,
      java.nio.file.Paths.get(mixed, "extra-dirty.gpx"))
    val back3 = sp.read.format("gpx").load(mixed)
    assert(back3.schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = true))
    assert(back3.count() == 4)

    // 4) byte-copy compaction carries the claim through (intersection)
    val two = tmp()
    (0 until 100).map(i => (i, Seq(i.toDouble, i + 0.5))).toDF("id", "vec")
      .repartition(2).write.format("gpx").mode("overwrite").save(two)
    assert(graft.format.GpxTable.listFiles(Seq(two), conf).size >= 2)
    val cdir = tmp()
    graft.format.GpxCompactor.compact(two, cdir, conf)
    val cfile = graft.format.GpxTable.listFiles(Seq(cdir), conf).head
    assert(GpxFileReader.readFooter(cfile, conf).noNullElemCols == Seq("vec"))
    assert(sp.read.format("gpx").load(cdir).schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = false))
  }

  test("negative zero never prunes wrongly: zero bounds cover both zeros") {
    import sp.implicits._
    val dir = tmp()
    // max of the segment is -0.0 under primitive comparison; the reader
    // prunes with Double.compare's total order (-0.0 < 0.0), so an
    // unnormalized bound would prune `>= 0.0` — which -0.0 satisfies
    // under Spark's IEEE predicate evaluation
    Seq(-5.0, -0.0).toDF("v").coalesce(1)
      .write.format("gpx").mode("overwrite").save(dir)
    val t = sp.read.format("gpx").load(dir)
    assert(t.filter(col("v") >= 0.0).count() == 1,
      "-0.0 row lost to zone-map pruning")
    assert(t.filter(col("v") === 0.0).count() == 1)
    // and the mirror: min = +0.0 stored as -0.0 must not break <= -0.0
    val dir2 = tmp()
    Seq(0.0, 5.0).toDF("v").coalesce(1)
      .write.format("gpx").mode("overwrite").save(dir2)
    assert(sp.read.format("gpx").load(dir2)
      .filter(col("v") <= -0.0).count() == 1)
    // float path gets the same normalization
    val dir3 = tmp()
    Seq(-5.0f, -0.0f).toDF("v").coalesce(1)
      .write.format("gpx").mode("overwrite").save(dir3)
    assert(sp.read.format("gpx").load(dir3)
      .filter(col("v") >= 0.0f).count() == 1)
  }

  test("a schema whose DDL exceeds the writeUTF cap round-trips (wide-table footer)") {
    val conf = new Configuration()
    val wide = StructType((0 until 2500).map(i =>
      StructField(s"really_quite_a_long_column_name_number_$i", LongType)))
    assert(wide.toDDL.length > 65535, "fixture must exceed the cap")
    val dir = tmp()
    val file = s"$dir/wide.gpx"
    val w = new graft.format.GpxFileWriter(file, wide, conf)
    w.addRow(org.apache.spark.sql.catalyst.InternalRow(
      (0 until 2500).map(_.toLong): _*))
    w.close()
    val footer = GpxFileReader.readFooter("file:" + file, conf)
    assert(footer.schema == wide)
    val back = sp.read.format("gpx").load(dir)
    assert(back.count() == 1)
    assert(back.select("really_quite_a_long_column_name_number_2499")
      .head.getLong(0) == 2499L)
  }

  test("a narrowed (containsNull=false) table still accepts ordinary nullable-element appends") {
    import sp.implicits._
    val dir = tmp()
    Seq((0, Seq(1.0, 2.0))).toDF("id", "vec")
      .write.format("gpx").mode("overwrite").save(dir)
    assert(sp.read.format("gpx").load(dir).schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = false))
    // the appended df carries the DEFAULT containsNull=true schema even
    // though it holds no null elements — the overwhelmingly common case
    Seq((1, Seq(3.0, 4.0))).toDF("id", "vec")
      .write.format("gpx").mode("append").save(dir)
    assert(sp.read.format("gpx").load(dir).orderBy("id")
      .collect().map(_.getSeq[Double](1)).toSeq == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    // still narrowed after the clean append
    assert(sp.read.format("gpx").load(dir).schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = false))
    // an append that DOES hold a null element must both succeed and
    // flip the inferred schema back to nullable
    Seq((2, Seq[Option[Double]](Some(5.0), None))).toDF("id", "vec")
      .write.format("gpx").mode("append").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.schema("vec").dataType ==
      ArrayType(DoubleType, containsNull = true))
    assert(back.count() == 3)
  }

  test("chunk cache: warm re-scan reads zero data bytes; a rewrite purges; memory stays bounded") {
    import sp.implicits._
    val CC = GpxFileReader.ChunkCache
    val conf = new Configuration()
    val oldBudget = CC.budgetBytes
    try {
      val dir = tmp()
      (0 until 20000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .coalesce(1).write.format("gpx").mode("overwrite").save(dir)
      val fileUri = graft.format.GpxTable.listFiles(Seq(dir), conf).head
      val filePath = java.nio.file.Paths.get(fileUri.stripPrefix("file:"))
      def age(ms: Long): Unit = java.nio.file.Files.setLastModifiedTime(filePath,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ms))
      age(10000) // out of the mtime tick -> segments become cacheable
      CC.clear()
      def scan(): Double =
        sp.read.format("gpx").load(dir).agg(sum("v")).head.getDouble(0)
      val cold = scan()
      val bytesAfterCold = GpxFileReader.dataBytesRead.get()
      assert(bytesAfterCold > 0)
      val hits0 = CC.hits.get()
      val warm = scan()
      assert(warm == cold)
      assert(GpxFileReader.dataBytesRead.get() == bytesAfterCold,
        "warm re-scan performed filesystem data reads")
      assert(CC.hits.get() > hits0)

      // an in-place rewrite (new len/mtime) must purge, not serve stale
      val w = new graft.format.GpxFileWriter(fileUri, StructType(Seq(
        StructField("id", LongType), StructField("v", DoubleType))), conf)
      (0 until 100).foreach(i => w.addRow(
        org.apache.spark.sql.catalyst.InternalRow(i.toLong, i * 3.0)))
      w.close()
      age(5000)
      graft.format.GpxFileReader.FooterCache.clear() // planning sees the rewrite
      assert(scan() == (0 until 100).map(_ * 3.0).sum)

      // bounded memory under a stress loop: far more data than budget
      CC.budgetBytes = 256 * 1024
      CC.clear()
      val big = tmp()
      (0 until 20000).map(i => (i.toLong, "x" * 100 + i)).toDF("id", "s")
        .coalesce(1).write.format("gpx").mode("overwrite").save(big)
      val bigFile = java.nio.file.Paths.get(graft.format.GpxTable
        .listFiles(Seq(big), conf).head.stripPrefix("file:"))
      java.nio.file.Files.setLastModifiedTime(bigFile,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
      (0 until 3).foreach { _ =>
        sp.read.format("gpx").load(big).agg(count(lit(1))).head
      }
      assert(CC.retainedBytes <= 256 * 1024,
        s"chunk cache holds ${CC.retainedBytes} bytes over the 256 KiB budget")
    } finally {
      CC.budgetBytes = oldBudget
      CC.clear()
    }
  }

  test("wide Decimal(38,10) round-trips (Int128 analog)") {
    import sp.implicits._
    val df = Seq(
      (0, "123456789012345678901234567.8901234567"),
      (1, "-0.0000000001"), (2, "0"), (3, null))
      .toDF("id", "decs")
      .select(col("id"), col("decs").cast(DecimalType(38, 10)).as("dec"))
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.schema("dec").dataType == DecimalType(38, 10))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    // filters on wide decimals stay correct (no zone-map support => no skip)
    assert(back.filter(col("dec") > 0).count() == 1)
  }

  test("FOR packing engages on narrow-range ints and round-trips") {
    import sp.implicits._
    val df = (0 until 5000).map(i => (i % 100 + 1000000L, i.toLong * 1000000L))
      .toDF("narrow", "wide")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    assert(footer.rowGroups.head.chunks(0).encoding == GpxFormat.EncForPacked)
    val back = sp.read.format("gpx").load(dir)
    assert(back.agg(sum("narrow"), sum("wide")).head.toSeq ==
      df.agg(sum("narrow"), sum("wide")).head.toSeq)
  }

  test("aggregate pushdown answers MIN/MAX/COUNT from footer stats") {
    val li = Tables.lineitem(sp, sf)
    val dir = tmp()
    li.write.format("gpx").mode("overwrite").save(dir)
    val q = sp.read.format("gpx").load(dir)
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_suppkey")),
        count(col("l_quantity")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GpxStatsScan"), plan)
    assert(q.head.toSeq == li.agg(count(lit(1)), min(col("l_orderkey")),
      max(col("l_suppkey")), count(col("l_quantity"))).head.toSeq)
    // double min/max must NOT take the stats path (NaN chunks make footer
    // float stats unreliable, invisible at planning time)
    val qd = sp.read.format("gpx").load(dir).agg(max(col("l_extendedprice")))
    assert(!qd.queryExecution.executedPlan.toString.contains("GpxStatsScan"))
    assert(qd.head.toSeq == li.agg(max(col("l_extendedprice"))).head.toSeq)
    // grouped/filtered aggregates must NOT take the stats path
    val q2 = sp.read.format("gpx").load(dir)
      .filter(col("l_quantity") > 5).agg(min(col("l_orderkey")))
    assert(!q2.queryExecution.executedPlan.toString.contains("GpxStatsScan"))
    assert(q2.head.toSeq == li.filter(col("l_quantity") > 5)
      .agg(min(col("l_orderkey"))).head.toSeq)
  }

  test("scaled-double encoding engages on fixed-point measure columns") {
    val li = Tables.lineitem(sp, sf)
    val dir = tmp()
    li.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    val priceIdx = footer.schema.fieldIndex("l_extendedprice")
    assert(footer.rowGroups.head.chunks(priceIdx).encoding ==
      GpxFormat.EncScaledDouble)
    // exact-sum equality proves bit-exact decode
    val a = sp.read.format("gpx").load(dir)
      .agg(sum(graft.Det.dec(col("l_extendedprice")))).head.getDecimal(0)
    val b = li.agg(sum(graft.Det.dec(col("l_extendedprice")))).head.getDecimal(0)
    assert(a == b)
  }

  test("NaN rows survive range predicates (NaN sorts above +Inf in Spark)") {
    import sp.implicits._
    // one row group holds only (NaN, huge) values; zone maps must not
    // prune it for col > finite-threshold predicates
    val df = ((0 until 100).map(i => (i, i.toDouble)) :+ (100, Double.NaN))
      .toDF("id", "x")
    val dir = tmp()
    df.orderBy("id").coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "50").save(dir)
    val back = sp.read.format("gpx").load(dir)
    // Spark semantics: NaN > 1e9 is TRUE
    assert(back.filter(col("x") > 1e9).count() == 1)
    assert(back.filter(col("x") > 98.5).count() == 2) // 99.0 and NaN
    assert(back.filter(col("x") < 5.0).count() == 5)
  }

  test("bucketed writes + bucket pruning on point lookups") {
    val o = Tables.orders(sp, sf)
    val dir = tmp()
    o.repartition(4).write.format("gpx").mode("overwrite")
      .option("bucketBy", "o_orderkey").option("numBuckets", "8")
      .option("rowGroupRows", "200").save(dir)
    val back = sp.read.format("gpx").load(dir)
    // full-table correctness through the bucketed layout
    assert(back.count() == o.count())
    assert(back.exceptAll(o).count() == 0)
    // point lookup plans only the key's bucket files
    val conf = new Configuration()
    val allFiles = graft.format.GpxTable.listFiles(Seq(dir), conf)
    val lookups = back.filter(col("o_orderkey") === 42L)
    val parts = lookups.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions
    val touchedFiles = parts.map(_.asInstanceOf[graft.format.GpxInputPartition].path).distinct
    val expectedBucket = graft.format.GpxTable.bucketOf(42L, 8)
    assert(touchedFiles.forall(f =>
      graft.format.GpxTable.bucketOfFile(f).contains(expectedBucket)),
      s"touched $touchedFiles")
    assert(touchedFiles.size < allFiles.size)
    // and the lookup is correct
    assert(lookups.count() == o.filter(col("o_orderkey") === 42L).count())
  }

  test("runtime filtering (DPP analog): join keys injected into the scan") {
    import sp.implicits._
    val fact = Tables.orders(sp, sf)
    val dir = tmp()
    fact.orderBy("o_custkey").coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "100").save(dir)
    val dim = Tables.customer(sp, sf).filter(col("c_custkey") < 5)
    val before = graft.format.GpxScan.runtimeFilterCalls.get()
    val joined = sp.read.format("gpx").load(dir)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
    val got = joined.count()
    val want = fact.join(dim, col("o_custkey") === col("c_custkey")).count()
    assert(got == want)
    // whether Spark injected runtime filters is plan-dependent; if it did,
    // results above prove pruning stayed correct. Record observability:
    info(s"runtime filter invocations: ${graft.format.GpxScan.runtimeFilterCalls.get() - before}")
  }

  test("footer column stats flow into Catalyst attributeStats for CBO") {
    import sp.implicits._
    val df = (0 until 5000)
      .map(i => (i.toLong, i % 100, if (i % 10 == 3) null else s"v$i"))
      .toDF("id", "grp", "s")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    val q = sp.read.format("gpx").load(dir)
    val rel = q.queryExecution.optimizedPlan
    val stats = rel.stats
    assert(stats.rowCount.contains(BigInt(5000)), s"rowCount=${stats.rowCount}")
    val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName.contains("id") && byName.contains("grp"), byName.keys)
    assert(byName("id").min.contains(0L) && byName("id").max.contains(4999L),
      byName("id"))
    assert(byName("grp").min.contains(0) && byName("grp").max.contains(99))
    assert(byName("s").nullCount.contains(BigInt(500)), byName("s"))
    // pruned scans report stats over the KEPT row groups only
    val q2 = sp.read.format("gpx").load(dir).filter(col("id") >= 4000L)
    val s2 = q2.queryExecution.optimizedPlan.collectLeaves().head.stats
    assert(s2.rowCount.exists(_ <= BigInt(1000)), s2.rowCount)
    val mn2 = s2.attributeStats.collectFirst {
      case (a, cs) if a.name == "id" => cs.min }.flatten
    assert(mn2.contains(4000L), mn2)
  }

  test("compaction propagates the footer sort claim; mixed inputs clear it") {
    import sp.implicits._
    val conf = new Configuration()
    def sortedByOf(dir: String): Seq[Seq[String]] =
      graft.format.GpxTable.listFiles(Seq(dir), conf)
        .map(f => GpxFileReader.readFooter(f, conf).sortedBy)
    val dir = tmp()
    (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("sortBy", "id").option("rowGroupRows", "500").save(dir)
    (5000 until 9000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("append")
      .option("rowGroupRows", "500").save(dir) // spec persisted: still sorted
    assert(sortedByOf(dir) == Seq(Seq("id"), Seq("id")))
    val out = tmp()
    graft.format.GpxCompactor.compact(dir, out, conf)
    assert(sortedByOf(out).nonEmpty && sortedByOf(out).forall(_ == Seq("id")),
      s"compacted claim: ${sortedByOf(out)}")
    // every compacted row group is still internally ordered
    val ordered = sp.read.format("gpx").load(out).select(col("id")).rdd
      .mapPartitions(it => Iterator.single(
        it.map(_.getLong(0)).foldLeft((Long.MinValue, true)) {
          case ((prev, ok), v) => (v, ok && v >= prev) }._2))
      .collect()
    assert(ordered.forall(identity))
    // a claimless (pre-spec) file in the mix clears the compacted claim
    val dir2 = tmp()
    (0 until 2000).map(i => (i.toLong, "x")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "500").save(dir2) // no sort spec yet
    (2000 until 4000).map(i => (i.toLong, "y")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("append")
      .option("sortBy", "id").option("rowGroupRows", "500").save(dir2)
    val out2 = tmp()
    graft.format.GpxCompactor.compact(dir2, out2, conf)
    assert(sortedByOf(out2).forall(_.isEmpty),
      s"mixed-input compaction must not claim order: ${sortedByOf(out2)}")
  }

  test("ANALYZE (STAT analog): NDV flows to CBO, mutations drop it, never stale") {
    import sp.implicits._
    val dir = tmp()
    (0 until 10000).map(i => (i.toLong, (i % 137).toLong, s"v${i % 50}"))
      .toDF("id", "grp", "s")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    val ndv = graft.format.GpxMaintenance.analyze(sp, dir,
      sp.sparkContext.hadoopConfiguration)
    // approximate NDV (2% rsd) — sanity bands, not exact equality
    assert(math.abs(ndv("id") - 10000) <= 400, ndv)
    assert(math.abs(ndv("grp") - 137) <= 10, ndv)
    assert(math.abs(ndv("s") - 50) <= 5, ndv)
    def distinctOf(colName: String): Option[BigInt] = {
      val stats = sp.read.format("gpx").load(dir)
        .queryExecution.optimizedPlan.stats
      stats.attributeStats.collectFirst {
        case (a, cs) if a.name == colName => cs }.flatMap(_.distinctCount)
    }
    val got = distinctOf("grp")
    assert(got.exists(v => (v - 137).abs <= 10), s"grp NDV via CBO: $got")
    // any mutation invalidates the stamp: stats drop out, never serve stale
    (10000 until 11000).map(i => (i.toLong, 999L, "w")).toDF("id", "grp", "s")
      .coalesce(1).write.format("gpx").mode("append").save(dir)
    assert(distinctOf("grp").isEmpty, "stale NDV must not be served")
    // re-analyze restores service under the new token
    graft.format.GpxMaintenance.analyze(sp, dir,
      sp.sparkContext.hadoopConfiguration)
    assert(distinctOf("grp").exists(v => (v - 138).abs <= 10))
  }

  test("STAT on a token-less table: listing-stamped, external edits drop it") {
    import sp.implicits._
    import org.apache.hadoop.fs.Path
    val dir = tmp()
    val conf = sp.sparkContext.hadoopConfiguration
    (0 until 5000).map(i => (i.toLong, (i % 41).toLong)).toDF("id", "grp")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    // simulate a legacy / externally-written table: strip version tokens
    val fs = new Path(dir).getFileSystem(conf)
    Seq("_version", "_vdata").foreach { f =>
      val p = new Path(dir, f); if (fs.exists(p)) fs.delete(p, false)
    }
    graft.format.GpxMaintenance.analyze(sp, dir, conf)
    // STAT must NOT have opted the table into token discipline
    assert(!fs.exists(new Path(dir, "_version")),
      "STAT must not seed a version token on a token-less table")
    def grpNdv(): Option[BigInt] =
      sp.read.format("gpx").load(dir)
        .queryExecution.optimizedPlan.stats.attributeStats.collectFirst {
          case (a, cs) if a.name == "grp" => cs }.flatMap(_.distinctCount)
    assert(grpNdv().exists(v => (v - 41).abs <= 5), s"listing-stamped NDV: ${grpNdv()}")
    // an EXTERNAL mutation (no token bump, file added behind gpx's back)
    // changes the listing: the digest mismatches and stats drop out
    val victim = fs.listStatus(new Path(dir))
      .find(_.getPath.getName.endsWith(".gpx")).get.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, victim, fs,
      new Path(dir, "external_copy.gpx"), false, conf)
    assert(grpNdv().isEmpty, "stale listing-stamped NDV must not be served")
    // a corrupt sidecar degrades to no stats, never a planning crash
    val cs = new Path(dir, "_colstats")
    val out = fs.create(cs, true)
    out.write("listing:deadbeef\n5000\n%zz-bad-escape\t41\n".getBytes("UTF-8"))
    out.close()
    assert(grpNdv().isEmpty)
    sp.read.format("gpx").load(dir).count() // planning survives
  }

  test("failed INSERT OVERWRITE leaves the old table intact") {
    import sp.implicits._
    val dir = tmp()
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .write.format("gpx").mode("overwrite").save(dir)
    // an overwrite whose job fails mid-flight: truncation must not have
    // happened yet (it moved to the driver's commit), so abort leaves
    // every old row readable
    val bad = sp.range(50).select(col("id"),
      when(col("id") < 49, lit("x"))
        .otherwise(expr("raise_error('boom')")).as("s"))
    intercept[Exception] {
      bad.write.format("gpx").mode("overwrite").save(dir)
    }
    val back = sp.read.format("gpx").load(dir)
    assert(back.count() == 100, "old data must survive a failed overwrite")
    assert(back.agg(sum(col("id"))).head.getLong(0) == 99L * 100 / 2)
    // and a SUCCESSFUL overwrite still replaces everything
    (0 until 7).map(i => (i.toLong, "n")).toDF("id", "s")
      .write.format("gpx").mode("overwrite").save(dir)
    assert(sp.read.format("gpx").load(dir).count() == 7)
  }

  test("sortBy write clusters unsorted data so zone maps prune; spec persists") {
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val df = rnd.shuffle((0 until 10000).toVector)
      .map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val dir = tmp()
    // the INPUT is shuffled; the writer's required ordering must sort it
    df.coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "500").option("sortBy", "id").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    assert(footer.rowGroups.length >= 20)
    val hi = GreaterThan("id", 9000L)
    val kept = footer.rowGroups.count(GpxFileReader.mayMatch(hi, footer.schema, _))
    assert(kept <= 3, s"sortBy write left $kept of ${footer.rowGroups.length} " +
      "row groups matching a 10% tail predicate — data not clustered")
    // rows intact (same multiset), just reordered
    val back = sp.read.format("gpx").load(dir)
    assert(back.count() == 10000 &&
      back.select(sum(col("id"))).head.getLong(0) == 10000L * 9999 / 2)
    // the layout persists as table metadata: a later APPEND without the
    // option is still sorted (one run per new file)
    val more = rnd.shuffle((10000 until 12000).toVector)
      .map(i => (i.toLong, s"v$i")).toDF("id", "s")
    more.coalesce(1).write.format("gpx").mode("append")
      .option("rowGroupRows", "500").save(dir)
    val files2 = graft.format.GpxTable.listFiles(Seq(dir), conf)
    assert(files2.length == 2)
    val newFile = files2.filterNot(_ == file).head
    val f2 = GpxFileReader.readFooter(newFile, conf)
    val hi2 = GreaterThan("id", 11800L)
    val kept2 = f2.rowGroups.count(GpxFileReader.mayMatch(hi2, f2.schema, _))
    assert(kept2 <= 2, s"appended file not clustered: kept $kept2 of ${f2.rowGroups.length}")
  }

  test("pushed LIMIT plans only enough row groups; filters/COW never truncate") {
    import sp.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    val t = sp.read.format("gpx").load(dir)
    // bare LIMIT: one or two row groups planned, not 20
    val lim = t.limit(10)
    val scans = lim.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.inputRDD.getNumPartitions <= 2,
      s"LIMIT 10 planned ${scans.head.inputRDD.getNumPartitions} partitions")
    assert(lim.count() == 10)
    // correctness with larger limits crossing file boundaries
    df.coalesce(1).write.format("gpx").mode("append")
      .option("rowGroupRows", "1000").save(dir)
    assert(sp.read.format("gpx").load(dir).limit(25000).count() == 25000)
    // a filtered LIMIT must NOT truncate the planned row groups: rows
    // surviving the filter come from anywhere in the table
    val f = sp.read.format("gpx").load(dir).filter(col("id") >= 19990L).limit(10)
    assert(f.count() == 10)
    assert(f.select(min(col("id"))).head.getLong(0) == 19990L)
  }

  test("pushed top-N prunes row groups via zone maps, both directions, nulls exact") {
    import sp.implicits._
    def scanParts(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.inputRDD.getNumPartitions
    // sorted layout: 20 row groups, top-10 should plan ~1
    val dir = tmp()
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).orderBy("id").write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir)
    val t = sp.read.format("gpx").load(dir)
    val asc = t.orderBy(col("id")).limit(10)
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 10L))
    assert(scanParts(asc) <= 2, s"ASC top-10 planned ${scanParts(asc)} of 20 groups")
    val desc = t.orderBy(col("id").desc).limit(10)
    assert(desc.collect().map(_.getLong(0)).toSeq == (19999L to 19990L by -1L))
    assert(scanParts(desc) <= 2, s"DESC top-10 planned ${scanParts(desc)} of 20 groups")
    // secondary sort keys don't break first-key pruning
    val two = t.orderBy(col("id"), col("s").desc).limit(7)
    assert(two.collect().map(_.getLong(0)).toSeq == (0L until 7L))
    // UNSORTED layout: pruning may keep everything, results stay exact
    val dir2 = tmp()
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0 until 20000).toVector).map(i => (i.toLong, s"v$i"))
      .toDF("id", "s").coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir2)
    val t2 = sp.read.format("gpx").load(dir2)
    assert(t2.orderBy(col("id")).limit(5).collect().map(_.getLong(0)).toSeq
      == (0L until 5L))
    // nulls: group 1 = 1000..1999, group 2 = all null, group 3 = 0..999
    val dir3 = tmp()
    val rows: Seq[(Option[Long], String)] =
      (1000 until 2000).map(i => (Some(i.toLong), "a")) ++
        (0 until 1000).map(_ => (Option.empty[Long], "n")) ++
        (0 until 1000).map(i => (Some(i.toLong), "b"))
    rows.toDF("id", "s").coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir3)
    val t3 = sp.read.format("gpx").load(dir3)
    // ASC NULLS FIRST (default): the all-null group IS the top — never skip it
    val ascN = t3.orderBy(col("id")).limit(10)
    assert(ascN.collect().forall(_.isNullAt(0)))
    // DESC NULLS LAST (default): nulls sort last; one group covers, two skip
    val descN = t3.orderBy(col("id").desc).limit(5)
    assert(descN.collect().map(_.getLong(0)).toSeq == (1999L to 1995L by -1L))
    assert(scanParts(descN) == 1,
      s"DESC top-5 planned ${scanParts(descN)} of 3 groups")
    // non-default null ordering: NOT pushed (all groups planned), exact anyway
    val nl = t3.orderBy(col("id").asc_nulls_last).limit(5)
    assert(nl.collect().map(_.getLong(0)).toSeq == (0L until 5L))
    assert(scanParts(nl) == 3, "asc_nulls_last must not be top-N pruned")
    // DOUBLE sort key (the 100 TB curation shape: ORDER BY score DESC
    // LIMIT k): float bounds ride the sortable-long map; NaN groups are
    // unreliable => never pruned, and NaN sorts above +Inf in DESC
    val dir4 = tmp()
    val scores: Seq[Double] =
      (0 until 1000).map(_ / 1000.0) ++
        (0 until 1000).map(i => if (i < 10) Double.NaN else 2.0 + i / 1000.0) ++
        (0 until 1000).map(i => -5.0 + i / 1000.0)
    scores.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "score")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir4)
    val t4 = sp.read.format("gpx").load(dir4)
    val topD = t4.orderBy(col("score").desc).limit(5)
    assert(topD.collect().forall(r => r.getDouble(1).isNaN),
      "DESC top-5 must be the NaNs (NaN > +Inf)")
    assert(scanParts(topD) <= 2,
      s"clean low group not pruned: ${scanParts(topD)}")
    val lowD = t4.orderBy(col("score")).limit(5)
    assert(lowD.collect().map(_.getDouble(1)).toSeq ==
      (0 until 5).map(i => -5.0 + i / 1000.0))
    assert(scanParts(lowD) <= 2, s"ASC double top-5: ${scanParts(lowD)}")
  }

  test("reported per-partition ordering: sorted layouts elide SortExec, legacy files veto") {
    import sp.implicits._
    def sortExecs(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.length
    val dir = tmp()
    (0L until 20000L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(2).write.format("gpx").mode("overwrite")
      .option("sortBy", "id").option("rowGroupRows", "1000").save(dir)
    val t = sp.read.format("gpx").load(dir)
    // writer-enforced footer claim => per-partition sorts are elided
    assert(sortExecs(t.sortWithinPartitions("id")) == 0,
      "sorted layout must elide the per-partition sort")
    // ... and the claim is true: every partition is internally ordered
    val unordered = t.select(col("id")).rdd
      .mapPartitions(it => Iterator.single(
        it.map(_.getLong(0)).foldLeft((Long.MinValue, true)) {
          case ((prev, ok), v) => (v, ok && v >= prev) }._2))
      .collect()
    assert(unordered.forall(identity))
    // a file written BEFORE the sort spec existed vetoes the claim: the
    // per-file footer check reports no ordering, and Spark keeps the sort
    val dir2 = tmp()
    val rnd = new scala.util.Random(3)
    rnd.shuffle((0L until 5000L).toVector).map(i => (i, "x")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(dir2)
    (5000L until 10000L).map(i => (i, "y")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("append")
      .option("sortBy", "id").option("rowGroupRows", "1000").save(dir2)
    val t2 = sp.read.format("gpx").load(dir2)
    assert(sortExecs(t2.sortWithinPartitions("id")) == 1,
      "a legacy unsorted file must veto the ordering claim")
  }

  test("z-order clustering prunes on BOTH dimensions; plain sort only on one") {
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 40000)
      .map(_ => (rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong))
      .toDF("x", "y")

    def keptFraction(dir: String, colName: String): Double = {
      val conf = new Configuration()
      val files = graft.format.GpxTable.listFiles(Seq(dir), conf)
      val f = GreaterThan(colName, 9000L) // 10% tail in either dimension
      var kept = 0; var total = 0
      files.foreach { p =>
        val ft = GpxFileReader.readFooter(p, conf)
        total += ft.rowGroups.length
        kept += ft.rowGroups.count(GpxFileReader.mayMatch(f, ft.schema, _))
      }
      kept.toDouble / total
    }

    val zDir = tmp()
    graft.format.ZOrder.cluster(df, "x", "y", partitions = 4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(zDir)
    val sDir = tmp()
    df.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "1000").save(sDir)

    // plain x-sort: selective on x, blind on y
    assert(keptFraction(sDir, "x") < 0.25, s"x-sorted x-prune ${keptFraction(sDir, "x")}")
    assert(keptFraction(sDir, "y") > 0.9, s"x-sorted y-prune ${keptFraction(sDir, "y")}")
    // z-order: selective on BOTH
    assert(keptFraction(zDir, "x") < 0.5, s"zorder x-prune ${keptFraction(zDir, "x")}")
    assert(keptFraction(zDir, "y") < 0.5, s"zorder y-prune ${keptFraction(zDir, "y")}")
    // and the data is intact
    assert(sp.read.format("gpx").load(zDir).agg(sum(col("x")), sum(col("y")))
      .head().toSeq == df.agg(sum(col("x")), sum(col("y"))).head().toSeq)
  }

  test("pixel-level zone maps skip sub-row-group ranges") {
    import sp.implicits._
    // ONE row group of 16384 rows, 16 pixels of 1024: a point filter must
    // decode ~1 pixel, not the whole row group
    val df = (0 until 16384).map(i => (i.toLong, i % 7)).toDF("id", "x")
    val dir = tmp()
    df.orderBy("id").coalesce(1).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "16384").option("pixelRows", "1024").save(dir)
    val t = sp.read.format("gpx").load(dir)
    val b1 = GpxFileReader.pixelsDecoded.get()
    assert(t.filter(col("id") === 7777L).count() == 1)
    val selective = GpxFileReader.pixelsDecoded.get() - b1
    val b2 = GpxFileReader.pixelsDecoded.get()
    assert(t.filter(col("id") >= 0L).count() == 16384)
    val full = GpxFileReader.pixelsDecoded.get() - b2
    assert(selective < full / 4, s"selective=$selective full=$full")
    // sub-granule skipping must not lose boundary rows
    assert(t.filter(col("id").between(1020L, 1030L)).count() == 11)
  }

  test("repeated queries plan from the footer cache; executors read no footers") {
    val li = Tables.lineitem(sp, sf)
    val dir = tmp()
    li.write.format("gpx").mode("overwrite").save(dir)
    val t = sp.read.format("gpx").load(dir)
    assert(t.filter(col("l_quantity") < 5).count() ==
      li.filter(col("l_quantity") < 5).count()) // cold: parses + caches footers
    val before = GpxFileReader.footerReads.get()
    assert(t.filter(col("l_quantity") >= 5).count() ==
      li.filter(col("l_quantity") >= 5).count())
    assert(t.groupBy("l_returnflag").count().count() == 3)
    // planning hit the (len, mtime)-validated cache; splits are
    // self-contained so executors never touched a footer either
    assert(GpxFileReader.footerReads.get() == before,
      s"footers re-read: ${GpxFileReader.footerReads.get() - before}")
  }

  test("commitTs/snapshotTs MVCC time travel with the hidden _commit_ts column") {
    import sp.implicits._
    val dir = tmp()
    (0L until 100L).map(i => (i, i * 2)).toDF("id", "v").write.format("gpx")
      .mode("overwrite").option("commitTs", "100").save(dir)
    (100L until 200L).map(i => (i, i * 2)).toDF("id", "v").write.format("gpx")
      .mode("append").option("commitTs", "200").save(dir)
    (200L until 300L).map(i => (i, i * 2)).toDF("id", "v").write.format("gpx")
      .mode("append").option("commitTs", "300").save(dir)
    // plain read: all commits, no hidden column in the schema
    val all = sp.read.format("gpx").load(dir)
    assert(all.count() == 300)
    assert(!all.schema.fieldNames.contains("_commit_ts"))
    // snapshot at 200 sees exactly the first two commits
    val snap = sp.read.format("gpx").option("snapshotTs", "200").load(dir)
    assert(snap.count() == 200)
    assert(snap.agg(max("id")).head.getLong(0) == 199L)
    // exposed hidden column carries each row group's commit ts
    val exposed = sp.read.format("gpx").option("exposeCommitTs", "true").load(dir)
    assert(exposed.filter(col("_commit_ts") === 200L).count() == 100)
    assert(exposed.groupBy("_commit_ts").count().count() == 3)
    // pushed top-N composes with the snapshot: only VISIBLE row groups
    // enter the coverage counting, so DESC top-5 at ts=200 is the tail
    // of the second commit, never rows from the invisible third
    val snapTop = sp.read.format("gpx").option("snapshotTs", "200").load(dir)
      .orderBy(col("id").desc).limit(5).collect().map(_.getLong(0)).toSeq
    assert(snapTop == (199L to 195L by -1L), snapTop)
  }

  test("native gpx compaction copies chunks verbatim and preserves results") {
    val o = Tables.orders(sp, sf)
    val in = tmp()
    o.repartition(4).write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "512").save(in)
    val outDir = tmp() + "/compacted"
    val conf = new Configuration()
    val res = graft.format.GpxCompactor.compact(in, outDir, conf)
    assert(res.inputFiles == 4 && res.outputFiles == 1)
    assert(res.rows == o.count())
    // row groups, encodings, pixel stats and byte lengths are preserved
    val inFooters = graft.format.GpxTable.listFiles(Seq(in), conf)
      .map(GpxFileReader.readFooter(_, conf))
    val outFooter = GpxFileReader.readFooter(
      graft.format.GpxTable.listFiles(Seq(outDir), conf).head, conf)
    assert(outFooter.rowGroups.length == inFooters.map(_.rowGroups.length).sum)
    assert(outFooter.rowGroups.map(_.chunks.map(_.length).sum).sum ==
      inFooters.map(_.rowGroups.map(_.chunks.map(_.length).sum).sum).sum)
    // full result equality through the compacted layout
    val back = sp.read.format("gpx").load(outDir)
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
    // zone-map pruning still works on the compacted file
    assert(back.filter(col("o_orderkey") === 42L).count() ==
      o.filter(col("o_orderkey") === 42L).count())
  }

  test("compaction carries rename aliases and refuses a dirty output dir") {
    import sp.implicits._
    val conf = new Configuration()
    val dir = tmp()
    // files written with physical column name "v"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.format("gpx").mode("overwrite").save(dir)
    // RENAME COLUMN v -> val: existing files keep "v"; the alias sidecar
    // resolves the current name against them
    graft.format.GpxTable.writeRenames(dir, Map("val" -> Seq("v")), conf)
    val cur = StructType(Seq(StructField("id", LongType),
      StructField("val", LongType)))
    def read(d: String) = sp.read.format("gpx").schema(cur).load(d)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(read(dir) == Seq((1L, 10L), (2L, 20L)))

    // the compacted copy must serve the renamed column identically —
    // byte-copied footers still carry "v", so _renames must travel
    val out = tmp() + "/c"
    graft.format.GpxCompactor.compact(dir, out, conf)
    assert(read(out) == Seq((1L, 10L), (2L, 20L)),
      "rename alias lost in compaction: renamed column nulled")

    // compacting into a dir that already holds gpx files is refused —
    // stale compact-NNNNN leftovers would be listed as table data
    val e = intercept[IllegalArgumentException](
      graft.format.GpxCompactor.compact(dir, out, conf))
    assert(e.getMessage.contains("empty directory"), e.getMessage)
  }

  test("schema evolution: old files read new columns as null") {
    import sp.implicits._
    val dir = tmp()
    // v1 files: (id, a)
    (0L until 100L).map(i => (i, s"a$i")).toDF("id", "a")
      .write.format("gpx").mode("overwrite").save(dir)
    // v2 files add column b
    (100L until 200L).map(i => (i, s"a$i", i * 10)).toDF("id", "a", "b")
      .write.format("gpx").mode("append").save(dir)
    val t = sp.read.format("gpx").load(dir)
    assert(t.schema.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(t.count() == 200)
    assert(t.filter(col("b").isNull).count() == 100)
    assert(t.filter(col("b").isNotNull).agg(sum("b")).head.getLong(0) ==
      (100L until 200L).map(_ * 10).sum)
    // filters on the new column still return correct rows from old files
    assert(t.filter(col("b") > 1500L).count() == (151L until 200L).length)
    // aggregate pushdown must NOT engage across heterogeneous files
    val q = t.agg(min(col("id")), max(col("id")))
    assert(!q.queryExecution.executedPlan.toString.contains("GpxStatsScan"))
    assert(q.head.toSeq == Seq(0L, 199L))
  }

  test("Gorilla-XOR encoding engages on sensor-like doubles/floats, bit-exact") {
    import sp.implicits._
    val n = 4000
    // runs of identical irrational values (scale probe can't represent
    // them, RLE doesn't exist for doubles) salted with NaN, -0.0, nulls —
    // only raw IEEE bits flow through XOR, so all must survive bit-exactly
    val rows = (0 until n).map { i =>
      val v: Option[Double] =
        if (i % 97 == 0) None
        else if (i % 131 == 1) Some(Double.NaN)
        else if (i % 173 == 2) Some(-0.0)
        else Some(math.Pi * (1 + i / 400))
      (i, v, v.map(_.toFloat))
    }
    val df = rows.toDF("id", "d", "f")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    val dIdx = footer.schema.fieldIndex("d")
    val fIdx = footer.schema.fieldIndex("f")
    assert(footer.rowGroups.head.chunks(dIdx).encoding == GpxFormat.EncXorDouble)
    assert(footer.rowGroups.head.chunks(fIdx).encoding == GpxFormat.EncXorFloat)
    // the whole point: the chunk is much smaller than plain 8/4 bytes a row
    assert(footer.rowGroups.head.chunks(dIdx).length < n * 2L)
    assert(footer.rowGroups.head.chunks(fIdx).length < n * 1L)
    // raw-bits round trip (== would treat NaN != NaN and -0.0 == +0.0)
    def bitsD(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(1)) None else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    def bitsF(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(2)) None else Some(java.lang.Float.floatToRawIntBits(r.getFloat(2)))
    val orig = df.orderBy("id").collect()
    val back = sp.read.format("gpx").load(dir).orderBy("id").collect()
    assert(orig.map(bitsD).toSeq == back.map(bitsD).toSeq)
    assert(orig.map(bitsF).toSeq == back.map(bitsF).toSeq)
  }

  test("delta packing engages on monotonic keys whose range defeats FOR") {
    import sp.implicits._
    // step 1e6/row over 65536 rows: absolute range ~6.5e10 > 4 GiB so FOR
    // needs full 8-byte words, but deltas span [1e6, 1e6+99] -> 1 byte
    val rnd = new scala.util.Random(7)
    val ids = (0 until 65536).scanLeft(1000000000000L)(
      (acc, _) => acc + 1000000L + rnd.nextInt(100)).tail
    val df = ids.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "k")
    val dir = tmp()
    df.orderBy("i").coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val file = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val footer = GpxFileReader.readFooter(file, conf)
    val kIdx = footer.schema.fieldIndex("k")
    val chunk = footer.rowGroups.head.chunks(kIdx)
    assert(chunk.encoding == GpxFormat.EncDeltaLong)
    // ~1 byte/row + per-pixel headers vs 8 bytes/row plain
    assert(chunk.length < 65536L * 2)
    val back = sp.read.format("gpx").load(dir).orderBy("i")
      .select("k").collect().map(_.getLong(0))
    assert(back.toSeq == ids)
  }

  test("XorCodec round-trips adversarial bit patterns (property sweep)") {
    val rnd = new scala.util.Random(12345)
    def patterns(w: Int): Seq[Array[Long]] = {
      val full = if (w == 64) -1L else 0xffffffffL
      Seq(
        Array.fill(500)(rnd.nextLong() & full), // incompressible
        Array.fill(500)(0L), // all zero
        Array(rnd.nextLong() & full), // single value
        (0 until 500).map(i => (i / 50).toLong).toArray, // runs
        (0 until 500).map(_ => Seq(0L, full, 1L << (w / 2))(rnd.nextInt(3))).toArray,
        // trailing/leading-zero stress: random single set bits
        (0 until 500).map(_ => 1L << rnd.nextInt(w)).toArray,
        // drifting low bits (the sensor shape)
        (0 until 500).scanLeft(0x4045000000000000L & full)(
          (acc, _) => acc ^ (rnd.nextInt(16).toLong)).tail.toArray)
    }
    for (w <- Seq(32, 64); (p, i) <- patterns(w).zipWithIndex) {
      val enc = graft.format.XorCodec.encode(p(_), p.length, w)
      val out = new Array[Long](p.length)
      graft.format.XorCodec.decode(enc, p.length, w)((k, v) => out(k) = v)
      assert(out.toSeq == p.toSeq, s"w=$w pattern=$i")
    }
  }

  test("type-widening schema evolution: int->long across evolved files") {
    import sp.implicits._
    val dir = tmp()
    // v1 writes v as INT, v2 widens it to BIGINT (same column name)
    (0 until 100).map(i => (i.toLong, i)).toDF("id", "v")
      .write.format("gpx").mode("overwrite").save(dir)
    (100 until 200).map(i => (i.toLong, i.toLong * 1000000000L))
      .toDF("id", "v").write.format("gpx").mode("append").save(dir)
    val t = sp.read.format("gpx").load(dir)
    assert(t.schema("v").dataType == LongType)
    assert(t.count() == 200)
    // values from the narrow files decode correctly under the wide type
    assert(t.agg(sum("v")).head.getLong(0) ==
      (0 until 100).map(_.toLong).sum + (100 until 200).map(_.toLong * 1000000000L).sum)
    // zone-map pruning still works against narrow-typed file stats
    assert(t.filter(col("v") === 50L).count() == 1)
    assert(t.filter(col("v") > 99L).count() == 100)
    // genuinely incompatible types still fail loudly
    (0 until 10).map(i => (i.toLong, s"s$i")).toDF("id", "v")
      .write.format("gpx").mode("overwrite").save(dir)
    (0 until 10).map(i => (i.toLong, i)).toDF("id", "v")
      .write.format("gpx").mode("append").save(dir)
    val e = intercept[Exception](sp.read.format("gpx").load(dir).schema)
    assert(e.getMessage.contains("incompatible types"))
  }

  test("ALTER TABLE ADD COLUMN evolves the catalog schema") {
    val wh = java.nio.file.Files.createTempDirectory("gpx_evo").toString
    sp.conf.set("spark.sql.catalog.gevo", "graft.format.GpxCatalog")
    sp.conf.set("spark.sql.catalog.gevo.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS gevo.db")
    sp.sql("CREATE TABLE gevo.db.t (id BIGINT, a STRING) USING gpx")
    sp.sql("INSERT INTO gevo.db.t VALUES (1, 'x'), (2, 'y')")
    sp.sql("ALTER TABLE gevo.db.t ADD COLUMN b BIGINT")
    sp.sql("INSERT INTO gevo.db.t VALUES (3, 'z', 30)")
    val rows = sp.sql("SELECT id, a, b FROM gevo.db.t ORDER BY id").collect()
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq(1L, "x", null), Seq(2L, "y", null), Seq(3L, "z", 30L)))
  }

  test("footer cache detects a same-length same-mtime-tick rewrite") {
    import sp.implicits._
    val dir = tmp()
    // two writes that differ only in VALUES (identical schema/row count ->
    // same byte length with FOR packing of same-width values)
    def writeVals(base: Int): Unit =
      (0 until 100).map(i => (i, base + i)).toDF("id", "v")
        .coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    writeVals(1000)
    val conf = new Configuration()
    val f = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val st0 = graft.format.GpxFs.stat(f, conf).get
    val footer0 = GpxFileReader.FooterCache.get(f, conf) // cached now
    assert(footer0.rowGroups.head.chunks(1).stats.minLong == 1000L)
    writeVals(5000)
    // land the rewritten bytes IN PLACE at the cached path with the same
    // (length, mtime) the cache validated against — simulates the rewrite
    // landing within one mtime tick
    val f2 = graft.format.GpxTable.listFiles(Seq(dir), conf).head
    val jf = java.nio.file.Paths.get(f.stripPrefix("file:"))
    java.nio.file.Files.move(java.nio.file.Paths.get(f2.stripPrefix("file:")),
      jf, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val st1 = graft.format.GpxFs.stat(f, conf).get
    assert(st1.len == st0.len, "test premise: rewrite must be same-length")
    java.nio.file.Files.setLastModifiedTime(jf,
      java.nio.file.attribute.FileTime.fromMillis(st0.mtime))
    val footer1 = GpxFileReader.FooterCache.get(f, conf)
    assert(footer1.rowGroups.head.chunks(1).stats.minLong == 5000L,
      "stale footer served after an in-place rewrite")
  }

  test("footer cache evicts LRU instead of clearing wholesale") {
    import sp.implicits._
    val dir = tmp()
    (0 until 10).map(i => (i, i.toLong)).toDF("id", "v")
      .repartition(6).write.format("gpx").mode("overwrite").save(dir)
    val conf = new Configuration()
    val files = graft.format.GpxTable.listFiles(Seq(dir), conf).sorted
    assert(files.size >= 4)
    val saved = GpxFileReader.FooterCache.capacity
    try {
      GpxFileReader.FooterCache.clear()
      GpxFileReader.FooterCache.capacity = 3
      files.foreach(GpxFileReader.FooterCache.get(_, conf))
      // the most-recently-used entries survive; re-getting the LAST file
      // must be a pure cache hit (no footer parse)
      val before = GpxFileReader.footerReads.get()
      GpxFileReader.FooterCache.get(files.last, conf)
      assert(GpxFileReader.footerReads.get() == before,
        "most-recent entry was evicted: cache cleared wholesale")
      // the oldest entry was evicted -> re-parse expected
      GpxFileReader.FooterCache.get(files.head, conf)
      assert(GpxFileReader.footerReads.get() == before + 1)
    } finally {
      GpxFileReader.FooterCache.capacity = saved
      GpxFileReader.FooterCache.clear()
    }
  }

  test("pixel addressing refuses chunks past 2 GiB instead of overflowing") {
    import graft.format.GpxFormat.{ChunkMeta, ChunkStats, PixelMeta}
    val huge = ChunkMeta(0L, 3L * 1024 * 1024 * 1024, GpxFormat.EncPlain,
      ChunkStats.empty, Array(PixelMeta(0, 100, ChunkStats.empty)))
    val e = intercept[IllegalArgumentException](huge.pixelLength(0))
    assert(e.getMessage.contains("2 GiB"))
    // in-range chunks still address normally
    val ok = ChunkMeta(0L, 100L, GpxFormat.EncPlain, ChunkStats.empty,
      Array(PixelMeta(0, 50, ChunkStats.empty), PixelMeta(60, 50, ChunkStats.empty)))
    assert(ok.pixelLength(0) == 60 && ok.pixelLength(1) == 40)
  }

  test("one pruning walk per query when no runtime filter arrives") {
    import sp.implicits._
    val dir = tmp()
    (0 until 1000).map(i => (i, i.toLong)).toDF("id", "v")
      .coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val df = sp.read.format("gpx").load(dir).filter(col("id") > 500)
    val before = graft.format.GpxScan.pruningWalks.get()
    assert(df.count() == 499)
    val walks = graft.format.GpxScan.pruningWalks.get() - before
    assert(walks == 1,
      s"$walks pruning walks for one query; stats + planning must share one")
  }

  test("all-null and empty-string zone maps don't mislead the skipper") {
    import sp.implicits._
    val df = Seq(
      (1, Option.empty[Long], ""),
      (2, Option.empty[Long], "x")).toDF("id", "nl", "s")
    val dir = tmp()
    df.coalesce(1).write.format("gpx").mode("overwrite").save(dir)
    val back = sp.read.format("gpx").load(dir)
    assert(back.filter(col("nl").isNull).count() == 2)
    assert(back.filter(col("nl") > 0).count() == 0)
    assert(back.filter(col("s") === "").count() == 1)
  }

  test("cachedDir is content-keyed: a rewritten source triggers a rebuild") {
    import sp.implicits._
    // a fake "sf dir" whose single parquet table we regenerate in place
    val src = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$src/fake.parquet")
    var builds = 0
    def touch(): String = graft.operators.FormatOps.cachedDir(src, "fsspec") {
      dir => builds += 1
        sp.read.parquet(s"$src/fake.parquet")
          .write.format("gpx").mode("overwrite").save(dir)
    }
    val d1 = touch()
    assert(builds == 1)
    assert(sp.read.format("gpx").load(d1).count() == 2)
    touch() // same source bytes: served from cache
    assert(builds == 1)
    // regenerate the source IN PLACE (same path, new content) — the stale
    // materialization must be discarded, not served (round-7 hazard: the
    // driver regenerates /root/testdata between rounds)
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$src/fake.parquet")
    val d3 = touch()
    assert(builds == 2, "regenerated source must force a rebuild")
    assert(sp.read.format("gpx").load(d3).count() == 3)
  }

  test("string zone maps compare in UTF-8 binary order (supplementary plane)") {
    val sp2 = sp
    import sp2.implicits._
    val d = java.nio.file.Files.createTempDirectory("gpx_utf8ord").toString
    // U+1F600 sorts BELOW U+FFFF in UTF-16 (surrogate 0xD83D) but ABOVE
    // it in UTF-8 (F0 9F 98 80 > EF BF BF) — a max bound computed in
    // UTF-16 order would record "￿" and let the reader prune the
    // pixel that holds the matching emoji row
    val emoji = new String(Character.toChars(0x1F600))
    Seq("￿", emoji, "apple").toDF("s")
      .coalesce(1).write.format("gpx").mode("overwrite").save(d)
    val gt = sp.read.format("gpx").load(d)
      .filter(col("s") > "￿").collect().map(_.getString(0)).toSeq
    assert(gt == Seq(emoji),
      s"zone-map pruning dropped the supplementary-plane row: $gt")
    val lt = sp.read.format("gpx").load(d)
      .filter(col("s") < "apple ").collect().map(_.getString(0)).toSeq
    assert(lt == Seq("apple"))
    // equality across the same boundary
    assert(sp.read.format("gpx").load(d)
      .filter(col("s") === emoji).count() == 1)
  }
}
