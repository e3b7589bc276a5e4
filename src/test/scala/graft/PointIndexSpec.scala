package graft

import graft.format.{GpxFileReader, GpxPointIndex, GpxTable}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import java.nio.file.Files

/** Point index (S20): key -> (file, rowGroup) sidecar built as a bucketed
  * gpx table, served driver-direct, and consulted by scan planning. */
class PointIndexSpec extends GraftSpec {
  private val sp = TestSpark.spark
  private val conf = new Configuration()

  /** orders written UNSORTED across many small files: zone maps are useless
    * for a point key, so pruning wins must come from the index */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("gpx_idx").toString
    Tables.orders(sp, sf).repartition(8)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 8)
    d
  }

  test("index build is valid and invalidated by table rewrites") {
    assert(GpxPointIndex.valid(dir, "o_orderkey", conf))
    // appending a file changes the fingerprint -> index must go stale
    val d2 = Files.createTempDirectory("gpx_idx2").toString
    Tables.orders(sp, sf).limit(10).coalesce(1)
      .write.format("gpx").mode("overwrite").save(d2)
    GpxPointIndex.build(sp, d2, "o_orderkey", numBuckets = 2)
    assert(GpxPointIndex.valid(d2, "o_orderkey", conf))
    Tables.orders(sp, sf).limit(5).coalesce(1)
      .write.format("gpx").mode("append").save(d2)
    assert(!GpxPointIndex.valid(d2, "o_orderkey", conf))
    // stale index must NOT be used for planning (falls back, stays correct)
    val keys = Tables.orders(sp, sf).limit(5).collect().map(_.getLong(0))
    val got = sp.read.format("gpx").load(d2)
      .filter(col("o_orderkey").isin(keys.toSeq: _*)).count()
    assert(got >= keys.distinct.length)
  }

  test("COW DELETE's file churn invalidates the index; MOR DELETE masks the lookup") {
    val d = Files.createTempDirectory("gpx_idx_del").toString
    Tables.orders(sp, sf).limit(1000).coalesce(1)
      .write.format("gpx").mode("overwrite").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 2)
    assert(GpxPointIndex.valid(d, "o_orderkey", conf))
    val victims = Tables.orders(sp, sf).limit(2).collect().map(_.getLong(0))

    // merge-on-read delete: files untouched, so the index STAYS valid —
    // the driver-direct lookup must replay the delete bitmap itself
    sp.conf.set("spark.graft.gpx.deleteMode", "mor")
    try graft.format.GpxDelete.run(
      sp.read.format("gpx").load(d).schema, Seq(d),
      Array(org.apache.spark.sql.sources.EqualTo("o_orderkey", victims(0))))
    finally sp.conf.unset("spark.graft.gpx.deleteMode")
    assert(GpxPointIndex.valid(d, "o_orderkey", conf),
      "bitmap delete must not invalidate the index")
    assert(GpxPointIndex.lookup(sp, d, "o_orderkey", Set(victims(0)),
      Seq("o_orderkey")).count() == 0,
      "index-served lookup returned a bitmap-deleted row")

    // copy-on-write delete: survivors publish under new names -> stale
    sp.conf.set("spark.graft.gpx.deleteMode", "cow")
    try graft.format.GpxDelete.run(
      sp.read.format("gpx").load(d).schema, Seq(d),
      Array(org.apache.spark.sql.sources.EqualTo("o_orderkey", victims(1))))
    finally sp.conf.unset("spark.graft.gpx.deleteMode")
    assert(!GpxPointIndex.valid(d, "o_orderkey", conf))
    // post-delete reads are correct (index is bypassed, not consulted stale)
    assert(sp.read.format("gpx").load(d)
      .filter(col("o_orderkey").isin(victims.toSeq: _*)).count() == 0)
  }

  test("driver-direct lookup matches a full scan filter") {
    val all = Tables.orders(sp, sf).select("o_orderkey").as[Long](
      sp.implicits.newLongEncoder).collect()
    val keys = Set(all.head, all(all.length / 2), all.last)
    val viaIndex = GpxPointIndex.lookup(sp, dir, "o_orderkey", keys,
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val viaScan = sp.read.format("gpx").load(dir)
      .filter(col("o_orderkey").isin(keys.toSeq: _*))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq == viaScan.toSeq)
    // absent key -> empty, not an error
    assert(GpxPointIndex.lookup(sp, dir, "o_orderkey", Set(-12345L),
      Seq("o_orderkey")).collect().isEmpty)
  }

  test("scan planning prunes to the indexed row groups without reading all footers") {
    val key = Tables.orders(sp, sf).select("o_orderkey").head().getLong(0)
    val entries = GpxPointIndex.entriesFor(dir, "o_orderkey", Set(key), conf)
    assert(entries.isDefined && entries.get.nonEmpty)
    val expectedRgs = entries.get.values.map(_.size).sum
    val totalFiles = GpxTable.listFiles(Seq(dir), conf).length
    assert(totalFiles >= 8)
    // physical plan over the equality filter reads only the indexed rgs
    val df = sp.read.format("gpx").load(dir).filter(col("o_orderkey") === key)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val parts = scan.inputRDD.getNumPartitions
    assert(parts <= expectedRgs,
      s"planned $parts partitions, index allows only $expectedRgs row groups")
    assert(df.count() == 1)
    // files the index excludes contribute zero planned splits: partition
    // count is far below the per-file row-group total
    val allRgs = GpxTable.listFiles(Seq(dir), conf).map(f =>
      GpxFileReader.FooterCache.get(f, conf).rowGroups.length).sum
    assert(parts < allRgs)
  }

  test("index sidecar files are invisible to the table listing") {
    val files = GpxTable.listFiles(Seq(dir), conf)
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("/_index/")))
    // and the table still reads exactly its own rows
    assert(sp.read.format("gpx").load(dir).count() ==
      Tables.orders(sp, sf).count())
  }

  test("index build reads each key-column pixel exactly once") {
    val d = Files.createTempDirectory("gpx_idx_once").toString
    Tables.orders(sp, sf).repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "512").save(d)
    // expected decode work: every pixel of the key column, once
    val files = GpxTable.listFiles(Seq(d), conf)
    val keyPixels = files.map { f =>
      val footer = GpxFileReader.FooterCache.get(f, conf)
      val ki = footer.schema.fieldNames.indexOf("o_orderkey")
      footer.rowGroups.map(_.chunks(ki).pixels.length).sum
    }.sum
    val before = GpxFileReader.pixelsDecoded.get()
    val n = GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
    val decoded = GpxFileReader.pixelsDecoded.get() - before
    assert(n > 0)
    assert(decoded == keyPixels,
      s"build decoded $decoded pixels; a single pass over the key column is $keyPixels")
  }

  test("timestamp-keyed index serves at planning time") {
    val d = Files.createTempDirectory("gpx_idx_ts").toString
    Tables.orders(sp, sf)
      .withColumn("o_ts", col("o_orderdate").cast("timestamp"))
      .repartition(8)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.build(sp, d, "o_ts", numBuckets = 4)
    val ts = sp.read.format("gpx").load(d).select("o_ts").head()
      .getTimestamp(0)
    // literalKey understands all three timestamp literal flavors
    val micros = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    assert(GpxPointIndex.literalKey(ts).contains(micros))
    assert(GpxPointIndex.literalKey(ts.toInstant).contains(micros))
    assert(GpxPointIndex.literalKey(
      java.time.LocalDateTime.ofInstant(ts.toInstant, java.time.ZoneOffset.UTC))
      .contains(micros))
    // planning hook resolves the filter through the index
    val allowed = GpxPointIndex.allowedRowGroups(
      d, Array[Filter](EqualTo("o_ts", ts)), conf)
    assert(allowed.isDefined && allowed.get.nonEmpty)
    // end-to-end: an equality query plans fewer splits than total row groups
    val df = sp.read.format("gpx").load(d).filter(col("o_ts") === ts)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val allRgs = GpxTable.listFiles(Seq(d), conf).map(f =>
      GpxFileReader.FooterCache.get(f, conf).rowGroups.length).sum
    assert(scan.inputRDD.getNumPartitions < allRgs)
    assert(df.count() >= 1)
  }

  test("string-keyed index: hashed keys, exact row-level verification") {
    val d = Files.createTempDirectory("gpx_idx_str").toString
    Tables.documents(sp, sf)
      .withColumn("doc_key", concat(lit("doc-"), col("doc_id")))
      .repartition(8)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "64").save(d)
    GpxPointIndex.build(sp, d, "doc_key", numBuckets = 4)
    assert(GpxPointIndex.valid(d, "doc_key", conf))
    val keys = sp.read.format("gpx").load(d).select("doc_key")
      .limit(3).collect().map(_.getString(0)).toSet
    val viaIndex = GpxPointIndex.lookupString(sp, d, "doc_key", keys,
      Seq("doc_key", "doc_id", "n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val viaScan = sp.read.format("gpx").load(d)
      .filter(col("doc_key").isin(keys.toSeq: _*))
      .select("doc_key", "doc_id", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq == viaScan.toSeq)
    // planning hook: a pushed string equality consults the index
    val allowed = GpxPointIndex.allowedRowGroups(
      d, Array[Filter](EqualTo("doc_key", keys.head)), conf)
    assert(allowed.isDefined && allowed.get.nonEmpty)
    // absent key -> empty, not an error
    assert(GpxPointIndex.lookupString(sp, d, "doc_key", Set("doc-nope"),
      Seq("doc_key")).collect().isEmpty)
  }

  test("binary-keyed index: hashed keys, exact byte-level verification") {
    val d = Files.createTempDirectory("gpx_idx_bin").toString
    Tables.documents(sp, sf)
      .withColumn("bkey", sha2(col("text"), 256).cast("binary"))
      .repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "64").save(d)
    GpxPointIndex.build(sp, d, "bkey", numBuckets = 4)
    assert(GpxPointIndex.valid(d, "bkey", conf))
    val keys: Set[Seq[Byte]] = sp.read.format("gpx").load(d).select("bkey")
      .limit(3).collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    val viaIndex = GpxPointIndex.lookupBinary(sp, d, "bkey", keys,
      Seq("doc_id", "n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val arrs = keys.toSeq.map(_.toArray)
    val viaScan = sp.read.format("gpx").load(d)
      .filter(col("bkey").isin(arrs: _*))
      .select("doc_id", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(viaIndex.nonEmpty && viaIndex.toSeq == viaScan.toSeq)
    // planning hook: pushed binary equality consults the index
    val allowed = GpxPointIndex.allowedRowGroups(
      d, Array[Filter](EqualTo("bkey", arrs.head)), conf)
    assert(allowed.isDefined && allowed.get.nonEmpty)
    // absent key -> empty, not an error
    assert(GpxPointIndex.lookupBinary(sp, d, "bkey",
      Set(Seq[Byte](1, 2, 3)), Seq("doc_id")).collect().isEmpty)
  }

  test("equalityKeys intersects same-column conjuncts") {
    val fs: Array[Filter] = Array(
      In("k", Array(1, 2, 3)), EqualTo("k", 2), EqualTo("other", "x"))
    assert(GpxPointIndex.equalityKeys(fs) ==
      Map("k" -> Set(2L), "other" -> Set(GpxPointIndex.stringKey("x"))))
  }

  test("compound (long, string) index: tuple lookup is index-served and exact") {
    val d = Files.createTempDirectory("gpx_idx_comp").toString
    Tables.orders(sp, sf).repartition(8)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    val n = GpxPointIndex.buildCompound(sp, d,
      Seq("o_custkey", "o_orderstatus"), numBuckets = 4)
    assert(n > 0)
    assert(GpxPointIndex.valid(d, "o_custkey__o_orderstatus", conf))

    val sample = Tables.orders(sp, sf)
      .select("o_custkey", "o_orderstatus").distinct().limit(3)
      .collect().map(r => Seq[Any](r.getLong(0), r.getString(1)))
    val tuples = sample.toSet
    val viaIndex = GpxPointIndex.lookupCompound(sp, d,
      Seq("o_custkey", "o_orderstatus"), tuples,
      Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val pred = tuples.toSeq.map(t =>
      col("o_custkey") === t.head && col("o_orderstatus") === t(1))
      .reduce(_ || _)
    val viaScan = sp.read.format("gpx").load(d).filter(pred)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq == viaScan.toSeq)
    // a tuple whose PARTS exist but whose combination doesn't: the mixed
    // key misses (or collides and is verified away) -> empty
    val cust = sample.head.head
    val status = "NO_SUCH_STATUS"
    assert(GpxPointIndex.lookupCompound(sp, d,
      Seq("o_custkey", "o_orderstatus"), Set(Seq[Any](cust, status)),
      Seq("o_orderkey")).collect().isEmpty)
  }

  test("compound index serves scan planning when both columns are pinned") {
    val d = Files.createTempDirectory("gpx_idx_comp2").toString
    Tables.orders(sp, sf).repartition(8)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.buildCompound(sp, d, Seq("o_custkey", "o_orderstatus"))
    val r0 = Tables.orders(sp, sf).select("o_custkey", "o_orderstatus").head()
    val (ck, st) = (r0.getLong(0), r0.getString(1))
    val allowed = GpxPointIndex.allowedRowGroups(d,
      Array(EqualTo("o_custkey", ck), EqualTo("o_orderstatus", st)), conf)
    assert(allowed.isDefined && allowed.get.nonEmpty,
      "compound index must serve fully-pinned planning")
    val expectedRgs = allowed.get.values.map(_.size).sum
    val df = sp.read.format("gpx").load(d)
      .filter(col("o_custkey") === ck && col("o_orderstatus") === st)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions <= expectedRgs)
    // correct rows despite hash-mixed probe keys (Spark re-filters)
    val want = Tables.orders(sp, sf)
      .filter(col("o_custkey") === ck && col("o_orderstatus") === st).count()
    assert(df.count() == want)
    // one pinned column alone cannot use the compound index -> no pruning
    // claim, full fallback stays correct
    val one = GpxPointIndex.allowedRowGroups(d,
      Array(EqualTo("o_custkey", ck)), conf)
    assert(one.isEmpty)
  }

  test("index build and lookups resolve RENAME COLUMN aliases per file") {
    val sp2 = sp
    import sp2.implicits._
    val d = Files.createTempDirectory("gpx_idx_ren").toString
    // file written BEFORE the rename: physical column name "a"
    (0L until 100L).map(i => (i, i * 10L)).toDF("id", "a")
      .coalesce(1).write.format("gpx").mode("overwrite").save(d)
    // RENAME COLUMN a -> b, then a post-rename append carrying "b"
    GpxTable.writeRenames(d, Map("b" -> Seq("a")), conf)
    (100L until 150L).map(i => (i, i * 10L)).toDF("id", "b")
      .coalesce(1).write.format("gpx").mode("append").save(d)
    GpxPointIndex.build(sp, d, "b", numBuckets = 2)
    // keys living ONLY in the pre-rename file must be indexed and served
    val got = GpxPointIndex.lookup(sp, d, "b", Set(50L, 1200L), Seq("id", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((5L, 50L), (120L, 1200L)),
      s"lookup must span pre- and post-rename files, got $got")
    // planning-hook pruning must not drop the pre-rename file's row groups
    val allowed = GpxPointIndex.allowedRowGroups(d,
      Array(EqualTo("b", 50L)), conf)
    assert(allowed.isDefined && allowed.get.values.exists(_.nonEmpty))
    val viaScan = sp.read.format("gpx").load(d)
      .filter(col("b") === 50L).select("id").collect().map(_.getLong(0)).toSeq
    assert(viaScan == Seq(5L),
      s"index-pruned scan lost the pre-rename file's row: $viaScan")
  }

  test("lookup null-fills output columns an evolved file never carried") {
    val sp2 = sp
    import sp2.implicits._
    val d = Files.createTempDirectory("gpx_idx_evo").toString
    // old file: (id, v); new file adds w
    (0L until 50L).map(i => (i, i * 2L)).toDF("id", "v")
      .coalesce(1).write.format("gpx").mode("overwrite").save(d)
    (50L until 80L).map(i => (i, i * 2L, i + 7L)).toDF("id", "v", "w")
      .coalesce(1).write.format("gpx").mode("append").save(d)
    GpxPointIndex.build(sp, d, "id", numBuckets = 2)
    val got = GpxPointIndex.lookup(sp, d, "id", Set(10L, 60L), Seq("id", "w"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
    assert(got == Seq((10L, -1L), (60L, 67L)),
      s"old file's missing column must serve null, got $got")
  }

  test("TimestampNTZ columns are indexable AND servable driver-direct") {
    val d = Files.createTempDirectory("gpx_idx_ntz").toString
    sp.sql(
      """select id, timestamp_ntz '2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as t
        |from range(0, 100)""".stripMargin)
      .coalesce(1).write.format("gpx").mode("overwrite").save(d)
    GpxPointIndex.build(sp, d, "id", numBuckets = 2)
    // the NTZ column in the OUTPUT exercises external()'s NTZ branch
    val rows = GpxPointIndex.lookup(sp, d, "id", Set(42L), Seq("id", "t"))
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 42))
  }

  test("memory scheme: identical results, zero data I/O warm, commit-invalidated") {
    val d = Files.createTempDirectory("gpx_idx_mem").toString
    Tables.orders(sp, sf).repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
    val keys = Tables.orders(sp, sf).limit(3).collect()
      .map(_.getLong(0)).toSet
    val viaGpx = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
    assert(viaGpx.isDefined && viaGpx.get.nonEmpty)
    GpxPointIndex.MemoryMirror.reset()
    sp.conf.set("spark.graft.index.scheme", "memory")
    try {
      // first probe loads the mirror; entries identical to the gpx backend
      val viaMem = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(viaMem == viaGpx, "memory scheme must serve identical entries")
      assert(GpxPointIndex.MemoryMirror.loads.get == 1)
      // warm probe: pure hash-map hit — no data bytes leave the filesystem
      val before = GpxFileReader.dataBytesRead.get()
      val warm = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(warm == viaGpx)
      assert(GpxFileReader.dataBytesRead.get() == before,
        "mirror-served probe must read zero data bytes")
      assert(GpxPointIndex.MemoryMirror.hits.get >= 1)
      // full lookup result matches a scan
      val viaLookup = GpxPointIndex.lookup(sp, d, "o_orderkey", keys,
        Seq("o_orderkey", "o_totalprice"))
        .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
      val viaScan = sp.read.format("gpx").load(d)
        .filter(col("o_orderkey").isin(keys.toSeq: _*))
        .select("o_orderkey", "o_totalprice")
        .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
      assert(viaLookup == viaScan)
      // a table commit invalidates: the stale mirror must NOT serve
      Tables.orders(sp, sf).limit(5).coalesce(1)
        .write.format("gpx").mode("append").save(d)
      assert(GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf).isEmpty,
        "stale index must refuse under the memory scheme too")
      // rebuild -> mirror reloads under the new fingerprint and serves
      GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
      val after = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(after.isDefined && after.get.nonEmpty)
      assert(GpxPointIndex.MemoryMirror.loads.get == 2,
        "rebuild must force a mirror reload, not serve the stale map")
    } finally sp.conf.unset("spark.graft.index.scheme")
  }

  test("memory scheme: over-cap indexes refuse once and fall back to gpx") {
    val d = Files.createTempDirectory("gpx_idx_mem_cap").toString
    Tables.orders(sp, sf).repartition(2)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "512").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 2)
    val keys = Tables.orders(sp, sf).limit(2).collect()
      .map(_.getLong(0)).toSet
    GpxPointIndex.MemoryMirror.reset()
    sp.conf.set("spark.graft.index.scheme", "memory")
    sp.conf.set("spark.graft.index.memory.maxEntries", "1")
    try {
      val got = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(got.isDefined && got.get.nonEmpty,
        "refused mirror must fall back to the gpx backend, not fail")
      assert(GpxPointIndex.MemoryMirror.loads.get == 0)
      assert(GpxPointIndex.MemoryMirror.refusals.get >= 1)
      // the refusal is remembered: a second probe doesn't re-walk footers
      val r1 = GpxPointIndex.MemoryMirror.refusals.get
      GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(GpxPointIndex.MemoryMirror.refusals.get > r1)
    } finally {
      sp.conf.unset("spark.graft.index.scheme")
      sp.conf.unset("spark.graft.index.memory.maxEntries")
    }
  }

  test("memory scheme: a transient read error is retried, not cached as a refusal") {
    val d = Files.createTempDirectory("gpx_idx_mem_tr").toString
    Tables.orders(sp, sf).repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
    val keys = Tables.orders(sp, sf).limit(2).collect()
      .map(_.getLong(0)).toSet
    val idx = GpxPointIndex.indexDir(d, "o_orderkey")
    // corrupt an index bucket file whose bucket serves NONE of the probed
    // keys: the mirror's full walk trips over it (the "object-store
    // hiccup"), while the gpx fallback bucket-prunes past it and serves
    val eligible = keys.map(GpxTable.bucketOf(_, 4))
    val victim = new java.io.File(idx).listFiles()
      .filter(_.getName.endsWith(".gpx"))
      .find(f => GpxTable.bucketOfFile(f.getName).exists(b => !eligible.contains(b)))
      .getOrElse(fail("no ineligible bucket file to corrupt"))
    val orig = java.nio.file.Files.readAllBytes(victim.toPath)
    GpxPointIndex.MemoryMirror.reset()
    sp.conf.set("spark.graft.index.scheme", "memory")
    try {
      java.nio.file.Files.write(victim.toPath, Array[Byte](1, 2, 3))
      val got = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(got.isDefined && got.get.nonEmpty,
        "a transient mirror failure must fall back to gpx, not fail")
      assert(GpxPointIndex.MemoryMirror.loads.get == 0)
      assert(GpxPointIndex.MemoryMirror.refusals.get >= 1)
      // heal the store: the NEXT probe must retry the load — a one-off
      // read error must not disable the memory scheme for this fp until
      // a rebuild or process restart
      java.nio.file.Files.write(victim.toPath, orig)
      val again = GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf)
      assert(again == got)
      assert(GpxPointIndex.MemoryMirror.loads.get == 1,
        "healed store must be mirrored on the next probe — transient " +
          "errors must not be cached as refusals")

      // ...but a PERMANENTLY broken store must not re-walk every footer
      // on every probe: after the retry cap, the refusal caches (a heal
      // then needs a rebuild/invalidate to serve from memory again)
      GpxPointIndex.MemoryMirror.reset()
      java.nio.file.Files.write(victim.toPath, Array[Byte](9, 9, 9))
      (1 to 3).foreach { _ =>
        assert(GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf) == got)
      }
      java.nio.file.Files.write(victim.toPath, orig) // heal AFTER the cap
      val r0 = GpxPointIndex.MemoryMirror.refusals.get
      assert(GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf) == got)
      assert(GpxPointIndex.MemoryMirror.loads.get == 0 &&
        GpxPointIndex.MemoryMirror.refusals.get > r0,
        "past the transient-retry cap the refusal must be cached")
      // rebuild clears it: the memory scheme recovers
      GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
      assert(GpxPointIndex.entriesFor(d, "o_orderkey", keys, conf).isDefined)
      assert(GpxPointIndex.MemoryMirror.loads.get == 1,
        "a rebuild must clear the cached transient refusal")
    } finally sp.conf.unset("spark.graft.index.scheme")
  }

  test("memory scheme serves compound indexes identically to gpx") {
    val d = Files.createTempDirectory("gpx_idx_mem_comp").toString
    Tables.orders(sp, sf).repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.buildCompound(sp, d,
      Seq("o_custkey", "o_orderstatus"), numBuckets = 4)
    val sample = Tables.orders(sp, sf)
      .select("o_custkey", "o_orderstatus").distinct().limit(3)
      .collect().map(r => Seq[Any](r.getLong(0), r.getString(1))).toSet
    val outCols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    def run(): Seq[Seq[Any]] = GpxPointIndex.lookupCompound(sp, d,
      Seq("o_custkey", "o_orderstatus"), sample, outCols)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val viaGpx = run()
    GpxPointIndex.MemoryMirror.reset()
    sp.conf.set("spark.graft.index.scheme", "memory")
    try {
      val viaMem = run()
      assert(viaMem == viaGpx && viaMem.nonEmpty,
        "compound lookups must be scheme-transparent")
      assert(GpxPointIndex.MemoryMirror.loads.get == 1,
        "the compound index must actually have been mirrored")
    } finally sp.conf.unset("spark.graft.index.scheme")
  }

  test("memory scheme serves scan planning; unknown schemes are rejected") {
    val d = Files.createTempDirectory("gpx_idx_mem_plan").toString
    Tables.orders(sp, sf).repartition(4)
      .write.format("gpx").mode("overwrite")
      .option("rowGroupRows", "256").save(d)
    GpxPointIndex.build(sp, d, "o_orderkey", numBuckets = 4)
    val key = Tables.orders(sp, sf).select("o_orderkey").head().getLong(0)
    GpxPointIndex.MemoryMirror.reset()
    sp.conf.set("spark.graft.index.scheme", "memory")
    try {
      val df = sp.read.format("gpx").load(d)
        .filter(col("o_orderkey") === key)
      assert(df.count() == 1)
      assert(GpxPointIndex.MemoryMirror.loads.get +
        GpxPointIndex.MemoryMirror.hits.get >= 1,
        "planning must have consulted the mirror")
    } finally sp.conf.unset("spark.graft.index.scheme")
    val bad = new Configuration()
    bad.set("graft.index.scheme", "rocksdb")
    intercept[IllegalArgumentException](GpxPointIndex.scheme(bad))
    // malformed or non-positive mirror caps fail LOUDLY on the lookup,
    // never silently refuse the mirror forever
    for (v <- Seq("4M", "0", "-1")) {
      GpxPointIndex.MemoryMirror.reset()
      sp.conf.set("spark.graft.index.scheme", "memory")
      sp.conf.set("spark.graft.index.memory.maxEntries", v)
      try intercept[IllegalArgumentException] {
        GpxPointIndex.entriesFor(d, "o_orderkey", Set(key), conf)
      } finally {
        sp.conf.unset("spark.graft.index.scheme")
        sp.conf.unset("spark.graft.index.memory.maxEntries")
      }
    }
  }
}
