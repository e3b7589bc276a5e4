package graft

import graft.format.{GpxCommitLog, HostileFileSystem}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import scala.collection.mutable
import scala.util.Random

/** The commit-log protocol on OBJECT-STORE semantics: every test here runs
  * on `hostile://` ([[graft.format.HostileFileSystem]]), whose rename is
  * copy+delete and whose exclusive create silently last-writer-wins — the
  * two primitives the default rename protocol leans on. The conditional-put
  * log must keep every row exactly-once (or refuse loudly) anyway, because
  * its only atomic dependency is putIfAbsent. */
class HostileStoreSpec extends GraftSpec {
  private val conf = new Configuration()

  private def hostileDir(prefix: String): String =
    "hostile://" + tempDir(prefix)

  test("the shim is genuinely hostile: exclusive create and rename atomicity do not hold") {
    val dir = hostileDir("gpx_hostile_sanity")
    val p = new Path(dir, "probe")
    val fs = p.getFileSystem(conf)
    assert(fs.isInstanceOf[HostileFileSystem])
    // create(overwrite = false) twice: BOTH succeed — no exclusivity
    val a = fs.create(p, false); a.write(1); a.close()
    val b = fs.create(p, false); b.write(2); b.close() // would throw on HDFS
    // but the conditional put IS atomic: second claim refused
    val q = new Path(dir, "claimed")
    assert(GpxCommitLog.isLogTable(dir, conf) == false)
    val hfs = fs.asInstanceOf[HostileFileSystem]
    assert(hfs.putIfAbsent(q, Array[Byte](1)))
    assert(!hfs.putIfAbsent(q, Array[Byte](2)))
  }

  test("append/read/overwrite/vacuum round-trip on the hostile store") {
    val dir = hostileDir("gpx_hostile_rt")
    // NO commitProtocol option anywhere in this spec: the hostile://
    // scheme lacks atomic rename, so routing must pick the manifest
    // protocol on its own (safe-by-default)
    spark.range(0, 200).selectExpr("id", "id * 3 as v")
      .write.format("gpx").mode("append").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf),
      "unsafe scheme must auto-route to the manifest protocol")
    spark.range(200, 300).selectExpr("id", "id * 3 as v")
      .write.format("gpx").mode("append").save(dir)
    val df = spark.read.format("gpx").load(dir)
    assert(df.count() == 300)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ==
      (0L until 300L).map(_ * 3).sum)
    spark.range(0, 7).selectExpr("id", "id as v")
      .write.format("gpx").mode("overwrite").save(dir)
    assert(spark.read.format("gpx").load(dir).count() == 7)
    val (gone, _) = GpxCommitLog.vacuum(dir, conf, keepVersions = 1, minAgeMs = 0)
    assert(gone > 0)
    assert(spark.read.format("gpx").load(dir).count() == 7)
  }

  test("concurrent appends from racing writers: every row exactly once") {
    val dir = hostileDir("gpx_hostile_app")
    // seed the table first (concurrent enable() of a fresh table is not
    // the interleaving under test — concurrent COMMITS are); scheme
    // routing alone must put it on the log protocol
    spark.range(0, 1).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(dir)
    assert(GpxCommitLog.isLogTable(dir, conf))
    val nThreads = 6; val perThread = 4; val batch = 100
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      val futures = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            (0 until perThread).foreach { k =>
              val lo = 1000L + (t * perThread + k) * batch
              spark.range(lo, lo + batch).selectExpr("id", "id as v")
                .write.format("gpx").mode("append").save(dir)
            }
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val ids = spark.read.format("gpx").load(dir)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == 1 + nThreads * perThread * batch,
      s"row count ${ids.size}")
    assert(ids.distinct.size == ids.size, "duplicated rows under racing appends")
    assert(GpxCommitLog.head(dir, conf).get.version >=
      1 + nThreads * perThread, "every append must have claimed its own slot")
  }

  test("concurrent COW updates: lost races refuse and retry, no update is lost") {
    val wh = hostileDir("gpx_hostile_upd")
    val cat = "ghup"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING gpx")
    assert(GpxCommitLog.isLogTable(s"$wh/db/t", conf),
      "hostile warehouse must route CREATE TABLE to the manifest protocol")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, 0 FROM range(0, 60)")
    // each thread adds a distinct power of two to an overlapping range,
    // retrying on refusal: additions commute, so the final value exposes
    // any lost update exactly
    val nThreads = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      val futures = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val inc = 1L << t
            var done = false
            var attempts = 0
            while (!done) {
              try {
                spark.sql(
                  s"UPDATE $cat.db.t SET v = v + $inc WHERE id < 40")
                done = true
              } catch {
                case e: Throwable
                  if causeChain(e).exists(
                    _.isInstanceOf[java.util.ConcurrentModificationException]) =>
                  attempts += 1
                  if (attempts > 50) throw e
                  Thread.sleep(20)
              }
            }
          }
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val want = (1L << nThreads) - 1 // sum of all increments
    val got = spark.table(s"$cat.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // evidence on failure: one full-suite run under 32-thread load ended
    // at v=12 (increments 1 and 2 lost) and the cleaned-up temp dir left
    // nothing to diagnose — preserve the warehouse (manifest log included)
    // and the observed values before rethrowing, like the CrossProcess
    // fuzz does
    try {
      assert(got.size == 60)
      (0L until 40L).foreach(id => assert(got(id) == want,
        s"id $id: lost update — v=${got(id)}, want $want"))
      (40L until 60L).foreach(id => assert(got(id) == 0L))
    } catch {
      case e: Throwable =>
        val dest = s"/tmp/hostile_upd_evidence_${System.currentTimeMillis()}"
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(wh.stripPrefix("hostile://")),
          new java.io.File(dest))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dest/_observed.txt"),
          got.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
            .mkString("\n"))
        System.err.println(s"[evidence] hostile COW update state -> $dest")
        throw e
    }
  }

  test("in-place compaction racing appends on the hostile store: no row lost or duplicated") {
    val dir = hostileDir("gpx_hostile_cmp")
    (0 until 4).foreach { i =>
      spark.range(i * 50L, (i + 1) * 50L).selectExpr("id", "id as v")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    // appends race the compaction; the compactor's Replace either wins
    // (appends rebase on top) or refuses loudly on a lost input — retry
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val appender = pool.submit(new Runnable {
        override def run(): Unit = (4 until 10).foreach { i =>
          spark.range(i * 50L, (i + 1) * 50L).selectExpr("id", "id as v")
            .coalesce(1).write.format("gpx").mode("append").save(dir)
        }
      })
      val compactor = pool.submit(new Runnable {
        override def run(): Unit = {
          var done = false
          var tries = 0
          while (!done) {
            try { graft.format.GpxCompactor.compactInPlace(dir, conf); done = true }
            catch {
              case _: java.util.ConcurrentModificationException =>
                tries += 1; if (tries > 30) throw new IllegalStateException(
                  "compaction starved"); Thread.sleep(30)
            }
          }
        }
      })
      appender.get(300, java.util.concurrent.TimeUnit.SECONDS)
      compactor.get(300, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    val ids = spark.read.format("gpx").load(dir)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == 500, s"got ${ids.size} rows")
    assert(ids.distinct.size == 500, "duplicated rows after compaction race")
    assert(ids.min == 0 && ids.max == 499)
  }

  test("rewrite compaction racing appends on the hostile store: no row lost or duplicated") {
    val dir = hostileDir("gpx_hostile_rw")
    // two historical shapes so the rewrite is doing its real job
    // (byte-copy could not merge these)
    (0 until 2).foreach { i =>
      spark.range(i * 50L, (i + 1) * 50L).selectExpr("id")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    (2 until 4).foreach { i =>
      spark.range(i * 50L, (i + 1) * 50L).selectExpr("id", "id as v")
        .coalesce(1).write.format("gpx").mode("append").save(dir)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val appender = pool.submit(new Runnable {
        override def run(): Unit = (4 until 10).foreach { i =>
          spark.range(i * 50L, (i + 1) * 50L).selectExpr("id", "id as v")
            .coalesce(1).write.format("gpx").mode("append").save(dir)
        }
      })
      val rewriter = pool.submit(new Runnable {
        override def run(): Unit = {
          var done = false
          var tries = 0
          // the version-pinned read consumes exactly the starting head;
          // racing appends simply survive the Replace (not consumed) —
          // only a lost input (none here) would refuse, but the retry
          // shape is kept so the test also holds if routing changes
          while (!done) {
            try {
              graft.format.GpxCompactor.compactRewrite(spark, dir, conf)
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                tries += 1; if (tries > 30) throw new IllegalStateException(
                  "rewrite starved"); Thread.sleep(30)
            }
          }
        }
      })
      appender.get(300, java.util.concurrent.TimeUnit.SECONDS)
      rewriter.get(300, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    val rows = spark.read.format("gpx").load(dir)
      .select("id", "v").collect()
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids.size == 500, s"got ${ids.size} rows")
    assert(ids.distinct.size == 500, "duplicated rows after rewrite race")
    assert(ids.min == 0 && ids.max == 499)
    // evolution semantics survive the race: pre-ADD rows null-fill
    assert(rows.count(_.isNullAt(1)) == 100)
  }

  test("DML fuzz on the hostile store: random INSERT/DELETE/UPDATE/MERGE matches a model") {
    val wh = hostileDir("gpx_hostile_fuzz")
    val cat = "ghfz"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT, s STRING) USING gpx")
    val rnd = new Random(2024)
    val model = mutable.Map.empty[Long, (Long, String)]
    var nextId = 0L
    for (op <- 0 until 14) {
      rnd.nextInt(4) match {
        case 0 =>
          val ids = (0 until 1 + rnd.nextInt(30)).map { _ =>
            val id = nextId; nextId += 1
            model(id) = (rnd.nextInt(1000).toLong, s"s${rnd.nextInt(5)}")
            id
          }
          val rows = ids.map(id =>
            s"($id, ${model(id)._1}, '${model(id)._2}')")
          spark.sql(s"INSERT INTO $cat.db.t VALUES ${rows.mkString(", ")}")
        case 1 if model.nonEmpty =>
          val lo = rnd.nextLong(math.max(1L, nextId)); val hi = lo + rnd.nextInt(30)
          spark.sql(s"DELETE FROM $cat.db.t WHERE id BETWEEN $lo AND $hi")
          model.filterInPlace((id, _) => id < lo || id > hi)
        case 2 if model.nonEmpty =>
          val lo = rnd.nextLong(math.max(1L, nextId)); val hi = lo + rnd.nextInt(25)
          val c = 1 + rnd.nextInt(9)
          spark.sql(s"UPDATE $cat.db.t SET v = v + $c WHERE id BETWEEN $lo AND $hi")
          model.mapValuesInPlace { case (id, (v, s)) =>
            if (id >= lo && id <= hi) (v + c, s) else (v, s) }
        case _ =>
          val ids = (0 until 1 + rnd.nextInt(15)).map { _ =>
            if (model.nonEmpty && rnd.nextBoolean())
              model.keys.toSeq(rnd.nextInt(model.size))
            else { val id = nextId; nextId += 1; id }
          }.distinct
          val src = ids.map { id =>
            val v = rnd.nextInt(1000).toLong
            val s = s"m${rnd.nextInt(5)}"
            if (model.contains(id)) model(id) = (v, model(id)._2)
            else model(id) = (v, s)
            s"($id, $v, '$s')"
          }
          spark.sql(
            s"""MERGE INTO $cat.db.t t
               |USING (SELECT * FROM (VALUES ${src.mkString(", ")})
               |       AS x(id, v, s)) s
               |ON t.id = s.id
               |WHEN MATCHED THEN UPDATE SET t.v = s.v
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      val got = spark.table(s"$cat.db.t").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == model.toMap,
        s"op $op diverged on hostile store: table=${got.size} model=${model.size} " +
          s"diff=${(got.toSet diff model.toSet).take(3)} / " +
          s"${(model.toSet diff got.toSet).take(3)}")
    }
  }

  test("protocol routing: unsafe scheme defaults to manifest, local to rename, explicit option wins") {
    // hostile scheme, no option: the manifest log must appear on its own
    val h = hostileDir("gpx_route_auto")
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(h)
    assert(GpxCommitLog.isLogTable(h, conf),
      "scheme without atomic rename must default to the manifest protocol")
    assert(spark.read.format("gpx").load(h).count() == 10)
    // local path: rename stays the default — no _commits dir materializes
    val l = tempDir("gpx_route_local")
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("append").save(l)
    assert(!GpxCommitLog.isLogTable(l, conf),
      "rename-atomic filesystems must keep the rename protocol by default")
    // explicit option always wins, in both directions
    val h2 = hostileDir("gpx_route_explicit_rename")
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "rename").save(h2)
    assert(!GpxCommitLog.isLogTable(h2, conf),
      "an explicit rename request must override scheme routing")
    val l2 = tempDir("gpx_route_explicit_manifest")
    spark.range(0, 10).selectExpr("id", "id as v")
      .write.format("gpx").mode("append")
      .option("commitProtocol", "manifest").save(l2)
    assert(GpxCommitLog.isLogTable(l2, conf),
      "an explicit manifest request must apply on any filesystem")
  }

  test("chunk cache absorbs injected store read latency: warm scans never touch the store") {
    // The executor-local byte-LRU (S21) exists for the object-store read
    // path — on a local filesystem the page cache makes cold reads nearly
    // free and the LRU shows as pure bookkeeping (the r12 bench pair).
    // Here the hostile store injects a per-open first-byte latency (the
    // remote GET cost), so the cache's value becomes MEASURABLE: the cold
    // scan pays one injected sleep per data open, the warm scan must not
    // open the store at all (zero data bytes read, hits > 0) and must be
    // decisively faster.
    val dir = hostileDir("gpx_hostile_cache")
    spark.range(0, 60000).selectExpr("id", "id * 7 as v")
      .repartition(16)
      .write.format("gpx").mode("append")
      .option("rowGroupRows", "4096").save(dir)
    // files inside the ChunkCache mtime race window (2 s) never cache:
    // wait it out so the first scan can populate
    Thread.sleep(2100)
    val r = graft.format.GpxFileReader
    import org.apache.spark.sql.functions._
    def scan(): Long = spark.read.format("gpx").load(dir)
      .agg(sum(col("v") * col("id"))).head.getLong(0)
    scan() // plans/codegen warm; cache state reset below
    HostileFileSystem.readLatencyMs.set(50)
    try {
      r.ChunkCache.clear()
      val o0 = HostileFileSystem.opens.get
      var t0 = System.nanoTime()
      val coldSum = scan()
      val cold = (System.nanoTime() - t0) / 1e9
      val coldOpens = HostileFileSystem.opens.get - o0
      val h0 = r.ChunkCache.hits.get
      val b0 = r.dataBytesRead.get
      val o1 = HostileFileSystem.opens.get
      t0 = System.nanoTime()
      val warmSum = scan()
      val warm = (System.nanoTime() - t0) / 1e9
      val warmOpens = HostileFileSystem.opens.get - o1
      assert(warmSum == coldSum)
      assert(r.ChunkCache.hits.get > h0, "warm scan must serve from the LRU")
      assert(r.dataBytesRead.get == b0,
        "warm scan must read zero data bytes from the store")
      // the deterministic core claim: a warm scan issues a small
      // CONSTANT number of GETs (manifest head + version token — scan
      // planning), never the per-data-file opens the cold scan pays
      assert(warmOpens * 4 <= coldOpens,
        s"warm scan still opening the store per file: " +
          s"cold=$coldOpens opens, warm=$warmOpens opens")
      assert(warm < cold,
        f"latency-paying opens must show in wall time: cold=$cold%.3f s " +
          f"warm=$warm%.3f s (opens $coldOpens vs $warmOpens)")
    } finally HostileFileSystem.readLatencyMs.set(0)
  }

  private def causeChain(e: Throwable): Seq[Throwable] = {
    val b = Seq.newBuilder[Throwable]
    var cur = e
    var depth = 0
    while (cur != null && depth < 20) { b += cur; cur = cur.getCause; depth += 1 }
    b.result()
  }
}
