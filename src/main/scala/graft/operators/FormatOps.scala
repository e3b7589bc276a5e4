package graft.operators

import graft.{Det, GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries that exercise the gpx columnar format end-to-end: parquet
  * source -> gpx write (encodings + footer stats) -> gpx vectorized read
  * (pushdown + zone maps) -> aggregation. The DuckDB oracle computes the
  * same answer straight from parquet, so any format corruption, pushdown
  * bug, or over-eager zone-map skip fails the hash compare.
  */
object FormatOps {

  /** Fingerprint of the source parquet under an sf dir: name+size+mtime of
    * every parquet file, hashed. Part of the cache-validity key so a
    * REGENERATED testdata dir (same path, new bytes) can never be served a
    * stale gpx materialization — the content-keyed analog of the
    * reference's layout-version checks (metadata.proto Layout.version). */
  private[graft] def sourceFingerprint(d: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName).flatMap(walk).toSeq
      else Seq(f)
    val files = walk(new java.io.File(d))
      .filter(f => f.getName.endsWith(".parquet") || f.getParent.contains(".parquet"))
    val md = java.security.MessageDigest.getInstance("MD5")
    files.foreach { f =>
      md.update(s"${f.getAbsolutePath}:${f.length}:${f.lastModified}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-sf cache dir built at most once per source-content generation.
    * The `_done` marker stores the source fingerprint; a marker that is
    * missing OR stale (testdata regenerated in place) triggers a clean
    * rebuild. Per-dir JVM locking keeps concurrent first-touch builds
    * within one JVM single-writer; a sibling `.lock` file (atomic O_EXCL
    * create) arbitrates ACROSS JVMs — the cache dir lives in the
    * machine-global tmpdir, and two mains launched in parallel (Bench +
    * Verify) would otherwise delete/build the same dir concurrently and
    * stamp whichever corrupt interleaving finished last as valid. The
    * loser waits for the winner's marker; a lock older than the patience
    * window (dead builder) is stolen. */
  private[graft] def cachedDir(d: String, name: String)(build: String => Unit): String = {
    val key = d.replaceAll("[^a-zA-Z0-9]", "_")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gpx" +
      s"/v${graft.format.GpxFormat.FormatVersion}/${name}_$key"
    val lock = buildLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val marker = new java.io.File(s"$dir/_done")
      val fp = sourceFingerprint(d)
      // the exists/read pair can race a concurrent JVM's rebuild
      // (deleteRecursively between the two calls): a vanished marker
      // means NOT fresh — wait for the rebuilder — never a crash
      def fresh(): Boolean = marker.exists() && {
        try new String(java.nio.file.Files.readAllBytes(marker.toPath),
          java.nio.charset.StandardCharsets.UTF_8).trim == fp
        catch { case _: java.io.IOException => false }
      }
      if (!fresh()) {
        val lockFile = java.nio.file.Paths.get(s"$dir.lock")
        java.nio.file.Files.createDirectories(lockFile.getParent)
        val StaleLockMs = 10 * 60 * 1000L
        var claimed = false
        while (!fresh() && !claimed) {
          try { java.nio.file.Files.createFile(lockFile); claimed = true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              val age = System.currentTimeMillis() -
                (try java.nio.file.Files.getLastModifiedTime(lockFile).toMillis
                 catch { case _: Throwable => System.currentTimeMillis() })
              if (age > StaleLockMs) {
                // steal by rename, never delete-then-create: two stealers
                // doing deleteIfExists+createFile can each delete the
                // other's freshly created lock and both run the
                // delete+build concurrently — exactly the corruption this
                // lock prevents. ATOMIC_MOVE to a unique tombstone lets
                // exactly one stealer win; losers loop back and contend on
                // the (now re-creatable) lock normally
                // (GpxMutationLock's steal-by-rename discipline).
                val tomb = lockFile.resolveSibling(
                  s"${lockFile.getFileName}.dead." +
                    java.util.UUID.randomUUID().toString.take(8))
                try {
                  java.nio.file.Files.move(lockFile, tomb,
                    java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                  java.nio.file.Files.deleteIfExists(tomb); ()
                } catch { case _: Throwable => () } // lost the steal
              } else Thread.sleep(200)
          }
        }
        if (claimed) {
          // HEARTBEAT while building: the stale-lock steal is keyed on
          // the lock file's mtime, and a live build longer than the
          // 10-min window would otherwise get its lock stolen MID-BUILD
          // (the stealer deletes the dir under the running builder and
          // both build concurrently — the corruption this lock exists to
          // prevent). A daemon thread re-touches the lock well inside
          // the window for as long as the build runs.
          val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
          val heart = new Thread(() => {
            while (beating.get()) {
              try java.nio.file.Files.setLastModifiedTime(lockFile,
                java.nio.file.attribute.FileTime.fromMillis(
                  System.currentTimeMillis()))
              catch { case _: Throwable => () } // lock stolen/FS hiccup
              try Thread.sleep(StaleLockMs / 5)
              catch { case _: InterruptedException => beating.set(false) }
            }
          }, "gpx-cache-build-heartbeat")
          heart.setDaemon(true)
          heart.start()
          try {
            if (!fresh()) {
              deleteRecursively(new java.io.File(dir))
              build(dir)
              java.nio.file.Files.write(marker.toPath,
                fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          } finally {
            beating.set(false)
            heart.interrupt()
            try { java.nio.file.Files.deleteIfExists(lockFile); () }
            catch { case _: Throwable => () }
          }
        }
      }
    }
    dir
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete()
  }

  /** write `table` to a per-sf gpx dir once per JVM (idempotent). The
    * cache key carries the LAYOUT options too: a future caller asking for
    * the same table under a different sort/row-group layout must get its
    * own materialization, not whichever layout happened to build first
    * (answers would stay correct, but the pruning behavior the query was
    * written to exercise would silently not be what runs). */
  private[graft] def gpxDir(s: SparkSession, d: String, table: String,
      sortCol: Option[String] = None, rgRows: Int = 8192): String = {
    val layoutKey =
      s"$table${sortCol.map(c => s"__s_$c").getOrElse("")}__r$rgRows"
    cachedDir(d, layoutKey) { dir =>
      val src = Tables.t(s, d, table)
      val sorted = sortCol.map(c => src.orderBy(c)).getOrElse(src)
      sorted.write.format("gpx").mode("overwrite")
        .option("rowGroupRows", rgRows.toString).save(dir)
    }
  }

  private def gpx(s: SparkSession, d: String, table: String,
      sortCol: Option[String] = None, rgRows: Int = 8192): DataFrame =
    s.read.format("gpx").load(gpxDir(s, d, table, sortCol, rgRows))

  val queries: Seq[GQuery] = Seq(

    // Full-table round trip + grouped aggregation over the gpx scan.
    GQuery("f01_gpx_roundtrip_agg", (s, d) =>
      gpx(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty,
              |  ${Det.o.dsum("l_extendedprice")} AS sum_price,
              |  COUNT(*) AS n
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Selective key-range scan over data sorted on the key: zone maps must
    // skip most row groups AND still return exactly the right rows.
    GQuery("f02_gpx_zonemap_scan", (s, d) =>
      gpx(s, d, "orders", sortCol = Some("o_orderkey"), rgRows = 4096)
        .filter(col("o_orderkey") % 100 < 2 && col("o_orderkey") > 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders
             |WHERE o_orderkey % 100 < 2 AND o_orderkey > 1000
             |ORDER BY o_orderkey""".stripMargin)),

    // Projection pushdown: 2-column read of a wide table through gpx.
    GQuery("f03_gpx_projection", (s, d) =>
      gpx(s, d, "part")
        .groupBy("p_brand")
        .agg(Det.dsum(col("p_retailprice")).as("sum_retail"),
          count(lit(1)).as("n"))
        .orderBy("p_brand"),
      Some(s"""SELECT p_brand, ${Det.o.dsum("p_retailprice")} AS sum_retail,
              |  COUNT(*) AS n
              |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Point lookup on the sort key: the zone maps reduce this to one row
    // group — the Spark analog of the reference's point-index path (S20,
    // pixels-index): key -> (file, row group) pruning from footer stats.
    GQuery("f04_gpx_point_lookup", (s, d) =>
      gpx(s, d, "orders", sortCol = Some("o_orderkey"), rgRows = 4096)
        .filter(col("o_orderkey").isin(42L, 4242L, 9999L))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey IN (42, 4242, 9999)
             |ORDER BY o_orderkey""".stripMargin)),

    // Stats-only aggregation: MIN/MAX/COUNT pushed into the gpx scan and
    // answered from footer zone maps — zero data pages read (S12).
    GQuery("f05_gpx_stats_agg", (s, d) =>
      gpx(s, d, "lineitem")
        .agg(count(lit(1)).as("n"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_suppkey")).as("max_supp"),
          count(col("l_quantity")).as("n_qty")),
      Some("""SELECT COUNT(*) AS n,
             |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
             |  MIN(l_shipdate) AS min_ship,
             |  MAX(l_suppkey) AS max_supp,
             |  COUNT(l_quantity) AS n_qty
             |FROM lineitem""".stripMargin)),

    // VECTOR columns through gpx: same top-k ANN as v02 but the embedding
    // table is stored in the gpx format — proves arrays survive the
    // columnar round trip under real query load (same DuckDB oracle,
    // computed from the original parquet).
    GQuery("f06_gpx_vector_knn", (s, d) => {
      val e = gpx(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      q.join(e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("n_id"), col("v").as("nv")))
        .withColumn("cos", graft.functions.VectorFunctions.cos_sim(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("q_id", "rank")
    },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             |       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
             |     FROM embeddings)
             |SELECT q_id, rank, n_id, cos_sim FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 4) AS cos_sim,
             |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |      ORDER BY list_dot_product(a.v, b.v) / (a.norm * b.norm) DESC, b.vec_id) AS rank
             |  FROM e a JOIN e b ON a.vec_id < 10 AND b.vec_id >= 10) t
             |WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin)),

    // Native compaction: many small gpx files -> few large ones by copying
    // encoded chunk bytes (no re-encode, PixelsCompactor.java:52 analog);
    // the aggregate over the compacted layout must still hash-match the
    // parquet oracle.
    GQuery("f07_gpx_compact_agg", (s, d) => {
      val out = cachedDir(d, "compact_out") { out =>
        val src = cachedDir(d, "compact_src") { src =>
          Tables.orders(s, d).repartition(8).write.format("gpx")
            .mode("overwrite").option("rowGroupRows", "2048").save(src)
        }
        graft.format.GpxCompactor.compact(src, out,
          s.sparkContext.hadoopConfiguration)
      }
      s.read.format("gpx").load(out)
        .groupBy("o_orderstatus")
        .agg(Det.dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_keys"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS n_keys
              |FROM orders GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // MVCC time travel inside the format: three append commits carry
    // commitTs 100/200/300 in their row groups; snapshotTs=200 must see
    // exactly the first two, and exposeCommitTs surfaces the hidden
    // column (PixelsReaderOption.java:37-39 analog).
    GQuery("f08_gpx_time_travel", (s, d) => {
      val dir = cachedDir(d, "mvcc_orders") { dir =>
        val o = Tables.orders(s, d)
        o.filter(col("o_orderkey") % 3 === 0).write.format("gpx")
          .mode("overwrite").option("commitTs", "100").save(dir)
        o.filter(col("o_orderkey") % 3 === 1).write.format("gpx")
          .mode("append").option("commitTs", "200").save(dir)
        o.filter(col("o_orderkey") % 3 === 2).write.format("gpx")
          .mode("append").option("commitTs", "300").save(dir)
      }
      s.read.format("gpx")
        .option("snapshotTs", "200").option("exposeCommitTs", "true")
        .load(dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col(graft.format.GpxTable.CommitTsCol).as("commit_ts"))
        .orderBy("o_orderkey")
    },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 200 END AS BIGINT) AS commit_ts
             |FROM orders WHERE o_orderkey % 3 <= 1
             |ORDER BY o_orderkey""".stripMargin)),

    // Point-index-served lookup (S20, SinglePointIndex.java:41-46 analog):
    // orders stored UNSORTED (zone maps can't prune a point key), a
    // key-bucketed (key, file, rowGroup) index sidecar built once, then the
    // lookup served DRIVER-DIRECT from the index + footer cache — no Spark
    // job, no full-table scan. The oracle recomputes from parquet.
    GQuery("f09_point_index", (s, d) => {
      val dir = cachedDir(d, "ptidx_orders") { dir =>
        Tables.orders(s, d).repartition(8).write.format("gpx")
          .mode("overwrite").option("rowGroupRows", "2048").save(dir)
        graft.format.GpxPointIndex.build(s, dir, "o_orderkey", numBuckets = 8)
      }
      graft.format.GpxPointIndex.lookup(s, dir, "o_orderkey",
        Set(42L, 4242L, 9999L, 12345L),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey IN (42, 4242, 9999, 12345)
             |ORDER BY o_orderkey""".stripMargin)),

    // Merge-on-read DELETE bitmaps (reference RGVisibility.java:34-60,
    // proto/retina.proto:84-108 — deletes as visibility metadata, not
    // rewrites): two forced-`mor` deletes leave the data files untouched
    // and publish bitmap sidecars; the masked scan (union of both bitmaps)
    // must hash-match DuckDB computing the survivors from parquet.
    GQuery("f10_gpx_mor_delete", (s, d) => {
      val dir = cachedDir(d, "mor_orders") { dir =>
        Tables.orders(s, d).write.format("gpx").mode("overwrite")
          .option("rowGroupRows", "4096").save(dir)
        val schema = s.read.format("gpx").load(dir).schema
        val prev = s.conf.getOption("spark.graft.gpx.deleteMode")
        s.conf.set("spark.graft.gpx.deleteMode", "mor")
        try {
          import org.apache.spark.sql.sources._
          graft.format.GpxDelete.run(schema, Seq(dir), Array[Filter](
            And(GreaterThanOrEqual("o_orderkey", 1000L),
              LessThan("o_orderkey", 2000L))))
          graft.format.GpxDelete.run(schema, Seq(dir), Array[Filter](
            In("o_custkey", Array[Any](7L, 11L, 13L))))
        } finally {
          prev match {
            case Some(v) => s.conf.set("spark.graft.gpx.deleteMode", v)
            case None => s.conf.unset("spark.graft.gpx.deleteMode")
          }
        }
      }
      s.read.format("gpx").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
              |FROM orders
              |WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 2000)
              |  AND o_custkey NOT IN (7, 11, 13)
              |GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // Compound-key point lookup (reference KeyColumns.java /
    // proto/index.proto multi-column index keys): a (custkey, status)
    // tuple probe served driver-direct from the compound index with
    // row-level tuple verification — hash-mix collisions can never
    // surface. The oracle recomputes the tuples from parquet.
    GQuery("f11_compound_index", (s, d) => {
      val dir = cachedDir(d, "cidx_orders") { dir =>
        Tables.orders(s, d).repartition(8).write.format("gpx")
          .mode("overwrite").option("rowGroupRows", "2048").save(dir)
        graft.format.GpxPointIndex.buildCompound(
          s, dir, Seq("o_custkey", "o_orderstatus"), numBuckets = 4)
      }
      graft.format.GpxPointIndex.lookupCompound(s, dir,
        Seq("o_custkey", "o_orderstatus"),
        Set(Seq[Any](1L, "O"), Seq[Any](5L, "F"), Seq[Any](10L, "P")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders
             |WHERE (o_custkey = 1 AND o_orderstatus = 'O')
             |   OR (o_custkey = 5 AND o_orderstatus = 'F')
             |   OR (o_custkey = 10 AND o_orderstatus = 'P')
             |ORDER BY o_orderkey""".stripMargin)),

    // Range-partitioned layout (reference Range.java / RangeIndex.java:
    // catalog-level key ranges route ingest and prune scans by file name
    // alone): orders written through rangeBy(o_orderkey) split points, a
    // key-range query over the routed layout must hash-match parquet.
    GQuery("f12_gpx_range_layout", (s, d) => {
      val dir = cachedDir(d, "range_orders") { dir =>
        val n = Tables.orders(s, d).count()
        // split points at rough quartiles of the key space
        val bounds = Seq(n / 2, n, 2 * n)
        Tables.orders(s, d).write.format("gpx").mode("overwrite")
          .option("rangeBy", "o_orderkey")
          .option("rangeBounds", bounds.mkString(","))
          .option("rowGroupRows", "4096").save(dir)
      }
      s.read.format("gpx").load(dir)
        .filter(col("o_orderkey") >= 100 && col("o_orderkey") < 2000)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price
              |FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 2000
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Cross-table consistent snapshot (reference: ONE transaction
    // timestamp per query across all tables, proto/transaction.proto:
    // 33-48): orders and customer live in one warehouse whose GpxTxn
    // counter issues every commitTs; five interleaved commits land across
    // the two tables with a token frozen after the third. A two-table
    // join pinned to that ONE token must see exactly commits 1-3 — the
    // per-table form (independent snapshotTs) cannot express this without
    // tearing. The oracle recomputes the frozen prefix from parquet.
    GQuery("f13_warehouse_snapshot", (s, d) => {
      val wh = cachedDir(d, "txn_wh") { wh =>
        val conf = s.sparkContext.hadoopConfiguration
        import graft.format.GpxTxn
        val oDir = s"$wh/orders"; val cDir = s"$wh/customer"
        GpxTxn.bind(oDir, wh, conf); GpxTxn.bind(cDir, wh, conf)
        val o = Tables.orders(s, d); val c = Tables.customer(s, d)
        def commit(df: DataFrame, dir: String, mode: String): Unit =
          df.write.format("gpx").mode(mode)
            .option("commitTs", GpxTxn.allocate(wh, conf).toString).save(dir)
        commit(o.filter(col("o_orderkey") % 3 === 0), oDir, "overwrite")
        commit(c.filter(col("c_custkey") % 2 === 0), cDir, "overwrite")
        commit(o.filter(col("o_orderkey") % 3 === 1), oDir, "append")
        val frozen = GpxTxn.currentToken(wh, conf)
        java.nio.file.Files.write(java.nio.file.Paths.get(wh, "_frozen"),
          frozen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // post-token commits: invisible at the frozen snapshot
        commit(o.filter(col("o_orderkey") % 3 === 2), oDir, "append")
        commit(c.filter(col("c_custkey") % 2 === 1), cDir, "append")
      }
      val frozen = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(wh, "_frozen")),
        java.nio.charset.StandardCharsets.UTF_8).trim
      val o = s.read.format("gpx").option("asOfToken", frozen).load(s"$wh/orders")
      val c = s.read.format("gpx").option("asOfToken", frozen).load(s"$wh/customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy("c_mktsegment")
    },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  COUNT(DISTINCT c_custkey) AS n_cust
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |WHERE o_orderkey % 3 <= 1 AND c_custkey % 2 = 0
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Tolerant schema evolution under real data (reference:
    // tolerantSchemaEvolution, PixelsReaderOption.java:34,126): a catalog
    // table ingests half of orders, then RENAME COLUMN + DROP COLUMN,
    // then ingests the rest — so the table's files span two schema
    // generations (the old ones physically carry the pre-rename name AND
    // the dropped column's bytes). The aggregate over the CURRENT schema
    // must hash-match DuckDB computing the same thing from parquet:
    // alias-chain resolution, null-free reads across generations, and
    // dropped-column invisibility all gate here.
    GQuery("f14_rename_evolution", (s, d) => {
      // catalog name is sf-keyed: Spark caches catalog INSTANCES by name,
      // so a fixed name would pin the first sf's warehouse for the JVM
      val cat = "gevo_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      def bindCat(wh: String): Unit = {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.format.GpxCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      }
      val wh = cachedDir(d, "evo_wh") { wh =>
        bindCat(wh)
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
        s.sql(s"""CREATE TABLE $cat.db.ord (
                 |  o_orderkey BIGINT, o_custkey BIGINT,
                 |  price DOUBLE, status STRING) USING gpx""".stripMargin)
        Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
          .writeTo(s"$cat.db.ord").append()
        s.sql(s"ALTER TABLE $cat.db.ord RENAME COLUMN price TO total_price")
        s.sql(s"ALTER TABLE $cat.db.ord DROP COLUMN status")
        Tables.orders(s, d).filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").as("total_price"))
          .writeTo(s"$cat.db.ord").append()
      }
      bindCat(wh)
      s.table(s"$cat.db.ord")
        .groupBy((col("o_custkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("total_price")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"))
        .orderBy("bucket")
    },
      Some(s"""SELECT o_custkey % 10 AS bucket, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  MIN(o_orderkey) AS min_key
              |FROM orders GROUP BY o_custkey % 10
              |ORDER BY bucket""".stripMargin)),

    // Pushed ORDER BY ... LIMIT n (SupportsPushDownTopN): zone-map top-N
    // pruning keeps only the row groups that can hold a top-n row — over
    // the o_orderkey-sorted layout that is ~1 group instead of the whole
    // table (S13 top-k + S3 zone maps in one plan; at 100 TB the
    // difference between an interactive peek and a full scan).
    GQuery("f15_topn_pushdown", (s, d) =>
      gpx(s, d, "orders", sortCol = Some("o_orderkey"), rgRows = 4096)
        .orderBy(col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 100""".stripMargin)),

    // Float-key top-N pushdown — the curation shape (ORDER BY score DESC
    // LIMIT k): double zone maps ride the IEEE sortable-long map, so the
    // score-sorted layout plans ~1 row group. The score is a pure-IEEE
    // product of the unique doc_id (deterministic and tie-free on both
    // engines), so the top-k row set is exact.
    GQuery("f16_topn_score", (s, d) => {
      val dir = cachedDir(d, "doc_score") { dir =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            (col("doc_id").cast("double") * 0.618).as("score"), col("lang"))
          .write.format("gpx").mode("overwrite")
          .option("sortBy", "score")
          .option("rowGroupRows", "4096").save(dir)
      }
      s.read.format("gpx").load(dir)
        .orderBy(col("score").desc)
        .limit(50)
        .select(col("doc_id"), col("score"), col("lang"))
    },
      Some("""SELECT doc_id, CAST(doc_id AS DOUBLE) * 0.618 AS score, lang
             |FROM documents ORDER BY score DESC LIMIT 50""".stripMargin)),

    // The conditional-put commit log, end to end (GpxCommitLog — the
    // object-store-safe protocol): a manifest-mode table built by two
    // appends, a copy-on-write DELETE (one atomic Replace), and an
    // in-place compaction (another Replace), then aggregated. Every
    // state transition the oracle must reproduce went through a
    // put-if-absent manifest claim; the deterministic manifest version
    // sequence (1 seed, 2-3 appends, 4 delete, 5 compact) also feeds
    // f18's version-pinned read.
    GQuery("f17_commit_log", (s, d) => {
      val dir = logTableDir(s, d)
      s.read.format("gpx").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
              |FROM orders
              |WHERE o_orderkey % 3 <= 1 AND NOT (o_custkey < 100)
              |GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // Manifest-version time travel (option("atVersion", n)): version 3 of
    // f17's table is the pre-DELETE, pre-compaction state — both appends,
    // nothing removed. Retired files stay on disk (vacuum not run), so
    // the pinned read reconstructs it exactly.
    GQuery("f18_commit_log_time_travel", (s, d) => {
      val dir = logTableDir(s, d)
      s.read.format("gpx").option("atVersion", "3").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price
              |FROM orders WHERE o_orderkey % 3 <= 1
              |GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // Multi-table ATOMIC commit under the oracle (GpxCommitLog
    // .commitAtomic — the conditional-put fate protocol): two log tables
    // split orders by parity, then one transaction MOVES every
    // o_orderkey % 10 = 0 row from a to b — a Replace on a and an Append
    // on b deciding under ONE fate file. The oracle recomputes both
    // sides from parquet: a row lost, duplicated, or half-moved by the
    // transaction machinery hash-mismatches.
    GQuery("f19_atomic_transfer", (s, d) => {
      val base = txnTablesDir(s, d)
      val a = s.read.format("gpx").load(s"$base/a").withColumn("side", lit("a"))
      val b = s.read.format("gpx").load(s"$base/b").withColumn("side", lit("b"))
      a.unionByName(b)
        .groupBy("side")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"))
        .orderBy("side")
    },
      Some(s"""SELECT side, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price,
              |  MIN(o_orderkey) AS min_key
              |FROM (SELECT CASE WHEN o_orderkey % 2 = 0
              |                   AND o_orderkey % 10 <> 0
              |        THEN 'a' ELSE 'b' END AS side, o_orderkey, o_totalprice
              |      FROM orders)
              |GROUP BY side ORDER BY side""".stripMargin)),

    // The MemTable serve path under the oracle (GpxMemTable — the retina
    // MemTable analog): the query re-ingests a fixed 25-row tail into a
    // seeded log table's JVM-local buffer (clear+ingest at planning;
    // nothing is ever flushed, so the table itself never mutates and the
    // query is idempotent across warmup/timed/verify runs) and
    // aggregates committed files + in-memory tail together. The oracle
    // reproduces the tail as a VALUES union — a lost or double-served
    // tail row hash-mismatches.
    GQuery("f20_memtable_read", (s, d) => {
      val dir = memTableDir(s, d)
      val conf = new org.apache.hadoop.conf.Configuration()
      graft.format.GpxMemTable.clear(dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType)))
      graft.format.GpxMemTable.ingest(dir, schema,
        (1 to 25).map(i => org.apache.spark.sql.Row(
          9000000L + i, "M", i * 1.5)), conf)
      s.read.format("gpx").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              |  ${Det.o.dsum("o_totalprice")} AS sum_price
              |FROM (SELECT o_orderstatus, CAST(o_totalprice AS DOUBLE)
              |        AS o_totalprice
              |      FROM orders WHERE o_orderkey % 7 = 0
              |      UNION ALL
              |      SELECT 'M' AS o_orderstatus, CAST(i * 1.5 AS DOUBLE)
              |        AS o_totalprice
              |      FROM range(1, 26) t(i))
              |GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // f21: the columnar cache (S21, reference pixels-cache). The pruned
    // relation is persisted (Spark's in-memory COLUMNAR store — the
    // cache-read analog of pixels-cache serving column chunks from shared
    // memory) and the aggregation is plan-gated in-query to scan the
    // InMemoryRelation, not parquet. Values must still hash-match the
    // parquet oracle, so a cache that corrupted, dropped, or duplicated
    // batches fails the driver compare; only deterministic values reach
    // the driver. The consumer's CacheScope.release unpins afterwards.
    GQuery("f21_columnar_cache", (s, d) => {
      import graft.CacheScope.Trackable
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice")).tracked
      li.count() // materialize the columnar cache before the gated pass
      val agg = li.groupBy("l_returnflag")
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
      val usesCache = agg.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
      require(usesCache,
        "f21 must be served by the columnar cache, not the parquet source")
      agg
    },
      Some(s"""SELECT l_returnflag,
              |  ${Det.o.dsum("l_quantity")} AS sum_qty,
              |  ${Det.o.davg("l_extendedprice")} AS avg_price,
              |  COUNT(*) AS n
              |FROM lineitem
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    // f22: memory-scheme point index (the reference's pluggable
    // single-point-index backends, SinglePointIndex.java:41-46 Scheme
    // memory / pixels-index-memory). Same bucketed gpx index as f09, but
    // served through a process-local token-validated mirror: the first
    // probe loads the entries once, every later probe is a pure hash-map
    // hit with ZERO file I/O — the hot serve path a daemon-backed memory
    // index provides in the reference. Staleness contract unchanged (the
    // mirror serves only under its load fingerprint), and the result must
    // still hash-match DuckDB recomputing from parquet.
    GQuery("f22_point_index_memory", (s, d) => {
      val dir = cachedDir(d, "ptidx_orders") { dir =>
        Tables.orders(s, d).repartition(8).write.format("gpx")
          .mode("overwrite").option("rowGroupRows", "2048").save(dir)
        graft.format.GpxPointIndex.build(s, dir, "o_orderkey", numBuckets = 8)
      }
      val prev = s.conf.getOption("spark.graft.index.scheme")
      s.conf.set("spark.graft.index.scheme", "memory")
      try {
        // warm probe loads the mirror; the measured/verified lookup below
        // is then served entirely from memory
        graft.format.GpxPointIndex.lookup(s, dir, "o_orderkey",
          Set(7L), Seq("o_orderkey")).collect()
        graft.format.GpxPointIndex.lookup(s, dir, "o_orderkey",
          Set(7L, 777L, 4242L, 31337L),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
          .orderBy("o_orderkey")
      } finally prev match {
        case Some(v) => s.conf.set("spark.graft.index.scheme", v)
        case None => s.conf.unset("spark.graft.index.scheme")
      }
    },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey IN (7, 777, 4242, 31337)
             |ORDER BY o_orderkey""".stripMargin))
  )

  /** f19 build: two commit-log tables seeded by orders parity, then one
    * ATOMIC transaction moving every o_orderkey % 10 = 0 row from a to b
    * (data staged invisibly via logDefer, then a Replace on a + an
    * Append on b committed under one conditional-put fate file). */
  private def txnTablesDir(s: SparkSession, d: String): String =
    cachedDir(d, "txn_transfer") { dir =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val a = s"$dir/a"; val b = s"$dir/b"
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      o.filter(col("o_orderkey") % 2 === 0).write.format("gpx")
        .mode("append").option("commitProtocol", "manifest")
        .option("rowGroupRows", "4096").save(a)
      o.filter(col("o_orderkey") % 2 === 1).write.format("gpx")
        .mode("append").option("commitProtocol", "manifest")
        .option("rowGroupRows", "4096").save(b)
      import graft.format.GpxCommitLog
      val ha = GpxCommitLog.head(a, conf).get
      val tokA = java.util.UUID.randomUUID().toString
      val tokB = java.util.UUID.randomUUID().toString
      // a's replacement content (moved rows dropped) and b's new rows,
      // both staged INVISIBLY — the fate decides them together
      s.read.format("gpx").load(a).filter(col("o_orderkey") % 10 =!= 0)
        .write.format("gpx").mode("append")
        .option("logDefer", tokA).option("rowGroupRows", "4096").save(a)
      s.read.format("gpx").load(a).filter(col("o_orderkey") % 10 === 0)
        .write.format("gpx").mode("append")
        .option("logDefer", tokB).option("rowGroupRows", "4096").save(b)
      val ea = GpxCommitLog.drainDeferred(tokA)
        .map(GpxCommitLog.entryFor(a, _, conf))
      val eb = GpxCommitLog.drainDeferred(tokB)
        .map(GpxCommitLog.entryFor(b, _, conf))
      GpxCommitLog.commitAtomic(conf, Seq(
        a -> GpxCommitLog.Replace(ea, ha.relPaths),
        b -> GpxCommitLog.Append(eb)))
      ()
    }

  /** f20 build: a thin seeded commit-log table the MemTable query
    * layers its in-memory tail over (the table itself never mutates —
    * the query re-ingests its tail at planning, flushes nothing). */
  private def memTableDir(s: SparkSession, d: String): String =
    cachedDir(d, "memtable_seed") { dir =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        .write.format("gpx").mode("append")
        .option("commitProtocol", "manifest")
        .option("rowGroupRows", "4096").save(dir)
    }

  /** f17/f18 shared build: a commit-log table with a deterministic
    * manifest history — v1 enable seed, v2/v3 appends, v4 COW DELETE
    * (log tables force copy-on-write: one atomic Replace), v5 in-place
    * compaction (another Replace). */
  private def logTableDir(s: SparkSession, d: String): String =
    cachedDir(d, "log_orders") { dir =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 3 === 0).write.format("gpx")
        .mode("append").option("commitProtocol", "manifest")
        .option("rowGroupRows", "4096").save(dir) // v1 (seed) + v2
      o.filter(col("o_orderkey") % 3 === 1).write.format("gpx")
        .mode("append").option("rowGroupRows", "4096").save(dir) // v3
      val schema = s.read.format("gpx").load(dir).schema
      graft.format.GpxDelete.run(schema, Seq(dir),
        Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.LessThan("o_custkey", 100L))) // v4
      graft.format.GpxCompactor.compactInPlace(dir, conf) // v5
    }
}
