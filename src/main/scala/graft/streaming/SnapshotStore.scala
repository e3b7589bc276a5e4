package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Log-structured versioned snapshot store with atomic metadata swap — the
  * Spark-native equivalent of the reference's Retina write path + MVCC
  * visibility (pixels-retina/.../MemTable.java:31-75, RGVisibility.java:34-60,
  * metadata AtomicSwapFiles proto/metadata.proto:74).
  *
  * Layout: each commit v writes ONLY its micro-batch as an immutable delta
  * directory `d_v` plus a manifest `m_v.txt` listing every directory that
  * constitutes the table at v (previous manifest + the new delta); `_CURRENT`
  * is swapped to v last. So write amplification is O(batch), not O(table) —
  * the log-structured property that gives Retina its MemTable-flush freshness.
  * Readers resolve `_CURRENT` -> manifest -> an immutable set of directories;
  * no shared mutable visibility state, no reader/writer races.
  *
  * Reads are merge-on-read: union of the manifest members, latest visible row
  * per key (one shuffle on the key columns). Deletes are logical: a
  * `_deleted` column filtered at read time (delete-bitmap analog). Time
  * travel = read any retained version, or any commit-ts bound within one.
  * [[compact]] folds the current manifest into a single base directory `b_v`
  * so read fan-in stays bounded (the Compactor's merge role,
  * pixels-core/.../compactor/PixelsCompactor.java:52).
  */
class SnapshotStore(
    spark: SparkSession,
    path: String,
    keyCols: Seq[String],
    versionCol: String,
    format: String = "parquet") {

  private def root = Paths.get(path)
  private def currentFile = root.resolve("_CURRENT")

  def currentVersion: Long = {
    if (!Files.exists(currentFile)) -1L
    else Try(new String(Files.readAllBytes(currentFile)).trim.toLong).getOrElse(-1L)
  }

  private def deltaDir(v: Long) = root.resolve(f"d_$v%06d")
  private def baseDir(v: Long) = root.resolve(f"b_$v%06d")
  private def manifestFile(v: Long) = root.resolve(f"m_$v%06d.txt")

  /** Directory names making up version v (immutable once written). */
  def manifest(v: Long): Seq[String] =
    new String(Files.readAllBytes(manifestFile(v)))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** All retained row versions visible at table version v: the union of the
    * manifest's member directories. At-least-once redelivery can land the
    * same (key, commit-ts) row in two deltas, so the union dedupes on
    * key+ts — idempotent by construction. */
  def readVersion(v: Long): DataFrame = {
    val dirs = manifest(v).map(n => root.resolve(n).toString)
    spark.read.format(format).option("mergeSchema", "true").load(dirs: _*)
      .dropDuplicates(keyCols :+ versionCol)
  }

  /** Read the current snapshot: latest visible row per key, excluding
    * logically-deleted rows (merge-on-read over base + deltas). */
  def read(): Option[DataFrame] = {
    val v = currentVersion
    if (v < 0) None
    else Some(latestPerKey(readVersion(v)).filter(!col("_deleted")))
  }

  /** Read the snapshot as of a commit timestamp: only row versions with
    * commit ts <= the bound are visible — MVCC snapshot semantics
    * (reader option transTimestamp, PixelsReaderOption.java:39). */
  def readAsOf(ts: Long): Option[DataFrame] = {
    val v = currentVersion
    if (v < 0) None
    else Some(latestPerKey(readVersion(v).filter(col(versionCol) <= ts))
      .filter(!col("_deleted")))
  }

  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Apply one CDC micro-batch: rows with `_deleted=true` are tombstones.
    * Writes ONLY the batch as delta v+1 (O(batch) bytes — never a table
    * rewrite); visibility is resolved at read time (merge-on-read). All row
    * versions are retained, so any commit-ts snapshot stays readable. */
  def upsert(batch: DataFrame): Long = {
    val withDel =
      if (batch.columns.contains("_deleted")) batch
      else batch.withColumn("_deleted", lit(false))
    val cur = currentVersion
    val next = cur + 1
    withDel.dropDuplicates(keyCols :+ versionCol)
      .write.mode(SaveMode.Overwrite).format(format)
      // gpx deltas also carry the table version as the format-level MVCC
      // commit ts (option is ignored by parquet)
      .option("commitTs", next.toString)
      .save(deltaDir(next).toString)
    val members =
      (if (cur < 0) Seq.empty else manifest(cur)) :+ deltaDir(next).getFileName.toString
    writeManifest(next, members)
    commit(next)
    next
  }

  /** Fold every member of the current version into one base directory and
    * commit it as the next version. All row versions are retained (so
    * [[readAsOf]] time travel still works within the compacted base); older
    * table versions keep referencing their original directories. Bounded
    * read fan-in without blocking writers: the fold reads an immutable
    * version while new deltas keep committing on top. */
  def compact(): Long = {
    val cur = currentVersion
    require(cur >= 0, "nothing to compact")
    val next = cur + 1
    readVersion(cur).write.mode(SaveMode.Overwrite).format(format)
      .option("commitTs", next.toString)
      .save(baseDir(next).toString)
    writeManifest(next, Seq(baseDir(next).getFileName.toString))
    commit(next)
    next
  }

  /** Total bytes under one member directory (test/ops instrumentation). */
  def dirBytes(member: String): Long = {
    val p = root.resolve(member)
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
  }

  private def writeManifest(v: Long, members: Seq[String]): Unit = {
    Files.createDirectories(root)
    val tmp = root.resolve(s"_m.tmp.$v")
    Files.write(tmp, members.mkString("\n").getBytes)
    Files.move(tmp, manifestFile(v), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Atomic pointer swap: write tmp, then ATOMIC_MOVE over _CURRENT. */
  private def commit(v: Long): Unit = {
    Files.createDirectories(root)
    val tmp = root.resolve(s"_CURRENT.tmp.$v")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Structured Streaming CDC ingestion: foreachBatch -> SnapshotStore.upsert.
  * The streaming analog of Retina's gRPC UpdateRecord replay
  * (proto/retina.proto:34-50). */
object CdcUpsert {
  def start(
      stream: DataFrame,
      store: SnapshotStore,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(batch)
        ()
      }
      .start()
}
