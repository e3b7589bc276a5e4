package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.Try

/** Versioned snapshot store with atomic metadata swap — the Spark-native
  * equivalent of the reference's Retina write path + MVCC visibility
  * (pixels-retina/.../MemTable.java:31-75, RGVisibility.java:34-60,
  * metadata AtomicSwapFiles proto/metadata.proto:74).
  *
  * Design for scale: each committed version is an immutable parquet
  * directory; readers resolve `_CURRENT` (one tiny file) and then read an
  * immutable snapshot — no shared mutable visibility state, no reader/writer
  * races. Upsert = union + latest-per-key, one shuffle on the key columns.
  * Deletes are logical: a `_deleted` column filtered at read time
  * (delete-bitmap analog). Time travel = read any retained version.
  */
class SnapshotStore(
    spark: SparkSession,
    path: String,
    keyCols: Seq[String],
    versionCol: String) {

  private def root = Paths.get(path)
  private def currentFile = root.resolve("_CURRENT")

  def currentVersion: Long = {
    if (!Files.exists(currentFile)) -1L
    else Try(new String(Files.readAllBytes(currentFile)).trim.toLong).getOrElse(-1L)
  }

  private def versionDir(v: Long) = root.resolve(f"v_$v%06d")

  /** Read a specific committed version (time travel). */
  def readVersion(v: Long): DataFrame =
    spark.read.parquet(versionDir(v).toString)

  /** Read the current snapshot: latest visible row per key, excluding
    * logically-deleted rows (merge-on-read over retained versions). */
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
    * Version N+1 retains ALL row versions (current ∪ batch, deduped on
    * key+commit-ts), so any commit-ts snapshot stays readable; visibility
    * is resolved at read time (merge-on-read). At-least-once redelivery is
    * idempotent via the key+ts dedup. Version retention/compaction of old
    * row versions is Compactor's job. */
  def upsert(batch: DataFrame): Long = {
    val withDel =
      if (batch.columns.contains("_deleted")) batch
      else batch.withColumn("_deleted", lit(false))
    val cur = currentVersion
    val merged = if (cur < 0) withDel else {
      val existing = readVersion(cur)
      existing.unionByName(withDel, allowMissingColumns = true)
    }
    val deduped = merged.dropDuplicates(keyCols :+ versionCol)
    val next = cur + 1
    deduped.write.mode(SaveMode.Overwrite).parquet(versionDir(next).toString)
    commit(next)
    next
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
