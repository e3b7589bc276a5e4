package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.io.File

/** Compaction job: merge an "ordered" layout (many small files, one per
  * load/micro-batch) into a "compact" layout (few large files) — the Spark
  * equivalent of the reference's PixelsCompactor
  * (pixels-core/.../compactor/PixelsCompactor.java:52; layouts + swap
  * docs/TPC-H.md:94-115, proto/metadata.proto:74).
  *
  * At scale: a pure read→coalesce→write job, no shuffle (coalesce only
  * narrows partitions); the swap is a directory rename, so readers see
  * either the old or the new layout, never a mix.
  */
object Compactor {
  final case class Result(inputFiles: Int, outputFiles: Int, rows: Long)

  /** Compact `inDir` into `outDir` targeting ~`targetFileBytes` per output
    * file. gpx directories take the NATIVE path: encoded chunk bytes are
    * copied verbatim and footers rebuilt — no decode/re-encode, no Spark
    * job (graft.format.GpxCompactor, mirroring PixelsCompactor.java:52).
    * Parquet directories fall back to a read→coalesce→write job. */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Result = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (format.GpxTable.listFiles(Seq(inDir), conf).nonEmpty) {
      val r = format.GpxCompactor.compact(inDir, outDir, conf, targetFileBytes)
      return Result(r.inputFiles, r.outputFiles, r.rows)
    }
    val inFiles = Option(new File(inDir).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
    val totalBytes = Option(new File(inDir).listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).map(_.length()).sum)
      .getOrElse(0L)
    val df = spark.read.parquet(inDir)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    df.coalesce(parts).write.mode(SaveMode.Overwrite).parquet(outDir)
    val outFiles = Option(new File(outDir).listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    Result(inFiles, outFiles, spark.read.parquet(outDir).count())
  }
}
