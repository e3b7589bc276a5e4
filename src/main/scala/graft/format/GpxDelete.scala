package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL `DELETE FROM <gpx table> WHERE ...` (reference analog: retina's
  * delete path, proto/retina.proto:34-50 — there deletes mask visibility;
  * here affected files are compacted without the matching rows).
  *
  * Scale shape: the footer zone maps select ONLY the files that may hold a
  * matching row — a key-targeted delete on a sorted/bucketed layout
  * rewrites a handful of files, not the table. Each affected file is
  * rewritten by a Spark job (executor-side rows, no driver materialization)
  * and swapped in under a fresh name that KEEPS the original as a suffix,
  * so bucket-suffix routing (part-*-bN.gpx) survives. SQL semantics: rows
  * where the predicate is NULL are kept (DELETE removes only TRUE rows). */
object GpxDelete {

  /** refuse filters on synthetic metadata columns (_file/_commit_ts):
    * the rewrite below reads files with the DATA schema, so they would
    * not resolve — Spark then routes the delete through the row-level
    * operation, whose scan serves metadata columns natively */
  def translatable(f: Filter): Boolean =
    f.references.forall(c => !GpxTable.isSynthetic(c)) && toColumn(f).isDefined

  /** sources.Filter -> Column for the delete-supported subset; None marks
    * the filter untranslatable (canDeleteWhere then refuses, and Spark
    * reports the delete as unsupported instead of half-applying it). */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  def run(schema: StructType, roots: Seq[String],
      filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val conf = new Configuration()
    val pred = filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(lit(true))
    // a row is DELETED when the predicate is TRUE; null-predicate rows stay
    val keepCond = !(pred <=> lit(true))
    val dataSchema =
      StructType(schema.filterNot(f => GpxTable.isSynthetic(f.name)))
    // zone-map prune: untouched files keep their bytes (and their commitTs)
    val affected = GpxTable.listFiles(roots, conf).filter { f =>
      val footer = GpxFileReader.FooterCache.get(f, conf)
      footer.rowGroups.exists(rg =>
        filters.forall(GpxFileReader.mayMatch(_, footer.schema, rg)))
    }
    affected.foreach { f =>
      val path = new Path(f)
      val fs = path.getFileSystem(conf)
      // underscore prefix keeps the scratch dir invisible to listFiles
      val tmp = new Path(path.getParent, s"_delete_tmp_${path.getName}")
      fs.delete(tmp, true)
      // MVCC history for SURVIVORS: the rewrite re-stamps each kept row
      // with its ORIGINAL row-group commitTs (one output file per distinct
      // ts — almost always exactly one), so FOR TIMESTAMP AS OF a
      // pre-delete time still sees every row the delete kept, regardless
      // of which files the zone maps happened to touch. Rows the delete
      // REMOVED are gone from history — the documented copy-on-write
      // stance, same as compaction.
      val footer = GpxFileReader.FooterCache.get(f, conf)
      val tsValues = footer.rowGroups.map(_.commitTs).distinct
      // table-schema read: evolved files null-fill absent columns so the
      // predicate resolves; the rewrite upgrades the file to the current
      // schema (nullable columns), which is the compaction contract too.
      // _commit_ts is served synthetically per row group, zero extra I/O.
      val withTs = spark.read.format("gpx")
        .schema(dataSchema.add(org.apache.spark.sql.types.StructField(
          GpxTable.CommitTsCol, org.apache.spark.sql.types.LongType,
          nullable = false)))
        .load(f)
      tsValues.zipWithIndex.foreach { case (ts, i) =>
        val keep = withTs
          .filter(col(GpxTable.CommitTsCol) === lit(ts))
          .drop(GpxTable.CommitTsCol)
          .filter(keepCond)
        val sub = new Path(tmp, s"t$i")
        keep.coalesce(1).write.format("gpx")
          .option("commitTs", ts.toString)
          .mode("overwrite").save(sub.toString)
        val produced = fs.listStatus(sub).map(_.getPath)
          .filter(_.getName.endsWith(".gpx"))
        val survivors = produced.headOption.map(p =>
          GpxFileReader.readFooter(p.toString, conf).rowGroups.map(_.numRows.toLong).sum)
          .getOrElse(0L)
        // crash-safe order: make the replacement visible FIRST (fresh name,
        // original name kept as suffix so the -bN bucket tag stays last),
        // then drop the original — a crash in between duplicates the kept
        // rows instead of losing them
        if (survivors > 0L) {
          val dest = new Path(path.getParent,
            s"d${java.util.UUID.randomUUID().toString.take(8)}-${path.getName}")
          if (!fs.rename(produced.head, dest))
            throw new java.io.IOException(s"delete rewrite rename failed: $f")
        } // else: every row of this ts matched -> no replacement file
      }
      fs.delete(path, false)
      fs.delete(tmp, true)
    }
  }
}
