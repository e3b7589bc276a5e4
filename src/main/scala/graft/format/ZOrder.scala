package graft.format

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional zone-map pruning —
  * beyond the reference (its ordered layout is a single sort order): a
  * lexicographic sort on (a, b) makes zone maps selective on `a` only,
  * while interleaving the bits of both keys gives every row group a
  * bounded range in BOTH dimensions, so predicates on either column (or
  * both) prune.
  *
  * Shape at scale: one tiny bounds aggregate (2 values per column reach
  * the driver), then a single range exchange on the z-value — the same
  * cost as a global sort, and the z-value math is plain codegen'd
  * integer expressions.
  */
object ZOrder {

  private val Bits = 16

  /** normalize a numeric column to [0, 2^Bits) given its bounds */
  private def norm(c: Column, mn: Column, mx: Column): Column = {
    val range = when(mx > mn, mx - mn).otherwise(lit(1.0))
    least(lit((1 << Bits) - 1), greatest(lit(0),
      floor((c.cast("double") - mn) / range * ((1 << Bits) - 1)).cast("long")))
  }

  /** Morton-interleave two Bits-wide ints: x bits land at even positions,
    * y bits at odd ones. */
  private def interleave(x: Column, y: Column): Column =
    (0 until Bits).map { k =>
      (shiftleft(shiftrightunsigned(x, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftrightunsigned(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce((a, b) => a + b)

  /** Rows of `df` clustered by the z-value of two numeric columns: range
    * exchange + within-partition sort, ready to write. Bounds come from
    * one aggregate over the input (at 100 TB: a full pass, but purely
    * map-side-combined min/max). */
  def cluster(df: DataFrame, c1: String, c2: String,
      partitions: Int = 0): DataFrame = {
    val b = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"zorder needs non-null bounds for $c1/$c2")
    val z = interleave(
      norm(col(c1), lit(b.getDouble(0)), lit(b.getDouble(1))),
      norm(col(c2), lit(b.getDouble(2)), lit(b.getDouble(3))))
    // collision-proof temp column: a user column named "_z" would be
    // silently overwritten and then dropped
    val zc = s"_z_${java.util.UUID.randomUUID().toString.take(8)}"
    val zed = df.withColumn(zc, z)
    val parted =
      if (partitions > 0) zed.repartitionByRange(partitions, col(zc))
      else zed.repartitionByRange(col(zc))
    parted.sortWithinPartitions(zc).drop(zc)
  }
}
