package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility: salting for hot keys.
  *
  * At 100 TB a handful of hot keys (a viral document, a default user id)
  * make one shuffle partition take hours. AQE's skew-join split handles
  * sort-merge cases; explicit salting is the general tool when the build
  * side is small enough to replicate: the large side scatters each key
  * into `saltFactor` sub-keys, the small side replicates each row to all
  * sub-keys, and the join key becomes (key, salt) — hot partitions shrink
  * by saltFactor with identical join semantics (inner/left).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted. Result columns =
    * large.* ++ small.* minus small's join key (like a USING join). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
      .withColumnRenamed(key, "_rkey")
    salted.join(replicated,
        salted(key) === replicated("_rkey") && salted("_salt") === replicated("_salt"),
        joinType)
      .drop(replicated("_salt"))
      .drop("_salt", "_rkey")
  }
}
