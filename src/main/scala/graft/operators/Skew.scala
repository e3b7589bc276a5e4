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
    // collision-proof temp columns: user columns named "_salt"/"_rkey"
    // would be silently overwritten and dropped
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val saltC = s"_salt_$tag"
    val rkeyC = s"_rkey_$tag"
    val salted = large.withColumn(saltC,
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small
      .withColumn(saltC, explode(array((0 until saltFactor).map(lit): _*)))
      .withColumnRenamed(key, rkeyC)
    salted.join(replicated,
        salted(key) === replicated(rkeyC) && salted(saltC) === replicated(saltC),
        joinType)
      .drop(replicated(saltC))
      .drop(saltC, rkeyC)
  }
}
