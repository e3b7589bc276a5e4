package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the continuous form of the batch e10
  * bucketed range join: clicks arriving on one stream are attributed to
  * the same user's views arriving on another, when the click falls inside
  * the view's attribution window.
  *
  * Scale shape: Spark co-partitions BOTH streams on the equality key
  * (user) — one shuffle each — and keeps per-key state only for rows
  * whose event time is still inside watermark + interval. Both inputs
  * MUST be watermarked: the watermark plus the two-sided time bound is
  * what lets the join evict state (a view can stop waiting for clicks
  * once the click watermark passes view ts + window; an unwatermarked
  * stream-stream join would buffer forever). State is O(arrival rate x
  * (watermark + window)) per key — bounded at any stream length, the
  * same policy argument as StreamDedup.
  *
  * The reference has no stream-SQL surface at all (SURVEY §2.3 — retina
  * is a replay path); this is beyond-reference capability that Spark
  * Structured Streaming provides natively once the join is declared
  * with the right bounds.
  */
object Attribution {

  /** `views`: (vts TIMESTAMP, user_id, view_id ...), `clicks`:
    * (cts TIMESTAMP, c_user, click_id ...). Emits one row per (click,
    * view) pair where the click is at or after the view and within
    * `windowMinutes`. `horizon` is the lateness watermark for both
    * sides (e.g. "1 hour"). */
  def attribute(views: DataFrame, clicks: DataFrame,
      windowMinutes: Int, horizon: String): DataFrame = {
    val v = views.withWatermark("vts", horizon)
    val c = clicks.withWatermark("cts", horizon)
    c.join(v, expr(
      s"""c_user = user_id AND
         |cts >= vts AND
         |cts <= vts + interval $windowMinutes minutes""".stripMargin))
  }
}
