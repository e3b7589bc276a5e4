package graft.operators

import graft.{Det, GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators: ClickBench-style aggregation, sessionization,
  * CDC upsert merge (reference Retina, pixels-retina/.../MemTable.java:31),
  * and MVCC snapshot reads (reader option transTimestamp,
  * PixelsReaderOption.java:39).
  *
  * The engine-portable epoch representation for events.ts is an epoch-nanos
  * long (DuckDB side: epoch_ns, which is exact for any parquet timestamp
  * unit). The physical parquet type is NOT under our control — the data
  * generator has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) files
  * — so ingestion is type-adaptive, the Spark analog of the reference's
  * tolerant schema evolution (PixelsReaderOption.java:34,126): inspect the
  * inferred type and normalize to the nanos-long contract. The CDC/MVCC
  * queries are the BATCH expression of the semantics; the streaming path
  * (foreachBatch upsert) lives in graft.streaming and is exercised by
  * CdcStreamSpec.
  */
object EventOps {

  /** events with ts normalized to epoch nanos (LongType), whatever the
    * physical parquet timestamp unit. Session TZ is UTC, so casting an
    * NTZ wall-clock to timestamp is the identity epoch mapping — the same
    * convention DuckDB's epoch_ns applies on the oracle side. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // already epoch nanos (legacy nanos files)
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected long/timestamp")
    }
  }

  private val NanosPerSec = 1000000000L

  /** FLOOR division SQL fragment: Spark's `div` truncates toward zero
    * while the DuckDB oracle's `//` (and CAST(ts AS DATE)) floor — a
    * pre-1970 (negative-epoch) event would land one second/day/window
    * off under truncation. pmod is non-negative, so subtracting it
    * always rounds DOWN to the multiple. */
  private def fdiv(a: String, b: Long): String =
    s"((($a) - pmod($a, ${b}L)) div ${b}L)"

  val queries: Seq[GQuery] = Seq(

    // ClickBench-shape aggregation: by event type and day.
    GQuery("e01_events_daily_agg", (s, d) =>
      events(s, d)
        .withColumn("day", to_date(timestamp_seconds(expr(fdiv("ts", NanosPerSec)))))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type", "day"),
      Some(s"""SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
              |  ${Det.o.dsum("value")} AS sum_value,
              |  MIN(value) AS min_value, MAX(value) AS max_value,
              |  COUNT(DISTINCT user_id) AS n_users
              |FROM events GROUP BY event_type, CAST(ts AS DATE)
              |ORDER BY event_type, day""".stripMargin)),

    // Sessionization: a session break is a >30 min gap between a user's
    // consecutive events. One shuffle on user_id; window is per-user local.
    GQuery("e02_sessionize", (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("sec", expr(fdiv("ts", NanosPerSec)))
        .withColumn("prev_sec", lag(col("sec"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
      Some("""SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
             |      LAG(epoch_ns(ts) // 1000000000, 1) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
             |    FROM events) t1) t2
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // CDC upsert merge-on-read: latest version per (user_id, event_type)
    // key — the batch equivalent of Retina's MemTable replay + visibility.
    GQuery("e03_cdc_upsert_latest", (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n_versions", count(lit(1)).over(
          Window.partitionBy(col("user_id"), col("event_type"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("latest_event_id"),
          col("value").as("latest_value"), col("n_versions"))
        .orderBy("user_id", "event_type")
    },
      Some("""SELECT user_id, event_type, event_id AS latest_event_id,
             |  value AS latest_value, n_versions
             |FROM (SELECT *,
             |        ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |          ORDER BY ts DESC, event_id DESC) AS rn,
             |        COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
             |      FROM events) t
             |WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // MVCC snapshot read: same merge but only versions with
    // commit_ts <= snapshot timestamp are visible (time travel).
    GQuery("e04_mvcc_snapshot", (s, d) => {
      // snapshot: 2024-01-15 00:00:00 UTC
      val snapNs = 1705276800L * NanosPerSec
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .filter(col("ts") <= snapNs)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("latest_event_id"), col("value").as("latest_value"))
        .orderBy("user_id", "event_type")
    },
      Some("""SELECT user_id, event_type, event_id AS latest_event_id, value AS latest_value
             |FROM (SELECT *,
             |        ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |          ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') t
             |WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // Tumbling-window aggregation (6h buckets) — the batch shape of the
    // Structured Streaming windowed agg (window start as epoch seconds).
    GQuery("e05_tumbling_window", (s, d) =>
      events(s, d)
        .withColumn("win_start",
          expr(s"(${fdiv("ts", NanosPerSec)} - pmod(${fdiv("ts", NanosPerSec)}, 21600L))"))
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy("win_start", "event_type"),
      Some(s"""SELECT (epoch_ns(ts) // 1000000000) // 21600 * 21600 AS win_start,
              |  event_type, COUNT(*) AS n, ${Det.o.dsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2
              |ORDER BY win_start, event_type""".stripMargin)),

    // Property extraction from the JSON-ish props column via portable
    // string surgery (props = '{"k": N}'): the reference has no native
    // JSON functions either (SURVEY §2.3) — the front-end engine does it.
    // JSON property extraction. Spark side: codegen'd regexp_extract that
    // tolerates key order / whitespace / extra keys — get_json_object
    // would be the full-JSON form but it is a CodegenFallback expression
    // and breaks whole-stage codegen for the scan stage (measured 20x on
    // this query at sf0.1: 1 s -> 20 s); the anchored-key regex keeps the
    // stage fused. DuckDB oracle uses real json_extract, so any semantic
    // divergence on the corpus fails the hash gate. (The reference has no
    // native JSON at all, SURVEY §2.3.)
    GQuery("e06_props_extract", (s, d) =>
      events(s, d)
        .withColumn("k", expr(
          """cast(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) as int)"""))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("k_bucket"),
      Some("""SELECT CAST(k % 10 AS INT) AS k_bucket, COUNT(*) AS n,
             |  MIN(k) AS min_k, MAX(k) AS max_k
             |FROM (SELECT CAST(json_extract(props, '$.k') AS INT) AS k
             |      FROM events) t
             |GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // ClickBench-style top-N entities by aggregate measure.
    GQuery("e07_top_users_by_value", (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(Det.dsum(col("value")).as("total_value"), count(lit(1)).as("n"))
        .orderBy(col("total_value").desc, col("user_id"))
        .limit(10),
      Some(s"""SELECT user_id, ${Det.o.dsum("value")} AS total_value, COUNT(*) AS n
              |FROM events GROUP BY user_id
              |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin)),

    // ClickBench-style engagement histogram: users bucketed by how many
    // distinct event types they produced.
    GQuery("e08_event_type_diversity", (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(countDistinct(col("event_type")).as("n_types"))
        .groupBy("n_types")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("n_types"),
      Some("""SELECT n_types, COUNT(*) AS n_users
             |FROM (SELECT user_id, COUNT(DISTINCT event_type) AS n_types
             |      FROM events GROUP BY user_id) t
             |GROUP BY n_types ORDER BY n_types""".stripMargin)),

    // AS-OF join: each click matched to the user's most recent view at or
    // before it (the trades/quotes temporal-join shape). Spark has no ASOF
    // operator; the scale-correct composition is union + tag + one
    // per-user window with an ignore-nulls carry-forward — ONE shuffle on
    // user_id, per-row O(1) state, no per-key loop, no theta join. Views
    // are first deduped to one per (user, ts) with an explicit (max
    // event_id) tie-break so the result is deterministic in both engines.
    GQuery("e09_asof_join", (s, d) => {
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("v_event_id"),
          max_by(col("value"), col("event_id")).as("v_value"))
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast(LongType).as("event_id"),
          col("v_event_id"), col("v_value"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id"),
          lit(null).cast(LongType).as("v_event_id"),
          lit(null).cast(DoubleType).as("v_value"))
      // at equal ts the view (side 0) sorts first, so `ts >= view.ts`
      // matches (ASOF inclusive semantics, same as DuckDB's >=)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      v.unionByName(c)
        .withColumn("m_event_id", last(col("v_event_id"), ignoreNulls = true).over(w))
        .withColumn("m_value", last(col("v_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("event_id"),
          col("m_event_id").as("asof_view_id"), col("m_value").as("asof_value"))
        .orderBy("user_id", "event_id")
    },
      Some("""WITH v AS (
             |  SELECT user_id, ts, MAX(event_id) AS v_event_id,
             |         arg_max(value, event_id) AS v_value
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
             |SELECT c.user_id, c.event_id,
             |       v.v_event_id AS asof_view_id, v.v_value AS asof_value
             |FROM c ASOF LEFT JOIN v
             |  ON c.user_id = v.user_id AND c.ts >= v.ts
             |ORDER BY c.user_id, c.event_id""".stripMargin)),

    // Range (interval) join: count the views inside each purchase's
    // 30-minute attribution window, per user. The naive plan is a theta
    // join (per-user cartesian); the scale path buckets time at the
    // interval length so every interval overlaps at most TWO buckets —
    // the join becomes an EQUALITY join on (user_id, bucket) Spark can
    // hash-partition, with the exact range predicate as a residual
    // filter. Work scales with matches, not with |purchases|x|views|.
    GQuery("e10_range_join_bucketed", (s, d) => {
      val WinNs = 1800L * NanosPerSec // 30 min, == the bucket width
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("t0"), (col("ts") + WinNs).as("t1"))
        // integer `div`, not `/`: epoch-nanos exceed double's 53-bit
        // mantissa, float division would mis-bucket
        .withColumn("bkt",
          explode(sequence(expr(s"t0 div ${WinNs}L"), expr(s"t1 div ${WinNs}L"))))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("vts"),
          col("event_id").as("v_id"))
        .withColumn("bkt", expr(s"vts div ${WinNs}L"))
      p.join(v,
          p("user_id") === v("v_user") && p("bkt") === v("bkt") &&
            col("vts") >= col("t0") && col("vts") <= col("t1"),
          "left")
        .groupBy(col("p_id"), col("user_id"))
        .agg(countDistinct(col("v_id")).as("n_views"))
        .orderBy("p_id")
    },
      Some("""SELECT p.event_id AS p_id, p.user_id,
             |       COUNT(DISTINCT v.event_id) AS n_views
             |FROM (SELECT user_id, event_id, epoch_ns(ts) AS t0,
             |             epoch_ns(ts) + 1800000000000 AS t1
             |      FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT user_id, epoch_ns(ts) AS vts, event_id
             |           FROM events WHERE event_type = 'view') v
             |  ON p.user_id = v.user_id AND v.vts >= p.t0 AND v.vts <= p.t1
             |GROUP BY 1, 2 ORDER BY p_id""".stripMargin)),

    // Ordered funnel with per-stage deadlines: how far does each user get
    // through view -> click-within-48h -> purchase-within-48h, where each
    // stage must happen strictly AFTER the earliest reach of the previous
    // one and inside its window? Three chained window minima over the
    // SAME user partitioning — Catalyst reuses one Exchange for all
    // three, so the whole funnel is a single shuffle, then a
    // partial-aggregated rollup. The per-user funnel state is two
    // timestamps, never an event list — the shape that survives users
    // with millions of events.
    GQuery("e11_funnel", (s, d) => {
      val StageNs = 48L * 3600 * NanosPerSec
      val w = Window.partitionBy(col("user_id"))
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("tv",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("tc",
          min(when(col("event_type") === "click" && col("ts") > col("tv") &&
            col("ts") <= col("tv") + StageNs, col("ts"))).over(w))
        .withColumn("tp",
          min(when(col("event_type") === "purchase" && col("ts") > col("tc") &&
            col("ts") <= col("tc") + StageNs, col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("tv")).as("tv"), max(col("tc")).as("tc"),
          max(col("tp")).as("tp"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("tv")).as("reached_view"),
          count(col("tc")).as("reached_click"),
          count(col("tp")).as("converted"))
    },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_type
             |           FROM events),
             |s1 AS (SELECT user_id, tsn, event_type,
             |    MIN(CASE WHEN event_type = 'view' THEN tsn END)
             |      OVER (PARTITION BY user_id) AS tv FROM e),
             |s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click'
             |      AND tsn > tv AND tsn <= tv + 172800000000000 THEN tsn END)
             |      OVER (PARTITION BY user_id) AS tc FROM s1),
             |s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase'
             |      AND tsn > tc AND tsn <= tc + 172800000000000 THEN tsn END)
             |      OVER (PARTITION BY user_id) AS tp FROM s2),
             |u AS (SELECT user_id, MAX(tv) AS tv, MAX(tc) AS tc,
             |             MAX(tp) AS tp FROM s3 GROUP BY user_id)
             |SELECT COUNT(*) AS n_users,
             |  COUNT(tv) AS reached_view,
             |  COUNT(tc) AS reached_click,
             |  COUNT(tp) AS converted
             |FROM u""".stripMargin)),

    // Cohort retention: users grouped by first-activity day; for each
    // (cohort, day-offset) the distinct returning users and the retention
    // rate against the cohort's size. Three partial-aggregatable shuffles
    // (user-day distinct, per-user min, per-cohort count) — no window, no
    // per-user event lists; cohort sizes come from the offset-0 rows of
    // the same aggregate (self-join on the tiny cohort dimension, which
    // Spark broadcasts), so the event table is scanned ONCE.
    GQuery("e12_cohort_retention", (s, d) => {
      val ev = events(s, d)
        .withColumn("day", to_date(timestamp_seconds(expr(fdiv("ts", NanosPerSec)))))
        .select(col("user_id"), col("day")).distinct()
      val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      val ret = ev.join(cohorts, "user_id")
        .withColumn("offset_days",
          datediff(col("day"), col("cohort_day")).cast(IntegerType))
        .groupBy("cohort_day", "offset_days")
        .agg(countDistinct(col("user_id")).as("n_users"))
      val sizes = ret.filter(col("offset_days") === 0)
        .select(col("cohort_day"), col("n_users").as("cohort_size"))
      ret.join(broadcast(sizes), "cohort_day")
        .withColumn("retention",
          col("n_users").cast(DoubleType) / col("cohort_size"))
        .select("cohort_day", "offset_days", "n_users", "cohort_size", "retention")
        .orderBy("cohort_day", "offset_days")
    },
      Some("""WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |fc AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
             |r AS (SELECT cohort_day,
             |    CAST(date_diff('day', cohort_day, day) AS INT) AS offset_days,
             |    COUNT(DISTINCT ev.user_id) AS n_users
             |  FROM ev JOIN fc ON ev.user_id = fc.user_id
             |  GROUP BY 1, 2),
             |cs AS (SELECT cohort_day, n_users AS cohort_size FROM r
             |  WHERE offset_days = 0)
             |SELECT r.cohort_day AS cohort_day, offset_days, n_users,
             |  cohort_size,
             |  CAST(n_users AS DOUBLE) / cohort_size AS retention
             |FROM r JOIN cs USING (cohort_day)
             |ORDER BY cohort_day, offset_days""".stripMargin))
  )
}
