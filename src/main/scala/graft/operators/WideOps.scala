package graft.operators

import graft.GQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickBench-style wide-table workload (reference: docs/CLICKBENCH.md:8-19
  * loads a 105-column `hits` table and runs the 43-query suite,
  * scripts/sql/clickbench_schema.sql:7-113).
  *
  * A 42-column `hits` table is DERIVED deterministically from the events
  * table — ids, timestamps, many low-cardinality string dimensions,
  * URL-ish strings, flag ints and fixed-point measures — then stored in
  * the gpx format sorted by (counter_id, event_sec) so zone maps have
  * structure. The queries are hits-shaped: multi-column group-bys, top-N
  * over URLs/titles, selective wide-row scans, narrow projections over the
  * wide schema (the projection-pushdown economics a 100-column table
  * exists to test).
  *
  * Every derivation expression is DIALECT-NEUTRAL SQL evaluated by BOTH
  * engines: Spark builds the gpx table with them, the DuckDB oracle
  * recomputes the same CTE from parquet, so the hash compare gates the
  * whole wide-row write/scan path. Only the `base` projection differs per
  * dialect (nanos handling: EventOps.events normalizes ts to epoch-nanos
  * longs whatever the parquet unit; DuckDB reads the timestamp natively
  * and epoch_ns() lands on the same values).
  */
object WideOps {

  /** shared (name, expression) list over the dialect-specific `base`
    * projection; every expression parses identically in Spark SQL and
    * DuckDB and yields the same value AND type */
  private val cols: Seq[(String, String)] = Seq(
    "watch_id" -> "event_id",
    "user_id" -> "user_id",
    "counter_id" -> "user_id % 100",
    "counter_class" -> "user_id % 3",
    "region_id" -> "user_id % 7",
    "client_ip" -> "167772160 + event_id % 65536",
    "event_sec" -> "sec",
    "event_date" -> "event_date",
    "hour_of_day" -> "hr_abs % 24",
    "minute_of_hour" -> "min_abs % 60",
    "ts_nanos" -> "tsn",
    "event_type" -> "event_type",
    "url" -> ("concat('https://example.com/s', CAST(user_id % 50 AS STRING)," +
      " '/page/', CAST(event_id % 1000 AS STRING))"),
    "referer" -> ("CASE event_id % 4 WHEN 0 THEN 'https://search.example/q'" +
      " WHEN 1 THEN 'https://social.example/feed' WHEN 2 THEN ''" +
      " ELSE 'https://news.example/top' END"),
    "title" -> "concat('Title ', CAST(event_id % 1000 AS STRING))",
    "search_phrase" -> ("CASE WHEN event_id % 20 = 0 THEN" +
      " concat('query ', CAST(event_id % 500 AS STRING)) ELSE '' END"),
    "is_mobile" -> "CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END",
    "is_new_user" -> "CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END",
    "is_refresh" -> "CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END",
    "is_bounce" -> "CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END",
    "os" -> ("CASE user_id % 5 WHEN 0 THEN 'linux' WHEN 1 THEN 'windows'" +
      " WHEN 2 THEN 'macos' WHEN 3 THEN 'android' ELSE 'ios' END"),
    "browser" -> ("CASE event_id % 6 WHEN 0 THEN 'chrome' WHEN 1 THEN 'firefox'" +
      " WHEN 2 THEN 'safari' WHEN 3 THEN 'edge' WHEN 4 THEN 'opera'" +
      " ELSE 'other' END"),
    "country" -> ("CASE user_id % 6 WHEN 0 THEN 'US' WHEN 1 THEN 'CN'" +
      " WHEN 2 THEN 'DE' WHEN 3 THEN 'IN' WHEN 4 THEN 'BR' ELSE 'JP' END"),
    "city" -> ("CASE user_id % 12 WHEN 0 THEN 'springfield' WHEN 1 THEN 'riverton'" +
      " WHEN 2 THEN 'lakeside' WHEN 3 THEN 'hillview' WHEN 4 THEN 'meadowbrook'" +
      " WHEN 5 THEN 'stonebridge' WHEN 6 THEN 'fairhaven' WHEN 7 THEN 'oakdale'" +
      " WHEN 8 THEN 'elmwood' WHEN 9 THEN 'crestfield' WHEN 10 THEN 'brookside'" +
      " ELSE 'ashford' END"),
    "lang" -> ("CASE user_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'zh'" +
      " WHEN 2 THEN 'es' ELSE 'de' END"),
    "phone_model" -> ("CASE WHEN event_id % 3 = 0 THEN" +
      " concat('Phone-', CAST(user_id % 20 AS STRING)) ELSE '' END"),
    "resolution_w" -> ("CASE event_id % 4 WHEN 0 THEN 1920 WHEN 1 THEN 1366" +
      " WHEN 2 THEN 2560 ELSE 375 END"),
    "resolution_h" -> ("CASE event_id % 4 WHEN 0 THEN 1080 WHEN 1 THEN 768" +
      " WHEN 2 THEN 1440 ELSE 667 END"),
    "color_depth" -> "CASE WHEN event_id % 2 = 0 THEN 24 ELSE 32 END",
    "duration_ms" -> "(event_id * 7919) % 60000",
    "load_time_ms" -> "(event_id * 31) % 3000",
    "scroll_pct" -> "event_id % 101",
    "session_depth" -> "event_id % 50",
    "ad_id" -> "CASE WHEN event_id % 13 = 0 THEN event_id % 5000 ELSE 0 END",
    "utm_source" -> ("CASE event_id % 5 WHEN 0 THEN 'ads' WHEN 1 THEN 'email'" +
      " WHEN 2 THEN 'organic' WHEN 3 THEN 'social' ELSE '' END"),
    "utm_medium" -> ("CASE event_id % 3 WHEN 0 THEN 'cpc' WHEN 1 THEN 'banner'" +
      " ELSE '' END"),
    "value" -> "value",
    "revenue" -> "CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END",
    "price_cents" -> "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
    "age" -> "18 + user_id % 60",
    "gender_code" -> "user_id % 2",
    "income_band" -> ("CASE WHEN value < 50 THEN 'low'" +
      " WHEN value < 200 THEN 'mid' ELSE 'high' END"),
    "props_len" -> "CAST(length(props) AS BIGINT)")

  /** Spark base: events.ts arrives as raw epoch nanos (LongType).
    * FLOOR division throughout ((x - pmod(x, b)) div b): Spark's `div`
    * truncates toward zero where the DuckDB oracle's `//` floors, so a
    * negative-epoch event would land one second/hour/day off. */
  private val sparkBase: Seq[String] = {
    def fdiv(a: String, b: Long) = s"((($a) - pmod($a, ${b}L)) div ${b}L)"
    val sec = fdiv("ts", 1000000000L)
    Seq(
      "event_id", "user_id", "ts AS tsn",
      s"$sec AS sec",
      s"${fdiv(sec, 3600L)} AS hr_abs",
      s"${fdiv(sec, 60L)} AS min_abs",
      s"to_date(timestamp_seconds($sec)) AS event_date",
      "event_type", "value", "props")
  }

  /** DuckDB base: events.ts is a native timestamp (any unit); epoch_ns is
    * exact for both nanos and micros files */
  private val duckBase: String =
    """SELECT event_id, user_id, epoch_ns(ts) AS tsn,
      |  epoch_ns(ts)//1000000000 AS sec,
      |  (epoch_ns(ts)//1000000000)//3600 AS hr_abs,
      |  (epoch_ns(ts)//1000000000)//60 AS min_abs,
      |  CAST(ts AS DATE) AS event_date, event_type, value, props
      |FROM events""".stripMargin

  private def selectList: String =
    cols.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")

  /** oracle prefix: recompute the wide table from parquet */
  private def duckCte: String =
    s"WITH base AS ($duckBase),\nhits AS (SELECT\n  $selectList\nFROM base)"

  /** the wide table as a Spark DataFrame (before gpx storage) */
  def hitsDf(s: SparkSession, d: String): DataFrame =
    EventOps.events(s, d)
      .selectExpr(sparkBase: _*)
      .selectExpr(cols.map { case (n, e) => s"$e AS $n" }: _*)

  /** hits stored once per sf in gpx, clustered like ClickBench's
    * (CounterID, EventDate) physical order — via the ORDERED-LAYOUT path:
    * hash-partition on counter_id (co-locates each counter's rows without
    * the range-boundary sampling pass a global orderBy needs), then the
    * writer's persisted `sortBy` spec sorts (counter_id, event_sec)
    * within each partition. Same zone-map selectivity on the filter
    * columns, one exchange, and the layout is table metadata (_sortspec)
    * so later INSERTs keep it. */
  def hitsGpx(s: SparkSession, d: String): DataFrame = {
    val dir = FormatOps.cachedDir(d, "hits_ordered") { dir =>
      hitsDf(s, d).repartition(col("counter_id"))
        .write.format("gpx").mode("overwrite")
        .option("sortBy", "counter_id,event_sec")
        .option("rowGroupRows", "8192").save(dir)
    }
    s.read.format("gpx").load(dir)
  }

  /** a wide query: one dialect-neutral SQL text runs over the gpx-backed
    * `hits` view in Spark and over the recomputed CTE in DuckDB */
  private def wq(name: String, sql: String): GQuery =
    GQuery(name, (s, d) => {
      hitsGpx(s, d).createOrReplaceTempView("hits")
      s.sql(sql)
    }, Some(s"$duckCte\n$sql"))

  val queries: Seq[GQuery] = Seq(

    // global flags/measures over a filtered scan
    wq("w01_wide_count_flags",
      """SELECT COUNT(*) AS n, CAST(SUM(is_mobile) AS BIGINT) AS n_mobile,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sum_rev,
        |  MAX(duration_ms) AS max_dur, MIN(load_time_ms) AS min_load
        |FROM hits WHERE counter_id % 2 = 0""".stripMargin),

    // ClickBench Q"top counters": group by id, top-N by traffic
    wq("w02_wide_topk_counters",
      """SELECT counter_id, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM hits GROUP BY counter_id
        |ORDER BY n DESC, counter_id LIMIT 10""".stripMargin),

    // non-empty search phrases, most frequent first
    wq("w03_wide_search_phrases",
      """SELECT search_phrase, COUNT(*) AS n
        |FROM hits WHERE search_phrase <> ''
        |GROUP BY search_phrase ORDER BY n DESC, search_phrase
        |LIMIT 15""".stripMargin),

    // URL traffic ranking with distinct visitors
    wq("w04_wide_url_traffic",
      """SELECT url, COUNT(*) AS views, COUNT(DISTINCT user_id) AS visitors,
        |  CAST(SUM(is_refresh) AS BIGINT) AS refreshes
        |FROM hits GROUP BY url
        |ORDER BY views DESC, url LIMIT 20""".stripMargin),

    // multi-column group-by matrix
    wq("w05_wide_os_browser_matrix",
      """SELECT os, browser, is_mobile, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM hits GROUP BY os, browser, is_mobile
        |ORDER BY os, browser, is_mobile""".stripMargin),

    // selective wide-row scan: few rows, few columns of a 42-column table
    wq("w06_wide_selective_columns",
      """SELECT watch_id, event_sec, url, title, duration_ms
        |FROM hits WHERE url LIKE '%/page/42' AND is_mobile = 1
        |ORDER BY watch_id""".stripMargin),

    // date-range + region rollup
    wq("w07_wide_date_region",
      """SELECT event_date, region_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  COUNT(DISTINCT counter_id) AS n_counters
        |FROM hits WHERE hour_of_day >= 6 AND hour_of_day < 18
        |GROUP BY event_date, region_id
        |ORDER BY event_date, region_id""".stripMargin),

    // histogram via integer bucket floors (no division: dialect-neutral)
    wq("w08_wide_duration_histogram",
      """SELECT duration_ms - duration_ms % 5000 AS bucket_ms, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM hits GROUP BY duration_ms - duration_ms % 5000
        |ORDER BY bucket_ms""".stripMargin),

    // 2 of 42 columns: the projection-pushdown economics a wide table tests
    wq("w09_wide_narrow_projection",
      """SELECT counter_class, CAST(SUM(price_cents) AS BIGINT) AS cents,
        |  COUNT(*) AS n
        |FROM hits GROUP BY counter_class ORDER BY counter_class""".stripMargin),

    // top pages per region via window over aggregation
    wq("w10_wide_top_pages_per_region",
      """SELECT region_id, title, views FROM (
        |  SELECT region_id, title, COUNT(*) AS views,
        |    ROW_NUMBER() OVER (PARTITION BY region_id
        |      ORDER BY COUNT(*) DESC, title) AS rk
        |  FROM hits GROUP BY region_id, title) t
        |WHERE rk <= 3 ORDER BY region_id, views DESC, title""".stripMargin),

    // exact median latency per dimension: `median` is the one exact
    // interpolated quantile both engines name identically, and 0.5's
    // interpolation factor is an exact binary fraction, so the doubles
    // hash-match. (ClickBench's quantile queries use approx sketches;
    // the exact form is the stronger correctness gate.)
    wq("w11_wide_latency_median",
      """SELECT os, CAST(median(load_time_ms) AS DOUBLE) AS med_load,
        |  CAST(median(duration_ms) AS DOUBLE) AS med_dur,
        |  COUNT(*) AS n
        |FROM hits WHERE is_refresh = 0
        |GROUP BY os ORDER BY os""".stripMargin),

    // ClickBench's regex-extraction family (Q "top path segments"): pull
    // the section out of every URL with regexp_extract — evaluated by
    // BOTH engines, so semantics (group capture, no-match => '') must
    // agree exactly. The scan still prunes to the referenced columns
    // (WideSpec asserts the pixel counts).
    wq("w12_wide_url_regex_sections",
      """SELECT regexp_extract(url, 'https://[^/]+/(s[0-9]+)/', 1) AS section,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM hits GROUP BY regexp_extract(url, 'https://[^/]+/(s[0-9]+)/', 1)
        |ORDER BY n DESC, section LIMIT 15""".stripMargin),

    // regex REPLACE: normalize page ids out of URLs. The pattern is
    // $-anchored so it matches at most once — DuckDB's first-match
    // regexp_replace and Spark's replace-all then agree by construction.
    wq("w13_wide_url_normalize",
      """SELECT regexp_replace(url, '/page/[0-9]+$', '/page/_') AS page_class,
        |  COUNT(*) AS views, COUNT(DISTINCT user_id) AS visitors
        |FROM hits GROUP BY regexp_replace(url, '/page/[0-9]+$', '/page/_')
        |ORDER BY views DESC, page_class LIMIT 20""".stripMargin),

    // referer domain extraction incl. the empty-referer class ('' => no
    // match => '' in both engines)
    wq("w14_wide_referer_domains",
      """SELECT regexp_extract(referer, '^https://([^/]+)', 1) AS domain,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM hits GROUP BY regexp_extract(referer, '^https://([^/]+)', 1)
        |ORDER BY n DESC, domain""".stripMargin),

    // ClickBench's IP-range family: /24 prefix grouping with pure integer
    // arithmetic (no dialect-specific inet types), top networks by traffic
    wq("w15_wide_ip_prefix24",
      """SELECT client_ip - client_ip % 256 AS net24, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(is_bounce) AS BIGINT) AS bounces
        |FROM hits GROUP BY client_ip - client_ip % 256
        |ORDER BY n DESC, net24 LIMIT 15""".stripMargin),

    // dotted-quad rendering via arithmetic only: every octet is an exact
    // small integer, so the double division casts identically in both
    // engines; groups by /16
    wq("w16_wide_ip_dotted16",
      """SELECT concat(
        |    CAST(CAST((client_ip - client_ip % 16777216) / 16777216 AS BIGINT) AS STRING),
        |    '.',
        |    CAST(CAST((client_ip % 16777216 - client_ip % 65536) / 65536 AS BIGINT) AS STRING),
        |    '.x.x') AS net16,
        |  COUNT(*) AS n
        |FROM hits GROUP BY concat(
        |    CAST(CAST((client_ip - client_ip % 16777216) / 16777216 AS BIGINT) AS STRING),
        |    '.',
        |    CAST(CAST((client_ip % 16777216 - client_ip % 65536) / 65536 AS BIGINT) AS STRING),
        |    '.x.x')
        |ORDER BY n DESC, net16""".stripMargin),

    // ClickBench's LIKE-heavy family: infix wildcards defeat zone maps by
    // design — this is the full-string-scan stress shape (two infix
    // patterns + a conjunction)
    wq("w17_wide_like_scan",
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN title LIKE '%42%' THEN 1 ELSE 0 END) AS BIGINT) AS t42,
        |  COUNT(DISTINCT counter_id) AS n_counters
        |FROM hits
        |WHERE url LIKE '%/page/7%' AND url NOT LIKE '%/page/77%'""".stripMargin),

    // prefix LIKE over the mostly-empty search_phrase column: selective
    // rows, ordered narrow projection of the wide row
    wq("w18_wide_search_prefix",
      """SELECT search_phrase, COUNT(*) AS n,
        |  MIN(event_sec) AS first_sec, MAX(event_sec) AS last_sec
        |FROM hits WHERE search_phrase LIKE 'query 1%'
        |GROUP BY search_phrase ORDER BY n DESC, search_phrase
        |LIMIT 25""".stripMargin),

    // string-length analytics over the URL-ish columns (ClickBench's
    // length/empty-ratio shapes) — pure scalar math, no regex
    wq("w19_wide_url_lengths",
      """SELECT os,
        |  CAST(SUM(length(url)) AS BIGINT) AS url_chars,
        |  CAST(SUM(length(title)) AS BIGINT) AS title_chars,
        |  CAST(SUM(CASE WHEN referer = '' THEN 1 ELSE 0 END) AS BIGINT) AS no_ref,
        |  COUNT(*) AS n
        |FROM hits GROUP BY os ORDER BY os""".stripMargin),

    // ---- residual ClickBench shapes (reference ClickbenchQuery.java
    // Q1-Q42; w01-w19 cover the rest of the suite) ----

    // Q1/Q2: bare COUNT(*) and a filtered count over a flag-ish column —
    // the footer-stats fast path vs a one-column scan
    wq("w23_wide_plain_counts",
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN ad_id <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ads
        |FROM hits""".stripMargin),

    // Q3/Q4/Q5/Q6: global SUM/AVG/COUNT-DISTINCT mix (avg over an int
    // column is an exact int64 sum / count, identical doubles both sides)
    wq("w24_wide_global_aggs",
      """SELECT CAST(SUM(ad_id) AS BIGINT) AS sum_ad, COUNT(*) AS n,
        |  CAST(AVG(resolution_w) AS DOUBLE) AS avg_w,
        |  CAST(AVG(user_id) AS DOUBLE) AS avg_uid,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT search_phrase) AS n_phrases
        |FROM hits""".stripMargin),

    // Q7: global min/max over the date and time columns
    wq("w25_wide_date_minmax",
      """SELECT MIN(event_date) AS min_d, MAX(event_date) AS max_d,
        |  MIN(event_sec) AS min_s, MAX(event_sec) AS max_s
        |FROM hits""".stripMargin),

    // Q8: engaged dimension ranked by traffic (advengineid analog)
    wq("w26_wide_ad_engines",
      """SELECT ad_id % 50 AS engine, COUNT(*) AS n
        |FROM hits WHERE ad_id <> 0
        |GROUP BY ad_id % 50 ORDER BY n DESC, engine LIMIT 10""".stripMargin),

    // Q9/Q10: region rollup with distinct visitors AND an avg measure
    wq("w27_wide_region_rollup",
      """SELECT region_id, CAST(SUM(ad_id) AS BIGINT) AS sum_ad,
        |  COUNT(*) AS c, CAST(AVG(resolution_w) AS DOUBLE) AS avg_w,
        |  COUNT(DISTINCT user_id) AS u
        |FROM hits GROUP BY region_id
        |ORDER BY c DESC, region_id LIMIT 10""".stripMargin),

    // Q11/Q12: mobile-model family over a mostly-empty string dimension
    wq("w28_wide_phone_models",
      """SELECT os, phone_model, COUNT(DISTINCT user_id) AS u, COUNT(*) AS n
        |FROM hits WHERE phone_model <> ''
        |GROUP BY os, phone_model
        |ORDER BY u DESC, os, phone_model LIMIT 10""".stripMargin),

    // Q15: (engine, phrase) two-level drill on the selective phrase rows
    wq("w29_wide_source_phrases",
      """SELECT utm_source, search_phrase, COUNT(*) AS c
        |FROM hits WHERE search_phrase <> ''
        |GROUP BY utm_source, search_phrase
        |ORDER BY c DESC, utm_source, search_phrase LIMIT 10""".stripMargin),

    // Q16/Q17: user-grain group-by — the HIGH-cardinality aggregation
    // stress (one group per user x phrase); partial agg + a bounded top-k
    wq("w30_wide_user_phrase_topk",
      """SELECT user_id, search_phrase, COUNT(*) AS c
        |FROM hits GROUP BY user_id, search_phrase
        |ORDER BY c DESC, user_id, search_phrase LIMIT 10""".stripMargin),

    // Q19: EXTRACT-minute grain added to the user drill
    wq("w31_wide_user_minute_phrase",
      """SELECT user_id, minute_of_hour AS m, search_phrase, COUNT(*) AS c
        |FROM hits GROUP BY user_id, minute_of_hour, search_phrase
        |ORDER BY c DESC, user_id, m, search_phrase LIMIT 10""".stripMargin),

    // Q20: point filter on the user key (zone-map/point-lookup shape)
    wq("w32_wide_user_point",
      """SELECT user_id, watch_id FROM hits WHERE user_id = 42
        |ORDER BY watch_id""".stripMargin),

    // Q24: SELECT * top-k — the full 43-column row materialized for a
    // LIKE-selected slice, ordered by time (wide-row top-k economics)
    wq("w33_wide_star_topk",
      """SELECT * FROM hits WHERE url LIKE '%/page/12%'
        |ORDER BY event_sec, watch_id LIMIT 10""".stripMargin),

    // Q25/Q26/Q27: single-column ORDER BY variants over the phrase rows
    // (ties at the limit boundary carry identical projected values, so
    // the result multiset is deterministic)
    wq("w34_wide_phrase_by_time",
      """SELECT search_phrase FROM hits WHERE search_phrase <> ''
        |ORDER BY event_sec, search_phrase LIMIT 10""".stripMargin),
    wq("w35_wide_phrase_by_phrase",
      """SELECT search_phrase FROM hits WHERE search_phrase <> ''
        |ORDER BY search_phrase LIMIT 10""".stripMargin),

    // Q30: the wide SUM fan-out (90 sum expressions in the reference; 30
    // here carries the same plan shape — one scan, many parallel
    // aggregates, no groups)
    wq("w36_wide_sum_fanout",
      "SELECT " + (0 until 30).map(k =>
        s"CAST(SUM(resolution_w + $k) AS BIGINT) AS s$k").mkString(", ") +
        " FROM hits"),

    // Q33/Q36: near-unique two-column group keys (+ arithmetic variants
    // of the same key — Q36's shape) — the worst-case aggregation
    // cardinality, bounded only by the top-k
    wq("w37_wide_watch_ip_groups",
      """SELECT watch_id, client_ip, client_ip - 1 AS ip1, client_ip - 2 AS ip2,
        |  COUNT(*) AS c, CAST(SUM(is_refresh) AS BIGINT) AS refr,
        |  CAST(AVG(resolution_w) AS DOUBLE) AS avg_w
        |FROM hits WHERE search_phrase <> ''
        |GROUP BY watch_id, client_ip, client_ip - 1, client_ip - 2
        |ORDER BY c DESC, watch_id LIMIT 10""".stripMargin),

    // Q37/Q38: the "one counter, one month" pageview family — selective
    // conjunctive filter + URL/title ranking
    wq("w38_wide_counter_month_urls",
      """SELECT url, COUNT(*) AS pageviews
        |FROM hits
        |WHERE counter_id = 62 AND event_date >= DATE '2024-01-05'
        |  AND event_date <= DATE '2024-01-20' AND is_refresh = 0 AND url <> ''
        |GROUP BY url ORDER BY pageviews DESC, url LIMIT 10""".stripMargin),

    // Q39/Q41: same family with OFFSET pagination (deep page fetch)
    wq("w39_wide_counter_paged",
      """SELECT title, COUNT(*) AS pageviews
        |FROM hits
        |WHERE counter_id % 10 = 2 AND event_date >= DATE '2024-01-05'
        |  AND event_date <= DATE '2024-01-25' AND is_refresh = 0
        |GROUP BY title ORDER BY pageviews DESC, title
        |LIMIT 10 OFFSET 100""".stripMargin),

    // Q40/Q42: traffic-source attribution with a CASE group key and the
    // resolution matrix, paged
    wq("w40_wide_src_dst_paged",
      """SELECT utm_source,
        |  CASE WHEN utm_source = '' THEN referer ELSE '' END AS src,
        |  url AS dst, resolution_w, resolution_h, COUNT(*) AS pageviews
        |FROM hits
        |WHERE event_date >= DATE '2024-01-05' AND event_date <= DATE '2024-01-25'
        |  AND is_refresh = 0
        |GROUP BY utm_source,
        |  CASE WHEN utm_source = '' THEN referer ELSE '' END,
        |  url, resolution_w, resolution_h
        |ORDER BY pageviews DESC, utm_source, src, dst, resolution_w, resolution_h
        |LIMIT 10 OFFSET 50""".stripMargin),

    // Q22/Q23: conjunctive LIKE + NOT LIKE with MIN-string aggregates and
    // a per-phrase distinct-user count — the infix wildcards defeat zone
    // maps, so this is the wide-scan + string-min aggregation shape
    wq("w41_wide_phrase_like_minurl",
      """SELECT search_phrase, MIN(url) AS min_url, MIN(title) AS min_title,
        |  COUNT(*) AS c, COUNT(DISTINCT user_id) AS n_users
        |FROM hits
        |WHERE title LIKE '%Title 1%' AND url NOT LIKE '%/page/11%'
        |  AND search_phrase <> ''
        |GROUP BY search_phrase ORDER BY c DESC, search_phrase LIMIT 10""".stripMargin),

    // Q34/Q35: the bare near-unique URL ranking (with Q35's constant
    // group key) — highest-cardinality single-string aggregation, bounded
    // only by the top-k
    wq("w42_wide_url_rank",
      """SELECT 1 AS one, url, COUNT(*) AS c
        |FROM hits GROUP BY one, url
        |ORDER BY c DESC, url LIMIT 10""".stripMargin),

    // Q43 (the suite's last query): minute-truncated time series over a
    // date-range slice, ordered by the minute bucket and paged — the
    // dashboard-refresh shape (dialect-neutral minute truncation via
    // event_sec arithmetic)
    wq("w43_wide_minute_series_paged",
      """SELECT event_sec - (event_sec % 60) AS minute_bucket,
        |  COUNT(*) AS pageviews
        |FROM hits
        |WHERE counter_id % 5 = 2 AND event_date >= DATE '2024-01-03'
        |  AND event_date <= DATE '2024-01-28'
        |GROUP BY event_sec - (event_sec % 60)
        |ORDER BY minute_bucket LIMIT 10 OFFSET 100""".stripMargin))

  /** Approximate-quantile family (ClickBench's quantile queries use
    * sketches): Spark's percentile_approx and DuckDB's approx_quantile
    * are DIFFERENT sketches with different answers, so the sketch VALUES
    * cannot hash-match an oracle. Instead each query is registered as
    * its own ERROR AUDIT: the approximate answer is bounded against the
    * exact answer computed in the same query, and only the (exactly
    * reproducible) group keys/counts plus the pass/fail bits reach the
    * driver — an estimator regression flips a bit to 0 and the hash
    * mismatches. The sketch value itself stays spec-gated in WideSpec. */
  val approxQueries: Seq[GQuery] = Seq(
    // approx_percentile's contract is a RANK guarantee (±n/accuracy, so
    // ±0.0001n at the default 10000): the returned element's rank lies
    // well inside [q-0.01, q+0.01], hence its VALUE lies between the
    // exact interpolated percentiles at those ranks.
    GQuery("w20_wide_approx_quantiles", (s, d) => {
      hitsGpx(s, d).createOrReplaceTempView("hits")
      s.sql(
        """SELECT os, COUNT(*) AS n,
          |  CAST(approx_percentile(duration_ms, 0.5) BETWEEN
          |    percentile(duration_ms, 0.49) AND percentile(duration_ms, 0.51)
          |    AS INT) AS p50_ok,
          |  CAST(approx_percentile(duration_ms, 0.9) BETWEEN
          |    percentile(duration_ms, 0.89) AND percentile(duration_ms, 0.91)
          |    AS INT) AS p90_ok,
          |  CAST(approx_percentile(load_time_ms, 0.99) BETWEEN
          |    percentile(load_time_ms, 0.98) AND percentile(load_time_ms, 1.0)
          |    AS INT) AS p99_ok
          |FROM hits GROUP BY os ORDER BY os""".stripMargin)
    },
      Some(s"""$duckCte
              |SELECT os, COUNT(*) AS n, 1 AS p50_ok, 1 AS p90_ok, 1 AS p99_ok
              |FROM hits GROUP BY os ORDER BY os""".stripMargin)),

    // ClickBench "uniq" family: HLL approximate distinct-user counts per
    // key — the 100 TB answer to COUNT(DISTINCT) when the exact
    // per-group shuffle is the bottleneck. Spark's HLL++ and DuckDB's
    // approx sketch differ numerically, so rows-only gated; WideSpec
    // bounds the estimate against the EXACT distinct count (HLL++ at
    // rsd=0.01 is far tighter than the 5% the spec allows).
    GQuery("w21_wide_approx_distinct_users", (s, d) => {
      hitsGpx(s, d).createOrReplaceTempView("hits")
      // HLL++ at rsd=0.01 against the exact distinct count, gated at 5x
      // the configured error — the same bound WideSpec asserts
      s.sql(
        """SELECT country, COUNT(*) AS hits,
          |  CAST(abs(approx_count_distinct(user_id, 0.01)
          |      - COUNT(DISTINCT user_id))
          |    <= 0.05 * COUNT(DISTINCT user_id) AS INT) AS users_ok
          |FROM hits GROUP BY country ORDER BY country""".stripMargin)
    },
      Some(s"""$duckCte
              |SELECT country, COUNT(*) AS hits, 1 AS users_ok
              |FROM hits GROUP BY country ORDER BY country""".stripMargin)),

    // The sketch-ROLLUP pattern w21 scales into: materialize per-(date,
    // country) HLL sketch partials ONCE (at 100 TB this is a maintained
    // rollup table refreshed per ingest batch, ~rows = dates x countries),
    // then answer any ad-hoc slice by MERGING sketches — mergeability is
    // the property exact distinct counts fundamentally lack (you cannot
    // sum per-day uniques). Uses Spark's Apache DataSketches HLL
    // (hll_sketch_agg / hll_union_agg / hll_sketch_estimate), which
    // serializes to portable bytes — the same sketches a Trino/Druid
    // serving layer could merge. DuckDB has no compatible sketch =>
    // rows-only gate; WideSpec bounds the estimates against exact
    // distinct counts and asserts slice-merge consistency.
    GQuery("w22_wide_sketch_rollup", (s, d) => {
      val h = hitsGpx(s, d)
      val rollup = h
        .groupBy("event_date", "country")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
          count(lit(1)).as("n"))
      val merged = rollup.groupBy("country")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
            .as("approx_users"),
          sum(col("n")).as("hits"))
      // the audit side (exact distinct per country) exists to gate the
      // MERGED estimate — at 100 TB the rollup replaces this scan; here
      // it proves sketch-merge ≈ direct count within the lgK=14 error
      val exact = h.groupBy("country")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, "country")
        .select(col("country"), col("hits"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.05).cast("int").as("users_ok"))
        .orderBy("country")
    },
      Some(s"""$duckCte
              |SELECT country, COUNT(*) AS hits, 1 AS users_ok
              |FROM hits GROUP BY country ORDER BY country""".stripMargin)))
}
