package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** TIME-of-day helpers. Spark has no TIME type; the reference stores TIME
  * as millis-since-midnight int (TypeDescription TIME, proto/pixels.proto,
  * TimeColumnVector) — we adopt the same convention: an IntegerType column
  * of millis in [0, 86_400_000), with these helpers for conversion.
  * Documented in FIXTURES.md / SURVEY §7.4 as the TIME mapping.
  */
object TimeFunctions {

  /** millis-since-midnight from a timestamp column. The sub-second part
    * comes from unix_micros arithmetic (timezone-invariant: offsets are
    * whole minutes), not a per-row date_format("SSS") string round-trip —
    * this is a conversion helper meant for large scans. */
  def time_of_day_millis(ts: Column): Column =
    ((hour(ts) * 3600L + minute(ts) * 60L + second(ts)) * 1000L +
      pmod(unix_micros(ts), lit(1000000L)) / 1000L).cast(IntegerType)

  /** 'HH:mm:ss' string from a millis-since-midnight int column */
  def time_to_string(millis: Column): Column = {
    val s = (millis / 1000).cast(IntegerType)
    def ii(c: Column) = c.cast(IntegerType).cast("string")
    concat(
      lpad(ii(s / 3600), 2, "0"), lit(":"),
      lpad(ii(s % 3600 / 60), 2, "0"), lit(":"),
      lpad(ii(s % 60), 2, "0"))
  }

  /** hour bucket from millis-since-midnight */
  def time_hour(millis: Column): Column =
    (millis / 3600000).cast(IntegerType)
}
