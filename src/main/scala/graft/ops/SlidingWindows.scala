package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding (hopping) event-time windows — SURVEY.md §2.7 W1–W4, §2.6 A1–A7.
  *
  * Reference semantics: `timeWindow(Time.hours(1), Time.minutes(5))` with an
  * incremental `AggregateFunction` + a `WindowFunction` decorating the result
  * with `window.getEnd` (`HotItem.java:59-60,76-108`). Spark-first: a single
  * `groupBy(key, window(ts, size, slide))` — Catalyst plans it as partial →
  * final `HashAggregateExec`, i.e. the map-side combine the reference builds
  * by hand, and the only shuffle is the one keyed exchange.
  *
  * Scale: the expansion factor is size/slide (12 for 1h/5min) applied at the
  * *partial-aggregate* level, not by materializing 12× rows before the
  * shuffle; shuffled data is one row per (key, window) per map partition.
  * Window ends are exposed as epoch-second Longs (`window_end`) so results
  * are engine-portable (parquet ns/µs representation never leaks out).
  */
object SlidingWindows {

  /** Per-key count per sliding window:
    * (key, window_end: Long epoch-sec, cnt: Long).
    */
  def slidingCount(
      df: DataFrame, key: Column, ts: Column,
      size: String, slide: String, keyName: String): DataFrame =
    slidingAgg(df, key, ts, size, slide, keyName, count(lit(1)).as("cnt"))

  /** General per-key sliding-window aggregation. */
  def slidingAgg(
      df: DataFrame, key: Column, ts: Column,
      size: String, slide: String, keyName: String,
      aggs: Column*): DataFrame =
    df.groupBy(key.as(keyName), window(ts, size, slide))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_end", unix_timestamp(col("window.end")))
      .drop("window")
}
