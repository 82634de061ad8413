package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming changelog→latest-state compaction — the in-flight twin of
  * `AnalyticsJobs.latestState` and the closest Spark analogue of the
  * reference's keyed ValueState upsert (HotItem.java:60's keyed-state
  * discipline applied to profile maintenance): per (user, event_type)
  * the running first-seen, event count, and the (ts, event_id)-argmax
  * last event, updated as events arrive.
  *
  * Every profile field is ORDER-INSENSITIVE — min, count, and a
  * lexicographic struct max whose (us, event_id) prefix is a total order
  * (event_id is unique) — so arrival order, batching, and partitioning
  * cannot change any emitted value and the final emission per key is
  * bit-equal to the batch query with NO watermark buffering (unlike the
  * lead/path twins, which must resolve a closed prefix). Update output
  * mode; a key re-emits only in micro-batches that changed it, and
  * `n_events` strictly increases per change, so "row with the max
  * n_events per key" IS the final state (spec-pinned).
  *
  * Scale shape: one user-keyed stateful aggregation; state is one small
  * row per LIVE (user, type) key — profile state is living state by
  * design (a profile has no expiry; same contract as Flink keyed state
  * without TTL), bounded by the key space, never by the event history.
  */
object ProfileStream {

  /** Input needs (user_id, event_type, event_id, value, `tsCol`). */
  def profiles(events: DataFrame, tsCol: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .select(col("user_id"), col("event_type"),
        unix_micros(col(tsCol)).as("us"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("us")).as("first_us"),
        max(struct(col("us"), col("event_id"), col("value"))).as("m"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("event_type"), col("first_us"),
        col("m.us").as("last_us"), col("m.event_id").as("last_event_id"),
        col("m.value").as("last_value"), col("n_events"))
}
