package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming interaction-graph maintenance — the in-flight side of
  * `AnalyticsJobs.itemPagerank`'s edge aggregation: arriving events parse
  * to (user, item) interaction edges, and each DISTINCT edge is emitted
  * exactly once, the first time it is seen within the watermark horizon
  * (`dropDuplicatesWithinWatermark` — state bounded by arrival rate ×
  * horizon, never the full history). A production ranker consumes this
  * as the graph DELTA feed: the persisted edge set plus this stream is
  * always the batch `distinct()` of the full log, which is exactly what
  * the spec pins.
  *
  * The fixpoint itself stays batch (PageRank is a whole-graph recurrence
  * — there is nothing incremental to emit per event without changing the
  * algorithm); the streaming contract is the edge feed that keeps the
  * next batch iteration's input current.
  */
object GraphStream {

  /** First-seen (src, dst) interaction edges from a watermarked event
    * stream with the `{"k": n}` props payload — same namespacing and
    * regexp parse as the batch query (user → 2·id, item → 2·k+1).
    */
  def firstSeenEdges(events: DataFrame, tsCol: String, delay: String)
      : DataFrame =
    events
      .withWatermark(tsCol, delay)
      .select(col(tsCol),
        (col("user_id") * 2).as("src"),
        (regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1)
          .cast("long") * 2 + 1).as("dst"))
      .filter(col("dst").isNotNull)
      .dropDuplicatesWithinWatermark("src", "dst")
      .select(col("src"), col("dst"))
}
