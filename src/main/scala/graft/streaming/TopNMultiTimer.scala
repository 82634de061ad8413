package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.TopNState.{KeyedCount, RankedRow}

/** X2 on Spark 4's `transformWithState`: the ONLY Spark operator with
  * multiple concurrently-live timers per key — so the reference's two
  * genuine timers (`HotPages.java:148-158`: emit at windowEnd+1 ms, clear
  * at windowEnd+lateness) register as two real timers instead of the
  * phase-flag re-arming that `GroupState`'s single timeout forces
  * (SURVEY.md §7.4 hard-part 2).
  *
  * State: a native `MapState[String, Long]` (url→count upsert — the exact
  * container the reference uses) plus a `ValueState` emitted flag. Late
  * refinements arriving between the two horizons re-emit the ranking, i.e.
  * the true Flink allowedLateness re-fire, subject to Spark's late-row
  * filter (input rows behind the watermark are dropped upstream, so pair
  * this with a watermark delay covering the disorder budget).
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
class TopNProcessor(n: Int, latenessMs: Long)
    extends StatefulProcessor[Long, KeyedCount, RankedRow] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var emitted: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    emitted = getHandle.getValueState[Boolean](
      "emitted", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  private def ranked(windowEnd: Long): Iterator[RankedRow] =
    counts.iterator().toSeq
      .sortBy { case (k, c) => (-c, k) }
      .take(n)
      .zipWithIndex
      .map { case ((k, c), i) => RankedRow(windowEnd, i + 1, k, c) }
      .iterator

  override def handleInputRows(
      windowEnd: Long,
      rows: Iterator[KeyedCount],
      timerValues: TimerValues): Iterator[RankedRow] = {
    rows.foreach(r => counts.updateValue(r.key, r.cnt)) // MapState upsert
    val alreadyEmitted = emitted.exists() && emitted.get()
    if (!emitted.exists()) {
      emitted.update(false)
      val wm = timerValues.getCurrentWatermarkInMs()
      // two live timers, exactly the reference's registrations; the cleanup
      // horizon is forced strictly past the emit horizon so a degenerate
      // latenessMs <= 1 can't collapse them into one firing (which would
      // leak the key's MapState forever)
      val emitAt = math.max(windowEnd + 1, wm + 1)
      getHandle.registerTimer(emitAt)
      getHandle.registerTimer(math.max(windowEnd + latenessMs, emitAt + 1))
    }
    // late refinement after first emission: re-fire the updated ranking
    if (alreadyEmitted) ranked(windowEnd) else Iterator.empty
  }

  override def handleExpiredTimer(
      windowEnd: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[RankedRow] = {
    val isCleanupHorizon = emitted.exists() && emitted.get()
    if (!isCleanupHorizon) {
      emitted.update(true) // first horizon: emit, keep state for lateness
      ranked(windowEnd)
    } else {
      counts.clear() // second horizon: lateness over
      emitted.clear()
      Iterator.empty
    }
  }
}

object TopNMultiTimer {

  /** Streaming windowed top-N with two genuine event-time timers per key. */
  def topN(counts: Dataset[KeyedCount], n: Int, latenessMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[RankedRow] = {
    import counts.sparkSession.implicits._
    counts
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("windowEnd")))
      .withWatermark("ts", watermarkDelay)
      .as[KeyedCount]
      .groupByKey(_.windowEnd)
      .transformWithState(
        new TopNProcessor(n, latenessMs),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
