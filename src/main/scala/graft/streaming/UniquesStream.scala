package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming rolling-uniques (live DAU/WAU) — the in-flight twin of
  * `AnalyticsJobs.rollingUniquesApprox`, which declares per-day HLL
  * sketch-merge as the 100 TB rolling-distinct path; this is that path
  * kept warm on the ingest stream instead of recomputed per batch.
  *
  * Shape: the batch query's explode-based contribution pattern, streamed —
  * an arrival on day d contributes to the 7 windows w ∈ [d, d+6], so each
  * window day is its own `transformWithState` key holding ONE HllSketch
  * in ValueState (KB-sized regardless of user cardinality — the sketch IS
  * the state bound; an exact distinct would hold the user set). When the
  * event-time timer at the window's day end fires, the watermark has
  * passed every contributing day, so the sketch is final: emit
  * (day, wau7_est), clear state. Windows that never saw their OWN day's
  * arrival (only future-window contributions) do not emit — mirroring the
  * batch query's join against observed days.
  *
  * Exactness contract (the `approx_distinct` rule): HLL estimates are
  * merge-order-sensitive, so the stream twin gates the same ±5% bound the
  * batch gate checks against exact counts (spec: shuffled multi-batch
  * arrivals land within 5% of `rollingUniques`' exact wau7), not
  * bit-equality. lgK matches `hll_sketch_agg`'s default (12, ~1.6% rse).
  *
  * Reference anchor: the per-key incremental-aggregate shape of
  * flink-uba's windowed counts (hotitem/HotItem.java:60) with a sketch
  * accumulator and a 7-day decorated window.
  */
object UniquesStream {

  /** `hll_sketch_agg`'s default lgConfigK. */
  val LgK = 12

  private val DayMs = 86400000L

  final case class WindowArrival(w: Int, day: Int, userId: Long,
      ts: java.sql.Timestamp)

  /** Live window metrics: dau from the own-day sketch, wau7 from the
    * 7-day window sketch, stickiness as the batch query's integer ppm
    * ratio of the two estimates.
    */
  final case class DayUniques(day: Int, dauEst: Long, wau7Est: Long,
      stickinessPpmEst: Long)

  /** Fan an event stream out to its 7 contributing windows; the watermark
    * is declared HERE, upstream of the stateful op.
    */
  def windowArrivals(events: DataFrame, delay: String): Dataset[WindowArrival] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .select(
        expr("datediff(cast(ts as date), date'1970-01-01')").cast("int")
          .as("day"),
        col("user_id").as("userId"), col("ts"))
      .select(explode(sequence(col("day"), col("day") + lit(6))).as("w"),
        col("day"), col("userId"), col("ts"))
      .as[WindowArrival]
  }

  /** Per-window rolling-unique estimates, emitted once per window on
    * watermark close (append mode).
    */
  def rollingUniques(arrivals: Dataset[WindowArrival]): Dataset[DayUniques] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.w)
      .transformWithState(new HllWindowProcessor(LgK),
        TimeMode.EventTime(), OutputMode.Append())
  }

  class HllWindowProcessor(lgK: Int)
      extends StatefulProcessor[Int, WindowArrival, DayUniques] {

    @transient private var sketch: ValueState[Array[Byte]] = _
    @transient private var ownSketch: ValueState[Array[Byte]] = _
    @transient private var armed: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Array[Byte]]("hll",
        Encoders.BINARY, TTLConfig.NONE)
      // second KB-sized sketch, fed only by the window's OWN day — live
      // DAU beside the 7-day WAU, same state bound; its existence also
      // marks "this window's own day was observed" (the batch join
      // against observed days), so no separate boolean is needed
      ownSketch = getHandle.getValueState[Array[Byte]]("hll_own",
        Encoders.BINARY, TTLConfig.NONE)
      armed = getHandle.getValueState[Boolean]("armed",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Int,
        rows: Iterator[WindowArrival],
        timerValues: TimerValues): Iterator[DayUniques] = {
      val hll =
        if (sketch.exists()) HllSketch.heapify(sketch.get())
        else new HllSketch(lgK, TgtHllType.HLL_8)
      lazy val hllOwn =
        if (ownSketch.exists()) HllSketch.heapify(ownSketch.get())
        else new HllSketch(lgK, TgtHllType.HLL_8)
      var sawOwnDay = false
      rows.foreach { r =>
        hll.update(r.userId)
        if (r.day == key) { hllOwn.update(r.userId); sawOwnDay = true }
      }
      sketch.update(hll.toUpdatableByteArray)
      if (sawOwnDay) ownSketch.update(hllOwn.toUpdatableByteArray)
      if (!(armed.exists() && armed.get())) {
        // contributions to window w all carry ts < end of day w, so once
        // the watermark passes that instant the sketch is final
        getHandle.registerTimer((key.toLong + 1L) * DayMs)
        armed.update(true)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Int,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DayUniques] = {
      // no-op when state is already cleared (the round-4 timer rule)
      if (!sketch.exists()) return Iterator.empty
      val out =
        if (ownSketch.exists()) {
          val dau = Math.round(
            HllSketch.heapify(ownSketch.get()).getEstimate)
          val wau = Math.round(HllSketch.heapify(sketch.get()).getEstimate)
          // the batch query's integer ppm ratio, over the live estimates
          val stick = if (wau > 0L) dau * 1000000L / wau else 0L
          Iterator.single(DayUniques(key, dau, wau, stick))
        } else Iterator.empty
      sketch.clear(); ownSketch.clear(); armed.clear()
      out
    }
  }
}
