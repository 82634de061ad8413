package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** W6 row-level late capture — the reference's `sideOutputLateData`
  * (`HotPages.java:67,79,83`) as observable tagged ROWS, not just drop
  * counters (which [[LateData]] provides).
  *
  * Mechanism: Flink routes a row to the late side output when
  * `ts < watermark − lateness`, with `watermark = maxTs − disorder`. Spark
  * has no row-level hook at that horizon — its watermark both defines
  * lateness AND silently drops. So we declare the operator's watermark with
  * a delay of `disorder + lateness + slack`: Spark then only ever drops
  * rows later than the slack budget (effectively nothing), while inside the
  * operator `currentWatermark + slack` equals Flink's side-output horizon
  * exactly:
  *
  *   sparkWm + slack = (maxTs − disorder − lateness − slack) + slack
  *                   = flinkWm − lateness.
  *
  * The split runs keyed on the downstream key, so it rides the same hash
  * exchange the stateful op needs anyway — no extra shuffle, no
  * single-partition funnel, and per-key parallelism at any scale. The op
  * itself is stateless (tag-and-forward); only the watermark bookkeeping
  * uses the streaming machinery. Divergence from Flink: the watermark
  * advances at micro-batch boundaries, not per-record.
  *
  * Downstream: filter `tag === "late"` to the side sink and
  * `tag === "ontime"` into the windowed aggregation — the K3 side-output
  * pattern (`graft.io.Sinks`).
  */
object LateSplit {

  /** One keyed event on the wire: (routing key, event-time millis). */
  final case class Hit(key: String, tsMs: Long)

  /** The tagged event: `tag` ∈ {"ontime", "late"}. */
  final case class TaggedHit(key: String, tsMs: Long, tag: String)

  /** Tagged event carrying a real timestamp column — the chained form for
    * feeding downstream stateful operators (Spark marks `ts` as the
    * output's event time, so no watermark redefinition is needed).
    */
  final case class TaggedHitTs(
      key: String, tsMs: Long, ts: java.sql.Timestamp, tag: String)

  /** Default "never drop in practice" budget for the TERMINAL [[split]]:
    * one week. Deliberately not a default on [[splitChained]], where slack
    * delays every downstream window close by the same amount.
    */
  val DefaultSlackMs: Long = 7L * 24 * 3600 * 1000

  /** The ONE horizon-tagging implementation (both public forms derive from
    * it): late iff `tsMs < sparkWm + slack`, which equals the Flink
    * side-output horizon (see object doc). Before any batch completes the
    * watermark is ≤ 0 and everything is on time.
    */
  class LateTagProcessorTs(slackMs: Long)
      extends StatefulProcessor[String, Hit, TaggedHitTs] {

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(
        key: String,
        rows: Iterator[Hit],
        timerValues: TimerValues): Iterator[TaggedHitTs] = {
      val horizon = timerValues.getCurrentWatermarkInMs() + slackMs
      rows.map(h => TaggedHitTs(h.key, h.tsMs, new java.sql.Timestamp(h.tsMs),
        if (h.tsMs < horizon) "late" else "ontime"))
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TaggedHitTs] =
      Iterator.empty
  }

  /** The chained form of [[split]]: output `ts` is declared as the event
    * time, so the tagged stream can feed windowed aggregations and other
    * stateful ops directly (Spark forbids re-declaring a watermark
    * downstream — this is the supported operator-chaining path). Emitted
    * rows within the slack budget are always at-or-ahead of the Spark
    * watermark, which is what chained event time requires; the downstream
    * windows close `slack + lateness` later than the reference's. Because
    * that latency cost is paid by every downstream window, `slackMs` has
    * NO default here: the week-long [[DefaultSlackMs]] is only appropriate
    * for the terminal [[split]] — silently inheriting it in a chained
    * pipeline would stall append-mode output by ~7 days of event time.
    */
  def splitChained(
      hits: Dataset[Hit],
      disorderMs: Long,
      latenessMs: Long,
      slackMs: Long): Dataset[TaggedHitTs] = {
    import hits.sparkSession.implicits._
    val delayMs = disorderMs + latenessMs + slackMs
    hits
      .withColumn("wm_ts",
        org.apache.spark.sql.functions.timestamp_millis(
          org.apache.spark.sql.functions.col("tsMs")))
      .withWatermark("wm_ts", s"$delayMs milliseconds")
      .as[Hit](Encoders.product[Hit])
      .groupByKey(_.key)
      .transformWithState(
        new LateTagProcessorTs(slackMs),
        "ts",
        OutputMode.Append())
  }

  /** Tag each row on-time/late against the Flink horizon
    * `maxTs − disorder − lateness`, for terminal consumption (no further
    * stateful ops). A stateless projection of [[splitChained]] — one
    * tagging implementation serves both forms. Requires the RocksDB state
    * store provider (as every transformWithState op does).
    */
  def split(
      hits: Dataset[Hit],
      disorderMs: Long,
      latenessMs: Long,
      slackMs: Long = DefaultSlackMs): Dataset[TaggedHit] = {
    import hits.sparkSession.implicits._
    splitChained(hits, disorderMs, latenessMs, slackMs)
      .map(t => TaggedHit(t.key, t.tsMs, t.tag))
  }
}
