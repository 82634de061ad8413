package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Streaming path analysis — the in-flight twin of
  * `AnalyticsJobs.eventPaths`: per user, consecutive events (ordered by
  * event time, id tie-break) emit (from_kind, to_kind) transition edges.
  *
  * Out-of-order arrivals make "the previous event" undefined until the
  * watermark passes, so the machine buffers arrivals in per-key ListState
  * and resolves edges only over the watermark-closed prefix: on each
  * event-time timer, pending events at or before the watermark are sorted
  * (tsMs, eventId), chained behind the last resolved event (the bridge
  * carried in ValueState), emitted as edges, and dropped — state holds
  * only the open suffix plus one bridge row, so it is bounded by the
  * disorder horizon, not the stream length. Edges therefore match the
  * batch lead() exactly for any arrival order within the watermark.
  *
  * TWS discipline (CLAUDE.md round-4): the resolution timer re-arms at
  * watermark+1 from BOTH handleInputRows and handleExpiredTimer while
  * anything is pending, pending timers are deleted once the key drains,
  * and the expiry handler no-ops when state is already cleared.
  */
object PathStream {

  final case class PathEvent(key: Long, eventId: Long, kind: String, tsMs: Long)

  final case class PathEdge(
      key: Long, fromKind: String, toKind: String, fromTs: Long, toTs: Long)

  /** The bridge: the last watermark-resolved event of the key. */
  final case class Bridge(eventId: Long, kind: String, tsMs: Long)

  /** `disorderMs` is the bounded-disorder watermark budget (T3): arrivals
    * more than `disorderMs` behind the max seen event time are late and
    * dropped, exactly as in every other stateful op here — the stream ≡
    * batch contract holds for arrival orders within the budget.
    */
  def edges(events: Dataset[PathEvent], disorderMs: Long = 0L)
      : Dataset[PathEdge] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("tsMs")))
      .withWatermark("ts", s"$disorderMs milliseconds")
      .as[PathEvent]
      .groupByKey(_.key)
      .transformWithState(new PathProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  class PathProcessor extends StatefulProcessor[Long, PathEvent, PathEdge] {

    @transient private var pending: ListState[PathEvent] = _
    @transient private var bridge: ValueState[Bridge] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[PathEvent]("pending",
        Encoders.product[PathEvent], TTLConfig.NONE)
      bridge = getHandle.getValueState[Bridge]("bridge",
        Encoders.product[Bridge], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[PathEvent],
        timerValues: TimerValues): Iterator[PathEdge] = {
      rows.foreach(pending.appendValue)
      // Arm the resolution timer only when no live timer already covers
      // the next watermark advance: a fresh wm+1 every micro-batch would
      // accumulate one pending timer per batch for a hot key (each firing
      // as a guarded no-op until drain) — churn, not correctness.
      val next = timerValues.getCurrentWatermarkInMs() + 1
      if (!getHandle.listTimers().exists(_ >= next))
        getHandle.registerTimer(next)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PathEdge] = {
      val buf = pending.get().toSeq
      if (buf.isEmpty) return Iterator.empty // state already drained: no-op
      val wm = timerValues.getCurrentWatermarkInMs()
      val (closed, open) = buf.partition(_.tsMs <= wm)
      if (closed.isEmpty) {
        // nothing resolvable yet — re-arm for the next watermark advance
        getHandle.registerTimer(wm + 1)
        return Iterator.empty
      }
      val ordered = closed.sortBy(e => (e.tsMs, e.eventId))
      val prev = if (bridge.exists()) Some(bridge.get()) else None
      val chain = prev.map(b => PathEvent(key, b.eventId, b.kind, b.tsMs))
        .toSeq ++ ordered
      val out = chain.sliding(2).collect {
        case Seq(a, b) => PathEdge(key, a.kind, b.kind, a.tsMs, b.tsMs)
      }.toSeq
      val last = ordered.last
      bridge.update(Bridge(last.eventId, last.kind, last.tsMs))
      pending.clear()
      if (open.nonEmpty) {
        open.foreach(pending.appendValue)
        getHandle.registerTimer(wm + 1)
      } else {
        // drained: delete any still-registered timers (they outlive state)
        getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      }
      out.iterator
    }
  }
}
