package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Streaming day-over-day event-mix drift — the in-flight twin of
  * `AnalyticsJobs.eventDrift`: arriving events roll into per-(day, type)
  * tumbling-window counts (stage 1), and a chained stateful resolver
  * (stage 2) compares each closed day against the previous observed day,
  * emitting the same integer χ²-style statistic, volume, and
  * top-contributing type the batch query computes.
  *
  * Two chained stateful operators, so the round-4 rules apply: stage-1
  * emits a day's (day, type) rows only once the watermark passes the day
  * end, stage-2 input therefore arrives already at-or-behind the
  * watermark, its wm+1 timers fire on the NEXT advance, and tests close
  * the pipeline with two successive watermark jumps.
  *
  * Batch-parity note: the batch query densifies the day×type grid over
  * ALL types observed in the corpus. A never-yet-seen type's densified
  * contribution is identically zero ((0−0)²·10⁶ div (0+1) = 0 for every
  * day before its first appearance), so resolving against the types seen
  * SO FAR emits the same drift_q and n_events. The only reachable
  * divergence is top_type on a day whose contributions are ALL zero and
  * where a still-unseen type sorts lexicographically first — a fully
  * static mix, where no monitor has anything to report.
  *
  * Scale shape: stage 1 is the standard watermarked window aggregate
  * (corpus-sized input, day×type-sized output). Stage 2 keys on a
  * CONSTANT — a sequential recurrence over the tiny aggregate stream
  * (the BPE/union-find rule: day-over-day comparison has no parallelism
  * to buy), holding one previous-day count map plus the open buffer,
  * bounded by the type alphabet, never by the corpus.
  */
object DriftStream {

  final case class DayTypeCount(day: Long, eventType: String, c: Long)

  final case class DriftRow(
      day: Long, n_events: Long, drift_q: Long, top_type: String)

  /** Carried state: previous observed day's counts + every type seen. */
  final case class DriftMemo(
      prevDay: Long, prevTypes: Seq[String], prevCounts: Seq[Long],
      seenTypes: Seq[String])

  /** Stage 1: per-(day, type) counts over `tsCol`, emitted on day close.
    * `day` is the epoch-day index (the batch query's datediff form).
    */
  def dayCounts(events: DataFrame, tsCol: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(
        expr("datediff(cast(window.start as date), date'1970-01-01')")
          .cast("long").as("day"),
        col("window.end").as("wend"),
        col("event_type"), col("c"))

  /** The full chained pipeline: events → day counts → drift rows. */
  def drift(events: DataFrame, tsCol: String, delay: String)
      : Dataset[DriftRow] = {
    import events.sparkSession.implicits._
    dayCounts(events, tsCol, delay)
      .select(col("day"), col("event_type").as("eventType"), col("c"))
      .as[DayTypeCount]
      .groupByKey(_ => 0)
      .transformWithState(new DriftProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  class DriftProcessor extends StatefulProcessor[Int, DayTypeCount, DriftRow] {

    @transient private var pending: ListState[DayTypeCount] = _
    @transient private var memo: ValueState[DriftMemo] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[DayTypeCount]("pending",
        Encoders.product[DayTypeCount], TTLConfig.NONE)
      memo = getHandle.getValueState[DriftMemo]("memo",
        Encoders.product[DriftMemo], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Int,
        rows: Iterator[DayTypeCount],
        timerValues: TimerValues): Iterator[DriftRow] = {
      rows.foreach(pending.appendValue)
      val next = timerValues.getCurrentWatermarkInMs() + 1
      if (!getHandle.listTimers().exists(_ >= next))
        getHandle.registerTimer(next)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Int,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DriftRow] = {
      val buf = pending.get().toSeq
      if (buf.isEmpty) return Iterator.empty // drained: no-op
      // every buffered (day, type) row is complete the moment it arrives
      // (stage 1 emits a day atomically on window close) — resolve ALL
      // buffered days in ascending order
      val m0 = if (memo.exists()) Some(memo.get()) else None
      var prev: Option[(Long, Map[String, Long])] =
        m0.map(m => (m.prevDay, m.prevTypes.zip(m.prevCounts).toMap))
      var seen: Set[String] = m0.map(_.seenTypes.toSet).getOrElse(Set.empty)
      val out = scala.collection.mutable.ArrayBuffer.empty[DriftRow]
      buf.groupBy(_.day).toSeq.sortBy(_._1).foreach { case (day, rows) =>
        val cur = rows.map(r => r.eventType -> r.c).toMap
        seen = seen ++ cur.keySet
        prev match {
          case Some((_, p)) =>
            val scored = seen.toSeq.map { t =>
              val c = cur.getOrElse(t, 0L)
              val pc = p.getOrElse(t, 0L)
              t -> ((c - pc) * (c - pc) * 1000000L / (pc + 1L))
            }
            out += DriftRow(day,
              cur.valuesIterator.sum,
              scored.map(_._2).sum,
              scored.minBy { case (t, d) => (-d, t) }._1)
          case None => // first observed day: baseline only
        }
        prev = Some((day, cur))
      }
      prev.foreach { case (d, cur) =>
        val ts = cur.toSeq.sortBy(_._1)
        memo.update(DriftMemo(d, ts.map(_._1), ts.map(_._2), seen.toSeq.sorted))
      }
      pending.clear()
      // drained: delete timers (they outlive cleared state otherwise)
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      out.iterator
    }
  }
}
