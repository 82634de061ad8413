package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-source admission cap — the ingest-side sibling of
  * `DedupJobs.sourceCaps`: admit at most `cap` documents per
  * (source, lang) cell as they arrive, tagging the rest rejected, so no
  * source can flood the downstream pipeline inside one ingest run.
  *
  * Semantics note (documented divergence from the batch cap): the batch
  * op selects the hash-priority-smallest N per cell — a GLOBAL decision
  * that needs the whole corpus — while an ingest gate must decide at
  * arrival time, so it admits the FIRST N in arrival order. The batch
  * re-screen downstream applies the priority rule to whatever was
  * admitted; the stream gate exists to bound flow, not to pick the final
  * sample. (The same stream-bounds/batch-decides split as
  * [[StreamingDedup.byFingerprint]] vs the batch exact dedup.)
  *
  * Scale shape: state per cell is ONE long (admitted count) — bounded by
  * the number of (source, lang) cells, not the stream; rows shuffle once
  * on the cell key, the text payload rides along only because the output
  * re-emits it (project it away upstream to keep the exchange narrow).
  */
object StreamingCaps {

  final case class DocArrival(
      doc_id: Long, source: String, lang: String, text: String)

  final case class GatedDoc(
      doc_id: Long, source: String, lang: String, admitted: Boolean)

  def admitFirstN(docs: Dataset[DocArrival], cap: Int): Dataset[GatedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => (d.source, d.lang))
      .transformWithState(new CapProcessor(cap), TimeMode.None(),
        OutputMode.Update())
  }

  class CapProcessor(cap: Int)
      extends StatefulProcessor[(String, String), DocArrival, GatedDoc] {

    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[DocArrival],
        timerValues: TimerValues): Iterator[GatedDoc] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = rows.map { d =>
        val admit = n < cap
        if (admit) n += 1
        GatedDoc(d.doc_id, d.source, d.lang, admit)
      }.toVector // drain before updating state: the iterator is lazy
      admitted.update(n)
      out.iterator
    }

    override def handleExpiredTimer(
        key: (String, String),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GatedDoc] =
      Iterator.empty
  }
}
