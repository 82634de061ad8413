package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming conversion funnel: the batch `FunnelJobs.funnel` journey
  * (view → click → purchase, ordered per user) as a first-class streaming
  * operator, instantiating the CEP-lite NFA with the funnel's 3-stage
  * pattern — the same generalization step the reference takes when it
  * re-expresses its order-timeout CEP job as a keyed state machine
  * (`OrderPayTimeoutWithoutCEP.java:24-27`).
  *
  * Semantics: per user, the first view starts a journey; the next click at
  * or after it advances; the next purchase completes ("matched", depth 3).
  * When the event-time deadline passes the watermark, a partial journey
  * emits "timeout" with the depth it reached — so every started journey
  * produces exactly one terminal record, and stage counts are a pure
  * projection of the journey stream.
  *
  * Tie note: the batch funnel requires each stage STRICTLY later than the
  * previous (`us > rv`); the stream's within-batch sorted scan breaks
  * exact-timestamp ties by sequence position instead. At sub-microsecond
  * event resolution the two agree; equal-timestamp stage pairs are the one
  * divergence (see the FunnelSpec equivalence property, which generates
  * distinct per-user timestamps).
  */
object FunnelStream {
  import CepLite.{CepMatch, KeyedEvent}

  /** The funnel's event-kind sequence. */
  val Stages: Seq[String] = Seq("view", "click", "purchase")

  /** Output labels, aligned with `FunnelJobs.funnel`'s stage rows. */
  val StageLabels: Seq[String] =
    Seq("view", "click_after_view", "purchase_after_click")

  /** Journey outcomes: one terminal [[CepLite.CepMatch]] per started
    * journey — tag="matched" at depth 3, or tag="timeout" with the partial
    * depth once `withinMs` passes the watermark. Append-mode output;
    * state per key is one (step, timestamps) record, dropped on emit.
    */
  def journeys(events: Dataset[KeyedEvent], withinMs: Long): Dataset[CepMatch] =
    CepLite.detect(events, Stages, withinMs)

  /** Funnel stage counts over a journeys frame: one row per stage with the
    * number of distinct users whose journey reached at least that depth —
    * row-for-row comparable with `FunnelJobs.funnel`. Apply per micro-batch
    * via `foreachBatch` (or over the journal the journey stream sinks):
    * chaining a distinct aggregation directly onto the state machine would
    * need a second watermark, which Spark forbids downstream of a stateful
    * op.
    */
  def stageCounts(journeys: DataFrame): DataFrame = {
    val labels = array(StageLabels.map(lit): _*)
    journeys
      .filter(col("depth") >= 1) // sequence(1, 0) would DESCEND
      .select(col("key"),
        explode(sequence(lit(1), least(col("depth"), lit(Stages.length))))
          .as("stage"))
      .distinct() // a user may finish one journey and start another
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("stage").cast("long").as("stage"),
        element_at(labels, col("stage")).as("event_type"),
        col("n_users"))
  }
}
