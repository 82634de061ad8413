package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online next-action prediction — the serving twin of
  * `AnalyticsJobs.markovEval`'s model: every ARRIVING event is annotated
  * in-flight with the batch-trained argmax next type for its state, the
  * "what will this user do next" signal a session-abandonment or
  * prefetch pipeline consumes at ingest.
  *
  * Scale shape: the model rides as ONE broadcast row (an array of
  * (from_type, predicted) structs — |event types| entries, model-sized
  * by construction, the ClassifyStream contract); prediction is a
  * stateless in-row array lookup, so there is no state, no shuffle,
  * append mode, and rows emit in their arriving micro-batch. A state
  * unseen in training predicts NULL — `get()` (never `element_at`,
  * which throws on an empty filter result under ANSI) keeps the
  * lookup total.
  */
object NextEventStream {

  /** The argmax model packed into one broadcastable row:
    * (marr: array<struct<from_type, predicted>>), sorted for
    * deterministic plans. `pred` needs (from_type, predicted).
    */
  def predictionArray(pred: DataFrame): DataFrame =
    pred.agg(sort_array(collect_list(
      struct(col("from_type"), col("predicted")))).as("marr"))

  /** Annotate a watermarked event stream with the predicted next type.
    * Input needs (user_id, event_type, `tsCol`); emits
    * (user_id, `tsCol`, event_type, predicted) per arrival.
    */
  def predictNext(stream: DataFrame, tsCol: String, delay: String,
      pred: DataFrame): DataFrame =
    stream.withWatermark(tsCol, delay)
      .crossJoin(broadcast(predictionArray(pred)))
      .select(col("user_id"), col(tsCol), col("event_type"),
        expr("get(filter(marr, x -> x.from_type = event_type), 0).predicted")
          .as("predicted"))
}
