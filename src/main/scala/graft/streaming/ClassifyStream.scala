package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming kNN label serving — the online twin of
  * [[graft.jobs.SimilarityJobs.knnClassify]]: each ARRIVING embedding is
  * classified in-flight by majority vote of its k nearest labeled
  * neighbors, so scarce human labels propagate to new data at ingest
  * instead of waiting for the next batch pass.
  *
  * Scale shape: the labeled index rides along as ONE broadcast row (an
  * array of (nid, v, norm, label) structs). Labeled sets are
  * scarce-by-construction (human annotation), so this row is model-sized
  * — the same contract as [[StreamingSimilarity.centroidArray]]. The
  * whole classify is then a stateless per-row computation: no state, no
  * shuffle, append mode, rows emit in their arriving micro-batch. The
  * scoring runs as interpreted array lambdas; the repo's
  * no-interpreted-HOF rule targets per-PAIR corpus×corpus hot loops,
  * while this cost is |labeled|·dims multiplies per ARRIVAL, bounded by
  * ingest rate — the same trade [[StreamingSimilarity]] documents. At a
  * labeled-set size where the broadcast row stops being model-sized, the
  * drop-in is the IVF/PQ artifact screen ([[StreamingSimilarity]]'s ADC
  * path) feeding the same vote.
  *
  * Vote parity with the batch twin is exact (spec-pinned): neighbors rank
  * by the (sim desc, nid asc) total order via an ascending
  * (−sim, nid) struct sort — negation preserves the order Double.compare
  * gives the batch rank, signed zeros included — and the vote by
  * (votes desc, label asc) via (−votes, label).
  */
object ClassifyStream {

  /** The labeled index packed into ONE broadcastable row:
    * (larr: array<struct<nid, v, norm, label>>), sorted by nid.
    * `labeled` needs (vec_id, v, norm, label).
    */
  def labelArray(labeled: DataFrame): DataFrame =
    labeled.agg(sort_array(collect_list(struct(
      col("vec_id").as("nid"), col("v"), col("norm"),
      col("label")))).as("larr"))

  /** Classify a watermarked embedding stream against the labeled index.
    * Input needs (vec_id, embedding: array<float>, `tsCol`); emits
    * (vec_id, `tsCol`, predicted) per arrival. The cosine is inlined
    * textually (SQL lambdas cannot bind intermediates) and MUST stay in
    * sync with [[graft.ops.Similarity.cosine]]'s rounding contract.
    */
  def classify(stream: DataFrame, tsCol: String, delay: String,
      labeled: DataFrame, k: Int): DataFrame = {
    val scored =
      "transform(larr, x -> named_struct(" +
        "'negsim', -round(aggregate(zip_with(v, x.v, (a, b) -> a * b), " +
        "cast(0.0 as double), (acc, p) -> acc + p) / (norm * x.norm) " +
        "+ 1e-12, 6), " +
        "'nid', x.nid, 'label', x.label))"
    val topLabels = s"transform(slice(array_sort($scored), 1, $k), x -> x.label)"
    val votes = s"transform(array_distinct($topLabels), l -> named_struct(" +
      s"'negc', -size(filter($topLabels, x -> x = l)), 'label', l))"
    // get(), not element_at(): an empty labeled frame makes votes empty and
    // element_at(_, 1) throws INVALID_ARRAY_INDEX under ANSI; get() emits a
    // NULL prediction instead (the NextEventStream precedent).
    val pred = s"get(array_sort($votes), 0).label"
    stream.withWatermark(tsCol, delay)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", graft.functions.VectorFunctions.l2_norm(col("v")))
      .crossJoin(broadcast(labelArray(labeled)))
      .select(col("vec_id"), col(tsCol), expr(pred).as("predicted"))
  }
}
