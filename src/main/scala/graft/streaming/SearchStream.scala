package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.jobs.TextJobs
import graft.ops.TextAnalysis

/** Standing-query retrieval — the online twin of
  * [[graft.jobs.TextJobs.keywordSearch]]: the fixed conjunctive query set
  * is evaluated against each ARRIVING document, so a match alerts in its
  * own micro-batch instead of waiting for the next batch index pass (the
  * percolator / content-alerting read of the inverted index).
  *
  * Scale shape: the query set is a compile-time constant
  * ([[TextJobs.SEARCH_QUERIES]]), so matching is a stateless per-row
  * computation — per query, per term, one `size(filter(toks, = t))` term
  * frequency; AND semantics and the summed-tf score fold in-row; no
  * state, no shuffle, append mode. Cost is |queries|·|terms|·|tokens|
  * comparisons per arrival, bounded by ingest rate — the
  * [[ClassifyStream]] trade. What the stream deliberately does NOT do is
  * the batch twin's corpus-wide top-k (a global rank has no
  * incremental-emission semantics under append mode); it emits the
  * (query_id, doc_id, score) match rows, and the spec pins bit-equality
  * of that match set against the batch pipeline's pre-rank hits frame.
  */
object SearchStream {

  /** Evaluate the standing queries over a watermarked document stream.
    * Input needs (doc_id, text, `tsCol`); emits one
    * (query_id, doc_id, `tsCol`, score) row per satisfied query.
    */
  def search(stream: DataFrame, tsCol: String, delay: String): DataFrame = {
    val withToks = stream.withWatermark(tsCol, delay)
      .withColumn("toks", TextAnalysis.tokens(lower(col("text"))))
    val perQuery: Seq[Column] = TextJobs.SEARCH_QUERIES.map {
      case (qid, terms) =>
        val tfs = terms.map(t =>
          size(filter(col("toks"), x => x === lit(t))).cast("long"))
        struct(lit(qid).as("query_id"),
          tfs.reduce(_ + _).as("score"),
          tfs.map(_ > 0L).reduce(_ && _).as("hit"))
    }
    withToks.withColumn("m", explode(array(perQuery: _*)))
      .filter(col("m.hit"))
      .select(col("m.query_id").as("query_id"), col("doc_id"), col(tsCol),
        col("m.score").as("score"))
  }
}
