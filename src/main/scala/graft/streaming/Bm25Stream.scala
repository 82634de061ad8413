package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.jobs.TextJobs
import graft.ops.TextAnalysis

/** Online BM25 scoring — the graded twin of [[SearchStream]]: each
  * ARRIVING document is scored against the fixed standing-query set
  * under a FROZEN stats model ([[TextJobs.bm25Model]]: N, adl, per-term
  * df collected from the batch corpus — the broadcast-constants serving
  * contract; a production pipeline refreshes it on the batch cadence,
  * exactly like the served CF lists and the quality classifier).
  *
  * The arithmetic is the batch gate's bit-for-bit: integer RSJ-odds
  * idf_ppm and the (22000·tf·adl) div (10·tf·adl + 3·adl + 9·dl)
  * saturation, folded in-row per query — so on a replay of the model's
  * own corpus the emitted scores equal the batch pre-rank scored frame
  * exactly (spec-pinned). Stateless, no shuffle, append mode; a doc
  * emits one row per query with ≥ 1 matched term (a matched doc can
  * legitimately score 0 — saturation floors at 0 for dl ≫ adl — so the
  * emission test is term presence, not score > 0, matching the batch
  * join semantics). Cost |queries|·|terms|·|tokens| per arrival — the
  * [[ClassifyStream]] trade; the corpus-wide top-k stays batch-only
  * (a global rank has no incremental emission under append).
  */
object Bm25Stream {

  /** Score a watermarked document stream (doc_id, text, `tsCol`) under a
    * frozen (N, adl, df) model; emits (query_id, doc_id, `tsCol`, score).
    */
  def score(stream: DataFrame, tsCol: String, delay: String,
      model: (Long, Long, Map[String, Long])): DataFrame = {
    val (nDocs, adl, dfm) = model
    def idfPpm(t: String): Long = {
      val df = dfm.getOrElse(t, 0L)
      ((2 * (nDocs - df) + 1) * 1000000L) / (2 * df + 1)
    }
    val withToks = stream.withWatermark(tsCol, delay)
      .withColumn("toks", TextAnalysis.tokens(lower(col("text"))))
    val perQuery: Seq[Column] = TextJobs.SEARCH_QUERIES.map {
      case (qid, terms) =>
        val parts = terms.map { t =>
          val tf = s"cast(size(filter(toks, x -> x = '$t')) as bigint)"
          (s"(case when $tf > 0 then ${idfPpm(t)}L * " +
            s"((22000L * $tf * ${adl}L) div " +
            s"(10L * $tf * ${adl}L + ${3 * adl}L + " +
            s"9L * cast(size(toks) as bigint))) else 0L end)",
            s"($tf > 0)")
        }
        struct(lit(qid).as("query_id"),
          expr(parts.map(_._1).mkString(" + ")).as("score"),
          expr(parts.map(_._2).mkString(" or ")).as("hit"))
    }
    withToks.withColumn("m", explode(array(perQuery: _*)))
      .filter(col("m.hit"))
      .select(col("m.query_id").as("query_id"), col("doc_id"), col(tsCol),
        col("m.score").as("score"))
  }
}
