package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One tokenization pass feeding the whole token-statistics toolchain —
  * the text-side sibling of [[DedupPipeline]].
  *
  * Every token-level job starts the same way: scan → lowercase → tokenize →
  * per-(doc, token) counts. This class computes that tf frame ONCE, caches
  * it, and derives document frequencies, corpus frequencies, vocabulary
  * ranking, TF-IDF terms and rare-token density from the single cached
  * cascade — at 100 TB that turns three full corpus tokenizations into one.
  * The registry's isolated gate queries keep their own lineages (driver
  * contract); a real pipeline holds one of these per corpus pass.
  *
  * `docs` must provide (doc_id, text) and, for [[vocabTopK]], `lang`.
  */
final class TokenPipeline(docs: DataFrame,
    scope: CacheScope = CacheScope.unmanaged) {

  /** Per-(doc, token) counts: the ONE tokenization of the corpus. */
  val tf: DataFrame = scope.cache(docs
    .select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    .groupBy(col("doc_id"), col("token"))
    .agg(count(lit(1)).as("tf")))

  /** Document frequency per token (documents containing it). */
  lazy val df: DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Corpus frequency per token (total occurrences). */
  lazy val freq: DataFrame =
    tf.groupBy(col("token")).agg(sum(col("tf")).as("freq"))

  /** TF-IDF in ratio form (same scoring as the `tfidf_topk` gate query):
    * top `k` tokens per document by tf·(N+1)/(df+1).
    */
  def tfidfTopK(k: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (col("n_docs") + 1) / (col("df") + 1) + lit(1e-9), 6))
    TopN.topNPer(scored, col("doc_id"), col("score"), col("token"), k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rn"))
  }

  /** Rare-token density (same scoring as the `token_rarity` gate query). */
  def tokenRarity: DataFrame =
    tf.join(freq, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("freq")).as("wsum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("wsum").cast("double") / col("n_tokens") + lit(1e-9), 4)
          .as("mean_tok_freq"))

  /** Release the cached tf frame (end of the corpus pass). */
  def unpersist(): Unit = tf.unpersist()
}
