package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Similarity

/** Embedding similarity-search queries over `embeddings`.
  * `ann_cosine_topk` and `embedding_neardup` are exact and oracle-checked
  * (DuckDB `list_cosine_similarity`); the LSH-bucketed ANN variant is the
  * scale path, validated by recall tests rather than an oracle (its
  * candidate set is hash-dependent by design).
  */
object SimilarityJobs {

  private val TOP_K = 5
  private val N_QUERIES = 20 // query set: vec_id < 20
  private val NEARDUP_THRESHOLD = 0.35

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.withNorm(Tables.embeddings(spark, sfDir),
      col("vec_id"), col("embedding"))

  /** Exact cosine top-5 for the first 20 vectors (brute-force baseline). */
  def annCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vectors(spark, sfDir)
    Similarity.bruteForceTopK(v, v.filter(col("vec_id") < N_QUERIES), TOP_K)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  val annCosineTopKSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), s AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |         ROUND(list_cosine_similarity(q.v, e.v) + 1e-12, 6) AS sim
       |  FROM e q JOIN e ON q.vec_id < $N_QUERIES AND q.vec_id <> e.vec_id
       |)
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |  FROM s) ranked
       |WHERE rn <= $TOP_K""".stripMargin

  /** Exact near-duplicate pairs: cosine ≥ threshold over the half-matrix. */
  def embeddingNeardup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.nearDupPairs(vectors(spark, sfDir), NEARDUP_THRESHOLD)

  val embeddingNeardupSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ROUND(list_cosine_similarity(a.v, b.v) + 1e-12, 6) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ROUND(list_cosine_similarity(a.v, b.v) + 1e-12, 6)
       |      >= $NEARDUP_THRESHOLD""".stripMargin

  /** LSH-bucketed ANN (scale path; rows-only driver check). */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.lshTopK(vectors(spark, sfDir), planes = 5, k = TOP_K)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> annCosineTopK,
    "embedding_neardup" -> embeddingNeardup,
    "ann_lsh" -> annLsh)

  val oracles: Map[String, String] = Map(
    "ann_cosine_topk" -> annCosineTopKSql,
    "embedding_neardup" -> embeddingNeardupSql)
}
