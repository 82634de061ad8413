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

  private val PLANES = 5
  private val DIMS = 64

  /** LSH-bucketed ANN (scale path). */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.lshTopK(vectors(spark, sfDir), planes = PLANES, k = TOP_K,
      dims = DIMS)

  /** Exact DuckDB restatement of the sign-LSH path: the plane weights are
    * deterministic integer arithmetic ([[Similarity.planeWeight]]), so
    * bucket assignment, hamming-1 multi-probe, and the cosine rank are all
    * reproducible — no reason for a weaker rows-only check.
    */
  val annLshSql: String = {
    val planeLits = (0 until PLANES).map { j =>
      (0 until DIMS)
        .map(d => Similarity.planeWeight(j, d).toString)
        .mkString("[", ", ", "]")
    }
    val bucketExpr = (0 until PLANES).map { j =>
      s"(CASE WHEN list_dot_product(v, ${planeLits(j)}) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    val probeList = (0 +: (0 until PLANES).map(1 << _)).mkString("[", ", ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), eb AS (
       |  SELECT vec_id, v, ($bucketExpr) AS bucket FROM e
       |), probes AS (
       |  SELECT vec_id, v, xor(bucket, p) AS probe
       |  FROM eb CROSS JOIN (SELECT unnest($probeList) AS p)
       |), s AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ROUND(list_cosine_similarity(a.v, b.v) + 1e-12, 6) AS sim
       |  FROM probes a JOIN eb b ON a.probe = b.bucket AND a.vec_id <> b.vec_id
       |)
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |  FROM s) ranked
       |WHERE rn <= $TOP_K""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> annCosineTopK,
    "embedding_neardup" -> embeddingNeardup,
    "ann_lsh" -> annLsh)

  val oracles: Map[String, String] = Map(
    "ann_cosine_topk" -> annCosineTopKSql,
    "embedding_neardup" -> embeddingNeardupSql,
    "ann_lsh" -> annLshSql)
}
