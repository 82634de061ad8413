package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.jobs.SimilarityJobs

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.1f)))  // close-ish to 0/1
    .toDF("vec_id", "embedding")

  private def v = Similarity.withNorm(vecs, $"vec_id", $"embedding")

  test("brute-force top-k ranks by cosine with self excluded") {
    val out = Similarity.bruteForceTopK(v, v.filter($"vec_id" === 0), 2)
      .orderBy($"rn").select($"neighbor_id", $"sim").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    assert(out(0)._2 > 0.99 && out(1)._2 > 0.9)
  }

  test("near-dup pairs respect the threshold, half-matrix only") {
    val out = Similarity.nearDupPairs(v, 0.9)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(out.forall(p => p._1 < p._2))
    assert(out.contains((0L, 1L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L)) // opposite vector
  }

  test("IVF ANN beats the LSH path's recall@5 floor on real data") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvf(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // probing 4 of 16 cells; measured 0.85 at sf0.01 — 0.5 is the
    // regression floor
    assert(recall > 0.5, s"recall=$recall")
  }

  test("kmeans centroids are exact quantized means (deterministic)") {
    // two clean 2-D clusters; seeds = vecs 0 and 1, one Lloyd's round.
    // Quantization makes the means exact decimals: (1.0+0.9)/2 = 0.95 on
    // the nose, no float-summation noise.
    val data = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val vv = Similarity.withNorm(data, $"vec_id", $"embedding")
    val cents = Similarity.kmeansCentroids(vv, c = 2, iters = 1)
      .select($"cent_id", $"cv").as[(Long, Seq[Double])].collect()
      .toMap
    assert(cents(0L) == Seq(0.95, 0.05))
    assert(cents(1L) == Seq(0.05, 0.95))
    // fixed-iteration Lloyd's from fixed seeds: identical across runs
    val again = Similarity.kmeansCentroids(vv, c = 2, iters = 1)
      .select($"cent_id", $"cv").as[(Long, Seq[Double])].collect().toMap
    assert(again == cents)
  }

  test("trained IVF holds the recall floor on real data") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvfTrained(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall")
  }

  test("LSH ANN achieves good recall@5 vs brute force on real data") {
    val sfd = sf("sf0.001")
    val vv = Similarity.withNorm(
      graft.io.Tables.embeddings(spark, sfd), $"vec_id", $"embedding")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annLsh(spark, sfd)
      .filter($"query_id" < 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 5 hyperplanes + hamming-1 multi-probe on 500 random vectors:
    // lossy by design, but must beat a trivial bucket-only filter
    assert(recall > 0.3, s"recall=$recall")
  }
}
