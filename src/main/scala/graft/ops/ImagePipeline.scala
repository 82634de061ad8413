package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decode pass feeding the whole image-dedup toolchain — the image
  * sibling of [[DedupPipeline]] (hashed grams) and the token pipeline:
  * the expensive stage of every perceptual-dedup job is identical (scan
  * payloads → codec decode → dHash), so this class runs it ONCE, caches
  * the (doc_id, width, height, n_pixels, fp) scan frame, and derives
  * fingerprints, Hamming near-dup pairs, cluster labels and the curation
  * accounting from the single cached decode. The registry's isolated
  * gate queries ([[graft.jobs.MultimodalJobs]]) instantiate one per call
  * (driver contract); a real pipeline instantiates one per corpus pass —
  * at 100 TB of images that turns three full decode passes into one,
  * and the decode is the dominant cost of every stage.
  *
  * Shuffle budget: the decode scan is a narrow typed `mapPartitions`
  * (payloads never shuffle); the band self-join runs on DISTINCT
  * fingerprints (identity compression inside [[Dedup.hammingPairs]]);
  * cluster resolution takes the single-task union-find path at dup-pair
  * graph sizes; the curation tail joins the model-sized cluster/size
  * frames back by broadcast.
  */
final class ImagePipeline private (
    scanDf: DataFrame, maxHamming: Int, scope: CacheScope) {

  /** The ONE cached decode pass: (doc_id, width, height, n_pixels, fp). */
  lazy val scan: DataFrame = scope.cache(scanDf)

  lazy val fingerprints: DataFrame = scan.select(col("doc_id"), col("fp"))

  /** Banded Hamming near-dup pairs (doc_a, doc_b, hamming); band width
    * auto-scales with the corpus's distinct-fingerprint count
    * ([[Dedup.bandPlan]] — 16-bit bands drown in accidental collisions
    * past ~10⁵ distinct fps; SCALE.md §8e).
    */
  lazy val pairs: DataFrame =
    Dedup.hammingPairsAuto(fingerprints, maxHamming, scope)

  /** Cluster labels (doc_id, cluster) — component minimum per image. */
  lazy val clusters: DataFrame =
    Dedup.connectedComponents(
      scan.select(col("doc_id")),
      pairs.select(col("doc_a"), col("doc_b")))

  /** Per-image curation row: decoded metadata + cluster + keeper bit +
    * per-cluster dup mass — [[graft.jobs.MultimodalJobs.imageCuration]]'s
    * output off the shared scan.
    */
  def curation: DataFrame = {
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    scan.join(clusters, "doc_id").join(broadcast(sizes), "cluster")
      .select(col("doc_id").as("asset_id"), col("width"), col("height"),
        col("n_pixels"), col("cluster"),
        (col("doc_id") === col("cluster")).as("is_keeper"),
        col("cluster_size"))
  }

  /** Release the cached scan (end of the corpus pass); operator-internal
    * caches ([[pairs]]' fingerprint frame) release through the
    * constructing [[CacheScope]].
    */
  def unpersist(): Unit = scan.unpersist()
}

object ImagePipeline {
  def apply(spark: SparkSession, docs: DataFrame, maxHamming: Int,
      scope: CacheScope = CacheScope.unmanaged): ImagePipeline =
    new ImagePipeline(Multimodal.imageScan(spark, docs), maxHamming, scope)
}
