package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One decode pass feeding the audio-dedup toolchain — the audio sibling
  * of [[ImagePipeline]]: scan payloads → `javax.sound` decode →
  * energy-difference fingerprint runs ONCE into a cached
  * (doc_id, n_samples, fp) frame; Hamming near-dup pairs, cluster labels
  * and curation accounting all derive from that single decode. At 100 TB
  * of audio the decode is the dominant cost of every stage, so a corpus
  * pass holding one of these replaces three full decode scans with one.
  *
  * Shuffle budget (identical to the image pipeline's): narrow typed
  * decode scan, band self-join on DISTINCT fingerprints
  * ([[Dedup.hammingPairs]] identity compression), single-task union-find
  * cluster resolution at dup-pair graph sizes, broadcast joins for the
  * model-sized cluster/size frames.
  */
final class AudioPipeline private (
    scanDf: DataFrame, maxHamming: Int, scope: CacheScope) {

  /** The ONE cached decode pass: (doc_id, n_samples, fp). */
  lazy val scan: DataFrame = scope.cache(scanDf)

  lazy val fingerprints: DataFrame = scan.select(col("doc_id"), col("fp"))

  /** Banded Hamming near-dup pairs (doc_a, doc_b, hamming); band width
    * auto-scales with the corpus's distinct-fingerprint count
    * ([[Dedup.bandPlan]], SCALE.md §8e).
    */
  lazy val pairs: DataFrame =
    Dedup.hammingPairsAuto(fingerprints, maxHamming, scope)

  /** Cluster labels (doc_id, cluster) — component minimum per clip. */
  lazy val clusters: DataFrame =
    Dedup.connectedComponents(
      scan.select(col("doc_id")),
      pairs.select(col("doc_a"), col("doc_b")))

  /** Per-clip curation row: decoded metadata + cluster + keeper bit +
    * per-cluster dup mass — (asset_id, n_samples, cluster, is_keeper,
    * cluster_size).
    */
  def curation: DataFrame = {
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    scan.join(clusters, "doc_id").join(broadcast(sizes), "cluster")
      .select(col("doc_id").as("asset_id"), col("n_samples"), col("cluster"),
        (col("doc_id") === col("cluster")).as("is_keeper"),
        col("cluster_size"))
  }

  /** Release the cached scan (end of the corpus pass). */
  def unpersist(): Unit = scan.unpersist()
}

object AudioPipeline {
  def apply(spark: SparkSession, docs: DataFrame, maxHamming: Int,
      scope: CacheScope = CacheScope.unmanaged): AudioPipeline =
    new AudioPipeline(Multimodal.audioScan(spark, docs), maxHamming, scope)
}
