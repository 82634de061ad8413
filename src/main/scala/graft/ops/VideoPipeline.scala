package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parse pass feeding the video-dedup toolchain — the video sibling of
  * [[ImagePipeline]]/[[AudioPipeline]]: scan payloads → RAWV byte-level
  * parse → per-frame dHash runs ONCE into a cached
  * (doc_id, n_frames, frame_idx, fp) frame; frame-aligned near-dup pairs,
  * cluster labels and curation accounting all derive from that single
  * parse. At 100 TB of video the decode is the dominant cost of every
  * stage by an order more than for images (a clip is many frames), so a
  * corpus pass holding one of these replaces three full decode scans with
  * one.
  *
  * Pairing semantics (the video-specific part): two clips are near-dups
  * when they have the SAME frame count and EVERY aligned frame pair is
  * within `maxPerFrame` Hamming of its counterpart — the frame-aligned
  * re-encode/re-upload detector. Candidate generation anchors on frame 0:
  * a qualifying pair's frame 0 is itself within `maxPerFrame`, so the
  * banded Hamming join over anchor fingerprints ([[Dedup.hammingPairsAuto]]
  * — identity compression, measured band plan, SCALE.md §8e) surfaces
  * every qualifying pair; the full frame-sequence check then runs only on
  * that candidate set. Anchor blocking keeps the pair stage proportional
  * to anchor-fingerprint collisions, never to clips × frames.
  *
  * Shuffle budget: narrow typed parse scan, banded self-join on DISTINCT
  * anchor fingerprints, one int-keyed (doc, frame) equi-join per candidate
  * side for the verify agg, single-task union-find cluster resolution at
  * dup-pair graph sizes, broadcast joins for the model-sized cluster/size
  * frames.
  */
final class VideoPipeline private (
    scanDf: DataFrame, maxPerFrame: Int, scope: CacheScope) {

  /** The ONE cached parse pass: (doc_id, n_frames, frame_idx, fp). */
  lazy val scan: DataFrame = scope.cache(scanDf)

  /** Anchor (frame 0) fingerprints — the candidate-generation key. */
  lazy val anchors: DataFrame =
    scan.filter(col("frame_idx") === 0).select(col("doc_id"), col("fp"))

  /** Frame-aligned near-dup pairs (doc_a, doc_b, hamming): same frame
    * count, every aligned frame within `maxPerFrame`; `hamming` is the
    * total across frames. The count(*) == n_frames guard makes the
    * equal-length requirement explicit in the aggregation itself (a
    * frame-count mismatch can never alias as a pass).
    */
  lazy val pairs: DataFrame =
    VideoPipeline.verifyAligned(scan,
      Dedup.hammingPairsAuto(anchors, maxPerFrame, scope)
        .select(col("doc_a"), col("doc_b")),
      maxPerFrame)

  /** Cluster labels (doc_id, cluster) — component minimum per clip. */
  lazy val clusters: DataFrame =
    Dedup.connectedComponents(
      anchors.select(col("doc_id")),
      pairs.select(col("doc_a"), col("doc_b")))

  /** Per-clip curation row: parsed frame count + cluster + keeper bit +
    * per-cluster dup mass — (asset_id, n_frames, cluster, is_keeper,
    * cluster_size).
    */
  def curation: DataFrame = {
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    scan.filter(col("frame_idx") === 0)
      .select(col("doc_id"), col("n_frames"))
      .join(clusters, "doc_id").join(broadcast(sizes), "cluster")
      .select(col("doc_id").as("asset_id"), col("n_frames"), col("cluster"),
        (col("doc_id") === col("cluster")).as("is_keeper"),
        col("cluster_size"))
  }

  /** Release the cached scan (end of the corpus pass). */
  def unpersist(): Unit = scan.unpersist()
}

object VideoPipeline {
  def apply(spark: SparkSession, docs: DataFrame, maxPerFrame: Int,
      scope: CacheScope = CacheScope.unmanaged): VideoPipeline =
    new VideoPipeline(Multimodal.videoScan(spark, docs), maxPerFrame, scope)

  /** The frame-aligned verify stage over an arbitrary candidate set:
    * equal frame counts + every aligned frame within `maxPerFrame`, total
    * Hamming out — the count(*) == n_frames guard makes the equal-length
    * requirement explicit in the aggregation itself. Shared by the
    * in-line [[VideoPipeline.pairs]] and the incremental-index twin
    * (candidates there come from a bipartite delta×full anchor join).
    */
  def verifyAligned(scan: DataFrame, cand: DataFrame,
      maxPerFrame: Int): DataFrame = {
    val a = scan.select(col("doc_id").as("doc_a"),
      col("n_frames").as("nfa"), col("frame_idx"), col("fp").as("fpa"))
    val b = scan.select(col("doc_id").as("doc_b"),
      col("n_frames").as("nfb"), col("frame_idx"), col("fp").as("fpb"))
    cand.join(a, "doc_a").join(b, Seq("doc_b", "frame_idx"))
      .filter(col("nfa") === col("nfb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        sum(bit_count(col("fpa").bitwiseXOR(col("fpb"))).cast("long"))
          .as("hamming"),
        max(bit_count(col("fpa").bitwiseXOR(col("fpb")))).as("maxh"),
        count(lit(1)).as("n_aligned"), first(col("nfa")).as("nf"))
      .filter(col("maxh") <= maxPerFrame && col("n_aligned") === col("nf"))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
