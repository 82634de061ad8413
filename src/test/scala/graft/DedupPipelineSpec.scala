package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupPipeline
import graft.jobs.DedupJobs

/** The shared gram→signature stage: one cached corpus scan feeds
  * candidates, clusters and exact-verified pairs, and its outputs agree
  * with the isolated gate queries on the same data.
  */
class DedupPipelineSpec extends SparkSpec {

  test("one cached gram scan feeds candidates, clusters and verified pairs") {
    val pipe = new DedupPipeline(
      graft.io.Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id"), col("text")))
    try {
      // materialize all three outputs off the same pipeline instance
      val nCand = pipe.candidates.count()
      val nClusters = pipe.clusters.count()
      val nVerified = pipe.verifiedPairs(0.35).count()
      assert(nCand > 0 && nClusters > 0 && nVerified >= 0)
      // the shared scan is cached exactly once (storage level set), so the
      // three materializations paid for one gram lineage
      assert(pipe.hashedGrams.storageLevel.useMemory,
        "hashedGrams is not cached — every output recomputes the gram scan")
      // verified pairs are a subset of the candidates
      assert(nVerified <= nCand)
    } finally pipe.unpersist()
  }

  test("pipeline outputs equal the isolated gate queries") {
    val dir = sf("sf0.001")
    val pipe = DedupJobs.pipeline(spark, dir)
    try {
      val cand = pipe.candidates.orderBy("doc_a", "doc_b").collect().toSeq
      val isolated = DedupJobs.dedupMinhashLsh(spark, dir)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(cand == isolated)
      val clusters = pipe.clusters.orderBy("doc_id").collect().toSeq
      val isolatedClusters = DedupJobs.dedupClusters(spark, dir)
        .orderBy("doc_id").collect().toSeq
      assert(clusters == isolatedClusters)
    } finally pipe.unpersist()
  }
}
