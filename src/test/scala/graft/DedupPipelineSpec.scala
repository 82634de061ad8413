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
      // the shared scan is materialized exactly once — as the DISTINCT
      // gram frame (the raw frame stays uncached: its only reader is the
      // distinct dedup, and a second cached copy is pure footprint)
      assert(pipe.distinctGrams.storageLevel.useMemory,
        "distinctGrams is not cached — every output recomputes the gram scan")
      assert(!pipe.hashedGrams.storageLevel.useMemory,
        "raw hashedGrams cached too — doubles the pipeline's cached bytes")
      // verified pairs are a subset of the candidates
      assert(nVerified <= nCand)
    } finally pipe.unpersist()
  }

  test("persisted bucketed grams: second pass skips the scan and the doc_id exchange") {
    val docs = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val first = new DedupPipeline(docs)
    try {
      DedupPipeline.persistGrams(first, "grams_bucketed", 4)
      val second = DedupPipeline.fromPersistedGrams(
        spark, "grams_bucketed", docs)
      // the signature aggregation over the bucketed table must be
      // exchange-FREE: hash-bucketed storage on doc_id IS the clustering
      // the groupBy needs, so the whole agg runs bucket-local
      second.signatures.collect()
      val sigPlan = second.signatures.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!sigPlan.contains("Exchange"),
        s"persisted signature agg still shuffles:\n$sigPlan")
      assert(sigPlan.contains("Scan"), sigPlan)
      // ... and the set-semantics dedup (verification input) likewise
      second.distinctGrams.collect()
      val dgPlan = second.distinctGrams.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!dgPlan.contains("Exchange hashpartitioning"),
        s"persisted distinct-gram dedup still shuffles:\n$dgPlan")
      // outputs are identical to the in-memory pipeline, row for row
      def sorted(df: org.apache.spark.sql.DataFrame, keys: String*) =
        df.orderBy(keys.head, keys.tail: _*).collect().toSeq
      assert(sorted(second.candidates, "doc_a", "doc_b") ==
        sorted(first.candidates, "doc_a", "doc_b"))
      assert(sorted(second.clusters, "doc_id") ==
        sorted(first.clusters, "doc_id"))
      assert(sorted(second.verifiedPairs(0.35), "doc_a", "doc_b") ==
        sorted(first.verifiedPairs(0.35), "doc_a", "doc_b"))
    } finally {
      first.unpersist()
      spark.sql("DROP TABLE IF EXISTS grams_bucketed")
    }
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

  test("leakage-safe split: no near-dup cluster straddles splits") {
    val rows = DedupJobs.splitLeakageSafe(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // the defining property: one split per cluster
    val splitsPerCluster = rows.groupBy(_._2).values.map(_.map(_._4).distinct.size)
    assert(splitsPerCluster.forall(_ == 1))
    // cluster_size is consistent with the actual membership counts
    val counts = rows.groupBy(_._2).map { case (c, g) => c -> g.length.toLong }
    assert(rows.forall { case (_, c, sz, _, _) => counts(c) == sz })
    // flattened weight: floor(1e6/size), so each family's total weight
    // is ≤ 1e6 and ≥ 1e6 - size
    assert(rows.forall { case (_, _, sz, _, w) => w == 1000000L / sz })
    // docs that share a cluster with a smaller-id doc inherit ITS hash
    // bucket — spot the non-singleton clusters actually exercised the rule
    assert(rows.exists(_._3 > 1))
  }
}
