package graft

import graft.jobs._

/** Physical-plan assertions: the properties that make these queries viable
  * at 100 TB are pinned here so a refactor can't silently lose them
  * (filter pushdown to parquet, column pruning, dimension broadcasts,
  * two-phase aggregation).
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: filter pushed to parquet scan, columns pruned") {
    val p = plan(RelationalJobs.q1Pricing(spark, sf("sf0.001")))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filter in:\n$p")
    // only the 7 needed columns reach the scan — never the full 11
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "scan reads unneeded columns")
  }

  test("q3/q5: dimension sides broadcast, fact table never broadcast") {
    val p3 = plan(RelationalJobs.q3Shipping(spark, sf("sf0.001")))
    assert(p3.contains("BroadcastHashJoin"), "q3 lost its broadcast join")
    val p5 = plan(RelationalJobs.q5LocalSupplier(spark, sf("sf0.001")))
    assert(p5.contains("BroadcastHashJoin"), "q5 lost its broadcast joins")
  }

  test("q3: global top-10 via TakeOrderedAndProject, no single-partition Window") {
    val p = plan(RelationalJobs.q3Shipping(spark, sf("sf0.001")))
    assert(p.contains("TakeOrderedAndProject"),
      s"q3 lost its per-partition top-k merge:\n$p")
    assert(!p.contains("Window"),
      s"q3 regressed to a global-window rank (single-partition funnel):\n$p")
  }

  test("windowed counts: two-phase hash aggregation (map-side partials)") {
    val p = plan(HotItemsJobs.slidingWindowCounts(spark, sf("sf0.001")))
    val hashAggs = "HashAggregate".r.findAllIn(p).length
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got:\n$p")
    assert(p.contains("event_type"), "filter column missing")
  }

  test("events scan prunes to the referenced columns only") {
    val p = plan(HotItemsJobs.slidingWindowCounts(spark, sf("sf0.001")))
    assert(!p.contains("user_id") && !p.contains("value"),
      "events scan reads columns the query never uses")
  }

  test("neardup + decontamination plans contain no all-pairs join") {
    val pn = plan(SimilarityJobs.embeddingNeardup(spark, sf("sf0.001")))
    assert(!pn.contains("BroadcastNestedLoopJoin") && !pn.contains("CartesianProduct"),
      s"embedding_neardup regressed to an all-pairs join:\n$pn")
    val pd = plan(DedupJobs.decontamination(spark, sf("sf0.001")))
    assert(!pd.contains("BroadcastNestedLoopJoin") && !pd.contains("CartesianProduct"),
      s"decontamination candidate stage is not an equi-join:\n$pd")
  }

  test("vocab ranking gets the WindowGroupLimit early cutoff") {
    val p = plan(TextJobs.vocabTopK(spark, sf("sf0.001")))
    assert(p.contains("WindowGroupLimit"),
      s"per-lang rank lost its top-k pushdown:\n$p")
    val hashAggs = "HashAggregate".r.findAllIn(p).length
    assert(hashAggs >= 2, "token counting lost map-side partials")
  }

  test("corpus curation: semi-join keepers, no cartesian anywhere") {
    val p = plan(DedupJobs.corpusCuration(spark, sf("sf0.001")))
    assert(p.contains("LeftSemi"), s"keeper filter is not a semi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("funnel scans events once and shuffles once") {
    val p = plan(FunnelJobs.funnel(spark, sf("sf0.001")))
    assert("FileScan|Scan parquet".r.findAllIn(p).length == 1,
      s"funnel regressed to multiple event scans:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"funnel shuffles events more than once on user_id:\n$p")
  }

  test("brute-force ANN broadcasts the query side, not the corpus") {
    val p = plan(SimilarityJobs.annCosineTopK(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("whole-stage codegen covers the scan→filter→project pipelines") {
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val p = plan(TextJobs.textStats(spark, sf("sf0.001")))
    assert(p.contains("*(1)"), s"text stats fell out of codegen:\n$p")
  }
}
