package graft

/** The driver-contract invariants, enforced inside `sbt test`:
  * every declared query has a matching oracle (and vice versa), executes
  * at sf0.001, and the flagship entry returns rows — so a broken or
  * oracle-less registration fails here, not at the post-commit gate.
  */
class SparkEntrySpec extends SparkSpec {

  test("queries and oracles declare exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"query/oracle drift — missing oracles: ${q -- o}; orphaned oracles: ${o -- q}")
  }

  test("no query name is declared by two jobs objects (silent ++ shadowing)") {
    // round 13: a TextJobs query reused a DedupJobs key and the ++ merge
    // silently dropped one — the registry shrank by 1 and the gate kept
    // passing on the surviving twin. Pin: the per-object key sets must be
    // pairwise disjoint so SparkEntry.queries.size equals their sum.
    import graft.jobs._
    val maps = Seq(
      "HotItemsJobs" -> HotItemsJobs.queries.keySet,
      "OrderJobs" -> OrderJobs.queries.keySet,
      "RelationalJobs" -> RelationalJobs.queries.keySet,
      "TextJobs" -> TextJobs.queries.keySet,
      "DedupJobs" -> DedupJobs.queries.keySet,
      "SimilarityJobs" -> SimilarityJobs.queries.keySet,
      "MultimodalJobs" -> MultimodalJobs.queries.keySet,
      "AnalyticsJobs" -> AnalyticsJobs.queries.keySet,
      "FunnelJobs" -> FunnelJobs.queries.keySet,
      "ArtifactJobs" -> ArtifactJobs.queries.keySet)
    for {
      i <- maps.indices; j <- maps.indices if i < j
      inter = maps(i)._2 & maps(j)._2
    } assert(inter.isEmpty,
      s"${maps(i)._1} and ${maps(j)._1} both declare: $inter")
    assert(SparkEntry.queries.size == maps.map(_._2.size).sum)
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf("sf0.001"))
        assert(df.columns.nonEmpty, s"$name produced no columns")
        df.count() // force full execution
      } catch {
        case e: Throwable =>
          fail(s"query $name failed at sf0.001: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
