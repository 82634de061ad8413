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
