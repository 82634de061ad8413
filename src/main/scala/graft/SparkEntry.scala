package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.jobs._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    HotItemsJobs.hotItemsTopN(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    HotItemsJobs.queries ++ OrderJobs.queries ++ RelationalJobs.queries ++
      TextJobs.queries ++ DedupJobs.queries ++ SimilarityJobs.queries ++
      MultimodalJobs.queries ++ AnalyticsJobs.queries ++ FunnelJobs.queries ++
      ArtifactJobs.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    HotItemsJobs.oracles ++ OrderJobs.oracles ++ RelationalJobs.oracles ++
      TextJobs.oracles ++ DedupJobs.oracles ++ SimilarityJobs.oracles ++
      MultimodalJobs.oracles ++ AnalyticsJobs.oracles ++ FunnelJobs.oracles ++
      ArtifactJobs.oracles
}
