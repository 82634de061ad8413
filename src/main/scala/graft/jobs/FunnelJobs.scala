package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Classic UBA analytics the reference's domain implies but never ships:
  * conversion funnels (ordered event sequences per user) and retention
  * cohorts. Both are conditional-aggregation shapes — two-phase hash aggs
  * and one broadcast-joinable stage frame, no self-join of the raw events.
  *
  * All time arithmetic runs on integer epoch-microseconds (`unix_micros` /
  * DuckDB `epoch_us`): the events table has shipped as both nanos-as-long
  * and TIMESTAMP-micros parquet ([[graft.io.Tables.events]] dispatches on
  * dtype), and comparing integer micros in BOTH engines keeps
  * sub-microsecond orderings from diverging between them.
  */
object FunnelJobs {

  private val WEEK_US = 7L * 86400 * 1000000

  /** view → click → purchase funnel: per user, the first view, the first
    * click strictly after that view, the first purchase strictly after
    * that click; then per-stage user counts. Output one row per stage with
    * the stage index for a stable sort.
    *
    * Single scan, ONE shuffle: running conditional minima over the
    * (user_id, us) window replace the staged self-joins — a click
    * qualifies iff it's strictly past the running first view, which (min
    * being monotone) selects exactly the same events as "strictly past
    * the global first view". The final per-user aggregation reuses the
    * window's hash partitioning, so events shuffle once, not three times.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val staged = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("rv",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("qc",
        when(col("event_type") === "click" && col("us") > col("rv"), col("us")))
      .withColumn("rc", min(col("qc")).over(w))
      .withColumn("qp",
        when(col("event_type") === "purchase" && col("us") > col("rc"),
          col("us")))
    val perUser = staged.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("us"))).as("t_view"),
      min(col("qc")).as("t_click"),
      min(col("qp")).as("t_purchase"))
    val stages = perUser.agg(
      count(col("t_view")).as("n_view"),
      count(col("t_click")).as("n_click"),
      count(col("t_purchase")).as("n_purchase"))
    stages.select(explode(array(
        struct(lit(1L).as("stage"), lit("view").as("event_type"),
          col("n_view").as("n_users")),
        struct(lit(2L).as("stage"), lit("click_after_view").as("event_type"),
          col("n_click").as("n_users")),
        struct(lit(3L).as("stage"), lit("purchase_after_click").as("event_type"),
          col("n_purchase").as("n_users")))).as("s"))
      .select(col("s.stage"), col("s.event_type"), col("s.n_users"))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), v AS (
      |  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN us END) AS t_view
      |  FROM e GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, v.t_view,
      |         MIN(CASE WHEN e.event_type = 'click' AND e.us > v.t_view
      |             THEN e.us END) AS t_click
      |  FROM e JOIN v USING (user_id) GROUP BY e.user_id, v.t_view
      |), p AS (
      |  SELECT e.user_id, c.t_view, c.t_click,
      |         MIN(CASE WHEN e.event_type = 'purchase' AND e.us > c.t_click
      |             THEN e.us END) AS t_purchase
      |  FROM e JOIN c USING (user_id) GROUP BY e.user_id, c.t_view, c.t_click
      |), agg AS (
      |  SELECT COUNT(t_view) AS n_view, COUNT(t_click) AS n_click,
      |         COUNT(t_purchase) AS n_purchase
      |  FROM p
      |)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
      |       n_view AS n_users FROM agg
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click_after_view', n_click FROM agg
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase_after_click', n_purchase FROM agg""".stripMargin

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; for each (cohort_week, week_offset), how many of them were
    * active that many weeks later. Weeks are integer epoch-microsecond
    * buckets — deterministic in any engine.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // whole-partition min over user_id: single scan, one shuffle — no
    // self-join of events against its own aggregation
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $WEEK_US").as("week"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .distinct()
      // after the distinct, (user_id, week_offset) is unique per group (a
      // user has exactly one cohort_week), so a plain count IS the distinct
      // user count — countDistinct here would pay a second dedup shuffle
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val retentionCohortsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $WEEK_US AS week FROM events
       |), f AS (
       |  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
       |)
       |SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
       |       COUNT(DISTINCT e.user_id) AS n_users
       |FROM e JOIN f USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel" -> funnel,
    "retention_cohorts" -> retentionCohorts)

  val oracles: Map[String, String] = Map(
    "funnel" -> funnelSql,
    "retention_cohorts" -> retentionCohortsSql)
}
