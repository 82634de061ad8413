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

  /** Cohort LTV curves — the revenue companion of [[retentionCohorts]]:
    * per (signup-week cohort, week age) the cell revenue, the cumulative
    * revenue, and cumulative LTV per cohort user — the curve a growth
    * team reads to price acquisition. Money is integer cents (round
    * BEFORE cast — both engines round the same integral double — then
    * order-independent BIGINT sums); LTV is one floor division. The
    * cumulative window partitions by cohort over the (weeks × ages)
    * AGGREGATE grid — a bounded frame (hundreds of rows after years of
    * data), not the corpus, so the low-cardinality-cumsum rule doesn't
    * bite. Cells with activity but no purchases are zero-filled from the
    * retention grid; the corpus scans once (cached cohort-tagged frame).
    */
  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $WEEK_US").as("week"),
        col("event_type"),
        expr("cast(round(value * 100 + 1e-9) as bigint)").as("cents"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .cache()
    val grid = e.select(col("user_id"), col("cohort_week"), col("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val rev = e.filter(col("event_type") === "purchase")
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(sum(col("cents")).as("revenue_cents"))
    val size = e.select(col("user_id"), col("cohort_week")).distinct()
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
    val wc = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .join(rev, Seq("cohort_week", "week_offset"), "left")
      .withColumn("revenue_cents", coalesce(col("revenue_cents"), lit(0L)))
      .join(size, "cohort_week")
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(wc))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"), col("revenue_cents"), col("cum_revenue_cents"),
        expr("cum_revenue_cents div cohort_users").as("ltv_per_user_cents"))
  }

  /** Oracle: identical grid/cumsum; windowed SUM(BIGINT) is HUGEINT in
    * DuckDB — CAST back before the division (the round-4 rule).
    */
  val cohortLtvSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $WEEK_US AS week, event_type,
       |         CAST(round(value * 100 + 1e-9) AS BIGINT) AS cents
       |  FROM events
       |), f AS (
       |  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
       |), t AS (
       |  SELECT e.user_id, f.cohort_week, e.week - f.cohort_week AS week_offset,
       |         e.event_type, e.cents
       |  FROM e JOIN f USING (user_id)
       |), grid AS (
       |  SELECT cohort_week, week_offset, COUNT(*) AS active_users FROM (
       |    SELECT DISTINCT user_id, cohort_week, week_offset FROM t) g
       |  GROUP BY 1, 2
       |), rev AS (
       |  SELECT cohort_week, week_offset,
       |         CAST(SUM(cents) AS BIGINT) AS revenue_cents
       |  FROM t WHERE event_type = 'purchase' GROUP BY 1, 2
       |), sz AS (
       |  SELECT cohort_week, COUNT(*) AS cohort_users FROM (
       |    SELECT DISTINCT user_id, cohort_week FROM t) s
       |  GROUP BY 1
       |), cells AS (
       |  SELECT g.cohort_week, g.week_offset, g.active_users, sz.cohort_users,
       |         COALESCE(rev.revenue_cents, 0) AS revenue_cents
       |  FROM grid g
       |  LEFT JOIN rev ON rev.cohort_week = g.cohort_week
       |              AND rev.week_offset = g.week_offset
       |  JOIN sz ON sz.cohort_week = g.cohort_week
       |)
       |SELECT cohort_week, week_offset, active_users, cohort_users,
       |       revenue_cents,
       |       CAST(SUM(revenue_cents) OVER (
       |         PARTITION BY cohort_week ORDER BY week_offset
       |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents,
       |       CAST(CAST(SUM(revenue_cents) OVER (
       |         PARTITION BY cohort_week ORDER BY week_offset
       |         ROWS UNBOUNDED PRECEDING) AS BIGINT) // cohort_users AS BIGINT)
       |         AS ltv_per_user_cents
       |FROM cells""".stripMargin

  /** Per-cohort churn rates — the read retention dashboards alert on:
    * a user is churned when their last activity predates the corpus's
    * final week (the corpus-relative "now" of rfm_segments). Per
    * signup-week cohort: users, churned count, churn ppm (floor division
    * of exact counts). One user-keyed min/max aggregation + a
    * cohort-keyed conditional agg; the corpus max-week rides as a 1-row
    * broadcast.
    */
  def churnRates(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $WEEK_US").as("week"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"), max(col("week")).as("last_week"))
    val maxWeek = ev.agg(max(col("week")).as("max_week"))
    users.crossJoin(broadcast(maxWeek))
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("last_week") < col("max_week"), 1L).otherwise(0L))
          .as("n_churned"))
      .select(col("cohort_week"), col("n_users"), col("n_churned"),
        expr("(n_churned * 1000000) div n_users").as("churn_ppm"))
  }

  val churnRatesSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $WEEK_US AS week FROM events
       |), u AS (
       |  SELECT user_id, MIN(week) AS cohort_week, MAX(week) AS last_week
       |  FROM e GROUP BY user_id
       |), m AS (SELECT MAX(week) AS max_week FROM e)
       |SELECT cohort_week, COUNT(*) AS n_users,
       |       CAST(SUM(CASE WHEN last_week < m.max_week THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_churned,
       |       CAST((SUM(CASE WHEN last_week < m.max_week THEN 1 ELSE 0 END)
       |             * 1000000) // COUNT(*) AS BIGINT) AS churn_ppm
       |FROM u CROSS JOIN m
       |GROUP BY cohort_week, m.max_week""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel" -> funnel,
    "cohort_ltv" -> cohortLtv,
    "churn_rates" -> churnRates,
    "retention_cohorts" -> retentionCohorts)

  val oracles: Map[String, String] = Map(
    "funnel" -> funnelSql,
    "cohort_ltv" -> cohortLtvSql,
    "churn_rates" -> churnRatesSql,
    "retention_cohorts" -> retentionCohortsSql)
}
