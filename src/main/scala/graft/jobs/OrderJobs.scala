package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** The order-detect job family (SURVEY.md §2.9 X3/X4, §2.10 J2, §2.11 C1;
  * reference `OrderPayTimeout.java`, `OrderPayTimeoutWithoutCEP.java`,
  * `TxPayMatch.java`, `TxPayMatchByJoin.java`) restated over `events` per
  * FIXTURES.md §2: 'signup' ≈ create/receipt stream, 'purchase' ≈ pay
  * stream, user_id ≈ orderId/txId.
  *
  * These are the BATCH forms — the oracles of the streaming state machines
  * in graft.streaming. Batch semantics: conditional aggregation replaces the
  * per-key timer machine (the reference itself proves the equivalence by
  * re-implementing its CEP job without CEP).
  *
  * Scale notes: the timeout classifier is one hash aggregation (partial →
  * final, single shuffle on user_id). The reconciliation queries are
  * equi-joins on the key with a time-range residual — Catalyst plans
  * SortMergeJoin on user_id; at 100 TB both sides shuffle once on the join
  * key and the range predicate filters within sorted runs. Anti-joins reuse
  * the same exchange.
  */
object OrderJobs {

  private val deadline = "INTERVAL 15 MINUTES" // reference: within(15 min)

  /** X3: per-key order lifecycle classification.
    * create = first 'signup', pay = first 'purchase' per user.
    */
  def orderTimeout(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("create_t"),
        min(when(col("event_type") === "purchase", col("ts"))).as("pay_t"))
      .select(
        col("user_id"),
        unix_timestamp(col("create_t")).as("create_ts"),
        unix_timestamp(col("pay_t")).as("pay_ts"),
        when(col("create_t").isNull && col("pay_t").isNotNull,
            "payed but not found created")
          .when(col("pay_t").isNull && col("create_t").isNotNull, "timeout")
          .when(col("pay_t") <= col("create_t") + expr(deadline),
            "payed successfully")
          .when(col("pay_t").isNotNull, "payed but already timeout")
          .as("result_state"))
      .filter(col("result_state").isNotNull)
  }

  val orderTimeoutSql: String =
    """WITH agg AS (
      |  SELECT user_id,
      |         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS create_t,
      |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS pay_t
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id,
      |       epoch_ms(create_t) // 1000 AS create_ts,
      |       epoch_ms(pay_t) // 1000 AS pay_ts,
      |       CASE
      |         WHEN create_t IS NULL AND pay_t IS NOT NULL
      |           THEN 'payed but not found created'
      |         WHEN pay_t IS NULL AND create_t IS NOT NULL THEN 'timeout'
      |         WHEN pay_t <= create_t + INTERVAL 15 MINUTE
      |           THEN 'payed successfully'
      |         WHEN pay_t IS NOT NULL THEN 'payed but already timeout'
      |       END AS result_state
      |FROM agg
      |WHERE create_t IS NOT NULL OR pay_t IS NOT NULL""".stripMargin

  /** C1 CEP-lite batch oracle: relaxed-contiguity 2-step sequence
    * first 'view' → first 'purchase' at-or-after it, within 30 minutes.
    */
  def orderCep(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("start_t"))
      .join(
        Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("p_ts")),
        col("user_id") === col("p_uid") && col("p_ts") >= col("start_t"),
        "left")
      .groupBy(col("user_id"), col("start_t"))
      .agg(min(col("p_ts")).as("next_t"))
      .filter(col("start_t").isNotNull)
      .select(
        col("user_id"),
        unix_timestamp(col("start_t")).as("start_ts"),
        when(col("next_t") <= col("start_t") + expr("INTERVAL 30 MINUTES"),
            unix_timestamp(col("next_t"))).as("match_ts"),
        when(col("next_t") <= col("start_t") + expr("INTERVAL 30 MINUTES"),
            "matched").otherwise("timeout").as("result_state"))
  }

  val orderCepSql: String =
    """WITH starts AS (
      |  SELECT user_id,
      |         MIN(CASE WHEN event_type = 'view' THEN ts END) AS start_t
      |  FROM events GROUP BY user_id
      |), nexts AS (
      |  SELECT s.user_id, s.start_t, MIN(p.ts) AS next_t
      |  FROM starts s LEFT JOIN events p
      |    ON p.user_id = s.user_id AND p.event_type = 'purchase'
      |   AND p.ts >= s.start_t
      |  GROUP BY s.user_id, s.start_t
      |)
      |SELECT user_id,
      |       epoch_ms(start_t) // 1000 AS start_ts,
      |       CASE WHEN next_t <= start_t + INTERVAL 30 MINUTE
      |            THEN epoch_ms(next_t) // 1000 END AS match_ts,
      |       CASE WHEN next_t <= start_t + INTERVAL 30 MINUTE
      |            THEN 'matched' ELSE 'timeout' END AS result_state
      |FROM nexts WHERE start_t IS NOT NULL""".stripMargin

  // ---- J2 / X4: two-stream reconciliation on user_id ----
  // pays = 'purchase', receipts = 'signup'; receipt must land within
  // [pay − 1 h, pay + 1 h] (reference uses [−3 s, +5 s] at second-level
  // data; scaled to this dataset's density).

  private def pays(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pay_t"))

  private def receipts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("r_uid"), col("ts").as("receipt_t"))

  private def matchCond(p: DataFrame, r: DataFrame) =
    p("user_id") === r("r_uid") &&
      r("receipt_t") >= p("pay_t") - expr("INTERVAL 1 HOURS") &&
      r("receipt_t") <= p("pay_t") + expr("INTERVAL 1 HOURS")

  /** J2/X4 matched pairs: inner interval join. */
  def txMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pays(spark, sfDir); val r = receipts(spark, sfDir)
    p.join(r, matchCond(p, r), "inner")
      .select(col("user_id"),
        unix_timestamp(col("pay_t")).as("pay_ts"),
        unix_timestamp(col("receipt_t")).as("receipt_ts"))
  }

  val txMatchSql: String =
    """SELECT p.user_id,
      |       epoch_ms(p.ts) // 1000 AS pay_ts,
      |       epoch_ms(r.ts) // 1000 AS receipt_ts
      |FROM events p JOIN events r
      |  ON p.user_id = r.user_id
      | AND p.event_type = 'purchase' AND r.event_type = 'signup'
      | AND r.ts >= p.ts - INTERVAL 1 HOUR
      | AND r.ts <= p.ts + INTERVAL 1 HOUR""".stripMargin

  /** X4 unmatched-pays side output: anti-join on the same condition. */
  def txUnmatchedPays(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pays(spark, sfDir); val r = receipts(spark, sfDir)
    p.join(r, matchCond(p, r), "left_anti")
      .select(col("user_id"), unix_timestamp(col("pay_t")).as("pay_ts"))
  }

  val txUnmatchedPaysSql: String =
    """SELECT p.user_id, epoch_ms(p.ts) // 1000 AS pay_ts
      |FROM events p
      |WHERE p.event_type = 'purchase' AND NOT EXISTS (
      |  SELECT 1 FROM events r
      |  WHERE r.user_id = p.user_id AND r.event_type = 'signup'
      |    AND r.ts >= p.ts - INTERVAL 1 HOUR
      |    AND r.ts <= p.ts + INTERVAL 1 HOUR)""".stripMargin

  /** X4 unmatched-receipts side output. */
  def txUnmatchedReceipts(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pays(spark, sfDir); val r = receipts(spark, sfDir)
    r.join(p, matchCond(p, r), "left_anti")
      .select(col("r_uid").as("user_id"),
        unix_timestamp(col("receipt_t")).as("receipt_ts"))
  }

  val txUnmatchedReceiptsSql: String =
    """SELECT r.user_id, epoch_ms(r.ts) // 1000 AS receipt_ts
      |FROM events r
      |WHERE r.event_type = 'signup' AND NOT EXISTS (
      |  SELECT 1 FROM events p
      |  WHERE p.user_id = r.user_id AND p.event_type = 'purchase'
      |    AND r.ts >= p.ts - INTERVAL 1 HOUR
      |    AND r.ts <= p.ts + INTERVAL 1 HOUR)""".stripMargin

  /** As-of join via the native custom operator (graft.plans.AsOfJoin):
    * each purchase matched to the user's LATEST signup at-or-before it,
    * within 1 day. Oracle: DuckDB's native ASOF JOIN.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val p = pays(spark, sfDir) // (user_id, pay_t)
    val r = receipts(spark, sfDir) // (r_uid, receipt_t) — fresh expr ids
    graft.plans.AsOf.join(p, r, "user_id", "r_uid", "pay_t", "receipt_t",
        toleranceMicros = 86400L * 1000000L)
      .select(col("user_id"),
        unix_timestamp(col("pay_t")).as("pay_ts"),
        unix_timestamp(col("receipt_t")).as("receipt_ts"))
  }

  val asofJoinSql: String =
    """SELECT p.user_id,
      |       epoch_ms(p.ts) // 1000 AS pay_ts,
      |       epoch_ms(r.ts) // 1000 AS receipt_ts
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') r
      |  ON p.user_id = r.user_id AND p.ts >= r.ts
      |WHERE epoch_us(p.ts) - epoch_us(r.ts) <= 86400000000""".stripMargin

  /** Last-touch attribution — the business rollup built ON the as-of
    * operator: each purchase attributes to the same user's LATEST
    * view/click at-or-before it within 1 hour (the custom
    * [[graft.plans.AsOf]] merge-scan plan, second consumer), then
    * conversions roll up per touched item and touch type. Touches are
    * pre-collapsed to one row per (user, ts) by min event_id, so the
    * as-of "latest" pick has a total order in BOTH engines (equal-ts
    * ties would otherwise be engine-ambiguous).
    *
    * Scale shape: the as-of plan sorts both sides once on (user, ts)
    * and merge-scans — no per-row window, no range join blowup; the
    * rollup is a two-phase agg on small keys.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pay_t"))
    val touches = ev
      .filter(col("event_type") === "view" || col("event_type") === "click")
      .select(col("user_id").as("t_uid"), col("ts").as("touch_t"),
        col("event_id"), col("event_type").as("touch_type"),
        regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1)
          .cast("long").as("item"))
      .groupBy(col("t_uid"), col("touch_t"))
      .agg(min(struct(col("event_id"), col("touch_type"), col("item")))
        .as("m"))
      .select(col("t_uid"), col("touch_t"),
        col("m.touch_type").as("touch_type"), col("m.item").as("item"))
    graft.plans.AsOf.join(purchases, touches, "user_id", "t_uid",
        "pay_t", "touch_t", toleranceMicros = 3600L * 1000000L)
      .groupBy(col("item"), col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        count_distinct(col("user_id")).as("n_users"))
  }

  /** Oracle: DuckDB ASOF JOIN over the identically pre-collapsed touch
    * stream, same 1-hour fence and rollup.
    */
  val attributionSql: String =
    """WITH t AS (
      |  SELECT t_uid, touch_t, touch_type, item FROM (
      |    SELECT user_id AS t_uid, ts AS touch_t, event_type AS touch_type,
      |           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |           ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |             ORDER BY event_id) AS rn
      |    FROM events WHERE event_type IN ('view', 'click'))
      |  WHERE rn = 1
      |), p AS (
      |  SELECT user_id, ts AS pay_t FROM events
      |  WHERE event_type = 'purchase'
      |)
      |SELECT t.item, t.touch_type,
      |       COUNT(*) AS n_conversions,
      |       COUNT(DISTINCT p.user_id) AS n_users
      |FROM p ASOF JOIN t
      |  ON p.user_id = t.t_uid AND p.pay_t >= t.touch_t
      |WHERE epoch_us(p.pay_t) - epoch_us(t.touch_t) <= 3600000000
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution" -> attribution,
    "order_timeout" -> orderTimeout,
    "order_cep" -> orderCep,
    "interval_join" -> txMatch,
    "tx_unmatched_pays" -> txUnmatchedPays,
    "tx_unmatched_receipts" -> txUnmatchedReceipts,
    "asof_join" -> asofJoin)

  val oracles: Map[String, String] = Map(
    "order_timeout" -> orderTimeoutSql,
    "order_cep" -> orderCepSql,
    "interval_join" -> txMatchSql,
    "tx_unmatched_pays" -> txUnmatchedPaysSql,
    "tx_unmatched_receipts" -> txUnmatchedReceiptsSql,
    "asof_join" -> asofJoinSql,
    "attribution" -> attributionSql)
}
