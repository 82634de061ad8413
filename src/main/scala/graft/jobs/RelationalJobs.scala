package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Relational/analytical headroom on the TPC-H-ish star schema
  * (SURVEY.md §2.6 note: distinct aggs / multi-joins are "capability
  * headroom" Catalyst gives for free — these queries pin that surface and
  * carry the scale story for BENCH).
  *
  * Money arithmetic is exact: prices/discounts/taxes are 2-decimal doubles,
  * so we compute in integer cents (BIGINT) and divide once at the end —
  * bit-identical across engines, no float-ordering drift at any SF.
  *
  * Scale notes: q1 is a single two-phase hash agg over the fact table.
  * q3/q5 join dimension→fact smallest-first; dimension sides are
  * explicitly `broadcast()` so the fact table never shuffles for them at
  * 1000-executor scale (only the orders⨝lineitem equi-join exchanges, and
  * AQE can switch it to broadcast when the filtered side is small).
  */
object RelationalJobs {

  /** 2-decimal double → exact integer cents. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  // ---- q1: pricing summary (scan + filter + two-phase agg) ----

  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          / 1e4).as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
            * (lit(100) + cents(col("l_tax")))) / 1e6).as("sum_charge"),
        round(avg(col("l_quantity")) + lit(1e-9), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")) + lit(1e-9), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
      |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
      |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 1e4 AS sum_disc_price,
      |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
      |      * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) / 1e6 AS sum_charge,
      |  ROUND(AVG(l_quantity) + 1e-9, 2) AS avg_qty,
      |  ROUND(AVG(l_extendedprice) + 1e-9, 2) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q3: shipping priority (broadcast dim ⨝ fact ⨝ fact + top-N) ----

  def q3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    val joined = li
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(cents(col("l_extendedprice"))
        * (lit(100) - cents(col("l_discount")))) / 1e4).as("revenue"))
      .select(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
    // Global top-10 via orderBy+limit → TakeOrderedAndProject (per-partition
    // top-k + merge). A `row_number` window with no partition key would
    // funnel every aggregated row through one task at scale; this never
    // does. `rn` is then derived on the ≤10-row result with a broadcast
    // self-join (count of strictly-better rows) so the whole query stays a
    // single Catalyst plan with no single-partition WindowExec.
    val top = joined
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .cache()
    val better = broadcast(top
      .select(col("revenue").as("b_rev"), col("l_orderkey").as("b_key")))
    top.join(better,
        col("b_rev") > col("revenue") ||
          (col("b_rev") === col("revenue") && col("b_key") < col("l_orderkey")),
        "left")
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .agg((count(col("b_key")) + 1).as("rn"))
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("revenue"), col("rn"))
  }

  val q3ShippingSql: String =
    """WITH j AS (
      |  SELECT l.l_orderkey,
      |         epoch_ms(o.o_orderdate) // 1000 AS o_orderdate,
      |         o.o_orderpriority,
      |         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 1e4
      |           AS revenue
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment = 'BUILDING'
      |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |    AND l.l_shipdate > TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2, 3
      |)
      |SELECT l_orderkey, o_orderdate, o_orderpriority, revenue, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    ORDER BY revenue DESC, l_orderkey ASC) AS rn
      |  FROM j) ranked
      |WHERE rn <= 10""".stripMargin

  // ---- q5: local supplier volume (5-way join, broadcast dims) ----

  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(cents(col("l_extendedprice"))
        * (lit(100) - cents(col("l_discount")))) / 1e4).as("revenue"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n.n_name,
      |       SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 1e4
      |         AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |              AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n.n_name""".stripMargin

  // ---- q18 shape: large-volume orders (HAVING + fact-side join) ----

  private val Q18_MIN_QTY = 250L

  /** TPC-H q18 shape: orders whose total line quantity exceeds a
    * threshold, joined back to the order header. The aggregation-side
    * filter (HAVING) shrinks the fact side to a sliver BEFORE the join —
    * at 100 TB the orders join sees only qualifying orderkeys, and AQE
    * turns it into a broadcast join when that sliver is small.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > Q18_MIN_QTY)
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate"),
        col("sum_qty"))
  }

  val q18LargeOrdersSql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |         CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) > $Q18_MIN_QTY
       |)
       |SELECT o.o_custkey, o.o_orderkey,
       |       epoch_ms(o.o_orderdate) // 1000 AS o_orderdate,
       |       big.sum_qty
       |FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey""".stripMargin

  // ---- q7 shape: volume shipping between a nation pair ----

  private val Q7_NATION_A = "NATION_11"
  private val Q7_NATION_B = "NATION_12"

  /** TPC-H q7 shape: bilateral shipping volume between two nations per
    * ship year — the two-role dimension join (supplier nation vs
    * customer nation on the SAME dimension table). Spark-first: both
    * nation-filtered dimension legs broadcast, so the only wide join is
    * lineitem⨝orders on the order key; the nation predicate prunes the
    * fact flow at the supplier/customer broadcasts, not in a post-join
    * filter. The fixture pair is probed non-degenerate at EVERY SF
    * (19/47/536 bilateral rows — the graph_reach seed-probing rule); revenue in exact
    * integer cents×(100−disc) before ONE final double division (the q5
    * money discipline).
    */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val ord = Tables.orders(spark, sfDir)
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(cents(col("l_extendedprice"))
        * (lit(100) - cents(col("l_discount")))) / 1e4).as("revenue"))
  }

  val q7VolumeShippingSql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       |       SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
       |           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 1e4
       |         AS revenue
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |WHERE sn.n_name IN ('$Q7_NATION_A', '$Q7_NATION_B')
       |  AND cn.n_name IN ('$Q7_NATION_A', '$Q7_NATION_B')
       |  AND sn.n_name <> cn.n_name
       |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2, 3""".stripMargin

  // ---- q10 shape: returned-item reporting (top-20 customers) ----

  /** TPC-H q10 shape: customers ranked by revenue lost to returns in one
    * quarter. The return-flag filter prunes lineitem at the scan
    * (PushedFilters), the quarter prunes orders; customer/nation are
    * broadcast; the global top-20 is `orderBy().limit()` —
    * TakeOrderedAndProject, never a windowed rank (the global-top-N
    * rule). Ranking runs on the EXACT integer revenue
    * (cents×(100−disc)) with a custkey tie-break, so the cut is
    * deterministic in both engines; the emitted revenue divides once.
    */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(cents(col("l_extendedprice"))
        * (lit(100) - cents(col("l_discount")))).as("rev_i"))
      .orderBy(col("rev_i").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        (col("rev_i") / 1e4).as("revenue"), col("c_acctbal"), col("n_name"))
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
      |  SELECT c.c_custkey, c.c_name,
      |         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
      |           AS rev_i,
      |         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
      |           AS BIGINT) / 1e4 AS revenue,
      |         c.c_acctbal, n.n_name
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE l.l_returnflag = 'R'
      |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o.o_orderdate < TIMESTAMP '1996-07-01'
      |  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      |  ORDER BY rev_i DESC, c.c_custkey ASC
      |  LIMIT 20) t""".stripMargin

  // ---- distinct aggregation (capability headroom: countDistinct) ----

  def distinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))

  val distinctAggSql: String =
    """SELECT l_returnflag,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       COUNT(DISTINCT l_partkey) AS n_parts,
      |       COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Data-quality expectations audit — the Great-Expectations-style gate
    * a pipeline runs at ingest: one row per declared check with exact
    * checked/failed counts and a pass verdict. Domain checks (value
    * range, type vocabulary, parsable props, sane timestamps), content
    * contracts (documents.n_chars = length(text), embedding
    * dimensionality), and referential integrity (orders→customer,
    * lineitem→orders). All-pass on the driver corpus BY DESIGN — the
    * audit's job is the counts; the spec proves fail-detection on a
    * crafted corpus with violations.
    *
    * 100 TB shape: the four event checks share ONE scan (one conditional
    * aggregate exploded into rows); documents and embeddings one scan
    * each; the two FK checks are fact-side LEFT JOINs against broadcast
    * dimension key sets — the fact tables never shuffle.
    */
  def dataExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val evAgg = Tables.events(spark, sfDir)
      .select(col("value"), col("event_type"), col("props"),
        unix_micros(col("ts")).as("us"))
      .agg(count(lit(1)).as("n"),
        sum(when(!(col("value") >= 0.0 && col("value") < 1000.0), 1L)
          .otherwise(0L)).as("f_range"),
        sum(when(!col("event_type").isin(
          "click", "view", "purchase", "signup", "error"), 1L)
          .otherwise(0L)).as("f_domain"),
        sum(when(regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1)
          === "", 1L).otherwise(0L)).as("f_props"),
        sum(when(!(col("us") >= 0L && col("us") < 2000000000000000L), 1L)
          .otherwise(0L)).as("f_ts"))
    val evChecks = evAgg.select(explode(array(
      struct(lit("events_value_range").as("check"), col("n"),
        col("f_range").as("n_failed")),
      struct(lit("events_type_domain").as("check"), col("n"),
        col("f_domain").as("n_failed")),
      struct(lit("events_props_k").as("check"), col("n"),
        col("f_props").as("n_failed")),
      struct(lit("events_ts_sane").as("check"), col("n"),
        col("f_ts").as("n_failed")))).as("c"))
      .select(col("c.check"), col("c.n"), col("c.n_failed"))
    val docChecks = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("n_failed"))
      .select(lit("documents_n_chars").as("check"), col("n"), col("n_failed"))
    val embChecks = Tables.embeddings(spark, sfDir)
      .agg(count(lit(1)).as("n"),
        sum(when(size(col("embedding")) =!= 64, 1L).otherwise(0L))
          .as("n_failed"))
      .select(lit("embeddings_dims").as("check"), col("n"), col("n_failed"))
    def fk(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
        name: String): DataFrame =
      fact.select(col(factKey))
        .join(broadcast(dim.select(col(dimKey)).distinct()
          .withColumn("hit", lit(true))),
          col(factKey) === col(dimKey), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_failed"))
        .select(lit(name).as("check"), col("n"), col("n_failed"))
    val fkOrders = fk(Tables.orders(spark, sfDir), "o_custkey",
      Tables.customer(spark, sfDir), "c_custkey", "orders_custkey_fk")
    val fkLineitem = fk(Tables.lineitem(spark, sfDir), "l_orderkey",
      Tables.orders(spark, sfDir), "o_orderkey", "lineitem_orderkey_fk")
    Seq(evChecks, docChecks, embChecks, fkOrders, fkLineitem)
      .reduce(_ unionAll _)
      .select(col("check"), col("n").as("n_checked"), col("n_failed"),
        (col("n_failed") === 0L).as("pass"))
  }

  val dataExpectationsSql: String =
    """WITH ev AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN NOT (value >= 0.0 AND value < 1000.0)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS f_range,
      |    CAST(SUM(CASE WHEN event_type NOT IN
      |      ('click', 'view', 'purchase', 'signup', 'error')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS f_domain,
      |    CAST(SUM(CASE WHEN regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
      |      = '' THEN 1 ELSE 0 END) AS BIGINT) AS f_props,
      |    CAST(SUM(CASE WHEN NOT (epoch_us(ts) >= 0
      |      AND epoch_us(ts) < 2000000000000000) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS f_ts
      |  FROM events
      |), checks AS (
      |  SELECT 'events_value_range' AS check, n, f_range AS n_failed FROM ev
      |  UNION ALL
      |  SELECT 'events_type_domain', n, f_domain FROM ev
      |  UNION ALL
      |  SELECT 'events_props_k', n, f_props FROM ev
      |  UNION ALL
      |  SELECT 'events_ts_sane', n, f_ts FROM ev
      |  UNION ALL
      |  SELECT 'documents_n_chars', COUNT(*),
      |         CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |           AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'embeddings_dims', COUNT(*),
      |         CAST(SUM(CASE WHEN length(embedding) <> 64 THEN 1 ELSE 0 END)
      |           AS BIGINT)
      |  FROM embeddings
      |  UNION ALL
      |  SELECT 'orders_custkey_fk', COUNT(*),
      |         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |           AS BIGINT)
      |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk', COUNT(*),
      |         CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END)
      |           AS BIGINT)
      |  FROM lineitem l LEFT JOIN orders oo ON oo.o_orderkey = l.l_orderkey
      |)
      |SELECT "check", CAST(n AS BIGINT) AS n_checked, n_failed,
      |       n_failed = 0 AS pass
      |FROM checks""".stripMargin

  // ---- q6: forecasting revenue change (pure filter + global agg) ----

  /** The predicate-pushdown showcase: three conjunctive filters and ONE
    * global sum — the whole query is a parquet scan whose row-group
    * pruning (shipdate min/max stats) plus pushed filters do the work,
    * then a partial+final agg of a single exact BIGINT (cents × basis
    * points). At 100 TB nothing but the scan exists to optimize; the
    * date window prunes most row groups before any CPU runs. Constants
    * probed non-degenerate at every SF (103 / 1,193 / 12,170 rows).
    * Discounts are exact integer cents so BETWEEN 5 AND 7 is the exact
    * [0.05, 0.07] band — no float-boundary ambiguity.
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        cents(col("l_discount")).between(5, 7) &&
        col("l_quantity") < 24)
      .agg(
        (sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 1e4)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  val q6ForecastRevenueSql: String =
    """SELECT
      |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |      * CAST(ROUND(l_discount * 100) AS BIGINT)) / 1e4 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-01-01'
      |  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  // ---- q14: promotion effect (fact ⨝ broadcast dim + conditional agg) ----

  /** Promo revenue share over one quarter: lineitem joins the part
    * dimension (broadcast — the fact table never shuffles) and splits
    * discounted revenue by p_type = 'PROMO'. Both sums are exact BIGINTs
    * (cents × (100−discount)); the share is emitted as an exact ppm
    * integer (single BIGINT division) alongside the two sums, so no
    * cross-engine float ratio exists anywhere. Probed at every SF:
    * 56/219, 355/2209, 3577/21462 promo/total quarter rows.
    */
  def q14PromoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
    val rev = cents(col("l_extendedprice")) *
      (lit(100) - cents(col("l_discount")))
    li.join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
          .as("promo_rev_c4"),
        sum(rev).as("total_rev_c4"))
      .select(col("promo_rev_c4"), col("total_rev_c4"),
        expr("(promo_rev_c4 * 1000000) div total_rev_c4").as("promo_ppm"))
  }

  val q14PromoEffectSql: String =
    """WITH j AS (
      |  SELECT CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS rev,
      |         p.p_type
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1998-04-01'
      |)
      |SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
      |    AS promo_rev_c4,
      |  CAST(SUM(rev) AS BIGINT) AS total_rev_c4,
      |  CAST((CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
      |             AS BIGINT) * 1000000)
      |    // CAST(SUM(rev) AS BIGINT) AS BIGINT) AS promo_ppm
      |FROM j""".stripMargin

  // ---- q12: late-shipment priority accounting (q12's conditional agg) ----

  /** The TPC-H q12 shape — two-priority conditional counts by mode with a
    * date chain — restated on the fixture's columns (it has no
    * l_shipmode/l_commitdate/l_receiptdate): the mode axis is
    * l_returnflag and the lateness chain is l_shipdate more than 60 days
    * after o_orderdate inside the 1996 ship window. One date-pruned
    * 3-column lineitem scan shuffle-joins orders on the key (both sides
    * fact-sized at 100 TB — no broadcast exists for orders), the
    * lateness predicate evaluates in-row post-join, and the aggregation
    * is a 3-group conditional COUNT (map-side partials). COUNT(CASE),
    * not SUM(CASE): DuckDB SUM(BIGINT) is HUGEINT (the r14 audit class).
    * Probed non-degenerate at every SF (both counts > 0 in every group:
    * A 25/43, N 26/30, R 22/47 at sf0.001).
    */
  def q12LatePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(high, lit(1))).as("high_cnt"),
        count(when(!high, lit(1))).as("low_cnt"))
  }

  val q12LatePrioritySql: String =
    """SELECT l.l_returnflag,
      |  COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |             THEN 1 END) AS high_cnt,
      |  COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |             THEN 1 END) AS low_cnt
      |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1""".stripMargin

  // ---- q9: profit by nation and year (decorrelated supplycost) ----

  /** The TPC-H q9 shape — product profit by supplier nation × order year
    * over a part-name filter — with supplycost restated via the q2
    * per-(part, supplier) min unit-cost derivation (the fixture has no
    * partsupp): cost of a line = its pair's historical-minimum unit cost
    * × quantity. All arithmetic is exact BIGINT at the c4 scale
    * (revenue = cents × (100 − discount-cents); uc is cents×10 per unit,
    * so uc × qty × 10 lands on the same scale — no float ever sums).
    *
    * Plan shape at 100 TB: TWO lineitem scans — one for the
    * (part, supplier) min-cost aggregate (the partsupp surrogate; the
    * canonical query reads a separate partsupp table here), one for the
    * probe — joined on the composite key both sides already shuffle on;
    * part (name-filtered before the join), supplier and nation broadcast.
    * The min-cost aggregate's input is ALSO pre-filtered by a broadcast
    * LeftSemi on the widget part keys: only widget pairs are ever
    * consumed by the inner probe join, so the semi-join is lossless and
    * shrinks scan 1's aggregate state by the part selectivity — at 100×
    * scale the difference between a catalog-sized and a slice-sized
    * shuffle on the first scan.
    * Probed non-degenerate at every SF (70/175/175 nation×year groups,
    * no zero profits; sign varies with corpus shape — the derived min-uc
    * cost is price-correlated, unlike canonical partsupp).
    */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val widgets = Tables.part(spark, sfDir)
      .filter(col("p_name").like("%widget%")).select(col("p_partkey"))
    val uc = li
      .join(broadcast(widgets), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey").as("u_partkey"),
        col("l_suppkey").as("u_suppkey"))
      .agg(min(expr("(cast(round(l_extendedprice * 100) as bigint) * 10) " +
        "div cast(round(l_quantity) as bigint)")).as("uc"))
    li.join(broadcast(widgets), col("l_partkey") === col("p_partkey"))
      .join(uc, col("l_partkey") === col("u_partkey") &&
        col("l_suppkey") === col("u_suppkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(cents(col("l_extendedprice")) *
          (lit(100) - cents(col("l_discount"))) -
          col("uc") * round(col("l_quantity"), 0).cast("long") * 10)
        .as("profit_c4"))
  }

  val q9ProductProfitSql: String =
    """WITH uc AS (
      |  SELECT l_partkey AS u_partkey, l_suppkey AS u_suppkey,
      |         MIN((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10)
      |             // CAST(ROUND(l_quantity) AS BIGINT)) AS uc
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT n.n_name, year(o.o_orderdate) AS o_year,
      |  CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
      |           - u.uc * CAST(ROUND(l.l_quantity) AS BIGINT) * 10)
      |    AS BIGINT) AS profit_c4
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
      |JOIN uc u ON u.u_partkey = l.l_partkey AND u.u_suppkey = l.l_suppkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1, 2""".stripMargin

  // ---- q19: discounted revenue (disjunctive multi-predicate dim join) ----

  /** Three brand/quantity/size disjuncts over the same join — the
    * OR-of-conjunctions shape that tests disjunctive predicate handling:
    * the part side filters to the union of the three brand/size branches
    * BEFORE broadcasting (each branch's part predicate is
    * part-table-only), and the residual per-branch quantity conjunction
    * evaluates post-join as one codegen'd boolean. Branch row counts
    * probed non-degenerate at every SF (13/4/27 at sf0.001).
    */
  def q19DiscountedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val b1 = col("p_brand") === "Brand#13" &&
      col("l_quantity").between(1, 11) && col("p_size").between(1, 10)
    val b2 = col("p_brand") === "Brand#11" &&
      col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val b3 = col("p_brand") === "Brand#22" &&
      col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
    val partSide = Tables.part(spark, sfDir)
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(1, 15)))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(partSide), col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(
        (sum(cents(col("l_extendedprice"))
          * (lit(100) - cents(col("l_discount")))) / 1e4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19DiscountedRevenueSql: String =
    """SELECT
      |  SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 1e4
      |    AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#13' AND l.l_quantity BETWEEN 1 AND 11
      |       AND p.p_size BETWEEN 1 AND 10)
      |   OR (p.p_brand = 'Brand#11' AND l.l_quantity BETWEEN 10 AND 20
      |       AND p.p_size BETWEEN 1 AND 10)
      |   OR (p.p_brand = 'Brand#22' AND l.l_quantity BETWEEN 20 AND 30
      |       AND p.p_size BETWEEN 1 AND 15)""".stripMargin

  // ---- q4 shape: order priority via EXISTS (native left-semi join) ----

  /** TPC-H q4 shape (`flink-uba` has no subquery surface; this pins
    * Catalyst's native LeftSemi path): orders in one year that have at
    * least one "late" line (shipped > 60 days after the order date),
    * counted by priority. The EXISTS becomes a hash LEFT SEMI join on
    * `orderkey` with the date comparison as a residual — no distinct, no
    * row explosion. Scale: the lineitem side carries a DERIVED pushed
    * filter (`l_shipdate > window_start + 60d`, lossless since shipdate
    * > orderdate + 60d ≥ that bound) so the fact scan prunes row groups
    * before the shuffle; both sides exchange on the int orderkey only.
    * Window probed non-degenerate at every SF.
    */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1997-03-02").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  // ---- q13 shape: customer order-count distribution (left outer + zero bucket) ----

  /** TPC-H q13 shape: how many customers placed 0, 1, 2, … orders in a
    * window. The LEFT OUTER join is the point — customers with no orders
    * in the window survive as the zero bucket (probed non-degenerate:
    * ~49% of customers at every SF for 1998H1; an all-time window is
    * degenerate here because every customer has orders — the r13 seed
    * rule). Scale: orders pre-aggregates to one row per active customer
    * BEFORE the join (the join never sees fact multiplicity), then the
    * distribution agg runs on a customer-sized frame.
    */
  def q13CustOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13CustOrdersSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COALESCE(o.n, 0) AS c_count
      |  FROM customer c LEFT JOIN (
      |    SELECT o_custkey, COUNT(*) AS n FROM orders
      |    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |      AND o_orderdate < TIMESTAMP '1998-07-01'
      |    GROUP BY o_custkey) o ON c.c_custkey = o.o_custkey) t
      |GROUP BY c_count""".stripMargin

  // ---- q15 shape: top supplier(s) by quarter revenue (scalar-subquery max) ----

  /** TPC-H q15 shape: the supplier(s) with the maximum revenue in one
    * quarter — the scalar-subquery-max pattern, tie-inclusive. Revenue is
    * summed in exact integer (cents × (100−disc)) so the max equality
    * compares BIGINTs, never doubles. Scale: the per-supplier revenue agg
    * is supplier-sized; the 1-row max frame and the tie-sized winner frame
    * are both broadcast — the supplier dimension table is never shuffled,
    * and nothing here depends on the dimension being small.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice"))
        * (lit(100) - cents(col("l_discount")))).as("rev_i"))
      // consumed twice (scalar max + winner join) — cache the
      // supplier-sized aggregate so the lineitem scan runs once
      .cache()
    val mx = rev.agg(max(col("rev_i")).as("mx"))
    val winners = rev.join(broadcast(mx), col("rev_i") === col("mx"))
      .select(col("l_suppkey"), col("rev_i"))
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"))
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_i") / 1e4).as("total_revenue"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS MATERIALIZED (
      |  SELECT l_suppkey,
      |         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_i
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.rev_i / 1e4 AS total_revenue
      |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      |WHERE r.rev_i = (SELECT MAX(rev_i) FROM rev)""".stripMargin

  // ---- q17 shape: small-lot revenue (decorrelated correlated-avg subquery) ----

  /** TPC-H q17 shape: revenue from lines whose quantity is below half the
    * part's average quantity. The correlated AVG decorrelates into one
    * per-part aggregate joined back to the lines — and the threshold
    * `qty < 0.5·avg` restates as the exact integer inequality
    * `2·qty·cnt < sum_qty` (quantities are integral in this fixture, so
    * no double AVG ever materializes — engine-exact at any partial-agg
    * order). Scale: the brand filter broadcasts a part-key sliver into
    * the fact scan first, so both the stats agg and the join-back run on
    * the filtered sliver, partitioned by the same int part key.
    */
  def q17SmallLots(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    // consumed by BOTH the stats agg and the join-back (r1-2 rule):
    // 3 slim int columns on the brand-filtered sliver
    val li = Tables.lineitem(spark, sfDir)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity"), 0).cast("long").as("qty_i"),
        cents(col("l_extendedprice")).as("price_c"))
      .cache()
    val stats = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty_i")).as("sum_qty"))
    li.join(stats, Seq("l_partkey"))
      .filter(col("qty_i") * 2 * col("cnt") < col("sum_qty"))
      .agg((sum(col("price_c")) / 100.0).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val q17SmallLotsSql: String =
    """WITH li AS MATERIALIZED (
      |  SELECT l.l_partkey,
      |         CAST(ROUND(l.l_quantity) AS BIGINT) AS qty_i,
      |         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand = 'Brand#13'),
      |stats AS (
      |  SELECT l_partkey, COUNT(*) AS cnt,
      |         CAST(SUM(qty_i) AS BIGINT) AS sum_qty
      |  FROM li GROUP BY l_partkey)
      |SELECT CAST(SUM(li.price_c) AS BIGINT) / 100.0 AS total_price,
      |       COUNT(*) AS n_items
      |FROM li JOIN stats USING (l_partkey)
      |WHERE li.qty_i * 2 * stats.cnt < stats.sum_qty""".stripMargin

  // ---- q8 shape: market share (conditional-aggregation ratio) ----

  /** TPC-H q8 shape: one supplier nation's share of a region's market for
    * one part type, per year — the ratio-of-conditional-sums pattern. Both
    * sums are exact integers (cents × (100−disc)); the share is ONE IEEE
    * division of the two BIGINTs, so every engine lands the identical
    * double (the exact sums ride along as hash anchors). Constants follow
    * the seed rule: NATION_24 within AMERICA/PROMO probed nonzero and
    * non-total in every year at every SF. Scale: part/customer/supplier
    * sides broadcast (q5 precedent); only lineitem⨝orders exchanges, on
    * the int orderkey.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val amer = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(amer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_24", vol).otherwise(0L)).as("num_i"),
        sum(vol).as("den_i"))
      .select(col("o_year"), col("num_i"), col("den_i"),
        (col("num_i").cast("double") / col("den_i").cast("double")).as("mkt_share"))
  }

  val q8MarketShareSql: String =
    """SELECT o_year, num_i, den_i,
      |       CAST(num_i AS DOUBLE) / CAST(den_i AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT year(o.o_orderdate) AS o_year,
      |         CAST(SUM(CASE WHEN sn.n_name = 'NATION_24'
      |                       THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |                            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
      |                       ELSE 0 END) AS BIGINT) AS num_i,
      |         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
      |                   * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
      |              AS BIGINT) AS den_i
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN region r ON cn.n_regionkey = r.r_regionkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
      |  GROUP BY 1) t""".stripMargin

  // ---- q11 shape: important parts (HAVING vs a global scalar) ----

  /** TPC-H q11 shape: parts whose value within one supplier nation
    * exceeds a global-threshold scalar. Classic q11's FIXED fraction is a
    * scale trap (per-part share shrinks as the corpus grows, so one
    * constant is degenerate at some SF); the threshold here is
    * SCALE-INVARIANT — `value > 2 × mean part value`, restated as the
    * exact integer inequality `val_i · n_parts > 2 · tot_i` (bounded:
    * val_i ≤ 10¹⁰ cents × n_parts ≤ 10⁶ stays far under 2⁶³). Probed
    * ~9% of parts passing at every SF. Scale: the nation filter
    * broadcasts a supplier sliver into the fact scan; the per-part agg is
    * part-bounded; the threshold ships as a 1-ROW broadcast non-equi join
    * (BroadcastNestedLoopJoin with a single build row — the anomaly_days
    * grid pattern, never corpus×corpus).
    */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_24")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(spark, sfDir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("val_i"))
      // consumed twice (threshold scalar + winner join) — cache the
      // part-sized aggregate so the lineitem scan runs once
      .cache()
    val tot = v.agg(sum(col("val_i")).as("tot_i"),
      count(lit(1)).as("n_parts"))
    v.join(broadcast(tot),
        col("val_i") * col("n_parts") > lit(2) * col("tot_i"))
      .select(col("l_partkey"), (col("val_i") / 100.0).as("value"))
  }

  val q11ImportantPartsSql: String =
    """WITH v AS MATERIALIZED (
      |  SELECT l.l_partkey,
      |         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
      |              AS BIGINT) AS val_i
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE n.n_name = 'NATION_24'
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(val_i) AS BIGINT) AS tot_i,
      |               COUNT(*) AS n_parts FROM v)
      |SELECT v.l_partkey, v.val_i / 100.0 AS value
      |FROM v, tot
      |WHERE v.val_i * tot.n_parts > 2 * tot.tot_i""".stripMargin

  // ---- q21 shape: lone late supplier (semi + anti join composition) ----

  /** TPC-H q21 shape: suppliers who were the ONLY late supplier on a
    * multi-supplier order ("late" = any line shipped > 60 days after the
    * order date), top-10 by count. Pins Catalyst's LeftSemi AND LeftAnti
    * paths composed on one derived frame: EXISTS(another supplier on the
    * order) is the semi join, NOT EXISTS(another LATE supplier) is the
    * anti join — both hash joins on the int orderkey with the
    * supplier-inequality as residual, never a distinct or a window.
    * Scale: `ol` collapses lineitem to one row per (order, supplier)
    * before any self-join (bounded by suppliers-per-order ≈ 7); it is
    * cached because three branches consume it (r1-2 self-join rule —
    * 3 slim int columns). Top-10 via orderBy+limit
    * (TakeOrderedAndProject), deterministic under ties by suppkey.
    */
  def q21LateSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val ol = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0))
        .as("late"))
    // EXISTS(other supplier) / NOT EXISTS(other LATE supplier) restated as
    // per-order counts over the (okey, skey)-unique frame: with late ∈
    // {0,1}, "another supplier exists" ⇔ n_supp ≥ 2 and "no OTHER late
    // supplier" ⇔ n_late = 1 for a late row — row-for-row the semantics
    // of the previous left-semi + left-anti self-join pair (guide §2.4:
    // two operations keyed the same way share one exchange). The window
    // key is the high-cardinality orderkey (the r4 low-cardinality rule
    // does not apply) and rides the aggregation's existing okey-compatible
    // partitioning, so the two self-join shuffles of the cached frame
    // disappear outright — and so does the cache.
    val w = Window.partitionBy(col("l_orderkey"))
    val cand = ol
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
    val top = cand.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey").asc)
      .limit(10)
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"))
      .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  val q21LateSupplierSql: String =
    """WITH ol AS MATERIALIZED (
      |  SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
      |         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |                  THEN 1 ELSE 0 END) AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT a.okey, a.skey FROM ol a
      |  WHERE a.late = 1
      |    AND EXISTS (SELECT 1 FROM ol b
      |                WHERE b.okey = a.okey AND b.skey <> a.skey)
      |    AND NOT EXISTS (SELECT 1 FROM ol c
      |                    WHERE c.okey = a.okey AND c.skey <> a.skey
      |                      AND c.late = 1)),
      |top AS (
      |  SELECT skey, COUNT(*) AS numwait FROM cand GROUP BY skey
      |  ORDER BY numwait DESC, skey ASC LIMIT 10)
      |SELECT s.s_suppkey, s.s_name, t.numwait
      |FROM supplier s JOIN top t ON s.s_suppkey = t.skey""".stripMargin

  // ---- erasure audit: right-to-be-forgotten cascade accounting ----

  /** GDPR-style deletion audit: given a deterministic tombstone cohort
    * (`custkey % 29 = 7` — the graph_reach 1/29-cohort precedent, ~3.4%
    * of users at every SF), report per table how many rows a
    * right-to-be-forgotten purge would delete vs keep. The interesting
    * row is `lineitem`: it has no user column, so its purge set CASCADES
    * through the purged orders — a semi-join on the int orderkey, the
    * referential-integrity propagation every real erasure pipeline needs.
    * customer/orders/events count in-scan (conditional agg, no join).
    * Scale: one pass per table + one orderkey semi-join; the tombstone
    * predicate is pure arithmetic so it fuses into each scan — no
    * tombstone table ever ships (and if one did, it would broadcast).
    */
  def erasureAudit(spark: SparkSession, sfDir: String): DataFrame = {
    def split(df: DataFrame, tomb: Column, tbl: String): DataFrame =
      df.agg(sum(when(tomb, 1L).otherwise(0L)).as("n_purge"),
          sum(when(tomb, 0L).otherwise(1L)).as("n_keep"))
        .select(lit(tbl).as("tbl"), col("n_purge"), col("n_keep"))
    val tombOrd = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") % 29 === 7).select(col("o_orderkey"))
    val liFlag = Tables.lineitem(spark, sfDir)
      .join(tombOrd, col("l_orderkey") === col("o_orderkey"), "left")
    split(Tables.customer(spark, sfDir), col("c_custkey") % 29 === 7, "customer")
      .unionAll(split(Tables.orders(spark, sfDir),
        col("o_custkey") % 29 === 7, "orders"))
      .unionAll(split(liFlag, col("o_orderkey").isNotNull, "lineitem"))
      .unionAll(split(Tables.events(spark, sfDir),
        col("user_id") % 29 === 7, "events"))
  }

  val erasureAuditSql: String =
    """SELECT 'customer' AS tbl,
      |       CAST(SUM(CASE WHEN c_custkey % 29 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_purge,
      |       CAST(SUM(CASE WHEN c_custkey % 29 = 7 THEN 0 ELSE 1 END) AS BIGINT) AS n_keep
      |FROM customer
      |UNION ALL
      |SELECT 'orders',
      |       CAST(SUM(CASE WHEN o_custkey % 29 = 7 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN o_custkey % 29 = 7 THEN 0 ELSE 1 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem',
      |       CAST(SUM(CASE WHEN t.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN t.o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN (
      |  SELECT o_orderkey FROM orders WHERE o_custkey % 29 = 7) t
      |  ON l.l_orderkey = t.o_orderkey
      |UNION ALL
      |SELECT 'events',
      |       CAST(SUM(CASE WHEN user_id % 29 = 7 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(SUM(CASE WHEN user_id % 29 = 7 THEN 0 ELSE 1 END) AS BIGINT)
      |FROM events""".stripMargin

  // ---- q2 shape: min-cost supplier per part (correlated scalar min) ----

  /** TPC-H q2 shape: for every part, the EUROPE supplier(s) offering the
    * minimum unit cost — the min-cost-per-group correlated scalar,
    * decorrelated into a window min over the per-(part, supplier) cost
    * aggregate (tie-inclusive by construction, the q15 discipline). The
    * fixture has no partsupp table, so "supply cost" is the supplier's
    * best observed unit price on the fact table: MIN over lines of
    * `(cents(extendedprice)·10) div qty` — all-positive integer division,
    * identical truncation in both engines, quantities integral in this
    * fixture (the q17 note). Probed non-degenerate at every SF
    * (200/1984/19960 parts with a EUROPE winner).
    *
    * Scale: region/nation/supplier compose into one broadcast dim; the
    * fact table never shuffles for it. The (part, supplier) agg exchanges
    * once on the int key pair; the window min re-partitions by part only.
    * The winner set is part-bounded (≥1 per part, ties rare), joined back
    * to the broadcast supplier dim — no correlated re-scan anywhere.
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val euro = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val cost = Tables.lineitem(spark, sfDir)
      .join(broadcast(euro.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("(cast(round(l_extendedprice * 100) as bigint) * 10) " +
          "div cast(round(l_quantity) as bigint)").as("uc"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("uc")).as("cost_i"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    cost.withColumn("mc", min(col("cost_i")).over(w))
      .filter(col("cost_i") === col("mc"))
      .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("cost_i").as("min_cost_i"))
  }

  val q2MinCostSupplierSql: String =
    """WITH euro AS MATERIALIZED (
      |  SELECT s.s_suppkey, s.s_name, n.n_name
      |  FROM supplier s
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'),
      |cost AS (
      |  SELECT l.l_partkey, l.l_suppkey,
      |         MIN((CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * 10)
      |             // CAST(ROUND(l.l_quantity) AS BIGINT)) AS cost_i
      |  FROM lineitem l JOIN euro e ON l.l_suppkey = e.s_suppkey
      |  GROUP BY 1, 2),
      |win AS (
      |  SELECT l_partkey, l_suppkey, cost_i,
      |         MIN(cost_i) OVER (PARTITION BY l_partkey) AS mc
      |  FROM cost)
      |SELECT w.l_partkey AS p_partkey, e.s_suppkey, e.s_name, e.n_name,
      |       w.cost_i AS min_cost_i
      |FROM win w JOIN euro e ON w.l_suppkey = e.s_suppkey
      |WHERE w.cost_i = w.mc""".stripMargin

  // ---- q20 shape: excess-share suppliers (semi-join over an aggregate threshold) ----

  /** TPC-H q20 shape: suppliers holding an EXCESS SHARE of some PROMO
    * part's shipments in 1998H1 — the EXISTS-over-aggregate-threshold
    * pattern. The correlated `EXISTS (SELECT ... HAVING supplier's share
    * > 50%)` decorrelates into one pre-aggregated fact side: per-(part,
    * supplier) shipped quantity, per-part totals via window sums, the
    * exact integer halving `2·q > total` (at most ONE dominator per part
    * by construction), restricted to CONTESTED parts (≥2 suppliers —
    * otherwise dominance is vacuous; probed 8/66/679 of 10/100/1000
    * suppliers at the three SFs). The supplier dim then LEFT SEMI joins
    * the dominator set — no correlated re-scan, no distinct (semi joins
    * are multiplicity-insensitive).
    *
    * Scale: the part filter broadcasts into the fact scan; the (part,
    * supplier) agg and the per-part window share one part-keyed exchange
    * lineage; the dominator frame is part-bounded (≤1 row per part) and
    * the semi join runs on the int suppkey (AQE broadcasts it when small).
    */
  def q20ExcessShare(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val sq = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity"), 0).cast("long")).as("q"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val dom = sq
      .withColumn("tq", sum(col("q")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .filter(col("nsupp") >= 2 && col("q") * 2 > col("tq"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, sfDir)
      .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  val q20ExcessShareSql: String =
    """WITH sq AS (
      |  SELECT l.l_suppkey, l.l_partkey,
      |         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  WHERE p.p_type = 'PROMO'
      |    AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1998-07-01'
      |  GROUP BY 1, 2),
      |dom AS (
      |  SELECT l_suppkey FROM (
      |    SELECT l_suppkey, q,
      |           CAST(SUM(q) OVER (PARTITION BY l_partkey) AS BIGINT) AS tq,
      |           COUNT(*) OVER (PARTITION BY l_partkey) AS nsupp
      |    FROM sq) t
      |  WHERE nsupp >= 2 AND 2 * q > tq)
      |SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM dom d WHERE d.l_suppkey = s.s_suppkey)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q20_excess_share" -> q20ExcessShare,
    "data_expectations" -> dataExpectations,
    "erasure_audit" -> erasureAudit,
    "q4_order_priority" -> q4OrderPriority,
    "q8_market_share" -> q8MarketShare,
    "q11_important_parts" -> q11ImportantParts,
    "q13_cust_orders" -> q13CustOrders,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_lots" -> q17SmallLots,
    "q21_late_supplier" -> q21LateSupplier,
    "q1_pricing" -> q1Pricing,
    "q3_shipping" -> q3Shipping,
    "q5_local_supplier" -> q5LocalSupplier,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q10_returned_items" -> q10ReturnedItems,
    "q18_large_orders" -> q18LargeOrders,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q14_promo_effect" -> q14PromoEffect,
    "q19_discounted_revenue" -> q19DiscountedRevenue,
    "q12_late_priority" -> q12LatePriority,
    "q9_product_profit" -> q9ProductProfit,
    "distinct_agg" -> distinctAgg)

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q20_excess_share" -> q20ExcessShareSql,
    "data_expectations" -> dataExpectationsSql,
    "erasure_audit" -> erasureAuditSql,
    "q4_order_priority" -> q4OrderPrioritySql,
    "q8_market_share" -> q8MarketShareSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q13_cust_orders" -> q13CustOrdersSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_lots" -> q17SmallLotsSql,
    "q21_late_supplier" -> q21LateSupplierSql,
    "q1_pricing" -> q1PricingSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q14_promo_effect" -> q14PromoEffectSql,
    "q19_discounted_revenue" -> q19DiscountedRevenueSql,
    "q12_late_priority" -> q12LatePrioritySql,
    "q9_product_profit" -> q9ProductProfitSql,
    "distinct_agg" -> distinctAggSql)
}
