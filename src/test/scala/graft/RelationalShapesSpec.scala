package graft

import graft.jobs.RelationalJobs
import org.apache.spark.sql.functions._

/** The round-13 subquery-shape family: EXISTS semi-join (q4), left-outer
  * zero-bucket distribution (q13), scalar-subquery max (q15), decorrelated
  * correlated-avg (q17), and semi+anti composition (q21). Each is checked
  * against an independent in-test recompute, and the join strategies that
  * ARE the point of each query are pinned in the executed plan.
  */
class RelationalShapesSpec extends SparkSpec {
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** The AQE plan string prints BOTH "Final Plan" and "Initial Plan"
    * sections, so a single scan appears twice — scan-count asserts must
    * read the final section only.
    */
  private def finalPlanOnly(p: String): String =
    p.split("== Initial Plan ==").head

  test("q4: semi-join counts orders once and only late-line orders") {
    val dir = sf("sf0.001")
    val out = RelationalJobs.q4OrderPriority(spark, dir)
      .as[(String, Long)].collect().toMap
    // brute-force: distinct orders in window with a late line
    val ord = graft.io.Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
    val brute = ord.join(li, $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"o_orderkey", $"o_orderpriority").distinct()
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(out == brute)
    assert(out.values.sum < ord.count()) // the EXISTS genuinely filters
  }

  test("q4 plan uses a native LeftSemi join (no distinct, no explosion)") {
    val p = executedPlan(RelationalJobs.q4OrderPriority(spark, sf("sf0.001")))
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
    assert(!p.contains("HashAggregate(keys=[o_orderkey"),
      "EXISTS must not be rewritten through a distinct on orderkey")
  }

  test("q4: derived lineitem bound reaches the parquet scan") {
    // the semi-join's correlated date comparison can't push down, but its
    // LOSSLESS derived bound (shipdate > window_start + 60d) must — pinned
    // on the visible GreaterThan(l_shipdate) filter (r13 rule: pin a
    // VISIBLE pushed filter, plan strings truncate long lists)
    val p = RelationalJobs.q4OrderPriority(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("GreaterThan(l_shipdate,1997-03-02"),
      s"derived shipdate bound not pushed to the lineitem scan:\n$p")
  }

  test("q13: distribution covers every customer exactly once, zero bucket real") {
    val dir = sf("sf0.001")
    val out = RelationalJobs.q13CustOrders(spark, dir)
      .as[(Long, Long)].collect().toMap
    val nCust = graft.io.Tables.customer(spark, dir).count()
    assert(out.values.sum == nCust)
    // zero bucket non-degenerate but not total (the r13 seed rule)
    assert(out.getOrElse(0L, 0L) > 0 && out(0L) < nCust)
  }

  test("q15: winner matches brute-force max and includes all ties") {
    val dir = sf("sf0.001")
    val rev = graft.io.Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(round($"l_extendedprice" * 100, 0).cast("long") *
        (lit(100) - round($"l_discount" * 100, 0).cast("long"))).as("rev_i"))
      .as[(Long, Long)].collect()
    val mx = rev.map(_._2).max
    val expect = rev.filter(_._2 == mx).map(t => (t._1, t._2 / 1e4)).toSet
    val got = RelationalJobs.q15TopSupplier(spark, dir)
      .select($"s_suppkey", $"total_revenue").as[(Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q17: integer threshold equals the 0.5*avg semantics") {
    val dir = sf("sf0.001")
    val li = graft.io.Tables.lineitem(spark, dir)
      .join(graft.io.Tables.part(spark, dir).filter($"p_brand" === "Brand#13"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", round($"l_quantity", 0).cast("long").as("q"),
        round($"l_extendedprice" * 100, 0).cast("long").as("pc"))
      .as[(Long, Long, Long)].collect()
    val byPart = li.groupBy(_._1)
    val small = li.filter { case (p, q, _) =>
      val g = byPart(p); 2L * q * g.length < g.map(_._2).sum
    }
    val (total, n) = RelationalJobs.q17SmallLots(spark, dir)
      .as[(Double, Long)].head()
    assert(n == small.length)
    assert(math.abs(total - small.map(_._3).sum / 100.0) < 1e-6)
  }

  test("q21: semi+anti formulation equals the aggregate formulation") {
    val dir = sf("sf0.001")
    val ord = graft.io.Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val ol = graft.io.Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), 1)
        .otherwise(0)).as("late"))
    val agg = ol.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("nsupp"), sum($"late").as("nlate"))
      .filter($"nsupp" > 1 && $"nlate" === 1)
    val lone = ol.filter($"late" === 1)
      .join(agg, Seq("l_orderkey"), "left_semi")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"l_suppkey".asc).limit(10)
      .as[(Long, Long)].collect().toSet
    val got = RelationalJobs.q21LateSupplier(spark, dir)
      .select($"s_suppkey", $"numwait").as[(Long, Long)].collect().toSet
    assert(got == lone)
    assert(got.nonEmpty)
  }

  test("q8: share is the exact ratio of the conditional sums, all years present") {
    val rows = RelationalJobs.q8MarketShare(spark, sf("sf0.001"))
      .select($"o_year", $"num_i", $"den_i", $"mkt_share")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.length == 7) // probed: every year 1995-2001 non-degenerate
    rows.foreach { case (_, num, den, share) =>
      assert(num > 0 && num < den) // nonzero, non-total (the seed rule)
      assert(share == num.toDouble / den.toDouble) // ONE IEEE division, exact
    }
  }

  test("q11: scale-invariant threshold keeps exactly the >2x-mean parts") {
    val dir = sf("sf0.001")
    val vals = graft.io.Tables.lineitem(spark, dir)
      .join(graft.io.Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(graft.io.Tables.nation(spark, dir).filter($"n_name" === "NATION_24"),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"l_partkey")
      .agg(sum(round($"l_extendedprice" * 100, 0).cast("long")).as("v"))
      .as[(Long, Long)].collect()
    val tot = vals.map(_._2).sum; val n = vals.length.toLong
    val expect = vals.filter(t => t._2 * n > 2 * tot)
      .map(t => (t._1, t._2 / 100.0)).toSet
    val got = RelationalJobs.q11ImportantParts(spark, dir)
      .as[(Long, Double)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < n) // non-degenerate (the seed rule)
  }

  test("erasure audit: purge+keep partitions each table; lineitem cascades") {
    val dir = sf("sf0.001")
    val out = RelationalJobs.erasureAudit(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set("customer", "orders", "lineitem", "events"))
    val totals = Map(
      "customer" -> graft.io.Tables.customer(spark, dir).count(),
      "orders" -> graft.io.Tables.orders(spark, dir).count(),
      "lineitem" -> graft.io.Tables.lineitem(spark, dir).count(),
      "events" -> graft.io.Tables.events(spark, dir).count())
    totals.foreach { case (t, n) =>
      val (p, k) = out(t)
      assert(p + k == n, s"$t purge+keep != total")
      assert(p > 0 && k > 0, s"$t cohort degenerate") // the seed rule
    }
    // cascade: purged lineitems = lineitems of tombstoned customers' orders
    val brute = graft.io.Tables.lineitem(spark, dir)
      .join(graft.io.Tables.orders(spark, dir).filter($"o_custkey" % 29 === 7),
        $"l_orderkey" === $"o_orderkey").count()
    assert(out("lineitem")._1 == brute)
  }

  test("q21 plan: per-order window, no self-joins (r16 restatement)") {
    // The EXISTS/NOT-EXISTS pair is one window over the (okey, skey) agg:
    // no LeftSemi/LeftAnti self-join of the frame remains, and the window
    // partitions by the high-cardinality orderkey.
    val p = executedPlan(RelationalJobs.q21LateSupplier(spark, sf("sf0.001")))
    assert(p.contains("windowspecdefinition(l_orderkey"),
      s"expected per-orderkey window in:\n$p")
    assert(!p.contains("LeftSemi"), s"unexpected LeftSemi in:\n$p")
    assert(!p.contains("LeftAnti"), s"unexpected LeftAnti in:\n$p")
  }

  test("q2: winners are exactly the per-part min-cost suppliers, tie-inclusive") {
    val dir = sf("sf0.001")
    val euro = graft.io.Tables.supplier(spark, dir)
      .join(graft.io.Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .join(graft.io.Tables.region(spark, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey").as[Long].collect().toSet
    val costs = graft.io.Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        expr("(cast(round(l_extendedprice * 100) as bigint) * 10) " +
          "div cast(round(l_quantity) as bigint)").as("uc"))
      .as[(Long, Long, Long)].collect()
      .filter(t => euro.contains(t._2))
    val perPair = costs.groupBy(t => (t._1, t._2))
      .map { case ((p, s), g) => (p, s, g.map(_._3).min) }.toSeq
    val perPartMin = perPair.groupBy(_._1).map { case (p, g) =>
      p -> g.map(_._3).min }
    val expect = perPair.filter(t => t._3 == perPartMin(t._1))
      .map(t => (t._1, t._2, t._3)).toSet
    val got = RelationalJobs.q2MinCostSupplier(spark, dir)
      .select($"p_partkey", $"s_suppkey", $"min_cost_i")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty) // the seed rule
    // every part with a EUROPE line has at least one winner
    assert(got.map(_._1) == perPartMin.keySet)
  }

  test("q2 plan: window min, broadcast dims, no correlated re-scan") {
    val p = executedPlan(RelationalJobs.q2MinCostSupplier(spark, sf("sf0.001")))
    assert(p.contains("windowspecdefinition(l_partkey"),
      s"per-part min must be a window over the pair agg:\n$p")
    // exactly one lineitem scan — the decorrelation's whole point
    assert("lineitem\\.parquet".r.findAllIn(finalPlanOnly(p)).size <= 1,
      s"correlated re-scan of lineitem detected:\n$p")
  }

  test("q12: conditional counts match the brute-force late-line split") {
    val dir = sf("sf0.001")
    val li = graft.io.Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")
      .as[(Long, String, java.sql.Timestamp)].collect()
    val ord = graft.io.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val late = li.filter { case (ok, _, ship) =>
      val (od, _) = ord(ok)
      ship.getTime - od.getTime > 60L * 86400 * 1000
    }
    val brute = late.groupBy(_._2).map { case (flag, g) =>
      val hi = g.count(t => Set("1-URGENT", "2-HIGH")(ord(t._1)._2))
      flag -> (hi.toLong, (g.length - hi).toLong)
    }
    val got = RelationalJobs.q12LatePriority(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == brute)
    // non-degenerate in every group (the seed rule)
    assert(got.size == 3 && got.values.forall(t => t._1 > 0 && t._2 > 0))
  }

  test("q12 plan: ship window pushed to the lineitem scan") {
    val p = executedPlan(RelationalJobs.q12LatePriority(spark, sf("sf0.001")))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"),
      s"date window must reach PushedFilters:\n$p")
  }

  test("q9: profit matches the per-line min-uc recompute") {
    val dir = sf("sf0.001")
    val li = graft.io.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        expr("cast(round(l_extendedprice * 100) as bigint)").as("ep"),
        expr("cast(round(l_discount * 100) as bigint)").as("dc"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val uc = li.groupBy(t => (t._2, t._3))
      .map { case (k, g) => k -> g.map(t => t._4 * 10 / t._6).min }
    val widgets = graft.io.Tables.part(spark, dir)
      .filter($"p_name".like("%widget%")).select($"p_partkey")
      .as[Long].collect().toSet
    val nat = graft.io.Tables.supplier(spark, dir)
      .join(graft.io.Tables.nation(spark, dir),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name").as[(Long, String)].collect().toMap
    val oyear = graft.io.Tables.orders(spark, dir)
      .select($"o_orderkey", year($"o_orderdate")).as[(Long, Int)]
      .collect().toMap
    val brute = li.filter(t => widgets(t._2)).groupBy(t =>
        (nat(t._3), oyear(t._1)))
      .map { case (k, g) =>
        k -> g.map(t => t._4 * (100 - t._5) - uc((t._2, t._3)) * t._6 * 10).sum
      }
    val got = RelationalJobs.q9ProductProfit(spark, dir)
      .as[(String, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == brute)
    assert(got.nonEmpty && got.values.forall(_ != 0L)) // the seed rule
  }

  test("q9 plan: two lineitem scans (uc aggregate + probe), dims broadcast") {
    val p = executedPlan(RelationalJobs.q9ProductProfit(spark, sf("sf0.001")))
    val scans = "lineitem\\.parquet".r.findAllIn(finalPlanOnly(p)).size
    assert(scans <= 2, s"expected <=2 lineitem scans (uc agg + probe), got $scans:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    // BOTH lineitem lineages are widget-filtered before any shuffle: the
    // probe via the inner broadcast part join, the uc aggregate via a
    // broadcast LeftSemi — its state shrinks by the part selectivity.
    assert(p.contains("LeftSemi"),
      s"uc aggregate input must be widget-semi-filtered:\n$p")
  }

  test("q20: dominators match the brute-force >50%-share rule on contested parts") {
    val dir = sf("sf0.001")
    val promo = graft.io.Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_partkey").as[Long].collect().toSet
    val sq = graft.io.Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-07-01").cast("timestamp"))
      .select($"l_partkey", $"l_suppkey", round($"l_quantity", 0).cast("long"))
      .as[(Long, Long, Long)].collect()
      .filter(t => promo.contains(t._1))
      .groupBy(t => (t._1, t._2))
      .map { case ((p, s), g) => (p, s, g.map(_._3).sum) }.toSeq
    val byPart = sq.groupBy(_._1)
    val expect = sq.filter { case (p, _, q) =>
      val g = byPart(p); g.size >= 2 && 2 * q > g.map(_._3).sum
    }.map(_._2).toSet
    val got = RelationalJobs.q20ExcessShare(spark, dir)
      .select($"s_suppkey").as[Long].collect().toSet
    assert(got == expect)
    // selective at this SF (probed 8 of 10) — the semi join genuinely filters
    assert(got.nonEmpty &&
      got.size < graft.io.Tables.supplier(spark, dir).count())
  }

  test("q20 plan: LeftSemi supplier probe, dominance via one window lineage") {
    val p = executedPlan(RelationalJobs.q20ExcessShare(spark, sf("sf0.001")))
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
    assert(p.contains("windowspecdefinition(l_partkey"),
      s"per-part totals must ride one window lineage:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(finalPlanOnly(p)).size <= 1,
      s"correlated re-scan of lineitem detected:\n$p")
  }
}
