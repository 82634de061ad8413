package graft

import graft.jobs.{OrderJobs, RelationalJobs}
import org.apache.spark.sql.functions._

class OrderJobsSpec extends SparkSpec {
  import spark.implicits._

  test("order_timeout covers its outcome branches on real data") {
    val out = OrderJobs.orderTimeout(spark, sf("sf0.001")).cache()
    val states = out.select($"result_state").distinct().as[String].collect().toSet
    // every user has ~7 events over 30 days → both streams present for most
    assert(states.nonEmpty)
    assert(states.subsetOf(Set(
      "payed successfully", "payed but already timeout",
      "timeout", "payed but not found created")))
    // one row per user, no nulls in state
    assert(out.filter($"result_state".isNull).count() == 0)
    out.unpersist()
  }

  test("reconciliation partitions pays exactly into matched + unmatched") {
    val sfd = sf("sf0.001")
    val matchedPays = OrderJobs.txMatch(spark, sfd)
      .select($"user_id", $"pay_ts").distinct().count()
    val unmatchedPays = OrderJobs.txUnmatchedPays(spark, sfd).count()
    val allPays = graft.io.Tables.events(spark, sfd)
      .filter($"event_type" === "purchase").count()
    assert(matchedPays + unmatchedPays == allPays)
  }

  test("interval join respects the time bounds") {
    val out = OrderJobs.txMatch(spark, sf("sf0.001"))
    val bad = out.filter(
      $"receipt_ts" < $"pay_ts" - 3600 || $"receipt_ts" > $"pay_ts" + 3600)
    assert(bad.count() == 0)
  }

  test("q3 returns exactly top-10 by revenue with rn 1..10") {
    val out = RelationalJobs.q3Shipping(spark, sf("sf0.001"))
      .orderBy($"rn").select($"revenue", $"rn").as[(Double, Long)].collect()
    assert(out.length <= 10)
    assert(out.map(_._2).toSeq == (1L to out.length))
    // revenue non-increasing
    assert(out.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q1 aggregates are internally consistent") {
    val r = RelationalJobs.q1Pricing(spark, sf("sf0.001"))
      .agg(sum($"count_order"), sum($"sum_qty")).as[(Long, Long)].head()
    val li = graft.io.Tables.lineitem(spark, sf("sf0.001"))
      .filter($"l_shipdate" <= lit("1999-12-31").cast("timestamp"))
    assert(r._1 == li.count())
  }

  test("attribution equals a brute-force last-touch recompute") {
    val dir = sf("sf0.001")
    val out = OrderJobs.attribution(spark, dir)
      .select($"item", $"touch_type", $"n_conversions", $"n_users")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out.nonEmpty)
    val evs = graft.io.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(ts) as us",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as item")
      .as[(Long, Long, String, Long, Long)].collect()
    val touches = evs.filter(e => e._3 == "view" || e._3 == "click")
      .groupBy(e => (e._2, e._4)).map(_._2.minBy(_._1)).toSeq
    val attributed = evs.filter(_._3 == "purchase").flatMap { p =>
      touches.filter(t => t._2 == p._2 && t._4 <= p._4 &&
          p._4 - t._4 <= 3600000000L)
        .sortBy(t => -t._4).headOption
        .map(t => (t._5, t._3, p._2))
    }
    val expected = attributed.groupBy(a => (a._1, a._2)).map { case ((i, tt), g) =>
      (i, tt, g.size.toLong, g.map(_._3).distinct.size.toLong)
    }.toSet
    assert(out == expected)
  }
}
