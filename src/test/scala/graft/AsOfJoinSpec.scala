package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.AsOf

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def left = Seq(
    (1L, ts(100)), (1L, ts(200)), (2L, ts(50)), (3L, ts(500)))
    .toDF("k", "lt")
  private def right = Seq(
    (1L, ts(90)), (1L, ts(150)), (1L, ts(250)), // two before lt=200
    (2L, ts(60)),                               // after left's only row
    (4L, ts(1)))                                // key with no left rows
    .toDF("rk", "rt")

  test("picks the latest right row at-or-before each left row") {
    val out = AsOf.join(left, right, "k", "rk", "lt", "rt")
      .select($"k", $"lt", $"rt").as[(Long, Timestamp, Timestamp)]
      .collect().map(t => (t._1, t._2.getTime / 1000, t._3.getTime / 1000)).toSet
    assert(out == Set(
      (1L, 100L, 90L),   // 90 ≤ 100 < 150
      (1L, 200L, 150L))) // latest of {90,150} ≤ 200; keys 2,3 unmatched
  }

  test("tolerance drops stale matches") {
    val out = AsOf.join(left, right, "k", "rk", "lt", "rt",
        toleranceMicros = 20L * 1000000L)
      .select($"k", $"lt").as[(Long, Timestamp)].collect()
      .map(t => (t._1, t._2.getTime / 1000)).toSet
    assert(out == Set((1L, 100L))) // 200-150=50s exceeds the 20s tolerance
  }

  test("null keys and times are excluded, not joined as key 0 / epoch 0") {
    val l = Seq(
      (Some(1L), Some(ts(100))),
      (None: Option[Long], Some(ts(100))), // null key: never matches
      (Some(1L), None: Option[Timestamp])) // null time: never matches
      .toDF("k", "lt")
    val r = Seq(
      (Some(1L), Some(ts(90))),
      (Some(0L), Some(ts(90))),            // would match a 0-unboxed null key
      (None: Option[Long], Some(ts(90))),  // null right key: discarded
      (Some(1L), None: Option[Timestamp])) // null right time: discarded
      .toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "rk", "lt", "rt")
      .select($"k", $"rt").as[(Long, Timestamp)].collect()
      .map(t => (t._1, t._2.getTime / 1000)).toSet
    assert(out == Set((1L, 90L)))
  }

  test("plan shape: one exchange + sort per side, no pair blow-up") {
    val df = AsOf.join(left, right, "k", "rk", "lt", "rt")
    df.collect() // finalize the adaptive plan
    // inspect the final adaptive plan only (toString also appends the
    // initial plan); nodeName strips the "Exec" suffix
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), s"missing AsOfJoin node:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
    assert("Sort \\[".r.findAllIn(p).length == 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("matches the window-function restatement on real data") {
    val sfd = sf("sf0.001")
    val e = graft.io.Tables.events(spark, sfd)
    val p = e.filter($"event_type" === "purchase").select($"user_id", $"ts".as("pay_t"))
    val r = e.filter($"event_type" === "signup")
      .select($"user_id".as("r_uid"), $"ts".as("receipt_t"))
    val native = AsOf.join(p, r, "user_id", "r_uid", "pay_t", "receipt_t")
      .select($"user_id", $"pay_t", $"receipt_t")
    // restatement: join all earlier signups, rank desc, keep first
    val w = Window.partitionBy($"user_id", $"pay_t").orderBy($"receipt_t".desc)
    val restated = p.join(r, $"user_id" === $"r_uid" && $"receipt_t" <= $"pay_t")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"pay_t", $"receipt_t")
    assert(native.exceptAll(restated).isEmpty && restated.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }
}
