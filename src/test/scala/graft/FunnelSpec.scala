package graft

import java.sql.Timestamp
import graft.jobs.FunnelJobs

/** Funnel ordering semantics: a stage only counts when it happens strictly
  * AFTER the previous stage's first occurrence — purchases before the
  * first click, or clicks before the first view, don't convert.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel stages require strict ordering per user") {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // u1: full ordered funnel; u2: purchase BEFORE click (doesn't convert);
    // u3: view only; u4: click/purchase but never views
    Seq(
      (1L, ts(10), 1L, "view", 1.0, "{}"),
      (2L, ts(20), 1L, "click", 1.0, "{}"),
      (3L, ts(30), 1L, "purchase", 1.0, "{}"),
      (4L, ts(10), 2L, "view", 1.0, "{}"),
      (5L, ts(15), 2L, "purchase", 1.0, "{}"),
      (6L, ts(20), 2L, "click", 1.0, "{}"),
      (7L, ts(10), 3L, "view", 1.0, "{}"),
      (8L, ts(10), 4L, "click", 1.0, "{}"),
      (9L, ts(20), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(unix_micros(ts))"))
      .selectExpr("event_id", "CAST(unix_micros(ts) * 1000 AS LONG) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = FunnelJobs.funnel(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("view") == 3L)                  // u1, u2, u3
    assert(out("click_after_view") == 2L)      // u1, u2 (u2's click at 20 > view at 10)
    assert(out("purchase_after_click") == 1L)  // only u1 (u2 purchased before clicking)
  }

  test("funnel equals a plain-Scala reference on random event sets") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"funnel_prop_$trial").toString
      val events = (0 until 300).map { i =>
        (i.toLong, ts(10 + rnd.nextInt(5000)), rnd.nextInt(25).toLong,
          Seq("view", "click", "purchase", "error")(rnd.nextInt(4)), 1.0, "{}")
      }
      events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "CAST(unix_micros(ts) * 1000 AS LONG) AS ts",
          "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // reference computation: per user, staged strict minima over
      // (event-time micros, kind) pairs
      val perUser: Map[Long, Seq[(Long, String)]] = events
        .groupBy(t => t._3)
        .map { case (u, es) =>
          u -> es.map(t => (t._2.getTime * 1000L, t._4)).sortBy(p => p._1)
        }
      def firstAfter(evs: Seq[(Long, String)], kind: String, after: Long)
          : Option[Long] =
        evs.collect { case (t, k) if k == kind && t > after => t }.minOption
      var (nv, nc, np) = (0, 0, 0)
      perUser.values.foreach { evs =>
        val tv = evs.collect { case (t, k) if k == "view" => t }.minOption
        tv.foreach { v =>
          nv += 1
          firstAfter(evs, "click", v).foreach { c =>
            nc += 1
            if (firstAfter(evs, "purchase", c).isDefined) np += 1
          }
        }
      }
      val got = FunnelJobs.funnel(spark, dir)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(got("view") == nv && got("click_after_view") == nc &&
        got("purchase_after_click") == np, s"trial $trial diverged")
    }
  }

  test("streaming funnel op matches the batch funnel stage-for-stage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FunnelStream
    import graft.streaming.CepLite.KeyedEvent
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // distinct per-user timestamps: exact-ts ties are the one place batch
    // (strictly-later) and stream (sorted-scan order) semantics diverge
    val events = (0 until 20).flatMap { u =>
      val secs = rnd.shuffle((1 to 5000).toList).take(12)
      secs.zipWithIndex.map { case (sec, i) =>
        (u * 12L + i, sec.toLong,
          u.toLong, Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("funnel_sb").toString
    events.map { case (id, sec, user, kind) => (id, sec, user, kind, 1.0, "{}") }
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "sec * 1000000000 AS ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = FunnelJobs.funnel(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

    val in = MemoryStream[KeyedEvent]
    val q = FunnelStream.journeys(in.toDS(), withinMs = 1000000000L)
      .toDF()
      .writeStream.format("memory").queryName("funnel_sb")
      .outputMode("append").start()
    try {
      in.addData(events.map { case (_, sec, user, kind) =>
        KeyedEvent(user, kind, sec * 1000L) })
      q.processAllAvailable()
      // sentinel far past every deadline flushes the partial journeys
      in.addData(KeyedEvent(9999L, "view", 100000000000000L))
      q.processAllAvailable()
      val got = FunnelStream.stageCounts(
          spark.table("funnel_sb").filter($"key" =!= 9999L))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      FunnelStream.StageLabels.foreach { s =>
        assert(got.getOrElse(s, 0L) == batch.getOrElse(s, 0L),
          s"stage $s: stream ${got.get(s)} vs batch ${batch.get(s)}")
      }
    } finally q.stop()
  }

  test("streaming funnel: the same journey as a 3-stage CEP pattern") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CepLite
    import graft.streaming.CepLite.KeyedEvent
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = CepLite.detect(in.toDS(),
        pattern = Seq("view", "click", "purchase"), withinMs = 3600 * 1000L)
      .toDF()
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode("append").start()
    try {
      in.addData(
        KeyedEvent(1L, "view", 10000), KeyedEvent(1L, "click", 20000),
        KeyedEvent(1L, "purchase", 30000), // full journey
        KeyedEvent(2L, "view", 10000), KeyedEvent(2L, "click", 20000))
      q.processAllAvailable()
      // watermark far past u2's deadline → its partial journey times out
      in.addData(KeyedEvent(99L, "view", 100000000L))
      q.processAllAvailable()
      val got = spark.table("stream_funnel").as[CepLite.CepMatch].collect()
        .filter(_.key != 99L).map(m => m.key -> (m.tag, m.depth)).toMap
      assert(got(1L) == ("matched", 3))
      assert(got(2L) == ("timeout", 2))
    } finally q.stop()
  }

  test("churn_rates: per-cohort churn re-derives from user activity spans") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", s"unix_micros(ts) div ${7L * 86400 * 1000000} as week")
      .as[(Long, Long)].collect()
    val maxWeek = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (u, r) =>
      (u, r.map(_._2).min, r.map(_._2).max)
    }.toSeq
    val expected = users.groupBy(_._2).map { case (c, us) =>
      val n = us.size.toLong
      val ch = us.count(_._3 < maxWeek).toLong
      c -> (n, ch, ch * 1000000L / n)
    }
    val got = jobs.FunnelJobs.churnRates(spark, sfd).collect()
      .map(r => r.getAs[Long]("cohort_week") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_churned"),
          r.getAs[Long]("churn_ppm"))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == users.size.toLong)
  }

  test("cohort_ltv: cumulative curves re-derive from a collected recompute") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", s"unix_micros(ts) div ${7L * 86400 * 1000000} as week",
        "event_type", "cast(round(value * 100 + 1e-9) as bigint) as cents")
      .as[(Long, Long, String, Long)].collect()
    val cohortOf = ev.groupBy(_._1).map { case (u, r) => u -> r.map(_._2).min }
    val cells = ev.map(e => (cohortOf(e._1), e._2 - cohortOf(e._1), e._1, e._3, e._4))
    val grid = cells.map(c => (c._1, c._2, c._3)).distinct
      .groupBy(c => (c._1, c._2)).map { case (k, v) => k -> v.size.toLong }
    val rev = cells.filter(_._4 == "purchase")
      .groupBy(c => (c._1, c._2)).map { case (k, v) => k -> v.map(_._5).sum }
    val sizes = cohortOf.toSeq.map(_.swap).groupBy(_._1)
      .map { case (c, v) => c -> v.size.toLong }
    val got = jobs.FunnelJobs.cohortLtv(spark, sfd).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("active_users"), r.getAs[Long]("cohort_users"),
          r.getAs[Long]("revenue_cents"), r.getAs[Long]("cum_revenue_cents"),
          r.getAs[Long]("ltv_per_user_cents"))).toMap
    assert(got.keySet == grid.keySet)
    grid.keys.toSeq.sorted.foreach { case k @ (c, off) =>
      val cum = (0L to off).map(o => rev.getOrElse((c, o), 0L)).sum
      assert(got(k) == ((grid(k), sizes(c), rev.getOrElse(k, 0L), cum,
        cum / sizes(c))), s"cell $k")
    }
    // curves must be non-trivial: a later-age cell accumulates revenue
    assert(got.exists { case ((_, off), v) => off > 0 && v._4 > v._3 })
  }
}
