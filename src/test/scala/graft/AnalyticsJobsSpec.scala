package graft

import graft.jobs.{AnalyticsJobs, DedupJobs, FunnelJobs}

/** Specs for the analytics/sampling queries that otherwise only the driver
  * oracle gate exercises — a regression must fail `sbt test`, not just the
  * post-commit gate.
  */
class AnalyticsJobsSpec extends SparkSpec {
  import spark.implicits._

  test("percentile_stats: medians sit inside each group's range, n sums") {
    val out = AnalyticsJobs.percentileStats(spark, sf("sf0.001"))
      .select($"l_returnflag", $"p50_qty", $"p95_qty", $"p50_price", $"n")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50q, p95q) = (r.getDouble(1), r.getDouble(2))
      assert(p50q <= p95q, s"p50 > p95 for ${r.getString(0)}")
      assert(p50q >= 1.0 && p95q <= 50.0) // l_quantity domain
      assert(r.getDouble(3) > 0)
    }
    val nTotal = out.map(_.getLong(4)).sum
    assert(nTotal == graft.io.Tables.lineitem(spark, sf("sf0.001")).count())
  }

  test("approx_percentile_stats: sketch answers pass the rank-error audit") {
    val out = AnalyticsJobs.approxPercentileStats(spark, sf("sf0.001"))
      .select($"l_returnflag", $"n", $"p50_in_bounds", $"p95_in_bounds")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"p50 out of bounds for ${r.getString(0)}")
      assert(r.getBoolean(3), s"p95 out of bounds for ${r.getString(0)}")
    }
    val nTotal = out.map(_.getLong(1)).sum
    assert(nTotal == graft.io.Tables.lineitem(spark, sf("sf0.001")).count())
  }

  test("approx_distinct: HLL estimates pass the 5% envelope, exact counts exact") {
    import org.apache.spark.sql.functions._
    val out = AnalyticsJobs.approxDistinct(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("approx_in_bounds")),
      "an HLL estimate fell outside 5% of the exact count")
    val exact = graft.io.Tables.events(spark, sf("sf0.001"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.forall(r =>
      exact(r.getAs[String]("event_type")) == r.getAs[Long]("n_exact")))
  }

  test("event_props: JSON payload extraction is total and complete") {
    val out = AnalyticsJobs.eventProps(spark, sf("sf0.001"))
      .select($"event_type", $"n_with_k", $"min_k", $"max_k").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
    // every synthetic event carries a k property → counts cover the table
    val nTotal = out.map(_.getLong(1)).sum
    assert(nTotal == graft.io.Tables.events(spark, sf("sf0.001")).count())
    // malformed / missing keys become NULL, never an error
    val weird = Seq("{", "", "{\"other\": 1}", "{\"k\": 7}").toDF("props")
      .select(org.apache.spark.sql.functions.from_json(
        $"props", org.apache.spark.sql.functions.lit("k LONG"))
        .getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(weird.toSeq == Seq(None, None, None, Some(7L)))
  }

  test("doc_sample: deterministic, size-bounded, priority-ranked") {
    val a = DedupJobs.docSample(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = DedupJobs.docSample(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.toSet == b.toSet) // reproducible
    assert(a.length == 100)
    // the sample is exactly the 100 lowest priorities in the corpus
    val maxSampled = a.map(_._2).max
    val better = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select(graft.ops.Dedup.md5Long($"doc_id".cast("string")).as("p"))
      .filter($"p" < maxSampled).count()
    assert(better <= 100)
  }

  test("q18: every result order exceeds the threshold, join keeps headers") {
    val out = graft.jobs.RelationalJobs.q18LargeOrders(spark, sf("sf0.001"))
      .select($"o_orderkey", $"sum_qty").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._2 > 250), "order below the quantity threshold leaked")
    // cross-check one order's sum against a direct aggregation
    val (okey, qty) = out.head
    val direct = graft.io.Tables.lineitem(spark, sf("sf0.001"))
      .filter($"l_orderkey" === okey)
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum($"l_quantity"), 0).cast("long"))
      .as[Long].head()
    assert(direct == qty)
  }

  test("tfidf: rarer terms outscore common ones at equal tf") {
    val out = graft.jobs.TextJobs.tfidfTopK(spark, sf("sf0.001"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "token", "tf", "df", "score", "rn"))
    val rows = out.select($"tf", $"df", $"score", $"rn")
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._4 <= 3))
    // ratio-form idf: score strictly increases with tf and decreases with df
    rows.foreach { case (tf, df, score, _) =>
      assert(math.abs(score - (tf * 501.0 / (df + 1))) < 1e-3,
        s"score formula drifted for tf=$tf df=$df") // 500 docs at sf0.001
    }
  }

  test("retention_cohorts: offsets non-negative, cohort totals bounded by users") {
    val out = FunnelJobs.retentionCohorts(spark, sf("sf0.001"))
      .select($"cohort_week", $"week_offset", $"n_users")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0), "negative week offset")
    val nUsers = graft.io.Tables.events(spark, sf("sf0.001"))
      .select($"user_id").distinct().count()
    // offset-0 rows cover every user exactly once across cohorts
    assert(out.filter(_._2 == 0).map(_._3).sum == nUsers)
    // no (cohort, offset) group can exceed its cohort's size
    val cohortSize = out.filter(_._2 == 0).map(t => t._1 -> t._3).toMap
    assert(out.forall(t => t._3 <= cohortSize(t._1)))
  }

  test("event_paths: edge counts sum to N - U, support bounded by count") {
    val out = AnalyticsJobs.eventPaths(spark, sf("sf0.001"))
      .select($"from_type", $"to_type", $"n", $"n_users")
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    // each user with c events contributes exactly c-1 transitions
    val ev = graft.io.Tables.events(spark, sf("sf0.001"))
    val n = ev.count(); val u = ev.select($"user_id").distinct().count()
    assert(out.map(_._3).sum == n - u)
    assert(out.forall(t => t._4 >= 1 && t._4 <= t._3))
    // the edge set is a subset of types × types, no null endpoints
    assert(out.forall(t => t._1 != null && t._2 != null))
  }

  test("session_paths: top journeys ordered, support bounded, steps capped") {
    val out = AnalyticsJobs.sessionPaths(spark, sf("sf0.001"))
      .select($"journey", $"n_sessions", $"n_users")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    // ordering contract: count desc, journey asc at ties
    assert(out == out.sortBy(t => (-t._2, t._1)))
    assert(out.forall(t => t._3 >= 1 && t._3 <= t._2))
    // journeys are truncated to 8 steps
    assert(out.forall(_._1.split(">").length <= 8))
    // total listed sessions cannot exceed the session count
    val nSessions = AnalyticsJobs.sessionAgg(spark, sf("sf0.001")).count()
    assert(out.map(_._2).sum <= nSessions)
  }

  test("value_histogram: bins partition the events, sums stay in-bin") {
    val out = AnalyticsJobs.valueHistogram(spark, sf("sf0.001"))
      .select($"event_type", $"bin", $"n", $"sum_value")
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0)) // value domain is non-negative
    val total = graft.io.Tables.events(spark, sf("sf0.001")).count()
    assert(out.map(_._3).sum == total)
    // each bin's mass sits inside [bin*25*n, (bin+1)*25*n)
    out.foreach { case (_, bin, n, sv) =>
      assert(sv >= bin * 25.0 * n - 0.01 && sv < (bin + 1) * 25.0 * n + 0.01)
    }
  }

  test("conversion_latency: percentiles bracket a brute-force gap recompute") {
    val dir = sf("sf0.001")
    val row = AnalyticsJobs.conversionLatency(spark, dir)
      .as[(Long, Double, Double, Long)].head()
    val evs = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us")
      .as[(Long, String, Long)].collect()
    val gaps = evs.filter(_._2 == "signup").groupBy(_._1)
      .flatMap { case (u, ss) =>
        val s0 = ss.map(_._3).min
        evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= s0)
          .map(_._3 - s0).minOption
      }.toSeq.sorted
    assert(row._1 == gaps.size)
    assert(row._4 == gaps.max)
    assert(row._2 >= gaps.head && row._2 <= gaps.last)
    assert(row._3 >= row._2) // p95 ≥ p50
  }

  test("engagement_decay: shifts equal a brute-force halving recompute") {
    val dir = sf("sf0.001")
    val out = AnalyticsJobs.engagementDecay(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val evs = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) as us",
        "cast(round(value * 100, 0) as long) as cents")
      .as[(Long, Long, Long)].collect()
    val anchor = evs.map(_._2).max
    val ref = evs.groupBy(_._1).map { case (u, g) =>
      u -> (
        g.map(e => e._3 / (1L << math.min((anchor - e._2) / 604800000000L, 62L))).sum,
        g.map(_._3).sum,
        g.map(_._2 / 86400000000L).max)
    }
    assert(out.keySet == ref.keySet)
    ref.foreach { case (u, (s, c, d)) =>
      assert(out(u) == ((u, s, c, d)))
    }
    // decay must bite: someone's score is strictly below their raw cents
    assert(out.values.exists(r => r._2 < r._3))
  }

  test("rolling_uniques_approx: sketch union tracks the exact window") {
    val dir = sf("sf0.001")
    val rows = AnalyticsJobs.rollingUniquesApprox(spark, dir)
      .select($"day", $"wau7", $"est_in_bounds")
      .as[(Int, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3))
    val exact = AnalyticsJobs.rollingUniques(spark, dir)
      .select($"day", $"wau7").as[(Int, Long)].collect().toMap
    rows.foreach { case (d, w, _) => assert(exact(d) == w) }
  }

  test("partition_manifest: one edited row moves exactly one day's fingerprint") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    def manifest(d: String) = AnalyticsJobs.partitionManifest(spark, d)
      .select($"day", $"n_rows", $"fp_xor", $"cents_sum")
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val base = manifest(dir)
    assert(base.size > 1)
    // rewrite the fixture with ONE event's value nudged
    val edited = java.nio.file.Files.createTempDirectory("pm_edit").toString
    val ev = graft.io.Tables.events(spark, dir)
    val minId = ev.agg(min($"event_id")).as[Long].head()
    ev.withColumn("value",
        when($"event_id" === minId, $"value" + 1.0).otherwise($"value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$edited/events.parquet")
    val after = manifest(edited)
    val editedDay = ev.filter($"event_id" === minId)
      .selectExpr("datediff(cast(ts as date), date'1970-01-01')")
      .as[Int].head()
    assert(base.keySet == after.keySet)
    base.keySet.foreach { d =>
      if (d == editedDay) {
        assert(after(d)._3 != base(d)._3 || after(d)._4 != base(d)._4,
          "edited day's fingerprint did not move")
        assert(after(d)._2 == base(d)._2) // same row count
      } else assert(after(d) == base(d), s"untouched day $d moved")
    }
  }

  test("partition_manifest: NULL fields neither alias nor drop rows") {
    import org.apache.spark.sql.functions._
    // Two rows whose canonical fields would COLLAPSE to the same string
    // under concat_ws's NULL-skipping (A: type='100', cents=NULL, B:
    // type=NULL, cents=100 — both '…|100|x' without the sentinel): the
    // chr(31) sentinel must keep them distinct, so their hashes XOR to a
    // non-zero fingerprint instead of cancelling to 0.
    val dir = java.nio.file.Files.createTempDirectory("pm_null").toString
    Seq(
      (1L, "2024-03-05 10:00:00", 10L, Option("100"), Option.empty[Double],
        Option("x")),
      (1L, "2024-03-05 10:00:00", 10L, Option.empty[String], Option(1.0),
        Option("x")))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"tss".cast("timestamp")).drop("tss")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsJobs.partitionManifest(spark, dir)
      .select($"day", $"n_rows", $"fp_xor", $"cents_sum")
      .as[(Int, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (_, nRows, fpXor, cents) = out.head
    assert(nRows == 2L)    // the NULL-field rows are counted, not dropped
    assert(fpXor != 0L)    // distinct canonicals: XOR of two hashes ≠ 0
    assert(cents == 100L)  // NULL cents skipped by SUM, not poisoning it
  }

  test("item_similarity: jaccard ppm and top-k match a brute-force recompute") {
    val dir = sf("sf0.001")
    val out = AnalyticsJobs.itemSimilarity(spark, dir)
      .select($"item_id", $"rank", $"partner", $"jacc_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ui = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter($"i".isNotNull).distinct().as[(Long, Long)].collect().toSet
    val degOk = ui.groupBy(_._1).filter(_._2.size <= 50).keySet
    val kept = ui.filter(p => degOk(p._1))
    val items = kept.groupBy(_._2).map { case (i, g) => i -> g.map(_._1) }
    val pairs = for {
      (a, ua) <- items.toSeq; (b, ub) <- items.toSeq if a < b
      inter = (ua & ub).size if inter > 0
    } yield (a, b, inter.toLong * 1000000L / (ua.size + ub.size - inter))
    val sym = pairs.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
    val expect = sym.groupBy(_._1).flatMap { case (item, g) =>
      g.sortBy(p => (-p._3, p._2)).take(5).zipWithIndex.map {
        case ((_, partner, j), idx) => (item, idx + 1L, partner, j)
      }
    }.toSet
    assert(out.toSet == expect)
  }

  test("item_recs: scored anti-joined serving lists match a set recompute") {
    val dir = sf("sf0.001")
    // similarity lists from the job already proven against brute force
    val sims = AnalyticsJobs.itemSimilarity(spark, dir)
      .select($"item_id", $"partner", $"jacc_ppm")
      .as[(Long, Long, Long)].collect()
    val ui = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter($"i".isNotNull).distinct().as[(Long, Long)].collect().toSet
    val degOk = ui.groupBy(_._1).filter(_._2.size <= 50).keySet
    val kept = ui.filter(p => degOk(p._1))
    val byUser = kept.groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val expect = byUser.toSeq.flatMap { case (u, histItems) =>
      val contrib = sims.filter(s => histItems(s._1))
        .filterNot(s => histItems(s._2))
      contrib.groupBy(_._2).toSeq
        .map { case (rec, g) => (rec, g.map(_._3).sum, g.size.toLong) }
        .sortBy { case (rec, score, hits) => (-score, -hits, rec) }
        .take(3).zipWithIndex
        .map { case ((rec, score, hits), idx) =>
          (u, idx + 1L, rec, score, hits) }
    }.toSet
    val got = AnalyticsJobs.itemRecs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(expect.nonEmpty)
    assert(got == expect)
    // the already-seen filter genuinely fired: no rec is in its user's history
    assert(got.forall { case (u, _, rec, _, _) => !byUser(u)(rec) })
  }

  test("rec_eval: temporal-split CF scorecard re-derives end-to-end") {
    val dir = sf("sf0.001")
    val evd = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i",
        "datediff(cast(ts as date), date'1970-01-01') as day")
      .filter($"i".isNotNull).as[(Long, Long, Int)].collect()
    val maxDay = evd.map(_._3).max
    val prefix = evd.filter(_._3 < maxDay).map(e => (e._1, e._2)).toSet
    val holdout = evd.filter(_._3 == maxDay).map(e => (e._1, e._2)).toSet
    val truth = holdout -- prefix
    // the CF stack recomputed over the prefix (the item_recs spec logic)
    val degOk = prefix.groupBy(_._1).filter(_._2.size <= 50).keySet
    val kept = prefix.filter(p => degOk(p._1))
    val items = kept.groupBy(_._2).map { case (i, g) => i -> g.map(_._1) }
    val jacc = for {
      (a, ua) <- items.toSeq; (b, ub) <- items.toSeq if a < b
      inter = (ua & ub).size if inter > 0
    } yield (a, b, inter.toLong * 1000000L / (ua.size + ub.size - inter))
    val sims = jacc.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .groupBy(_._1).toSeq.flatMap { case (item, g) =>
        g.sortBy(p => (-p._3, p._2)).take(5).map(p => (item, p._2, p._3))
      }
    val byUser = kept.groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val recs = byUser.toSeq.flatMap { case (u, hist) =>
      sims.filter(s => hist(s._1)).filterNot(s => hist(s._2))
        .groupBy(_._2).toSeq
        .map { case (rec, g) => (rec, g.map(_._3).sum, g.size.toLong) }
        .sortBy { case (rec, score, hits) => (-score, -hits, rec) }
        .take(3).zipWithIndex
        .map { case ((rec, _, _), idx) => (u, idx + 1L, rec) }
    }
    val truthByUser = truth.groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val evalUsers = recs.map(_._1).toSet.intersect(truthByUser.keySet)
    val perUser = evalUsers.toSeq.map { u =>
      val hits = recs.filter(r => r._1 == u && truthByUser(u)(r._3))
      (hits.size.toLong, hits.map(_._2).minOption)
    }
    val nUsers = perUser.size.toLong
    val usersHit = perUser.count(_._1 > 0).toLong
    val hitsTotal = perUser.map(_._1).sum
    val mrrSum = perUser.flatMap(_._2).map(1000000L / _).sum
    val r = AnalyticsJobs.recEval(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == nUsers)
    assert(r.getAs[Long]("users_hit") == usersHit)
    assert(r.getAs[Long]("hits_total") == hitsTotal)
    assert(r.getAs[Long]("hit_rate_ppm") ==
      usersHit * 1000000L / math.max(nUsers, 1L))
    assert(r.getAs[Long]("mrr_ppm") == mrrSum / math.max(nUsers, 1L))
    // the split is real: evaluable users exist and truth excludes re-buys
    assert(nUsers > 0 && truth.nonEmpty)
    assert(truth.forall(t => !prefix.contains(t)))
  }

  test("markov_eval: leave-last-out confusion table re-derives; NULL covered") {
    val dir = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us", "event_id")
      .as[(Long, String, Long, Long)].collect()
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._3, r._4)).map(_._2).toSeq).toMap
    val train = byUser.values.toSeq.flatMap { seq =>
      seq.zip(seq.tail).dropRight(1) // all consecutive pairs but the last
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val pred = train.keys.map(_._1).toSeq.distinct.map { f =>
      f -> train.filter(_._1._1 == f).toSeq
        .map { case ((_, t), c) => (t, c) }
        .minBy { case (t, c) => (-c, t) }._1
    }.toMap
    val holdout = byUser.values.filter(_.length >= 2)
      .map(seq => (seq(seq.length - 2), seq.last)).toSeq
    val expected = holdout.groupBy { case (f, a) => (f, pred.get(f), a) }
      .map { case (k, o) => k -> o.size.toLong }
    val got = AnalyticsJobs.markovEval(spark, dir).collect().map { r =>
      (r.getAs[String]("from_type"), Option(r.getAs[String]("predicted")),
        r.getAs[String]("actual")) ->
        r.getAs[Long]("n")
    }.toMap
    assert(got == expected)
    val rows = AnalyticsJobs.markovEval(spark, dir).collect()
    assert(rows.forall { r =>
      r.getAs[Boolean]("correct") ==
        (Option(r.getAs[String]("predicted")).contains(r.getAs[String]("actual")))
    })
    assert(rows.exists(_.getAs[Boolean]("correct")) &&
      rows.exists(!_.getAs[Boolean]("correct")))

    // crafted corpus: a from-state that appears ONLY in the held-out pair
    // must predict NULL and be counted, not dropped
    val tmp = java.nio.file.Files.createTempDirectory("mk_null").toString
    import java.sql.Timestamp
    Seq(
      graft.model.Event(1L, new Timestamp(1000L), 1L, "a", 0.0, "{}"),
      graft.model.Event(2L, new Timestamp(2000L), 1L, "b", 0.0, "{}"),
      graft.model.Event(3L, new Timestamp(3000L), 1L, "z", 0.0, "{}"),
      graft.model.Event(4L, new Timestamp(4000L), 1L, "a", 0.0, "{}"))
      .toDF().write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // training pairs: (a,b), (b,z); holdout: (z, a) — 'z' untrained
    val crafted = AnalyticsJobs.markovEval(spark, tmp).collect()
    assert(crafted.length == 1)
    val c = crafted.head
    assert(c.getAs[String]("from_type") == "z" &&
      c.getAs[String]("predicted") == null &&
      c.getAs[String]("actual") == "a" && c.getAs[Long]("n") == 1L &&
      !c.getAs[Boolean]("correct"))
  }

  test("rec_coverage: catalog coverage re-derives from the recs frame") {
    val dir = sf("sf0.001")
    val recs = AnalyticsJobs.itemRecs(spark, dir)
      .select($"user_id", $"rec_item").as[(Long, Long)].collect()
    val catalog = graft.io.Tables.events(spark, dir)
      .selectExpr(
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter($"i".isNotNull).distinct().count()
    val perItem = recs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val r = AnalyticsJobs.recCoverage(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == recs.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("n_rec_rows") == recs.length.toLong)
    assert(r.getAs[Long]("n_items_rec") == perItem.size.toLong)
    assert(r.getAs[Long]("n_catalog") == catalog)
    assert(r.getAs[Long]("coverage_ppm") ==
      perItem.size.toLong * 1000000L / catalog)
    assert(r.getAs[Long]("top_item_ppm") ==
      perItem.values.max * 1000000L / recs.length.toLong)
    // the metric is informative on the fixture: partial coverage
    assert(r.getAs[Long]("coverage_ppm") > 0 &&
      r.getAs[Long]("coverage_ppm") < 1000000L)
  }

  test("rolling_uniques: dau/wau7 equal a brute-force window recompute") {
    val dir = sf("sf0.001")
    val out = AnalyticsJobs.rollingUniques(spark, dir)
      .select($"day", $"dau", $"wau7", $"stickiness_ppm")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    val du = graft.io.Tables.events(spark, dir)
      .selectExpr("datediff(cast(ts as date), date'1970-01-01') as day", "user_id")
      .as[(Int, Long)].collect().toSet
    val days = du.map(_._1)
    assert(out.map(_._1).toSet == days)
    out.foreach { case (d, dau, wau, sp) =>
      val win = du.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2)
      assert(dau == du.filter(_._1 == d).map(_._2).size)
      assert(wau == win.size)
      assert(sp == dau * 1000000L / wau)
      assert(dau <= wau)
    }
  }

  test("event_drift: first day excluded, volumes reconcile, stat is a χ² recompute") {
    val dir = sf("sf0.001")
    val out = AnalyticsJobs.eventDrift(spark, dir)
      .select($"day", $"n_events", $"drift_q", $"top_type")
      .as[(Int, Long, Long, String)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    // per-(day, type) ground truth straight off the events table
    val counts = graft.io.Tables.events(spark, dir)
      .selectExpr("datediff(cast(ts as date), date'1970-01-01') as day", "event_type")
      .as[(Int, String)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val days = counts.keys.map(_._1).toSeq.distinct.sorted
    val types = counts.keys.map(_._2).toSeq.distinct
    assert(out.map(_._1).toSeq == days.tail) // baseline day dropped
    out.foreach { case (day, n, drift, top) =>
      val prevDay = days(days.indexOf(day) - 1)
      val perType = types.map { t =>
        val c = counts.getOrElse((day, t), 0L)
        val p = counts.getOrElse((prevDay, t), 0L)
        t -> ((c - p) * (c - p) * 1000000L / (p + 1))
      }
      assert(n == types.map(t => counts.getOrElse((day, t), 0L)).sum)
      assert(drift == perType.map(_._2).sum)
      assert(top == perType.minBy { case (t, d) => (-d, t) }._1)
    }
  }

  test("latest_state: per-key argmax, first-seen, and count re-derive") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us",
        "event_id", "value")
      .as[(Long, String, Long, Long, Double)].collect()
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      val last = rows.maxBy(r => (r._3, r._4))
      k -> (rows.map(_._3).min, last._3, last._4, last._5, rows.length.toLong)
    }
    val got = AnalyticsJobs.latestState(spark, sfd).collect().map { r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("first_us"), r.getAs[Long]("last_us"),
          r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value"),
          r.getAs[Long]("n_events"))
    }.toMap
    assert(got == expected)
    // compaction must bind: some key holds more than one event
    assert(got.values.exists(_._5 > 1L))
  }

  test("graph_reach: hop levels re-derive from a reference BFS; multi-level") {
    val sfd = sf("sf0.001")
    val up = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter("i is not null").distinct()
      .as[(Long, Long)].collect()
    def md5Head(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val edges = up.flatMap { case (u, i) =>
      Seq((u * 2, i * 2 + 1), (i * 2 + 1, u * 2))
    }.distinct.toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val adj = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    val seeds = up.map(_._1 * 2).distinct
      .filter(n => md5Head((n / 2).toString) % 29L == 0L)
      .filter(nodes.contains).toSeq
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = dist.keySet
    var h = 1L
    while (h <= 4 && frontier.nonEmpty) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Nil)).diff(dist.keySet)
      dist = dist ++ nxt.map(_ -> h)
      frontier = nxt
      h += 1
    }
    val expected = dist.map { case (n, d) =>
      (if (n % 2 == 0) "user" else "item", n / 2) -> d
    }
    val got = AnalyticsJobs.graphReach(spark, sfd).collect().map { r =>
      (r.getAs[String]("node_kind"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("dist")
    }.toMap
    assert(got == expected)
    // the fixture must exercise multi-hop propagation, not a 1-hop flood
    assert(got.values.toSet.size >= 3,
      s"degenerate fixture: levels ${got.values.toSet}")
  }

  test("cheapest_path: weighted costs re-derive; weights change the order") {
    val sfd = sf("sf0.001")
    val pairs = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter("i is not null")
      .as[(Long, Long)].collect()
      .groupBy(identity).map { case ((u, i), o) =>
        (u * 2, i * 2 + 1, 1000000L / o.length) }.toSeq
    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    def md5Head(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val seeds = pairs.map(_._1).distinct
      .filter(n => md5Head((n / 2).toString) % 29L == 0L)
      .filter(nodes.contains)
    var d = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 6) {
      val relax = edges.flatMap { case (s, t, w) =>
        d.get(s).map(c => t -> (c + w))
      }.groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).min }
      d = (d.keySet ++ relax.keySet).map { n =>
        n -> math.min(d.getOrElse(n, Long.MaxValue),
          relax.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    val expected = d.map { case (n, c) =>
      (if (n % 2 == 0) "user" else "item", n / 2) -> c
    }
    val got = AnalyticsJobs.cheapestPath(spark, sfd).collect().map { r =>
      (r.getAs[String]("node_kind"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("cost")
    }.toMap
    assert(got == expected)
    // weights are a real signal: costs at equal hop distance must differ
    // (otherwise this is just the BFS restated)
    assert(got.values.toSet.size > 4, s"degenerate costs: ${got.values.toSet}")
  }

  test("state_history: SCD2 intervals re-derive; compaction binds; chains") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us", "event_id")
      .as[(Long, String, Long, Long)].collect()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4))
      // run-length compact consecutive equal types
      val runs = ordered.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, t, us, _)) =>
          if (acc.nonEmpty && acc.last._1 == t)
            acc.init :+ ((t, acc.last._2, acc.last._3 + 1))
          else acc :+ ((t, us, 1L))
      }
      runs.zipWithIndex.map { case ((t, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (u, i + 1L) -> ((t, from, to, n))
      }
    }.toMap
    val got = AnalyticsJobs.stateHistory(spark, sfd).collect().map { r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        ((r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
          Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue),
          r.getAs[Long]("n_events")))
    }.toMap
    assert(got == expected)
    // compaction binds (a multi-event run exists) and intervals chain
    assert(got.values.exists(_._4 > 1L))
  }

  test("data_expectations: all-pass on the fixture; violations are counted") {
    val sfd = sf("sf0.001")
    val out = graft.jobs.RelationalJobs.dataExpectations(spark, sfd)
      .collect().map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_failed"),
          r.getAs[Boolean]("pass")))).toMap
    assert(out.size == 8)
    assert(out.values.forall(v => v._2 == 0L && v._3))
    assert(out("events_value_range")._1 ==
      graft.io.Tables.events(spark, sfd).count())
    assert(out("lineitem_orderkey_fk")._1 ==
      graft.io.Tables.lineitem(spark, sfd).count())

    // crafted corpus: one violation per category must be counted, not masked
    val dir = java.nio.file.Files.createTempDirectory("expect_bad").toString
    import java.sql.Timestamp
    Seq(
      graft.model.Event(1L, new Timestamp(1000L), 1L, "view", -5.0, "{\"k\": 1}"),
      graft.model.Event(2L, new Timestamp(2000L), 1L, "bogus", 1.0, "{\"k\": 2}"),
      graft.model.Event(3L, new Timestamp(3000L), 2L, "click", 2.0, "{}"),
      graft.model.Event(4L, Timestamp.valueOf("2205-01-01 00:00:00"), 2L,
        "view", 3.0, "{\"k\": 4}"))
      .toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, "abc", "en", "s", 3L), (2L, "abcd", "en", "s", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, Array(0.1f, 0.2f)), (2L, Array.fill(64)(0.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq((10L, 100L), (11L, 999L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(100L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(Tuple1(10L), Tuple1(77L)).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val bad = graft.jobs.RelationalJobs.dataExpectations(spark, dir)
      .collect().map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_failed"),
          r.getAs[Boolean]("pass")))).toMap
    assert(bad("events_value_range") == ((4L, 1L, false)))
    assert(bad("events_type_domain") == ((4L, 1L, false)))
    assert(bad("events_props_k") == ((4L, 1L, false)))
    assert(bad("events_ts_sane") == ((4L, 1L, false)))
    assert(bad("documents_n_chars") == ((2L, 1L, false)))
    assert(bad("embeddings_dims") == ((2L, 1L, false)))
    assert(bad("orders_custkey_fk") == ((2L, 1L, false)))
    assert(bad("lineitem_orderkey_fk") == ((2L, 1L, false)))
  }

  test("basket_pairs: directed association rules re-derive exactly") {
    val sfd = sf("sf0.001")
    val up = graft.io.Tables.events(spark, sfd)
      .filter($"event_type" === "purchase")
      .selectExpr("user_id as u",
        "cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as i")
      .filter("i is not null").distinct()
      .as[(Long, Long)].collect()
    val kept = up.groupBy(_._1).filter(_._2.length <= 50).values.flatten.toSeq
    val nUsers = kept.map(_._1).distinct.size.toLong
    val sizes = kept.groupBy(_._2).map { case (i, o) => i -> o.size.toLong }
    val co = kept.groupBy(_._1).values.toSeq.flatMap { items =>
      val is = items.map(_._2)
      for (a <- is; b <- is if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
      .filter(_._2 >= 2L)
    val expected = co.map { case ((a, b), s) =>
      val conf = s * 1000000L / sizes(a)
      (a, b) -> (s, sizes(a), sizes(b), conf, conf * nUsers / sizes(b))
    }
    val got = jobs.AnalyticsJobs.basketPairs(spark, sfd).collect()
      .map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons")) ->
        (r.getAs[Long]("support"), r.getAs[Long]("n_ante"),
          r.getAs[Long]("n_cons"), r.getAs[Long]("confidence_ppm"),
          r.getAs[Long]("lift_ppm"))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture yields co-purchases at support >= 2")
  }

  test("ab_metrics: per-arm scorecard re-derives from a collected md5 split") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", "event_type",
        "cast(round(value * 100 + 1e-9) as bigint) as cents")
      .as[(Long, String, Long)].collect()
    def armOf(u: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val expected = ev.groupBy(e => armOf(e._1)).map { case (arm, rows) =>
      val users = rows.map(_._1).distinct.size.toLong
      val purch = rows.filter(_._2 == "purchase")
      val purchasers = purch.map(_._1).distinct.size.toLong
      val rev = purch.map(_._3).sum
      arm -> (users, rows.size.toLong, purchasers, purch.size.toLong, rev,
        purchasers * 1000000L / users, rev / users)
    }
    val got = jobs.AnalyticsJobs.abMetrics(spark, sfd).collect()
      .map(r => r.getAs[String]("arm") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_purchasers"), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("revenue_cents"), r.getAs[Long]("conversion_ppm"),
          r.getAs[Long]("rev_per_user_cents"))).toMap
    assert(got == expected)
    // the hash split must genuinely populate both arms
    assert(got.keySet == Set("A", "B"))
    assert(got.values.forall(_._1 > 0))
  }

  test("item_conversion: per-item funnel re-derives from a collect") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("cast(regexp_extract(props, '\"k\"\\\\s*:\\\\s*(-?\\\\d+)', 1) as long) as item",
        "event_type", "cast(round(value * 100 + 1e-9) as bigint) as cents")
      .filter("item is not null")
      .as[(Long, String, Long)].collect()
    val expected = ev.groupBy(_._1).map { case (i, rows) =>
      val v = rows.count(_._2 == "view").toLong
      val p = rows.count(_._2 == "purchase").toLong
      i -> (v, p, rows.filter(_._2 == "purchase").map(_._3).sum,
        p * 1000000L / math.max(v, 1L))
    }
    val got = jobs.AnalyticsJobs.itemConversion(spark, sfd).collect()
      .map(r => r.getAs[Long]("item_id") ->
        (r.getAs[Long]("views"), r.getAs[Long]("purchases"),
          r.getAs[Long]("revenue_cents"), r.getAs[Long]("view_to_buy_ppm")))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "fixture has purchases")
  }

  test("session_entries: entry/exit/bounce matrix re-derives from a walk") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", "unix_micros(ts) as tsu", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val gap = 1800L * 1000000L
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toList
      val out = scala.collection.mutable.ListBuffer[List[(Long, Long, Long, String)]]()
      sorted.foreach { r =>
        if (out.isEmpty || r._2 - out.last.last._2 > gap) out += List(r)
        else out(out.length - 1) = out.last :+ r
      }
      out.map { s =>
        (s.head._4, s.last._4, s.length.toLong,
          (s.last._2 - s.head._2) / 1000000L)
      }
    }.toSeq
    val expected = sessions.groupBy(s => (s._1, s._2)).map { case (k, ss) =>
      val n = ss.size.toLong
      val b = ss.count(_._3 == 1L).toLong
      k -> (n, b, b * 1000000L / n, ss.map(_._4).sum / n)
    }
    val got = jobs.AnalyticsJobs.sessionEntries(spark, sfd).collect()
      .map(r => (r.getAs[String]("entry"), r.getAs[String]("exit")) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"),
          r.getAs[Long]("bounce_ppm"), r.getAs[Long]("avg_duration_s"))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == sessions.size.toLong)
  }

  test("rfm_segments: quintile scores re-derive from a sorted recompute") {
    val sfd = sf("sf0.001")
    val ev = graft.io.Tables.events(spark, sfd)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 as day",
        "event_type", "cast(round(value * 100 + 1e-9) as bigint) as cents")
      .as[(Long, Long, String, Long)].collect()
    val maxDay = ev.map(_._2).max
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      (u, maxDay - rows.map(_._2).max, rows.size.toLong,
        rows.filter(_._3 == "purchase").map(_._4).sum)
    }.toSeq
    val n = users.size.toLong
    def scores(sorted: Seq[Long]): Map[Long, Long] =
      sorted.zipWithIndex.map { case (u, i) => u -> (i.toLong * 5 / n + 1) }.toMap
    val rs = scores(users.sortBy(t => (-t._2, t._1)).map(_._1))
    val fs = scores(users.sortBy(t => (t._3, t._1)).map(_._1))
    val ms = scores(users.sortBy(t => (t._4, t._1)).map(_._1))
    val got = jobs.AnalyticsJobs.rfmSegments(spark, sfd).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r_days"), r.getAs[Long]("f"), r.getAs[Long]("m_cents"),
          r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score"), r.getAs[Long]("segment"))).toMap
    assert(got.keySet == users.map(_._1).toSet)
    users.foreach { case (u, r, f, m) =>
      assert(got(u) == ((r, f, m, rs(u), fs(u), ms(u),
        rs(u) * 100 + fs(u) * 10 + ms(u))), s"user $u")
    }
    // every quintile is populated on a 100+-user fixture
    (1L to 5L).foreach { s =>
      assert(got.values.exists(_._4 == s) && got.values.exists(_._5 == s) &&
        got.values.exists(_._6 == s), s"score $s unpopulated")
    }
  }
}
