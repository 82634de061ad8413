package graft

import graft.io.{Bucketing, Tables}

/** Bucketed joins must read co-located buckets with no shuffle. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket-count join plans with zero Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf("sf0.001"))
          .select($"l_orderkey", $"l_quantity", $"l_extendedprice"),
        "li_bucketed", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sf("sf0.001"))
          .select($"o_orderkey", $"o_totalprice"),
        "ord_bucketed", "o_orderkey", 4)
      val joined = Bucketing.bucketJoin(
        spark, "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(joined.count() ==
        Tables.lineitem(spark, sf("sf0.001")).count()) // FK: every li matches
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf("sf0.001")).select($"l_orderkey", $"l_quantity"),
        "li_bucketed2", "l_orderkey", 4)
      val agg = spark.table("li_bucketed2")
        .groupBy($"l_orderkey").sum("l_quantity")
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed2")
    }
  }
}
