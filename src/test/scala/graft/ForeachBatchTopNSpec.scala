package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.Event
import graft.streaming.StreamingWindows

/** X1 streaming path: ranking windows are illegal on streaming frames, so
  * the windowed top-N runs per micro-batch via foreachBatch over the
  * (complete-mode) aggregated counts — the default strategy from
  * SURVEY.md §7.4 hard-part 3. Also smoke-tests the rate source (unbounded
  * non-file source machinery).
  */
class ForeachBatchTopNSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("X1: foreachBatch ranks each micro-batch with the batch expression") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val counts = StreamingWindows.slidingCount(
      in.toDF(), $"event_type", "ts", "10 minutes", "5 minutes", "0 seconds")
    @volatile var last: Array[(String, Long, Long, Long)] = Array.empty
    val q = StreamingWindows.topNForeachBatch(counts, 2, (ranked: DataFrame, _: Long) => {
      val rows = ranked.select($"key", $"window_end", $"cnt", $"rn")
        .as[(String, Long, Long, Long)].collect()
      if (rows.nonEmpty) last = rows
    }).queryName("x1_topn").start()
    try {
      in.addData(
        Event(1, ts(60), 1, "view", 1, "{}"),
        Event(2, ts(70), 1, "view", 1, "{}"),
        Event(3, ts(80), 1, "click", 1, "{}"),
        Event(4, ts(90), 1, "error", 1, "{}"))
      q.processAllAvailable()
      val w300 = last.filter(_._2 == 300L)
      // top-2 of 3 event types in the window ending at 300s
      assert(w300.map(_._1).toSet == Set("view", "click"))
      assert(w300.find(_._1 == "view").get._4 == 1L) // view: cnt 2, rank 1
    } finally q.stop()
  }

  test("rate source: unbounded non-file source drives the window operator") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .selectExpr("timestamp AS ts", "CAST(value % 5 AS STRING) AS event_type")
    val counts = StreamingWindows.slidingCount(
      rate, org.apache.spark.sql.functions.col("event_type"),
      "ts", "10 seconds", "5 seconds", "0 seconds")
    val q = counts.writeStream.format("memory").queryName("rate_counts")
      .outputMode("append").start()
    try {
      // wait until some windows close (rate source advances in real time)
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = spark.table("rate_counts").count()
      }
      assert(n > 0, "no closed windows from the rate source within 30s")
    } finally q.stop()
  }
}
