package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.TypedAggregators
import graft.model.Event
import graft.ops.{Reports, TopN}
import graft.streaming.{LateData, StreamingWindows}

/** Coverage for the remaining SURVEY §2 surface: P5 formatted reports,
  * §2.14 typed Aggregator, W6 late-data accounting.
  */
class SurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("P5: window report renders ranked rows like the reference") {
    val ranked = Seq(
      (300L, "item1", 10L, 1L), (300L, "item2", 7L, 2L))
      .toDF("window_end", "key", "cnt", "rn")
    val report = Reports.windowReport(ranked, "itemId")
      .select($"report").as[String].head()
    assert(report.contains("window end: 1970-01-01 00:05:00.0"))
    assert(report.contains("NO 1: itemId=item1 count=10"))
    assert(report.contains("NO 2: itemId=item2 count=7"))
    assert(report.indexOf("NO 1") < report.indexOf("NO 2"))
  }

  test("§2.14: typed Aggregator (sum,count accumulator) matches builtin avg") {
    import org.apache.spark.sql.functions.udaf
    val avgUdaf = udaf(TypedAggregators.avgLong)
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val got = df.agg(avgUdaf($"v").as("a"), avg($"v").as("b"))
      .as[(Double, Double)].head()
    assert(got._1 == got._2 && got._1 == 2.5)
  }

  test("W6: watermark drops are observable via progress metrics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val counts = StreamingWindows.slidingCount(
      in.toDF(), $"event_type", "ts", "10 minutes", "5 minutes", "0 seconds")
    val q = counts.writeStream.format("memory").queryName("w6_out")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(100), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Event(2, ts(5000), 1, "view", 1.0, "{}")) // watermark → 5000
      q.processAllAvailable()
      in.addData(Event(3, ts(100), 1, "view", 1.0, "{}"))  // late: dropped
      q.processAllAvailable()
      assert(LateData.droppedByWatermark(q) >= 1)
    } finally q.stop()
  }
}
