package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.model.UserBehavior

/** S4's value-parse path (`Sources.parseUserBehaviorLines`): the broker
  * connection can't run in this container, but everything after it — the
  * CSV-in-value decode the reference does in its Kafka map()
  * (`HotItems.scala:39-52`) — is exercised here over exactly the frame
  * shape `kafkaLines` emits (`value: String`), in both batch and streaming.
  */
class KafkaParseSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "543462,1715,1464116,pv,1511658000",
    "662867,2244074,1575622,pv,1511658060",
    "561558,3611281,965809,buy,1511658120")

  test("CSV-in-value parse equals the file-source parse on the same lines") {
    val fromValue = Sources.parseUserBehaviorLines(lines.toDF("value"))
      .as[UserBehavior].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("kafka_parse").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "ub.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val fromFile = Sources.userBehaviorCsv(spark, s"$dir/ub.csv").collect().toSet
    assert(fromValue == fromFile)
    assert(fromValue.exists(u =>
      u.userId == 543462L && u.behavior == "pv" &&
        u.ts.getTime == 1511658000L * 1000L))
  }

  test("value parse runs unchanged on a streaming frame") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    // Dataset[String]'s single column is already named `value` — the exact
    // frame shape kafkaLines emits
    val q = Sources.parseUserBehaviorLines(in.toDF())
      .writeStream.format("memory").queryName("kafka_parse").outputMode("append")
      .start()
    try {
      in.addData(lines)
      q.processAllAvailable()
      val got = spark.table("kafka_parse").as[UserBehavior].collect()
      assert(got.length == 3)
      assert(got.count(_.behavior == "pv") == 2)
    } finally q.stop()
  }

  test("value-line stream drives the full windowed lineage, equal to batch") {
    // The S4 contract the sandbox CAN close (no broker, no kafka jar):
    // everything DOWNSTREAM of the socket — value:String frame (the exact
    // kafkaLines output shape) → CSV-in-value parse → watermark → sliding
    // count — produces the same windows as the batch path over the same
    // rows, through the shared window math. Only the broker socket itself
    // remains untested, and that is inherent to the zero-egress container.
    implicit val sqlCtx = spark.sqlContext
    val base = 1511658000L
    val valueLines = (0 until 12).map { i =>
      s"${100 + i % 3},${10 + i % 2},99,pv,${base + i * 60}"
    }
    val in = MemoryStream[String]
    val parsed = Sources.parseUserBehaviorLines(in.toDF())
    assert(parsed.isStreaming)
    val q = graft.streaming.StreamingWindows
      .slidingCount(parsed.where(col("behavior") === "pv"),
        col("itemId"), "ts", "10 minutes", "5 minutes", "0 seconds")
      .writeStream.format("memory").queryName("kafka_lineage")
      .outputMode("append").start()
    try {
      in.addData(valueLines)
      q.processAllAvailable()
      in.addData(Seq(s"999,999,99,pv,${base + 7200}")) // advance watermark
      q.processAllAvailable()
      val stream = spark.table("kafka_lineage")
        .select(col("key"), col("window_end"), col("cnt"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.ops.SlidingWindows
        .slidingCount(
          Sources.parseUserBehaviorLines(valueLines.toDF("value"))
            .where(col("behavior") === "pv"),
          col("itemId"), col("ts"), "10 minutes", "5 minutes", "key")
        .select(col("key"), col("window_end"), col("cnt"))
        .as[(Long, Long, Long)].collect().toSet
      assert(batch.nonEmpty && batch.subsetOf(stream))
      // schema parity with the file source: same fields, same types
      val dir = java.nio.file.Files.createTempDirectory("kafka_schema").toString
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "ub.csv"),
        valueLines.mkString("\n").getBytes("UTF-8"))
      assert(parsed.schema ==
        Sources.userBehaviorCsv(spark, s"$dir/ub.csv").schema)
    } finally q.stop()
  }

  test("malformed values produce null fields, not a crashed stream") {
    val out = Sources.parseUserBehaviorLines(
      Seq("not,a,valid,row,xx", "543462,1715,1464116,pv,1511658000").toDF("value"))
    assert(out.count() == 2)
    assert(out.filter(col("userId").isNull).count() == 1)
  }
}
