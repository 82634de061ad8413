package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.OrderEvent
import graft.streaming.OrderTimeoutStream

/** Integration: unbounded file-source replay of the whole events table
  * through the stateful layer (S1 streaming replay), and exactly-once
  * checkpoint recovery across a query restart.
  */
class StreamingIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("file-source replay: 10k-event stream through the order machine " +
      "matches the batch classification") {
    val sfd = sf("sf0.01")
    // file streaming sources need a directory: symlink the table in
    val dir = Files.createTempDirectory("graft_stream_src")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfd/events.parquet"))
    // events parquet → OrderEvent stream (signup≈create, purchase≈pay);
    // schema must be the RAW file schema, converted after the scan exactly
    // like Tables.events (which dispatches on the shipped ts dtype)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sfd/events.parquet").schema
    val tsConv =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else $"ts".cast("timestamp")
    val stream = spark.readStream.schema(rawSchema)
      .parquet(dir.toString)
      .withColumn("ts", tsConv)
      .filter($"event_type".isin("signup", "purchase"))
      .select($"user_id".as("orderId"),
        when($"event_type" === "signup", "create").otherwise("pay").as("eventType"),
        lit("tx").as("txId"), $"ts")
      .as[OrderEvent]
    val q = OrderTimeoutStream.detect(stream).toDF()
      .writeStream.format("memory").queryName("replay_orders")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("replay_orders")
        .groupBy($"resultState").count().as[(String, Long)].collect().toMap
      // batch oracle: first-create/first-pay conditional aggregation,
      // restricted to keys whose timers have fired (all, given data range)
      val batch = graft.jobs.OrderJobs.orderTimeout(spark, sfd)
        .groupBy($"result_state").count().as[(String, Long)].collect().toMap
      // streaming emits per (create,pay) resolution: first pay after first
      // create resolves the pair; compare the resolved states that have
      // deterministic batch equivalents
      assert(streaming.values.sum > 0)
      assert(streaming.keySet.subsetOf(Set("payed successfully",
        "payed but already timeout", "timeout", "payed but not found created")))
      // every user classified by batch appears in the stream output too
      assert(streaming.values.sum >= batch.values.sum * 9 / 10)
    } finally q.stop()
  }

  test("streaming ingest curation: dedup-within-watermark → quality gate " +
      "→ windowed per-lang accounting") {
    // the composed ingest story a training pipeline runs at the edge:
    // fingerprint-dedup close-in-time repeats (crawler retries), gate on
    // the same codegen quality score the batch curation uses, then
    // windowed per-language admission accounting — all one streaming plan
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TextAnalysis
    import graft.streaming.StreamingDedup
    val in = MemoryStream[(Long, String, String, Long)]
    val docs = in.toDF().toDF("doc_id", "text", "lang", "tsSec")
      .withColumn("ts", expr("timestamp_seconds(tsSec)"))
    val good = "the data of the table and the row is on the disk " * 8
    val deduped = StreamingDedup.byFingerprint(docs, "ts", "10 seconds")
    val nTok = TextAnalysis.tokenCount($"text")
    val admitted = deduped
      .withColumn("quality", TextAnalysis.qualityScore(nTok,
        TextAnalysis.stopwordCount($"text")))
      .filter($"quality" >= 0.5)
      .groupBy(window($"ts", "1 minute"), $"lang")
      .agg(count(lit(1)).as("n_admitted"))
      .select(unix_timestamp($"window.end").as("window_end"), $"lang",
        $"n_admitted")
    val q = admitted.writeStream.format("memory").queryName("ingest_cur")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, good, "en", 10L),
        (2L, good, "en", 12L),        // dup within horizon → dropped
        (3L, "spam spam", "en", 15L), // low quality → gated
        (4L, good + "extra", "de", 20L))
      q.processAllAvailable()
      in.addData((99L, "flush flush flush", "en", 600L)) // close the window
      q.processAllAvailable()
      val out = spark.table("ingest_cur")
        .select($"lang", $"n_admitted").as[(String, Long)].collect().toMap
      assert(out == Map("en" -> 1L, "de" -> 1L),
        s"expected one admitted doc per lang, got $out")
    } finally q.stop()
  }

  test("checkpointed query restarts exactly-once (no lost or duplicated state)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_out").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    val in = MemoryStream[OrderEvent]
    def start() = OrderTimeoutStream.detect(in.toDS(), deadlineMs = 60000).toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    in.addData(OrderEvent(1, "create", "a", ts(10)), OrderEvent(1, "pay", "a", ts(20)),
      OrderEvent(2, "create", "b", ts(10)))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint; pending state (order 2) must survive
    val q2 = start()
    in.addData(OrderEvent(3, "create", "c", ts(30)), OrderEvent(3, "pay", "c", ts(40)),
      OrderEvent(9, "create", "", ts(10000))) // watermark → fire order 2 timer
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir).as[graft.model.OrderResult].collect()
      .filter(_.orderId != 9L)
    val byOrder = out.groupBy(_.orderId).view.mapValues(_.map(_.resultState)).toMap
    assert(byOrder(1L).toSeq == Seq("payed successfully")) // exactly once
    assert(byOrder(3L).toSeq == Seq("payed successfully"))
    assert(byOrder(2L).toSeq == Seq("timeout")) // state survived the restart
    assert(out.length == 3)
  }

  test("late-split watermark survives a checkpointed restart") {
    import graft.streaming.LateSplit
    import graft.streaming.LateSplit.Hit
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("late_ckpt").toString
      val outDir = Files.createTempDirectory("late_out").toString
      val in = MemoryStream[Hit]
      def start() = LateSplit.split(in.toDS(),
          disorderMs = 5000, latenessMs = 60000, slackMs = 1000000).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

      val q1 = start()
      in.addData(Hit("/a", 10000000L)) // establishes the watermark
      q1.processAllAvailable()
      q1.stop()

      // after restart the persisted watermark must still classify this row
      // as late (horizon = 10000000 − 5000 − 60000 = 9935000)
      val q2 = start()
      in.addData(Hit("/a", 9000000L), Hit("/a", 9950000L))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(outDir).as[LateSplit.TaggedHit].collect()
        .map(t => t.tsMs -> t.tag).toMap
      assert(got(10000000L) == "ontime")
      assert(got(9000000L) == "late", "persisted watermark lost on restart")
      assert(got(9950000L) == "ontime")
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
