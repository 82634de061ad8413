package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCuration

/** The composed ingest pipeline (dedup screen → quality gate → admission
  * accounting) as ONE chained-stateful streaming query, checked bit-equal
  * against its batch restatement on the same fixture — the end-to-end
  * compose the per-screen specs don't cover.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // Fixture: dup copies share (source, window bucket) and normalized
  // content, so every survivor choice inside dropDuplicatesWithinWatermark
  // yields the SAME admission counts — determinism by invariance, not by
  // assuming which copy wins the shuffle.
  private val good =
    "the cat sat on the mat and the dog slept in the sun for a while"
  private val bad = "zxqv wvut qqpr mmnn"
  private def docs: Seq[(Long, String, String, Timestamp)] = Seq(
    (1L, "web", good, ts(100)),
    (2L, "web", "THE  Cat sat ON the mat and the dog slept in the sun for a while", ts(101)),
    (3L, "web", bad, ts(102)), // fails the quality gate
    (4L, "books", good + " indeed", ts(103)),
    (5L, "books", good + " indeed", ts(104)), // exact dup of 4
    (6L, "web", "a completely different story is told here and the end is near of it", ts(111)),
    (7L, "books", bad, ts(112)), // fails the gate
    (8L, "web", "a completely DIFFERENT story is told here and the end is near of it", ts(113)))

  test("chained dedup -> quality -> admission equals the batch restatement") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Timestamp)]
    val q = StreamingCuration.screen(
        in.toDF().toDF("doc_id", "source", "text", "ts"),
        "ts", "5 seconds", "10 seconds", minQuality = 0.2)
      .writeStream.format("memory").queryName("stream_curation")
      .outputMode("append").start()
    try {
      in.addData(docs)
      q.processAllAvailable()
      // chained stateful latency (round-4 rule): the aggregation sees
      // dedup output at-or-behind the watermark, so closing every window
      // needs two successive watermark jumps
      in.addData((9998L, "zz", "advance one", ts(100000)))
      q.processAllAvailable()
      in.addData((9999L, "zz", "advance two", ts(200000)))
      q.processAllAvailable()
      val streaming = spark.table("stream_curation")
        .filter($"source" =!= "zz")
        .as[(Timestamp, Timestamp, String, Long, Long)].collect()
        .map(t => (t._1.getTime, t._2.getTime, t._3, t._4, t._5)).toSet

      // batch restatement: one representative per normalized fingerprint
      // (min doc_id — invariant, see fixture note), same quality
      // arithmetic, same 10 s tumbling buckets
      import graft.ops.TextAnalysis
      val b = docs.toDF("doc_id", "source", "text", "ts")
      val keep = b.groupBy(TextAnalysis.fingerprint($"text").as("fp"))
        .agg(min($"doc_id").as("doc_id")).select($"doc_id")
      val batch = b.join(keep, Seq("doc_id"), "left_semi")
        .withColumn("n_tok", TextAnalysis.tokenCount($"text"))
        .withColumn("q", TextAnalysis.qualityScore($"n_tok",
          TextAnalysis.stopwordCount($"text")))
        .filter($"q" >= 0.2)
        .groupBy(window($"ts", "10 seconds"), $"source")
        .agg(count(lit(1)).as("docs_kept"), sum($"n_tok").as("tokens_kept"))
        .select($"window.start", $"window.end", $"source",
          $"docs_kept", $"tokens_kept")
        .as[(Timestamp, Timestamp, String, Long, Long)].collect()
        .map(t => (t._1.getTime, t._2.getTime, t._3, t._4, t._5)).toSet

      assert(streaming == batch,
        s"only-stream=${streaming -- batch} only-batch=${batch -- streaming}")
      // the funnel must genuinely exercise both screens on this fixture
      assert(batch.nonEmpty)
      val kept = batch.toSeq.map(_._4).sum
      assert(kept < docs.size - 2, "dedup + gate dropped nothing")
    } finally q.stop()
  }

  test("THREE chained stateful stages: dedup -> decontam -> quality -> admission") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TextAnalysis
    val w = 3
    // eval text shares a 3-word window with docs 6/8's story — the dedup
    // SURVIVOR of that pair must then fall to the decontamination screen
    val evalText = "a completely different story is told here"
    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("w_arr", split(trim($"text"), "\\s+"))
      .withColumn("g", explode(expr(
        s"filter(transform(w_arr, (x, i) -> array_join(slice(w_arr, i + 1, $w), ' ')), " +
          s"(g, i) -> i <= size(w_arr) - $w)")))
    val evalWindows = windowed(Seq(evalText).toDF("text"))
      .select(conv(substring(md5($"g"), 1, 8), 16, 10).cast("long").as("gh1"),
        conv(substring(md5($"g"), 9, 8), 16, 10).cast("long").as("gh2"))
      .distinct().cache()
    evalWindows.count()

    val in = MemoryStream[(Long, String, String, Timestamp)]
    val q = StreamingCuration.screenDecontaminated(
        in.toDF().toDF("doc_id", "source", "text", "ts"),
        "ts", "5 seconds", "10 seconds", minQuality = 0.2,
        evalWindows, w)
      .writeStream.format("memory").queryName("stream_curation3")
      .outputMode("append").start()
    try {
      in.addData(docs)
      q.processAllAvailable()
      // three chained stateful stages → three successive watermark jumps
      in.addData((9997L, "zz", "advance one two three four", ts(100000)))
      q.processAllAvailable()
      in.addData((9998L, "zz", "advance one two three four", ts(200000)))
      q.processAllAvailable()
      in.addData((9999L, "zz", "advance one two three four", ts(300000)))
      q.processAllAvailable()
      val streaming = spark.table("stream_curation3")
        .filter($"source" =!= "zz")
        .as[(Timestamp, Timestamp, String, Long, Long)].collect()
        .map(t => (t._1.getTime, t._2.getTime, t._3, t._4, t._5)).toSet

      // batch restatement: IDENTICAL expressions on a batch frame
      // (including the chained window-on-window), so the semantics are
      // Spark's own, not a hand-derived rule
      val b = docs.toDF("doc_id", "source", "text", "ts")
      val keep = b.groupBy(TextAnalysis.fingerprint($"text").as("fp"))
        .agg(min($"doc_id").as("doc_id")).select($"doc_id")
      val deduped = b.join(keep, Seq("doc_id"), "left_semi")
        .withColumn("n_tok", TextAnalysis.tokenCount($"text"))
        .withColumn("q", TextAnalysis.qualityScore($"n_tok",
          TextAnalysis.stopwordCount($"text")))
      val perDoc = windowed(deduped)
        .select($"ts", $"doc_id", $"source", $"n_tok", $"q",
          conv(substring(md5($"g"), 1, 8), 16, 10).cast("long").as("gh1"),
          conv(substring(md5($"g"), 9, 8), 16, 10).cast("long").as("gh2"))
        .join(evalWindows.withColumn("hit", lit(1L)), Seq("gh1", "gh2"), "left")
        .groupBy(window($"ts", "10 seconds"), $"doc_id", $"source")
        .agg(max($"n_tok").as("n_tok"), max($"q").as("q"),
          sum(coalesce($"hit", lit(0L))).as("n_contam"))
      val batch = perDoc
        .filter($"n_contam" === 0 && $"q" >= 0.2)
        .groupBy(window($"window", "10 seconds"), $"source")
        .agg(count(lit(1)).as("docs_kept"), sum($"n_tok").as("tokens_kept"))
        .select($"window.start", $"window.end", $"source",
          $"docs_kept", $"tokens_kept")
        .as[(Timestamp, Timestamp, String, Long, Long)].collect()
        .map(t => (t._1.getTime, t._2.getTime, t._3, t._4, t._5)).toSet

      assert(streaming == batch,
        s"only-stream=${streaming -- batch} only-batch=${batch -- streaming}")
      assert(batch.nonEmpty)
      // the decontam stage must have dropped the 6/8 survivor: its story
      // windows hit the eval set, so no admitted doc carries them
      val admitted = batch.toSeq.map(_._4).sum
      val twoStage = {
        val alt = deduped.filter($"q" >= 0.2).count()
        alt
      }
      assert(admitted < twoStage,
        "decontamination stage dropped nothing on this fixture")
    } finally {
      q.stop(); evalWindows.unpersist()
    }
  }
}
