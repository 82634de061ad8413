package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Ingest-side exact dedup: near-in-time repeats of the same normalized
  * content are dropped; distinct content passes; state is evicted at the
  * watermark horizon (the property that keeps it viable on an unbounded
  * ingest).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String, ts: Timestamp)
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("repeats within the horizon are dropped, distinct content passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDedup.byFingerprint(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "the quick brown fox", ts(100)),
        (2L, "THE  Quick   brown FOX", ts(101)), // normalized dup of 1
        (3L, "completely different", ts(102)))
      q.processAllAvailable()
      in.addData((4L, "the quick brown fox", ts(103))) // dup, same batch horizon
      q.processAllAvailable()
      val got = spark.table("stream_dedup").select($"doc_id").as[Long]
        .collect().toSet
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }

  test("stream-static corpus screen: in-flight signatures equal the batch ones") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // corpus = batch signatures of three known docs
    val corpus = Seq(
      (10L, "pack my box with five dozen brown liquor jugs"),
      (11L, "the quick brown fox jumps over the lazy dog"),
      (12L, "completely different words entirely here now"))
      .toDF("doc_id", "text")
    val corpusSigs = graft.ops.Dedup
      .minhashSignatures(corpus, col("doc_id"), col("text"), 8)
      .withColumnRenamed("doc_id", "corpus_id")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDedup.screenAgainstCorpus(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "0 seconds",
        corpusSigs, k = 8, bands = 2)
      .writeStream.format("memory").queryName("stream_screen")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "pack my box with five dozen brown liquor jugs", ts(100)), // = 10
        (2L, "totally unrelated arrival talking about nothing", ts(101)),
        (3L, "one", ts(102))) // no bigrams: null signature, never matches
      q.processAllAvailable()
      val got = spark.table("stream_screen")
        .select($"doc_id", $"corpus_id", $"band")
        .as[(Long, Long, Int)].collect()
      // identical text ⇒ identical signature ⇒ the arrival collides with
      // its corpus twin in EVERY band — the in-flight array-lambda
      // signature reproduces the batch gram-window signature exactly
      assert(got.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet ==
        Set((10L, 0), (10L, 1)))
      assert(!got.exists(r => r._1 == 2L || r._1 == 3L))
    } finally q.stop()
  }

  test("dedup state survives a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("dedup_out").toString
    val in = MemoryStream[(Long, String, Timestamp)]
    def start() = StreamingDedup.byFingerprint(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    in.addData((1L, "alpha beta", ts(100)))
    q1.processAllAvailable()
    q1.stop()

    // post-restart repeat of pre-restart content must still be dropped
    val q2 = start()
    in.addData((2L, "alpha  BETA", ts(200)), (3L, "new content", ts(201)))
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L), "fingerprint state lost across restart")
  }
}
