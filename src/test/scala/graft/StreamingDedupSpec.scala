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
}
