package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingLm

/** Stream/batch LM-score equivalence: documents streamed through the
  * in-flight screen against the batch-trained reference model must score
  * BIT-EQUAL to `lm_surprise_ref`'s integer columns — same tokenizer,
  * hashes, surprise bits, OOV accounting.
  */
class StreamingLmSpec extends SparkSpec {
  import spark.implicits._

  test("in-flight LM scores equal the batch reference scorer row for row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val (cb, cp) = graft.jobs.TextJobs.lmRefModel(spark, dir)
    cb.cache().count(); cp.cache().count() // the persisted model

    val docs = graft.io.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingLm.screen(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "0 seconds", cb, cp)
      .writeStream.format("memory").queryName("stream_lm")
      .outputMode("append").start()
    val got = try {
      // all docs in one event-time instant; a later flush row closes it
      in.addData(docs.map { case (id, t) => (id, t, new Timestamp(100000L)) }: _*)
      q.processAllAvailable()
      in.addData((-1L, "flush", new Timestamp(999000000L)))
      q.processAllAvailable()
      spark.table("stream_lm").filter($"doc_id" >= 0)
        .as[(Long, Long, Long, Long)].collect().toSet
    } finally q.stop()

    val want = graft.jobs.TextJobs.lmSurpriseRef(spark, dir)
      .select($"doc_id", $"n_bigrams", $"n_oov", $"surprise_bits")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
