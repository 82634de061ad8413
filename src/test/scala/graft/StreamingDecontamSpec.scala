package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDecontam

/** Stream/batch decontamination equivalence: the train-split documents
  * streamed through the in-flight 8-gram screen against the persisted
  * eval window-hash table must flag BIT-EQUAL contamination counts and
  * rates to the batch `ngram_contamination` query — same whitespace
  * windows, md5-half hashes, integer counts, identical division
  * operands.
  */
class StreamingDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("in-flight contamination screen equals the batch query row for row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val evalWins = graft.jobs.DedupJobs.evalWindowHashes(spark, dir)
    evalWins.cache().count() // the persisted eval table

    val docs = graft.jobs.DedupJobs.trainDocs(spark, dir)
      .as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDecontam.screen(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "0 seconds",
        evalWins, graft.jobs.DedupJobs.CONTAM_W)
      .writeStream.format("memory").queryName("stream_decontam")
      .outputMode("append").start()
    val got = try {
      // all docs in one event-time instant; a later flush row closes it
      in.addData(docs.map { case (id, t) => (id, t, new Timestamp(100000L)) }: _*)
      q.processAllAvailable()
      in.addData((-1L, "flush " * 9, new Timestamp(999000000L)))
      q.processAllAvailable()
      spark.table("stream_decontam").filter($"doc_id" >= 0)
        .as[(Long, Long, Long, Double)].collect().toSet
    } finally q.stop()

    val want = graft.jobs.DedupJobs.ngramContamination(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the fixture must exercise both outcomes or the gate is vacuous
    assert(got.exists(_._3 > 0L), "no contaminated doc in fixture")
    assert(got.exists(_._3 == 0L), "no clean doc in fixture")
    spark.catalog.clearCache()
  }
}
