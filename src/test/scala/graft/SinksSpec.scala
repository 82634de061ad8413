package graft

import org.apache.spark.sql.functions._
import graft.io.{Sinks, Sources, Tables}

/** Storage-layout surfaces: hive-partitioned curation landing (partition
  * pruning must reach the scan) and the JSON-lines document source.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned landing: a lang filter prunes to one directory subtree") {
    val dir = java.nio.file.Files.createTempDirectory("landing").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    Sinks.writePartitioned(docs, s"$dir/curated", Seq("lang"))
    val back = spark.read.parquet(s"$dir/curated").filter($"lang" === "en")
    back.collect()
    val p = back.queryExecution.executedPlan.toString
    // partition pruning: the lang predicate must be a PartitionFilter on
    // the scan, not a post-scan Filter over every language's files
    assert(p.contains("PartitionFilters") && p.contains("isnotnull(lang"),
      s"lang filter did not reach partition pruning:\n$p")
    assert(back.count() == docs.filter($"lang" === "en").count())
    // round trip is lossless per partition
    assert(spark.read.parquet(s"$dir/curated").count() == docs.count())
  }

  test("jsonl source: explicit schema, malformed lines null out not fail") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val f = new java.io.PrintWriter(s"$dir/docs.jsonl")
    f.println("""{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s", "n_chars": 10}""")
    f.println("""{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s", "n_chars": 5}""")
    f.println("""{"doc_id": 3, "text": broken json here""")
    f.close()
    val got = Sources.documentsJsonl(spark, s"$dir/docs.jsonl")
    assert(got.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = got.collect()
    assert(rows.length == 3)
    val good = rows.filter(r => !r.isNullAt(0)).map(_.getLong(0)).toSet
    assert(good == Set(1L, 2L)) // the malformed line nulls, never throws
  }

  test("retract sink emits the Flink changelog: (false, old) then (true, new)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val counts = in.toDF().toDF("item", "n")
      .groupBy($"item").agg(count(lit(1)).as("cnt"))
    val log = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Seq[Any])]
    val q = counts.writeStream.outputMode("update")
      .foreachBatch(Sinks.retractBatches(Seq("item")) { (add, row) =>
        log.synchronized { log += ((add, row.toSeq)) }
      }).start()
    try {
      in.addData(("a", 1L), ("b", 1L)); q.processAllAvailable()
      in.addData(("a", 2L)); q.processAllAvailable() // a: 2 → retract (a,1)
      in.addData(("a", 3L), ("c", 1L)); q.processAllAvailable()
    } finally q.stop()
    val aLog = log.filter(_._2.head == "a").toList
    assert(aLog == List(
      (true, Seq("a", 1L)),
      (false, Seq("a", 1L)), (true, Seq("a", 2L)),
      (false, Seq("a", 2L)), (true, Seq("a", 3L))),
      s"changelog for 'a' diverged: $aLog")
    // untouched keys never retract
    assert(log.filter(_._2.head == "b").toList == List((true, Seq("b", 1L))))
    assert(log.filter(_._2.head == "c").toList == List((true, Seq("c", 1L))))
  }
}
