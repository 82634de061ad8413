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
}
