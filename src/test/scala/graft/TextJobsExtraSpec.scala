package graft

import org.apache.spark.sql.functions._
import graft.jobs.TextJobs
import graft.ops.TextAnalysis

/** PII redaction + context-window packing: hand-computed fixtures plus
  * whole-corpus invariants on driver-shaped data.
  */
class TextJobsExtraSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails and 3-3-4 phones, counts match") {
    val docs = Seq(
      (1L, "reach alice@example.org or bob.smith+x@mail.co today"),
      (2L, "call 555-123-4567 and 555-000-9999 now"),
      (3L, "mixed carol@a.io then 321-555-0000 done"),
      (4L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextAnalysis.emailCount($"text").as("ne"),
        TextAnalysis.phoneCount($"text").as("np"),
        TextAnalysis.redactPii($"text").as("red"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 0L, "reach <EMAIL> or <EMAIL> today")))
    assert(out(2L) == ((0L, 2L, "call <PHONE> and <PHONE> now")))
    assert(out(3L) == ((1L, 1L, "mixed <EMAIL> then <PHONE> done")))
    assert(out(4L) == ((0L, 0L, "no pii here at all")))
  }

  test("text_redact gate query: exactly one injected email+phone per doc") {
    val out = TextJobs.textRedact(spark, sf("sf0.001"))
    assert(out.filter($"n_emails" =!= 1 || $"n_phones" =!= 1).count() == 0)
    // every fingerprint is of a scrubbed string: re-running the scrub on
    // the corpus must produce the same row count (sanity, not a hash gate
    // — the driver oracle does the hash)
    assert(out.count() ==
      graft.io.Tables.documents(spark, sf("sf0.001")).count())
  }

  test("doc_packing: bins fill to exactly PACK_W and cover every token once") {
    val out = TextJobs.docPacking(spark, sf("sf0.001")).cache()
    // offsets inside the window, contributions positive and bounded
    assert(out.filter($"bin_offset" < 0 || $"bin_offset" >= 2048 ||
      $"n_toks" <= 0 || $"n_toks" > 2048).count() == 0)
    // every bin except each lang's last holds exactly PACK_W tokens
    val bins = out.groupBy($"lang", $"bin").agg(sum($"n_toks").as("fill"))
    val lastBin = bins.groupBy($"lang").agg(max($"bin").as("last"))
    val full = bins.join(lastBin, "lang").filter($"bin" < $"last")
    assert(full.filter($"fill" =!= 2048).count() == 0)
    // per-document contributions reassemble the exact token count
    val perDoc = out.groupBy($"doc_id").agg(sum($"n_toks").as("got"))
    val expected = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("want"))
      .filter($"want" > 0)
    assert(perDoc.join(expected, "doc_id").filter($"got" =!= $"want").count() == 0)
    assert(perDoc.count() == expected.count())
    out.unpersist()
  }
}
