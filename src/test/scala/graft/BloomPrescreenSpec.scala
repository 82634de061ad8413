package graft

import org.apache.spark.sql.functions._
import graft.jobs.DedupJobs
import graft.ops.Dedup

/** Bloom-prescreened incremental dedup: the prescreen must be invisible in
  * the OUTPUT (lossless — no false negatives, exact join kills false
  * positives) and visible in the PLAN (the corpus side is filtered by the
  * bloom probe before any exchange).
  */
class BloomPrescreenSpec extends SparkSpec {
  import spark.implicits._

  test("bloom variant returns exactly the unfiltered candidates (driver data)") {
    val plain = DedupJobs.dedupIncremental(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSet
    val bloom = DedupJobs.dedupIncrementalBloom(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSet
    assert(plain == bloom,
      s"prescreen changed the output: only-plain=${plain -- bloom}, " +
        s"only-bloom=${bloom -- plain}")
    assert(plain.nonEmpty, "fixture produced no cross-set candidates at all")
  }

  test("no false negatives on synthetic signatures with known collisions") {
    // 8-hash signatures, 2 bands of 4: rows 0..9 in `right` share band 0
    // with their twin in `left`; rows 100.. in `right` match nothing
    val left = (0 until 10).map { i =>
      (i.toLong, i + 1L, i + 2L, i + 3L, i + 4L, 900L + i, 901L + i, 902L + i, 903L + i)
    }.toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
    val right = ((0 until 10).map { i =>
      (1000L + i, i + 1L, i + 2L, i + 3L, i + 4L, 700L + i, 701L + i, 702L + i, 703L + i)
    } ++ (0 until 200).map { i =>
      (2000L + i, 5000L + i, 5001L + i, 5002L + i, 5003L + i,
        6000L + i, 6001L + i, 6002L + i, 6003L + i)
    }).toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
    val got = Dedup.lshCandidatesAcrossBloom(left, right, k = 8, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    assert(got == want, s"got=$got")
  }

  test("the corpus side is bloom-filtered before the band joins") {
    val p = DedupJobs.dedupIncrementalBloom(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // guard the guard: if this plan ever grows past SparkSpec's 1 MB
    // stringification cap, the contains-assert below goes vacuous —
    // fail loudly instead
    assert(!p.contains("Truncated plan of"), "plan string hit the cap")
    assert(p.contains("bloom_might_contain"),
      s"prescreen missing from the plan:\n$p")
  }
}
