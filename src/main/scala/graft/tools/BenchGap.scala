package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Driver-vs-local bench gap report: `runMain graft.tools.BenchGap`.
  *
  * Rounds 4–6 each found their perf regressions by HAND-diffing the
  * driver's `BENCH_r{N}.json` against SCALE.md §9's recorded local
  * medians (the `ngram_jaccard` and `dedup_incremental_bloom` forensics
  * both started that way: driver ≫ local on ONE query = cache footprint
  * under the driver container's tighter memory, not a plan defect).
  * This tool makes that diff a lookup: it parses the newest
  * `BENCH_r*.json` (the driver's stdout tail — possibly truncated
  * mid-pair, so the last unparseable fragment is dropped) and the
  * checked-in `localbench.json` (the full per-query map `graft.Bench`
  * writes to /tmp/bench_full.json; refresh the snapshot after perf
  * work), divides, and writes BENCHGAP.md listing every query visible
  * in both with its ratio — queries over [[BenchGap.FlagRatio]] land in
  * a flagged table at the top with absolute seconds, so next round's
  * forensics starts from a ranked work list instead of a 90-line diff.
  *
  * Both inputs are the flat `"name":seconds` JSON map Bench emits;
  * a regex pair-scan parses them (no JSON library — build deps are
  * frozen), which is also what makes the truncated driver tail safe to
  * read: only complete pairs match.
  */
object BenchGap {

  /** Driver median ÷ local median above this = flagged for forensics.
    * 3× clears the documented ±25% container-load band plus first-run
    * JIT (~2–3×) with margin; the round-6 true positives read 4.9×/2.2×.
    */
  val FlagRatio = 3.0

  /** Flags already resolved in THIS round's working tree: the driver
    * side of the ratio is last round's bench, so a fix made after it
    * necessarily stays flagged until the next driver run — annotate it
    * instead of re-investigating. Prune entries once the next
    * BENCH_r*.json lands and the ratio clears.
    */
  val KnownFixed: Map[String, String] = Map(
    // r7 flags dedup_clusters / quality_classifier_trained cleared in the
    // r8 driver bench (1.08 s / 0.45 s) — pruned per the map's contract.
    // r11 legacy flags adjudicated by their r11 canary slots and pruned:
    // value_histogram 0.33 s (2.2x) and corpus_curation 1.31 s (2.6x)
    // fell below the 3x threshold; quality_from_artifact stayed 5.4x but
    // its slot canary read 0.45 s vs 0.107 med — env proven, moved to
    // KnownEnv.
    "rec_coverage" -> ("fixed round 12: the full-log CF similarity lists " +
      "are content-memoized (AnalyticsJobs.simLists, the rocchioModel " +
      "contract keyed by the events-parquet Fingerprint) — the registry " +
      "paid the quadratic pair join independently in item_similarity, " +
      "item_recs and rec_coverage; bench runs 2-3 now serve the " +
      "catalog x K lists from the memo and pay only the serving joins"))

  /** Flags attributed to driver-container environment, not engine code:
    * BenchOne locals are clean and the audited plan has nothing left to
    * mis-plan. The r9 bench adds a per-slot I/O canary (a constant-work
    * raw scan timed in every query's slot, `<q>__canary` keys) — if the
    * canary spikes in the same slot next round, the attribution is
    * proven; if it stays flat while the query reads high, the entry must
    * come OUT of this map and back into forensics.
    */
  val KnownEnv: Map[String, String] = Map(
    // r8 entries corpus_curation / value_histogram / event_paths pruned:
    // all three cleared the 3x threshold in BENCH_r11 (2.6x / 2.2x /
    // unflagged) with elevated slot canaries (0.24 / 0.21 vs 0.107 med)
    // confirming the attribution.
    "quality_from_artifact" -> ("r11 driver 1.62 s vs 0.30 local (5.4x) " +
      "WITH slot canary 0.45 s vs 0.107 canary_med — the constant-work " +
      "scan stalled 4.2x in the same slot, proving environment; the r9 " +
      "artifact-memo fix is in (local pair cost 0.7 s) and the plan is " +
      "a broadcast-scored single scan"))

  // the driver wrapper stores our stdout line INSIDE a JSON string, so
  // its quotes arrive backslash-escaped — accept both forms
  private val pair = """\\?"([A-Za-z0-9_]+)\\?":([0-9]+\.?[0-9]*)""".r

  def parsePairs(text: String): Map[String, Double] =
    pair.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filterNot { case (k, _) =>
        // the driver wrapper's own numeric fields, not query medians —
        // and the r9 per-slot I/O canary entries/summary
        Set("n", "rc", "cpus", "sf", "value", "nerr",
          "canary_med", "canary_max").contains(k) || k.endsWith("__canary")
      }
      .toMap

  /** Per-slot canary seconds from an r9+ bench file (empty for older). */
  def parseCanaries(text: String): Map[String, Double] =
    pair.findAllMatchIn(text)
      .filter(_.group(1).endsWith("__canary"))
      .map(m => m.group(1).stripSuffix("__canary") -> m.group(2).toDouble)
      .toMap

  def main(args: Array[String]): Unit = {
    val repo = Paths.get(".")
    val driverFile = Files.list(repo).iterator().asScala
      .filter(_.getFileName.toString.matches("BENCH_r\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString).lastOption
      .getOrElse(sys.error("no BENCH_r*.json in repo root"))
    val local = parsePairs(new String(
      Files.readAllBytes(repo.resolve("localbench.json")),
      StandardCharsets.UTF_8))
    val driverText = new String(
      Files.readAllBytes(driverFile), StandardCharsets.UTF_8)
    val driver = parsePairs(driverText)
    val canaries = parseCanaries(driverText)

    val rows = driver.toSeq
      .flatMap { case (q, d) =>
        local.get(q).map(l => (q, d, l, if (l > 0) d / l else Double.NaN))
      }
      .sortBy { case (_, _, _, r) => -r }
    val flagged = rows.filter(_._4 > FlagRatio)

    val sb = new StringBuilder
    sb ++= "# BENCHGAP — driver vs recorded local medians\n\n"
    sb ++= s"Generated by `sbt \"runMain graft.tools.BenchGap\"` from " +
      s"`${driverFile.getFileName}` (driver) vs `localbench.json` " +
      "(local reference; refresh it from /tmp/bench_full.json after " +
      "perf-relevant changes).\n\n"
    val unannotated = flagged.map(_._1)
      .filterNot(q => KnownFixed.contains(q) || KnownEnv.contains(q))
    sb ++= s"Driver queries visible: ${driver.size}; matched to local: " +
      s"${rows.size}; flagged (> ${FlagRatio}x): ${flagged.size}; " +
      s"unannotated (forensics owed): ${unannotated.size}" +
      (if (unannotated.nonEmpty) unannotated.mkString(" — ", ", ", "")
       else "") + ".\n\n"
    if (flagged.nonEmpty) {
      sb ++= "## FLAGGED — investigate first (unless noted as fixed/env)\n\n"
      sb ++= "| query | driver s | local s | ratio | canary s | note |\n|---|---|---|---|---|---|\n"
      flagged.foreach { case (q, d, l, r) =>
        val note = KnownFixed.get(q).map("FIXED: " + _)
          .orElse(KnownEnv.get(q).map("ENV: " + _)).getOrElse("")
        val can = canaries.get(q).map(c => f"$c%.2f").getOrElse("—")
        sb ++= f"| `$q` | $d%.2f | $l%.2f | **$r%.1fx** | $can | $note |\n"
      }
      sb ++= "\nPlaybook (rounds 4–6): BenchOne the query in isolation; " +
        "if local steady is fine, slim every cached frame on its path " +
        "to the columns consumed downstream and scope-release via " +
        "CacheScope — driver >> local on one query has ALWAYS been " +
        "cache footprint under memory pressure, not plan shape.\n"
    } else {
      sb ++= "No query exceeds the flag ratio — no perf forensics owed.\n"
    }
    sb ++= "\n## Full table (ratio desc)\n\n"
    sb ++= "| query | driver s | local s | ratio |\n|---|---|---|---|\n"
    rows.foreach { case (q, d, l, r) =>
      sb ++= f"| `$q` | $d%.2f | $l%.2f | $r%.1fx |\n"
    }
    // explicit UTF-8 via nio: sbt-forked JVM stdout mangles non-ASCII,
    // and checked-in reports must be byte-stable (round-6 rule)
    Files.write(repo.resolve("BENCHGAP.md"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[benchgap] wrote BENCHGAP.md: ${rows.size} matched, " +
      s"${flagged.size} flagged")
  }
}
