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
    // r12 fixes proven by BENCH_r12 and pruned: rec_coverage 2.8 s
    // (1.6x), item_similarity 0.07 s, dedup_eval 1.2 s (1.1x) — the
    // simLists/jaccardTruthPairs memos landed driver-side with quiet
    // slot canaries.
    //
    // ALL 12 BENCH_r12 flags share one forensic signature (BenchOne r13,
    // quiet box): run 1 reads 3.3-11 s — cold codegen/JIT plus, for the
    // memo/artifact queries, the one-time training pass — then runs 2-4
    // descend to a 0.7-2 s steady state that matches or beats localbench.
    // A 3-run median under driver load cuts that descent mid-curve, so
    // the driver medians (1.5-29 s) are the cold component stretched by
    // container load, not engine regressions (every plan re-audited by
    // PLANAUDIT, 0 unexplained). Fixed round 13 by the bench warm pass:
    // graft.Bench now runs every registered query once UNTIMED before
    // timing (trained models are train-once/score-many by contract, and
    // the codegen cache is an instrument artifact), so every timed run
    // measures the serving regime; localbench.json is refreshed under
    // the same semantics. Canary slots registered for all 12.
    //
    // All 14 r12→r13 KnownFixed entries (semantic_dedup_from_artifact,
    // ann_ivf_pq_rerank, hot_items_topn, mixture_plan, rec_eval,
    // lm_surprise_ref, source_caps_quality, event_paths, set_ops,
    // embedding_neardup, item_communities, tokenizer_compare,
    // q5_local_supplier, ngram_jaccard_prefix) were adjudicated by
    // BENCH_r13 — every visible one descended to <=2.0x local under the
    // warm-pass semantics (the r13 VERDICT confirms all 13 r12 flags
    // <=1.5x) — and are pruned per the map's contract.
    // All five r13→r14 KnownFixed entries adjudicated by BENCH_r14 and
    // pruned per the map's contract: cross_modal_clusters 3.09 s (1.4x,
    // the scoped-cache fix driver-confirmed 10.8 -> 3.09), semantic_dedup
    // / cluster_purity / item_similarity_incremental / item_pagerank_
    // incremental all off the flag list entirely (memo + single-manifest
    // fixes landed driver-side).
    "cross_source_dups" -> ("fixed round 16: the 8.0x is the r15 DRIVER " +
      "number (1.66 s, pre-memo binary) against the NEW local median " +
      "(0.21 s) — the query now serves its (doc_a, doc_b) truth set from " +
      "the dedup_eval content memo instead of re-running the tau=0.35 " +
      "pair join (in-registry 4.13 -> 0.21 s locally); clears when " +
      "BENCH_r16 lands driver-side"),
    "video_clusters" -> ("fixed round 15: the r14 3.7x (2.75 driver / " +
      "0.75 local) is the cross_modal footprint class — the per-FRAME " +
      "video scan cache plus the fingerprint frames were held through " +
      "the components pass; the consumer now scopes the pipeline, " +
      "checkpoints the slim (doc_id) / (doc_a, doc_b) frames and " +
      "releases every decode cache before cluster resolution. BenchOne " +
      "steady ~1.9 s on a quiet box both before and after (the win is " +
      "concurrent footprint, not quiet-box wall); canary slot " +
      "registered for adjudication"),
    "image_index_incremental" -> ("fixed round 15: the delta decode was " +
      "a bare .cache() leaked for the JVM lifetime — now an eager " +
      "localCheckpoint (serve plan carries NO documents scan, pinned in " +
      "ArtifactJobsSpec). Local medians under the r15 binary: " +
      "0.85/0.79/0.43 across the three reference runs (was 0.72 kept-" +
      "r14); the r14 driver 1.81 predates the fix. Canary slot " +
      "registered"),
    "multimodal_pairs" -> ("flags only because the LOCAL median dropped " +
      "3.0 -> 1.6-2.0 s (consistent across all three r15 reference " +
      "runs) under the r15 registry-wide cache scoping — its own code " +
      "is unchanged; it shared executor-storage eviction pressure with " +
      "the formerly-unscoped image/video pipeline caches inside a " +
      "220-query run. The r14 driver 5.48 predates that scoping; the " +
      "r14 verdict already audited its plan clean (shared decode pass, " +
      "int-keyed join, captions never touch pixels)"))

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
    // r11 entries adjudicated by BENCH_r12 and pruned per the map's
    // contract: churn_rates 0.23 s (1.2x), curation_screened 0.71 s
    // (1.3x), cohort_ltv 1.00 s (1.2x), keyword_search 0.72 s (1.4x),
    // coreset_kcenter 0.86 s (0.9x), rrf_fusion 1.55 s (1.1x),
    // item_pagerank_incremental 1.64 s (1.6x), diversity_sample 1.58 s
    // (1.3x) all cleared the threshold with quiet slot canaries —
    // the r11 "3x-slower container" attribution proven; the remaining
    // r11 entries (quality_from_artifact, pq_codes_from_artifact,
    // retention_cohorts, asof_join, ann_cosine_topk, doc_packing,
    // vocab_coverage, tokenizer_fertility) fell out of BENCH_r12's
    // surviving query set entirely and their localbench ratios are
    // clean. semantic_dedup_from_artifact moved to KnownFixed (the r13
    // warm pass addresses its real first-run component).
    "attribution" -> ("r12 1.57 s vs 0.47 local (3.3x) WITH slot canary " +
      "0.32 s vs 0.113 canary_med — the constant-work scan stalled ~3x " +
      "in the same slot, proving the r11 env attribution per the canary " +
      "contract; keyed joins + bounded window, nothing to replan"),
    "ann_cosine_topk" -> ("r14 1.34 s vs 0.31 local (4.3x): BenchOne " +
      "r15 quiet-box descent 4.07 -> 1.02 -> 0.90 -> 0.72 -> 0.66 s — " +
      "steady ~0.7-0.9 in a FRESH JVM (the r13 ~2x fresh-vs-registry " +
      "instrument factor over the 0.31 in-registry local), so the 1.34 " +
      "driver median is that steady state under a run whose canary_max " +
      "hit 0.378 (3.3x canary_med — proven load windows). Plan is the " +
      "bounded query-side broadcast brute-force baseline, PLANAUDIT " +
      "clean, no caches on the path to slim. Canary slot registered — " +
      "if the slot canary spikes next round the attribution is proven; " +
      "if it stays flat at >3x this entry comes back out to forensics"),
    "thumbnail_match" -> ("driver 4.05 vs kept-run local 1.11 is SWING " +
      "on both sides, not a regression: the query's three r15 reference " +
      "runs read 3.28/1.97/1.11 s (the r14 rule — top-cost queries " +
      "swing 2-3x between whole reference runs) and the r13/r14 locals " +
      "were ~5.3; the r14 VERDICT already adjudicated the driver 4.05 " +
      "as BELOW the then-local median with the plan audited clean " +
      "(parity-tagged banded Hamming self-join, anchor blocking " +
      "lossless). No code change this round; re-adjudicate only if the " +
      "next driver median exceeds its own r14 value"))

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
