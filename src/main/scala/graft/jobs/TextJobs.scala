package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TextAnalysis
import graft.ops.Eager.EagerOps

/** Text-analysis queries over `documents`: token/quality stats, language-ID,
  * content fingerprinting. All single-pass scans — no shuffle at all except
  * the aggregation-free project, so they scale linearly with the corpus.
  */
object TextJobs {

  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val t = col("text")
    val nTok = TextAnalysis.tokenCount(t)
    val nStop = TextAnalysis.stopwordCount(t)
    d.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      TextAnalysis.bpeishCount(t).as("n_bpeish"),
      nStop.as("n_stopwords"),
      TextAnalysis.punctCount(t).as("n_punct"),
      TextAnalysis.qualityScore(nTok, nStop).as("quality"))
  }

  val textStatsSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
      |  CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
      |  CAST(length(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|on|for|with)\b')) AS BIGINT) AS n_stopwords,
      |  CAST(length(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_punct,
      |  ROUND(
      |    least(CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE) / 100.0, 1.0) * 0.6 +
      |    (CAST(length(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|on|for|with)\b')) AS DOUBLE)
      |      / CAST(greatest(length(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) AS DOUBLE)) * 0.4
      |    + 1e-9, 4) AS quality
      |FROM documents""".stripMargin

  def textLangid(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val scoreCols = TextAnalysis.langScores(col("text"))
      .map { case (l, c) => c.as(s"score_$l") }
    d.select(
      (Seq(col("doc_id"), col("lang"),
        TextAnalysis.predictedLang(col("text")).as("pred_lang")) ++ scoreCols): _*)
  }

  val textLangidSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (l, pat) =>
      s"CAST(length(regexp_extract_all(text, '$pat')) AS BIGINT) AS score_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs
      .map(l => s"WHEN score_$l > 0 AND score_$l = $best THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH s AS (
       |  SELECT doc_id, lang, $scores
       |  FROM documents
       |)
       |SELECT doc_id, lang, $caseChain AS pred_lang,
       |       ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM s""".stripMargin
  }

  /** Language-ID evaluation: the confusion matrix of [[textLangid]]'s
    * prediction against the labeled `lang` column, with exact per-truth
    * recall — the eval table a pipeline reads before trusting a langid
    * gate. One scan + one (|langs|²)-sized aggregation; the rate is the
    * usual one exact double division.
    */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    // both the per-truth totals and the confusion cells read this frame —
    // cache the (lang, pred_lang) projection so the document scan and the
    // per-language regex marker counts run once (house pattern for shared
    // derived frames, cf. vocabCoverage/heavyHitters)
    val d = Tables.documents(spark, sfDir)
      .select(col("lang"),
        TextAnalysis.predictedLang(col("text")).as("pred_lang"))
      .cache()
    val totals = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    d.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .join(totals, "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("n_lang") + lit(1e-9), 4)
          .as("rate"))
  }

  val langConfusionSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (l, pat) =>
      s"CAST(length(regexp_extract_all(text, '$pat')) AS BIGINT) AS score_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs
      .map(l => s"WHEN score_$l > 0 AND score_$l = $best THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH s AS (
       |  SELECT lang, $caseChain AS pred_lang FROM (
       |    SELECT lang, text, $scores FROM documents)
       |), c AS (
       |  SELECT lang, pred_lang, COUNT(*) AS n FROM s GROUP BY 1, 2
       |), t AS (
       |  SELECT lang, COUNT(*) AS n_lang FROM s GROUP BY 1
       |)
       |SELECT c.lang, c.pred_lang, c.n,
       |       ROUND(CAST(c.n AS DOUBLE) / t.n_lang + 1e-9, 4) AS rate
       |FROM c JOIN t USING (lang)""".stripMargin
  }

  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))

  val docFingerprintSql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents""".stripMargin

  private val VOCAB_K = 20

  /** Vocabulary building: top-20 tokens per language by corpus frequency
    * (lowercased, same tokenizer as `text_stats`). Explode → two-phase
    * count (partial agg absorbs the token explosion map-side) → per-lang
    * rank with WindowGroupLimit early cutoff — the vocab pass of a
    * tokenizer-training pipeline.
    */
  def vocabTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    val counts = words.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("n"))
    graft.ops.TopN.topNPer(counts, col("lang"), col("n"), col("token"), VOCAB_K)
  }

  val vocabTopKSql: String =
    s"""WITH t AS (
       |  SELECT lang, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), c AS (
       |  SELECT lang, token, COUNT(*) AS n FROM t GROUP BY 1, 2
       |)
       |SELECT lang, token, n, rn FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY lang ORDER BY n DESC, token ASC) AS rn
       |  FROM c) r
       |WHERE rn <= $VOCAB_K""".stripMargin

  private val BPE_ROUNDS = 6

  /** BPE tokenizer training: `BPE_ROUNDS` rounds of count-adjacent-pairs →
    * merge the argmax — the merge-LEARNING step a tokenizer pipeline runs
    * after [[vocabTopK]]'s counting pass. Output: one row per round,
    * (round, left_sym, right_sym, pair_count) — the learned merge table.
    *
    * Scale shape: the corpus contributes ONE tokenize + two-phase word
    * count; every merge round then runs on the compressed (word, cnt)
    * vocab frame (distinct words — orders of magnitude smaller than a
    * 100 TB corpus, the standard BPE training compression). Per round:
    * pair counts ride a vocab-sized aggregation, the argmax is a global
    * `orderBy.limit(1)` (TakeOrderedAndProject, count-desc with full
    * lexicographic tie-break), and the merge applies via a broadcast
    * crossJoin + codegen `replace` — no driver-side data, no typed map.
    *
    * The merge-round loop deliberately runs INSIDE one task (coalesce(1) +
    * `mapPartitions`), not as k chained DataFrame rounds: each distributed
    * round would pay ~3 exchanges + a cache of a frame that fits in one
    * task (measured 7.9 s for 6 rounds at sf0.1, ~all scheduling fixed
    * cost), while the global-argmax recurrence is inherently sequential —
    * there is no parallelism to buy. This is the standard industrial
    * trainer shape (SentencePiece/HF tokenizers hold the word-count table
    * of arbitrarily large corpora on one node); a 100 TB corpus caps the
    * vocab with a frequency floor first, which composes here as a HAVING
    * on the distributed count. Greedy left-to-right pair replacement and
    * full (count desc, left, right) lexicographic tie-breaks are
    * deterministic and ASCII-collation-identical in both engines.
    */
  /** The in-memory trainer pass shared by [[bpeMerges]] and [[bpeEncode]]:
    * up to `rounds` greedy merge rounds over (word, symbols, count),
    * returning the merge table and the final symbolization. Stops early
    * when no adjacent pair remains.
    */
  private def trainBpeRounds(
      vocab0: Array[(String, Array[String], Long)], rounds: Int)
      : (List[(Long, String, String, Long)],
         Array[(String, Array[String], Long)]) = {
    var vocab = vocab0
    val merges = List.newBuilder[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (_, syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax with the full deterministic tie-break:
        // count desc, left asc, right asc
        val ((l, rr), c) = counts.minBy { case ((a, b), v) => (-v, a, b) }
        vocab = vocab.map { case (w, syms, c0) =>
          val merged = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              merged += l + rr; i += 2 // greedy left-to-right, non-overlapping
            } else { merged += syms(i); i += 1 }
          }
          (w, merged.result(), c0)
        }
        merges += ((r.toLong, l, rr, c))
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  /** The distributed corpus stage both BPE queries share: one tokenize +
    * two-phase word count.
    */
  private def wordCounts(spark: SparkSession, sfDir: String,
      docFilter: Column = lit(true)): DataFrame =
    Tables.documents(spark, sfDir)
      .where(docFilter)
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Driver-held trained-BPE memo, keyed by the corpus fingerprint (the
    * [[rocchioModel]] discipline): (merge table, encoder table). Training
    * still runs as ONE distributed word count + a single-task trainer;
    * only its OUTPUTS are collected — merge-table- and vocab-sized, the
    * same memory contract as the broadcast every scoring join already
    * ships. Registry consumers (`bpe_merges`, `bpe_encode`,
    * `tokenizer_compare`, `bpe_greedy`, the artifact twins) share ONE
    * training pass per corpus per JVM instead of retraining each.
    */
  private val bpeMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, String, String, Long)], Seq[(String, Long)])]()

  /** `tag`/`docFilter` select a sub-corpus training run (the
    * [[tokenizerEval]] train split) under its own memo key; the defaults
    * are the full-corpus model every existing consumer shares.
    */
  private[jobs] def bpeModel(spark: SparkSession, sfDir: String,
      tag: String = "", docFilter: Column = lit(true))
      : (Seq[(Long, String, String, Long)], Seq[(String, Long)]) =
    bpeMemo.computeIfAbsent(docsFingerprint(sfDir) + tag, _ => {
      import spark.implicits._
      // one wire row for both outputs: kind 0 = merge, kind 1 = encoder
      val rows = wordCounts(spark, sfDir, docFilter).as[(String, Long)]
        .coalesce(1).mapPartitions { it =>
          val vocab0 = it.map { case (w, c) =>
            (w, w.toCharArray.map(_.toString): Array[String], c)
          }.toArray
          val (merges, vocab) = trainBpeRounds(vocab0, BPE_ROUNDS)
          merges.iterator.map { case (r, l, rr, c) => (0, r, l, rr, c) } ++
            vocab.iterator.map { case (w, syms, _) =>
              (1, 0L, w, "", syms.length.toLong)
            }
        }.collect()
      (rows.toSeq.collect { case (0, r, l, rr, c) => (r, l, rr, c) },
        rows.toSeq.collect { case (1, _, w, _, n) => (w, n) })
    })

  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bpeModel(spark, sfDir)._1.toDF("round", "left_sym", "right_sym",
      "pair_count")
  }

  /** Tokenize-under-the-learned-tokenizer accounting — the number a
    * training pipeline actually consumes from BPE: per document, how many
    * tokens the [[bpeMerges]] merge table yields, vs whitespace words.
    * The trainer's final vocab IS the encoder (every corpus word's
    * symbolization after k merges), so encoding a document is a
    * vocab-lookup: explode words → pre-aggregate per-(doc, word) → join
    * the (word → n_syms) table on 60-bit int keys → per-doc sums. The
    * corpus never re-tokenizes per merge, text never shuffles, and the
    * single-task trainer output joins back as an ordinary (broadcastable,
    * vocab-sized) relation.
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame =
    bpeEncodeWith(spark, sfDir,
      bpeEncoderTable(spark, sfDir)
        .select(hash60(col("w")).as("wh"), col("n_syms")))

  /** The trained tokenizer as a persistable artifact: (w, n_syms) — each
    * corpus word's symbol count after [[BPE_ROUNDS]] merges. Vocab-sized
    * (broadcastable); [[ArtifactJobs]] writes it to parquet and scores
    * from the load.
    */
  private[jobs] def bpeEncoderTable(
      spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bpeModel(spark, sfDir)._2.toDF("w", "n_syms")
  }

  /** Both engines fence BPE inference to words this long or shorter (the
    * unigram rule: the oracle's CTE chain is bounded by construction;
    * the corpus' longest word is 8 chars, so nothing real is excluded).
    */
  private val BPE_GREEDY_MAX_WORD = 12

  /** GPT-2/SentencePiece-style BPE INFERENCE for UNSEEN words: apply the
    * learned merge table in rank order to a word the trainer never saw.
    * [[bpeEncode]] can only serve training-corpus words (the final vocab
    * IS its encoder); production serving segments arbitrary text, and
    * this gate checks that apply-merges loop. Serve set: every corpus
    * word REVERSED — deterministic in both engines (`reverse` is exact),
    * mostly OOV, and length-matched to the training distribution.
    *
    * Equivalence note (why one pass per rank suffices): the reference
    * loop is "repeatedly merge the lowest-ranked pair present". Fusing
    * two symbols removes a boundary but never a symbol, so it cannot
    * create a NEW adjacency between two symbols that both predate the
    * fusion — and a pair's component symbols always predate the pair's
    * own rank. Hence once rank r is exhausted it can never reapply, and
    * ascending rank order with one exhaustive greedy left-to-right pass
    * each is exactly the reference loop — restatable as k sequential
    * `replace()` CTEs over the `|a||b|` delimited form (the
    * [[bpeVocabCtes]] discipline) and hash-checkable.
    *
    * Scale shape: one distributed word count; the merge table ships in
    * the closure (6 rows); the apply loop is per-row O(len·k).
    */
  def bpeGreedy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val merges = bpeModel(spark, sfDir)._1.map { case (_, l, r, _) => (l, r) }
    wordCounts(spark, sfDir)
      .filter(length(col("w")) <= BPE_GREEDY_MAX_WORD)
      .select(reverse(col("w")).as("w"))
      .as[String]
      .map { w =>
        val syms = bpeApplyMerges(w, merges)
        (w, syms.length.toLong, syms.mkString("|"))
      }.toDF("w", "n_tokens", "seg")
  }

  /** One greedy left-to-right pass per merge, ascending rank. */
  private[graft] def bpeApplyMerges(
      w: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = w.toCharArray.map(_.toString)
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** The scoring half of [[bpeEncode]]: per-doc token accounting against
    * an encoder lookup table (wh, n_syms) — in-line trained or loaded.
    */
  private[jobs] def bpeEncodeWith(spark: SparkSession, sfDir: String,
      enc: DataFrame): DataFrame = {
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("doc_id"), hash60(col("w")).as("wh"))
      .agg(count(lit(1)).as("k"))
    dw.join(enc, "wh")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("n_syms")).as("n_bpe_tokens"),
        round(sum(col("k") * col("n_syms")).cast("double") / sum(col("k"))
          + lit(1e-9), 4).as("tokens_per_word"))
  }

  /** The k merge rounds unrolled as CTE triples (the `cent$KM_ITERS`
    * discipline) — `p_r` recounts pairs from `v_{r-1}`, `m_r` takes the
    * deterministic argmax, `v_r` applies the merge with the same
    * `replace` semantics, carrying the original word through for the
    * encoder's lookup. Shared by the merges and encode oracles.
    */
  private def bpeVocabCtesFor(docWhere: String): String = {
    val roundCtes = (1 to BPE_ROUNDS).map { r =>
      s"""p$r AS (
         |  SELECT s[i] AS left_sym, s[i + 1] AS right_sym,
         |         CAST(SUM(cnt) AS BIGINT) AS pair_count
         |  FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i
         |        FROM (SELECT string_split(substr(repr, 2, length(repr) - 2),
         |                       '||') AS s, cnt
         |              FROM v${r - 1}))
         |  GROUP BY 1, 2
         |), m$r AS (
         |  SELECT left_sym, right_sym, pair_count FROM p$r
         |  ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT 1
         |), v$r AS (
         |  -- LEFT JOIN ON TRUE: an exhausted merge table (m empty before
         |  -- round k) must pass the vocab through unchanged, not empty it
         |  SELECT w, COALESCE(replace(repr,
         |           '|' || m.left_sym || '||' || m.right_sym || '|',
         |           '|' || m.left_sym || m.right_sym || '|'), repr) AS repr, cnt
         |  FROM v${r - 1} LEFT JOIN m$r m ON TRUE
         |)""".stripMargin
    }.mkString(", ")
    s"""wc AS (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $docWhere)
       |  GROUP BY w
       |), v0 AS (
       |  SELECT w, substr('|' || regexp_replace(w, '(.)', '\\1||', 'g'),
       |           1, 3 * length(w)) AS repr, cnt
       |  FROM wc
       |), $roundCtes""".stripMargin
  }

  private val bpeVocabCtes: String = bpeVocabCtesFor("")

  val bpeMergesSql: String = {
    val out = (1 to BPE_ROUNDS).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, left_sym, right_sym, pair_count FROM m$r"
    }.mkString("\nUNION ALL ")
    s"WITH $bpeVocabCtes\n$out"
  }

  /** Oracle: the final `v_k` symbolization IS the encoder — count its
    * symbols per word and join the documents' word multiplicities.
    */
  val bpeEncodeSql: String =
    s"""WITH $bpeVocabCtes, enc AS (
       |  SELECT w, CAST(len(string_split(substr(repr, 2, length(repr) - 2),
       |           '||')) AS BIGINT) AS n_syms
       |  FROM v$BPE_ROUNDS
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       |       CAST(SUM(k * n_syms) AS BIGINT) AS n_bpe_tokens,
       |       ROUND(CAST(SUM(k * n_syms) AS DOUBLE) / CAST(SUM(k) AS BIGINT)
       |             + 1e-9, 4) AS tokens_per_word
       |FROM dw JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Oracle: the serve words' char-split reprs pushed through the SAME
    * per-round merge tables (`m_r` from [[bpeVocabCtes]]) as k sequential
    * replace CTEs — the rank-order apply loop restated (see
    * [[bpeGreedy]]'s equivalence note).
    */
  val bpeGreedySql: String = {
    val applyCtes = (1 to BPE_ROUNDS).map { r =>
      s"""g$r AS (
         |  SELECT w, COALESCE(replace(repr,
         |           '|' || m.left_sym || '||' || m.right_sym || '|',
         |           '|' || m.left_sym || m.right_sym || '|'), repr) AS repr
         |  FROM g${r - 1} LEFT JOIN m$r m ON TRUE
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $bpeVocabCtes, g0 AS (
       |  SELECT w, substr('|' || regexp_replace(w, '(.)', '\\1||', 'g'),
       |           1, 3 * length(w)) AS repr
       |  FROM (SELECT reverse(w) AS w FROM wc
       |        WHERE length(w) <= $BPE_GREEDY_MAX_WORD)
       |), $applyCtes
       |SELECT w,
       |  CAST(len(string_split(substr(repr, 2, length(repr) - 2), '||'))
       |    AS BIGINT) AS n_tokens,
       |  replace(substr(repr, 2, length(repr) - 2), '||', '|') AS seg
       |FROM g$BPE_ROUNDS""".stripMargin
  }

  // ---- WordPiece tokenizer trainer ----

  private val WP_ROUNDS = 6

  /** Fixed-point scale for the WordPiece likelihood-ratio score. The
    * WordPiece merge criterion is count(ab) / (count(a)·count(b)) — a
    * rational — and float division is the one place the two engines could
    * disagree in the last ulp, so BOTH compute the score as the floored
    * 2^38-scaled integer `(pair_count << 38) / (cnt_a · cnt_b)` and
    * tie-break (left, right) lexicographically. 38 bits keep every
    * intermediate inside BIGINT at any realistic corpus: the numerator is
    * bounded by total-corpus character pairs (< 2^25 even at sf=1) times
    * 2^38 < 2^63, and the denominator by (total chars)^2 < 2^50.
    */
  private val WP_SCORE_SHIFT = 38

  /** Word-initial symbol plain, every continuation symbol `##`-prefixed —
    * the WordPiece convention: `"abc"` → `["a", "##b", "##c"]`. Merging
    * (l, r) concatenates l with r's payload (`##` stripped), so the
    * merged symbol keeps `##` iff l was itself a continuation.
    */
  private def wpInitSyms(w: String): Array[String] =
    Array.tabulate(w.length) { i =>
      if (i == 0) w.substring(0, 1) else "##" + w.charAt(i)
    }

  /** WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
    * tokenizer): same greedy-merge loop as [[trainBpeRounds]] but the
    * argmax is the LIKELIHOOD score count(ab)/(count(a)·count(b)) — the
    * pair whose merge most improves a unigram LM over symbols — rather
    * than raw pair frequency, computed in scaled-integer form
    * ([[WP_SCORE_SHIFT]]) so both engines land on identical merges.
    * Symbol counts are recomputed from the current symbolization every
    * round (they shift as merges absorb occurrences). Stops early when
    * no adjacent pair remains.
    */
  private def trainWordPieceRounds(
      vocab0: Array[(String, Array[String], Long)], rounds: Int)
      : (List[(Long, String, String, Long, Long)],
         Array[(String, Array[String], Long)]) = {
    var vocab = vocab0
    val merges = List.newBuilder[(Long, String, String, Long, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (_, syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        def score(a: String, b: String, pc: Long): Long =
          (pc << WP_SCORE_SHIFT) / (symCounts(a) * symCounts(b))
        val ((l, rr), pc) = pairCounts.minBy { case ((a, b), v) =>
          (-score(a, b, v), a, b)
        }
        val mergedSym = l + rr.stripPrefix("##")
        vocab = vocab.map { case (w, syms, c0) =>
          val merged = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              merged += mergedSym; i += 2 // greedy left-to-right
            } else { merged += syms(i); i += 1 }
          }
          (w, merged.result(), c0)
        }
        merges += ((r.toLong, l, rr, pc, score(l, rr, pc)))
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  /** The learned WordPiece merge table: one row per round,
    * (round, left_sym, right_sym, pair_count, score_fp) — the third
    * tokenizer algorithm beside [[bpeMerges]] (frequency argmax) and
    * [[unigramVocab]] (EM pruning). Scale shape is identical to BPE: the
    * corpus contributes the ONE distributed tokenize + word count; the
    * merge rounds are a sequential recurrence over the vocab-sized
    * (word, cnt) table and run inside one task (coalesce(1), the round-6
    * rule — k distributed rounds would be pure exchange scheduling).
    */
  /** Driver-held trained-WordPiece memo — the [[bpeModel]] contract:
    * (merge table, encoder table), trained once per corpus per JVM by the
    * same distributed-count + single-task pass, collected at merge-table/
    * vocab size.
    */
  private val wpMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, String, String, Long, Long)], Seq[(String, Long)])]()

  private[jobs] def wordpieceModel(spark: SparkSession, sfDir: String,
      tag: String = "", docFilter: Column = lit(true))
      : (Seq[(Long, String, String, Long, Long)], Seq[(String, Long)]) =
    wpMemo.computeIfAbsent(docsFingerprint(sfDir) + tag, _ => {
      import spark.implicits._
      val rows = wordCounts(spark, sfDir, docFilter).as[(String, Long)]
        .coalesce(1).mapPartitions { it =>
          val vocab0 = it.map { case (w, c) => (w, wpInitSyms(w), c) }.toArray
          val (merges, vocab) = trainWordPieceRounds(vocab0, WP_ROUNDS)
          merges.iterator.map { case (r, l, rr, pc, sc) =>
            (0, r, l, rr, pc, sc)
          } ++ vocab.iterator.map { case (w, syms, _) =>
            (1, 0L, w, "", syms.length.toLong, 0L)
          }
        }.collect()
      (rows.toSeq.collect { case (0, r, l, rr, pc, sc) => (r, l, rr, pc, sc) },
        rows.toSeq.collect { case (1, _, w, _, n, _) => (w, n) })
    })

  def wordpieceMerges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wordpieceModel(spark, sfDir)._1
      .toDF("round", "left_sym", "right_sym", "pair_count", "score_fp")
  }

  /** The trained WordPiece tokenizer as a persistable artifact:
    * (w, n_syms) — each corpus word's symbol count after [[WP_ROUNDS]]
    * likelihood-scored merges. Vocab-sized (broadcastable);
    * [[ArtifactJobs]] round-trips it through parquet.
    */
  private[jobs] def wordpieceEncoderTable(
      spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wordpieceModel(spark, sfDir)._2.toDF("w", "n_syms")
  }

  /** Token accounting under the trained WordPiece tokenizer — the
    * [[bpeEncode]] shape: explode words → per-(doc, word) counts → join
    * the vocab-sized encoder on 60-bit int keys → per-doc sums. The
    * corpus never re-symbolizes per merge round.
    */
  def wordpieceEncode(spark: SparkSession, sfDir: String): DataFrame =
    wordpieceEncodeWith(spark, sfDir,
      wordpieceEncoderTable(spark, sfDir)
        .select(hash60(col("w")).as("wh"), col("n_syms")))

  /** The scoring half of [[wordpieceEncode]] against an encoder lookup
    * table (wh, n_syms) — in-line trained or loaded from parquet.
    */
  private[jobs] def wordpieceEncodeWith(spark: SparkSession, sfDir: String,
      enc: DataFrame): DataFrame = {
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("doc_id"), hash60(col("w")).as("wh"))
      .agg(count(lit(1)).as("k"))
    dw.join(enc, "wh")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("n_syms")).as("n_wp_tokens"),
        round(sum(col("k") * col("n_syms")).cast("double") / sum(col("k"))
          + lit(1e-9), 4).as("tokens_per_word"))
  }

  /** Oracle-side enumeration stays bounded by construction (the unigram
    * rule: DuckDB enumerates ALL paths, not best-first) — both engines
    * fence the greedy gate to words this long or shorter. The corpus'
    * longest word is 8 chars, so nothing real is excluded.
    */
  private val WP_GREEDY_MAX_WORD = 12

  /** True BERT-style WordPiece INFERENCE over the trained vocabulary:
    * greedy longest-match-first per word (word-initial pieces plain,
    * continuations `##`-prefixed; single chars are always in vocab, so
    * every corpus word segments — no [UNK] path on this fixture). The
    * vocabulary is base symbols + one new symbol per learned merge,
    * which is NOT the same encoder as [[wordpieceEncode]]'s merge-replay:
    * replay can only reach symbolizations its merge history built, while
    * greedy matches any vocab piece at any position — the two happen to
    * coincide on this corpus' training words, but only greedy serves
    * UNSEEN words (the production inference path), and this gate checks
    * that algorithm where the trainer's lookup twin can't.
    *
    * Engine-exactness: greedy longest-match IS the segmentation that
    * lexicographically maximizes the consumed-length sequence, an
    * integer total order — the oracle enumerates all segmentations
    * (bounded: single-char fallback gives ≤ 2^(len−1) paths at
    * [[WP_GREEDY_MAX_WORD]] chars) and takes that argmax, no float
    * anywhere. Scale shape: the trainer's one-task recurrence plus a
    * per-word linear scan; output is vocab-sized.
    */
  def wordpieceGreedy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // model-transform off the memoized trainer: the encoder table's keys
    // ARE the corpus word list, and base-symbol ∪ merged-symbol is the
    // greedy vocabulary — vocab-sized driver work, zero extra corpus pass
    val (merges, enc) = wordpieceModel(spark, sfDir)
    val vocab: Set[String] =
      enc.iterator.flatMap { case (w, _) => wpInitSyms(w) }.toSet ++
        merges.iterator.map { case (_, l, r, _, _) => l + r.stripPrefix("##") }
    enc.map(_._1)
      .filter(_.length <= WP_GREEDY_MAX_WORD)
      .map { w =>
        val pieces = wpGreedySegment(w, vocab)
        (w, pieces.length.toLong, pieces.mkString("|"))
      }.toDF("w", "n_pieces", "seg")
  }

  /** Greedy longest-match-first: at each position take the LONGEST vocab
    * piece matching (with the positional `##` decoration); single chars
    * guarantee progress.
    */
  private def wpGreedySegment(w: String, vocab: Set[String]): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var found: String = null
      var len = w.length - pos
      while (found == null && len >= 1) {
        val cand =
          (if (pos == 0) "" else "##") + w.substring(pos, pos + len)
        if (vocab.contains(cand)) found = cand else len -= 1
      }
      out += found
      pos += len // consumed chars (## prefix excluded)
    }
    out.result()
  }

  /** The WordPiece merge rounds unrolled as CTE quadruples — the
    * [[bpeVocabCtes]] discipline plus a per-round symbol-count CTE
    * (`s_r`, the likelihood denominator) and the scaled-integer score in
    * the argmax. `wv0` decorates continuations with `##`; the merged
    * symbol strips the right side's `##` so the prefix survives iff the
    * left was itself a continuation.
    */
  private def wpVocabCtesFor(docWhere: String): String = {
    val roundCtes = (1 to WP_ROUNDS).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT sym, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT unnest(string_split(substr(repr, 2, length(repr) - 2),
         |             '||')) AS sym, cnt
         |    FROM wv${r - 1})
         |  GROUP BY 1
         |), p$r AS MATERIALIZED (
         |  SELECT s[i] AS left_sym, s[i + 1] AS right_sym,
         |         CAST(SUM(cnt) AS BIGINT) AS pair_count
         |  FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i
         |        FROM (SELECT string_split(substr(repr, 2, length(repr) - 2),
         |                       '||') AS s, cnt
         |              FROM wv${r - 1}))
         |  GROUP BY 1, 2
         |), m$r AS MATERIALIZED (
         |  SELECT left_sym, right_sym, pair_count,
         |         (pair_count * (CAST(1 AS BIGINT) << $WP_SCORE_SHIFT))
         |           // (sl.n * sr.n) AS score_fp,
         |         left_sym || CASE WHEN right_sym LIKE '##%'
         |           THEN substr(right_sym, 3) ELSE right_sym END AS merged
         |  FROM p$r JOIN s$r sl ON sl.sym = p$r.left_sym
         |            JOIN s$r sr ON sr.sym = p$r.right_sym
         |  ORDER BY score_fp DESC, left_sym ASC, right_sym ASC LIMIT 1
         |), wv$r AS MATERIALIZED (
         |  -- LEFT JOIN ON TRUE: an exhausted merge table passes the
         |  -- vocab through unchanged instead of emptying the chain
         |  SELECT w, COALESCE(replace(repr,
         |           '|' || m.left_sym || '||' || m.right_sym || '|',
         |           '|' || m.merged || '|'), repr) AS repr, cnt
         |  FROM wv${r - 1} LEFT JOIN m$r m ON TRUE
         |)""".stripMargin
    }.mkString(", ")
    s"""wc AS (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $docWhere)
       |  GROUP BY w
       |), wv0 AS MATERIALIZED (
       |  SELECT w, '|' || substr(w, 1, 1) || '|' ||
       |         CASE WHEN length(w) > 1 THEN
       |           regexp_replace(substr(w, 2, length(w) - 1),
       |                          '(.)', '|##\\1|', 'g')
       |         ELSE '' END AS repr, cnt
       |  FROM wc
       |), $roundCtes""".stripMargin
  }

  private val wpVocabCtes: String = wpVocabCtesFor("")

  val wordpieceMergesSql: String = {
    val out = (1 to WP_ROUNDS).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, left_sym, right_sym, pair_count, score_fp FROM m$r"
    }.mkString("\nUNION ALL ")
    s"WITH $wpVocabCtes\n$out"
  }

  /** Oracle: the final `wv_k` symbolization IS the encoder — count its
    * symbols per word and join the documents' word multiplicities.
    */
  val wordpieceEncodeSql: String =
    s"""WITH $wpVocabCtes, enc AS (
       |  SELECT w, CAST(len(string_split(substr(repr, 2, length(repr) - 2),
       |           '||')) AS BIGINT) AS n_syms
       |  FROM wv$WP_ROUNDS
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       |       CAST(SUM(k * n_syms) AS BIGINT) AS n_wp_tokens,
       |       ROUND(CAST(SUM(k * n_syms) AS DOUBLE) / CAST(SUM(k) AS BIGINT)
       |             + 1e-9, 4) AS tokens_per_word
       |FROM dw JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Oracle for the greedy gate: the trained vocabulary (base symbols ∪
    * per-round merged symbols), then a recursive enumeration of every
    * positional segmentation; greedy = the lexicographic MAX of the
    * fixed-width consumed-length sequence (`lenseq`), so the argmax is a
    * string comparison — no scores, no floats. Equal `lenseq` implies
    * the identical segmentation (pieces are position+length determined),
    * so the `seg ASC` tie-break is belt-and-braces only.
    */
  val wordpieceGreedySql: String = {
    val mergedUnion = (1 to WP_ROUNDS)
      .map(r => s"SELECT merged AS piece FROM m$r").mkString(" UNION ")
    s"""WITH RECURSIVE $wpVocabCtes, vocab AS MATERIALIZED (
       |  SELECT DISTINCT sym AS piece FROM (
       |    SELECT unnest(string_split(substr(repr, 2, length(repr) - 2),
       |             '||')) AS sym
       |    FROM wv0)
       |  UNION $mergedUnion
       |), gwords AS (
       |  SELECT w FROM wc WHERE length(w) <= $WP_GREEDY_MAX_WORD
       |), reach AS (
       |  SELECT w, 0 AS pos, '' AS lenseq, '' AS seg FROM gwords
       |  UNION ALL
       |  SELECT r.w,
       |         r.pos + length(v.piece) - CASE WHEN r.pos = 0 THEN 0 ELSE 2 END,
       |         r.lenseq || lpad(CAST(length(v.piece)
       |           - CASE WHEN r.pos = 0 THEN 0 ELSE 2 END AS VARCHAR), 2, '0'),
       |         r.seg || '|' || v.piece
       |  FROM reach r JOIN vocab v ON
       |    CASE WHEN r.pos = 0
       |      THEN v.piece NOT LIKE '##%'
       |       AND substr(r.w, 1, length(v.piece)) = v.piece
       |      ELSE v.piece LIKE '##%'
       |       AND substr(r.w, r.pos + 1, length(v.piece) - 2) = substr(v.piece, 3)
       |    END
       |  WHERE r.pos < length(r.w)
       |)
       |SELECT w, CAST(length(lenseq) // 2 AS BIGINT) AS n_pieces,
       |       substr(seg, 2, length(seg)) AS seg
       |FROM (
       |  SELECT w, lenseq, seg, ROW_NUMBER() OVER (PARTITION BY w
       |    ORDER BY lenseq DESC, seg ASC) AS rn
       |  FROM reach WHERE pos = length(w)) b
       |WHERE rn = 1""".stripMargin
  }

  // ---- unigram-LM (SentencePiece-style) tokenizer trainer ----

  private val UNI_MAX_WORD = 10
  private val UNI_MAX_PIECE = 4
  private val UNI_SEED_MULTI = 40
  private val UNI_EM_ROUNDS = 2
  private val UNI_TOP_V = 24

  /** SentencePiece-style UNIGRAM tokenizer trainer, hard-EM (Viterbi)
    * form — the second major tokenizer algorithm beside [[bpeMerges]]:
    * seed a candidate vocabulary from substring statistics, then
    * alternate (a) Viterbi-segment every word under the current piece
    * scores and (b) re-score pieces by their segmentation usage, pruning
    * multi-char pieces that fall out of use (single chars survive — the
    * coverage guarantee).
    *
    * Engine-exactness: true unigram EM maximizes Σ log p(piece), and
    * `ln` is the one libm call whose last ulp differs across engines
    * (the [[lmSurprise]] rule), so the Viterbi objective here is the
    * integer total order (fewest pieces, then highest score sum, then
    * lexicographically-least segmentation string) — deterministic,
    * restatable in SQL, and compression-seeking in the same direction
    * (hard-EM with Viterbi counts is the recognized variant; the
    * log-prob weighting changes WHICH optimum EM converges to, not the
    * algorithm shape).
    *
    * Scale shape: identical to BPE — the corpus contributes the ONE
    * distributed tokenize + word count; seed statistics, EM rounds and
    * the Viterbi DP all run on the vocab-sized (word, cnt) table inside
    * one task (a sequential recurrence buys no parallelism —
    * coalesce(1), the round-6 rule; a 100 TB corpus caps the vocab with
    * a frequency floor in the distributed count first).
    */
  private[jobs] def uniWords(
      vocab0: Array[(String, Long)]): Array[(String, Long)] =
    vocab0.filter { case (w, _) => w.nonEmpty && w.length <= UNI_MAX_WORD }

  /** The FULL final piece scores (chars + EM survivors) — the model the
    * encoder segments under; [[trainUnigram]] is its top-V projection.
    */
  private[jobs] def trainUnigramScores(
      words: Array[(String, Long)]): Map[String, Long] = {
    // seed: every substring OCCURRENCE (start position) of length 1..4
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(UNI_MAX_PIECE, w.length - i)) {
      val p = w.substring(i, i + l)
      seed.update(p, seed.getOrElse(p, 0L) + c)
    }
    val chars = seed.keys.filter(_.length == 1).toSeq.sorted
    val multi = seed.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, f) => (-f, p) }.take(UNI_SEED_MULTI).map(_._1)
    var vocab: Seq[String] = chars ++ multi
    var scores: Map[String, Long] = vocab.map(p => p -> seed(p)).toMap
    for (_ <- 1 to UNI_EM_ROUNDS) {
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words; p <- viterbi(w, scores))
        usage.update(p, usage.getOrElse(p, 0L) + c)
      vocab = vocab.filter(p => p.length == 1 || usage.contains(p))
      scores = vocab.map(p => p -> usage.getOrElse(p, 0L)).toMap
    }
    scores
  }

  private[graft] def trainUnigram(
      vocab0: Array[(String, Long)]): Seq[(String, Long)] =
    trainUnigramScores(uniWords(vocab0)).toSeq
      .sortBy { case (p, u) => (-u, p) }.take(UNI_TOP_V)

  /** Viterbi segmentation under the integer objective: minimize
    * (piece count, −score sum, segmentation string) lexicographically.
    * Single chars are always in scope, so every position is reachable.
    */
  private def viterbi(w: String, scores: Map[String, Long]): List[String] = {
    final case class Best(k: Int, s: Long, seg: String, pieces: List[String])
    def better(a: Best, b: Best): Boolean =
      a.k < b.k || (a.k == b.k &&
        (a.s > b.s || (a.s == b.s && a.seg < b.seg)))
    val dp = new Array[Best](w.length + 1)
    dp(0) = Best(0, 0L, "", Nil)
    var i = 1
    while (i <= w.length) {
      var best: Best = null
      var l = 1
      while (l <= math.min(UNI_MAX_PIECE, i)) {
        val p = w.substring(i - l, i)
        if (dp(i - l) != null) scores.get(p).foreach { sc =>
          val prev = dp(i - l)
          val cand =
            Best(prev.k + 1, prev.s + sc, prev.seg + "|" + p, p :: prev.pieces)
          if (best == null || better(cand, best)) best = cand
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    dp(w.length).pieces.reverse
  }

  /** The trained unigram vocabulary: (piece, usage) — final EM-round
    * Viterbi usage counts, top [[UNI_TOP_V]] by (usage desc, piece asc).
    */
  /** Driver-held trained-unigram memo — the [[bpeModel]] contract:
    * (top-V vocabulary, encoder table), one training pass per corpus per
    * JVM shared by `unigram_vocab`/`unigram_encode*`/`tokenizer_compare`
    * and the artifact twin.
    */
  private val uniMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)])]()

  /** (top-V vocab, encoder table, FULL final scores). The third element
    * is the complete `v2` piece-score map — what [[viterbi]] actually
    * segments under; [[tokenizerEval]] serves HELD-OUT words, which
    * the (train-word → count) encoder table cannot answer.
    */
  private[jobs] def unigramModel(spark: SparkSession, sfDir: String,
      tag: String = "", docFilter: Column = lit(true))
      : (Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)]) =
    uniMemo.computeIfAbsent(docsFingerprint(sfDir) + tag, _ => {
      import spark.implicits._
      val rows = wordCounts(spark, sfDir, docFilter).as[(String, Long)]
        .coalesce(1).mapPartitions { it =>
          val words = uniWords(it.toArray)
          val scores = trainUnigramScores(words)
          val topV = scores.toSeq
            .sortBy { case (p, u) => (-u, p) }.take(UNI_TOP_V)
          topV.iterator.map { case (p, u) => (0, p, u) } ++
            words.iterator.map { case (w, _) =>
              (1, w, viterbi(w, scores).length.toLong)
            } ++
            scores.iterator.map { case (p, s) => (2, p, s) }
        }.collect()
      (rows.toSeq.collect { case (0, p, u) => (p, u) },
        rows.toSeq.collect { case (1, w, n) => (w, n) },
        rows.toSeq.collect { case (2, p, s) => (p, s) })
    })

  def unigramVocab(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    unigramModel(spark, sfDir)._1.toDF("piece", "usage")
  }

  /** The trained unigram tokenizer as a persistable artifact:
    * (w, n_pieces) — each trainer word's Viterbi piece count under the
    * FULL final scores (not the top-V projection). Vocab-sized;
    * [[ArtifactJobs]] round-trips it through parquet.
    */
  private[jobs] def unigramEncoderTable(
      spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    unigramModel(spark, sfDir)._2.toDF("w", "n_pieces")
  }

  /** Token accounting under the trained unigram tokenizer — the unigram
    * sibling of [[bpeEncode]], same scale shape: the single-task trainer
    * output joins back as a vocab-sized (broadcastable) relation on
    * 60-bit int keys; the corpus never re-segments per EM round. Words
    * longer than [[UNI_MAX_WORD]] are outside the trainer's scope and
    * drop from the accounting via the encoder join (this corpus' longest
    * word is 8 chars, well inside the cap).
    */
  def unigramEncode(spark: SparkSession, sfDir: String): DataFrame =
    unigramEncodeWith(spark, sfDir,
      unigramEncoderTable(spark, sfDir)
        .select(hash60(col("w")).as("wh"), col("n_pieces")))

  /** The scoring half of [[unigramEncode]] against an encoder lookup
    * table (wh, n_pieces) — in-line trained or loaded from parquet.
    */
  private[jobs] def unigramEncodeWith(spark: SparkSession, sfDir: String,
      enc: DataFrame): DataFrame = {
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("doc_id"), hash60(col("w")).as("wh"))
      .agg(count(lit(1)).as("k"))
    dw.join(enc, "wh")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("n_pieces")).as("n_unigram_pieces"),
        round(sum(col("k") * col("n_pieces")).cast("double") / sum(col("k"))
          + lit(1e-9), 4).as("pieces_per_word"))
  }

  /** Serve-time vocab cap for the byte-fallback gate: encoder entries for
    * words ≤ 6 chars only, so this corpus' 7–8-char words genuinely take
    * the fallback path (the round-6 rule — register the fence at an
    * operating point the fixture exercises; with the trainer's own 10-char
    * scope nothing here is OOV and the fallback would be dead code under
    * the gate).
    */
  private val UNI_FB_MAX = 6

  /** [[unigramEncode]] with SentencePiece-style byte-fallback accounting:
    * the encoder join goes LEFT, and a word with no vocabulary entry
    * contributes length(w) pieces — its bytes (ASCII tokens, 1 byte per
    * char) — instead of dropping from the accounting. Token accounting
    * becomes TOTAL: n_words counts every token, n_oov_words counts the
    * fallback ones. Exactness is trivial (COALESCE to an integer length —
    * no scoring arithmetic on the fallback path), which is why this gate
    * exists; a probabilistic fallback score would force float drift.
    */
  def unigramEncodeFallback(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = unigramEncoderTable(spark, sfDir)
      .filter(length(col("w")) <= UNI_FB_MAX)
      .select(hash60(col("w")).as("wh"), col("n_pieces"))
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("doc_id"), hash60(col("w")).as("wh"))
      .agg(count(lit(1)).as("k"), max(length(col("w"))).as("wlen"))
    dw.join(enc, Seq("wh"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * coalesce(col("n_pieces"), col("wlen")))
          .as("n_pieces_total"),
        sum(when(col("n_pieces").isNull, col("k")).otherwise(0L))
          .as("n_oov_words"),
        round(sum(col("k") * coalesce(col("n_pieces"), col("wlen")))
          .cast("double") / sum(col("k")) + lit(1e-9), 4)
          .as("pieces_per_word"))
  }

  /** One Viterbi-EM round in SQL: recursive path enumeration over
    * `uwords` against vocabulary `v` (words are ≤ 10 chars, so paths are
    * bounded), best segmentation by the same (pieces, −score,
    * segmentation) total order as the Scala DP, then usage counts.
    * `best$r` also carries the piece count `np` for the encoder oracle.
    */
  private def uniReachCte(r: Int, v: String,
      src: String = "uwords"): String =
    s"""reach$r AS (
       |  SELECT w, cnt, 0 AS pos, 0 AS k, CAST(0 AS BIGINT) AS s,
       |         '' AS seg
       |  FROM $src
       |  UNION ALL
       |  SELECT r.w, r.cnt, r.pos + length(v.piece), r.k + 1,
       |         r.s + v.score, r.seg || '|' || v.piece
       |  FROM reach$r r JOIN $v v
       |    ON r.pos < length(r.w)
       |   AND substr(r.w, r.pos + 1, length(v.piece)) = v.piece
       |), best$r AS (
       |  SELECT w, cnt, seg, k AS np FROM (
       |    SELECT w, cnt, seg, k, ROW_NUMBER() OVER (PARTITION BY w
       |      ORDER BY k ASC, s DESC, seg ASC) AS rn
       |    FROM reach$r WHERE pos = length(w)) rr
       |  WHERE rn = 1
       |), use$r AS (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS score FROM (
       |    SELECT cnt, unnest(string_split(substr(seg, 2, length(seg)),
       |             '|')) AS piece
       |    FROM best$r) u
       |  GROUP BY 1
       |)""".stripMargin

  /** Seeding + both EM rounds, shared by the vocab and encode oracles;
    * `v2` is the FULL final vocabulary (chars + survivors with scores).
    * All-ASCII pieces make string comparison collation-identical across
    * engines.
    */
  private def unigramVocabCtesFor(docWhere: String): String =
    s"""wc AS (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $docWhere)
       |  GROUP BY w
       |), uwords AS (
       |  SELECT w, cnt FROM wc WHERE length(w) BETWEEN 1 AND $UNI_MAX_WORD
       |), cand AS (
       |  SELECT substr(w, i, l) AS piece, CAST(SUM(cnt) AS BIGINT) AS freq
       |  FROM uwords,
       |       (SELECT unnest(range(1, $UNI_MAX_WORD + 1)) AS i),
       |       (SELECT unnest(range(1, $UNI_MAX_PIECE + 1)) AS l)
       |  WHERE i + l - 1 <= length(w)
       |  GROUP BY 1
       |), chars AS (
       |  SELECT piece, freq FROM cand WHERE length(piece) = 1
       |), multi AS (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq, ROW_NUMBER() OVER (
       |      ORDER BY freq DESC, piece ASC) AS rn
       |    FROM cand WHERE length(piece) > 1) m
       |  WHERE rn <= $UNI_SEED_MULTI
       |), v0 AS (
       |  SELECT piece, freq AS score FROM chars
       |  UNION ALL SELECT piece, freq FROM multi
       |), ${uniReachCte(1, "v0")}, v1 AS (
       |  SELECT c.piece, COALESCE(u.score, 0) AS score
       |  FROM chars c LEFT JOIN use1 u USING (piece)
       |  UNION ALL
       |  SELECT m.piece, u.score FROM multi m JOIN use1 u USING (piece)
       |), ${uniReachCte(2, "v1")}, v2 AS (
       |  SELECT c.piece, COALESCE(u.score, 0) AS score
       |  FROM chars c LEFT JOIN use2 u USING (piece)
       |  UNION ALL
       |  SELECT v.piece, u.score FROM v1 v JOIN use2 u USING (piece)
       |  WHERE length(v.piece) > 1
       |)""".stripMargin

  private val unigramVocabCtes: String = unigramVocabCtesFor("")

  val unigramVocabSql: String =
    s"""WITH RECURSIVE $unigramVocabCtes
       |SELECT piece, usage FROM (
       |  SELECT piece, score AS usage, ROW_NUMBER() OVER (
       |    ORDER BY score DESC, piece ASC) AS rn
       |  FROM v2) f
       |WHERE rn <= $UNI_TOP_V""".stripMargin

  /** Oracle: a THIRD Viterbi pass against the full final vocabulary `v2`
    * gives each word's piece count; the document accounting mirrors the
    * BPE encode oracle.
    */
  val unigramEncodeSql: String =
    s"""WITH RECURSIVE $unigramVocabCtes, ${uniReachCte(3, "v2")}, enc AS (
       |  SELECT w, CAST(np AS BIGINT) AS n_pieces FROM best3
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       |       CAST(SUM(k * n_pieces) AS BIGINT) AS n_unigram_pieces,
       |       ROUND(CAST(SUM(k * n_pieces) AS DOUBLE) / CAST(SUM(k) AS BIGINT)
       |             + 1e-9, 4) AS pieces_per_word
       |FROM dw JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Oracle for the byte-fallback gate: LEFT join against the ≤ 6-char
    * vocabulary subset, COALESCE to word length on the fallback path.
    */
  val unigramEncodeFallbackSql: String =
    s"""WITH RECURSIVE $unigramVocabCtes, ${uniReachCte(3, "v2")}, enc AS (
       |  SELECT w, CAST(np AS BIGINT) AS n_pieces FROM best3
       |  WHERE length(w) <= $UNI_FB_MAX
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       |       CAST(SUM(k * COALESCE(n_pieces, length(w))) AS BIGINT)
       |         AS n_pieces_total,
       |       CAST(SUM(CASE WHEN n_pieces IS NULL THEN k ELSE 0 END)
       |            AS BIGINT) AS n_oov_words,
       |       ROUND(CAST(SUM(k * COALESCE(n_pieces, length(w))) AS DOUBLE)
       |             / CAST(SUM(k) AS BIGINT) + 1e-9, 4) AS pieces_per_word
       |FROM dw LEFT JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin

  /** DuckDB: first 15 md5-hex chars of `inner` as a 60-bit BIGINT (the
    * [[OracleSql.hexIntSql]] shape widened past birthday range for
    * corpus-scale bigram vocabularies).
    */
  private def hex60Sql(inner: String): String =
    (1 to 15).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($inner),$i,1))-1) * ${math.pow(16, 15 - i).toLong}::BIGINT"
    }.mkString("(", " + ", ")")

  private[graft] def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** CCNet-style n-gram LM quality scoring with ENGINE-EXACT integer
    * arithmetic: train a hashed-bigram model on the corpus (c_bi = count
    * of bigram, c_prev = count of its prefix), then score each document
    * by its total "surprise" — per bigram,
    * `length(bin(c_prev div c_bi))` = floor(log2(c_prev/c_bi)) + 1, the
    * BIT WIDTH of the inverse conditional frequency. This keeps the
    * perplexity-filter semantics (boilerplate scores low, rare/garbled
    * text scores high) while replacing `ln` — the one libm call whose
    * last-ulp behavior differs across engines — with integer division
    * and a binary-digit count both engines compute identically.
    * Self-scoring the training corpus means every bigram exists in the
    * model, so no smoothing branch is needed.
    *
    * 100 TB shape: bigram extraction rides the posexplode + lead window
    * partitioned by doc_id (high-cardinality key); the model is two
    * two-phase aggregations on 60-bit int hash keys; scoring is shuffle
    * equi-joins on those int keys (a corpus-scale model is NOT
    * broadcastable — this is deliberately the TF-IDF join shape, not a
    * broadcast), then one per-doc aggregation. Text never shuffles —
    * only (doc_id, ph, bh) int triples. Docs with < 2 tokens have no
    * bigrams and no row (the [[substringDupRate]] convention).
    */
  def lmSurprise(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(lower(col("text")))).as(Seq("pos", "w")))
      .withColumn("nxt", lead(col("w"), 1).over(w))
      .filter(col("nxt").isNotNull)
      // model training and scoring both read this frame; only int
      // hashes leave it
      .select(col("doc_id"), hash60(col("w")).as("ph"),
        hash60(concat_ws(" ", col("w"), col("nxt"))).as("bh"))
      .cache()
    val cb = pairs.groupBy(col("bh")).agg(count(lit(1)).as("c_bi"))
    val cp = pairs.groupBy(col("ph")).agg(count(lit(1)).as("c_prev"))
    pairs.join(cb, "bh").join(cp, "ph")
      .withColumn("surprise", length(bin(expr("c_prev div c_bi"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("surprise")).as("surprise_bits"),
        round(sum(col("surprise")).cast("double") / count(lit(1))
          + lit(1e-9), 4).as("mean_surprise"))
  }

  /** The CCNet configuration of [[lmSurprise]]: the bigram model is
    * trained on the HIGH-QUALITY subset only (quality ≥ 0.4 — the same
    * supervision split `quality_classifier_trained` uses), and EVERY
    * document scores against that reference model. Bigrams absent from
    * the model are out-of-model (real pipelines smooth them; here they
    * are counted — `n_oov` — and excluded from the surprise sum, keeping
    * every emitted number engine-exact): a doc that looks nothing like
    * the clean corpus shows up as high `oov_rate`, one made of clean-
    * corpus boilerplate as low `mean_surprise`. Same join shape as
    * [[lmSurprise]] — the model side shrinks, an extra left join carries
    * the OOV bit.
    */
  /** Per-document hashed bigram keys (ph, bh) — the shared lineage of the
    * batch LM queries and the model the streaming screen joins against.
    */
  private def lmPairs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(lower(col("text")))).as(Seq("pos", "w")))
      .withColumn("nxt", lead(col("w"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), hash60(col("w")).as("ph"),
        hash60(concat_ws(" ", col("w"), col("nxt"))).as("bh"))
  }

  /** The persisted reference model of [[lmSurpriseRef]] as two count
    * frames — (bh, c_bi) and (ph, c_prev) — trained on the high-quality
    * subset. Public so the streaming screen (`streaming/StreamingLm`)
    * scores against EXACTLY the batch model.
    */
  def lmRefModel(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val quality = TextAnalysis.qualityScore(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.stopwordCount(col("text")))
    val ref = lmPairs(
      Tables.documents(spark, sfDir).where(quality >= 0.4)).cache()
    (ref.groupBy(col("bh")).agg(count(lit(1)).as("c_bi")),
      ref.groupBy(col("ph")).agg(count(lit(1)).as("c_prev")))
  }

  def lmSurpriseRef(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val (cb, cp) = lmRefModel(spark, sfDir)
    lmPairs(d)
      .join(cb, Seq("bh"), "left")
      .join(cp, Seq("ph"), "left")
      .withColumn("surprise",
        when(col("c_bi").isNotNull && col("c_prev").isNotNull,
          length(bin(expr("c_prev div c_bi"))).cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("surprise").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(col("surprise")), lit(0L)).as("surprise_bits"),
        round(sum(when(col("surprise").isNull, 1L).otherwise(0L))
          .cast("double") / count(lit(1)) + lit(1e-9), 4).as("oov_rate"))
  }

  val lmSurpriseRefSql: String = {
    val nTokSql =
      "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
    val nStopSql =
      "CAST(length(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS BIGINT)"
    val qualitySql =
      s"""ROUND(least(CAST($nTokSql AS DOUBLE) / 100.0, 1.0) * 0.6 +
         |    (CAST($nStopSql AS DOUBLE) / CAST(greatest($nTokSql, 1) AS DOUBLE)) * 0.4
         |    + 1e-9, 4)""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS w,
       |         $qualitySql AS q
       |  FROM documents
       |), pairs AS (
       |  SELECT doc_id, q, ${hex60Sql("w[i]")} AS ph,
       |         ${hex60Sql("w[i] || ' ' || w[i + 1]")} AS bh
       |  FROM (SELECT doc_id, q, w, unnest(range(1, len(w))) AS i FROM tok)
       |), cb AS (
       |  SELECT bh, COUNT(*) AS c_bi FROM pairs WHERE q >= 0.4 GROUP BY bh
       |), cp AS (
       |  SELECT ph, COUNT(*) AS c_prev FROM pairs WHERE q >= 0.4 GROUP BY ph
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |       CAST(SUM(CASE WHEN c_bi IS NULL OR c_prev IS NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |       CAST(COALESCE(SUM(CASE WHEN c_bi IS NOT NULL AND c_prev IS NOT NULL
       |                     THEN length(bin(c_prev // c_bi)) END), 0) AS BIGINT)
       |         AS surprise_bits,
       |       ROUND(CAST(SUM(CASE WHEN c_bi IS NULL OR c_prev IS NULL
       |                          THEN 1 ELSE 0 END) AS DOUBLE)
       |             / COUNT(*) + 1e-9, 4) AS oov_rate
       |FROM pairs
       |LEFT JOIN cb USING (bh) LEFT JOIN cp USING (ph)
       |GROUP BY doc_id""".stripMargin
  }

  val lmSurpriseSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9]+') AS w
       |  FROM documents
       |), pairs AS (
       |  SELECT doc_id, ${hex60Sql("w[i]")} AS ph,
       |         ${hex60Sql("w[i] || ' ' || w[i + 1]")} AS bh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM tok)
       |), cb AS (
       |  SELECT bh, COUNT(*) AS c_bi FROM pairs GROUP BY bh
       |), cp AS (
       |  SELECT ph, COUNT(*) AS c_prev FROM pairs GROUP BY ph
       |)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |       CAST(SUM(length(bin(c_prev // c_bi))) AS BIGINT) AS surprise_bits,
       |       ROUND(CAST(SUM(length(bin(c_prev // c_bi))) AS DOUBLE)
       |             / COUNT(*) + 1e-9, 4) AS mean_surprise
       |FROM pairs JOIN cb USING (bh) JOIN cp USING (ph)
       |GROUP BY doc_id""".stripMargin

  private val COVERAGE_V = 20

  /** Tokenizer-vocabulary coverage: build the global top-V vocabulary
    * (count-ranked, token tie-break) and report each document's
    * out-of-vocabulary token count and rate — the signal a tokenizer/vocab
    * decision reads (what fraction of the corpus a V-entry vocab covers).
    *
    * 100 TB shape: vocab is a global orderBy+limit (TakeOrderedAndProject,
    * per-partition top-V + one V-row merge) broadcast to a membership
    * join; per-doc counts ride the token explode's doc_id grouping. Docs
    * with zero tokens have no rows (the [[substringDupRate]] convention).
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    // both the vocab rank and the membership probe read the full exploded
    // token frame — cache it so the tokenize scan runs once
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      .cache()
    val vocab = broadcast(toks.groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc)
      .limit(COVERAGE_V)
      .select(col("t"), lit(true).as("inv")))
    toks.join(vocab, Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  val vocabCoverageSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS t
       |  FROM documents
       |), vocab AS (
       |  SELECT t FROM (
       |    SELECT t, COUNT(*) AS c FROM toks GROUP BY t
       |    ORDER BY c DESC, t ASC LIMIT $COVERAGE_V) v
       |), f AS (
       |  SELECT toks.doc_id, vocab.t IS NOT NULL AS inv
       |  FROM toks LEFT JOIN vocab ON toks.t = vocab.t
       |)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_oov,
       |       CAST(SUM(CASE WHEN NOT inv THEN 1 ELSE 0 END) AS DOUBLE)
       |         / COUNT(*) AS oov_rate
       |FROM f GROUP BY doc_id""".stripMargin

  private val HH_K = 10
  private val HH_EPS = 0.001
  private val HH_SEED = 42

  /** Count-min-sketch heavy hitters — the frequency member of the gated
    * sketch family (Bloom membership / HLL++ cardinality / t-digest
    * quantiles / CMS counts): the exact global top-K tokens, each probed
    * against a distributed `count_min_sketch` of the whole token stream,
    * gated by the CMS contract (est ≥ exact, est ≤ exact + ε·N). At
    * 100 TB the sketch replaces the exact count cascade wherever a
    * bounded over-estimate suffices (candidate pruning, mixture weights):
    * counter sums are commutative, so the distributed sketch is
    * identical under any partial-agg order and merges across corpus
    * shards for free.
    *
    * Like [[AnalyticsJobs.approxDistinct]], the estimate itself can't
    * hash-match a DuckDB oracle — the CONTRACT is the gate; the exact
    * top-K rows are hash-checked. The oracle hardcodes `cms_in_bounds =
    * true` against a 2ε·N upper slack: the 1ε·N bound holds only with
    * confidence 1−δ = 0.99 PER PROBE, so at exactly ε·N the gate would be
    * testing the tail of the probabilistic guarantee (and, being
    * deterministic per corpus, would fail persistently on an unlucky
    * corpus); doubling the slack makes it test the wiring.
    *
    * Fully lazy, one token scan: the sketch aggregate is a 1-row frame
    * cross-joined (broadcast) onto the exact top-K — no mid-construction
    * driver action — and both the sketch build and the exact counts read
    * ONE cached token frame. An empty corpus yields an empty top-K, so
    * the NULL sketch the aggregate produces is never probed (the
    * `df.stat.bloomFilter` NPE shape doesn't arise).
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      .cache()
    val sketch = toks.agg(
      expr(s"count_min_sketch(t, CAST($HH_EPS AS DOUBLE), " +
        s"CAST(0.99 AS DOUBLE), $HH_SEED)").as("cms"),
      count(lit(1)).as("total"))
    val est = graft.functions.SketchFunctions
      .cms_estimate_of(col("cms"), col("t"))
    toks.groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(HH_K)
      .crossJoin(broadcast(sketch))
      .select(col("t").as("token"), col("n"),
        (est >= col("n") && est <= col("n") +
          ceil(lit(2 * HH_EPS) * col("total")).cast("long"))
          .as("cms_in_bounds"))
  }

  val heavyHittersSql: String =
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS t
       |  FROM documents
       |)
       |SELECT t AS token, COUNT(*) AS n, true AS cms_in_bounds
       |FROM t GROUP BY t
       |ORDER BY n DESC, token ASC LIMIT $HH_K""".stripMargin

  private val TFIDF_K = 3

  /** Characteristic terms per document: TF-IDF in ratio form — score =
    * tf · (N+1)/(df+1), skipping the logarithm deliberately: `ln` is the
    * one piece of arithmetic whose last-ulp behavior differs across libm
    * implementations, and every other number this engine emits is
    * engine-exact. The ratio keeps the rare-term-boost semantics with pure
    * rational double math. Two-phase aggs for tf and df; the df frame is
    * one row per distinct token — VOCABULARY-scale, i.e. billions of rows
    * on a web corpus, so it gets no broadcast hint: AQE broadcasts it when
    * it measures small and degrades to a shuffle join when it isn't (a
    * forced hint would OOM instead). The 1-row corpus count is the only
    * frame small by construction, so only it is hinted.
    */
  def tfidfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // corpus cardinality as a broadcast 1-row frame — stays inside the
    // lazy plan instead of an eager driver-side count
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    // df derives from tf and the scored join reads tf again — cache the
    // (doc, token, tf) frame so the explode+count subtree runs once
    val tf = terms.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (col("n_docs") + 1) / (col("df") + 1) + lit(1e-9), 6))
    graft.ops.TopN
      .topNPer(scored, col("doc_id"), col("score"), col("token"), TFIDF_K)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rn"))
  }

  val tfidfTopKSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2
       |), df AS (
       |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
       |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
       |         -- integer product, then ONE double division — the exact
       |         -- op order Spark's Divide performs
       |         ROUND((tf.tf * (n.n_docs + 1)) / (df.df + 1) + 1e-9, 6) AS score
       |  FROM tf JOIN df USING (token) CROSS JOIN n
       |)
       |SELECT doc_id, token, tf, df, score, rn FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
       |  FROM scored) r
       |WHERE rn <= $TFIDF_K""".stripMargin

  private val ASSOC_VOCAB = 50
  private val ASSOC_MIN_CO = 5

  /** Term-association (collocation) mining — which frequent terms
    * co-occur in documents beyond chance: over the [[ASSOC_VOCAB]] most
    * document-frequent tokens, every ordered pair with co-occurrence ≥
    * [[ASSOC_MIN_CO]] docs, plus lift_ppm under the same two-step floor
    * contract as basket_pairs ((co·10⁶ div na)·N div nb — every product
    * ≤ 10⁶·N, BIGINT-safe at any corpus size). The vocabulary fence is
    * what makes the quadratic zone finite: the pair join runs on the
    * doc-keyed incidence frame restricted to vocab terms, ≤ V²/2 pairs
    * per doc, and pairs ride INT vocab ranks (vid), not token strings —
    * the round-2 join-key rule; tokens re-attach from the V-row
    * broadcast after the agg. The vid rank itself is a window over the
    * 50-row TakeOrdered result (bounded, like q3_shipping's rank
    * attach), and doc count N is a 1-row broadcast.
    */
  def termAssociations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("token").asc)
    val vocab = dfreq.orderBy(col("df").desc, col("token").asc)
      .limit(ASSOC_VOCAB)
      .withColumn("vid", row_number().over(w).cast("long"))
      .cache()
    val inc = tf.join(broadcast(vocab.select(col("token"), col("vid"))),
        "token")
      .select(col("doc_id"), col("vid"))
      .cache()
    inc.alias("a").join(inc.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.vid") < col("b.vid"))
      .groupBy(col("a.vid").as("va"), col("b.vid").as("vb"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= ASSOC_MIN_CO)
      .join(broadcast(vocab.select(col("vid").as("va"),
        col("token").as("term_a"), col("df").as("na"))), "va")
      .join(broadcast(vocab.select(col("vid").as("vb"),
        col("token").as("term_b"), col("df").as("nb"))), "vb")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("co"), col("na"), col("nb"),
        expr("(((co * 1000000) div na) * n_docs) div nb").as("lift_ppm"))
  }

  val termAssociationsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
       |), vocab AS (
       |  SELECT token, df, rn AS vid FROM (
       |    SELECT token, df, ROW_NUMBER() OVER (
       |      ORDER BY df DESC, token ASC) AS rn FROM dfreq) r
       |  WHERE rn <= $ASSOC_VOCAB
       |), inc AS (
       |  SELECT tf.doc_id, v.vid FROM tf JOIN vocab v USING (token)
       |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |pairs AS (
       |  SELECT a.vid AS va, b.vid AS vb, COUNT(*) AS co
       |  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.vid < b.vid
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $ASSOC_MIN_CO
       |)
       |SELECT wa.token AS term_a, wb.token AS term_b, p.co,
       |       wa.df AS na, wb.df AS nb,
       |       CAST((((p.co * 1000000) // wa.df) * n.n_docs) // wb.df
       |            AS BIGINT) AS lift_ppm
       |FROM pairs p JOIN vocab wa ON wa.vid = p.va
       |             JOIN vocab wb ON wb.vid = p.vb
       |             CROSS JOIN n""".stripMargin

  /** The fixed conjunctive query set for [[keywordSearch]] — ONE Scala
    * constant emitted into both the plan (literal frame) and the oracle
    * SQL (VALUES list), the shared-constants discipline of planeWeight.
    */
  private[graft] val SEARCH_QUERIES: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("hash", "join"),
    2L -> Seq("window", "sort", "order"),
    3L -> Seq("merge", "scan"))
  private val SEARCH_K = 5

  /** Conjunctive keyword retrieval over the inverted index — the boolean
    * search primitive (docs containing ALL terms of a query, ranked by
    * summed term frequency, top-[[SEARCH_K]] per query, doc_id
    * tie-break). The postings list is the same (doc, token, tf) frame
    * TF-IDF builds; the query set is a broadcast literal frame, so
    * retrieval is one broadcast hash join (a map-side filter of the
    * postings scan — O(Σ matched postings), never a corpus scan per
    * query) + a (query, doc)-keyed count/sum agg. The AND semantics
    * fall out of `n_hit = n_terms` (postings are per-(doc, token)
    * distinct, so the count IS the matched-term count). Per-query top-k
    * is two-phase like [[SimilarityJobs.embeddingOutliers]]: the query
    * set is tiny, so a naive PARTITION BY query_id window would funnel
    * every matching doc into |queries| tasks — a partition-local
    * `sort_array(collect_list)[1:k]` combiner bounds the final window's
    * input by queries × partitions × k.
    */
  def keywordSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val terms = SEARCH_QUERIES
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val nTerms = SEARCH_QUERIES.map { case (q, ts) => (q, ts.size.toLong) }
      .toDF("query_id", "n_terms")
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val hits = tf.join(broadcast(terms), col("token") === col("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("tf")).as("score"))
      .join(broadcast(nTerms), "query_id")
      .filter(col("n_hit") === col("n_terms"))
    val local = hits
      .groupBy(spark_partition_id().as("pid"), col("query_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("doc_id"), col("score")))),
        1, SEARCH_K).as("cand"))
      .select(col("query_id"), explode(col("cand")).as("c"))
      .select(col("query_id"), col("c.doc_id").as("doc_id"),
        col("c.score").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    local.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= SEARCH_K)
      .select(col("query_id"), col("doc_id"), col("score"), col("rn"))
  }

  val keywordSearchSql: String = {
    val vals = SEARCH_QUERIES
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")
    s"""WITH q AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $vals) v(query_id, term)
       |), t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2
       |), nq AS (SELECT query_id, COUNT(*) AS n_terms FROM q GROUP BY 1),
       |hits AS (
       |  SELECT q.query_id, tf.doc_id, COUNT(*) AS n_hit,
       |         CAST(SUM(tf.tf) AS BIGINT) AS score
       |  FROM q JOIN tf ON tf.token = q.term
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, doc_id, score, rn FROM (
       |  SELECT h.query_id, h.doc_id, h.score, ROW_NUMBER() OVER (
       |    PARTITION BY h.query_id ORDER BY h.score DESC, h.doc_id ASC) AS rn
       |  FROM hits h JOIN nq USING (query_id)
       |  WHERE h.n_hit = nq.n_terms) r
       |WHERE rn <= $SEARCH_K""".stripMargin
  }

  /** Disjunctive BM25-ranked retrieval over the same inverted index —
    * the GRADED ranking primitive beside [[keywordSearch]]'s boolean AND
    * (Robertson-Spärck Jones / Okapi family, k1 = 6/5, b = 3/4): docs
    * matching ANY query term, scored by Σ idf(t) · sat(tf, dl) and
    * top-[[SEARCH_K]]'d per query. Both factors are INTEGER-EXACT so the
    * ranking never touches libm (the no-ln oracle discipline):
    *
    *  - idf as the RSJ odds ratio without the log —
    *    `idf_ppm = ((2(N−df)+1)·10⁶) div (2df+1)`, the exact rational
    *    form of (N−df+0.5)/(df+0.5). Positive and strictly monotone in
    *    the true log idf, so per-term weighting order is preserved; the
    *    log's additive-smoothing of the SUM is the one divergence, and
    *    it is the documented contract here.
    *  - tf saturation with the length prior in integer form: with
    *    adl = L div N (integer average doc length),
    *    `sat_x1000 = (22000·tf·adl) div (10·tf·adl + 3·adl + 9·dl)` —
    *    exactly tf·(k1+1)/(tf + k1·(1−b+b·dl/adl)) scaled ×1000,
    *    bounded ≤ 2200 independent of corpus size.
    *
    * Scale shape: identical to [[keywordSearch]] — one postings build,
    * a broadcast-literal terms join (map-side filter), df/dl aggs on the
    * reduced matched frame, a 1-row broadcast stats frame, and the
    * two-phase per-query top-k. The overflow envelope is asserted at
    * runtime on the actual corpus (the anomalyDays discipline):
    * sat needs max(tf)·adl < 2⁶³/22000 and the score product needs
    * (2N+1)·10⁶·2200·|terms| < 2⁶³ (N ≲ 6·10⁸ at this ppm scale — drop
    * the scale a decade per decade of corpus beyond that).
    */
  def bm25Search(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val terms = SEARCH_QUERIES
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val docs = Tables.documents(spark, sfDir)
    val tf = bm25Tf(docs)
    // scope-released at construction end with an eager K×|queries| output
    // (the r15 footprint playbook — the dl cache outlived the query)
    val scope = graft.ops.CacheScope()
    try {
    val dl = scope.cache(bm25Dl(tf))
    val (nDocs, adl) = bm25CorpusStats(docs, dl)
    val matched = tf.join(broadcast(terms), col("token") === col("term"))
    val dfx = matched.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = matched
      .join(dl.select(col("doc_id"), col("dl")), "doc_id")
      .join(broadcast(dfx), "term")
      .withColumn("idf_ppm",
        expr(s"((2*($nDocs - df) + 1) * 1000000) div (2*df + 1)"))
      .withColumn("sat_x1000",
        expr(s"(22000 * tf * $adl) div (10*tf*$adl + 3*$adl + 9*dl)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("idf_ppm") * col("sat_x1000")).as("score"))
    val local = scored
      .groupBy(spark_partition_id().as("pid"), col("query_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("doc_id"), col("score")))),
        1, SEARCH_K).as("cand"))
      .select(col("query_id"), explode(col("cand")).as("c"))
      .select(col("query_id"), col("c.doc_id").as("doc_id"),
        col("c.score").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    local.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= SEARCH_K)
      .select(col("query_id"), col("doc_id"), col("score"), col("rn"))
      .eagerCheckpoint()
    } finally scope.close()
  }

  /** The (doc_id, token, tf) postings frame BM25 builds on. */
  private def bm25Tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Per-doc length frame (doc_id, dl, max_tf) — cached by the caller so
    * the scoring join and the 1-row stats collect share one agg.
    */
  private def bm25Dl(tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"), max(col("tf")).as("max_tf"))

  /** (N, adl) with the runtime overflow envelope asserted on the actual
    * corpus stats (the anomalyDays discipline).
    */
  private def bm25CorpusStats(docs: DataFrame, dl: DataFrame): (Long, Long) = {
    val statsRow = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("l_tot"),
        max(col("max_tf")).as("mx_tf")))
      // empty/token-less corpus: null sums → 0 (the zero-row totality
      // discipline; adl = 0 makes every saturation term 0 div 9·dl = 0,
      // never a division by zero — matched rows imply dl ≥ tf ≥ 1)
      .withColumn("adl", coalesce(
        expr("case when n_docs = 0 then 0L else l_tot div n_docs end"),
        lit(0L)))
      .withColumn("mx_tf", coalesce(col("mx_tf"), lit(0L)))
      .first()
    val (nDocs, adl) = (statsRow.getLong(0), statsRow.getLong(3))
    val mxTf = statsRow.getLong(2)
    require(mxTf * adl < Long.MaxValue / 22000,
      s"bm25: max_tf=$mxTf x adl=$adl exceeds the sat_x1000 envelope")
    require(nDocs < Long.MaxValue / (2200L * 1000000L *
        SEARCH_QUERIES.map(_._2.size).max * 2),
      s"bm25: n_docs=$nDocs exceeds the idf_ppm score envelope; " +
        "drop the ppm scale a decade per decade of corpus")
    (nDocs, adl)
  }

  /** The frozen BM25 serving model for the streaming twin
    * ([[graft.streaming.Bm25Stream]]): corpus stats + per-standing-term
    * document frequency, collected once — |distinct terms| + 2 values,
    * the broadcast-constants/model-size contract (rocchioModel class).
    * Arriving documents score under THESE stats; a production pipeline
    * refreshes the model on its batch cadence, exactly like the served
    * CF lists and quality classifier.
    */
  def bm25Model(spark: SparkSession, sfDir: String): (Long, Long, Map[String, Long]) = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val tf = bm25Tf(docs)
    val (nDocs, adl) = bm25CorpusStats(docs, bm25Dl(tf))
    val termSet = SEARCH_QUERIES.flatMap(_._2).distinct.toDF("term")
    val df = tf.join(broadcast(termSet), col("token") === col("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    (nDocs, adl, df)
  }

  /** Oracle: the identical integer pipeline — every division is `//` on
    * positive operands, every stage the same quantized expression, so
    * scores are engine-equal, not just close. `n_docs`/`adl` are scalar
    * subqueries instead of Scala-side constants, computing the same
    * integers.
    */
  val bm25SearchSql: String = {
    val vals = SEARCH_QUERIES
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")
    s"""WITH q AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $vals) v(query_id, term)
       |), t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), tf AS MATERIALIZED (
       |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
       |), dl AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
       |), st AS (
       |  SELECT n_docs, l_tot, l_tot // n_docs AS adl FROM (
       |    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       |           (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS l_tot)
       |), m AS MATERIALIZED (
       |  SELECT q.query_id, q.term, tf.doc_id, tf.tf
       |  FROM q JOIN tf ON tf.token = q.term
       |), dfx AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1
       |), sc AS (
       |  SELECT m.query_id, m.doc_id,
       |         CAST(SUM(
       |           (((2*(s.n_docs - dfx.df) + 1) * 1000000) // (2*dfx.df + 1))
       |           * ((22000 * m.tf * s.adl)
       |              // (10*m.tf*s.adl + 3*s.adl + 9*d.dl))
       |         ) AS BIGINT) AS score
       |  FROM m JOIN dfx USING (term)
       |         JOIN dl d ON d.doc_id = m.doc_id
       |         CROSS JOIN st s
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, doc_id, score, rn FROM (
       |  SELECT query_id, doc_id, score, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rn
       |  FROM sc) r
       |WHERE rn <= $SEARCH_K""".stripMargin
  }

  /** Gopher/C4-style within-document repetition signals — the quality
    * filters every LLM-corpus pipeline applies before training: duplicate
    * word fraction, most-frequent-bigram mass, and duplicate-bigram mass,
    * per document. High values mark boilerplate/spam (repeated nav bars,
    * keyword stuffing) that survives cross-document dedup because each
    * copy IS unique.
    *
    * Scale shape: bigram stats ride the gram window's doc_id partitioning
    * (both per-doc groupBys are partition-local, no new exchange); word
    * stats are a two-phase (doc, word) count cascade like the tf stage of
    * TF-IDF. Ratios use the cross-engine round-nudge discipline.
    */
  def textRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val words = d.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("w"))
    val ws = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_words"), count(lit(1)).as("nd"))
    val gs = graft.ops.Dedup
      .explodedGrams(d.select(col("doc_id"), col("text")), 2, distinct = false)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("total"), max(col("cnt")).as("topc"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dupc"))
    ws.join(gs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        round((col("n_words") - col("nd")).cast("double") / col("n_words")
          + lit(1e-9), 4).as("dup_word_frac"),
        coalesce(round(col("topc").cast("double") / col("total")
          + lit(1e-9), 4), lit(0.0)).as("top_bigram_frac"),
        coalesce(round(col("dupc").cast("double") / col("total")
          + lit(1e-9), 4), lit(0.0)).as("dup_bigram_frac"))
  }

  val textRepetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents
      |), ws AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words, COUNT(*) AS nd
      |  FROM (SELECT doc_id, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2) wc
      |  GROUP BY doc_id
      |), g AS (
      |  SELECT doc_id, unnest(
      |    [array_to_string(wl[i:i+1], ' ') FOR i IN range(1, len(wl))]) AS gram
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS wl
      |        FROM documents)
      |  WHERE len(wl) >= 2
      |), gs AS (
      |  SELECT doc_id, SUM(cnt) AS total, MAX(cnt) AS topc,
      |         SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dupc
      |  FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2) gc
      |  GROUP BY doc_id
      |)
      |SELECT ws.doc_id, ws.n_words,
      |       ROUND((ws.n_words - ws.nd)::DOUBLE / ws.n_words + 1e-9, 4)
      |         AS dup_word_frac,
      |       COALESCE(ROUND(gs.topc::DOUBLE / gs.total + 1e-9, 4), 0.0)
      |         AS top_bigram_frac,
      |       COALESCE(ROUND(gs.dupc::DOUBLE / gs.total + 1e-9, 4), 0.0)
      |         AS dup_bigram_frac
      |FROM ws LEFT JOIN gs USING (doc_id)""".stripMargin

  /** Rare-token density: each document's mean corpus-frequency over its
    * token occurrences — the model-free cousin of a perplexity filter
    * (very low = OCR noise/garbage tokens, very high = boilerplate built
    * from only the commonest words). Exact cross-engine: frequencies and
    * the weighted sum Σ tf·freq are integers, one double division + the
    * round nudge at the end. Same two-phase tf cascade as TF-IDF; the
    * corpus-frequency frame is vocabulary-sized, so no broadcast hint
    * (AQE decides — same rationale as [[tfidfTopK]]).
    */
  def tokenRarity(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir).select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .cache() // freq derives from tf and the weighted join reads it again
    val freq = tf.groupBy(col("token")).agg(sum(col("tf")).as("freq"))
    tf.join(freq, "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("freq")).as("wsum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("wsum").cast("double") / col("n_tokens") + lit(1e-9), 4)
          .as("mean_tok_freq"))
  }

  val tokenRaritySql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2
      |), freq AS (
      |  SELECT token, CAST(SUM(tf) AS BIGINT) AS freq FROM tf GROUP BY 1
      |)
      |SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
      |       ROUND(CAST(SUM(tf.tf * freq.freq) AS DOUBLE) / SUM(tf.tf) + 1e-9, 4)
      |         AS mean_tok_freq
      |FROM tf JOIN freq USING (token)
      |GROUP BY tf.doc_id""".stripMargin

  /** Per-source triage report — the observability query a crawl pipeline
    * reads to decide which sources to keep: document volume, exact-dup
    * rate (1 − distinct fingerprints / docs), and mean quality score. The
    * mean is engine-exact by integer quantization: each 4-decimal quality
    * ×10⁴ is an exact integer, summed exactly, one double division at the
    * end (double summation would be order-dependent across engines).
    * One scan, one aggregation; the distinct-count is Spark's standard
    * two-phase expand — all shapes linear in the corpus.
    */
  def sourceStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val nTok = TextAnalysis.tokenCount(col("text"))
    val nStop = TextAnalysis.stopwordCount(col("text"))
    d.select(col("source"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        round(TextAnalysis.qualityScore(nTok, nStop) * 1e4).cast("long")
          .as("q4"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_uniq"),
        sum(col("q4")).as("qsum"))
      .select(col("source"), col("n_docs"), col("n_uniq"),
        round((col("n_docs") - col("n_uniq")).cast("double") / col("n_docs")
          + lit(1e-9), 4).as("dup_rate"),
        round(col("qsum").cast("double") / (col("n_docs") * 1e4) + lit(1e-9), 4)
          .as("mean_quality"))
  }

  val sourceStatsSql: String = {
    val nTokSql = "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
    val nStopSql =
      "CAST(length(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS BIGINT)"
    val qualitySql =
      s"""ROUND(least(CAST($nTokSql AS DOUBLE) / 100.0, 1.0) * 0.6 +
         |    (CAST($nStopSql AS DOUBLE) / CAST(greatest($nTokSql, 1) AS DOUBLE)) * 0.4
         |    + 1e-9, 4)""".stripMargin
    s"""WITH s AS (
       |  SELECT source,
       |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       |         CAST(ROUND($qualitySql * 10000.0) AS BIGINT) AS q4
       |  FROM documents
       |)
       |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_uniq,
       |       ROUND((COUNT(*) - COUNT(DISTINCT fp))::DOUBLE / COUNT(*) + 1e-9, 4)
       |         AS dup_rate,
       |       ROUND(CAST(SUM(q4) AS DOUBLE) / (COUNT(*) * 10000.0) + 1e-9, 4)
       |         AS mean_quality
       |FROM s GROUP BY source""".stripMargin
  }

  private val CHUNK_W = 50     // tokens per chunk
  private val CHUNK_STRIDE = 40 // 10-token overlap between chunks

  /** Sliding-window document chunking — the training-prep step between
    * curation and tokenization: each document becomes ⌈n/stride⌉ chunks of
    * up to `CHUNK_W` whitespace tokens starting every `CHUNK_STRIDE`
    * (overlap keeps context across boundaries). Pure per-row computation:
    * one scan, an explode over the chunk-start sequence, `slice` +
    * `concat_ws` reassembly — all codegen'd, no lambda HOFs, no shuffle at
    * all, so the op is exactly as scalable as the scan itself.
    */
  def docChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(toks) - 1) div $CHUNK_STRIDE)"))
          .as("chunk_idx"), col("toks"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * CHUNK_STRIDE + 1, lit(CHUNK_W))
          .as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c")).as("chunk"))
  }

  val docChunksSql: String =
    s"""SELECT doc_id, s.k AS chunk_idx,
       |       CAST(len(s.c) AS BIGINT) AS n_tokens,
       |       array_to_string(s.c, ' ') AS chunk
       |FROM (
       |  SELECT doc_id, unnest(
       |    [{'k': CAST(k AS BIGINT),
       |      'c': wl[k * $CHUNK_STRIDE + 1 : k * $CHUNK_STRIDE + $CHUNK_W]}
       |     FOR k IN range(0, (len(wl) - 1) // $CHUNK_STRIDE + 1)]) AS s
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS wl
       |        FROM documents) t) u""".stripMargin

  // ---- PII redaction (email/phone scrub) ----

  /** PII scrubbing as a checked query. The synthetic corpus contains no
    * PII (zero '@', zero digits — verified), so redacting raw text would
    * gate nothing; instead BOTH engines append the same deterministic
    * contact clause (email + 3-3-4 phone derived from doc_id) and the
    * redaction math — match counts, replacement, fingerprint of the
    * scrubbed text — is what gets hash-checked. One codegen'd scan,
    * shuffle-free, exactly as scalable as the scan itself.
    */
  def textRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val contact = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val red = TextAnalysis.redactPii(contact)
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextAnalysis.emailCount(contact).as("n_emails"),
      TextAnalysis.phoneCount(contact).as("n_phones"),
      md5(red).as("redacted_fp"),
      length(red).cast("long").as("n_chars_redacted"))
  }

  val textRedactSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@mail.example.com or 555-'
       |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS c
       |  FROM documents
       |), r AS (
       |  SELECT doc_id,
       |    CAST(length(regexp_extract_all(c,
       |      '${TextAnalysis.emailPattern}')) AS BIGINT) AS n_emails,
       |    CAST(length(regexp_extract_all(c,
       |      '${TextAnalysis.phonePattern}')) AS BIGINT) AS n_phones,
       |    regexp_replace(regexp_replace(c,
       |      '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
       |      '${TextAnalysis.phonePattern}', '<PHONE>', 'g') AS red
       |  FROM t
       |)
       |SELECT doc_id, n_emails, n_phones, md5(red) AS redacted_fp,
       |       CAST(length(red) AS BIGINT) AS n_chars_redacted
       |FROM r""".stripMargin

  // ---- context-window packing (training-sequence assembly) ----

  private val PACK_W = 2048L // tokens per packed training sequence

  /** GPT-style corpus packing: concatenate documents in deterministic
    * (lang, doc_id) order and cut exact `PACK_W`-token training sequences,
    * splitting documents at bin boundaries. Emits one row per
    * (document × bin it touches): the bin, the offset inside the bin, and
    * the tokens contributed — the manifest a sequence-assembly job needs.
    *
    * Scale shape — the distributed prefix sum, NOT a per-lang window: a
    * window partitioned only by `lang` would run each language's cumsum as
    * ONE task (a head language at 100 TB = billions of rows on one
    * reducer). Instead: range-partition by (lang, doc_id), local sums per
    * (partition, lang), a cumulative-offset window over the TINY
    * per-partition totals frame (≤ partitions×langs rows), broadcast the
    * offsets back, and finish with a per-(partition, lang) local cumsum —
    * every heavy stage is bounded by a partition, and the result is
    * partitioning-independent (prefix sums are associative; the oracle
    * pins output equality with the sequential definition). The bin explode
    * is pure codegen integer arithmetic — no token-level frame exists.
    */
  def docPacking(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
      .repartitionByRange(col("lang"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      // both consumers must see ONE materialization: the range partitioner
      // samples, so an uncached re-computation could cut different
      // boundaries and hand the offset join inconsistent pids
      .cache()
    // per-(partition, lang) token totals — partitions×langs rows, tiny
    val totals = base.groupBy(col("pid"), col("lang"))
      .agg(sum(col("n")).as("part_total"))
    val offsets = totals.withColumn("part_offset",
      coalesce(sum(col("part_total")).over(
        Window.partitionBy(col("lang")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("lang"), col("part_offset"))
    // local cumsum rides the (pid, lang) clustering; global start = the
    // broadcast partition offset + the in-partition prefix
    val wLocal = Window.partitionBy(col("pid"), col("lang"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), Seq("pid", "lang"))
      .withColumn("s",
        col("part_offset") + coalesce(sum(col("n")).over(wLocal), lit(0L)))
      .withColumn("e", col("s") + col("n") - 1)
      .select(col("lang"), col("doc_id"), col("s"), col("e"),
        explode(expr(s"sequence(s div $PACK_W, e div $PACK_W)")).as("bin"))
      .select(col("lang"), col("doc_id"), col("bin"),
        (greatest(col("s"), col("bin") * PACK_W) - col("bin") * PACK_W)
          .as("bin_offset"),
        (least(col("e"), col("bin") * PACK_W + (PACK_W - 1)) -
          greatest(col("s"), col("bin") * PACK_W) + 1).as("n_toks"))
  }

  val docPackingSql: String =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n
       |  FROM documents
       |), c AS (
       |  SELECT lang, doc_id, n,
       |    CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
       |  FROM t WHERE n > 0
       |), spans AS (
       |  SELECT lang, doc_id, s, s + n - 1 AS e,
       |    unnest(generate_series(s // $PACK_W, (s + n - 1) // $PACK_W)) AS bin
       |  FROM c
       |)
       |SELECT lang, doc_id, bin,
       |  GREATEST(s, bin * $PACK_W) - bin * $PACK_W AS bin_offset,
       |  LEAST(e, bin * $PACK_W + ${PACK_W - 1})
       |    - GREATEST(s, bin * $PACK_W) + 1 AS n_toks
       |FROM spans""".stripMargin

  /** Packing-efficiency audit — the scorecard for [[docPacking]]'s output
    * (the eval-layer sibling the packing step was missing): per lang,
    * bin count, token mass, utilization ppm (tokens over bins×PACK_W —
    * only the final partial bin dilutes concat-packing), the
    * boundary-crossing document count (each split doc is a truncated or
    * cross-contaminated training sequence — the number that decides
    * whether to pack with document-boundary resets), and mean docs per
    * bin ×1000 (attention-fragmentation proxy). All integer floor
    * divisions of exact counts.
    *
    * Scale shape: two aggs over the packing frame (lang-keyed and
    * (lang, doc)-keyed, both riding the explode's partitioning) + a
    * |langs|-row join — adds nothing corpus-quadratic to the
    * already-fenced prefix-sum pipeline it reads.
    */
  def packingEval(spark: SparkSession, sfDir: String): DataFrame = {
    val dp = docPacking(spark, sfDir).cache()
    val splits = dp.groupBy(col("lang"), col("doc_id"))
      .agg(count(lit(1)).as("nb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_split_docs"))
    dp.groupBy(col("lang"))
      .agg(countDistinct(col("bin")).as("n_bins"),
        sum(col("n_toks")).as("n_tokens"), count(lit(1)).as("n_rows"))
      .join(splits, "lang")
      .select(col("lang"), col("n_bins"), col("n_tokens"), col("n_docs"),
        col("n_split_docs"),
        expr(s"(n_tokens * 1000000) div (n_bins * $PACK_W)").as("util_ppm"),
        expr("(n_rows * 1000) div n_bins").as("docs_per_bin_x1000"))
  }

  /** Oracle: the packing contract composed verbatim (diamond-referenced
    * by the two aggs — MATERIALIZED) + identical integer scorecard.
    */
  lazy val packingEvalSql: String =
    s"""WITH dp AS MATERIALIZED ($docPackingSql),
       |pd AS (
       |  SELECT lang, doc_id, COUNT(*) AS nb FROM dp GROUP BY 1, 2
       |), sp AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_split_docs
       |  FROM pd GROUP BY 1
       |), ag AS (
       |  SELECT lang, CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
       |         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |         CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM dp GROUP BY 1
       |)
       |SELECT ag.lang, n_bins, n_tokens, n_docs, n_split_docs,
       |       (n_tokens * 1000000) // (n_bins * $PACK_W) AS util_ppm,
       |       (n_rows * 1000) // n_bins AS docs_per_bin_x1000
       |FROM ag JOIN sp ON sp.lang = ag.lang""".stripMargin

  /** C4/Gopher-style format screening as per-document rule booleans: ends
    * in terminal punctuation (C4 keeps only such lines), no curly braces
    * (code pages), no "lorem ipsum" (placeholder pages), ≥ 5 tokens, and
    * the Gopher mean-word-length band restated as pure INTEGER bounds
    * (3·words ≤ alnum-chars ≤ 10·words — no division, no float). One
    * codegen scan, shuffle-free; every rule is string/substring
    * arithmetic identical in both engines (the terminal-punct check uses
    * last-char IN set, not a `$`-anchored regex — Java `$` matches before
    * a trailing newline, RE2's does not).
    */
  def c4Filters(spark: SparkSession, sfDir: String): DataFrame = {
    val flags = TextAnalysis.c4Columns(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: flags.map { case (n, c) => c.as(n) }: _*)
  }

  val c4FiltersSql: String = {
    val nTokSql = "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
    val alphaSql =
      "CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT)"
    s"""WITH f AS (
       |  SELECT doc_id, $nTokSql AS n_tokens,
       |         right(trim(text), 1) IN ('.', '!', '?') AS terminal_punct,
       |         contains(text, '{') AS has_braces,
       |         contains(lower(text), 'lorem ipsum') AS has_lorem,
       |         $alphaSql >= $nTokSql * 3 AND $alphaSql <= $nTokSql * 10
       |           AS word_len_ok
       |  FROM documents
       |)
       |SELECT doc_id, n_tokens, terminal_punct, has_braces, has_lorem,
       |       word_len_ok,
       |       terminal_punct AND NOT has_braces AND NOT has_lorem
       |         AND n_tokens >= 5 AND word_len_ok AS kept
       |FROM f""".stripMargin
  }

  private val MIX_BUDGET = 20000L

  /** Temperature-scaled source-mixture plan (the multilingual/multi-source
    * sampling-rate computation, α = 0.5): per-source weights ∝ √tokens —
    * up-weighting tail sources exactly as temperature sampling prescribes
    * — allocated against a fixed token budget. Engine-exactness: the √ is
    * IEEE-correctly-rounded in both engines and immediately quantized to
    * an integer weight (the nudged round), so the allocation is BIGINT
    * floor arithmetic and the sample rate is one exact double division.
    * Scale shape: one token-count agg (map-side partials), then a
    * broadcast of the 1-row weight total — the corpus never moves.
    */
  def mixturePlan(spark: SparkSession, sfDir: String): DataFrame = {
    // the per-source frame feeds both its own total and the final select —
    // cache it or the corpus token-count scan runs twice
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("w",
        round(sqrt(col("n_tokens").cast("double")) + lit(1e-9), 0)
          .cast("long"))
      .cache()
    val total = counts.agg(sum(col("w")).as("tw"))
    counts.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), col("w"),
        expr(s"(w * $MIX_BUDGET) div tw").as("alloc_tokens"))
      .withColumn("sample_rate",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(least(lit(1.0),
            col("alloc_tokens").cast("double") / col("n_tokens"))))
  }

  val mixturePlanSql: String = {
    val nTokSql = "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
    s"""WITH c AS (
       |  SELECT source, CAST(SUM($nTokSql) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), w AS (
       |  SELECT source, n_tokens,
       |         CAST(ROUND(sqrt(n_tokens::DOUBLE) + 1e-9, 0) AS BIGINT) AS w
       |  FROM c
       |), t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w)
       |SELECT source, n_tokens, w,
       |       (w * $MIX_BUDGET) // tw AS alloc_tokens,
       |       CASE WHEN n_tokens = 0 THEN 0.0
       |            ELSE least(1.0,
       |              CAST((w * $MIX_BUDGET) // tw AS DOUBLE) / n_tokens)
       |       END AS sample_rate
       |FROM w, t""".stripMargin
  }

  /** Mixture EXECUTION — the admission pass after [[mixturePlan]]: each
    * document is admitted iff its md5 coin lands under its source's exact
    * ppm allocation rate (alloc_tokens·10⁶ div n_tokens, capped at 10⁶).
    * The coin is md5("mix#" + doc_id) — deterministic across runs and
    * engines, and INDEPENDENT of the rate: when a re-plan on a grown
    * corpus lowers a source's rate, the admitted set of that source
    * shrinks monotonically (hash-threshold sampling's reproducible-recipe
    * property); no reshuffle of previously admitted docs ever occurs.
    * Output: per-source plan allocation vs realized admission (doc and
    * token mass), every column an exact integer.
    *
    * Scale shape: the plan is a |sources|-row broadcast; admission is one
    * codegen'd hash-compare inside the document scan; the rollup is a
    * two-phase agg on source. Zero shuffles beyond mixture_plan's own.
    */
  def mixtureExecute(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = mixturePlan(spark, sfDir)
      .select(col("source"), col("alloc_tokens"),
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(least(lit(1000000L),
            expr("(alloc_tokens * 1000000) div n_tokens"))).as("rate_ppm"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("toks"))
    docs.join(broadcast(rates), "source")
      .withColumn("admit",
        graft.ops.Dedup.md5Long(
          concat(lit("mix#"), col("doc_id").cast("string"))) % 1000000L
          < col("rate_ppm"))
      .groupBy(col("source"))
      .agg(
        first(col("alloc_tokens")).as("alloc_tokens"),
        first(col("rate_ppm")).as("rate_ppm"),
        count(lit(1)).as("n_docs"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("admitted_docs"),
        sum(when(col("admit"), col("toks")).otherwise(0L))
          .as("admitted_tokens"))
  }

  val mixtureExecuteSql: String = {
    val nTokSql = "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
    val coin = OracleSql.hexIntSql("'mix#' || doc_id")
    s"""WITH plan AS ($mixturePlanSql
       |), r AS (
       |  SELECT source, alloc_tokens,
       |         CASE WHEN n_tokens = 0 THEN 0
       |              ELSE least(1000000, (alloc_tokens * 1000000) // n_tokens)
       |         END AS rate_ppm
       |  FROM plan
       |), d AS (
       |  SELECT doc_id, source, $nTokSql AS toks,
       |         $coin % 1000000 AS coin
       |  FROM documents
       |)
       |SELECT d.source, MAX(r.alloc_tokens) AS alloc_tokens,
       |       MAX(r.rate_ppm) AS rate_ppm,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(CASE WHEN coin < rate_ppm THEN 1 ELSE 0 END)
       |         AS BIGINT) AS admitted_docs,
       |       CAST(SUM(CASE WHEN coin < rate_ppm THEN toks ELSE 0 END)
       |         AS BIGINT) AS admitted_tokens
       |FROM d JOIN r ON d.source = r.source
       |GROUP BY d.source""".stripMargin
  }

  private val STRAT_K = 20

  /** Stratified EXACT-k sampling — the eval-panel / labeling-budget
    * selection step: the k docs with the smallest md5 coins per language
    * stratum (deterministic across engines, runs and partitionings; the
    * coin is salted "strat#" so it is independent of every other md5 use
    * of doc_id). Complements [[mixtureExecute]]'s rate sampling with
    * exact quotas.
    *
    * Scale shape (the r4 low-cardinality-window rule): a naive
    * per-lang ROW_NUMBER window is one task per stratum — ~5 tasks
    * sorting the planet. Instead, two-phase top-k: a local k-smallest
    * window keyed by (spark_partition_id, lang) — cardinality scales
    * with tasks, and it is LOSSLESS for any partitioning because each
    * true global top-k row survives its own partition's local top-k —
    * then the per-lang window runs over the ≤ k·P·L survivors frame
    * only. The plan test pins the pid-keyed window.
    */
  def evalPanelSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coin = graft.ops.Dedup.md5Long(
      concat(lit("strat#"), col("doc_id").cast("string")))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), coin.as("coin"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid"), col("lang"))
      .orderBy(col("coin").asc, col("doc_id").asc)
    val survivors = docs
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= STRAT_K)
      .select(col("doc_id"), col("lang"), col("coin"))
    val wGlobal = Window.partitionBy(col("lang"))
      .orderBy(col("coin").asc, col("doc_id").asc)
    survivors
      .withColumn("rank", row_number().over(wGlobal).cast("long"))
      .filter(col("rank") <= STRAT_K)
      .select(col("lang"), col("rank"), col("doc_id"), col("coin"))
  }

  val evalPanelSampleSql: String = {
    val coin = OracleSql.hexIntSql("'strat#' || doc_id")
    s"""WITH d AS (
       |  SELECT doc_id, lang, $coin AS coin FROM documents
       |)
       |SELECT lang, rank, doc_id, coin FROM (
       |  SELECT lang, doc_id, coin,
       |         ROW_NUMBER() OVER (PARTITION BY lang
       |                            ORDER BY coin, doc_id) AS rank
       |  FROM d) r
       |WHERE rank <= $STRAT_K""".stripMargin
  }

  /** Model-based quality classification — the stage real pipelines (CCNet,
    * DCLM) run AFTER the heuristic filters ([[c4Filters]], `text_stats`'
    * ratio score): a linear classifier over hashed token features. Tokens
    * hash into [[graft.functions.HashedLinearModel.Buckets]] buckets, each
    * bucket carries an integer weight, the per-document sum is the score.
    * The weights are a deterministic synthetic model (no trained weights
    * ship in this container — the declared-stub discipline of
    * `ops/Multimodal`); the operator shape is the production one, and a
    * trained model swaps in as a broadcast bucket→weight lookup under the
    * same contract.
    *
    * Scale shape: the ENTIRE model evaluation is one codegen expression
    * inside the document scan — zero exchanges (plan-pinned). The
    * explode-based restatement would shuffle every token of a 100 TB
    * corpus to compute a row-local sum. Integer score exact and
    * order-independent; the logit is one double division at the end
    * (+1e-9-nudged 6-decimal round, the ratio discipline).
    *
    * Output: (doc_id, n_tokens, score_q, logit, keep).
    */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{HashedLinearModel => M, TextModelFunctions}
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        TextModelFunctions.hashed_linear_score(toks).as("score_q"))
      .withColumn("logit",
        round(col("score_q").cast("double") /
          (lit(M.WeightCenter) * greatest(col("n_tokens"), lit(1L)))
            .cast("double") + lit(1e-9), 6))
      .withColumn("keep", col("score_q") > 0)
  }

  val qualityClassifierSql: String = {
    import graft.functions.{HashedLinearModel => M}
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS t
       |  FROM documents
       |), w AS (
       |  SELECT doc_id,
       |         ((${OracleSql.hexIntSql("t")} % ${M.Buckets}) * ${M.WeightMul}
       |           + ${M.WeightAdd}) % ${M.WeightMod} - ${M.WeightCenter} AS wt
       |  FROM toks
       |), s AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(wt) AS BIGINT) AS score_q
       |  FROM w GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       COALESCE(s.n_tokens, 0) AS n_tokens,
       |       COALESCE(s.score_q, 0) AS score_q,
       |       ROUND(CAST(COALESCE(s.score_q, 0) AS DOUBLE)
       |             / (${M.WeightCenter} * GREATEST(COALESCE(s.n_tokens, 0), 1))
       |             + 1e-9, 6) AS logit,
       |       COALESCE(s.score_q, 0) > 0 AS keep
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""".stripMargin
  }

  /** IN-ENGINE TRAINED quality classifier — the checked form of
    * [[qualityClassifier]]'s "trained weights swap in as a broadcast
    * bucket lookup" claim. Supervision comes from the corpus itself: the
    * quality-score heuristic labels documents (quality ≥ 0.4 — a rule
    * whose signal, stopword counts and length, genuinely lives in the
    * token buckets the model sees; the C4 `kept` rule is degenerate on
    * this corpus, no terminal punctuation anywhere), and a
    * Rocchio/centroid-difference pass learns one integer weight per
    * hashed token bucket —
    * weight_b = round(1000·(mean count in kept docs − mean count in
    * dropped docs)). Training is pure aggregation: BIGINT per-class
    * bucket-count sums (order-independent), ONE double division per
    * class at the end, nudged rounding — the k-means discipline applied
    * to a text model. Scoring is the identical bucket contract as the
    * synthetic model: feats ⨝ broadcast(weights) → exact integer sum.
    *
    * 100 TB shape: weights ≤ Buckets rows (broadcast-bounded like IVF
    * centroids), the corpus shuffles only (doc, bucket, count) int rows,
    * and both training and scoring reuse the same feature frame.
    *
    * Output: (doc_id, score_t, keep_trained, label_q).
    */
  def qualityClassifierTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val (weights, theta) = rocchioModel(spark, sfDir)
    rocchioScore(spark, sfDir, weights, theta)
  }

  /** Content-memoized trained model: ((b, w) weights frame, 1-row theta).
    *
    * `quality_classifier_trained` and `quality_from_artifact` both need
    * the identical trained model, and the bench runs them as independent
    * queries — without a memo the pair pays the full training aggregation
    * twice. The model is broadcast-bounded BY DESIGN (≤ Buckets = 32768
    * (b, w) rows + one double; scoring already ships it to every executor
    * as a broadcast), so holding one driver-side copy per corpus is the
    * same memory contract, and rebuilding the frames from the memo is one
    * `createDataFrame` on model-sized data — no corpus work. The memo key
    * fingerprints the documents parquet files (path, size, mtime), so a
    * changed corpus — other SF dirs, spec temp dirs, rewritten fixtures —
    * retrains instead of reusing a stale model.
    */
  private val rocchioMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[(Long, Long)], Double)]()

  private def docsFingerprint(sfDir: String): String =
    graft.io.Fingerprint.ofRefreshing(sfDir, "documents")

  private[jobs] def rocchioModel(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val (bw, theta) = rocchioMemo.computeIfAbsent(docsFingerprint(sfDir), _ => {
      val (weights, thetaDf) = rocchioTrain(spark, sfDir)
      val w = weights.select(col("b"), col("w")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      (w, thetaDf.collect()(0).getDouble(0))
    })
    import spark.implicits._
    (bw.toSeq.toDF("b", "w"), Seq(theta).toDF("theta"))
  }

  /** Heuristic supervision labels (doc_id, kept): quality ≥ 0.4. */
  private[jobs] def rocchioLabels(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"),
      (TextAnalysis.qualityScore(
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.stopwordCount(col("text"))) >= 0.4).as("kept"))

  /** Hashed-bucket count features (doc_id, b, cnt) — shared verbatim by
    * the training and scoring passes, so a persisted model scores the
    * exact feature space it was trained on.
    */
  private[jobs] def rocchioFeats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{HashedLinearModel => M}
    import graft.ops.Dedup
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"), (Dedup.md5Long(col("t")) % M.Buckets).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
  }

  /** The training half: per-bucket Rocchio weights (b, sg, sb, ng, nb, w)
    * and the 1-row midpoint threshold frame (theta) — both
    * broadcast-bounded model artifacts a production pipeline persists
    * once and scores from many times ([[ArtifactJobs]]).
    */
  private[jobs] def rocchioTrain(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val labels = rocchioLabels(spark, sfDir)
    val feats = rocchioFeats(spark, sfDir)
    val nCls = broadcast(labels.agg(
      sum(when(col("kept"), 1L).otherwise(0L)).as("ng"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("nb")))
    val stats = feats.join(labels, "doc_id")
      .groupBy(col("b"))
      .agg(coalesce(sum(when(col("kept"), col("cnt"))), lit(0L)).as("sg"),
        coalesce(sum(when(!col("kept"), col("cnt"))), lit(0L)).as("sb"))
      .crossJoin(nCls)
    val weights = broadcast(stats
      .select(col("b"), col("sg"), col("sb"), col("ng"), col("nb"),
        round(lit(1000.0) * col("sg") / greatest(col("ng"), lit(1L))
          - lit(1000.0) * col("sb") / greatest(col("nb"), lit(1L))
          + lit(1e-9)).cast("long").as("w")))
    // the Rocchio decision boundary: w·x > (w·μ_good + w·μ_bad)/2 — the
    // midpoint between the class centroids' own scores (a 0 threshold is
    // degenerate when one class dominates every bucket, e.g. longer docs)
    val theta = broadcast(weights
      .agg(sum(col("w") * col("sg")).as("swg"),
        sum(col("w") * col("sb")).as("swb"),
        max(col("ng")).as("ng"), max(col("nb")).as("nb"))
      .select(((col("swg").cast("double") / greatest(col("ng"), lit(1L))
        + col("swb").cast("double") / greatest(col("nb"), lit(1L)))
        / lit(2.0)).as("theta")))
    (weights, theta)
  }

  /** The scoring half: exact integer scoring join against a (b, w) weight
    * table + 1-row theta frame — in-line trained or loaded from parquet,
    * the arithmetic is identical.
    */
  private[jobs] def rocchioScore(spark: SparkSession, sfDir: String,
      weightsBW: DataFrame, theta: DataFrame): DataFrame = {
    val labels = rocchioLabels(spark, sfDir)
    val scores = rocchioFeats(spark, sfDir)
      .join(broadcast(weightsBW), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("w")).as("score_t"))
    labels.join(scores, Seq("doc_id"), "left").crossJoin(broadcast(theta))
      .select(col("doc_id"),
        coalesce(col("score_t"), lit(0L)).as("score_t"),
        (coalesce(col("score_t"), lit(0L)).cast("double") > col("theta"))
          .as("keep_trained"),
        col("kept").as("label_q"))
  }

  /** Oracle restates label rule, bucket features, per-class BIGINT sums,
    * the nudged weight rounding (identical association order), and the
    * exact integer scoring join.
    */
  val qualityClassifierTrainedSql: String = {
    import graft.functions.{HashedLinearModel => M}
    val nTok = "CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE)"
    val nStop = "CAST(length(regexp_extract_all(text, " +
      "'\\b(the|a|of|and|to|in|is|on|for|with)\\b')) AS DOUBLE)"
    s"""WITH labels AS (
       |  SELECT doc_id,
       |         ROUND(least($nTok / 100.0, 1.0) * 0.6
       |           + ($nStop / CAST(greatest(
       |               length(regexp_extract_all(text, '[A-Za-z0-9]+')), 1)
       |               AS DOUBLE)) * 0.4
       |           + 1e-9, 4) >= 0.4 AS kept
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS t
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, ${OracleSql.hexIntSql("t")} % ${M.Buckets} AS b,
       |         COUNT(*) AS cnt
       |  FROM toks GROUP BY 1, 2
       |), ncls AS (
       |  SELECT CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS ng,
       |         CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS nb
       |  FROM labels
       |), stats AS (
       |  SELECT b,
       |         CAST(COALESCE(SUM(CASE WHEN kept THEN cnt END), 0) AS BIGINT)
       |           AS sg,
       |         CAST(COALESCE(SUM(CASE WHEN NOT kept THEN cnt END), 0) AS BIGINT)
       |           AS sb
       |  FROM feats JOIN labels USING (doc_id) GROUP BY b
       |), weights AS (
       |  SELECT b, sg, sb, ng, nb,
       |         CAST(ROUND(1000.0 * sg / GREATEST(ng, 1)
       |                    - 1000.0 * sb / GREATEST(nb, 1) + 1e-9, 0) AS BIGINT)
       |           AS w
       |  FROM stats CROSS JOIN ncls
       |), theta AS (
       |  SELECT (CAST(SUM(w * sg) AS DOUBLE) / GREATEST(MAX(ng), 1)
       |          + CAST(SUM(w * sb) AS DOUBLE) / GREATEST(MAX(nb), 1))
       |         / 2.0 AS theta
       |  FROM weights
       |), scores AS (
       |  SELECT doc_id, CAST(SUM(cnt * w) AS BIGINT) AS score_t
       |  FROM feats JOIN weights USING (b) GROUP BY doc_id
       |)
       |SELECT l.doc_id,
       |       COALESCE(s.score_t, 0) AS score_t,
       |       CAST(COALESCE(s.score_t, 0) AS DOUBLE) > theta AS keep_trained,
       |       l.kept AS label_q
       |FROM labels l LEFT JOIN scores s ON l.doc_id = s.doc_id
       |CROSS JOIN theta""".stripMargin
  }

  /** Cross-tokenizer comparison — the query that PICKS the tokenizer: all
    * three trained tokenizers (BPE, unigram/SentencePiece, WordPiece)
    * scored over the same corpus, aggregated per source: token totals and
    * chars-per-token compression. Composes the three gate encoders
    * unchanged (one doc_id-keyed join of their per-doc accounting frames);
    * the per-source ratios are BIGINT÷BIGINT double divisions — exact and
    * engine-identical — under the usual +1e-9 nudged 4-decimal rounding.
    *
    * Scale shape: each encoder is the already-audited vocab-broadcast
    * join; the comparison adds one doc-keyed join lineage and a 20-key
    * two-phase agg — nothing new shuffles on strings.
    */
  def tokenizerCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val b = bpeEncode(spark, sfDir)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    val u = unigramEncode(spark, sfDir)
      .select(col("doc_id"), col("n_unigram_pieces"))
    val w = wordpieceEncode(spark, sfDir)
      .select(col("doc_id"), col("n_wp_tokens"))
    def cpt(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(sum(col("n_chars")).cast("double") / tok.cast("double") + lit(1e-9), 4)
    docs.join(b, "doc_id").join(u, "doc_id").join(w, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_chars")).as("chars"),
        sum(col("n_bpe_tokens")).as("bpe_tokens"),
        sum(col("n_unigram_pieces")).as("unigram_pieces"),
        sum(col("n_wp_tokens")).as("wp_tokens"),
        cpt(sum(col("n_bpe_tokens"))).as("chars_per_bpe"),
        cpt(sum(col("n_unigram_pieces"))).as("chars_per_unigram"),
        cpt(sum(col("n_wp_tokens"))).as("chars_per_wp"))
  }

  /** Oracle: the three encode oracles verbatim as nested-WITH CTEs (each
    * is self-contained, so the composition is purely syntactic), joined
    * per doc and aggregated identically.
    */
  val tokenizerCompareSql: String =
    s"""WITH bpe AS ($bpeEncodeSql),
       |uni AS ($unigramEncodeSql),
       |wp AS ($wordpieceEncodeSql),
       |j AS (
       |  SELECT d.source, d.n_chars, b.n_words, b.n_bpe_tokens,
       |         u.n_unigram_pieces, w.n_wp_tokens
       |  FROM documents d
       |  JOIN bpe b ON b.doc_id = d.doc_id
       |  JOIN uni u ON u.doc_id = d.doc_id
       |  JOIN wp w ON w.doc_id = d.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS words,
       |       CAST(SUM(n_chars) AS BIGINT) AS chars,
       |       CAST(SUM(n_bpe_tokens) AS BIGINT) AS bpe_tokens,
       |       CAST(SUM(n_unigram_pieces) AS BIGINT) AS unigram_pieces,
       |       CAST(SUM(n_wp_tokens) AS BIGINT) AS wp_tokens,
       |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe_tokens) AS DOUBLE) + 1e-9, 4) AS chars_per_bpe,
       |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_unigram_pieces) AS DOUBLE) + 1e-9, 4) AS chars_per_unigram,
       |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_wp_tokens) AS DOUBLE) + 1e-9, 4) AS chars_per_wp
       |FROM j GROUP BY source""".stripMargin

  /** [[tokenizerEval]] split: doc_id % 5 == 0 (20%) is HELD OUT; the
    * other 80% trains. Probed non-degenerate at every fixture SF
    * (held-out docs 100/100/1000; vocabulary is CLOSED — all 31 held-out
    * words also occur in train and chars are fully covered, so the OOV
    * fallback columns are asserted-zero contracts, not live branches).
    */
  private val EVAL_HOLD_MOD = 5

  /** Held-out tokenizer evaluation — the number that PICKS a vocab size:
    * train all three tokenizers on the 80% split, serve the 20% the
    * trainers never saw through each one's true INFERENCE path (BPE
    * rank-order merge apply, WordPiece greedy longest-match, unigram
    * Viterbi under the full final scores), and report per-tokenizer
    * held-out compression (chars/token, tokens/word). Unlike
    * [[tokenizerCompare]] — which scores the TRAINING corpus — this is
    * the generalization metric: a tokenizer that memorizes its corpus
    * reads artificially well there and pays on fresh text.
    *
    * OOV accounting follows the registered conventions: WordPiece words
    * without full symbol coverage count 1 ([UNK]); unigram words with an
    * uncovered char take the byte fallback (length(w) pieces, the
    * `unigram_encode_fallback` rule); BPE has no OOV concept (char
    * symbols always apply). Coverage is the explicit char-level
    * predicate on BOTH engines, under which greedy/Viterbi always
    * complete and the documented greedy = lexicographic-argmax
    * equivalences hold.
    *
    * Scale shape: three vocab-sized half-corpus trainings (each one
    * distributed word count + a single-task recurrence, content-memoized
    * per split under the [[bpeModel]] contract), inference as a
    * distributed map over DISTINCT held-out words with the vocab-sized
    * models in the closure, then int-keyed per-doc joins and a 3-row
    * aggregate. The corpus is scanned twice (train count, held-out
    * accounting); nothing quadratic, no string join wider than the
    * word column the accounting already carries.
    */
  def tokenizerEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val trainF = col("doc_id") % EVAL_HOLD_MOD =!= 0
    val merges = bpeModel(spark, sfDir, ":ev", trainF)._1
      .map { case (_, l, r, _) => (l, r) }
    val (wpMerges, wpEnc) = wordpieceModel(spark, sfDir, ":ev", trainF)
    val wpVocab: Set[String] =
      wpEnc.iterator.flatMap { case (w, _) => wpInitSyms(w) }.toSet ++
        wpMerges.iterator.map { case (_, l, r, _, _) =>
          l + r.stripPrefix("##")
        }
    val uniScores: Map[String, Long] =
      unigramModel(spark, sfDir, ":ev", trainF)._3.toMap
    val uniChars: Set[Char] =
      uniScores.keysIterator.filter(_.length == 1).map(_.head).toSet
    val hold = Tables.documents(spark, sfDir)
      .where(col("doc_id") % EVAL_HOLD_MOD === 0)
    val dw = hold
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("k"))
    val tok = dw.select(col("w")).distinct().as[String]
      .map { w =>
        val tb = bpeApplyMerges(w, merges).length.toLong
        val wpCov = wpVocab.contains(w.substring(0, 1)) &&
          w.drop(1).forall(c => wpVocab.contains("##" + c))
        val tw = if (wpCov) wpGreedySegment(w, wpVocab).length.toLong else 1L
        val uCov = w.forall(uniChars.contains)
        val tu =
          if (uCov) viterbi(w, uniScores).length.toLong else w.length.toLong
        (w, tb, tw, if (wpCov) 0L else 1L, tu, if (uCov) 0L else 1L)
      }.toDF("w", "t_bpe", "t_wp", "o_wp", "t_uni", "o_uni")
    val perDoc = dw.join(tok, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_words"),
        sum(col("k") * col("t_bpe")).as("bpe_t"),
        sum(col("k") * col("t_wp")).as("wp_t"),
        sum(col("k") * col("o_wp")).as("wp_oov"),
        sum(col("k") * col("t_uni")).as("uni_t"),
        sum(col("k") * col("o_uni")).as("uni_oov"))
    hold.select(col("doc_id"), col("n_chars")).join(perDoc, "doc_id")
      .select(explode(array(
        struct(lit("bpe").as("tokenizer"), col("n_chars"), col("n_words"),
          col("bpe_t").as("tokens"), lit(0L).as("oov")),
        struct(lit("unigram").as("tokenizer"), col("n_chars"),
          col("n_words"), col("uni_t").as("tokens"),
          col("uni_oov").as("oov")),
        struct(lit("wordpiece").as("tokenizer"), col("n_chars"),
          col("n_words"), col("wp_t").as("tokens"),
          col("wp_oov").as("oov")))).as("r"))
      .select(col("r.*"))
      .groupBy(col("tokenizer"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words"),
        sum(col("n_chars")).as("chars"),
        sum(col("tokens")).as("tokens"),
        sum(col("oov")).as("oov_words"),
        round(sum(col("n_chars")).cast("double") /
          sum(col("tokens")).cast("double") + lit(1e-9), 4)
          .as("chars_per_token"),
        round(sum(col("tokens")).cast("double") /
          sum(col("n_words")).cast("double") + lit(1e-9), 4)
          .as("tokens_per_word"))
  }

  private lazy val evalTrainWhere = s"WHERE doc_id % $EVAL_HOLD_MOD != 0"
  private lazy val evalHoldWhere = s"WHERE doc_id % $EVAL_HOLD_MOD = 0"

  /** Per-doc BPE accounting on the held-out split under the half-trained
    * merge tables: the [[bpeGreedySql]] apply-loop restatement over the
    * held-out word set.
    */
  private lazy val bpeHoldSql: String = {
    val applyCtes = (1 to BPE_ROUNDS).map { r =>
      s"""g$r AS (
         |  SELECT w, COALESCE(replace(repr,
         |           '|' || m.left_sym || '||' || m.right_sym || '|',
         |           '|' || m.left_sym || m.right_sym || '|'), repr) AS repr
         |  FROM g${r - 1} LEFT JOIN m$r m ON TRUE
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${bpeVocabCtesFor(evalTrainWhere)}, hw AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |), g0 AS (
       |  SELECT w, substr('|' || regexp_replace(w, '(.)', '\\1||', 'g'),
       |           1, 3 * length(w)) AS repr
       |  FROM hw
       |), $applyCtes, enc AS (
       |  SELECT w, CAST(len(string_split(substr(repr, 2, length(repr) - 2),
       |           '||')) AS BIGINT) AS n_tok
       |  FROM g$BPE_ROUNDS
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       |       CAST(SUM(k * n_tok) AS BIGINT) AS t_bpe
       |FROM dw JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin
  }

  /** Per-doc WordPiece accounting on the held-out split: the
    * [[wordpieceGreedySql]] all-segmentations argmax over held-out words
    * whose symbols the half-trained vocabulary fully covers (the same
    * char-coverage predicate the Spark side applies — under coverage
    * greedy is the lexicographic-max lenseq); uncovered words count 1
    * ([UNK]) via the LEFT-join fallback.
    */
  private lazy val wpHoldSql: String = {
    val mergedUnion = (1 to WP_ROUNDS)
      .map(r => s"SELECT merged AS piece FROM m$r").mkString(" UNION ")
    s"""WITH RECURSIVE ${wpVocabCtesFor(evalTrainWhere)}, vocab AS MATERIALIZED (
       |  SELECT DISTINCT sym AS piece FROM (
       |    SELECT unnest(string_split(substr(repr, 2, length(repr) - 2),
       |             '||')) AS sym
       |    FROM wv0)
       |  UNION $mergedUnion
       |), hw AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |), wsym AS (
       |  SELECT w, CASE WHEN i = 1 THEN substr(w, 1, 1)
       |              ELSE '##' || substr(w, i, 1) END AS sym
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i FROM hw)
       |), cov AS MATERIALIZED (
       |  SELECT s.w FROM wsym s LEFT JOIN vocab v ON v.piece = s.sym
       |  GROUP BY s.w HAVING COUNT(*) = COUNT(v.piece)
       |), reach AS (
       |  SELECT w, 0 AS pos, '' AS lenseq FROM cov
       |  UNION ALL
       |  SELECT r.w,
       |         r.pos + length(v.piece) - CASE WHEN r.pos = 0 THEN 0 ELSE 2 END,
       |         r.lenseq || lpad(CAST(length(v.piece)
       |           - CASE WHEN r.pos = 0 THEN 0 ELSE 2 END AS VARCHAR), 2, '0')
       |  FROM reach r JOIN vocab v ON
       |    CASE WHEN r.pos = 0
       |      THEN v.piece NOT LIKE '##%'
       |       AND substr(r.w, 1, length(v.piece)) = v.piece
       |      ELSE v.piece LIKE '##%'
       |       AND substr(r.w, r.pos + 1, length(v.piece) - 2) = substr(v.piece, 3)
       |    END
       |  WHERE r.pos < length(r.w)
       |), best AS (
       |  SELECT w, CAST(length(lenseq) // 2 AS BIGINT) AS n_pieces FROM (
       |    SELECT w, lenseq, ROW_NUMBER() OVER (PARTITION BY w
       |      ORDER BY lenseq DESC) AS rn
       |    FROM reach WHERE pos = length(w)) b
       |  WHERE rn = 1
       |), dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id,
       |       CAST(SUM(k * COALESCE(n_pieces, 1)) AS BIGINT) AS t_wp,
       |       CAST(SUM(CASE WHEN n_pieces IS NULL THEN k ELSE 0 END)
       |            AS BIGINT) AS o_wp
       |FROM dw LEFT JOIN best USING (w)
       |GROUP BY doc_id""".stripMargin
  }

  /** Per-doc unigram accounting on the held-out split: a Viterbi pass
    * (the [[uniReachCte]] machinery) against the half-trained full
    * scores `v2`, serving the held-out words whose chars `v2` covers;
    * uncovered words take the byte fallback (length(w) pieces — the
    * `unigram_encode_fallback` convention).
    */
  private lazy val uniHoldSql: String =
    s"""WITH RECURSIVE ${unigramVocabCtesFor(evalTrainWhere)}, hw AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |), hsym AS (
       |  SELECT w, substr(w, i, 1) AS sym
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i FROM hw)
       |), hcov AS MATERIALIZED (
       |  SELECT s.w, CAST(1 AS BIGINT) AS cnt
       |  FROM hsym s LEFT JOIN
       |    (SELECT piece FROM v2 WHERE length(piece) = 1) c
       |    ON c.piece = s.sym
       |  GROUP BY s.w HAVING COUNT(*) = COUNT(c.piece)
       |), ${uniReachCte(3, "v2", "hcov")}, dw AS (
       |  SELECT doc_id, w, COUNT(*) AS k FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS w
       |    FROM documents $evalHoldWhere)
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id,
       |       CAST(SUM(k * COALESCE(np, length(w))) AS BIGINT) AS t_uni,
       |       CAST(SUM(CASE WHEN np IS NULL THEN k ELSE 0 END) AS BIGINT)
       |         AS o_uni
       |FROM dw LEFT JOIN (SELECT w, np FROM best3) e USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Oracle: the three held-out accounting sub-oracles composed as
    * nested-WITH CTEs (the [[tokenizerCompareSql]] pattern — each is
    * self-contained, so composition is purely syntactic), joined per doc
    * and exploded to one row per tokenizer. `j` is diamond-referenced
    * (3x) — MATERIALIZED per the r11 rule.
    */
  lazy val tokenizerEvalSql: String =
    s"""WITH b AS ($bpeHoldSql),
       |u AS ($uniHoldSql),
       |wp AS ($wpHoldSql),
       |j AS MATERIALIZED (
       |  SELECT d.doc_id, d.n_chars, b.n_words, b.t_bpe, u.t_uni, u.o_uni,
       |         wp.t_wp, wp.o_wp
       |  FROM (SELECT doc_id, n_chars FROM documents $evalHoldWhere) d
       |  JOIN b USING (doc_id) JOIN u USING (doc_id) JOIN wp USING (doc_id)
       |), x AS (
       |  SELECT 'bpe' AS tokenizer, n_chars, n_words, t_bpe AS tokens,
       |         CAST(0 AS BIGINT) AS oov FROM j
       |  UNION ALL SELECT 'unigram', n_chars, n_words, t_uni, o_uni FROM j
       |  UNION ALL SELECT 'wordpiece', n_chars, n_words, t_wp, o_wp FROM j
       |)
       |SELECT tokenizer, COUNT(*) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS words,
       |       CAST(SUM(n_chars) AS BIGINT) AS chars,
       |       CAST(SUM(tokens) AS BIGINT) AS tokens,
       |       CAST(SUM(oov) AS BIGINT) AS oov_words,
       |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(tokens) AS DOUBLE) + 1e-9, 4) AS chars_per_token,
       |       ROUND(CAST(SUM(tokens) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE) + 1e-9, 4) AS tokens_per_word
       |FROM x GROUP BY tokenizer""".stripMargin

  private val CDC_W = 8   // rolling-window width (chars)
  private val CDC_D = 32  // boundary divisor → expected chunk ≈ 32 chars

  /** Content-defined chunking (CDC — the rsync/LBFS/storage-dedup
    * technique): a chunk boundary falls after every position whose
    * trailing `CDC_W`-char window hashes ≡ 0 (mod `CDC_D`), plus the doc
    * end. Unlike fixed-width `doc_chunks`, boundaries survive insertions
    * — an edited doc re-chunks to mostly-identical pieces — so chunk
    * identity dedups shared content ACROSS different documents. Output
    * per doc: chunk count plus how many of its chunk occurrences (and
    * bytes) already occurred earlier in (doc_id, start) order — the
    * storage-dedup savings manifest.
    *
    * Engine-exact: the boundary predicate is the md5-prefix integer of
    * the window text (the gram-hash convention) and chunk identity is
    * the 60-bit content hash; first-writer ranking is a chunk-hash-keyed
    * row_number with a total (doc_id, start) order. Collisions are
    * deterministic and identical in both engines.
    *
    * Scale shape: one position explode (linear in corpus chars — the
    * substring-dedup cost family), boundaries filter to ~1/D of
    * positions, and the dedup rank is a two-phase window on
    * high-cardinality 60-bit int keys. Nothing quadratic, no string
    * join keys.
    */
  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .filter(col("n") >= 1)
    // boundary positions in ONE codegen'd rolling-hash pass per row
    // ([[graft.functions.CdcBoundaries]]): no per-position substring, no
    // per-position digest — the Rabin–Karp CDC scan proper
    val bounds = docs
      .select(col("doc_id"),
        explode(graft.functions.CdcBoundaries(col("text"), CDC_W, CDC_D))
          .as("i"))
    val chunks = bounds.join(docs, "doc_id")
      .withColumn("start",
        coalesce(lag(col("i"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("i"))), lit(0)) + 1)
      .withColumn("clen", (col("i") - col("start") + 1).cast("long"))
      .withColumn("ch",
        hash60(expr("substring(text, start, i - start + 1)")))
    val ranked = chunks.withColumn("rn",
      row_number().over(Window.partitionBy(col("ch"))
        .orderBy(col("doc_id"), col("start"))))
    ranked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("rn") > 1, col("clen")).otherwise(0L)).as("dup_bytes"))
  }

  /** Oracle: identical boundary predicate, chunk slicing, and
    * first-writer rank in DuckDB (lateral `range` replaces the guarded
    * sequence — its empty-range semantics need no guard).
    */
  val cdcChunksSql: String = {
    val P = graft.functions.CdcBoundaries.Mod
    val B = graft.functions.CdcBoundaries.Base
    val BW = graft.functions.CdcBoundaries.basePow(CDC_W)
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |  WHERE length(text) >= 1
       |), hpref AS (
       |  SELECT doc_id, 0 AS i, CAST(0 AS BIGINT) AS hv FROM d
       |  UNION ALL
       |  SELECT p.doc_id, p.i + 1,
       |         (p.hv * $B + unicode(substr(d.text, p.i + 1, 1))) % $P
       |  FROM hpref p JOIN d ON d.doc_id = p.doc_id
       |  WHERE p.i < d.n
       |), cand AS (
       |  SELECT h.doc_id, h.i
       |  FROM hpref h
       |  JOIN hpref hw ON hw.doc_id = h.doc_id AND hw.i = h.i - $CDC_W
       |  JOIN d ON d.doc_id = h.doc_id
       |  WHERE h.i >= $CDC_W AND h.i < d.n
       |    AND (((h.hv - (hw.hv * $BW) % $P) % $P + $P) % $P) % $CDC_D = 0
       |), bounds AS (
       |  SELECT doc_id, i FROM cand
       |  UNION ALL SELECT doc_id, n FROM d
       |), chunks AS (
       |  SELECT b.doc_id, b.i,
       |         COALESCE(LAG(b.i) OVER (
       |           PARTITION BY b.doc_id ORDER BY b.i), 0) + 1 AS start,
       |         d.text
       |  FROM bounds b JOIN d USING (doc_id)
       |), hashed AS (
       |  SELECT doc_id, start, CAST(i - start + 1 AS BIGINT) AS clen,
       |         ${hex60Sql("substr(text, start, i - start + 1)")} AS ch
       |  FROM chunks
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY ch ORDER BY doc_id, start) AS rn
       |  FROM hashed
       |)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS dup_chunks,
       |       CAST(SUM(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT)
       |         AS dup_bytes
       |FROM ranked GROUP BY doc_id""".stripMargin
  }

  /** Per-source quality-score calibration: each document's percentile
    * rank of the heuristic quality score WITHIN its source (ppm) — the
    * normalization a mixture plan needs before comparing quality across
    * sources whose score distributions differ (a 0.4 on a clean source
    * and a 0.4 on a crawl dump are not the same document). Rank ties
    * break on doc_id; pct = (rank−1)·10⁶ div max(n_src−1, 1), exact
    * integers end-to-end (the score itself is the 4-decimal-rounded
    * heuristic, carried as a 10⁴-scaled BIGINT).
    *
    * Scale shape: per-source ranking NEVER runs as a source-partitioned
    * window (20 sources = 20 tasks on a corpus-sized frame — the
    * forbidden low-cardinality window). It is the docPacking /
    * training_order distributed prefix-sum: repartitionByRange on
    * (source, score, id) → per-(partition, source) COUNTS → offsets
    * window over the tiny totals frame → broadcast join back; rank =
    * partition offset + local prefix count. The range-partitioned frame
    * is CACHED (round-4 rule: the partitioner samples; two
    * materializations could cut different boundaries).
    */
  def scoreCalibrate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("text")
    val nTok = TextAnalysis.tokenCount(t)
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        round(TextAnalysis.qualityScore(nTok,
          TextAnalysis.stopwordCount(t)) * 10000 + lit(1e-9))
          .cast("long").as("qt"))
    val base = scored
      .repartitionByRange(col("source"), col("qt"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .cache()
    val totals = base.groupBy(col("pid"), col("source"))
      .agg(count(lit(1)).as("part_n"))
    val offsets = totals.withColumn("part_offset",
      coalesce(sum(col("part_n")).over(
        Window.partitionBy(col("source")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("source"), col("part_offset"))
    val srcN = totals.groupBy(col("source"))
      .agg(sum(col("part_n")).as("n_src"))
    val wLocal = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("qt"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), Seq("pid", "source"))
      .join(broadcast(srcN), Seq("source"))
      .withColumn("rnk",
        col("part_offset") + coalesce(count(lit(1)).over(wLocal), lit(0L))
          + 1)
      .select(col("doc_id"), col("source"), col("qt"), col("rnk"),
        expr("((rnk - 1) * 1000000) div greatest(n_src - 1, 1)")
          .as("pct_ppm"))
  }

  /** Oracle: the plain per-source window statement of the same rank
    * (DuckDB is free to sort each source in one pass).
    */
  val scoreCalibrateSql: String = {
    val quality =
      """ROUND(
        |    least(CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE) / 100.0, 1.0) * 0.6 +
        |    (CAST(length(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|on|for|with)\b')) AS DOUBLE)
        |      / CAST(greatest(length(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) AS DOUBLE)) * 0.4
        |    + 1e-9, 4)""".stripMargin
    s"""WITH s AS (
       |  SELECT doc_id, source,
       |         CAST(ROUND($quality * 10000 + 1e-9) AS BIGINT) AS qt
       |  FROM documents
       |), ranked AS (
       |  SELECT *,
       |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY qt, doc_id)
       |           AS rnk,
       |         COUNT(*) OVER (PARTITION BY source) AS n_src
       |  FROM s
       |)
       |SELECT doc_id, source, qt, rnk,
       |       ((rnk - 1) * 1000000) // GREATEST(n_src - 1, 1) AS pct_ppm
       |FROM ranked""".stripMargin
  }

  /** Per-language tokenizer fertility — the number that decides a
    * multilingual vocab budget: how many BPE tokens a language pays per
    * word (`tokens_per_word_ppm`) and how many characters each token
    * covers (`chars_per_token_ppm`), aggregated per lang from the
    * [[bpeEncode]] per-doc counts. Ratios are ppm floor divisions of
    * exact BIGINT sums — engine-exact, no float drift. Scale shape: the
    * encode pass is the already-fenced vocab-join pipeline (trained model
    * memoized per corpus); this adds one doc_id-keyed join to a per-row
    * char-count scan and a |langs|-bounded agg.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = bpeEncode(spark, sfDir)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"),
      length(concat_ws("", TextAnalysis.tokens(lower(col("text")))))
        .cast("long").as("n_word_chars"))
    d.join(enc, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_tokens"),
        sum(col("n_word_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        expr("(n_tokens * 1000000) div n_words").as("tokens_per_word_ppm"),
        expr("(n_chars * 1000000) div n_tokens").as("chars_per_token_ppm"))
  }

  /** Oracle: [[bpeEncodeSql]] composed verbatim (referenced once — linear)
    * + the same integer ratio arithmetic over HUGEINT-cast sums.
    */
  lazy val tokenizerFertilitySql: String =
    s"""WITH enc AS (
       |  SELECT doc_id, n_words, n_bpe_tokens FROM ($bpeEncodeSql) eq
       |), d AS (
       |  SELECT doc_id, lang,
       |         CAST(length(array_to_string(
       |           regexp_extract_all(lower(text), '[A-Za-z0-9]+'), ''))
       |           AS BIGINT) AS n_word_chars
       |  FROM documents
       |)
       |SELECT lang, COUNT(*) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_bpe_tokens) AS BIGINT) AS n_tokens,
       |       CAST(SUM(n_word_chars) AS BIGINT) AS n_chars,
       |       CAST((CAST(SUM(n_bpe_tokens) AS BIGINT) * 1000000)
       |            // CAST(SUM(n_words) AS BIGINT) AS BIGINT)
       |         AS tokens_per_word_ppm,
       |       CAST((CAST(SUM(n_word_chars) AS BIGINT) * 1000000)
       |            // CAST(SUM(n_bpe_tokens) AS BIGINT) AS BIGINT)
       |         AS chars_per_token_ppm
       |FROM d JOIN enc USING (doc_id)
       |GROUP BY lang""".stripMargin

  /** Decile lift table for the trained quality classifier — the gains
    * chart every model eval publishes: documents ranked by trained score
    * (desc, doc_id tie-break), cut into 10 exact floor-arithmetic deciles
    * (the rfm_segments rule — NTILE's remainder is avoided), each decile
    * reporting its positive-label rate against the base rate and the
    * ppm-scaled lift (pos_ppm·10⁶ div base_ppm — both factors ≤ 10⁶, so
    * the product stays far from BIGINT range at any corpus size). The
    * global rank uses the trainingOrder distributed prefix-sum pattern;
    * the trained model is the content-memoized Rocchio pass the other two
    * classifier gates already share.
    */
  def classifierLift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityClassifierTrained(spark, sfDir)
      .select(col("doc_id"), col("score_t"),
        col("label_q").cast("long").as("pos"))
    val b = scored.select(col("doc_id"), col("pos"), (-col("score_t")).as("sk"))
      .repartitionByRange(col("sk"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .cache() // the partitioner samples — pin one boundary cut
    val offsets = b.groupBy(col("pid")).agg(count(lit(1)).as("part_n"))
      .withColumn("part_offset", coalesce(sum(col("part_n")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("part_offset"))
    val totals = scored.agg(count(lit(1)).as("n_total"),
      sum(col("pos")).as("pos_total"))
    b.join(broadcast(offsets), "pid")
      .withColumn("rank", col("part_offset") + row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("sk").asc, col("doc_id").asc)))
      .crossJoin(broadcast(totals))
      .select(expr("((rank - 1) * 10) div n_total + 1").as("decile"),
        col("pos"), col("n_total"), col("pos_total"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        max(col("n_total")).as("n_total"), max(col("pos_total")).as("pos_total"))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        expr("(n_pos * 1000000) div n_docs").as("pos_ppm"),
        expr("(pos_total * 1000000) div n_total").as("base_ppm"),
        expr("(((n_pos * 1000000) div n_docs) * 1000000)" +
          " div greatest((pos_total * 1000000) div n_total, 1)")
          .as("lift_ppm"))
  }

  /** Oracle: [[qualityClassifierTrainedSql]] composed verbatim + the same
    * global rank and floor-decile arithmetic (HUGEINT sums cast back).
    */
  lazy val classifierLiftSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, score_t,
       |         CAST(CASE WHEN label_q THEN 1 ELSE 0 END AS BIGINT) AS pos
       |  FROM ($qualityClassifierTrainedSql) q
       |), t AS (
       |  SELECT COUNT(*) AS n_total, CAST(SUM(pos) AS BIGINT) AS pos_total
       |  FROM scored
       |), r AS (
       |  SELECT pos, ROW_NUMBER() OVER (
       |    ORDER BY -score_t ASC, doc_id ASC) AS rank
       |  FROM scored
       |), d AS (
       |  SELECT ((rank - 1) * 10) // t.n_total + 1 AS decile, pos,
       |         t.n_total, t.pos_total
       |  FROM r CROSS JOIN t
       |)
       |SELECT decile, COUNT(*) AS n_docs, CAST(SUM(pos) AS BIGINT) AS n_pos,
       |       CAST((SUM(pos) * 1000000) // COUNT(*) AS BIGINT) AS pos_ppm,
       |       CAST((MAX(pos_total) * 1000000) // MAX(n_total) AS BIGINT)
       |         AS base_ppm,
       |       CAST((((SUM(pos) * 1000000) // COUNT(*)) * 1000000)
       |            // greatest((MAX(pos_total) * 1000000) // MAX(n_total), 1)
       |            AS BIGINT) AS lift_ppm
       |FROM d GROUP BY decile""".stripMargin

  /** Inter-classifier agreement (Cohen's kappa) between the declared
    * hashed-linear gate ([[qualityClassifier]]) and the trained Rocchio
    * gate ([[qualityClassifierTrained]]) — the eval a pipeline runs
    * before swapping one quality filter for another: how much of the
    * corpus would flip, and is the agreement better than chance. One
    * confusion row of exact counts plus integer-ppm observed/expected
    * agreement and kappa.
    *
    * Arithmetic contract: pe_ppm uses the basket_pairs two-step floor
    * discipline (each product ≤ 10⁶·n, BIGINT-safe at any corpus size);
    * kappa's numerator can be negative, and Spark `div` truncates toward
    * zero where DuckDB `//` floors — so the sign is split out and every
    * division runs on non-negative operands (both engines identical).
    * Composed-eval rule: both inputs are registered pipelines; this
    * layer adds one doc-keyed join + ONE 1-row conditional aggregate.
    */
  def classifierAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val h = qualityClassifier(spark, sfDir).select(col("doc_id"), col("keep"))
    val t = qualityClassifierTrained(spark, sfDir)
      .select(col("doc_id"), col("keep_trained"))
    h.join(t, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep") && col("keep_trained"), 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("keep") && !col("keep_trained"), 1L).otherwise(0L))
          .as("n10"),
        sum(when(!col("keep") && col("keep_trained"), 1L).otherwise(0L))
          .as("n01"),
        sum(when(!col("keep") && !col("keep_trained"), 1L).otherwise(0L))
          .as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("((n11 + n00) * 1000000) div n").as("po_ppm"),
        expr("(((n11 + n10) * 1000000) div n * (n11 + n01)) div n + " +
          "(((n01 + n00) * 1000000) div n * (n10 + n00)) div n").as("pe_ppm"))
      .withColumn("kappa_ppm",
        expr("""CASE WHEN po_ppm >= pe_ppm
               |  THEN ((po_ppm - pe_ppm) * 1000000)
               |       div greatest(1000000 - pe_ppm, 1)
               |  ELSE -(((pe_ppm - po_ppm) * 1000000)
               |         div greatest(1000000 - pe_ppm, 1)) END""".stripMargin))
  }

  /** Oracle: the two classifier SQLs composed verbatim (single-reference
    * CTEs, so no MATERIALIZED needed) + identical confusion/ppm/kappa
    * arithmetic. lazy — composes vals declared later in object init.
    */
  lazy val classifierAgreementSql: String =
    s"""WITH h AS (SELECT doc_id, keep FROM ($qualityClassifierSql) x),
       |t AS (SELECT doc_id, keep_trained
       |      FROM ($qualityClassifierTrainedSql) y),
       |c AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN keep AND keep_trained THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n11,
       |    CAST(SUM(CASE WHEN keep AND NOT keep_trained THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n10,
       |    CAST(SUM(CASE WHEN NOT keep AND keep_trained THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n01,
       |    CAST(SUM(CASE WHEN NOT keep AND NOT keep_trained THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n00
       |  FROM h JOIN t USING (doc_id)
       |), p AS (
       |  SELECT *,
       |    ((n11 + n00) * 1000000) // n AS po_ppm,
       |    (((n11 + n10) * 1000000) // n * (n11 + n01)) // n
       |      + (((n01 + n00) * 1000000) // n * (n10 + n00)) // n AS pe_ppm
       |  FROM c
       |)
       |SELECT n, n11, n10, n01, n00,
       |       CAST(po_ppm AS BIGINT) AS po_ppm,
       |       CAST(pe_ppm AS BIGINT) AS pe_ppm,
       |       CAST(CASE WHEN po_ppm >= pe_ppm
       |         THEN ((po_ppm - pe_ppm) * 1000000)
       |              // greatest(1000000 - pe_ppm, 1)
       |         ELSE -(((pe_ppm - po_ppm) * 1000000)
       |                // greatest(1000000 - pe_ppm, 1)) END AS BIGINT)
       |         AS kappa_ppm
       |FROM p""".stripMargin

  private val TYPEAHEAD_K = 3
  private val TYPEAHEAD_MAXLEN = 4

  /** Search-suggest (typeahead) index: for every token prefix of length
    * 1–4, the top-3 corpus completions by term frequency — the serving
    * table an autocomplete box reads, built beside [[keywordSearch]]'s
    * inverted index. Deterministic rank: (tf DESC, token ASC).
    *
    * 100 TB shape: the corpus collapses to the vocab in ONE token-keyed
    * two-phase aggregate (map-side combinable); the ≤ 4× prefix
    * expansion and the rank run on the vocab-sized frame, and the rank
    * filter is WindowGroupLimit (≤ K rows per prefix per task before
    * the exchange) — the corpus text never shuffles.
    */
  def searchTypeahead(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val prefixes = (1 to TYPEAHEAD_MAXLEN).map { l =>
      tf.filter(length(col("token")) >= l)
        .select(substring(col("token"), 1, l).as("prefix"), col("token"),
          col("tf"))
    }.reduce(_ unionAll _)
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("tf").desc, col("token").asc)
    prefixes.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TYPEAHEAD_K)
  }

  val searchTypeaheadSql: String = {
    val pre = (1 to TYPEAHEAD_MAXLEN).map { l =>
      s"""SELECT substr(token, 1, $l) AS prefix, token, tf
         |  FROM tf WHERE length(token) >= $l""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS token
       |  FROM documents
       |), tf AS (
       |  SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1
       |), pre AS (
       |  $pre
       |)
       |SELECT prefix, token, tf, rn FROM (
       |  SELECT prefix, token, tf, ROW_NUMBER() OVER (
       |    PARTITION BY prefix ORDER BY tf DESC, token ASC) AS rn
       |  FROM pre) r
       |WHERE rn <= $TYPEAHEAD_K""".stripMargin
  }

  // ---- TextRank keyword extraction (graph-over-text) ----

  private val TR_ITERS = 10
  private val TR_TOPK = 20

  /** TextRank (Mihalcea & Tarau 2004) keyword extraction: stopwords are
    * stripped from the text (one regexp_replace — both engines replace
    * globally), the surviving token sequence is paired within a window of
    * 2 (adjacent + skip-one, the r6 arrays_zip explode — no window
    * function), pairs canonicalize to undirected int-hashed edges, and
    * [[graft.ops.Graph.pageRank]]'s integer-exact fixpoint ranks the word
    * graph. Output: top-20 words by rank (tie-break on the word), i.e.
    * corpus keywords by graph centrality rather than frequency —
    * `tfidf_topk`'s counting-based companion.
    *
    * 100 TB shape: tokenize/pair/hash fuse into the document scan
    * (codegen regexps, no UDFs); the graph is VOCAB²-bounded (distinct
    * co-occurring word pairs), orders of magnitude below the corpus, so
    * the fixpoint runs in pageRank's single-task regime here and in its
    * distributed int-keyed regime past 4M edges — the same regime split
    * item_pagerank carries.
    */
  def textrankKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    // slim handoff (r17): the token and edge caches were unmanaged and
    // outlived the query for the JVM lifetime; scope them, checkpoint the
    // 20-row output, release
    val scope = graft.ops.CacheScope()
    try textrankCore(spark, sfDir, scope).eagerCheckpoint()
    finally scope.close()
  }

  /** Spec/audit hook: the un-checkpointed textrank plan. */
  private[graft] def textrankCore(spark: SparkSession, sfDir: String,
      scope: graft.ops.CacheScope): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = regexp_replace(lower(col("text")),
      TextAnalysis.stopwordPattern, " ")
    // Hash-first pairing (r17, guide §2.3 "shuffle keys, not payloads" /
    // r2 int-keys rule applied to the pair EXPLODE): tokens explode ONCE
    // with their position and are md5-hashed ONCE EACH, then the window-2
    // co-occurrence pairs come from two `lead`s over the (doc_id, pos)
    // window — the pair lineage is all-int from birth. The r16 form
    // zipped string pairs and hashed at the pair select (≥2 md5 per pair
    // row ≈ 4 per token; this is 1 per token — ProfileR17 `tr` carries
    // the measured both-ways numbers). The old `w1 <> w2` string guard is
    // equivalent to the kept a <> b int guard (equal strings ⇒ equal
    // hashes, and hash-collision pairs were dropped by a <> b anyway).
    // ONE cached token frame feeds both the pairing window and the vocab
    // map-back.
    val t = scope.cache(Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(clean, lit("[a-z0-9]+"), lit(0)))
          .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), col("w"), hash60(col("w")).as("wh")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val nbr = t.select(col("wh"),
      lead(col("wh"), 1).over(wDoc).as("n1"),
      lead(col("wh"), 2).over(wDoc).as("n2"))
    val e0 = scope.cache(nbr
      .select(col("wh").as("h1"),
        explode(array(col("n1"), col("n2"))).as("h2"))
      .filter(col("h2").isNotNull)
      .select(least(col("h1"), col("h2")).as("a"),
        greatest(col("h1"), col("h2")).as("b"))
      .filter(col("a") =!= col("b")) // drop theoretical hash-collision loops
      .distinct()) // both edge directions read it (r1-2 rule)
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
    val vocab = t
      .select(col("w"), col("wh"))
      .distinct() // vocab-sized final mapping — the legit token-keyed agg
    graft.ops.Graph.pageRank(edges, iters = TR_ITERS)
      .join(vocab, col("node") === col("wh"))
      .orderBy(col("r").desc, col("w").asc)
      .limit(TR_TOPK)
      .select(col("w").as("word"), col("r").as("rank_s"))
  }

  /** Oracle: identical integer recurrence, rounds unrolled as CTEs (the
    * item_pagerank pattern); every CTE the rounds re-reference is
    * MATERIALIZED (r11 diamond rule + the check_oracle fd limit).
    */
  val textrankKeywordsSql: String = {
    // DuckDB single-quoted literals are escape-free: '\b' reaches RE2 as-is
    val stop = TextAnalysis.stopwordPattern
    val rounds = (1 to TR_ITERS).map { i =>
      s"""r$i AS (
         |  SELECT n.node AS node,
         |         CAST(${graft.ops.Graph.PrBase} +
         |              COALESCE(SUM((r.r * 85) // (d.deg * 100)), 0) AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  LEFT JOIN deg d ON d.src = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT regexp_extract_all(
       |           regexp_replace(lower(text), '$stop', ' ', 'g'),
       |           '[a-z0-9]+') AS l
       |  FROM documents),
       |pr AS (
       |  SELECT l[i] AS w1, l[i+1] AS w2
       |  FROM (SELECT l, unnest(range(1, len(l))) AS i FROM toks) t
       |  UNION ALL
       |  SELECT l[i] AS w1, l[i+2] AS w2
       |  FROM (SELECT l, unnest(range(1, len(l) - 1)) AS i FROM toks) t),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(h1, h2) AS a, GREATEST(h1, h2) AS b
       |  FROM (SELECT ${hex60Sql("w1")} AS h1, ${hex60Sql("w2")} AS h2
       |        FROM pr WHERE w1 <> w2) h
       |  WHERE h1 <> h2),
       |edges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0),
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, CAST(${graft.ops.Graph.PrScale} AS BIGINT) AS r
       |       FROM nodes),
       |$rounds,
       |vocab AS MATERIALIZED (
       |  SELECT DISTINCT w, ${hex60Sql("w")} AS wh
       |  FROM (SELECT unnest(l) AS w FROM toks) u)
       |SELECT v.w AS word, r.r AS rank_s
       |FROM r$TR_ITERS r JOIN vocab v ON v.wh = r.node
       |ORDER BY r.r DESC, v.w ASC
       |LIMIT $TR_TOPK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "textrank_keywords" -> textrankKeywords,
    "classifier_agreement" -> classifierAgreement,
    "search_typeahead" -> searchTypeahead,
    "tokenizer_fertility" -> tokenizerFertility,
    "classifier_lift" -> classifierLift,
    "keyword_search" -> keywordSearch,
    "bm25_search" -> bm25Search,
    "term_associations" -> termAssociations,
    "score_calibrate" -> scoreCalibrate,
    "cdc_chunks" -> cdcChunks,
    "tokenizer_compare" -> tokenizerCompare,
    "tokenizer_eval" -> tokenizerEval,
    "quality_classifier" -> qualityClassifier,
    "quality_classifier_trained" -> qualityClassifierTrained,
    "c4_filters" -> c4Filters,
    "mixture_plan" -> mixturePlan,
    "mixture_execute" -> mixtureExecute,
    "eval_panel_sample" -> evalPanelSample,
    "text_redact" -> textRedact,
    "doc_packing" -> docPacking,
    "packing_eval" -> packingEval,
    "doc_chunks" -> docChunks,
    "wordpiece_merges" -> wordpieceMerges,
    "wordpiece_encode" -> wordpieceEncode,
    "wordpiece_greedy" -> wordpieceGreedy,
    "token_rarity" -> tokenRarity,
    "source_stats" -> sourceStats,
    "text_stats" -> textStats,
    "text_langid" -> textLangid,
    "lang_confusion" -> langConfusion,
    "doc_fingerprint" -> docFingerprint,
    "vocab_topk" -> vocabTopK,
    "bpe_merges" -> bpeMerges,
    "unigram_vocab" -> unigramVocab,
    "unigram_encode" -> unigramEncode,
    "unigram_encode_fallback" -> unigramEncodeFallback,
    "bpe_encode" -> bpeEncode,
    "bpe_greedy" -> bpeGreedy,
    "lm_surprise" -> lmSurprise,
    "lm_surprise_ref" -> lmSurpriseRef,
    "vocab_coverage" -> vocabCoverage,
    "heavy_hitters" -> heavyHitters,
    "tfidf_topk" -> tfidfTopK,
    "text_repetition" -> textRepetition)

  val oracles: Map[String, String] = Map(
    "textrank_keywords" -> textrankKeywordsSql,
    "classifier_agreement" -> classifierAgreementSql,
    "search_typeahead" -> searchTypeaheadSql,
    "tokenizer_fertility" -> tokenizerFertilitySql,
    "classifier_lift" -> classifierLiftSql,
    "keyword_search" -> keywordSearchSql,
    "bm25_search" -> bm25SearchSql,
    "term_associations" -> termAssociationsSql,
    "tokenizer_compare" -> tokenizerCompareSql,
    "tokenizer_eval" -> tokenizerEvalSql,
    "cdc_chunks" -> cdcChunksSql,
    "score_calibrate" -> scoreCalibrateSql,
    "quality_classifier" -> qualityClassifierSql,
    "quality_classifier_trained" -> qualityClassifierTrainedSql,
    "c4_filters" -> c4FiltersSql,
    "mixture_plan" -> mixturePlanSql,
    "mixture_execute" -> mixtureExecuteSql,
    "eval_panel_sample" -> evalPanelSampleSql,
    "text_redact" -> textRedactSql,
    "doc_packing" -> docPackingSql,
    "packing_eval" -> packingEvalSql,
    "doc_chunks" -> docChunksSql,
    "wordpiece_merges" -> wordpieceMergesSql,
    "wordpiece_encode" -> wordpieceEncodeSql,
    "wordpiece_greedy" -> wordpieceGreedySql,
    "token_rarity" -> tokenRaritySql,
    "source_stats" -> sourceStatsSql,
    "text_stats" -> textStatsSql,
    "text_langid" -> textLangidSql,
    "lang_confusion" -> langConfusionSql,
    "doc_fingerprint" -> docFingerprintSql,
    "vocab_topk" -> vocabTopKSql,
    "bpe_merges" -> bpeMergesSql,
    "unigram_vocab" -> unigramVocabSql,
    "unigram_encode" -> unigramEncodeSql,
    "unigram_encode_fallback" -> unigramEncodeFallbackSql,
    "bpe_encode" -> bpeEncodeSql,
    "bpe_greedy" -> bpeGreedySql,
    "lm_surprise" -> lmSurpriseSql,
    "lm_surprise_ref" -> lmSurpriseRefSql,
    "vocab_coverage" -> vocabCoverageSql,
    "heavy_hitters" -> heavyHittersSql,
    "tfidf_topk" -> tfidfTopKSql,
    "text_repetition" -> textRepetitionSql)
}
