package graft

import org.apache.spark.sql.functions._
import graft.jobs.TextJobs
import graft.ops.TextAnalysis

/** PII redaction + context-window packing: hand-computed fixtures plus
  * whole-corpus invariants on driver-shaped data.
  */
class TextJobsExtraSpec extends SparkSpec {
  import spark.implicits._

  test("c4 filters trip each rule on a crafted fixture") {
    val dir = java.nio.file.Files.createTempDirectory("c4_docs").toString
    Seq(
      (1L, "this is a perfectly normal little sentence today.", "en", "s", 49L),
      (2L, "ends without terminal punctuation at all here", "en", "s", 45L),
      (3L, "some code follows { return x; } done here now.", "en", "s", 46L),
      (4L, "Lorem Ipsum dolor sit amet filler text page here.", "en", "s", 49L),
      (5L, "too few.", "en", "s", 8L),
      (6L, "aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbb " * 3 +
        "cccccccccccccccccccccccc dddddddddddddddddddddddd eee.", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.c4Filters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("kept"))
    assert(!out(2L).getAs[Boolean]("terminal_punct") &&
      !out(2L).getAs[Boolean]("kept"))
    assert(out(3L).getAs[Boolean]("has_braces") &&
      !out(3L).getAs[Boolean]("kept"))
    assert(out(4L).getAs[Boolean]("has_lorem") &&
      !out(4L).getAs[Boolean]("kept"))
    assert(out(5L).getAs[Long]("n_tokens") < 5 &&
      !out(5L).getAs[Boolean]("kept"))
    // mean word length 24 > 10: Gopher band violated via integer bounds
    assert(!out(6L).getAs[Boolean]("word_len_ok") &&
      !out(6L).getAs[Boolean]("kept"))
  }

  test("mixture plan: budget respected, rates bounded, tail up-weighted") {
    val out = TextJobs.mixturePlan(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum <= 20000L,
      "floor allocation must never exceed the budget")
    assert(out.forall { r =>
      val rate = r.getAs[Double]("sample_rate")
      rate >= 0.0 && rate <= 1.0
    })
    // α=0.5 temperature: a smaller source must get an equal-or-higher
    // sampling RATE than a bigger one (that is the point of the √)
    val sorted = out.sortBy(_.getAs[Long]("n_tokens"))
      .filter(_.getAs[Long]("n_tokens") > 0)
    if (sorted.length >= 2)
      assert(sorted.head.getAs[Double]("sample_rate") >=
        sorted.last.getAs[Double]("sample_rate") - 1e-9)
  }

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

  test("vocab_coverage: rates bounded, totals cover the corpus, OOV exists") {
    val out = TextJobs.vocabCoverage(spark, sf("sf0.001"))
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 500)
    assert(out.forall(t => t._3 >= 0 && t._3 <= t._2))
    assert(out.forall(t => t._4 >= 0.0 && t._4 <= 1.0))
    // the 20-entry vocab cannot cover the 31-token corpus: OOV mass exists
    assert(out.map(_._3).sum > 0)
    val want = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select(sum(graft.ops.TextAnalysis.tokenCount($"text")))
      .as[Long].head()
    assert(out.map(_._2).sum == want)
  }

  test("heavy_hitters: CMS estimates pass the ε·N gate on the exact top-K") {
    val out = TextJobs.heavyHitters(spark, sf("sf0.001"))
      .select($"token", $"n", $"cms_in_bounds")
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 10)
    assert(out.forall(_._3), "a CMS estimate fell outside the ε·N envelope")
    // exact top-K agrees with a direct count
    val direct = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select(explode(graft.ops.TextAnalysis.tokens(lower($"text"))).as("t"))
      .groupBy($"t").count()
      .orderBy($"count".desc, $"t".asc).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(out.map(t => (t._1, t._2)).toSeq == direct)
  }

  test("lm_surprise: boilerplate scores low, unique text scores high") {
    val dir = java.nio.file.Files.createTempDirectory("lm_docs").toString
    val boiler = "click here to subscribe now"
    // 6 identical boilerplate docs, one unique doc sharing no bigrams
    val docs = (1L to 6L).map(i => (i, boiler, "en", "s", 0L)) :+
      ((7L, "quantum marmalade debugging freight elegy", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.lmSurprise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_surprise"))
      .toMap
    // boilerplate bigrams: every prefix occurrence is followed by the same
    // token → c_prev = c_bi → surprise = length(bin(1)) = 1 bit per bigram;
    // fully-unique text also floors at 1 bit (c_prev = c_bi = 1) — the
    // signal lives in SHARED prefixes with rare continuations, below
    (1L to 6L).foreach(i => assert(out(i) == 1.0))
    assert(out(7L) == 1.0)
    val dir2 = java.nio.file.Files.createTempDirectory("lm_docs2").toString
    (docs :+ ((8L, "click here to unsubscribe forever", "en", "s", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = TextJobs.lmSurprise(spark, dir2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_surprise"))
      .toMap
    // doc 8 shares prefixes "click/here/to" (now 7-8 occurrences each) but
    // diverges after "to": its (to, unsubscribe) bigram is 1-of-8 for that
    // prefix → floor(log2(8)) + 1 = 4 bits of surprise on that bigram,
    // while the boilerplate docs stay near 1 bit
    assert(out2(8L) > out2(1L))
    assert(out2(1L) < 1.5)
  }

  test("bpe_merges learns the hand-computed merge table") {
    // vocab: aaab ×3, aab ×1.
    //   r1: (a,a) = 3·2 + 1 = 7 → aaab=[aa,a,b] (GREEDY: [a,a,a]→[aa,a]),
    //       aab=[aa,b]
    //   r2: (aa,a)=3 TIES (a,b)=3 → left_sym tie-break picks (a,b) →
    //       aaab=[aa,ab]; aab untouched ([aa,b] has no (a,b) pair)
    //   r3: (aa,ab)=3;  r4: (aa,b)=1;  r5/r6: no pairs left → no rows
    val dir = java.nio.file.Files.createTempDirectory("bpe_docs").toString
    Seq((1L, "aaab aaab aaab", "en", "s", 14L), (2L, "aab", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.bpeMerges(spark, dir)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", "a", 7L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 3L), (4L, "aa", "b", 1L)))
    // the merges exhaust at round 4 (< BPE_ROUNDS): both words collapse to
    // ONE token each, and the pass-through rounds must not lose the vocab
    val enc = TextJobs.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(enc.toSeq == Seq((1L, 3L, 3L, 1.0), (2L, 1L, 1L, 1.0)))
  }

  test("wordpiece_merges learns the hand-computed likelihood merge table") {
    // vocab: abc ×2, ab ×1 → v0: abc=[a,##b,##c], ab=[a,##b]
    //   r1: counts a=3, ##b=3, ##c=2; pairs (a,##b)=3, (##b,##c)=2.
    //       scores TIE at floor(2^38/3): (3<<38)/9 == (2<<38)/6 →
    //       left tie-break: '##b' < 'a' (ASCII 35 < 97) → merge (##b,##c)
    //       → abc=[a,##bc]
    //   r2: counts a=3, ##bc=2, ##b=1; pairs (a,##bc)=2, (a,##b)=1.
    //       scores TIE again at floor(2^38/3) → right tie-break:
    //       '##b' < '##bc' → merge (a,##b) pc=1 → ab=[ab]
    //   r3: counts a=2, ##bc=2, ab=1; only pair (a,##bc)=2 →
    //       score (2<<38)/4 → merge → abc=[abc]
    //   r4+: no pairs left → early stop, no rows
    val third = (1L << 38) / 3   // floor(2^38 / 3)
    val dir = java.nio.file.Files.createTempDirectory("wp_docs").toString
    Seq((1L, "abc abc ab", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.wordpieceMerges(spark, dir)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "##b", "##c", 2L, third),
      (2L, "a", "##b", 1L, third),
      (3L, "a", "##bc", 2L, (2L << 38) / 4)))
    // both words collapse to one symbol; pass-through rounds keep the vocab
    val enc = TextJobs.wordpieceEncode(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(enc.toSeq == Seq((1L, 3L, 3L, 1.0)))
    // greedy inference vocabulary = base {a,##b,##c} + merged
    // {##bc, ab, abc}: longest-match takes the whole word in one piece
    val greedy = TextJobs.wordpieceGreedy(spark, dir)
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(greedy.toSeq == Seq(("ab", 1L, "ab"), ("abc", 1L, "abc")))
  }

  test("cdc_chunks: chunks tile each doc and survive a prefix insertion") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val base = (1 to 40).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      // the CDC property: an inserted prefix shifts every fixed-width
      // chunking, but content-defined boundaries re-synchronize
      (1L, "INSERTED PREFIX " + base, "en", "src0",
        base.length.toLong + 16),
      (2L, "tiny", "en", "src0", 4L))
    val dir = java.nio.file.Files.createTempDirectory("cdc_fixture").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.cdcChunks(spark, dir)
      .select($"doc_id", $"n_chunks", $"dup_chunks", $"dup_bytes")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    // a sub-window doc yields exactly one chunk, never a dup of anything
    assert(out(2L) == (2L, 1L, 0L, 0L))
    // doc 1 shares most of doc 0's content: boundaries re-synchronize
    // after the insertion, so a large share of its bytes dedup against
    // doc 0's first-written chunks
    val (_, n1, dup1, dupBytes1) = out(1L)
    assert(n1 >= 2, "fixture long enough to produce multiple chunks")
    assert(dup1 >= 1, "no chunk re-synchronized after the prefix insertion")
    assert(dupBytes1 >= 30,
      s"only $dupBytes1 of ${base.length} bytes dedup'd — boundaries did not re-sync")
    // doc 0 wrote first: nothing in it can be a duplicate
    assert(out(0L)._3 == 0L && out(0L)._4 == 0L)
  }

  test("tokenizer_compare: per-source totals equal the encoders' own sums") {
    val dir = sf("sf0.001")
    val cmp = TextJobs.tokenizerCompare(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cmp.nonEmpty)
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bpeBySource = TextJobs.bpeEncode(spark, dir)
      .select("doc_id", "n_bpe_tokens").collect()
      .groupBy(r => docs(r.getLong(0)))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).sum }
    assert(cmp.keySet == bpeBySource.keySet)
    cmp.foreach { case (s, r) =>
      assert(r.getLong(r.fieldIndex("bpe_tokens")) == bpeBySource(s))
      // unigram's larger learned pieces compress at least as well as
      // char-ish BPE on this tiny fixture, and every ratio is a sane
      // chars-per-token figure (> 1 means tokens are multi-char on avg)
      assert(r.getDouble(r.fieldIndex("chars_per_bpe")) > 0)
      assert(r.getLong(r.fieldIndex("words")) > 0)
      assert(r.getLong(r.fieldIndex("chars")) >=
        r.getLong(r.fieldIndex("words")))
    }
  }

  test("bpeApplyMerges: hand-checked segmentations") {
    def seg(w: String, m: (String, String)*): String =
      TextJobs.bpeApplyMerges(w, m).mkString("|")
    // rank order matters: 'ab' fires before 'bc' can
    assert(seg("abc", ("a", "b"), ("b", "c")) == "ab|c")
    assert(seg("abc", ("b", "c"), ("a", "b")) == "a|bc")
    // chained merges build longer symbols across ranks
    assert(seg("abab", ("a", "b"), ("ab", "ab")) == "abab")
    // greedy left-to-right on overlapping occurrences: aaa -> aa|a
    assert(seg("aaa", ("a", "a")) == "aa|a")
    // a merge whose parts never co-occur is a no-op; singles untouched
    assert(seg("xyz", ("a", "b")) == "x|y|z")
    assert(seg("q") == "q")
  }

  test("bpeApplyMerges: rank-order passes == lowest-rank-present loop") {
    // the reference GPT-2 loop: repeatedly find the lowest-ranked pair
    // PRESENT anywhere and merge all its occurrences, until none applies
    def reference(w: String, merges: Seq[(String, String)]): List[String] = {
      var syms = w.toCharArray.map(_.toString).toList
      val rank = merges.zipWithIndex.toMap
      var done = false
      while (!done) {
        val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(p -> _))
        if (present.isEmpty) done = true
        else {
          val (l, r) = present.minBy(_._2)._1
          val out = List.newBuilder[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: t if a == l && b == r => out += (l + r); rest = t
            case a :: t => out += a; rest = t
            case Nil => ()
          }
          syms = out.result()
        }
      }
      syms
    }
    // deterministic pseudo-random words over a 3-char alphabet, merges
    // built the way training builds them (later merges may reference
    // earlier merged symbols)
    val merges = Seq(("a", "b"), ("c", "a"), ("ab", "c"), ("ca", "ab"))
    val words = (0 until 200).map { i =>
      (0 until (i % 9 + 1)).map(j => "abc" ((i * 7 + j * 13) % 3)).mkString
    }
    words.foreach { w =>
      assert(TextJobs.bpeApplyMerges(w, merges).toList == reference(w, merges),
        s"divergence on '$w'")
    }
  }

  test("classifier_lift: deciles re-derive, top decile beats the base rate") {
    import graft.jobs.TextJobs
    val sfd = sf("sf0.001")
    val scored = TextJobs.qualityClassifierTrained(spark, sfd)
      .selectExpr("doc_id", "score_t", "cast(label_q as long) as pos")
      .as[(Long, Long, Long)].collect()
    val n = scored.length.toLong
    val posTotal = scored.map(_._3).sum
    val ranked = scored.sortBy(r => (-r._2, r._1)).zipWithIndex
    val expected = ranked.groupBy { case (_, i) => i.toLong * 10 / n + 1 }
      .map { case (d, rows) =>
        val nd = rows.length.toLong
        val np = rows.map(_._1._3).sum
        val posPpm = np * 1000000L / nd
        val basePpm = posTotal * 1000000L / n
        d -> (nd, np, posPpm, basePpm,
          posPpm * 1000000L / math.max(basePpm, 1L))
      }
    val got = TextJobs.classifierLift(spark, sfd).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pos_ppm"), r.getAs[Long]("base_ppm"),
          r.getAs[Long]("lift_ppm"))).toMap
    assert(got == expected)
    assert(got.keySet == (1L to 10L).toSet)
    // the trained classifier must concentrate positives up top
    assert(got(1L)._5 > 1000000L, s"top-decile lift ${got(1L)._5} <= 1x")
  }

  test("tokenizer_fertility: per-lang ratios re-derive from the encode pass") {
    import graft.jobs.TextJobs
    val sfd = sf("sf0.001")
    val enc = TextJobs.bpeEncode(spark, sfd)
      .select($"doc_id", $"n_words", $"n_bpe_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docs = graft.io.Tables.documents(spark, sfd)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val expected = docs.filter(d => enc.contains(d._1)).groupBy(_._2)
      .map { case (lang, ds) =>
        val words = ds.map(d => enc(d._1)._1).sum
        val toks = ds.map(d => enc(d._1)._2).sum
        val chars = ds.map(d =>
          "[A-Za-z0-9]+".r.findAllIn(d._3.toLowerCase).mkString("").length.toLong).sum
        lang -> (ds.size.toLong, words, toks, chars,
          toks * 1000000L / words, chars * 1000000L / toks)
      }
    val got = TextJobs.tokenizerFertility(spark, sfd).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("tokens_per_word_ppm"),
          r.getAs[Long]("chars_per_token_ppm"))).toMap
    assert(got == expected)
    // fertility must be a real signal: ≥2 langs, every ratio ≥ 1 token/word
    assert(got.size >= 2)
    assert(got.values.forall(_._5 >= 1000000L))
  }

  test("keyword_search: conjunctive retrieval re-derives from a collect") {
    val sfd = sf("sf0.001")
    val toks = graft.io.Tables.documents(spark, sfd)
      .select($"doc_id", explode(TextAnalysis.tokens(lower($"text"))).as("t"))
      .as[(Long, String)].collect()
    val tf = toks.groupBy(identity).map { case ((d, t), o) =>
      (d, t) -> o.size.toLong
    }
    val byDoc = toks.map(_._1).distinct
    val expected = TextJobs.SEARCH_QUERIES.flatMap { case (qid, terms) =>
      byDoc.filter(d => terms.forall(t => tf.contains((d, t))))
        .map(d => (d, terms.map(t => tf((d, t))).sum))
        .sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, s), i) => (qid, d, s, (i + 1).toLong) }
    }.toSet
    val got = TextJobs.keywordSearch(spark, sfd)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // every query must actually retrieve a full page of results
    assert(TextJobs.SEARCH_QUERIES.forall { case (qid, _) =>
      got.count(_._1 == qid) == 5
    })
  }

  test("term_associations: vocab-fenced collocations re-derive from a collect") {
    val sfd = sf("sf0.001")
    val toks = graft.io.Tables.documents(spark, sfd)
      .select($"doc_id", explode(TextAnalysis.tokens(lower($"text"))).as("t"))
      .as[(Long, String)].collect()
    val docSets = toks.groupBy(_._1).map { case (d, o) =>
      d -> o.map(_._2).toSet }
    val df = toks.distinct.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    val vocab = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
      .zipWithIndex.map { case ((t, n), i) => t -> (i + 1L, n) }.toMap
    val nDocs = graft.io.Tables.documents(spark, sfd).count()
    val expected = (for {
      (_, ts) <- docSets.toSeq
      a <- ts.toSeq.filter(vocab.contains)
      b <- ts.toSeq.filter(vocab.contains)
      if vocab(a)._1 < vocab(b)._1
    } yield (a, b)).groupBy(identity).map { case ((a, b), o) =>
      (a, b) -> o.size.toLong
    }.filter(_._2 >= 5L).map { case ((a, b), co) =>
      val (na, nb) = (vocab(a)._2, vocab(b)._2)
      (a, b, co, na, nb, ((co * 1000000L / na) * nDocs) / nb)
    }.toSet
    val got = TextJobs.termAssociations(spark, sfd)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the lift column is a real signal: both >1x and <1x pairs exist
    assert(got.exists(_._6 > 1000000L) && got.exists(_._6 < 1000000L))
  }

  test("classifier_agreement: kappa re-derives from the two gates' outputs") {
    val sfd = sf("sf0.001")
    val h = TextJobs.qualityClassifier(spark, sfd)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val t = TextJobs.qualityClassifierTrained(spark, sfd)
      .select($"doc_id", $"keep_trained").as[(Long, Boolean)].collect().toMap
    val n = h.size.toLong
    assert(t.keySet == h.keySet)
    def cnt(a: Boolean, b: Boolean): Long =
      h.count { case (id, ha) => ha == a && t(id) == b }.toLong
    val (n11, n10, n01, n00) =
      (cnt(true, true), cnt(true, false), cnt(false, true), cnt(false, false))
    val po = (n11 + n00) * 1000000L / n
    val pe = ((n11 + n10) * 1000000L / n * (n11 + n01)) / n +
      ((n01 + n00) * 1000000L / n * (n10 + n00)) / n
    val kappa =
      if (po >= pe) (po - pe) * 1000000L / math.max(1000000L - pe, 1L)
      else -((pe - po) * 1000000L / math.max(1000000L - pe, 1L))
    val r = TextJobs.classifierAgreement(spark, sfd).collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) == ((n, n11, n10, n01, n00)))
    assert(r.getAs[Long]("po_ppm") == po && r.getAs[Long]("pe_ppm") == pe)
    assert(r.getAs[Long]("kappa_ppm") == kappa)
    // the comparison is non-degenerate: disagreement exists in both
    // directions and agreement differs from chance
    assert(n10 > 0 && n01 > 0 && kappa != 0L)
  }

  test("search_typeahead: per-prefix top-3 re-derives from token counts") {
    val sfd = sf("sf0.001")
    val tf = graft.io.Tables.documents(spark, sfd)
      .select(explode(TextAnalysis.tokens($"text")).as("t"))
      .as[String].collect()
      .groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val expected = (1 to 4).flatMap { l =>
      tf.filter(_._1.length >= l).toSeq
        .groupBy { case (t, _) => t.substring(0, l) }
        .flatMap { case (p, ts) =>
          ts.sortBy { case (t, c) => (-c, t) }.take(3).zipWithIndex
            .map { case ((t, c), i) => (p, t, c, i + 1L) }
        }
    }.toSet
    val got = TextJobs.searchTypeahead(spark, sfd)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expected)
    // rank depth binds somewhere (a prefix with > 3 completions exists)
    assert(got.groupBy(_._1).exists(_._2.size == 3))
  }

  test("bm25_search: integer scores match a hand re-derivation on a crafted corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    // 4 docs; query 1 = {hash, join}: doc 1 has both (hash x2),
    // doc 2 has hash only (long doc — length prior penalizes),
    // doc 3 has neither, doc 4 has join.
    Seq(
      (1L, "hash join hash", "en", "s", 14L),
      (2L, "hash scan scan scan scan scan", "en", "s", 29L),
      (3L, "window sort order", "en", "s", 17L),
      (4L, "join merge", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.bm25Search(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // N=4, L=3+6+3+2=14, adl=14 div 4=3
    val N = 4L; val adl = 3L
    def idf(df: Long) = ((2 * (N - df) + 1) * 1000000L) / (2 * df + 1)
    def sat(tf: Long, dl: Long) =
      (22000L * tf * adl) / (10 * tf * adl + 3 * adl + 9 * dl)
    // df(hash)=2, df(join)=2, df(scan)=1, df(window/sort/order/merge)=1
    val s1d1 = idf(2) * sat(2, 3) + idf(2) * sat(1, 3)
    val s1d2 = idf(2) * sat(1, 6)
    val s1d4 = idf(2) * sat(1, 2)
    val q1 = out(1L).map(r => (r._2, r._3))
    assert(q1.map(_._1).toSet == Set(1L, 2L, 4L))
    val by = q1.toMap
    assert(by(1L) == s1d1 && by(2L) == s1d2 && by(4L) == s1d4)
    // ranking: doc 1 (two terms, one twice) must outscore both singles,
    // and the short doc 4 outscores the long doc 2 on the same tf
    assert(s1d1 > s1d4 && s1d4 > s1d2)
    assert(out(1L).head._2 == 1L) // rn=1 is doc 1
    // disjunctive: query 2 = {window, sort, order} matches doc 3 alone
    assert(out(2L).map(_._2).toSet == Set(3L))
  }

  test("bm25_search: fixture top-k is bounded, positive, and rank-consistent") {
    val out = TextJobs.bm25Search(spark, sf("sf0.001")).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.length <= 5)
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
      // scores non-increasing in rank, ties broken by doc_id
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getLong(2) > lo.getLong(2) ||
            (hi.getLong(2) == lo.getLong(2) && hi.getLong(1) < lo.getLong(1)))
        case _ =>
      }
      assert(rows.forall(_.getLong(2) > 0))
    }
  }

  test("packing_eval re-derives from the packing frame; only last bins are partial") {
    val sfd = sf("sf0.001")
    val dp = TextJobs.queries("doc_packing")(spark, sfd)
      .as[(String, Long, Long, Long, Long)].collect() // lang, doc, bin, off, n
    val got = TextJobs.packingEval(spark, sfd).collect()
      .map(r => r.getString(0) -> r).toMap
    val byLang = dp.groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val r = got(lang)
      def l(c: String) = r.getLong(r.fieldIndex(c))
      val nBins = rows.map(_._3).distinct.size.toLong
      val nTokens = rows.map(_._5).sum
      val nDocs = rows.map(_._2).distinct.size.toLong
      val nSplit = rows.groupBy(_._2).count(_._2.size > 1).toLong
      assert(l("n_bins") == nBins && l("n_tokens") == nTokens &&
        l("n_docs") == nDocs && l("n_split_docs") == nSplit)
      assert(l("util_ppm") == nTokens * 1000000L / (nBins * 2048L))
      assert(l("docs_per_bin_x1000") == rows.length * 1000L / nBins)
      // concat packing fills every bin except possibly the last
      assert(nTokens > (nBins - 1) * 2048L)
      assert(l("util_ppm") > 500000L && l("util_ppm") <= 1000000L)
    }
    // the audit's reason to exist: boundary-crossing docs occur
    assert(got.values.map(r => r.getLong(r.fieldIndex("n_split_docs"))).sum > 0)
  }

  test("tokenizer_eval: held-out OOV fallbacks on a crafted split") {
    val dir = java.nio.file.Files.createTempDirectory("tok_eval").toString
    // train = ids 1-4 (vocabulary {"ab"}), held out = id 5 ("ab zzz"):
    // "ab" collapses to one token under all three half-trained models;
    // "zzz" has an unseen char and exercises each OOV path for real
    Seq(
      (1L, "ab ab ab ab", "en", "s", 11L),
      (2L, "ab ab ab ab", "en", "s", 11L),
      (3L, "ab ab ab ab", "en", "s", 11L),
      (4L, "ab ab ab ab", "en", "s", 11L),
      (5L, "ab zzz", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextJobs.tokenizerEval(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("bpe", "unigram", "wordpiece"))
    def l(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    rows.values.foreach { r =>
      assert(l(r, "n_docs") == 1L && l(r, "words") == 2L &&
        l(r, "chars") == 6L)
    }
    // BPE: char symbols always apply — "zzz" costs 3, never OOV.
    assert(l(rows("bpe"), "tokens") == 4L &&
      l(rows("bpe"), "oov_words") == 0L)
    // unigram: byte fallback length(w) = 3, counted OOV.
    assert(l(rows("unigram"), "tokens") == 4L &&
      l(rows("unigram"), "oov_words") == 1L)
    // WordPiece: whole word [UNK] = 1, counted OOV.
    assert(l(rows("wordpiece"), "tokens") == 2L &&
      l(rows("wordpiece"), "oov_words") == 1L)
  }

  test("mixture_execute: admission tracks the plan rates, deterministic") {
    val out = TextJobs.mixtureExecute(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    var admittedTotal = 0L
    out.foreach { r =>
      def l(c: String) = r.getLong(r.fieldIndex(c))
      assert(l("admitted_docs") <= l("n_docs"))
      assert(l("rate_ppm") >= 0L && l("rate_ppm") <= 1000000L)
      // a full-rate source admits everything; a zero-rate source nothing
      if (l("rate_ppm") == 1000000L) assert(l("admitted_docs") == l("n_docs"))
      if (l("rate_ppm") == 0L) assert(l("admitted_docs") == 0L)
      admittedTotal += l("admitted_docs")
    }
    assert(admittedTotal > 0L, "fixture must admit some documents")
    // the md5 coin makes admission a pure function of the corpus
    val again = TextJobs.mixtureExecute(spark, sf("sf0.001")).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("eval_panel_sample: exact k per stratum, contiguous ranks, deterministic") {
    val out = TextJobs.evalPanelSample(spark, sf("sf0.001")).collect()
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == 20, s"$lang quota not met") // all strata >= 64 docs (probed)
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 20L), s"$lang ranks not contiguous")
    }
    // doc_ids unique across the panel; coins actually ordered within stratum
    assert(out.map(_.getLong(2)).distinct.length == out.length)
    byLang.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(2))).toSeq
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
    }
    val again = TextJobs.evalPanelSample(spark, sf("sf0.001")).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("tokenizer_eval: closed-vocab fixture has zero OOV and sane ratios") {
    val out = TextJobs.tokenizerEval(spark, sf("sf0.001")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      def l(c: String) = r.getLong(r.fieldIndex(c))
      assert(l("oov_words") == 0L) // probed: held-out vocab ⊆ train vocab
      assert(l("tokens") >= l("words")) // every word costs ≥ 1 token
      assert(l("n_docs") > 0 && l("chars") > 0)
      assert(r.getDouble(r.fieldIndex("chars_per_token")) > 0.0)
    }
  }
}
