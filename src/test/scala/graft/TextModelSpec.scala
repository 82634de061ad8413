package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashedLinearModel, TextModelFunctions}
import graft.jobs.TextJobs
import graft.ops.{Dedup, TextAnalysis}

/** Hashed-linear quality classifier: the codegen expression must agree
  * bit-for-bit with the hex-string md5Long restatement (the two compute the
  * token hash by different routes — digest bytes vs conv(hex) — so equality
  * checks the byte-order claim, the bucket/weight arithmetic, and the sum),
  * and the model constants must behave as documented.
  */
class TextModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The QUICK brown-fox; jumps... over 42 lazy dogs!"),
    (3L, ""),                      // no tokens at all
    (4L, "!!! ... ---"),           // punctuation only: tokenizer yields nothing
    (5L, "one"),                   // single token
    (6L, "数据 管道 质量"),          // non-Latin: tokenizer drops everything
    (7L, "mixed 中文 and english tokens 2024"))
    .toDF("doc_id", "text")

  test("expression matches the explode + md5Long restatement exactly") {
    import HashedLinearModel._
    val toks = TextAnalysis.tokens(col("text"))
    val viaExpr = docs.select(col("doc_id"),
      TextModelFunctions.hashed_linear_score(toks).as("score_q"))
    // independent route: explode, hash via the hex-string md5Long column
    // function, weight via column arithmetic, sum — any disagreement in
    // byte order, modulus, or centering shows up as a row mismatch
    val wt = (Dedup.md5Long(col("t")) % Buckets) * lit(WeightMul) + lit(WeightAdd)
    val viaExplode2 = docs
      .select(col("doc_id"), explode_outer(toks).as("t"))
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(when(col("t").isNull, lit(0L))
        .otherwise(wt % lit(WeightMod) - lit(WeightCenter))), lit(0L))
        .as("score_q"))
    val a = viaExpr.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = viaExplode2.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b), s"expr=${a.toSeq} explode=${b.toSeq}")
  }

  test("token-free documents score zero and are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("qc_docs").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextJobs.qualityClassifier(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 7)
    Seq(3L, 4L, 6L).foreach { id =>
      assert(out(id).getAs[Long]("n_tokens") == 0L)
      assert(out(id).getAs[Long]("score_q") == 0L)
      assert(out(id).getAs[Double]("logit") == 0.0)
      assert(!out(id).getAs[Boolean]("keep"))
    }
    // keep ⟺ score_q > 0, logit sign follows score sign
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("score_q") > 0L))
      if (r.getAs[Long]("score_q") < 0) assert(r.getAs[Double]("logit") <= 0.0)
    }
  }

  test("weights stay in the documented band and span it") {
    val ws = (0L until HashedLinearModel.Buckets).map(HashedLinearModel.weight)
    assert(ws.forall(w => w >= -1000L && w <= 1000L))
    assert(ws.min == -1000L && ws.max == 1000L)
    // the affine mix must not collapse: a useful synthetic model needs
    // both classes present in quantity
    assert(ws.count(_ > 0) > 10000 && ws.count(_ < 0) > 10000)
  }

  test("trained classifier fits its own labels better than the majority class") {
    val out = TextJobs.qualityClassifierTrained(spark, sf("sf0.001"))
      .select(col("keep_trained"), col("label_q")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(out.length == 500) // total over the corpus, no doc lost
    val acc = out.count(t => t._1 == t._2).toDouble / out.length
    val majority = math.max(out.count(_._2), out.count(!_._2)).toDouble / out.length
    // Rocchio on its own training labels must beat always-majority —
    // the weights actually encode the classes, not a constant
    assert(acc > majority, s"acc=$acc majority=$majority")
  }

  test("logit is the exact one-division ratio of the integer score") {
    val dir = java.nio.file.Files.createTempDirectory("qc_docs2").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextJobs.qualityClassifier(spark, dir).collect().foreach { r =>
      val n = math.max(r.getAs[Long]("n_tokens"), 1L)
      val expected = BigDecimal(
        r.getAs[Long]("score_q").toDouble / (1000.0 * n) + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("logit") == expected)
    }
  }

  test("unigram trainer: hand-checked hard-EM on a tiny vocabulary") {
    // seed occurrences: ab appears at 2 start positions in "abab" (cnt 3)
    // plus once in "ab" (cnt 2) = 8; round-1 Viterbi prefers FEWEST
    // pieces, so "abab" segments as the single piece [abab], "ab" as
    // [ab], "cd" as [cd]; unused multi pieces (ba, aba, bab) are pruned,
    // chars survive at zero usage, and round 2 reproduces the same
    // segmentation — the final vocabulary is exactly this:
    val got = TextJobs.trainUnigram(
      Array(("abab", 3L), ("ab", 2L), ("cd", 5L)))
    assert(got == Seq(("cd", 5L), ("abab", 3L), ("ab", 2L),
      ("a", 0L), ("b", 0L), ("c", 0L), ("d", 0L)))
  }

  test("unigram_vocab is deterministic and coverage-complete on real data") {
    val a = TextJobs.unigramVocab(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = TextJobs.unigramVocab(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b, "trainer must be deterministic across runs")
    assert(a.nonEmpty && a.exists(_._1.length > 1),
      "EM must retain at least one multi-char piece")
    // usage ordering with the piece tie-break is the output contract
    assert(a == a.sortBy { case (p, u) => (-u, p) })
  }
}
