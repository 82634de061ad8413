package graft

import org.apache.spark.sql.functions._

/** Hand-computed Gopher-style repetition signals. */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition fractions match hand-computed values") {
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (1L, "a a b", "en", "s", 5L),
      (2L, "x y x y x y", "en", "s", 11L),
      (3L, "one", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.jobs.TextJobs.textRepetition(spark, dir)
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Double, Double)].collect()
    // doc 1: words a,a,b → 1/3 dup; bigrams "a a","a b" → top 1/2, dup 0
    assert(out(0) == ((1L, 3L, 0.3333, 0.5, 0.0)))
    // doc 2: 6 words, 2 distinct → 4/6; bigrams xy,yx,xy,yx,xy →
    // top "x y" 3/5, every bigram duplicated → 5/5
    assert(out(1) == ((2L, 6L, 0.6667, 0.6, 1.0)))
    // doc 3: single word — no duplication, no bigrams
    assert(out(2) == ((3L, 1L, 0.0, 0.0, 0.0)))
  }

  test("repetition runs over the real documents table") {
    val out = graft.jobs.TextJobs.textRepetition(spark, sf("sf0.001"))
    assert(out.count() == 500)
    val bad = out.filter(
      $"dup_word_frac" < 0 || $"dup_word_frac" > 1 ||
        $"top_bigram_frac" < 0 || $"top_bigram_frac" > 1 ||
        $"dup_bigram_frac" < 0 || $"dup_bigram_frac" > 1).count()
    assert(bad == 0)
  }
}
