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

  test("doc chunks: 50-token windows every 40, overlapping, ragged tail") {
    val dir = java.nio.file.Files.createTempDirectory("chunks").toString
    val words = (1 to 95).map(i => s"w$i")
    Seq((1L, words.mkString(" "), "en", "s", 1L),
        (2L, "tiny doc", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.jobs.TextJobs.docChunks(spark, dir)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    // doc 1: starts 0/40/80 → 50, 50, 15 tokens; stride-40 overlap of 10
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0L, 50L), (1L, 50L), (2L, 15L)))
    assert(d1(0)._4.startsWith("w1 ") && d1(1)._4.startsWith("w41 ") &&
      d1(2)._4.startsWith("w81 ") && d1(2)._4.endsWith(" w95"))
    assert(d1(0)._4.split(" ").takeRight(10).toSeq ==
      d1(1)._4.split(" ").take(10).toSeq) // the overlap region
    // doc 2 fits one chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "tiny doc")))
  }

  test("token rarity: exact mean corpus frequency per document") {
    val dir = java.nio.file.Files.createTempDirectory("rarity").toString
    // corpus freqs: a=2, b=2, c=1 → doc 1 (a a b) mean (2+2+2)/3 = 2.0,
    // doc 2 (b c) mean (2+1)/2 = 1.5
    Seq((1L, "a a b", "en", "s", 5L), (2L, "b c", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.jobs.TextJobs.tokenRarity(spark, dir)
      .orderBy($"doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 2.0), (2L, 2L, 1.5)))
  }

  test("doc chunks cover every token exactly once outside overlaps") {
    // boundary sizes around the window (50) and stride (40)
    val sizes = Seq(1, 39, 40, 41, 50, 51, 80, 81, 90, 130)
    val dir = java.nio.file.Files.createTempDirectory("chunk_cov").toString
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), "en", "s", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = graft.jobs.TextJobs.docChunks(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      val cs = chunks(i.toLong)
      // every token appears in at least one chunk, in order
      val covered = cs.flatMap(_._4.split(" ")).distinct
      assert(covered.length == n, s"n=$n covered ${covered.length}")
      // stride-40: consecutive chunk starts differ by exactly 40 tokens
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4.split(" ").head == s"t${(b._2 * 40) + 1}",
            s"n=$n chunk ${b._2} starts wrong")
        case _ =>
      }
    }
  }

  test("token pipeline: one cached tf cascade matches the isolated jobs") {
    val dir = sf("sf0.001")
    val pipe = new graft.ops.TokenPipeline(
      graft.io.Tables.documents(spark, dir)
        .select($"doc_id", $"text", $"lang"))
    try {
      val rarity = pipe.tokenRarity.orderBy($"doc_id").collect().toSeq
      val isolatedRarity = graft.jobs.TextJobs.tokenRarity(spark, dir)
        .orderBy($"doc_id").collect().toSeq
      assert(rarity == isolatedRarity)
      val tfidf = pipe.tfidfTopK(3).orderBy($"doc_id", $"rn").collect().toSeq
      val isolatedTfidf = graft.jobs.TextJobs.tfidfTopK(spark, dir)
        .orderBy($"doc_id", $"rn").collect().toSeq
      assert(tfidf == isolatedTfidf)
      assert(pipe.tf.storageLevel.useMemory, "tf cascade is not cached")
    } finally pipe.unpersist()
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
