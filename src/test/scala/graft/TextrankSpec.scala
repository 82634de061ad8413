package graft

import org.apache.spark.sql.functions._

/** textrank_keywords: the graph-over-text layer. The integer PageRank
  * recurrence itself is verified in GraphSpec; here the NEW surface —
  * stopword strip, window-2 pairing, undirected edge canonicalization,
  * hash→word join-back, deterministic top-20 — is recomputed from the raw
  * documents with plain Scala string ops and must land the identical list.
  */
class TextrankSpec extends SparkSpec {
  import spark.implicits._

  private val stopwords =
    Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  test("textrank matches a Scala-tokenized edge recompute end to end") {
    val dir = sf("sf0.001")
    val docs = graft.io.Tables.documents(spark, dir)
      .select($"text").as[String].collect()
    // Scala twin of the query's tokenize/filter/pair stages
    // replace-then-tokenize, mirroring the query's regexp_replace exactly
    // (\b treats '_' as a word char in both engines, so token-filtering
    // after tokenization would NOT be equivalent around underscores)
    def toksOf(text: String): Array[String] =
      "[a-z0-9]+".r.findAllIn(text.toLowerCase
        .replaceAll(graft.ops.TextAnalysis.stopwordPattern, " ")).toArray
    val pairs = docs.flatMap { text =>
      val toks = toksOf(text)
      val w1 = toks.dropRight(1).zip(toks.drop(1))
      val w2 = if (toks.length > 2) toks.dropRight(2).zip(toks.drop(2))
               else Array.empty[(String, String)]
      w1 ++ w2
    }.filter { case (a, b) => a != b }
    def h(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val e0 = pairs.map { case (a, b) => (math.min(h(a), h(b)), math.max(h(a), h(b))) }
      .filter(p => p._1 != p._2).distinct
    val edges = (e0 ++ e0.map(_.swap)).toSeq.toDF("src", "dst")
    val vocab = docs.flatMap(toksOf).distinct.map(w => (h(w), w)).toMap
    val expect = graft.ops.Graph.pageRank(edges, iters = 10)
      .as[(Long, Long)].collect()
      .map { case (node, r) => (vocab(node), r) }
      .sortBy { case (w, r) => (-r, w) }
      .take(20).toSeq
    val got = graft.jobs.TextJobs.textrankKeywords(spark, dir)
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, r) => (-r, w) }
    assert(got == expect)
  }

  test("textrank output is 20 stopword-free keywords, deterministically ranked") {
    val out = graft.jobs.TextJobs.textrankKeywords(spark, sf("sf0.001"))
      .as[(String, Long)].collect()
    assert(out.length == 20)
    assert(out.forall { case (w, r) => !stopwords(w) && r > 0 })
    assert(out.map(_._1).distinct.length == 20)
  }
}
