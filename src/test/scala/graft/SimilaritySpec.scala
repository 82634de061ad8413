package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.jobs.SimilarityJobs

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.1f)))  // close-ish to 0/1
    .toDF("vec_id", "embedding")

  private def v = Similarity.withNorm(vecs, $"vec_id", $"embedding")

  test("centroid memo isolates corpora: different SF dirs train different models") {
    // the trainedCents memo keys on the embeddings parquet fingerprint —
    // two corpora served from ONE JVM must never share a model, and a
    // repeat call on the same corpus must serve the identical rows
    def rows(sfDir: String) = graft.jobs.SimilarityJobs
      .trainedCentsForSpec(spark, sfDir)
      .select($"cent_id", $"cnorm").as[(Long, Double)].collect().toSet
    val a1 = rows(sf("sf0.001"))
    val b = rows(sf("sf0.01"))
    val a2 = rows(sf("sf0.001")) // memo hit
    assert(a1 == a2, "repeat call must serve the identical model")
    assert(a1 != b, "different corpora must not share a memoized model")
  }

  test("index drift audit: cohort stats re-derive from a Scala assignment; both votes present") {
    val dir = sf("sf0.001")
    // independent recompute: collect the established-trained centroids,
    // assign every vector by plain-Scala rounded-cosine argmax, rebuild
    // the per-cell cohort audit, compare to the query's rows
    val vecs = graft.io.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val vFrame = graft.ops.Similarity.withNorm(
      graft.io.Tables.embeddings(spark, dir), $"vec_id", $"embedding")
    val cents = graft.ops.Similarity.kmeansCentroids(
        vFrame.filter($"vec_id" % 5 =!= 0), 16, 2)
      .select($"cent_id", $"cv").as[(Long, Array[Double])].collect()
    def r6(x: Double) = math.floor((x + 1e-12) * 1e6 + 0.5) / 1e6
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val assigned = vecs.map { case (id, v) =>
      val (cid, sim) = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }
      (id, cid, sim)
    }
    val expect = assigned.groupBy(_._2).map { case (cell, g) =>
      val (est, del) = g.partition(_._1 % 5 != 0)
      def meanPpm(xs: Array[(Long, Long, Double)]) =
        if (xs.isEmpty) 0L
        else xs.map(t => math.round(t._3 * 1e6)).sum / xs.length
      val (me, md) = (meanPpm(est), meanPpm(del))
      cell -> (est.length.toLong, del.length.toLong, me, md, me - md,
        100L * del.length > 21L * g.length)
    }
    val got = graft.jobs.SimilarityJobs.annIndexDrift(spark, dir)
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._7, t._6)).toMap
    assert(got == expect)
    assert(got.values.exists(_._6) && got.values.exists(!_._6),
      "hot vote must split (the seed rule)")
  }

  test("retrain loop: the drifted fixture fires the vote and the served index equals training on everything") {
    // trigger -> retrain -> serve end-to-end: the fixture's delta IS
    // drifted (hot cells with positive quality drops at every SF), so
    // the vote fires and the served top-k must be bit-identical to the
    // full-corpus trained pipeline — retrain ≡ training on everything
    val dir = sf("sf0.001")
    val got = SimilarityJobs.annIndexRetrained(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSet
    val full = SimilarityJobs.annIvfTrained(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == full,
      "vote fired -> serve must equal the full-corpus trained index")
  }

  test("retrained IVF-PQ rerank equals the full-corpus trained rerank stack") {
    // the PQ leg of the retrain loop: vote fired -> cells re-encode
    // against the retrained centroids and the shortlist-rerank serve is
    // bit-identical to probing a model trained on everything
    val dir = sf("sf0.001")
    val v = Similarity.withNorm(graft.io.Tables.embeddings(spark, dir),
      $"vec_id", $"embedding")
    val got = SimilarityJobs.annIvfPqRetrained(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSet
    val full = Similarity.ivfPqRerank(v,
        graft.ops.Similarity.kmeansCentroids(v, 16, 2),
        $"vec_id" < 20, nprobe = 4, m = 4, k = 16, dims = 64,
        topK = 5, shortlist = 15)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == full)
  }

  test("retrain vote: fires only on hot cells with positive quality drops") {
    def audit(rows: (Long, Long, Long, Long, Long, Boolean, Long)*) =
      rows.toSeq.toDF("cell", "n_est", "n_delta", "mean_est_ppm",
        "mean_delta_ppm", "hot", "quality_drop_ppm")
    // hot-without-drop and drop-without-hot must BOTH stay frozen —
    // the false branch the fixture (vote always fires there) can't reach
    assert(!SimilarityJobs.retrainVote(audit(
      (1L, 10L, 9L, 100L, 200L, true, -100L),
      (2L, 10L, 1L, 300L, 100L, false, 200L))))
    assert(SimilarityJobs.retrainVote(audit(
      (1L, 10L, 9L, 100L, 200L, true, -100L),
      (2L, 10L, 9L, 300L, 100L, true, 200L))))
  }

  test("brute-force top-k ranks by cosine with self excluded") {
    val out = Similarity.bruteForceTopK(v, v.filter($"vec_id" === 0), 2)
      .orderBy($"rn").select($"neighbor_id", $"sim").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    assert(out(0)._2 > 0.99 && out(1)._2 > 0.9)
  }

  test("near-dup pairs respect the threshold, half-matrix only") {
    val out = Similarity.nearDupPairs(v, 0.9)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(out.forall(p => p._1 < p._2))
    assert(out.contains((0L, 1L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L)) // opposite vector
  }

  test("within-cell pairs are identity-compressed losslessly") {
    val dup = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),  // exact copy of 0
      (2L, Array(1.0f, 0.0f, 0.0f)),  // another copy
      (3L, Array(0.9f, 0.1f, 0.0f)),  // near dup of the group
      (4L, Array(0.0f, 1.0f, 0.0f)),  // the other seed's cell
      (5L, Array(0.0f, 0.95f, 0.1f))) // near dup of 4
      .toDF("vec_id", "embedding")
    val vv = Similarity.withNorm(dup, $"vec_id", $"embedding").cache()
    val cents = Similarity.seedCentroids(vv, 2)
    val cells = Similarity.ivfAssign(vv, cents)
    val expected = Similarity.nearDupPairs(vv, 0.35)
      .join(cells.toDF("vec_a", "cell_a"), "vec_a")
      .join(cells.toDF("vec_b", "cell_b"), "vec_b")
      .filter($"cell_a" === $"cell_b")
      .select($"cell_a", $"vec_a", $"vec_b", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = Similarity.withinCellPairs(vv, cents, 0.35)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    // the dup group really went through expansion: intra pair at sim 1.0
    assert(got.exists(p => p._2 == 0L && p._3 == 1L && p._4 == 1.0))
    // cross-group pair (copy 1 ~ near-dup 3) inherits the rep pair's sim
    assert(got.exists(p => p._2 == 1L && p._3 == 3L))
  }

  test("semantic dedup equals the all-pairs baseline restricted to cells") {
    import graft.io.Tables
    val sfd = sf("sf0.001")
    val vr = Similarity.withNorm(Tables.embeddings(spark, sfd),
      $"vec_id", $"embedding").cache()
    val cells = Similarity.ivfAssign(vr,
      Similarity.kmeansCentroids(vr, 16, 2))
    // ground truth: exact all-pairs near-dups, kept only when co-celled
    val expected = Similarity.nearDupPairs(vr, 0.35)
      .join(cells.toDF("vec_a", "cell_a"), "vec_a")
      .join(cells.toDF("vec_b", "cell_b"), "vec_b")
      .filter($"cell_a" === $"cell_b")
      .select($"cell_a".as("cell"), $"vec_a", $"vec_b", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = SimilarityJobs.semanticDedup(spark, sfd)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture produced no within-cell near-dups")
    assert(got == expected)
  }

  test("cluster purity: bounded ratios, counts partition the corpus") {
    import graft.io.Tables
    val sfd = sf("sf0.001")
    val out = SimilarityJobs.clusterPurity(spark, sfd).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val p = r.getAs[Double]("purity")
      p > 0.0 && p <= 1.0 &&
        r.getAs[Long]("n_major") <= r.getAs[Long]("n_vectors")
    })
    val total = Tables.embeddings(spark, sfd).count()
    assert(out.map(_.getAs[Long]("n_vectors")).sum == total,
      "cells must partition the labelled corpus exactly")
  }

  test("IVF ANN beats the LSH path's recall@5 floor on real data") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvf(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // probing 4 of 16 cells; measured 0.85 at sf0.01 — 0.5 is the
    // regression floor
    assert(recall > 0.5, s"recall=$recall")
  }

  test("ann_eval arithmetic matches a set-algebra re-derivation") {
    val sfd = sf("sf0.001")
    val truth = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvf(spark, sfd)
      .select($"query_id", $"neighbor_id", $"rn")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = SimilarityJobs.annEval(spark, sfd).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("recall_ppm"), r.getAs[Long]("rr_sum_ppm"))).toMap
    val queryIds = truth.map(_._1)
    assert(got.keySet == queryIds, "one row per truth query")
    queryIds.foreach { q =>
      val t = truth.filter(_._1 == q)
      val hits = t.filter(approx.contains)
      val rr = hits.toSeq.map(p => 1000000L / approx(p)).sum
      assert(got(q) == ((t.size.toLong, hits.size.toLong,
        hits.size.toLong * 1000000L / t.size, rr)), s"query $q")
    }
  }

  test("ann_eval_pq re-derives exactly; rerank recall >= raw-ADC recall") {
    val sfd = sf("sf0.001")
    val truth = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvfPqRerank(spark, sfd)
      .select($"query_id", $"neighbor_id", $"rn")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = SimilarityJobs.annEvalPq(spark, sfd).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("recall_ppm"), r.getAs[Long]("rr_sum_ppm"))).toMap
    assert(got.keySet == truth.map(_._1))
    truth.groupBy(_._1).foreach { case (q, t) =>
      val hits = t.filter(approx.contains)
      val rr = hits.toSeq.map(p => 1000000L / approx(p)).sum
      assert(got(q) == ((t.size.toLong, hits.size.toLong,
        hits.size.toLong * 1000000L / t.size, rr)), s"query $q")
    }
    // the exact re-rank can only fix ADC rank errors inside the
    // shortlist: total rerank hits must be >= the raw ADC index's hits
    // against the same truth (both probe the same IVF cells)
    val adc = SimilarityJobs.annIvfPq(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rerankHits = truth.count(approx.contains)
    val adcHits = truth.count(adc.contains)
    assert(rerankHits >= adcHits,
      s"rerank recall ($rerankHits) fell below raw ADC ($adcHits)")
  }

  test("ann_eval_lsh restricts to the truth queries and re-derives exactly") {
    val sfd = sf("sf0.001")
    val truth = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annLsh(spark, sfd)
      .select($"query_id", $"neighbor_id", $"rn")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = SimilarityJobs.annEvalLsh(spark, sfd).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Long]("rr_sum_ppm"))).toMap
    assert(got.keySet == truth.map(_._1),
      "eval rows = truth queries only, though annLsh ranks every vector")
    truth.groupBy(_._1).foreach { case (q, t) =>
      val hits = t.filter(approx.contains)
      assert(got(q) ==
        ((hits.size.toLong, hits.toSeq.map(p => 1000000L / approx(p)).sum)),
        s"query $q")
    }
  }

  test("knn_classify majority vote matches a brute-force re-derivation") {
    val sfd = sf("sf0.001")
    val out = SimilarityJobs.knnClassify(spark, sfd).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("vec_id") % 2 == 1), "test half only")
    // re-derive one query's vote from the brute-force contract
    val labels = graft.io.Tables.embeddings(spark, sfd)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)]
      .collect().toMap
    val v = Similarity.withNorm(graft.io.Tables.embeddings(spark, sfd),
      $"vec_id", $"embedding")
    val nn = Similarity.bruteForceTopK(
        v.filter($"vec_id" % 2 === 0),
        v.filter($"vec_id" % 2 === 1), 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val expected = nn.groupBy(_._1).map { case (q, rows) =>
      val votes = rows.map(r => labels(r._2)).groupBy(identity)
        .map { case (l, o) => (l, o.size) }
      q -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    }
    val gotPred = out.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Long]("predicted")).toMap
    assert(gotPred == expected)
    out.foreach { r =>
      assert((r.getAs[Long]("correct") == 1L) ==
        (labels(r.getAs[Long]("vec_id")) == r.getAs[Long]("predicted")))
    }
    // this fixture's labels are near-uncorrelated with the embeddings
    // (within-label mean cosine 0.0016 vs 0.0003 across) — the gate tests
    // the vote MECHANISM exactly; accuracy is a property of the data
  }

  test("int8 quantization: exact values on a fixture, saturation flagged") {
    // v = [1.0, -0.5, 0.25, 0]: scale = 1/127, q = [127, -64, 32, 0]
    // (round(-63.5 + 1e-9) = -63? No: -63.4999.. rounds to -63... the
    // nudge is +1e-9 so -0.5*127 = -63.5 -> -63 in BOTH engines, and
    // 0.25*127 = 31.75 -> 32). checksum 127-63+32 = 96.
    val dir = java.nio.file.Files.createTempDirectory("quant").toString
    Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f), 0),
        (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.jobs.SimilarityJobs.embeddingQuantize(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val scaleQ = math.round(1.0 / 127 * 1e9 + 1e-9) // nano-quantized scale
    assert(out(1L) == ((scaleQ, 127L - 63 + 32, 127L * 127 + 63 * 63 + 32 * 32, 1L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L))) // zero vector: all-zero, no div0
  }

  test("kmeans centroids are exact quantized means (deterministic)") {
    // two clean 2-D clusters; seeds = vecs 0 and 1, one Lloyd's round.
    // Quantization makes the means exact decimals: (1.0+0.9)/2 = 0.95 on
    // the nose, no float-summation noise.
    val data = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val vv = Similarity.withNorm(data, $"vec_id", $"embedding")
    val cents = Similarity.kmeansCentroids(vv, c = 2, iters = 1)
      .select($"cent_id", $"cv").as[(Long, Seq[Double])].collect()
      .toMap
    assert(cents(0L) == Seq(0.95, 0.05))
    assert(cents(1L) == Seq(0.05, 0.95))
    // fixed-iteration Lloyd's from fixed seeds: identical across runs
    val again = Similarity.kmeansCentroids(vv, c = 2, iters = 1)
      .select($"cent_id", $"cv").as[(Long, Seq[Double])].collect().toMap
    assert(again == cents)
  }

  test("trained IVF holds the recall floor on real data") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annIvfTrained(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.5, s"recall=$recall")
  }

  test("IVF-PQ holds a recall floor and never scans exact distances corpus-wide") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val df = SimilarityJobs.annIvfPq(spark, sfd)
    val approx = df
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // doubly approximate (cell pruning AND 4x16 product quantization —
    // compounded loss, below either half alone); measured 0.26 at
    // sf0.001. The production recall lever is an exact re-rank of the
    // ADC shortlist (bounded, never corpus-wide); the hash-exact oracle
    // gates the machinery, this floor gates against regression to a
    // trivial filter
    assert(recall > 0.2, s"recall=$recall")
    // the composed plan's ONLY cosine stages are the C-bounded centroid
    // assigns: scoring joins read codes + the broadcast distance table,
    // so no exact-distance (cosine) evaluation sees corpus×corpus pairs.
    // cosine lowers to l2_norm-normalized dot — pin that the physical
    // plan carries the ADC integer-sum agg and a broadcast qtab join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sum"), "ADC sum agg missing")
    spark.catalog.clearCache()
  }

  test("IVF-PQ exact re-rank recovers recall over the raw ADC ranking") {
    val sfd = sf("sf0.001")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val adcOnly = SimilarityJobs.annIvfPq(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val reranked = SimilarityJobs.annIvfPqRerank(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rAdc = (exact intersect adcOnly).size.toDouble / exact.size
    val rRerank = (exact intersect reranked).size.toDouble / exact.size
    // the rerank stage exists to buy recall back from the PQ loss at a
    // corpus-size-independent cost; measured 0.26 -> ~0.5 at sf0.001
    assert(rRerank >= rAdc, s"rerank=$rRerank < adc=$rAdc")
    assert(rRerank > 0.4, s"rerank recall=$rRerank")
    spark.catalog.clearCache()
  }

  test("hard negatives are similar-but-differently-labelled, never same-label") {
    val sfd = sf("sf0.001")
    val labels = graft.io.Tables.load(spark, sfd, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val rows = SimilarityJobs.hardNegatives(spark, sfd)
      .select($"query_id", $"neighbor_id", $"neg_label", $"sim")
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, nl, _) =>
      assert(labels(n) == nl, s"neg_label mismatch for $n")
      assert(labels(q) != nl, s"query $q mined a same-label 'negative' $n")
    }
    // the mined negatives must actually be hard: more similar than the
    // average cross-label pair would be (sanity, not a tuned threshold)
    assert(rows.map(_._4).min > -1.0 && rows.map(_._4).max <= 1.0)
    spark.catalog.clearCache()
  }

  test("LSH ANN achieves good recall@5 vs brute force on real data") {
    val sfd = sf("sf0.001")
    val vv = Similarity.withNorm(
      graft.io.Tables.embeddings(spark, sfd), $"vec_id", $"embedding")
    val exact = SimilarityJobs.annCosineTopK(spark, sfd)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityJobs.annLsh(spark, sfd)
      .filter($"query_id" < 20)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 5 hyperplanes + hamming-1 multi-probe on 500 random vectors:
    // lossy by design, but must beat a trivial bucket-only filter
    assert(recall > 0.3, s"recall=$recall")
  }

  test("PQ codes: codebook members reconstruct exactly, others argmin") {
    val pq = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),   // codebook entry 0
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),   // codebook entry 1
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),   // s0→code0, s1→code1, err 0
      (3L, Array(0.9f, 0.1f, 0.0f, 0.9f)))   // both subspaces nearest code0
      .toDF("vec_id", "embedding")
    val vv = Similarity.withNorm(pq, $"vec_id", $"embedding")
    val out = Similarity.pqCodes(vv, m = 2, k = 2, dims = 4).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("c0"), r.getAs[Int]("c1"),
          r.getAs[Double]("recon_err"))).toMap
    assert(out(0L) == ((0, 0, 0.0)))
    assert(out(1L) == ((1, 1, 0.0)))
    assert(out(2L) == ((0, 1, 0.0)))
    val (c0, c1, err) = out(3L)
    assert(c0 == 0 && c1 == 0)
    // s0 dist ≈ .01+.01, s1 dist ≈ .01 → ~0.03 (float-noise tolerance)
    assert(math.abs(err - 0.03) < 1e-4, s"err=$err")
  }

  test("trained PQ never increases total reconstruction error") {
    // Lloyd's monotonicity: re-assign ≤ refined-entry error ≤ seed error
    val sfd = sf("sf0.001")
    val seed = SimilarityJobs.pqCodes(spark, sfd)
      .agg(sum($"recon_err")).as[Double].head()
    val trained = SimilarityJobs.pqCodesTrained(spark, sfd)
      .agg(sum($"recon_err")).as[Double].head()
    assert(trained <= seed + 1e-3, s"trained=$trained seed=$seed")
    // and it should actually help on random data, not just not hurt
    assert(trained < seed, s"refinement was a no-op: $trained vs $seed")
  }

  test("PQ ADC search ranks by summed code-table distances") {
    val pq = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),   // codebook 0; the query
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),   // codebook 1: both subs far
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),   // s0 matches, s1 far
      (3L, Array(1.0f, 0.0f, 0.0f, 1.0f)))   // codes (0,0): ADC dist 0
      .toDF("vec_id", "embedding")
    val vv = Similarity.withNorm(pq, $"vec_id", $"embedding")
    val out = Similarity
      .pqAdcTopK(vv, $"vec_id" < 1, m = 2, k = 2, dims = 4, topK = 3)
      .orderBy($"rn")
      .select($"neighbor_id", $"adist").as[(Long, Long)].collect().toSeq
    // v3 reconstructs to the query's own codes (0 distance), v2 shares
    // only s0, v1 differs in both subspaces (each |a-b|² = 2 → 2·10⁶)
    assert(out == Seq((3L, 0L), (2L, 2000000L), (1L, 4000000L)))
  }

  test("RRF fusion equals an independent in-memory re-derivation") {
    import graft.io.Tables
    val sfd = sf("sf0.001")
    // dense lists: the already-spec'd brute-force ranker at fusion depth
    val vr = Similarity.withNorm(Tables.embeddings(spark, sfd),
      $"vec_id", $"embedding")
    val dense = Similarity
      .bruteForceTopK(vr, vr.filter($"vec_id" < 20), 10)
      .select($"query_id", $"neighbor_id", $"rn")
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    // sparse lists: tokenize + overlap + rank entirely in Scala
    val texts = Tables.documents(spark, sfd)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tokSets = texts.map { case (id, t) =>
      id -> "[A-Za-z0-9]+".r.findAllIn(t.toLowerCase).toSet
    }.toMap
    val ids = tokSets.keys.toSeq.sorted
    val sparse = ids.filter(_ < 20).flatMap { q =>
      ids.filter(c => c != q)
        .map(c => (c, (tokSets(q) & tokSets(c)).size))
        .filter(_._2 > 0)
        .sortBy { case (c, ov) => (-ov, c) }
        .take(10).zipWithIndex
        .map { case ((c, _), i) => (q, c) -> (i + 1).toLong }
    }.toMap
    val expected = (dense.keySet ++ sparse.keySet).groupBy(_._1)
      .flatMap { case (q, pairs) =>
        pairs.toSeq.map { case (_, d) =>
          val dr = dense.getOrElse((q, d), 0L)
          val sr = sparse.getOrElse((q, d), 0L)
          val score = (if (dr > 0) 1000000000L / (60 + dr) else 0L) +
            (if (sr > 0) 1000000000L / (60 + sr) else 0L)
          (q, d, score, dr, sr)
        }.sortBy { case (_, d, s, _, _) => (-s, d) }
          .take(5).zipWithIndex
          .map { case ((q2, d, s, dr, sr), i) =>
            (q2, d, s, dr, sr, (i + 1).toLong) }
      }.toSet
    val got = SimilarityJobs.rrfFusion(spark, sfd)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture produced no fused lists")
    assert(got == expected)
    // both modalities actually contribute somewhere in the fused top-5
    assert(got.exists(r => r._4 > 0 && r._5 == 0) ||
      got.exists(r => r._4 > 0 && r._5 > 0))
    assert(got.exists(r => r._5 > 0))
  }

  test("embedding_outliers: per-cell farthest members match a re-derivation") {
    import graft.io.Tables
    val sfd = sf("sf0.001")
    val vr = Similarity.withNorm(Tables.embeddings(spark, sfd),
      $"vec_id", $"embedding").cache()
    val cents = Similarity.kmeansCentroids(vr, 16, 2)
    val scored = vr.crossJoin(broadcast(cents))
      .select($"vec_id", $"cent_id",
        Similarity.cosine($"v", $"norm", $"cv", $"cnorm").as("cscore"))
    val assigned = graft.ops.TopN
      .topNPer(scored, $"vec_id", $"cscore", $"cent_id", 1)
      .select($"cent_id", $"vec_id", $"cscore")
      .as[(Long, Long, Double)].collect()
    val expected = assigned.groupBy(_._1).toSeq.flatMap { case (cell, rows) =>
      rows.toSeq.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, v, s), i) => (cell, v, s, (i + 1).toLong) }
    }.toSet
    val got = SimilarityJobs.embeddingOutliers(spark, sfd)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
    // outliers are genuinely far: every flagged sim is below the corpus max
    assert(got.nonEmpty && got.forall(_._3 < 1.0))
  }
}
