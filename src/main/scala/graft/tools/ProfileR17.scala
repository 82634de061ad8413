package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization profiler — same discipline as [[ProfileR16]]
  * (one warm run, then `runs` cache-cleared runs, median reported), with
  * this round's experiment groups:
  *
  *  - knn:  brute-force cosine leg, scan partitioning vs spread
  *  - cont: doc_containment plain intersection join vs prefix fence
  *  - tr:   textrank_keywords stage breakdown
  *  - njp:  ngram_jaccard_prefix full query (τ×α core)
  *
  * Usage: sbt "runMain graft.tools.ProfileR17 [group ...]"
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val groups = if (args.nonEmpty) args.toSet else
      Set("knn", "cont", "tr", "njp")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (0 to runs).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 0) Some((dt, n)) else None
      }.flatten
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      println(f"[profile] $label%-48s ${med}%7.3f s  (${ts.head._2} rows)")
    }

    val docs = () => graft.io.Tables.documents(spark, sfDir)

    if (groups("knn")) {
      println("== knn_classify / brute-force leg ==")
      def v() = graft.ops.Similarity.withNorm(
        graft.io.Tables.embeddings(spark, sfDir), col("vec_id"),
        col("embedding"))
      def scoredOver(corpus: DataFrame) = {
        val q = broadcast(v().filter(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qn")))
        val scored = corpus.join(q, col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            graft.ops.Similarity.cosine(col("qv"), col("qn"), col("v"),
              col("norm")).as("sim"))
        graft.ops.TopN.topNPer(scored, col("query_id"), col("sim"),
          col("neighbor_id"), 5)
      }
      time("knn: brute leg, scan partitioning (1 task)") {
        scoredOver(v().filter(col("vec_id") % 2 === 0))
      }
      time("knn: brute leg, corpus spread to cores") {
        scoredOver(v().filter(col("vec_id") % 2 === 0)
          .repartition(spark.sparkContext.defaultParallelism))
      }
      time("knn: full knn_classify") {
        graft.jobs.SimilarityJobs.knnClassify(spark, sfDir)
      }
      time("rrf: full rrf_fusion") {
        graft.jobs.SimilarityJobs.rrfFusion(spark, sfDir)
      }
      time("ann: full ann_cosine_topk") {
        graft.jobs.SimilarityJobs.annCosineTopK(spark, sfDir)
      }
    }

    if (groups("lsh")) {
      println("== ann_lsh candidate join variants (planes=5, k=5) ==")
      def v() = graft.ops.Similarity.withNorm(
        graft.io.Tables.embeddings(spark, sfDir), col("vec_id"),
        col("embedding"))
      def lshOver(vecs: DataFrame, bcast: Boolean) = {
        val withBucket = vecs
          .withColumn("bucket",
            graft.ops.Similarity.lshBucket(col("v"), 5, 64)).cache()
        val probes = withBucket.withColumn("probe",
          explode(array((lit(0) +: (0 until 5).map(j => lit(1 << j))): _*)))
          .withColumn("probe", col("bucket").bitwiseXOR(col("probe")))
        val a = probes.alias("a")
        val b0 = withBucket.alias("b")
        val b = if (bcast) broadcast(b0) else b0
        val scored = a.join(b,
            col("a.probe") === col("b.bucket") &&
              col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("query_id"),
            col("b.vec_id").as("neighbor_id"),
            graft.ops.Similarity.cosine(col("a.v"), col("a.norm"),
              col("b.v"), col("b.norm")).as("sim"))
        graft.ops.TopN.topNPer(scored, col("query_id"), col("sim"),
          col("neighbor_id"), 5)
      }
      time("lsh: as-is (scan partitioning, bucket equi-join)") {
        lshOver(v(), bcast = false)
      }
      time("lsh: vectors spread to cores") {
        lshOver(v().repartition(spark.sparkContext.defaultParallelism),
          bcast = false)
      }
      time("lsh: spread + broadcast bucket side") {
        lshOver(v().repartition(spark.sparkContext.defaultParallelism),
          bcast = true)
      }
      time("lsh: full ann_lsh (registered)") {
        graft.jobs.SimilarityJobs.annLsh(spark, sfDir)
      }
    }

    if (groups("cont")) {
      println("== doc_containment: plain vs prefix fence (tau=0.5 ppm) ==")
      def d() = docs()
        .select(col("doc_id"), col("text"), col("lang").as("block"))
      time("cont: plain full intersection join") {
        graft.ops.Dedup.containmentPairs(d(), 2, 500000L)
      }
      time("cont: prefix-fenced") {
        graft.ops.Dedup.containmentPairsPrefix(d(), 2, 500000L)
      }
    }

    if (groups("tr")) {
      println("== textrank_keywords stages ==")
      val stop = graft.ops.TextAnalysis.stopwordPattern
      def toks() = docs()
        .select(regexp_extract_all(
          regexp_replace(lower(col("text")), stop, " "),
          lit("[a-z0-9]+"), lit(0)).as("l"))
      def pairsAt(t: DataFrame, k: Int) = {
        val n = size(col("l"))
        t.filter(n > k)
          .select(explode(arrays_zip(
            slice(col("l"), lit(1), n - k),
            slice(col("l"), lit(k + 1), n - k))).as("p"))
          .select(col("p").getField("0").as("w1"),
            col("p").getField("1").as("w2"))
      }
      time("tr: edge distinct (e0), r16 string-pair form") {
        val t = toks().cache()
        pairsAt(t, 1).unionAll(pairsAt(t, 2))
          .filter(col("w1") =!= col("w2"))
          .select(least(graft.jobs.TextJobs.hash60(col("w1")),
              graft.jobs.TextJobs.hash60(col("w2"))).as("a"),
            greatest(graft.jobs.TextJobs.hash60(col("w1")),
              graft.jobs.TextJobs.hash60(col("w2"))).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
      }
      time("tr: edge distinct (e0), hash-first lead form") {
        import org.apache.spark.sql.expressions.Window
        val t = docs()
          .select(col("doc_id"),
            posexplode(regexp_extract_all(
              regexp_replace(lower(col("text")), stop, " "),
              lit("[a-z0-9]+"), lit(0))).as(Seq("pos", "w")))
          .select(col("doc_id"), col("pos"),
            graft.jobs.TextJobs.hash60(col("w")).as("wh"))
          .cache()
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        t.select(col("wh"),
            lead(col("wh"), 1).over(wDoc).as("n1"),
            lead(col("wh"), 2).over(wDoc).as("n2"))
          .select(col("wh").as("h1"),
            explode(array(col("n1"), col("n2"))).as("h2"))
          .filter(col("h2").isNotNull)
          .select(least(col("h1"), col("h2")).as("a"),
            greatest(col("h1"), col("h2")).as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
      }
      time("tr: full textrank_keywords") {
        graft.jobs.TextJobs.textrankKeywords(spark, sfDir)
      }
    }

    if (groups("nj")) {
      println("== ngram_jaccard: unmanaged-lazy vs scoped+checkpoint ==")
      def d() = docs()
        .select(col("doc_id"), col("text"), col("lang").as("block"))
      time("nj: r16 form (unmanaged caches, lazy count)") {
        graft.ops.Dedup.jaccardPairs(d(), 2, 0.35)
          .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      }
      time("nj: registered (scoped + eager checkpoint)") {
        graft.jobs.DedupJobs.ngramJaccard(spark, sfDir)
      }
      time("nj: scoped, no checkpoint (caches live at count)") {
        val scope = graft.ops.CacheScope()
        try graft.ops.Dedup.jaccardPairs(d(), 2, 0.35, scope)
          .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
        finally () // left open on purpose for the measurement
      }
    }

    if (groups("njp")) {
      println("== ngram_jaccard_prefix (τ×α core) ==")
      time("njp: full ngram_jaccard_prefix") {
        graft.jobs.DedupJobs.ngramJaccardPrefix(spark, sfDir)
      }
    }

    spark.stop()
  }
}
