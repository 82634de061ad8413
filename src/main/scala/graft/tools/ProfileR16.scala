package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Eager.EagerOps

/** Round-16 optimization profiler: times labeled sub-stages of the
  * registry's top-cost queries in isolation (steady-state: each thunk
  * runs `runs` times after one warm run, median reported) so the
  * optimization work targets measured stage costs instead of guesses.
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench.
  *
  * Usage: sbt "runMain graft.tools.ProfileR16 [group ...]"
  * Groups: image, video, crossmodal, thumbnail, text, q21 (default all).
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val groups = if (args.nonEmpty) args.toSet else
      Set("image", "video", "crossmodal", "thumbnail", "text", "q21")
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
        if (i > 0) Some((dt, n)) else None // run 0 = warm, untimed slot
      }.flatten
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      println(f"[profile] $label%-45s ${med}%7.3f s  (${ts.head._2} rows)")
    }

    val docs = () => graft.io.Tables.documents(spark, sfDir)

    if (groups("micro")) {
      println("== driver-side codec micro-bench (5000 assets, 1 thread) ==")
      def micro(label: String)(body: => Unit): Unit = {
        body // warm
        val t0 = System.nanoTime(); body
        println(f"[profile] $label%-45s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      import graft.ops.Multimodal
      // The first body below touches Multimodal, whose object init runs
      // ImageIO.setUseCache(false) — so "cache default" would silently
      // measure the memory-cached path (r16 advice). Force the JDK
      // default (true) explicitly for the baseline legs.
      Multimodal.neardupDims(0) // trigger object init BEFORE the baseline
      javax.imageio.ImageIO.setUseCache(true)
      micro("png encode x5000 (JDK default, disk cache)") {
        (0 until 5000).foreach { id =>
          val base = id / 8
          val (w, h) = Multimodal.neardupDims(base)
          Multimodal.encodePng(w, h, (x, y) => Multimodal.neardupPixel(id, x, y))
        }
      }
      val pngs = (0 until 5000).map { id =>
        val base = id / 8
        val (w, h) = Multimodal.neardupDims(base)
        (id, w, h,
          Multimodal.encodePng(w, h, (x, y) => Multimodal.neardupPixel(id, x, y)))
      }
      micro("png decode x5000 (ImageIO.read, JDK default)") {
        pngs.foreach { case (_, _, _, b) =>
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        }
      }
      javax.imageio.ImageIO.setUseCache(false)
      micro("png encode x5000 (setUseCache(false))") {
        (0 until 5000).foreach { id =>
          val base = id / 8
          val (w, h) = Multimodal.neardupDims(base)
          Multimodal.encodePng(w, h, (x, y) => Multimodal.neardupPixel(id, x, y))
        }
      }
      micro("png decode x5000 (setUseCache(false))") {
        pngs.foreach { case (_, _, _, b) =>
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        }
      }
      // restore the PRODUCTION setting (false — Multimodal's init), not
      // the JDK default: groups profiled after micro must measure the
      // configuration the engine actually runs (r16 advice).
      javax.imageio.ImageIO.setUseCache(false)
    }

    if (groups("image")) {
      println("== image pipeline stages ==")
      time("img: synth+decode+dHash (fingerprints)") {
        graft.ops.Multimodal.imageFingerprints(spark, docs())
      }
      time("img: full scan (fp+dims)") {
        graft.ops.Multimodal.imageScan(spark, docs())
      }
      time("img: pairs (hammingPairsAuto over scan)") {
        graft.jobs.MultimodalJobs.pipeline(spark, sfDir).pairs
      }
      time("img: clusters (pairs + components)") {
        graft.jobs.MultimodalJobs.imageClusters(spark, sfDir)
      }
      time("img: curation (full)") {
        graft.jobs.MultimodalJobs.imageCuration(spark, sfDir)
      }
    }

    if (groups("video")) {
      println("== video scan ==")
      time("vid: videoScan ALL frames") {
        graft.ops.Multimodal.videoScan(spark, docs())
      }
      time("vid: videoScan frame 0 only (filtered)") {
        graft.ops.Multimodal.videoScan(spark, docs())
          .filter(col("frame_idx") === 0)
      }
    }

    if (groups("thumbnail")) {
      println("== thumbnail_match stages ==")
      time("tm: img fp leg") {
        graft.ops.Multimodal.imageFingerprints(spark, docs())
          .select((col("doc_id") * 2).as("doc_id"), col("fp"))
      }
      time("tm: vid frame-0 fp leg") {
        graft.ops.Multimodal.videoScan(spark, docs())
          .filter(col("frame_idx") === 0)
          .select((col("doc_id") * 2 + 1).as("doc_id"), col("fp"))
      }
      time("tm: full thumbnail_match") {
        graft.jobs.MultimodalJobs.thumbnailMatch(spark, sfDir)
      }
    }

    if (groups("crossmodal")) {
      println("== cross_modal_clusters stages ==")
      time("cm: text candidates leg") {
        val scope = graft.ops.CacheScope()
        try new graft.ops.DedupPipeline(
            docs().select(col("doc_id"), col("text")), 8, 2, 2, scope)
          .candidates.select(col("doc_a"), col("doc_b")).eagerCheckpoint()
        finally scope.close()
      }
      time("cm: image pairs leg") {
        val scope = graft.ops.CacheScope()
        try graft.jobs.MultimodalJobs.pipelineScoped(spark, sfDir, scope)
          .pairs.select(col("doc_a"), col("doc_b")).eagerCheckpoint()
        finally scope.close()
      }
      time("cm: full cross_modal_clusters") {
        graft.jobs.DedupJobs.crossModalClusters(spark, sfDir)
      }
    }

    if (groups("text")) {
      println("== textrank / jaccard stages ==")
      time("tr: full textrank_keywords") {
        graft.jobs.TextJobs.textrankKeywords(spark, sfDir)
      }
      time("njp: full ngram_jaccard_prefix") {
        graft.jobs.DedupJobs.ngramJaccardPrefix(spark, sfDir)
      }
    }

    if (groups("text2")) {
      println("== single-task text scans ==")
      val stop = graft.ops.TextAnalysis.stopwordPattern
      time("tok: regexp tokenize, scan as-is") {
        docs().select(regexp_extract_all(
          regexp_replace(lower(col("text")), stop, " "),
          lit("[a-z0-9]+"), lit(0)).as("l"))
      }
      time("tok: regexp tokenize, repartitioned first") {
        docs().repartition(spark.sparkContext.defaultParallelism)
          .select(regexp_extract_all(
            regexp_replace(lower(col("text")), stop, " "),
            lit("[a-z0-9]+"), lit(0)).as("l"))
      }
    }

    if (groups("audio")) {
      println("== audio pipeline stages ==")
      time("au: neardup assets synth") {
        graft.ops.Multimodal.neardupAudioAssets(spark, docs()).toDF()
          .select(col("asset_id"))
      }
      time("au: full audio_neardup") {
        graft.jobs.MultimodalJobs.audioNeardup(spark, sfDir)
      }
      time("au: full audio_clusters") {
        graft.jobs.MultimodalJobs.audioClusters(spark, sfDir)
      }
      time("vd: full video_neardup") {
        graft.jobs.MultimodalJobs.videoNeardup(spark, sfDir)
      }
    }

    if (groups("sh")) {
      println("== simhashWide single-task partial agg ==")
      time("sh: simhashWide as-is") {
        graft.ops.Dedup.simhashWide(docs(), col("doc_id"), col("text"), 60)
      }
      time("sh: simhashWide docs repartitioned") {
        graft.ops.Dedup.simhashWide(
          docs().repartition(spark.sparkContext.defaultParallelism),
          col("doc_id"), col("text"), 60)
      }
      time("sh: full simhash_eval") {
        graft.jobs.DedupJobs.simhashEval(spark, sfDir)
      }
    }

    if (groups("njp2")) {
      println("== ngram_jaccard_prefix internals (even half, n=2, tau=4/5) ==")
      import org.apache.spark.sql.expressions.Window
      def d() = docs().where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang").as("block"))
      def eFrame() = graft.ops.Dedup.explodedGrams(
          d().select(col("doc_id"), col("block"), col("text")), 2,
          distinct = false)
        .select(col("doc_id"), col("block"),
          graft.ops.Dedup.md5Long(col("gram")).as("gh"))
        .distinct()
      time("njp: e (grams+md5+distinct)") { eFrame() }
      def prefixFrame() = {
        val e = eFrame()
        val dfc = e.groupBy(col("block"), col("gh"))
          .agg(count(lit(1)).as("gram_df"))
        val wDoc = Window.partitionBy(col("doc_id"))
        e.join(dfc, Seq("block", "gh"))
          .withColumn("rk", row_number().over(
            wDoc.orderBy(col("gram_df").asc, col("gh").asc)))
          .withColumn("nn", count(lit(1)).over(wDoc))
          .filter(col("rk") <= graft.ops.Dedup.prefixLen(col("nn"), 4, 5))
          .select(col("doc_id"), col("block"), col("gh"))
      }
      time("njp: prefix (df rank + filter)") { prefixFrame() }
      time("njp: cand (prefix self-join + distinct)") {
        val p = prefixFrame().cache()
        val pa = p.alias("pa"); val pb = p.alias("pb")
        pa.join(pb, col("pa.gh") === col("pb.gh") &&
            col("pa.block") === col("pb.block") &&
            col("pa.doc_id") < col("pb.doc_id"))
          .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
          .distinct()
      }
      time("njp: cand raw rows (no distinct)") {
        val p = prefixFrame().cache()
        val pa = p.alias("pa"); val pb = p.alias("pb")
        pa.join(pb, col("pa.gh") === col("pb.gh") &&
            col("pa.block") === col("pb.block") &&
            col("pa.doc_id") < col("pb.doc_id"))
          .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      }
    }

    if (groups("q21")) {
      println("== q21 stages ==")
      time("q21: full") {
        graft.jobs.RelationalJobs.q21LateSupplier(spark, sfDir)
      }
    }

    spark.stop()
  }
}
