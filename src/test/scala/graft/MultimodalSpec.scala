package graft

import graft.ops.Multimodal
import graft.jobs.MultimodalJobs

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("assets carry binary payloads with typed metadata") {
    val a = Multimodal.assetsFromDocuments(
      spark, graft.io.Tables.documents(spark, sf("sf0.001")))
    val first = a.filter(_.asset_id == 0L).head()
    assert(first.content.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.kind))
    assert(first.width >= 64 && first.height >= 64)
  }

  test("feature extraction produces one scalar column per stripe") {
    val feats = MultimodalJobs.multimodalFeatures(spark, sf("sf0.001"))
    assert(feats.columns.toSeq == Seq("asset_id", "n_bytes", "mean_byte",
      "frames_sampled", "stripe_0", "stripe_1", "stripe_2", "stripe_3"))
    val rows = feats.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      val mean = r.getAs[Double]("mean_byte")
      assert(mean > 0 && mean < 256)
      val stripeAvg = (0 until 4)
        .map(i => r.getAs[Double](s"stripe_$i")).sum / 4
      assert(math.abs(stripeAvg - mean) < 1e-3)
    }
  }

  test("library-level feature vector keeps its fixed shape") {
    val feats = Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(
        spark, graft.io.Tables.documents(spark, sf("sf0.001"))),
      stripes = 4, frameTarget = 8)
    feats.limit(10).collect().foreach { r =>
      assert(r.feature.length == 4)
      assert(r.frames_sampled >= 1 && r.frames_sampled <= 8)
    }
  }

  test("PNG encode → javax.imageio decode round-trips the exact pixels") {
    val (w, h) = (11, 7)
    val png = Multimodal.encodePng(w, h, (x, y) => Multimodal.pixelValue(42L, x, y))
    // a REAL PNG: magic bytes + ImageIO parses it
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == Multimodal.pixelValue(42L, x, y))
  }

  test("image assets decode through the real codec, not the stub") {
    val assets = Multimodal.imageAssets(spark,
      graft.io.Tables.documents(spark, sf("sf0.001")).select("doc_id").limit(6))
    val feats = Multimodal.extractFeatures(assets, stripes = 4, frameTarget = 8)
      .collect().map(f => f.asset_id -> f).toMap
    assets.collect().foreach { a =>
      val (w, h) = Multimodal.pngDims(a.asset_id)
      // n_bytes is the DECODED pixel count (w*h), not the PNG payload size
      assert(feats(a.asset_id).n_bytes == w.toLong * h)
      assert(feats(a.asset_id).n_bytes != a.content.length)
      // expected mean from the arithmetic pattern, via the stub's stripe math
      val px = Array.tabulate(w * h)(i =>
        Multimodal.pixelValue(a.asset_id, i % w, i / w))
      val stripeMeans = (0 until 4).map { s =>
        val lo = (w * h) * s / 4; val hi = (w * h) * (s + 1) / 4
        px.slice(lo, hi).map(_.toLong).sum.toDouble / (hi - lo)
      }
      val exp = stripeMeans.sum / 4
      assert(math.abs(feats(a.asset_id).mean_byte - exp) < 1e-3)
    }
  }

  test("WAV encode → javax.sound.sampled decode round-trips the exact samples") {
    val n = 53
    val wav = Multimodal.encodeWav(n, i => Multimodal.pixelValue(7L, i, 0))
    assert(wav.take(4).map(_.toChar).mkString == "RIFF") // a REAL WAV
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val pcm = try in.readAllBytes() finally in.close()
    assert(pcm.length == n)
    (0 until n).foreach(i =>
      assert((pcm(i) & 0xff) == Multimodal.pixelValue(7L, i, 0)))
  }

  test("frame sampling is deterministic and bounded") {
    assert(Multimodal.sampleFrameIndices(30, 8).length <= 8)
    assert(Multimodal.sampleFrameIndices(3, 8) == Seq(0, 1, 2))
    assert(Multimodal.sampleFrameIndices(1, 8) == Seq(0))
    assert(Multimodal.sampleFrameIndices(30, 8) ==
      Multimodal.sampleFrameIndices(30, 8))
  }

  test("resize shrinks payload and preserves aspect bound") {
    val a = Multimodal.assetsFromDocuments(
      spark, graft.io.Tables.documents(spark, sf("sf0.001")))
    val resized = Multimodal.resize(a, 64).collect()
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 64)
      assert(r.content.nonEmpty)
    }
  }

  test("dHash fingerprints come from the real PNG decode and match the arithmetic pattern") {
    // the codec-reality check: fingerprints computed by decoding the
    // actual PNG payloads must equal fingerprints computed straight from
    // the arithmetic pixel function (PNG is lossless, so any difference
    // means the decode path is broken)
    val docs = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").limit(40)
    val fromCodec = MultimodalSpecHelpers.fpMap(
      Multimodal.imageFingerprints(spark, docs))
    val ids = docs.collect().map(_.getLong(0))
    for (id <- ids) {
      val (w, h) = Multimodal.neardupDims(Multimodal.neardupBase(id))
      val px = Array.tabulate(w * h)(i =>
        Multimodal.neardupPixel(id, i % w, i / w).toByte)
      assert(fromCodec(id) == Multimodal.dHash63(px, w, h),
        s"decode-path fingerprint drift for id $id")
    }
  }

  test("banded Hamming LSH finds exactly the brute-force pairs at the radius") {
    // losslessness of the pigeonhole banding + first-shared-band rule +
    // identity compression: the LSH output must equal brute-force
    // all-pairs over the same fingerprints, and the planted fixture must
    // actually produce near-dup (0 < hamming <= 3) pairs, not just exact
    val docs = graft.io.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").limit(200)
    val fps = Multimodal.imageFingerprints(spark, docs).cache()
    val got = MultimodalJobs.imageNeardup(spark, sf("sf0.001"))
    val fpm = MultimodalSpecHelpers.fpMap(fps)
    val expected = (for {
      a <- fpm.keys; b <- fpm.keys if a < b
      hm = java.lang.Long.bitCount(fpm(a) ^ fpm(b))
      if hm <= 3
    } yield (a, b, hm.toLong)).toSet
    val gotSub = got
      .filter($"doc_a".isin(fpm.keys.toSeq: _*) &&
        $"doc_b".isin(fpm.keys.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSub == expected,
      s"only-lsh=${(gotSub -- expected).take(3)} " +
        s"only-brute=${(expected -- gotSub).take(3)}")
    assert(expected.exists(_._3 > 0), "fixture must plant true near dups")
    assert(expected.exists(_._3 == 0), "fixture must plant exact dups")
    fps.unpersist()
  }
  test("image clusters collapse planted near-dup groups to one keeper") {
    // the fixture plants groups of NeardupGroup consecutive ids; with
    // zero cross-base pairs at the radius (measured), every cluster
    // label must be its group's minimum id
    val got = graft.jobs.MultimodalJobs.imageClusters(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val g = Multimodal.NeardupGroup
    val groupMin = got.keys.groupBy(_ / g).map { case (b, ids) => b -> ids.min }
    got.foreach { case (id, cluster) =>
      assert(cluster == groupMin(id / g),
        s"id $id labelled $cluster, expected its group minimum")
    }
  }

  test("multimodal_pairs: keep = cluster keeper AND caption quality gate") {
    val dir = sf("sf0.001")
    val rows = graft.jobs.MultimodalJobs.multimodalPairs(spark, dir)
      .select("doc_id", "qt", "cluster_size", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val curation = graft.jobs.MultimodalJobs.imageCuration(spark, dir)
      .select("asset_id", "is_keeper").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (id, qt, _, keep) =>
      assert(keep == (curation(id) && qt >= 4000L))
    }
    // the gate must actually split the corpus: some kept, some dropped
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

}

private object MultimodalSpecHelpers {
  def fpMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
}
