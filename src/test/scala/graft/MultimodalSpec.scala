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

  test("feature extraction produces fixed-shape features per asset") {
    val feats = MultimodalJobs.multimodalFeatures(spark, sf("sf0.001"))
      .as[graft.ops.Multimodal.AssetFeatures]
    val rows = feats.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.feature.length == 4)
      assert(r.n_bytes > 0)
      assert(r.mean_byte > 0 && r.mean_byte < 256)
    }
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
}
