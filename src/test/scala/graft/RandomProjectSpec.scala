package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Random projection: the JL contract (pairwise-cosine error decays
  * ~1/√outDims), plane decorrelation, and numeric agreement with a scalar
  * reimplementation of the same dot product.
  */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private val DIMS = 64

  private def vecs = Similarity.withNorm(
    graft.io.Tables.load(spark, sf("sf0.001"), "embeddings"),
    col("vec_id"), col("embedding")).select("vec_id", "v")

  test("projection equals the scalar dot product, rounded per discipline") {
    val rows = vecs.limit(3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Similarity.randomProject(vecs.limit(3), 4, DIMS).collect()
      .map(r => r.getLong(0) -> (0 until 4).map(o => r.getDouble(o + 1)))
      .toMap
    rows.foreach { case (id, v) =>
      (0 until 4).foreach { o =>
        var acc = 0.0
        (0 until DIMS).foreach(d => acc += v(d) * Similarity.projWeight(o, d))
        val want = BigDecimal(acc + 1e-12)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(id)(o) == want, s"vec $id plane $o")
      }
    }
  }

  test("pairwise cosine error decays on the JL ~1/sqrt(k) schedule") {
    val V = vecs.orderBy("vec_id").limit(120).collect()
      .map(_.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def meanErr(outDims: Int): Double = {
      val W = Array.tabulate(outDims, DIMS)((o, d) => Similarity.projWeight(o, d))
      val P = V.map(v => W.map(w => (0 until DIMS).map(d => v(d) * w(d)).sum))
      val errs = for {
        i <- V.indices; j <- V.indices if i < j
      } yield math.abs(cos(P(i), P(j)) - cos(V(i), V(j)))
      errs.sum / errs.size
    }
    val (e8, e16, e32) = (meanErr(8), meanErr(16), meanErr(32))
    // monotone, and each doubling buys roughly sqrt(2) (generous band:
    // the ratio must land in [1.15, 1.9] — a correlated-plane regression
    // like planeWeight's cyclic shifts breaks the decay entirely)
    assert(e8 > e16 && e16 > e32, s"no decay: $e8 $e16 $e32")
    assert(e8 / e16 > 1.15 && e8 / e16 < 1.9, s"8→16 ratio ${e8 / e16}")
    assert(e16 / e32 > 1.15 && e16 / e32 < 1.9, s"16→32 ratio ${e16 / e32}")
    assert(e32 < 0.2, s"32-dim mean cosine error too high: $e32")
  }

  test("projection planes are decorrelated (no cyclic-shift family)") {
    val planes = Array.tabulate(16, DIMS)((o, d) => Similarity.projWeight(o, d))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = (0 until n).map(i => (a(i) - ma) * (b(i) - mb)).sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
        b.map(x => (x - mb) * (x - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val worst = (for {
      i <- planes.indices; j <- planes.indices if i < j
    } yield math.abs(corr(planes(i), planes(j)))).max
    assert(worst < 0.5, s"planes correlate at $worst — projection degenerates")
  }

  test("projection runs exchange-free inside the scan") {
    val p = graft.jobs.SimilarityJobs.embeddingProject(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"per-row projection should never shuffle:\n$p")
    assert(p.contains("dot_product"), s"codegen dot missing:\n$p")
  }
}
