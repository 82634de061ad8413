package graft

import org.apache.spark.sql.functions._

/** Greedy k-center coreset: hand-checkable farthest-point traversal on a
  * planted geometry, plus the reference-recomputation property (selection
  * order and assignment must match an in-memory replay of the same
  * integer-quantized recurrence).
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  private def quant(v: Seq[Double]): Array[Double] =
    v.map(x => math.round(x * 1e6 + 1e-9).toDouble).toArray

  private def d2(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def refKCenter(
      pts: Map[Long, Seq[Double]], k: Int): (Vector[Long], Map[Long, (Long, Long)]) = {
    val q = pts.map { case (id, v) => id -> quant(v) }
    var centers = Vector(0L)
    while (centers.size < k) {
      val cand = q.keys.filterNot(centers.contains).map { id =>
        (id, centers.map(c => d2(q(id), q(c))).min)
      }
      // farthest first, tie on smaller id
      val next = cand.toSeq.minBy { case (id, md) => (-md, id) }._1
      centers :+= next
    }
    val assign = q.map { case (id, v) =>
      val (cid, dd) = centers.map(c => (c, d2(v, q(c))))
        .minBy { case (c, dd) => (dd, c) }
      id -> (cid, dd.toLong)
    }
    (centers, assign)
  }

  test("planted clusters: one center lands in each, assignment recovers them") {
    // four tight blobs far apart; k=4 must pick one point per blob
    val blob = Seq(
      Seq(0.0, 0.0), Seq(0.01, 0.0), Seq(0.0, 0.01),
      Seq(10.0, 0.0), Seq(10.01, 0.0),
      Seq(0.0, 10.0), Seq(0.0, 10.01),
      Seq(10.0, 10.0), Seq(10.01, 10.01))
    val df = blob.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val out = Similarity.kCenterCoreset(df, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val centers = out.map(_._2).distinct.sorted
    // greedy picks the FARTHEST member of each far blob: 8 = (10.01,10.01)
    // beats 7, then 4 and 6 (the 10.01-offset points) tie and break by id
    assert(centers == Seq(0L, 4L, 6L, 8L))
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(Seq(0L, 1L, 2L).forall(byId(_) == 0L))
    assert(Seq(3L, 4L).forall(byId(_) == 4L))
    assert(Seq(5L, 6L).forall(byId(_) == 6L))
    assert(Seq(7L, 8L).forall(byId(_) == 8L))
  }

  test("matches the in-memory reference replay on seeded random vectors") {
    val rnd = new scala.util.Random(5)
    val pts = (0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextDouble() * 2 - 1)).toMap
    val df = pts.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val out = Similarity.kCenterCoreset(df, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (centers, assign) = refKCenter(pts, 6)
    assert(out.keySet == pts.keySet)
    assert(out == assign, s"centers chosen: $centers")
  }

  test("coreset_eval scorecard matches an in-memory replay of both methods") {
    import graft.jobs.SimilarityJobs
    val sfd = sf("sf0.001")
    val pts = graft.io.Tables.embeddings(spark, sfd)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val q = pts.map { case (id, v) => id -> quant(v) }
    val k = 8
    // kcenter half: the reference greedy replay
    val (_, kcAssign) = refKCenter(pts, k)
    // hash-sample half: md5-prefix rank (the portable md5Long), then argmin
    def md5long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val sampIds = pts.keys.toSeq.sortBy(id => (md5long(id.toString), id)).take(k)
    val sAssign = q.map { case (id, v) =>
      val dd = sampIds.map(c => d2(v, q(c))).min
      id -> dd.toLong
    }
    def cardOf(a: Iterable[Long]): (Long, Long, Long, Long) =
      (a.size.toLong, a.max, a.sum, a.sum / a.size)
    val expKc = cardOf(kcAssign.values.map(_._2))
    val expSa = cardOf(sAssign.values)
    val got = SimilarityJobs.coresetEval(spark, sfd)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("kcenter") == expKc)
    assert(got("hash_sample") == expSa)
    // the 2-approx guarantee at work on this fixture: the greedy radius
    // must not exceed the blind sample's (probed — a geometry property
    // of the fixture, not a theorem about all inputs)
    assert(got("kcenter")._2 <= got("hash_sample")._2)
  }

  private def refMmr(pts: Map[Long, Seq[Double]], k: Int): Seq[(Long, Long, Long)] = {
    // the mmrSelect recurrence replayed exactly: 1e3 quantization,
    // score = dot(d, Σ) − n·maxSim, ties to the smaller id
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.round(x * 1e3 + 1e-9).toDouble).toArray }
    val n = q.size.toLong
    val dims = q.head._2.length
    val sumV = Array.tabulate(dims)(d => q.values.map(_(d)).sum)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    var sel = Vector.empty[(Long, Long)] // (id, score)
    while (sel.size < k && sel.size < q.size) {
      val chosen = sel.map(_._1).toSet
      val next = q.keys.filterNot(chosen).map { id =>
        val rel = dot(q(id), sumV)
        val pen =
          if (sel.isEmpty) 0.0
          else n.toDouble * sel.map(s => dot(q(id), q(s._1))).max
        (id, (rel - pen).toLong)
      }.toSeq.minBy { case (id, sc) => (-sc, id) }
      sel :+= next
    }
    sel.zipWithIndex.map { case ((id, sc), i) => (i + 1L, id, sc) }
  }

  test("mmr selection matches the reference replay; redundancy is penalized") {
    val rnd = new scala.util.Random(13)
    // 30 base vectors + 5 exact duplicates of vector 0: MMR must not
    // pick a duplicate of an already-selected vector while distinct
    // candidates remain (its penalty is maximal)
    val base = (0L until 30L).map(i =>
      i -> Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val dups = (0L until 5L).map(j => (100L + j) -> base.head._2)
    val pts = (base ++ dups).toMap
    val df = pts.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val got = Similarity.mmrSelect(df, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == refMmr(pts, 10))
    // at most one member of the duplicate family {0, 100..104} selected
    val fam = Set(0L, 100L, 101L, 102L, 103L, 104L)
    assert(got.count(g => fam(g._2)) <= 1)
    // k > corpus: selects everything, once
    val all = Similarity.mmrSelect(df, 100).collect()
    assert(all.length == pts.size &&
      all.map(_.getLong(1)).distinct.length == pts.size)
  }

  test("pca power projection matches an in-memory replay and finds the planted axis") {
    val rnd = new scala.util.Random(3)
    val dims = 6
    // planted dominant direction along axis 2: variance 100x the noise
    val pts = (0L until 60L).map { i =>
      val main = rnd.nextDouble() * 2 - 1
      i -> Seq.tabulate(dims)(d =>
        if (d == 2) main * 10 else (rnd.nextDouble() * 2 - 1) * 0.1)
    }.toMap
    val df = pts.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val got = Similarity.pcaPowerProjection(df, dims, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // in-memory replay of the identical integer recurrence
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.round(x * 1e3 + 1e-9)).toArray
    }
    val gram = Array.tabulate(dims, dims)((d1, d2) =>
      q.values.map(x => x(d1) * x(d2)).sum)
    var v = Array.fill(dims)(1000000L)
    for (_ <- 1 to 5) {
      val y = Array.tabulate(dims)(d1 =>
        (0 until dims).map(d2 => gram(d1)(d2) * v(d2)).sum)
      val m = math.max(y.map(math.abs).max / 1000000L, 1L)
      v = y.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) / m))
    }
    val ref = q.map { case (id, x) =>
      id -> x.zip(v).map { case (a, b) => a * b }.sum
    }
    assert(got == ref)
    // the learned direction must be dominated by the planted axis
    assert(math.abs(v(2)) == v.map(math.abs).max)
    // and projections must order like the planted coordinate
    val byMain = pts.toSeq.sortBy(_._2(2)).map(_._1)
    val byProj = got.toSeq.sortBy { case (id, p) =>
      if (v(2) > 0) p else -p
    }.map(_._1)
    assert(byMain == byProj)
  }
}
