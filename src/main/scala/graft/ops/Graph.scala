package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over interaction graphs — the classic iterative-compute
  * workload an analytics engine runs beside its aggregations (the
  * reference's Flink sits next to Gelly; Spark's analogue is an iterative
  * DataFrame loop, here with the same two-regime discipline as
  * [[Dedup.connectedComponents]]).
  *
  * All arithmetic is INTEGER-scaled so any engine, any partitioning, any
  * summation order lands on bit-identical ranks (the repo's engine-exact
  * contract): ranks are 10^12-scaled BIGINTs, the damping step is a
  * per-edge BIGINT floor division, and per-node in-flows are integer sums
  * (order-independent). That makes the fixpoint restatable as unrolled
  * SQL CTEs and hash-checkable against DuckDB.
  *
  * One core serves both flavors: uniform PageRank is personalized
  * PageRank whose seed set is every node (restart mass BASE·N div N =
  * BASE), so the recurrence, the regime selection, and the exactness
  * argument are written once.
  */
object Graph {

  /** Rank scale: 1.0 of probability mass = 10^12. The binding constraint
    * is the damping step `r·85`, not the total mass: a single node's rank
    * must stay ≤ Long.MaxValue/85 ≈ 1.08·10^17. For UNIFORM PageRank at
    * N = 10^6 nodes (total mass 10^18) that means no single hub may hold
    * more than ~10.8% of total mass — true of interaction graphs but NOT
    * guaranteed in general; hubbier graphs (or N beyond 10^6) drop the
    * scale a decade per decade (the contract only needs scale ≫ N for
    * resolution). For PERSONALIZED PageRank the constraint binds in round
    * 1 already — each seed starts at exactly SCALE·N div |S| — so
    * [[checkSeedMass]] asserts it instead of wrapping silently (non-ANSI
    * Spark and Scala Long arithmetic both wrap without error).
    */
  val PrScale: Long = 1000000000000L

  /** Personalized-variant overflow guard: r₀(seed) = SCALE·N div |S| and
    * the damping step multiplies a rank by 85 before its div, so both
    * SCALE·N and (SCALE·N div |S|)·85 must fit a Long or the fixpoint
    * silently wraps. Runs in both regimes (in-task below the edge limit,
    * driver-side above) before any rank arithmetic.
    */
  private[graft] def checkSeedMass(n: Long, nSeeds: Long): Unit = {
    require(n <= Long.MaxValue / PrScale,
      s"pageRank: N=$n nodes overflows scale $PrScale — drop Graph.PrScale" +
        " a decade per decade of nodes")
    require(PrScale * n / nSeeds <= Long.MaxValue / 85L,
      s"personalizedPageRank: seed restart mass ${PrScale} * $n / $nSeeds " +
        s"overflows the 85x damping step (N/|S| too large for scale " +
        s"$PrScale) — drop Graph.PrScale or widen the seed set")
  }

  /** Damped base mass: (1-d)·SCALE with d = 0.85, as exact integers. */
  val PrBase: Long = PrScale * 15L / 100L

  /** PageRank over a directed edge list (`src`, `dst` LONG), `iters`
    * fixed rounds, damping 0.85, NO dangling-mass redistribution (callers
    * passing symmetric edge sets — the bipartite-interaction case — have
    * no dangling nodes by construction; for general graphs the leaked
    * mass only rescales ranks uniformly per round, preserving order).
    *
    * Update rule, all BIGINT:
    *   r₀(v)    = SCALE
    *   rₜ₊₁(v) = BASE + Σ_{u→v} (rₜ(u)·85) div (outdeg(u)·100)
    *
    * Regime selection (the round-8 `connectedComponents` lesson, measured
    * in SCALE.md §8f/§8g for the graph-loop family): the EDGE frame of an
    * interaction graph is the distinct (user,item) pair set — orders of
    * magnitude smaller than the event log it aggregates from — so when
    * one count shows ≤ `singleTaskEdgeLimit` edges the whole k-round
    * fixpoint runs inside ONE executor task over primitive arrays
    * (`coalesce(1).mapPartitions`, no driver collect): k rounds × 3
    * exchanges of a frame that fits in one task is pure scheduling.
    * Above the limit the distributed loop runs: edges⨝ranks keyed on
    * LONG node ids, per-round in-flow as a map-side-combinable integer
    * sum, `localCheckpoint` every `checkpointEvery` rounds to stop the
    * logical plan nesting one join layer per round (the round-4 rule).
    *
    * 100 TB shape: the event log never enters the loop — callers
    * aggregate it to distinct edges first (one shuffle over the raw log);
    * the loop then costs `iters` × (one edge⨝rank shuffle + one dst-keyed
    * agg) over the edge frame only, every key a LONG.
    */
  def pageRank(
      edges: DataFrame, iters: Int = 10,
      checkpointEvery: Int = 5,
      singleTaskEdgeLimit: Long = 4000000L): DataFrame =
    pageRankInstrumented(edges, iters, checkpointEvery, singleTaskEdgeLimit)._1

  /** [[pageRank]] plus which regime ran (true = single-task), so specs can
    * pin the path — both land bit-identical ranks, which the output alone
    * cannot reveal.
    */
  private[graft] def pageRankInstrumented(
      edges: DataFrame, iters: Int,
      checkpointEvery: Int = 5,
      singleTaskEdgeLimit: Long = 4000000L): (DataFrame, Boolean) =
    core(edges, None, iters, checkpointEvery, singleTaskEdgeLimit)

  /** Personalized PageRank: identical recurrence, but the restart mass
    * (1−d) injects ONLY at the `seeds` nodes (a one-column LONG frame),
    * each seed receiving BASE·N div |S| so total restart mass matches the
    * uniform variant's; non-seeds start at 0. Ranks then measure
    * proximity to the seed set — the "users like these" recommendation
    * primitive over the same interaction graph.
    *
    *   r₀(v)    = SCALE·N div |S| if v ∈ S else 0
    *   rₜ₊₁(v) = base(v) + Σ_{u→v} (rₜ(u)·85) div (outdeg(u)·100)
    *   base(v)  = BASE·N div |S| if v ∈ S else 0
    *
    * Same two regimes and exactness contract as [[pageRank]]; the seed
    * set ships as a broadcast membership bit on the node frame (or an
    * in-task hash set below the regime limit, where the node count and
    * the normalized mass are ALSO computed in-task — every pre-loop
    * `count()` on a tiny graph is pure scheduling).
    */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iters: Int = 10,
      checkpointEvery: Int = 5,
      singleTaskEdgeLimit: Long = 4000000L): DataFrame =
    core(edges, Some(seeds), iters, checkpointEvery, singleTaskEdgeLimit)._1

  /** The shared fixpoint. `seeds = None` is the uniform variant — restart
    * mass at every node, which needs no membership structures at all.
    */
  private def core(
      edges: DataFrame, seeds: Option[DataFrame], iters: Int,
      checkpointEvery: Int,
      singleTaskEdgeLimit: Long): (DataFrame, Boolean) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().cache()
    val nEdges = e.count() // materializes the cache; picks the regime
    val s = seeds.map(_.select(col("seed").cast("long")).distinct())

    if (nEdges <= singleTaskEdgeLimit) {
      // |S|-sized driver copy (None → no set); the node count and the
      // normalized seed mass are computed IN-TASK from the interned graph
      val seedSet = s.map(_.as[Long].collect().toSet)
      val nSeeds = seedSet.map(ss => math.max(ss.size.toLong, 1L))
      val ranks = e.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val pairs = it.toArray
        val idx = scala.collection.mutable.LongMap.empty[Int]
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        def intern(x: Long): Int =
          idx.getOrElseUpdate(x, { ids += x; ids.length - 1 })
        val srcI = new Array[Int](pairs.length)
        val dstI = new Array[Int](pairs.length)
        var i = 0
        while (i < pairs.length) {
          srcI(i) = intern(pairs(i)._1); dstI(i) = intern(pairs(i)._2)
          i += 1
        }
        val n = ids.length
        val deg = new Array[Long](n)
        i = 0
        while (i < pairs.length) { deg(srcI(i)) += 1L; i += 1 }
        val (massOf, baseOf): (Int => Long, Int => Long) = seedSet match {
          case None => (_ => PrScale, _ => PrBase)
          case Some(ss) =>
            checkSeedMass(n.toLong, nSeeds.get)
            val m = PrScale * n / nSeeds.get
            val b = PrBase * n / nSeeds.get
            (j => if (ss.contains(ids(j))) m else 0L,
              j => if (ss.contains(ids(j))) b else 0L)
        }
        val base = Array.tabulate(n)(baseOf)
        var r = Array.tabulate(n)(massOf)
        var round = 0
        while (round < iters) {
          val nxt = base.clone()
          i = 0
          while (i < pairs.length) {
            nxt(dstI(i)) += (r(srcI(i)) * 85L) / (deg(srcI(i)) * 100L)
            i += 1
          }
          r = nxt
          round += 1
        }
        ids.indices.iterator.map(j => (ids(j), r(j)))
      }.toDF("node", "r").localCheckpoint()
      e.unpersist()
      return (ranks, true)
    }

    // Distributed loop. Out-degrees ride the cached edge frame so each
    // round's contribution is computable in-row after ONE rank join; the
    // per-node base lands on the node frame once (broadcast seed join).
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val esd = e.join(deg, "src").cache()
    esd.count() // materialize so the raw edge cache can be released
    e.unpersist()
    val plainNodes = esd.select(col("src").as("node"))
      .union(esd.select(col("dst").as("node"))).distinct()
    val nodes = (s match {
      case None =>
        plainNodes.select(col("node"), lit(PrBase).as("base"),
          lit(PrScale).as("r0"))
      case Some(sd) =>
        val sc = sd.cache()
        val nSeeds = math.max(sc.count(), 1L)
        val nNodes = plainNodes.count()
        checkSeedMass(nNodes, nSeeds)
        val b = PrBase * nNodes / nSeeds
        val m = PrScale * nNodes / nSeeds
        plainNodes
          .join(broadcast(sc.withColumnRenamed("seed", "node"))
            .withColumn("is_seed", lit(true)), Seq("node"), "left")
          .select(col("node"),
            when(col("is_seed"), lit(b)).otherwise(lit(0L)).as("base"),
            when(col("is_seed"), lit(m)).otherwise(lit(0L)).as("r0"))
    }).cache()
    var ranks = nodes.select(col("node"), col("r0").as("r")).cache()
    var prev = ranks
    var round = 0
    while (round < iters) {
      val inflow = esd
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(r * 85) div (deg * 100)")).as("in_r"))
      val next0 = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("base") + coalesce(col("in_r"), lit(0L))).as("r"))
      val next = if ((round + 1) % checkpointEvery == 0) next0.localCheckpoint()
                 else next0.cache()
      next.count()
      prev.unpersist()
      prev = next
      ranks = next
      round += 1
    }
    (ranks, false)
  }
}
