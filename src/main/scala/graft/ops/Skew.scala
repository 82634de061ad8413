package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * Catalyst's partial aggregation already absorbs most aggregation skew
  * (map-side combine), and AQE splits skewed join partitions
  * (`spark.sql.adaptive.skewJoin.enabled`). Explicit salting remains the
  * tool for the residual cases: a hot grouping key whose *distinct-value*
  * state is too large for one reducer, or a shuffle whose single hot
  * partition stalls the stage.
  *
  * `saltedAgg` runs algebraic aggregations in two phases: group on
  * (key, salt) — spreading one hot key over `buckets` reducers — then
  * re-aggregate the partials on key alone. Exact for any algebraic
  * aggregate (sum/count/min/max); compose avg as sum/count.
  */
object Skew {

  /** Salt in [0, buckets): hash of the row's stable spread column (pass an
    * id-ish column). NULL spread values fall back to a rand-free monotonic
    * id so they spread across buckets instead of all hashing into one.
    *
    * AGGREGATION-ONLY on NULL spread values: the monotonic-id fallback is
    * nondeterministic across task retries/recomputation (its value depends
    * on partition layout), which is exact for two-phase salted aggregation
    * (any bucket assignment yields the same re-aggregated total) but would
    * be the classic nondeterministic-repartition correctness bug if used
    * as a join or repartition key. For those, derive the salt from stable
    * row content (`pmod(hash(cols…), buckets)`) instead.
    */
  def salt(spread: Column, buckets: Int): Column =
    when(spread.isNull,
        pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .otherwise(pmod(hash(spread), lit(buckets)))

  /** Salt with no spread column at all: rand-free monotonic id. Same
    * AGGREGATION-ONLY caveat as the unary overload — nondeterministic
    * under retries, never a join/repartition key.
    */
  def salt(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  /** Retry-stable salt from row CONTENT: hash of the given columns. The
    * variant that IS safe as a join or repartition key (a recomputed task
    * reproduces the identical bucket), at the price that rows with equal
    * content land in the same bucket — pass columns that distinguish rows
    * within the hot key. For a salted join, replicate the other side
    * `buckets` times with `explode(sequence(0, buckets-1))` and join on
    * (key, salt).
    */
  def saltFromContent(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted aggregation.
    * `partials`: aggregations on (key, salt); `finals`: re-aggregations of
    * the partial columns on key.
    */
  def saltedAgg(
      df: DataFrame, key: Column, spread: Column, buckets: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(spread, buckets))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(finals.head, finals.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Salted count per key (the common hot-key case). */
  def saltedCount(df: DataFrame, key: Column, spread: Column, buckets: Int): DataFrame =
    saltedAgg(df, key, spread, buckets)(
      Seq(count(lit(1)).as("partial_cnt")),
      Seq(sum(col("partial_cnt")).as("cnt")))

  /** Salted exact sum per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, spread: Column,
      buckets: Int): DataFrame =
    saltedAgg(df.withColumn("__v", value), key, spread, buckets)(
      Seq(sum(col("__v")).as("partial_sum")),
      Seq(sum(col("partial_sum")).as("sum")))

  /** Salted equi-join for a hot-keyed fact side: the fact rows spread
    * over `buckets` sub-partitions via a retry-stable CONTENT salt
    * ([[saltFromContent]] over `spread` — never the monotonic fallback,
    * per its caveat), the dimension side replicates `buckets`× with
    * `explode(sequence(...))`, and the join runs on (key, salt) — one
    * hot key's probe work lands on `buckets` reducers instead of one.
    * Exact for any equi-join: every fact row still meets every matching
    * dim row exactly once (in its own bucket), so the result multiset is
    * identical to the unsalted join — which is what the gate query's
    * plain-join oracle hash-checks.
    *
    * This is the MANUAL form of what AQE's skew-join split does at
    * runtime; it stays in the library for the residual cases AQE cannot
    * see (skew behind a cache/checkpoint boundary, non-AQE sessions,
    * deterministic pre-planned bucketing). Dim-side cost is
    * `buckets × |dim|` — use for genuinely small dimensions, or feed a
    * pre-filtered hot-key subset (the classic split: salted join for the
    * hot keys, plain join for the cold tail).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, spread: Seq[Column]): DataFrame = {
    val salted = fact.withColumn("__salt",
      saltFromContent(buckets, spread: _*))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
