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
}
