package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed top-N ranking — SURVEY.md §2.9 X1/X2, §2.12 O1–O3.
  *
  * Reference: `TopNHotItems` buffers a window's rows in `ListState`, fires an
  * event-time timer at windowEnd+1, sorts and takes 5
  * (`HotItem.java:110-166`, `HotItems.scala:110-157`). Spark-first: the
  * declarative `row_number() OVER (PARTITION BY window_end ORDER BY cnt
  * DESC)` — exactly the reference's own SQL variant
  * (`HotItemWithSql.java:57-59`).
  *
  * Scale: rank is computed after pre-aggregation, so the ranking shuffle
  * moves one row per (key, window) — not raw events. Partitioning by
  * window_end distributes across windows; no global sort. Ties are broken by
  * the candidate key for deterministic output (the reference's sort is
  * unstable on ties — we pin it down for reproducibility).
  */
object TopN {

  /** Keep the top `n` rows per partition of `part`, ordered by `order`
    * descending with `tieBreak` ascending. Adds a `rn` Long column.
    */
  def topNPer(df: DataFrame, part: Column, order: Column, tieBreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(part).orderBy(order.desc, tieBreak.asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }
}
