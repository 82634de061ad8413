package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2: stream-stream interval equi-join
  * (reference `TxPayMatchByJoin.java:60-64`: `intervalJoin(...)
  * .between(-3 s, +5 s)` on txId).
  *
  * Spark plans this as StreamingSymmetricHashJoinExec: both sides hash-
  * exchange on the key, each arrival probes the other side's buffered
  * state within the interval, and the range bounds + watermarks derive the
  * state-cleanup watermark — exactly Flink's interval-join buffering
  * (SURVEY.md §3.3). The same call works unchanged on batch frames (it
  * becomes a sort-merge join with range residual), which is how the DuckDB
  * oracle checks it.
  */
object StreamingJoins {

  /** `right.ts ∈ [left.ts + lowerSec, left.ts + upperSec]`, equi-key join.
    * Column names: left must expose `ts`; pass disambiguated frames.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      delay: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS"),
      "inner")
  }
}
