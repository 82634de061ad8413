package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffled storage so repeated joins and
  * aggregations on the bucket key run with NO exchange at read time.
  *
  * At 100 TB this is the difference between shuffling the fact table once
  * per query and never: land `lineitem`/`orders` bucketed by orderkey
  * (same bucket count both sides) and every orderkey equi-join becomes a
  * zip of co-located buckets; Spark plans SortMergeJoin with zero
  * `Exchange` (asserted by BucketingSpec). Bucket count sizes the
  * parallelism floor — pick ≈ cluster cores at the target SF.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and optionally sorted) catalog table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortInBucket: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sortInBucket) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two tables bucketed on their join keys — exchange-free when both
    * sides used the same bucket count.
    */
  def bucketJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
