package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Sinks (SURVEY.md §2.2 K1–K3).
  *
  * K1: console print — batch `show`, streaming console format.
  * K2: retract-style output — update/complete mode console.
  * K3: side outputs — Spark has no OutputTag; the pattern is a `tag` column
  * on a single stream split into per-tag destinations, either as filtered
  * writers (two queries, source-shared) or one `foreachBatch` fanning out
  * to N sinks without re-reading the source.
  */
object Sinks {

  /** K1 batch. */
  def printSink(df: DataFrame, label: String, numRows: Int = 20): Unit = {
    println(s"== $label ==")
    df.show(numRows, truncate = false)
  }

  /** K1/K2 streaming: console writer in the given output mode. */
  def consoleStream(df: DataFrame, mode: String): DataStreamWriter[Row] =
    df.writeStream.outputMode(mode).format("console")
      .option("truncate", value = false)

  /** K3 batch: split one tagged frame into per-tag frames. */
  def splitByTag(df: DataFrame, tagCol: String, tags: Seq[String])
      : Map[String, DataFrame] =
    tags.map(t => t -> df.filter(col(tagCol) === t)).toMap

  /** K3 streaming: one foreachBatch writing every tag to its own handler —
    * a single pass over each micro-batch (`persist` so N filters don't
    * recompute the stateful lineage N times).
    */
  def foreachBatchSplit(
      df: DataFrame, tagCol: String,
      handlers: Map[String, DataFrame => Unit]): DataStreamWriter[Row] =
    df.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        batch.persist()
        try handlers.foreach { case (tag, h) =>
          h(batch.filter(col(tagCol) === tag))
        }
        finally batch.unpersist()
    }

  /** Curated-corpus landing layout: hive-partitioned parquet on the
    * curation keys (lang/split/source-class …). The complement of
    * [[Bucketing]]: bucketing pre-shuffles for exchange-free JOINS on a
    * high-cardinality key; directory partitioning prunes whole files for
    * FILTERS on low-cardinality keys — a `split='train' AND lang='en'`
    * read touches only that directory subtree (PartitionFilters in the
    * scan, asserted by SinksSpec). Caller picks keys whose cardinality
    * product stays in the thousands — partitioning on a high-cardinality
    * key produces a small-file explosion, which is what bucketing is for.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
