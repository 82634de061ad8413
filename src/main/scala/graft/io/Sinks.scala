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

  /** K2, true retractions: emulate a Flink retract stream
    * (`HotItemWithSql.java:77`'s `toRetractStream` print) over an
    * UPDATE-mode result. Spark re-emits changed rows but never retracts
    * the stale ones; this `foreachBatch` body closes that gap by diffing
    * each batch against the previously-emitted result table: a changed
    * key emits `(false, oldRow)` then `(true, newRow)` — exactly the
    * Flink changelog a user diffing console output expects — and a new
    * key emits `(true, row)` alone.
    *
    * The previous-result snapshot lives driver-side, which is correct
    * here by construction: retract streams decorate RESULT tables (top-N
    * per window, windowed counts) that are orders of magnitude smaller
    * than the input — the same boundedness argument as Flink's own
    * retract-stream materialization. Not for corpus-sized results.
    *
    * SCALAR COLUMNS ONLY: the `old == row` re-emit suppression relies on
    * `Row` equality, which compares array/binary-typed columns by
    * reference in some Row implementations — a result table carrying an
    * array column could emit spurious retract/add pairs for unchanged
    * rows. All current call sites carry scalars; normalize (e.g.
    * stringify) array columns before wiring them through a retract sink.
    */
  def retractBatches(keyCols: Seq[String])(emit: (Boolean, Row) => Unit)
      : (DataFrame, Long) => Unit = {
    val prev = scala.collection.mutable.HashMap.empty[Seq[Any], Row]
    (batch: DataFrame, _: Long) => {
      batch.collect().foreach { row =>
        val k = keyCols.map(c => row.getAs[Any](c))
        prev.get(k) match {
          case Some(old) if old == row => () // update mode may re-emit equal rows
          case Some(old) =>
            emit(false, old); emit(true, row); prev(k) = row
          case None =>
            emit(true, row); prev(k) = row
        }
      }
    }
  }

  /** K2 retract console: [[retractBatches]] wired to the Flink-style
    * `(true/false, row)` print.
    */
  def retractConsole(df: DataFrame, keyCols: Seq[String]): DataStreamWriter[Row] =
    df.writeStream.outputMode("update").foreachBatch(
      retractBatches(keyCols) { (add, row) => println(s"($add,$row)") })

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
