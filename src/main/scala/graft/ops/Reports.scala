package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P5: result formatting — the reference renders each fired window as a
  * multi-line report with a `java.sql.Timestamp` header and "NO x: item=…
  * count=…" lines (`HotItem.java:148-159`, `HotItems.scala:141-152`).
  *
  * Spark-first: the report is a column expression (`format_string` +
  * `date_format` + window aggregation of the ranked rows) — rendering
  * happens distributed at the sink, not on the driver.
  */
object Reports {

  /** One formatted line per ranked row. */
  def rankedLine(rank: Column, key: Column, cnt: Column, keyLabel: String): Column =
    format_string(s"NO %d: $keyLabel=%s count=%d", rank, key, cnt)

  /** Collapse ranked rows into one report string per window (the
    * reference's StringBuilder block, including the separator rule).
    */
  def windowReport(ranked: DataFrame, keyLabel: String): DataFrame =
    ranked
      .withColumn("line",
        rankedLine(col("rn"), col(ranked.columns.filter(c =>
          c != "window_end" && c != "cnt" && c != "rn").head), col("cnt"), keyLabel))
      .groupBy(col("window_end"))
      .agg(sort_array(collect_list(struct(col("rn"), col("line")))).as("ls"))
      .select(col("window_end"),
        concat(
          lit("==================================\n"),
          format_string("window end: %s\n",
            date_format(timestamp_seconds(col("window_end")), "yyyy-MM-dd HH:mm:ss.S")),
          concat_ws("\n", transform(col("ls"), x => x.getField("line"))),
          lit("\n==================================")).as("report"))
}
