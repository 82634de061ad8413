package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-side form of `ops/Dedup.exact`: drop
  * repeats of a content fingerprint as documents arrive, keeping state only
  * for the watermark horizon.
  *
  * Built on `dropDuplicatesWithinWatermark`: unlike plain
  * `dropDuplicates`, whose key state grows with every distinct key ever
  * seen (unbounded on a 100 TB ingest), the within-watermark variant evicts
  * a key's state once the watermark passes its last sighting — state is
  * bounded by (arrival rate × watermark horizon), the only shape that
  * survives an unbounded corpus ingest. The trade: duplicates separated by
  * more than the horizon pass through (handled by the batch dedup
  * downstream — this stage exists to keep near-in-time repeats, crawler
  * retries and the like, out of the pipeline).
  */
object StreamingDedup {

  /** Dedup a watermarked document stream by normalized-content fingerprint.
    * Input needs `text` and an event-time column `tsCol`; emits the first
    * arrival per fingerprint within the horizon, fingerprint attached.
    */
  def byFingerprint(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.ops.TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
