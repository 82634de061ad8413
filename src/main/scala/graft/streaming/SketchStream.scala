package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming heavy-hitters screen — the in-flight twin of
  * `TextJobs.heavyHitters`' count-min sketch: maintain the token-frequency
  * CMS incrementally over the ingest stream, so the pipeline can screen
  * arrivals against corpus-frequency estimates without a batch recount.
  *
  * Scale shape: tokens shard by hash into `shards` keys, and each shard
  * maintains its OWN sketch in `transformWithState` ValueState — the
  * stream never funnels through one task, and per-shard state is a fixed
  * ~`depth·width` counter array regardless of stream length. CMS counters
  * are commutative sums, so sketches with the same (eps, confidence,
  * seed) merge cell-wise in any order: the cross-shard [[merge]] is
  * BIT-EQUAL to the batch `count_min_sketch` aggregate over the same
  * tokens (spec-pinned, the strongest streaming-correctness gate
  * available to an estimate — same discipline as the batch oracle, which
  * gates the contract because merge-order-insensitive counter sums are
  * deterministic while HLL-style estimates are not).
  *
  * Reference anchor: the per-key incremental-aggregate shape of
  * `flink-uba`'s windowed counts (CountAgg, hotitem/HotItem.java:60) applied to
  * a sketch accumulator instead of a scalar.
  */
object SketchStream {

  final case class TokenArrival(shard: Int, token: String)

  /** One shard's sketch after a micro-batch: emitted in update mode, so
    * the latest row per shard IS the shard's current sketch.
    */
  final case class ShardSketch(shard: Int, sketch: Array[Byte])

  /** Explode a document frame (streaming or batch) into sharded token
    * arrivals with the SAME tokenizer as the batch heavy-hitters path.
    */
  def tokenArrivals(docs: DataFrame, shards: Int): Dataset[TokenArrival] = {
    import docs.sparkSession.implicits._
    docs
      .select(explode(graft.ops.TextAnalysis.tokens(lower(col("text"))))
        .as("token"))
      .select(pmod(xxhash64(col("token")), lit(shards.toLong)).cast("int")
        .as("shard"), col("token"))
      .as[TokenArrival]
  }

  /** Maintain per-shard sketches over a token-arrival stream. Update-mode
    * output: each micro-batch emits the new sketch of every shard that
    * received tokens.
    */
  def tokenSketch(arrivals: Dataset[TokenArrival],
      eps: Double, confidence: Double, seed: Int): Dataset[ShardSketch] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.shard)
      .transformWithState(new CmsProcessor(eps, confidence, seed),
        TimeMode.None(), OutputMode.Update())
  }

  /** Cell-wise merge of shard sketches (any order — counter sums are
    * commutative). Returns None for an empty collection.
    */
  def merge(sketches: Iterable[Array[Byte]]): Option[CountMinSketch] =
    sketches.foldLeft(Option.empty[CountMinSketch]) { (acc, bytes) =>
      val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      acc match {
        case None => Some(s)
        case Some(m) => Some(m.mergeInPlace(s))
      }
    }

  /** Estimated count of `token` under a merged sketch — probing with the
    * UTF-8 bytes exactly as Spark's `count_min_sketch` aggregate adds
    * strings, so estimates equal the batch sketch's.
    */
  def estimate(cms: CountMinSketch, token: String): Long =
    cms.estimateCount(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  class CmsProcessor(eps: Double, confidence: Double, seed: Int)
      extends StatefulProcessor[Int, TokenArrival, ShardSketch] {

    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("cms",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(
        key: Int,
        rows: Iterator[TokenArrival],
        timerValues: TimerValues): Iterator[ShardSketch] = {
      val cms =
        if (state.exists())
          CountMinSketch.readFrom(new ByteArrayInputStream(state.get()))
        else CountMinSketch.create(eps, confidence, seed)
      // addBinary(UTF-8): the same byte path CountMinSketchAgg uses for
      // StringType, so stream and batch sketches hash identically
      rows.foreach { r =>
        cms.addBinary(
          r.token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val bos = new ByteArrayOutputStream()
      cms.writeTo(bos)
      val bytes = bos.toByteArray
      state.update(bytes)
      Iterator.single(ShardSketch(key, bytes))
    }

    override def handleExpiredTimer(
        key: Int,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ShardSketch] =
      Iterator.empty
  }
}
