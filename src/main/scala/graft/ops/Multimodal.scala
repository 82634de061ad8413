package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-preserving
  * `mapPartitions` (the Scala analog of Python's `mapInPandas` batch UDFs:
  * same iterator-of-batches contract, same narrow-stage placement), batch
  * shape. The codec itself is STUBBED with a deterministic fake (this
  * container has no image/audio libs): `decodeStub` derives "pixels" from
  * the payload bytes. Swap `decodeStub` for a real decoder
  * (JNI/ffmpeg/ImageIO) without touching any plumbing.
  *
  * Scale notes: payloads never pass through a shuffle — every stage is a
  * narrow `mapPartitions` over the scan, so a 100 TB binary corpus streams
  * partition-by-partition with no exchange; only small feature rows ever
  * aggregate. Batch size per task = parquet row-group, controlled by
  * `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** A binary asset row: payload + the typed metadata a real pipeline
    * carries (media kind, declared dimensions, sample rate...).
    */
  final case class Asset(
      asset_id: Long,
      content: Array[Byte],
      kind: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      n_frames: Int)

  final case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      mean_byte: Double,
      frames_sampled: Int,
      feature: Array[Double])

  /** Wrap `documents` as fake binary assets (UTF-8 payload + metadata
    * derived from doc_id) — the stand-in corpus for the binary pipeline.
    */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        col("text").cast("binary").as("content"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
        (lit(64) + expr("(doc_id div 8) % 8") * 32).cast("int").as("height"),
        (lit(1) + col("doc_id") % 30).cast("int").as("n_frames"))
      .as[Asset]
  }

  /** STUB decoder — deterministic fake: "pixels" are the payload bytes.
    * Real implementation would decode image/audio here.
    */
  private def decodeStub(a: Asset): Array[Byte] = a.content

  /** Deterministic frame sampling: every ceil(n/target)-th frame index. */
  def sampleFrameIndices(nFrames: Int, target: Int): Seq[Int] = {
    val step = math.max(1, math.ceil(nFrames.toDouble / target).toInt)
    (0 until nFrames by step).take(target)
  }

  /** Engine-portable ratio rounding: the same `ROUND(x + 1e-9, 4)` nudge the
    * column-expression ops use, restated for the typed path.
    */
  private def r4(x: Double): Double =
    math.floor((x + 1e-9) * 1e4 + 0.5) / 1e4

  /** Feature extraction: decode → per-stripe byte means (a fake embedding
    * with the exact shape/partitioning a real extractor would have).
    */
  def extractFeatures(assets: Dataset[Asset], stripes: Int, frameTarget: Int)
      : Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val px = decodeStub(a)
        val n = px.length
        val stripeMeans = Array.tabulate(stripes) { s =>
          val lo = n.toLong * s / stripes
          val hi = n.toLong * (s + 1) / stripes
          if (hi == lo) 0.0
          else {
            var i = lo.toInt; var acc = 0L
            while (i < hi) { acc += px(i) & 0xff; i += 1 }
            acc.toDouble / (hi - lo)
          }
        }
        val mean = if (n == 0) 0.0 else stripeMeans.sum / stripes
        AssetFeatures(a.asset_id, n.toLong,
          r4(mean),
          sampleFrameIndices(a.n_frames, frameTarget).length,
          stripeMeans.map(r4))
      }
    }
  }

  /** "Resize": proportional metadata update + payload truncation stub —
    * demonstrates a payload-transforming narrow stage.
    */
  def resize(assets: Dataset[Asset], maxSide: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val scale = math.min(1.0, maxSide.toDouble / math.max(a.width, a.height))
        val w = math.max(1, (a.width * scale).toInt)
        val h = math.max(1, (a.height * scale).toInt)
        val keep = math.max(1, (a.content.length * scale * scale).toInt)
        a.copy(width = w, height = h,
          content = a.content.take(keep))
      }
    }
  }
}
