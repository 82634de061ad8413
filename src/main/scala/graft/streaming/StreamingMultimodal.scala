package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** Streaming perceptual-dedup screen — the IMAGE sibling of
  * [[StreamingDedup.screenAgainstCorpus]] (text minhash) and
  * [[StreamingSimilarity.adcScreenFromIndex]] (embeddings), completing
  * the in-flight ingest story for the third modality: each ARRIVING
  * image is decoded and dHashed in-flight, then Hamming-banded against
  * the PERSISTED corpus fingerprint table, so a near-duplicate of an
  * image already in the corpus is flagged at ingest.
  *
  * Scale shape: decode + dHash is a stateless typed `mapPartitions` over
  * the stream (the batch [[Multimodal.extractFeatures]] discipline —
  * payloads never shuffle; per-arrival cost is one codec decode + a
  * 63-sample grid walk). The candidate join is a stream-static equi-join
  * on the (band, band-value) int pair against the banded corpus
  * fingerprints — 4 rows per corpus image, never stream × corpus — with
  * the same in-row FIRST-SHARED-BAND rule as the batch
  * [[Dedup.hammingPairs]], so each (arrival, corpus) candidate
  * materializes exactly once and the whole query is append-mode
  * stateless (no aggregation, no dedup state).
  */
object StreamingMultimodal {

  /** The static side of the screen: the persisted (doc_id, fp)
    * fingerprint table exploded to its 4 band rows
    * (b, bv, corpus_fp, corpus_id). In production this is yesterday's
    * landed index; re-planned per micro-batch like any stream-static
    * join side.
    */
  def bandedCorpus(fp: DataFrame, bands: Seq[(Int, Int)]): DataFrame =
    fp.select(col("fp").as("corpus_fp"), col("doc_id").as("corpus_id"))
      .select(col("corpus_fp"), col("corpus_id"),
        posexplode(array(bands.map(b => Dedup.bandVal(col("corpus_fp"), b)): _*))
          .as(Seq("b", "bv")))

  /** Screen a watermarked image-asset stream against the corpus
    * fingerprints. Input needs (asset_id, content: binary PNG, width,
    * height, `tsCol`); emits (asset_id, ts, corpus_id, hamming) for
    * every corpus image within `maxHamming` of the arrival (self-id
    * matches excluded — re-ingesting the same id is not a dup of the
    * corpus). Non-colliding arrivals pass silently.
    */
  def screenImages(
      stream: DataFrame, tsCol: String, delay: String,
      corpusFp: DataFrame, bands: Seq[(Int, Int)], maxHamming: Int): DataFrame = {
    require(bands.size > maxHamming,
      s"pigeonhole needs more bands (${bands.size}) than maxHamming=$maxHamming")
    val spark = stream.sparkSession
    import spark.implicits._
    val fps = stream
      .withWatermark(tsCol, delay)
      .select(col("asset_id"), col("content"), col("width"), col("height"),
        col(tsCol).as("ts"))
      .as[(Long, Array[Byte], Int, Int, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.map { case (id, png, w, h, ts) =>
          val px = Multimodal.decode(
            Multimodal.Asset(id, png, "image", w, h, 1))
          (id, Multimodal.dHash63(px, w, h), ts)
        }
      }.toDF("asset_id", "fp", "ts")
    val arrBands = fps.select(col("asset_id"), col("fp"), col("ts"),
      posexplode(array(bands.map(b => Dedup.bandVal(col("fp"), b)): _*))
        .as(Seq("b", "bv")))
    // first-shared-band: candidates joined on band b survive only if
    // every band BEFORE b differs — computable in-row from the two
    // fingerprints, so each pair materializes exactly once
    val earlierBandsDiffer = bands.zipWithIndex.map { case (bd, j) =>
      (lit(j) >= col("b")) ||
        (Dedup.bandVal(col("fp"), bd) =!= Dedup.bandVal(col("corpus_fp"), bd))
    }.reduce(_ && _)
    arrBands.join(bandedCorpus(corpusFp, bands), Seq("b", "bv"))
      .filter(col("asset_id") =!= col("corpus_id"))
      .filter(earlierBandsDiffer)
      .select(col("asset_id"), col("ts"), col("corpus_id"),
        bit_count(col("fp").bitwiseXOR(col("corpus_fp"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The AUDIO sibling of [[screenImages]]: each arriving clip is decoded
    * (`javax.sound`) and fingerprinted ([[Multimodal.audioFp63]])
    * in-flight, then Hamming-banded against the persisted corpus
    * fingerprint table — identical join machinery, different decode +
    * hash, which is the point of the fingerprint abstraction. Input needs
    * (asset_id, content: binary WAV, `tsCol`); output shape and the
    * first-shared-band multiplicity-1 contract as in [[screenImages]].
    */
  def screenAudio(
      stream: DataFrame, tsCol: String, delay: String,
      corpusFp: DataFrame, bands: Seq[(Int, Int)], maxHamming: Int): DataFrame = {
    require(bands.size > maxHamming,
      s"pigeonhole needs more bands (${bands.size}) than maxHamming=$maxHamming")
    val spark = stream.sparkSession
    import spark.implicits._
    val fps = stream
      .withWatermark(tsCol, delay)
      .select(col("asset_id"), col("content"), col(tsCol).as("ts"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions { it =>
        it.map { case (id, wav, ts) =>
          val samples = Multimodal.decode(
            Multimodal.Asset(id, wav, "audio", 0, 0, 1))
          (id, Multimodal.audioFp63(samples), ts)
        }
      }.toDF("asset_id", "fp", "ts")
    val arrBands = fps.select(col("asset_id"), col("fp"), col("ts"),
      posexplode(array(bands.map(b => Dedup.bandVal(col("fp"), b)): _*))
        .as(Seq("b", "bv")))
    val earlierBandsDiffer = bands.zipWithIndex.map { case (bd, j) =>
      (lit(j) >= col("b")) ||
        (Dedup.bandVal(col("fp"), bd) =!= Dedup.bandVal(col("corpus_fp"), bd))
    }.reduce(_ && _)
    arrBands.join(bandedCorpus(corpusFp, bands), Seq("b", "bv"))
      .filter(col("asset_id") =!= col("corpus_id"))
      .filter(earlierBandsDiffer)
      .select(col("asset_id"), col("ts"), col("corpus_id"),
        bit_count(col("fp").bitwiseXOR(col("corpus_fp"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
