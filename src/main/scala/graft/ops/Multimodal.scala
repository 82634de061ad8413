package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-preserving
  * `mapPartitions` (the Scala analog of Python's `mapInPandas` batch UDFs:
  * same iterator-of-batches contract, same narrow-stage placement), batch
  * shape. The IMAGE and AUDIO codecs are real: PNG payloads decode through
  * `javax.imageio` to row-major grayscale pixels, WAV payloads through
  * `javax.sound.sampled` to unsigned 8-bit PCM samples (both JDK-shipped,
  * zero new dependencies). COMPRESSED video remains STUBBED with a
  * deterministic fake (no JDK video codec exists): `decodeStub` derives
  * "frames" from the payload bytes — swap it for a real decoder
  * (JNI/ffmpeg) without touching any plumbing. The frame-level video
  * pipeline itself runs for real on the RAWV raw-frame container
  * ([[encodeRawv]]/[[decodeRawv]]): byte-level parse → typed frames →
  * per-frame fingerprints, all codec-independent.
  *
  * Scale notes: payloads never pass through a shuffle — every stage is a
  * narrow `mapPartitions` over the scan, so a 100 TB binary corpus streams
  * partition-by-partition with no exchange; only small feature rows ever
  * aggregate. Batch size per task = parquet row-group, controlled by
  * `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  // `ImageIO.read(InputStream)`/`write(..., OutputStream)` wrap their
  // stream in a FileCache image stream by default: every tiny PNG
  // encode/decode creates and deletes a TEMP FILE on disk. Measured
  // (ProfileR16 micro, 5000 fixture tiles, 1 thread): encode 0.91 →
  // 0.30 s, decode 0.52 → 0.08 s with the memory-cached streams — and
  // under 32 concurrent tasks the temp-file churn also serializes on the
  // filesystem, so the parallel decode stage was SLOWER than one thread.
  // Process-global, set once per JVM at class load (executors load this
  // object before any codec call); output bytes are identical — only the
  // stream's backing buffer changes.
  javax.imageio.ImageIO.setUseCache(false)

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
    * Stands in for audio/video (no codec libs in this container).
    */
  private def decodeStub(a: Asset): Array[Byte] = a.content

  /** The id frame feeding the IMAGE payload-synthesis `mapPartitions`,
    * spread over the session's full parallelism. The fixture's documents
    * table is one parquet split at bench SFs, so without this the
    * PNG synth+decode pass ran in ONE task (measured: the 32-core image
    * fingerprint stage was SLOWER than a single driver thread). The
    * shuffle moves 8-byte ids — the round-8 "decide with small rows, move
    * big rows once" shape: ids are the small rows, and the heavy payload
    * bytes are BORN downstream of the exchange, so they still never cross
    * a shuffle. Partition count follows `defaultParallelism`
    * (cluster-derived, not a constant), so the driver's lower-core bench
    * run scales the same way.
    *
    * IMAGE ONLY, by measurement: PNG encode+decode through
    * `javax.imageio` is expensive enough per row (~75 µs even
    * memory-cached) to amortize the exchange; the WAV and RAWV synth
    * paths are not — parallelizing them REGRESSED every audio/video query
    * 1.5-2× in the registry bench (`javax.sound`'s per-call provider
    * lookups contend across 32 tasks, and the extra 32-task stages tax
    * every downstream job), so [[serialIds]] keeps those on the scan's
    * own partitioning.
    */
  private def idRows(docs: DataFrame): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** The id frame on the scan's own partitioning — see [[idRows]]. */
  private def serialIds(docs: DataFrame): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
  }

  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
      bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)

  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Dispatching decoder: image payloads that really are PNGs go through
    * `javax.imageio`, audio payloads that really are WAVs go through
    * `javax.sound.sampled` (both in the JDK — no new dependency), yielding
    * row-major grayscale pixels / unsigned 8-bit PCM samples; video (no
    * JDK codec exists) and unrecognized payloads fall back to the stub.
    * Both real paths are oracle-enforced: a broken decoder fails the
    * `multimodal_features` hash gate, because it recomputes the expected
    * pixels/samples of the synthesized payloads arithmetically (PNG and
    * PCM are lossless, so decode(encode(g)) = g).
    */
  private[graft] def decode(a: Asset): Array[Byte] =
    if (a.kind == "audio" && isWav(a.content)) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.content))
      try in.readAllBytes() finally in.close()
    } else if (a.kind == "image" && isPng(a.content)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.content))
      val w = img.getWidth; val h = img.getHeight
      // downstream pixel consumers (dHash63, stripe features) index the
      // buffer with the DECLARED asset dims — a payload whose real raster
      // disagrees would silently fingerprint garbage or throw AIOOBE
      // mid-hash, so refuse it here where both sets of dims are in hand
      if (w != a.width || h != a.height)
        throw new IllegalStateException(
          s"asset ${a.asset_id}: decoded PNG raster ${w}x$h disagrees " +
            s"with declared metadata ${a.width}x${a.height}")
      val raster = img.getRaster
      val out = new Array[Byte](w * h)
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(i) = raster.getSample(x, y, 0).toByte; i += 1; x += 1 }
        y += 1
      }
      out
    } else decodeStub(a)

  /** Deterministic grayscale test-pattern value for pixel (x, y) of the
    * asset `id` — shared by the PNG synthesizer AND the DuckDB oracle
    * restatement (the `g(doc,x,y)` both sides must agree on).
    */
  def pixelValue(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt

  /** Encode a real PNG via `javax.imageio` with pixel (x,y) = gray(x,y). */
  def encodePng(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** True decoded dimensions of the synthesized PNG for `id` — tiny tiles
    * (≤ 12×9) so per-row encode cost stays negligible at bench SFs while
    * the decode contract is exercised on real bytes.
    */
  def pngDims(id: Long): (Int, Int) =
    ((8 + id % 5).toInt, (6 + id % 4).toInt)

  /** Encode a real single-channel 8-bit-PCM WAV via `javax.sound.sampled`
    * with sample i = gray(i) (unsigned). PCM is uncompressed, so the
    * decode side recovers the samples bit-exactly.
    */
  def encodeWav(n: Int, sample: Int => Int): Array[Byte] = {
    val pcm = Array.tabulate(n)(i => (sample(i) & 0xff).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded sample count of the synthesized WAV for `id` — small clips
    * (48–103 samples), the audio sibling of [[pngDims]].
    */
  def wavSamples(id: Long): Int = (48 + id % 56).toInt

  /** Audio-kind assets with REAL payloads: each row carries an actual WAV
    * of the deterministic [[pixelValue]] pattern (sample i =
    * pixelValue(id, i, 0)); the audio sibling of [[imageAssets]].
    */
  def audioAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    serialIds(docs).mapPartitions { it =>
      it.map { id =>
        val n = wavSamples(id)
        Asset(id, encodeWav(n, i => pixelValue(id, i, 0)),
          "audio", 0, 0, (1 + id % 30).toInt)
      }
    }
  }

  /** Image-kind assets with REAL payloads: each row carries an actual PNG
    * of the deterministic [[pixelValue]] pattern, with width/height set to
    * the true decoded dimensions. `docs` needs only `doc_id`; frame
    * metadata keeps the fixture's 1 + id % 30 formula so feature rows stay
    * comparable with the opaque fixture's.
    */
  def imageAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    idRows(docs).mapPartitions { it =>
      it.map { id =>
        val (w, h) = pngDims(id)
        Asset(id, encodePng(w, h, (x, y) => pixelValue(id, x, y)),
          "image", w, h, (1 + id % 30).toInt)
      }
    }
  }

  // ---- perceptual image near-dup: planted fixture + dHash ----

  /** Consecutive ids share one base pattern: the planted near-dup group. */
  val NeardupGroup = 8
  private val MixMod = 2147483647L

  def neardupBase(id: Long): Long = id / NeardupGroup

  /** Near-dup tile dims come from the BASE (group members must share
    * dims): 16–20 × 12–15 — big enough that the 9×8 dHash grid samples
    * distinct pixels.
    */
  def neardupDims(base: Long): (Int, Int) =
    ((16 + base % 5).toInt, (12 + base % 4).toInt)

  /** Pixel (x, y) of near-dup image `id`: an avalanche-mixed base pattern
    * plus a tiny per-id perturbation. The mix is two multiplicative steps
    * mod 2^31−1 separated by xor-shifts — the xor between multiplies is
    * what buys decorrelation (two pure Lehmer steps compose to ONE affine
    * map, which left this corpus with 123 distinct fingerprints and a
    * quadratic near-pair blowup; the round-5 planeWeight lesson). Every
    * step stays below 2^47, so DuckDB BIGINT arithmetic reproduces it
    * exactly — no wrapping 64-bit multiply anywhere.
    *
    * Perturbation: +1 on the ~(id%8)/37 of pixels where
    * (7x+y) % 37 < id % 8 — group members come out at Hamming 0–3 of each
    * other, different bases land ~31 bits apart (measured: zero
    * cross-base pairs within Hamming 3 on 5000 docs).
    */
  def neardupPixel(id: Long, x: Int, y: Int): Int = {
    var h = (neardupBase(id) * 2654435761L + x * 40503L + y * 104729L) % MixMod
    h = h ^ (h >> 15)
    h = (h * 48271L) % MixMod
    h = h ^ (h >> 13)
    h = (h * 16807L) % MixMod
    val delta = if ((x * 7 + y) % 37 < (id % NeardupGroup)) 1 else 0
    ((h % 256).toInt + delta) % 256
  }

  /** Image assets for the near-dup gate: REAL PNGs of the planted
    * pattern, decoded back through `javax.imageio` before hashing — the
    * perceptual-hash path runs on actual codec output, and the oracle
    * recomputes the expected pixels arithmetically (PNG is lossless).
    */
  def neardupImageAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    idRows(docs).mapPartitions { it =>
      it.map { id =>
        val (w, h) = neardupDims(neardupBase(id))
        Asset(id, encodePng(w, h, (x, y) => neardupPixel(id, x, y)),
          "image", w, h, 1)
      }
    }
  }

  /** 63-bit difference hash over row-major grayscale pixels: sample a
    * 9-column × 8-row grid at floor-scaled coordinates, set bit
    * (gr·8+gc) iff the right sample exceeds the left. NEAREST-SAMPLE
    * (not area-average resize) so the hash is integer-exact and a SQL
    * oracle can restate it; bit 63 (gr=7, gc=7) is SKIPPED so the
    * fingerprint packs into a non-negative BIGINT in both engines (a
    * 64th bit would need the sign bit here and overflow DuckDB's
    * `1::BIGINT << 63`).
    */
  def dHash63(px: Array[Byte], w: Int, h: Int): Long = {
    var fp = 0L
    var gr = 0
    while (gr < 8) {
      val y = gr * h / 8
      var gc = 0
      while (gc < 8) {
        if (!(gr == 7 && gc == 7)) {
          val x0 = gc * w / 9
          val x1 = (gc + 1) * w / 9
          val l = px(y * w + x0) & 0xff
          val r = px(y * w + x1) & 0xff
          if (r > l) fp |= 1L << (gr * 8 + gc)
        }
        gc += 1
      }
      gr += 1
    }
    fp
  }

  /** (doc_id, fp): decode the real PNG payloads, dHash the pixels. */
  def imageFingerprints(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    neardupImageAssets(spark, docs).mapPartitions { it =>
      it.map(a => (a.asset_id, dHash63(decode(a), a.width, a.height)))
    }.toDF("doc_id", "fp")
  }

  /** (doc_id, width, height, n_pixels, fp) in ONE decode pass — the
    * curation composition's scan: n_pixels is the DECODED buffer length
    * (not declared metadata), so the hash gate re-verifies the codec
    * round-trip alongside the fingerprint.
    */
  def imageScan(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    neardupImageAssets(spark, docs).mapPartitions { it =>
      it.map { a =>
        val px = decode(a)
        (a.asset_id, a.width.toLong, a.height.toLong, px.length.toLong,
          dHash63(px, a.width, a.height))
      }
    }.toDF("doc_id", "width", "height", "n_pixels", "fp")
  }

  // ---- perceptual audio near-dup: planted waveform + energy-diff hash ----

  /** Frames of the audio fingerprint: 64 frame-energy sums → 63
    * adjacent-comparison bits, the temporal analogue of [[dHash63]]'s
    * spatial grid (Haitsma–Kalker's energy-difference fingerprint shape
    * with the FFT band energies replaced by time-frame energies — integer
    * sums of decoded PCM bytes, so a SQL oracle restates it exactly; a
    * float spectrum could not hash-match across engines).
    */
  val AudioFrames = 64

  /** Decoded sample count of near-dup clip `id` — from the BASE (group
    * members must share length, or frame boundaries would decorrelate
    * them): 192–255 samples, ≥3 per frame so every frame sum is
    * non-degenerate.
    */
  def audioNeardupSamples(base: Long): Int = (192 + base % 64).toInt

  /** Sample i of near-dup clip `id`: the SAME avalanche mix as
    * [[neardupPixel]] (xor-shifts between multiplies mod 2^31−1 — two
    * pure Lehmer steps compose to one affine map and correlate the
    * waveform, the round-5/round-8 lesson; every intermediate < 2^47 so
    * DuckDB BIGINT reproduces it) over (base, i), plus the sparse per-id
    * +1 perturbation. Probed on 5000 docs before wiring (the round-8
    * rule): 734 distinct fingerprints, within-group Hamming 0–3 (12
    * pairs at 4 — excluded identically by both engines), zero cross-base
    * pairs within Hamming 3 (minimum observed 11), 469 banded candidate
    * pairs over distinct fingerprints.
    */
  def audioNeardupSample(id: Long, i: Int): Int = {
    var h = (neardupBase(id) * 2654435761L + i * 40503L) % MixMod
    h = h ^ (h >> 15)
    h = (h * 48271L) % MixMod
    h = h ^ (h >> 13)
    val delta = if ((i * 7) % 37 < (id % NeardupGroup)) 1 else 0
    ((((h * 16807L) % MixMod) % 256).toInt + delta) % 256
  }

  /** Audio assets for the near-dup gate: REAL WAVs of the planted
    * waveform, decoded back through `javax.sound.sampled` before hashing
    * — the fingerprint path runs on actual codec output, and the oracle
    * recomputes the expected samples arithmetically (PCM is lossless).
    */
  def neardupAudioAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    serialIds(docs).mapPartitions { it =>
      it.map { id =>
        val n = audioNeardupSamples(neardupBase(id))
        Asset(id, encodeWav(n, i => audioNeardupSample(id, i)),
          "audio", 0, 0, 1)
      }
    }
  }

  /** 63-bit energy-difference hash over decoded PCM samples: frame b =
    * samples [b·n/64, (b+1)·n/64); bit b set iff frame b+1's byte sum
    * exceeds frame b's. Frame of sample i = i·64/n (integer division) —
    * the exact floor arithmetic the oracle restates.
    */
  def audioFp63(samples: Array[Byte]): Long = {
    val n = samples.length
    require(n >= AudioFrames,
      s"audio fingerprint needs >= $AudioFrames samples, got $n")
    val sums = new Array[Long](AudioFrames)
    var i = 0
    while (i < n) { sums(i * AudioFrames / n) += samples(i) & 0xff; i += 1 }
    var fp = 0L
    var b = 0
    while (b < AudioFrames - 1) {
      if (sums(b + 1) > sums(b)) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** (doc_id, n_samples, fp) in ONE decode pass — the audio sibling of
    * [[imageScan]]: n_samples is the DECODED sample count, so the hash
    * gate re-verifies the WAV codec round-trip alongside the fingerprint.
    */
  def audioScan(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    neardupAudioAssets(spark, docs).mapPartitions { it =>
      it.map { a =>
        val px = decode(a)
        (a.asset_id, px.length.toLong, audioFp63(px))
      }
    }.toDF("doc_id", "n_samples", "fp")
  }

  // ---- Video (RAWV raw-frame container) ---------------------------------

  /** Magic of the RAWV container — the video analog of the PNG/WAV
    * payloads: no JDK video CODEC exists (that decode stays stubbed for
    * true compressed video), but a 100 TB pipeline's frame-level plumbing
    * — parse a binary payload, recover typed frames, fingerprint each —
    * is codec-independent, so the gate runs it on a trivial lossless
    * container we encode and byte-level parse for real: 4-byte magic +
    * 2-byte big-endian width, height, n_frames + row-major 8-bit gray
    * frames. Swap [[decodeRawv]] for an ffmpeg/JNI binding without
    * touching any downstream stage.
    */
  private[graft] def isRawv(bytes: Array[Byte]): Boolean =
    bytes.length >= 10 && bytes(0) == 'R' && bytes(1) == 'A' &&
      bytes(2) == 'W' && bytes(3) == 'V'

  /** Encode w×h gray frames f = 0..nf−1 into a RAWV payload. */
  def encodeRawv(w: Int, h: Int, nf: Int,
      gray: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nf > 0 && w < 65536 && h < 65536 && nf < 65536,
      s"RAWV dims out of range: ${w}x$h x$nf")
    val out = new Array[Byte](10 + w * h * nf)
    out(0) = 'R'; out(1) = 'A'; out(2) = 'W'; out(3) = 'V'
    out(4) = (w >> 8).toByte; out(5) = w.toByte
    out(6) = (h >> 8).toByte; out(7) = h.toByte
    out(8) = (nf >> 8).toByte; out(9) = nf.toByte
    var i = 10
    var f = 0
    while (f < nf) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(i) = gray(f, x, y).toByte; i += 1; x += 1 }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Byte-level parse of a RAWV payload: (w, h, nFrames, frame pixels). */
  def decodeRawv(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(isRawv(bytes), "not a RAWV payload")
    val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val nf = ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
    require(bytes.length == 10 + w * h * nf,
      s"RAWV length ${bytes.length} != header ${w}x$h x$nf")
    (w, h, nf, java.util.Arrays.copyOfRange(bytes, 10, bytes.length))
  }

  /** Frame count of near-dup video `base` — shared across the group (a
    * near-dup pair must align frame-by-frame): 4–7 frames.
    */
  def videoNFrames(base: Long): Int = (4 + base % 4).toInt

  /** Pixel (x, y) of frame `f` of near-dup video `id`: the
    * [[neardupPixel]] avalanche mix (xor-shifts BETWEEN the mod-2³¹−1
    * multiplies — the round-5/round-8 composition lesson) extended with a
    * frame term, plus the sparse per-id +1 perturbation (frame-shifted so
    * different frames perturb different pixels). Probed on 5000 docs
    * before wiring (the round-8 rule): 728 distinct frame-0 fingerprints,
    * within-group max-per-frame Hamming 0–3 (3 pairs at 4 — excluded
    * identically by both engines), zero cross-base frame-0 pairs within
    * Hamming 3 (minimum observed 17). Every intermediate < 2⁴⁸, so DuckDB
    * BIGINT arithmetic reproduces it exactly.
    */
  def videoPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    var h = (neardupBase(id) * 2654435761L + f * 69491L + x * 40503L +
      y * 104729L) % MixMod
    h = h ^ (h >> 15)
    h = (h * 48271L) % MixMod
    h = h ^ (h >> 13)
    h = (h * 16807L) % MixMod
    val delta = if ((x * 7 + y + f * 11) % 37 < (id % NeardupGroup)) 1 else 0
    ((h % 256).toInt + delta) % 256
  }

  /** Video assets for the near-dup gate: REAL RAWV payloads of the
    * planted frame sequences, byte-level parsed back before hashing —
    * dims from the BASE ([[neardupDims]], group members must share them).
    */
  def neardupVideoAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    serialIds(docs).mapPartitions { it =>
      it.map { id =>
        val base = neardupBase(id)
        val (w, h) = neardupDims(base)
        val nf = videoNFrames(base)
        Asset(id, encodeRawv(w, h, nf, (f, x, y) => videoPixel(id, f, x, y)),
          "video", w, h, nf)
      }
    }
  }

  /** (doc_id, n_frames, frame_idx, fp) in ONE decode pass — the video
    * sibling of [[imageScan]]/[[audioScan]], exploded to per-frame dHash
    * rows: n_frames is the PARSED count, so the hash gate re-verifies the
    * container round-trip alongside every frame fingerprint.
    */
  def videoScan(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    neardupVideoAssets(spark, docs).mapPartitions { it =>
      it.flatMap { a =>
        val (w, h, nf, px) = decodeRawv(a.content)
        (0 until nf).map { f =>
          val frame = java.util.Arrays.copyOfRange(px, f * w * h, (f + 1) * w * h)
          (a.asset_id, nf.toLong, f.toLong, dHash63(frame, w, h))
        }
      }
    }.toDF("doc_id", "n_frames", "frame_idx", "fp")
  }

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
        val px = decode(a)
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
