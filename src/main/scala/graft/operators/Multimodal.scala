package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded and feature-extracted by
  * per-partition batch functions.
  *
  * This is the Scala analog of Python's `mapInPandas` pattern: a typed
  * `Dataset.mapPartitions` that amortizes decoder setup across a whole
  * partition (the way a real image codec or model session would be
  * initialized once per task, not per row). Image payloads decode FOR
  * REAL through javax.imageio (PNG/BMP/GIF/JPEG — the codecs the JDK
  * ships, zero external deps); payloads no JDK codec recognizes fall back
  * to the deterministic stub, so the pipeline never drops rows on
  * unsupported media.
  */
object Multimodal {

  /** One media payload row; `payload` is the opaque blob. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed-width vector + dimensions, as a real decoder
    * would emit.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** Real image decode via the JDK's bundled codecs: width/height from
    * the decoded raster and a `featureDim`-bin luminance histogram
    * (normalized to sum 1) as the feature vector — the cheap, deterministic
    * analog of a visual embedding. Returns None when no installed codec
    * recognizes the payload (caller falls back to the stub).
    *
    * ImageIO's default stream cache writes temp FILES per decode — awful
    * inside an executor task — so decoding goes through a pure
    * ByteArrayInputStream with the disk cache disabled.
    */
  private def decodeImage(payload: Array[Byte], featureDim: Int): Option[(Int, Int, Array[Float])] = {
    if (payload.length < 4) return None
    // NonFatal, not just IOException: ImageIO plugins throw RuntimeExceptions
    // on malformed-but-recognized payloads (IllegalArgumentException for CMYK
    // JPEGs, ArrayIndexOutOfBoundsException from corrupt headers); any
    // undecodable payload must fall back to the stub, never fail the task.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val feature = new Array[Float](featureDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer Rec.601 luma in [0, 255]
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          feature((lum * featureDim) / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < featureDim) { feature(i) /= n; i += 1 }
      Some((w, h, feature))
    }
  }

  /** Real audio decode via the JDK's bundled javax.sound codecs
    * (WAV/AIFF/AU, PCM): `width` carries the sample rate in Hz, `height`
    * the channel count, and the feature vector is a `featureDim`-bin
    * mean-absolute-amplitude envelope over time (each bin the mean |s| of
    * its time slice, normalized to [0, 1]) — the cheap deterministic
    * analog of an audio embedding, as the luminance histogram is for
    * images. Returns None when the payload is not a recognized audio
    * container or not integer PCM (caller falls through to the stub).
    */
  private def decodeAudio(payload: Array[Byte], featureDim: Int): Option[(Int, Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) return None
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      if ((!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
        (bits != 8 && bits != 16) || in.getFrameLength <= 0) return None
      val bytes = in.readAllBytes()
      val bytesPerSample = bits / 8
      val nSamples = bytes.length / bytesPerSample
      if (nSamples == 0) return None
      val sums = new Array[Double](featureDim)
      val counts = new Array[Long](featureDim)
      val big = fmt.isBigEndian
      var s = 0
      while (s < nSamples) {
        val amp =
          if (bits == 8) {
            val raw = bytes(s) & 0xFF
            // unsigned 8-bit centers at 128; signed at 0
            math.abs((if (signed) bytes(s).toInt else raw - 128) / 128.0)
          } else {
            val b0 = bytes(s * 2) & 0xFF
            val b1 = bytes(s * 2 + 1) & 0xFF
            val raw = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
            val v = if (signed) raw.toShort.toInt else raw - 32768
            math.abs(v / 32768.0)
          }
        val bin = (s.toLong * featureDim / nSamples).toInt
        sums(bin) += amp
        counts(bin) += 1
        s += 1
      }
      val feature = Array.tabulate(featureDim)(i =>
        if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
      Some((fmt.getSampleRate.toInt, fmt.getChannels, feature))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** STUB decode: deterministic pseudo-decode of the payload — the
    * fallback for media formats the JDK has no codec for (real pipelines
    * plug the codec in here; the batch shape is unchanged).
    */
  private def decodeStub(payload: Array[Byte], featureDim: Int): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (n % 640)
    val height = 1 + ((n / 7) % 480)
    val feature = new Array[Float](featureDim)
    var i = 0
    while (i < n) {
      feature(i % featureDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    (width, height, feature)
  }

  /** Per-partition batch feature extraction over media payloads: real
    * javax.imageio decode where an image codec matches, real javax.sound
    * decode where an audio codec matches (WAV/AIFF/AU), deterministic
    * stub otherwise. The partition iterator is processed with one decoder
    * setup — the mapInPandas batch shape.
    */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-task decoder init: disable ImageIO's temp-file stream cache
      // (a JVM-wide static, but idempotent and cheap to re-set per task)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, feat) = decodeImage(r.payload, featureDim)
          .orElse(decodeAudio(r.payload, featureDim))
          .getOrElse(decodeStub(r.payload, featureDim))
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, feat)
      }
    }
  }

  /** Deterministic solid-color PNG corpus — the fixture behind the
    * driver-visible decode row (q_media_decode): image i is a
    * (8+(i%5)·3) × (8+(i%7)·2) solid ((i·37)%256, (i·59)%256, (i·83)%256)
    * RGB rectangle, PNG-encoded through the SAME javax.imageio stack the
    * decode path reads with. PNG is lossless and the color is solid, so
    * every decoded property (dimensions, the single hot luminance bin at
    * exactly mass 1.0) is a CLOSED FORM of i — which is what lets a SQL
    * oracle certify a real binary decode without owning a codec. The
    * corpus is bounded (n tiny buffers, driver-side synthesis — the
    * planted-fixture pattern); real pipelines feed [[extractFeatures]]
    * from binaryFile sources instead (FormatsSpec).
    */
  def syntheticImageCorpus(spark: org.apache.spark.sql.SparkSession,
      n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    javax.imageio.ImageIO.setUseCache(false)
    (0 until n).map { i =>
      val w = 8 + (i % 5) * 3
      val h = 8 + (i % 7) * 2
      val rgb = (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
        ((i * 83) % 256)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(i.toLong, "image", bos.toByteArray)
    }.toDS()
  }

  /** Deterministic constant-amplitude WAV corpus — the audio twin of
    * [[syntheticImageCorpus]] (q_audio_decode): clip i is mono signed
    * PCM16 at 8000+(i%5)·1000 Hz, 64+(i%8)·16 samples, every sample the
    * CONSTANT value 256·(1+(i%100)). A constant signal makes every
    * envelope bin exactly |v|/32768 — a power-of-two denominator, so
    * the per-bin mean is EXACT in double and float and the whole decode
    * output is a closed form of i that a SQL oracle replays with one
    * IEEE divide. Encoded through the same javax.sound stack the decode
    * path reads with.
    */
  def syntheticAudioCorpus(spark: org.apache.spark.sql.SparkSession,
      n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    (0 until n).map { i =>
      val rate = 8000f + (i % 5) * 1000f
      val nSamples = 64 + (i % 8) * 16
      val v = (256 * (1 + (i % 100))).toShort
      val bytes = new Array[Byte](nSamples * 2)
      var s = 0
      while (s < nSamples) { // little-endian signed PCM16
        bytes(s * 2) = (v & 0xFF).toByte
        bytes(s * 2 + 1) = ((v >> 8) & 0xFF).toByte
        s += 1
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      MediaRow(i.toLong, "audio", bos.toByteArray)
    }.toDS()
  }

  /** Fixed-size chunking of a payload column for transport/storage —
    * pure column expressions, no UDF.
    */
  def chunked(df: DataFrame, payloadCol: String, chunkBytes: Int): DataFrame =
    df
      .withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      // Empty payloads produce zero chunk rows: sequence(0, -1) would walk
      // backwards (default step -1) and emit phantom chunks, so gate the
      // sequence behind n_bytes > 0 — explode drops the NULL branch.
      .withColumn("chunk_idx", explode(when(col("n_bytes") > 0,
        sequence(lit(0),
          ((col("n_bytes") + chunkBytes - 1) / chunkBytes).cast("int") - 1,
          lit(1)))))
      .withColumn("chunk",
        expr(s"substring($payloadCol, chunk_idx * $chunkBytes + 1, $chunkBytes)"))

  /** Frame sampling: keep every `stride`-th chunk (a video frame-sample
    * analog on the chunk table).
    */
  def sampleChunks(chunks: DataFrame, stride: Int): DataFrame =
    chunks.where(col("chunk_idx") % stride === 0)

  final case class ImageHash(media_id: Long, width: Int, height: Int,
    ahash: Long)

  /** Perceptual average-hash (aHash) per image: decode, area-average the
    * Rec.601 luma onto an 8x8 grid, emit the 64-bit signature (bit set
    * where the cell is brighter than the image mean). Re-encodes,
    * resizes, and small edits move few bits; distinct images differ in
    * ~32 — the image analog of SimHash, and the standard first tier of
    * image dedup. Integer arithmetic end to end (sum-of-luma per cell
    * times exact pixel counts), so the hash is deterministic across
    * JVMs. Undecodable payloads are dropped (they have no perceptual
    * content to hash).
    */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Long](64)
          val counts = new Array[Long](64)
          var y = 0
          while (y < h) {
            var x = 0
            val gy = math.min(7, y * 8 / h)
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                (rgb & 0xFF) * 114) / 1000
              val cell = gy * 8 + math.min(7, x * 8 / w)
              sums(cell) += lum
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          // cell means scaled by the common denominator; compare against
          // the global mean with cross-multiplication so everything stays
          // in exact integers (cells can be empty when w or h < 8)
          var totalSum = 0L
          var totalCnt = 0L
          var i = 0
          while (i < 64) { totalSum += sums(i); totalCnt += counts(i); i += 1 }
          var hash = 0L
          i = 0
          while (i < 64) {
            if (counts(i) > 0 &&
                sums(i) * totalCnt > totalSum * counts(i))
              hash |= 1L << i
            i += 1
          }
          Some(ImageHash(r.media_id, w, h, hash))
        }
      }
    }
  }

  /** Perceptual near-duplicate image pairs: aHash signatures banded into
    * four 16-bit chunks (pigeonhole: hamming <= 3 over 64 bits forces at
    * least one identical chunk), candidates bucket-joined on (chunk index,
    * chunk value), verified with the exact popcount of the XOR — the
    * SimHash chunk-banding scheme (Dedup.simhashNearDups) applied to
    * pixels instead of tokens. Pair output deduped via band = min rule.
    */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    val sigs = imageHashes(media).toDF()
    val banded = sigs.select(col("media_id"), col("ahash"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("ahash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bh")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .agg(min(col("a.band")).as("first_band"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }
}
