package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(100)(_.toByte)),
    MediaRow(2L, "audio", Array.tabulate(10)(i => (i * 3).toByte))
  ).toDS()

  test("extractFeatures emits typed features per row, batched per partition") {
    val out = Multimodal.extractFeatures(media, featureDim = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 100)
    assert(out(1L).feature.length == 8)
    assert(out(1L).width == 1 + 100 % 640)
    // deterministic stub: same input -> same features
    val again = Multimodal.extractFeatures(media, featureDim = 8)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again(2L) == out(2L).feature.toSeq)
  }

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode through javax.imageio: true dims + histogram") {
    val black = png(8, 5)((_, _) => 0x000000)
    val white = png(3, 4)((_, _) => 0xFFFFFF)
    val half = png(6, 2)((x, _) => if (x < 3) 0x000000 else 0xFFFFFF)
    val ds = Seq(
      MediaRow(10L, "image", black),
      MediaRow(11L, "image", white),
      MediaRow(12L, "image", half)).toDS()
    val out = Multimodal.extractFeatures(ds, featureDim = 4)
      .collect().map(f => f.media_id -> f).toMap
    // decoded raster dimensions, not stub arithmetic on byte length
    assert(out(10L).width == 8 && out(10L).height == 5)
    assert(out(11L).width == 3 && out(11L).height == 4)
    // luminance mass lands in the right bins and normalizes to 1
    assert(out(10L).feature.toSeq == Seq(1f, 0f, 0f, 0f))
    assert(out(11L).feature.toSeq == Seq(0f, 0f, 0f, 1f))
    assert(out(12L).feature.toSeq == Seq(0.5f, 0f, 0f, 0.5f))
  }

  test("imageHashes: aHash stable under re-encode-scale, split for distinct images") {
    // 32x32 left-dark/right-light pattern, and the SAME pattern at 64x64
    // (a resize) — aHash must match exactly; the inverted pattern must be
    // far away (~all 64 bits differ)
    val base = png(32, 32)((x, _) => if (x < 16) 0x101010 else 0xF0F0F0)
    val resized = png(64, 64)((x, _) => if (x < 32) 0x101010 else 0xF0F0F0)
    val inverted = png(32, 32)((x, _) => if (x < 16) 0xF0F0F0 else 0x101010)
    val ds = Seq(MediaRow(1L, "image", base), MediaRow(2L, "image", resized),
      MediaRow(3L, "image", inverted), MediaRow(4L, "image", Array[Byte](1, 2)))
      .toDS()
    val out = Multimodal.imageHashes(ds).collect().map(h => h.media_id -> h).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // undecodable 4 dropped
    assert(out(1L).ahash == out(2L).ahash, "resize must not move aHash bits")
    val ham = java.lang.Long.bitCount(out(1L).ahash ^ out(3L).ahash)
    assert(ham >= 48, s"inverted image only $ham bits away")
  }

  test("imageNearDups pairs a lightly-edited copy, not a different image") {
    val base = png(32, 32)((x, y) => if ((x + y) % 7 < 3) 0x202020 else 0xD0D0D0)
    // light edit: one corner cell brightened
    val edited = png(32, 32)((x, y) =>
      if (x < 4 && y < 4) 0xFFFFFF
      else if ((x + y) % 7 < 3) 0x202020 else 0xD0D0D0)
    val other = png(32, 32)((x, y) => if (y < 16) 0x000000 else 0xFFFFFF)
    val ds = Seq(MediaRow(1L, "image", base), MediaRow(2L, "image", edited),
      MediaRow(3L, "image", other)).toDS()
    val pairs = Multimodal.imageNearDups(ds, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"edited copy not paired: $pairs")
    assert(pairs((1L, 2L)) <= 3L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("real WAV payloads decode through javax.sound: rate, channels, envelope") {
    // mono 8 kHz 16-bit signed PCM, 800 samples: first half silence,
    // second half a loud square wave — the envelope must rise
    val sampleRate = 8000f
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if (i % 2 == 0) 20000 else -20000
      pcm(i * 2) = (v & 0xFF).toByte            // little-endian
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val out = Multimodal.extractFeatures(
      Seq(MediaRow(7L, "audio", wav)).toDS(), featureDim = 8).head()
    assert(out.width == 8000)  // sample rate, not the stub's n % 640
    assert(out.height == 1)    // channels
    // bins 0-3 are silence, bins 4-7 carry the square wave at |20000|/32768
    assert(out.feature.take(4).forall(_ == 0.0f))
    assert(out.feature.drop(4).forall(v => math.abs(v - 20000.0 / 32768.0) < 1e-3))
  }

  test("unrecognized payloads fall back to the deterministic stub") {
    val junk = Array.tabulate(100)(_.toByte) // no codec signature
    val ds = Seq(MediaRow(20L, "video", junk)).toDS()
    val f = Multimodal.extractFeatures(ds, featureDim = 8).collect().head
    assert(f.width == 1 + 100 % 640) // stub arithmetic, row not dropped
  }

  test("chunked splits payloads and sampleChunks strides them") {
    val df = media.toDF().withColumnRenamed("payload", "payload")
    val chunks = Multimodal.chunked(df, "payload", chunkBytes = 32)
    val byId = chunks.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 4) // ceil(100/32)
    assert(byId(2L) == 1)
    val sampled = Multimodal.sampleChunks(chunks, stride = 2)
    assert(sampled.where($"media_id" === 1).count() == 2) // idx 0 and 2
  }

  test("chunked emits zero rows for an empty payload (no phantom chunks)") {
    val df = Seq(MediaRow(3L, "image", Array.empty[Byte])).toDS().toDF()
    assert(Multimodal.chunked(df, "payload", chunkBytes = 32).count() == 0)
  }
}
