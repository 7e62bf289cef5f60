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
