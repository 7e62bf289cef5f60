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
  * initialized once per task, not per row). The decode itself is STUBBED
  * deterministically — the media codecs aren't in this environment — but
  * the Spark plumbing (schemas, encoders, batch shape, partitioning) is
  * real and tested.
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

  /** STUB decode: deterministic pseudo-decode of the payload. A real
    * implementation would hand `payload` to an image/audio codec here; the
    * shape of the computation (bytes in, dims + feature vector out, batch
    * loop per partition) is exactly what production code does.
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

  /** Per-partition batch feature extraction over media payloads. The
    * partition iterator is processed with one (stubbed) decoder instance —
    * the mapInPandas batch shape.
    */
  def extractFeatures(media: Dataset[MediaRow], featureDim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // decoder/session init would happen here, once per task
      rows.map { r =>
        val (w, h, feat) = decodeStub(r.payload, featureDim)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, feat)
      }
    }
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
}
