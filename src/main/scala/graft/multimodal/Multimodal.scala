package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as opaque
  * BINARY payloads with typed metadata, processed by a per-partition batch
  * decode operator.
  *
  * The actual codecs are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic STUB (`decodeStub`) — everything around it
  * is the real Spark shape: a binary column + metadata struct, a typed
  * `mapPartitions` that amortizes per-batch decoder setup (exactly where a
  * JNI/FFmpeg/JPEG handle would be opened once per partition), and a
  * downstream frame-sampling explode. Swap `decodeStub` for a real codec
  * and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           head_point: Int, n_frames: Long)

  /** STUB decoder — deterministic fake standing in for an image/audio
    * decode. Real implementation would parse the container; the fake
    * derives: size, the first decoded CODE POINT (0 when empty — matching
    * SQL `ascii(substr(text,1,1))`, so the plumbing stays oracle-checkable
    * for non-ASCII payloads too), and a "frame count" (1 per 256 bytes).
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    val head =
      if (n > 0) new String(r.payload, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      else 0
    MediaFeatures(r.doc_id, r.media_type, n, head, n / 256 + 1)
  }

  /** Batch feature extraction: one decoder "handle" per partition (the
    * stub's placeholder), rows streamed through it — the mapPartitions
    * shape a real codec needs. No shuffle; runs inside the scan stage.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media_type").cast("string"),
        col("payload").cast("binary")).as[MediaRow]
      .mapPartitions { rows =>
        // real codec: open decoder handle here, close in a final step
        rows.map(decodeStub)
      }
  }

  /** Frame sampling: every `stride`-th frame index of each media row —
    * explode produces the (doc, frame) work-list a real frame extractor
    * would map over.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.select(col("doc_id"), col("media_type"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
        .as("frame_idx"))
}
