package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling (north-star scope).
  *
  * Media are opaque `binary` columns plus typed metadata, processed
  * per-partition so a real decoder amortizes codec init across a batch —
  * the Spark-side plumbing (schema, partitioning, batch shape) is real;
  * only the codec itself is stubbed (no image/audio libraries ship in
  * this environment; see [[StubDecoder]]).
  *
  * Scale: media rows are large — callers should store binaries in their
  * own parquet (or reference object-store paths) partitioned so one task
  * holds O(100 MB); `decode` is a `mapPartitions` (one decoder instance
  * per task, streaming iterator, no collect).
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], kind: String)
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int,
                       feature: Array[Float])

  /** Decoder SPI — swap in a real image/audio codec here. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaMeta
  }

  /** STUB decoder: a deterministic fake standing in for a real codec
    * (image decode / resize / frame sampling). Derives plausible
    * dimensions and a tiny "feature" from the bytes so the pipeline
    * around it is fully exercisable and reproducible.
    */
  object StubDecoder extends Decoder {
    def decode(row: MediaRow): MediaMeta = {
      val len = row.content.length.toLong
      val w = (len % 640 + 1).toInt
      val h = ((len * 31) % 480 + 1).toInt
      val frames = (len / 100 + 1).toInt
      // fake feature: 4 byte-sum buckets — deterministic, content-sensitive
      val feat = new Array[Float](4)
      var i = 0
      while (i < row.content.length) {
        feat(i % 4) += (row.content(i) & 0xff) / 255.0f
        i += 1
      }
      MediaMeta(row.media_id, row.kind, len, w, h, frames, feat)
    }
  }

  /** Per-partition decode: one decoder per task, streaming. */
  def decode(ds: Dataset[MediaRow], decoder: Decoder = StubDecoder)
            (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Frame sampling: one row per sampled frame index (every `step`th). */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))
}
