package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The decode itself is a clearly-marked STUB — the image/audio libraries
  * are not in this container — but everything Spark-side is real and
  * tested: the schema, the binary column flow, the mapPartitions batch
  * shape (decode amortized per partition, not per row), and the
  * explode-style frame sampling. A real decoder slots into `decodeBatch`
  * without touching any plan.
  */
object MediaOps {

  final case class MediaRow(media_id: Long, fmt: String, payload: Array[Byte])
  final case class MediaMeta(
      media_id: Long, fmt: String, width: Int, height: Int, n_frames: Int,
      bytes: Long)
  final case class Frame(media_id: Long, frame_idx: Int, feature: Long)

  /** STUB decode: deterministic fake metadata derived from the payload
    * bytes (length + first/last byte mixing). A real implementation would
    * parse container headers here; per-partition batching is the part that
    * matters for Spark (one decoder instance per partition, not per row).
    */
  private def decodeBatch(batch: Iterator[MediaRow]): Iterator[MediaMeta] = {
    // simulate per-partition decoder initialization cost happening ONCE
    val decoderHandle = new java.util.zip.CRC32()
    batch.map { m =>
      decoderHandle.reset()
      decoderHandle.update(m.payload, 0, math.min(16, m.payload.length))
      val mix = decoderHandle.getValue
      MediaMeta(
        m.media_id, m.fmt,
        width = 320 + (m.payload.length % 320),
        height = 240 + (m.payload.length % 240),
        n_frames = 1 + (mix % 24).toInt,
        bytes = m.payload.length.toLong)
    }
  }

  def decode(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(decodeBatch)
  }

  /** Frame sampling: one row per sampled frame index (every `stride`-th),
    * with a STUB per-frame feature (deterministic from id + index). The
    * explode happens in the plan (`posexplode`-equivalent), so frame rows
    * are produced distributed, never on the driver.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): Dataset[Frame] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.flatMap { m =>
      (0 until m.n_frames by stride).iterator.map { i =>
        Frame(m.media_id, i, graft.data.PagesGen.splitmix64(m.media_id * 131 + i))
      }
    }
  }

  /** STUB resize: metadata-only transform (a real one would re-encode the
    * payload); keeps the binary column schema stable through the plan.
    */
  def resize(meta: Dataset[MediaMeta], maxW: Int): Dataset[MediaMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map { m =>
      if (m.width <= maxW) m
      else m.copy(
        width = maxW,
        height = math.max(1, (m.height.toLong * maxW / m.width).toInt))
    }
  }

  /** Wrap any table with a text column as a media table (fake payloads from
    * the text bytes) — the fixture path used by tests and SparkEntry.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "img")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("fmt"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
