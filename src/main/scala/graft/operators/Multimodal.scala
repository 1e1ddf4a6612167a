package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item: opaque binary payload + typed metadata. */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Metadata extracted by the (stubbed) decoder. */
final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    frame_count: Long, checksum: Long)

/** One sampled frame of a media payload. */
final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per-partition through a typed
  * Dataset.
  *
  * The Spark-side plumbing is real — schema, encoders, partition-iterator
  * batch shape (the Scala analog of mapInPandas batches). The decode step
  * is a clearly-marked DETERMINISTIC STUB: this container has no codec
  * libraries, so `decodeStub` derives metadata arithmetically from the
  * payload; a production build swaps in the real codec per media_type
  * without touching the surrounding plan.
  */
object Multimodal {

  /** Build a media table from documents: payload = UTF-8 bytes of text
    * standing in for encoded media; media_type alternates img/aud. */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, "img").otherwise("aud").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation: decode payload with an image/audio library and
    * emit true dimensions/frames. Kept pure and arithmetic so tests and
    * the DuckDB oracle can verify the pipeline end-to-end. */
  def decodeStub(row: MediaRow): MediaMeta = {
    val n = row.payload.length.toLong
    val frames = row.media_type match {
      case "img" => 1L                  // stills decode to one frame
      case "aud" => n / 50L + 1L        // fake 50-bytes-per-frame codec
      case _     => n / 100L + 1L
    }
    var sum = 0L
    var i = 0
    while (i < row.payload.length) {
      sum = (sum + (row.payload(i) & 0xffL)) % 1000000007L
      i += 1
    }
    MediaMeta(row.doc_id, row.media_type, n, frames, sum)
  }

  /** Decode a media table per partition (batched iterator — the executor
    * never materializes the whole partition). */
  def extractMetadata(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** Sample every `every`-th fixed-size frame from each payload — the
    * frame-sampling stage of a video/audio pipeline. The 1→N flatMap is
    * the real plumbing; the "codec" is byte-slicing (STUB — a real build
    * decodes with a media library and emits actual frames). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 50, every: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).by(every).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** One resized media item: payload normalized to `targetBytes`. */
  final case class Resized(doc_id: Long, media_type: String, in_bytes: Long,
      out_bytes: Long, truncated: Boolean, payload: Array[Byte])

  /** Resize stage (STUB): normalize every payload to exactly
    * `targetBytes` — truncate long payloads, zero-pad short ones. A real
    * build decodes, rescales pixels/samples, and re-encodes; the plumbing
    * (binary in → fixed-size binary out, per-partition batches, typed
    * metadata alongside) is the production shape. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      targetBytes: Int = 64): Dataset[Resized] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(r.payload, targetBytes)
      Resized(r.doc_id, r.media_type, r.payload.length.toLong,
        targetBytes.toLong, r.payload.length > targetBytes, out)
    })
  }

  /** Fixed-width feature vector per frame (STUB standing in for a real
    * embedding model: mean byte value + normalized length + head bytes).
    * The shape — binary in, Array[Float] out, batched per partition — is
    * what a model-server UDF needs. */
  def frameFeatures(spark: SparkSession, frames: Dataset[Frame], dims: Int = 8):
      Dataset[(Long, Int, Array[Float])] = {
    import spark.implicits._
    frames.mapPartitions(_.map { f =>
      val v = new Array[Float](dims)
      if (f.frame.nonEmpty) {
        v(0) = f.frame.map(b => (b & 0xff).toFloat).sum / f.frame.length
        v(1) = f.frame.length.toFloat
        var i = 0
        while (i < dims - 2 && i < f.frame.length) {
          v(i + 2) = (f.frame(i) & 0xff).toFloat
          i += 1
        }
      }
      (f.doc_id, f.frame_idx, v)
    })
  }
}
