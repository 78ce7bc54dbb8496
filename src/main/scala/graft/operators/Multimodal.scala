package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata, processed batch-at-a-time inside `mapPartitions`.
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are NOT
  * in this environment, so the codec boundary is a pluggable
  * `MediaCodec` with a deterministic stub implementation — the Spark-side
  * plumbing (schema, partition-batched iteration, metadata extraction,
  * frame sampling, content addressing) is real and tested, and a real
  * codec drops in without touching the dataflow.
  *
  * Scale notes: media rows are large — keep
  * `spark.sql.files.maxPartitionBytes` sized so a partition of blobs fits
  * executor memory; derived features (small) should be written to a
  * separate table keyed by content hash so reprocessing never re-reads
  * blob bytes it doesn't need; `mapPartitions` amortizes codec init
  * (model load, decoder contexts) per partition, the same reason Python
  * pipelines use `mapInPandas` batches.
  */
object Multimodal {

  /** One media item: opaque payload + source metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String
  )

  /** Extracted (decoded) metadata — what a real decoder would yield. */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: String,
      width: Int,            // stub: derived deterministically from bytes
      height: Int,
      n_frames: Int
  )

  /** Codec boundary: decode is partition-batched; implementations carry
    * per-partition init cost (e.g. load a decoder) in `open()`. */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def decode(r: MediaRecord): MediaMeta
  }

  /** Deterministic stand-in for the real decoder: dimensions derived from
    * payload bytes. Replace with an actual image/audio codec in
    * production; everything downstream is shape-compatible. */
  object StubCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = {
      val b = r.payload
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(b).map("%02x".format(_)).mkString
      val w = 16 + (if (b.length > 0) (b(0) & 0xff) % 240 else 0)
      val h = 16 + (if (b.length > 1) (b(1) & 0xff) % 240 else 0)
      val frames = r.kind match {
        case "video" => 1 + b.length % 32
        case "audio" => 1 + b.length % 16
        case _       => 1
      }
      MediaMeta(r.media_id, r.kind, b.length.toLong, hash, w, h, frames)
    }
  }

  /** Decode/feature-extract: partition-batched map through the codec. */
  def extractMeta(media: Dataset[MediaRecord],
      codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codec.open()
      it.map(codec.decode)
    }
  }

  /** Frame sampling: every `stride`-th chunk of `chunkBytes` from the
    * payload — the plumbing a video frame-sampler needs (offset math,
    * per-frame rows, bounded output), with byte-slicing standing in for
    * actual frame decode. */
  def sampleFrames(media: Dataset[MediaRecord], chunkBytes: Int,
      stride: Int, maxFrames: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    require(maxFrames >= 0, s"maxFrames must be >= 0, got $maxFrames")
    // the step is computed in Long: Int chunkBytes*stride can overflow
    // to a negative step and silently emit no frames
    require(chunkBytes.toLong * stride <= Int.MaxValue,
      s"chunkBytes * stride overflows Int: $chunkBytes * $stride")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.min(maxFrames,
        (r.payload.length + chunkBytes * stride - 1) / (chunkBytes * stride))
      (0 until n).map { i =>
        val off = i * chunkBytes * stride
        val end = math.min(off + chunkBytes, r.payload.length)
        (r.media_id, i, off,
          java.util.Arrays.copyOfRange(r.payload, off, math.max(off, end)))
      }
    }.toDF("media_id", "frame_idx", "byte_offset", "frame_bytes")
  }

  /** 64-bit perceptual difference hash (dHash) over a 9×8 grayscale
    * grid, emitted as a 64-char '0'/'1' string (the SimHash64
    * portability stance — no int64/hex gymnastics for oracles or
    * banding): bit (r, c) = gray(r·9 + c) < gray(r·9 + c + 1), rows
    * r < 8, columns c < 8; pixels beyond the input pad as 0. This IS
    * the standard perceptual-hash math — the environment-blocked part
    * is only producing TRUE pixels (a real decoder resamples the image
    * to 9×8 grayscale; [[StubCodec]]'s byte-as-pixel stand-in is
    * shape-compatible, so swapping the codec changes nothing
    * downstream). Near-dup pairing rides the existing banded hamming
    * join ([[Dedup.simhashNearDuplicates]] accepts any '0'/'1'
    * fingerprint). Narrow codegen'd pass, zero shuffle. */
  def dHash64(gray: Column): Column = {
    def px(i: Int): Column = coalesce(element_at(gray, i + 1), lit(0))
    concat((for { r <- 0 until 8; c <- 0 until 8 } yield
      when(px(r * 9 + c) < px(r * 9 + c + 1), lit("1"))
        .otherwise(lit("0"))): _*)
  }

  /** Deduplicate media by content hash (exact): one survivor per blob. */
  def dedupByContent(meta: Dataset[MediaMeta]): DataFrame =
    meta.groupBy(col("content_hash"))
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
        first("n_bytes").as("n_bytes"))
}
