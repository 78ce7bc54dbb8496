package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata, processed batch-at-a-time inside `mapPartitions`.
  *
  * The codec boundary is a pluggable `MediaCodec`. IMAGES decode for
  * real: [[ImageIoCodec]] reads PNG/JPEG/BMP/GIF through the JDK's
  * `javax.imageio` (present in this environment) and resamples to the
  * 9×8 dHash grid with exact integer math. AUDIO decodes for real too:
  * [[parseWav]] walks RIFF/WAVE PCM byte-by-byte (WAV needs no codec),
  * yielding true samples for [[wavFeatures]] and the [[waveHash64]]
  * fingerprint. Only VIDEO has no JDK decoder, so that kind keeps the
  * deterministic [[StubCodec]] stand-in — the Spark-side plumbing
  * (schema, partition-batched iteration, metadata extraction, frame
  * sampling, content addressing) is identical either way, and a real
  * video codec drops in without touching the dataflow ([[JdkCodec]]
  * routes all three kinds).
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

  /** Deterministic stand-in for kinds the JDK cannot decode (audio,
    * video — image rows should use [[ImageIoCodec]]): dimensions derived
    * from payload bytes. Everything downstream is shape-compatible. */
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

  /** Real image decode through the JDK's `javax.imageio` readers
    * (PNG/JPEG/BMP/GIF): image rows yield their TRUE width/height;
    * payloads no reader accepts — and audio/video, which the JDK has no
    * codecs for — fall back to [[StubCodec]]'s deterministic stand-in.
    * `ImageReader` instances are not thread-safe but `ImageIO.read`
    * allocates per call, so the partition-batched map needs no extra
    * synchronization. */
  object ImageIoCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta =
      if (r.kind != "image") StubCodec.decode(r)
      else decodeImage(r.payload) match {
        case None => StubCodec.decode(r)
        case Some(img) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hash = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaMeta(r.media_id, r.kind, r.payload.length.toLong, hash,
            img.getWidth, img.getHeight, 1)
      }
  }

  /** Decode an image payload, `None` when no installed reader claims the
    * format (or the bytes are corrupt). */
  def decodeImage(payload: Array[Byte]):
      Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Grayscale value (0–255) of pixel (x, y): the raw raster sample for
    * gray images (no color-space round-trip — `getRGB` on a gray image
    * would gamma-convert and break exact round-trips), ITU-R BT.601
    * integer luma `(299R + 587G + 114B) / 1000` for color. */
  private def grayAt(img: java.awt.image.BufferedImage,
      x: Int, y: Int): Int =
    if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.getSample(x, y, 0)
    else {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }

  /** Area-average resample to the 9×8 dHash grid, exact integer math:
    * cell (row, col) floor-averages the source pixels with
    * x ∈ [col·W/9, (col+1)·W/9), y ∈ [row·H/8, (row+1)·H/8) (integer
    * boundaries, at least one pixel per cell — tiny images repeat
    * pixels rather than leaving cells empty). Deterministic: the same
    * image yields the same 72 integers on any platform. */
  def gray9x8(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](72)
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9
        val x1 = math.min(w, math.max(x0 + 1, (c + 1) * w / 9))
        val y0 = row * h / 8
        val y1 = math.min(h, math.max(y0 + 1, (row + 1) * h / 8))
        var s = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += grayAt(img, x, y); n += 1; x += 1 }
          y += 1
        }
        out(row * 9 + c) = (s / n).toInt
        c += 1
      }
      row += 1
    }
    out
  }

  /** [[decodeImage]] + [[gray9x8]]: the true-pixel input to [[dHash64]].
    * `None` on undecodable payloads (callers keep the stub grid). */
  def decodeGray9x8(payload: Array[Byte]): Option[Array[Int]] =
    decodeImage(payload).map(gray9x8)

  /** General fixed-size resize — the feature-extraction preprocessor
    * (models want one input geometry): area-average resample of the
    * grayscale image to an ARBITRARY `ow`×`oh` grid, row-major, with
    * exactly [[gray9x8]]'s integer rule (floor boundaries, ≥1 source
    * pixel per cell, tiny images repeat pixels). `gray9x8` is the
    * (9, 8) special case kept for the hash paths. Deterministic on any
    * platform; cost is one pass over source pixels. */
  def grayResample(img: java.awt.image.BufferedImage,
      ow: Int, oh: Int): Array[Int] = {
    require(ow > 0 && oh > 0, s"bad resize target: ${ow}x$oh")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](ow * oh)
    var row = 0
    while (row < oh) {
      var c = 0
      while (c < ow) {
        val x0 = c * w / ow
        val x1 = math.min(w, math.max(x0 + 1, (c + 1) * w / ow))
        val y0 = row * h / oh
        val y1 = math.min(h, math.max(y0 + 1, (row + 1) * h / oh))
        var s = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += grayAt(img, x, y); n += 1; x += 1 }
          y += 1
        }
        out(row * ow + c) = (s / n).toInt
        c += 1
      }
      row += 1
    }
    out
  }

  /** Integer audio downsampling by decimation factor `k` with a boxcar
    * (mean-of-k) anti-alias filter, exact integers: output frame i =
    * mean of input frames [i·k, (i+1)·k) per channel (a trailing
    * partial window means what remains), divided with TRUNCATION
    * toward zero — samples are signed and that is what both the JVM
    * (`-7/2 == -3`) and DuckDB's `//` compute, so the convention is
    * replayable verbatim. The feature-extraction
    * preprocessor for audio (models want one sample rate); sample rate
    * divides by `k` (floor). Deterministic, one pass. */
  def downsampleWav(w: WavData, k: Int): WavData = {
    require(k > 0, s"decimation factor must be positive: $k")
    if (k == 1) return w
    val frames = w.samples.length / w.channels
    val oFrames = (frames + k - 1) / k
    val out = new Array[Int](oFrames * w.channels)
    var i = 0
    while (i < oFrames) {
      var c = 0
      while (c < w.channels) {
        var s = 0L; var n = 0
        var j = i * k
        val end = math.min(frames, (i + 1) * k)
        while (j < end) { s += w.samples(j * w.channels + c); n += 1; j += 1 }
        out(i * w.channels + c) = (s / n).toInt
        c += 1
      }
      i += 1
    }
    WavData(w.sample_rate / k, w.channels, w.bits_per_sample, out)
  }

  /** Deterministic 8-bit grayscale PNG from a row-major pixel function —
    * the in-engine image generator for gates and tests. PNG is lossless
    * and `TYPE_BYTE_GRAY` samples write/read untouched, so
    * [[decodeGray9x8]] of this payload equals the area-average of
    * `px(x, y) & 0xff` exactly. */
  def grayPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
    * the standard perceptual-hash math, and for image payloads the grid
    * can be TRUE pixels: [[decodeGray9x8]] (JDK ImageIO decode +
    * area-average resample) feeds this directly; [[StubCodec]]'s
    * byte-as-pixel stand-in remains shape-compatible for kinds without
    * a JDK codec. Near-dup pairing rides the existing banded hamming
    * join ([[Dedup.simhashNearDuplicates]] accepts any '0'/'1'
    * fingerprint). Narrow codegen'd pass, zero shuffle. */
  def dHash64(gray: Column): Column = {
    def px(i: Int): Column = coalesce(element_at(gray, i + 1), lit(0))
    concat((for { r <- 0 until 8; c <- 0 until 8 } yield
      when(px(r * 9 + c) < px(r * 9 + c + 1), lit("1"))
        .otherwise(lit("0"))): _*)
  }

  /** 64-bit average hash (aHash) over the 8×8 subgrid of the same 9×8
    * grid [[dHash64]] uses (columns 0–7): bit i = cell > grid mean,
    * computed in exact integers (`cell × 64 > sum` — no float mean), as
    * a 64-char '0'/'1' string. aHash and dHash catch different edits —
    * aHash survives small shifts that flip dHash's neighbor
    * comparisons, dHash survives brightness changes that move aHash's
    * mean — so near-dup pipelines band BOTH through the hamming join
    * and union the pairs. Narrow codegen'd pass, zero shuffle. */
  def aHash64(gray: Column): Column = {
    def px(i: Int): Column = coalesce(element_at(gray, i + 1), lit(0))
    val cells = for { r <- 0 until 8; c <- 0 until 8 } yield px(r * 9 + c)
    val total = cells.reduce(_ + _)
    concat(cells.map(c =>
      when(c * 64 > total, lit("1")).otherwise(lit("0"))): _*)
  }

  /** Deduplicate media by content hash (exact): one survivor per blob. */
  def dedupByContent(meta: Dataset[MediaMeta]): DataFrame =
    meta.groupBy(col("content_hash"))
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
        first("n_bytes").as("n_bytes"))

  // ---------------------------------------------------------------- audio

  /** Decoded PCM audio: interleaved signed samples (8-bit unsigned
    * payloads are re-centered to signed by subtracting 128, so sample
    * math is uniform across bit depths). */
  final case class WavData(
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      samples: Array[Int]    // interleaved: frame f, channel c at f*ch+c
  )

  /** Parse a RIFF/WAVE PCM payload byte-by-byte — WAV needs no codec,
    * just the RIFF chunk walk (id/size pairs, word-aligned) plus the
    * `fmt ` layout, so audio decodes for REAL in this environment the
    * same way images do through ImageIO. Accepts linear PCM
    * (`audioFormat == 1`) at 8 or 16 bits; anything else — compressed
    * formats, float PCM, truncated or non-RIFF bytes — returns `None`
    * and callers keep the stub path. Chunk sizes are validated against
    * the payload so corrupt lengths cannot over-read. */
  def parseWav(payload: Array[Byte]): Option[WavData] = {
    def u8(i: Int) = payload(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(payload, i, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, nBytes)
    var off = 12
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val size = u32(off + 4)
      if (size < 0 || off + 8 + size > payload.length) return None
      val body = off + 8
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = u16(body)
          val ch = u16(body + 2)
          val rate = u32(body + 4)
          val bits = u16(body + 14)
          if (audioFormat != 1 || ch < 1 || rate < 1 ||
              rate > Int.MaxValue || (bits != 8 && bits != 16)) return None
          fmt = Some((ch, rate.toInt, bits))
        case "data" => data = Some((body, size.toInt))
        case _      => () // LIST, fact, cue … — skip
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
      val n = if (bits == 16) dLen / 2 else dLen
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          if (bits == 16) u16(dOff + 2 * i).toShort.toInt
          else u8(dOff + i) - 128
        i += 1
      }
      WavData(rate, ch, bits, samples)
    }
  }

  /** Deterministic 16-bit PCM WAV bytes from interleaved samples — the
    * in-engine audio generator for gates and tests (the [[grayPng]]
    * analogue). PCM is lossless, so [[parseWav]] of this payload
    * returns exactly `samples`. */
  def pcmWav(sampleRate: Int, channels: Int,
      samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"bad wav params: rate=$sampleRate channels=$channels")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // linear PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.putShort(s.toShort))
    out.array()
  }

  /** Exact-integer feature vector of a decoded waveform — the audio
    * analogue of the image metadata pass, every field engine-portable:
    * per-channel sample count, integer-µs duration, peak |sample|, the
    * energy numerator Σ s² (consumers divide/√ themselves — no floats
    * here), strict sign-flip zero crossings on channel 0 (the pitch /
    * noisiness proxy), and full-scale clip count (damaged-capture
    * signal). */
  final case class WavFeatures(
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_samples: Long,       // per channel (frames)
      duration_us: Long,
      peak: Int,
      energy: Long,          // Σ sample² over all channels
      zero_crossings: Long,  // channel 0, strict sign products < 0
      clipped: Long          // samples at ±full scale for the bit depth
  )

  def wavFeatures(w: WavData): WavFeatures = {
    val frames = w.samples.length.toLong / w.channels
    var peak = 0; var energy = 0L; var zc = 0L; var clip = 0L
    val full = if (w.bits_per_sample == 16) 32767 else 127
    var i = 0
    var prev0 = 0 // last channel-0 sample seen (0 before the first)
    var seen0 = false
    while (i < w.samples.length) {
      val s = w.samples(i)
      val a = math.abs(s)
      if (a > peak) peak = a
      energy += s.toLong * s
      if (s >= full || s <= -full - 1) clip += 1
      if (i % w.channels == 0) {
        if (seen0 && prev0.toLong * s < 0) zc += 1
        prev0 = s; seen0 = true
      }
      i += 1
    }
    WavFeatures(w.sample_rate, w.channels, w.bits_per_sample, frames,
      frames * 1000000L / w.sample_rate, peak, energy, zc, clip)
  }

  /** 65 |channel-0 sample| windows — (sum, size) pairs, NOT floor-means:
    * the hash comparison cross-multiplies mean(i) < mean(i+1) into
    * `sum(i)·size(i+1) < sum(i+1)·size(i)` so it is EXACT (a floor-mean
    * grid can flip a comparison under loudness gain — floor(3·s/m) is
    * not 3·floor(s/m)). Boundaries follow [[gray9x8]]'s rule: floor
    * edges, ≥1 sample per window, tiny clips repeat samples rather than
    * leave empty windows. */
  def waveWindows65(w: WavData): (Array[Long], Array[Int]) = {
    val frames = w.samples.length / w.channels
    val sums = new Array[Long](65)
    val sizes = new Array[Int](65)
    if (frames == 0) { java.util.Arrays.fill(sizes, 1); return (sums, sizes) }
    var k = 0
    while (k < 65) {
      val x0 = k * frames / 65
      val x1 = math.min(frames, math.max(x0 + 1, (k + 1) * frames / 65))
      var s = 0L; var x = x0
      while (x < x1) { s += math.abs(w.samples(x * w.channels)); x += 1 }
      sums(k) = s; sizes(k) = x1 - x0
      k += 1
    }
    (sums, sizes)
  }

  /** One voice/sound-activity segment: consecutive above-threshold
    * energy windows coalesced, all bounds in channel-0 FRAMES
    * (`end_frame` exclusive) and the energy as the exact Σ s₀²
    * numerator over the segment. */
  final case class AudioSegment(
      seg_idx: Int, start_frame: Long, end_frame: Long,
      n_windows: Long, energy: Long)

  /** Energy-gated activity segmentation — the VAD-shaped preprocessor a
    * speech corpus runs before transcription/training (cut silences,
    * keep utterances): channel-0 samples split into fixed
    * `windowFrames`-frame windows (the trailing partial window counts),
    * a window is ACTIVE iff its energy clears the mean-square gate
    * `Σ s₀² ≥ meanSqThreshold · nFrames` (cross-multiplied — exact
    * integers, no float RMS), and runs of consecutive active windows
    * coalesce into segments. Deterministic one-pass fold, engine-
    * portable (%, ·, ≥ only), and the frame bounds convert to µs as
    * `frame · 10⁶ / sample_rate` by the caller — kept in frames here so
    * no division truncates inside the operator. */
  def energySegments(w: WavData, windowFrames: Int,
      meanSqThreshold: Long): Seq[AudioSegment] = {
    require(windowFrames > 0, s"windowFrames must be > 0: $windowFrames")
    require(meanSqThreshold >= 0,
      s"meanSqThreshold must be >= 0: $meanSqThreshold")
    val frames = w.samples.length / w.channels
    val out = Seq.newBuilder[AudioSegment]
    var segStart = -1L; var segWindows = 0L; var segEnergy = 0L
    var segIdx = 0
    var wStart = 0
    while (wStart < frames) {
      val wEnd = math.min(frames, wStart + windowFrames)
      var e = 0L; var f = wStart
      while (f < wEnd) {
        val s = w.samples(f * w.channels).toLong
        e += s * s
        f += 1
      }
      if (e >= meanSqThreshold * (wEnd - wStart)) {
        if (segStart < 0) { segStart = wStart; segWindows = 0; segEnergy = 0 }
        segWindows += 1; segEnergy += e
      } else if (segStart >= 0) {
        out += AudioSegment(segIdx, segStart, wStart.toLong, segWindows,
          segEnergy)
        segIdx += 1; segStart = -1
      }
      wStart = wEnd
    }
    if (segStart >= 0)
      out += AudioSegment(segIdx, segStart, frames.toLong, segWindows,
        segEnergy)
    out.result()
  }

  /** Per-patch sufficient statistics over a row-major gray grid — the
    * ViT-ingest patch pass (models normalize per patch; `sum` and
    * `sum_sq` are the exact integer numerators of mean and variance, so
    * no float leaves the engine): non-overlapping `p`×`p` tiles in
    * row-major patch order, ragged right/bottom edges become smaller
    * tiles (every pixel belongs to exactly one patch — dropping edge
    * tiles would silently crop the image). One pass, zero allocation
    * beyond the output. */
  final case class PatchStat(
      patch_row: Int, patch_col: Int, n_px: Long, px_sum: Long,
      px_sum_sq: Long)

  def grayPatchStats(grid: Array[Int], w: Int, p: Int): Seq[PatchStat] = {
    require(w > 0 && p > 0, s"bad patch params: w=$w p=$p")
    require(grid.length % w == 0,
      s"grid length ${grid.length} is not a multiple of width $w")
    val h = grid.length / w
    val out = Seq.newBuilder[PatchStat]
    var pr = 0
    while (pr * p < h) {
      var pc = 0
      while (pc * p < w) {
        val y1 = math.min(h, (pr + 1) * p)
        val x1 = math.min(w, (pc + 1) * p)
        var s = 0L; var ss = 0L; var n = 0L
        var y = pr * p
        while (y < y1) {
          var x = pc * p
          while (x < x1) {
            val v = grid(y * w + x).toLong
            s += v; ss += v * v; n += 1
            x += 1
          }
          y += 1
        }
        out += PatchStat(pr, pc, n, s, ss)
        pc += 1
      }
      pr += 1
    }
    out.result()
  }

  /** 64-bit waveform difference hash over [[waveWindows65]] — dHash's
    * audio sibling: bit i = mean|s| of window i < mean of window i+1,
    * compared as the cross-multiplication
    * `sum(i)·size(i+1) < sum(i+1)·size(i)` (exact integers, no floor
    * loss), emitted as a 64-char '0'/'1' string so it rides the SAME
    * banded hamming join as dHash/aHash/SimHash
    * (`Dedup.simhashNearDuplicates`). Exactly loudness-gain-invariant:
    * gain multiplies both sides of every comparison. Narrow codegen'd
    * pass, zero shuffle. */
  def waveHash64(sums: Column, sizes: Column): Column = {
    def sm(i: Int): Column = coalesce(element_at(sums, i + 1), lit(0L))
    def sz(i: Int): Column =
      coalesce(element_at(sizes, i + 1), lit(1)).cast("long")
    concat((0 until 64).map(i =>
      when(sm(i) * sz(i + 1) < sm(i + 1) * sz(i), lit("1"))
        .otherwise(lit("0"))): _*)
  }

  /** Real audio decode for `kind == "audio"` rows through [[parseWav]]
    * (RIFF/WAVE PCM needs no external codec); width carries the sample
    * rate, height the channel count, n_frames the per-channel sample
    * count — the duration-bearing fields a curation filter keys on.
    * Non-WAV audio payloads fall back to [[StubCodec]]. */
  object WavCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta =
      if (r.kind != "audio") StubCodec.decode(r)
      else parseWav(r.payload) match {
        case None => StubCodec.decode(r)
        case Some(w) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hash = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaMeta(r.media_id, r.kind, r.payload.length.toLong, hash,
            w.sample_rate, w.channels,
            (w.samples.length / w.channels).toInt)
      }
  }

  /** The all-JDK codec: images through ImageIO, audio through the WAV
    * parser, video (no JDK codec exists) through the stub — the widest
    * real-decode surface this environment supports behind one codec. */
  object JdkCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaMeta = r.kind match {
      case "image" => ImageIoCodec.decode(r)
      case "audio" => WavCodec.decode(r)
      case _       => StubCodec.decode(r)
    }
  }

  // ----------------------------------------------------- format sniffing

  /** Magic-byte content-type detection — the routing step a WARC/media
    * ingest runs BEFORE trusting any declared Content-Type (Common
    * Crawl's are wrong constantly): prefix signatures for png / jpeg /
    * gif / bmp / riff-wav / riff-avi / gzip / zip / pdf, a
    * whitespace-and-BOM-tolerant HTML sniff, and a text-vs-bin
    * fallback (a C0 control byte other than tab/LF/CR in the first 64
    * bytes ⇒ binary). Container formats check BOTH magic positions
    * (RIFF at 0 AND the form type at 8), so "RIFF"+garbage doesn't
    * claim wav. Pure `when`-chain over `hex(substring(payload, …))` —
    * codegen'd, narrow, zero shuffle. */
  def sniffFormat(payload: Column): Column = {
    def hexAt(pos: Int, n: Int): Column =
      hex(substring(payload, pos, n))
    def asc(pos: Int, n: Int, s: String): Column =
      hexAt(pos, n) === s.getBytes("US-ASCII")
        .map("%02X".format(_)).mkString
    // head for the text-ish sniffs via the binary→string REINTERPRET
    // cast (zero-copy, tolerates invalid UTF-8 — unlike `decode`,
    // which errors on malformed input under ANSI)
    val head = substring(payload, 1, 64).cast("string")
    when(hexAt(1, 8) === "89504E470D0A1A0A", "png")
      .when(hexAt(1, 3) === "FFD8FF", "jpeg")
      .when(asc(1, 6, "GIF87a") || asc(1, 6, "GIF89a"), "gif")
      .when(asc(1, 4, "RIFF") && asc(9, 4, "WAVE"), "wav")
      .when(asc(1, 4, "RIFF") && asc(9, 4, "AVI "), "avi")
      .when(asc(1, 2, "BM"), "bmp")
      .when(hexAt(1, 2) === "1F8B", "gzip")
      .when(hexAt(1, 4) === "504B0304", "zip")
      .when(asc(1, 4, "%PDF"), "pdf")
      .when(head.rlike("(?i)^(\\x{feff})?[ \\t\\n\\r]*<(!doctype|html)"),
        "html")
      // binary = a C0 control (minus tab/LF/CR) OR an invalid UTF-8
      // sequence (the reinterpret cast surfaces those as U+FFFD when
      // the regex engine reads the head) in the first 64 bytes
      .when(head.rlike(
        "[\\x{00}-\\x{08}\\x{0b}\\x{0c}\\x{0e}-\\x{1f}\\x{fffd}]"),
        "bin")
      .otherwise("text")
  }

  // --------------------------------------------------- PNG chunk walk

  /** Parsed PNG structure: IHDR geometry + the tEXt key/value pairs
    * (provenance, generator tags — the metadata a curation pipeline
    * filters on) in chunk order. */
  final case class PngMeta(
      width: Int, height: Int, bit_depth: Int, color_type: Int,
      interlace: Int, n_chunks: Int, texts: Seq[(String, String)])

  /** Byte-level PNG chunk walk (the image sibling of [[parseWav]]'s
    * RIFF walk): signature, then length/type/data/CRC chunks through
    * IEND. Every chunk's CRC32 (over type+data, the spec's polynomial
    * via `java.util.zip.CRC32`) is VERIFIED — a corrupt length or
    * flipped byte returns None rather than garbage geometry. tEXt
    * data splits at the first NUL into (keyword, value) per the spec.
    * No decoder, no ImageIO — this reads structure, not pixels. */
  def parsePng(payload: Array[Byte]): Option[PngMeta] = {
    if (payload.length < 8) return None
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) {
      if ((payload(i) & 0xff) != sig(i)) return None
      i += 1
    }
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    var off = 8
    var meta: Option[(Int, Int, Int, Int, Int)] = None
    val texts = scala.collection.mutable.Buffer[(String, String)]()
    var chunks = 0
    var ended = false
    while (!ended) {
      if (off + 12 > payload.length) return None
      val len = u32(off)
      if (len > Int.MaxValue - 12 || off + 12 + len > payload.length)
        return None
      val ctype = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(payload, off + 4, 4 + len.toInt)
      if (crc.getValue != u32(off + 8 + len.toInt)) return None
      chunks += 1
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          meta = Some((u32(off + 8).toInt, u32(off + 12).toInt,
            payload(off + 16) & 0xff, payload(off + 17) & 0xff,
            payload(off + 20) & 0xff))
        case "tEXt" =>
          val data = new String(payload, off + 8, len.toInt, "ISO-8859-1")
          val nul = data.indexOf('\u0000')
          if (nul >= 0)
            texts += ((data.substring(0, nul), data.substring(nul + 1)))
        case "IEND" => ended = true
        case _      => ()
      }
      off += 12 + len.toInt
    }
    meta.map { case (w, h, bd, ct, il) =>
      PngMeta(w, h, bd, ct, il, chunks, texts.toSeq)
    }
  }

  /** Splice a tEXt chunk (correct length + CRC) before IEND — the
    * in-engine generator for metadata-bearing test PNGs. */
  def withTextChunk(png: Array[Byte], key: String,
      value: String): Array[Byte] = {
    require(png.length >= 12, "not a png")
    val data = (key + "\u0000" + value).getBytes("ISO-8859-1")
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length)
    chunk.put("tEXt".getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(chunk.array(), 4, 4 + data.length)
    chunk.putInt(crc.getValue.toInt)
    val iend = png.length - 12 // IEND = len(0) + "IEND" + crc
    png.take(iend) ++ chunk.array() ++ png.drop(iend)
  }

  // ------------------------------------------------ JPEG segment walk

  /** Parsed JPEG structure: frame geometry from the first SOF, the
    * progressive flag, EXIF presence, and the first COM comment — the
    * dimensions/provenance fields an image-curation filter keys on
    * without ever entropy-decoding a scan. */
  final case class JpegMeta(
      width: Int, height: Int, precision: Int, components: Int,
      progressive: Int, n_segments: Int, has_exif: Int, comment: String)

  /** Byte-level JPEG marker-segment walk (the third sibling of the WAV
    * RIFF walk and the PNG chunk walk — structure, not pixels): SOI,
    * then FF-marker segments with big-endian self-inclusive lengths,
    * until SOS or EOI. Fill bytes (runs of FF before a marker) are
    * legal and skipped; standalone markers (TEM, RST0-7) carry no
    * length. The first SOFn (C0-CF minus DHT C4 / JPG C8 / DAC CC)
    * yields precision, height, width, component count, and
    * `progressive` = 1 for the progressive-DCT markers (C2/C6/CA/CE).
    * APP1 payloads opening with `Exif\0\0` set `has_exif`; the first
    * COM segment is the comment (ISO-8859-1, the classic encoding).
    * The walk STOPS at SOS — entropy-coded data follows, and finding
    * the next marker would need a byte-stuffing scan this
    * structure-reader has no business doing. Truncated segments,
    * lengths under 2, a missing SOI, or reaching SOS/EOI without a
    * SOF all return None rather than garbage geometry. */
  def parseJpeg(payload: Array[Byte]): Option[JpegMeta] = {
    if (payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8)
      return None
    def u16(o: Int): Int =
      ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
    var off = 2
    var meta: Option[(Int, Int, Int, Int, Int)] = None
    var comment: String = ""
    var sawComment = false
    var hasExif = 0
    var segments = 0
    while (true) {
      if (off + 2 > payload.length) return None
      if ((payload(off) & 0xff) != 0xff) return None
      // fill bytes: any run of FF before the marker byte is padding
      while (off + 1 < payload.length && (payload(off + 1) & 0xff) == 0xff)
        off += 1
      if (off + 2 > payload.length) return None
      val marker = payload(off + 1) & 0xff
      if (marker == 0x00) return None // stuffed byte, not a marker
      if (marker == 0xd9 || marker == 0xda) { // EOI / SOS: walk ends
        segments += 1
        return meta.map { case (p, h, w, nc, prog) =>
          JpegMeta(w, h, p, nc, prog, segments, hasExif, comment)
        }
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        segments += 1 // TEM / RSTn: standalone, no length
        off += 2
      } else {
        if (off + 4 > payload.length) return None
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > payload.length) return None
        segments += 1
        val dataOff = off + 4
        val dataLen = len - 2
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (dataLen < 6) return None
          if (meta.isEmpty) {
            val prog = if (marker == 0xc2 || marker == 0xc6 ||
              marker == 0xca || marker == 0xce) 1 else 0
            meta = Some((payload(dataOff) & 0xff, u16(dataOff + 1),
              u16(dataOff + 3), payload(dataOff + 5) & 0xff, prog))
          }
        } else if (marker == 0xe1 && dataLen >= 6 &&
            new String(payload, dataOff, 6, "ISO-8859-1") == "Exif\u0000\u0000") {
          hasExif = 1
        } else if (marker == 0xfe && !sawComment) {
          comment = new String(payload, dataOff, dataLen, "ISO-8859-1")
          sawComment = true
        }
        off += 2 + len
      }
    }
    None // unreachable
  }

  // -------------------------------------- EXIF TIFF IFD walk

  final case class ExifMeta(
      byte_order: String, n_ifd0: Long, make: String, model: String,
      orientation: Long, iso: Long, pixel_x: Long)

  /** EXIF APP1 payload builder (id-templated fixture for the IFD
    * walk): `Exif\0\0` + a TIFF stream in the CHOSEN byte order —
    * IFD0 {Make, Model, Orientation, ExifIFDPointer} with the ASCII
    * values in a data area past the directory, then the pointed-to
    * Exif sub-IFD {ISOSpeedRatings, PixelXDimension}. Both endians
    * mint, so the parser's order handling is actually exercised. */
  def exifApp1(littleEndian: Boolean, make: String, model: String,
      orientation: Int, iso: Int, pixelX: Long): Array[Byte] = {
    val mk = make.getBytes("ISO-8859-1") :+ 0.toByte
    val md = model.getBytes("ISO-8859-1") :+ 0.toByte
    val ifd0Off = 8
    val ifd0Len = 2 + 4 * 12 + 4
    val mkOff = ifd0Off + ifd0Len
    val mdOff = mkOff + mk.length
    val subOff = mdOff + md.length
    val subLen = 2 + 2 * 12 + 4
    val tiff = new Array[Byte](subOff + subLen)
    def w16(o: Int, v: Int): Unit =
      if (littleEndian) { tiff(o) = v.toByte; tiff(o + 1) = (v >> 8).toByte }
      else { tiff(o) = (v >> 8).toByte; tiff(o + 1) = v.toByte }
    def w32(o: Int, v: Long): Unit =
      if (littleEndian) (0 to 3).foreach(i =>
        tiff(o + i) = ((v >> (8 * i)) & 0xff).toByte)
      else (0 to 3).foreach(i =>
        tiff(o + i) = ((v >> (8 * (3 - i))) & 0xff).toByte)
    tiff(0) = (if (littleEndian) 'I' else 'M').toByte
    tiff(1) = tiff(0)
    w16(2, 42)
    w32(4, ifd0Off)
    // entry(tag, type, count, value-or-offset); SHORT values sit in
    // the first two bytes of the value field (file byte order)
    def entry(o: Int, tag: Int, typ: Int, count: Long,
        short: Option[Int], long: Option[Long]): Unit = {
      w16(o, tag); w16(o + 2, typ); w32(o + 4, count)
      short.foreach(v => w16(o + 8, v))
      long.foreach(v => w32(o + 8, v))
    }
    // spec-conformant inline rule: ASCII values whose byte count
    // (incl. NUL) fits the 4-byte field are packed INLINE, never
    // offset — short strings must exercise the parser's inline branch
    def asciiEntry(o: Int, tag: Int, bytes: Array[Byte],
        off: Int): Unit = {
      w16(o, tag); w16(o + 2, 2); w32(o + 4, bytes.length.toLong)
      if (bytes.length <= 4)
        System.arraycopy(bytes, 0, tiff, o + 8, bytes.length)
      else w32(o + 8, off.toLong)
    }
    w16(ifd0Off, 4)
    asciiEntry(ifd0Off + 2, 0x010f, mk, mkOff)
    asciiEntry(ifd0Off + 14, 0x0110, md, mdOff)
    entry(ifd0Off + 26, 0x0112, 3, 1L, Some(orientation), None)
    entry(ifd0Off + 38, 0x8769, 4, 1L, None, Some(subOff))
    w32(ifd0Off + 50, 0L) // next IFD: none
    if (mk.length > 4) System.arraycopy(mk, 0, tiff, mkOff, mk.length)
    if (md.length > 4) System.arraycopy(md, 0, tiff, mdOff, md.length)
    w16(subOff, 2)
    entry(subOff + 2, 0x8827, 3, 1L, Some(iso), None)
    entry(subOff + 14, 0xa002, 4, 1L, None, Some(pixelX))
    w32(subOff + 26, 0L)
    "Exif\u0000\u0000".getBytes("ISO-8859-1") ++ tiff
  }

  /** EXIF APP1 IFD walk (the fifth structure sibling beside the RIFF /
    * PNG / JPEG / ZIP walks — the metadata block a vision-data
    * pipeline reads for orientation normalization and camera-level
    * dedup without decoding a pixel): `Exif\0\0`, TIFF byte-order mark
    * (II little / MM big — BOTH handled), magic 42, then IFD0 entries
    * (tag, type, count, value-or-offset; values ≤ 4 bytes inline in
    * file order) for Make/Model (ASCII, NUL-stripped), Orientation
    * (SHORT), and the ExifIFDPointer into the sub-IFD for
    * ISOSpeedRatings (SHORT) and PixelXDimension (LONG). Any
    * structural violation — bad preamble, unknown order mark, magic ≠
    * 42, offsets past the payload — returns None, never garbage. */
  def parseExif(payload: Array[Byte]): Option[ExifMeta] = {
    if (payload.length < 14) return None
    if (new String(payload, 0, 6, "ISO-8859-1") != "Exif\u0000\u0000")
      return None
    val t = payload.drop(6)
    val order = new String(t, 0, 2, "ISO-8859-1")
    val little = order match {
      case "II" => true
      case "MM" => false
      case _ => return None
    }
    // o < 0 guard in BOTH: a corrupt offset ≥ 2^31 wraps negative via
    // .toInt at the call sites, and "negative + 2 > length" is false —
    // without the guard t(o) throws AIOOBE instead of honoring the
    // structural-violation-returns-None contract
    def u16(o: Int): Int =
      if (o < 0 || o + 2 > t.length) -1
      else if (little) (t(o) & 0xff) | ((t(o + 1) & 0xff) << 8)
      else ((t(o) & 0xff) << 8) | (t(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > t.length) -1L
      else if (little) (0 to 3).map(i => (t(o + i) & 0xffL) << (8 * i)).sum
      else (0 to 3).map(i => (t(o + i) & 0xffL) << (8 * (3 - i))).sum
    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 + 2 > t.length) return None
    def ascii(off: Long, count: Long): Option[String] = {
      if (off < 0 || count < 1 || off + count > t.length) return None
      val raw = new String(t, off.toInt, count.toInt, "ISO-8859-1")
      Some(raw.stripSuffix("\u0000"))
    }
    def walk(ifdOff: Long): Option[(Int, Map[Int, (Int, Long, Long)])] = {
      // Long-range check BEFORE .toInt: a sub-IFD pointer ≥ 2^31 (seen
      // in real malformed EXIF) must reject as a structural violation,
      // not wrap negative into the entry reads below
      if (ifdOff < 0 || ifdOff + 2 > t.length) return None
      val n = u16(ifdOff.toInt)
      if (n < 0 || ifdOff + 2 + n * 12 + 4 > t.length) return None
      val entries = (0 until n).map { i =>
        val e = (ifdOff + 2 + i * 12).toInt
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        val byteLen = typ match {
          case 1 | 2 | 7 => count
          case 3 => count * 2
          case 4 => count * 4
          case _ => 8L * count
        }
        // inline when the value fits the 4-byte field
        // inline when the value fits the 4-byte field: SHORTs read in
        // file order, BYTE/ASCII/UNDEFINED values ARE the field bytes
        // (value = their position, so ascii() reads them in place) —
        // treating a packed short string as an offset is the classic
        // TIFF-reader bug (garbage or a false reject on e.g. Make="LG")
        val value =
          if (byteLen <= 4) {
            if (typ == 3) u16(e + 8).toLong
            else if (typ == 1 || typ == 2 || typ == 7) (e + 8).toLong
            else u32(e + 8)
          } else u32(e + 8) // offset
        tag -> ((typ, count, value))
      }.toMap
      Some((n, entries))
    }
    for {
      (n0, ifd) <- walk(ifd0)
      mkE <- ifd.get(0x010f)
      mdE <- ifd.get(0x0110)
      orE <- ifd.get(0x0112)
      subPtr <- ifd.get(0x8769)
      make <- ascii(mkE._3, mkE._2)
      model <- ascii(mdE._3, mdE._2)
      (_, sub) <- walk(subPtr._3)
      isoE <- sub.get(0x8827)
      pxE <- sub.get(0xa002)
    } yield ExifMeta(order, n0.toLong, make, model, orE._3, isoE._3,
      pxE._3)
  }

  // -------------------------------------- ZIP central-directory walk

  /** One central-directory entry: the per-member metadata an archive
    * triage pass keys on without inflating anything. */
  final case class ZipEntryMeta(
      name: String, method: Int, compressed: Long, uncompressed: Long,
      crc32: Long)

  /** Parsed ZIP structure: entry count as the directory declares it,
    * plus the entries in directory order. */
  final case class ZipMeta(n_entries: Int, entries: Seq[ZipEntryMeta])

  /** ZIP central-directory walk (the fifth structure sibling — and the
    * container `sniffFormat` routes docx/epub/jar payloads to): scan
    * the tail for the end-of-central-directory record (`PK\5\6`,
    * comment-tolerant — the spec allows up to 64 KiB of trailing
    * comment, so the scan runs backwards from the end), read the
    * declared entry count and directory offset, then walk `PK\1\2`
    * central headers in place — name, method, sizes, CRC per member —
    * WITHOUT touching any compressed byte (the directory is the
    * archive's own index; listing costs O(entries), not O(bytes), the
    * same read-the-index-not-the-data stance as the store's footer
    * scans). Truncation, a missing/forged EOCD, offsets past the
    * payload, a header count mismatch, or name lengths over-running
    * the directory → None, never a partial listing. */
  def parseZip(payload: Array[Byte]): Option[ZipMeta] = {
    val n = payload.length
    if (n < 22) return None
    def u16(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    // EOCD: backwards scan (comment-tolerant), signature 50 4B 05 06
    var e = n - 22
    val floor = math.max(0, n - 22 - 65535)
    while (e >= floor && !((payload(e) & 0xff) == 0x50 &&
        (payload(e + 1) & 0xff) == 0x4b && (payload(e + 2) & 0xff) == 0x05 &&
        (payload(e + 3) & 0xff) == 0x06)) e -= 1
    if (e < floor) return None
    val count = u16(e + 10)
    val cdOff = u32(e + 16)
    if (cdOff > e) return None // directory cannot start past the EOCD
    var off = cdOff.toInt
    val entries = scala.collection.mutable.Buffer[ZipEntryMeta]()
    var i = 0
    while (i < count) {
      if (off + 46 > n) return None
      if (!((payload(off) & 0xff) == 0x50 && (payload(off + 1) & 0xff) == 0x4b &&
          (payload(off + 2) & 0xff) == 0x01 && (payload(off + 3) & 0xff) == 0x02))
        return None
      val method = u16(off + 10)
      val crc = u32(off + 16)
      val csize = u32(off + 20)
      val usize = u32(off + 24)
      val nameLen = u16(off + 28)
      val extraLen = u16(off + 30)
      val commentLen = u16(off + 32)
      if (off + 46 + nameLen + extraLen + commentLen > n) return None
      val name = new String(payload, off + 46, nameLen, "UTF-8")
      entries += ZipEntryMeta(name, method, csize, usize, crc)
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(ZipMeta(count, entries.toSeq))
  }

  /** Build a STORED (method 0) zip — local headers, central directory,
    * EOCD, real CRC32s — the in-engine generator for directory-walk
    * tests; `java.util.zip` can read what it emits (spec cross-check). */
  def zipBytes(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      buf.write((v & 0xff).toInt); buf.write(((v >> 8) & 0xff).toInt)
      buf.write(((v >> 16) & 0xff).toInt); buf.write(((v >> 24) & 0xff).toInt)
    }
    val locals = files.map { case (name, data) =>
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val offset = buf.size()
      buf.write(Array[Byte](0x50, 0x4b, 0x03, 0x04), 0, 4)
      u16(20); u16(0); u16(0); u16(0); u16(0) // version/flags/method/time/date
      u32(crc.getValue); u32(data.length.toLong); u32(data.length.toLong)
      val nb = name.getBytes("UTF-8")
      u16(nb.length); u16(0)
      buf.write(nb, 0, nb.length)
      buf.write(data, 0, data.length)
      (name, data, crc.getValue, offset)
    }
    val cdStart = buf.size()
    locals.foreach { case (name, data, crc, offset) =>
      buf.write(Array[Byte](0x50, 0x4b, 0x01, 0x02), 0, 4)
      u16(20); u16(20); u16(0); u16(0); u16(0); u16(0)
      u32(crc); u32(data.length.toLong); u32(data.length.toLong)
      val nb = name.getBytes("UTF-8")
      u16(nb.length); u16(0); u16(0); u16(0); u16(0)
      u32(0); u32(offset.toLong)
      buf.write(nb, 0, nb.length)
    }
    val cdSize = buf.size() - cdStart
    buf.write(Array[Byte](0x50, 0x4b, 0x05, 0x06), 0, 4)
    u16(0); u16(0); u16(files.length); u16(files.length)
    u32(cdSize.toLong); u32(cdStart.toLong); u16(0)
    buf.toByteArray
  }

  // ------------------------------------------------- GIF block walk

  /** Parsed GIF structure: logical-screen geometry, version, global
    * color-table size, FRAME COUNT (the animation signal image dedup
    * and frame-sampling key on), the first graphic-control delay in
    * centiseconds, the NETSCAPE loop count (-1 when the extension is
    * absent — a plain still), and the first comment extension. */
  final case class GifMeta(
      width: Int, height: Int, version: String, gct_colors: Int,
      n_frames: Int, delay_cs: Int, loop_count: Int, comment: String)

  /** Byte-level GIF block walk (the fourth structure sibling after WAV
    * RIFF, PNG chunks and JPEG markers): `GIF87a`/`GIF89a` header,
    * logical screen descriptor (little-endian geometry, global
    * color-table skipped by its declared size), then blocks to the
    * 0x3B trailer — 0x2C image descriptors (local color table + LZW
    * sub-blocks skipped, each one counted as a frame) and 0x21
    * extensions (graphic control 0xF9 → first delay; application
    * 0xFF `NETSCAPE2.0` → loop count; comment 0xFE → first comment;
    * sub-block chains walked by length byte to their 0 terminator).
    * Truncation, a foreign signature, an unknown block introducer, or
    * bytes ending before the trailer → None, never garbage. */
  def parseGif(payload: Array[Byte]): Option[GifMeta] = {
    if (payload.length < 13) return None
    val hdr = new String(payload, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u16(o: Int): Int = // GIF is little-endian, unlike PNG/JPEG
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = payload(10) & 0xff
    val gctColors =
      if ((packed & 0x80) != 0) 2 << (packed & 0x07) else 0
    var off = 13 + 3 * gctColors
    var frames = 0
    var delay = 0; var sawDelay = false
    var loop = -1
    var comment = ""; var sawComment = false
    // walk a length-prefixed sub-block chain; returns the offset past
    // its 0 terminator, or -1 when it runs off the payload
    def subBlocks(start: Int,
        sink: java.io.ByteArrayOutputStream): Int = {
      var o = start
      while (true) {
        if (o >= payload.length) return -1
        val len = payload(o) & 0xff
        if (len == 0) return o + 1
        if (o + 1 + len > payload.length) return -1
        if (sink != null) sink.write(payload, o + 1, len)
        o += 1 + len
      }
      -1 // unreachable
    }
    while (off < payload.length) {
      (payload(off) & 0xff) match {
        case 0x3b => // trailer
          return Some(GifMeta(w, h, hdr.substring(3), gctColors,
            frames, delay, loop, comment))
        case 0x2c => // image descriptor: one frame
          if (off + 10 > payload.length) return None
          val ipacked = payload(off + 9) & 0xff
          val lct = if ((ipacked & 0x80) != 0) 2 << (ipacked & 0x07)
            else 0
          val dataOff = off + 10 + 3 * lct
          if (dataOff + 1 > payload.length) return None
          // LZW minimum code size byte, then the coded sub-blocks
          val next = subBlocks(dataOff + 1, null)
          if (next < 0) return None
          frames += 1
          off = next
        case 0x21 => // extension: label + sub-block chain
          if (off + 2 > payload.length) return None
          val label = payload(off + 1) & 0xff
          val buf = new java.io.ByteArrayOutputStream()
          val next = subBlocks(off + 2, buf)
          if (next < 0) return None
          val data = buf.toByteArray
          if (label == 0xf9 && !sawDelay && data.length >= 4) {
            delay = (data(1) & 0xff) | ((data(2) & 0xff) << 8)
            sawDelay = true
          } else if (label == 0xff && data.length >= 11 &&
              new String(data, 0, 11, "US-ASCII") == "NETSCAPE2.0" &&
              data.length >= 14 && (data(11) & 0xff) == 1) {
            loop = (data(12) & 0xff) | ((data(13) & 0xff) << 8)
          } else if (label == 0xfe && !sawComment) {
            comment = new String(data, "ISO-8859-1")
            sawComment = true
          }
          off = next
        case _ => return None // unknown block introducer
      }
    }
    None // ran out of bytes before the trailer
  }

  /** Build a structurally complete GIF (header, LSD + 2-color global
    * table, optional NETSCAPE loop extension, optional comment, per
    * frame a graphic-control extension + image descriptor + token LZW
    * sub-block, trailer) — the in-engine generator for block-walk
    * tests. Not a pixel encoder. */
  def gifBytes(width: Int, height: Int, frames: Int, delayCs: Int,
      loopCount: Int, comment: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    buf.write(0x80) // GCT present, size bits 0 -> 2 colors
    buf.write(0); buf.write(0)
    buf.write(Array.fill[Byte](6)(0x11), 0, 6) // the 2-color table
    if (loopCount >= 0) {
      buf.write(0x21); buf.write(0xff); buf.write(11)
      buf.write("NETSCAPE2.0".getBytes("US-ASCII"))
      buf.write(3); buf.write(1); u16(loopCount); buf.write(0)
    }
    if (comment.nonEmpty) {
      buf.write(0x21); buf.write(0xfe)
      val c = comment.getBytes("ISO-8859-1")
      buf.write(c.length); buf.write(c, 0, c.length); buf.write(0)
    }
    var f = 0
    while (f < frames) {
      buf.write(0x21); buf.write(0xf9); buf.write(4) // graphic control
      buf.write(0); u16(delayCs); buf.write(0); buf.write(0)
      buf.write(0x2c) // image descriptor, no local color table
      u16(0); u16(0); u16(width); u16(height); buf.write(0)
      buf.write(2) // LZW minimum code size
      buf.write(2); buf.write(0x4c); buf.write(0x05) // token sub-block
      buf.write(0)
      f += 1
    }
    buf.write(0x3b)
    buf.toByteArray
  }

  /** Build the marker-segment head of a JPEG (SOI, JFIF APP0, optional
    * EXIF APP1, COM, SOFn, SOS + token entropy bytes + EOI) with
    * correct lengths — the in-engine generator for structure-walk
    * tests. Not a pixel encoder: the walk never reads past SOS. */
  def jpegHeader(width: Int, height: Int, components: Int,
      progressive: Boolean, comment: String,
      exif: Boolean): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, data: Array[Byte]): Unit = {
      buf.write(0xff); buf.write(marker)
      val len = data.length + 2
      buf.write((len >> 8) & 0xff); buf.write(len & 0xff)
      buf.write(data, 0, data.length)
    }
    buf.write(0xff); buf.write(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 2, 0,
      0, 1, 0, 1, 0, 0))
    if (exif)
      seg(0xe1, "Exif\u0000\u0000".getBytes("ISO-8859-1") ++
        Array.fill[Byte](8)(0))
    seg(0xfe, comment.getBytes("ISO-8859-1"))
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(components)
    var c = 1
    while (c <= components) {
      sof.write(c); sof.write(0x11); sof.write(0); c += 1
    }
    seg(if (progressive) 0xc2 else 0xc0, sof.toByteArray)
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(components)
    c = 1
    while (c <= components) { sos.write(c); sos.write(0); c += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    seg(0xda, sos.toByteArray)
    // token entropy-coded bytes + EOI past the walk's stopping point
    buf.write(0x12); buf.write(0x34)
    buf.write(0xff); buf.write(0xd9)
    buf.toByteArray
  }
}
