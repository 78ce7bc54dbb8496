package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Multimodal-plumbing queries: binary payloads are built from `documents`
  * text bytes (the only deterministic "media" available), run through the
  * real partition-batched codec path with the stub decoder, and checked
  * against oracles that recompute the stub's arithmetic on the same bytes
  * — proving the schema, batching, and offset math, which is the part
  * Spark owns regardless of codec. */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) = {
    import s.implicits._
    Graft.table(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id, kind, text.getBytes("UTF-8"), src)
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column -> partition-batched decode -> typed metadata
    "media_meta" -> ((s, dir) =>
      Multimodal.extractMeta(media(s, dir)).toDF()),

    // frame sampling: every 2nd 64-byte chunk, max 5 frames per item
    "media_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), chunkBytes = 64, stride = 2,
        maxFrames = 5)
        .select(col("media_id"), col("frame_idx"), col("byte_offset"),
          length(col("frame_bytes")).as("frame_len"))),

    // content-hash dedup over the media table
    "media_dedup" -> ((s, dir) =>
      Multimodal.dedupByContent(Multimodal.extractMeta(media(s, dir)))),

    // Perceptual difference hash over the stub-decoded 9×8 grid (byte
    // values as grayscale — the codec boundary; the dHash math itself
    // is the real algorithm): the oracle recomputes every bit from the
    // same characters, padding past the text length as 0. Feed the
    // fingerprints to Dedup.simhashNearDuplicates for banded hamming
    // near-dup pairing (P4's machinery, already gated).
    "media_phash" -> ((s, dir) => {
      val gray = expr("transform(sequence(1, 72), i -> " +
        "CASE WHEN i <= length(text) THEN ascii(substring(text, i, 1)) " +
        "ELSE 0 END)")
      Graft.table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          Multimodal.dHash64(gray).as("dhash"))
    }),

    // Perceptual NEAR-dup pairing over the media corpus — the missing
    // half of media_dedup (content-hash catches only byte-identical
    // files; a re-encoded/one-pixel-off copy needs the perceptual
    // fingerprint): dHash fingerprints feed the SAME pigeonhole-blocked
    // pair machinery text SimHash uses (Dedup.simhashNearDuplicates —
    // exact for hamming ≤ 3, never all-pairs). Every item gets a
    // planted one-character variant (one gray cell moves → ≤ 2 dhash
    // bits), so each contributes at least one pair; the oracle replays
    // the hash and the full quadratic hamming truth.
    "media_neardup" -> ((s, dir) => {
      val gray = expr("transform(sequence(1, 72), i -> " +
        "CASE WHEN i <= length(text) THEN ascii(substring(text, i, 1)) " +
        "ELSE 0 END)")
      val base = Graft.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = base.unionAll(base.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 35), lit("@"),
          substring(col("text"), 37, 36)).as("text")))
      val fps = variants.select(col("doc_id").as("media_id"),
        Multimodal.dHash64(gray).as("dhash"))
      graft.operators.Dedup.simhashNearDuplicates(fps, "media_id",
        "dhash", maxDist = 3)
    }),

    // TRUE pixel decode end-to-end: an 18×16 grayscale PNG is generated
    // in-engine from a doc_id-seeded template grid, decoded back through
    // the JDK ImageIO codec (PNG is lossless), area-averaged to the 9×8
    // dHash grid (each cell the floor-mean of its 2×2 block), and
    // dHashed. The oracle recomputes the same PIXEL MATH from the
    // template — the file format cancels out, the arithmetic doesn't.
    "media_decode" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val png = Multimodal.grayPng(18, 16,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          val img = Multimodal.decodeImage(png).get
          (id, img.getWidth, img.getHeight,
            Multimodal.gray9x8(img).toSeq)
        })
        .toDF("media_id", "width", "height", "gray")
        .select(col("media_id"), col("width"), col("height"),
          concat_ws(",", col("gray")).as("gray_csv"),
          Multimodal.dHash64(col("gray")).as("dhash"))
    }),

    // TRUE audio decode end-to-end: a mono 16-bit RIFF/WAVE payload is
    // generated in-engine from a doc_id-seeded sample template, parsed
    // back byte-by-byte (WAV PCM needs no codec — the RIFF chunk walk
    // is the decoder), and reduced to the exact-integer feature vector
    // curation filters key on. PCM is lossless, so the file format
    // cancels and the oracle replays the TEMPLATE arithmetic — what's
    // checked is the chunk-walk + sample decode + feature math.
    "media_wav" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 120 + (id % 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 37 + i * 101) % 4001) - 2000).toInt)
          val w = Multimodal.parseWav(
            Multimodal.pcmWav(8000, 1, samples)).get
          val f = Multimodal.wavFeatures(w)
          (id, f.sample_rate, f.channels, f.bits_per_sample, f.n_samples,
            f.duration_us, f.peak, f.energy, f.zero_crossings, f.clipped)
        })
        .toDF("media_id", "sample_rate", "channels", "bits_per_sample",
          "n_samples", "duration_us", "peak", "energy", "zero_crossings",
          "clipped")
    }),

    // Waveform difference hash over the same decoded samples: 65
    // |sample| windows (gray9x8's boundary rule) compared as exact
    // cross-multiplied means — dHash's audio sibling, banding through
    // the same hamming join. Oracle replays window boundaries, sums,
    // sizes and every bit from the template.
    "media_whash" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 120 + (id % 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 37 + i * 101) % 4001) - 2000).toInt)
          val w = Multimodal.parseWav(
            Multimodal.pcmWav(8000, 1, samples)).get
          val (sums, sizes) = Multimodal.waveWindows65(w)
          (id, sums.toSeq, sizes.toSeq)
        })
        .toDF("media_id", "ws", "wc")
        .select(col("media_id"),
          concat_ws(",", col("ws")).as("win_csv"),
          Multimodal.waveHash64(col("ws"), col("wc")).as("whash"))
    }),

    // Magic-byte content-type sniffing over 12 in-engine payload
    // shapes: nine real signatures, a truncated-magic payload (invalid
    // UTF-8 head -> bin), a RIFF container with the WRONG form type
    // (the both-positions guard; its NUL size bytes class it bin), and
    // plain text. The oracle states the expected verdict from the same
    // id arithmetic.
    "media_sniff" -> ((s, dir) => {
      val t = encode(col("text"), "UTF-8")
      val payload = (col("doc_id") % 12)
        .cast("int") match { case m =>
          when(m === 0, concat(unhex(lit("89504E470D0A1A0A")), t))
            .when(m === 1, concat(unhex(lit("FFD8FFE0")), t))
            .when(m === 2, concat(encode(lit("GIF89a"), "UTF-8"), t))
            .when(m === 3, concat(encode(lit("RIFF"), "UTF-8"),
              unhex(lit("10000000")), encode(lit("WAVE"), "UTF-8"), t))
            .when(m === 4, concat(encode(lit("RIFF"), "UTF-8"),
              unhex(lit("10000000")), encode(lit("AVI "), "UTF-8"), t))
            .when(m === 5, concat(unhex(lit("1F8B08")), t))
            .when(m === 6, concat(unhex(lit("504B0304")), t))
            .when(m === 7, concat(encode(lit("%PDF-1.4 "), "UTF-8"), t))
            .when(m === 8, concat(unhex(lit("EFBBBF")),
              encode(lit("  <!DOCTYPE html><p>"), "UTF-8"), t))
            .when(m === 9, concat(unhex(lit("8950")), t))
            .when(m === 10, concat(encode(lit("RIFF"), "UTF-8"),
              unhex(lit("10000000")), encode(lit("JUNK"), "UTF-8"), t))
            .otherwise(t)
        }
      Graft.table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          Multimodal.sniffFormat(payload).as("format"))
    }),

    // PNG chunk-walk metadata (the image sibling of the WAV RIFF walk,
    // structure not pixels): an id-sized grayscale PNG gets two tEXt
    // chunks spliced in (length + CRC32 computed, the real spec
    // layout), and the parser must CRC-verify every chunk and read
    // IHDR geometry + the key/NUL/value texts back. Oracle states the
    // template values.
    "media_pngmeta" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val png = Multimodal.withTextChunk(
            Multimodal.withTextChunk(
              Multimodal.grayPng(8 + (id % 9).toInt, 5 + (id % 7).toInt,
                (x, y) => (id + x * 3 + y * 5).toInt),
              "source", s"doc-$id"),
            "generator", "graft")
          val m = Multimodal.parsePng(png).get
          (id, m.width, m.height, m.bit_depth, m.color_type, m.interlace,
            m.texts.length.toLong,
            m.texts.map { case (k, v) => s"$k=$v" }.mkString(";"))
        })
        .toDF("media_id", "width", "height", "bit_depth", "color_type",
          "interlace", "n_texts", "texts_csv")
    }),

    // JPEG marker-segment walk (the third structure-walk sibling after
    // WAV RIFF and PNG chunks): an id-templated marker head (JFIF APP0,
    // optional EXIF APP1, COM, SOF0/SOF2, SOS) is generated with
    // correct big-endian lengths and walked back — geometry from SOF,
    // the progressive flag from the marker, EXIF via its signature,
    // comment from COM, and the walk STOPS at SOS (entropy data is not
    // a structure-reader's business). Oracle states every field from
    // the template.
    // EXIF APP1 IFD walk (fifth structure sibling): an id-templated
    // TIFF stream — BOTH byte orders mint (even ids II, odd MM) — with
    // IFD0 Make/Model/Orientation and the pointed-to Exif sub-IFD's
    // ISO and PixelXDimension walked back out. Oracle states every
    // field from the template.
    "media_exif" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val b = Multimodal.exifApp1(id % 2 == 0, s"cam-${id % 7}",
            s"mod-${id % 11}", 1 + (id % 8).toInt,
            100 + (id % 400).toInt, 640L + id % 1280)
          val m = Multimodal.parseExif(b).get
          (id, m.byte_order, m.n_ifd0, m.make, m.model, m.orientation,
            m.iso, m.pixel_x)
        })
        .toDF("media_id", "byte_order", "n_ifd0", "make", "model",
          "orientation", "iso", "pixel_x")
    }),

    "media_jpegmeta" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val j = Multimodal.jpegHeader(
            100 + (id % 523).toInt, 80 + (id % 411).toInt,
            1 + 2 * (id % 2).toInt, id % 3 == 0,
            s"cam-${id % 7};doc-$id", id % 4 == 0)
          val m = Multimodal.parseJpeg(j).get
          (id, m.width, m.height, m.precision, m.components,
            m.progressive, m.n_segments, m.has_exif, m.comment)
        })
        .toDF("media_id", "width", "height", "sof_precision",
          "components", "progressive", "n_segments", "has_exif",
          "comment")
    }),

    // GIF block walk (fourth structure sibling): an id-templated
    // animation (global color table, optional NETSCAPE loop, optional
    // comment, per-frame graphic-control + image-descriptor + LZW
    // sub-blocks) walked back to geometry, frame count, first delay,
    // loop count and comment. Oracle states every field from the
    // template.
    "media_gifmeta" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val g = Multimodal.gifBytes(
            20 + (id % 100).toInt, 10 + (id % 80).toInt,
            1 + (id % 4).toInt, (id % 30).toInt,
            if (id % 2 == 0) (id % 6).toInt else -1,
            if (id % 3 == 0) "" else s"gif-${id % 9}")
          val m = Multimodal.parseGif(g).get
          (id, m.width, m.height, m.version, m.gct_colors, m.n_frames,
            m.delay_cs, m.loop_count, m.comment)
        })
        .toDF("media_id", "width", "height", "version", "gct_colors",
          "n_frames", "delay_cs", "loop_count", "comment")
    }),

    // ZIP central-directory walk (fifth structure sibling; the
    // container behind docx/epub/jar payloads): an id-templated STORED
    // archive's directory is walked back to entry names, methods and
    // sizes without touching a compressed byte — listing costs
    // O(entries). CRC is pinned in the spec against java.util.zip
    // (DuckDB has no crc32); the oracle states names/sizes/count from
    // the template.
    "media_zipmeta" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val files = (0 until (1 + (id % 3)).toInt).map { k =>
            (s"f$k-$id.txt",
              Array.fill[Byte](5 + ((id + k) % 9).toInt)('x'))
          }
          val m = Multimodal.parseZip(Multimodal.zipBytes(files)).get
          (id, m.n_entries.toLong,
            m.entries.map(_.name).mkString(";"),
            m.entries.map(_.method).mkString(";"),
            m.entries.map(_.uncompressed).mkString(";"))
        })
        .toDF("media_id", "n_entries", "names", "methods", "sizes")
    }),

    // General resize: the decoded 18×16 template image resamples to an
    // id-sized target grid (3-7 × 2-5 — non-divisor geometries, so
    // cells straddle uneven source spans); the oracle replays the
    // area-average (floor boundaries, floor mean) per cell.
    "media_resize" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val png = Multimodal.grayPng(18, 16,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          val img = Multimodal.decodeImage(png).get
          val ow = 3 + (id % 5).toInt
          val oh = 2 + (id % 4).toInt
          (id, ow, oh,
            Multimodal.grayResample(img, ow, oh).mkString(","))
        })
        .toDF("media_id", "out_w", "out_h", "grid_csv")
    }),

    // Audio downsampling: the decoded waveform decimates by an id-sized
    // factor through the boxcar mean (truncating division — the JVM and
    // DuckDB // agree on signed operands); the oracle replays rate,
    // frame count, the head samples and the energy of the downsampled
    // signal.
    "media_downsample" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 120 + (id % 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 37 + i * 101) % 4001) - 2000).toInt)
          val w = Multimodal.parseWav(
            Multimodal.pcmWav(8000, 1, samples)).get
          val d = Multimodal.downsampleWav(w, 2 + (id % 3).toInt)
          (id, d.sample_rate, d.samples.length.toLong,
            d.samples.take(12).mkString(","),
            d.samples.map(x => x.toLong * x).sum)
        })
        .toDF("media_id", "out_rate", "out_frames", "head_csv",
          "out_energy")
    }),

    // Energy-gated activity segmentation (the VAD shape): synthetic
    // speech-like PCM — 25-frame windows alternate quiet (|s| ≤ 400)
    // and boosted (+3000) blocks on an id-keyed pattern — round-trips
    // the real WAV codec, segments under the exact mean-square gate,
    // explodes one row per segment. Oracle replays the sample formula,
    // per-window energies, and the gaps-and-islands coalescing.
    "media_segments" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { id =>
          val n = 200 + (id % 37).toInt
          val samples = Array.tabulate(n) { i =>
            val base = (((id * 31 + i * 17) % 801) - 400).toInt
            if ((id + i / 25) % 5 < 2) base + 3000 else base
          }
          val w = Multimodal.parseWav(
            Multimodal.pcmWav(8000, 1, samples)).get
          Multimodal.energySegments(w, windowFrames = 25,
            meanSqThreshold = 250000L).map(g =>
            (id, g.seg_idx, g.start_frame, g.end_frame, g.n_windows,
              g.energy))
        })
        .toDF("media_id", "seg_idx", "start_frame", "end_frame",
          "n_windows", "energy")
    }),

    // Per-patch sufficient statistics (the ViT-ingest patch pass) over
    // the true PNG decode: 18×16 gray pixels in 5×5 tiles — ragged
    // right/bottom edges exercised — emitting exact integer sum/sum²
    // numerators per patch. Oracle replays the pixel formula and the
    // patch sums.
    "media_patches" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { id =>
          val png = Multimodal.grayPng(18, 16,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          val img = Multimodal.decodeImage(png).get
          val grid = Multimodal.grayResample(img, 18, 16)
          Multimodal.grayPatchStats(grid, w = 18, p = 5).map(t =>
            (id, t.patch_row, t.patch_col, t.n_px, t.px_sum, t.px_sum_sq))
        })
        .toDF("media_id", "patch_row", "patch_col", "n_px", "px_sum",
          "px_sum_sq")
    }),

    // Average hash over the SAME true-pixel decode path as media_decode
    // (the aHash/dHash pair near-dup pipelines band together): bit =
    // cell·64 > subgrid sum, exact integers; oracle replays the template
    // area-average then the aHash arithmetic.
    "media_ahash" -> ((s, dir) => {
      import s.implicits._
      Graft.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val png = Multimodal.grayPng(18, 16,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          (id, Multimodal.decodeGray9x8(png).get.toSeq)
        })
        .toDF("media_id", "gray")
        .select(col("media_id"),
          Multimodal.aHash64(col("gray")).as("ahash"))
    }),
  )

  private val kindExpr =
    """CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |     ELSE 'video' END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "media_meta" ->
      s"""SELECT doc_id AS media_id,
         |       $kindExpr AS kind,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       md5(text) AS content_hash,
         |       16 + (ascii(substr(text, 1, 1)) % 240) AS width,
         |       16 + (ascii(substr(text, 2, 1)) % 240) AS height,
         |       CAST(CASE doc_id % 3
         |         WHEN 2 THEN 1 + octet_length(encode(text)) % 32
         |         WHEN 1 THEN 1 + octet_length(encode(text)) % 16
         |         ELSE 1 END AS INTEGER) AS n_frames
         |FROM documents
         |""".stripMargin,

    "media_frames" ->
      """WITH n AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS len,
        |         least(5, (octet_length(encode(text)) + 127) // 128)
        |           AS n_frames
        |  FROM documents)
        |SELECT media_id,
        |       CAST(i AS INTEGER) AS frame_idx,
        |       CAST(i * 128 AS INTEGER) AS byte_offset,
        |       CAST(least(64, len - i * 128) AS INTEGER) AS frame_len
        |FROM n, UNNEST(generate_series(0, n_frames - 1)) AS t(i)
        |""".stripMargin,

    "media_dedup" ->
      """SELECT md5(text) AS content_hash,
        |       MIN(doc_id) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies,
        |       CAST(octet_length(encode(MIN(text))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1
        |""".stripMargin,

    "media_decode" ->
      """WITH cells AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(0, 72), i ->
        |      ( ((doc_id*31 + ((i % 9)*2)*7     + ((i // 9)*2)*13)     % 256)
        |      + ((doc_id*31 + ((i % 9)*2 + 1)*7 + ((i // 9)*2)*13)     % 256)
        |      + ((doc_id*31 + ((i % 9)*2)*7     + ((i // 9)*2 + 1)*13) % 256)
        |      + ((doc_id*31 + ((i % 9)*2 + 1)*7 + ((i // 9)*2 + 1)*13) % 256)
        |      ) // 4) AS gray
        |  FROM documents)
        |SELECT media_id,
        |  CAST(18 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        |  array_to_string(gray, ',') AS gray_csv,
        |  array_to_string(list_transform(range(0, 64), b ->
        |    CASE WHEN gray[(b // 8) * 9 + (b % 8) + 1] <
        |              gray[(b // 8) * 9 + (b % 8) + 2]
        |         THEN '1' ELSE '0' END), '') AS dhash
        |FROM cells
        |""".stripMargin,

    "media_wav" ->
      """WITH t AS (
        |  SELECT doc_id AS media_id, 120 + (doc_id % 50) AS n,
        |    list_transform(range(0, 120 + (doc_id % 50)), i ->
        |      ((doc_id*37 + i*101) % 4001) - 2000) AS s
        |  FROM documents)
        |SELECT media_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(16 AS INTEGER) AS bits_per_sample,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 1000000 // 8000 AS BIGINT) AS duration_us,
        |  CAST(list_max(list_transform(s, x -> abs(x))) AS INTEGER) AS peak,
        |  CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS energy,
        |  CAST(list_sum(list_transform(range(1, n), i ->
        |    CASE WHEN s[i] * s[i+1] < 0 THEN 1 ELSE 0 END)) AS BIGINT)
        |    AS zero_crossings,
        |  CAST(list_sum(list_transform(s, x ->
        |    CASE WHEN x >= 32767 OR x <= -32768 THEN 1 ELSE 0 END))
        |    AS BIGINT) AS clipped
        |FROM t
        |""".stripMargin,

    "media_whash" ->
      """WITH t AS (
        |  SELECT doc_id AS media_id, 120 + (doc_id % 50) AS n,
        |    list_transform(range(0, 120 + (doc_id % 50)), i ->
        |      ((doc_id*37 + i*101) % 4001) - 2000) AS s
        |  FROM documents),
        |w AS (
        |  SELECT media_id,
        |    list_transform(range(0, 65), k ->
        |      list_sum(list_transform(range(k*n//65,
        |          least(n, greatest(k*n//65 + 1, (k+1)*n//65))),
        |          x -> abs(s[x+1])))) AS ws,
        |    list_transform(range(0, 65), k ->
        |      least(n, greatest(k*n//65 + 1, (k+1)*n//65)) - k*n//65)
        |      AS wc
        |  FROM t)
        |SELECT media_id,
        |  array_to_string(ws, ',') AS win_csv,
        |  array_to_string(list_transform(range(0, 64), i ->
        |    CASE WHEN ws[i+1] * wc[i+2] < ws[i+2] * wc[i+1]
        |         THEN '1' ELSE '0' END), '') AS whash
        |FROM w
        |""".stripMargin,

    "media_sniff" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 12 AS INTEGER)
        |    WHEN 0 THEN 'png'  WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |    WHEN 3 THEN 'wav'  WHEN 4 THEN 'avi'  WHEN 5 THEN 'gzip'
        |    WHEN 6 THEN 'zip'  WHEN 7 THEN 'pdf'  WHEN 8 THEN 'html'
        |    WHEN 9 THEN 'bin'  WHEN 10 THEN 'bin'
        |    ELSE 'text' END AS format
        |FROM documents
        |""".stripMargin,

    "media_pngmeta" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 9 AS INTEGER) AS width,
        |  CAST(5 + doc_id % 7 AS INTEGER) AS height,
        |  CAST(8 AS INTEGER) AS bit_depth,
        |  CAST(0 AS INTEGER) AS color_type,
        |  CAST(0 AS INTEGER) AS interlace,
        |  CAST(2 AS BIGINT) AS n_texts,
        |  'source=doc-' || CAST(doc_id AS VARCHAR) || ';generator=graft'
        |    AS texts_csv
        |FROM documents
        |""".stripMargin,

    "media_zipmeta" ->
      """WITH e AS (
        |  SELECT doc_id, k
        |  FROM documents, UNNEST(generate_series(0, 2)) AS g(k)
        |  WHERE k < 1 + doc_id % 3)
        |SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_entries,
        |  string_agg('f' || CAST(k AS VARCHAR) || '-' ||
        |    CAST(doc_id AS VARCHAR) || '.txt', ';' ORDER BY k) AS names,
        |  string_agg('0', ';' ORDER BY k) AS methods,
        |  string_agg(CAST(5 + (doc_id + k) % 9 AS VARCHAR), ';'
        |    ORDER BY k) AS sizes
        |FROM e GROUP BY doc_id
        |""".stripMargin,

    "media_gifmeta" ->
      """SELECT doc_id AS media_id,
        |  CAST(20 + doc_id % 100 AS INTEGER) AS width,
        |  CAST(10 + doc_id % 80 AS INTEGER) AS height,
        |  '89a' AS version,
        |  CAST(2 AS INTEGER) AS gct_colors,
        |  CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
        |  CAST(doc_id % 30 AS INTEGER) AS delay_cs,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 6 ELSE -1 END
        |    AS INTEGER) AS loop_count,
        |  CASE WHEN doc_id % 3 = 0 THEN ''
        |    ELSE 'gif-' || CAST(doc_id % 9 AS VARCHAR) END AS comment
        |FROM documents
        |""".stripMargin,

    "media_exif" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
        |    AS byte_order,
        |  CAST(4 AS BIGINT) AS n_ifd0,
        |  'cam-' || CAST(doc_id % 7 AS VARCHAR) AS make,
        |  'mod-' || CAST(doc_id % 11 AS VARCHAR) AS model,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |  CAST(100 + doc_id % 400 AS BIGINT) AS iso,
        |  CAST(640 + doc_id % 1280 AS BIGINT) AS pixel_x
        |FROM documents
        |""".stripMargin,

    "media_jpegmeta" ->
      """SELECT doc_id AS media_id,
        |  CAST(100 + doc_id % 523 AS INTEGER) AS width,
        |  CAST(80 + doc_id % 411 AS INTEGER) AS height,
        |  CAST(8 AS INTEGER) AS sof_precision,
        |  CAST(1 + 2 * (doc_id % 2) AS INTEGER) AS components,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER)
        |    AS progressive,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 5 ELSE 4 END AS INTEGER)
        |    AS n_segments,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
        |    AS has_exif,
        |  'cam-' || CAST(doc_id % 7 AS VARCHAR) || ';doc-' ||
        |    CAST(doc_id AS VARCHAR) AS comment
        |FROM documents
        |""".stripMargin,

    "media_resize" ->
      """WITH g AS (
        |  SELECT doc_id AS media_id,
        |    CAST(3 + doc_id % 5 AS INTEGER) AS ow,
        |    CAST(2 + doc_id % 4 AS INTEGER) AS oh
        |  FROM documents)
        |SELECT media_id, ow AS out_w, oh AS out_h,
        |  array_to_string(list_transform(range(0, ow * oh), i ->
        |    list_sum(flatten(list_transform(
        |      range((i % ow) * 18 // ow,
        |            least(18, greatest((i % ow) * 18 // ow + 1,
        |                               ((i % ow) + 1) * 18 // ow))), x ->
        |      list_transform(
        |        range((i // ow) * 16 // oh,
        |              least(16, greatest((i // ow) * 16 // oh + 1,
        |                                 ((i // ow) + 1) * 16 // oh))), y ->
        |        (media_id*31 + x*7 + y*13) % 256))))
        |    // ((least(18, greatest((i % ow) * 18 // ow + 1,
        |                            ((i % ow) + 1) * 18 // ow))
        |        - (i % ow) * 18 // ow)
        |     * (least(16, greatest((i // ow) * 16 // oh + 1,
        |                           ((i // ow) + 1) * 16 // oh))
        |        - (i // ow) * 16 // oh))), ',') AS grid_csv
        |FROM g
        |""".stripMargin,

    "media_downsample" ->
      """WITH t AS (
        |  SELECT doc_id AS media_id, 120 + (doc_id % 50) AS n,
        |    CAST(2 + doc_id % 3 AS INTEGER) AS k,
        |    list_transform(range(0, 120 + (doc_id % 50)), i ->
        |      ((doc_id*37 + i*101) % 4001) - 2000) AS s
        |  FROM documents),
        |d AS (
        |  SELECT media_id, k, n,
        |    list_transform(range(0, (n + k - 1) // k), i ->
        |      list_sum(list_transform(range(i*k, least(n, (i+1)*k)),
        |        j -> s[j+1]))
        |      // (least(n, (i+1)*k) - i*k)) AS o
        |  FROM t)
        |SELECT media_id,
        |  CAST(8000 // k AS INTEGER) AS out_rate,
        |  CAST(len(o) AS BIGINT) AS out_frames,
        |  array_to_string(o[1:12], ',') AS head_csv,
        |  CAST(list_sum(list_transform(o, x -> x*x)) AS BIGINT)
        |    AS out_energy
        |FROM d
        |""".stripMargin,

    // replay sample formula → per-window energies → active gate →
    // gaps-and-islands coalescing (island id = window − row_number)
    "media_segments" ->
      """WITH t AS (
        |  SELECT doc_id AS media_id, 200 + (doc_id % 37) AS n
        |  FROM documents),
        |w AS (
        |  SELECT media_id, n, wi AS w, wi*25 AS fs,
        |    least(n, wi*25 + 25) AS fe
        |  FROM t, UNNEST(range(0, (n + 24) // 25)) AS u(wi)),
        |e AS (
        |  SELECT media_id, n, w, fs, fe,
        |    list_sum(list_transform(range(fs, fe), f ->
        |      ( ((media_id*31 + f*17) % 801) - 400
        |        + CASE WHEN (media_id + f // 25) % 5 < 2
        |               THEN 3000 ELSE 0 END )
        |      *
        |      ( ((media_id*31 + f*17) % 801) - 400
        |        + CASE WHEN (media_id + f // 25) % 5 < 2
        |               THEN 3000 ELSE 0 END ))) AS en
        |  FROM w),
        |a AS (
        |  SELECT media_id, w, fs, fe, en,
        |    w - ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY w)
        |      AS isl
        |  FROM e WHERE en >= 250000 * (fe - fs)),
        |g AS (
        |  SELECT media_id, isl, MIN(fs) AS start_frame,
        |    MAX(fe) AS end_frame, COUNT(*) AS n_windows, SUM(en) AS energy
        |  FROM a GROUP BY 1, 2)
        |SELECT media_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY media_id
        |    ORDER BY start_frame) - 1 AS INTEGER) AS seg_idx,
        |  CAST(start_frame AS BIGINT) AS start_frame,
        |  CAST(end_frame AS BIGINT) AS end_frame,
        |  CAST(n_windows AS BIGINT) AS n_windows,
        |  CAST(energy AS BIGINT) AS energy
        |FROM g
        |""".stripMargin,

    // replay the pixel formula over each 5×5 tile (ragged edges: the
    // last column is 3 wide, the last row 1 tall)
    "media_patches" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id, pr, pc,
        |    pr*5 AS y0, least(16, pr*5 + 5) AS y1,
        |    pc*5 AS x0, least(18, pc*5 + 5) AS x1
        |  FROM documents,
        |    UNNEST(range(0, 4)) AS r(pr), UNNEST(range(0, 4)) AS c(pc))
        |SELECT media_id,
        |  CAST(pr AS INTEGER) AS patch_row,
        |  CAST(pc AS INTEGER) AS patch_col,
        |  CAST((y1 - y0) * (x1 - x0) AS BIGINT) AS n_px,
        |  CAST(list_sum(list_transform(range(y0, y1), y ->
        |    list_sum(list_transform(range(x0, x1), x ->
        |      (media_id*31 + x*7 + y*13) % 256)))) AS BIGINT) AS px_sum,
        |  CAST(list_sum(list_transform(range(y0, y1), y ->
        |    list_sum(list_transform(range(x0, x1), x ->
        |      ((media_id*31 + x*7 + y*13) % 256)
        |      * ((media_id*31 + x*7 + y*13) % 256))))) AS BIGINT)
        |    AS px_sum_sq
        |FROM p
        |""".stripMargin,

    "media_ahash" ->
      """WITH cells AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(0, 72), i ->
        |      ( ((doc_id*31 + ((i % 9)*2)*7     + ((i // 9)*2)*13)     % 256)
        |      + ((doc_id*31 + ((i % 9)*2 + 1)*7 + ((i // 9)*2)*13)     % 256)
        |      + ((doc_id*31 + ((i % 9)*2)*7     + ((i // 9)*2 + 1)*13) % 256)
        |      + ((doc_id*31 + ((i % 9)*2 + 1)*7 + ((i // 9)*2 + 1)*13) % 256)
        |      ) // 4) AS gray
        |  FROM documents),
        |s AS (
        |  SELECT media_id, gray,
        |    list_sum(list_transform(range(0, 64), i ->
        |      gray[(i // 8) * 9 + (i % 8) + 1])) AS total
        |  FROM cells)
        |SELECT media_id,
        |  array_to_string(list_transform(range(0, 64), i ->
        |    CASE WHEN gray[(i // 8) * 9 + (i % 8) + 1] * 64 > total
        |         THEN '1' ELSE '0' END), '') AS ahash
        |FROM s
        |""".stripMargin,

    // dHash replayed over base + planted one-char variants, then the
    // full quadratic hamming ≤ 3 truth (the pigeonhole candidates are
    // EXACT at this bound, so the engine's blocked join must equal it)
    "media_neardup" ->
      """WITH docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         substr(text, 1, 35) || '@' || substr(text, 37, 36)
        |  FROM documents),
        |g AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(1, 73), i ->
        |      CASE WHEN i <= length(text)
        |        THEN ascii(substr(text, CAST(i AS INTEGER), 1))
        |        ELSE 0 END) AS gray
        |  FROM docs2),
        |h AS (
        |  SELECT media_id,
        |    list_transform(range(0, 64), b ->
        |      CASE WHEN gray[(b // 8) * 9 + (b % 8) + 1] <
        |                gray[(b // 8) * 9 + (b % 8) + 2]
        |           THEN 1 ELSE 0 END) AS bits
        |  FROM g)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(len(list_filter(
        |         list_transform(range(1, 65), i -> a.bits[i] <> b.bits[i]),
        |         x -> x)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE len(list_filter(
        |        list_transform(range(1, 65), i -> a.bits[i] <> b.bits[i]),
        |        x -> x)) <= 3
        |""".stripMargin,

    "media_phash" ->
      """WITH g AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(1, 73), i ->
        |      CASE WHEN i <= length(text)
        |        THEN ascii(substr(text, CAST(i AS INTEGER), 1))
        |        ELSE 0 END) AS gray
        |  FROM documents)
        |SELECT media_id,
        |  array_to_string(list_transform(range(0, 64), b ->
        |    CASE WHEN gray[(b // 8) * 9 + (b % 8) + 1] <
        |              gray[(b // 8) * 9 + (b % 8) + 2]
        |         THEN '1' ELSE '0' END), '') AS dhash
        |FROM g
        |""".stripMargin,
  )
}
