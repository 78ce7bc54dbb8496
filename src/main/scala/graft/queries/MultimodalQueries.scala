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
