package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Multimodal plumbing semantics beyond the gates: the dHash bit
  * layout, padding, and its composition with the banded hamming join. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hash(texts: String*): Seq[String] = {
    val gray = expr("transform(sequence(1, 72), i -> " +
      "CASE WHEN i <= length(t) THEN ascii(substring(t, i, 1)) " +
      "ELSE 0 END)")
    texts.toDF("t").select(Multimodal.dHash64(gray))
      .as[String].collect().toSeq
  }

  test("dHash64: layout, padding, determinism") {
    val Seq(a, b, flat, empty) =
      hash("abcdefghij" * 8, "abcdefghij" * 8, "zzzzzzzzz" * 8, "")
    assert(a.length == 64 && a.forall(c => c == '0' || c == '1'))
    assert(a == b)       // same pixels, same hash
    assert(a != flat)
    // constant grid: no increasing neighbor anywhere -> all zeros;
    // the empty (fully padded) grid likewise
    assert(flat == "0" * 64)
    assert(empty == "0" * 64)
    // 'abcdefghi…' ascends within each row window except where the
    // repeat wraps — bit 0 (gray[0] < gray[1]) must be 1
    assert(a.head == '1')
    // padding: a 73rd character can't influence the 9x8 grid
    val Seq(h72, h73) = hash("x" * 72, "x" * 72 + "Q")
    assert(h72 == h73)
  }

  test("ImageIoCodec: PNG round-trip yields true pixels and dimensions") {
    // lossless round-trip: generated samples come back exactly
    val png = Multimodal.grayPng(18, 16, (x, y) => (x * 7 + y * 13) % 256)
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 18 && img.getHeight == 16)
    val grid = Multimodal.gray9x8(img)
    // each cell is the floor-mean of its 2x2 block of the template
    val expected = (for (i <- 0 until 72) yield {
      val c = i % 9; val r = i / 9
      val vals = for (dx <- 0 to 1; dy <- 0 to 1)
        yield ((c * 2 + dx) * 7 + (r * 2 + dy) * 13) % 256
      vals.sum / 4
    }).toArray
    assert(grid.toSeq == expected.toSeq)

    // extractMeta with the ImageIo codec: image rows get TRUE
    // dimensions, audio/video fall back to the stub, junk image
    // payloads fall back too
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", png, "s"),
      Multimodal.MediaRecord(2L, "audio", png, "s"),
      Multimodal.MediaRecord(3L, "image", Array[Byte](1, 2, 3), "s"))
    val metas = Multimodal.extractMeta(recs.toDS(),
        Multimodal.ImageIoCodec)
      .collect().map(m => m.media_id -> m).toMap
    assert(metas(1L).width == 18 && metas(1L).height == 16 &&
      metas(1L).n_frames == 1)
    assert(metas(2L) == Multimodal.StubCodec.decode(recs(1)))
    assert(metas(3L) == Multimodal.StubCodec.decode(recs(2)))

    // a 1x1 image still fills every cell (pixel repetition, no empties)
    val tiny = Multimodal.decodeGray9x8(
      Multimodal.grayPng(1, 1, (_, _) => 200)).get
    assert(tiny.toSeq == Seq.fill(72)(200))

    // color path: BT.601 integer luma (pure red = 299*255/1000 = 76)
    val cimg = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) cimg.setRGB(x, y, 0xff0000)
    assert(Multimodal.gray9x8(cimg).toSeq ==
      Seq.fill(72)(299 * 255 / 1000))
  }

  test("aHash64: integer mean, flat grid all-zero, brightness invariance") {
    def ahash(grid: Seq[Int]): String =
      Seq(grid).toDF("g").select(Multimodal.aHash64(col("g")))
        .as[String].collect().head
    // flat grid: cell*64 == sum everywhere, strict > -> all zeros
    assert(ahash(Seq.fill(72)(7)) == "0" * 64)
    // one bright pixel in the 8x8 subgrid -> exactly that bit set
    val one = Seq.tabulate(72)(i => if (i == 10) 255 else 0)
    val h1 = ahash(one) // cell (1,1) = bit 9
    assert(h1.count(_ == '1') == 1 && h1(9) == '1')
    // column 8 (outside the 8x8 subgrid) influences nothing
    assert(ahash(Seq.tabulate(72)(i => if (i % 9 == 8) 200 else 3)) ==
      "0" * 64)
    // exact gain invariance: doubling every pixel doubles both sides
    // of cell*64 > sum, flipping nothing
    val grad = Seq.tabulate(72)(i => (i * 3) % 200)
    assert(ahash(grad) == ahash(grad.map(_ * 2)))
  }

  test("dHash fingerprints ride the banded hamming near-dup join") {
    val base = "the quick brown fox jumps over the lazy dog padding!!"
    val fp = Seq((1L, base), (2L, base), (3L, "completely other bytes"))
      .toDF("media_id", "t")
      .select(col("media_id"),
        Multimodal.dHash64(expr("transform(sequence(1, 72), i -> " +
          "CASE WHEN i <= length(t) THEN ascii(substring(t, i, 1)) " +
          "ELSE 0 END)")).as("f"))
    val pairs = Dedup.simhashNearDuplicates(fp, "media_id", "f",
        maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("WAV: pcmWav/parseWav round-trip is exact, chunk walk is robust") {
    val mono = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val w = Multimodal.parseWav(Multimodal.pcmWav(8000, 1, mono)).get
    assert(w.sample_rate == 8000 && w.channels == 1 &&
      w.bits_per_sample == 16 && w.samples.toSeq == mono.toSeq)

    // stereo interleave survives
    val st = Multimodal.parseWav(
      Multimodal.pcmWav(44100, 2, Array(10, -20, 30, -40))).get
    assert(st.channels == 2 && st.samples.toSeq == Seq(10, -20, 30, -40))

    // unknown chunks (odd-sized -> word-aligned pad) before fmt/data skip
    val base = Multimodal.pcmWav(8000, 1, Array(5, -6))
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val padded = base.take(12) ++ extra ++ base.drop(12)
    // RIFF size field is not re-fixed; the parser walks chunks, not it
    assert(Multimodal.parseWav(padded).get.samples.toSeq == Seq(5, -6))

    // 8-bit unsigned payloads re-center to signed
    val b8 = {
      val d = Array[Byte](0, 128.toByte, 255.toByte)
      val bb = java.nio.ByteBuffer.allocate(44 + 3)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 3).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(3).put(d)
      bb.array()
    }
    assert(Multimodal.parseWav(b8).get.samples.toSeq == Seq(-128, 0, 127))

    // rejects: bad magic, truncated data chunk, non-PCM format code
    assert(Multimodal.parseWav("not a wav at all".getBytes).isEmpty)
    assert(Multimodal.parseWav(base.dropRight(1)).isEmpty)
    val nonPcm = base.clone(); nonPcm(20) = 3 // IEEE float
    assert(Multimodal.parseWav(nonPcm).isEmpty)
  }

  test("wavFeatures: exact-integer peak/energy/zc/clip, channel-0 zc") {
    val f = Multimodal.wavFeatures(
      Multimodal.WavData(8000, 1, 16, Array(0, 100, -200, 300, 32767)))
    assert(f.n_samples == 5 && f.duration_us == 625)
    assert(f.peak == 32767)
    assert(f.energy == 100L * 100 + 200L * 200 + 300L * 300 +
      32767L * 32767)
    assert(f.zero_crossings == 2) // 100->-200, -200->300 (0 never flips)
    assert(f.clipped == 1)

    // stereo: zero crossings read channel 0 only; energy reads both
    val st = Multimodal.wavFeatures(Multimodal.WavData(8000, 2, 16,
      Array(10, -10, -10, 10, 10, -10)))
    assert(st.n_samples == 3 && st.zero_crossings == 2 &&
      st.energy == 600L && st.clipped == 0)
  }

  test("waveWindows65 + waveHash64: boundaries, tiny clips, exact gain") {
    import org.apache.spark.sql.functions.col
    def hash(w: (Array[Long], Array[Int])): String =
      Seq((w._1.toSeq, w._2.toSeq)).toDF("s", "c")
        .select(Multimodal.waveHash64(col("s"), col("c")))
        .as[String].collect().head
    // a single-frame clip repeats into all 65 windows -> flat -> zeros
    val one = Multimodal.waveWindows65(
      Multimodal.WavData(8000, 1, 16, Array(-42)))
    assert(one._1.toSeq == Seq.fill(65)(42L) &&
      one._2.toSeq == Seq.fill(65)(1) && hash(one) == "0" * 64)
    // 130 frames: window k sums |s| of frames 2k, 2k+1 (size 2)
    val ramp = Multimodal.waveWindows65(Multimodal.WavData(8000, 1, 16,
      Array.tabulate(130)(i => i)))
    assert(ramp._1.toSeq == Seq.tabulate(65)(k => (4 * k + 1).toLong) &&
      ramp._2.toSeq == Seq.fill(65)(2) && hash(ramp) == "1" * 64)
    // EXACT loudness-gain invariance (the reason windows are (sum, size)
    // pairs, not floor-means): tripling samples flips no bit even where
    // a floor-mean comparison would
    val s = Array.tabulate(200)(i => ((i * 53) % 401) - 200)
    val h1 = hash(Multimodal.waveWindows65(
      Multimodal.WavData(8000, 1, 16, s)))
    val h3 = hash(Multimodal.waveWindows65(
      Multimodal.WavData(8000, 1, 16, s.map(_ * 3))))
    assert(h1 == h3)
  }

  test("grayResample: arbitrary geometry, identity, tiny-image repeat") {
    // identity-size resample returns the pixels themselves
    val img = {
      val i = new java.awt.image.BufferedImage(
        4, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 2; x <- 0 until 4)
        i.getRaster.setSample(x, y, 0, 10 * y + x)
      i
    }
    assert(Multimodal.grayResample(img, 4, 2).toSeq ==
      Seq(0, 1, 2, 3, 10, 11, 12, 13))
    // 2x1: each cell floor-means a 2x2 block
    assert(Multimodal.grayResample(img, 2, 1).toSeq ==
      Seq((0 + 1 + 10 + 11) / 4, (2 + 3 + 12 + 13) / 4))
    // upscale a 1x1 image: every cell repeats the pixel
    val one = Multimodal.decodeImage(
      Multimodal.grayPng(1, 1, (_, _) => 77)).get
    assert(Multimodal.grayResample(one, 3, 2).toSeq == Seq.fill(6)(77))
    // gray9x8 is exactly the (9, 8) case
    val big = Multimodal.decodeImage(
      Multimodal.grayPng(18, 16, (x, y) => x * 7 + y * 13)).get
    assert(Multimodal.grayResample(big, 9, 8).toSeq ==
      Multimodal.gray9x8(big).toSeq)
  }

  test("downsampleWav: boxcar mean, floor division, stereo, trailing") {
    val w = Multimodal.WavData(8000, 1, 16, Array(1, 3, 5, 7, 9))
    val d = Multimodal.downsampleWav(w, 2)
    // pairs (1,3) (5,7) then the trailing partial (9)
    assert(d.sample_rate == 4000 && d.samples.toSeq == Seq(2, 6, 9))
    // signed means truncate toward zero (JVM and DuckDB // agree):
    // mean(-7, 0) = -3
    val neg = Multimodal.downsampleWav(
      Multimodal.WavData(8000, 1, 16, Array(-7, 0)), 2)
    assert(neg.samples.toSeq == Seq(-3))
    // stereo: channels decimate independently
    val st = Multimodal.downsampleWav(
      Multimodal.WavData(8000, 2, 16, Array(0, 100, 10, 300, 20, 500)), 3)
    assert(st.samples.toSeq == Seq(10, 300))
    // k=1 is the identity
    assert(Multimodal.downsampleWav(w, 1) eq w)
  }

  test("energySegments: gate, coalescing, partial window, edge cases") {
    import Multimodal.{AudioSegment, WavData, energySegments}
    // windows of 2 frames over channel 0; threshold mean-sq 100:
    // window energies 2·100=200? — samples (10,10 | 1,1 | 20,20 | 30,1)
    // energies 200, 2, 800, 901; gate e >= 100·n: 200≥200 A, 2<200,
    // 800≥200 A, 901≥200 A (trailing FULL window here)
    val w = WavData(8000, 1, 16, Array(10, 10, 1, 1, 20, 20, 30, 1))
    assert(energySegments(w, 2, 100) == Seq(
      AudioSegment(0, 0, 2, 1, 200),
      AudioSegment(1, 4, 8, 2, 1701)))
    // trailing PARTIAL window: 5 frames at window 2 — last window is
    // one frame, gate scales to n=1 (50² = 2500 ≥ 100·1)
    val p = WavData(8000, 1, 16, Array(0, 0, 0, 0, 50))
    assert(energySegments(p, 2, 100) == Seq(AudioSegment(0, 4, 5, 1, 2500)))
    // all-active clip is ONE segment spanning everything
    val loud = WavData(8000, 1, 16, Array.fill(6)(100))
    assert(energySegments(loud, 2, 100) ==
      Seq(AudioSegment(0, 0, 6, 3, 60000)))
    // silence yields no segments; empty clip likewise
    assert(energySegments(WavData(8000, 1, 16, Array(0, 0)), 2, 100).isEmpty)
    assert(energySegments(WavData(8000, 1, 16, Array.empty), 2, 100).isEmpty)
    // stereo: only channel 0 is gated (channel 1's loud samples ignored)
    val st = WavData(8000, 2, 16, Array(0, 999, 0, 999))
    assert(energySegments(st, 2, 100).isEmpty)
    // zero threshold: every window active (one full-span segment)
    assert(energySegments(p, 2, 0).map(_.n_windows).sum == 3)
    intercept[IllegalArgumentException](energySegments(w, 0, 100))
    intercept[IllegalArgumentException](energySegments(w, 2, -1))
  }

  test("grayPatchStats: tiles, ragged edges, exact numerators") {
    import Multimodal.{PatchStat, grayPatchStats}
    // 3×2 grid, p=2: patches (0,0)=2×2 over [1,2|4,5], (0,1)=2×1 [3|6]
    val g = Array(1, 2, 3, 4, 5, 6)
    assert(grayPatchStats(g, 3, 2) == Seq(
      PatchStat(0, 0, 4, 12, 1 + 4 + 16 + 25),
      PatchStat(0, 1, 2, 9, 9 + 36)))
    // p larger than the image: ONE patch = the whole image
    assert(grayPatchStats(g, 3, 10) == Seq(PatchStat(0, 0, 6, 21, 91)))
    // p=1: one patch per pixel, sum == value, sum_sq == value²
    val unit = grayPatchStats(g, 3, 1)
    assert(unit.size == 6 && unit.forall(t =>
      t.n_px == 1 && t.px_sum_sq == t.px_sum * t.px_sum))
    // every pixel lands in exactly one patch at any p
    for (p <- 1 to 4)
      assert(grayPatchStats(g, 3, p).map(_.n_px).sum == 6)
    intercept[IllegalArgumentException](grayPatchStats(g, 4, 2)) // 6 % 4 != 0
  }

  test("parsePng: IHDR + tEXt with CRC verification, strict rejects") {
    val png = Multimodal.withTextChunk(
      Multimodal.grayPng(7, 4, (x, y) => x + y), "k", "v one")
    val m = Multimodal.parsePng(png).get
    assert(m.width == 7 && m.height == 4 && m.bit_depth == 8 &&
      m.color_type == 0 && m.interlace == 0)
    assert(m.texts == Seq(("k", "v one"))) // NUL-split survives spaces
    assert(m.n_chunks >= 4) // IHDR, tEXt, >=1 IDAT, IEND

    // flipped data byte -> CRC mismatch -> None (never garbage)
    val corrupt = png.clone()
    corrupt(40) = (corrupt(40) ^ 0x5a).toByte
    assert(Multimodal.parsePng(corrupt).isEmpty)
    // truncation and non-PNG bytes reject
    assert(Multimodal.parsePng(png.dropRight(3)).isEmpty)
    assert(Multimodal.parsePng("not a png".getBytes).isEmpty)
  }

  test("sniffFormat: signatures, container guard, text/bin fallback") {
    def sniff(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("p")
        .select(Multimodal.sniffFormat(col("p")).as("f"))
        .as[String].collect().head
    assert(sniff(Multimodal.grayPng(2, 2, (_, _) => 9)) == "png")
    assert(sniff(Multimodal.pcmWav(8000, 1, Array(1, -2))) == "wav")
    assert(sniff("GIF89a-tiny".getBytes) == "gif")
    assert(sniff("%PDF-1.7 x".getBytes) == "pdf")
    assert(sniff("﻿  <!DOCTYPE html><p>".getBytes("UTF-8")) == "html")
    assert(sniff("<HTML><body>".getBytes) == "html")
    assert(sniff("plain words only".getBytes) == "text")
    // valid non-ASCII UTF-8 is still text
    assert(sniff("café ok".getBytes("UTF-8")) == "text")
    // truncated magic -> invalid UTF-8 head -> bin
    assert(sniff(Array[Byte](0x89.toByte, 0x50) ++
      "rest".getBytes) == "bin")
    // RIFF with the wrong form type never claims wav/avi
    val junkRiff = "RIFF".getBytes ++ Array[Byte](16, 0, 0, 0) ++
      "JUNKdata".getBytes
    assert(sniff(junkRiff) == "bin") // NUL size bytes class it binary
  }

  test("WavCodec/JdkCodec: real audio metadata, stub fallback, routing") {
    val wav = Multimodal.pcmWav(22050, 2, Array.fill(64)(7))
    val rec = Multimodal.MediaRecord(9L, "audio", wav, "s")
    val m = Multimodal.WavCodec.decode(rec)
    // width = sample rate, height = channels, n_frames = per-channel n
    assert(m.width == 22050 && m.height == 2 && m.n_frames == 32)
    // non-WAV audio bytes fall back to the stub
    val junk = Multimodal.MediaRecord(10L, "audio",
      "not audio".getBytes, "s")
    assert(Multimodal.WavCodec.decode(junk) ==
      Multimodal.StubCodec.decode(junk))
    // JdkCodec routes every kind to its real decoder
    val png = Multimodal.grayPng(4, 4, (x, y) => x * y)
    assert(Multimodal.JdkCodec.decode(
      Multimodal.MediaRecord(11L, "image", png, "s")).width == 4)
    assert(Multimodal.JdkCodec.decode(rec) == m)
    val vid = Multimodal.MediaRecord(12L, "video", wav, "s")
    assert(Multimodal.JdkCodec.decode(vid) ==
      Multimodal.StubCodec.decode(vid))
  }

  test("parseJpeg: marker walk, SOF geometry, EXIF/COM, strict rejects") {
    val j = Multimodal.jpegHeader(640, 480, 3, progressive = false,
      "hello", exif = true)
    val m = Multimodal.parseJpeg(j).get
    assert((m.width, m.height, m.precision, m.components) ==
      ((640, 480, 8, 3)))
    assert(m.progressive == 0 && m.has_exif == 1 && m.comment == "hello")
    assert(m.n_segments == 5) // APP0, APP1, COM, SOF0, SOS
    val p = Multimodal.parseJpeg(Multimodal.jpegHeader(
      65535, 1, 1, progressive = true, "", exif = false)).get
    assert((p.width, p.height, p.components, p.progressive,
      p.has_exif, p.n_segments) == ((65535, 1, 1, 1, 0, 4)))
    // a real ImageIO-encoded JPEG parses too (independent generator)
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val real = Multimodal.parseJpeg(bos.toByteArray).get
    assert((real.width, real.height) == ((20, 10)))
    // strict rejects: truncation anywhere, missing SOI, corrupt length
    assert(Multimodal.parseJpeg(j.take(1)).isEmpty)
    assert(Multimodal.parseJpeg(j.take(7)).isEmpty)
    assert(Multimodal.parseJpeg(j.drop(2)).isEmpty) // no SOI
    val bad = j.clone
    bad(4) = 0x00; bad(5) = 0x01 // APP0 length 1 < 2
    assert(Multimodal.parseJpeg(bad).isEmpty)
    val over = j.clone
    over(4) = 0x7f // APP0 length beyond the payload
    assert(Multimodal.parseJpeg(over).isEmpty)
    // SOS/EOI before any SOF -> None, never garbage geometry
    assert(Multimodal.parseJpeg(Array(0xff, 0xd8, 0xff, 0xd9)
      .map(_.toByte)).isEmpty)
    // fill bytes before a marker are legal padding; RST is standalone
    val filled = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xd0).map(_.toByte) ++
      j.drop(2)
    val f = Multimodal.parseJpeg(filled).get
    assert(f.width == 640 && f.n_segments == 6) // +1 for the RST
  }

  test("parseGif: block walk, frames, loop/delay/comment, rejects") {
    val g = Multimodal.gifBytes(320, 200, 3, 12, 5, "made by graft")
    val m = Multimodal.parseGif(g).get
    assert((m.width, m.height, m.version, m.gct_colors) ==
      ((320, 200, "89a", 2)))
    assert((m.n_frames, m.delay_cs, m.loop_count) == ((3, 12, 5)))
    assert(m.comment == "made by graft")
    // a still: no NETSCAPE extension -> loop -1, no comment
    val still = Multimodal.parseGif(
      Multimodal.gifBytes(8, 8, 1, 0, -1, "")).get
    assert((still.n_frames, still.loop_count, still.comment) ==
      ((1, -1, "")))
    // a real ImageIO-encoded GIF parses too (independent generator)
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val real = Multimodal.parseGif(bos.toByteArray).get
    assert((real.width, real.height, real.n_frames) == ((24, 16, 1)))
    // strict rejects: truncation, foreign signature, missing trailer,
    // unknown block introducer, sub-block running off the payload
    assert(Multimodal.parseGif(g.take(12)).isEmpty)
    assert(Multimodal.parseGif("NOTAGIF89a123".getBytes).isEmpty)
    assert(Multimodal.parseGif(g.dropRight(1)).isEmpty)
    val junk = g.clone
    junk(19) = 0x7f // first block introducer (past 6+7+6 GCT) -> junk
    assert(Multimodal.parseGif(junk).isEmpty)
    val overrun = Multimodal.gifBytes(8, 8, 1, 0, -1, "x").clone
    overrun(21) = 0xf0.toByte // comment sub-block length past the end
    assert(Multimodal.parseGif(overrun).isEmpty)
  }

  test("parseZip: directory walk, CRCs, interop both ways, rejects") {
    val files = Seq(
      "a.txt" -> "hello zip".getBytes("UTF-8"),
      "dir/b.bin" -> Array[Byte](1, 2, 3, 4, 5),
      "empty" -> Array.empty[Byte])
    val z = Multimodal.zipBytes(files)
    val m = Multimodal.parseZip(z).get
    assert(m.n_entries == 3)
    assert(m.entries.map(_.name) == Seq("a.txt", "dir/b.bin", "empty"))
    assert(m.entries.map(_.uncompressed) == Seq(9L, 5L, 0L))
    assert(m.entries.forall(_.method == 0))
    // CRCs match java.util.zip's own CRC32 of the same payloads
    files.zip(m.entries).foreach { case ((_, data), e) =>
      val c = new java.util.zip.CRC32; c.update(data)
      assert(e.crc32 == c.getValue)
    }
    // interop 1: java.util.zip reads what zipBytes emits
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(z))
    val seen = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    assert(seen == Seq("a.txt", "dir/b.bin", "empty"))
    // interop 2: the walk reads a real ZipOutputStream archive
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.putNextEntry(new java.util.zip.ZipEntry("real.txt"))
    zout.write("payload".getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val real = Multimodal.parseZip(bos.toByteArray).get
    assert(real.n_entries == 1 && real.entries.head.name == "real.txt")
    assert(real.entries.head.uncompressed == 7L)
    // EOCD comment tolerance: trailing bytes after the record still parse
    assert(Multimodal.parseZip(z ++ "trailing junk".getBytes).isDefined)
    // strict rejects: truncation, no EOCD, forged entry count
    assert(Multimodal.parseZip(z.take(10)).isEmpty)
    assert(Multimodal.parseZip("PK but not a zip".getBytes).isEmpty)
    val forged = z.clone
    forged(z.length - 12) = 9 // EOCD total-entry count way past reality
    assert(Multimodal.parseZip(forged).isEmpty)
  }

  test("exif: both byte orders round-trip, strict rejects") {
    for (little <- Seq(true, false)) {
      val b = Multimodal.exifApp1(little, "Canon", "EOS-1", 6, 400, 4032L)
      val m = Multimodal.parseExif(b).get
      assert(m.byte_order == (if (little) "II" else "MM"))
      assert(m.n_ifd0 == 4L && m.make == "Canon" && m.model == "EOS-1")
      assert(m.orientation == 6L && m.iso == 400L && m.pixel_x == 4032L)
    }
    // short ASCII values pack INLINE in the 4-byte field (the TIFF
    // rule) — both the builder and the parser must take that branch
    for (little <- Seq(true, false)) {
      val short = Multimodal.exifApp1(little, "LG", "x", 1, 200, 9L)
      val sm = Multimodal.parseExif(short).get
      assert(sm.make == "LG" && sm.model == "x" && sm.iso == 200L)
    }
    val ok = Multimodal.exifApp1(true, "a", "b", 1, 100, 1L)
    // bad preamble, unknown order mark, wrong magic, truncation
    assert(Multimodal.parseExif("not exif at all".getBytes).isEmpty)
    val badOrder = ok.clone; badOrder(6) = 'X'.toByte
    assert(Multimodal.parseExif(badOrder).isEmpty)
    val badMagic = ok.clone; badMagic(8) = 99.toByte
    assert(Multimodal.parseExif(badMagic).isEmpty)
    assert(Multimodal.parseExif(ok.take(20)).isEmpty)
    // corrupt sub-IFD pointer ≥ 2^31 (the ExifIFDPointer value sits at
    // payload offset 60 in the little-endian fixture): .toInt wraps
    // negative, and before the r16 guard that threw
    // ArrayIndexOutOfBoundsException instead of honoring the
    // structural-violation-returns-None contract
    val hugePtr = ok.clone
    (0 to 3).foreach(i => hugePtr(60 + i) = 0xff.toByte)
    assert(Multimodal.parseExif(hugePtr).isEmpty)
    val wrapPtr = ok.clone // 0x80000010 LE — the smallest wrapping class
    wrapPtr(60) = 0x10.toByte; wrapPtr(61) = 0; wrapPtr(62) = 0
    wrapPtr(63) = 0x80.toByte
    assert(Multimodal.parseExif(wrapPtr).isEmpty)
  }
}
