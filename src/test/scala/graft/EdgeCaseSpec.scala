package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ObservationStore, Tools}

/** Edge cases the reference is quirky about (FIXTURES.md §10). */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("rrname", "sensor_id", "rrtype", "rdata", "count",
    "timestamp_start", "timestamp_end")

  test("rdata containing the 0x1f delimiter byte survives store + lookup") {
    // the reference needs a right-to-left key parse for this
    // (rocksdb-impl.c:472-495); the columnar model must be immune
    val weird = "a\u001fb\u001fc"
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    val dir = Files.createTempDirectory("graft-edge").toString
    val input = Seq(
      ("n1.com", "s\u001f1", "A", weird, 1L, ts, ts),
      ("n2.com", "s\u001f1", "A", weird, 2L, ts, ts))
      .toDF(cols: _*)
    ObservationStore.writeDual(ObservationStore.aggregate(input), s"$dir/st",
      numBuckets = 4)
    val st = ObservationStore.load(spark, s"$dir/st")
    val hits = st.entries(rdata = Some(weird)).collect()
    assert(hits.length == 2)
    assert(hits.map(_.getAs[String]("rrname")).toSet == Set("n1.com", "n2.com"))
    assert(st.entries(rdata = Some("a"), sensorId = Some("s\u001f1")).isEmpty)
  }

  test("u32 timestamp bounds: epoch 0 and 2^32-1 seconds round-trip") {
    val t0 = new Timestamp(0L)                       // 1970-01-01
    val tMax = new Timestamp(4294967295L * 1000L)    // 2106-02-07
    val input = Seq(
      ("old.com", "s", "A", "1.1.1.1", 1L, t0, t0),
      ("future.com", "s", "A", "1.1.1.1", 1L, tMax, tMax))
      .toDF(cols: _*)
    val agg = ObservationStore.aggregate(input)
    val json = Tools.jsonize(agg).as[String].collect().mkString("\n")
    assert(json.contains("\"time_first\":0"))
    assert(json.contains("\"time_first\":4294967295"))
  }

  test("per-store limit applied BEFORE fan-out union (Q5/Q8 parity)") {
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    val input = (1 to 5).map(i => ("multi.com", "s", "A", s"1.1.1.$i", 1L, ts, ts))
      .toDF(cols: _*)
    val st = ObservationStore.inMemory(ObservationStore.aggregate(input))
    // limit binds inside each store: 2 stores × limit 2 = up to 4 rows,
    // duplicates kept (README.md:291-293)
    val fanned = st.fanOut(Seq(st, st), rrname = Some("multi.com"),
      rdata = None, limit = 2)
    assert(fanned.count() == 4)
    // single-store limit semantics
    assert(st.entries(rrname = Some("multi.com"), limit = 3).count() == 3)
  }

  test("restQuery subject matching both rrname and rdata yields both sets") {
    val ts = Timestamp.valueOf("2020-01-01 00:00:00")
    // 'dual' appears as a NAME and as an ANSWER of another name
    val input = Seq(
      ("dual", "s", "A", "9.9.9.9", 1L, ts, ts),
      ("other.com", "s", "CNAME", "dual", 1L, ts, ts))
      .toDF(cols: _*)
    val st = ObservationStore.inMemory(ObservationStore.aggregate(input))
    assert(st.restQuery("dual").count() == 2) // bag union of both searches
  }

  test("round-5 curation ops are total on empty and degenerate input") {
    import graft.operators.{Curation, Similarity, TextAnalysis}
    import org.apache.spark.sql.functions.{col, lit}
    val emptyDocs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Curation.lmScores(emptyDocs, "text", "doc_id").count() == 0)
    assert(Curation.pmiCollocations(emptyDocs, "text")
      .count() == 0)
    assert(Curation.weightedSample(emptyDocs.withColumn("w", lit(1L)),
      "doc_id", "w", 5).count() == 0)
    // single-token docs have no bigrams: lmScores drops them, PMI is empty
    val single = Seq((1L, "lonely")).toDF("doc_id", "text")
    assert(Curation.lmScores(single, "text", "doc_id").count() == 0)
    assert(Curation.pmiCollocations(single, "text",
      minCount = 1L).count() == 0)
    // gopher flags are defined (all-integer) on the empty string
    val flags = Seq((1L, "")).toDF("doc_id", "text")
      .select(TextAnalysis.gopherColumns(col("text"),
        Seq("the", "a")): _*).collect().head
    assert((0 until flags.length).forall(!flags.isNullAt(_)))
    assert(flags.getAs[Long]("gopher_keep") == 0L)
    // a query id absent from the corpus yields an empty top-k, not an error
    val vecs = Seq((1L, Seq(1.0f, 0.1f)), (2L, Seq(0.9f, 0.2f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.hammingTopK(vecs, "vec_id", "embedding",
      queryId = 99L, k = 1, rerank = 1, dim = 2).count() == 0)
  }

  test("round-6 ops are total on empty and degenerate input") {
    import graft.operators.{Curation, Graphs}
    import org.apache.spark.sql.functions.col
    val noEdges = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(Graphs.triangleCounts(noEdges, "src", "dst").count() == 0)
    assert(Graphs.kcorePeel(noEdges, "src", "dst", k = 2).count() == 0)
    // a graph of only self-loops collapses to nothing, not a crash
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graphs.triangleCounts(loops, "src", "dst").count() == 0)
    assert(Graphs.kcorePeel(loops, "src", "dst", k = 1).count() == 0)
    // empty corpus: empty model, and classifying against it yields
    // nothing (no label to predict) rather than an error
    val emptyDocs = spark.emptyDataset[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    val emptyModel = Curation.nbTrain(emptyDocs, "text", "lang")
    assert(emptyModel.count() == 0)
    assert(Curation.nbClassify(Seq((1L, "a b")).toDF("doc_id", "text"),
      "text", "doc_id", emptyModel).count() == 0)
    // topKPairs over an empty frame aggregates to an empty array
    val t = spark.emptyDataset[(Long, Long)].toDF("v", "id")
      .agg(Curation.topKPairs(col("v"), col("id"), 3).as("t"))
      .head.getSeq[Any](0)
    assert(t.isEmpty)
  }

  test("round-8 ops are total on empty and degenerate input") {
    import graft.operators.{Curation, Events, Graphs, TextAnalysis}
    import org.apache.spark.sql.functions.col
    val noEdges = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    // hits on an empty graph: no nodes, no rows, no divide-by-zero
    assert(Graphs.hits(noEdges, "src", "dst").count() == 0)
    // a self-loop-only graph: the node is its own hub and authority
    val loop = Seq((5L, 5L)).toDF("src", "dst")
    val l = Graphs.hits(loop, "src", "dst", rounds = 1).collect()
    assert(l.map(r => (r.getLong(0), r.getAs[Long]("hub"),
      r.getAs[Long]("auth"))).toSeq == Seq((5L, 1000000L, 1000000L)))
    assert(Graphs.bipartiteProject(
      spark.emptyDataset[(Long, Long)].toDF("ctx", "item"),
      "ctx", "item").count() == 0)
    // interval/transition ops on empty event frames
    val noIv = spark.emptyDataset[(Long, Long, Long)].toDF("k", "s", "e")
    assert(Events.mergeIntervals(noIv, "k", "s", "e").count() == 0)
    val noEv = spark.emptyDataset[(Long, Long, Long, String)]
      .toDF("event_id", "user_id", "t", "event_type")
    assert(Events.transitionCounts(noEv, "user_id", "t", "event_id",
      "event_type").count() == 0)
    // single-event user: no pairs (matches the oracle's lag semantics)
    val lone = Seq((1L, 1L, 1L, "a")).toDF("event_id", "user_id", "t",
      "event_type")
    assert(Events.transitionCounts(lone, "user_id", "t", "event_id",
      "event_type").count() == 0)
    // sketches over empty frames: empty output, not a crash
    val noVals = spark.emptyDataset[(Long, Long)].toDF("id", "v")
    assert(Curation.sketchQuantiles(noVals, "id", "v").count() == 0)
    assert(Curation.sketchQuantilesByKey(
      spark.emptyDataset[(String, Long, Long)].toDF("k", "id", "v"),
      "k", "id", "v").count() == 0)
    assert(Curation.quantileBuckets(noVals, "id", "v").count() == 0)
    // the automaton on an empty document: zero everywhere, no hits rows
    assert(TextAnalysis.multiPatternHits(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text",
      Seq("x")).count() == 0)
  }

  test("round-9 ops are total on empty and degenerate input") {
    import graft.operators.{Robots, TextAnalysis}
    import org.apache.spark.sql.functions.col
    // HTML extraction of empty / non-HTML / tag-only strings
    val html = Seq("", "no markup at all", "<p></p>", "<x").toDF("h")
      .select(TextAnalysis.htmlExtract(col("h")).as("t"),
        TextAnalysis.htmlTitle(col("h")).as("ti"))
      .as[(String, String)].collect()
    assert(html(0) == ("", ""))
    assert(html(1) == ("no markup at all", ""))
    assert(html(2) == ("", ""))
    // BPE with an empty merge table = pure char segmentation; empty
    // text yields the empty-word artifact both engines share
    val seg = Seq("ab").toDF("t")
      .select(TextAnalysis.bpeSegment(col("t"), Nil)).head.getSeq[String](0)
    assert(seg == Seq("a", "b"))
    assert(TextAnalysis.bpeTrain(
      spark.emptyDataset[String].toDF("text"), "text", 3).isEmpty)
    // robots: empty bodies produce no rules; no rules allow everything
    val noRules = Robots.parseRules(
      Seq(("h", "")).toDF("host", "body"), "host", "body")
    assert(noRules.count() == 0)
    assert(Robots.filterUrls(Seq("http://h/x").toDF("url"), "url", noRules)
      .select("is_allowed").head.getLong(0) == 1L)
    // crawl schedule of an empty frontier
    assert(Robots.crawlSchedule(
      spark.emptyDataset[(String, Long)].toDF("url", "p"), "url", "p")
      .count() == 0)
    // WARC read over a directory with no .warc files
    val dir = java.nio.file.Files.createTempDirectory("graft-ec-warc")
    java.nio.file.Files.write(dir.resolve("notes.txt"), "x".getBytes): Unit
    assert(graft.sources.Warc.read(spark, dir.toString).count() == 0)
  }

  test("round-10 ops are total on empty and degenerate input") {
    import graft.operators.{Multimodal, Robots, TextAnalysis}
    import graft.functions.Url
    import org.apache.spark.sql.functions.{col, expr}
    // rules that are ONLY wildcards / anchors still behave: '*' matches
    // every path; '/$' anchors exactly the root
    val odd = Robots.parseRules(Seq(("h",
      "User-agent: *\nDisallow: *\nAllow: /$\n")).toDF("host", "body"),
      "host", "body")
    val v = Robots.filterUrls(
      Seq("http://h/", "http://h/x").toDF("url"), "url", odd)
      .select("url", "is_allowed").as[(String, Long)].collect().toMap
    assert(v("http://h/x") == 0L) // '*' disallows
    // root '/': Allow '/$' (len 2) outranks Disallow '*' (len 1)
    assert(v("http://h/") == 1L)
    // sitemap/crawl-delay on empty bodies
    assert(Robots.sitemaps(Seq(("h", "")).toDF("host", "body"),
      "host", "body").count() == 0)
    assert(Robots.crawlDelays(Seq(("h", "")).toDF("host", "body"),
      "host", "body").count() == 0)
    // delay-aware schedule with NO delays frame rows: default applies
    val sched = Robots.crawlScheduleWithDelays(
      Seq(("http://h/1", 1L)).toDF("url", "p"), "url", "p",
      spark.emptyDataset[(String, Double)].toDF("host", "crawl_delay"),
      defaultDelay = 2.5)
    assert(sched.select("due_sec").as[Double].head() == 0.0)
    // sitemap parse of junk and of an empty urlset
    assert(Robots.parseSitemap(Seq(("u", "not xml"), ("u2", "<urlset>" +
      "</urlset>")).toDF("u", "b"), "u", "b").count() == 0)
    // crawlDiff of two empty snapshots / one empty side
    val empty = spark.emptyDataset[(String, String)].toDF("url", "fp")
    assert(Robots.crawlDiff(empty, empty, "url", "fp").count() == 0)
    val one = Seq(("http://h/1", "a")).toDF("url", "fp")
    assert(Robots.crawlDiff(empty, one, "url", "fp")
      .select("status").as[String].head() == "added")
    // normalization of empty / all-control text
    val n = Seq("", "\u0001\u0002", " ").toDF("t")
      .select(TextAnalysis.normalizeText(col("t"))).as[String].collect()
    assert(n.toSeq == Seq("", "", ""))
    // codeColumns on empty text: zero everything (no div-by-zero)
    val cc = Seq("").toDF("t")
      .select(TextAnalysis.codeColumns(col("t")): _*).collect().head
    assert(cc.toSeq == Seq(0L, 0L, 0L, 0L, 0L))
    // htmlLinks / url resolution degenerate
    assert(Seq("").toDF("t").select(TextAnalysis.htmlLinks(col("t")))
      .head.getSeq[String](0).isEmpty)
    assert(Seq(("not a url", "x")).toDF("b", "h")
      .select(Url.resolve(col("b"), col("h"))).head.isNullAt(0))
    // dHash of an empty grid
    assert(Seq("").toDF("t")
      .select(Multimodal.dHash64(expr(
        "transform(sequence(1, 72), i -> 0)"))).as[String].head()
      == "0" * 64)
  }

  test("round-11 ops are total on empty and degenerate input") {
    import graft.operators.{BpeVocab, Dedup, Multimodal, TextAnalysis}
    import org.apache.spark.sql.functions.{col, expr}
    // aHash of the all-zero grid: 0*64 > 0 is false everywhere
    assert(Seq("").toDF("t")
      .select(Multimodal.aHash64(expr(
        "transform(sequence(1, 72), i -> 0)"))).as[String].head()
      == "0" * 64)
    // decode of junk bytes: None, and the codec falls back to the stub
    assert(Multimodal.decodeGray9x8(Array[Byte](9, 9, 9)).isEmpty)
    // tokenRarity on empty corpus / single-doc corpus
    assert(TextAnalysis.tokenRarity(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    val single = TextAnalysis.tokenRarity(
      Seq((7L, "x x y")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    // counts x=2 y=1 -> ranks x=0 y=1; sum 1 of 3 tokens -> 33
    assert(single.toSeq == Seq(7L, 3L, 1L, 33L))
    // BpeVocab refuses an empty table (a silent empty vocabulary would
    // tokenize everything char-by-char downstream)
    intercept[IllegalArgumentException](
      BpeVocab.write(spark, Nil, "/tmp/graft-ec-bpev"))
    // band-index merge of an EMPTY batch: no staging left behind, the
    // high-water mark does not advance
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ec-band").toString
    Dedup.writeBandIndex(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), "text", "doc_id",
      dir)
    assert(Dedup.mergeBandIndex(spark, dir,
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      "text", "doc_id", batchId = 5L) == 0L)
    assert(Dedup.readBandBatchId(spark, dir).isEmpty)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_staging_")))
    // merging into an unparameterized (pre-meta) index refuses loudly
    val bare = java.nio.file.Files
      .createTempDirectory("graft-ec-band2").toString
    Dedup.buildBandIndex(Seq((1L, "a b c d e")).toDF("doc_id", "text"),
        "text", "doc_id")
      .write.mode("overwrite").partitionBy("band_idx").parquet(bare)
    intercept[IllegalArgumentException](
      Dedup.mergeBandIndex(spark, bare,
        Seq((2L, "f g h i j")).toDF("doc_id", "text"),
        "text", "doc_id", 1L))
  }

  test("round-11 late ops are total on empty and degenerate input") {
    import graft.functions.Url
    import graft.operators.{Curation, Multimodal, Robots, TextAnalysis}
    import org.apache.spark.sql.functions.col
    // robots meta on empty / meta-free / null-free degenerate pages
    val meta = Seq("", "<p>no meta</p>",
        "<meta name=\"robots\" content=\"\">")
      .toDF("page")
      .select(Robots.metaDirectiveColumns(col("page")): _*)
      .collect()
    // all three: no directives -> indexable, followable
    meta.foreach(r => assert(r.toSeq == Seq(0L, 0L, 1L, 1L)))
    // registeredDomain totality: empty, dots-only, trailing-dot-only
    Seq("", ".", "..", "com.", "localhost").foreach { h =>
      val r = Seq(h).toDF("h").select(Url.registeredDomain(col("h")))
        .collect().head
      assert(r.isNullAt(0), s"host '$h' must yield null")
    }
    // surt of bare scheme://host and of an empty string
    assert(Seq("http://x.y").toDF("u").select(Url.surt(col("u")))
      .collect().head.getString(0) == "y,x)/")
    assert(Seq("").toDF("u").select(Url.surt(col("u")))
      .collect().head.isNullAt(0))
    // structure walks on empty payloads: None, never a throw
    assert(Multimodal.parseJpeg(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseGif(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseJpeg(Array[Byte](-1, -40)).isEmpty) // bare SOI
    // chunking empty text -> zero chunks; budget 1 -> one per sentence
    assert(Seq("").toDF("t")
      .select(TextAnalysis.chunkSentences(col("t"), 10))
      .collect().head.getSeq[String](0).isEmpty)
    assert(Seq("Aa bb. Cc dd. Ee").toDF("t")
      .select(TextAnalysis.chunkSentences(col("t"), 1))
      .collect().head.getSeq[String](0).length == 3)
    // RAKE on stopword-only and empty text: no phrases, no rows
    assert(Seq("the of and a", "").toDF("t")
      .select(Curation.rakePhrases(col("t")))
      .collect().forall(_.getSeq[String](0).isEmpty))
    assert(Curation.rakeKeywords(
      Seq((1L, "the and of")).toDF("doc_id", "text"),
      "text", "doc_id").count() == 0)
  }

  test("round-12 operators on degenerate inputs") {
    import graft.operators.{Curation, Dedup, Events, Retrieval,
      TextAnalysis}
    // goodTuring: single-word corpus — one (r=1, N_1=1) row, all mass
    // unseen except the word itself
    val gt = Curation.goodTuring(Seq("only").toDF("text"), "text")
      .collect()
    assert(gt.length == 1 && gt.head.getAs[Long]("r") == 1L &&
      gt.head.getAs[Long]("p_unseen_ppb") == 1000000000L)
    // f2Sketch: empty input — k rows of z=0, est=0 (sum over nothing)
    val f2 = Curation.f2Sketch(
      Seq.empty[String].toDF("v"), "v", k = 4).collect()
    assert(f2.isEmpty || f2.forall(_.getAs[Long]("f2_est") == 0L))
    // cusum: single key, single hour — peak 0 at that hour
    val cu = Events.cusumPeaks(
      Seq((Timestamp.valueOf("2024-01-01 00:30:00"), "x"))
        .toDF("ts", "event_type"), "ts", "event_type").head()
    assert(cu.getAs[Long]("peak_cusum") == 0L &&
      cu.getAs[Long]("n_windows") == 1L)
    // relativeFilter: constant scores — everything clears its own median
    assert(Curation.relativeFilter(
      Seq((1L, "a", 5L), (2L, "a", 5L)).toDF("id", "k", "s"),
      "k", "s").count() == 2)
    // ngramNovelty against an EMPTY reference: everything is novel
    val nv = Curation.ngramNovelty(
      Seq((1L, "a b c d")).toDF("doc_id", "text"),
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "text", "doc_id").head()
    assert(nv.getAs[Long]("novelty_pct") == 100L)
    // anchors: page with no links at all
    assert(Seq("<p>plain</p>").toDF("t")
      .select(TextAnalysis.htmlAnchors(
        org.apache.spark.sql.functions.col("t")))
      .collect().head.getSeq[Any](0).isEmpty)
    // star contraction with no pairs: every id its own component
    assert(Dedup.connectedComponentsStar(
      Seq(1L, 2L).toDF("doc_id"), "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 2L))
    // rankingEval with k larger than any list: hits bounded by rel ∩ list
    val re = Retrieval.rankingEval(
      Seq(("q", 1L, 1L)).toDF("query_id", "doc_id", "rank"),
      Seq(("q", 1L)).toDF("query_id", "doc_id"), k = 100).head()
    assert(re.getAs[Long]("rr_ppm") == 1000000L &&
      re.getAs[Long]("hits_at_k") == 1L)
  }

  test("round-14 operators on degenerate inputs") {
    import graft.operators.{Multimodal, TextAnalysis}
    // dedupSentences on an empty string: split yields one empty
    // sentence — it survives (trivially unique), nothing removed
    val ds = TextAnalysis.dedupSentences(
      Seq((1L, "")).toDF("id", "t"), "t", "id").head()
    assert(ds.getAs[String]("text_dedup") == "" &&
      ds.getAs[Long]("n_sentences") == 1L &&
      ds.getAs[Long]("n_removed") == 0L)
    // empty frame: empty result, schema intact
    val empty = TextAnalysis.dedupSentences(
      Seq.empty[(Long, String)].toDF("id", "t"), "t", "id")
    assert(empty.isEmpty &&
      empty.columns.toSeq ==
        Seq("id", "text_dedup", "n_sentences", "n_removed"))
    // energySegments on a clip shorter than one window: the single
    // partial window gates against its own length
    val short = Multimodal.energySegments(
      Multimodal.WavData(8000, 1, 16, Array(40)), 25, 100)
    assert(short ==
      Seq(Multimodal.AudioSegment(0, 0, 1, 1, 1600)))
    // grayPatchStats on a 1-pixel image at any p: one patch
    assert(Multimodal.grayPatchStats(Array(7), 1, 5) ==
      Seq(Multimodal.PatchStat(0, 0, 1, 7, 49)))
  }

  test("round-15 API edges: forget guards, mask no-ops") {
    import graft.operators.{Forget, ForgetTargets, TombstoneMask}
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    // forget with no targets / nothing to forget: loud, not silent
    intercept[IllegalArgumentException] {
      Forget.forgetDocuments(spark, d, "text", "doc_id", ForgetTargets())
    }
    intercept[IllegalArgumentException] {
      Forget.forgetDocuments(spark, d.filter(col("doc_id") < 0L),
        "text", "doc_id", ForgetTargets(bm25 = Seq("/nowhere")))
    }
    // vacuuming empty targets is an empty report, not an error
    assert(Forget.vacuumForgotten(spark, ForgetTargets()).isEmpty)
    // mask against a MISSING tombstone table is the identity frame
    val dir = Files.createTempDirectory("graft-edge-mask").toString
    assert(TombstoneMask.antiJoin(spark, d, s"$dir/absent",
      "doc_id", "doc_id").collect().length == 1)
    assert(TombstoneMask.footerRowCount(spark, s"$dir/absent") == 0L)
    // footer row count over a real table equals its row count
    d.write.parquet(s"$dir/t")
    assert(TombstoneMask.footerRowCount(spark, s"$dir/t") == 1L)
  }

  test("farthestPointSample: stops early past the corpus, radius monotone") {
    import graft.operators.Similarity
    val e = Seq(
      (10L, Array(0f, 0f)), (20L, Array(1f, 0f)),
      (30L, Array(0f, 2f)), (40L, Array(0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.farthestPointSample(e, "vec_id", "embedding",
      k = 10).collect()
    // k beyond the corpus: every point selected once, then stop
    assert(out.length == 4)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 10L &&
      out.head.getLong(2) == 0L)
    // the coverage radius (dist to chosen set at selection) never grows
    val radii = out.sortBy(_.getLong(0)).map(_.getLong(2)).drop(1)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a }, radii.toSeq)
    // farthest from (0,0) on the 1e5 grid is (0,2): picked second
    assert(out(1).getLong(1) == 30L)
    // the near-duplicate of the seed is picked LAST
    assert(out.last.getLong(1) == 40L)
  }

  test("mmrSelect: relevance first, redundancy penalized, λ extremes") {
    import graft.operators.Similarity
    // q = (1,0); a/b near-identical high-relevance pair, c orthogonal
    val e = Seq(
      (5L, Array(1f, 0f)),        // the query itself (excluded)
      (1L, Array(0.9f, 0.1f)),    // a: most relevant
      (2L, Array(0.9f, 0.11f)),   // b: a's near-duplicate
      (3L, Array(0f, 1f)))        // c: irrelevant but diverse
      .toDF("vec_id", "embedding")
    def pick(num: Long, den: Long) =
      Similarity.mmrSelect(e, "vec_id", "embedding", queryId = 5L,
        k = 3, lambdaNum = num, lambdaDen = den, poolSize = 3)
        .orderBy("sel_idx").collect().map(_.getLong(1)).toSeq
    // λ=1: pure relevance order a, b, c
    assert(pick(1, 1) == Seq(1L, 2L, 3L))
    // diversity-leaning λ: after a, the diverse c beats a's near-dup b
    assert(pick(1, 10) == Seq(1L, 3L, 2L))
    // first pick is ALWAYS the most relevant (redundancy term is 0),
    // even at λ=0 where every later score is pure anti-redundancy
    assert(pick(0, 1).head == 1L)
    // ... including when the most relevant candidate does NOT have the
    // smallest id (a λ·rel=0 tie-break would wrongly pick id 1 here)
    val e2 = Seq((5L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    assert(Similarity.mmrSelect(e2, "vec_id", "embedding", 5L, 2, 0L,
      1L, 2).orderBy("sel_idx").collect().map(_.getLong(1)).head == 2L)
    // scores at selection time never increase
    val sc = Similarity.mmrSelect(e, "vec_id", "embedding", 5L, 3, 7L,
      10L, 3).orderBy("sel_idx").collect().map(_.getLong(3))
    assert(sc.zip(sc.tail).forall { case (a, b) => b <= a }, sc.toSeq)
    // k beyond the pool stops early; query must exist exactly once
    assert(Similarity.mmrSelect(e, "vec_id", "embedding", 5L, 10, 7L,
      10L, 30).collect().length == 3)
    intercept[IllegalArgumentException](
      Similarity.mmrSelect(e, "vec_id", "embedding", 99L, 2, 7L, 10L, 2))
  }

  test("randomProject: md5-parity signs, exact integers, dup at dist 0") {
    import graft.operators.Similarity
    val e = Seq(
      (1L, Array(0.5f, -0.25f, 1f)),
      (2L, Array(0.5f, -0.25f, 1f)),   // exact duplicate of 1
      (3L, Array(-1f, 0f, 0.125f)),
      (5L, Array(0.5f, -0.25f, 1f)))   // query (also duplicate)
      .toDF("vec_id", "embedding")
    // the documented sign convention, recomputed independently
    def sign(j: Int, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$i".getBytes("UTF-8"))
      if ((((d(0) >> 4) & 0xf) % 2) == 0) 1L else -1L
    }
    val scaled = Array(50000L, -25000L, 100000L) // round(x * 1e5)
    val want = (0 until 2).map(j =>
      (0 until 3).map(i => scaled(i) * sign(j, i)).sum)
    val rp = Similarity.randomProject(e, "vec_id", "embedding",
        dim = 3, outDim = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rp(1L) == want)
    assert(rp(2L) == rp(1L)) // identical input, identical projection
    // the projected top-k puts the exact duplicates first at dist 0
    val top = Similarity.rpTopK(e, "vec_id", "embedding", 3, 2,
      queryId = 5L, k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top.forall(_.getLong(1) == 0L))
    intercept[IllegalArgumentException](
      Similarity.randomProject(e, "vec_id", "embedding", 3, 4))
  }
}
