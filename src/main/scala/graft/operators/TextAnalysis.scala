package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHash64

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, marker-based language identification, and document
  * fingerprinting. Everything is composed from codegen'd built-ins (split/
  * transform/filter/md5) — one narrow pass per document, no shuffle — so
  * cost is linear in corpus bytes and the operators parallelize trivially
  * at 100 TB. All scoring is deterministic and engine-portable. */
object TextAnalysis {

  /** simhash64(text) as a Column (native codegen'd expression). */
  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))

  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens that appear in `words` — the shared hit-count
    * primitive behind stopword ratios, Gopher's stopword rule, and the
    * language-marker scores. Long so callers can cross-multiply. */
  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of character n-chunks — length-based,
    * ceil(chars/4) per token summed, a standard fast token estimate. */
  def subwordEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Quality heuorics: token count, mean token length, stopword ratio,
    * punctuation ratio, alphabetic ratio. */
  def qualityColumns(text: Column, stopwords: Seq[String]): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val meanLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
      .cast("double") / nTok.cast("double")
    val stopHits = hitCount(toks, stopwords)
    val punct = length(text) - length(regexp_replace(text, "[.,;:!?'\"]", ""))
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
    Seq(
      nTok.as("n_tokens"),
      meanLen.as("mean_token_len"),
      (stopHits.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (punct.cast("double") / length(text).cast("double")).as("punct_ratio"),
      (alpha.cast("double") / length(text).cast("double")).as("alpha_ratio"))
  }

  /** Gopher-style quality-rule flags (Rae et al. 2021 §A1.1, adapted):
    * one boolean per rule plus the conjunction, emitted as 1/0 BIGINTs so
    * the verdict is hash-portable. Every threshold is an exact integer
    * CROSS-MULTIPLICATION (`total_len ≥ 3·n_tokens`, never
    * `total_len/n_tokens ≥ 3.0`) — no float ratios, so pass/fail is
    * bit-stable across engines and partitionings. Rules:
    *   - word count within [minTokens, maxTokens];
    *   - mean word length within [3, 10] chars;
    *   - symbol-to-word ratio ('#' chars + '…'/'...' marks) ≤ 0.1;
    *   - ≤ 90% of lines start with a bullet ('-', '*', '•');
    *   - ≤ 30% of lines end with an ellipsis;
    *   - ≥ 80% of words contain an alphabetic character;
    *   - ≥ 2 stopword hits.
    * All per-row compute — a narrow codegen'd pass, zero shuffles at any
    * corpus size; `gopher_keep` is the ingest-boundary filter column. */
  def gopherColumns(text: Column, stopwords: Seq[String],
      minTokens: Int = 20, maxTokens: Int = 90): Seq[Column] = {
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"need 1 <= minTokens <= maxTokens, got [$minTokens, $maxTokens]")
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val totLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("long")
    val ellipses = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[a-zA-Z]")))
      .cast("long")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val dots3 =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val uni = length(text) - length(regexp_replace(text, "…", ""))
    val symbols = (hashes + dots3 + uni).cast("long")
    val stopHits = hitCount(toks, stopwords)
    // ONE condition list drives both the per-rule flags and the
    // conjunction — a threshold edit cannot desynchronize them
    val rules: Seq[(Column, String)] = Seq(
      (nTok >= minTokens && nTok <= maxTokens) -> "ok_word_count",
      (totLen >= nTok * 3 && totLen <= nTok * 10) -> "ok_mean_word_len",
      (symbols * 10 <= nTok) -> "ok_symbol_ratio",
      (bullets * 10 <= nLines * 9) -> "ok_bullet_lines",
      (ellipses * 10 <= nLines * 3) -> "ok_ellipsis_lines",
      (alphaWords * 10 >= nTok * 8) -> "ok_alpha_words",
      (stopHits >= 2) -> "ok_stopwords")
    def flag(c: Column, name: String): Column =
      when(c, 1L).otherwise(0L).as(name)
    rules.map((flag _).tupled) :+
      flag(rules.map(_._1).reduce(_ && _), "gopher_keep")
  }

  /** Marker-word profiles for language ID. Deterministic scoring: hits of
    * each language's marker set; winner = max score, ties broken by
    * language code order (ensures engine-portable argmax). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "not"),
    "es" -> Seq("el", "la", "de", "y", "no"),
    "fr" -> Seq("le", "la", "de", "et", "ne"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "he2")
  )

  def langScores(text: Column): Seq[Column] = {
    val toks = tokens(text)
    langMarkers.map { case (lang, markers) =>
      hitCount(toks, markers).as(s"score_$lang")
    }
  }

  /** Detected language: argmax of marker scores with first-wins tie-break
    * in [[langMarkers]] order; "und" (undetermined) when all scores are 0. */
  def detectedLang(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (l, m) => (l, hitCount(toks, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Language-ID CONFIDENCE — the routing signal downstream of
    * [[detectedLang]]'s argmax: best marker score, runner-up score,
    * their margin, and a `is_mixed` flag (several languages tie at a
    * positive best — route to a heavier classifier instead of trusting
    * the heuristic). Second-max via one sorted 5-element array; narrow
    * pass, exact integers. */
  def langConfidence(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val sorted = sort_array(
      array(langMarkers.map { case (_, m) => hitCount(toks, m) }: _*),
      asc = false)
    val best = element_at(sorted, 1)
    val second = element_at(sorted, 2)
    Seq(best.as("score_best"), (best - second).as("margin"),
      when(best > 0 && best === second, 1L).otherwise(0L).as("is_mixed"))
  }

  /** Unicode-script character classes, as `\x{...}` codepoint ranges —
    * the ONE regex range syntax Java and RE2 read identically (named
    * properties differ: Java `\p{IsCyrillic}` vs RE2 `\p{Cyrillic}`).
    * Latin excludes × (U+00D7) and ÷ (U+00F7); CJK = Han + kana +
    * Hangul syllables (the routing-grain split, not a full script
    * taxonomy). All ranges are BMP, so `length` counts agree
    * cross-engine. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> ("A-Za-z\\x{00c0}-\\x{00d6}\\x{00d8}-\\x{00f6}" +
      "\\x{00f8}-\\x{024f}"),
    "cyrillic" -> "\\x{0400}-\\x{04ff}",
    "greek" -> "\\x{0370}-\\x{03ff}",
    "arabic" -> "\\x{0600}-\\x{06ff}",
    "hebrew" -> "\\x{0590}-\\x{05ff}",
    "devanagari" -> "\\x{0900}-\\x{097f}",
    "cjk" -> ("\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}" +
      "\\x{ac00}-\\x{d7af}"))

  /** Script histogram + routing verdict — the split UPSTREAM of the
    * stopword-marker language ID ([[langScores]] only speaks Latin):
    * per-script character counts (strike-out counting: `length` minus
    * the length with the class removed — no per-char explode), the
    * dominant script by argmax with first-wins tie in [[scriptRanges]]
    * order ("zzzz" when no script character occurs, the ISO 15924
    * unknown tag), and a mixed flag when a second script reaches >25%
    * of the first (cross-multiplied, no floats) — the
    * wrong-script-residue signal CCNet-style pipelines filter on.
    * Narrow codegen'd pass, zero shuffle. */
  def scriptColumns(text: Column): Seq[Column] = {
    val counts = scriptRanges.map { case (name, r) =>
      name -> (length(text) -
        length(regexp_replace(text, s"[$r]", ""))).cast("long")
    }
    val best = counts.map(_._2).reduce(greatest(_, _))
    val dominant = counts.foldRight(lit("zzzz"): Column) {
      case ((name, c), acc) =>
        when(c === best && best > 0, lit(name)).otherwise(acc)
    }
    val second = element_at(
      sort_array(array(counts.map(_._2): _*), asc = false), 2)
    counts.map { case (name, c) => c.as(s"n_$name") } ++ Seq(
      dominant.as("script"),
      when(best > 0 && second * 4 > best, 1L).otherwise(0L)
        .as("script_mixed"))
  }

  /** Sentence segmentation as an array column, by ONE deterministic
    * engine-portable rule: a sentence ends at `[.!?]` runs followed by
    * spaces and an upper-case letter or digit (the next sentence's
    * start). No lookaround — RE2 has none, so the boundary is marked by
    * a grouped replace (`$1`+U+0001+`$2` — the groups survive, only the
    * gap char changes) and split on the sentinel; an oracle replays the
    * same two steps with RE2's `\1` syntax. Abbreviation-adjacent
    * periods followed by lower-case ("e.g. word") never split. Narrow
    * pass, zero shuffle; explode downstream for sentence-level dedup /
    * chunking. */
  def sentenceSplit(text: Column): Column =
    split(
      regexp_replace(text, "([.!?]) +([A-Z0-9])", "$1\u0001$2"),
      "\u0001")

  /** Intra-document duplicate-sentence removal — the repetition CLEANUP
    * the Gopher/CCNet rule family flags (`repetition_signals` measures;
    * this one repairs): [[sentenceSplit]]'s sentences keep only their
    * FIRST occurrence (exact string match, order preserved — boilerplate
    * headers, duplicated paragraphs, and copy-paste loops collapse to
    * one copy), survivors re-join with one space (the separator the
    * boundary regex consumed). Emits the cleaned text beside exact
    * counts so a pipeline can filter on the removal ratio instead of
    * keeping the rewrite unconditionally. The first-occurrence filter is
    * a higher-order `filter` with an `array_position` probe — O(n²) in
    * SENTENCES per doc (a document has hundreds, not millions; the
    * scaling axis is documents), narrow, codegen'd, zero shuffle. */
  def dedupSentences(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val sents = sentenceSplit(col(textCol))
    val kept = filter(sents, (x, i) =>
      array_position(sents, x) === i.cast("long") + 1L)
    df.select(col(idCol),
      concat_ws(" ", kept).as("text_dedup"),
      size(sents).cast("long").as("n_sentences"),
      (size(sents) - size(kept)).cast("long").as("n_removed"))
  }

  /** CROSS-document boilerplate-line removal — the corpus-level
    * counterpart of [[dedupSentences]] (which collapses repeats WITHIN
    * one document): a line that occurs in at least `minDocs` distinct
    * documents of the same `groupCol` (site/domain/source) is
    * boilerplate — cookie banners, navigation, "all rights reserved"
    * footers — and is dropped from EVERY document of that group, first
    * copy included (CCNet removes such lines by document-frequency per
    * shard for exactly this reason: the first occurrence of a cookie
    * banner is as worthless as the ten-thousandth). Empty/whitespace
    * lines are never flagged; matching is exact on the line string.
    * Survivors re-join with `\n` in original order.
    *
    * Scale shape: one shuffle to count distinct docs per (group, line),
    * one join back (the flagged side is the RARE side — lines above a
    * document-frequency threshold — so AQE broadcasts it when it fits;
    * the join key is (group, line) so a skewed mega-group still splits
    * by line), one shuffle to reassemble documents. Line frequency is
    * computed on line VALUES, never by pairing documents — no quadratic
    * term anywhere. Output: `(idCol, text_clean, n_lines, n_removed)`
    * with exact counts so a pipeline can gate on the removal ratio. */
  def removeBoilerplateLines(df: DataFrame, textCol: String,
      idCol: String, groupCol: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol).as("_id"), col(groupCol).as("_g"),
      posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val flagged = lines
      .filter(trim(col("_line")) =!= "")
      .groupBy(col("_g"), col("_line"))
      .agg(countDistinct(col("_id")).as("_nd"))
      .filter(col("_nd") >= minDocs.toLong)
      .select(col("_g"), col("_line"), lit(true).as("_boiler"))
    lines.join(flagged, Seq("_g", "_line"), "left")
      .withColumn("_drop", coalesce(col("_boiler"), lit(false)))
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("_drop").cast("long")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(!col("_drop"),
            struct(col("_pos"), col("_line"))))),
          x => x.getField("_line")), "\n").as("text_clean"))
      .select(col("_id").as(idCol), col("text_clean"),
        col("n_lines"), col("n_removed"))
  }

  /** Greedy sentence-aligned chunking — the unit-maker for RAG
    * retrieval and context packing where a mid-sentence cut destroys
    * the unit's meaning: [[sentenceSplit]]'s sentences pack left to
    * right, a chunk closes when appending the next sentence would
    * push it past `budgetChars` (so every chunk is ≤ budget unless a
    * SINGLE sentence exceeds it — that sentence becomes its own
    * oversized chunk rather than being cut), sentences within a chunk
    * re-join with one space. The fold is one higher-order `aggregate`
    * per row — narrow, zero shuffle, `posexplode` downstream — and
    * deliberately sequential-greedy per document (chunking is
    * inherently order-dependent; the parallelism axis is documents,
    * which is the axis that scales). Exactly replayable: the oracle
    * walks the same three-branch step as a recursive CTE. Empty text
    * yields no chunks. */
  def chunkSentences(text: Column, budgetChars: Int): Column = {
    val zero = struct(
      expr("cast(array() as array<string>)").as("chunks"),
      lit("").as("cur"))
    aggregate(sentenceSplit(text), zero,
      (acc, s) => {
        val chunks = acc.getField("chunks")
        val cur = acc.getField("cur")
        val joined = concat(cur, lit(" "), s)
        when(cur === "", struct(chunks.as("chunks"), s.as("cur")))
          .when(length(joined) <= budgetChars,
            struct(chunks.as("chunks"), joined.as("cur")))
          .otherwise(struct(
            concat(chunks, array(cur)).as("chunks"), s.as("cur")))
      },
      acc => when(acc.getField("cur") === "", acc.getField("chunks"))
        .otherwise(concat(acc.getField("chunks"),
          array(acc.getField("cur")))))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Winnowing fingerprints (Schleimer et al., "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * scheme): polynomial rolling hashes of every k-gram of characters,
    * then the MINIMUM hash of each sliding window of `w` consecutive
    * k-gram hashes, deduplicated. Guarantees any substring match of
    * length ≥ k + w − 1 between two documents shares a fingerprint —
    * partial-overlap detection where whole-document hashing fails.
    *
    * Arithmetic is chosen for cross-engine exactness: with k = 5 and
    * base 257, the largest hash is < 2⁴³, so every intermediate value is
    * an exact integer in a double — bit-identical in any engine — and no
    * modulus is needed. All per-row compute, shuffle-free. */
  /** Per-row exact-phrase occurrence count — the NARROW twin of
    * [[Retrieval.phraseSearch]]: no explode, no join, no shuffle, just a
    * codegen'd sliding check over the token array. Overlapping
    * occurrences all count (one per start position), identical to the
    * positional-index semantics (a property test pins the two
    * implementations to each other). The narrow form is what a
    * STREAMING filter or a short-phrase scan without a positional index
    * wants; the join form wins when the phrase terms' postings are far
    * smaller than the corpus. `\s+` tokenization, same as the index. */
  def phraseHits(text: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phraseHits: empty phrase")
    require(phrase.forall(_.nonEmpty), "phraseHits: empty term")
    val toks = split(text, "\\s+")
    val k = phrase.size
    // sequence() is DESCENDING when start > stop, so short docs must
    // short-circuit before building the start list
    when(size(toks) >= k,
      size(filter(sequence(lit(0), size(toks) - k),
        i => phrase.zipWithIndex.map { case (w, j) =>
          element_at(toks, i + j + 1) === w
        }.reduce(_ && _))).cast("long"))
      .otherwise(lit(0L))
  }

  /** Per-pattern overlapping substring counts from ONE Aho-Corasick
    * byte pass (`array<long>` aligned with `patterns` — the native
    * [[org.apache.spark.sql.graft.MultiPatternCounts]] expression).
    * The multi-pattern generalization of [[phraseHits]]: k patterns as
    * k passes (or one backtracking alternation regex) cost k·len per
    * row; the automaton reads each byte once, whatever k is — the
    * blocklist / lexicon / PII-term scan primitive. Matching is raw
    * substring over UTF-8 bytes (no token boundaries — "can" counts
    * inside "scan"); anchor patterns with spaces for word semantics. */
  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    GraftShims.column(org.apache.spark.sql.graft.MultiPatternCounts(
      GraftShims.expression(text), patterns))

  /** Every overlapping occurrence of every pattern masked to `*` in
    * the same single Aho-Corasick pass — the blocklist SCRUB beside
    * [[multiPatternCounts]]'s COUNT (chained per-pattern
    * `regexp_replace` costs k passes and its result depends on
    * replacement ORDER under overlaps; masking the union of match
    * spans is order-free by construction). Same substring-over-bytes
    * matching rule; unmatched text passes through untouched. */
  def multiPatternRedact(text: Column, patterns: Seq[String]): Column =
    GraftShims.column(org.apache.spark.sql.graft.MultiPatternRedact(
      GraftShims.expression(text), patterns))

  /** [[multiPatternCounts]] unrolled to hit rows: `(idCol, pattern,
    * n_hits)` for every (document, pattern) with ≥ 1 overlapping
    * occurrence. Zero shuffles — the automaton pass, the posexplode
    * and the filter are all narrow; output size is bounded by actual
    * hits, never |docs|·|patterns|. */
  def multiPatternHits(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit(_)): _*)
    df.select(col(idCol),
        posexplode(multiPatternCounts(col(textCol), patterns))
          .as(Seq("_i", "n_hits")))
      .filter(col("n_hits") > 0L)
      .select(col(idCol), element_at(pats, col("_i") + 1).as("pattern"),
        col("n_hits"))
  }

  /** Deflate compression ratio — the classic cheap repetition/quality
    * signal (the Gopher/FineWeb lineage uses it as a junk detector:
    * templated or looping text compresses far below natural prose,
    * random noise compresses above 1000‰ once the deflate framing is
    * paid). Output per doc: `(doc_id, n_bytes, n_deflate_bytes,
    * ratio_permille = deflate·1000 div bytes)`.
    *
    * SPEC-GATED (rows-only driver check): DuckDB has no deflate, so no
    * SQL oracle can exist — semantics are pinned by ScalaTest
    * (repetitive < prose < noise ordering, determinism, empty text).
    * Raw deflate (nowrap, default level), one `Deflater` per PARTITION
    * reset per row — narrow, zero shuffle, linear in corpus bytes. */
  def compressionRatio(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_id"),
        col(textCol).cast("string").as("_t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        // release the native zlib buffers when the task ends — relying
        // on finalization leaks off-heap memory on long-lived executors
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, t) =>
          val in = (if (t == null) "" else t).getBytes("UTF-8")
          if (in.length == 0) (id, 0L, 0L, 1000L) // empty: neutral, no
          else {                                  // 2-byte empty block
            d.reset(); d.setInput(in); d.finish()
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            (id, in.length.toLong, n, n * 1000L / in.length)
          }
        }
      }.toDF("doc_id", "n_bytes", "n_deflate_bytes", "ratio_permille")
  }

  /** Gazetteer span extraction — the weak-labeling face of the same
    * automaton: one row per overlapping occurrence, `(idCol, pattern,
    * start)` with `start` the exact 0-based byte offset — what an
    * NER-style weak supervisor or span-level scrubber consumes where
    * [[multiPatternHits]] only says how many. Zero shuffles (automaton
    * pass + explode are narrow); output is bounded by actual matches.
    * Byte offsets equal char offsets on ASCII text; multi-byte text
    * gets byte semantics (documented, same rule as the counts face). */
  def multiPatternSpans(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit(_)): _*)
    val spansCol = GraftShims.column(
      org.apache.spark.sql.graft.MultiPatternSpans(
        GraftShims.expression(col(textCol)), patterns))
    df.select(col(idCol), explode(spansCol).as("m"))
      .select(col(idCol),
        element_at(pats, col("m.pat") + 1).as("pattern"),
        col("m.start").cast("long").as("start"))
  }

  def winnowingFingerprints(textCol: Column, k: Int = 5,
      w: Int = 4): Column = {
    require(k >= 1 && k <= 6,
      s"k in [1, 6] (k > 6 overflows exact double integer arithmetic), got $k")
    require(w >= 1, s"window w must be >= 1, got $w")
    // native one-pass rolling hash ([[org.apache.spark.sql.graft
    // .WinnowFingerprints]]): the composable transform/aggregate form is
    // identical but re-evaluates a Catalyst subtree per character
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.WinnowFingerprints(
        org.apache.spark.sql.GraftShims.expression(textCol), k, w))
  }

  /** All unordered term pairs within Levenshtein edit distance 1 —
    * the fuzzy-key linkage primitive behind spelling normalization
    * (misspelled-token folding before dedup/frequency counting) and
    * near-key record blocking.
    *
    * SCALE: the naive formulation is a quadratic cross join with a
    * per-pair edit-distance test — dead at any real vocabulary size.
    * This is the FastSS/SymSpell blocking instead: each term expands to
    * its ≤ length+1 single-character-DELETION variants (plus itself),
    * candidates are the pairs sharing a variant — an equi-join a hash
    * join executes — and only candidates pay the edit-distance check
    * (codegen'd, early-exit threshold form). The blocking is exact for
    * distance ≤ 1: a substitution at position i means both terms share
    * the delete-at-i variant; an insertion/deletion means one term IS a
    * variant of the other. The verify filter removes the false
    * candidates (e.g. transpositions at distance 2 that share two
    * variants). Variant fan-out is O(term length), so the candidate set
    * scales with Σ len(term) · bucket-collision rate, not vocabulary².
    *
    * Input rows are distinct-ed and null/empty terms dropped; output is
    * (a, b) with a < b, one row per pair. */
  def fuzzyTermPairs(terms: DataFrame, termCol: String): DataFrame = {
    val t = terms.select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull && length(col("term")) > 0)
      .distinct()
    val c = col("term")
    val n = length(c)
    // delete-at-p (1-based): prefix [1, p-1] ++ suffix [p+1, end]
    val dels = transform(sequence(lit(1), n),
      p => concat(c.substr(lit(1), p - lit(1)), c.substr(p + lit(1), n)))
    val v = t.select(c, explode(array_union(array(c), dels)).as("variant"))
    v.as("va").join(v.as("vb"),
        col("va.variant") === col("vb.variant") &&
          col("va.term") < col("vb.term"))
      .select(col("va.term").as("a"), col("vb.term").as("b"))
      .distinct()
      .filter(levenshtein(col("a"), col("b"), 1) === 1)
  }

  /** Vocabulary canonicalization over the [[fuzzyTermPairs]] graph:
    * every term maps to the lexicographically smallest term of its
    * edit-distance-1 CONNECTED COMPONENT — "tabel", "tble" and "table"
    * all fold to one spelling even when only chains of single edits
    * connect them (the reason pair output alone is not a fold). The
    * normalization step before frequency counting / dedup keying.
    *
    * Composition: P85's deletion-neighborhood pair graph feeds the
    * dedup component machinery ([[Dedup.connectedComponents]] — min-
    * label propagation over the PAIR GRAPH only, isolated terms join
    * back at the end, `checkpointDir` for cluster-grade lineage cuts).
    * Components propagate 60-bit md5 term ids (the [[KmvDistinct]]
    * hash convention; the label sum that detects convergence needs a
    * numeric); the canonical SPELLING is then the component's min
    * term — one aggregate + one join past the component labels.
    * Output: (term, canon) for every distinct non-empty input term. */
  def fuzzyFold(terms: DataFrame, termCol: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val t = terms.select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull && length(col("term")) > 0)
      .distinct()
    def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val pairs = fuzzyTermPairs(t, "term")
      .select(h60(col("a")).as("id_a"), h60(col("b")).as("id_b"))
    val comp = Dedup.connectedComponents(
      t.select(h60(col("term")).as("tid")), "tid", pairs,
      checkpointDir = checkpointDir)
    val labeled = t.withColumn("tid", h60(col("term")))
      .join(comp, col("tid") === col("id"))
      .select(col("term"), col("component"))
    val canon = labeled.groupBy(col("component"))
      .agg(min(col("term")).as("canon"))
    labeled.join(canon, "component").select(col("term"), col("canon"))
  }

  /** Leakage-safe deterministic train/val/test assignment. The split key
    * is the CONTENT fingerprint, not the document id: near-identical or
    * byte-identical duplicates hash to the same bucket, so a document can
    * never sit in train while its copy sits in test — the classic
    * contamination bug in id-hashed splits. Content-derived (no RNG):
    * identical across runs, engines and cluster sizes; narrow per-row
    * compute, no shuffle. Buckets come from the first 4 fingerprint hex
    * digits (16-bit space, granularity 1/65536 per weight unit). */
  def contentSplit(text: Column, trainWeight: Int = 8, valWeight: Int = 1,
      testWeight: Int = 1): Column = {
    val total = trainWeight + valWeight + testWeight
    val bucket = conv(substring(fingerprint(text), 1, 4), 16, 10)
      .cast("long") % total
    when(bucket < trainWeight, "train")
      .when(bucket < trainWeight + valWeight, "val")
      .otherwise("test")
  }

  // ------------------------------------------------------- HTML extract

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Decode the HTML entities a text-extraction pass must invert
    * (`&lt; &gt; &quot; &#39; &apos; &nbsp;`, and `&amp;` LAST so
    * double-escaped sequences don't over-decode). Exotic named entities
    * pass through untouched — a boilerplate stripper, not a full
    * HTML5 entity table. */
  private def decodeEntities(c: Column): Column = {
    val basic = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
    val decoded = basic.foldLeft(c) { case (cc, (k, v)) =>
      replace(cc, lit(k), lit(v))
    }
    replace(decoded, lit("&amp;"), lit("&"))
  }

  /** `<title>` content of an HTML document (first occurrence,
    * entity-decoded, whitespace-collapsed); empty string when absent. */
  def htmlTitle(html: Column): Column =
    collapseWs(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Plain-text extraction from HTML — the boilerplate-stripping step
    * between [[graft.sources.Warc]] ingestion and the curation chain
    * (language-ID, quality scoring, dedup all operate on text, not
    * markup). Deliberately a NARROW, codegen-friendly regex chain — no
    * DOM, no external parser: drop `<script>`/`<style>` blocks and
    * comments, strip remaining tags, decode basic entities, collapse
    * whitespace. That recovers the rendered text of well-formed markup
    * exactly (the `html_extract` gate proves the inversion end to end);
    * the known limitation is adversarial markup (a literal `</script>`
    * inside a JS string ends the block early), which a pipeline treats
    * as quality-filter fodder, not an extraction bug. Zero shuffle,
    * linear in bytes — the 100 TB shape. */
  def htmlExtract(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    collapseWs(decodeEntities(noTags))
  }

  /** PDF-extracted-text cleanup — the repair pass every PDF-sourced
    * corpus needs before any token-level op (PDF extractors emit
    * hyphen-split words at line breaks, typographic ligature
    * codepoints tokenizers have never seen, stray control characters,
    * and hard-wrapped lines that are NOT paragraph breaks): ONE
    * documented rewrite order both engines replay — (1) join
    * `word-\nword` hyphen splits, (2) expand the five Latin ligatures
    * (ﬁ ﬂ ﬀ ﬃ ﬄ) to their letter pairs, (3) strip control chars
    * except newline, (4) reflow: blank-line runs mark PARAGRAPHS
    * (preserved as one `\n\n`), remaining single newlines are wrap
    * artifacts and become spaces, space runs collapse. Counts emit
    * beside the text so a pipeline can route "mostly-broken" docs to
    * re-extraction instead of trusting the repair. RE2-safe, zero
    * shuffle, linear in bytes. Output columns: `(pdf_clean,
    * n_hyphen_joins, n_ligatures, n_controls)`. */
  def pdfTextColumns(text: Column): Seq[Column] = {
    val hyphRe = "([a-z])-\n([a-z])"
    val ligRe = "[ﬁﬂﬀﬃﬄ]"
    val ctlRe = "[\u0000-\u0009\u000B-\u001F]"
    val nHyph = regexp_count(text, lit(hyphRe)).cast("long")
    val nLig = (length(text) -
      length(regexp_replace(text, ligRe, ""))).cast("long")
    val nCtl = (length(text) -
      length(regexp_replace(text, ctlRe, ""))).cast("long")
    val dehyph = regexp_replace(text, hyphRe, "$1$2")
    val expanded = Seq("ﬁ" -> "fi", "ﬂ" -> "fl",
      "ﬀ" -> "ff", "ﬃ" -> "ffi", "ﬄ" -> "ffl")
      .foldLeft(dehyph) { case (c, (lig, exp)) =>
        replace(c, lit(lig), lit(exp)) }
    val noCtl = regexp_replace(expanded, ctlRe, "")
    val paras = regexp_replace(noCtl, "\n[ \t]*\n[\n \t]*", "\u0002")
    val unwrapped = regexp_replace(paras, "\n", " ")
    val restored = regexp_replace(unwrapped, "\u0002", "\n\n")
    val clean = trim(regexp_replace(restored, "  +", " "))
    Seq(clean.as("pdf_clean"), nHyph.as("n_hyphen_joins"),
      nLig.as("n_ligatures"), nCtl.as("n_controls"))
  }

  /** Chat-transcript turn extraction — the unit-maker for
    * instruction/SFT data prep (a conversation trains turn by turn,
    * with loss on assistant turns only — the `train_on` column is that
    * mask at turn granularity): a turn starts where a line BEGINS with
    * a role marker `User: ` / `Assistant: ` / `System: `; everything
    * until the next marker (across newlines) is that turn's content.
    * Mid-line "User:" never splits (the `(?m)^` anchor), so quoted
    * markers inside content survive. Text before the first marker is
    * kept as a turn with role `''` (preamble/metadata — callers filter
    * or route it; silently dropping text is not this engine's style).
    *
    * Same sentinel trick as [[sentenceSplit]] (RE2 has no lookahead):
    * a grouped replace marks each boundary with U+0001, split on the
    * sentinel, parse the marker off each piece. `turn_idx` is the
    * piece index in the ORIGINAL split (an empty preamble piece is
    * dropped without re-indexing, so a transcript that starts with a
    * marker has turns 1..n — documented, oracle-mirrored). Narrow
    * codegen'd pass, zero shuffle; `posexplode` fan-out only. Output:
    * `(idCol, turn_idx, role, content, train_on)`. */
  def splitTurns(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val markerRe = "(?m)^(User|Assistant|System): "
    val pieces = split(
      regexp_replace(col(textCol), markerRe, "\u0001$1: "), "\u0001")
    df.select(col(idCol), posexplode(pieces).as(Seq("turn_idx", "_p")))
      .filter(length(col("_p")) > 0)
      .select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
        regexp_extract(col("_p"), "^(User|Assistant|System): ", 1)
          .as("role"),
        // regex trim, not trim(): a turn's content ends with the
        // newline that precedes the next marker, and trim() strips
        // spaces only
        regexp_replace(regexp_replace(col("_p"),
            "^(User|Assistant|System): ", ""),
          "^\\s+|\\s+$", "").as("content"))
      .withColumn("train_on", (col("role") === "Assistant").cast("long"))
  }

  /** Markdown → plain text + structure counts — [[htmlExtract]]'s
    * sibling for the OTHER dominant web-text format (READMEs, forums,
    * docs sites, chat exports): training-data pipelines want the prose
    * without link targets, code blocks, or emphasis markers, plus the
    * structure counts as quality signals (a "document" that is 90%
    * fenced code wants the code-detect route, not the prose route).
    *
    * ONE documented rewrite order both engines replay exactly (each
    * step counts, then strips): fenced code blocks ```…``` drop
    * entirely (non-greedy across lines); inline code spans keep their
    * content; images collapse to their alt text, then links to their
    * anchor text (images first — a link pattern would otherwise eat
    * `![alt](url)` leaving the `!`); ATX `#` header markers strip;
    * `**`/`*`/`__`/`_` emphasis unwraps (bounded, never across the
    * marker char); whitespace collapses. RE2-safe throughout (no
    * lookaround), so Java and DuckDB agree byte for byte. Zero
    * shuffle, linear in bytes. Output columns: `(md_plain,
    * n_code_blocks, n_code_spans, n_images, n_links, n_headers)`. */
  def markdownColumns(text: Column): Seq[Column] = {
    val blockRe = "(?s)```.*?```"
    val spanRe = "`([^`\n]*)`"
    val imageRe = "!\\[([^\\]]*)\\]\\(([^)]*)\\)"
    val linkRe = "\\[([^\\]]*)\\]\\(([^)]*)\\)"
    val headerRe = "(?m)^#{1,6} +"
    val nBlocks = regexp_count(text, lit(blockRe)).cast("long")
    val noBlocks = regexp_replace(text, blockRe, " ")
    val nSpans = regexp_count(noBlocks, lit(spanRe)).cast("long")
    val noSpans = regexp_replace(noBlocks, spanRe, "$1")
    val nImages = regexp_count(noSpans, lit(imageRe)).cast("long")
    val noImages = regexp_replace(noSpans, imageRe, "$1")
    val nLinks = regexp_count(noImages, lit(linkRe)).cast("long")
    val noLinks = regexp_replace(noImages, linkRe, "$1")
    val nHeaders = regexp_count(noLinks, lit(headerRe)).cast("long")
    val noHeaders = regexp_replace(noLinks, headerRe, "")
    val unwrapped = Seq(
      ("\\*\\*([^*]+)\\*\\*", "$1"), ("\\*([^*\n]+)\\*", "$1"),
      ("__([^_]+)__", "$1"), ("_([^_\n]+)_", "$1"))
      .foldLeft(noHeaders) { case (c, (re, rep)) =>
        regexp_replace(c, re, rep) }
    val plain = trim(regexp_replace(unwrapped, "\\s+", " "))
    Seq(plain.as("md_plain"), nBlocks.as("n_code_blocks"),
      nSpans.as("n_code_spans"), nImages.as("n_images"),
      nLinks.as("n_links"), nHeaders.as("n_headers"))
  }

  /** HTML-escape for text embedded into markup (the writer-side inverse
    * of [[htmlExtract]]'s entity decode): `&` first, then `<`, `>`. */
  def htmlEscape(text: Column): Column =
    replace(replace(replace(text, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** Anchor targets of an HTML document, in document order — the
    * frontier-expansion step of the crawl loop ([[htmlExtract]]'s
    * sibling: extraction keeps the text, this keeps the edges; feed the
    * output to `Robots.filterUrls` → `crawlSchedule`, or aggregate it
    * into the link graph the `Graphs` family ranks). Raw `href` values
    * as written (resolution/normalization is `Url.normalize`'s job);
    * narrow codegen'd regex, zero shuffle. */
  def htmlLinks(html: Column): Column =
    // the attribute boundary is spelled as a whitespace class (not \b,
    // which would let data-href through via the '-' boundary, and not
    // lookbehind, which RE2 lacks)
    regexp_extract_all(html, lit("(?i)[ \\t\\n\\r]href=\"([^\"]*)\""),
      lit(1))

  /** (href, anchor text) pairs of a document's links, in document
    * order — [[htmlLinks]] keeps only the edge, this keeps the LABEL:
    * anchor text is the classic off-page relevance/description signal
    * (what the web calls the target, not what the target calls itself),
    * the input to [[anchorTextAgg]]. Anchor text is the tag's direct
    * text content (`[^<]*` — an anchor wrapping nested markup is
    * skipped, the documented simplification; attribute values containing
    * `>` break the tag boundary and are likewise out of scope),
    * whitespace-trimmed, entities as written. Narrow codegen'd regex
    * pass, zero shuffle. */
  def htmlAnchors(html: Column): Column =
    transform(
      // the href attribute must be whitespace-delimited (the htmlLinks
      // boundary rule: data-href is not a link), spelled as "attributes
      // ending in whitespace, then href" since RE2-safe regex has no
      // lookbehind
      regexp_extract_all(html,
        lit("(?i)<a[ \\t\\n\\r](?:[^>]*[ \\t\\n\\r])?" +
          "href=\"[^\"]*\"[^>]*>[^<]*</a>"),
        lit(0)),
      m => struct(
        regexp_extract(m, "(?i)[ \\t\\n\\r]href=\"([^\"]*)\"", 1)
          .as("href"),
        trim(regexp_extract(m, "(?i)>([^<]*)</a>", 1)).as("anchor")))

  /** Per-line language census — the mixed-document detector
    * [[detectedLang]]'s doc-level argmax hides (a page that is 70%
    * English with a French boilerplate footer IDs as 'en' and the
    * footer pollutes the English corpus; line grain is where the mix
    * is visible and fixable): every non-blank line runs the marker
    * detector, then per doc the line count, the MAJORITY line
    * language (count desc, lang asc determinism) and
    * `minority_permille` — the share of lines disagreeing with the
    * majority, the routing signal for line-level cleanup.
    *
    * Scale shape: one narrow line explode + detector pass
    * (checkpointed — feeds counts AND totals in one scan), a map-side
    * (doc, lang) count, a doc-keyed ≤ 6-row argmax window, one
    * doc-sized join. */
  def lineLanguages(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(col(idCol).as("_id"),
        explode(split(col(textCol), "\n")).as("_line"))
      .filter(length(trim(col("_line"))) > 0)
      .select(col("_id"), detectedLang(col("_line")).as("_lang"))
      .localCheckpoint(false)
    val top = lines.groupBy(col("_id"), col("_lang"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_id"))
          .orderBy(col("_c").desc, col("_lang").asc)))
      .filter(col("_r") === 1)
      .select(col("_id"), col("_lang").as("top_lang"),
        col("_c").as("top_count"))
    lines.groupBy(col("_id")).agg(count(lit(1)).as("n_lines"))
      .join(top, Seq("_id"))
      .select(col("_id").as(idCol), col("n_lines"), col("top_lang"),
        col("top_count"),
        expr("(n_lines - top_count) * 1000 div n_lines")
          .as("minority_permille"))
  }

  /** Bracket/quote balance audit — the cheapest code-truncation
    * detector (a source file cut mid-function by a crawler or an
    * extraction bug leaves more openers than closers; truncated code
    * poisons code-model training far beyond its byte share): per doc
    * the open−close delta for (), {}, [] and the double-quote parity,
    * plus `truncation_suspect` = any POSITIVE delta or odd quotes
    * (negative deltas — more closers — are weird code, not truncation,
    * and stay flagless; thresholds beyond "any" are caller policy).
    * Count-based, not a parser: interleaved `([)]` balances — the
    * documented cheap-proxy trade. Narrow codegen'd length-diff
    * passes, zero shuffle, linear in bytes. */
  def bracketBalance(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    def cnt(re: String): Column =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), re, ""))).cast("long")
    df.select(col(idCol),
        (cnt("\\(") - cnt("\\)")).as("paren_delta"),
        (cnt("\\{") - cnt("\\}")).as("brace_delta"),
        (cnt("\\[") - cnt("\\]")).as("bracket_delta"),
        (cnt("\"") % 2).as("quote_parity"))
      .withColumn("truncation_suspect",
        (col("paren_delta") > 0L || col("brace_delta") > 0L ||
          col("bracket_delta") > 0L || col("quote_parity") === 1L)
          .cast("long"))
  }

  /** Delimited-text consistency audit — the structural QA pass for
    * CSV/TSV-shaped blobs BEFORE anyone trusts a schema (a "CSV"
    * column whose rows disagree on field count is either ragged data
    * or an unquoted-delimiter bug; both corrupt downstream parsing
    * silently): per doc the line count, the MODAL field count (split
    * on `delim`, trailing empties kept — the count-desc-then-smallest
    * determinism), how many lines have it, and `ragged_permille` =
    * share of lines that DON'T.
    *
    * Scale shape: one narrow line/field-count explode, a map-side
    * (doc, n_fields) count, the per-doc argmax via a doc-keyed
    * row_number over ≤ distinct-width rows, one doc-sized join. */
  def delimitedAudit(df: DataFrame, textCol: String, idCol: String,
      delim: String = ","): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(col(idCol).as("_id"),
        explode(split(col(textCol), "\n")).as("_line"))
      .select(col("_id"),
        size(split(col("_line"), java.util.regex.Pattern.quote(delim),
          -1)).cast("long").as("_nf"))
      .localCheckpoint(false) // feeds widths AND totals — one scan
    val widths = lines.groupBy(col("_id"), col("_nf"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_id"))
          .orderBy(col("_c").desc, col("_nf").asc)))
      .filter(col("_r") === 1)
      .select(col("_id"), col("_nf").as("modal_fields"),
        col("_c").as("modal_lines"))
    lines.groupBy(col("_id")).agg(count(lit(1)).as("n_lines"))
      .join(widths, Seq("_id"))
      .select(col("_id").as(idCol), col("n_lines"),
        col("modal_fields"), col("modal_lines"),
        expr("(n_lines - modal_lines) * 1000 div n_lines")
          .as("ragged_permille"))
  }

  /** Flat-table extraction from HTML — the structured-data sibling of
    * [[htmlAnchors]] (web tables are a major structured-pretraining
    * source; the WDC table corpus is exactly this extraction run at
    * crawl scale): one row per CELL, addressed (table_idx, row_idx,
    * col_idx), 1-based in document order, with inner tags stripped and
    * whitespace trimmed. FLAT-subset semantics, documented: non-greedy
    * matches end at the FIRST closing tag, so a nested table truncates
    * its parent at the inner `</table>` — the RE2-safe trade (no
    * recursion); th and td both count as cells (the header row is
    * row_idx 1, the usual table-corpus convention).
    *
    * Scale shape: three chained narrow regex explodes (tables → rows →
    * cells), zero shuffle, linear in page bytes. */
  def htmlTables(df: DataFrame, htmlCol: String,
      idCol: String): DataFrame = {
    val tables = df.select(col(idCol),
      posexplode(regexp_extract_all(col(htmlCol),
        lit("(?is)<table[^>]*>(.*?)</table>"), lit(1))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("table_idx"),
        col("col").as("_t"))
    val rows = tables.select(col(idCol), col("table_idx"),
      posexplode(regexp_extract_all(col("_t"),
        lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1))))
      .select(col(idCol), col("table_idx"),
        (col("pos") + 1).cast("long").as("row_idx"), col("col").as("_r"))
    rows.select(col(idCol), col("table_idx"), col("row_idx"),
      posexplode(regexp_extract_all(col("_r"),
        lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1))))
      .select(col(idCol), col("table_idx"), col("row_idx"),
        (col("pos") + 1).cast("long").as("col_idx"),
        trim(regexp_replace(col("col"), "<[^>]*>", "")).as("cell"))
  }

  /** Code-fence language histogram over a markdown corpus — the
    * routing signal [[markdownColumns]] counts but doesn't NAME
    * (n_code_blocks says how much fenced code; a code-data pipeline
    * needs WHICH languages it's buying): counts per fence info-string
    * (the token after the opening ```), lowercased. LABELED fences
    * only — a bare ``` line is indistinguishable from a labeled
    * block's CLOSER without a stateful parse, so the unlabeled volume
    * is derived instead as `markdownColumns.n_code_blocks − Σ these`
    * (documented, not guessed). One narrow regex explode + one
    * map-side-combined count; shuffle carries distinct languages. */
  def fenceLanguages(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit("(?m)^```([A-Za-z0-9_+#.-]+)"), lit(1))).as("_l"))
      .select(lower(col("_l")).as("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_fences"))

  /** Anchor-text aggregation: per link TARGET, how many pages link to it
    * and what they call it — `n_links`, `n_unique_anchors`, and the
    * majority anchor string (`top_anchor`, ties → lexicographically
    * smallest, so the result is deterministic under any partitioning).
    * The aggregated anchor vocabulary per target is a training-data
    * signal (surrogate titles/descriptions for the target document) and
    * the quality input link-graph rankers weight edges with.
    *
    * Shape: one map-side-combined shuffle to (target, anchor) counts,
    * then a target-keyed `min_by` over the (−n, anchor) struct — the
    * [[Dedup.bestSurvivors]] tie-break idiom for strings, where the
    * numeric negation trick alone can't order the tie column. Both
    * aggregations are linear in distinct pairs, never in pages. */
  def anchorTextAgg(anchors: DataFrame, targetCol: String,
      anchorCol: String): DataFrame = {
    val pairs = anchors
      .select(col(targetCol).as("target"), col(anchorCol).as("anchor"))
      .groupBy(col("target"), col("anchor"))
      .agg(count(lit(1)).as("n"))
    pairs.groupBy(col("target"))
      .agg(sum(col("n")).cast("long").as("n_links"),
        count(lit(1)).as("n_unique_anchors"),
        min_by(col("anchor"), struct(-col("n"), col("anchor")))
          .as("top_anchor"),
        max(col("n")).cast("long").as("top_anchor_n"))
  }

  /** READABILITY inputs (Flesch/Flesch-Kincaid family) in exact
    * integers: per document the sentence count (terminal-punctuation
    * runs, floored at 1 — a fragment is one sentence), word count, and
    * syllable proxy (vowel-GROUP count, the standard heuristic — spaces
    * break groups, so the whole-text count equals the per-word sum),
    * plus the two ratios every formula combines, as exact-integer ppm
    * (`words·10⁶ div sentences`, `syllables·10⁶ div words`). The famous
    * constants (206.835, 1.015, 84.6 / 0.39, 11.8, 15.59) are LINEAR in
    * these ratios, so callers compose any member of the family without
    * the engine baking in one formula's floats. Zero-word documents
    * emit 0 ratios rather than dropping (a curation filter wants to SEE
    * the empty doc). Narrow codegen'd regex pass, zero shuffle. */
  def readability(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val words = size(split(trim(col(textCol)), "\\s+"))
    val nWords = when(length(trim(col(textCol))) === 0, 0L)
      .otherwise(words.cast("long"))
    val nSents = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val nSyll = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    df.select(col(idCol).as("doc_id"), nSents.as("n_sentences"),
        nWords.as("n_words"), nSyll.as("n_syllable_groups"))
      .withColumn("wps_ppm",
        expr("n_words * 1000000 div n_sentences"))
      .withColumn("spw_ppm", when(col("n_words") === 0, 0L)
        .otherwise(expr("n_syllable_groups * 1000000 div n_words")))
  }

  // -------------------------------------------------- text normalization

  /** Unicode NFC normalization (canonical composition) — the codegen'd
    * [[org.apache.spark.sql.graft.NfcNormalize]] expression; mirrors
    * DuckDB's `nfc_normalize` exactly. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.NfcNormalize(
        org.apache.spark.sql.GraftShims.expression(text)))

  /** Mojibake repair (UTF-8 mis-decoded as Latin-1/cp1252, incl.
    * double-encodings) — the codegen'd
    * [[org.apache.spark.sql.graft.FixMojibake]] expression.
    * Conservative by construction: repairs only whole-string strict
    * round-trips, so clean text can never be corrupted. Run BEFORE
    * [[normalizeText]] in a curation chain (repair wants the raw
    * bytes' reading intact). */
  def fixMojibake(text: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.graft.FixMojibake(
        org.apache.spark.sql.GraftShims.expression(text)))

  /** Corpus text normalization — the canonical first pass of a curation
    * chain, in a fixed order both engines replay byte for byte:
    * 1. Unicode NFC (combining sequences compose: `e`+U+0301 → `é`);
    * 2. strip control characters (C0 minus tab/newline/CR, plus DEL);
    * 3. collapse `[ \t\n\r]+` runs to one space and trim.
    * The whitespace class is spelled out (not `\s`) because Java's `\s`
    * includes U+000B and RE2's does not — the one place the engines'
    * regex dialects would silently diverge. Narrow codegen'd chain. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcNormalize(text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\r]+", " "))

  /** U+FFFD replacement-character count — the mojibake/decode-damage
    * signal a curation chain thresholds on. */
  def replacementCount(text: Column): Column =
    (length(text) - length(replace(text, lit("\uFFFD"), lit(""))))
      .cast("long")

  // ------------------------------------------------------ code detection

  /** Code-vs-prose signals per document — the code-filtering /
    * mix-accounting step of a pretraining pipeline. Pure counting
    * algebra (no classifier): symbol density, indented-line count,
    * code-keyword hits, camelCase token count, and a cross-multiplied
    * integer verdict (`is_code` — symbol density ≥ 3% or ≥ 2 keywords or
    * ≥ 2 indented lines), the gopherColumns thresholding style. The
    * camelCase test anchors with `\z` (true end-of-text), not `$`:
    * tokens split on single spaces can end in a bare `\n`, where Java's
    * `$` matches before the final newline but RE2's does not. */
  def codeColumns(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nSym = (length(text) -
      length(regexp_replace(text, "[{}()\\[\\];=<>]", ""))).cast("long")
    val lines = split(text, "\n")
    val indentLines = size(filter(lines,
      l => l.startsWith("  ") || l.startsWith("\t"))).cast("long")
    val kw = size(regexp_extract_all(text,
      lit("\\b(def|class|import|return|const)\\b"), lit(0))).cast("long")
    val camel = size(filter(tokens(text),
      t => t.rlike("^[a-z]+[A-Z][A-Za-z]*\\z"))).cast("long")
    // the density rule needs content: 0 >= 0 must not flag empty text
    val isCode = when(
      (nChars > 0 && nSym * 100 >= nChars * 3) || kw >= 2 ||
        indentLines >= 2, 1L)
      .otherwise(0L)
    Seq(nSym.as("n_sym"), indentLines.as("indent_lines"),
      kw.as("keyword_hits"), camel.as("camel_tokens"),
      isCode.as("is_code"))
  }

  // --------------------------------------------------------- BPE encode

  /** BPE-segment a text under a FIXED merge table — real byte-pair
    * tokenization (the inference half of Sennrich et al. 2016: training
    * learns the merges, encoding replays them in order), replacing
    * [[subwordEstimate]]'s chars/4 heuristic wherever the actual token
    * accounting matters (context budgeting, per-token pricing,
    * sequence packing).
    *
    * Encoding is pure string algebra, so it runs as a narrow codegen'd
    * expression chain AND mirrors into DuckDB verbatim: each
    * space-delimited word becomes its symbol sequence (single chars
    * separated by spaces), then every merge `(a, b) → ab` is applied in
    * table order as a leftmost-nonoverlapping replace-all of `"a b"` —
    * exactly the reference BPE application order. Returns the flattened
    * `array<string>` of subword tokens. Merges whose parts themselves
    * contain spaces are invalid by construction (symbols never contain
    * the separator). No end-of-word marker: merges never span words
    * because each word is segmented independently. */
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) =>
      !a.contains(' ') && !b.contains(' ') && a.nonEmpty && b.nonEmpty },
      "bpe merges must be non-empty and space-free")
    // 'h e l l o' — one space between single-char symbols, then the
    // merge-table replace chain per word ([[bpeWordSegments]])
    flatten(transform(bpeWordSegments(text, merges), s => split(s, " ")))
  }

  /** Subword count under [[bpeSegment]]'s merge table. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeSegment(text, merges)).cast("long")

  /** LEARN a BPE merge table from a corpus — the training half of
    * Sennrich et al. 2016: `nMerges` rounds of "count adjacent symbol
    * pairs within words, merge the most frequent everywhere". Returns
    * the merges in learned order with their pair counts.
    *
    * Scale shape: ONE corpus-wide shuffle total — the word-TYPE count
    * table (map-side combined, vocabulary-sized), the same
    * pre-aggregation every tokenizer trainer starts with. Every round
    * then re-segments only the TYPE table (the current merge table
    * rides the expression chain), explodes to adjacent pairs WEIGHTED
    * by type frequency, and collects a single top-1 row to the driver —
    * corpus size never re-enters the loop. Pair counting distributes
    * over word multiplicity, so the learned table is bit-identical to
    * per-document re-segmentation. The merge pass is [[bpeSegment]]'s
    * replace chain, so encode and train share one segmentation
    * semantics and the gate oracle replays it digit for digit
    * (`bpe_train_greedy` mirrors all rounds in DuckDB
    * scalar-subquery CTEs); `Curation.bpeTrain` is the same loop with
    * the canonical left-fold merge pass — the two differ only in that
    * documented pass semantics, not in scale class.
    * Determinism: ties break (count desc, a asc, b asc), so the learned
    * table is a pure function of the corpus. */
  def bpeTrain(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 1, s"nMerges >= 1, got $nMerges")
    val types = df
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // vocabulary-sized; reused every round
    val out = Vector.newBuilder[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = types
        .select(col("cnt"),
          split(bpeWordString(col("word"), merges), " ").as("sym"))
        .select(col("cnt"), explode(expr(
          "transform(slice(sym, 1, size(sym) - 1), " +
            "(x, i) -> struct(x AS a, element_at(sym, i + 2) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word is one symbol
      else {
        val r = top.head
        val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
        out += ((a, b, r.getAs[Long]("n")))
        merges :+= ((a, b))
      }
      round += 1
    }
    out.result()
  }

  /** One word's segment STRING (symbols space-joined) under a merge
    * table — char-split then the merge replace chain; the shared unit
    * of [[bpeSegment]] and [[bpeTrain]]'s pair counting. */
  private def bpeWordString(w: Column,
      merges: Seq[(String, String)]): Column = {
    val spaced = trim(regexp_replace(w, "(.)", "$1 "))
    merges.foldLeft(spaced) { case (s, (a, b)) =>
      replace(s, lit(s"$a $b"), lit(a + b))
    }
  }

  /** Per-word segment STRINGS under a merge table — [[bpeSegment]]
    * before the final token split. */
  private def bpeWordSegments(text: Column,
      merges: Seq[(String, String)]): Column =
    transform(tokens(text), w => bpeWordString(w, merges))

  // ------------------------------------- main-content block extraction

  /** justext/Arc90-style MAIN-CONTENT extraction — the step between raw
    * HTML and the quality gates that [[htmlExtract]] (strip everything)
    * cannot do: navigation chrome, link farms and tag soup score OUT,
    * paragraphs of prose score IN. The page splits into blocks at
    * block-level tags; each block carries exact-integer density
    * signals — stripped-text length, markup share of raw chars,
    * link-text share of text chars — and survives when
    * `text_len ≥ minTextChars`, `markup ≤ maxMarkupPct%` and
    * `link text ≤ maxLinkPct%` (the justext defaults in spirit; all
    * comparisons cross-multiplied, no floats). Anchors spanning a block
    * boundary count toward neither side — a heuristic, like every
    * boilerplate detector. Output columns: `content` (kept blocks,
    * entity-decoded, newline-joined), `n_blocks` (non-empty),
    * `n_kept`. Narrow split + higher-order-function pass, zero
    * shuffle, Java/RE2-portable regexes (`[ \t\n\r]` spelled out — no
    * `\s`). */
  def contentColumns(html: Column, minTextChars: Int = 25,
      maxMarkupPct: Int = 40, maxLinkPct: Int = 30): Seq[Column] = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val clean = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = split(clean,
      "(?i)</?(?:p|div|td|th|li|ul|ol|h[1-6]|section|article|header|" +
        "footer|nav|aside|table|tr|blockquote|body|html|head|title|br)" +
        "\\b[^>]*>")
    def stripTags(c: Column) = regexp_replace(c, "(?s)<[^>]*>", " ")
    def squash(c: Column) = trim(regexp_replace(c, "[ \\t\\n\\r]+", " "))
    val scored = transform(blocks, b => {
      val text = squash(stripTags(b))
      val linkLen = aggregate(
        regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        lit(0L), (acc, a) => acc + length(squash(stripTags(a))))
      struct(text.as("text"), length(text).as("text_len"),
        (length(b) - length(stripTags(b))).as("markup_len"),
        length(b).as("raw_len"), linkLen.as("link_len"))
    })
    val kept = filter(scored, s =>
      s.getField("text_len") >= minTextChars &&
        s.getField("markup_len") * 100 <=
          s.getField("raw_len") * maxMarkupPct &&
        s.getField("link_len") * 100 <=
          s.getField("text_len") * maxLinkPct)
    Seq(
      decodeEntities(concat_ws("\n",
        transform(kept, s => s.getField("text")))).as("content"),
      size(filter(scored, s => s.getField("text_len") > 0))
        .cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }

  // ------------------------------------------------- token rarity

  /** Corpus-frequency-rank rarity — the CCNet-style "how unusual is
    * this document's vocabulary" quality signal, in exact integers: every
    * corpus token gets its 0-based rank in the (count desc, token asc)
    * frequency order, and each document reports its token count, rank
    * sum, and floor(mean rank × 100). High mean rank = rare-token-heavy
    * (jargon, noise, other-language residue); low = stopword soup. No
    * floats, so the oracle replays it digit for digit.
    *
    * SCALE: the rank table is VOCABULARY-sized and built with
    * [[Curation.stableRank]] (range-repartitioned total order — no
    * single-task global window); the join back to token occurrences and
    * the per-doc aggregation are the inherent corpus-statistics
    * join-back shape (the TF-IDF class): token-co-partitioned shuffles,
    * no skew beyond natural token skew (the head token's occurrence list
    * is bounded by corpus frequency, spread across its partitions'
    * aggregation — map-side combine takes the heat). Output:
    * (doc_id, n_tokens, rank_sum, mean_rank_x100). */
  def tokenRarity(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .withColumn("_all", lit(0))
      .withColumn("_negn", -col("n"))
    val ranked = Curation.stableRank(counts, "_all",
        Seq("_negn", "token"), rankCol = "rank")
      .select(col("token"), col("rank"))
    toks.join(ranked, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("rank")).as("rank_sum"))
      .select(col("doc_id"), col("n_tokens"), col("rank_sum"),
        expr("rank_sum * 100 div n_tokens").as("mean_rank_x100"))
  }

  /** χ² discriminative-term selection over a two-class corpus split —
    * the feature-selection step in front of any quality/domain
    * classifier (which terms separate positive from negative docs), and
    * the standard 2×2 contingency test: per term with document
    * frequency ≥ `minDf`,
    * `χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` where a/b = positive/
    * negative docs CONTAINING the term and c/d the complements.
    *
    * Determinism: the score is `chi2_centi` — χ²·100 floor-divided in
    * two exact steps (`(ad−bc)²·100 div (a+b)(c+d)`, then `·N div
    * N₁N₀`), DECIMAL(38) intermediates, no float anywhere; both floors
    * are mirrored by the oracle so every engine agrees bit-for-bit.
    * The double floor under-reports χ² by < 1 centi-unit — irrelevant
    * against the classic 384/663/1083-centi significance cutoffs. The
    * first quotient must fit a long, which bounds the corpus at
    * ~6×10⁸ docs per run — term selection beyond that shards the
    * corpus and merges contingency counts FIRST (a/b are additive),
    * then scores; the score step itself never needs the raw docs.
    *
    * Semantics: membership is per-document distinct (a term twice in
    * one doc counts once); a NULL class is the negative class (CASE
    * semantics); terms present in EVERY doc drop (undefined χ², zero
    * information); an empty class yields an empty result. One
    * doc-sized tokenize pass, one term-sized aggregate, class totals
    * broadcast. */
  def chi2Terms(docs: DataFrame, textCol: String, positiveCol: String,
      minDf: Long = 2): DataFrame = {
    require(minDf >= 1, s"minDf >= 1, got $minDf")
    val base = docs.select(
      when(col(positiveCol), 1L).otherwise(0L).as("_y"),
      array_distinct(filter(split(lower(col(textCol)), " "),
        t => length(t) > 0)).as("_ts"))
    val totals = base.agg(sum(col("_y")).as("n_pos"),
      (count(lit(1)) - sum(col("_y"))).as("n_neg"))
    val tf = base.select(col("_y"), explode(col("_ts")).as("term"))
      .groupBy(col("term"))
      .agg(sum(col("_y")).as("a"), (count(lit(1)) - sum(col("_y"))).as("b"))
      .filter(col("a") + col("b") >= minDf)
    tf.crossJoin(broadcast(totals))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L &&
        col("a") + col("b") < col("n_pos") + col("n_neg"))
      .withColumn("c", col("n_pos") - col("a"))
      .withColumn("d", col("n_neg") - col("b"))
      .withColumn("_m", col("a") * col("d") - col("b") * col("c"))
      .withColumn("_q", expr("(cast(_m as decimal(38,0)) * _m * 100)" +
        " div (cast(a + b as decimal(38,0)) * (c + d))"))
      .select(col("term"), col("a"), col("b"), col("c"), col("d"),
        expr("cast((cast(_q as decimal(38,0)) * (n_pos + n_neg))" +
          " div (cast(n_pos as decimal(38,0)) * n_neg) as bigint)")
          .as("chi2_centi"))
  }
}
