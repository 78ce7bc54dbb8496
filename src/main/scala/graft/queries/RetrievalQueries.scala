package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{Curation, Retrieval}

/** Driver gates for ranked retrieval (BM25 over the inverted token
  * index), exact repeated-substring span dedup, and Bloom-filter
  * membership — with bit-exact DuckDB oracles (exact integers, md5
  * hashing, IEEE +,×,÷ only; see [[graft.operators.Retrieval]] for why
  * that suffices for float parity).
  */
object RetrievalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)

  private val bm25Terms = Seq("join", "merge", "window")

  /** documents with a WHITESPACE-RUN fixture planted on every 7th doc —
    * double/triple spaces and a tab around the very query terms. Under
    * single-space splitting these would mint empty-string terms and
    * inflate `dl`; the `\s+` tokenizer (and its oracle mirror) must not.
    * Interior runs only: a trailing run would hit the one engine
    * divergence (Spark drops trailing empty splits, DuckDB keeps them). */
  private def wsDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit("  join\tmerge   window")))
        .otherwise(col("text")).as("text"))

  /** documents with a constant 15-word snippet appended to every 13th —
    * planted repeated substrings for the span-dedup gate (natural
    * repeated 10-grams also exist via the corpus's planted near-dups). */
  private val snippet =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"
  private def snippetCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" " + snippet)))
        .otherwise(col("text")).as("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-10 for a 3-term query, scored on the fly.
    "bm25_search" -> ((s, dir) =>
      Retrieval.bm25TopK(wsDocs(s, dir), "text", "doc_id", bm25Terms, k = 10)),

    // Ranking EVALUATION over three single-term BM25 runs: reciprocal
    // rank + hits@10 of the planted doc_id%7=0 relevant set, exact
    // integers (the ANN recall-gate discipline applied to text
    // retrieval). The oracle re-ranks per term from the SHARED score
    // CTE and replays the same join/aggregate.
    "retrieval_mrr" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = wsDocs(s, dir)
      val results = bm25Terms.map { t =>
        Retrieval.bm25TopK(d, "text", "doc_id", Seq(t), k = 10)
          .select(lit(t).as("query_id"), col("doc_id"),
            row_number().over(
              Window.orderBy(col("score").desc, col("doc_id").asc))
              .cast("long").as("rank"))
      }.reduce(_ unionAll _)
      val qrels = d.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
        .crossJoin(broadcast(bm25Terms.toDF("query_id")))
      Retrieval.rankingEval(results, qrels, k = 10)
    }),

    // Graded nDCG@10 over the same BM25 runs: qrels grade docs
    // 0/1/2 by doc_id % 3 (grade-0 rows exercise the rel>0 ideal
    // filter); discounts are the fixed integer micro table, so the
    // metric is exact integer arithmetic end to end.
    "ndcg_eval" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = wsDocs(s, dir)
      val results = bm25Terms.map { t =>
        Retrieval.bm25TopK(d, "text", "doc_id", Seq(t), k = 10)
          .select(lit(t).as("query_id"), col("doc_id"),
            row_number().over(
              Window.orderBy(col("score").desc, col("doc_id").asc))
              .cast("long").as("rank"))
      }.reduce(_ unionAll _)
      val qrels = d.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), (col("doc_id") % 3).as("rel"))
        .crossJoin(broadcast(bm25Terms.toDF("query_id")))
      Retrieval.ndcgEval(results, qrels, k = 10)
    }),

    // Hard-negative mining: the BM25 top-10 candidates per query that
    // the qrels say are NOT relevant, densely re-ranked — the
    // contrastive-training export (high-scored wrong answers, the
    // negatives worth training on).
    "hard_negatives" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = wsDocs(s, dir)
      val results = bm25Terms.map { t =>
        Retrieval.bm25TopK(d, "text", "doc_id", Seq(t), k = 10)
          .select(lit(t).as("query_id"), col("doc_id"),
            row_number().over(
              Window.orderBy(col("score").desc, col("doc_id").asc))
              .cast("long").as("rank"))
      }.reduce(_ unionAll _)
      val qrels = d.filter(col("doc_id") % 7 === 0).select(col("doc_id"))
        .crossJoin(broadcast(bm25Terms.toDF("query_id")))
      Retrieval.hardNegatives(results, qrels, k = 5)
    }),

    // Keyword-in-context snippets for the result page: match position
    // plus 30 chars of context each side, clamped at doc start — pure
    // 1-based character arithmetic, identical in every engine.
    "search_snippets" -> ((s, dir) =>
      Retrieval.searchSnippets(docs(s, dir), "doc_id", "text",
        "merge batch", window = 30)),

    // Exact phrase search via positional-posting intersection — the
    // query class a bag-of-words index cannot answer. Oracle mirrors
    // the position arithmetic (1-based generate_series shifted to the
    // 0-based posexplode convention).
    "phrase_search" -> ((s, dir) =>
      Retrieval.phraseSearch(docs(s, dir), "text", "doc_id",
        Seq("hash", "join"))),

    // Same phrase through the PERSISTED positional index (bucket-pruned
    // (doc, position) postings, pushed word filters) — layout is an
    // optimization, never a semantics change, so the oracle is shared
    // with phrase_search.
    "phrase_search_indexed" -> ((s, dir) => {
      val tmp = util.scratchDir("posidx", dir)
      Retrieval.writePositionalIndex(docs(s, dir), "text", "doc_id", tmp,
        nBuckets = 16)
      Retrieval.indexPhraseSearch(s, tmp, Seq("hash", "join"))
    }),

    // Incremental positional maintenance: index HALF the corpus, merge
    // the other half as a batch, query — must be indistinguishable from
    // indexing everything at once (the bm25_delta discipline), so the
    // oracle is shared with phrase_search.
    "phrase_search_delta" -> ((s, dir) => {
      val tmp = util.scratchDir("posidx", dir + "#delta")
      val d = docs(s, dir)
      Retrieval.writePositionalIndex(d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", tmp, nBuckets = 16)
      Retrieval.mergePositionalIndex(s, tmp,
        d.filter(col("doc_id") % 2 =!= 0), "text", "doc_id")
      Retrieval.indexPhraseSearch(s, tmp, Seq("hash", "join"))
    }),

    // Retraction on the positional index: every doc_id ≡ 0 (mod 3) is
    // deleted (pure visibility — phrase search carries no corpus
    // statistics), masked query ≡ post-vacuum query (require'd), and
    // both ≡ an index never containing them (the oracle minus the
    // deleted docs).
    "phrase_search_delete" -> ((s, dir) => {
      // retraction on a PREBUILT positional index (see bm25_delete)
      val tmp = util.freshDirCopy(util.posIndexBase(s, dir),
        util.scratchDir("posdel", dir) + "/idx")
      Retrieval.deleteFromPositionalIndex(s, tmp,
        docs(s, dir).filter(col("doc_id") % 3 === 0).select(col("doc_id")))
      val masked = Retrieval.indexPhraseSearch(s, tmp, Seq("hash", "join"))
        .collect().sortBy(_.getLong(0)).toSeq
      require(Retrieval.vacuumPositionalIndex(s, tmp) > 0L,
        "positional vacuum removed nothing")
      require(Retrieval.vacuumPositionalIndex(s, tmp) == 0L,
        "second positional vacuum must no-op")
      val after = Retrieval.indexPhraseSearch(s, tmp, Seq("hash", "join"))
      require(after.collect().sortBy(_.getLong(0)).toSeq == masked,
        "vacuum changed the phrase matches the tombstone mask produced")
      after
    }),

    // Unordered proximity (SpanNear/slop): position pairs of two terms
    // within a 3-token window, binned-join candidates — never a
    // per-doc tf×tf product. Oracle is the naive doc-join formulation.
    "near_search" -> ((s, dir) =>
      Retrieval.nearSearch(docs(s, dir), "text", "doc_id",
        "data", "table", window = 3)),

    // Trigram-index substring search (pg_trgm design): three contains()
    // queries answered by AND-ing the query trigrams over a distinct
    // trigram posting list, verifying only the candidate docs — the
    // oracle is the brute-force contains() scan the index replaces
    // (false positives must die at verification, false negatives
    // cannot exist, so the answers are identical).
    "trigram_search" -> ((s, dir) =>
      Retrieval.trigramSearch(docs(s, dir), "text", "doc_id",
        Seq("merge batch", "vector table", "window table table"))),

    // The NARROW phrase matcher over every document (zero-shuffle
    // sliding check) — same phrase as phrase_search, so the two gates
    // cross-validate through independent DuckDB formulations (positional
    // join vs list comprehension).
    "phrase_hits" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.operators.TextAnalysis.phraseHits(col("text"),
          Seq("hash", "join")).as("hits"))),

    // Multi-pattern blocklist scan: 6 literal patterns — with nested
    // pairs ("can" in "scan", "able" in "table") and a cross-word
    // phrase — counted in ONE Aho-Corasick byte pass per document
    // (overlapping occurrences included, dictionary-suffix outputs
    // exercised). Oracle is the naive per-pattern substring scan.
    "multi_pattern" -> ((s, dir) =>
      graft.operators.TextAnalysis.multiPatternHits(
        docs(s, dir), "doc_id", "text", mpPatterns)),

    // The SPAN face of the same automaton: every overlapping
    // occurrence with its exact 0-based offset — gazetteer tagging
    // for weak supervision. Oracle tests every start position per
    // pattern (the naive quadratic truth).
    "pattern_spans" -> ((s, dir) =>
      graft.operators.TextAnalysis.multiPatternSpans(
        docs(s, dir), "doc_id", "text", mpPatterns)),

    // Blocklist SCRUB beside the blocklist COUNT: the same automaton
    // pass masks the union of all match spans to '*' (order-free under
    // overlaps — 'can' inside 'scan', 'able' inside 'table' merge into
    // one region). Short synthetic page so the oracle's per-position
    // coverage check stays cheap.
    "multi_pattern_redact" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.operators.TextAnalysis.multiPatternRedact(
          concat(lit("scan the table as planned: "),
            substring(col("text"), 1, 40)),
          mpPatterns).as("redacted"))),

    // Same query through the PERSISTED index (bucket-pruned postings +
    // stored df/stats) — the layout is an optimization, never a
    // semantics change, so the oracle is shared with bm25_search.
    "bm25_index" -> ((s, dir) => {
      val tmp = bm25IndexDir(dir)
      Retrieval.writeIndex(wsDocs(s, dir), "text", "doc_id", tmp, nBuckets = 16)
      Retrieval.indexTopK(s, tmp, bm25Terms, k = 10)
    }),

    // Incremental index maintenance: index HALF the corpus, merge the
    // other half in as a batch, query — must be indistinguishable from
    // indexing everything at once, so the oracle is shared with
    // bm25_search (the strongest possible equivalence gate).
    "bm25_delta" -> ((s, dir) => {
      val tmp = bm25IndexDir(dir + "#delta")
      val d = wsDocs(s, dir)
      Retrieval.writeIndex(d.filter(col("doc_id") % 2 === 0), "text",
        "doc_id", tmp, nBuckets = 16)
      Retrieval.mergeIndex(s, tmp, d.filter(col("doc_id") % 2 =!= 0),
        "text", "doc_id")
      Retrieval.indexTopK(s, tmp, bm25Terms, k = 10)
    }),

    // Retraction on the persisted BM25 index: every doc_id ≡ 2 (mod 5)
    // is deleted WITHOUT a rebuild — the query must mask the postings
    // AND adjust n_docs/sum_dl/df (BM25 scores move when the corpus
    // shrinks, unlike pure-visibility deletes) — then vacuum folds the
    // tombstones into one staged generation and the post-vacuum query
    // must answer identically (require'd). Oracle = the bm25 oracle
    // over the corpus minus the deleted docs: indistinguishable from an
    // index never containing them.
    "bm25_delete" -> ((s, dir) => {
      val d = wsDocs(s, dir)
      // retraction on a PREBUILT index (the prebuiltStorePath stance:
      // a live system has its index on disk before anyone retracts
      // from it — the gate times delete + vacuum + query, the one-time
      // base build is untimed infrastructure); fresh copy so the
      // tombstones never leak into the read-only bm25 gates
      val tmp = util.freshDirCopy(bm25WsBase(s, dir),
        util.scratchDir("bm25del", dir) + "/idx")
      Retrieval.deleteFromIndex(s, tmp,
        d.filter(col("doc_id") % 5 === 2), "text", "doc_id")
      val masked = Retrieval.indexTopK(s, tmp, bm25Terms, k = 10)
        .collect().toSeq
      require(Retrieval.vacuumIndex(s, tmp) > 0L,
        "bm25 vacuum removed nothing")
      require(Retrieval.vacuumIndex(s, tmp) == 0L,
        "second bm25 vacuum must no-op")
      val after = Retrieval.indexTopK(s, tmp, bm25Terms, k = 10)
      require(after.collect().toSeq == masked,
        "vacuum changed the ranking the tombstone mask produced")
      after
    }),

    // The composed "forget everywhere" operator: ONE document set
    // (doc_id ≡ 1 mod 4) fans out through Forget.forgetDocuments to six
    // artifacts built over the same corpus — BM25 index, positional
    // index, band index, IVF vector index, n-gram LM, and an
    // observation store (via its own predicate key space). The gate
    // answers one question per artifact, unified as (artifact, k,
    // metric) rows, and the oracle is each artifact's never-had truth —
    // so a fan-out that misses ANY artifact hash-mismatches. Masked ≡
    // vacuumed is require'd on top (Forget.vacuumForgotten folds all
    // four tombstoned indexes).
    "forget_everywhere" -> ((s, dir) => {
      import graft.operators.{Dedup, Forget, ForgetTargets,
        ObservationStore, Similarity}
      val base = util.scratchDir("forgetall", dir)
      val d = docs(s, dir).select(col("doc_id"), col("text"))
        .localCheckpoint(false)
      val e = Graft.table(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      // six PREBUILT pristine artifacts, file-copied into this gate's
      // scratch (the prebuiltStorePath stance for all six: a live
      // system has its indexes on disk before a forget request
      // arrives — the fan-out below is the operator under test, the
      // base builds are untimed infrastructure). Four bases are shared
      // with their own lifecycle gates (posidx/bandidx/lmtbl/the IVF
      // index); bm25 differs (this gate indexes plain docs, the bm25
      // gates index wsDocs) so it gets its own key. First-build
      // overlap is preserved: the pristine builds run concurrently.
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val builds = Seq[(String, () => String)](
          "bm25" -> (() => util.forgetBm25Base(s, dir)),
          "pos" -> (() => util.posIndexBase(s, dir)),
          "band" -> (() => util.bandIndexBase(s, dir)),
          "ivf" -> (() => PipelineQueries.sharedIvfIndex(s, dir)),
          "lm" -> (() => util.lmBase(s, dir)))
        Await.result(Future.sequence(builds.map { case (sub, mk) =>
          Future(util.freshDirCopy(mk(), s"$base/$sub"))
        }), scala.concurrent.duration.Duration.Inf): Unit
      }
      val store = util.freshDirCopy(util.prebuiltStorePath(s, dir),
        s"$base/store")
      val targets = ForgetTargets(
        bm25 = Seq(s"$base/bm25"),
        positional = Seq(s"$base/pos"),
        bandIndex = Seq(s"$base/band"),
        vectorIndex = Seq(s"$base/ivf"),
        ngramLm = Seq(s"$base/lm"),
        store = Seq((store, col("rrname").startsWith("part-1"))))
      val applied = Forget.forgetDocuments(s,
        d.filter(col("doc_id") % 4 === 1), "text", "doc_id", targets)
      require(applied.size == 6, s"forget fan-out incomplete: $applied")
      // query vector hoisted: answers() is evaluated three times
      // (masked, vacuumed, and the returned frame) and the vector is a
      // constant of the corpus — one tiny job, not three
      val q = e.filter(col("vec_id") === 5)
        .select(col("embedding")).head().getSeq[Float](0)
      // one THUNK per artifact, NOT a pre-unioned frame: the six probes
      // are independent small queries over disjoint artifacts, and even
      // their CONSTRUCTION runs driver jobs (indexTopK reads stats and
      // probes term buckets, ivfIndexTopK collects centroids) — so the
      // masked/vacuumed comparisons build AND collect each branch on
      // overlapping threads (guide §2.6; the single 6-branch union job
      // executed its subtrees serially and measured 4.4-5.0 s per
      // evaluation — parallel branches bound it by the slowest one).
      // The RETURNED frame below is still the same union.
      def answerBranches(): Seq[() => DataFrame] = Seq(
        () => Retrieval.indexTopK(s, s"$base/bm25", bm25Terms, k = 10)
          .select(lit("bm25").as("artifact"),
            col("doc_id").cast("string").as("k"),
            col("score").cast("double").as("metric")),
        () => Retrieval.indexPhraseSearch(s, s"$base/pos",
            Seq("hash", "join"))
          .select(lit("phrase").as("artifact"),
            col("doc_id").cast("string").as("k"),
            col("n_occurrences").cast("double").as("metric")),
        () => Dedup.loadBandIndex(s, s"$base/band")
          .select(col("corpus_id")).distinct()
          .select(lit("band").as("artifact"),
            col("corpus_id").cast("string").as("k"),
            lit(1.0).as("metric")),
        () => Similarity.ivfIndexTopK(s, s"$base/ivf", q,
            queryId = 5L, k = 10, nprobe = 2)
          .select(lit("ivf").as("artifact"),
            col("id").cast("string").as("k"),
            col("cos_sim").cast("double").as("metric")),
        () => s.read.parquet(s"$base/lm/unigrams")
          .select(lit("lm").as("artifact"),
            col("word").cast("string").as("k"),
            col("c1").cast("double").as("metric")),
        () => {
          val stAgg = ObservationStore.load(s, store).forward
            .agg(count(lit(1)).cast("double").as("n"),
              sum(col("count")).cast("double").as("sc"))
            .localCheckpoint(false)
          stAgg.select(lit("store").as("artifact"),
              lit("n_entries").as("k"), col("n").as("metric"))
            .unionAll(stAgg.select(lit("store").as("artifact"),
              lit("sum_count").as("k"), col("sc").as("metric")))
        })
      def collectAnswers(): Seq[Seq[Any]] = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(
          Future.sequence(answerBranches().map(mk =>
            Future(mk().collect().toSeq))),
          scala.concurrent.duration.Duration.Inf)
          .flatten.map(_.toSeq).sortBy(_.toString)
      }
      val masked = collectAnswers()
      val removed = Forget.vacuumForgotten(s, targets)
      require(removed.values.forall(_ > 0L),
        s"a forget vacuum removed nothing: $removed")
      require(collectAnswers() == masked,
        "vacuum changed a visible post-forget answer")
      answerBranches().map(_()).reduce(_ unionAll _)
    }),

    // Hybrid retrieval: BM25 candidates ∪ exact-cosine ANN candidates
    // (documents and embeddings share the id space), fused by
    // reciprocal-rank fusion in scaled exact integers.
    "hybrid_search" -> ((s, dir) =>
      Retrieval.hybridTopK(wsDocs(s, dir),
        Graft.table(s, dir, "embeddings"), "text", "doc_id",
        "vec_id", "embedding", bm25Terms, queryId = 5L, k = 10)),

    // Exact repeated-substring (10-gram) span dedup: per-doc duplicated
    // word count + cleaned text with covered words removed.
    "dup_spans" -> ((s, dir) =>
      Curation.duplicateSpans(snippetCorpus(s, dir), "text", "doc_id")),

    // Bloom membership: filter built from customers seen in pre-1997
    // orders, probed with every customer; is_member is the exact truth
    // so the (deterministic) false positives are visible in the gate.
    "bloom_probe" -> ((s, dir) => {
      val seen = Graft.table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey").cast("string").as("v")).distinct()
        .localCheckpoint(false) // feeds both the filter build and the truth join
      val bloom = Curation.bloomBuild(seen, "v", mBits = 16384, k = 2)
      val probed = Curation.bloomProbe(Graft.table(s, dir, "customer"),
        "c_custkey", bloom, mBits = 16384, k = 2)
      probed.join(seen.withColumn("m", lit(1L)), Seq("v"), "left")
        .select(col("v").cast("long").as("c_custkey"), col("maybe_member"),
          coalesce(col("m"), lit(0L)).as("is_member"))
    }),
  )

  private def bm25IndexDir(dir: String): String =
    util.scratchDir("bm25idx", dir)

  /** Pristine wsDocs BM25 index — bm25_delete's base (and the bench's
    * untimed prewarm hook). */
  private[graft] def bm25WsBase(s: SparkSession, dir: String): String =
    util.prebuiltArtifact(s, dir, "bm25") { p =>
      Retrieval.writeIndex(wsDocs(s, dir), "text", "doc_id", p,
        nBuckets = 16)
    }

  /** Positional-intersection oracle, shared by the in-memory and
    * persisted phrase-search gates. */
  private val phraseSearchOracleSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS p,
      |         unnest(t) AS word
      |  FROM toks),
      |a0 AS (SELECT doc_id, p FROM pos WHERE word = 'hash'),
      |a1 AS (
      |  SELECT a0.doc_id, a0.p
      |  FROM a0 JOIN pos ON pos.doc_id = a0.doc_id
      |              AND pos.p = a0.p + 1 AND pos.word = 'join')
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |FROM a1 GROUP BY 1
      |""".stripMargin

  /** BM25 pipeline CTEs ending in `bmtop` = the top-`limit` (doc_id,
    * score, n_matched); shared by the three bm25 gates and the hybrid
    * fusion oracle. */
  /** The per-(doc, term) BM25 score CTE chain (wcorpus → sc), shared by
    * the ranked-search oracle and the ranking-eval oracle — ONE
    * definition of the score formula, so the two gates cannot drift. */
  private val bm25ScoreCtes: String =
    s"""wcorpus AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 0
       |              THEN text || '  join' || chr(9) || 'merge   window'
       |              ELSE text END AS text
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS dl,
       |         UNNEST(regexp_split_to_array(text, '\\s+')) AS term
       |  FROM wcorpus),
       |tf AS (
       |  SELECT term, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tok WHERE term IN ('join', 'merge', 'window') GROUP BY 1, 2, 3),
       |dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS DOUBLE) AS sum_dl
       |  FROM wcorpus),
       |sc AS (
       |  SELECT tf.doc_id, tf.term,
       |         (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)
       |           * (CAST(tf AS DOUBLE) * 2.2)
       |           / (CAST(tf AS DOUBLE)
       |              + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) * n / sum_dl))) AS s
       |  FROM tf JOIN dfr USING (term), st)""".stripMargin

  private def bm25Ctes(limit: Int): String =
    s"""$bm25ScoreCtes,
       |bmagg AS (
       |  SELECT doc_id,
       |         SUM(CASE WHEN term = 'join' THEN s END) AS s_0,
       |         SUM(CASE WHEN term = 'merge' THEN s END) AS s_1,
       |         SUM(CASE WHEN term = 'window' THEN s END) AS s_2
       |  FROM sc GROUP BY 1),
       |bmtop AS (
       |  SELECT doc_id,
       |         COALESCE(s_0, 0.0) + COALESCE(s_1, 0.0) + COALESCE(s_2, 0.0)
       |           AS score,
       |         CAST((CASE WHEN s_0 IS NOT NULL THEN 1 ELSE 0 END)
       |            + (CASE WHEN s_1 IS NOT NULL THEN 1 ELSE 0 END)
       |            + (CASE WHEN s_2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_matched
       |  FROM bmagg ORDER BY score DESC, doc_id ASC LIMIT $limit)""".stripMargin

  private val bm25OracleSql =
    s"""WITH ${bm25Ctes(10)}
       |SELECT doc_id, score, n_matched FROM bmtop
       |""".stripMargin

  /** 4-hex-digit parse of md5 prefix → bit position mod 16384 (the
    * corpus_split hex idiom), for both bloom CTEs. */
  private def bloomPosCte(src: String, out: String): String =
    s"""$out AS (
       |  SELECT v,
       |         ((strpos('0123456789abcdef', f[1]) - 1) * 4096 +
       |          (strpos('0123456789abcdef', f[2]) - 1) * 256 +
       |          (strpos('0123456789abcdef', f[3]) - 1) * 16 +
       |          (strpos('0123456789abcdef', f[4]) - 1)) % 16384 AS pos
       |  FROM (SELECT v, md5(CAST(UNNEST([0, 1]) AS VARCHAR) || ':' || v) AS f
       |        FROM $src))""".stripMargin

  /** The multi_pattern gate's blocklist — nested pairs and a phrase,
    * ONE definition for the engine side and the generated oracle. */
  private val mpPatterns =
    Seq("scan", "can", "table", "able", "merge batch", "as")

  /** [[bm25OracleSql]] over the RAW corpus (no whitespace fixture)
    * minus the forgotten docs — the forget_everywhere BM25 component.
    * Built by rewriting the shared CTE so the score formula stays ONE
    * definition; the require catches a drift that would silently turn
    * the rewrite into a no-op. */
  private lazy val bm25ForgetOracle: String = {
    val out = bm25OracleSql.replace(
      """         CASE WHEN doc_id % 7 = 0
        |              THEN text || '  join' || chr(9) || 'merge   window'
        |              ELSE text END AS text
        |  FROM documents),""".stripMargin,
      """         text AS text
        |  FROM documents WHERE doc_id % 4 <> 1),""".stripMargin)
    require(out != bm25OracleSql, "bm25 forget-oracle rewrite missed")
    out
  }

  def oracleSql: Map[String, String] = Map(
    "bm25_search" -> bm25OracleSql,

    // six artifacts, one never-had truth each, unified as
    // (artifact, k, metric) — a fan-out that missed any artifact
    // hash-mismatches its branch
    "forget_everywhere" ->
      s"""SELECT 'bm25' AS artifact, CAST(doc_id AS VARCHAR) AS k,
         |       CAST(score AS DOUBLE) AS metric
         |FROM ($bm25ForgetOracle)
         |UNION ALL
         |SELECT 'phrase', CAST(doc_id AS VARCHAR),
         |       CAST(n_occurrences AS DOUBLE)
         |FROM (${phraseSearchOracleSql.replace("  FROM documents),",
              "  FROM documents WHERE doc_id % 4 <> 1),")})
         |UNION ALL
         |SELECT 'band', CAST(doc_id AS VARCHAR), CAST(1.0 AS DOUBLE)
         |FROM documents WHERE doc_id % 4 <> 1
         |UNION ALL
         |SELECT 'ivf', CAST(id AS VARCHAR), CAST(cos_sim AS DOUBLE)
         |FROM (${PipelineQueries.ivfOracleSql.replace(
              "WHERE asg.id <> 5",
              "WHERE asg.id <> 5 AND asg.id % 4 <> 1")})
         |UNION ALL
         |SELECT 'lm', word, CAST(COUNT(*) AS DOUBLE)
         |FROM (SELECT UNNEST(string_split(text, ' ')) AS word
         |      FROM documents WHERE doc_id % 4 <> 1) GROUP BY word
         |UNION ALL
         |SELECT 'store', k, metric FROM (
         |  ${util.obsCte}
         |  SELECT 'n_entries' AS k, CAST(COUNT(*) AS DOUBLE) AS metric
         |  FROM agg WHERE rrname NOT LIKE 'part-1%'
         |  UNION ALL
         |  SELECT 'sum_count', CAST(SUM("count") AS DOUBLE)
         |  FROM agg WHERE rrname NOT LIKE 'part-1%')
         |""".stripMargin,

    "retrieval_mrr" ->
      s"""WITH $bm25ScoreCtes,
         |ranked AS (
         |  SELECT term AS query_id, doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY term
         |                                 ORDER BY s DESC, doc_id ASC)
         |           AS BIGINT) AS rank
         |  FROM sc),
         |topk AS (SELECT * FROM ranked WHERE rank <= 10),
         |rel AS (SELECT doc_id FROM wcorpus WHERE doc_id % 7 = 0),
         |qrels AS (
         |  SELECT t.query_id, r.doc_id
         |  FROM (VALUES ('join'), ('merge'), ('window')) t(query_id), rel r),
         |per AS (
         |  SELECT tk.query_id,
         |         MIN(CASE WHEN q.doc_id IS NOT NULL THEN tk.rank END)
         |           AS best_rank,
         |         CAST(SUM(CASE WHEN q.doc_id IS NOT NULL AND tk.rank <= 10
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k
         |  FROM topk tk
         |  LEFT JOIN qrels q
         |    ON q.query_id = tk.query_id AND q.doc_id = tk.doc_id
         |  GROUP BY 1),
         |nrel AS (
         |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
         |  FROM qrels GROUP BY 1)
         |SELECT query_id, CAST(COALESCE(n.n_rel, 0) AS BIGINT) AS n_rel,
         |       CAST(COALESCE(p.best_rank, 0) AS BIGINT) AS best_rank,
         |       CAST(COALESCE(1000000 // p.best_rank, 0) AS BIGINT) AS rr_ppm,
         |       CAST(COALESCE(p.hits_at_k, 0) AS BIGINT) AS hits_at_k
         |FROM nrel n FULL OUTER JOIN per p USING (query_id)
         |""".stripMargin,

    // The discount VALUES are interpolated from the SAME
    // ndcgDiscountsMicro table the engine uses — one definition, no
    // drift; the rest is the mrr oracle's ranked/qrels shape with
    // graded rel and the two discounted sums.
    "ndcg_eval" -> {
      val disc = Retrieval.ndcgDiscountsMicro(10).zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      s"""WITH $bm25ScoreCtes,
         |ranked AS (
         |  SELECT term AS query_id, doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY term
         |                                 ORDER BY s DESC, doc_id ASC)
         |           AS BIGINT) AS rank
         |  FROM sc),
         |topk AS (SELECT * FROM ranked WHERE rank <= 10),
         |rel AS (SELECT doc_id, doc_id % 3 AS rel FROM wcorpus
         |        WHERE doc_id % 7 = 0),
         |qrels AS (
         |  SELECT t.query_id, r.doc_id, r.rel
         |  FROM (VALUES ('join'), ('merge'), ('window')) t(query_id),
         |       rel r),
         |disc(rank, w) AS (VALUES $disc),
         |dcg AS (
         |  SELECT tk.query_id,
         |         CAST(SUM(COALESCE(q.rel, 0) * d.w) AS BIGINT)
         |           AS dcg_micro
         |  FROM topk tk
         |  JOIN disc d ON d.rank = tk.rank
         |  LEFT JOIN qrels q
         |    ON q.query_id = tk.query_id AND q.doc_id = tk.doc_id
         |  GROUP BY 1),
         |ideal AS (
         |  SELECT query_id, rel,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY rel DESC, doc_id ASC) AS rn
         |  FROM qrels WHERE rel > 0),
         |idcg AS (
         |  SELECT i.query_id,
         |         CAST(SUM(i.rel * d.w) AS BIGINT) AS idcg_micro
         |  FROM ideal i JOIN disc d ON d.rank = i.rn
         |  WHERE i.rn <= 10 GROUP BY 1)
         |SELECT query_id,
         |       CAST(COALESCE(dcg.dcg_micro, 0) AS BIGINT) AS dcg_micro,
         |       CAST(COALESCE(idcg.idcg_micro, 0) AS BIGINT)
         |         AS idcg_micro,
         |       CASE WHEN COALESCE(idcg.idcg_micro, 0) > 0
         |            THEN CAST(COALESCE(dcg.dcg_micro, 0) * 1000
         |                        // idcg.idcg_micro AS BIGINT) END
         |         AS ndcg_permille
         |FROM dcg FULL OUTER JOIN idcg USING (query_id)
         |""".stripMargin
    },

    "hard_negatives" ->
      s"""WITH $bm25ScoreCtes,
         |ranked AS (
         |  SELECT term AS query_id, doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY term
         |                                 ORDER BY s DESC, doc_id ASC)
         |           AS BIGINT) AS rank
         |  FROM sc),
         |topk AS (SELECT * FROM ranked WHERE rank <= 10),
         |rel AS (SELECT doc_id FROM wcorpus WHERE doc_id % 7 = 0),
         |qrels AS (
         |  SELECT t.query_id, r.doc_id
         |  FROM (VALUES ('join'), ('merge'), ('window')) t(query_id), rel r),
         |neg AS (
         |  SELECT tk.query_id, tk.doc_id, tk.rank,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY tk.query_id
         |                                 ORDER BY tk.rank ASC,
         |                                          tk.doc_id ASC)
         |           AS BIGINT) AS neg_rank
         |  FROM topk tk LEFT JOIN qrels q
         |    ON q.query_id = tk.query_id AND q.doc_id = tk.doc_id
         |  WHERE q.doc_id IS NULL)
         |SELECT query_id, doc_id, rank, neg_rank
         |FROM neg WHERE neg_rank <= 5
         |""".stripMargin,

    // Per pattern the naive overlapping-substring count (every start
    // position tested); UNION ALL across the pattern list, zero rows
    // filtered like the engine side. Patterns are ASCII, so DuckDB's
    // char positions line up with the engine's UTF-8 byte automaton.
    "multi_pattern" -> {
      val scans = mpPatterns.map { p =>
        val lp = p.length
        s"""  SELECT doc_id, '$p' AS pattern,
           |         CAST(len(list_filter(range(1, len(text) - $lp + 2),
           |                i -> substr(text, i, $lp) = '$p'))
           |           AS BIGINT) AS n_hits
           |  FROM documents""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""SELECT * FROM (
         |$scans
         |) WHERE n_hits > 0
         |""".stripMargin
    },

    // every start position tested per pattern; 1-based substr index
    // shifted to the engine's 0-based byte offsets (ASCII corpus, so
    // char and byte offsets coincide)
    "pattern_spans" -> {
      val scans = mpPatterns.map { p =>
        val lp = p.length
        s"""  SELECT doc_id, pattern, CAST(i - 1 AS BIGINT) AS start FROM (
           |    SELECT doc_id, '$p' AS pattern,
           |           UNNEST(list_filter(range(1, len(text) - $lp + 2),
           |                  i -> substr(text, i, $lp) = '$p')) AS i
           |    FROM documents)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""SELECT * FROM (
         |$scans
         |)
         |""".stripMargin
    },

    // per-position coverage: position i masks iff some pattern has an
    // occurrence whose span [s, s+len) contains i
    "multi_pattern_redact" -> {
      val cov = mpPatterns.map { p =>
        val lp = p.length
        s"len(list_filter(range(greatest(1, i - $lp + 1), i + 1), " +
          s"s -> substr(page, s, $lp) = '$p')) > 0"
      }.mkString("\n    OR ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |    'scan the table as planned: ' || substr(text, 1, 40) AS page
         |  FROM documents)
         |SELECT doc_id,
         |  array_to_string(list_transform(range(1, len(page) + 1), i ->
         |    CASE WHEN $cov
         |    THEN '*' ELSE substr(page, i, 1) END), '') AS redacted
         |FROM p
         |""".stripMargin
    },

    "phrase_hits" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(range(1, len(t) - 2 + 2),
        |              i -> t[i] = 'hash' AND t[i+1] = 'join'))
        |         AS BIGINT) AS hits
        |FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |      FROM documents)
        |""".stripMargin,

    // The scan the trigram index replaces — same answers by
    // construction (candidates are verified with the real contains).
    "trigram_search" ->
      """SELECT 'merge batch' AS query, doc_id FROM documents
        |WHERE contains(text, 'merge batch')
        |UNION ALL
        |SELECT 'vector table' AS query, doc_id FROM documents
        |WHERE contains(text, 'vector table')
        |UNION ALL
        |SELECT 'window table table' AS query, doc_id FROM documents
        |WHERE contains(text, 'window table table')
        |""".stripMargin,

    "search_snippets" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(strpos(text, 'merge batch') AS BIGINT)
        |           AS pos, text
        |  FROM documents WHERE strpos(text, 'merge batch') > 0)
        |SELECT doc_id, pos,
        |       substr(text, CAST(greatest(1, pos - 30) AS INT),
        |         CAST(pos - greatest(1, pos - 30) + 41 AS INT))
        |         AS snippet
        |FROM m
        |""".stripMargin,

    "phrase_search" -> phraseSearchOracleSql,

    // the persisted-index path must be indistinguishable from the
    // in-memory one — shared oracle IS the equivalence gate
    "phrase_search_indexed" -> phraseSearchOracleSql,

    // the phrase oracle minus the retracted docs — visibility only
    "phrase_search_delete" -> phraseSearchOracleSql.replace(
      "  FROM documents),",
      "  FROM documents WHERE doc_id % 3 <> 0),"),
    "phrase_search_delta" -> phraseSearchOracleSql,
    // the naive formulation: join the posting lists on doc_id and
    // filter — the quadratic shape the binned Spark plan must agree
    // with exactly
    "near_search" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS p,
        |         unnest(t) AS word
        |  FROM toks),
        |a AS (SELECT doc_id, p FROM pos WHERE word = 'data'),
        |b AS (SELECT doc_id, p FROM pos WHERE word = 'table'),
        |j AS (
        |  SELECT a.doc_id, abs(a.p - b.p) AS d
        |  FROM a JOIN b ON a.doc_id = b.doc_id
        |  WHERE abs(a.p - b.p) <= 3)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(MIN(d) AS BIGINT) AS min_distance
        |FROM j GROUP BY 1
        |""".stripMargin,

    // identical semantics through the persisted bucketed index — same
    // oracle by design
    "bm25_index" -> bm25OracleSql,
    // half-indexed + half-merged must equal indexed-at-once
    "bm25_delta" -> bm25OracleSql,

    // the bm25 oracle over the corpus minus the retracted docs — the
    // masked/vacuumed index must be indistinguishable from one never
    // containing them (statistics included, not just visibility)
    "bm25_delete" -> bm25OracleSql.replace(
      "  FROM documents),",
      "  FROM documents WHERE doc_id % 5 <> 2),"),

    // both candidate pipelines fully mirrored, then the identical
    // integer-RRF fold
    "hybrid_search" ->
      s"""WITH ${bm25Ctes(20)},
         |tr AS (SELECT doc_id AS id,
         |              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
         |                AS rnk
         |       FROM bmtop),
         |s AS (SELECT vec_id AS id,
         |             list_transform(embedding,
         |               x -> round(CAST(x AS DOUBLE) * 100000, 0)) AS v
         |      FROM embeddings),
         |q AS (SELECT v AS qv FROM s WHERE id = 5),
         |vv AS (
         |  SELECT s.id,
         |         (list_dot_product(s.v, q.qv) /
         |          (sqrt(list_dot_product(s.v, s.v)) *
         |           sqrt(list_dot_product(q.qv, q.qv)))) AS cos_sim
         |  FROM s CROSS JOIN q WHERE s.id <> 5
         |  ORDER BY cos_sim DESC, s.id ASC LIMIT 20),
         |vr AS (SELECT id,
         |              ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id ASC)
         |                AS rnk
         |       FROM vv),
         |u AS (SELECT id, rnk FROM tr UNION ALL SELECT id, rnk FROM vr)
         |SELECT id,
         |       CAST(SUM(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_score,
         |       CAST(COUNT(*) AS BIGINT) AS n_sources
         |FROM u GROUP BY 1
         |ORDER BY rrf_score DESC, id ASC LIMIT 10
         |""".stripMargin,

    "dup_spans" ->
      ("""WITH corpus AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0
        |              THEN text || ' """ + snippet + """'
        |              ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             len(string_split(text, ' ')) AS nw FROM corpus),
        |grams AS (
        |  SELECT doc_id,
        |         UNNEST(generate_series(0, nw - 10)) AS pos,
        |         UNNEST(list_transform(generate_series(0, nw - 10), i ->
        |           md5(array_to_string(list_slice(w, i + 1, i + 10), ' ')))) AS gram
        |  FROM d WHERE nw >= 10),
        |dup AS (SELECT gram FROM grams GROUP BY 1 HAVING COUNT(*) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, UNNEST(generate_series(pos, pos + 9)) AS pos
        |  FROM grams WHERE gram IN (SELECT gram FROM dup)),
        |counts AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_words
        |  FROM cov GROUP BY 1),
        |wrows AS (
        |  SELECT doc_id,
        |         UNNEST(generate_series(0, nw - 1)) AS pos,
        |         UNNEST(w) AS word
        |  FROM d),
        |kept AS (
        |  SELECT wr.doc_id, wr.pos, wr.word
        |  FROM wrows wr LEFT JOIN cov ON wr.doc_id = cov.doc_id AND wr.pos = cov.pos
        |  WHERE cov.pos IS NULL),
        |cleaned AS (
        |  SELECT doc_id, array_to_string(list(word ORDER BY pos), ' ') AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, CAST(nw AS BIGINT) AS n_words,
        |       COALESCE(n_dup_words, 0) AS n_dup_words,
        |       COALESCE(clean_text, '') AS clean_text
        |FROM d LEFT JOIN counts USING (doc_id) LEFT JOIN cleaned USING (doc_id)
        |""").stripMargin,

    "bloom_probe" ->
      s"""WITH seen AS (
        |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |${bloomPosCte("seen", "bpos")},
        |bloom AS (
        |  SELECT pos // 32 AS word_idx,
        |         BIT_OR(CAST(POWER(2, pos % 32) AS BIGINT)) AS bits
        |  FROM bpos GROUP BY 1),
        |cust AS (SELECT CAST(c_custkey AS VARCHAR) AS v FROM customer),
        |${bloomPosCte("cust", "ppos")},
        |probe AS (
        |  SELECT v, MIN(CASE WHEN (COALESCE(bits, 0) & mask) = mask
        |                     THEN 1 ELSE 0 END) AS all_hit
        |  FROM (SELECT v, pos // 32 AS word_idx,
        |               CAST(POWER(2, pos % 32) AS BIGINT) AS mask FROM ppos) p
        |  LEFT JOIN bloom USING (word_idx) GROUP BY 1)
        |SELECT CAST(v AS BIGINT) AS c_custkey,
        |       CAST(all_hit AS BIGINT) AS maybe_member,
        |       CAST(CASE WHEN v IN (SELECT v FROM seen) THEN 1 ELSE 0 END
        |            AS BIGINT) AS is_member
        |FROM probe
        |""".stripMargin,
  )
}
