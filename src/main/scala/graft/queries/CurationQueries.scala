package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.operators.{Curation, Similarity}

/** Corpus-curation operators (PII redaction, passage dedup, repetition
  * signals, mixture sampling, n-gram stats, k-means topic clustering) as
  * driver-gate queries. Inputs come from `documents` / `embeddings` /
  * `customer`; the PII text is synthesized deterministically from
  * `c_custkey` integer arithmetic so both engines build byte-identical
  * inputs.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)

  /** Bigram-LM oracle, shared by the in-memory (`ngram_lm`) and
    * persisted-artifact (`ngram_lm_loaded`) gates. */
  private val ngramLmOracleSql =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |st AS (
      |  SELECT doc_id, w,
      |         UNNEST(generate_series(1, len(w) - 1)) AS i
      |  FROM tok),
      |p2 AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM st),
      |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      |       FROM p2 GROUP BY 1, 2),
      |u AS (SELECT UNNEST(w) AS word FROM tok),
      |c1 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c1
      |       FROM u GROUP BY 1),
      |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vsz FROM c1)
      |SELECT p2.doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |       CAST(SUM(((c2.c2 + 1) * 1000000000) // (c1.c1 + v.vsz))
      |            AS BIGINT) AS lm_score,
      |       CAST(CAST(SUM(((c2.c2 + 1) * 1000000000) // (c1.c1 + v.vsz))
      |            AS BIGINT) // COUNT(*) AS BIGINT) AS lm_mean
      |FROM p2 JOIN c2 USING (w1, w2)
      |        JOIN c1 ON p2.w1 = c1.word
      |        CROSS JOIN v
      |GROUP BY 1
      |""".stripMargin
  private def embs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism)

  /** documents ∪ planted copies (doc_id % 5 == 0, shifted id, same text):
    * gives passage dedup a real duplicate population. */
  private def docsWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** Deterministic PII-bearing text from customer-key integer arithmetic —
    * same construction in the oracle, so redaction is tested on real
    * pattern shapes without needing PII columns in the testdata. */
  private def piiText(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "customer").select(
      col("c_custkey"),
      concat(
        col("c_name"), lit(" ("), col("c_mktsegment"), lit(") phone "),
        (col("c_custkey") % 90 + 10).cast("string"), lit("-"),
        (col("c_custkey") % 900 + 100).cast("string"), lit("-"),
        (col("c_custkey") * 7 % 900 + 100).cast("string"), lit("-"),
        (col("c_custkey") * 13 % 9000 + 1000).cast("string"),
        lit(" email customer."), col("c_custkey").cast("string"),
        lit("@example.com ip "),
        (col("c_custkey") % 223 + 1).cast("string"), lit("."),
        (col("c_custkey") % 256).cast("string"), lit("."),
        (col("c_custkey") * 3 % 256).cast("string"), lit("."),
        (col("c_custkey") * 5 % 254 + 1).cast("string")).as("text"))

  private val mixRates =
    Map("en" -> 50, "de" -> 30, "es" -> 20, "fr" -> 10, "zh" -> 100)

  /** Decontamination inputs: eval set = docs with doc_id % 97 == 0; the
    * corpus is the rest, with a 20-word eval-doc prefix appended to every
    * doc_id % 11 == 0 document (planted contamination — the natural corpus
    * shares no 13-gram with the eval split, so without planting the gate
    * would only test the all-negative path). Both engines build the same
    * bytes from the same arithmetic. */
  private def decontamInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = d.filter(col("doc_id") % 97 === 0)
    val prefixes = evalDocs.select(
      expr("doc_id div 97").as("e_idx"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 20)).as("quote"))
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
      .withColumn("e_idx",
        when(col("doc_id") % 11 === 0, col("doc_id") % 5))
      .join(broadcast(prefixes), Seq("e_idx"), "left")
      .select(col("doc_id"),
        when(col("quote").isNotNull,
          concat(col("text"), lit(" "), col("quote")))
          .otherwise(col("text")).as("text"))
    (corpus, evalDocs)
  }

  /** Card-number-bearing text from customer-key arithmetic (the
    * [[piiText]] convention): a bare 16-digit candidate, a
    * dash-separated one, and an 11-digit decoy under the candidate
    * length floor. Keys make the Luhn verdict land both ways. */
  private def ccText(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    Graft.table(s, dir, "customer").select(
      k.as("c_custkey"),
      concat(
        lit("card 4"),
        lpad((k * 7919 % 100000000000L).cast("string"), 11, "0"),
        lpad((k % 10000).cast("string"), 4, "0"),
        lit(" alt 5"),
        lpad((k * 104729 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((k * 31 % 10000).cast("string"), 4, "0"), lit("-"),
        lpad((k * 17 % 10000).cast("string"), 4, "0"), lit("-"),
        lpad((k * 13 % 10000).cast("string"), 4, "0"),
        lit(" ref "),
        lpad((k % 100000000000L).cast("string"), 11, "0")).as("text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PII detection + redaction over synthesized customer contact text.
    "pii_redact" -> ((s, dir) =>
      piiText(s, dir).select(
        col("c_custkey") +: Curation.redactPii(col("text")): _*)),

    // Checksum-validated card redaction: two 16-digit candidates per row
    // (one dash-separated) plus an 11-digit decoy below the length
    // floor; only the ~9% of candidates whose Luhn mod-10 holds count
    // and redact — both engines compute the verdict independently, so
    // the gate checks the checksum math itself, not just the regex.
    "pii_luhn" -> ((s, dir) =>
      ccText(s, dir).select(
        col("c_custkey") +: Curation.ccColumns(col("text")): _*)),

    // Exact 13-gram decontamination of the corpus against the eval split
    // (planted quotes → true positives; everything else must stay clean).
    "decontaminate" -> ((s, dir) => {
      val (corpus, evalDocs) = decontamInputs(s, dir)
      Curation.decontaminate(corpus, evalDocs, "text", "doc_id")
    }),

    // Three rounds of the real BPE trainer over the documents corpus:
    // learned merge table (round, pair, weighted occurrence count).
    "bpe_train" -> ((s, dir) => {
      import s.implicits._
      learnedMerges(s, dir).toDF("round", "pair", "n_occurrences")
    }),

    // Exact-quota stratified sampling: exactly 30 docs per language by
    // content-hash order (vs domain_mix's rate-based thresholding).
    "stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(docs(s, dir)
          .select(col("doc_id"), col("lang"), col("text")),
        "lang", "text", "doc_id", nPerStratum = 30)
        .select(col("doc_id"), col("lang"))),

    // Train → apply: tokenize the corpus under the learned merges,
    // per-document BPE token totals. Shares the memoized trainer run
    // with bpe_train — the trainer is the expensive half.
    "bpe_encode" -> ((s, dir) =>
      Curation.bpeApply(docs(s, dir), "text", "doc_id",
        learnedMerges(s, dir).map(_._2))),

    // CCNet-style passage-level dedup over docs ∪ planted copies: every
    // 10-token passage keeps its first (min (doc,pos)) occurrence.
    "paragraph_dedup" -> ((s, dir) =>
      Curation.passageDedup(docsWithCopies(s, dir), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")),

    // Gopher-style repetition quality signals, narrow per-row pass.
    "repetition_signals" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id") +: Curation.repetitionColumns(col("text")): _*)),

    // Deterministic domain-mixture sampling by content-hash threshold.
    "domain_mix" -> ((s, dir) =>
      Curation.mixtureSample(docs(s, dir), "lang", "text", mixRates)
        .select(col("doc_id"), col("lang"))),

    // α=0.5 temperature-rebalanced mixture (√-law): head languages
    // down-sampled toward sqrt(count), tail kept — expected ~150 docs.
    "temperature_mix" -> ((s, dir) =>
      Curation.temperatureSample(docs(s, dir), "lang", "text",
          targetTotal = 150)
        .select(col("doc_id"), col("lang"))),

    // Scalable per-source sequential rank (range shuffle + global
    // index, NO per-group window task) — oracle is the row_number
    // window it replaces.
    "stable_rank" -> ((s, dir) =>
      Curation.stableRank(docs(s, dir)
          .select(col("doc_id"), col("source")),
        "source", Seq("doc_id"))),

    // Global token-budget selection ("take the best half of the
    // corpus by tokens"): priority = hash60(doc_id) desc (a
    // deterministic stand-in for a quality score), weight = token
    // count, budget = half the corpus total — the distributed
    // prefix-sum replaces the unpartitioned SUM-OVER window the
    // oracle uses.
    "budget_select" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Curation.hash60(col("doc_id")).as("pri"))
      val budget = d.agg(sum(col("n_tokens"))).head.getLong(0) / 2
      Curation.budgetSelect(d, "n_tokens",
        Seq(col("pri").desc, col("doc_id").asc), budget, "cum_tokens")
    }),

    // Per-group token-budget cap ("each source keeps its best 700
    // tokens"): the keyed partition-offset scan replaces the
    // per-group SUM-OVER window that would ship a whole domain into
    // one task.
    "budget_select_by_domain" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Curation.hash60(col("doc_id")).as("pri"))
      Curation.budgetSelectByGroup(d, "n_tokens", "source",
        Seq(col("pri").desc, col("doc_id").asc), 700L, "cum_tokens")
    }),

    // Rendezvous (HRW) shard assignment over 5 named nodes —
    // consistent placement where mod-N would reshuffle almost
    // everything on a topology change.
    "rendezvous_assign" -> ((s, dir) =>
      Curation.rendezvousAssign(
        docs(s, dir).select(col("doc_id")), "doc_id",
        (0 until 5).map(i => s"node$i"))),

    // NOTE TextAnalysis.compressionRatio is deliberately NOT a driver
    // gate: DuckDB has no deflate, and the contract (ContractSpec)
    // refuses oracle-less gates rather than downgrading to rows-only —
    // its semantics are pinned in CurationSpec instead.

    // Length-bucketed micro-batching (4 content-hash shards, batch 16,
    // sorted by token count within a shard): per-batch padding stats —
    // the dataloader's dynamic-batching audit.
    "length_batches" -> ((s, dir) =>
      Curation.lengthBatches(docs(s, dir), "text", "doc_id",
        nShards = 4, batchSize = 16)),

    // One-pass per-column profile of the documents table (row/null/
    // exact-distinct counts, min/max as strings).
    "profile_table" -> ((s, dir) =>
      Curation.profileTable(docs(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),

    // Per-source duplication-rate audit over planted same-source
    // copies (doc_id % 5 == 0 duplicates back into its own source):
    // which source feeds rehashed content, in exact permille.
    "dup_by_source" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"),
        col("source"))
      Curation.dupRateByGroup(
        d.unionAll(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("source"))),
        "text", "source")
    }),

    // Cross-source overlap matrix over planted CROSS-source copies
    // (doc_id % 6 == 0 re-homed to source (doc_id div 6) mod 20):
    // shared distinct content + exact Jaccard per source pair.
    "source_overlap" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"),
        col("source"))
      Curation.sourceOverlap(
        d.unionAll(d.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            concat(lit("src"), expr("(doc_id div 6) % 20"))
              .as("source"))),
        "text", "source")
    }),

    // Per-source rank normalization of the length score: within-group
    // exact ranks through the grouped order engine (range shuffle +
    // broadcast offsets — never one source in one task), permille 0
    // at each source's min, 1000 at its max.
    "rank_normalize" -> ((s, dir) =>
      Curation.rankNormalize(
        docs(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "rnk", "rank_permille", Seq("source"),
        col("n_chars").asc, col("doc_id").asc)),

    // Quantile normalization of n_chars across sources onto the
    // pooled distribution — after the transform a global threshold
    // means the same thing in every source; both rank passes through
    // the distributed order engine, value lookup one rank-keyed join.
    "quantile_normalize" -> ((s, dir) =>
      Curation.quantileNormalize(
        docs(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars", "doc_id")),

    // Majority-vote label resolution across three synthetic labelers
    // (l2 flips to 'click' on id%3, l3 abstains on id%7): plurality
    // winner, margin, ties surfaced with a NULL winner.
    "majority_vote" -> ((s, dir) =>
      Curation.majorityVote(
        Graft.table(s, dir, "events").select(
          col("event_id"),
          col("event_type").as("l1"),
          when(col("event_id") % 3 === 0, lit("click"))
            .otherwise(col("event_type")).as("l2"),
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")).as("l3")),
        "event_id", Seq("l1", "l2", "l3"))),

    // Blocking-quality eval (pair completeness × reduction ratio) of
    // an 8-char-prefix blocking key against planted copies — copies of
    // doc_id % 10 == 0 get a "zz " prefix corruption, so the prefix
    // key MISSES exactly those truth pairs while still reducing the
    // comparison space; candidate pairs are counted from block sizes,
    // never materialized.
    "blocking_quality" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val copies = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          when(col("doc_id") % 10 === 0, concat(lit("zz "), col("text")))
            .otherwise(col("text")).as("text"))
      val truth = base.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 1000000L).as("id_b"))
      graft.operators.Dedup.blockingQuality(
        base.unionAll(copies), "doc_id",
        substring(col("text"), 1, 8), truth, "id_a", "id_b")
    }),

    // Pairwise association rules over order baskets (item = partkey
    // mod 40 so pairs repeat): support/confidence/lift in exact
    // permille, baskets co-locate the pair join, lift in DECIMAL(38).
    "assoc_rules" -> ((s, dir) =>
      Curation.associationRules(
        Graft.table(s, dir, "lineitem").select(
          col("l_orderkey").as("basket"),
          (col("l_partkey") % 40L).as("item")),
        "basket", "item", maxBasketSize = 100, minPairCount = 10L)),

    // Exact heavy hitters (tokens with frequency > n/32): per-partition
    // Misra–Gries candidates + exact verify — the shuffle carries only
    // candidates, never the vocabulary; the threshold applies to exact
    // counts, so the sketch only prunes.
    "heavy_hitters" -> ((s, dir) =>
      Curation.heavyHitters(docs(s, dir)
          .select(explode(split(col("text"), " ")).as("w")),
        "w", k = 32)),

    // Stride-scheduled training-order mixing: source srcN weighted
    // (N % 3) + 1; sorting by sched_key interleaves sources in weight
    // proportion over every prefix — deterministic exact integers.
    "mix_schedule" -> ((s, dir) =>
      Curation.mixSchedule(docs(s, dir)
          .select(col("doc_id"), col("source")),
        "source", Seq("doc_id"),
        (0 to 19).map(i => s"src$i" -> ((i % 3) + 1L)).toMap)),

    // Fixed-size overlapping chunking (RAG/embedding prep): 40-word
    // windows, 10-word overlap — narrow map-only pass.
    "doc_chunks" -> ((s, dir) =>
      Curation.chunkDocuments(docs(s, dir), "text", "doc_id",
        chunkWords = 40, overlap = 10)),

    // DSIR-flavored importance weights: target = lang 'en', 256 hashed
    // word buckets, exact-integer likelihood-ratio sums.
    "importance_weights" -> ((s, dir) =>
      Curation.importanceWeights(docs(s, dir), "text", "doc_id",
        col("lang") === "en", nBuckets = 256)),

    // Bigram LM corpus-fit scores: add-one-smoothed exact-integer
    // conditionals trained on the corpus itself, summed per document.
    "ngram_lm" -> ((s, dir) =>
      Curation.lmScores(docs(s, dir), "text", "doc_id")),

    // Same scores through the PERSISTED LM tables (train once, score
    // many — the BpeVocab stance applied to the LM); shared oracle IS
    // the equivalence gate.
    "ngram_lm_loaded" -> ((s, dir) => {
      val tmp = util.scratchDir("lmtbl", dir)
      Curation.writeLm(docs(s, dir), "text", tmp)
      Curation.lmScoresLoaded(s, tmp, docs(s, dir), "text", "doc_id")
    }),

    // Incremental LM maintenance: train on half, merge the other half —
    // scores must be indistinguishable from training on everything
    // (shared oracle).
    "ngram_lm_delta" -> ((s, dir) => {
      val tmp = util.scratchDir("lmtbl", dir + "#delta")
      val d = docs(s, dir)
      Curation.writeLm(d.filter(col("doc_id") % 2 === 0), "text", tmp)
      Curation.mergeLm(s, tmp, d.filter(col("doc_id") % 2 =!= 0), "text")
      Curation.lmScoresLoaded(s, tmp, d, "text", "doc_id")
    }),

    // Retraction on the LM tables: train on EVERYTHING, delete the odd
    // half (counts subtract as one staged generation), score the
    // remaining even half against the loaded model — must be
    // indistinguishable from a model never trained on the odd docs
    // (the oracle trains AND scores on the even half; loaded-scoring on
    // the training corpus itself equals in-memory scoring, the
    // ngram_lm_loaded equivalence).
    "ngram_lm_delete" -> ((s, dir) => {
      val d = docs(s, dir)
      // retraction on a PREBUILT LM table (the prebuiltStorePath
      // stance — the gate times the count subtraction + rescore, not
      // the one-time base training); fresh copy, never the shared base
      val tmp = util.freshDirCopy(util.lmBase(s, dir),
        util.scratchDir("lmdel", dir) + "/lm")
      Curation.deleteFromLm(s, tmp,
        d.filter(col("doc_id") % 2 =!= 0), "text")
      Curation.lmScoresLoaded(s, tmp,
        d.filter(col("doc_id") % 2 === 0), "text", "doc_id")
    }),

    // Top-20 collocations by scaled PMI (bigrams seen >= 5 times).
    "pmi_collocations" -> ((s, dir) =>
      Curation.pmiCollocations(docs(s, dir), "text")),

    // Sequential Poisson weighted sample: 60 docs, weight = n_chars.
    "weighted_sample" -> ((s, dir) =>
      Curation.weightedSample(docs(s, dir), "doc_id", "n_chars", k = 60)),

    // Count-Min sketch estimates for 20 probe users over the event
    // stream (d=4 rows × w=512 buckets) — deterministic, collisions
    // included, so the oracle mirrors the sketch bit for bit.
    "cm_counts" -> ((s, dir) =>
      Curation.cmEstimates(
        graft.Graft.table(s, dir, "events")
          .select(col("user_id").cast("string").as("v")),
        "v", (1L to 20L).map(_.toString), d = 4, w = 512)),

    // Global top-20 word 3-grams (count desc, gram asc).
    "ngram_topk" -> ((s, dir) =>
      Curation.ngramTopK(docs(s, dir), "text", n = 3, k = 20)),

    // Top-20 adjacent character pairs — one BPE merge round's counting
    // step (vocabulary induction primitive).
    "bpe_pairs" -> ((s, dir) =>
      Curation.bytePairTopK(docs(s, dir), "text", k = 20)),

    // Per-language token-count quantiles (exact interpolated percentiles,
    // emitted as integer cents — the double is a multiple of 0.25, so
    // round(q*100) is exact on both engines).
    "length_quantiles" -> ((s, dir) => {
      val n = size(split(col("text"), " ")).cast("long")
      docs(s, dir).select(col("lang"), n.as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(percentile(col("n_tokens"), lit(0.25)) * 100)
            .cast("long").as("p25_tokens_cents"),
          round(percentile(col("n_tokens"), lit(0.5)) * 100)
            .cast("long").as("p50_tokens_cents"),
          round(percentile(col("n_tokens"), lit(0.75)) * 100)
            .cast("long").as("p75_tokens_cents"))
    }),

    // EXACT percentiles of the order-price distribution (cents) via the
    // distributed rank — the ground truth beside sketch_quantiles'
    // estimator: rank selection with a range shuffle and broadcast
    // targets, never a single-partition percentile sort.
    "exact_quantiles" -> ((s, dir) =>
      Curation.exactQuantiles(
        Graft.table(s, dir, "orders").select(
          round(col("o_totalprice") * 100, 0).cast("long")
            .as("price_cents"),
          col("o_orderkey")),
        "price_cents", "o_orderkey", Seq(1, 25, 50, 75, 99))),

    // Mergeable bottom-k-by-hash quantile sketch (k=200 over 500 docs —
    // genuine sampling) beside the n_chars distribution: O(k) state per
    // mapper instead of funneling every value through one percentile
    // sort; the estimator is oracle-checked end to end because the
    // sample is a pure function of the md5 hash order.
    "sketch_quantiles" -> ((s, dir) =>
      Curation.sketchQuantiles(docs(s, dir), "doc_id", "n_chars",
        k = 200)),

    // Two-sample KS drift between the two source halves' n_chars
    // distributions, each side a k=64 hash sample of its 250 docs —
    // sampling binds on both sides, and the statistic is the exact
    // integer cross-multiplied max CDF gap over the merged samples.
    "ks_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val half = expr("cast(substring(source, 4) as int)")
      Curation.sketchKsDrift(
        d.filter(half < 10).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars",
        d.filter(half >= 10).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 64)
    }),

    // Robust outliers: median + MAD from the 200-doc hash sample,
    // broadcast back; 2000‰ (2×MAD) so the flag BINDS on this corpus.
    // Exact half-cent integers end to end — no float z-scores.
    "robust_outliers" -> ((s, dir) =>
      Curation.robustOutliers(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 200, thresholdPermille = 2000L)),

    // Per-key quantile sketch: one O(16) sample PER SOURCE (25 docs
    // each — the sample binds), quantiles per key over the sample; the
    // second aggregation reuses the first's partitioning.
    "sketch_quantiles_by_key" -> ((s, dir) =>
      Curation.sketchQuantilesByKey(docs(s, dir), "source", "doc_id",
        "n_chars", k = 16)),

    // Percentile-bucket assignment (quartiles of n_chars) from the
    // SAME broadcast sketch boundaries — a narrow scoring pass over the
    // corpus instead of a global ntile window sort; k=200 of 500 docs,
    // so the boundaries are genuinely sample-derived and the oracle
    // mirrors the sample, not the population.
    "quantile_bucket" -> ((s, dir) =>
      Curation.quantileBuckets(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", nBuckets = 4, k = 200)),

    // Deterministic spherical k-means, k=8, 2 update rounds, exact-integer
    // arithmetic throughout (see Similarity.kmeans).
    "kmeans_clusters" -> ((s, dir) =>
      Similarity.kmeans(embs(s, dir), "vec_id", "embedding", k = 8,
        iters = 2, dim = 64)
        .withColumnRenamed("id", "vec_id")),

    // Cluster-purity eval: the unsupervised-vs-labels check (a
    // clustering is only useful for curation routing if its clusters
    // mean something — purity is the majority-label share per
    // cluster): same deterministic k-means as kmeans_clusters, cells
    // counted map-side, per-cluster argmax with (count desc, label
    // asc) determinism.
    "cluster_purity" -> ((s, dir) => {
      val asg = Similarity.kmeans(embs(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, dim = 64).select(col("id"), col("cluster"))
      val cells = asg.join(
          embs(s, dir).select(col("vec_id").as("id"),
            col("label").cast("long").as("label")), Seq("id"))
        .groupBy(col("cluster"), col("label"))
        .agg(count(lit(1)).as("_c"))
      import org.apache.spark.sql.expressions.Window
      cells
        .withColumn("_r", row_number().over(
          Window.partitionBy(col("cluster"))
            .orderBy(col("_c").desc, col("label").asc)))
        .groupBy(col("cluster"))
        .agg(sum(col("_c")).as("n"),
          max(when(col("_r") === 1, col("label"))).as("top_label"),
          max(when(col("_r") === 1, col("_c"))).as("top_count"))
        .withColumn("purity_permille",
          expr("top_count * 1000 div n"))
    }),

    // SemDeDup: k-means blocking + within-cluster exact cosine ≥ 0.4;
    // drop the pair member closer to its centroid (keep the rim).
    "sem_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(embs(s, dir), "vec_id", "embedding",
          k = 8, iters = 2, dim = 64, threshold = 0.4)
        .withColumnRenamed("id", "vec_id")),

    // Top-3 TF-IDF keywords per document (exact rational tf·N/df score).
    "tfidf_keywords" -> ((s, dir) =>
      Curation.tfidfKeywords(docs(s, dir), "text", "doc_id", k = 3)
        .withColumnRenamed("id", "doc_id")),

    // Top-3 RAKE keyphrases per document (multiword complement of
    // tfidf_keywords): phrases split at stopwords/punctuation, word
    // deg·10⁹ div freq scores via the overflow-safe long-division
    // split, phrase = Σ word scores. A stopword-rich preamble plants
    // real phrase boundaries in every page.
    "rake_keywords" -> ((s, dir) => {
      val page = concat(lit("Deep learning models are trained on the " +
        "web with large data pipelines, and a data engine is the key. "),
        col("text"))
      Curation.rakeKeywords(docs(s, dir).withColumn("page", page),
          "page", "doc_id", k = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Deterministic export sharding + contiguous token-budget packing
    // (4 shards, 256-token packs).
    "sequence_pack" -> ((s, dir) =>
      Curation.packForTraining(docs(s, dir), "text", "doc_id",
        nShards = 4, budgetTokens = 256)
        .withColumnRenamed("id", "doc_id")),

    // The END-TO-END curation+export chain a training run actually
    // ships: quality gate → PII redaction → exact dedup (min-id
    // survivor) → leakage-safe content split → pack the train split
    // into shards and token budgets. Two pipeline shuffles total (dedup
    // groupBy; shard-partitioned packing window) regardless of corpus
    // size — PlanSpec asserts it; everything else is narrow.
    "curate_export" -> ((s, dir) => {
      val train = Curation.curateChain(docs(s, dir))
        .filter(col("split") === "train")
      Curation.packForTraining(train, "text", "doc_id",
        nShards = 4, budgetTokens = 256)
        .withColumnRenamed("id", "doc_id")
    }),

    // Good-Turing frequency-of-frequencies: (r, N_r, smoothed r* in ppm,
    // unseen-mass ppb) — all exact-integer, oracle restates directly.
    "good_turing" -> ((s, dir) =>
      Curation.goodTuring(docs(s, dir), "text")),

    // N-gram novelty of every document against the doc_id%10=0 reference
    // slice — the memorization/freshness probe (shuffle join on the gram
    // hash, no broadcast assumption on the reference corpus).
    "ngram_novelty" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.ngramNovelty(d, d.filter(col("doc_id") % 10 === 0),
        "text", "doc_id")
    }),

    // Global HyperLogLog register table over event user_ids — gates the
    // custom TypedImperativeAggregate (update → partial → final merge)
    // end to end; register maxima are partitioning-invariant, so the
    // oracle can restate them per value with GROUP BY register.
    "hll_registers" -> ((s, dir) =>
      Curation.hllRegisters(
        graft.Graft.table(s, dir, "events")
          .select(col("user_id").cast("string").as("v")), "v")),

    // Corpus snapshot diff: v2 drops doc_id%11=0, rewrites %7=0 (suffix
    // appended), adds shifted copies of %13=0 — the incremental-run
    // planning output (process added∪changed only).
    "corpus_diff" -> ((s, dir) => {
      val v1 = docs(s, dir).select(col("doc_id"), col("text"))
      val v2 = v1.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionAll(v1.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Curation.corpusDiff(v1, v2, "doc_id", "text")
    }),

    // Per-source RELATIVE length filter: keep docs at or above their own
    // source's median n_chars — the adaptive per-domain threshold a
    // global cut can't express.
    "relative_filter" -> ((s, dir) =>
      Curation.relativeFilter(
        docs(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars")),

    // Per-event-type HLL distinct-user estimates via the pure-integer
    // raw estimator (alpha_ppt scaling, depth-32 truncation — identical
    // arithmetic in the oracle), plus the empty-register count that
    // feeds the (caller-side) linear-counting correction.
    "hll_estimate" -> ((s, dir) =>
      Curation.hllEstimates(
        graft.Graft.table(s, dir, "events")
          .select(col("event_type"),
            col("user_id").cast("string").as("v")),
        "event_type", "v")),
  )

  // ------------------------------------------------------------ oracles

  private val piiTextSql =
    """pii AS (
      |  SELECT c_custkey,
      |         c_name || ' (' || c_mktsegment || ') phone ' ||
      |         CAST(c_custkey % 90 + 10 AS VARCHAR) || '-' ||
      |         CAST(c_custkey % 900 + 100 AS VARCHAR) || '-' ||
      |         CAST(c_custkey * 7 % 900 + 100 AS VARCHAR) || '-' ||
      |         CAST(c_custkey * 13 % 9000 + 1000 AS VARCHAR) ||
      |         ' email customer.' || CAST(c_custkey AS VARCHAR) ||
      |         '@example.com ip ' ||
      |         CAST(c_custkey % 223 + 1 AS VARCHAR) || '.' ||
      |         CAST(c_custkey % 256 AS VARCHAR) || '.' ||
      |         CAST(c_custkey * 3 % 256 AS VARCHAR) || '.' ||
      |         CAST(c_custkey * 5 % 254 + 1 AS VARCHAR) AS text
      |  FROM customer)
      |""".stripMargin

  // the oracle MUST use byte-identical patterns to the operator — by
  // reference, so a pattern change cannot desync them
  private val emailRe = Curation.emailPattern
  private val phoneRe = Curation.phonePattern
  private val ipRe = Curation.ipv4Pattern

  /** Shared DuckDB fragment: 10-token passages of docs ∪ copies with
    * (idx, passage, md5) rows. */
  private val passagesCte =
    """u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
      |p0 AS (
      |  SELECT doc_id,
      |         list_transform(
      |           generate_series(0,
      |             CAST(ceil(len(string_split(text, ' ')) / 10.0) AS INT) - 1),
      |           i -> {'idx': i,
      |                 'passage': array_to_string(
      |                   list_slice(string_split(text, ' '),
      |                              i * 10 + 1, i * 10 + 10), ' ')}) AS ps
      |  FROM u),
      |p1 AS (SELECT doc_id, UNNEST(ps) AS pp FROM p0),
      |p AS (SELECT doc_id, pp.idx AS idx, pp.passage AS passage,
      |             md5(pp.passage) AS h
      |      FROM p1)
      |""".stripMargin

  /** n-grams (with duplicates) of a text column in DuckDB. */
  private def gramsSql(n: Int): String =
    s"""CASE WHEN len(string_split(text, ' ')) < $n THEN []
       |     ELSE list_transform(
       |            generate_series(1, len(string_split(text, ' ')) - ${n - 1}),
       |            i -> array_to_string(
       |                   list_slice(string_split(text, ' '), i, i + ${n - 1}),
       |                   ' '))
       |END""".stripMargin

  /** Scaled (1e3) exact-integer embeddings + cosine for the k-means
    * oracle. */
  private def kCos(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"

  /** One k-means round in SQL: assignment against `cIn` then truncated-
    * integer centroid update into `cOut`. */
  private def kmeansRound(aName: String, cIn: String, uName: String,
      cOut: String): String =
    s"""$aName AS (
       |  SELECT id, v, cl FROM (
       |    SELECT s.id, s.v, c.cl,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY s.id
       |             ORDER BY ${kCos("s.v", "c.cv")} DESC, c.cl ASC) AS rk
       |    FROM s CROSS JOIN $cIn c) t
       |  WHERE rk = 1),
       |$uName AS (
       |  SELECT cl, d.d AS d,
       |         CAST(SUM(v[d.d]) AS BIGINT) // COUNT(*) AS cval
       |  FROM $aName, (SELECT UNNEST(generate_series(1, 64)) AS d) d
       |  GROUP BY cl, d.d),
       |$cOut AS (
       |  SELECT cl, list(CAST(cval AS DOUBLE) ORDER BY d) AS cv
       |  FROM $uName GROUP BY cl)
       |""".stripMargin

  /** Memoized learned merge table per (session, dir): both BPE gates
    * share one trainer run — content-deterministic, so caching cannot
    * change results. */
  private val mergesCache = scala.collection.mutable
    .Map[(SparkSession, String), Seq[(Long, String, Long)]]()
  private def learnedMerges(s: SparkSession,
      dir: String): Seq[(Long, String, Long)] =
    mergesCache.synchronized {
      mergesCache.getOrElseUpdate((s, dir),
        Curation.bpeTrain(docs(s, dir), "text", rounds = 3)
          .collect()
          .map(r => (r.getAs[Long]("round"), r.getAs[String]("pair"),
            r.getAs[Long]("n_occurrences")))
          .sortBy(_._1).toSeq)
    }

  /** Unrolled BPE trainer rounds: count weighted adjacent pairs on the
    * word-type table, argmax (n DESC, pair ASC), canonical left-fold
    * merge (list_reduce pop-and-merge — the same sequential-BPE greedy
    * pass as Curation.canonicalMerge). Returns the shared CTE chain
    * ending with state `s<rounds>`; the train and encode oracles add
    * their own final SELECT. */
  private def bpeChainCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT unnest(list_transform(
         |           generate_series(1, len(string_split(trim(s), ' ')) - 1),
         |           i -> string_split(trim(s), ' ')[i] || ' ' ||
         |                string_split(trim(s), ' ')[i + 1])) AS pair, cnt
         |  FROM s${r - 1}),
         |c$r AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
         |        FROM p$r GROUP BY 1),
         |b$r AS (SELECT pair, n FROM c$r ORDER BY n DESC, pair LIMIT 1),
         |s$r AS (
         |  SELECT word, cnt,
         |         ' ' || list_reduce(string_split(trim(s), ' '),
         |           (acc, t) -> CASE
         |             WHEN (acc = mx OR ends_with(acc, ' ' || mx))
         |                  AND t = my
         |             THEN substr(acc, 1, len(acc) - len(mx)) || mm
         |             ELSE acc || ' ' || t END) || ' ' AS s
         |  FROM s${r - 1} CROSS JOIN
         |       (SELECT string_split(pair, ' ')[1] AS mx,
         |               string_split(pair, ' ')[2] AS my,
         |               replace(pair, ' ', '') AS mm
         |        FROM b$r) m)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1),
       |s0 AS (
       |  SELECT word, cnt,
       |         ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' '
       |           AS s
       |  FROM wc),
       |$roundCtes""".stripMargin
  }

  private def bpeTrainOracle(rounds: Int): String = {
    val unions = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, pair, n AS n_occurrences FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""${bpeChainCtes(rounds)}
       |$unions
       |""".stripMargin
  }

  /** Token totals per document under the learned merges: per-word-TYPE
    * token counts from the final trainer state, joined back to the
    * word stream. */
  private def bpeEncodeOracle(rounds: Int): String =
    s"""${bpeChainCtes(rounds)},
       |wt AS (
       |  SELECT word,
       |         CAST(len(string_split(trim(s), ' ')) AS BIGINT)
       |           AS n_word_tokens
       |  FROM s$rounds),
       |dw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT dw.doc_id,
       |       CAST(SUM(wt.n_word_tokens) AS BIGINT) AS n_bpe_tokens,
       |       CAST(COUNT(*) AS BIGINT) AS n_words
       |FROM dw JOIN wt USING (word)
       |GROUP BY 1
       |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "bpe_train" -> bpeTrainOracle(3),
    "bpe_encode" -> bpeEncodeOracle(3),

    "stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY md5(text), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 30
        |""".stripMargin,

    "pii_redact" ->
      s"""WITH $piiTextSql
         |SELECT c_custkey,
         |       CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT)
         |         AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT)
         |         AS n_phones,
         |       CAST(len(regexp_extract_all(text, '$ipRe')) AS BIGINT)
         |         AS n_ips,
         |       regexp_replace(
         |         regexp_replace(
         |           regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |           '$phoneRe', '<PHONE>', 'g'),
         |         '$ipRe', '<IP>', 'g') AS redacted
         |FROM pii
         |""".stripMargin,

    "pii_luhn" -> {
      // by-reference pattern + an inlined digit-strip so the Luhn
      // replay cannot desync from the operator
      val ccRe = Curation.ccCandidatePattern
      val d = "replace(replace(c, ' ', ''), '-', '')"
      val dig = s"CAST(substr($d, i, 1) AS INTEGER)"
      s"""WITH cc AS (
         |  SELECT c_custkey,
         |    'card 4' ||
         |    lpad(CAST(c_custkey * 7919 % 100000000000 AS VARCHAR), 11, '0')
         |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
         |    ' alt 5' ||
         |    lpad(CAST(c_custkey * 104729 % 1000 AS VARCHAR), 3, '0')
         |    || '-' || lpad(CAST(c_custkey * 31 % 10000 AS VARCHAR), 4, '0')
         |    || '-' || lpad(CAST(c_custkey * 17 % 10000 AS VARCHAR), 4, '0')
         |    || '-' || lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0')
         |    || ' ref ' ||
         |    lpad(CAST(c_custkey % 100000000000 AS VARCHAR), 11, '0')
         |    AS text
         |  FROM customer),
         |v AS (
         |  SELECT c_custkey, text,
         |    regexp_extract_all(text, '$ccRe') AS cands,
         |    list_filter(regexp_extract_all(text, '$ccRe'), c ->
         |      list_sum(list_transform(range(1, len($d) + 1), i ->
         |        CASE WHEN (len($d) - i) % 2 = 1
         |          THEN CASE WHEN 2 * $dig > 9
         |               THEN 2 * $dig - 9 ELSE 2 * $dig END
         |          ELSE $dig END)) % 10 = 0) AS valid
         |  FROM cc)
         |SELECT c_custkey,
         |  CAST(len(cands) AS BIGINT) AS n_cc_candidates,
         |  CAST(len(valid) AS BIGINT) AS n_ccs,
         |  list_reduce(list_prepend(text, valid),
         |    (acc, m) -> replace(acc, m, '<CC>')) AS cc_redacted
         |FROM v
         |""".stripMargin
    },

    "decontaminate" ->
      """WITH ev AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |pre AS (
        |  SELECT doc_id // 97 AS e_idx,
        |         array_to_string(
        |           list_slice(string_split(text, ' '), 1, 20), ' ') AS quote
        |  FROM ev),
        |corpus AS (
        |  SELECT b.doc_id,
        |         CASE WHEN p.quote IS NOT NULL
        |              THEN b.text || ' ' || p.quote ELSE b.text END AS text
        |  FROM documents b LEFT JOIN pre p
        |    ON b.doc_id % 11 = 0 AND p.e_idx = b.doc_id % 5
        |  WHERE b.doc_id % 97 <> 0),
        |shc AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(string_split(text, ' ')) < 13
        |         THEN [text]
        |         ELSE list_transform(
        |           generate_series(1, len(string_split(text, ' ')) - 12),
        |           i -> array_to_string(
        |                  list_slice(string_split(text, ' '), i, i + 12), ' '))
        |    END) AS sh
        |  FROM corpus),
        |she AS (
        |  SELECT list_distinct(
        |    CASE WHEN len(string_split(text, ' ')) < 13
        |         THEN [text]
        |         ELSE list_transform(
        |           generate_series(1, len(string_split(text, ' ')) - 12),
        |           i -> array_to_string(
        |                  list_slice(string_split(text, ' '), i, i + 12), ' '))
        |    END) AS sh
        |  FROM ev),
        |eg AS (SELECT DISTINCT unnest(sh) AS gram FROM she),
        |cg AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams,
        |              unnest(sh) AS gram
        |       FROM shc)
        |SELECT cg.doc_id, cg.n_grams,
        |       CAST(SUM(CASE WHEN eg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_shared_grams,
        |       CAST(CASE WHEN SUM(CASE WHEN eg.gram IS NOT NULL
        |                              THEN 1 ELSE 0 END) > 0
        |                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM cg LEFT JOIN eg ON cg.gram = eg.gram
        |GROUP BY 1, 2
        |""".stripMargin,

    "paragraph_dedup" ->
      s"""WITH $passagesCte,
         |w AS (
         |  SELECT h, min({'id': doc_id, 'idx': idx}) AS win
         |  FROM p GROUP BY h),
         |m AS (
         |  SELECT p.doc_id, p.idx, p.passage,
         |         (p.doc_id = w.win.id AND p.idx = w.win.idx) AS kept
         |  FROM p JOIN w ON p.h = w.h)
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_passages,
         |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_kept,
         |       coalesce(string_agg(CASE WHEN kept THEN passage END,
         |                           ' ' ORDER BY idx), '') AS text_dedup
         |FROM m GROUP BY doc_id
         |""".stripMargin,

    "repetition_signals" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |         ${gramsSql(2)} AS g2,
         |         ${gramsSql(3)} AS g3
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, g2, g3,
         |         coalesce(list_max(list_transform(list_distinct(g2),
         |           x -> len(list_filter(g2, y -> y = x)))), 0) AS top2,
         |         coalesce(list_sum(list_filter(
         |           list_transform(list_distinct(g3),
         |             x -> len(list_filter(g3, y -> y = x))),
         |           cnt -> cnt > 1)), 0) AS dup3
         |  FROM g)
         |SELECT doc_id,
         |       CAST(len(g2) AS BIGINT) AS n_2grams,
         |       CAST(top2 AS BIGINT) AS top_2gram_count,
         |       CASE WHEN len(g2) = 0 THEN 0.0
         |            ELSE CAST(top2 AS DOUBLE) / CAST(len(g2) AS DOUBLE)
         |       END AS top_2gram_frac,
         |       CAST(len(g3) AS BIGINT) AS n_3grams,
         |       CAST(dup3 AS BIGINT) AS dup_3gram_count,
         |       CASE WHEN len(g3) = 0 THEN 0.0
         |            ELSE CAST(dup3 AS DOUBLE) / CAST(len(g3) AS DOUBLE)
         |       END AS dup_3gram_frac
         |FROM c
         |""".stripMargin,

    "domain_mix" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         ((strpos('0123456789abcdef', md5(text)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef', md5(text)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef', md5(text)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef', md5(text)[4]) - 1)) % 100
        |           AS bucket
        |  FROM documents)
        |SELECT doc_id, lang FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
        |                         WHEN 'es' THEN 20 WHEN 'fr' THEN 10
        |                         WHEN 'zh' THEN 100 ELSE 0 END
        |""".stripMargin,

    "temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c,
        |         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |sw AS (SELECT CAST(SUM(w) AS BIGINT) AS s FROM c),
        |r AS (SELECT lang, LEAST(1000, (1000 * 150 * w) // (s * c)) AS rate
        |      FROM c CROSS JOIN sw),
        |b AS (
        |  SELECT doc_id, lang,
        |         ((strpos('0123456789abcdef', md5(text)[1]) - 1) * 65536 +
        |          (strpos('0123456789abcdef', md5(text)[2]) - 1) * 4096 +
        |          (strpos('0123456789abcdef', md5(text)[3]) - 1) * 256 +
        |          (strpos('0123456789abcdef', md5(text)[4]) - 1) * 16 +
        |          (strpos('0123456789abcdef', md5(text)[5]) - 1)) % 1000
        |           AS bucket
        |  FROM documents)
        |SELECT b.doc_id, b.lang FROM b JOIN r USING (lang)
        |WHERE b.bucket < r.rate
        |""".stripMargin,

    "stable_rank" ->
      """SELECT doc_id, source,
        |       CAST(row_number() OVER (PARTITION BY source
        |                               ORDER BY doc_id) - 1 AS BIGINT)
        |         AS rank
        |FROM documents
        |""".stripMargin,

    "budget_select" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         ${util.hash60Sql("CAST(doc_id AS VARCHAR)")} AS pri
         |  FROM documents),
         |b AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM d),
         |c AS (
         |  SELECT doc_id, n_tokens, pri,
         |         CAST(SUM(n_tokens)
         |              OVER (ORDER BY pri DESC, doc_id ASC) AS BIGINT)
         |           AS cum_tokens
         |  FROM d)
         |SELECT doc_id, n_tokens, pri, cum_tokens
         |FROM c CROSS JOIN b
         |WHERE cum_tokens - n_tokens < budget
         |""".stripMargin,

    "budget_select_by_domain" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         ${util.hash60Sql("CAST(doc_id AS VARCHAR)")} AS pri
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens, pri,
         |         CAST(SUM(n_tokens)
         |              OVER (PARTITION BY source
         |                    ORDER BY pri DESC, doc_id ASC) AS BIGINT)
         |           AS cum_tokens
         |  FROM d)
         |SELECT doc_id, source, n_tokens, pri, cum_tokens
         |FROM c WHERE cum_tokens - n_tokens < 700
         |""".stripMargin,

    "rendezvous_assign" ->
      s"""WITH s(shard) AS (
         |  VALUES ('node0'), ('node1'), ('node2'), ('node3'), ('node4')),
         |h AS (
         |  SELECT doc_id, shard,
         |         ${util.hash60Sql("CAST(doc_id AS VARCHAR) || ':' || shard")}
         |           AS hv
         |  FROM documents, s),
         |r AS (
         |  SELECT doc_id, shard,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |                            ORDER BY hv DESC, shard DESC) AS rn
         |  FROM h)
         |SELECT doc_id, shard FROM r WHERE rn = 1
         |""".stripMargin,

    "length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(((strpos('0123456789abcdef', md5(text)[1]) - 1) * 4096 +
        |               (strpos('0123456789abcdef', md5(text)[2]) - 1) * 256 +
        |               (strpos('0123456789abcdef', md5(text)[3]) - 1) * 16 +
        |               (strpos('0123456789abcdef', md5(text)[4]) - 1)) % 4
        |              AS BIGINT) AS shard
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |                                 ORDER BY n_tokens ASC,
        |                                          doc_id ASC)
        |           AS BIGINT) - 1 AS rn
        |  FROM t),
        |b AS (SELECT shard, rn // 16 AS batch_id, n_tokens FROM r)
        |SELECT shard, CAST(batch_id AS BIGINT) AS batch_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
        |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |       CAST((MAX(n_tokens) * COUNT(*) - SUM(n_tokens)) * 1000
        |            // (MAX(n_tokens) * COUNT(*)) AS BIGINT)
        |         AS pad_overhead_permille
        |FROM b GROUP BY 1, 2
        |""".stripMargin,

    // Same planted copies; (source, md5) counts folded per source.
    "dup_by_source" ->
      """WITH d AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT source, text FROM documents WHERE doc_id % 5 = 0),
        |c AS (SELECT source AS grp, md5(text) AS h,
        |             CAST(COUNT(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2)
        |SELECT grp, CAST(SUM(c) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs,
        |  CASE WHEN SUM(c) > 0 THEN
        |    CAST((SUM(c) - COUNT(*)) * 1000 // SUM(c) AS BIGINT) END
        |    AS dup_permille
        |FROM c GROUP BY 1
        |""".stripMargin,

    // Same cross-source re-homing; hash-keyed pair join, sizes joined.
    "source_overlap" ->
      """WITH d AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT 'src' || CAST((doc_id // 6) % 20 AS VARCHAR) AS source,
        |         text
        |  FROM documents WHERE doc_id % 6 = 0),
        |inc AS (SELECT DISTINCT source AS g, md5(text) AS h FROM d),
        |sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM inc GROUP BY 1),
        |p AS (SELECT a.g AS g_a, b.g AS g_b,
        |             CAST(COUNT(*) AS BIGINT) AS n_common
        |      FROM inc a JOIN inc b ON a.h = b.h AND a.g < b.g
        |      GROUP BY 1, 2)
        |SELECT p.g_a, p.g_b, p.n_common, sa.n AS n_a, sb.n AS n_b,
        |  CAST(p.n_common * 1000 // (sa.n + sb.n - p.n_common)
        |    AS BIGINT) AS jaccard_permille
        |FROM p JOIN sz sa ON p.g_a = sa.g JOIN sz sb ON p.g_b = sb.g
        |""".stripMargin,

    // Per-source row_number with the same total order; permille with
    // integer //; single-row sources → NULL.
    "rank_normalize" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS gn
        |  FROM documents)
        |SELECT doc_id, source, n_chars, rnk,
        |  CASE WHEN gn > 1 THEN
        |    CAST((rnk - 1) * 1000 // (gn - 1) AS BIGINT) END
        |    AS rank_permille
        |FROM r
        |""".stripMargin,

    // Within-group and pooled row_numbers over the same total orders,
    // target position by integer div, value lookup on the pooled rank.
    "quantile_normalize" ->
      """WITH s AS (SELECT doc_id, source, n_chars FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM s),
        |r AS (SELECT doc_id, source, n_chars,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |        CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
        |          AS gn
        |      FROM s),
        |p AS (SELECT n_chars AS pv,
        |        CAST(row_number() OVER
        |          (ORDER BY n_chars, source, doc_id) AS BIGINT)
        |          AS prank
        |      FROM s)
        |SELECT r.doc_id, r.source, r.n_chars, p.pv AS norm_score
        |FROM r CROSS JOIN nn JOIN p
        |  ON p.prank = CASE WHEN r.gn > 1
        |    THEN (r.rk - 1) * (nn.n - 1) // (r.gn - 1) + 1
        |    ELSE (nn.n - 1) // 2 + 1 END
        |""".stripMargin,

    // Same labeler minting, unnest melt, (item, label) counts, top-2
    // by (count desc, label asc), tie → NULL winner.
    "majority_vote" ->
      """WITH lab AS (
        |  SELECT event_id,
        |    event_type AS l1,
        |    CASE WHEN event_id % 3 = 0 THEN 'click'
        |         ELSE event_type END AS l2,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE event_type END AS l3
        |  FROM events),
        |v AS (
        |  SELECT event_id, unnest([l1, l2, l3]) AS lbl FROM lab),
        |vv AS (SELECT event_id, lbl FROM v WHERE lbl IS NOT NULL),
        |c AS (
        |  SELECT event_id, lbl, CAST(COUNT(*) AS BIGINT) AS c,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY COUNT(*) DESC, lbl ASC) AS r
        |  FROM vv GROUP BY 1, 2),
        |t AS (
        |  SELECT event_id,
        |    MAX(CASE WHEN r = 1 THEN lbl END) AS w,
        |    MAX(CASE WHEN r = 1 THEN c END) AS top_count,
        |    COALESCE(MAX(CASE WHEN r = 2 THEN c END), 0) AS c2
        |  FROM c WHERE r <= 2 GROUP BY 1),
        |n AS (SELECT event_id, CAST(COUNT(*) AS BIGINT) AS n_votes
        |      FROM vv GROUP BY 1)
        |SELECT n.event_id, n.n_votes,
        |  CASE WHEN t.top_count > t.c2 THEN t.w END AS winner,
        |  CAST(t.top_count AS BIGINT) AS top_count,
        |  CAST(t.top_count - t.c2 AS BIGINT) AS margin,
        |  CAST(CASE WHEN t.top_count = t.c2 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_tie
        |FROM n JOIN t ON n.event_id = t.event_id
        |""".stripMargin,

    // Same planted-copy fixture; candidate pairs from block sizes in
    // HUGEINT, truth pairs keyed by two id joins.
    "blocking_quality" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |copies AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |         CASE WHEN doc_id % 10 = 0 THEN 'zz ' || text
        |              ELSE text END AS text
        |  FROM base WHERE doc_id % 5 = 0),
        |recs AS (SELECT * FROM base UNION ALL SELECT * FROM copies),
        |keys AS (SELECT doc_id AS id, substr(text, 1, 8) AS k FROM recs),
        |blocks AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c
        |           FROM keys GROUP BY 1),
        |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |             COALESCE(SUM(CAST(c AS HUGEINT) * (c - 1) // 2),
        |                      0) AS cand
        |      FROM blocks),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM keys),
        |tr AS (SELECT doc_id AS a, doc_id + 1000000 AS b2
        |       FROM base WHERE doc_id % 5 = 0),
        |tj AS (SELECT ka.k AS ka, kb.k AS kb
        |       FROM tr JOIN keys ka ON tr.a = ka.id
        |               JOIN keys kb ON tr.b2 = kb.id),
        |ts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth_pairs,
        |         CAST(COALESCE(SUM(CASE WHEN ka = kb THEN 1 ELSE 0 END),
        |           0) AS BIGINT) AS n_truth_covered
        |       FROM tj)
        |SELECT t.n_records, b.n_blocks,
        |  CAST(b.cand AS BIGINT) AS n_candidate_pairs,
        |  ts.n_truth_pairs, ts.n_truth_covered,
        |  CASE WHEN ts.n_truth_pairs > 0 THEN
        |    CAST(ts.n_truth_covered * 1000 // ts.n_truth_pairs AS BIGINT)
        |  END AS pair_completeness_permille,
        |  CASE WHEN t.n_records > 1 THEN
        |    CAST(1000 - b.cand * 1000 //
        |      (CAST(t.n_records AS HUGEINT) * (t.n_records - 1) // 2)
        |      AS BIGINT) END AS reduction_permille
        |FROM t, b, ts
        |""".stripMargin,

    // Same distinct incidences, basket-size keep, co-located pair
    // join, marginal joins; lift's cross-multiplication in HUGEINT.
    "assoc_rules" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey % 40 AS it
        |  FROM lineitem),
        |keep AS (SELECT bk FROM (SELECT bk, COUNT(*) AS c FROM inc
        |                         GROUP BY 1) WHERE c <= 100),
        |k AS (SELECT inc.bk, inc.it FROM inc JOIN keep USING (bk)),
        |nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM k),
        |ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS ci
        |       FROM k GROUP BY 1),
        |p AS (SELECT x.it AS a, y.it AS b, CAST(COUNT(*) AS BIGINT)
        |        AS n_ab
        |      FROM k x JOIN k y ON x.bk = y.bk AND x.it <> y.it
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 10)
        |SELECT p.a, p.b, ia.ci AS n_a, ib.ci AS n_b, p.n_ab,
        |  CAST(p.n_ab * 1000 // nb.n AS BIGINT) AS support_permille,
        |  CAST(p.n_ab * 1000 // ia.ci AS BIGINT) AS confidence_permille,
        |  CAST(CAST(p.n_ab AS HUGEINT) * nb.n * 1000
        |       // (CAST(ia.ci AS HUGEINT) * ib.ci) AS BIGINT)
        |    AS lift_permille
        |FROM p
        |JOIN ic ia ON p.a = ia.it
        |JOIN ic ib ON p.b = ib.it
        |CROSS JOIN nb
        |""".stripMargin,

    "profile_table" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS column_name,
           |       CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(MIN($c) AS VARCHAR) AS min_value,
           |       CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM documents""".stripMargin).mkString("", "\nUNION ALL\n", "\n"),

    "heavy_hitters" ->
      """WITH u AS (
        |  SELECT UNNEST(string_split(text, ' ')) AS item FROM documents),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u)
        |SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM u CROSS JOIN t
        |GROUP BY item, t.n
        |HAVING COUNT(*) * 32 > t.n
        |""".stripMargin,

    "mix_schedule" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         ((CAST(substr(source, 4) AS INT) % 3) + 1) AS wt,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY doc_id) - 1 AS BIGINT)
        |           AS mix_rank
        |  FROM documents)
        |SELECT doc_id, source, mix_rank,
        |       CAST((mix_rank + 1) * (6 // wt) AS BIGINT) AS sched_key
        |FROM r
        |""".stripMargin,

    "ngram_topk" ->
      s"""WITH g AS (
         |  SELECT UNNEST(${gramsSql(3)}) AS gram FROM documents)
         |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
         |FROM g GROUP BY gram
         |ORDER BY n_occurrences DESC, gram ASC
         |LIMIT 20
         |""".stripMargin,

    // mirror of chunkDocuments(40, overlap 10): starts 0,30,60,… up to
    // the last word index, each chunk the next 40 words (partial tail
    // kept)
    "doc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |         len(string_split(text, ' ')) AS nw
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, w,
        |         UNNEST(generate_series(0, greatest(nw - 1, 0), 30)) AS s
        |  FROM d)
        |SELECT doc_id,
        |       CAST(s // 30 AS BIGINT) AS chunk_id,
        |       CAST(s AS BIGINT) AS start_word,
        |       CAST(len(list_slice(w, s + 1, s + 40)) AS BIGINT) AS n_words,
        |       array_to_string(list_slice(w, s + 1, s + 40), ' ')
        |         AS chunk_text
        |FROM st
        |""".stripMargin,

    // mirror of importanceWeights(target = lang 'en', 256 buckets,
    // scale 1e6): smoothed likelihood-ratio sum per document
    "importance_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |         UNNEST(string_split(text, ' ')) AS word
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, is_t,
        |         ((strpos('0123456789abcdef', md5(word)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef', md5(word)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef', md5(word)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef', md5(word)[4]) - 1)) % 256 AS b
        |  FROM tok),
        |raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS raw_n
        |        FROM tb GROUP BY 1),
        |tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tgt_n
        |        FROM tb WHERE is_t GROUP BY 1),
        |r AS (SELECT raw.b,
        |             ((COALESCE(tgt_n, 0) + 1) * 1000000) // (raw_n + 1)
        |               AS ratio
        |      FROM raw LEFT JOIN tgt USING (b))
        |SELECT tb.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(ratio) AS BIGINT) AS importance_sum,
        |       CAST(CAST(SUM(ratio) AS BIGINT) // COUNT(*) AS BIGINT)
        |         AS importance_mean
        |FROM tb JOIN r USING (b)
        |GROUP BY 1
        |""".stripMargin,

    // mirror of lmScores(scale 1e9): bigrams from adjacent word pairs,
    // add-one-smoothed scaled conditionals, per-document integer sum
    "ngram_lm" -> ngramLmOracleSql,

    // scoring through the persisted LM tables must be indistinguishable
    // from in-memory training on the same corpus — shared oracle
    "ngram_lm_loaded" -> ngramLmOracleSql,
    "ngram_lm_delta" -> ngramLmOracleSql,

    // train on everything, delete the odd half, score the even half ≡
    // a model that never saw the odd half scoring its own corpus
    "ngram_lm_delete" -> ngramLmOracleSql.replace(
      "SELECT doc_id, string_split(text, ' ') AS w FROM documents),",
      "SELECT doc_id, string_split(text, ' ') AS w FROM documents " +
        "WHERE doc_id % 2 = 0),"),

    // mirror of pmiCollocations(minCount 5, scale 1e6): same bigram/
    // unigram counts, same integer ratio, same ordering
    "pmi_collocations" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |st AS (
        |  SELECT doc_id, w,
        |         UNNEST(generate_series(1, len(w) - 1)) AS i
        |  FROM tok),
        |p2 AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM st),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |       FROM p2 GROUP BY 1, 2),
        |uni AS (SELECT UNNEST(w) AS word FROM tok),
        |cw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cw
        |       FROM uni GROUP BY 1),
        |nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c2)
        |SELECT c2.w1, c2.w2, c2.c12,
        |       CAST((CAST(c2.c12 AS HUGEINT) * nb.nb * 1000000)
        |            // (CAST(a.cw AS HUGEINT) * b.cw) AS BIGINT)
        |         AS pmi_scaled
        |FROM c2 JOIN cw a ON c2.w1 = a.word
        |        JOIN cw b ON c2.w2 = b.word
        |        CROSS JOIN nb
        |WHERE c2.c12 >= 5
        |ORDER BY pmi_scaled DESC, c2.w1 ASC, c2.w2 ASC
        |LIMIT 20
        |""".stripMargin,

    // mirror of weightedSample(k 60, weight n_chars): same 60-bit md5
    // uniform, same IEEE u/w priority, same ordering
    "weighted_sample" ->
      """SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |       AS BIGINT) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
        |FROM documents
        |WHERE n_chars > 0
        |ORDER BY priority ASC, id ASC
        |LIMIT 60
        |""".stripMargin,

    // mirror of the Count-Min sketch (d=4, w=512): the cell counts are
    // plain sums (commutative), so the oracle reproduces the matrix —
    // and therefore the estimates, collisions included — exactly
    "cm_counts" ->
      """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
        |rws AS (SELECT UNNEST([0, 1, 2, 3]) AS r),
        |cell AS (
        |  SELECT r,
        |         ((strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(r AS VARCHAR) || ':' || v)[4]) - 1)) % 512 AS p,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ev CROSS JOIN rws GROUP BY 1, 2),
        |probes AS (
        |  SELECT CAST(UNNEST(generate_series(1, 20)) AS VARCHAR) AS v),
        |pp AS (
        |  SELECT probes.v, rws.r,
        |         ((strpos('0123456789abcdef',
        |             md5(CAST(rws.r AS VARCHAR) || ':' || probes.v)[1]) - 1) * 4096 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(rws.r AS VARCHAR) || ':' || probes.v)[2]) - 1) * 256 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(rws.r AS VARCHAR) || ':' || probes.v)[3]) - 1) * 16 +
        |          (strpos('0123456789abcdef',
        |             md5(CAST(rws.r AS VARCHAR) || ':' || probes.v)[4]) - 1)) % 512 AS p
        |  FROM probes CROSS JOIN rws)
        |SELECT pp.v, CAST(MIN(COALESCE(cell.c, 0)) AS BIGINT) AS est_count
        |FROM pp LEFT JOIN cell ON cell.r = pp.r AND cell.p = pp.p
        |GROUP BY 1
        |""".stripMargin,

    "bpe_pairs" ->
      """WITH p AS (
        |  SELECT UNNEST(CASE WHEN len(text) < 2 THEN []
        |                ELSE list_transform(generate_series(1, len(text) - 1),
        |                       i -> substr(text, i, 2)) END) AS pair
        |  FROM documents)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM p GROUP BY pair
        |ORDER BY n_occurrences DESC, pair ASC
        |LIMIT 20
        |""".stripMargin,

    "length_quantiles" ->
      """WITH t AS (
        |  SELECT lang, len(string_split(text, ' ')) AS n FROM documents)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(round(quantile_cont(n, 0.25) * 100) AS BIGINT)
        |         AS p25_tokens_cents,
        |       CAST(round(quantile_cont(n, 0.5) * 100) AS BIGINT)
        |         AS p50_tokens_cents,
        |       CAST(round(quantile_cont(n, 0.75) * 100) AS BIGINT)
        |         AS p75_tokens_cents
        |FROM t GROUP BY lang
        |""".stripMargin,

    // Per-side bottom-64 hash samples, merged distinct values,
    // cumulative per-side counts, integer max |ca·nb − cb·na| → floor
    // permille.
    "ks_drift" -> {
      val h60 = util.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH sa AS (
         |  SELECT n_chars AS v FROM documents
         |  WHERE CAST(substr(source, 4) AS INTEGER) < 10
         |  ORDER BY $h60, n_chars LIMIT 64),
         |sb AS (
         |  SELECT n_chars AS v FROM documents
         |  WHERE CAST(substr(source, 4) AS INTEGER) >= 10
         |  ORDER BY $h60, n_chars LIMIT 64),
         |u AS (SELECT v, 1 AS a, 0 AS b FROM sa
         |      UNION ALL SELECT v, 0, 1 FROM sb),
         |p AS (SELECT v, SUM(a) AS da, SUM(b) AS db FROM u GROUP BY v),
         |c AS (SELECT v,
         |        SUM(da) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         |        SUM(db) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
         |      FROM p),
         |t AS (SELECT (SELECT COUNT(*) FROM sa) AS na,
         |             (SELECT COUNT(*) FROM sb) AS nb)
         |SELECT CAST(t.na AS BIGINT) AS n_a_sample,
         |       CAST(t.nb AS BIGINT) AS n_b_sample,
         |       CASE WHEN t.na = 0 OR t.nb = 0 THEN NULL
         |            ELSE CAST(MAX(abs(c.ca * t.nb - c.cb * t.na)) * 1000
         |                 // (t.na * t.nb) AS BIGINT) END AS ks_permille
         |FROM t LEFT JOIN c ON TRUE GROUP BY t.na, t.nb
         |""".stripMargin
    },

    // Same 200-row sample → median cents → MAD half-cents → per-row
    // cross-multiplied flag; every step exact integers.
    "robust_outliers" -> {
      val h60 = util.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (
         |  SELECT n_chars AS v FROM documents
         |  ORDER BY $h60, n_chars LIMIT 200),
         |m AS (SELECT CAST(round(quantile_cont(v, 0.5) * 100) AS BIGINT)
         |        AS mc FROM s),
         |mad AS (
         |  SELECT CAST(round(quantile_cont(abs(v * 100 - m.mc), 0.5) * 2)
         |        AS BIGINT) AS mh
         |  FROM s, m)
         |SELECT doc_id, n_chars,
         |       CAST(abs(n_chars * 100 - m.mc) * 2 AS BIGINT)
         |         AS dev_halfcents,
         |       CAST(CASE WHEN abs(n_chars * 100 - m.mc) * 2 * 1000
         |                      > 2000 * mad.mh
         |            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
         |FROM documents, m, mad
         |""".stripMargin
    },

    // Per-source bottom-16-by-hash sample via a ranked window (the
    // oracle's formulation of the bounded aggregate), quantile_cont
    // per source over the sample.
    "sketch_quantiles_by_key" -> {
      val h60 = util.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (
         |  SELECT source, n_chars AS v,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY $h60, n_chars) AS rk
         |  FROM documents),
         |s AS (SELECT source, v FROM r WHERE rk <= 16),
         |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
         |      FROM documents GROUP BY 1)
         |SELECT t.source, t.n_total,
         |       CAST(COUNT(*) AS BIGINT) AS n_sample,
         |       CAST(round(quantile_cont(v, 0.250) * 100) AS BIGINT)
         |         AS p250_cents,
         |       CAST(round(quantile_cont(v, 0.500) * 100) AS BIGINT)
         |         AS p500_cents,
         |       CAST(round(quantile_cont(v, 0.750) * 100) AS BIGINT)
         |         AS p750_cents
         |FROM s JOIN t USING (source) GROUP BY 1, 2
         |""".stripMargin
    },

    // Same sample → three interior quartile boundaries as a list →
    // per-row strict-greater count. list built once in a CTE, the
    // per-row work mirrors the engine's broadcast filter.
    "quantile_bucket" -> {
      val h60 = util.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (
         |  SELECT n_chars AS v FROM documents
         |  ORDER BY $h60, n_chars LIMIT 200),
         |b AS (
         |  SELECT quantile_cont(v, [0.25, 0.5, 0.75]) AS bounds FROM s)
         |SELECT doc_id, n_chars,
         |       CAST(1 + len(list_filter(b.bounds,
         |              x -> CAST(n_chars AS DOUBLE) > x)) AS BIGINT)
         |         AS bucket
         |FROM documents CROSS JOIN b
         |""".stripMargin
    },

    // The same bottom-200-by-md5-hash sample (ORDER BY hash, value —
    // TopKPairs' tie rule), quantile_cont over the sample, n_total from
    // the full table.
    "exact_quantiles" ->
      """WITH t AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |           AS price_cents, o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT price_cents,
        |         CAST(row_number() OVER (ORDER BY price_cents,
        |           o_orderkey) AS BIGINT) AS rank,
        |         CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM t),
        |qs(q) AS (VALUES (1), (25), (50), (75), (99))
        |SELECT CAST(q AS BIGINT) AS q, price_cents, rank, n
        |FROM r JOIN qs ON rank = (q * n + 99) // 100
        |""".stripMargin,

    "sketch_quantiles" -> {
      val h60 = util.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (
         |  SELECT n_chars AS v FROM documents
         |  ORDER BY $h60, n_chars LIMIT 200)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
         |         AS n_total,
         |       CAST(COUNT(*) AS BIGINT) AS n_sample,
         |       CAST(round(quantile_cont(v, 0.250) * 100) AS BIGINT)
         |         AS p250_cents,
         |       CAST(round(quantile_cont(v, 0.500) * 100) AS BIGINT)
         |         AS p500_cents,
         |       CAST(round(quantile_cont(v, 0.750) * 100) AS BIGINT)
         |         AS p750_cents,
         |       CAST(round(quantile_cont(v, 0.900) * 100) AS BIGINT)
         |         AS p900_cents
         |FROM s
         |""".stripMargin
    },

    "kmeans_clusters" ->
      s"""WITH s AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> round(CAST(x AS DOUBLE) * 1000, 0)) AS v
         |  FROM embeddings),
         |c0 AS (SELECT id AS cl, v AS cv FROM s WHERE id < 8),
         |${kmeansRound("a1", "c0", "u1", "c1")},
         |${kmeansRound("a2", "c1", "u2", "c2")}
         |SELECT id AS vec_id, cl AS cluster, ${kCos("t.v", "t.cv")} AS cos_sim
         |FROM (
         |  SELECT s.id, s.v, c.cl, c.cv,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY s.id
         |           ORDER BY ${kCos("s.v", "c.cv")} DESC, c.cl ASC) AS rk
         |  FROM s CROSS JOIN c2 c) t
         |WHERE rk = 1
         |""".stripMargin,

    // kmeans CTEs shared with kmeans_clusters, then label cells and
    // the per-cluster (count desc, label asc) argmax
    "cluster_purity" ->
      s"""WITH s AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> round(CAST(x AS DOUBLE) * 1000, 0)) AS v
         |  FROM embeddings),
         |c0 AS (SELECT id AS cl, v AS cv FROM s WHERE id < 8),
         |${kmeansRound("a1", "c0", "u1", "c1")},
         |${kmeansRound("a2", "c1", "u2", "c2")},
         |asg AS (
         |  SELECT id, cl AS cluster FROM (
         |    SELECT s.id, c.cl,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY s.id
         |             ORDER BY ${kCos("s.v", "c.cv")} DESC, c.cl ASC) AS rk
         |    FROM s CROSS JOIN c2 c) t
         |  WHERE rk = 1),
         |cells AS (
         |  SELECT asg.cluster, CAST(e.label AS BIGINT) AS label,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM asg JOIN embeddings e ON asg.id = e.vec_id
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT cluster, label, c,
         |         row_number() OVER (PARTITION BY cluster
         |           ORDER BY c DESC, label ASC) AS r
         |  FROM cells)
         |SELECT cluster, CAST(SUM(c) AS BIGINT) AS n,
         |  MAX(CASE WHEN r = 1 THEN label END) AS top_label,
         |  CAST(MAX(CASE WHEN r = 1 THEN c END) AS BIGINT) AS top_count,
         |  CAST(MAX(CASE WHEN r = 1 THEN c END) * 1000 // SUM(c)
         |    AS BIGINT) AS purity_permille
         |FROM rk GROUP BY 1
         |""".stripMargin,

    // kmeans CTEs shared with kmeans_clusters, then the within-cluster
    // pair join, the keep-the-rim drop rule, and the survivor flag
    "sem_dedup" ->
      s"""WITH s AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> round(CAST(x AS DOUBLE) * 1000, 0)) AS v
         |  FROM embeddings),
         |c0 AS (SELECT id AS cl, v AS cv FROM s WHERE id < 8),
         |${kmeansRound("a1", "c0", "u1", "c1")},
         |${kmeansRound("a2", "c1", "u2", "c2")},
         |af AS (
         |  SELECT id, v, cl, ${kCos("t.v", "t.cv")} AS cc
         |  FROM (
         |    SELECT s.id, s.v, c.cl, c.cv,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY s.id
         |             ORDER BY ${kCos("s.v", "c.cv")} DESC, c.cl ASC) AS rk
         |    FROM s CROSS JOIN c2 c) t
         |  WHERE rk = 1),
         |pairs AS (
         |  SELECT a.id AS ia, b.id AS ib, a.cc AS ca, b.cc AS cb
         |  FROM af a JOIN af b ON a.cl = b.cl AND a.id < b.id
         |  WHERE ${kCos("a.v", "b.v")} >= 0.4),
         |drops AS (
         |  SELECT DISTINCT CASE WHEN ca > cb THEN ia
         |                       WHEN ca < cb THEN ib
         |                       ELSE greatest(ia, ib) END AS did
         |  FROM pairs)
         |SELECT af.id AS vec_id, af.cl AS cluster, af.cc AS centroid_cos,
         |       CAST(CASE WHEN did IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_kept
         |FROM af LEFT JOIN drops ON af.id = did
         |""".stripMargin,

    "tfidf_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfr AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         CAST(tf.tf AS BIGINT) AS tf, CAST(dfr.df AS BIGINT) AS df,
        |         CAST(tf.tf * n.n AS DOUBLE) / CAST(dfr.df AS DOUBLE)
        |           AS tfidf
        |  FROM tf JOIN dfr USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored) t
        |WHERE rk <= 3
        |""".stripMargin,

    "rake_keywords" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'Deep learning models are trained on the web with large ' ||
        |    'data pipelines, and a data engine is the key. ' || text
        |      AS page
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, list_filter(list_transform(
        |    string_split(regexp_replace(regexp_replace(lower(page),
        |      '[^a-z0-9 ]+', chr(1), 'g'),
        |      '\b(the|of|and|a|to|in|is|on|for|with|as|at|by|an|be|are|was|it|that|this)\b',
        |      chr(1), 'g'), chr(1)),
        |    s -> trim(regexp_replace(s, ' +', ' ', 'g'))),
        |    s -> s <> '') AS phrases
        |  FROM p),
        |occ AS (SELECT doc_id, UNNEST(phrases) AS phrase FROM c),
        |wo AS (
        |  SELECT UNNEST(string_split(phrase, ' ')) AS w,
        |         len(string_split(phrase, ' ')) AS plen
        |  FROM occ),
        |ws AS (
        |  SELECT w, COUNT(*) AS freq, SUM(plen) AS deg FROM wo
        |  GROUP BY 1),
        |ws2 AS (
        |  SELECT w, (deg // freq) * 1000000000 +
        |            ((deg % freq) * 1000000000) // freq AS wscore
        |  FROM ws),
        |pt AS (SELECT DISTINCT phrase FROM occ),
        |pw AS (
        |  SELECT phrase, UNNEST(string_split(phrase, ' ')) AS w FROM pt),
        |ps AS (
        |  SELECT phrase, SUM(wscore) AS score
        |  FROM pw JOIN ws2 USING (w) GROUP BY 1),
        |dp AS (SELECT DISTINCT doc_id, phrase FROM occ)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rank, phrase,
        |       CAST(score AS BIGINT) AS score
        |FROM (
        |  SELECT dp.doc_id, dp.phrase, ps.score, ROW_NUMBER() OVER (
        |    PARTITION BY dp.doc_id
        |    ORDER BY ps.score DESC, dp.phrase ASC) AS rk
        |  FROM dp JOIN ps USING (phrase)) t
        |WHERE rk <= 3
        |""".stripMargin,

    "sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(((strpos('0123456789abcdef', md5(text)[1]) - 1) * 4096 +
        |               (strpos('0123456789abcdef', md5(text)[2]) - 1) * 256 +
        |               (strpos('0123456789abcdef', md5(text)[3]) - 1) * 16 +
        |               (strpos('0123456789abcdef', md5(text)[4]) - 1)) % 4
        |              AS BIGINT) AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |         SUM(n_tokens) OVER (
        |           PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           - n_tokens AS offset_tokens
        |  FROM t)
        |SELECT doc_id, shard, n_tokens,
        |       CAST(offset_tokens AS BIGINT) AS offset_tokens,
        |       CAST(offset_tokens // 256 AS BIGINT) AS pack_id
        |FROM c
        |""".stripMargin,

    "curate_export" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         |              AS DOUBLE) / CAST(len(text) AS DOUBLE) AS alpha_ratio
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, text FROM scored
         |  WHERE n_tokens >= 5 AND alpha_ratio >= 0.6),
         |red AS (
         |  SELECT doc_id,
         |         regexp_replace(
         |           regexp_replace(
         |             regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |             '$phoneRe', '<PHONE>', 'g'),
         |           '$ipRe', '<IP>', 'g') AS text
         |  FROM kept),
         |surv AS (
         |  SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
         |  FROM red GROUP BY md5(text)),
         |spl AS (
         |  SELECT doc_id, text,
         |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
         |  FROM surv),
         |train AS (
         |  SELECT doc_id, text FROM spl
         |  WHERE ((strpos('0123456789abcdef', f[1]) - 1) * 4096 +
         |         (strpos('0123456789abcdef', f[2]) - 1) * 256 +
         |         (strpos('0123456789abcdef', f[3]) - 1) * 16 +
         |         (strpos('0123456789abcdef', f[4]) - 1)) % 10 < 8),
         |t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         CAST(((strpos('0123456789abcdef', md5(text)[1]) - 1) * 4096 +
         |               (strpos('0123456789abcdef', md5(text)[2]) - 1) * 256 +
         |               (strpos('0123456789abcdef', md5(text)[3]) - 1) * 16 +
         |               (strpos('0123456789abcdef', md5(text)[4]) - 1)) % 4
         |              AS BIGINT) AS shard
         |  FROM train),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |         SUM(n_tokens) OVER (
         |           PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           - n_tokens AS offset_tokens
         |  FROM t)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(offset_tokens AS BIGINT) AS offset_tokens,
         |       CAST(offset_tokens // 256 AS BIGINT) AS pack_id
         |FROM c
         |""".stripMargin,

    "good_turing" ->
      """WITH w AS (
        |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
        |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS r FROM w GROUP BY 1),
        |nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(r) AS BIGINT) AS total_tokens,
        |             CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_1
        |      FROM c)
        |SELECT nr.r, nr.n_r,
        |       CAST((nr.r + 1) * COALESCE(nx.n_r, 0) * 1000000 // nr.n_r
        |         AS BIGINT) AS r_star_ppm,
        |       CAST(t.n_1 * 1000000000 // t.total_tokens AS BIGINT)
        |         AS p_unseen_ppb
        |FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1, t
        |""".stripMargin,

    "ngram_novelty" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(string_split(text, ' ')) < 3
        |         THEN [text]
        |         ELSE list_transform(
        |           generate_series(1, len(string_split(text, ' ')) - 2),
        |           i -> array_to_string(
        |                  list_slice(string_split(text, ' '), i, i + 2), ' '))
        |    END) AS sh
        |  FROM documents),
        |ref AS (
        |  SELECT DISTINCT UNNEST(sh) AS gram FROM sh WHERE doc_id % 10 = 0),
        |dg AS (
        |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams,
        |         UNNEST(sh) AS gram
        |  FROM sh)
        |SELECT dg.doc_id, dg.n_grams,
        |       CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) * 100
        |            // dg.n_grams AS BIGINT) AS novelty_pct
        |FROM dg LEFT JOIN ref r ON dg.gram = r.gram
        |GROUP BY 1, 2
        |""".stripMargin,

    "corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 13 = 0)
        |SELECT COALESCE(d.doc_id, v2.doc_id) AS doc_id,
        |       CASE WHEN d.doc_id IS NULL THEN 'added'
        |            WHEN v2.doc_id IS NULL THEN 'removed'
        |            WHEN md5(d.text) = md5(v2.text) THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM documents d FULL OUTER JOIN v2 ON d.doc_id = v2.doc_id
        |""".stripMargin,

    "relative_filter" ->
      """WITH p AS (
        |  SELECT source, quantile_cont(n_chars, 0.5) AS cut
        |  FROM documents GROUP BY 1)
        |SELECT d.source, d.doc_id, d.n_chars
        |FROM documents d JOIN p USING (source)
        |WHERE d.n_chars >= p.cut
        |""".stripMargin,

    "hll_registers" ->
      """WITH v AS (
        |  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        |rr AS (
        |  SELECT (strpos('0123456789abcdef', h[1]) - 1) * 16 +
        |         (strpos('0123456789abcdef', h[2]) - 1) AS register,
        |         substr(h, 3, 16) AS tail
        |  FROM v),
        |rz AS (
        |  SELECT register, length(regexp_extract(tail, '^0*')) AS z, tail
        |  FROM rr),
        |rho AS (
        |  SELECT register,
        |         CASE WHEN z = 16 THEN 65
        |              ELSE z * 4 +
        |                CASE WHEN strpos('89abcdef', tail[z + 1]) > 0 THEN 0
        |                     WHEN strpos('4567', tail[z + 1]) > 0 THEN 1
        |                     WHEN strpos('23', tail[z + 1]) > 0 THEN 2
        |                     ELSE 3 END + 1 END AS rho
        |  FROM rz)
        |SELECT CAST(register AS BIGINT) AS register,
        |       CAST(MAX(rho) AS BIGINT) AS rho
        |FROM rho GROUP BY 1
        |""".stripMargin,

    "hll_estimate" ->
      """WITH e AS (
        |  SELECT DISTINCT event_type,
        |         md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |rr AS (
        |  SELECT event_type,
        |         (strpos('0123456789abcdef', h[1]) - 1) * 16 +
        |         (strpos('0123456789abcdef', h[2]) - 1) AS register,
        |         substr(h, 3, 16) AS tail
        |  FROM e),
        |rz AS (
        |  SELECT event_type, register,
        |         length(regexp_extract(tail, '^0*')) AS z, tail
        |  FROM rr),
        |rho AS (
        |  SELECT event_type, register,
        |         CASE WHEN z = 16 THEN 65
        |              ELSE z * 4 +
        |                CASE WHEN strpos('89abcdef', tail[z + 1]) > 0 THEN 0
        |                     WHEN strpos('4567', tail[z + 1]) > 0 THEN 1
        |                     WHEN strpos('23', tail[z + 1]) > 0 THEN 2
        |                     ELSE 3 END + 1 END AS rho
        |  FROM rz),
        |regs AS (
        |  SELECT event_type, register, MAX(rho) AS rho
        |  FROM rho GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type,
        |         CAST(SUM(CASE WHEN rho <= 32
        |                       THEN (CAST(1 AS BIGINT)
        |                             << CAST(32 - rho AS INT))
        |                       ELSE 0 END) AS BIGINT)
        |           + (256 - CAST(COUNT(*) AS BIGINT)) * 4294967296 AS denom,
        |         256 - CAST(COUNT(*) AS BIGINT) AS n_zero
        |  FROM regs GROUP BY 1)
        |SELECT event_type,
        |       CAST(202099033278251008 // (1000 * denom) AS BIGINT)
        |         AS est_distinct,
        |       CAST(n_zero AS BIGINT) AS n_zero
        |FROM agg
        |""".stripMargin,
  )
}
