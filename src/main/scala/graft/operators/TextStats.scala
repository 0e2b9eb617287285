package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text signals (beyond-reference, north star): the
  * quality scores that need a pass over the WHOLE corpus before they
  * can score a single document — as opposed to the per-row signals in
  * [[graft.functions.Text]] (length/punct/stopword ratios are pure
  * projections; these need the corpus token distribution).
  */
object TextStats {

  /** Unigram language-model score per doc: mean -ln p(token) under the
    * corpus's own unigram distribution (lowercased whitespace tokens) —
    * the classic cheap perplexity proxy for quality filtering: gibberish
    * and boilerplate-stuffed docs sit far from the corpus average.
    *
    * Scale: two shuffles — token-count agg (partial+final, vocab-sized
    * result) and the token→prob join back (hash join on the token; the
    * vocab side is zipfian-small relative to the occurrence stream).
    * The corpus total rides along as a 1-row cross join (broadcast),
    * never a driver action — the whole thing is one lazy plan.
    */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
        explode(Text.tokens(lower(col(textCol)))).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    tok.join(counts, "t")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(round(avg(-log(col("cnt") / col("n_total"))), 4).as("mean_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** Interpolated bigram language-model score per doc — one step up
    * the n-gram ladder from [[unigramLogProb]] toward the 5-gram KenLM
    * CCNet actually filters with (Wenzek et al. 2020): mean
    * -ln( λ·p(t|prev) + (1-λ)·p_uni(t) ) over tokens, with a `<s>` BOS
    * context for each doc's first token. The bigram term is MLE
    * (self-scored corpus ⇒ every observed bigram is in the table); the
    * unigram back-off is Laplace-smoothed so the mixture is never
    * zero. Context totals are Σ bigram counts per `prev` — i.e. the
    * occurrences of `prev` that HAVE a successor — so each p(·|prev)
    * is a proper distribution.
    *
    * Scale: the (prev, token) pair stream is derived MAP-SIDE by
    * zipping the token array with its shifted self (no lag window — a
    * per-doc sort shuffle saved); then two vocab-sized aggs (unigram,
    * bigram — the bigram table is the corpus's observed-bigram set,
    * Zipf-bounded far below vocab²), a context roll-up of the bigram
    * table, totals as a broadcast 1-row, and one hash join back onto
    * the pair stream. Same shape as [[unigramLogProb]] plus one join.
    */
  /** (id, prev, t) bigram pair stream with a `<s>` BOS context per doc
    * — derived map-side by zipping the token array with its shifted
    * self (no lag-window shuffle). Shared by the one-shot and
    * steady-state bigram scorers so their arithmetic provably starts
    * from the same stream. */
  private def bigramPairs(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val arr = Text.tokens(lower(col(textCol)))
    docs.select(col(idCol).as("id"),
        explode(zip_with(arr,
          concat(array(lit("<s>")), slice(arr, lit(1), greatest(size(arr) - 1, lit(0)))),
          (t, p) => struct(p.as("prev"), t.as("t")))).as("pr"))
      .select(col("id"), col("pr.prev").as("prev"), col("pr.t").as("t"))
  }

  def bigramLogProb(docs: DataFrame, lambda: Double = 0.7,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    // the self-scored form IS the steady-state form fed its own
    // corpus tables (bit-identical — the pair stream, literals, and
    // association all coincide; TextStatsSpec asserts the equality),
    // so keep ONE copy of the mixture arithmetic. Every observed
    // bigram/context/token is in its own tables, so the left joins
    // never miss and the coalesce arms are inert here.
    bigramLogProbAgainst(docs,
      corpusLm(docs, textCol),
      corpusBigramLm(docs, textCol, idCol),
      lambda, textCol, idCol)

  /** Data-selection importance weights (DSIR, Xie et al. 2023, with a
    * unigram LM in place of their hashed n-grams): per-doc mean
    * log-likelihood RATIO of a target domain sample vs the raw corpus —
    * docs that "read like" the target score high, and selecting the
    * top-weighted (or sampling ∝ exp(weight)) tilts the training mix
    * toward the target domain without hand-written rules.
    *
    * Both LMs are Laplace-smoothed over the SHARED vocabulary
    * (p(t) = (cnt+1)/(total+|V∪|)), so out-of-domain tokens get a
    * finite penalty instead of -∞ and the two distributions are
    * comparable. The weight is rounded to 4 decimals — engine-portable
    * like [[unigramLogProb]]'s mean_nll.
    *
    * Scale: two vocab-sized count aggs (the target SAMPLE is small by
    * construction — that is the DSIR setting), a full-outer vocab
    * merge, totals as a broadcast 1-row, and one hash join back onto
    * the corpus token stream — identical shape to [[unigramLogProb]].
    * The corpus SCAN runs twice (once under the vocab count, once as
    * the join-back side), a deliberate trade: materializing the
    * exploded token stream to avoid the second scan costs more storage
    * than the corpus itself; wrap the tokenized input in
    * [[Stage.reuse]] only when the upstream is expensive derived work
    * rather than a plain columnar scan. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(Text.tokens(lower(col(textCol)))).as("t"))
    val srcTok = toks(corpus)
    val srcCnt = srcTok.groupBy("t").agg(count(lit(1)).as("cnt_s"))
    val tgtCnt = toks(target).groupBy("t").agg(count(lit(1)).as("cnt_t"))
    val vocab = srcCnt.join(tgtCnt, Seq("t"), "full_outer")
      .select(col("t"),
        coalesce(col("cnt_s"), lit(0L)).as("cnt_s"),
        coalesce(col("cnt_t"), lit(0L)).as("cnt_t"))
    val totals = vocab.agg(sum("cnt_s").as("tot_s"), sum("cnt_t").as("tot_t"),
      count(lit(1)).as("v"))
    srcTok.join(vocab, "t")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      // + 0: normalizes IEEE -0.0 to +0.0 — a doc whose mean ratio
      // rounds to zero from below would otherwise hash as "-0" on one
      // engine and "0" on the other (same fix as randomProject)
      .agg((round(avg(
          log((col("cnt_t") + 1) / (col("tot_t") + col("v"))) -
          log((col("cnt_s") + 1) / (col("tot_s") + col("v")))), 4) + lit(0d))
          .as("mean_llr"),
        count(lit(1)).as("n_tokens"))
  }

  /** Top-k corpus-weighted terms per doc by TF-IDF
    * (idf = ln((N+1)/(df+1)) + 1, the smoothed scikit-style form): the
    * standard keyword/topic surrogate for corpus exploration and
    * domain balancing.
    *
    * Determinism across engines: the rank orders by the score ROUNDED
    * to 6 decimals with the term as tie-break — ulp-level `ln`
    * differences between engines cannot flip the ranking (mathematical
    * ties, e.g. 2·ln10 vs ln100, become exact ties and fall to the
    * term order).
    *
    * Scale: tf agg + df agg + one keyed-window rank — the window
    * partitions by doc (thousands of rows per partition at most), never
    * a global sort. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
        explode(Text.tokens(lower(col(textCol)))).as("t"))
    val tf = tok.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "t")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1))
    val w = Window.partitionBy("id")
      .orderBy(round(col("score"), 6).desc, col("t").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("t").as("term"),
        round(col("score"), 4).as("tfidf"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): label each
    * doc head/middle/tail (bucket 1..`buckets`) by its unigram-LM
    * score WITHIN its `byCol` group (CCNet buckets per language, so a
    * hard language is not all "tail").
    *
    * Cutoffs are estimated on a deterministic `samplePct`% hash-sample
    * per group — CCNet's own design (they fit cutoffs on a sample, then
    * assign in one streaming pass) and the only shape that scales: an
    * exact per-group ntile would sort a whole language's corpus into
    * one window partition. A doc's bucket is 1 + the number of cutoff
    * rows lexicographically below its (mean_nll, id) — id breaks
    * rounded-score ties, so assignment is total and engine-portable.
    * Groups whose sample is smaller than `buckets` degrade gracefully
    * (repeated cutoffs collapse middle buckets); a group with an empty
    * sample gets bucket 1 throughout.
    *
    * Scale: [[unigramLogProb]]'s two shuffles + a window over the
    * SAMPLE only (bounded per group) + a broadcast of
    * (groups × (buckets-1)) cutoff rows; assignment adds no shuffle. */
  def perplexityBuckets(docs: DataFrame, byCol: String = "lang",
                        buckets: Int = 3, samplePct: Int = 20,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val scored = unigramLogProb(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("id"), col(byCol)), "id")
      .select(col("id"), col(byCol), col("mean_nll"))
    assignPplBuckets(scored, pplCutoffs(scored, byCol, buckets, samplePct),
      byCol, buckets)
  }

  /** Per-group bucket cutoffs from a deterministic `samplePct`%
    * hash-sample of a scored frame (id, `byCol`, mean_nll) — one row
    * per group with (c1_nll, c1_id, …) boundary pairs, the PERSISTABLE
    * artifact of [[perplexityBuckets]]'s sample-then-assign design
    * (compute on the corpus at compaction, reuse per batch). */
  def pplCutoffs(scored: DataFrame, byCol: String = "lang",
                 buckets: Int = 3, samplePct: Int = 20): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val samp = scored.filter(Sampling.hashBucket(col("id")) < samplePct)
    val w = Window.partitionBy(byCol)
      .orderBy(col("mean_nll").asc, col("id").asc)
    val ranked = samp
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(byCol)))
    (1 until buckets).map { k =>
      ranked.filter(col("rn") === ceil(col("cnt") * k / lit(buckets.toDouble)))
        .select(col(byCol), col("mean_nll").as(s"c${k}_nll"), col("id").as(s"c${k}_id"))
    }.reduce((a, b) => a.join(b, byCol))
  }

  /** Assign each scored row 1..`buckets` against prebuilt `cuts`
    * (broadcast; one scan, no shuffle): bucket = 1 + the number of
    * cutoff pairs lexicographically below (mean_nll, id). Groups
    * absent from `cuts` get bucket 1. */
  def assignPplBuckets(scored: DataFrame, cuts: DataFrame,
                       byCol: String = "lang", buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val bucket = (1 until buckets).map { k =>
      when(col(s"c${k}_nll").isNull, 0)
        .when(col("mean_nll") > col(s"c${k}_nll") ||
          (col("mean_nll") === col(s"c${k}_nll") && col("id") > col(s"c${k}_id")), 1)
        .otherwise(0)
    }.reduce(_ + _) + 1
    scored.join(broadcast(cuts), Seq(byCol), "left")
      .select(col("id"), col(byCol), col("mean_nll"), bucket.as("bucket"))
  }

  /** The persistable corpus unigram-LM table: lowercased token →
    * count. Pair with [[unigramLogProbAgainst]] to score future
    * batches WITHOUT a corpus scan — the steady-state twin of
    * [[unigramLogProb]] (which builds the LM from the scored docs
    * themselves). Refresh on corpus compaction. */
  def corpusLm(corpus: DataFrame, textCol: String = "text"): DataFrame =
    corpus.select(explode(Text.tokens(lower(col(textCol)))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))

  /** Score docs against a PREBUILT LM vocab, Laplace-smoothed over the
    * LM's vocabulary (p(t) = (cnt+1)/(total+|V|), out-of-vocabulary
    * tokens cnt = 0) — smoothing is required here, unlike
    * [[unigramLogProb]], because a batch token the corpus never saw
    * would otherwise score -ln 0. Output (id, mean_nll, n_tokens),
    * rounded like every LM score in this family.
    *
    * Scale: the LM totals are a 1-row broadcast; the batch token
    * stream hash-joins the vocab table (zipfian-small vs occurrences)
    * — the corpus itself is never touched. */
  def unigramLogProbAgainst(docs: DataFrame, lmVocab: DataFrame,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
        explode(Text.tokens(lower(col(textCol)))).as("t"))
    val totals = lmVocab.agg(sum("cnt").as("n_total"),
      count(lit(1)).as("n_vocab"))
    tok.join(lmVocab, Seq("t"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      .agg(round(avg(-log((coalesce(col("cnt"), lit(0L)) + 1)
          / (col("n_total") + col("n_vocab")))), 4).as("mean_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** BM25 retrieval scoring (Robertson-Spärck Jones; the Okapi ranking
    * function): top-k docs for a bag-of-words query — the lexical
    * retrieval primitive behind search, retrieval-based
    * decontamination, and the sparse side of hybrid (BM25 + vector)
    * retrieval. idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term
    * contribution tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).
    *
    * Scale: doc length is computed MAP-SIDE (size of the token array —
    * no corpus-wide agg), corpus stats (N, avgdl) are a broadcast
    * 1-row, and the token stream is filtered to the query's terms
    * before any shuffle — the only keyed work is (id, term) tf
    * aggregation over query-term OCCURRENCES, a stream many orders
    * smaller than the corpus. df comes from the tf table (term-sized)
    * and broadcasts back. Ranking orders by the ROUNDED score with the
    * id tie-break, so ulp-level sum-order differences can't flip the
    * top-k across engines. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: query must have at least one term")
    val qt = queryTerms.map(_.toLowerCase).distinct
    val base = docs.select(col(idCol).as("id"),
        Text.tokens(lower(col(textCol))).as("tk"))
      .select(col("id"), col("tk"), size(col("tk")).cast("double").as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = base.select(col("id"), col("dl"), explode(col("tk")).as("t"))
      .filter(col("t").isInCollection(qt))
      .groupBy("id", "t").agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val dft = tf.groupBy("t").agg(count(lit(1)).as("df"))
    // constants composed in-plan ((k1 + 1), (1 - b)) so both engines
    // run the identical IEEE ops on the identical literals
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (lit(k1) + 1)) /
      (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(dft), "t")
      .crossJoin(broadcast(stats))
      .groupBy("id").agg(round(sum(contrib), 4).as("score"))
    // top-k as TakeOrdered (no global sort of the scored set); the
    // unpartitioned rank window then runs over k rows only
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
    scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("id"), col("score"))
  }

  /** Duplicate-n-gram token fraction (the Gopher repetition family,
    * Rae et al. 2021 §A1.1): the fraction of a doc's tokens covered by
    * any token n-gram that occurs MORE THAN ONCE within the doc —
    * templated/looping text scores high even when no single n-gram
    * dominates (which is what [[graft.functions.Text.topFraction]]
    * measures; the two signals are complementary and Gopher thresholds
    * both).
    *
    * Scale: grams with their positions are derived map-side from the
    * token array; duplication is a doc-keyed window count on (id,
    * gram) and coverage a count-distinct of expanded positions per doc
    * — both shuffles are keyed by the doc (bounded partitions), never
    * corpus-global. Docs shorter than n have no grams and score 0. */
  def dupNgramFraction(docs: DataFrame, n: Int = 3,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, "dupNgramFraction: n must be >= 2")
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(lower(col(textCol))).as("tk"))
      .select(col("id"), col("tk"), size(col("tk")).as("len"))
    val grams = toks.filter(col("len") >= n)
      .select(col("id"),
        posexplode(transform(sequence(lit(0), col("len") - n),
          i => concat_ws(" ", slice(col("tk"), i + 1, lit(n))))).as(Seq("pos", "g")))
    val w = Window.partitionBy("id", "g")
    val covered = grams.withColumn("c", count(lit(1)).over(w))
      .filter(col("c") > 1)
      .select(col("id"), explode(sequence(col("pos"), col("pos") + n - 1)).as("p"))
      .groupBy("id").agg(count_distinct(col("p")).as("dup_tokens"))
    toks.join(covered, Seq("id"), "left")
      .select(col("id"),
        round(coalesce(col("dup_tokens"), lit(0L)) / greatest(col("len"), lit(1)), 4)
          .as("dup_frac"),
        col("len").cast("long").as("n_tokens"))
  }

  /** Shared (p2, p1, t) trigram triple stream — double-BOS padded,
    * derived MAP-SIDE by slicing the BOS-prefixed token array to the
    * token count (no lag window, same scale argument as
    * [[bigramPairs]]: a per-doc sort shuffle saved at corpus scale). */
  private def trigramTriples(docs: DataFrame, textCol: String,
                             idCol: String): DataFrame = {
    val arr = Text.tokens(lower(col(textCol)))
    val n = size(arr)
    val p1 = slice(concat(array(lit("<s>")), arr), lit(1), n)
    val p2 = slice(concat(array(lit("<s>"), lit("<s>")), arr), lit(1), n)
    docs.select(col(idCol).as("id"),
        explode(zip_with(
          zip_with(arr, p1, (t, a) => struct(a.as("p1"), t.as("t"))), p2,
          (s, b) => struct(b.as("p2"), s("p1").as("p1"), s("t").as("t")))).as("tr"))
      .select(col("id"), col("tr.p2").as("p2"), col("tr.p1").as("p1"),
        col("tr.t").as("t"))
  }

  /** Interpolated TRIGRAM LM score per doc — rung 3 of the CCNet
    * perplexity ladder above [[bigramLogProb]]:
    * p(t|p2,p1) = λ3·MLE3 + λ2·MLE2 + (1−λ3−λ2)·Laplace-unigram, BOS
    * context ⟨s⟩⟨s⟩, mean −ln p per doc. The lower-order arms keep the
    * mixture finite exactly as in the bigram rung; the λ literals are
    * composed in-plan so both engines run identical IEEE ops.
    *
    * Scale: the trigram/context tables are bounded by the corpus's
    * OBSERVED trigram set (Zipf-bounded far below vocab³); the joins
    * back onto the triple stream are hash equi-joins on trigram keys —
    * unskewable (a boilerplate trigram is one build row), identical
    * shape to the bigram rung with one more vocab-level table. */
  def trigramLogProb(docs: DataFrame, lambda3: Double = 0.5,
                     lambda2: Double = 0.3, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    // HIERARCHICAL rollup (r20, guide §2.1/§2.3): the r19 plan derived
    // uni/big/trg EACH from the raw triple stream — 7 tokenize+explode
    // passes over the corpus (one per LM table + contexts + the probe
    // stream) and 34 exchanges. Every lower-order table is an exact
    // integer roll-up of the trigram table (Σ over p2 of cnt3 = cnt2,
    // Σ over p1 of cnt2 = cnt — the triple stream enumerates every
    // token exactly once with both contexts), so the corpus is now
    // tokenized TWICE (trg agg + probe side), everything else
    // aggregates LM-sized tables. The per-trigram −ln(mixture) is
    // computed ONCE per distinct trigram on the enriched table and
    // joined back; the arithmetic is the same IEEE expression over the
    // same values, so per-row terms are bit-identical to the r19 form
    // (only the avg's summation order can differ, which the 4-decimal
    // round absorbs exactly as it does across engines — oracle-pinned
    // at sf0.01 and sf0.1).
    // trg/big each feed several consumers; their references expand the
    // tokenize+agg subtree in the PLAN TEXT (14 Generate nodes), but
    // ReuseExchange dedupes the identical exchange subtrees at
    // execution so the corpus is tokenized twice at runtime (trg agg +
    // probe side — the bigram rung's deliberate trade). An explicit
    // localCheckpoint stage of trg/big was A/B'd and REJECTED: the
    // block write/read plus the checkpoint's AQE-off subtree cost more
    // than the plan dedup saved (2.22 s → 2.57 s at sf0.1).
    val tri = trigramTriples(docs, textCol, idCol)
    val trg = tri.groupBy("p2", "p1", "t").agg(count(lit(1)).as("cnt3"))
    val ctx3 = trg.groupBy("p2", "p1").agg(sum("cnt3").as("p2_tot"))
    val big = trg.groupBy("p1", "t").agg(sum("cnt3").as("cnt2"))
    val ctx2 = big.groupBy("p1").agg(sum("cnt2").as("p1_tot"))
    val uni = big.groupBy("t").agg(sum("cnt2").as("cnt"))
    val totals = uni.agg(sum("cnt").as("n_total"), count(lit(1)).as("n_vocab"))
    val term = trg.join(ctx3, Seq("p2", "p1")).join(big, Seq("p1", "t"))
      .join(ctx2, Seq("p1")).join(uni, Seq("t"))
      .crossJoin(broadcast(totals))
      .select(col("p2"), col("p1"), col("t"),
        (-log(
          lit(lambda3) * (col("cnt3") / col("p2_tot")) +
          lit(lambda2) * (col("cnt2") / col("p1_tot")) +
          lit(1 - lambda3 - lambda2) * ((col("cnt") + 1)
            / (col("n_total") + col("n_vocab"))))).as("nll"))
    tri.join(term, Seq("p2", "p1", "t"))
      .groupBy("id")
      .agg(round(avg(col("nll")), 4).as("mean_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** Persistable corpus BIGRAM table — the steady-state artifact for
    * [[bigramLogProbAgainst]], sibling of [[corpusLm]]: one corpus
    * pass, a (prev, t, cnt2) table bounded by the corpus's observed
    * bigram set (Zipf-bounded far below vocab²). Write it with the
    * vocab table at compaction; per-batch scoring then never touches
    * the corpus. */
  def corpusBigramLm(corpus: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    bigramPairs(corpus, textCol, idCol)
      .groupBy("prev", "t").agg(count(lit(1)).as("cnt2"))

  /** Score a batch against PREBUILT unigram + bigram tables — the
    * steady-state twin of [[bigramLogProb]]: unseen bigrams (or unseen
    * contexts) contribute 0 to the bigram term and the Laplace unigram
    * back-off keeps the mixture finite, so scoring a batch the corpus
    * never saw is well-defined. On a batch the corpus fully contains,
    * the output is BIT-IDENTICAL to the one-shot self-scored form
    * (spec-asserted) — same pair stream, same literals, same
    * association.
    *
    * Scale: context totals are a roll-up of the bigram table (LM-sized,
    * not corpus-sized), totals a 1-row broadcast; the batch pair stream
    * hash-joins the two LM tables — the corpus is never scanned. */
  def bigramLogProbAgainst(docs: DataFrame, lmVocab: DataFrame,
                           lmBigrams: DataFrame, lambda: Double = 0.7,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val pair = bigramPairs(docs, textCol, idCol)
    val ctx = lmBigrams.groupBy("prev").agg(sum("cnt2").as("prev_tot"))
    val totals = lmVocab.agg(sum("cnt").as("n_total"),
      count(lit(1)).as("n_vocab"))
    pair.join(lmBigrams, Seq("prev", "t"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(lmVocab, Seq("t"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      .agg(round(avg(-log(
          lit(lambda) * coalesce(col("cnt2") / col("prev_tot"), lit(0d)) +
          lit(1 - lambda) * ((coalesce(col("cnt"), lit(0L)) + 1)
            / (col("n_total") + col("n_vocab"))))), 4).as("mean_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** Shannon entropy of the per-doc character and token distributions
    * — the distribution-level repetitiveness signal that complements
    * [[dupNgramFraction]]'s positional one (RefinedWeb/Gopher-class
    * filters drop low-entropy docs: keyboard mash, boilerplate walls,
    * `spam spam spam…` all score near zero regardless of WHERE the
    * repetition sits). Computed in the one-agg closed form
    * H = ln n − (Σ c·ln c)/n over the count table, so no per-element
    * probability materialization. Char entropy is over the RAW text
    * (case/punct carry signal); token entropy over the repo's
    * lowercased whitespace tokens, matching [[unigramLogProb]].
    *
    * Scale: two (id, symbol)-keyed count aggs — partial+final, so each
    * partition ships at most its distinct (id, symbol) pairs — then
    * id-keyed roll-ups; one id equi-join reunites the two columns.
    * Nothing is corpus-global: no vocab table, no broadcast, no window.
    *
    * round(4) + 0: the float sum can land an ulp below zero on
    * single-symbol docs; the `+ 0` normalizes IEEE −0.0 to 0.0 on both
    * engines (the repo's standard hash-stability trick). */
  def entropyScores(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    def h(counts: DataFrame, out: String): DataFrame =
      counts.groupBy("id")
        .agg((round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 4)
          + lit(0d)).as(out))
    // Java split with limit -1 keeps a trailing "" — drop it (the
    // DuckDB side's char split never produces one). Side effect, by
    // design: a text='' doc has no chars at all and is omitted from
    // the output entirely (nothing to score; the oracle filters the
    // same edge with c <> '').
    val chars = docs.select(col(idCol).as("id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) === 1)
    val toks = docs.select(col(idCol).as("id"),
      explode(graft.functions.Text.tokens(lower(col(textCol)))).as("t"))
    h(chars.groupBy("id", "ch").agg(count(lit(1)).as("c")), "h_char")
      .join(h(toks.groupBy("id", "t").agg(count(lit(1)).as("c")), "h_token"),
        Seq("id"))
      .withColumnRenamed("id", idCol)
  }
}
