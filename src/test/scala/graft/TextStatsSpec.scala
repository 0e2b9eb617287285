package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("unigramLogProb: hand-computed mean -ln p on a 3-doc corpus") {
    // tokens: a a b | a c → counts a=3 b=1 c=1, total 5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextStats.unigramLogProb(docs)
      .select("id", "mean_nll", "n_tokens").as[(Long, Double, Long)]
      .collect().map { case (id, nll, n) => id -> (nll, n) }.toMap
    val nll = (t: Double) => -math.log(t)
    val d1 = (nll(3.0 / 5) * 2 + nll(1.0 / 5)) / 3
    val d2 = (nll(3.0 / 5) + nll(1.0 / 5)) / 2
    assert(out(1L)._1 == math.rint(d1 * 1e4) / 1e4 && out(1L)._2 == 3L)
    assert(out(2L)._1 == math.rint(d2 * 1e4) / 1e4 && out(2L)._2 == 2L)
  }

  test("entropyScores: hand-computed char and token entropy; zero floor normalized") {
    val docs = Seq((1L, "aa bb aa"), (2L, "zzzz")).toDF("doc_id", "text")
    val out = TextStats.entropyScores(docs)
      .select("doc_id", "h_char", "h_token").as[(Long, Double, Double)]
      .collect().map { case (id, hc, ht) => id -> (hc, ht) }.toMap
    // doc1 chars: a×4 b×2 ' '×2, n=8 → H = ln8 − (4ln4 + 2ln2 + 2ln2)/8
    val hc1 = math.log(8) - (4 * math.log(4) + 4 * math.log(2)) / 8
    // doc1 tokens: aa×2 bb×1, n=3 → H = ln3 − 2ln2/3
    val ht1 = math.log(3) - 2 * math.log(2) / 3
    assert(out(1L)._1 == math.rint(hc1 * 1e4) / 1e4)
    assert(out(1L)._2 == math.rint(ht1 * 1e4) / 1e4)
    // doc2: one symbol / one token → exactly 0.0 (never −0.0: the +0
    // normalization), the low-entropy floor a mash filter cuts at
    assert(out(2L) == (0.0, 0.0))
    assert(java.lang.Double.doubleToRawLongBits(out(2L)._1) == 0L)
  }

  test("bigramLogProb: hand-computed interpolated mixture with BOS context") {
    // pairs: doc1 (<s>,a)(a,b)(b,a); doc2 (<s>,b)(b,a)
    // uni: a=3 b=2, total 5, v=2; big: (<s>,a)=1 (a,b)=1 (b,a)=2 (<s>,b)=1
    // ctx: <s>=2 a=1 b=2
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProb(docs)
      .select("id", "mean_nll", "n_tokens").as[(Long, Double, Long)]
      .collect().map { case (id, nll, n) => id -> (nll, n) }.toMap
    val lam = 0.7; val om = 1 - lam
    def mix(pbi: Double, puni: Double) = -math.log(lam * pbi + om * puni)
    val pa = 4.0 / 7; val pb = 3.0 / 7 // Laplace: (cnt+1)/(5+2)
    val d1 = (mix(1.0 / 2, pa) + mix(1.0, pb) + mix(1.0, pa)) / 3
    val d2 = (mix(1.0 / 2, pb) + mix(1.0, pa)) / 2
    assert(out(1L)._1 == math.rint(d1 * 1e4) / 1e4 && out(1L)._2 == 3L)
    assert(out(2L)._1 == math.rint(d2 * 1e4) / 1e4 && out(2L)._2 == 2L)
  }

  test("bm25TopK: hand-computed Okapi scores, k bound, docs without query terms excluded") {
    // corpus: d1 has 'cat' x2 (dl 3), d2 'cat' x1 (dl 2), d3 none (dl 2)
    val docs = Seq((1L, "cat cat dog"), (2L, "cat fish"), (3L, "bird fish"))
      .toDF("doc_id", "text")
    val out = TextStats.bm25TopK(docs, Seq("cat"), k = 10)
      .select("rnk", "id", "score").as[(Long, Long, Double)].collect().toSeq
    val (k1, b) = (1.2, 0.75)
    val avgdl = (3.0 + 2 + 2) / 3
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      math.rint(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)) * 1e4) / 1e4
    assert(out == Seq((1L, 1L, s(2, 3)), (2L, 2L, s(1, 2)))) // d3 absent
    // higher tf wins despite the longer doc; k bound respected
    assert(out.size == 2)
  }

  test("dupNgramFraction: overlapping repeats count each token once; short docs score 0") {
    val docs = Seq(
      (1L, "a b c a b c"),     // trigram "a b c" twice -> all 6 tokens covered
      (2L, "a b c d e f"),     // no repeated trigram
      (3L, "x y"),             // shorter than n -> no grams
      (4L, "a a a a")          // "a a a" at pos 0 and 1 -> all 4 covered, once each
    ).toDF("doc_id", "text")
    val out = TextStats.dupNgramFraction(docs, n = 3)
      .select("id", "dup_frac", "n_tokens").as[(Long, Double, Long)]
      .collect().map { case (id, f, n) => id -> (f, n) }.toMap
    assert(out(1L) == (1.0, 6L))
    assert(out(2L) == (0.0, 6L))
    assert(out(3L) == (0.0, 2L))
    assert(out(4L) == (1.0, 4L)) // distinct positions, not 2x3/4
  }

  test("bigramLogProbAgainst: self-scored batch is bit-identical to the one-shot form") {
    val docs = Seq((1L, "a b a c"), (2L, "b a b"), (3L, "c c a")).toDF("doc_id", "text")
    val oneShot = TextStats.bigramLogProb(docs)
      .select("id", "mean_nll", "n_tokens").as[(Long, Double, Long)]
      .collect().sortBy(_._1).toSeq
    val steady = TextStats.bigramLogProbAgainst(docs,
        TextStats.corpusLm(docs), TextStats.corpusBigramLm(docs))
      .select("id", "mean_nll", "n_tokens").as[(Long, Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(steady == oneShot)
  }

  test("bigramLogProbAgainst: unseen bigram falls to the unigram back-off, OOV stays finite") {
    val corpus = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val lm = TextStats.corpusLm(corpus); val big = TextStats.corpusBigramLm(corpus)
    // "b b": seen tokens, unseen bigram -> 0.7*0 + 0.3*laplace(b)
    // "zzz": OOV token AND context -> pure laplace(0-count)
    val batch = Seq((10L, "b b"), (11L, "zzz")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProbAgainst(batch, lm, big)
      .select("id", "mean_nll").as[(Long, Double)].collect().toMap
    val lam = 0.7; val om = 1 - lam
    // corpus: uni a=2 b=2 (total 4, v=2); big (<s>,a)=1 (a,b)=2 (b,a)=1
    val pb = (2.0 + 1) / (4 + 2); val poov = (0.0 + 1) / (4 + 2)
    // doc 10: (<s>,b) unseen bigram (ctx <s> exists), (b,b) unseen
    val d10 = (-math.log(lam * 0 + om * pb) + -math.log(lam * 0 + om * pb)) / 2
    val d11 = -math.log(lam * 0 + om * poov)
    assert(out(10L) == math.rint(d10 * 1e4) / 1e4)
    assert(out(11L) == math.rint(d11 * 1e4) / 1e4)
    assert(out.values.forall(v => !v.isInfinite && !v.isNaN))
  }

  test("bigramLogProb: common continuations score better than rare ones") {
    // "the cat" appears 3x; "the dog" once — docs dominated by the
    // frequent bigram should sit below the rare-bigram doc
    val docs = Seq((1L, "the cat the cat the cat"), (2L, "the dog"),
      (3L, "the cat")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProb(docs)
      .select("id", "mean_nll").as[(Long, Double)].collect().toMap
    assert(out(3L) < out(2L))
  }

  test("unigramLogProb: case-folding merges tokens; rare tokens score higher") {
    val docs = Seq((1L, "Common COMMON common"), (2L, "common rareword")).toDF("doc_id", "text")
    val out = TextStats.unigramLogProb(docs)
      .select("id", "mean_nll").as[(Long, Double)].collect().toMap
    // doc 2 contains the rare token → higher mean NLL than the all-common doc
    assert(out(2L) > out(1L))
  }

  test("tfidfTopTerms: ranks corpus-rare terms first, term-asc tie-break, k bound") {
    // "shared" appears in every doc (df=3, minimal idf); each doc's
    // unique terms have df=1 (max idf) and tie with each other → term asc
    val docs = Seq(
      (1L, "shared zebra apple"),
      (2L, "shared banana banana"),
      (3L, "shared cherry date")
    ).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, k = 2)
      .select("id", "rnk", "term").as[(Long, Int, String)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(out(1L) == Seq("apple", "zebra"))   // tie on score → term asc
    assert(out(2L) == Seq("banana", "shared")) // tf=2 beats shared despite k=2 cut
    assert(out(3L) == Seq("cherry", "date"))
    // k bound respected
    assert(out.values.forall(_.size <= 2))
  }

  test("tfidf score value: tf * (ln((N+1)/(df+1)) + 1)") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, k = 3)
      .select("id", "term", "tfidf").as[(Long, String, Double)].collect()
      .map { case (id, t, s) => (id, t) -> s }.toMap
    def idf(df: Int) = math.log(3.0 / (df + 1)) + 1
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out((1L, "x")) == r4(2 * idf(1)))
    assert(out((1L, "y")) == r4(1 * idf(2)))
    assert(out((2L, "z")) == r4(1 * idf(1)))
  }

  test("null-text docs: dropped from token ops, never a crash or null poisoning") {
    val docs = Seq((1L, "hello world text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(TextStats.unigramLogProb(docs).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(TextStats.tfidfTopTerms(docs).select("id").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(graft.operators.Chunker.chunkTokens(docs, 3, 1)
      .select("id").distinct().as[Long].collect().toSeq == Seq(1L))
    val bd = graft.operators.BloomDedup.incrementalExact(docs, docs.filter(col("doc_id") === 1L))
    // null text fingerprints to null → never equal to anything → novel
    assert(bd.filter(col("id") === 2L).select("dup_of").head().isNullAt(0))
    assert(graft.operators.Dedup.sharedPassages(docs, 1).count() == 0)
  }

  test("empty input: both operators return empty with full schemas") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val lp = TextStats.unigramLogProb(empty)
    assert(lp.columns.toSeq == Seq("id", "mean_nll", "n_tokens") && lp.count() == 0)
    val tt = TextStats.tfidfTopTerms(empty)
    assert(tt.columns.toSeq == Seq("id", "rnk", "term", "tfidf") && tt.count() == 0)
  }

  test("perplexityBuckets: full sample = exact terciles; empty sample degrades to bucket 1") {
    // 6 docs, one group; with samplePct=100 the cutoffs are the exact
    // ntile boundaries: ranks 1-2 → bucket 1, 3-4 → 2, 5-6 → 3.
    // Distinct word counts make the mean_nll ordering deterministic
    // (more repeated tokens → commoner → lower -ln p).
    val docs = Seq(
      (1L, "a a a a a a", "g"), (2L, "a a a a a b", "g"),
      (3L, "a a a a b b", "g"), (4L, "a a a b b b", "g"),
      (5L, "a a b b b c", "g"), (6L, "a b b c c d", "g")
    ).toDF("doc_id", "text", "lang")
    val out = TextStats.perplexityBuckets(docs, samplePct = 100)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val ranked = TextStats.unigramLogProb(docs).orderBy("mean_nll", "id")
      .select("id").as[Long].collect().toSeq
    val expect = ranked.zipWithIndex.map { case (id, i) => id -> (i / 2 + 1) }.toMap
    assert(out == expect)
    // empty sample: every doc lands in bucket 1, nothing dropped
    val none = TextStats.perplexityBuckets(docs, samplePct = 0)
      .select("bucket").as[Int].collect().toSeq
    assert(none.size == 6 && none.forall(_ == 1))
  }

  test("unigramLogProbAgainst: Laplace smoothing hand-checked, OOV penalized finitely") {
    val corpus = Seq((1L, "a a b")).toDF("doc_id", "text")
    val lm = TextStats.corpusLm(corpus)   // a→2, b→1; total 3, |V| 2
    val batch = Seq((10L, "a z")).toDF("doc_id", "text")
    val got = TextStats.unigramLogProbAgainst(batch, lm)
      .select("mean_nll").as[Double].head()
    // p(a) = (2+1)/(3+2), p(z OOV) = (0+1)/5
    val expect = BigDecimal(-(math.log(3.0 / 5) + math.log(1.0 / 5)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - expect) < 1e-9, s"got $got expect $expect")
  }

  test("assignPplBuckets against prebuilt cutoffs matches the one-shot perplexityBuckets") {
    val docs = Seq(
      (1L, "a a a a a a", "g"), (2L, "a a a a a b", "g"),
      (3L, "a a a a b b", "g"), (4L, "a a a b b b", "g"),
      (5L, "a a b b b c", "g"), (6L, "a b b c c d", "g")
    ).toDF("doc_id", "text", "lang")
    val scored = TextStats.unigramLogProb(docs)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
      .select(col("id"), col("lang"), col("mean_nll"))
    val cuts = TextStats.pplCutoffs(scored, samplePct = 100)
    val split = TextStats.assignPplBuckets(scored, cuts)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val oneShot = TextStats.perplexityBuckets(docs, samplePct = 100)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(split == oneShot)
  }

  test("importanceWeights: target-domain docs outscore off-domain, hand-checked math") {
    // corpus: two "legal" docs, two "chat" docs; target sample = legal.
    // the legal docs must carry the higher mean log-likelihood ratio
    val corpus = Seq(
      (1L, "whereas party shall indemnify"),
      (2L, "party shall hereby covenant"),
      (3L, "lol that meme is great"),
      (4L, "haha great meme lol")).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") <= 2)
    val out = TextStats.importanceWeights(corpus, target)
      .select("id", "mean_llr").as[(Long, Double)].collect().toMap
    assert(out.size == 4)
    assert(Seq(1L, 2L).map(out).min > Seq(3L, 4L).map(out).max,
      s"legal docs must outweigh chat docs: $out")
    // hand check doc 3 ("lol that meme is great", all tokens absent
    // from target): vocab V=12, tot_s=17, tot_t=8; each token has
    // cnt_t=0 → ln(1/20) - ln((cnt_s+1)/29)
    val expected3 = Seq(3.0, 2.0, 3.0, 2.0, 3.0) // cnt_s+1 for lol,that,meme,is,great
      .map(cs => math.log(1.0 / 20) - math.log(cs / 29)).sum / 5
    assert(math.abs(out(3L) - expected3) < 1e-4, s"${out(3L)} vs $expected3")
    // empty input keeps the schema
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ew = TextStats.importanceWeights(empty, empty)
    assert(ew.columns.toSeq == Seq("id", "mean_llr", "n_tokens") && ew.count() == 0)
  }
}
