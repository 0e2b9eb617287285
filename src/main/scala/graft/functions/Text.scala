package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines (project north star; beyond the reference surface —
  * SURVEY §2.7 / §7.2-M6).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so the whole stage stays inside WholeStageCodegen and the
  * formulas are expressible 1:1 in the DuckDB oracle.
  */
object Text {

  /** Whitespace tokenizer (the shared primitive; deterministic and
    * oracle-portable: split(trim(x), '\s+')). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count estimate: words + extra splits at
    * letter/digit/punct boundaries (regex segmentation, no vocab —
    * a deterministic stand-in for a tokenizer's length estimate). */
  def subwordCount(c: Column): Column =
    size(split(trim(c), "[\\s]+|(?<=[a-z])(?=[A-Z0-9])|(?<=[0-9])(?=[A-Za-z])"))

  /** Word n-gram shingles (distinct) from an ALREADY-STAGED token array
    * attribute — the dedup primitive. Catalyst re-evaluates captured
    * non-attribute expressions in a lambda body once PER ELEMENT, so the
    * token array must be a projection column (an attribute), not an
    * inline `tokens(text)` expression: inlined, the whitespace split
    * re-runs for every shingle position — O(tokens²) regex work per doc
    * (measured ~10× on the sf0.1 dedup gates). */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Convenience form over raw text. ONLY for one-off/test use: on hot
    * paths stage `tokens(c)` as its own column first and call
    * [[shinglesOf]] — see the per-element re-evaluation note there. */
  def shingles(c: Column, n: Int): Column = shinglesOf(tokens(c), n)

  /** 60-bit stable key of a shingle string (the first 15 hex chars of
    * its md5 as a positive bigint — the codebase's established
    * oracle-portable 64-bit-hash idiom, same formula family as
    * [[graft.operators.Dedup.signaturesFrom]]'s permutation hashes).
    *
    * WHY hash before the exchange (r16 scale-decade finding): the
    * shingle long form is the dominant shuffle of the whole near-dup
    * family, and raw n-gram STRINGS stop compressing as the corpus
    * grows — lz4 loses value repetition once the shingle vocabulary
    * outgrows its window, and the measured exchange cost grew from ~16
    * to ~36 B/row across two scale decades while rows stayed linear. A
    * fixed 8-byte key keeps the exchange byte-stable per row at any
    * scale. Collision risk is the birthday bound on the CORPUS shingle
    * vocabulary in 2^60 — expected merges ≈ n²/2^61: ~4×10⁻⁵ at 10⁷
    * distinct shingles, a handful around 10⁹–10¹⁰, and ~4×10⁵ at 10¹²
    * (so at trillion-shingle vocabularies collisions are rare-per-pair
    * but not rare-in-aggregate). For NEAR-dup semantics each merge
    * perturbs one intersection count by at most 1 — noise at any of
    * those scales. The exact-substring family
    * ([[graft.operators.Dedup.tokenGrams]]/
    * [[graft.operators.BloomDedup.corpusGrams]]) inherits a different
    * failure mode: a collision is a false "gram already seen", which
    * can seed a spurious duplicated-gram position; a false SPAN still
    * needs `minRun` consecutive colliding grams (probability falls off
    * as the per-gram rate to the minRun-th power), so the practical
    * effect is an occasional off-by-one-gram span boundary, not
    * phantom spans.
    * Not xxhash64: the DuckDB oracles must reproduce the value
    * (`('0x' || substr(md5(sh), 1, 15))::bigint`), and md5 is the one
    * hash both engines compute identically. */
  def shingleKey(sh: Column): Column = md5Prefix(sh, 15)

  /** First `nibbles` hex digits of md5 as a bigint — ONE definition of
    * the repo's oracle-portable hash primitive (shingle keys, minhash
    * permutations, simhash token hashes, CMS cells, hash buckets,
    * k-gram winnow prints all build on it). r19: the codegen'd
    * [[graft.expressions.Md5Prefix]] kernel instead of
    * `conv(substring(md5(x), 1, n), 16, 10).cast("long")` — same value
    * from the digest bytes directly, no hex string, no base-16 parse
    * (guide §4; value contract pinned in the expression's scaladoc and
    * an OperatorSpec equality test). */
  def md5Prefix(c: Column, nibbles: Int): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_md5_prefix", c, lit(nibbles))
  }

  /** All word bigrams WITH multiplicity from an ALREADY-materialized
    * token array column — the repetition-signal primitive (unlike
    * [[shingles]], which deduplicates for set similarity).
    *
    * Takes the array COLUMN, not the raw text: a Catalyst lambda body
    * re-evaluates captured non-attribute expressions per element, so
    * passing `tokens(text)` inline would re-run the regex split once
    * per bigram (O(n²) splits/row — a real straggler at scale).
    * Materialize the tokens in their own projection first. */
  def bigramsOf(toks: Column): Column = ngramsOf(toks, 2)

  /** All word n-grams WITH multiplicity (the frequency-counting
    * sibling of [[shinglesOf]], which deduplicates for set
    * similarity). Same staging rule: pass the materialized token
    * array, never `tokens(text)` inline. */
  def ngramsOf(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Fraction of occurrences held by the most frequent element of an
    * array column: sort, then longest equal-run — O(n log n) per row,
    * single pass, no distinct×filter rescan (the naive mode-by-filter
    * form re-walks the array per distinct value). Gopher/C4-style
    * repetition quality signal; one codegen'd projection at 100 TB, no
    * explode, no shuffle.
    *
    * r19: the run counter is [[graft.expressions.MaxRunLength]]
    * (native, codegen'd) instead of an `aggregate` higher-order fold —
    * HOF lambdas are interpreted per element and carried a
    * (prev, run, best) struct allocation each step (guide §4; same
    * HOF→native move as [[graft.operators.Similarity.dot]]). Values
    * are identical — MaxRunLength's scaladoc pins the contract and
    * OperatorSpec pins equality against the fold on null/empty/dup
    * shapes. */
  def topFraction(arr: Column): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    round(call_function("graft_max_run", array_sort(arr)) / size(arr), 4)
  }

  /** Top-token occupancy of raw text. Convenience form — for wide scans
    * stage `tokens(text)` as its own column and use [[topFraction]]
    * directly (see [[bigramsOf]] scale note). */
  def topTokenFraction(c: Column): Column = topFraction(tokens(c))

  /** Top-bigram occupancy of raw text (convenience form; same staging
    * note as [[topTokenFraction]]). */
  def topBigramFraction(c: Column): Column = {
    val toks = tokens(c)
    topFraction(bigramsOf(toks))
  }

  /** PII scrubbing for training corpora: emails then phone-number spans
    * replaced with typed placeholders. Codegen'd regexp_replace — a
    * 100 TB redaction pass is a map-only scan. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>")

  /** BPE-style pre-tokenizer count: the GPT-2 pre-tokenization regex
    * family restricted to its RE2-safe core (word / number / punct runs
    * with attached leading space) — a vocabulary-free, deterministic
    * token-length estimate that tracks real BPE counts far better than
    * whitespace splitting on punctuated text. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"))

  /** REAL merge-table BPE tokenization (not the count estimate above):
    * the native [[graft.expressions.GraftBpe]] expression under the
    * committed fixture model — GPT-2-style pre-tokens, rank-ordered
    * merges, total coverage so `concat_ws("", bpeTokens(c)) === c`
    * exactly (detokenize identity). Registration note as [[winnow]]. */
  def bpeTokens(c: Column): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_bpe", c)
  }

  /** Exact token count under the fixture BPE model — what a packing /
    * per-token-budget pipeline needs (the estimate above tracks but
    * does not equal it). */
  def bpeTokenCountExact(c: Column): Column = size(bpeTokens(c))

  /** Canonical whitespace/case normalization used before hashing. */
  def normalize(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * and cache key (rolling-hash role of the reference-era fingerprint;
    * md5 chosen because it is identical in Spark and DuckDB). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Ratio of alphabetic characters (quality signal). */
  def alphaRatio(c: Column): Column =
    round(length(regexp_replace(c, "[^A-Za-z]", "")) / length(c), 4)

  /** Count of sentence punctuation. */
  def punctCount(c: Column): Column = length(regexp_replace(c, "[^.,;:!?]", ""))

  private val enStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")
  private val deStop = Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit")
  private val frStop = Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour")

  /** Stopword-hit ratio over an ALREADY-materialized lowercased token
    * array (see [[bigramsOf]]: a Catalyst lambda re-evaluates captured
    * non-attribute expressions per element, and even as an argument the
    * raw-text form re-runs the regex split once per ratio — stage
    * `tokens(lower(text))` as its own projection column and every
    * language's ratio reuses the one array). */
  def stopRatioOf(toks: Column, stops: Seq[String]): Column =
    round(size(filter(toks, t => t.isin(stops.map(lit(_)): _*))) / size(toks), 4)

  private def stopRatio(c: Column, stops: Seq[String]): Column =
    stopRatioOf(tokens(lower(c)), stops)

  /** English stopword ratio (quality + language signal). Convenience
    * raw-text form — for wide scans stage the token array and use
    * [[stopRatioOf]] (see scale note there). */
  def enStopRatio(c: Column): Column = stopRatio(c, enStop)

  /** English stopword ratio over a staged lowercased token array. */
  def enStopRatioOf(toks: Column): Column = stopRatioOf(toks, enStop)

  /** Language ID from a staged lowercased token array: argmax of
    * per-language stopword-hit ratios with deterministic tie-break
    * (en > de > fr > unk). One tokenization per row happens in the
    * caller's staging projection; the three ratios here are filter
    * passes over the materialized array attribute. */
  def langIdOf(toks: Column): Column = {
    val en = stopRatioOf(toks, enStop)
    val de = stopRatioOf(toks, deStop)
    val fr = stopRatioOf(toks, frStop)
    when(en > de && en > fr && en > 0, "en")
      .when(de > fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unk")
  }

  /** N-gram/stopword language-ID heuristic — convenience raw-text form;
    * re-tokenizes per ratio, so for scans stage `tokens(lower(c))` and
    * use [[langIdOf]]. Scale: pure column expressions — language ID
    * over 100 TB is a single codegen'd projection, no shuffle. */
  def langId(c: Column): Column = langIdOf(tokens(lower(c)))

  /** Composite quality score in [0,1]: alphabetic density, low
    * punctuation noise, adequate length. Same closed formula in the
    * oracle. */
  def qualityScore(c: Column): Column =
    round(
      alphaRatio(c) * 0.4
        + (lit(1.0) - least(punctCount(c) / tokenCount(c), lit(1.0))) * 0.3
        + least(tokenCount(c) / lit(50.0), lit(1.0)) * 0.3,
      4)

  /** Trained linear quality-classifier score over a lowercased token
    * array (fastText shape, Joulin et al. 2016: hashing-trick bag of
    * words, score = sigmoid(bias + mean over tokens of
    * weights[md5-bucket(token)])). Weights are the committed
    * [[QualityModel]] fixture from tools/train_quality.py; the bucket
    * is the corpus-standard md5-first-8-hex formula
    * ([[graft.operators.Sampling.hashBucket]]) so the DuckDB oracle
    * reproduces the score from the same constants.
    *
    * Scale: one native codegen'd loop over the token array per row
    * ([[graft.expressions.WeightBagSum]], r20 — replaces the
    * interpreted `aggregate` HOF fold, guide §4; bit-identical value
    * contract pinned in the expression's scaladoc and by the
    * OperatorSpec equality test against the original fold), weights
    * shipped once per operator via the codegen reference array (no
    * broadcast, no shuffle, no UDF); this is the model-scoring shape
    * that filters a 100 TB corpus in one codegen'd scan. */
  def classifierScoreOf(toks: Column): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    val s = call_function("graft_weight_sum", toks)
    val z = lit(QualityModel.bias) + s / greatest(size(toks), lit(1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Raw-text convenience form of [[classifierScoreOf]]. */
  def classifierScore(c: Column): Column = classifierScoreOf(tokens(lower(c)))

  /** Character-n-gram language profiles: score = fraction of the doc's
    * char trigrams found in a per-language profile set (the classic
    * Cavnar-Trenkle shape, profile lists kept small and inline).
    * Complement to the stopword heuristic in [[langId]]. */
  def charNgramScore(c: Column, profile: Seq[String]): Column = {
    val grams = charTrigrams(c)
    round(size(filter(grams, g => g.isin(profile.map(lit(_)): _*))) / size(grams), 4)
  }

  /** Distinct character trigrams of the normalized text. */
  def charTrigrams(c: Column): Column = {
    val t = normalize(c)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - 2, lit(1))),
      i => t.substr(i, lit(3))))
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * rolling k-gram hashes, minimum per sliding window — the
    * local-similarity fingerprint used for plagiarism/near-dup detection
    * at passage granularity (vs the whole-doc [[fingerprint]]).
    * UDF by necessity (stateful rolling loop); per-row cost is linear
    * and partition-parallel. */
  /** Positional k-gram hashes of an ALREADY-STAGED normalized-text
    * attribute: for each character position, the 60-bit bigint prefix of
    * md5 of the k chars starting there. Engine-portable twin of the
    * rolling hash inside [[winnow]] (md5 is identical in Spark and
    * DuckDB, so winnowing built on these prints is oracle-checkable).
    * Pass an attribute, not an expression — the lambda body re-evaluates
    * captured non-attribute expressions per element (see [[shinglesOf]]).
    */
  def kgramHashes(t: Column, k: Int): Column =
    when(length(t) >= k,
      transform(sequence(lit(1), length(t) - k + 1),
        i => md5Prefix(t.substr(i, lit(k)), 15)))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing selection (Schleimer et al., SIGMOD'03) over a STAGED
    * hash-array attribute: the minimum of each sliding window of `w`
    * consecutive k-gram hashes, deduplicated — guarantees any shared
    * passage of length ≥ k+w−1 chars contributes at least one common
    * print. Pure column expressions end to end (codegen'd, no UDF). */
  def winnowMins(hs: Column, w: Int): Column =
    when(size(hs) >= w,
      array_distinct(transform(sequence(lit(1), size(hs) - w + 1),
        i => array_min(slice(hs, i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** Position-indexed hashes: (h, pos) structs with 1-based positions.
    * Stage this as its OWN projection column before [[winnowMinsPos]] —
    * a lambda capturing a non-attribute expression re-evaluates it per
    * element (see [[shinglesOf]]), which here would turn winnowing
    * O(n·w) into O(n²). */
  def posIndexed(hs: Column): Column =
    transform(hs, (h, i) => struct(h.as("h"), (i + 1).cast("int").as("pos")))

  /** Winnowing selection WITH positions over a STAGED [[posIndexed]]
    * attribute: per sliding window of `w` consecutive k-gram hashes,
    * the (h, pos) struct of the window minimum — ONE array_min per
    * window, because lexicographic struct ordering (h first, then pos)
    * makes the min struct exactly "smallest hash, FIRST in-window
    * occurrence". Deduplicated on (h, pos). First-occurrence is the tie
    * rule (not the classic rightmost) because both engines express it
    * directly (struct min / list_position); any consistent rule keeps
    * the winnowing guarantee. Feeds
    * [[graft.operators.Dedup.sharedPassages]], where positions align
    * shared prints into passage spans. */
  def winnowMinsPos(hsp: Column, w: Int): Column =
    when(size(hsp) >= w,
      array_distinct(transform(sequence(lit(1), size(hsp) - w + 1),
        i => array_min(slice(hsp, i, lit(w))))))
      .otherwise(array().cast("array<struct<h:bigint,pos:int>>"))

  /** One-pass rolling-hash winnowing prints — the production
    * (non-oracle) fingerprint form, O(len) per doc. Since round 7 this
    * is the NATIVE [[graft.expressions.RollingWinnow]] expression, not
    * a Scala UDF: the map side of [[graft.operators.Dedup.winnowPairsFast]]
    * stays inside one whole-stage-codegen span (a UDF fenced it). Same
    * registration pattern as `graft_dot` ([[graft.operators.Similarity]]).
    *
    * Registration covers the thread-local active session AND the
    * default session: on a driver thread-pool thread (no active
    * session) the active-only form silently skipped registration and
    * the query died at analysis with undefined-function. When building
    * the column for a THIRD session (neither active nor default on this
    * thread), register explicitly first, as
    * [[graft.operators.Dedup.winnowPairsFast]] does:
    * `GraftFunctions.register(df.sparkSession)`. */
  def winnow(c: Column, k: Int = 8, window: Int = 4): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    // null text → EMPTY prints, the exact contract of the UDF this
    // replaced (downstream explodes either way; direct callers keep
    // the non-null array column)
    coalesce(call_function("graft_winnow", normalize(c), lit(k), lit(window)),
      array().cast("array<bigint>"))
  }
}
