package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline (north star): the
  * composition every LLM corpus run needs, as ONE declarative plan —
  * quality gate → language gate → repetition gate → exact dedup →
  * MinHash near-dup removal → PII redaction → token accounting →
  * reproducible train/test split.
  *
  * Scale shape: the scalar gates are codegen'd projections on the scan
  * (no shuffle); exact dedup is one hash shuffle; near-dup removal is
  * the banded LSH join (never all-pairs); the split is a pure hash
  * filter. Everything composes lazily, so Catalyst prunes columns
  * through the whole funnel and AQE sizes the joins at runtime.
  */
object Curation {

  final case class Config(
    minQuality: Double = 0.30,
    langs: Seq[String] = Seq("en"),
    maxTopTokenFrac: Double = 0.50,
    nearDupThreshold: Double = 0.80,
    minhashPerms: Int = 16,
    // 8 bands × 2 rows: s-curve midpoint (1/8)^(1/2) ≈ 0.35 — high
    // recall at the 0.6-0.8 thresholds curation uses; the extra
    // candidates cost only exact-verify work (they are filtered by true
    // jaccard), whereas 4×4 banding (midpoint ≈ 0.71) deterministically
    // misses some ~0.8-jaccard pairs
    minhashBands: Int = 8,
    testPct: Int = 10)

  /** Per-stage row counts for reporting (each count is a cheap
    * aggregate over the lazily-built stage frame). */
  final case class Funnel(input: Long, afterQuality: Long, afterExact: Long,
                          afterNearDup: Long, train: Long, test: Long)

  /** The lazily-built pipeline stages — ONE construction shared by
    * [[curate]] (which only needs `out`) and [[funnel]] (which counts
    * every stage), so the reporting path reuses the SAME materialized
    * `exact` boundary instead of rebuilding the gates + exact-dedup
    * join per stage count. */
  private final case class Stages(gated: DataFrame, exact: DataFrame,
                                  clean: DataFrame, out: DataFrame)

  private def build(docs: DataFrame, cfg: Config): Stages = {
    val gated = scalarGates(docs, cfg)
    // exact dedup: keep only each content-group's canonical (min-id) doc
    val exactKept = Dedup.exact(gated, "text", "doc_id")
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id")
    // shared: the exact-deduped survivors feed BOTH the LSH pair
    // generation and the final anti-join + redact projection — without
    // materialization the scalar gates and the exact-dedup join run
    // twice end to end (measured 80.5 -> 45.8 s on the 10x soak). Lazy
    // localCheckpoint: same reuse-without-leak scheme as the Dedup
    // operators.
    val exact = Dedup.shared(gated.join(exactKept, "doc_id"), materialize = true)
    // near-dup removal: cluster the pair graph into connected
    // components (transitive closure — {(a,c),(b,c)} is ONE cluster)
    // and keep only each component's minimum id; the banded LSH join
    // generates the pairs, hash-min propagation clusters them
    val pairs = Dedup.minhashLsh(exact, cfg.nearDupThreshold,
      cfg.minhashPerms, cfg.minhashBands)
    val dupIds = Dedup.components(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val clean = exact.join(dupIds, Seq("doc_id"), "left_anti")
    val out = clean.select(
      col("doc_id"),
      Text.redactPii(col("text")).as("text"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"),
      when(Sampling.hashBucket(col("doc_id")) < cfg.testPct, "test")
        .otherwise("train").as("split"))
    Stages(gated, exact, clean, out)
  }

  /** The curated corpus: doc_id, redacted text, n_tokens, split.
    * Deterministic end to end — same input, same corpus out. */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame =
    build(docs, cfg).out

  /** Stage-by-stage funnel counts — a reporting tool, but one that
    * shares [[curate]]'s pipeline (and its materialization boundary):
    * each count after `afterQuality` reads the checkpointed `exact`
    * frame, so pointing this at a real corpus costs the gates +
    * exact-dedup join ONCE (inside the checkpoint materialization),
    * not once per stage. Total corpus reads: the `input` and
    * `afterQuality` counts plus the one materialization pass —
    * CurationSpec pins this with a listener that counts corpus
    * relations in every non-checkpoint action's analyzed plan. The
    * train/test breakdown is one grouped aggregate over the final
    * frame rather than two filtered counts. */
  def funnel(docs: DataFrame, cfg: Config = Config()): Funnel = {
    val st = build(docs, cfg)
    val bySplit = st.out.groupBy("split").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    Funnel(docs.count(), st.gated.count(), st.exact.count(), st.clean.count(),
      bySplit.getOrElse("train", 0L), bySplit.getOrElse("test", 0L))
  }

  /** Gopher/C4-family rule filter with per-rule attribution: every doc
    * labeled keep/drop plus the FIRST failing rule's name (rules
    * checked in declaration order, the Gopher reporting convention) —
    * the audit artifact a curation run ships alongside the filtered
    * corpus, so domain owners can see WHY volume dropped.
    *
    * Rules (all over per-row signals, thresholds caller-tunable):
    * too_short (n_tokens < minTokens), too_long (> maxTokens),
    * low_alpha (alpha_ratio < minAlpha), repetitive (top_token_frac >
    * maxTopTokenFrac).
    *
    * Scale: one codegen'd projection — the token array is staged once,
    * every rule reads attributes, no shuffle, no UDF; this annotates
    * 100 TB in a single scan. */
  def ruleFilter(docs: DataFrame, minTokens: Int = 30, maxTokens: Int = 100000,
                 minAlpha: Double = 0.80, maxTopTokenFrac: Double = 0.12,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), col(textCol), Text.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        size(col("__toks")).as("__n"),
        Text.alphaRatio(col(textCol)).as("__alpha"),
        Text.topFraction(col("__toks")).as("__rep"))
      .select(col(idCol),
        when(col("__n") < minTokens, "too_short")
          .when(col("__n") > maxTokens, "too_long")
          .when(col("__alpha") < minAlpha, "low_alpha")
          .when(col("__rep") > maxTopTokenFrac, "repetitive")
          .otherwise("ok").as("reason"))
      .select(col(idCol), (col("reason") === "ok").cast("int").as("keep"),
        col("reason"))

  /** The shuffle-free scalar gates: quality, language, repetition —
    * staged token column so the tokenizer runs once per row (see
    * [[graft.functions.Text.bigramsOf]] lambda-inlining note).
    * Package-visible: [[CurationStream]] applies the IDENTICAL gates
    * per micro-batch (batch==stream starts here). */
  private[operators] def scalarGates(docs: DataFrame, cfg: Config): DataFrame =
    docs
      .withColumn("__toks", Text.tokens(col("text")))
      .withColumn("__q", Text.qualityScore(col("text")))
      .withColumn("__lang", Text.langId(col("text")))
      .withColumn("__rep", Text.topFraction(col("__toks")))
      .filter(col("__q") >= cfg.minQuality &&
        col("__lang").isin(cfg.langs.map(lit(_)): _*) &&
        col("__rep") <= cfg.maxTopTokenFrac)
      .drop("__toks", "__q", "__lang", "__rep")
}
