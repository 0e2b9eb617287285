package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splits for corpus
  * curation (beyond-reference, north star): the sample is a pure
  * function of the row KEY (md5 bucket), so it is reproducible across
  * runs, engines and cluster sizes — unlike `df.sample`, whose output
  * depends on partitioning. This is how training corpora pin their
  * held-out splits.
  *
  * Scale: the bucket is one codegen'd projection; sampling pushes down
  * as an ordinary filter (no shuffle, no RNG state).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key: first 8 hex chars
    * of md5 as an integer (identical formula in the DuckDB oracle).
    * NULL keys bucket deterministically too (md5 of a sentinel) — a
    * NULL bucket would make every filter built on it evaluate to NULL
    * and silently drop the row from BOTH sides of a split, breaking
    * "disjoint and exhaustive" contracts. Non-null keys are untouched,
    * so oracle parity holds on the fixtures. */
  /** CAVEAT (inherent to deterministic key-hashed sampling): a NULL
    * key carries no entropy, so EVERY NULL-keyed row lands in the one
    * sentinel bucket — a percentage filter then keeps the whole NULL
    * slice or none of it, never a fraction. Rows with a key equal to
    * the literal sentinel string share that bucket too. Callers
    * sampling corpora with meaningful NULL-key populations should
    * coalesce to a real secondary key first. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (graft.functions.Text.md5Prefix(
      coalesce(key.cast("string"), lit("\u0000graft_null")), 8) % buckets).cast("int")

  /** Keep ~keepPct% of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, keyCol: String, keepPct: Int,
                   buckets: Int = 100): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < keepPct)

  /** Reproducible train/test split: rows whose bucket falls under
    * testPct go to test, the rest to train. Disjoint and exhaustive by
    * construction. */
  def trainTestSplit(df: DataFrame, keyCol: String, testPct: Int,
                     buckets: Int = 100): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol), buckets)
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** Deterministic domain rebalancing (training-data mixing): cap each
    * source at a target share of the ORIGINAL corpus — the standard
    * downsample-the-over-represented-domain step before training.
    * keep_rate(source) = min(1, target_share · total / n_source);
    * sources without a target keep everything. Selection within a
    * source is the md5 bucket of the row key at 1/`granularity`
    * resolution — reproducible across runs, engines, partitionings.
    *
    * Scale: one count-by-source agg (tiny result), rates broadcast
    * back, then a map-side filter — the corpus itself is never
    * shuffled. */
  def rebalanceBySource(docs: DataFrame, sourceCol: String,
                        targets: Map[String, Double], keyCol: String = "doc_id",
                        granularity: Int = 10000): DataFrame = {
    require(targets.values.forall(t => t > 0 && t <= 1), "target shares in (0, 1]")
    val targetCase = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (s, t)) => when(col(sourceCol) === s, lit(t)).otherwise(acc)
    }
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    // total derives from the per-source counts — an agg over the tiny
    // counts frame, NOT a second full-corpus scan
    val total = counts.agg(sum("__n").as("__tot"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("__rate",
        coalesce(least(lit(1.0), targetCase * col("__tot") / col("__n")), lit(1.0)))
      .select(col(sourceCol).as("__src"), col("__rate"))
    // NULL-SAFE key + left join: `groupBy(sourceCol)` above keeps NULL
    // as its own group (rate 1.0 — no target can name it), but a plain
    // equi-join would drop every NULL-source row (NULL != NULL),
    // contradicting "sources without a target keep everything". <=> is
    // still a hash-joinable equi-key, so the rates map stays a
    // broadcast join and the corpus is never shuffled.
    docs.join(broadcast(rates), col(sourceCol) <=> col("__src"), "left")
      .filter(hashBucket(col(keyCol), granularity) <
        coalesce(col("__rate"), lit(1.0)) * granularity)
      .drop("__src", "__rate")
  }

  /** Temperature / α-sampling of the source distribution — the
    * multilingual data-mixing rule of mBERT and XLM-R (Devlin et al.
    * 2019; Conneau & Lample 2019; Conneau et al. 2020): sampling
    * probability q_s ∝ p_s^α, α < 1 flattening the mix toward
    * low-resource sources. Deterministically realized as an integer
    * per-doc replication count so UP-sampling works too: a source's
    * expected copies-per-doc is c_s = round(epochs·q_s·total/n_s, 6)
    * (q_s = n_s^α / Σ n_t^α — the p_s^α normalization with N^α
    * cancelled); every doc gets ⌊c_s⌋ copies plus one more iff its
    * md5 unit draw (1/granularity resolution) falls below frac(c_s).
    * Output: input columns + `n_copies` (0 ⇒ dropped; ≥ 2 ⇒ the doc
    * repeats, epoch-style); expected output mass is epochs·total.
    * Materializing the repeats is the consumer's explode — kept out
    * of the operator so counting/statistics uses stay copy-free.
    *
    * Scale: one count-by-source agg (tiny result), c_s derived on
    * that tiny frame, rates broadcast back with the null-safe key of
    * [[rebalanceBySource]] — the corpus is never shuffled and the
    * copy decision is one map-side projection. */
  def temperatureSample(docs: DataFrame, sourceCol: String, alpha: Double,
                        epochs: Double = 1.0, keyCol: String = "doc_id",
                        granularity: Int = 1000000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(epochs > 0, "epochs must be positive")
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    // totals derive from the tiny counts frame, not a second corpus scan
    val stats = counts.agg(sum("__n").as("__tot"),
      sum(pow(col("__n"), lit(alpha))).as("__powsum"))
    val rates = counts.crossJoin(broadcast(stats))
      .withColumn("__c", round(
        lit(epochs) * pow(col("__n"), lit(alpha)) / col("__powsum")
          * col("__tot") / col("__n"), 6))
      .select(col(sourceCol).as("__src"), col("__c"))
    docs.join(broadcast(rates), col(sourceCol) <=> col("__src"), "left")
      .withColumn("n_copies",
        (floor(col("__c")) +
          when(hashBucket(col(keyCol), granularity) <
            (col("__c") - floor(col("__c"))) * granularity, 1L)
            .otherwise(0L)).cast("long"))
      .drop("__src", "__c")
  }

  /** Quality-ranked selection under a token budget — the selection
    * step after quality scoring (classifier, perplexity, DSIR weight):
    * keep the BEST documents until the training-token budget is
    * filled. Docs rank by (`scoreCol` desc, `idCol` asc — fully
    * deterministic, ties broken by id); a doc is kept iff its
    * INCLUSIVE running token total is ≤ `budget`, so the doc that
    * would overflow the budget is dropped along with everything below
    * it. Output: input columns + `cumCol`. NULL scores sort first
    * under the descending struct order — score them or filter them
    * out upstream.
    *
    * Scale: the ranked running total is [[Prefix.runningSum]]'s
    * two-phase prefix over a range partition of the negated score — a
    * PARALLEL sort plus a P-row offset shift, never the single-task
    * `Window.orderBy` cumsum — and the budget cut is a map-side
    * filter after the broadcast offset join. */
  def selectByTokenBudget(docs: DataFrame, scoreCol: String, tokenCol: String,
                          budget: Long, idCol: String = "doc_id",
                          cumCol: String = "cum_tokens"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val ord = Iterator.iterate("__ord")(_ + "_")
      .dropWhile(docs.columns.contains).next()
    val withOrd = docs.withColumn(ord,
      struct((-col(scoreCol)).as("s"), col(idCol).as("i")))
    graft.operators.Prefix.runningSum(withOrd, ord, tokenCol, cumCol)
      .filter(col(cumCol) <= budget)
      .drop(ord)
  }

  /** Leakage-free train/test split: buckets by near-dup COMPONENT, not
    * by doc — a per-doc split leaks held-out content whenever a near
    * duplicate of a test doc lands in train (the standard eval
    * contamination failure). Every doc in a connected near-dup cluster
    * (from [[Dedup.components]] over any pair set — n-gram Jaccard,
    * LSH, winnowing) gets the CLUSTER's bucket; singletons bucket by
    * their own id. Disjoint and exhaustive like [[trainTestSplit]].
    *
    * Scale: components' label map is one row per clustered doc (far
    * smaller than the corpus — most docs are singletons and never
    * enter the pair graph); the join back is a hash join on the id.
    *
    * STRICT by default: a non-converged component propagation throws
    * instead of warning — partial labels would let a near-dup cluster
    * silently straddle the boundary, the exact leak this API exists to
    * prevent. Raise `maxIter` (cluster diameter bound) rather than
    * weakening `strict`. */
  def splitByComponent(docs: DataFrame, pairs: DataFrame, testPct: Int,
                       idCol: String = "doc_id", buckets: Int = 100,
                       maxIter: Int = 10, strict: Boolean = true): (DataFrame, DataFrame) = {
    val comp = Dedup.components(pairs, maxIter, strict).withColumnRenamed("id", "__cid")
    val keyed = docs.join(comp, docs(idCol) === comp("__cid"), "left")
      .withColumn("__grp", coalesce(col("comp"), docs(idCol)))
    val b = hashBucket(col("__grp"), buckets)
    def strip(df: DataFrame) = df.drop("__cid", "comp", "__grp")
    (strip(keyed.filter(b >= testPct)), strip(keyed.filter(b < testPct)))
  }

  /** Per-key document cap (RefinedWeb/CCNet-style "domain cap"): keep
    * at most `maxPerKey` rows per key (domain, source, site), selected
    * deterministically — the survivors are the `maxPerKey` smallest
    * salted-md5 ranks within the key, a pure function of (key, id,
    * salt), reproducible across runs, engines and partitionings. A
    * different `salt` draws an independent sample of each domain.
    *
    * Scale: ONE hash shuffle on the key + a per-key window sort —
    * never a global sort. A pathologically hot key (half the corpus
    * one domain) sorts inside its partitions via spillable window
    * state; if that's the workload, pre-thin with
    * [[sampleStratified]] at ~(cap / est. count) before the exact
    * cap. NULL keys form their own capped group, as SQL PARTITION BY
    * does. */
  def capPerKey(df: DataFrame, keyCol: String, maxPerKey: Int,
                idCol: String = "doc_id", salt: String = "cap"): DataFrame = {
    require(maxPerKey > 0, "maxPerKey must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit("|" + salt))), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerKey)
      .drop("__rk")
  }

  /** Deterministic stratified sampling: an explicit keep-fraction per
    * stratum (`df.stat.sampleBy`'s contract, minus its partition-order
    * dependence — selection here is the md5 bucket of the row KEY, so
    * the sample is reproducible and consistent across engines). Strata
    * without an entry keep `defaultFraction`; a NULL stratum uses
    * `defaultFraction` too unless the map is extended via
    * [[rebalanceBySource]]-style rules.
    *
    * Scale: the fraction lookup compiles to a CASE projection (no join
    * at all — fractions are plan literals) and the filter is map-side:
    * zero shuffles, pushes to the scan. */
  def sampleStratified(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0,
                       keyCol: String = "doc_id",
                       granularity: Int = 10000): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions in [0, 1]")
    val rate = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (s, f)) => when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), granularity) < rate * granularity)
  }

  /** Deterministic corpus shuffle for training-data export: a
    * reproducible shard assignment plus intra-shard position, a pure
    * function of the row key — the data order a training run reads is
    * then independent of cluster size, input partitioning, and re-runs
    * (df.orderBy(rand()) is none of these). Shard = md5 bucket of the
    * key; position = rank of a salted md5 within the shard.
    *
    * Scale: one hash shuffle to the shard + a per-shard sort (keyed
    * window over ~|corpus|/shards rows) — never a global sort; pick
    * `shards` ≈ output file count as usual. A different `salt` yields
    * an independent reshuffle (per-epoch orders). */
  def shuffleDeterministic(df: DataFrame, keyCol: String, shards: Int,
                           salt: String = "shuffle"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", md5(concat(col(keyCol).cast("string"), lit("|" + salt))))
      .withColumn("shard", hashBucket(col(keyCol), shards))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }
}
