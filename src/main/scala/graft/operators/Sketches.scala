package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregations for 100 TB-scale profiling (beyond-reference;
  * north-star ops). Sketches trade exactness for constant memory —
  * at scale an exact count-distinct of a high-cardinality key keeps
  * the full key set in the aggregation state, a sketch keeps KBs.
  * (Not in the DuckDB oracle gate: sketch implementations differ
  * across engines by construction; tests assert bounded error vs the
  * exact answer instead.)
  */
object Sketches {

  /** HyperLogLog++ distinct count (Spark native; rsd = relative
    * standard deviation, default 5%). */
  def approxDistinct(df: DataFrame, col_ : String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(col_), rsd).as("approx_distinct"))

  /** Approximate percentiles via the Greenwald-Khanna sketch. */
  def approxPercentiles(df: DataFrame, col_ : String,
                        ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(col_),
      array(ps.map(lit(_)): _*), lit(accuracy)).as("percentiles"))

  /** Frequent items (Karp et al.) — the heavy-hitters profile. */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** Heavy hitters with the sketch's guarantee made checkable: every
    * key whose EXACT frequency exceeds `support`·N, with its exact
    * count and a flag asserting the one property the Karp sketch
    * promises — no false negatives (`in_sketch` must be true on every
    * row; the sketch's false POSITIVES are permitted by contract and
    * simply don't appear here). This is how a profiling pass validates
    * a sketch against ground truth on a sample before trusting it on
    * the full corpus.
    *
    * Scale: the sketch leg is one pass with ~1/support counters per
    * partition (constant state); the exact leg is a partial+final
    * count agg on the key. The threshold compare `cnt > N·support`
    * multiplies in double on both engines so the oracle's arithmetic
    * is bit-identical.
    *
    * NULL keys: a NULL key that clears the threshold reports
    * `in_sketch = false` by convention — `array_contains(items, NULL)`
    * is NULL in SQL semantics, so the sketch cannot attest NULL
    * membership, and an unguarded flag would surface as a
    * three-valued-logic NULL that silently diverges from the oracle's
    * literal booleans. N still counts null-keyed rows (they are corpus
    * mass either way). */
  def verifiedHeavyHitters(df: DataFrame, keyCol: String,
                           support: Double): DataFrame = {
    val sketch = df.stat.freqItems(Array(keyCol), support)
      .withColumnRenamed(s"${keyCol}_freqItems", "__sketch_items")
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // N from the key-sized counts table, not a second corpus scan
    val total = exact.agg(sum("cnt").as("n_total"))
    exact.crossJoin(broadcast(total))
      .filter(col("cnt") > col("n_total") * lit(support))
      .crossJoin(broadcast(sketch))
      .select(col(keyCol), col("cnt"),
        coalesce(array_contains(col("__sketch_items"), col(keyCol)),
          lit(false)).as("in_sketch"))
  }

  private def cmsCell(i: Column, key: Column, width: Int): Column =
    graft.functions.Text.md5Prefix(concat(i.cast("string"), lit("|"),
      key.cast("string")), 15) % width

  /** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as
    * a COUNTS TABLE: `depth` hash rows × `width` cells, one (i, cell,
    * cnt) row per non-empty cell. The table form IS the Spark-idiomatic
    * sketch — building it is explode(depth) + one hash aggregation, and
    * partial aggregation collapses every partition's contribution to
    * ≤ depth·width rows before the shuffle, so the shuffle is
    * CONSTANT-SIZE regardless of corpus size (the same map-side-combine
    * property a custom mergeable-sketch aggregate would buy, without
    * leaving declarative land). Point lookups then join the probe keys
    * against the broadcast table and take the row-wise min.
    *
    * Hashes are the repo's oracle-portable md5-prefix family
    * (`i|key` → 60-bit bigint, exactly [[graft.operators.Dedup]]'s
    * minhash arithmetic), so every estimate is a pure deterministic
    * function of the data — the gate pins estimates exactly, not just
    * within bounds. */
  /** The raw (i, cell) update stream for a key column — the stateless
    * half of the sketch, shared by the batch [[cmsTable]] and streaming
    * builds: because the cells table is a plain ADDITIVE groupBy-count,
    * the identical plan runs as a streaming aggregation whose state IS
    * the sketch, merged across micro-batches by the engine (gate
    * `q35_stream_cms` pins stream-built == batch-built).
    *
    * NULL-KEY CONVENTION (across the cms* family): NULL keys are NOT
    * counted — `cmsCell`'s concat yields a NULL cell, so NULL-keyed
    * rows update no cell. Downstream: [[cmsEstimate]] still emits a
    * row for a NULL probe key, with estimate 0 (the left join's
    * coalesce — an UNDERESTIMATE if the corpus had NULL keys, the one
    * key the no-underestimate guarantee doesn't cover); [[cmsVerified]]
    * DROPS a NULL key from its top-N output entirely (the exact↔est
    * equi-join never matches on NULL). Same convention as
    * [[verifiedHeavyHitters]]; pre-coalesce NULLs to a sentinel key
    * upstream if they must be tracked. */
  def cmsCells(df: DataFrame, keyCol: String, depth: Int,
               width: Int): DataFrame = {
    require(depth > 0 && width > 0, "cmsCells: depth and width must be positive")
    df.select(col(keyCol).cast("string").as("__k"))
      .select(col("__k"), explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col("i"), cmsCell(col("i"), col("__k"), width).as("cell"))
  }

  def cmsTable(df: DataFrame, keyCol: String, depth: Int = 4,
               width: Int = 256): DataFrame =
    cmsCells(df, keyCol, depth, width)
      .groupBy("i", "cell").agg(count(lit(1)).as("cnt"))

  /** [[cmsTable]] built from a PRE-AGGREGATED (key, count) table
    * instead of the raw row stream — identical sketch (cell counts are
    * Σ over keys either way), but the hash work drops from
    * rows×depth to DISTINCT-keys×depth digests. Use whenever a keyed
    * counts table already exists in the pipeline (profiling passes
    * compute one for the exact leg anyway — see [[cmsVerified]]); use
    * the row form when keys are unbounded or the stream must stay
    * un-aggregated (the streaming state build). */
  def cmsTableFromCounts(counts: DataFrame, keyCol: String, cntCol: String,
                         depth: Int, width: Int): DataFrame =
    counts.select(col(keyCol).cast("string").as("__k"), col(cntCol).as("__cnt"))
      .select(col("__k"), col("__cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col("i"), cmsCell(col("i"), col("__k"), width).as("cell"),
        col("__cnt"))
      .groupBy("i", "cell").agg(sum("__cnt").cast("long").as("cnt"))

  /** Point-frequency estimates from a [[cmsTable]]: est(k) = min over
    * hash rows of the k-cell's count — the classic CMS query, which
    * NEVER underestimates (every cell k hashes into counts all of k's
    * occurrences, plus colliding keys' — the min only trims collision
    * noise). Keys absent from the corpus read whatever their cells
    * collected (possibly 0 via the left join).
    *
    * Scale: the sketch is ≤ depth·width rows — broadcast it; the probe
    * side (however many keys) never shuffles. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probes = keys.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col(keyCol), col("i"),
        cmsCell(col("i"), col(keyCol), width).as("cell"))
    probes.join(broadcast(sketch), Seq("i", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** CMS with its guarantee made driver-checkable (the [[verifiedHeavyHitters]]
    * pattern): the exact top-`topN` keys by frequency, each with its
    * exact count, its deterministic CMS estimate, and the structural
    * no-underestimate flag `ge_ok` (= est ≥ exact — ALWAYS true for a
    * correct CMS; a hashing or merge regression flips it). The
    * width is sized small enough that collisions actually occur at
    * test scale, so the estimate column genuinely exercises the min-
    * over-rows trimming rather than degenerating to the exact count.
    *
    * Top-N is TWO-LEVEL (r20, guide §2.4): `orderBy(...).limit(topN)`
    * plans as TakeOrderedAndProject — each partition of the counts
    * table contributes its local top-N and only topN·partitions rows
    * ever leave a partition — and the rank window then runs over the
    * ≤ topN survivors (partitioned on a constant, so no unbounded
    * single-partition WindowExec even when the key space is huge). The
    * total order (cnt desc, key) is deterministic, so the selected
    * rows and ranks equal the old global-window form exactly. */
  def cmsVerified(df: DataFrame, keyCol: String, topN: Int = 20,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val top = exact.orderBy(col("cnt").desc, col(keyCol)).limit(topN)
      .withColumn("rnk",
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("cnt").desc, col(keyCol))).cast("long"))
    // the exact leg already aggregates per key — build the sketch from
    // that counts table too (distinct-keys×depth digests) rather than
    // re-hashing every corpus row (rows×depth): identical cell counts,
    // and the second corpus pass is a plain partial+final count agg
    // instead of a 4×-exploded digest stream (persist `exact` upstream
    // to make it one pass when profiling at scale)
    val sketch = cmsTableFromCounts(exact, keyCol, "cnt", depth, width)
    val est = cmsEstimate(sketch, top, keyCol, depth, width)
    top.join(est, Seq(keyCol))
      .select(col(keyCol), col("rnk"), col("cnt"), col("cms_est"),
        (col("cms_est") >= col("cnt")).as("ge_ok"))
  }
}
