package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped statistics at scale (beyond-reference, SURVEY §2.7).
  *
  * Exact interpolated quantiles (SQL `quantile_cont`) via sort + rank
  * arithmetic instead of the `percentile` aggregate: `percentile`
  * buffers a value→count map per group and merges those maps across
  * every partition — for a high-cardinality DOUBLE column the state is
  * ~|distinct| entries per partition and the merge dominates. The
  * sort-based form shuffles each row once into its group, sorts within
  * the group (range-partitioned parallel sort), and interpolates the
  * two rows straddling rank (n−1)·q — no per-value map state at all.
  * For truly massive groups prefer [[Sketches.approxPercentiles]]; this
  * is the EXACT form, kept shuffle- and state-minimal.
  */
object Stats {

  /** Exact `quantile_cont(valCol, q)` per `keyCol` group for several
    * q's in ONE sort: returns one row per group with a column per
    * requested quantile alias.
    *
    * r19 optimization (guide §2.3, aggregate before the shuffle): the
    * input is first reduced to (key, value, count) by a map-side-
    * combinable hash aggregate, and the rank arithmetic runs over VALUE
    * GROUPS (cumulative counts) instead of rows. The exchange + sort +
    * window then carry |distinct (key, value)| rows instead of every
    * input row — for discrete/enum-like numeric columns (integer
    * quantities, prices on a cent grid) that is orders of magnitude
    * less, and the low-parallelism window partitions (one per GROUP,
    * however few groups there are) stop buffering the whole table. A
    * truly continuous column degrades to the old shape (pre-agg passes
    * through) at the cost of one extra map-side hash agg, never more.
    * Rank r (1-based) lives in the value group with
    * cum − c < r ≤ cum; the interpolated contribution per group is
    * float-identical to the per-row form (a group holding both
    * straddling ranks contributes v·(1−w) + v·w, exactly the two terms
    * the row form summed — IEEE addition is commutative). */
  def quantilesCont(df: DataFrame, keyCol: String, valCol: String,
                    qs: Seq[(Double, String)]): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val ordered = Window.partitionBy(keyCol).orderBy("__v")
    // NULLs are excluded before ranking — SQL quantile_cont (and the
    // percentile aggregate this replaces) ignores NULL inputs; counting
    // them into __n would shift every rank position on nullable columns.
    val grouped = df.select(col(keyCol), col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(keyCol, "__v").agg(count(lit(1)).as("__c"))
    val ranked = grouped
      .withColumn("__cum", sum("__c").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__c").over(byKey))
    // for each q: the two ranks straddling position (n-1)q (1-based),
    // with the interpolation weight; a value group can serve both ranks
    val parts: Seq[Column] = qs.map { case (q, alias) =>
      val pos = (col("__n") - 1) * q            // 0-based fractional pos
      val lo = floor(pos) + 1                   // 1-based lower rank
      val hi = ceil(pos) + 1
      val w = pos - floor(pos)                  // weight of the hi row
      val hasLo = lo > col("__cum") - col("__c") && lo <= col("__cum")
      val hasHi = hi > col("__cum") - col("__c") && hi <= col("__cum")
      sum(
        when(hasLo && hasHi && lo === hi, col("__v"))
          .when(hasLo && hasHi,
            col("__v") * (lit(1.0) - w) + col("__v") * w)
          .when(hasLo, col("__v") * (lit(1.0) - w))
          .when(hasHi, col("__v") * w)
          .otherwise(lit(0.0))).as(alias)
    }
    val agg = ranked.groupBy(keyCol).agg(parts.head, parts.tail: _*)
    // SQL quantile_cont under GROUP BY still EMITS a group whose inputs
    // are all NULL (with NULL quantiles); the isNotNull pre-filter above
    // would silently drop it. Restore such groups by left-joining the
    // quantile rows back onto the distinct key set — with NULL-SAFE
    // equality: a plain equi-join (NULL != NULL) would hand the NULL-key
    // group back NULL quantiles even when it has non-null values, a
    // silent wrong answer. Cost at scale: one extra scan of the (pruned)
    // key column + a |groups|-sized join — the data-scale sort is not
    // repeated, and <=> is still a hash-joinable equi-key.
    df.select(keyCol).distinct()
      .join(agg.withColumnRenamed(keyCol, "__k"), col(keyCol) <=> col("__k"), "left")
      .drop("__k")
  }

  /** Fixed-bin histogram for distribution profiling: `bins` equal-width
    * bins over [lo, hi), DENSE output (empty bins emit n = 0, so the
    * result shape depends only on the parameters — chartable and
    * engine-comparable without special-casing). Out-of-range and NULL
    * values are dropped; report them separately if they matter.
    *
    * Scale: one partial+final agg over an int bin key (≤ `bins`
    * groups), then a broadcast left join from the literal bin range —
    * the data is scanned once, the join side is `bins` rows. */
  def histogram(df: DataFrame, valueCol: String, bins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val spark = df.sparkSession
    val counts = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v") >= lo && col("__v") < hi)
      // clamped to the last bin: when (hi-lo)/bins rounds DOWN, an
      // in-range value just below hi can compute quotient == bins and
      // would otherwise vanish in the join to range(bins) — the DuckDB
      // oracle applies the identical clamp
      .select(least(floor((col("__v") - lo) / w), lit((bins - 1).toLong))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(broadcast(counts), Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * w).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * w).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
