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
}
