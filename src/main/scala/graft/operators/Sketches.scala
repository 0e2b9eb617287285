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
}
