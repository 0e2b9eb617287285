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
    * of md5 as an integer (identical formula in the DuckDB oracle). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

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
}
