package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch point-in-interval RANGE JOIN — the lookup shape behind
  * time-validity dimension joins, IP-range geolocation, and
  * session-window attribution. Vanilla Spark plans a non-equi join as
  * a broadcast nested loop (or a cartesian when neither side fits),
  * which is |P|·|I| work — the classic scale-killer; engines with
  * native range joins (and the reference, which has none either) solve
  * it with binning. This is that binning, declaratively:
  *
  *   1. each interval [start, end) explodes into the fixed-width
  *      buckets it covers (⌈len/bucketWidth⌉+1 rows per interval);
  *   2. each point maps to its single bucket;
  *   3. buckets EQUI-join (hash-partitioned — never a nested loop),
  *      then the exact `start ≤ p < end` predicate refines.
  *
  * Correct for ANY overlap structure (a point landing in k intervals
  * emits k rows). `bucketWidth` is the cost knob: the join processes
  * Σ(points-per-bucket × intervals-covering-bucket); size it near the
  * TYPICAL interval length so most intervals explode to ~2 buckets —
  * too fine multiplies the interval side, too coarse piles points
  * into hot buckets. Works on any numeric domain, integral OR
  * fractional (the bucket range is [floor(start/w), floor(end/w)] —
  * see the in-code note on why the top bucket must not be
  * end−1-based). Degenerate inputs (end ≤ start) are dropped up-front
  * (Spark's `sequence` would otherwise generate a DESCENDING bucket
  * range — garbage rows the refine filter would kill, but paid for).
  *
  * Scale: both sides shuffle ONCE on the bucket; no broadcast
  * required (Catalyst may still choose one when the exploded interval
  * side is small — that is the right plan at that size). Long-tail
  * giant intervals (an interval spanning ~everything) are bucket-count
  * skew: split them upstream or route them through a broadcast leg.
  *
  * Column contract: `points` keeps all its columns; `intervals` keeps
  * all its columns; names must not collide (standard join rule). */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "pointInInterval: bucketWidth must be positive")
    require(!points.columns.contains("__bucket") &&
      !intervals.columns.contains("__bucket"),
      "pointInInterval: __bucket is reserved; rename the input column")
    // top bucket is floor(end/w), NOT floor((end-1)/w): the latter is
    // only right on integral domains (p < end ⇒ p ≤ end−1); on a
    // fractional column a point in the interval's last partial bucket
    // would never meet its interval in the equi-join and the match
    // would be SILENTLY lost. The occasional extra bucket this
    // generates (end on a bucket boundary) produces candidates the
    // exact refine filter kills — a correctness-for-a-row trade.
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // end-exclusive ⇒ empty otherwise
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
