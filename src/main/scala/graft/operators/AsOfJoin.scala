package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY §2.7
  * beyond-reference surface; the standard time-series primitive).
  *
  * For each left row, attach the payload of the latest right row with
  * the same key and `rightTime <= leftTime`.
  *
  * Implementation: union-then-window, NOT a range join — both sides are
  * tagged and unioned, one shuffle partitions by key, and a running
  * `last(payload, ignoreNulls)` over (time, tag) order carries the most
  * recent right payload onto each left row. Right rows sort before left
  * rows at equal time (tag 0 < 1) ⇒ the inclusive <= semantic.
  *
  * Scale: this is THE 100 TB-safe as-of design — cost is one hash
  * shuffle + one intra-partition sort, independent of time-range
  * density, where a range join would explode pairs; skewed keys fall
  * back to AQE skew handling like any window. */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], inner: Boolean = true): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    // the payload travels as ONE struct, not per-column lasts: a
    // per-column `last(p, ignoreNulls)` treats a NULL payload VALUE as
    // "no row here" and stitches columns from DIFFERENT right rows
    // (torn rows), and `inner` misclassifies a match whose first
    // payload is legitimately null. The struct is null exactly on left
    // rows, so one `last(__p, ignoreNulls)` carries the whole latest
    // right row and `__p IS NOT NULL` is the precise match marker.
    // NULL join keys: filtered from the right, and left NULL-key rows
    // can then never match — SQL equi-join semantics (NULL never
    // equals NULL), matching any ASOF-join oracle; a window partition
    // would otherwise group all NULL keys together and match them.
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
      leftStruct.as("__l"),
      lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__p"))
    val r = right.filter(col(key).isNotNull).select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      payloadStruct.as("__p"))
    val w = Window.partitionBy("__k").orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(col("__tag"), col("__l"),
        last(col("__p"), ignoreNulls = true).over(w).as("__p"))
      .filter(col("__tag") === 1)
    val matched = if (inner) joined.filter(col("__p").isNotNull) else joined
    matched.select(col("__l.*") +:
      rightPayload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
