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
    val l = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
        leftStruct.as("__l")) ++
        rightPayload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
        lit(null).cast(l.schema("__l").dataType).as("__l")) ++
        rightPayload.map(p => col(p).as(s"__p_$p")): _*)
    val w = Window.partitionBy("__k").orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(Seq(col("__tag"), col("__l")) ++
        rightPayload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__tag") === 1)
    val matched = if (inner) joined.filter(col(rightPayload.head).isNotNull) else joined
    matched.select(col("__l.*") +: rightPayload.map(col): _*)
  }
}
