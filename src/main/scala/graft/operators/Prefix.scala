package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) aggregation — the scale-safe replacement
  * for a global `Window.orderBy(...)` cumsum, which funnels every row
  * through ONE task (`WindowExec: No Partition Defined`).
  *
  * Shape (two-phase prefix, same as `Flow.foldTriggered`):
  *   1. range-partition by the order column (a parallel sort),
  *   2. per-partition running sum via a partition-local window,
  *   3. shift each partition by the total of its predecessors — a P-row
  *      exclusive-prefix computed over the partition totals (P = shuffle
  *      partition count, never data size) and broadcast back.
  *
  * Both phase-2 branches (the local window and the per-partition totals)
  * consume the SAME range exchange, so Catalyst's exchange reuse runs the
  * upstream scan once — no `persist()` needed, nothing left cached.
  */
object Prefix {

  /** Running sum of `valCol` in global `orderCol` order, emitted as
    * `cumCol` (inclusive prefix). Requires `orderCol` to be globally
    * unique only if ties must be deterministic — ties within a value
    * are ordered by their partition-local position, like any SQL
    * cumulative window. */
  def runningSum(df: DataFrame, orderCol: String, valCol: String,
                 cumCol: String): DataFrame = {
    val parts = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("__loc", sum(col(valCol)).over(w))
    // per-partition totals → exclusive prefix offsets (window over P rows)
    val stats = parts.groupBy("__pid").agg(sum(col(valCol)).as("__tot"))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = stats.select(col("__pid"),
      coalesce(sum("__tot").over(wOff), lit(0L)).as("__off"))
    local.join(broadcast(off), "__pid")
      .withColumn(cumCol, col("__loc") + col("__off"))
      .drop("__pid", "__loc", "__off")
  }
}
