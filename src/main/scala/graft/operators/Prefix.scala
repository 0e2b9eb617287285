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
  */
object Prefix {

  /** First name in `base`, `base_`, `base__`, … not present in `taken`
    * (internal temp columns must never collide with input columns — a
    * silent overwrite would corrupt the result with no error). */
  private def freshName(base: String, taken: Set[String]): String =
    Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()

  /** Running sum of `valCol` in global `orderCol` order, emitted as
    * `cumCol` (inclusive prefix). Requires `orderCol` to be globally
    * unique only if ties must be deterministic — ties within a value
    * are ordered by their partition-local position, like any SQL
    * cumulative window.
    *
    * The range-partitioned input is materialized ONCE (eager
    * `localCheckpoint`) before the two phase-2 branches read it. This is
    * a correctness requirement, not a cache optimization: both branches
    * tag rows with `spark_partition_id()`, and without a shared
    * materialization each branch would run its own range exchange with
    * independently sampled boundaries (the sampler is seeded per RDD id)
    * — the partition ids could diverge between the local-cumsum branch
    * and the offsets branch and the prefix would be silently wrong
    * whenever Catalyst exchange reuse fails to fire (disabled conf, or
    * non-canonicalized twins). The checkpointed blocks are reclaimed by
    * the ContextCleaner when the result goes out of scope. */
  def runningSum(df: DataFrame, orderCol: String, valCol: String,
                 cumCol: String): DataFrame = {
    require(!df.columns.contains(cumCol),
      s"runningSum output column '$cumCol' already exists in the input")
    val taken = df.columns.toSet
    val pid = freshName("__pid", taken)
    val loc = freshName("__loc", taken)
    val tot = freshName("__tot", taken)
    val off = freshName("__off", taken)
    val parts = Dedup.truncate(df.repartitionByRange(col(orderCol))
      .withColumn(pid, spark_partition_id()), eager = true)
    val w = Window.partitionBy(pid).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn(loc, sum(col(valCol)).over(w))
    // per-partition totals → exclusive prefix offsets (window over P rows)
    val stats = parts.groupBy(pid).agg(sum(col(valCol)).as(tot))
    val wOff = Window.orderBy(pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = stats.select(col(pid),
      coalesce(sum(tot).over(wOff), lit(0L)).as(off))
    local.join(broadcast(offs), pid)
      .withColumn(cumCol, col(loc) + col(off))
      .drop(pid, loc, off)
  }
}
