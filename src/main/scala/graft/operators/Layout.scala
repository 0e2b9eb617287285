package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional pruning (beyond-reference,
  * 100 TB design): writing a table SORTED by a Z-order (Morton) key
  * clusters rows that are close in EVERY interleaved dimension into the
  * same parquet row groups, so min/max stats prune scans filtered on
  * any single dimension — the standard layout trick for tables queried
  * by more than one column (a plain sort prunes only its leading
  * column). Pure codegen'd bit arithmetic: usable in `sortWithinPartitions`
  * / `repartitionByRange` at write time with zero runtime cost later.
  */
object Layout {

  /** Spread the low 32 bits of `c` to the even bit positions of a long
    * (the classic magic-number cascade). */
  private def spread(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton SORT key of two NON-NEGATIVE 32-bit dimensions: bit
    * i of `a` lands at position 2i, bit i of `b` at 2i+1. Monotone per
    * dimension within fixed other-dimension prefixes — the property
    * that makes z-sorted row groups prunable on either column.
    *
    * The returned value is the Morton code XOR Long.MinValue: bit 31
    * of `b` interleaves to bit 63 — the long's SIGN bit — so the raw
    * code sorts values of `b` ≥ 2^31 (e.g. IPv4 addresses as longs)
    * BEFORE everything else under signed comparison, scattering them
    * away from their z-curve neighbors. The sign flip maps unsigned
    * code order onto signed long order, so sorting by this key is
    * correct over the full 32-bit domain. It is a sort key, not the
    * code itself — recover the code with `^ Long.MinValue` if needed. */
  def zorder2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
      .bitwiseXOR(lit(Long.MinValue))

  /** Hilbert-curve SORT key of two non-negative dimensions, each in
    * [0, 2^order): the distance along the order-`order` Hilbert curve
    * through the 2^order x 2^order grid (the standard xy→d transform —
    * per level: quadrant digit `(3·rx) XOR ry`, then reflect+swap to
    * re-orient the sub-curve). The Hilbert curve is the locality
    * upgrade over [[zorder2]]: every curve step is an ADJACENT grid
    * cell (Morton takes long diagonal jumps at power-of-two
    * boundaries), so sorted row groups cover more compact rectangles
    * and min/max pruning cuts deeper on range predicates over either
    * dimension — the reason clustering engines moved from Z-order to
    * Hilbert for multi-dim layout.
    *
    * Implemented as ONE `aggregate` higher-order fold over the level
    * sequence carrying (x, y, d) in a struct — an unrolled per-level
    * expression would substitute x/y into themselves and grow the
    * Catalyst tree exponentially (3^order nodes; order 10 OOMs the
    * analyzer), while the fold's lambda body is a constant-size tree
    * evaluated `order` times per row. The result is at most
    * 2^(2·order), so order ≤ 31 keeps the key a positive long with no
    * sign-bit gymnastics. */
  def hilbert2(a: Column, b: Column, order: Int = 16): Column = {
    require(order >= 1 && order <= 31, "hilbert2: order must be in [1, 31]")
    aggregate(
      sequence(lit(order - 1), lit(0), lit(-1)),
      struct(a.cast("long").as("x"), b.cast("long").as("y"), lit(0L).as("d")),
      (acc, level) => {
        val s = call_function("shiftleft", lit(1L), level.cast("int"))
        val x = acc.getField("x"); val y = acc.getField("y")
        val rx = when(x.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val ry = when(y.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val nd = acc.getField("d") + s * s * (lit(3L) * rx).bitwiseXOR(ry)
        // re-orient: ry=0 reflects (when rx=1) then swaps x/y
        val nx = when(ry === 0, when(rx === 1, s - 1 - y).otherwise(y)).otherwise(x)
        val ny = when(ry === 0, when(rx === 1, s - 1 - x).otherwise(x)).otherwise(y)
        struct(nx.as("x"), ny.as("y"), nd.as("d"))
      },
      acc => acc.getField("d"))
  }

  /** [[hilbert2]] as UNROLLED, CODEGEN'D per-level projections (r19,
    * guide §4 "eliminate non-codegen expressions in the hot path"): the
    * fold form's lambda is a HigherOrderFunction, which whole-stage
    * codegen cannot compile — every row pays `order` INTERPRETED
    * Catalyst evaluations plus a struct allocation per level (measured
    * 7× slower than the identical-shape Morton projection on the same
    * table). Naive unrolling of one Column is impossible (x/y
    * substitute into themselves — 3^order tree, the reason the fold
    * exists), but over a DATAFRAME each level can stage x/y/d/rx/ry as
    * ATTRIBUTES: two chained projections per level, tree size linear in
    * `order`, everything plain CASE/bit arithmetic inside one
    * WholeStageCodegen span. CollapseProject keeps the stages because
    * each staged alias is referenced more than once and is non-cheap
    * (the [[graft.functions.Text.shinglesOf]] staging rule). Arithmetic
    * is the fold's, level for level — LayoutSpec pins value equality
    * against [[hilbert2]] and the q32 oracle pins it against DuckDB.
    *
    * Returns `df` with `keyName` appended; `__h`-prefixed scratch
    * columns are dropped. */
  def hilbert2Staged(df: DataFrame, x: Column, y: Column, keyName: String,
                     order: Int = 16): DataFrame = {
    require(order >= 1 && order <= 31, "hilbert2Staged: order must be in [1, 31]")
    val keep = df.columns.map(col).toSeq
    var cur = df.select(keep ++ Seq(
      x.cast("long").as("__hx"), y.cast("long").as("__hy"),
      lit(0L).as("__hd")): _*)
    (order - 1 to 0 by -1).foreach { level =>
      val s = lit(1L << level)
      cur = cur.select(keep ++ Seq(
        col("__hx"), col("__hy"), col("__hd"),
        when(col("__hx").bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L)).as("__rx"),
        when(col("__hy").bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L)).as("__ry")): _*)
      cur = cur.select(keep ++ Seq(
        when(col("__ry") === 0,
          when(col("__rx") === 1, s - 1 - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")).as("__hx"),
        when(col("__ry") === 0,
          when(col("__rx") === 1, s - 1 - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")).as("__hy"),
        (col("__hd") + s * s * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
          .as("__hd")): _*)
    }
    cur.select(keep :+ col("__hd").as(keyName): _*)
  }

  /** Write `df` CLUSTERED by a curve key — the read-side payoff of
    * [[zorder2]]/[[hilbert2]]: `repartitionByRange` on the key makes
    * files cover disjoint curve ranges, `sortWithinPartitions` makes
    * every parquet ROW GROUP a contiguous curve segment, and because
    * the space-filling curve preserves locality in EVERY interleaved
    * dimension, each row group's min/max column statistics become
    * tight on each dimension individually. A later scan filtered on
    * either (or both) dimensions then skips the non-matching row
    * groups at the parquet reader — the predicate never needs to
    * mention the curve key, which is a write-time artifact and is not
    * stored. ScaleSpec measures the effect: a 2-D range predicate
    * reads a fraction of the row groups the unclustered twin reads.
    *
    * `files` > 0 pins the output file count (range partitions);
    * `rowGroupBytes` > 0 sets `parquet.block.size` — at 100 TB leave
    * it default (128 MB row groups), in tests set it small so a small
    * fixture still spans many prunable row groups. */
  def writeClustered(df: DataFrame, path: String, key: Column,
                     files: Int = 0, rowGroupBytes: Long = 0L): Unit = {
    val ranged =
      if (files > 0) df.repartitionByRange(files, key)
      else df.repartitionByRange(key)
    val writer = ranged.sortWithinPartitions(key)
      .write.mode("overwrite")
    (if (rowGroupBytes > 0)
       writer.option("parquet.block.size", rowGroupBytes.toString)
     else writer)
      .parquet(path)
  }
}
