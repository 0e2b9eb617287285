package graft.operators

import org.apache.spark.sql.Column
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
}
