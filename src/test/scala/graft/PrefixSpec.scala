package graft

import graft.operators.Prefix
import org.apache.spark.sql.functions._

/** Direct tests for the two-phase distributed prefix sum — the operator
  * that guards t_pack's correctness at scale. The shared test session
  * runs with shuffle.partitions=4, so every case below crosses real
  * range-partition boundaries.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("running sum equals the sequential cumsum across partition boundaries") {
    val rnd = new scala.util.Random(1234)
    // shuffled insertion order: the range partitioner must re-sort it
    val rows = rnd.shuffle((1 to 5000).toList)
      .map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "v").repartition(7) // ragged input partitioning
    val got = Prefix.runningSum(df, "k", "v", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    assert(got == expected)
  }

  test("ties in the order column: cumsum is a permutation-consistent prefix") {
    // equal order keys with value 1: whatever tie order the engine
    // picks, the multiset of prefix values must be exactly 1..N
    val df = (1 to 400).map(i => ((i % 5).toLong, 1L)).toDF("k", "v")
    val cums = Prefix.runningSum(df, "k", "v", "cum")
      .select("cum").as[Long].collect().sorted.toSeq
    assert(cums == (1L to 400L))
  }

  test("negative values and an empty frame") {
    val df = Seq((1L, 5L), (2L, -7L), (3L, 2L)).toDF("k", "v")
    val got = Prefix.runningSum(df, "k", "v", "cum")
      .orderBy("k").select("cum").as[Long].collect().toSeq
    assert(got == Seq(5L, -2L, 0L))
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Prefix.runningSum(empty, "k", "v", "cum").count() == 0)
  }

  test("internal temp names never collide with input columns") {
    // a column literally named like the internal temps must survive
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "__pid")
    val out = Prefix.runningSum(df, "k", "v", "cum")
    assert(out.columns.toSet == Set("k", "v", "__pid", "cum"))
    assert(out.orderBy("k").select("cum").as[Long].collect().toSeq == Seq(10L, 30L))
    // and a pre-existing output column is an error, not a silent overwrite
    intercept[IllegalArgumentException] {
      Prefix.runningSum(Seq((1L, 1L)).toDF("k", "cum"), "k", "k", "cum")
    }
  }
}
