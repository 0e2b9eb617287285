package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale-adaptive quantizer contract: cell populations stay bounded
  * on a deliberately SKEWED corpus (the input that parks most of itself
  * in one cell of a naive fixed-k quantizer), so the within-cell
  * all-pairs work of the semantic family cannot go quadratic; and the
  * [[Similarity.semanticDedup]] `maxCellSize` guard fails loudly on the
  * unbounded assignment instead of launching the quadratic join.
  */
class AdaptiveCellsSpec extends SparkSpec {
  import spark.implicits._

  private val target = 20L
  private val bound = 2 * target // adaptiveCentroids' split threshold

  // 10 scattered one-hot-direction vectors on the LOWEST ids — the
  // deterministic lowest-k-id k-means init seeds every centroid far
  // from the heavy cluster, so the naive quantizer funnels the whole
  // cluster into whichever single centroid ends up nearest (the skew
  // trap, reproduced on purpose) — followed by 180 heavy-cluster
  // members around direction (1,1,0,...) with real internal spread
  // (a sub-quantizer CAN split them).
  private def skewed: DataFrame = {
    val scattered = (0 until 10).map { i =>
      val v = Array.fill(8)(0f)
      v(i % 8) = if (i < 8) 10f else -10f
      (i.toLong, v.toSeq)
    }
    val heavy = (0 until 180).map { i =>
      val v = Array.fill(8)(0f)
      v(0) = 1f
      v(1) = 1f
      v(2 + i % 6) = 0.2f + 0.1f * (i / 6)  // spread over 6 dims × 30 magnitudes
      (100L + i, v.toSeq)
    }
    (scattered ++ heavy).toDF("vec_id", "embedding")
  }

  private def cellCounts(df: DataFrame, cents: Seq[Array[Double]]): Seq[Long] =
    Similarity.assignCells(df, cents)
      .groupBy("cell").count().select("count").as[Long].collect().toSeq

  test("a fixed-k quantizer parks the skewed mass in one cell; adaptiveCentroids bounds it") {
    val df = skewed
    // the trap: k = 10 fixed cells, init on the 10 scattered ids —
    // the 180-member cluster lands in ONE cell
    val naive = Similarity.trainKMeans(df, k = 10, iters = 3)
    val naiveCounts = cellCounts(df, naive)
    assert(naiveCounts.max > bound,
      s"the skew trap should overfill a cell (got $naiveCounts) — test setup broke")

    val adaptive = Similarity.adaptiveCentroids(df, targetCellSize = target,
      iters = 3, trainBound = 0L, minCells = 4)
    val counts = cellCounts(df, adaptive)
    assert(counts.sum == 190L)
    assert(counts.max <= bound,
      s"adaptive cells must stay <= $bound members, got $counts")
    // the refine actually subdivided: more centroids than the derived k0
    assert(adaptive.length > 10, s"expected split centroids, got ${adaptive.length}")
  }

  test("within-cell pair work is bounded by the cell cap, not the corpus") {
    val df = skewed
    val adaptive = Similarity.adaptiveCentroids(df, targetCellSize = target,
      iters = 3, trainBound = 0L, minCells = 4)
    val counts = cellCounts(df, adaptive)
    val pairWork = counts.map(c => c * (c - 1) / 2).sum
    // every cell <= bound => pair work <= nCells * bound*(bound-1)/2;
    // the naive single-heavy-cell assignment pays 180*179/2 = 16110 on
    // the heavy cell alone
    assert(pairWork <= counts.length * bound * (bound - 1) / 2)
    assert(pairWork < 16110L,
      s"pair work $pairWork should be far below the one-heavy-cell quadratic cost")
  }

  test("semanticDedup's maxCellSize guard throws on an oversized cell and passes on bounded cells") {
    val df = skewed
    val naiveCelled = Similarity.assignCells(df,
      Similarity.trainKMeans(df, k = 10, iters = 3))
      .withColumnRenamed("cell", "label")
    val e = intercept[IllegalStateException] {
      Similarity.semanticDedup(naiveCelled, threshold = 0.99, maxCellSize = bound)
    }
    assert(e.getMessage.contains("adaptiveCentroids"))

    val okCelled = Similarity.assignCells(df,
      Similarity.adaptiveCentroids(df, targetCellSize = target,
        iters = 3, trainBound = 0L, minCells = 4))
      .withColumnRenamed("cell", "label")
    // bounded cells: the guard passes and the dedup labels every row
    val labels = Similarity.semanticDedup(okCelled, threshold = 0.99,
      maxCellSize = bound)
    assert(labels.count() == 190L)
  }
}
