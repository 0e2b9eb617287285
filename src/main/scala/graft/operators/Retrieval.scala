package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval (beyond-reference, north star): combine
  * independently-ranked retrieval legs — a BM25 lexical leg
  * ([[TextStats.bm25TopK]]) and a vector leg
  * ([[Similarity.bruteForceTopK]] or any ANN twin) — into one hybrid
  * ranking without score calibration. This is the standard "hybrid
  * search" composition for retrieval-augmented pipelines and
  * retrieval-based decontamination.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * score(d) = Σ over legs of 1/(kRrf + rank_leg(d)); a doc absent
    * from a leg contributes nothing from it. RRF needs only RANKS, so
    * wildly different score scales (BM25 vs cosine) fuse without
    * normalization — the reason it is the default hybrid combiner.
    *
    * Each input leg must carry `(id, rnk)` (extra columns are ignored);
    * legs are expected to be top-N results, i.e. already bounded. A leg
    * that violates the one-row-per-id contract is collapsed to each
    * id's BEST (minimum) rank before fusing — without that guard a
    * duplicated id would multiply rows through the full-outer join
    * chain and silently corrupt every doc's fused score.
    *
    * Determinism: the per-leg contributions are combined as a FIXED
    * left-to-right coalesce chain over a full-outer join (not a
    * `sum()` over a union, whose partial-aggregation order would be
    * partitioning-dependent for >2 legs), and the final ordering uses
    * the ROUNDED score with the id as tie-break — so the fused top-k
    * is reproducible bit-for-bit across engines and re-runs.
    *
    * Scale: the legs do the heavy lifting (BM25's query-term filter,
    * the ANN index's cell probes); fusion itself touches ≤ N·legs rows
    * — the full-outer joins and the TakeOrdered top-k run on
    * driver-trivial cardinalities no matter the corpus size. */
  def rrfFuse(legs: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse: need at least one ranked leg")
    val contribs = legs.zipWithIndex.map { case (df, i) =>
      // min(rnk) per id: enforces the one-row-per-id leg contract
      // deterministically (duplicate ids keep their best rank); legs
      // are top-N bounded so this agg is driver-trivial
      df.groupBy(col("id"))
        .agg(min(col("rnk").cast("double")).as("__rnk"))
        .select(col("id"),
          (lit(1.0) / (lit(kRrf.toDouble) + col("__rnk"))).as(s"c_$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = contribs.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduce(_ + _)
    // top-k as TakeOrdered over the (bounded) fused set; the
    // unpartitioned rank window then runs over k rows only
    val w = Window.orderBy(col("score").desc, col("id"))
    joined.select(col("id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("id"), col("score"))
  }
}
