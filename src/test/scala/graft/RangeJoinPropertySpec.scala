package graft

import graft.operators.{RangeJoin, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks (deterministic seeded samples, the SketchPropertySpec
  * pattern) for the round-12 operators. The gates pin exact values on
  * one fixture; these pin the STRUCTURAL guarantees — θ-join equality,
  * exactly-once emission, width/cap invariance — on adversarial random
  * inputs the gates never saw: clustered starts (hot buckets),
  * zero-length and touching intervals, negative domains, interval sets
  * whose giant rows force the overflow legs on one or both sides, and
  * vector corpora with planted near-clones across every band pattern.
  */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // interval generator: clustered starts around a few hubs (hot
  // buckets), lengths from empty through giant, negative domain
  private def intervals(n: Int, seed: Long, idBase: Long): Seq[(Long, Long, Long)] = {
    val hubs = Seq(-500L, -37L, 0L, 64L, 1000L)
    val gen = for {
      hub <- Gen.oneOf(hubs)
      off <- Gen.choose(-60L, 60L)
      len <- Gen.oneOf(0L, 1L, 2L, 63L, 64L, 65L, 500L, 100000L)
    } yield (hub + off, hub + off + len)
    samples(gen, n, seed).zipWithIndex.map { case ((s, e), i) =>
      (idBase + i, s, e)
    }
  }

  test("pointInInterval == naive theta-join across widths and caps on adversarial random inputs") {
    val pts = samples(Gen.choose(-700L, 1300L), 400, seed = 11L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
    for (round <- 0 until 3) {
      val ivs = intervals(60, seed = 100L + round * 1000, idBase = 10000L)
      val expected = (for {
        (pid, p) <- pts; (iid, s, e) <- ivs
        if p >= s && p < e
      } yield (pid, iid)).toSet
      for (w <- Seq(3L, 64L, 4096L); cap <- Seq(1L, 64L, 1 << 20)) {
        val rows = RangeJoin.pointInInterval(
            pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
            "p", "s", "e", bucketWidth = w, maxBucketsPerInterval = cap)
          .select("pid", "iid").as[(Long, Long)].collect()
        assert(rows.length == rows.toSet.size,
          s"duplicate match at w=$w cap=$cap round=$round")
        assert(rows.toSet == expected, s"w=$w cap=$cap round=$round")
      }
    }
  }

  test("intervalOverlap == naive theta-join, exactly-once, with giants forced on either side") {
    for (round <- 0 until 3) {
      val ls = intervals(50, seed = 31L + round * 977, idBase = 0L)
      val rs = intervals(50, seed = 77L + round * 977, idBase = 5000L)
      val expected = (for {
        (lid, a, b) <- ls; (rid, c, d) <- rs
        if b > a && d > c && a < d && c < b
      } yield (lid, rid)).toSet
      // cap 4 at width 64 makes the 500/100000-length rows giant on
      // BOTH sides (overflow legs live); the huge cap disables them
      for (w <- Seq(8L, 64L); cap <- Seq(4L, 1L << 40)) {
        val rows = RangeJoin.intervalOverlap(
            ls.toDF("lid", "ls", "le"), rs.toDF("rid", "rs", "re"),
            "ls", "le", "rs", "re", bucketWidth = w,
            maxBucketsPerInterval = cap)
          .select("lid", "rid").as[(Long, Long)].collect()
        assert(rows.length == rows.toSet.size,
          s"duplicate pair at w=$w cap=$cap round=$round")
        assert(rows.toSet == expected, s"w=$w cap=$cap round=$round")
      }
    }
  }

  test("hammingBandedPairs == brute force below the pigeonhole bound on random corpora with planted clones") {
    val rnd = new scala.util.Random(1213)
    for (round <- 0 until 2) {
      val base = (0 until 30).map(i =>
        ((round * 100 + i).toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      // plant clones at every flip-count 0..7 relative to random hosts
      val clones = (0 to 7).map { f =>
        val (hid, hv) = base(rnd.nextInt(base.size))
        val flips = rnd.shuffle((0 until 64).toList).take(f).toSet
        ((round * 100 + 50 + f).toLong,
          hv.zipWithIndex.map { case (v, i) => if (flips(i)) -v else v })
      }
      val vecs = (base ++ clones).toDF("vec_id", "embedding")
      val sigs = vecs.select(col("vec_id"),
        Similarity.signBits(col("embedding"), 64).as("sig"))
      val brute = sigs.as("a").join(sigs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          Similarity.hammingDist(col("a.sig"), col("b.sig")).as("h"))
        .filter(col("h") <= 7).as[(Long, Long, Long)].collect().toSet
      for (bands <- Seq(8, 16)) { // maxHamming 7 < bands ⇒ EXACT
        val rows = Similarity.hammingBandedPairs(vecs, dim = 64,
            maxHamming = 7, bands = bands)
          .as[(Long, Long, Long)].collect()
        assert(rows.length == rows.toSet.size,
          s"duplicate pair at bands=$bands round=$round")
        assert(rows.toSet == brute, s"bands=$bands round=$round")
      }
    }
  }

  test("decodeStats matches the synthesize contract on a random id sample incl. negatives") {
    import graft.operators.MultiModal
    val ids = samples(Gen.choose(-50L, 2000L), 40, seed = 555L).distinct
    val stats = MultiModal.decodeStats(MultiModal.synthesize(ids.toDF("doc_id")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    def mod(a: Long, m: Int) = java.lang.Math.floorMod(a, m.toLong).toInt
    ids.foreach { id =>
      val (w, h) = (8 + mod(id, 9), 6 + mod(id, 7))
      val nf = if (mod(id, 5) == 0) 2 + mod(id, 3) else 1
      assert(stats(id) == ((w, h, nf, w.toLong * h)), s"id=$id")
    }
  }
}
