package graft

import graft.operators.{AsOfJoin, Dedup, Retrieval, Similarity}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Operator-level edge cases on crafted fixtures (complement to the
  * sf0.01 oracle gate, which covers the happy path at table scale).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof backward: picks latest at-or-before, inclusive ties, inner drops unmatched") {
    val left = Seq(
      (1L, "k1", t("2024-01-01 10:00:00")),  // after both rights → r2
      (2L, "k1", t("2024-01-01 09:00:00")),  // exactly at r2 → inclusive
      (3L, "k1", t("2024-01-01 07:00:00")),  // before all rights → dropped
      (4L, "k2", t("2024-01-01 10:00:00"))   // no k2 rights → dropped
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", t("2024-01-01 08:00:00"), 100L),
      ("k1", t("2024-01-01 09:00:00"), 200L)
    ).toDF("k", "rts", "payload")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("payload"))
      .select("id", "payload").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 200L, 2L -> 200L))
  }

  test("asof backward outer keeps unmatched lefts with null payload") {
    val left = Seq((1L, "k", t("2024-01-01 07:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("k", t("2024-01-01 08:00:00"), 5L)).toDF("k", "rts", "p")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("p"), inner = false)
    assert(out.count() == 1 && out.filter(col("p").isNull).count() == 1)
  }

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "different doc")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("line dedup keeps first occurrence corpus-wide, preserves order") {
    val docs = Seq(
      (1L, "alpha\nshared\nbeta"),
      (2L, "shared\ngamma"),      // "shared" already seen in doc 1
      (3L, "gamma\ndelta")        // "gamma" already seen in doc 2
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha\nshared\nbeta", 3L, 3L),
      (2L, "gamma", 1L, 2L),
      (3L, "delta", 1L, 2L)))
  }

  test("line dedup drops boilerplate lines over maxFreq entirely; empty doc survives") {
    val docs = Seq(
      (1L, "boiler\nkeep1"), (2L, "boiler\nkeep2"),
      (3L, "boiler\nkeep3"), (4L, "boiler")   // "boiler" freq 4 > maxFreq 3
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, maxFreq = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "keep1", 1L, 2L), (2L, "keep2", 1L, 2L),
      (3L, "keep3", 1L, 2L), (4L, "", 0L, 1L)))
  }

  test("line dedup: blank lines are structure — kept everywhere, exempt from maxFreq; null text → (\"\",0,0)") {
    val docs = Seq(
      (1L, Some("para one\n\npara two")),
      (2L, Some("para one\n\npara three")),  // blank line repeats corpus-wide
      (3L, Some("\n\n")),                    // only structure, nothing to drop
      (4L, None: Option[String])             // null text must not poison n_lines
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, maxFreq = 1).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // "para one" (freq 2 > maxFreq 1) is dropped from BOTH docs, but
    // every blank line survives untouched
    assert(out == Seq(
      (1L, "\npara two", 2L, 3L),
      (2L, "\npara three", 2L, 3L),
      (3L, "\n\n", 3L, 3L),
      (4L, "", 0L, 0L)))
  }

  test("line dedup is partition-invariant: same output at 1 and 13 input partitions") {
    val docs = (1L to 40L).map { i =>
      (i, s"shared line\nunique $i\ncommon ${i % 4}")
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.dedupLines(df, maxFreq = 10).orderBy("doc_id")
        .as[(Long, String, Long, Long)].collect().toSeq
    assert(run(docs.coalesce(1)) == run(docs.repartition(13)))
  }

  test("line dedup separator is taken literally, not as regex") {
    val docs = Seq((1L, "a.b"), (2L, "b.c")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, sep = ".").orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "a.b", 2L, 2L), (2L, "c", 1L, 2L)))
  }

  test("ngram jaccard finds the overlapping pair only") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),   // shares most 3-grams with 1
      (3L, "q w e r t y u i")    // disjoint
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("ppjoin prefix filter equals the all-shingles jaccard join, threshold sweep") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "a b c d e f g h"),      // exact dup of 1
      (4L, "q w e r t y u i"),
      (5L, "q w e r t y u o p"),    // size-asymmetric near-dup of 4
      (6L, "z z z")                 // degenerate single-shingle doc
    ).toDF("doc_id", "text")
    for (th <- Seq(0.3, 0.5, 0.7, 0.9, 1.0)) {
      val ref = Dedup.ngramJaccard(docs, threshold = th).orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
      val pp = Dedup.jaccardJoinPrefix(docs, threshold = th).orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
      assert(pp == ref, s"threshold $th")
    }
  }

  test("ppjoin respects the hot-shingle cap identically to ngramJaccard") {
    val boiler = "common header line always present"
    val docs = (1L to 12L).map(i =>
      (i, s"$boiler unique tail ${"w" * i.toInt} $i $i $i")).toDF("doc_id", "text")
    for (th <- Seq(0.2, 0.6)) {
      val ref = Dedup.ngramJaccard(docs, threshold = th, maxDocFreq = Some(5L))
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      val pp = Dedup.jaccardJoinPrefix(docs, threshold = th, maxDocFreq = Some(5L))
        .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
      assert(pp == ref, s"threshold $th")
    }
  }

  test("ppjoin on empty and pairless inputs yields no rows") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardJoinPrefix(emptyDocs, 0.5).count() == 0)
    val disjoint = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    assert(Dedup.jaccardJoinPrefix(disjoint, 0.5).count() == 0)
  }

  test("minhash LSH catches near-identical docs and skips disjoint ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and once"),
      (3L, "completely unrelated content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("minhash candidates are exactly-once by construction (first matching band, no distinct)") {
    // identical docs collide in EVERY band; a duplicated candidate
    // stream would multiply the shingle-intersection count in the
    // verify and push jaccard past 1.0 — a single row at exactly 1.0
    // proves the pair was emitted from its first matching band only
    val docs = Seq(
      (1L, "x y z w v u t s r q"),
      (2L, "x y z w v u t s r q"),
      (3L, "different words entirely apart from the others here")
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashLsh(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 2L, 1.0)))
  }

  test("simhash: identical docs get identical signatures; disjoint docs differ") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "zzz yyy xxx www")
    ).toDF("doc_id", "text")
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("banded simhash pairs equals all-pairs result (pigeonhole completeness)") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) s"shared common text block number ${i / 10}"
          else s"unique content item $i with extra words")).toDF("doc_id", "text")
    val sig = Dedup.simhash(docs)
    val banded = Dedup.simhashBandedPairs(sig, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.simhashPairs(sig, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty)
  }

  test("random projection: seeded sign sums, partition-invariant, seed-sensitive") {
    val vecs = Seq((1L, Array.fill(16)(1f)), (2L, Array.tabulate(16)(j => j.toFloat)))
      .toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      Similarity.randomProject(df, inDim = 16, outDim = 4, seed = seed)
        .as[(Long, Int, Double)].collect().toSet
    val out = run(vecs, "rp")
    // all-ones vector: out[i] = sum of row i's ±1 signs — an even
    // integer in [-16, 16] (16 summands of ±1)
    val ones = out.filter(_._1 == 1L).map(_._3)
    assert(ones.size == 4 && ones.forall(v => v == math.rint(v) && v.abs <= 16
      && (v.toLong % 2 == 0)))
    assert(run(vecs.repartition(5), "rp") == out)
    assert(run(vecs, "rp2") != out)
  }

  test("cosine is 1 for parallel vectors, 0 for orthogonal") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f)),
      (Array(1f, 0f), Array(0f, 3f))
    ).toDF("a", "b")
    val cs = df.select(round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .as[Double].collect().toSeq
    assert(cs == Seq(1.0, 0.0))
  }

  test("semanticDedup: transitive cluster keeps one canonical, singletons keep themselves") {
    // chain 1≈2, 2≈3 (1·3 below threshold) in cell 0 — transitivity
    // must fold all three onto canonical 1, the case a pairwise
    // drop-larger-id rule gets wrong; 4 is orthogonal (own survivor);
    // 5 parallels 1 but sits in another cell (blocking boundary —
    // semantically a miss the quantizer owns, mechanically a keep)
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.45f, 0f), 0),    // cos(1,2)=0.894, cos(2,3)=0.867
      (3L, Array(0.45f, 0.9f, 0f), 0),    // cos(1,3)=0.447 < 0.8
      (4L, Array(0f, 0f, 1f), 0),
      (5L, Array(1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedup(vecs, threshold = 0.8)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true)))
  }

  test("brute-force topk returns k best, excludes self, deterministic tie-break") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0.01f)), (2L, Array(1f, 0.02f)),
      (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 2)
      .select("rnk", "cand_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L)))
  }

  test("ivf probes only the query's cell") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0.1f), 0),
      (2L, Array(1f, 0.001f), 1)  // closer, but different cell → invisible
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfTopK(vecs.filter(col("vec_id") === 0), vecs, k = 5)
      .select("cand_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("linkJaccard: cross-table fuzzy match on name variants, blocking cap drops hot trigrams") {
    val master = Seq((1L, "Acme Corporation"), (2L, "Globex Inc"), (3L, "Initech LLC"))
      .toDF("id", "name")
    val batch = Seq((10L, "acme corporation"), (11L, "Acme Corporatian"), // typo
      (12L, "Wayne Enterprises")).toDF("id", "name")
    val out = Dedup.linkJaccard(batch, master, threshold = 0.5,
        textCol = "name", idCol = "id")
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // case-normalized exact + the typo both link to Acme; Wayne links nowhere
    assert(out == Set((10L, 1L), (11L, 1L)))
    // a blocking cap below every trigram's combined frequency empties the link set
    val capped = Dedup.linkJaccard(batch, master, threshold = 0.1,
        textCol = "name", idCol = "id", maxKeyFreq = Some(0L))
    assert(capped.count() == 0)
  }

  test("keepBest: highest-score cluster member survives, id tie-break, singletons survive") {
    val docs = Seq((1L, 10L), (2L, 99L), (3L, 50L), (4L, 1L), (5L, 7L), (6L, 7L))
      .toDF("doc_id", "q")
    // chain 1-2-3 (transitive cluster), pair 5-6 (tied scores), 4 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.keepBest(docs, pairs, scoreCol = "q")
      .select("id", "cluster", "survivor_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 2L, false), // doc 2 outscores the whole chain
      (2L, 1L, 2L, true),
      (3L, 1L, 2L, false),
      (4L, 4L, 4L, true),  // singleton survives trivially
      (5L, 5L, 5L, true),  // tie 7 == 7 → lower id
      (6L, 5L, 5L, false)))
  }

  test("signBits packs sign bits into 32-bit words; hamming counts differing signs") {
    // dims 0,2 positive, 1,3 non-positive (0 counts as clear), plus a
    // second word: dim 33 positive → word 1 bit 1
    val vecs = Seq(
      (0L, Array.tabulate(40)(i => if (i == 0 || i == 2 || i == 33) 1f else -1f)),
      (1L, Array.tabulate(40)(i => if (i == 0 || i == 33) 1f else if (i == 5) 0f else -1f))
    ).toDF("vec_id", "embedding")
    val sigs = vecs.select(col("vec_id"),
        Similarity.signBits(col("embedding"), 40).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == Seq((1L << 0) | (1L << 2), 1L << 1))
    assert(sigs(1L) == Seq(1L << 0, 1L << 1)) // exact 0 at dim 5 stays clear
    val ham = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(Similarity.hammingDist(
        Similarity.signBits(col("a.embedding"), 40),
        Similarity.signBits(col("b.embedding"), 40)))
      .as[Long].head()
    assert(ham == 1L) // only dim 2 differs
  }

  test("hammingTopK with full-corpus shortlist equals brute force exactly") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    // shortlist >= corpus: the coarse stage keeps everything, so the
    // cosine rerank must reproduce brute force bit-for-bit
    val ham = Similarity.hammingTopK(queries, vecs, dim = 64, k = 3, shortlist = 60)
      .select("query_id", "rnk", "cand_id", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 3)
      .select("query_id", "rnk", "cand_id", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(ham == brute)
    // and with a tight shortlist the coarse Hamming stage still finds
    // the exact duplicate (hamming 0 → always shortlisted → cosine 1 top)
    val withDup = vecs.union(Seq((100L,
      vecs.filter(col("vec_id") === 2).select("embedding")
        .as[Array[Float]].head())).toDF("vec_id", "embedding"))
    val top = Similarity.hammingTopK(withDup.filter(col("vec_id") === 100L),
        withDup, dim = 64, k = 1, shortlist = 5)
      .select("cand_id", "ham").as[(Long, Long)].head()
    assert(top == (2L, 0L))
  }

  test("hammingBandedPairs is EXACT below the pigeonhole bound and validates its banding constraints") {
    val rnd = new scala.util.Random(23)
    val base = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    // plant close pairs: clones of vec 3 with 2 and 6 sign flips —
    // random 64-dim pairs sit near hamming ~32, far above any bound
    def flipped(src: Array[Float], flips: Seq[Int]): Array[Float] =
      src.zipWithIndex.map { case (v, i) => if (flips.contains(i)) -v else v }
    val vecs = (base ++ Seq(
      (100L, flipped(base(3)._2, Seq(0, 40))),
      (101L, flipped(base(3)._2, Seq(1, 17, 33, 40, 55, 63))))
      ).toDF("vec_id", "embedding")
    // brute-force pair truth at the same threshold
    val sigs = vecs.select(col("vec_id"),
      Similarity.signBits(col("embedding"), 64).as("sig"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.hammingDist(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= 7)
      .as[(Long, Long, Long)].collect().toSet
    // maxHamming 7 < bands 8 → pigeonhole: NO missed pairs, exact
    val banded = Similarity.hammingBandedPairs(vecs, dim = 64,
        maxHamming = 7, bands = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute)
    assert(banded.contains((3L, 100L, 2L)) && banded.contains((3L, 101L, 6L)))
    // the clones differ from each other by the symmetric difference of
    // their flip sets ({0,1,17,33,55,63} — 40 cancels): 6 bits
    assert(banded.contains((100L, 101L, 6L)))
    // EXACTLY-ONCE emission (not just set equality): an identical
    // clone matches vec 3 in all 8 bands — with the old distinct-based
    // form it was generated 8 times then deduped; the first-matching-
    // band rule must emit it (and every other pair) exactly once
    val withClone = (base ++ Seq((200L, base(3)._2))).toDF("vec_id", "embedding")
    val emitted = Similarity.hammingBandedPairs(withClone, dim = 64,
        maxHamming = 7, bands = 8)
      .as[(Long, Long, Long)].collect()
    assert(emitted.length == emitted.toSet.size, "a pair was emitted twice")
    assert(emitted.contains((3L, 200L, 0L)))
    // a hot-bucket cap only ever removes pairs, never invents them —
    // and under the cap the survivors are STILL exactly-once and
    // exactly the pairs matching in >= 1 surviving (non-hot) band
    val cappedRows = Similarity.hammingBandedPairs(vecs, dim = 64,
        maxHamming = 7, bands = 8, maxBucket = Some(1L))
      .as[(Long, Long, Long)].collect()
    val capped = cappedRows.toSet
    assert(cappedRows.length == capped.size)
    assert(capped.subsetOf(banded))
    // the degenerate-skew FALLBACK (hot set too large for a literal
    // predicate — forced here with maxHotLiteral = 0) must produce the
    // IDENTICAL capped pair set via the broadcast-anti-join + distinct
    // form
    val fallback = Similarity.hammingBandedPairs(vecs, dim = 64,
        maxHamming = 7, bands = 8, maxBucket = Some(1L), maxHotLiteral = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(fallback == capped,
      "fallback and literal hot-set paths must agree exactly")
    // constraint checks: band count must divide dim, width must divide
    // the 32-bit signature word
    intercept[IllegalArgumentException](
      Similarity.hammingBandedPairs(vecs, dim = 64, maxHamming = 3, bands = 7))
    intercept[IllegalArgumentException](
      Similarity.hammingBandedPairs(vecs, dim = 96, maxHamming = 3, bands = 8))
  }

  test("count-min sketch never underestimates and is exact when collision-free") {
    import graft.operators.Sketches
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++ Seq("d"))
      .toDF("k")
    // 4 keys in 1024 cells: collision-free at this scale → every
    // estimate equals the exact count (and rnk breaks the tie by key)
    val wide = Sketches.cmsVerified(df, "k", topN = 4, depth = 4, width = 1024)
      .select("k", "cnt", "cms_est", "ge_ok")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(wide == Set(("a", 30L, 30L, true), ("b", 20L, 20L, true),
      ("c", 5L, 5L, true), ("d", 1L, 1L, true)))
    // width 1: every key lands in the one cell → the estimate collapses
    // to the corpus total for every key — still an upper bound (ge_ok),
    // never an underestimate
    val narrow = Sketches.cmsVerified(df, "k", topN = 4, depth = 2, width = 1)
      .select("cnt", "cms_est", "ge_ok").as[(Long, Long, Boolean)].collect()
    assert(narrow.length == 4)
    assert(narrow.forall { case (_, est, ge) => est == 56L && ge })
    // the counts-table build must produce the IDENTICAL sketch as the
    // row-stream build (cell counts are Σ over keys either way)
    val counts = df.groupBy("k").agg(count(lit(1)).as("c"))
    val fromRows = Sketches.cmsTable(df, "k", depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val fromCounts = Sketches.cmsTableFromCounts(counts, "k", "c", depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromRows == fromCounts)
  }

  test("pointInInterval range join equals the naive theta-join on boundaries, overlaps, negatives") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(31)
    val pts = (0 until 300).map(i => (i.toLong, (rnd.nextInt(400) - 100).toLong))
    val ivs = (0 until 40).map { i =>
      val s = (rnd.nextInt(400) - 120).toLong
      val len = Seq(0L, 1L, 7L, 50L, 200L)(i % 5) // incl. EMPTY intervals
      (1000L + i, s, s + len)
    }
    // ground truth in plain Scala: end-exclusive containment
    val expected = (for {
      (pid, p) <- pts
      (iid, s, e) <- ivs
      if p >= s && p < e
    } yield (pid, iid)).toSet
    // several bucket widths, incl. one larger than every interval and
    // one smaller than the shortest non-empty one — results must be
    // IDENTICAL (bucketWidth is a cost knob, never a semantics knob)
    for (w <- Seq(1L, 8L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
          "p", "s", "e", bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"bucketWidth=$w")
    }
    assert(expected.nonEmpty) // the fixture actually exercises matches
    // FRACTIONAL domain: a point inside an interval's last partial
    // bucket (10.2 in [9.0, 10.5) at width 1) sits in a bucket an
    // end−1-based top bound would never generate — the review-found
    // silent-miss case; also exercise fractional boundary exclusivity
    val fpts = Seq((1L, 10.2), (2L, 10.5), (3L, 8.9999)).toDF("pid", "p")
    val fivs = Seq((100L, 9.0, 10.5)).toDF("iid", "s", "e")
    val fgot = RangeJoin.pointInInterval(fpts, fivs, "p", "s", "e", 1L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fgot == Set((1L, 100L))) // 10.5 excluded (end), 8.9999 below start
    // reserved internal column is rejected loudly, not clobbered
    intercept[IllegalArgumentException](RangeJoin.pointInInterval(
      fpts.withColumnRenamed("p", "__bucket"), fivs, "__bucket", "s", "e", 1L))
    // ADVERSARIAL skew fixture: a domain-spanning interval that would
    // explode into ~10^18/w buckets if the operator trusted the caller
    // (r11 item #3) — the cap must route it through the broadcast leg
    // and the union of legs must equal the naive theta-join exactly
    val advIvs = ivs ++ Seq((9999L, Long.MinValue / 4, Long.MaxValue / 4))
    val advExpected = (for {
      (pid, p) <- pts
      (iid, s, e) <- advIvs
      if p >= s && p < e
    } yield (pid, iid)).toSet
    for (cap <- Seq(1L, 16L, 4096L)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), advIvs.toDF("iid", "s", "e"),
          "p", "s", "e", bucketWidth = 8L, maxBucketsPerInterval = cap)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == advExpected, s"cap=$cap")
    }
  }

  test("intervalOverlap equals the naive theta-join, exactly-once, across widths, caps and empties") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(47)
    val ls = (0 until 120).map { i =>
      val s = (rnd.nextInt(500) - 150).toLong
      val len = Seq(0L, 1L, 9L, 40L, 170L)(i % 5) // incl. EMPTY intervals
      (i.toLong, s, s + len)
    }
    val rs = (0 until 90).map { i =>
      val s = (rnd.nextInt(500) - 180).toLong
      val len = Seq(0L, 2L, 13L, 75L, 300L)(i % 5)
      (500L + i, s, s + len)
    }
    // ground truth: strict overlap of half-open intervals
    val expected = (for {
      (lid, a, b) <- ls; (rid, c, d) <- rs
      if b > a && d > c && a < d && c < b
    } yield (lid, rid)).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 8L, 64L, 1000L); cap <- Seq(2L, 4096L)) {
      val rows = RangeJoin.intervalOverlap(
          ls.toDF("lid", "ls", "le"), rs.toDF("rid", "rs", "re"),
          "ls", "le", "rs", "re", bucketWidth = w,
          maxBucketsPerInterval = cap)
        .select("lid", "rid").as[(Long, Long)].collect()
      // exactly-once BY CONSTRUCTION: no pair may appear twice even
      // when the pair co-covers many buckets (no distinct in the plan)
      assert(rows.length == rows.toSet.size, s"dup pair at w=$w cap=$cap")
      assert(rows.toSet == expected, s"w=$w cap=$cap")
    }
    // fractional domain: overlap only via the last partial bucket
    val fl = Seq((1L, 9.0, 10.5)).toDF("lid", "ls", "le")
    val fr = Seq((2L, 10.2, 11.0), (3L, 10.5, 12.0)).toDF("rid", "rs", "re")
    val fgot = RangeJoin.intervalOverlap(fl, fr, "ls", "le", "rs", "re", 1L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(fgot == Set((1L, 2L))) // [9,10.5) meets [10.2,11) but not [10.5,12)
    intercept[IllegalArgumentException](RangeJoin.intervalOverlap(
      fl.withColumnRenamed("ls", "__bucket"), fr, "__bucket", "le", "rs", "re", 1L))
  }

  test("cosine LSH finds the true nearest neighbor on clustered vectors (recall vs brute force)") {
    val rnd = new scala.util.Random(7)
    val centroids = Seq(Array.fill(32)(rnd.nextFloat() * 2 - 1),
      Array.fill(32)(rnd.nextFloat() * 2 - 1), Array.fill(32)(rnd.nextFloat() * 2 - 1))
    // 90 corpus vectors: small perturbations of the 3 centroids
    val vecs = (0 until 90).map { i =>
      val c = centroids(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 6)
    val lsh = Similarity.lshTopK(queries, vecs, k = 1, bits = 16, bands = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val recall = brute.count { case (q, c) => lsh.get(q).contains(c) }.toDouble / brute.size
    assert(recall >= 0.5, s"top-1 recall $recall too low (lsh=$lsh brute=$brute)")
    // every LSH result is at least cluster-consistent (same centroid)
    assert(lsh.forall { case (q, c) => q % 3 == c % 3 })
  }

  test("PQ: codes in range, exact duplicate is top-1 after refine, reconstruction exact on codewords") {
    // three tight clusters in 4-dim space, m=2 subspaces of 2 dims
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 1f), Array(0f, 0f, 1f, 1f))
    val vecs = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.map(x => x + (i / 3) * 0.001f))
    }.toDF("vec_id", "embedding")
    val cbs = Similarity.pqTrain(vecs, m = 2, ksub = 3, iters = 5)
    assert(cbs.length == 2 && cbs.forall(_.length == 3))
    val enc = Similarity.pqEncode(vecs, cbs)
    val codes = enc.select("code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 3)))
    // vectors of one cluster share the same code word per subspace
    val byCluster = enc.withColumn("cl", col("vec_id") % 3)
      .select("cl", "code").as[(Long, Seq[Int])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    assert(byCluster.values.forall(_ == 1), s"cluster code spread: $byCluster")
    // a query identical to vector 0: with refine, its near-identical
    // cluster-mates rank first by exact distance
    val q = vecs.filter(col("vec_id") === 0L)
    val top = Similarity.pqTopK(q, vecs, k = 3, cbs, shortlist = 10)
      .select("cand_id").as[Long].collect().toSeq
    assert(top == Seq(3L, 6L, 9L), s"expected the cluster-mates of 0, got $top")
  }

  test("k-means trainer recovers planted clusters; trained IVF reaches brute-force recall") {
    val rnd = new scala.util.Random(11)
    val centroids = Seq.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 120).map { i =>
      val c = centroids(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
    // trained cells must be cluster-pure: every planted cluster lands in
    // exactly one learned cell
    val cents = Similarity.trainKMeans(vecs, k = 3, iters = 4)
    assert(cents.size == 3 && cents.forall(_.length == 16))
    val cellOf = Similarity.assignCells(vecs, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    (0 until 3).foreach { g =>
      val cells = (0 until 120).filter(_ % 3 == g).map(i => cellOf(i.toLong)).distinct
      assert(cells.size == 1, s"cluster $g split across cells $cells")
    }
    // trained IVF top-1 matches brute force on cluster-separable data
    val queries = vecs.filter(col("vec_id") < 6)
    val ivf = Similarity.ivfTrainedTopK(queries, vecs, k = 1, cells = 3, iters = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val recall = brute.count { case (q, c) => ivf.get(q).contains(c) }.toDouble / brute.size
    assert(recall >= 0.8, s"trained-IVF top-1 recall $recall (ivf=$ivf brute=$brute)")
  }

  test("bounded training: sampled trainer still recovers planted clusters; bound below k throws") {
    val rnd = new scala.util.Random(13)
    val centroids = Seq.fill(3)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 300).map { i =>
      val c = centroids(i % 3)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
    // trainBound=100 < n=300: the trainer draws the deterministic hash
    // sample yet must still land cluster-pure cells on separable data
    val cents = Similarity.trainKMeans(vecs, k = 3, iters = 4, trainBound = 100)
    val cellOf = Similarity.assignCells(vecs, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    (0 until 3).foreach { g =>
      val cells = (0 until 300).filter(_ % 3 == g).map(i => cellOf(i.toLong)).distinct
      assert(cells.size == 1, s"cluster $g split across cells $cells")
    }
    // bound >= n is a no-op (identical centroids to the unbounded run)
    val full = Similarity.trainKMeans(vecs, k = 3, iters = 4)
    val noop = Similarity.trainKMeans(vecs, k = 3, iters = 4, trainBound = 10000)
    assert(full.zip(noop).forall { case (a, b) => a.sameElements(b) })
    // a bound below what the init needs is a contract error, not a
    // silent mis-train
    intercept[IllegalArgumentException] {
      Similarity.trainKMeans(vecs, k = 3, iters = 1, trainBound = 2)
    }
  }

  test("composed IVF×PQ: exact duplicates rank first after refine; recall matches pure PQ on separable data") {
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 1f), Array(0f, 0f, 1f, 1f))
    val vecs = (0 until 30).map { i =>
      val c = base(i % 3)
      (i.toLong, c.map(x => x + (i / 3) * 0.001f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
    // the composed operator probes 2 of 3 cells; vector 0's cluster is
    // cell-pure so its near-identical mates must top the refined list
    val top = Similarity.ivfPqTrainedTopK(q, vecs, k = 3, cells = 3, nprobe = 2,
        m = 2, ksub = 3, coarseIters = 5, pqIters = 5, shortlist = 10)
      .select("cand_id").as[Long].collect().toSeq
    assert(top == Seq(3L, 6L, 9L), s"expected the cluster-mates of 0, got $top")
  }

  test("reliable-checkpoint option: identical labels, checkpoint files on disk, loud on missing dir") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val base = Dedup.components(pairs).orderBy("id").collect().toSeq
    // missing dir must THROW, not silently degrade to executor-local
    // blocks (only assertable while no checkpoint dir is set globally)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set("spark.graft.checkpoint.reliable", "true")
      try intercept[IllegalStateException] {
        Dedup.components(pairs).collect()
      } finally spark.conf.unset("spark.graft.checkpoint.reliable")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", dir.toString)
    try {
      val rel = Dedup.components(pairs).orderBy("id").collect().toSeq
      assert(rel == base, "reliable-checkpoint run must produce identical labels")
      val star = Dedup.componentsStar(pairs).orderBy("id").collect().toSeq
      assert(star == base, "componentsStar must agree under reliable checkpointing")
      // the truncation points really wrote reliable checkpoint FILES
      def fileCount(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(fileCount).sum else 1
      assert(fileCount(dir.toFile) > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  test("hash sampling is deterministic; train/test split is disjoint and exhaustive") {
    import graft.operators.Sampling
    val df = (1L to 2000L).toDF("id")
    val s1 = Sampling.sampleByHash(df, "id", 10).select("id").as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(df, "id", 10).select("id").as[Long].collect().toSet
    assert(s1 == s2)                       // reproducible
    assert(s1.size > 120 && s1.size < 280) // ≈10% of 2000
    val (train, test) = Sampling.trainTestSplit(df, "id", 20)
    val tr = train.select("id").as[Long].collect().toSet
    val te = test.select("id").as[Long].collect().toSet
    assert((tr & te).isEmpty && (tr | te).size == 2000)
    // growing the sample keeps earlier members (nested by construction)
    val s20 = Sampling.sampleByHash(df, "id", 20).select("id").as[Long].collect().toSet
    assert(s1.subsetOf(s20))
  }

  test("int8 quantization round-trip error is bounded by half a quantization step") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(2.0f, 1.5f, -2.0f, 0.1f))).toDF("vec_id", "embedding")
    val staged = df
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sc", greatest(array_max(transform(col("v"), abs _)), lit(1e-12)))
      .withColumn("q", transform(col("v"), x => round(x / col("sc") * 127, 0).cast("int")))
      .withColumn("deq", zip_with(col("q"), col("v"),
        (q, _) => q * col("sc") / 127.0))
      .withColumn("maxerr",
        array_max(zip_with(col("deq"), col("v"), (d, o) => abs(d - o))))
    val rows = staged.select(col("sc"), col("maxerr")).collect()
    rows.foreach { r =>
      val step = r.getDouble(0) / 127.0
      assert(r.getDouble(1) <= step / 2 + 1e-9,
        s"error ${r.getDouble(1)} exceeds half-step ${step / 2}")
    }
  }

  test("connected components cluster transitive near-dup pairs to one survivor") {
    // {(1,3),(2,3)}: 2 never appears as the larger id of a pair with a
    // smaller partner — a pairwise drop-the-larger rule would keep BOTH
    // 1 and 2; components collapse the cluster to min id 1
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs)
      .select("id", "comp").as[(Long, Long)].collect().toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    // a long chain converges within the iteration cap
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c2 = Dedup.components(chain).select("comp").distinct().as[Long].collect()
    assert(c2.toSeq == Seq(1L))
  }

  test("componentsStar equals hash-min components on seeded random graphs") {
    import scala.util.Random
    (0 until 12).foreach { g =>
      val rnd = new Random(4200 + g)
      val n = 8 + rnd.nextInt(40)
      val edges = (0 until n).map(_ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val pairs = edges.toDF("id_a", "id_b")
        val hashMin = Dedup.components(pairs, maxIter = 40, strict = true)
          .as[(Long, Long)].collect().toSet
        val star = Dedup.componentsStar(pairs)
          .as[(Long, Long)].collect().toSet
        assert(star == hashMin, s"graph seed ${4200 + g}: star != hash-min")
      }
    }
  }

  test("componentsStar converges logarithmically where hash-min needs diameter rounds") {
    // a 400-link chain: hash-min moves the label one hop per round, so
    // maxIter=10 CANNOT converge (strict throws) — the adversarial
    // pair-graph shape (chained passage overlaps) componentsStar exists
    // for. Star alternations collapse it within the default budget.
    val chain = (1L until 400L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.components(chain, maxIter = 10, strict = true)
    }
    val labels = Dedup.componentsStar(chain).as[(Long, Long)].collect()
    assert(labels.length == 400 && labels.forall(_._2 == 1L),
      "every chain node must label to component minimum 1")
  }

  test("winnow pairs find a shared passage inside otherwise-different docs") {
    val passage = "the copied boilerplate passage that appears verbatim in both documents here"
    val docs = Seq(
      (1L, s"totally original opening text before anything else. $passage and then one ending"),
      (2L, s"a different beginning altogether for this one. $passage with another closing line"),
      (3L, "nothing in common with the others at all, completely separate content entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, minShared = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // whole-doc jaccard misses it at any useful threshold (passage is
    // a minority of each doc) — the reason passage-level dedup exists
    val jac = Dedup.ngramJaccard(docs, threshold = 0.5)
    assert(jac.count() == 0)
  }

  test("winnowPairsFast (rolling hash) finds the same planted passage as the md5 form") {
    val passage = "the copied boilerplate passage that appears verbatim in both documents here"
    val docs = Seq(
      (1L, s"totally original opening text before anything else. $passage and then one ending"),
      (2L, s"a different beginning altogether for this one. $passage with another closing line"),
      (3L, "nothing in common with the others at all, completely separate content entirely")
    ).toDF("doc_id", "text")
    val fast = Dedup.winnowPairsFast(docs, minShared = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == Set((1L, 2L)))
    // same selection logic, same normalization → same pair decisions as
    // the oracled md5 form on this fixture
    val md5Form = Dedup.winnowPairs(docs, minShared = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast == md5Form)
  }

  test("sharedPassages localizes the copied span in both docs on one diagonal") {
    val prefixA = "aaaa bbbb cccc "                      // 15 chars
    val prefixB = "a different and longer beginning here " // 38 chars
    val passage = "the copied boilerplate passage that appears verbatim in both documents"
    val docs = Seq(
      (1L, prefixA + passage + " unique ending one"),
      (2L, prefixB + passage + " other closing text"),
      (3L, "nothing in common with the others at all, separate content entirely")
    ).toDF("doc_id", "text")
    val rows = Dedup.sharedPassages(docs, minPrints = 3)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    val (aStart, aEnd) = (r.getAs[Int]("a_start"), r.getAs[Int]("a_end"))
    val (bStart, bEnd) = (r.getAs[Int]("b_start"), r.getAs[Int]("b_end"))
    // spans sit inside the planted passage (1-based char offsets into
    // the normalized text; fixtures are already normalized)
    // +1: the char AFTER the passage is a space in both docs, so the
    // last shared k-gram legitimately covers it
    assert(aStart > prefixA.length && aEnd <= prefixA.length + passage.length + 1,
      s"a-span [$aStart,$aEnd] outside passage")
    assert(bStart > prefixB.length && bEnd <= prefixB.length + passage.length + 1,
      s"b-span [$bStart,$bEnd] outside passage")
    // one diagonal: the alignment shift equals the prefix-length delta
    assert(aStart - bStart == prefixA.length - prefixB.length)
    assert(aEnd - bEnd == prefixA.length - prefixB.length)
    assert(r.getAs[Long]("prints") >= 3L)
  }

  test("selectByTokenBudget: best-first inclusive cut, id tie-break, matches the global-window form") {
    import graft.operators.Sampling
    val docs = Seq(
      (1L, 0.9, 40L), (2L, 0.5, 30L), (3L, 0.7, 50L),
      (4L, 0.7, 20L), (5L, 0.1, 10L)
    ).toDF("doc_id", "score", "n_tokens")
    // rank: 1(0.9,40) → 3(0.7,+50=90) → 4(0.7 tie, higher id, +20=110)
    // → 2(0.5,+30=140) → 5(0.1,+10=150); budget 110 keeps 1,3,4 —
    // the straddling doc 2 is dropped with everything below
    val sel = Sampling.selectByTokenBudget(docs, "score", "n_tokens", budget = 110)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(sel == Map(1L -> 40L, 3L -> 90L, 4L -> 110L))
    // equals the single-window formulation on the same data
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val oracle = docs.withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") <= 110)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(sel == oracle)
    // budget below the best doc selects nothing; huge budget keeps all
    assert(Sampling.selectByTokenBudget(docs, "score", "n_tokens", 39).count() == 0)
    assert(Sampling.selectByTokenBudget(docs, "score", "n_tokens", 1000).count() == 5)
  }

  test("temperatureSample: α=1 is the identity mix, α<1 up-samples the small source, deterministic") {
    import graft.operators.Sampling
    val docs = ((1 to 8).map(i => (i.toLong, "A")) ++ Seq((9L, "B"), (10L, "B")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    // α=1: q_s = p_s ⇒ c_s = 1.0 exactly for every source
    val id = Sampling.temperatureSample(docs, "source", alpha = 1.0)
      .select("n_copies").as[Long].collect()
    assert(id.length == 10 && id.forall(_ == 1L))
    // α=0.5: c_A = (8^.5/ps)·10/8 ≈ 0.833 ⇒ A docs get 0 or 1;
    // c_B = (2^.5/ps)·10/2 ≈ 1.667 ⇒ B docs get 1 or 2 (UP-sampled)
    val t = Sampling.temperatureSample(docs, "source", alpha = 0.5)
      .select("doc_id", "source", "n_copies").as[(Long, String, Long)].collect()
    val (a, b) = t.partition(_._2 == "A")
    assert(a.forall(r => r._3 == 0L || r._3 == 1L), s"A: ${a.toSeq}")
    assert(b.forall(r => r._3 == 1L || r._3 == 2L), s"B: ${b.toSeq}")
    // deterministic: same result on re-evaluation
    val t2 = Sampling.temperatureSample(docs, "source", alpha = 0.5)
      .select("doc_id", "source", "n_copies").as[(Long, String, Long)].collect()
    assert(t.sortBy(_._1).toSeq == t2.sortBy(_._1).toSeq)
    // epochs scales the mass: every doc gains exactly +1 copy per
    // whole epoch (floor shifts by 1, the fractional draw is shared)
    val e2 = Sampling.temperatureSample(docs, "source", alpha = 0.5, epochs = 2.0)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    val base = t.map(r => (r._1, r._3)).toMap
    // c doubles: frac(2c) may differ from frac(c) — only assert mass
    // grows and stays within the [⌊2c⌋, ⌈2c⌉] envelope per source
    assert(e2.values.sum > base.values.sum)
    assert(e2.filter(_._1 <= 8).values.forall(n => n == 1L || n == 2L)) // 2c_A≈1.667
    assert(e2.filter(_._1 > 8).values.forall(n => n == 3L || n == 4L))  // 2c_B≈3.333
    // NULL source is its own group, never dropped
    val withNull = docs.unionByName(Seq((99L, null.asInstanceOf[String]))
      .toDF("doc_id", "source").withColumn("text", lit("x")))
    val nc = Sampling.temperatureSample(withNull, "source", alpha = 0.5)
      .filter(col("doc_id") === 99L).select("n_copies").as[Long].collect()
    assert(nc.length == 1)
  }

  test("duplicateSpans localizes cross-doc verbatim token runs; removal cuts exactly those tokens") {
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $passage z1 z2 z3"),
      (2L, s"b1 b2 b3 $passage y1 y2 y3 y4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12")
    ).toDF("doc_id", "text")
    // k=3 grams: the 10-token passage yields an 8-gram run in each doc;
    // boundary grams mix in unique tokens and stay singletons
    val spans = Dedup.duplicateSpans(docs, k = 3, minRun = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("start_tok"),
        r.getAs[Int]("end_tok"), r.getAs[Long]("n_grams"))).toSet
    assert(spans == Set((1L, 5, 14, 8L), (2L, 3, 12, 8L)))
    val removed = Dedup.removeDuplicateSpans(docs, k = 3, minRun = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_toks"))).toSet
    assert(removed == Set(
      (1L, "a1 a2 a3 a4 a5 z1 z2 z3", 8L, 18L),
      (2L, "b1 b2 b3 y1 y2 y3 y4", 7L, 17L),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", 12L, 12L)))
  }

  test("duplicateSpans: fully-dup doc empties, intra-doc repeats need crossDocOnly=false, empty input ok") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, k = 3, minRun = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_kept"))).toSet
    assert(out == Set((1L, "", 0L), (2L, "", 0L)))
    // a phrase repeated inside ONE doc is invisible to the cross-doc
    // rule (intra-doc repetition is a quality signal, not dedup) and
    // caught by the Lee-et-al exact rule with crossDocOnly=false
    val intra = Seq((1L, "q1 q2 q3 x1 x2 q1 q2 q3 x3 x4")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(intra, k = 3, minRun = 1).count() == 0)
    val spans = Dedup.duplicateSpans(intra, k = 3, minRun = 1, crossDocOnly = false)
      .collect().map(r => (r.getAs[Int]("start_tok"), r.getAs[Int]("end_tok"))).toSet
    assert(spans == Set((0, 2), (5, 7)))
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(emptyDocs, 3, 1).count() == 0)
  }

  test("sharedPassages: empty input and no-overlap docs produce no rows") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.sharedPassages(emptyDocs, 1).count() == 0)
    val distinctDocs = Seq(
      (1L, "first document with its own words only"),
      (2L, "second text sharing nothing with number one")
    ).toDF("doc_id", "text")
    assert(Dedup.sharedPassages(distinctDocs, 1).count() == 0)
  }

  test("decontamination flags n-gram overlap with the test set and removes those docs") {
    import graft.operators.Decontaminate
    val benchmark = Seq(
      (100L, "what is the capital of france paris is the answer")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "trivia dump: what is the capital of france paris is included here"), // leaked
      (2L, "a clean training document about something else entirely"),
      (3L, "another clean doc with zero benchmark overlap present")
    ).toDF("doc_id", "text")
    val pairs = Decontaminate.contaminatedPairs(corpus, benchmark, n = 5)
      .select("id", "test_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L)))
    val kept = Decontaminate.removeContaminated(corpus, benchmark, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // n larger than the shared run → nothing flagged, corpus intact
    assert(Decontaminate.contaminatedPairs(corpus, benchmark, n = 12).count() == 0)
    assert(Decontaminate.removeContaminated(corpus, benchmark, n = 12).count() == 3)
  }

  test("chunker: stride/overlap arithmetic, full coverage, short-doc single chunk") {
    import graft.operators.Chunker
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // 10 tokens
      (2L, "only three tokens")
    ).toDF("doc_id", "text")
    val out = Chunker.chunkTokens(docs, chunkSize = 4, overlap = 1)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Int)].collect().toSeq
    // stride 3: starts 1,4,7,10 → [t1..t4][t4..t7][t7..t10][t10]
    assert(out == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4), (1L, 3, "t10", 1),
      (2L, 0, "only three tokens", 3)))
    // consecutive chunks share exactly `overlap` tokens; every token covered
    val toks1 = out.filter(_._1 == 1L).flatMap(_._3.split(" "))
    assert((1 to 10).forall(i => toks1.contains(s"t$i")))
    val err = intercept[IllegalArgumentException] {
      Chunker.chunkTokens(docs, chunkSize = 4, overlap = 4)
    }
    assert(err.getMessage.contains("overlap"))
  }

  test("rebalance caps over-represented sources near target, leaves others whole") {
    import graft.operators.Sampling
    // 1000 'web' docs (83%), 100 'books', 100 'code'
    val docs = ((1L to 1000L).map((_, "web")) ++ (1001L to 1100L).map((_, "books")) ++
      (1101L to 1200L).map((_, "code"))).toDF("doc_id", "source")
    val out = Sampling.rebalanceBySource(docs, "source", Map("web" -> 0.25))
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    // web capped at ~25% of 1200 = 300 docs (md5 bucketing: within ~20%)
    assert(bySource("web") > 240 && bySource("web") < 360, s"web=${bySource("web")}")
    // unlisted sources untouched
    assert(bySource("books") == 100 && bySource("code") == 100)
    // deterministic: same rows regardless of partitioning
    val out2 = Sampling.rebalanceBySource(docs.repartition(7), "source", Map("web" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    assert(out2 == out.map(_._1).toSet)
    // target above actual share: keep everything
    assert(Sampling.rebalanceBySource(docs, "source", Map("books" -> 0.5)).count() == 1200)
  }

  test("rebalance keeps NULL-source rows at rate 1.0 (null-safe rate join)") {
    import graft.operators.Sampling
    // 400 'web' docs + 100 docs with a NULL source (e.g. provenance
    // lost upstream) — capping web must not silently drop the NULLs
    val docs = ((1L to 400L).map(i => (i, Some("web"))) ++
      (401L to 500L).map(i => (i, Option.empty[String]))).toDF("doc_id", "source")
    val out = Sampling.rebalanceBySource(docs, "source", Map("web" -> 0.2))
    // every NULL-source row survives ("sources without a target keep
    // everything" — NULL has no target by construction)
    assert(out.filter(col("source").isNull).count() == 100)
    // web still capped at ~20% of 500 = 100 docs (md5 bucketing: ~±20%)
    val web = out.filter(col("source") === "web").count()
    assert(web > 75 && web < 125, s"web=$web")
    // schema untouched: same columns as the input, no helper residue
    assert(out.columns.toSeq == Seq("doc_id", "source"))
  }

  test("quantilesCont: NULL-key group keeps its real quantiles (null-safe restore)") {
    import graft.operators.Stats
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (None: Option[String], Some(10.0)), (None, Some(20.0)), (None, Some(30.0)),
      (Some("allnull"), Option.empty[Double])).toDF("k", "v")
    val out = Stats.quantilesCont(df, "k", "v", Seq(0.5 -> "p50", 1.0 -> "p100"))
      .as[(Option[String], Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(Some("a")) == ((Some(2.0), Some(3.0))))
    // the defect: EqualTo restore handed the NULL-key group NULL
    // quantiles despite its three non-null values
    assert(out(None) == ((Some(20.0), Some(30.0))))
    // an all-NULL-values group still emits (with NULL quantiles), as
    // SQL quantile_cont under GROUP BY does
    assert(out(Some("allnull")) == ((None, None)))
  }

  test("capPerKey: exact per-key cap, deterministic, salt-independent draws, NULL key capped") {
    import graft.operators.Sampling
    val docs = ((1L to 40L).map(i => (i, Some("web"))) ++
      (41L to 45L).map(i => (i, Some("books"))) ++
      (46L to 60L).map(i => (i, Option.empty[String]))).toDF("doc_id", "source")
    val capped = Sampling.capPerKey(docs, "source", maxPerKey = 8)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // over-cap keys clamp exactly; under-cap keys keep everything;
    // NULL is its own capped group (SQL PARTITION BY semantics)
    assert(byKey(Some("web")) == 8L)
    assert(byKey(Some("books")) == 5L)
    assert(byKey(None) == 8L)
    // pure function of (key, id, salt): re-running selects the same rows
    val again = Sampling.capPerKey(docs, "source", maxPerKey = 8)
    assert(capped.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // a different salt draws a different (same-sized) sample of web
    val other = Sampling.capPerKey(docs, "source", maxPerKey = 8, salt = "epoch2")
    val webA = capped.filter(col("source") === "web").select("doc_id").as[Long].collect().toSet
    val webB = other.filter(col("source") === "web").select("doc_id").as[Long].collect().toSet
    assert(webB.size == 8 && webA != webB)
    // schema untouched
    assert(capped.columns.toSeq == Seq("doc_id", "source"))
  }

  test("capPerKey and sampleStratified are partition-invariant (the point vs df.sample/sampleBy)") {
    import graft.operators.Sampling
    val docs = (1L to 900L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val cap1 = ids(Sampling.capPerKey(docs.repartition(1), "source", 50))
    val cap7 = ids(Sampling.capPerKey(docs.repartition(7, col("doc_id")), "source", 50))
    assert(cap1 == cap7 && cap1.size == 200)
    val st1 = ids(Sampling.sampleStratified(docs.repartition(1), "source", Map("src0" -> 0.5)))
    val st7 = ids(Sampling.sampleStratified(docs.repartition(7, col("source")), "source", Map("src0" -> 0.5)))
    assert(st1 == st7)
  }

  test("sampleStratified: per-stratum fractions, default for unlisted, 0 and 1 exact") {
    import graft.operators.Sampling
    val docs = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = Sampling.sampleStratified(docs, "source",
      Map("src0" -> 0.0, "src1" -> 1.0), defaultFraction = 0.3)
    val byKey = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byKey.contains("src0"))          // fraction 0: stratum empty
    assert(byKey("src1") == 1000L)           // fraction 1: everything kept
    val kept2 = byKey.getOrElse("src2", 0L)  // default 0.3 of 1000, md5 ±
    assert(kept2 > 230 && kept2 < 370, s"src2=$kept2")
    // deterministic: the same call selects the identical rows
    val again = Sampling.sampleStratified(docs, "source",
      Map("src0" -> 0.0, "src1" -> 1.0), defaultFraction = 0.3)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("deterministic shuffle: partition-invariant, salt-sensitive, dense positions") {
    import graft.operators.Sampling
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.shuffleDeterministic(df, "doc_id", shards = 4, salt = salt)
        .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().toSet
    val a = run(docs, "shuffle")
    // identical result regardless of input partitioning
    assert(run(docs.repartition(7), "shuffle") == a)
    // positions are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size).toSeq)
    }
    // every doc appears exactly once
    assert(a.map(_._1) == (1L to 60L).toSet)
    // a different salt produces a different order (same shards)
    val b = run(docs, "epoch2")
    assert(a.map(t => (t._1, t._2)) == b.map(t => (t._1, t._2)), "shards must not depend on salt")
    assert(a != b, "order must depend on salt")
  }

  test("chunker reconstruction (property): stripping overlaps rebuilds every doc exactly") {
    import graft.operators.Chunker
    val rnd = new scala.util.Random(7)
    val shapes = Seq((4, 1), (8, 3), (5, 0), (16, 8), (3, 2))
    shapes.foreach { case (size, ov) =>
      val docs = (1L to 20L).map { i =>
        val n = 1 + rnd.nextInt(40)
        (i, (1 to n).map(t => s"w${i}_$t").mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val chunks = Chunker.chunkTokens(df, size, ov)
        .orderBy("id", "chunk_idx")
        .select("id", "chunk_idx", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val rebuilt = chunks(id).zipWithIndex.flatMap { case (c, ix) =>
          val toks = c.split(" ").toSeq
          if (ix == 0) toks else toks.drop(ov)   // consecutive chunks share exactly ov tokens
        }
        assert(rebuilt.mkString(" ") == text,
          s"reconstruction failed for doc $id at size=$size overlap=$ov")
      }
    }
  }

  test("splitByComponent: a near-dup cluster never straddles the split boundary") {
    import graft.operators.Sampling
    val docs = (1L to 40L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // two transitive clusters: {1,2,3} (via 1-2, 2-3) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    (0 to 90 by 10).foreach { pct =>
      val (train, test) = Sampling.splitByComponent(docs, pairs, testPct = pct)
      val tr = train.select("doc_id").as[Long].collect().toSet
      val te = test.select("doc_id").as[Long].collect().toSet
      assert((tr & te).isEmpty && (tr ++ te) == (1L to 40L).toSet)
      Seq(Set(1L, 2L, 3L), Set(10L, 11L)).foreach { cluster =>
        assert(cluster.subsetOf(tr) || cluster.subsetOf(te),
          s"cluster $cluster straddles the split at testPct=$pct")
      }
    }
  }

  test("splitByComponent is strict by default: non-convergence throws, not warns") {
    import graft.operators.Sampling
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a 4-node chain needs >1 round of label propagation; maxIter = 1
    // cannot converge — a "leakage-free" split from partial labels
    // could straddle the cluster, so it must FAIL, not warn
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val err = intercept[IllegalStateException] {
      Sampling.splitByComponent(docs, pairs, testPct = 10, maxIter = 1)
    }
    assert(err.getMessage.contains("converge"))
    // strict=false restores the old warn-and-continue behavior explicitly
    val (tr, te) = Sampling.splitByComponent(docs, pairs, testPct = 10,
      maxIter = 1, strict = false)
    assert(tr.count() + te.count() == 10)
  }

  test("round-2 operators tolerate empty inputs") {
    import graft.operators.{Sampling, Stats}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.components(emptyPairs).count() == 0)
    assert(Dedup.winnowPairs(emptyDocs, 1).count() == 0)
    assert(Sampling.sampleByHash(emptyDocs, "doc_id", 50).count() == 0)
    assert(Stats.quantilesCont(
      Seq.empty[(String, Double)].toDF("k", "v"), "k", "v",
      Seq(0.5 -> "p50")).count() == 0)
    assert(graft.operators.Curation.curate(emptyDocs).count() == 0)
    // round-7 additions
    val emptySourced = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(Sampling.capPerKey(emptySourced, "source", 5).count() == 0)
    assert(Sampling.sampleStratified(emptySourced, "source", Map("a" -> 0.5)).count() == 0)
    val emptyCelled = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.semanticDedup(emptyCelled, 0.5).count() == 0)
  }

  test("operators tolerate empty inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs, 0.5).count() == 0)
    assert(Dedup.simhash(emptyDocs).count() == 0)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs, 3).count() == 0)
    val e1 = Seq.empty[(Long, String, java.sql.Timestamp)].toDF("id", "k", "ts")
    val e2 = Seq.empty[(String, java.sql.Timestamp, Long)].toDF("k", "rts", "p")
    assert(AsOfJoin.backward(e1, e2, "k", "ts", "rts", Seq("p")).count() == 0)
  }

  test("ngram jaccard doc-frequency cap drops hot shingles from candidate generation") {
    // one ubiquitous phrase ("the common prefix") + per-doc unique tails
    val docs = (0L until 20L).map(i =>
      (i, s"the common prefix words tail$i unique$i content$i here$i")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, threshold = 0.05)
    val capped = Dedup.ngramJaccard(docs, threshold = 0.05, maxDocFreq = Some(5L))
    // ubiquitous shingles connect every pair without the cap...
    assert(uncapped.count() == 20L * 19 / 2)
    // ...and none survive with it (only the shared prefix overlapped)
    assert(capped.count() == 0)
  }

  test("rrfFuse: hand-computed fusion, absent-leg zero contribution, id tie-break, k bound") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lex = Seq((10L, 1L), (30L, 2L)).toDF("id", "rnk")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("id", "rnk")
    val out = Retrieval.rrfFuse(Seq(lex, vec), k = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // 10 and 20 tie at 1/61 (id asc breaks it); 30 and 40 tie at 1/62
    // but k=3 keeps only 30
    assert(out == Seq(
      (1L, 10L, r6(1.0 / 61)), (2L, 20L, r6(1.0 / 61)),
      (3L, 30L, r6(1.0 / 62))))
    // overlap sums across legs and outranks every single-leg doc
    val both = Retrieval.rrfFuse(
      Seq(lex, Seq((30L, 1L)).toDF("id", "rnk")), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(both == Seq(
      (1L, 30L, r6(1.0 / 62 + 1.0 / 61)), (2L, 10L, r6(1.0 / 61))))
  }

  test("centroidOutliers: fixed-point centroid math, own-label scoring, partition-invariant") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosv(v: Seq[Double], c: Seq[Double]) = {
      def d(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      r6(d(v, c) / (math.sqrt(d(v, v)) * math.sqrt(d(c, c))))
    }
    val e = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 1f), 0), (3L, Seq(-1f, 0f), 0),
      (4L, Seq(0f, 1f), 1), (5L, Seq(0f, 2f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(e, threshold = 0.0)
      .orderBy("id").as[(Long, Int, Double, Int)].collect().toSeq
    // label 0 centroid = (1e6+1e6-1e6, 0+1e6+0)/(3·1e6) = (1/3, 1/3);
    // label 1 centroid = (0, 1.5)
    val c0 = Seq(1000000.0 / 3000000, 1000000.0 / 3000000)
    val c1 = Seq(0.0, 1.5)
    assert(out == Seq(
      (1L, 0, cosv(Seq(1, 0), c0), 0), (2L, 0, cosv(Seq(1, 1), c0), 0),
      (3L, 0, cosv(Seq(-1, 0), c0), 1),
      (4L, 1, cosv(Seq(0, 1), c1), 0), (5L, 1, cosv(Seq(0, 2), c1), 0)))
    // exact integer accumulation => bit-identical under repartitioning
    val rep = Similarity.centroidOutliers(e.repartition(7), threshold = 0.0)
      .orderBy("id").as[(Long, Int, Double, Int)].collect().toSeq
    assert(rep == out)
  }

  test("streaming pipeline terminal returns a query handle") {
    import graft.core._
    val res = Pipeline(spark).root(RateSource(10)).to(ConsoleSink())
    res match {
      case Sink.Streaming(q) => assert(q.isActive); q.stop()
      case other => fail(s"expected streaming handle, got $other")
    }
  }

  test("topFraction's MaxRunLength kernel: value-equal to the HOF fold on every shape") {
    import graft.functions.Text
    // the exact fold topFraction used before r19 — kept HERE as the
    // semantic pin for the codegen'd graft_max_run kernel
    def foldForm(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val best = aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"),
          lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(acc.getField("prev").isNotNull &&
            x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      round(best / size(arr), 4)
    }
    // no empty-array row: best/size is 0/0 there and ANSI integer
    // division throws IDENTICALLY in both forms — and no caller can
    // produce one (split(trim(x)) yields >= 1 element for any text)
    val rows = Seq(
      Seq("a", "b", "a", "a", "c"),          // clear mode
      Seq("x"),                               // singleton
      Seq("t", "t", "t"),                     // all-equal
      Seq(null, null, "a", "a", null),        // null runs never extend
      Seq("", "", "z")                        // empty strings are values
    ).toDF("arr")
    val got = rows.select(
        Text.topFraction(col("arr")).as("native"), foldForm(col("arr")).as("fold"))
      .collect()
    got.foreach { r =>
      val (n, f) = (r.get(0), r.get(1))
      val same = (n, f) match {
        case (a: java.lang.Double, b: java.lang.Double) =>
          a.isNaN && b.isNaN || a == b
        case _ => n == f
      }
      assert(same, s"native $n != fold $f")
    }
    // null array input
    val nullRow = Seq(Tuple1[Seq[String]](null)).toDF("arr")
      .select(Text.topFraction(col("arr")).as("native"), foldForm(col("arr")).as("fold"))
      .head()
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }

  test("hammingDist's native kernel: value-equal to the HOF fold incl. null/ragged shapes") {
    // the exact fold hammingDist used before r19 — the semantic pin
    def foldForm(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val rows = Seq(
      (Seq[java.lang.Long](0L, -1L), Seq[java.lang.Long](0L, 0L)),     // 64
      (Seq[java.lang.Long](5L), Seq[java.lang.Long](3L)),              // popcount(6)=2
      (Seq[java.lang.Long](7L, 1L), Seq[java.lang.Long](7L, 1L)),      // 0
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 1L)),    // null element
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L)),          // ragged
      (null, Seq[java.lang.Long](1L))                                   // null array
    ).toDF("a", "b")
    val got = rows.select(
      graft.operators.Similarity.hammingDist(col("a"), col("b")).as("native"),
      foldForm(col("a"), col("b")).as("fold")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"native ${r.get(0)} != fold ${r.get(1)}")
    }
  }

  test("signBits' native kernel: value-equal to the per-word HOF folds on every shape") {
    // the exact per-word fold signBits used before r19 round 1 — the
    // semantic pin for the codegen'd graft_sign_bits kernel
    def foldForm(vec: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column = {
      val words = (dim + 31) / 32
      array((0 until words).map { w =>
        val n = math.min(32, dim - w * 32)
        aggregate(
          zip_with(slice(vec, w * 32 + 1, n), sequence(lit(0), lit(n - 1)),
            (x, i) => when(x > lit(0d),
              call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
          lit(0L), (acc, x) => acc.bitwiseOR(x))
      }: _*)
    }
    for (dim <- Seq(8, 32, 48, 64, 128)) {
      val rows = Seq(
        Seq.tabulate(dim)(i => java.lang.Double.valueOf(if (i % 3 == 0) 1.0 else -1.0)),
        Seq.tabulate(dim)(i => java.lang.Double.valueOf(i - dim / 2.0)),    // mixed signs
        Seq.tabulate(dim)(_ => java.lang.Double.valueOf(0.0)),              // all zero
        Seq.tabulate(dim / 2)(i => java.lang.Double.valueOf(i + 1.0)),      // SHORT vector
        Seq.tabulate(dim + 7)(i => java.lang.Double.valueOf(1.0)),          // LONG vector
        Seq.tabulate(dim)(i =>                                              // null elements
          if (i % 5 == 0) null else java.lang.Double.valueOf(1.0)),
        Seq.tabulate(dim)(i => java.lang.Double.valueOf(Double.NaN))        // NaN: Spark total order -> bit SET
      ).toDF("vec")
      val got = rows.select(
        graft.operators.Similarity.signBits(col("vec"), dim).as("native"),
        foldForm(col("vec"), dim).as("fold")).collect()
      got.foreach { r =>
        assert(r.getSeq[Any](0) == r.getSeq[Any](1),
          s"dim=$dim native ${r.getSeq[Any](0)} != fold ${r.getSeq[Any](1)}")
      }
      // null vector: both forms yield an array of NULL words, not NULL
      val nullRow = Seq(Tuple1[Seq[java.lang.Double]](null)).toDF("vec")
        .select(graft.operators.Similarity.signBits(col("vec"), dim).as("native"),
          foldForm(col("vec"), dim).as("fold"))
        .head()
      assert(!nullRow.isNullAt(0) && !nullRow.isNullAt(1) &&
        nullRow.getSeq[Any](0) == nullRow.getSeq[Any](1))
    }
    // float input (the embeddings table's element type) widens like the
    // HOF lambda's implicit cast
    val frows = Seq(Seq(1.5f, -0.5f, 0.0f, 2.0f)).toDF("vec")
      .select(graft.operators.Similarity.signBits(col("vec"), 4).as("native"),
        foldForm(col("vec"), 4).as("fold")).head()
    assert(frows.getSeq[Any](0) == frows.getSeq[Any](1))
  }

  test("md5Prefix's native kernel: value-equal to conv(substring(md5)) on every shape") {
    import graft.functions.Text
    // the exact chain the md5-prefix hash family used before r19
    // round 1 — the semantic pin for the codegen'd graft_md5_prefix
    def chainForm(c: org.apache.spark.sql.Column, nibbles: Int) =
      conv(substring(md5(c), 1, nibbles), 16, 10).cast("long")
    val rows = (Seq(
      "", "a", "the quick brown fox", "0|12345", "15|999999999999999",
      " graft_null", "héllo wörld €ß", "日本語テキスト",
      "x" * 10000, "line1\nline2\ttab", null
    ) ++ (0 until 200).map(i => s"doc $i shingle ${i * 37}")).toDF("s")
    for (nibbles <- Seq(1, 8, 15)) {
      val got = rows.select(
        Text.md5Prefix(col("s"), nibbles).as("native"),
        chainForm(col("s"), nibbles).as("chain")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1) &&
          (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
          s"nibbles=$nibbles native ${r.get(0)} != chain ${r.get(1)}")
      }
    }
  }

  test("bandMatch's native kernel: value-equal to exists(zip_with) incl. 3VL shapes") {
    // the exact HOF chain the first-matching-band guard used before
    // r19 round 1 — the semantic pin for graft_band_match
    def hofForm(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      exists(zip_with(a, b, (x, y) => x === y), matched => matched)
    val rows = Seq(
      (Seq("a", "b"), Seq("a", "c")),          // match at 0 -> true
      (Seq("a", "b"), Seq("c", "b")),          // match at 1 -> true
      (Seq("a", "b"), Seq("c", "d")),          // no match -> false
      (Seq[String](), Seq[String]()),          // both empty -> false
      (Seq("a"), Seq("b", "a")),               // ragged: pad null -> null (no positional match)
      (Seq("a", "x"), Seq("a")),               // ragged but true wins over null
      (Seq(null, "b"), Seq("a", "b")),         // null element but true wins
      (Seq(null, "b"), Seq("a", "c")),         // null element, no match -> null
      (null, Seq("a"))                          // null array -> null
    ).toDF("a", "b")
    val got = rows.select(
      graft.operators.Dedup.bandMatch(col("a"), col("b")).as("native"),
      hofForm(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getBoolean(0) == r.getBoolean(1)),
        s"native ${r.get(0)} != hof ${r.get(1)}")
    }
  }

  test("classifierScoreOf's WeightBagSum kernel: value-equal to the HOF fold on every shape") {
    import graft.functions.{QualityModel, Text}
    // the exact fold classifierScoreOf used before r20 - the semantic
    // pin for the codegen'd graft_weight_sum kernel
    def foldScore(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val w = typedlit(QualityModel.weights)
      val bucket = (t: org.apache.spark.sql.Column) =>
        graft.operators.Sampling.hashBucket(t, QualityModel.dim)
      val s = aggregate(toks, lit(0.0), (acc, t) => acc + element_at(w, bucket(t) + 1))
      val z = lit(QualityModel.bias) + s / greatest(size(toks), lit(1))
      lit(1.0) / (lit(1.0) + exp(-z))
    }
    val rows = Seq(
      Seq("the", "quick", "brown", "fox"),     // plain tokens
      Seq("x"),                                 // singleton
      Seq[String](),                            // empty array -> bias-only score
      Seq("the", "the", "the"),                 // repeated token
      Seq(null, "a", null),                     // null tokens hash the sentinel bucket
      (0 until 500).map(i => s"tok$i")          // long doc, order-sensitive IEEE sum
    ).toDF("toks")
    val got = rows.select(
        Text.classifierScoreOf(col("toks")).as("native"),
        foldScore(col("toks")).as("fold"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.get(0)} != fold ${r.get(1)}")
    }
    // null token array: both forms propagate null through the score
    val nullRow = Seq(Tuple1[Seq[String]](null)).toDF("toks")
      .select(Text.classifierScoreOf(col("toks")).as("native"),
        foldScore(col("toks")).as("fold"))
      .head()
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }
}
