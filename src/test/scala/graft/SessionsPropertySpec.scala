package graft

import graft.streaming.Streams
import graft.streaming.Streams.SessionAcc
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the sessionization interval machine — the pure
  * core under [[Streams.closedSessions]]/`closedSessionsPreMerged`.
  * The streaming specs pin the end-to-end contracts (closure timing,
  * late merges, skew collapse); here seeded random cases hammer the
  * algebra the batch==stream equality rests on:
  *
  *  1. the incremental TreeMap insert equals a sort-then-fold gap
  *     closure of the same multiset (the reference implementation is
  *     the pre-r15 fold, kept here as the oracle);
  *  2. the result is INSERTION-ORDER-INDEPENDENT — any permutation,
  *     any pre-grouping into sub-intervals (the pre-merge path), same
  *     closure;
  *  3. invariants: intervals disjoint, pairwise gap-separated, sorted;
  *     n conserved (no event lost or double-counted).
  *
  * Timestamps are drawn from a range tight relative to the gap so
  * merges, long chains and exact-boundary (`diff == gap`) collisions
  * all actually occur.
  */
class SessionsPropertySpec extends AnyFunSuite {

  private def fold(points: Seq[Long], gap: Long): List[SessionAcc] =
    points.sorted
      .foldLeft(List.empty[SessionAcc]) {
        case (cur :: done, t) if t - cur.end < gap =>
          SessionAcc(cur.start, math.max(cur.end, t), cur.n + 1) :: done
        case (acc, t) => SessionAcc(t, t, 1) :: acc
      }.reverse

  private def viaTree(items: Seq[SessionAcc], gap: Long): List[SessionAcc] = {
    val tree = new java.util.TreeMap[Long, SessionAcc]()
    items.foreach(Streams.insertInterval(tree, _, gap))
    import scala.jdk.CollectionConverters._
    tree.values().asScala.toList
  }

  private val caseGen = for {
    gap <- Gen.choose(2L, 50L)
    n <- Gen.choose(1, 120)
    pts <- Gen.listOfN(n, Gen.choose(0L, 400L))
  } yield (gap, pts)

  private def cases(n: Int, seed: Long): Seq[(Long, List[Long], Long)] =
    (0 until n).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(seed + i))
        .map { case (g, p) => (g, p, seed ^ (i * 2654435761L)) }
    }

  test("incremental insert == sorted gap-closure fold, any insertion order") {
    cases(500, 150815L).foreach { case (gap, pts, s) =>
      val expected = fold(pts, gap)
      val shuffled = new scala.util.Random(s).shuffle(pts)
      val got = viaTree(shuffled.map(t => SessionAcc(t, t, 1)), gap)
      assert(got == expected, s"gap=$gap seed=$s pts=$pts")
    }
  }

  test("pre-grouping into sub-intervals (the pre-merge path) yields the same closure") {
    cases(500, 240815L).foreach { case (gap, pts, s) =>
      val expected = fold(pts, gap)
      val r = new scala.util.Random(s)
      // split the multiset into random 'partitions', pre-merge each with
      // the same fold, feed the resulting intervals in shuffled order —
      // exactly closedSessionsPreMerged's shape
      val parts = pts.groupBy(_ => r.nextInt(4)).values.toSeq
      val pre = parts.flatMap(p => fold(p, gap))
      val got = viaTree(r.shuffle(pre), gap)
      assert(got == expected, s"gap=$gap seed=$s pts=$pts")
    }
  }

  test("invariants: sorted, disjoint, gap-separated, n conserved") {
    cases(500, 310815L).foreach { case (gap, pts, s) =>
      val got = viaTree(new scala.util.Random(s).shuffle(pts)
        .map(t => SessionAcc(t, t, 1)), gap)
      assert(got.map(_.n).sum == pts.size, "events lost or double-counted")
      got.sliding(2).foreach {
        case List(a, b) =>
          assert(a.start <= a.end && b.start <= b.end)
          assert(b.start - a.end >= gap, s"adjacent intervals within gap: $a $b")
        case _ =>
      }
    }
  }
}
