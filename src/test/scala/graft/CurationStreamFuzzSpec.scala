package graft

import graft.examples.MultiModalCurationExample
import graft.operators.CurationStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Randomized crash/replay-schedule fuzzing for the STREAMING curation
  * state machine — the [[IndexGenFuzzSpec]] treatment applied to the
  * other r14 exactly-once surface. CurationStreamSpec pins ONE replay
  * shape deterministically; here randomized schedules drive the full
  * failure contract through real Spark parquet writes on a
  * fault-injecting filesystem:
  *
  *  - epoch count and the doc→epoch assignment are randomized per
  *    schedule (batch == stream means the FINAL corpus is
  *    partition-invariant, so every schedule must converge to the same
  *    rows — the clean fixed-split reference computed once);
  *  - each ingest may CRASH at a random IO boundary (abort-mode
  *    injection: Spark task runners escalate Errors, and a failed
  *    foreachBatch is re-invoked with the SAME epoch id — the
  *    Structured Streaming contract) and is re-run until it commits,
  *    possibly crashing again at a different boundary;
  *  - already-committed epochs are re-ingested at random points (late
  *    replays, including after later epochs committed);
  *  - random crash-injected COMPACTIONS fold epochs below a random
  *    committed watermark mid-schedule, so late replays land on both
  *    folded epochs (must no-op via the watermark guard) and live ones
  *    (must overwrite byte-identically), and aborted folds leave
  *    unpromoted staging generations every reader must ignore;
  *  - after the schedule, one more replay of a random epoch must leave
  *    every state table's row count unchanged (overwrite, not append).
  *
  * Invariant: [[CurationStream.finalizeCorpus]] equals the clean
  * reference row for row, every schedule, crashes and replays
  * notwithstanding. Why re-runs are safe from ANY crash prefix: an
  * epoch's own inputs are the in-memory batch (never read back from
  * its own partial writes) and accumulated state STRICTLY BEFORE it,
  * and every write is a dynamic `__epoch` partition overwrite — so a
  * re-run recomputes identical content and replaces whatever prefix
  * the crash left. Schedules are sequential and seeded; a found bug
  * replays deterministically from the printed seed. Scale N via
  * SPARK_GRAFT_FUZZ_CURATION_N.
  */
class CurationStreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val conf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
    c
  }

  // bounded doc subset: the funnel + both media lanes still do real
  // work (gates drop, planted dup pairs straddle epochs, image/audio
  // twins exist under the id caps) at a per-schedule cost that lets
  // several schedules run in CI time
  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .filter(col("doc_id") < 400)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  private def ingest(stateDir: String, part: Seq[(Long, String)], e: Long,
                     foldEvery: Int = 0): Unit = {
    val b = part.toDF("doc_id", "text")
    val ids = b.select(col("doc_id")).filter(col("doc_id") < 2000)
    CurationStream.ingestEpoch(b,
      MultiModalCurationExample.epochImages(ids),
      MultiModalCurationExample.epochHashClips(ids),
      stateDir, e, foldEvery = foldEvery)
  }

  private def corpus(stateDir: String): Seq[Row] =
    CurationStream.finalizeCorpus(spark, stateDir).orderBy("doc_id").collect().toSeq

  test("randomized crash/replay schedules all converge to the clean corpus") {
    conf // force faulty:// registration
    val n = sys.env.get("SPARK_GRAFT_FUZZ_CURATION_N").flatMap(_.toIntOption).getOrElse(4)
    // clean fixed-split reference (local fs — no injection surface)
    val refTmp = java.nio.file.Files.createTempDirectory("graft-cfuzz-ref")
    val refState = s"$refTmp/state"
    val refParts = docs.groupBy(d => java.lang.Math.floorMod(d._1, 2L)).toSeq.sortBy(_._1)
    refParts.foreach { case (e, part) => ingest(refState, part, e) }
    val expected = corpus(refState)
    assert(expected.nonEmpty && expected.size < docs.size,
      "reference fixture must exercise the funnel")
    org.apache.commons.io.FileUtils.deleteDirectory(refTmp.toFile)

    val rnd = new scala.util.Random(140414L)
    var totalInjected = 0
    (0 until n).foreach { s =>
      val seed = rnd.nextLong()
      val r = new scala.util.Random(seed)
      val tmp = java.nio.file.Files.createTempDirectory("graft-cfuzz")
      val state = s"faulty://$tmp/state"
      val epochs = 2 + r.nextInt(3)
      // per-schedule AUTO-FOLD policy (r16 knob): half the schedules
      // run every ingest through ingestEpoch's wired foldEvery — so the
      // auto path is crash-fuzzed too (a crash between the policy's
      // fold promote and the checkpoint commit replays a folded epoch,
      // which must no-op); the other half keep it off and rely on the
      // explicit random folds below, covering both operating modes
      val foldEvery = if (r.nextBoolean()) 1 + r.nextInt(2) else 0
      // random assignment: every doc to one of `epochs` buckets (empty
      // buckets allowed — finalize must tolerate epochs with no rows)
      val assign = docs.groupBy(_ => r.nextInt(epochs))
      def partOf(e: Int): Seq[(Long, String)] = assign.getOrElse(e, Seq.empty)

      def withCrashes(what: String)(op: => Unit): Unit = {
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          assert(attempts <= 6, s"seed=$seed: $what did not commit in 6 attempts")
          // later attempts crash less often so schedules terminate
          val crash = r.nextDouble() < (if (attempts == 1) 0.6 else 0.3)
          if (crash) FaultInjector.arm(r.nextInt(150), kill = false)
          try { op; done = true }
          catch {
            // count FIRED crashes only (an armed budget larger than the
            // op's mutation count never fires — that attempt is clean)
            case t: Throwable if FaultInjector.isInjected(t) => totalInjected += 1
          } finally FaultInjector.disarm()
        }
      }
      def ingestWithCrashes(e: Int): Unit =
        withCrashes(s"epoch $e")(ingest(state, partOf(e), e.toLong, foldEvery))

      (0 until epochs).foreach { e =>
        ingestWithCrashes(e)
        // late replay of a random committed epoch, sometimes crashing —
        // the target may have been FOLDED by a compaction below (then
        // the replay must be a no-op) or still live (then it must
        // overwrite byte-identically)
        if (e > 0 && r.nextDouble() < 0.5) ingestWithCrashes(r.nextInt(e + 1))
        // random mid-stream fold up to the last committed epoch
        // (inclusive — e is checkpoint-committed once ingest returned),
        // itself crash-injected: an aborted fold leaves an unpromoted
        // staging generation that must be invisible to every reader
        if (r.nextDouble() < 0.4)
          withCrashes(s"fold<=$e")(
            CurationStream.compactState(spark, state, uptoEpoch = r.nextInt(e + 2).toLong))
      }
      val got = corpus(state)
      assert(got == expected, {
        val extra = got.toSet.diff(expected.toSet).take(3)
        val miss = expected.toSet.diff(got.toSet).take(3)
        s"seed=$seed: corpus diverged (extra: $extra; missing: $miss)"
      })
      // one more clean replay: accumulated state must not grow
      // (overwrite semantics live-side, watermark no-op folded-side) —
      // counted through the same compacted ∪ live read every consumer
      // uses, because a fold may have retired any table's live partitions
      val tables = Seq("gated", "edges", "bands", "img_sigs", "img_losers",
        "aud_sigs", "aud_losers")
      def counts() = tables.map(t =>
        CurationStream.stateTable(spark, state, t).map(_.count()).getOrElse(0L))
      val before = counts()
      val re = r.nextInt(epochs) // one sample: a replay pairs an epoch's id with ITS docs
      ingest(state, partOf(re), re.toLong)
      val after = counts()
      assert(before == after, s"seed=$seed: state grew on clean replay: $before -> $after")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    info(s"$n schedules, $totalInjected injected aborts — corpus invariant held")
    assert(totalInjected >= n, "fuzz degenerated: too few injected aborts")
  }
}
