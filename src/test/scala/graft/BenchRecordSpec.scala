package graft

import org.scalatest.funsuite.AnyFunSuite

/** Artifact-routing contract of the bench harness (r17 verdict #2):
  * three consecutive rounds ended with the COMMITTED full-suite record
  * (BENCH_SELF.json) silently overwritten by whatever full-suite run
  * happened last. The committed record must now change only under an
  * explicit SPARK_GRAFT_BENCH_RECORD=1; probes keep their own file
  * (ADVICE r14 #1).
  */
class BenchRecordSpec extends AnyFunSuite {

  test("full-suite runs default to the untracked BENCH_SELF_LAST.json") {
    assert(Bench.selfFileName(probe = false, record = false)
      == "BENCH_SELF_LAST.json")
  }

  test("only SPARK_GRAFT_BENCH_RECORD=1 writes the committed record") {
    assert(Bench.selfFileName(probe = false, record = true)
      == "BENCH_SELF.json")
  }

  test("probes never touch the record, even with the record flag set") {
    assert(Bench.selfFileName(probe = true, record = false)
      == "BENCH_SELF_PROBE.json")
    // a probe with RECORD=1 is a misuse; the probe separation wins —
    // a filtered artifact must never become the committed record
    assert(Bench.selfFileName(probe = true, record = true)
      == "BENCH_SELF_PROBE.json")
  }

  test("fault-injected runs never become the committed record, even under RECORD=1") {
    // the r16 injection-calibration workflow with a stale RECORD=1 in
    // the shell: the deliberately corrupted artifact must not be
    // promotable
    assert(Bench.selfFileName(probe = false, record = true, inject = true)
      == "BENCH_SELF_LAST.json")
    assert(Bench.selfFileName(probe = false, record = false, inject = true)
      == "BENCH_SELF_LAST.json")
  }

  test("config-arm runs never become the committed record, even under RECORD=1") {
    // r18 verdict #4/#5: an off-heap / tmpfs-local-dirs / master-
    // override run measures a different deployment bracket than the
    // committed floors — it must stay in the untracked file
    assert(Bench.selfFileName(probe = false, record = true, configArm = true)
      == "BENCH_SELF_LAST.json")
    assert(Bench.selfFileName(probe = false, record = false, configArm = true)
      == "BENCH_SELF_LAST.json")
  }

  test("both non-record outputs are gitignored") {
    val ignored = scala.io.Source.fromFile(".gitignore").getLines().toSet
    assert(ignored.contains("BENCH_SELF_PROBE.json"))
    assert(ignored.contains("BENCH_SELF_LAST.json"))
  }
}
