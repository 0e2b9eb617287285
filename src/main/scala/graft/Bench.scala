package graft

import org.apache.spark.sql.SparkSession

/** Perf harness (driver contract): runs the query corpus on
  * SPARK_GRAFT_SF_DIR at local[32] and prints ONE JSON line.
  *
  * Results are forced with a noop-format write (full materialization of
  * every output column — `count()` would let Catalyst prune the work).
  * One warm-up query absorbs JVM/codegen/parquet-footer startup so the
  * per-query numbers measure the plans, not classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    // ERROR, not WARN: the one-line JSON below shares stdout with log4j,
    // and WindowExec emits a WARN per bounded P-row/50-row window (harmless
    // at scale but it breaks the driver's stdout parse — BENCH r1-r3 all
    // came back "parsed": null because of this spam)
    spark.sparkContext.setLogLevel("ERROR")
    // deny the known-benign post-success accumulator spam; count every
    // OTHER error-level event into the JSON so the artifact tail stays
    // pure signal (see LogHygiene)
    graft.core.LogHygiene.install()

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up: touch every table once (footer reads, codegen, classloading)
    try force(SparkEntry.queries("q1_agg")(spark, sfDir)) catch { case _: Throwable => }

    // N runs per query, discard the first (it pays codegen/JIT and
    // OS page-cache warmup), min of the remainder — stabilizes the
    // number against run-to-run noise on a contended machine
    // clamped to >= 1: a malformed or non-positive override must not
    // crash the bench or emit an all--1.0 JSON that parses as plausible
    val runs = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
        .getOrElse(3))
    // drift forensics (r12 verdict #1): SPARK_GRAFT_BENCH_ORDER=desc
    // runs the corpus in REVERSE name order — if per-query times track
    // POSITION (late queries slow in both orders) the suite is leaking
    // session residue; if they track the QUERY (same times both
    // orders) the machine/session is the variable. Output artifacts
    // are order-invariant: every rung reports in sorted-name order.
    val runOrder = sys.env.getOrElse("SPARK_GRAFT_BENCH_ORDER", "asc")
    // probe filter (A/B forensics, e.g. the r13 contention root-cause):
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the corpus to the named
    // queries. Unset (the driver's path) runs everything — the official
    // artifact contract is unchanged. Unknown names fail fast, like
    // Verify's filter: a typo'd probe would otherwise measure nothing
    // and report a plausible-looking near-zero total.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // an empty set would pass the unknown-name check vacuously and
      // run ZERO queries — emitting the plausible near-zero total this
      // guard exists to prevent
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but names no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY: unknown queries $unknown")
    }
    val ordered = {
      val asc = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (k, _) => only.forall(_.contains(k)) }
      if (runOrder == "desc") asc.reverse else asc
    }
    // per-query session snapshots (BENCH_SELF.json only): persistent
    // RDD count + their memory footprint (dead localCheckpoint blocks
    // — the r10 residue class) and driver JVM used heap, taken AFTER
    // the query's hygiene flush. Monotonic growth across the suite =
    // residue; flat = the flush is holding.
    val snaps = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Long, Double)]
    // contention forensics (r13, closing the r12 drift question for good):
    // process-CPU seconds per query and the host 1-min load average per
    // snapshot. A query whose WALL time inflates while its process-CPU
    // stays at the clean-run floor was starved by something outside this
    // JVM — attributable from the artifact alone, no re-run needed.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def processCpuSec: Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    // GC decomposition (r13 verdict #1): under external memory pressure
    // GC threads storm and their time counts toward process CPU, so a
    // contended run's cpu does NOT stay at the clean floor (measured:
    // d_incr_steady 159 cpu-s vs 7.9 clean). Per-query GC-time deltas
    // split cpu into app + GC so a drifted artifact adjudicates itself:
    // wall↑ cpu↑ gc↑ = GC storm (external memory pressure); wall↑ with
    // cpu at floor = pure CPU starvation; wall↑ cpu↑ gc flat = real
    // plan regression.
    import scala.jdk.CollectionConverters._
    def gcSec: Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum / 1e3
    // direct external-contention meter: host-wide busy CPU minus this
    // process's CPU over each query window (/proc/stat, USER_HZ=100).
    // An idle machine contributes ~0; a rival workload shows up as
    // external cpu-seconds attributable per query — the in-artifact
    // contention verdict the loadavg snapshots only hinted at.
    def hostBusySec: Double =
      try {
        val line = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/stat")).get(0)
        val f = line.trim.split("\\s+").drop(1).map(_.toDouble)
        // fields: user nice system idle iowait irq softirq steal guest
        // guest_nice. Busy excludes idle(3) and iowait(4), AND the
        // guest pair (8, 9): on Linux guest jiffies are ALREADY
        // included in user/nice, so summing them would double-count a
        // co-hosted VM's load and trip the contended threshold at half
        // the real external level
        (f.zipWithIndex.collect {
          case (v, i) if i != 3 && i != 4 && i != 8 && i != 9 => v
        }.sum) / 100.0
      } catch { case _: Throwable => -1.0 }
    def snapshot(name: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val rt = Runtime.getRuntime
      snaps += ((name, infos.length, infos.map(_.memSize).sum,
        rt.totalMemory() - rt.freeMemory(), osBean.getSystemLoadAverage))
    }
    // per run: (wall, process-cpu, gc-time, external-busy) — external =
    // host busy minus our cpu over the window, clamped at 0 (clock skew)
    final case class RunMeas(wall: Double, cpu: Double, gc: Double, ext: Double)
    val resultsRun = ordered.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val c0 = processCpuSec
        val g0 = gcSec
        val h0 = hostBusySec
        val ok = try { force(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 >= 0) processCpuSec - c0 else -1.0
        val gc = gcSec - g0
        // BOTH window endpoints must have measured (a transient failed
        // close read returns -1, and clamping (-1 − h0) − cpu to 0
        // would record a contended window as a VALID-looking zero)
        val h1 = hostBusySec
        val ext =
          if (h0 >= 0 && h1 >= 0 && cpu >= 0) math.max(0.0, (h1 - h0) - cpu)
          else -1.0
        // between runs AND queries: deterministically drop dead
        // localCheckpoint blocks + cached frames (r10's System.gc()
        // approach did not hold in the driver's environment —
        // d_components measured 14.9 s there vs its 3.4 s steady
        // state; see SessionHygiene for why GC-mediated cleanup lags)
        graft.core.SessionHygiene.flush(spark)
        RunMeas(if (ok) elapsed else -1.0, cpu, gc, ext)
      }
      snapshot(name)
      val steady = times.drop(1).filter(_.wall >= 0)
      val best =
        if (steady.nonEmpty) steady.minBy(_.wall)
        else if (times.exists(_.wall >= 0)) times.filter(_.wall >= 0).minBy(_.wall)
        else RunMeas(-1.0, -1.0, -1.0, -1.0)
      name -> best
    }
    val resultsCpu = resultsRun.sortBy(_._1)
    val results = resultsCpu.map { case (k, m) => (k, m.wall) }
    // stdout JSON must stay comfortably under the driver's 2000-byte
    // tail-capture window (BENCH r9 came back "parsed": null because the
    // 89-query line at 3 decimals + trailing sbt output overflowed it):
    // 2 decimals with trailing zeros stripped, and the compact field set
    // below. BENCH_SELF.json keeps the full-fidelity copy.
    def jnum(v: Double, dec: Int = 2): String = {
      val s = String.format(s"%.${dec}f", Double.box(v))
      if (s.contains('.')) {
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      } else s
    }
    def qsAt(dec: Int) = results
      .map { case (k, v) => "\"" + k + "\":" + jnum(v, dec) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // loud failure channel: any unexpected ERROR-level log event during
    // the run lands in the artifact itself (count + first message), not
    // just in a stack trace a parser would skip
    val logErrs = graft.core.LogHygiene.errorCount
    def escape(m: String): String = m.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // stdout copy carries a BUDGETED slice of the first error (80 chars
    // pre-escape): the full message lives in BENCH_SELF.json; an
    // unbudgeted log_first (~340 bytes) would overflow the capture
    // window on exactly the runs where the failure channel matters
    def logFirstAt(maxChars: Int) = graft.core.LogHygiene.firstError
      .map(m => ",\"log_first\":\"" + escape(m.take(maxChars)) + "\"")
      .getOrElse("")
    val logFirstFull = logFirstAt(Int.MaxValue)
    // sf as basename only: the dir prefix is constant and the window is
    // byte-budgeted (see jnum note above)
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    // "cpu" (whole process-CPU seconds of the selected runs) rides every
    // stdout rung, now with its decomposition (r13 verdict #1: cpu alone
    // misattributed GC storms as real work): "gc" = GC seconds inside
    // cpu, "extcpu" = OTHER processes' busy cpu-seconds during the
    // suite, "maxload" = peak 1-min loadavg across snapshots, and the
    // verdict itself — "contended": external processes averaged more
    // than half a core over the suite. Calibration (this machine,
    // otherwise idle): the sbt parent JVM + session tooling floor is
    // ~0.3 cores during a forked bench, while r13-style contention
    // (host load 4-16) is 3-15 cores — 0.5 splits the two regimes with
    // an order of magnitude on the far side. A driver artifact now
    // carries its own adjudication: contended=false + totals at the
    // committed BENCH_CLEAN.json floors = trustworthy; contended=true
    // names the poisoned environment and the ext/gc columns say which
    // queries paid.
    def cpuField = {
      val c = resultsCpu.map(_._2.cpu).filter(_ >= 0).sum
      val g = resultsCpu.map(_._2.gc).filter(_ >= 0).sum
      val extMeas = resultsCpu.map(_._2.ext).filter(_ >= 0)
      val ext = extMeas.sum
      val wall = results.map(_._2).filter(_ >= 0).sum
      val maxLoad = if (snaps.nonEmpty) snaps.map(_._5).max else -1.0
      val contended = ext > 0.5 * wall
      (if (c > 0) ",\"cpu\":" + math.round(c) else "") +
        (if (c > 0) ",\"gc\":" + jnum(g, 1) else "") +
        // no measured window (host without /proc/stat) → OMIT both
        // fields rather than positively asserting extcpu:0 /
        // contended:false with no evidence behind them
        (if (extMeas.nonEmpty)
           ",\"extcpu\":" + math.round(ext) +
             (if (maxLoad >= 0) ",\"maxload\":" + jnum(maxLoad, 1) else "") +
             ",\"contended\":" + contended
         else "")
    }
    def lineAt(dec: Int, lf: String) =
      f"""{"metric":"total","value":${jnum(total)},"unit":"sec"$cpuField,"log_errors":$logErrs$lf,"queries":${qsAt(dec)},"sf":"$sfName"}"""
    // adaptive fallbacks, tried in order, so the emitted line can never
    // outgrow the driver's 2000-byte capture: full precision → 1
    // decimal → drop the error excerpt (the count stays; the text is in
    // BENCH_SELF.json) → integer seconds (per-query precision lives in
    // BENCH_SELF.json; the total keeps 2 decimals on every rung)
    // threshold 1950: the hard cap is the 2000-byte window itself (the
    // line prints last on a clean stdout, so only the newline follows);
    // 1950 leaves real margin while letting a ~98-query line keep
    // 1-decimal per-query times instead of degrading to integers.
    // Measured in UTF-8 BYTES, not chars — the capture window is a byte
    // window, and a log_first excerpt with multibyte characters would
    // otherwise pass the char check yet overflow the capture
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    // positional rung: when named per-query maps can't fit (125+ names
    // alone exceed the byte window), emit EVERY query at decisecond
    // precision as a positional array — "qv" lists values in
    // SORTED-NAME order (the exact key order of the "queries" map on
    // the richer rungs, of CORRECTNESS_r{N}.json, and of
    // BENCH_SELF.json), so per-query driver history covers the whole
    // corpus instead of shedding the fastest queries (r11 artifact
    // gap: 16 of 125 q_omitted). ~5 bytes/query: fits hundreds.
    def lineQv = {
      val vals = results.map { case (_, v) =>
        if (v < 0) "-1" else math.round(v * 10).toString }
      f"""{"metric":"total","value":${jnum(total)},"unit":"sec"$cpuField,"log_errors":$logErrs,"q_omitted":0,"qv_unit":"ds","qv_order":"name-asc","qv":[${vals.mkString(",")}],"sf":"$sfName"}"""
    }
    // ultimate rung: if even the positional array overflows, keep the
    // SLOWEST n queries — the ones a perf reader actually needs — and
    // say how many were dropped ("q_omitted"; the full map is always
    // in BENCH_SELF.json). n descends in steps of 8 until the line
    // fits; n=0 (just the total) always fits.
    def lineTopAt(n: Int) = {
      val kept = results.sortBy { case (k, v) => (-v, k) }.take(n).sortBy(_._1)
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + jnum(v, 0) }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":${jnum(total)},"unit":"sec"$cpuField,"log_errors":$logErrs,"q_omitted":${results.size - n},"queries":$qs,"sf":"$sfName"}"""
    }
    val json = (Seq(lineAt(2, logFirstAt(80)), lineAt(1, logFirstAt(80)),
        lineAt(1, ""), lineAt(0, ""), lineQv) ++
        (results.size to 0 by -8).map(lineTopAt))
      .find(bytes(_) <= 1950).getOrElse(lineTopAt(0))
    // file copy first (reliable channel regardless of stdout state) —
    // full fidelity: 3-decimal times, runs, the complete sf dir
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // snapshots in RUN order (that's the axis residue accumulates on):
    // [query, persistent RDD count, their bytes, driver used-heap bytes,
    //  host 1-min load average]
    val snapsJson = snaps.map { case (k, n, b, h, l) =>
      "[\"" + k + "\"," + n + "," + b + "," + h + "," + f"$l%.1f" + "]" }
      .mkString("[", ",", "]")
    // per-query process-CPU / GC / external-busy seconds of the SELECTED
    // (min-wall) run — the full attribution triplet: wall↑ cpu-at-floor
    // = starved; wall↑ cpu↑ gc↑ = GC storm under memory pressure;
    // wall↑ cpu↑ gc-flat ext-flat = real regression
    def qmap(sel: RunMeas => Double) = resultsCpu
      .map { case (k, m) => "\"" + k + "\":" + f"${sel(m)}%.3f" }
      .mkString("{", ",", "}")
    val cpuTotal = resultsCpu.map(_._2.cpu).filter(_ >= 0).sum
    val gcTotal = resultsCpu.map(_._2.gc).filter(_ >= 0).sum
    val extTotal = resultsCpu.map(_._2.ext).filter(_ >= 0).sum
    val maxLoadFull = if (snaps.nonEmpty) snaps.map(_._5).max else -1.0
    val contendedFull = extTotal > 0.5 * total
    val jsonFull = f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,"order":"$runOrder","cpu_total":$cpuTotal%.1f,"gc_total":$gcTotal%.1f,"ext_total":$extTotal%.1f,"max_load":$maxLoadFull%.1f,"contended":$contendedFull,"log_errors":$logErrs$logFirstFull,"queries":$qsFull,"query_cpu":${qmap(_.cpu)},"query_gc":${qmap(_.gc)},"query_ext":${qmap(_.ext)},"session_snaps":$snapsJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SELF.json"), jsonFull + "\n")
    catch { case _: Throwable => }
    // ...then the driver's stdout line, printed AFTER spark.stop() so no
    // executor/log4j output can interleave with it, with stdout kept
    // clean end to end: build.sbt forwards forked output raw (no sbt
    // "[info] " prefix) and routes all log4j2 output to stderr at ERROR
    // (rounds 1-4 all came back "parsed": null from prefix/log bleed)
    spark.stop()
    System.out.flush()
    println(json)
  }
}
