package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler (r20): run named stream gates with per-job accounting
  * (count, wall between jobs, task-time, call sites) — the measurement
  * behind the r20 verdict #5 item (q30/q31/q38/q39 fixed overhead; the
  * UI is off under Bench so a listener is the only channel). Usage:
  *   runMain graft.tools.ProfStream [sfDir] [q1,q2,...] [repeat]
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "q30_late_data")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val repeat = if (args.length > 2) args(2).toInt else 2
    val unknown = names.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: $unknown")
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
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.LogHygiene.install()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val sites = java.util.Collections.synchronizedMap(
      new java.util.TreeMap[String, Integer]())
    // per-job trace of the last run: (jobId, site, startNs, endNs)
    final case class JobRow(id: Int, site: String, var t0: Long, var t1: Long)
    val trace = java.util.Collections.synchronizedMap(
      new java.util.TreeMap[Integer, JobRow]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = Option(s.properties.getProperty("callSite.short"))
            .getOrElse("?")
          sites.merge(site, 1, (a, b) => a + b)
          trace.put(s.jobId, JobRow(s.jobId, site, System.nanoTime(), -1L))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val r = trace.get(e.jobId)
          if (r != null) r.t1 = System.nanoTime()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      })

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up (codegen/JIT/footers), not measured
    try force(graft.SparkEntry.queries("q1_agg")(spark, dir)) catch { case _: Throwable => }

    names.foreach { name =>
      (1 to repeat).foreach { r =>
        sites.clear(); trace.clear()
        val (j0, m0, k0, t0) = (jobs.get(), taskMs.get(), tasks.get(), System.nanoTime())
        force(graft.SparkEntry.queries(name)(spark, dir))
        Thread.sleep(200) // drain trailing listener events
        val wallEnd = System.nanoTime()
        System.err.println(f"[prof] $name run $r: wall ${(wallEnd - t0) / 1e9}%6.2f s  jobs ${jobs.get() - j0}%4d  tasks ${tasks.get() - k0}%5d  task-s ${(taskMs.get() - m0) / 1e3}%7.1f")
        if (r == repeat) {
          System.err.println(s"[prof] $name job trace (last run; gap = idle driver time since previous job end):")
          var prevEnd = t0
          trace.forEach { (_, row) =>
            val gap = (row.t0 - prevEnd) / 1e9
            val dur = if (row.t1 > 0) (row.t1 - row.t0) / 1e9 else -1.0
            System.err.println(f"[prof]   job ${row.id}%4d  gap $gap%6.2f s  dur $dur%6.2f s  ${row.site}")
            if (row.t1 > 0) prevEnd = row.t1
          }
          System.err.println(f"[prof]   tail-gap ${(wallEnd - prevEnd) / 1e9}%6.2f s")
        }
        graft.core.SessionHygiene.flush(spark)
      }
    }
    spark.stop()
  }
}
