package graft.tools

import graft.operators.CurationStream
import graft.examples.MultiModalCurationExample
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r19): the mm_curation_stream gate broken into phases
  * with wall + job/task-time per phase — the measurement behind any
  * change to CurationStream (the suite's heaviest gate, and one the
  * Spark UI cannot profile here since Bench runs with the UI off).
  * Usage: runMain graft.tools.ProfCurStream [sfDir] [repeat]
  */
object ProfCurStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.LogHygiene.install()

    // per-phase job/task accounting
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val sites = java.util.Collections.synchronizedMap(
      new java.util.TreeMap[String, Integer]())
    // per-lane attribution (r20): jobs launched from ingestEpoch's
    // parallel lanes carry a graft-cs:<lane> description; aggregate
    // job count + task-ms per label so the epoch's task time
    // decomposes by lane
    val laneJobs = java.util.Collections.synchronizedMap(
      new java.util.TreeMap[String, Integer]())
    val laneTaskMs = java.util.Collections.synchronizedMap(
      new java.util.TreeMap[String, java.lang.Long]())
    val stageLane = java.util.Collections.synchronizedMap(
      new java.util.HashMap[Integer, String]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = Option(s.properties.getProperty("callSite.short"))
            .getOrElse("?")
          sites.merge(site, 1, (a, b) => a + b)
          val lane = Option(s.properties.getProperty("spark.job.description"))
            .filter(_.startsWith("graft-cs:")).getOrElse("other")
          laneJobs.merge(lane, 1, (a, b) => a + b)
          s.stageIds.foreach(id => stageLane.put(id, lane))
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
            val lane = Option(stageLane.get(t.stageId)).getOrElse("other")
            laneTaskMs.merge(lane, t.taskMetrics.executorRunTime,
              (a, b) => a + b)
          }
      })
    def phase[T](name: String)(body: => T): T = {
      val (j0, m0, t0) = (jobs.get(), taskMs.get(), System.nanoTime())
      val r = body
      Thread.sleep(150) // let trailing listener events drain
      System.err.println(f"[prof] $name%-28s wall ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs ${jobs.get() - j0}%4d  task-s ${(taskMs.get() - m0) / 1e3}%8.1f")
      r
    }

    (1 to repeat).foreach { round =>
      System.err.println(s"== round $round ==")
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val docs = graft.core.Tables(spark, dir).documents
      val rows = phase("collect-input") {
        docs.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)].collect()
      }
      val epochs = 3
      val byEpoch = (0 until epochs).map(e =>
        rows.filter(r => java.lang.Math.floorMod(r._1, epochs.toLong) == e))
      val root = java.nio.file.Files.createTempDirectory("graft-prof-cs").toString
      val stateDir = s"$root/state"
      try {
        val mem = MemoryStream[(Long, String)]
        val q = mem.toDF().toDF("doc_id", "text").writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, epochId: Long) =>
            val ids = b.select(col("doc_id")).filter(col("doc_id") < 2000)
            phase(s"ingest-epoch-$epochId") {
              CurationStream.ingestEpoch(b,
                MultiModalCurationExample.epochImages(ids),
                MultiModalCurationExample.epochHashClips(ids),
                stateDir, epochId, foldEvery = 2)
            }
          }
          .option("checkpointLocation", s"$root/ckpt")
          .start()
        try {
          byEpoch.foreach { part =>
            mem.addData(part.toSeq: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
        phase("finalize") {
          CurationStream.finalizeCorpus(spark, stateDir)
            .orderBy("doc_id").localCheckpoint(true)
        }
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      graft.core.SessionHygiene.flush(spark)
    }
    System.err.println("== job call sites ==")
    sites.forEach((k, v) => System.err.println(f"[prof]   $v%5d  $k"))
    System.err.println("== lane attribution (jobs / task-s, whole run) ==")
    laneJobs.forEach((k, v) => System.err.println(
      f"[prof]   $k%-18s jobs $v%5d  task-s ${laneTaskMs.getOrDefault(k, 0L) / 1e3}%8.1f"))
    spark.stop()
  }
}
