package graft.examples

import graft.operators.CurationStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Epoch-cost curve for the STREAMING curation path:
  * `runMain graft.examples.ProfileCurationStream [sfDir] [epochs] [compactEvery]`
  * ingests the documents table as N id-hashed micro-batches and prints
  * each epoch's ingest seconds, BYTES READ (executor inputMetrics —
  * the accumulated-side scan cost the wall clock can hide while
  * everything fits in page cache), and the state tree's file/partition
  * counts (the listing cost driver), plus the final consolidation.
  * `compactEvery` > 0 folds the state through [[CurationStream]]'s
  * WIRED `foldEvery` policy knob (r16: the profiler makes no manual
  * [[CurationStream.compactState]] calls — the bounded curve is the
  * knob's own behavior); 0 (default) never folds, reproducing the
  * unbounded-layout curve. A `fold` marker prints on epochs where the
  * policy raised the fold watermark (the fold's cost is inside that
  * epoch's ingest seconds — it runs on the driver path between
  * micro-batches). The steady-state questions the one-shot gate can't answer:
  * per-epoch cost must stay BOUNDED by (batch size + accumulated-index
  * scan), and with folding the accumulated-side file count must stay
  * FLAT instead of growing ~28 files/epoch. See SCALING.md "Streaming"
  * for the recorded curves. */
object ProfileCurationStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val epochs = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val compactEvery = args.lift(2).flatMap(_.toIntOption).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.core.Tables(spark, dir).documents
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()   // MemoryStream-style driver feed (profiler scaffold)
    val root = java.nio.file.Files.createTempDirectory("graft-cstream-prof")
    val state = s"$root/state"
    // executor-side bytes read (all sources — accumulated state plus
    // the in-memory batch contributes ~0): listener events drain async,
    // so each reading polls until the counter is quiescent
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def bytesNow(): Long = {
      var prev = -1L
      var cur = bytesRead.get()
      while (cur != prev) { Thread.sleep(150); prev = cur; cur = bytesRead.get() }
      cur
    }
    def treeStats(): (Long, Long) = { // (files, __epoch= partition dirs)
      def walk(f: java.io.File): (Long, Long) =
        if (f.isFile) (1L, 0L)
        else {
          val kids = Option(f.listFiles()).getOrElse(Array.empty)
          val sub = kids.map(walk)
          (sub.map(_._1).sum,
            sub.map(_._2).sum + (if (f.getName.startsWith("__epoch=")) 1L else 0L))
        }
      if (!new java.io.File(state).exists()) (0L, 0L) else walk(new java.io.File(state))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      (0 until epochs).foreach { e =>
        val part = docs.filter(d => java.lang.Math.floorMod(d._1, epochs.toLong) == e)
        val b0 = bytesNow()
        val w0 = CurationStream.foldWatermark(spark, state)
        val t = time {
          val b = part.toSeq.toDF("doc_id", "text")
          val ids = b.select(col("doc_id")).filter(col("doc_id") < 2000)
          CurationStream.ingestEpoch(b,
            MultiModalCurationExample.epochImages(ids),
            MultiModalCurationExample.epochHashClips(ids),
            state, e.toLong, foldEvery = compactEvery)
        }
        val readMb = (bytesNow() - b0) / 1e6
        val folded = CurationStream.foldWatermark(spark, state) > w0
        val (files, parts) = treeStats()
        println(f"PROF epoch $e%3d  docs=${part.length}%6d  $t%6.2f s  read=$readMb%8.1f MB  files=$files%5d  epochDirs=$parts%4d" +
          (if (folded) "  fold" else ""))
      }
      val b0 = bytesNow()
      val tFin = time {
        CurationStream.finalizeCorpus(spark, state)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROF finalize          $tFin%6.2f s  read=${(bytesNow() - b0) / 1e6}%8.1f MB")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      spark.stop()
    }
  }
}
