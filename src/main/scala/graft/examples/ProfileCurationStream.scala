package graft.examples

import graft.operators.CurationStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Epoch-cost curve for the STREAMING curation path:
  * `runMain graft.examples.ProfileCurationStream [sfDir] [epochs]`
  * ingests the documents table as N id-hashed micro-batches and prints
  * each epoch's ingest seconds plus the final consolidation — the
  * steady-state question the one-shot gate can't answer: per-epoch
  * cost must stay BOUNDED by (batch size + accumulated-index SCAN), not
  * grow with epoch count. Each epoch's batch shrinks as N grows (same
  * corpus split N ways), so a flat-or-falling curve past the first few
  * epochs means the accumulated-side reads (listings + parquet scans
  * of `__epoch < e` partitions) are not compounding. See SCALING.md
  * "Streaming" for the recorded curve. */
object ProfileCurationStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val epochs = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      (0 until epochs).foreach { e =>
        val part = docs.filter(d => java.lang.Math.floorMod(d._1, epochs.toLong) == e)
        val t = time {
          val b = part.toSeq.toDF("doc_id", "text")
          val ids = b.select(col("doc_id")).filter(col("doc_id") < 2000)
          CurationStream.ingestEpoch(b,
            MultiModalCurationExample.epochImages(ids),
            MultiModalCurationExample.epochHashClips(ids),
            state, e.toLong)
        }
        println(f"PROF epoch $e%2d  docs=${part.length}%6d  $t%6.2f s")
      }
      val tFin = time {
        CurationStream.finalizeCorpus(spark, state)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"PROF finalize          $tFin%6.2f s")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      spark.stop()
    }
  }
}
