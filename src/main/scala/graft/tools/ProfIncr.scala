package graft.tools

import graft.operators.{BloomDedup, Sampling, Stage}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the d_incr_lines stage budget (dev tool). */
object ProfIncr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $n: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val lined = graft.queries.LlmOps.pseudoLined(
        graft.core.Tables(spark, dir).documents)
      val bucket = Sampling.hashBucket(col("doc_id"))
      time("lined.count")(lined.count())
      val corpusLines = time("reuse(corpusLineHashes) construct")(
        Stage.reuse(BloomDedup.corpusLineHashes(lined.filter(bucket < 95))))
      time("corpusLines.count (materialize)")(corpusLines.count())
      val filt = time("buildFilter")(
        BloomDedup.buildFilter(corpusLines, hashCol = "lh"))
      println(s"[prof] bloom bytes: ${filt.map(_.length).getOrElse(0)}")
      val out = time("incrementalLineDedup construct")(
        BloomDedup.incrementalLineDedup(lined.filter(bucket >= 95), corpusLines, filt)
          .orderBy("doc_id"))
      time("out.noop-write")(out.write.mode("overwrite").format("noop").save())
      time("out.noop-write again")(out.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
