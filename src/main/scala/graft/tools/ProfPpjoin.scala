package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r20, verdict #4): d_ppjoin candidate-vs-verified counts —
  * how many pair rows the prefix filter admits vs how many survive the
  * exact-jaccard verify, plus the shingle/prefix stream sizes, so the
  * positional-filter decision is made on numbers, not guesses.
  * Usage: runMain graft.tools.ProfPpjoin [sfDir]
  */
object ProfPpjoin {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val threshold = if (args.length > 1) args(1).toDouble else 0.7
    val abNgram = args.length > 2 && args(2) == "ab"
    val docs = graft.core.Tables(spark, dir).documents
    // warm-up so the first stage doesn't pay codegen/classloading
    docs.write.mode("overwrite").format("noop").save()
    if (abNgram) {
      // back-to-back engine A/B at this threshold: same cap, same docs
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.mode("overwrite").format("noop").save()
      (1 to 3).foreach { r =>
        var t = System.nanoTime()
        noop(graft.operators.Dedup.ngramJaccard(docs, threshold,
          maxDocFreq = Some(100L)))
        val tn = (System.nanoTime() - t) / 1e9
        graft.core.SessionHygiene.flush(spark)
        t = System.nanoTime()
        noop(graft.operators.Dedup.jaccardJoinPrefix(docs, threshold,
          maxDocFreq = Some(100L)))
        val tp = (System.nanoTime() - t) / 1e9
        graft.core.SessionHygiene.flush(spark)
        System.err.println(f"[ppjoin] ab run $r theta=$threshold ngram $tn%.2f s  prefix $tp%.2f s")
      }
      spark.stop(); return
    }
    val (prefix, cand, out) = graft.operators.Dedup.ppjoinParts(docs,
      threshold = threshold, n = 3, textCol = "text", idCol = "doc_id",
      maxDocFreq = Some(100L), materialize = true)
    var prev = System.nanoTime()
    def timed(name: String, v: => Long): Unit = {
      val r = v
      val now = System.nanoTime()
      System.err.println(f"[ppjoin] $name%-22s $r%,12d  (+${(now - prev) / 1e9}%.2f s)")
      prev = now
    }
    timed("prefix_rows", prefix.count())
    timed("candidate_pairs", cand.count())
    timed("verified_pairs", out.count())
    spark.stop()
  }
}
