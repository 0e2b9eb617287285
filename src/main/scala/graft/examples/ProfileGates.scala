package graft.examples

import org.apache.spark.sql.SparkSession

/** Targeted per-gate timing: `runMain graft.examples.ProfileGates
  * <sfDir> <gate> [<gate> ...]` — same session config as Bench, three
  * runs per gate (discard first, min of rest), one line per gate.
  * For iterating on a single operator without paying the full corpus.
  */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("d_incremental", "d_incr_lsh", "d_passages")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-18s min=${times.drop(1).min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
