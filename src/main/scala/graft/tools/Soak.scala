package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev soak harness: run named [[graft.SparkEntry.queries]] entries N
  * times in ONE JVM and report per-iteration wall times — catches
  * state-store growth, checkpoint-block leaks, and listener/session
  * aging that a single run (or a fresh-JVM-per-run loop) hides.
  * Usage: `runMain graft.tools.Soak <sfDir> <n> <query> [query...]` */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val times = (1 to n).map { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[soak] $name iter $i: $s%.2f s")
        s
      }
      val drift = if (times.head > 0) times.last / times.head else -1.0
      println(f"[soak] $name n=$n min=${times.min}%.2f max=${times.max}%.2f " +
        f"last/first=$drift%.2f")
    }
    spark.stop()
  }
}
