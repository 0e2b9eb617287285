package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE named [[SparkEntry.queries]] entry against a
  * testdata dir and print the result (and optionally the formatted
  * plan) — the single-query loop for iterating on an operator without
  * a full Verify pass. Usage:
  * `runMain graft.RunOne <sfDir> <queryName> [--plan]` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (showPlan)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    df.show(50, truncate = false)
    println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
