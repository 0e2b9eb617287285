package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component timing for the flagship `mm_curation` gate:
  * `runMain graft.examples.ProfileCuration [sfDir]` times the text
  * funnel, each media lane, and the full composition separately
  * (3 runs each, min of the warm ones). Measured at sf0.1: the gate's
  * ~9 s is ~6.4 s of `Curation.curate` itself — the production funnel
  * shape's fixed floor at a 5k-doc corpus (two checkpoint
  * materializations + the iterative components rounds serialize) —
  * plus ~0.7 s per decode lane; the same funnel is sub-linear upward
  * (22.4 s at 50k docs in the 10× soak), so the floor amortizes at
  * scale rather than growing. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables
    import graft.operators.Curation
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"PROF $tag%-12s min=${ts.drop(1).min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val docs = Tables(spark, dir).documents
    val ids = docs.select("doc_id").filter(col("doc_id") < 2000)
    time("curate") { force(Curation.curate(docs)) }
    time("imgLane") { force(MultiModalCurationExample.imageLosers(
      MultiModalCurationExample.plantedImages(ids))) }
    time("audLane") { force(MultiModalCurationExample.audioLosers(
      MultiModalCurationExample.plantedHashClips(ids))) }
    time("full") { force(graft.queries.LlmOps.mmCuration(spark, dir)) }
    spark.stop()
  }
}
