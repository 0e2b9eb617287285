package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused re-timing of individual soak entries over the /tmp/soak
  * corpus written by [[ScaleSoak]] (run that first). */
object SoakFocus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/soak/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s  (result=$r)")
    }
    import graft.operators._
    args.foreach {
      case "winnow" => time("winnow") {
        Dedup.winnowPairs(docs, 10, k = 24, window = 8, maxDocFreq = Some(200L)).count() }
      case "winnowfast" => time("winnowfast") {
        Dedup.winnowPairsFast(docs, 10, k = 24, window = 8, maxDocFreq = Some(200L)).count() }
      case "curate" => time("curate") { Curation.curate(docs).count() }
      case "ngram" => time("ngram") {
        Dedup.ngramJaccard(docs, 0.5, maxDocFreq = Some(1000L)).count() }
      case other => println(s"unknown: $other")
    }
    spark.stop()
  }
}
