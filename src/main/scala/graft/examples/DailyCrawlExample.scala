package graft.examples

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The daily-crawl curation pipeline, end to end — the composition the
  * round-5 operator family exists for. A standing corpus plus today's
  * batch go in; a deduplicated, decontaminated, rebalanced, chunked and
  * deterministically sharded training delta comes out. Run with
  * `sbt "runMain graft.examples.DailyCrawlExample [sfDir]"`.
  *
  * Every step is a lazy DataFrame transform; the only driver-side
  * artifacts are the Bloom filter bytes (one array) and the printed
  * counts. At 100 TB: the corpus is scanned once (bloom build), today's
  * batch twice (map-side probes), and the only shuffles are keyed aggs
  * over batch-sized or vocabulary-sized data.
  */
object DailyCrawlExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bucket = Sampling.hashBucket(col("doc_id"))
    val corpus = docs.filter(bucket >= 20)     // the standing corpus
    val batch = docs.filter(bucket < 20)       // "today's crawl"
    val benchmark = docs.filter(bucket >= 95)  // held-out eval set

    // 1. exact dedup against the corpus: novel docs only
    val novel = BloomDedup.incrementalExact(batch, corpus)
      .filter(col("dup_of").isNull)
      .select(col("id").as("doc_id"))
      .join(batch, "doc_id")
    // 2. near-dup removal against the corpus (LSH + jaccard verify)
    val nearDupIds = BloomDedup.incrementalLsh(novel, corpus, threshold = 0.5)
      .select(col("id").as("doc_id")).distinct()
    val fresh = novel.join(nearDupIds, Seq("doc_id"), "left_anti")
    // 3. benchmark decontamination
    val clean = Decontaminate.removeContaminated(fresh, benchmark, n = 8)
    // 4. quality gates (per-row signals; corpus-LM score shown separately)
    val gated = clean.filter(graft.functions.Text.qualityScore(col("text")) > 0.3)
    // 5. domain rebalancing toward target shares
    val mixed = Sampling.rebalanceBySource(gated, "source", Map("src0" -> 0.01))
    // 6. chunk for the context window, shard deterministically for export
    val chunks = Chunker.chunkTokens(mixed, chunkSize = 50, overlap = 10)
    val sharded = Sampling.shuffleDeterministic(chunks, "id", shards = 8)

    println(s"batch=${batch.count()} novel=${novel.count()} fresh=${fresh.count()} " +
      s"clean=${clean.count()} gated=${gated.count()} mixed=${mixed.count()} " +
      s"chunks=${chunks.count()} shards=${sharded.select("shard").distinct().count()}")
    spark.stop()
  }
}
