package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (beyond-reference, north star): find and
  * remove training documents that leak evaluation data — docs sharing
  * word-n-gram overlap with a (small) test/benchmark set. Standard
  * practice before LLM training runs (n-gram overlap decontamination,
  * typically n around 8-13 tokens).
  *
  * Scale design: the TEST side is small by definition (benchmarks are
  * thousands of docs, the corpus is billions) — its distinct shingle
  * set BROADCASTS, so the corpus-side check is a map-side semi-join:
  * the 100 TB corpus is scanned once, never shuffled, and only matching
  * (corpus doc, shingle) rows proceed to the tiny count aggregation.
  */
object Decontaminate {

  /** (id, test_id, shared) for every corpus doc sharing at least
    * `minShared` distinct word-`n`-grams with a test doc. Both sides
    * tokenize identically to [[Dedup.shingleSet]] (whitespace tokens,
    * space-joined n-grams). */
  def contaminatedPairs(corpus: DataFrame, testSet: DataFrame, n: Int = 8,
                        minShared: Long = 1, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val c = Dedup.shingleSet(corpus, textCol, idCol, n)
    val t = Dedup.shingleSet(testSet, textCol, idCol, n)
      .withColumnRenamed("id", "test_id")
    c.join(broadcast(t), "sh")
      .groupBy("id", "test_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The corpus with contaminated docs REMOVED (left-anti against the
    * flagged ids) — the actual pre-training step. */
  def removeContaminated(corpus: DataFrame, testSet: DataFrame, n: Int = 8,
                         minShared: Long = 1, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val flagged = contaminatedPairs(corpus, testSet, n, minShared, textCol, idCol)
      .select(col("id").as(idCol)).distinct()
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
