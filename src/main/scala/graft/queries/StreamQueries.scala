package graft.queries

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Correctness-gated Structured Streaming queries: real `readStream`
  * plans run to completion of available data (AvailableNow ≙ the
  * reference's "Limit makes any pipeline bounded", `def.go:88-91`), so
  * the gate exercises the streaming engine end-to-end — source →
  * stateful agg → sink — not just batch twins of streaming ops.
  */
object StreamQueries {

  /** q27: the documents table replayed as a micro-batch FILE STREAM,
    * aggregated with a streaming groupBy in Complete mode, final state
    * returned as a batch frame for the DuckDB oracle.
    *
    * Scale: the file stream admits files per trigger
    * (maxFilesPerTrigger), the aggregation is keyed state in the state
    * store (partitioned by the grouping key across executors), and the
    * checkpoint makes the run resumable — the same plan, pointed at a
    * Kafka topic instead of a directory, is the production pipeline. */
  def q27StreamE2e(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    // file stream sources need an explicit schema: take it from a batch
    // read of the same path (footer-only, no data scan)
    val schema = spark.read.parquet(path).schema
    // the stream's basePath must be a DIRECTORY: stream the table dir
    // with a glob filter selecting just this table's file(s)
    val streamed = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"))
    var last: Array[Row] = Array.empty
    Streams.runAvailableNow(streamed, OutputMode.Complete()) { b =>
      last = b.collect() // final Complete-mode state: |langs × sources| rows
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(last.toSeq),
        streamed.schema)
      .orderBy("lang", "source")
  }
}
