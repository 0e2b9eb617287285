package graft.queries

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gated queries exercising the PIPELINE layer itself — the
  * `Pipeline.root(source).combinator...` surface (ref
  * `pipeline.go:60-136`) — rather than plain DataFrame shapes. These
  * upgrade §2 rows that previously had only unit coverage (io.From,
  * Processor/FlatMap, str.Split, file.Text) to DuckDB-oracled gates.
  */
object PipelineQueries {

  /** io.From (ListSource) under oracle: a bounded in-memory root
    * mapped through a pipeline stage. The reference's From is the
    * canonical example root (`io/list.go:27-29`); the gate pins the
    * uniq-indexed order contract (element i keeps uniq=i through maps).
    * Scale: the list parallelizes across ≤32 splits at read. */
  def pFromList(spark: SparkSession, dir: String): DataFrame =
    Pipeline(spark)
      .root(ListSource((0 until 500).map(_.toString)))
      .map(StringType)(v => concat(v, lit("!")))
      .df
      .select(col("uniq").as("i"), col("value"))
      .orderBy("i")

  /** Processor/FlatMap + str.Split under oracle: a parquet TABLE root
    * ([[TableSource]]) split on a literal separator, emitting every
    * token WITH its fan-out position — the order-preserving flatMap
    * contract (`processor.go:203-270`: children keep parent order) is
    * what the oracle hash-checks, token by token, position by position.
    *
    * Scale: the doc_id filter sits on the pre-explode struct field, and
    * Catalyst collapses `struct(uniq,·).major` back to the scan column,
    * so the predicate pushes below the generator into the parquet scan
    * (PlanSpec pins pushdown shapes for the same pattern elsewhere);
    * the explode is generator-streamed, never buffered per doc. */
  def pSplitFlatmap(spark: SparkSession, dir: String): DataFrame =
    Pipeline(spark)
      .root(TableSource(s"$dir/documents.parquet", "text", "doc_id"))
      .split(" ")
      .df
      .filter(col("uniq.major") < 40)
      .select(col("uniq.major").as("doc_id"),
        col("uniq.minor").cast(LongType).as("pos"),
        col("value").as("tok"))
      .orderBy("doc_id", "pos")

  /** file.Text (TextFileSource) under oracle: documents staged to real
    * line-oriented text files, read back through the file root, lines
    * compared to the table they came from. The staged files are
    * per-call scratch: the flow is materialized (eager localCheckpoint)
    * BEFORE the directory is deleted, because the gate's frame is
    * executed again later by Verify/Bench actions.
    *
    * Scale: `spark.read.text` distributes line splitting across file
    * splits; the checkpoint is gate-hygiene, not part of the operator. */
  def pTextFile(spark: SparkSession, dir: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft-textsrc").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 200)
      .select(col("text"))   // no embedded newlines in the fixture: 1 doc = 1 line
      .write.mode("overwrite").text(s"$stage/txt")
    try
      Pipeline(spark)
        .root(TextFileSource(s"$stage/txt"))
        .filter(v => length(v) > 0)
        .df
        .select(col("value"))
        .orderBy("value")
        .localCheckpoint(true)
    finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
  }
}
