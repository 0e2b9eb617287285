package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scale design: every accessor is a plain `spark.read.parquet` scan so
  * Catalyst sees the file source directly — predicate pushdown, column
  * pruning and partition pruning all reach the parquet reader. At 100 TB
  * the same code path works unchanged against a partitioned table dir;
  * nothing here materializes or caches driver-side.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** The driver wrote events.ts as parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; read nanos as long and convert to the
    * session's micros timestamp (values are micro-aligned; lossless). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, NOT `/`: int64 nanos exceed double's 53-bit mantissa,
    // so float division rounds the microsecond off by ±1.
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so the full corpus is
    * queryable through `spark.sql(...)` — the SQL-first entry point
    * (Catalyst plans SQL and DataFrame code identically). */
  def registerViews(): Unit = {
    Seq("region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }
}
