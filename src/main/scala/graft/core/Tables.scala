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
  /** The fixture's `ts` column has shipped in two shapes across driver
    * regenerations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects unless surfaced as raw longs — and plain
    * timestamp[us] (read as TIMESTAMP_NTZ). Branch on what the file
    * actually contains so either fixture loads; downstream queries
    * always see a session-zone TIMESTAMP (all entry points pin UTC, so
    * the NTZ cast is value-preserving). */
  def events: DataFrame = normalizeEventsTs(rawEvents)

  /** The fixture as the file presents it (`ts` still raw). ALSO the
    * schema source for streaming replays of the table (`readStream`
    * requires an explicit schema) — going through here keeps the
    * legacy-NANOS conf handling in one place. */
  def rawEvents: DataFrame =
    try t("events")
    catch {
      // legacy NANOS fixture: schema inference throws on the footer
      // unless nanos are read as longs. The conf is session-sticky by
      // design — only set on this path, and ONLY for the specific
      // illegal-timestamp error, so neither a micros fixture nor an
      // unrelated failure (missing file, IO error) flips global read
      // semantics.
      case e: Exception if isNanosSchemaError(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        t("events")
    }

  private def isNanosSchemaError(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5).exists { c =>
      val m = Option(c.getMessage).getOrElse("")
      m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type") ||
        m.contains("TIMESTAMP(NANOS")
    }

  /** One dtype policy for every replay of the events fixture (batch
    * accessor above, streaming file replays in tests): whatever shape
    * `ts` arrived in, downstream sees a session-zone TIMESTAMP. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: int64 nanos exceed double's 53-bit
        // mantissa, so float division rounds the microsecond off by ±1.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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
