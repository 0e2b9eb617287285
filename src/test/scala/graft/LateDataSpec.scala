package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark/late-data semantics of the q30 construction at row scale:
  * a maxFilesPerTrigger=1 file stream whose batch order is fixed by
  * file modification times, append-mode 1-hour windows, 30-minute
  * watermark.
  *
  * Spark's drop rule (measured here, and what the q30 oracle mirrors):
  * the late-row filter of batch N uses the watermark EVICTION used at
  * the end of batch N-1 — i.e. max event time through batch N-2 minus
  * the delay. A late row is dropped iff its window was already emitted
  * in a PRIOR batch (the filter exactly guards re-creating evicted
  * state — never a duplicate emission, never a silent drop of an
  * open window). So the late slice must arrive two batches after the
  * bulk for the bulk's max timestamp to gate it — hence the q30
  * sequence bulk → advance → late → sentinel. */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("late row for an evicted window is dropped; open-window late row aggregates") {
    val stage = java.nio.file.Files.createTempDirectory("graft-latespec").toString
    val t0 = System.currentTimeMillis() - 120000L
    // batch 0 (bulk): 10:10, 12:00 — wm candidate after it: 11:30
    val f0 = Seq((ts("2024-01-01 10:10:00"), "x", 1.0),
                 (ts("2024-01-01 12:00:00"), "x", 1.0))
      .toDF("ts", "event_type", "value")
    // batch 1 (advance): processed with filter-wm 0 (all kept); at its
    // END eviction runs with wm 11:30 and emits window [10:00,11:00)
    val f1 = Seq((ts("2024-01-01 12:00:00"), "x", 1.0))
      .toDF("ts", "event_type", "value")
    // batch 2 (late slice): filter-wm now 11:30 — 10:20's window
    // [10:00,11:00) was evicted → DROPPED; 11:50's window [11:00,12:00)
    // end 12:00 > 11:30 is still open → kept
    val f2 = Seq((ts("2024-01-01 10:20:00"), "x", 10.0),
                 (ts("2024-01-01 11:50:00"), "x", 100.0))
      .toDF("ts", "event_type", "value")
    // batch 3: far-future sentinel flushes all real windows
    val f3 = Seq((ts("2024-01-01 20:00:00"), "__wm_flush", 0.0))
      .toDF("ts", "event_type", "value")
    graft.queries.StreamQueries.stageOneFile(f0, s"$stage/in/0.parquet", t0)
    graft.queries.StreamQueries.stageOneFile(f1, s"$stage/in/1.parquet", t0 + 10000L)
    graft.queries.StreamQueries.stageOneFile(f2, s"$stage/in/2.parquet", t0 + 20000L)
    graft.queries.StreamQueries.stageOneFile(f3, s"$stage/in/3.parquet", t0 + 30000L)
    val streamed = spark.readStream.schema(f0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/in")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("s"))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Double)]
    var batches = 0
    Streams.runAvailableNow(streamed, OutputMode.Append()) { b =>
      emitted ++= b.collect().map(r =>
        (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      batches += 1
    }
    val rows = emitted.sortBy(_._1)
    assert(rows == Seq(
      ("2024-01-01 10:00:00.0", "x", 1L, 1.0),   // late 10:20 dropped
      ("2024-01-01 11:00:00.0", "x", 1L, 100.0), // late 11:50 kept
      ("2024-01-01 12:00:00.0", "x", 2L, 2.0)    // bulk + advance row
    ), s"emitted: $rows (batches=$batches)")
    // the sentinel's own window never emitted, one batch per file ran
    assert(!rows.exists(_._2 == "__wm_flush"))
    assert(batches >= 4, s"expected >=4 foreachBatch calls, got $batches")
  }
}
