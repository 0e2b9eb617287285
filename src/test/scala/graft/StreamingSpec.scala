package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Streaming semantics (SURVEY §7.2-M4): the reference's unbounded
  * contracts on Structured Streaming + the windows/watermarks it lacks.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("unbounded source runs bounded via AvailableNow (≙ .Limit bounding, README.md:92)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Int]
    mem.addData(1 to 100: _*)
    val out = ArrayBuffer.empty[Long]
    Streams.runAvailableNow(mem.toDF().agg(sum("value").as("s")),
      OutputMode.Complete()) { b => out ++= b.collect().map(_.getLong(0)) }
    assert(out.last == 5050)
  }

  test("stream-built count-min sketch equals the batch-built one (additive state merge)") {
    import graft.operators.Sketches
    val keys = (1 to 60).map(i => s"k${i % 7}") // 7 keys, skewed counts
    val batch = keys.toDF("k")
    val expected = Sketches.cmsTable(batch, "k", depth = 3, width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // the SAME cmsTable call over a file stream fed one file per
    // trigger — three REAL micro-batches (a MemoryStream under
    // AvailableNow collapses to one batch regardless of addData
    // grouping: latestOffset ignores the read limit), so the sketch
    // state provably merges across batches
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-stream")
    try {
      keys.grouped(20).zipWithIndex.foreach { case (chunk, idx) =>
        chunk.toDF("k").coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/stage$idx")
        val part = new java.io.File(s"$dir/stage$idx").listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/in$idx.parquet"))
        new java.io.File(s"$dir/in$idx.parquet").setLastModified(1700000000000L + idx * 60000)
      }
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "in*.parquet")
        .parquet(dir.toString)
      val cells = Sketches.cmsTable(stream, "k", depth = 3, width = 8)
      var last: Array[org.apache.spark.sql.Row] = Array.empty
      var batches = 0
      Streams.runAvailableNow(cells, OutputMode.Complete()) { b =>
        batches += 1; last = b.collect()
      }
      assert(batches >= 3, s"expected >= 3 micro-batches, saw $batches")
      val streamed = last.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == expected)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("event-time tumbling window with watermark drops late data (beyond-reference M4)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val win = Streams.tumblingCounts(mem.toDF().toDF("ts", "v"), "ts", "10 minutes", "5 minutes")
    val collected = ArrayBuffer.empty[(Timestamp, Long)]
    val q = win.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { collected ++= b.collect().map(r => (r.getTimestamp(0), r.getLong(1))); () })
      .start()
    mem.addData((ts(1), "a"), (ts(4), "b"), (ts(12), "c"))
    q.processAllAvailable()
    mem.addData((ts(40), "d"))  // advances watermark to 10:35 → closes 10:00 & 10:10 windows
    q.processAllAvailable()
    mem.addData((ts(2), "late")) // behind watermark → dropped
    q.processAllAvailable()
    mem.addData((ts(59), "e"))   // closes the 10:40 window
    q.processAllAvailable()
    q.stop()
    val byWindow = collected.toMap
    assert(byWindow(ts(0)) == 2)   // 10:00 window: a,b — late arrival NOT counted
    assert(byWindow(ts(10)) == 1)  // 10:10 window: c
    assert(byWindow(ts(40)) == 1)  // 10:40 window: d
  }

  test("native session windows close after gap (beyond-reference M4)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sess = Streams.sessionCounts(mem.toDF().toDF("ts", "k"), "ts", "k",
      gap = "5 minutes", watermark = "0 seconds")
    val collected = ArrayBuffer.empty[(String, Timestamp, Long)]
    val q = sess.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { collected ++= b.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))); () })
      .start()
    mem.addData((ts(1), "u1"), (ts(3), "u1"), (ts(2), "u2"))
    q.processAllAvailable()
    mem.addData((ts(30), "u1")) // gap > 5min → earlier sessions close
    q.processAllAvailable()
    mem.addData((ts(59), "u1"))
    q.processAllAvailable()
    q.stop()
    assert(collected.contains(("u1", ts(1), 2L)))  // u1 session 10:01-10:03, 2 events
    assert(collected.contains(("u2", ts(2), 1L)))
    assert(collected.contains(("u1", ts(30), 1L)))
  }

  test("mapGroupsWithState running fold emits per trigger (≙ fold TriggerEvery, context.go:344-369)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val folded = Streams.runningSumPerKey(mem.toDS())
    val collected = ArrayBuffer.empty[(String, Long)]
    val q = folded.writeStream.outputMode("update")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        { collected ++= b.collect(); () })
      .start()
    mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    mem.addData(("a", 4L))
    q.processAllAvailable()
    q.stop()
    // running accumulator visible at each trigger: a→3 then a→7
    assert(collected.toSeq.filter(_._1 == "a") == Seq(("a", 3L), ("a", 7L)))
    assert(collected.contains(("b", 10L)))
  }

  test("TriggerEach(n) flush cadence with end-of-stream flush (README.md:96-97)") {
    val flushes = ArrayBuffer.empty[Int]
    val t = new Streams.CountTriggeredFlush(3, rows => flushes += rows.size)
    val df1 = (1 to 4).toDF("v")
    val df2 = (5 to 7).toDF("v")
    t.onBatch(df1)   // 4 pending → one flush of 3, 1 left
    t.onBatch(df2)   // 4 pending → one flush of 3, 1 left
    t.close()        // final flush of 1
    assert(flushes.toSeq == Seq(3, 3, 1))
  }

  test("throttle bounds per-trigger admission on an unbounded DSv2 root (ref .Throttle def.go:93-96)") {
    import graft.core._
    // root would admit all 60 rows in one poll; throttle(12) re-reads
    // the source with its admission knob set — every micro-batch ≤ 12
    val flow = Pipeline(spark)
      .root(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "60", "rowsperbatch" -> "60"), bounded = false))
      .throttle(12)
    assert(!flow.bounded && flow.df.isStreaming)
    val sizes = ArrayBuffer.empty[Int]
    val q = flow.df.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { val c = b.count().toInt; sizes.synchronized { sizes += c }; () })
      .start()
    val deadline = System.currentTimeMillis() + 60000
    while (sizes.synchronized(sizes.sum) < 60 && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
    }
    q.stop()
    assert(sizes.synchronized(sizes.sum) == 60)
    assert(sizes.synchronized(sizes.toSeq).forall(_ <= 12))
  }

  test("throttle replays downstream transforms onto the re-read root") {
    import graft.core._
    import org.apache.spark.sql.types._
    // bounded twin of the rebuild path: transforms declared BEFORE
    // throttle must survive the source re-read (xform replay)
    val flow = Pipeline(spark)
      .root(RoundRobinSource(10, Seq("1", "2", "3")))
      .map(IntegerType)(_.cast(IntegerType) * 10)
    val rebuilt = flow.copy(bounded = false).throttle(5)
    assert(rebuilt.df.columns.contains("value"))
    // RoundRobinSource is not Throttleable → documented no-op, df intact
    assert(rebuilt.df.select(sum("value")).head().getLong(0)
      == flow.df.select(sum("value")).head().getLong(0))
  }

  test("PartitionChunkedFlush flushes executor-side in n-sized chunks (scale TriggerEach)") {
    val batch = spark.range(100).toDF("v").repartition(4)
    StreamingSpec.chunks.synchronized { StreamingSpec.chunks.clear() }
    new Streams.PartitionChunkedFlush(8, StreamingSpec.recordChunk).onBatch(batch)
    val sizes = StreamingSpec.chunks.synchronized { StreamingSpec.chunks.map(_.size).toSeq }
    val values = StreamingSpec.chunks.synchronized {
      StreamingSpec.chunks.flatten.map(_.getLong(0)).toSeq }
    assert(values.sorted == (0L until 100L))       // exactly-once coverage
    assert(sizes.forall(_ <= 8))                   // never exceeds n
    assert(sizes.count(_ == 8) >= 100 / 8 - 4)     // mostly full chunks;
    // ≤1 remainder chunk per partition
    assert(sizes.count(_ < 8) <= 4)
  }

  test("runCountFlushAvailableNow wires the end-of-stream flush to termination") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Int]
    mem.addData(1 to 10: _*)
    val flushes = ArrayBuffer.empty[Int]
    Streams.runCountFlushAvailableNow(mem.toDF(), 4,
      rows => flushes += rows.size)
    // 10 rows → 4, 4, then the close()-driven remainder 2 — no manual
    // close() call anywhere
    assert(flushes.toSeq == Seq(4, 4, 2))
  }

  test("streaming KafkaLikeSource keeps the KVM column contract on an unbounded root") {
    import graft.core._
    val src = KafkaLikeSource(RateSource(100))
    val df = src.read(spark)
    assert(df.isStreaming)
    val vt = df.schema("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt.fieldNames.toSeq == Seq("key", "value", "headers"))
  }

  /** The core goconnect thesis (README.md:29): the same declarative
    * plan runs bounded or unbounded. Here the driver's events table is
    * replayed as a file STREAM and the windowed aggregation must equal
    * the batch run of q11_tumbling_window. */
  test("batch/stream parity: streaming tumbling agg over events == batch result") {
    // schema + ts-dtype policy come from Tables so this replay keeps
    // working whichever shape (legacy NANOS / timestamp[us]) the
    // driver's fixture ships in
    val tables = graft.core.Tables(spark, "/root/testdata/sf0.001")
    val schema = tables.rawEvents.schema
    // file stream sources consume directories: stage the table file
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val got = ArrayBuffer.empty[(Timestamp, String, Long)]
    Streams.runAvailableNow(streamed.toDF(), OutputMode.Complete()) { b =>
      got.clear()
      got ++= b.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    }
    val expected = graft.core.Tables(spark, "/root/testdata/sf0.001").events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
  }

  test("closedSessions: a late in-horizon event still merges sessions an in-batch gap separated") {
    // watermark 1 hour, gap 5 minutes: batch 1 delivers 10:00 and
    // 10:20 — an in-batch gap, but NOT closure: the watermark (9:20)
    // still admits events that could extend the 10:00 session. Batch 2
    // delivers exactly such a late event (10:03). A sessionizer that
    // emitted on the in-batch gap would have already shipped
    // (10:00, n=1) and now fragments the true session; the correct
    // output is ONE session (10:00-10:03, n=2), emitted only after the
    // watermark passes its close.
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = Streams.closedSessions(
      mem.toDF().toDF("k", "ts"), "k", "ts", gap = "5 minutes", watermark = "1 hour")
    val out = ArrayBuffer.empty[(String, Long, Timestamp, Timestamp)]
    val q = sessions.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Timestamp, Timestamp)], _: Long) =>
        { out.synchronized { out ++= b.collect() }; () })
      .start()
    mem.addData(("u1", t("10:00")), ("u1", t("10:20")))
    q.processAllAvailable()
    assert(out.synchronized(out.isEmpty),
      "nothing is provably closed while the watermark trails the gap")
    mem.addData(("u1", t("10:03"))) // late (wm = 9:20) but in-horizon
    q.processAllAvailable()
    mem.addData(("u1", t("12:00"))) // watermark -> 11:00: both sessions close
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toSeq)
    assert(got.contains(("u1", 2L, t("10:00"), t("10:03"))),
      s"expected the merged (10:00-10:03, n=2) session, got $got")
    assert(got.contains(("u1", 1L, t("10:20"), t("10:20"))))
    assert(!got.exists(s => s._2 == 1L && s._3 == t("10:00")),
      s"the 10:00 session must not be emitted fragmented, got $got")
  }

  test("closedSessions: an event at exactly end+gap opens a new session (session_window boundary)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = Streams.closedSessions(
      mem.toDF().toDF("k", "ts"), "k", "ts", gap = "5 minutes", watermark = "0 seconds")
    val out = ArrayBuffer.empty[(String, Long, Timestamp, Timestamp)]
    val q = sessions.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Timestamp, Timestamp)], _: Long) =>
        { out.synchronized { out ++= b.collect() }; () })
      .start()
    // 10:00 and 10:05 with gap 5m: native session_window treats
    // [10:00, 10:05) as exclusive — 10:05 is a NEW session
    mem.addData(("u1", ts(0)), ("u1", ts(5)))
    q.processAllAvailable()
    mem.addData(("u1", ts(59))) // advance watermark past both closes
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toSeq)
    assert(got.contains(("u1", 1L, ts(0), ts(0))) && got.contains(("u1", 1L, ts(5), ts(5))),
      s"boundary event must open a new session (session_window parity), got $got")
  }

  test("closedSessionsPreMerged: heavy key skew (one user = 50% of events) — identical sessions, hot-key rows collapsed pre-shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // u_hot: 100 sessions × 20 events (1 s cadence, sessions 10 min
    // apart) = 2000 events — half the fixture; u0..u9: 10 sessions × 20
    // events each = 2000 more. gap 5 min keeps sessions distinct.
    def session(k: String, startMs: Long, n: Int): Seq[(String, Timestamp)] =
      (0 until n).map(j => (k, new Timestamp(startMs + j * 1000L)))
    val hot = (0 until 100).flatMap(i => session("u_hot", base + i * 600000L, 20))
    val cold = (0 until 10).flatMap(u =>
      (0 until 10).flatMap(i => session(s"u$u", base + i * 600000L + u * 7000L, 20)))
    val events = (hot ++ cold).sortBy(_._2.getTime)
    val sentinel = ("u_hot", new Timestamp(base + 86400000L)) // closes everything
    val batches = events.grouped((events.size + 2) / 3).toSeq

    def run(premerged: Boolean,
            acc: Option[org.apache.spark.util.LongAccumulator]) = {
      val mem = MemoryStream[(String, Timestamp)]
      val df = mem.toDF().toDF("k", "ts")
      val sessions =
        if (premerged)
          Streams.closedSessionsPreMerged(df, "k", "ts", gap = "5 minutes",
            watermark = "30 minutes", preMergedRows = acc)
        else Streams.closedSessions(df, "k", "ts", gap = "5 minutes",
          watermark = "30 minutes")
      val out = ArrayBuffer.empty[(String, Long, Timestamp, Timestamp)]
      val q = sessions.writeStream.outputMode("append")
        .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Timestamp, Timestamp)], _: Long) =>
          { out.synchronized { out ++= b.collect() }; () })
        .start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(sentinel)
      q.processAllAvailable()
      q.stop()
      out.synchronized(out.toSeq)
    }

    val acc = spark.sparkContext.longAccumulator("premerged-intervals")
    val got = run(premerged = true, Some(acc))
    val ref = run(premerged = false, None)
    assert(got.toSet == ref.toSet,
      s"pre-merged path diverged: only-premerged=${got.toSet.diff(ref.toSet).take(3)} " +
        s"only-baseline=${ref.toSet.diff(got.toSet).take(3)}")
    // every planted session closed (the sentinel's own session stays open)
    assert(ref.count(_._1 == "u_hot") == 100 && ref.size == 200,
      s"fixture must close 100 hot + 100 cold sessions, got ${ref.size}")
    // the skew guarantee: the hot key's shuffled rows collapsed from
    // O(events) to O(sessions) — pre-merge emitted far fewer interval
    // rows than the 4001 input events (slack: a session split across
    // micro-batch/partition boundaries emits one interval per fragment)
    assert(acc.value < events.size / 4,
      s"pre-merge did not collapse the skew: ${acc.value} intervals for ${events.size} events")
  }

  test("q39 fixture provably delivers LATE events, and the late schedule equals the batch sessionization") {
    // the r15 verdict's gap: q38 splits chronologically, so the interval
    // machine's late-merge path never ran under a hash gate. This pins
    // (a) the q39 fixture's lateness — some batch-1 event strictly
    // predates a batch-0 SESSION END of the same user, so it must merge
    // into/extend state batch 0 already built — and (b) the late
    // delivery's output == the complete batch sessionization.
    val dir = "/root/testdata/sf0.001"
    val ev = graft.core.Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("ts"))
    val fx = graft.queries.StreamQueries.lateSessionFixture(ev)
    def sessions(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      df.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum("new_sess")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
    }
    val b0Sessions = sessions(fx.batch0)
    val lateHits = fx.batch1.as("l")
      .join(b0Sessions.as("s"),
        col("l.user_id") === col("s.user_id") &&
          col("l.ts") < col("s.session_end"))
      .count()
    assert(lateHits > 0,
      "q39 fixture degenerated: no batch-1 event predates a batch-0 session end")
    val got = graft.queries.StreamQueries.q39StreamSessionsLate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    val exp = sessions(ev.select("user_id", "ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSet == exp.toSet,
      s"late delivery diverged from batch sessionization: " +
        s"only-stream=${got.toSet.diff(exp.toSet).take(3)} " +
        s"only-batch=${exp.toSet.diff(got.toSet).take(3)}")
    assert(got.length == exp.length, "duplicate session emissions")
  }

  test("closedSessions rejects month-bearing gaps (no fixed millisecond length)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    intercept[IllegalArgumentException] {
      Streams.closedSessions(mem.toDF().toDF("k", "ts"), "k", "ts",
        gap = "1 month", watermark = "0 seconds")
    }
  }

  test("flatMapGroupsWithState emits ONLY closed sessions (in-batch gap + event-time timeout)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = Streams.closedSessions(
      mem.toDF().toDF("k", "ts"), "k", "ts", gap = "5 minutes", watermark = "0 seconds")
    val out = ArrayBuffer.empty[(String, Long, Timestamp, Timestamp)]
    val q = sessions.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Timestamp, Timestamp)], _: Long) =>
        { out.synchronized { out ++= b.collect() }; () })
      .start()
    // u1: events at 10:01, 10:03, then a gap to 10:30 → first session
    // closes IN BATCH; u2's lone 10:02 session closes via timeout when
    // the watermark passes 10:07
    mem.addData(("u1", ts(1)), ("u1", ts(3)), ("u2", ts(2)))
    q.processAllAvailable()
    assert(out.synchronized(out.isEmpty)) // nothing closed yet
    mem.addData(("u1", ts(30)))
    q.processAllAvailable()
    mem.addData(("u1", ts(59))) // advances watermark; u2 times out
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toSeq)
    assert(got.contains(("u1", 2L, ts(1), ts(3))))   // closed by in-batch gap
    assert(got.exists(s => s._1 == "u2" && s._2 == 1L)) // closed by timeout
    // the live u1 session (10:30..10:59 run) is NOT emitted
    assert(!got.exists(s => s._1 == "u1" && s._3 == ts(30) && s._4 == ts(59)))
  }

  test("ParquetSink streams an unbounded flow (exactly-once file sink)") {
    import graft.core._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-pq").toString
    val res = Pipeline(spark)
      .root(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "40", "rowsperbatch" -> "10"), bounded = false))
      .to(ParquetSink(out))
    val q = res match {
      case Sink.Streaming(q) => q
      case other => fail(s"expected a streaming handle, got $other")
    }
    def written(): Long =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    val deadline = System.currentTimeMillis() + 60000
    while (written() < 40 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    assert(written() == 40)
    // the manifest log makes the directory an exactly-once sink: ids
    // are complete and unique despite multi-batch writes
    val ids = spark.read.parquet(out)
      .select(decode(col("value"), "UTF-8")).collect()
      .map(_.getString(0).stripPrefix("record-").toLong).sorted
    assert(ids.toSeq == (0L until 40L))
  }

  test("stream-stream interval join pairs clicks with in-window views only (streaming as-of twin)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val views = MemoryStream[(String, Timestamp)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("user", "ts"), views.toDF().toDF("user", "ts"),
      keyCol = "user", lookback = "10 minutes")
    val out = ArrayBuffer.empty[(String, Timestamp, Timestamp)]
    val q = joined.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { out.synchronized { out ++= b.collect().map(r =>
          (r.getString(0), r.getTimestamp(1), r.getTimestamp(4))) }; () })
      .start()
    views.addData(("u1", ts(0)), ("u1", ts(25)), ("u2", ts(1)))
    clicks.addData(("u1", ts(5)), ("u1", ts(30)), ("u2", ts(20)))
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toSet)
    assert(got.contains(("u1", ts(5), ts(0))))    // view 10:00 in [09:55, 10:05]
    assert(got.contains(("u1", ts(30), ts(25))))  // view 10:25 in [10:20, 10:30]
    // u1's 10:30 click must NOT see the 10:00 view (outside lookback),
    // u2's 10:20 click must NOT see the 10:01 view
    assert(!got.contains(("u1", ts(30), ts(0))))
    assert(!got.exists(_._1 == "u2"))
  }

  test("interval join matches across micro-batches and EVICTS expired state (bounded-state proof)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val views = MemoryStream[(String, Timestamp)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("user", "ts"), views.toDF().toDF("user", "ts"),
      keyCol = "user", lookback = "10 minutes", watermark = "5 minutes")
    val out = ArrayBuffer.empty[(String, Timestamp, Timestamp)]
    val q = joined.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { out.synchronized { out ++= b.collect().map(r =>
          (r.getString(0), r.getTimestamp(1), r.getTimestamp(4))) }; () })
      .start()
    // batch 0: a view only — it must be BUFFERED in state, no output yet
    views.addData(("u1", ts(0)))
    q.processAllAvailable()
    assert(out.synchronized(out.isEmpty))
    // batch 1: the matching click arrives in a LATER batch — the pair
    // can only come from batch-0 state, proving cross-batch buffering
    clicks.addData(("u1", ts(5)))
    q.processAllAvailable()
    assert(out.synchronized(out.toSet) == Set(("u1", ts(5), ts(0))))
    // advance event time far past watermark + lookback on both sides so
    // the u1 view's state (kept while it could still match a click in
    // [v_ts, v_ts + 10 min]) becomes evictable, then trigger once more
    views.addData(("u9", ts(59)))
    clicks.addData(("u9", ts(59)))
    q.processAllAvailable()
    views.addData(("u8", ts(59)))
    clicks.addData(("u8", ts(59)))
    q.processAllAvailable()
    val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(removed > 0, s"expected watermark eviction to remove state rows, progress said $removed")
    // eviction must not have invented or lost pairs
    assert(out.synchronized(out.count(_._1 == "u1")) == 1)
  }

  test("stateful streaming runs unchanged on the RocksDB state store (off-heap state at scale)") {
    // the 100 TB state story: HDFS-backed stores keep state on the
    // executor heap — RocksDB spills to local disk, which is what an
    // hours-long watermark horizon over a real event stream needs. The
    // provider is a conf swap; semantics must be identical. This pins
    // that the engine's stateful ops actually RUN under RocksDB (the
    // jar is on the classpath, the provider resolves, results match).
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamConfig
    // NB: conf.getOption resolves to the entry's DEFAULT when unset —
    // "restored" means "back to the pre-bracket resolution", not None
    val preBracket = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StreamConfig.withState(spark,
      StreamConfig.Settings(provider = Some(StreamConfig.RocksDb))) {
      val clicks = MemoryStream[(String, Timestamp)]
      val views = MemoryStream[(String, Timestamp)]
      val joined = Streams.intervalJoin(
        clicks.toDF().toDF("user", "ts"), views.toDF().toDF("user", "ts"),
        keyCol = "user", lookback = "10 minutes", watermark = "5 minutes")
      val out = ArrayBuffer.empty[(String, Timestamp, Timestamp)]
      val q = joined.writeStream.outputMode("append")
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          { out.synchronized { out ++= b.collect().map(r =>
            (r.getString(0), r.getTimestamp(1), r.getTimestamp(4))) }; () })
        .start()
      views.addData(("u1", ts(0)), ("u2", ts(1)))
      q.processAllAvailable()
      clicks.addData(("u1", ts(5)), ("u1", ts(30)), ("u2", ts(20)))
      q.processAllAvailable()
      val usedRocks = q.lastProgress.stateOperators.exists(
        _.customMetrics.keySet().toString.contains("rocksdb"))
      q.stop()
      assert(out.synchronized(out.toSet) == Set(("u1", ts(5), ts(0)))) // same pairs as default provider
      assert(usedRocks, "state operator metrics must be RocksDB's, not the HDFS store's")
    }
    // the bracket restored the session: default store back in force
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass") == preBracket)
  }

  test("closedSessionsPreMerged runs unchanged on RocksDB — late in-horizon merge included") {
    // the q38/q39 state machine (interval map in flatMapGroupsWithState
    // keyed state, SessionsAcc lists with the r16 unitVersion field)
    // under the off-heap store: the 100 TB sessionization setting is
    // RocksDB + a long watermark horizon, so the custom state encoder
    // and the LATE back-merge path must round-trip through RocksDB, not
    // just the in-heap default the gates exercise.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamConfig
    StreamConfig.withState(spark,
      StreamConfig.Settings(provider = Some(StreamConfig.RocksDb))) {
      val mem = MemoryStream[(String, Timestamp)]
      val sessions = Streams.closedSessionsPreMerged(
        mem.toDF().toDF("k", "ts"), "k", "ts",
        gap = "5 minutes", watermark = "30 minutes")
      val out = ArrayBuffer.empty[(String, Long, Timestamp, Timestamp)]
      val q = sessions.writeStream.outputMode("append")
        .foreachBatch((b: org.apache.spark.sql.Dataset[(String, Long, Timestamp, Timestamp)], _: Long) =>
          { out.synchronized { out ++= b.collect() }; () })
        .start()
      mem.addData(("u1", ts(0)), ("u1", ts(10))) // two open sessions (gap 5m)
      q.processAllAvailable()
      // LATE but in-horizon (watermark trails by 30m): must back-merge
      // into the [0,0] session already sitting in RocksDB state
      mem.addData(("u1", ts(4)))
      q.processAllAvailable()
      mem.addData(("u1", ts(55))) // wm -> 25: closes [0,4] and [10,10]
      q.processAllAvailable()
      val usedRocks = q.lastProgress.stateOperators.exists(
        _.customMetrics.keySet().toString.contains("rocksdb"))
      q.stop()
      val got = out.synchronized(out.toSet)
      assert(got == Set(("u1", 2L, ts(0), ts(4)), ("u1", 1L, ts(10), ts(10))),
        s"late merge under RocksDB diverged: $got")
      assert(usedRocks, "state operator metrics must be RocksDB's")
    }
  }

  test("StreamConfig.withState: both backends produce the same stateful result; conf restored on failure") {
    import graft.streaming.StreamConfig
    val keys = (1 to 40).map(i => s"u${i % 5}").toDF("k")
    def runOnce(s: StreamConfig.Settings): Set[(String, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-sc")
      try StreamConfig.withState(spark, s) {
        keys.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
        val stream = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.StringType))))
          .parquet(s"$dir/in")
          .groupBy("k").count()
        var last: Array[org.apache.spark.sql.Row] = Array.empty
        Streams.runAvailableNow(stream, OutputMode.Complete()) { b =>
          last = b.collect()
        }
        // the partition override must really be in force mid-bracket
        s.statePartitions.foreach(n =>
          assert(spark.conf.get("spark.sql.shuffle.partitions") == n.toString))
        last.map(r => (r.getString(0), r.getLong(1))).toSet
      } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val hdfs = runOnce(StreamConfig.Settings(statePartitions = Some(4),
      provider = Some(StreamConfig.HdfsBacked)))
    val rocks = runOnce(StreamConfig.Settings(statePartitions = Some(4),
      provider = Some(StreamConfig.RocksDb)))
    assert(hdfs == rocks && hdfs.nonEmpty)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prevParts)
    // restore-on-failure: a crashing body must not leak the override
    intercept[RuntimeException](StreamConfig.withState(spark,
      StreamConfig.Settings(statePartitions = Some(3))) {
      throw new RuntimeException("boom")
    })
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prevParts)
  }

  test("unbounded Count() runs to a final value (ref kafka-count-stdout shape)") {
    import graft.core._
    // stream → countAll → complete-mode emission: the running count is
    // visible per trigger and the final value covers all input
    val flow = Pipeline(spark)
      .root(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "40", "rowsperbatch" -> "20"), bounded = false))
      .countAll()
    assert(flow.df.isStreaming)
    val out = ArrayBuffer.empty[Long]
    Streams.runAvailableNow(flow.df, OutputMode.Complete()) { b =>
      out.synchronized { out ++= b.select("value").collect().map(_.getLong(0)) }
    }
    assert(out.synchronized(out.lastOption).contains(40L))
    // the console sink accepts the aggregated stream (complete fallback)
    val res = Pipeline(spark)
      .root(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "10", "rowsperbatch" -> "10"), bounded = false))
      .countAll()
      .to(ConsoleSink())
    res match {
      case Sink.Streaming(q) => q.processAllAvailable(); q.stop()
      case other => fail(s"expected streaming handle, got $other")
    }
  }

  test("KafkaLikeSink streams an unbounded flow with the KVM record contract") {
    import graft.core._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-kafka").toString
    val res = Pipeline(spark)
      .root(KafkaLikeSource(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "30", "rowsperbatch" -> "10"), bounded = false,
        valueCol = "body")))
      .to(KafkaLikeSink(out))
    val q = res match {
      case Sink.Streaming(q) => q
      case other => fail(s"expected a streaming handle, got $other")
    }
    def written(): Long =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    val deadline = System.currentTimeMillis() + 60000
    while (written() < 30 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.columns.toSeq == Seq("key", "value", "headers"))
    assert(rows.count() == 30)
  }

  test("streaming exact dedup drops in-horizon duplicates, keeps distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = ArrayBuffer.empty[String]
    val deduped = Streams.dedupExact(mem.toDF().toDF("ts", "text"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        { out.synchronized { out ++= b.collect().map(_.getString(1)) }; () })
      .start()
    mem.addData((ts(1), "alpha doc"), (ts(2), "beta doc"), (ts(3), "alpha doc"))
    q.processAllAvailable()
    // same content, different whitespace → same fingerprint → dropped;
    // new content admitted
    mem.addData((ts(4), "  alpha   doc "), (ts(5), "gamma doc"))
    q.processAllAvailable()
    q.stop()
    val seen = out.synchronized(out.toSeq)
    assert(seen.count(_.trim.startsWith("alpha")) == 1)
    assert(seen.toSet.map((s: String) => s.trim.replaceAll("\\s+", " ")) ==
      Set("alpha doc", "beta doc", "gamma doc"))
  }

  test("streaming incremental dedup labels a stream against a static corpus, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "known corpus document one"),
      (2L, "known corpus document two")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = ArrayBuffer.empty[(Long, Option[Long])]
    val labeled = graft.operators.BloomDedup.streamIncrementalExact(
      mem.toDF().toDF("doc_id", "text"), corpus)
    val q = labeled.writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        out.synchronized {
          out ++= b.collect().map(r => (r.getLong(r.fieldIndex("id")),
            if (r.isNullAt(r.fieldIndex("dup_of"))) None
            else Some(r.getLong(r.fieldIndex("dup_of")))))
        }; ()
      })
      .start()
    mem.addData((10L, "a brand new streamed document"),
      (11L, "KNOWN   corpus document one"))   // dup of corpus 1 after normalize
    q.processAllAvailable()
    mem.addData((12L, "known corpus document two"))  // dup of corpus 2
    q.processAllAvailable()
    q.stop()
    val seen = out.synchronized(out.toMap)
    assert(seen == Map(10L -> None, 11L -> Some(1L), 12L -> Some(2L)))
  }

  test("q27_stream_e2e gate: streaming agg over documents equals batch result") {
    val res = graft.queries.StreamQueries.q27StreamE2e(spark, "/root/testdata/sf0.001")
      .collect()
    val expected = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"))
      .orderBy("lang", "source").collect()
    assert(res.toSeq == expected.toSeq)
    assert(res.nonEmpty)
  }
}

/** Static landing buffer for the executor-side flush test (task
  * closures serialize even on local[n]; object fields resolve
  * statically in the shared test JVM). */
object StreamingSpec {
  val chunks = ArrayBuffer.empty[Seq[org.apache.spark.sql.Row]]
  val recordChunk: Seq[org.apache.spark.sql.Row] => Unit =
    c => chunks.synchronized { chunks += c }
}
