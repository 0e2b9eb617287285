package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Operator-CONSTRUCTION contracts: building a query must be pure plan
  * assembly — no Spark jobs, no session-global config left behind, no
  * crash on streaming inputs. These are the properties a shared
  * long-lived session (notebook server, streaming driver) depends on;
  * the oracle gates can't see them because they run one query at a
  * time on a fresh session.
  */
class ConstructionSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent operator construction never strands AQE off (per-session lock)") {
    val docs = (1L to 60L).map(i =>
      (i, s"some shared words plus tail$i unique$i content$i")).toDF("doc_id", "text")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "true")
    val pool = Executors.newFixedThreadPool(8)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    try {
      // 96 constructions across 8 threads: each materialize=true build
      // toggles AQE around its checkpoint planning — without the
      // per-session lock, interleaved get/set/restore strands the
      // session at adaptive.enabled=false (reliably, at this volume)
      val tasks = (1 to 96).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              val df = if (i % 2 == 0) Dedup.ngramJaccard(docs, 0.5)
                       else Dedup.minhashLsh(docs, 0.5)
              df.queryExecution.sparkPlan // force planning like a caller would
            } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get(120, TimeUnit.SECONDS))
      assert(failures.isEmpty, s"construction failed: ${failures.asScala.headOption}")
      assert(spark.conf.get(key) == "true",
        "a construction race left AQE disabled session-wide")
      // and the checkpointed layout still serves the self-join: a fresh
      // post-race build keeps its exchange-free shape (the reason the
      // AQE toggle exists at all)
      val p = Dedup.ngramJaccard(docs, 0.5).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"))
    } finally {
      pool.shutdownNow()
      spark.conf.set(key, prev)
    }
  }

  test("construction on a derived (post-shuffle) input runs ZERO Spark jobs") {
    // job groups are thread-local and inherited by jobs submitted from
    // this thread, so jobs triggered here are attributable even if
    // other suites share the session concurrently
    val seen = new ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        seen.add(Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).getOrElse(""))
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val derived = (1L to 200L).map(i => (i, s"words tail$i more$i"))
        .toDF("doc_id", "text").repartition(7) // exchange in the plan
      sc.setJobGroup("graft-construction-probe", "construction must run no jobs")
      // capped forms included: the hot-key cap is a broadcast anti-join,
      // and a broadcast INSIDE the checkpointed subtree would collect
      // its build side right here (BroadcastExchange materializes under
      // execute()) — the cap must stay outside the checkpoint, and
      // implicit broadcasts (minhashLsh's vocab join) must plan
      // co-partitioned inside it
      val q1 = Dedup.ngramJaccard(derived, 0.5, maxDocFreq = Some(100L))
      val q2 = Dedup.minhashLsh(derived, 0.5)
      val q3 = Dedup.winnowPairs(derived, 2, maxDocFreq = Some(20L))
      val q4 = Dedup.sharedPassages(derived, 2, maxDocFreq = Some(20L))
      // the incremental family shares the same checkpoint machinery:
      // building BOTH sides' LSH indexes and composing the prebuilt
      // join must also stay pure plan assembly
      val idxA = graft.operators.BloomDedup.lshIndex(derived)
      val idxB = graft.operators.BloomDedup.lshIndex(derived.limit(50))
      val q5 = graft.operators.BloomDedup.incrementalLshPrebuilt(idxB, idxA, 0.5)
      // force full planning the way any caller (explain, writer) would —
      // the old df.rdd probe materialized AQE stages right here
      Seq(q1, q2, q3, q4, q5).foreach(_.queryExecution.sparkPlan)
      // sentinel action under a different group; listener events are
      // delivered in submission order, so once the sentinel shows up
      // every would-be construction job has been delivered too
      sc.setJobGroup("graft-sentinel", "delivery barrier")
      spark.range(1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!seen.asScala.exists(_ == "graft-sentinel") && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(seen.asScala.exists(_ == "graft-sentinel"), "listener never saw the sentinel")
      val constructionJobs = seen.asScala.filter(_ == "graft-construction-probe")
      assert(constructionJobs.isEmpty,
        s"operator construction ran ${constructionJobs.size} Spark job(s)")
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
  }

  test("dedup construction on a streaming input does not throw") {
    val stream = spark.readStream.format("rate").load()
      .select(col("value").as("doc_id"), concat(lit("doc "), col("value")).as("text"))
    assert(stream.isStreaming)
    // the old df.rdd probe threw AnalysisException here at construction;
    // and materialize=true must DEGRADE (checkpointing an unbounded plan
    // is meaningless — branches recompute per micro-batch) rather than
    // throw from inside localCheckpoint
    Dedup.ngramJaccard(stream, 0.5, materialize = false)
    Dedup.ngramJaccard(stream, 0.5) // default materialize=true: pass-through
    Dedup.winnowPairs(stream, 2)
    Dedup.exact(stream)
    Dedup.simhash(stream)
    assert(graft.operators.Stage.reuse(stream).isStreaming)
  }
}
