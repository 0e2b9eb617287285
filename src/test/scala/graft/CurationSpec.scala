package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The end-to-end curation funnel on the real documents table plus
  * adversarial fixtures: each stage's contract holds on the composed
  * pipeline, not just on the operators in isolation.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents

  test("ruleFilter: first failing rule wins in declaration order; ok docs keep=1") {
    val fix = Seq(
      (1L, "short doc"),                                  // too_short AND low alpha → too_short
      (2L, ("spam " * 40).trim),                          // long enough, repetitive (frac 1.0)
      (3L, "1 2 3 4 5 6 7 8 9 10 " * 3),                 // 30 tokens, zero alpha → low_alpha
      (4L, (1 to 40).map(i => s"word${('a' + i % 26).toChar}xyz").mkString(" ")) // passes all rules
    ).toDF("doc_id", "text")
    val out = Curation.ruleFilter(fix).orderBy("doc_id")
      .as[(Long, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "too_short"), (2L, 0, "repetitive"),
      (3L, 0, "low_alpha"), (4L, 1, "ok")))
  }

  test("curated corpus has no exact duplicates and carries tokens + split") {
    val out = Curation.curate(docs)
    out.persist()
    val n = out.count()
    assert(n > 0)
    // no two surviving docs share a fingerprint
    val fps = out.select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(fps == 0)
    // split is exhaustive and deterministic
    assert(out.filter(!col("split").isin("train", "test")).count() == 0)
    val again = Curation.curate(docs).select("doc_id", "split").as[(Long, String)]
      .collect().toSet
    assert(out.select("doc_id", "split").as[(Long, String)].collect().toSet == again)
    out.unpersist()
  }

  test("funnel counts are monotone and partition into train+test") {
    val f = Curation.funnel(docs)
    assert(f.input >= f.afterQuality)
    assert(f.afterQuality >= f.afterExact)
    assert(f.afterExact >= f.afterNearDup)
    assert(f.train + f.test == f.afterNearDup)
    assert(f.afterNearDup > 0)
  }

  test("funnel shares curate's materialization boundary: post-gate stages never rescan the corpus") {
    // funnel on a path-backed corpus: apart from the ONE checkpoint
    // materialization action (which by definition reads the corpus to
    // build the `exact` blocks — its event is filtered below by
    // funcName), only the `input` and `afterQuality` counts may contain
    // the corpus relation. Every later stage (afterExact, afterNearDup,
    // the split breakdown, AND the LSH pair generation inside them)
    // must read the checkpointed `exact` frame, which the analyzed plan
    // shows as a LogicalRDD, not the parquet scan.
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel")
    val corpusPath = s"$dir/corpus.parquet"
    docs.limit(200).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)

    val scanned = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      private def record(fn: String, qe: QueryExecution): Unit =
        // the checkpoint action's analyzed plan legitimately contains
        // the corpus (multiple times — the exact-dedup self-join
        // lineage); it is the materialization itself, not a rescan
        if (!fn.toLowerCase.contains("checkpoint")) qe.analyzed.foreach {
          case l: LogicalRelation => l.relation match {
            case h: HadoopFsRelation =>
              h.location.rootPaths.foreach(p => scanned.add(p.toString))
            case _ => ()
          }
          case _ => ()
        }
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = record(f, qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = record(f, qe)
    }
    spark.listenerManager.register(listener)
    try {
      val f = Curation.funnel(corpus)
      assert(f.input == 200 && f.train + f.test == f.afterNearDup)

      // listener is async: flush with a sentinel read, then assert
      val sentinelPath = s"$dir/sentinel.parquet"
      Seq((0L, "sentinel")).toDF("id", "t").write.parquet(sentinelPath)
      spark.read.parquet(sentinelPath).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!scanned.asScala.exists(_.contains("sentinel.parquet")) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      assert(scanned.asScala.exists(_.contains("sentinel.parquet")),
        "listener never saw the sentinel read")
      val corpusScans = scanned.asScala.count(_.contains("corpus.parquet"))
      assert(corpusScans == 2,
        s"funnel should read the corpus exactly twice outside the checkpoint " +
          s"materialization (input + afterQuality counts); analyzed plans " +
          s"contained it $corpusScans times")
    } finally {
      spark.listenerManager.unregister(listener)
      // the temp corpus/sentinel would otherwise accumulate across runs
      // (walk's stream holds directory handles — must be closed)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("planted duplicates and near-duplicates are removed by the composed pipeline") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight " * 3
    val planted = Seq(
      (9001L, base),                       // original
      (9002L, base),                       // exact dup → dropped (higher id)
      (9003L, base + "extra trailing words here"), // near-dup → dropped
      (9004L, "a completely different document about the weather in spring gardens " * 3)
    ).toDF("doc_id", "text")
    val out = Curation.curate(planted, Curation.Config(nearDupThreshold = 0.6))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(9001L) && ids.contains(9004L))
    assert(!ids.contains(9002L) && !ids.contains(9003L))
  }

  test("no near-dup pair above threshold survives in the curated output") {
    val out = Curation.curate(docs, Curation.Config(nearDupThreshold = 0.7))
    val survivors = Dedup.minhashLsh(out, threshold = 0.7).count()
    assert(survivors == 0)
  }
}
