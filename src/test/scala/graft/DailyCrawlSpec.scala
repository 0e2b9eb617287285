package graft

import graft.examples.DailyCrawlExample
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The steady-state contract of the daily-crawl pipeline: after
  * compaction persists the corpus index, the per-batch phase runs
  * BATCH-ONLY jobs — the corpus parquet is never scanned again. This is
  * the property that makes incremental dedup viable at 100 TB (corpus
  * scans cost hours; batch scans cost minutes), asserted two ways: on
  * the lazy plan (structural) and on what actually executed (listener).
  */
class DailyCrawlSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(df: org.apache.spark.sql.DataFrame, path: String): String = {
    df.write.mode("overwrite").parquet(path)
    path
  }

  test("steady-state batch phase labels correctly and never scans the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-spec").toString
    val words = Seq("one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
      "fifteen", "sixteen", "seventeen", "eighteen", "nineteen", "twenty",
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
      "iota", "kappa")
    val base = words.mkString(" ")                       // 30 tokens
    val corpusPath = writeTable(Seq(
      (1L, base, "src0"),
      (2L, words.reverse.mkString(" "), "src0"),
      (3L, "completely different standing corpus text about weather patterns and storms", "src1")
    ).toDF("doc_id", "text", "source"), s"$dir/corpus.parquet")
    val benchPath = writeTable(Seq(
      (90L, "the held out benchmark question about ancient rome and its aqueduct engineering marvels", "eval")
    ).toDF("doc_id", "text", "source"), s"$dir/benchmark.parquet")
    val batchPath = writeTable(Seq(
      // exact dup of corpus doc 1 MODULO line structure (a newline
      // where doc 1 has a space): its lines are novel, so it passes
      // the line stage, but the whitespace-normalized fingerprint
      // matches — dropped by the bloom+resolve path
      (10L, base.replaceFirst(" ", "\n"), "src1"),
      // near-dup of corpus doc 1 (last token changed: 3-gram jaccard
      // 27/31 ≈ 0.87) — dropped by the prebuilt-LSH path
      (11L, words.init.mkString(" ") + " changed", "src1"),
      // novel but shares an 8-token run with the benchmark ("about
      // ancient rome ... marvels") — dropped by decontamination
      (12L, "interesting prose talking about ancient rome and its aqueduct engineering marvels today", "src1"),
      // clean novel survivor
      (13L, "a genuinely novel document about deep sea vents and the creatures living near them", "src1"),
      // one line already IN the corpus (doc 1's full text) + one novel
      // line — the line stage strips the first, the rest survives
      (14L, base + "\ndeep ocean hydrothermal research describing mineral rich plumes near volcanic ridges", "src1"),
      // every line corpus-present — emptied by the line stage, dropped
      (15L, base, "src1")
    ).toDF("doc_id", "text", "source"), s"$dir/batch.parquet")

    val corpus = spark.read.parquet(corpusPath)
    val indexDir = s"$dir/index"
    DailyCrawlExample.compactCorpus(corpus, indexDir, pplSamplePct = 100)

    // ---- batch phase: everything below must be corpus-free ----
    val scanned = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      private def record(qe: QueryExecution): Unit = qe.analyzed.foreach {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.foreach(p => scanned.add(p.toString))
          case _ => ()
        }
        case _ => ()
      }
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = record(qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = record(qe)
    }
    spark.listenerManager.register(listener)
    try {
      val batch = spark.read.parquet(batchPath)
      val benchmark = spark.read.parquet(benchPath)
      val sharded = DailyCrawlExample.labelBatch(batch, benchmark, indexDir,
        targets = Map("src0" -> 0.01))

      // structural: the lazy top plan never reads the corpus parquet.
      // (batch.parquet sits BEHIND the Stage.reuse checkpoints here —
      // lineage-truncated out of the top plan; the listener below still
      // sees it, because each localCheckpoint action reports its full
      // untruncated subtree to QueryExecutionListener.)
      val planPaths = sharded.queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
      }.flatten
      assert(!planPaths.exists(_.contains("corpus.parquet")),
        s"batch-phase plan reads the corpus: $planPaths")

      // semantics: the clean novel doc and the line-truncated doc
      // survive; every other path (line stage, bloom+resolve, LSH,
      // decontam) dropped its target
      val survivors = sharded.select("id").distinct().as[Long].collect().toSet
      assert(survivors == Set(13L, 14L),
        s"expected docs 13 and 14 to survive, got $survivors")
      // doc 14 carries ONLY its novel line — the corpus-present line
      // is gone from the chunked text
      val c14 = sharded.filter(col("id") === 14L)
        .select("chunk_text").as[String].collect().mkString(" ")
      assert(c14.contains("hydrothermal") && !c14.contains("kappa"),
        s"line stage should strip the corpus line from doc 14: $c14")

      // steady-state LM scoring: every batch doc scored + bucketed
      // against the PREBUILT vocab/cutoffs — also corpus-free (the
      // listener at the end of this test covers these jobs too)
      val ppl = DailyCrawlExample.scoreBatch(batch, indexDir)
        .as[(Long, String, Double, Int)].collect()
      assert(ppl.length == 6 && ppl.forall { case (_, _, nll, b) =>
        !nll.isNaN && b >= 1 && b <= 3 })

      // listener: nothing that EXECUTED in the batch phase scanned the
      // corpus either. Sentinel read makes the (async) listener bus
      // delivery observable — once the sentinel path shows up, every
      // earlier event has been delivered too (FIFO per listener).
      val sentinelPath = writeTable(Seq((0L, "sentinel")).toDF("id", "t"),
        s"$dir/sentinel.parquet")
      spark.read.parquet(sentinelPath).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!scanned.asScala.exists(_.contains("sentinel.parquet")) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      assert(scanned.asScala.exists(_.contains("sentinel.parquet")),
        "listener never saw the sentinel read")
      // positive control: the checkpoint events DID expose the scans
      // hidden from the top plan — so corpus absence below is a real
      // observation, not blindness to truncated lineage
      assert(scanned.asScala.exists(_.contains("batch.parquet")),
        "listener should see the batch scan via the checkpoint's plan event")
      assert(scanned.asScala.exists(_.contains("index")),
        "listener should see the prebuilt-index reads")
      val corpusScans = scanned.asScala.filter(_.contains("corpus.parquet")).toSeq
      assert(corpusScans.isEmpty,
        s"steady-state batch phase scanned the corpus ${corpusScans.size} time(s)")
    } finally spark.listenerManager.unregister(listener)
  }

  test("compaction without the pplBy column skips LM artifacts; scoreBatch guard names the fix") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-nolm").toString
    val corpus = Seq((1L, "plain corpus text only")).toDF("doc_id", "text")
    DailyCrawlExample.compactCorpus(corpus, s"$dir/index")   // must not throw
    // dedup artifacts present, LM artifacts absent (in the live generation)
    val live = graft.operators.IndexGen.liveRequired(spark, s"$dir/index")
    assert(new java.io.File(s"$live/fp").exists())
    assert(!new java.io.File(s"$live/lm").exists())
    val batch = Seq((10L, "batch text", "src1")).toDF("doc_id", "text", "source")
    val e = intercept[IllegalStateException] {
      DailyCrawlExample.scoreBatch(batch, s"$dir/index")
    }
    assert(e.getMessage.contains("compactCorpus"))
  }

  test("labelStream: a streamed crawl labels per micro-batch against the prebuilt index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-stream").toString
    val words = Seq("one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
      "fifteen", "sixteen", "seventeen", "eighteen", "nineteen", "twenty")
    val base = words.mkString(" ")
    val corpus = Seq((1L, base, "src0")).toDF("doc_id", "text", "source")
    val benchmark = Seq(
      (90L, "held out benchmark text entirely distinct from anything here", "eval")
    ).toDF("doc_id", "text", "source")
    DailyCrawlExample.compactCorpus(corpus, s"$dir/index")

    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF.toDF("doc_id", "text", "source")
    val q = DailyCrawlExample.labelStream(stream, benchmark, s"$dir/index",
      targets = Map.empty, outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      // epoch 1: an exact dup of the corpus doc + a clean novel doc
      mem.addData((10L, base, "src1"),
        (11L, "a genuinely novel document about deep sea vents and life near them", "src1"))
      q.processAllAvailable()
      // epoch 2: another novel doc
      mem.addData((12L, "completely fresh prose about mountain weather and ice formation", "src1"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      val survivors = out.select("id").distinct().as[Long].collect().toSet
      assert(survivors == Set(11L, 12L),
        s"expected the two novel docs to survive, got $survivors")
      // epoch column present: the idempotent-overwrite partition key
      assert(out.columns.contains("__epoch"))
      assert(out.select("__epoch").distinct().count() == 2)
    } finally q.stop()
  }

  test("retroactive decontamination: contaminated vectors evicted from the ANN index, no cell rewrites") {
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-evict").toString
    // 4 direction clusters × 4 members (the AnnIndexSpec layout);
    // vec_id == doc_id — the shared id space evictContaminated assumes
    def member(base: Array[Float], i: Int): Seq[Float] =
      base.map(x => x * (1f + i * 0.01f)).toSeq
    val bases = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f))
    val vecs = (0 until 4).flatMap { c =>
      (0 until 4).map(i => ((1 + c + 4 * i).toLong, member(bases(c), i)))
    }
    // doc 6's text leaks into the benchmark (shares its 8-gram); every
    // other doc's text is disjoint prose
    val leaked = "the secret benchmark passage about aqueduct engineering marvels endures"
    val texts = vecs.map { case (id, _) =>
      (id, if (id == 6L) leaked
           else s"standing corpus document number $id about topic $id with enough distinct tokens")
    }
    val corpus = texts.toDF("doc_id", "text")
    val benchmark = Seq((900L, s"evaluation question cites $leaked verbatim"))
      .toDF("doc_id", "text")
    val annDir = s"$dir/ann"
    AnnIndex.compact(vecs.toDF("vec_id", "embedding"), annDir,
      cells = 4, m = 2, ksub = 4, coarseIters = 4, pqIters = 3, trainBound = 0L)
    def cellFiles(): Map[String, Long] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(
          s"${graft.operators.IndexGen.liveRequired(spark, annDir)}/corpus"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(p => (p.toString, java.nio.file.Files.size(p))).toMap
    val before = cellFiles()
    // pre-eviction: a cluster-1 query sees doc 6 among its neighbors
    val q = Seq((999L, member(bases(1), 9))).toDF("vec_id", "embedding")
    val pre = AnnIndex.queryBatch(q, AnnIndex.load(spark, annDir),
        k = 4, nprobe = 1, shortlist = 8)
      .select("cand_id").as[Long].collect().toSet
    assert(pre.contains(6L), s"fixture: doc 6 must be a neighbor pre-evict, got $pre")
    val flagged = DailyCrawlExample
      .evictContaminated(corpus, benchmark, annDir, n = 8)
      .as[Long].collect().toSet
    assert(flagged == Set(6L), s"exactly the leaked doc is flagged: $flagged")
    assert(cellFiles() == before, "eviction must not rewrite standing cell files")
    val post = AnnIndex.queryBatch(q, AnnIndex.load(spark, annDir),
        k = 4, nprobe = 1, shortlist = 8)
      .select("cand_id").as[Long].collect().toSet
    assert(!post.contains(6L), s"evicted doc still surfaced: $post")
    assert((pre - 6L).subsetOf(post), "eviction must not drop live neighbors")
    // scheduled compaction folds the tombstones in; answers unchanged
    AnnIndex.vacuum(spark, annDir)
    val m3 = AnnIndex.load(spark, annDir)
    assert(m3.tombstones.isEmpty && m3.table.count() == vecs.size - 1)
    val post2 = AnnIndex.queryBatch(q, m3, k = 4, nprobe = 1, shortlist = 8)
      .select("cand_id").as[Long].collect().toSet
    assert(post2 == post)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
