package graft

import graft.operators.SemanticIndex
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Steady-state contract of the incremental SEMANTIC dedup index: after
  * compaction persists centroids + cell-partitioned survivors, the
  * per-batch phase labels embedding batches without ever scanning the
  * corpus parquet again — the DailyCrawlSpec property, in embedding
  * space.
  */
class SemanticIndexSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters in 4-dim space; members jittered in a
  // non-direction-changing way so intra-cluster cosine ≈ 1
  private def member(base: Array[Float], i: Int): Seq[Float] =
    base.map(x => x * (1f + i * 0.001f)).toSeq
  private val A = Array(1f, 0f, 0f, 0f)
  private val B = Array(0f, 1f, 0f, 1f)
  private val C = Array(0f, 0f, 1f, 1f)

  test("batch labeling finds corpus and batch-internal semantic dups without a corpus scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-semidx").toString
    // corpus: two members per cluster, ids ordered so the trainer's
    // lowest-k-id init seeds one centroid per cluster (1=A, 2=B, 3=C) —
    // compaction must keep the minimum id of each cluster: 1, 2, 3
    val corpusPath = s"$dir/corpus.parquet"
    Seq(
      (1L, member(A, 1)), (2L, member(B, 1)), (3L, member(C, 1)),
      (4L, member(A, 2)), (5L, member(B, 2)), (6L, member(C, 2))
    ).toDF("vec_id", "embedding").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val indexDir = s"$dir/index"
    SemanticIndex.compact(corpus, indexDir, threshold = 0.99,
      cells = 3, iters = 4, trainBound = 0L)
    val model = SemanticIndex.load(spark, indexDir)
    assert(model.centroids.length == 3)
    assert(model.survivors.select("vec_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "compaction must keep the minimum-id survivor per semantic cluster")

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
      val novelVec = Seq(0.5f, 0.5f, 0.5f, 0.5f)
      val batch = Seq(
        (10L, member(A, 7)),                       // semantic dup of corpus survivor 1
        (11L, novelVec),                           // genuinely novel
        (12L, novelVec.map(_ * 1.001f))            // batch-internal dup of 11
      ).toDF("vec_id", "embedding")
      val labels = SemanticIndex.labelBatch(batch, model, threshold = 0.99)
        .orderBy("id")
        .as[(Long, Option[Long], Boolean)].collect().toSeq
      assert(labels == Seq(
        (10L, Some(1L), false),
        (11L, None, true),
        (12L, Some(11L), false)), s"got $labels")

      // listener: sentinel flush, then assert what executed
      val sentinelPath = s"$dir/sentinel.parquet"
      Seq((0L, "sentinel")).toDF("id", "t").write.parquet(sentinelPath)
      spark.read.parquet(sentinelPath).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!scanned.asScala.exists(_.contains("sentinel.parquet")) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      assert(scanned.asScala.exists(_.contains("sentinel.parquet")),
        "listener never saw the sentinel read")
      // positive control: the index reads ARE visible to the listener
      assert(scanned.asScala.exists(_.contains("index")),
        "listener should see the survivor-index reads")
      val corpusScans = scanned.asScala.filter(_.contains("corpus.parquet")).toSeq
      assert(corpusScans.isEmpty,
        s"batch phase scanned the corpus ${corpusScans.size} time(s)")
    } finally spark.listenerManager.unregister(listener)
  }

  test("labelStream: two epochs label against the prebuilt semantic index, idempotent epoch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semidx-stream").toString
    // ids ordered so the lowest-2-id init seeds one centroid per cluster
    val corpus = Seq(
      (1L, member(A, 1)), (2L, member(B, 1)),
      (3L, member(A, 2)), (4L, member(B, 2))
    ).toDF("vec_id", "embedding")
    SemanticIndex.compact(corpus, s"$dir/index", threshold = 0.99,
      cells = 2, iters = 4, trainBound = 0L)

    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    val q = SemanticIndex.labelStream(stream, s"$dir/index", threshold = 0.99,
      outDir = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      // epoch 0: a corpus dup + a novel doc
      mem.addData((10L, member(A, 9)), (11L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      q.processAllAvailable()
      // epoch 1: a dup of the OTHER corpus cluster
      mem.addData((12L, member(B, 9)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      val labels = out.select("id", "dup_of", "keep")
        .as[(Long, Option[Long], Boolean)].collect().toSet
      assert(labels == Set(
        (10L, Some(1L), false),
        (11L, None, true),
        (12L, Some(2L), false)), s"got $labels")
      assert(out.select("__epoch").distinct().count() == 2)
    } finally q.stop()
  }
}
