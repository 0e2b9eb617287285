package graft

import graft.operators.{MultiModal, Similarity}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque binary columns through per-partition
  * batch transforms — decode-meta, feature-extract, resize, and the
  * handoff into the similarity operators.
  */
class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private def blobs = Seq(
    (1L, Array.fill[Byte](100)(0)),            // all zeros → one histogram bin
    (2L, (0 until 256).map(_.toByte).toArray), // uniform over all bytes
    (3L, "hello media".getBytes("UTF-8"))
  ).toDF("doc_id", "content")

  test("byte-histogram features: fixed width, normalized, deterministic") {
    val f = MultiModal.extractFeatures(blobs, bins = 16)
      .orderBy("doc_id").collect()
    assert(f.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val rows = f.map(_.getSeq[Double](2))
    assert(rows.forall(_.length == 16))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9))
    assert(rows(0)(0) == 1.0)                       // zeros land in bin 0
    assert(rows(1).forall(v => math.abs(v - 1.0 / 16) < 1e-9)) // uniform
  }

  test("features flow into the similarity operators (cosine of identical blobs = 1)") {
    val dup = Seq((10L, "same bytes".getBytes("UTF-8")),
      (11L, "same bytes".getBytes("UTF-8"))).toDF("doc_id", "content")
    val feats = MultiModal.extractFeatures(dup, bins = 8)
      .select(col("doc_id").as("vec_id"),
        col("features").cast("array<double>").as("embedding"))
    val cos = Similarity.bruteForceTopK(
        feats.filter(col("vec_id") === 10), feats, k = 1)
      .select("cos").head().getDouble(0)
    assert(cos == 1.0)
  }

  test("resize stub keeps real plumbing: dims set, payload deterministic per (content, dims)") {
    val r1 = MultiModal.resize(blobs, 224, 224).orderBy("doc_id").collect()
    val r2 = MultiModal.resize(blobs, 224, 224).orderBy("doc_id").collect()
    assert(r1.map(_.getInt(1)).forall(_ == 224))
    assert(r1.zip(r2).forall { case (a, b) =>
      a.getAs[Array[Byte]](3).sameElements(b.getAs[Array[Byte]](3)) })
    val other = MultiModal.resize(blobs, 64, 64).orderBy("doc_id").collect()
    assert(!r1(0).getAs[Array[Byte]](3).sameElements(other(0).getAs[Array[Byte]](3)))
    // downstream re-extract works on the resized payloads
    val meta = MultiModal.extractMeta(
      MultiModal.resize(blobs, 64, 64).select(col("doc_id"), col("content")))
    assert(meta.count() == 3)
  }
}
