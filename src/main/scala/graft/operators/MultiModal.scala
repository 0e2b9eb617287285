package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): media as opaque `BINARY`
  * columns + typed metadata, with decode/feature-extract implemented as
  * batched per-partition transforms — the Scala analogue of a
  * mapInPandas pipeline: one iterator pass per partition, batch-shaped,
  * no per-row driver involvement.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] derives deterministic fake dimensions from
  * the byte content. The Spark-side plumbing — binary schema, partition
  * batching, metadata struct, partition-parallel extraction — is real
  * and tested; swap [[StubDecoder]] for a JNI/javacv decoder in
  * production.
  */
object MultiModal {

  /** Typed metadata row produced per media blob. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, content_md5: String,
                             width: Int, height: Int, n_frames: Int)

  /** STUB: deterministic fake decode — dimensions derived from byte
    * length, frame count from the id. Replace with a real decoder; the
    * signature (bytes in, dims out) is the production contract. */
  object StubDecoder {
    def decode(id: Long, bytes: Array[Byte]): (Int, Int, Int) = {
      val len = bytes.length
      (len % 640 + 1, (len * 7) % 480 + 1, (id % 24 + 1).toInt)
    }
  }

  /** Extract metadata from a (id, blob) frame via per-partition batches.
    *
    * Scale: mapPartitions keeps one decoder instance per task and
    * streams the partition through it — the decode is the bottleneck at
    * 100 TB, so partition count (not this operator) is the tuning knob.
    * The md5/byte-length columns stay codegen'd expressions; only the
    * opaque decode leaves codegen, which is unavoidable for media. */
  def extractMeta(media: DataFrame, idCol: String = "doc_id",
                  blobCol: String = "content"): DataFrame = {
    val withHash = media.select(
      col(idCol).cast("long").as("doc_id"),
      col(blobCol).as("content"),
      length(col(blobCol)).cast("long").as("byte_len"),
      md5(col(blobCol)).as("content_md5"))
    val ds: Dataset[MediaMeta] = withHash
      .as(Encoders.product[(Long, Array[Byte], Long, String)])
      .mapPartitions { it =>
        // one decoder per partition ≙ one model/codec instance per task
        it.map { case (id, bytes, len, hash) =>
          val (w, h, f) = StubDecoder.decode(id, bytes)
          MediaMeta(id, len, hash, w, h, f)
        }
      }(Encoders.product[MediaMeta])
    ds.toDF()
  }
}
