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

  /** Crawl corpora routinely carry NULL blobs (failed fetches) and the
    * per-partition decode loops would NPE on them (and a NULL id fails
    * the non-nullable tuple encoder) — every operator here skips such
    * rows up front instead of killing the job on the first one. */
  private def nonNull(media: DataFrame, idCol: String, blobCol: String): DataFrame =
    media.filter(col(idCol).isNotNull && col(blobCol).isNotNull)

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

  /** Typed feature row: fixed-width byte-distribution histogram — the
    * feature-extract step of a media pipeline (embedding-model stand-in;
    * same batch shape as a real encoder). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** Per-blob byte-distribution features (`bins`-bucket normalized
    * histogram). The histogram itself is real (not stubbed) — it is the
    * deterministic, library-free feature extractor; a production
    * pipeline swaps the per-partition loop body for a vision/audio
    * model, keeping the iterator-batch shape: one model instance per
    * task, rows streamed through, output a fixed-width vector column
    * ready for [[Similarity]] / IVF indexing. */
  def extractFeatures(media: DataFrame, bins: Int = 16,
                      idCol: String = "doc_id",
                      blobCol: String = "content"): DataFrame = {
    val ds = nonNull(media, idCol, blobCol)
      .select(col(idCol).cast("long"), col(blobCol))
      .as(Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Double](bins)
          var i = 0
          while (i < bytes.length) {
            hist(((bytes(i) & 0xff) * bins) >> 8) += 1.0
            i += 1
          }
          val n = math.max(bytes.length, 1)
          var b = 0
          while (b < bins) { hist(b) /= n; b += 1 }
          MediaFeatures(id, bytes.length.toLong, hist)
        }
      }(Encoders.product[MediaFeatures])
    ds.toDF()
  }

  /** Resized-media row: target dims + the (stubbed) resized payload. */
  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                                content: Array[Byte])

  /** STUB resize, real plumbing: output schema, per-partition batching
    * and payload threading are the production contract; the stub
    * "resized" payload is a deterministic function of (content, dims)
    * so downstream stages (write, dedup by md5, re-extract) are fully
    * exercisable without image libraries. */
  def resize(media: DataFrame, width: Int, height: Int,
             idCol: String = "doc_id", blobCol: String = "content"): DataFrame = {
    val ds = nonNull(media, idCol, blobCol)
      .select(col(idCol).cast("long"), col(blobCol))
      .as(Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // deterministic stand-in payload: dims header + content digest
          val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          val out = java.nio.ByteBuffer.allocate(8 + digest.length)
            .putInt(width).putInt(height).put(digest).array()
          ResizedMedia(id, width, height, out)
        }
      }(Encoders.product[ResizedMedia])
    ds.toDF()
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
    val withHash = nonNull(media, idCol, blobCol).select(
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
