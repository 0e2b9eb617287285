package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** AUDIO as a second real modality (beyond the reference's binary
  * content pipeline, `io/file/reader.go:30-74`; north star "multimodal
  * columns at scale") — JDK-only `javax.sound.sampled` WAV decode,
  * the audio twin of [[MultiModal]]'s `javax.imageio` image decode:
  * blobs are opaque `binary` columns, decode runs as ONE
  * `mapPartitions` pass per batch (no shuffle, no driver
  * involvement), undecodable blobs surface as sentinel rows / are
  * dropped (the [[MultiModal.extractMeta]] / `decodeFeatures`
  * split), and every decoded number is an exact INTEGER (sample sums,
  * sum of squares) so gates pin the decoder by hash, never by float
  * tolerance.
  *
  * PCM contract: 16-bit signed little-endian WAV (the universally
  * readable interchange shape). [[decodeStats]] parses the frames of
  * the first two channels; [[features]] emits per-window ENERGY
  * (sum of squared samples, channel 0) — the windowed-RMS shape with
  * the sqrt left to the consumer, because Σs² is an exact integer
  * while RMS is ulp-fragile. The feature vector feeds [[Similarity]]
  * exactly like an embedding column.
  */
object AudioModal {

  private def nonNull(media: DataFrame, idCol: String, blobCol: String): DataFrame =
    media.filter(col(idCol).isNotNull && col(blobCol).isNotNull)

  /** Decoded per-channel integer statistics; sentinel row
    * (sample_rate = -1, channels = -1, zeros) for undecodable blobs —
    * failure RATES are data, failures are not job-kills. Channels
    * beyond the first two contribute to n_frames only. */
  final case class AudioStats(doc_id: Long, sample_rate: Int, channels: Int,
                              n_frames: Long, sum_c0: Long, sum_c1: Long,
                              ssq_c0: Long, ssq_c1: Long)

  /** Parse a WAV blob into (format, pcm bytes); None when the blob is
    * not decodable audio or not 16-bit PCM. */
  private def decodePcm(bytes: Array[Byte]): Option[(AudioFormat, Array[Byte])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // PCM_SIGNED only: a 16-bit PCM_UNSIGNED (or A-law/μ-law)
        // stream would parse byte-identically as signed and yield
        // silently wrong sums instead of the documented sentinel/drop
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some((fmt, buf.toByteArray))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  private def sampleAt(pcm: Array[Byte], off: Int): Long =
    ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toLong // little-endian signed 16-bit

  def decodeStats(media: DataFrame, idCol: String = "doc_id",
                  blobCol: String = "content"): DataFrame = {
    val ds = nonNull(media, idCol, blobCol)
      .select(col(idCol).cast("long"), col(blobCol))
      .as(Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodePcm(bytes) match {
            case Some((fmt, pcm)) =>
              val ch = fmt.getChannels
              val frameBytes = 2 * ch
              val frames = pcm.length / frameBytes
              var (s0, s1, q0, q1) = (0L, 0L, 0L, 0L)
              var t = 0
              while (t < frames) {
                val v0 = sampleAt(pcm, t * frameBytes)
                s0 += v0; q0 += v0 * v0
                if (ch > 1) {
                  val v1 = sampleAt(pcm, t * frameBytes + 2)
                  s1 += v1; q1 += v1 * v1
                }
                t += 1
              }
              AudioStats(id, fmt.getSampleRate.toInt, ch, frames, s0, s1, q0, q1)
            case None => AudioStats(id, -1, -1, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }(Encoders.product[AudioStats])
    ds.toDF()
  }

  /** Typed feature row: per-window channel-0 energy vector. */
  final case class AudioFeatures(doc_id: Long, n_frames: Long, features: Array[Double])

  /** Windowed ENERGY features: channel-0 Σs² over `windows` equal
    * frame windows (frame t lands in window t·windows/n — integer
    * division, the same exact cell rule as
    * [[MultiModal.decodeFeatures]]). Values are exact integers stored
    * as doubles (≤ 2000²·frames ≪ 2^53 for any real clip), so
    * downstream signatures are deterministic. Undecodable blobs are
    * DROPPED (garbage energy poisons a similarity index). */
  def features(media: DataFrame, windows: Int = 4, idCol: String = "doc_id",
               blobCol: String = "content"): DataFrame = {
    require(windows > 0, "features: windows must be positive")
    val ds = nonNull(media, idCol, blobCol)
      .select(col(idCol).cast("long"), col(blobCol))
      .as(Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm(bytes).map { case (fmt, pcm) =>
            val ch = fmt.getChannels
            val frameBytes = 2 * ch
            val frames = pcm.length / frameBytes
            val w = new Array[Double](windows)
            var t = 0
            while (t < frames) {
              val v = sampleAt(pcm, t * frameBytes)
              w(math.min((t.toLong * windows / frames).toInt, windows - 1)) +=
                (v * v).toDouble
              t += 1
            }
            AudioFeatures(id, frames, w)
          }
        }
      }(Encoders.product[AudioFeatures])
    ds.toDF()
  }

  /** Deterministic WAV synthesis — the fixture generator behind the
    * `mm_audio` gate (and a general test-clip source): every id maps
    * to a 16-bit PCM WAV whose format and samples are pure integer
    * functions of the id, so a DuckDB oracle re-derives the DECODED
    * statistics sample by sample:
    *
    *  - channels  = 1 + id%2 (mono / stereo alternating)
    *  - rate      = 8000 + 1000·(id%3)
    *  - frames    = 200 + id%57
    *  - sample(t, c) = (13t + 7c + id) % 4001 − 2000
    *
    * (floorMod, so negative ids still map to a valid clip — same
    * contract as [[MultiModal.synthesizeOne]].) */
  final case class SyntheticClip(doc_id: Long, content: Array[Byte])

  /** The one WAV-encode tail every fixture generator shares: wrap raw
    * little-endian 16-bit PCM in a WAV container. */
  private def writeWav(pcm: Array[Byte], frames: Int, rate: Int,
                       channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The one one-clip-per-id mapPartitions wrapper every synthesize*
    * method shares. */
  private def synthesizeWith(ids: DataFrame, idCol: String)
                            (one: Long => Array[Byte]): DataFrame = {
    val ds = ids.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long"))
      .as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map(id => SyntheticClip(id, one(id)))
      }(Encoders.product[SyntheticClip])
    ds.toDF()
  }

  private[operators] def synthesizeWavOne(id: Long): Array[Byte] = {
    def mod(a: Long, m: Int): Int = java.lang.Math.floorMod(a, m.toLong).toInt
    val ch = 1 + mod(id, 2)
    val rate = 8000 + 1000 * mod(id, 3)
    val frames = 200 + mod(id, 57)
    val pcm = new Array[Byte](frames * 2 * ch)
    var t = 0
    while (t < frames) {
      var c = 0
      while (c < ch) {
        val s = mod(13L * t + 7L * c + id, 4001) - 2000
        val off = (t * ch + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      t += 1
    }
    writeWav(pcm, frames, rate, ch)
  }

  /** Synthesize one WAV clip per id row (see [[synthesizeWavOne]]'s
    * formula contract). One mapPartitions pass. */
  def synthesizeWav(ids: DataFrame, idCol: String = "doc_id"): DataFrame =
    synthesizeWith(ids, idCol)(synthesizeWavOne)

  /** Deterministic NOISE clip: mono 16-bit PCM whose samples come from
    * `java.util.Random(id)` — the JDK-SPECIFIED LCG, so the bytes are
    * stable across platforms and JVM versions. Unlike
    * [[synthesizeWavOne]]'s ramp (whose windowed-energy profile is
    * U-shaped for EVERY id, so sign-vs-mean signatures collide across
    * unrelated clips by construction), noise clips have independent
    * energy profiles — the fixture a similarity pipeline needs. */
  private[graft] def noiseWavOne(id: Long, frames: Int = 320): Array[Byte] = {
    val rnd = new java.util.Random(id)
    val pcm = new Array[Byte](frames * 2)
    var t = 0
    while (t < frames) {
      val s = rnd.nextInt(4001) - 2000
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    writeWav(pcm, frames, 8000, 1)
  }

  /** One [[noiseWavOne]] clip per id row. One mapPartitions pass. */
  def synthesizeNoiseWav(ids: DataFrame, frames: Int = 320,
                         idCol: String = "doc_id"): DataFrame =
    synthesizeWith(ids, idCol)(noiseWavOne(_, frames))

  /** md5-NOISE clip — the ORACLE-DERIVABLE noise fixture behind the
    * `mm_curation` gate. [[noiseWavOne]]'s `java.util.Random` stream
    * is not SQL-re-derivable and [[synthesizeWavOne]]'s ramp collides
    * in sign-vs-mean signatures (see noiseWavOne's doc); md5 noise is
    * both independent per id (measured: 2000/2000 distinct 32-window
    * sign patterns) and one `('0x' || substr(md5(...), 1, 8))::bigint`
    * away in DuckDB. Formula contract (re-derived sample by sample by
    * the oracle): mono 16-bit 8 kHz, frames n = 200 + id%57,
    * sample(t) = (first 8 md5 hex of "id|t" as uint32) % 4001 − 2000. */
  private[graft] def hashWavOne(id: Long): Array[Byte] = {
    val frames = 200 + java.lang.Math.floorMod(id, 57L).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val pcm = new Array[Byte](frames * 2)
    var t = 0
    while (t < frames) {
      // digest() resets the instance; the first 4 bytes big-endian ARE
      // the "first 8 md5 hex chars as uint32" of the formula contract
      val d = md.digest(s"$id|$t".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val s = (v % 4001L).toInt - 2000
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    writeWav(pcm, frames, 8000, 1)
  }

  /** One [[hashWavOne]] clip per id row. One mapPartitions pass. */
  def synthesizeHashWav(ids: DataFrame, idCol: String = "doc_id"): DataFrame =
    synthesizeWith(ids, idCol)(hashWavOne)
}
