package graft

import graft.operators.AudioModal
import org.apache.spark.sql.functions._

/** Audio modality: real javax.sound.sampled WAV decode — the
  * synthesize→encode→decode round trip must be the identity on
  * format metadata and exact integer sample statistics; broken blobs
  * sentinel (stats) or drop (features), never kill the job.
  */
class AudioModalSpec extends SparkSpec {
  import spark.implicits._

  private def clipIds = Seq(0L, 1L, 2L, 3L, 7L, 56L, 57L).toDF("doc_id")

  test("synthesize → WAV decode round trip recovers the generator formulas exactly") {
    val stats = AudioModal.decodeStats(AudioModal.synthesizeWav(clipIds))
      .orderBy("doc_id").collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      val ch = 1 + (id % 2).toInt
      val n = 200 + (id % 57).toInt
      assert(r.getInt(1) == 8000 + 1000 * (id % 3).toInt, s"rate of $id")
      assert(r.getInt(2) == ch && r.getLong(3) == n.toLong, s"layout of $id")
      def s(t: Int, c: Int): Long = (13L * t + 7L * c + id) % 4001 - 2000
      val exp0 = (0 until n).map(t => s(t, 0))
      assert(r.getLong(4) == exp0.sum, s"sum_c0 of $id")
      assert(r.getLong(6) == exp0.map(v => v * v).sum, s"ssq_c0 of $id")
      if (ch == 2) {
        val exp1 = (0 until n).map(t => s(t, 1))
        assert(r.getLong(5) == exp1.sum && r.getLong(7) == exp1.map(v => v * v).sum)
      } else assert(r.getLong(5) == 0L && r.getLong(7) == 0L)
    }
  }

  test("undecodable blobs: sentinel row in stats, dropped from features") {
    val mixed = AudioModal.synthesizeWav(Seq(4L).toDF("doc_id"))
      .unionAll(Seq((99L, "not a wav".getBytes("UTF-8"))).toDF("doc_id", "content"))
    val stats = AudioModal.decodeStats(mixed).orderBy("doc_id").collect()
    assert(stats.length == 2)
    assert(stats(1).getInt(1) == -1 && stats(1).getInt(2) == -1 &&
      stats(1).getLong(3) == 0L)
    assert(AudioModal.features(mixed).count() == 1)
  }

  test("non-PCM_SIGNED 16-bit streams sentinel instead of parsing as signed PCM") {
    // a WAV whose fmt chunk claims A-law at 16 bits little-endian: the
    // JDK reader accepts it verbatim (enc=ALAW, bits=16, !bigEndian),
    // and pre-fix the bits/endianness check alone let decodePcm parse
    // the A-law payload as signed PCM — silently wrong sums instead of
    // the documented sentinel/drop for non-conforming blobs
    val frames = 100
    val data = Array.tabulate[Byte](frames * 2)(i => (i * 7).toByte)
    val b = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + data.length); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16)
    b.putShort(6.toShort); b.putShort(1.toShort); b.putInt(8000)
    b.putInt(8000 * 2); b.putShort(2.toShort); b.putShort(16.toShort)
    b.put("data".getBytes); b.putInt(data.length); b.put(data)
    val blob = Seq((7L, b.array())).toDF("doc_id", "content")
    val r = AudioModal.decodeStats(blob).collect()
    assert(r.length == 1 && r(0).getInt(1) == -1 && r(0).getInt(2) == -1 &&
      r(0).getLong(3) == 0L,
      s"A-law-tagged stream must sentinel, got ${r.toSeq}")
    assert(AudioModal.features(blob).count() == 0,
      "A-law-tagged stream must be dropped from features")
  }

  test("windowed energy features: exact integers, window sums total the clip energy, similarity-ready") {
    val clips = AudioModal.synthesizeWav(clipIds)
    val f = AudioModal.features(clips, windows = 4).orderBy("doc_id").collect()
    val stats = AudioModal.decodeStats(clips).orderBy("doc_id").collect()
    f.zip(stats).foreach { case (fr, sr) =>
      val w = fr.getSeq[Double](2)
      assert(w.length == 4)
      assert(w.forall(v => v == math.rint(v)), "energies must be exact integers")
      assert(w.sum.toLong == sr.getLong(6), s"windows must total ssq_c0 of ${fr.getLong(0)}")
    }
    // identical ids → identical feature vectors (the similarity handoff)
    val twice = AudioModal.features(
      AudioModal.synthesizeWav(Seq(7L, 7L).toDF("doc_id")), windows = 4)
      .select("features").collect()
    assert(twice(0).getSeq[Double](0) == twice(1).getSeq[Double](0))
  }

  // per-id pseudo-random PCM: unlike the synthesizeWav ramp (whose
  // windowed-energy profile is U-shaped for EVERY id — sign-vs-mean
  // signatures collide by design), random samples give each clip an
  // independent ~random 32-bit signature
  private def noiseWav(id: Long): Array[Byte] = AudioModal.noiseWavOne(id)

  test("audio near-dup composition: windowed energies → sign bits → banded hamming pairs") {
    // the mm_neardup story on the SECOND modality: every clip also
    // appears as a re-keyed twin (same PCM bytes, new doc_id — the
    // audio analog of a re-encoded copy), and the decode → feature →
    // signature → banded-pair chain must surface exactly the planted
    // twin set. windows=32 gives a 32-bit signature; centering each
    // vector at its own mean makes signBits split windows into
    // above/below the clip's average energy; maxHamming=0 with any
    // band count has full recall by construction (identical
    // signatures share every band).
    val baseIds = Seq(0L, 1L, 2L, 3L, 7L, 21L, 40L, 56L)
    val base = baseIds.map(i => (i, noiseWav(i))).toDF("doc_id", "content")
    val twins = base.select((col("doc_id") + 1000L).as("doc_id"), col("content"))
    val feats = AudioModal.features(base.unionByName(twins), windows = 32)
    val mean = aggregate(col("features"), lit(0d), (a, b) => a + b) / lit(32d)
    val centered = feats.select(col("doc_id"),
      transform(col("features"), x => x - mean).as("fv"))
    val pairs = graft.operators.Similarity
      .hammingBandedPairs(centered, dim = 32, maxHamming = 0, bands = 4,
        idCol = "doc_id", vecCol = "fv")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = baseIds.map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(pairs), "every planted twin must pair at hamming 0")
    assert(pairs == planted, s"unrelated clips collided: ${pairs -- planted}")
  }

  test("hashWav: md5-noise decode round trip pins independently computed literals") {
    // expected values computed OUTSIDE the JVM (python hashlib over the
    // documented formula: n = 200 + id%57, s(t) = uint32(md5("id|t")
    // first 8 hex) % 4001 - 2000) — an independent cross-check of both
    // the generator and the decoder, not a re-run of the same Scala
    val clips = AudioModal.synthesizeHashWav(Seq(42L, 1999L).toDF("doc_id"))
    val stats = AudioModal.decodeStats(clips).orderBy("doc_id")
      .select("doc_id", "sample_rate", "channels", "n_frames", "sum_c0", "ssq_c0")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
    assert(stats == Seq(
      (42L, 8000, 1, 242L, -6074L, 341505482L),
      (1999L, 8000, 1, 204L, -11601L, 249620273L)))
    val feats = AudioModal.features(clips, windows = 32).orderBy("doc_id")
      .select(col("doc_id"), element_at(col("features"), 1).cast("long").as("w0"),
        element_at(col("features"), 32).cast("long").as("w31"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(feats == Seq((42L, 13773797L, 17040720L), (1999L, 11351254L, 8586571L)))
  }
}
