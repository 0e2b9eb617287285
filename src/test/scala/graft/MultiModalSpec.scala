package graft

import graft.operators.{MultiModal, Similarity}
import org.apache.spark.sql.functions._

/** Multimodal operators over opaque binary columns: REAL javax.imageio
  * decode (PNG gradients, multi-frame GIFs), pixel-exact stats,
  * downsampled features, real nearest-neighbor resize, and the handoff
  * into the similarity operators. Fixtures come from the deterministic
  * synthesize→encode path the mm_* gates also use, plus non-image
  * bytes for the broken-blob contract.
  */
class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private def imageIds = Seq(1L, 2L, 5L, 7L, 10L, 23L).toDF("doc_id")

  test("synthesize → decode round trip recovers the generator formulas exactly") {
    val stats = MultiModal.decodeStats(MultiModal.synthesize(imageIds))
      .orderBy("doc_id").collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 9).toInt, (6 + id % 7).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"dims of $id")
      assert(r.getLong(4) == w.toLong * h)
      if (id % 5 == 0) { // solid-gray animated GIF
        assert(r.getInt(3) == (2 + id % 3).toInt, s"n_frames of GIF $id")
        val exp = w.toLong * h * (id % 256)
        assert(r.getLong(5) == exp && r.getLong(6) == exp && r.getLong(7) == exp)
      } else { // PNG gradient: re-derive the channel sums in Scala
        assert(r.getInt(3) == 1)
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          sr += (7 * x + 13 * y + id) % 256
          sg += (3 * x + 5 * y + 2 * id) % 256
          sb += (x + 11 * y + 5 * id) % 256
        }
        assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((sr, sg, sb)), s"sums of $id")
      }
    }
  }

  test("decodeFrames expands multi-frame GIFs to per-frame rows with exact pixel sums; caps respected") {
    val frames = MultiModal.decodeFrames(MultiModal.synthesize(imageIds))
      .orderBy("doc_id", "frame_idx").collect()
    // PNG ids (1,2,7,23): one frame each; GIF ids (5,10): 2+id%3 frames
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && byDoc(7L).length == 1)
    assert(byDoc(5L).length == (2 + 5 % 3) && byDoc(10L).length == (2 + 10 % 3))
    // every GIF frame carries the full solid-gray payload (the writer
    // stores complete frames, and read(i) must return each whole)
    byDoc(10L).zipWithIndex.foreach { case (r, i) =>
      val (w, h) = ((8 + 10 % 9), (6 + 10 % 7))
      assert(r.getInt(1) == i && r.getInt(2) == w && r.getInt(3) == h)
      val exp = w.toLong * h * (10 % 256)
      assert(r.getLong(4) == exp && r.getLong(5) == exp && r.getLong(6) == exp)
    }
    // the PNG frame's sums equal decodeStats' (same single frame)
    val s7 = MultiModal.decodeStats(MultiModal.synthesize(Seq(7L).toDF("doc_id")))
      .collect().head
    val f7 = byDoc(7L).head
    assert((f7.getLong(4), f7.getLong(5), f7.getLong(6)) ==
      ((s7.getLong(5), s7.getLong(6), s7.getLong(7))))
    // frame cap: a 4-frame GIF capped to 2 yields frames 0 and 1 only
    val capped = MultiModal.decodeFrames(
        MultiModal.synthesize(Seq(10L).toDF("doc_id")), maxFrames = 2)
      .select("frame_idx").as[Int].collect().sorted
    assert(capped.toSeq == Seq(0, 1))
    // garbage blobs are dropped, not fatal
    assert(MultiModal.decodeFrames(
      Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content")).count() == 0)
    // a blob whose LATER frame data is corrupt drops WHOLE under the
    // capped incremental path too — end-of-frames is signalled by the
    // EXACT IndexOutOfBoundsException class per the ImageReader spec;
    // decode failures from reader internals (truncated stream, bad
    // LZW — often AIOOBE, an IOOBE subclass) must not masquerade as a
    // healthy short clip and undercount extractMeta's failure rates
    val whole = MultiModal.synthesize(Seq(10L).toDF("doc_id")) // 3-frame GIF
      .select("content").collect().head.getAs[Array[Byte]](0)
    val truncated = whole.take(whole.length / 3) // header + partial frames
    // (measured: the JDK GIF reader raises IIOException on a truncated
    // stream — never the exact IndexOutOfBoundsException end signal —
    // so the outer catch drops the blob; this pins that contract)
    val partial = MultiModal.decodeFrames(
      Seq((10L, truncated)).toDF("doc_id", "content"), maxFrames = 3)
    assert(partial.count() == 0,
      "a corrupt container must drop whole, not surface as a short clip")
  }

  test("extractMeta decodes dims/frames; undecodable blobs get sentinel dims, never kill the job") {
    val mixed = MultiModal.synthesize(imageIds)
      .unionAll(Seq((99L, "not an image".getBytes("UTF-8")))
        .toDF("doc_id", "content"))
    val meta = MultiModal.extractMeta(mixed).orderBy("doc_id").collect()
    assert(meta.length == 7)
    val bad = meta.last
    assert(bad.getLong(0) == 99L && bad.getInt(3) == -1 &&
      bad.getInt(4) == -1 && bad.getInt(5) == 0)
    val png = meta.find(_.getLong(0) == 1L).get
    assert(png.getInt(3) == 9 && png.getInt(4) == 7 && png.getInt(5) == 1)
    val gif = meta.find(_.getLong(0) == 10L).get
    assert(gif.getInt(5) == 3) // 2 + 10%3
  }

  test("decodeFeatures: real grid features, identical images at cosine 1, garbage dropped") {
    val dup = Seq(40L, 45L).toDF("doc_id") // distinct ids, then same bytes
    val sameBytes = MultiModal.synthesize(Seq(7L).toDF("doc_id"))
      .select(col("content")).as[Array[Byte]].head()
    val two = Seq((40L, sameBytes), (41L, sameBytes),
      (42L, "garbage".getBytes("UTF-8"))).toDF("doc_id", "content")
    val feats = MultiModal.decodeFeatures(two, grid = 3)
    assert(feats.count() == 2) // garbage dropped, not sentinel-ed
    val vecs = feats.select(col("doc_id").as("vec_id"),
      col("features").cast("array<double>").as("embedding"))
    val cos = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 40), vecs, k = 1)
      .select("cos").head().getDouble(0)
    assert(cos == 1.0)
    assert(dup.count() == 2) // (keep the fixture honest)
  }

  test("byte-histogram features: fixed width, normalized, deterministic (non-image binaries)") {
    val blobs = Seq(
      (1L, Array.fill[Byte](100)(0)),            // all zeros → one histogram bin
      (2L, (0 until 256).map(_.toByte).toArray)  // uniform over all bytes
    ).toDF("doc_id", "content")
    val f = MultiModal.extractFeatures(blobs, bins = 16)
      .orderBy("doc_id").collect()
    val rows = f.map(_.getSeq[Double](2))
    assert(rows.forall(_.length == 16))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9))
    assert(rows(0)(0) == 1.0)                       // zeros land in bin 0
    assert(rows(1).forall(v => math.abs(v - 1.0 / 16) < 1e-9)) // uniform
  }

  test("resize really rescales: target dims decode back exactly, payload deterministic, garbage dropped") {
    val mixed = MultiModal.synthesize(imageIds)
      .unionAll(Seq((99L, "hello media".getBytes("UTF-8")))
        .toDF("doc_id", "content"))
    val r1 = MultiModal.resize(mixed, 5, 4).orderBy("doc_id").collect()
    assert(r1.length == 6) // the text blob is dropped
    assert(r1.forall(r => r.getInt(1) == 5 && r.getInt(2) == 4))
    val r2 = MultiModal.resize(mixed, 5, 4).orderBy("doc_id").collect()
    assert(r1.zip(r2).forall { case (a, b) =>
      a.getAs[Array[Byte]](3).sameElements(b.getAs[Array[Byte]](3)) })
    // the resized payload is a REAL PNG: re-decoding it yields the
    // target dims (the old stub's payload was not decodable at all)
    val meta = MultiModal.extractMeta(
        MultiModal.resize(mixed, 5, 4).select(col("doc_id"), col("content")))
      .select("doc_id", "width", "height", "n_frames").collect()
    assert(meta.length == 6)
    assert(meta.forall(r => r.getInt(1) == 5 && r.getInt(2) == 4 && r.getInt(3) == 1))
  }

  test("resizeScale: exact integer NN replication — pixel sums scale by s², features invariant, AWT path agrees") {
    // PNG gradient docs only (id % 5 != 0): exact known pixels
    val ids = Seq(1L, 2L, 7L, 13L).toDF("doc_id")
    val base = MultiModal.synthesize(ids)
    val up = MultiModal.resizeScale(base, 3)
    // decoded stats of the upscaled twin: dims ×3, channel sums ×9 —
    // pinned against the BASE decode, i.e. out(x,y) = in(x/3, y/3)
    val b = MultiModal.decodeStats(base).orderBy("doc_id").collect()
    val u = MultiModal.decodeStats(up.select(col("doc_id"), col("content")))
      .orderBy("doc_id").collect()
    b.zip(u).foreach { case (bb, uu) =>
      assert(uu.getInt(1) == 3 * bb.getInt(1) && uu.getInt(2) == 3 * bb.getInt(2))
      assert(uu.getLong(5) == 9 * bb.getLong(5), s"sum_r of ${bb.getLong(0)}")
      assert(uu.getLong(6) == 9 * bb.getLong(6) && uu.getLong(7) == 9 * bb.getLong(7))
    }
    // feature invariance (the mm_neardup contract): when grid divides
    // the base dims, grid-mean features are EXACTLY invariant under
    // integer replication. doc 13: w = 8+13%9 = 12, h = 6+13%7 = 12 —
    // divisible by grid 4 (and 2)
    val thirteen = Seq(13L).toDF("doc_id")
    val fBase = MultiModal.decodeFeatures(MultiModal.synthesize(thirteen), grid = 4)
      .select("features").head().getSeq[Double](0)
    val fUp = MultiModal.decodeFeatures(
        MultiModal.resizeScale(MultiModal.synthesize(thirteen), 2)
          .select(col("doc_id"), col("content")), grid = 4)
      .select("features").head().getSeq[Double](0)
    assert(fBase == fUp, "grid-mean features must be bit-identical under 2× replication")
    // the AWT drawImage NEAREST path (resize) agrees with the explicit
    // replication loop on integer upscales — pins the JVM rendering
    // behavior resizeScale deliberately does NOT depend on
    val one = Seq(1L).toDF("doc_id")
    val viaAwt = MultiModal.decodeStats(
      MultiModal.resize(MultiModal.synthesize(one),
          (8 + 1 % 9) * 2, (6 + 1 % 7) * 2)
        .select(col("doc_id"), col("content"))).head()
    val viaLoop = MultiModal.decodeStats(
      MultiModal.resizeScale(MultiModal.synthesize(one), 2)
        .select(col("doc_id"), col("content"))).head()
    assert(viaAwt.getLong(5) == viaLoop.getLong(5) &&
      viaAwt.getLong(6) == viaLoop.getLong(6) &&
      viaAwt.getLong(7) == viaLoop.getLong(7))
  }

  private def hashFrameVal(id: Long, f: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id|$f".getBytes("UTF-8"))
    val v32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v32 % 256L).toInt
  }

  test("hashGif: md5-solid multi-frame round trip — frame counts, per-frame sums, DIFFERENT colors per frame") {
    // decodeFrames' existing gate only sees identical solid frames;
    // per-frame DIFFERENT palettes are what the temporal fixture needs
    // (a compositing/disposal bug or a lossy palette would show here)
    val ids = Seq(0L, 1L, 5L, 8L, 17L)
    val frames = MultiModal.decodeFrames(
        MultiModal.synthesizeHashGif(ids.toDF("doc_id")))
      .collect()
    val byDoc = frames.groupBy(_.getLong(0))
    ids.foreach { id =>
      assert(byDoc(id).length == 24 + (id % 9).toInt, s"frame count of $id")
    }
    frames.foreach { r =>
      val (id, f) = (r.getLong(0), r.getInt(1))
      val (w, h) = (8 + (id % 9).toInt, 6 + (id % 7).toInt)
      val v = hashFrameVal(id, f).toLong
      assert(r.getInt(2) == w && r.getInt(3) == h, s"dims of $id/$f")
      assert(r.getLong(4) == v * w * h && r.getLong(5) == v * w * h &&
        r.getLong(6) == v * w * h,
        s"frame $id/$f decoded sums must be the solid closed form v=$v")
    }
  }

  test("frameFeatures + resizeScaleFrames: temporal signatures, twin invariance, short-clip drop") {
    val ids = Seq(0L, 1L, 5L, 17L)
    val base = MultiModal.synthesizeHashGif(ids.toDF("doc_id"))
    val bf = MultiModal.frameFeatures(base, frames = 24)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    ids.foreach { id =>
      val (w, h) = (8 + (id % 9).toInt, 6 + (id % 7).toInt)
      val want = (0 until 24).map(f =>
        (6L * hashFrameVal(id, f) - 765L).toDouble * w * h)
      assert(bf(id) == want, s"temporal vector of $id")
    }
    // 2× upscaled re-encoded animation: frame count preserved, raw
    // luminance values scale by exactly 4, SIGNS (the signature) do not
    val twins = MultiModal.resizeScaleFrames(base, 2)
    val tf = MultiModal.frameFeatures(twins, frames = 24)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    ids.foreach { id =>
      assert(tf(id) == bf(id).map(_ * 4), s"upscaled values of $id must scale by factor²")
    }
    val nTwinFrames = MultiModal.decodeFrames(twins).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(id => assert(nTwinFrames(id) == 24 + (id % 9),
      s"re-encode must preserve the frame count of $id"))
    // a clip with fewer frames than the signature dim DROPS (no padded
    // fake bits), as does a non-image blob
    val short = MultiModal.synthesize(Seq(10L).toDF("doc_id")) // GIF, 2+10%3=4 frames
      .unionByName(Seq((99L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content"))
    assert(MultiModal.frameFeatures(short, frames = 24).count() == 0)
    // banded pairing end to end: planted twins at hamming 0, nothing else
    val all = base.select("doc_id", "content").unionByName(
      twins.select((col("doc_id") + 1000L).as("doc_id"), col("content")))
    val pairs = Similarity.hammingBandedPairs(
        MultiModal.frameFeatures(all, frames = 24),
        dim = 24, maxHamming = 0, bands = 3, idCol = "doc_id", vecCol = "features")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == ids.map(i => (i, i + 1000L)).toSet)
  }
}
