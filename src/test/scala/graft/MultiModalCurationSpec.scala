package graft

import graft.examples.MultiModalCurationExample
import graft.operators.{AudioModal, Curation, MultiModal}
import org.apache.spark.sql.functions._

/** The composed cross-modality curation contract: the survivor set is
  * EXACTLY the text-curated corpus minus the media lanes' losers, the
  * planted media twins are dropped by their lanes, and the whole
  * composition is deterministic.
  */
class MultiModalCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents

  // doc ids whose synthesized image dims are multiples of the grid, so
  // a 2× nearest-neighbor upscale twin has IDENTICAL grid-mean
  // features (the mm_neardup fixture rule: w = 8+id%9, h = 6+id%7)
  private def imageEligible(ids: Seq[Long]): Seq[Long] =
    ids.filter(id => (8 + id % 9) % 4 == 0 && (6 + id % 7) % 4 == 0)

  // deterministic pseudo-random mono WAV: random samples give each
  // clip an independent signature, unlike the U-shaped synthesizeWav
  // ramp (see AudioModal.noiseWavOne's doc)
  private def noiseWav(id: Long): Array[Byte] = AudioModal.noiseWavOne(id)

  test("the demo's planted fixtures are non-vacuous and every planted twin drops through its lane") {
    val allIds = docs.select("doc_id").as[Long].collect().toSeq
    val ids = docs.select("doc_id")
    // re-derive the planting rules independently (this test exists
    // because a prior fixture filter was UNSATISFIABLE — the image
    // lane ran vacuously while the composition spec stayed green)
    val imgBases = allIds.filter(id =>
      id % 5 != 0 && (8 + id % 9) % 4 == 0 && (6 + id % 7) % 4 == 0)
    assert(imgBases.nonEmpty, "demo image planting must be satisfiable")
    val audBases = allIds.filter(_ % 22 == 0)
    assert(audBases.nonEmpty, "demo audio planting must be satisfiable")
    val images = MultiModalCurationExample.plantedImages(ids)
    val clips = MultiModalCurationExample.plantedClips(ids)
    assert(images.count() == 2L * imgBases.size, "each base carries one twin")
    assert(clips.count() == 2L * audBases.size)
    val imgLosers = MultiModalCurationExample.imageLosers(images)
      .as[Long].collect().toSet
    val audLosers = MultiModalCurationExample.audioLosers(clips)
      .as[Long].collect().toSet
    // every planted twin (keyed base+1 / base+11, always the larger
    // side of its pair) must be dropped by its lane
    imgBases.foreach(b => assert(imgLosers.contains(b + 1),
      s"image twin of base $b not dropped"))
    audBases.foreach(b => assert(audLosers.contains(b + 11),
      s"audio twin of base $b not dropped"))
  }

  test("survivors = curated text minus image losers minus audio losers; planted twins drop") {
    val allIds = docs.select("doc_id").as[Long].collect().toSeq.sorted
    // image fixture: eligible ids paired (base, twin); the twin doc
    // carries a decode→2× NN-upscale→PNG re-encode of the BASE's image
    // — feature-identical, so the pair surfaces at hamming 0
    val elig = imageEligible(allIds)
    val imgPairs = elig.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val bases = MultiModal.synthesize(imgPairs.map(_._1).toDF("doc_id"))
    val twins = MultiModal.resizeScale(bases, 2)
      .join(imgPairs.toDF("doc_id", "twin_id"), "doc_id")
      .select(col("twin_id").as("doc_id"), col("content"))
    val images = bases.select("doc_id", "content").unionByName(twins)
    // audio fixture: disjoint id pairs where the twin carries the SAME
    // PCM blob re-keyed (a re-encoded copy at signature granularity)
    val audioIds = allIds.filterNot(elig.toSet)
    val audPairs = audioIds.take(40).grouped(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq
    val clips = audPairs.flatMap { case (a, b) =>
      Seq((a, noiseWav(a)), (b, noiseWav(a)))
    }.toDF("doc_id", "content")

    val imgLosers = MultiModalCurationExample.imageLosers(images)
      .as[Long].collect().toSet
    val audLosers = MultiModalCurationExample.audioLosers(clips)
      .as[Long].collect().toSet
    // every planted twin (the larger id of its pair) must be dropped
    // by its lane. (A planted BASE may also drop — legitimately — when
    // it is the larger side of a background near-collision between
    // unrelated gradients; adjacent ids shift all channels by a small
    // constant, so hamming ≤ 5 background pairs are expected and the
    // lane treats them as the near-dups they are.)
    imgPairs.foreach { case (a, b) =>
      assert(imgLosers.contains(math.max(a, b)),
        s"image twin pair ($a,$b) not dropped") }
    audPairs.foreach { case (a, b) =>
      assert(audLosers.contains(math.max(a, b)),
        s"audio twin pair ($a,$b) not dropped") }
    // the audio lane pairs at maxHamming=0 over independent random
    // signatures: NO base loses there
    assert(!audPairs.map(_._1).exists(audLosers), "an audio base was dropped")

    // the composed corpus is EXACTLY text-survivors minus lane losers
    val textIds = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    val curated = MultiModalCurationExample.curateAll(docs, images, clips)
    val curatedIds = curated.select("doc_id").as[Long].collect().toSet
    assert(curatedIds == textIds -- imgLosers -- audLosers)
    // output schema is the text lane's curated contract
    assert(curated.columns.toSeq == Seq("doc_id", "text", "n_tokens", "split"))

    // determinism: the full composition, run twice, is identical
    val again = MultiModalCurationExample.curateAll(docs, images, clips)
      .select("doc_id").as[Long].collect().toSet
    assert(again == curatedIds)
  }
}
