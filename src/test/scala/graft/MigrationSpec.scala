package graft

import graft.functions.Text
import graft.operators.{BloomDedup, Curation, CurationStream, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r17→current persisted-state version seam (r17 verdict #1): every
  * pre-r17 index refused by the version guards must be upgradable IN
  * ONE PASS — a column transform over the persisted table (gram table),
  * a re-derivation from the persisted shingle strings (LSH index), or a
  * signature recompute from staged gated text (stream state) — with NO
  * re-ingest of the source corpus. Each migration's output must be
  * indistinguishable from a fresh build on the current library version.
  *
  * The pre-r17 shapes are reconstructed here from the r17 diff's
  * before-state: gram tables stored `h` = full 32-char md5(gram) hex;
  * LSH shingle tables stored `sh` = raw n-gram strings; stream `bands`
  * stored signatures whose permutation md5s consumed raw shingle
  * strings.
  */
class MigrationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then naps in the warm afternoon sun"),
    (2L, "pack my box with five dozen liquor jugs before the movers arrive at noon tomorrow"),
    (3L, "sphinx of black quartz judge my vow while the orchestra tunes in the next room"),
    (4L, "the quick brown fox jumps over the lazy dog and then naps in a cool evening shade")
  ).toDF("doc_id", "text")

  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and then naps in the warm afternoon sun today"),
    (11L, "a completely novel document about catalyst plans and exchange reuse in modern engines"),
    (12L, "movers arrive at noon tomorrow pack my box with five dozen liquor jugs they said"),
    (13L, "another novel text never seen anywhere in the standing corpus of any epoch")
  ).toDF("doc_id", "text")

  // ---- pre-r17 on-disk shape replicas (from the r17 diff's before-state) ----

  /** Pre-r17 corpusGrams: DISTINCT full md5(gram) hex strings. */
  private def oldGramTable(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id").as("id"), Text.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(explode(transform(sequence(lit(0), size(col("__toks")) - k),
        i => md5(concat_ws(" ", slice(col("__toks"), i + lit(1), lit(k)))))).as("h"))
      .distinct()

  /** Pre-r17 LshIndex.shingles: (id, sh) with RAW n-gram strings. */
  private def oldShingleTable(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id").as("id"), Text.tokens(col("text")).as("__toks"))
      .select(col("id"), explode(Text.shinglesOf(col("__toks"), n)).as("sh"))

  private def roundTrip(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-mig-$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("migrateGramTable: one column transform == fresh corpusGrams, and incrementalSpans is identical") {
    val old = roundTrip(oldGramTable(corpus, k = 5), "grams")
    assert(old.schema("h").dataType == org.apache.spark.sql.types.StringType)
    // the guard refuses the pre-r17 table and names the migrator
    val e = intercept[IllegalArgumentException] {
      BloomDedup.incrementalSpans(batch, old).collect()
    }
    assert(e.getMessage.contains("migrateGramTable"))
    val migrated = BloomDedup.migrateGramTable(old)
    val fresh = BloomDedup.corpusGrams(corpus, k = 5)
    assert(migrated.as[Long].collect().sorted.toSeq
      == fresh.as[Long].collect().sorted.toSeq,
      "migrated gram keys differ from a fresh build")
    val viaMigrated = BloomDedup.incrementalSpans(batch, migrated)
      .orderBy("doc_id", "start_tok").collect().toSeq
    val viaFresh = BloomDedup.incrementalSpans(batch, fresh)
      .orderBy("doc_id", "start_tok").collect().toSeq
    assert(viaMigrated == viaFresh && viaMigrated.nonEmpty,
      "incrementalSpans must agree (non-vacuously) on migrated vs fresh grams")
    // already-keyed input: nothing to migrate — refuse, don't double-hash
    val e2 = intercept[IllegalArgumentException] {
      BloomDedup.migrateGramTable(fresh)
    }
    assert(e2.getMessage.contains("already keyed"))
  }

  test("migrateLshIndex: re-keyed persisted shingles == fresh lshIndex, and incrementalLshPrebuilt is identical") {
    val old = roundTrip(oldShingleTable(corpus, n = 3), "shingles")
    assert(old.schema("sh").dataType == org.apache.spark.sql.types.StringType)
    val migrated = BloomDedup.migrateLshIndex(old)
    val fresh = BloomDedup.lshIndex(corpus)
    // all three index tables are value-identical to a fresh build
    assert(migrated.shingles.as[(Long, Long)].collect().sorted.toSeq
      == fresh.shingles.as[(Long, Long)].collect().sorted.toSeq)
    assert(migrated.bands.as[(Long, Int, String)].collect().sorted.toSeq
      == fresh.bands.as[(Long, Int, String)].collect().sorted.toSeq)
    assert(migrated.sizesOf.as[(Long, Long)].collect().sorted.toSeq
      == fresh.sizesOf.as[(Long, Long)].collect().sorted.toSeq)
    val batchIdx = BloomDedup.lshIndex(batch)
    val viaMigrated = BloomDedup.incrementalLshPrebuilt(batchIdx, migrated, 0.3)
      .orderBy("id", "dup_of").collect().toSeq
    val viaFresh = BloomDedup.incrementalLshPrebuilt(batchIdx, fresh, 0.3)
      .orderBy("id", "dup_of").collect().toSeq
    assert(viaMigrated == viaFresh && viaMigrated.nonEmpty,
      "incrementalLshPrebuilt must agree (non-vacuously) on migrated vs fresh index")
    // the guard refuses a raw pre-r17 index and names the migrator
    val oldIdx = BloomDedup.LshIndex(old,
      fresh.bands.limit(0), Some(old.groupBy("id").agg(count(lit(1)).as("n"))))
    val e = intercept[IllegalArgumentException] {
      BloomDedup.incrementalLshPrebuilt(batchIdx, oldIdx, 0.3).collect()
    }
    assert(e.getMessage.contains("migrateLshIndex"))
    // already-keyed input: refuse, don't double-hash
    val e2 = intercept[IllegalArgumentException] {
      BloomDedup.migrateLshIndex(fresh.shingles)
    }
    assert(e2.getMessage.contains("already keyed"))
  }

  // ---- streaming state ----

  private def ingest(stateDir: String, part: Seq[(Long, String)], e: Long): Unit = {
    val b = part.toDF("doc_id", "text")
    val ids = b.select(col("doc_id")).filter(col("doc_id") < 2000)
    CurationStream.ingestEpoch(b,
      graft.examples.MultiModalCurationExample.epochImages(ids),
      graft.examples.MultiModalCurationExample.epochHashClips(ids),
      stateDir, e)
  }

  /** Downgrade a state dir's `bands` to the pre-r17 scheme: recompute
    * banded rows whose permutation md5s consume RAW shingle strings
    * (scheme 1), overwrite the live epoch partitions, stamp marker v1. */
  private def downgradeBands(stateDir: String, cfg: Curation.Config): Unit = {
    val g = spark.read.parquet(s"$stateDir/gated")
    val s = g.select(col("doc_id").as("id"), Text.tokens(col("text")).as("__toks"))
      .select(col("id"), explode(Text.shinglesOf(col("__toks"), 3)).as("sh"))
    val rows = cfg.minhashPerms / cfg.minhashBands
    val sig = s.groupBy("id").agg(
      count(lit(1)).as("n"),
      (0 until cfg.minhashPerms).map(i =>
        min(conv(substring(md5(concat(lit(s"$i|"), col("sh"))), 1, 15), 16, 10)
          .cast("long")).as(s"h$i")): _*)
    val bandSigs = (0 until cfg.minhashBands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r =>
        col(s"h${b * rows + r}").cast("string")): _*))
    }
    val banded = sig.select(col("id"), col("n"), array(bandSigs: _*).as("sigs"))
      .select(col("id"), col("n"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "sig")))
      .select(col("id"), col("n"), col("band"), col("sig"),
        slice(col("sigs"), lit(1), col("band")).as("before"))
    val epochs = g.select(col("doc_id").as("__mid"), col("__epoch"))
    banded.join(epochs, col("id") === col("__mid")).drop("__mid")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__epoch")
      .parquet(s"$stateDir/bands")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$stateDir/._sig_version.crc"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stateDir/_sig_version"), "1\n")
  }

  test("migrateSigState: a scheme-1 state resumes hash-equal to a never-migrated run, live and compacted") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val byEpoch = (0 until 4).map(e =>
      docs.filter(r => java.lang.Math.floorMod(r._1, 4L) == e))
    val cfg = Curation.Config()
    val root = java.nio.file.Files.createTempDirectory("graft-mig-state").toString
    val a = s"$root/a" // never migrated
    val b = s"$root/b" // downgraded to scheme 1 live, then migrated
    val c = s"$root/c" // folded, downgraded COMPACTED bands, then migrated
    Seq(a, b, c).foreach { st =>
      ingest(st, byEpoch(0), 0L); ingest(st, byEpoch(1), 1L)
    }
    CurationStream.compactState(spark, c, 2L)

    // b: live-partition downgrade → ingest refused, message names the migrator
    downgradeBands(b, cfg)
    val e = intercept[IllegalArgumentException] { ingest(b, byEpoch(2), 2L) }
    assert(e.getMessage.contains("migrateSigState"))
    // sanity: the downgrade actually changed the persisted rows
    val bandsOf = (st: String) => CurationStream.stateTable(spark, st, "bands")
      .get.select("id", "n", "band", "sig").orderBy("id", "band")
      .collect().toSeq
    assert(bandsOf(b) != bandsOf(a), "downgrade must change band signatures")
    CurationStream.migrateSigState(spark, b, cfg)
    assert(bandsOf(b) == bandsOf(a),
      "migrated live bands must equal the never-migrated state's")

    // c: compacted-generation downgrade (gen bands rewritten to scheme 1)
    val gen = graft.operators.IndexGen.live(spark, s"$c/__compacted").get
    val gGen = spark.read.parquet(s"$gen/gated")
    // reuse the live downgrade machinery through a scratch dir shaped
    // like a live tree, then move its output over the gen's bands
    val scratch = s"$root/scratch"
    gGen.write.partitionBy("__epoch").parquet(s"$scratch/gated")
    downgradeBands(scratch, cfg)
    val oldGenBands = spark.read.parquet(s"$scratch/bands")
    oldGenBands.write.mode("overwrite").parquet(s"$root/genbands")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$gen/bands"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(s"$root/genbands"), new java.io.File(s"$gen/bands"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$c/._sig_version.crc"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$c/_sig_version"), "1\n")
    assert(bandsOf(c) != bandsOf(a), "compacted downgrade must change band signatures")
    CurationStream.migrateSigState(spark, c, cfg)
    assert(bandsOf(c) == bandsOf(a),
      "migrated compacted bands must equal the never-migrated state's")

    // migration is idempotent on current state
    CurationStream.migrateSigState(spark, a, cfg)

    // resume all three across the seam: identical consolidated corpora
    Seq(a, b, c).foreach { st =>
      ingest(st, byEpoch(2), 2L); ingest(st, byEpoch(3), 3L)
    }
    val outOf = (st: String) => CurationStream.finalizeCorpus(spark, st)
      .orderBy("doc_id").collect().toSeq
    val outA = outOf(a)
    assert(outA.nonEmpty)
    assert(outOf(b) == outA, "live-migrated state diverged after resume")
    assert(outOf(c) == outA, "compacted-migrated state diverged after resume")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
