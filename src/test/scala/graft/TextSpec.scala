package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Text-analysis function contracts on crafted fixtures. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subwordCount (BPE-ish regex segmentation)") {
    val df = Seq("hello world", "camelCase99x  spaced").toDF("t")
    val out = df.select(
      Text.tokenCount(col("t")).as("w"),
      Text.subwordCount(col("t")).as("sw")).as[(Int, Int)].collect().toSeq
    assert(out.head == ((2, 2)))
    // camelCase99x → camel|Case99|x boundaries + 'spaced' = 4 subwords, 2 words
    assert(out(1)._1 == 2 && out(1)._2 > 2)
  }

  test("charTrigrams are distinct sliding 3-grams of the normalized text") {
    val grams = Seq("a  B").toDF("t")
      .select(Text.charTrigrams(col("t")).as("g")).as[Seq[String]].head()
    assert(grams == Seq("a b"))   // normalized to "a b" → one trigram
    val g2 = Seq("abcd").toDF("t")
      .select(Text.charTrigrams(col("t")).as("g")).as[Seq[String]].head()
    assert(g2 == Seq("abc", "bcd"))
  }

  test("charNgramScore is 1.0 when every trigram is in the profile, 0.0 when none") {
    val df = Seq("abcd").toDF("t")
    val hit = df.select(Text.charNgramScore(col("t"), Seq("abc", "bcd")).as("s"))
      .as[Double].head()
    val miss = df.select(Text.charNgramScore(col("t"), Seq("zzz")).as("s"))
      .as[Double].head()
    assert(hit == 1.0 && miss == 0.0)
  }

  test("winnowing fingerprints: identical text → identical prints; shared passage overlaps") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val variant = "INTRO TEXT " + base + " AND A DIFFERENT TAIL SECTION HERE"
    val other = "completely different content with nothing in common at all whatsoever"
    val df = Seq((1L, base), (2L, base), (3L, variant), (4L, other)).toDF("id", "t")
      .select(col("id"), Text.winnow(col("t")).as("fp"))
    val fps = df.as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L) == fps(2L))
    val overlap13 = fps(1L).toSet.intersect(fps(3L).toSet).size.toDouble / fps(1L).size
    val overlap14 = fps(1L).toSet.intersect(fps(4L).toSet).size.toDouble / fps(1L).size
    assert(overlap13 > 0.5, s"shared passage should overlap, got $overlap13")
    assert(overlap14 < 0.1, s"unrelated docs should not overlap, got $overlap14")
  }

  test("repetition signals: top-token and top-bigram occupancy") {
    val rows = Seq(
      "a a a a",          // one token everywhere → 1.0; bigram "a a" ×3 → 1.0
      "a b c d",          // all distinct → 0.25; bigrams distinct → 1/3
      "spam spam x spam"  // 3/4 tokens; bigrams: "spam spam","spam x","x spam" → 1/3
    ).toDF("t").select(
      Text.topTokenFraction(col("t")).as("tt"),
      Text.topBigramFraction(col("t")).as("tb")).collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 1.0)
    assert(rows(1).getDouble(0) == 0.25 && rows(1).getDouble(1) == 0.3333)
    assert(rows(2).getDouble(0) == 0.75 && rows(2).getDouble(1) == 0.3333)
  }

  test("PII redaction replaces emails and phone spans, leaves prose intact") {
    val out = Seq("reach me at jo.doe+x@mail.example.org or +1 555 123 4567 ok")
      .toDF("t").select(Text.redactPii(col("t"))).head().getString(0)
    assert(out == "reach me at <EMAIL> or <PHONE> ok")
    val noop = Seq("no pii here 42").toDF("t")
      .select(Text.redactPii(col("t"))).head().getString(0)
    assert(noop == "no pii here 42")
  }

  test("BPE-ish pre-tokenizer counts punct/number runs that whitespace misses") {
    val r = Seq("hello, world! v2.0 x").toDF("t").select(
      Text.bpeTokenCount(col("t")).as("bpe"),
      Text.tokenCount(col("t")).as("ws")).head()
    // hello|,| world|!| v|2|.|0| x = 9 vs 4 whitespace tokens
    assert(r.getInt(0) == 9 && r.getInt(1) == 4)
  }

  test("ngramsOf keeps multiplicity; shinglesOf deduplicates") {
    val df = Seq("x y x y x").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.ngramsOf(col("toks"), 2).as("ng"),
        Text.shinglesOf(col("toks"), 2).as("sh"))
    val (ng, sh) = df.as[(Seq[String], Seq[String])].head()
    assert(ng == Seq("x y", "y x", "x y", "y x"))
    assert(sh == Seq("x y", "y x"))
  }

  test("shingleKey pins the oracle-portable 60-bit value contract") {
    // the DuckDB lockstep formula is ('0x' || substr(md5(sh), 1, 15))::bigint;
    // these literals are that expression computed independently (python
    // hashlib) — if either engine's side of the contract drifts, a gate
    // hash moves, but THIS pins the Spark side alone, pre-gate
    val r = Seq("a b c", "the quick brown").toDF("t")
      .select(Text.shingleKey(col("t"))).as[Long].collect().toSeq
    assert(r == Seq(31251835280889960L, 846626497777792448L))
    // positivity invariant: 15 hex chars = 60 bits, always >= 0 — the
    // decimal rendering fed to the minhash permutation has no sign char
    val mn = Seq.tabulate(64)(i => s"tok$i x y").toDF("t")
      .select(min(Text.shingleKey(col("t")))).as[Long].head()
    assert(mn >= 0L)
  }

  test("classifier score matches an independent reimplementation of the fixture formula") {
    import graft.functions.QualityModel
    def refScore(text: String): Double = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val sum = toks.map { t =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        QualityModel.weights((java.lang.Long.parseLong(hex, 16) % QualityModel.dim).toInt)
      }.sum
      1.0 / (1.0 + math.exp(-(QualityModel.bias + sum / math.max(toks.size, 1))))
    }
    val texts = Seq("The quick brown fox jumps", "der die das und ist",
      "key agg row scan slow fast", "x")
    val got = texts.toDF("text")
      .select(Text.classifierScore(col("text")).as("s")).as[Double].collect().toSeq
    texts.zip(got).foreach { case (t, s) =>
      assert(math.abs(s - refScore(t)) < 1e-12, s"text '$t'")
      assert(s > 0.0 && s < 1.0)
    }
  }

  test("winnow handles short and null inputs") {
    val out = Seq(Some("ab"), None).toDF("t")
      .select(Text.winnow(col("t")).as("fp")).as[Seq[Long]].collect().toSeq
    assert(out.forall(_.isEmpty))
  }

  test("winnowing guarantee (property): any shared passage >= k+w-1 chars yields a common print") {
    // Schleimer et al.'s detection guarantee, checked over 25 seeded
    // random doc pairs with a planted shared passage of exactly the
    // guarantee-threshold length
    val k = 8; val w = 4
    val rnd = new scala.util.Random(42)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cases = (1 to 25).map { i =>
      val passage = randText(k + w - 1)   // exactly the minimum guaranteed length
      (i.toLong, randText(20 + rnd.nextInt(40)) + passage + randText(20 + rnd.nextInt(40)),
        randText(30 + rnd.nextInt(30)) + passage + randText(10 + rnd.nextInt(50)))
    }
    val docs = cases.flatMap { case (i, a, b) => Seq((i * 2, i, a), (i * 2 + 1, i, b)) }
      .toDF("doc_id", "pair", "text")
    val prints = docs
      .select(col("doc_id"), col("pair"), Text.kgramHashes(col("text"), k).as("hs"))
      .select(col("doc_id"), col("pair"), explode(Text.winnowMins(col("hs"), w)).as("p"))
    val sharedPerPair = prints.as("a").join(prints.as("b"),
        col("a.pair") === col("b.pair") && col("a.doc_id") < col("b.doc_id") &&
          col("a.p") === col("b.p"))
      .select(col("a.pair")).distinct().as[Long].collect().toSet
    assert(sharedPerPair == (1L to 25L).toSet,
      s"pairs missing a guaranteed shared print: ${(1L to 25L).toSet -- sharedPerPair}")
  }

  test("winnowMinsPos: first in-window min with its global position, deduped") {
    // hs = [5,3,9,3,7], w = 2 → windows [5,3]:(2,3) [3,9]:(2,3) [9,3]:(4,3) [3,7]:(4,3)
    val out = Seq(Tuple1(Seq(5L, 3L, 9L, 3L, 7L))).toDF("hs")
      .select(Text.posIndexed(col("hs")).as("hsp"))
      .select(explode(Text.winnowMinsPos(col("hsp"), 2)).as("s"))
      .select("s.pos", "s.h").as[(Int, Long)].collect().toSeq
    assert(out == Seq((2, 3L), (4, 3L)))
  }

  test("winnowMinsPos: positions agree with winnowMins values; short input empty") {
    val hs = Seq(Tuple1(Seq(9L, 8L, 7L, 6L, 5L, 4L)))
    val vals = hs.toDF("hs").select(Text.winnowMins(col("hs"), 3).as("v"))
      .as[Seq[Long]].head().toSet
    val withPos = hs.toDF("hs")
      .select(Text.posIndexed(col("hs")).as("hsp"))
      .select(explode(Text.winnowMinsPos(col("hsp"), 3)).as("s"))
      .select("s.pos", "s.h").as[(Int, Long)].collect()
    assert(withPos.map(_._2).toSet == vals)
    // strictly-decreasing input: every window's min is its LAST element
    assert(withPos.forall { case (pos, h) => hs.head._1(pos - 1) == h })
    val short = Seq(Tuple1(Seq(1L, 2L))).toDF("hs")
      .select(Text.posIndexed(col("hs")).as("hsp"))
      .select(Text.winnowMinsPos(col("hsp"), 3).as("v")).head().getSeq[Any](0)
    assert(short.isEmpty)
  }
}
