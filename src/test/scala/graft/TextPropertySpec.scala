package graft

import graft.functions.Text
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks (deterministic seeded samples, the CoderSpec
  * pattern) for the text primitives every passage-dedup gate stands on.
  * The load-bearing one is the Schleimer winnowing GUARANTEE: any two
  * documents sharing a passage of ≥ k+w−1 chars share at least one
  * print — which holds iff every window of w consecutive k-gram
  * positions contributes at least one selected print. The gates check
  * end results on one corpus; these check the invariant on adversarial
  * random inputs (repeats, tiny alphabets, unicode).
  */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 40): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  // small alphabets force hash-value repeats inside windows — the
  // adversarial case for min-selection dedup; plus unicode and spaces
  private val texts: Seq[String] =
    samples(Gen.stringOf(Gen.oneOf('a', 'b', ' '))) ++
    samples(Gen.asciiPrintableStr) ++
    samples(Gen.stringOf(Gen.oneOf('中', 'ÿ', 'é', 'x', ' ')), 10) ++
    Seq("", "aaaaaaaaaaaaaaaaaa", "ab ab ab ab ab ab ab")

  private val k = 5
  private val w = 4

  test("winnowing guarantee: every w-window of k-gram hashes contributes a selected print") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "raw")
      .select(col("id"), Text.normalize(col("raw")).as("t"))
      .select(col("id"), col("t"), Text.kgramHashes(col("t"), k).as("hs"))
      .select(col("id"), col("hs"), Text.winnowMins(col("hs"), w).as("prints"))
    df.as[(Long, Seq[Long], Seq[Long])].collect().foreach { case (id, hs, prints) =>
      if (hs.length < w) assert(prints.isEmpty, s"doc $id: short input must select nothing")
      else {
        val printSet = prints.toSet
        // selection is sound: every print is some window's minimum hash
        assert(printSet.subsetOf(hs.toSet), s"doc $id: print not among the k-gram hashes")
        // and complete: no w-window is left without a selected print
        hs.sliding(w).zipWithIndex.foreach { case (win, pos) =>
          assert(win.exists(printSet.contains),
            s"doc $id: window at $pos has no selected print (the guarantee breach)")
        }
        // each selected print IS a window minimum (not an arbitrary member)
        val windowMins = hs.sliding(w).map(_.min).toSet
        assert(printSet == windowMins, s"doc $id: prints != window minima")
      }
    }
  }

  test("positional winnowing selects the same hashes, with in-bounds first-occurrence positions") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "raw")
      .select(col("id"), Text.normalize(col("raw")).as("t"))
      .select(col("id"), col("t"), Text.kgramHashes(col("t"), k).as("hs"))
      .select(col("id"), col("hs"), Text.posIndexed(col("hs")).as("hsp"))
      .select(col("id"), col("hs"), Text.winnowMinsPos(col("hsp"), w).as("ps"))
      .select(col("id"), col("hs"),
        expr("transform(ps, s -> s.h)").as("phs"),
        expr("transform(ps, s -> s.pos)").as("ppos"))
    df.as[(Long, Seq[Long], Seq[Long], Seq[Int])].collect().foreach {
      case (id, hs, phs, ppos) =>
        // hash set identical to the positionless form's selection
        val expected = if (hs.length < w) Set.empty[Long]
          else hs.sliding(w).map(_.min).toSet
        assert(phs.toSet == expected, s"doc $id: positional selection diverged")
        // every (h, pos) is truthful: hs(pos-1) == h, 1-based, in range
        phs.zip(ppos).foreach { case (h, p) =>
          assert(p >= 1 && p <= hs.length && hs(p - 1) == h,
            s"doc $id: position $p does not hold hash $h")
        }
    }
  }

  test("rolling-hash winnow keeps the same window guarantee under its own hash") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "raw")
      .select(col("id"), Text.normalize(col("raw")).as("t"))
      .select(col("id"), length(col("t")).as("len"),
        Text.winnow(col("t"), k, w).as("prints"))
    // recompute the rolling hashes in plain Scala (same recurrence) and
    // check window coverage of the UDF's selection
    def roll(s: String): Array[Long] = {
      if (s.length < k) return Array.empty
      val B = 257L
      var pow = 1L; (0 until k - 1).foreach(_ => pow *= B)
      val hs = new Array[Long](s.length - k + 1)
      var h = 0L
      s.indices.foreach { i =>
        if (i < k) h = h * B + s.charAt(i)
        else h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
        if (i >= k - 1) hs(i - k + 1) = h
      }
      hs
    }
    val norm = texts.map(t => t.trim.toLowerCase.replaceAll("\\s+", " "))
    df.as[(Long, Int, Seq[Long])].collect().foreach { case (id, _, prints) =>
      val hs = roll(norm(id.toInt))
      if (hs.length >= w) {
        val printSet = prints.toSet
        hs.sliding(w).zipWithIndex.foreach { case (win, pos) =>
          assert(win.exists(printSet.contains),
            s"doc $id: rolling-winnow window at $pos uncovered")
        }
      } else assert(prints.isEmpty)
    }
  }

  test("BPE: detokenize identity on arbitrary text; every multi-char token is a trained merge output") {
    val model = graft.expressions.BpeFixture.default
    val mergeOutputs = model.merges.map { case (l, r) => l + r }.toSet
    // corpus-like text plus adversarial inputs the trainer never saw:
    // digits, punctuation, unicode, runs of whitespace
    val bpeTexts = texts ++
      samples(Gen.stringOf(Gen.oneOf('a', 'e', 'r', ' ', '\n', '\t', '0', '9', '.', ',', '!')), 30) ++
      Seq(" leading space", "trailing space ", "a  double  space", "12345 mixed w0rds!")
    bpeTexts.foreach { t =>
      val toks = model.encode(t)
      // TOTAL coverage: concatenating the tokens reproduces the text
      // exactly — the detokenize round-trip the tokenizer contract
      // promises (whitespace runs are tokens, nothing is dropped)
      assert(toks.mkString == t, s"round-trip failed for ${t.take(40).toSeq}")
      // closure: every token is either a single code point (base
      // alphabet, incl. chars the fixture never saw) or the output of
      // a trained merge — nothing else can be produced by merge-apply
      toks.foreach { tok =>
        assert(tok.codePointCount(0, tok.length) == 1 || mergeOutputs.contains(tok),
          s"token '$tok' is neither a base symbol nor a merge output")
      }
    }
    // the column form agrees with the kernel (registration + codegen path)
    val df = bpeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), Text.bpeTokens(col("t")).as("toks"))
    df.as[(Long, Seq[String])].collect().foreach { case (id, toks) =>
      assert(toks == model.encode(bpeTexts(id.toInt)).toSeq, s"column/kernel mismatch on doc $id")
    }
    // count wrappers line up: exact = size(tokens)
    val cnt = bpeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), Text.bpeTokenCountExact(col("t")).as("n"))
      .as[(Long, Int)].collect().toMap
    bpeTexts.zipWithIndex.foreach { case (t, i) =>
      assert(cnt(i.toLong) == model.encode(t).length)
    }
  }

  test("in-engine BPE trainer reproduces the committed fixture bit-for-bit") {
    import graft.expressions.BpeFixture
    import graft.operators.BpeTrain
    // same corpus and merge count as tools/train_bpe.py → the SAME
    // ordered merge table, rule for rule (distributed freq agg +
    // driver merge loop ≡ the reference trainer)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trained = BpeTrain.train(docs, BpeFixture.ruleCount)
    assert(trained.toSeq == BpeFixture.default.merges.toSeq)
  }

  test("BPE trainer: vocabBound is deterministic and train-on-bounded still tokenizes totally") {
    import graft.expressions.BpeModel
    import graft.operators.BpeTrain
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = BpeTrain.train(docs, 24, vocabBound = Some(10))
    val b = BpeTrain.train(docs, 24, vocabBound = Some(10))
    assert(a.toSeq == b.toSeq && a.nonEmpty)
    // a model trained on the bounded vocab still satisfies the
    // detokenize identity on text it never saw (total coverage is a
    // property of the pre-tokenizer, not the merges)
    val m = new BpeModel(a)
    val s = "never seen 42 text, with punct!  and  runs"
    assert(m.encode(s).mkString("") == s)
  }

  test("hashBucket is total and in range on adversarial keys") {
    import graft.operators.Sampling
    val keys = samples(Gen.asciiPrintableStr, 60) ++ Seq("", " ", "中文", "a|b", "\n")
    val df = keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "k")
      .select(Sampling.hashBucket(col("k"), 100).as("b"),
        Sampling.hashBucket(col("id"), 7).as("b7"))
    df.as[(Int, Int)].collect().foreach { case (b, b7) =>
      assert(b >= 0 && b < 100 && b7 >= 0 && b7 < 7)
    }
  }
}
