package graft.operators

import graft.expressions.BpeModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine BPE training (Sennrich et al., ACL'16), bit-compatible
  * with `tools/train_bpe.py`: the DISTRIBUTED part is one corpus pass
  * building the pre-token frequency table (the only thing that scales
  * with data); the merge loop then runs driver-side over that
  * Zipf-bounded dict — the standard trainer shape (HF/GPT-2 trainers
  * all reduce the corpus to a word-count dict first, because pair
  * counts are a function of the dict alone, not the corpus).
  *
  * Determinism: merge selection is max pair count with ties broken by
  * the lexicographically smallest (left, right) pair — identical to
  * the Python tool. Pre-tokenization is the shared
  * [[graft.expressions.BpeModel.PretokRegex]]; the tool compiles it
  * with `re.ASCII` so `\s` means the same ASCII class in Python, Java
  * and RE2 (without that flag Python's Unicode `\s` would classify
  * e.g. NBSP as whitespace and train a different table on crawl
  * text). Remaining caveat: string order here is Java code-unit
  * order, which matches Python's code-point order for all BMP text; a
  * corpus whose SYMBOLS mix supplementary-plane characters with
  * U+D800+ BMP characters could order ties differently.
  *
  * Scale: the corpus pass is scan + generate + vocab-sized partial agg
  * (one shuffle); the collected dict is |distinct pre-tokens| — Zipf
  * says millions at 100 TB, not billions. `vocabBound` caps the dict
  * deterministically (top-N by count, pre-token tie-break) for
  * adversarial inputs; None reproduces the reference trainer exactly.
  */
object BpeTrain {

  private val PRETOK = BpeModel.PretokRegex

  /** Pre-token frequency table (pt, cnt) — one corpus pass, one
    * vocab-sized shuffle. Persistable; training reads nothing else. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(regexp_extract_all(col(textCol), lit(PRETOK), lit(0))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merge rules from a corpus. Returns the ordered
    * merge table, directly loadable into [[graft.expressions.BpeModel]]. */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
            vocabBound: Option[Int] = None): Array[(String, String)] = {
    val freqDf = vocabBound match {
      case None => wordFreqs(docs, textCol)
      case Some(n) => wordFreqs(docs, textCol)
        .orderBy(col("cnt").desc, col("pt")).limit(n)
    }
    val collected = freqDf.collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreqs(collected, numMerges)
  }

  /** The driver-side merge loop on an already-collected freq dict —
    * split out so tests and incremental callers can reuse persisted
    * [[wordFreqs]] tables. */
  def trainFromFreqs(freqs: Seq[(String, Long)],
                     numMerges: Int): Array[(String, String)] = {
    // On the (pathological) event two rules emit the same symbol
    // string and two words collapse to one sequence, frequencies SUM
    // here — deterministic under any traversal order. (The reference
    // Python trainer's dict comprehension would overwrite, silently
    // losing one word's count; the fixture corpus has no such
    // collision, so the parity test below is unaffected.)
    val model = new BpeModel(Array.empty)
    var vocab: Map[Vector[String], Long] =
      freqs.groupBy { case (pt, _) => model.codePoints(pt).toVector }
        .map { case (w, fs) => w -> fs.map(_._2).sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < numMerges) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((word, f) <- vocab; i <- 0 until word.length - 1) {
        val p = (word(i), word(i + 1))
        pairs.update(p, pairs.getOrElse(p, 0L) + f)
      }
      if (pairs.isEmpty) return merges.toArray
      // max count; ties -> lexicographically smallest (l, r)
      val best = pairs.minBy { case ((l, r), c) => (-c, l, r) }._1
      merges += best
      vocab = vocab.toSeq
        .map { case (w, f) => mergeWord(w, best._1, best._2) -> f }
        .groupMapReduce(_._1)(_._2)(_ + _)
      step += 1
    }
    merges.toArray
  }

  /** One left-to-right non-overlapping merge pass — the apply
    * semantics shared with BpeModel.encodeWord and the Python tool. */
  private def mergeWord(word: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      if (i + 1 < word.length && word(i) == l && word(i + 1) == r) {
        out += l + r; i += 2
      } else { out += word(i); i += 1 }
    }
    out.result()
  }
}
