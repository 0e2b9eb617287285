package graft

import graft.operators.{Sketches, TextStats}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks (deterministic seeded samples, the TextPropertySpec
  * pattern) for the round-11 profiling operators. The gates pin exact
  * values on one fixture; these pin the STRUCTURAL guarantees on
  * adversarial random inputs — the properties a user actually relies
  * on when the sketch meets data the gates never saw.
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7311L + i)))

  // zipf-ish skew: small key space with hot keys, plus long-tail keys
  private val keyBatches: Seq[Seq[String]] = (0 until 6).map { b =>
    val hot = samples(Gen.oneOf("a", "b", "c"), 60 + b * 10)
    val tail = samples(Gen.choose(0, 400).map(i => s"t$i"), 40)
    hot ++ tail
  }

  test("CMS never underestimates ANY key, at every depth/width, incl. width-1 collapse") {
    for {
      keys <- keyBatches
      (depth, width) <- Seq((1, 4), (2, 16), (4, 64), (3, 1))
    } {
      val df = keys.toDF("k")
      val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      val est = Sketches.cmsEstimate(
        Sketches.cmsTable(df, "k", depth, width), exact, "k", depth, width)
      val bad = exact.join(est, Seq("k"))
        .filter(col("cms_est") < col("cnt")).count()
      assert(bad == 0L, s"underestimate at depth=$depth width=$width")
    }
  }

  test("CMS estimate is bounded by the corpus total and exact on a collision-free width") {
    val keys = keyBatches.head
    val df = keys.toDF("k")
    val n = keys.size.toLong
    val est = Sketches.cmsEstimate(
      Sketches.cmsTable(df, "k", 4, 8192),
      df.distinct(), "k", 4, 8192)
    // 8192 cells for ~100 distinct keys: the md5 family is fixed, so
    // this either always passes or never does — deterministic, and the
    // exactness shows the min-trim recovers truth when it can
    val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
    assert(exact.join(est, Seq("k"))
      .filter(col("cms_est") =!= col("cnt")).count() == 0L)
    assert(est.filter(col("cms_est") > n).count() == 0L)
  }

  test("entropy is within [0, ln(distinct symbols)] and 0 exactly for uniform-single-symbol docs") {
    val texts = samples(Gen.stringOf(Gen.oneOf('a', 'b', 'c', ' ')), 40)
      .filter(_.nonEmpty) ++ Seq("x", "xxxxx", "ab", "a a a a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextStats.entropyScores(docs)
      .join(docs, Seq("doc_id"))
      .as[(Long, Double, Double, String)].collect()
    assert(out.length == texts.size) // non-empty docs all present
    out.foreach { case (id, hChar, hTok, t) =>
      val distinctChars = t.toSet.size
      assert(hChar >= 0.0 && hChar <= math.log(distinctChars) + 1e-4,
        s"doc $id: h_char $hChar outside [0, ln($distinctChars)]")
      assert(hTok >= 0.0, s"doc $id: h_token negative")
      if (distinctChars == 1) assert(hChar == 0.0)
    }
  }
}
