package graft

import graft.expressions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native-expression correctness: graft_dot must agree exactly with the
  * interpreted HOF formulation (same sequential double accumulation).
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals HOF dot bit-for-bit on float arrays") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_dot works via SQL after registration, with nulls null-propagated") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    val n = spark.sql("SELECT graft_dot(CAST(null AS array<double>), array(1.0D)) AS d")
      .select(isnull(col("d"))).as[Boolean].head()
    assert(n)
  }

  test("graft_dot rejects non-numeric-array inputs at analysis") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
  }

  test("optimizer rule rewrites the HOF dot-product pattern into the native expression") {
    import graft.expressions.DotProductRewrite
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      val rnd = new scala.util.Random(7)
      // parquet-backed input: a purely local relation would be folded by
      // ConvertToLocalRelation before the rewrite is observable
      val dir = java.nio.file.Files.createTempDirectory("graft-dotrw").toString
      (0 until 50).map { i =>
        (i.toLong, Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat()))
      }.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
      val vecs = spark.read.parquet(dir)
      // user writes the naive interpreted form...
      val hof = vecs.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"))
      // ...the optimized plan carries the codegen'd native expression
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"no rewrite in:\n$optimized")
      assert(!optimized.contains("aggregate("), s"HOF survived in:\n$optimized")
      // and the values are the ones the native expression computes
      GraftFunctions.register(spark)
      val native = vecs.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      assert(hof.collect().toSeq == native.collect().toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite preserves NULL semantics: null elements and ragged arrays") {
    import graft.expressions.DotProductRewrite
    // the HOF form returns NULL for a null element (zip_with product
    // poisons the fold) and for ragged arrays (zip_with null-pads the
    // shorter side) — the rewritten native expression must agree row
    // for row, or the optimizer rule would change query results
    val dir = java.nio.file.Files.createTempDirectory("graft-dotnull").toString
    Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (3L, Array[java.lang.Double](4.0, 5.0), Array[java.lang.Double](6.0, 7.0)),
      (4L, Array.empty[java.lang.Double], Array.empty[java.lang.Double])
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    def q() = vecs.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"))
      .orderBy("id")
    val baseline = q().collect().toSeq // rule OFF: pure HOF evaluation
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      val rewritten = q()
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        "rule did not fire on nullable-element arrays")
      assert(rewritten.collect().toSeq == baseline,
        "rewritten results diverge from HOF on null/ragged inputs")
      // spot-check the expected shape: rows 1, 2 NULL; 3 = 59.0; 4 = 0.0
      val byId = rewritten.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(59.0), 4L -> Some(0.0)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite keeps float-multiply precision of the uncasted HOF lambda") {
    import graft.expressions.DotProductRewrite
    // (x, y) -> x * y over two FLOAT arrays multiplies in float before
    // the double accumulation; the rewrite must reproduce that rounding
    // bit-for-bit (floatMul), not silently upgrade to double multiply
    val dir = java.nio.file.Files.createTempDirectory("graft-dotfloat").toString
    val rnd = new scala.util.Random(11)
    (0 until 100).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextFloat()), Array.fill(32)(rnd.nextFloat()))
    }.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    def q() = vecs.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d")).orderBy("id")
    val baseline = q().collect().toSeq
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      val rewritten = q()
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(rewritten.collect().toSeq == baseline,
        "rewritten float results diverge bit-wise from the HOF fold")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("optimizer rule leaves non-dot aggregates untouched") {
    import graft.expressions.DotProductRewrite
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      // sum-of-maxes: zip_with with greatest, not multiply — must NOT match
      val dir = java.nio.file.Files.createTempDirectory("graft-dotrw2").toString
      Seq((Array(1.0, 5.0), Array(4.0, 2.0))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
        .select(aggregate(
          zip_with(col("a"), col("b"), (x, y) => greatest(x, y)),
          lit(0.0), (acc, v) => acc + v).as("s"))
      assert(df.queryExecution.optimizedPlan.toString.contains("aggregate("))
      assert(df.as[Double].head() == 9.0)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("graft_winnow equals the former UDF kernel; codegen and interpreted agree") {
    import graft.functions.Text
    // reference: the exact algorithm the UDF ran (base-257 rolling
    // hash over NORMALIZED chars, window minima, distinct, sorted)
    def reference(raw: String, k: Int, w: Int): Seq[Long] = {
      val s = raw.trim.toLowerCase.replaceAll("\\s+", " ")
      if (s.length < k) return Seq.empty
      val n = s.length - k + 1
      val hs = new Array[Long](n)
      var h = 0L; val B = 257L; var pow = 1L
      (0 until k - 1).foreach(_ => pow *= B)
      s.indices.foreach { i =>
        if (i < k) h = h * B + s.charAt(i)
        else h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
        if (i >= k - 1) hs(i - k + 1) = h
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      (0 to n - w).foreach { p => out += hs.slice(p, p + w).min }
      out.toSeq.sorted
    }
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "ab", "  Mixed   Case  WhiteSpace  ", "中文 text too")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", codegen)
        val got = df.select(col("id"), Text.winnow(col("t"), 5, 3).as("fp"))
          .as[(Int, Seq[Long])].collect().toMap
        texts.zipWithIndex.foreach { case (t, i) =>
          assert(got(i) == reference(t, 5, 3), s"mode=$codegen text=$t")
        }
      } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
  }

  test("winnowPairsFast map side has no UDF and stays codegen'd") {
    import graft.operators.Dedup
    val docs = (1L to 30L).map(i => (i, s"some shared words tail$i")).toDF("doc_id", "text")
    val p = Dedup.winnowPairsFast(docs, 2, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("batchevalpython"),
      s"winnow must be the native expression:\n${p.take(600)}")
    assert(p.contains("graft_winnow"), "native graft_winnow missing from the plan")
  }
}
