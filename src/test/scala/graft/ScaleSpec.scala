package graft

import graft.operators.{Sketches, SkewJoin}
import org.apache.spark.sql.functions._

/** Scale-pattern specs: bucketed co-located joins (zero-shuffle), salted
  * skew joins (equal results), sketches (bounded error).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS bleft")
    spark.sql("DROP TABLE IF EXISTS bright")
    (1 to 10000).map(i => (i.toLong % 500, s"l$i")).toDF("k", "lv")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bleft")
    (1 to 10000).map(i => (i.toLong % 500, i * 2)).toDF("k", "rv")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bright")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bleft").join(spark.table("bright"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 10000L * 20)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom prefilter: zero false negatives, ~fpp pass-through on all-novel batch") {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val corpus = (1 to 20000).map(i => s"corpus-key-$i").toDF("fp")
    val novel = (1 to 10000).map(i => s"novel-key-$i").toDF("fp")
    val bf = corpus.agg(
      call_function("graft_bloom_agg", xxhash64(col("fp")), lit(20000L))).head().getAs[Array[Byte]](0)
    def passes(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(call_function("graft_might_contain", lit(bf), xxhash64(col("fp")))).count()
    // no false negatives: every inserted key must pass (the correctness
    // contract incrementalExact's novel fast path relies on)
    assert(passes(corpus) == 20000L)
    // pass-through on truly-novel keys ≈ fpp (8 bits/item ≈ 2%): the
    // "shuffled volume is proportional to the dup rate" scale claim
    val fp = passes(novel)
    assert(fp < 500, s"false-positive rate ${fp / 10000.0} above 5%")
  }

  test("shingle exchanges carry 60-bit keys, never n-gram strings (byte-stable rows)") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StringType}
    val docs = (1 to 50).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon tok$i zeta eta")).toDF("doc_id", "text")
    // materialize = false keeps the whole plan visible (no checkpoint scan)
    for (op <- Seq(
        Dedup.minhashLsh(docs, threshold = 0.5, materialize = false),
        Dedup.jaccardJoinPrefix(docs, threshold = 0.7, materialize = false))) {
      val exchanges = op.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e }
      val shCarrying = exchanges.filter(_.output.exists(_.name == "sh"))
      assert(shCarrying.nonEmpty, "expected at least one exchange carrying sh")
      shCarrying.foreach { e =>
        val sh = e.output.find(_.name == "sh").get
        assert(sh.dataType == LongType,
          s"the shingle exchange must ship the 60-bit key, found ${sh.dataType}")
        // the raw text must not ride any shingle exchange either — a
        // string column here would reintroduce the unbounded row width
        assert(!e.output.exists(a => a.name == "__text" && a.dataType == StringType),
          s"raw text crossing a shingle exchange: ${e.output}")
      }
    }
  }

  test("salted skew join equals the plain join result on a hot-key distribution") {
    // 90% of probe rows share one key — the classic skew shape
    val probe = (1 to 5000).map(i =>
      (if (i % 10 != 0) 1L else (i % 97).toLong, s"p$i")).toDF("k", "pv")
    val build = (0L until 97L).map(k => (k, s"b$k")).toDF("k", "bv")
    val plain = probe.join(build, "k").select("pv", "bv")
      .as[(String, String)].collect().toSet
    val salted = SkewJoin.saltedInner(probe, build, "k", salts = 8)
      .select("pv", "bv").as[(String, String)].collect().toSet
    assert(salted == plain)
  }

  test("HLL distinct count within rsd bound of exact") {
    val df = (1 to 50000).map(i => i % 7321).toDF("v")
    val exact = df.select(countDistinct("v")).as[Long].head()
    val approx = Sketches.approxDistinct(df, "v", rsd = 0.02)
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06)
  }

  test("approx percentiles bracket the exact median") {
    val df = (1 to 10001).map(_.toDouble).toDF("v")
    val ps = Sketches.approxPercentiles(df, "v", Seq(0.25, 0.5, 0.75))
      .as[Seq[Double]].head()
    assert(math.abs(ps(1) - 5001.0) < 50)
    assert(ps(0) < ps(1) && ps(1) < ps(2))
  }

  test("exact sorted quantiles match the percentile aggregate on every shape") {
    import graft.operators.Stats
    // odd n, even n (interpolated), duplicates, single-row group
    val df = ((1 to 101).map(i => ("odd", i.toDouble)) ++
      (1 to 100).map(i => ("even", i.toDouble)) ++
      Seq.fill(50)(("dup", 7.0)) ++ Seq(("one", 42.0))).toDF("k", "v")
    val got = Stats.quantilesCont(df, "k", "v",
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = df.groupBy("k").agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("quantiles: NULL inputs are excluded but all-NULL groups still emit NULL rows") {
    import graft.operators.Stats
    // mixed group: quantile over the non-null values only (SQL
    // quantile_cont semantics); all-NULL group: emitted with NULL
    // quantiles, like the percentile aggregate — not silently dropped
    val df = Seq(("mixed", Some(1.0)), ("mixed", None), ("mixed", Some(3.0)),
        ("allnull", None), ("allnull", None))
      .toDF("k", "v")
    val got = Stats.quantilesCont(df, "k", "v", Seq(0.5 -> "p50"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(("allnull", None), ("mixed", Some(2.0))))
  }

  test("zorder2: exact Morton keys and quadrant contiguity under sort") {
    import graft.operators.Layout
    val grid = (for { x <- 0 to 7; y <- 0 to 7 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keyed = grid.select(col("x"), col("y"),
        Layout.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    // exact interleave: z = (sum over bits of x at 2i and y at 2i+1),
    // sign-flipped so signed long order == unsigned z-curve order
    def morton(x: Long, y: Long): Long =
      (0 until 32).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum ^ Long.MinValue
    keyed.foreach { case (x, y, z) => assert(z == morton(x, y), s"($x,$y)") }
    // the sign-flip property itself: a 32-bit-max second dimension must
    // sort AFTER a zero one (the raw code put it first)
    val big = Seq((0L, 0xFFFFFFFFL), (0L, 0L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"), col("y"))
      .orderBy("z").as[(Long, Long)].collect()
    assert(big.map(_._2).toSeq == Seq(0L, 0xFFFFFFFFL),
      "b >= 2^31 must not sort before smaller dimensions")
    // locality: sorted by z, each aligned 4x4 quadrant of the 8x8 grid
    // occupies one CONTIGUOUS run of 16 rows — the row-group pruning
    // property (a plain (x,y) sort scatters y across the whole table)
    val sorted = keyed.sortBy(_._3)
    val quadrantAt = sorted.map { case (x, y, _) => (x / 4, y / 4) }
    val runs = quadrantAt.grouped(16).toSeq
    assert(runs.forall(r => r.distinct.size == 1), "quadrant split across runs")
    assert(runs.map(_.head).distinct.size == 4, "expected 4 distinct quadrants")
  }

  test("Hilbert key: bijection onto [0, 4^order) with UNIT curve steps (tighter than Morton)") {
    import graft.operators.Layout
    val order = 3; val n = 1 << order
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val keyed = grid.select(col("x"), col("y"),
        Layout.hilbert2(col("x"), col("y"), order).as("h"))
      .as[(Long, Long, Long)].collect()
    val byD = keyed.map { case (x, y, h) => h -> (x, y) }.toMap
    assert(byD.keySet == (0L until (n.toLong * n)).toSet, "not a bijection")
    // THE Hilbert property Morton lacks: consecutive curve positions
    // are Manhattan-adjacent grid cells — no diagonal jumps anywhere
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("hilbert2Staged: value-equal to the hilbert2 fold, plan stays codegen projections") {
    import graft.operators.Layout
    // covers the full grid at order 3 AND scattered points at order 10
    // (the q32 gate's order) — the staged unroll must match the fold
    // bit for bit on every level path (reflect, swap, both, neither)
    val order = 3; val n = 1 << order
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val both = Layout.hilbert2Staged(grid, col("x"), col("y"), "hs", order)
      .select(col("x"), col("y"), col("hs"),
        Layout.hilbert2(col("x"), col("y"), order).as("hf"))
      .as[(Long, Long, Long, Long)].collect()
    both.foreach { case (x, y, hs, hf) =>
      assert(hs == hf, s"staged != fold at ($x,$y): $hs vs $hf") }
    val scattered = spark.range(5000L).select(
      (col("id") * 2654435761L % 1024).cast("long").as("x"),
      ((col("id") * 40503L + 7L) % 1024).cast("long").as("y"))
    val big = Layout.hilbert2Staged(scattered, col("x"), col("y"), "hs", 10)
      .select(col("hs"), Layout.hilbert2(col("x"), col("y"), 10).as("hf"))
      .as[(Long, Long)].collect()
    big.foreach { case (hs, hf) => assert(hs == hf, s"order-10: $hs vs $hf") }
    // the point of the staged form: no higher-order function anywhere
    // in the plan (the fold is interpreted per row; projections codegen)
    val plan = Layout.hilbert2Staged(scattered, col("x"), col("y"), "hs", 10)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("aggregate("), s"HOF survived in plan:\n$plan")
  }

  test("writeClustered: a 2-D range predicate reads ≤ 1/4 the row groups of the unclustered twin") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft-zcluster").toString
    // 100k points, x/y decorrelated pseudo-random over [0, 1024)
    val pts = spark.range(100000L).select(
      col("id"),
      (col("id") * 2654435761L % 1024).cast("long").as("x"),
      ((col("id") * 40503L + 7L) % 1024).cast("long").as("y"))
    // clustered by the Morton key vs the same data in id order — same
    // file count, same (small) row-group size so the fixture spans
    // many prunable groups on both sides
    Layout.writeClustered(pts, s"$dir/clustered",
      Layout.zorder2(col("x"), col("y")), files = 4, rowGroupBytes = 64 * 1024)
    pts.repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
      .write.option("parquet.block.size", (64 * 1024).toString)
      .parquet(s"$dir/rowid")
    // rows SURVIVING parquet row-group skipping = the scan node's
    // output rows (Spark re-filters them exactly afterwards)
    def scanned(path: String): (Long, Long) = {
      val q = spark.read.parquet(path).filter(col("x") < 64 && col("y") < 64)
      val n = q.count()
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }
      (n, scan.getOrElse(fail("no FileSourceScanExec in the plan")))
    }
    val (nC, scanC) = scanned(s"$dir/clustered")
    val (nU, scanU) = scanned(s"$dir/rowid")
    assert(nC == nU, "layouts must agree on the answer")
    assert(nC > 0, "fixture must select something")
    // unclustered: x/y are uncorrelated with id, so nearly every row
    // group spans the full x/y range and nothing is skipped; clustered:
    // the [0,64)² corner is a compact curve segment — the scan must
    // read at most a quarter of what the unclustered twin reads (in
    // practice far less; 4× keeps the assert robust to group-boundary
    // effects at this fixture size)
    assert(scanC * 4 <= scanU,
      s"z-clustered scan read $scanC rows vs unclustered $scanU — no pruning win")
  }

  test("histogram: dense bins, boundary assignment, out-of-range dropped") {
    val df = Seq(0.0, 4.99, 5.0, 14.99, -1.0, 20.0, 19.99, null.asInstanceOf[Any])
      .map(v => Tuple1(Option(v).map(_.asInstanceOf[Double])))
      .toDF("v")
    val out = graft.operators.Stats.histogram(df, "v", bins = 4, lo = 0.0, hi = 20.0)
      .orderBy("bin")
      .select("bin", "bin_lo", "bin_hi", "n")
      .as[(Int, Double, Double, Long)].collect().toSeq
    // [0,5): {0.0, 4.99}; [5,10): {5.0}; [10,15): {14.99}; [15,20): {19.99}
    // dropped: -1.0 (below), 20.0 (== hi, exclusive), null
    assert(out == Seq((0, 0.0, 5.0, 2L), (1, 5.0, 10.0, 1L),
      (2, 10.0, 15.0, 1L), (3, 15.0, 20.0, 1L)))
    // dense: an empty bin still appears with n = 0
    val sparse = graft.operators.Stats.histogram(
      Seq(Tuple1(1.0)).toDF("v"), "v", bins = 3, lo = 0.0, hi = 30.0)
      .orderBy("bin").select("bin", "n").as[(Int, Long)].collect().toSeq
    assert(sparse == Seq((0, 1L), (1, 0L), (2, 0L)))
  }

  test("frequent items finds the heavy hitter") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"cold$i")).toDF("v")
    val freq = Sketches.frequentItems(df, Seq("v"), support = 0.4)
      .as[Seq[String]].head()
    assert(freq.contains("hot"))
  }

  test("verifiedHeavyHitters: exact counts above threshold, sketch contains them, tail excluded") {
    // hot1 40%, hot2 35%, 25 cold keys 1% each; support 0.2
    val df = ((1 to 400).map(_ => "hot1") ++ (1 to 350).map(_ => "hot2") ++
      (1 to 250).map(i => s"cold${i % 25}")).toDF("k")
    val out = Sketches.verifiedHeavyHitters(df, "k", support = 0.2)
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("hot1", 400L, true), ("hot2", 350L, true)))
    // threshold is strict: a key at exactly support*N is excluded
    val border = ((1 to 20).map(_ => "edge") ++ (1 to 80).map(i => s"x$i")).toDF("k")
    val names = Sketches.verifiedHeavyHitters(border, "k", support = 0.2)
      .select("k").as[String].collect().toSeq
    assert(!names.contains("edge")) // 20 == 0.2*100, not >
  }
}
