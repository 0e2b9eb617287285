package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators (north star; SURVEY §7.2-M6).
  * Vectors are `ARRAY<FLOAT>` columns; all math is done in double via
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs.
  */
object Similarity {

  /** Dot product of two vector columns (double accumulation, index
    * order — bit-identical to the oracle's sequential sum). Uses the
    * codegen'd [[graft.expressions.DotProduct]] native expression;
    * registration is idempotent and works on any session. */
  def dot(a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_dot", a, b)
  }

  /** The higher-order-function formulation (same math; interpreted
    * lambda per element) — kept for comparison and as the fallback when
    * no function registry is writable. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query against every candidate.
    *
    * Scale: broadcast the (small) query set against the full corpus —
    * one scan, no shuffle of the corpus; per-partition partial top-k via
    * the window rank is handled by TakeOrdered when k is small. This is
    * the exact baseline an ANN index is validated against. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms precomputed per side: the pair loop then does ONE dot per
    // pair instead of three (values identical — same ops, same inputs)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
  }

  /** IVF-style bucketed ANN: the corpus is partitioned into cells (here
    * the pretrained assignment in `cellCol`; in production the cell id
    * comes from a k-means quantizer) and each query probes only its own
    * cell.
    *
    * Scale: THE point of IVF — at 100 TB the cell column is the
    * partition key of the parquet layout, so probing nprobe=1 cell is
    * partition pruning: the scan reads |corpus|/cells bytes. The join
    * below is an equi-join on the cell, never a cross join. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              cellCol: String = "label",
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(cellCol).as("cell"), norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(cellCol).as("cell"), norm(col(vecCol)).as("cn"))
    val scored = broadcast(q).join(c,
        q("cell") === c("cell") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
  }

  /** Deterministic Rademacher (±1) hyperplanes from a seed — the plane
    * set is tiny (bits × dim doubles) and ships in the plan as
    * literals; no driver↔executor state. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Random-hyperplane (SimHash-for-cosine) signature: bit b is the
    * sign of the dot product with plane b (Charikar, STOC'02). Vectors
    * with high cosine agree on most bits. */
  def rhpSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Cosine-LSH top-k: queries probe only the corpus bucket sharing
    * their full signature band(s). `bands` splits the signature so a
    * pair collides if ANY band agrees (same banding logic as MinHash).
    *
    * Scale: candidate generation is a band-bucket equi-join — the
    * corpus×query cross product never materializes; recall/cost is
    * tuned by (bits, bands). The brute-force operator above is the
    * recall oracle. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 16, bands: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bits % bands == 0)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(bits, dim, seed)
    val rowsPer = bits / bands
    def banded(df: DataFrame, id: String, v: String): DataFrame = {
      val sig = rhpSignature(col(v), planes)
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(sig, b * rowsPer).bitwiseAND((1L << rowsPer) - 1).as("bsig"))
      }
      df.select(col(id), col(v), explode(array(bandCols: _*)).as("bb"))
        .select(col(id), col(v), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
    }
    val q = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv")
    val c = banded(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")), "cand_id", "cv")
    val cand = broadcast(q).join(c,
        q("band") === c("band") && q("bsig") === c("bsig") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    cand.select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
  }

  /** DataFrame-native Lloyd's k-means trainer — makes IVF self-contained
    * (no pretrained cell column needed). Deterministic: init = the k
    * lowest-id vectors; each iteration is (a) a full-scan argmin
    * assignment (codegen'd dot products against centroid literals — no
    * shuffle) and (b) a per-(cell, dim) mean (one keyed agg with
    * map-side combine), collecting only k×dim doubles to the driver.
    *
    * Scale: the per-iteration cost is one scan of the TRAINING SET + one
    * shuffle of its (cell, pos, val) partial sums — the standard
    * distributed Lloyd's shape; centroids are plan literals, so no
    * driver↔executor state beyond the k×dim model itself.
    *
    * `trainBound` > 0 bounds the training set: a deterministic
    * [[Sampling.sampleByHash]] draw of ~trainBound vectors, materialized
    * ONCE — iterations then scan the bounded sample, not the corpus.
    * This is the industry-standard design (FAISS trains coarse/PQ
    * quantizers on ≤~1M vectors regardless of corpus size): at 100 TB,
    * unbounded training is iters corpus scans for a model that by
    * construction only needs a statistical sample. 0 (the default)
    * keeps the exact full-corpus behavior. */
  def trainKMeans(corpus: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  trainBound: Long = 0L): Seq[Array[Double]] = {
    val asDouble = boundTrainingSet(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")),
      "id", trainBound, minRows = k)
    var cents: Seq[Array[Double]] = asDouble.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray).toSeq
    for (_ <- 1 to iters) {
      val means = assignCells(asDouble, cents, vecCol = "v")
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byCell = means.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (old, c) =>
        byCell.get(c) match {
          case Some(dims) =>
            val arr = old.clone()
            dims.foreach { case (_, pos, m) => arr(pos) = m }
            arr
          case None => old // empty cell keeps its centroid (standard)
        }
      }
    }
    cents
  }

  /** Nearest-centroid cell id per row (the quantizer): argmin over k of
    * ‖x−c‖², computed as `−2·x·c + ‖c‖²` (the ‖x‖² term is constant per
    * row and cannot change the argmin; ties resolve to the lowest cell
    * id). The argmin is the native [[graft.expressions.PqArgmin]]
    * kernel: one bounded loop over a centroid reference object, so the
    * generated method size is independent of k — the per-centroid
    * expression-tree form hit janino's 64 KB method limit at k=64 and
    * silently dropped the stage to interpreted execution (see
    * [[pqEncode]]). One codegen'd projection: no join, no shuffle. */
  def assignCells(df: DataFrame, centroids: Seq[Array[Double]],
                  vecCol: String = "embedding"): DataFrame = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    df.withColumn("cell",
      call_function("graft_pq_argmin", col(vecCol),
        typedlit(centroids.map(_.toSeq))))
  }

  /** Deterministic bounded training draw: ~`bound` rows via
    * [[Sampling.sampleByHash]] (a pure function of the key — same
    * sample on any engine, partitioning, or cluster size), materialized
    * once with `localCheckpoint` so every training iteration scans the
    * bounded sample instead of re-filtering the corpus. The one
    * `count()` is a column-less scan (parquet footer counts); hash
    * buckets are approximate, so a draw that would undershoot
    * `minRows` (the k-means init needs k vectors) falls back to the
    * full set — the checkpoint is deferred until AFTER that check
    * passes (`Dataset.unpersist` on a localCheckpoint'd frame only
    * uncaches; the checkpointed RDD blocks would leak on executors
    * for the session's lifetime). `bound <= 0` = train on everything
    * (exact legacy behavior, no extra jobs). */
  private def boundTrainingSet(df: DataFrame, keyCol: String, bound: Long,
                               minRows: Int): DataFrame = {
    if (bound <= 0) return df
    require(bound >= minRows, s"trainBound=$bound < $minRows vectors the trainer needs")
    val n = df.count()
    if (n <= bound) return df
    val granularity = 10000
    val keep = math.min(granularity.toLong,
      math.max(1L, math.round(bound.toDouble * granularity / n))).toInt
    val s = Sampling.sampleByHash(df, keyCol, keep, granularity)
    if (s.limit(minRows).count() < minRows) df else s.localCheckpoint()
  }

  /** Scale-adaptive quantizer training — closes the fixed-cell-count
    * trap: a quantizer trained with k chosen at code-time (e.g. the old
    * `cells = 8` default) makes each cell ~corpus/k, so every
    * within-cell operator ([[cosineNearDup]]'s pair join, the ADC scan
    * of one probed IVF cell) grows quadratically/linearly with the
    * corpus instead of staying constant. Here k is DERIVED from the
    * corpus size (one column-less footer count) so cells target
    * `targetCellSize` members, and the trained quantizer is then
    * SPLIT-REFINED: any cell whose measured population still exceeds
    * 2×targetCellSize (k-means balances nothing — a skewed corpus can
    * park most of itself in one cell) gets a sub-quantizer trained on
    * its members only, and its centroid is REPLACED by the
    * sub-centroids. The flattened list is still a plain nearest-centroid
    * quantizer — [[assignCells]], persisted-index formats, and
    * batch-side assignment are unchanged; callers never see the
    * hierarchy.
    *
    * Scale: deriving k costs one footer count; each refine round costs
    * one assignment scan + one cell-count agg over a materialized
    * (id, vector) projection (Stage.reuse — the corpus parquet itself
    * is scanned once), plus per-oversized-cell sub-training on that
    * cell's members. Rounds are capped by `maxRounds`: a cell of
    * IDENTICAL vectors cannot be split by any quantizer, so the loop
    * must terminate rather than spin (such a cell is genuinely one
    * semantic point; downstream dedup collapses it to one survivor
    * anyway). */
  def adaptiveCentroids(corpus: DataFrame, targetCellSize: Long,
                        iters: Int = 3, trainBound: Long = 1L << 20,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        minCells: Int = 8, maxCells: Int = 1 << 16,
                        maxRounds: Int = 3): Seq[Array[Double]] = {
    require(targetCellSize > 0, s"targetCellSize=$targetCellSize must be positive")
    val n = corpus.count()
    val k0 = math.max(minCells.toLong,
      math.min(maxCells.toLong, (n + targetCellSize - 1) / targetCellSize)).toInt
    val base = Stage.reuse(corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")))
    var cents = trainKMeans(base, k0, iters, "id", "v", trainBound)
    val maxCell = 2 * targetCellSize
    var round = 0
    var bounded = false
    while (!bounded && round < maxRounds) {
      val celled = assignCells(base, cents, "v")
      val counts = celled.groupBy("cell").count()
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val oversized = counts.filter(_._2 > maxCell).sortBy(_._1)
      if (oversized.isEmpty) bounded = true
      else {
        val overIds = oversized.map(_._1).toSet
        val kept = cents.zipWithIndex.collect { case (c, i) if !overIds(i) => c }
        val subs = oversized.flatMap { case (c, cnt) =>
          val kc = math.max(2L,
            math.min(maxCells.toLong, (cnt + targetCellSize - 1) / targetCellSize)).toInt
          trainKMeans(celled.filter(col("cell") === c), kc, iters, "id", "v", trainBound)
        }
        cents = kept ++ subs
        round += 1
      }
    }
    cents
  }

  /** The `nprobe` nearest cells per row (for query-side probing):
    * explodes to one row per (row, probed cell). */
  def assignCellsN(df: DataFrame, centroids: Seq[Array[Double]], nprobe: Int,
                   vecCol: String = "embedding"): DataFrame = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (dot(col(vecCol), typedlit(c.toSeq)) * -2.0 + lit(c.map(x => x * x).sum)).as("d"),
        lit(i).as("cell"))
    }: _*)
    df.withColumn("__probe", explode(slice(array_sort(scored), 1, nprobe)))
      .withColumn("cell", col("__probe.cell"))
      .drop("__probe")
  }

  /** Self-contained trained-IVF top-k: train the quantizer, assign the
    * corpus once, probe the query's `nprobe` nearest cells, rank
    * candidates by exact cosine. Candidate set = corpus/cells × nprobe
    * per query instead of the full corpus — the IVF trade. At 100 TB
    * the assigned corpus is written once, partitioned by `cell`, and
    * probing is partition pruning (see [[ivfTopK]]). */
  def ivfTrainedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     cells: Int, iters: Int = 3, nprobe: Int = 1,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     trainBound: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = trainKMeans(corpus, cells, iters, idCol, vecCol, trainBound)
    val c = assignCells(
        corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")), cents, "cv")
      .withColumn("cn", norm(col("cv")))
    val q = assignCellsN(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), cents, nprobe, "qv")
      .withColumn("qn", norm(col("qv")))
    val scored = broadcast(q).join(c,
        q("cell") === c("cell") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
      .distinct() // nprobe > 1 can surface a candidate via two probes
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cos"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Seeded ±1 random-projection dimensionality reduction (the
    * Achlioptas / Johnson-Lindenstrauss sign matrix): out[i] =
    * Σ_j sign(i,j)·v[j] with sign(i,j) = +1 iff the first md5 byte of
    * "seed|i|j" < 0x80. The m×d matrix is generated ONCE on the driver
    * from the seed and ships as plan LITERALS (same pattern as the LSH
    * hyperplanes); each output dim is one codegen'd [[dot]] against a
    * literal row — no shuffle, no UDF, and the projection is
    * reproducible on any engine that has md5 (the oracle regenerates
    * the identical signs in SQL).
    *
    * Scale: a map-side projection — 100 TB of 1024-dim vectors become
    * 100·(m/1024) TB in one scan; downstream ANN (IVF cells, LSH
    * bands, brute-force verify) then works on m-dim vectors. Long-form
    * output (id, dim, val) so the schema is m-independent. */
  def randomProject(vecs: DataFrame, inDim: Int, outDim: Int, seed: String = "rp",
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rows: Seq[Seq[Float]] = (0 until outDim).map { i =>
      (0 until inDim).map { j =>
        if (Integer.parseInt(md5hex(s"$seed|$i|$j").take(2), 16) < 128) 1f else -1f
      }
    }
    val projected = array(rows.map(r => dot(col(vecCol), typedLit(r))): _*)
    // + 0: normalizes IEEE -0.0 to +0.0 (a signed zero is engine-
    // dependent in float sums and breaks byte-level result compares)
    vecs.select(col(idCol).as("id"), posexplode(projected).as(Seq("dim", "val")))
      .select(col("id"), col("dim").cast("int").as("dim"),
        (round(col("val"), 4) + lit(0d)).as("val"))
  }

  /** Per-label embedding centroids with FIXED-POINT accumulation:
    * c[dim] = (Σ round(v[dim]·scale)) / (n·scale), the per-element
    * quantization in long arithmetic. Exact integer sums are
    * order-independent, so the centroid is bit-reproducible across
    * partitionings, retries, and engines — a plain `avg` over doubles
    * is not (partial-aggregation order varies run to run), which is
    * why every float-mean gate before this one had to settle for a
    * bound instead of a hash. scale=1e6 keeps 64-dim unit-ish vectors
    * exact to ~1e-6 per element while a 2^63 budget allows ~9e12
    * summed elements per (label, dim) — far beyond any real shard.
    *
    * Output: one row per label with the centroid as `cvec`
    * (array<double>, dim order).
    *
    * Scale: the explode streams N·dim rows into a (labels×dims)-keyed
    * agg — partial aggregation collapses each partition to
    * labels×dims rows before the (tiny) shuffle; the array rebuild
    * sorts labels×dims rows. One corpus scan, no corpus-sized
    * shuffle. */
  def labelCentroids(corpus: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding",
                     scale: Long = 1000000L): DataFrame =
    corpus.select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(round(col("v") * scale, 0).cast("long")).cast("double") /
            (count(lit(1)) * scale)).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x("c")).as("cvec"))

  /** Cosine of every vector to ITS OWN label's centroid, plus the
    * outlier flag (cos < threshold): the embedding-space audit pass —
    * mislabeled, off-distribution, or contaminated items sit far from
    * their cluster center (the distance-to-centroid prune step of
    * SemDeDup-style curation, Abbas et al. 2023).
    *
    * Scale: [[labelCentroids]] is a labels-sized result, broadcast
    * back onto the corpus — the scoring pass is ONE map-side scan
    * (codegen'd [[dot]] per row), no shuffle of the corpus. */
  def centroidOutliers(corpus: DataFrame, threshold: Double,
                       labelCol: String = "label", idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val cents = labelCentroids(corpus, labelCol, vecCol)
    corpus.select(col(idCol).as("id"), col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("dv"))
      .join(broadcast(cents), "label")
      // + 0: normalizes IEEE -0.0 to +0.0 (same fix as randomProject —
      // a cosine that rounds to zero from below must not hash as "-0")
      .select(col("id"), col("label"),
        (round(cosine(col("dv"), col("cvec")), 6) + lit(0d)).as("cos"))
      .withColumn("outlier", (col("cos") < threshold).cast("int"))
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold, blocked by cell
    * to avoid the corpus×corpus cross join (same IVF partition-pruning
    * argument; near-dups land in the same or adjacent cells by
    * construction of any reasonable quantizer). */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
                    cellCol: String = "label",
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c1 = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col(cellCol).as("cell"), norm(col(vecCol)).as("na"))
    val c2 = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col(cellCol).as("cell"), norm(col(vecCol)).as("nb"))
    c1.join(c2, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011): split
    * each vector into `m` subvectors and train a `ksub`-centroid
    * codebook per subspace with the seeded [[trainKMeans]]. The 100 TB
    * memory story: a 64-dim float vector is 256 B; PQ at m=8 stores
    * ONE BYTE per subspace (ksub ≤ 256) = 8 B/vector (32×), and search
    * scans codes with codebook lookups instead of float arrays — the
    * standard design for embedding stores that exceed aggregate RAM.
    *
    * FUSED trainer: all m subspace k-means run in lock-step — per
    * iteration ONE job assigns every subspace's codeword (m native
    * [[graft.expressions.PqArgmin]] kernels in a single projection) and
    * aggregates every (subspace, codeword, dim) mean in one keyed agg,
    * collecting m × ksub × dim/m doubles. The per-subspace-sequential
    * form was m×iters jobs (16 at m=8, iters=2) whose scheduling
    * overhead dominated training wall-clock at every tested scale —
    * and at 100 TB it was m×iters corpus scans.
    *
    * `trainBound` > 0 draws ONE deterministic ~trainBound-vector sample
    * ([[boundTrainingSet]]) shared by all m subspace trainers (FAISS
    * bounds PQ training the same way, at ~1M vectors); the sample is
    * materialized once and each iteration scans only it.
    *
    * Per-subspace init = the ksub lowest-id vectors' slices — identical
    * to what sequential per-subspace [[trainKMeans]] runs would use;
    * empty codewords keep their previous centroid (same rule). */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding",
              trainBound: Long = 0L)
      : Seq[Seq[Array[Double]]] = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val train = boundTrainingSet(
      corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")),
      "id", trainBound, minRows = ksub)
    val staged = train.select(col("id"), array((0 until m).map(j =>
      slice(col("v"), j * sub + 1, sub)): _*).as("__subs"))
    val initRows = staged.orderBy("id").limit(ksub).select("__subs").collect()
    var books: Seq[Seq[Array[Double]]] = (0 until m).map { j =>
      initRows.map(_.getSeq[Seq[Double]](0)(j).toArray).toSeq
    }
    for (_ <- 1 to iters) {
      val cellCols = (0 until m).map { j =>
        call_function("graft_pq_argmin", element_at(col("__subs"), j + 1),
          typedlit(books(j).map(_.toSeq)))
      }
      val means = staged
        .select(col("__subs"), posexplode(array(cellCols: _*)).as(Seq("j", "cell")))
        .select(col("j"), col("cell"),
          posexplode(element_at(col("__subs"), col("j") + 1)).as(Seq("pos", "x")))
        .groupBy("j", "cell", "pos").agg(avg("x").as("m"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (old, c) =>
          means.get((j, c)) match {
            case Some(dims) =>
              val arr = old.clone()
              dims.foreach { case (_, (pos, mv)) => arr(pos) = mv }
              arr
            case None => old
          }
        }
      }
    }
    books
  }

  /** PQ-encode: per-subspace argmin against the codebook — one
    * codegen'd projection, no join, no shuffle; adds `code`, an
    * array<int> of length m. The argmin is the NATIVE
    * [[graft.expressions.PqArgmin]] kernel (`graft_pq_argmin`): a
    * bounded loop over a flattened codebook reference object. The
    * per-codeword expression-tree form (ksub dots + an O(ksub) fold)
    * blew janino's 64 KB generated-method limit at ksub=64 and
    * silently dropped the whole stage to interpreted execution —
    * method size must be independent of ksub. Subvectors are STAGED
    * as an attribute column first so each kernel reads its slice once
    * (the [[graft.functions.Text.shinglesOf]] re-evaluation gotcha). */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Array[Double]]],
               vecCol: String = "embedding"): DataFrame = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val staged = df.withColumn("__subs", array((0 until m).map(j =>
      slice(col(vecCol).cast("array<double>"), j * sub + 1, sub)): _*))
    val codeCols = (0 until m).map { j =>
      call_function("graft_pq_argmin", element_at(col("__subs"), j + 1),
        typedlit(codebooks(j).map(_.toSeq)))
    }
    staged.withColumn("code", array(codeCols: _*)).drop("__subs")
  }

  /** The ADC distance column: exact query vector vs m-byte code via the
    * native [[graft.expressions.PqAdc]] kernel (same 64 KB rationale as
    * [[pqEncode]]). */
  private def adcDist(qv: Column, code: Column,
                      codebooks: Seq[Seq[Array[Double]]]): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_pq_adc", qv, code,
      typedlit(codebooks.map(_.map(_.toSeq))))
  }

  /** PQ top-k by asymmetric distance (ADC): the encoded corpus is
    * ranked by ‖q‖² + Σ_j (−2·q_j·c_{code_j} + ‖c_{code_j}‖²) — the
    * query stays exact, candidates are their code words. The scan IS
    * the design: brute force over m-byte codes + codebook lookups in
    * place of the float corpus (queries broadcast; at 10⁹ vectors the
    * scanned bytes drop 32×, and the codes column is the only thing
    * read). Compose with IVF cells for sublinear candidate counts
    * (scan only the probed cells' codes). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             codebooks: Seq[Seq[Array[Double]]], shortlist: Int = 0,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = pqEncode(
      corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")), codebooks, "cv")
      .select(col("cand_id"), col("code"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val dist = adcDist(col("qv"), col("code"), codebooks)
    val wa = Window.partitionBy("query_id").orderBy(col("adist").asc, col("cand_id"))
    val adc = broadcast(q).join(enc, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), round(dist, 6).as("adist"))
      .withColumn("rnk", row_number().over(wa).cast("long"))
    if (shortlist <= 0)
      adc.filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
    else {
      // refine step (the FAISS IVFPQ+refine shape): the ADC shortlist —
      // queries × shortlist rows, tiny — joins back to the FLOAT
      // vectors for an exact re-rank; the corpus-scale scan stayed in
      // the compressed domain
      // broadcast the shortlist: queries × shortlist rows is driver-tiny
      // by construction, but post-window its stats are unknown to the
      // planner — without the hint Spark sort-merge-joins, shuffling the
      // entire float corpus and undoing the compressed-domain win
      val short = adc.filter(col("rnk") <= math.max(shortlist, k))
        .select(col("query_id"), col("cand_id"))
      val exact = broadcast(short)
        .join(corpus.select(col(idCol).as("cand_id"),
          col(vecCol).cast("array<double>").as("cv")), "cand_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("cand_id"),
          round(dot(col("qv"), col("qv")) - dot(col("qv"), col("cv")) * 2.0 +
            dot(col("cv"), col("cv")), 6).as("adist"))
      val we = Window.partitionBy("query_id").orderBy(col("adist").asc, col("cand_id"))
      exact.withColumn("rnk", row_number().over(we).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
    }
  }

  /** Composed IVF×PQ top-k (the FAISS `IVFPQ(+refine)` shape, Jégou et
    * al. 2011 §V): the corpus is coarse-quantized into IVF cells AND
    * PQ-encoded; each query probes its `nprobe` nearest cells and runs
    * asymmetric-distance (ADC) scoring ONLY against the codes in those
    * cells; the ADC shortlist is exactly re-ranked against the float
    * vectors. This composes the two sublinear levers: IVF prunes the
    * candidate COUNT to ~nprobe/cells of the corpus, PQ shrinks the
    * candidate BYTES 32× — together the per-query work is
    * (nprobe/cells) × corpus × 8 B instead of corpus × 256 B.
    *
    * Codes are raw-vector PQ, not residual PQ (FAISS
    * `by_residual=false`): codebooks stay cell-independent plan
    * literals and ADC distances stay comparable across probed cells
    * without per-cell lookup tables; the recall cost is measured by the
    * gate, and the exact refine pass re-ranks it away for the top-k.
    *
    * Scale: the ADC scoring join is an EQUI-join on the cell id — never
    * the all-codes nested-loop of [[pqTopK]] — so at 100 TB, with the
    * encoded corpus written partitioned by `cell`, probing is partition
    * pruning: the scan reads nprobe/cells of the 8 B/vector codes and
    * nothing else. The refine join broadcasts the driver-tiny
    * (queries × shortlist) list against one float-corpus scan. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int,
                centroids: Seq[Array[Double]], codebooks: Seq[Seq[Array[Double]]],
                shortlist: Int = 0,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus index: one pass assigns the coarse cell + the m code words
    val enc = pqEncode(
      assignCells(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")),
        centroids, "cv"),
      codebooks, "cv")
      .select(col("cand_id"), col("cell"), col("code"))
    // queries: one row per (query, probed cell)
    val q = assignCellsN(
      queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv")),
      centroids, nprobe, "qv")
    val dist = adcDist(col("qv"), col("code"), codebooks)
    val wa = Window.partitionBy("query_id").orderBy(col("adist").asc, col("cand_id"))
    // every candidate lives in exactly one cell and probed cells are
    // distinct, so (query, cand) pairs are already unique — no distinct
    val adc = broadcast(q).join(enc,
        q("cell") === enc("cell") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), round(dist, 6).as("adist"))
      .withColumn("rnk", row_number().over(wa).cast("long"))
    if (shortlist <= 0)
      adc.filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
    else {
      val short = adc.filter(col("rnk") <= math.max(shortlist, k))
        .select(col("query_id"), col("cand_id"))
      val qexact = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      val exact = broadcast(short)
        .join(corpus.select(col(idCol).as("cand_id"),
          col(vecCol).cast("array<double>").as("cv")), "cand_id")
        .join(broadcast(qexact), "query_id")
        .select(col("query_id"), col("cand_id"),
          round(dot(col("qv"), col("qv")) - dot(col("qv"), col("cv")) * 2.0 +
            dot(col("cv"), col("cv")), 6).as("adist"))
      val we = Window.partitionBy("query_id").orderBy(col("adist").asc, col("cand_id"))
      exact.withColumn("rnk", row_number().over(we).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
    }
  }

  /** Self-contained IVF×PQ: trains the coarse quantizer and the PQ
    * codebooks (both on the same deterministic `trainBound`-bounded
    * sample — see [[boundTrainingSet]]), then searches via
    * [[ivfPqTopK]]. The trained artifacts are ordinary driver values;
    * production pipelines train once, persist them, and call
    * [[ivfPqTopK]] per query batch against the prebuilt encoded
    * corpus. */
  def ivfPqTrainedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       cells: Int, nprobe: Int, m: Int, ksub: Int,
                       coarseIters: Int = 3, pqIters: Int = 2,
                       shortlist: Int = 0, trainBound: Long = 0L,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = trainKMeans(corpus, cells, coarseIters, idCol, vecCol, trainBound)
    val cbs = pqTrain(corpus, m, ksub, pqIters, idCol, vecCol, trainBound)
    ivfPqTopK(queries, corpus, k, nprobe, cents, cbs, shortlist, idCol, vecCol)
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): docs whose
    * EMBEDDINGS are near-identical are semantic re-phrasings that
    * n-gram dedup misses — map every doc to the canonical (minimum-id)
    * survivor of its semantic cluster. Pairs come from
    * [[cosineNearDup]] (cell-blocked, never corpus×corpus); clusters
    * from [[Dedup.components]] (transitive closure — a pairwise "drop
    * the larger id" would keep spurious survivors on chains); docs in
    * no pair are their own canonical. Keep `keep == true` rows for the
    * deduplicated corpus.
    *
    * Scale: the pair graph is tiny next to the corpus (only
    * above-threshold pairs enter); the label map joins back on the id —
    * one hash join. `strict` as in [[Dedup.components]]: non-converged
    * labels throw rather than silently keeping extra docs.
    *
    * `maxCellSize` > 0 guards the quadratic trap: [[cosineNearDup]] is
    * all-pairs WITHIN a cell, so a cell holding a corpus-scale fraction
    * (a fixed cell count on a grown corpus, or a skewed quantizer)
    * makes the pair join quadratic. The guard costs one cell-count agg
    * and throws loudly — pointing at [[adaptiveCentroids]] — instead of
    * silently launching an ~(corpus/cells)² join. Opt-in because the
    * extra action is wasted on callers that just trained an adaptive
    * quantizer (its refine loop already measured the cells). */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    cellCol: String = "label", idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxIter: Int = 10, strict: Boolean = true,
                    maxCellSize: Long = 0L): DataFrame = {
    if (maxCellSize > 0) {
      val big = corpus.groupBy(col(cellCol)).count()
        .filter(col("count") > maxCellSize).limit(1).collect()
      if (big.nonEmpty) throw new IllegalStateException(
        s"semanticDedup: cell ${big.head.get(0)} holds ${big.head.getLong(1)} vectors " +
          s"(> maxCellSize=$maxCellSize) — the within-cell pair join would be quadratic; " +
          "re-quantize with Similarity.adaptiveCentroids (or raise the cell count)")
    }
    val pairs = cosineNearDup(corpus, threshold, cellCol, idCol, vecCol)
    val comp = Dedup.components(pairs, maxIter, strict)
      .withColumnRenamed("id", "__cid")
    corpus.select(col(idCol).as("id"))
      .join(comp, col("id") === col("__cid"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("canonical_id"),
        (coalesce(col("comp"), col("id")) === col("id")).as("keep"))
  }

  /** Sign-bit binary signature of a float vector: bit `i` of the
    * signature is set iff `vec[i] > 0`. Packed as an ARRAY<BIGINT> of
    * 32-bit words (word `w` holds dims `w*32 .. w*32+31`, bit `i mod
    * 32` within the word) — 32 bits per word keeps every value in the
    * positive BIGINT range on every engine (a full 64-bit pack needs
    * `1 << 63`, which portable SQL rejects as overflow) and the layout
    * generalizes past 64 dims.
    *
    * This is the classic binary embedding quantization: the sign of
    * each coordinate survives dot-product geometry well enough that
    * Hamming distance on signatures approximates angular distance
    * (Charikar's hyperplane LSH with axis-aligned planes), at 1 bit
    * per dim = 32x smaller than float32.
    *
    * r19: the codegen'd [[graft.expressions.SignBits]] kernel instead
    * of one interpreted `aggregate(zip_with(slice(...), sequence(...)))`
    * fold PER WORD PER ROW — this runs once per corpus/query row in
    * the s_hamming family, mm_neardup / mm_frames_neardup and both
    * curation media lanes (guide §4; value contract pinned in the
    * expression's scaladoc and OperatorSpec). */
  def signBits(vec: Column, dim: Int): Column = {
    require(dim > 0, "signBits: dim must be positive")
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_sign_bits", vec, lit(dim))
  }

  /** Hamming distance between two [[signBits]] signatures (popcount of
    * the XOR, summed over words). r19: the codegen'd
    * [[graft.expressions.HammingDistance]] kernel instead of the
    * interpreted `aggregate(zip_with(...))` fold — this expression sits
    * in banded-join verify CONDITIONS and the s_hamming coarse scan, so
    * it evaluates per candidate pair (guide §4; value contract pinned
    * in the expression's scaladoc and OperatorSpec). */
  def hammingDist(a: Column, b: Column): Column = {
    graft.expressions.GraftFunctions.registerKnownSessions()
    call_function("graft_hamming", a, b)
  }

  /** Binary-quantized ANN: coarse top-`shortlist` by Hamming distance
    * on sign-bit signatures, then exact-cosine refine of the shortlist
    * — the standard two-stage design for embedding stores kept in
    * compressed form (e.g. binary FAISS / vector-DB binary indexes
    * with float rerank).
    *
    * Scale: the coarse pass scans (id, ceil(dim/32) longs) per corpus
    * row — 32x less I/O than the float vectors — with the query
    * signatures broadcast, so the corpus never shuffles; the popcount
    * loop is a handful of native integer expressions per row. Only the
    * |queries|·shortlist surviving rows join back to fetch their float
    * vectors for the exact rerank (hash join on the candidate id).
    * Both stages break ties deterministically (coarse: hamming asc,
    * cand_id; final: cosine desc, cand_id), so the whole result is
    * exactly reproducible — gate `s_hamming` pins it against a full
    * DuckDB re-derivation, not just a recall bound.
    *
    * ID CONVENTION (same as [[bruteForceTopK]]): the coarse join
    * excludes `cand_id === query_id` unconditionally, on the
    * assumption that queries ARE corpus rows (self-match is never a
    * useful neighbor). If the query table is disjoint from the corpus,
    * its ids must not collide with corpus ids — a colliding id would
    * silently drop one valid candidate per query.
    *
    * QUERY-SET BOUND: the coarse pass broadcasts the query signatures
    * and scans the corpus once per query — right up to ~10⁵ queries
    * (at dim 128 that is ~4 MB of signatures, and |Q|·|C| popcounts
    * stay executor-bound). For query-heavy workloads (|Q| approaching
    * |C|, e.g. full-corpus self-join semantics) switch to a banded
    * signature join instead: split each signature's words into bands,
    * equi-join corpus and queries on (band_idx, band_word) to generate
    * candidates — the [[Dedup.simhashPairs]] shape generalized to
    * multi-word signatures — then Hamming-filter and refine. That form
    * shuffles on band buckets instead of broadcasting, at the price of
    * missing pairs whose signatures differ in every band (recall knob:
    * band count). */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                  shortlist: Int = 30,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = queries.select(col(idCol).as("query_id"),
      signBits(col(vecCol), dim).as("qsig"))
    val cs = corpus.select(col(idCol).as("cand_id"),
      signBits(col(vecCol), dim).as("csig"))
    val coarse = broadcast(qs).join(cs, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        hammingDist(col("qsig"), col("csig")).as("ham"))
    val wc = Window.partitionBy("query_id").orderBy(col("ham"), col("cand_id"))
    val short = coarse.withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= shortlist)
      .select("query_id", "cand_id", "ham")
    val cv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val refined = short.join(cv, "cand_id").join(broadcast(qv), "query_id")
      .select(col("query_id"), col("cand_id"), col("ham"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    refined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("ham"), col("cos"))
  }

  /** Hamming near-dup PAIRS over sign-bit signatures, banded — the
    * query-heavy / full-corpus-self-join companion to [[hammingTopK]]
    * (whose broadcast-query coarse scan caps out around ~10⁵ queries;
    * see its Scaladoc). The [[Dedup.simhashPairs]] shape (Manku,
    * Jakkula & Sarma, WWW'07 §3) generalized from one 32-bit simhash
    * word to multi-word embedding signatures.
    *
    * Each signature's `dim` bits are split into `bands` contiguous
    * chunks; rows equi-join on (band index, band value) to generate
    * candidates, then the full Hamming distance filters to
    * `maxHamming`. EXACTNESS: a pair within Hamming distance d < bands
    * must agree on ≥ 1 band (pigeonhole), so with `maxHamming < bands`
    * the result is EXACT — no missed pairs. With `maxHamming >=
    * bands` the operator is recall-approximate (a pair differing in
    * every band is missed) but still fully DETERMINISTIC: the
    * candidate set is a pure function of the signatures, which is what
    * gate `s_hamming_banded` pins bit-for-bit (bands is the recall
    * knob; more/narrower bands = higher recall and fatter buckets).
    *
    * Scale: no broadcast anywhere — the banded table shuffles on
    * (band, value) and self-joins per bucket, so the cost is
    * Σ bucket² per band, not |C|². SIZE BANDS TO THE CORPUS: a band
    * must carry enough bits that 2^bits ≫ |C| / acceptable-bucket-size
    * (8-bit bands stop discriminating past ~10⁴ rows — every bucket
    * goes hot and the join degenerates toward all-pairs; 16-bit bands
    * hold to ~10⁷, and beyond that pair up bands into 32-bit compound
    * keys). Fewer, wider bands trade recall (above the pigeonhole
    * bound) for selectivity. Residual SKEW is the real-world risk
    * (e.g. the all-zeros band of near-sparse vectors) — `maxBucket`
    * drops buckets above a frequency cap, the standard df-cap trade
    * (documented recall loss on hot buckets) also used by
    * [[Dedup.winnowPairs]]. The hot set is collected to the driver
    * (it is tiny by construction — hot buckets ARE the skew) and
    * applied as a literal filter, so the cap costs one count pass and
    * zero extra exchanges; passing `maxBucket` therefore triggers that
    * one eager Spark job at plan-build time. The collect is GUARDED
    * (limit `maxHotLiteral`+1, default 4096): a mis-sized cap on a
    * degenerate corpus falls back to the broadcast-anti-join +
    * distinct form — identical results (spec-pinned equality),
    * graceful degradation instead of an unbounded driver collect or a
    * plan linear in |hotSet|×bands.
    *
    * Output is exactly-once per pair BY CONSTRUCTION (first-surviving-
    * matching-band emission — see the in-code note), not by a
    * `distinct()` over the pair stream: at 100 TB with near-dup-heavy
    * corpora the candidate-pair stream is the largest intermediate in
    * the job, and shuffling it once more just to dedup band collisions
    * was the old form's scale ceiling (r11 verdict item #1).
    *
    * Constraints: `bands` divides `dim`; band width `dim/bands` must
    * divide the 32-bit word (no band straddles a signature word).
    * IDs must be UNIQUE (the standard id contract across this file):
    * with duplicate id rows the first-band rule dedups per ROW pair,
    * so a duplicated id emits its pair rows multiply — dedup ids
    * upstream, which a near-dup pipeline does anyway. */
  /** Banded rows of a packed sign-bit signature frame: one row per
    * (input row, band), the band value sliced from the 32-bit words
    * `signBits` packs. Every non-`sig` input column rides along.
    * Shared by [[hammingBandedPairs]] and the streaming curation media
    * lanes ([[CurationStream]]) — their batch==stream hash equality
    * REQUIRES the identical band packing, so there is exactly one copy
    * of this arithmetic. */
  private[operators] def bandedRows(sigs: DataFrame, dim: Int, bands: Int): DataFrame = {
    require(bands > 0 && dim % bands == 0,
      s"bandedRows: bands ($bands) must divide dim ($dim)")
    val bandBits = dim / bands
    require(bandBits <= 32 && 32 % bandBits == 0,
      s"bandedRows: band width $bandBits must divide the 32-bit word")
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until bands).map { k =>
      val w = (k * bandBits) / 32           // signBits packs 32 bits/word
      val sh = (k * bandBits) % 32
      struct(lit(k).as("band"),
        shiftrightunsigned(element_at(col("sig"), w + 1), sh)
          .bitwiseAND(lit(mask)).as("bv"))
    }
    val others = sigs.columns.filter(_ != "sig").map(col).toSeq
    sigs.select(others ++ Seq(col("sig"), explode(array(bandCols: _*)).as("b")): _*)
      .select(others ++ Seq(col("sig"),
        col("b.band").as("band"), col("b.bv").as("bv")): _*)
  }

  def hammingBandedPairs(corpus: DataFrame, dim: Int, maxHamming: Int,
                         bands: Int, maxBucket: Option[Long] = None,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         maxHotLiteral: Int = 4096): DataFrame = {
    require(bands > 0 && dim % bands == 0,
      s"hammingBandedPairs: bands ($bands) must divide dim ($dim)")
    val bandBits = dim / bands
    require(bandBits <= 32 && 32 % bandBits == 0,
      s"hammingBandedPairs: band width $bandBits must divide the 32-bit word")
    require(maxHamming >= 0, "hammingBandedPairs: maxHamming must be >= 0")
    val sigs = corpus.select(col(idCol).as("id"), signBits(col(vecCol), dim).as("sig"))
    val banded = bandedRows(sigs, dim, bands)
    val mask = (1L << bandBits) - 1         // the first-band rule below re-slices bands
    // hot buckets are FEW by construction (they're the skew): the set
    // fits on the driver like the k×dim codebook collects do, which is
    // what lets both the cap filter and the first-band rule below stay
    // literal predicates — no broadcast exchange at all. Encoded as
    // band<<32 | value (band values are < 2^32 by the bandBits bound).
    // guard the driver collect: a mis-sized cap on a skewed corpus can
    // make the "tiny by construction" hot set arbitrarily large — a
    // limit(N+1) bounds both the collect and the per-row literal
    // predicate cost (the isin is evaluated per band per row). Past the
    // threshold the operator FALLS BACK to the broadcast-anti-join +
    // distinct form below instead of failing or building a plan that
    // grows linearly in |hotSet|×bands.
    // ONE RDD lineage serves both the guard collect and the fallback's
    // anti-join build side: sharing the RDD object lets the second
    // action reuse the first action's shuffle files (skipped map
    // stage) instead of re-running the groupBy's full scan of the
    // banded stream — the operator's most expensive aggregation,
    // otherwise doubled at exactly the degenerate scale the fallback
    // serves. Deliberately NOT a DataFrame persist: CacheManager
    // entries are never GC-cleaned, so a cache captured by the
    // returned lazy plan would leak storage for the application's
    // lifetime; shuffle files ARE ContextCleaner-managed.
    val hotAgg: Option[DataFrame] = maxBucket.map { cap =>
      banded.groupBy("band", "bv").agg(count(lit(1)).as("__c"))
        .filter(col("__c") > cap).select("band", "bv")
    }
    val hotRdd = hotAgg.map(_.rdd)
    val hotCollected: Option[Array[org.apache.spark.sql.Row]] =
      hotRdd.map(_.take(maxHotLiteral + 1))
    if (hotCollected.exists(_.length > maxHotLiteral)) {
      // degenerate-skew fallback: too many hot buckets for a literal
      // predicate. Cap via broadcast anti-join (one small-side
      // exchange), then dedup the pair stream with a distinct — the
      // pre-r12 shape: it degrades gracefully instead of inlining an
      // unbounded literal list into the plan. Results are identical to
      // the literal path (same surviving buckets, same pair set).
      val spark = sigs.sparkSession
      val hotDF = spark.createDataFrame(hotRdd.get, hotAgg.get.schema)
      val capped = banded.join(broadcast(hotDF),
        Seq("band", "bv"), "left_anti")
      return capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          hammingDist(col("a.sig"), col("b.sig")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxHamming)
    }
    val hotSet: Seq[java.lang.Long] = hotCollected match {
      case Some(rows) =>
        rows.map(r => Long.box((r.getInt(0).toLong << 32) | r.getLong(1)))
          .toSeq.sorted
      case None => Seq.empty
    }
    def notHot(j: Int, bv: Column): Column =
      if (hotSet.isEmpty) lit(true)
      else !lit(j.toLong << 32).bitwiseOR(bv).isin(hotSet: _*)
    val capped =
      if (hotSet.isEmpty) banded
      else banded.filter(
        !shiftleft(col("band").cast("long"), 32).bitwiseOR(col("bv"))
          .isin(hotSet: _*))
    // a pair agreeing in k bands would be emitted k times by the bucket
    // join; instead of deduping the full pair stream with a shuffle
    // (`.distinct()` — at near-dup-heavy corpora the pair stream is the
    // job's largest intermediate), each pair is emitted ONLY from its
    // FIRST surviving matching band: recompute every band value on both
    // sides post-join (static shifts — `bands` is a plan-time constant)
    // and keep the row iff this band is the least j where the values
    // agree and bucket (j, value) was not dropped by the cap. Output is
    // exactly-once BY CONSTRUCTION — no aggregate, no dedup exchange —
    // and identical to the distinct-based form (gate-hash-pinned).
    def bandValOf(sig: Column, j: Int): Column = {
      val w = (j * bandBits) / 32
      val sh = (j * bandBits) % 32
      shiftrightunsigned(element_at(sig, w + 1), sh).bitwiseAND(lit(mask))
    }
    val firstMatchingBand = least((0 until bands).map { j =>
      val av = bandValOf(col("a.sig"), j)
      when(av === bandValOf(col("b.sig"), j) && notHot(j, av), lit(j))
        .otherwise(lit(bands))
    }: _*)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .filter(col("a.band") === firstMatchingBand)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDist(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
