package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (and the beyond-reference LLM-pipeline operators) to a Spark plan over
  * the driver's parquet tables; `oracleSql` holds the DuckDB-equivalent
  * SQL for the correctness gate. Column names are aliased identically on
  * both sides (the driver hash-compares after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join_broadcast" -> (Relational.q3JoinBroadcast _),
    "q4_join_chain"     -> (Relational.q4JoinChain _),
    "q5_topk"           -> (Relational.q5TopK _),
    "q6_window_rank"    -> (Relational.q6WindowRank _),
    "q7_setops"         -> (Relational.q7SetOps _),
    "q8_distinct_agg"   -> (Relational.q8DistinctAgg _),
    "q9_rollup"         -> (Relational.q9Rollup _),
    "q10_semi_anti"     -> (Relational.q10SemiAnti _),
    "q11_tumbling_window" -> (Relational.q11TumblingWindow _),
    "q12_fold_count"    -> (Relational.q12FoldCount _),
    "q13_limit"         -> (Relational.q13Limit _),
    "q14_merge_ordered" -> (Relational.q14MergeOrdered _),
    "q15_roundrobin"    -> (Relational.q15RoundRobin _),
    "q16_avg_subquery"  -> (Relational.q16AvgSubquery _),
    "q17_sessionize"    -> (LlmOps.q17Sessionize _),
    "t_tokens"          -> (LlmOps.tTokens _),
    "t_quality"         -> (LlmOps.tQuality _),
    "t_quality_lr"      -> (LlmOps.tQualityLr _),
    "t_ppl_buckets"     -> (LlmOps.tPplBuckets _),
    "t_ppl_incr"        -> (LlmOps.tPplIncr _),
    "t_rulefilter"      -> (LlmOps.tRuleFilter _),
    "t_ngram_freq"      -> (LlmOps.tNgramFreq _),
    "t_langid"          -> (LlmOps.tLangId _),
    "t_fingerprint"     -> (LlmOps.tFingerprint _),
    "t_repetition"      -> (LlmOps.tRepetition _),
    "t_redact"          -> (LlmOps.tRedact _),
    "t_tokens_bpe"      -> (LlmOps.tTokensBpe _),
    "t_sample"          -> (LlmOps.tSample _),
    "t_pack"            -> (LlmOps.tPack _),
    "t_vocab"           -> (LlmOps.tVocab _),
    "s_quantize"        -> (LlmOps.sQuantize _),
    "d_exact"           -> (LlmOps.dExact _),
    "d_line_dedup"      -> (LlmOps.dLineDedup _),
    "d_incr_lines"      -> (LlmOps.dIncrLines _),
    "d_incr_steady"     -> (LlmOps.dIncrSteady _),
    "d_ngram_jaccard"   -> (LlmOps.dNgramJaccard _),
    "d_ppjoin"          -> (LlmOps.dPpjoin _),
    "d_minhash_lsh"     -> (LlmOps.dMinhashLsh _),
    "d_simhash"         -> (LlmOps.dSimhash _),
    "d_simhash_pairs"   -> (LlmOps.dSimhashPairs _),
    "d_embed_neardup"   -> (LlmOps.dEmbedNearDup _),
    "d_semdedup"        -> (LlmOps.dSemDedup _),
    "d_winnow_pairs"    -> (LlmOps.dWinnowPairs _),
    "d_winnow_fast"     -> (LlmOps.dWinnowFast _),
    "d_components"      -> (LlmOps.dComponents _),
    "d_survivor"        -> (LlmOps.dSurvivor _),
    "d_linkage"         -> (LlmOps.dLinkage _),
    "d_components_star" -> (LlmOps.dComponentsStar _),
    "d_incremental"     -> (LlmOps.dIncremental _),
    "d_incr_lsh"        -> (LlmOps.dIncrLsh _),
    "d_passages"        -> (LlmOps.dPassages _),
    "d_substr_spans"    -> (LlmOps.dSubstrSpans _),
    "d_substr_removed"  -> (LlmOps.dSubstrRemoved _),
    "d_incr_substr"     -> (LlmOps.dIncrSubstr _),
    "t_unigram_lp"      -> (LlmOps.tUnigramLp _),
    "t_bigram_lm"       -> (LlmOps.tBigramLm _),
    "t_bigram_incr"     -> (LlmOps.tBigramIncr _),
    "t_trigram_lm"      -> (LlmOps.tTrigramLm _),
    "t_dupgrams"        -> (LlmOps.tDupGrams _),
    "t_bm25"            -> (LlmOps.tBm25 _),
    "t_heavy"           -> (LlmOps.tHeavy _),
    "t_entropy"         -> (LlmOps.tEntropy _),
    "t_dsir"            -> (LlmOps.tDsir _),
    "t_tfidf"           -> (LlmOps.tTfidf _),
    "d_decontam"        -> (LlmOps.dDecontam _),
    "t_chunks"          -> (LlmOps.tChunks _),
    "t_shard"           -> (LlmOps.tShard _),
    "d_split_leakfree"  -> (LlmOps.dSplitLeakfree _),
    "s_rproj"           -> (LlmOps.sRproj _),
    "t_rebalance"       -> (LlmOps.tRebalance _),
    "t_cap_domain"      -> (LlmOps.tCapDomain _),
    "t_stratified"      -> (LlmOps.tStratified _),
    "t_temperature"     -> (LlmOps.tTemperature _),
    "t_budget"          -> (LlmOps.tBudget _),
    "s_cosine_topk"     -> (LlmOps.sCosineTopK _),
    "s_hamming"         -> (LlmOps.sHamming _),
    "s_hamming_banded"  -> (LlmOps.sHammingBanded _),
    "s_rrf"             -> (LlmOps.sRrf _),
    "s_centroid"        -> (LlmOps.sCentroid _),
    "s_ann_ivf"         -> (LlmOps.sAnnIvf _),
    "s_ann_ivf_trained" -> (LlmOps.sAnnIvfTrained _),
    "s_ann_pq"          -> (LlmOps.sAnnPq _),
    "s_ann_ivfpq"       -> (LlmOps.sAnnIvfPq _),
    "s_ann_index"       -> (LlmOps.sAnnIndex _),
    "s_ann_query"       -> (LlmOps.sAnnQuery _),
    "s_ann_add"         -> (LlmOps.sAnnAdd _),
    "s_ann_remove"      -> (LlmOps.sAnnRemove _),
    "mm_meta"           -> (LlmOps.mmMeta _),
    "mm_decode"         -> (LlmOps.mmDecode _),
    "mm_frames"         -> (LlmOps.mmFrames _),
    "mm_neardup"        -> (LlmOps.mmNeardup _),
    "mm_frames_neardup" -> (LlmOps.mmFramesNeardup _),
    "mm_audio"          -> (LlmOps.mmAudio _),
    "mm_curation"       -> (LlmOps.mmCuration _),
    "mm_curation_stream" -> (LlmOps.mmCurationStream _),
    "c_str_roundtrip"   -> (CoderQueries.cStrRoundtrip _),
    "c_gzip_roundtrip"  -> (CoderQueries.cGzipRoundtrip _),
    "c_xml_tree"        -> (CoderQueries.cXmlTree _),
    "c_avro_roundtrip"  -> (CoderQueries.cAvroRoundtrip _),
    "c_json_roundtrip"  -> (CoderQueries.cJsonRoundtrip _),
    "c_jsonl_quarantine" -> (CoderQueries.cJsonlQuarantine _),
    "c_schema_evolution" -> (CoderQueries.cSchemaEvolution _),
    "p_from_list"       -> (PipelineQueries.pFromList _),
    "p_split_flatmap"   -> (PipelineQueries.pSplitFlatmap _),
    "p_text_file"       -> (PipelineQueries.pTextFile _),
    "p_binary_file"     -> (PipelineQueries.pBinaryFile _),
    "p_fold_trigger"    -> (PipelineQueries.pFoldTrigger _),
    "q18_scalar_funcs"  -> (CoderQueries.q18ScalarFuncs _),
    "q19_asof"          -> (CoderQueries.q19Asof _),
    "q20_outer_join"    -> (Relational.q20OuterJoin _),
    "q21_cube"          -> (Relational.q21Cube _),
    "q22_sliding_window" -> (Relational.q22SlidingWindow _),
    "q23_stats"         -> (Relational.q23Stats _),
    "q24_string_agg"    -> (Relational.q24StringAgg _),
    "q25_pivot"         -> (Relational.q25Pivot _),
    "q26_json_extract"  -> (LlmOps.q26JsonExtract _),
    "q27_stream_e2e"    -> (StreamQueries.q27StreamE2e _),
    "q30_late_data"     -> (StreamQueries.q30LateData _),
    "q31_stream_join"   -> (StreamQueries.q31StreamJoin _),
    "q28_histogram"     -> (Relational.q28Histogram _),
    "q29_zorder"        -> (Relational.q29Zorder _),
    "q32_hilbert"       -> (Relational.q32Hilbert _),
    "q33_sketch_bounds" -> (Relational.q33SketchBounds _),
    "q34_cms"           -> (Relational.q34Cms _),
    "q35_stream_cms"    -> (StreamQueries.q35StreamCms _),
    "q36_range_join"    -> (Relational.q36RangeJoin _),
    "q37_interval_join" -> (Relational.q37IntervalJoin _),
    "q38_stream_sessions" -> (StreamQueries.q38StreamSessions _),
    "q39_stream_sessions_late" -> (StreamQueries.q39StreamSessionsLate _),
  )

  /** q32_hilbert oracle: the 10 reflect+swap stages of the Hilbert
    * xy→d transform unrolled as chained CTEs (generated here so the
    * constants provably match Layout.hilbert2's unrolled plan). */
  private val hilbertOracleSql: String = {
    val base =
      """WITH h0 AS (
        |  SELECT event_id, (user_id % 1024)::bigint AS ub, hour(ts)::bigint AS hb,
        |    (user_id % 1024)::bigint AS x, hour(ts)::bigint AS y, 0::bigint AS d
        |  FROM events)""".stripMargin
    val stages = (9 to 0 by -1).zipWithIndex.map { case (level, idx) =>
      val s = 1L << level
      s"""h${idx + 1} AS (
         |  SELECT event_id, ub, hb,
         |    d + $s * $s * xor(3 * rx, ry) AS d,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END)
         |         ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END)
         |         ELSE y END AS y
         |  FROM (SELECT *,
         |      CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |    FROM h$idx))""".stripMargin
    }
    (base +: stages).mkString(",\n") + "\n" +
      "SELECT event_id, ub, hb, d AS hkey FROM h10 ORDER BY hkey, event_id"
  }

  private val coderOracles: Map[String, String] = Map(
    "q32_hilbert" -> hilbertOracleSql,
    // exact values + literal-true sketch-bound flags (the Spark side
    // computes the flags from its sketches; the oracle pins that they
    // must hold)
    "q33_sketch_bounds" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_distinct,
        |  true AS hll_ok,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
        |  true AS gk_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // full CMS re-derivation: same md5(i|key) 60-bit hash family, same
    // depth×width cell counts, min-over-rows estimate — deterministic,
    // so estimates are pinned exactly; ge_ok is the CMS structural
    // no-underestimate guarantee (literal true; a regression flips it)
    "q34_cms" ->
      """WITH exact AS (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
        |top AS (
        |  SELECT * FROM (
        |    SELECT l_partkey, cnt,
        |      row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rnk
        |    FROM exact)
        |  WHERE rnk <= 20),
        |cells AS (
        |  SELECT i, ('0x' || substr(md5(i::varchar || '|' || l_partkey::varchar),
        |      1, 15))::bigint % 256 AS cell, count(*) AS cnt
        |  FROM lineitem CROSS JOIN range(4) t(i) GROUP BY 1, 2)
        |SELECT top.l_partkey, top.rnk, top.cnt, min(c.cnt) AS cms_est,
        |  true AS ge_ok
        |FROM top CROSS JOIN range(4) t(i)
        |JOIN cells c ON c.i = t.i
        |  AND c.cell = ('0x' || substr(md5(t.i::varchar || '|' ||
        |    top.l_partkey::varchar), 1, 15))::bigint % 256
        |GROUP BY 1, 2, 3 ORDER BY rnk""".stripMargin,
    // the STREAM-built sketch must equal the batch-built one (additive
    // state merged across micro-batches), so the batch re-derivation
    // is a complete oracle for the streaming gate — same hash family,
    // depth 4 × width 64 over event user_id, exact top-15 probe
    "q35_stream_cms" ->
      """WITH exact AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |top AS (
        |  SELECT * FROM (
        |    SELECT user_id, cnt,
        |      row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk
        |    FROM exact)
        |  WHERE rnk <= 15),
        |cells AS (
        |  SELECT i, ('0x' || substr(md5(i::varchar || '|' || user_id::varchar),
        |      1, 15))::bigint % 64 AS cell, count(*) AS cnt
        |  FROM events CROSS JOIN range(4) t(i) GROUP BY 1, 2)
        |SELECT top.user_id, top.rnk, top.cnt, min(c.cnt) AS cms_est,
        |  true AS ge_ok
        |FROM top CROSS JOIN range(4) t(i)
        |JOIN cells c ON c.i = t.i
        |  AND c.cell = ('0x' || substr(md5(t.i::varchar || '|' ||
        |    top.user_id::varchar), 1, 15))::bigint % 64
        |GROUP BY 1, 2, 3 ORDER BY rnk""".stripMargin,
    // consolidated (r11 item #5): str identity + the planner's KV
    // chain identity + url field extraction, all absorbed columns kept
    "c_str_roundtrip" ->
      """SELECT doc_id, text, text AS text_kv, 'file' AS proto,
        |  '/corpus/' || source || '/' AS path,
        |  doc_id || '.txt' AS name
        |FROM documents ORDER BY doc_id""".stripMargin,
    // quarantine semantics pinned WITHOUT comparing JSON text (each
    // engine serializes its own): mangled rows (doc_id % 50 = 0) must
    // be flagged with NULL fields, every other row round-trips
    "c_jsonl_quarantine" ->
      """SELECT doc_id AS id,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL ELSE lang END AS lang,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL ELSE source END AS source,
        |  (doc_id % 50 = 0) AS quarantined
        |FROM documents ORDER BY id""".stripMargin,
    // the oracle is the naive theta-join the operator exists to avoid:
    // same pairs, same multi-match rows, any bucketWidth
    "q36_range_join" ->
      """WITH iv AS (
        |  SELECT DISTINCT user_id AS iv_user, user_id * 40 AS s,
        |    user_id * 40 + 60 AS e
        |  FROM events)
        |SELECT e.event_id, iv.iv_user, iv.s, iv.e
        |FROM events e JOIN iv ON e.event_id >= iv.s AND e.event_id < iv.e
        |ORDER BY event_id, iv_user""".stripMargin,
    // the oracle is the naive θ-join the overlap operator exists to
    // avoid: same pairs (incl. multi-overlap rows), any bucketWidth
    "q37_interval_join" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |l AS (SELECT user_id AS l_user, user_id * 50 AS ls,
        |  user_id * 50 + 80 AS le FROM u),
        |r AS (SELECT user_id AS r_user, user_id * 30 + 15 AS rs,
        |  user_id * 30 + 95 AS re FROM u)
        |SELECT l_user, ls, le, r_user, rs, re
        |FROM l JOIN r ON ls < re AND rs < le
        |ORDER BY l_user, r_user""".stripMargin,
    // merged-footer read pinned semantically: v1 rows (even ids, file
    // written WITHOUT source) must surface source as NULL; v2 rows keep
    // their values — evolution lost nothing, invented nothing
    "c_schema_evolution" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 0 THEN NULL ELSE source END AS source,
        |  CASE WHEN doc_id % 2 = 0 THEN 'v1' ELSE 'v2' END AS gen
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c_gzip_roundtrip" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    // the Spark side derives every field by schema-less tree navigation
    // of reconstructed XML; the oracle recomputes from source columns —
    // the round-trip through parse+navigate must be the identity.
    // rt_name = the TYPED to_xml/from_xml round trip (consolidated
    // from c_xml_roundtrip, r12)
    "c_xml_tree" ->
      """SELECT doc_id, source, lang, substr(text, 1, 80) AS body,
        |  2 AS n_children, 'meta' AS meta_tag, source AS rt_name
        |FROM documents ORDER BY doc_id""".stripMargin,
    // id/text = the Confluent encode∘decode identity; lang/tag = the
    // reader-schema projection (text dropped, tag defaulted) that Avro
    // schema resolution must reconstruct (consolidated from
    // c_avro_project, r12)
    "c_avro_roundtrip" ->
      "SELECT doc_id AS id, text, lang, 'x' AS tag FROM documents ORDER BY id",
    "c_json_roundtrip" ->
      "SELECT doc_id AS id, lang FROM documents ORDER BY id",
    "p_from_list" ->
      "SELECT i, i::varchar || '!' AS value FROM range(500) r(i) ORDER BY i",
    // order-preserving flatMap: every token with its fan-out position
    "p_split_flatmap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 40),
        |e AS (
        |  SELECT doc_id, unnest(list_transform(range(len(toks)),
        |    i -> {'pos': i, 'tok': toks[i+1]})) AS s
        |  FROM t)
        |SELECT doc_id, s.pos AS pos, s.tok AS tok FROM e
        |ORDER BY doc_id, pos""".stripMargin,
    "p_text_file" ->
      """SELECT text AS value FROM documents WHERE doc_id < 200
        |ORDER BY value""".stripMargin,
    "p_binary_file" ->
      """SELECT text AS value FROM documents WHERE doc_id < 50
        |ORDER BY value""".stripMargin,
    // fold trigger cadence: running accumulator at every 100th element
    // plus the end-of-input flush
    "p_fold_trigger" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split_regex(trim(text), '\s+'))::bigint AS c
        |  FROM documents),
        |r AS (
        |  SELECT sum(c) OVER (ORDER BY doc_id) AS rt,
        |    row_number() OVER (ORDER BY doc_id) AS n,
        |    count(*) OVER () AS tot
        |  FROM t)
        |SELECT n, rt::bigint AS running_total FROM r
        |WHERE n % 100 = 0 OR n = tot ORDER BY n""".stripMargin,
    "q18_scalar_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  round(sqrt(o_totalprice), 4) AS sq, round(ln(o_totalprice), 4) AS lg,
        |  round(abs(o_totalprice - 100000.5), 4) AS ab,
        |  ceil(o_totalprice)::bigint AS cl, floor(o_totalprice)::bigint AS fl,
        |  upper(substr(o_orderpriority, 1, 4)) AS up,
        |  replace(o_orderstatus, 'O', 'X') AS rp,
        |  lpad(o_orderkey::varchar, 8, '0') AS pad,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS cw
        |FROM orders WHERE o_orderkey <= 400 ORDER BY o_orderkey""".stripMargin,
    "q19_asof" ->
      """SELECT c.event_id, c.user_id, v.event_id AS view_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin,
    "q20_outer_join" ->
      """WITH heavy AS (
        |  SELECT l_orderkey AS hk, count(*) AS n_heavy FROM lineitem
        |  WHERE l_quantity > 45 GROUP BY l_orderkey)
        |SELECT coalesce(o_orderkey, hk) AS k,
        |  coalesce(n_heavy, 0) AS n_heavy,
        |  o_totalprice IS NULL AS no_order
        |FROM (SELECT * FROM orders WHERE o_orderkey <= 2000) o
        |FULL OUTER JOIN heavy ON o_orderkey = hk
        |WHERE coalesce(o_orderkey, hk) <= 3000
        |ORDER BY k""".stripMargin,
    "q21_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q22_sliding_window" ->
      """SELECT window_start, event_type, count(*) AS n FROM (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
        |         event_type
        |  FROM events)
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q23_stats" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_string_agg" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
        |  count(*) AS n_cust
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q27_stream_e2e" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  sum(length(text))::bigint AS n_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // streaming sessionization recomputed as a batch window-function
    // sessionization. Boundary rule is closedSessions' (== the native
    // session_window [t, t+gap) convention): an event at EXACTLY
    // end+gap opens a new session, hence `>=` where the q17 batch gate
    // uses `>`. The stream's sentinel row never appears (its key is
    // filtered; its session never closes anyway).
    "q38_stream_sessions" ->
      """WITH lagged AS (
        |  SELECT user_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // q39 (late-arrival delivery of the SAME sessionization): every
    // late event is in-horizon by construction (watermark delay = full
    // range + 1 h), so the emitted set equals the complete batch
    // sessionization — one oracle adjudicates both delivery schedules
    // (chronological q38, maximally-late q39)
    "q39_stream_sessions_late" ->
      """WITH lagged AS (
        |  SELECT user_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // watermark/late-data semantics recomputed without streaming
    // (Spark's drop rule, pinned in LateDataSpec: a late row is
    // dropped iff its window was evicted in a PRIOR batch — the late
    // slice is batch 2, gated by the bulk's eviction watermark
    // max(bulk ts) - 1801 s; bulk and advance slices aggregate
    // unfiltered; the sentinel flush emits every real window)
    "q30_late_data" ->
      """WITH a AS (
        |  SELECT ts, event_type, value FROM events WHERE event_id % 10 <> 0),
        |v AS (
        |  SELECT ts, event_type, value FROM events WHERE event_id % 20 = 10),
        |l AS (
        |  SELECT ts, event_type, value FROM events WHERE event_id % 20 = 0),
        |wm AS (SELECT max(ts) - INTERVAL 1801 SECOND AS w FROM a),
        |kept AS (
        |  SELECT * FROM a
        |  UNION ALL
        |  SELECT * FROM v
        |  UNION ALL
        |  SELECT l.* FROM l, wm
        |  WHERE date_trunc('hour', l.ts) + INTERVAL 1 HOUR > wm.w)
        |SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // stream-stream interval join recomputed as a plain batch interval
    // join: the streamed result provably equals it (the replay splits
    // by event time, so no pair's view state is evicted before its
    // clicks arrive — see StreamQueries.q31StreamJoin)
    "q31_stream_join" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts
        |ORDER BY click_id, view_id""".stripMargin,
    // Morton key: the same magic-number spread cascade as
    // Layout.zorder2, one CTE stage per shift (alias expressions bind
    // to the INPUT scope, so xa/xb rebind cleanly per stage)
    "q29_zorder" ->
      """WITH e AS (
        |  SELECT event_id, (user_id % 1024)::bigint AS ub, hour(ts)::bigint AS hb
        |  FROM events),
        |s1 AS (SELECT *, ub & 4294967295 AS xa, hb & 4294967295 AS xb FROM e),
        |s2 AS (SELECT event_id, ub, hb,
        |  (xa | (xa << 16)) & 281470681808895 AS xa,
        |  (xb | (xb << 16)) & 281470681808895 AS xb FROM s1),
        |s3 AS (SELECT event_id, ub, hb,
        |  (xa | (xa << 8)) & 71777214294589695 AS xa,
        |  (xb | (xb << 8)) & 71777214294589695 AS xb FROM s2),
        |s4 AS (SELECT event_id, ub, hb,
        |  (xa | (xa << 4)) & 1085102592571150095 AS xa,
        |  (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s3),
        |s5 AS (SELECT event_id, ub, hb,
        |  (xa | (xa << 2)) & 3689348814741910323 AS xa,
        |  (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s4),
        |s6 AS (SELECT event_id, ub, hb,
        |  (xa | (xa << 1)) & 6148914691236517205 AS xa,
        |  (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s5)
        |SELECT event_id, ub, hb,
        |  xor(xa | (xb << 1), -9223372036854775808) AS zkey
        |FROM s6 ORDER BY zkey, event_id""".stripMargin,
    // dense 16-bin histogram; every numeric literal cast to double so
    // both engines do IEEE arithmetic (DuckDB parses 5000.0 as DECIMAL)
    "q28_histogram" ->
      """WITH c AS (
        |  SELECT least(floor(l_extendedprice::double / (80000::double / 16)), 15)::int AS bin,
        |         count(*) AS n
        |  FROM lineitem
        |  WHERE l_extendedprice::double >= 0 AND l_extendedprice::double < 80000
        |  GROUP BY 1)
        |SELECT r.i::int AS bin,
        |  (r.i * (80000::double / 16))::double AS bin_lo,
        |  ((r.i + 1) * (80000::double / 16))::double AS bin_hi,
        |  coalesce(n, 0) AS n
        |FROM range(16) r(i) LEFT JOIN c ON r.i = c.bin
        |ORDER BY bin""".stripMargin,
    "q25_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )

  // the streaming twin is pinned by the BATCH gate's oracle — that IS
  // the contract (batch == stream, one oracle adjudicating both)
  def oracleSql: Map[String, String] = LlmOracles.sql ++ coderOracles ++ Map(
    "mm_curation_stream" -> LlmOracles.sql("mm_curation"),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * l_discount, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_join_chain" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q6_window_rank" ->
      """SELECT c_nationkey, rnk, c_custkey, c_name, c_acctbal FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk""".stripMargin,
    "q7_setops" ->
      """SELECT nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
        |) ORDER BY nationkey""".stripMargin,
    "q8_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q9_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q10_semi_anti" ->
      """WITH w AS (
        |  SELECT c_nationkey, count(*) AS with_orders FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |  GROUP BY c_nationkey),
        |wo AS (
        |  SELECT c_nationkey, count(*) AS without_orders FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |  GROUP BY c_nationkey)
        |SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
        |  coalesce(with_orders, 0) AS with_orders,
        |  coalesce(without_orders, 0) AS without_orders
        |FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q11_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q12_fold_count" ->
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS total_qty,
        |  round(max(l_extendedprice), 2) AS max_price FROM lineitem""".stripMargin,
    "q13_limit" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q14_merge_ordered" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id LIMIT 500""".stripMargin,
    "q15_roundrobin" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_discount > 0.05""".stripMargin,
    "q16_avg_subquery" ->
      """SELECT count(*) AS n_below, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.ak
        |WHERE l.l_quantity < a.avg_qty * 0.5""".stripMargin,
  )
}
