package graft.queries

/** DuckDB oracle SQL mirroring every LlmOps formula exactly (same
  * tokenizer, same md5-based hashes, same rounding) — see tools/check.py
  * for the verification harness.
  */
object LlmOracles {

  private val toks = """string_split_regex(trim(text), '\s+')"""

  /** Shared shingle CTE: distinct 3-gram word shingles per doc. */
  private val shingleCte =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
       |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
       |    FROM documents)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private val base: Map[String, String] = Map(
    "t_tokens" ->
      s"""SELECT doc_id, len($toks) AS n_tokens FROM documents ORDER BY doc_id""",

    "t_quality" ->
      s"""SELECT doc_id,
         |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) AS alpha_ratio,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  round(
         |    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) * 0.4
         |    + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / len($toks), 1.0)) * 0.3
         |    + least(len($toks) / 50.0, 1.0) * 0.3, 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t_langid" -> {
      def ratio(stops: String) =
        s"""round(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
           |  t -> t IN ($stops))) / len($toks), 4)""".stripMargin
      val en = ratio("'the','a','an','and','of','to','in','is','that','it'")
      val de = ratio("'der','die','das','und','ist','ein','zu','den','von','mit'")
      val fr = ratio("'le','la','les','et','de','un','une','est','que','pour'")
      s"""SELECT doc_id, en_ratio,
         |  CASE WHEN en_ratio > de_ratio AND en_ratio > fr_ratio AND en_ratio > 0 THEN 'en'
         |       WHEN de_ratio > fr_ratio AND de_ratio > 0 THEN 'de'
         |       WHEN fr_ratio > 0 THEN 'fr' ELSE 'unk' END AS pred_lang
         |FROM (SELECT doc_id, $en AS en_ratio, $de AS de_ratio, $fr AS fr_ratio
         |      FROM documents) ORDER BY doc_id""".stripMargin
    },

    // CCNet perplexity buckets: mean_nll per doc (the t_unigram_lp
    // formula), cutoffs from the 20% md5-hash sample per lang at ntile
    // boundary ranks, assignment by lexicographic (mean_nll, id)
    // comparison against the cutoff rows — identical to
    // TextStats.perplexityBuckets
    "t_ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |c AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total FROM c),
        |scored AS (
        |  SELECT id, round(avg(-ln(cnt / n_total)), 4) AS mean_nll
        |  FROM tok JOIN c USING (t) CROSS JOIN tot GROUP BY id),
        |sl AS (
        |  SELECT s.id, d.lang, s.mean_nll FROM scored s JOIN documents d ON s.id = d.doc_id),
        |samp AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY mean_nll, id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt
        |  FROM sl WHERE (('0x' || substr(md5(id::varchar), 1, 8))::bigint % 100) < 20),
        |cut AS (
        |  SELECT lang,
        |    max(CASE WHEN rn = ceil(cnt * 1 / 3.0) THEN mean_nll END) AS c1_nll,
        |    max(CASE WHEN rn = ceil(cnt * 1 / 3.0) THEN id END) AS c1_id,
        |    max(CASE WHEN rn = ceil(cnt * 2 / 3.0) THEN mean_nll END) AS c2_nll,
        |    max(CASE WHEN rn = ceil(cnt * 2 / 3.0) THEN id END) AS c2_id
        |  FROM samp GROUP BY lang)
        |SELECT sl.id AS doc_id, sl.lang, sl.mean_nll,
        |  (1 + CASE WHEN c1_nll IS NULL THEN 0
        |            WHEN sl.mean_nll > c1_nll OR (sl.mean_nll = c1_nll AND sl.id > c1_id) THEN 1
        |            ELSE 0 END
        |     + CASE WHEN c2_nll IS NULL THEN 0
        |            WHEN sl.mean_nll > c2_nll OR (sl.mean_nll = c2_nll AND sl.id > c2_id) THEN 1
        |            ELSE 0 END)::int AS bucket
        |FROM sl LEFT JOIN cut USING (lang) ORDER BY doc_id""".stripMargin,

    // steady-state perplexity buckets: LM vocab + cutoffs from the
    // corpus slice (md5 bucket < 95), batch slice (>= 95) scored
    // Laplace-smoothed against it ((cnt+1)/(total+|V|), OOV cnt = 0)
    // and bucketed by the same lexicographic cutoff comparison; the
    // 20% cutoff sample uses the same md5 formula (so sample = b < 20)
    "t_ppl_incr" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang,
        |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id AS id, b, lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM d),
        |lm AS (SELECT t, count(*) AS cnt FROM tok WHERE b < 95 GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total, count(*) AS n_vocab FROM lm),
        |scored AS (
        |  SELECT tok.id, tok.lang, tok.b,
        |    round(avg(-ln((coalesce(lm.cnt, 0) + 1) / (n_total + n_vocab))), 4) AS mean_nll
        |  FROM tok LEFT JOIN lm USING (t) CROSS JOIN tot
        |  GROUP BY tok.id, tok.lang, tok.b),
        |samp AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY mean_nll, id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt
        |  FROM scored WHERE b < 20),
        |cut AS (
        |  SELECT lang,
        |    max(CASE WHEN rn = ceil(cnt * 1 / 3.0) THEN mean_nll END) AS c1_nll,
        |    max(CASE WHEN rn = ceil(cnt * 1 / 3.0) THEN id END) AS c1_id,
        |    max(CASE WHEN rn = ceil(cnt * 2 / 3.0) THEN mean_nll END) AS c2_nll,
        |    max(CASE WHEN rn = ceil(cnt * 2 / 3.0) THEN id END) AS c2_id
        |  FROM samp GROUP BY lang)
        |SELECT s.id AS doc_id, s.lang, s.mean_nll,
        |  (1 + CASE WHEN c1_nll IS NULL THEN 0
        |            WHEN s.mean_nll > c1_nll OR (s.mean_nll = c1_nll AND s.id > c1_id) THEN 1
        |            ELSE 0 END
        |     + CASE WHEN c2_nll IS NULL THEN 0
        |            WHEN s.mean_nll > c2_nll OR (s.mean_nll = c2_nll AND s.id > c2_id) THEN 1
        |            ELSE 0 END)::int AS bucket
        |FROM scored s LEFT JOIN cut USING (lang)
        |WHERE s.b >= 95 ORDER BY doc_id""".stripMargin,

    // Gopher/C4 rule filter: same rounded signals as t_quality /
    // t_repetition, first failing rule in declaration order
    "t_rulefilter" -> {
      def topFrac(l: String) =
        s"""round(list_max(list_transform(list_distinct($l),
           |  x -> len(list_filter($l, y -> y = x)))) / len($l), 4)""".stripMargin
      s"""SELECT doc_id, (reason = 'ok')::int AS keep, reason FROM (
         |  SELECT doc_id,
         |    CASE WHEN len($toks) < 30 THEN 'too_short'
         |         WHEN len($toks) > 90 THEN 'too_long'
         |         WHEN round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) < 0.82 THEN 'low_alpha'
         |         WHEN ${topFrac(toks)} > 0.12 THEN 'repetitive'
         |         ELSE 'ok' END AS reason
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // corpus top-20 word trigrams by tf (tie-break trigram text), same
    // short-doc shingle clamp as the jaccard oracles
    "t_ngram_freq" ->
      s"""WITH sh AS (
         |  SELECT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents))
         |SELECT row_number() OVER (ORDER BY tf DESC, ng) AS rank, ng, tf, df
         |FROM (SELECT sh AS ng, count(*) AS tf, count(DISTINCT doc_id) AS df
         |      FROM sh GROUP BY sh)
         |ORDER BY tf DESC, ng LIMIT 20""".stripMargin,

    // trained linear classifier score: the SAME committed QualityModel
    // constants interpolated into SQL (single source of truth with the
    // Spark side); same md5 bucket formula, same mean-then-sigmoid
    "t_quality_lr" -> {
      import graft.functions.QualityModel
      val w = QualityModel.weights.mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, ${QualityModel.bias} + list_sum(list_transform(toks,
         |      t -> [$w][((('0x' || substr(md5(t), 1, 8))::bigint % ${QualityModel.dim}) + 1)::int]))
         |    / greatest(len(toks), 1) AS z
         |  FROM tok)
         |SELECT doc_id, round(1/(1+exp(-z)), 4) AS score,
         |  (1/(1+exp(-z)) >= 0.5)::int AS pred_en
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // top-token / top-bigram fraction via unnest + GROUP BY rather
    // than the r10 nested list_distinct×list_filter lambdas (those
    // were O(distinct·len) per doc in the list VM — 24.6 s at sf0.01,
    // ~70% of the whole oracle budget; this form is three vectorized
    // hash aggregates, <0.5 s). Same values: max per-doc token count /
    // token-list length, BIGINT/BIGINT → double division, round(4).
    "t_repetition" ->
      s"""WITH t2 AS (
         |  SELECT doc_id, $toks AS tk, len($toks) AS l FROM documents),
         |c1 AS (
         |  SELECT doc_id, max(cnt) AS mx, max(l) AS l FROM (
         |    SELECT doc_id, l, t, count(*) AS cnt
         |    FROM (SELECT doc_id, l, unnest(tk) AS t FROM t2)
         |    GROUP BY doc_id, l, t)
         |  GROUP BY doc_id),
         |c2 AS (
         |  SELECT doc_id, max(cnt) AS mx, max(bl) AS bl FROM (
         |    SELECT doc_id, bl, g, count(*) AS cnt FROM (
         |      SELECT doc_id, greatest(l - 1, 1) AS bl,
         |        unnest(list_transform(range(greatest(l - 1, 1)),
         |          i -> array_to_string(tk[(i+1):(i+2)], ' '))) AS g
         |      FROM t2)
         |    GROUP BY doc_id, bl, g)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, round(c1.mx / c1.l, 4) AS top_token_frac,
         |  round(c2.mx / c2.bl, 4) AS top_bigram_frac
         |FROM documents d JOIN c1 USING (doc_id) JOIN c2 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Shannon entropy in the same one-agg closed form as the Spark
    // plan (H = ln n − Σ c·ln c / n over the count table); char side
    // on RAW text via the char split (DuckDB string_split with ''
    // yields chars and no trailing empty — the Spark side drops Java's
    // trailing ""), token side on the repo's lowercased tokens.
    // round(4) + 0 normalizes the −0.0 a single-symbol doc can hit.
    // `c <> ''` mirrors the Spark side's length==1 filter for the
    // text='' edge (DuckDB splits '' to [''], Spark's filter drops it;
    // with the guard BOTH engines omit empty-text docs from the
    // output — they have no char distribution to score).
    "t_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cc AS (SELECT doc_id, c, count(*) AS n FROM ch
        |       WHERE c <> '' GROUP BY doc_id, c),
        |hc AS (SELECT doc_id,
        |    round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) + 0 AS h_char
        |  FROM cc GROUP BY doc_id),
        |tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |tc AS (SELECT doc_id, t, count(*) AS n FROM tk GROUP BY doc_id, t),
        |ht AS (SELECT doc_id,
        |    round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) + 0 AS h_token
        |  FROM tc GROUP BY doc_id)
        |SELECT doc_id, h_char, h_token FROM hc JOIN ht USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "t_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    substr(text, 1, 40) || ' contact user' || doc_id::varchar
        |      || '@example.com or call +1 555 123 ' || (doc_id % 10000)::varchar,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // consolidated (r11 item #5): the pre-tokenizer / whitespace
    // counts AND the real merge-table BPE recomputed rule by rule —
    // each doc becomes a delimiter-wrapped symbol string (chr(1) sym
    // chr(2), pre-tokens joined by chr(3) so merges never cross
    // pre-token boundaries), and the recursive CTE applies merge rank
    // k at step k as one left-to-right non-overlapping replace — the
    // exact apply semantics of the graft_bpe kernel. n_tokens counts
    // symbol delimiters; tok_md5 hashes the chr(4)-joined token
    // sequence (identical to the Spark side's concat_ws(chr(4), toks)).
    "t_tokens_bpe" -> {
      val n = graft.expressions.BpeFixture.ruleCount
      s"""WITH RECURSIVE rules(rk, l, r) AS (VALUES ${graft.expressions.BpeFixture.sqlRules}),
         |counts AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+'))::bigint AS n_bpe,
         |    len(string_split_regex(trim(text), '\\s+'))::bigint AS n_ws
         |  FROM documents),
         |doc0 AS (
         |  SELECT doc_id, array_to_string(list_transform(
         |      regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'),
         |      pt -> list_aggregate(list_transform(regexp_extract_all(pt, '(?s).'),
         |                             c -> chr(1)||c||chr(2)), 'string_agg', '')),
         |    chr(3)) AS s
         |  FROM documents),
         |rec AS (
         |  SELECT doc_id, s, 0 AS step FROM doc0
         |  UNION ALL
         |  SELECT rec.doc_id,
         |    replace(rec.s, chr(1)||rules.l||chr(2)||chr(1)||rules.r||chr(2),
         |            chr(1)||rules.l||rules.r||chr(2)),
         |    rec.step + 1
         |  FROM rec JOIN rules ON rules.rk = rec.step + 1
         |  WHERE rec.step < $n),
         |fin AS (
         |  SELECT doc_id, s,
         |    substr(replace(replace(s, chr(3), ''), chr(2)||chr(1), chr(4)), 2,
         |      greatest(0, length(replace(replace(s, chr(3), ''), chr(2)||chr(1), chr(4))) - 2)) AS joined
         |  FROM rec WHERE step = $n)
         |SELECT f.doc_id, c.n_bpe, c.n_ws,
         |  (length(f.s) - length(replace(f.s, chr(1), '')))::bigint AS n_tokens,
         |  md5(f.joined) AS tok_md5
         |FROM fin f JOIN counts c ON f.doc_id = c.doc_id
         |ORDER BY f.doc_id""".stripMargin
    },

    "t_pack" ->
      s"""WITH n AS (
         |  SELECT doc_id, len($toks)::bigint AS n FROM documents),
         |c AS (
         |  SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM n)
         |SELECT doc_id, n AS n_tokens,
         |  ((cum - n) // 2048)::bigint AS bin,
         |  ((cum - n) % 2048)::bigint AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    "t_vocab" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($toks) AS tok FROM documents),
         |f AS (
         |  SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
         |  FROM t GROUP BY tok)
         |SELECT row_number() OVER (ORDER BY tf DESC, tok) AS rank,
         |  tok, tf, df
         |FROM f ORDER BY tf DESC, tok LIMIT 50""".stripMargin,

    "t_sample" ->
      """SELECT doc_id,
        |  (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100)::int AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "s_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS sc FROM e),
        |q AS (SELECT vec_id, sc,
        |  list_transform(v, x -> round(x / sc * 127)::int) AS qv FROM s)
        |SELECT vec_id, round(sc, 6) AS scale,
        |  list_sum(qv)::bigint AS q_sum, list_max(qv) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // corpus-wide line dedup over pseudo-lines of 3 tokens: keep only
    // the (doc_id, pos)-minimum occurrence of each line, drop lines
    // with corpus frequency > 3 outright; reassemble in order, empty
    // string for fully-dropped docs. min key doc_id*1e6+pos mirrors
    // Spark's lexicographic min(struct(doc_id, pos)) (pos < 1e6).
    "d_line_dedup" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $toks AS toks FROM documents),
         |ln AS (
         |  SELECT doc_id, unnest(range(greatest((len(toks)+2)//3, 1))) AS pos, toks FROM tok),
         |lines AS (
         |  SELECT doc_id, pos, array_to_string(toks[(pos*3+1):(pos*3+3)], ' ') AS line FROM ln),
         |firsts AS (
         |  SELECT line, min(doc_id*1000000+pos) AS fk FROM lines WHERE line <> ''
         |  GROUP BY line HAVING count(*) <= 3),
         |kept AS (
         |  SELECT l.doc_id, l.pos, l.line FROM lines l
         |  JOIN firsts f ON l.line = f.line AND l.doc_id*1000000+l.pos = f.fk
         |  UNION ALL
         |  SELECT doc_id, pos, line FROM lines WHERE line = ''),
         |agg AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ktext, count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(a.ktext, '') AS text,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  greatest((len(t.toks)+2)//3, 1)::bigint AS n_lines
         |FROM tok t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // incremental line dedup: batch slice (md5 bucket >= 95) drops
    // corpus-present lines (bucket < 95) then keep-first within the
    // batch; same pseudo-line construction and min-key as d_line_dedup.
    // d_incr_steady is the SAME semantics against a prebuilt persisted
    // index, so it shares this oracle verbatim (see the alias below).
    "d_incr_lines" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $toks AS toks,
         |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
         |  FROM documents),
         |ln AS (
         |  SELECT doc_id, b, unnest(range(greatest((len(toks)+2)//3, 1))) AS pos, toks FROM tok),
         |lines AS (
         |  SELECT doc_id, b, pos, array_to_string(toks[(pos*3+1):(pos*3+3)], ' ') AS line FROM ln),
         |novel AS (
         |  SELECT doc_id, pos, line FROM lines WHERE b >= 95 AND line <> ''
         |    AND line NOT IN (SELECT DISTINCT line FROM lines WHERE b < 95 AND line <> '')),
         |firsts AS (
         |  SELECT line, min(doc_id*1000000+pos) AS fk FROM novel GROUP BY line),
         |kept AS (
         |  SELECT l.doc_id, l.pos, l.line FROM novel l
         |  JOIN firsts f ON l.line = f.line AND l.doc_id*1000000+l.pos = f.fk
         |  UNION ALL
         |  SELECT doc_id, pos, line FROM lines WHERE b >= 95 AND line = ''),
         |agg AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ktext, count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(a.ktext, '') AS text,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  greatest((len(t.toks)+2)//3, 1)::bigint AS n_lines
         |FROM tok t LEFT JOIN agg a USING (doc_id)
         |WHERE t.b >= 95 ORDER BY t.doc_id""".stripMargin,

    "d_exact" ->
      """WITH h AS (
        |  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        |g AS (SELECT fp, min(doc_id) AS canonical_id, count(*) AS group_size
        |      FROM h GROUP BY fp)
        |SELECT doc_id, canonical_id, group_size FROM h JOIN g USING (fp)
        |ORDER BY doc_id""".stripMargin,

    // capped semantics (mirrors Dedup.ngramJaccard maxDocFreq=100):
    // shingles present in more than 100 docs are dropped BEFORE both the
    // set sizes and the intersection counts, so jaccard is a true
    // similarity over the retained (discriminative) shingles.
    "d_ngram_jaccard" ->
      s"""WITH sh0 AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents)),
         |sh AS (
         |  SELECT * FROM sh0 WHERE sh NOT IN (
         |    SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 100)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // d_ppjoin mirrors Dedup.jaccardJoinPrefix(threshold=0.7,
    // maxDocFreq=100). The prefix filter is LOSSLESS, so the oracle is
    // the plain exact jaccard theta-join at 0.7 over the same capped
    // shingle sets — the gate pins the filter's completeness.
    "d_ppjoin" ->
      s"""WITH sh0 AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents)),
         |sh AS (
         |  SELECT * FROM sh0 WHERE sh NOT IN (
         |    SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 100)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id)
         |WHERE jaccard >= 0.7 ORDER BY id_a, id_b""".stripMargin,

    // LOCKSTEP (r17): the minhash permutation input is the shingle's
    // 60-bit KEY rendered as its decimal string — the inner
    // ('0x'||substr(md5(sh),1,15))::bigint is Text.shingleKey, applied
    // on the Spark side BEFORE the shuffle (byte-stable exchange rows);
    // sizes and intersections stay on raw sh (values invariant under an
    // injective key map). Same formula in d_incr_lsh and mm_curation.
    "d_minhash_lsh" ->
      s"""WITH $shingleCte,
         |h AS (
         |  SELECT doc_id, i,
         |    min(('0x' || substr(md5(i::varchar || '|' || (('0x' || substr(md5(sh), 1, 15))::bigint)::varchar), 1, 15))::bigint) AS mh
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |sig AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(mh::varchar, '|' ORDER BY i)) AS bsig
         |  FROM h GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.band = b.band AND a.bsig = b.bsig
         |    AND a.doc_id < b.doc_id),
         |inter AS (
         |  SELECT id_a, id_b, count(*) AS i FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b AND sa.sh = sb.sh
         |  GROUP BY id_a, id_b)
         |SELECT * FROM (
         |  SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |  FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // winnowing passage prints: md5-of-k-gram hashes (60-bit bigint
    // prefix — same ('0x'||hex)::bigint trick as minhash), min per
    // sliding window of 8, distinct per doc, df-capped at 20, pairs
    // sharing >= 10 prints. Mirrors Dedup.winnowPairs(k=24, window=8,
    // maxDocFreq=20, minShared=10) exactly.
    "d_winnow_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(range(len(t) - 23),
        |    i -> ('0x' || substr(md5(substr(t, i + 1, 24)), 1, 15))::bigint) AS hs
        |  FROM t WHERE len(t) >= 24),
        |p0 AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_id, unnest(list_transform(range(len(hs) - 7),
        |      w -> list_min(hs[(w + 1):(w + 8)]))) AS p
        |    FROM h WHERE len(hs) >= 8)),
        |p AS (
        |  SELECT * FROM p0 WHERE p NOT IN (
        |    SELECT p FROM p0 GROUP BY p HAVING count(*) > 20))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM p a JOIN p b ON a.p = b.p AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // The rolling-hash production variant, oracled bit-for-bit: the
    // JVM kernel (expressions/RollingWinnow.compute) is a base-257
    // polynomial hash over chars with 64-bit WRAPPING arithmetic and
    // SIGNED-long window minima. DuckDB has no wrapping bigint; the
    // r10 oracle recomputed every k-gram positionally in HUGEINT list
    // lambdas (O(len·k) per doc in the list VM — 17 s at sf0.01, 226 s
    // at sf0.1). This form is O(len) and fully vectorized:
    //   H_g = Σ_{m<24} c_{g+m}·257^{23−m}
    //       = 257^{g+23} · Σ_{j=g..g+23} c_j·257^{−j}   (mod 2^64)
    // 257 is odd ⇒ invertible mod 2^64; a recursive-CTE power table
    // carries 257^i and 257^{−i} (both reduced mod 2^64, with a
    // 32-bit-split mulmod so no intermediate exceeds 2^97), one window
    // prefix-sum forms the Σ, and each gram hash is one subtraction +
    // one mulmod. Every reduced value is identical to the r10 oracle's
    // (and to the JVM kernel's wrapping arithmetic); signed-BIGINT
    // mapping BEFORE the window-of-8 min so minima order like Scala's
    // `<`. ASCII fixture ⇒ codepoints == JVM chars (surrogate-free).
    "d_winnow_fast" -> {
      val m64 = "18446744073709551616::HUGEINT"        // 2^64
      val inv = (BigInt(257).modInverse(BigInt(1) << 64)).toString // 257^-1 mod 2^64
      s"""WITH RECURSIVE t AS MATERIALIZED (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |c AS MATERIALIZED (
        |  SELECT doc_id, n, s.pos AS pos, s.ch AS ch FROM (
        |    SELECT doc_id, len(t) AS n,
        |      unnest(list_transform(range(len(t)),
        |        i -> {'pos': i, 'ch': unicode(substr(t, i + 1, 1))})) AS s
        |    FROM t WHERE len(t) >= 24)),
        |mx AS (SELECT max(n) AS m FROM c),
        |pr(i, pw, pinv) AS (
        |  SELECT 0, 1::HUGEINT, 1::HUGEINT
        |  UNION ALL
        |  SELECT i + 1,
        |    (pw * 257) % $m64,
        |    (((pinv // 4294967296) * $inv::HUGEINT) % 4294967296 * 4294967296
        |      + (pinv % 4294967296) * $inv::HUGEINT) % $m64
        |  FROM pr WHERE i < (SELECT m FROM mx)),
        |s AS MATERIALIZED (
        |  SELECT doc_id, n, pos,
        |    sum(ch::HUGEINT * pinv) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS pre
        |  FROM c JOIN pr ON pr.i = c.pos),
        |hh AS MATERIALIZED (
        |  SELECT doc_id, n, pos - 23 AS g,
        |    (pre - coalesce(lag(pre, 24) OVER (PARTITION BY doc_id ORDER BY pos),
        |                    0::HUGEINT)) % $m64 AS d
        |  FROM s QUALIFY pos >= 23),
        |sg AS MATERIALIZED (
        |  SELECT doc_id, n, g,
        |    CASE WHEN h >= 9223372036854775808::HUGEINT
        |         THEN (h - $m64)::BIGINT ELSE h::BIGINT END AS h
        |  FROM (
        |    SELECT doc_id, n, g,
        |      (((d // 4294967296) * pw) % 4294967296 * 4294967296
        |        + (d % 4294967296) * pw) % $m64 AS h
        |    FROM hh JOIN pr ON pr.i = hh.g + 23)),
        |p0 AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT doc_id, n, g,
        |      min(h) OVER (PARTITION BY doc_id ORDER BY g
        |        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS p
        |    FROM sg)
        |  WHERE g <= n - 31),
        |p AS (
        |  SELECT * FROM p0 WHERE p NOT IN (
        |    SELECT p FROM p0 GROUP BY p HAVING count(*) > 20))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM p a JOIN p b ON a.p = b.p AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY id_a, id_b""".stripMargin
    },

    "d_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::bigint AS h
         |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)),
         |votes AS (
         |  SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) AS vote
         |  FROM tok CROSS JOIN range(32) r(b) GROUP BY doc_id, b)
         |SELECT doc_id,
         |  sum(CASE WHEN vote > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d_simhash_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::bigint AS h
         |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)),
         |votes AS (
         |  SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) AS vote
         |  FROM tok CROSS JOIN range(32) r(b) GROUP BY doc_id, b),
         |sig AS (
         |  SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS s
         |  FROM votes GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, s, band, (s >> (band * 8)) & 255 AS byte
         |  FROM sig CROSS JOIN range(4) r(band))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.s, b.s))::int AS hamming
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "d_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v, label FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_inner_product(a.v, b.v) /
        |      (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    // semantic dedup: the d_embed_neardup pair set at 0.45, closed
    // transitively (same recursive reach as d_components), every
    // vec_id mapped to its cluster min (itself when unpaired)
    "d_semdedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, embedding::double[] AS v, label FROM embeddings),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      round(list_inner_product(a.v, b.v) /
        |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
        |    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |  WHERE cos >= 0.45),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT DISTINCT src AS id, src AS comp FROM edges
        |  UNION
        |  SELECT ed.src AS id, r.comp FROM edges ed JOIN reach r ON ed.dst = r.id),
        |comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT v.vec_id AS id,
        |  coalesce(c.comp, v.vec_id) AS canonical_id,
        |  (CASE WHEN coalesce(c.comp, v.vec_id) = v.vec_id THEN 1 ELSE 0 END)::int AS keep
        |FROM e v LEFT JOIN comp c ON v.vec_id = c.id
        |ORDER BY id""".stripMargin,

    "s_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_inner_product(q.v, c.v) /
        |      (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))), 6) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT query_id, rnk, cand_id, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // binary-quantized ANN re-derived end to end: 32-bit sign-packed
    // words (bit i of word w set iff v[w*32+i] > 0 — 1::BIGINT << i
    // stays in positive range), coarse Hamming shortlist with
    // (ham, cand_id) tie-break, exact-cosine rerank with
    // (cos DESC, cand_id) — both stages deterministic, so this is a
    // full hash oracle, not a recall bound
    "s_hamming" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        |sig AS (SELECT vec_id, v,
        |  [ list_sum(list_transform(range(32),
        |      i -> CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT,
        |    list_sum(list_transform(range(32),
        |      i -> CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT ] AS s
        |  FROM e),
        |coarse AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    (bit_count(xor(q.s[1], c.s[1])) + bit_count(xor(q.s[2], c.s[2])))::BIGINT AS ham
        |  FROM sig q JOIN sig c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |short AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ham, cand_id) AS crnk
        |    FROM coarse)
        |  WHERE crnk <= 30),
        |refined AS (
        |  SELECT s.query_id, s.cand_id, s.ham,
        |    round(list_inner_product(q.v, c.v) /
        |      (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))), 6) AS cos
        |  FROM short s JOIN e q ON s.query_id = q.vec_id JOIN e c ON s.cand_id = c.vec_id)
        |SELECT query_id, rnk, cand_id, ham, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
        |  FROM refined)
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // banded Hamming pairs re-derived end to end: same 32-bit
    // sign-packing as s_hamming, 8-bit band values by shift+mask on
    // the packed words (word = (k*8)//32, shift = (k*8)%32 — the exact
    // arithmetic of hammingBandedPairs), bucket equi-join on
    // (band, value), full-popcount filter at 15, DISTINCT pairs. The
    // operator is recall-approximate at maxHamming >= bands but a pure
    // function of the signatures, so the full pair set hash-matches.
    "s_hamming_banded" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        |sig AS (SELECT vec_id,
        |  [ list_sum(list_transform(range(32),
        |      i -> CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT,
        |    list_sum(list_transform(range(32),
        |      i -> CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT ] AS s
        |  FROM e),
        |banded AS (
        |  SELECT vec_id, s, k, ((s[(k*8)//32 + 1] >> ((k*8)%32)) & 255) AS bv
        |  FROM sig CROSS JOIN range(8) r(k))
        |SELECT * FROM (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    (bit_count(xor(a.s[1], b.s[1])) +
        |     bit_count(xor(a.s[2], b.s[2])))::BIGINT AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.k = b.k AND a.bv = b.bv AND a.vec_id < b.vec_id)
        |WHERE hamming <= 15 ORDER BY id_a, id_b""".stripMargin,

    "s_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::double[] AS v, label FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_inner_product(q.v, c.v) /
        |      (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))), 6) AS cos
        |  FROM e q JOIN e c ON q.label = c.label AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT query_id, rnk, cand_id, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // transitive min-reachable-id via RECURSIVE CTE over the SAME
    // capped-jaccard pair derivation as d_ngram_jaccard — verifies the
    // iterative hash-min label propagation exactly
    "d_components" ->
      s"""WITH RECURSIVE sh0 AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents)),
         |shc AS (
         |  SELECT * FROM sh0 WHERE sh NOT IN (
         |    SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 100)),
         |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
         |interc AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |    FROM interc JOIN szc na ON id_a = na.doc_id JOIN szc nb ON id_b = nb.doc_id)
         |  WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT DISTINCT src AS id, src AS comp FROM edges
         |  UNION
         |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON e.dst = r.id)
         |SELECT id, min(comp)::bigint AS comp FROM reach
         |GROUP BY id ORDER BY id""".stripMargin,

    // cross-table fuzzy linkage: char-trigram jaccard between the odd
    // (<120) and even part-name sides; trigram derivation mirrors
    // Text.charTrigrams (normalize -> distinct 3-char substrings,
    // whole string when len < 3)
    "d_linkage" ->
      """WITH norm AS (
        |  SELECT p_partkey, lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS t
        |  FROM part),
        |tri AS (
        |  SELECT p_partkey, unnest(list_distinct(list_transform(
        |    range(greatest(length(t) - 2, 1)), i -> substr(t, i+1, 3)))) AS sh
        |  FROM norm),
        |l AS (SELECT p_partkey AS id_l, sh FROM tri WHERE p_partkey % 2 = 1 AND p_partkey < 120),
        |r AS (SELECT p_partkey AS id_r, sh FROM tri WHERE p_partkey % 2 = 0),
        |nl AS (SELECT id_l, count(*) AS n FROM l GROUP BY id_l),
        |nr AS (SELECT id_r, count(*) AS n FROM r GROUP BY id_r),
        |inter AS (
        |  SELECT id_l, id_r, count(*) AS i FROM l JOIN r USING (sh) GROUP BY 1, 2)
        |SELECT id_l, id_r, jaccard FROM (
        |  SELECT id_l, id_r, round(i / (nl.n + nr.n - i), 4) AS jaccard
        |  FROM inter JOIN nl USING (id_l) JOIN nr USING (id_r))
        |WHERE jaccard >= 0.5 ORDER BY id_l, id_r""".stripMargin,

    // quality-aware survivor: the d_components cluster derivation, then
    // per-cluster survivor by (length(text) DESC, id) — singleton docs
    // are their own cluster and survive trivially
    "d_survivor" ->
      s"""WITH RECURSIVE sh0 AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents)),
         |shc AS (
         |  SELECT * FROM sh0 WHERE sh NOT IN (
         |    SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 100)),
         |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
         |interc AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |    FROM interc JOIN szc na ON id_a = na.doc_id JOIN szc nb ON id_b = nb.doc_id)
         |  WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT DISTINCT src AS id, src AS comp FROM edges
         |  UNION
         |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
         |comp AS (SELECT id, min(comp)::bigint AS comp FROM reach GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id AS id, coalesce(c.comp, d.doc_id) AS cluster,
         |    length(d.text)::bigint AS sc
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |surv AS (
         |  SELECT cluster, id AS survivor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY cluster ORDER BY sc DESC, id) AS rk FROM lab)
         |  WHERE rk = 1)
         |SELECT l.id, l.cluster, s.survivor_id,
         |  (l.id = s.survivor_id)::int AS keep
         |FROM lab l JOIN surv s USING (cluster) ORDER BY l.id""".stripMargin,

    // domain rebalancing: keep_rate = min(1, target*total/n) per
    // source (src0 1%, src1 2%, others keep-all), selection by md5
    // bucket of doc_id at 1/10000 — identical arithmetic association
    // on both engines so the double compare is bit-equal
    "t_rebalance" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |t AS (SELECT count(*) AS tot FROM documents),
        |r AS (
        |  SELECT source, coalesce(least(1.0::double,
        |    CASE source WHEN 'src0' THEN 0.01::double WHEN 'src1' THEN 0.02::double END
        |      * tot / n),
        |    1.0::double) AS rate
        |  FROM c CROSS JOIN t)
        |SELECT d.doc_id, d.source
        |FROM documents d LEFT JOIN r ON d.source IS NOT DISTINCT FROM r.source
        |WHERE (('0x' || substr(md5(d.doc_id::varchar), 1, 8))::bigint % 10000)
        |  < coalesce(rate, 1.0) * 10000
        |ORDER BY doc_id""".stripMargin,

    // per-domain cap: row_number over salted-md5 rank within each
    // source, keep rank <= 10 — identical hash and tie-break on both
    // engines, so this is a full hash oracle
    "t_cap_domain" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::varchar || '|cap'), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    // stratified sample: md5 bucket of doc_id under a per-source CASE
    // fraction (same formula as t_sample at 1/10000 resolution)
    "t_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 10000)
        |  < (CASE WHEN source = 'src0' THEN 0.5
        |          WHEN source = 'src1' THEN 0.2
        |          ELSE 0.1 END) * 10000
        |ORDER BY doc_id""".stripMargin,

    // temperature sampling: q_s ∝ n_s^0.3; copies-per-doc
    // c_s = round(q_s·tot/n_s, 6); a doc takes the extra copy iff its
    // md5 unit draw (1e-6 resolution, same formula as t_sample) falls
    // below frac(c_s)
    "t_temperature" ->
      """WITH c AS (SELECT lang, count(*)::double AS n FROM documents GROUP BY lang),
        |s AS (SELECT sum(n) AS tot, sum(pow(n, 0.3)) AS ps FROM c),
        |r AS (SELECT lang, round(pow(n, 0.3) / ps * tot / n, 6) AS cc FROM c, s)
        |SELECT d.doc_id, d.lang,
        |  (floor(cc)::bigint +
        |   CASE WHEN (('0x' || substr(md5(d.doc_id::varchar), 1, 8))::bigint % 1000000)
        |        < (cc - floor(cc)) * 1000000 THEN 1 ELSE 0 END)::bigint AS n_copies
        |FROM documents d JOIN r USING (lang)
        |ORDER BY doc_id""".stripMargin,

    // token-budget selection: exact ranked cumsum (score desc, id) cut
    // at the inclusive 10k-token budget — the oracle's single global
    // window IS the semantics the distributed two-phase prefix must match
    "t_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) AS score,
         |    len($toks)::bigint AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, score, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, score, n_tokens, cum_tokens::bigint AS cum_tokens
         |FROM c WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin,

    // seeded random projection: the oracle regenerates the identical
    // ±1 sign matrix from the same md5 formula (first byte < 0x80),
    // then sums v·sign per (vector, output dim) in double
    "s_rproj" ->
      """WITH m AS (
        |  SELECT i, j,
        |    CASE WHEN ('0x' || substr(md5('rp|' || i || '|' || j), 1, 2))::int < 128
        |         THEN 1 ELSE -1 END AS s
        |  FROM range(8) a(i) CROSS JOIN range(64) b(j)),
        |e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
        |         unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT vec_id AS id, i::int AS dim,
        |  round(sum(v::double * s), 4) + 0 AS val
        |FROM e JOIN m USING (j)
        |GROUP BY 1, 2 ORDER BY id, dim""".stripMargin,

    // leakage-free split: same components as d_components, then every
    // doc buckets by its component label (singletons by their own id) —
    // 10% test by the t_sample md5-bucket formula over the GROUP key
    "d_split_leakfree" ->
      s"""WITH RECURSIVE sh0 AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM documents)),
         |shc AS (
         |  SELECT * FROM sh0 WHERE sh NOT IN (
         |    SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 100)),
         |szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
         |interc AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS jaccard
         |    FROM interc JOIN szc na ON id_a = na.doc_id JOIN szc nb ON id_b = nb.doc_id)
         |  WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT DISTINCT src AS id, src AS comp FROM edges
         |  UNION
         |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
         |comp AS (SELECT id, min(comp)::bigint AS comp FROM reach GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
         |SELECT doc_id,
         |  CASE WHEN (('0x' || substr(md5(grp::varchar), 1, 8))::bigint % 100) < 10
         |       THEN 'test' ELSE 'train' END AS split
         |FROM lab ORDER BY doc_id""".stripMargin,

    // deterministic corpus shuffle: shard = md5 bucket of doc_id,
    // position = rank of salted md5 within the shard (hex strings are
    // ASCII, so varchar order matches Spark's binary string order)
    "t_shard" ->
      """SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard
        |    ORDER BY md5(doc_id::varchar || '|shuffle'), doc_id)::int AS pos
        |FROM (SELECT doc_id,
        |        (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 8)::int AS shard
        |      FROM documents)
        |ORDER BY shard, pos""".stripMargin,

    // overlapping token chunks: chunkSize 50, overlap 10 (stride 40);
    // chunk k covers tokens [1 + 40k, 1 + 40k + 49] clipped — mirrors
    // Chunker.chunkTokens (sequence inclusive end ≙ range exclusive +1)
    "t_chunks" ->
      s"""WITH tok AS (
         |  SELECT doc_id AS id, $toks AS toks FROM documents
         |  WHERE length(trim(text)) > 0),
         |st AS (
         |  SELECT id, toks, unnest(range(1, greatest(len(toks), 1) + 1, 40)) AS start
         |  FROM tok)
         |SELECT id, ((start - 1) // 40)::int AS chunk_idx,
         |  array_to_string(toks[start:(start + 49)], ' ') AS chunk_text,
         |  least(50, len(toks) - start + 1)::int AS n_tokens
         |FROM st ORDER BY id, chunk_idx""".stripMargin,

    // benchmark decontamination: corpus (bucket < 95) docs sharing >= 1
    // distinct word-8-gram with a test doc (bucket >= 95); same
    // token/shingle formulation as the jaccard oracles, same md5 bucket
    // split as t_sample
    "d_decontam" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, b, sh FROM (
         |    SELECT doc_id, b, unnest(list_transform(range(greatest(len($toks) - 7, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+8)], ' '))) AS sh
         |    FROM d))
         |SELECT c.doc_id AS id, t.doc_id AS test_id, count(*) AS shared
         |FROM sh c JOIN sh t ON c.sh = t.sh AND c.b < 95 AND t.b >= 95
         |GROUP BY 1, 2 HAVING count(*) >= 1
         |ORDER BY id, test_id""".stripMargin,

    // unigram LM score: mean -ln p(token) per doc under the corpus's
    // own lowercased-token distribution (mirrors
    // TextStats.unigramLogProb; both engines do float division and
    // natural log in double, rounded to 4)
    // verified heavy hitters: exact keys above 10% frequency with
    // in_sketch literally true (the Spark side computes it from the
    // Karp sketch's no-false-negatives guarantee; a sketch regression
    // flips the flag and fails the hash). Threshold multiplies in
    // double on both engines.
    "t_heavy" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |t AS (SELECT sum(cnt) AS n_total FROM c)
        |SELECT lang, cnt, true AS in_sketch
        |FROM c CROSS JOIN t WHERE cnt > n_total * 0.10::double
        |ORDER BY lang""".stripMargin,

    // interpolated bigram LM (λ=0.7 bigram MLE + 0.3 Laplace unigram):
    // (prev, t) pairs from the token list zipped with its shifted self
    // (BOS '<s>' for each doc's first token), context totals = Σ
    // bigrams per prev; (1 - 0.7::double) reproduces Scala's 1-0.7
    // IEEE subtraction so both engines mix with the identical double
    "t_bigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT id, s.prev AS prev, s.t AS t FROM (
        |    SELECT id, unnest(list_transform(range(len(toks)),
        |      i -> {'prev': CASE WHEN i = 0 THEN '<s>' ELSE toks[i] END,
        |            't': toks[i+1]})) AS s
        |    FROM tok)),
        |uni AS (SELECT t, count(*) AS cnt FROM p GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total, count(*) AS v FROM uni),
        |big AS (SELECT prev, t, count(*) AS cnt2 FROM p GROUP BY prev, t),
        |ctx AS (SELECT prev, sum(cnt2) AS prev_tot FROM big GROUP BY prev)
        |SELECT id,
        |  round(avg(-ln(0.7::double * (cnt2 / prev_tot) +
        |               (1 - 0.7::double) * ((cnt + 1) / (n_total + v)))), 4) AS mean_nll,
        |  count(*) AS n_tokens
        |FROM p JOIN big USING (prev, t) JOIN ctx USING (prev) JOIN uni USING (t)
        |CROSS JOIN tot
        |GROUP BY id ORDER BY id""".stripMargin,

    // interpolated trigram LM (CCNet ladder rung 3): double-BOS
    // triples from the token list, observed-trigram/bigram tables with
    // context roll-ups, λ mixture with the SAME literal composition
    // ((1 - 0.5::double - 0.3::double)) as the Spark plan.
    // SHAPE MATTERS: the r10 form joined p to five lookup tables in
    // one FROM clause and DuckDB's optimizer cross-multiplied the
    // context tables on hot tokens (>55 GB RSS, never finished —
    // zeroed the round's correctness file). This form is a chain of
    // strictly two-table many-to-one MATERIALIZED steps (context
    // totals folded into tri/big as window sums), so there is no
    // join-order freedom left to explode. Values are bit-identical:
    // same operand types (BIGINT count / HUGEINT sum → double
    // division), same mixture literals, one final round(4).
    "t_trigram_lm" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |p AS MATERIALIZED (
        |  SELECT id, s.p2 AS p2, s.p1 AS p1, s.t AS t FROM (
        |    SELECT id, unnest(list_transform(range(len(toks)),
        |      i -> {'p2': CASE WHEN i <= 1 THEN '<s>' ELSE toks[i-1] END,
        |            'p1': CASE WHEN i = 0 THEN '<s>' ELSE toks[i] END,
        |            't': toks[i+1]})) AS s
        |    FROM tok)),
        |uni AS MATERIALIZED (SELECT t, count(*) AS cnt FROM p GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total, count(*) AS v FROM uni),
        |tri AS MATERIALIZED (
        |  SELECT p2, p1, t, cnt3, sum(cnt3) OVER (PARTITION BY p2, p1) AS p2_tot
        |  FROM (SELECT p2, p1, t, count(*) AS cnt3 FROM p GROUP BY p2, p1, t)),
        |big AS MATERIALIZED (
        |  SELECT p1, t, cnt2, sum(cnt2) OVER (PARTITION BY p1) AS p1_tot
        |  FROM (SELECT p1, t, count(*) AS cnt2 FROM p GROUP BY p1, t)),
        |s3 AS MATERIALIZED (
        |  SELECT id, p1, t, cnt3 / p2_tot AS pr3
        |  FROM p JOIN tri USING (p2, p1, t)),
        |s2 AS MATERIALIZED (
        |  SELECT id, t, pr3, cnt2 / p1_tot AS pr2
        |  FROM s3 JOIN big USING (p1, t))
        |SELECT id,
        |  round(avg(-ln(0.5::double * pr3 +
        |               0.3::double * pr2 +
        |               (1 - 0.5::double - 0.3::double) *
        |                 ((cnt + 1) / (n_total + v)))), 4) AS mean_nll,
        |  count(*) AS n_tokens
        |FROM s2 JOIN uni USING (t)
        |CROSS JOIN tot
        |GROUP BY id ORDER BY id""".stripMargin,

    // BM25 top-10 (Okapi ranking, Robertson idf) for the fixed query
    // {vector, stream, merge}: identical literal composition to the
    // Spark plan ((1.2::double + 1), (1 - 0.75::double)); scores
    // rounded to 4 BEFORE the rank so sum-order ulps can't flip top-k
    "t_bm25" ->
      """WITH b2 AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS tk,
        |    len(string_split_regex(trim(lower(text)), '\s+'))::double AS dl
        |  FROM documents),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM b2),
        |occ AS (SELECT id, dl, unnest(tk) AS t FROM b2),
        |tf AS (
        |  SELECT id, t, count(*) AS tf, min(dl) AS dl FROM occ
        |  WHERE t IN ('vector', 'stream', 'merge') GROUP BY id, t),
        |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |scored AS (
        |  SELECT id, round(sum(
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    (tf * (1.2::double + 1)) /
        |    (tf + 1.2::double * (1 - 0.75::double + 0.75::double * dl / avgdl))), 4) AS score
        |  FROM tf JOIN dft USING (t) CROSS JOIN stats GROUP BY id)
        |SELECT row_number() OVER (ORDER BY score DESC, id) AS rnk, id, score
        |FROM (SELECT * FROM scored ORDER BY score DESC, id LIMIT 10)
        |ORDER BY rnk""".stripMargin,

    // hybrid retrieval: RRF fusion (1/(60+rnk) per leg, fixed
    // lex-then-vec add order) of the t_bm25 lexical leg at top-50 and
    // the vec-0 brute-force cosine leg at top-50; every stage ranks by
    // a ROUNDED score with the id tie-break, so the fused top-10 is a
    // full hash oracle
    "s_rrf" ->
      """WITH b2 AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS tk,
        |    len(string_split_regex(trim(lower(text)), '\s+'))::double AS dl
        |  FROM documents),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM b2),
        |occ AS (SELECT id, dl, unnest(tk) AS t FROM b2),
        |tf AS (
        |  SELECT id, t, count(*) AS tf, min(dl) AS dl FROM occ
        |  WHERE t IN ('vector', 'stream', 'merge') GROUP BY id, t),
        |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |bscored AS (
        |  SELECT id, round(sum(
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |    (tf * (1.2::double + 1)) /
        |    (tf + 1.2::double * (1 - 0.75::double + 0.75::double * dl / avgdl))), 4) AS bscore
        |  FROM tf JOIN dft USING (t) CROSS JOIN stats GROUP BY id),
        |lex AS (
        |  SELECT row_number() OVER (ORDER BY bscore DESC, id) AS rnk, id
        |  FROM (SELECT * FROM bscored ORDER BY bscore DESC, id LIMIT 50)),
        |e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        |cscored AS (
        |  SELECT c.vec_id AS id,
        |    round(list_inner_product(q.v, c.v) /
        |      (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))), 6) AS cos
        |  FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> 0),
        |vec AS (
        |  SELECT row_number() OVER (ORDER BY cos DESC, id) AS rnk, id
        |  FROM (SELECT * FROM cscored ORDER BY cos DESC, id LIMIT 50)),
        |fused AS (
        |  SELECT id,
        |    round(coalesce(1.0::double / (60 + l.rnk), 0) +
        |          coalesce(1.0::double / (60 + v.rnk), 0), 6) AS score
        |  FROM lex l FULL OUTER JOIN vec v USING (id))
        |SELECT row_number() OVER (ORDER BY score DESC, id) AS rnk, id, score
        |FROM (SELECT * FROM fused ORDER BY score DESC, id LIMIT 10)
        |ORDER BY rnk""".stripMargin,

    // label-centroid outlier audit: centroids accumulated FIXED-POINT
    // (sum of round(v*1e6) in BIGINT — exact, order-independent; the
    // reason this is hashable while a double avg is not), cosine of
    // each vector to its own-label centroid via the sequential
    // list_inner_product, rounded 6 with the -0.0 normalization
    "s_centroid" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding::double[]) AS v,
        |    unnest(range(len(embedding))) AS dim FROM embeddings),
        |cd AS (
        |  SELECT label, dim,
        |    (sum(CAST(round(v * 1000000) AS BIGINT)))::double /
        |      (count(*) * 1000000) AS c
        |  FROM ex GROUP BY label, dim),
        |cent AS (SELECT label, list(c ORDER BY dim) AS cvec FROM cd GROUP BY label)
        |SELECT e.vec_id AS id, e.label,
        |  round(list_inner_product(e.embedding::double[], c.cvec) /
        |    (sqrt(list_inner_product(e.embedding::double[], e.embedding::double[])) *
        |     sqrt(list_inner_product(c.cvec, c.cvec))), 6) + 0 AS cos,
        |  (round(list_inner_product(e.embedding::double[], c.cvec) /
        |    (sqrt(list_inner_product(e.embedding::double[], e.embedding::double[])) *
        |     sqrt(list_inner_product(c.cvec, c.cvec))), 6) + 0 < 0.0)::int AS outlier
        |FROM embeddings e JOIN cent c USING (label)
        |ORDER BY id""".stripMargin,

    // Gopher duplicate-trigram token fraction: grams with positions
    // from the token list, within-doc duplication via a (id, g) window
    // count, coverage = distinct expanded positions; docs shorter than
    // 3 tokens have no grams and score 0
    "t_dupgrams" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |t2 AS (SELECT id, tk, len(tk) AS l FROM tok),
        |ge AS (
        |  SELECT id, s.pos AS pos, s.g AS g FROM (
        |    SELECT id, unnest(list_transform(range(l - 2),
        |      i -> {'pos': i, 'g': array_to_string(tk[(i+1):(i+3)], ' ')})) AS s
        |    FROM t2 WHERE l >= 3)),
        |dup AS (
        |  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY id, g) AS c FROM ge)
        |  WHERE c > 1),
        |cov AS (
        |  SELECT id, count(DISTINCT p) AS dup_tokens FROM (
        |    SELECT id, unnest(range(pos, pos + 3)) AS p FROM dup) GROUP BY id)
        |SELECT t2.id, round(coalesce(dup_tokens, 0) / greatest(l, 1), 4) AS dup_frac,
        |  l::bigint AS n_tokens
        |FROM t2 LEFT JOIN cov USING (id) ORDER BY id""".stripMargin,

    // steady-state bigram scoring: LM tables from the 95% md5-bucket
    // corpus slice, batch = the 5% tail scored with LEFT joins — an
    // unseen bigram/context contributes 0 (coalesce) and the Laplace
    // unigram back-off keeps the mixture finite; identical literals
    // and association to t_bigram_lm
    "t_bigram_incr" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
        |  FROM documents),
        |cp AS (
        |  SELECT id, s.prev AS prev, s.t AS t FROM (
        |    SELECT doc_id AS id, unnest(list_transform(range(len(toks)),
        |      i -> {'prev': CASE WHEN i = 0 THEN '<s>' ELSE toks[i] END,
        |            't': toks[i+1]})) AS s
        |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |          FROM d WHERE b < 95))),
        |bp AS (
        |  SELECT id, s.prev AS prev, s.t AS t FROM (
        |    SELECT doc_id AS id, unnest(list_transform(range(len(toks)),
        |      i -> {'prev': CASE WHEN i = 0 THEN '<s>' ELSE toks[i] END,
        |            't': toks[i+1]})) AS s
        |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |          FROM d WHERE b >= 95))),
        |uni AS (SELECT t, count(*) AS cnt FROM cp GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total, count(*) AS v FROM uni),
        |big AS (SELECT prev, t, count(*) AS cnt2 FROM cp GROUP BY prev, t),
        |ctx AS (SELECT prev, sum(cnt2) AS prev_tot FROM big GROUP BY prev)
        |SELECT id,
        |  round(avg(-ln(0.7::double * coalesce(cnt2 / prev_tot, 0) +
        |               (1 - 0.7::double) * ((coalesce(cnt, 0) + 1) / (n_total + v)))), 4)
        |    AS mean_nll,
        |  count(*) AS n_tokens
        |FROM bp LEFT JOIN big USING (prev, t) LEFT JOIN ctx USING (prev)
        |LEFT JOIN uni USING (t) CROSS JOIN tot
        |GROUP BY id ORDER BY id""".stripMargin,

    "t_unigram_lp" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |c AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        |tot AS (SELECT sum(cnt) AS n_total FROM c)
        |SELECT id, round(avg(-ln(cnt / n_total)), 4) AS mean_nll, count(*) AS n_tokens
        |FROM tok JOIN c USING (t) CROSS JOIN tot
        |GROUP BY id ORDER BY id""".stripMargin,

    // DSIR importance weights: mean ln-ratio of the src0 target LM vs
    // the corpus LM, Laplace-smoothed over the SHARED vocabulary —
    // identical arithmetic association to the Spark plan so the
    // round(. ,4) doubles compare bit-equal (same posture as
    // t_unigram_lp)
    "t_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |ttok AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents WHERE source = 'src0'),
        |cs AS (SELECT t, count(*) AS cnt_s FROM tok GROUP BY t),
        |ct AS (SELECT t, count(*) AS cnt_t FROM ttok GROUP BY t),
        |v AS (
        |  SELECT t, coalesce(cnt_s, 0) AS cnt_s, coalesce(cnt_t, 0) AS cnt_t
        |  FROM cs FULL OUTER JOIN ct USING (t)),
        |tot AS (SELECT sum(cnt_s) AS tot_s, sum(cnt_t) AS tot_t, count(*) AS v FROM v)
        |SELECT id,
        |  round(avg(ln((cnt_t + 1) / (tot_t + v)) - ln((cnt_s + 1) / (tot_s + v))), 4)
        |    + 0 AS mean_llr,
        |  count(*) AS n_tokens
        |FROM tok JOIN v USING (t) CROSS JOIN tot
        |GROUP BY id ORDER BY id""".stripMargin,

    // top-3 tf-idf terms per doc, idf = ln((N+1)/(df+1)) + 1; the rank
    // orders by round(score, 6) with the term as tie-break so ulp-level
    // ln() differences between engines cannot flip it
    "t_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT id, t, count(*) AS tf FROM tok GROUP BY id, t),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (
        |  SELECT id, t, tf * (ln((n_docs + 1) / (df + 1)) + 1) AS score
        |  FROM tf JOIN df USING (t) CROSS JOIN nd),
        |r AS (
        |  SELECT id, t, score,
        |    row_number() OVER (PARTITION BY id ORDER BY round(score, 6) DESC, t) AS rnk
        |  FROM s)
        |SELECT id, rnk::int AS rnk, t AS term, round(score, 4) AS tfidf
        |FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin,

    // aligned shared passages: positional winnow prints (k=24-gram md5
    // bigints, window 8, FIRST in-window occurrence of the min as the
    // position tie rule — matches Text.winnowMinsPos), doc-frequency
    // cap 20 (distinct docs), pairs grouped by alignment diagonal
    // (pos_a - pos_b), >= 5 prints on one diagonal; spans cover
    // [min,max] print positions + k-1 chars
    "d_passages" ->
      """WITH t AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(range(len(t) - 23),
        |    i -> ('0x' || substr(md5(substr(t, i + 1, 24)), 1, 15))::bigint) AS hs
        |  FROM t WHERE len(t) >= 24),
        |win AS (
        |  SELECT doc_id, unnest(list_transform(range(len(hs) - 7), w ->
        |    {'pos': (w + list_position(hs[(w + 1):(w + 8)], list_min(hs[(w + 1):(w + 8)])))::int,
        |     'p': list_min(hs[(w + 1):(w + 8)])})) AS s
        |  FROM h WHERE len(hs) >= 8),
        |pr AS (SELECT DISTINCT doc_id, s.pos AS pos, s.p AS p FROM win),
        |capped AS (
        |  SELECT * FROM pr WHERE p NOT IN (
        |    SELECT p FROM pr GROUP BY p HAVING count(DISTINCT doc_id) > 20)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    (a.pos - b.pos)::int AS d, a.pos AS pos
        |  FROM capped a JOIN capped b ON a.p = b.p AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, count(*) AS prints,
        |  min(pos)::int AS a_start, (max(pos) + 23)::int AS a_end,
        |  (min(pos) - d)::int AS b_start, (max(pos) + 23 - d)::int AS b_end
        |FROM pairs GROUP BY id_a, id_b, d HAVING count(*) >= 5
        |ORDER BY id_a, id_b, a_start, b_start""".stripMargin,

    // ExactSubstr duplicate spans (Lee et al. 2021): md5 token 5-grams,
    // a gram is duplicated iff seen in ≥ 2 distinct docs; maximal runs
    // of ≥ 4 consecutive duplicated grams (gaps-and-islands on
    // pos − row_number) → inclusive token spans of ≥ 8 tokens
    "d_substr_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(len(toks) - 4),
         |    i -> {'pos': i::int, 'h': md5(array_to_string(toks[i+1:i+5], ' '))})) AS s
         |  FROM t WHERE len(toks) >= 5),
         |gr AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM g),
         |d AS (
         |  SELECT doc_id, pos FROM gr WHERE h IN (
         |    SELECT h FROM gr GROUP BY h HAVING count(DISTINCT doc_id) >= 2)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM d)
         |SELECT doc_id, min(pos)::int AS start_tok, (max(pos) + 4)::int AS end_tok,
         |  count(*) AS n_grams
         |FROM isl GROUP BY doc_id, grp HAVING count(*) >= 4
         |ORDER BY doc_id, start_tok""".stripMargin,

    // incremental ExactSubstr: batch = hash bucket ≥ 95 (the
    // d_incr_lines split), duplicated iff the gram exists in the
    // corpus slice OR in ≥ 2 distinct batch docs; same island rule
    "d_incr_substr" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks,
         |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, b, unnest(list_transform(range(len(toks) - 4),
         |    i -> {'pos': i::int, 'h': md5(array_to_string(toks[i+1:i+5], ' '))})) AS s
         |  FROM t WHERE len(toks) >= 5),
         |gr AS (SELECT doc_id, b, s.pos AS pos, s.h AS h FROM g),
         |bg AS (SELECT doc_id, pos, h FROM gr WHERE b >= 95),
         |d AS (
         |  SELECT doc_id, pos FROM bg
         |  WHERE h IN (SELECT h FROM gr WHERE b < 95)
         |     OR h IN (SELECT h FROM bg GROUP BY h HAVING count(DISTINCT doc_id) >= 2)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM d)
         |SELECT doc_id, min(pos)::int AS start_tok, (max(pos) + 4)::int AS end_tok,
         |  count(*) AS n_grams
         |FROM isl GROUP BY doc_id, grp HAVING count(*) >= 4
         |ORDER BY doc_id, start_tok""".stripMargin,

    // the remediation: rebuild each doc from the tokens NOT covered by
    // any duplicated span; a fully-duplicated doc survives with empty
    // text (LEFT JOIN + coalesce mirrors the Spark null-span path)
    "d_substr_removed" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(len(toks) - 4),
         |    i -> {'pos': i::int, 'h': md5(array_to_string(toks[i+1:i+5], ' '))})) AS s
         |  FROM t WHERE len(toks) >= 5),
         |gr AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM g),
         |d AS (
         |  SELECT doc_id, pos FROM gr WHERE h IN (
         |    SELECT h FROM gr GROUP BY h HAVING count(DISTINCT doc_id) >= 2)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM d),
         |sp AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
         |  FROM isl GROUP BY doc_id, grp HAVING count(*) >= 4),
         |tk AS (
         |  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(toks)),
         |      i -> {'pos': i::int, 'tok': toks[i+1]})) AS u
         |    FROM t)),
         |kept AS (
         |  SELECT tk.doc_id AS doc_id, tk.pos AS pos, tk.tok AS tok FROM tk
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tk.doc_id AND tk.pos BETWEEN sp.s AND sp.e)),
         |r AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(r.text, '') AS text,
         |  coalesce(r.n_kept, 0)::bigint AS n_kept, len(t.toks)::bigint AS n_toks
         |FROM t LEFT JOIN r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // incremental exact dedup: 20% hash-bucket batch vs 80% corpus
    // (same md5-bucket split as t_sample); dup_of = min corpus doc_id
    // sharing the normalized-text fingerprint, NULL when novel. The
    // Spark side's bloom prefilter is invisible here by design: it has
    // no false negatives and the exact join kills false positives, so
    // the result equals this plain left join.
    "d_incremental" ->
      """WITH h AS (
        |  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
        |  FROM documents),
        |c AS (SELECT fp, min(doc_id) AS dup_of FROM h WHERE b >= 20 GROUP BY fp)
        |SELECT h.doc_id AS id, h.fp AS fp, c.dup_of AS dup_of
        |FROM h LEFT JOIN c USING (fp)
        |WHERE h.b < 20 ORDER BY id""".stripMargin,

    // incremental near-dup: cross-set minhash LSH (16 perms x 4 bands,
    // exact-jaccard verify >= 0.5), batch (bucket < 20) vs corpus
    // (bucket >= 20) — candidates only from batch x corpus buckets
    "d_incr_lsh" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) AS b
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, b, sh FROM (
         |    SELECT doc_id, b, unnest(list_transform(range(greatest(len($toks) - 2, 1)),
         |      i -> array_to_string(($toks)[(i+1):(i+3)], ' '))) AS sh
         |    FROM d)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |h AS (
         |  SELECT doc_id, b, i,
         |    min(('0x' || substr(md5(i::varchar || '|' || (('0x' || substr(md5(sh), 1, 15))::bigint)::varchar), 1, 15))::bigint) AS mh
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, b, i),
         |sig AS (
         |  SELECT doc_id, b, i // 4 AS band, md5(string_agg(mh::varchar, '|' ORDER BY i)) AS bsig
         |  FROM h GROUP BY doc_id, b, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id, c.doc_id AS dup_of
         |  FROM sig a JOIN sig c ON a.band = c.band AND a.bsig = c.bsig
         |  WHERE a.b < 20 AND c.b >= 20),
         |inter AS (
         |  SELECT id, dup_of, count(*) AS i FROM cand
         |  JOIN sh sa ON sa.doc_id = id
         |  JOIN sh sb ON sb.doc_id = dup_of AND sa.sh = sb.sh
         |  GROUP BY id, dup_of)
         |SELECT * FROM (
         |  SELECT id, dup_of, round(i / (na.n + nb.n - i), 4) AS jaccard
         |  FROM inter JOIN sz na ON id = na.doc_id JOIN sz nb ON dup_of = nb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY id, dup_of""".stripMargin,

    // the Spark side computes real recall of the trained IVF index vs
    // its in-plan brute-force baseline; the oracle pins the asserted
    // outcome (10 queries evaluated, recall@5 ≥ 0.5 held)
    "s_ann_ivf_trained" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // PQ: same recall-gate shape — the Spark side computes recall@5 of
    // the ADC+refine search against its own exact-L2 brute force and
    // asserts the threshold in-plan
    "s_ann_pq" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // composed IVF×PQ: same recall-gate shape — the Spark side computes
    // recall@5 of the cell-probed ADC + exact refine against its own
    // exact-L2 brute force and asserts the threshold in-plan
    "s_ann_ivfpq" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // persisted ANN index: same recall-gate shape — the Spark side
    // compacts the index to disk, answers the batch purely from the
    // prebuilt artifacts, and asserts recall@5 in-plan
    "s_ann_index" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "s_ann_query" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "s_ann_add" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // deletion semantics: recall over corpus-minus-removed AND the
    // literal no-tombstoned-id-in-any-answer flag must both hold
    "s_ann_remove" ->
      """SELECT count(DISTINCT vec_id)::bigint AS n_queries, true AS recall_ok,
        |  true AS none_removed
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // REAL decode gates: the Spark side synthesizes deterministic
    // PNG/animated-GIF bytes from doc ids (MultiModal.synthesizeOne's
    // formula contract) and recovers dims / frame counts / pixel sums
    // by actually decoding them; the oracle re-derives the same values
    // straight from the generator formulas — the encode→decode round
    // trip must be the identity
    "mm_meta" ->
      """SELECT doc_id, (8 + doc_id % 9)::int AS width,
        |  (6 + doc_id % 7)::int AS height,
        |  (CASE WHEN doc_id % 5 = 0 THEN 2 + doc_id % 3 ELSE 1 END)::int AS n_frames
        |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin,

    // exact per-channel integer sums over the decoded first frame:
    // PNG docs re-derive the gradient formulas pixel by pixel
    // (range() cross join + filter — w <= 16, h <= 12); GIF docs use
    // the solid-gray closed form w·h·(id%256)
    "mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 400),
        |png AS (
        |  SELECT d.doc_id, w::int AS width, h::int AS height, 1 AS n_frames,
        |    (w * h)::bigint AS n_px,
        |    sum((7 * x.i + 13 * y.i + doc_id) % 256)::bigint AS sum_r,
        |    sum((3 * x.i + 5 * y.i + 2 * doc_id) % 256)::bigint AS sum_g,
        |    sum((x.i + 11 * y.i + 5 * doc_id) % 256)::bigint AS sum_b
        |  FROM d CROSS JOIN range(16) x(i) CROSS JOIN range(12) y(i)
        |  WHERE x.i < w AND y.i < h AND doc_id % 5 <> 0
        |  GROUP BY d.doc_id, w, h),
        |gif AS (
        |  SELECT doc_id, w::int AS width, h::int AS height,
        |    (2 + doc_id % 3)::int AS n_frames, (w * h)::bigint AS n_px,
        |    (w * h * (doc_id % 256))::bigint AS sum_r,
        |    (w * h * (doc_id % 256))::bigint AS sum_g,
        |    (w * h * (doc_id % 256))::bigint AS sum_b
        |  FROM d WHERE doc_id % 5 = 0)
        |SELECT * FROM png UNION ALL SELECT * FROM gif ORDER BY doc_id""".stripMargin,

    // real per-frame decode: the PNG's single frame re-derives the
    // gradient pixel sums; every GIF frame is the solid-gray closed
    // form, one row per frame index
    "mm_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 400),
        |png AS (
        |  SELECT d.doc_id, 0 AS frame_idx, w::int AS width, h::int AS height,
        |    sum((7 * x.i + 13 * y.i + doc_id) % 256)::bigint AS sum_r,
        |    sum((3 * x.i + 5 * y.i + 2 * doc_id) % 256)::bigint AS sum_g,
        |    sum((x.i + 11 * y.i + 5 * doc_id) % 256)::bigint AS sum_b
        |  FROM d CROSS JOIN range(16) x(i) CROSS JOIN range(12) y(i)
        |  WHERE x.i < w AND y.i < h AND doc_id % 5 <> 0
        |  GROUP BY d.doc_id, w, h),
        |gif AS (
        |  SELECT doc_id, f.i::int AS frame_idx, w::int AS width, h::int AS height,
        |    (w * h * (doc_id % 256))::bigint AS sum_r,
        |    (w * h * (doc_id % 256))::bigint AS sum_g,
        |    (w * h * (doc_id % 256))::bigint AS sum_b
        |  FROM d CROSS JOIN range(4) f(i)
        |  WHERE doc_id % 5 = 0 AND f.i < 2 + doc_id % 3)
        |SELECT * FROM png UNION ALL SELECT * FROM gif
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // image near-dup: bits re-derived from the generator formulas —
    // grid=4 cell means of the gradient channels, normalized /255,
    // thresholded at 0.5 with the EXACT Spark op sequence
    // ((s/c)/255 - 0.5 > 0). Twins (2× NN upscale re-encodes, id+1e5)
    // have IDENTICAL features (integer replication is mean-invariant
    // when the grid divides the base dims — the fixture's dims%4=0
    // predicate), so their bit rows are the base rows re-keyed. With 6
    // bands over 48 bits, maxHamming=5 is pigeonhole-complete: every
    // hamming≤5 pair shares a band, so the oracle is the plain θ-join.
    "mm_neardup" ->
      """WITH ids AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 500 AND doc_id % 5 <> 0
        |    AND (8 + doc_id % 9) % 4 = 0 AND (6 + doc_id % 7) % 4 = 0),
        |d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM ids),
        |px AS (
        |  SELECT doc_id,
        |    least((y.i * 4) // h, 3) * 4 + least((x.i * 4) // w, 3) AS cell,
        |    (7 * x.i + 13 * y.i + doc_id) % 256 AS r,
        |    (3 * x.i + 5 * y.i + 2 * doc_id) % 256 AS g,
        |    (x.i + 11 * y.i + 5 * doc_id) % 256 AS b
        |  FROM d CROSS JOIN range(16) x(i) CROSS JOIN range(12) y(i)
        |  WHERE x.i < w AND y.i < h),
        |cells AS (
        |  SELECT doc_id, cell, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
        |    count(*) AS cnt
        |  FROM px GROUP BY doc_id, cell),
        |bits0 AS (
        |  SELECT doc_id, cell * 3 AS i,
        |    CASE WHEN sr::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END AS bit
        |  FROM cells
        |  UNION ALL SELECT doc_id, cell * 3 + 1,
        |    CASE WHEN sg::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END
        |  FROM cells
        |  UNION ALL SELECT doc_id, cell * 3 + 2,
        |    CASE WHEN sb::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END
        |  FROM cells),
        |allbits AS (
        |  SELECT doc_id, i, bit FROM bits0
        |  UNION ALL SELECT doc_id + 100000, i, bit FROM bits0),
        |sig AS (SELECT doc_id, list(bit ORDER BY i) AS bits
        |        FROM allbits GROUP BY doc_id)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    list_sum(list_transform(range(48),
        |      i -> abs(a.bits[i + 1] - b.bits[i + 1])))::bigint AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 5 ORDER BY id_a, id_b""".stripMargin,

    // frame-sequence near-dup: the temporal signature re-derived frame
    // by frame — v(id,f) = uint32(first 8 md5 hex of "id|f") % 256,
    // bit = frame brighter than mid-gray (6v > 765 ⇔ v >= 128, the
    // exact integer comparison the Spark side's signBits makes on
    // n_px·(6v−765)). Twins (2× upscale re-encodes, id+2e5) scale
    // every luminance value by 4: identical bits, rows re-keyed. With
    // maxHamming=0 banding has full recall, so the oracle is the plain
    // equal-signature θ-join.
    "mm_frames_neardup" ->
      """WITH ids AS (
        |  SELECT doc_id FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0),
        |bits0 AS (
        |  SELECT doc_id, f.i AS f,
        |    CASE WHEN ('0x' || substr(md5(doc_id || '|' || f.i), 1, 8))::bigint
        |      % 256 >= 128 THEN 1 ELSE 0 END AS bit
        |  FROM ids CROSS JOIN range(24) f(i)),
        |allbits AS (
        |  SELECT doc_id, f, bit FROM bits0
        |  UNION ALL SELECT doc_id + 200000, f, bit FROM bits0),
        |sig AS (SELECT doc_id, list(bit ORDER BY f) AS bits
        |        FROM allbits GROUP BY doc_id)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    list_sum(list_transform(range(24),
        |      i -> abs(a.bits[i + 1] - b.bits[i + 1])))::bigint AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 0 ORDER BY id_a, id_b""".stripMargin,

    // audio decode: the WAV round trip re-derived sample by sample
    // from the generator formulas (AudioModal.synthesizeWavOne) —
    // channels 1+id%2, rate 8000+1000*(id%3), frames 200+id%57,
    // sample(t,c) = (13t+7c+id)%4001-2000. Energy windows use the
    // same integer cell rule as the image grid (t*4//n, capped).
    "mm_audio" ->
      """WITH d AS (
        |  SELECT doc_id, 1 + doc_id % 2 AS ch,
        |    8000 + 1000 * (doc_id % 3) AS rate, 200 + doc_id % 57 AS n
        |  FROM documents WHERE doc_id < 400),
        |s AS (
        |  SELECT d.doc_id, ch, rate, n, t.i AS t,
        |    (13 * t.i + doc_id) % 4001 - 2000 AS s0,
        |    CASE WHEN ch = 2 THEN (13 * t.i + 7 + doc_id) % 4001 - 2000
        |         ELSE 0 END AS s1
        |  FROM d CROSS JOIN range(257) t(i) WHERE t.i < n)
        |SELECT doc_id, max(rate)::int AS sample_rate, max(ch)::int AS channels,
        |  max(n)::bigint AS n_frames,
        |  sum(s0)::bigint AS sum_c0, sum(s1)::bigint AS sum_c1,
        |  sum(s0 * s0)::bigint AS ssq_c0, sum(s1 * s1)::bigint AS ssq_c1,
        |  sum(CASE WHEN least((t * 4) // n, 3) = 0 THEN s0 * s0 ELSE 0 END)::bigint AS w0,
        |  sum(CASE WHEN least((t * 4) // n, 3) = 1 THEN s0 * s0 ELSE 0 END)::bigint AS w1,
        |  sum(CASE WHEN least((t * 4) // n, 3) = 2 THEN s0 * s0 ELSE 0 END)::bigint AS w2,
        |  sum(CASE WHEN least((t * 4) // n, 3) = 3 THEN s0 * s0 ELSE 0 END)::bigint AS w3
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // THE FLAGSHIP COMPOSITION: the whole curation path in one oracle —
    // text funnel (quality/langid/top-fraction gates -> exact dedup ->
    // minhash-LSH 16 perms / 8 bands / theta=0.8 -> recursive-CTE
    // components -> redact -> md5 split), minus the image lane's
    // hamming<=5 losers (grid features re-derived from the synthesize
    // pixel formulas; 2x-upscale twins at base+1 share their base's
    // bits by the nested-floor identity mm_neardup pins), minus the
    // audio lane's exact-signature losers (md5-noise samples per
    // AudioModal.hashWavOne; sign-vs-mean of 32 integer energies as
    // 32*e > total — exact integer comparisons end to end). Every
    // formula matches its standalone gate's oracle.
    "mm_curation" ->
      """WITH RECURSIVE
        |tok AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    round(
        |      round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) * 0.4
        |      + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / len(toks), 1.0)) * 0.3
        |      + least(len(toks) / 50.0, 1.0) * 0.3, 4) AS q
        |  FROM tok),
        |langr AS (
        |  SELECT doc_id,
        |    round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> t IN ('the','a','an','and','of','to','in','is','that','it'))) / len(toks), 4) AS enr,
        |    round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> t IN ('der','die','das','und','ist','ein','zu','den','von','mit'))) / len(toks), 4) AS der,
        |    round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> t IN ('le','la','les','et','de','un','une','est','que','pour'))) / len(toks), 4) AS frr
        |  FROM tok),
        |rep AS (
        |  SELECT doc_id, round(max(c) / sum(c), 4) AS rep FROM (
        |    SELECT doc_id, t, count(*) AS c
        |    FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY doc_id, t)
        |  GROUP BY doc_id),
        |gated AS (
        |  SELECT t.doc_id, t.text, t.toks
        |  FROM tok t JOIN q USING (doc_id) JOIN langr USING (doc_id) JOIN rep USING (doc_id)
        |  WHERE q.q >= 0.30 AND enr > der AND enr > frr AND enr > 0 AND rep.rep <= 0.50),
        |fp AS (
        |  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM gated),
        |surv AS (
        |  SELECT g.* FROM gated g
        |  JOIN (SELECT doc_id FROM fp
        |        JOIN (SELECT fp, min(doc_id) AS mn FROM fp GROUP BY fp) m USING (fp)
        |        WHERE doc_id = mn) k USING (doc_id)),
        |ssh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(range(greatest(len(toks) - 2, 1)),
        |      i -> array_to_string(toks[(i+1):(i+3)], ' '))) AS sh
        |    FROM surv)),
        |ssz AS (SELECT doc_id, count(*) AS n FROM ssh GROUP BY doc_id),
        |mh AS (
        |  SELECT doc_id, i,
        |    min(('0x' || substr(md5(i::varchar || '|' || (('0x' || substr(md5(sh), 1, 15))::bigint)::varchar), 1, 15))::bigint) AS mh
        |  FROM ssh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bsig AS (
        |  SELECT doc_id, i // 2 AS band, md5(string_agg(mh::varchar, '|' ORDER BY i)) AS bsig
        |  FROM mh GROUP BY doc_id, i // 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bsig a JOIN bsig b ON a.band = b.band AND a.bsig = b.bsig
        |    AND a.doc_id < b.doc_id),
        |minter AS (
        |  SELECT id_a, id_b, count(*) AS i FROM cand
        |  JOIN ssh sa ON sa.doc_id = id_a
        |  JOIN ssh sb ON sb.doc_id = id_b AND sa.sh = sb.sh
        |  GROUP BY id_a, id_b),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b, round(i / (na.n + nb.n - i), 4) AS j
        |    FROM minter JOIN ssz na ON id_a = na.doc_id JOIN ssz nb ON id_b = nb.doc_id)
        |  WHERE j >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT DISTINCT src AS id, src AS comp FROM edges
        |  UNION
        |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
        |dup AS (
        |  SELECT id FROM (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |  WHERE comp <> id),
        |curated AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS text,
        |    len(toks)::bigint AS n_tokens,
        |    CASE WHEN (('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 100) < 10
        |         THEN 'test' ELSE 'train' END AS split
        |  FROM surv WHERE doc_id NOT IN (SELECT id FROM dup)),
        |iids AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id < 2000 AND doc_id % 5 <> 0
        |    AND (8 + doc_id % 9) % 4 = 0 AND (6 + doc_id % 7) % 4 = 0),
        |idm AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM iids),
        |px AS (
        |  SELECT doc_id,
        |    least((y.i * 4) // h, 3) * 4 + least((x.i * 4) // w, 3) AS cell,
        |    (7 * x.i + 13 * y.i + doc_id) % 256 AS r,
        |    (3 * x.i + 5 * y.i + 2 * doc_id) % 256 AS g,
        |    (x.i + 11 * y.i + 5 * doc_id) % 256 AS b
        |  FROM idm CROSS JOIN range(16) x(i) CROSS JOIN range(12) y(i)
        |  WHERE x.i < w AND y.i < h),
        |icells AS (
        |  SELECT doc_id, cell, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
        |    count(*) AS cnt
        |  FROM px GROUP BY doc_id, cell),
        |ibits0 AS (
        |  SELECT doc_id, cell * 3 AS i,
        |    CASE WHEN sr::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END AS bit
        |  FROM icells
        |  UNION ALL SELECT doc_id, cell * 3 + 1,
        |    CASE WHEN sg::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END
        |  FROM icells
        |  UNION ALL SELECT doc_id, cell * 3 + 2,
        |    CASE WHEN sb::double / cnt / 255.0 - 0.5 > 0 THEN 1 ELSE 0 END
        |  FROM icells),
        |iall AS (
        |  SELECT doc_id, i, bit FROM ibits0
        |  UNION ALL SELECT doc_id + 1, i, bit FROM ibits0),
        |isig AS (SELECT doc_id, list(bit ORDER BY i) AS bits FROM iall GROUP BY doc_id),
        |ilosers AS (
        |  SELECT DISTINCT id_b FROM (
        |    SELECT b.doc_id AS id_b,
        |      list_sum(list_transform(range(48),
        |        i -> abs(a.bits[i + 1] - b.bits[i + 1])))::bigint AS hamming
        |    FROM isig a JOIN isig b ON a.doc_id < b.doc_id)
        |  WHERE hamming <= 5),
        |aids AS (
        |  SELECT doc_id, 200 + doc_id % 57 AS n FROM documents
        |  WHERE doc_id < 2000 AND doc_id % 22 = 0),
        |asamp AS (
        |  SELECT doc_id, n, t.i AS t,
        |    ('0x' || substr(md5(doc_id::varchar || '|' || t.i::varchar), 1, 8))::bigint
        |      % 4001 - 2000 AS s
        |  FROM aids CROSS JOIN range(257) t(i) WHERE t.i < n),
        |awin AS (
        |  SELECT doc_id, least((t * 32) // n, 31) AS w, sum(s * s) AS e
        |  FROM asamp GROUP BY doc_id, least((t * 32) // n, 31)),
        |abits AS (
        |  SELECT doc_id, w, CASE WHEN 32 * e > tot THEN 1 ELSE 0 END AS bit
        |  FROM awin JOIN (SELECT doc_id, sum(e) AS tot FROM awin GROUP BY doc_id) USING (doc_id)),
        |asig0 AS (SELECT doc_id, list(bit ORDER BY w) AS bits FROM abits GROUP BY doc_id),
        |aall AS (
        |  SELECT doc_id, bits FROM asig0
        |  UNION ALL SELECT doc_id + 11, bits FROM asig0),
        |alosers AS (
        |  SELECT DISTINCT b.doc_id AS id_b FROM aall a JOIN aall b
        |  ON a.bits = b.bits AND a.doc_id < b.doc_id)
        |SELECT * FROM curated
        |WHERE doc_id NOT IN (SELECT id_b FROM ilosers)
        |  AND doc_id NOT IN (SELECT id_b FROM alosers)
        |ORDER BY doc_id""".stripMargin,


    "q26_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(json_extract_string(props, '$.k')::int), 4) AS avg_k,
        |  max(json_extract_string(props, '$.k')::int) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q17_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id::bigint AS session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  )

  /** componentsStar must produce EXACTLY the labels of d_components
    * (same pair graph, same min-id contract) — the oracle is the same
    * recursive reach; only the Spark-side algorithm differs
    * (large-star/small-star alternation instead of hash-min rounds).
    * Likewise d_incr_steady must equal d_incr_lines bit for bit: same
    * incremental dedup semantics, the corpus side merely comes from
    * the prebuilt persisted index instead of an in-query compaction. */
  val sql: Map[String, String] =
    base +
      ("d_components_star" -> base("d_components")) +
      ("d_incr_steady" -> base("d_incr_lines"))
}
