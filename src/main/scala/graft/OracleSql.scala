package graft

/** DuckDB oracle SQL, one entry per SQL-expressible query in
  * [[SparkEntry.queries]]. Column aliases, rounding, casts, and ORDER BY
  * mirror the Spark plans exactly (see determinism notes on SparkEntry).
  * Approximate/engine-internal queries (LSH, HLL, footer stats, multimodal)
  * are intentionally absent → the driver applies its weaker rows-only check.
  */
object OracleSql {

  /** Supplier node-id offset in the graph lanes — 2^40, far above any
    * o_custkey at any TPC-H scale factor, so the customer and supplier
    * node-id spaces stay disjoint (must equal
    * `SparkEntry.SuppNodeOffset`). */
  private val SuppNodeOffset: Long = 1L << 40

  val all: Map[String, String] = Map(
    "q174_bpe_tokens" -> q174BpeTokens,
    "q175_bpe_chunks" -> q175BpeChunks,
    "q210_bpe_byte" -> q210BpeByte,

    // q211: the oracle retrains the identical stupid-backoff LM — same
    // trim/lower/\s+ tokenizer, same clean-split, same count tables,
    // same backoff chain with alpha=0.4; backoff-level counts are exact
    // integers, nll/ppl follow the q88 ln-agreement discipline
    "q211_backoff_ppl" -> q211BackoffPpl,

    // q212: the ppl gate composed with the Gopher gate per source —
    // the backoff chain (q211's) and the gopher replay (q132's) feed
    // one per-source rollup
    "q212_ppl_quality_gate" -> q212PplQualityGate,


    // q176: exact quartiles are recomputed; the sketch's rank-ε flag is
    // the q40 discipline — accuracy 10000 bounds rank error under one
    // row at this scale, so it pins to 1
    "q176_approx_percentile" -> """
      SELECT o_orderstatus,
        CAST(round(quantile_cont(o_totalprice, 0.25), 4) AS DOUBLE) AS p25,
        CAST(round(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS p50,
        CAST(round(quantile_cont(o_totalprice, 0.75), 4) AS DOUBLE) AS p75,
        CAST(1 AS INT) AS sketch_ok
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // q177: the same deterministic HTML wrap, then the extractor's
    // rule chain replayed verbatim (DuckDB regexp_replace needs 'g' —
    // Spark's replaces all by default)
    "q177_html_extract" -> """
      WITH h AS (SELECT doc_id,
        '<html><head><title>T</title><style>p{color:red}</style>'
        || '<script type="text/javascript">var x = 1 < 2;</script></head>'
        || '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
        || '<!-- hidden --><p>A &amp; B &lt;tag&gt; &quot;q&quot; '
        || '&#39;s&#39;&nbsp;end</p><div>' || text
        || '</div><P CLASS="x">tail<br/>line</P></body></html>' AS html
        FROM documents),
      s1 AS (SELECT doc_id,
        regexp_replace(html, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g')
          AS t FROM h),
      s2 AS (SELECT doc_id,
        regexp_replace(t, '(?is)<style\b[^>]*>.*?</style>', ' ', 'g')
          AS t FROM s1),
      s3 AS (SELECT doc_id,
        regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
      s4 AS (SELECT doc_id, regexp_replace(t,
        '(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|pre|section|article|header|footer|nav|head|body|html|title)\b[^>]*>',
        chr(10), 'g') AS t FROM s3),
      s5 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t
             FROM s4),
      s6 AS (SELECT doc_id,
        replace(replace(replace(replace(replace(replace(t,
          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          '&#39;', ''''), '&amp;', '&') AS t FROM s5),
      clean AS (SELECT doc_id,
        array_to_string(list_filter(list_transform(string_split(t, chr(10)),
          b -> trim(regexp_replace(b, '\s+', ' ', 'g'))), b -> b <> ''),
          chr(10)) AS text_clean FROM s6)
      SELECT doc_id,
        CAST(CASE WHEN text_clean = '' THEN 0
             ELSE len(string_split(text_clean, chr(10))) END AS BIGINT)
          AS n_blocks,
        CAST(CASE WHEN trim(text_clean) = '' THEN 0
          ELSE coalesce(list_sum(list_transform(
            string_split_regex(trim(text_clean), '\s+'), w ->
            coalesce(list_sum(list_transform(
              regexp_extract_all(w, '[A-Za-z]+'), r -> (length(r)+3)//4)), 0)
            + length(regexp_replace(w, '[^0-9]', '', 'g'))
            + length(regexp_replace(w, '[A-Za-z0-9]', '', 'g')))), 0) END
          AS BIGINT) AS est_tokens,
        text_clean
      FROM clean ORDER BY doc_id""",

    // q178: the same five planted URL spellings per logical page, the
    // same canonicalization rules (lowercase scheme/host, fragment and
    // default-port strip, trailing-slash and query-param-order
    // normalization), then the exact-dedup counts
    "q178_url_dedup" -> """
      WITH v AS (SELECT doc_id, doc_id % 20 AS page,
        (doc_id // 20) % 5 + 1 AS vi FROM documents),
      h AS (SELECT *, ['en.wikipedia.org','github.com','data.example.com',
          'blog.example.net','arxiv.org'][CAST(page % 5 + 1 AS INT)] AS host
        FROM v),
      u AS (SELECT doc_id, CASE vi
          WHEN 1 THEN 'https://' || host || '/doc/' || CAST(page AS VARCHAR) || '?b=2&a=1'
          WHEN 2 THEN 'HTTPS://' || upper(host) || '/doc/' || CAST(page AS VARCHAR) || '?a=1&b=2#frag'
          WHEN 3 THEN 'https://' || host || ':443/doc/' || CAST(page AS VARCHAR) || '?b=2&a=1'
          WHEN 4 THEN 'https://' || host || '/doc/' || CAST(page AS VARCHAR) || '/?a=1&b=2'
          ELSE 'https://' || host || '/doc/' || CAST(page AS VARCHAR) || '#x' END AS url
        FROM h),
      c1 AS (SELECT doc_id, trim(url) AS u0 FROM u),
      c2 AS (SELECT doc_id, u0, regexp_replace(u0, '#.*', '') AS nf FROM c1),
      c3 AS (SELECT doc_id, u0, nf,
        lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM c2),
      c4 AS (SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
        regexp_replace(rest, '^[^/?]*', '') AS pathq FROM c3),
      c5 AS (SELECT *,
        CASE scheme WHEN 'http' THEN regexp_replace(hostport, ':80$', '')
                    WHEN 'https' THEN regexp_replace(hostport, ':443$', '')
                    ELSE hostport END AS host2,
        regexp_extract(pathq, '^([^?]*)', 1) AS path,
        regexp_replace(regexp_replace(pathq, '^[^?]*', ''), '^\?', '') AS qbody
        FROM c4),
      c6 AS (SELECT *,
        CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(path, '/+$', '') END AS pathn,
        CASE WHEN qbody = '' THEN ''
             ELSE '?' || array_to_string(list_sort(string_split(qbody, '&')), '&')
             END AS qnorm FROM c5),
      c AS (SELECT doc_id,
        CASE WHEN scheme = '' THEN u0
             ELSE scheme || '://' || host2 || pathn || qnorm END AS canonical_url
        FROM c6)
      SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_variants,
        min(doc_id) AS keeper_doc
      FROM c GROUP BY canonical_url ORDER BY canonical_url""",

    // q179: both retrievals are exact brute-force rankings (full vs
    // 8-dim-truncated vectors), so recall@10 replays verbatim; the
    // query_id = -1 row is the mean
    "q179_recall_at_k" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      st AS (SELECT qid, vec_id AS cid,
        row_number() OVER (PARTITION BY qid
          ORDER BY list_cosine_similarity(v, qv) DESC, vec_id) AS rn
        FROM e, q WHERE vec_id <> qid),
      truth AS (SELECT qid, cid FROM st WHERE rn <= 10),
      e8 AS (SELECT vec_id, v[1:8] AS v FROM e),
      q8 AS (SELECT vec_id AS qid, v AS qv FROM e8 WHERE vec_id < 10),
      sa AS (SELECT qid, vec_id AS cid,
        row_number() OVER (PARTITION BY qid
          ORDER BY list_cosine_similarity(v, qv) DESC, vec_id) AS rn
        FROM e8, q8 WHERE vec_id <> qid),
      ann AS (SELECT qid, cid FROM sa WHERE rn <= 10),
      hits AS (SELECT t.qid, CAST(count(a.cid) AS BIGINT) AS n_hits
               FROM truth t LEFT JOIN ann a ON a.qid = t.qid AND a.cid = t.cid
               GROUP BY t.qid),
      per AS (SELECT CAST(qid AS BIGINT) AS query_id, n_hits,
        CAST(n_hits * 1000000 // 10 AS BIGINT) AS recall_micros FROM hits)
      SELECT * FROM per
      UNION ALL
      SELECT CAST(-1 AS BIGINT), CAST(sum(n_hits) AS BIGINT),
        CAST(sum(n_hits) * 1000000 // (10 * count(*)) AS BIGINT) FROM per
      ORDER BY query_id""",

    "q180_sentence_split" -> (s"""
      WITH $sentenceCtes,
      st AS (SELECT doc_id,
        CAST(len(sents) AS BIGINT) AS n_sentences,
        CAST(coalesce(list_sum(list_transform(sents,
          x -> len(string_split_regex(x, '\\s+')))), 0) AS BIGINT)
          AS n_words,
        CAST(coalesce(list_max(list_transform(sents,
          x -> len(string_split_regex(x, '\\s+')))), 0) AS BIGINT)
          AS max_sentence_words
        FROM ss)
      SELECT doc_id, n_sentences, n_words, max_sentence_words,
        CAST(CASE WHEN n_sentences > 0
          THEN n_words * 1000000 // n_sentences ELSE 0 END AS BIGINT)
          AS avg_sentence_words_micros
      FROM st ORDER BY doc_id"""),

    "q181_attribution" -> """
      WITH t AS (SELECT user_id, event_type AS tt, ts AS tts FROM events
                 WHERE event_type IN ('click', 'signup', 'view')),
      c AS (SELECT DISTINCT user_id, ts AS cts FROM events
            WHERE event_type = 'purchase'),
      j AS (SELECT c.user_id, c.cts, t.tt, t.tts
            FROM c LEFT JOIN t ON t.user_id = c.user_id
              AND t.tts <= c.cts AND t.tts > c.cts - INTERVAL 12 HOUR),
      r AS (SELECT user_id, cts, tt, tts,
        row_number() OVER (PARTITION BY user_id, cts
          ORDER BY tts, tt) AS rf,
        row_number() OVER (PARTITION BY user_id, cts
          ORDER BY tts DESC, tt DESC) AS rl,
        count(tt) OVER (PARTITION BY user_id, cts) AS nt
        FROM j)
      SELECT f.user_id,
        strftime(f.cts, '%Y-%m-%d %H:%M:%S') AS conv_ts,
        f.tt AS first_touch,
        strftime(f.tts, '%Y-%m-%d %H:%M:%S') AS first_touch_ts,
        l.tt AS last_touch,
        strftime(l.tts, '%Y-%m-%d %H:%M:%S') AS last_touch_ts,
        CAST(f.nt AS BIGINT) AS n_touches
      FROM (SELECT * FROM r WHERE rf = 1) f
      JOIN (SELECT * FROM r WHERE rl = 1) l USING (user_id, cts)
      ORDER BY user_id, conv_ts""",

    // bloom_hit is pinned EQUAL to exact membership: no false negatives
    // by construction, and at 1<<18 bits / 4 lanes / <=300 keys the
    // false-positive probability is ~1e-13 per probe (the q40/q41
    // pinned-flag discipline for sketch operators)
    "q182_bloom_membership" -> """
      WITH fp AS (SELECT doc_id, md5(array_to_string(
          string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f
        FROM documents),
      m AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0)
      SELECT doc_id AS probe_id,
        CAST(CASE WHEN f IN (SELECT f FROM m) THEN 1 ELSE 0 END AS INT)
          AS is_member,
        CAST(CASE WHEN f IN (SELECT f FROM m) THEN 1 ELSE 0 END AS INT)
          AS bloom_hit
      FROM fp ORDER BY probe_id""",

    "q183_sentence_chunks" -> (s"""
      WITH RECURSIVE $sentenceCtes,
      sr AS (SELECT doc_id,
        CAST(unnest(range(1, len(sents) + 1)) AS INT) AS pos,
        unnest(sents) AS sent
        FROM ss WHERE len(sents) > 0),
      sc AS (SELECT doc_id, pos, sent,
        CAST(len(string_split_regex(sent, '\\s+')) AS BIGINT) AS c
        FROM sr),
      rec AS (
        SELECT doc_id, pos, sent, c, c AS cum, 0 AS chunk_idx
        FROM sc WHERE pos = 1
        UNION ALL
        SELECT sc.doc_id, sc.pos, sc.sent, sc.c,
          CASE WHEN rec.cum + sc.c > 24 THEN sc.c
               ELSE rec.cum + sc.c END,
          CASE WHEN rec.cum + sc.c > 24 THEN rec.chunk_idx + 1
               ELSE rec.chunk_idx END
        FROM rec JOIN sc
          ON sc.doc_id = rec.doc_id AND sc.pos = rec.pos + 1)
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        CAST(sum(c) AS BIGINT) AS n_chunk_words,
        string_agg(sent, ' ' ORDER BY pos) AS chunk_text
      FROM rec GROUP BY doc_id, chunk_idx
      ORDER BY doc_id, chunk_idx"""),

    "q187_sql_subqueries" -> """
      SELECT c_custkey, c_mktsegment,
        (SELECT count(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS n_orders,
        (SELECT strftime(min(o.o_orderdate), '%Y-%m-%d')
          FROM orders o WHERE o.o_custkey = c.c_custkey) AS first_order,
        CAST(CASE WHEN EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
          THEN 1 ELSE 0 END AS INT) AS has_urgent
      FROM customer c
      WHERE c.c_custkey IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        AND NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderstatus = 'F' AND o.o_orderpriority = '5-LOW')
      ORDER BY c_custkey""",

    "q188_lateral_topk" -> """
      SELECT c.c_custkey, t.o_orderkey,
        strftime(t.o_orderdate, '%Y-%m-%d') AS order_date
      FROM customer c,
      LATERAL (SELECT o.o_orderkey, o.o_orderdate FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o.o_orderdate DESC, o.o_orderkey LIMIT 2) t
      WHERE c.c_custkey <= 200
      ORDER BY c.c_custkey, t.o_orderkey""",

    // the q66 closure CTEs feeding a size histogram; singletons from an
    // anti-membership count as size-1 clusters
    "q190_cluster_histogram" ->
      (shingleJaccardPairs(0.5, recursive = true) + """,
      e AS (SELECT id_a AS src, id_b AS dst FROM jp
            UNION SELECT id_b, id_a FROM jp),
      r(src, dst) AS (SELECT src, dst FROM e
                      UNION
                      SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
      comp AS (SELECT src AS id, least(src, min(dst)) AS c FROM r GROUP BY src),
      sizes AS (SELECT c, CAST(count(*) AS BIGINT) AS sz FROM comp GROUP BY c),
      multi AS (SELECT CAST(sz AS BIGINT) AS cluster_size,
        CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(sum(sz) AS BIGINT) AS n_docs
        FROM sizes GROUP BY sz),
      single AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
        CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(count(*) AS BIGINT) AS n_docs
        FROM documents WHERE doc_id NOT IN (SELECT id FROM comp))
      SELECT * FROM multi
      UNION ALL
      SELECT * FROM single WHERE n_clusters > 0
      ORDER BY cluster_size"""),

    "q191_bpe_train" -> q191BpeTrain,

    "q192_pagerank" -> q192PageRank,

    "q206_personalized_pr" -> q206PersonalizedPr,

    "q196_shortest_paths" -> q196ShortestPaths,

    "q209_weighted_paths" -> q209WeightedPaths,
    "q216_hits" -> q216Hits,
    "q218_label_propagation" -> q218LabelPropagation,

    // q219: the word distribution and the entropy algebra recomputed
    // verbatim — ln over exact integer counts (the q88 discipline),
    // ttr as the exact-integer anchor
    // q220: brute-forced containment over the twin-augmented corpus —
    // every pair compared (no size prefilter is valid for containment),
    // the prefix-half twin rule replayed verbatim
    "q220_containment" -> """
      WITH tw AS (
        SELECT doc_id + 3000000 AS doc_id,
          array_to_string(toks[1:CAST(len(toks) // 2 AS INT)], ' ') AS text
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents
              WHERE trim(text) <> '' AND doc_id % 25 = 0)
        WHERE len(toks) >= 8),
      d AS (SELECT doc_id, trim(lower(text)) AS t FROM (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM tw)),
      tk AS (SELECT doc_id,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks FROM d),
      sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) = 0 THEN []
               WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')) END) AS g
             FROM tk),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.g, b.g)) AS i,
              least(len(a.g), len(b.g)) AS m,
              len(a.g) AS la, len(b.g) AS lb
            FROM sh a, sh b WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        round(CAST(i AS DOUBLE) / m, 6) AS containment,
        CAST(CASE WHEN la < lb THEN id_a
                  WHEN lb < la THEN id_b
                  ELSE least(id_a, id_b) END AS BIGINT) AS contained_id
      FROM p WHERE m > 0 AND CAST(i AS DOUBLE) / m >= 0.9
      ORDER BY id_a, id_b""",

    // q221: the same brute-forced exact containment pairs as q220, plus
    // the PINNED recall flag — the capped prefix-filter discovery path
    // must recover >= 70% of them (the q44/q124 recall_ok discipline:
    // the exact side is recomputed, the discovery property is pinned)
    "q221_containment_discovery" -> """
      WITH tw AS (
        SELECT doc_id + 3000000 AS doc_id,
          array_to_string(toks[1:CAST(len(toks) // 2 AS INT)], ' ') AS text
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents
              WHERE trim(text) <> '' AND doc_id % 25 = 0)
        WHERE len(toks) >= 8),
      d AS (SELECT doc_id, trim(lower(text)) AS t FROM (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM tw)),
      tk AS (SELECT doc_id,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks FROM d),
      sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) = 0 THEN []
               WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')) END) AS g
             FROM tk),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.g, b.g)) AS i,
              least(len(a.g), len(b.g)) AS m,
              len(a.g) AS la, len(b.g) AS lb
            FROM sh a, sh b WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        round(CAST(i AS DOUBLE) / m, 6) AS containment,
        CAST(CASE WHEN la < lb THEN id_a
                  WHEN lb < la THEN id_b
                  ELSE least(id_a, id_b) END AS BIGINT) AS contained_id,
        CAST(1 AS INT) AS recall_ok
      FROM p WHERE m > 0 AND CAST(i AS DOUBLE) / m >= 0.9
      ORDER BY id_a, id_b""",

    "q219_token_entropy" -> """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        FROM documents),
      tw AS (SELECT doc_id, unnest(toks) AS w FROM t),
      tc AS (SELECT doc_id, w, count(*) AS c FROM tw GROUP BY 1, 2),
      per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS d,
          sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
        FROM tc GROUP BY 1)
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        CAST(coalesce(p.d, 0) AS BIGINT) AS n_distinct,
        round(ln(CAST(p.n AS DOUBLE)) - p.clnc / p.n, 6) AS entropy,
        CAST(CASE WHEN len(t.toks) > 0
             THEN (coalesce(p.d, 0) * 1000000) // len(t.toks)
             ELSE 0 END AS BIGINT) AS ttr_micros
      FROM t LEFT JOIN per p ON p.doc_id = t.doc_id
      ORDER BY t.doc_id""",

    // q217: the WHOLE KMV sketch replayed — portable polynomial hash
    // per user, k smallest distinct per type, union/intersection set
    // algebra, and the (k-1)·mod // h_k estimates; nothing pinned
    "q217_kmv_overlap" -> """
      WITH ud AS (SELECT event_type,
          CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y-%m-%d') AS uk
        FROM events),
      uh AS (
        SELECT DISTINCT event_type,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(uk) + 1),
              i -> CAST(unicode(substr(uk, CAST(i AS INT), 1)) AS BIGINT))),
            (h, c) -> (h * 131 + c) % 1000000007)
           * 2654435761 + 104729) % 1000000007 AS h
        FROM ud),
      rk AS (SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uh),
      sk AS (SELECT event_type, list(h ORDER BY h) AS s
        FROM rk WHERE rn <= 64 GROUP BY event_type),
      pairs AS (
        SELECT a.event_type AS type_a, a.s AS sa,
               b.event_type AS type_b, b.s AS sb
        FROM sk a JOIN sk b ON a.event_type < b.event_type),
      comb AS (SELECT type_a, type_b, sa, sb,
          list_sort(list_distinct(list_concat(sa, sb)))[1:64] AS u
        FROM pairs),
      est AS (SELECT type_a, type_b,
          CAST(CASE WHEN len(sa) < 64 THEN len(sa)
               ELSE (CAST(63 AS BIGINT) * 1000000007) // sa[64]
               END AS BIGINT) AS est_a,
          CAST(CASE WHEN len(sb) < 64 THEN len(sb)
               ELSE (CAST(63 AS BIGINT) * 1000000007) // sb[64]
               END AS BIGINT) AS est_b,
          CAST(CASE WHEN len(u) < 64 THEN len(u)
               ELSE (CAST(63 AS BIGINT) * 1000000007) // u[64]
               END AS BIGINT) AS est_union,
          CAST(len(list_filter(u, x ->
            list_contains(sa, x) AND list_contains(sb, x)))
            AS BIGINT) AS inter_k,
          CAST(len(u) AS BIGINT) AS denom_k
        FROM comb)
      SELECT type_a, type_b, est_a, est_b, est_union, inter_k, denom_k,
        CAST((inter_k * 1000000) // denom_k AS BIGINT) AS j_micros
      FROM est ORDER BY type_a, type_b""",

    // q213: TRUE components via an independent reachability closure —
    // not a replay of the star-contraction rounds, so a hash match
    // proves the algorithm correct on this graph
    "q213_connected_components" -> s"""
      WITH RECURSIVE e0 AS MATERIALIZED (
        SELECT o.o_custkey AS c, $SuppNodeOffset + l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      und AS MATERIALIZED (
        SELECT c AS u, sk AS v FROM e0 UNION SELECT sk, c FROM e0),
      r(a, b) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM und)
        UNION
        SELECT r.a, und.v FROM r JOIN und ON und.u = r.b)
      SELECT a AS node_id, CAST(min(b) AS BIGINT) AS component
      FROM r GROUP BY a ORDER BY node_id""",

    // q222: TRUE strongly connected components via an independent
    // mutual-reachability closure (forward closure self-joined on the
    // reversed pair) — not a replay of the coloring/peeling rounds, so
    // a hash match proves the algorithm correct on this graph
    "q222_scc" -> s"""
      WITH RECURSIVE ef AS MATERIALIZED (
        SELECT o.o_custkey AS u, $SuppNodeOffset + l.l_suppkey AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      eb AS MATERIALIZED (
        SELECT $SuppNodeOffset + l.l_suppkey AS u, o.o_custkey AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2 HAVING count(*) >= 2),
      ed AS MATERIALIZED (
        SELECT u, v FROM ef UNION SELECT u, v FROM eb),
      n AS (SELECT DISTINCT u FROM (
        SELECT u FROM ed UNION SELECT v FROM ed)),
      r(a, b) AS (
        SELECT u, u FROM n
        UNION
        SELECT r.a, ed.v FROM r JOIN ed ON ed.u = r.b)
      SELECT r1.a AS node_id, CAST(min(r1.b) AS BIGINT) AS scc
      FROM r r1 JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a
      GROUP BY r1.a ORDER BY node_id""",

    // the MAU contribution flip replayed: each distinct (user, day)
    // fans out to the 28 days it covers; DAU/MAU exact, ratio in
    // floor-micros
    "q208_stickiness" -> """
      WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                  FROM events),
      dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
              FROM ud GROUP BY d),
      mx AS (SELECT DISTINCT u, CAST(unnest(range(0, 28)) AS INT) AS k, d
             FROM ud),
      mau AS (SELECT day, CAST(count(*) AS BIGINT) AS mau FROM (
                SELECT DISTINCT u, d + to_days(k) AS day FROM mx)
              GROUP BY day)
      SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
        CAST((dau.dau * 1000000) // mau.mau AS BIGINT) AS stickiness_micros
      FROM dau JOIN mau ON mau.day = dau.day
      ORDER BY day""",

    // closed-form scene arithmetic: the two-scene fixture's only
    // frame-to-frame change is the splice at videoFrames(id) = 2+id%6;
    // one-scene controls (+3000000 ≡ 0 mod 6) have no cut
    "q207_scene_cuts" -> """
      SELECT doc_id AS media_id,
        CAST((2 + doc_id % 6) + (2 + (doc_id * 31 + 7) % 6) AS BIGINT)
          AS n_frames,
        CAST(1 AS BIGINT) AS n_cuts,
        CAST(2 + doc_id % 6 AS INT) AS first_cut
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 3000000,
        CAST(2 + doc_id % 6 AS BIGINT), CAST(0 AS BIGINT), CAST(-1 AS INT)
      FROM documents WHERE doc_id % 11 = 0
      ORDER BY media_id""",

    "q198_shard_assign" -> q198ShardAssign,

    "q202_token_mixture" -> q202TokenMixture,

    "q203_kcore" -> q203KCore,

    // brute-force every pair with DuckDB's levenshtein (identical
    // unit-cost semantics) — hash-matching proves the Spark side's
    // gram blocking is COMPLETE, not just its verification correct
    // the epoch explode, the fixed-point fractional threshold, and the
    // multiplicative keep-hash replayed verbatim; weight classes come
    // from the same last-char rule in both engines
    "q205_epoch_upsample" -> """
      WITH cl AS (SELECT doc_id, source,
          ascii(substr(source, length(source), 1)) % 3 AS c
        FROM documents),
      x AS (SELECT doc_id, source, c,
          CAST(unnest(range(CASE c WHEN 0 THEN 3 ELSE 1 END)) AS BIGINT)
            AS epoch
        FROM cl),
      k AS (SELECT source, epoch FROM x
        WHERE epoch < CASE c WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
           OR (epoch = CASE c WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
               AND (doc_id + 42 + epoch * 1000003) * 2654435761
                   % 2147483648 <
                   CASE c WHEN 0 THEN 1073741824
                          WHEN 1 THEN 0 ELSE 536870912 END))
      SELECT source, epoch, CAST(count(*) AS BIGINT) AS n_rows
      FROM k GROUP BY 1, 2 ORDER BY 1, 2""",

    "q204_fuzzy_join" -> """
      WITH ks AS (SELECT doc_id, lower(substr(trim(text), 1, 12)) AS k
        FROM documents WHERE doc_id % 5 = 0
          AND length(lower(substr(trim(text), 1, 12))) >= 12),
      tw AS (SELECT doc_id + 1000000 AS doc_id,
               substr(k, 1, 3) || 'x' || substr(k, 5, 8) AS k
             FROM ks WHERE doc_id % 50 = 0
             UNION ALL
             SELECT doc_id + 2000000,
               substr(k, 1, 6) || 'zz' || substr(k, 7, 6)
             FROM ks WHERE doc_id % 50 = 0),
      a AS (SELECT * FROM ks UNION ALL SELECT * FROM tw)
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        CAST(levenshtein(x.k, y.k) AS BIGINT) AS edit_distance
      FROM a x JOIN a y ON x.doc_id < y.doc_id
      WHERE levenshtein(x.k, y.k) <= 2
      ORDER BY id_a, id_b""",

    // the exact integer detector replayed verbatim: planted spikes,
    // milli fixed point, trailing exclusive window, (n·x−S)² > k²(n·Q−S²)
    "q199_rolling_anomaly" -> """
      WITH e AS (SELECT event_id, user_id, ts,
          CASE WHEN event_id % 997 = 0 THEN value * 10 ELSE value END AS val
        FROM events),
      v AS (SELECT event_id, user_id, ts,
          CAST(floor(val * 1000) AS BIGINT) AS vv FROM e),
      w AS (SELECT event_id, user_id, vv,
          CAST(count(*) OVER win AS BIGINT) AS n,
          CAST(coalesce(sum(vv) OVER win, 0) AS BIGINT) AS s,
          CAST(coalesce(sum(vv * vv) OVER win, 0) AS BIGINT) AS q
        FROM v
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id, vv AS v_scaled, n AS n_prior,
        CAST(CASE WHEN n >= 8
            AND (n * vv - s) * (n * vv - s) > 9 * (n * q - s * s)
          THEN 1 ELSE 0 END AS INT) AS is_anomaly
      FROM w ORDER BY event_id""",

    // exact distinct; both HLL flags pin 1 — union-of-parts ≡ direct
    // sketch (bucket-max linearity) and within-ε at lgK 12
    "q201_hll_partitioned" -> """
      SELECT event_type,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        CAST(1 AS INT) AS merged_eq_direct,
        CAST(1 AS INT) AS within_eps
      FROM events GROUP BY 1 ORDER BY 1""",

    "q200_ohlc" -> """
      WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
          ts, event_id, value FROM events),
      r AS (SELECT event_type, day, value,
          row_number() OVER (PARTITION BY event_type, day
            ORDER BY ts, event_id) AS ra,
          row_number() OVER (PARTITION BY event_type, day
            ORDER BY ts DESC, event_id DESC) AS rd
        FROM e)
      SELECT event_type, day,
        max(CASE WHEN ra = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        max(CASE WHEN rd = 1 THEN value END) AS close,
        CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY event_type, day
      ORDER BY event_type, day""",

    // triangles counted orientation-free: canonical id-ordered triple
    // join — must agree exactly with the degree-oriented decomposition
    "q197_triangles" -> """
      WITH sp AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                  FROM lineitem),
      pr AS (SELECT x.s AS sa, y.s AS sb, count(*) AS sh
             FROM sp x JOIN sp y ON x.p = y.p AND x.s < y.s
             GROUP BY 1, 2),
      und AS (SELECT sa AS a, sb AS b FROM pr
              WHERE sh >= 4 AND (sa * 131 + sb) % 10 < 4),
      nodes AS (SELECT DISTINCT a AS id FROM und UNION SELECT b FROM und),
      tri AS (SELECT u.a AS x, u.b AS y, v.b AS z
              FROM und u JOIN und v ON v.a = u.b
              JOIN und w ON w.a = u.a AND w.b = v.b),
      per AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT x AS id FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
              GROUP BY id)
      SELECT n.id AS node_id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_triangles
      FROM nodes n LEFT JOIN per ON per.id = n.id
      ORDER BY n.id""",

    // the mutation batch's residue rules replayed over the base keys:
    // upsert wins where both residues hit (the batch construction),
    // fresh keys live past the offset
    "q195_version_diff" -> """
      SELECT k AS c_custkey,
        CASE WHEN k >= 1000000 THEN 'added'
             WHEN k % 40 = 0 THEN 'updated'
             WHEN k % 55 = 0 THEN 'removed'
             ELSE 'unchanged' END AS change
      FROM (SELECT c_custkey AS k FROM customer
            UNION ALL
            SELECT c_custkey + 1000000 FROM customer
            WHERE c_custkey % 100 = 0)
      ORDER BY k""",

    // exact per-key counts; both sketch flags pin to 1 — no-undercount
    // is structural (every cell >= the key's true count), exactness at
    // 4x16384 vs ~150 keys is the q182 sizing discipline
    "q194_cms_counts" -> """
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        CAST(count(*) AS BIGINT) AS n_exact,
        CAST(1 AS INT) AS never_undercounts,
        CAST(1 AS INT) AS sketch_exact
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // content-defined chunking replayed verbatim: the q46 rolling-hash
    // fold over each trailing 8-codepoint window, cuts where the low 6
    // bits are zero, chunk slicing, then q186's first-holder credit
    "q193_cdc_chunks" -> """
      WITH d0 AS (SELECT doc_id, text FROM documents),
      tw AS (SELECT doc_id + 1000000 AS doc_id,
             'shifted boilerplate prefix ' || text AS text FROM d0
             WHERE doc_id % 50 = 0),
      d AS (SELECT * FROM d0 UNION ALL SELECT * FROM tw),
      nt AS (SELECT doc_id,
        array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ') AS t
        FROM d),
      cp AS (SELECT doc_id, t,
        list_transform(range(1, length(t) + 1),
          i -> CAST(unicode(substr(t, CAST(i AS INT), 1)) AS BIGINT)) AS cps,
        CAST(length(t) AS BIGINT) AS n
        FROM nt),
      bd AS (SELECT doc_id, t, n,
        CASE WHEN n < 8 THEN CAST([] AS BIGINT[])
             ELSE list_filter(range(8, n + 1), i ->
               list_reduce(list_prepend(CAST(0 AS BIGINT), cps[i-7:i]),
                 (h, c) -> (h * 131 + c) % 1000000007) % 64 = 0)
        END AS b
        FROM cp),
      ck AS (SELECT doc_id, t, n,
        list_append(list_filter(b, x -> x < n), n) AS ends
        FROM bd WHERE n > 0),
      ch AS (SELECT doc_id,
        unnest(list_transform(range(1, len(ends) + 1), j ->
          substr(t,
            CAST(CASE WHEN j = 1 THEN 1
                 ELSE ends[CAST(j - 1 AS INT)] + 1 END AS INT),
            CAST(ends[CAST(j AS INT)] -
              CASE WHEN j = 1 THEN 0
                   ELSE ends[CAST(j - 1 AS INT)] END AS INT)))) AS chunk
        FROM ck),
      dch AS (SELECT DISTINCT doc_id, chunk FROM ch),
      fh AS (SELECT chunk, min(doc_id) AS first_doc FROM dch GROUP BY chunk),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
              FROM dch GROUP BY doc_id),
      nv AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
             FROM fh GROUP BY first_doc)
      SELECT d.doc_id,
        CAST(coalesce(per.n_chunks, 0) AS BIGINT) AS n_chunks,
        CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
        CAST(CASE WHEN coalesce(per.n_chunks, 0) > 0
          THEN coalesce(nv.n_novel, 0) * 1000000 // per.n_chunks
          ELSE 0 END AS BIGINT) AS novelty_micros
      FROM d LEFT JOIN per ON per.doc_id = d.doc_id
      LEFT JOIN nv ON nv.doc_id = d.doc_id
      ORDER BY d.doc_id""",

    "q189_recursive_cte" -> """
      WITH RECURSIVE yrs(y) AS (
        SELECT 1992
        UNION ALL
        SELECT y + 1 FROM yrs WHERE y < 1998
      )
      SELECT y,
        CAST((SELECT count(*) FROM orders o
          WHERE year(o.o_orderdate) = y) AS BIGINT) AS n_orders,
        CAST((SELECT count(DISTINCT o.o_custkey) FROM orders o
          WHERE year(o.o_orderdate) = y) AS BIGINT) AS n_customers
      FROM yrs ORDER BY y""",

    // the q147 BM25 scorer over the FULL corpus — the indexed path
    // (seed + incremental ingest + index-served probe) must reproduce
    // the batch recompute exactly
    "q185_bm25_indexed" -> """
      WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
      lens AS (SELECT doc_id,
        CASE WHEN t = '' THEN 0
             ELSE len(string_split_regex(t, '\s+')) END AS dl
        FROM d),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
      tok AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS w
              FROM d WHERE t <> ''),
      post AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
               FROM tok WHERE w IN ('table', 'scan', 'stream')
               GROUP BY doc_id, w),
      dfr AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY w),
      sc AS (
        SELECT post.doc_id,
          ln(1.0 + (stats.n - dfr.df + 0.5) / (dfr.df + 0.5)) *
            (post.tf * 2.2) /
            (post.tf + 1.2 * (0.25 + 0.75 * CAST(lens.dl AS DOUBLE)
              / stats.avgdl)) AS s
        FROM post
        JOIN dfr ON post.w = dfr.w
        JOIN lens ON post.doc_id = lens.doc_id
        CROSS JOIN stats)
      SELECT doc_id, round(sum(s), 6) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 12""",

    "q186_ngram_novelty" -> """
      WITH t AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END AS toks
        FROM documents),
      sh AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 3), i ->
               array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' '))
        END AS g
        FROM t),
      gr AS (SELECT doc_id, unnest(list_distinct(g)) AS gram FROM sh),
      fh AS (SELECT doc_id, gram,
        min(doc_id) OVER (PARTITION BY gram) AS first_doc FROM gr),
      ag AS (SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_novel
        FROM fh GROUP BY doc_id)
      SELECT doc_id, n_grams, n_novel,
        CAST(CASE WHEN n_grams > 0
          THEN n_novel * 1000000 // n_grams ELSE 0 END AS BIGINT)
          AS novelty_micros
      FROM ag ORDER BY doc_id""",

    "q184_bpe_fertility" -> (s"""
      WITH RECURSIVE
      merges(rank, lhs, rhs) AS (VALUES $bpeMergesValues),
      d(doc_id, text) AS (
        SELECT doc_id, text FROM documents
        UNION ALL $bpeFixtureValues),
      tk AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\\s+') END AS toks
        FROM d),
      $bpeEncodeCtes,
      dw AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
      bp AS (SELECT dw.doc_id, CAST(sum(f.c) AS BIGINT) AS bpe
             FROM dw JOIN fin f ON f.wid = dw.tok GROUP BY dw.doc_id),
      lt AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(lower(text)), '\\s+') END AS ltoks
        FROM d),
      lsc AS (SELECT doc_id,
        CAST(len(list_filter(ltoks, x -> x IN ('der','die','das','und','ist'))) AS INT) AS s_de,
        CAST(len(list_filter(ltoks, x -> x IN ('the','and','of','to','is'))) AS INT) AS s_en,
        CAST(len(list_filter(ltoks, x -> x IN ('el','la','los','que','es'))) AS INT) AS s_es,
        CAST(len(list_filter(ltoks, x -> x IN ('le','la','les','et','est'))) AS INT) AS s_fr,
        CAST(len(list_filter(ltoks, x -> x IN ('的','是','了','在','我'))) AS INT) AS s_zh
        FROM lt),
      lg AS (SELECT doc_id,
        CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
             WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
             WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
             WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
             WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
             ELSE 'zh' END AS lang
        FROM lsc),
      met AS (SELECT tk.doc_id,
        CAST(len(toks) AS BIGINT) AS w,
        CAST(coalesce(bp.bpe, 0) AS BIGINT) AS b,
        CAST(length(regexp_replace(trim(d.text), '\\s+', '', 'g'))
          AS BIGINT) AS ch
        FROM tk JOIN d ON d.doc_id = tk.doc_id
        LEFT JOIN bp ON bp.doc_id = tk.doc_id),
      ag AS (SELECT lg.lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(w) AS BIGINT) AS n_words,
        CAST(sum(b) AS BIGINT) AS bpe_tokens,
        CAST(sum(ch) AS BIGINT) AS n_chars
        FROM met JOIN lg ON lg.doc_id = met.doc_id
        GROUP BY lg.lang)
      SELECT lang, n_docs, n_words, bpe_tokens, n_chars,
        CAST(CASE WHEN n_words > 0
          THEN bpe_tokens * 1000000 // n_words ELSE 0 END AS BIGINT)
          AS tokens_per_word_micros,
        CAST(CASE WHEN bpe_tokens > 0
          THEN n_chars * 1000000 // bpe_tokens ELSE 0 END AS BIGINT)
          AS chars_per_token_micros
      FROM ag ORDER BY lang"""),
    "q01_agg_pricing" -> """
      SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber,
        round(l_extendedprice * (1 - l_discount), 4) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-03-01'
        AND l_quantity > 40
      ORDER BY l_orderkey, l_linenumber""",

    "q03_topk" -> """
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      ORDER BY round(o_totalprice, 2) DESC, o_orderkey
      LIMIT 10""",

    "q04_join_broadcast" -> """
      SELECT r_name, count(*) AS n_cust,
        round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    "q05_join_agg" -> """
      SELECT o_orderpriority, count(*) AS n_lines,
        round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q06_semi_join" -> """
      SELECT o_orderstatus, count(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q07_anti_join" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""",

    "q08_outer_join" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""",

    "q09_full_outer" -> """
      WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
      SELECT coalesce(c.nk, s.nk) AS nk,
        coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nk = s.nk
      ORDER BY nk""",

    "q10_theta_join" -> """
      SELECT b.bucket, count(*) AS n
      FROM customer c
      JOIN (VALUES ('neg', -100000.0, 0.0), ('low', 0.0, 5000.0),
                   ('high', 5000.0, 100000.0)) AS b(bucket, lo, hi)
        ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
      GROUP BY b.bucket
      ORDER BY b.bucket""",

    "q11_distinct_agg" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS nd_part,
        count(DISTINCT l_suppkey) AS nd_supp,
        round(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sumd_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q12_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls, g_rf, g_ls""",

    "q13_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS st,
             coalesce(o_orderpriority, 'ALL') AS pri,
             count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY st, pri""",

    "q14_grouping_sets" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rf, ls""",

    "q15_window_rank" -> """
      SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
             CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk, CAST(drk AS INT) AS drk
      FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
              row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
      WHERE rn <= 3
      ORDER BY c_mktsegment, rn""",

    "q16_window_running" -> """
      SELECT o_custkey, o_orderkey,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_total
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    "q17_window_range" -> """
      SELECT o_orderkey, count(*) OVER (
          PARTITION BY o_custkey ORDER BY CAST(floor(o_totalprice) AS BIGINT)
          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_similar
      FROM orders
      ORDER BY o_orderkey""",

    "q18_window_lag" -> """
      SELECT user_id, event_id,
        lag(event_id) OVER w AS prev_id,
        lead(event_id) OVER w AS next_id,
        round(value - lag(value) OVER w, 2) AS delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "q19_union" -> """
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      ORDER BY c_custkey""",

    "q20_intersect" -> """
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT o_custkey FROM orders
      ORDER BY c_custkey""",

    "q21_except" -> """
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      ORDER BY c_custkey""",

    "q22_string_funcs" -> """
      SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        substring(p_name, 1, 5) AS pre,
        CAST(length(p_name) AS INT) AS len,
        CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        concat(p_brand, '#', p_type) AS tag
      FROM part
      WHERE p_name LIKE '%a%'
      ORDER BY p_partkey""",

    "q23_date_funcs" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(month(o_orderdate) AS INT) AS m,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1995-06-01'
      ORDER BY o_orderkey""",

    "q24_math_funcs" -> """
      SELECT p_partkey,
        round(p_retailprice * 1.1, 2) AS marked_up,
        round(abs(p_retailprice - 1000.0), 2) AS dist,
        CAST(floor(p_retailprice) AS BIGINT) AS fl,
        CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        round(power(p_size, 2), 1) AS size_sq,
        round(ln(p_retailprice), 6) AS ln_price,
        round(sqrt(p_retailprice), 6) AS sqrt_price
      FROM part
      ORDER BY p_partkey""",

    "q25_array_funcs" -> """
      SELECT vec_id,
        CAST(len(embedding) AS INT) AS dim,
        round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
        round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum
      FROM embeddings
      ORDER BY vec_id""",

    "q26_json_funcs" -> """
      SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY 1""",

    "q27_merge_mutations" -> """
      SELECT c_mktsegment, count(*) AS n,
        round(CAST(sum(CAST(
          CASE WHEN c_custkey % 10 = 3 THEN c_acctbal * 2
               ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
      FROM customer
      WHERE c_custkey % 10 <> 7
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q28_merge_delete" -> """
      SELECT c_nationkey, count(*) AS n
      FROM customer
      WHERE c_custkey % 7 <> 0
      GROUP BY c_nationkey
      ORDER BY c_nationkey""",

    "q29_merge_upsert" -> """
      SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
        count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      FROM orders
      GROUP BY 1
      ORDER BY 1""",

    "q30_dedup_exact" -> """
      WITH fp AS (
        SELECT *, md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f
        FROM documents),
      d AS (SELECT * FROM fp
            QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1)
      SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM d GROUP BY lang ORDER BY lang""",

    "q31_fingerprint" -> """
      SELECT doc_id,
        md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ')) AS fingerprint
      FROM documents
      ORDER BY doc_id""",

    "q32_text_stats" -> """
      WITH t AS (
        SELECT doc_id, text,
          string_split_regex(trim(text), '\s+') AS toks,
          string_split_regex(trim(lower(text)), '\s+') AS ltoks
        FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(toks) AS INT) AS n_tokens,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')))
                    / CAST(length(text) AS DOUBLE) END AS praw,
          CASE WHEN len(ltoks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(ltoks, x -> x IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','from','that','this','it','be'))) AS DOUBLE)
                    / len(ltoks) END AS sraw,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END AS wraw
        FROM t)
      SELECT doc_id, n_tokens,
        round(praw, 6) AS punct_ratio,
        round(sraw, 6) AS stopword_ratio,
        round(wraw, 6) AS mean_word_len,
        round((
          (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN sraw >= 0.05 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN wraw >= 2.0 AND wraw <= 12.0 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN praw <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0, 6) AS quality
      FROM m
      ORDER BY doc_id""",

    "q33_langid" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      sc AS (
        SELECT doc_id,
          CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INT) AS score_de,
          CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS INT) AS score_en,
          CAST(len(list_filter(toks, x -> x IN ('el','la','los','que','es'))) AS INT) AS score_es,
          CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS INT) AS score_fr,
          CAST(len(list_filter(toks, x -> x IN ('的','是','了','在','我'))) AS INT) AS score_zh
        FROM t)
      SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
        CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) = 0 THEN 'und'
             WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
             WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
             WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
             WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
             ELSE 'zh' END AS predicted
      FROM sc
      ORDER BY doc_id""",

    "q34_ngram_jaccard" -> """
      WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 25),
      g AS (SELECT doc_id,
              list_distinct(CASE WHEN length(t) <= 3 THEN [t]
                ELSE list_transform(range(1, length(t) - 1), i -> substr(t, CAST(i AS INT), 3)) END) AS grams
            FROM d)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 0.0
          ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) END, 6) AS jaccard
      FROM g a, g b
      WHERE a.doc_id < b.doc_id
      ORDER BY id_a, id_b""",

    "q35_cosine_topk" -> """
      WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS cos
            FROM c, q WHERE cid <> qid),
      r AS (SELECT qid, cid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
            FROM s)
      SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine, CAST(rn AS INT) AS rank
      FROM r WHERE rn <= 10
      ORDER BY query_id, rank""",

    "q36_tumbling_window" -> """
      SELECT strftime(time_bucket(INTERVAL 1 hour, ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY 1""",

    "q37_sliding_window" -> """
      WITH e AS (SELECT time_bucket(INTERVAL 30 minutes, ts) AS b, value FROM events),
      w AS (SELECT b AS ws, value FROM e
            UNION ALL
            SELECT b - INTERVAL 30 minutes AS ws, value FROM e)
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      FROM w
      GROUP BY ws
      ORDER BY 1""",

    "q38_sessionize" -> """
      WITH x AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800.0
               THEN 1 ELSE 0 END AS new_s
        FROM events),
      y AS (
        SELECT user_id, ts, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        count(*) AS n_events,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      FROM y
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    "q39_first_event" -> """
      SELECT user_id, event_type, event_id AS first_event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      ORDER BY user_id, event_type""",

    "q49_topk_udaf" -> """
      SELECT o_orderstatus, CAST(rn AS INT) AS rank, o_orderkey,
        round(o_totalprice, 2) AS o_totalprice
      FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_orderstatus, rank""",

    "q50_scalar_udf" -> """
      SELECT c_custkey, round(1.0 / (1.0 + exp(-(c_acctbal / 1000.0))), 6) AS sig
      FROM customer
      ORDER BY c_custkey""",

    "q51_udtf_shingles" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents WHERE doc_id < 3),
      s AS (
        SELECT doc_id,
          CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 3), i ->
                 array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) END AS sh
        FROM t),
      u AS (
        SELECT doc_id, unnest(list_transform(sh, (x, i) -> {'pos': i - 1, 'shingle': x})) AS v
        FROM s)
      SELECT doc_id, CAST(v.pos AS INT) AS pos, v.shingle AS shingle FROM u
      ORDER BY doc_id, pos""",

    "q52_session_window" -> """
      WITH x AS (
        SELECT user_id, ts, value,
          -- >= gap: Spark session windows are half-open [ts, ts+gap), so an
          -- event exactly gap after its predecessor starts a NEW session
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800.0
               THEN 1 ELSE 0 END AS new_s
        FROM events),
      y AS (
        SELECT user_id, ts, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        count(*) AS n_events,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      FROM y
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    "q53_conditional_funcs" -> """
      WITH a AS (
        SELECT c_custkey, max(o_totalprice) AS max_big
        FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
          ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT c_custkey,
        CAST(coalesce(round(max_big, 2), -1.0) AS DOUBLE) AS best_or_default,
        CASE WHEN max_big IS NULL THEN 'none'
             WHEN max_big > 470000 THEN 'huge'
             ELSE 'big' END AS tier,
        CAST(max_big IS NULL AS INT) AS is_null,
        CAST(round(nullif(coalesce(max_big, CAST(0.0 AS DOUBLE)), CAST(0.0 AS DOUBLE)), 2) AS DOUBLE) AS nullified
      FROM a
      ORDER BY c_custkey""",

    "q54_datetime_parts" -> """
      SELECT event_id,
        CAST(dayofweek(ts) + 1 AS INT) AS dow,
        CAST(dayofmonth(ts) AS INT) AS dom,
        CAST(hour(ts) AS INT) AS hr,
        CAST(minute(ts) AS INT) AS mi,
        CAST(quarter(ts) AS INT) AS qtr,
        CAST(weekofyear(ts) AS INT) AS woy
      FROM events
      WHERE event_id < 500
      ORDER BY event_id""",

    "q55_string_extended" -> """
      SELECT p_partkey,
        lpad(p_brand, 12, '_') AS lp,
        rpad(p_brand, 12, '.') AS rp,
        translate(p_type, 'aeiou', 'AEIOU') AS tr,
        reverse(p_brand) AS rev,
        regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
        CAST(instr(p_name, 'a') AS INT) AS first_a,
        repeat('ab', 3) AS rep,
        trim('  x  ') AS trimmed
      FROM part
      ORDER BY p_partkey""",

    "q56_pivot" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        count(*) FILTER (o_orderstatus = 'F') AS cnt_f,
        count(*) FILTER (o_orderstatus = 'O') AS cnt_o,
        count(*) FILTER (o_orderstatus = 'P') AS cnt_p
      FROM orders
      GROUP BY 1
      ORDER BY o_year""",

    "q57_unpivot" -> """
      WITH w AS (
        SELECT l_returnflag,
          CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price,
          CAST(round(sum(CAST(l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
        UNION ALL SELECT l_returnflag, 'price', price FROM w
        UNION ALL SELECT l_returnflag, 'disc', disc FROM w)
      ORDER BY l_returnflag, metric""",

    "q58_stats_agg" -> """
      SELECT l_returnflag,
        CAST(round(stddev_samp(l_quantity), 6) AS DOUBLE) AS sd_qty,
        CAST(round(stddev_pop(l_quantity), 6) AS DOUBLE) AS sdp_qty,
        CAST(round(var_samp(l_quantity), 6) AS DOUBLE) AS var_qty,
        CAST(round(var_pop(l_discount), 8) AS DOUBLE) AS varp_disc,
        CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS corr_qty_price,
        CAST(round(covar_samp(l_quantity, l_discount), 6) AS DOUBLE) AS cov_qty_disc,
        CAST(round(covar_pop(l_quantity, l_tax), 6) AS DOUBLE) AS covp_qty_tax
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q59_percentiles" -> """
      SELECT o_orderstatus,
        CAST(round(quantile_cont(o_totalprice, 0.25), 4) AS DOUBLE) AS p25,
        CAST(round(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS p50,
        CAST(round(quantile_cont(o_totalprice, 0.75), 4) AS DOUBLE) AS p75,
        CAST(round(median(o_totalprice), 4) AS DOUBLE) AS med
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q60_partition_prune" -> """
      SELECT o_orderpriority, count(*) AS n,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      FROM orders
      WHERE year(o_orderdate) = 1997
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q61_asof_join" -> """
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        CAST(round(p.value, 2) AS DOUBLE) AS purchase_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') e
      ASOF LEFT JOIN
        (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND e.ts >= p.ts
      ORDER BY e.event_id""",

    "q62_range_join" -> """
      SELECT c_custkey, p_partkey,
        CAST(round(c_acctbal, 2) AS DOUBLE) AS bal
      FROM customer JOIN part
        ON c_acctbal BETWEEN p_retailprice - p_size * 3
                         AND p_retailprice + p_size * 3
      ORDER BY c_custkey, p_partkey""",

    "q63_gapfill" -> """
      WITH b AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events GROUP BY user_id),
      g AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM b),
      h AS (
        SELECT user_id, date_trunc('hour', ts) AS hr,
          CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS v,
          count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT g.user_id, strftime(g.hr, '%Y-%m-%d %H:%M:%S') AS hour_start,
        coalesce(h.n, 0) AS n_events,
        last_value(h.v IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr
      ORDER BY g.user_id, hour_start""",

    // q133: linear interpolation on the hourly grid — same grid/window
    // construction as q63; identical double op order (the blend RATIO is
    // one division, then (v1-v0)*ratio) so values match bit-exactly
    // before the final floor — Spark computes the ratio on epoch MICROS,
    // which is bit-identical to this seconds form because a correctly
    // rounded division depends only on the real quotient
    // q135: exact-substring duplicated-span removal (Lee et al.) — the
    // full pipeline replayed relationally: word positions, k-gram
    // postings, cross-doc frequency with keep-first, covered-position
    // union, ordered reassembly. Tokenization mirrors the q95 shingle
    // contract (trim + \s+ split, whole-doc gram at <= 5 tokens); the
    // empty-text guard covers DuckDB's ['']-vs-[] split semantics.
    "q135_span_dedup" -> """
      WITH corpus AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 3 = 0
                THEN 'alpha beta gamma delta epsilon zeta ' ELSE '' END)
          || text ||
          (CASE WHEN doc_id % 4 = 0
                THEN ' one two three four five six seven' ELSE '' END) AS text
        FROM documents),
      t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(text), '\s+') END AS toks
        FROM corpus),
      g AS (
        SELECT doc_id, n, unnest(range(len(sh))) AS p, unnest(sh) AS gram
        FROM (SELECT doc_id, len(toks) AS n,
                CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 3), i ->
                       array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) END AS sh
              FROM t WHERE len(toks) > 0)),
      stats AS (
        SELECT gram, min(doc_id) AS keep
        FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      rm AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT g.doc_id, unnest(range(g.p, least(g.p + 5, g.n))) AS pos
          FROM g JOIN stats USING (gram)
          WHERE g.doc_id <> stats.keep)),
      w AS (
        SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS word
        FROM t WHERE len(toks) > 0),
      reb AS (
        SELECT w.doc_id, string_agg(w.word, ' ' ORDER BY w.pos) AS text,
               count(*) AS kept_n
        FROM w LEFT JOIN rm ON w.doc_id = rm.doc_id AND w.pos = rm.pos
        WHERE rm.doc_id IS NULL
        GROUP BY w.doc_id)
      SELECT t.doc_id, coalesce(reb.text, '') AS text,
        CAST(len(t.toks) - coalesce(reb.kept_n, 0) AS BIGINT) AS n_removed
      FROM t LEFT JOIN reb USING (doc_id)
      ORDER BY doc_id""",

    // q139: the round-8 text-cleaning composition — the q113 line-dedup
    // reconstruction CHAINED into the q135 span-removal reconstruction
    // (one rebuilt text feeds the next tokenizer), then a per-language
    // aggregate; a hash match proves the rebuilt-text contracts compose
    "q139_clean_pipeline" -> """
      WITH corpus AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 3 = 0
                THEN 'SHARED HEADER LINE' || chr(10) ELSE '' END)
          || text ||
          (CASE WHEN doc_id % 5 = 0
                THEN ' alpha beta gamma delta epsilon zeta' ELSE '' END) ||
          (CASE WHEN doc_id % 4 = 0
                THEN chr(10) || 'SHARED FOOTER LINE' ELSE '' END) AS text
        FROM documents),
      lines AS (
        SELECT doc_id,
          unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM corpus)),
      dup AS (
        SELECT trim(line) AS t
        FROM lines WHERE length(trim(line)) >= 1
        GROUP BY 1 HAVING count(DISTINCT doc_id) > 2),
      ld AS (
        SELECT l.doc_id, string_agg(l.line, chr(10) ORDER BY l.pos) AS text
        FROM lines l
        WHERE length(trim(l.line)) < 1
           OR trim(l.line) NOT IN (SELECT t FROM dup)
        GROUP BY l.doc_id),
      t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(text), '\s+') END AS toks
        FROM ld),
      g AS (
        SELECT doc_id, n, unnest(range(len(sh))) AS p, unnest(sh) AS gram
        FROM (SELECT doc_id, len(toks) AS n,
                CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 3), i ->
                       array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) END AS sh
              FROM t WHERE len(toks) > 0)),
      stats AS (
        SELECT gram, min(doc_id) AS keep
        FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      rm AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT g.doc_id, unnest(range(g.p, least(g.p + 5, g.n))) AS pos
          FROM g JOIN stats USING (gram)
          WHERE g.doc_id <> stats.keep)),
      w AS (
        SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS word
        FROM t WHERE len(toks) > 0),
      reb AS (
        SELECT w.doc_id, string_agg(w.word, ' ' ORDER BY w.pos) AS text,
               count(*) AS kept_n
        FROM w LEFT JOIN rm ON w.doc_id = rm.doc_id AND w.pos = rm.pos
        WHERE rm.doc_id IS NULL
        GROUP BY w.doc_id),
      final AS (
        SELECT t.doc_id, coalesce(reb.text, '') AS text,
          CAST(len(t.toks) - coalesce(reb.kept_n, 0) AS BIGINT) AS n_removed
        FROM t LEFT JOIN reb USING (doc_id))
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN trim(f.text) = '' THEN 0
                 ELSE len(string_split_regex(trim(f.text), '\s+')) END)
          AS BIGINT) AS total_tokens,
        CAST(sum(f.n_removed) AS BIGINT) AS total_removed
      FROM final f JOIN documents d USING (doc_id)
      GROUP BY d.lang ORDER BY d.lang""",

    // q138: the C4 cleaning filter replayed rule for rule — every rule
    // is a contains/suffix/count check (no regex), so both engines
    // compute them identically; kept text reassembles ordered and
    // hash-matches byte-exactly. Sentence count = terminal-punct chars
    // in the kept text (translate is PG-compatible in both engines).
    "q138_c4_filter" -> """
      WITH corpus AS (
        SELECT doc_id, text ||
          (CASE WHEN doc_id % 5 = 0
            THEN chr(10) || 'click here now' || chr(10) ||
                 'free javascript widgets available today.' ELSE '' END) ||
          (CASE WHEN doc_id % 7 = 0
            THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END)
          AS text
        FROM documents),
      lines AS (
        SELECT doc_id, text AS orig,
          unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
        FROM (SELECT doc_id, text, string_split(text, chr(10)) AS ls
              FROM corpus)),
      flagged AS (
        SELECT doc_id, orig, pos, line,
          (length(trim(line)) > 0
           AND right(trim(line), 1) IN ('.', '!', '?', '"')
           AND len(string_split_regex(trim(line), '\s+')) >= 5
           AND position('javascript' IN lower(trim(line))) = 0) AS keep
        FROM lines),
      agg AS (
        SELECT doc_id, orig,
          coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
            ORDER BY pos), '') AS text,
          CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
          CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
        FROM flagged GROUP BY doc_id, orig)
      SELECT doc_id, text, n_kept, n_dropped,
        CAST(position('lorem ipsum' IN lower(orig)) = 0
         AND position('{' IN orig) = 0
         AND position('terms of use' IN lower(orig)) = 0
         AND position('privacy policy' IN lower(orig)) = 0
         AND position('cookie policy' IN lower(orig)) = 0
         AND position('uses cookies' IN lower(orig)) = 0
         AND length(text) - length(translate(text, '.!?', '')) >= 3
          AS INT) AS c4_pass
      FROM agg ORDER BY doc_id""",

    // q137: incremental image dedup — the probe ingest's pairs are the
    // planted re-encode list (same ground-truth discipline as q134):
    // every re-encoded copy collides with its source ACROSS the ingest
    // boundary at distance exactly 0, and batch-internal re-encode
    // pairs don't exist (distinct noise images never collide)
    "q137_incremental_image_dedup" -> """
      SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
             CAST(0 AS BIGINT) AS hamming
      FROM documents WHERE doc_id % 3 = 0 AND doc_id < 90
      ORDER BY id_a, id_b""",

    // q136: the full multimodal dedup matrix — the q134 planted-dup
    // discipline per modality (DuckDB cannot decode PNG/WAV/containers;
    // the structural ground truth is the planted re-encode list, and
    // distance-0 exactness plus zero stray pairs check the real
    // decode+fingerprint path for each kind)
    "q136_multimodal_dedup" -> """
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             doc_id AS id_a, doc_id + 100000 AS id_b,
             CAST(0 AS BIGINT) AS hamming
      FROM documents WHERE doc_id < 90
      ORDER BY kind, id_a, id_b""",

    // q134: image perceptual-hash dedup. DuckDB cannot decode PNG, so
    // the oracle is the planted-duplicate ground truth (the q47
    // discipline): the Spark side unions each image (doc_id%3=0, id<90)
    // with a re-encoded pixel-identical copy at id+100000; a correct
    // decode+dHash pipeline pairs EXACTLY source/copy at Hamming 0 —
    // any hash collapse would add noise-image pairs (precision), any
    // decode/hash fault would miss planted pairs (recall)
    "q143_phash_crop_dedup" -> """
      SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
             CAST(1 AS INT) AS phash_found
      FROM documents WHERE doc_id < 60
      ORDER BY id_a, id_b""",

    "q134_image_dedup" -> """
      SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
             CAST(0 AS BIGINT) AS hamming
      FROM documents WHERE doc_id % 3 = 0 AND doc_id < 90
      ORDER BY id_a, id_b""",

    "q133_interpolate" -> """
      WITH h AS (
        SELECT user_id, date_trunc('hour', ts) AS t0,
          CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS v0,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      nx AS (
        SELECT user_id, t0, v0, n,
          lead(t0) OVER (PARTITION BY user_id ORDER BY t0) AS t1,
          lead(v0) OVER (PARTITION BY user_id ORDER BY t0) AS v1
        FROM h),
      g AS (
        SELECT user_id, t0, v0, n, t1, v1,
          unnest(generate_series(t0,
            coalesce(t1 - INTERVAL 1 HOUR, t0), INTERVAL 1 HOUR)) AS gh
        FROM nx)
      SELECT user_id, strftime(gh, '%Y-%m-%d %H:%M:%S') AS hour_start,
        CASE WHEN gh = t0 THEN n ELSE CAST(0 AS BIGINT) END AS n_events,
        CAST(floor((CASE WHEN gh = t0 THEN v0
              ELSE v0 + (v1 - v0)
                   * (CAST(date_diff('second', t0, gh) AS DOUBLE)
                      / CAST(date_diff('second', t0, t1) AS DOUBLE)) END) * 1e6)
          AS BIGINT) AS v_interp_micro
      FROM g ORDER BY user_id, hour_start""",

    "q64_window_distribution" -> """
      SELECT o_orderkey, o_orderstatus, quartile, pr, cd, cheapest_key
      FROM (
        SELECT o_orderkey, o_orderstatus,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
          CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd,
          first_value(o_orderkey) OVER w AS cheapest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey))
      WHERE o_orderkey < 500
      ORDER BY o_orderkey""",

    "q65_json_map" -> """
      SELECT event_id, 'k' AS ks,
        CAST(props->>'k' AS BIGINT) AS kv,
        1 AS has_k,
        CAST(NULL AS BIGINT) AS missing,
        1 AS n
      FROM events
      WHERE event_id < 300
      ORDER BY event_id""",

    // width/height/n_frames are the deterministic dimensions the payload
    // generator encodes (Multimodal.imageDims etc.); the Spark side only
    // reproduces them by actually DECODING the PNG/WAV/container payloads
    "q47_multimodal_features" -> """
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CAST(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 32
             WHEN 1 THEN 0 ELSE 8 + doc_id % 16 END AS INT) AS width,
        CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id // 32) % 32
             WHEN 1 THEN 0 ELSE 8 + (doc_id // 16) % 16 END AS INT) AS height,
        CAST(CASE doc_id % 3 WHEN 0 THEN 1
             WHEN 1 THEN 64 + doc_id % 192 ELSE 2 + doc_id % 6 END AS INT) AS n_frames
      FROM documents
      ORDER BY doc_id""",

    // __SFDIR__ is substituted with the actual fixture dir by Verify when
    // it dumps oracle_sql.json — DuckDB's parquet_metadata() needs a path
    "q48_rowgroup_stats" -> """
      SELECT DISTINCT row_group_id AS row_group,
        row_group_num_rows AS row_count
      FROM parquet_metadata('__SFDIR__/lineitem.parquet')
      ORDER BY row_group""",

    "q68_uuid_merge" -> """
      WITH d AS (
        SELECT md5(CAST(doc_id AS VARCHAR)) AS uuid, doc_id, lang
        FROM documents)
      SELECT uuid, doc_id,
        CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang
      FROM d
      WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3)
      ORDER BY uuid""",

    // q69/q70 ingest CSV/JSON derived from the same tables, so the oracle
    // aggregates the parquet directly — the text round-trip must be lossless
    "q69_csv_ingest" -> """
      SELECT o_orderstatus, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
        strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q70_json_ingest" -> """
      SELECT event_type, count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q40_approx_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS exact_parts,
        CAST(1 AS INT) AS approx_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q71_pii_redact" -> """
      WITH c AS (
        SELECT doc_id,
          substr(text, 1, 40) || ' reach user' || CAST(doc_id AS VARCHAR)
            || '@mail.example or +1-'
            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(contact,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        CAST(len(regexp_extract_all(contact,
          '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
        regexp_replace(
          regexp_replace(contact,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM c
      ORDER BY doc_id""",

    "q72_embed_quantize" -> """
      WITH v AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
          list_max(list_transform(embedding,
            x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings)
      SELECT vec_id,
        round(scale, 6) AS scale,
        array_to_string(
          CASE WHEN scale = 0
               THEN list_transform(vd, x -> 0)
               ELSE list_transform(vd,
                 x -> CAST(floor(x * 127.0 / scale + 0.5) AS INT)) END,
          ',') AS q_str,
        round(sqrt(list_sum(list_transform(vd, x ->
          (x - (CASE WHEN scale = 0 THEN 0.0
                     ELSE floor(x * 127.0 / scale + 0.5) END) * scale / 127.0) *
          (x - (CASE WHEN scale = 0 THEN 0.0
                     ELSE floor(x * 127.0 / scale + 0.5) END) * scale / 127.0)))),
          6) AS recon_err
      FROM v
      ORDER BY vec_id""",

    "q73_hash_sample" -> """
      SELECT l_returnflag, count(*) AS n,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
      FROM lineitem
      WHERE substr(md5(concat_ws(':', CAST(l_orderkey AS VARCHAR),
        CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q74_zorder_scan" -> """
      SELECT l_returnflag, count(*) AS n,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
      FROM lineitem
      WHERE l_suppkey BETWEEN 2 AND 4
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // q75: word-5-shingle overlap against the eval slice (doc_id % 17 = 0);
    // shingling mirrors TextFunctions.shingles incl. the n<=k whole-text case
    "q75_decontaminate" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id,
          CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 3), i ->
                 array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) END AS sh
        FROM t),
      ev AS (SELECT DISTINCT unnest(sh) AS shingle FROM s WHERE doc_id % 17 = 0),
      cs AS (SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM s),
      hits AS (
        SELECT cs.doc_id, count(*) AS n_overlap
        FROM cs JOIN ev USING (shingle) GROUP BY cs.doc_id)
      SELECT d.doc_id,
        CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
        CAST(coalesce(h.n_overlap, 0) >= 3 AS INT) AS contaminated
      FROM documents d LEFT JOIN hits h USING (doc_id)
      ORDER BY d.doc_id""",

    // q76: duplicate-word ratio + top-trigram fraction; DuckDB splits ''
    // into [''] where Spark tokenizes to [], hence the trim guards
    "q76_repetition" -> """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        FROM documents),
      g AS (
        SELECT doc_id, unnest(
          CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS gram
        FROM t),
      c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
      m AS (SELECT doc_id, max(n) AS topn, sum(n) AS tot FROM c GROUP BY 1)
      SELECT t.doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE round(1.0 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6)
        END AS dup_word_ratio,
        round(topn / CAST(tot AS DOUBLE), 6) AS top_trigram_frac
      FROM t JOIN m USING (doc_id)
      ORDER BY t.doc_id""",

    // q77: 40-token windows, stride 30; the final short window and the
    // whole-doc (n<=40) case mirror CorpusPrep.chunkWords
    "q77_chunk_words" -> """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(text), '\s+') END AS toks
        FROM documents WHERE doc_id < 200),
      c AS (
        SELECT doc_id, toks,
          CASE WHEN len(toks) <= 40 THEN 1
               ELSE CAST(ceil((len(toks) - 40) / 30.0) AS BIGINT) + 1 END AS nc
        FROM t),
      u AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        CAST(len(toks[CAST(i * 30 + 1 AS INT):CAST(i * 30 + 40 AS INT)]) AS BIGINT)
          AS n_chunk_tokens,
        array_to_string(toks[CAST(i * 30 + 1 AS INT):CAST(i * 30 + 40 AS INT)], ' ')
          AS chunk_text
      FROM u
      ORDER BY doc_id, chunk_idx""",

    // q78: the packing offsets are DEFINED by the global ordered prefix sum;
    // the engine computes them distributed (bucketed two-phase scan)
    "q78_pack" -> """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS start_offset
        FROM t)
      SELECT doc_id, n_tokens, start_offset,
        start_offset // 512 AS pack_first,
        greatest(start_offset + n_tokens - 1, start_offset) // 512 AS pack_last
      FROM c
      ORDER BY doc_id""",

    // q79: rank key is integer (tf desc, df asc, term) — identical across
    // engines; stopword list = TextFunctions.stopwords verbatim
    "q79_tfidf_topterms" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE trim(text) <> ''),
      f AS (
        SELECT doc_id, term FROM toks
        WHERE regexp_matches(term, '^[a-z0-9]{3,}$')
          AND term NOT IN ('the','a','an','and','or','of','to','in','is','are',
            'was','for','on','with','as','by','at','from','that','this','it','be')),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM f GROUP BY 1, 2),
      dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT count(*) AS n FROM documents),
      r AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
          row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rn
        FROM tf JOIN dfq USING (term))
      SELECT doc_id, CAST(rn AS INT) AS rank, term, tf, df,
        round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
      FROM r, nd
      WHERE rn <= 3
      ORDER BY doc_id, rank""",

    // q80: ORC round-trip — oracle aggregates the parquet directly
    "q80_orc_ingest" -> """
      SELECT o_orderpriority, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
        strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // q214: Avro round-trip — same discipline as q80: the oracle
    // aggregates the parquet directly, so the container-file write +
    // read must be lossless to hash-match
    "q214_avro_ingest" -> """
      SELECT o_orderpriority, count(*) AS n,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
        strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // q81: the expected change feed derived straight from the raw table;
    // an upsert writing the value already present must NOT appear
    "q81_change_feed" -> """
      SELECT doc_id, 'update' AS change_type,
        lang AS before_lang, 'xx' AS after_lang
      FROM documents WHERE doc_id % 10 = 0 AND lang <> 'xx'
      UNION ALL
      SELECT doc_id, 'delete', lang, CAST(NULL AS VARCHAR)
      FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 = 3
      ORDER BY doc_id""",

    // q215: cnt + exact distinct from the mutated final state; the two
    // sketch flags are pinned — delta-maintained estimate must equal
    // the full recompute (union linearity) and the exact count (the
    // domain is far under the sketch's saturation)
    // q225: the mutated final state AND both contract columns
    // recomputed from the rules alone — batch-2 docs (%7==3) carry the
    // explicitly supplied 'manual', everything else the 'web' default;
    // tok_bucket is always the generated expression over the FINAL tok
    // (batch-1 docs' +100 included — %5==0 wins over %7==3 only where
    // both apply, batch 2 committed LAST so its tok (the original)
    // governs those)
    "q225_generated_columns" -> """
      WITH d AS (SELECT doc_id, lang,
          CAST(CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END
            AS BIGINT) AS tok
        FROM documents),
      fin AS (SELECT doc_id, lang,
          CASE WHEN doc_id % 7 = 3 THEN tok
               WHEN doc_id % 5 = 0 THEN tok + 100
               ELSE tok END AS tok,
          CASE WHEN doc_id % 7 = 3 THEN 'manual' ELSE 'web' END AS src_tag
        FROM d)
      SELECT doc_id, lang, tok, src_tag,
        CAST(tok // 16 AS BIGINT) AS tok_bucket
      FROM fin ORDER BY doc_id""",

    // q224: the A-ES draw replayed verbatim — spread hash of
    // "7:wsample:<id>", ln of the exact-integer ratio, floor-micros
    // key, (key desc, id) top-20 membership; non-positive weights
    // never sampled
    "q224_weighted_sample" -> """
      WITH d AS (SELECT doc_id, lang,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents),
      h AS (SELECT doc_id, lang, tok, CAST(tok - 2 AS DOUBLE) AS w,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1,
                length('7:wsample:' || CAST(doc_id AS VARCHAR)) + 1),
              i -> CAST(unicode(substr('7:wsample:' ||
                CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
            (a, c) -> (a * 131 + c) % 1000000007)
           * 2654435761 + 104729) % 1000000007 AS hh
        FROM d),
      ky AS (SELECT doc_id, lang, tok,
          CASE WHEN w > 0 THEN CAST(floor(
            ln((hh + 1) / 1000000008.0) / w * 1000000.0) AS BIGINT)
          END AS sk
        FROM h),
      rk AS (SELECT doc_id, lang, tok, sk,
          row_number() OVER (PARTITION BY lang ORDER BY sk DESC, doc_id)
            AS rn
        FROM ky WHERE sk IS NOT NULL)
      SELECT doc_id, lang, CAST(tok AS BIGINT) AS n_tokens,
        sk AS sample_key_micros,
        CAST(CASE WHEN rn <= 20 THEN 1 ELSE 0 END AS INT) AS kept
      FROM rk
      UNION ALL
      SELECT doc_id, lang, CAST(tok AS BIGINT), NULL, CAST(0 AS INT)
      FROM ky WHERE sk IS NULL
      ORDER BY doc_id""",

    // q223: the WHOLE quantile sample replayed from the mutated final
    // state — portable spread hash of each doc id, distinct (h, v)
    // pairs, k = 256 lex-smallest, integer-rank estimates — plus the
    // exact anchors and the DKW ε-flags COMPUTED (not pinned); only
    // delta_eq_full is pinned (a structural delta-vs-full claim no
    // single-state engine can recompute)
    "q223_quantile_incremental" -> """
      WITH final AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents
        WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3)),
      hv AS (SELECT lang, CAST(tok AS DOUBLE) AS v,
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
              i -> CAST(unicode(substr(CAST(doc_id AS VARCHAR),
                CAST(i AS INT), 1)) AS BIGINT))),
            (h, c) -> (h * 131 + c) % 1000000007)
           * 2654435761 + 104729) % 1000000007 AS hh
        FROM final),
      dp AS (SELECT DISTINCT lang, hh, v FROM hv),
      rk AS (SELECT lang, hh, v,
          row_number() OVER (PARTITION BY lang ORDER BY hh, v) AS rn
        FROM dp),
      sk AS (SELECT lang, list(v ORDER BY v) AS sv
        FROM rk WHERE rn <= 256 GROUP BY lang),
      g AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
          list(CAST(tok AS DOUBLE) ORDER BY tok) AS allv
        FROM final GROUP BY lang),
      e AS (SELECT g.lang, g.cnt, g.allv,
          sk.sv[CAST((500000 * len(sk.sv) + 999999) // 1000000 AS INT)]
            AS e50,
          sk.sv[CAST((900000 * len(sk.sv) + 999999) // 1000000 AS INT)]
            AS e90
        FROM g JOIN sk ON sk.lang = g.lang)
      SELECT lang, cnt,
        CAST(floor(e50 * 1e6) AS BIGINT) AS est_p50_micros,
        CAST(floor(e90 * 1e6) AS BIGINT) AS est_p90_micros,
        CAST(floor(allv[CAST((cnt + 1) // 2 AS INT)] * 1e6) AS BIGINT)
          AS exact_p50_micros,
        CAST(floor(allv[CAST((9 * cnt + 9) // 10 AS INT)] * 1e6) AS BIGINT)
          AS exact_p90_micros,
        CAST(1 AS INT) AS delta_eq_full,
        CAST(20 * abs(len(list_filter(allv, x -> x <= e50))
          - (cnt + 1) // 2) <= 3 * cnt AS INT) AS eps50_ok,
        CAST(20 * abs(len(list_filter(allv, x -> x <= e90))
          - (9 * cnt + 9) // 10) <= 3 * cnt AS INT) AS eps90_ok
      FROM e ORDER BY lang""",

    "q215_hll_incremental" -> """
      WITH final AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents
        WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3))
      SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
        CAST(1 AS INT) AS delta_eq_full,
        CAST(1 AS INT) AS within_eps
      FROM final GROUP BY lang ORDER BY lang""",

    // q82: the oracle aggregates the mutated FINAL state from scratch;
    // the engine maintained the same numbers incrementally from the feed
    "q82_agg_view" -> """
      WITH final AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents
        WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3))
      SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        CAST(sum(tok) AS BIGINT) AS sum_tok,
        CAST(min(tok) AS BIGINT) AS min_tok,
        CAST(max(tok) AS BIGINT) AS max_tok
      FROM final GROUP BY lang ORDER BY lang""",

    // q83: the salted two-stage top-k must reproduce the plain ranking
    "q83_salted_topk" -> """
      WITH r AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey,
        CAST(round(o_totalprice, 2) AS DOUBLE) AS price
      FROM r WHERE rn <= 3
      ORDER BY o_custkey, rank""",

    // q84: identical semantics to q61 via the hot-key bucketed variant
    "q84_asof_bucketed" -> """
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        CAST(round(p.value, 2) AS DOUBLE) AS purchase_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') e
      ASOF LEFT JOIN
        (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND e.ts >= p.ts
      ORDER BY e.event_id""",

    // q85: forward direction — nearest purchase at-or-AFTER each view
    "q85_asof_forward" -> """
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        CAST(round(p.value, 2) AS DOUBLE) AS purchase_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') e
      ASOF LEFT JOIN
        (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND e.ts <= p.ts
      ORDER BY e.event_id""",

    // q87: the oracle applies the same mutation batch to the raw table in
    // SQL; the engine's answer travels through CoW merge + manifest commit
    // + the graft data source's pruned read
    "q87_source_read" -> """
      WITH st AS (
        SELECT doc_id,
          CASE WHEN doc_id % 9 = 0 THEN 'zz' ELSE lang END AS lang,
          n_chars
        FROM documents
        WHERE NOT (doc_id % 9 <> 0 AND doc_id % 11 = 5))
      SELECT doc_id, lang, n_chars FROM st
      WHERE doc_id BETWEEN 100 AND 350
      ORDER BY doc_id""",

    // q88: the oracle retrains the identical bigram LM — same tokenizer
    // convention as q76 (trim/lower/\s+ with the empty-doc guard), same
    // add-0.5 smoothing, prefix counts via a window over the count table
    "q88_lm_perplexity" -> """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        FROM documents),
      b AS (
        SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS bigram
        FROM t WHERE len(toks) >= 2),
      c AS (SELECT bigram, count(*) AS c12 FROM b GROUP BY 1),
      cw AS (SELECT bigram, c12,
               sum(c12) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS c1
             FROM c),
      v AS (SELECT count(DISTINCT w) AS vsz
            FROM (SELECT unnest(toks) AS w FROM t)),
      s AS (SELECT doc_id,
              avg(-ln((c12 + 0.5) / (c1 + 0.5 * vsz))) AS nll,
              count(*) AS nbi
            FROM b JOIN cw USING (bigram) CROSS JOIN v GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        round(s.nll, 6) AS nll, round(exp(s.nll), 6) AS ppl,
        CAST(coalesce(s.nbi, 0) AS BIGINT) AS n_bigrams
      FROM t LEFT JOIN s USING (doc_id)
      ORDER BY t.doc_id""",

    // q89: both engines rank by the same md5(doc_id) hex string
    "q89_stratified_sample" -> """
      WITH r AS (
        SELECT source, doc_id, lang,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      SELECT source, CAST(rn AS INT) AS rank, doc_id, lang
      FROM r WHERE rn <= 20
      ORDER BY source, rank""",

    // q86: both engines parse the synthesized URL with the same regex
    "q86_domain_filter" -> """
      WITH u AS (
        SELECT doc_id,
          'https://' || (['en.wikipedia.org', 'github.com', 'spam.example.com',
            'blog.example.net', 'arxiv.org'])[CAST(doc_id % 5 + 1 AS INT)]
            || '/doc/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      d AS (
        SELECT doc_id, regexp_extract(url, '^https?://([^/]+)/', 1) AS domain
        FROM u)
      SELECT domain, count(*) AS n_docs, min(doc_id) AS first_doc
      FROM d
      WHERE domain NOT IN ('spam.example.com', 'ads.example.org')
      GROUP BY domain
      ORDER BY domain""",

    "q67_conditional_agg" -> """
      SELECT o_orderstatus,
        CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
        CAST(bool_and(o_totalprice > 0) AS INT) AS all_pos,
        CAST(bool_or(o_orderpriority = '1-URGENT') AS INT) AS any_urgent,
        arg_max(o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_key,
        arg_min(o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_key
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // ---- approximate operators in oracle-checkable form ----------------
    // Pattern (cf. q40): emit values the oracle recomputes EXACTLY (exact
    // jaccard / cosine / top-k) plus integer flags asserting the
    // approximate structure (LSH banding, ANN probing) hit its recall
    // target; the oracle pins the flag to 1. A hash match then verifies
    // both the exact computation and the sketch's actual effectiveness.

    "q90_date_merge" -> """
      WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS o_orderdate,
          CAST(count(*) AS BIGINT) AS n_orders,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        CAST(CASE WHEN day(o_orderdate) = 1 THEN -1 ELSE n_orders END AS BIGINT) AS n_orders,
        round(CAST(rev AS DOUBLE), 2) AS rev
      FROM d
      WHERE NOT (day(o_orderdate) <> 1 AND month(o_orderdate) = 2)
      ORDER BY order_date""",

    // nested merge key (person.uuid): the oracle recomputes the merged
    // state relationally — upserted rows get bal=-1, the delete set
    // vanishes; a hash match proves nested footer zone maps + routing +
    // the nested-key merge join composed correctly
    "q105_nested_merge" -> """
      WITH d AS (
        SELECT md5(CAST(c_custkey AS VARCHAR)) AS uuid,
          c_mktsegment AS segment, c_custkey,
          CASE WHEN md5(CAST(c_custkey AS VARCHAR)) LIKE '0%' THEN -1.0
               ELSE round(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE), 2)
          END AS bal
        FROM customer)
      SELECT uuid, segment, c_custkey, bal FROM d
      WHERE uuid NOT LIKE 'f%'
      ORDER BY uuid""",

    // deterministic shuffle: the identical md5-rank permutation computed
    // globally — verifies the engine's distributed two-phase rank
    "q109_corpus_shuffle" -> """
      SELECT doc_id,
        CAST(row_number() OVER (
          ORDER BY md5('42:' || CAST(doc_id AS VARCHAR))) - 1
          AS BIGINT) AS shuffle_pos
      FROM documents
      ORDER BY doc_id""",

    // weighted mixture: the identical md5-threshold keep rule per source
    "q110_corpus_mixture" -> """
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'a' WHEN 1 THEN 'b'
             ELSE 'c' END AS mix_source,
        n_chars
      FROM documents
      WHERE doc_id % 3 = 0
         OR (doc_id % 3 = 1 AND
             substring(md5('7:b:' || CAST(doc_id AS VARCHAR)), 1, 8)
               < '80000000')
         OR (doc_id % 3 = 2 AND
             substring(md5('7:c:' || CAST(doc_id AS VARCHAR)), 1, 8)
               < '40000000')
      ORDER BY doc_id""",

    // CHECK-constraint lifecycle: only the ACCEPTED writes survive (the
    // %10 zero-merge under the floor check, the %100 update after the
    // cap check was dropped); the refused batches left no trace — both
    // facts recomputed relationally
    "q116_check_constraints" -> """
      SELECT c_custkey, c_mktsegment AS segment,
        CASE WHEN c_custkey % 100 = 0 THEN 99999.0
             WHEN c_custkey % 10 = 0 THEN 0.0
             ELSE round(CAST(c_acctbal AS DOUBLE), 2) END AS bal
      FROM customer
      ORDER BY c_custkey""",

    // shallow clone: source history (bal+50 on %40) + clone-only edits
    // (delete %60 unless %90; full-row upsert 'cloned' on %90, which
    // reverts bal to the raw value) recomputed relationally
    "q115_clone" -> """
      SELECT c_custkey,
        CASE WHEN c_custkey % 90 = 0 THEN 'cloned' ELSE c_name END AS name,
        round(CASE WHEN c_custkey % 90 = 0 THEN c_acctbal
                   WHEN c_custkey % 40 = 0 THEN c_acctbal + 50.0
                   ELSE c_acctbal END, 2) AS bal
      FROM customer
      WHERE NOT (c_custkey % 60 = 0 AND c_custkey % 90 <> 0)
      ORDER BY c_custkey""",

    // RESTORE lifecycle: v0 (bal+100 on %50) survives, v1 (the %70
    // delete) is undone by the rollback, v3 (the %90 full-row upsert
    // from the ORIGINAL rows) lands on top — recomputed relationally.
    // A %90 row's upsert replaces the whole row, so its bal reverts to
    // the raw value even when %50 also matched at v0.
    "q111_restore" -> """
      SELECT c_custkey,
        CASE WHEN c_custkey % 90 = 0 THEN 'post-restore'
             ELSE c_name END AS name,
        round(CASE WHEN c_custkey % 90 = 0 THEN c_acctbal
                   WHEN c_custkey % 50 = 0 THEN c_acctbal + 100.0
                   ELSE c_acctbal END, 2) AS bal
      FROM customer
      ORDER BY c_custkey""",

    // top-k pushdown: the same ORDER BY/LIMIT over the raw table — the
    // engine side must produce it from ONE planned file (asserted in the
    // query itself)
    "q112_topk_pushdown" -> """
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        o_orderstatus
      FROM orders
      ORDER BY o_orderkey
      LIMIT 25""",

    // cross-document line dedup: same injected boilerplate, same
    // >2-distinct-docs drop rule, same keep-short-lines rule, same
    // ordered reassembly — zipped unnest gives each line its position
    "q113_line_dedup" -> """
      WITH corpus AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 3 = 0
                THEN 'SHARED HEADER LINE' || chr(10) ELSE '' END)
          || text ||
          (CASE WHEN doc_id % 4 = 0
                THEN chr(10) || 'SHARED FOOTER LINE' ELSE '' END) AS text
        FROM documents),
      lines AS (
        SELECT doc_id,
          unnest(range(1, len(ls) + 1)) AS pos,
          unnest(ls) AS line
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM corpus)),
      dup AS (
        SELECT trim(line) AS t
        FROM lines WHERE length(trim(line)) >= 1
        GROUP BY 1 HAVING count(DISTINCT doc_id) > 2)
      SELECT l.doc_id, string_agg(l.line, chr(10) ORDER BY l.pos) AS text
      FROM lines l
      WHERE length(trim(l.line)) < 1
         OR trim(l.line) NOT IN (SELECT t FROM dup)
      GROUP BY l.doc_id
      ORDER BY l.doc_id""",

    // merge-on-read tombstone delete + resurrecting upsert: the final
    // logical state recomputed relationally — a hash match proves the
    // sidecar algebra (delete set minus resurrected keys) composed with
    // the anti-join read exactly
    "q108_tombstone_delete" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 34 = 3 THEN 'zz' ELSE lang END AS lang,
        n_chars
      FROM documents
      WHERE doc_id % 17 <> 3 OR doc_id % 34 = 3
      ORDER BY doc_id""",

    // CTAS lifecycle: the created-from-query rollup, after the MERGE
    // (n_now) joined with its own v0 (n_v0) — recomputed relationally
    "q107_ctas_lifecycle" -> """
      WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS dt,
          CAST(count(*) AS BIGINT) AS n,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
      SELECT strftime(dt, '%Y-%m-%d') AS order_date,
        CAST(CASE WHEN day(dt) = 1 THEN -1 ELSE n END AS BIGINT) AS n_now,
        n AS n_v0,
        round(CAST(rev AS DOUBLE), 2) AS rev
      FROM d ORDER BY order_date""",

    // bucketed-layout lifecycle: create + bucket-granularity merge +
    // by-name join recomputed relationally (plan property in spec)
    "q106_bucketed_join" -> """
      WITH o AS (
        SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM orders GROUP BY 1)
      SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
        round(CASE WHEN c.c_custkey % 10 = 0 THEN 0.0
                   ELSE CAST(c.c_acctbal AS DOUBLE) END, 2) AS bal,
        o.n_orders, o.total
      FROM customer c JOIN o ON o.custkey = c.c_custkey
      ORDER BY custkey""",

    // identical end state to q90 plus the NOT-MATCHED insert row — the
    // mutations are the same, only the driving surface differs (SQL DML
    // vs the Scala merge API)
    "q92_sql_merge" -> """
      WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS o_orderdate,
          CAST(count(*) AS BIGINT) AS n_orders,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
      SELECT * FROM (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
          CAST(CASE WHEN day(o_orderdate) = 1 THEN -1 ELSE n_orders END AS BIGINT) AS n_orders,
          round(CAST(rev AS DOUBLE), 2) AS rev
        FROM d
        WHERE NOT (day(o_orderdate) <> 1 AND month(o_orderdate) = 2)
        UNION ALL
        SELECT '1990-01-01', CAST(-2 AS BIGINT), 0.0)
      ORDER BY order_date""",

    "q93_catalog_sql" -> """
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
        CAST(CASE WHEN c_custkey % 100 = 0 THEN -1 ELSE c_nationkey END AS BIGINT) AS nk_now,
        CAST(c_nationkey AS BIGINT) AS nk_v0
      FROM customer
      WHERE c_custkey % 97 <> 0
      ORDER BY c_custkey""",

    // q97: final table state after DML + CALL compact/zorder/vacuum —
    // maintenance must not change rows; 3 = base + keep_last(2) history
    "q97_maintenance_sql" -> """
      WITH t AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 100 = 0 THEN -1 ELSE c_nationkey END AS nk
        FROM customer WHERE c_custkey % 97 <> 0)
      SELECT CAST(nk AS BIGINT) AS c_nationkey,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c_custkey) AS BIGINT) AS ckey_sum,
        CAST(3 AS BIGINT) AS n_live_versions
      FROM t GROUP BY nk ORDER BY c_nationkey""",

    // q98: post-z-order DML — the overlapped-layout holder-join merge
    // path must leave exactly the recomputed state
    "q98_zorder_merge" -> """
      WITH t AS (
        SELECT c_custkey,
          CAST((c_custkey * 17) % 1000 AS BIGINT) AS ck2,
          CASE WHEN c_custkey % 50 = 0 THEN -1 ELSE c_nationkey END AS nk
        FROM customer WHERE c_custkey % 97 <> 0)
      SELECT CAST(nk AS BIGINT) AS c_nationkey,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c_custkey) AS BIGINT) AS ckey_sum,
        CAST(sum(ck2) AS BIGINT) AS ck2_sum
      FROM t GROUP BY nk ORDER BY c_nationkey""",

    // q99: SQL lifecycle — INSERT / ALTER ADD COLUMNS / UPDATE /
    // TIMESTAMP AS OF / INSERT OVERWRITE; all three phases recomputed
    // from the fixture
    "q99_sql_lifecycle" -> """
      WITH src AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
               CASE WHEN c_custkey % 3 = 0
                    THEN concat('s', CAST(c_custkey % 5 AS VARCHAR)) END AS seg2
        FROM customer)
      SELECT phase, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS ckey_sum,
             CAST(sum(bal) AS BIGINT) AS bal_sum,
             CAST(count(seg2) AS BIGINT) AS seg2_n
      FROM (
        SELECT 'pre_alter' AS phase, k, bal, CAST(NULL AS VARCHAR) AS seg2
        FROM src
        UNION ALL
        SELECT 'pre_overwrite', k, bal, seg2 FROM src
        UNION ALL
        SELECT 'current', k, bal * 2, seg2 FROM src WHERE k % 2 = 0
      ) GROUP BY phase ORDER BY phase""",

    // q100: SQL DELETE — zone (metadata) strategy for the key range,
    // batch (CoW merge) for the data predicate; flags pinned to 1 so the
    // hash match proves the strategy choice
    "q100_zone_delete" -> """
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS okey_sum,
             CAST(1 AS INT) AS zone_used,
             CAST(1 AS INT) AS batch_used
      FROM orders
      WHERE NOT (o_orderkey < 300) AND NOT (o_orderpriority = '1-URGENT')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // q101: SQL UPDATE — zone strategy for the key range (no table
    // scan), batch CoW merge for the data predicate; flags pinned
    "q101_zone_update" -> """
      WITH t AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderpriority = '5-LOW'
                    THEN o_custkey + 1000000 ELSE o_custkey END AS ck,
               CASE WHEN o_orderkey < 300 THEN 'old' END AS tag
        FROM orders)
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ck) AS BIGINT) AS ck_sum,
             CAST(count(tag) AS BIGINT) AS old_n,
             CAST(1 AS INT) AS zone_used,
             CAST(1 AS INT) AS batch_used
      FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // q102: V2 streaming sink — last-writer-wins across two epochs,
    // derived exactly from raw customer; exactly_once flag pinned
    "q102_stream_sink" -> """
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 5 THEN 'STREAMED'
                  ELSE c_mktsegment END AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 10 = 0 THEN 10000 ELSE 0 END
               AS bal_cents,
             CAST(1 AS INT) AS exactly_once
      FROM customer
      WHERE NOT (c_custkey % 7 = 3 AND c_custkey % 10 NOT IN (0, 5))
      ORDER BY c_custkey""",

    // q103: CDF relation — both versions' exact diffs derived from raw
    // documents, with per-version attribution
    "q103_cdf_source" -> """
      WITH d AS (
        SELECT doc_id, lang,
          CAST(CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END
            AS BIGINT) AS tok
        FROM documents)
      SELECT doc_id, 'update' AS change_type,
             lang AS before_lang, 'xx' AS after_lang,
             tok AS before_tok, tok AS after_tok,
             CAST(0 AS BIGINT) AS cv
      FROM d WHERE doc_id % 10 = 0 AND lang <> 'xx'
      UNION ALL
      SELECT doc_id, 'delete', lang, CAST(NULL AS VARCHAR),
             tok, CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
      FROM d WHERE doc_id % 10 <> 0 AND doc_id % 7 = 3
      UNION ALL
      SELECT doc_id, 'update',
             CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END,
             CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END,
             tok, tok + 1000, CAST(1 AS BIGINT)
      FROM d WHERE doc_id % 9 = 1
        AND NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3)
      ORDER BY cv, doc_id""",

    // q104: history metadata table — version row totals derived from
    // raw documents (v0 applies the deletes; v1 only updates)
    "q104_history_meta" -> """
      WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS c FROM documents
        WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 3))
      SELECT CAST(0 AS BIGINT) AS version, (SELECT c FROM s) AS total_rows,
             CAST(1 AS INT) AS has_files, CAST(1 AS INT) AS feed,
             CAST(1 AS INT) AS no_txn
      UNION ALL
      SELECT CAST(1 AS BIGINT), (SELECT c FROM s),
             CAST(1 AS INT), CAST(1 AS INT), CAST(1 AS INT)
      ORDER BY version""",

    "q94_composite_merge" -> """
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
        CAST(o_orderkey AS BIGINT) AS o_orderkey,
        CAST(CASE WHEN o_orderkey % 50 = 0
                   AND year(CAST(o_orderdate AS DATE)) = 1995
          THEN -1 ELSE o_custkey END AS BIGINT) AS o_custkey
      FROM orders
      WHERE NOT (o_orderkey % 97 = 0 AND o_orderkey % 50 <> 0
                 AND year(CAST(o_orderdate AS DATE)) = 1995)
      ORDER BY order_date, o_orderkey""",

    // q95: duplicated word-5-shingle counts per doc; shingling mirrors
    // TextFunctions.shingles incl. the n<=k whole-text case (q75 pattern);
    // every doc yields >= 1 shingle so all docs appear on both sides
    "q95_dup_ngrams" -> """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id,
          CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 3), i ->
                 array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) END AS sh
        FROM t),
      g AS (SELECT doc_id, unnest(list_distinct(sh)) AS gram FROM s),
      c AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
      SELECT g.doc_id,
        CAST(count(*) AS BIGINT) AS total_ngrams,
        CAST(count(*) FILTER (WHERE c.df >= 2) AS BIGINT) AS dup_ngrams
      FROM g JOIN c USING (gram)
      GROUP BY g.doc_id
      ORDER BY g.doc_id""",

    "q91_schema_evolution" -> """
      SELECT c_custkey, c_name,
        round(CAST(CASE WHEN c_custkey % 100 = 0 AND c_custkey <= 1000
          THEN c_acctbal + 1000 ELSE c_acctbal END AS DOUBLE), 2) AS bal,
        CASE WHEN c_custkey % 100 = 0 AND c_custkey <= 1000
          THEN CAST(c_custkey // 100 AS BIGINT) END AS vip_rank
      FROM customer ORDER BY c_custkey""",

    "q41_minhash_pairs" ->
      (shingleJaccardPairs(0.6) + """
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
        CAST(1 AS INT) AS lsh_found
      FROM jp ORDER BY id_a, id_b"""),

    // the corpus pipeline end to end: quality gate → exact dedup →
    // decontamination → per-language accounting (stage semantics are
    // the q30/q31/q75 oracles', composed)
    "q119_corpus_pipeline" -> """
      WITH q AS (
        SELECT *, CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+'))
                  END AS nt
        FROM documents),
      qf AS (SELECT * FROM q WHERE nt >= 5),
      fp AS (
        SELECT *, md5(array_to_string(
          string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f
        FROM qf),
      d AS (SELECT * FROM fp
            QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1),
      t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 3), i ->
                 array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' '))
          END AS sh
        FROM t),
      ev AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh
             WHERE doc_id % 17 = 0),
      cs AS (SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM sh),
      hits AS (
        SELECT cs.doc_id, count(*) AS n_overlap
        FROM cs JOIN ev USING (shingle) GROUP BY cs.doc_id),
      surv AS (
        SELECT d.* FROM d LEFT JOIN hits USING (doc_id)
        WHERE coalesce(n_overlap, 0) < 3)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(nt) AS BIGINT) AS total_tokens
      FROM surv GROUP BY lang ORDER BY lang""",

    // metadata-only DROP COLUMN lifecycle: pre_drop re-aggregates the
    // dropped column's values via VERSION AS OF (per-version schema);
    // current reflects the post-drop UPDATE through the narrowed shape
    "q118_drop_column" -> """
      WITH src AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
               c_mktsegment AS seg
        FROM customer)
      SELECT 'pre_drop' AS phase, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bal) AS BIGINT) AS bal_sum,
             CAST(sum(length(seg)) AS BIGINT) AS seg_len
      FROM src
      UNION ALL
      SELECT 'current', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN k % 10 = 0 THEN bal + 7 ELSE bal END)
               AS BIGINT),
             CAST(0 AS BIGINT)
      FROM src
      ORDER BY phase""",

    // drop → purging compact → re-add: the final state carries the
    // source balances, and `seg` is non-null ONLY for the post-re-add
    // UPDATE's rows — a resurrected pre-drop value would inflate
    // seg_n/seg_len and break the hash
    "q120_compact_purge" -> """
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_sum,
             CAST(sum(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS seg_n,
             CAST(sum(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 0 END)
               AS BIGINT) AS seg_len
      FROM customer""",

    // q121: RENAME COLUMN lifecycle — v0 under the old name, current
    // under the new one (UPDATE doubled k%3=0 balances, DELETE removed
    // the MACHINERY segment); rename_ok pinned to 1 so the hash match
    // proves the metadata-only mapping + feature stamp, not just content
    "q121_rename_lifecycle" -> """
      WITH src AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
               c_mktsegment AS seg
        FROM customer)
      SELECT phase, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS ckey_sum,
             CAST(sum(b) AS BIGINT) AS bal_sum,
             CAST(1 AS INT) AS rename_ok
      FROM (
        SELECT 'v0' AS phase, k, bal AS b FROM src
        UNION ALL
        SELECT 'current', k,
               CASE WHEN k % 3 = 0 THEN bal * 2 ELSE bal END
        FROM src WHERE seg <> 'MACHINERY'
      ) GROUP BY phase ORDER BY phase""",

    // q122: rebucket lifecycle — content after CREATE(buckets=2) →
    // CALL rebucket(4) → UPDATE; spec_ok pinned to 1 proves the
    // procedure's before/after report, the new manifest spec, and the
    // per-file bucket prefixes, not just the final rows
    "q122_rebucket" -> """
      SELECT o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey % 5 = 0
                           THEN CAST(round(o_totalprice * 100) AS BIGINT) * 2
                           ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                      END) AS BIGINT) AS price_sum,
             CAST(1 AS INT) AS spec_ok
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // q125: range-scoped compaction — per-bucket aggregates over the
    // mixed carried+spliced snapshot with two point UPDATEs applied;
    // scoped_ok pinned to 1 proves the fold reduced files, passthrough
    // preserved out-of-range names, and new files carry the rc- prefix
    "q125_compact_range" -> """
      SELECT c_custkey % 8 AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
                      + CASE WHEN c_custkey = 5 THEN 7
                             WHEN c_custkey = 40 THEN 11 ELSE 0 END)
               AS BIGINT) AS bal_sum,
             CAST(1 AS INT) AS scoped_ok
      FROM customer GROUP BY c_custkey % 8 ORDER BY bucket""",

    // q123: widening ALTER COLUMN TYPE — final per-segment aggregates
    // with a post-ALTER UPDATE writing past Int.MaxValue; widen_ok
    // pinned to 1 proves the metadata-only type change (zero-file ALTER
    // version, wide current schema, narrow time-travel schema)
    // q132: the Gopher quality gate — every rule recomputed from the
    // same deterministically-dirtied text (ASCII dirt, identical
    // construction in both engines)
    "q132_gopher_gate" -> """
      WITH d0 AS (SELECT doc_id,
        CASE WHEN doc_id % 4 = 0
          THEN text || chr(10) || '- bullet one' || chr(10) ||
               '- bullet two' || chr(10) || '#x #y ok...'
          ELSE text END AS d
        FROM documents),
      t AS (SELECT doc_id, d,
        CASE WHEN trim(d) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(d), '\s+') END AS toks,
        CASE WHEN trim(d) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(lower(d)), '\s+') END AS ltoks,
        string_split(d, chr(10)) AS lines
        FROM d0),
      m AS (SELECT doc_id,
        CAST(len(toks) AS INT) AS n_words,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks) END AS mwl,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE ((length(d) - length(replace(d, '#', ''))) +
                   (length(d) - length(replace(d, '...', ''))) / 3)
                  / CAST(len(toks) AS DOUBLE) END AS symr,
        CASE WHEN length(d) = 0 THEN 0.0
             ELSE CAST(len(list_filter(lines, l ->
                    regexp_matches(trim(l), '^[-*\x{2022}]')))
                    AS DOUBLE) / len(lines) END AS bulr,
        CASE WHEN length(d) = 0 THEN 0.0
             ELSE CAST(len(list_filter(lines, l ->
                    regexp_matches(trim(l), '(\.\.\.|\x{2026})$')))
                    AS DOUBLE) / len(lines) END AS ellr,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_filter(toks, x ->
                    regexp_matches(x, '[A-Za-z]')))
                    AS DOUBLE) / len(toks) END AS alpr,
        CAST(len(list_filter(list_distinct(ltoks), x -> x IN
          ('the','be','to','of','and','that','have','with'))) AS INT)
          AS shits
        FROM t)
      SELECT doc_id, n_words, round(mwl, 6) AS mean_wl,
        round(symr, 6) AS symbol_ratio, round(bulr, 6) AS bullet_ratio,
        round(ellr, 6) AS ellipsis_ratio, round(alpr, 6) AS alpha_ratio,
        shits AS stop_hits,
        CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                   AND mwl BETWEEN 3.0 AND 10.0
                   AND symr <= 0.1 AND bulr <= 0.9 AND ellr <= 0.3
                   AND alpr >= 0.8 AND shits >= 2
              THEN 1 ELSE 0 END AS INT) AS gopher_pass
      FROM m ORDER BY doc_id""",

    // q140: the LEARNED quality gate — hashed uni+bigram features
    // (polynomial codepoint hash, the q46 fold, mod 1024 buckets),
    // fixed-point weights derived per bucket, logit = exact long sum.
    // DuckDB replays hashing, weights, and score bit-for-bit; the
    // threshold flag falls out of the shared logit
    "q140_quality_gate" -> """
      WITH d AS (SELECT doc_id, trim(text) AS raw, trim(lower(text)) AS t
                 FROM documents),
      tk AS (SELECT doc_id,
        CASE WHEN raw = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(raw, '\s+') END AS rtoks,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks
        FROM d),
      feats AS (SELECT doc_id, rtoks,
        CASE WHEN len(toks) < 2 THEN toks
             ELSE list_concat(toks, list_transform(range(1, len(toks)),
               i -> toks[CAST(i AS INT)] || ' ' ||
                    toks[CAST(i + 1 AS INT)])) END AS fs
        FROM tk),
      scored AS (SELECT doc_id, rtoks,
        CASE WHEN len(fs) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(list_sum(list_transform(fs, f ->
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(f) + 1),
                i -> CAST(unicode(substr(f, CAST(i AS INT), 1)) AS BIGINT))),
              (h, c) -> (h * 131 + c) % 1000000007) % 1024)
            * 2654435761 + 104729) % 4001 - 2000)) AS BIGINT)
        END AS logit
        FROM feats)
      SELECT doc_id, CAST(len(rtoks) AS BIGINT) AS n_tokens, logit,
        CAST(CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS INT) AS q_pass
      FROM scored ORDER BY doc_id""",

    // q144: the FineWeb-style quality pipeline — the q138 C4 CTEs (on
    // the clean corpus), the q132 Gopher rules and the q140 fixed-point
    // scorer both re-applied to the KEPT text, and the q119 dedup
    // window, all chained; every stage's oracle piece reused verbatim
    "q144_quality_pipeline" -> """
      WITH pages AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 3
            THEN 'the quality corpus material is good to be with that ' ||
                 'and have more of the sentence words here today ' ||
                 'together. all of the words are good and ready here. ' ||
                 'one more sentence is here with them.'
            ELSE text || ' one.' || chr(10) || 'short bit' ||
              CASE WHEN doc_id % 2 = 0
                THEN chr(10) || 'it is good to be with that and have ' ||
                     'more of the words here today. all good.'
                ELSE '' END ||
              CASE WHEN doc_id % 7 = 0
                THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
          END AS text
        FROM documents),
      lines AS (
        SELECT doc_id, text AS orig,
          unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
        FROM (SELECT doc_id, text, string_split(text, chr(10)) AS ls
              FROM pages)),
      lflag AS (
        SELECT doc_id, orig, pos, line,
          (length(trim(line)) > 0
           AND right(trim(line), 1) IN ('.', '!', '?', '"')
           AND len(string_split_regex(trim(line), '\s+')) >= 5
           AND position('javascript' IN lower(trim(line))) = 0) AS keep
        FROM lines),
      agg AS (
        SELECT doc_id, orig,
          coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
            ORDER BY pos), '') AS t
        FROM lflag GROUP BY doc_id, orig),
      c4 AS (
        SELECT doc_id, t,
          CAST(position('lorem ipsum' IN lower(orig)) = 0
           AND position('{' IN orig) = 0
           AND position('terms of use' IN lower(orig)) = 0
           AND position('privacy policy' IN lower(orig)) = 0
           AND position('cookie policy' IN lower(orig)) = 0
           AND position('uses cookies' IN lower(orig)) = 0
           AND length(t) - length(translate(t, '.!?', '')) >= 3
            AS INT) AS c4_pass
        FROM agg),
      gtoks AS (
        SELECT doc_id, t, c4_pass,
          CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(t), '\s+') END AS toks,
          CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(lower(t)), '\s+') END AS ltoks,
          string_split(t, chr(10)) AS glines
        FROM c4),
      gm AS (
        SELECT doc_id, t, c4_pass, toks, ltoks,
          CAST(len(toks) AS INT) AS n_words,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                      AS DOUBLE) / len(toks) END AS mwl,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE ((length(t) - length(replace(t, '#', ''))) +
                     (length(t) - length(replace(t, '...', ''))) / 3)
                    / CAST(len(toks) AS DOUBLE) END AS symr,
          CASE WHEN length(t) = 0 THEN 0.0
               ELSE CAST(len(list_filter(glines, l ->
                      regexp_matches(trim(l), '^[-*\x{2022}]')))
                      AS DOUBLE) / len(glines) END AS bulr,
          CASE WHEN length(t) = 0 THEN 0.0
               ELSE CAST(len(list_filter(glines, l ->
                      regexp_matches(trim(l), '(\.\.\.|\x{2026})$')))
                      AS DOUBLE) / len(glines) END AS ellr,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, x ->
                      regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / len(toks) END AS alpr,
          CAST(len(list_filter(list_distinct(ltoks), x -> x IN
            ('the','be','to','of','and','that','have','with'))) AS INT)
            AS shits
        FROM gtoks),
      g AS (
        SELECT doc_id, t, c4_pass, ltoks,
          CAST(CASE WHEN n_words BETWEEN 30 AND 100000
                     AND mwl BETWEEN 3.0 AND 10.0
                     AND symr <= 0.1 AND bulr <= 0.9 AND ellr <= 0.3
                     AND alpr >= 0.8 AND shits >= 2
                THEN 1 ELSE 0 END AS INT) AS gopher_pass
        FROM gm),
      feats AS (
        SELECT doc_id, t, c4_pass, gopher_pass,
          CASE WHEN len(ltoks) < 2 THEN ltoks
               ELSE list_concat(ltoks, list_transform(range(1, len(ltoks)),
                 i -> ltoks[CAST(i AS INT)] || ' ' ||
                      ltoks[CAST(i + 1 AS INT)])) END AS fs
        FROM g),
      scored AS (
        SELECT doc_id, t, c4_pass, gopher_pass,
          CASE WHEN len(fs) = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(list_sum(list_transform(fs, f ->
            ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(f) + 1),
                  i -> CAST(unicode(substr(f, CAST(i AS INT), 1)) AS BIGINT))),
                (h, c) -> (h * 131 + c) % 1000000007) % 1024)
              * 2654435761 + 104729) % 4001 - 2000)) AS BIGINT)
          END AS logit
        FROM feats),
      p AS (
        SELECT doc_id, c4_pass, gopher_pass,
          CAST(CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS INT) AS q_pass,
          CASE WHEN c4_pass = 1 AND gopher_pass = 1 AND logit >= 0
               THEN md5(array_to_string(
                 string_split_regex(trim(lower(t)), '\s+'), ' ')) END AS fp
        FROM scored)
      SELECT doc_id, c4_pass, gopher_pass, q_pass,
        CAST(CASE WHEN fp IS NOT NULL AND row_number()
               OVER (PARTITION BY fp ORDER BY doc_id) = 1
             THEN 1 ELSE 0 END AS INT) AS survived
      FROM p ORDER BY doc_id""",

    // q145: temperature mixture at alpha = 0.5 — weights from
    // sqrt(total/c) normalized by the max (sqrt and division are
    // correctly-rounded IEEE, so both engines derive identical doubles,
    // identical floor-micros, and identical hash thresholds); the kept
    // membership replays mixture's md5 rule with the derived thresholds
    "q145_temperature_mixture" -> """
      WITH src AS (
        SELECT doc_id,
          CASE WHEN doc_id % 6 < 3 THEN 'a'
               WHEN doc_id % 6 < 5 THEN 'b' ELSE 'c' END AS s
        FROM documents),
      cnt AS (SELECT s, CAST(count(*) AS DOUBLE) AS c FROM src GROUP BY s),
      wts AS (
        SELECT s, sqrt((SELECT sum(c) FROM cnt) / c) AS raw FROM cnt),
      nrm AS (
        SELECT s, raw / (SELECT max(raw) FROM wts) AS w FROM wts),
      kept AS (
        SELECT src.doc_id, src.s, nrm.w FROM src JOIN nrm ON src.s = nrm.s
        WHERE nrm.w >= 1.0
           OR substring(md5('7:' || src.s || ':' ||
                CAST(src.doc_id AS VARCHAR)), 1, 8)
              < lpad(lower(hex(CAST(floor(nrm.w * 4294967296.0)
                  AS BIGINT))), 8, '0'))
      SELECT s AS mix_source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(floor(any_value(w) * 1000000.0) AS BIGINT) AS weight_micros
      FROM kept GROUP BY s ORDER BY mix_source""",

    // q147: BM25 — tf over query-term postings, the Lucene IDF form,
    // length normalization against the corpus average; round(·, 6) is
    // safe here because differing (tf, df, dl) integer inputs separate
    // scores far beyond a ulp (the q88 ln-agreement discipline)
    "q147_bm25_search" -> """
      WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
      lens AS (SELECT doc_id,
        CASE WHEN t = '' THEN 0
             ELSE len(string_split_regex(t, '\s+')) END AS dl
        FROM d),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
      tok AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS w
              FROM d WHERE t <> ''),
      post AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
               FROM tok WHERE w IN ('data', 'merge', 'window')
               GROUP BY doc_id, w),
      dfr AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY w),
      sc AS (
        SELECT post.doc_id,
          ln(1.0 + (stats.n - dfr.df + 0.5) / (dfr.df + 0.5)) *
            (post.tf * 2.2) /
            (post.tf + 1.2 * (0.25 + 0.75 * CAST(lens.dl AS DOUBLE)
              / stats.avgdl)) AS s
        FROM post
        JOIN dfr ON post.w = dfr.w
        JOIN lens ON post.doc_id = lens.doc_id
        CROSS JOIN stats)
      SELECT doc_id, round(sum(s), 6) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 15""",

    // q148: hybrid retrieval — the q147 BM25 scorer and the q35 cosine
    // ranking recomputed verbatim (50 candidates each), fused by
    // reciprocal rank: 1/(60+rank) summed left-to-right, absent list
    // contributes 0; ordering on the ROUNDED fused score with doc-id
    // tiebreak in both engines
    "q148_hybrid_rrf" -> """
      WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
      lens AS (SELECT doc_id,
        CASE WHEN t = '' THEN 0
             ELSE len(string_split_regex(t, '\s+')) END AS dl
        FROM d),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
      tok AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS w
              FROM d WHERE t <> ''),
      post AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
               FROM tok WHERE w IN ('data', 'merge', 'window')
               GROUP BY doc_id, w),
      dfr AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY w),
      sc AS (
        SELECT post.doc_id,
          ln(1.0 + (stats.n - dfr.df + 0.5) / (dfr.df + 0.5)) *
            (post.tf * 2.2) /
            (post.tf + 1.2 * (0.25 + 0.75 * CAST(lens.dl AS DOUBLE)
              / stats.avgdl)) AS s
        FROM post
        JOIN dfr ON post.w = dfr.w
        JOIN lens ON post.doc_id = lens.doc_id
        CROSS JOIN stats),
      bm AS (SELECT doc_id, round(sum(s), 6) AS bm25
             FROM sc GROUP BY doc_id
             ORDER BY bm25 DESC, doc_id LIMIT 50),
      bmr AS (SELECT doc_id,
                row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
              FROM bm),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      qv AS (SELECT v AS q FROM e WHERE vec_id = 7),
      cs AS (SELECT vec_id AS cid, list_cosine_similarity(v, q) AS cos
             FROM e, qv WHERE vec_id <> 7),
      denr AS (SELECT cid, rn AS dense_rank FROM
        (SELECT cid, row_number() OVER (ORDER BY cos DESC, cid) AS rn FROM cs)
        WHERE rn <= 50),
      f AS (SELECT coalesce(b.doc_id, d.cid) AS doc_id,
              b.bm25_rank, d.dense_rank
            FROM bmr b FULL OUTER JOIN denr d ON b.doc_id = d.cid)
      SELECT doc_id, CAST(bm25_rank AS INT) AS bm25_rank,
        CAST(dense_rank AS INT) AS dense_rank,
        round(coalesce(1.0 / (60.0 + bm25_rank), 0.0)
            + coalesce(1.0 / (60.0 + dense_rank), 0.0), 6) AS rrf
      FROM f ORDER BY rrf DESC, doc_id LIMIT 20""",

    // q151: MMR rerank — the q35 cosine retrieval feeds an UNROLLED
    // 5-stage greedy: each stage picks argmax(0.5*rel - 0.5*maxsim) with
    // id tiebreak, then folds the pick's similarity into the running max.
    // lambda = 0.5 keeps 1-lambda exactly representable, so the stage
    // scores are bit-identical across engines
    "q151_mmr_rerank" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      qv AS (SELECT v AS q FROM e WHERE vec_id = 7),
      cs AS (SELECT vec_id AS cid, v, list_cosine_similarity(v, q) AS rel
             FROM e, qv WHERE vec_id <> 7),
      cand AS (SELECT cid, v, rel FROM
        (SELECT cid, v, rel, row_number() OVER (ORDER BY rel DESC, cid) AS rn
         FROM cs) WHERE rn <= 15),
      s1 AS (SELECT cid, v, rel, 0.5 * rel AS mmr FROM cand
             ORDER BY mmr DESC, cid LIMIT 1),
      r1 AS (SELECT c.cid, c.v, c.rel, list_cosine_similarity(c.v, s.v) AS ms
             FROM cand c, s1 s WHERE c.cid <> s.cid),
      s2 AS (SELECT cid, v, rel, 0.5 * rel - 0.5 * ms AS mmr FROM r1
             ORDER BY mmr DESC, cid LIMIT 1),
      r2 AS (SELECT r.cid, r.v, r.rel,
               greatest(r.ms, list_cosine_similarity(r.v, s.v)) AS ms
             FROM r1 r, s2 s WHERE r.cid <> s.cid),
      s3 AS (SELECT cid, v, rel, 0.5 * rel - 0.5 * ms AS mmr FROM r2
             ORDER BY mmr DESC, cid LIMIT 1),
      r3 AS (SELECT r.cid, r.v, r.rel,
               greatest(r.ms, list_cosine_similarity(r.v, s.v)) AS ms
             FROM r2 r, s3 s WHERE r.cid <> s.cid),
      s4 AS (SELECT cid, v, rel, 0.5 * rel - 0.5 * ms AS mmr FROM r3
             ORDER BY mmr DESC, cid LIMIT 1),
      r4 AS (SELECT r.cid, r.v, r.rel,
               greatest(r.ms, list_cosine_similarity(r.v, s.v)) AS ms
             FROM r3 r, s4 s WHERE r.cid <> s.cid),
      s5 AS (SELECT cid, v, rel, 0.5 * rel - 0.5 * ms AS mmr FROM r4
             ORDER BY mmr DESC, cid LIMIT 1),
      sel AS (SELECT cid, rel, mmr, 1 AS k FROM s1
        UNION ALL SELECT cid, rel, mmr, 2 FROM s2
        UNION ALL SELECT cid, rel, mmr, 3 FROM s3
        UNION ALL SELECT cid, rel, mmr, 4 FROM s4
        UNION ALL SELECT cid, rel, mmr, 5 FROM s5)
      SELECT cid AS vec_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr,
        CAST(k AS INT) AS mmr_rank
      FROM sel ORDER BY mmr_rank""",

    // q152: JL random projection — the ±1 sign matrix re-derived from the
    // portable integer hash, the same sequential left fold, division by
    // sqrt(outDim) (NOT multiplication by its reciprocal — different
    // doubles), floor-micros output
    "q152_random_projection" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      js AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS j),
      p AS (SELECT vec_id, j,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(0, len(v)), i ->
            (CASE WHEN (((i * 131 + j) * 2654435761 + 104729)
                        % 1000000007) % 2 = 0
                  THEN -1.0 ELSE 1.0 END) * v[CAST(i + 1 AS INT)])),
          (acc, x) -> acc + x) / sqrt(CAST(8 AS DOUBLE)) AS pj
        FROM e, js)
      SELECT vec_id, CAST(j AS INT) AS dim_idx,
        CAST(floor(pj * 1000000.0) AS BIGINT) AS proj_micros
      FROM p ORDER BY vec_id, dim_idx""",

    // q153: vocabulary coverage — exact top-50 term counts with the
    // (count desc, term asc) boundary, per-doc OOV via a left join;
    // empty docs kept at 0/0
    "q153_vocab_oov" -> """
      WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
      tok AS (SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS w
              FROM d WHERE t <> ''),
      vc AS (SELECT w AS term, count(*) AS c FROM tok GROUP BY w
             ORDER BY c DESC, term LIMIT 20),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN vc.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov
        FROM tok LEFT JOIN vc ON tok.w = vc.term GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(coalesce(agg.n_oov, 0) AS BIGINT) AS n_oov,
        CASE WHEN coalesce(agg.n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(floor(CAST(agg.n_oov AS DOUBLE) / agg.n_tokens
                             * 1000000.0) AS BIGINT) END AS oov_micros
      FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
      ORDER BY d.doc_id""",

    // q154: cross-source overlap — the q95 5-shingle construction per
    // lang, distinct'd, gram-joined pairwise, full matrix incl. zero
    // pairs, Jaccard as floor-micros
    "q154_source_overlap" -> """
      WITH t AS (SELECT lang, string_split_regex(trim(text), '\s+') AS toks
                 FROM documents WHERE trim(text) <> ''),
      s AS (SELECT lang,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(1, len(toks) - 3), i ->
               array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' '))
        END AS sh
        FROM t),
      g AS (SELECT DISTINCT lang, gram FROM
        (SELECT lang, unnest(sh) AS gram FROM s) WHERE gram <> ''),
      sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY lang),
      cm AS (SELECT a.lang AS source_a, b.lang AS source_b,
               CAST(count(*) AS BIGINT) AS common
             FROM g a JOIN g b ON a.gram = b.gram AND a.lang < b.lang
             GROUP BY 1, 2),
      p AS (SELECT a.lang AS source_a, b.lang AS source_b,
              a.n AS grams_a, b.n AS grams_b
            FROM sz a, sz b WHERE a.lang < b.lang)
      SELECT p.source_a, p.source_b, p.grams_a, p.grams_b,
        CAST(coalesce(cm.common, 0) AS BIGINT) AS common_grams,
        CAST(floor(CAST(coalesce(cm.common, 0) AS DOUBLE)
          / (p.grams_a + p.grams_b - coalesce(cm.common, 0))
          * 1000000.0) AS BIGINT) AS jaccard_micros
      FROM p LEFT JOIN cm
        ON p.source_a = cm.source_a AND p.source_b = cm.source_b
      ORDER BY p.source_a, p.source_b""",

    // q155: leakage-safe split — the mixture md5 threshold rule for
    // membership (0.1 -> 0x19999999), the q30 normalized fingerprint for
    // exact-duplicate leaks from test back into train
    "q155_leakage_split" -> """
      WITH d AS (SELECT doc_id,
          CASE WHEN doc_id % 17 = 0
               THEN 'shared corpus page ' || CAST(doc_id % 3 AS VARCHAR)
               ELSE text END AS text
        FROM documents),
      fp AS (SELECT doc_id,
          md5(array_to_string(
            string_split_regex(trim(lower(text)), '\s+'), ' ')) AS f,
          CASE WHEN substring(md5('7:test:' || CAST(doc_id AS VARCHAR)),
                              1, 8) < '19999999'
               THEN 'test' ELSE 'train' END AS split
        FROM d),
      t AS (SELECT DISTINCT f FROM fp WHERE split = 'test')
      SELECT fp.doc_id, fp.split,
        CAST(CASE WHEN fp.split = 'train' AND t.f IS NOT NULL
             THEN 1 ELSE 0 END AS INT) AS leaked
      FROM fp LEFT JOIN t ON fp.f = t.f
      ORDER BY fp.doc_id""",

    // q156: per-dim embedding stats — floor-micros BEFORE aggregation so
    // min/max/sum are exact longs in any order
    "q156_dim_stats" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ix AS (SELECT vec_id, v,
               CAST(unnest(range(0, len(v))) AS BIGINT) AS d FROM e),
      px AS (SELECT d,
               CAST(floor(v[CAST(d + 1 AS INT)] * 1000000.0) AS BIGINT) AS m
             FROM ix)
      SELECT CAST(d AS INT) AS dim_idx, CAST(count(*) AS BIGINT) AS n,
        CAST(min(m) AS BIGINT) AS min_micros,
        CAST(max(m) AS BIGINT) AS max_micros,
        CAST(sum(m) AS BIGINT) AS sum_micros
      FROM px GROUP BY d ORDER BY dim_idx""",

    // q157: unit-L2 normalization — the sequential square fold, the
    // sqrt, and each per-element division replayed; floor-micros
    "q157_l2_normalize" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 100),
      nm AS (SELECT vec_id, v,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
             FROM e),
      ix AS (SELECT vec_id,
               CAST(unnest(range(0, len(v))) AS BIGINT) AS d, v, nrm
             FROM nm)
      SELECT vec_id, CAST(d AS INT) AS dim_idx,
        CAST(floor(CASE WHEN nrm = 0 THEN v[CAST(d + 1 AS INT)]
                        ELSE v[CAST(d + 1 AS INT)] / nrm END
                   * 1000000.0) AS BIGINT) AS unit_micros
      FROM ix ORDER BY vec_id, dim_idx""",

    // q158: filtered ANN — the q35 ranking restricted to the label
    // stripe BEFORE ranking (top-k among matches)
    "q158_filtered_ann" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
      c AS (SELECT vec_id AS cid, v FROM e WHERE label % 3 = 0),
      s AS (SELECT qid, cid, list_cosine_similarity(v, qv) AS cos
            FROM c, q WHERE cid <> qid),
      r AS (SELECT qid, cid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
                AS rn
            FROM s)
      SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
        CAST(rn AS INT) AS rank
      FROM r WHERE rn <= 10
      ORDER BY query_id, rank""",

    // q159: exact-k per-group sample — the mixture md5 hash as the
    // score, rank <= least(n, k) per lang, id tiebreak
    "q159_exact_sample" -> """
      WITH h AS (SELECT doc_id, lang,
          substring(md5('11:sample:' || CAST(doc_id AS VARCHAR)), 1, 16)
            AS hh
        FROM documents),
      r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id)
                AS rn,
              count(*) OVER (PARTITION BY lang) AS n
            FROM h)
      SELECT doc_id, lang,
        CAST(CASE WHEN rn <= least(n, 20) THEN 1 ELSE 0 END AS INT)
          AS kept
      FROM r ORDER BY doc_id""",

    // q160: late-interaction MaxSim — 8 slices per side, max cosine per
    // query slice (exact in any order), then the ORDERED list fold for
    // the sequential outer sum
    "q160_late_interaction" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      qi AS (SELECT vec_id AS qid, CAST(unnest(range(0, 8)) AS BIGINT) AS i, v
             FROM e WHERE vec_id < 3),
      qsub AS (SELECT qid, i,
                 v[CAST(i * 8 + 1 AS INT):CAST(i * 8 + 8 AS INT)] AS qs
               FROM qi),
      di AS (SELECT vec_id AS did, CAST(unnest(range(0, 8)) AS BIGINT) AS j, v
             FROM e),
      dsub AS (SELECT did, j,
                 v[CAST(j * 8 + 1 AS INT):CAST(j * 8 + 8 AS INT)] AS ds
               FROM di),
      cs AS (SELECT q.qid, d.did, q.i,
               list_cosine_similarity(d.ds, q.qs) AS c
             FROM qsub q, dsub d WHERE d.did <> q.qid),
      mx AS (SELECT qid, did, i, max(c) AS m FROM cs GROUP BY 1, 2, 3),
      sm AS (SELECT qid, did,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(m ORDER BY i)), (a, b) -> a + b) AS s
             FROM mx GROUP BY qid, did),
      r AS (SELECT qid, did, s,
              row_number() OVER (PARTITION BY qid ORDER BY s DESC, did)
                AS rn
            FROM sm)
      SELECT qid AS query_id, did AS vec_id, round(s, 6) AS maxsim,
        CAST(rn AS INT) AS rank
      FROM r WHERE rn <= 10
      ORDER BY query_id, rank""",

    // q161: strict-order funnel — per-step first-match times anchored at
    // the view entry, 24h completion window, chain-break nulls
    "q161_funnel" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2
             FROM events e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t1
               AND e.ts <= s1.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3
             FROM events e JOIN s2 ON e.user_id = s2.user_id
                  JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               AND e.ts <= s1.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id)
      SELECT u.user_id,
        strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS t1,
        strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS t2,
        strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS t3,
        CAST(CASE WHEN s1.t1 IS NULL THEN 0 ELSE 1 END
           + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
           + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS INT)
          AS steps_completed
      FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
             LEFT JOIN s2 ON u.user_id = s2.user_id
             LEFT JOIN s3 ON u.user_id = s3.user_id
      ORDER BY u.user_id""",

    // q162: cohort retention triangle — first-active day per user,
    // per-(cohort, offset) distinct-user counts
    "q162_retention" -> """
      WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      c AS (SELECT user_id, min(d) AS cd FROM a GROUP BY user_id)
      SELECT strftime(c.cd, '%Y-%m-%d') AS cohort_date,
        CAST(date_diff('day', c.cd, a.d) AS INT) AS day_offset,
        CAST(count(*) AS BIGINT) AS active_users
      FROM a JOIN c ON a.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // q163: heavy hitters — capacity >= distinct terms makes Misra-Gries
    // exact, so the oracle is the exact frequency ranking
    "q163_heavy_hitters" -> """
      WITH d AS (SELECT trim(lower(text)) AS t FROM documents),
      tok AS (SELECT unnest(string_split_regex(t, '\s+')) AS w
              FROM d WHERE t <> ''),
      c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w),
      r AS (SELECT w, n,
              row_number() OVER (ORDER BY n DESC, w) AS rn FROM c)
      SELECT CAST(rn AS INT) AS rank, w AS term, n AS term_count
      FROM r WHERE rn <= 30 ORDER BY rank""",

    // q164: transition matrix — lead over (user order by ts, type),
    // (from, to) counts, per-source probability as floor-micros
    "q164_transitions" -> """
      WITH p AS (SELECT event_type AS f,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_type) AS t
        FROM events),
      c AS (SELECT f AS from_type, t AS to_type,
              CAST(count(*) AS BIGINT) AS n
            FROM p WHERE t IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(floor(CAST(n AS DOUBLE)
          / sum(n) OVER (PARTITION BY from_type) * 1000000.0) AS BIGINT)
          AS p_micros
      FROM c ORDER BY from_type, to_type""",

    // q165: table replication — the replica's final state recomputed
    // relationally: bal doubled on %10, %7 deleted, %13 re-upserted from
    // the ORIGINAL row with a renamed suffix (overriding both earlier
    // effects); both syncs applied, the third a no-op
    "q165_replication" -> """
      WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal
                 FROM customer),
      a1 AS (SELECT k, c_name,
               CASE WHEN k % 10 = 0 THEN bal * 2 ELSE bal END AS bal
             FROM c),
      a2 AS (SELECT * FROM a1 WHERE k % 7 <> 0),
      f AS (SELECT k, c_name, bal FROM a2 WHERE k % 13 <> 0
            UNION ALL
            SELECT k, c_name || ' R2', bal FROM c WHERE k % 13 = 0)
      SELECT k AS c_custkey, c_name, bal AS bal_c,
        CAST(1 AS INT) AS synced, CAST(1 AS INT) AS final_noop
      FROM f ORDER BY c_custkey""",

    // q166: k-NN classification — the q35 ranking + neighbor-label
    // votes + (votes desc, label) argmax per query
    "q166_knn_classify" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, label AS tl, v AS qv FROM e
            WHERE vec_id < 50),
      s AS (SELECT qid, vec_id AS cid, e.label AS nl,
              list_cosine_similarity(v, qv) AS cos
            FROM e, q WHERE vec_id <> qid),
      r AS (SELECT qid, nl FROM
        (SELECT qid, nl, cid,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
             AS rn
         FROM s) WHERE rn <= 10),
      vt AS (SELECT qid, nl, count(*) AS v FROM r GROUP BY 1, 2),
      p AS (SELECT qid, nl AS predicted FROM
        (SELECT qid, nl, v,
           row_number() OVER (PARTITION BY qid ORDER BY v DESC, nl) AS rn
         FROM vt) WHERE rn = 1)
      SELECT q.qid AS query_id, q.tl AS label, p.predicted,
        CAST(CASE WHEN p.predicted = q.tl THEN 1 ELSE 0 END AS INT)
          AS correct
      FROM q JOIN p ON q.qid = p.qid ORDER BY query_id""",

    // q167: label-pair cosine diagnostics — per-pair floor-micros BEFORE
    // aggregation, exact long sums, floor-division mean
    "q167_label_cosines" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      p AS (SELECT least(a.label, b.label) AS la,
              greatest(a.label, b.label) AS lb,
              CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000.0)
                   AS BIGINT) AS cm
            FROM e a, e b WHERE a.vec_id < b.vec_id)
      SELECT la AS label_a, lb AS label_b,
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(floor(CAST(sum(cm) AS DOUBLE) / count(*)) AS BIGINT)
          AS mean_cos_micros,
        CAST(CASE WHEN la = lb THEN 1 ELSE 0 END AS INT) AS within
      FROM p GROUP BY la, lb ORDER BY label_a, label_b""",

    // q168: langId confusion matrix — the q33 scorer + argmax against
    // the true lang labels
    "q168_lang_confusion" -> """
      WITH t AS (
        SELECT doc_id, lang,
          string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INT) AS s_de,
          CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS INT) AS s_en,
          CAST(len(list_filter(toks, x -> x IN ('el','la','los','que','es'))) AS INT) AS s_es,
          CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS INT) AS s_fr,
          CAST(len(list_filter(toks, x -> x IN ('的','是','了','在','我'))) AS INT) AS s_zh
        FROM t),
      p AS (SELECT lang,
        CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
             WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
             WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
             WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
             WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
             ELSE 'zh' END AS predicted
        FROM sc)
      SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n,
        CAST(CASE WHEN lang = predicted THEN 1 ELSE 0 END AS INT) AS hit
      FROM p GROUP BY lang, predicted
      ORDER BY lang, predicted""",

    // q169: the one-row dataset card — all exact integer arithmetic
    // (the q140 logit, md5 fingerprints, token counts)
    "q169_datasheet" -> """
      WITH d AS (SELECT doc_id, lang, trim(text) AS raw,
                   trim(lower(text)) AS t
                 FROM documents),
      tk AS (SELECT doc_id, lang,
        CASE WHEN raw = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(raw, '\s+') END AS rtoks,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks
        FROM d),
      feats AS (SELECT doc_id, lang, rtoks, toks,
        CASE WHEN len(toks) < 2 THEN toks
             ELSE list_concat(toks, list_transform(range(1, len(toks)),
               i -> toks[CAST(i AS INT)] || ' ' ||
                    toks[CAST(i + 1 AS INT)])) END AS fs
        FROM tk),
      scored AS (SELECT doc_id, lang,
        CAST(len(rtoks) AS BIGINT) AS ntk,
        md5(array_to_string(toks, ' ')) AS fp,
        CASE WHEN len(fs) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(list_sum(list_transform(fs, f ->
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(f) + 1),
                i -> CAST(unicode(substr(f, CAST(i AS INT), 1)) AS BIGINT))),
              (h, c) -> (h * 131 + c) % 1000000007) % 1024)
            * 2654435761 + 104729) % 4001 - 2000)) AS BIGINT)
        END AS logit
        FROM feats)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(ntk) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs,
        CAST(count_if(logit >= 0) AS BIGINT) AS n_quality_pass,
        CAST(floor(CAST(sum(logit) AS DOUBLE) / count(*)) AS BIGINT)
          AS mean_logit_floor
      FROM scored""",

    // q170: PMI collocations — distinct-doc term sets filtered to the
    // top-30 vocabulary, per-doc pairs, integer-exact ratio then ln
    "q170_pmi_pairs" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
      terms AS (SELECT DISTINCT doc_id, w FROM toks
        WHERE regexp_matches(w, '^[a-z0-9]{3,}$')
          AND w NOT IN ('the','a','an','and','or','of','to','in','is','are',
            'was','for','on','with','as','by','at','from','that','this','it','be')),
      vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM terms
                GROUP BY w ORDER BY df DESC, w LIMIT 30),
      dt AS (SELECT t.doc_id, t.w, v.df FROM terms t JOIN vocab v ON t.w = v.w),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      pr AS (SELECT a.w AS term_a, b.w AS term_b,
               CAST(count(*) AS BIGINT) AS pair_docs,
               CAST(min(a.df) AS BIGINT) AS df_a,
               CAST(min(b.df) AS BIGINT) AS df_b
             FROM dt a JOIN dt b
               ON a.doc_id = b.doc_id AND a.w < b.w
             GROUP BY 1, 2
             HAVING count(*) >= 5)
      SELECT term_a, term_b, pair_docs, df_a, df_b,
        round(ln(CAST(pair_docs * nd.n AS DOUBLE) / (df_a * df_b)), 6)
          AS pmi
      FROM pr, nd
      ORDER BY pmi DESC, term_a, term_b LIMIT 40""",

    // q171: funnel time-to-convert — the q161 step CTEs, completed
    // conversions only, exact nearest-rank percentile picks
    "q171_funnel_durations" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2
             FROM events e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t1
               AND e.ts <= s1.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3
             FROM events e JOIN s2 ON e.user_id = s2.user_id
                  JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               AND e.ts <= s1.t1 + INTERVAL 24 HOUR
             GROUP BY e.user_id),
      d AS (SELECT CAST(epoch_us(s3.t3) - epoch_us(s1.t1) AS BIGINT) AS dur
            FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
      r AS (SELECT dur, row_number() OVER (ORDER BY dur) AS rn,
              count(*) OVER () AS n
            FROM d),
      ps AS (SELECT CAST(unnest([50, 90, 100]) AS INT) AS pct)
      SELECT ps.pct, r.dur AS duration_micros, CAST(r.n AS BIGINT) AS n
      FROM ps JOIN r ON r.rn = (r.n * ps.pct + 99) // 100
      ORDER BY ps.pct""",

    // q172: label-centroid outliers — per-(label, dim) fixed-point means,
    // ordered list reassembly, cosine to own centroid, flag at 0.3
    "q172_centroid_outliers" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      ix AS (SELECT label, CAST(unnest(range(0, len(v))) AS BIGINT) AS d, v
             FROM e),
      pm AS (SELECT label, d,
               CAST(floor(v[CAST(d + 1 AS INT)] * 1000000.0) AS BIGINT) AS m
             FROM ix),
      cd AS (SELECT label, d,
               CAST(floor(CAST(sum(m) AS DOUBLE) / count(*)) AS BIGINT) AS cm
             FROM pm GROUP BY 1, 2),
      ct AS (SELECT label,
               list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY d) AS cent
             FROM cd GROUP BY label)
      SELECT e.vec_id, e.label,
        CAST(floor(list_cosine_similarity(e.v, ct.cent) * 1000000.0)
             AS BIGINT) AS centroid_cos_micros,
        CAST(CASE WHEN floor(list_cosine_similarity(e.v, ct.cent)
                             * 1000000.0) < 300000
             THEN 1 ELSE 0 END AS INT) AS outlier
      FROM e JOIN ct ON e.label = ct.label
      ORDER BY e.vec_id""",

    // q173: script histogram — per-char codepoints (substr is
    // char-indexed in DuckDB), identical range classes, per-lang shares
    "q173_script_histogram" -> """
      WITH cp AS (SELECT lang,
          unicode(substr(text, CAST(i AS INT), 1)) AS u
        FROM (SELECT lang, text,
                unnest(range(1, length(text) + 1)) AS i
              FROM documents)),
      cl AS (SELECT lang,
        CASE WHEN (u BETWEEN 97 AND 122) OR (u BETWEEN 65 AND 90)
               THEN 'latin'
             WHEN u BETWEEN 48 AND 57 THEN 'digit'
             WHEN u BETWEEN 19968 AND 40959 THEN 'han'
             WHEN u IN (32, 9, 10, 13) THEN 'space'
             ELSE 'other' END AS script
        FROM cp),
      c AS (SELECT lang, script, CAST(count(*) AS BIGINT) AS n
            FROM cl GROUP BY 1, 2)
      SELECT lang, script, n,
        CAST(floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang)
                   * 1000000.0) AS BIGINT) AS share_micros
      FROM c ORDER BY lang, script""",

    // q149: per-language quantile prune — the q140 fixed-point logit
    // recomputed verbatim, then the exact keep rule as one row_number:
    // rank by (logit desc, doc_id) <= ceil(n_lang * 0.5); the engine
    // reaches the same membership without a per-group corpus sort
    "q149_quantile_prune" -> """
      WITH d AS (SELECT doc_id, lang, trim(lower(text)) AS t FROM documents),
      tk AS (SELECT doc_id, lang,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks
        FROM d),
      feats AS (SELECT doc_id, lang,
        CASE WHEN len(toks) < 2 THEN toks
             ELSE list_concat(toks, list_transform(range(1, len(toks)),
               i -> toks[CAST(i AS INT)] || ' ' ||
                    toks[CAST(i + 1 AS INT)])) END AS fs
        FROM tk),
      scored AS (SELECT doc_id, lang,
        CASE WHEN len(fs) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(list_sum(list_transform(fs, f ->
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(f) + 1),
                i -> CAST(unicode(substr(f, CAST(i AS INT), 1)) AS BIGINT))),
              (h, c) -> (h * 131 + c) % 1000000007) % 1024)
            * 2654435761 + 104729) % 4001 - 2000)) AS BIGINT)
        END AS logit
        FROM feats),
      r AS (SELECT doc_id, lang, logit,
              row_number() OVER (PARTITION BY lang
                ORDER BY logit DESC, doc_id) AS rn,
              count(*) OVER (PARTITION BY lang) AS n
            FROM scored)
      SELECT doc_id, lang, logit,
        CAST(CASE WHEN rn <= CAST(ceil(n * 0.5) AS BIGINT)
             THEN 1 ELSE 0 END AS INT) AS kept
      FROM r ORDER BY doc_id""",

    // q150: per-source diversity report — exact distinct unigram/bigram
    // vocabularies and type-token ratios; bigrams are adjacent-token
    // joins within a doc, denominators count actual grams (empty docs
    // contribute zero bigrams, not -1)
    "q150_diversity_stats" -> """
      WITH d AS (SELECT doc_id, source, trim(lower(text)) AS t FROM documents),
      tk AS (SELECT doc_id, source,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks
        FROM d),
      base AS (SELECT source, count(*) AS n_docs,
        CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
        CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_bigrams
        FROM tk GROUP BY source),
      uni AS (SELECT source, count(DISTINCT w) AS distinct_unigrams
              FROM (SELECT source, unnest(toks) AS w FROM tk)
              GROUP BY source),
      bi AS (SELECT source, count(DISTINCT b) AS distinct_bigrams
             FROM (SELECT source,
                     unnest(list_transform(range(1, len(toks)),
                       i -> toks[CAST(i AS INT)] || ' ' ||
                            toks[CAST(i + 1 AS INT)])) AS b
                   FROM tk)
             GROUP BY source)
      SELECT base.source, base.n_docs, base.n_tokens, base.n_bigrams,
        coalesce(uni.distinct_unigrams, 0) AS distinct_unigrams,
        coalesce(bi.distinct_bigrams, 0) AS distinct_bigrams,
        CASE WHEN base.n_tokens = 0 THEN 0.0
             ELSE round(CAST(coalesce(uni.distinct_unigrams, 0) AS DOUBLE)
                        / base.n_tokens, 6) END AS ttr,
        CASE WHEN base.n_bigrams = 0 THEN 0.0
             ELSE round(CAST(coalesce(bi.distinct_bigrams, 0) AS DOUBLE)
                        / base.n_bigrams, 6) END AS bigram_ttr
      FROM base
      LEFT JOIN uni ON base.source = uni.source
      LEFT JOIN bi ON base.source = bi.source
      ORDER BY base.source""",

    // q146: sliding token windows — the q141 token rule per word, a
    // per-doc window sum for start offsets, the k-range arithmetic
    // (double floor, exact below 2^53), lateral range unnest for
    // membership, ordered reassembly per (doc, window)
    "q146_sliding_windows" -> """
      WITH d AS (SELECT doc_id, trim(text) AS t FROM documents
                 WHERE trim(text) <> ''),
      tk AS (SELECT doc_id, string_split_regex(t, '\s+') AS toks FROM d),
      w AS (SELECT doc_id,
        CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
        unnest(toks) AS tok
        FROM tk),
      wc AS (SELECT doc_id, pos, tok,
        CAST(coalesce(list_sum(list_transform(
            regexp_extract_all(tok, '[A-Za-z]+'), r -> (length(r)+3)//4)), 0)
          + length(regexp_replace(tok, '[^0-9]', '', 'g'))
          + length(regexp_replace(tok, '[A-Za-z0-9]', '', 'g'))
          AS BIGINT) AS c
        FROM w),
      off AS (SELECT doc_id, pos, tok, c,
        CAST(coalesce(sum(c) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS o
        FROM wc),
      ks AS (SELECT doc_id, pos, tok, c,
        CAST(unnest(range(
          greatest(0, CAST(floor((o - 32) / 16.0) AS BIGINT) + 1),
          CAST(floor(o / 16.0) AS BIGINT) + 1)) AS BIGINT) AS k
        FROM off)
      SELECT doc_id, CAST(k AS INT) AS window_idx,
        CAST(sum(c) AS BIGINT) AS n_window_tokens,
        string_agg(tok, ' ' ORDER BY pos) AS window_text
      FROM ks GROUP BY doc_id, k
      ORDER BY doc_id, window_idx""",

    // q141: token-budgeted greedy chunking — the per-word token rule
    // (alpha runs at ceil(len/4) + digit/punct chars) recomputed
    // verbatim, then the greedy fold replayed WORD BY WORD as a
    // recursive CTE (state = running cost + chunk index); chunk texts
    // and costs reassemble by group
    "q141_token_chunks" -> """
      WITH RECURSIVE d AS (
        SELECT doc_id, trim(text) AS t FROM documents WHERE trim(text) <> ''),
      tk AS (SELECT doc_id, string_split_regex(t, '\s+') AS toks FROM d),
      w AS (SELECT doc_id,
        CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
        unnest(toks) AS tok
        FROM tk),
      wc AS (SELECT doc_id, pos, tok,
        CAST(coalesce(list_sum(list_transform(
            regexp_extract_all(tok, '[A-Za-z]+'), r -> (length(r)+3)//4)), 0)
          + length(regexp_replace(tok, '[^0-9]', '', 'g'))
          + length(regexp_replace(tok, '[A-Za-z0-9]', '', 'g'))
          AS BIGINT) AS c
        FROM w),
      rec AS (
        SELECT doc_id, pos, tok, c, c AS cum, 0 AS chunk_idx
        FROM wc WHERE pos = 1
        UNION ALL
        SELECT wc.doc_id, wc.pos, wc.tok, wc.c,
          CASE WHEN rec.cum + wc.c > 24 THEN wc.c
               ELSE rec.cum + wc.c END,
          CASE WHEN rec.cum + wc.c > 24 THEN rec.chunk_idx + 1
               ELSE rec.chunk_idx END
        FROM rec JOIN wc
          ON wc.doc_id = rec.doc_id AND wc.pos = rec.pos + 1)
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        CAST(sum(c) AS BIGINT) AS n_chunk_tokens,
        string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM rec GROUP BY doc_id, chunk_idx
      ORDER BY doc_id, chunk_idx""",

    // q142: token-budgeted packing — same token rule per doc, offsets
    // by window sum, pack spans by integer division
    "q142_token_pack" -> """
      WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
      tk AS (SELECT doc_id,
        CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(t, '\s+') END AS toks
        FROM d),
      est AS (SELECT doc_id,
        CAST(coalesce(list_sum(list_transform(toks, w ->
          coalesce(list_sum(list_transform(
            regexp_extract_all(w, '[A-Za-z]+'), r -> (length(r)+3)//4)), 0)
          + length(regexp_replace(w, '[^0-9]', '', 'g'))
          + length(regexp_replace(w, '[A-Za-z0-9]', '', 'g')))), 0)
          AS BIGINT) AS est_tokens
        FROM tk),
      o AS (SELECT doc_id, est_tokens,
        CAST(coalesce(sum(est_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_offset
        FROM est)
      SELECT doc_id, est_tokens, start_offset,
        CAST(start_offset // 512 AS BIGINT) AS pack_first,
        CAST(greatest(start_offset + est_tokens - 1, start_offset) // 512
          AS BIGINT) AS pack_last
      FROM o ORDER BY doc_id""",

    // q131: the ANN pipeline — near-dup closure (recursive CTE, q66's
    // component form over cosine pairs), canonical keep, then exact
    // brute-force ranking over the SURVIVORS; recall_ok pinned 1
    "q131_ann_pipeline" -> """
      WITH RECURSIVE
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a, e b WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.v, b.v) >= 0.45),
      ed AS (SELECT id_a AS src, id_b AS dst FROM p
             UNION SELECT id_b, id_a FROM p),
      r(src, dst) AS (SELECT src, dst FROM ed
                      UNION
                      SELECT r.src, ed.dst FROM r JOIN ed ON r.dst = ed.src),
      comp AS (SELECT src AS id, least(src, min(dst)) AS c FROM r GROUP BY src),
      surv AS (SELECT vec_id, v FROM e LEFT JOIN comp ON e.vec_id = comp.id
               WHERE comp.c IS NULL OR comp.c = e.vec_id),
      q AS (SELECT vec_id AS qid, v AS qv FROM surv WHERE vec_id < 5),
      s AS (SELECT qid, s2.vec_id AS cid, list_cosine_similarity(s2.v, qv) AS cos
            FROM surv s2, q WHERE s2.vec_id <> qid),
      rr AS (SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
             FROM s)
      SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
        CAST(rn AS INT) AS rank, CAST(1 AS INT) AS recall_ok
      FROM rr WHERE rn <= 10
      ORDER BY query_id, rank""",

    // q130: nested DDL — both phases recomputed from raw customer
    // (pre_drop still sees info.bal; current nulls it), nested_ok pinned
    "q130_nested_ddl" -> """
      SELECT 'pre_drop' AS phase, c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c_custkey % 13 = 0
                           THEN c_custkey % 100 END) AS BIGINT) AS rank_sum,
             CAST(sum(c_custkey % 1000) AS BIGINT) AS bal_sum,
             CAST(1 AS INT) AS nested_ok
      FROM customer GROUP BY c_mktsegment
      UNION ALL
      SELECT 'current', c_mktsegment, CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN c_custkey % 13 = 0
                           THEN c_custkey % 100 END) AS BIGINT),
             CAST(NULL AS BIGINT), CAST(1 AS INT)
      FROM customer GROUP BY c_mktsegment
      ORDER BY phase, seg""",

    // q129: text normalization — identical dirt injected (DuckDB chr()
    // is codepoint-based), then NFC + Cc/Cf strip + collapse + trim
    // reproduced rule for rule
    "q129_clean_text" -> """
      WITH c AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(
          nfc_normalize(chr(11) || ' ' || text || '  e' || chr(769) || ' '
            || chr(1) || 'tail ' || chr(8203) || 'z'),
          '[\p{Cc}\p{Cf}]', ' ', 'g'), '\s+', ' ', 'g')) AS cleaned
        FROM documents)
      SELECT doc_id, cleaned, CAST(length(cleaned) AS INT) AS n_chars_clean
      FROM c ORDER BY doc_id""",

    // q127: decimal widening — recompute the widened-scale arithmetic in
    // DuckDB decimals (integer-derived values, no double rounding);
    // sums compared as scale-4 strings, widen_ok pinned 1
    "q127_widen_decimal" -> """
      SELECT c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CASE WHEN c_custkey % 11 = 0
               THEN CAST(CAST(c_custkey % 100000 + 0.25 AS DECIMAL(9,2))
                      AS DECIMAL(22,4))
                    + CAST('100000000000.1234' AS DECIMAL(22,4))
               ELSE CAST(CAST(c_custkey % 100000 + 0.25 AS DECIMAL(9,2))
                      AS DECIMAL(22,4)) END) AS DECIMAL(32,4)) AS VARCHAR)
               AS bal_sum,
             CAST(1 AS INT) AS widen_ok
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q123_widen_type" -> """
      SELECT c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c_custkey % 7 = 0
                           THEN (c_custkey % 1000) + 4000000000
                           ELSE c_custkey % 1000 END) AS BIGINT) AS cnt_sum,
             CAST(1 AS INT) AS widen_ok
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // incremental dedup: exact Jaccard pairs TOUCHING the new batch
    // (id % 3 = 0), incr_found pinned to 1 — the persisted-index probe
    // must surface every true pair the batch introduces
    "q117_incremental_dedup" ->
      (shingleJaccardPairs(0.6) + """
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
        CAST(1 AS INT) AS incr_found
      FROM jp WHERE id_a % 3 = 0 OR id_b % 3 = 0
      ORDER BY id_a, id_b"""),

    // q126: STREAMING incremental dedup — the epoch-unioned pair stream
    // must surface every exact-Jaccard >= 0.6 pair (same-epoch pairs via
    // new-vs-new, cross-epoch via the persisted-index probe);
    // stream_found pinned to 1
    "q126_stream_dedup" ->
      (shingleJaccardPairs(0.6) + """
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
        CAST(1 AS INT) AS stream_found
      FROM jp ORDER BY id_a, id_b"""),

    "q42_simhash_pairs" ->
      (shingleJaccardPairs(0.8) + """
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
        CAST(1 AS INT) AS banding_complete
      FROM jp ORDER BY id_a, id_b"""),

    "q66_neardup_dedup" ->
      (shingleJaccardPairs(0.5, recursive = true) + """,
      e AS (SELECT id_a AS src, id_b AS dst FROM jp
            UNION SELECT id_b, id_a FROM jp),
      r(src, dst) AS (SELECT src, dst FROM e
                      UNION
                      SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
      comp AS (SELECT src AS id, least(src, min(dst)) AS c FROM r GROUP BY src)
      SELECT doc_id, n_chars
      FROM documents LEFT JOIN comp ON documents.doc_id = comp.id
      WHERE comp.c IS NULL OR comp.c = doc_id
      ORDER BY doc_id"""),

    "q43_embedding_neardup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_cosine_similarity(a.v, b.v) AS c
            FROM e a, e b WHERE a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(c, 6) AS cosine, CAST(1 AS INT) AS recall_ok
      FROM p WHERE c >= 0.45
      ORDER BY id_a, id_b""",

    // q96: same exact-pair set as q43; the pinned recall_ok proves the
    // cluster-bucketed (SemDeDup) path recovers >= 70% of true pairs
    "q96_semantic_dedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_cosine_similarity(a.v, b.v) AS c
            FROM e a, e b WHERE a.vec_id < b.vec_id)
      SELECT id_a, id_b, round(c, 6) AS cosine, CAST(1 AS INT) AS recall_ok
      FROM p WHERE c >= 0.45
      ORDER BY id_a, id_b""",

    "q44_lsh_topk" -> annTopKOracle,
    "q45_ivf_topk" -> annTopKOracle,
    "q114_pq_ann" -> annTopKOracle,
    "q124_ivfpq_ann" -> annTopKOracle,
    "q128_sq_ann" -> annTopKOracle,

    "q46_rolling_fingerprint" -> """
      WITH d AS (SELECT doc_id,
        array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ') AS t
        FROM documents),
      cp AS (SELECT doc_id, t,
        list_transform(range(1, length(t) + 1),
          i -> CAST(unicode(substr(t, CAST(i AS INT), 1)) AS BIGINT)) AS cps
        FROM d)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT), cps),
          (h, c) -> (h * 131 + c) % 1000000007) AS rolling_fp,
        CASE WHEN length(t) < 8
          THEN list_reduce(list_prepend(CAST(0 AS BIGINT), cps),
            (h, c) -> (h * 131 + c) % 1000000007)
          ELSE list_aggregate(list_transform(range(1, length(t) - 6),
            i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cps[i:i+7]),
              (h, c) -> (h * 131 + c) % 1000000007)), 'min')
        END AS winnow_fp
      FROM cp ORDER BY doc_id""",
  )

  /** Shared CTE chain for q41/q42/q66: exact Jaccard over lowercased
    * word-3-shingle sets (mirrors `TextFunctions.shingles(lower(text), 3)`
    * + `Dedup.jaccardJoinExact`). The size pre-filter is implied by
    * J >= t (|A∩B| <= min, |A∪B| >= max), so it only prunes work. */
  private def shingleJaccardPairs(t: Double, recursive: Boolean = false): String = {
    val rec = if (recursive) "RECURSIVE " else ""
    s"""
      WITH ${rec}d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
      tk AS (SELECT doc_id, string_split_regex(t, '\\s+') AS toks FROM d),
      sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) <= 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')) END) AS g
             FROM tk),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.g, b.g)) AS i,
              len(list_distinct(list_concat(a.g, b.g))) AS u
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
              AND len(a.g) >= $t * len(b.g) AND len(b.g) >= $t * len(a.g)),
      jp AS (SELECT id_a, id_b, CAST(i AS DOUBLE) / u AS jaccard
             FROM p WHERE u > 0 AND CAST(i AS DOUBLE) / u >= $t)
    """
  }

  // ---- exact BPE oracles (q174/q175) -------------------------------------

  private def sqlEsc(s: String): String = s.replace("'", "''")

  /** The committed merges table as a VALUES list — spliced from the SAME
    * resource the Spark kernel loads ([[graft.functions.Bpe.default]]),
    * so the two engines cannot drift. */
  private lazy val bpeMergesValues: String =
    graft.functions.Bpe.default.merges.zipWithIndex.map {
      case ((l, r), i) => s"(${i + 1}, '${sqlEsc(l)}', '${sqlEsc(r)}')"
    }.mkString(",\n        ")

  /** Same planted fixture docs as `SparkEntry.bpeFixtureDocs`. */
  private lazy val bpeFixtureValues: String = """
      VALUES (-1, 'the quick table merges running 12345 (parens) end-to-end'),
             (-2, 'don''t scan? z#9 Xylophone counting corpus streamsort'),
             (-3, ''), (-4, '   ')"""

  /** The estimate rule (q141/q142's) for one word expression `w`. */
  private def estRule(w: String): String =
    s"""coalesce(list_sum(list_transform(
            regexp_extract_all($w, '[A-Za-z]+'), r -> (length(r)+3)//4)), 0)
          + length(regexp_replace($w, '[^0-9]', '', 'g'))
          + length(regexp_replace($w, '[A-Za-z0-9]', '', 'g'))"""

  /** Relational replay of the EXACT BPE encoder over the distinct
    * pretokens of `tk(doc_id, toks)`: each word starts as its
    * space-joined codepoints (leading/trailing space so edge symbols
    * delimit), and each recursion step applies ONE merge — the
    * lowest-rank pair present, leftmost occurrence — as a first-match
    * string splice. Space-delimited matching is unambiguous because
    * symbols never contain spaces. Terminal states are the rows no
    * merge applies to; token count = spaces − 1. */
  private lazy val bpeEncodeCtes: String = s"""
      wd(tok) AS (SELECT DISTINCT unnest(toks) FROM tk),
      rec AS (
        SELECT tok AS wid,
          ' ' || array_to_string(regexp_extract_all(tok, '.'), ' ') || ' ' AS w
        FROM wd
        UNION ALL
        SELECT r.wid,
          substr(r.w, 1, strpos(r.w, b.pat) - 1) || b.rep ||
            substr(r.w, strpos(r.w, b.pat) + length(b.pat))
        FROM rec r JOIN LATERAL (
          SELECT ' ' || m.lhs || ' ' || m.rhs || ' ' AS pat,
                 ' ' || m.lhs || m.rhs || ' ' AS rep
          FROM merges m
          WHERE strpos(r.w, ' ' || m.lhs || ' ' || m.rhs || ' ') > 0
          ORDER BY m.rank LIMIT 1) b ON true),
      fin AS (
        SELECT wid, length(w) - length(replace(w, ' ', '')) - 1 AS c
        FROM rec r
        WHERE NOT EXISTS (SELECT 1 FROM merges m
          WHERE strpos(r.w, ' ' || m.lhs || ' ' || m.rhs || ' ') > 0))"""

  // ---- byte-level BPE oracle (q210) --------------------------------------

  /** The committed BYTE-level merges as a VALUES list — spliced from
    * the same resource the Spark kernel loads
    * ([[graft.functions.BpeByte.default]]). Symbols are byte-space
    * chars (printable, never a space), so the space-delimited encode
    * machinery carries over unchanged. */
  private lazy val bpeByteMergesValues: String =
    graft.functions.BpeByte.default.merges.zipWithIndex.map {
      case ((l, r), i) => s"(${i + 1}, '${sqlEsc(l)}', '${sqlEsc(r)}')"
    }.mkString(",\n        ")

  /** The GPT-2 byte→unicode bijection as a 256-row VALUES list keyed
    * by UPPERCASE hex pair (DuckDB `hex()` output), generated from the
    * same table the kernel uses. */
  private lazy val bpeByteMapValues: String =
    (0 until 256).map { b =>
      f"('$b%02X', '${sqlEsc(graft.functions.BpeByte.byteToChar(b).toString)}')"
    }.mkString(",\n        ")

  /** The pretokenizer pattern, escaped for a DuckDB string literal —
    * the SAME string Spark compiles
    * ([[graft.functions.BpeByte.PretokenRegex]]), RE2-safe by
    * construction. */
  private lazy val bpeBytePatternSql: String =
    sqlEsc(graft.functions.BpeByte.PretokenRegex)

  /** Same planted fixture docs as `SparkEntry.bpeByteFixtureDocs` —
    * non-ASCII built with chr() codepoints so the bytes match the
    * Spark side's \uXXXX literals exactly. */
  private lazy val bpeByteFixtureValues: String = """
      VALUES (-1, 'don''t scan? It''s $19.99 -- really?!'),
             (-2, 'caf' || chr(233) || ' r' || chr(233) || 'sum' ||
                  chr(233) || ' ' || chr(8364) || '100 at 25' ||
                  chr(176) || 'C'),
             (-3, 'line1' || chr(10) || 'line2' || chr(9) ||
                  'tab  two spaces'),
             (-4, chr(128512) || chr(128512) || ' emoji'),
             (-5, ''),
             (-6, '   ')"""

  /** q210: full relational replay of the byte-level tokenizer —
    * regex pretokenize (identical pattern), byte-map each UTF-8 byte
    * of each distinct pretoken via hex pairs, then the q174 recursive
    * min-rank/leftmost encode chain over the byte merges. */
  private lazy val q210BpeByte: String = s"""
      WITH RECURSIVE
      bmerges(rank, lhs, rhs) AS (VALUES $bpeByteMergesValues),
      bmap(hx, sym) AS (VALUES $bpeByteMapValues),
      d(doc_id, text) AS (
        SELECT doc_id, text FROM documents
        UNION ALL $bpeByteFixtureValues),
      pt AS (SELECT doc_id,
        unnest(regexp_extract_all(text, '$bpeBytePatternSql')) AS tok
        FROM d),
      wd(tok) AS (SELECT DISTINCT tok FROM pt),
      wb AS (SELECT tok, hex(encode(tok)) AS h FROM wd),
      pos AS (SELECT tok, h,
        unnest(range(1, CAST(length(h) // 2 AS BIGINT) + 1)) AS i
        FROM wb),
      sy AS (SELECT p.tok, p.i, bm.sym
        FROM pos p JOIN bmap bm
          ON bm.hx = substr(p.h, CAST(2 * p.i - 1 AS INT), 2)),
      w0 AS MATERIALIZED (SELECT tok,
          ' ' || string_agg(sym, ' ' ORDER BY i) || ' ' AS w
        FROM sy GROUP BY tok),
      rec AS (
        SELECT tok AS wid, w FROM w0
        UNION ALL
        SELECT r.wid,
          substr(r.w, 1, strpos(r.w, b.pat) - 1) || b.rep ||
            substr(r.w, strpos(r.w, b.pat) + length(b.pat))
        FROM rec r JOIN LATERAL (
          SELECT ' ' || m.lhs || ' ' || m.rhs || ' ' AS pat,
                 ' ' || m.lhs || m.rhs || ' ' AS rep
          FROM bmerges m
          WHERE strpos(r.w, ' ' || m.lhs || ' ' || m.rhs || ' ') > 0
          ORDER BY m.rank LIMIT 1) b ON true),
      fin AS (
        SELECT wid, length(w) - length(replace(w, ' ', '')) - 1 AS c
        FROM rec r
        WHERE NOT EXISTS (SELECT 1 FROM bmerges m
          WHERE strpos(r.w, ' ' || m.lhs || ' ' || m.rhs || ' ') > 0)),
      np AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM pt
        GROUP BY doc_id),
      bp AS (SELECT pt.doc_id, CAST(sum(f.c) AS BIGINT) AS b
        FROM pt JOIN fin f ON f.wid = pt.tok GROUP BY pt.doc_id)
      SELECT d.doc_id,
        CAST(coalesce(np.n, 0) AS BIGINT) AS n_pretokens,
        CAST(coalesce(bp.b, 0) AS BIGINT) AS bpe_byte_tokens
      FROM d
      LEFT JOIN np ON np.doc_id = d.doc_id
      LEFT JOIN bp ON bp.doc_id = d.doc_id
      ORDER BY d.doc_id"""

  // ---- stupid-backoff LM oracles (q211/q212) -----------------------------

  /** The shared stupid-backoff chain: trains uni/bi/tri count tables
    * on the clean split (doc_id % 3 = 0), scores every token through
    * trigram→bigram→unigram→OOV with α = 0.4, and aggregates per doc
    * (`agg`: n_tri/n_bi/n_uni/n_oov exact, anll float). `tdoc` carries
    * (doc_id, source, text, toks) so composition lanes can join gates. */
  private def backoffChain(finalSelect: String): String = s"""
      WITH tdoc AS (
        SELECT doc_id, source, text,
          CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        FROM documents),
      tr AS (SELECT toks FROM tdoc WHERE doc_id % 3 = 0),
      ug AS (SELECT unnest(toks) AS g FROM tr),
      uni AS (SELECT g, count(*) AS c1 FROM ug GROUP BY 1),
      bg AS (
        SELECT unnest(list_transform(range(1, len(toks)),
          i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)])) AS g
        FROM tr WHERE len(toks) >= 2),
      bi AS (SELECT g, count(*) AS c2 FROM bg GROUP BY 1),
      tg AS (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
          i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
            || ' ' || toks[CAST(i + 2 AS INT)])) AS g
        FROM tr WHERE len(toks) >= 3),
      tri AS (SELECT g, count(*) AS c3 FROM tg GROUP BY 1),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS v FROM uni),
      tk AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks
        FROM tdoc),
      tk2 AS (SELECT doc_id, i, toks[CAST(i AS INT)] AS w,
          CASE WHEN i >= 2 THEN toks[CAST(i - 1 AS INT)] END AS p1,
          CASE WHEN i >= 3 THEN toks[CAST(i - 2 AS INT)] END AS p2
        FROM tk),
      sc AS (
        SELECT t.doc_id,
          CASE WHEN t.p2 IS NOT NULL AND t3.c3 IS NOT NULL THEN 'tri'
               WHEN t.p1 IS NOT NULL AND b2.c2 IS NOT NULL THEN 'bi'
               WHEN u1.c1 IS NOT NULL THEN 'uni'
               ELSE 'oov' END AS lvl,
          CASE WHEN t.p2 IS NOT NULL AND t3.c3 IS NOT NULL
                 THEN CAST(t3.c3 AS DOUBLE) / CAST(bc.c2 AS DOUBLE)
               WHEN t.p1 IS NOT NULL AND b2.c2 IS NOT NULL
                 THEN CAST(b2.c2 AS DOUBLE) / CAST(uc.c1 AS DOUBLE)
               WHEN u1.c1 IS NOT NULL
                 THEN CAST(u1.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE)
               ELSE 1.0 / CAST(tot.n + tot.v AS DOUBLE) END AS base,
          CASE WHEN t.p2 IS NOT NULL THEN
                 CASE WHEN t3.c3 IS NOT NULL THEN 0
                      WHEN b2.c2 IS NOT NULL THEN 1 ELSE 2 END
               WHEN t.p1 IS NOT NULL THEN
                 CASE WHEN b2.c2 IS NOT NULL THEN 0 ELSE 1 END
               ELSE 0 END AS steps
        FROM tk2 t
        LEFT JOIN tri t3 ON t.p2 IS NOT NULL
          AND t3.g = t.p2 || ' ' || t.p1 || ' ' || t.w
        LEFT JOIN bi bc ON t.p2 IS NOT NULL
          AND bc.g = t.p2 || ' ' || t.p1
        LEFT JOIN bi b2 ON t.p1 IS NOT NULL
          AND b2.g = t.p1 || ' ' || t.w
        LEFT JOIN uni uc ON uc.g = t.p1
        LEFT JOIN uni u1 ON u1.g = t.w
        CROSS JOIN tot),
      agg AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN lvl = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
          CAST(sum(CASE WHEN lvl = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
          CAST(sum(CASE WHEN lvl = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
          CAST(sum(CASE WHEN lvl = 'oov' THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          avg(-ln(CASE WHEN steps = 0 THEN base
                       WHEN steps = 1 THEN 0.4 * base
                       ELSE 0.4 * (0.4 * base) END)) AS anll
        FROM sc GROUP BY doc_id)
      $finalSelect"""

  private lazy val q211BackoffPpl: String = backoffChain("""
      SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
        CAST(coalesce(a.n_tri, 0) AS BIGINT) AS n_tri,
        CAST(coalesce(a.n_bi, 0) AS BIGINT) AS n_bi,
        CAST(coalesce(a.n_uni, 0) AS BIGINT) AS n_uni,
        CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
        round(a.anll, 6) AS nll, round(exp(a.anll), 6) AS ppl
      FROM tdoc d LEFT JOIN agg a ON a.doc_id = d.doc_id
      ORDER BY d.doc_id""")

  /** q212: per-source rollup of the ppl gate (rounded ppl <= 20, the
    * q211 value) composed with the Gopher gate (q132's replay,
    * minWords = 30) — kept-token accounting included. */
  private lazy val q212PplQualityGate: String = backoffChain("""
      , gf AS (
        SELECT doc_id,
          CASE WHEN len(toks2) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(toks2, x -> length(x)))
                      AS DOUBLE) / len(toks2) END AS mwl,
          CASE WHEN len(toks2) = 0 THEN 0.0
               ELSE ((length(text) - length(replace(text, '#', ''))) +
                     (length(text) - length(replace(text, '...', ''))) / 3)
                    / CAST(len(toks2) AS DOUBLE) END AS symr,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(len(list_filter(lines, l ->
                      regexp_matches(trim(l), '^[-*\x{2022}]')))
                      AS DOUBLE) / len(lines) END AS bulr,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(len(list_filter(lines, l ->
                      regexp_matches(trim(l), '(\.\.\.|\x{2026})$')))
                      AS DOUBLE) / len(lines) END AS ellr,
          CASE WHEN len(toks2) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks2, x ->
                      regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / len(toks2) END AS alpr,
          CAST(len(list_filter(list_distinct(toks), x -> x IN
            ('the','be','to','of','and','that','have','with'))) AS INT)
            AS shits,
          CAST(len(toks2) AS INT) AS nw
        FROM (SELECT doc_id, text, toks,
                CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split_regex(trim(text), '\s+') END AS toks2,
                string_split(text, chr(10)) AS lines
              FROM tdoc)),
      flags AS (
        SELECT d.doc_id, d.source,
          CAST(len(d.toks) AS BIGINT) AS n_tokens,
          CASE WHEN a.anll IS NOT NULL
                AND round(exp(a.anll), 6) <= 20.0 THEN 1 ELSE 0 END AS p,
          CASE WHEN g.nw BETWEEN 30 AND 100000
                AND g.mwl BETWEEN 3.0 AND 10.0
                AND g.symr <= 0.1 AND g.bulr <= 0.9 AND g.ellr <= 0.3
                AND g.alpr >= 0.8 AND g.shits >= 2
               THEN 1 ELSE 0 END AS gp
        FROM tdoc d
        LEFT JOIN agg a ON a.doc_id = d.doc_id
        JOIN gf g ON g.doc_id = d.doc_id)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(p) AS BIGINT) AS n_ppl_pass,
        CAST(sum(gp) AS BIGINT) AS n_gopher_pass,
        CAST(sum(p * gp) AS BIGINT) AS n_both,
        CAST(sum(CASE WHEN p * gp = 1 THEN n_tokens ELSE 0 END)
          AS BIGINT) AS kept_tokens
      FROM flags GROUP BY source ORDER BY source""")

  /** Shared sentence-lane CTEs (q180/q183): replay of
    * `SparkEntry.sentencify` over the corpus (every 7th word gains a
    * terminal mark cycling . ! ? by sentence ordinal, plus a final '.'
    * unless the last word was marked), the planted fixture docs, then
    * the `TextFunctions.sentencesOf` marker-replace/split/trim rule.
    * Produces `sd(doc_id, text)` and `ss(doc_id, sents)`. Plain (non-
    * interpolated) string — regexes carry SINGLE backslashes here. */
  private lazy val sentenceCtes: String = """
      sw AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END AS ws
        FROM documents),
      sj AS (SELECT doc_id, ws,
        array_to_string(list_transform(range(1, len(ws) + 1),
          i -> CASE WHEN i % 7 = 0
                 THEN ws[CAST(i AS INT)] ||
                   ['.','!','?'][CAST((i // 7 - 1) % 3 AS INT) + 1]
                 ELSE ws[CAST(i AS INT)] END), ' ') AS j
        FROM sw),
      sd(doc_id, text) AS (
        SELECT doc_id, CASE WHEN len(ws) = 0 THEN ''
          WHEN len(ws) % 7 = 0 THEN j ELSE j || '.' END
        FROM sj
        UNION ALL
        VALUES (-1, 'One. Two sentences here! A third?  And a fourth without end'),
               (-2, 'No terminal punctuation at all'),
               (-3, 'Trailing punct.'),
               (-4, ''),
               (-5, '   '),
               (-6, 'Multi.  Space!   After? Punct. ')),
      ss AS (SELECT doc_id, list_transform(list_filter(
          string_split(regexp_replace(trim(text), '([.!?])\s+',
            '\1' || chr(30), 'g'), chr(30)),
          x -> trim(x) <> ''), x -> trim(x)) AS sents
        FROM sd)"""

  /** q191: relational replay of BPE TRAINING (24 steps, generated
    * CTE chain — the [[bpeMergesValues]] generated-SQL precedent).
    * Per step i over state s{i-1}(repr, count): position-weighted
    * adjacent-pair counts (overlaps included — the trainer's rule),
    * argmax by (count desc, lhs, rhs) with the >= 2 floor, then the
    * leftmost-non-overlapping merge rewrite. The rewrite uses the
    * DOUBLE-SPACE trick: duplicating separators makes DuckDB's
    * left-to-right non-overlapping `replace` consume only one boundary
    * space per match, so back-to-back occurrences ("a b a b", even
    * "a a a") merge exactly like the trainer's single pass; a
    * whitespace re-collapse restores the canonical repr. An exhausted
    * step (no pair twice) carries state unchanged, so all later steps
    * stay empty and ranks remain dense. */
  private lazy val q191BpeTrain: String = {
    val n = 24
    val steps = (1 to n).map { i =>
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""
      a$i AS (SELECT string_split(r, ' ') AS sy, c FROM $prev
              WHERE len(string_split(r, ' ')) > 1),
      p$i AS (SELECT sy, c,
                CAST(unnest(range(1, len(sy))) AS INT) AS ix FROM a$i),
      g$i AS (SELECT sy[ix] AS l, sy[ix + 1] AS rr,
                CAST(sum(c) AS BIGINT) AS pc
              FROM p$i GROUP BY 1, 2),
      b$i AS MATERIALIZED (SELECT l, rr FROM g$i WHERE pc >= 2
              ORDER BY pc DESC, l, rr LIMIT 1),
      s$i AS MATERIALIZED (SELECT CASE WHEN b.l IS NULL THEN s.r ELSE
                trim(regexp_replace(
                  replace(' ' || regexp_replace(s.r, ' ', '  ', 'g') || ' ',
                    ' ' || b.l || '  ' || b.rr || ' ',
                    ' ' || b.l || b.rr || ' '),
                  ' +', ' ', 'g')) END AS r, s.c
              FROM $prev s LEFT JOIN b$i b ON true)"""
    }.mkString(",")
    val ranks = (1 to n).map(i =>
      s"SELECT CAST($i AS INT) AS rank, l AS lhs, rr AS rhs FROM b$i")
      .mkString("\n      UNION ALL ")
    s"""
      WITH d AS (SELECT trim(text) AS t FROM documents),
      tk AS (SELECT CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(t, '\\s+') END AS toks FROM d),
      wc AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT unnest(toks) AS tok FROM tk) GROUP BY tok),
      s0 AS MATERIALIZED (
        SELECT array_to_string(regexp_extract_all(w, '.'), ' ') AS r, c
        FROM wc),
      $steps
      SELECT * FROM ($ranks) ORDER BY rank"""
  }

  /** q192: relational replay of the PageRank POWER ITERATION (6
    * supersteps, generated MATERIALIZED-CTE chain — the q191
    * iterative-state discipline). All arithmetic is exact pico-rank
    * fixed point (positive-operand floor division), so every superstep
    * is order-independent and the chain hash-matches Spark bit for bit:
    * per step, per-edge contributions `(rp·w) // outw` summed by dst,
    * the dangling mass share (zero here — the graph is symmetrized),
    * and the damped update `base + 85·(inflow + share) // 100`. */
  private lazy val q192PageRank: String = pageRankOracle(seeded = false)

  /** q206: the same chain with the PERSONALIZED teleport — the whole
    * (1−d) mass on every 10th supplier, per-seed base
    * `150e9 · nNodes // nSeeds`, total teleport mass identical to the
    * uniform run. */
  private lazy val q206PersonalizedPr: String = pageRankOracle(seeded = true)

  private def pageRankOracle(seeded: Boolean): String = {
    val iters = 6
    // seeded mode: the dangling total is redistributed over the SEEDS
    // (dangTotal // nSeeds per seed, 0 elsewhere — the personalization
    // vector), uniform mode over all nodes; `nb.b > 0` identifies the
    // teleport targets in both modes (per-seed base is always positive)
    val dangDiv = if (seeded) "(SELECT n FROM ns)" else "(SELECT n FROM nn)"
    val steps = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""
      inf$i AS (SELECT en.dst AS id,
          CAST(sum((r.rp * en.w) // en.outw) AS BIGINT) AS f
        FROM en JOIN $prev r ON r.id = en.src GROUP BY en.dst),
      dg$i AS (SELECT CAST(coalesce(sum(r.rp), 0) AS BIGINT)
            // $dangDiv AS share
        FROM $prev r JOIN dang d ON d.id = r.id),
      r$i AS MATERIALIZED (SELECT n.id,
          CAST(nb.b + (85 * (coalesce(f.f, 0) +
            CASE WHEN nb.b > 0 THEN dg.share ELSE 0 END)) // 100
            AS BIGINT) AS rp
        FROM nodes n
        JOIN nb ON nb.id = n.id
        LEFT JOIN inf$i f ON f.id = n.id CROSS JOIN dg$i dg)"""
    }.mkString(",")
    val baseCte =
      if (!seeded) """
      ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      nb AS MATERIALIZED (SELECT id, CAST(150000000000 AS BIGINT) AS b
        FROM nodes)"""
      else s"""
      seeds AS (SELECT id FROM nodes
                WHERE id >= $SuppNodeOffset
                  AND (id - $SuppNodeOffset) % 10 = 0),
      ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seeds),
      nb AS MATERIALIZED (SELECT id,
          CAST(CASE WHEN id IN (SELECT id FROM seeds)
            THEN (150000000000 * (SELECT n FROM nn)) // (SELECT n FROM ns)
            ELSE 0 END AS BIGINT) AS b
        FROM nodes)"""
    s"""
      WITH e0 AS MATERIALIZED (
        SELECT o.o_custkey AS c, $SuppNodeOffset + l.l_suppkey AS sk,
          CAST(count(*) AS BIGINT) AS w
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      en AS MATERIALIZED (
        SELECT src, dst, w,
          CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS outw
        FROM (SELECT c AS src, sk AS dst, w FROM e0
              UNION ALL SELECT sk, c, w FROM e0)),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM en
        UNION SELECT DISTINCT dst FROM en),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      dang AS (SELECT id FROM nodes
               WHERE id NOT IN (SELECT src FROM en)),$baseCte,
      r0 AS MATERIALIZED (
        SELECT id, CAST(1000000000000 AS BIGINT) AS rp FROM nodes),
      $steps
      SELECT id AS node_id, rp AS rank_pico FROM r$iters
      ORDER BY rank_pico DESC, node_id LIMIT 30"""
  }

  /** q216: the HITS power iteration replayed as a generated
    * MATERIALIZED-CTE chain (the q192 discipline) — per superstep:
    * authority = in-edge hub sum, max-normalize to `unit` (exact
    * floor division, never reorders), hub = out-edge authority sum,
    * normalize. All integers; scores hash-match bit for bit. */
  private lazy val q216Hits: String = {
    val (iters, unit) = (4, 1000000L)
    val steps = (1 to iters).map { i =>
      s"""
      ar$i AS (SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS v
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS id, sum(h.v) AS v
          FROM e JOIN h${i - 1} h ON h.id = e.src GROUP BY e.dst) s
          ON s.id = n.id),
      am$i AS (SELECT CAST(max(v) AS BIGINT) AS m FROM ar$i),
      a$i AS MATERIALIZED (SELECT id,
          CAST((v * $unit) // (SELECT m FROM am$i) AS BIGINT) AS v
        FROM ar$i),
      hr$i AS (SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS v
        FROM nodes n LEFT JOIN (
          SELECT e.src AS id, sum(a.v) AS v
          FROM e JOIN a$i a ON a.id = e.dst GROUP BY e.src) s
          ON s.id = n.id),
      hm$i AS (SELECT CAST(max(v) AS BIGINT) AS m FROM hr$i),
      h$i AS MATERIALIZED (SELECT id,
          CAST((v * $unit) // (SELECT m FROM hm$i) AS BIGINT) AS v
        FROM hr$i)"""
    }.mkString(",")
    s"""
      WITH e AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS src,
          $SuppNodeOffset + l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e),
      h0 AS MATERIALIZED (SELECT id, CAST($unit AS BIGINT) AS v FROM nodes),
      $steps
      SELECT n.id AS node_id, h.v AS hub_score, a.v AS auth_score
      FROM nodes n
      JOIN h$iters h ON h.id = n.id
      JOIN a$iters a ON a.id = n.id
      ORDER BY n.id"""
  }

  /** q218: synchronous label propagation replayed as a generated CTE
    * chain — per round, neighbor-label counts then the (count desc,
    * label asc) argmax per node. No fixpoint claim: the round budget
    * is the contract, so the chain replays EXACTLY the four rounds. */
  private lazy val q218LabelPropagation: String = {
    val rounds = 4
    val steps = (1 to rounds).map { i =>
      s"""
      cnt$i AS (SELECT und.u AS id, l.label AS lb,
          CAST(count(*) AS BIGINT) AS c
        FROM und JOIN l${i - 1} l ON l.id = und.v GROUP BY 1, 2),
      l$i AS MATERIALIZED (SELECT id, lb AS label FROM (
          SELECT id, lb, row_number() OVER (PARTITION BY id
            ORDER BY c DESC, lb ASC) AS rn
          FROM cnt$i) WHERE rn = 1)"""
    }.mkString(",")
    s"""
      WITH e0 AS MATERIALIZED (
        SELECT o.o_custkey AS c, $SuppNodeOffset + l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      und AS MATERIALIZED (
        SELECT c AS u, sk AS v FROM e0 UNION SELECT sk, c FROM e0),
      l0 AS MATERIALIZED (
        SELECT DISTINCT u AS id, u AS label FROM und),
      $steps
      SELECT id AS node_id, label FROM l$rounds ORDER BY id"""
  }

  /** q196: the BFS relaxation chain, generated (the q192 discipline).
    * Step i: min over relaxed in-edges vs the carried distance; seeds
    * are every 10th supplier node. */
  private lazy val q196ShortestPaths: String = {
    val hops = 4
    val steps = (1 to hops).map { i =>
      val prev = s"d${i - 1}"
      s"""
      r$i AS (SELECT e.dst AS id, CAST(min(d.d) + 1 AS BIGINT) AS c
        FROM e JOIN $prev d ON d.id = e.src
        WHERE d.d IS NOT NULL GROUP BY e.dst),
      d$i AS MATERIALIZED (SELECT n.id,
          CASE WHEN n.d IS NULL THEN r.c
               WHEN r.c IS NULL THEN n.d
               ELSE least(n.d, r.c) END AS d
        FROM $prev n LEFT JOIN r$i r ON r.id = n.id)"""
    }.mkString(",")
    s"""
      WITH e0 AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, $SuppNodeOffset + l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      e AS MATERIALIZED (
        SELECT c AS src, sk AS dst FROM e0
        UNION ALL SELECT sk, c FROM e0),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e),
      d0 AS MATERIALIZED (SELECT id,
          CASE WHEN id >= $SuppNodeOffset AND (id - $SuppNodeOffset) % 10 = 0
               THEN CAST(0 AS BIGINT) END AS d
        FROM nodes),
      $steps
      SELECT id AS node_id, CAST(coalesce(d, -1) AS BIGINT) AS dist
      FROM d$hops ORDER BY id"""
  }

  /** q203: the k-core peel replayed as a fixed 12-round generated chain
    * (peeling is idempotent after its fixpoint, and the Spark operator
    * fail-fasts if the fixpoint needs more than 12 rounds — so the
    * fixed chain IS the fixpoint). */
  private lazy val q203KCore: String = {
    val (k, rounds) = (5, 12)
    val steps = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""
      d$i AS (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM (
          SELECT a AS id FROM $prev UNION ALL SELECT b FROM $prev)
        GROUP BY id),
      s$i AS MATERIALIZED (SELECT id FROM d$i WHERE dg >= $k),
      e$i AS MATERIALIZED (SELECT a, b FROM $prev
        WHERE a IN (SELECT id FROM s$i) AND b IN (SELECT id FROM s$i))"""
    }.mkString(",")
    s"""
      WITH e0 AS MATERIALIZED (
        SELECT o.o_custkey AS a, $SuppNodeOffset + l.l_suppkey AS b
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      $steps
      SELECT id AS node_id FROM (
        SELECT a AS id FROM e$rounds UNION SELECT b FROM e$rounds)
      ORDER BY id"""
  }

  /** q202: the token-budget mixture replay — the multiplicative hash,
    * the per-source (hash, id) order, the exclusive window prefix sum,
    * and the `offset < budget` keep rule. */
  private lazy val q202TokenMixture: String = s"""
      WITH t AS (SELECT doc_id, source,
          CASE WHEN trim(text) = '' THEN 0
               ELSE CAST(coalesce(list_sum(list_transform(
                   string_split_regex(trim(text), '\\s+'),
                   w -> ${estRule("w")})), 0) AS BIGINT)
          END AS c,
          (doc_id + 42) * 2654435761 % 2147483648 AS h
        FROM documents),
      o AS (SELECT source, doc_id, c,
          CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS off
        FROM t)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN off < 3000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN off < 3000 THEN c ELSE 0 END) AS BIGINT)
          AS kept_tokens
      FROM o GROUP BY source ORDER BY source"""

  /** q198: the shard-manifest replay — estimate token costs (the q174
    * est rule), an exclusive window prefix sum in doc_id order, the
    * `offset // budget` shard rule, and the per-shard aggregate. */
  private lazy val q198ShardAssign: String = s"""
      WITH t AS (SELECT doc_id,
          CASE WHEN trim(text) = '' THEN 0
               ELSE CAST(coalesce(list_sum(list_transform(
                   string_split_regex(trim(text), '\\s+'),
                   w -> ${estRule("w")})), 0) AS BIGINT)
          END AS c
        FROM documents),
      o AS (SELECT doc_id, c,
          CAST(coalesce(sum(c) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS off
        FROM t),
      s AS (SELECT doc_id, c, off // 2000 AS shard_id FROM o)
      SELECT CAST(shard_id AS BIGINT) AS shard_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM s GROUP BY shard_id ORDER BY shard_id"""

  /** q209: the q196 relaxation chain with weighted edges — cost
    * `1 + 100 // w`, parallel edges collapsed to the cheapest,
    * min(d + cost) per step (bounded Bellman–Ford). */
  private lazy val q209WeightedPaths: String = {
    val hops = 4
    val steps = (1 to hops).map { i =>
      val prev = s"d${i - 1}"
      s"""
      r$i AS (SELECT e.dst AS id, CAST(min(d.d + e.cost) AS BIGINT) AS c
        FROM e JOIN $prev d ON d.id = e.src
        WHERE d.d IS NOT NULL GROUP BY e.dst),
      d$i AS MATERIALIZED (SELECT n.id,
          CASE WHEN n.d IS NULL THEN r.c
               WHEN r.c IS NULL THEN n.d
               ELSE least(n.d, r.c) END AS d
        FROM $prev n LEFT JOIN r$i r ON r.id = n.id)"""
    }.mkString(",")
    s"""
      WITH e0 AS MATERIALIZED (
        SELECT o.o_custkey AS c, $SuppNodeOffset + l.l_suppkey AS sk,
          CAST(count(*) AS BIGINT) AS w
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      e AS MATERIALIZED (
        SELECT src, dst, CAST(min(1 + 100 // w) AS BIGINT) AS cost FROM (
          SELECT c AS src, sk AS dst, w FROM e0
          UNION ALL SELECT sk, c, w FROM e0)
        GROUP BY src, dst),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS id FROM e UNION SELECT dst FROM e),
      d0 AS MATERIALIZED (SELECT id,
          CASE WHEN id >= $SuppNodeOffset AND (id - $SuppNodeOffset) % 10 = 0
               THEN CAST(0 AS BIGINT) END AS d
        FROM nodes),
      $steps
      SELECT id AS node_id, CAST(coalesce(d, -1) AS BIGINT) AS dist
      FROM d$hops ORDER BY id"""
  }

  private lazy val q174BpeTokens: String = s"""
      WITH RECURSIVE
      merges(rank, lhs, rhs) AS (VALUES $bpeMergesValues),
      d(doc_id, text) AS (
        SELECT doc_id, text FROM documents
        UNION ALL $bpeFixtureValues),
      tk AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\\s+') END AS toks FROM d),
      $bpeEncodeCtes,
      dw AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
      bp AS (SELECT dw.doc_id, CAST(sum(f.c) AS BIGINT) AS bpe
             FROM dw JOIN fin f ON f.wid = dw.tok GROUP BY dw.doc_id)
      SELECT tk.doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(coalesce(list_sum(list_transform(toks, w -> ${estRule("w")})), 0)
          AS BIGINT) AS est_tokens,
        CAST(coalesce(bp.bpe, 0) AS BIGINT) AS bpe_tokens
      FROM tk LEFT JOIN bp ON bp.doc_id = tk.doc_id
      ORDER BY tk.doc_id"""

  /** q141's greedy fold CTE, budgeted by the EXACT per-word costs from
    * the encode recursion. */
  private lazy val q175BpeChunks: String = s"""
      WITH RECURSIVE
      merges(rank, lhs, rhs) AS (VALUES $bpeMergesValues),
      d(doc_id, text) AS (
        SELECT doc_id, text FROM documents
        UNION ALL $bpeFixtureValues),
      tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
             FROM d WHERE trim(text) <> ''),
      $bpeEncodeCtes,
      w AS (SELECT doc_id,
        CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
        unnest(toks) AS tok
        FROM tk),
      wc AS (SELECT w.doc_id, w.pos, w.tok, f.c
             FROM w JOIN fin f ON f.wid = w.tok),
      recc AS (
        SELECT doc_id, pos, tok, c, c AS cum, 0 AS chunk_idx
        FROM wc WHERE pos = 1
        UNION ALL
        SELECT wc.doc_id, wc.pos, wc.tok, wc.c,
          CASE WHEN recc.cum + wc.c > 16 THEN wc.c
               ELSE recc.cum + wc.c END,
          CASE WHEN recc.cum + wc.c > 16 THEN recc.chunk_idx + 1
               ELSE recc.chunk_idx END
        FROM recc JOIN wc
          ON wc.doc_id = recc.doc_id AND wc.pos = recc.pos + 1)
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        CAST(sum(c) AS BIGINT) AS n_chunk_tokens,
        string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM recc GROUP BY doc_id, chunk_idx
      ORDER BY doc_id, chunk_idx"""

  /** q44/q45/q114/q124 share one oracle: the exact brute-force top-10
    * (q35's query) with the ANN recall flag pinned to 1. */
  private def annTopKOracle: String = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      s AS (SELECT qid, vec_id AS cid, list_cosine_similarity(v, qv) AS cos
            FROM e, q WHERE vec_id <> qid),
      r AS (SELECT qid, cid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
            FROM s)
      SELECT qid AS query_id, cid AS vec_id, round(cos, 6) AS cosine,
        CAST(rn AS INT) AS rank, CAST(1 AS INT) AS recall_ok
      FROM r WHERE rn <= 10
      ORDER BY query_id, rank"""
}
