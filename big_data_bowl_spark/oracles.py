"""DuckDB oracle SQL twins for :mod:`queries`.

Every statement mirrors its Spark query's semantics EXACTLY: same column
names (driver sorts columns by name before hashing), same types (counts/
ranks BIGINT, floats DOUBLE), same rounding (6 decimals applied at the same
point in the computation), same tie-breaks.  Tables are pre-registered
views: region nation customer supplier part orders lineitem events
documents embeddings.
"""

from __future__ import annotations

# shared fragments -----------------------------------------------------------

_STOP_ALL = "('a','and','das','der','des','die','ein','el','et','la','le','les','los','of','por','que','the','to','una','und')"
_EN = "('the','a','of','and','to')"
_FR = "('le','la','et','les','des')"
_DE = "('der','die','und','das','ein')"
_ES = "('el','los','una','por','que')"

ORACLES: dict[str, str] = {}

ORACLES["q_flagship_truespeed"] = """
-- integer-cents residuals (functions.scalar.cents): exact long sums make
-- the mean bit-identical to Spark at any SF / partition order
WITH c AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events),
resid AS (
    SELECT user_id,
           vc - lag(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rc
    FROM c),
board AS (
    SELECT r.user_id, cu.c_name,
           CAST(sum(abs(r.rc)) AS BIGINT) / count(*) / 100.0 AS truespeed,
           count(*) AS n_frames
    FROM resid r LEFT JOIN customer cu ON r.user_id = cu.c_custkey
    WHERE r.rc IS NOT NULL
    GROUP BY 1, 2)
SELECT user_id, c_name, round(truespeed, 6) AS truespeed, n_frames,
       rank() OVER (ORDER BY truespeed DESC) AS rank
FROM board
"""

ORACLES["q_filter_project"] = """
SELECT l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice, 6) AS l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 25
"""

ORACLES["q_case_norm_filter"] = """
SELECT c_custkey, c_name, upper(c_mktsegment) AS segment
FROM customer
WHERE lower(c_mktsegment) = 'building'
"""

ORACLES["q_set_membership"] = """
SELECT event_id, user_id, event_type
FROM events
WHERE event_type NOT IN ('error', 'signup')
"""

ORACLES["q_null_range_filter"] = """
SELECT event_id, user_id, round(value, 6) AS value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE value IS NOT NULL AND value > 100.0
  AND json_extract_string(props, '$.k') IS NOT NULL
"""

ORACLES["q_label_attach"] = """
SELECT l_orderkey, l_linenumber, o_orderstatus,
       round(o_totalprice, 6) AS o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""

ORACLES["q_semi_join"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
"""

ORACLES["q_enrich_left"] = """
WITH totals AS (
    SELECT user_id AS c_custkey, sum(value) AS total_value
    FROM events GROUP BY 1)
SELECT c.c_custkey, c.c_name,
       round(coalesce(t.total_value, 0.0), 6) AS total_value
FROM customer c LEFT JOIN totals t ON c.c_custkey = t.c_custkey
"""

ORACLES["q_nearest_in_group"] = """
WITH mins AS (
    SELECT c_custkey, min(abs(c_acctbal - s_acctbal)) AS md
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    GROUP BY 1)
SELECT c.c_nationkey AS nationkey, c.c_custkey,
       round(m.md, 6) AS min_bal_dist
FROM customer c LEFT JOIN mins m ON c.c_custkey = m.c_custkey
"""

# separation family (J6/J7/J8): shared synthesized-tracking fragment —
# must stay byte-equivalent to queries._sep_tracking
_SEP_T = """
    SELECT user_id % 25 AS play_id, event_id % 8 AS frame_id,
           event_id AS player_id,
           CASE WHEN event_type IN ('click', 'view')
                THEN 'Offense' ELSE 'Defense' END AS side,
           value AS x, CAST(event_id % 97 AS DOUBLE) AS y
    FROM events"""

ORACLES["q_catch_separation"] = f"""
WITH t AS ({_SEP_T}),
f AS (SELECT * FROM t WHERE frame_id = 3),
o AS (SELECT * FROM f WHERE lower(side) = 'offense'),
d AS (SELECT * FROM f WHERE lower(side) = 'defense'),
m AS (
    SELECT o.play_id, o.player_id,
           min(sqrt(pow(d.x - o.x, 2) + pow(d.y - o.y, 2))) AS sep
    FROM o JOIN d ON o.play_id = d.play_id
    GROUP BY 1, 2)
SELECT b.play_id, b.player_id, round(m.sep, 6) AS separation
FROM (SELECT DISTINCT play_id, player_id FROM o) b
LEFT JOIN m ON b.play_id = m.play_id AND b.player_id = m.player_id
"""

ORACLES["q_initial_separation"] = f"""
WITH t AS ({_SEP_T}),
f AS (SELECT * FROM t
      QUALIFY frame_id = max(frame_id) OVER (PARTITION BY play_id)),
o AS (SELECT * FROM f WHERE lower(side) = 'offense'),
d AS (SELECT * FROM f WHERE lower(side) = 'defense'),
m AS (
    SELECT o.play_id, o.player_id,
           min(sqrt(pow(d.x - o.x, 2) + pow(d.y - o.y, 2))) AS sep
    FROM o JOIN d ON o.play_id = d.play_id
    GROUP BY 1, 2)
SELECT b.play_id, b.player_id, round(m.sep, 6) AS separation
FROM (SELECT DISTINCT play_id, player_id FROM o) b
LEFT JOIN m ON b.play_id = m.play_id AND b.player_id = m.player_id
"""

ORACLES["q_defender_sep_frame"] = f"""
WITH t AS ({_SEP_T}),
o AS (SELECT * FROM t WHERE lower(side) = 'offense'),
d AS (SELECT * FROM t WHERE lower(side) = 'defense'),
m AS (
    SELECT o.play_id, o.frame_id, o.player_id,
           min(sqrt(pow(d.x - o.x, 2) + pow(d.y - o.y, 2))) AS sep
    FROM o JOIN d ON o.play_id = d.play_id AND o.frame_id = d.frame_id
    GROUP BY 1, 2, 3)
SELECT b.play_id, b.frame_id, b.player_id,
       round(coalesce(m.sep, 20.0), 6) AS separation
FROM (SELECT DISTINCT play_id, frame_id, player_id FROM o) b
LEFT JOIN m ON b.play_id = m.play_id AND b.frame_id = m.frame_id
            AND b.player_id = m.player_id
"""

ORACLES["q_frame_diff"] = """
SELECT event_id, user_id,
       round(coalesce(value - lag(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6) AS dvalue
FROM events
"""

ORACLES["q_converge_rate_lead"] = """
SELECT event_id, user_id,
       round(coalesce(value - lead(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6) AS converge_rate
FROM events
"""

ORACLES["q_cum_index"] = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq_idx,
       event_id - min(event_id) OVER (PARTITION BY user_id) AS id_offset
FROM events
"""

ORACLES["q_zscore_in_group"] = """
SELECT event_id, event_type,
       round(greatest(least(
           CASE WHEN stddev_pop(value) OVER (PARTITION BY event_type) = 0
                  OR stddev_pop(value) OVER (PARTITION BY event_type) IS NULL
                THEN 0.0
                ELSE (value - avg(value) OVER (PARTITION BY event_type))
                     / stddev_pop(value) OVER (PARTITION BY event_type)
           END, 3.0), -3.0), 6) AS z
FROM events
"""

ORACLES["q_rank_leaderboard"] = """
WITH board AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           / count(value) / 100.0 AS mean_value,
           count(*) AS n_events
    FROM events GROUP BY 1)
SELECT user_id, round(mean_value, 6) AS mean_value, n_events,
       rank() OVER (ORDER BY mean_value DESC) AS rank
FROM board
"""

ORACLES["q_argmax_frame"] = """
SELECT user_id, event_id, event_type, round(value, 6) AS value
FROM events
QUALIFY event_id = max(event_id) OVER (PARTITION BY user_id)
"""

ORACLES["q_dedup_keep_last"] = """
SELECT user_id, event_type, event_id, round(value, 6) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""

ORACLES["q_topk_per_group"] = """
SELECT user_id, event_id, round(value, 6) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id DESC) <= 3
"""

ORACLES["q_tpch_q1"] = """
-- integer-cents pricing: price*(1-disc)[*(1+tax)] as exact long products
-- (2/4/6 implied decimals), so billion-scale sums agree bit-for-bit
WITH c AS (
    SELECT l_returnflag, l_linestatus, l_quantity,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
           CAST(round(l_discount * 100) AS BIGINT) AS dc,
           CAST(round(l_tax * 100) AS BIGINT) AS tc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-02 00:00:00')
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(CAST(sum(pc) AS BIGINT) / 100.0, 6) AS sum_base_price,
       round(CAST(sum(pc * (100 - dc)) AS BIGINT) / 1e4, 6) AS sum_disc_price,
       round(CAST(sum(pc * (100 - dc) * (100 + tc)) AS BIGINT) / 1e6, 6)
           AS sum_charge,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(CAST(sum(pc) AS BIGINT) / count(*) / 100.0, 6) AS avg_price,
       round(CAST(sum(dc) AS BIGINT) / count(*) / 100.0, 6) AS avg_disc,
       count(*) AS count_order
FROM c
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q_trajectory_features"] = """
SELECT user_id,
       round(arg_min(value, event_id), 6) AS start_value,
       round(arg_max(value, event_id), 6) AS end_value,
       round(max(value) - min(value), 6) AS value_range,
       count(*) AS n_frames,
       round(avg(value), 6) AS value_mean,
       round(max(value), 6) AS value_max,
       round(stddev_samp(value), 6) AS value_std
FROM events
GROUP BY user_id
"""

ORACLES["q_group_stats"] = """
SELECT event_type,
       round(avg(value), 6) AS mean,
       round(max(value), 6) AS max,
       round(min(value), 6) AS min,
       round(stddev_samp(value), 6) AS std,
       round(median(value), 6) AS median,
       count(value) AS n
FROM events
GROUP BY event_type
"""

ORACLES["q_quantiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS q25,
       round(quantile_cont(value, 0.75), 6) AS q75,
       round(quantile_cont(value, 0.90), 6) AS q90
FROM events
GROUP BY event_type
"""

ORACLES["q_value_counts"] = """
SELECT event_type, count(*) AS count
FROM events GROUP BY event_type
"""

ORACLES["q_distinct_users"] = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type
"""

ORACLES["q_scalar_threshold"] = """
WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
SELECT user_id, n FROM counts
WHERE n >= (SELECT max(n) * 0.5 FROM counts)
"""

ORACLES["q_conditional_flags"] = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       round(avg(CASE WHEN value > 150.0 THEN 1.0 ELSE 0.0 END), 6) AS big_rate
FROM events GROUP BY user_id
"""

ORACLES["q_corr_trend"] = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS pearson_r,
       round(covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity), 6) AS slope,
       round(avg(l_extendedprice)
             - (covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity))
               * avg(l_quantity), 6) AS intercept,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["q_minmax_norm"] = """
WITH board AS (SELECT user_id, avg(value) AS mv FROM events GROUP BY 1)
SELECT user_id,
       round(CASE WHEN max(mv) OVER () = min(mv) OVER () THEN 50.0
                  ELSE 100.0 * (mv - min(mv) OVER ())
                       / (max(mv) OVER () - min(mv) OVER ())
             END, 6) AS score_100
FROM board
"""

ORACLES["q_safe_div"] = """
WITH agg AS (
    SELECT user_id, sum(value) AS total_value,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n
    FROM events GROUP BY 1)
SELECT user_id,
       round(CASE WHEN n = 0 THEN NULL ELSE total_value / n END, 6) AS value_per_purchase
FROM agg
"""

ORACLES["q_piecewise_score"] = """
WITH agg AS (
    SELECT user_id, avg(value) AS ts, stddev_pop(value) AS re,
           avg(value) / 50.0 AS sep
    FROM events GROUP BY 1)
SELECT user_id,
       round(CASE WHEN sep > 5.0 THEN ts + 0.05
                  ELSE 0.8 * ts * (1.0 + 0.5 * (1.0 - (greatest(least(sep, 2.0), 0.5) - 0.5) / 1.5))
                       + 0.2 * re
             END, 6) AS hybrid_iq
FROM agg
"""

ORACLES["q_scorecard"] = """
WITH board AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           / count(value) / 100.0 AS mean_value,
           count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) / 100.0 AS purchase_value
    FROM events GROUP BY 1),
qual AS (
    SELECT * FROM board
    WHERE n_events >= (SELECT max(n_events) * 0.25 FROM board)),
scored AS (
    SELECT *,
           CASE WHEN max(mean_value) OVER () = min(mean_value) OVER () THEN 50.0
                ELSE 100.0 * (mean_value - min(mean_value) OVER ())
                     / (max(mean_value) OVER () - min(mean_value) OVER ())
           END AS score_100
    FROM qual)
SELECT user_id, round(mean_value, 6) AS mean_value, n_events,
       round(purchase_value, 6) AS purchase_value,
       round(score_100, 6) AS score_100,
       rank() OVER (ORDER BY score_100 DESC) AS rank
FROM scored
"""

ORACLES["q_top_orders"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""

ORACLES["q_union_dedup"] = """
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events
WHERE value > 150.0 OR event_type = 'error'
"""

ORACLES["q_sequence_build"] = """
WITH seqs AS (
    SELECT user_id, list(value ORDER BY event_id) AS vals
    FROM events GROUP BY user_id),
kept AS (
    SELECT user_id,
           list_slice(vals, greatest(len(vals) - 9, 1), len(vals)) AS k
    FROM seqs)
SELECT user_id,
       CAST(len(k) AS BIGINT) AS real_len,
       concat(array_to_string(list_transform(k, x -> printf('%.2f', x)), ','),
              repeat(',0.00', 10 - len(k))) AS seq_str
FROM kept
"""

ORACLES["q_unpivot_sequences"] = """
WITH base AS (
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS t,
           round(value, 6) AS actual,
           round(avg(value) OVER (PARTITION BY user_id), 6) AS pred
    FROM events)
SELECT user_id, t, actual, pred, round(actual - pred, 6) AS residual
FROM base
"""

ORACLES["q_dedup_exact"] = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""

ORACLES["q_text_quality"] = f"""
WITH base AS (
    SELECT doc_id,
           length(text) AS n_chars,
           list_filter(string_split(text, ' '), t -> t <> '') AS toks,
           length(replace(text, ' ', '')) AS n_nospace,
           length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_nopunct
    FROM documents)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(CASE WHEN len(toks) = 0 THEN NULL
                  ELSE CAST(len(list_filter(toks, t -> t IN {_STOP_ALL})) AS DOUBLE)
                       / len(toks) END, 6) AS stopword_ratio,
       round(CASE WHEN len(toks) = 0 THEN NULL
                  ELSE CAST(n_nospace AS DOUBLE) / len(toks) END, 6) AS mean_token_len,
       round(CASE WHEN n_chars = 0 THEN NULL
                  ELSE CAST(n_chars - n_nopunct AS DOUBLE) / n_chars END, 6) AS punct_ratio
FROM base
"""

ORACLES["q_language_id"] = f"""
WITH base AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents),
hits AS (
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> t IN {_EN})) AS BIGINT) AS en_hits,
           CAST(len(list_filter(toks, t -> t IN {_FR})) AS BIGINT) AS fr_hits,
           CAST(len(list_filter(toks, t -> t IN {_DE})) AS BIGINT) AS de_hits,
           CAST(len(list_filter(toks, t -> t IN {_ES})) AS BIGINT) AS es_hits
    FROM base)
SELECT doc_id, en_hits, fr_hits, de_hits, es_hits,
       CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
            WHEN fr_hits >= de_hits AND fr_hits >= es_hits THEN 'fr'
            WHEN de_hits >= es_hits THEN 'de'
            ELSE 'es' END AS predicted_lang
FROM hits
"""

ORACLES["q_ngram_jaccard"] = """
WITH raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5
"""

ORACLES["q_containment"] = """
WITH raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / sa.n_tok, 6) AS containment,
       CAST(sa.n_tok AS BIGINT) AS n_a,
       CAST(sb.n_tok AS BIGINT) AS n_b
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / sa.n_tok, 6) >= 0.8 AND sb.n_tok > sa.n_tok
"""

ORACLES["q_winnow_pairs"] = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents),
th AS (
    SELECT doc_id,
           list_transform(tk, t -> list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(t) + 1),
                              c -> ascii(substr(t, c, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007)) AS hs
    FROM toks),
grams AS (
    SELECT doc_id, i,
           list_reduce(list_prepend(7::BIGINT, list_slice(hs, i, i + 3)),
                       (acc, h) -> (acc * 31 + h) % 1000000007) AS h
    FROM th, UNNEST(generate_series(1, len(hs) - 3)) AS t(i)),
nw AS (SELECT doc_id, greatest(count(*) - 4 + 1, 1) AS n_win
       FROM grams GROUP BY 1),
wins AS (SELECT doc_id, j
         FROM nw, UNNEST(generate_series(1, n_win)) AS s(j)),
sel AS (
    SELECT w.doc_id, w.j, g.h
    FROM wins w JOIN grams g
      ON g.doc_id = w.doc_id AND g.i BETWEEN w.j AND w.j + 3
    QUALIFY row_number() OVER (PARTITION BY w.doc_id, w.j
                               ORDER BY g.h ASC, g.i DESC) = 1),
fp AS (SELECT DISTINCT doc_id, h FROM sel),
dfreq AS (SELECT h, count(*) AS df FROM fp GROUP BY 1),
kept AS (SELECT fp.doc_id, fp.h FROM fp JOIN dfreq USING (h)
         WHERE dfreq.df <= 100)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""

ORACLES["q_leakage_split"] = """
WITH RECURSIVE raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs),
walk(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
comp AS (SELECT node AS doc_id, min(reach) AS component
         FROM walk GROUP BY node),
tagged AS (
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS gkey,
           CASE WHEN coalesce(c.component, d.doc_id) % 5 = 0
                THEN 'val' ELSE 'train' END AS split
    FROM documents d LEFT JOIN comp c USING (doc_id)),
leaks AS (
    SELECT count(*) AS n_leaked_pairs
    FROM pairs p
    JOIN tagged ta ON p.doc_a = ta.doc_id
    JOIN tagged tb ON p.doc_b = tb.doc_id
    WHERE ta.split <> tb.split)
SELECT split, count(*) AS n_docs,
       count(DISTINCT gkey) AS n_groups,
       (SELECT n_leaked_pairs FROM leaks) AS n_leaked_pairs
FROM tagged GROUP BY split
"""

ORACLES["q_asof_join"] = """
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
views AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       round(p.value, 6) AS purchase_value,
       round(v.value, 6) AS last_view_value
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

ORACLES["q_salted_agg"] = """
SELECT event_type,
       round(sum(value), 6) AS total,
       count(value) AS n,
       round(min(value), 6) AS min,
       round(max(value), 6) AS max,
       round(avg(value), 6) AS mean
FROM events GROUP BY event_type
"""

ORACLES["q_cluster_centroids"] = """
SELECT label,
       round(avg(embedding[1]::DOUBLE), 6) AS c0,
       round(avg(embedding[2]::DOUBLE), 6) AS c1,
       round(avg(embedding[3]::DOUBLE), 6) AS c2,
       count(*) AS n
FROM embeddings GROUP BY label
"""

ORACLES["q_centroid_score"] = """
WITH dims AS (
    SELECT vec_id, label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           unnest(embedding)::DOUBLE AS x
    FROM embeddings),
cents AS (
    SELECT label, dim, avg(x) AS centroid
    FROM dims GROUP BY label, dim),
dists AS (
    SELECT d.vec_id, d.label,
           sqrt(sum((d.x - c.centroid) ^ 2)) AS dist
    FROM dims d JOIN cents c ON d.label = c.label AND d.dim = c.dim
    GROUP BY d.vec_id, d.label)
SELECT vec_id, label, round(dist, 6) AS dist,
       round(CASE WHEN max(-dist) OVER () = min(-dist) OVER () THEN 50.0
                  ELSE 100.0 * (-dist - min(-dist) OVER ())
                       / (max(-dist) OVER () - min(-dist) OVER ())
             END, 6) AS score_100
FROM dists
"""

ORACLES["q_onehot"] = """
SELECT event_id,
       CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS is_click,
       CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS is_error,
       CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS is_purchase,
       CASE WHEN event_type = 'signup' THEN 1.0 ELSE 0.0 END AS is_signup,
       CASE WHEN event_type = 'view' THEN 1.0 ELSE 0.0 END AS is_view
FROM events
"""

ORACLES["q_group_split"] = """
SELECT CASE WHEN user_id % 5 = 0 THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""

ORACLES["q_closest_to_median"] = """
WITH scored AS (
    SELECT event_type, event_id, value,
           round(quantile_cont(value, 0.5) OVER (PARTITION BY event_type), 6) AS med,
           round(abs(value - quantile_cont(value, 0.5)
                     OVER (PARTITION BY event_type)), 6) AS dist
    FROM events)
SELECT event_type, event_id, round(value, 6) AS value, med
FROM scored
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY dist ASC, event_id ASC) = 1
"""

ORACLES["q_tpch_q3"] = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, order_date
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLES["q_tpch_q5"] = """
SELECT n_name,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 1e4, 6)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

ORACLES["q_window_agg_hourly"] = """
-- integer-cents value reduction (engine-invariant mean, see cents())
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / 100.0, 6) AS total_value,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / count(value) / 100.0, 6) AS mean_value
FROM events
GROUP BY 1, 2
"""

ORACLES["q_sessionize"] = """
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events),
islands AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM islands
GROUP BY user_id, session_id
"""

ORACLES["q_token_counts"] = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
            AS BIGINT) AS n_bpe_pieces
FROM documents
"""

ORACLES["q_union_by_name"] = """
SELECT event_id, user_id, round(value, 6) AS value
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, NULL AS value
FROM events WHERE event_type = 'error'
"""

ORACLES["q_cosine_topk"] = """
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM vecs q JOIN vecs c ON q.vec_id <> c.vec_id
    WHERE q.vec_id IN (0, 1, 2, 3, 4))
SELECT query_id, neighbor_id, cosine
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) <= 3
"""

ORACLES["q_fingerprint"] = """
SELECT doc_id,
       list_min(list_transform(
         list_filter(string_split(text, ' '), t -> t <> '')[1:8],
         t -> list_reduce(
                list_prepend(7::BIGINT,
                  list_transform(range(1, length(t) + 1),
                                 i -> ascii(substr(t, i, 1))::BIGINT)),
                (acc, c) -> (acc * 31 + c) % 1000000007)
       )) AS fingerprint
FROM documents
"""

ORACLES["q_multimodal_features"] = """
WITH codes AS (
  SELECT doc_id, text,
    list_transform(range(1, least(length(text), 256) + 1),
                   i -> ascii(substr(text, i, 1))::DOUBLE) AS vals,
    list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, i, 1))::BIGINT) AS allb
  FROM documents)
SELECT doc_id AS media_id, 'image/fake' AS media_type,
       length(text)::BIGINT AS n_bytes,
       (list_sum(allb) % 2147483648)::BIGINT AS checksum,
       list_avg(vals) AS feat_mean,
       coalesce(list_aggregate(vals, 'stddev_pop'), 0.0) AS feat_std
FROM codes
"""

ORACLES["q_heavy_hitters"] = """
SELECT l_partkey, count(*) AS n
FROM lineitem
GROUP BY 1
HAVING count(*) >= 40
"""

ORACLES["q_bloom_semi_join"] = """
SELECT l_returnflag,
       count(*) AS n_items,
       round(sum(l_quantity), 6) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > 450000)
GROUP BY 1
"""

# Z-order: the 32-term Morton interleave is generated, not hand-typed —
# bit b of the normalized x lands at position 2b, of y at 2b+1.
_Z_TERMS = " + ".join(
    f"(((zx >> {b}) & 1) << {2 * b}) + (((zy >> {b}) & 1) << {2 * b + 1})"
    for b in range(16))
ORACLES["q_zorder_values"] = f"""
WITH base AS (
    SELECT event_id, user_id AS x,
           CAST(floor(epoch(ts)) AS BIGINT) AS y
    FROM events),
ext AS (
    SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi
    FROM base),
nrm AS (
    SELECT event_id,
           CASE WHEN xhi = xlo THEN 0
                ELSE CAST(floor((x - xlo) * 65535 / (xhi - xlo)) AS BIGINT)
           END AS zx,
           CASE WHEN yhi = ylo THEN 0
                ELSE CAST(floor((y - ylo) * 65535 / (yhi - ylo)) AS BIGINT)
           END AS zy
    FROM base, ext)
SELECT event_id, CAST({_Z_TERMS} AS BIGINT) AS zval
FROM nrm
"""

ORACLES["q_dup_components"] = """
WITH RECURSIVE raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs),
walk(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a)
SELECT node::BIGINT AS doc_id, min(reach)::BIGINT AS component
FROM walk GROUP BY node
"""

ORACLES["q_decontaminate"] = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents),
bgrams AS (
    SELECT DISTINCT array_to_string(list_slice(tk, i, i + 1), ' ') AS g
    FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)
    WHERE doc_id % 97 = 0),
dgrams AS (
    SELECT DISTINCT doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') AS g
    FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)
    WHERE doc_id % 97 <> 0),
cnt AS (
    SELECT d.doc_id,
           count(b.g) AS n_overlap,
           count(*) AS n_grams
    FROM dgrams d LEFT JOIN bgrams b USING (g)
    GROUP BY 1)
SELECT doc_id,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       CAST(n_grams AS BIGINT) AS n_grams,
       round(n_overlap / n_grams, 6) AS overlap_frac
FROM cnt
WHERE n_overlap >= 5
"""

ORACLES["q_rollup_revenue"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["q_tpch_q6"] = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 1e4, 6) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["q_exists_late_ship"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""

ORACLES["q_tpch_q10"] = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["q_tpch_q12"] = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""

ORACLES["q_anti_join"] = """
SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT')
"""

ORACLES["q_cube_qty"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["q_interval_join"] = """
SELECT a.event_id, err.err_event_id, a.user_id, a.event_type,
       round(a.value, 6) AS value
FROM events a
JOIN (SELECT user_id, event_id AS err_event_id,
             ts - INTERVAL 6 HOUR AS w_start,
             ts + INTERVAL 6 HOUR AS w_end
      FROM events WHERE event_type = 'error') err
  ON a.user_id = err.user_id
 AND a.ts >= err.w_start AND a.ts <= err.w_end
 AND a.event_id <> err.err_event_id
"""

ORACLES["q_training_prep"] = f"""
WITH canon AS (
    SELECT * FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
feats AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), t -> t <> '') AS toks,
           length(text) AS n_chars,
           length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_nopunct
    FROM canon),
scored AS (
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           CAST(len(list_filter(toks, t -> t IN {_STOP_ALL})) AS DOUBLE)
               / len(toks) AS stopword_ratio,
           CAST(n_chars - n_nopunct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(len(list_filter(toks, t -> t IN {_EN})) AS BIGINT) AS en_hits,
           CAST(len(list_filter(toks, t -> t IN {_FR})) AS BIGINT) AS fr_hits,
           CAST(len(list_filter(toks, t -> t IN {_DE})) AS BIGINT) AS de_hits,
           CAST(len(list_filter(toks, t -> t IN {_ES})) AS BIGINT) AS es_hits
    FROM feats),
labeled AS (
    SELECT *,
           CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits
                     AND en_hits >= es_hits THEN 'en'
                WHEN fr_hits >= de_hits AND fr_hits >= es_hits THEN 'fr'
                WHEN de_hits >= es_hits THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM scored
    WHERE n_tokens >= 20 AND round(stopword_ratio, 6) >= 0.01)
SELECT predicted_lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(round(stopword_ratio, 6)), 6) AS avg_stopword_ratio,
       round(avg(round(punct_ratio, 6)), 6) AS avg_punct_ratio,
       round(avg(CASE WHEN predicted_lang = lang THEN 1.0 ELSE 0.0 END), 6)
           AS langid_accuracy
FROM labeled
GROUP BY predicted_lang
"""

ORACLES["q_tpch_q7"] = """
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 1e4, 6)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""

ORACLES["q_hash_sample"] = """
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 < 858993459
"""

# Shard id = wang_mixed_hash(doc_id) mod 8 — the full mixed chain (the
# sampling family's multiplicative reduction alone would leak low bits
# into the mod-8 id and skew shard sizes).
ORACLES["q_shard_stats"] = """
WITH h0 AS (
    SELECT doc_id, n_chars,
           ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM documents),
h1 AS (
    SELECT doc_id, n_chars,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT doc_id, n_chars,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT doc_id, n_chars,
           CAST(xor(hv, hv >> 16) % 8 AS INT) AS shard
    FROM h2)
SELECT shard, count(*) AS n_rows,
       count(DISTINCT doc_id) AS n_keys,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM h GROUP BY 1
"""

# Quota sampling: same wang chain on doc_id orders each source's docs
# deterministically; the running-sum cut keeps whole docs within budget.
# (qh, doc_id) is unique per source, so DuckDB's RANGE default frame and
# Spark's running sum agree row-for-row.
ORACLES["q_quota_sample"] = """
WITH h0 AS (
    SELECT source, doc_id, n_chars,
           ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM documents),
h1 AS (
    SELECT source, doc_id, n_chars,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT source, doc_id, n_chars,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT source, doc_id, n_chars, xor(hv, hv >> 16) AS hv
    FROM h2),
c AS (
    SELECT source, n_chars,
           sum(n_chars) OVER (PARTITION BY source
                              ORDER BY hv, doc_id) AS cum
    FROM h)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_kept
FROM c WHERE cum <= 3000
GROUP BY 1
"""

ORACLES["q_rolling_active_users"] = """
WITH act AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM act),
dau AS (
    SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY 1),
wau AS (
    SELECT d.day, count(DISTINCT a.user_id) AS wau
    FROM days d JOIN act a
      ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1)
SELECT day, dau, wau FROM dau JOIN wau USING (day)
"""

ORACLES["q_table_profile"] = """
SELECT 'event_id' AS "column",
       CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS VARCHAR) AS min_value,
       CAST(max(event_id) AS VARCHAR) AS max_value
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) - count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
FROM events
UNION ALL
SELECT 'event_type', CAST(count(*) - count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'value', CAST(count(*) - count(value) AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT),
       CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
FROM events
"""

ORACLES["q_period_over_period"] = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events GROUP BY 1, 2)
SELECT d.event_type, d.day,
       round(d.c / 100.0, 2) AS total,
       round((d.c - d1.c) / 100.0, 2) AS dod_delta,
       round((d.c - d7.c) / 100.0, 2) AS wow_delta
FROM daily d
LEFT JOIN daily d1
  ON d1.event_type = d.event_type AND d1.day = d.day - 1
LEFT JOIN daily d7
  ON d7.event_type = d.event_type AND d7.day = d.day - 7
"""

ORACLES["q_new_vs_returning"] = """
WITH act AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (
    SELECT user_id, min(day) AS first_day FROM act GROUP BY 1)
SELECT a.day,
       CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
FROM act a JOIN first f USING (user_id)
GROUP BY 1
"""

ORACLES["q_group_entropy"] = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY 1, 2),
terms AS (
    SELECT user_id, n,
           round(-(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY user_id))
                 * log2(CAST(n AS DOUBLE)
                        / sum(n) OVER (PARTITION BY user_id)), 9) AS t
    FROM counts)
SELECT user_id, round(sum(t), 6) AS entropy,
       CAST(sum(n) AS BIGINT) AS n_events
FROM terms GROUP BY 1
"""

ORACLES["q_basket_lift"] = """
WITH items AS (
    SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           count(*) AS n_ab
    FROM items a JOIN items b USING (user_id)
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2),
per_item AS (
    SELECT event_type, count(*) AS n_item FROM items GROUP BY 1),
total AS (
    SELECT count(DISTINCT user_id) AS n_total FROM items)
SELECT p.item_a, p.item_b, p.n_ab,
       round(CAST(p.n_ab AS DOUBLE) / t.n_total, 6) AS support,
       round(CAST(p.n_ab AS DOUBLE) / ia.n_item, 6) AS conf_ab,
       round(CAST(p.n_ab AS DOUBLE) / ib.n_item, 6) AS conf_ba,
       round(CAST(p.n_ab AS DOUBLE) * t.n_total
             / (ia.n_item * ib.n_item), 6) AS lift
FROM pairs p
JOIN per_item ia ON p.item_a = ia.event_type
JOIN per_item ib ON p.item_b = ib.event_type
CROSS JOIN total t
"""

ORACLES["q_cohort_ltv"] = """
WITH first AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
    FROM events GROUP BY 1),
cells AS (
    SELECT f.cohort_day,
           CAST(CAST(e.ts AS DATE) - f.cohort_day AS BIGINT)
             AS offset_days,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events e JOIN first f USING (user_id)
    GROUP BY 1, 2)
SELECT cohort_day, offset_days,
       round(c / 100.0, 2) AS period_value,
       round(sum(c) OVER (PARTITION BY cohort_day ORDER BY offset_days
                          ROWS UNBOUNDED PRECEDING) / 100.0, 2)
         AS cum_value
FROM cells
"""

ORACLES["q_chi_square"] = """
WITH cells AS (
    SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
rowt AS (SELECT lang, sum(n) AS r FROM cells GROUP BY 1),
colt AS (SELECT source, sum(n) AS c FROM cells GROUP BY 1),
tot AS (SELECT sum(n) AS t FROM cells),
terms AS (
    SELECT round(power(ce.n - CAST(r.r * c.c AS DOUBLE) / t.t, 2)
                 / (CAST(r.r * c.c AS DOUBLE) / t.t), 9) AS term
    FROM cells ce
    JOIN rowt r USING (lang)
    JOIN colt c USING (source)
    CROSS JOIN tot t),
dims AS (
    SELECT (SELECT count(*) FROM rowt) AS nr,
           (SELECT count(*) FROM colt) AS nc)
SELECT round(sum(term), 6) AS chi2,
       CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT) AS dof
FROM terms
"""

ORACLES["q_ks_drift"] = """
WITH tagged AS (
    SELECT value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
    FROM events WHERE event_type IN ('purchase', 'error')),
per_val AS (
    SELECT value, sum(is_a) AS ca, sum(1 - is_a) AS cb
    FROM tagged GROUP BY 1),
cum AS (
    SELECT sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
             AS cum_a,
           sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
             AS cum_b
    FROM per_val),
totals AS (
    SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM tagged)
SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
       round(CAST(max(abs(c.cum_a * t.nb - c.cum_b * t.na)) AS DOUBLE)
             / (t.na * t.nb), 6) AS ks_stat
FROM cum c CROSS JOIN totals t
GROUP BY t.na, t.nb
"""

ORACLES["q_auc_exact"] = """
WITH obs AS (
    SELECT value AS s,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
per AS (
    SELECT s, CAST(sum(pos) AS BIGINT) AS p, count(*) AS t
    FROM obs GROUP BY 1),
cum AS (
    SELECT p, t,
           CAST(sum(t) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS ct
    FROM per),
agg AS (
    SELECT CAST(sum(CAST(p AS HUGEINT)
                    * (2 * CAST(ct - t AS HUGEINT) + t + 1))
                AS HUGEINT) AS r2,
           CAST(sum(p) AS HUGEINT) AS np,
           CAST(sum(t) - sum(p) AS HUGEINT) AS nn
    FROM cum)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(r2 - np * (np + 1) AS DOUBLE)
         / CAST(2 * np * nn AS DOUBLE) AS auc
FROM agg
"""

ORACLES["q_auc_by_group"] = """
WITH obs AS (
    SELECT dayofweek(ts) + 1 AS dow, value AS s,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
per AS (
    SELECT dow, s, CAST(sum(pos) AS BIGINT) AS p, count(*) AS t
    FROM obs GROUP BY 1, 2),
cum AS (
    SELECT dow, p, t,
           CAST(sum(t) OVER (PARTITION BY dow ORDER BY s
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
    FROM per),
agg AS (
    SELECT dow,
           CAST(sum(CAST(p AS HUGEINT)
                    * (2 * CAST(ct - t AS HUGEINT) + t + 1))
                AS HUGEINT) AS r2,
           CAST(sum(p) AS HUGEINT) AS np,
           CAST(sum(t) - sum(p) AS HUGEINT) AS nn
    FROM cum GROUP BY 1)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(r2 - np * (np + 1) AS DOUBLE)
         / CAST(2 * np * nn AS DOUBLE) AS auc
FROM agg
"""

ORACLES["q_cumulative_gains"] = """
WITH e AS (
    SELECT value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
bounds AS (
    SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
    FROM e),
bins AS (
    SELECT 9 - len(list_filter(bo.b, x -> e.value > x)) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos
    FROM e CROSS JOIN bounds bo GROUP BY 1)
SELECT bin, n, n_pos,
       CAST(sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_pos,
       CAST(sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            AS BIGINT)
         / (SELECT CAST(sum(n_pos) AS BIGINT) FROM bins)
         AS capture_rate
FROM bins
"""

ORACLES["q_classification_report"] = """
WITH e AS (
    SELECT CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS pred,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
agg AS (
    SELECT CAST(sum(pred * pos) AS BIGINT) AS tp,
           CAST(sum(pred * (1 - pos)) AS BIGINT) AS fp,
           CAST(sum((1 - pred) * pos) AS BIGINT) AS fn,
           CAST(sum((1 - pred) * (1 - pos)) AS BIGINT) AS tn
    FROM e)
SELECT tp, fp, fn, tn,
       tp / (tp + fp) AS precision,
       tp / (tp + fn) AS recall,
       2 * tp / (2 * tp + fp + fn) AS f1
FROM agg
"""

ORACLES["q_calibration_bins"] = """
WITH e AS (
    SELECT value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
bounds AS (
    SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
    FROM e)
SELECT len(list_filter(bo.b, x -> e.value > x)) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
         / count(*) / 100.0 AS mean_score,
       CAST(sum(pos) AS BIGINT) / count(*) AS pos_rate
FROM e CROSS JOIN bounds bo
GROUP BY 1
"""

ORACLES["q_trending_decay"] = """
WITH anchor AS (
    SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t0 FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(round(power(2.0,
                -(CAST(a.t0 - CAST(floor(epoch(ts)) AS BIGINT)
                       AS DOUBLE) / 604800.0)), 9)), 6)
         AS decayed_freq
FROM events CROSS JOIN anchor a
GROUP BY 1
"""

ORACLES["q_psi_drift"] = """
WITH e AS (
    SELECT value, CAST(strftime(ts, '%d') AS INT) AS dom FROM events),
ref AS (SELECT value FROM e WHERE dom <= 15),
cur AS (SELECT value FROM e WHERE dom > 15),
bounds AS (
    SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
    FROM ref),
rb AS (
    SELECT len(list_filter(bo.b, x -> r.value > x)) AS bin,
           count(*) AS np
    FROM ref r CROSS JOIN bounds bo GROUP BY 1),
cb AS (
    SELECT len(list_filter(bo.b, x -> c.value > x)) AS bin,
           count(*) AS nq
    FROM cur c CROSS JOIN bounds bo GROUP BY 1),
tot AS (
    SELECT (SELECT count(*) FROM ref) AS tp,
           (SELECT count(*) FROM cur) AS tq),
terms AS (
    SELECT round((rb.np / CAST(t.tp AS DOUBLE)
                  - greatest(coalesce(cb.nq, 0) / CAST(t.tq AS DOUBLE),
                             1e-6))
                 * ln((rb.np / CAST(t.tp AS DOUBLE))
                      / greatest(coalesce(cb.nq, 0)
                                 / CAST(t.tq AS DOUBLE), 1e-6)),
                 9) AS term
    FROM rb LEFT JOIN cb USING (bin) CROSS JOIN tot t)
SELECT round(sum(term), 6) AS psi,
       count(*) AS n_bins
FROM terms
"""

ORACLES["q_gini_concentration"] = """
WITH counts AS (
    SELECT event_type, user_id, count(*) AS x
    FROM events GROUP BY 1, 2),
ranked AS (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, user_id) AS i
    FROM counts)
SELECT event_type,
       round(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
             / CAST(count(*) * sum(x) AS DOUBLE), 6) AS gini,
       count(*) AS n_users
FROM ranked GROUP BY 1
"""

ORACLES["q_path_analysis"] = """
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events),
islands AS (
    SELECT user_id, ts, event_id, event_type,
           sum(new_session) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked),
ranked AS (
    SELECT user_id, session_id, event_type,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM islands),
paths AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ranked WHERE rn <= 5
    GROUP BY 1, 2)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY 1
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""

ORACLES["q_retention_cohorts"] = """
WITH act AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (
    SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
SELECT f.cohort_day,
       CAST(a.day - f.cohort_day AS BIGINT) AS offset_days,
       count(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
"""

ORACLES["q_distribution_windows"] = """
SELECT c_custkey,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""

ORACLES["q_sliding_window"] = """
SELECT event_id, user_id,
       round(avg(value) OVER w, 6) AS trailing_mean,
       round(max(value) OVER w, 6) AS trailing_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

ORACLES["q_tpch_q18"] = """
WITH big AS (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice, 6) AS o_totalprice,
       round(total_qty, 6) AS total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
"""

ORACLES["q_phase3_pipeline"] = """
WITH dims AS (
    SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS val
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
centroids AS (
    SELECT label, dim, avg(val) AS c FROM dims GROUP BY 1, 2),
dist AS (
    SELECT d.vec_id, d.label, sqrt(sum((d.val - c.c) ^ 2)) AS dist
    FROM dims d JOIN centroids c USING (label, dim)
    GROUP BY 1, 2),
iqz AS (
    SELECT vec_id, label,
           CASE WHEN stddev_pop(dist) OVER (PARTITION BY label) = 0
                  OR stddev_pop(dist) OVER (PARTITION BY label) IS NULL
                THEN 0.0
                ELSE (dist - avg(dist) OVER (PARTITION BY label))
                     / stddev_pop(dist) OVER (PARTITION BY label)
           END AS z
    FROM dist),
route AS (
    SELECT vec_id % 15 AS user_id, avg(-z) AS route_exec
    FROM iqz GROUP BY 1),
resid AS (
    SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc,
           CAST(round(value * 100) AS BIGINT)
           - lag(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rc
    FROM events),
ts AS (
    SELECT user_id,
           CAST(sum(abs(rc)) AS BIGINT) / count(*) / 100.0 AS truespeed,
           count(*) AS n_frames,
           CAST(sum(vc) AS BIGINT) / count(*) / 10000.0 AS sep
    FROM resid WHERE rc IS NOT NULL GROUP BY 1),
prod AS (
    SELECT o_custkey AS user_id, sum(o_totalprice) AS total_value,
           count(*) AS n_orders
    FROM orders GROUP BY 1),
master AS (
    SELECT t.user_id, t.truespeed, t.sep, t.n_frames,
           coalesce(r.route_exec, 0.0) AS route_exec,
           coalesce(p.total_value, 0.0) AS total_value,
           coalesce(p.n_orders, 0)::BIGINT AS n_orders
    FROM ts t
    LEFT JOIN route r USING (user_id)
    LEFT JOIN prod p USING (user_id)),
qual AS (
    SELECT * FROM master
    WHERE n_frames >= (SELECT max(n_frames) * 0.5 FROM master)),
scored AS (
    SELECT *,
           CASE WHEN sep > 2.0 THEN truespeed + 0.05
                ELSE 0.8 * truespeed
                     * (1.0 + 0.5 * (1.0 - (greatest(least(sep, 2.0), 0.5)
                                            - 0.5) / 1.5))
                     + 0.2 * route_exec
           END AS air_iq
    FROM qual)
SELECT user_id, round(truespeed, 6) AS truespeed,
       round(route_exec, 6) AS route_exec, n_frames,
       round(air_iq, 6) AS air_play_iq,
       round(total_value, 6) AS total_value, n_orders,
       rank() OVER (ORDER BY air_iq DESC) AS rank
FROM scored
"""

ORACLES["q_pivot_event_types"] = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'error')    AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
"""

ORACLES["q_range_window"] = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 6) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
-- floor() before the cast: DuckDB's double->BIGINT cast ROUNDS while
-- Spark's unix_timestamp truncates; sub-second timestamps would shift
-- the frame boundary by one second without it
"""

ORACLES["q_tpch_q14"] = """
-- integer-cents revenue (functions.scalar.cents rationale)
WITH c AS (
    SELECT p_type,
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4
    FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c4
                               ELSE 0 END) AS BIGINT)
             / CAST(sum(rev_c4) AS BIGINT), 6) AS promo_pct,
       round(CAST(sum(rev_c4) AS BIGINT) / 1e4, 6) AS total_revenue,
       count(*) AS n_items
FROM c
"""

ORACLES["q_tpch_q13"] = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey)
GROUP BY c_count
"""

ORACLES["q_tpch_q15"] = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLES["q_tpch_q16"] = """
SELECT p_brand, p_type,
       ((p_size - 1) // 10)::BIGINT AS size_bucket,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, size_bucket
"""

ORACLES["q_tpch_q17"] = """
WITH branded AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#4'),
avg_qty AS (
    SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
    FROM branded GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
       count(*) AS n_small
FROM branded JOIN avg_qty ON l_partkey = ak
WHERE l_quantity < 0.5 * avg_qty
"""

ORACLES["q_tpch_q19"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size <= 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#17' AND p_size <= 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size <= 15
       AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["q_tpch_q22"] = """
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(sum(c_acctbal), 6) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""

ORACLES["q_tpch_q2"] = """
WITH cand AS (
    SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part ON b.l_partkey = p_partkey
    JOIN supplier ON b.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'ECONOMY' AND p_size < 10 AND r_name = 'EUROPE')
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
       round(s_acctbal, 6) AS s_acctbal
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c.p_partkey)
"""

ORACLES["q_tpch_q8"] = """
SELECT year(o_orderdate)::BIGINT AS o_year,
       round(sum(CASE WHEN ns.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
"""

ORACLES["q_tpch_q9"] = """
SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 - 60 * CAST(round(p_retailprice * 100) AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS BIGINT) / 1e4, 6)
           AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

ORACLES["q_tpch_q11"] = """
WITH val AS (
    SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
    GROUP BY l_partkey)
SELECT l_partkey, round(value, 6) AS value
FROM val
WHERE value > (SELECT sum(value) * 0.001 FROM val)
"""

ORACLES["q_tpch_q20"] = """
WITH pair AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey),
dominant AS (
    SELECT DISTINCT l_suppkey
    FROM (SELECT l_suppkey, pair_qty,
                 sum(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
          FROM pair)
    WHERE pair_qty > 0.3 * part_qty)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_0', 'NATION_3')
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
"""

ORACLES["q_tpch_q21"] = """
WITH per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                               THEN l_suppkey END) AS n_late,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN l_suppkey END) AS late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""

ORACLES["q_repetition"] = """
WITH tok AS (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '),
                                    t -> t <> '')) AS tok
          FROM documents)
    GROUP BY doc_id, tok)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       CAST(max(c) AS BIGINT) AS top_token_count,
       round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_token_share
FROM tok GROUP BY doc_id
"""

ORACLES["q_dup_ngrams"] = """
WITH toks AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents),
c2 AS (
    SELECT doc_id, gram, count(*) AS c
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i + 1])) AS gram
          FROM toks)
    GROUP BY doc_id, gram),
s2 AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS dup_occ,
           CAST(max(c) AS BIGINT) AS top_c
    FROM c2 GROUP BY doc_id),
c3 AS (
    SELECT doc_id, gram, count(*) AS c
    FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
                   AS gram
          FROM toks)
    GROUP BY doc_id, gram),
s3 AS (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS dup_occ,
           CAST(max(c) AS BIGINT) AS top_c
    FROM c3 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(s2.n_grams, 0) AS bg_n_grams,
       COALESCE(s2.dup_occ, 0) AS bg_dup_gram_occurrences,
       round(COALESCE(s2.dup_occ / CAST(s2.n_grams AS DOUBLE), 0.0), 6)
         AS bg_dup_gram_fraction,
       round(COALESCE(s2.top_c / CAST(s2.n_grams AS DOUBLE), 0.0), 6)
         AS bg_top_gram_share,
       COALESCE(s3.n_grams, 0) AS tg_n_grams,
       COALESCE(s3.dup_occ, 0) AS tg_dup_gram_occurrences,
       round(COALESCE(s3.dup_occ / CAST(s3.n_grams AS DOUBLE), 0.0), 6)
         AS tg_dup_gram_fraction,
       round(COALESCE(s3.top_c / CAST(s3.n_grams AS DOUBLE), 0.0), 6)
         AS tg_top_gram_share
FROM documents d
LEFT JOIN s2 ON d.doc_id = s2.doc_id
LEFT JOIN s3 ON d.doc_id = s3.doc_id
"""

ORACLES["q_stratified_sample"] = """
SELECT doc_id, lang, source, n_chars::BIGINT AS n_chars
FROM documents
WHERE (((doc_id % 2147483648) * 2654435761) % 4294967296) / 4294967296.0
      < CASE lang WHEN 'en' THEN 0.1 ELSE 0.5 END
"""

ORACLES["q_nearest_centroid"] = """
WITH comp AS (
    SELECT label, i AS dim, avg(v) AS c
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, i),
vec AS (
    SELECT vec_id, i AS dim, CAST(v AS DOUBLE) AS v
    FROM (SELECT vec_id, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)),
dots AS (
    SELECT vec_id, label AS cand_label, sum(v * c) AS dot
    FROM vec JOIN comp USING (dim)
    GROUP BY 1, 2),
ranked AS (
    SELECT vec_id, cand_label, dot,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, cand_label ASC) AS rn
    FROM dots)
SELECT vec_id, cand_label AS assigned_label, round(dot, 6) AS score
FROM ranked WHERE rn = 1
"""

ORACLES["q_doc_histogram"] = """
SELECT (n_chars // 50)::BIGINT AS bucket,
       count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY bucket
"""

ORACLES["q_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["q_forward_fill"] = """
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type = 'error' THEN NULL
                             ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS filled
FROM events
"""

ORACLES["q_pct_of_total"] = """
WITH per_user AS (
    SELECT user_id, event_type, sum(value) AS user_value
    FROM events GROUP BY 1, 2)
SELECT user_id, event_type,
       round(user_value, 6) AS user_value,
       round(user_value / sum(user_value)
             OVER (PARTITION BY event_type), 6) AS pct_of_type,
       round(user_value / sum(user_value) OVER (), 6) AS pct_of_total
FROM per_user
"""

ORACLES["q_truespeed_variants"] = """
-- integer-cents residuals: every reduction below is over exact longs
WITH c AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events),
resid AS (
    SELECT user_id,
           vc - lag(vc) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rc
    FROM c)
SELECT user_id,
       round(CAST(sum(rc) AS BIGINT) / count(*) / 100.0, 6) AS ts_mean,
       round(median(rc) / 100.0, 6) AS ts_median,
       round(CAST(sum(rc) AS BIGINT) / 100.0, 6) AS ts_sum,
       round(CAST(sum(abs(rc)) AS BIGINT) / count(*) / 100.0, 6) AS ts_mae,
       round(sqrt(CAST(sum(rc * rc) AS BIGINT) / count(*)) / 100.0, 6)
           AS ts_rmse
FROM resid
WHERE rc IS NOT NULL
GROUP BY user_id
"""

ORACLES["q_normalize_flip"] = """
SELECT event_id, user_id,
       round(CASE WHEN event_type = 'error' THEN 120.0 - value
                  ELSE value END, 6) AS x_norm,
       round(CASE WHEN event_type = 'error'
                  THEN fmod(fmod(fmod(event_id::DOUBLE, 360.0) + 180.0,
                                 360.0) + 360.0, 360.0)
                  ELSE fmod(event_id::DOUBLE, 360.0) END, 6) AS dir_norm
FROM events
"""

ORACLES["q_asof_tolerance"] = """
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
views AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       round(p.value, 6) AS purchase_value,
       round(CASE WHEN epoch(p.ts) - epoch(v.ts) <= 3600.0
                  THEN v.value END, 6) AS recent_view_value
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""

# golden replay: the full Submission-pipeline spine on a fixed dyadic
# fixture must reproduce EXACTLY these values (pinned from two independent
# runs at different partition counts; every reduction is IEEE-exact).
# Regenerate only if the fixture in queries.q_scorecard_golden changes.
# Insights-notebook replays: metric means reduce as exact integer units
# (cents / floor-micro long sums), percentile ranks follow pandas'
# rank(pct=True) average method ((rank + (ties-1)/2) / n), and every
# top-k carries an explicit user_id tie-break — all doubles are then
# bit-identical across engines, so no in-engine rounding is applied.
ORACLES["q_archetypes"] = """
WITH m AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / count(*) / 100.0 AS exec_iq,
           CAST(sum(CAST(floor((CASE WHEN (value*7) % 50 < 0
                                     THEN (value*7) % 50 + 50
                                     ELSE (value*7) % 50 END) * 1e6)
                         AS BIGINT)) AS BIGINT)
             / count(*) / 1e6 AS conv_iq,
           count(*) AS routes_run
    FROM events WHERE value IS NOT NULL GROUP BY 1),
style AS (
    SELECT * FROM m
    WHERE routes_run > (SELECT max(routes_run) * 0.4 FROM m)),
ranked AS (
    SELECT user_id, routes_run,
           (rank() OVER (ORDER BY exec_iq)
            + (count(*) OVER (PARTITION BY exec_iq) - 1) / 2.0)
             / count(*) OVER () AS exec_pct,
           (rank() OVER (ORDER BY conv_iq)
            + (count(*) OVER (PARTITION BY conv_iq) - 1) / 2.0)
             / count(*) OVER () AS conv_pct
    FROM style)
SELECT user_id, routes_run, exec_pct, conv_pct,
       CASE WHEN exec_pct > 0.70 AND conv_pct > 0.70
              THEN 'Elite All-Around'
            WHEN exec_pct < 0.40 AND conv_pct > 0.70
              THEN 'Freestyle / Physical Freak'
            WHEN exec_pct > 0.70 AND conv_pct < 0.40
              THEN 'Separator / Technician'
            WHEN exec_pct < 0.40 AND conv_pct < 0.40 THEN 'Struggling'
            ELSE 'Balanced' END AS archetype
FROM ranked
"""

ORACLES["q_metric_correlations"] = """
WITH m AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS x,
           CAST(floor((CASE WHEN (value*7) % 50 < 0
                            THEN (value*7) % 50 + 50
                            ELSE (value*7) % 50 END) * 1e6)
                AS BIGINT) AS y,
           CAST(floor((value - (CASE WHEN (value*7) % 50 < 0
                                     THEN (value*7) % 50 + 50
                                     ELSE (value*7) % 50 END)) * 1e6)
                AS BIGINT) AS z
    FROM events WHERE value IS NOT NULL),
s AS (
    SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(z) AS HUGEINT) AS sz,
           CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
           CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
           CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
    FROM m)
SELECT metric_a, metric_b,
       CAST(num AS DOUBLE) / sqrt(CAST(da AS DOUBLE)
                                  * CAST(db AS DOUBLE)) AS r,
       CAST(n AS BIGINT) AS n_obs
FROM (
    SELECT 'exec' AS metric_a, 'conv' AS metric_b,
           n*sxy - sx*sy AS num, n*sxx - sx*sx AS da,
           n*syy - sy*sy AS db, n FROM s
    UNION ALL
    SELECT 'exec', 'resid', n*sxz - sx*sz, n*sxx - sx*sx,
           n*szz - sz*sz, n FROM s
    UNION ALL
    SELECT 'conv', 'resid', n*syz - sy*sz, n*syy - sy*sy,
           n*szz - sz*sz, n FROM s)
"""

ORACLES["q_route_kings"] = """
WITH rs AS (
    SELECT event_type, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / count(*) / 100.0 AS score,
           count(*) AS n_runs
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
mx AS (SELECT event_type, max(n_runs) AS mxn FROM rs GROUP BY 1),
qual AS (
    SELECT rs.* FROM rs JOIN mx USING (event_type)
    WHERE rs.n_runs >= greatest(5.0, mx.mxn * 0.2))
SELECT event_type AS route, user_id AS best_player, score, n_runs
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY score DESC, user_id) AS rn
      FROM qual)
WHERE rn = 1
"""

ORACLES["q_model_beaters"] = """
WITH m AS (
    SELECT user_id,
           CAST(sum(CAST(floor((value - (CASE WHEN (value*7) % 50 < 0
                                              THEN (value*7) % 50 + 50
                                              ELSE (value*7) % 50 END))
                               * 1e6) AS BIGINT)) AS BIGINT)
             / count(*) / 1e6 AS mean_residual,
           count(*) AS routes_run
    FROM events WHERE value IS NOT NULL GROUP BY 1),
starters AS (
    SELECT * FROM m
    WHERE routes_run > (SELECT max(routes_run) * 0.4 FROM m))
SELECT user_id, mean_residual, routes_run, rn AS rank
FROM (SELECT *, row_number() OVER (ORDER BY mean_residual DESC,
                                   user_id) AS rn
      FROM starters)
WHERE rn <= 10
"""

# Submission-pipeline relational spine with the injected linear model:
# every stage is exact IEEE (pmod via sign-branched %, sqrt/power,
# lag-diff), features cast to REAL exactly as build_sequences' float32
# tensor, the model blend computed in DOUBLE with ONE final REAL cast
# (mirroring predict_sequences' astype(float32)), residuals quantized
# with FLOOR to integer micro-units so the per-player MAE is a
# long-sum (order-free, tie-free across engines).
ORACLES["q_submission_spine"] = """
WITH base AS MATERIALIZED (
    SELECT play_id, frame_id,
           CASE WHEN play_id % 2 = 0 THEN 'left' ELSE 'right' END AS dirn,
           (CASE WHEN value % 100 < 0 THEN value % 100 + 100
                 ELSE value % 100 END) + 10.0 AS x,
           CASE WHEN (value * 7) % 50 < 0 THEN (value * 7) % 50 + 50
                ELSE (value * 7) % 50 END AS y
    FROM (SELECT user_id AS play_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS frame_id
          FROM events WHERE value IS NOT NULL AND user_id < 300)
    WHERE frame_id <= 8),
feat AS MATERIALIZED (
    SELECT play_id, play_id AS nfl_id, frame_id,
           sqrt(power(60.0 - CASE WHEN dirn = 'left'
                                  THEN 120.0 - x ELSE x END, 2)
                + power(25.0 - y, 2)) AS dist
    FROM base
    WHERE play_id % 10 < 8),
conv AS (
    SELECT play_id, nfl_id, frame_id, dist,
           COALESCE(-(dist - lag(dist) OVER (PARTITION BY play_id, nfl_id
                                             ORDER BY frame_id)),
                    0.0) AS cr
    FROM feat),
steps AS (
    SELECT play_id, nfl_id,
           CAST(cr AS REAL) AS a32,
           CASE WHEN CAST(cr AS REAL) = 0 AND CAST(dist AS REAL) = 0
                THEN CAST(0.0 AS REAL)
                ELSE CAST(0.5 * CAST(CAST(cr AS REAL) AS DOUBLE)
                          + 0.25 * CAST(CAST(dist AS REAL) AS DOUBLE)
                          AS REAL) END AS p32
    FROM conv),
ts AS (
    SELECT play_id, nfl_id,
           CAST(sum(abs(CAST(floor((CAST(a32 AS DOUBLE)
                                    - CAST(p32 AS DOUBLE)) * 1e6)
                             AS BIGINT))) AS BIGINT)
             / count(*) / 1e6 AS truespeed,
           count(*) AS n_steps
    FROM steps GROUP BY 1, 2),
mf AS (SELECT play_id, max(frame_id) AS mfr FROM base GROUP BY 1),
sep AS (
    SELECT o.play_id, o.play_id AS nfl_id,
           min(sqrt(power(d.x - o.x, 2)
                    + power((d.y + 3.0) - o.y, 2))) AS separation
    FROM base o
    JOIN mf ON o.play_id = mf.play_id AND o.frame_id = mf.mfr
    JOIN base d ON d.play_id = o.play_id AND d.frame_id = mf.mfr
    GROUP BY 1, 2)
SELECT t.nfl_id, t.truespeed, t.n_steps,
       s.separation AS init_sep,
       CAST(t.play_id % 20 AS DOUBLE) AS yards_gained,
       rank() OVER (ORDER BY t.truespeed DESC) AS rank
FROM ts t LEFT JOIN sep s ON t.play_id = s.play_id
"""

ORACLES["q_submission_pipeline"] = """
WITH base AS MATERIALIZED (
    SELECT play_id, frame_id,
           CASE WHEN play_id % 2 = 0 THEN 'left' ELSE 'right' END AS dirn,
           (CASE WHEN value % 100 < 0 THEN value % 100 + 100
                 ELSE value % 100 END) + 10.0 AS x,
           CASE WHEN (value * 7) % 50 < 0 THEN (value * 7) % 50 + 50
                ELSE (value * 7) % 50 END AS y
    FROM (SELECT user_id AS play_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS frame_id
          FROM events WHERE value IS NOT NULL AND user_id < 300)
    WHERE frame_id <= 8),
feat AS MATERIALIZED (
    SELECT play_id, play_id AS nfl_id, frame_id,
           sqrt(power(60.0 - CASE WHEN dirn = 'left'
                                  THEN 120.0 - x ELSE x END, 2)
                + power(25.0 - y, 2)) AS dist
    FROM base
    WHERE play_id % 10 < 8),
conv AS (
    SELECT play_id, nfl_id, frame_id, dist,
           COALESCE(-(dist - lag(dist) OVER (PARTITION BY play_id, nfl_id
                                             ORDER BY frame_id)),
                    0.0) AS cr
    FROM feat),
steps AS (
    SELECT play_id, nfl_id,
           CAST(cr AS REAL) AS a32,
           CASE WHEN CAST(cr AS REAL) = 0 AND CAST(dist AS REAL) = 0
                THEN CAST(0.0 AS REAL)
                ELSE CAST(0.5 * CAST(CAST(cr AS REAL) AS DOUBLE)
                          + 0.25 * CAST(CAST(dist AS REAL) AS DOUBLE)
                          AS REAL) END AS p32
    FROM conv),
ts AS (
    SELECT play_id, nfl_id,
           CAST(sum(abs(CAST(floor((CAST(a32 AS DOUBLE)
                                    - CAST(p32 AS DOUBLE)) * 1e6)
                             AS BIGINT))) AS BIGINT)
             / count(*) / 1e6 AS truespeed
    FROM steps GROUP BY 1, 2),
card AS (
    SELECT nfl_id,
           avg(truespeed) AS truespeed,
           count(*) AS n_targets,
           sum(CAST(play_id % 20 AS DOUBLE)) AS total_yards
    FROM ts GROUP BY 1)
SELECT nfl_id, truespeed, n_targets, total_yards,
       rank() OVER (ORDER BY truespeed DESC) AS rank
FROM card
"""

ORACLES["q_scorecard_golden"] = """
SELECT CAST(nfl_id AS BIGINT) AS nfl_id,
       CAST(truespeed AS DOUBLE) AS truespeed,
       CAST(n_targets AS BIGINT) AS n_targets,
       CAST(total_yards AS DOUBLE) AS total_yards,
       CAST(rank AS BIGINT) AS rank
FROM (VALUES
    (101, 0.145832, 1, 2.0, 5),
    (102, 0.146537, 1, 4.0, 4),
    (103, 0.147296, 1, 6.0, 3),
    (104, 0.148115, 1, 8.0, 2),
    (105, 0.148999, 1, 10.0, 1)
) AS t(nfl_id, truespeed, n_targets, total_yards, rank)
"""

ORACLES["q_group_ksample"] = """
SELECT doc_id, lang, n_chars::BIGINT AS n_chars
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296)
             / 4294967296.0 ASC,
             doc_id ASC) <= 10
"""

ORACLES["q_json_struct"] = """
WITH parsed AS (
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 6) AS avg_k,
       max(k) AS max_k
FROM parsed GROUP BY event_type
"""

ORACLES["q_array_hof"] = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(list_sum(embedding) / len(embedding), 6) AS mean_comp,
       round(list_min(embedding), 6) AS min_comp,
       round(list_max(embedding), 6) AS max_comp,
       round(sqrt(list_dot_product(embedding, embedding)), 6) AS l2_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
"""

ORACLES["q_eval_metrics"] = """
WITH p AS (
    SELECT value AS actual,
           lag(value) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pred
    FROM events)
SELECT round(avg((actual - pred) * (actual - pred)), 6) AS mse,
       round(sqrt(avg((actual - pred) * (actual - pred))), 6) AS rmse,
       round(avg(abs(actual - pred)), 6) AS mae,
       round(1 - sum((actual - pred) * (actual - pred))
               / (sum(actual * actual)
                  - sum(actual) * sum(actual) / count(*)), 6) AS r2
FROM p WHERE pred IS NOT NULL
"""

ORACLES["q_embed_dup"] = """
-- embeddings are FLOAT[]; cast to DOUBLE[] so the fold runs in double
-- like Spark's cast("double") zip_with/aggregate (FLOAT accumulation
-- diverges in the 6th decimal)
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 6)
               AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
WHERE cosine >= 0.25
"""

ORACLES["q_text_normalize"] = """
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
               '\\s+', ' ', 'g')) AS norm_text
    FROM documents)
SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars
FROM n
"""

ORACLES["q_chunk_docs"] = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents),
c AS (
    SELECT doc_id, toks,
           unnest(generate_series(
               0, CAST(ceil(len(toks) / 32.0) AS BIGINT) - 1)) AS chunk_id
    FROM t
    WHERE len(toks) > 0)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(toks, chunk_id * 32 + 1,
                                  chunk_id * 32 + 32), ' ') AS chunk_text,
       CAST(len(list_slice(toks, chunk_id * 32 + 1,
                           chunk_id * 32 + 32)) AS BIGINT) AS n_tokens
FROM c
"""

ORACLES["q_frame_sample"] = """
WITH t AS (
    SELECT doc_id AS media_id,
           CAST(floor(octet_length(encode(text)) / 32) AS BIGINT) AS n_frames
    FROM documents),
f AS (
    SELECT media_id,
           unnest(generate_series(0, n_frames - 1)) AS frame_idx
    FROM t WHERE n_frames > 0)
SELECT media_id, frame_idx, CAST(32 AS BIGINT) AS n_bytes
FROM f WHERE frame_idx % 2 = 0
"""

ORACLES["q_pack_chunks"] = """
WITH t AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents),
c AS (
    SELECT doc_id, lang, toks,
           unnest(generate_series(
               0, CAST(ceil(len(toks) / 32.0) AS BIGINT) - 1)) AS chunk_id
    FROM t WHERE len(toks) > 0),
n AS (
    SELECT doc_id, lang, chunk_id,
           len(list_slice(toks, chunk_id * 32 + 1,
                          chunk_id * 32 + 32)) AS n_tokens
    FROM c),
b AS (
    SELECT lang, doc_id % 8 AS stream, doc_id, chunk_id, n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY lang, doc_id % 8
                           ORDER BY doc_id, chunk_id) - n_tokens)
                      / 256) AS BIGINT) AS bin
    FROM n)
SELECT lang, stream, bin, count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       count(DISTINCT doc_id) AS n_docs
FROM b GROUP BY lang, stream, bin
"""

ORACLES["q_bm25_rank"] = """
WITH tok AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents),
stats AS (
    SELECT count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    t -> t <> ''))) AS BIGINT) AS sum_dl
    FROM documents),
tf AS (
    SELECT doc_id, dl, term, count(*) AS tf
    FROM tok WHERE term IN ('spark', 'join', 'window')
    GROUP BY doc_id, dl, term),
dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                    / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
             6) AS score
FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT 10
"""

ORACLES["q_bigram_scores"] = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, t.pos, t.term FROM documents,
      LATERAL (SELECT unnest(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS term,
                      generate_subscripts(list_filter(
                          string_split(text, ' '), x -> x <> ''), 1)
                        AS pos) t),
pairs AS MATERIALIZED (
    SELECT doc_id, prev, term FROM (
        SELECT doc_id, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok)
    WHERE prev IS NOT NULL),
uni AS (SELECT term, count(*) AS ucnt FROM tok GROUP BY 1),
total AS (SELECT CAST(sum(ucnt) AS BIGINT) AS total FROM uni),
big AS MATERIALIZED (
    SELECT prev, term, count(*) AS bcnt FROM pairs GROUP BY 1, 2),
ptot AS (
    SELECT prev, CAST(sum(bcnt) AS BIGINT) AS ptot FROM big GROUP BY 1),
lp AS (
    SELECT b.prev, b.term,
           CAST(round(ln(0.75::DOUBLE * (CAST(bcnt AS DOUBLE)
                                         / CAST(ptot AS DOUBLE))
                         + 0.25::DOUBLE * (CAST(ucnt AS DOUBLE)
                                           / CAST(total AS DOUBLE)))
                      * 1000000) AS BIGINT) AS lp_u
    FROM big b JOIN ptot USING (prev) JOIN uni USING (term)
    CROSS JOIN total)
SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(lp_u) AS BIGINT) / count(*) / 1000000.0, 6)
         AS avg_logp
FROM pairs p JOIN lp ON p.prev = lp.prev AND p.term = lp.term
GROUP BY 1
"""

ORACLES["q_hybrid_rrf"] = """
WITH tok AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents),
stats AS (
    SELECT count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    t -> t <> ''))) AS BIGINT) AS sum_dl
    FROM documents),
tf AS (
    SELECT doc_id, dl, term, count(*) AS tf
    FROM tok WHERE term IN ('spark', 'join', 'window')
    GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
bm AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC)
             AS rank_bm25
    FROM (SELECT tf.doc_id,
                 round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                           * tf * (1.2 + 1)
                           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                              / (CAST(sum_dl AS DOUBLE)
                                 / CAST(n_docs AS DOUBLE))))), 6) AS score
          FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
          GROUP BY tf.doc_id
          ORDER BY score DESC, tf.doc_id ASC LIMIT 20)),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cos AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY cosine DESC, doc_id ASC)
             AS rank_cos
    FROM (SELECT c.vec_id AS doc_id,
                 round(list_dot_product(q.v, c.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v))), 6)
                   AS cosine
          FROM vecs q JOIN vecs c ON q.vec_id <> c.vec_id
          WHERE q.vec_id = 0
          ORDER BY cosine DESC, doc_id ASC LIMIT 20))
SELECT COALESCE(bm.doc_id, cos.doc_id) AS doc_id,
       bm.rank_bm25, cos.rank_cos,
       (CASE WHEN bm.rank_bm25 IS NOT NULL
             THEN 1.0::DOUBLE / (60 + bm.rank_bm25)
             ELSE 0.0::DOUBLE END
        + CASE WHEN cos.rank_cos IS NOT NULL
               THEN 1.0::DOUBLE / (60 + cos.rank_cos)
               ELSE 0.0::DOUBLE END) AS rrf
FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT 10
"""

ORACLES["q_sequence_packing"] = """
WITH sized AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS n_tokens
    FROM documents),
cum AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS c
    FROM sized WHERE n_tokens > 0)
SELECT doc_id, n_tokens,
       c - n_tokens AS start_offset,
       (c - n_tokens) // 1024 AS first_bin,
       (c - 1) // 1024 AS last_bin,
       (c - 1) // 1024 - (c - n_tokens) // 1024 + 1 AS n_bins_spanned
FROM cum
"""

ORACLES["q_packed_bins"] = """
WITH sized AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS arr
    FROM documents),
cum AS (
    SELECT doc_id, arr,
           CAST(sum(len(arr)) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)
                - len(arr) AS BIGINT) AS start_offset
    FROM sized WHERE len(arr) > 0),
placed AS (
    SELECT doc_id, start_offset + t.pos - 1 AS g, t.term
    FROM cum,
      LATERAL (SELECT unnest(arr) AS term,
                      generate_subscripts(arr, 1) AS pos) t)
SELECT g // 1024 AS bin_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min_by(term, g) AS first_token,
       max_by(term, g) AS last_token
FROM placed GROUP BY 1
"""

ORACLES["q_span_dedup"] = """
WITH arrs AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS arr
    FROM documents),
grams AS MATERIALIZED (
    SELECT doc_id, array_to_string(arr[i + 1:i + 8], ' ') AS gram
    FROM arrs, UNNEST(range(CASE WHEN len(arr) >= 8
                                 THEN len(arr) - 8 + 1 ELSE 0 END))
           AS u(i)),
seen AS (
    SELECT gram FROM grams
    GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_grams,
       CAST(sum(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) / count(*) AS dup_fraction
FROM grams g LEFT JOIN seen s ON g.gram = s.gram
GROUP BY 1
"""

ORACLES["q_span_dedup_incremental"] = """
WITH cut AS (SELECT max(doc_id) - 99 AS c FROM documents),
arrs AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS arr
    FROM documents),
grams AS MATERIALIZED (
    SELECT doc_id, array_to_string(arr[i + 1:i + 8], ' ') AS gram
    FROM arrs, UNNEST(range(CASE WHEN len(arr) >= 8
                                 THEN len(arr) - 8 + 1 ELSE 0 END))
           AS u(i)),
idx AS (
    SELECT DISTINCT gram FROM grams CROSS JOIN cut
    WHERE doc_id < cut.c),
batch AS (
    SELECT g.doc_id, g.gram FROM grams g CROSS JOIN cut
    WHERE g.doc_id >= cut.c)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN i.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_index_grams,
       CAST(sum(CASE WHEN i.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) / count(*) AS index_fraction
FROM batch b LEFT JOIN idx i ON b.gram = i.gram
GROUP BY 1
"""

def _kcenter_oracle_sql(k: int = 8) -> str:
    """Unrolled greedy k-center (q_kcenter_coreset's fixed-k run): the
    q_pagerank discipline — every selection round is a chained
    MATERIALIZED CTE pair (m{r}: min-distance state after center r-1;
    sel{r}: the quantized argmax pick).  The distance fold is the same
    left-to-right (a-b)·(a-b) accumulation the engine runs
    (list_reduce with a prepended 0.0 init ≡ F.aggregate's init+fold),
    FLOOR-quantized to integer micro-units before the ORDER BY so the
    argmax is float-tie-free in both engines."""
    dist = ("CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(range(1, len(p.v) + 1), "
            "i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i]))), "
            "(acc, e) -> acc + e) * 1e6) AS BIGINT)")
    ctes = ["pts AS MATERIALIZED (SELECT vec_id AS id, "
            "embedding::DOUBLE[] AS v FROM embeddings)",
            "sel1 AS MATERIALIZED (SELECT id, v, CAST(NULL AS BIGINT) "
            "AS q FROM pts ORDER BY id LIMIT 1)"]
    for r in range(2, k + 1):
        prev = "pts" if r == 2 else f"m{r - 1}"
        q_expr = dist if r == 2 else f"least(p.q, {dist})"
        ctes.append(f"m{r} AS MATERIALIZED (SELECT p.id, p.v, "
                    f"{q_expr} AS q FROM {prev} p, sel{r - 1} c)")
        excl = " UNION ALL ".join(f"SELECT id FROM sel{i}"
                                  for i in range(1, r))
        ctes.append(f"sel{r} AS MATERIALIZED (SELECT p.id, p.v, p.q "
                    f"FROM m{r} p WHERE p.id NOT IN ({excl}) "
                    f"ORDER BY p.q DESC, p.id ASC LIMIT 1)")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS sel_order, id AS vec_id, "
        f"CAST(q AS DOUBLE) / 1e6 AS radius FROM sel{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


ORACLES["q_kcenter_coreset"] = _kcenter_oracle_sql(8)


def _set_cover_oracle_sql(k: int = 8) -> str:
    """Unrolled greedy max-coverage (q_set_cover): round r's pick is the
    doc with the most grams outside the MATERIALIZED covered set
    cov{r-1}; cov{r} folds the winner's grams in via UNION (dedup).
    Integer gains + lowest-id tie-break — no float anywhere.  An
    exhausted universe yields empty sel rounds from then on, matching
    the engine's early break."""
    ctes = [
        "dg AS MATERIALIZED (SELECT DISTINCT doc_id AS id, gram AS g "
        "FROM (SELECT doc_id, unnest(list_transform(range(1, len(tk)), "
        "i -> tk[i] || ' ' || tk[i + 1])) AS gram "
        "FROM (SELECT doc_id, list_filter(string_split(text, ' '), "
        "t -> t <> '') AS tk FROM documents)))",
        "sel1 AS MATERIALIZED (SELECT id, count(*) AS gain FROM dg "
        "GROUP BY 1 ORDER BY gain DESC, id ASC LIMIT 1)",
        "cov1 AS MATERIALIZED (SELECT DISTINCT d.g FROM dg d "
        "JOIN sel1 s ON d.id = s.id)"]
    for r in range(2, k + 1):
        ctes.append(
            f"sel{r} AS MATERIALIZED (SELECT id, count(*) AS gain "
            f"FROM dg WHERE g NOT IN (SELECT g FROM cov{r - 1}) "
            f"GROUP BY 1 ORDER BY gain DESC, id ASC LIMIT 1)")
        ctes.append(
            f"cov{r} AS MATERIALIZED (SELECT g FROM cov{r - 1} "
            f"UNION SELECT d.g FROM dg d JOIN sel{r} s ON d.id = s.id)")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS sel_order, id AS doc_id, "
        f"CAST(gain AS BIGINT) AS gain FROM sel{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


ORACLES["q_set_cover"] = _set_cover_oracle_sql(8)


def _weighted_cover_oracle_sql(k: int = 8) -> str:
    """Unrolled cost-weighted greedy coverage (q_weighted_cover): the
    per-round pick maximizes gain·10⁶ // cost (DuckDB integer division
    of the same bounded integers the engine floors — provably equal),
    lowest-id tie-break; covered grams accumulate via UNION."""
    ctes = [
        "tk AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split(text, ' '), t -> t <> '') AS tk "
        "FROM documents)",
        "dg AS MATERIALIZED (SELECT DISTINCT t.doc_id AS id, gram AS g, "
        "len(t.tk) AS cost FROM tk t, "
        "unnest(list_transform(range(1, len(t.tk)), "
        "i -> t.tk[i] || ' ' || t.tk[i + 1])) AS u(gram) "
        "WHERE len(t.tk) > 0)",
        "sel1 AS MATERIALIZED (SELECT id, count(*) AS gain, "
        "any_value(cost) AS cost, "
        "count(*) * 1000000 // any_value(cost) AS qr FROM dg "
        "GROUP BY id ORDER BY qr DESC, id ASC LIMIT 1)",
        "cov1 AS MATERIALIZED (SELECT DISTINCT d.g FROM dg d "
        "JOIN sel1 s ON d.id = s.id)"]
    for r in range(2, k + 1):
        ctes.append(
            f"sel{r} AS MATERIALIZED (SELECT id, count(*) AS gain, "
            f"any_value(cost) AS cost, "
            f"count(*) * 1000000 // any_value(cost) AS qr FROM dg "
            f"WHERE g NOT IN (SELECT g FROM cov{r - 1}) "
            f"GROUP BY id ORDER BY qr DESC, id ASC LIMIT 1)")
        ctes.append(
            f"cov{r} AS MATERIALIZED (SELECT g FROM cov{r - 1} "
            f"UNION SELECT d.g FROM dg d JOIN sel{r} s ON d.id = s.id)")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS sel_order, id AS doc_id, "
        f"CAST(gain AS BIGINT) AS gain, CAST(cost AS BIGINT) AS cost, "
        f"CAST(qr AS BIGINT) AS qratio FROM sel{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


ORACLES["q_weighted_cover"] = _weighted_cover_oracle_sql(8)

ORACLES["q_novelty_scores"] = """
WITH g AS MATERIALIZED (
    SELECT doc_id, source, gram
    FROM (SELECT doc_id, source,
                 unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i + 1])) AS gram
          FROM (SELECT doc_id, source,
                       list_filter(string_split(text, ' '),
                                   t -> t <> '') AS tk
                FROM documents))),
ref AS MATERIALIZED (
    SELECT DISTINCT gram FROM g WHERE source = 'src0'),
cand AS (SELECT doc_id, gram FROM g WHERE source <> 'src0'),
nov AS (
    SELECT c.doc_id, count(*) AS n_novel
    FROM cand c LEFT JOIN ref r ON c.gram = r.gram
    WHERE r.gram IS NULL GROUP BY c.doc_id),
tot AS (SELECT doc_id, count(*) AS n_grams FROM cand GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
       round(COALESCE(v.n_novel, 0) / CAST(t.n_grams AS DOUBLE), 6)
         AS novelty
FROM tot t LEFT JOIN nov v ON t.doc_id = v.doc_id
"""


def _hits_oracle_sql(iters: int = 3, quantum: int = 1_000_000) -> str:
    """Unrolled HITS (q_hits): 2 sweeps per round as chained CTEs —
    auth{r} = Σ in-neighbor hubs, hub{r} = Σ out-neighbor fresh auths —
    all BIGINT (sum casts guard DuckDB's HUGEINT promotion), dangling
    sides coalesce to 0, identical to the engine's integer fixpoint.
    Each sweep ends with the engine's deterministic integer rescale,
    triggered only past 2³¹ (col // (max(col) // quantum) when
    max(col) > 2³¹, else untouched — DuckDB // ≡ Spark DIV on
    non-negative BIGINT), which keeps every sweep's input < 2³¹ scale
    instead of quantum·deg^(2·iters) and so inside int64 on any
    graph, while small graphs keep the exact classic values."""
    ctes = ["""ed AS MATERIALIZED (
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM (SELECT event_id // 5 AS item, user_id, ts, event_id
          FROM events) a
    JOIN (SELECT event_id // 5 AS item, user_id, ts, event_id
          FROM events) b
      ON a.item = b.item
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
     AND a.user_id <> b.user_id)""",
            "n AS MATERIALIZED (SELECT src AS node FROM ed "
            "UNION SELECT dst FROM ed)",
            f"s0 AS MATERIALIZED (SELECT node, "
            f"CAST({quantum} AS BIGINT) AS hub, "
            f"CAST({quantum} AS BIGINT) AS auth FROM n)"]
    for r in range(1, iters + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"a{r}r AS MATERIALIZED (SELECT s.node, s.hub, "
            f"CAST(COALESCE(x.a, 0) AS BIGINT) AS auth "
            f"FROM {prev} s LEFT JOIN "
            f"(SELECT e.dst AS node, CAST(sum(p.hub) AS BIGINT) AS a "
            f"FROM ed e JOIN {prev} p ON e.src = p.node GROUP BY 1) x "
            f"ON s.node = x.node)")
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT node, hub, "
            f"CAST(auth // (CASE WHEN "
            f"(SELECT max(auth) FROM a{r}r) > {1 << 31} THEN "
            f"(SELECT max(auth) FROM a{r}r) // {quantum} ELSE 1 END) "
            f"AS BIGINT) AS auth FROM a{r}r)")
        ctes.append(
            f"s{r}r AS MATERIALIZED (SELECT s.node, "
            f"CAST(COALESCE(y.h, 0) AS BIGINT) AS hub, s.auth "
            f"FROM a{r} s LEFT JOIN "
            f"(SELECT e.src AS node, CAST(sum(q.auth) AS BIGINT) AS h "
            f"FROM ed e JOIN a{r} q ON e.dst = q.node GROUP BY 1) y "
            f"ON s.node = y.node)")
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT node, "
            f"CAST(hub // (CASE WHEN "
            f"(SELECT max(hub) FROM s{r}r) > {1 << 31} THEN "
            f"(SELECT max(hub) FROM s{r}r) // {quantum} ELSE 1 END) "
            f"AS BIGINT) AS hub, auth FROM s{r}r)")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT node AS user_id, hub, auth FROM s{iters} "
            "ORDER BY auth DESC, node ASC LIMIT 20")


ORACLES["q_hits"] = _hits_oracle_sql(3)


def _mmr_oracle_sql(k: int = 8) -> str:
    """Unrolled MMR (q_mmr_rerank, λ=1/2): qrel quantizes once, each
    round folds the newest pick's quantized similarity into the running
    max, and the pick is the integer argmax of qrel − qmaxsim with id
    tie-break — the kcenter oracle discipline with max-sim replacing
    min-dist.  The query vector joins in from vec 0's own row."""
    def dot(a, b):
        return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list_transform(range(1, len({a}) + 1), "
                f"i -> {a}[i] * {b}[i])), (acc, e) -> acc + e)")
    ctes = [
        "qv AS MATERIALIZED (SELECT embedding::DOUBLE[] AS q "
        "FROM embeddings WHERE vec_id = 0)",
        f"pts AS MATERIALIZED (SELECT e.id, e.v, "
        f"CAST(floor({dot('e.v', 'q')} * 1e6) AS BIGINT) AS qrel "
        f"FROM (SELECT vec_id AS id, embedding::DOUBLE[] AS v "
        f"FROM embeddings WHERE vec_id <> 0) e, qv)",
        "sel1 AS MATERIALIZED (SELECT id, v, qrel, "
        "CAST(NULL AS BIGINT) AS qm, qrel AS s FROM pts "
        "ORDER BY qrel DESC, id ASC LIMIT 1)"]
    for r in range(2, k + 1):
        prev = "pts" if r == 2 else f"m{r - 1}"
        qm = (f"CAST(floor({dot('p.v', 'c.v')} * 1e6) AS BIGINT)"
              if r == 2 else
              f"greatest(p.qm, CAST(floor({dot('p.v', 'c.v')} * 1e6) "
              f"AS BIGINT))")
        ctes.append(f"m{r} AS MATERIALIZED (SELECT p.id, p.v, p.qrel, "
                    f"{qm} AS qm FROM {prev} p, sel{r - 1} c)")
        excl = " UNION ALL ".join(f"SELECT id FROM sel{i}"
                                  for i in range(1, r))
        ctes.append(f"sel{r} AS MATERIALIZED (SELECT id, v, qrel, qm, "
                    f"qrel - qm AS s FROM m{r} "
                    f"WHERE id NOT IN ({excl}) "
                    f"ORDER BY s DESC, id ASC LIMIT 1)")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS sel_order, id AS vec_id, "
        f"CAST(s AS DOUBLE) / 1e6 AS score FROM sel{r}"
        for r in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


ORACLES["q_mmr_rerank"] = _mmr_oracle_sql(8)

ORACLES["q_curation_funnel"] = """
WITH toks AS MATERIALIZED (
    SELECT doc_id, source, text,
           list_filter(string_split(text, ' '), t -> t <> '') AS tk,
           row_number() OVER (PARTITION BY md5(text)
                              ORDER BY doc_id) = 1 AS uniq
    FROM documents),
c2 AS (
    SELECT doc_id, gram, count(*) AS c
    FROM (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                 i -> tk[i] || ' ' || tk[i + 1])) AS gram
          FROM toks)
    GROUP BY doc_id, gram),
bg AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS ng,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
    FROM c2 GROUP BY doc_id),
g AS (
    SELECT t.source, t.uniq,
           t.uniq AND len(t.tk) >= 30 AS len_ok,
           t.uniq AND len(t.tk) >= 30
             AND 100 * len(list_distinct(t.tk)) >= 35 * len(t.tk)
             AS rep_ok,
           t.uniq AND len(t.tk) >= 30
             AND 100 * len(list_distinct(t.tk)) >= 35 * len(t.tk)
             AND 10 * COALESCE(b.dup, 0) <= COALESCE(b.ng, 0) AS dup_ok
    -- LEFT JOIN: docs with <2 tokens emit zero bigrams and are absent
    -- from bg, but the engine's dup_ngram_features left-joins back to
    -- all docs with zero fractions — short docs must stay in every
    -- funnel count (n_raw/n_unique especially)
    FROM toks t LEFT JOIN bg b USING (doc_id))
SELECT source,
       count(*) AS n_raw,
       CAST(sum(CASE WHEN uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
       CAST(sum(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lowrep,
       CAST(sum(CASE WHEN dup_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_final
FROM g GROUP BY source
"""

ORACLES["q_psm_match"] = """
WITH u AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             / count(*) / 100.0 AS score,
           CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated
    FROM events
    WHERE user_id % 7 = 0 AND value IS NOT NULL
    GROUP BY user_id),
d AS (
    SELECT t.user_id AS treated_user, c.user_id AS control_user,
           (t.score - c.score) * (t.score - c.score) AS d2
    FROM u t JOIN u c ON t.treated = 1 AND c.treated = 0),
f AS (
    SELECT treated_user, control_user, d2,
           row_number() OVER (PARTITION BY treated_user
                              ORDER BY d2, control_user) AS rn
    FROM d WHERE d2 <= 1.0::DOUBLE * 1.0::DOUBLE)
SELECT treated_user, control_user, round(sqrt(d2), 6) AS score_gap
FROM f WHERE rn = 1
"""

ORACLES["q_hard_negatives"] = """
WITH p AS (
    SELECT vec_id, label,
           embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b
      ON a.vec_id <> b.vec_id AND a.label <> b.label),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.5::DOUBLE * 0.5::DOUBLE)
SELECT vec_id, neighbor_id, round(sqrt(d2), 6) AS dist
FROM f WHERE rn = 1
"""

# JL ±1 signs: bit 16 of the multiplicative product on the 1-BASED
# coordinate pair key (DuckDB lambda indexes are 1-based; the engine
# adds 1 to Spark's 0-based HOF index to match).  Fold is the prepended-
# init left reduce ≡ F.aggregate; the 0.25 scale multiplies AFTER the
# fold in both engines.
ORACLES["q_jl_project"] = """
SELECT e.vec_id, j.dim,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(e.v, (x, i) ->
             x * CAST(1 - 2 * ((((((i * 10007 + j.dim * 31 + 1)
                                   % 2147483648) * 2654435761)
                                  % 4294967296) >> 16) & 1) AS DOUBLE))),
         (acc, el) -> acc + el) * 0.25 AS value
FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
     (SELECT CAST(unnest(range(16)) AS BIGINT) AS dim) j
"""

ORACLES["q_semdedup"] = """
WITH vecs AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           embedding::DOUBLE[] AS v FROM embeddings),
x AS (
    SELECT vec_id, label, i.dim, v[i.dim + 1] AS x
    FROM vecs, UNNEST(range(64)) AS i(dim)),
cents AS (
    SELECT label AS cell, list(c ORDER BY dim) AS cv
    FROM (SELECT label, dim, avg(x) AS c FROM x GROUP BY 1, 2)
    GROUP BY 1),
d2 AS (
    SELECT v.vec_id, c.cell,
           list_sum(list_transform(range(64),
               i -> (v.v[i + 1] - c.cv[i + 1])
                    * (v.v[i + 1] - c.cv[i + 1]))) AS d2
    FROM vecs v CROSS JOIN cents c),
cells AS MATERIALIZED (
    SELECT vec_id, cell FROM d2
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, cell ASC) = 1),
-- r11 density-adaptive subdivision (target occupancy T = 64): a cell
-- with pop > T splits into ceil(pop/64) subcells by nearest-of-s
-- deterministic seeds (the s smallest vec_ids in the cell; l2 argmin,
-- ties to the smallest seed) — T is a power of two so pop/64.0 is an
-- exact binary division and ceil agrees bit-for-bit with the engine
pops AS (
    SELECT cell, CAST(ceil(count(*) / 64.0) AS BIGINT) AS s
    FROM cells GROUP BY 1),
seeds AS MATERIALIZED (
    SELECT c.cell, c.vec_id AS seed
    FROM cells c JOIN pops p USING (cell)
    QUALIFY row_number() OVER (PARTITION BY c.cell
                               ORDER BY c.vec_id ASC) <= p.s),
sd AS (
    SELECT c.vec_id, c.cell, s.seed,
           list_sum(list_transform(range(64),
               i -> (v.v[i + 1] - sv.v[i + 1])
                    * (v.v[i + 1] - sv.v[i + 1]))) AS sd2
    FROM cells c
    JOIN seeds s ON c.cell = s.cell
    JOIN vecs v ON v.vec_id = c.vec_id
    JOIN vecs sv ON sv.vec_id = s.seed),
sub AS MATERIALIZED (
    SELECT vec_id, cell, seed AS sub FROM sd
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY sd2 ASC, seed ASC) = 1)
SELECT * FROM (
    SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, a.cell,
           round(list_dot_product(va.v, vb.v)
                 / (sqrt(list_dot_product(va.v, va.v))
                    * sqrt(list_dot_product(vb.v, vb.v))), 6) AS cosine
    FROM sub a JOIN sub b ON a.cell = b.cell AND a.sub = b.sub
                         AND a.vec_id < b.vec_id
    JOIN vecs va ON va.vec_id = a.vec_id
    JOIN vecs vb ON vb.vec_id = b.vec_id)
WHERE cosine >= 0.35::DOUBLE
"""

ORACLES["q_unigram_scores"] = """
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents),
counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
lp AS (
    SELECT term,
           CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                      * 1000000) AS BIGINT) AS lp_u
    FROM counts CROSS JOIN total)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(lp_u) AS BIGINT) / count(*) / 1000000.0, 6)
         AS avg_logp
FROM tok JOIN lp ON tok.term = lp.term
GROUP BY tok.doc_id
"""

ORACLES["q_redact_pii"] = """
WITH planted AS (
    SELECT doc_id,
           text || ' contact u' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com ref '
                || CAST(doc_id * 1234567 + 1000000 AS VARCHAR) AS text
    FROM documents),
r1 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS red1
    FROM planted)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(red1, '[0-9]{7,}')) AS BIGINT)
         AS n_longnums,
       regexp_replace(red1, '[0-9]{7,}', '<NUM>', 'g') AS redacted,
       CAST(length(regexp_replace(red1, '[0-9]{7,}', '<NUM>', 'g')) AS BIGINT)
         AS n_chars
FROM r1
"""

ORACLES["q_merge_upsert"] = """
WITH base AS (
    SELECT event_id, user_id, event_type, round(value, 6) AS value
    FROM events),
changes AS (
    SELECT event_id, user_id, 'updated' AS event_type,
           round(round(value, 6) + 100.0, 6) AS value, 'U' AS op
    FROM events WHERE event_id % 7 = 0
    UNION ALL
    SELECT event_id, user_id, event_type, round(value, 6) AS value, 'D' AS op
    FROM events WHERE event_id % 11 = 0 AND event_id % 7 <> 0
    UNION ALL
    SELECT event_id + 10000000 AS event_id, user_id,
           'inserted' AS event_type, round(value, 6) AS value, 'U' AS op
    FROM events WHERE event_id % 97 = 0)
SELECT coalesce(c.event_id, b.event_id) AS event_id,
       CASE WHEN c.op IS NOT NULL THEN c.user_id ELSE b.user_id END AS user_id,
       CASE WHEN c.op IS NOT NULL THEN c.event_type ELSE b.event_type END
         AS event_type,
       CASE WHEN c.op IS NOT NULL THEN c.value ELSE b.value END AS value
FROM base b FULL OUTER JOIN changes c ON b.event_id = c.event_id
WHERE c.op IS NULL OR c.op <> 'D'
"""

ORACLES["q_scd2_history"] = """
WITH runs AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
hist AS (
    SELECT user_id, event_type, ts AS valid_from, event_id,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM runs WHERE chg = 1)
SELECT user_id, event_type,
       CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_ep,
       CAST(floor(epoch(valid_to)) AS BIGINT) AS valid_to_ep,
       valid_to IS NULL AS is_current
FROM hist
"""

ORACLES["q_funnel_stages"] = """
WITH t1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY e.user_id),
t3 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN t2 ON e.user_id = t2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY e.user_id)
SELECT e.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage,
       count(*) AS n_events
FROM events e
LEFT JOIN t1 ON e.user_id = t1.user_id
LEFT JOIN t2 ON e.user_id = t2.user_id
LEFT JOIN t3 ON e.user_id = t3.user_id
GROUP BY 1, 2
"""

# identical semantics to q_rank_leaderboard: the distributed rank
# must reproduce the window-rank board bit-for-bit
ORACLES["q_rank_distributed"] = ORACLES["q_rank_leaderboard"]

ORACLES["q_equidepth_bins"] = """
WITH thr AS (
    SELECT list_transform(
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]),
             t -> round(t, 6)) AS th
    FROM events)
SELECT event_id, round(value, 6) AS value,
       CAST(len(list_filter(th, t -> t < value)) + 1 AS BIGINT) AS bin
FROM events CROSS JOIN thr
"""

ORACLES["q_pit_join"] = """
WITH runs AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
hist AS (
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM runs WHERE chg = 1),
err AS (
    SELECT event_id, user_id, ts - INTERVAL 30 MINUTE AS ts2
    FROM events WHERE event_type = 'error')
SELECT e.event_id, e.user_id, h.event_type AS version_asof
FROM err e
LEFT JOIN hist h
  ON e.user_id = h.user_id
 AND e.ts2 >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts2 < h.valid_to)
"""

ORACLES["q_weighted_sample"] = """
WITH s AS (
    SELECT doc_id, lang,
           round(-ln(((doc_id % 2147483648) * 2654435761 % 4294967296
                      + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 6) AS wkey
    FROM documents
    WHERE CAST(n_chars AS DOUBLE) > 0)
SELECT doc_id, lang, wkey
FROM s ORDER BY wkey ASC, doc_id ASC LIMIT 50
"""

ORACLES["q_cooccurrence"] = """
WITH items AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS item_a, b.event_type AS item_b,
       count(*) AS n_groups
FROM items a
JOIN items b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""

ORACLES["q_transition_matrix"] = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events),
pairs AS (
    SELECT prev AS prev_state, event_type AS next_state, count(*) AS n
    FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (
    SELECT prev_state, CAST(sum(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
SELECT pr.prev_state, pr.next_state, pr.n,
       round(pr.n / CAST(t AS DOUBLE), 6) AS p
FROM pairs pr JOIN tot USING (prev_state)
"""

ORACLES["q_variant_props"] = """
SELECT event_type,
       count(try_cast(json_extract_string(props, '$.k') AS BIGINT))
         AS n_parsed,
       CAST(sum(try_cast(json_extract_string(props, '$.k') AS BIGINT))
         AS BIGINT) AS sum_k,
       CAST(min(try_cast(json_extract_string(props, '$.k') AS BIGINT))
         AS BIGINT) AS min_k,
       CAST(max(try_cast(json_extract_string(props, '$.k') AS BIGINT))
         AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""

ORACLES["q_resample_ffill"] = """
WITH b AS (
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
    FROM events GROUP BY user_id),
grid AS (
    SELECT user_id,
           unnest(generate_series(
               CAST(floor(lo / 21600.0) AS BIGINT) * 21600, hi, 21600))
             AS grid_ep
    FROM b),
ev AS (
    SELECT user_id, epoch(ts) AS eps, round(value, 6) AS value
    FROM events)
SELECT g.user_id, g.grid_ep, e.value AS value_asof
FROM grid g
ASOF LEFT JOIN ev e
  ON g.user_id = e.user_id AND g.grid_ep >= e.eps
"""

ORACLES["q_jaccard_prefix"] = """
WITH raw AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.6
"""

ORACLES["q_negative_samples"] = """
WITH pos AS (
    SELECT DISTINCT user_id, event_id % 1000 AS item FROM events),
cand AS (
    SELECT user_id, item,
           (user_id * 31 + item * 17 + 0) % 2147483648
             * 2654435761 % 4294967296 % 1000 AS neg_item
    FROM pos
    UNION ALL
    SELECT user_id, item,
           (user_id * 31 + item * 17 + 1) % 2147483648
             * 2654435761 % 4294967296 % 1000 AS neg_item
    FROM pos)
SELECT c.user_id, c.item, c.neg_item
FROM cand c
LEFT JOIN pos p ON c.user_id = p.user_id AND c.neg_item = p.item
WHERE p.item IS NULL
"""

ORACLES["q_temperature_mix"] = """
WITH counts AS (
    SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(sqrt(n)) AS t FROM counts),
rates AS (
    SELECT source, 200.0 * sqrt(n) / t / n AS rate
    FROM counts CROSS JOIN tot)
SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
FROM documents d JOIN rates r ON d.source = r.source
WHERE (d.doc_id % 2147483648) * 2654435761 % 4294967296
      / 4294967296.0 < r.rate
"""

ORACLES["q_attribution"] = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events
    WHERE event_type = 'purchase'),
touches AS (
    SELECT user_id, ts, event_type AS channel FROM events
    WHERE event_type <> 'purchase')
SELECT p.event_id, p.user_id, t.channel
FROM purchases p
ASOF LEFT JOIN touches t
  ON p.user_id = t.user_id AND p.ts >= t.ts
"""

ORACLES["q_quantile_normalize"] = """
SELECT event_id, event_type, round(value, 6) AS value,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY round(value, 6), event_id),
             6) AS qnorm
FROM events
"""

ORACLES["q_span_corruption"] = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents),
e AS (
    SELECT doc_id, toks, len(toks) AS n,
           (doc_id % 2147483648) * 2654435761 % 4294967296
             % (len(toks) - 5) + 1 AS s
    FROM t WHERE len(toks) > 5)
SELECT doc_id, CAST(s AS BIGINT) AS span_start,
       array_to_string(
         list_concat(list_concat(toks[1:s-1], ['<extra_id_0>']),
                     toks[s+5:n]), ' ') AS input,
       array_to_string(toks[s:s+4], ' ') AS target
FROM e
"""

ORACLES["q_kfold"] = """
SELECT (user_id % 2147483648) * 2654435761 % 4294967296 % 5 AS fold,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""

ORACLES["q_corpus_diff"] = """
WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
v2 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                    ELSE text END) AS h2
    FROM documents WHERE doc_id % 13 <> 0
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, md5(text) AS h2
    FROM documents WHERE doc_id % 17 = 0)
SELECT CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*) AS n
FROM v1 FULL OUTER JOIN v2 USING (doc_id)
GROUP BY 1
"""

ORACLES["q_filter_funnel"] = """
WITH t AS (
    SELECT text,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents),
c AS (
    SELECT length(text) AS nc, len(toks) AS nt,
           len(list_filter(toks,
               x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS sh
    FROM t)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN nt >= 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS pass_length,
       CAST(sum(CASE WHEN nt >= 20
                      AND sh / CAST(nt AS DOUBLE) >= 0.02
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
       CAST(sum(CASE WHEN nt >= 20
                      AND sh / CAST(nt AS DOUBLE) >= 0.02
                      AND nc / CAST(nt AS DOUBLE) <= 8.0
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_token_len
FROM c
"""

ORACLES["q_ngram_hotspots"] = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents),
g AS (
    SELECT array_to_string(toks[i:i+1], ' ') AS gram
    FROM t CROSS JOIN unnest(generate_series(1, len(toks) - 1)) AS u(i)
    WHERE len(toks) >= 2)
SELECT gram, count(*) AS n
FROM g GROUP BY 1 HAVING count(*) >= 20
ORDER BY n DESC, gram ASC LIMIT 15
"""

ORACLES["q_corpus_release"] = """
WITH staged AS (
    SELECT doc_id, source,
           trim(regexp_replace(regexp_replace(lower(text),
                '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')) AS norm_text
    FROM documents),
canon AS (
    SELECT doc_id, source, norm_text
    FROM staged
    QUALIFY row_number() OVER (PARTITION BY md5(norm_text)
                               ORDER BY doc_id ASC) = 1),
flagged AS (
    SELECT doc_id, source,
           (len(list_filter(string_split(norm_text, ' '), t -> t <> ''))
              >= 20
            AND len(list_filter(string_split(norm_text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'to')))
                / CAST(len(list_filter(string_split(norm_text, ' '),
                           t -> t <> '')) AS DOUBLE) >= 0.02) AS q
    FROM canon),
counts AS (
    SELECT source, count(*) AS n FROM flagged WHERE q GROUP BY source),
tot AS (SELECT sum(sqrt(n)) AS t FROM counts),
rates AS (
    SELECT source, 150.0 * sqrt(n) / t / n AS rate
    FROM counts CROSS JOIN tot),
enriched AS (
    SELECT f.doc_id, f.source, f.q, r.rate,
           (f.q AND ((f.doc_id % 2147483648) * 2654435761 % 4294967296
                     / 4294967296.0) < r.rate) AS s
    FROM flagged f LEFT JOIN rates r ON f.source = r.source)
SELECT source,
       count(*) AS n_candidates,
       CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(max(rate), 6) AS rate
FROM enriched
GROUP BY source
"""

ORACLES["q_intersect_except"] = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
EXCEPT
SELECT user_id FROM events WHERE event_type = 'signup' AND value > 97
ORDER BY user_id
"""

ORACLES["q_mad_robust"] = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS m
    FROM events GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       round(max(m), 6) AS median,
       round(quantile_cont(abs(value - m), 0.5), 6) AS mad
FROM events e JOIN med USING (event_type)
GROUP BY e.event_type
"""

ORACLES["q_winsorize"] = """
WITH pct AS (
    SELECT event_type,
           round(quantile_cont(value, 0.05), 6) AS lo,
           round(quantile_cont(value, 0.95), 6) AS hi
    FROM events GROUP BY event_type)
SELECT event_id, e.event_type, round(value, 6) AS value,
       least(greatest(round(value, 6), lo), hi) AS winsorized,
       round(value, 6) <> least(greatest(round(value, 6), lo), hi)
         AS was_clipped
FROM events e JOIN pct USING (event_type)
"""

ORACLES["q_ewma"] = """
WITH a AS (
    SELECT user_id, count(*) AS n_events,
           list(value ORDER BY ts, event_id) AS vals
    FROM events GROUP BY user_id)
SELECT user_id, n_events,
       round(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc), 6)
         AS ewma
FROM a
"""

# --- q_synthetic_source: regenerate the Python DataSource rows in SQL -------
# sources/synthetic.py derives every row from the engine-neutral
# multiplicative hash of the row id (h = (i mod 2^32) * 2654435761 mod 2^32;
# i < 2^32 here so the mod is a no-op, and i*MULT <= 1e4 * 2.65e9 << 2^63 is
# int64-safe).  rows=10_000 -> n_users = rows // 64 = 156.  value is exactly
# (h mod 100_000)/100, so summing cents (= h mod 100_000) is exact in both
# engines; the final /100.0 is one correctly-rounded IEEE division each side.
ORACLES["q_synthetic_source"] = """
WITH g AS (
    SELECT i, (i * 2654435761) % 4294967296 AS h
    FROM range(10000) t(i)),
r AS (
    SELECT (['click','error','purchase','signup','view'])[(h % 5) + 1]
             AS event_type,
           h % 156 AS user_id,
           h % 100000 AS cents
    FROM g)
SELECT event_type, count(*) AS n,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM r GROUP BY 1
"""

# --- q_pagerank: fixed-iteration fixpoint, unrolled -------------------------
# q_pagerank runs EXACTLY 5 damped rounds from rank = 1.0 (the iteration
# count is part of the query's semantics, not a convergence test), so the
# oracle unrolls 5 identical CTE stages instead of a recursive CTE — each
# stage may reference the previous one any number of times (contrib join,
# dangling-mass scalar, node base).  Float discipline: every constant that
# Spark computes driver-side in Python (1 - 0.85 = 0.15000000000000002) is
# reproduced with the same IEEE double ops (0.85::DOUBLE keeps DuckDB's
# decimal literals out of the arithmetic); per-round sums drift only at
# ~1e-16 relative, far inside the final round-to-6 window.
_PR_ROUND = """r{k} AS (
    SELECT b.node, b.outdeg,
           ((1 - 0.85::DOUBLE)
            + 0.85::DOUBLE * (COALESCE(c.inflow, 0) + d.dm / nn.n)) AS rank
    FROM base b
    LEFT JOIN (SELECT e.dst AS node, sum(r.rank / r.outdeg) AS inflow
               FROM edges e JOIN r{p} r ON e.src = r.node
               GROUP BY 1) c USING (node)
    CROSS JOIN (SELECT COALESCE(sum(rank), 0::DOUBLE) AS dm
                FROM r{p} WHERE outdeg IS NULL) d
    CROSS JOIN nn)"""

# Triangle counts via canonical x<y<z enumeration — count-equivalent to
# the engine's degree-oriented wedge closing (each triangle appears once
# in either formulation), so the hash match verifies the orientation
# logic without sharing its implementation.
ORACLES["q_triangle_count"] = """
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
und AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node AS user_id, count(*) AS n_triangles
FROM (SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY 1
"""

ORACLES["q_pagerank"] = ("""
WITH pairs AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
edges AS (
    SELECT DISTINCT a.e AS src, b.e AS dst
    FROM pairs a JOIN pairs b USING (i)
    WHERE a.e <> b.e),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
base AS (SELECT n.node, o.outdeg
         FROM nodes n LEFT JOIN outdeg o USING (node)),
r0 AS (SELECT node, outdeg, CAST(1 AS DOUBLE) AS rank FROM base),
""" + ",\n".join(_PR_ROUND.format(k=k, p=k - 1) for k in range(1, 6)) + """,
fin AS (SELECT node AS user_id, round(rank, 6) AS rank FROM r5)
SELECT user_id, rank FROM fin
ORDER BY rank DESC, user_id ASC
LIMIT 20
""")

# --- q_fuzzy_join: naive all-pairs edit-distance join ------------------------
# The Spark side prunes candidates with Ed-Join q-gram prefix filtering, but
# the RESULT is exactly the brute-force join: every unordered pair within
# Levenshtein distance 1 (plus the |Δlen| <= 1 necessary condition, which
# only prunes).  levenshtein is the classic unit-cost edit distance in both
# engines; counts cast to BIGINT for type parity.
ORACLES["q_fuzzy_join"] = """
WITH s AS (SELECT c_custkey AS k, c_name AS nm, length(c_name) AS l
           FROM customer)
SELECT a.k AS key_a, b.k AS key_b, a.nm AS name_a, b.nm AS name_b,
       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
FROM s a JOIN s b ON a.k < b.k AND abs(a.l - b.l) <= 1
WHERE levenshtein(a.nm, b.nm) <= 1
"""

# --- q_ivm_refresh: one-shot aggregate ≡ batch-split + state merge ----------
# The Spark side aggregates three disjoint batches into mergeable states and
# combines them; the oracle proves the refresh path equals aggregating all
# rows at once.  Cents reduce as exact int64; each final is one IEEE division
# over exact longs (100::DOUBLE keeps DuckDB decimal literals out).
ORACLES["q_ivm_refresh"] = """
WITH c AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events)
SELECT event_type,
       count(*) AS n,
       round(CAST(sum(cents) AS DOUBLE) / 100::DOUBLE, 6) AS sum_value,
       round(CAST(min(cents) AS DOUBLE) / 100::DOUBLE, 6) AS min_value,
       round(CAST(max(cents) AS DOUBLE) / 100::DOUBLE, 6) AS max_value,
       round(CAST(sum(cents) AS DOUBLE)
             / (100::DOUBLE * count(*)), 6) AS mean_value
FROM c GROUP BY 1
"""

# --- q_entity_resolution: brute pairs + recursive closure + attach-back -----
# Spark prunes pair candidates with deletion neighborhoods and resolves
# clusters by min-label propagation; the oracle brute-forces the dictionary
# pairs (64 names — the whole point of dictionary-grain ER), walks the
# transitive closure recursively, and attaches the fact rows back by exact
# name.  Singleton names (no fuzzy partner) keep their own dict_id.
ORACLES["q_entity_resolution"] = """
WITH RECURSIVE d AS (
    SELECT p_name, min(p_partkey) AS dict_id FROM part GROUP BY 1),
pairs AS (
    SELECT a.dict_id AS ka, b.dict_id AS kb
    FROM d a JOIN d b ON a.dict_id < b.dict_id
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      AND levenshtein(a.p_name, b.p_name) <= 2),
edges AS (SELECT ka AS a, kb AS b FROM pairs
          UNION SELECT kb, ka FROM pairs),
walk(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
comp AS (SELECT node, min(reach) AS component FROM walk GROUP BY 1),
lab AS (SELECT d.p_name, COALESCE(c.component, d.dict_id) AS entity_id
        FROM d LEFT JOIN comp c ON d.dict_id = c.node)
SELECT l.entity_id,
       count(DISTINCT p.p_name) AS n_names,
       count(*) AS n_parts,
       min(p.p_name) AS canonical_name
FROM part p JOIN lab l USING (p_name)
GROUP BY 1
"""

# --- q_minhash_neutral: the full MinHash+LSH pipeline, reproduced in SQL ----
# Every stage of pipeline/dedup.minhash_neutral_pairs is explicit integer
# arithmetic, so the oracle rebuilds it end-to-end: word shingles ->
# polynomial character hash (h*31+code mod 1e9+7, seed 7) -> 32 affine
# min-hash slots ((a*h+b) mod 2^31-1; coefficients from the SAME LCG as the
# engine, imported below) -> per-band polynomial fold seeded by the band
# index -> bucket equi-join -> integer matched-slot threshold (>=16 of 32;
# est = m/32 is dyadic, no float boundary).
from .pipeline.dedup import LSH_BANDS as _LSH_BANDS
from .pipeline.dedup import N_MINHASH as _N_MINHASH
from .pipeline.dedup import _mh_coeffs

_PERM_VALUES = ",\n       ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(_mh_coeffs(_N_MINHASH)))
_RPB = _N_MINHASH // _LSH_BANDS

ORACLES["q_minhash_neutral"] = f"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS wds
    FROM documents),
sh AS (
    SELECT doc_id, array_to_string(list_slice(wds, i, i + 2), ' ') AS s
    FROM w, UNNEST(generate_series(1, greatest(len(wds) - 2, 1))) t(i)),
bh AS (
    SELECT doc_id, list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(s) + 1),
                              i -> ascii(substr(s, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS h
    FROM sh),
perm(j, a, b) AS (
    VALUES {_PERM_VALUES}),
slots AS (
    SELECT doc_id, j, min((a * h + b) % 2147483647) AS slot
    FROM bh CROSS JOIN perm GROUP BY 1, 2),
bnd AS (
    SELECT doc_id, CAST(j // {_RPB} AS BIGINT) AS band,
           list(slot ORDER BY j) AS bs
    FROM slots GROUP BY 1, 2),
bkt AS (
    SELECT doc_id, band,
           list_reduce(list_prepend(band, bs),
                       (acc, s) -> (acc * 31 + s) % 1000000007) AS bucket
    FROM bnd),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bkt a JOIN bkt b
      ON a.band = b.band AND a.bucket = b.bucket
     AND a.doc_id < b.doc_id),
eq AS (
    SELECT c.doc_a, c.doc_b,
           count(*) FILTER (sa.slot = sb.slot) AS m
    FROM cand c
    JOIN slots sa ON sa.doc_id = c.doc_a
    JOIN slots sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY 1, 2)
SELECT doc_a, doc_b, round(m / {float(_N_MINHASH)}, 6) AS est_jaccard
FROM eq WHERE m >= {-(-_N_MINHASH // 2)}
"""

# --- q_cdc_chunks: content-defined chunk boundaries, reproduced in SQL ------
# Each token hashes once (h*31+code mod 1e9+7, seed 7); a cut falls after
# token i (window <= i <= n-1) where the polynomial fold over the trailing
# four TOKEN HASHES (seed 7, base 31) divides 16.  bounds = [0, cuts..., n];
# chunk k spans tokens[bounds[k]+1 .. bounds[k+1]].  All integer
# arithmetic — chunks match bit-for-bit.
ORACLES["q_cdc_chunks"] = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS tk
    FROM documents),
h AS (
    SELECT doc_id, tk,
           list_transform(tk, tok ->
             list_reduce(
               list_prepend(7::BIGINT,
                 list_transform(range(1, length(tok) + 1),
                                j -> ascii(substr(tok, j, 1))::BIGINT)),
               (acc, ch) -> (acc * 31 + ch) % 1000000007)) AS th
    FROM t WHERE len(tk) > 0),
c AS (
    SELECT doc_id, tk, len(tk) AS n,
           list_filter(generate_series(4, len(tk) - 1), i ->
             list_reduce(
               list_prepend(7::BIGINT, list_slice(th, i - 3, i)),
               (acc, x) -> (acc * 31 + x) % 1000000007) % 16 = 0
           ) AS cuts
    FROM h),
b AS (
    SELECT doc_id, tk,
           list_concat(list_concat([0], cuts), [n]) AS bounds
    FROM c)
SELECT doc_id,
       CAST(k - 1 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(tk, bounds[k] + 1, bounds[k + 1]), ' ')
         AS chunk_text,
       CAST(bounds[k + 1] - bounds[k] AS BIGINT) AS n_tokens
FROM b, UNNEST(generate_series(1, len(bounds) - 1)) s(k)
"""

# --- q_simhash_neutral: bit-voting fingerprint, reproduced in SQL -----------
# Token hash = poly(base 31, seed 7) * 2^30 + poly(base 37, seed 11), both
# mod 1e9+7 (< 2^30): 60 positive bits.  Every token occurrence votes +/-1
# per bit; fingerprint sums 2^b where the vote is positive; bands are 4x15
# bits.  All integer arithmetic.
ORACLES["q_simhash_neutral"] = """
WITH tok AS (
    SELECT doc_id, t
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          FROM documents)
    WHERE t <> ''),
th AS (
    SELECT doc_id,
           list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(t) + 1),
                              i -> ascii(substr(t, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) * 1073741824
           + list_reduce(
             list_prepend(11::BIGINT,
               list_transform(range(1, length(t) + 1),
                              i -> ascii(substr(t, i, 1))::BIGINT)),
             (acc, c) -> (acc * 37 + c) % 1000000007) AS h
    FROM tok),
bits AS (SELECT unnest(generate_series(0, 59)) AS b),
votes AS (
    SELECT doc_id, b,
           sum(CASE WHEN (h // (1::BIGINT << b)) % 2 = 1
                    THEN 1 ELSE -1 END) AS v
    FROM th CROSS JOIN bits GROUP BY 1, 2),
fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY 1)
SELECT doc_id, simhash,
       (simhash // 1) % 32768 AS band0,
       (simhash // 32768) % 32768 AS band1,
       (simhash // 1073741824) % 32768 AS band2,
       (simhash // 35184372088832) % 32768 AS band3
FROM fp
"""

# --- q_grid_nearest: brute-force radius-bounded nearest neighbor ------------
# Spark prunes candidates to the 3x3 grid-cell neighborhood; the result is
# exactly the all-pairs minimum within the radius, which the oracle spells
# out.  Coordinates cast to DOUBLE on extraction so both engines run the
# identical IEEE expression; neighbor id breaks distance ties.
ORACLES["q_grid_nearest"] = """
WITH p AS (
    SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b ON a.vec_id <> b.vec_id),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.15::DOUBLE * 0.15::DOUBLE)
SELECT vec_id, neighbor_id, round(sqrt(d2), 6) AS dist
FROM f WHERE rn = 1
"""

# --- q_grid_knn: brute-force radius-bounded k-nearest-neighbors -------------
# Same coordinate/arithmetic discipline as q_grid_nearest; rank is the
# per-query row_number over (d2, neighbor_id), BIGINT in both engines.
ORACLES["q_grid_knn"] = """
WITH p AS (
    SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b ON a.vec_id <> b.vec_id),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.3::DOUBLE * 0.3::DOUBLE)
SELECT vec_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       round(sqrt(d2), 6) AS dist
FROM f WHERE rn <= 3
"""

# --- q_hard_negatives_k: brute-force k nearest different-label points -------
ORACLES["q_hard_negatives_k"] = """
WITH p AS (
    SELECT vec_id, label,
           embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b
      ON a.vec_id <> b.vec_id AND a.label <> b.label),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.5::DOUBLE * 0.5::DOUBLE)
SELECT vec_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       round(sqrt(d2), 6) AS dist
FROM f WHERE rn <= 3
"""

# --- q_mutual_knn: reciprocity self-join over the brute-force kNN table -----
ORACLES["q_mutual_knn"] = """
WITH p AS (
    SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b ON a.vec_id <> b.vec_id),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.3::DOUBLE * 0.3::DOUBLE),
nn AS (
    SELECT vec_id, neighbor_id, round(sqrt(d2), 6) AS dist
    FROM f WHERE rn <= 3)
SELECT a.vec_id AS id_a, a.neighbor_id AS id_b, a.dist
FROM nn a JOIN nn b
  ON a.neighbor_id = b.vec_id AND b.neighbor_id = a.vec_id
WHERE a.vec_id < a.neighbor_id
"""

# --- q_triplet_mining: nearest same-label + nearest diff-label per anchor ---
ORACLES["q_triplet_mining"] = """
WITH p AS (
    SELECT vec_id, label,
           embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           a.label = b.label AS same,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b ON a.vec_id <> b.vec_id),
f AS (
    SELECT vec_id, neighbor_id, same, d2,
           row_number() OVER (PARTITION BY vec_id, same
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.5::DOUBLE * 0.5::DOUBLE),
pos AS (
    SELECT vec_id, neighbor_id AS pos_id, round(sqrt(d2), 6) AS pos_dist
    FROM f WHERE same AND rn = 1),
neg AS (
    SELECT vec_id, neighbor_id AS neg_id, round(sqrt(d2), 6) AS neg_dist
    FROM f WHERE NOT same AND rn = 1)
SELECT pos.vec_id AS vec_id, pos_id, pos_dist, neg_id, neg_dist
FROM pos JOIN neg ON pos.vec_id = neg.vec_id
"""

# --- q_quality_classifier: hashed linear filter, reproduced in SQL ----------
# Same polynomial char hash family as the fingerprint/minhash oracles;
# the bucket->weight map, integer sum, and single long/double division
# are spelled out so both engines compute the identical score.
ORACLES["q_quality_classifier"] = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents),
w AS (
    SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
           list_reduce(list_prepend(0::BIGINT,
             list_transform(tk, t ->
               (list_reduce(list_prepend(7::BIGINT,
                  list_transform(range(1, length(t) + 1),
                                 c -> ascii(substr(t, c, 1))::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % 1000000007) % 1024)
               * 2654435761 % 4096 - 2048)),
             (acc, x) -> acc + x) AS sw
    FROM toks WHERE len(tk) > 0)
SELECT doc_id, n_tokens,
       round(sw / (2048::DOUBLE * n_tokens), 6) AS score,
       CASE WHEN sw > 0 THEN 1 ELSE 0 END AS keep
FROM w
"""

# --- q_perplexity_buckets: bigram LM scores + per-lang ntile tertiles -------
ORACLES["q_perplexity_buckets"] = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, t.pos, t.term FROM documents,
      LATERAL (SELECT unnest(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS term,
                      generate_subscripts(list_filter(
                          string_split(text, ' '), x -> x <> ''), 1)
                        AS pos) t),
pairs AS MATERIALIZED (
    SELECT doc_id, prev, term FROM (
        SELECT doc_id, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok)
    WHERE prev IS NOT NULL),
uni AS (SELECT term, count(*) AS ucnt FROM tok GROUP BY 1),
total AS (SELECT CAST(sum(ucnt) AS BIGINT) AS total FROM uni),
big AS MATERIALIZED (
    SELECT prev, term, count(*) AS bcnt FROM pairs GROUP BY 1, 2),
ptot AS (
    SELECT prev, CAST(sum(bcnt) AS BIGINT) AS ptot FROM big GROUP BY 1),
lp AS (
    SELECT b.prev, b.term,
           CAST(round(ln(0.75::DOUBLE * (CAST(bcnt AS DOUBLE)
                                         / CAST(ptot AS DOUBLE))
                         + 0.25::DOUBLE * (CAST(ucnt AS DOUBLE)
                                           / CAST(total AS DOUBLE)))
                      * 1000000) AS BIGINT) AS lp_u
    FROM big b JOIN ptot USING (prev) JOIN uni USING (term)
    CROSS JOIN total),
scores AS (
    SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(lp_u) AS BIGINT) / count(*) / 1000000.0, 6)
             AS avg_logp
    FROM pairs p JOIN lp ON p.prev = lp.prev AND p.term = lp.term
    GROUP BY 1)
SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logp,
       CAST(ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY s.avg_logp DESC, s.doc_id)
            AS BIGINT) AS bucket
FROM scores s JOIN documents d USING (doc_id)
"""

# --- q_mixture_weights: uniform-target domain reweighting --------------------
ORACLES["q_mixture_weights"] = """
WITH per AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    t -> t <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
    HAVING n_tokens > 0),
tot AS (
    SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
           CAST(count(*) AS BIGINT) AS ng
    FROM per)
SELECT source, n_docs, n_tokens,
       round(CAST(tot AS DOUBLE) / CAST(ng * n_tokens AS DOUBLE), 6)
         AS weight,
       round(least(1.0::DOUBLE,
                   CAST(tot AS DOUBLE) / CAST(ng * n_tokens AS DOUBLE)),
             6) AS sample_rate
FROM per CROSS JOIN tot
"""

# --- q_hll_neutral: explicit-register HyperLogLog, reproduced in SQL --------
# Same multiplicative hash as the sampling family (int64-exact); register
# index = h mod 256, rho = 1 + trailing zeros of the 24-bit word (w & -w is
# a power of two -> log2 exact); register contributions sum as exact
# integers 2^(32-M); the raw estimate is ONE double division by that sum,
# with the linear-counting branch below 2.5m.  The alpha*m^2*2^32 numerator
# is imported from the engine so both sides consume the identical double.
from .operators.sketches import HLL_NUM as _HLL_NUM

ORACLES["q_hll_neutral"] = f"""
WITH h0 AS (
    SELECT event_type, user_id,
           ((user_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM events),
h1 AS (
    SELECT event_type,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT event_type,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT event_type, xor(hv, hv >> 16) AS hv
    FROM h2),
r AS (
    SELECT event_type, hv % 256 AS idx,
           hv // 256 AS w
    FROM h),
rho AS (
    SELECT event_type, idx,
           CASE WHEN w = 0 THEN 25
                ELSE CAST(round(log2(w & (-w))) AS INT) + 1 END AS rho
    FROM r),
regs AS (
    SELECT event_type, idx, max(rho) AS m
    FROM rho GROUP BY 1, 2),
per AS (
    SELECT event_type,
           CAST(sum(CAST(round(power(2, 32 - m)) AS BIGINT)) AS BIGINT)
             AS s_present,
           count(*) AS n_present
    FROM regs GROUP BY 1),
est AS (
    SELECT event_type, (256 - n_present) AS zeros,
           {_HLL_NUM!r} / CAST(s_present
               + (256 - n_present) * 4294967296 AS DOUBLE) AS est_raw
    FROM per),
fin AS (
    SELECT event_type,
           CASE WHEN est_raw <= 640.0 AND zeros > 0
                THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
                ELSE est_raw END AS e
    FROM est),
exact AS (
    SELECT event_type, count(DISTINCT user_id) AS n_exact
    FROM events GROUP BY 1)
SELECT f.event_type, x.n_exact, round(f.e, 6) AS hll_estimate
FROM fin f JOIN exact x USING (event_type)
"""


# --- q_lloyd_kmeans: fixed-iteration Lloyd loop, unrolled --------------------
# Lloyd k-means with deterministic init (per-label means) and EXACTLY 3
# assignment/update rounds is a fixed-iteration fixpoint like q_pagerank, so
# the oracle unrolls 3 (assign, update) CTE stage pairs plus the final
# assignment — never a recursive CTE (each stage references the vector table
# AND the previous stage).  Float discipline: both engines average doubles
# per (cluster, dim) group in unspecified order, so centroids agree only to
# ~1e-16 relative — far inside the round-to-6 window on the output score,
# and an assignment flips only on a near-exact distance tie (none at the
# tested SFs; ties break on the smaller label in both engines regardless).
# posexplode's 0-based dim reproduces as UNNEST(range(len(e))) + e[dim+1].
_LLOYD_ASSIGN = """d{k} AS (
    SELECT v.vec_id, c.cl,
           sum((v.x - c.c) * (v.x - c.c)) AS d2
    FROM v JOIN c{p} c USING (dim)
    GROUP BY 1, 2),
a{k} AS (
    SELECT vec_id, cl, d2 FROM (
        SELECT vec_id, cl, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cl ASC) AS rn
        FROM d{k}) WHERE rn = 1)"""
_LLOYD_UPDATE = """c{k} AS (
    SELECT a.cl, v.dim, avg(v.x) AS c
    FROM v JOIN a{p} a USING (vec_id)
    GROUP BY 1, 2)"""

_lloyd_stages = []
for _r in range(1, 4):
    _lloyd_stages.append(_LLOYD_ASSIGN.format(k=_r, p=_r - 1))
    _lloyd_stages.append(_LLOYD_UPDATE.format(k=_r, p=_r))
_lloyd_stages.append(_LLOYD_ASSIGN.format(k=4, p=3))

ORACLES["q_lloyd_kmeans"] = ("""
WITH v AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           i.dim, CAST(embedding[i.dim + 1] AS DOUBLE) AS x
    FROM embeddings, UNNEST(range(len(embedding))) AS i(dim)),
c0 AS (SELECT label AS cl, dim, avg(x) AS c FROM v GROUP BY 1, 2),
""" + ",\n".join(_lloyd_stages) + """
SELECT vec_id, cl AS cluster, round(d2, 6) AS score FROM a4
""")


# --- q_route_clusters: impute → z-scale → 2-round Lloyd → sizes --------------
# Same unrolled-fixpoint technique as q_lloyd_kmeans, with the M1/M2
# preprocessing reproduced relationally: per-dim exact median (unused on the
# dense synthetic dims but kept in the plan), per-dim mean/stddev_samp
# z-scale, then 2 (assign, update) rounds + the final assignment, reduced to
# per-cluster sizes.  Count output makes the check assignment-exact: a
# single flipped vector would change two counts — the engines agree because
# every arithmetic step (median, avg, stddev_samp, the fold) matches to
# ~1e-15, far from any assignment tie at the tested SFs.
_rc_stages = []
for _r in range(1, 3):
    _rc_stages.append(_LLOYD_ASSIGN.format(k=_r, p=_r - 1))
    _rc_stages.append(_LLOYD_UPDATE.format(k=_r, p=_r))
_rc_stages.append(_LLOYD_ASSIGN.format(k=3, p=2))

ORACLES["q_route_clusters"] = ("""
WITH v0 AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           i.dim, CAST(embedding[i.dim + 1] AS DOUBLE) AS x
    FROM embeddings, UNNEST(range(8)) AS i(dim)),
med AS (SELECT dim, median(x) AS med FROM v0 GROUP BY 1),
imp AS (SELECT vec_id, label, dim, COALESCE(x, med) AS x
        FROM v0 JOIN med USING (dim)),
st AS (SELECT dim, avg(x) AS mu, stddev_samp(x) AS sd
       FROM imp GROUP BY 1),
v AS (SELECT vec_id, label, dim, (x - mu) / sd AS x
      FROM imp JOIN st USING (dim)),
c0 AS (SELECT label AS cl, dim, avg(x) AS c FROM v GROUP BY 1, 2),
""" + ",\n".join(_rc_stages) + """
SELECT cl AS cluster, count(*) AS n FROM a3 GROUP BY 1
""")


# --- q_lsh_neutral: integer-exact hyperplane LSH, reproduced in SQL ---------
# The bucket is pure integer arithmetic on both engines: plane weight
# w(p,i) = (p·1000003 + i + 1)·2654435761 % (10^9+7) % 1000 − 500, vector
# components quantized by floor(x·10^6) (floor — round-half ties differ
# across engines), projection = exact long sum, bit = (proj > 0).  The
# re-rank reuses q_cosine_topk's proven list_dot_product arithmetic.
_LSH_BIT = ("(CASE WHEN list_sum(list_transform(range(64), i -> "
            "CAST(floor(v[i + 1] * 1000000.0) AS BIGINT) * "
            "((({p} * 1000003 + i + 1) * 2654435761) "
            "% 1000000007 % 1000 - 500))) > 0 "
            "THEN 1 ELSE 0 END) * {w}")

ORACLES["q_lsh_neutral"] = ("""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (
    SELECT vec_id, v,
           CAST(""" +
    "\n               + ".join(_LSH_BIT.format(p=p, w=1 << (7 - p))
                               for p in range(8)) + """
           AS BIGINT) AS bucket
    FROM vecs),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM bkt q JOIN bkt c USING (bucket)
    WHERE q.vec_id IN (0, 1, 2, 3, 4) AND q.vec_id <> c.vec_id)
SELECT query_id, neighbor_id, cosine
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) <= 3
""")

# --- q_ivf_neutral: label-centroid coarse quantizer + nprobe + re-rank ------
# Cells are the deterministic per-label mean centroids (the lloyd init);
# both cell assignment and probe selection are argmin-L2 with the smaller-
# label tie-break, then candidates meet on the cell equi-join and re-rank
# with the q_cosine_topk arithmetic.  Centroid L2 sums drift ~1e-16 between
# engines — an assignment flips only on a near-exact tie (none at tested
# SFs), same adjudication as q_lloyd_kmeans.
ORACLES["q_ivf_neutral"] = """
WITH vecs AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           embedding::DOUBLE[] AS v FROM embeddings),
x AS (
    SELECT vec_id, label, i.dim, v[i.dim + 1] AS x
    FROM vecs, UNNEST(range(64)) AS i(dim)),
cents AS (
    SELECT label AS cell, list(c ORDER BY dim) AS cv
    FROM (SELECT label, dim, avg(x) AS c FROM x GROUP BY 1, 2)
    GROUP BY 1),
d2 AS (
    SELECT v.vec_id, c.cell,
           list_sum(list_transform(range(64),
               i -> (v.v[i + 1] - c.cv[i + 1])
                    * (v.v[i + 1] - c.cv[i + 1]))) AS d2
    FROM vecs v CROSS JOIN cents c),
cells AS (
    SELECT vec_id AS neighbor_id, cell FROM d2
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, cell ASC) = 1),
probes AS (
    SELECT vec_id AS query_id, cell FROM d2
    WHERE vec_id IN (0, 1, 2, 3, 4)
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, cell ASC) <= 2),
pairs AS (
    SELECT p.query_id, n.neighbor_id,
           round(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
    FROM probes p
    JOIN cells n USING (cell)
    JOIN vecs q ON q.vec_id = p.query_id
    JOIN vecs c ON c.vec_id = n.neighbor_id
    WHERE p.query_id <> n.neighbor_id)
SELECT query_id, neighbor_id, cosine
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id ASC) <= 3
"""


# --- q_minhash_pairs / q_minhash_incremental: the HOT-PATH pipeline ---------
# Since r5 both queries run minhash_lsh_pairs / minhash_lsh_match with the
# neutral hash family, so the oracles rebuild the EXACT hot-path semantics:
# unlike minhash_neutral_pairs, shingle_base_hashes splits on ' ' WITHOUT
# dropping empty words (the hot path never pays that filter), and the empty
# string hashes to the bare seed on both engines (_poly_hash guard).  Slots
# and band folds are identical to q_minhash_neutral; thresholds are integer
# slot counts (m >= 13 for tau=0.4, m >= 16 for tau=0.5).
_MH_SIG_CTES = f"""w AS (
    SELECT doc_id, string_split(text, ' ') AS wds
    FROM documents),
sh AS (
    SELECT doc_id, array_to_string(list_slice(wds, i, i + 2), ' ') AS s
    FROM w, UNNEST(generate_series(1, greatest(len(wds) - 2, 1))) t(i)),
bh AS (
    SELECT doc_id,
           CASE WHEN length(s) = 0 THEN 7
                ELSE list_reduce(
                  list_prepend(7::BIGINT,
                    list_transform(range(1, length(s) + 1),
                                   i -> ascii(substr(s, i, 1))::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % 1000000007) END AS h
    FROM sh),
perm(j, a, b) AS (
    VALUES {_PERM_VALUES}),
slots AS (
    SELECT doc_id, j, min((a * h + b) % 2147483647) AS slot
    FROM bh CROSS JOIN perm GROUP BY 1, 2),
bnd AS (
    SELECT doc_id, CAST(j // {_RPB} AS BIGINT) AS band,
           list(slot ORDER BY j) AS bs
    FROM slots GROUP BY 1, 2),
bkt AS (
    SELECT doc_id, band,
           list_reduce(list_prepend(band, bs),
                       (acc, s) -> (acc * 31 + s) % 1000000007) AS bucket
    FROM bnd)"""

ORACLES["q_minhash_pairs"] = f"""
WITH {_MH_SIG_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bkt a JOIN bkt b
      ON a.band = b.band AND a.bucket = b.bucket
     AND a.doc_id < b.doc_id),
eq AS (
    SELECT c.doc_a, c.doc_b,
           count(*) FILTER (sa.slot = sb.slot) AS m
    FROM cand c
    JOIN slots sa ON sa.doc_id = c.doc_a
    JOIN slots sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY 1, 2)
SELECT doc_a, doc_b, round(m / {float(_N_MINHASH)}, 6) AS est_jaccard
FROM eq WHERE m >= 13
"""

ORACLES["q_minhash_incremental"] = f"""
WITH {_MH_SIG_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
    FROM bkt a JOIN bkt b
      ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0),
eq AS (
    SELECT c.new_id, c.index_id,
           count(*) FILTER (sa.slot = sb.slot) AS m
    FROM cand c
    JOIN slots sa ON sa.doc_id = c.new_id
    JOIN slots sb ON sb.doc_id = c.index_id AND sb.j = sa.j
    GROUP BY 1, 2)
SELECT new_id, index_id, round(m / {float(_N_MINHASH)}, 6) AS est_jaccard
FROM eq WHERE m >= 16
"""

# --- q_minhash_oph / q_minhash_oph_pairs: one-permutation hashing -----------
# OPH signatures (pipeline/dedup.minhash_oph_signatures): the SAME unfiltered
# shingle split and polynomial base hash as the hot path (w/sh/bh mirror
# _MH_SIG_CTES), then ONE permutation — bin = h mod 32, min h per non-empty
# bin — and rotation densification: slot j takes the nearest non-empty bin
# at cyclic distance k to its right, value mv + k*2^31 (the offset stride
# exceeds every base hash, so borrowed slots only match borrowed slots of
# equal distance and value).  Integer arithmetic end-to-end.
_OPH_BINS = _N_MINHASH
_OPH_SIG_CTES = f"""w AS (
    SELECT doc_id, string_split(text, ' ') AS wds
    FROM documents),
sh AS (
    SELECT doc_id, array_to_string(list_slice(wds, i, i + 2), ' ') AS s
    FROM w, UNNEST(generate_series(1, greatest(len(wds) - 2, 1))) t(i)),
bh AS (
    SELECT doc_id,
           CASE WHEN length(s) = 0 THEN 7
                ELSE list_reduce(
                  list_prepend(7::BIGINT,
                    list_transform(range(1, length(s) + 1),
                                   i -> ascii(substr(s, i, 1))::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % 1000000007) END AS h
    FROM sh),
bins AS (
    SELECT doc_id, h % {_OPH_BINS} AS bin, min(h) AS mv
    FROM bh GROUP BY 1, 2),
js AS (SELECT unnest(generate_series(0, {_OPH_BINS - 1})) AS j),
dist AS (
    SELECT b.doc_id, js.j, b.mv,
           (b.bin - js.j + {_OPH_BINS}) % {_OPH_BINS} AS k,
           row_number() OVER (
             PARTITION BY b.doc_id, js.j
             ORDER BY (b.bin - js.j + {_OPH_BINS}) % {_OPH_BINS}) AS rn
    FROM bins b CROSS JOIN js),
oslots AS (
    SELECT doc_id, j, mv + k * {1 << 31} AS sval
    FROM dist WHERE rn = 1)"""

ORACLES["q_minhash_oph"] = f"""
WITH {_OPH_SIG_CTES}
SELECT doc_id, CAST(j AS INT) AS slot, sval AS value
FROM oslots
"""

ORACLES["q_minhash_oph_pairs"] = f"""
WITH {_OPH_SIG_CTES},
obnd AS (
    SELECT doc_id, CAST(j // {_RPB} AS BIGINT) AS band,
           list(sval ORDER BY j) AS bs
    FROM oslots GROUP BY 1, 2),
obkt AS (
    SELECT doc_id, band,
           list_reduce(list_prepend(band, bs),
                       (acc, s) -> (acc * 31 + s) % 1000000007) AS bucket
    FROM obnd),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM obkt a JOIN obkt b
      ON a.band = b.band AND a.bucket = b.bucket
     AND a.doc_id < b.doc_id),
eq AS (
    SELECT c.doc_a, c.doc_b,
           count(*) FILTER (sa.sval = sb.sval) AS m
    FROM cand c
    JOIN oslots sa ON sa.doc_id = c.doc_a
    JOIN oslots sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY 1, 2)
SELECT doc_a, doc_b, round(m / {float(_OPH_BINS)}, 6) AS est_jaccard
FROM eq WHERE m >= {-(-_OPH_BINS // 2)}
"""

# --- q_simhash: band candidates + exact Hamming over neutral fingerprints ---
# Reuses the verified q_simhash_neutral fingerprint construction; candidates
# share any 15-bit band, the pair keeps if bit_count(xor) <= 4.  Pure
# integer arithmetic end-to-end.
ORACLES["q_simhash"] = """
WITH tok AS (
    SELECT doc_id, t
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          FROM documents)
    WHERE t <> ''),
th AS (
    SELECT doc_id,
           list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(t) + 1),
                              i -> ascii(substr(t, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) * 1073741824
           + list_reduce(
             list_prepend(11::BIGINT,
               list_transform(range(1, length(t) + 1),
                              i -> ascii(substr(t, i, 1))::BIGINT)),
             (acc, c) -> (acc * 37 + c) % 1000000007) AS h
    FROM tok),
bits AS (SELECT unnest(generate_series(0, 59)) AS b),
votes AS (
    SELECT doc_id, b,
           sum(CASE WHEN (h // (1::BIGINT << b)) % 2 = 1
                    THEN 1 ELSE -1 END) AS v
    FROM th CROSS JOIN bits GROUP BY 1, 2),
fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY 1),
banded AS (
    SELECT doc_id, simhash, k.k AS band,
           (simhash // (1::BIGINT << (15 * k.k))) % 32768 AS bval
    FROM fp, UNNEST(generate_series(0, 3)) k(k)),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           any_value(a.simhash) AS fa, any_value(b.simhash) AS fb
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(fa, fb)) <= 4
"""


# --- q_postthrow_golden: pinned fixture replay (see queries.py) -------------
# Literal VALUES captured from the deterministic fixture run (dyadic
# coordinates + EMA model — libm-free): any drift in normalize, converge
# rate, sequence build/pad, the model seam, or the T2 un-pivot breaks the
# row-for-row hash.  Reference shape: outputs/postthrow_predictions_*.csv.
ORACLES["q_postthrow_golden"] = """
SELECT * FROM (VALUES
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 1::BIGINT, 0.000000::DOUBLE, 0.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 2::BIGINT, 0.551117::DOUBLE, 0.165335::DOUBLE, 0.385782::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 3::BIGINT, 0.329431::DOUBLE, 0.214564::DOUBLE, 0.114867::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 4::BIGINT, 0.552108::DOUBLE, 0.315827::DOUBLE, 0.236281::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 5::BIGINT, 0.551947::DOUBLE, 0.386663::DOUBLE, 0.165284::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 6::BIGINT, 0.323565::DOUBLE, 0.367734::DOUBLE, -0.044169::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 7::BIGINT, 0.552924::DOUBLE, 0.423291::DOUBLE, 0.129633::DOUBLE),
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 8::BIGINT, 0.552778::DOUBLE, 0.462137::DOUBLE, 0.090641::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 1::BIGINT, 0.000000::DOUBLE, 0.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 2::BIGINT, 0.551780::DOUBLE, 0.165534::DOUBLE, 0.386246::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 3::BIGINT, 0.324709::DOUBLE, 0.213287::DOUBLE, 0.111422::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 4::BIGINT, 0.552778::DOUBLE, 0.315134::DOUBLE, 0.237644::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 5::BIGINT, 0.552626::DOUBLE, 0.386382::DOUBLE, 0.166244::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 6::BIGINT, 0.318414::DOUBLE, 0.365991::DOUBLE, -0.047577::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 7::BIGINT, 0.553604::DOUBLE, 0.422275::DOUBLE, 0.131329::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 8::BIGINT, 0.553468::DOUBLE, 0.461633::DOUBLE, 0.091835::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 1::BIGINT, 0.000000::DOUBLE, 0.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 2::BIGINT, 0.552469::DOUBLE, 0.165741::DOUBLE, 0.386728::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 3::BIGINT, 0.319550::DOUBLE, 0.211883::DOUBLE, 0.107667::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 4::BIGINT, 0.553468::DOUBLE, 0.314359::DOUBLE, 0.239109::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 5::BIGINT, 0.553327::DOUBLE, 0.386049::DOUBLE, 0.167278::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 6::BIGINT, 0.312771::DOUBLE, 0.364066::DOUBLE, -0.051295::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 7::BIGINT, 0.554301::DOUBLE, 0.421136::DOUBLE, 0.133165::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 8::BIGINT, 0.554177::DOUBLE, 0.461049::DOUBLE, 0.093128::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 1::BIGINT, 0.000000::DOUBLE, 0.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 2::BIGINT, 0.553180::DOUBLE, 0.165954::DOUBLE, 0.387226::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 3::BIGINT, 0.313892::DOUBLE, 0.210335::DOUBLE, 0.103556::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 4::BIGINT, 0.554177::DOUBLE, 0.313488::DOUBLE, 0.240689::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 5::BIGINT, 0.554048::DOUBLE, 0.385656::DOUBLE, 0.168392::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 6::BIGINT, 0.306564::DOUBLE, 0.361928::DOUBLE, -0.055364::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 7::BIGINT, 0.555010::DOUBLE, 0.419853::DOUBLE, 0.135157::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 8::BIGINT, 0.554899::DOUBLE, 0.460367::DOUBLE, 0.094532::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 1::BIGINT, 0.000000::DOUBLE, 0.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 2::BIGINT, 0.553914::DOUBLE, 0.166174::DOUBLE, 0.387740::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 3::BIGINT, 0.307660::DOUBLE, 0.208620::DOUBLE, 0.099040::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 4::BIGINT, 0.554899::DOUBLE, 0.312504::DOUBLE, 0.242395::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 5::BIGINT, 0.554784::DOUBLE, 0.385188::DOUBLE, 0.169596::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 6::BIGINT, 0.299706::DOUBLE, 0.359543::DOUBLE, -0.059837::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 7::BIGINT, 0.555723::DOUBLE, 0.418397::DOUBLE, 0.137326::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 8::BIGINT, 0.555627::DOUBLE, 0.459566::DOUBLE, 0.096061::DOUBLE))
  AS t(game_id, play_id, nfl_id, frame_id, actual_converge_rate,
       predicted_converge_rate, residual)
"""

# --- q_routeexec_golden: pinned fixture replay (see queries.py) -------------
# Reference shape: outputs/RouteExecIQ.csv (route cluster, centroid
# deviation, within-cluster negated z, production context).  Cluster ids
# are re-labeled by min play_id, so the pin is invariant to the ML
# library's label permutation; values captured from the deterministic
# seeded fixture run.
ORACLES["q_routeexec_golden"] = """
SELECT * FROM (VALUES
    (1::BIGINT, 1::BIGINT, 101::BIGINT, 1::BIGINT, 0.110720::DOUBLE, 1.411887::DOUBLE, 'C', 1::BIGINT, 2.000000::DOUBLE, -0.250000::DOUBLE),
    (1::BIGINT, 2::BIGINT, 102::BIGINT, 2::BIGINT, 1.239303::DOUBLE, -0.776174::DOUBLE, 'C', 1::BIGINT, 4.000000::DOUBLE, 0.000000::DOUBLE),
    (1::BIGINT, 3::BIGINT, 103::BIGINT, 1::BIGINT, 1.166854::DOUBLE, -0.635713::DOUBLE, 'C', 1::BIGINT, 6.000000::DOUBLE, 0.250000::DOUBLE),
    (1::BIGINT, 4::BIGINT, 104::BIGINT, 2::BIGINT, 0.110720::DOUBLE, 1.411887::DOUBLE, 'C', 1::BIGINT, 8.000000::DOUBLE, 0.500000::DOUBLE),
    (1::BIGINT, 5::BIGINT, 105::BIGINT, 1::BIGINT, 1.239303::DOUBLE, -0.776174::DOUBLE, 'C', 1::BIGINT, 10.000000::DOUBLE, 0.750000::DOUBLE),
    (1::BIGINT, 6::BIGINT, 106::BIGINT, 2::BIGINT, 1.166854::DOUBLE, -0.635713::DOUBLE, 'I', 0::BIGINT, 12.000000::DOUBLE, 1.000000::DOUBLE))
  AS t(game_id, play_id, nfl_id, route_cluster, route_deviation,
       route_exec_iq, pass_result, pass_result_num, yards_gained, epa)
"""

# --- q_pca_embed: power-iteration PCA, unrolled as 1-row scalar stages ------
# Mirrors ml/clustering.pca_power_2d exactly: one moment aggregation (the
# only group sums — cross-engine drift ~1e-16 lives here), covariance via
# the one-pass formula, then EVERY downstream op is an explicitly-ordered
# scalar expression (+, ·, /, sqrt are IEEE exactly-rounded, so both
# engines run bit-identical arithmetic on near-identical inputs), 50
# rounds per component as 1-row CTE stages, deflation, sign canon on the
# largest-|loading| coordinate (smallest index on ties), map-side
# projection.  Final round-6 absorbs the moment drift.
def _pca_oracle_sql(d: int = 6, iters: int = 50) -> str:
    cols_c = [f"c{i}_{j}" for i in range(d) for j in range(d)]
    carry = ", ".join(cols_c)

    def matvec(i: int, src: str = "v") -> str:
        return " + ".join(f"c{i}_{j} * {src}{j}" for j in range(d))

    def stages(prefix: str, start: str) -> list[str]:
        out = []
        prev = start
        for k in range(iters):
            w = ", ".join(f"{matvec(i)} AS w{i}" for i in range(d))
            nrm = " + ".join(f"w{i} * w{i}" for i in range(d))
            out.append(f"{prefix}w{k} AS (SELECT {carry}, {w} "
                       f"FROM {prev})")
            vv = ", ".join(f"w{i} / sqrt({nrm}) AS v{i}"
                           for i in range(d))
            out.append(f"{prefix}v{k} AS (SELECT {carry}, {vv} "
                       f"FROM {prefix}w{k})")
            prev = f"{prefix}v{k}"
        mx = "greatest(" + ", ".join(f"abs(v{i})" for i in range(d)) + ")"
        sgn = "CASE " + " ".join(
            f"WHEN abs(v{i}) = __mx THEN "
            f"(CASE WHEN v{i} > 0 THEN 1.0 ELSE -1.0 END)"
            for i in range(d)) + " END"
        canon = ", ".join(f"v{i} * __s AS v{i}" for i in range(d))
        out.append(f"{prefix}c AS (SELECT {carry}, {canon} FROM "
                   f"(SELECT *, {sgn} AS __s FROM "
                   f"(SELECT *, {mx} AS __mx FROM {prev})))")
        return out

    sums = ", ".join(f"sum(a[{j + 1}]) AS s{j}" for j in range(d))
    prods = ", ".join(f"sum(a[{i + 1}] * a[{j + 1}]) AS p{i}_{j}"
                      for i in range(d) for j in range(i, d))
    covs = ", ".join(
        f"(p{min(i, j)}_{max(i, j)} - s{i} * s{j} / n) / (n - 1.0) "
        f"AS c{i}_{j}" for i in range(d) for j in range(d))
    ones = ", ".join(f"1.0::DOUBLE AS v{i}" for i in range(d))

    # deflation: lam = v·(C v); C2 = C − lam·v vᵀ (sign cancels)
    cvs = ", ".join(f"{matvec(i)} AS cv{i}" for i in range(d))
    lam = " + ".join(f"v{i} * cv{i}" for i in range(d))
    cov2 = ", ".join(f"c{i}_{j} - __lam * v{i} * v{j} AS c{i}_{j}"
                     for i in range(d) for j in range(d))
    vcols1 = ", ".join(f"v{i} AS u{i}" for i in range(d))

    p1 = " + ".join(f"(e.a[{j + 1}] - m.mu{j}) * f1.u{j}"
                    for j in range(d))
    p2 = " + ".join(f"(e.a[{j + 1}] - m.mu{j}) * f2.v{j}"
                    for j in range(d))
    mus = ", ".join(f"s{j} / n AS mu{j}" for j in range(d))

    return (
        "\nWITH e AS (\n"
        "    SELECT vec_id, list_transform(embedding[1:" + str(d) + "], "
        "x -> CAST(x AS DOUBLE)) AS a\n"
        "    FROM embeddings),\n"
        f"agg AS (SELECT count(*)::DOUBLE AS n, {sums}, {prods} FROM e),\n"
        f"cov AS (SELECT {covs} FROM agg),\n"
        f"m AS (SELECT {mus} FROM agg),\n"
        f"a0 AS (SELECT {carry}, {ones} FROM cov),\n"
        + ",\n".join(stages("a", "a0")) + ",\n"
        f"f1 AS (SELECT {vcols1} FROM ac),\n"
        f"lamt AS (SELECT *, {lam} AS __lam FROM "
        f"(SELECT {carry}, "
        + ", ".join(f"v{i}" for i in range(d))
        + f", {cvs} FROM ac)),\n"
        f"cov2 AS (SELECT {cov2} FROM lamt),\n"
        f"b0 AS (SELECT {carry}, {ones} FROM cov2),\n"
        + ",\n".join(stages("b", "b0")) + ",\n"
        "f2 AS (SELECT * FROM bc)\n"
        f"SELECT e.vec_id, round({p1}, 6) AS pc1, round({p2}, 6) AS pc2\n"
        "FROM e CROSS JOIN m CROSS JOIN f1 CROSS JOIN f2\n"
    )


ORACLES["q_pca_embed"] = _pca_oracle_sql()


# --- q_hll_incremental: day-grain register state, max-merged in SQL ---------
# Set algebra on the register tables: singles estimate as above, pair
# unions via max-merge of the two types' registers, then inclusion-
# exclusion over the ROUNDED estimates (round-before-subtract).
ORACLES["q_hll_overlap"] = f"""
WITH h0 AS (
    SELECT event_type, user_id,
           ((user_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM events),
h1 AS (
    SELECT event_type,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT event_type,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT event_type, xor(hv, hv >> 16) AS hv
    FROM h2),
r AS (
    SELECT event_type, hv % 256 AS idx, hv // 256 AS w
    FROM h),
rho AS (
    SELECT event_type, idx,
           CASE WHEN w = 0 THEN 25
                ELSE CAST(round(log2(w & (-w))) AS INT) + 1 END AS rho
    FROM r),
regs AS MATERIALIZED (
    SELECT event_type, idx, max(rho) AS m
    FROM rho GROUP BY 1, 2),
single_per AS (
    SELECT event_type,
           CAST(sum(CAST(round(power(2, 32 - m)) AS BIGINT)) AS BIGINT)
             AS s_present,
           count(*) AS n_present
    FROM regs GROUP BY 1),
single_fin AS (
    SELECT event_type,
           round(CASE WHEN {_HLL_NUM!r} / CAST(s_present
                          + (256 - n_present) * 4294967296 AS DOUBLE)
                          <= 640.0
                       AND (256 - n_present) > 0
                 THEN 256.0 * ln(256.0
                                 / CAST(256 - n_present AS DOUBLE))
                 ELSE {_HLL_NUM!r} / CAST(s_present
                          + (256 - n_present) * 4294967296 AS DOUBLE)
                 END, 6) AS e
    FROM single_per),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM (SELECT DISTINCT event_type FROM regs) a
    JOIN (SELECT DISTINCT event_type FROM regs) b
      ON a.event_type < b.event_type),
pair_regs AS (
    SELECT p.type_a, p.type_b, g.idx, max(g.m) AS m
    FROM pairs p JOIN regs g
      ON g.event_type = p.type_a OR g.event_type = p.type_b
    GROUP BY 1, 2, 3),
pair_per AS (
    SELECT type_a, type_b,
           CAST(sum(CAST(round(power(2, 32 - m)) AS BIGINT)) AS BIGINT)
             AS s_present,
           count(*) AS n_present
    FROM pair_regs GROUP BY 1, 2),
pair_fin AS (
    SELECT type_a, type_b,
           round(CASE WHEN {_HLL_NUM!r} / CAST(s_present
                          + (256 - n_present) * 4294967296 AS DOUBLE)
                          <= 640.0
                       AND (256 - n_present) > 0
                 THEN 256.0 * ln(256.0
                                 / CAST(256 - n_present AS DOUBLE))
                 ELSE {_HLL_NUM!r} / CAST(s_present
                          + (256 - n_present) * 4294967296 AS DOUBLE)
                 END, 6) AS est_union
    FROM pair_per)
SELECT p.type_a, p.type_b,
       sa.e AS est_a, sb.e AS est_b, p.est_union,
       round(sa.e + sb.e - p.est_union, 6) AS est_intersection
FROM pair_fin p
JOIN single_fin sa ON p.type_a = sa.event_type
JOIN single_fin sb ON p.type_b = sb.event_type
"""


# Audience MinHash: the affine (a, b) coefficients come from the SAME
# deterministic LCG as the engine (imported, injected as literals), so
# every slot minimum and the slot-agreement count reproduce exactly.
def _minhash_audience_oracle(n: int = 32) -> str:
    from .pipeline.dedup import _MH_PRIME, _mh_coeffs
    slots = ",\n       ".join(
        f"min(({a} * h + {b}) % {_MH_PRIME}) AS s{i}"
        for i, (a, b) in enumerate(_mh_coeffs(n)))
    match_terms = " + ".join(
        f"CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END"
        for i in range(n))
    return f"""
WITH h AS (
    SELECT CAST(ts AS DATE) AS day, user_id % {_MH_PRIME} AS h
    FROM events),
sig AS MATERIALIZED (
    SELECT day,
       {slots}
    FROM h GROUP BY 1)
SELECT x.day AS day_a, y.day AS day_b,
       CAST({match_terms} AS BIGINT) AS n_match,
       round(({match_terms}) / {float(n)!r}, 6) AS est_jaccard
FROM sig x JOIN sig y ON y.day - x.day = 7
"""


ORACLES["q_minhash_audience"] = _minhash_audience_oracle()


# Extends the q_hll_neutral chain with the incremental shape: registers
# materialize at (event_type, day) grain (the persisted batch state), then
# element-wise max-merge to event_type — associativity of max makes the
# merge lossless, and the oracle reproduces BOTH levels bit-for-bit.
ORACLES["q_hll_incremental"] = f"""
WITH h0 AS (
    SELECT event_type, CAST(ts AS DATE) AS day, user_id,
           ((user_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM events),
h1 AS (
    SELECT event_type, day,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT event_type, day,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT event_type, day, xor(hv, hv >> 16) AS hv
    FROM h2),
r AS (
    SELECT event_type, day, hv % 256 AS idx,
           hv // 256 AS w
    FROM h),
rho AS (
    SELECT event_type, day, idx,
           CASE WHEN w = 0 THEN 25
                ELSE CAST(round(log2(w & (-w))) AS INT) + 1 END AS rho
    FROM r),
regs_day AS (
    SELECT event_type, day, idx, max(rho) AS m
    FROM rho GROUP BY 1, 2, 3),
regs AS (
    SELECT event_type, idx, max(m) AS m
    FROM regs_day GROUP BY 1, 2),
per AS (
    SELECT event_type,
           CAST(sum(CAST(round(power(2, 32 - m)) AS BIGINT)) AS BIGINT)
             AS s_present,
           count(*) AS n_present
    FROM regs GROUP BY 1),
est AS (
    SELECT event_type, (256 - n_present) AS zeros,
           {_HLL_NUM!r} / CAST(s_present
               + (256 - n_present) * 4294967296 AS DOUBLE) AS est_raw
    FROM per),
fin AS (
    SELECT event_type,
           CASE WHEN est_raw <= 640.0 AND zeros > 0
                THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
                ELSE est_raw END AS e
    FROM est),
batches AS (
    SELECT event_type, count(DISTINCT day) AS n_batches
    FROM h0 GROUP BY 1)
SELECT f.event_type, b.n_batches, round(f.e, 6) AS hll_estimate
FROM fin f JOIN batches b USING (event_type)
"""


# --- q_quantile_sketch: bottom-k-by-hash quantile sample, in SQL ------------
# Same wang_mixed_hash chain as the HLL oracles, on event_id.  min-k by a
# fixed hash is associative, so the engine's day-grain build + merge equals
# the direct per-group bottom-128 the oracle computes — the oracle thereby
# verifies the merge, not just the sample.  Exact sample percentiles via
# quantile_cont (the established F.percentile twin).
ORACLES["q_quantile_sketch"] = """
WITH h0 AS (
    SELECT event_type, event_id, value,
           ((event_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM events),
h1 AS (
    SELECT event_type, event_id, value,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT event_type, event_id, value,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT event_type, event_id, value, xor(hv, hv >> 16) AS hv
    FROM h2),
r AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY hv, event_id) AS rn
    FROM h)
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.90), 6) AS p90,
       count(*) AS n_sample
FROM r WHERE rn <= 128
GROUP BY event_type
"""


# --- q_media_ahash: perceptual average-hash from the decoded bytes ----------
# The fake decode is byte-deterministic (byte i of the utf-8 payload =
# ascii of char i+1 for this ASCII corpus), and every block threshold is
# the integer cross-multiplication bs·n > total·bc — no float ties — so
# the 64-bit fingerprint and its band keys reproduce exactly.  bit_or
# assembles the hash (distinct block masks; the bit-63 mask is the
# explicit min-long, as in the Bloom oracle); bands are arithmetic-shift
# + mask, sign-safe because the mask strips the propagated sign bits.
ORACLES["q_media_ahash"] = """
WITH px AS (
    SELECT doc_id, (i - 1) // 4 AS blk,
           CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS v
    FROM documents,
         UNNEST(range(1, least(length(text), 256) + 1)) t(i)),
tot AS (SELECT doc_id, sum(v) AS total, count(*) AS n
        FROM px GROUP BY 1),
blk AS (SELECT doc_id, blk, sum(v) AS bs, count(*) AS bc
        FROM px GROUP BY 1, 2),
bits AS (
    SELECT b.doc_id, b.blk
    FROM blk b JOIN tot t USING (doc_id)
    WHERE b.bs * t.n > t.total * b.bc),
h AS (
    SELECT doc_id,
           bit_or(CASE WHEN blk = 63
                       THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                       ELSE 1::BIGINT << CAST(blk AS INT) END) AS ahash
    FROM bits GROUP BY 1)
SELECT d.doc_id AS media_id,
       coalesce(h.ahash, 0) AS ahash,
       (coalesce(h.ahash, 0) >> 0)  & 65535 AS band0,
       (coalesce(h.ahash, 0) >> 16) & 65535 AS band1,
       (coalesce(h.ahash, 0) >> 32) & 65535 AS band2,
       (coalesce(h.ahash, 0) >> 48) & 65535 AS band3
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
"""


# --- q_bloom_ingest_gate: neutral Bloom bit table + k-probe gate, in SQL ----
# Probe i hashes (key + i·1000003) through the wang chain; word/mask use
# the same 1::BIGINT << (bit % 64) arithmetic as the engine (arithmetic
# shift-right extraction is sign-safe for every position incl. bit 63).
# bit_or is associative+idempotent, so the day-grain build + OR-merge in
# the engine equals this oracle's one-shot bit table over the history.
ORACLES["q_bloom_ingest_gate"] = """
WITH last AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
hist AS (
    SELECT user_id FROM events
    WHERE CAST(ts AS DATE) < (SELECT d FROM last)),
batch AS (
    SELECT event_id, event_type, user_id FROM events
    WHERE CAST(ts AS DATE) = (SELECT d FROM last)),
probes AS (SELECT unnest([0, 1, 2, 3]) AS i),
hh0 AS (
    SELECT ((user_id + i * 1000003) % 2147483648) * 2654435761
           % 4294967296 AS hv
    FROM hist CROSS JOIN probes),
hh1 AS (SELECT (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM hh0),
hh2 AS (SELECT (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM hh1),
hp AS (SELECT xor(hv, hv >> 16) % 16384 AS bit FROM hh2),
words AS MATERIALIZED (
    -- DuckDB raises on the signed-overflow shift 1 << 63 (Spark wraps
    -- to min-long); spell the sign-bit mask out explicitly
    SELECT bit // 64 AS word,
           bit_or(CASE WHEN bit % 64 = 63
                       THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                       ELSE 1::BIGINT << CAST(bit % 64 AS INT) END)
             AS bits
    FROM hp GROUP BY 1),
bh0 AS (
    SELECT event_id, event_type,
           ((user_id + i * 1000003) % 2147483648) * 2654435761
           % 4294967296 AS hv
    FROM batch CROSS JOIN probes),
bh1 AS (SELECT event_id, event_type,
               (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM bh0),
bh2 AS (SELECT event_id, event_type,
               (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM bh1),
bp AS (SELECT event_id, event_type,
              xor(hv, hv >> 16) % 16384 AS bit FROM bh2),
hit AS (
    SELECT event_id, event_type,
           count(*) FILTER (
               WHERE w.bits IS NOT NULL
                 AND ((w.bits >> CAST(bit % 64 AS INT)) & 1) = 1)
             AS nhit
    FROM bp LEFT JOIN words w ON bit // 64 = w.word
    GROUP BY 1, 2)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(CASE WHEN nhit = 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_maybe_seen,
       CAST(sum(CASE WHEN nhit = 4 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_new
FROM hit GROUP BY 1
"""


# --- q_bpe_merges: 8 BPE merge rounds, unrolled in SQL ----------------------
# Pure integer/string work, so the oracle is EXACT: word frequencies, then
# per round (pair-count over the current segmentation → argmax with the
# count-desc/pair-lexicographic tie-break → greedy merge application).
# Segmentations live as strings of WRAPPED symbols (SEP+sym+SEP): wrapping
# makes adjacent pair patterns non-overlapping, so non-overlapping
# left-to-right replace() reproduces the engine's greedy _merge_word fold
# exactly (verified on the aaa/aaaa run cases).  The driver-side top-K
# vocab cap is a no-op at tested SFs (vocab ≪ cap), so the oracle reads
# the full frequency table.
def _bpe_oracle_sql(n_merges: int = 8, final: str | None = None) -> str:
    """The shared unrolled-BPE CTE chain; ``final`` overrides the default
    merges-list select (q_bpe_encode reuses the chain and reads the last
    segmentation stage instead)."""
    sep = "chr(31)"
    stages = []
    for k in range(n_merges):
        stages.append(f"""pc{k} AS (
    SELECT s[i] AS l, s[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT cnt,
                 list_filter(string_split(seg, {sep}), x -> x <> '') AS s
          FROM seg{k}),
         UNNEST(range(1, len(s))) t(i)
    GROUP BY 1, 2),
m{k} AS MATERIALIZED (SELECT l, r, c FROM pc{k}
         ORDER BY c DESC, l ASC, r ASC LIMIT 1),
seg{k + 1} AS MATERIALIZED (
    SELECT word, cnt,
           replace(seg,
                   (SELECT {sep} || l || {sep} || {sep} || r || {sep}
                    FROM m{k}),
                   (SELECT {sep} || l || r || {sep} FROM m{k})) AS seg
    FROM seg{k})""")
    finals = final if final is not None else "\nUNION ALL\n".join(
        f'SELECT {k}::BIGINT AS rank, l AS "left", r AS "right", '
        f"l || r AS merged, c AS pair_count FROM m{k}"
        for k in range(n_merges))
    return f"""
WITH wf AS (
    SELECT w AS word, count(*)::BIGINT AS cnt
    FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                    t -> t <> '')) AS w
          FROM documents)
    GROUP BY 1),
seg0 AS MATERIALIZED (
    SELECT word, cnt,
           array_to_string(list_transform(
               range(1, length(word) + 1),
               i -> {sep} || substr(word, i, 1) || {sep}), '') AS seg
    FROM wf),
""" + ",\n".join(stages) + "\n" + finals


ORACLES["q_bpe_merges"] = _bpe_oracle_sql()

# Encode side: the SAME 8 unrolled merge rounds produce the word→pieces
# map (seg8); per-doc piece counts are a words-join + sum.  LEFT JOINs +
# coalesce keep zero-word documents at n_pieces=0, matching the engine's
# fold over an empty word array.
ORACLES["q_bpe_encode"] = _bpe_oracle_sql(final="""
SELECT d.doc_id,
       CAST(coalesce(sum(len(list_filter(
                string_split(s.seg, chr(31)), x -> x <> ''))), 0)
            AS BIGINT) AS n_pieces
FROM documents d
LEFT JOIN (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '),
                                     t -> t <> '')) AS word
           FROM documents) w ON d.doc_id = w.doc_id
LEFT JOIN seg8 s ON w.word = s.word
GROUP BY 1
""")


# --- q_pq_topk: the full PQ pipeline (train → encode → ADC), in SQL ---------
# Neutral family since r5: both id hashes (train sample, code init) are the
# wang_mixed_hash chain the HLL oracles already mirror.  The two Lloyd
# rounds unroll with DENSE-POSITION codebooks — the hot path's argmin
# returns the position among the subspace's PRESENT codes (sorted by code),
# and the ADC lookup indexes the same sorted order, so renumbering per
# round reproduces the engine's gap-safe semantics exactly even if a cell
# empties.  Distances are group sums vs the engine's in-row ordered folds
# (~1e-16 drift, inside round-6; argmin flips only on near-exact ties —
# the q_lloyd_kmeans adjudication).  MATERIALIZED throughout: every stage
# is referenced at least twice.
ORACLES["q_pq_topk"] = """
WITH h AS MATERIALIZED (
    SELECT vec_id,
           xor(h2x, h2x >> 16) AS hv FROM (
      SELECT vec_id,
             (xor(h1x, h1x >> 16) * 73244475) % 4294967296 AS h2x FROM (
        SELECT vec_id,
               (xor(h0x, h0x >> 16) * 73244475) % 4294967296 AS h1x FROM (
          SELECT vec_id,
                 ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h0x
          FROM embeddings)))),
sub AS MATERIALIZED (
    SELECT e.vec_id, CAST(i.si AS INT) AS s, CAST(i.di AS INT) AS d,
           CAST(e.embedding[i.si * 8 + i.di + 1] AS DOUBLE) AS x
    FROM embeddings e,
         (SELECT a.si, b.di FROM UNNEST(range(8)) a(si),
                                 UNNEST(range(8)) b(di)) i),
train AS MATERIALIZED (
    SELECT s.* FROM sub s JOIN h USING (vec_id) WHERE h.hv % 1000 < 250),
a0 AS MATERIALIZED (
    SELECT vec_id, CAST(hv % 16 AS INT) AS code FROM h
    WHERE hv % 1000 < 250),
c1 AS MATERIALIZED (
    SELECT t.s, a.code, t.d, avg(t.x) AS c
    FROM train t JOIN a0 a USING (vec_id)
    GROUP BY 1, 2, 3),
p1 AS MATERIALIZED (
    SELECT s, code,
           CAST(row_number() OVER (PARTITION BY s ORDER BY code) - 1
                AS INT) AS pos
    FROM (SELECT DISTINCT s, code FROM c1)),
b1 AS MATERIALIZED (
    SELECT c1.s, p1.pos, c1.d, c1.c
    FROM c1 JOIN p1 USING (s, code)),
d1 AS MATERIALIZED (
    SELECT t.vec_id, t.s, b.pos,
           sum((t.x - b.c) * (t.x - b.c)) AS d2
    FROM train t JOIN b1 b ON t.s = b.s AND t.d = b.d
    GROUP BY 1, 2, 3),
a1 AS MATERIALIZED (
    SELECT vec_id, s, pos AS code FROM d1
    QUALIFY row_number() OVER (PARTITION BY vec_id, s
                               ORDER BY d2 ASC, pos ASC) = 1),
c2 AS MATERIALIZED (
    SELECT t.s, a.code, t.d, avg(t.x) AS c
    FROM train t JOIN a1 a ON t.vec_id = a.vec_id AND t.s = a.s
    GROUP BY 1, 2, 3),
p2 AS MATERIALIZED (
    SELECT s, code,
           CAST(row_number() OVER (PARTITION BY s ORDER BY code) - 1
                AS INT) AS pos
    FROM (SELECT DISTINCT s, code FROM c2)),
b2 AS MATERIALIZED (
    SELECT c2.s, p2.pos, c2.d, c2.c
    FROM c2 JOIN p2 USING (s, code)),
enc AS MATERIALIZED (
    SELECT vec_id, s, pos FROM (
      SELECT u.vec_id, u.s, b.pos,
             sum((u.x - b.c) * (u.x - b.c)) AS d2
      FROM sub u JOIN b2 b ON u.s = b.s AND u.d = b.d
      GROUP BY 1, 2, 3)
    QUALIFY row_number() OVER (PARTITION BY vec_id, s
                               ORDER BY d2 ASC, pos ASC) = 1),
pd AS MATERIALIZED (
    SELECT q.vec_id AS query_id, q.s, b.pos,
           sum((q.x - b.c) * (q.x - b.c)) AS pd
    FROM sub q JOIN b2 b ON q.s = b.s AND q.d = b.d
    WHERE q.vec_id IN (0, 1, 2, 3, 4)
    GROUP BY 1, 2, 3),
adc AS (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           round(sum(p.pd), 6) AS approx_d2
    FROM enc e JOIN pd p ON e.s = p.s AND e.pos = p.pos
    WHERE e.vec_id <> p.query_id
    GROUP BY 1, 2)
SELECT query_id, neighbor_id, approx_d2
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY approx_d2 ASC, neighbor_id ASC) <= 3
"""


# --- q_ivfpq_topk: IVF-PQ composite, fully in SQL ---------------------------
# Composes the two verified constructions: label-centroid coarse cells +
# nprobe routing (the q_ivf_neutral oracle) and the one-round neutral-PQ
# codebook/encode/ADC (the q_pq_topk oracle, iters=1 here), then restricts
# the ADC join to the probed cells exactly as the engine's broadcast
# cell equi-join does.
ORACLES["q_ivfpq_topk"] = """
WITH xv AS MATERIALIZED (
    SELECT vec_id, CAST(label AS BIGINT) AS label, i.dim,
           CAST(embedding[i.dim + 1] AS DOUBLE) AS x
    FROM embeddings, UNNEST(range(64)) AS i(dim)),
cents AS MATERIALIZED (
    SELECT label AS cell, dim, avg(x) AS c
    FROM xv GROUP BY 1, 2),
celld AS MATERIALIZED (
    SELECT v.vec_id, c.cell, sum((v.x - c.c) * (v.x - c.c)) AS d2
    FROM xv v JOIN cents c USING (dim)
    GROUP BY 1, 2),
cells AS MATERIALIZED (
    SELECT vec_id AS neighbor_id, cell FROM celld
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, cell ASC) = 1),
probes AS MATERIALIZED (
    SELECT vec_id AS query_id, cell FROM celld
    WHERE vec_id IN (0, 1, 2, 3, 4)
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, cell ASC) <= 2),
h AS MATERIALIZED (
    SELECT vec_id,
           xor(h2x, h2x >> 16) AS hv FROM (
      SELECT vec_id,
             (xor(h1x, h1x >> 16) * 73244475) % 4294967296 AS h2x FROM (
        SELECT vec_id,
               (xor(h0x, h0x >> 16) * 73244475) % 4294967296 AS h1x FROM (
          SELECT vec_id,
                 ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h0x
          FROM embeddings)))),
sub AS MATERIALIZED (
    SELECT vec_id, CAST(dim // 8 AS INT) AS s, CAST(dim % 8 AS INT) AS d,
           x
    FROM xv),
a0 AS MATERIALIZED (
    SELECT vec_id, CAST(hv % 16 AS INT) AS code FROM h
    WHERE hv % 1000 < 250),
c1 AS MATERIALIZED (
    SELECT t.s, a.code, t.d, avg(t.x) AS c
    FROM sub t JOIN a0 a USING (vec_id)
    GROUP BY 1, 2, 3),
p1 AS MATERIALIZED (
    SELECT s, code,
           CAST(row_number() OVER (PARTITION BY s ORDER BY code) - 1
                AS INT) AS pos
    FROM (SELECT DISTINCT s, code FROM c1)),
b1 AS MATERIALIZED (
    SELECT c1.s, p1.pos, c1.d, c1.c
    FROM c1 JOIN p1 USING (s, code)),
enc AS MATERIALIZED (
    SELECT vec_id AS neighbor_id, s, pos FROM (
      SELECT u.vec_id, u.s, b.pos,
             sum((u.x - b.c) * (u.x - b.c)) AS d2
      FROM sub u JOIN b1 b ON u.s = b.s AND u.d = b.d
      GROUP BY 1, 2, 3)
    QUALIFY row_number() OVER (PARTITION BY vec_id, s
                               ORDER BY d2 ASC, pos ASC) = 1),
pd AS MATERIALIZED (
    SELECT q.vec_id AS query_id, q.s, b.pos,
           sum((q.x - b.c) * (q.x - b.c)) AS pd
    FROM sub q JOIN b1 b ON q.s = b.s AND q.d = b.d
    WHERE q.vec_id IN (0, 1, 2, 3, 4)
    GROUP BY 1, 2, 3),
adc AS (
    SELECT p.query_id, e.neighbor_id,
           round(sum(p.pd), 6) AS approx_d2
    FROM enc e
    JOIN pd p ON e.s = p.s AND e.pos = p.pos
    JOIN cells cl ON cl.neighbor_id = e.neighbor_id
    JOIN probes pr ON pr.query_id = p.query_id AND pr.cell = cl.cell
    WHERE e.neighbor_id <> p.query_id
    GROUP BY 1, 2)
SELECT query_id, neighbor_id, approx_d2
FROM adc
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY approx_d2 ASC, neighbor_id ASC) <= 3
"""

# q_pmi_collocations — PMI over adjacent token bigrams, min_count=3:
# identical integer counts, the identical double division/ln sequence,
# rounded at 6 digits per row (no float sums anywhere).
ORACLES["q_pmi_collocations"] = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, t.pos, t.term FROM documents,
      LATERAL (SELECT unnest(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS term,
                      generate_subscripts(list_filter(
                          string_split(text, ' '), x -> x <> ''), 1)
                        AS pos) t),
pairs AS (
    SELECT doc_id, prev, term FROM (
        SELECT doc_id, term,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM tok)
    WHERE prev IS NOT NULL),
uni AS MATERIALIZED (
    SELECT term, count(*) AS ucnt FROM tok GROUP BY 1),
ntok AS (SELECT CAST(sum(ucnt) AS BIGINT) AS n_tok FROM uni),
big AS (SELECT prev, term, count(*) AS n_pair FROM pairs GROUP BY 1, 2),
nbig AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_big FROM big)
SELECT b.prev, b.term, CAST(b.n_pair AS BIGINT) AS n_pair,
       CAST(ua.ucnt AS BIGINT) AS n_prev,
       CAST(ub.ucnt AS BIGINT) AS n_term,
       round(ln((CAST(b.n_pair AS DOUBLE) / CAST(n_big AS DOUBLE))
                / ((CAST(ua.ucnt AS DOUBLE) / CAST(n_tok AS DOUBLE))
                   * (CAST(ub.ucnt AS DOUBLE) / CAST(n_tok AS DOUBLE)))),
             6) AS pmi
FROM big b
JOIN uni ua ON b.prev = ua.term
JOIN uni ub ON b.term = ub.term
CROSS JOIN nbig CROSS JOIN ntok
WHERE b.n_pair >= 3
"""

# q_mutual_information — MI / marginal entropies / NMI between lang and
# source: joint counts once, marginals derived from the cell table, every
# p·ln(p) term rounded at 9 digits before the sum (q_group_entropy
# discipline).
ORACLES["q_mutual_information"] = """
WITH joint AS (
    SELECT lang, source, count(*) AS n_xy FROM documents GROUP BY 1, 2),
mx AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x FROM joint GROUP BY 1),
my AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y
       FROM joint GROUP BY 1),
tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM joint),
terms AS (
    SELECT n,
        round((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
              * ln((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
                   / ((CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)))),
              9) AS mi_t
    FROM joint JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot),
hx AS (
    SELECT round(sum(round(-(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE)),
                           9)), 6) AS h_x
    FROM mx CROSS JOIN tot),
hy AS (
    SELECT round(sum(round(-(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
                           * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)),
                           9)), 6) AS h_y
    FROM my CROSS JOIN tot),
agg AS (
    SELECT n, round(sum(mi_t), 6) AS mi, h_x, h_y
    FROM terms CROSS JOIN hx CROSS JOIN hy GROUP BY 1, 3, 4)
SELECT n, mi, h_x, h_y,
       CASE WHEN h_x > 0 AND h_y > 0
            THEN round(mi / sqrt(h_x * h_y), 6) ELSE 0.0 END AS nmi
FROM agg
"""

# q_dsir_weights — DSIR importance weights toward lang='en': neutral
# polynomial token hash mod 64, Laplace-1 smoothed bucket log-ratios in
# integer micro-nats, per-doc LONG sums (order-free).
ORACLES["q_dsir_weights"] = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, (lang = 'en') AS is_target,
           unnest(list_filter(string_split(text, ' '), t -> t <> ''))
             AS term
    FROM documents),
db AS MATERIALIZED (
    SELECT doc_id, is_target,
           list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(term) + 1),
                              i -> ascii(substr(term, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) % 64 AS bucket,
           count(*) AS cnt
    FROM tok GROUP BY 1, 2, 3),
raw AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_raw
        FROM db GROUP BY 1),
tgt AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS c_tgt
        FROM db WHERE is_target GROUP BY 1),
traw AS (SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw FROM raw),
ttgt AS (SELECT CAST(coalesce(sum(c_tgt), 0) AS BIGINT) AS t_tgt
         FROM tgt),
lr AS (
    SELECT r.bucket,
           CAST(round(ln(
               (CAST(coalesce(c_tgt, 0) + 1 AS DOUBLE)
                / CAST(t_tgt + 64 AS DOUBLE))
               / (CAST(c_raw + 1 AS DOUBLE)
                  / CAST(t_raw + 64 AS DOUBLE)))
             * 1000000) AS BIGINT) AS lr_u
    FROM raw r LEFT JOIN tgt USING (bucket)
    CROSS JOIN traw CROSS JOIN ttgt)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       round(CAST(sum(cnt * lr_u) AS BIGINT) / 1000000.0, 6)
         AS log_weight
FROM db JOIN lr USING (bucket)
GROUP BY 1
"""

# q_item_similarity — co-occurrence cosine/jaccard over order baskets:
# identical long counts, identical scalar similarity expressions.
ORACLES["q_item_similarity"] = """
WITH items AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
    FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
    GROUP BY 1, 2
    HAVING count(*) >= 3),
per_item AS (SELECT item, count(*) AS n_item FROM items GROUP BY 1)
SELECT p.item_a, p.item_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(ia.n_item AS BIGINT) AS n_a, CAST(ib.n_item AS BIGINT) AS n_b,
       round(CAST(p.n_ab AS DOUBLE)
             / sqrt(CAST(ia.n_item * ib.n_item AS DOUBLE)), 6) AS cosine,
       round(CAST(p.n_ab AS DOUBLE)
             / CAST(ia.n_item + ib.n_item - p.n_ab AS DOUBLE), 6)
         AS jaccard
FROM pairs p
JOIN per_item ia ON p.item_a = ia.item
JOIN per_item ib ON p.item_b = ib.item
"""

# q_referential_integrity — fk orphan profile: counts per declared edge;
# an orphan is a NON-NULL key with no parent.
ORACLES["q_referential_integrity"] = """
SELECT 'lineitem->orders' AS relation,
       (SELECT count(*) FROM lineitem) AS n_rows,
       (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
         AS n_null_keys,
       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
       (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
       (SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
       (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer WHERE c_nationkey IS NULL),
       (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier->nation',
       (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier WHERE s_nationkey IS NULL),
       (SELECT count(*) FROM supplier s WHERE s.s_nationkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = s.s_nationkey))
"""

# q_benford_audit — first digit from exact integer cents (string head,
# never float log10 of the value); expected share and chi-square term as
# the identical scalar expressions.
ORACLES["q_benford_audit"] = """
WITH counts AS (
    SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*) AS n
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         AS observed_p,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected_p,
       round((CAST(n AS DOUBLE)
              - CAST(n_total AS DOUBLE)
                * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
             * (CAST(n AS DOUBLE)
                - CAST(n_total AS DOUBLE)
                  * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
             / (CAST(n_total AS DOUBLE)
                * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
         AS chi2_term
FROM counts CROSS JOIN tot
"""

# q_ab_test — parity-arm two-proportion z-test: exact user/converter
# counts, identical pooled-variance expression tree.
ORACLES["q_ab_test"] = """
WITH users AS (
    SELECT user_id, user_id % 2 AS arm,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS conv
    FROM events GROUP BY user_id),
arms AS (
    SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS x
    FROM users GROUP BY 1),
j AS (
    SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
    FROM (SELECT n, x FROM arms WHERE arm = 0) a,
         (SELECT n, x FROM arms WHERE arm = 1) b)
SELECT n_a, x_a, n_b, x_b,
       round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
       round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
       CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b
            THEN round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt((CAST(x_a + x_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 - CAST(x_a + x_b AS DOUBLE)
                                       / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 / CAST(n_a AS DOUBLE)
                                 + 1.0 / CAST(n_b AS DOUBLE))), 6)
            ELSE 0.0 END AS z_score
FROM j
"""

# q_skyline — count-equivalent INDEPENDENT formulation: NOT-EXISTS
# dominance over the part grain (the engine runs a distributed
# prefix-max; agreement verifies the logic, not the plan).
ORACLES["q_skyline"] = """
WITH parts AS MATERIALIZED (
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem GROUP BY 1)
SELECT p.l_partkey, p.qty_total, p.rev_cents
FROM parts p
WHERE NOT EXISTS (
    SELECT 1 FROM parts q
    WHERE q.qty_total >= p.qty_total AND q.rev_cents >= p.rev_cents
      AND (q.qty_total > p.qty_total OR q.rev_cents > p.rev_cents))
"""

# q_kcore — the SAME three peel rounds unrolled as materialized CTE
# stages (the pagerank unroll discipline), so every intermediate peel
# is verified, not just the final edge set.
ORACLES["q_kcore"] = """
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
e0 AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
d0 AS MATERIALIZED (
    SELECT node, count(*) AS deg
    FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
    GROUP BY 1),
e1 AS MATERIALIZED (
    SELECT a, b FROM e0
    WHERE a IN (SELECT node FROM d0 WHERE deg >= 3)
      AND b IN (SELECT node FROM d0 WHERE deg >= 3)),
d1 AS MATERIALIZED (
    SELECT node, count(*) AS deg
    FROM (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1)
    GROUP BY 1),
e2 AS MATERIALIZED (
    SELECT a, b FROM e1
    WHERE a IN (SELECT node FROM d1 WHERE deg >= 3)
      AND b IN (SELECT node FROM d1 WHERE deg >= 3)),
d2 AS MATERIALIZED (
    SELECT node, count(*) AS deg
    FROM (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
    GROUP BY 1),
e3 AS MATERIALIZED (
    SELECT a, b FROM e2
    WHERE a IN (SELECT node FROM d2 WHERE deg >= 3)
      AND b IN (SELECT node FROM d2 WHERE deg >= 3))
SELECT node AS user_id, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
GROUP BY 1
"""

# q_cusum_drift — mean-centered walk range: exact scaled-integer terms
# (n·x − Σx promoted to DECIMAL before the multiply), decimal prefix
# sums in the partitioned window, one final double division.
ORACLES["q_cusum_drift"] = """
WITH e AS (
    SELECT event_type, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events WHERE value IS NOT NULL),
stats AS (
    SELECT event_type, count(*) AS n, CAST(sum(vc) AS BIGINT) AS tot
    FROM e GROUP BY 1),
walked AS (
    SELECT e.event_type, n,
           sum(CAST(CAST(n AS DECIMAL(38,0)) * vc - tot
                    AS DECIMAL(38,0)))
             OVER (PARTITION BY e.event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS s
    FROM e JOIN stats USING (event_type))
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       round(CAST(greatest(max(s), 0) - least(min(s), 0) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * 100.0), 6) AS cusum_range
FROM walked GROUP BY 1
"""

# q_woe_iv — decile WOE/IV with Laplace-1 smoothing: identical
# thresholds (rounded exact percentiles), identical per-bin scalar
# expressions; emitted at the bin grain, so there is no float sum.
ORACLES["q_woe_iv"] = """
WITH e AS (
    SELECT value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
    FROM events WHERE value IS NOT NULL),
thr AS (
    SELECT list_transform(
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]),
             t -> round(t, 6)) AS th
    FROM e),
counts AS (
    SELECT CAST(len(list_filter(th, t -> t < value)) + 1 AS BIGINT)
             AS bin,
           CAST(sum(lab) AS BIGINT) AS n_pos,
           CAST(sum(1 - lab) AS BIGINT) AS n_neg
    FROM e CROSS JOIN thr GROUP BY 1),
tot AS (
    SELECT CAST(sum(n_pos) AS BIGINT) AS p,
           CAST(sum(n_neg) AS BIGINT) AS q
    FROM counts)
SELECT bin, n_pos, n_neg,
       round(ln((CAST(n_pos + 1 AS DOUBLE) / CAST(p + 10 AS DOUBLE))
                / (CAST(n_neg + 1 AS DOUBLE)
                   / CAST(q + 10 AS DOUBLE))), 6) AS woe,
       round(((CAST(n_pos + 1 AS DOUBLE) / CAST(p + 10 AS DOUBLE))
              - (CAST(n_neg + 1 AS DOUBLE) / CAST(q + 10 AS DOUBLE)))
             * ln((CAST(n_pos + 1 AS DOUBLE) / CAST(p + 10 AS DOUBLE))
                  / (CAST(n_neg + 1 AS DOUBLE)
                     / CAST(q + 10 AS DOUBLE))), 6) AS iv_term
FROM counts CROSS JOIN tot
"""

# q_window_funnel — the bounded min-ts chain, anchored at the earliest
# first step: every later stage within 2 h of t1.
ORACLES["q_window_funnel"] = """
WITH t1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.t
      AND e.ts <= t1.t + INTERVAL 7200 SECOND
    GROUP BY e.user_id),
t3 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN t2 ON e.user_id = t2.user_id
    JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.t
      AND e.ts <= t1.t + INTERVAL 7200 SECOND
    GROUP BY e.user_id)
SELECT e.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage,
       count(*) AS n_events
FROM events e
LEFT JOIN t1 ON e.user_id = t1.user_id
LEFT JOIN t2 ON e.user_id = t2.user_id
LEFT JOIN t3 ON e.user_id = t3.user_id
GROUP BY 1, 2
"""

# q_readability — LIX: in-row integer counts + two divisions; the
# sentence count needs the 'g' flag (DuckDB regexp_replace replaces the
# FIRST match by default, Spark replaces all).
ORACLES["q_readability"] = """
WITH base AS (
    SELECT doc_id, text,
           list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g'))
            AS BIGINT) AS n_sentences,
       CAST(len(list_filter(toks, t -> length(t) > 6)) AS BIGINT)
         AS n_long_words,
       round(CAST(len(toks) AS DOUBLE)
             / CAST(greatest(length(text)
                             - length(regexp_replace(text, '[.!?]', '',
                                                     'g')), 1) AS DOUBLE)
             + 100.0 * CAST(len(list_filter(toks, t -> length(t) > 6))
                            AS DOUBLE)
               / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS lix
FROM base
"""


# q_langid_confusion — the language_id hit/argmax block grouped against
# the declared lang; recall share per declared language.
ORACLES["q_langid_confusion"] = f"""
WITH base AS (
    SELECT lang, list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents),
hits AS (
    SELECT lang,
           CAST(len(list_filter(toks, t -> t IN {_EN})) AS BIGINT) AS en_hits,
           CAST(len(list_filter(toks, t -> t IN {_FR})) AS BIGINT) AS fr_hits,
           CAST(len(list_filter(toks, t -> t IN {_DE})) AS BIGINT) AS de_hits,
           CAST(len(list_filter(toks, t -> t IN {_ES})) AS BIGINT) AS es_hits
    FROM base),
pred AS (
    SELECT lang,
           CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
                WHEN fr_hits >= de_hits AND fr_hits >= es_hits THEN 'fr'
                WHEN de_hits >= es_hits THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM hits),
cells AS (
    SELECT lang, predicted_lang, count(*) AS n FROM pred GROUP BY 1, 2),
marg AS (
    SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM cells GROUP BY 1)
SELECT c.lang, c.predicted_lang, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / CAST(m.tot AS DOUBLE), 6) AS share
FROM cells c JOIN marg m ON c.lang = m.lang
"""

# q_theta_overlap — bottom-32 neutral-hash SET sketches per event_type
# and the theta-join intersection estimator: the identical wang chain
# (HLL/quantile-sketch twin) on user_id, integer hash comparisons, and
# the same rounded-double estimate compositions.
ORACLES["q_theta_overlap"] = """
WITH aud AS (SELECT DISTINCT event_type, user_id FROM events),
h0 AS (
    SELECT event_type, user_id,
           ((user_id % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM aud),
h1 AS (
    SELECT event_type, user_id,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h0),
h2 AS (
    SELECT event_type, user_id,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM h1),
h AS (
    SELECT event_type, user_id, xor(hv, hv >> 16) AS hv
    FROM h2),
state AS MATERIALIZED (
    SELECT event_type, user_id, hv FROM (
        SELECT event_type, user_id, hv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hv, user_id) AS rn
        FROM h)
    WHERE rn <= 32),
summ AS MATERIALIZED (
    SELECT event_type, count(*) AS n, max(hv) AS mx,
           CASE WHEN count(*) >= 32 THEN max(hv)
                ELSE 4294967296 END AS cut,
           CASE WHEN count(*) >= 32
                THEN round(31.0 * 4294967296.0
                           / CAST(max(hv) AS DOUBLE), 6)
                ELSE CAST(count(*) AS DOUBLE) END AS est
    FROM state GROUP BY 1),
pairs AS MATERIALIZED (
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           least(a.cut, b.cut) AS cut, a.est AS est_a, b.est AS est_b
    FROM summ a JOIN summ b ON a.event_type < b.event_type),
m AS (
    SELECT sa.event_type AS item_a, sb.event_type AS item_b,
           count(*) AS m_sample
    FROM state sa
    JOIN state sb ON sa.user_id = sb.user_id
                 AND sa.event_type < sb.event_type
    JOIN pairs p ON p.item_a = sa.event_type
                AND p.item_b = sb.event_type
    WHERE sa.hv <= p.cut
    GROUP BY 1, 2),
est0 AS (
    SELECT p.item_a, p.item_b,
           CAST(coalesce(m.m_sample, 0) AS BIGINT) AS m_sample,
           p.est_a, p.est_b,
           round(CAST(coalesce(m.m_sample, 0) AS DOUBLE)
                 * 4294967296.0 / CAST(p.cut AS DOUBLE), 6) AS est_inter
    FROM pairs p LEFT JOIN m ON p.item_a = m.item_a
                            AND p.item_b = m.item_b)
SELECT item_a, item_b, m_sample, est_a, est_b, est_inter,
       CASE WHEN est_a + est_b - est_inter > 0
            THEN round(est_inter / (est_a + est_b - est_inter), 6)
            ELSE 0.0 END AS est_jaccard
FROM est0
"""

# q_k_anonymity — equivalence-class sizes and sensitive-value diversity
# over the quasi-identifier grain; floor() on a positive/negative
# balance is identical in both engines (arithmetic floor, not trunc).
ORACLES["q_k_anonymity"] = """
SELECT c_nationkey, c_mktsegment,
       count(*) AS class_size,
       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
         AS l_distinct,
       count(*) < 5 AS at_risk
FROM customer
GROUP BY 1, 2
"""

# q_wasserstein_drift — right-endpoint anchoring (lead), vs the
# engine's left-endpoint (lag + bucket-boundary fix): algebraically the
# same telescoped integral, so agreement verifies the logic.
ORACLES["q_wasserstein_drift"] = """
WITH e AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
    FROM events
    WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL),
per AS (
    SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
           CAST(sum(1 - is_a) AS BIGINT) AS cb
    FROM e GROUP BY 1),
cum AS (
    SELECT v,
           CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
           CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
           lead(v) OVER (ORDER BY v) AS next_v
    FROM per),
tot AS (
    SELECT CAST(sum(is_a) AS BIGINT) AS na,
           CAST(sum(1 - is_a) AS BIGINT) AS nb
    FROM e),
s AS (
    SELECT coalesce(sum(abs(CAST(cum_ca AS DECIMAL(38,0)) * nb
                            - CAST(cum_cb AS DECIMAL(38,0)) * na)
                        * (next_v - v)), 0) AS sv
    FROM cum CROSS JOIN tot
    WHERE next_v IS NOT NULL)
SELECT na, nb,
       CASE WHEN na > 0 AND nb > 0
            THEN round(CAST(sv AS DOUBLE)
                       / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                          * 100.0), 6)
            ELSE 0.0 END AS w1
FROM tot CROSS JOIN s
"""

# q_seasonal_anomalies — (dow × hour) baseline means from exact cents,
# per-row residuals, ORDER BY rounded |residual| + event_id LIMIT 20.
# DuckDB dayofweek() numbers Sunday 0 where Spark's dayofweek() is
# Sunday 1 — a bijective relabeling, so the GROUPS are identical.
ORACLES["q_seasonal_anomalies"] = """
WITH e AS (
    SELECT event_id, event_type, value, ts,
           CAST(round(value * 100) AS BIGINT) AS vc,
           dayofweek(ts) AS dow, hour(ts) AS hr
    FROM events WHERE value IS NOT NULL),
base AS (
    SELECT dow, hr, CAST(sum(vc) AS BIGINT) AS tot, count(*) AS n
    FROM e GROUP BY 1, 2)
SELECT event_id, event_type, round(value, 6) AS value,
       round(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
         AS baseline_mean,
       round(value - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
         AS residual
FROM e JOIN base USING (dow, hr)
ORDER BY abs(round(value - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)
                   / 100.0, 6)) DESC, event_id ASC
LIMIT 20
"""

# q_dup_size_histogram — the recursive-CTE component fixpoint (the
# q_dup_components oracle) collapsed to the size distribution.
ORACLES["q_dup_size_histogram"] = """
WITH RECURSIVE raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs),
walk(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
comp AS (
    SELECT node AS doc_id, min(reach) AS component
    FROM walk GROUP BY node),
csize AS (
    SELECT component, count(*) AS size FROM comp GROUP BY 1)
SELECT CAST(size AS BIGINT) AS size,
       count(*) AS n_components,
       CAST(count(*) * size AS BIGINT) AS n_docs
FROM csize GROUP BY size
"""

# q_cuped — exact HUGEINT user-grain moments (the metric_correlations
# twin discipline), identical final expression tree; epoch-midpoint
# cutoff with floor semantics on both engines.
ORACLES["q_cuped"] = """
WITH e AS (
    SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc,
           CAST(floor(epoch(ts)) AS BIGINT) AS ep
    FROM events WHERE value IS NOT NULL),
b AS (
    SELECT CAST(floor((min(ep) + max(ep)) / 2.0) AS BIGINT) AS cut
    FROM e),
users AS (
    SELECT user_id,
           CAST(sum(CASE WHEN ep < cut THEN vc ELSE 0 END) AS BIGINT)
             AS x,
           CAST(sum(CASE WHEN ep >= cut THEN vc ELSE 0 END) AS BIGINT)
             AS y,
           user_id % 2 AS arm
    FROM e CROSS JOIN b GROUP BY user_id),
m AS (
    SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           CAST(sum(CASE WHEN arm = 1 THEN 0 ELSE 1 END) AS HUGEINT)
             AS na,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
             AS nb,
           CAST(sum(CASE WHEN arm = 1 THEN 0 ELSE x END) AS HUGEINT)
             AS sxa,
           CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS HUGEINT)
             AS sxb,
           CAST(sum(CASE WHEN arm = 1 THEN 0 ELSE y END) AS HUGEINT)
             AS sya,
           CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS HUGEINT)
             AS syb
    FROM users),
f AS (
    SELECT *,
           CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n,
           CAST(n * sxx - sx * sx AS DOUBLE) AS varx_n,
           CAST(n * syy - sy * sy AS DOUBLE) AS vary_n
    FROM m),
g AS (
    SELECT *,
           CASE WHEN varx_n > 0 THEN cov_n / varx_n ELSE 0.0 END
             AS theta,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_x
    FROM f)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 6)
         AS mean_y_a,
       round(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 6)
         AS mean_y_b,
       round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
             - theta * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0
                        - mean_x), 6) AS adj_mean_a,
       round(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0
             - theta * (CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0
                        - mean_x), 6) AS adj_mean_b,
       round(theta, 6) AS theta,
       CASE WHEN varx_n > 0 AND vary_n > 0
            THEN round((cov_n * cov_n) / (varx_n * vary_n), 6)
            ELSE 0.0 END AS var_reduction
FROM g
"""

# q_skew_advisor — per-candidate group-size stats; quantile_cont is the
# established F.percentile twin.
ORACLES["q_skew_advisor"] = """
WITH su AS (
    SELECT count(*) AS n FROM events GROUP BY user_id),
se AS (
    SELECT count(*) AS n FROM events GROUP BY event_type),
a AS (
    SELECT 'user_id' AS key, count(*) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_size,
           round(quantile_cont(n, 0.5), 6) AS p50_size,
           round(quantile_cont(n, 0.99), 6) AS p99_size
    FROM su),
b AS (
    SELECT 'event_type' AS key, count(*) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_size,
           round(quantile_cont(n, 0.5), 6) AS p50_size,
           round(quantile_cont(n, 0.99), 6) AS p99_size
    FROM se),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT key, n_groups, n_rows, max_size,
       round(CAST(max_size AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS max_share,
       p50_size, p99_size,
       round(p99_size / p50_size, 6) AS skew_ratio
FROM u
"""

# q_dedup_canonical — survivor selection on the component fixpoint:
# max length, ties to min doc_id (integer-only rule, both steps spelled
# identically).
ORACLES["q_dedup_canonical"] = """
WITH RECURSIVE raw AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents),
tok AS (SELECT DISTINCT doc_id, source, token FROM raw WHERE token <> ''),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM tok a JOIN tok b
      ON a.source = b.source AND a.token = b.token AND a.doc_id <> b.doc_id
    WHERE a.doc_id % 50 = 0
    GROUP BY 1, 2),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_inter / (sa.n_tok + sb.n_tok - n_inter), 6) >= 0.5),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs),
walk(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
comp AS (
    SELECT node AS doc_id, min(reach) AS component
    FROM walk GROUP BY node),
members AS (
    SELECT c.component, c.doc_id, CAST(d.n_chars AS BIGINT) AS nc
    FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
stats AS (
    SELECT component, count(*) AS n_members,
           CAST(max(nc) AS BIGINT) AS survivor_chars
    FROM members GROUP BY 1),
surv AS (
    SELECT m.component, min(m.doc_id) AS survivor_id
    FROM members m JOIN stats s ON m.component = s.component
    WHERE m.nc = s.survivor_chars
    GROUP BY 1)
SELECT st.component, st.n_members, sv.survivor_id, st.survivor_chars
FROM stats st JOIN surv sv ON st.component = sv.component
"""

# q_contrastive_pairs — blocked-cosine positives (deterministic argmax)
# + wang-mixed negatives (the established chain on seed = anchor·2+i);
# the seeds CTE qualifies b.partner_id explicitly so DuckDB's lateral
# column aliasing cannot bind 'pos' to a newly computed alias.
ORACLES["q_contrastive_pairs"] = """
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
p AS (
    SELECT * FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.emb, b.emb)
                     / (sqrt(list_dot_product(a.emb, a.emb))
                        * sqrt(list_dot_product(b.emb, b.emb))), 6)
                   AS cosine
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
    WHERE cosine >= 0.25),
sym AS (
    SELECT id_a AS anchor_id, id_b AS partner_id, cosine FROM p
    UNION ALL
    SELECT id_b, id_a, cosine FROM p),
best AS MATERIALIZED (
    SELECT anchor_id, partner_id, cosine FROM (
        SELECT anchor_id, partner_id, cosine,
               row_number() OVER (PARTITION BY anchor_id
                                  ORDER BY cosine DESC, partner_id ASC)
                 AS rn
        FROM sym)
    WHERE rn = 1),
n AS (SELECT CAST(max(vec_id) + 1 AS BIGINT) AS nn FROM embeddings),
seeds AS (
    SELECT b.anchor_id, b.partner_id AS pos, nn,
           b.anchor_id * 2 + i.i AS seed
    FROM best b CROSS JOIN n
    CROSS JOIN (SELECT unnest([0, 1]) AS i) i),
w0 AS (
    SELECT anchor_id, pos, nn,
           ((seed % 2147483648) * 2654435761) % 4294967296 AS hv
    FROM seeds),
w1 AS (
    SELECT anchor_id, pos, nn,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM w0),
w2 AS (
    SELECT anchor_id, pos, nn,
           (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
    FROM w1),
negs AS (
    SELECT anchor_id, xor(hv, hv >> 16) % nn AS partner_id,
           'neg' AS role, CAST(NULL AS DOUBLE) AS cosine, pos
    FROM w2)
SELECT anchor_id, partner_id, 'pos' AS role, cosine FROM best
UNION ALL
SELECT anchor_id, partner_id, role, cosine
FROM negs
WHERE partner_id <> anchor_id AND partner_id <> pos
"""

# q_forecast_backtest — epoch-midpoint temporal split, (type × hour)
# train means as exact long/long divisions, per-event errors
# FLOOR-quantized to micro-units (floor, never round: signed errors hit
# dyadic halves where the engines' round modes diverge).
ORACLES["q_forecast_backtest"] = """
WITH e AS (
    SELECT event_type, value,
           CAST(round(value * 100) AS BIGINT) AS vc,
           CAST(floor(epoch(ts)) AS BIGINT) AS ep,
           hour(ts) AS hr
    FROM events WHERE value IS NOT NULL),
b AS (
    SELECT CAST(floor((min(ep) + max(ep)) / 2.0) AS BIGINT) AS cut
    FROM e),
train AS (
    SELECT event_type, hr, CAST(sum(vc) AS BIGINT) AS tot,
           count(*) AS n
    FROM e CROSS JOIN b WHERE ep < cut GROUP BY 1, 2),
scored AS (
    SELECT e.event_type,
           CAST(floor(abs(e.value - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)
                          / 100.0) * 1000000) AS BIGINT) AS ae_u,
           CAST(floor((e.value - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)
                       / 100.0) * 1000000) AS BIGINT) AS e_u
    FROM e CROSS JOIN b
    JOIN train t ON e.event_type = t.event_type AND e.hr = t.hr
    WHERE e.ep >= b.cut)
SELECT event_type, count(*) AS n_scored,
       round(CAST(sum(ae_u) AS BIGINT) / count(*) / 1000000.0, 6) AS mae,
       round(CAST(sum(e_u) AS BIGINT) / count(*) / 1000000.0, 6) AS bias
FROM scored GROUP BY 1
"""

# q_kaplan_meier — product-limit survival via cumulative log factors:
# integer-second durations, window prefix sums on the distinct-duration
# grain, ln factors rounded at 9 pre-sum, the -1e9 everyone-dies
# sentinel underflowing exp to exactly 0.0.
ORACLES["q_kaplan_meier"] = """
WITH t1 AS (
    SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS t0
    FROM events WHERE event_type = 'view' GROUP BY user_id),
ev AS (
    SELECT e.user_id,
           CAST(floor(epoch(min(e.ts))) AS BIGINT) AS et
    FROM events e JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'purchase'
      AND CAST(floor(epoch(e.ts)) AS BIGINT) > t1.t0
    GROUP BY e.user_id),
fin AS (
    SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS endep FROM events),
u AS (
    SELECT coalesce(ev.et - t1.t0, endep - t1.t0) AS d,
           CASE WHEN ev.et IS NOT NULL THEN 1 ELSE 0 END AS f
    FROM t1 LEFT JOIN ev ON t1.user_id = ev.user_id CROSS JOIN fin),
nn AS (SELECT count(*) AS n FROM u),
per AS (
    SELECT d, CAST(sum(f) AS BIGINT) AS n_event, count(*) AS n_rem
    FROM u GROUP BY 1),
cum AS (
    SELECT d, n_event, n_rem,
           sum(n_rem) OVER (ORDER BY d) AS cr
    FROM per),
rk AS (
    SELECT d, n_event, CAST(n - (cr - n_rem) AS BIGINT) AS n_risk
    FROM cum CROSS JOIN nn),
fac AS (
    SELECT d, n_event, n_risk,
           CASE WHEN n_event = 0 THEN 0.0
                WHEN n_event < n_risk
                THEN round(ln(1.0 - CAST(n_event AS DOUBLE)
                                    / CAST(n_risk AS DOUBLE)), 9)
                ELSE -1000000000.0 END AS lf
    FROM rk),
sv AS (
    SELECT d, n_event, n_risk,
           sum(lf) OVER (ORDER BY d) AS cl
    FROM fac)
SELECT d AS duration, n_risk, n_event, round(exp(cl), 6) AS surv
FROM sv WHERE n_event > 0
"""

# q_rfm_segments — user-grain RFM, exact quintile thresholds
# (quantile_cont ≡ F.percentile), reversed recency score, 3-digit code.
ORACLES["q_rfm_segments"] = """
WITH e AS (
    SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc,
           CAST(floor(epoch(ts)) AS BIGINT) AS ep
    FROM events WHERE value IS NOT NULL),
fin AS (SELECT max(ep) AS endep FROM e),
users AS (
    SELECT user_id,
           CAST(floor((endep - max(ep)) / 86400.0) AS BIGINT) AS rec,
           count(*) AS freq,
           CAST(sum(vc) AS BIGINT) AS mon
    FROM e CROSS JOIN fin GROUP BY user_id, endep),
thr AS (
    SELECT list_transform(quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]),
                          t -> round(t, 6)) AS tr,
           list_transform(quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]),
                          t -> round(t, 6)) AS tf,
           list_transform(quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]),
                          t -> round(t, 6)) AS tm
    FROM users),
scored AS (
    SELECT CAST(6 - (len(list_filter(tr, t -> t < rec)) + 1) AS BIGINT)
             AS r_score,
           CAST(len(list_filter(tf, t -> t < freq)) + 1 AS BIGINT)
             AS f_score,
           CAST(len(list_filter(tm, t -> t < mon)) + 1 AS BIGINT)
             AS m_score
    FROM users CROSS JOIN thr)
SELECT r_score, f_score, m_score, count(*) AS n_users,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
FROM scored GROUP BY 1, 2, 3
"""

# q_join_size_est — both signed AGMS sketches reproduced via the wang
# chain on (key + i·1000003); bucket = hv mod 2048, sign = bit 11;
# integer inner products, median over the 3 rows as sum − min − max,
# clamped at 0; exact join count alongside.
ORACLES["q_join_size_est"] = """
WITH offs AS (SELECT unnest([0, 1, 2]) AS i),
sa AS (
    SELECT i, o_orderkey + i * 1000003 AS seed
    FROM orders CROSS JOIN offs),
a0 AS (SELECT i, ((seed % 2147483648) * 2654435761) % 4294967296 AS hv
       FROM sa),
a1 AS (SELECT i, (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
       FROM a0),
a2 AS (SELECT i, (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
       FROM a1),
af AS (SELECT i, xor(hv, hv >> 16) AS hv FROM a2),
sksa AS MATERIALIZED (
    SELECT i AS row, hv % 2048 AS bucket,
           CAST(sum(1 - 2 * ((hv >> 11) & 1)) AS BIGINT) AS ca
    FROM af GROUP BY 1, 2),
sb AS (
    SELECT i, l_orderkey + i * 1000003 AS seed
    FROM lineitem CROSS JOIN offs),
b0 AS (SELECT i, ((seed % 2147483648) * 2654435761) % 4294967296 AS hv
       FROM sb),
b1 AS (SELECT i, (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
       FROM b0),
b2 AS (SELECT i, (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv
       FROM b1),
bf AS (SELECT i, xor(hv, hv >> 16) AS hv FROM b2),
sksb AS MATERIALIZED (
    SELECT i AS row, hv % 2048 AS bucket,
           CAST(sum(1 - 2 * ((hv >> 11) & 1)) AS BIGINT) AS cb
    FROM bf GROUP BY 1, 2),
per_row AS (
    SELECT a.row,
           CAST(sum(CAST(a.ca AS HUGEINT) * b.cb) AS HUGEINT) AS s
    FROM sksa a JOIN sksb b ON a.row = b.row AND a.bucket = b.bucket
    GROUP BY 1),
est AS (
    SELECT CAST(greatest(sum(s) - min(s) - max(s), 0) AS BIGINT)
             AS est_join_size
    FROM per_row),
ex AS (
    SELECT count(*) AS exact_join_size
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
SELECT est_join_size, exact_join_size,
       round(CAST(est_join_size AS DOUBLE)
             / CAST(exact_join_size AS DOUBLE), 6) AS est_over_exact
FROM est CROSS JOIN ex
"""


# --- q_markov_attribution: generated unrolled absorption solve ---------------
# Transitions mirror the engine's journey build (truncate at the FIRST
# purchase by (ts, event_id), lag → src with a START default); the 5
# scenarios (base + one removal per channel) each unroll the SAME fixed
# 12-iteration recursion as 1-row CTE stages whose expression order
# matches the driver-side Python accumulation term by term (the
# pca_power / pagerank discipline), so every double is bit-identical.
_MK_CH = ["view", "click", "signup", "error"]
_MK_IT = 12


def _mk_matrix_cols():
    cols = []
    for s in ["START", *_MK_CH]:
        tot = (f"sum(CASE WHEN src = '{s}' THEN n ELSE 0 END)")
        for t in [*_MK_CH, "CONV"]:
            num = (f"sum(CASE WHEN src = '{s}' AND dst = '{t}' "
                   f"THEN n ELSE 0 END)")
            cols.append(
                f"CASE WHEN {tot} = 0 THEN 0.0 ELSE CAST({num} AS DOUBLE)"
                f" / CAST({tot} AS DOUBLE) END AS p_{s}_{t}")
    return ",\n           ".join(cols)


def _mk_scenario(tag, removed):
    stages = [f"i{tag}_0 AS (SELECT "
              + ", ".join(f"0.0 AS v_{c}" for c in _MK_CH) + ")"]
    for k in range(1, _MK_IT + 1):
        exprs = []
        for t in _MK_CH:
            if t == removed:
                exprs.append(f"0.0 AS v_{t}")
            else:
                e = f"p_{t}_CONV"
                for u in _MK_CH:
                    e += f" + p_{t}_{u} * v_{u}"
                exprs.append(f"{e} AS v_{t}")
        stages.append(
            f"i{tag}_{k} AS (SELECT " + ", ".join(exprs)
            + f" FROM i{tag}_{k - 1} CROSS JOIN m)")
    final = "p_START_CONV"
    for u in _MK_CH:
        final += f" + p_START_{u} * v_{u}"
    stages.append(f"f{tag} AS (SELECT {final} AS p"
                  f" FROM i{tag}_{_MK_IT} CROSS JOIN m)")
    return ",\n".join(stages)


def _mk_oracle():
    scen = [_mk_scenario("b", None)]
    for c in _MK_CH:
        scen.append(_mk_scenario(c, c))
    re_exprs = [
        f"CASE WHEN pb > 0 THEN 1.0 - p_{c} / pb ELSE 0.0 END AS re_{c}"
        for c in _MK_CH]
    tot = " + ".join(f"re_{c}" for c in _MK_CH)
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, round(pb, 6) AS p_conv_base, "
        f"round(re_{c}, 6) AS removal_effect, "
        f"CASE WHEN tot_re > 0 THEN round(re_{c} / tot_re, 6) "
        f"ELSE 0.0 END AS attribution FROM res"
        for c in _MK_CH)
    return f"""
WITH conv AS (
    SELECT user_id, min(ts) AS cts FROM events
    WHERE event_type = 'purchase' GROUP BY user_id),
convk AS (
    SELECT e.user_id, c.cts, min(e.event_id) AS cid
    FROM events e JOIN conv c
      ON e.user_id = c.user_id AND e.ts = c.cts
    WHERE e.event_type = 'purchase' GROUP BY e.user_id, c.cts),
j AS (
    SELECT e.user_id, e.ts, e.event_id,
           CASE WHEN e.event_type = 'purchase' THEN 'CONV'
                ELSE e.event_type END AS st
    FROM events e LEFT JOIN convk k ON e.user_id = k.user_id
    WHERE k.user_id IS NULL OR e.ts < k.cts
       OR (e.ts = k.cts AND e.event_id <= k.cid)),
tr AS (
    SELECT coalesce(lag(st) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
                    'START') AS src,
           st AS dst
    FROM j),
counts AS MATERIALIZED (
    SELECT src, dst, count(*) AS n FROM tr GROUP BY 1, 2),
m AS MATERIALIZED (
    SELECT {_mk_matrix_cols()}
    FROM counts),
{",".join(scen)},
res AS (
    SELECT pb, {", ".join(f"re_{c}" for c in _MK_CH)},
           {tot} AS tot_re
    FROM (SELECT fb.p AS pb,
                 {", ".join(f"f{c}.p AS p_raw_{c}" for c in _MK_CH)},
                 {", ".join(f"CASE WHEN fb.p > 0 THEN 1.0 - f{c}.p / fb.p ELSE 0.0 END AS re_{c}"
                            for c in _MK_CH)},
                 {", ".join(f"f{c}.p AS p_{c}" for c in _MK_CH)}
          FROM fb {" ".join(f"CROSS JOIN f{c}" for c in _MK_CH)}))
{rows}
"""


ORACLES["q_markov_attribution"] = _mk_oracle()

# q_vocab_kl — per-source KL vs the corpus unigram mix; terms rounded
# at 9 pre-sum.
ORACLES["q_vocab_kl"] = """
WITH st AS MATERIALIZED (
    SELECT source, token, count(*) AS n_st FROM (
        SELECT source,
               unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                 AS token
        FROM documents)
    GROUP BY 1, 2),
src_tot AS (
    SELECT source, CAST(sum(n_st) AS BIGINT) AS ns FROM st GROUP BY 1),
corp AS (
    SELECT token, CAST(sum(n_st) AS BIGINT) AS nt FROM st GROUP BY 1),
tot AS (SELECT CAST(sum(n_st) AS BIGINT) AS n FROM st),
terms AS (
    SELECT st.source, ns,
           round((CAST(n_st AS DOUBLE) / CAST(ns AS DOUBLE))
                 * ln((CAST(n_st AS DOUBLE) / CAST(ns AS DOUBLE))
                      / (CAST(nt AS DOUBLE) / CAST(n AS DOUBLE))), 9)
             AS t
    FROM st JOIN src_tot USING (source) JOIN corp USING (token)
    CROSS JOIN tot)
SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
       round(sum(t), 6) AS kl
FROM terms GROUP BY 1
"""

# q_burst_detection — trailing 1h RANGE window on epoch seconds.
ORACLES["q_burst_detection"] = """
WITH e AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
b AS (
    SELECT user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ep
                          RANGE BETWEEN 3600 PRECEDING
                                    AND CURRENT ROW) AS burst
    FROM e)
SELECT user_id, count(*) AS n_events,
       CAST(max(burst) AS BIGINT) AS max_burst_1h
FROM b GROUP BY 1
"""

# q_lead_lag — dense hour grid (generate_series ≡ F.sequence inclusive),
# per-lag HUGEINT moment aggregates, one identical r expression.
ORACLES["q_lead_lag"] = """
WITH hours AS MATERIALIZED (
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2),
span AS (
    SELECT CAST(floor(epoch(date_trunc('hour', min(ts)))) AS BIGINT)
             AS lo,
           CAST(floor(epoch(date_trunc('hour', max(ts)))) AS BIGINT)
             AS hi
    FROM events),
grid AS MATERIALIZED (
    SELECT unnest(generate_series(lo, hi, 3600)) AS h FROM span),
a AS MATERIALIZED (
    SELECT g.h, CAST(coalesce(x.n, 0) AS BIGINT) AS c
    FROM grid g LEFT JOIN (SELECT h, n FROM hours
                           WHERE event_type = 'view') x ON g.h = x.h),
b AS MATERIALIZED (
    SELECT g.h, CAST(coalesce(x.n, 0) AS BIGINT) AS c
    FROM grid g LEFT JOIN (SELECT h, n FROM hours
                           WHERE event_type = 'purchase') x
      ON g.h = x.h),
lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS k),
m AS (
    SELECT k, CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(a.c) AS HUGEINT) AS sx,
           CAST(sum(b.c) AS HUGEINT) AS sy,
           CAST(sum(CAST(a.c AS HUGEINT) * a.c) AS HUGEINT) AS sxx,
           CAST(sum(CAST(b.c AS HUGEINT) * b.c) AS HUGEINT) AS syy,
           CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS sxy
    FROM lags JOIN a ON true JOIN b ON b.h - k * 3600 = a.h
    GROUP BY 1)
SELECT CAST(k AS BIGINT) AS lag_hours, CAST(n AS BIGINT) AS n_hours,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS r
FROM m
"""

# q_stratified_rates — direct standardization over nations present in
# both parity arms; weighted-rate terms rounded at 9 pre-sum.
ORACLES["q_stratified_rates"] = """
WITH conv AS (
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'),
u AS (
    SELECT c.c_nationkey AS s, c.c_custkey % 2 AS arm,
           CASE WHEN v.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS x
    FROM customer c LEFT JOIN conv v ON c.c_custkey = v.c_custkey),
cells AS (
    SELECT s, arm, count(*) AS n, CAST(sum(x) AS BIGINT) AS cx
    FROM u GROUP BY 1, 2),
wide AS (
    SELECT s, CAST(sum(n) AS BIGINT) AS ns, count(*) AS arms,
           CAST(sum(CASE WHEN arm = 0 THEN cx END) AS BIGINT) AS xa,
           CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS na,
           CAST(sum(CASE WHEN arm = 1 THEN cx END) AS BIGINT) AS xb,
           CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS nb
    FROM cells GROUP BY 1
    HAVING count(*) = 2),
tot AS (SELECT CAST(sum(ns) AS BIGINT) AS nn FROM wide),
terms AS (
    SELECT na, xa, nb, xb,
           round((CAST(ns AS DOUBLE) / CAST(nn AS DOUBLE))
                 * (CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)), 9) AS ta,
           round((CAST(ns AS DOUBLE) / CAST(nn AS DOUBLE))
                 * (CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE)), 9) AS tb
    FROM wide CROSS JOIN tot)
SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(xa) AS BIGINT) AS x_a,
       CAST(sum(nb) AS BIGINT) AS n_b, CAST(sum(xb) AS BIGINT) AS x_b,
       round(CAST(sum(xa) AS BIGINT) / CAST(sum(na) AS DOUBLE), 6)
         AS raw_rate_a,
       round(CAST(sum(xb) AS BIGINT) / CAST(sum(nb) AS DOUBLE), 6)
         AS raw_rate_b,
       round(sum(ta), 6) AS adj_rate_a,
       round(sum(tb), 6) AS adj_rate_b
FROM terms
"""

# q_degree_distribution — degree histogram + CSN discrete-MLE alpha
# over degrees >= 2; ln terms rounded at 9 pre-sum.
ORACLES["q_degree_distribution"] = """
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
und AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
deg AS MATERIALIZED (
    SELECT node, count(*) AS deg
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
    GROUP BY 1),
hist AS (SELECT deg, count(*) AS n_nodes FROM deg GROUP BY 1),
alpha AS (
    SELECT round(1.0 + CAST(count(*) AS DOUBLE)
                 / sum(round(ln(CAST(deg AS DOUBLE) / 1.5), 9)), 6)
             AS alpha_hat
    FROM deg WHERE deg >= 2)
SELECT CAST(h.deg AS BIGINT) AS deg, h.n_nodes, a.alpha_hat
FROM hist h CROSS JOIN alpha a
"""

# q_label_propagation — 3 synchronous LPA rounds unrolled as CTE stages;
# election is (count DESC, label ASC), identical to the engine's
# max(struct(c, -label)) aggregate.  Stages materialize because each is
# referenced by the next round's join (DuckDB re-inlines multi-use CTEs).
_LPA_ROUND = """\
c{k} AS (
    SELECT n.node, l.label, count(*) AS c
    FROM nbr n JOIN l{p} l ON n.nb = l.node
    GROUP BY 1, 2),
l{k} AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c{k})
    WHERE rn = 1)"""

ORACLES["q_label_propagation"] = ("""
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 2 AS i FROM events
    WHERE event_type = 'purchase'),
und AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
nbr AS MATERIALIZED (
    SELECT a AS node, b AS nb FROM und
    UNION ALL SELECT b, a FROM und),
l0 AS (SELECT DISTINCT node, node AS label FROM nbr),
""" + ",\n".join(_LPA_ROUND.format(k=k, p=k - 1) for k in range(1, 4)) + """
SELECT label AS community, count(*) AS n_members
FROM l3 GROUP BY 1
""")

# q_bfs_hops — 3 min-relax rounds unrolled; hops are exact integers.
_BFS_ROUND = """\
d{k} AS MATERIALIZED (
    SELECT node, min(hops) AS hops FROM (
        SELECT node, hops FROM d{p}
        UNION ALL
        SELECT n.nb AS node, d.hops + 1 AS hops
        FROM nbr n JOIN d{p} d ON n.node = d.node)
    GROUP BY 1)"""

ORACLES["q_bfs_hops"] = ("""
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
und AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
nbr AS MATERIALIZED (
    SELECT a AS node, b AS nb FROM und
    UNION ALL SELECT b, a FROM und),
d0 AS (
    SELECT DISTINCT user_id AS node, 0 AS hops FROM events
    WHERE user_id % 10 = 0),
""" + ",\n".join(_BFS_ROUND.format(k=k, p=k - 1) for k in range(1, 4)) + """
SELECT node AS user_id, CAST(hops AS BIGINT) AS hops FROM d3
""")

# q_tfidf_topk — sklearn-smoothed idf; the election orders on the
# ROUND-9 score (libm ln is 1-ulp, not correctly rounded — raw-product
# ordering of near-ties is not a cross-engine guarantee), term ASC on
# rounded ties; the output score double-rounds 9→6 like the engine.
ORACLES["q_tfidf_topk"] = """
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           round(CAST(tf.tf AS DOUBLE)
                 * (ln((1.0 + CAST(n.n_docs AS DOUBLE))
                       / (1.0 + CAST(d.df AS DOUBLE))) + 1.0), 9) AS s
    FROM tf JOIN dfreq d USING (term) CROSS JOIN n),
ranked AS (
    SELECT doc_id, term, tf, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, term ASC) AS rnk
    FROM scored)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf,
       round(s, 6) AS score
FROM ranked WHERE rnk <= 3
"""

# q_fd_profile — g3-style approximate-FD violation report; one grouped
# subquery per candidate, unioned.  Counts cast to BIGINT for parity.
_FD_CAND = """\
SELECT '{name}' AS fd,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round(CAST(sum(CASE WHEN nd > 1 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE), 6) AS violation_row_share
FROM (SELECT {det}, count(*) AS n, count(DISTINCT {dep}) AS nd
      FROM {tbl} GROUP BY {det})"""

ORACLES["q_fd_profile"] = "\nUNION ALL\n".join(
    _FD_CAND.format(name=n, det=det, dep=dep, tbl=tbl)
    for n, tbl, det, dep in [
        ("events: user_id -> event_type", "events", "user_id",
         "event_type"),
        ("events: event_id -> event_type", "events", "event_id",
         "event_type"),
        ("documents: source -> lang", "documents", "source", "lang"),
        ("documents: lang -> source", "documents", "lang", "source"),
    ])

# q_poisson_bootstrap — hash-deterministic Poisson(1) weights via the
# wang chain on (key·32 + rep); CDF thresholds are the exact double
# literals the engine lit()s (pipeline/sampling.py:POISSON1_CDF).
ORACLES["q_poisson_bootstrap"] = """
WITH reps AS (SELECT CAST(range AS BIGINT) AS rep FROM range(32)),
base AS (
    SELECT r.rep, o.o_orderkey AS k,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS units
    FROM orders o CROSS JOIN reps r),
m0 AS (
    SELECT rep, units,
           ((((k % 2147483648) * 32 + rep) % 2147483648)
            * 2654435761) % 4294967296 AS hv
    FROM base),
m1 AS (SELECT rep, units,
              (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM m0),
m2 AS (SELECT rep, units,
              (xor(hv, hv >> 16) * 73244475) % 4294967296 AS hv FROM m1),
w AS (
    SELECT rep, units,
           len(list_filter(
               [0.36787944117144233, 0.7357588823428847,
                0.9196986029286058, 0.9810118431238462,
                0.9963401531726562, 0.9994058151824182,
                0.999916758850712, 0.9999897508033254],
               c -> c < xor(hv, hv >> 16) / 4294967296.0)) AS w
    FROM m2),
g AS (
    SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * units) AS BIGINT) AS sum_units
    FROM w GROUP BY 1),
means AS (
    SELECT rep, n_eff,
           round((CAST(sum_units AS DOUBLE) / CAST(n_eff AS DOUBLE))
                 / 100.0, 6) AS boot_mean
    FROM g),
ci AS (
    SELECT round(quantile_cont(boot_mean, 0.025), 6) AS ci_lo,
           round(quantile_cont(boot_mean, 0.975), 6) AS ci_hi
    FROM means)
SELECT m.rep, m.n_eff, m.boot_mean, ci.ci_lo, ci.ci_hi
FROM means m CROSS JOIN ci
"""

# q_frequent_triples — direct count-and-threshold formulation: the
# engine's Apriori pair prune is result-neutral by support monotonicity
# (every sub-pair of a frequent triple is itself frequent), so the
# match verifies the level-wise machinery without mirroring it.
ORACLES["q_frequent_triples"] = """
WITH b AS (
    SELECT DISTINCT l_orderkey AS g, p_brand AS it
    FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS nb FROM b),
t AS (
    SELECT x.it AS item_a, y.it AS item_b, z.it AS item_c,
           count(*) AS n_abc
    FROM b x
    JOIN b y ON x.g = y.g AND x.it < y.it
    JOIN b z ON y.g = z.g AND y.it < z.it
    GROUP BY 1, 2, 3)
SELECT item_a, item_b, item_c, CAST(n_abc AS BIGINT) AS n_abc,
       round(CAST(n_abc AS DOUBLE) / nb, 6) AS support
FROM t, n
WHERE CAST(n_abc AS DOUBLE) >= 0.003::DOUBLE * nb
"""

# q_seasonal_decompose — centered-MA detrend on the integer epoch-hour
# RANGE frame (gap-aligned), seasonal mean per (type, hour-of-day);
# trend is exact long/long, detrended terms round at 9 pre-sum.
ORACLES["q_seasonal_decompose"] = """
WITH y AS (
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
           count(*) AS y
    FROM events GROUP BY 1, 2),
t AS (
    SELECT event_type, hr, y,
           CAST(sum(y) OVER w AS DOUBLE)
           / CAST(count(*) OVER w AS DOUBLE) AS trend
    FROM y
    WINDOW w AS (PARTITION BY event_type ORDER BY hr
                 RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
d AS (
    SELECT event_type, hr % 24 AS hod, round(y - trend, 9) AS det
    FROM t)
SELECT event_type, hod, count(*) AS n_hours,
       round(sum(det) / count(*), 6) AS seasonal
FROM d GROUP BY 1, 2
"""

# q_weighted_median — value-grain cumulative weights, lower-median rule
# 2·cum >= total on exact longs; median cents back to currency is one
# division.
ORACLES["q_weighted_median"] = """
WITH w AS (SELECT l_orderkey, count(*) AS w FROM lineitem GROUP BY 1),
r AS (
    SELECT o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v, w.w
    FROM orders JOIN w ON o_orderkey = l_orderkey),
vg AS (SELECT prio, v, CAST(sum(w) AS BIGINT) AS wv FROM r GROUP BY 1, 2),
c AS (
    SELECT prio, v,
           sum(wv) OVER (PARTITION BY prio ORDER BY v) AS cum,
           sum(wv) OVER (PARTITION BY prio) AS tot
    FROM vg)
SELECT prio AS o_orderpriority,
       CAST(min(tot) AS BIGINT) AS total_w,
       round(CAST(min(v) AS DOUBLE) / 100.0, 6) AS wmedian
FROM c WHERE 2 * cum >= tot
GROUP BY 1
"""

# q_mutual_nn — brute-force nearest within radius, then the reciprocity
# self-join with id_a < id_b canonicalization.
ORACLES["q_mutual_nn"] = """
WITH p AS (
    SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
    FROM embeddings),
d AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM p a JOIN p b ON a.vec_id <> b.vec_id),
f AS (
    SELECT vec_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d WHERE d2 <= 0.15::DOUBLE * 0.15::DOUBLE),
nn AS MATERIALIZED (
    SELECT vec_id, neighbor_id, round(sqrt(d2), 6) AS dist
    FROM f WHERE rn = 1)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.dist
FROM nn a JOIN nn b
  ON a.neighbor_id = b.vec_id AND b.neighbor_id = a.vec_id
WHERE a.vec_id < b.vec_id
"""

# q_time_weighted_avg — step-function TWAP per (user, type) stream;
# integer-second durations x exact cents, one long/long division.
ORACLES["q_time_weighted_avg"] = """
WITH e AS (
    SELECT user_id, event_type, event_id,
           CAST(round(value * 100) AS BIGINT) AS c,
           CAST(floor(epoch(ts)) AS BIGINT) AS t
    FROM events WHERE value IS NOT NULL),
s AS (
    SELECT user_id, event_type, c,
           lead(t) OVER (PARTITION BY user_id, event_type
                         ORDER BY t, event_id) - t AS dur
    FROM e),
g AS (
    SELECT user_id, event_type,
           count(*) AS n_intervals,
           CAST(sum(dur) AS BIGINT) AS span_s,
           CAST(sum(c * dur) AS BIGINT) AS wsum
    FROM s WHERE dur IS NOT NULL
    GROUP BY 1, 2)
SELECT user_id, event_type, n_intervals, span_s,
       round(CAST(wsum AS DOUBLE) / CAST(span_s AS DOUBLE) / 100.0, 6)
         AS twap
FROM g WHERE span_s > 0
"""

# q_isotonic_calibration — exact minimax PAV: fitted[i] =
# max_{j<=i} min_{k>=i} of the interval positive-rate means, all on the
# <=10-row bin grain; interval means are exact long/long divisions.
ORACLES["q_isotonic_calibration"] = """
WITH e AS (
    SELECT value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
    FROM events WHERE value IS NOT NULL),
bounds AS (
    SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
    FROM e),
bins AS MATERIALIZED (
    SELECT CAST(len(list_filter(bo.b, x -> e.value > x)) AS BIGINT)
             AS bin,
           count(*) AS n, CAST(sum(is_pos) AS BIGINT) AS pos
    FROM e CROSS JOIN bounds bo GROUP BY 1),
iv AS MATERIALIZED (
    SELECT j.bin AS j, k.bin AS k,
           CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE)
             AS mean
    FROM bins j
    JOIN bins k ON j.bin <= k.bin
    JOIN bins m ON m.bin >= j.bin AND m.bin <= k.bin
    GROUP BY 1, 2),
lo AS (
    SELECT i.bin AS i, iv.j, min(iv.mean) AS lo
    FROM bins i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
    GROUP BY 1, 2),
fitted AS (
    SELECT i, round(max(lo), 6) AS iso_rate FROM lo GROUP BY 1)
SELECT b.bin, b.n,
       CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS pos_rate,
       f.iso_rate
FROM bins b JOIN fitted f ON b.bin = f.i
"""

# q_modularity — the LPA unroll (same stages as q_label_propagation)
# followed by Newman's Q on the canonical edge set; identical IEEE
# expression order for the per-community terms.
ORACLES["q_modularity"] = ("""
WITH rel AS (
    SELECT DISTINCT user_id AS e, event_id // 2 AS i FROM events
    WHERE event_type = 'purchase'),
und AS MATERIALIZED (
    SELECT DISTINCT least(x.e, y.e) AS a, greatest(x.e, y.e) AS b
    FROM rel x JOIN rel y USING (i)
    WHERE x.e <> y.e),
nbr AS MATERIALIZED (
    SELECT a AS node, b AS nb FROM und
    UNION ALL SELECT b, a FROM und),
l0 AS (SELECT DISTINCT node, node AS label FROM nbr),
""" + ",\n".join(_LPA_ROUND.format(k=k, p=k - 1) for k in range(1, 4)) + """,
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM und),
e_in AS (
    SELECT la.label AS community, count(*) AS e_in
    FROM und
    JOIN l3 la ON und.a = la.node
    JOIN l3 lb ON und.b = lb.node
    WHERE la.label = lb.label
    GROUP BY 1),
degc AS (
    SELECT l.label AS community, CAST(sum(d.deg) AS BIGINT) AS deg_sum
    FROM (SELECT node, count(*) AS deg FROM nbr GROUP BY 1) d
    JOIN l3 l ON d.node = l.node
    GROUP BY 1),
terms AS (
    SELECT dc.community,
           CAST(coalesce(ei.e_in, 0) AS BIGINT) AS e_in,
           dc.deg_sum,
           round(CAST(coalesce(ei.e_in, 0) AS DOUBLE) / m.m
                 - (CAST(dc.deg_sum AS DOUBLE) / (2.0 * m.m))
                   * (CAST(dc.deg_sum AS DOUBLE) / (2.0 * m.m)), 9)
             AS term
    FROM degc dc LEFT JOIN e_in ei ON dc.community = ei.community
    CROSS JOIN m),
q AS (SELECT round(sum(term), 6) AS modularity FROM terms)
SELECT t.community, t.e_in, t.deg_sum, t.term, q.modularity
FROM terms t CROSS JOIN q
""")

# q_lsh_precision — the q_minhash_neutral pipeline through candidate
# pairs, then EXACT 3-shingle Jaccard restricted to those pairs;
# >=tau is the integer cross-multiply, per-pair |est-true| rounds at 9.
ORACLES["q_lsh_precision"] = f"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), t -> t <> '') AS wds
    FROM documents),
sh AS (
    SELECT doc_id, array_to_string(list_slice(wds, i, i + 2), ' ') AS s
    FROM w, UNNEST(generate_series(1, greatest(len(wds) - 2, 1))) t(i)),
bh AS (
    SELECT doc_id, list_reduce(
             list_prepend(7::BIGINT,
               list_transform(range(1, length(s) + 1),
                              i -> ascii(substr(s, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS h
    FROM sh),
perm(j, a, b) AS (
    VALUES {_PERM_VALUES}),
slots AS MATERIALIZED (
    SELECT doc_id, j, min((a * h + b) % 2147483647) AS slot
    FROM bh CROSS JOIN perm GROUP BY 1, 2),
bnd AS (
    SELECT doc_id, CAST(j // {_RPB} AS BIGINT) AS band,
           list(slot ORDER BY j) AS bs
    FROM slots GROUP BY 1, 2),
bkt AS (
    SELECT doc_id, band,
           list_reduce(list_prepend(band, bs),
                       (acc, s) -> (acc * 31 + s) % 1000000007) AS bucket
    FROM bnd),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bkt a JOIN bkt b
      ON a.band = b.band AND a.bucket = b.bucket
     AND a.doc_id < b.doc_id),
eq AS (
    SELECT c.doc_a, c.doc_b,
           count(*) FILTER (sa.slot = sb.slot) AS m
    FROM cand c
    JOIN slots sa ON sa.doc_id = c.doc_a
    JOIN slots sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY 1, 2),
cp AS MATERIALIZED (
    SELECT doc_a, doc_b, round(m / {float(_N_MINHASH)}, 6) AS est
    FROM eq WHERE m >= {-(-_N_MINHASH // 2)}),
shd AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_s FROM shd GROUP BY 1),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS i
    FROM cp c
    JOIN shd a ON a.doc_id = c.doc_a
    JOIN shd b ON b.doc_id = c.doc_b AND b.s = a.s
    GROUP BY 1, 2),
jj AS (
    SELECT cp.est, coalesce(i.i, 0) AS i,
           sa.n_s + sb.n_s - coalesce(i.i, 0) AS u
    FROM cp
    LEFT JOIN inter i USING (doc_a, doc_b)
    JOIN sizes sa ON sa.doc_id = cp.doc_a
    JOIN sizes sb ON sb.doc_id = cp.doc_b),
e AS (
    SELECT i, u,
           round(abs(est - CAST(i AS DOUBLE) / CAST(u AS DOUBLE)), 9)
             AS err
    FROM jj)
SELECT count(*) AS n_candidates,
       CAST(sum(CASE WHEN 2 * i >= u THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true,
       round(CAST(sum(CASE WHEN 2 * i >= u THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS DOUBLE), 6) AS precision,
       round(sum(err) / count(*), 6) AS mean_abs_err,
       round(max(err), 6) AS max_abs_err
FROM e
"""

# q_hilbert_values — the 8 reflect/swap rounds as chained CTE stages
# (nested expressions would grow ~3x per round); reflection against the
# full grid keeps x,y in [0, 256) so plain bit tests suffice.
_HILBERT_BITS = 8
_HILBERT_N = 1 << _HILBERT_BITS


def _hilbert_round_sql(k: int, i: int) -> str:
    s = 1 << i
    n1 = _HILBERT_N - 1
    return f"""\
h{k} AS (
    SELECT event_id,
           d + {s * s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                             (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d,
           CASE WHEN (y & {s}) = 0
                THEN CASE WHEN (x & {s}) > 0 THEN {n1} - y ELSE y END
                ELSE x END AS x,
           CASE WHEN (y & {s}) = 0
                THEN CASE WHEN (x & {s}) > 0 THEN {n1} - x ELSE x END
                ELSE y END AS y
    FROM h{k - 1})"""


ORACLES["q_hilbert_values"] = ("""
WITH base AS (
    SELECT event_id, user_id AS bx,
           CAST(floor(epoch(ts)) AS BIGINT) AS by
    FROM events),
ext AS (
    SELECT min(bx) AS xlo, max(bx) AS xhi, min(by) AS ylo, max(by) AS yhi
    FROM base),
h0 AS (
    SELECT event_id,
           CASE WHEN xhi = xlo THEN 0
                ELSE CAST(floor((bx - xlo) * 255 / (xhi - xlo)) AS BIGINT)
           END AS x,
           CASE WHEN yhi = ylo THEN 0
                ELSE CAST(floor((by - ylo) * 255 / (yhi - ylo)) AS BIGINT)
           END AS y,
           CAST(0 AS BIGINT) AS d
    FROM base, ext),
""" + ",\n".join(_hilbert_round_sql(k, _HILBERT_BITS - k)
                 for k in range(1, _HILBERT_BITS + 1)) + """
SELECT event_id, d AS hval FROM h8
""")

# q_acf — the q_lead_lag machinery on one series, lags 1..12.
ORACLES["q_acf"] = """
WITH hours AS MATERIALIZED (
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
           count(*) AS n
    FROM events GROUP BY 1),
span AS (
    SELECT CAST(floor(epoch(date_trunc('hour', min(ts)))) AS BIGINT)
             AS lo,
           CAST(floor(epoch(date_trunc('hour', max(ts)))) AS BIGINT)
             AS hi
    FROM events),
grid AS MATERIALIZED (
    SELECT unnest(generate_series(lo, hi, 3600)) AS h FROM span),
s AS MATERIALIZED (
    SELECT g.h, CAST(coalesce(x.n, 0) AS BIGINT) AS c
    FROM grid g LEFT JOIN hours x ON g.h = x.h),
lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]) AS k),
m AS (
    SELECT k, CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(a.c) AS HUGEINT) AS sx,
           CAST(sum(b.c) AS HUGEINT) AS sy,
           CAST(sum(CAST(a.c AS HUGEINT) * a.c) AS HUGEINT) AS sxx,
           CAST(sum(CAST(b.c AS HUGEINT) * b.c) AS HUGEINT) AS syy,
           CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS sxy
    FROM lags JOIN s a ON true JOIN s b ON b.h - k * 3600 = a.h
    GROUP BY 1)
SELECT CAST(k AS BIGINT) AS lag_hours, CAST(n AS BIGINT) AS n_hours,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS r
FROM m
"""

# q_did — 2x2 difference-in-differences; epoch-midpoint cutoff with
# floor semantics (the q_cuped discipline), exact-cents cell means.
ORACLES["q_did"] = """
WITH e AS (
    SELECT user_id % 2 AS treat,
           CAST(round(value * 100) AS BIGINT) AS c,
           CAST(floor(epoch(ts)) AS BIGINT) AS t
    FROM events WHERE value IS NOT NULL),
cut AS (
    SELECT CAST(floor((min(t) + max(t)) / 2) AS BIGINT) AS cut FROM e),
cells AS (
    SELECT treat, CASE WHEN t >= cut THEN 1 ELSE 0 END AS post,
           count(*) AS n, CAST(sum(c) AS BIGINT) AS s
    FROM e, cut GROUP BY 1, 2),
wide AS (
    SELECT CAST(sum(n) AS BIGINT) AS n_events,
           max(CASE WHEN treat = 1 AND post = 1
                    THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
               END) AS tp,
           max(CASE WHEN treat = 1 AND post = 0
                    THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
               END) AS tq,
           max(CASE WHEN treat = 0 AND post = 1
                    THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
               END) AS cp,
           max(CASE WHEN treat = 0 AND post = 0
                    THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
               END) AS cq
    FROM cells)
SELECT n_events,
       round(tp - tq, 6) AS treat_delta,
       round(cp - cq, 6) AS control_delta,
       round((tp - tq) - (cp - cq), 6) AS did
FROM wide
"""

# q_theil_sen — median pairwise slope at the calendar-bounded day grain;
# exact percentiles, intercept from the rounded slope.
ORACLES["q_theil_sen"] = """
WITH days AS MATERIALIZED (
    SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS r
    FROM orders GROUP BY 1),
slopes AS MATERIALIZED (
    SELECT a.d AS di, b.d AS dj,
           CAST(b.r - a.r AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
           / 100.0 AS s
    FROM days a JOIN days b ON a.d < b.d),
ranked AS (
    SELECT s, row_number() OVER (ORDER BY s ASC, di ASC, dj ASC) AS p,
           count(*) OVER () AS n
    FROM slopes),
sl AS (
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           round(avg(s), 6) AS sen_slope
    FROM ranked
    WHERE p = (n + 1) // 2 OR p = n // 2 + 1),
resid AS (
    SELECT sl.n_pairs, sl.sen_slope, days.d,
           CAST(days.r AS DOUBLE) / 100.0 - sl.sen_slope * days.d AS e
    FROM days CROSS JOIN sl),
rr AS (
    SELECT n_pairs, sen_slope, e,
           row_number() OVER (ORDER BY e ASC, d ASC) AS p,
           count(*) OVER () AS nd
    FROM resid)
SELECT n_pairs, sen_slope, CAST(max(nd) AS BIGINT) AS n_days,
       round(avg(e), 6) AS intercept
FROM rr
WHERE p = (nd + 1) // 2 OR p = nd // 2 + 1
GROUP BY 1, 2
"""

# q_personalized_pagerank — PPR unroll: teleport on the seed set,
# dangling mass re-teleports to seeds; identical IEEE constants to the
# engine (1 - 0.85::DOUBLE reproduces Python's 0.15000000000000002).
_PPR_ROUND = """p{k} AS (
    SELECT b.node, b.outdeg, b.tele,
           (b.tele * ((1 - 0.85::DOUBLE) + 0.85::DOUBLE * d.dm)
            + 0.85::DOUBLE * COALESCE(c.inflow, 0)) AS rank
    FROM base b
    LEFT JOIN (SELECT e.dst AS node, sum(r.rank / r.outdeg) AS inflow
               FROM edges e JOIN p{p} r ON e.src = r.node
               GROUP BY 1) c USING (node)
    CROSS JOIN (SELECT COALESCE(sum(rank), 0::DOUBLE) AS dm
                FROM p{p} WHERE outdeg IS NULL) d)"""

ORACLES["q_personalized_pagerank"] = ("""
WITH pairs AS (
    SELECT DISTINCT user_id AS e, event_id // 5 AS i FROM events),
edges AS MATERIALIZED (
    SELECT DISTINCT a.e AS src, b.e AS dst
    FROM pairs a JOIN pairs b USING (i)
    WHERE a.e <> b.e),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
seeds AS (
    SELECT DISTINCT user_id AS node FROM events
    WHERE user_id % 25 = 0),
sn AS MATERIALIZED (
    SELECT s.node FROM seeds s JOIN nodes n ON s.node = n.node),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM sn),
outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
base AS MATERIALIZED (
    SELECT n.node, o.outdeg,
           CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.ns
                ELSE 0::DOUBLE END AS tele
    FROM nodes n
    LEFT JOIN outdeg o USING (node)
    LEFT JOIN sn s ON n.node = s.node
    CROSS JOIN ns),
p0 AS (SELECT node, outdeg, tele, tele AS rank FROM base),
""" + ",\n".join(_PPR_ROUND.format(k=k, p=k - 1) for k in range(1, 6)) + """
SELECT node AS user_id, round(rank, 9) AS rank FROM p5
ORDER BY rank DESC, user_id ASC
LIMIT 20
""")

# q_session_stats — gaps-and-islands sessions, value-grain lower median
# of session length, exact bounce rate.
ORACLES["q_session_stats"] = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events),
islands AS (
    SELECT user_id,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked),
sess AS MATERIALIZED (
    SELECT count(*) AS n_events
    FROM islands GROUP BY user_id, session_id),
vg AS (SELECT n_events, count(*) AS w FROM sess GROUP BY 1),
c AS (
    SELECT n_events,
           sum(w) OVER (ORDER BY n_events) AS cum,
           sum(w) OVER () AS tot
    FROM vg),
med AS (
    SELECT CAST(min(n_events) AS BIGINT) AS median_session_events
    FROM c WHERE 2 * cum >= tot)
SELECT (SELECT count(*) FROM sess) AS n_sessions,
       (SELECT CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) FROM sess) AS n_bounces,
       round((SELECT CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) FROM sess)
             / CAST((SELECT count(*) FROM sess) AS DOUBLE), 6)
         AS bounce_rate,
       med.median_session_events
FROM med
"""

# q_conversion_lag — first-view -> first-purchase integer-second gaps;
# exact mean and the quantile_cont(0.5) position-pick median.
ORACLES["q_conversion_lag"] = """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view'
                    THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fv,
           min(CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fp
    FROM events GROUP BY 1),
delays AS MATERIALIZED (
    SELECT user_id, fp - fv AS d
    FROM firsts
    WHERE fv IS NOT NULL AND fp IS NOT NULL AND fv < fp),
rr AS (
    SELECT d, row_number() OVER (ORDER BY d ASC, user_id ASC) AS p,
           count(*) OVER () AS n
    FROM delays),
med AS (
    SELECT round(avg(CAST(d AS DOUBLE)), 6) AS median_delay_s
    FROM rr WHERE p = (n + 1) // 2 OR p = n // 2 + 1)
SELECT (SELECT count(*) FROM delays) AS n_converters,
       round((SELECT CAST(sum(d) AS DOUBLE) FROM delays)
             / CAST((SELECT count(*) FROM delays) AS DOUBLE), 6)
         AS mean_delay_s,
       med.median_delay_s
FROM med
"""

# q_stationary_dist — 5 unrolled power-iteration rounds over the
# states^2 chain; P entries are exact long/long divisions; absorbing
# states keep their mass (the engine's anti-join stay term).
_SD_ROUND = """\
pi{k} AS MATERIALIZED (
    SELECT s.state,
           COALESCE(f.infl, 0::DOUBLE) + COALESCE(kp.keep, 0::DOUBLE)
             AS pi
    FROM states s
    LEFT JOIN (SELECT p.next_state AS state, sum(r.pi * p.p) AS infl
               FROM pi{pr} r JOIN p ON r.state = p.prev_state
               GROUP BY 1) f ON s.state = f.state
    LEFT JOIN (SELECT r.state, r.pi AS keep FROM pi{pr} r
               WHERE r.state NOT IN (SELECT prev_state FROM p)) kp
      ON s.state = kp.state)"""

ORACLES["q_stationary_dist"] = ("""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events),
pairs AS (
    SELECT prev AS prev_state, event_type AS next_state, count(*) AS n
    FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT prev_state, CAST(sum(n) AS BIGINT) AS t
        FROM pairs GROUP BY 1),
p AS MATERIALIZED (
    SELECT pairs.prev_state, pairs.next_state,
           CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS p
    FROM pairs JOIN tot USING (prev_state)),
states AS MATERIALIZED (
    SELECT prev_state AS state FROM p
    UNION SELECT next_state FROM p),
ns AS (SELECT count(*) AS ns FROM states),
pi0 AS (SELECT state, 1.0 / CAST(ns AS DOUBLE) AS pi
        FROM states CROSS JOIN ns),
""" + ",\n".join(_SD_ROUND.format(k=k, pr=k - 1) for k in range(1, 6)) + """
SELECT state, round(pi, 6) AS pi FROM pi5
""")

# q_zipf_tokens — the CSN discrete power-law MLE on the token
# count-of-counts (q_degree_distribution pointed at vocabulary).
ORACLES["q_zipf_tokens"] = """
WITH tok AS (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
             AS tk
    FROM documents),
counts AS MATERIALIZED (
    SELECT tk, count(*) AS cnt FROM tok GROUP BY 1),
hist AS (SELECT cnt, count(*) AS n_tokens FROM counts GROUP BY 1),
alpha AS (
    SELECT round(1.0 + CAST(count(*) AS DOUBLE)
                 / sum(round(ln(CAST(cnt AS DOUBLE) / 1.5), 9)), 6)
             AS alpha_hat
    FROM counts WHERE cnt >= 2)
SELECT CAST(h.cnt AS BIGINT) AS cnt, h.n_tokens, a.alpha_hat
FROM hist h CROSS JOIN alpha a
"""

# q_mde — two-proportion minimum detectable effect; z constants are the
# same shortest-repr doubles the engine lit()s, summed with one IEEE add.
ORACLES["q_mde"] = """
WITH u AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS conv,
           user_id % 2 AS arm
    FROM events GROUP BY user_id),
wide AS (
    SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(sum(conv) AS BIGINT) AS x
    FROM u)
SELECT n_a, n_b,
       round(CAST(x AS DOUBLE) / CAST(n_a + n_b AS DOUBLE), 6)
         AS baseline_rate,
       round((1.959963984540054::DOUBLE + 0.8416212335729143::DOUBLE)
             * sqrt(CAST(x AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
                    * (1.0 - CAST(x AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))), 6) AS mde_abs
FROM wide
"""

# q_silhouette — the q_lloyd_kmeans unroll (same stages, same final d4
# distance table) extended with the second-nearest pick and the
# simplified-silhouette expression; per-point s rounds at 9 pre-mean.
ORACLES["q_silhouette"] = (
    ORACLES["q_lloyd_kmeans"].rsplit("SELECT vec_id", 1)[0] + """,
rk AS (
    SELECT vec_id, cl, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cl ASC) AS rn
    FROM d4),
ab AS (
    SELECT vec_id,
           max(CASE WHEN rn = 1 THEN cl END) AS cluster,
           max(CASE WHEN rn = 1 THEN d2 END) AS a2,
           max(CASE WHEN rn = 2 THEN d2 END) AS b2
    FROM rk WHERE rn <= 2 GROUP BY 1),
sv AS (
    SELECT cluster,
           CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
                THEN round((sqrt(b2) - sqrt(a2))
                           / greatest(sqrt(a2), sqrt(b2)), 9)
                ELSE 0.0 END AS s
    FROM ab)
SELECT cluster, count(*) AS n_points,
       round(sum(s) / count(*), 6) AS mean_silhouette
FROM sv GROUP BY 1
""")

# q_bm25_batch — the bm25_rank scoring formula per (query, doc); df is
# per term (query-independent); per-query row_number on rounded score.
ORACLES["q_bm25_batch"] = """
WITH q(query_id, term) AS (
    VALUES (0, 'spark'), (0, 'hash'), (1, 'join'), (1, 'merge'),
           (2, 'window'), (2, 'sort'), (2, 'batch')),
tok AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl,
           unnest(list_filter(string_split(text, ' '), t -> t <> ''))
             AS term
    FROM documents),
stats AS (
    SELECT count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    t -> t <> ''))) AS BIGINT) AS sum_dl
    FROM documents),
tf AS (
    SELECT q.query_id, tok.doc_id, tok.dl, tok.term, count(*) AS tf
    FROM tok JOIN q ON tok.term = q.term
    GROUP BY 1, 2, 3, 4),
dfreq AS (
    SELECT term, count(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY term),
scored AS (
    SELECT tf.query_id, tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1)
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl
                        / (CAST(sum_dl AS DOUBLE)
                           / CAST(n_docs AS DOUBLE))))),
                 6) AS score
    FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
    GROUP BY 1, 2)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, n_terms, score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC)
               AS rnk
      FROM scored)
WHERE rnk <= 5
"""

# q_ivm_retract — the retraction path must equal aggregating the
# remaining rows from scratch (the q_ivm_refresh proof pattern).
ORACLES["q_ivm_retract"] = """
WITH c AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE value IS NOT NULL AND event_id % 10 <> 3)
SELECT event_type,
       count(*) AS n,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 6) AS sum_value,
       round(CAST(min(cents) AS DOUBLE) / 100.0, 6) AS min_value,
       round(CAST(max(cents) AS DOUBLE) / 100.0, 6) AS max_value,
       round(CAST(sum(cents) AS DOUBLE)
             / (100.0 * count(*)), 6) AS mean_value
FROM c GROUP BY 1
"""

# q_expectations — six independent single-aggregate verdicts unioned;
# passed compares the RAW observed value, output rounds at 6 (the
# operator's expression order).
ORACLES["q_expectations"] = """
SELECT 'rows >= 100' AS check,
       round(CAST(count(*) AS DOUBLE), 6) AS observed,
       100.0 AS threshold,
       CAST(count(*) AS DOUBLE) >= 100.0 AS passed
FROM events
UNION ALL
SELECT 'value null share <= 5%',
       round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) / CAST(count(*) AS DOUBLE), 6),
       0.05,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       / CAST(count(*) AS DOUBLE) <= 0.05
FROM events
UNION ALL
SELECT 'props null share <= 50%',
       round(CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) / CAST(count(*) AS DOUBLE), 6),
       0.5,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       / CAST(count(*) AS DOUBLE) <= 0.5
FROM events
UNION ALL
SELECT 'event_id unique',
       round(CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END),
                           0) AS DOUBLE), 6),
       0.0,
       CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
            AS DOUBLE) <= 0
FROM (SELECT event_id, count(*) AS c FROM events GROUP BY 1)
UNION ALL
SELECT 'value in [-10000, 10000]',
       round(CAST(sum(CASE WHEN value IS NOT NULL
                            AND (value < -10000.0 OR value > 10000.0)
                           THEN 1 ELSE 0 END) AS DOUBLE), 6),
       0.0,
       CAST(sum(CASE WHEN value IS NOT NULL
                      AND (value < -10000.0 OR value > 10000.0)
                     THEN 1 ELSE 0 END) AS DOUBLE) <= 0
FROM events
UNION ALL
SELECT 'event_type domain',
       round(CAST(sum(CASE WHEN event_type IS NOT NULL
                            AND event_type NOT IN
                                ('view', 'click', 'purchase', 'error',
                                 'signup')
                           THEN 1 ELSE 0 END) AS DOUBLE), 6),
       0.0,
       CAST(sum(CASE WHEN event_type IS NOT NULL
                      AND event_type NOT IN
                          ('view', 'click', 'purchase', 'error',
                           'signup')
                     THEN 1 ELSE 0 END) AS DOUBLE) <= 0
FROM events
"""

# q_uplift_deciles — user-grain collapse, decile bounds from one
# percentile array, exact-count cells, identical uplift subtraction.
ORACLES["q_uplift_deciles"] = """
WITH u AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS conv,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(count(*) AS DOUBLE)) AS score,
           user_id % 2 AS treat
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id),
bounds AS (
    SELECT quantile_cont(score, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
    FROM u),
cells AS (
    SELECT CAST(len(list_filter(bo.b, x -> u.score > x)) AS BIGINT)
             AS decile,
           CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_t,
           CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END)
                AS BIGINT) AS x_t,
           CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_c,
           CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END)
                AS BIGINT) AS x_c
    FROM u CROSS JOIN bounds bo
    GROUP BY 1)
SELECT decile, n_t, x_t, n_c, x_c,
       CASE WHEN n_t > 0 AND n_c > 0
            THEN round(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                       - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
       END AS uplift
FROM cells
"""

# q_ece — min-max-normalized pseudo-probability, decile bins, round-9
# weighted |acc - conf| terms.
ORACLES["q_ece"] = """
WITH e AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS c,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE value IS NOT NULL),
ext AS (SELECT min(c) AS lo, max(c) AS hi FROM e),
binned AS (
    SELECT least(9, CAST(floor(
               CASE WHEN hi = lo THEN 0.0
                    ELSE CAST(c - lo AS DOUBLE)
                         / CAST(hi - lo AS DOUBLE) END * 10)
               AS BIGINT)) AS b,
           c - lo AS pu, pos, hi - lo AS span
    FROM e CROSS JOIN ext),
cells AS (
    SELECT b, count(*) AS n,
           CAST(sum(pu) AS BIGINT) AS sp,
           CAST(sum(pos) AS BIGINT) AS x,
           CAST(max(span) AS BIGINT) AS span
    FROM binned GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
terms AS (
    SELECT round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
                 * abs(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(sp AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(span AS DOUBLE))),
                 9) AS t
    FROM cells CROSS JOIN tot)
SELECT count(*) AS n_bins, round(sum(t), 6) AS ece FROM terms
"""
