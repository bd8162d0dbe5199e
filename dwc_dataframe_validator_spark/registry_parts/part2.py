"""Registry slice 2/6 — see registry_parts/__init__.py."""
from __future__ import annotations

from .part1 import *  # noqa: F401,F403 — append-only chain
from .part1 import (  # noqa: F401 — underscore chain
    _BOR_LOWER,
    _BOR_SQL,
    _DWCA_EVENT_FIXTURE,
    _DWCA_FIXTURE,
    _EMB_PAIRS_SQL,
    _EVENT_TYPES,
    _JSONL_FIXTURE,
    _MIXTURE,
    _MULTISCRIPT_TEXTS,
    _MULTISCRIPT_TEXT_SQL,
    _OCC_VIEW_COLUMNS,
    _OCC_VIEW_SQL,
    _dec,
    _full_metrics_oracle_sql,
    _multiscript_text_col,
    _occurrence_checks,
)



ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        WITH agg AS (
          SELECT l_returnflag, l_linestatus,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
            CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
            count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY 1, 2)
        SELECT *, sum_qty / count_order AS avg_qty,
               sum_base_price / count_order AS avg_price
        FROM agg
    """,
    "q_top_orders_by_revenue": """
        WITH rev AS (
          SELECT l_orderkey,
            CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                 AS DOUBLE) / 10000.0 AS revenue
          FROM lineitem GROUP BY 1)
        SELECT o_orderkey, o_orderdate, revenue
        FROM rev JOIN orders ON l_orderkey = o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "q_nation_revenue": """
        SELECT n_name,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "a1_record_count": "SELECT count(*) AS record_count FROM lineitem",
    "a2_column_counts": """
        SELECT count(o_orderkey) AS cnt_o_orderkey,
               count(o_custkey) AS cnt_o_custkey,
               count(o_orderstatus) AS cnt_o_orderstatus,
               count(o_totalprice) AS cnt_o_totalprice,
               count(o_orderdate) AS cnt_o_orderdate,
               count(o_orderpriority) AS cnt_o_orderpriority
        FROM orders
    """,
    "a4_range_count": """
        SELECT count("value") AS populated,
               count(*) FILTER (WHERE TRY_CAST("value" AS DOUBLE) BETWEEN 2 AND 8) AS in_range
        FROM events
    """,
    "a5_group_populated": """
        SELECT count(*) FILTER (WHERE text IS NOT NULL OR lang IS NOT NULL) AS any_populated,
               count(*) AS record_count
        FROM documents
    """,
    "a8_a9_distinct_duplicates": """
        SELECT count(l_orderkey) AS populated,
               count(DISTINCT l_orderkey) AS distinct_cnt,
               count(l_orderkey) - count(DISTINCT l_orderkey) AS duplicate_cnt
        FROM lineitem
    """,
    "a10_vocab_membership": """
        SELECT count(*) AS record_count,
               count(*) - count(l_returnflag) AS null_cnt,
               count(*) FILTER (WHERE lower(CAST(l_returnflag AS VARCHAR)) IN ('a','r')) AS recognised,
               count(*) - (count(*) - count(l_returnflag))
                        - count(*) FILTER (WHERE lower(CAST(l_returnflag AS VARCHAR)) IN ('a','r')) AS unrecognised
        FROM lineitem
    """,
    "a11_value_histogram": """
        SELECT CAST(l_returnflag AS VARCHAR) AS value, count(*) AS cnt
        FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1
    """,
    "a12_top_k": """
        SELECT value, cnt FROM (
          SELECT CAST(p_brand AS VARCHAR) AS value, count(*) AS cnt,
                 row_number() OVER (ORDER BY count(*) DESC, CAST(p_brand AS VARCHAR) ASC) AS rn
          FROM part WHERE p_brand IS NOT NULL GROUP BY 1)
        WHERE rn <= 20
    """,
    "a13_date_parts": """
        SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
               day(o_orderdate) AS day, count(*) AS cnt
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2, 3
    """,
    "a14_offender_sample": """
        SELECT value FROM (
          SELECT DISTINCT CAST(lang AS VARCHAR) AS value FROM documents
          WHERE lang IS NOT NULL AND lower(CAST(lang AS VARCHAR)) NOT IN ('en','de')
          ORDER BY value LIMIT 10)
        WHERE value <> 'nan'
    """,
    "p4_range_filter": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE TRY_CAST(c_acctbal AS DOUBLE) BETWEEN 0 AND 1000
    """,
    "p6_membership_filter": """
        SELECT event_id FROM events
        WHERE lower(CAST(event_type AS VARCHAR)) IN ('error','signup')
    """,
    "p8_json_extract": """
        SELECT CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS cnt_k,
               min(k) AS min_k, max(k) AS max_k
        FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
    """,
    "occurrence_full_metrics": _full_metrics_oracle_sql(),
    "occurrence_validation_metrics": f"""
        WITH occ AS ({_OCC_VIEW_SQL})
        SELECT count(*) AS record_count,
               count(DISTINCT occurrenceID) AS occurrence_id_distinct,
               count(decimalLatitude) AS lat_populated,
               count(*) FILTER (WHERE TRY_CAST(decimalLatitude AS DOUBLE) BETWEEN -90 AND 90) AS lat_valid,
               count(*) FILTER (WHERE TRY_CAST(decimalLongitude AS DOUBLE) BETWEEN -180 AND 180) AS lon_valid,
               count(*) FILTER (WHERE lower(CAST(basisOfRecord AS VARCHAR)) IN ({_BOR_SQL})) AS bor_recognised,
               count(*) - count(basisOfRecord) AS bor_null,
               count(*) FILTER (WHERE eventDate IS NOT NULL) AS temporal_populated,
               count(*) FILTER (WHERE scientificName IS NOT NULL) AS taxonomy_populated
        FROM occ
    """,
    "fk_orders_customer": """
        SELECT count(*) AS orphan_count FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    "fk_lineitem_orders": """
        SELECT count(*) AS orphan_count FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    "dedup_exact_groups": """
        SELECT user_id, event_type, count(*) AS cnt FROM events
        GROUP BY 1, 2 HAVING count(*) > 1
    """,
    "dedup_exact_keepers": """
        SELECT event_id FROM (
          SELECT event_id, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events)
        WHERE rn = 1
    """,
    "dedup_fingerprint": r"""
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
               length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_len
        FROM documents
    """,
    "text_token_stats": r"""
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens_bpe,
          octet_length(encode(text)) AS n_bytes,
          length(text) AS n_chars_computed,
          length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
          length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
          length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_ws
        FROM documents
    """,
    "text_quality": r"""
        WITH s AS (
          SELECT doc_id,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
            len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS stopword_hits,
            CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) AS alpha_ratio
          FROM documents)
        SELECT doc_id, n_tokens, stopword_hits, alpha_ratio,
               (n_tokens BETWEEN 5 AND 10000) AND stopword_hits >= 1
                 AND alpha_ratio >= 0.5 AS quality_ok
        FROM s
    """,
    # generated from the SAME SCRIPT_RANGES/precedence tables as the
    # Catalyst expression; the planted multi-script rotation is the
    # shared _MULTISCRIPT_TEXTS literal table
    "text_language_id_v2": text.language_id_v2_sql(
        table="(SELECT doc_id, %s AS text FROM documents) planted"
        % _MULTISCRIPT_TEXT_SQL
    ),
    "text_language_id": r"""
        WITH h AS (
          SELECT doc_id,
            len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to)\b')) AS hits_en,
            len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|zu)\b')) AS hits_de,
            len(regexp_extract_all(lower(text), '\b(le|la|et|est|les|un)\b')) AS hits_fr,
            len(regexp_extract_all(lower(text), '\b(el|los|de|y|es|una)\b')) AS hits_es
          FROM documents)
        SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
          CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
               WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
               WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
               WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
               ELSE 'es' END AS lang_guess
        FROM h
    """,
    "text_ngram_top_neighbor": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        grams0 AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shingle
          FROM words),
        -- same df skew guard as the Spark side: drop shingles in more
        -- than max(5, N/10) documents before pairing
        keep AS (
          SELECT shingle FROM grams0 GROUP BY shingle
          HAVING count(*) <= least(500,
            greatest(5, (SELECT count(*) FROM documents) // 10))),
        grams AS (SELECT g.* FROM grams0 g JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS nsh FROM grams GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
          FROM grams a JOIN grams b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        j AS (
          SELECT ida, idb,
            CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = ida
          JOIN sizes sb ON sb.doc_id = idb),
        sides AS (
          SELECT ida AS doc_id, idb AS neighbor_id, jaccard FROM j
          UNION ALL
          SELECT idb AS doc_id, ida AS neighbor_id, jaccard FROM j)
        SELECT doc_id, neighbor_id, jaccard FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY jaccard DESC, neighbor_id ASC) AS rn
          FROM sides)
        WHERE rn = 1
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
        s AS (
          SELECT qid AS query_id, e.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(qe, e.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
          FROM q, embeddings e WHERE e.vec_id <> qid)
        SELECT query_id, neighbor_id, rank, sim FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM s)
        WHERE rank <= 5
    """,
    "ann_cosine_topk_arrow": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
        s AS (
          SELECT qid AS query_id, e.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(qe, e.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
          FROM q, embeddings e WHERE e.vec_id <> qid)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM s)
        WHERE rank <= 5
    """,
    "ann_ivf_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
                   FROM embeddings WHERE vec_id < 8),
        s AS (
          SELECT qid AS query_id, e.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(qe, e.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
          FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> qid)
        SELECT query_id, neighbor_id, rank, sim FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM s)
        WHERE rank <= 3
    """,
    "annotate_row_errors": f"""
        WITH occ AS ({_OCC_VIEW_SQL}),
        flags AS (
          SELECT occurrenceID,
            list_filter([
              CASE WHEN NOT coalesce(TRY_CAST(decimalLatitude AS DOUBLE) BETWEEN -90 AND 90, false) THEN 'lat_range' END,
              CASE WHEN NOT coalesce(TRY_CAST(decimalLongitude AS DOUBLE) BETWEEN -180 AND 180, false) THEN 'lon_range' END,
              CASE WHEN NOT coalesce(lower(CAST(basisOfRecord AS VARCHAR)) IN ({_BOR_SQL}), false) THEN 'bor_vocab' END,
              CASE WHEN recordedBy IS NULL THEN 'recorded_by' END
            ], x -> x IS NOT NULL) AS errs
          FROM occ)
        SELECT occurrenceID, coalesce(array_to_string(errs, ','), '') AS error_list,
               len(errs) AS n_errors
        FROM flags
    """,
    "quarantine_counts": f"""
        WITH occ AS ({_OCC_VIEW_SQL}),
        j AS (
          SELECT coalesce(TRY_CAST(decimalLatitude AS DOUBLE) BETWEEN -90 AND 90, false)
             AND coalesce(TRY_CAST(decimalLongitude AS DOUBLE) BETWEEN -180 AND 180, false)
             AND coalesce(lower(CAST(basisOfRecord AS VARCHAR)) IN ({_BOR_SQL}), false)
             AND recordedBy IS NOT NULL AS ok
          FROM occ)
        SELECT 'valid' AS bucket, count(*) FILTER (WHERE ok) AS cnt FROM j
        UNION ALL
        SELECT 'quarantined' AS bucket, count(*) FILTER (WHERE NOT ok) AS cnt FROM j
    """,
    "stream_session_counts": """
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                 lower(CAST(event_type AS VARCHAR)) IN ('error') AS err
          FROM events),
        d AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM d)
        SELECT min(ts) AS s_start, max(ts) + INTERVAL '30 minutes' AS s_end,
               user_id, count(*) AS cnt, count(*) FILTER (WHERE err) AS is_error
        FROM s GROUP BY user_id, sid
    """,
    "stream_window_counts": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
               count(*) AS cnt,
               count(*) FILTER (WHERE TRY_CAST("value" AS DOUBLE) BETWEEN 2 AND 8) AS value_in_range,
               count(*) FILTER (WHERE lower(CAST(event_type AS VARCHAR)) IN ('error')) AS is_error
        FROM events GROUP BY 1
    """,
    "dedup_embedding_cosine": _EMB_PAIRS_SQL,
    # iterative min-label propagation (operators/graph.py) checked
    # against a recursive-CTE transitive closure over the SAME edge SQL
    "dedup_clusters": f"""
        WITH RECURSIVE edges AS ({_EMB_PAIRS_SQL}),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION
          SELECT idb AS a, ida AS b FROM edges),
        comp(node, label) AS (
          SELECT DISTINCT a, a FROM und
          UNION
          SELECT und.a, comp.label FROM und JOIN comp ON comp.node = und.b)
        SELECT node, min(label) AS cluster FROM comp GROUP BY node
    """,
    "sessionize": """
        WITH d AS (
          SELECT user_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS new_s
          FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM d GROUP BY 1
    """,
    "salted_event_type_counts": """
        SELECT event_type, count(*) AS cnt FROM events GROUP BY 1
    """,
    "range_join_event_sessions": """
        WITH e AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        d AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM d),
        sessions AS (
          SELECT user_id, min(ts) AS s_start,
                 max(ts) + INTERVAL '30 minutes' AS s_end,
                 count(*) AS session_events
          FROM s GROUP BY user_id, sid)
        SELECT e.event_id, e.user_id, sess.s_start, sess.session_events
        FROM e JOIN sessions sess
          ON e.user_id = sess.user_id
         AND e.ts BETWEEN sess.s_start AND sess.s_end
        WHERE e.event_type = 'error'
    """,
    "asof_purchase_last_click": """
        WITH p AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts,
                 max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    "pivot_event_types": """
        SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
               count(*) FILTER (WHERE event_type = 'click') AS click,
               count(*) FILTER (WHERE event_type = 'error') AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS signup,
               count(*) FILTER (WHERE event_type = 'view') AS "view"
        FROM events GROUP BY 1
    """,
    "set_ops_nations": """
        WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
             s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        SELECT 'both' AS tag, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        UNION ALL
        SELECT 'customers_only' AS tag, nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
    """,
    "numeric_profile": """
        SELECT count(l_extendedprice) AS cnt,
               min(l_extendedprice) AS mn,
               max(l_extendedprice) AS mx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75
        FROM lineitem
    """,
    "window_running_totals": """
        SELECT event_id, user_id,
          count(*) OVER w AS running_n,
          CAST(sum(CAST("value" AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "rollup_date_counts": """
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               count(*) AS cnt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (1, 2)
    """,
    "multimodal_blob_meta": """
        SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256_hex
        FROM documents
    """,
    "exact_distinct_users": """
        SELECT count(DISTINCT user_id) AS exact_users FROM events
    """,
    # identical WORD_PATTERN tokenization on both sides (operators/text.py)
    "text_vocab_top_terms": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents),
        v AS (
          SELECT term, count(*) AS term_freq,
                 count(DISTINCT doc_id) AS doc_freq
          FROM toks GROUP BY term)
        SELECT term, term_freq, doc_freq FROM v
        ORDER BY term_freq DESC, term ASC LIMIT 100
    """,
    "text_tfidf_top_terms": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id AS doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT doc, term, tf, doc_freq,
                 CAST(tf * (n_docs - doc_freq + 1) AS BIGINT) AS weight,
                 row_number() OVER (
                   PARTITION BY doc
                   ORDER BY tf * (n_docs - doc_freq + 1) DESC, term ASC) AS rn
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc AS doc_id, term, tf, doc_freq, weight
        FROM scored WHERE rn <= 3
    """,
    "value_deciles": """
        WITH b AS (
          SELECT quantile_cont(value, 0.1) AS b0, quantile_cont(value, 0.2) AS b1,
                 quantile_cont(value, 0.3) AS b2, quantile_cont(value, 0.4) AS b3,
                 quantile_cont(value, 0.5) AS b4, quantile_cont(value, 0.6) AS b5,
                 quantile_cont(value, 0.7) AS b6, quantile_cont(value, 0.8) AS b7,
                 quantile_cont(value, 0.9) AS b8
          FROM events)
        SELECT CAST(
                 (value > b0)::INT + (value > b1)::INT + (value > b2)::INT
               + (value > b3)::INT + (value > b4)::INT + (value > b5)::INT
               + (value > b6)::INT + (value > b7)::INT + (value > b8)::INT + 1
               AS BIGINT) AS decile,
               count(*) AS n, min(value) AS lo, max(value) AS hi
        FROM events, b
        WHERE value IS NOT NULL
        GROUP BY 1
    """,
    "stream_sliding_counts": """
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        w AS (
          SELECT date_trunc('hour', ts) AS w_start, event_type FROM e
          UNION ALL
          SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM e)
        SELECT w_start, count(*) AS cnt,
               count(*) FILTER (
                 WHERE lower(CAST(event_type AS VARCHAR)) IN ('purchase')
               ) AS is_purchase
        FROM w GROUP BY 1
    """,
    # identical md5-prefix permutation hashes as
    # dedup.minhash_signatures_portable — MinHash behind the hash gate
    "minhash_signature_check": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        grams AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shingle
          FROM words)
        SELECT doc_id,
    """ + ",\n".join(
        f"""          min(CAST(CAST(('0x' || substr(md5('{j}:' || shingle), 1, 8))
            AS UBIGINT) AS BIGINT)) AS mh{j}"""
        for j in range(8)
    ) + """
        FROM grams GROUP BY doc_id
    """,
    # full SQL replay of the banded-LSH pipeline: portable signature
    # mins, concat band keys, window bucket cap, candidate self-join,
    # exact-Jaccard verify — stage for stage with minhash_lsh_check
    "minhash_lsh_check": r"""
        WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        grams AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shingle
          FROM words),
        sigs AS (
          SELECT doc_id,
    """ + ",\n".join(
        f"""            min(CAST(CAST(('0x' || substr(md5('{j}:' || shingle), 1, 8))
              AS UBIGINT) AS BIGINT)) AS mh{j}"""
        for j in range(16)
    ) + """
          FROM grams GROUP BY doc_id),
        bandkeys AS (
          SELECT doc_id, band,
            CASE band
    """ + "\n".join(
        "              WHEN {b} THEN {key}".format(
            b=b,
            key=" || '-' || ".join(
                f"CAST(mh{b * 4 + i} AS VARCHAR)" for i in range(4)
            ),
        )
        for b in range(4)
    ) + """
            END AS bucket
          FROM sigs CROSS JOIN (SELECT range AS band FROM range(4)) bs),
        capped AS (
          SELECT doc_id, band, bucket FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz
            FROM bandkeys)
          WHERE bsz <= 100),
        cands AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM capped a JOIN capped b USING (band, bucket)
          WHERE a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS nsh FROM grams GROUP BY 1),
        cmn AS (
          SELECT c.ida, c.idb, count(*) AS common
          FROM cands c
          JOIN grams ga ON ga.doc_id = c.ida
          JOIN grams gb ON gb.doc_id = c.idb AND gb.shingle = ga.shingle
          GROUP BY 1, 2)
        SELECT ida, idb,
               CAST(common AS DOUBLE)
                 / CAST(sa.nsh + sb.nsh - common AS DOUBLE) AS jaccard
        FROM cmn
        JOIN sizes sa ON sa.doc_id = ida
        JOIN sizes sb ON sb.doc_id = idb
        WHERE CAST(common AS DOUBLE)
                / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5
    """,
    # portable SimHash: same md5-prefix token hash, signed votes, and
    # bit reassembly as dedup.simhash_portable
    "simhash_signature_check": r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
          FROM documents WHERE trim(text) <> ''),
        words AS (
          SELECT doc_id, w, count(*) AS cnt FROM toks GROUP BY 1, 2),
        h AS (
          SELECT doc_id, cnt,
                 CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT)
                      AS BIGINT) AS hv
          FROM words),
        v AS (
          SELECT doc_id,
    """ + ",\n".join(
        f"""            sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS v{b}"""
        for b in range(32)
    ) + """
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST(
    """ + " +\n".join(
        f"""          (CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"""
        for b in range(32)
    ) + """
        AS BIGINT) AS simhash32
        FROM v
    """,
    "contamination_hits": r"""
        WITH docs AS (
          SELECT doc_id, text,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc' AS held
          FROM documents),
        words AS (
          SELECT doc_id, held, regexp_split_to_array(trim(text), '\s+') AS w
          FROM docs WHERE trim(text) <> ''),
        grams0 AS (
          SELECT doc_id, held, unnest(list_distinct(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shingle
          FROM words),
        keep AS (
          SELECT shingle FROM grams0 GROUP BY shingle
          HAVING count(*) <= least(500,
            greatest(5, (SELECT count(*) FROM documents) // 10))),
        grams AS (SELECT g.* FROM grams0 g JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS nsh FROM grams GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS common
          FROM grams a JOIN grams b USING (shingle)
          WHERE NOT a.held AND b.held GROUP BY 1, 2),
        j AS (
          SELECT ida, idb,
            CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = ida
          JOIN sizes sb ON sb.doc_id = idb
          WHERE CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5)
        SELECT ida AS doc_id, idb AS contaminant_id, jaccard FROM (
          SELECT *, row_number() OVER (
            PARTITION BY ida ORDER BY jaccard DESC, idb ASC) AS rn
          FROM j)
        WHERE rn = 1
    """,
    "doc_chunks": r"""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents WHERE trim(text) <> ''),
        c AS (
          SELECT doc_id, toks,
                 unnest(range(CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_id
          FROM d)
        SELECT doc_id, chunk_id,
               array_to_string(
                 list_slice(toks, chunk_id * 64 + 1, chunk_id * 64 + 64),
                 ' ') AS chunk_text,
               CAST(len(list_slice(toks, chunk_id * 64 + 1, chunk_id * 64 + 64))
                    AS BIGINT) AS n_tokens
        FROM c
    """,
    "source_quality_report": r"""
        WITH s AS (
          SELECT source, lang,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
            len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
            CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) AS alpha_ratio
          FROM documents)
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(*) FILTER (WHERE n_tokens BETWEEN 5 AND 10000
                                  AND stop_hits >= 1
                                  AND alpha_ratio >= 0.5) AS n_quality,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens
        FROM s GROUP BY source
    """,
    "jsonl_source_profile": f"""
        SELECT count(*) AS n_rows, count(text) AS text_populated,
               count(lang) AS lang_populated,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM read_json('{_JSONL_FIXTURE}', format='newline_delimited',
                       columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
                                 'lang': 'VARCHAR'}})
    """,
    "numeric_outliers_iqr": """
        WITH b AS (
          SELECT quantile_cont(value, 0.25) AS q1,
                 quantile_cont(value, 0.75) AS q3
          FROM events),
        bounds AS (
          SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
          FROM b)
        SELECT count(*) AS n_outliers, min(value) AS min_out,
               max(value) AS max_out
        FROM events, bounds
        WHERE value < lo OR value > hi
    """,
    "quantiles_by_event_type": """
        SELECT event_type, count(*) AS n,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.5) AS q2,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY 1
    """,
    "dwca_orphan_multimedia": f"""
        SELECT count(*) AS orphan_count
        FROM read_csv('{_DWCA_FIXTURE}/multimedia.txt',
                      header=true, delim='\t', quote='', all_varchar=true) e
        LEFT JOIN (
          SELECT id FROM read_csv(
            ['{_DWCA_FIXTURE}/occurrence_1.txt',
             '{_DWCA_FIXTURE}/occurrence_2.txt'],
            header=true, delim='\t', quote='', all_varchar=true,
            null_padding=true)) c
        ON e.coreid = c.id
        WHERE c.id IS NULL
    """,
    "user_event_sequences": """
        SELECT user_id, count(*) AS n_events,
               string_agg(event_type, ','
                          ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST,
                                   event_id NULLS FIRST) AS seq
        FROM events GROUP BY 1
    """,
    # composed three-stage pipeline, one oracle: quality gate (same
    # expressions as text_quality), fingerprint keeper window (same md5
    # normalization as dedup_fingerprint), md5 sample threshold 0.5
    "training_corpus_prep": r"""
        WITH q AS (
          SELECT doc_id,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
            len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
            CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) AS alpha_ratio,
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
          FROM documents),
        f AS (
          SELECT * FROM q
          WHERE n_tokens BETWEEN 5 AND 10000 AND stop_hits >= 1
            AND alpha_ratio >= 0.5),
        k AS (
          SELECT doc_id, fingerprint, n_tokens,
                 row_number() OVER (
                   PARTITION BY fingerprint ORDER BY doc_id) AS rn
          FROM f)
        SELECT doc_id, fingerprint, n_tokens FROM k
        WHERE rn = 1
          AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
    """,
    # exact SQL replay of the count-min pipeline: same md5-mod buckets
    # (operators/sketch.py), cell sums, and min-over-rows estimate
    "cms_event_type_counts": """
        WITH ex AS (
          SELECT event_type, count(*) AS exact_cnt
          FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        js AS (SELECT range AS j FROM range(4)),
        kb AS (
          SELECT ex.event_type, js.j,
                 CAST(CAST(('0x' || substr(
                     md5(CAST(js.j AS VARCHAR) || ':' || ex.event_type),
                     1, 8)) AS UBIGINT) % 8 AS BIGINT) AS bucket
          FROM ex CROSS JOIN js),
        cells AS (
          SELECT kb.j, kb.bucket, CAST(sum(e2.exact_cnt) AS BIGINT) AS cnt
          FROM kb JOIN ex e2 USING (event_type) GROUP BY 1, 2),
        est AS (
          SELECT kb.event_type, min(cells.cnt) AS cms_est
          FROM kb JOIN cells ON kb.j = cells.j AND kb.bucket = cells.bucket
          GROUP BY 1)
        SELECT ex.event_type, ex.exact_cnt, est.cms_est
        FROM ex JOIN est USING (event_type)
    """,
    # same md5 threshold/ordering as operators/sampling.py — md5 hex is
    # engine-portable, so the sample is checked value-for-value
    "sample_hash_events": """
        SELECT count(*) AS sampled_rows,
               count(DISTINCT user_id) AS sampled_users,
               min(event_id) AS min_event_id, max(event_id) AS max_event_id
        FROM events
        WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '19999999'
    """,
    "sample_stratified_events": """
        SELECT event_type, event_id, sample_rank FROM (
          SELECT event_type, event_id,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                              NULLS FIRST,
                            event_id NULLS FIRST) AS sample_rank
          FROM events)
        WHERE sample_rank <= 20
    """,
    # the parse expression is GENERATED from functions/dates.py's format
    # table — the Spark parser and this oracle cannot drift apart
    "date_multiformat_parse": f"""
        WITH base AS (
          SELECT event_id % 5 AS fmt_bucket,
                 CAST(year(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS y,
                 CAST(month(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS m,
                 CAST(day(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS d
          FROM events),
        rendered AS (
          SELECT fmt_bucket,
            CASE fmt_bucket
              WHEN 0 THEN y || '-' || lpad(m, 2, '0') || '-' || lpad(d, 2, '0')
              WHEN 1 THEN m || '/' || d || '/' || y
              WHEN 2 THEN y || lpad(m, 2, '0') || lpad(d, 2, '0')
              WHEN 3 THEN y || '/' || m || '/' || d
              ELSE 'not a date'
            END AS raw
          FROM base),
        parsed AS (
          SELECT fmt_bucket, {multiformat_oracle_sql('raw')} AS p FROM rendered)
        SELECT fmt_bucket, count(*) AS total, count(p) AS parsed_cnt,
               min(p) AS min_ts, max(p) AS max_ts
        FROM parsed GROUP BY fmt_bucket
    """,
    "dwca_archive_profile": f"""
        WITH core AS (
          SELECT * FROM read_csv(
            ['{_DWCA_FIXTURE}/occurrence_1.txt',
             '{_DWCA_FIXTURE}/occurrence_2.txt'],
            header=true, delim='\t', quote='', all_varchar=true,
            null_padding=true)),
        ext AS (
          SELECT * FROM read_csv('{_DWCA_FIXTURE}/multimedia.txt',
            header=true, delim='\t', quote='', all_varchar=true)),
        core_agg AS (
          SELECT count(*) AS record_count,
                 count(DISTINCT occurrenceID) AS occ_id_distinct,
                 count(scientificName) AS sci_name_populated,
                 count(*) - count(eventDate) AS event_date_null,
                 count(*) FILTER (
                   WHERE try_cast(decimalLatitude AS DOUBLE)
                         BETWEEN -90.0 AND 90.0) AS lat_valid,
                 count(*) FILTER (
                   WHERE lower(basisOfRecord) NOT IN ({_BOR_SQL}))
                   AS bor_unrecognised,
                 min('AU') AS country_default
          FROM core),
        ext_agg AS (
          SELECT count(*) AS ext_rows,
                 count(DISTINCT coreid) AS ext_core_ids
          FROM ext),
        ev AS (
          SELECT * FROM read_csv('{_DWCA_EVENT_FIXTURE}/event.txt',
            header=true, delim='\t', quote='', all_varchar=true)),
        ev_occ AS (
          SELECT * FROM read_csv(
            '{_DWCA_EVENT_FIXTURE}/occurrence.txt',
            header=true, delim='\t', quote='', all_varchar=true)),
        ev_agg AS (
          SELECT count(*) AS ev_record_count,
                 (SELECT count(*) FROM ev_occ) AS ev_ext_rows,
                 count(eventDate) AS ev_temporal,
                 count(decimalLatitude) - count(*) FILTER (
                   WHERE try_cast(decimalLatitude AS DOUBLE)
                         BETWEEN -90.0 AND 90.0) AS ev_lat_invalid,
                 count(DISTINCT year(try_cast(eventDate AS DATE)))
                   AS ev_year_classes,
                 (SELECT count(*) FROM ev_occ o
                  WHERE NOT EXISTS (
                    SELECT 1 FROM ev e WHERE e.id = o.coreid))
                   AS ev_orphan_ext
          FROM ev)
        SELECT * FROM core_agg CROSS JOIN ext_agg CROSS JOIN ev_agg
    """,
    "text_repetition": r"""
        WITH nz AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
        l0 AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM nz),
        lc AS (SELECT doc_id, line, count(*) AS c FROM l0 GROUP BY 1, 2),
        lagg AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_lines,
                 CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                   AS dup_line_frac,
                 CAST(sum(length(line) * (c - 1)) AS DOUBLE)
                   / greatest(CAST(sum(length(line) * c) AS DOUBLE), 1)
                   AS dup_line_char_frac
          FROM lc GROUP BY 1),
        w0 AS (SELECT doc_id,
                      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
               FROM nz),
        wc AS (SELECT doc_id, w, count(*) AS c FROM w0 GROUP BY 1, 2),
        wagg AS (SELECT doc_id,
                        CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                          AS top_word_frac
                 FROM wc GROUP BY 1)
        SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
               w.top_word_frac
        FROM lagg l LEFT JOIN wagg w ON l.doc_id = w.doc_id
    """,
}


def _pii_oracle_sql() -> str:
    """Generated from operators.text.PII_PATTERNS — the same constants
    the Spark scrubber folds into its plan — so the two can never
    drift (same policy as functions/dates.multiformat_oracle_sql)."""
    counts = ", ".join(
        f"CAST(coalesce(len(regexp_extract_all(text, '{pat}')), 0) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in text.PII_PATTERNS
    )
    scrub = "text"
    for _, pat, repl in text.PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {counts}, {scrub} AS scrubbed FROM documents"


ORACLES["pii_scrub_stats"] = _pii_oracle_sql()

# Sequence packing: replay the md5 bucket, the id-ordered running token
# offset, and floor(offset/budget) — the whole assignment, not just the
# shape.  Token expression is the shared whitespace-count twin from
# text_token_stats.
ORACLES["sequence_packing_stats"] = r"""
    WITH t AS (
      SELECT doc_id,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 8 AS BIGINT) AS pack_bucket
      FROM documents),
    p AS (
      SELECT pack_bucket, n_tokens,
        CAST(COALESCE(sum(n_tokens) OVER (
          PARTITION BY pack_bucket ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS start_offset
      FROM t),
    seqs AS (
      SELECT pack_bucket,
             CAST(floor(start_offset / 128.0) AS BIGINT) AS pack_seq,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
      FROM p GROUP BY 1, 2)
    SELECT pack_bucket,
           count(*) AS n_seqs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
           max(seq_tokens / 128.0) AS max_fill,
           avg(seq_tokens / 128.0) AS avg_fill
    FROM seqs GROUP BY 1
"""


def _mixture_oracle_sql() -> str:
    """Thresholds GENERATED from the same _MIXTURE dict +
    ``sampling.hash_threshold`` the Spark query uses — the two sides
    cannot drift."""
    arms = " ".join(
        f"WHEN '{s}' THEN '{sampling.hash_threshold(f)}'"
        for s, f in sorted(_MIXTURE.items())
    )
    default = sampling.hash_threshold(0.0)
    return f"""
        SELECT source, count(*) AS sampled_docs,
               min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
               CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE source {arms} ELSE '{default}' END
        GROUP BY 1
    """


ORACLES["mixture_sample_stats"] = _mixture_oracle_sql()

def _quality_model_oracle_sql() -> str:
    """Feature SQL + logit arithmetic GENERATED from
    ``text.QUALITY_MODEL_WEIGHTS`` in the same fixed evaluation order
    as the Spark expression tree — IEEE +,*,/ only, so the doubles are
    bit-identical and the weights cannot drift between engines."""
    feats = {
        "alpha_ratio": (
            "CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))"
            " AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)"
        ),
        "stopword_frac": (
            f"CAST(len(regexp_extract_all(text, '{text.EN_STOPWORDS}')) AS DOUBLE)"
            " / CAST(greatest(n_tokens, 1) AS DOUBLE)"
        ),
        "len_norm": "CAST(least(n_tokens, 1000) AS DOUBLE) / 1000.0",
    }
    logit = f"({text.QUALITY_MODEL_INTERCEPT!r})"
    for name, w in text.QUALITY_MODEL_WEIGHTS:
        logit = f"({logit} + ({w!r} * {name}))"
    cols = ", ".join(name for name, _ in text.QUALITY_MODEL_WEIGHTS)
    feat_sql = ", ".join(f"{expr} AS {name}" for name, expr in feats.items())
    return rf"""
        WITH s AS (
          SELECT doc_id, text,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          FROM documents),
        f AS (SELECT doc_id, {feat_sql} FROM s)
        SELECT doc_id, {cols},
               {logit} AS quality_logit,
               {logit} > 0.0 AS quality_pred
        FROM f
    """


ORACLES["quality_model_scores"] = _quality_model_oracle_sql()

# Every stage of the composed pipeline replayed in one WITH chain:
# quality gate -> fingerprint dedup -> 50% hash sample (the
# training_corpus_prep oracle) -> md5 pack bucket -> running offset ->
# sequence assignment -> per-bucket stats (the sequence_packing oracle).
ORACLES["corpus_pack_end_to_end"] = r"""
    WITH q AS (
      SELECT doc_id,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
        CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1) AS alpha_ratio,
        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      FROM documents),
    f AS (
      SELECT * FROM q
      WHERE n_tokens BETWEEN 5 AND 10000 AND stop_hits >= 1
        AND alpha_ratio >= 0.5),
    k AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (
               PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM f),
    corpus AS (
      SELECT doc_id, n_tokens FROM k
      WHERE rn = 1
        AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'),
    b AS (
      SELECT doc_id, n_tokens,
        CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 4 AS BIGINT) AS pack_bucket
      FROM corpus),
    p AS (
      SELECT pack_bucket, n_tokens,
        CAST(COALESCE(sum(n_tokens) OVER (
          PARTITION BY pack_bucket ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS start_offset
      FROM b),
    seqs AS (
      SELECT pack_bucket,
             CAST(floor(start_offset / 128.0) AS BIGINT) AS pack_seq,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
      FROM p GROUP BY 1, 2)
    SELECT pack_bucket,
           count(*) AS n_seqs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
           max(seq_tokens / 128.0) AS max_fill,
           avg(seq_tokens / 128.0) AS avg_fill
    FROM seqs GROUP BY 1
"""

ORACLES["embedding_quantization"] = """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings)
    SELECT vec_id,
           len(embedding) AS dim,
           array_to_string(
             CASE WHEN scale = 0.0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5)
                                 AS BIGINT)) END, ',') AS qvec_str,
           scale
    FROM s
"""

ORACLES["shard_assignment_stats"] = """
    WITH s AS (
      SELECT user_id,
        CAST(CAST(CONCAT('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 16 AS BIGINT) AS shard,
        md5(CAST(event_id AS VARCHAR)) AS shard_pos
      FROM events)
    SELECT shard, count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           min(shard_pos) AS first_pos
    FROM s GROUP BY 1
"""


# --- round-5 additions (append-only: driver window stability, ADVICE #5) ---


def ann_ivf_trained_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-oracle twin of the trained-IVF path
    (operators/similarity.py ``ivf_trained_check``): deterministic
    seeded init + one integer-arithmetic Lloyd iteration, every step
    SQL-replayable — verifies quantizer TRAINING and assignment
    value-for-value (``ann_ivf_trained`` itself stays rows-only: MLlib
    k-means float reductions aren't order-free)."""
    from ..operators.similarity import ivf_trained_check as _check

    return _check(load_table(spark, sf_dir, "embeddings"))


def multimodal_frame_sample_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-offset oracle for the row-expanding frame sampler
    (operators/multimodal.py ``sample_frames``): the stub's frame
    count (1 + len%4), stride (max(1, len//n)) and 16-byte slices are
    pure byte arithmetic, so DuckDB can replay them on the hex form of
    the UTF-8 blob (this DuckDB build has no BLOB substr; a byte slice
    [a, a+16) is hex chars [2a+1, 2a+32]) — value-exact including the
    frame payloads, compared as uppercase hex on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(
        multimodal.attach_text_blob(docs), fake=True
    )
    return frames.select(
        "id", "frame_idx", F.hex("frame_bytes").alias("frame_hex")
    )


def packed_sequences_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export manifest (operators/packing.py
    ``materialize_sequences``): the per-sequence document composition
    the shard writer consumes — same 128-token / 8-bucket packing as
    ``sequence_packing_stats``, now materialized per sequence with
    stream-ordered doc-id and token-count lists (csv strings for
    engine-portable comparison).  Exact oracle: the same md5 bucket +
    running offset replay, grouped with ``string_agg(... ORDER BY
    doc_id)``."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )
    packed = packing.pack_sequences(
        docs, "doc_id", "n_tokens", seq_budget=128, n_buckets=8
    )
    return packing.materialize_sequences(packed, "doc_id", "n_tokens")


def ann_pq_adc_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (operators/similarity.py
    ``pq_adc_check``): per-subspace codebook fit (seeded init + one
    integer-grid Lloyd step), encode, LUT-based approximate top-k —
    the entire PQ pipeline behind an exact DuckDB oracle via the same
    integer-arithmetic recipe as ``ann_ivf_trained_check``."""
    from ..operators.similarity import pq_adc_check as _check

    return _check(load_table(spark, sf_dir, "embeddings"))


def global_duplicate_user_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide ID-uniqueness report (operators/integrity.py
    ``global_duplicate_ids``) — the cross-slice companion to the
    incremental validation sink: per-slice reports can never see an ID
    repeated ACROSS slices (``merge_df_reports`` contract), so this one
    global pass closes that gap.  Demonstrated on the deliberately
    duplicate-heavy ``events.user_id``."""
    from ..operators.integrity import global_duplicate_ids

    return global_duplicate_ids(
        load_table(spark, sf_dir, "events"), "user_id"
    )


QUERIES["ann_ivf_trained_check"] = ann_ivf_trained_check
QUERIES["multimodal_frame_sample_check"] = multimodal_frame_sample_check
QUERIES["packed_sequences_manifest"] = packed_sequences_manifest
QUERIES["ann_pq_adc_check"] = ann_pq_adc_check
QUERIES["global_duplicate_user_ids"] = global_duplicate_user_ids

ORACLES["global_duplicate_user_ids"] = """
    WITH pv AS (
      SELECT CAST(user_id AS VARCHAR) AS idv, count(*) AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    d AS (SELECT * FROM pv WHERE n > 1),
    stats AS (
      SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS duplicate_rows,
             count(*) AS duplicated_values,
             CAST(COALESCE(sum(n), 0) - count(*) AS BIGINT)
               AS duplicate_error_count
      FROM d),
    smp AS (
      SELECT COALESCE(string_agg(idv, ',' ORDER BY idv), '')
               AS sample_values_csv
      FROM (SELECT idv FROM d ORDER BY idv LIMIT 10))
    SELECT * FROM stats, smp
"""

# PQ replay: subspace = pos//16; per-subspace seeded init + one Lloyd
# step on the integer grid; encode = per-subspace argmin; ADC = sum of
# per-(query, subspace, code) integer LUT entries.  Same constants as
# operators/similarity.pq_adc_check (8 codes, 4 subspaces of 16 dims,
# scale 1000, seed 'pq5:', queries = md5 ranks 9-16, k=3, slice capped
# at the 200 smallest md5 ranks).
ORACLES["ann_pq_adc_check"] = """
    WITH sub AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5('pq5:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM embeddings
      QUALIFY rn <= 200),
    ex AS (
      SELECT vec_id, rn,
             CAST((r.i - 1) // 16 AS INT) AS ss,
             CAST(r.i - 1 AS INT) AS pos,
             CAST(floor(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) * 1000
                        + 0.5) AS BIGINT) AS qd
      FROM sub, range(1, 65) r(i)),
    cent0 AS (
      SELECT CAST(rn - 1 AS INT) AS code, ss, pos, qd AS cd
      FROM ex WHERE rn <= 8),
    a0 AS (
      SELECT e.vec_id, e.ss, c.code,
             sum((e.qd - c.cd) * (e.qd - c.cd)) AS d0
      FROM ex e JOIN cent0 c ON e.ss = c.ss AND e.pos = c.pos
      GROUP BY 1, 2, 3),
    asg0 AS (
      SELECT vec_id, ss, code FROM a0
      QUALIFY row_number() OVER (PARTITION BY vec_id, ss
                                 ORDER BY d0, code) = 1),
    s AS (
      SELECT a.ss, a.code, e.pos,
             CAST(sum(e.qd) AS BIGINT) AS sq, count(*) AS n
      FROM asg0 a JOIN ex e ON a.vec_id = e.vec_id AND a.ss = e.ss
      GROUP BY 1, 2, 3),
    m AS (
      SELECT ss, code, pos,
             CAST(floor(CAST(sq AS DOUBLE) * 1000 / n + 0.5) AS BIGINT)
               AS md
      FROM s),
    encd AS (
      SELECT e.vec_id, e.ss, m.code,
             sum((e.qd * 1000 - m.md) * (e.qd * 1000 - m.md)) AS d1
      FROM ex e JOIN m ON e.ss = m.ss AND e.pos = m.pos
      GROUP BY 1, 2, 3),
    enc AS (
      SELECT vec_id, ss, code FROM encd
      QUALIFY row_number() OVER (PARTITION BY vec_id, ss
                                 ORDER BY d1, code) = 1),
    q AS (
      SELECT vec_id AS query_id, ss, pos, qd
      FROM ex WHERE rn > 8 AND rn <= 16),
    lut AS (
      SELECT q.query_id, m.ss, m.code,
             sum((q.qd * 1000 - m.md) * (q.qd * 1000 - m.md)) AS ld
      FROM q JOIN m ON q.ss = m.ss AND q.pos = m.pos
      GROUP BY 1, 2, 3),
    adc AS (
      SELECT l.query_id, e.vec_id AS neighbor_id,
             CAST(sum(l.ld) AS BIGINT) AS d2_pq
      FROM enc e JOIN lut l ON e.ss = l.ss AND e.code = l.code
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, d2_pq
    FROM (
      SELECT query_id, neighbor_id, d2_pq,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2_pq, neighbor_id) AS rnk
      FROM adc WHERE query_id != neighbor_id)
    WHERE rnk <= 3
"""

ORACLES["packed_sequences_manifest"] = r"""
    WITH b AS (
      SELECT doc_id,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 8 AS BIGINT) AS pack_bucket
      FROM documents),
    p AS (
      SELECT doc_id, n_tokens, pack_bucket,
        CAST(COALESCE(sum(n_tokens) OVER (
          PARTITION BY pack_bucket ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS start_offset
      FROM b)
    SELECT pack_bucket,
           CAST(floor(start_offset / 128.0) AS BIGINT) AS pack_seq,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS doc_ids_csv,
           string_agg(CAST(n_tokens AS VARCHAR), ',' ORDER BY doc_id)
             AS token_counts_csv
    FROM p GROUP BY 1, 2
"""

# Trained-IVF replay: md5-seeded subset + init, element quantization to
# the integer grid, integer distances, one Lloyd mean re-floored to the
# grid — the same constants as operators/similarity.ivf_trained_check
# (n_take=200, n_cells=8, dim=16, scale=1000, seed 'ivf5:').
ORACLES["ann_ivf_trained_check"] = """
    WITH sub AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5('ivf5:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM embeddings
      QUALIFY rn <= 200),
    ex AS (
      SELECT vec_id, rn, CAST(r.i - 1 AS INT) AS pos,
             CAST(floor(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) * 1000
                        + 0.5) AS BIGINT) AS qd
      FROM sub, range(1, 17) r(i)),
    cent0 AS (
      SELECT CAST(rn - 1 AS INT) AS cell, pos, qd AS cd
      FROM ex WHERE rn <= 8),
    a0 AS (
      SELECT e.vec_id, c.cell,
             CAST(sum((e.qd - c.cd) * (e.qd - c.cd)) AS BIGINT) AS d0
      FROM ex e JOIN cent0 c USING (pos) GROUP BY 1, 2),
    assign0 AS (
      SELECT vec_id, cell AS cell_init FROM a0
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d0, cell) = 1),
    s AS (
      SELECT a.cell_init, e.pos,
             CAST(sum(e.qd) AS BIGINT) AS sq, count(*) AS n
      FROM assign0 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
    m AS (
      SELECT cell_init AS cell, pos,
             CAST(floor(CAST(sq AS DOUBLE) * 1000 / n + 0.5) AS BIGINT)
               AS md
      FROM s),
    a1 AS (
      SELECT e.vec_id, m.cell,
             CAST(sum((e.qd * 1000 - m.md) * (e.qd * 1000 - m.md))
                  AS BIGINT) AS d1
      FROM ex e JOIN m USING (pos) GROUP BY 1, 2)
    SELECT a.vec_id, a0.cell_init, CAST(a.cell AS INT) AS cell_final,
           a.d1 AS d2_scaled
    FROM a1 a JOIN assign0 a0 USING (vec_id)
    QUALIFY row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY a.d1, a.cell) = 1
"""

# Frame-sampler replay: n = 1 + len%4, step = max(1, len//n), frame f
# is bytes [f*step, f*step+16) — byte arithmetic replayed on the hex
# string of the UTF-8 blob (2 hex chars per byte).
ORACLES["multimodal_frame_sample_check"] = """
    WITH b AS (
      SELECT doc_id AS id, encode(text) AS blob
      FROM documents WHERE text IS NOT NULL),
    p AS (
      SELECT id, hex(blob) AS h, octet_length(blob) AS n_bytes,
             1 + octet_length(blob) % 4 AS n_frames
      FROM b),
    s AS (
      SELECT id, h, n_frames,
             CASE WHEN n_bytes // n_frames < 1 THEN 1
                  ELSE n_bytes // n_frames END AS step
      FROM p)
    SELECT s.id, CAST(r.i AS INT) AS frame_idx,
           substr(h, r.i * step * 2 + 1, 32) AS frame_hex
    FROM s, range(0, 4) r(i)
    WHERE r.i < n_frames
"""


# --------------------------------------------------------------------------
# round-6 additions (append-only)
# --------------------------------------------------------------------------

def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-ranking (operators/similarity.py
    ``ivfpq_check``) — the composed production ANN architecture:
    coarse quantizer (seeded init + one integer-grid Lloyd step)
    routes each query to its cell, PQ-ADC integer lookup tables
    shortlist within the cell, and an exact integer d² re-ranks the
    shortlist.  Every stage replays in ANSI SQL, so the full composed
    pipeline — training, encoding, shortlisting, re-ranking — sits
    behind the exact value-hash gate."""
    from ..operators.similarity import ivfpq_check as _check

    return _check(load_table(spark, sf_dir, "embeddings"))


QUERIES["ann_ivfpq_topk"] = ann_ivfpq_topk

# IVF-PQ replay: coarse cells per ann_ivf_trained_check (4 cells, one
# Lloyd step), PQ codebooks per ann_pq_adc_check (8 codes, 4 subspaces
# of 4 dims), ADC shortlist of 10 within the query's cell, exact
# integer re-rank to k=3.  Constants mirror
# operators/similarity.ivfpq_check (n_take=200, dim=16, scale=1000,
# seed 'ivfpq6:', queries = md5 ranks 9-16).
ORACLES["ann_ivfpq_topk"] = """
    WITH sub AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5('ivfpq6:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM embeddings
      QUALIFY rn <= 200),
    ex AS (
      SELECT vec_id, rn,
             CAST(r.i - 1 AS INT) AS pos,
             CAST((r.i - 1) // 4 AS INT) AS ss,
             CAST(floor(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) * 1000
                        + 0.5) AS BIGINT) AS qd
      FROM sub, range(1, 17) r(i)),
    cent0 AS (
      SELECT CAST(rn - 1 AS INT) AS cell, pos, qd AS cd
      FROM ex WHERE rn <= 4),
    a0 AS (
      SELECT e.vec_id, c.cell,
             sum((e.qd - c.cd) * (e.qd - c.cd)) AS d0
      FROM ex e JOIN cent0 c USING (pos) GROUP BY 1, 2),
    assign0 AS (
      SELECT vec_id, cell AS cell_init FROM a0
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d0, cell) = 1),
    cs AS (
      SELECT a.cell_init, e.pos,
             CAST(sum(e.qd) AS BIGINT) AS sq, count(*) AS n
      FROM assign0 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
    cm AS (
      SELECT cell_init AS cell, pos,
             CAST(floor(CAST(sq AS DOUBLE) * 1000 / n + 0.5) AS BIGINT)
               AS md
      FROM cs),
    a1 AS (
      SELECT e.vec_id, cm.cell,
             sum((e.qd * 1000 - cm.md) * (e.qd * 1000 - cm.md)) AS d1
      FROM ex e JOIN cm USING (pos) GROUP BY 1, 2),
    assignf AS (
      SELECT vec_id, cell AS cell_final FROM a1
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d1, cell) = 1),
    pcent0 AS (
      SELECT CAST(rn - 1 AS INT) AS code, ss, pos, qd AS cd
      FROM ex WHERE rn <= 8),
    pa0 AS (
      SELECT e.vec_id, e.ss, c.code,
             sum((e.qd - c.cd) * (e.qd - c.cd)) AS d0
      FROM ex e JOIN pcent0 c ON e.ss = c.ss AND e.pos = c.pos
      GROUP BY 1, 2, 3),
    pasg0 AS (
      SELECT vec_id, ss, code FROM pa0
      QUALIFY row_number() OVER (PARTITION BY vec_id, ss
                                 ORDER BY d0, code) = 1),
    ps AS (
      SELECT a.ss, a.code, e.pos,
             CAST(sum(e.qd) AS BIGINT) AS sq, count(*) AS n
      FROM pasg0 a JOIN ex e ON a.vec_id = e.vec_id AND a.ss = e.ss
      GROUP BY 1, 2, 3),
    pm AS (
      SELECT ss, code, pos,
             CAST(floor(CAST(sq AS DOUBLE) * 1000 / n + 0.5) AS BIGINT)
               AS md
      FROM ps),
    encd AS (
      SELECT e.vec_id, e.ss, pm.code,
             sum((e.qd * 1000 - pm.md) * (e.qd * 1000 - pm.md)) AS d1
      FROM ex e JOIN pm ON e.ss = pm.ss AND e.pos = pm.pos
      GROUP BY 1, 2, 3),
    enc AS (
      SELECT vec_id, ss, code FROM encd
      QUALIFY row_number() OVER (PARTITION BY vec_id, ss
                                 ORDER BY d1, code) = 1),
    q AS (
      SELECT vec_id AS query_id, ss, pos, qd
      FROM ex WHERE rn > 8 AND rn <= 16),
    lut AS (
      SELECT q.query_id, pm.ss, pm.code,
             sum((q.qd * 1000 - pm.md) * (q.qd * 1000 - pm.md)) AS ld
      FROM q JOIN pm ON q.ss = pm.ss AND q.pos = pm.pos
      GROUP BY 1, 2, 3),
    qc AS (
      SELECT qq.query_id, af.cell_final AS qcell
      FROM (SELECT DISTINCT query_id FROM q) qq
      JOIN assignf af ON af.vec_id = qq.query_id),
    cand AS (
      SELECT qc.query_id, af.vec_id AS neighbor_id
      FROM qc JOIN assignf af ON af.cell_final = qc.qcell
      WHERE af.vec_id != qc.query_id),
    adc AS (
      SELECT c.query_id, c.neighbor_id, CAST(sum(l.ld) AS BIGINT) AS d2_pq
      FROM cand c
      JOIN enc e ON e.vec_id = c.neighbor_id
      JOIN lut l ON l.query_id = c.query_id
                AND l.ss = e.ss AND l.code = e.code
      GROUP BY 1, 2),
    sl AS (
      SELECT query_id, neighbor_id, d2_pq FROM adc
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY d2_pq, neighbor_id) <= 10),
    rr AS (
      SELECT s.query_id, s.neighbor_id, s.d2_pq,
             CAST(sum((a.qd - b.qd) * (a.qd - b.qd)) AS BIGINT) AS d2_exact
      FROM sl s
      JOIN ex a ON a.vec_id = s.query_id
      JOIN ex b ON b.vec_id = s.neighbor_id AND b.pos = a.pos
      GROUP BY 1, 2, 3)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank,
           d2_exact, d2_pq
    FROM (
      SELECT query_id, neighbor_id, d2_exact, d2_pq,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2_exact, neighbor_id) AS rnk
      FROM rr)
    WHERE rnk <= 3
"""


def dedup_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters over TRAINED quantizer cells sized to
    the corpus (operators/similarity.py ``trained_cells`` with
    ``n_cells = max(8, n/50)``) — the scale-safe form of
    ``dedup_clusters``: that entry blocks on the table's 10 fixed
    ``label`` cells, which the round-5 10× spot-check measured
    quadratic (BASELINE.md finding 2); here cell count grows with the
    corpus so within-cell pair work stays linear.  The deterministic
    integer-grid fit makes the trained cells — and therefore the final
    cluster assignment — replayable in DuckDB, so the 100 TB path and
    the benched/oracled query are the same code."""
    from ..operators import graph

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = max(8, emb.count() // 50)
    # materialize the assigned corpus once: the blocked self-join reads
    # it from both sides, and the component loop again — without this
    # the map-side assignment re-runs per consumer.  At 100 TB the
    # equivalent is writing the assigned corpus to storage (it is the
    # artifact you keep anyway); local mode uses a localCheckpoint.
    cells = similarity.trained_cells(emb, n_cells=n_cells).localCheckpoint()
    pairs = similarity.embedding_dup_pairs(
        cells, threshold=0.4, cell_col="cell"
    )
    return graph.connected_components(pairs)


QUERIES["dedup_clusters_scaled"] = dedup_clusters_scaled

# Trained-cell replay (similarity.trained_cells: md5-seeded init of
# greatest(8, n/50) centroids, one integer-grid Lloyd step, full-corpus
# assignment) + the same double-cosine edge SQL as dedup_embedding_cosine
# blocked on the trained cell, closed with a recursive CTE as in
# dedup_clusters.
ORACLES["dedup_clusters_scaled"] = """
    WITH RECURSIVE nc AS (
      SELECT greatest(8, count(*) // 50) AS k FROM embeddings),
    sub AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5('cells6:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM embeddings),
    ex AS (
      SELECT vec_id, rn, CAST(r.i - 1 AS INT) AS pos,
             CAST(floor(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) * 1000
                        + 0.5) AS BIGINT) AS qd
      FROM sub, range(1, 65) r(i)),
    cent0 AS (
      SELECT CAST(rn - 1 AS INT) AS cell, pos, qd AS cd
      FROM ex, nc WHERE rn <= nc.k),
    a0 AS (
      SELECT e.vec_id, c.cell,
             sum((e.qd - c.cd) * (e.qd - c.cd)) AS d0
      FROM ex e JOIN cent0 c USING (pos) GROUP BY 1, 2),
    assign0 AS (
      SELECT vec_id, cell AS cell0 FROM a0
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d0, cell) = 1),
    cs AS (
      SELECT a.cell0, e.pos,
             CAST(sum(e.qd) AS BIGINT) AS sq, count(*) AS n
      FROM assign0 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
    cm AS (
      SELECT cell0 AS cell, pos,
             CAST(floor(CAST(sq AS DOUBLE) * 1000 / n + 0.5) AS BIGINT)
               AS md
      FROM cs),
    a1 AS (
      SELECT e.vec_id, cm.cell,
             sum((e.qd * 1000 - cm.md) * (e.qd * 1000 - cm.md)) AS d1
      FROM ex e JOIN cm USING (pos) GROUP BY 1, 2),
    assignf AS (
      SELECT vec_id, cell FROM a1
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d1, cell) = 1),
    emb2 AS (
      SELECT e.vec_id, e.embedding, af.cell
      FROM embeddings e JOIN assignf af USING (vec_id)),
    edges AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM emb2 a JOIN emb2 b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(a.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            >= 0.4),
    und AS (
      SELECT ida AS a, idb AS b FROM edges
      UNION
      SELECT idb AS a, ida AS b FROM edges),
    comp(node, label) AS (
      SELECT DISTINCT a, a FROM und
      UNION
      SELECT und.a, comp.label FROM und JOIN comp ON comp.node = und.b)
    SELECT node, min(label) AS cluster FROM comp GROUP BY node
"""


def span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window span-level duplicate report (operators/spans.py):
    every 8-token window of every document is md5-fingerprinted; a
    window is duplicated when its fingerprint occurs ≥ 2 times anywhere
    in the corpus; per-document output counts duplicated windows and
    the EXACT union size of their [pos, pos+8) token intervals.
    Catches the partial duplication (boilerplate, quoted passages)
    that whole-doc fingerprints and MinHash miss.  The md5-over-window
    fingerprint is engine-portable, so the full pipeline — windowing,
    duplication decision, interval merge — is value-checked against
    DuckDB."""
    return spans.duplicated_span_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", w=8
    )


QUERIES["span_dup_stats"] = span_dup_stats

ORACLES["span_dup_stats"] = r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
             END AS n_tokens
      FROM documents),
    tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    grams AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM tok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    occ AS (
      SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS occ
      FROM grams),
    dup AS (
      SELECT doc_id, pos,
             lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM occ WHERE occ >= 2),
    merged AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN nxt IS NULL THEN 8
                           ELSE least(8, nxt - pos) END) AS BIGINT)
               AS dup_tokens
      FROM dup GROUP BY 1)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(greatest(0, b.n_tokens - 8 + 1) AS BIGINT) AS n_windows,
           coalesce(m.n_dup_windows, 0) AS n_dup_windows,
           coalesce(m.dup_tokens, 0) AS dup_tokens
    FROM base b LEFT JOIN merged m USING (doc_id)
"""


def bloom_membership_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter end-to-end (operators/sketch.py): build a k=5,
    m=1024 filter over the 150 distinct event user ids, probe all
    1500 customer keys, and emit the confusion-matrix counts.  m is
    sized small on purpose — ~0.73 set-bit load yields a few percent
    false positives among the 1350 non-member probes, so the oracle
    exercises REAL collisions, and false_negatives = 0 verifies the
    no-false-negative guarantee.  The md5-mod bit positions are
    engine-portable: DuckDB recomputes the exact bitset and the exact
    per-probe verdicts, so even which keys collide is value-checked."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    filt = sketch.bloom_build(ev, "user_id", k=5, m=1024)
    probes = cust.select(F.col("c_custkey").alias("user_id"))
    verdicts = sketch.bloom_contains(filt, probes, "user_id", k=5, m=1024)
    members = (
        ev.select("user_id")
        .filter(F.col("user_id").isNotNull())
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    both = verdicts.join(members, "user_id", "left").select(
        "user_id",
        "bloom_positive",
        F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
    )
    return both.agg(
        F.count(F.lit(1)).alias("probes"),
        F.sum(F.col("is_member").cast("long")).alias("exact_members"),
        F.sum(F.col("bloom_positive").cast("long")).alias("bloom_positives"),
        F.sum(
            (F.col("bloom_positive") & ~F.col("is_member")).cast("long")
        ).alias("false_positives"),
        F.sum(
            (~F.col("bloom_positive") & F.col("is_member")).cast("long")
        ).alias("false_negatives"),
    )


QUERIES["bloom_membership_check"] = bloom_membership_check

# Same md5-prefix bit positions as sketch._bucket (and the CMS oracle):
# '<j>:' || value, first 8 hex chars, mod m.
ORACLES["bloom_membership_check"] = """
    WITH members AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    bits AS (
      SELECT DISTINCT
        CAST(CAST(('0x' || substr(
            md5(CAST(r.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
            1, 8)) AS UBIGINT) % 1024 AS BIGINT) AS pos
      FROM members, range(5) r(j)),
    probes AS (
      SELECT DISTINCT c_custkey AS user_id FROM customer
      WHERE c_custkey IS NOT NULL),
    ppos AS (
      SELECT user_id,
        CAST(CAST(('0x' || substr(
            md5(CAST(r.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
            1, 8)) AS UBIGINT) % 1024 AS BIGINT) AS pos
      FROM probes, range(5) r(j)),
    verdicts AS (
      SELECT p.user_id, count(b.pos) = 5 AS bloom_positive
      FROM ppos p LEFT JOIN bits b USING (pos)
      GROUP BY 1),
    joined AS (
      SELECT v.user_id, v.bloom_positive,
             m.user_id IS NOT NULL AS is_member
      FROM verdicts v LEFT JOIN members m USING (user_id))
    SELECT CAST(count(*) AS BIGINT) AS probes,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_members,
           CAST(sum(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
             AS bloom_positives,
           CAST(sum(CASE WHEN bloom_positive AND NOT is_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           CAST(sum(CASE WHEN is_member AND NOT bloom_positive
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
    FROM joined
"""


def span_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prescreened window-level decontamination
    (operators/pipeline.py ``span_contamination``): the heldout 30%
    split's 8-token-window fingerprints compile to m=65536 bloom bits
    carried IN the probe expression (operators/sketch.py
    ``bloom_pack``/``bloom_test``), the 70% train split is screened
    map-side in one scan, and only bloom-positive windows reach the
    exact verification join.  m is sized to leave a ~1-2% FP rate so
    candidate_windows genuinely exceeds confirmed_windows — the oracle
    replays the md5-grid bloom verdicts and value-checks BOTH counts,
    false positives included."""
    from ..operators.pipeline import span_contamination

    docs = load_table(spark, sf_dir, "documents")
    held = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.3))
    return span_contamination(
        docs.filter(~held), docs.filter(held), w=8, k=5, m=65536
    )


QUERIES["span_contamination_check"] = span_contamination_check

ORACLES["span_contamination_check"] = r"""
    WITH full_t AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc' AS held
      FROM documents),
    tok AS (
      SELECT doc_id, held, regexp_split_to_array(trim(text), '\s+') AS t
      FROM full_t WHERE text IS NOT NULL AND trim(text) <> ''),
    grams AS (
      SELECT doc_id, held,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM tok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    hh AS (SELECT DISTINCT h FROM grams WHERE held),
    -- Kirsch-Mitzenmacher positions from the existing digest: two
    -- 32-bit slices, h2 forced odd, pos_j = (h1 + j*h2) mod m
    bits AS (
      SELECT DISTINCT
        CAST((CAST(('0x' || substr(h, 1, 8)) AS UBIGINT)
              + r.j * (CAST(('0x' || substr(h, 9, 8)) AS UBIGINT) | 1))
             % 65536 AS BIGINT) AS pos
      FROM hh, range(5) r(j)),
    ch AS (SELECT DISTINCT h FROM grams WHERE NOT held),
    cpos AS (
      SELECT h,
        CAST((CAST(('0x' || substr(h, 1, 8)) AS UBIGINT)
              + r.j * (CAST(('0x' || substr(h, 9, 8)) AS UBIGINT) | 1))
             % 65536 AS BIGINT) AS pos
      FROM ch, range(5) r(j)),
    verdict AS (
      SELECT c.h, count(b.pos) = 5 AS bloom_pos
      FROM cpos c LEFT JOIN bits b USING (pos) GROUP BY c.h),
    scr AS (
      SELECT g.doc_id, v.bloom_pos, hh2.h IS NOT NULL AS confirmed
      FROM grams g
      JOIN verdict v USING (h)
      LEFT JOIN hh hh2 ON hh2.h = g.h
      WHERE NOT g.held),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) FILTER (bloom_pos) AS BIGINT)
               AS candidate_windows,
             CAST(count(*) FILTER (bloom_pos AND confirmed) AS BIGINT)
               AS confirmed_windows
      FROM scr GROUP BY 1),
    base AS (
      SELECT doc_id,
             CAST(greatest(0,
               CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END - 8 + 1) AS BIGINT) AS n_windows
      FROM full_t WHERE NOT held)
    SELECT b.doc_id, b.n_windows,
           coalesce(p.candidate_windows, 0) AS candidate_windows,
           coalesce(p.confirmed_windows, 0) AS confirmed_windows
    FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring on the exact integer-log2 grid
    (operators/text.py ``unigram_surprisal``) — the perplexity-filter
    decision signal with floor-log2 quantization instead of
    non-portable ``ln``, so the whole model fit (corpus term counts)
    AND the per-document scores cross the exact value gate."""
    return text.unigram_surprisal(load_table(spark, sf_dir, "documents"))


QUERIES["unigram_surprisal_scores"] = unigram_surprisal_scores

# floor(log2 c) = length of the binary rendering − 1 on both engines
ORACLES["unigram_surprisal_scores"] = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    ct AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.tf,
             tf.tf * ( (length(format('{:b}', tot.n_total)) - 1)
                     - (length(format('{:b}', ct.c)) - 1) ) AS bits
      FROM tf JOIN ct USING (term) CROSS JOIN tot),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             CAST(sum(bits) AS BIGINT) AS surprisal_bits
      FROM scored GROUP BY 1)
    SELECT d.doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.surprisal_bits, 0) AS surprisal_bits,
           CASE WHEN p.n_tokens > 0
                THEN CAST(p.surprisal_bits AS DOUBLE)
                     / CAST(p.n_tokens AS DOUBLE)
           END AS bits_per_token
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def span_scrub_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of span dedup (operators/spans.py
    ``scrub_duplicated_spans``): materialized documents with duplicated
    8-token spans REMOVED — smallest-(doc,pos) occurrence of each
    duplicated window survives, every other occurrence's interval is
    stripped.  The CLEAN TEXT itself crosses the value gate: the
    oracle rebuilds every scrubbed document string and the hash
    compares them character-for-character."""
    from ..operators.spans import scrub_duplicated_spans

    return scrub_duplicated_spans(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", w=8
    )


QUERIES["span_scrub_corpus"] = span_scrub_corpus

ORACLES["span_scrub_corpus"] = r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    grams AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM tok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
      FROM grams),
    strips AS (SELECT doc_id, pos FROM marked WHERE occ >= 2 AND rk > 1),
    removed AS (
      SELECT DISTINCT doc_id, CAST(r.i AS BIGINT) AS ti
      FROM strips, LATERAL (SELECT unnest(range(pos, pos + 8)) AS i) r),
    positions AS (
      SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS ti, t[CAST(r.i AS INT)] AS tok
      FROM tok, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
    kept AS (
      SELECT p.doc_id, p.ti, p.tok
      FROM positions p ANTI JOIN removed r USING (doc_id, ti)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_tokens_kept
      FROM kept GROUP BY 1),
    base AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
             END AS n_tokens
      FROM documents)
    SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           coalesce(r.n_tokens_kept, 0) AS n_tokens_kept
    FROM base b LEFT JOIN rebuilt r USING (doc_id)
"""


def bpe_learned_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer train→apply closed in one query (operators/text.py
    ``learn_bpe_merges`` + ``token_stats_bpe_learned``): the corpus
    word counts aggregate distributed, the sequential merge loop runs
    driver-side over the vocab-bounded count table (the architecture
    real BPE trainers use), and the learned table encodes the corpus
    through the same Arrow ``mapInPandas`` path as the shipped
    vocabulary.  Rows-only by nature (iterative training is not
    SQL-expressible); the distributed≡single-machine merge equivalence
    and encode semantics are pytest-pinned
    (tests/test_bpe.py::test_learn_bpe_merges_matches_single_machine).
    No trailing sort: a global orderBy would re-run the Python encoder
    for the range-partition sampling pass (the r3 lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = text.learn_bpe_merges(docs, n_merges=100)
    return text.token_stats_bpe_learned(docs, merges)


QUERIES["bpe_learned_token_stats"] = bpe_learned_token_stats

# The learned merge table at the driver's correctness scale (sf0.01,
# n_merges=100; training stops at 93 when no pair count reaches 2),
# PINNED so the iterative trainer's output can be replayed by a pure
# SQL oracle.  Provenance: ``text.learn_bpe_merges(documents, 100)``
# over /root/testdata/sf0.01 — equality is pinned in
# tests/test_bpe.py::test_pinned_sf001_merges_match_trainer, so any
# drift in the trainer or the data fails loudly instead of silently
# desyncing the oracle.
_BPE_SF001_MERGES = [
    ('e', 'r</w>'), ('o', 'w</w>'), ('t', 'o'), ('a', 't'),
    ('l', 'u'), ('a', 's'), ('i', 'n'), ('e', 'r'),
    ('o', 'r'), ('a', 'r'), ('p', 'ar'), ('i', 'n</w>'),
    ('j', 'o'), ('jo', 'in</w>'), ('as', 'h</w>'), ('h', 'ash</w>'),
    ('r', 'ow</w>'), ('at', 'c'), ('atc', 'h</w>'), ('b', 'atch</w>'),
    ('a', 'n</w>'), ('c', 'an</w>'), ('s', 'can</w>'), ('c', 'o'),
    ('c', 'u'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n</w>'),
    ('cu', 's'), ('cus', 'to'), ('custo', 'm'), ('custom', 'er</w>'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er</w>'),
    ('a', 'l'), ('al', 'l</w>'), ('m', 'all</w>'), ('s', 'mall</w>'),
    ('er', 'g'), ('erg', 'e</w>'), ('l', 'ow</w>'), ('m', 'erge</w>'),
    ('s', 'low</w>'), ('c', 'to'), ('cto', 'r</w>'), ('d', 'er</w>'),
    ('e', 'ctor</w>'), ('or', 'der</w>'), ('v', 'ector</w>'), ('in', 'e</w>'),
    ('l', 'ine</w>'), ('a', 'b'), ('ab', 'l'), ('abl', 'e</w>'),
    ('at', 'a</w>'), ('d', 'ata</w>'), ('t', 'able</w>'), ('u', 'p</w>'),
    ('a', 'g'), ('ag', 'g</w>'), ('a', 'lu'), ('alu', 'e</w>'),
    ('v', 'alue</w>'), ('e', 'y</w>'), ('k', 'ey</w>'), ('a', 'm</w>'),
    ('e', 'am</w>'), ('r', 'eam</w>'), ('s', 't'), ('st', 'ream</w>'),
    ('d', 'ow</w>'), ('in', 'dow</w>'), ('w', 'indow</w>'), ('par', 'k</w>'),
    ('s', 'park</w>'), ('g', 'r'), ('gr', 'o'), ('gro', 'up</w>'),
    ('par', 't</w>'), ('b', 'i'), ('bi', 'g</w>'), ('or', 't</w>'),
    ('s', 'ort</w>'), ('er', 'y</w>'), ('q', 'u'), ('qu', 'ery</w>'),
    ('as', 't</w>'), ('f', 'ast</w>'), ('h', 'e</w>'), ('t', 'he</w>'),
    ('d', 'up</w>'),
]


def _bpe_learned_oracle_sql() -> str:
    """Exact SQL replay of the learned-BPE ENCODE over the pinned
    merge table — the last rows-only query gaining a value oracle.

    Greedy lowest-rank encoding (functions/bpe.py ``encode_word``)
    equals applying the merge list IN RANK ORDER, one left-to-right
    pass each: a merge can only create pairs involving its output
    symbol, which later-ranked merges own (and this table has no
    duplicate-product compositions that could alias an earlier pair —
    checked at pin time).  Each pass is ONE ``replace()`` over a
    separator-framed symbol string: symbols are joined with a DOUBLE
    U+001F separator and the pattern consumes one separator from each
    side, so back-to-back occurrences match in the same pass exactly
    like the Python scan (overlapping self-pairs correctly skip —
    'aaa' encodes as [aa, a] in both).  93 nested replaces over the
    DISTINCT words (the corpus vocabulary), then token counts fan
    back to documents via per-doc word counts.  The whole construction
    is word-level-pinned against the Python encoder in
    tests/test_bpe.py::test_oracle_merge_chain_matches_encoder."""
    s = "\x1f"
    ds = s + s

    def q(lit: str) -> str:
        return lit.replace("'", "''")

    chain = "s0"
    for a, b in _BPE_SF001_MERGES:
        chain = (
            f"replace({chain}, '{q(s + a + ds + b + s)}', "
            f"'{q(s + a + b + s)}')"
        )
    return rf"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text),
                        '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS word
          FROM documents WHERE text IS NOT NULL),
        wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2),
        init AS (
          SELECT word,
                 '{ds}' || array_to_string(
                    list_append(
                      regexp_split_to_array(word, '')[1:length(word)-1],
                      regexp_split_to_array(word, '')[length(word)]
                        || '</w>'),
                    '{ds}') || '{ds}' AS s0
          FROM (SELECT DISTINCT word FROM wc)),
        enc AS (
          SELECT word,
                 (length(e) - length(replace(e, '{ds}', ''))) / 2 - 1 AS tc
          FROM (SELECT word, {{chain}} AS e FROM init)),
        per_doc AS (
          SELECT wc.doc_id, sum(wc.c * enc.tc) AS n_real
          FROM wc JOIN enc USING (word) GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(len(regexp_extract_all(d.text,
                    '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')), 0) AS INT)
                 AS n_tokens_bpe,
               CAST(coalesce(p.n_real, 0) AS BIGINT) AS n_tokens_bpe_real
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """.replace("{chain}", chain)


ORACLES["bpe_learned_token_stats"] = _bpe_learned_oracle_sql()


def pretraining_pipeline_v2_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 operators composed end-to-end (operators/pipeline.py
    ``pretraining_pipeline_v2``): span scrub → quality gate on the
    SCRUBBED text → exact dedup on the scrubbed fingerprint →
    bloom-prescreened window decontamination against the 30% heldout
    split.  The oracle replays every stage interaction — scrubbing
    changes fingerprints changes dedup groups changes the screen's
    input — and checks the surviving (doc, fingerprint, n_tokens)
    rows.  The bloom layer is deliberately NOT replayed here (no false
    negatives ⇒ survivors are bloom-independent; the bloom verdicts
    themselves are oracled by span_contamination_check)."""
    from ..operators.pipeline import pretraining_pipeline_v2

    docs = load_table(spark, sf_dir, "documents")
    held = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.3))
    return pretraining_pipeline_v2(docs.filter(~held), docs.filter(held))


QUERIES["pretraining_pipeline_v2_check"] = pretraining_pipeline_v2_check

ORACLES["pretraining_pipeline_v2_check"] = r"""
    WITH full_t AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc' AS held
      FROM documents),
    -- stage 1: span scrub WITHIN the 70% corpus split
    ctok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM full_t WHERE NOT held AND text IS NOT NULL AND trim(text) <> ''),
    cgrams AS (
      SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM ctok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
      FROM cgrams),
    strips AS (SELECT doc_id, pos FROM marked WHERE occ >= 2 AND rk > 1),
    removed AS (
      SELECT DISTINCT doc_id, CAST(r.i AS BIGINT) AS ti
      FROM strips, LATERAL (SELECT unnest(range(pos, pos + 8)) AS i) r),
    positions AS (
      SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS ti, t[CAST(r.i AS INT)] AS tok
      FROM ctok, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
    kept_tok AS (
      SELECT p.doc_id, p.ti, p.tok
      FROM positions p ANTI JOIN removed r USING (doc_id, ti)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS clean_text
      FROM kept_tok GROUP BY 1),
    scrubbed AS (
      SELECT f.doc_id, coalesce(r.clean_text, '') AS ct
      FROM full_t f LEFT JOIN rebuilt r USING (doc_id)
      WHERE NOT f.held),
    -- stage 2: quality gate on the SCRUBBED text
    q AS (
      SELECT doc_id, ct,
        CASE WHEN trim(ct) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(ct), '\s+')) END AS n_tokens,
        len(regexp_extract_all(ct, '\b(the|a|of|and|to|in|is)\b'))
          AS stop_hits,
        CAST(length(ct) - length(regexp_replace(ct, '[A-Za-z]', '', 'g'))
             AS DOUBLE) / greatest(length(ct), 1) AS alpha_ratio,
        md5(lower(trim(regexp_replace(ct, '\s+', ' ', 'g')))) AS fingerprint
      FROM scrubbed),
    f AS (
      SELECT * FROM q
      WHERE n_tokens BETWEEN 5 AND 10000 AND stop_hits >= 1
        AND alpha_ratio >= 0.5),
    -- stage 3: exact dedup on the scrubbed fingerprint, min-id keeper
    kpt AS (
      SELECT doc_id, ct, fingerprint, n_tokens,
             row_number() OVER (
               PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM f),
    survivors0 AS (SELECT * FROM kpt WHERE rn = 1),
    -- stage 4: window decontamination vs the 30% heldout split (bloom
    -- has no false negatives, so survivors are bloom-independent)
    htok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM full_t WHERE held AND text IS NOT NULL AND trim(text) <> ''),
    hh AS (
      SELECT DISTINCT
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM htok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    stok AS (
      SELECT doc_id, regexp_split_to_array(trim(ct), '\s+') AS t
      FROM survivors0 WHERE trim(ct) <> ''),
    sgrams AS (
      SELECT doc_id,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM stok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    dirty AS (
      SELECT DISTINCT g.doc_id FROM sgrams g JOIN hh USING (h))
    SELECT s.doc_id, s.fingerprint, CAST(s.n_tokens AS BIGINT) AS n_tokens
    FROM survivors0 s ANTI JOIN dirty d USING (doc_id)
"""