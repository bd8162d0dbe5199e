"""Registry slice 3/6 — see registry_parts/__init__.py."""
from __future__ import annotations

from .part2 import *  # noqa: F401,F403 — append-only chain
from .part2 import (  # noqa: F401 — underscore chain
    _BOR_LOWER,
    _BOR_SQL,
    _BPE_SF001_MERGES,
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
    _bpe_learned_oracle_sql,
    _dec,
    _full_metrics_oracle_sql,
    _mixture_oracle_sql,
    _multiscript_text_col,
    _occurrence_checks,
    _pii_oracle_sql,
    _quality_model_oracle_sql,
)



def incremental_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (operators/incremental.py): split
    documents 60/40 by md5(doc_id) into an accumulated "corpus" and an
    incoming "slice"; build the corpus fingerprint store + bloom bits,
    collapse the slice internally, screen it map-side against the
    bloom, and anti-join only the positives against the store.  Bloom
    filters have no false negatives, so the survivors are EXACTLY the
    pure anti-join result the oracle computes — the bloom only changes
    how much of the store the exact join reads.  The persisted form
    (partitioned store, append-on-ingest, partition pruning) is pinned
    in tests/test_operators.py."""
    from ..operators import incremental

    docs = load_table(spark, sf_dir, "documents")
    in_batch = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.4))
    corpus, batch = docs.filter(~in_batch), docs.filter(in_batch)
    # materialize the store once — it feeds both the bloom build
    # (bounded collect) and the exact verify join, the same
    # "artifact you keep" contract as span_contamination's heldout set
    store = incremental.fingerprint_store(corpus).localCheckpoint()
    blob = sketch.bloom_pack_bytes(
        sketch.bloom_build_hex(store, "fingerprint", k=5, m=65536), 65536
    )
    return incremental.incremental_dedup(
        batch, store, bloom_blob=blob, k=5, m=65536
    )


QUERIES["incremental_dedup_check"] = incremental_dedup_check

ORACLES["incremental_dedup_check"] = r"""
    WITH split AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '66666666'
               AS in_batch
      FROM documents),
    corpus_fp AS (
      SELECT DISTINCT
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM split WHERE NOT in_batch AND text IS NOT NULL),
    batch_fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM split WHERE in_batch AND text IS NOT NULL),
    keep AS (
      SELECT doc_id, fingerprint,
             CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT)
               AS batch_copies,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id)
               AS rk
      FROM batch_fp)
    SELECT k.doc_id, k.fingerprint, k.batch_copies
    FROM keep k
    ANTI JOIN corpus_fp c ON k.fingerprint = c.fingerprint
    WHERE k.rk = 1
"""


def ann_rp_lsh_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-grid exact twin of the hyperplane-LSH pair pipeline
    (operators/similarity.py ``rp_lsh_check``): md5-grid hyperplanes,
    sign-bit signatures, banded bucket join, exact-cosine verify —
    every stage value-replayed by the DuckDB oracle.  Completes the
    exact-twin discipline: ``ann_rp_lsh_pairs`` (Gaussian planes,
    recall-pytested) was the last rows-only family without an oracled
    sibling."""
    return similarity.rp_lsh_check(load_table(spark, sf_dir, "embeddings"))


QUERIES["ann_rp_lsh_check"] = ann_rp_lsh_check

ORACLES["ann_rp_lsh_check"] = """
    WITH sub AS (
      SELECT vec_id, embedding,
             row_number() OVER (
               ORDER BY md5('rplsh6:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM embeddings
      QUALIFY rn <= 200),
    ex AS (
      SELECT vec_id, CAST(r.i - 1 AS INT) AS pos,
             CAST(floor(CAST(embedding[CAST(r.i AS INT)] AS DOUBLE) * 1000
                        + 0.5) AS BIGINT) AS qd
      FROM sub, range(1, 17) r(i)),
    planes AS (
      SELECT CAST(j.x AS INT) AS j, CAST(d.x AS INT) AS pos,
             (CAST(CAST(('0x' || substr(md5('rplsh6:' || CAST(j.x AS VARCHAR)
                                        || ':' || CAST(d.x AS VARCHAR)), 1, 8))
                        AS UBIGINT) AS BIGINT) % 2001) - 1000 AS r
      FROM range(0, 16) j(x), range(0, 16) d(x)),
    bits AS (
      SELECT e.vec_id, p.j,
             CASE WHEN sum(e.qd * p.r) >= 0 THEN 1 ELSE 0 END AS bit
      FROM ex e JOIN planes p USING (pos)
      GROUP BY 1, 2),
    keys AS (
      SELECT vec_id, CAST(j // 4 AS INT) AS band,
             string_agg(CAST(bit AS VARCHAR), '' ORDER BY j) AS key
      FROM bits GROUP BY vec_id, band),
    cand AS (
      SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
      FROM keys a
      JOIN keys b ON a.band = b.band AND a.key = b.key
                 AND a.vec_id < b.vec_id),
    norms AS (
      SELECT vec_id, sum(qd * qd) AS n2 FROM ex GROUP BY 1),
    dots AS (
      SELECT c.ida, c.idb, sum(ea.qd * eb.qd) AS dot
      FROM cand c
      JOIN ex ea ON ea.vec_id = c.ida
      JOIN ex eb ON eb.vec_id = c.idb AND eb.pos = ea.pos
      GROUP BY 1, 2)
    SELECT * FROM (
      SELECT d.ida, d.idb,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS sim
      FROM dots d
      JOIN norms na ON na.vec_id = d.ida
      JOIN norms nb ON nb.vec_id = d.idb)
    WHERE sim >= 0.45
"""


def incremental_pipeline_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed per-slice ingestion loop body
    (operators/incremental.py ``ingest_slice_clean`` in its pure
    form): 20/40/40 md5 split into heldout / accumulated corpus /
    incoming slice; the slice is DECONTAMINATED against the heldout
    window set (bloom prescreen + exact verify), then DEDUPED against
    the corpus fingerprint store (bloom prescreen + exact anti-join).
    Both bloom layers have no false negatives, so the surviving rows
    are exactly what the oracle's pure window-join + anti-join
    computes — the whole two-stage pipeline behind one value hash."""
    from ..operators import incremental
    from ..operators.spans import window_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    h8 = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    )
    heldout = docs.filter(h8 < "33333333")
    corpus = docs.filter((h8 >= "33333333") & (h8 < "99999999"))
    slice_ = docs.filter(h8 >= "99999999")

    hw = (
        window_fingerprints(heldout, "doc_id", "text", 8)
        .select("h")
        .distinct()
        .localCheckpoint()
    )
    hblob = sketch.bloom_pack_bytes(
        sketch.bloom_build_hex(hw, "h", k=5, m=65536), 65536
    )
    clean = incremental.decontaminate_batch(slice_, hw, hblob)
    store = incremental.fingerprint_store(corpus).localCheckpoint()
    sblob = sketch.bloom_pack_bytes(
        sketch.bloom_build_hex(store, "fingerprint", k=5, m=65536), 65536
    )
    return incremental.incremental_dedup(
        clean, store, bloom_blob=sblob, k=5, m=65536
    )


QUERIES["incremental_pipeline_check"] = incremental_pipeline_check

ORACLES["incremental_pipeline_check"] = r"""
    WITH split AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
      FROM documents),
    htok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM split
      WHERE h8 < '33333333' AND text IS NOT NULL AND trim(text) <> ''),
    hh AS (
      SELECT DISTINCT
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM htok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    stok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM split
      WHERE h8 >= '99999999' AND text IS NOT NULL AND trim(text) <> ''),
    sgrams AS (
      SELECT doc_id,
             md5(array_to_string(t[CAST(r.i + 1 AS INT):CAST(r.i + 8 AS INT)],
                                 ' ')) AS h
      FROM stok, LATERAL (SELECT unnest(range(0, len(t) - 8 + 1)) AS i) r),
    dirty AS (
      SELECT DISTINCT g.doc_id FROM sgrams g JOIN hh USING (h)),
    clean AS (
      SELECT s.doc_id, s.text
      FROM split s
      ANTI JOIN dirty d ON s.doc_id = d.doc_id
      WHERE s.h8 >= '99999999'),
    corpus_fp AS (
      SELECT DISTINCT
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM split
      WHERE h8 >= '33333333' AND h8 < '99999999' AND text IS NOT NULL),
    batch_fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM clean WHERE text IS NOT NULL),
    keep AS (
      SELECT doc_id, fingerprint,
             CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT)
               AS batch_copies,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id)
               AS rk
      FROM batch_fp)
    SELECT k.doc_id, k.fingerprint, k.batch_copies
    FROM keep k
    ANTI JOIN corpus_fp c ON k.fingerprint = c.fingerprint
    WHERE k.rk = 1
"""


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (operators/selection.py): score
    every document with the linear quality model, then fill a
    15k-token budget with the best documents — the maximal
    (score DESC, id ASC) prefix whose running token sum fits.  The
    Spark side runs the two-phase bucketed algorithm (no global
    sort); the oracle runs the naive running-sum window.  Equality is
    the point: the scale-honest plan must compute EXACTLY the naive
    semantics."""
    from ..operators import selection

    docs = load_table(spark, sf_dir, "documents")
    # score + token count in ONE scan pass (keep_cols) — joining two
    # projections of the same table back on doc_id would pay a full
    # shuffle for columns the projection already had
    j = text.model_quality_score(
        docs.withColumn("n_tokens", text.token_count(F.col("text"))),
        keep_cols=("n_tokens",),
    ).select("doc_id", "quality_logit", "n_tokens")
    sel = selection.select_token_budget(
        j, 15000, "quality_logit", "n_tokens"
    )
    return sel.select("doc_id", "quality_logit", "n_tokens")


QUERIES["token_budget_selection"] = token_budget_selection


def _token_budget_oracle_sql(budget: int = 15000) -> str:
    """Naive running-sum selection over the SAME generated logit
    arithmetic as ``quality_model_scores`` — the oracle is the naive
    O(n log n) global sort the Spark side refuses to run."""
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
    feat_sql = ", ".join(f"{expr} AS {name}" for name, expr in feats.items())
    return rf"""
        WITH s AS (
          SELECT doc_id, text,
            CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          FROM documents),
        f AS (SELECT doc_id, n_tokens, {feat_sql} FROM s),
        scored AS (
          SELECT doc_id, n_tokens, {logit} AS quality_logit FROM f),
        cum AS (
          SELECT doc_id, quality_logit, n_tokens,
                 sum(n_tokens) OVER (
                   ORDER BY quality_logit DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM scored)
        SELECT doc_id, quality_logit, n_tokens
        FROM cum WHERE c <= {budget}
    """


ORACLES["token_budget_selection"] = _token_budget_oracle_sql()


#: per-source budgets for the mixture-construction query — a mix of
#: sizes plus a tiny budget (partial boundary) and an absent source
#: (src4+ dropped entirely)
_GROUP_BUDGETS = {"src0": 4000, "src1": 2500, "src2": 6000, "src3": 120}


def token_budget_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture construction (operators/selection.py:
    select_token_budget_by_group): fill a SEPARATE token budget per
    source with that source's best documents — the "2:1 web:code at
    fixed token counts" step of corpus assembly.  One (source,
    bucket) histogram, a driver prefix per source, and a single plan
    whose only sort is the group-PARTITIONED boundary window — no
    global sort, no per-group job loop, so 10 000 sources cost the
    same plan as 4.  Sources without a budget are dropped."""
    from ..operators import selection

    docs = load_table(spark, sf_dir, "documents")
    # one scan pass: score, token count, and source together
    j = text.model_quality_score(
        docs.withColumn("n_tokens", text.token_count(F.col("text"))),
        keep_cols=("n_tokens", "source"),
    ).select("doc_id", "source", "quality_logit", "n_tokens")
    sel = selection.select_token_budget_by_group(
        j, _GROUP_BUDGETS, "quality_logit", "n_tokens", group_col="source"
    )
    return sel.select("doc_id", "source", "quality_logit", "n_tokens")


QUERIES["token_budget_by_group"] = token_budget_by_group


def _token_budget_by_group_oracle_sql() -> str:
    """Naive per-group running-sum selection — the window the Spark
    side refuses to run globally, partitioned by source here so the
    oracle is the straightforward O(n log n) statement."""
    base = _token_budget_oracle_sql()
    scored_prefix = base.split("cum AS")[0]
    in_list = ", ".join(f"'{g}'" for g in _GROUP_BUDGETS)
    budget_case = " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in _GROUP_BUDGETS.items()
    )
    return rf"""
        {scored_prefix}
        src AS (
          SELECT s.doc_id, d.source, s.quality_logit, s.n_tokens
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id
          WHERE d.source IN ({in_list})),
        cum AS (
          SELECT doc_id, source, quality_logit, n_tokens,
                 sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality_logit DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM src)
        SELECT doc_id, source, quality_logit, n_tokens
        FROM cum
        WHERE c <= CASE source {budget_case} END
    """


ORACLES["token_budget_by_group"] = _token_budget_by_group_oracle_sql()


def dedup_priority_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven exact dedup (operators/dedup.py:
    exact_dedup_keepers_by_priority): among copies of the same
    normalized text, keep the copy from the most-trusted source
    (src3 ≻ src1 ≻ src0 ≻ everything else), then the longest, then
    the lowest id — the "prefer the curated feed over the crawl"
    rule of production corpus builds.  Single shuffle on the
    fingerprint; the policy is one map-side CASE."""
    docs = load_table(spark, sf_dir, "documents")
    fps = text.fingerprint(docs).select("doc_id", "fingerprint")
    j = docs.select("doc_id", "source", "n_chars").join(fps, "doc_id")
    keep = dedup.exact_dedup_keepers_by_priority(
        j, ["fingerprint"], "source",
        {"src3": 0, "src1": 1, "src0": 2},
        score_col="n_chars",
    )
    return keep.select("doc_id", "source", "fingerprint")


QUERIES["dedup_priority_keepers"] = dedup_priority_keepers

#: temperature-mixture token budget (total chars across sources);
#: sf0.01 documents hold ~149k chars, so this samples roughly a third
_TEMP_BUDGET = 50_000


def temperature_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (operators/sampling.py:
    temperature_fractions / temperature_mixture_sample): per-source
    Bernoulli rates derived from each source's own token mass with
    alpha=0.5 up-weighting of small sources, targeting a fixed total
    token budget — the source-weighting step of corpus assembly.  One
    bounded aggregation + one map-side CASE filter; the weights are
    integer-quantized so the fractions (and therefore the md5
    thresholds) are BIT-IDENTICAL across Spark and DuckDB — the
    oracle replays the exact sampled subset, not a statistic."""
    docs = load_table(spark, sf_dir, "documents")
    s = sampling.temperature_mixture_sample(
        docs, "source", "doc_id", "n_chars", _TEMP_BUDGET
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


QUERIES["temperature_mixture_stats"] = temperature_mixture_stats

ORACLES["temperature_mixture_stats"] = f"""
    WITH t AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
      GROUP BY source),
    w AS (
      SELECT source, toks,
             CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1048576.0) AS BIGINT)
               AS ws
      FROM t WHERE toks > 0),
    tot AS (SELECT CAST(sum(ws) AS BIGINT) AS sum_ws FROM w),
    f AS (
      SELECT source,
             least(1.0,
                   CAST({_TEMP_BUDGET} AS DOUBLE) * ws / sum_ws / toks)
               AS frac
      FROM w, tot),
    thr AS (
      SELECT source,
             CASE WHEN frac >= 1.0 THEN 'g'
                  ELSE printf('%08x',
                              CAST(floor(frac * 4294967296.0) AS BIGINT))
             END AS thr
      FROM f)
    SELECT d.source,
           count(*) AS sampled_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sampled_chars,
           min(d.doc_id) AS min_doc_id,
           max(d.doc_id) AS max_doc_id
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.thr
    GROUP BY d.source
"""


#: epoch-repeat budget — ~4× the sf0.01 corpus mass, so small sources
#: repeat for several epochs while large ones get fewer (alpha=0.5)
_EPOCH_BUDGET = 600_000


def epoch_repeat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch corpus repetition (operators/sampling.py:
    temperature_plan / epoch_repeat_sample): a token budget BEYOND the
    corpus is delivered as floor(q) full passes per source plus a
    deterministic hash-sample of the remainder — the repeat-factor
    table of data recipes that up-sample small curated sources.
    Profiled per (source, epoch): the oracle replays the exact plan
    (bit-identical q, epochs, thresholds) and the exact partial-epoch
    subsets, so repeated-row materialization is value-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    s = sampling.epoch_repeat_sample(
        docs, "source", "doc_id", "n_chars", _EPOCH_BUDGET
    )
    return s.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_emitted"),
        F.min("doc_id").alias("min_doc_id"),
    )


QUERIES["epoch_repeat_stats"] = epoch_repeat_stats

ORACLES["epoch_repeat_stats"] = f"""
    WITH t AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
      GROUP BY source),
    w AS (
      SELECT source, toks,
             CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1048576.0) AS BIGINT)
               AS ws
      FROM t WHERE toks > 0),
    tot AS (SELECT CAST(sum(ws) AS BIGINT) AS sum_ws FROM w),
    plan AS (
      SELECT source,
             CAST(floor(CAST({_EPOCH_BUDGET} AS DOUBLE) * ws / sum_ws
                        / toks) AS BIGINT) AS n_epochs,
             (CAST({_EPOCH_BUDGET} AS DOUBLE) * ws / sum_ws / toks)
               - floor(CAST({_EPOCH_BUDGET} AS DOUBLE) * ws / sum_ws
                       / toks) AS rem
      FROM w, tot),
    thr AS (
      SELECT source, n_epochs,
             CASE WHEN rem >= 1.0 THEN 'g'
                  ELSE printf('%08x',
                              CAST(floor(rem * 4294967296.0) AS BIGINT))
             END AS thr
      FROM plan),
    emitted AS (
      SELECT source, epoch, doc_id, n_chars FROM (
        SELECT d.source,
               unnest(generate_series(1, CAST(p.n_epochs AS BIGINT)))
                 AS epoch,
               d.doc_id, d.n_chars
        FROM documents d
        JOIN thr p USING (source))
      UNION ALL
      SELECT d.source, p.n_epochs + 1 AS epoch, d.doc_id, d.n_chars
      FROM documents d
      JOIN thr p USING (source)
      WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < p.thr)
    SELECT source, epoch,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_emitted,
           min(doc_id) AS min_doc_id
    FROM emitted
    GROUP BY source, epoch
"""


#: train/val/test fractions for the deterministic split query
_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (operators/sampling.py:
    hash_split): disjoint md5-prefix intervals sized to the fractions,
    one map-side CASE, no shuffle or sampling pass — profiled per
    split.  The oracle replays the identical interval bounds, so the
    ASSIGNMENT (not just split sizes) is value-pinned."""
    docs = load_table(spark, sf_dir, "documents")
    s = sampling.hash_split(docs, "doc_id", _SPLITS)
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


QUERIES["hash_split_stats"] = hash_split_stats


def _hash_split_oracle_sql() -> str:
    """Interval bounds GENERATED from the same _SPLITS dict +
    ``sampling.hash_threshold`` cumulative arithmetic the Spark side
    uses — the two sides cannot drift."""
    arms = [
        f"WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{thr}' "
        f"THEN '{name}'"
        for name, thr in sampling.split_bounds(_SPLITS)
    ]
    case = "CASE " + " ".join(arms) + " END"
    return f"""
        SELECT split, count(*) AS n_docs,
               count(DISTINCT source) AS n_sources,
               min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        FROM (SELECT doc_id, source, {case} AS split FROM documents)
        WHERE split IS NOT NULL
        GROUP BY split
    """


ORACLES["hash_split_stats"] = _hash_split_oracle_sql()


def mixture_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recipe-vs-reality mixture monitoring (operators/sampling.py:
    mixture_drift): per-source observed token share vs the
    temperature-target share (alpha=0.5), wholly Spark-side — one
    bounded aggregation + a broadcast 1-row totals join, no driver
    collect.  The oracle replays the quantized-weight arithmetic
    bit-for-bit, doubles included."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mixture_drift(docs, "source", "n_chars")


QUERIES["mixture_drift_by_source"] = mixture_drift_by_source

ORACLES["mixture_drift_by_source"] = """
    WITH t AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
      FROM documents WHERE n_chars IS NOT NULL
      GROUP BY source HAVING CAST(sum(n_chars) AS BIGINT) > 0),
    w AS (
      SELECT source, toks,
             CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1048576.0) AS BIGINT)
               AS ws
      FROM t),
    tot AS (
      SELECT CAST(sum(ws) AS BIGINT) AS sum_ws,
             CAST(sum(toks) AS BIGINT) AS sum_toks
      FROM w)
    SELECT source, toks,
           CAST(ws AS DOUBLE) / sum_ws AS target_share,
           CAST(toks AS DOUBLE) / sum_toks AS observed_share,
           (CAST(toks AS DOUBLE) / sum_toks)
             - (CAST(ws AS DOUBLE) / sum_ws) AS drift,
           (CAST(toks AS DOUBLE) / sum_toks)
             / (CAST(ws AS DOUBLE) / sum_ws) AS drift_ratio
    FROM w, tot
"""


def corpus_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/incremental.py: corpus_diff_stats):
    two overlapping corpus versions (drop the 0-ending ids vs drop the
    1-ending ids) classified into added / removed / retained content
    fingerprints with their document counts — the "what did this
    recipe change" review of iterative dataset building.  Two
    dedup-shaped hash aggregates + one fingerprint-keyed full-outer
    join; output cardinality 3."""
    from ..operators import incremental

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 != 1)
    return incremental.corpus_diff_stats(old, new)


QUERIES["corpus_diff_summary"] = corpus_diff_summary

ORACLES["corpus_diff_summary"] = r"""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM documents WHERE text IS NOT NULL),
    o AS (
      SELECT fingerprint, count(*) AS docs_old
      FROM fp WHERE doc_id % 10 <> 0 GROUP BY fingerprint),
    n AS (
      SELECT fingerprint, count(*) AS docs_new
      FROM fp WHERE doc_id % 10 <> 1 GROUP BY fingerprint),
    j AS (
      SELECT CASE WHEN o.fingerprint IS NULL THEN 'added'
                  WHEN n.fingerprint IS NULL THEN 'removed'
                  ELSE 'retained' END AS status,
             CASE WHEN n.fingerprint IS NOT NULL THEN n.docs_new
                  ELSE o.docs_old END AS docs
      FROM o FULL OUTER JOIN n ON o.fingerprint = n.fingerprint)
    SELECT status, count(*) AS n_fingerprints,
           CAST(sum(docs) AS BIGINT) AS n_docs
    FROM j GROUP BY status
"""


def corpus_diff_added(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The new snapshot's novel content as keeper documents
    (operators/incremental.py: corpus_added) — what an incremental
    re-train consumes.  Anti-join on the old snapshot's distinct
    fingerprints + the standard first-per-fingerprint keeper window."""
    from ..operators import incremental

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 != 1)
    return incremental.corpus_added(old, new).select("doc_id", "fingerprint")


QUERIES["corpus_diff_added"] = corpus_diff_added

ORACLES["corpus_diff_added"] = r"""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM documents WHERE text IS NOT NULL),
    o AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 <> 0),
    keep AS (
      SELECT doc_id, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id)
               AS rn
      FROM fp WHERE doc_id % 10 <> 1)
    SELECT k.doc_id, k.fingerprint
    FROM keep k ANTI JOIN o ON k.fingerprint = o.fingerprint
    WHERE k.rn = 1
"""


def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile (operators/profile.py:
    profile_table) over ``orders``: one aggregation pass emits a row
    per column with non-null and distinct counts — the reference's
    ``field_populated_counts`` generalized to any table.  The oracle
    replays exact distincts; the default approx_count_distinct form
    is the 100 TB path (no Expand)."""
    from ..operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"), exact_distinct=True
    )


QUERIES["table_profile_orders"] = table_profile_orders


def _table_profile_oracle_sql() -> str:
    cols = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        # Spark 4 reads parquet TIMESTAMP (isAdjustedToUTC=false) as
        # TIMESTAMP_NTZ; the dtype literal mirrors the Spark schema
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ]
    parts = [
        f"""SELECT '{name}' AS "column", '{dtype}' AS dtype,
               (SELECT count(*) FROM orders) AS n_rows,
               count({name}) AS n_nonnull,
               count(DISTINCT {name}) AS n_distinct
            FROM orders"""
        for name, dtype in cols
    ]
    return " UNION ALL ".join(parts)


ORACLES["table_profile_orders"] = _table_profile_oracle_sql()


def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scores (operators/text.py:
    bigram_surprisal): per-document −log2 P(cur|prev) on the exact
    integer-log2 grid, with the proper prefix-count denominator
    computed as a second window over the same bigram aggregate — one
    tokenize pass, no unigram join.  The oracle replays every value
    bit-for-bit (all-integer until one final division)."""
    return text.bigram_surprisal(load_table(spark, sf_dir, "documents"))


QUERIES["bigram_surprisal_scores"] = bigram_surprisal_scores

ORACLES["bigram_surprisal_scores"] = r"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      FROM documents WHERE text IS NOT NULL),
    pe AS (
      SELECT doc_id,
             unnest(generate_series(1, len(l) - 1)) AS i, l
      FROM toks WHERE len(l) >= 2),
    tf AS (
      SELECT doc_id, l[i] AS prev, l[i + 1] AS cur, count(*) AS tf
      FROM pe GROUP BY 1, 2, 3),
    cb AS (
      SELECT doc_id, tf,
             CAST(sum(tf) OVER (PARTITION BY prev, cur) AS BIGINT) AS c_big,
             CAST(sum(tf) OVER (PARTITION BY prev) AS BIGINT) AS c_prefix
      FROM tf),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_transitions,
             CAST(sum(tf * ( (length(format('{:b}', c_prefix)) - 1)
                           - (length(format('{:b}', c_big)) - 1) ))
                  AS BIGINT) AS surprisal_bits
      FROM cb GROUP BY 1)
    SELECT d.doc_id,
           coalesce(p.n_transitions, 0) AS n_transitions,
           coalesce(p.surprisal_bits, 0) AS surprisal_bits,
           CASE WHEN p.n_transitions > 0
                THEN CAST(p.surprisal_bits AS DOUBLE)
                     / CAST(p.n_transitions AS DOUBLE)
           END AS bits_per_transition
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def kn_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (operators/text.py
    ``kneser_ney_surprisal``): discount 3/4, continuation counts, all
    exact-integer numerators/denominators on the shared floor-log2
    grid — the smoothed companion to ``bigram_surprisal_scores``.  The
    oracle replays tokenization, the bigram-type statistics and the
    (num, den) integer forms bit-for-bit."""
    return text.kneser_ney_surprisal(load_table(spark, sf_dir, "documents"))


QUERIES["kn_surprisal_scores"] = kn_surprisal_scores

ORACLES["kn_surprisal_scores"] = r"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      FROM documents WHERE text IS NOT NULL),
    pe AS (
      SELECT doc_id,
             unnest(generate_series(1, len(l) - 1)) AS i, l
      FROM toks WHERE len(l) >= 2),
    tf AS (
      SELECT doc_id, l[i] AS prev, l[i + 1] AS cur, count(*) AS tf
      FROM pe GROUP BY 1, 2, 3),
    bt AS (
      SELECT prev, cur, CAST(sum(tf) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2),
    bstat AS (
      SELECT *,
             CAST(sum(c) OVER (PARTITION BY prev) AS BIGINT) AS cv,
             CAST(count(*) OVER (PARTITION BY prev) AS BIGINT) AS nv,
             CAST(count(*) OVER (PARTITION BY cur) AS BIGINT) AS nw,
             (SELECT CAST(count(*) AS BIGINT) FROM bt) AS nb
      FROM bt),
    scored AS (
      SELECT t.doc_id, t.tf,
             (4 * s.c - 3) * s.nb + 3 * s.nv * s.nw AS num,
             4 * s.cv * s.nb AS den
      FROM tf t JOIN bstat s USING (prev, cur)),
    per_doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_transitions,
             CAST(sum(tf * ( (length(format('{:b}', den)) - 1)
                           - (length(format('{:b}', num)) - 1) ))
                  AS BIGINT) AS kn_bits
      FROM scored GROUP BY 1)
    SELECT d.doc_id,
           coalesce(p.n_transitions, 0) AS n_transitions,
           coalesce(p.kn_bits, 0) AS kn_bits,
           CASE WHEN p.n_transitions > 0
                THEN CAST(p.kn_bits AS DOUBLE)
                     / CAST(p.n_transitions AS DOUBLE)
           END AS bits_per_transition
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def top_fraction_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction-based selection (operators/selection.py:
    select_top_fraction): the best 20% of documents per source by the
    linear quality logit — one per-group percentile aggregate feeding
    a broadcast join and a map-side ≥ comparison; no sort, no window
    over data rows.  The cutoff doubles are oracle-exact (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the contract
    ``numeric_profile`` already pins), so the selected SET crosses the
    value gate."""
    from ..operators.selection import select_top_fraction

    docs = load_table(spark, sf_dir, "documents")
    scored = text.model_quality_score(docs, keep_cols=("source",)).select(
        "doc_id", "source", "quality_logit"
    )
    return select_top_fraction(
        scored, 0.2, "quality_logit", group_col="source"
    )


QUERIES["top_fraction_by_source"] = top_fraction_by_source


def _top_fraction_oracle_sql() -> str:
    base = _token_budget_oracle_sql()
    scored_prefix = base.split("cum AS")[0]
    return f"""
        {scored_prefix}
        src AS (
          SELECT s.doc_id, d.source, s.quality_logit
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
        cuts AS (
          SELECT source, quantile_cont(quality_logit, 0.8) AS cut
          FROM src GROUP BY source)
        SELECT s.doc_id, s.source, s.quality_logit
        FROM src s JOIN cuts c
          ON s.source IS NOT DISTINCT FROM c.source
        WHERE s.quality_logit >= c.cut
    """


ORACLES["top_fraction_by_source"] = _top_fraction_oracle_sql()


ORACLES["dedup_priority_keepers"] = r"""
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM documents)
    SELECT doc_id, source, fingerprint FROM (
      SELECT doc_id, source, fingerprint,
             row_number() OVER (
               PARTITION BY fingerprint
               ORDER BY CASE source WHEN 'src3' THEN 0 WHEN 'src1' THEN 1
                                    WHEN 'src0' THEN 2 ELSE 3 END,
                        n_chars DESC NULLS LAST, doc_id) AS rn
      FROM fp)
    WHERE rn = 1
"""


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication dashboard: documents, distinct
    fingerprints, within-source duplicate count/rate, and how many of
    the source's fingerprints also appear under ANOTHER source
    (cross-source duplication — the number that tells you two feeds
    overlap).  One fingerprint pass + two grouped aggregates; the
    cross-source join runs on the distinct (source, fingerprint)
    pairs, never on documents."""
    docs = load_table(spark, sf_dir, "documents")
    fps = text.fingerprint(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    per_src = fps.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_fingerprints"),
    )
    pairs = fps.select("source", "fingerprint").distinct()
    other = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .select(F.col("a.source").alias("source"),
                F.col("a.fingerprint").alias("fingerprint"))
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cross_source_fps"))
    )
    return (
        per_src.join(other, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_fingerprints",
            (F.col("n_docs") - F.col("n_fingerprints")).alias("dup_docs"),
            (
                (F.col("n_docs") - F.col("n_fingerprints")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            F.coalesce(F.col("cross_source_fps"), F.lit(0))
            .cast("long")
            .alias("cross_source_fps"),
        )
    )


QUERIES["dedup_rate_by_source"] = dedup_rate_by_source

ORACLES["dedup_rate_by_source"] = r"""
    WITH fps AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint
      FROM documents),
    per_src AS (
      SELECT source,
             count(*) AS n_docs,
             count(DISTINCT fingerprint) AS n_fingerprints
      FROM fps GROUP BY source),
    pairs AS (SELECT DISTINCT source, fingerprint FROM fps),
    other AS (
      SELECT a.source, count(DISTINCT a.fingerprint) AS cross_source_fps
      FROM pairs a JOIN pairs b
        ON a.fingerprint = b.fingerprint AND a.source <> b.source
      GROUP BY a.source)
    SELECT p.source, p.n_docs, p.n_fingerprints,
           p.n_docs - p.n_fingerprints AS dup_docs,
           CAST(p.n_docs - p.n_fingerprints AS DOUBLE)
             / CAST(p.n_docs AS DOUBLE) AS dup_rate,
           CAST(coalesce(o.cross_source_fps, 0) AS BIGINT)
             AS cross_source_fps
    FROM per_src p LEFT JOIN other o USING (source)
"""


def contamination_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination dashboard over the 30% heldout split:
    documents screened, documents sharing ≥1 exact 8-token window
    with the heldout set, the rate, and total confirmed window
    occurrences.  Runs the bloom-prescreened screen
    (operators/pipeline.py span_contamination) and aggregates by
    source; confirmed counts are bloom-independent (no false
    negatives), so the oracle replays the pure window join — which
    feeds "source X is 4% benchmark-contaminated, cut or clean it"
    decisions."""
    from ..operators.pipeline import span_contamination

    docs = load_table(spark, sf_dir, "documents")
    held = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.3))
    rep = span_contamination(docs.filter(~held), docs.filter(held))
    j = rep.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("confirmed_windows") > 0).alias(
            "contaminated_docs"
        ),
        (
            F.count_if(F.col("confirmed_windows") > 0).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("contamination_rate"),
        F.sum("confirmed_windows").alias("confirmed_windows"),
    )


QUERIES["contamination_rate_by_source"] = contamination_rate_by_source

ORACLES["contamination_rate_by_source"] = r"""
    WITH full_t AS (
      SELECT doc_id, text, source,
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
    scr AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS cw
      FROM grams g JOIN hh USING (h)
      WHERE NOT g.held GROUP BY 1)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (coalesce(c.cw, 0) > 0) AS BIGINT)
             AS contaminated_docs,
           CAST(count(*) FILTER (coalesce(c.cw, 0) > 0) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS contamination_rate,
           CAST(sum(coalesce(c.cw, 0)) AS BIGINT) AS confirmed_windows
    FROM (SELECT doc_id, source FROM full_t WHERE NOT held) s
    LEFT JOIN scr c USING (doc_id)
    GROUP BY s.source
"""


# --------------------------------------------------------------------------
# round-9 additions (append-only)
# --------------------------------------------------------------------------


def multimodal_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec-free multimodal decode (operators/multimodal.py
    ``decode_media_headers``): pure-byte PNG IHDR / JPEG SOFn / GIF /
    BMP / WAV-fmt header parsing over binary blobs — no PIL, no stub.
    The fixture builder plants VALID media bytes whose dimensions are
    pure arithmetic in doc_id (ids % 17 == 0 get truncated headers →
    ``ok=false`` with null fields), so the oracle states the expected
    parse exactly while the Spark side must genuinely parse the
    planted bytes to reproduce it.  Map-side only — no shuffle, O(1)
    header scan per blob."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = multimodal.attach_media_blob(docs, id_col="doc_id")
    return multimodal.decode_media_headers(blobs)


QUERIES["multimodal_header_meta"] = multimodal_header_meta

# replays the builder's id→header arithmetic: format = id%5 (png jpeg
# gif bmp wav), w = 16 + id%300, h = 16 + (id//7)%300, channels per
# format (PNG color type [0,2,4,6][id%4] → [1,3,2,4] samples; JPEG
# ncomp = 1 + (id%2)*2; BMP bitcount [8,24,32][id%3] → [1,3,4]); WAV
# carries (channels, sample_rate) and no dimensions; id%17==0 blobs
# are truncated to 6 bytes → all-null, ok=false
ORACLES["multimodal_header_meta"] = """
    SELECT doc_id AS id,
      CASE WHEN doc_id % 17 = 0 THEN NULL
           WHEN doc_id % 5 = 0 THEN 'image/png'
           WHEN doc_id % 5 = 1 THEN 'image/jpeg'
           WHEN doc_id % 5 = 2 THEN 'image/gif'
           WHEN doc_id % 5 = 3 THEN 'image/bmp'
           ELSE 'audio/wav' END AS mime,
      CASE WHEN doc_id % 17 = 0 OR doc_id % 5 = 4 THEN NULL
           ELSE CAST(16 + doc_id % 300 AS INT) END AS width,
      CASE WHEN doc_id % 17 = 0 OR doc_id % 5 = 4 THEN NULL
           ELSE CAST(16 + (doc_id // 7) % 300 AS INT) END AS height,
      CASE WHEN doc_id % 17 = 0 THEN NULL
           WHEN doc_id % 5 = 0 THEN
             CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                  WHEN 2 THEN 2 ELSE 4 END AS INT)
           WHEN doc_id % 5 = 1 THEN CAST(1 + (doc_id % 2) * 2 AS INT)
           WHEN doc_id % 5 = 2 THEN 3
           WHEN doc_id % 5 = 3 THEN
             CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
                                  ELSE 4 END AS INT)
           ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
      CASE WHEN doc_id % 17 = 0 OR doc_id % 5 <> 4 THEN NULL
           ELSE CAST(8000 * (1 + doc_id % 4) AS INT) END AS sample_rate,
      doc_id % 17 <> 0 AS ok
    FROM documents
"""


def trigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-LM stupid-backoff quality scores (operators/text.py:
    trigram_surprisal) in the real deployment shape: the model is
    counted on a held-in 30% reference slice (deterministic md5 split)
    and applied to the remaining 70%, so unseen n-grams exercise the
    live backoff chain (trigram → +1 bit bigram → +2 bit unigram →
    OOV).  All-integer on the floor-log2 grid until one final
    division — the oracle replays every value bit-for-bit, including
    the per-level backoff tallies."""
    docs = load_table(spark, sf_dir, "documents")
    held = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.3))
    return text.trigram_surprisal(
        docs.filter(~held), model_df=docs.filter(held)
    )


QUERIES["trigram_surprisal_scores"] = trigram_surprisal_scores

ORACLES["trigram_surprisal_scores"] = r"""
    WITH full_t AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc' AS held
      FROM documents),
    toks AS (
      SELECT doc_id, held,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      FROM full_t WHERE text IS NOT NULL),
    mt AS (
      SELECT l[i] AS p2, l[i + 1] AS p1, l[i + 2] AS cur
      FROM (SELECT l, unnest(generate_series(1, len(l) - 2)) AS i
            FROM toks WHERE held AND len(l) >= 3)),
    tri AS (
      SELECT p2, p1, cur, CAST(count(*) AS BIGINT) AS c3
      FROM mt GROUP BY 1, 2, 3),
    tri2 AS (
      SELECT p2, p1, cur, c3,
             CAST(sum(c3) OVER (PARTITION BY p2, p1) AS BIGINT) AS c3p
      FROM tri),
    mb AS (
      SELECT l[i] AS p1, l[i + 1] AS cur
      FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
            FROM toks WHERE held AND len(l) >= 2)),
    big AS (
      SELECT p1, cur, CAST(count(*) AS BIGINT) AS c2
      FROM mb GROUP BY 1, 2),
    big2 AS (
      SELECT p1, cur, c2,
             CAST(sum(c2) OVER (PARTITION BY p1) AS BIGINT) AS c2p
      FROM big),
    mu AS (SELECT unnest(l) AS cur FROM toks WHERE held),
    uni AS (SELECT cur, CAST(count(*) AS BIGINT) AS c1 FROM mu GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM mu),
    dt AS (
      SELECT doc_id, l[i] AS p2, l[i + 1] AS p1, l[i + 2] AS cur
      FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
            FROM toks WHERE NOT held AND len(l) >= 3)),
    tf AS (
      SELECT doc_id, p2, p1, cur, CAST(count(*) AS BIGINT) AS tf
      FROM dt GROUP BY 1, 2, 3, 4),
    sc AS (
      SELECT tf.doc_id, tf.tf,
             CASE WHEN t.c3 IS NOT NULL THEN
                    (length(format('{:b}', t.c3p)) - 1)
                    - (length(format('{:b}', t.c3)) - 1)
                  WHEN b.c2 IS NOT NULL THEN
                    1 + (length(format('{:b}', b.c2p)) - 1)
                    - (length(format('{:b}', b.c2)) - 1)
                  WHEN u.c1 IS NOT NULL THEN
                    2 + (length(format('{:b}', n_total)) - 1)
                    - (length(format('{:b}', u.c1)) - 1)
                  ELSE 2 + (length(format('{:b}', n_total)) - 1)
             END AS bits,
             CASE WHEN t.c3 IS NOT NULL THEN 0
                  WHEN b.c2 IS NOT NULL THEN 1
                  WHEN u.c1 IS NOT NULL THEN 2 ELSE 3 END AS lvl
      FROM tf
      LEFT JOIN tri2 t USING (p2, p1, cur)
      LEFT JOIN big2 b USING (p1, cur)
      LEFT JOIN uni u USING (cur), tot),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS n_scored,
             CAST(sum(tf * bits) AS BIGINT) AS surprisal_bits,
             CAST(sum(CASE WHEN lvl = 1 THEN tf ELSE 0 END) AS BIGINT)
               AS n_backoff_bigram,
             CAST(sum(CASE WHEN lvl = 2 THEN tf ELSE 0 END) AS BIGINT)
               AS n_backoff_unigram,
             CAST(sum(CASE WHEN lvl = 3 THEN tf ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM sc GROUP BY 1)
    SELECT d.doc_id,
           coalesce(p.n_scored, 0) AS n_scored,
           coalesce(p.surprisal_bits, 0) AS surprisal_bits,
           coalesce(p.n_backoff_bigram, 0) AS n_backoff_bigram,
           coalesce(p.n_backoff_unigram, 0) AS n_backoff_unigram,
           coalesce(p.n_oov, 0) AS n_oov,
           CASE WHEN p.n_scored > 0
                THEN CAST(p.surprisal_bits AS DOUBLE)
                     / CAST(p.n_scored AS DOUBLE)
           END AS bits_per_transition
    FROM (SELECT doc_id FROM full_t WHERE NOT held) d
    LEFT JOIN per_doc p USING (doc_id)
"""


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate+vector serving (operators/similarity.py ``ivf_topk``
    with ``predicate=``): a metadata filter pushed BENEATH the ANN
    search — corpus rows are filtered before the cell join, so only
    predicate survivors are ranked and the filter reaches the scan,
    instead of post-filtering a top-k down to < k rows.  Exact oracle:
    the same cell equi-join + predicate + rank replayed in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter("vec_id < 8"), k=3,
        predicate="vec_id % 3 = 0",
    )


QUERIES["ann_filtered_topk"] = ann_filtered_topk

ORACLES["ann_filtered_topk"] = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
               FROM embeddings WHERE vec_id < 8),
    s AS (
      SELECT qid AS query_id, e.vec_id AS neighbor_id,
        list_sum(list_transform(list_zip(qe, e.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(qe,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      FROM q JOIN embeddings e
        ON e.label = q.ql AND e.vec_id <> qid AND e.vec_id % 3 = 0)
    SELECT query_id, neighbor_id, rank, sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM s)
    WHERE rank <= 3
"""


def _synthetic_url_col() -> F.Column:
    """Deterministic messy-URL fixture: every curation rule gets
    exercised — uppercase scheme/host, www, default and non-default
    ports, userinfo, tracking params mixed with real ones, fragments,
    multi-part TLDs, and invalid rows (doc_id % 4 == 3).  Case 0 omits
    doc_id from the path on purpose, so re-crawl duplicates exist for
    the URL dedup.  The SQL twin is ``_URL_FIXTURE_SQL``."""
    d = F.col("doc_id")

    def s(e):
        return e.cast("string")

    return (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("HTTP://WWW.News"), s(d % 20),
                F.lit(".COM:80/story?utm_source=feed&fbclid=xyz"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("https://user:pw@Sub.Site"), s(d % 30),
                F.lit(".CO.UK:443/a/b/"), s(d), F.lit("?id="), s(d),
                F.lit("&utm_campaign=c#frag"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("http://blog.example"), s(d % 10),
                F.lit(".org:8080/p/"), s(d), F.lit("?a=1&b=2"),
            ),
        )
        .otherwise(F.concat(F.lit("not a url "), s(d)))
    )


_URL_FIXTURE_SQL = """
      CASE doc_id % 4
        WHEN 0 THEN 'HTTP://WWW.News' || CAST(doc_id % 20 AS VARCHAR)
                    || '.COM:80/story?utm_source=feed&fbclid=xyz'
        WHEN 1 THEN 'https://user:pw@Sub.Site' || CAST(doc_id % 30 AS VARCHAR)
                    || '.CO.UK:443/a/b/' || CAST(doc_id AS VARCHAR)
                    || '?id=' || CAST(doc_id AS VARCHAR)
                    || '&utm_campaign=c#frag'
        WHEN 2 THEN 'http://blog.example' || CAST(doc_id % 10 AS VARCHAR)
                    || '.org:8080/p/' || CAST(doc_id AS VARCHAR)
                    || '?a=1&b=2'
        ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
      END"""

# SQL replay of operators/web.py normalization — the same anchored
# regexes evaluated by DuckDB's RE2, CTE chain ``b``(url) → ``dmn``
# (url_norm, scheme, host, domain)
_URL_NORM_SQL = r"""
    p AS (
      SELECT *,
             regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]')
               AS valid,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme0,
             regexp_replace(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               '^[^@]*@', '') AS hostport
      FROM b),
    q AS (
      SELECT *, lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host0,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(regexp_replace(url, '#.*$', ''),
               '\?(.*)$', 1) AS qs
      FROM p),
    r AS (
      SELECT *, CASE WHEN path = '' THEN '/' ELSE path END AS pathn,
             CASE WHEN port <> '' AND NOT (scheme0 = 'http' AND port = '80')
                       AND NOT (scheme0 = 'https' AND port = '443')
                  THEN ':' || port ELSE '' END AS portpart,
             array_to_string(list_filter(string_split(qs, '&'),
               t -> t <> '' AND NOT regexp_matches(t,
                    '^(utm_[^=]*|gclid|fbclid)(=.*)?$')), '&') AS qn
      FROM q),
    n AS (
      SELECT *,
             CASE WHEN valid THEN scheme0 || '://' || host0 || portpart
                       || pathn
                       || CASE WHEN qn <> '' THEN '?' || qn ELSE '' END
             END AS url_norm,
             CASE WHEN valid THEN scheme0 END AS scheme,
             CASE WHEN valid THEN host0 END AS host
      FROM r),
    dm0 AS (SELECT *,
              string_split(regexp_replace(host, '\.$', ''), '.') AS l
            FROM n),
    dm1 AS (SELECT *, __PSL_SUFFIX_LEN__ AS ps_len FROM dm0),
    dmn AS (
      SELECT *, __REGISTRABLE_DOMAIN__ AS domain
      FROM dm1)
"""

# splice in the registrable-domain twins GENERATED from the same
# public-suffix snapshot the Catalyst expression bakes into its plan
# (operators/web.py psl_suffix_len_sql / registrable_domain_sql) —
# the rule file is the single source of truth for both engines
from ..operators import web as _web  # noqa: E402

_URL_NORM_SQL = _URL_NORM_SQL.replace(
    "__PSL_SUFFIX_LEN__", _web.psl_suffix_len_sql("l")
).replace(
    "__REGISTRABLE_DOMAIN__",
    _web.registrable_domain_sql("host", "l", "ps_len"),
)


def url_normalize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/web.py ``normalize_urls``):
    lowercased scheme/host, userinfo and default ports stripped,
    fragments and tracking params dropped, empty path → '/',
    registrable-domain extraction with multi-part-TLD handling,
    invalid rows → NULLs — all Catalyst regex expressions replayed
    verbatim by the oracle."""
    from ..operators import web

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wurl = docs.withColumn("url", _synthetic_url_col())
    return web.normalize_urls(wurl).select(
        "doc_id", "url_norm", "scheme", "host", "domain"
    )


QUERIES["url_normalize_check"] = url_normalize_check

ORACLES["url_normalize_check"] = f"""
    WITH b AS (
      SELECT doc_id, {_URL_FIXTURE_SQL} AS url FROM documents),
    {_URL_NORM_SQL}
    SELECT doc_id, url_norm, scheme, host, domain FROM dmn
"""


def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain corpus mix dashboard (operators/web.py
    ``domain_mix_stats``): doc count + share, token mass + share, and
    duplicate rate (1 − distinct fingerprints / docs — re-crawl
    pressure), invalid URLs rolled up under domain NULL.  One
    aggregation + a broadcast 1-row totals join."""
    from ..operators import web

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    wurl = docs.withColumn("url", _synthetic_url_col()).withColumn(
        "fp", F.md5(F.col("text").cast("binary"))
    )
    return web.domain_mix_stats(
        wurl, tokens_col="n_chars", fingerprint_col="fp"
    )


QUERIES["domain_mix_report"] = domain_mix_report

ORACLES["domain_mix_report"] = f"""
    WITH b AS (
      SELECT doc_id, text, n_chars, md5(text) AS fp,
             {_URL_FIXTURE_SQL} AS url
      FROM documents),
    {_URL_NORM_SQL},
    per AS (
      SELECT domain, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_tokens,
             count(DISTINCT fp) AS n_distinct_fp
      FROM dmn GROUP BY domain),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
             CAST(sum(n_tokens) AS BIGINT) AS t_toks
      FROM per)
    SELECT domain, n_docs, n_tokens, n_distinct_fp,
           CAST(n_docs AS DOUBLE) / CAST(t_docs AS DOUBLE) AS doc_share,
           CAST(n_tokens AS DOUBLE) / CAST(t_toks AS DOUBLE) AS token_share,
           1.0 - CAST(n_distinct_fp AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS dup_rate
    FROM per, tot
"""


def url_dedup_keeper_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup (operators/web.py ``url_dedup_keepers``): one
    keeper (min doc_id) per NORMALIZED URL, so tracking-param /
    default-port / case variants of the same page collapse; rows with
    invalid URLs have no key and all survive.  ONE shuffle on the
    normalized key; the oracle replays the normalization and the
    min-id policy."""
    from ..operators import web

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    wurl = docs.withColumn("url", _synthetic_url_col())
    return web.url_dedup_keepers(wurl, "url", "doc_id")


QUERIES["url_dedup_keeper_rows"] = url_dedup_keeper_rows

ORACLES["url_dedup_keeper_rows"] = f"""
    WITH b AS (
      SELECT doc_id, source, {_URL_FIXTURE_SQL} AS url FROM documents),
    {_URL_NORM_SQL},
    keepers AS (
      SELECT min(doc_id) AS doc_id FROM dmn
      WHERE url_norm IS NOT NULL GROUP BY url_norm
      UNION ALL
      SELECT doc_id FROM dmn WHERE url_norm IS NULL)
    SELECT d.doc_id, d.source, d.url
    FROM b d JOIN keepers USING (doc_id)
"""


#: orders schema for the merged-profile oracle generator — name must
#: match Spark's simpleString rendering per column
_ORDERS_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp_ntz"),
    ("o_orderpriority", "string"),
]


def merged_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-slice profiles (operators/profile.py
    ``profile_state``/``merge_profile_states``): the orders table is
    profiled as THREE independent slices (o_orderkey % 3) whose states
    merge algebraically — the corpus-lifetime profiling pattern where
    each ingest batch appends |columns| rows of state and the merged
    profile never rescans data.  The oracle replays every EXACT field
    (counts, integral sums, numeric and rendered-string min/max) from
    the whole table — merged-state ≡ one-shot is the operator's
    contract; the HLL distinct estimate is dropped here (sketch
    internals are not SQL) and pinned in pytest instead."""
    from ..operators.profile import merge_profile_states, profile_estimate
    from ..operators.profile import profile_state

    orders = load_table(spark, sf_dir, "orders")
    states = None
    for i in range(3):
        s = profile_state(
            orders.filter(F.col("o_orderkey") % 3 == i), f"s{i}"
        )
        states = s if states is None else states.unionByName(s)
    return profile_estimate(merge_profile_states(states)).drop(
        "n_distinct_approx"
    )


QUERIES["merged_profile_orders"] = merged_profile_orders


def _merged_profile_oracle_sql() -> str:
    parts = []
    for name, dt in _ORDERS_PROFILE_COLS:
        if dt == "bigint":
            sl = f"CAST(sum({name}) AS BIGINT)"
            mn, mx = f"CAST(min({name}) AS DOUBLE)", f"CAST(max({name}) AS DOUBLE)"
            ms = xs = "CAST(NULL AS VARCHAR)"
        elif dt == "double":
            sl = "CAST(NULL AS BIGINT)"
            mn, mx = f"min({name})", f"max({name})"
            ms = xs = "CAST(NULL AS VARCHAR)"
        else:
            sl = "CAST(NULL AS BIGINT)"
            mn = mx = "CAST(NULL AS DOUBLE)"
            ms, xs = (
                f"CAST(min({name}) AS VARCHAR)",
                f"CAST(max({name}) AS VARCHAR)",
            )
        parts.append(
            f"SELECT '{name}' AS \"column\", '{dt}' AS dtype, "
            f"CAST(3 AS BIGINT) AS n_slices, count(*) AS n_rows, "
            f"count({name}) AS n_nonnull, {sl} AS sum_long, "
            f"{mn} AS min_num, {mx} AS max_num, "
            f"{ms} AS min_str, {xs} AS max_str FROM orders"
        )
    return " UNION ALL ".join(parts)


ORACLES["merged_profile_orders"] = _merged_profile_oracle_sql()


def histogram_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable numeric-histogram quantiles (operators/profile.py
    ``histogram_state``/``merge_histogram_states``/
    ``histogram_quantiles``): events.value bucketed at a power-of-two
    granularity (bit-exact floor across engines) as THREE independent
    slice states, merged algebraically, then p50/p90/p99 read off the
    cumulative histogram — quantiles with error ≤ g over any number of
    ingest slices without rescanning or sorting data.  Exact oracle:
    the bucketing, merge and pinned rank rule are all integer
    arithmetic DuckDB replays bit-for-bit."""
    from ..operators.profile import (
        histogram_quantiles,
        histogram_state,
        merge_histogram_states,
    )

    events = load_table(spark, sf_dir, "events")
    st = None
    for i in range(3):
        s = histogram_state(
            events.filter(F.col("event_id") % 3 == i),
            {"value": 0.5},
            f"s{i}",
        )
        st = s if st is None else st.unionByName(s)
    return histogram_quantiles(merge_histogram_states(st))


QUERIES["histogram_quantiles_events"] = histogram_quantiles_events

ORACLES["histogram_quantiles_events"] = """
    WITH h AS (
      SELECT CAST(floor(CAST("value" AS DOUBLE) / 0.5) AS BIGINT)
               AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE "value" IS NOT NULL GROUP BY 1),
    c AS (
      SELECT bucket, n,
             CAST(sum(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM h),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h),
    qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                     (CAST(0.99 AS DOUBLE))),
    r AS (
      SELECT q, greatest(CAST(1 AS BIGINT),
               CAST(ceil(q * CAST(total AS DOUBLE)) AS BIGINT)) AS rnk
      FROM qs, t)
    SELECT 'value' AS "column", CAST(0.5 AS DOUBLE) AS g, r.q,
           min(c.bucket) AS bucket,
           CAST(min(c.bucket) AS DOUBLE) * 0.5 AS value_lo,
           CAST(min(c.bucket) + 1 AS DOUBLE) * 0.5 AS value_hi
    FROM r JOIN c ON c.cum >= r.rnk
    GROUP BY r.q
"""


#: target-mixture budget — ~40% of the sf0.01 corpus token mass, so
#: the water-filling solver produces a real mix of whole-taken small
#: strata and rate-limited large ones
_TGT_BUDGET = 60_000


def target_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact water-filling mixture solver (operators/sampling.py
    ``target_mixture_thresholds`` / ``target_mixture_sample``): given
    TARGET shares (integer weights derived from the source name:
    1 + src_index % 3) and a token budget, per-source Bernoulli rates
    where too-small-for-their-share strata are taken WHOLE and their
    unused budget redistributes to the rest proportional to target
    weight — the recipe-driven sibling of temperature sampling.  The
    solver is arbitrary-precision integer arithmetic end-to-end
    (rational water level, exact ⌊a·w/T·2^32⌋ thresholds), and the
    oracle replays it with 128-bit HUGEINT SQL: sort key T·(6//w) is
    exact because every weight divides 6."""
    docs = load_table(spark, sf_dir, "documents")
    srcs = [
        r["source"]
        for r in docs.select("source").distinct().collect()
        if r["source"] is not None
    ]
    weights = {s: 1 + (int(s[3:]) % 3) for s in srcs}
    samp = sampling.target_mixture_sample(
        docs, "source", "doc_id", "n_chars", weights, _TGT_BUDGET
    )
    return samp.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


QUERIES["target_mixture_stats"] = target_mixture_stats

ORACLES["target_mixture_stats"] = f"""
    WITH t AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS T,
             CAST(1 + (CAST(substr(source, 4) AS INT) % 3) AS BIGINT) AS w
      FROM documents
      WHERE n_chars IS NOT NULL AND source IS NOT NULL
      GROUP BY source HAVING CAST(sum(n_chars) AS BIGINT) > 0),
    tot AS (
      SELECT CAST(sum(T) AS BIGINT) AS TT, CAST(sum(w) AS BIGINT) AS WW,
             least(CAST({_TGT_BUDGET} AS BIGINT), CAST(sum(T) AS BIGINT))
               AS BSTAR
      FROM t),
    p AS (
      SELECT *, row_number() OVER (ORDER BY T * (6 // w), source) AS rn
      FROM t),
    c AS (
      SELECT p.*, CAST(sum(T) OVER (ORDER BY rn) AS BIGINT) AS P,
             CAST(sum(w) OVER (ORDER BY rn) AS BIGINT) AS V
      FROM p),
    ks AS (SELECT 0 AS k UNION ALL SELECT rn AS k FROM p),
    cand AS (
      SELECT k,
             BSTAR - coalesce((SELECT P FROM c WHERE rn = k), 0) AS num,
             WW - coalesce((SELECT V FROM c WHERE rn = k), 0) AS den
      FROM ks, tot),
    valid AS (
      SELECT cand.k, cand.num, cand.den FROM cand
      LEFT JOIN c ck ON ck.rn = cand.k
      LEFT JOIN c cn ON cn.rn = cand.k + 1
      WHERE (cand.k = 0 OR
             CAST(ck.T AS HUGEINT) * cand.den
               <= CAST(cand.num AS HUGEINT) * ck.w)
        AND (cn.rn IS NULL OR
             CAST(cand.num AS HUGEINT) * cn.w
               < CAST(cn.T AS HUGEINT) * cand.den)
      ORDER BY cand.k LIMIT 1),
    thr AS (
      SELECT c.source,
             CASE WHEN c.rn <= v.k THEN 'g'
                  WHEN v.num <= 0 THEN '00000000'
                  ELSE printf('%08x', CAST(
                    (CAST(v.num AS HUGEINT) * c.w * 4294967296)
                    // (CAST(v.den AS HUGEINT) * c.T) AS BIGINT))
             END AS thr
      FROM c, valid v)
    SELECT d.source,
           count(*) AS sampled_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sampled_chars,
           min(d.doc_id) AS min_doc_id,
           max(d.doc_id) AS max_doc_id
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.thr
    GROUP BY d.source
"""


def quality_histogram_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score distribution (operators/profile.py
    grouped ``histogram_state`` + ``histogram_quantiles``): the linear
    quality logit bucketed at g = 2^-2 per source, p50/p90 read off
    the cumulative histogram — the "which feed's quality is drifting"
    dashboard, mergeable across ingest slices like every histogram
    state.  Exact oracle: the logit arithmetic is the pinned
    bit-portable feature recipe and the bucket/rank rules are integer
    arithmetic."""
    from ..operators.profile import (
        histogram_quantiles,
        histogram_state,
        merge_histogram_states,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = text.model_quality_score(docs, keep_cols=("source",)).select(
        "source", "quality_logit"
    )
    st = histogram_state(
        scored, {"quality_logit": 0.25}, "all", group_col="source"
    )
    return histogram_quantiles(
        merge_histogram_states(st), qs=(0.5, 0.9)
    )


QUERIES["quality_histogram_by_source"] = quality_histogram_by_source


def _quality_histogram_oracle_sql() -> str:
    base = _token_budget_oracle_sql()
    scored_prefix = base.split("cum AS")[0]
    return f"""
        {scored_prefix}
        src AS (
          SELECT d.source,
                 CAST(floor(s.quality_logit / 0.25) AS BIGINT) AS bucket
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id
          WHERE s.quality_logit IS NOT NULL),
        h AS (
          SELECT source, bucket, CAST(count(*) AS BIGINT) AS n
          FROM src GROUP BY 1, 2),
        c AS (
          SELECT source, bucket, n,
                 CAST(sum(n) OVER (PARTITION BY source ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS total
          FROM h),
        qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)))
        SELECT c.source AS grp, 'quality_logit' AS "column",
               CAST(0.25 AS DOUBLE) AS g, q,
               min(bucket) AS bucket,
               CAST(min(bucket) AS DOUBLE) * 0.25 AS value_lo,
               CAST(min(bucket) + 1 AS DOUBLE) * 0.25 AS value_hi
        FROM c, qs
        WHERE cum >= greatest(CAST(1 AS BIGINT),
                              CAST(ceil(q * CAST(total AS DOUBLE)) AS BIGINT))
        GROUP BY c.source, q
    """


ORACLES["quality_histogram_by_source"] = _quality_histogram_oracle_sql()


def quality_drift_tv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift alert (operators/profile.py
    ``histogram_tv_distance``): exact total-variation distance between
    the per-source quality-logit histograms of two corpus snapshots
    (deterministic md5 halves standing in for yesterday/today) — the
    number a curation pipeline pages on when a feed's quality
    distribution shifts.  Integer numerator (decimal(38,0) ↔ HUGEINT),
    one final pinned-order division — value-exact across engines."""
    from ..operators.profile import histogram_state, histogram_tv_distance

    docs = load_table(spark, sf_dir, "documents")
    scored = text.model_quality_score(docs, keep_cols=("source",)).select(
        "doc_id", "source", "quality_logit"
    )
    half = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
    ) < F.lit(sampling.hash_threshold(0.5))
    ha = histogram_state(
        scored.filter(half), {"quality_logit": 0.25}, "a",
        group_col="source",
    )
    hb = histogram_state(
        scored.filter(~half), {"quality_logit": 0.25}, "b",
        group_col="source",
    )
    return histogram_tv_distance(ha, hb)


QUERIES["quality_drift_tv_by_source"] = quality_drift_tv_by_source


def _quality_drift_oracle_sql() -> str:
    base = _token_budget_oracle_sql()
    scored_prefix = base.split("cum AS")[0]
    return f"""
        {scored_prefix}
        src AS (
          SELECT s.doc_id, d.source, s.quality_logit
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id
          WHERE s.quality_logit IS NOT NULL),
        lab AS (
          SELECT source,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
                   AS first_half,
                 CAST(floor(quality_logit / 0.25) AS BIGINT) AS bucket
          FROM src),
        ha AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS na
               FROM lab WHERE first_half GROUP BY 1, 2),
        hb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS nb
               FROM lab WHERE NOT first_half GROUP BY 1, 2),
        j AS (
          SELECT coalesce(ha.source, hb.source) AS source,
                 coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
          FROM ha FULL OUTER JOIN hb
            ON ha.source IS NOT DISTINCT FROM hb.source
           AND ha.bucket = hb.bucket),
        jt AS (
          SELECT source, na, nb,
                 CAST(sum(na) OVER (PARTITION BY source) AS BIGINT)
                   AS tna,
                 CAST(sum(nb) OVER (PARTITION BY source) AS BIGINT)
                   AS tnb
          FROM j),
        agg AS (
          SELECT source,
                 CAST(sum(abs(CAST(na AS HUGEINT) * tnb
                              - CAST(nb AS HUGEINT) * tna)) AS HUGEINT)
                   AS tv_num,
                 tna, tnb
          FROM jt
          GROUP BY source, tna, tnb)
        SELECT source AS grp, 'quality_logit' AS "column",
               CAST(0.25 AS DOUBLE) AS g, tv_num,
               tna AS n_a, tnb AS n_b,
               CASE WHEN tna = 0 OR tnb = 0 THEN 1.0
                    ELSE CAST(tv_num AS DOUBLE)
                         / (2.0 * CAST(tna AS DOUBLE)
                            * CAST(tnb AS DOUBLE))
               END AS tv
        FROM agg
    """


ORACLES["quality_drift_tv_by_source"] = _quality_drift_oracle_sql()


def dsir_scores_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (operators/text.py
    ``dsir_importance_scores`` — Xie et al. 2023 hashed-n-gram
    importance resampling, on the repo's exact integer-log2 grid):
    score every document by target-vs-raw hashed-token likelihood
    ratio with ``lang = 'en'`` documents as the target exemplars —
    the "reshape the crawl toward a target domain" selection signal.
    md5-prefix bucket hash and floor-log2 weights are both
    engine-portable, so model fit AND per-document scores cross the
    exact value gate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.dsir_importance_scores(
            docs, target=F.col("lang") == "en", n_buckets=256
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_tokens", "dsir_bits", "bits_per_token")
    )


QUERIES["dsir_scores_lang"] = dsir_scores_lang