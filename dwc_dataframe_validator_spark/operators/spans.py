"""Span-level duplicate detection: rolling-window fingerprints.

The whole-document dedup family (operators/dedup.py, operators/
pipeline.py) treats a document as one unit; real web corpora also
contain *partial* duplication — boilerplate headers, license blocks,
quoted passages — that whole-doc fingerprints and even MinHash miss
when the surrounding text differs.  The standard remedy (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better") is
substring-level dedup: fingerprint every w-token window and flag
windows whose fingerprint occurs more than once in the corpus.

Reference parity: none — the reference validator has no text surface
at all; this extends the training-data-pipeline family alongside
exact/MinHash/SimHash dedup.

Design:

- **Window fingerprint = md5 of the space-joined w-token slice**, not
  a Rabin-Karp polynomial hash.  A true rolling hash saves the O(w)
  re-hash per position — a constant-factor CPU optimization — but its
  modular arithmetic is not portable across engines, which would
  demote the whole operator to a rows-only check.  md5 over the
  reconstructed window text is engine-identical (same recipe as the
  CMS/Bloom sketches), so the ENTIRE pipeline sits behind an exact
  DuckDB oracle; the O(w) factor stays inside whole-stage codegen.
- **No pair enumeration anywhere.**  Unlike Jaccard pairing, a
  hyper-common window (a degenerate doc repeating one token) cannot
  go quadratic here: duplication is decided by a COUNT over the
  fingerprint — one shuffle with map-side partial aggregation — never
  by joining occurrences against each other.  No df skew cap needed.
- **Coverage is exact, not window-count × w.**  Overlapping duplicated
  windows share tokens; the per-document duplicated-token count merges
  the fixed-length intervals [pos, pos+w) with one LEAD window pass:
  each duplicated window contributes min(w, next_pos − pos) tokens
  (the last contributes w).
- Shuffle budget: explode (no shuffle) → window-count over the
  fingerprint (shuffle 1, on h) → per-doc interval merge + aggregate
  (shuffle 2, on the doc id; the LEAD window and the final groupBy
  share the same hash partitioning, so Catalyst plans ONE exchange
  for both).  Both shuffles carry ≤ n_tokens rows per document —
  linear in corpus size, the same cost class as the MinHash shingle
  pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_fingerprints(
    df: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """Every w-token window of every document as
    ``(id_col, pos, h)`` — ``pos`` is the 0-based token offset, ``h``
    the md5 fingerprint of the space-joined window.

    Tokenization matches operators/text.py (split on ``\\s+`` after
    trim); documents with fewer than ``w`` tokens produce no rows.
    Pure built-in expressions: ``sequence``/``transform``/``slice``
    stay in codegen, and ``posexplode`` emits n_tokens − w + 1 rows
    per document — the map-side cost is O(total tokens × w) with no
    shuffle.
    """
    # The window-hash map work is O(total tokens × w) — by far the
    # dominant cost — and runs BEFORE any exchange, so it inherits the
    # scan's partitioning; spread a degenerate single-split scan
    # (see operators/text.py spread_small_scan).
    from .text import spread_small_scan

    df = spread_small_scan(df, id_col)

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.when(n >= w, F.sequence(F.lit(0), n - w)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i + 1, F.lit(w))).cast("binary")
        ),
    )
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.posexplode(grams).alias("pos", "h"))
    )


def duplicated_span_stats(
    df: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """Per-document duplicated-span report:
    ``(id_col, n_tokens, n_windows, n_dup_windows, dup_tokens)``.

    A window is *duplicated* when its fingerprint occurs ≥ 2 times in
    the whole corpus — other documents or elsewhere in the same one
    (self-repetition is duplication for training-data purposes).
    ``dup_tokens`` is the exact size of the union of the duplicated
    [pos, pos+w) intervals.  Every input document appears in the
    output (zero-filled when nothing is duplicated), so the report
    doubles as the keep/strip manifest for a span-scrub pass.
    """
    grams = window_fingerprints(df, id_col, text_col, w)
    occ = F.count(F.lit(1)).over(Window.partitionBy("h"))
    dup = grams.withColumn("occ", occ).filter(F.col("occ") >= 2)

    nxt = F.lead("pos").over(Window.partitionBy(id_col).orderBy("pos"))
    contrib = F.when(nxt.isNull(), F.lit(w)).otherwise(
        F.least(F.lit(w), nxt - F.col("pos"))
    )
    per_doc = (
        dup.withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("contrib").alias("dup_tokens"),
        )
    )

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
            F.lit(0),
        )
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "n_windows",
        F.greatest(F.lit(0), F.col("n_tokens") - F.lit(w) + 1).cast("long"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
        )
    )


def scrub_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """The actionable half of span dedup: materialize documents with
    their duplicated spans REMOVED, keeping exactly one occurrence of
    each duplicated window corpus-wide.

    Keeper policy (deterministic): for every duplicated fingerprint,
    the occurrence with the smallest ``(doc, pos)`` survives; every
    other occurrence's ``[pos, pos+w)`` token interval is stripped
    from its document.  Output ``(id_col, clean_text, n_tokens,
    n_tokens_kept)``; ``clean_text`` is whitespace-normalized (tokens
    re-joined with single spaces — the span machinery tokenizes on
    ``\\s+``, so original spacing is not recoverable by design).

    Plan (all linear, no per-document quadratic):
    fingerprints → keeper choice as a row_number window over the
    fingerprint (shuffle 1) → non-keeper windows fan out to their w
    token indices (``posexplode(sequence)``, ≤ w rows per stripped
    window) → distinct removed (doc, token-index) pairs → token
    positions LEFT ANTI join removed (shuffle 2, on the doc id) →
    per-doc ordered reassembly via ``sort_array(collect_list(struct
    (pos, token)))`` (reuses the doc partitioning).  A naive
    per-token ``exists()`` over a strip-position array is O(tokens ×
    strips) per document — degenerate docs (every window duplicated)
    make that quadratic; the explode keeps it O(tokens + w·strips).
    """
    grams = window_fingerprints(df, id_col, text_col, w)
    wh = Window.partitionBy("h")
    keeper = Window.partitionBy("h").orderBy(id_col, "pos")
    strips = (
        grams.withColumn("_occ", F.count(F.lit(1)).over(wh))
        .withColumn("_rk", F.row_number().over(keeper))
        .filter((F.col("_occ") >= 2) & (F.col("_rk") > 1))
        .select(id_col, "pos")
    )
    removed = strips.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))).alias(
            "_ti"
        ),
    ).distinct()

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    positions = df.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col), F.posexplode(toks).alias("_ti", "_tok"))
    kept = positions.join(removed, [id_col, "_ti"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("_ti", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_tokens_kept"),
    )

    base = df.select(
        F.col(id_col),
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
            F.lit(0),
        )
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_tokens"),
    )
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "n_tokens",
        F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("long").alias(
            "n_tokens_kept"
        ),
    )
