"""End-to-end training-corpus preparation: the operators composed the
way a real pipeline runs them.

``prepare_training_corpus`` chains the canonical pre-training stages —
quality gate → exact near-whitespace dedup → deterministic sample —
with the plan a 100 TB run needs:

1. **Quality gate** (token bounds, stopword presence, alphabetic
   ratio — operators/text.py semantics) is a map-side filter fused into
   the scan projection: rejected documents never reach the shuffle.
2. **Exact dedup** keys on the whitespace-normalized md5 fingerprint
   (operators/text.py ``fingerprint``): ONE shuffle on the fingerprint,
   min-id keeper via window row_number — the only wide stage in the
   whole pipeline.
3. **Deterministic sample** (operators/sampling.py md5 threshold) is a
   map-side filter after the shuffle: value-keyed, so re-runs and
   incremental loads select the same survivors.

Every stage is engine-portable expressions, so the registry checks the
COMPOSED pipeline — filter interactions, keeper choice, sample
membership — against one DuckDB oracle, end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_threshold
from .text import EN_STOPWORDS, token_count


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """The surviving corpus: ``(id_col, fingerprint, n_tokens)`` for
    documents that pass the quality gate, win their fingerprint group
    (min id), and fall inside the deterministic sample."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    stop_hits = F.regexp_count(t, F.lit(EN_STOPWORDS))
    alpha_ratio = (
        n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    staged = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.md5(norm).alias("fingerprint"),
        (
            n_tokens.between(min_tokens, max_tokens)
            & (stop_hits >= 1)
            & (alpha_ratio >= min_alpha_ratio)
        ).alias("_ok"),
    ).filter(F.col("_ok"))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    keepers = (
        staged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    sampled = keepers.filter(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8)
        < F.lit(hash_threshold(sample_fraction))
    )
    return sampled.select(id_col, "fingerprint", "n_tokens")
