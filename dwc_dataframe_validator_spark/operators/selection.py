"""Token-budget corpus selection: fill a training-token budget with
the highest-quality documents.

The final step of a quality-driven data pipeline ("take the best
documents until the budget is full" — the selection rule behind
quality-classifier filtering at a fixed token count) is a PREFIX of
the corpus in (score DESC, id ASC) order whose running token sum
stays within the budget.  Naively that is a GLOBAL SORT plus a
running-sum window over the whole corpus — a single-partition
order-by at 100 TB, the one plan shape this engine bans.

Reference parity: none — selection extends the LLM-pipeline family
(SURVEY.md "beyond the reference" brief).

Two-phase algorithm (no global sort):

1. **Coarse score buckets** ``b = floor(score / granularity)`` — one
   map-side expression + one groupBy: per-bucket token sums and row
   counts.  The bucket table is BOUNDED by the score-range contract
   (score_range / granularity rows; quality logits span a few units,
   so the default granularity keeps it in the low thousands) and is
   collected to the driver — the same bounded-collect contract as a
   broadcast side.
2. **Driver prefix** over buckets sorted descending: buckets whose
   cumulative sum fits entirely are included WHOLESALE (a map-side
   filter ``b > b*`` — no sort, no shuffle); the single BOUNDARY
   bucket pays the exact ordered running-sum window with the
   remaining budget.

Floor-bucketing is monotone in score, so a document in a higher
bucket always precedes one in a lower bucket in the exact order, and
equal scores share a bucket — the two-phase result is therefore
EXACTLY the naive prefix, which is what the DuckDB oracle computes
(`token_budget_selection`).  Residual: a point-mass score
distribution degenerates to one boundary bucket (the full window);
granularity is the knob, and the bucket histogram from phase 1 tells
you before phase 2 runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    tokens_col: str,
    id_col: str = "doc_id",
    granularity: float = 0.001,
) -> DataFrame:
    """The maximal prefix of ``df`` in (``score_col`` DESC,
    ``id_col`` ASC) order with cumulative ``tokens_col`` ≤
    ``budget``.  See the module docstring for the two-phase shape;
    returns the selected rows with their original columns."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    b = F.floor(F.col(score_col) / F.lit(float(granularity)))
    bucketed = df.withColumn("_b", b)
    hist = (
        bucketed.groupBy("_b")
        .agg(F.sum(F.col(tokens_col)).alias("_toks"))
        .collect()  # bounded: score_range / granularity rows
    )
    hist.sort(key=lambda r: r["_b"], reverse=True)
    running = 0
    boundary = None
    remaining = budget
    full_above = None
    for row in hist:
        if running + row["_toks"] <= budget:
            running += row["_toks"]
            full_above = row["_b"]
        else:
            boundary = row["_b"]
            remaining = budget - running
            break
    if boundary is None:
        # every bucket fits: the whole frame is selected
        return bucketed.drop("_b")
    full = bucketed.filter(F.col("_b") > F.lit(boundary))
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    partial = (
        bucketed.filter(F.col("_b") == F.lit(boundary))
        .withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("_cum") <= F.lit(remaining))
        .drop("_cum")
    )
    # full_above unused beyond documentation: full-set filter is on
    # the boundary, which phase 1 proved is the crossing point
    _ = full_above
    return full.unionByName(partial).drop("_b")
