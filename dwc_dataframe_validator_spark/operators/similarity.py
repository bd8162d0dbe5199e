"""Similarity search over embedding columns (array<float>).

Two physical strategies behind one logical contract (query set × corpus
→ top-k neighbors per query):

- ``cosine_topk``: brute-force scan.  The query side is broadcast (it
  is small by construction); similarity is a Catalyst ``aggregate`` /
  ``zip_with`` expression accumulated in DOUBLE (bit-exact vs an
  equivalent sequential double reduction — this is what lets the DuckDB
  oracle match it exactly); per-query top-k via window rank.
- ``cosine_topk_arrow``: the throughput path — mapInPandas with a
  broadcast numpy query matrix; each Arrow batch does ONE BLAS matmul
  and emits only its local top-k, then a global window prunes to k.
  ~10-100× the expression path on wide fan-outs; use when |queries| is
  large.
- ``ivf_topk``: the scale path — restrict the scan to the query's
  partition cell (here: a precomputed cluster/label column, i.e. IVF
  with nprobe=1).  At 100 TB this is the difference between scanning
  the corpus per query set and scanning one cell.

No collect() anywhere; the only driver-side data is the final top-k.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Sequential double-accumulated dot product of two float arrays.
    Element order is array order — deterministic and engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_double(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (norm_double(a) * norm_double(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k per query vector.

    ``queries`` is broadcast — the join is a BroadcastNestedLoopJoin
    over the corpus scan, embarrassingly parallel, no shuffle until the
    final per-query rank (which moves only |queries|·k·fanin rows).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized brute-force top-k: one numpy matmul per Arrow batch.

    The query matrix is collected once (small by contract) and shipped
    in the task closure; each batch emits ≤ |queries|·k rows, so the
    final global rank shuffles a bounded set.  This is the pattern for
    'UDFs are the slow path — unless they are one BLAS call per batch'.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)

    def batch_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = qmat @ mat.T  # |q| × batch
            sims[:, :] = np.where(ids[None, :] == qids[:, None], -np.inf, sims)
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            top_sims = np.take_along_axis(sims, idx, axis=1).ravel()
            out = pd.DataFrame({
                "query_id": np.repeat(qids, kk),
                "neighbor_id": ids[idx].ravel(),
                "sim": top_sims,
            })
            # drop masked self-matches (-inf) so small corpora match
            # the expression path and the SQL oracle exactly
            yield out[np.isfinite(top_sims)]

    partial = corpus.select(id_col, vec_col).mapInPandas(
        batch_topk, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    cell_col: str = "cell",
    fit_fraction: float | None = None,
    max_iter: int = 20,
    fit_partitions: int = 4,
):
    """Train a coarse quantizer (k-means) over the corpus and return
    (corpus + ``cell_col`` column, fitted model).  Assignment is a
    map-side transform; the cell column then drives cell-blocked search
    (``ivf_topk``) and near-dup blocking (``embedding_dup_pairs``).

    ``fit_fraction`` fits the quantizer on a seeded sample — at corpus
    scale the centroids converge on a small fraction of the data and
    the full pass is only the (cheap) assignment transform.  The
    sampled fit input is coalesced to ``fit_partitions``: k-means runs
    ``max_iter`` tiny jobs, and per-task overhead on a many-partition
    sample dwarfs the math (measured 2-3× on the driver corpus).
    Existing ``cell_col``/feature columns are replaced, not collided
    with, so re-indexing an already-indexed frame is safe."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat_col = f"_features_{cell_col}"
    corpus = corpus.drop(cell_col, feat_col)
    feat = corpus.withColumn(feat_col, array_to_vector(F.col(vec_col)))
    if fit_fraction:
        fit_input = feat.sample(fit_fraction, seed=seed).coalesce(fit_partitions)
    else:
        fit_input = feat
    model = KMeans(
        k=n_cells, seed=seed, featuresCol=feat_col, predictionCol=cell_col,
        maxIter=max_iter,
    ).fit(fit_input)
    assigned = model.transform(feat).drop(feat_col)
    return assigned, model


def probe_cells(
    queries: DataFrame,
    centers: list,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each query its ``nprobe`` nearest coarse-quantizer
    centers (squared euclidean, matching k-means assignment): the
    recall knob of IVF search.  Returns one row per (query, probed
    cell): (query_id, _qvec, <cell_col>).

    ``centers`` is the fitted model's ``clusterCenters()`` — n_cells ×
    dim scalars, driver-side by design (a quantizer small enough to
    broadcast is the premise of IVF).  The query×centers cross join is
    |Q|·n_cells rows, both sides tiny by contract."""
    spark = queries.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        schema=f"{cell_col} int, _center array<double>",
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("_qvec"),
            F.col("_center"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d2"), F.asc(cell_col))
    return (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qvec", cell_col)
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    centers: list,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    predicate=None,
) -> DataFrame:
    """IVF top-k with nprobe > 1: each query scans its ``nprobe``
    nearest cells instead of exactly one, recovering the true neighbors
    that sit just across a cell boundary.  Cost scales linearly in
    nprobe (~nprobe/C of the corpus per query); recall rises toward
    brute force as nprobe → C.

    Still a cell equi-join: the probe set replaces the single assigned
    cell, and because every corpus row lives in exactly one cell, no
    candidate is generated twice — no dedup pass needed.

    ``predicate`` filters corpus rows beneath the search (same
    contract as ``ivf_topk``) — this is the escalation path for
    filtered serving when a selective predicate starves single-cell
    probes below k survivors."""
    if predicate is not None:
        corpus = corpus.filter(predicate)
    probes = probe_cells(queries, centers, nprobe, id_col, vec_col, cell_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col(cell_col).alias("_ccell"),
    )
    sims = (
        F.broadcast(probes)
        .join(c, F.col(cell_col) == F.col("_ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cell_col: str = "cell",
    fit_fraction: float | None = None,
    nprobe: int = 1,
    max_iter: int = 20,
) -> DataFrame:
    """End-to-end trained-IVF search: fit the coarse quantizer on the
    corpus, assign the corpus to cells, then search the query's
    ``nprobe`` nearest cells (nprobe=1 degenerates to the classic
    single-cell scan)."""
    from pyspark.ml.functions import array_to_vector

    indexed, model = build_ivf_index(
        corpus, n_cells, vec_col, seed, cell_col, fit_fraction,
        max_iter=max_iter,
    )
    if nprobe > 1:
        return ivf_topk_multiprobe(
            indexed, queries, model.clusterCenters(), k=k, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col, cell_col=cell_col,
        )
    feat_col = f"_features_{cell_col}"
    q_assigned = model.transform(
        queries.drop(cell_col, feat_col)
        .withColumn(feat_col, array_to_vector(F.col(vec_col)))
    ).drop(feat_col)
    return ivf_topk(
        indexed, q_assigned, k=k, id_col=id_col, vec_col=vec_col, cell_col=cell_col
    )


def embedding_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by a coarse
    quantizer cell: self-equi-join on the cell column (never an
    all-pairs cross product), cosine ≥ threshold within each block.

    At 100 TB the cell column comes from a trained coarse quantizer
    (k-means centroid id); near-identical embeddings land in the same
    cell, so the quadratic blow-up is confined to cell-local pairs —
    the same blocking trick as LSH banding for text.

    SCALE CONTRACT — cell granularity must grow with the corpus.  The
    within-cell term is quadratic in cell size, so a FIXED cell count
    makes this operator O(n²/C): the round-5 10× spot-check measured
    51× runtime at 10× rows when the corpus was scaled but the 10
    label cells were not (BASELINE.md appendix).  Keep cells at a
    target size by fitting the quantizer with ``n_cells ≈ n /
    target_cell_size`` (``build_ivf_index``; re-fit or split cells as
    the corpus grows) — then cosine work per cell is constant and the
    total is linear in n."""
    a = corpus.select(
        F.col(id_col).alias("ida"),
        F.col(vec_col).alias("_va"),
        F.col(cell_col).alias("_cell"),
    )
    b = corpus.select(
        F.col(id_col).alias("idb"),
        F.col(vec_col).alias("_vb"),
        F.col(cell_col).alias("_cell"),
    )
    return (
        a.join(b, "_cell")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            "ida", "idb",
            cosine_sim(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    predicate=None,
) -> DataFrame:
    """IVF-style top-k: candidates restricted to the query's cell
    (equi-join on the cell column instead of a cross join).  With a
    cell count of C this scans ~1/C of the corpus per query — the
    standard ANN recall/throughput trade.

    ``predicate`` (Column or SQL string) is a metadata filter pushed
    BENEATH the search: corpus rows are filtered before the cell join,
    so Catalyst lands it in the scan (PushedFilters) alongside any
    partition pruning — filtered serving, not post-filtering of a
    top-k that would return < k survivors.  Recall interaction: a
    selective predicate can leave fewer than k candidates in the
    probed cell; escalate with ``ivf_topk_multiprobe(..., predicate=)``
    (more cells per query) when the application needs a full k."""
    if predicate is not None:
        corpus = corpus.filter(predicate)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.col(cell_col).alias("_qcell"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col(cell_col).alias("_ccell"),
    )
    sims = (
        q.join(c, F.col("_qcell") == F.col("_ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


# --------------------------------------------------------------------------
# signed-random-projection LSH (hyperplane hashing for cosine)
# --------------------------------------------------------------------------

def rp_signature(
    vec_col: Column,
    hyperplanes: list[list[float]],
) -> Column:
    """Sign-bit array of ``vec · r_j`` for each hyperplane ``r_j``
    (Charikar 2002: P[bit_a = bit_b] = 1 − θ(a,b)/π).  The hyperplanes
    are driver-generated constants folded into the plan — each bit is a
    codegen'd zip_with/aggregate dot product, no UDF, no shuffle."""
    bits = [
        (
            dot_double(
                vec_col, F.array(*[F.lit(float(x)) for x in plane])
            )
            >= 0
        ).cast("int")
        for plane in hyperplanes
    ]
    return F.array(*bits)


def random_hyperplanes(n_bits: int, dim: int, seed: int = 13) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (fixed seed ⇒ reproducible
    signatures across runs and cluster sizes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def rp_lsh_pairs(
    corpus: DataFrame,
    threshold: float,
    n_bits: int = 32,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 13,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Cosine near-duplicate pairs WITHOUT a precomputed cell column:
    band the ``n_bits`` sign bits into ``bands`` bands (rows agreeing on
    ALL bits of some band become candidates — banded LSH exactly as in
    operators/dedup.py's MinHash pipeline), then verify true cosine ≥
    threshold on candidates only.

    Scale shape mirrors minhash_lsh_pairs: one signature projection,
    ONE posexplode over bands, an equi-join on (band, band-bits) — never
    all-pairs — with the same window-count ``max_bucket_size`` skew
    guard (a degenerate band value, e.g. many near-zero vectors, would
    otherwise fan out quadratically).  Recall rises with ``bands``
    (more, shorter bands ⇒ more candidates); precision comes from the
    exact verify step, so the knob trades compute for recall only."""
    if n_bits % bands:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    r = n_bits // bands
    planes = random_hyperplanes(n_bits, dim, seed)
    # fail fast on a vector whose length disagrees with dim: zip_with
    # would pad with NULLs and silently shorten band keys (aliasing
    # genuinely different signatures into one bucket)
    vec_checked = F.when(
        F.size(F.col(vec_col)) == dim, F.col(vec_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("rp_lsh_pairs: embedding length "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(f" != dim={dim}"),
            )
        )
    )
    sig = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        rp_signature(vec_checked, planes).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_vec",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "",
                        # NULL elements inside a right-length vector
                        # yield NULL bits; concat_ws would skip them
                        # (shortened, aliasing key) — map to a sentinel
                        # outside the 0/1 alphabet instead.  Such rows
                        # only ever pair with other malformed rows, and
                        # the exact-cosine verify (NULL sim) drops them.
                        *[
                            F.coalesce(
                                F.col("_sig").getItem(b * r + i).cast("string"),
                                F.lit("N"),
                            )
                            for i in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    w = Window.partitionBy("band", "key")
    banded = banded.withColumn("_bs", F.count(F.lit(1)).over(w)).filter(
        F.col("_bs") <= max_bucket_size
    )
    a = banded.select(
        F.col("band"), F.col("key"), F.col("_id").alias("ida"), F.col("_vec").alias("_va")
    )
    b = banded.select(
        F.col("band"), F.col("key"), F.col("_id").alias("idb"), F.col("_vec").alias("_vb")
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb", "_va", "_vb")
        .dropDuplicates(["ida", "idb"])
    )
    return (
        cand.select(
            "ida", "idb", cosine_sim(F.col("_va"), F.col("_vb")).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization to ``bits``-bit integer
    codes: ``(id, qvec: array<int>, scale: double)`` with
    ``x ≈ q · scale``.  At 100 TB this is the shuffle-diet move — int8
    codes cut every ANN/dedup exchange and the vector cache footprint
    4× vs float32 (16× vs float64), at <1% cosine error for typical
    embedding distributions.

    Map-side ``transform``/``array_max`` expressions only — no UDF, no
    shuffle.  Rounding is the explicit ``floor(x/scale + 0.5)`` formula
    rather than an engine ``round()`` (HALF_UP vs HALF_EVEN varies by
    engine); every step is IEEE-exact, so codes are bit-identical on
    any engine and the DuckDB oracle checks them value-for-value.
    All-zero vectors get ``scale = 0`` and all-zero codes (guarded —
    0/0 would be NaN and an ANSI cast error)."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (absmax / F.lit(qmax)).alias("scale")
    code = F.when(
        F.col("scale") == F.lit(0.0),
        F.transform(v, lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                x.cast("double") / F.col("scale") + F.lit(0.5)
            ).cast("long"),
        )
    )
    return (
        df.select(F.col(id_col), v, scale)
        .select(F.col(id_col), code.alias("qvec"), "scale")
    )


def ivf_trained_check(
    emb: DataFrame,
    n_take: int = 200,
    n_cells: int = 8,
    dim: int = 16,
    scale: int = 1000,
    seed_str: str = "ivf5:",
) -> DataFrame:
    """Engine-portable exact twin of the trained-IVF path
    (``ivf_topk_trained``): a deterministic quantizer fit — seeded
    farthest-from-nothing init (first ``n_cells`` vectors in
    md5-of-id order) plus ONE Lloyd iteration — whose every step is
    replayable in ANSI SQL, so a DuckDB oracle can verify centroid
    *training* and *assignment* value-for-value, the way
    ``minhash_lsh_check`` replays LSH banding.

    Exactness recipe (why this hash-matches across engines):
    - elements are quantized up front: ``q = floor(x·scale + 0.5)`` as
      BIGINT — a single IEEE multiply+floor per value, no
      accumulation, so both engines get identical ints;
    - all cross-row arithmetic (centroid sums, distances) is then
      INTEGER — order-free, exact on any engine;
    - the one division (centroid mean) is a single double op on exact
      integer inputs, identical everywhere, immediately re-floored to
      the integer grid: ``m = floor(S·scale/n + 0.5)``;
    - argmin ties break on cell id.

    Scale story: this is the *verification twin*, run on a reduced
    slice (``dim`` leading dimensions, ``n_take`` md5-sampled rows) —
    the production path is ``ivf_topk_trained`` (sampled MLlib fit,
    broadcast multiprobe).  The same plan shape still scales: one
    broadcast join per assignment, one (cell, pos) partial aggregate.

    Returns (vec_id, cell_init, cell_final, d2_scaled) — the cell
    after init-assignment, after the Lloyd step, and the final integer
    distance at scale² · 1e6.
    """
    h = F.md5(
        F.concat(F.lit(seed_str), F.col("vec_id").cast("string")).cast(
            "binary"
        )
    )
    q = F.transform(
        F.slice(F.col("embedding"), 1, dim),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)),
    )
    w = Window.orderBy("h", "vec_id")
    sub = (
        emb.select(F.col("vec_id"), q.alias("q"), h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_take)
        .select("vec_id", "q", "rn")
    )
    cent0 = sub.filter(F.col("rn") <= n_cells).select(
        (F.col("rn") - 1).alias("cell"), F.col("q").alias("c")
    )

    def d2(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    w_min = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cell"))
    assign0 = (
        sub.crossJoin(F.broadcast(cent0))
        .withColumn("_d", d2(F.col("q"), F.col("c")))
        .withColumn("_r", F.row_number().over(w_min))
        .filter(F.col("_r") == 1)
        .select("vec_id", "q", F.col("cell").alias("cell_init"))
    )
    ex = assign0.select(
        "vec_id", "cell_init", F.posexplode("q").alias("pos", "qd")
    )
    cent1 = (
        ex.groupBy("cell_init", "pos")
        .agg(F.sum("qd").alias("S"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "m",
            F.floor(
                F.col("S").cast("double") * scale / F.col("n") + F.lit(0.5)
            ),
        )
        .groupBy(F.col("cell_init").alias("cell"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda t: t["m"],
            ).alias("c")
        )
    )
    return (
        assign0.crossJoin(F.broadcast(cent1))
        .withColumn(
            "_d", d2(F.transform("q", lambda x: x * scale), F.col("c"))
        )
        .withColumn("_r", F.row_number().over(w_min))
        .filter(F.col("_r") == 1)
        .select(
            "vec_id",
            "cell_init",
            F.col("cell").alias("cell_final"),
            F.col("_d").alias("d2_scaled"),
        )
    )


def trained_cells(
    emb: DataFrame,
    n_cells: int,
    dim: int = 64,
    scale: int = 1000,
    seed_str: str = "cells6:",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    backend: str | None = None,
) -> DataFrame:
    """Deterministic trained coarse quantizer over the FULL corpus:
    seeded init (the ``n_cells`` smallest rows by md5-of-id — one
    TakeOrderedAndProject, no global sort) + one integer-grid Lloyd
    step, then every row assigned to its nearest centroid.  Returns
    the input columns + ``cell_col``.

    This is the scale-safe cell generator for cell-blocked operators
    (``embedding_dup_pairs``): callers size ``n_cells ∝ corpus`` so
    cell populations stay constant as the corpus grows (BASELINE.md
    finding 2 — a FIXED cell count makes within-cell work quadratic).
    Unlike the MLlib fit in ``build_ivf_index``, every arithmetic step
    here is on the ``floor(x·scale+0.5)`` integer grid (cross-row sums
    exact, the one mean division re-floored), so cell assignments are
    bit-identical on any engine and a DuckDB oracle can verify them —
    which puts downstream cluster output behind the exact hash gate.

    Plan shape: centroids live driver-side (a quantizer small enough
    to ship is the IVF premise — same contract as ``probe_cells``),
    and assignment is a per-row argmin FOLD over the centroid literal:
    map-side, whole-stage-codegen'd, NO shuffle and NO window — the
    corpus is touched by exactly two passes (one to compute the Lloyd
    means, one by the consumer of the returned frame).  Only the
    n_cells seed rows (one TakeOrderedAndProject) and the n_cells×dim
    Lloyd means ever reach the driver.

    Backend (``backend=None`` auto-selects, overridable for tests):
    - ``'fold'`` (n_cells·dim ≤ 2048): the centroid literal folds into
      a Catalyst expression — zero serialization, fine for small k.
      Interpreted higher-order-function cost scales with the LITERAL
      size, so past ~2k scalars this path degrades sharply (the
      round-6 10× check measured a 400-cell fold effectively hung).
    - ``'arrow'`` (larger k): mapInPandas with the centroid matrix in
      the task closure; per batch ONE int64 matmul computes
      ``-2·q·cᵀ + |c|²`` (the |q|² term is row-constant, argmin-
      irrelevant) and an argmin picks first-minimal = smallest cell
      id — bit-identical to the fold (all arithmetic stays in int64;
      float64 would overflow 2^53 here).  This is the production
      shape for corpus-proportional k.

    Scale note: per-row work is n_cells·dim integer ops either way.
    With n_cells ∝ corpus that grows quadratically in total — at
    extreme scale swap in a two-level (residual) quantizer: route
    through √n_cells coarse cells, then assign within the routed
    subtree, keeping per-row work at 2·√n_cells distances.  The
    blocking contract downstream is unchanged."""
    if backend is None:
        backend = "fold" if n_cells * dim <= 2048 else "arrow"
    if backend not in ("fold", "arrow"):
        raise ValueError(f"unknown backend {backend!r}")
    h = F.md5(
        F.concat(F.lit(seed_str), F.col(id_col).cast("string")).cast("binary")
    )
    qarr = F.transform(
        F.slice(F.col(vec_col), 1, dim),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)),
    )

    def argmin_arrow(
        df: DataFrame, q_col: str, cents: list[tuple[int, list[int]]], out_col: str
    ) -> DataFrame:
        import numpy as np
        from pyspark.sql.types import IntegerType, StructField, StructType

        cell_ids = np.array([c for c, _ in cents], dtype=np.int32)
        cmat = np.array([v for _, v in cents], dtype=np.int64)
        cnorm = (cmat * cmat).sum(axis=1)

        def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for pdf in batches:
                out = pdf.copy()
                if pdf.empty:
                    out[out_col] = pd.Series([], dtype="int32")
                else:
                    q = np.array(pdf[q_col].tolist(), dtype=np.int64)
                    scores = -2 * (q @ cmat.T) + cnorm[None, :]
                    out[out_col] = cell_ids[scores.argmin(axis=1)]
                yield out

        # list concat, NOT StructType(...).add(...): add() mutates the
        # field list in place, and the constructor shares it with the
        # input frame's cached schema
        schema = StructType(
            df.schema.fields + [StructField(out_col, IntegerType())]
        )
        return df.mapInPandas(run, schema)

    def argmin_cell(qcol: Column, cents: list[tuple[int, list[int]]]) -> Column:
        """Fold over the centroid literal: running (best_d, best_cell),
        strict < so ties keep the earliest (= smallest) cell id —
        identical to an ORDER BY (d, cell) argmin."""
        arr = F.array(
            *[
                F.struct(
                    F.lit(cell).alias("cell"),
                    F.array(*[F.lit(int(v)) for v in c]).alias("c"),
                )
                for cell, c in cents
            ]
        )
        acc0 = F.struct(
            F.lit(2**62).cast("long").alias("bd"), F.lit(-1).alias("bc")
        )

        def step(acc: Column, s: Column) -> Column:
            d = F.aggregate(
                F.zip_with(qcol, s["c"], lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            better = d < acc["bd"]
            return F.struct(
                F.when(better, d).otherwise(acc["bd"]).alias("bd"),
                F.when(better, s["cell"]).otherwise(acc["bc"]).alias("bc"),
            )

        return F.aggregate(arr, acc0, step)["bc"]

    def assign(
        df: DataFrame, q_expr: Column, cents: list[tuple[int, list[int]]],
        out_col: str,
    ) -> DataFrame:
        if backend == "fold":
            return df.withColumn(out_col, argmin_cell(q_expr, cents))
        return argmin_arrow(
            df.withColumn("_qtmp", q_expr), "_qtmp", cents, out_col
        ).drop("_qtmp")

    # seed centroids: n_cells smallest md5 ranks — distributed top-k,
    # then the tiny result to the driver
    init_rows = (
        emb.select(F.col(id_col).alias("_iid"), qarr.alias("_iq"), h.alias("_ih"))
        .orderBy("_ih", "_iid")
        .limit(n_cells)
        .collect()
    )
    cent0 = [(i, [int(v) for v in r["_iq"]]) for i, r in enumerate(init_rows)]

    # one Lloyd step: map-side init assignment, one (cell, pos)
    # aggregate, means re-floored to the scale² grid; n_cells×dim rows
    # back to the driver
    mean_rows = (
        assign(emb.select(qarr.alias("_q")), F.col("_q"), cent0, "_cell0")
        .select("_cell0", F.posexplode("_q").alias("_pos", "_qd"))
        .groupBy("_cell0", "_pos")
        .agg(F.sum("_qd").alias("_S"), F.count(F.lit(1)).alias("_n"))
        .select(
            "_cell0",
            "_pos",
            F.floor(
                F.col("_S").cast("double") * scale / F.col("_n") + F.lit(0.5)
            ).alias("_m"),
        )
        .collect()
    )
    by_cell: dict[int, dict[int, int]] = {}
    for r in mean_rows:
        by_cell.setdefault(r["_cell0"], {})[r["_pos"]] = int(r["_m"])
    # empty cells vanish (no assigned rows → no mean): exactly as an
    # ORDER BY argmin over the aggregated table would drop them
    cent1 = [
        (cell, [means[p] for p in sorted(means)])
        for cell, means in sorted(by_cell.items())
    ]
    return assign(
        emb, F.transform(qarr, lambda x: x * scale), cent1, cell_col
    )


def ivfpq_check(
    emb: DataFrame,
    n_take: int = 200,
    n_cells: int = 4,
    n_codes: int = 8,
    n_subspaces: int = 4,
    dim: int = 16,
    n_queries: int = 8,
    shortlist: int = 10,
    k: int = 3,
    scale: int = 1000,
    seed_str: str = "ivfpq6:",
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the production ANN architecture
    at 100 TB (coarse quantize → per-cell PQ-ADC shortlist → exact
    re-rank of the shortlist), composed from the two oracled recipes
    ``ivf_trained_check`` (coarse stage) and ``pq_adc_check`` (PQ
    stage) so the ENTIRE composed pipeline replays in ANSI SQL:

    1. COARSE: seeded init (first ``n_cells`` rows in md5-of-id
       order) + one integer-grid Lloyd step; every vector (and hence
       every query — queries are md5 ranks ``n_codes+1 ..
       n_codes+n_queries``, disjoint from both init sets) gets a
       ``cell_final``.  nprobe=1: candidates = the query's cell.
    2. PQ: per-subspace codebooks (seeded init rows ``1..n_codes``,
       one integer-grid Lloyd step), encode all vectors to
       ``n_subspaces`` code ids.
    3. ADC SHORTLIST: per (query, subspace, code) integer LUT; a
       candidate's approximate d² is the sum of its codes' LUT
       entries; keep the ``shortlist`` closest per query (ties to the
       smaller neighbor id).
    4. RE-RANK: exact integer d² on the full ``dim``-slice grid for
       shortlist members only; top-``k`` per query.

    Production mapping: the coarse fit is a sampled MLlib k-means with
    broadcast centroids (``build_ivf_index``); PQ codebooks are
    likewise sample-trained and broadcast (M×K×(d/M) scalars); encode
    and LUT build are map-side; the ADC join moves only (candidate ×
    M) code ids — 8× smaller than int8 vectors — and the exact re-rank
    touches ``shortlist`` full vectors per query instead of the cell's
    thousands.  ``n_take`` caps the verification slice via one
    TakeOrderedAndProject (no full-corpus global sort; see
    ``pq_adc_check`` for the contrast).

    Returns (query_id, neighbor_id, rank, d2_exact, d2_pq): rank by
    exact distance, with the ADC estimate kept for recall analysis.
    """
    sub_dim = dim // n_subspaces
    if sub_dim * n_subspaces != dim:
        raise ValueError(f"n_subspaces={n_subspaces} must divide dim={dim}")
    if n_codes < n_cells:
        raise ValueError("n_codes must be >= n_cells (query ranks disjoint)")
    h = F.md5(
        F.concat(F.lit(seed_str), F.col("vec_id").cast("string")).cast(
            "binary"
        )
    )
    qarr = F.transform(
        F.slice(F.col("embedding"), 1, dim),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)),
    )
    # cap FIRST via orderBy+limit — TakeOrderedAndProject, a distributed
    # partial top-k, not a single-partition global sort; the rank window
    # then runs over n_take rows only
    capped = (
        emb.select(F.col("vec_id"), qarr.alias("q"), h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_take)
    )
    base = capped.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "vec_id"))
    ).select("vec_id", "q", "rn")

    def d2(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # --- stage 1: coarse quantizer (ivf_trained_check recipe) -----------
    cent0 = base.filter(F.col("rn") <= n_cells).select(
        (F.col("rn") - 1).alias("cell"), F.col("q").alias("c")
    )
    w_min = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cell"))
    assign0 = (
        base.crossJoin(F.broadcast(cent0))
        .withColumn("_d", d2(F.col("q"), F.col("c")))
        .withColumn("_r", F.row_number().over(w_min))
        .filter(F.col("_r") == 1)
        .select("vec_id", "q", "rn", F.col("cell").alias("cell_init"))
    )
    ex0 = assign0.select(
        "vec_id", "cell_init", F.posexplode("q").alias("pos", "qd")
    )
    cent1 = (
        ex0.groupBy("cell_init", "pos")
        .agg(F.sum("qd").alias("S"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "m",
            F.floor(
                F.col("S").cast("double") * scale / F.col("n") + F.lit(0.5)
            ),
        )
        .groupBy(F.col("cell_init").alias("cell"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda t: t["m"],
            ).alias("c")
        )
    )
    assign_f = (
        assign0.crossJoin(F.broadcast(cent1))
        .withColumn(
            "_d", d2(F.transform("q", lambda x: x * scale), F.col("c"))
        )
        .withColumn("_r", F.row_number().over(w_min))
        .filter(F.col("_r") == 1)
        .select("vec_id", "q", "rn", F.col("cell").alias("cell_final"))
    )

    # --- stage 2: PQ codebooks + encode (pq_adc_check recipe) -----------
    ex = assign_f.select(
        "vec_id", "rn", F.posexplode("q").alias("pos", "qd")
    ).withColumn("ss", (F.col("pos") / sub_dim).cast("int"))
    pcent0 = ex.filter(F.col("rn") <= n_codes).select(
        (F.col("rn") - 1).cast("int").alias("code"),
        "ss",
        "pos",
        F.col("qd").alias("cd"),
    )
    w_vs = Window.partitionBy("vec_id", "ss").orderBy(F.asc("_d"), F.asc("code"))
    pasg0 = (
        ex.join(F.broadcast(pcent0), ["ss", "pos"])
        .groupBy("vec_id", "ss", "code")
        .agg(
            F.sum((F.col("qd") - F.col("cd")) * (F.col("qd") - F.col("cd")))
            .alias("_d")
        )
        .withColumn("_r", F.row_number().over(w_vs))
        .filter(F.col("_r") == 1)
        .select("vec_id", "ss", "code")
    )
    pm = (
        pasg0.join(ex, ["vec_id", "ss"])
        .groupBy("ss", "code", "pos")
        .agg(F.sum("qd").alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            "ss",
            "code",
            "pos",
            F.floor(
                F.col("sq").cast("double") * scale / F.col("n") + F.lit(0.5)
            ).alias("md"),
        )
    )
    d1 = (F.col("qd") * scale - F.col("md")) * (F.col("qd") * scale - F.col("md"))
    enc = (
        ex.join(F.broadcast(pm), ["ss", "pos"])
        .groupBy("vec_id", "ss", "code")
        .agg(F.sum(d1).alias("_d"))
        .withColumn("_r", F.row_number().over(w_vs))
        .filter(F.col("_r") == 1)
        .select("vec_id", "ss", "code")
    )

    # --- stage 3: per-cell ADC shortlist --------------------------------
    qrows = ex.filter(
        (F.col("rn") > n_codes) & (F.col("rn") <= n_codes + n_queries)
    ).select(F.col("vec_id").alias("query_id"), "ss", "pos", "qd")
    lut = (
        qrows.join(F.broadcast(pm), ["ss", "pos"])
        .groupBy("query_id", "ss", "code")
        .agg(F.sum(d1).alias("ld"))
    )
    qcell = assign_f.filter(
        (F.col("rn") > n_codes) & (F.col("rn") <= n_codes + n_queries)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("cell_final").alias("_qc")
    )
    cand = (
        F.broadcast(qcell)
        .join(
            assign_f.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("cell_final").alias("_nc"),
            ),
            F.col("_qc") == F.col("_nc"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    w_sl = Window.partitionBy("query_id").orderBy(
        F.asc("d2_pq"), F.asc("neighbor_id")
    )
    sl = (
        cand.join(
            enc.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
        .join(F.broadcast(lut), ["query_id", "ss", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("ld").alias("d2_pq"))
        .withColumn("_r", F.row_number().over(w_sl))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id", "d2_pq")
    )

    # --- stage 4: exact re-rank of the shortlist ------------------------
    qarrs = assign_f.select("vec_id", "q")
    w_k = Window.partitionBy("query_id").orderBy(
        F.asc("d2_exact"), F.asc("neighbor_id")
    )
    return (
        sl.join(
            F.broadcast(
                qarrs.select(
                    F.col("vec_id").alias("query_id"), F.col("q").alias("_qq")
                )
            ),
            "query_id",
        )
        .join(
            qarrs.select(
                F.col("vec_id").alias("neighbor_id"), F.col("q").alias("_nq")
            ),
            "neighbor_id",
        )
        .withColumn("d2_exact", d2(F.col("_qq"), F.col("_nq")))
        .withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "d2_exact", "d2_pq")
    )


def pq_adc_check(
    emb: DataFrame,
    n_codes: int = 8,
    n_subspaces: int = 4,
    dim: int = 64,
    n_queries: int = 8,
    k: int = 3,
    scale: int = 1000,
    seed_str: str = "pq5:",
    n_take: int = 200,
) -> DataFrame:
    """Product-quantization ADC search, engine-portable and exact —
    the PQ member of the ANN family (brute / Arrow-BLAS / IVF /
    trained-IVF / RP-LSH), as a fully SQL-replayable twin built on the
    same integer-grid recipe as ``ivf_trained_check``:

    1. TRAIN: split vectors into ``n_subspaces`` contiguous subvectors;
       per subspace fit ``n_codes`` codewords — seeded init (subvectors
       of the first ``n_codes`` rows in md5-of-id order) + ONE Lloyd
       step, all arithmetic on the ``floor(x·scale+0.5)`` integer grid
       (cross-row sums integer, the one mean division re-floored).
    2. ENCODE: each vector → per-subspace argmin codeword id (integer
       distances, ties to the smaller code).
    3. ADC: per (query, subspace, code) an integer lookup-table
       distance; a candidate's approx d² is the sum of its codes' LUT
       entries — one integer sum, then top-k per query (ties to the
       smaller neighbor id).  Queries are rows ``n_codes+1 ..
       n_codes+n_queries`` in md5 order (disjoint from the init rows).

    Production mapping (this function is the verification twin): train
    on a sample with MLlib per-subspace k-means, broadcast the M×K×d/M
    codebook, encode map-side, and ADC-join candidates on (subspace,
    code) with the LUT broadcast — compute per candidate is M integer
    adds instead of d multiplies, and the code table is 8× smaller
    than int8 vectors (log2(K)·M bits).

    ``n_take`` bounds the verification slice to the smallest md5
    ranks via one orderBy+limit — a distributed TakeOrderedAndProject,
    not a single-partition global sort over the whole corpus (same
    contract as ``ivf_trained_check`` / ``ivfpq_check``).

    Returns (query_id, neighbor_id, rank, d2_pq) — d2_pq at
    scale²·1e6."""
    sub_dim = dim // n_subspaces
    if sub_dim * n_subspaces != dim:
        raise ValueError(f"n_subspaces={n_subspaces} must divide dim={dim}")
    h = F.md5(
        F.concat(F.lit(seed_str), F.col("vec_id").cast("string")).cast(
            "binary"
        )
    )
    capped = (
        emb.select(F.col("vec_id"), F.col("embedding"), h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_take)
    )
    base = capped.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "vec_id"))
    ).select("vec_id", "embedding", "rn")
    ex = base.select(
        "vec_id",
        "rn",
        F.posexplode(F.slice(F.col("embedding"), 1, dim)).alias("pos", "_x"),
    ).select(
        "vec_id",
        "rn",
        (F.col("pos") / sub_dim).cast("int").alias("ss"),
        "pos",
        F.floor(F.col("_x").cast("double") * scale + F.lit(0.5)).alias("qd"),
    )
    cent0 = ex.filter(F.col("rn") <= n_codes).select(
        (F.col("rn") - 1).cast("int").alias("code"),
        "ss",
        "pos",
        F.col("qd").alias("cd"),
    )
    w_vs = Window.partitionBy("vec_id", "ss").orderBy(F.asc("_d"), F.asc("code"))
    asg0 = (
        ex.join(F.broadcast(cent0), ["ss", "pos"])
        .groupBy("vec_id", "ss", "code")
        .agg(
            F.sum((F.col("qd") - F.col("cd")) * (F.col("qd") - F.col("cd")))
            .alias("_d")
        )
        .withColumn("_r", F.row_number().over(w_vs))
        .filter(F.col("_r") == 1)
        .select("vec_id", "ss", "code")
    )
    m = (
        asg0.join(ex, ["vec_id", "ss"])
        .groupBy("ss", "code", "pos")
        .agg(F.sum("qd").alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            "ss",
            "code",
            "pos",
            F.floor(
                F.col("sq").cast("double") * scale / F.col("n") + F.lit(0.5)
            ).alias("md"),
        )
    )
    d1 = (F.col("qd") * scale - F.col("md")) * (F.col("qd") * scale - F.col("md"))
    enc = (
        ex.join(F.broadcast(m), ["ss", "pos"])
        .groupBy("vec_id", "ss", "code")
        .agg(F.sum(d1).alias("_d"))
        .withColumn("_r", F.row_number().over(w_vs))
        .filter(F.col("_r") == 1)
        .select("vec_id", "ss", "code")
    )
    q = ex.filter(
        (F.col("rn") > n_codes) & (F.col("rn") <= n_codes + n_queries)
    ).select(F.col("vec_id").alias("query_id"), "ss", "pos", "qd")
    lut = (
        q.join(F.broadcast(m), ["ss", "pos"])
        .groupBy("query_id", "ss", "code")
        .agg(F.sum(d1).alias("ld"))
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.asc("d2_pq"), F.asc("neighbor_id")
    )
    return (
        enc.join(F.broadcast(lut), ["ss", "code"])
        .groupBy(F.col("query_id"), F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("ld").alias("d2_pq"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "d2_pq")
    )


# --------------------------------------------------------------------------
# IVF index persistence — fit once, save, reload, query without refit
# --------------------------------------------------------------------------

def save_ivf_index(
    assigned: DataFrame, model, path: str, cell_col: str = "cell"
) -> None:
    """Persist a fitted IVF index: the cell-assigned corpus as parquet
    PARTITIONED BY the cell column, plus the MLlib quantizer model.

    The partitioning IS the index: at query time only the probed
    cells' directories are read (partition pruning — ``PartitionFilters``
    in the scan, pinned in tests), so a top-k probe over C cells reads
    ~nprobe/C of a 100 TB corpus instead of scanning it.  Fitting is
    the expensive step at scale; this is what "build the index once,
    serve many query batches" looks like in plain Spark — no index
    server, just a layout."""
    assigned.write.partitionBy(cell_col).mode("overwrite").parquet(
        f"{path}/corpus"
    )
    model.write().overwrite().save(f"{path}/quantizer")


def load_ivf_index(spark, path: str):
    """Reload ``save_ivf_index`` output: (cell-assigned corpus
    DataFrame, fitted KMeansModel).  The corpus scan stays lazy — a
    downstream cell filter prunes partitions before any file is
    read."""
    from pyspark.ml.clustering import KMeansModel

    corpus = spark.read.parquet(f"{path}/corpus")
    model = KMeansModel.load(f"{path}/quantizer")
    return corpus, model


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    predicate=None,
) -> DataFrame:
    """Query a PERSISTED index: assign each query to its cell with the
    reloaded quantizer (map-side transform of the tiny query side),
    then run the cell-blocked ``ivf_topk`` against the partitioned
    corpus — the equi-join on the partition column reaches the scan as
    a partition filter, so only the probed cells' files are read.

    ``predicate`` (Column or SQL string over the indexed corpus's
    columns) enables predicate+vector serving: it is applied to the
    corpus BEFORE the cell join, so it reaches the same pruned scan as
    a PushedFilters data filter — PartitionFilters still prune to the
    probed cells (pytest-pinned), and only predicate survivors are
    ranked.  A selective predicate can leave < k survivors in a
    query's cell; serve those queries again via
    ``ivf_topk_multiprobe(..., predicate=)`` with nprobe > 1 (recall
    escalation at linear cost), or re-fit with fewer cells."""
    from pyspark.ml.functions import array_to_vector

    corpus, model = load_ivf_index(spark, path)
    if predicate is not None:
        corpus = corpus.filter(predicate)
    feat = f"_features_{cell_col}"
    q = (
        model.transform(
            queries.drop(cell_col, feat).withColumn(
                feat, array_to_vector(F.col(vec_col))
            )
        )
        .drop(feat)
    )
    return ivf_topk(
        corpus, q, k=k, id_col=id_col, vec_col=vec_col, cell_col=cell_col
    )


def append_to_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> None:
    """Grow a persisted IVF index without rebuilding: assign the new
    vectors to cells with the SAVED quantizer (a map-side transform of
    the new slice only) and append them to the cell-partitioned
    corpus — the append lands in the touched cells' directories,
    existing files untouched.  The ANN sibling of the fingerprint-
    store append (operators/incremental.py): slice-by-slice corpus
    growth at O(slice) cost.

    Contract: the quantizer is FROZEN at fit time, so probes after N
    appends return exactly what a one-pass index assigned with the
    same model would (pytest-pinned) — but cell balance degrades if
    the data distribution drifts from the fit sample; re-fitting
    (``build_ivf_index`` + ``save_ivf_index``) is the periodic
    rebuild, the same size-to-corpus maintenance as re-sizing bloom
    geometry or cell count as the corpus grows."""
    from pyspark.ml.functions import array_to_vector

    _, model = load_ivf_index(spark, path)
    feat = f"_features_{cell_col}"
    assigned = (
        model.transform(
            new_vectors.drop(cell_col, feat).withColumn(
                feat, array_to_vector(F.col(vec_col))
            )
        )
        .drop(feat)
    )
    assigned.write.partitionBy(cell_col).mode("append").parquet(
        f"{path}/corpus"
    )


def ivf_index_stats(spark, path: str, skew_threshold: float = 4.0) -> dict:
    """Health report for a persisted IVF index — the ANN sibling of
    the fingerprint store's ``index_stats`` maintenance probe
    (operators/incremental.py): the numbers that say when the frozen
    quantizer has drifted from the data and ``build_ivf_index`` +
    ``save_ivf_index`` should re-fit.

    - ``n_vectors``, ``n_cells_configured`` (quantizer k),
      ``n_cells_used`` (non-empty partitions);
    - ``min/mean/max_cell_size`` and ``cell_skew`` = max/mean: a
      balanced index sits near 1; appends from a drifted distribution
      pile into few cells, degrading probe cost toward a full scan on
      exactly the queries that land there;
    - ``needs_refit``: skew past ``skew_threshold`` or fewer than
      half the configured cells in use — the same "geometry sized to
      the corpus" contract as ``needs_bloom_resize``, measured.

    Driver-side scalars from ONE aggregate over the cell column (the
    partition key — column-pruned scan, no vector bytes read)."""
    from pyspark.ml.clustering import KMeansModel

    model = KMeansModel.load(f"{path}/quantizer")
    n_conf = len(model.clusterCenters())
    per_cell = (
        spark.read.parquet(f"{path}/corpus")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("n_vectors"),
            F.count(F.lit(1)).alias("n_cells_used"),
            F.min("n").alias("min_cell"),
            F.max("n").alias("max_cell"),
            F.avg("n").alias("mean_cell"),
        )
        .first()
    )
    n_vec = int(per_cell["n_vectors"] or 0)
    used = int(per_cell["n_cells_used"] or 0)
    mean = float(per_cell["mean_cell"] or 0.0)
    skew = float(per_cell["max_cell"]) / mean if mean > 0 else 0.0
    return {
        "n_vectors": n_vec,
        "n_cells_configured": n_conf,
        "n_cells_used": used,
        "min_cell_size": int(per_cell["min_cell"] or 0),
        "max_cell_size": int(per_cell["max_cell"] or 0),
        "mean_cell_size": mean,
        "cell_skew": skew,
        "needs_refit": bool(
            n_vec > 0 and (skew > skew_threshold or used * 2 < n_conf)
        ),
    }


def rp_lsh_check(
    emb: DataFrame,
    n_take: int = 200,
    n_bits: int = 16,
    bands: int = 4,
    dim: int = 16,
    threshold: float = 0.45,
    scale: int = 1000,
    seed_str: str = "rplsh6:",
) -> DataFrame:
    """Exact verification twin of ``rp_lsh_pairs`` (hyperplane LSH for
    cosine): the same pipeline — sign-bit signatures → banded bucket
    join → exact-cosine verify — on the INTEGER GRID, so every stage
    replays in ANSI SQL and the whole operator sits behind a DuckDB
    value-hash (completing the exact-twin discipline: this was the
    last rows-only family without an oracled sibling).

    Grid recipe (same style as ``ivf_trained_check``/``pq_adc_check``):
    hyperplane coefficient r[j][d] = (md5int(seed‖j‖':'‖d) mod 2001) −
    1000 — integers, replayable by both engines; vectors floor to
    scale·x grid.  All dot products are sums of ≤ 3·10⁶-magnitude
    INTEGER terms held in doubles, so accumulation order cannot change
    a bit and the sign of every signature bit (and the final cosine,
    computed as dot/(√na·√nb) in the identical operation order) is
    engine-identical.  The production form keeps Gaussian hyperplanes
    (better angular resolution per bit); recall semantics for it are
    pinned by the planted-neighbor pytest, and THIS twin proves the
    banding/bucketing/verify machinery value-exact."""
    import hashlib

    if n_bits % bands:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    r = n_bits // bands
    planes = [
        [
            float(
                (
                    int(
                        hashlib.md5(
                            f"{seed_str}{j}:{d}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % 2001
                )
                - 1000
            )
            for d in range(dim)
        ]
        for j in range(n_bits)
    ]
    h = F.md5(
        F.concat(F.lit(seed_str), F.col("vec_id").cast("string")).cast(
            "binary"
        )
    )
    grid = F.transform(
        F.slice(F.col("embedding"), 1, dim),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)),
    )
    capped = (
        emb.select(F.col("vec_id"), grid.alias("q"), h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_take)
        .drop("h")
    )
    sig = capped.select(
        F.col("vec_id").alias("_id"),
        F.col("q").alias("_vec"),
        rp_signature(F.col("q"), planes).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_vec",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "",
                        *[
                            F.col("_sig").getItem(b * r + i).cast("string")
                            for i in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a = banded.select("band", "key", F.col("_id").alias("ida"),
                      F.col("_vec").alias("_va"))
    b = banded.select("band", "key", F.col("_id").alias("idb"),
                      F.col("_vec").alias("_vb"))
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb", "_va", "_vb")
        .dropDuplicates(["ida", "idb"])
    )
    return cand.select(
        "ida", "idb", cosine_sim(F.col("_va"), F.col("_vb")).alias("sim")
    ).filter(F.col("sim") >= threshold)


# --------------------------------------------------------------------------
# persisted IVF-PQ: the served form of the production ANN architecture
# --------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 16,
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
    fit_fraction: float | None = None,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: an independent k-means per
    vector SUBSPACE (Jégou et al. 2011) via MLlib, fit on a seeded
    sample.  Returns ``n_subspaces`` lists of ``n_codes`` sub-dim
    centroids — M·K·(d/M) scalars, a few KB: task-closure-sized model
    state (BASELINE.md finding 4), persisted as a tiny parquet by
    ``save_ivfpq_index``.

    The driver loop runs M SMALL fits, not one big one — each fit's
    input is the corpus sliced to d/M columns; at 100 TB you fit on a
    sample (``fit_fraction``) exactly like the coarse quantizer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if dim % n_subspaces:
        raise ValueError(
            f"n_subspaces={n_subspaces} must divide dim={dim}"
        )
    sub = dim // n_subspaces
    src = corpus.select(vec_col)
    if fit_fraction:
        src = src.sample(fit_fraction, seed=seed).coalesce(4)
    books = []
    for m in range(n_subspaces):
        sliced = src.select(
            array_to_vector(
                F.slice(F.col(vec_col), m * sub + 1, sub)
            ).alias("_f")
        )
        model = KMeans(
            k=n_codes, seed=seed + m, featuresCol="_f",
            predictionCol="_c", maxIter=max_iter,
        ).fit(sliced)
        books.append([list(map(float, c)) for c in model.clusterCenters()])
    return books


def encode_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Map-side PQ encoding: for each subspace, the argmin-distance
    codebook id — pure codegen expressions (M·K small d² aggregates
    folded into the plan; the codebooks are a few KB of literals, far
    under the one-literal rule's boundary).  Adds ``code_col`` as
    ``array<int>`` of length M; no shuffle, no UDF."""
    n_subspaces = len(codebooks)
    sub = len(codebooks[0][0])

    def d2(a: Column, cent: list[float]) -> Column:
        return F.aggregate(
            F.zip_with(
                a,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    for m, book in enumerate(codebooks):
        sl = F.slice(F.col(vec_col), m * sub + 1, sub)
        dists = F.array(*[d2(sl, cent) for cent in book])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.withColumn(code_col, F.array(*codes))


def save_ivfpq_index(
    spark,
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    n_subspaces: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> None:
    """Build and persist the full IVF-PQ index — the 100 TB serving
    layout:

    - ``codes/``  — (id, M int8-sized codes) PARTITIONED BY cell:
      the ADC scan reads THIS tree only — 8-32× smaller than the
      vectors, and partition-pruned to the probed cells;
    - ``vectors/`` — (id, full vector): touched only by the exact
      re-rank, which fetches ``shortlist`` rows per query by id;
    - ``quantizer/`` + ``codebooks/`` — the frozen models (MLlib
      k-means; M·K sub-centroids as a tiny parquet).

    Splitting codes from vectors is the point: ANN throughput at
    corpus scale is bounded by bytes scanned per probe, and the code
    tree is the only thing a probe scans."""
    assigned, model = build_ivf_index(
        corpus, n_cells=n_cells, vec_col=vec_col, seed=seed,
        fit_fraction=fit_fraction,
    )
    books = train_pq_codebooks(
        corpus, n_subspaces=n_subspaces, n_codes=n_codes,
        vec_col=vec_col, seed=seed, fit_fraction=fit_fraction,
    )
    coded = encode_pq(assigned, books, vec_col=vec_col)
    coded.select(id_col, "codes", "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(f"{path}/codes")
    # vectors partitioned by a 256-way id-hash bucket: the re-rank
    # collects the shortlist's distinct buckets (BOUNDED ≤ 256) and
    # prunes the fetch to the touched directories — the same
    # partition-pruned point-lookup layout as the fingerprint store
    corpus.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(256))
        .cast("int")
        .alias("vb"),
    ).write.partitionBy("vb").mode("overwrite").parquet(
        f"{path}/vectors"
    )
    model.write().overwrite().save(f"{path}/quantizer")
    rows = [
        (m, c, books[m][c])
        for m in range(n_subspaces)
        for c in range(n_codes)
    ]
    spark.createDataFrame(
        rows, "m int, code int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
) -> DataFrame:
    """Serve top-k from a persisted IVF-PQ index: assign each query's
    cell with the frozen quantizer (map-side, tiny side) → scan ONLY
    the probed cells of the CODE tree (partition pruning) → ADC: per
    (query, subspace, code) distance LUT joined against the candidate
    codes (moves M small ints per candidate, never a vector) →
    ``shortlist`` best per query → exact-cosine re-rank fetching just
    those ids from the vector tree.

    Returns (query_id, neighbor_id, rank, sim) — rank by exact cosine
    over the shortlist; with ``shortlist`` ≥ cell size this equals the
    cell-exact ``ivf_topk`` result (pytest-pinned), smaller shortlists
    trade recall for re-rank I/O.

    ``predicate`` (over the CODE tree's columns — metadata columns
    must be materialized into the codes parquet at build/append time
    to be filterable) is applied before the ADC join, i.e. BENEATH the
    shortlist: survivors-only enter the LUT scoring, so the shortlist
    is not silently eaten by rows the filter would discard afterwards.
    Same recall note as ``ivf_topk_from_index``: selective predicates
    can starve a cell below k — raise ``shortlist``/re-probe."""
    from pyspark.ml.clustering import KMeansModel
    from pyspark.ml.functions import array_to_vector

    model = KMeansModel.load(f"{path}/quantizer")
    books_df = spark.read.parquet(f"{path}/codebooks")
    feat = "_features_cell"  # build_ivf_index's features column
    q = (
        model.transform(
            queries.drop("cell", feat).withColumn(
                feat, array_to_vector(F.col(vec_col))
            )
        )
        .drop(feat)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.col("cell").alias("_qcell"),
        )
        .localCheckpoint(eager=True)  # small by contract; reused 3×
    )
    sub = books_df.select(F.size("centroid")).first()[0]
    # per (query, m, code) ADC LUT: Q×M×K rows, broadcast-sized
    lut = (
        q.crossJoin(F.broadcast(books_df))
        .select(
            "query_id",
            "m",
            "code",
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("_qvec"), F.col("m") * sub + 1, sub),
                    F.col("centroid"),
                    lambda x, y: (x.cast("double") - y)
                    * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_d"),
        )
    )
    cells = [r["_qcell"] for r in q.select("_qcell").distinct().collect()]
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin(cells)
    )
    if predicate is not None:
        codes = codes.filter(predicate)
    cand = (
        q.select("query_id", "_qcell")
        .join(codes, F.col("_qcell") == F.col("cell"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("m", "code"),
        )
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_d").alias("d2_pq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2_pq"), F.asc("neighbor_id")
    )
    short = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .drop("_r")
        .withColumn(
            "vb",
            F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(256)).cast(
                "int"
            ),
        )
        .localCheckpoint(eager=True)  # Q×shortlist rows, small
    )
    buckets = [
        r["vb"] for r in short.select("vb").distinct().collect()
    ]  # bounded: ≤ 256 by construction
    vecs = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("vb").isin(buckets))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_nvec"),
        )
    )
    ranked = (
        short.drop("vb").join(vecs, "neighbor_id")
        .join(q.select("query_id", "_qvec"), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("_qvec"), F.col("_nvec")).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def append_to_ivfpq_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted IVF-PQ index at O(slice): the FROZEN coarse
    quantizer assigns cells and the FROZEN codebooks encode the new
    vectors (both map-side), codes append into the touched cells'
    directories and vectors into their id-hash buckets.  Same
    contract as ``append_to_ivf_index``: probes after N appends equal
    a one-pass index under the same models (pytest-pinned), and
    distribution drift is answered by periodic refit — the quantizer
    AND the codebooks age together, so the rebuild replaces both."""
    from pyspark.ml.clustering import KMeansModel
    from pyspark.ml.functions import array_to_vector

    model = KMeansModel.load(f"{path}/quantizer")
    books_rows = (
        spark.read.parquet(f"{path}/codebooks")
        .orderBy("m", "code")
        .collect()  # bounded: M×K rows of sub-dim centroids
    )
    n_subspaces = 1 + max(r["m"] for r in books_rows)
    n_codes = 1 + max(r["code"] for r in books_rows)
    books = [
        [None] * n_codes for _ in range(n_subspaces)
    ]
    for r in books_rows:
        books[r["m"]][r["code"]] = list(r["centroid"])

    feat = "_features_cell"
    assigned = (
        model.transform(
            new_vectors.drop("cell", feat).withColumn(
                feat, array_to_vector(F.col(vec_col))
            )
        )
        .drop(feat)
    )
    coded = encode_pq(assigned, books, vec_col=vec_col)
    coded.select(id_col, "codes", "cell").write.partitionBy(
        "cell"
    ).mode("append").parquet(f"{path}/codes")
    new_vectors.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(256))
        .cast("int")
        .alias("vb"),
    ).write.partitionBy("vb").mode("append").parquet(
        f"{path}/vectors"
    )
