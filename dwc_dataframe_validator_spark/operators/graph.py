"""Connected components over near-duplicate pair graphs.

Pair generators (operators/dedup.py, operators/similarity.py) emit
EDGES — "A duplicates B" — but a training-data pipeline needs
CLUSTERS: transitive groups sharing one survivor.  A–B and B–C must
collapse to one keeper even though A–C was never emitted.  The
reference has nothing comparable (SURVEY §2.5/2.7 — none).

Algorithm: iterative min-label propagation WITH pointer doubling.
Every node starts labelled with itself; each round (1) replaces a
node's label with the min of its own and its neighbors' labels, then
(2) shortcuts: replaces the label with the label's OWN current label
(labels are node ids, so this is one self-join lookup).  Step (1)
alone needs O(diameter) rounds — a 10× scale spot-check found exactly
that failure: near-threshold noise edges chained components into
diameters past 25 and the loop never converged.  The shortcut step
compresses label paths geometrically (the Shiloach–Vishkin idea, same
effect as the large-star/small-star alternation of Kiveris et al.,
SoCC 2014), so convergence is O(log diameter) rounds — 25 rounds
covers diameters ~2^25 — at the cost of one extra shuffle join per
round.

Scale notes: state is (node, label) for nodes that appear in SOME pair
— a small fraction of the corpus, orders of magnitude below the input.
Each round is one shuffle join (edges ⋈ labels) + one min-aggregate +
one join back.  Per-round checkpointing truncates lineage so plans stay
flat — ``localCheckpoint`` by default (local mode), a reliable
``checkpoint()`` when ``checkpoint_dir`` is given (clusters: survives
executor loss); the convergence check is a count aggregate per round —
the unavoidable driver sync point of any iterate-to-fixpoint algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "ida",
    dst: str = "idb",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Component assignment ``(node, cluster)`` for every node in the
    edge list; ``cluster`` is the component's minimum node id.  Raises
    if the fixpoint isn't reached in ``max_iterations`` rounds (a
    pathological chain — see module docstring).

    SCALE-ADAPTIVE STRATEGY: when the (deduplicated, undirected) edge
    set has ≤ ``local_threshold`` rows, the closure is solved with a
    driver-side union-find instead of the iterative join loop — the
    edge list is the SMALL output of a near-dup pair generator
    (banding/thresholds bound it), so like a broadcast join this is a
    bounded driver structure by contract (100k edges ≈ a few MB), and
    it replaces ~log(diameter) driver-synced shuffle rounds with one
    collect.  Results are identical (min-label semantics both ways).
    Pass ``local_threshold=0`` to force the distributed loop; raise it
    when the driver has memory to spare.  At 100 TB the pair graph
    can exceed any driver, and the loop below is the path that scales.

    ``checkpoint_dir``: on a real cluster pass a RELIABLE (HDFS/object
    store) directory — per-round truncation then uses ``checkpoint()``,
    which survives executor loss.  The default ``localCheckpoint``
    stores blocks on executors: fast, and fine on local mode, but a
    single executor failure mid-loop kills the job with no lineage to
    recompute."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint()
    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = _ckpt(und)
    if local_threshold:
        # und is materialized (checkpoint above): the count is free-ish
        n_und = und.count()
        if n_und <= local_threshold:
            return _local_components(spark, und)
    labels = _ckpt(
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        nbr_min = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("mid_label"),
            )
        )
        # pointer doubling: follow the new label one hop (labels are
        # node ids, and every label value exists as a node).  Labels
        # only ever decrease, so the lookup can only improve — this is
        # what makes long chains collapse in O(log d) rounds.
        lookup = stepped.select(
            F.col("node").alias("_ln"), F.col("mid_label").alias("_ll")
        )
        updated = (
            stepped.join(lookup, stepped["mid_label"] == lookup["_ln"], "left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("mid_label"),
                    F.coalesce(F.col("_ll"), F.col("mid_label")),
                ).alias("new_label"),
            )
        )
        # checkpoint BEFORE the convergence count: one materialization
        # of the round's join feeds both the count and the next
        # round's labels (counting first would recompute the join)
        updated = _ckpt(updated)
        changed = updated.filter(F.col("new_label") < F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster"))
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iterations} rounds — "
        "component diameter exceeds the bound; raise max_iterations or use "
        "guarded pair generation to cap cluster sizes"
    )


def _local_components(spark, und: DataFrame) -> DataFrame:
    """Driver-side union-find over a bounded undirected edge list,
    labelling every node with its component's minimum id — the same
    output contract as the distributed loop.  Path-halving find +
    union by root keeps this near-linear; the result ships back as a
    (node, cluster) frame with the edge column's own type."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in und.collect():
        a, b = r["a"], r["b"]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict = {}
    for v in parent:
        roots.setdefault(find(v), []).append(v)
    rows = []
    for members in roots.values():
        lo = min(members)
        rows.extend((v, lo) for v in members)
    node_t = und.schema["a"].dataType
    out_schema = StructType(
        [StructField("node", node_t), StructField("cluster", node_t)]
    )
    return spark.createDataFrame(rows, out_schema)


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster size and keeper (= the min-id label itself):
    ``(cluster, size, n_dropped)``.  The dedup contract: keep ``cluster``
    (one row per group), drop the other ``size − 1``."""
    return (
        components.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"))
        .withColumn("n_dropped", F.col("size") - F.lit(1))
    )
