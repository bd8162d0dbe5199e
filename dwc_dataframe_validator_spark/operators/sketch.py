"""Count-min sketch: sublinear frequency estimation for heavy hitters.

The reference has no sketching surface (SURVEY §2 — none; its
distinct/duplicate checks are exact).  At 100 TB, "how often does each
of these values occur" over an unbounded key space wants a fixed-size
summary: the count-min sketch (Cormode & Muthukrishnan 2005) keeps a
``depth × width`` grid of counters; every row increments one counter
per hash row, and a point estimate is the MIN over its ``depth``
counters — an overestimate by at most ``ε·N`` with probability
``1 − (1/2)^depth`` for ``width = e/ε``.

Design choices that make this Spark- and oracle-friendly:

- **The sketch is a DataFrame** of ``(row, bucket, cnt)`` cells, not a
  driver-side array: built with one scan (posexplode of the ``depth``
  bucket ids — map-side partial aggregation collapses each partition to
  ≤ depth·width cells before the shuffle), merged by plain ``SUM``
  (commutative ⇒ the sketch is independent of partitioning and retries,
  hence deterministic), and at most ``depth·width`` rows total —
  broadcastable by construction.  Sketches of different data slices
  union+re-aggregate into the sketch of the union, the streaming-merge
  property that makes CMS work in a distributed setting.
- **Hashing is md5-prefix mod width** — engine-portable (identical in
  DuckDB), so estimates are value-reproducible and the registry checks
  the WHOLE sketch pipeline against an exact SQL oracle, not just
  "estimate ≥ exact".  No Python UDF anywhere: ``md5``/``conv``/``pmod``
  are codegen'd built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, j: int, width: int) -> Column:
    """Hash row ``j``'s bucket for a value: first 8 hex chars of
    ``md5('<j>:' || value)`` as an int, mod width.  32-bit prefix —
    collision behavior is the point of a sketch, not a hazard."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), col.cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
    )
    return h % width


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch over ``value_col``: a ``(row, bucket, cnt)``
    DataFrame with ≤ depth·width rows.  One scan, one shuffle of
    ≤ depth·width rows per input partition."""
    c = F.col(value_col)
    buckets = F.array(*[_bucket(c, j, width) for j in range(depth)])
    return (
        df.filter(c.isNotNull())
        .select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each distinct value in ``queries[value_col]``:
    min over the value's ``depth`` sketch cells.  The sketch side is
    ≤ depth·width rows — broadcast, so this is a map-side join plus a
    tiny aggregation; a cell absent from the sketch means 0.  Output:
    ``(value_col, cms_est)``, an overestimate of the true count."""
    c = F.col(value_col)
    buckets = F.array(*[_bucket(c, j, width) for j in range(depth)])
    q = queries.select(c).distinct().select(
        c, F.posexplode(buckets).alias("row", "bucket")
    )
    return (
        q.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .select(value_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(value_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


# --------------------------------------------------------------------------
# Bloom filter — approximate set membership (Bloom 1970).  Completes the
# sketch family: CMS answers "how often", HLL "how many distinct", Bloom
# "have I seen this".  The 100 TB use case is a semi-join against a set
# too big to broadcast exactly but whose BITS fit anywhere: k·ln2 bits
# per member at the target false-positive rate (≈ 14.4 bits/member for
# 0.1%), e.g. a 10^9-member reference set in ~1.7 GB — streamed once,
# probed map-side with zero shuffle.
#
# Same representation discipline as the CMS: the filter is a DataFrame
# of SET BIT POSITIONS (≤ m rows), not a driver-side bitset — built
# with one scan + one distinct (map-side partials collapse each
# partition to ≤ m positions before the shuffle), merged with plain
# UNION/DISTINCT (filters of slices combine into the filter of the
# union), and broadcast for probing.  Hashing reuses `_bucket`'s
# md5-prefix scheme, so the whole build+probe pipeline is reproducible
# in DuckDB and sits behind an exact value-level oracle — including
# which probes are FALSE POSITIVES, not just "no false negatives".
# --------------------------------------------------------------------------


def bloom_build(
    df: DataFrame, value_col: str, k: int = 5, m: int = 4096
) -> DataFrame:
    """Build the filter over ``value_col``: a single-column DataFrame
    ``(pos)`` of distinct set bit positions, ≤ m rows.  Each non-null
    value sets ``k`` bits, position ``j`` = md5-prefix of ``'<j>:' ||
    value`` mod ``m`` (identical to the CMS bucket hash)."""
    c = F.col(value_col)
    positions = F.array(*[_bucket(c, j, m) for j in range(k)])
    return (
        df.filter(c.isNotNull())
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_contains(
    filter_df: DataFrame,
    probes: DataFrame,
    value_col: str,
    k: int = 5,
    m: int = 4096,
) -> DataFrame:
    """Probe each distinct ``probes[value_col]`` against the filter:
    ``(value_col, bloom_positive)`` where positive ⇔ all ``k`` bit
    positions are set.  The filter side is ≤ m rows — broadcast hash
    join, so probing is map-side with no shuffle on the probe stream
    beyond the final per-value aggregation.  No false negatives by
    construction; false positives at the classic (1−e^{−kn/m})^k
    rate."""
    c = F.col(value_col)
    positions = F.array(*[_bucket(c, j, m) for j in range(k)])
    q = probes.filter(c.isNotNull()).select(c).distinct().select(
        c, F.explode(positions).alias("pos")
    )
    hit = filter_df.withColumn("set_bit", F.lit(1))
    return (
        q.join(F.broadcast(hit), "pos", "left")
        .groupBy(value_col)
        .agg((F.count("set_bit") == F.lit(k)).alias("bloom_positive"))
    )


def km_positions(hex_col: Column, k: int, m: int) -> list:
    """Kirsch-Mitzenmacher double hashing for values that already ARE
    md5 hex strings (window/document fingerprints): position ``j`` =
    ``(h1 + j·h2) mod m`` with h1, h2 two disjoint 32-bit slices of
    the existing digest (h2 forced odd — coprime to the power-of-two
    ``m``, so the j-sequence cycles the full bit space).  Zero
    additional md5 per probe versus k full rehashes in ``_bucket`` —
    on a 100 TB screen that is the difference between k digests and
    two substring-convs per window.  KM 2006: two independent hashes
    preserve the Bloom FP asymptotics of k independent ones."""
    h1 = F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hex_col, 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(m)) for j in range(k)]


def bloom_build_hex(
    df: DataFrame, hex_col: str, k: int = 5, m: int = 65536
) -> DataFrame:
    """``bloom_build`` for md5-hex fingerprint columns, using the
    ``km_positions`` derivation (no rehash).  Pair with
    ``bloom_test_hex`` — the two schemes are not interchangeable."""
    c = F.col(hex_col)
    return (
        df.filter(c.isNotNull())
        .select(F.explode(F.array(*km_positions(c, k, m))).alias("pos"))
        .distinct()
    )


def bloom_test_hex(col: Column, words: list, k: int, m: int) -> Column:
    """``bloom_test`` for md5-hex fingerprints via ``km_positions`` —
    two substring-convs per probe instead of k md5 digests."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for pos in km_positions(col, k, m):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        cond = cond & (F.getbit(word, pos % 64) == 1)
    return cond


def bloom_pack(filter_df: DataFrame, m: int) -> list:
    """Fold the filter's ≤ m set-bit positions into ``m/64`` signed
    64-bit words on the driver — a BOUNDED collect (the same contract
    as a broadcast side: the filter's size is m bits by construction,
    independent of how many values were inserted).  The packed words
    are what ships to executors inside the probe expression — the
    "broadcast-able model state belongs in a task closure" rule from
    BASELINE.md finding 4."""
    words = [0] * ((m + 63) // 64)
    for row in filter_df.collect():
        p = row["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement into Spark's signed LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_pack_bytes(filter_df: DataFrame, m: int) -> bytes:
    """``bloom_pack`` to a SINGLE byte string instead of a word list:
    bit ``p`` lives at byte ``p >> 3``, in-byte offset ``p & 7`` —
    the little-endian layout of the packed words, so the two forms are
    bit-identical (parity pytest-pinned).

    Why a second packing exists: the word-list probe embeds the filter
    as ``k × m/64`` expression-tree NODES (an array literal per
    probe), and driver-side analysis of that tree goes superlinear —
    the round-6 10× spot-check measured a 9 s FIXED planning cost at
    m = 2^20 that dwarfed the per-row work (0.8 s for 50k rows).  A
    byte string is ONE literal node regardless of m, so planning cost
    is flat and the filter scales to the tens-of-MB range before the
    next boundary (plan-serialization size per task — past that, drop
    the bloom and rely on the exact co-partitioned anti-join, which
    the incremental-dedup contract already makes correct-without-it).
    """
    words = bloom_pack(filter_df, m)
    ba = bytearray(len(words) * 8)
    for i, w in enumerate(words):
        ba[i * 8 : (i + 1) * 8] = (w & ((1 << 64) - 1)).to_bytes(
            8, "little"
        )
    return bytes(ba)


_BYTE_MASKS = [1 << b for b in range(8)]


def bloom_test_hex_bytes(
    col: Column, blob: bytes, k: int, m: int
) -> Column:
    """``bloom_test_hex`` against a ``bloom_pack_bytes`` filter: same
    Kirsch-Mitzenmacher bit positions, same verdicts bit-for-bit, but
    the filter is one binary literal — use this form whenever m can
    grow with the data (the corpus-store screen); the word-list form
    is only fine for small fixed m."""
    bin_lit = F.lit(blob)
    masks = F.array(*[F.lit(b) for b in _BYTE_MASKS])
    cond = F.lit(True)
    for pos in km_positions(col, k, m):
        byte_idx = F.shiftright(pos, 3).cast("int")
        byte = F.conv(
            F.hex(F.substring(bin_lit, byte_idx + 1, 1)), 16, 10
        ).cast("int")
        mask = F.element_at(masks, F.pmod(pos, F.lit(8)).cast("int") + 1)
        cond = cond & (byte.bitwiseAND(mask) != 0)
    return cond


def bloom_test(col: Column, words: list, k: int, m: int) -> Column:
    """MAP-SIDE membership test against packed filter words: AND over
    the value's ``k`` md5-grid bit positions, each read with
    ``getbit`` from an array-of-longs literal.  Pure whole-stage-
    codegen expressions — no join, no shuffle, no per-row Python — so
    screening a 100 TB corpus against a benchmark set costs exactly
    one scan.  Expression size is m/64 literals: fine to the few-
    hundred-KB range; past that (finding 4's ~2k-scalar rule) move the
    words into an Arrow ``mapInPandas`` closure instead."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for j in range(k):
        pos = _bucket(col, j, m)
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        cond = cond & (F.getbit(word, pos % 64) == 1)
    return cond
