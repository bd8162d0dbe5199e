"""Per-task decode-once-per-distinct-payload cache (r19 opt round).

Every Arrow decode mapper in this package is a pure function of the
payload bytes, and real corpora are full of byte-identical blobs
(re-uploads, mirrors, boilerplate assets — the premise of the exact-
dedup operators).  Wrapping the per-payload computation in a bounded
per-task cache keyed on the payload's md5 makes each distinct blob
decode once per task instead of once per row — the degenerate local
form of the optimization guide's "decide with small rows, move/decode
heavy bytes once" (§8) applied at the task level, plus per-task
heavyweight-state amortization per §4.5.

Scope discipline: callers construct the cache inside their
``mapInPandas`` ``run`` closure, so it is created per Spark task and
dies with it — nothing persists across queries, runs, or processes,
and results always derive from the payload bytes read this run.
``maxsize`` bounds memory; on overflow the cache resets (duplicate-
poor corpora then pay one dict probe per row, ~µs).  Cached values
must be immutable row tails (tuples/bytes/str), safe to emit
repeatedly.
"""

from __future__ import annotations

import hashlib


def payload_memo(decode, maxsize: int = 1024):
    """Wrap a pure payload-bytes → row-tail(s) function with a bounded
    md5-keyed cache.  See module docstring for the contract."""
    cache: dict = {}

    def wrapped(payload: bytes):
        k = hashlib.md5(payload).digest()
        hit = cache.get(k)
        if hit is None:
            if len(cache) >= maxsize:
                cache.clear()
            hit = cache[k] = decode(payload)
        return hit

    return wrapped
