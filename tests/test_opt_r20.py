"""Round-20 optimization pins for the hardened payload cache
(functions/payload_cache.py): collision-resistant key (the published
md5-colliding block pair must NOT share a cache entry), byte-budget
bound, and the None-returning-decode sentinel fix."""

from __future__ import annotations

import hashlib

from dwc_dataframe_validator_spark.functions.payload_cache import (
    _approx_bytes,
    payload_memo,
)

#: the published md5-colliding 128-byte block pair (Wang et al.) —
#: two DIFFERENT payloads with identical md5; the r19 md5-keyed cache
#: would have silently emitted the first payload's decode for both
_MD5_COLLIDE_A = bytes.fromhex(
    "d131dd02c5e6eec4693d9a0698aff95c2fcab58712467eab4004583eb8fb7f89"
    "55ad340609f4b30283e488832571415a085125e8f7cdc99fd91dbdf280373c5b"
    "d8823e3156348f5bae6dacd436c919c6dd53e2b487da03fd02396306d248cda0"
    "e99f33420f577ee8ce54b67080a80d1ec69821bcb6a8839396f9652b6ff72a70"
)
_MD5_COLLIDE_B = bytes.fromhex(
    "d131dd02c5e6eec4693d9a0698aff95c2fcab50712467eab4004583eb8fb7f89"
    "55ad340609f4b30283e4888325f1415a085125e8f7cdc99fd91dbd7280373c5b"
    "d8823e3156348f5bae6dacd436c919c6dd53e23487da03fd02396306d248cda0"
    "e99f33420f577ee8ce54b67080280d1ec69821bcb6a8839396f965ab6ff72a70"
)


def test_md5_colliding_payloads_get_distinct_entries():
    # precondition: the pair really is an md5 collision of distinct bytes
    assert _MD5_COLLIDE_A != _MD5_COLLIDE_B
    assert (
        hashlib.md5(_MD5_COLLIDE_A).digest()
        == hashlib.md5(_MD5_COLLIDE_B).digest()
    )

    calls = []

    def decode(b: bytes):
        calls.append(bytes(b))
        return hashlib.sha256(b).hexdigest()

    memo = payload_memo(decode)
    ra = memo(_MD5_COLLIDE_A)
    rb = memo(_MD5_COLLIDE_B)
    assert ra != rb  # each payload decodes to ITS OWN result
    assert ra == hashlib.sha256(_MD5_COLLIDE_A).hexdigest()
    assert rb == hashlib.sha256(_MD5_COLLIDE_B).hexdigest()
    assert len(calls) == 2
    # and the cache still dedups true re-occurrences
    assert memo(_MD5_COLLIDE_A) == ra
    assert len(calls) == 2


def test_none_returning_decode_is_cached_not_recomputed():
    calls = []

    def decode(b: bytes):
        calls.append(bytes(b))
        return None  # the honest "bad payload" tail some decoders use

    memo = payload_memo(decode)
    assert memo(b"corrupt") is None
    assert memo(b"corrupt") is None
    assert memo(b"corrupt") is None
    assert calls == [b"corrupt"]  # r19 recomputed None per row


def test_byte_budget_resets_cache():
    calls = []
    big = "x" * 1024  # ~2 KB retained per cached value

    def decode(b: bytes):
        calls.append(bytes(b))
        return big

    # budget of ~10 KB → reset after a handful of entries, long before
    # the 1024-entry count bound
    memo = payload_memo(decode, maxsize=1024, max_bytes=10 * 1024)
    payloads = [bytes([k]) * 4 for k in range(64)]
    for p in payloads:
        assert memo(p) == big
    assert calls == payloads  # all distinct: every payload decoded once
    # re-probing the full set forces recomputation of evicted entries —
    # bounded memory, never a wrong value
    for p in payloads:
        assert memo(p) == big
    assert len(calls) > len(payloads)  # some resets really happened
    assert all(c in payloads for c in calls)


def test_approx_bytes_counts_nested_tails():
    flat = _approx_bytes((b"abcd", "ef", 7, None))
    assert flat > len(b"abcd") + 2 * len("ef")
    nested = _approx_bytes([(b"abcd", "ef"), (b"abcd", "ef")])
    assert nested > 2 * _approx_bytes((b"abcd", "ef")) - 60
