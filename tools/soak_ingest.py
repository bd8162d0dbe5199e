"""Multi-slice ingestion soak at real scale — see BASELINE.md.

The incremental-ingestion claims were measured (rounds 5-6) as ONE
slice against a 10× store; the production loop is N slices with
maintenance interleaved.  This tool drives the full loop at sf0.1+:

- heldout index = a ~5% md5-chosen split of ``documents``;
- the remaining docs split into N contiguous doc_id ranges (ids
  increase across slices, so first-seen == min-id and the one-shot
  oracle is expressible);
- each slice runs ``ingest_slice_clean`` (decontaminate → dedup →
  store append) and is WALL-TIMED; after each slice the stats probe
  runs and fires ``compact_index`` / ``rebuild_bloom`` when the
  triggers say so (maintenance time reported separately);
- at the end, the accumulated survivors are checked against the
  one-shot global dedup+decontamination of the concatenated slices
  (exact set equality), and per-slice times are reported so flatness
  is a read-off, not a claim.

Usage: python tools/soak_ingest.py [sf_dir] [n_slices] [log2_m]
``log2_m`` seeds the bloom geometry (default 15 — deliberately small
at sf0.1 so the resize trigger + rebuild path exercises in-run; pass
the sized-to-corpus value, e.g. 21 for ~100k fingerprints, to read
slice-time flatness without bloom-churn noise).
Prints one JSON line: {"slices": [...], "maintenance": [...],
"flat_ratio": last/first, "survivors_match": bool, ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dwc_dataframe_validator_spark.operators import incremental as inc
from dwc_dataframe_validator_spark.operators.pipeline import span_contamination
from dwc_dataframe_validator_spark.operators.text import fingerprint
from dwc_dataframe_validator_spark.sources.tables import local_session, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    log2_m = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    spark = local_session("soak_ingest")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    held_pred = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    ) < F.lit("0d")  # ~5%
    heldout = docs.filter(held_pred).localCheckpoint()
    corpus = docs.filter(~held_pred).localCheckpoint()
    lo, hi = corpus.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    span = (hi - lo + 1 + n_slices - 1) // n_slices

    d = tempfile.mkdtemp(prefix="soak_")
    ipath, hpath = f"{d}/idx", f"{d}/held"
    inc.save_heldout_index(heldout, hpath, w=8)
    inc.save_fingerprint_index(
        inc.fingerprint_store(
            spark.createDataFrame([], "doc_id long, text string")
        ),
        ipath,
        m=1 << log2_m,
    )

    slices, maintenance = [], []
    survivors: set = set()
    for s in range(n_slices):
        batch = corpus.filter(
            (F.col("doc_id") >= lo + s * span)
            & (F.col("doc_id") < lo + (s + 1) * span)
        )
        t0 = time.time()
        surv = inc.ingest_slice_clean(spark, ipath, hpath, batch)
        ids = {r["doc_id"] for r in surv.collect()}
        dt = time.time() - t0
        survivors |= ids
        slices.append(round(dt, 2))
        stats = inc.index_stats(spark, ipath)
        t1 = time.time()
        acted = []
        if stats["needs_bloom_resize"]:
            inc.rebuild_bloom(spark, ipath)
            acted.append("rebuild_bloom")
        if stats["needs_compaction"]:
            inc.compact_index(spark, ipath)
            acted.append("compact")
        if acted:
            maintenance.append(
                {"after_slice": s, "actions": acted,
                 "sec": round(time.time() - t1, 2),
                 "fill": round(stats["bloom_fill_ratio"], 3)}
            )
        print(
            f"slice {s}: {dt:.2f}s ingest, {len(ids)} survivors, "
            f"fill {stats['bloom_fill_ratio']:.3f}"
            + (f", maintenance {acted}" if acted else ""),
            file=sys.stderr,
        )

    # one-shot oracle over the concatenation
    contaminated = (
        span_contamination(corpus, heldout)
        .filter("confirmed_windows > 0")
        .select("doc_id")
    )
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    want = {
        r["keeper"]
        for r in fingerprint(clean)
        .filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper"))
        .collect()
    }
    half = max(1, n_slices // 2)
    first_half = sum(slices[:half]) / half
    second_half = sum(slices[half:]) / max(1, len(slices) - half)
    out = {
        "sf_dir": sf_dir,
        "n_slices": n_slices,
        "slice_sec": slices,
        "maintenance": maintenance,
        "second_half_over_first_half": round(second_half / first_half, 2),
        "survivors": len(survivors),
        "survivors_match_one_shot": survivors == want,
        "store_rows": inc.load_fingerprint_index(spark, ipath)[0].count(),
    }
    print(json.dumps(out))
    shutil.rmtree(d)
    spark.stop()


if __name__ == "__main__":
    main()
