"""100× scale spot-check for the round-9 operators (documents-only
readers, so the ``.scale100`` replication covers them), plus the
quiet-window recheck of ``corpus_diff_summary`` (measured 6.0× in
round 8's degraded co-tenancy window — its two dedup-shaped
aggregates + one fingerprint full-outer join should be ~linear).

Expected shapes:
- ``trigram_surprisal_scores`` — model-side counts bounded by the
  model slice's distinct n-grams; candidate side compressed to
  per-(doc, trigram) counts before three gram-key joins.  Cost grows
  with distinct trigrams (cf. the bigram scorer's documented 14.9×),
  sub-quadratic always.
- ``url_normalize_check`` / ``url_dedup_keeper_rows`` /
  ``domain_mix_report`` — map-side regex projections plus at most one
  groupBy: ~linear.
- ``multimodal_header_meta`` — Arrow batch build + O(1) header parse
  per row: ~linear.
- ``corpus_diff_summary`` — recheck (r8 measured in a noisy window).

Usage: SPARK_DRIVER_MEMORY=48g SPARK_GRAFT_CPUS=32 \
    python tools/spotcheck_r9.py [scale_dir]
(the 4 g default heap OOMs on the 100x near-dup sweep, same as the
10x note in BASELINE.md)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from dwc_dataframe_validator_spark import registry
from dwc_dataframe_validator_spark.sources.tables import local_session

OPS = (
    "trigram_surprisal_scores",
    "url_normalize_check",
    "url_dedup_keeper_rows",
    "domain_mix_report",
    "multimodal_header_meta",
    "corpus_diff_summary",
    # late round-9 additions (documents-based): water-filling mixture
    # (bounded agg + map-side CASE), grouped quality histogram
    # (map-side bucketing + bounded-bucket windows), TV drift (two
    # histograms + bounded full-outer join)
    "target_mixture_stats",
    "quality_histogram_by_source",
    "quality_drift_tv_by_source",
    # DSIR: two token passes (bounded 256-bucket weight fit broadcast
    # into the scoring join) — ~linear in corpus tokens
    "dsir_scores_lang",
    # line explode + line-key aggregate (+ reassembly groupBy for the
    # scrub); WARC/WET are map-side byte/regex projections — ~linear
    "boilerplate_line_stats",
    "boilerplate_scrub_corpus",
    "warc_roundtrip_check",
    "warc_wet_extract_check",
    # published rule sets + fuzzy dedup: map-side projections (Gopher,
    # C4) and the pair-bounded LSH→components→keepers chain
    "gopher_quality_report",
    "c4_cleanup_corpus",
    "gopher_ngram_repetition",
    "minhash_dedup_keepers",
)


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100"
    spark = local_session("spotcheck-r9")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    out = {}
    for name in OPS:
        row = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                              ("x100", scale_dir)):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.time() - t0, 1)
            # several registry queries cache intermediates for their
            # own run (shingle indexes etc.) without a session-level
            # unpersist; in this ONE-session sweep over 17 ops at 100×
            # the accumulated executor storage OOMs the heap — drop it
            # between measurements so each op is timed from a clean
            # cache, like the per-round bench does per process
            spark.catalog.clearCache()
        row["ratio"] = round(row["x100"] / max(row["sf0.1"], 0.1), 1)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
