"""Sequential slices of the query registry — assembled, in order,
by ``dwc_dataframe_validator_spark.registry`` (the append-only
chain: part1 → part6, then the curated DRIVER_WINDOW tail).
Pure mechanical split of the former 11.4k-line registry.py
(round 19); zero name changes.
"""
