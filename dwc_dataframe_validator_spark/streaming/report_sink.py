"""Incremental validation sink: fold per-micro-batch validation
reports into one running report via ``foreachBatch``.

This closes the loop between the batch validator and the streaming
surface: every micro-batch is validated with the SAME
``validate_occurrence_dataframe`` code path (no streaming-specific
metric logic to drift), and the per-batch reports fold with
``model.merge_df_reports`` — exact for all row-local metrics
(merge-then-report ≡ report-on-union, pinned in tests/test_sinks.py),
with one documented caveat: duplicate-ID errors are counted per
micro-batch, so an ID repeated ACROSS batches is not flagged (see
``merge_df_reports``' contract; run a global exact-dedup pass on the
ID column if cross-batch uniqueness matters).

At 100 TB-scale ingestion this is the validation pattern: each
micro-batch/partition/day validates independently (embarrassingly
parallel, no cross-slice state), and the driver folds a handful of
scalars per slice.  The fold itself is O(report size), not O(data).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from ..model import DFValidationReport, merge_df_reports


class RunningReport:
    """Driver-side fold state for streaming validation.  ``report`` is
    None until the first non-empty batch; ``n_batches`` counts folds.

    ``foreachBatch`` is at-least-once: a micro-batch can be
    re-delivered with the same ``batch_id``.  The fold tracks the last
    folded id and skips replays so every additive metric is counted
    exactly once (batch ids are monotonically increasing within a
    streaming query).

    SCOPE: the guard covers re-delivery WITHIN one driver process —
    retried/replayed micro-batches of a live query.  The fold state
    itself lives on this driver, not in the streaming checkpoint, so
    after a driver restart the engine replays from its checkpoint into
    a FRESH ``RunningReport`` (starting over, not double-counting).
    Resuming an accumulated report across restarts requires the caller
    to persist this object (e.g. its ``__dict__`` next to the
    checkpoint dir) and restore it before re-attaching the sink."""

    def __init__(self) -> None:
        self.report: Optional[DFValidationReport] = None
        self.n_batches = 0
        self.last_batch_id: Optional[int] = None

    def fold(
        self, batch_report: DFValidationReport, batch_id: int | None = None
    ) -> None:
        if (
            batch_id is not None
            and self.last_batch_id is not None
            and batch_id <= self.last_batch_id
        ):
            return  # replayed micro-batch: already folded
        if batch_id is not None:
            self.last_batch_id = batch_id
        self.n_batches += 1
        if self.report is None:
            self.report = batch_report
        else:
            self.report = merge_df_reports(self.report, batch_report)


def validation_report_sink(
    stream: DataFrame,
    id_fields: Sequence[str],
    running: RunningReport,
    queryName: str = "validation_reports",
):
    """Attach the incremental-validation sink to a streaming DataFrame
    and return the started StreamingQuery.  Caller owns lifecycle
    (``.awaitTermination()`` / ``.stop()``); the folded report lives in
    ``running.report``.

    Empty batches are skipped (validating an empty frame would emit
    spurious missing-field errors for a slice that simply had no
    rows this trigger)."""
    from ..operators.validate import validate_occurrence_dataframe

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            running.fold(
                validate_occurrence_dataframe(batch_df, list(id_fields)),
                batch_id=batch_id,
            )

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
