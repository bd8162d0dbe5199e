"""Metric-plan compiler.

The engine's tiny "planner": validation checks declare named aggregate
expressions into a :class:`MetricPlan`; the plan executes them all in a
SINGLE ``df.agg(...)`` job (one scan, partial aggregation on executors,
one collected Row) and hands named scalar results back to the checks.

This replaces the reference's ≥10 eager pandas passes per table
(``dwc_validator/validate.py:27-84``) with one distributed scan — the
fixed-size aggregate state (a few hundred longs at most) is what makes
this hold at 100 TB: no per-row data ever returns to the driver.

No Catalyst extension APIs are needed; the "compiler" output is a list
of Column expressions that Catalyst fuses into whole-stage codegen.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame


class MetricPlan:
    """Accumulates named aggregate expressions, runs them in one pass."""

    def __init__(self) -> None:
        self._exprs: dict[str, Column] = {}
        self._row: dict[str, Any] | None = None

    def add(self, name: str, expr: Column) -> str:
        """Register an aggregate expression under a unique name."""
        if name in self._exprs:
            raise ValueError(f"duplicate metric name: {name}")
        self._exprs[name] = expr
        return name

    @property
    def names(self) -> list[str]:
        return list(self._exprs)

    def aggregate_dataframe(self, df: DataFrame) -> DataFrame:
        """The single-job aggregate as a LAZY one-row DataFrame, one
        column per metric, aliased by metric name (Spark aliases accept
        arbitrary characters).  ``execute`` collects it; callers that
        want to stay lazy use this."""
        aliased = [
            expr.alias(name) for name, expr in self._exprs.items()
        ]
        return df.agg(*aliased)

    def execute(self, df: DataFrame) -> dict[str, Any]:
        """One ``df.agg(*exprs)`` job → {metric name: scalar}."""
        if not self._exprs:
            return {}
        row = self.aggregate_dataframe(df).collect()[0]
        self._row = {name: row[name] for name in self._exprs}
        return self._row

    def __getitem__(self, name: str) -> Any:
        if self._row is None:
            raise RuntimeError("MetricPlan.execute() not yet called")
        return self._row[name]

    def get(self, name: str, default: Any = None) -> Any:
        if self._row is None:
            raise RuntimeError("MetricPlan.execute() not yet called")
        return self._row.get(name, default)
