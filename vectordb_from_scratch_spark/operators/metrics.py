"""Observability operators — the reference's MetricsCollector analog
(SURVEY.md §2.5 S3: counters + avg and nearest-rank/interpolated latency
percentiles, src/metrics.rs:25-72).

In a Spark engine, per-query latencies live in a DataFrame (or the event
log); the percentile report is one exact `percentile` aggregation —
distributed, no driver-side sort. `percentile_approx` (t-digest) is the
100 TB path where exact sort-per-group would shuffle too much; both are
exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["latency_report", "heavy_hitters"]


def latency_report(
    timings: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    approx: bool = False,
) -> DataFrame:
    """Per-group count / avg / p50 / p95 / p99 over a latency-like column —
    the response shape of the reference's GET /metrics
    (src/server/routes.rs:85-93). `approx=True` switches to t-digest
    percentile_approx for scale (no exact sort per group)."""
    v = F.col(value_col)
    if approx:
        pct = lambda p: F.percentile_approx(v, p)  # noqa: E731
    else:
        pct = lambda p: F.percentile(v, p)  # noqa: E731
    return timings.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(v.cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        F.round(pct(0.5), 6).alias("p50"),
        F.round(pct(0.95), 6).alias("p95"),
        F.round(pct(0.99), 6).alias("p99"),
    )
