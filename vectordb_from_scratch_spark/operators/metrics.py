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

__all__ = ["latency_report", "heavy_hitters", "countmin_estimates"]


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


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    capacity: int = 128,
    *,
    total: int | None = None,
) -> DataFrame:
    """EXACT frequent items above the n/capacity threshold via the
    classic two-pass sketch-then-verify design (Misra–Gries 1982 +
    recount; the same shape Spark's own freqItems and every production
    heavy-hitter pipeline use — public algorithms):

    Pass 1 — each partition streams its rows through a Misra–Gries
    summary of `capacity` counters (bounded memory, one pass, Arrow-
    batched). MG guarantees any item with partition count > n_p/capacity
    survives its partition's summary; by pigeonhole, any item with
    GLOBAL count > n/capacity exceeds that in ≥1 partition, so the UNION
    of partition candidates is a guaranteed superset of the true heavy
    hitters. Only ≤ capacity keys per partition ever leave the executor
    — the full key cardinality is never shuffled.

    Pass 2 — semi-join the corpus to the (tiny, broadcast) candidate
    set and count exactly; filter count > n/capacity. The result is
    EXACT — the sketch only prunes, never decides — which is what makes
    the operator value-exact oracle-twinnable (GROUP BY/HAVING twin)
    despite its approximate core.

    At 100 TB: pass 1 reads everything once and emits
    partitions×capacity rows; pass 2 re-reads with a broadcast
    semi-join (Bloom-prunable) and aggregates only matching keys. No
    full-cardinality shuffle ever happens — the reason this beats a
    plain groupBy at extreme key cardinality.

    The n/capacity threshold stays IN-PLAN (a broadcast one-row count
    joined into the filter) — no driver-side count job; pass `total` to
    pin it to a known constant instead. Returns (key, cnt, share)
    sorted by cnt desc, key asc."""
    key_field = df.schema[key_col]

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for k in pdf[key_col]:
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    # decrement-all: drop zeroed counters
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame({key_col: list(counters.keys())})

    candidates = (
        df.select(key_col)
        .mapInPandas(mg, schema=f"{key_col} {key_field.dataType.simpleString()}")
        .distinct()
    )
    if total is not None:
        tot = df.sparkSession.range(1).select(F.lit(total).alias("__n"))
    else:
        tot = df.agg(F.count(F.lit(1)).alias("__n"))
    exact = (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") > F.col("__n").cast("double") / F.lit(capacity))
    )
    return exact.select(
        key_col,
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("__n"), 6).alias("share"),
    ).orderBy(F.col("cnt").desc(), F.col(key_col).asc())


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    stream summary: the count-min sketch and its applications", 2005 —
    public): depth×width counters; every row increments one cell per
    hash row; a key's estimate is the MIN of its cells — never an
    underestimate, over by at most εn with probability 1-δ
    (ε = e/width, δ = e^-depth).

    Distributed build in ONE JVM-side pass: the groupBy(d, cell)
    aggregation IS the sketch — map-side partial aggregation keeps
    per-partition state at depth×width counters and the shuffle carries
    at most depth×width rows TOTAL, independent of row count or key
    cardinality (the reason a sketch beats exact groupBy when keys
    explode). Hashes are the shared md5-nibble recipe
    (functions.text.hex_value_from_md5), so cells — and therefore every
    estimate — are deterministic and engine-portable: the whole sketch
    is value-exact oracle-twinnable despite being an approximation.

    Returns (key, cm_est, true_cnt, overestimate) for every distinct
    key — the exact count rides along to exhibit the one-sided
    guarantee (cm_est ≥ true_cnt always; equality unless cells
    collide). In production the true count is of course omitted; it is
    the demonstrandum here, not a dependency of the estimate."""
    from ..functions import text as X

    def cells_for(k: Column) -> Column:
        return F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                (
                    X.hex_value_from_md5(
                        F.md5(F.concat(F.lit(f"{d}:"), k)), 0, 8
                    ) % F.lit(width)
                ).alias("cell"),
            )
            for d in range(depth)
        ])

    keyed = df.select(F.col(key_col).cast("string").alias("__k"))
    sketch = (
        keyed.select(F.explode(cells_for(F.col("__k"))).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    keys = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("true_cnt"))
    qcells = keys.select(
        key_col, "true_cnt",
        F.explode(cells_for(F.col(key_col).cast("string"))).alias("c"),
    ).select(key_col, "true_cnt", F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
    est = (
        qcells.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy(key_col, "true_cnt")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return est.select(
        key_col, "cm_est", "true_cnt",
        (F.col("cm_est") - F.col("true_cnt")).alias("overestimate"),
    )
