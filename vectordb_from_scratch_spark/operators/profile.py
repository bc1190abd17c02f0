"""One-pass column profiling — the data-quality screen a pipeline runs
before trusting a new drop of data (the same statistics Deequ/TFDV-style
validators compute; public pattern). Row count, null count, distinct
count, and numeric min/max/mean for every requested column, in a SINGLE
aggregation over ONE scan.

Scale notes:
- `exact=True` uses count(DISTINCT col) per column. Spark plans multiple
  distinct aggregates via Expand: the scan's rows are replicated once
  per distinct-agg into narrow (grouping-id, value) tuples before the
  partial aggregate. That is an O(columns) row blow-up of a NARROW
  projection — acceptable at oracle scale and for modest column lists,
  and it is the only plan that is value-exact cross-engine.
- `exact=False` swaps in approx_count_distinct (HyperLogLog++): no
  Expand, one true pass, mergeable sketches — the 100-TB default. The
  rest of the profile is identical, so callers flip one flag to trade
  exactness for the single-pass plan.
- Means go through exact DECIMAL sums (order-independent; see
  plans/relational._dec_sum) so profiles are stable across partitionings
  and engines.

Output is long-format — one row per profiled column:
  (column, n_rows, n_null, n_distinct, mean, min_val, max_val)
with mean/min_val/max_val NULL for non-numeric columns. Long format
keeps the schema fixed as the column list varies, which is what lets
downstream drift checks diff two profiles with a plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile", "drift_chisq"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(df: DataFrame, columns: list[str] | None = None, *, exact: bool = True) -> DataFrame:
    """Profile `columns` (default: all non-complex columns) of `df` in
    one aggregation job; see module docstring for the contract."""
    fields = [
        f for f in df.schema.fields
        if (columns is None or f.name in columns)
        and not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if not fields:
        raise ValueError("no profilable columns selected")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f.name)
        nd = F.count_distinct(c) if exact else F.approx_count_distinct(c)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias(f"{f.name}__nnull"))
        aggs.append(nd.cast("long").alias(f"{f.name}__nd"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(
                (F.sum(c.cast("decimal(18,4)")).cast("double") / F.count(c)).alias(f"{f.name}__mean")
            )
            aggs.append(F.min(c).cast("double").alias(f"{f.name}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{f.name}__max"))

    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    structs = []
    for f in fields:
        is_num = isinstance(f.dataType, _NUMERIC)
        structs.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{f.name}__nnull").alias("n_null"),
                F.col(f"{f.name}__nd").alias("n_distinct"),
                (F.round(F.col(f"{f.name}__mean"), 6) if is_num else null_d).alias("mean"),
                (F.round(F.col(f"{f.name}__min"), 6) if is_num else null_d).alias("min_val"),
                (F.round(F.col(f"{f.name}__max"), 6) if is_num else null_d).alias("max_val"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def drift_chisq(
    baseline: DataFrame, current: DataFrame, key_col: str
) -> DataFrame:
    """Categorical drift between two snapshots of the same stream — the
    chi-square goodness-of-fit screen a training-data pipeline runs
    before ingesting a new window (TFDV/Evidently-style check, public
    pattern). Expected counts scale the baseline distribution to the
    current window's volume; each category's contribution is
    (observed − expected)²/expected, and Σ contributions is the
    statistic to compare against a chi-square critical value.

    Chi-square (not PSI/KL) deliberately: it needs only +,−,×,÷ on
    exact counts, every one an IEEE correctly-rounded operation, so the
    result is bit-identical across engines — log-based divergences
    inherit libm variance and cannot be hash-verified cross-engine.

    Scale: two count-aggregates (map-side partials) + one join on the
    key — shuffles one row per category, never the data; the grand
    totals come from a window over the per-category frame (bounded by
    category cardinality, which is small by the definition of a
    categorical column), so the whole statistic is ONE lazy plan with
    exactly one scan per input and no eager driver actions. Returns
    (key, base_cnt, cur_cnt, expected, chisq_contrib) per category,
    full-outer so a category that appears or vanishes is visible
    (expected 0 → contribution NULL, the loudest drift signal of all);
    an EMPTY baseline yields expected NULL on every row rather than a
    division-by-zero artifact.
    """
    from pyspark.sql import Window

    b = baseline.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("base_cnt")
    )
    c = current.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cur_cnt")
    )
    w = Window.partitionBy(F.lit(1))
    j = (
        b.join(c, "key", "full_outer")
        .withColumn("base_cnt", F.coalesce("base_cnt", F.lit(0)))
        .withColumn("cur_cnt", F.coalesce("cur_cnt", F.lit(0)))
        .withColumn("__bt", F.sum("base_cnt").over(w))
        .withColumn("__ct", F.sum("cur_cnt").over(w))
    )
    expected = F.when(
        F.col("__bt") > 0,
        F.col("base_cnt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__bt").cast("double"),
    )
    # (o−e)·(o−e), not pow(o−e, 2): Math.pow is not guaranteed correctly
    # rounded, explicit multiply is — this is what keeps the statistic
    # bit-identical under the cross-engine hash
    diff = F.col("cur_cnt").cast("double") - expected
    contrib = F.when(F.col("base_cnt") > 0, diff * diff / expected)
    return j.select(
        F.col("key"),
        "base_cnt",
        "cur_cnt",
        F.round(expected, 6).alias("expected"),
        F.round(contrib, 6).alias("chisq_contrib"),
    )
