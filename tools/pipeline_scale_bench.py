"""Scale cells for the round-7 pipeline operators: paragraph-level dedup
and URL/domain extraction.

Synthesizes an N-doc corpus IN-PLAN (spark.range → expressions; no data
files): every doc is [unique head] + [boilerplate footer, `n_variants`
distinct strings corpus-wide] + [unique tail], and — the adversarial
skew shape — one UNIVERSAL footer shared by every document, so the
hottest paragraph-fingerprint group has N members and the
first-occurrence window ranks it in a single task. That is precisely
the "most-repeated boilerplate string" ceiling named in
paragraph_dedup's docstring; this tool measures it instead of assuming
it.

Exactness is asserted analytically: sum(n_kept) must equal
2*N (unique head+tail) + n_variants (one keeper per footer variant)
+ 1 (one keeper for the universal footer).

Usage: python tools/pipeline_scale_bench.py [N=1000000] [runs=2]
Prints one JSON line per cell; results recorded in SCALE.md round 7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_variants = 1000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators.dedup import paragraph_dedup
    from vectordb_from_scratch_spark.operators.textops import url_domains

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("pipeline_scale_bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sid = F.col("id").cast("string")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique head paragraph of document "), sid,
            F.lit(" with some body words to carry realistic width"),
            F.lit("\n\n"),
            F.lit("subscribe to our newsletter variant "),
            (F.col("id") % n_variants).cast("string"),
            F.lit("\n\n"),
            F.lit("all rights reserved universal footer shared everywhere"),
            F.lit("\n\n"),
            F.lit("unique tail paragraph of document "), sid,
        ).alias("text"),
    )

    # -- cell 1: paragraph dedup over N docs / 4N paragraphs ------------
    out = paragraph_dedup(docs)
    t = _time(lambda: out.agg(F.sum("n_kept")).collect(), runs)
    kept = out.agg(F.sum("n_kept")).collect()[0][0]
    expected = 2 * n + n_variants + 1
    print(json.dumps({
        "cell": "paragraph_dedup",
        "n_docs": n,
        "n_paras": 4 * n,
        "hot_group_members": n,
        "sec": t,
        "sum_n_kept": int(kept),
        "expected": expected,
        "exact": bool(kept == expected),
    }))

    # -- cell 2: URL extraction + domain aggregate over N docs ----------
    url_docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("body words before the link see https://www.site"),
            (F.col("id") % 50_000).cast("string"),
            F.lit(".example.org/doc/"), sid,
            F.lit(" and a mirror http://cdn.site"),
            (F.col("id") % 50_000).cast("string"),
            F.lit(".example.org/asset trailing words"),
        ).alias("text"),
    )
    dom = url_domains(url_docs)
    t2 = _time(lambda: dom.agg(F.sum("n_urls"), F.count(F.lit(1))).collect(), runs)
    row = dom.agg(F.sum("n_urls").alias("u"), F.count(F.lit(1)).alias("d")).collect()[0]
    print(json.dumps({
        "cell": "url_domains",
        "n_docs": n,
        "n_urls": int(row["u"]),
        "n_domains": int(row["d"]),
        "sec": t2,
        "exact": bool(row["u"] == 2 * n and row["d"] == 2 * min(n, 50_000)),
    }))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
