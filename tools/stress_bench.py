"""Scale-stress bench: kernel-vs-expression crossover at 100k rows.

The oracle-checked sf0.01/sf0.1 scales run the exact expression paths;
the 100-TB design claims rest on the Arrow/numpy kernels taking over at
scale. This tool MEASURES that takeover on the 100k-row stress tables
(/tmp/big_embeddings, /tmp/big_docs — driver-generated copies; falls
back to sf0.1 if absent) and prints one JSON line per comparison.
Results are recorded in SCALE.md.

Usage: python tools/stress_bench.py [runs_per_cell]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_EMB = "/tmp/big_embeddings"
BIG_DOCS = "/tmp/big_docs"
N_PROBES = 100
K = 10


def _time(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import ann, dedup, knn

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb_path = BIG_EMB if os.path.isdir(BIG_EMB) else "/root/testdata/sf0.1/embeddings.parquet"
    docs_path = BIG_DOCS if os.path.isdir(BIG_DOCS) else "/root/testdata/sf0.1/documents.parquet"
    emb = spark.read.parquet(emb_path)
    docs = spark.read.parquet(docs_path)
    n_emb, n_docs = emb.count(), docs.count()  # also warms the page cache
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}

    def cell(name, fn):
        results[name] = _time(fn, runs)
        print(json.dumps({"cell": name, "sec": results[name]}), flush=True)

    saved = knn.AUTO_NUMPY_THRESHOLD
    try:
        # exact knn: interpreted fold+window vs BLAS kernel
        cell("knn_window_100x%d" % n_emb,
             lambda: sink(knn.knn(emb, probes, k=K, strategy="window")))
        cell("knn_numpy_100x%d" % n_emb,
             lambda: sink(knn.knn(emb, probes, k=K, strategy="numpy")))

        # SRP ANN: expression bucketing vs matmul kernel (auto threshold
        # flipped to force each path)
        knn.AUTO_NUMPY_THRESHOLD = n_emb + 1
        cell("ann_srp_expr_100x%d" % n_emb,
             lambda: sink(ann.ann_knn_srp(emb, probes, k=K, dim=64, nbits=8, n_tables=2)))
        knn.AUTO_NUMPY_THRESHOLD = 1
        cell("ann_srp_kernel_100x%d" % n_emb,
             lambda: sink(ann.ann_knn_srp(emb, probes, k=K, dim=64, nbits=8, n_tables=2)))
    finally:
        knn.AUTO_NUMPY_THRESHOLD = saved

    # minhash: JVM expression path vs Arrow hashlib kernel (bit-identical)
    cell("minhash_expr_%d" % n_docs,
         lambda: sink(dedup.minhash_signatures(docs, strategy="expr")))
    cell("minhash_kernel_%d" % n_docs,
         lambda: sink(dedup.minhash_signatures(docs, strategy="kernel")))

    # duplicate clustering: LSH pairs -> connected components at corpus size
    # (rounds = graph diameter; each round shuffles only (id,label) pairs)
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    pairs = pairs.localCheckpoint()  # isolate CC cost from pair generation
    n_pairs = pairs.count()
    cell("cc_%dpairs_%ddocs" % (n_pairs, n_docs),
         lambda: sink(dedup.connected_components(pairs, docs)))

    # deterministic IVF: one-off build cost, then probe vs the exact scan
    # above (the payoff claim: a persisted index turns every search into
    # an n_probe-list scan instead of a full pass)
    import tempfile

    cent = ann.build_ivf_det(emb, n_lists=16, iters=2)
    cell("ivf_det_build_%d" % n_emb, lambda: sink(cent))
    idx = tempfile.mkdtemp(prefix="ivfdet_")
    v = emb.select(F.col("vec_id").cast("long").alias("id"),
                   F.col("embedding").cast("array<double>").alias("vec"))
    ann.assign_ivf_det(v, cent).write.mode("overwrite").parquet(idx + "/assigned")
    cent.write.mode("overwrite").parquet(idx + "/cent")
    assigned_p = spark.read.parquet(idx + "/assigned")
    cent_p = spark.read.parquet(idx + "/cent")
    cell("ivf_det_probe_100x%d" % n_emb,
         lambda: sink(ann.ann_knn_ivf(assigned_p, cent_p, probes, k=K,
                                      n_probe=4, id_col="id", vec_col="vec")))

    # streaming exact-dedup throughput: the whole corpus through the
    # digest-state ingest path in multi-file micro-batches (8 files per
    # trigger) — state stays (fp, keep_id)-sized; measures end-to-end
    # stream wall time, not one batch
    import shutil
    import tempfile as _tf

    from vectordb_from_scratch_spark.streaming import dedup_stream_foreach_batch

    def stream_dedup_once() -> None:
        base = _tf.mkdtemp(prefix="sdedup_")
        try:
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 8)
                .parquet(docs_path)
            )
            q = dedup_stream_foreach_batch(
                spark, stream, base + "/out", base + "/state", base + "/ckpt"
            ).start()
            q.awaitTermination(590)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    cell("stream_dedup_%ddocs" % n_docs, stream_dedup_once)

    print(json.dumps({"metric": "stress_crossover", "n_emb": n_emb, "n_docs": n_docs,
                      "cpus": int(cpus), "runs": runs, "cells": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
