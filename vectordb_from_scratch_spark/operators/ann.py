"""Approximate nearest neighbor — the Spark-native replacement for the
reference's HNSW graph (SURVEY.md §2.3).

HNSW's insert/beam-search (reference src/hnsw/graph.rs:143-414) is
inherently sequential pointer-chasing; the distributed equivalent is a
BATCH-BUILT bucketed index + bucket-probe re-rank:

  1. deterministic signed-random-projection (SRP) LSH: L hash tables,
     each `nbits` sign-bits of projections onto ±1 vectors derived from
     md5 (seeded, engine-portable → DuckDB oracle can reproduce bucket
     assignment EXACTLY, something MLlib's RNG cannot);
  2. candidates = rows sharing any table's bucket with the probe
     (equi-join on the bucket key — hash-partition prunable, the
     distributed analog of HNSW's beam candidate set);
  3. exact re-rank of candidates only, per-query top-k.

Recall is tuned by (nbits, L) — the ef/numHashTables analog
(reference ef_search src/hnsw/graph.rs:41, H9). The recall harness in
tests/ mirrors the reference's FlatIndex-as-oracle thresholds
(tests/recall_test.rs:67-80: ≥0.90/0.90/0.85).

An MLlib BucketedRandomProjectionLSH path is also provided
(BASELINE.json: "MLlib for batch index build") for Euclidean
approx-similarity joins; its random planes make it rows-only for the
oracle, but the pytest recall harness covers it.

Scale: index build is one narrow pass (fit/transform); search shuffles
only (bucket_key) — candidates stay co-partitioned; no cross join exists
anywhere in the plan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vectormath as vm
from .knn import knn as exact_knn  # noqa: F401  (exact fallback / oracle)

__all__ = [
    "srp_planes",
    "srp_bucket_cols",
    "srp_index",
    "ann_knn_srp",
    "ann_knn_srp_indexed",
    "ann_filtered_overfetch",
    "build_mllib_lsh",
    "ann_join_mllib",
    "build_ivf",
    "build_ivf_det",
    "assign_ivf_det",
    "assign_ivf_kernel",
    "ann_knn_ivf",
    "ivf_sq8_index",
    "ann_knn_ivf_sq8",
]


def _hamming_masks(nbits: int, radius: int) -> list[int]:
    """All XOR masks of Hamming weight ≤ radius over nbits bits, in
    (weight, value) order — mask 0 (the exact bucket) first."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(nbits), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def srp_planes(dim: int, nbits: int, table: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 projection planes. Component j of plane t is the
    sign bit of md5(f"{seed}:{table}:{t}:{j}") — reproducible in any
    engine and in plain Python (no RNG state, no Spark dependency)."""
    planes = []
    for t in range(nbits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{table}:{t}:{j}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _srp_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Bucket key: integer whose bit t = sign(dot(vec, plane_t)) > 0.
    Built-in fold per plane — codegen'd, no UDF."""
    v = vm.as_double(vec)
    bucket = F.lit(0).cast("long")
    for t, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << t).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def srp_bucket_cols(vec: Column | str, dim: int, nbits: int = 8, n_tables: int = 2,
                    seed: int = 42) -> list[Column]:
    """One bucket-key Column per hash table."""
    return [
        _srp_bucket(vec, srp_planes(dim, nbits, table=l, seed=seed)).alias(f"bucket_{l}")
        for l in range(n_tables)
    ]


# Above this many vector rows, SRP bucket assignment switches from the
# fold-expression path to the numpy matmul kernel. This threshold is
# deliberately LOWER than knn.AUTO_NUMPY_THRESHOLD because the failure
# modes differ: the kNN distance kernel differs from the fold in the
# last ulp on essentially EVERY pair (summation order), while SRP only
# consumes the SIGN of each projection — kernel and fold disagree only
# when a projection lands within float-reordering error (~1e-13
# relative) of exactly 0, a measure-zero boundary that real embeddings
# don't hit (kernel ≡ expression bucket-for-bucket on every test table;
# asserted in tests/test_ann_recall.py). Re-swept r10
# (tools/kernel_crossover_bench.py): the kernel wins at every measured
# size down to 500 rows (0.83 vs 2.17 s; 200k: 3.65 vs 4.73; converges
# ~1× at 1M where the scan dominates), so 1,000 is not a performance
# crossover either — it only keeps the oracle-checked scale
# (sf0.01 = 500 rows) on the DuckDB-twinned bitwise path, at a
# measured cost of ~1.3 s on sub-1k tables.
SRP_KERNEL_THRESHOLD = 1_000


def ann_knn_srp(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "euclidean",
    *,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    multiprobe: bool | int = False,
    predicate: Column | None = None,
) -> DataFrame:
    """SRP-LSH approximate k-NN: per-table bucket joins → distinct
    candidates → exact re-rank → per-query top-k.

    ``predicate`` composes a metadata filter (filters.compile_filter or
    any boolean Column over `vectors`' columns) with the index probe —
    the reference's search_with_filter over any Index
    (src/storage.rs:249-290 via src/index.rs:20). Because SRP bucket
    assignment is per-row, pre-filtering the vector side is value-
    identical to filtering candidates post-probe, and strictly better
    as a plan: the predicate pushes into the parquet scan and top-k
    fills from qualifying rows only (no reference-style starvation —
    use ann_filtered_overfetch for bug-for-bug parity).

    May return fewer than k rows for probes in sparse buckets — the same
    recall/latency trade the reference makes with ef (H9); raise nbits↓ /
    n_tables↑ for recall, or set `multiprobe` to ALSO probe every bucket
    within a Hamming radius of the query's bucket (the classic
    multiprobe-LSH move): True or 1 = flip each sign bit once
    (×(nbits+1) candidate volume per table), 2 = also every bit pair
    (+C(nbits,2)), with zero extra index cost — the closest analog of
    HNSW's ef beam widening (reference src/hnsw/graph.rs:417-424). Only
    the probe side fans out; the vector table and its index are
    untouched.
    """
    from pyspark.sql import Window

    from ..sources.tables import spread
    from .knn import estimated_rows

    # Single-scan explode form: each row emits one (table_idx, bucket_key)
    # per hash table and the probe join keys on BOTH — so the vector table
    # is scanned (and its buckets computed) exactly once regardless of
    # n_tables, instead of once per table as a union of joins would.
    all_planes = [srp_planes(dim, nbits, table=l, seed=seed) for l in range(n_tables)]

    def kernel_buckets(df, id_name, vcol, out_vec):
        """numpy bucket assignment: one BLAS matmul against the stacked
        plane matrix replaces n_tables×nbits interpreted dot-folds per row
        (measured 75s → ~8s at 1M rows). Sign flips vs the fold are
        possible only when a projection is within float error of exactly
        0 — which is why the oracle-checked scale keeps the expression
        path (same auto threshold as knn)."""
        import numpy as np
        import pandas as pd

        P = np.array([p for planes in all_planes for p in planes], dtype=np.float64)
        weights = np.array(
            [1 << t for _ in range(n_tables) for t in range(nbits)], dtype=np.int64
        )
        tbl_of = np.repeat(np.arange(n_tables, dtype=np.int64), nbits)

        def run(batches):
            for pdf in batches:
                V = np.array([list(v) for v in pdf[vcol]], dtype=np.float64)
                signs = (V @ P.T) > 0  # (b, n_tables*nbits)
                ids, vecs, tbls, buckets = [], [], [], []
                for l in range(n_tables):
                    mask = tbl_of == l
                    bk = (signs[:, mask] * weights[mask]).sum(axis=1)
                    ids.append(pdf[id_name].to_numpy())
                    vecs.append(pdf[vcol])
                    tbls.append(np.full(len(pdf), l, dtype=np.int64))
                    buckets.append(bk)
                yield pd.DataFrame(
                    {
                        id_name: np.concatenate(ids),
                        out_vec: pd.concat([pd.Series(v) for v in vecs], ignore_index=True),
                        "tbl": np.concatenate(tbls),
                        "bucket": np.concatenate(buckets),
                    }
                )

        return run

    def tagged_buckets(df, vcol, out_vec):
        buckets = srp_bucket_cols(vcol, dim, nbits, n_tables, seed)
        tags = F.array(
            *[
                F.struct(F.lit(l).alias("tbl"), b.alias("bucket"))
                for l, b in enumerate(buckets)
            ]
        )
        return df.select(
            *df.columns, vm.as_double(vcol).alias(out_vec), F.explode(tags).alias("__t")
        ).select(*df.columns, out_vec, F.col("__t.tbl").alias("tbl"), F.col("__t.bucket").alias("bucket"))

    if predicate is not None:
        vectors = vectors.filter(predicate)
    # Metadata-only estimate (no job) — see knn.estimated_rows.
    use_kernel = estimated_rows(vectors) >= SRP_KERNEL_THRESHOLD
    v_in = spread(vectors).select(F.col(id_col).alias("id"), vm.as_double(vec_col).alias("__v"))
    q_in = queries.select(
        F.col(query_id_col).alias("query_id"), vm.as_double(query_vec_col).alias("__q")
    )
    if use_kernel:
        # probe side uses the SAME kernel so sign decisions can't disagree
        # between the two join sides; id dtypes derived from the inputs
        # (the store facade uses string ids — hardcoding long broke it)
        id_t = vectors.schema[id_col].dataType.simpleString()
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        v = v_in.mapInPandas(
            kernel_buckets(v_in, "id", "__v", "__vvec"),
            schema=f"id {id_t}, __vvec array<double>, tbl long, bucket long",
        )
        q = q_in.mapInPandas(
            kernel_buckets(q_in, "query_id", "__q", "__qvec"),
            schema=f"query_id {qid_t}, __qvec array<double>, tbl long, bucket long",
        )
    else:
        v = tagged_buckets(v_in, "__v", "__vvec").select("id", "__vvec", "tbl", "bucket")
        q = tagged_buckets(q_in, "__q", "__qvec").select("query_id", "__qvec", "tbl", "bucket")
    radius = int(multiprobe) if not isinstance(multiprobe, bool) else (1 if multiprobe else 0)
    if radius:
        # fan the PROBE side out to every bucket within Hamming radius
        # `radius` of the query's bucket (flip ≤radius sign bits) — the
        # classic multiprobe-LSH beam widening. Probe fanout is
        # sum(C(nbits, r) for r ≤ radius); the vector side is untouched.
        variants = F.array(
            *[
                F.col("bucket").bitwiseXOR(F.lit(m).cast("long"))
                for m in _hamming_masks(nbits, radius)
            ]
        )
        q = q.select(
            "query_id", "__qvec", "tbl", F.explode(variants).alias("bucket")
        )

    # Distance is computed BEFORE the dedup so the only thing that crosses
    # the dedup shuffle is (query_id, id, distance) — never the embedding
    # arrays. Duplicate candidates from different tables carry identical
    # distances, so dedup-after-distance is value-equivalent.
    dist = vm.distance(metric, "__qvec", "__vvec")
    cands = v.join(F.broadcast(q), on=["tbl", "bucket"]).select(
        "query_id", "id", dist.alias("distance")
    )
    narrow = cands.dropDuplicates(["query_id", "id"])
    w = Window.partitionBy("query_id").orderBy(
        # nulls LAST: zero-vector cosine distance is NULL and must not
        # outrank real neighbors (Spark default is nulls-first on asc)
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    return (
        narrow.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def srp_index(
    vectors: DataFrame,
    *,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SRP index as a materializable TABLE: one (id, vec, tbl, bucket)
    row per vector per hash table. Write it partitioned/bucketed by
    (tbl, bucket) and probes prune to their buckets — the persisted form
    of the index ann_knn_srp builds inline, and the state that
    streaming/ann_stream.py maintains incrementally (the distributed
    analog of the reference's HnswIndex::add, src/hnsw/graph.rs:245-342).

    Expression-path bucket assignment (exact, oracle-reproducible);
    cost is one narrow pass over `vectors`."""
    tags = F.array(
        *[
            F.struct(F.lit(l).alias("tbl"), b.alias("bucket"))
            for l, b in enumerate(srp_bucket_cols(vec_col, dim, nbits, n_tables, seed))
        ]
    )
    return vectors.select(
        F.col(id_col).alias("id"),
        vm.as_double(vec_col).alias("vec"),
        F.explode(tags).alias("__t"),
    ).select("id", "vec", F.col("__t.tbl").alias("tbl"), F.col("__t.bucket").alias("bucket"))


def ann_knn_srp_indexed(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "euclidean",
    *,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    multiprobe: bool | int = False,
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
) -> DataFrame:
    """SRP k-NN over a PREBUILT index table (srp_index schema:
    id, vec, tbl, bucket). Identical semantics to ann_knn_srp — the
    (nbits, n_tables, seed) config must match the one the index was
    built with — but the vector table is never rescanned or re-hashed:
    only the broadcast probe side computes buckets at query time.

    Filtered search (reference search_with_filter composed over any
    Index, src/storage.rs:249-290 / src/index.rs:20): pass ``predicate``
    (a boolean Column over ``attrs``) plus ``attrs`` — the metadata
    side-table keyed by ``attrs_id_col``. Candidates from the bucket
    probe are pruned by a semi-join against the qualifying id set
    BEFORE the exact re-rank, so top-k fills from qualifying rows only
    (no starvation; the reference-exact over-fetch twin is
    ann_filtered_overfetch). The predicate pushes into the attrs scan;
    the semi-join's qualifying side is filter-pruned, the candidate
    side is already bucket-pruned."""
    from pyspark.sql import Window

    if (predicate is None) != (attrs is None):
        raise ValueError("filtered search needs BOTH predicate and attrs")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), vm.as_double(query_vec_col).alias("__q")
    )
    qtags = F.array(
        *[
            F.struct(F.lit(l).alias("tbl"), b.alias("bucket"))
            for l, b in enumerate(srp_bucket_cols("__q", dim, nbits, n_tables, seed))
        ]
    )
    q = q.select("query_id", "__q", F.explode(qtags).alias("__t")).select(
        "query_id", "__q", F.col("__t.tbl").alias("tbl"), F.col("__t.bucket").alias("bucket")
    )
    radius = int(multiprobe) if not isinstance(multiprobe, bool) else (1 if multiprobe else 0)
    if radius:
        variants = F.array(
            *[
                F.col("bucket").bitwiseXOR(F.lit(m).cast("long"))
                for m in _hamming_masks(nbits, radius)
            ]
        )
        q = q.select("query_id", "__q", "tbl", F.explode(variants).alias("bucket"))

    dist = vm.distance(metric, "__q", "vec")
    cands = index.join(F.broadcast(q), on=["tbl", "bucket"]).select(
        "query_id", "id", dist.alias("distance")
    )
    if predicate is not None:
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
        cands = cands.join(qualifying, "id", "left_semi")
    narrow = cands.dropDuplicates(["query_id", "id"])
    w = Window.partitionBy("query_id").orderBy(
        # nulls LAST: zero-vector cosine distance is NULL and must not
        # outrank real neighbors (Spark default is nulls-first on asc)
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    return (
        narrow.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def ann_filtered_overfetch(
    ann_results: DataFrame,
    attrs: DataFrame,
    predicate: Column,
    k: int = 10,
    *,
    attrs_id_col: str = "vec_id",
) -> DataFrame:
    """REFERENCE-EXACT filtered ANN (src/storage.rs:249-290 composed over
    an approximate Index via src/index.rs:20): take an UNFILTERED ANN
    result computed at k' = overfetch·k (any of ann_knn_srp /
    ann_knn_srp_indexed / ann_knn_ivf output — query_id, id, distance,
    rank), post-filter by the metadata predicate, keep the first k per
    query in original rank order. Faithfully reproduces the reference's
    under-fill: a selective filter can return fewer than k rows even
    when k qualifying rows sit in the probed buckets. Use the
    `predicate=` pre-filter form of the ANN functions unless bug-for-bug
    parity with the reference API is required (same divergence note as
    knn.knn_filtered_overfetch, the exact-path twin)."""
    from pyspark.sql import Window

    qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
    refiltered = ann_results.join(qualifying, "id", "left_semi")
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        refiltered.withColumn("rank2", F.row_number().over(w))
        .filter(F.col("rank2") <= k)
        .select("query_id", "id", "distance", F.col("rank2").alias("rank"))
    )


def build_ivf(
    vectors: DataFrame,
    n_lists: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
):
    """IVF (inverted-file) index batch build: MLlib KMeans partitions the
    space into `n_lists` Voronoi cells; every vector is assigned to its
    nearest centroid's list. The HNSW-build analog where the "graph" is a
    coarse quantizer (SURVEY §2.3 H4 → "MLlib for batch index build").

    Returns (centers: list[list[float]], assigned: DataFrame with list_id).
    At scale the assigned table is written partitioned/bucketed BY list_id,
    so a probe reads only n_probe partitions — partition pruning is the
    distributed beam search.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        F.col(id_col), F.col(vec_col), array_to_vector(vm.as_double(vec_col)).alias("features")
    )
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="features",
                predictionCol="list_id")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "list_id")
    centers = [c.tolist() for c in model.clusterCenters()]
    return centers, assigned


def assign_ivf_det(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (euclidean, tie-break
    on list_id asc). `vectors` is (id, vec); `centroids` is (list_id,
    cvec) — tiny (n_lists rows), collapsed to ONE array row and
    broadcast, so the assignment is a zero-shuffle per-row expression.

    Distances use the same left-fold euclidean as exact k-NN, so the
    assignment an external engine computes with the same fold is
    bit-identical (the property the DuckDB oracle relies on). The
    argmin is a lexicographic array_min over (distance, list_id)
    structs — exactly the (distance asc, list_id asc) winner the
    oracle's row_number picks, without materializing rows × n_lists
    pairs through an Exchange + per-id window sort (the pre-r11 shape:
    at 100M rows × 640 lists that window shuffled 64B vector-carrying
    rows; this is one narrow map over the vectors — guide §2.4).
    Verified exceptAll-empty against the window form, and the full
    build_ivf_det centroid chain through it, at sf0.01/sf0.1.

    Parallelism contract (r12, VERDICT r11 #2): this is a pure narrow
    map — it inherits its input's partitioning and does NOT spread()
    (the r11 in-function spread probed partition counts of arbitrarily
    deep plans at DataFrame-build time — a full physical planning pass
    per Lloyd iteration — and stacked a RoundRobin exchange per engaged
    call: ann_ivf_pq_knn's plan grew 150→179 Exchanges and the driver
    measured 7.8→24.1 s). Callers spread the SHALLOW source scan once
    (build_ivf_det, semantic_dedup, the registry IVF sites do); every
    iteration re-derives from that source, so the parallelism persists
    with zero extra shuffles."""
    cent_arr = centroids.groupBy().agg(
        F.collect_list(F.struct("list_id", "cvec")).alias("__cents")
    )
    best = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                vm.euclidean_distance(F.col("vec"), c["cvec"]).alias("d"),
                c["list_id"].alias("list_id"),
            ),
        )
    )
    return (
        vectors.crossJoin(F.broadcast(cent_arr))
        .select("id", "vec", best["list_id"].alias("list_id"))
        # empty-centroids faithfulness: the pre-r11 crossJoin emitted no
        # rows against an empty centroid table; the global collect_list
        # agg always emits one (empty-array) row, so drop the NULL argmin
        .filter(F.col("list_id").isNotNull())
    )


def assign_ivf_kernel(
    vectors: DataFrame, centroids: DataFrame, *, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batched BLAS twin of assign_ivf_det — the index-BUILD scale
    path. The fold-exact plan materializes rows × n_lists pairs through a
    per-id window sort: the right shape for the oracle-twinned builds
    (bit-identical to DuckDB at sf0.01/0.1), but at 100M rows × 640 lists
    that is 64 BILLION intermediate rows carrying full vectors into a
    window shuffle — a multi-TB sort that no disk survives. This kernel
    broadcasts the (n_lists × dim) centroid matrix in the task closure
    and turns the assignment into one argmin(−2·X·Cᵀ + ‖c‖²) GEMM per
    Arrow batch: no join, no shuffle, one narrow pass over the vectors.

    Tie-break matches the fold's (distance asc, list_id asc): np.argmin
    returns the FIRST minimum and centroid rows are ordered list_id asc.
    float64 GEMM can flip an assignment vs the fold only on last-ulp
    boundary ties, so the oracle-twinned registry builds keep the fold;
    production builds and the SCALE.md 100M cells use this. `centroids`
    is collected eagerly (n_lists rows — tiny, but it IS an action).

    ``passthrough``: extra `vectors` columns copied to the output
    unchanged (saves the id-join when the caller needs them alongside
    list_id)."""
    import numpy as np
    import pandas as pd

    rows = sorted(
        centroids.select("list_id", "cvec").collect(), key=lambda r: r["list_id"]
    )
    list_ids = np.asarray([r["list_id"] for r in rows], dtype=np.int32)
    C = np.asarray([list(r["cvec"]) for r in rows], dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    Cn2T = -2.0 * C.T  # (dim, n_lists), staged once per task

    extra = list(passthrough)
    v = vectors.select(
        F.col("id").cast("long").alias("id"), vm.as_double("vec").alias("vec"), *extra
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64, copy=False)
            idx = np.argmin(X @ Cn2T + c2[None, :], axis=1)
            out = {"id": pdf["id"].to_numpy(), "vec": pdf["vec"].values,
                   "list_id": list_ids[idx]}
            for c in extra:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    extra_schema = "".join(
        f", {c} {vectors.schema[c].dataType.simpleString()}" for c in extra
    )
    return v.mapInPandas(
        run, schema=f"id long, vec array<double>, list_id int{extra_schema}"
    )


def _det_centroids(assigned: DataFrame, prev: DataFrame, block: int) -> DataFrame:
    """Recompute centroids as per-dimension means with a FIXED two-level
    reduction tree keyed on id ranges: within an id-block, values fold in
    id order; block partial sums fold in block order. The summation tree
    is a function of the DATA (ids), not of Spark's partitioning, so the
    double-precision result is identical on any cluster layout — and in
    any engine that folds the same tree (the DuckDB oracle does).

    Plain F.sum would shuffle less state but its accumulation order
    follows the partitioning, making the low bits of the mean
    run-dependent; decimal accumulation is order-independent but
    double→decimal casts themselves disagree across engines (Spark casts
    via the shortest decimal repr, DuckDB via the exact binary value).
    The per-group collect_list is bounded by `block` (default 4096
    values), so executor memory stays flat at any table size.

    Empty clusters keep their previous centroid (left-join + coalesce),
    the same convention MLlib KMeans uses."""
    # Fold WHOLE VECTORS element-wise instead of posexploding to
    # rows×dim before the shuffle: per (list, blk) the rows sort by id
    # once and their vectors fold via zip_with addition — per dimension
    # this is the SAME additions in the SAME id-then-blk order as the
    # original per-(pos) formulation, so the doubles are bit-identical
    # (oracle unchanged), but the shuffle moves `rows` records instead
    # of `rows×dim` exploded (list_id, id, blk, pos, val) tuples and
    # runs one hash aggregation instead of dim of them. At sf0.1 the
    # bench family is stage-overhead-bound so this measures neutral; the
    # 64× shuffle-volume cut is the 100-TB effect (a 1B-row × 64-dim
    # build shuffles 64 GB of keys+values instead of 4 TB of exploded
    # tuples).
    def vsum(lst: str, field: str):
        # fold a SORTED list of (key, vector) structs into the element-wise
        # sum, starting from a zero vector shaped like the first entry; the
        # list is materialized ONCE in a prior agg so the init/fold don't
        # re-evaluate the collect
        col = F.array_sort(F.col(lst))
        zero = F.transform(F.element_at(F.col(lst), 1)[field], lambda _: F.lit(0.0))
        return F.aggregate(
            col, zero, lambda acc, s: F.zip_with(acc, s[field], lambda a, x: a + x)
        )

    ex = assigned.select(
        "list_id", "id", F.expr(f"id div {block}").alias("blk"), "vec"
    )
    l1 = (
        ex.groupBy("list_id", "blk")
        .agg(
            F.collect_list(F.struct("id", "vec")).alias("__lst"),
            F.count("*").alias("n1"),
        )
        .select("list_id", "blk", vsum("__lst", "vec").alias("s1"), "n1")
    )
    l2 = (
        l1.groupBy("list_id")
        .agg(
            F.collect_list(F.struct("blk", "s1")).alias("__lst"),
            F.sum("n1").alias("n"),
        )
        .select("list_id", vsum("__lst", "s1").alias("s"), "n")
    )
    newc = l2.select(
        "list_id",
        F.transform("s", lambda sv: sv / F.col("n")).alias("cvec"),
    )
    return (
        prev.alias("p")
        .join(newc.alias("n"), "list_id", "left")
        .select("list_id", F.coalesce(F.col("n.cvec"), F.col("p.cvec")).alias("cvec"))
    )


def build_ivf_det(
    vectors: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    *,
    block: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_mod: int = 1,
    assign_strategy: str = "fold",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: Lloyd's k-means with md5-seeded
    init and a fixed-tree mean (see _det_centroids), yielding centroids
    that are BIT-IDENTICAL across runs, partitionings, and engines — the
    oracle-twinnable correctness spec for the IVF index that build_ivf
    (MLlib KMeans, RNG-seeded) can only match rows-only.

    Init picks the first `n_lists` vectors ordered by md5(id): a cheap
    engine-portable pseudo-random draw (the reference seeds its RNG the
    same spirit, src/hnsw/graph.rs:70). The selection is a global
    orderBy().limit(n_lists) — Catalyst compiles it to
    TakeOrderedAndProject (per-partition partial top-k, driver merges
    n_lists-row sets), so no full-table sort or single-partition window
    exists anywhere in the build plan; the only window runs over the
    n_lists selected rows.

    Returns the centroids DataFrame (list_id int, cvec array<double>).
    Iteration materializes nothing driver-side (no collect); each round
    is a broadcast-assign plus one bounded-group aggregation, the same
    shuffle shape MLlib KMeans runs internally.

    ``train_mod``: Lloyd iterations train on the deterministic 1/train_mod
    subset ``pmod(xxhash64(id), train_mod) == 0`` (the whole table at the
    default 1). Centroid quality needs a representative sample, not every
    row — the same economics as pq_codebook's 1%-sample training (FAISS's
    production pattern), and the fix for the measured build wall-time at
    scale (SCALE.md round-5: 2 full-data Lloyd iters at 10M rows cost
    1316 s where the probe they serve costs 56 s; the full-corpus
    assignment pass that actually builds the index is unavoidable and
    unaffected). Deterministic and engine-portable, so a sampled build
    is still exactly reproducible — but the sampled centroids differ
    from full-data centroids, so the oracle-twinned registry queries
    keep train_mod=1 as the spec.

    ``assign_strategy``: "fold" (default) runs the Lloyd assignments
    through assign_ivf_det's bit-exact expression plan — the oracle
    spec. "kernel" routes them through assign_ivf_kernel (BLAS argmin,
    one narrow pass): the scale path for big training sets, at the cost
    of eager per-iteration centroid collection (n_lists rows/round) and
    last-ulp tie divergence from the fold — not oracle-twinnable."""
    from pyspark.sql import Window

    from ..sources.tables import spread

    # spread ONCE at the (shallow) source: every Lloyd round's assign is
    # a narrow map re-derived from `train`, so this single round-robin
    # covers all iterations — the r11 shape spread inside assign_ivf_det
    # instead, paying a physical-planning probe plus a RoundRobin
    # exchange PER ROUND (VERDICT r11 #2). No-op at real scale.
    v = spread(vectors).select(
        F.col(id_col).cast("long").alias("id"), vm.as_double(vec_col).alias("vec")
    )
    train = (
        v if train_mod <= 1
        else v.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(train_mod)) == 0)
    )
    if train_mod > 1:
        # the sampled subset must still seed n_lists distinct centroids —
        # a too-aggressive train_mod would otherwise silently return
        # fewer lists and shift every downstream list_id (advisor r5).
        # The probe is cheap: limit(n_lists).count() is a partial scan
        # bounded at n_lists rows per partition.
        if train.limit(n_lists).count() < n_lists:
            train = v  # fall back to full-data training rather than mis-build
    seed_key = F.md5(F.col("id").cast("string"))
    seeds = train.orderBy(seed_key.asc(), F.col("id").asc()).limit(n_lists)
    w = Window.orderBy(seed_key.asc(), F.col("id").asc())  # over n_lists rows only
    cent = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("list_id"),
        F.col("vec").alias("cvec"),
    )
    assign = assign_ivf_det if assign_strategy == "fold" else assign_ivf_kernel
    from .cache import checkpoint as _checkpoint

    for _ in range(iters):
        # each round references the incoming centroids TWICE (the assign
        # and the empty-cluster fallback join), so an unmaterialized loop
        # nests the previous round's whole subtree 2× per iteration —
        # 2^iters copies of the seed selection in the final plan, each
        # re-planned and re-executed wherever exchange reuse misses
        # (r12). The centroid table is n_lists rows: an eager
        # localCheckpoint per round linearizes the build into `iters`
        # small sequential jobs (the shape MLlib's own Lloyd runs) and
        # keeps every consumer's plan shallow. Values unchanged — a
        # checkpoint is a pure materialization barrier.
        cent = _checkpoint(_det_centroids(assign(train, cent), cent, block))
    return cent


def _route_queries(
    q: DataFrame, centers_df: DataFrame, n_probe: int, *, keep_center: bool = False
) -> DataFrame:
    """Route each query row (query_id, __qvec) to its `n_probe` nearest
    centroids: centers collapse to ONE broadcast array row; per query the
    routing is array_sort over (cdist, list_id) structs + slice + explode
    — a narrow expression, no Exchange and no window sort (the pre-r11
    shape shuffled queries × n_lists rows into a per-query row_number).
    Lexicographic struct sort == the old (cdist asc, list_id asc)
    tie-break; euclidean uses the same left-fold, so the probed list set
    is bit-identical (verified exceptAll-empty at sf0.01/sf0.1).
    Returns (query_id, __qvec, list_id) — plus `center` with
    ``keep_center`` (the residual-PQ path needs the probed centroid to
    form r_q = q − c; the center field sits THIRD in the sort struct, so
    it is only ever compared on a (d, list_id) tie, which list_id
    uniqueness rules out)."""
    cent_arr = centers_df.groupBy().agg(
        F.collect_list(F.struct("list_id", "center")).alias("__cents")
    )
    ranked = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                vm.euclidean_distance(F.col("__qvec"), c["center"]).alias("d"),
                c["list_id"].alias("list_id"),
                *([c["center"].alias("center")] if keep_center else []),
            ),
        )
    )
    if not keep_center:
        return q.crossJoin(F.broadcast(cent_arr)).select(
            "query_id",
            "__qvec",
            F.explode(F.slice(ranked, 1, n_probe)["list_id"]).alias("list_id"),
        )
    return (
        q.crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id",
            "__qvec",
            F.explode(F.slice(ranked, 1, n_probe)).alias("__probe"),
        )
        .select(
            "query_id",
            "__qvec",
            F.col("__probe.list_id").alias("list_id"),
            F.col("__probe.center").alias("center"),
        )
    )


def ann_knn_ivf(
    assigned: DataFrame,
    centers: list[list[float]] | DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    metric: str = "euclidean",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: route each query to its `n_probe` nearest centroids, scan
    only those lists, exact re-rank. Recall/latency knob = n_probe (the
    ef_search analog, SURVEY §2.3 H9).

    Filtered search (reference search_with_filter over any Index,
    src/storage.rs:249-290): pass ``predicate`` over ``attrs`` (metadata
    side-table keyed ``attrs_id_col``) to prune candidates AFTER the
    list probe but BEFORE the exact re-rank — top-k fills from
    qualifying rows within the probed lists only (pre-filter semantics,
    no starvation; rows in unprobed lists are missed exactly as in
    unfiltered ANN). If ``attrs`` is None but ``predicate`` is given,
    the predicate is applied directly to `assigned` (which must then
    carry the referenced columns) so it pushes into the list scan.

    `centers` is either the Python list build_ivf returns or the
    (list_id, cvec) DataFrame build_ivf_det returns — the latter keeps
    the whole probe driver-free (no collect anywhere in the chain).

    Plan shape: queries ⨯ centers (ONE broadcast array row) → per-query
    routing as a narrow sort-slice-explode expression (no Exchange, no
    window: array_sort over (cdist, list_id) structs picks exactly the
    (cdist asc, list_id asc) top-n_probe the old row_number did —
    guide §2.4) → equi-join on list_id (hash-prunable) → distance →
    top-k.
    """
    from pyspark.sql import Window

    spark = assigned.sparkSession
    if isinstance(centers, DataFrame):
        centers_df = centers.select("list_id", F.col("cvec").alias("center"))
    else:
        centers_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "list_id int, center array<double>",
        )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qvec")
    )
    routed = _route_queries(q, centers_df, n_probe)
    if predicate is not None and attrs is None:
        assigned = assigned.filter(predicate)
    cands = assigned.join(F.broadcast(routed), on="list_id").select(
        "query_id",
        F.col(id_col).alias("id"),
        vm.distance(metric, "__qvec", vec_col).alias("distance"),
    )
    if predicate is not None and attrs is not None:
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
        cands = cands.join(qualifying, "id", "left_semi")
    w = Window.partitionBy("query_id").orderBy(
        # nulls LAST: zero-vector cosine distance is NULL and must not
        # outrank real neighbors (Spark default is nulls-first on asc)
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def ivf_sq8_index(
    assigned: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """The QUANTIZED serve-path index: IVF assignment × SQ8 codes — the
    compression ladder (functions/vectormath.py SQ8) composed with the
    coarse quantizer instead of standing alone. Each row keeps
    (id, list_id, codes array<int>, vmin, scale): int8-range codes
    dictionary/bit-pack to ~1 byte/dim in parquet, a 4× scan-size cut on
    the probed lists — the 100-TB storage economics the ladder exists
    for. Encode is a per-row narrow projection (no shuffle); write the
    result partitioned by list_id and probes read n_probe partitions of
    CODES instead of raw vectors.

    Not in the reference (it stores raw f32, src/vector.rs); the
    composition target is FAISS-style IVF-SQ (public design), expressed
    as pure DataFrame ops."""
    v = vm.as_double(vec_col)
    staged = assigned.select(
        F.col(id_col).alias("id"),
        "list_id",
        v.alias("__v"),
        F.array_min(v).alias("vmin"),
        vm.sq8_scale(v).alias("scale"),
    )
    return staged.select(
        "id",
        "list_id",
        vm.sq8_encode("__v", F.col("vmin"), F.col("scale")).alias("codes"),
        "vmin",
        "scale",
    )


def ann_knn_ivf_sq8(
    index: DataFrame,
    centers: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 0,
    raw: DataFrame | None = None,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
) -> DataFrame:
    """IVF-SQ8 search: route each query to its n_probe nearest centroids,
    scan ONLY those lists over the int8 codes with asymmetric distance
    (raw query vs decoded codes — decode pipelines inside the scan
    stage, never materialized), then optionally exact-re-rank the
    ``rerank``-deep shortlist against the raw vectors.

    ``predicate`` over ``attrs`` composes the metadata filter with the
    quantized path exactly as on the raw IVF/SRP paths: qualifying-id
    semi-join prunes code candidates BEFORE the shortlist window, so
    both the shortlist and the final top-k fill from qualifying rows
    only (filter × index × quantization — the full serve composition).

    rerank=0 (or raw=None) returns the code-only result ranked by
    asymmetric distance. With rerank ≥ k and ``raw`` (id, vec), the
    shortlist (n_queries × rerank rows — tiny) broadcasts into one join
    against the raw table and exact euclidean re-ranks it: the classic
    two-stage quantized serving design. Every step is deterministic
    (floor(x+0.5) encode), so the whole pipeline is value-exact
    oracle-twinnable."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        vm.as_double(query_vec_col).alias("__qvec"),
    )
    routed = _route_queries(
        q, centers.select("list_id", F.col("cvec").alias("center")), n_probe
    )
    decoded = vm.sq8_decode("codes", F.col("vmin"), F.col("scale"))
    cands = index.join(F.broadcast(routed), on="list_id").select(
        "query_id",
        "__qvec",
        "id",
        vm.euclidean_distance("__qvec", decoded).alias("adist"),
    )
    if predicate is not None:
        if attrs is None:
            raise ValueError("filtered search needs BOTH predicate and attrs")
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
        cands = cands.join(qualifying, "id", "left_semi")
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("id").asc())
    if not rerank or raw is None:
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "id", F.col("adist").alias("distance"), "rank")
        )
    shortlist = (
        cands.withColumn("__sr", F.row_number().over(w))
        .filter(F.col("__sr") <= rerank)
        .select("query_id", "__qvec", "id")
    )
    exact = raw.join(F.broadcast(shortlist), on="id").select(
        "query_id", "id", vm.euclidean_distance("__qvec", "vec").alias("distance")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc_nulls_last(), F.col("id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def build_mllib_lsh(
    vectors: DataFrame,
    *,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Batch ANN index build via MLlib BucketedRandomProjectionLSH —
    the distributed analog of HNSW bulk construction (reference
    src/hnsw/mod.rs:34-42, which is sequential despite its rayon claim).
    Returns (model, transformed_df with ml 'features' + 'hashes')."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        F.col(id_col), F.col(vec_col), array_to_vector(vm.as_double(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(feat)
    return model, model.transform(feat)


def ann_join_mllib(
    model,
    indexed: DataFrame,
    queries: DataFrame,
    threshold: float,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
) -> DataFrame:
    """approxSimilarityJoin batch search (reference search_batch analog,
    src/storage.rs:302-310): all pairs within euclidean `threshold`."""
    from pyspark.ml.functions import array_to_vector

    q = queries.select(
        F.col(query_id_col), array_to_vector(vm.as_double(query_vec_col)).alias("features")
    )
    joined = model.approxSimilarityJoin(q, indexed, threshold, distCol="distance")
    return joined.select(
        F.col(f"datasetA.{query_id_col}").alias("query_id"),
        F.col("datasetB.vec_id").alias("id"),
        F.col("distance"),
    )
