"""Product quantization (PQ): the top rung of the compression ladder.

SQ8 (functions/vectormath.py) compresses 4×, MRL prefixes 2–4×, sign-bit
BQ 32× — PQ closes the ladder with the design FAISS made standard for
billion-scale serving (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; public): split each d-dim vector
into `m` subspaces of d/m dims, learn a small per-subspace codebook of
`ks` centroids, and store each vector as m one-byte codes. At m=8,
ks≤256 over 64-dim float32, that is 8 bytes/vector vs 256 — a 32×
storage cut *with* graceful recall (unlike BQ's fixed sign bits, the
codebooks adapt to the data distribution).

Search is ADC (asymmetric distance computation): the raw query is
compared against the codebooks ONCE into an m×ks lookup table, and every
candidate's approximate distance is m table lookups + adds — no decode
of the database side, ever. The LUT (m·ks doubles per query) broadcasts;
candidates stream through one scan stage; the optional exact re-rank
touches only the shortlist.

Everything is deterministic and engine-portable, the repo's oracle
contract: codebook init is the first `ks` vectors ordered by md5(id)
(the same engine-portable pseudo-random draw as ann.build_ivf_det),
Lloyd updates use the fixed two-level id-block reduction tree (sums
independent of Spark's partitioning), assignment ties break on code asc,
and the ADC sum folds sub-ascending. The DuckDB twin in plans/registry.py
reproduces every value bit-for-bit.

Not in the reference (it stores raw f32 and searches flat or via HNSW,
src/vector.rs / src/hnsw/graph.rs); the parity target is the public
FAISS IVF-PQ/ADC design re-expressed as pure DataFrame ops.

Scale notes (the reason this rung exists): at 100 TB of raw vectors the
PQ code table is ~3 TB; an IVF-routed probe over codes reads n_probe/
n_lists of THAT, and the broadcast LUT keeps the scan stage shuffle-free
until the final per-query top-k. Codebook training runs on a sample in
production (the det path is the correctness spec, as with build_ivf_det).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectormath as vm

__all__ = [
    "pq_codebook", "pq_encode", "pq_encode_kernel", "pq_adc_topk", "subvectors",
    "ivf_pq_index", "ann_knn_ivf_pq",
    "ivf_residuals", "ivf_pq_residual_index", "ann_knn_ivf_pq_residual",
]


def subvectors(vectors: DataFrame, m: int, d_sub: int,
               *, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """Explode (id, vec) into (id, sub, svec): m contiguous d_sub-dim
    slices per vector. A narrow projection — no shuffle; the explode
    multiplies rows ×m but each carries only d_sub values."""
    slices = F.array(*[
        F.slice(vm.as_double(vec_col), i * d_sub + 1, d_sub) for i in range(m)
    ])
    return vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(slices).alias("sub", "svec"),
    )


def _assign_codes(subvecs: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest-centroid code per (sub, id): euclidean over the subspace,
    tie-break code asc — the per-subspace twin of ann.assign_ivf_det.
    The codebook groups to m rows of (code, cvec) arrays and broadcasts;
    the argmin is a lexicographic array_min over (d, code) structs
    evaluated PER ROW — it picks exactly the (distance asc, code asc)
    winner the oracle's row_number does, with ZERO exchange of the
    subvector table (the pre-r11 struct-min aggregation still shuffled
    one partial row per (sub, id); at 1M rows × m=16 that is 16M rows of
    shuffle per Lloyd round this no longer pays — guide §2.4). Verified
    exceptAll-empty against the aggregation form at sf0.01.

    Parallelism contract (r12, VERDICT r11 #2): pure narrow map, NO
    spread() here — the r11 in-function spread probed partition counts
    of the deep Lloyd-loop plan per call (a full physical planning pass
    each round) and stacked RoundRobin exchanges; pq_codebook spreads
    its shallow source once and every round's subvector table inherits
    that partitioning."""
    cb_arr = codebook.groupBy("sub").agg(
        F.collect_list(F.struct("code", "cvec")).alias("__cb")
    )
    best = F.array_min(
        F.transform(
            F.col("__cb"),
            lambda c: F.struct(
                vm.euclidean_distance(F.col("svec"), c["cvec"]).alias("d"),
                c["code"].alias("c"),
            ),
        )
    )
    return subvecs.join(F.broadcast(cb_arr), on="sub").select(
        "sub", "id", "svec", best["c"].alias("code")
    )


def _update_codebook(assigned: DataFrame, prev: DataFrame, block: int) -> DataFrame:
    """Lloyd update with the fixed two-level id-block reduction tree of
    ann._det_centroids, keyed by (sub, code) instead of list_id: within
    an id-block values fold in id order, block partials fold in block
    order — the double sums are a function of the data, not the
    partitioning. Empty cells keep their previous centroid (the MLlib
    KMeans convention). Per-group collect_list is bounded by `block`."""
    # Whole-subvector element-wise fold (same restructure as
    # ann._det_centroids): rows sort by id once per (sub, code, blk) and
    # svecs fold via zip_with — per dimension the additions run in the
    # SAME id-then-blk order as the old per-(pos) formulation, so the
    # doubles are bit-identical and the oracle is unchanged, while the
    # shuffle carries `rows` records instead of `rows×d_sub` exploded
    # tuples.
    def vsum(lst: str, field: str):
        col = F.array_sort(F.col(lst))
        zero = F.transform(F.element_at(F.col(lst), 1)[field], lambda _: F.lit(0.0))
        return F.aggregate(
            col, zero, lambda acc, s: F.zip_with(acc, s[field], lambda a, x: a + x)
        )

    ex = assigned.select(
        "sub", "code", "id", F.expr(f"id div {block}").alias("blk"), "svec"
    )
    l1 = (
        ex.groupBy("sub", "code", "blk")
        .agg(
            F.collect_list(F.struct("id", "svec")).alias("__lst"),
            F.count("*").alias("n1"),
        )
        .select("sub", "code", "blk", vsum("__lst", "svec").alias("s1"), "n1")
    )
    l2 = (
        l1.groupBy("sub", "code")
        .agg(
            F.collect_list(F.struct("blk", "s1")).alias("__lst"),
            F.sum("n1").alias("n"),
        )
        .select("sub", "code", vsum("__lst", "s1").alias("s"), "n")
    )
    newc = l2.select(
        "sub", "code", F.transform("s", lambda sv: sv / F.col("n")).alias("cvec")
    )
    return (
        prev.alias("p")
        .join(newc.alias("n"), ["sub", "code"], "left")
        .select("sub", "code", F.coalesce(F.col("n.cvec"), F.col("p.cvec")).alias("cvec"))
    )


def pq_codebook(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 1,
    *,
    block: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebook: (sub int, code int, cvec array<double>),
    m·ks rows. Init takes the first `ks` vectors ordered by md5(id) and
    slices them — codebook cell (sub, c) starts as seed c's sub-th slice
    — then runs `iters` det-Lloyd rounds per subspace (all subspaces
    train in ONE job chain; sub is just a grouping key). No collect
    anywhere; the result is a tiny DataFrame callers broadcast."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    from ..sources.tables import spread

    # spread ONCE at the (shallow) source, sized for the ×m subvector
    # explode the Lloyd rounds actually iterate over: subvectors() is
    # narrow, so sv inherits this partitioning for every round with no
    # per-round probe or exchange (VERDICT r11 #2; no-op at real scale)
    from ..sources.tables import _footer_rows

    n_rows = _footer_rows(vectors)
    v = spread(
        vectors, rows=None if n_rows is None else n_rows * m
    ).select(
        F.col(id_col).cast("long").alias("id"), vm.as_double(vec_col).alias("vec")
    )
    seed_key = F.md5(F.col("id").cast("string"))
    seeds = v.orderBy(seed_key.asc(), F.col("id").asc()).limit(ks)
    w = Window.orderBy(seed_key.asc(), F.col("id").asc())  # over ks rows only
    coded = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "vec"
    )
    cb = subvectors(coded, m, d_sub, id_col="code", vec_col="vec").select(
        "sub", F.col("id").cast("int").alias("code"), F.col("svec").alias("cvec")
    )
    sv = subvectors(v, m, d_sub)
    from .cache import checkpoint as _checkpoint

    for _ in range(iters):
        # same loop linearization as ann.build_ivf_det (r12): `cb` feeds
        # both the assignment and the empty-cell fallback join, so the
        # unmaterialized loop nests 2^iters copies of the seed slice in
        # the final plan. The codebook is m·ks rows — checkpoint each
        # round; values unchanged (pure materialization barrier).
        cb = _checkpoint(_update_codebook(_assign_codes(sv, cb), cb, block))
    return cb


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int,
    d_sub: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as its m nearest-subspace-centroid codes:
    (id long, codes array<int>), codes ordered sub-ascending. This is
    the stored index — ~m bytes/vector in parquet (int codes ≤ ks
    dictionary-encode to ~1 byte) vs 4·dim raw.

    ONE narrow map over the vectors: the whole codebook collapses to a
    single broadcast row of per-subspace (code, cvec) arrays and every
    subspace's argmin evaluates as a per-row array_min expression —
    same left-fold distances, same (d asc, code asc) tie-break, so the
    codes are bit-identical to the pre-r11 explode → argmin →
    groupBy(id) collect shape, with its TWO exchanges of rows×m /
    rows×1 records removed outright (guide §2.4; verified
    exceptAll-empty at sf0.01). ``passthrough`` copies extra `vectors`
    columns to the output unchanged (saves the id-join when the caller
    needs them alongside codes — same contract as pq_encode_kernel).

    NOTE on parallelism: this is a pure narrow map — it inherits its
    input's partitioning. Callers encoding a small single-file scan
    should spread() the SHALLOW input themselves (assign_ivf_det and
    _assign_codes already do); probing partition counts here would
    force a full physical planning pass over arbitrarily deep input
    plans at DataFrame-build time (measured: tens of driver seconds on
    the ivf_pq chain — guide §7.3 'planning is driver-side work')."""
    cb_nested = (
        codebook.groupBy("sub")
        .agg(F.collect_list(F.struct("code", "cvec")).alias("cbs"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cbs"))),
                lambda s: s["cbs"],
            ).alias("__cbm")
        )
    )
    vd = vm.as_double(vec_col)
    # index-lambda transform, NOT an m-way unrolled F.array: unrolling
    # builds an m·ks-fold expression tree that Catalyst/codegen choke on
    # (measured: 100 s of plan-side stall on the ivf_pq chain); this
    # form is one fold lambda evaluated m×ks times per row — same
    # arithmetic, constant-size tree
    codes = F.transform(
        F.col("__cbm"),
        lambda cbs, i: F.array_min(
            F.transform(
                cbs,
                lambda c: F.struct(
                    vm.euclidean_distance(
                        F.slice(vd, i * F.lit(d_sub) + 1, F.lit(d_sub)), c["cvec"]
                    ).alias("d"),
                    c["code"].alias("c"),
                ),
            )
        )["c"],
    )
    return vectors.crossJoin(F.broadcast(cb_nested)).select(
        F.col(id_col).cast("long").alias("id"),
        codes.alias("codes"),
        *[F.col(c) for c in passthrough],
    )


def pq_encode_kernel(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int,
    d_sub: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched BLAS twin of pq_encode — the index-BUILD scale path.
    The fold plan explodes rows×m subvectors and shuffles them TWICE
    (the struct-min agg, then the per-id codes regroup): at 100M rows ×
    m=16 that is two ~1.6B-row shuffles of vector payloads. This kernel
    collects the codebook (m·ks rows — tiny) into the task closure and
    encodes each Arrow batch with m batched argmin GEMMs over the
    (ks × d_sub) sub-codebooks: no explode, no shuffle, one narrow pass.

    Tie-break matches the fold's (distance asc, code asc): np.argmin
    returns the first minimum and codes are ordered ascending. Same
    last-ulp caveat as ann.assign_ivf_kernel — the oracle-twinned
    registry builds keep the fold.

    ``centroids``: optional (list_id, cvec) coarse centroids. When given,
    the input must carry a `list_id` column and the kernel encodes the
    RESIDUAL vec − centroid[list_id] (the fused ivf_residuals ∘
    pq_encode pass — the residual subtraction costs one gather instead
    of a join). ``passthrough`` columns copy through unchanged."""
    import numpy as np
    import pandas as pd

    cb_rows = codebook.select("sub", "code", "cvec").collect()
    cb = np.zeros((m, max(r["code"] for r in cb_rows) + 1, d_sub), dtype=np.float64)
    for r in cb_rows:
        cb[r["sub"], r["code"], :] = list(r["cvec"])
    cb2 = (cb * cb).sum(axis=2)  # (m, ks)
    cent_mat = None
    if centroids is not None:
        crows = sorted(centroids.select("list_id", "cvec").collect(),
                       key=lambda r: r["list_id"])
        # list_ids are dense 0..n-1 by construction (build_ivf_det row
        # numbers); index the matrix directly by list_id
        cent_mat = np.asarray([list(r["cvec"]) for r in crows], dtype=np.float64)

    extra = list(passthrough)
    need = [F.col(id_col).cast("long").alias("id"), vm.as_double(vec_col).alias("vec")]
    if cent_mat is not None:
        need.append(F.col("list_id").cast("int").alias("list_id"))
        if "list_id" in extra:
            extra.remove("list_id")
    v = vectors.select(*need, *extra)
    emit_list = cent_mat is not None

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64, copy=False)
            if cent_mat is not None:
                X = X - cent_mat[pdf["list_id"].to_numpy()]
            S = X.reshape(len(X), m, d_sub)
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                codes[:, s] = np.argmin(
                    S[:, s, :] @ (-2.0 * cb[s].T) + cb2[s][None, :], axis=1
                )
            out = {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            if cent_mat is not None:
                out["list_id"] = pdf["list_id"].to_numpy()
            for c in extra:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    extra_schema = "".join(
        f", {c} {vectors.schema[c].dataType.simpleString()}" for c in extra
    )
    lid = ", list_id int" if emit_list else ""
    return v.mapInPandas(run, schema=f"id long, codes array<int>{lid}{extra_schema}")


def _numpy_adc_scan_kernel(lut_rows: list, m: int, ks: int, emit_top: int):
    """mapInPandas kernel for flat ADC: every query's LUT rides in the
    closure; per Arrow batch the m code lookups become one numpy fancy-
    gather + row sum, and only each query's per-batch top-`emit_top`
    partial (by the global (adist, id) tie-break, so the partial is
    lossless for the final top-emit_top) leaves the executor. Replaces
    the interpreted per-row transform/aggregate lambda — the one
    documented hot-path lambda in SCALE.md (flat ADC 27.3 s vs 13.3 s
    BLAS exact at 1M)."""
    import numpy as np

    qids = [r[0] for r in lut_rows]
    LUT = np.array([list(r[1]) for r in lut_rows], dtype=np.float64).reshape(
        len(lut_rows), m, ks
    )
    subs = np.arange(m)[None, :]

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            # np.stack over the Arrow-materialized arrays — a per-row
            # list() comprehension here costs more than the math at
            # millions of candidate rows
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64, copy=False)
            ids = pdf["id"].to_numpy()
            frames = []
            for qi, qid in enumerate(qids):
                d2 = LUT[qi][subs, C].sum(axis=1)
                order = np.lexsort((ids, d2))[:emit_top]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "id": ids[order],
                         "adist": np.sqrt(d2[order])}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return scan


def _numpy_adc_candidates_kernel(lut_map: dict, m: int, ks: int, emit_top: int):
    """mapInPandas kernel for routed (IVF-PQ) ADC: input batches are the
    probed-list candidate rows (query_id, id, codes) — mixed queries per
    batch, so the batch groups by query and gathers per group. Emits
    per-(batch, query) top-`emit_top` partials under the (adist, id)
    tie-break (lossless for the global shortlist)."""
    import numpy as np

    subs = np.arange(m)[None, :]

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            C_all = np.stack(pdf["codes"].to_numpy()).astype(np.int64, copy=False)
            ids_all = pdf["id"].to_numpy()
            q_all = pdf["query_id"].to_numpy()
            frames = []
            for qid in pd.unique(pdf["query_id"]):
                mask = q_all == qid
                C, ids = C_all[mask], ids_all[mask]
                d2 = lut_map[qid][subs, C].sum(axis=1)
                order = np.lexsort((ids, d2))[:emit_top]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "id": ids[order],
                         "adist": np.sqrt(d2[order])}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return scan


def _arrow_adc_routed_kernel(
    pair_keys, lut_slab, mult: int, m: int, ks: int, emit_top: int,
    row_map=None,
):
    """mapInArrow kernel for per-(query, probed-list)-LUT ADC — the
    residual IVF-PQ serve path (VERDICT r8 #3). The LUT volume is
    n_queries × n_probe × m × ks doubles (a few MB at realistic probe
    widths), so the whole slab rides in the closure as one
    (G, m, ks) float64 array; `pair_keys` is the SORTED composite key
    query_id·mult + list_id for each slab row.

    Per Arrow batch, the entire scan is vectorized numpy:
      1. codes arrive as a pyarrow ListArray — `.flatten()` exposes the
         contiguous values buffer, reshaped (n, m) with ZERO per-row
         Python (the np.stack-over-object-arrays cost that made the r5
         pandas kernel LOSE to the interpreted fold is gone);
      2. slab row per candidate via searchsorted on the composite key
         (one binary search per row, vectorized);
      3. d2 = slab[g, subs, C].sum(axis=1) — one fancy gather + row sum;
      4. per-query top-`emit_top` partial under the global (adist, id)
         tie-break (lossless for the final shortlist), so only
         queries × emit_top rows per batch cross back into the JVM.

    `row_map` (optional) maps a pair_keys position to its lut_slab row —
    the non-residual path shares ONE LUT per query across all its probed
    lists, so the slab holds one row per QUERY and row_map carries the
    pair→query indirection instead of duplicating LUTs per list.
    """
    import numpy as np
    import pyarrow as pa

    subs = np.arange(m)[None, :]

    def scan(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            qids_a = batch.column("query_id")
            ids_a = batch.column("id")
            qids = qids_a.to_numpy(zero_copy_only=False).astype(np.int64)
            lids = (
                batch.column("list_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            ids = ids_a.to_numpy(zero_copy_only=False)
            flat = batch.column("codes").flatten().to_numpy(
                zero_copy_only=False
            )
            C = flat.reshape(n, m).astype(np.int64, copy=False)
            comp = qids * mult + lids
            g = np.searchsorted(pair_keys, comp)
            # fail loudly on a key miss: a (query, list) pair absent from
            # the collected routing (or an int64 overflow in the composite
            # key for hash-derived query ids) would otherwise gather a
            # NEIGHBORING query's LUT row and mis-score silently; the
            # clamp makes the compare itself safe at the array boundary
            # (one vectorized compare per batch — cheap) (ADVICE r9)
            g = np.minimum(g, pair_keys.size - 1)
            if not np.array_equal(pair_keys[g], comp):
                missing = comp[pair_keys[g] != comp]
                raise ValueError(
                    "ADC kernel: (query_id, list_id) pair(s) absent from "
                    f"the routed key set (first composite key: "
                    f"{int(missing[0])}) — routing out of sync with the "
                    "candidate scan, or composite-key overflow for very "
                    "large query ids"
                )
            if row_map is not None:
                g = row_map[g]
            d2 = lut_slab[g[:, None], subs, C].sum(axis=1)
            order = np.lexsort((ids, d2, qids))
            qs = qids[order]
            starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
            counts = np.diff(np.r_[starts, n])
            pos = np.arange(n) - np.repeat(starts, counts)
            keep = order[pos < emit_top]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[keep], type=qids_a.type),
                    pa.array(ids[keep], type=ids_a.type),
                    pa.array(np.sqrt(d2[keep]), type=pa.float64()),
                ],
                names=["query_id", "id", "adist"],
            )

    return scan


def _resolve_adc_strategy(strategy: str, candidates: DataFrame) -> str:
    from . import knn as knn_mod

    if strategy == "auto":
        return (
            "numpy"
            if knn_mod.estimated_rows(candidates) >= knn_mod.AUTO_NUMPY_THRESHOLD
            else "expr"
        )
    if strategy not in ("expr", "numpy"):
        raise ValueError(f"strategy must be auto|expr|numpy, got {strategy!r}")
    return strategy


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ks: int = 16,
    d_sub: int = 8,
    rerank: int = 0,
    raw: DataFrame | None = None,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
    strategy: str = "auto",
) -> DataFrame:
    """ADC search over PQ codes: build each query's m×ks lookup table of
    squared subspace distances ONCE (queries ⨯ codebook — both tiny),
    flatten it to an array indexed [sub·ks + code], broadcast it, and
    score every candidate as sqrt(Σ_sub lut[sub·ks + codes[sub]]) — m
    lookups and adds per row, zero decode, folded sub-ascending so the
    double result is engine-exact.

    ``predicate`` over ``attrs`` composes the metadata filter exactly as
    on the SQ8/IVF/SRP paths: a qualifying-id semi-join prunes
    candidates before the top-k window (pre-filter semantics — no
    starvation). With ``rerank`` ≥ k and ``raw`` (id, vec), the
    rerank-deep shortlist broadcasts into one join against the raw
    vectors for an exact euclidean final ranking — the standard
    two-stage PQ serving design.

    strategy: "expr" = the in-plan transform/aggregate fold (bitwise-
    exact vs the DuckDB oracle — the sf0.01 correctness spec); "numpy" =
    the Arrow-batched gather kernel (last-ulp adist drift possible, so
    pair it with rerank for exact final distances); "auto" = numpy above
    knn.AUTO_NUMPY_THRESHOLD rows, matching every other kernel flip.

    Returns (query_id, id, distance, rank); `distance` is the ADC
    approximation unless re-ranked."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        vm.as_double(query_vec_col).alias("__qvec"),
    )
    qslice = F.slice(F.col("__qvec"), F.col("sub") * d_sub + 1, F.lit(d_sub))
    lut = (
        q.crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "__qvec", "sub", "code",
            vm.squared_euclidean(qslice, F.col("cvec")).alias("d2"),
        )
        .groupBy("query_id")
        .agg(
            F.first("__qvec").alias("__qvec"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "d2"))),
                lambda s: s["d2"],
            ).alias("__lut"),
        )
    )
    qualifying = None
    if predicate is not None:
        if attrs is None:
            raise ValueError("filtered search needs BOTH predicate and attrs")
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
    strategy = _resolve_adc_strategy(strategy, codes)
    lut_rows = (
        lut.select("query_id", "__lut").collect() if strategy == "numpy" else []
    )
    if lut_rows:
        src = codes if qualifying is None else codes.join(qualifying, "id", "left_semi")
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        id_t = codes.schema["id"].dataType.simpleString()
        emit_top = rerank if (rerank and raw is not None) else k
        m_ = len(lut_rows[0]["__lut"]) // ks
        cands = src.select("id", "codes").mapInPandas(
            _numpy_adc_scan_kernel(lut_rows, m_, ks, emit_top),
            schema=f"query_id {qid_t}, id {id_t}, adist double",
        )
    else:
        adist = F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.element_at(F.col("__lut"), (i * ks + c + 1).cast("int")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        cands = codes.crossJoin(F.broadcast(lut)).select(
            "query_id", "id", adist.alias("adist")
        )
        if qualifying is not None:
            cands = cands.join(qualifying, "id", "left_semi")
    return _adc_finish(cands, q, raw, k, rerank)


def _adc_finish(
    cands: DataFrame, q: DataFrame, raw: DataFrame | None, k: int, rerank: int
) -> DataFrame:
    """Shared ADC tail: global (adist, id) top-k, or rerank-deep
    shortlist → broadcast join against raw vectors → exact euclidean
    final ranking."""
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
        .select("query_id", "id")
        .join(F.broadcast(q), "query_id")
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


def ivf_pq_index(
    assigned: DataFrame,
    codebook: DataFrame,
    m: int,
    d_sub: int,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    encode: str = "fold",
) -> DataFrame:
    """IVF × PQ — the full FAISS-style coarse-then-fine layout: each row
    keeps (id, list_id, codes). Written partitioned by list_id, a probe
    reads n_probe partitions of ~m-byte codes — the two compression
    levers (read fewer rows × read fewer bytes per row) multiplied.
    Non-residual variant: codes quantize the RAW vector, not the
    residual vs the coarse centroid (residual PQ needs a per-(query,
    list) LUT; the shared-LUT form keeps ADC one broadcast — the
    accuracy gap is re-ranked away downstream).

    ``encode``: "fold" (default) = the oracle-exact expression encode;
    "kernel" = pq_encode_kernel's one-pass BLAS encode carrying list_id
    through (no id-join) — the scale path for 100M+ builds."""
    if encode == "kernel":
        return pq_encode_kernel(
            assigned, codebook, m, d_sub,
            id_col=id_col, vec_col=vec_col, passthrough=("list_id",),
        ).select("id", "codes", F.col("list_id").cast("int").alias("list_id"))
    # list_id rides through the narrow encode — the pre-r11 shape paid a
    # join of the encoded table back against (id, list_id) for it
    return pq_encode(
        assigned, codebook, m, d_sub,
        id_col=id_col, vec_col=vec_col, passthrough=("list_id",),
    )


def ann_knn_ivf_pq(
    index: DataFrame,
    centers: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    ks: int = 16,
    d_sub: int = 8,
    rerank: int = 0,
    raw: DataFrame | None = None,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
    strategy: str = "auto",
) -> DataFrame:
    """IVF-PQ search: route each query to its n_probe nearest coarse
    centroids (ann.ann_knn_ivf's routing shape), scan ONLY those lists'
    PQ codes with ADC (broadcast LUT, m lookups/row), then optionally
    exact-re-rank the shortlist against raw vectors. The distances and
    candidate sets are bit-deterministic, so the whole compose is
    value-exact oracle-twinnable (plans/registry.py ann_ivf_pq_knn).

    strategy: "expr" is the oracle-exact in-plan fold; "numpy" is the
    legacy pandas gather kernel (grouped per query inside each batch) —
    it LOST to the fold in round 5 (expr 9.4 s vs kernel 11.7 s at 1M;
    54.9 vs 84.5 s at 10M) because np.stack over Arrow-materialized
    object arrays dominated, and is kept only as the measured-loss
    record; "arrow" is the mapInArrow LUT-slab kernel (r9) — codes via
    ListArray.flatten, one slab row per QUERY with a pair→query row_map
    (no LUT duplication per probed list), one numpy gather + row-sum
    per batch. "auto" resolves to ARROW above knn.AUTO_NUMPY_THRESHOLD
    index rows and expr below (the sf-scale oracle spec), superseding
    the round-5 always-expr choice — the cost that made the pandas
    kernel lose is gone (same-session A/B in SCALE.md r9). adist may
    drift in the last ulp vs the fold on the arrow path; pair with
    rerank when exact ADC ordering matters.

    ``predicate`` over ``attrs`` composes the metadata filter exactly as
    on the SQ8/IVF/SRP paths (reference search_with_filter over any
    Index, src/storage.rs:249-290): a qualifying-id semi-join prunes
    code candidates BEFORE the shortlist window, so shortlist and top-k
    fill from qualifying rows only — filter × coarse index × PQ, the
    full serve composition."""
    from .ann import _route_queries

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        vm.as_double(query_vec_col).alias("__qvec"),
    )
    routed = _route_queries(
        q, centers.select("list_id", F.col("cvec").alias("center")), n_probe
    ).select("query_id", "list_id")
    qslice = F.slice(F.col("__qvec"), F.col("sub") * d_sub + 1, F.lit(d_sub))
    lut = (
        q.crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "__qvec", "sub", "code",
            vm.squared_euclidean(qslice, F.col("cvec")).alias("d2"),
        )
        .groupBy("query_id")
        .agg(
            F.first("__qvec").alias("__qvec"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "d2"))),
                lambda s: s["d2"],
            ).alias("__lut"),
        )
    )
    qualifying = None
    if predicate is not None:
        if attrs is None:
            raise ValueError("filtered search needs BOTH predicate and attrs")
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
    if strategy == "auto":
        from . import knn as knn_mod

        strategy = (
            "arrow"
            if knn_mod.estimated_rows(index) >= knn_mod.AUTO_NUMPY_THRESHOLD
            else "expr"
        )
    elif strategy not in ("expr", "numpy", "arrow"):
        raise ValueError(
            f"strategy must be auto|expr|numpy|arrow, got {strategy!r}"
        )
    if strategy == "arrow":
        import numpy as np

        # ONE collect for routing AND LUTs (r11): the two separate
        # collects each ran a driver-blocking job whose shared subtree
        # (queries × centers, incl. forcing the persisted centroid
        # build) executed twice at DataFrame-build time. The routed
        # list_ids aggregate per query BEFORE the LUT join (r12, ADVICE
        # r11): the flat join shipped each query's m·ks-double LUT once
        # per probed list — n_probe× the necessary driver transfer and
        # collect memory; one row per query crosses the wire instead.
        both = (
            routed.groupBy("query_id")
            .agg(F.collect_list("list_id").alias("__lists"))
            .join(lut.select("query_id", "__lut"), "query_id")
            .collect()
        )
        pair_rows = [
            {"query_id": r["query_id"], "list_id": l}
            for r in both
            for l in r["__lists"]
        ]
        qrows = [{"query_id": r["query_id"], "__lut": r["__lut"]} for r in both]
        # empty queries OR empty routing (e.g. no centers): the kernel's
        # composite-key build (max over pair_rows) would raise on an empty
        # sequence — expr returns the same (empty) result (ADVICE r9)
        if not qrows or not pair_rows:
            strategy = "expr"
    if strategy == "arrow":
        lut_len = len(qrows[0]["__lut"])
        if lut_len % ks:
            raise ValueError(
                f"LUT length {lut_len} is not a multiple of ks={ks}: the "
                "codebook trained fewer than ks codes per subspace"
            )
        m_ = lut_len // ks
        slab = np.array(
            [list(r["__lut"]) for r in qrows], dtype=np.float64
        ).reshape(len(qrows), m_, ks)
        qrow_of = {r["query_id"]: i for i, r in enumerate(qrows)}
        mult = max(r["list_id"] for r in pair_rows) + 1
        keys = np.array(
            [int(r["query_id"]) * mult + int(r["list_id"]) for r in pair_rows],
            dtype=np.int64,
        )
        row_map = np.array(
            [qrow_of[r["query_id"]] for r in pair_rows], dtype=np.int64
        )
        order = np.argsort(keys)
        keys, row_map = keys[order], row_map[order]
        src = index.join(
            F.broadcast(routed.select("query_id", "list_id")), on="list_id"
        )
        if qualifying is not None:
            src = src.join(qualifying, "id", "left_semi")
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        id_t = index.schema["id"].dataType.simpleString()
        emit_top = rerank if (rerank and raw is not None) else k
        cands = src.select("query_id", "list_id", "id", "codes").mapInArrow(
            _arrow_adc_routed_kernel(
                keys, slab, mult, m_, ks, emit_top, row_map=row_map
            ),
            schema=f"query_id {qid_t}, id {id_t}, adist double",
        )
        return _adc_finish(cands, q, raw, k, rerank)
    lut_rows = (
        lut.select("query_id", "__lut").collect() if strategy == "numpy" else []
    )
    if lut_rows:
        import numpy as np

        m_ = len(lut_rows[0]["__lut"]) // ks
        lut_map = {
            r["query_id"]: np.array(list(r["__lut"]), dtype=np.float64).reshape(m_, ks)
            for r in lut_rows
        }
        src = index.join(F.broadcast(routed), on="list_id")
        if qualifying is not None:
            src = src.join(qualifying, "id", "left_semi")
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        id_t = index.schema["id"].dataType.simpleString()
        emit_top = rerank if (rerank and raw is not None) else k
        cands = src.select("query_id", "id", "codes").mapInPandas(
            _numpy_adc_candidates_kernel(lut_map, m_, ks, emit_top),
            schema=f"query_id {qid_t}, id {id_t}, adist double",
        )
    else:
        adist = F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.element_at(F.col("__lut"), (i * ks + c + 1).cast("int")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        cands = (
            index.join(F.broadcast(routed), on="list_id")
            .join(F.broadcast(lut), on="query_id")
            .select("query_id", "id", adist.alias("adist"))
        )
        if qualifying is not None:
            cands = cands.join(qualifying, "id", "left_semi")
    return _adc_finish(cands, q, raw, k, rerank)


def ivf_residuals(
    assigned: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Residual vectors r = v − centroid(list(v)): (id, list_id, rvec).
    A broadcast join + elementwise subtract — narrow, no shuffle. The
    residual distribution is centered near zero with far less variance
    than the raw vectors, which is why residual-PQ codebooks quantize
    tighter than raw-PQ codebooks at the same (m, ks)."""
    return assigned.join(
        F.broadcast(centroids.select("list_id", "cvec")), "list_id"
    ).select(
        F.col(id_col).alias("id"),
        "list_id",
        vm.vec_sub(vec_col, "cvec").alias("rvec"),
    )


def ivf_pq_residual_index(
    assigned: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    m: int,
    d_sub: int,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    encode: str = "fold",
) -> DataFrame:
    """TRUE FAISS IVF-PQ layout (Jégou et al. TPAMI 2011, §IV): codes
    quantize the RESIDUAL vs the assigned coarse centroid, not the raw
    vector — ivf_pq_index's documented accuracy gap closed. `codebook`
    must be trained on ivf_residuals (pq_codebook over rvec). Same
    (id, codes, list_id) schema as the non-residual index; only the
    meaning of the codes differs.

    ``encode``: "fold" (default) = oracle-exact expression encode over
    the joined residuals; "kernel" = pq_encode_kernel's FUSED
    residual-subtract + encode pass (centroid gather in the closure —
    no join, no shuffle) — the 100M+ build path."""
    if encode == "kernel":
        return pq_encode_kernel(
            assigned, codebook, m, d_sub,
            id_col=id_col, vec_col=vec_col, centroids=centroids,
        ).select("id", "codes", "list_id")
    res = ivf_residuals(assigned, centroids, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(res, codebook, m, d_sub, id_col="id", vec_col="rvec")
    return codes.join(res.select("id", "list_id"), "id")


def ann_knn_ivf_pq_residual(
    index: DataFrame,
    centers: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    ks: int = 16,
    d_sub: int = 8,
    rerank: int = 0,
    raw: DataFrame | None = None,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_embedding",
    predicate: Column | None = None,
    attrs: DataFrame | None = None,
    attrs_id_col: str = "vec_id",
    strategy: str = "auto",
) -> DataFrame:
    """Residual IVF-PQ search: the LUT is PER (query, probed list) —
    each probed list's residual query r_q = q − c_list gets its own
    m×ks table of squared subspace distances, so the ADC distance
    approximates ‖q − (c_list + recon(codes))‖ exactly as FAISS's
    IVFPQ does. LUT volume is n_queries × n_probe × m × ks doubles —
    still a broadcast (a few MB for realistic probe widths); candidates
    join it on (query_id, list_id), everything else matches
    ann_knn_ivf_pq (shortlist window, optional exact re-rank, optional
    metadata-filter semi-join). Deterministic end-to-end — value-exact
    oracle-twinnable (plans/registry.py ann_ivf_pq_res_knn).

    strategy: "expr" = the in-plan element_at fold (bitwise-exact vs
    the DuckDB oracle — the sf0.01 correctness spec); "kernel" = the
    mapInArrow LUT-scan kernel (_arrow_adc_routed_kernel): the whole
    per-(query,list) LUT slab rides in the closure and each batch is
    one numpy gather + row-sum — the 100M+ serve path (VERDICT r8 #3;
    the r5 pandas kernel lost to the fold on Arrow-export overhead,
    the ListArray.flatten path does not — measured at the 10M decade,
    SCALE.md r9). adist may drift in the last ulp vs the fold, so pair
    it with rerank (exact euclidean final ranking) when exact ordering
    matters. "auto" = kernel above knn.AUTO_NUMPY_THRESHOLD index rows,
    matching every other kernel flip; requires integral query ids and
    list ids (composite-key routing), which every index built here has.
    """
    from .ann import _route_queries

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        vm.as_double(query_vec_col).alias("__qvec"),
    )
    routed = _route_queries(
        q, centers.select("list_id", F.col("cvec").alias("center")), n_probe,
        keep_center=True,
    ).select(
        "query_id", "list_id", "__qvec",
        vm.vec_sub("__qvec", "center").alias("__rq"),
    )
    rq_slice = F.slice(F.col("__rq"), F.col("sub") * d_sub + 1, F.lit(d_sub))
    lut = (
        routed.crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "list_id", "__qvec", "sub", "code",
            vm.squared_euclidean(rq_slice, F.col("cvec")).alias("d2"),
        )
        .groupBy("query_id", "list_id")
        .agg(
            F.first("__qvec").alias("__qvec"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "d2"))),
                lambda s: s["d2"],
            ).alias("__lut"),
        )
    )
    qualifying = None
    if predicate is not None:
        if attrs is None:
            raise ValueError("filtered search needs BOTH predicate and attrs")
        qualifying = attrs.filter(predicate).select(F.col(attrs_id_col).alias("id"))
    if strategy == "auto":
        from . import knn as knn_mod

        strategy = (
            "kernel"
            if knn_mod.estimated_rows(index) >= knn_mod.AUTO_NUMPY_THRESHOLD
            else "expr"
        )
    elif strategy not in ("expr", "kernel"):
        raise ValueError(f"strategy must be auto|expr|kernel, got {strategy!r}")
    if strategy == "kernel":
        import numpy as np

        rows = lut.select("query_id", "list_id", "__lut").collect()
        if not rows:  # no queries / empty routing — expr path returns empty
            strategy = "expr"
    if strategy == "kernel":
        lut_len = len(rows[0]["__lut"])
        if lut_len % ks:
            raise ValueError(
                f"LUT length {lut_len} is not a multiple of ks={ks}: the "
                "codebook trained fewer than ks codes per subspace "
                "(training sample smaller than ks?) — the expression path "
                "would mis-index the same LUT silently; fix the codebook "
                "or pass the actual ks"
            )
        m_ = lut_len // ks
        mult = max(r["list_id"] for r in rows) + 1
        keys = np.array(
            [int(r["query_id"]) * mult + int(r["list_id"]) for r in rows],
            dtype=np.int64,
        )
        order = np.argsort(keys)
        keys = keys[order]
        slab = np.array(
            [list(rows[int(i)]["__lut"]) for i in order], dtype=np.float64
        ).reshape(len(rows), m_, ks)
        src = index.join(
            F.broadcast(routed.select("query_id", "list_id")), on="list_id"
        )
        if qualifying is not None:
            src = src.join(qualifying, "id", "left_semi")
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        id_t = index.schema["id"].dataType.simpleString()
        emit_top = rerank if (rerank and raw is not None) else k
        cands = src.select("query_id", "list_id", "id", "codes").mapInArrow(
            _arrow_adc_routed_kernel(keys, slab, mult, m_, ks, emit_top),
            schema=f"query_id {qid_t}, id {id_t}, adist double",
        )
        return _adc_finish(cands, q, raw, k, rerank)
    adist = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("codes"),
                lambda c, i: F.element_at(F.col("__lut"), (i * ks + c + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    # one lut row per (query, probed list): joining on list_id alone
    # yields exactly the candidates of that query's probed lists
    cands = (
        index.join(F.broadcast(lut), on="list_id")
        .select("query_id", "__qvec", "id", adist.alias("adist"))
    )
    if qualifying is not None:
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
