"""Hybrid retrieval: lexical + vector rankings fused with Reciprocal
Rank Fusion (Cormack, Clarke, Büttcher, "Reciprocal Rank Fusion
outperforms Condorcet and individual rank learning methods", SIGIR 2009
— public; the fusion every production vector DB ships as "hybrid
search").

The reference searches one signal at a time (flat/HNSW over vectors,
src/storage.rs:217-245); real retrieval stacks run BOTH a lexical
ranking (BM25/TF-IDF) and a vector ranking, then fuse:

    RRF(d) = Σ_sources 1/(k0 + rank_source(d))

Rank-based fusion needs no score calibration between sources — only the
RANKS travel, which also makes it the cheapest possible distributed
fusion: two narrow (query_id, id, rank) tables, one full-outer join.

Determinism: ranks are integers from total-ordered windows (score desc,
id asc); each contribution is 1.0/(k0 + rank) in double; contributions
add in fixed source order — bit-identical across engines, so the whole
hybrid pipeline is value-exact oracle-twinnable (plans/registry.py
hybrid_search_rrf).

Scale: the lexical side is the inverted-index join of
textops.tfidf_cosine_pairs (probe side semi-joined to the probe set, so
fan-out is probes × df, never df²); the vector side is any search path
(exact knn here; swap in an ANN/PQ path unchanged — rankings are
rankings). The fusion join carries ≤ probes × depth rows per source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.tables import spread

__all__ = ["lexical_topk", "rrf_fuse", "hybrid_search_rrf",
           "weighted_fuse", "hybrid_search_weighted"]


def lexical_topk(
    documents: DataFrame,
    probe_pred: Column,
    depth: int = 20,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-probe lexical ranking: TF-IDF cosine of each probe document
    against the whole corpus via the inverted index, top `depth` per
    probe (self included at rank 1 — same convention as the vector
    side's self-match). Returns (query_id, id, sim, rank).

    Decimal-exact dot/norm sums (order-independent across
    partitionings), the same parity rule as tfidf_cosine_pairs. Docs
    sharing no term with the probe never appear — they'd carry sim 0.

    Plan shape (r12): the pre-r12 form re-derived the CORPUS
    tokenize+tf tree four times — under the probe semi-join, under the
    dot join, and once per side of the norm join-backs (30 parquet
    scans / 92 exchanges in the one weighted plan). tf and the norm are
    per-document quantities, so (a) the probe side tokenizes ONLY the
    probe docs (identical tf values — no corpus aggregate feeds them
    except the broadcast df table idf needs anyway), (b) the corpus
    norm rides the inv tree as an id-keyed window (the same
    order-independent decimal sum the groupBy computed, attached
    without a join-back), and (c) the probe rows broadcast into the
    term join, so the corpus index is never shuffled by term. The
    corpus explode+tf now appears once under inv + once under the
    broadcast df table — the two passes TF-IDF fundamentally needs
    (idf requires corpus df before weights exist).
    NOT persisted/checkpointed — A/B'd r8 (persist lost at sf0.1) and
    re-A/B'd r12 at c32 AND c8 (checkpoint variants inside the ±20%
    noise band); with the duplication gone the remaining tree is
    single-consumer anyway."""
    toks = spread(documents).select(
        F.col(id_col), F.explode(X.tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = documents.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log(
        (F.col("__n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double")
    )
    inv = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(nd))
        .select("term", F.col(id_col), (F.col("tf") * idf).alias("w"))
    )
    # corpus norm: same decimal sum as the former groupBy(id)+join-back,
    # attached in-tree by an id-keyed window (sum over the whole
    # partition frame — order-independent, value-identical)
    wid = Window.partitionBy(id_col)
    inv_n = inv.withColumn(
        "dnrm",
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(18,12)"))
            .over(wid)
            .cast("double")
        ),
    )
    # probe side: tf/weights from the probe docs alone (per-doc values),
    # idf from the SAME broadcast df table — bit-identical to the former
    # corpus-tree semi-join, at probe cost instead of corpus cost
    ptoks = documents.filter(probe_pred).select(
        F.col(id_col), F.explode(X.tokens(text_col)).alias("term")
    )
    ptf = ptoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    pinv = (
        ptf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(nd))
        .select(F.col(id_col), "term", (F.col("tf") * idf).alias("qw"))
    )
    qn = pinv.groupBy(id_col).agg(
        F.sqrt(
            F.sum((F.col("qw") * F.col("qw")).cast("decimal(18,12)")).cast("double")
        ).alias("qnrm")
    )
    probe_inv = pinv.join(F.broadcast(qn), id_col).select(
        F.col(id_col).alias("query_id"), "term", "qw", "qnrm"
    )
    dots = (
        F.broadcast(probe_inv)
        .join(inv_n, "term")
        .groupBy("query_id", F.col(id_col).alias("id"))
        .agg(
            F.sum((F.col("qw") * F.col("w")).cast("decimal(18,12)"))
            .cast("double")
            .alias("dot"),
            F.first("qnrm").alias("qnrm"),   # constant per query
            F.first("dnrm").alias("dnrm"),   # constant per id
        )
    )
    sim = dots.select(
        "query_id", "id",
        (F.col("dot") / (F.col("qnrm") * F.col("dnrm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select("query_id", "id", "sim", "rank")
    )


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Fuse two (query_id, id, rank) rankings:
    score = 1/(k0 + lex_rank) + 1/(k0 + vec_rank), a source missing a
    doc contributes 0. Returns the top-k per query:
    (query_id, id, rrf_score, text_rank, vec_rank, rank) — the source
    ranks ride along (NULL where the source missed the doc)."""
    le = lexical.select("query_id", "id", F.col("rank").alias("text_rank"))
    ve = vector.select("query_id", "id", F.col("rank").alias("vec_rank"))
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k0) + F.col(r)).cast("double"), F.lit(0.0)
    )
    fused = le.join(ve, ["query_id", "id"], "full_outer").select(
        "query_id", "id",
        (contrib("text_rank") + contrib("vec_rank")).alias("rrf_score"),
        "text_rank", "vec_rank",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rrf_score", "text_rank", "vec_rank", "rank")
    )


def weighted_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    w_lex: float = 0.5,
    w_vec: float = 0.5,
    score_col: str = "sim",
) -> DataFrame:
    """Relative-score fusion: min-max normalize each source's scores PER
    QUERY to [0, 1], then combine  w_lex·norm_lex + w_vec·norm_vec  (a
    source missing a doc contributes 0). The score-based alternative to
    RRF that production hybrid engines ship alongside it — it preserves
    score MAGNITUDE (a runaway best match dominates), where RRF only
    preserves order.

    Inputs are (query_id, id, <score_col>[, ...]) tables, higher = better
    — lexical_topk's `sim` and a vector ranking's similarity both qualify;
    `score_col` names the score column (default "sim", matching
    lexical_topk's output).
    A single-result source normalizes to 1.0 (max==min guard). Per-query
    min/max are window aggregates over the shortlists (bounded rows per
    query), the fusion is one full-outer join of two narrow tables —
    same distributed shape as rrf_fuse. min/max are order-independent
    and the weighted sum folds in fixed source order, so the output is
    value-exact oracle-twinnable.

    Returns (query_id, id, fused_score, lex_norm, vec_norm, rank).
    """

    def norm(src: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("query_id")
        lo, hi = F.min("score").over(w), F.max("score").over(w)
        return src.select(
            "query_id", "id",
            F.when(hi == lo, F.lit(1.0))
            .otherwise((F.col("score") - lo) / (hi - lo))
            .alias(out),
        )

    le = norm(lexical.select("query_id", "id", F.col(score_col).alias("score")), "lex_norm")
    ve = norm(vector.select("query_id", "id", F.col(score_col).alias("score")), "vec_norm")
    fused = le.join(ve, ["query_id", "id"], "full_outer").select(
        "query_id", "id",
        (
            F.lit(w_lex) * F.coalesce("lex_norm", F.lit(0.0))
            + F.lit(w_vec) * F.coalesce("vec_norm", F.lit(0.0))
        ).alias("fused_score"),
        "lex_norm", "vec_norm",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("fused_score").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "fused_score", "lex_norm", "vec_norm", "rank")
    )


def hybrid_search_weighted(
    documents: DataFrame,
    embeddings: DataFrame,
    n_probes: int = 5,
    k: int = 10,
    depth: int = 20,
    w_lex: float = 0.5,
    w_vec: float = 0.5,
) -> DataFrame:
    """End-to-end weighted-score hybrid search over the doc↔embedding
    pairing (doc_id i ↔ vec_id i): lexical TF-IDF-cosine top-`depth` and
    vector cosine top-`depth`, min-max normalized per query and fused by
    weight. Same retrieval legs as hybrid_search_rrf; only the fusion
    differs."""
    from . import knn

    lex = lexical_topk(documents, F.col("doc_id") < n_probes, depth=depth)
    probes = embeddings.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    vec = knn.knn(embeddings, probes, k=depth, metric="cosine").select(
        "query_id", "id", (F.lit(1.0) - F.col("distance")).alias("sim")
    )
    return weighted_fuse(lex, vec, k=k, w_lex=w_lex, w_vec=w_vec)


def hybrid_search_rrf(
    documents: DataFrame,
    embeddings: DataFrame,
    n_probes: int = 5,
    k: int = 10,
    depth: int = 20,
    k0: int = 60,
) -> DataFrame:
    """End-to-end hybrid search over the synthetic doc↔embedding pairing
    (doc_id i ↔ vec_id i, ids < n_probes are the probes): lexical
    TF-IDF-cosine top-`depth` + vector cosine top-`depth`, RRF-fused to
    a top-`k`. The shape every hybrid vector DB serves; both sides and
    the fusion are deterministic."""
    from . import knn

    lex = lexical_topk(documents, F.col("doc_id") < n_probes, depth=depth)
    probes = embeddings.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    vec = knn.knn(embeddings, probes, k=depth, metric="cosine").select(
        "query_id", "id", "rank"
    )
    return rrf_fuse(lex, vec, k=k, k0=k0)
