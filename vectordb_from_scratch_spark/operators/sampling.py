"""Deterministic sampling operators — corpus mixing for training-data
pipelines (BASELINE.json north star; absent from the reference, whose
data model has no sampling at all).

Why hash-based, not RNG: `df.sample()`/`TABLESAMPLE` draw from a
partition-seeded RNG, so results change with partitioning, task retries,
and engine — unacceptable both for the oracle gate and for reproducible
training corpora. Hashing the row KEY gives a sample that is a pure
function of the data: identical across engines, runs, partitionings,
and cluster sizes, and trivially resumable (re-running a failed stage
re-selects exactly the same rows).

Scale: the predicate is a narrow md5-of-key comparison — fully
codegen'd, pushes through scans as an ordinary filter, shuffles
nothing. Changing mixing weights re-filters the same scan; no shuffle,
no state. Per-stratum rates are a broadcast map lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import _HEXDIGITS, hex_value_from_md5, shingles_from_tokens, tokens

__all__ = ["hash_uniform", "stratified_sample", "cluster_sample", "md5_bucket",
           "dsir_logweights", "hard_negatives"]


def hash_uniform(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform-[0,1) draw from a row key: the first 8
    nibbles of md5(salt || key) as a 32-bit integer, scaled by 2^-32.

    Built on the shared nibble recipe (`functions.text.hex_value_from_md5`)
    — the same digits extracted in DuckDB SQL reproduce every draw
    bit-for-bit (md5 hex is identical across engines; the dyadic scale is
    exact in double). `salt` decorrelates independent sampling decisions
    on the same key (e.g. a train/valid split after a mixing pass).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string") if isinstance(key, str) else key.cast("string")))
    return hex_value_from_md5(h, start=0, digits=8).cast("double") / float(1 << 32)


def sql_hash_uniform(key_sql: str, salt: str = "") -> str:
    """The DuckDB twin of `hash_uniform` — same md5 nibbles, same scale.
    The salt is embedded as a SQL string literal; quotes are escaped so a
    salt can never break the oracle query the Spark side accepts."""
    h = f"md5('{salt.replace(chr(39), chr(39) * 2)}' || ({key_sql})::VARCHAR)"
    terms = " + ".join(
        f"(instr('{_HEXDIGITS}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}.0"
        for i in range(8)
    )
    return f"(({terms}) / {float(1 << 32)})"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing step of a
    training pipeline ("keep 50% of English, 12.5% of code, all of
    wiki"). Keeps a row iff hash_uniform(key) < rates[stratum];
    unlisted strata get `default_rate` (0 = drop).

    The rates map is a literal broadcast into the filter expression;
    realized rates converge to the requested ones at corpus scale while
    membership stays exactly reproducible (see `hash_uniform`).
    """
    pairs: list[Column] = []
    for s, r in rates.items():
        pairs += [F.lit(s), F.lit(float(r))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(float(default_rate)),
    )
    return df.filter(hash_uniform(key_col, salt=salt) < rate)


def cluster_sample(
    assigned: DataFrame,
    per_cluster: int,
    *,
    id_col: str = "id",
    cluster_col: str = "list_id",
    salt: str = "",
) -> DataFrame:
    """Cluster-balanced diversity sampling: a deterministic `per_cluster`-
    row draw from every cluster — the curation step that keeps a corpus
    from collapsing onto its densest embedding regions (each semantic
    cluster keeps equal representation regardless of its population;
    cf. cluster-based selection in SemDeDup, Abbas et al. 2023, public).

    Draw = the `per_cluster` smallest salted-hash uniforms per cluster
    (ties impossible: (draw, id) is total). Deterministic, engine-
    portable, and independent of Spark partitioning.

    Scale shape: clusters are FEW (n_lists) and rows are many, so a
    bare row_number window partitioned by cluster would collapse each
    cluster onto one task. Instead the top-n runs TWO-LEVEL, the same
    tree as vocabulary()'s top-k: level 1 keeps ≤ per_cluster rows per
    (cluster, input partition) — map-side, no shuffle of the data, the
    window sees only one partition's slice of one cluster — then level 2
    ranks the ≤ partitions × per_cluster survivors per cluster. The full
    table is never shuffled; only survivors move.
    """
    from pyspark.sql import Window

    draw = hash_uniform(id_col, salt=salt)
    staged = assigned.withColumn("__draw", draw).withColumn(
        "__pid", F.spark_partition_id()
    )
    order = (F.col("__draw").asc(), F.col(id_col).asc())
    w1 = Window.partitionBy(cluster_col, "__pid").orderBy(*order)
    level1 = (
        staged.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= per_cluster)
        .drop("__r1", "__pid")
    )
    w2 = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        level1.withColumn("draw_rank", F.row_number().over(w2))
        .filter(F.col("draw_rank") <= per_cluster)
        .drop("__draw")
    )


def md5_bucket(col: Column, n_buckets: int, salt: str = "") -> Column:
    """Engine-portable feature hash: md5 nibbles → u32 → mod n_buckets
    (the same shared nibble recipe as hash_uniform, without the scale)."""
    h = F.md5(F.concat(F.lit(salt), col))
    return (hex_value_from_md5(h, start=0, digits=8) % n_buckets).cast("int")


def sql_md5_bucket(expr: str, n_buckets: int, salt: str = "") -> str:
    """DuckDB twin of md5_bucket — identical nibbles, integer arithmetic."""
    h = f"md5('{salt.replace(chr(39), chr(39) * 2)}' || ({expr}))"
    terms = " + ".join(
        f"(instr('{_HEXDIGITS}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"((({terms}) % {n_buckets})::INTEGER)"


def dsir_logweights(
    documents: DataFrame,
    target_filter: Column,
    n_buckets: int = 64,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023 — public): score
    every document by how much more likely its hashed-bigram bag is
    under the TARGET distribution than under the RAW corpus
    distribution. Selecting top-weight (or weight-resampled) documents
    tilts a giant raw corpus toward a small high-quality target domain —
    the data-selection step between crawling and training.

      features : word bigrams hashed into `n_buckets` (md5 nibble
                 recipe — engine-portable, no vocab to ship);
      model    : bag-of-buckets multinomial per side, add-1 smoothed;
      weight   : log w(x) = Σ_b n_b(x) · (ln p_target[b] − ln p_raw[b]).

    Scale: one explode of the corpus into (doc, bucket) counts; both
    distributions are `n_buckets`-row aggregates of that SAME staged
    table (the target side via a conditional sum — no second scan); the
    log-likelihood-ratio table broadcasts back. Nothing driver-side,
    no UDF. Output: (id, n_bigrams, logw) for docs with ≥1 bigram.
    """
    # spread: the bigram explode + per-gram md5 is compute-heavy NARROW
    # work — a 1-split scan would serialize it on one core; no-op at
    # real scale (r11)
    from ..sources.tables import spread

    staged = spread(documents).withColumn("__is_t", target_filter.cast("int"))
    grams = staged.select(
        F.col(id_col),
        F.col("__is_t"),
        F.explode(shingles_from_tokens(tokens(text_col), 2)).alias("g"),
    )
    from .cache import track as _track

    # persisted: BOTH the per-bucket distribution agg and the final
    # weight join consume this table, and Spark plans are trees — without
    # the cache the expensive stage (bigram explode + per-gram md5 over
    # the whole corpus) runs twice. doc_bucket itself is small: ≤
    # n_buckets rows per doc, ids + three ints.
    doc_bucket = _track(
        grams.select(
            id_col, "__is_t", md5_bucket(F.col("g"), n_buckets, salt=salt).alias("bucket")
        )
        .groupBy(id_col, "__is_t", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_bucket = doc_bucket.groupBy("bucket").agg(
        F.sum("n").alias("c_raw"),
        F.sum(F.col("n") * F.col("__is_t")).alias("c_t"),
    )
    totals = per_bucket.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_t").alias("t_t")
    )
    llr = per_bucket.join(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + 1).cast("double") / (F.col("t_t") + n_buckets))
            - F.log((F.col("c_raw") + 1).cast("double") / (F.col("t_raw") + n_buckets))
        ).alias("llr"),
    )
    return (
        doc_bucket.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.round(
                F.sum(
                    (F.col("n").cast("double") * F.col("llr")).cast("decimal(28,18)")
                ).cast("double"),
                6,
            ).alias("logw"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    documents: DataFrame,
    n_probes: int = 5,
    k: int = 5,
    overfetch: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DEDUP-AWARE hard-negative mining for retrieval/embedding training
    (the standard contrastive-training data prep — e.g. DPR/Contriever
    recipes, public): for each probe, the nearest OTHER documents by
    cosine are the hard negatives — EXCEPT that near-duplicates of the
    probe are hidden positives, and training on them as negatives
    poisons the objective. So: retrieve an over-fetched shortlist,
    anti-join the probe's exact-duplicate group (normalized-text md5,
    the dedup_exact fingerprint), keep the first k survivors.

    Composition: any search path (exact here; swap an ANN/PQ ranking
    unchanged) × the dedup fingerprint table — rankings are rankings.
    The duplicate table is keyed (query_id, id); the anti-join is an
    equi-join on the shortlist (probes × overfetch·k rows), never on the
    corpus. Returns (query_id, neg_id, distance, neg_rank 1..k).

    Uses the doc_id ↔ vec_id pairing of the synthetic tables (doc i is
    embedded as vector i), the same convention as hybrid_search_rrf."""
    from . import knn as knn_ops
    from ..functions import text as X

    probes = embeddings.filter(F.col(id_col) < n_probes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_embedding")
    )
    short = knn_ops.knn(
        embeddings, probes, k=overfetch * k, metric="cosine",
        id_col=id_col, vec_col=vec_col, exclude_self=True,
    )
    fp = documents.select(
        F.col("doc_id").alias("id"), X.fingerprint("text").alias("__fp")
    )
    dup_pairs = (
        fp.withColumnRenamed("id", "query_id")
        .join(fp.withColumnRenamed("__fp", "__fp2"), F.col("__fp") == F.col("__fp2"))
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "id")
    )
    survivors = short.join(dup_pairs, ["query_id", "id"], "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    return (
        survivors.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "query_id", F.col("id").alias("neg_id"), "distance", "neg_rank"
        )
    )
