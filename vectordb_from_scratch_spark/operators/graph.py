"""Graph analytics over relational edges: PageRank (Page, Brin,
Motwani, Winograd 1998 — public). Complements the dedup module's
connected components (operators/dedup.py) with the other canonical
iterative graph operator; useful in data curation for link/citation
centrality weighting.

Deterministic by construction, the repo's oracle contract: the
per-target contribution sum uses the fixed two-level src-block
reduction tree (same device as ann._det_centroids) so the double
result is a function of the DATA, not Spark's partitioning — and any
engine folding the same tree (the DuckDB twin) reproduces it
bit-for-bit.

Simplified formulation (documented divergence from the full random
surfer): dangling nodes' mass is NOT redistributed — pr'(v) =
(1-d)/n + d·Σ_{u→v} pr(u)/outdeg(u), so total mass decays where sinks
exist. Rankings are unaffected for the connected cores this is used
on, and the formula stays a pure join+aggregate per iteration.

Scale: each iteration is one equi-join of (node, pr) against the edge
list plus one bounded two-level aggregation — the standard distributed
PageRank shape; edges are the big table and are never re-shuffled if
pre-partitioned by src. Iterations unroll with a localCheckpoint per
round (pr feeds both the contribution join and the next round's
baseline, the same lineage-doubling shape as mmr_diversify)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "label_propagation"]


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    *,
    block: int = 4096,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list (distinct (src, dst) pairs).
    Returns (node, pr) for every node appearing as src or dst.
    `damping` and its complement must be exact-literal doubles on both
    engines — pass 0.85 and the twin writes 0.15, never 1-0.85."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = F.lit(1.0 - damping) / F.col("__n").cast("double")
    pr = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("__n").cast("double")).alias("pr"))
        .localCheckpoint()
    )
    fold = lambda pairs, field: F.aggregate(  # noqa: E731
        F.transform(F.array_sort(pairs), lambda s: s[field]),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                "src",
                F.expr(f"src div {block}").alias("blk"),
                (F.col("pr") / F.col("outdeg").cast("double")).alias("c"),
            )
        )
        l1 = contrib.groupBy("node", "blk").agg(
            fold(F.collect_list(F.struct("src", "c")), "c").alias("s1")
        )
        summed = l1.groupBy("node").agg(
            fold(F.collect_list(F.struct("blk", "s1")), "s1").alias("s")
        )
        pr = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert, Kumara 2007 —
    public): community detection, the third canonical graph operator
    next to connected components (connectivity) and PageRank
    (centrality). Each node starts with its own id as label; each round
    every node adopts the MOST FREQUENT label among its neighbors.

    Determinism (the textbook algorithm is run-order dependent; this
    formulation is not): updates are fully synchronous (round i+1 sees
    only round-i labels) and ties break total-ordered (count desc,
    label asc) — integer counts, no RNG, no partition dependence, so
    the DuckDB twin reproduces every round exactly.

    Scale: the edge list is symmetrized once; each round is ONE
    edges⋈labels equi-join on dst, a (node,label) count aggregate, and
    an argmax window partitioned by node (high-cardinality key — no
    task collapse). Labels localCheckpoint per round, the same
    linear-lineage device as pagerank. Shuffles carry (node,label)
    pairs only — never adjacency lists.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(iters):
        neigh = und.join(labels, und.dst == labels.node).select(
            und.src.alias("node"), "label"
        )
        counts = neigh.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels
