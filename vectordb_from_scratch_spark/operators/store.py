"""VectorStore facade — API-level parity with the reference's
``VectorStore`` (src/storage.rs:81-327): insert/insert_batch (upsert),
delete, get/get_metadata, list_ids, len, search, search_with_filter,
search_batch — re-expressed over an immutable DataFrame snapshot.

This is deliberately a THIN facade: every method compiles to the
set-oriented operators in this package (crud/knn/filters), so "state" is
just the current folded DataFrame and mutation returns a NEW store —
the DataFrame-native translation of the reference's &mut self methods.
Dimension is enforced on first insert exactly like the reference
(dimension inferred then checked, src/storage.rs:93-94, 145-154).

Scale: the facade adds nothing to the plans — a 100 TB deployment calls
the operators directly on partitioned tables; this class exists for
API-parity tests and small interactive use.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectormath as vm
from . import crud, knn
from .filters import compile_filter

STORE_SCHEMA = "id string, embedding array<double>, metadata map<string,string>"


class DimensionMismatch(ValueError):
    """Insert/query vector dimension differs from the store's
    (reference src/error.rs:11-12)."""


class VectorNotFound(KeyError):
    """Delete of an absent id (reference src/storage.rs:177-179)."""


@dataclass(frozen=True)
class VectorStore:
    spark: SparkSession
    df: DataFrame
    dimension: Optional[int] = None
    metric: str = "euclidean"
    # approximate-index mode: SRP-LSH params (nbits, n_tables, seed,
    # multiprobe) — the facade analog of the reference's generic
    # VectorStore<I: Index> instantiated with HnswIndex (its production
    # server serves the ANN index, src/server/mod.rs:39). None = exact
    # FlatIndex behavior.
    ann_params: Optional[dict] = None

    # -- construction -------------------------------------------------------

    @classmethod
    def empty(cls, spark: SparkSession, metric: str = "euclidean") -> "VectorStore":
        return cls(spark, spark.createDataFrame([], STORE_SCHEMA), None, metric)

    def with_ann(
        self,
        nbits: int = 4,
        n_tables: int = 2,
        seed: int = 42,
        multiprobe: bool | int = 1,
    ) -> "VectorStore":
        """Switch the store's search path to the SRP-LSH approximate
        index (the HnswIndex-server parity mode): every search/filtered
        search routes through bucket probe -> exact re-rank instead of
        the full scan. May return fewer than k rows for sparse buckets —
        the same recall/latency trade the reference's ANN serve path
        makes; multiprobe widens the beam (ef analog)."""
        return replace(
            self,
            ann_params=dict(
                kind="srp",
                nbits=nbits, n_tables=n_tables, seed=seed, multiprobe=multiprobe,
            ),
        )

    def with_ivf_sq8(
        self,
        n_lists: int = 8,
        n_probe: int = 4,
        rerank: int = 30,
        seed: int = 42,
    ) -> "VectorStore":
        """Switch the store's search path to the QUANTIZED IVF-SQ8 index:
        KMeans coarse routing reads n_probe lists of int8 codes
        (asymmetric distance, zero decode materialization), then the
        rerank-deep shortlist exact-re-ranks on raw vectors — the
        production quantized serving design (FAISS IVF-SQ, public),
        composed over the same facade the reference's VectorStore<Index>
        exposes. Euclidean only (the asymmetric kernel); filtered search
        composes by pre-filtering the corpus before the build — exactly
        min(k, matches) rows, no starvation. n_lists is clamped to the
        row count at search time so tiny stores stay valid."""
        if self.metric != "euclidean":
            raise ValueError("ivf_sq8 serving supports metric='euclidean' only")
        return replace(
            self,
            ann_params=dict(
                kind="ivf_sq8",
                n_lists=n_lists, n_probe=n_probe, rerank=rerank, seed=seed,
            ),
        )

    # -- writes (return a NEW store; reference mutates in place) ------------

    def _check_dim(self, items: list[tuple]) -> Optional[int]:
        dims = {len(v) for _, v, *_ in items}
        if self.dimension is not None:
            dims.add(self.dimension)
        if len(dims) > 1:
            raise DimensionMismatch(f"expected dim {min(dims)}, got {dims}")
        return next(iter(dims)) if dims else None

    def insert(self, id: str, vector: list[float], metadata: dict | None = None) -> "VectorStore":
        """Upsert one row (reference insert/insert_with_metadata,
        src/storage.rs:130-172 — existing id replaced)."""
        return self.insert_batch([(id, vector, metadata or {})])

    def insert_batch(self, items: list[tuple]) -> "VectorStore":
        """Batch upsert (reference insert_batch, src/storage.rs:293-298 —
        but atomic rather than stop-at-first-error; divergence noted in
        SURVEY §2.2 R9)."""
        items3 = [(i, list(map(float, v)), m or {}) for i, v, *rest in items
                  for m in [rest[0] if rest else {}]]
        # reference insert_batch is a HashMap insert loop — last write per
        # id wins within one batch (duplicates must not both survive)
        items3 = list({i: (i, v, m) for i, v, m in items3}.values())
        if not items3:
            return self
        dim = self._check_dim(items3)
        updates = self.spark.createDataFrame(items3, STORE_SCHEMA)
        return replace(self, df=crud.upsert(self.df, updates), dimension=dim)

    def delete(self, id: str) -> "VectorStore":
        """Delete one id; raises VectorNotFound if absent (reference
        src/storage.rs:175-192)."""
        if self.df.filter(F.col("id") == id).isEmpty():
            raise VectorNotFound(id)
        ids = self.spark.createDataFrame([(id,)], "id string")
        return replace(self, df=crud.delete_ids(self.df, ids))

    # -- reads --------------------------------------------------------------

    def get(self, id: str) -> Optional[list[float]]:
        row = self.df.filter(F.col("id") == id).select("embedding").first()
        return list(row.embedding) if row else None

    def get_metadata(self, id: str) -> Optional[dict]:
        row = self.df.filter(F.col("id") == id).select("metadata").first()
        return dict(row.metadata) if row else None

    def list_ids(self) -> list[str]:
        return [r.id for r in self.df.select("id").collect()]

    def __len__(self) -> int:
        return self.df.count()

    # -- search -------------------------------------------------------------

    def _query_df(self, queries: list[tuple]) -> DataFrame:
        if self.dimension is not None:
            bad = [q for q, _ in queries if len(q) != self.dimension]
            if bad:
                raise DimensionMismatch(
                    f"query dim {len(bad[0])} != store dim {self.dimension}"
                )
        rows = [(i, list(map(float, q)), int(k)) for i, (q, k) in enumerate(queries)]
        return self.spark.createDataFrame(
            rows, "query_id long, query_embedding array<double>, k int"
        )

    def search(self, query: list[float], k: int = 10) -> list[tuple[str, float]]:
        """Exact k-NN (reference src/storage.rs:217-245)."""
        return self.search_batch([(query, k)])[0]

    def search_batch(self, queries: list[tuple]) -> list[list[tuple[str, float]]]:
        """Batch search with per-query k (reference src/storage.rs:302-310)."""
        if not queries:
            return []
        kmax = max(k for _, k in queries)
        if kmax <= 0:
            return [[] for _ in queries]
        qdf = self._query_df(queries)
        kind = (self.ann_params or {}).get("kind")
        if kind == "ivf_sq8" and not self.df.isEmpty():
            from ..functions import vectormath as vm
            from . import ann

            params = {k_: v for k_, v in self.ann_params.items() if k_ != "kind"}
            n_lists = max(1, min(params["n_lists"], self.df.count()))
            centers, assigned = ann.build_ivf(
                self.df, n_lists=n_lists, id_col="id", vec_col="embedding",
                seed=params["seed"],
            )
            centers_df = self.spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
                "list_id int, cvec array<double>",
            )
            idx = ann.ivf_sq8_index(assigned, id_col="id", vec_col="embedding")
            res = ann.ann_knn_ivf_sq8(
                idx, centers_df, qdf.drop("k"), k=kmax,
                n_probe=params["n_probe"], rerank=params["rerank"],
                raw=assigned.select(
                    "id", vm.as_double("embedding").alias("vec")
                ),
            )
        elif kind == "srp" and self.dimension is not None:
            from . import ann

            params = {k_: v for k_, v in self.ann_params.items() if k_ != "kind"}
            res = ann.ann_knn_srp(
                self.df, qdf.drop("k"), k=kmax, metric=self.metric,
                dim=self.dimension, id_col="id", vec_col="embedding",
                **params,
            )
        else:
            res = knn.knn(
                self.df, qdf.drop("k"), k=kmax, metric=self.metric,
                id_col="id", vec_col="embedding",
            )
        res = (
            res.join(F.broadcast(qdf.select("query_id", "k")), "query_id")
            .filter(F.col("rank") <= F.col("k"))
            .orderBy("query_id", "rank")
            .collect()
        )
        out: list[list[tuple[str, float]]] = [[] for _ in queries]
        for r in res:
            out[r.query_id].append((r.id, r.distance))
        return out

    def search_with_filter(
        self, query: list[float], k: int, filter_spec: dict
    ) -> list[tuple[str, float]]:
        """Filtered k-NN (reference src/storage.rs:249-290) — PRE-filtered,
        so exactly min(k, matches) rows return (no 3k-over-fetch
        starvation; documented divergence)."""
        pred = compile_filter(filter_spec)
        filtered = replace(self, df=self.df.filter(pred))
        return filtered.search_batch([(query, k)])[0]

    def search_batch_with_filter(
        self, queries: list[tuple], filter_spec: dict
    ) -> list[list[tuple[str, float]]]:
        """Batch filtered k-NN, one filter shared by all queries
        (reference search_batch_with_filter, src/storage.rs:313-325) —
        pre-filtered like `search_with_filter`."""
        pred = compile_filter(filter_spec)
        filtered = replace(self, df=self.df.filter(pred))
        return filtered.search_batch(queries)
