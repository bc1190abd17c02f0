"""vectordb_from_scratch_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of Ricoledan/vectordb-from-scratch.

The reference (/root/reference, Rust) is a single-node in-memory vector
database: dense f32 vectors, three distance metrics, brute-force + HNSW
k-NN, string metadata filters, WAL/snapshot persistence. This package
re-expresses that surface — and the LLM-data-pipeline operators a 100 TB
training corpus needs (dedup, similarity search, text analysis) — as
idiomatic Spark DataFrame plans: declarative, Catalyst-optimized,
shuffle-aware, no row-at-a-time Python in the hot path.

Layout:
  functions/  column-builder kernels (vector math, text, hashing)
  operators/  composite DataFrame operators (knn, filters, dedup, crud, ann)
  sources/    table loaders for the driver-generated parquet star schema
  plans/      relational/analytic query plans (TPC-H-style)
  streaming/  Structured Streaming slices (insert-log fold)
"""

__version__ = "0.1.0"
