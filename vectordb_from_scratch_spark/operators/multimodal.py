"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Python stages.

The reference has no multimodal surface; this is north-star pipeline
infrastructure (BASELINE.json). The decode step itself is STUBBED —
image/audio libraries are not in this container — but the Spark-side
plumbing is real and tested: schema (binary payload + struct metadata),
mapInPandas batch iteration (Arrow transfer, zero row-at-a-time Python),
and deterministic feature extraction on the raw bytes.

At scale: payloads ride in parquet binary columns; the Python stage is a
narrow map (no shuffle), parallel per input split; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory holds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["payload_features", "decode_image_stub"]

FEATURE_SCHEMA = "doc_id long, n_bytes long, payload_md5 string"


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real image decode (PIL/libvips not installed).
    A production build swaps this for actual decode → (width, height,
    channels, pixel features). Raises to make the stub explicit."""
    raise NotImplementedError("image decode requires PIL/libvips — not in this container")


def payload_features(payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic per-payload features via mapInPandas: byte length and
    md5 digest of the raw bytes. This is the exact plumbing a real decoder
    uses (iterator of Arrow batches in, feature frame out) with the codec
    swapped for hashlib so it is testable and oracle-comparable."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": raw.map(len).astype("int64"),
                    "payload_md5": raw.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return payloads.mapInPandas(extract, schema=FEATURE_SCHEMA)
