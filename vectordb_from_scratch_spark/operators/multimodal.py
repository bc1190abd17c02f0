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

__all__ = [
    "payload_features",
    "decode_image_stub",
    "fake_decode",
    "decode_metadata",
    "sample_frames",
]

FEATURE_SCHEMA = "doc_id long, n_bytes long, payload_md5 string"
DECODE_SCHEMA = (
    "doc_id long, media struct<width:int, height:int, channels:int, codec:string>, "
    "n_bytes long"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, frame_bytes long"


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real image decode (PIL/libvips not installed).
    A production build swaps this for actual decode → (width, height,
    channels, pixel features). Raises to make the stub explicit."""
    raise NotImplementedError("image decode requires PIL/libvips — not in this container")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives plausible media metadata
    from the payload digest. Same call signature and output shape a real
    decoder would have, so the Spark plumbing around it is fully real."""
    d = hashlib.md5(bytes(payload)).digest()
    return {
        "width": 16 * (1 + d[0] % 64),      # 16..1024, multiple of 16
        "height": 16 * (1 + d[1] % 64),
        "channels": 1 + d[2] % 4,
        "codec": ["jpeg", "png", "webp", "raw"][d[3] % 4],
    }


def decode_metadata(payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Binary payload → typed media-metadata struct via mapInPandas.

    The decode call is isolated in `fake_decode` (swap for PIL/libvips in
    production); everything else — Arrow batch iteration, struct-typed
    output schema, narrow no-shuffle plan — is the production shape.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(lambda b: fake_decode(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": metas,
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return payloads.mapInPandas(decode, schema=DECODE_SCHEMA)


def sample_frames(
    payloads: DataFrame, every_n_bytes: int = 64, max_frames: int = 4,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one input payload → up to `max_frames`
    output rows (a 1:N mapInPandas expansion, the video frame-extraction
    shape). "Frames" are deterministic byte windows; a real build replaces
    the windowing with a codec's keyframe iterator."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for _, row in pdf.iterrows():
                raw = bytes(row[payload_col])
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(row[id_col])
                    idxs.append(i)
                    md5s.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s, "frame_bytes": sizes}
            )

    return payloads.mapInPandas(sample, schema=FRAME_SCHEMA)


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
