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
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # optional dependency: real pixel decode when the library exists
    from PIL import Image as _PILImage  # noqa: N812
except ImportError:  # pragma: no cover — container has no PIL
    _PILImage = None

HAS_PIL = _PILImage is not None

__all__ = [
    "payload_features",
    "decode_image_stub",
    "fake_decode",
    "parse_image_header",
    "decode_image",
    "decode_metadata",
    "sample_frames",
    "HAS_PIL",
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


# channels implied by the PNG color type byte (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers that carry frame dimensions (every SOF except
# DHT/DAC/JPG at 0xC4/0xC8/0xCC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(payload: bytes) -> dict | None:
    """REAL image metadata from magic bytes — pure Python, no imaging
    library: PNG (IHDR), JPEG (SOFn frame header), GIF (logical screen
    descriptor), BMP (BITMAPINFOHEADER). Returns {width, height,
    channels, codec} or None when the payload is not a recognized
    image container. Reads headers only — it never decodes pixels and
    never validates checksums, so cost is O(header) per payload
    regardless of image size (the right trade for a 100-TB metadata
    sweep; pixel work belongs to the decode stage proper)."""
    b = bytes(payload)
    if len(b) >= 33 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        bit_depth, color_type = b[24], b[25]
        if bit_depth == 0 or color_type not in _PNG_CHANNELS:
            return None
        return {"width": w, "height": h,
                "channels": _PNG_CHANNELS[color_type], "codec": "png"}
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None  # marker desync — not a parseable JPEG
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 10 > len(b):  # need through the component-count byte
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return {"width": w, "height": h,
                        "channels": b[i + 9], "codec": "jpeg"}
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    if len(b) >= 13 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        # GIF pixels are palette indices into an RGB color table
        return {"width": w, "height": h, "channels": 3, "codec": "gif"}
    if len(b) >= 30 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        if bpp == 0:
            return None
        return {"width": abs(w), "height": abs(h),
                "channels": max(1, bpp // 8), "codec": "bmp"}
    return None


def decode_image(payload: bytes) -> dict:
    """Best-available image decode ladder: PIL when installed (full
    pixel decode → exact metadata), else the pure-Python header parse
    (real metadata, no pixels), else NotImplementedError for payloads
    no path recognizes. Same output shape on every path."""
    if HAS_PIL:  # pragma: no cover — container has no PIL
        import io

        with _PILImage.open(io.BytesIO(bytes(payload))) as im:
            return {
                "width": im.width, "height": im.height,
                "channels": len(im.getbands()),
                "codec": (im.format or "unknown").lower(),
            }
    meta = parse_image_header(payload)
    if meta is None:
        raise NotImplementedError(
            "payload is not a recognized image container and no imaging "
            "library is installed — full decode requires PIL/libvips"
        )
    return meta


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


def decode_metadata(
    payloads: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Binary payload → typed media-metadata struct via mapInPandas.

    decoder selects the per-payload function:
    - "fake": digest-derived deterministic metadata (the oracle-stable
      plumbing exerciser — works on ANY bytes);
    - "header": `parse_image_header` — REAL metadata from PNG/JPEG/GIF/
      BMP magic bytes, NULL media struct for unrecognized payloads;
    - "auto": full decode ladder (`decode_image`: PIL if installed,
      else header parse), NULL media for payloads no path recognizes.

    Everything around the call — Arrow batch iteration, struct-typed
    output schema, narrow no-shuffle plan — is the production shape on
    every path.
    """
    if decoder == "fake":
        fn = fake_decode
    elif decoder == "header":
        fn = parse_image_header
    elif decoder == "auto":
        def fn(b):  # NotImplementedError → NULL media, row preserved
            try:
                return decode_image(b)
            except NotImplementedError:
                return None
    else:
        raise ValueError(f"decoder must be fake|header|auto, got {decoder!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(fn)
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
