"""Image header parsing (operators/multimodal.py): REAL container bytes
— fully valid files built with stdlib only — through the pure-Python
magic-byte parser and the decode ladder."""

from __future__ import annotations

import struct
import zlib

import pytest

from vectordb_from_scratch_spark.operators import multimodal as mm


def make_png(w: int, h: int, color_type: int = 2, bit_depth: int = 8) -> bytes:
    """A complete, spec-valid PNG (real CRCs, real zlib IDAT)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (w * channels) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(w: int, h: int) -> bytes:
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + b"\xf7\x00\x00"
        + b"\x00" * 768  # global color table
        + b"\x3b"  # trailer
    )


def make_bmp(w: int, h: int, bpp: int = 24) -> bytes:
    row = ((w * bpp // 8) + 3) & ~3
    size = 54 + row * h
    return (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, row * h, 2835, 2835, 0, 0)
        + b"\x00" * (row * h)
    )


def make_jpeg_header(w: int, h: int, components: int = 3) -> bytes:
    """SOI + APP0(JFIF) + DQT + SOF0 prefix — the header region a real
    camera JPEG opens with; dimensions live in the SOF0 frame header."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * components)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + bytes([components])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(components))
    )
    return b"\xff\xd8" + app0 + dqt + sof0


@pytest.mark.parametrize(
    "payload,want",
    [
        (make_png(320, 200, color_type=2), (320, 200, 3, "png")),
        (make_png(1, 1, color_type=0), (1, 1, 1, "png")),
        (make_png(64, 48, color_type=6), (64, 48, 4, "png")),
        (make_gif(640, 480), (640, 480, 3, "gif")),
        (make_bmp(100, 40), (100, 40, 3, "bmp")),
        (make_jpeg_header(1920, 1080), (1920, 1080, 3, "jpeg")),
        (make_jpeg_header(8, 8, components=1), (8, 8, 1, "jpeg")),
    ],
)
def test_parse_real_container_bytes(payload, want):
    got = mm.parse_image_header(payload)
    assert got is not None
    assert (got["width"], got["height"], got["channels"], got["codec"]) == want


@pytest.mark.parametrize(
    "payload",
    [b"", b"not an image at all", b"\x89PNG\r\n\x1a\x00garbage" + b"\x00" * 40,
     b"\xff\xd8\x00\x00", b"BM" + b"\x00" * 10],
)
def test_parse_rejects_non_images(payload):
    assert mm.parse_image_header(payload) is None


def test_decode_image_ladder_header_fallback():
    """Without PIL the ladder lands on the header parse for recognized
    containers and raises NotImplementedError otherwise (the documented
    stub contract is now the LAST rung, not the only one)."""
    meta = mm.decode_image(make_png(12, 34, color_type=4))
    assert (meta["width"], meta["height"], meta["channels"]) == (12, 34, 2)
    if not mm.HAS_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"opaque non-image payload")


def test_decode_metadata_header_mode_sparkside(spark):
    rows = [(1, make_png(320, 200)), (2, make_gif(16, 8)), (3, b"junkjunkjunk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in mm.decode_metadata(df, decoder="header").collect()
    }
    assert got[1]["media"]["width"] == 320 and got[1]["media"]["codec"] == "png"
    assert got[2]["media"]["height"] == 8 and got[2]["media"]["codec"] == "gif"
    assert got[3]["media"] is None  # unrecognized → NULL struct, row kept
    assert got[3]["n_bytes"] == 12


def test_decode_metadata_auto_mode_sparkside(spark):
    rows = [(1, make_jpeg_header(640, 480)), (2, b"\x00\x01\x02")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.decode_metadata(df, decoder="auto").collect()}
    assert got[1]["media"]["codec"] in ("jpeg",)  # PIL absent → header rung
    assert got[2]["media"] is None
