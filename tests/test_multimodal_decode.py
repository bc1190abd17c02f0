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


def test_jpeg_eoi_sos_before_sof_returns_none():
    """Advisor r5: EOI/SOS carry no segment length — a JPEG whose
    marker stream hits either before any SOF must cleanly return None
    rather than walking entropy data by garbage 'lengths'."""
    soi = b"\xff\xd8"
    # SOS straight after SOI (no SOF yet) + entropy-looking bytes
    assert mm.parse_image_header(soi + b"\xff\xda" + b"\x12\x34" * 8) is None
    # EOI immediately — an empty-but-marker-valid stream
    assert mm.parse_image_header(soi + b"\xff\xd9" + b"\x00" * 8) is None


def test_bmp_core_header_rejected():
    """A 12-byte BITMAPCOREHEADER stores u16 dims at different offsets;
    trusting BITMAPINFOHEADER offsets would misread them (advisor r5)."""
    core = (
        b"BM" + struct.pack("<IHHI", 26 + 64, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 8, 8, 1, 24)  # BITMAPCOREHEADER
        + b"\x00" * 64
    )
    assert mm.parse_image_header(core) is None
    # the V4 header (108 bytes) keeps the first 40 bytes compatible
    v4 = (
        b"BM" + struct.pack("<IHHI", 122 + 4, 0, 0, 122)
        + struct.pack("<IiiHHIIiiII", 108, 2, 1, 1, 32, 3, 8, 2835, 2835, 0, 0)
        + b"\x00" * (68 + 4)
    )
    got = mm.parse_image_header(v4)
    assert got == {"width": 2, "height": 1, "channels": 4, "codec": "bmp"}


# ---------------------------------------------------------------------------
# Real PNG pixel decode (stdlib zlib) — round 6
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w,h,ch", [(1, 1, 1), (5, 7, 3), (16, 3, 4), (8, 10, 2)])
def test_png_pixel_roundtrip_all_filters(w, h, ch):
    """encode_png cycles filter types per scanline (row % 5), so any
    h >= 5 exercises every unfilter branch on the decode side."""
    px = bytes((r * 7 + c * 13 + k * 97) % 256 for r in range(h) for c in range(w) for k in range(ch))
    dec = mm.decode_png_pixels(mm.encode_png(px, w, h, ch))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)
    assert dec["pixels"] == px


@pytest.mark.parametrize("w,h,ch", [
    (1, 1, 1), (7, 9, 3), (3, 13, 2), (13, 3, 4), (16, 16, 1), (33, 21, 3),
])
def test_png_adam7_interlaced_roundtrip(w, h, ch):
    """Adam7 interlaced PNGs (r10): seven-pass layout, filters applied
    within each pass, EMPTY passes omitted per spec §8.2 (the 1×1 and
    narrow shapes hit them); decode must be the identity layout
    transform — PNG is lossless."""
    px = bytes((r * 7 + c * 13 + k * 97) % 256
               for r in range(h) for c in range(w) for k in range(ch))
    for fc in (True, False):
        dec = mm.decode_png_pixels(
            mm.encode_png(px, w, h, ch, filter_cycle=fc, interlace=True)
        )
        assert dec is not None
        assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)
        assert dec["pixels"] == px


@pytest.mark.parametrize("w,h,ch,il", [
    (5, 7, 1, False), (9, 4, 3, False), (3, 3, 4, True), (16, 16, 2, True),
])
def test_png_16bit_high_byte_reduction(w, h, ch, il):
    """16-bit PNGs (r10): filters unapply byte-wise at the 2·ch
    distance per spec §9, then each big-endian sample reduces to its
    HIGH byte (v >> 8 — the standard 16→8 presentation, deterministic),
    composing with Adam7. 16-bit palette stays rejected (spec-invalid)."""
    import numpy as np

    v16 = np.random.default_rng(31).integers(
        0, 65536, size=(h, w, ch), dtype=np.uint16
    )
    png = mm.encode_png(v16.astype(">u2").tobytes(), w, h, ch,
                        bit_depth=16, interlace=il)
    dec = mm.decode_png_pixels(png)
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)
    assert dec["pixels"] == (v16 >> 8).astype(np.uint8).tobytes()


def test_png_unfilter_paeth_hand_computed():
    """Fixed byte vector decoded against hand-worked Paeth math —
    independent of the encoder, so a consistent-but-wrong predictor
    cannot cancel out through the round-trip."""

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))

    # 2x2 grayscale: row0 filter 0 → [10, 20]; row1 filter 4 (Paeth),
    # filtered bytes [5, 250]:
    #   i=0: left=0 up=10 ul=0 → p=10, pa=10 pb=0 pc=10 → pred=up=10 → 15
    #   i=1: left=15 up=20 ul=10 → p=25, pa=10 pb=5 pc=15 → pred=up=20 → (250+20)&255=14
    raw = b"\x00\x0a\x14" + b"\x04\x05\xfa"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dec = mm.decode_png_pixels(png)
    assert dec is not None and dec["pixels"] == bytes([10, 20, 15, 14])


def test_png_palette_expansion():
    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = b"\x00\x00\x01" + b"\x00\x02\x02"  # 2x2, indices [[0,1],[2,2]]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dec = mm.decode_png_pixels(png)
    assert dec is not None and dec["channels"] == 3
    assert dec["pixels"] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255])
    # palette index beyond PLTE → rejected, not garbage
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(b"\x00\x09"))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pixels(bad) is None


def test_png_pixel_decode_rejects_unsupported_profiles():
    base = bytes((r + c) % 256 for r in range(4) for c in range(4) for _ in range(3))
    good = mm.encode_png(base, 4, 4, 3)
    assert mm.decode_png_pixels(good) is not None
    # a 16-bit HEADER over 8-bit-sized scanlines is malformed (stream
    # length mismatch), not a supported profile — None, never garbage
    png16_malformed = make_png(4, 4, color_type=2, bit_depth=16)
    assert mm.decode_png_pixels(png16_malformed) is None
    # truncated IDAT (inflate fails)
    cut = good[: len(good) - 20]
    assert mm.decode_png_pixels(cut) is None
    # non-PNG
    assert mm.decode_png_pixels(b"BM" + b"\x00" * 60) is None
    # invalid filter byte inside a VALID zlib stream → None, never a
    # raise (the r10 unfilter-helper refactor briefly moved the
    # never-raises decorator onto the helper; this pins the contract)
    def _chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    bad_filter = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x05\x00"))
        + _chunk(b"IEND", b"")
    )
    assert mm.decode_png_pixels(bad_filter) is None


def test_png_pixel_stats_sparkside(spark):
    px1 = bytes(range(16))  # 4x4 gray: sum 120, min 0, max 15
    px2 = bytes([10, 200] * 6)  # 2x3 gray+alpha: ch0 all 10, ch1 all 200
    rows = [
        (1, mm.encode_png(px1, 4, 4, 1)),
        (2, mm.encode_png(px2, 2, 3, 2)),
        (3, b"not a png"),  # rejected → contributes no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {(r["doc_id"], r["channel"]): r for r in mm.png_pixel_stats(df).collect()}
    assert set(got) == {(1, 0), (2, 0), (2, 1)}
    assert got[(1, 0)]["px_sum"] == 120 and got[(1, 0)]["px_max"] == 15
    assert got[(1, 0)]["n_pixels"] == 16 and got[(1, 0)]["px_mean"] == 7.5
    assert got[(2, 0)]["px_sum"] == 60 and got[(2, 1)]["px_sum"] == 1200
    assert got[(2, 1)]["px_min"] == 200 and got[(2, 1)]["px_max"] == 200


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — real lossless decode, both bit depths
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit_stereo():
    # interleaved stereo: L = f*3 - 100, R = -f*2 + 5
    frames = 25
    samples = []
    for f in range(frames):
        samples += [f * 3 - 100, -f * 2 + 5]
    payload = mm.encode_wav(samples, 16000, 2, bits=16)
    hdr = mm.parse_wav_header(payload)
    assert hdr == {
        "codec": "pcm", "sample_rate": 16000, "channels": 2, "bits": 16,
        "n_frames": frames, "duration_ms": round(frames * 1000 / 16000),
    }
    dec = mm.decode_wav_samples(payload)
    assert dec["samples"].shape == (frames, 2)
    assert [int(v) for v in dec["samples"][:, 0]] == [f * 3 - 100 for f in range(frames)]
    assert [int(v) for v in dec["samples"][:, 1]] == [-f * 2 + 5 for f in range(frames)]


def test_wav_roundtrip_8bit_mono():
    vals = [(-128 + 7 * i) % 256 - 128 for i in range(40)]
    vals = [v if -128 <= v <= 127 else v - 256 for v in vals]
    payload = mm.encode_wav(vals, 8000, 1, bits=8)
    hdr = mm.parse_wav_header(payload)
    assert hdr["bits"] == 8 and hdr["n_frames"] == 40
    dec = mm.decode_wav_samples(payload)
    assert [int(v) for v in dec["samples"][:, 0]] == vals


def test_wav_roundtrip_24bit_stereo():
    # full 24-bit dynamic range, both extremes included
    vals = [-(1 << 23), (1 << 23) - 1] + [
        ((f * 131071 + 7) % (1 << 24)) - (1 << 23) for f in range(58)
    ]
    payload = mm.encode_wav(vals, 44100, 2, bits=24)
    hdr = mm.parse_wav_header(payload)
    assert hdr["codec"] == "pcm" and hdr["bits"] == 24
    assert hdr["n_frames"] == 30 and hdr["channels"] == 2
    dec = mm.decode_wav_samples(payload)
    assert dec["samples"].shape == (30, 2)
    assert [int(v) for v in dec["samples"].reshape(-1)] == vals


def _ima_ref_decode(pred, idx, nibs):
    """Independent scalar IMA/DVI decoder (straight from the public
    spec's pseudo-code) — the known-answer twin of the vectorized
    numpy state machine in decode_wav_samples."""
    st, it = mm._IMA_STEP_TABLE, mm._IMA_INDEX_TABLE
    out = [pred]
    for n in nibs:
        step = st[idx]
        diff = (step >> 3)
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + it[n & 7]))
        out.append(pred)
    return out


def test_wav_ima_adpcm_matches_scalar_reference():
    import numpy as np

    rng = np.random.default_rng(17)
    for nch in (1, 2):
        for nblocks in (1, 3):
            nwords = 4
            blocks, expect = [], [[] for _ in range(nch)]
            for _ in range(nblocks):
                preds = [int(rng.integers(-32768, 32768)) for _ in range(nch)]
                idxs = [int(rng.integers(0, 89)) for _ in range(nch)]
                nibs = [
                    [int(x) for x in rng.integers(0, 16, nwords * 8)]
                    for _ in range(nch)
                ]
                blocks.append({"pred": preds, "idx": idxs, "nibbles": nibs})
                for c in range(nch):
                    expect[c].extend(_ima_ref_decode(preds[c], idxs[c], nibs[c]))
            payload = mm.encode_wav_ima_adpcm(blocks, 8000, nch)
            hdr = mm.parse_wav_header(payload)
            assert hdr["codec"] == "ima_adpcm"
            assert hdr["samples_per_block"] == 1 + nwords * 8
            assert hdr["n_frames"] == nblocks * (1 + nwords * 8)
            dec = mm.decode_wav_samples(payload)
            assert dec["samples"].shape == (hdr["n_frames"], nch)
            for c in range(nch):
                assert dec["samples"][:, c].tolist() == expect[c]


def test_wav_ima_adpcm_clamps_saturate():
    # all-positive max-magnitude nibbles from the top predictor/step
    # saturate at +32767; all-negative at -32768 — pins both clamps.
    up = {"pred": [32000], "idx": [88], "nibbles": [[7] * 16]}
    down = {"pred": [-32000], "idx": [88], "nibbles": [[15] * 16]}
    for blk, bound in ((up, 32767), (down, -32768)):
        dec = mm.decode_wav_samples(mm.encode_wav_ima_adpcm([blk], 8000, 1))
        assert int(dec["samples"][-1, 0]) == bound


def test_wav_g711_tables_match_audioop():
    # CPython's audioop is an INDEPENDENT implementation of the same
    # ITU G.711 expand — the 256-entry tables must agree byte-for-byte
    audioop = pytest.importorskip("audioop")
    import numpy as np

    codes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert (np.array(mm._G711_ULAW_TABLE) == ref_u).all()
    assert (np.array(mm._G711_ALAW_TABLE) == ref_a).all()


def test_wav_g711_roundtrip_both_laws():
    import numpy as np

    codes = list(range(256)) * 2  # every code value, stereo interleave
    for law, table in (("ulaw", mm._G711_ULAW_TABLE),
                       ("alaw", mm._G711_ALAW_TABLE)):
        payload = mm.encode_wav_g711(codes, 8000, 2, law=law)
        hdr = mm.parse_wav_header(payload)
        assert hdr["codec"] == law and hdr["n_frames"] == 256
        dec = mm.decode_wav_samples(payload)
        exp = np.asarray(table)[np.array(codes)]
        assert (dec["samples"].reshape(-1) == exp).all()


def test_wav_resample_stats_all_codecs(spark):
    # one payload per supported codec through the normalize stage; the
    # expected stats replay decode -> floor-mean downmix -> (t*n)//m
    # nearest resample manually from decode_wav_samples' own output
    import numpy as np

    payloads = {
        0: mm.encode_wav([((f * 17 + ch * 59) % 65536) - 32768
                          for f in range(40) for ch in range(2)],
                         8000, 2, bits=16),
        1: mm.encode_wav([((f * 8191) % 16777216) - 8388608
                          for f in range(30)], 44100, 1, bits=24),
        2: mm.encode_wav_g711([(f * 13 + ch * 29) % 256
                               for f in range(50) for ch in range(2)],
                              8000, 2, law="ulaw"),
        3: mm.encode_wav_ima_adpcm(
            [{"pred": [1000], "idx": [30],
              "nibbles": [[(p * 11) % 16 for p in range(24)]]}],
            16000, 1),
        4: b"not audio at all",  # dropped, no row
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in
           mm.wav_resample_stats(df, target_rate=16000).collect()}
    assert set(got) == {0, 1, 2, 3}
    for i in (0, 1, 2, 3):
        dec = mm.decode_wav_samples(payloads[i])
        arr = dec["samples"].astype(np.int64)
        n, nch = arr.shape
        mono = np.floor_divide(arr.sum(axis=1), nch)
        m = max(1, (n * 16000) // dec["sample_rate"])
        out = mono[(np.arange(m) * n) // m]
        r = got[i]
        assert r["src_codec"] == dec["codec"] and r["n_out"] == m
        assert r["amp_sum"] == int(out.sum())
        assert (r["amp_min"], r["amp_max"]) == (int(out.min()), int(out.max()))


def test_wav_vad_segments_islands_and_edges(spark):
    # hand-built envelopes: known island structure, including an active
    # run that touches the final frame, an all-silent payload (no rows),
    # and a trailing partial frame that must be dropped
    loud, quiet = [100] * 10, [0] * 10
    payloads = {
        # frames: L L q L -> segments (0,1) and (3,3)
        0: mm.encode_wav(loud + loud + quiet + loud, 8000, 1, bits=16),
        # all silent -> no rows
        1: mm.encode_wav(quiet * 3, 8000, 1, bits=16),
        # 25 samples = 2 frames + dropped tail; q L -> segment (1,1)
        2: mm.encode_wav(quiet + loud + [100] * 5, 8000, 1, bits=16),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    rows = mm.wav_vad_segments(df, frame_len=10, threshold=1).collect()
    got = sorted((r.doc_id, r.seg_idx, r.start_frame, r.end_frame,
                  r.n_frames, r.energy_sum) for r in rows)
    e = 10 * 100 * 100  # energy of one loud frame
    assert got == [
        (0, 0, 0, 1, 2, 2 * e),
        (0, 1, 3, 3, 1, e),
        (2, 0, 1, 1, 1, e),
    ]


def _dhash_raster(fam=0, w=13, h=11):
    import numpy as np

    rr, cc = np.ogrid[0:h, 0:w]
    p = ((fam * 37 + rr * 11 + cc * 17) % 250).astype(np.int64)
    return np.broadcast_to(p, (h, w)).copy()


def test_image_dhash_container_invariant(spark):
    # the SAME raster through BMP and PNG must hash identically — the
    # dispatch layer cannot leak container details into the fingerprint
    import numpy as np

    p = _dhash_raster()
    h, w = p.shape
    px = np.stack([p, p + 3, p + 6], axis=2).astype(np.uint8)
    bmp = mm.encode_bmp(px.tobytes(), w, h)
    png = mm.encode_png(px.tobytes(), w, h, 3)
    df = spark.createDataFrame(
        [(0, bytearray(bmp)), (1, bytearray(png)),
         (2, b"junk, not an image")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.dh0, r.dh1) for r in mm.image_dhash(df).collect()}
    assert set(got) == {0, 1}  # junk row dropped
    assert got[0] == got[1]
    assert 0 <= got[0][0] < (1 << 32) and 0 <= got[0][1] < (1 << 32)


def test_image_neardup_banded_equals_bruteforce(spark):
    # pigeonhole blocking must find EXACTLY the pairs an exhaustive
    # all-pairs scan finds at radius <= 3
    import itertools

    import numpy as np

    rng = np.random.default_rng(41)
    payloads = []
    for i in range(24):
        p = _dhash_raster(fam=i // 4)
        h, w = p.shape
        # perturb a random pixel so some pairs drift past the radius
        p[rng.integers(0, h), rng.integers(0, w)] = rng.integers(0, 250)
        px = np.stack([p, p + 3, p + 6], axis=2).astype(np.uint8)
        payloads.append((i, bytearray(mm.encode_bmp(px.tobytes(), w, h))))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    hashes = {r.doc_id: (r.dh0, r.dh1)
              for r in mm.image_dhash(df).collect()}
    brute = set()
    for a, b in itertools.combinations(sorted(hashes), 2):
        ham = (bin(hashes[a][0] ^ hashes[b][0]).count("1")
               + bin(hashes[a][1] ^ hashes[b][1]).count("1"))
        if ham <= 3:
            brute.add((a, b, ham))
    banded = {(r.id_a, r.id_b, r.hamming)
              for r in mm.image_neardup_pairs(df, max_hamming=3).collect()}
    assert banded == brute and brute  # non-trivial: families collide


def test_image_neardup_bucket_cap_drops_crowded_chunks(spark):
    # identical images put ALL ids into one bucket per chunk; with
    # max_bucket below the corpus size every chunk is over-crowded, so
    # candidate generation finds nothing (the documented recall trade),
    # while the uncapped run finds every pair
    import numpy as np

    p = _dhash_raster()
    h, w = p.shape
    px = np.stack([p, p + 3, p + 6], axis=2).astype(np.uint8)
    payload = bytearray(mm.encode_bmp(px.tobytes(), w, h))
    df = spark.createDataFrame(
        [(i, payload) for i in range(6)], "doc_id long, payload binary"
    )
    uncapped = mm.image_neardup_pairs(df, max_hamming=3).collect()
    assert len(uncapped) == 15  # C(6,2), all hamming 0
    capped = mm.image_neardup_pairs(df, max_hamming=3, max_bucket=5).collect()
    assert capped == []


def test_image_neardup_radius_cap(spark):
    df = spark.createDataFrame([(0, b"x")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="pigeonhole"):
        mm.image_neardup_pairs(df, max_hamming=4)


def test_audio_fingerprint_loudness_and_codec_invariant(spark):
    # the envelope hash must survive (a) uniform gain and (b) the same
    # recording stored at a different bit depth; junk and too-short
    # payloads drop
    import numpy as np

    rng = np.random.default_rng(43)
    base = rng.integers(-800, 800, 400).tolist()
    payloads = [
        (0, mm.encode_wav(base, 16000, 1, bits=16)),
        (1, mm.encode_wav([v * 3 for v in base], 16000, 1, bits=16)),
        (2, mm.encode_wav([v * 3 for v in base], 16000, 1, bits=24)),
        (3, mm.encode_wav(base[:60], 16000, 1, bits=16)),  # < 65 samples
        (4, b"not audio"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.dh0, r.dh1)
           for r in mm.audio_fingerprint(df).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == got[1] == got[2]


def test_audio_neardup_banded_equals_bruteforce(spark):
    import itertools

    import numpy as np

    rng = np.random.default_rng(47)
    payloads = []
    for i in range(24):
        fam = i // 4
        f_rng = np.random.default_rng(100 + fam)
        sig = f_rng.integers(-500, 500, 300)
        # per-variant local perturbation so some pairs drift
        j = rng.integers(0, 300)
        sig = sig.copy()
        sig[j] = rng.integers(-500, 500)
        payloads.append(
            (i, bytearray(mm.encode_wav(sig.tolist(), 16000, 1, bits=16)))
        )
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    hashes = {r.doc_id: (r.dh0, r.dh1)
              for r in mm.audio_fingerprint(df).collect()}
    brute = set()
    for a, b in itertools.combinations(sorted(hashes), 2):
        ham = (bin(hashes[a][0] ^ hashes[b][0]).count("1")
               + bin(hashes[a][1] ^ hashes[b][1]).count("1"))
        if ham <= 3:
            brute.add((a, b, ham))
    banded = {(r.id_a, r.id_b, r.hamming)
              for r in mm.audio_neardup_pairs(df, max_hamming=3).collect()}
    assert banded == brute and brute


def test_wav_ima_adpcm_rejects_bad_geometry():
    good = mm.encode_wav_ima_adpcm(
        [{"pred": [0], "idx": [0], "nibbles": [[1] * 8]}], 8000, 1
    )
    assert mm.parse_wav_header(good)["codec"] == "ima_adpcm"
    # truncated final block → out of profile
    assert mm.parse_wav_header(good[:-3]) is None
    # samples_per_block inconsistent with block_align → None
    bad = bytearray(good)
    off = good.index(b"fmt ") + 8 + 18
    bad[off:off + 2] = struct.pack("<H", 17)  # spb 9 → 17
    assert mm.parse_wav_header(bytes(bad)) is None


def test_wav_rejects_out_of_profile():
    good = mm.encode_wav([0, 1, 2, 3], 8000, 1, bits=16)
    assert mm.parse_wav_header(b"not a riff") is None
    assert mm.parse_wav_header(good[:20]) is None          # truncated
    # non-PCM format code (3 = IEEE float) is out of profile
    float_fmt = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    float_fmt[fmt_off:fmt_off + 2] = struct.pack("<H", 3)
    assert mm.parse_wav_header(bytes(float_fmt)) is None
    # PNG bytes are not audio
    assert mm.parse_wav_header(make_png(4, 4)) is None


def test_wav_stats_matches_analytic(spark):
    from pyspark.sql import functions as F

    rows = [(i,) for i in range(0, 30, 5)]
    d = spark.createDataFrame(rows, "doc_id long")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                samples = [((i * 131 + f * 17) % 65536) - 32768 for f in range(10)]
                payloads.append(mm.encode_wav(samples, 8000, 1, bits=16))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    out = mm.wav_audio_stats(
        d.mapInPandas(synth, schema="doc_id long, payload binary")
    ).collect()
    assert len(out) == 6
    for r in out:
        i = r.doc_id
        vals = [((i * 131 + f * 17) % 65536) - 32768 for f in range(10)]
        assert r.amp_sum == sum(vals)
        assert r.amp_min == min(vals) and r.amp_max == max(vals)
        assert r.sq_sum == sum(v * v for v in vals)
        assert r.n_frames == 10 and r.sample_rate == 8000


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, grayscale) — real codec, layered exactness
# ---------------------------------------------------------------------------


def test_jpeg_flat_blocks_roundtrip_bit_exact():
    # DC quant = 8 makes flat 8x8 blocks round-trip with zero loss
    w, h = 24, 16
    px = bytes((3 + (y // 8) * 50 + (x // 8) * 91) % 256 for y in range(h) for x in range(w))
    payload = mm.encode_jpeg_gray(px, w, h)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dec = mm.decode_jpeg_gray(payload)
    assert dec["width"] == w and dec["height"] == h and dec["channels"] == 1
    assert dec["pixels"] == px


def test_jpeg_entropy_layer_is_lossless_on_arbitrary_images():
    """encode -> decode_jpeg_coefficients must reproduce the encoder's
    quantize-dequantize output bit-for-bit: huffman + bitstream +
    stuffing are lossless; only quantization may lose information."""
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(19, 13), dtype=np.uint8)
    payload = mm.encode_jpeg_gray(img.tobytes(), 13, 19)
    co = mm.decode_jpeg_coefficients(payload)
    assert co is not None and (co["width"], co["height"]) == (13, 19)
    c = mm._dct_matrix()
    q = np.array(mm._JPG_QTABLE, dtype=np.float64)[
        np.argsort(mm._JPG_ZIGZAG)
    ].reshape(8, 8)
    pad = np.pad(img, ((0, 5), (0, 3)), mode="edge")
    for (by, bx), blk in co["blocks"].items():
        src = pad[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
        expect = np.rint((c @ src @ c.T) / q) * q
        assert np.array_equal(blk, expect), f"block {(by, bx)}"


def test_jpeg_decode_error_is_quantization_bounded():
    import numpy as np

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    dec = mm.decode_jpeg_gray(mm.encode_jpeg_gray(img.tobytes(), 16, 16))
    arr = np.frombuffer(dec["pixels"], dtype=np.uint8).astype(int).reshape(16, 16)
    # worst-case spatial error is bounded by sum of per-coefficient
    # quant errors; with steps (8, 16*63) a generous envelope is 64
    assert np.abs(arr - img.astype(int)).max() <= 64


def test_jpeg_rejects_out_of_profile():
    px = bytes(64)
    good = mm.encode_jpeg_gray(px, 8, 8)
    assert mm.decode_jpeg_gray(b"\xff\xd8\xff\xd9") is None        # no frame
    assert mm.decode_jpeg_gray(good[:30]) is None                  # truncated
    assert mm.decode_jpeg_gray(make_png(4, 4)) is None             # not JPEG
    # progressive SOF2 is out of profile
    prog = bytearray(good)
    sof = good.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert mm.decode_jpeg_gray(bytes(prog)) is None
    # 0xFF bytes inside entropy data must be stuffed and decodable:
    # a gradient image exercises many magnitudes/codes
    grad = bytes((x * 16 + y) % 256 for y in range(16) for x in range(16))
    assert mm.decode_jpeg_gray(mm.encode_jpeg_gray(grad, 16, 16)) is not None


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn layout (what real camera files use): byte-aligned restart
    markers every N MCUs with DC-predictor resets must decode to the
    same exact pixels as the marker-free stream."""
    w, h = 40, 24  # 5x3 = 15 MCUs
    px = bytes((9 + (y // 8) * 71 + (x // 8) * 37) % 256 for y in range(h) for x in range(w))
    plain = mm.encode_jpeg_gray(px, w, h)
    with_rst = mm.encode_jpeg_gray(px, w, h, restart_interval=4)
    assert with_rst != plain and b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + n]) in with_rst for n in range(8))
    dec = mm.decode_jpeg_gray(with_rst)
    assert dec is not None and dec["pixels"] == px
    assert mm.decode_jpeg_gray(plain)["pixels"] == px


def test_jpeg_color_flat_blocks_roundtrip_bit_exact():
    """Gray-valued (R=G=B) flat blocks survive the full color pipeline
    bit-exactly: YCbCr forward rounds to (v, 128, 128), chroma box-mean
    and DC-quant-8 are lossless on flat data, and the inverse transform
    returns exactly v on all three channels — at 4:4:4 AND 4:2:0."""
    w, h = 32, 16

    def val(y, x):
        return (10 + (y // 16) * 77 + (x // 16) * 33) % 256

    rgb = bytes(v for y in range(h) for x in range(w) for v in (val(y, x),) * 3)
    for sampling in [(1, 1), (2, 2)]:
        p = mm.encode_jpeg(rgb, w, h, channels=3, sampling=sampling)
        dec = mm.decode_jpeg_pixels(p)
        assert dec["channels"] == 3 and (dec["width"], dec["height"]) == (w, h)
        assert dec["pixels"] == rgb, f"sampling {sampling}"


def test_jpeg_color_smooth_image_bounded_error():
    """On chroma-smooth content (constant color cast over a luma
    gradient) 4:2:0 subsampling loses little: decoded error stays within
    a quantization-scale envelope."""
    import numpy as np

    w = h = 32
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            base = 60 + 3 * x + 2 * y
            img[y, x] = (min(base, 255), min(base + 20, 255), min(base + 40, 255))
    p = mm.encode_jpeg(img.tobytes(), w, h, channels=3, sampling=(2, 2))
    dec = mm.decode_jpeg_pixels(p)
    arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(arr - img.astype(int)).max() <= 48


def test_jpeg_color_sampling_and_restart_variants_decode():
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    for sampling in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        for ri in (0, 2):
            p = mm.encode_jpeg(img.tobytes(), 40, 24, channels=3,
                               sampling=sampling, restart_interval=ri)
            dec = mm.decode_jpeg_pixels(p)
            assert dec is not None and dec["channels"] == 3, (sampling, ri)
            assert (dec["width"], dec["height"]) == (40, 24)


# ---------------------------------------------------------------------------
# GIF — real LZW decode (lossless), interlace, table-growth streams
# ---------------------------------------------------------------------------

_PAL8 = [((17 * i) % 256, (31 * i) % 256, (53 * i) % 256) for i in range(8)]


def _expand(idx, pal):
    out = bytearray()
    for k in idx:
        out += bytes(pal[k])
    return bytes(out)


def test_gif_roundtrip_exact():
    w, h = 13, 9
    idx = bytes((3 + y * 5 + x * 7) % 8 for y in range(h) for x in range(w))
    dec = mm.decode_gif_pixels(mm.encode_gif(idx, w, h, _PAL8))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    assert dec["pixels"] == _expand(idx, _PAL8)


def _real_lzw_gif(idx: bytes, w: int, h: int, pal) -> bytes:
    """A GIF whose image data is REAL LZW (growing dictionary, widening
    codes, KwKwK case) — what actual encoders emit, unlike encode_gif's
    clear-heavy degenerate stream."""
    import struct as st

    n = max(2, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a") + st.pack("<HH", w, h)
    out.append(0x80 | (n - 1)); out += bytes([0, 0])
    for i in range(1 << n):
        out += bytes(pal[i] if i < len(pal) else (0, 0, 0))
    out += b"\x2c" + st.pack("<HHHH", 0, 0, w, h) + b"\x00"
    clear, end = 1 << n, (1 << n) + 1
    codes, width_bits = [clear], n + 1
    table = {bytes([i]): i for i in range(1 << n)}
    next_code = end + 1
    widths = []
    cur = b""
    for ch in bytes(idx):
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        codes.append(table[cur]); widths.append(width_bits)
        table[nxt] = next_code
        if next_code == (1 << width_bits) and width_bits < 12:
            width_bits += 1
        next_code += 1
        cur = bytes([ch])
    codes.append(table[cur]); widths.append(width_bits)
    codes.append(end); widths.append(width_bits)
    acc = nbits = 0
    data = bytearray()
    allw = [n + 1] + widths  # clear code goes out at the initial width
    for code, wb in zip(codes, allw):
        acc |= code << nbits; nbits += wb
        while nbits >= 8:
            data.append(acc & 0xFF); acc >>= 8; nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out.append(n)
    for i in range(0, len(data), 255):
        out.append(len(data[i:i + 255])); out += data[i:i + 255]
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decodes_real_lzw_streams():
    # repetitive data drives dictionary growth + width escalation + KwKwK
    w, h = 32, 16
    idx = bytes(((x // 3) + (y // 2)) % 6 for y in range(h) for x in range(w))
    dec = mm.decode_gif_pixels(_real_lzw_gif(idx, w, h, _PAL8))
    assert dec is not None and dec["pixels"] == _expand(idx, _PAL8)
    # degenerate all-same-index stream is the strongest KwKwK exercise
    idx2 = bytes([5]) * (w * h)
    dec2 = mm.decode_gif_pixels(_real_lzw_gif(idx2, w, h, _PAL8))
    assert dec2 is not None and dec2["pixels"] == _expand(idx2, _PAL8)


def test_gif_interlaced_rows_restored():
    w, h = 8, 11
    idx = bytes((y * 3 + x) % 8 for y in range(h) for x in range(w))
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    shuffled = b"".join(idx[r * w:(r + 1) * w] for r in order)
    g = bytearray(mm.encode_gif(shuffled, w, h, _PAL8))
    flags_off = 6 + 7 + 3 * 8 + 9  # header + LSD + GCT + descriptor flags
    assert g[flags_off - 9] == 0x2C
    g[flags_off] |= 0x40  # mark interlaced
    dec = mm.decode_gif_pixels(bytes(g))
    assert dec is not None and dec["pixels"] == _expand(idx, _PAL8)


def test_gif_extensions_skipped_and_rejects():
    w, h = 4, 4
    idx = bytes(range(8)) * 2
    g = mm.encode_gif(idx, w, h, _PAL8)
    # splice a graphic-control extension between LSD+GCT and the image
    cut = 6 + 7 + 3 * 8
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert mm.decode_gif_pixels(g[:cut] + ext + g[cut:])["pixels"] == _expand(idx, _PAL8)
    assert mm.decode_gif_pixels(g[:25]) is None
    assert mm.decode_gif_pixels(b"GIF89a" + bytes(7) + b"\x3b") is None


# ---------------------------------------------------------------------------
# BMP — raw layout transform (lossless): BGR/bottom-up/padding, palette
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact_with_padding():
    w, h = 5, 3  # odd width -> 1-byte row padding
    rgb = bytes((7 * i) % 256 for i in range(w * h * 3))
    dec = mm.decode_bmp_pixels(mm.encode_bmp(rgb, w, h))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    assert dec["pixels"] == rgb


def test_bmp_topdown_and_palette():
    import struct as st

    # top-down 24-bit: negative height, rows in natural order
    w, h = 2, 2
    rgb = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    p = bytearray(mm.encode_bmp(rgb, w, h))
    p[22:26] = st.pack("<i", -h)
    stride = (3 * w + 3) & ~3
    body = p[54:]
    flipped = b"".join(
        bytes(body[r * stride:(r + 1) * stride]) for r in range(h - 1, -1, -1)
    )
    assert mm.decode_bmp_pixels(bytes(p[:54]) + flipped)["pixels"] == rgb

    # 8-bit palette BMP built by hand
    pal = [(k * 11 % 256, k * 29 % 256, k * 47 % 256) for k in range(4)]
    idx = [0, 1, 2, 3]
    w8 = h8 = 2
    stride8 = (w8 + 3) & ~3
    pal_bytes = b"".join(bytes([b_, g, r, 0]) for (r, g, b_) in pal)
    rows = b""
    for rr in range(h8 - 1, -1, -1):
        rows += bytes([idx[rr * w8], idx[rr * w8 + 1]]) + bytes(stride8 - w8)
    off = 54 + len(pal_bytes)
    hdr = st.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off) + st.pack(
        "<IiiHHIIiiII", 40, w8, h8, 1, 8, 0, len(rows), 2835, 2835, 4, 0
    )
    dec = mm.decode_bmp_pixels(hdr + pal_bytes + rows)
    expect = b"".join(bytes(pal[k]) for k in idx)
    assert dec["pixels"] == expect


def test_bmp_rejects_out_of_profile():
    import struct as st

    good = bytearray(mm.encode_bmp(bytes(12), 2, 2))
    rle = bytearray(good)
    rle[30:34] = st.pack("<I", 1)  # BI_RLE8
    assert mm.decode_bmp_pixels(bytes(rle)) is None
    bpp16 = bytearray(good)
    bpp16[28:30] = st.pack("<H", 16)
    assert mm.decode_bmp_pixels(bytes(bpp16)) is None
    assert mm.decode_bmp_pixels(bytes(good[:40])) is None


# ---------------------------------------------------------------------------
# AVI-MJPEG — real video decode (container walk + per-frame JPEG)
# ---------------------------------------------------------------------------


def test_avi_mjpeg_frames_roundtrip_bit_exact():
    w, h = 16, 8

    def frame_px(f):
        return bytes((f * 40 + 10 + (x // 8) * 90) % 256
                     for y in range(h) for x in range(w))

    frames = [mm.encode_jpeg_gray(frame_px(f), w, h) for f in range(3)]
    dec = mm.decode_avi_frames(mm.encode_avi_mjpeg(frames, w, h))
    assert (dec["width"], dec["height"], dec["channels"], dec["n_frames"]) == (w, h, 1, 3)
    for f in range(3):
        assert dec["frames"][f] == frame_px(f)


def test_avi_color_frames_and_sampling_cap():
    w = h = 16
    cf = [
        mm.encode_jpeg(bytes(v for _ in range(w * h) for v in ((f * 30 + 50) % 256,) * 3),
                       w, h, channels=3, sampling=(2, 2))
        for f in range(4)
    ]
    avi = mm.encode_avi_mjpeg(cf, w, h)
    dec = mm.decode_avi_frames(avi)
    assert dec["channels"] == 3 and dec["n_frames"] == 4
    assert mm.decode_avi_frames(avi, max_frames=2)["n_frames"] == 2
    # first frame is flat gray 50 -> exact on all channels
    assert dec["frames"][0] == bytes([50]) * (w * h * 3)


def test_avi_rejects_non_mjpeg_and_malformed():
    w = h = 8
    good = mm.encode_avi_mjpeg([mm.encode_jpeg_gray(bytes(64), w, h)], w, h)
    assert mm.decode_avi_frames(good[:40]) is None
    assert mm.decode_avi_frames(mm.encode_wav([0, 1], 8000, 1)) is None
    # frame chunks that are not JPEGs (a foreign codec) -> no frames -> None
    bogus = mm.encode_avi_mjpeg([b"\x00" * 50], w, h)
    assert mm.decode_avi_frames(bogus) is None


def _patch_sof_sampling(payload: bytes, hv_per_comp: list[int]) -> bytes:
    """Rewrite the SOF0 per-component sampling bytes of a baseline JPEG
    (test fixture: lets us declare sampling the stdlib encoder never
    emits, exactly how a foreign encoder's file would arrive)."""
    b = bytearray(payload)
    i = b.find(b"\xff\xc0")
    assert i >= 0
    ncomp = b[i + 9]
    assert ncomp == len(hv_per_comp)
    for k, hv in enumerate(hv_per_comp):
        b[i + 10 + 3 * k + 1] = hv
    return bytes(b)


def test_jpeg_single_component_scan_ignores_declared_sampling():
    """T.81 A.2: a one-component scan is non-interleaved — blocks are in
    raster order and the declared sampling factors do not shape the
    layout. A grayscale file declaring 2x2 must decode to the SAME
    pixels as its 1x1 twin (VERDICT r6 advice: pre-fix, blocks landed in
    MCU-tile order — silently misordered pixels)."""
    import numpy as np

    rng = np.random.default_rng(7)
    w, h = 32, 16  # 2 would-be MCUs wide: tile order != raster order
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    plain = mm.encode_jpeg_gray(img.tobytes(), w, h)
    declared22 = _patch_sof_sampling(plain, [0x22])
    d_plain = mm.decode_jpeg_pixels(plain)
    d_22 = mm.decode_jpeg_pixels(declared22)
    assert d_plain is not None and d_22 is not None
    assert d_22["pixels"] == d_plain["pixels"]
    assert (d_22["width"], d_22["height"]) == (w, h)
    # and the coefficient view agrees with itself across the two files
    c_plain = mm.decode_jpeg_coefficients(plain)
    c_22 = mm.decode_jpeg_coefficients(declared22)
    for key in c_plain["blocks"]:
        assert (c_plain["blocks"][key] == c_22["blocks"][key]).all()


def test_jpeg_non_divisible_sampling_is_out_of_profile():
    """VERDICT r6 advice: spec-legal but non-divisible sampling (luma
    3x3 + chroma 2x2) must return None (out of profile), never raise —
    pre-fix the replication upsample produced undersized planes and an
    uncaught ValueError that killed the whole Spark stats task."""
    import numpy as np

    rng = np.random.default_rng(11)
    w, h = 24, 24
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    good = mm.encode_jpeg(rgb.tobytes(), w, h, channels=3, sampling=(1, 1))
    bad = _patch_sof_sampling(good, [0x33, 0x22, 0x22])
    assert mm.decode_jpeg_pixels(bad) is None  # no exception
    assert mm._jpg_parse_stream(bad) is None  # rejected at parse, not decode


def test_stats_kernels_survive_adversarial_payloads(spark):
    """One malformed payload in a corpus must drop its own row, never
    kill the stats query: mix a good JPEG with garbage that clears the
    magic-byte check and a non-divisible-sampling file."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = mm.encode_jpeg_gray(img.tobytes(), 16, 16)
    truncated = good[: len(good) // 2]
    bad_sampling = _patch_sof_sampling(
        mm.encode_jpeg(
            rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8).tobytes(),
            24, 24, channels=3, sampling=(1, 1),
        ),
        [0x33, 0x22, 0x22],
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(truncated)),
         (3, bytearray(bad_sampling))],
        "doc_id long, payload binary",
    )
    rows = mm.jpeg_pixel_stats(df).collect()
    assert {r.doc_id for r in rows} == {1}  # bad payloads skipped, job alive


# ---------------------------------------------------------------------------
# resize_nearest + bmp_resize_stats (round 8): the normalize-to-grid stage
# ---------------------------------------------------------------------------


def test_resize_nearest_identity_and_mapping():
    import numpy as np

    src = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    # identity: same grid back, byte-for-byte
    assert mm.resize_nearest(src.tobytes(), 4, 2, 3, 4, 2) == src.tobytes()
    # 2x upscale: floor mapping replicates each source pixel into a 2x2 block
    up = np.frombuffer(
        mm.resize_nearest(src.tobytes(), 4, 2, 3, 8, 4), dtype=np.uint8
    ).reshape(4, 8, 3)
    for y in range(4):
        for x in range(8):
            assert (up[y, x] == src[y // 2, x // 2]).all()
    # downscale 4->2 wide: picks src columns floor(0*4/2)=0, floor(1*4/2)=2
    down = np.frombuffer(
        mm.resize_nearest(src.tobytes(), 4, 2, 3, 2, 2), dtype=np.uint8
    ).reshape(2, 2, 3)
    assert (down[:, 0] == src[:, 0]).all() and (down[:, 1] == src[:, 2]).all()
    with pytest.raises(ValueError, match="positive"):
        mm.resize_nearest(src.tobytes(), 4, 2, 3, 0, 2)


def test_bmp_resize_stats_exact_and_robust(spark):
    """Resize stats match a hand-computed gather, and a malformed payload
    drops its row without killing the task."""
    import numpy as np

    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    good = mm.encode_bmp(rgb.tobytes(), 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"BM garbage"))],
        "doc_id long, payload binary",
    )
    rows = mm.bmp_resize_stats(df, out_w=2, out_h=2).collect()
    assert {r.doc_id for r in rows} == {1}
    ry = (np.arange(2) * 3) // 2
    rx = (np.arange(2) * 4) // 2
    want = rgb[ry][:, rx]
    by_ch = {r.channel: r for r in rows}
    for ch in range(3):
        plane = want[:, :, ch].astype(int)
        r = by_ch[ch]
        assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
        assert r.px_sum == plane.sum()
        assert (r.px_min, r.px_max) == (plane.min(), plane.max())


def test_wav_zcr_known_values(spark):
    """Hand-checkable crossings: alternating-sign PCM crosses every
    transition (zcr 1.0); a constant-positive tone never crosses; a
    truncated payload drops its row."""
    alt = [(-1000 if f % 2 else 1000) for f in range(10)]
    flat = [500] * 10
    good_alt = mm.encode_wav(alt, 8000, 1, bits=16)
    good_flat = mm.encode_wav(flat, 8000, 1, bits=16)
    df = spark.createDataFrame(
        [(1, bytearray(good_alt)), (2, bytearray(good_flat)),
         (3, bytearray(good_alt[:10]))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mm.wav_zcr_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_crossings == 9 and got[1].zcr == 1.0
    assert got[2].n_crossings == 0 and got[2].zcr == 0.0


def test_wav_zcr_zero_is_nonnegative_bucket(spark):
    """The crossing predicate buckets 0 with positives: +5,0,-5 crosses
    once (at 0 → -5), not twice."""
    pcm = [5, 0, -5, -5]
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_wav(pcm, 8000, 1, bits=16)))],
        "doc_id long, payload binary",
    )
    r = mm.wav_zcr_stats(df).collect()[0]
    assert r.n_crossings == 1


def test_avi_rawdib_lossless_roundtrip_and_mixed_codecs():
    """Uncompressed BI_RGB AVI frames (r10): strf-routed raw-DIB decode
    is a pure layout transform — arbitrary pixels round-trip losslessly
    per frame; the MJPEG path is untouched; a payload whose strf
    declares a codec we don't decode yields None (the ffmpeg ladder)."""
    import numpy as np

    rng = np.random.default_rng(23)
    w, h, nf = 7, 9, 3
    frames = [rng.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
              for _ in range(nf)]
    dec = mm.decode_avi_frames(mm.encode_avi_rawdib(frames, w, h))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"], dec["n_frames"]) == (w, h, 3, nf)
    assert dec["frames"] == frames
    # max_frames sampling still caps work
    dec1 = mm.decode_avi_frames(mm.encode_avi_rawdib(frames, w, h), max_frames=1)
    assert dec1["n_frames"] == 1 and dec1["frames"][0] == frames[0]
    # an H.264-style fourcc with non-JPEG non-raw frames → None
    avi = bytearray(mm.encode_avi_rawdib(frames, w, h))
    i = bytes(avi).find(struct.pack("<I", 0), 0)  # not robust; patch strf comp directly
    # locate strf body: find b"strf" then compression at offset 8+4+16
    j = bytes(avi).find(b"strf")
    comp_off = j + 8 + 16
    avi[comp_off : comp_off + 4] = b"H264"
    assert mm.decode_avi_frames(bytes(avi)) is None


def test_avi_rawdib_feeds_stats_and_resize(spark):
    """avi_frame_stats and media_resize_stats route raw-DIB video
    through the same seams as MJPEG (decode_avi_frames is the shared
    iterator)."""
    import numpy as np

    rng = np.random.default_rng(29)
    w, h = 8, 6
    frames = [rng.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
              for _ in range(2)]
    avi = mm.encode_avi_rawdib(frames, w, h)
    df = spark.createDataFrame([(1, avi)], "doc_id long, payload binary")
    rows = mm.avi_frame_stats(df).collect()
    assert len(rows) == 2 * 3  # 2 frames × 3 channels
    arr = np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(2, h, w, 3)
    got = {(r["frame_idx"], r["channel"]): r["px_sum"] for r in rows}
    for f in range(2):
        for ch in range(3):
            assert got[(f, ch)] == int(arr[f, :, :, ch].astype(np.int64).sum())
    out = mm.media_resize_stats(df, out_w=4, out_h=3).collect()
    assert {r["fmt"] for r in out} == {"avi"}
    assert all(r["n_pixels"] == 4 * 3 * 2 for r in out)


def test_png_palette_trns_expands_to_rgba():
    """Transparent palette (tRNS): per-entry alpha must be carried into
    an RGBA expansion — the r10 decoder silently dropped it (VERDICT
    r10 #2). Entries beyond the tRNS length default to opaque 255."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    trns = bytes([0, 128])  # red fully transparent, green half; blue opaque
    png = mm.encode_png_palette(bytes([0, 1, 2, 2]), 2, 2, plte, trns)
    dec = mm.decode_png_pixels(png)
    assert dec is not None and dec["channels"] == 4
    assert dec["pixels"] == bytes(
        [255, 0, 0, 0, 0, 255, 0, 128, 0, 0, 255, 255, 0, 0, 255, 255]
    )
    # without tRNS the same palette still expands to plain RGB
    dec3 = mm.decode_png_pixels(mm.encode_png_palette(bytes([0, 1, 2, 2]), 2, 2, plte))
    assert dec3 is not None and dec3["channels"] == 3
    # tRNS longer than the palette is malformed → None, never garbage
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"tRNS", bytes(4))  # 4 alphas for a 3-entry palette
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pixels(bad) is None


def test_png_color_key_trns_routes_to_ladder():
    """Gray/truecolor color-key transparency (tRNS on types 0/2) is out
    of the native profile: decoding while ignoring the key would drop
    the transparency silently — must return None (ladder → NULL row)."""
    import struct as st
    import zlib as zl

    def chunk(tag, data):
        return (st.pack(">I", len(data)) + tag + data
                + st.pack(">I", zl.crc32(tag + data)))

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"tRNS", st.pack(">H", 7))
        + chunk(b"IDAT", zl.compress(b"\x00\x07"))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pixels(png) is None


def test_jpeg_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any marker may be preceded by a run of 0xFF fill
    bytes. Both marker walks and the progressive entropy-boundary scan
    must skip the run, not classify its first byte as a marker start
    (ADVICE r10 — valid externally-produced files decoded to None)."""
    w = h = 16
    px = bytes((7 * x + 13 * y) % 256 for y in range(h) for x in range(w))

    for pay in (mm.encode_jpeg_gray(px, w, h),
                mm.encode_jpeg_progressive(px, w, h)):
        want = mm.decode_jpeg_pixels(pay)
        assert want is not None
        # fill before EOI (inside the entropy-boundary scan's window)
        assert pay[-2:] == b"\xff\xd9"
        filled = pay[:-2] + b"\xff\xff\xff" + pay[-2:]
        got = mm.decode_jpeg_pixels(filled)
        assert got is not None and got["pixels"] == want["pixels"]
        # fill before the first SOS (inside the header marker walk)
        sos = pay.find(b"\xff\xda")
        assert sos > 0
        filled2 = pay[:sos] + b"\xff\xff" + pay[sos:]
        got2 = mm.decode_jpeg_pixels(filled2)
        assert got2 is not None and got2["pixels"] == want["pixels"]


def test_jpeg_progressive_fill_bytes_between_scans():
    """Fill bytes between two progressive scans: the boundary scan sees
    FF FF ... FF DA and must hand the walk the LAST 0xFF of the run."""
    w = h = 16
    px = bytes((x * y) % 256 for y in range(h) for x in range(w))
    pay = mm.encode_jpeg_progressive(px, w, h)
    want = mm.decode_jpeg_pixels(pay)
    # insert fill before EVERY subsequent SOS marker (walk backwards so
    # earlier offsets stay valid)
    positions = []
    p = pay.find(b"\xff\xda", 2)
    while p != -1:
        positions.append(p)
        p = pay.find(b"\xff\xda", p + 2)
    assert len(positions) >= 2  # the default scan script is multi-scan
    filled = pay
    for p in reversed(positions[1:]):
        filled = filled[:p] + b"\xff" + filled[p:]
    got = mm.decode_jpeg_pixels(filled)
    assert got is not None and got["pixels"] == want["pixels"]


def test_avi_audio_stream_first_still_finds_video_geometry():
    """A multi-stream AVI whose audio strl precedes the video strl: the
    strf walk must pair each strf with its preceding strh fccType and
    only read a 'vids' strf as BITMAPINFOHEADER — the r10 walk took the
    FIRST strf and parsed WAVEFORMATEX bytes as geometry (ADVICE r10)."""
    w, h, fps = 4, 2, 10

    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0x10, 1, 0, 2, 0,
                       w, h, 0, 0, 0, 0)
    strh_a = b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0, 0, 0, 0, 0)
    # WAVEFORMATEX + 4 cb bytes = 22 bytes ≥ 20, so the old walk WOULD
    # have parsed these bytes as BITMAPINFOHEADER geometry
    strf_a = struct.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 4) + b"\x00" * 4
    strh_v = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, 1, 0, 0, 0, 0)
    strf_v = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                         struct.pack("<I", 0), w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
               + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v)))
    # one bottom-up BGR DIB frame: rows bottom-to-top, BGR order
    rgb = [(10 * i, 20 * i % 256, 30 * i % 256) for i in range(w * h)]
    padded = (w * 3 + 3) & ~3
    dib = bytearray()
    for y in reversed(range(h)):
        for x in range(w):
            r, g, b_ = rgb[y * w + x]
            dib += bytes((b_, g, r))
        dib += b"\x00" * (padded - w * 3)
    movi = lst(b"movi", chunk(b"01db", bytes(dib)))
    avi = chunk(b"RIFF", b"AVI " + hdrl + movi)

    dec = mm.decode_avi_frames(avi)
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"], dec["n_frames"]) == (w, h, 3, 1)
    want = bytes(v for px_ in rgb for v in px_)
    assert dec["frames"][0] == want
