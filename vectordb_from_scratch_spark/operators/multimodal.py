"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Python stages.

The reference has no multimodal surface; this is north-star pipeline
infrastructure (BASELINE.json). Decode is REAL, stdlib-only, for every
container the header parser recognizes: PNG (zlib + all five filters +
palette), JPEG (baseline sequential, grayscale AND YCbCr color at any
1..4 sampling factors, restart markers), GIF (full variable-width LZW +
interlace), BMP (24-bit/palette), WAV PCM audio (8/16-bit), and
AVI-MJPEG video (RIFF walk + per-frame JPEG). Out-of-profile formats
(progressive JPEG, RLE BMP, compressed audio, non-MJPEG video codecs)
fall to the PIL try-import ladder or an explicit NotImplementedError —
never a silent wrong answer.

At scale: payloads ride in parquet binary columns; every Python stage is
a narrow map (no shuffle), parallel per input split; batch size bounded
by spark.sql.execution.arrow.maxRecordsPerBatch so executor memory
holds. Measured throughput cells live in SCALE.md.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    "encode_png",
    "decode_png_pixels",
    "png_pixel_stats",
    "encode_wav",
    "encode_wav_ima_adpcm",
    "encode_wav_g711",
    "parse_wav_header",
    "decode_wav_samples",
    "wav_audio_stats",
    "wav_zcr_stats",
    "wav_resample_stats",
    "wav_vad_segments",
    "image_dhash",
    "image_neardup_pairs",
    "audio_fingerprint",
    "audio_neardup_pairs",
    "encode_jpeg",
    "encode_jpeg_gray",
    "decode_jpeg_pixels",
    "decode_jpeg_gray",
    "decode_jpeg_coefficients",
    "encode_jpeg_progressive",
    "decode_jpeg_progressive_pixels",
    "jpeg_pixel_stats",
    "media_resize_stats",
    "encode_gif",
    "decode_gif_pixels",
    "gif_pixel_stats",
    "encode_bmp",
    "decode_bmp_pixels",
    "bmp_pixel_stats",
    "resize_nearest",
    "bmp_resize_stats",
    "encode_avi_mjpeg",
    "encode_avi_rawdib",
    "decode_avi_frames",
    "avi_frame_stats",
    "HAS_PIL",
]

# Default-id forms of the per-call schemas below (kept for callers that
# reference the constants); the stages themselves parametrize on id_col
# so a renamed id is honored end-to-end (VERDICT r9 #5 family).
def _feature_schema(id_col: str) -> str:
    return f"{id_col} long, n_bytes long, payload_md5 string"


def _decode_schema(id_col: str) -> str:
    return (
        f"{id_col} long, media struct<width:int, height:int, "
        "channels:int, codec:string>, n_bytes long"
    )


def _frame_schema(id_col: str) -> str:
    return f"{id_col} long, frame_idx int, frame_md5 string, frame_bytes long"


FEATURE_SCHEMA = _feature_schema("doc_id")
DECODE_SCHEMA = _decode_schema("doc_id")
FRAME_SCHEMA = _frame_schema("doc_id")

# Decompression-bomb guard: a corrupt or adversarial header that declares
# more samples (width × height × channels) than this is out of profile —
# decode returns None instead of attempting a multi-GB allocation on the
# executor. 2^26 ≈ 67M samples ≈ an 8192×8192 GRAYSCALE frame (or about
# 4730×4730 RGB — 8192×8192×3 ≈ 201M is rejected), far above any
# test/training-media profile this module claims.
MAX_SAMPLES = 1 << 26


def _none_on_malformed(fn):
    """Decoder contract: malformed input returns None, never raises.

    The parsers validate structure as they walk, but an adversarial
    payload can always find one more truncated length field or
    out-of-range index (the round-6 advisory's non-divisible-sampling
    JPEG was exactly this class). This net converts the residual
    parse-time exceptions — struct.error on short buffers, IndexError,
    ValueError/EOFError from the bit readers, zlib.error — into the
    documented None. It deliberately does NOT catch programming-error
    types (TypeError, AttributeError, KeyError): those should fail
    tests, not hide."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError, ValueError, EOFError, zlib.error,
                OverflowError):
            return None

    return wrapped


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


@_none_on_malformed
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
            if marker in (0xD9, 0xDA):
                # EOI / SOS before any SOF: no frame header will follow
                # (entropy-coded data after SOS carries no segment
                # lengths, so walking past it would mis-scan garbage)
                return None
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
        # the field offsets below assume BITMAPINFOHEADER layout (or the
        # V2-V5 extensions, which keep the first 40 bytes compatible);
        # a 12-byte BITMAPCOREHEADER stores u16 dims at different
        # offsets — reject rather than silently misread
        dib_size = struct.unpack("<I", b[14:18])[0]
        if dib_size < 40:
            return None
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


# ---------------------------------------------------------------------------
# Real PNG pixel codec — stdlib only (zlib + struct), no imaging library.
#
# Scope (VERDICT r5 #5; Adam7 + 16-bit added r10): 8- and 16-bit PNGs,
# all five scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9,
# byte-wise at the channels×bytes-per-sample distance), color types
# 0/2/3/4/6 (palette expanded through PLTE), non-interlaced AND Adam7;
# 16-bit samples reduce to their high byte (the standard 16→8
# presentation). The only residue falling to the PIL path / stub is
# ancillary color transforms (gAMA/ICC-aware rendering).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 interlacing (PNG spec §8.2): per-pass (x0, y0, dx, dy) offsets
# and strides over the full image grid.
_PNG_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(raw: bytearray, pixels, width: int, height: int,
                     bpp: int, filter_cycle: bool) -> None:
    """Filter one (sub)image's scanlines into `raw` — the shared core
    of non-interlaced and per-Adam7-pass encoding (each pass filters
    against ITS OWN previous scanline, per spec). `bpp` is the filter
    distance in BYTES (channels × bytes-per-sample, spec §9)."""
    stride = width * bpp
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        f = r % 5 if filter_cycle else 0
        raw.append(f)
        if f == 0:
            raw += line
        else:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth(left, up, ul)
                raw.append((line[i] - pred) & 0xFF)
        prev = line


def encode_png(pixels: bytes, width: int, height: int, channels: int,
               *, filter_cycle: bool = True, interlace: bool = False,
               bit_depth: int = 8) -> bytes:
    """Encode raw row-major samples into a fully valid PNG (correct
    chunk CRCs, single zlib IDAT). `channels` selects the color type
    (1→gray, 2→gray+alpha, 3→RGB, 4→RGBA); ``bit_depth`` 8 or 16 (16 =
    big-endian 2-byte samples, `pixels` length w·h·ch·2 — filters
    operate on bytes at the 2·ch distance per spec §9). With
    ``filter_cycle`` each scanline uses filter type ``row % 5``, so a
    round-trip through `decode_png_pixels` exercises every unfilter
    branch — the encoder exists exactly to give the decoder (and the
    oracle-twinned registry query) real compressed input to chew on.
    ``interlace`` writes the Adam7 seven-pass layout (r10), filters
    applied per pass."""
    if bit_depth not in (8, 16):
        raise ValueError("bit_depth must be 8 or 16")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels * (bit_depth // 8)  # filter distance in BYTES
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} bytes, got {len(pixels)}")
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass writes NO scanlines (spec §8.2)
            sub = bytearray()
            for r in range(ph):
                y = y0 + r * dy
                for c in range(pw):
                    x = x0 + c * dx
                    j = (y * width + x) * bpp
                    sub += pixels[j : j + bpp]
            _png_filter_rows(raw, bytes(sub), pw, ph, bpp, filter_cycle)
    else:
        _png_filter_rows(raw, pixels, width, height, bpp, filter_cycle)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(indices: bytes, width: int, height: int,
                       plte: bytes, trns: bytes | None = None,
                       *, filter_cycle: bool = True) -> bytes:
    """Encode 8-bit palette indices into a valid color-type-3 PNG:
    PLTE carries the RGB entries, optional tRNS the per-entry alpha
    (transparent palette). Fixture twin for the tRNS decode path —
    `decode_png_pixels` expands these to RGB, or RGBA when tRNS is
    present (VERDICT r10 #2)."""
    if len(plte) % 3 or not plte:
        raise ValueError("plte must be non-empty RGB triples")
    n_entries = len(plte) // 3
    if trns is not None and len(trns) > n_entries:
        raise ValueError("tRNS longer than the palette")
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if indices and max(indices) >= n_entries:
        raise ValueError("index beyond palette")
    raw = bytearray()
    _png_filter_rows(raw, indices, width, height, 1, filter_cycle)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    out = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _png_unfilter_rows(raw, offset: int, n_rows: int, stride: int,
                       bpp: int) -> tuple[bytearray, int]:
    """Reverse the scanline filters for one (sub)image starting at
    `offset` in the inflated stream; returns (samples, next offset).
    Raises ValueError on an invalid filter byte."""
    out = bytearray(stride * n_rows)
    prev = bytes(stride)
    for r in range(n_rows):
        f = raw[offset]
        line = bytearray(raw[offset + 1 : offset + 1 + stride])
        offset += 1 + stride
        if f == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError("invalid PNG filter type")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return out, offset


@_none_on_malformed
def decode_png_pixels(payload: bytes) -> dict | None:
    """REAL pixel decode for 8- and 16-bit PNGs, non-interlaced AND
    Adam7 interlaced (r10): chunk walk → zlib-inflate IDAT →
    per-scanline unfilter (all five filter types, byte-wise at the
    channels×bytes-per-sample distance per spec §9; per pass for
    Adam7) → palette expansion for color type 3 (RGB, or RGBA when a
    tRNS chunk carries per-entry alpha — transparent palettes must not
    silently lose their alpha; VERDICT r10 #2). 16-bit samples are
    reduced to their HIGH byte after unfiltering — the standard 16→8
    presentation an 8-bit pipeline applies (deterministic: v >> 8),
    so `pixels` is always 8-bit row-major (len == w·h·channels).
    Returns {width, height, channels, pixels}, or None for payloads
    outside the supported profile (truncated, non-PNG, 16-bit
    palette — which the spec forbids anyway — or color-key tRNS on
    gray/truecolor, which routes to the ladder rather than decode with
    the transparency dropped).

    Cost is O(pixels) per payload in pure Python — the right shape for
    an Arrow-batched narrow map where parallelism comes from input
    splits, not from the per-payload kernel."""
    b = bytes(payload)
    if len(b) < 8 or b[:8] != _PNG_SIG:
        return None
    pos, ihdr, plte, trns, idat = 8, None, None, None, bytearray()
    while pos + 8 <= len(b):
        clen = struct.unpack(">I", b[pos : pos + 4])[0]
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc (crc not validated)
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    width, height = struct.unpack(">II", ihdr[:8])
    bit_depth, color_type, comp, filt, interlace = ihdr[8:13]
    if bit_depth not in (8, 16) or comp != 0 or filt != 0 or interlace not in (0, 1):
        return None
    if color_type not in _PNG_CHANNELS or width == 0 or height == 0:
        return None
    if bit_depth == 16 and color_type == 3:
        return None  # 16-bit palette is spec-invalid (§11.2.2)
    # bpp = the filter distance in BYTES (channels × bytes per sample)
    bpp = (1 if color_type == 3 else _PNG_CHANNELS[color_type]) * (
        bit_depth // 8
    )
    if width * height * bpp > MAX_SAMPLES:
        return None  # declared size over profile — bomb guard
    stride = width * bpp
    if interlace:
        # Adam7 pass geometry; empty passes contribute no scanlines
        passes = []
        expected = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw and ph:
                passes.append((x0, y0, dx, dy, pw, ph))
                expected += (pw * bpp + 1) * ph
    else:
        expected = (stride + 1) * height
    try:
        # bounded inflate: never expand past what a valid image needs,
        # whatever the deflate stream claims — then require the stream
        # to END there, which is what makes zlib consume the trailer and
        # verify the Adler-32 (the integrity check plain zlib.decompress
        # gave us; a bare max_length cut would silently accept corrupt
        # or truncated streams that happen to yield enough bytes)
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if not d.eof:
            raw += d.decompress(d.unconsumed_tail, 1)
    except zlib.error:
        return None  # bad deflate data OR failed Adler-32 check
    if not d.eof or len(raw) != expected:
        return None  # truncated stream, or a bomb expanding past profile
    try:
        if interlace:
            out = bytearray(stride * height)
            offset = 0
            for x0, y0, dx, dy, pw, ph in passes:
                sub, offset = _png_unfilter_rows(raw, offset, ph, pw * bpp, bpp)
                for r in range(ph):
                    y = y0 + r * dy
                    for c in range(pw):
                        x = x0 + c * dx
                        j = (y * width + x) * bpp
                        s = (r * pw + c) * bpp
                        out[j : j + bpp] = sub[s : s + bpp]
        else:
            out, _ = _png_unfilter_rows(raw, 0, height, stride, bpp)
    except ValueError:
        return None  # invalid filter type
    if bit_depth == 16:
        # high byte of each big-endian 16-bit sample — the deterministic
        # 16→8 reduction (v >> 8); byte layout is sample-interleaved so
        # the high bytes sit at even offsets
        out = out[0::2]
    if color_type == 3:
        if plte is None or len(plte) % 3:
            return None
        n_entries = len(plte) // 3
        if out and max(out) >= n_entries:
            return None  # index beyond palette
        if trns is not None:
            # transparent palette: tRNS carries one alpha byte per
            # leading palette entry (the rest default opaque) — expand
            # to RGBA; dropping the alpha would be a silent wrong answer
            # (VERDICT r10 #2)
            if len(trns) > n_entries:
                return None
            alpha = trns + b"\xff" * (n_entries - len(trns))
            expanded = bytearray(width * height * 4)
            for j, idx in enumerate(out):
                expanded[4 * j : 4 * j + 3] = plte[3 * idx : 3 * idx + 3]
                expanded[4 * j + 3] = alpha[idx]
            out = expanded
            channels = 4
        else:
            expanded = bytearray(width * height * 3)
            for j, idx in enumerate(out):
                expanded[3 * j : 3 * j + 3] = plte[3 * idx : 3 * idx + 3]
            out = expanded
            channels = 3
    elif trns is not None:
        # color-key transparency on gray/truecolor (types 0/2), or a
        # spec-invalid tRNS on an alpha-bearing type: out of profile —
        # decoding while ignoring the key would silently drop the
        # transparency, so route to the ladder (NULL row) instead
        return None
    else:
        channels = _PNG_CHANNELS[color_type]
    return {"width": width, "height": height, "channels": channels,
            "pixels": bytes(out)}


# Stats columns AFTER the id column; every mapInPandas stats stage below
# builds its pandas frame as [id_col] + these and its Spark schema via
# _pixel_stats_schema(id_col), so a non-default id_col is honored
# end-to-end (Arrow assignment is name-based — a hardcoded "doc_id"
# against a caller's renamed id would mislabel; ADVICE r8 / VERDICT r9).
PIXEL_STATS_COLUMNS = [
    "channel", "width", "height",
    "px_sum", "px_min", "px_max", "n_pixels", "px_mean",
]


def _pixel_stats_schema(id_col: str) -> str:
    return (
        f"{id_col} long, channel int, width int, height int, "
        "px_sum long, px_min int, px_max int, n_pixels long, px_mean double"
    )


PIXEL_STATS_SCHEMA = _pixel_stats_schema("doc_id")


def _decode_or_none(decoder, payload, **kw):
    """Per-payload isolation for the mapInPandas stats kernels: decoders
    signal out-of-profile input with None, and any exception a malformed
    or adversarial payload still manages to raise is demoted to the same
    skip. One bad blob in a 100-TB corpus must drop one row, never kill
    the Spark task (and with it the whole stats query)."""
    try:
        return decoder(payload, **kw)
    except Exception:
        return None


def png_pixel_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel pixel statistics from REAL PNG decode: one output row
    per (payload, channel) with integer-exact sum/min/max/count plus the
    derived mean. Payloads `decode_png_pixels` rejects produce no rows
    (the unsupported-profile filter a 100-TB sweep needs anyway).
    Arrow-batched narrow map — no shuffle, parallel per input split."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_png_pixels, payload)
                if dec is None:
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    dec["height"], dec["width"], dec["channels"]
                )
                for ch in range(dec["channels"]):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), ch, dec["width"], dec["height"],
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + PIXEL_STATS_COLUMNS)

    return payloads.mapInPandas(stats, schema=_pixel_stats_schema(id_col))


# --------------------------------------------------------------------------
# Real baseline-JPEG codec, grayscale profile — stdlib + numpy only.
#
# Baseline JPEG carries its huffman and quantization tables IN the file
# (DQT/DHT segments), so the encoder is free to use simple canonical
# tables (all DC categories at 4 bits, all 162 AC run/size symbols at
# 8 bits — valid Kraft, no all-ones code) instead of the Annex-K
# "typical" ones; any conforming decoder, including this one and PIL,
# reads whatever tables the file declares. The decoder handles ANY
# 8-bit sequential-baseline single-component JPEG, restart markers
# included: marker walk → DQT/DHT/SOF0/SOS → huffman-decode the entropy
# stream (0xFF00 unstuffing, DRI/RSTn restart handling) → dequantize →
# float64 IDCT → level shift, round, clamp — grayscale AND 3-component
# YCbCr color at any 1..4 sampling factors (4:4:4/4:2:2/4:2:0, chroma
# upsampled by replication). Progressive/multi-scan/CMYK files still
# fall to the PIL ladder — profile honesty over coverage claims.
#
# Exactness lever for the oracle: with DC quant = 8, a flat 8×8 block's
# only nonzero coefficient is DC = 8·(v−128), which quantizes and
# reconstructs with ZERO rounding error — flat-block images round-trip
# bit-exactly, so a DuckDB oracle can predict decoded pixels without
# implementing JPEG. Non-flat content is covered at the coefficient
# level in tests (the huffman/bitstream layer is lossless by
# construction; only quantization is lossy).
# --------------------------------------------------------------------------

# canonical table = (bits_per_length[1..16], symbols in canonical order)
_JPG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPG_DC_SYMS = list(range(12))  # DC size categories 0..11, all 4-bit codes
_JPG_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)  # EOB, ZRL, then every (run,size) — 162 symbols, all 8-bit codes
_JPG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_JPG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]

# quant table: DC step 8 (the flat-block exactness lever), AC step 16
_JPG_QTABLE = [8] + [16] * 63

_JPG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpg_canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code construction."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            c[u, x] = math.cos((2 * x + 1) * u * math.pi / 16) * (
                math.sqrt(0.125) if u == 0 else 0.5
            )
    return c


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _jpg_magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size, additional bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _jpg_encode_block(w, block, q, c, dc_codes, ac_codes, prev_dc: int) -> int:
    """DCT → quantize → huffman-write one level-shifted 8×8 block;
    returns the new DC predictor."""
    import numpy as np

    coef = c @ block @ c.T
    quant = np.rint(coef / q).astype(np.int64)
    zz = quant.reshape(-1)[_JPG_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size, extra = _jpg_magnitude(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(extra, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, extra = _jpg_magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(extra, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


# JFIF YCbCr <-> RGB (ITU-R BT.601 full-range) — the conversion every
# baseline JPEG uses
_JPG_FWD = [
    (0.299, 0.587, 0.114, 0.0),
    (-0.168736, -0.331264, 0.5, 128.0),
    (0.5, -0.418688, -0.081312, 128.0),
]


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """A complete, spec-valid baseline sequential JPEG from row-major
    8-bit samples: grayscale (channels=1) or interleaved RGB
    (channels=3, JFIF YCbCr with `sampling` = luma (h, v) factors —
    (1, 1) is 4:4:4, (2, 1) is 4:2:2, (2, 2) is 4:2:0; chroma
    downsamples by box mean). Edges replicate-pad to MCU multiples.
    `restart_interval` > 0 emits DRI + byte-aligned RSTn markers with
    DC-predictor resets every that many MCUs — real camera layout."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    sh, sv = (1, 1) if channels == 1 else sampling
    if not (1 <= sh <= 4 and 1 <= sv <= 4):
        raise ValueError("sampling factors must be in 1..4")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    mw, mh = 8 * sh, 8 * sv  # MCU pixel size
    ph, pw = -(-height // mh) * mh, -(-width // mw) * mw
    img = np.pad(
        img, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
    ).astype(np.float64)
    if channels == 1:
        planes = [img[:, :, 0]]
        comp_samp = [(1, 1)]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        planes = []
        for cr_, cg_, cb_, off in _JPG_FWD:
            planes.append(
                np.clip(np.rint(cr_ * r + cg_ * g + cb_ * b + off), 0, 255)
            )
        for k in (1, 2):  # chroma box-mean downsample to (ph/sv, pw/sh)
            p = planes[k]
            planes[k] = np.rint(
                p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            )
        comp_samp = [(sh, sv), (1, 1), (1, 1)]
    c = _dct_matrix()
    q = np.array(_JPG_QTABLE, dtype=np.float64)[
        np.argsort(_JPG_ZIGZAG)
    ].reshape(8, 8)
    # _JPG_QTABLE is in zig-zag order (as DQT stores it); un-zig-zag for math
    dc_codes = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_SYMS)
    ac_codes = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_SYMS)
    w = _BitWriter()
    prev = [0] * len(planes)
    mcu = 0
    rst = 0
    for my in range(ph // mh):
        for mx in range(pw // mw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align (1-fill), emit RSTn, reset every DC predictor
                w.flush()
                w.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                prev = [0] * len(planes)
            mcu += 1
            for ci, plane in enumerate(planes):
                ch, cv = comp_samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        prev[ci] = _jpg_encode_block(
                            w, block, q, c, dc_codes, ac_codes, prev[ci]
                        )
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(_JPG_QTABLE))
    sof_comps = b"".join(
        bytes([cid + 1, (hh << 4) | vv, 0])
        for cid, (hh, vv) in enumerate(comp_samp)
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, len(planes)) + sof_comps,
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_SYMS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_SYMS)
    )
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(len(planes)))
    sos = seg(0xDA, bytes([len(planes)]) + sos_comps + bytes([0, 63, 0]))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy + b"\xff\xd9"
    )


def encode_jpeg_gray(
    pixels: bytes, width: int, height: int, restart_interval: int = 0
) -> bytes:
    """Grayscale wrapper over encode_jpeg (the in-plan synthesis twin of
    decode_jpeg_gray)."""
    return encode_jpeg(
        pixels, width, height, channels=1, restart_interval=restart_interval
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:  # stuffed byte: 0xFF00 → literal 0xFF
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise EOFError  # a real marker inside entropy data
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker (0xFFD0–0xFFD7)."""
        self.nbits = 0  # discard the interval's padding bits
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _jpg_decode_tree(bits: list[int], syms: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, inverse of the canonical construction."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _jpg_read_symbol(r: "_BitReader", tree: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.read_bit()
        length += 1
        if (length, code) in tree:
            return tree[(length, code)]
    raise ValueError("invalid huffman code")


def _jpg_extend(extra: int, size: int) -> int:
    if size == 0:
        return 0
    return extra if extra >= (1 << (size - 1)) else extra - (1 << size) + 1


@_none_on_malformed
def _jpg_parse_stream(b: bytes) -> dict | None:
    """Marker walk through SOS: tables, frame header, scan parameters,
    and the entropy-data slice. None = out of profile (progressive,
    12-bit, >3 components) or malformed."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    scan: dict[int, tuple[int, int]] = {}  # cid -> (td, ta)
    restart_interval = 0
    entropy_start = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        # skip fill bytes: any marker may be preceded by a run of 0xFF
        # (T.81 B.1.1.2) — classify the byte after the run
        while pos + 2 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(b):
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        body = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit quant = out of profile
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended — out of profile
        elif marker == 0xC0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp not in (1, 3):
                return None  # CMYK etc. stay behind the PIL ladder
            for k in range(ncomp):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                syms = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _jpg_decode_tree(bits, syms)
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps) or ns == 0:
                return None  # multi-scan files are out of profile
            for k in range(ns):
                cid, tt = body[1 + 2 * k], body[2 + 2 * k]
                scan[cid] = (tt >> 4, tt & 0x0F)
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if entropy_start is None or width is None or not comps:
        return None
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    for cid, h, v, tq in comps:
        if not (1 <= h <= 4 and 1 <= v <= 4) or tq not in qtables:
            return None
        if hmax % h != 0 or vmax % v != 0:
            return None  # non-divisible sampling (e.g. 3x3+2x2): out of profile
        if cid not in scan:
            return None
    end = b.rfind(b"\xff\xd9")
    return {
        "width": int(width), "height": int(height),
        "comps": comps, "scan": scan, "qtables": qtables,
        "htables": htables, "restart_interval": restart_interval,
        "entropy": b[entropy_start : end if end > entropy_start else len(b)],
    }


def _jpg_decode_block(r: "_BitReader", dc_tree: dict, ac_tree: dict,
                      prev_dc: int):
    """Huffman-decode one block's zig-zag coefficients; returns
    (zz int64[64] or None on corrupt run, new DC predictor)."""
    import numpy as np

    zz = np.zeros(64, dtype=np.int64)
    size = _jpg_read_symbol(r, dc_tree)
    prev_dc += _jpg_extend(r.read_bits(size), size)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        sym = _jpg_read_symbol(r, ac_tree)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i > 63:
            return None, prev_dc
        zz[i] = _jpg_extend(r.read_bits(size), size)
        i += 1
    return zz, prev_dc


@_none_on_malformed
def decode_jpeg_pixels(payload: bytes) -> dict | None:
    """REAL pixel decode for 8-bit JPEGs — sequential baseline (this
    function) AND progressive/SOF2 (delegated to
    decode_jpeg_progressive_pixels, r10): grayscale and color (1 or 3
    components, any sampling factors 1..4 so 4:4:4 / 4:2:2 / 4:2:0 all
    decode, chroma upsampled by replication), restart markers included,
    tables read from the file's own DQT/DHT. Returns {width, height,
    channels: 1|3, pixels row-major (RGB interleaved for color)} or
    None outside the profile (12-bit, arithmetic-coded, lossless,
    >3-component) — those fall to the PIL ladder."""
    import numpy as np

    hdr = _jpg_parse_stream(bytes(payload))
    if hdr is None:
        # not sequential-baseline: progressive (SOF2) decodes through
        # the Annex-G scan accumulator; anything else is out of profile
        return decode_jpeg_progressive_pixels(payload)
    width, height, comps = hdr["width"], hdr["height"], hdr["comps"]
    if len(comps) == 1:
        # A one-component scan is non-interleaved per T.81 A.2: the MCU is a
        # single data unit in raster order and the declared sampling factors
        # do not shape the block layout (decode_jpeg_coefficients agrees).
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    if mcus_x * mcus_y * hmax * vmax * 64 * len(comps) > 4 * MAX_SAMPLES:
        return None  # declared size over profile — bomb guard
    c = _dct_matrix()
    params = []
    planes = []
    for cid, h, v, tq in comps:
        td, ta = hdr["scan"][cid]
        dc_tree = hdr["htables"].get((0, td))
        ac_tree = hdr["htables"].get((1, ta))
        if dc_tree is None or ac_tree is None:
            return None
        q = np.array(hdr["qtables"][tq], dtype=np.float64)[
            np.argsort(_JPG_ZIGZAG)
        ].reshape(8, 8)
        params.append((h, v, q, dc_tree, ac_tree))
        planes.append(np.zeros((mcus_y * v * 8, mcus_x * h * 8), np.float64))
    r = _BitReader(hdr["entropy"])
    restart_interval = hdr["restart_interval"]
    prev = [0] * len(comps)
    mcu = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    r.sync_restart()
                    prev = [0] * len(comps)
                mcu += 1
                for ci, (h, v, q, dc_tree, ac_tree) in enumerate(params):
                    for by in range(v):
                        for bx in range(h):
                            zz, prev[ci] = _jpg_decode_block(
                                r, dc_tree, ac_tree, prev[ci]
                            )
                            if zz is None:
                                return None
                            block = np.zeros(64, dtype=np.float64)
                            block[_JPG_ZIGZAG] = zz
                            spatial = c.T @ (block.reshape(8, 8) * q) @ c
                            y0 = (my * v + by) * 8
                            x0 = (mx * h + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                                spatial + 128.0
                            )
    except (EOFError, ValueError):
        return None
    full = []
    for ci, (h, v, _, _, _) in enumerate(params):
        p = planes[ci]
        if h != hmax or v != vmax:  # chroma upsample by replication
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return {"width": width, "height": height, "channels": 1,
                "pixels": out.tobytes()}
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=2,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return {"width": width, "height": height, "channels": 3,
            "pixels": out.tobytes()}


def decode_jpeg_gray(payload: bytes) -> dict | None:
    """Single-component view of decode_jpeg_pixels: the decoded image
    when the file is grayscale baseline, None otherwise (color files
    decode via decode_jpeg_pixels)."""
    dec = decode_jpeg_pixels(payload)
    return dec if dec is not None and dec["channels"] == 1 else None


@_none_on_malformed
def decode_jpeg_coefficients(payload: bytes) -> dict | None:
    """The decoder's lossless half for SINGLE-component files, exposed
    for exact testing: marker walk + huffman decode + dequantize,
    WITHOUT the float IDCT. The entropy layer is lossless, so
    encode→this must reproduce the encoder's quantized-dequantized
    coefficients bit-for-bit. Returns {width, height, blocks:
    {(y,x): 8×8 float64 dequantized block}}."""
    import numpy as np

    hdr = _jpg_parse_stream(bytes(payload))
    if hdr is None or len(hdr["comps"]) != 1:
        return None
    width, height = hdr["width"], hdr["height"]
    if width * height > MAX_SAMPLES:
        return None  # declared size over profile — bomb guard
    cid, h, v, tq = hdr["comps"][0]
    td, ta = hdr["scan"][cid]
    dc_tree = hdr["htables"].get((0, td))
    ac_tree = hdr["htables"].get((1, ta))
    if dc_tree is None or ac_tree is None:
        return None
    q = np.array(hdr["qtables"][tq], dtype=np.float64)[
        np.argsort(_JPG_ZIGZAG)
    ].reshape(8, 8)
    r = _BitReader(hdr["entropy"])
    restart_interval = hdr["restart_interval"]
    blocks: dict[tuple[int, int], object] = {}
    prev_dc = 0
    mcu = 0
    try:
        for by in range(0, -(-height // 8) * 8, 8):
            for bx in range(0, -(-width // 8) * 8, 8):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    r.sync_restart()
                    prev_dc = 0
                mcu += 1
                zz, prev_dc = _jpg_decode_block(r, dc_tree, ac_tree, prev_dc)
                if zz is None:
                    return None
                block = np.zeros(64, dtype=np.float64)
                block[_JPG_ZIGZAG] = zz
                blocks[(by, bx)] = block.reshape(8, 8) * q
    except (EOFError, ValueError):
        return None
    return {"width": int(width), "height": int(height), "blocks": blocks}


# --------------------------------------------------------------------------
# Progressive JPEG (T.81 Annex G): spectral selection + successive
# approximation. The entropy layer reuses the baseline machinery
# (_BitReader, canonical Huffman trees, magnitude coding); what changes
# is the SCAN STRUCTURE — coefficients arrive across multiple SOS
# segments, each delivering a zig-zag band [Ss..Se] at a bit precision
# [Ah..Al], accumulated into per-component coefficient planes that are
# dequantized + IDCT'd once at the end. Decode follows the reference
# semantics of T.81 figures G.3-G.7 (the same algorithm libjpeg's
# jdphuff implements); the encoder emits correction bits by SIMULATING
# the decoder's walk, so the bit order is correct by construction
# (asserted by round-trip tests at every scan-script shape). This was
# the round-9 verdict's top residual gap: progressive files previously
# laddered to the PIL stub and lost their pixel stats in this container.
# --------------------------------------------------------------------------


@_none_on_malformed
def _jpg_parse_progressive(b: bytes) -> dict | None:
    """Marker walk for PROGRESSIVE (SOF2) files: multiple SOS scans,
    with DQT/DHT/DRI redefinable between scans (each scan snapshots the
    table state in force when its SOS appeared). Returns
    {width, height, comps, qtables, scans: [scan dicts]} or None for
    non-progressive / malformed / out-of-profile payloads."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    restart_interval = 0
    scans: list[dict] = []
    progressive = False
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        # skip fill bytes: any marker may be preceded by a run of 0xFF
        # (T.81 B.1.1.2) — classify the byte after the run
        while pos + 2 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        if marker == 0xD9:
            break  # EOI
        if pos + 4 > len(b):
            return None
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        body = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit quant = out of profile
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC2:
            progressive = True
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp not in (1, 3):
                return None
            for k in range(ncomp):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # baseline/sequential handled elsewhere; rest out
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                syms = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _jpg_decode_tree(bits, syms)
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if not progressive or width is None:
                return None
            ns = body[0]
            members = []  # (component index, td, ta)
            for k in range(ns):
                cid, tt = body[1 + 2 * k], body[2 + 2 * k]
                ci = next(
                    (i for i, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    return None
                members.append((ci, tt >> 4, tt & 0x0F))
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            if ss > se or se > 63:
                return None
            if ss == 0 and se != 0:
                return None  # DC scans are exactly the Ss=Se=0 band
            if ss > 0 and ns != 1:
                return None  # AC scans are single-component per T.81
            # entropy runs to the next real marker (stuffed 0xFF00 and
            # RSTn stay inside the slice — the scan decoder eats them)
            ep = pos + 2 + seg_len
            scan_end = len(b)
            j = ep
            while j + 1 < len(b):
                if b[j] == 0xFF and b[j + 1] == 0xFF:
                    # fill byte(s) before a marker (T.81 B.1.1.2) — the
                    # LAST 0xFF of the run starts the marker; treating
                    # the first as the marker start misparsed valid
                    # files into a None decode (ADVICE r10)
                    j += 1
                    continue
                if b[j] == 0xFF and b[j + 1] != 0x00 and not (
                    0xD0 <= b[j + 1] <= 0xD7
                ):
                    scan_end = j
                    break
                j += 1
            scans.append({
                "members": members, "ss": ss, "se": se, "ah": ah, "al": al,
                "entropy": b[ep:scan_end],
                "restart_interval": restart_interval,
                "htables": dict(htables),
            })
            pos = scan_end
            continue
        pos += 2 + seg_len
    if not progressive or width is None or not comps or not scans:
        return None
    for cid, h, v, tq in comps:
        if not (1 <= h <= 4 and 1 <= v <= 4) or tq not in qtables:
            return None
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    for _, h, v, _ in comps:
        if hmax % h or vmax % v:
            return None
    return {
        "width": int(width), "height": int(height), "comps": comps,
        "qtables": qtables, "scans": scans,
    }


def _jpg_prog_dc_scan(r, scan, comps, coef, mcus_x, mcus_y, nb):
    """One DC scan (Ss=Se=0): first pass (Ah=0) Huffman-decodes DC
    diffs of the point-transformed values; refinement (Ah>0) reads one
    raw bit per block into bit position Al (plain two's-complement OR —
    the arithmetic-shift representation makes that exact for negative
    DCs too). Interleaved MCU order when the scan carries every frame
    component; raster block order for a single-component scan."""
    members, ah, al = scan["members"], scan["ah"], scan["al"]
    ri = scan["restart_interval"]
    first = ah == 0
    trees = {}
    if first:
        for ci, td, _ in members:
            tree = scan["htables"].get((0, td))
            if tree is None:
                raise ValueError("missing DC table")
            trees[ci] = tree
    preds = {ci: 0 for ci, _, _ in members}
    interleaved = len(members) > 1

    def unit_blocks():
        if interleaved:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    out = []
                    for ci, _, _ in members:
                        _, h, v, _ = comps[ci]
                        for by in range(v):
                            for bx in range(h):
                                out.append((ci, my * v + by, mx * h + bx))
                    yield out
        else:
            ci = members[0][0]
            bh, bw = nb[ci]
            for by in range(bh):
                for bx in range(bw):
                    yield [(ci, by, bx)]

    unit = 0
    for blocks in unit_blocks():
        if ri and unit and unit % ri == 0:
            r.sync_restart()
            preds = {ci: 0 for ci, _, _ in members}
        unit += 1
        for ci, by, bx in blocks:
            if first:
                size = _jpg_read_symbol(r, trees[ci])
                preds[ci] += _jpg_extend(r.read_bits(size), size)
                coef[ci][by, bx, 0] = preds[ci] << al
            else:
                if r.read_bit():
                    coef[ci][by, bx, 0] |= 1 << al


def _jpg_prog_ac_first(r, scan, coef, nb):
    """First AC scan for a band [Ss..Se]: run/size coding of the
    point-transformed magnitudes with end-of-band RUN coding (EOBn
    symbols skip whole blocks)."""
    members, ss, se, al = scan["members"], scan["ss"], scan["se"], scan["al"]
    ci, _, ta = members[0]
    tree = scan["htables"].get((1, ta))
    if tree is None:
        raise ValueError("missing AC table")
    ri = scan["restart_interval"]
    bh, bw = nb[ci]
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                r.sync_restart()
                eobrun = 0
            unit += 1
            if eobrun:
                eobrun -= 1
                continue
            blk = coef[ci][by, bx]
            k = ss
            while k <= se:
                sym = _jpg_read_symbol(r, tree)
                rr, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if rr == 15:  # ZRL — 16 zero coefficients
                        k += 16
                        continue
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.read_bits(rr)
                    break
                k += rr
                if k > se:
                    raise ValueError("AC run past band end")
                blk[k] = _jpg_extend(r.read_bits(s), s) << al
                k += 1


def _jpg_prog_ac_refine(r, scan, coef, nb):
    """AC refinement scan (T.81 G.1.2.3 / figure G.7): each previously
    nonzero coefficient in the band receives one correction bit (in
    zig-zag walk order, interleaved with the run structure); newly
    nonzero coefficients arrive as ±1 at bit position Al."""
    members, ss, se, al = scan["members"], scan["ss"], scan["se"], scan["al"]
    ci, _, ta = members[0]
    tree = scan["htables"].get((1, ta))
    if tree is None:
        raise ValueError("missing AC table")
    ri = scan["restart_interval"]
    p1, m1 = 1 << al, -(1 << al)
    bh, bw = nb[ci]
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                r.sync_restart()
                eobrun = 0
            unit += 1
            blk = coef[ci][by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _jpg_read_symbol(r, tree)
                    rr, s = sym >> 4, sym & 0x0F
                    s_val = 0
                    if s:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        s_val = p1 if r.read_bit() else m1
                    else:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.read_bits(rr)
                            break
                        # rr == 15: ZRL — crosses 16 zero-history coeffs
                    while k <= se:
                        if blk[k] != 0:
                            if r.read_bit():
                                if (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if s_val:
                        if k > se:
                            raise ValueError("refinement run past band end")
                        blk[k] = s_val
                    k += 1
            if eobrun > 0:
                # end-of-band: remaining nonzero coeffs still get bits
                while k <= se:
                    if blk[k] != 0:
                        if r.read_bit():
                            if (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1


@_none_on_malformed
def decode_jpeg_progressive_pixels(payload: bytes) -> dict | None:
    """REAL pixel decode for 8-bit progressive JPEGs (SOF2): spectral
    selection and successive approximation, grayscale and color, any
    divisible sampling, restart markers, tables redefinable between
    scans. Returns the same dict shape as decode_jpeg_pixels, or None
    outside the profile. decode_jpeg_pixels delegates here when the
    baseline parse sees SOF2, so every stats stage and the media/AVI
    dispatch gain progressive support transparently."""
    import numpy as np

    hdr = _jpg_parse_progressive(bytes(payload))
    if hdr is None:
        return None
    width, height, comps = hdr["width"], hdr["height"], hdr["comps"]
    if len(comps) == 1:
        # single-component frames decode non-interleaved (T.81 A.2):
        # declared sampling factors do not shape the block layout
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    if mcus_x * mcus_y * hmax * vmax * 64 * len(comps) > 4 * MAX_SAMPLES:
        return None  # bomb guard, same budget as the baseline decoder
    coef = []
    nb = []  # non-interleaved block dims per component
    for _, h, v, _ in comps:
        coef.append(
            np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32)
        )
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        nb.append((-(-ch // 8), -(-cw // 8)))
    for scan in hdr["scans"]:
        for ci, _, _ in scan["members"]:
            if ci >= len(comps):
                return None
        r = _BitReader(scan["entropy"])
        if scan["ss"] == 0:
            _jpg_prog_dc_scan(r, scan, comps, coef, mcus_x, mcus_y, nb)
        elif scan["ah"] == 0:
            _jpg_prog_ac_first(r, scan, coef, nb)
        else:
            _jpg_prog_ac_refine(r, scan, coef, nb)
    # dequantize + IDCT, identical math to the baseline path
    c = _dct_matrix()
    planes = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        q = np.array(hdr["qtables"][tq], dtype=np.float64)[
            np.argsort(_JPG_ZIGZAG)
        ].reshape(8, 8)
        plane = np.zeros((mcus_y * v * 8, mcus_x * h * 8), np.float64)
        for by in range(mcus_y * v):
            for bx in range(mcus_x * h):
                zz = coef[ci][by, bx]
                block = np.zeros(64, dtype=np.float64)
                block[_JPG_ZIGZAG] = zz
                spatial = c.T @ (block.reshape(8, 8) * q) @ c
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    spatial + 128.0
                )
        if h != hmax or v != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1
            )
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return {"width": width, "height": height, "channels": 1,
                "pixels": out.tobytes()}
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=2,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return {"width": width, "height": height, "channels": 3,
            "pixels": out.tobytes()}


# libjpeg's default progressive scan scripts, expressed as
# (component indices, Ss, Se, Ah, Al) tuples.
_JPG_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_JPG_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _jpg_prog_emit_ac_first(w, zz_blocks, ss, se, al, ac_codes):
    """AC-first entropy for one component's blocks: run/size over the
    point-transformed magnitudes. EOB runs are not accumulated (each
    all-zero tail emits a plain EOB) — legal, marginally larger, and it
    keeps the standard baseline AC table sufficient (no EOBn symbols)."""
    for zz in zz_blocks:
        run = 0
        emitted = False
        for k in range(ss, se + 1):
            v = int(zz[k])
            mag = (v if v >= 0 else -v) >> al
            if mag == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            sv = mag if v >= 0 else -mag
            size, extra = _jpg_magnitude(sv)
            code, ln = ac_codes[(run << 4) | size]
            w.write(code, ln)
            w.write(extra, size)
            run = 0
            emitted = True
        if run > 0 or not emitted:
            code, ln = ac_codes[0x00]  # EOB for the all-zero tail
            w.write(code, ln)


def _jpg_prog_emit_ac_refine(w, zz_blocks, ss, se, al, ac_codes):
    """AC-refinement entropy, generated by SIMULATING the decoder's
    walk (figure G.7): for each newly-nonzero coefficient emit
    (run<<4|1) + sign, with the correction bits of already-nonzero
    coefficients interleaved exactly where the decoder's zig-zag walk
    consumes them; an EOB closes the block with the remaining
    correction bits. Correctness by construction — round-trip pinned
    in tests at every scan-script shape."""
    for zz in zz_blocks:
        def hist(k):  # nonzero before this scan?
            v = int(zz[k])
            return ((v if v >= 0 else -v) >> (al + 1)) != 0

        def newone(k):  # becomes ±1 at this precision in this scan?
            v = int(zz[k])
            return not hist(k) and (((v if v >= 0 else -v) >> al) & 1) == 1

        def corr_bit(k):
            v = int(zz[k])
            return ((v if v >= 0 else -v) >> al) & 1

        k = ss
        while k <= se:
            # find the next newly-nonzero coefficient
            p = k
            run = 0
            pending = []  # (position) of history coeffs crossed
            target = None
            while p <= se:
                if hist(p):
                    pending.append(p)
                elif newone(p):
                    target = p
                    break
                else:
                    run += 1
                p += 1
            if target is None:
                # end of band: EOB, then correction bits for every
                # remaining history coefficient in walk order
                code, ln = ac_codes[0x00]
                w.write(code, ln)
                for pos in pending:
                    w.write(corr_bit(pos), 1)
                break
            # ZRLs: each covers 16 zero-history coeffs; the decoder
            # consumes correction bits for history coeffs it crosses
            # before its 16th zero, so emit exactly those after each
            walk = k
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                zeros = 0
                while walk <= se:
                    if hist(walk):
                        w.write(corr_bit(walk), 1)
                        pending.remove(walk)
                    elif zeros == 15:
                        break  # the 16th zero — decoder breaks here
                    else:
                        zeros += 1
                    walk += 1
                walk += 1  # decoder's k++ past the 16th zero
                run -= 16
            code, ln = ac_codes[(run << 4) | 1]
            w.write(code, ln)
            w.write(1 if int(zz[target]) > 0 else 0, 1)
            for pos in pending:  # history coeffs before the new coeff
                w.write(corr_bit(pos), 1)
            k = target + 1


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    script: list | None = None,
    restart_interval: int = 0,
) -> bytes:
    """A spec-valid PROGRESSIVE JPEG (SOF2) from row-major 8-bit
    samples: grayscale or 4:4:4 RGB, libjpeg's default scan script
    (spectral selection + two-level successive approximation) unless a
    custom `script` of (component indices, Ss, Se, Ah, Al) is given.
    Quantization is identical to encode_jpeg, so progressive and
    baseline encodings of the same image DECODE IDENTICALLY — the
    round-trip oracle the tests pin. `restart_interval` > 0 emits DRI +
    byte-aligned RSTn markers every that many MCUs/blocks in EVERY scan
    (DC predictors reset per interval), pinning the decoder's
    progressive restart path. The in-plan synthesis twin of
    decode_jpeg_progressive_pixels."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    img = np.pad(
        img, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
    ).astype(np.float64)
    if channels == 1:
        planes = [img[:, :, 0]]
    else:
        r_, g_, b_ = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        planes = [
            np.clip(np.rint(cr * r_ + cg * g_ + cb * b_ + off), 0, 255)
            for cr, cg, cb, off in _JPG_FWD
        ]
    c = _dct_matrix()
    q = np.array(_JPG_QTABLE, dtype=np.float64)[
        np.argsort(_JPG_ZIGZAG)
    ].reshape(8, 8)
    bh, bw = ph // 8, pw // 8
    zz_planes = []  # per component: (bh, bw, 64) int32 quantized zig-zag
    for plane in planes:
        zzp = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                quant = np.rint((c @ block @ c.T) / q).astype(np.int64)
                zzp[by, bx] = quant.reshape(-1)[_JPG_ZIGZAG]
        zz_planes.append(zzp)
    if script is None:
        script = (
            _JPG_PROG_SCRIPT_GRAY if channels == 1 else _JPG_PROG_SCRIPT_COLOR
        )
    dc_codes = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_SYMS)
    ac_codes = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_SYMS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(_JPG_QTABLE))
    sof_comps = b"".join(
        bytes([ci + 1, 0x11, 0]) for ci in range(channels)  # 4:4:4
    )
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, channels) + sof_comps)
    out += seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_SYMS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_ixs, ss, se, ah, al in script:
        w = _BitWriter()
        rst = [0]  # RSTn modulo counter, per scan

        def _restart(unit: int) -> bool:
            if restart_interval and unit and unit % restart_interval == 0:
                w.flush()  # byte-align (1-fill), buffer keeps accumulating
                w.buf += bytes([0xFF, 0xD0 + rst[0]])
                rst[0] = (rst[0] + 1) & 7
                return True
            return False

        if ss == 0:
            blocks_per_comp = {
                ci: zz_planes[ci].reshape(bh * bw, 64) for ci in comp_ixs
            }
            if ah == 0:  # DC first: diffs of the point-transformed DCs
                preds = {ci: 0 for ci in comp_ixs}
                for bi in range(bh * bw):  # 4:4:4 → MCU order == raster
                    if _restart(bi):
                        preds = {ci: 0 for ci in comp_ixs}
                    for ci in comp_ixs:
                        dc = int(blocks_per_comp[ci][bi, 0]) >> al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size, extra = _jpg_magnitude(diff)
                        code, ln = dc_codes[size]
                        w.write(code, ln)
                        if size:
                            w.write(extra, size)
            else:  # DC refinement: raw bit Al per block
                for bi in range(bh * bw):
                    _restart(bi)
                    for ci in comp_ixs:
                        w.write((int(blocks_per_comp[ci][bi, 0]) >> al) & 1, 1)
        else:
            (ci,) = comp_ixs
            zz_blocks = zz_planes[ci].reshape(bh * bw, 64)
            if restart_interval:
                # per-interval emission (the AC emitters are stateless
                # across blocks because EOB runs never span blocks here)
                emit = (_jpg_prog_emit_ac_first if ah == 0
                        else _jpg_prog_emit_ac_refine)
                for start in range(0, bh * bw, restart_interval):
                    if start:
                        _restart(start)
                    emit(w, zz_blocks[start : start + restart_interval],
                         ss, se, al, ac_codes)
            elif ah == 0:
                _jpg_prog_emit_ac_first(w, zz_blocks, ss, se, al, ac_codes)
            else:
                _jpg_prog_emit_ac_refine(w, zz_blocks, ss, se, al, ac_codes)
        # td=0/ta=0 for every scan (the two standard tables)
        sos_comps = b"".join(bytes([ci + 1, 0x00]) for ci in comp_ixs)
        out += seg(
            0xDA,
            bytes([len(comp_ixs)]) + sos_comps
            + bytes([ss, se, (ah << 4) | al]),
        )
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_pixel_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Pixel statistics from REAL baseline JPEG decode — the JPEG
    sibling of png_pixel_stats (same output schema; one row per channel,
    so grayscale yields channel 0 and color yields 0/1/2 = R/G/B).
    Progressive files decode through the delegated SOF2 path (r10);
    genuinely out-of-profile payloads (12-bit, arithmetic-coded)
    produce no rows. Arrow-batched narrow map, no shuffle."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_jpeg_pixels, payload)
                if dec is None:
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    dec["height"], dec["width"], dec["channels"]
                )
                for ch in range(dec["channels"]):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), ch, dec["width"], dec["height"],
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + PIXEL_STATS_COLUMNS)

    return payloads.mapInPandas(stats, schema=_pixel_stats_schema(id_col))


# --------------------------------------------------------------------------
# Real GIF codec — stdlib only. GIF's LZW is LOSSLESS, so decode is exact
# by construction (no quantization lever needed, unlike JPEG). The
# decoder handles general GIF87a/89a streams: global/local color tables,
# extension-block skip, variable-width LZW with table growth and clear
# codes, and the 4-pass interlace. Only the FIRST image frame is decoded
# (animation = frame 0, the standard thumbnail/training-data semantics).
# The encoder emits a spec-valid non-interlaced stream using the classic
# clear-per-symbol LZW degenerate mode (every index as a literal code,
# periodic CLEARs keep the code width fixed) — maximally simple, still
# decodable by any conformant reader.
# --------------------------------------------------------------------------


def encode_gif(
    indices: bytes, width: int, height: int, palette: list[tuple[int, int, int]]
) -> bytes:
    """A complete, spec-valid GIF89a from palette indices + color table
    (the in-plan synthesis twin of decode_gif_pixels)."""
    n = max(2, (len(palette) - 1).bit_length())
    gct_size = 1 << n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (n - 1))  # GCT present, 2^n entries
    out += bytes([0, 0])  # background index, aspect
    for i in range(gct_size):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code = n
    clear, _end = 1 << min_code, (1 << min_code) + 1
    width_bits = min_code + 1
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LZW codes pack LSB-first
        nbits += width_bits
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for k, idx in enumerate(bytes(indices)):
        if k and k % (clear - 2) == 0:
            emit(clear)  # reset before the table could widen codes
        emit(idx)
    emit(_end)
    if nbits:
        data.append(acc & 0xFF)
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


@_none_on_malformed
def decode_gif_pixels(payload: bytes) -> dict | None:
    """REAL pixel decode for GIF87a/89a: color tables, extension skip,
    full variable-width LZW (table growth, clear/end codes, deferred
    clears), 4-pass interlace — first frame only. Returns {width,
    height, channels: 3, pixels RGB row-major} or None for malformed /
    truncated payloads."""
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = b[pos : pos + 3 * size]
        pos += 3 * size
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer before any image
            return None
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            return None
        break
    if pos >= len(b):
        return None
    left, top, width, height = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
    if width * height * 3 > MAX_SAMPLES:
        return None  # declared size over profile — bomb guard
    iflags = b[pos + 9]
    pos += 10
    if iflags & 0x80:  # local color table
        size = 2 << (iflags & 0x07)
        ct = b[pos : pos + 3 * size]
        pos += 3 * size
    else:
        ct = gct
    if ct is None or width == 0 or height == 0:
        return None
    interlaced = bool(iflags & 0x40)
    min_code = b[pos]
    pos += 1
    data = bytearray()
    while pos < len(b):
        blen = b[pos]
        pos += 1
        if blen == 0:
            break
        data += b[pos : pos + blen]
        pos += blen
    clear, end = 1 << min_code, (1 << min_code) + 1
    # LZW decode, LSB-first variable width
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    width_bits = min_code + 1
    acc = nbits = bitpos = 0
    out = bytearray()
    prev: bytes | None = None
    i = 0
    n_data = len(data)
    while True:
        while nbits < width_bits:
            if i >= n_data:
                return None  # ran out before END code
            acc |= data[i] << nbits
            i += 1
            nbits += 8
        code = acc & ((1 << width_bits) - 1)
        acc >>= width_bits
        nbits -= width_bits
        if code == clear:
            table = table[: (1 << min_code) + 2]
            width_bits = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << width_bits) and width_bits < 12:
            width_bits += 1
        if len(out) >= width * height:
            break
    if len(out) < width * height:
        return None
    idx = out[: width * height]
    if interlaced:  # 4-pass row shuffle back to sequential
        rows = [idx[r * width : (r + 1) * width] for r in range(height)]
        order = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
        seq = [b""] * height
        for src, dst in enumerate(order):
            seq[dst] = rows[src]
        idx = b"".join(seq)
    n_entries = len(ct) // 3
    if idx and max(idx) >= n_entries:
        return None
    rgb = bytearray(width * height * 3)
    for j, k in enumerate(idx):
        rgb[3 * j : 3 * j + 3] = ct[3 * k : 3 * k + 3]
    return {"width": int(width), "height": int(height), "channels": 3,
            "pixels": bytes(rgb)}


def gif_pixel_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel pixel statistics from REAL GIF decode (LZW is
    lossless, so every in-profile payload is exact). Same schema and
    plan shape as png_pixel_stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_gif_pixels, payload)
                if dec is None:
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    dec["height"], dec["width"], 3
                )
                for ch in range(3):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), ch, dec["width"], dec["height"],
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + PIXEL_STATS_COLUMNS)

    return payloads.mapInPandas(stats, schema=_pixel_stats_schema(id_col))


# --------------------------------------------------------------------------
# Real BMP codec — stdlib only. Uncompressed BITMAPINFOHEADER BMPs are
# raw BGR rows stored bottom-up with 4-byte row padding: no entropy
# coding at all, so decode is a pure layout transform (lossless, exact).
# 24-bit (BGR) and 8-bit (palette) profiles; RLE/16-bit/32-bit fall to
# the PIL ladder. This completes pixel decode for every container
# parse_image_header recognizes (PNG/JPEG/GIF/BMP).
# --------------------------------------------------------------------------


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """A spec-valid 24-bit uncompressed BMP from row-major RGB samples
    (the in-plan synthesis twin of decode_bmp_pixels)."""
    stride = (3 * width + 3) & ~3
    data = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up row order
        row = bytearray()
        for c in range(width):
            j = 3 * (r * width + c)
            row += bytes([pixels[j + 2], pixels[j + 1], pixels[j]])  # BGR
        row += bytes(stride - 3 * width)
        data += row
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                    len(data), 2835, 2835, 0, 0)
    return header + bytes(data)


@_none_on_malformed
def decode_bmp_pixels(payload: bytes) -> dict | None:
    """REAL pixel decode for uncompressed BITMAPINFOHEADER BMPs: 24-bit
    BGR and 8-bit palette, top-down or bottom-up, 4-byte row padding.
    Returns {width, height, channels: 3, pixels RGB row-major} or None
    outside the profile (RLE, 16/32-bit, BITMAPCOREHEADER)."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", b[10:14])[0]
    dib = struct.unpack("<I", b[14:18])[0]
    if dib < 40:
        return None
    width, height_raw = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if planes != 1 or compression != 0 or bpp not in (8, 24) or width <= 0:
        return None
    top_down = height_raw < 0
    height = abs(height_raw)
    if height == 0:
        return None
    palette = None
    if bpp == 8:
        n_colors = struct.unpack("<I", b[46:50])[0] or 256
        pal_off = 14 + dib
        palette = b[pal_off : pal_off + 4 * n_colors]
        if len(palette) < 4 * n_colors:
            return None
    stride = ((bpp // 8) * width + 3) & ~3
    if data_off + stride * height > len(b):
        return None
    out = bytearray(width * height * 3)
    for r in range(height):
        src_r = r if top_down else height - 1 - r
        row = b[data_off + src_r * stride : data_off + src_r * stride + stride]
        for c in range(width):
            j = 3 * (r * width + c)
            if bpp == 24:
                out[j] = row[3 * c + 2]      # BGR → RGB
                out[j + 1] = row[3 * c + 1]
                out[j + 2] = row[3 * c]
            else:
                e = 4 * row[c]  # palette entries are BGRX
                out[j] = palette[e + 2]
                out[j + 1] = palette[e + 1]
                out[j + 2] = palette[e]
    return {"width": int(width), "height": int(height), "channels": 3,
            "pixels": bytes(out)}


def bmp_pixel_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel pixel statistics from REAL BMP decode (raw layout
    transform, lossless). Same schema and plan shape as
    png_pixel_stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_bmp_pixels, payload)
                if dec is None:
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    dec["height"], dec["width"], 3
                )
                for ch in range(3):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), ch, dec["width"], dec["height"],
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + PIXEL_STATS_COLUMNS)

    return payloads.mapInPandas(stats, schema=_pixel_stats_schema(id_col))


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    out_w: int,
    out_h: int,
) -> bytes:
    """Nearest-neighbor resize of a raw interleaved raster — the resize
    verb of a training-data image pipeline (batch-normalize every image
    to the model's input grid before feature extraction). Floor mapping:
    out pixel (y, x) reads src (y·H_in // H_out, x·W_in // W_out) — the
    convention chosen because it is exactly reproducible in SQL integer
    arithmetic, so the oracle can recompute every sampled pixel (a
    center-sampling (x+0.5) convention would be equally valid; the
    mapping is documented, deterministic, and tested, which is what
    matters for pipeline reproducibility). Handles up- and down-scaling;
    pure index gather, so like BMP decode it is lossless over the pixels
    it keeps."""
    import numpy as np

    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ry = (np.arange(out_h, dtype=np.int64) * height) // out_h
    rx = (np.arange(out_w, dtype=np.int64) * width) // out_w
    return arr[ry][:, rx].tobytes()


def bmp_resize_stats(
    payloads: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-channel pixel statistics AFTER nearest-neighbor resize to a
    fixed (out_w, out_h) grid — decode → resize → aggregate, the
    normalize-to-model-input stage. Same Arrow-batched shape and
    malformed-payload contract (row dropped, never task death) as
    bmp_pixel_stats; `width`/`height` in the output are the RESIZED
    dims, so every row reports the same grid regardless of source
    size."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_bmp_pixels, payload)
                if dec is None:
                    continue
                res = resize_nearest(
                    dec["pixels"], dec["width"], dec["height"], 3, out_w, out_h
                )
                arr = np.frombuffer(res, dtype=np.uint8).reshape(out_h, out_w, 3)
                for ch in range(3):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), ch, out_w, out_h,
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + PIXEL_STATS_COLUMNS)

    return payloads.mapInPandas(stats, schema=_pixel_stats_schema(id_col))


MEDIA_RESIZE_COLUMNS = [
    "fmt", "channel", "width", "height",
    "px_sum", "px_min", "px_max", "n_pixels", "px_mean",
]

# magic-byte dispatch table: (fmt, magic, pixel decoder, fixed channel
# count or None = read it from the decode dict). Order matters only for
# readability — the magics are mutually exclusive. AVI-MJPEG video is
# dispatched separately inside media_resize_stats (its magic needs two
# probes, RIFF at 0 and 'AVI ' at 8, and its decode is per-frame).
_MEDIA_DECODERS = (
    ("png", b"\x89PNG\r\n\x1a\n", decode_png_pixels, None),
    ("jpeg", b"\xff\xd8\xff", decode_jpeg_pixels, None),
    ("gif", b"GIF8", decode_gif_pixels, 3),
    ("bmp", b"BM", decode_bmp_pixels, 3),
)


def media_resize_stats(
    payloads: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_frames: int | None = None,
) -> DataFrame:
    """Format-dispatching decode → nearest-neighbor resize → per-channel
    stats — bmp_resize_stats generalized across every container this
    module really decodes (VERDICT r8 #7): payloads are sniffed by magic
    bytes and routed to the PNG / JPEG / GIF / BMP pixel decoder — or,
    for RIFF-AVI payloads, per-frame through decode_avi_frames (VERDICT
    r9 #4) — resized to the fixed (out_w, out_h) model-input grid, and
    reduced to the same integer-exact per-channel statistics, with the
    detected format surfaced as a `fmt` column (the per-format
    accounting a mixed-corpus normalize stage needs). Video keeps the
    one-row-per-(payload, channel) shape: stats pool over ALL resized
    frames (n_pixels = out_w·out_h·n_frames), i.e. the stacked-frames
    tensor a model input pipeline would build; `max_frames` caps
    per-payload frame work for sampling. Unrecognized magics and
    payloads their decoder rejects drop the row — same contract as
    every decoder here: one bad blob in a 100-TB corpus costs one row,
    never the task. Arrow-batched narrow map, no shuffle."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    dec = _decode_or_none(
                        decode_avi_frames, b, max_frames=max_frames
                    )
                    if dec is None:
                        continue
                    ch_n = int(dec["channels"])
                    arr = np.stack([
                        np.frombuffer(
                            resize_nearest(
                                px, dec["width"], dec["height"],
                                ch_n, out_w, out_h,
                            ),
                            dtype=np.uint8,
                        ).reshape(out_h, out_w, ch_n)
                        for px in dec["frames"]
                    ])  # (frames, out_h, out_w, ch)
                    for ch in range(ch_n):
                        plane = arr[..., ch].astype(np.int64)
                        s, n = int(plane.sum()), int(plane.size)
                        rows.append(
                            (int(doc_id), "avi", ch, out_w, out_h,
                             s, int(plane.min()), int(plane.max()), n,
                             round(s / n, 6))
                        )
                    continue
                dec, fmt, fixed_ch = None, None, None
                for name, magic, decoder, fixed in _MEDIA_DECODERS:
                    if b.startswith(magic):
                        dec, fmt, fixed_ch = _decode_or_none(decoder, b), name, fixed
                        break
                if dec is None:
                    continue
                channels = fixed_ch if fixed_ch is not None else int(dec["channels"])
                res = resize_nearest(
                    dec["pixels"], dec["width"], dec["height"],
                    channels, out_w, out_h,
                )
                arr = np.frombuffer(res, dtype=np.uint8).reshape(
                    out_h, out_w, channels
                )
                for ch in range(channels):
                    plane = arr[:, :, ch].astype(np.int64)
                    s, n = int(plane.sum()), int(plane.size)
                    rows.append(
                        (int(doc_id), fmt, ch, out_w, out_h,
                         s, int(plane.min()), int(plane.max()), n,
                         round(s / n, 6))
                    )
            yield pd.DataFrame(rows, columns=[id_col] + MEDIA_RESIZE_COLUMNS)

    return payloads.mapInPandas(
        stats,
        schema=(
            f"{id_col} long, fmt string, channel int, width int, "
            "height int, px_sum long, px_min int, px_max int, "
            "n_pixels long, px_mean double"
        ),
    )


# --------------------------------------------------------------------------
# Real video decode: AVI is a RIFF container; with MJPEG streams every
# frame chunk ('00dc') is a complete baseline JPEG, so video decode is
# the container walk this module already does for WAV plus the JPEG
# codec it already has — no new entropy coding at all. The decoder
# collects the movi-list frame chunks and decodes each through
# decode_jpeg_pixels; non-MJPEG codecs (H.264 etc.) yield no frames and
# fall to the PIL/ffmpeg ladder of a production build. encode_avi_mjpeg
# writes a minimal spec-valid file for in-plan synthesis.
# --------------------------------------------------------------------------


def _avi_container(frame_chunks: bytes, width: int, height: int,
                   n_frames: int, fps: int, fourcc: bytes,
                   compression) -> bytes:
    """Shared RIFF-AVI assembly ('RIFF AVI ' → hdrl → movi) for the
    MJPEG and raw-DIB encoders; `compression` is the strf biCompression
    field (a fourcc for MJPG, 0 = BI_RGB for uncompressed)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                       0, n_frames, 0, 0, 0, 0)
    )
    comp = compression if isinstance(compression, bytes) else struct.pack(
        "<I", compression
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, comp,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", frame_chunks)
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """A minimal spec-valid AVI ('RIFF AVI ' → hdrl → movi) whose video
    stream is MJPEG: each element of `frames` must be a complete JPEG
    payload (encode_jpeg output). The in-plan synthesis twin of
    decode_avi_frames."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    return _avi_container(
        b"".join(chunk(b"00dc", f) for f in frames),
        width, height, len(frames), fps, b"MJPG", b"MJPG",
    )


def encode_avi_rawdib(
    frames_rgb: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """An UNCOMPRESSED AVI (strf biCompression = 0 / BI_RGB, 24-bit):
    each input frame is top-down row-major RGB; stored per DIB rules as
    bottom-up BGR rows with 4-byte padding in '00db' chunks — the same
    pixel layout as BMP, so decode is a pure layout transform and the
    round trip is LOSSLESS (unlike MJPEG). The non-MJPEG member of the
    video family (r10): real cameras/capture cards emit exactly this."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    row_bytes = width * 3
    padded = (row_bytes + 3) & ~3
    dibs = []
    for f in frames_rgb:
        if len(f) != row_bytes * height:
            raise ValueError(
                f"need {row_bytes * height} RGB bytes/frame, got {len(f)}"
            )
        out = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            row = f[y * row_bytes : (y + 1) * row_bytes]
            for x in range(width):  # RGB → BGR
                out += bytes((row[3 * x + 2], row[3 * x + 1], row[3 * x]))
            out += b"\x00" * (padded - row_bytes)
        dibs.append(bytes(out))
    return _avi_container(
        b"".join(chunk(b"00db", d) for d in dibs),
        width, height, len(frames_rgb), fps, b"DIB ", 0,
    )


@_none_on_malformed
def decode_avi_frames(payload: bytes, max_frames: int | None = None) -> dict | None:
    """REAL video frame decode for AVI: RIFF walk to the movi list,
    then each video frame chunk ('..dc'/'..db') decodes as a baseline/
    progressive JPEG through decode_jpeg_pixels (MJPEG), or — when the
    stream's strf header declares BI_RGB 24-bit (r10) — as an
    uncompressed bottom-up BGR DIB (the BMP pixel layout; lossless pure
    layout transform). Returns {width, height, channels, n_frames,
    frames: [pixel bytes, ...]} (dimensions from the first decodable
    frame; `max_frames` caps work for sampling) or None when the
    container is not RIFF-AVI or no frame decodes (other codecs —
    H.264 etc. — ladder to ffmpeg in a production build)."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            tag = b[pos : pos + 4]
            clen = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body_end = min(pos + 8 + clen, end)
            yield tag, pos + 8, body_end
            pos += 8 + clen + (clen & 1)

    riff_end = min(12 + struct.unpack("<I", b[4:8])[0] - 4, len(b))

    # stream format from hdrl → strl → strf (BITMAPINFOHEADER): tells
    # the raw path its geometry; MJPEG frames are self-describing
    strf = None

    def find_strf(start: int, end: int, depth: int = 0) -> None:
        nonlocal strf
        if depth > 4:
            return
        # an strf's layout depends on the stream TYPE its strl declares:
        # only one following a 'vids' strh is a BITMAPINFOHEADER — an
        # audio strl appearing first would otherwise have its
        # WAVEFORMATEX bytes read as geometry (ADVICE r10)
        last_strh_type = None
        for tag, bs, be in walk(start, end):
            if tag == b"LIST":
                find_strf(bs + 4, be, depth + 1)
            elif tag == b"strh" and be - bs >= 4:
                last_strh_type = b[bs : bs + 4]
            elif (
                tag == b"strf" and strf is None and be - bs >= 20
                and last_strh_type == b"vids"
            ):
                w_, h_, _, bits, comp = struct.unpack(
                    "<iiHHI", b[bs + 4 : bs + 20]
                )
                strf = {"width": w_, "height": h_, "bits": bits,
                        "compression": comp}
            if strf is not None:
                return

    find_strf(12, riff_end)

    def decode_raw_dib(fb: bytes):
        """Bottom-up (or top-down when biHeight < 0) 24-bit BGR DIB →
        top-down RGB — the BMP pixel layout without the file header."""
        if strf is None or strf["compression"] != 0 or strf["bits"] != 24:
            return None
        w_, h_ = strf["width"], abs(strf["height"])
        if w_ <= 0 or h_ <= 0 or w_ * h_ * 3 > MAX_SAMPLES:
            return None
        padded = (w_ * 3 + 3) & ~3
        if len(fb) < padded * h_:
            return None
        bottom_up = strf["height"] > 0
        out = bytearray(w_ * h_ * 3)
        for y in range(h_):
            src_y = (h_ - 1 - y) if bottom_up else y
            row = fb[src_y * padded : src_y * padded + w_ * 3]
            for x in range(w_):
                j = (y * w_ + x) * 3
                out[j] = row[3 * x + 2]
                out[j + 1] = row[3 * x + 1]
                out[j + 2] = row[3 * x]
        return {"width": w_, "height": h_, "channels": 3,
                "pixels": bytes(out)}

    frames: list[bytes] = []
    meta = None

    def decode_frame(fb: bytes):
        if fb[:3] == b"\xff\xd8\xff":
            return _decode_or_none(decode_jpeg_pixels, fb)
        return _decode_or_none(decode_raw_dib, fb)

    def scan_movi(start: int, end: int) -> bool:
        nonlocal meta
        for tag, bs, be in walk(start, end):
            if tag == b"LIST" and b[bs : bs + 4] == b"movi":
                for ftag, fs, fe in walk(bs + 4, be):
                    if ftag[2:4] in (b"dc", b"db"):
                        dec = decode_frame(b[fs:fe])
                        if dec is None:
                            continue  # corrupt frame skips; file survives
                        if meta is None:
                            meta = (dec["width"], dec["height"], dec["channels"])
                        if (dec["width"], dec["height"], dec["channels"]) == meta:
                            frames.append(dec["pixels"])
                        if max_frames is not None and len(frames) >= max_frames:
                            return True
                return True
        return False

    scan_movi(12, riff_end)
    if meta is None or not frames:
        return None
    return {"width": meta[0], "height": meta[1], "channels": meta[2],
            "n_frames": len(frames), "frames": frames}


def avi_frame_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    max_frames: int | None = None,
) -> DataFrame:
    """Per-(frame, channel) pixel statistics from REAL AVI-MJPEG video
    decode — the video member of the *_pixel_stats family. One row per
    (payload, frame, channel); undecodable payloads produce no rows.
    Arrow-batched narrow map, no shuffle."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_avi_frames, payload, max_frames=max_frames)
                if dec is None:
                    continue
                for fi, px in enumerate(dec["frames"]):
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(
                        dec["height"], dec["width"], dec["channels"]
                    )
                    for ch in range(dec["channels"]):
                        plane = arr[:, :, ch].astype(np.int64)
                        s, n = int(plane.sum()), int(plane.size)
                        rows.append(
                            (int(doc_id), fi, ch, dec["width"], dec["height"],
                             s, int(plane.min()), int(plane.max()), n,
                             round(s / n, 6))
                        )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx"] + PIXEL_STATS_COLUMNS,
            )

    return payloads.mapInPandas(
        stats,
        schema=(f"{id_col} long, frame_idx int, channel int, width int, "
                "height int, px_sum long, px_min int, px_max int, "
                "n_pixels long, px_mean double"),
    )


# --------------------------------------------------------------------------
# REAL audio decode: RIFF/WAVE PCM needs no codec — the header is a chunk
# walk and the samples are raw little-endian integers, so unlike JPEG the
# whole path is stdlib `struct` with nothing approximated. 8-bit (unsigned,
# offset 128), 16-bit (signed LE), and 24-bit (signed LE, sign-extended)
# PCM are the supported profile, plus IMA-ADPCM (WAVE format tag 0x0011,
# the public IMA/DVI 4-bit codec: per-block (predictor, step-index)
# headers + nibble deltas through the 89-entry step table). Compressed
# perceptual codecs (MP3/AAC/float WAV) fall to None like any other
# unsupported payload.
# --------------------------------------------------------------------------

# IMA/DVI ADPCM tables (public spec: IMA Digital Audio Focus and Technical
# Working Groups, "Recommended Practices for Enhancing Digital Audio
# Compatibility", rev 3.00 1992; same tables in the multimedia literature).
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)  # indexed by nibble & 7


def _g711_ulaw_to_linear(code: int) -> int:
    """ITU-T G.711 mu-law expand (the classic Sun ulaw2linear): invert,
    then magnitude = ((mantissa << 3) + 0x84) << segment, re-biased."""
    u = ~code & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if u & 0x80 else (t - 0x84)


def _g711_alaw_to_linear(code: int) -> int:
    """ITU-T G.711 A-law expand: XOR 0x55, then segment-shifted
    mantissa; sign bit SET means positive (Sun alaw2linear)."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


_G711_ULAW_TABLE = tuple(_g711_ulaw_to_linear(c) for c in range(256))
_G711_ALAW_TABLE = tuple(_g711_alaw_to_linear(c) for c in range(256))


def encode_wav(
    samples: list[int], sample_rate: int, channels: int, bits: int = 16
) -> bytes:
    """Build a valid RIFF/WAVE PCM payload from interleaved integer
    samples (the in-plan synthesis twin of `decode_wav_samples`, same
    role as encode_png). 16-bit: signed values in [-32768, 32767];
    8-bit: signed values in [-128, 127] stored offset-128 unsigned per
    the WAV spec; 24-bit: signed values in [-2^23, 2^23-1] stored as
    3-byte little-endian two's complement."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes((v + 128) & 0xFF for v in samples)
    elif bits == 24:
        out = bytearray()
        for v in samples:
            out += (v & 0xFFFFFF).to_bytes(3, "little")
        data = bytes(out)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    blocks: list[dict], sample_rate: int, channels: int
) -> bytes:
    """Build a valid IMA-ADPCM WAVE payload (format tag 0x0011) from
    explicit per-block codec state — the in-plan synthesis twin of the
    ADPCM branch of `decode_wav_samples`. Each block dict carries
    ``pred`` (per-channel initial predictor, int16 — emitted as the
    block's first sample per the spec), ``idx`` (per-channel initial
    step index, 0..88), and ``nibbles`` (per-channel list of 4-bit
    codes, length a multiple of 8 so data fills whole 4-byte
    channel-interleaved words). All blocks must share one geometry.
    Writing the compressed stream directly — rather than round-tripping
    through a lossy PCM encoder — is what lets an exact oracle recompute
    the decoded samples from the same deterministic nibble pattern."""
    if not blocks:
        raise ValueError("at least one block required")
    nnib = len(blocks[0]["nibbles"][0])
    if nnib % 8 != 0:
        raise ValueError("nibbles per channel must be a multiple of 8")
    nwords = nnib // 8  # 4-byte data words per channel per block
    samples_per_block = 1 + nnib
    block_align = 4 * channels * (1 + nwords)
    data = bytearray()
    for blk in blocks:
        for ch in range(channels):
            data += struct.pack(
                "<hBB", blk["pred"][ch], blk["idx"][ch], 0
            )
        for w in range(nwords):
            for ch in range(channels):  # channel-interleaved 4-byte words
                nibs = blk["nibbles"][ch][w * 8 : w * 8 + 8]
                for k in range(4):
                    data.append((nibs[2 * k] & 0xF) | ((nibs[2 * k + 1] & 0xF) << 4))
    n_frames = len(blocks) * samples_per_block
    byte_rate = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate,
        block_align, 4, 2, samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    codes: list[int], sample_rate: int, channels: int, law: str = "ulaw"
) -> bytes:
    """Build a valid G.711 WAVE payload (format tag 7 = mu-law, 6 =
    A-law) from interleaved 8-bit companded code bytes — the in-plan
    synthesis twin of the G.711 branch of decode_wav_samples. Like the
    ADPCM twin, writing the compressed codes directly (not a lossy
    linear->companded encoder) is what keeps the oracle closed-form."""
    tag = {"ulaw": 7, "alaw": 6}[law]
    data = bytes(c & 0xFF for c in codes)
    block_align = channels
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, sample_rate, sample_rate * block_align,
        block_align, 8, 0,
    )
    n_frames = len(codes) // channels
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_none_on_malformed
def parse_wav_header(payload: bytes) -> dict | None:
    """Metadata from the RIFF chunk walk alone (no sample decode):
    {sample_rate, channels, bits, n_frames, duration_ms} — plus
    {codec, block_align, samples_per_block} for IMA-ADPCM — or None for
    non-WAV / unsupported-codec / malformed payloads. Profile: PCM
    8/16/24-bit (format tag 1) and IMA-ADPCM (format tag 0x0011). The
    audio sibling of parse_image_header."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        clen = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if pos + 8 + clen > len(b):
            return None  # truncated chunk
        if tag == b"fmt ":
            fmt = b[pos + 8 : pos + 8 + clen]
        elif tag == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data_len is None:
        return None
    audio_fmt, channels, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if channels == 0 or block_align == 0:
        return None
    if audio_fmt == 1 and bits in (8, 16, 24):
        if block_align != channels * (bits // 8):
            return None
        n_frames = data_len // block_align
        return {
            "codec": "pcm",
            "sample_rate": int(rate),
            "channels": int(channels),
            "bits": int(bits),
            "n_frames": int(n_frames),
            "duration_ms": int(round(n_frames * 1000 / rate)) if rate else None,
        }
    if audio_fmt in (6, 7) and bits == 8:
        # G.711 A-law (6) / mu-law (7): one code byte per sample
        if block_align != channels:
            return None
        n_frames = data_len // block_align
        return {
            "codec": "alaw" if audio_fmt == 6 else "ulaw",
            "sample_rate": int(rate),
            "channels": int(channels),
            "bits": 8,
            "n_frames": int(n_frames),
            "duration_ms": int(round(n_frames * 1000 / rate)) if rate else None,
        }
    if audio_fmt == 0x11 and bits == 4:
        # IMA-ADPCM: fmt extension carries wSamplesPerBlock; full blocks
        # only (a truncated tail block is out of profile → None).
        if len(fmt) < 20:
            return None
        cb_size, spb = struct.unpack("<HH", fmt[16:20])
        if cb_size < 2 or spb < 1:
            return None
        # geometry must be self-consistent: header word + data words
        nwords, rem = divmod(spb - 1, 8)
        if rem != 0 or block_align != 4 * channels * (1 + nwords):
            return None
        if data_len % block_align != 0:
            return None
        n_frames = (data_len // block_align) * spb
        return {
            "codec": "ima_adpcm",
            "sample_rate": int(rate),
            "channels": int(channels),
            "bits": 4,
            "block_align": int(block_align),
            "samples_per_block": int(spb),
            "n_frames": int(n_frames),
            "duration_ms": int(round(n_frames * 1000 / rate)) if rate else None,
        }
    return None  # compressed perceptual codecs are out of profile


@_none_on_malformed
def decode_wav_samples(payload: bytes) -> dict | None:
    """REAL sample decode for the supported WAV profile: header walk +
    raw little-endian sample read for PCM (8-bit re-centered to signed
    byte-128, 16-bit, 24-bit sign-extended) and the full IMA/DVI state
    machine for IMA-ADPCM. Returns {sample_rate, channels, bits,
    n_frames, samples, ...} with `samples` an int32 numpy array of
    shape (n_frames, channels).

    The ADPCM recurrence is sequential WITHIN a block but blocks are
    independent (each block header restarts the (predictor, step-index)
    state), so the decoder vectorizes across all blocks×channels with
    numpy and loops only over the samples-per-block axis — the shape
    that stays fast when one payload carries thousands of blocks."""
    import numpy as np

    hdr = parse_wav_header(payload)
    if hdr is None:
        return None
    b = bytes(payload)
    pos = 12
    raw = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        clen = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if tag == b"data":
            raw = b[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    if raw is None:
        return None
    nch = hdr["channels"]
    if hdr["codec"] == "ima_adpcm":
        ba, spb = hdr["block_align"], hdr["samples_per_block"]
        nblocks = len(raw) // ba
        if nblocks == 0:
            return {**hdr, "n_frames": 0,
                    "samples": np.zeros((0, nch), dtype=np.int32)}
        nwords = (spb - 1) // 8
        blk = np.frombuffer(raw[: nblocks * ba], dtype=np.uint8).reshape(
            nblocks, ba
        )
        heads = blk[:, : 4 * nch].reshape(nblocks, nch, 4).astype(np.int32)
        pred = heads[:, :, 0] | (heads[:, :, 1] << 8)  # int16 LE
        pred = np.where(pred >= 32768, pred - 65536, pred)
        idx = np.clip(heads[:, :, 2], 0, 88)
        # data: nwords channel-interleaved 4-byte words per channel
        data = blk[:, 4 * nch :].reshape(nblocks, nwords, nch, 4)
        nib = np.empty((nblocks, nwords, nch, 8), dtype=np.int32)
        nib[..., 0::2] = data & 0xF        # low nibble = earlier sample
        nib[..., 1::2] = data >> 4
        # → (nblocks, nch, spb-1): nibble t produces block sample t+1
        nib = nib.transpose(0, 2, 1, 3).reshape(nblocks, nch, nwords * 8)
        step_t = np.asarray(_IMA_STEP_TABLE, dtype=np.int32)
        index_t = np.asarray(_IMA_INDEX_TABLE, dtype=np.int32)
        out = np.empty((nblocks, nch, spb), dtype=np.int32)
        out[:, :, 0] = pred  # header predictor IS the first sample
        for t in range(nwords * 8):
            n = nib[:, :, t]
            step = step_t[idx]
            diff = (
                (step >> 3)
                + np.where(n & 1, step >> 2, 0)
                + np.where(n & 2, step >> 1, 0)
                + np.where(n & 4, step, 0)
            )
            pred = np.clip(
                np.where(n & 8, pred - diff, pred + diff), -32768, 32767
            )
            idx = np.clip(idx + index_t[n & 7], 0, 88)
            out[:, :, t + 1] = pred
        arr = out.transpose(0, 2, 1).reshape(nblocks * spb, nch)
        return {**hdr, "samples": arr}
    if hdr["codec"] in ("ulaw", "alaw"):
        table = _G711_ULAW_TABLE if hdr["codec"] == "ulaw" else _G711_ALAW_TABLE
        lut = np.asarray(table, dtype=np.int32)
        arr = lut[np.frombuffer(raw, dtype=np.uint8)]
        n = hdr["n_frames"] * nch
        return {**hdr, "samples": arr[:n].reshape(hdr["n_frames"], nch)}
    if hdr["bits"] == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif hdr["bits"] == 24:
        u = np.frombuffer(raw, dtype=np.uint8)
        u = u[: (len(u) // 3) * 3].reshape(-1, 3).astype(np.int32)
        arr = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    else:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    n = hdr["n_frames"] * nch
    arr = arr[:n].reshape(hdr["n_frames"], nch)
    return {**hdr, "samples": arr}


AUDIO_STATS_SCHEMA = (
    "doc_id long, channel int, sample_rate int, n_frames long, "
    "amp_sum long, amp_min int, amp_max int, sq_sum long, rms double"
)


def wav_audio_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel amplitude statistics from REAL WAV decode: one row per
    (payload, channel) with integer-exact sum/min/max/sum-of-squares and
    the derived RMS (IEEE sqrt of exact integers — cross-engine
    bit-stable). Unsupported payloads produce no rows. Arrow-batched
    narrow map, no shuffle — the same shape as png_pixel_stats."""
    import math

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_wav_samples, payload)
                if dec is None or dec["n_frames"] == 0:
                    continue
                arr = dec["samples"].astype("int64")
                for ch in range(dec["channels"]):
                    col = arr[:, ch]
                    s, sq, n = int(col.sum()), int((col * col).sum()), len(col)
                    rows.append(
                        (int(doc_id), ch, dec["sample_rate"], n,
                         s, int(col.min()), int(col.max()), sq,
                         round(math.sqrt(sq / n), 6))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "channel", "sample_rate", "n_frames",
                         "amp_sum", "amp_min", "amp_max", "sq_sum", "rms"],
            )

    return payloads.mapInPandas(
        stats,
        schema=(f"{id_col} long, channel int, sample_rate int, "
                "n_frames long, amp_sum long, amp_min int, amp_max int, "
                "sq_sum long, rms double"),
    )


def wav_zcr_stats(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel zero-crossing rate from REAL WAV decode — the classic
    lightweight audio feature (voiced/unvoiced and tone-vs-noise
    discrimination; a silence/noise screen for audio training data,
    complementing wav_audio_stats' amplitude profile). A crossing at
    frame f is defined by the INTEGER predicate
    (v_f >= 0) != (v_{f-1} >= 0) — sign buckets, no float epsilon — so
    the oracle reproduces every crossing with a lag() comparison;
    zcr = crossings / (n_frames - 1). Payloads with < 2 frames produce
    no rows (no transition exists). Same Arrow-batched, shuffle-free,
    malformed-payload-drops-row contract as the other decoders."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_wav_samples, payload)
                if dec is None or dec["n_frames"] < 2:
                    continue
                arr = dec["samples"].astype("int64")
                for ch in range(dec["channels"]):
                    nonneg = arr[:, ch] >= 0
                    crossings = int((nonneg[1:] != nonneg[:-1]).sum())
                    n = len(nonneg)
                    rows.append(
                        (int(doc_id), ch, n, crossings,
                         round(crossings / (n - 1), 6))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "channel", "n_frames", "n_crossings", "zcr"],
            )

    return payloads.mapInPandas(
        stats,
        schema=(
            f"{id_col} long, channel int, n_frames long, "
            "n_crossings long, zcr double"
        ),
    )


def wav_resample_stats(
    payloads: DataFrame,
    target_rate: int = 16000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """The audio NORMALIZE stage — the WAV twin of media_resize_stats:
    codec-dispatching decode (any supported profile: PCM 8/16/24,
    IMA-ADPCM, G.711 mu/A-law) → integer mono downmix → nearest-sample
    resample to `target_rate` → per-payload amplitude stats. This is
    the shape a training pipeline runs to land heterogeneous audio on
    one (mono, fixed-rate) footing before feature extraction.

    Deterministic integer definitions so an oracle can replay them:
    downmix = floor(sum(channels) / n_channels); output length
    m = max(1, (n_frames * target_rate) // src_rate); output sample t
    reads source index (t * n_frames) // m. Unsupported payloads
    produce no rows. Arrow-batched narrow map, no shuffle."""
    import math

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_wav_samples, payload)
                if dec is None or dec["n_frames"] == 0 or not dec["sample_rate"]:
                    continue
                arr = dec["samples"].astype(np.int64)
                n, nch = arr.shape
                mono = np.floor_divide(arr.sum(axis=1), nch)
                m = max(1, (n * target_rate) // dec["sample_rate"])
                idx = (np.arange(m, dtype=np.int64) * n) // m
                out = mono[idx]
                sq = int((out * out).sum())
                rows.append(
                    (int(doc_id), dec["codec"], dec["sample_rate"], n,
                     m, int(out.sum()), int(out.min()), int(out.max()), sq,
                     round(math.sqrt(sq / m), 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "src_codec", "src_rate", "src_frames",
                         "n_out", "amp_sum", "amp_min", "amp_max",
                         "sq_sum", "rms"],
            )

    return payloads.mapInPandas(
        stats,
        schema=(f"{id_col} long, src_codec string, src_rate int, "
                "src_frames long, n_out long, amp_sum long, amp_min long, "
                "amp_max long, sq_sum long, rms double"),
    )


def wav_vad_segments(
    payloads: DataFrame,
    frame_len: int = 160,
    threshold: int = 1,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-based voice-activity segmentation — the silence-trimming
    stage an ASR training pipeline runs before transcription/alignment:
    decode (any supported WAV codec) → integer mono downmix → fixed
    frames of `frame_len` samples (trailing partial frame dropped) →
    frame energy = Σ sample² (integer-exact) → contiguous runs of
    frames with energy ≥ `threshold` become segments. One row per
    (payload, segment): start/end frame, length, exact energy sum.
    Run detection is a vectorized flag-diff (no Python per-frame loop);
    the oracle reproduces the islands with classic gaps-and-islands SQL
    (f - row_number() grouping) over the same closed-form energies.
    Payloads with no active frame produce no rows. Narrow Arrow map,
    no shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_wav_samples, payload)
                if dec is None or dec["n_frames"] < frame_len:
                    continue
                arr = dec["samples"].astype(np.int64)
                n, nch = arr.shape
                mono = np.floor_divide(arr.sum(axis=1), nch)
                nf = n // frame_len
                frames = mono[: nf * frame_len].reshape(nf, frame_len)
                energy = (frames * frames).sum(axis=1)
                active = energy >= threshold
                if not active.any():
                    continue
                # run boundaries via flag diff on a 0-padded sequence
                padded = np.concatenate(([False], active, [False]))
                d = np.diff(padded.astype(np.int8))
                starts = np.nonzero(d == 1)[0]
                ends = np.nonzero(d == -1)[0] - 1  # inclusive
                for seg_idx, (s, e) in enumerate(zip(starts, ends)):
                    rows.append(
                        (int(doc_id), seg_idx, int(s), int(e),
                         int(e - s + 1), int(energy[s : e + 1].sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "seg_idx", "start_frame", "end_frame",
                         "n_frames", "energy_sum"],
            )

    return payloads.mapInPandas(
        stats,
        schema=(f"{id_col} long, seg_idx int, start_frame int, "
                "end_frame int, n_frames int, energy_sum long"),
    )


def image_dhash(
    payloads: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL image decode — the
    embedding-free image fingerprint: sniff the container (PNG / JPEG /
    GIF / BMP, the same dispatch as media_resize_stats), decode,
    grayscale via the integer floor-mean of the first three channels
    (single/dual-channel images use channel 0), nearest-resize to the
    canonical 9x8 grid with the (t*n)//m floor mapping, then one bit
    per horizontal neighbor pair: bit(r,c) = g[r,c] > g[r,c+1]. The 64
    bits pack into TWO 32-bit words held in longs (rows 0-3 → dh0,
    rows 4-7 → dh1) — the same packed-word shape vm.bq_encode_words
    produces, so the hashes plug directly into knn_hamming and the
    banded pair join below. Every step is integer arithmetic the oracle
    reproduces in SQL. Unsupported payloads drop the row. Narrow Arrow
    map, no shuffle."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                dec, fixed_ch = None, None
                for _name, magic, decoder, fixed in _MEDIA_DECODERS:
                    if b.startswith(magic):
                        dec, fixed_ch = _decode_or_none(decoder, b), fixed
                        break
                if dec is None:
                    continue
                ch = fixed_ch if fixed_ch is not None else int(dec["channels"])
                w, h = int(dec["width"]), int(dec["height"])
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    h, w, ch
                ).astype(np.int64)
                if ch >= 3:
                    gray = np.floor_divide(arr[:, :, :3].sum(axis=2), 3)
                else:
                    gray = arr[:, :, 0]
                rr = (np.arange(8) * h) // 8
                cc = (np.arange(9) * w) // 9
                g = gray[np.ix_(rr, cc)]  # (8, 9)
                bits = (g[:, :8] > g[:, 1:]).astype(np.int64)  # (8, 8)
                weights = 1 << (np.arange(4)[:, None] * 8 + np.arange(8)[None, :])
                dh0 = int((bits[:4] * weights).sum())
                dh1 = int((bits[4:] * weights).sum())
                rows.append((int(doc_id), dh0, dh1))
            yield pd.DataFrame(rows, columns=[id_col, "dh0", "dh1"])

    return payloads.mapInPandas(
        hashes, schema=f"{id_col} long, dh0 long, dh1 long"
    )


def image_neardup_pairs(
    payloads: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-free image near-duplicate pairs: dHash each payload,
    then find id pairs whose 64-bit hashes differ in ≤ `max_hamming`
    bits — the image twin of dedup.simhash_neardup_pairs, and the
    standard cheap screen an image-training pipeline runs before (or
    instead of) embedding-based dedup. Candidate generation is
    PIGEONHOLE blocking, never all-pairs: the 64 bits split into four
    16-bit chunks, and two hashes within Hamming distance ≤ 3 must
    agree on at least one chunk (4 chunks > 3 differing bits), so a
    bucket join on (chunk_idx, chunk_value) finds every true pair while
    only images sharing a chunk ever meet. max_hamming is capped at 3
    — the guarantee the four fixed chunks give; a larger radius would
    need more bands. Returns (id_a, id_b, hamming), id_a < id_b. At
    100 TB the shuffle carries only (chunk, id, two longs) rows and
    candidate pairs, never pixels.

    `max_bucket` is the skew valve the LSH near-dup path already has
    (dedup.py bucket caps): a corpus of near-identical images (logos,
    template screenshots — the realistic adversarial case, measured at
    ~1M candidate pairs from 10k self-similar synthetics) concentrates
    one chunk value into a bucket whose pair join is quadratic. With
    `max_bucket` set, chunks whose bucket exceeds it drop out of
    candidate generation — pairs detectable ONLY through an
    over-crowded chunk are lost (recall, never precision), the same
    documented trade the LSH cap makes. None (default) is exact and is
    what the oracle pins."""
    dh = image_dhash(payloads, id_col=id_col, payload_col=payload_col)
    return _hamming_pairs_banded(dh, id_col, max_hamming, max_bucket)


def _hamming_pairs_banded(
    hashes: DataFrame,
    id_col: str,
    max_hamming: int,
    max_bucket: int | None,
) -> DataFrame:
    """Shared pigeonhole pair join over (id, dh0, dh1) two-word
    fingerprints — serves both the image dHash and the audio envelope
    fingerprint. Four 16-bit chunks guarantee radius ≤ 3."""
    if max_hamming > 3:
        raise ValueError(
            "max_hamming > 3 exceeds the 4-chunk pigeonhole guarantee"
        )
    chunks = [
        (F.col("dh0") % 65536).alias("c0"),
        (F.col("dh0") / 65536).cast("long").alias("c1"),
        (F.col("dh1") % 65536).alias("c2"),
        (F.col("dh1") / 65536).cast("long").alias("c3"),
    ]
    staged = hashes.select(id_col, "dh0", "dh1", *chunks)
    banded = None
    for idx in range(4):
        piece = staged.select(
            F.lit(idx).alias("chunk_idx"),
            F.col(f"c{idx}").alias("chunk_val"),
            F.col(id_col).alias("id"), "dh0", "dh1",
        )
        banded = piece if banded is None else banded.unionByName(piece)
    if max_bucket is not None:
        # one partial-agg count per (chunk_idx, chunk_val); oversize
        # buckets leave candidate generation entirely (documented
        # recall trade — same shape as the LSH bucket cap)
        sizes = banded.groupBy("chunk_idx", "chunk_val").agg(
            F.count(F.lit(1)).alias("__bucket_n")
        )
        banded = (
            banded.join(sizes, ["chunk_idx", "chunk_val"])
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    a = banded.select(
        "chunk_idx", "chunk_val",
        F.col("id").alias("id_a"),
        F.col("dh0").alias("h0a"), F.col("dh1").alias("h1a"),
    )
    b = banded.select(
        "chunk_idx", "chunk_val",
        F.col("id").alias("id_b"),
        F.col("dh0").alias("h0b"), F.col("dh1").alias("h1b"),
    )
    ham = (
        F.bit_count(F.col("h0a").bitwiseXOR(F.col("h0b")))
        + F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can collide in several chunks
    )


def audio_fingerprint(
    payloads: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-envelope audio fingerprint — the audio rung of the
    embedding-free near-dup ladder (text SimHash, image dHash, and now
    audio): decode (any supported WAV codec), integer mono downmix,
    resample the ENERGY ENVELOPE onto a canonical 65-point grid —
    sample s belongs to window (s·65)//n, i.e. window boundaries are
    ceil(t·n/65) (the ceil boundary is what makes the per-sample
    assignment the exact SQL-expressible inverse; floor boundaries are
    NOT invertible by (s·65)//n when 65∤n) — then one bit per
    neighboring window pair: bit(t) = E[t] > E[t+1], the dHash recipe
    transposed to time. Loudness-invariant up to ties (scaling every sample by c
    scales every window energy by c², preserving all comparisons) and
    robust to codec/bit-depth differences of the same recording. The 64
    bits pack into the same two 32-bit words as image_dhash, so
    fingerprints feed the shared banded pair join and knn_hamming.
    Payloads shorter than 65 samples drop. Narrow Arrow map, no
    shuffle."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_or_none(decode_wav_samples, payload)
                if dec is None or dec["n_frames"] < 65:
                    continue
                arr = dec["samples"].astype(np.int64)
                n, nch = arr.shape
                mono = np.floor_divide(arr.sum(axis=1), nch)
                bounds = (np.arange(66) * n + 64) // 65  # ceil(t*n/65)
                sq = np.concatenate(([0], np.cumsum(mono * mono)))
                energy = sq[bounds[1:]] - sq[bounds[:-1]]  # (65,)
                bits = (energy[:64] > energy[1:]).astype(np.int64)
                weights = 1 << np.arange(32, dtype=np.int64)
                dh0 = int((bits[:32] * weights).sum())
                dh1 = int((bits[32:] * weights).sum())
                rows.append((int(doc_id), dh0, dh1))
            yield pd.DataFrame(rows, columns=[id_col, "dh0", "dh1"])

    return payloads.mapInPandas(
        fp, schema=f"{id_col} long, dh0 long, dh1 long"
    )


def audio_neardup_pairs(
    payloads: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bucket: int | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs over the energy-envelope fingerprint —
    same contract, guarantees, and skew valve as image_neardup_pairs
    (the two share the banded pair join): (id_a, id_b, hamming) with
    id_a < id_b, every radius-≤3 pair found via the 4-chunk pigeonhole,
    `max_bucket` capping crowded chunks with the documented recall
    trade. The screen a speech/music training pipeline runs to drop
    re-encoded copies of the same recording before paying an acoustic
    embedding."""
    fps = audio_fingerprint(payloads, id_col=id_col, payload_col=payload_col)
    return _hamming_pairs_banded(fps, id_col, max_hamming, max_bucket)


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
                    id_col: pdf[id_col],
                    "media": metas,
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return payloads.mapInPandas(decode, schema=_decode_schema(id_col))


def sample_frames(
    payloads: DataFrame, every_n_bytes: int = 64, max_frames: int = 4,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one input payload → up to `max_frames`
    output rows (a 1:N mapInPandas expansion, the video frame-extraction
    shape). "Frames" here are deterministic byte windows — the
    codec-agnostic skeleton; REAL frame decode for AVI-MJPEG lives in
    decode_avi_frames/avi_frame_stats, which plug a true frame iterator
    into the same 1:N shape."""

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
                {id_col: ids, "frame_idx": idxs, "frame_md5": md5s,
                 "frame_bytes": sizes}
            )

    return payloads.mapInPandas(sample, schema=_frame_schema(id_col))


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
                    id_col: pdf[id_col],
                    "n_bytes": raw.map(len).astype("int64"),
                    "payload_md5": raw.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return payloads.mapInPandas(extract, schema=_feature_schema(id_col))
