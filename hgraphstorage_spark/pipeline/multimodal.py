"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-friendly batch iteration,
Arrow-batched UDF signatures) is real and tested. Decoding has two tiers:

- **Container/header probing is REAL**: pure-Python parsers read PNG /
  JPEG / GIF / BMP magic bytes + dimension fields and WAV RIFF headers
  (duration), so ``decode_ok``, ``codec``, ``width``, ``height`` and
  ``duration_ms`` come from the actual payload bytes — no media libraries
  needed.
- **Pixel/sample-level decode is tiered**: uncompressed BMP, 8-bit
  non-interlaced PNG (full filter reconstruction, pure stdlib-zlib +
  numpy), baseline AND progressive JPEG (``pipeline.jpeg``), GIF87a/89a
  first frames (``pipeline.gif``) and PCM WAV decode for REAL with no
  media libraries; remaining exotics (arithmetic/12-bit JPEG, interlaced
  PNG) decode for real when Pillow is installed (optional-import tier,
  ``_pil_image_module``); everything else raises NotImplementedError
  (real mode) or produces a deterministic fake (test mode), clearly
  marked.

Design for 100 TB of media:
- binary payloads stay opaque in parquet (no driver round-trips);
- per-batch processing via ``mapInPandas`` so one Arrow batch of blobs is
  decoded at a time (bounded executor memory, vectorized transfer);
- metadata (codec, width, height, duration) lives in a sibling struct
  column so planning-time filters (e.g. width > 512) prune without
  touching blobs — parquet column pruning does the rest.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def parse_media_header(payload: bytes | None) -> tuple[str, int | None, int | None, int | None] | None:
    """Pure-Python container probe: (codec, width, height, duration_ms)
    from real magic bytes, or None when no known container matches.

    Supports PNG (IHDR), JPEG (SOF0/1/2 marker walk), GIF (logical screen
    descriptor), BMP (BITMAPINFOHEADER) and WAV (RIFF fmt/data chunks).
    This is the decode step a 100 TB pipeline runs *first* — it needs only
    the leading bytes of each blob, catches corrupt/mislabeled payloads,
    and feeds the metadata pruning that keeps pixel decode off most rows.
    """
    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, None)
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to a SOFn frame header
        p = 2
        while p + 1 < len(b):
            if b[p] != 0xFF:
                return None
            # 0xFF fill bytes may pad before any marker (ITU T.81 B.1.1.2)
            while p + 1 < len(b) and b[p + 1] == 0xFF:
                p += 1
            if p + 1 >= len(b):
                return None
            marker = b[p + 1]
            # all SOFn variants carry the frame dimensions at the same
            # offsets; 0xC4 (DHT) / 0xC8 (JPG) / 0xCC (DAC) are not frames
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if p + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[p + 5 : p + 9])
                return ("jpeg", w, h, None)
            if marker == 0xD9:  # EOI before any frame header
                return None
            if marker == 0xDA:  # SOS before SOF: entropy data is unwalkable
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no length
                p += 2
                continue
            if marker == 0x00:  # stuffed byte — not a marker; malformed here
                return None
            if p + 4 > len(b):
                return None
            seg_len = struct.unpack(">H", b[p + 2 : p + 4])[0]
            if seg_len < 2:
                return None
            p += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, None)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h), None)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return _parse_mp4(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # walk chunks for fmt (byte rate) + data (payload size)
        p, byte_rate, data_size = 12, None, None
        while p + 8 <= len(b):
            cid = b[p : p + 4]
            size = struct.unpack("<I", b[p + 4 : p + 8])[0]
            if cid == b"fmt " and p + 16 + 8 <= len(b):
                byte_rate = struct.unpack("<I", b[p + 16 : p + 20])[0]
            elif cid == b"data":
                data_size = size
            p += 8 + size + (size & 1)
        if byte_rate and data_size is not None:
            return ("wav", None, None, data_size * 1000 // byte_rate)
        return None
    return None


def _parse_mp4(b: bytes) -> tuple[str, int | None, int | None, int | None] | None:
    """ISO-BMFF (MP4, ISO/IEC 14496-12) container probe: walk the box
    tree for mvhd (timescale/duration → duration_ms) and the first tkhd
    (16.16 fixed-point presentation width/height). Handles version 0 and
    1 full boxes, 64-bit ``largesize`` and size-0 (to-end) boxes;
    malformed sizes bail to None — the same never-silently-wrong tiering
    as every other probe. No sample data is touched: this is the
    metadata pass that prunes a 100 TB video corpus before any decode."""
    w = h = dur = None
    have_moov = False

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal w, h, dur, have_moov
        if depth > 4:
            return
        p = start
        while p + 8 <= end:
            (size,) = struct.unpack(">I", b[p : p + 4])
            typ = b[p + 4 : p + 8]
            hdr = 8
            if size == 1:
                if p + 16 > end:
                    return
                (size,) = struct.unpack(">Q", b[p + 8 : p + 16])
                hdr = 16
            elif size == 0:
                size = end - p
            if size < hdr or p + size > end:
                return
            body = p + hdr
            if typ == b"moov":
                have_moov = True
                walk(body, p + size, depth + 1)
            elif typ == b"trak":
                walk(body, p + size, depth + 1)
            elif typ == b"mvhd" and body + 4 <= p + size:
                ver = b[body]
                if ver == 0 and body + 20 <= p + size:
                    ts, du = struct.unpack(">II", b[body + 12 : body + 20])
                elif ver == 1 and body + 32 <= p + size:
                    (ts,) = struct.unpack(">I", b[body + 20 : body + 24])
                    (du,) = struct.unpack(">Q", b[body + 24 : body + 32])
                else:
                    ts = du = 0
                if ts:
                    dur = du * 1000 // ts
            elif typ == b"tkhd" and body + 4 <= p + size and w is None:
                ver = b[body]
                off = body + 4 + (32 if ver == 1 else 20) + 8 + 8 + 36
                if off + 8 <= p + size:
                    wi, he = struct.unpack(">II", b[off : off + 8])
                    if wi and he:
                        w, h = wi >> 16, he >> 16
            p += size

    walk(0, len(b), 0)
    return ("mp4", w, h, dur) if have_moov else None


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def mp4_bytes(width: int, height: int, duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal REAL ISO-BMFF skeleton (ftyp + moov[mvhd + trak[tkhd]])
    with genuine timescale/duration and 16.16 fixed-point dimensions —
    the test/synthetic counterpart of :func:`_parse_mp4` (a wrong writer
    OR parser breaks their round trip)."""
    dur = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x10000, 0x100, 0)
        + b"\x00" * 8
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    return ftyp + _box(b"moov", mvhd + _box(b"trak", tkhd))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    raw = ctype + data
    return struct.pack(">I", len(data)) + raw + struct.pack(">I", zlib.crc32(raw))


def png_bytes(width: int, height: int, pattern: bool = False) -> bytes:
    """Complete, valid 8-bit grayscale PNG — a real payload for tests and
    synthetic corpora, stdlib only. ``pattern=True`` fills a deterministic
    gradient instead of zeros, so pixel-level stats are content-derived."""
    if pattern:
        scanlines = b"".join(
            b"\x00" + bytes((x * 7 + y * 13) % 256 for x in range(width))
            for y in range(height)
        )
    else:
        scanlines = (b"\x00" + b"\x00" * width) * height
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def png_array_bytes(px: "np.ndarray") -> bytes:
    """Encode an (H, W[, C]) uint8 array as a complete valid PNG (8-bit,
    filter 0, C in {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}) — the
    re-encode half of the pure-numpy PNG path (stdlib zlib only)."""
    import numpy as np

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = np.zeros((h, 1 + w * c), dtype=np.uint8)
    body[:, 1:] = px.reshape(h, w * c)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body.tobytes()))
        + _png_chunk(b"IEND", b"")
    )


def jpeg_header_bytes(width: int, height: int) -> bytes:
    """JPEG SOI + APP0 + SOF0 header carrying real dimensions. The entropy
    stream is omitted (pixel decode would need a real codec); the header is
    what `parse_media_header` and any metadata pipeline consume."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def wav_bytes(duration_ms: int, byte_rate: int = 8000, pattern: bool = False) -> bytes:
    """Complete, valid PCM WAV with exact ``duration_ms`` (byte_rate 8000 →
    8 bytes/ms, so the duration round-trips exactly). ``pattern=True``
    fills a deterministic 8-bit sawtooth instead of silence, so
    sample-level stats are content-derived and reproducible."""
    n = duration_ms * byte_rate // 1000
    data = bytes((j * 17) % 256 for j in range(n)) if pattern else b"\x00" * n
    return _wav_wrap(data, byte_rate)  # resolved at call time (defined below)


def bmp_array_bytes(px: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 array (BGR channel order, as BMP stores
    it) as a complete 24-bit uncompressed bottom-up BMP."""
    import numpy as np

    h, w = px.shape[:2]
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1].reshape(h, w * 3)  # bottom-up row order
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + 40
    return b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off) + info + data


def bmp_bytes(width: int, height: int, pixel_fn=None) -> bytes:
    """Complete, valid 24-bit uncompressed BMP. ``pixel_fn(x, y) -> (b, g,
    r)`` defaults to a deterministic gradient, so pixel-level stats are
    content-derived and test-reproducible."""
    import numpy as np

    if pixel_fn is None:
        pixel_fn = lambda x, y: ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x + y) % 256)  # noqa: E731
    px = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        for x in range(width):
            px[y, x] = pixel_fn(x, y)
    return bmp_array_bytes(px)


def decode_bmp_pixels(payload: bytes | None) -> "np.ndarray | None":
    """REAL pixel decode for the uncompressed BMP family (BI_RGB, 8/24/32
    bpp) — pure numpy, no media libraries. Returns an (H, W, C) uint8
    array in stored channel order (BGR[A]; 8-bit returns C=1 raw palette
    indices), top row first, or None when the payload is not a BMP this
    decoder covers (compressed/16-bit variants stay honestly stubbed)."""
    import numpy as np

    if payload is None or len(payload) < 54:
        return None
    b = bytes(payload)
    if b[:2] != b"BM":
        return None
    off = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    comp = struct.unpack("<I", b[30:34])[0]
    if comp != 0 or bpp not in (8, 24, 32) or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    stride = ((bpp * w + 31) // 32) * 4
    if off + stride * height > len(b):
        return None
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=off).reshape(
        height, stride
    )
    nch = bpp // 8
    arr = arr[:, : w * nch].reshape(height, w, nch)
    return np.ascontiguousarray(arr if top_down else arr[::-1])


# Untrusted-payload ceiling: a crawl blob's header can declare any
# dimensions; decoding must never allocate unboundedly on an executor.
# 64 MP * 4 channels = 256 MB worst case per in-flight blob — bounded.
MAX_DECODE_PIXELS = 64_000_000


def decode_png_pixels(payload: bytes | None) -> "np.ndarray | None":
    """REAL pixel decode for PNG — pure stdlib zlib + numpy, no media
    libraries. Covers 8-bit-depth, non-interlaced images in color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — the
    overwhelming majority of web PNGs. Full filter reconstruction (None/
    Sub/Up/Average/Paeth per scanline, RFC 2083 §6). Returns an
    (H, W, C) uint8 array (palette expanded to RGB), top row first, or
    None for payloads outside this coverage (16-bit depth, interlaced —
    honestly tiered out, not silently wrong).

    Hardened for untrusted corpora: declared dimensions above
    ``MAX_DECODE_PIXELS`` return None before any allocation, and IDAT
    inflation is bounded to exactly the expected scanline bytes
    (``decompressobj`` with max_length), so a decompression bomb cannot
    expand past the header's own claim."""
    import numpy as np

    if payload is None or len(payload) < 45:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    depth, color_type, comp, filt, interlace = b[24:29]
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or w == 0 or h == 0:
        return None
    if w * h > MAX_DECODE_PIXELS:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        return None
    # walk chunks: concatenate IDAT, keep PLTE for palette expansion
    p, idat, plte = 8, [], None
    while p + 8 <= len(b):
        clen = struct.unpack(">I", b[p : p + 4])[0]
        ctype = b[p + 4 : p + 8]
        body = b[p + 8 : p + 8 + clen]
        if ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        p += 12 + clen  # len + type + crc
    if not idat or (color_type == 3 and (plte is None or len(plte) % 3)):
        return None
    stride = w * channels
    expected = h * (1 + stride)
    try:
        # bounded inflate: never expand beyond the scanline bytes the
        # header itself promises (decompression-bomb guard)
        raw = zlib.decompressobj().decompress(b"".join(idat), expected)
    except zlib.error:
        return None
    if len(raw) < expected:
        return None
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (1 + stride)).reshape(
        h, 1 + stride
    )
    ftypes, data = lines[:, 0], lines[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft, cur = int(ftypes[y]), data[y].copy()
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            rec = cur
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) >> 1
                else:  # Paeth
                    pa0 = left + up - ul
                    pa, pb, pc = abs(pa0 - left), abs(pa0 - up), abs(pa0 - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            return None  # invalid filter type
        out[y] = rec
        prev = rec
    px = out.astype(np.uint8).reshape(h, w, channels)
    if color_type == 3:  # expand palette indices to RGB
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            return None
        px = pal[idx]
    return np.ascontiguousarray(px)


def _pil_image_module():
    """Feature-detect Pillow. Returns the PIL.Image module or None — the
    tier gate for compressed codecs (JPEG/GIF) this container can't decode
    in pure numpy. Monkeypatchable in tests to pin both tiers."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def decode_image_pixels(payload: bytes | None) -> "np.ndarray | None":
    """Tiered image decode to an (H, W, C) uint8 array, or None:

    - BMP (uncompressed), PNG (8-bit non-interlaced), baseline AND
      progressive JPEG (SOF0/SOF2, common chroma samplings —
      ``pipeline.jpeg``) and GIF87a/89a first frames (``pipeline.gif``:
      full LZW + interlace): REAL pure-numpy decode, always available.
    - Everything else (arithmetic/12-bit JPEG, interlaced PNG, ...):
      real decode via Pillow WHEN INSTALLED (optional-import tier);
      None otherwise — same honest contract, never a fake.

    Channel order note: BMP arrays come back in stored BGR[A] order, PNG/
    PIL in RGB[A]; fine for the channel-agnostic stats/fingerprint
    consumers here — color-sensitive callers should branch on the codec.
    """
    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        px = decode_png_pixels(b)
        if px is not None:
            return px
        # fall through: a PNG outside pure-numpy coverage may still PIL-decode
    if b[:2] == b"\xff\xd8":
        from hgraphstorage_spark.pipeline.jpeg import decode_jpeg_pixels

        px = decode_jpeg_pixels(b)
        if px is not None:
            return px
        # fall through: progressive/arithmetic JPEGs may still PIL-decode
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from hgraphstorage_spark.pipeline.gif import decode_gif_pixels

        px = decode_gif_pixels(b)
        if px is not None:
            return px
        # fall through: out-of-coverage GIFs may still PIL-decode
    pil = _pil_image_module()
    if pil is not None:
        import io

        import numpy as np

        try:
            with pil.open(io.BytesIO(b)) as im:
                return np.ascontiguousarray(np.asarray(im.convert("RGB")))
        except Exception:
            return None
    return None


def decode_wav_samples(payload: bytes | None) -> "np.ndarray | None":
    """REAL sample decode for PCM WAV (8-bit unsigned / 16-bit signed) —
    pure numpy. Returns float64 samples normalized to [-1, 1] (channels
    interleaved), or None for non-PCM / other bit depths."""
    import numpy as np

    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    p, fmt, data = 12, None, None
    while p + 8 <= len(b):
        cid = b[p : p + 4]
        size = struct.unpack("<I", b[p + 4 : p + 8])[0]
        body = b[p + 8 : p + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        p += 8 + size + (size & 1)
    if fmt is None or data is None:
        return None
    audio_fmt, _nch, _rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        return None
    if bits == 8:
        return (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n = len(data) // 2
    return np.frombuffer(data, dtype="<i2", count=n).astype(np.float64) / 32768.0


PROBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def probe_metadata(media: DataFrame) -> DataFrame:
    """REAL header probe over Arrow batches: verified codec/dimensions/
    duration from the payload bytes (NULL + decode_ok=false when no
    container parses — corrupt or unsupported, e.g. raw video streams).
    Declared metadata in ``meta`` can lie; this column set is ground truth
    recovered from bytes, and is the pruning input for pixel-level work."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codecs, ws, hs, ds, oks = [], [], [], [], []
            for payload in pdf["payload"]:
                parsed = parse_media_header(payload)
                if parsed is None:
                    codecs.append(None), ws.append(None), hs.append(None), ds.append(None)
                    oks.append(False)
                else:
                    c, w, h, d = parsed
                    codecs.append(c), ws.append(w), hs.append(h), ds.append(d)
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "codec": codecs,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pd.array(ds, dtype="Int64"),
                    "decode_ok": oks,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=PROBED_SCHEMA)


def _decode_stub(payload: bytes, kind: str, fake: bool) -> list[float] | None:
    """Feature extraction per blob. Real mode is tiered by codec:

    - **BMP / PNG / PCM-WAV: fully real.** Pixels / samples are decoded in
      pure numpy (``decode_bmp_pixels`` / ``decode_png_pixels`` /
      ``decode_wav_samples``) and the last four feature dims are content
      statistics (mean, min, max, std/rms of the actual pixel or sample
      values) — no digest fakery.
    - **JPEG / GIF: real via Pillow when installed** (optional-import
      tier, ``_pil_image_module``); without it, dimensions are real
      (parsed bytes) and the tail dims fall back to a payload digest.
    - No recognized container → NotImplementedError (honest stub).

    ``fake=True`` keeps the legacy deterministic md5 feature so plumbing
    tests run on arbitrary bytes."""
    if payload is None:
        return None
    digest = hashlib.md5(bytes(payload)).digest()
    if fake:
        return [b / 255.0 for b in digest[:8]]
    parsed = parse_media_header(payload)
    if parsed is None:
        raise NotImplementedError(
            "no container header recognized; pixel-level decode requires media libs not present here"
        )
    codec, w, h, d = parsed
    head = [
        float(w or 0),
        float(h or 0),
        float(w) / float(h) if w and h else 0.0,
        float(d or 0) / 1000.0,
    ]
    if codec in ("bmp", "png", "jpeg", "gif"):
        px = decode_image_pixels(payload)
        if px is not None:
            vals = px.astype("float64") / 255.0
            return head + [
                float(vals.mean()),
                float(vals.min()),
                float(vals.max()),
                float(vals.std()),
            ]
    if codec == "wav":
        x = decode_wav_samples(payload)
        if x is not None and x.size:
            return head + [
                float(x.mean()),
                float(x.min()),
                float(x.max()),
                float((x**2).mean() ** 0.5),  # RMS
            ]
    return head + [b / 255.0 for b in digest[:4]]


def extract_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Decode + feature-extract each blob, one Arrow batch at a time.

    ``mapInPandas`` keeps peak memory at one batch of blobs per task;
    payload column is only read where decode actually runs (filter/prune
    metadata *before* calling this)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    f = _decode_stub(payload, kind, fake_decode)
                    feats.append(f)
                    oks.append(f is not None)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resize_ok", T.BooleanType(), False),
    ]
)


def resize_images(
    media: DataFrame, max_w: int = 256, max_h: int = 256, fake_decode: bool = False
) -> DataFrame:
    """Resize image payloads to fit (max_w, max_h), aspect-preserving.

    Same execution shape as `extract_features`: metadata-only pre-filter
    (images already small enough pass through without payload decode —
    checked from the meta struct, prunable at plan time), then
    ``mapInPandas`` over Arrow batches for the rest. Pixel work is tiered
    through ``decode_image_pixels``: **uncompressed BMP and 8-bit PNG
    resize for REAL** (numpy nearest-neighbor over the decoded array;
    BMP re-encodes as BMP, everything else as PNG via
    ``png_array_bytes``), JPEG/GIF resize for real when Pillow is
    installed; otherwise real mode marks them failed and fake mode
    returns the original bytes with the computed target dimensions so
    the partitioning/batch-shape plumbing stays testable.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h, oks = [], [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if payload is None or pd.isna(w) or pd.isna(h):
                    out_payload.append(None), out_w.append(None), out_h.append(None)
                    oks.append(False)
                    continue
                px = None if fake_decode else decode_image_pixels(payload)
                if px is not None:
                    # real path: use the DECODED dims (declared meta can lie)
                    sh, sw = px.shape[:2]
                    scale = min(max_w / sw, max_h / sh, 1.0)
                    tw, th = max(1, int(sw * scale)), max(1, int(sh * scale))
                    yi = (np.arange(th) * sh) // th  # nearest-neighbor grid
                    xi = (np.arange(tw) * sw) // tw
                    small = px[yi][:, xi]
                    is_bmp = bytes(payload)[:2] == b"BM"
                    if is_bmp and small.shape[2] == 3:
                        enc = bmp_array_bytes(small)
                    else:
                        # BMP arrays arrive in stored BGR[A] order; PNG is
                        # RGB[A] — swap before crossing container formats
                        # (3-channel BMPs re-encode as BMP above, so only
                        # the 4-channel BMP case crosses into PNG)
                        if is_bmp and small.shape[2] == 4:
                            small = small[..., [2, 1, 0, 3]]
                        enc = png_array_bytes(small)
                    out_payload.append(enc)
                    out_w.append(tw), out_h.append(th)
                    oks.append(True)
                    continue
                scale = min(max_w / int(w), max_h / int(h), 1.0)
                tw, th = max(1, int(int(w) * scale)), max(1, int(int(h) * scale))
                if not fake_decode:
                    out_payload.append(None), out_w.append(tw), out_h.append(th)
                    oks.append(False)  # NotImplemented: this codec needs PIL
                    continue
                out_payload.append(bytes(payload)), out_w.append(tw), out_h.append(th)
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": out_w,
                    "height": out_h,
                    "resize_ok": oks,
                }
            )

    images = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planning-side frame sampling for video: expand each video row into
    (media_id, frame_ts_ms) rows using metadata only — no payload access,
    so the planner can partition decode work before touching bytes."""
    return (
        media.filter((F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL payload bytes: images carry
    actual PNG files / 24-bit BMPs / baseline JPEGs (``pipeline.jpeg``
    encoder) with real pixel gradients (every 15th image is corrupt
    garbage — its declared meta lies, which the header probe must catch),
    audio rows are complete PCM WAVs with a deterministic sawtooth
    waveform, video rows are real ISO-BMFF (MP4) skeletons with genuine
    mvhd duration + tkhd dimensions (every 15th-from-2 video is corrupt
    garbage; sample data is absent by design — the probe is a metadata
    pass, pixel decode for video honestly tiers out)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            if i % 15 == 0:  # corrupt: declared png, payload is garbage
                payload = hashlib.sha256(str(i).encode()).digest() * 4
            elif i % 6 == 0:
                payload = png_bytes(64 + i, 48 + i)
            elif i % 12 == 9:  # real pixels: the fully-decodable family
                payload = bmp_bytes(64 + i, 48 + i)
            else:
                import numpy as np

                from hgraphstorage_spark.pipeline.jpeg import encode_jpeg_gray

                px = np.fromfunction(
                    lambda y, x: (x * 7 + y * 13) % 256, (48 + i, 64 + i)
                ).astype("uint8")
                payload = encode_jpeg_gray(px)
        elif kind == "audio":
            payload = wav_bytes(5000 + i * 100, pattern=True)
        elif i % 15 == 2:  # corrupt video: declared mp4, payload is garbage
            payload = hashlib.sha256(str(i).encode()).digest() * 4
        else:  # real ISO-BMFF skeleton: mvhd duration + tkhd dimensions
            payload = mp4_bytes(64 + i, 48 + i, 5000 + i * 100)
        meta = {
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[kind],
            "width": 64 + i if kind != "audio" else None,
            "height": 48 + i if kind != "audio" else None,
            "duration_ms": 5000 + i * 100 if kind != "image" else None,
        }
        rows.append({"media_id": i, "kind": kind, "payload": payload, "meta": meta})
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def dhash_bits(px: "np.ndarray") -> int:
    """64-bit difference hash (dHash) of a decoded pixel array: grayscale
    -> 9x8 area downsample -> horizontal gradient sign per cell. The
    standard perceptual image fingerprint: stable under resize,
    re-encode, and small edits; near-duplicates differ in a few bits
    (compare with ``pipeline.dedup.hamming64``). Deterministic pure
    numpy (integer block means, no interpolation ambiguity)."""
    import numpy as np

    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # area downsample to 8 rows x 9 cols via block means over index bins
    rows = np.linspace(0, h, 9).astype(int)
    cols = np.linspace(0, w, 10).astype(int)
    small = np.empty((8, 9))
    for i in range(8):
        for j in range(9):
            block = gray[rows[i] : max(rows[i + 1], rows[i] + 1),
                         cols[j] : max(cols[j + 1], cols[j] + 1)]
            small[i, j] = block.mean()
    bits = 0
    k = 0
    for i in range(8):
        for j in range(8):
            if small[i, j + 1] > small[i, j]:
                bits |= 1 << k
            k += 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed 64-bit


def wav_energy_bits(x: "np.ndarray") -> int:
    """64-bit audio energy fingerprint for decoded PCM samples: RMS
    energy over 65 equal windows, one bit per consecutive-window energy
    increase — the time-domain analogue of dHash (robust to gain changes
    since only the energy ORDER matters). Deterministic pure numpy."""
    import numpy as np

    n = x.size
    if n == 0:
        return 0
    bounds = np.linspace(0, n, 66).astype(int)
    e = np.empty(65)
    for i in range(65):
        seg = x[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        e[i] = float((seg**2).mean())
    bits = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            bits |= 1 << k
    return bits - (1 << 64) if bits >= (1 << 63) else bits


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("fingerprint", T.LongType(), True),
        T.StructField("fp_ok", T.BooleanType(), False),
    ]
)


def media_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual fingerprints per blob, Arrow batch at a time: dHash for
    REAL-decodable images (uncompressed BMP + 8-bit PNG pure-numpy;
    JPEG/GIF when Pillow is installed), the energy signature for
    REAL-decodable audio (PCM WAV). Codecs outside the decode tier yield
    NULL with fp_ok=false — the same honest tiering as
    ``extract_features``. Near-dup media = small ``hamming64`` distance
    between fingerprints; bucket on the fingerprint for exact-match
    streaming dedup (``stream_near_dedup`` shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                fp = None
                px = decode_image_pixels(payload)
                if px is not None:
                    fp = dhash_bits(px)
                else:
                    x = decode_wav_samples(payload)
                    if x is not None:
                        fp = wav_energy_bits(x)
                fps.append(fp)
                oks.append(fp is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "fingerprint": pd.array(fps, dtype="Int64"),
                    "fp_ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FINGERPRINT_SCHEMA)


def media_near_dup_pairs(
    media: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate MEDIA pairs: perceptual fingerprints
    (:func:`media_fingerprints` — image dHash over decoded pixels,
    audio energy signature over PCM frames) through the generic
    banded-Hamming pair core (``dedup.hamming_near_dup_pairs``, Manku
    WWW'07 pigeonhole blocking — lossless at hamming <= bands-1).
    Pairs form only within the same ``kind`` (image dHash never pairs
    with a numerically-close audio hash); undecodable payloads
    (fp_ok=false) never pair. Near-dup images = re-encodes, resizes,
    minor edits of the same picture — the image-side analogue of text
    MinHash dedup.

    Returns (media_a, media_b, hamming BIGINT), media_a < media_b.

    Scale shape: fingerprinting is one Arrow-batched mapInPandas pass;
    everything after is integer-keyed joins on 8-byte band keys — no
    pixel data ever shuffles."""
    from hgraphstorage_spark.pipeline.dedup import hamming_near_dup_pairs

    fps = media_fingerprints(media).filter(F.col("fp_ok"))
    return (
        hamming_near_dup_pairs(
            fps,
            fp_col="fingerprint",
            id_col="media_id",
            max_distance=max_distance,
            bands=bands,
            max_band_freq=max_band_freq,
            block_col="kind",
        )
        .withColumnRenamed("doc_a", "media_a")
        .withColumnRenamed("doc_b", "media_b")
    )


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("spectral_centroid", T.DoubleType(), True),
        T.StructField("spectral_bandwidth", T.DoubleType(), True),
        T.StructField("spectral_rolloff", T.DoubleType(), True),
        T.StructField("spectral_flatness", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_spectral_features(
    media: DataFrame, n_fft: int = 256, hop: int = 128
) -> DataFrame:
    """REAL spectral features per audio row — the routing/quality signal
    an audio-curation pipeline gates on (speech/music/noise
    discrimination, clipped or silent uploads): decode PCM samples
    (``decode_wav_samples``), frame with a Hann window, magnitude rfft,
    then the standard spectrogram summary statistics over the mean power
    spectrum — spectral centroid, bandwidth, 85% rolloff (all in
    normalized frequency, 0..0.5 = Nyquist) and flatness
    (geometric/arithmetic mean ratio — ~1 for noise, ~0 for tones).

    All pure numpy inside ``mapInPandas`` Arrow batches — the same
    bounded-memory executor shape as every media operator here;
    deterministic, rounded to 6 decimals. Non-WAV / non-PCM payloads
    come back decode_ok=false with NULL features (honest tier-out)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        freqs = np.arange(n_fft // 2 + 1) / n_fft  # normalized bins
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_frames", "spectral_centroid",
                                   "spectral_bandwidth", "spectral_rolloff",
                                   "spectral_flatness", "decode_ok")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                x = None if payload is None else decode_wav_samples(payload)
                if x is None or len(x) < n_fft:
                    for k in ("n_frames", "spectral_centroid", "spectral_bandwidth",
                              "spectral_rolloff", "spectral_flatness"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                n_frames = 1 + (len(x) - n_fft) // hop
                idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
                spec = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1))
                power = (spec ** 2).mean(axis=0)
                total = power.sum()
                if total <= 0:
                    centroid = bandwidth = rolloff = 0.0
                    flatness = 1.0
                else:
                    p = power / total
                    centroid = float((freqs * p).sum())
                    bandwidth = float(np.sqrt((((freqs - centroid) ** 2) * p).sum()))
                    rolloff = float(freqs[np.searchsorted(np.cumsum(p), 0.85)])
                    eps = 1e-12
                    flatness = float(
                        np.exp(np.log(power + eps).mean()) / (power.mean() + eps)
                    )
                out["n_frames"].append(n_frames)
                out["spectral_centroid"].append(round(centroid, 6))
                out["spectral_bandwidth"].append(round(bandwidth, 6))
                out["spectral_rolloff"].append(round(rolloff, 6))
                out["spectral_flatness"].append(round(flatness, 6))
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(run, schema=AUDIO_SPECTRAL_SCHEMA)


def _wav_wrap(data: bytes, byte_rate: int) -> bytes:
    """RIFF/fmt/data container around raw 8-bit PCM — the single copy of
    the WAV header layout all three builders (``wav_bytes``,
    ``wav_tone_bytes``, ``wav_sequence_bytes``) delegate to."""
    fmt = struct.pack("<HHIIHH", 1, 1, byte_rate, byte_rate, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def wav_tone_bytes(
    duration_ms: int, freqs_hz: tuple = (500.0,), byte_rate: int = 8000
) -> bytes:
    """Valid 8-bit PCM WAV carrying a deterministic sum of sine tones —
    the content-bearing counterpart to ``wav_bytes``'s sawtooth, for
    fingerprint/match fixtures where two tracks must be spectrally
    DISTINCT and a shifted excerpt must still align."""
    import numpy as np

    if not freqs_hz:
        raise ValueError("freqs_hz must be non-empty")
    n = duration_ms * byte_rate // 1000
    t = np.arange(n, dtype=np.float64) / byte_rate
    x = sum(np.sin(2.0 * np.pi * f * t) for f in freqs_hz) / len(freqs_hz)
    data = (128.0 + 100.0 * x).clip(0, 255).astype(np.uint8).tobytes()
    return _wav_wrap(data, byte_rate)


def wav_sequence_bytes(
    freq_steps: tuple, step_ms: int = 250, byte_rate: int = 8000
) -> bytes:
    """8-bit PCM WAV of CONSECUTIVE single tones (one per entry of
    ``freq_steps``) — non-stationary by construction. Pure periodic
    tones are shift-invariant (an excerpt re-aligns at offset 0), so
    fingerprint offset tests need content that CHANGES over time; a
    tone sequence is the minimal such signal."""
    import numpy as np

    if not freq_steps:
        raise ValueError("freq_steps must be non-empty")
    n_step = step_ms * byte_rate // 1000
    t = np.arange(n_step, dtype=np.float64) / byte_rate
    x = np.concatenate([np.sin(2.0 * np.pi * f * t) for f in freq_steps])
    data = (128.0 + 100.0 * x).clip(0, 255).astype(np.uint8).tobytes()
    return _wav_wrap(data, byte_rate)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp_hash", T.LongType(), False),
        T.StructField("t1", T.IntegerType(), False),
    ]
)


def audio_fingerprints(
    media: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fan_out: int = 5,
    max_dt: int = 32,
) -> DataFrame:
    """Landmark audio fingerprints (the Shazam constellation scheme,
    Wang ISMIR 2003): per STFT frame take the ``peaks_per_frame``
    strongest bins (ties to the lower bin — deterministic), then pair
    every peak with the next ``fan_out`` peaks landing within ``max_dt``
    frames; each pair packs into one BIGINT landmark

        fp_hash = f1 << 16 | f2 << 8 | dt

    anchored at frame ``t1``. A shifted or re-encoded excerpt reproduces
    the same (hash, t) set shifted by a constant — which is exactly what
    :func:`audio_match` votes on.

    Pure numpy inside ``mapInPandas`` Arrow batches; non-PCM payloads
    tier out silently (no rows). Returns (media_id, fp_hash, t1)."""
    import numpy as np

    # the packing gives f2 and dt 8-bit fields: reject parameterizations
    # that would silently corrupt hashes (bin indices reach n_fft//2)
    if n_fft // 2 > 255:
        raise ValueError(f"n_fft must be <= 510 for the 8-bit f2 field, got {n_fft}")
    if max_dt > 255:
        raise ValueError(f"max_dt must be <= 255 for the 8-bit dt field, got {max_dt}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        for pdf in batches:
            mids, hashes, t1s = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = None if payload is None else decode_wav_samples(payload)
                if x is None or len(x) < n_fft:
                    continue
                n_frames = 1 + (len(x) - n_fft) // hop
                idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
                spec = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1))
                # per-frame top-k bins, ties to the LOWER bin: stable sort
                # on (-magnitude, bin)
                peaks = []  # (t, f) in (t, f) order
                for t in range(n_frames):
                    mag = spec[t]
                    order = np.lexsort((np.arange(len(mag)), -mag))
                    peaks.extend((t, int(f)) for f in sorted(order[:peaks_per_frame]))
                # index loop, not a peaks[i+1:] slice: the early break
                # after ~fan_out pairs must stay O(1) per anchor, not an
                # O(P) tail copy (O(P^2) on real-length audio)
                n_peaks = len(peaks)
                for i in range(n_peaks):
                    ta, fa = peaks[i]
                    paired = 0
                    for j in range(i + 1, n_peaks):
                        tb, fb = peaks[j]
                        dt = tb - ta
                        if dt <= 0:
                            continue
                        if dt > max_dt or paired >= fan_out:
                            break
                        mids.append(mid)
                        hashes.append((fa << 16) | (fb << 8) | dt)
                        t1s.append(ta)
                        paired += 1
            yield pd.DataFrame({"media_id": mids, "fp_hash": hashes, "t1": t1s})

    audio = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return audio.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


def audio_match(
    corpus_fp: DataFrame, probe_fp: DataFrame, min_votes: int = 3
) -> DataFrame:
    """Match probe fingerprints against a corpus fingerprint index by
    offset voting: equal landmarks joined on the 8-byte hash, each vote
    cast for (probe, track, t_corpus − t_probe); a true match piles its
    votes on ONE offset, random collisions scatter. Per probe, the
    (track, offset) with the most votes wins (ties → lower track id,
    then lower offset — deterministic).

    Scale shape: the corpus is touched only through its (media_id,
    fp_hash, t1) index (persist it once, reuse per probe batch); the
    join shuffles on the 8-byte hash with map-side-combined votes; the
    final argmax is a per-probe min_by, no window. All integer
    arithmetic — a SQL oracle replays the vote and the argmax exactly.

    Returns (probe_id, track_id, offset, votes) for probes whose best
    candidate reaches ``min_votes``."""
    p = probe_fp.select(
        F.col("media_id").alias("probe_id"),
        F.col("fp_hash"),
        F.col("t1").alias("_tp"),
    )
    c = corpus_fp.select(
        F.col("media_id").alias("track_id"),
        F.col("fp_hash"),
        F.col("t1").alias("_tc"),
    )
    votes = (
        p.join(c, "fp_hash")
        .select("probe_id", "track_id", (F.col("_tc") - F.col("_tp")).alias("offset"))
        .groupBy("probe_id", "track_id", "offset")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = (
        votes.groupBy("probe_id")
        .agg(
            F.min_by(
                F.struct("track_id", "offset", "votes"),
                F.struct(
                    (-F.col("votes")).alias("o1"),
                    F.col("track_id").alias("o2"),
                    F.col("offset").alias("o3"),
                ),
            ).alias("b")
        )
        .select(
            "probe_id",
            F.col("b.track_id").alias("track_id"),
            F.col("b.offset").alias("offset"),
            F.col("b.votes").alias("votes"),
        )
    )
    return best.filter(F.col("votes") >= min_votes)


def mp4_sampled_bytes(
    width: int,
    height: int,
    n_samples: int,
    fps: int = 10,
    samples_per_chunk: int = 4,
    sync_every: int = 5,
    timescale: int = 1000,
) -> bytes:
    """REAL ISO-BMFF file WITH a sample table (moov/trak/mdia/minf/stbl:
    stts + stsc + stsz + stco + stss) and an mdat whose per-sample bytes
    are deterministic — the writer twin of
    :func:`_parse_mp4_sample_table`. Uniform frame rate (one stts run),
    per-sample sizes 20 + (i mod 7), chunks of ``samples_per_chunk``,
    sync samples every ``sync_every`` starting at 1. Two-pass build:
    stco needs absolute file offsets, so the moov is assembled once with
    placeholder offsets to measure, then rebuilt with the real ones."""
    delta = timescale // fps
    dur = n_samples * delta
    sizes = [20 + (i % 7) for i in range(n_samples)]
    syncs = list(range(1, n_samples + 1, sync_every))
    n_chunks = (n_samples + samples_per_chunk - 1) // samples_per_chunk

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x10000, 0x100, 0)
        + b"\x00" * 8
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00",
    )
    stts = _box(
        b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, n_samples, delta)
    )
    stsc = _box(
        b"stsc",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 1, samples_per_chunk, 1),
    )
    stsz = _box(
        b"stsz",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stss = _box(
        b"stss",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", len(syncs))
        + b"".join(struct.pack(">I", s) for s in syncs),
    )

    def build(chunk_offsets: list) -> bytes:
        stco = _box(
            b"stco",
            b"\x00\x00\x00\x00"
            + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl = _box(b"stbl", stts + stsc + stsz + stco + stss)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    moov_len = len(build([0] * n_chunks))
    mdat_body_at = len(ftyp) + moov_len + 8  # mdat header is 8 bytes
    chunk_offsets, acc = [], mdat_body_at
    for c in range(n_chunks):
        chunk_offsets.append(acc)
        for s in sizes[c * samples_per_chunk : (c + 1) * samples_per_chunk]:
            acc += s
    mdat_body = b"".join(
        bytes(((i * 31 + j) % 256) for j in range(sz)) for i, sz in enumerate(sizes)
    )
    return ftyp + build(chunk_offsets) + _box(b"mdat", mdat_body)


def _parse_mp4_sample_table(b: bytes):
    """Walk the FIRST VIDEO track's sample table (ISO/IEC 14496-12 §8.5
    onward): stts decode times, stsz sizes, stsc sample->chunk runs,
    stco/co64 chunk offsets, stss sync set (absent = all sync). Each
    trak's boxes are collected in ISOLATION (a two-track file with the
    audio trak first must not mix tracks); the track is chosen by its
    hdlr handler_type == 'vide', falling back to the first trak only
    when NO trak carries an hdlr. Returns a list of (sample_idx, ts_ms,
    byte_offset, size, is_sync) or None if any required box is
    missing/malformed — the same never-silently-wrong tiering as the
    probes. Only metadata bytes are touched."""
    traks: list = []  # each: {"handler": bytes|None, "timescale": int|None, boxes...}

    def walk(start: int, end: int, depth: int, trak: dict | None) -> None:
        if depth > 6:
            return
        p = start
        while p + 8 <= end:
            (size,) = struct.unpack(">I", b[p : p + 4])
            typ = b[p + 4 : p + 8]
            hdr = 8
            if size == 1:
                if p + 16 > end:
                    return
                (size,) = struct.unpack(">Q", b[p + 8 : p + 16])
                hdr = 16
            elif size == 0:
                size = end - p
            if size < hdr or p + size > end:
                return
            body = p + hdr
            if typ == b"trak":
                t: dict = {"handler": None, "timescale": None}
                traks.append(t)
                walk(body, p + size, depth + 1, t)
            elif typ in (b"moov", b"mdia", b"minf", b"stbl"):
                walk(body, p + size, depth + 1, trak)
            elif trak is not None and typ == b"hdlr" and body + 12 <= p + size:
                trak["handler"] = b[body + 8 : body + 12]
            elif (
                trak is not None
                and typ == b"mdhd"
                and trak["timescale"] is None
                and body + 4 <= p + size
            ):
                ver = b[body]
                if ver == 0 and body + 16 <= p + size:
                    (trak["timescale"],) = struct.unpack(">I", b[body + 12 : body + 16])
                elif ver == 1 and body + 24 <= p + size:
                    (trak["timescale"],) = struct.unpack(">I", b[body + 20 : body + 24])
            elif trak is not None and typ in (
                b"stts", b"stsz", b"stsc", b"stco", b"co64", b"stss",
            ):
                trak.setdefault(typ, b[body : p + size])
            p += size

    walk(0, len(b), 0, None)
    video = [t for t in traks if t["handler"] == b"vide"]
    if video:
        chosen = video[0]
    elif traks and all(t["handler"] is None for t in traks):
        chosen = traks[0]  # no hdlr anywhere: single-track legacy layout
    else:
        return None  # hdlr boxes exist but none is video
    boxes = chosen
    ts = chosen["timescale"]
    if ts in (None, 0) or not all(k in boxes for k in (b"stts", b"stsz", b"stsc")):
        return None
    if b"stco" not in boxes and b"co64" not in boxes:
        return None

    def u32s(raw: bytes, off: int, n: int):
        return struct.unpack(f">{n}I", raw[off : off + 4 * n])

    try:
        # stts -> per-sample decode time
        raw = boxes[b"stts"]
        (n_ent,) = u32s(raw, 4, 1)
        deltas = []
        off = 8
        for _ in range(n_ent):
            cnt, dlt = u32s(raw, off, 2)
            deltas.extend([dlt] * cnt)
            off += 8
        n = len(deltas)
        # stsz -> sizes
        raw = boxes[b"stsz"]
        fixed, cnt = u32s(raw, 4, 2)
        if cnt != n:
            return None
        sizes = [fixed] * n if fixed else list(u32s(raw, 12, n))
        # stco / co64 -> chunk offsets
        if b"stco" in boxes:
            raw = boxes[b"stco"]
            (nch,) = u32s(raw, 4, 1)
            offs = list(u32s(raw, 8, nch))
        else:
            raw = boxes[b"co64"]
            (nch,) = u32s(raw, 4, 1)
            offs = list(struct.unpack(f">{nch}Q", raw[8 : 8 + 8 * nch]))
        # stsc -> samples per chunk, run-length (first_chunk is 1-based)
        raw = boxes[b"stsc"]
        (n_ent,) = u32s(raw, 4, 1)
        runs = [u32s(raw, 8 + 12 * i, 3) for i in range(n_ent)]
        spc = []
        for i, (first, per, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else nch
            spc.extend([per] * (last - first + 1))
        if len(spc) != nch:
            return None
        # stss -> sync set (absent = every sample)
        if b"stss" in boxes:
            raw = boxes[b"stss"]
            (n_sync,) = u32s(raw, 4, 1)
            sync = set(u32s(raw, 8, n_sync))
        else:
            sync = None
        out, si, t = [], 0, 0
        for c in range(nch):
            within = offs[c]
            for _ in range(spc[c]):
                if si >= n:
                    break
                out.append(
                    (
                        si,
                        t * 1000 // ts,
                        within,
                        sizes[si],
                        sync is None or (si + 1) in sync,
                    )
                )
                within += sizes[si]
                t += deltas[si]
                si += 1
        if si != n:
            return None
        return out
    except (struct.error, IndexError):
        return None


VIDEO_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("size", T.IntegerType(), False),
        T.StructField("is_sync", T.BooleanType(), False),
    ]
)


def video_sample_table(media: DataFrame) -> DataFrame:
    """Per-sample byte-range table for every parseable video row —
    the REAL planning input a distributed frame extractor needs: with
    (byte_offset, size) per sample, executors can range-read exactly the
    frames a plan selects instead of shipping whole files. Metadata-only
    (no mdat bytes decoded); unparseable videos contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("media_id", "sample_idx", "ts_ms",
                                    "byte_offset", "size", "is_sync")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                table = None if payload is None else _parse_mp4_sample_table(bytes(payload))
                if not table:
                    continue
                for si, ts_ms, off, sz, sync in table:
                    cols["media_id"].append(mid)
                    cols["sample_idx"].append(si)
                    cols["ts_ms"].append(ts_ms)
                    cols["byte_offset"].append(off)
                    cols["size"].append(sz)
                    cols["is_sync"].append(bool(sync))
            yield pd.DataFrame(cols)

    video = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return video.mapInPandas(run, schema=VIDEO_SAMPLE_SCHEMA)


def video_frame_plan(
    sample_table: DataFrame, every_ms: int = 1000, sync_only: bool = True
) -> DataFrame:
    """Keyframe-aligned frame-sampling plan from a sample table: for
    each media and each target timestamp (0, every_ms, 2*every_ms, ...
    up to the last sample) pick the LATEST (sync) sample at or before
    the target — the seek semantics every video decoder implements.

    Pure DataFrame ops: targets come from a per-media sequence over the
    max timestamp (one tiny agg), the pick is a media-keyed equi-join
    with a ts <= target predicate folded into a per-(media, target)
    max_by argmax — no window over data, no payload access. Returns
    (media_id, target_ms, sample_idx, ts_ms, byte_offset, size)."""
    pool = sample_table.filter(F.col("is_sync")) if sync_only else sample_table
    spans = pool.groupBy("media_id").agg(F.max("ts_ms").alias("_max_ts"))
    targets = spans.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_max_ts"), F.lit(every_ms).cast("long"))
        ).alias("target_ms"),
    )
    joined = targets.join(pool, "media_id").filter(F.col("ts_ms") <= F.col("target_ms"))
    return (
        joined.groupBy("media_id", "target_ms")
        .agg(
            F.max_by(
                F.struct("sample_idx", "ts_ms", "byte_offset", "size"),
                F.struct(F.col("ts_ms").alias("o1"), F.col("sample_idx").alias("o2")),
            ).alias("s")
        )
        .select(
            "media_id",
            "target_ms",
            F.col("s.sample_idx").alias("sample_idx"),
            F.col("s.ts_ms").alias("ts_ms"),
            F.col("s.byte_offset").alias("byte_offset"),
            F.col("s.size").alias("size"),
        )
    )
