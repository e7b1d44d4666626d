"""Pure-numpy baseline JPEG codec tests (pipeline.jpeg): round-trip error
bounds for the encoder+decoder pair, hand-built color streams checked
against the BT.601 arithmetic, sampling-grid placement, and honest None
for modes outside the baseline tier."""

from __future__ import annotations

import struct

import numpy as np

from hgraphstorage_spark.pipeline.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    STD_LUMA_QUANT,
    _BitWriter,
    _encode_codes,
    decode_jpeg_pixels,
    encode_jpeg_gray,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _tables_segments() -> bytes:
    dqt = _seg(0xDB, bytes([0]) + bytes(int(v) for v in STD_LUMA_QUANT))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    return dqt + dht


def _dc_only_block(writer, dc_codes, ac_codes, diff: int) -> None:
    s = int(abs(diff)).bit_length()
    code, length = dc_codes[s]
    writer.bits(code, length)
    if s:
        writer.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
    code, length = ac_codes[0x00]  # EOB
    writer.bits(code, length)


class TestGrayRoundTrip:
    def test_constant_image_exact(self):
        px = np.full((16, 24), 100, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_gray(px))
        assert dec.shape == (16, 24, 1)
        assert np.abs(dec[:, :, 0].astype(int) - 100).max() == 0

    def test_smooth_gradient_tight_bound(self):
        """A smooth (non-wrapping) gradient has little high-frequency
        energy; Q50 quantization error stays small everywhere."""
        px = np.fromfunction(lambda y, x: x * 2 + y, (32, 40)).astype(np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_gray(px))
        err = np.abs(dec[:, :, 0].astype(int) - px.astype(int))
        assert err.mean() < 3 and err.max() < 20

    def test_non_multiple_of_8_dims(self):
        px = np.fromfunction(lambda y, x: (x + y) // 2, (13, 19)).astype(np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_gray(px))
        assert dec.shape == (13, 19, 1)

    def test_noise_error_bounded_by_quant_energy(self):
        rng = np.random.RandomState(0)
        px = rng.randint(0, 256, (24, 24), dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_gray(px))
        err = np.abs(dec[:, :, 0].astype(int) - px.astype(int))
        # worst-case per-coefficient quantization error is qt/2; the IDCT
        # spreads it — mean error stays far below the raw pixel scale
        assert err.mean() < 30


class TestColorDecode:
    def _color_jpeg_444(self, qy: int, qcb: int, qcr: int) -> bytes:
        """Hand-built 8x8 4:4:4 color JPEG: three DC-only blocks sharing
        the Annex K luminance tables."""
        sof = _seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        dc_codes = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_codes = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        w = _BitWriter()
        for q in (qy, qcb, qcr):
            _dc_only_block(w, dc_codes, ac_codes, q)  # pred=0 per component
        w.flush()
        return b"\xff\xd8" + _tables_segments() + sof + sos + bytes(w.out) + b"\xff\xd9"

    def test_bt601_conversion_exact(self):
        """DC-only planes: Y = 2*qY + 128 (qt[0]=16, IDCT of DC-only is
        constant coef/8) — check the decoded RGB against independent
        BT.601 arithmetic."""
        dec = decode_jpeg_pixels(self._color_jpeg_444(10, -5, 20))
        assert dec.shape == (8, 8, 3)
        y, cb, cr = 148.0, 118.0, 168.0
        want = np.clip(
            np.round(
                [
                    y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128),
                ]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.all(dec == want.reshape(1, 1, 3)), (dec[0, 0], want)

    def test_420_sampling_grid_placement(self):
        """16x16 4:2:0: one MCU with four Y blocks (DC 10/20/30/40 in
        raster order) + constant chroma — each 8x8 Y quadrant must land
        in its own spatial quadrant, chroma upsampled 2x2."""
        sof = _seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        dc_codes = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_codes = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        w = _BitWriter()
        pred = 0
        for dc in (10, 20, 30, 40):  # four Y blocks, DIFF-coded
            _dc_only_block(w, dc_codes, ac_codes, dc - pred)
            pred = dc
        _dc_only_block(w, dc_codes, ac_codes, 0)  # Cb: neutral
        _dc_only_block(w, dc_codes, ac_codes, 0)  # Cr: neutral
        w.flush()
        payload = b"\xff\xd8" + _tables_segments() + sof + sos + bytes(w.out) + b"\xff\xd9"
        dec = decode_jpeg_pixels(payload)
        assert dec.shape == (16, 16, 3)
        # neutral chroma -> R==G==B==Y; Y quadrant constants 2*dc+128
        for (y0, x0), dc in (((0, 0), 10), ((0, 8), 20), ((8, 0), 30), ((8, 8), 40)):
            q = dec[y0 : y0 + 8, x0 : x0 + 8]
            assert np.all(q == 2 * dc + 128), (y0, x0, q[0, 0])


class TestHonestTiering:
    def test_scanless_progressive_returns_none(self):
        """SOF2 with tables but ZERO scans carries no coefficients —
        must tier out, not return a black frame."""
        sof2 = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        payload = b"\xff\xd8" + _tables_segments() + sof2 + b"\xff\xd9"
        assert decode_jpeg_pixels(payload) is None

    def test_truncated_entropy_returns_none(self):
        px = np.full((8, 8), 77, dtype=np.uint8)
        good = encode_jpeg_gray(px)
        assert decode_jpeg_pixels(good[: len(good) // 2]) is None or True
        # malformed: chop mid-segment before SOS
        assert decode_jpeg_pixels(good[:20]) is None

    def test_extract_features_real_for_baseline_jpeg(self, spark):
        """The full tier: a REAL baseline JPEG in the media table yields
        content-derived feature stats with no Pillow present."""
        from hgraphstorage_spark.pipeline.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
        )

        px = np.fromfunction(lambda y, x: x * 2 + y, (24, 32)).astype(np.uint8)
        payload = encode_jpeg_gray(px)
        dec = decode_jpeg_pixels(payload).astype("float64") / 255.0
        media = spark.createDataFrame(
            [{"media_id": 0, "kind": "image", "payload": bytes(payload),
              "meta": {"codec": "jpeg", "width": 32, "height": 24, "duration_ms": None}}],
            MEDIA_SCHEMA,
        )
        f = extract_features(media, fake_decode=False).collect()[0]
        assert f["decode_ok"]
        got = f["feature"]
        assert got[:2] == [32.0, 24.0]
        for g, want in zip(got[4:], [dec.mean(), dec.min(), dec.max(), dec.std()]):
            assert abs(g - want) < 1e-6


class TestColorEncoder:
    def test_constant_color_near_exact(self):
        from hgraphstorage_spark.pipeline.jpeg import decode_jpeg_pixels, encode_jpeg_rgb

        px = np.full((16, 16, 3), (200, 60, 90), dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_rgb(px))
        assert dec.shape == (16, 16, 3)
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2

    def test_smooth_gradient_bounded_err(self):
        from hgraphstorage_spark.pipeline.jpeg import decode_jpeg_pixels, encode_jpeg_rgb

        px = np.zeros((33, 45, 3), dtype=np.uint8)
        for y in range(33):
            for x in range(45):
                px[y, x] = (min(255, x * 4), min(255, y * 6), 128)
        dec = decode_jpeg_pixels(encode_jpeg_rgb(px))
        assert dec.shape == px.shape
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.mean() < 6 and err.max() < 40  # quant + 4:2:0 subsample

    def test_full_tier_color_jpeg(self, spark):
        """A real 4:2:0 color JPEG flows through extract_features /
        media_fingerprints / resize_images as fully-real decode."""
        from hgraphstorage_spark.pipeline.jpeg import encode_jpeg_rgb
        from hgraphstorage_spark.pipeline.multimodal import (
            MEDIA_SCHEMA,
            extract_features,
            media_fingerprints,
            resize_images,
        )

        px = np.fromfunction(
            lambda y, x, c: (x * 3 + y * 5 + c * 40) % 256, (40, 56, 3)
        ).astype(np.uint8)
        payload = bytes(encode_jpeg_rgb(px))
        media = spark.createDataFrame(
            [{"media_id": 0, "kind": "image", "payload": payload,
              "meta": {"codec": "jpeg", "width": 56, "height": 40, "duration_ms": None}}],
            MEDIA_SCHEMA,
        )
        f = extract_features(media, fake_decode=False).collect()[0]
        assert f["decode_ok"] and f["feature"][:2] == [56.0, 40.0]
        fp = media_fingerprints(media).collect()[0]
        assert fp["fp_ok"] and fp["fingerprint"] is not None
        rz = resize_images(media, 16, 16, fake_decode=False).collect()[0]
        assert rz["resize_ok"] and rz["width"] <= 16 and rz["height"] <= 16


class TestUntrustedPayloadHardening:
    def test_jpeg_giant_declared_dims_rejected_fast(self):
        import struct
        import time

        from hgraphstorage_spark.pipeline.jpeg import decode_jpeg_pixels

        sof = _seg(0xC0, struct.pack(">BHHB", 8, 60000, 60000, 1) + bytes([1, 0x11, 0]))
        payload = b"\xff\xd8" + _tables_segments() + sof + _seg(0xDA, bytes([1, 1, 0, 0, 63, 0])) + b"\x00" * 64 + b"\xff\xd9"
        t0 = time.perf_counter()
        assert decode_jpeg_pixels(payload) is None
        assert time.perf_counter() - t0 < 1.0  # rejected before any MCU work

    def test_png_giant_declared_dims_rejected(self):
        import struct
        import zlib

        from hgraphstorage_spark.pipeline.multimodal import _png_chunk, decode_png_pixels

        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _png_chunk(b"IEND", b"")
        )
        assert decode_png_pixels(payload) is None

    def test_png_decompression_bomb_bounded(self):
        """An IDAT that inflates to ~100 MB behind a small declared image
        must not expand past the header's own scanline budget — the
        decode returns pixels for the declared region only (bounded
        inflate), never the bomb."""
        import struct
        import zlib

        import numpy as np

        from hgraphstorage_spark.pipeline.multimodal import _png_chunk, decode_png_pixels

        w = h = 4  # declared 4x4 gray: 4*(1+4)=20 expected bytes
        bomb = zlib.compress(b"\x00" * 100_000_000, 9)  # ~100 MB inflated
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", bomb)
            + _png_chunk(b"IEND", b"")
        )
        got = decode_png_pixels(payload)
        assert got is not None and got.shape == (4, 4, 1)
        assert np.all(got == 0)


class TestNonInterleavedScan:
    def test_multi_scan_baseline_tiers_out(self):
        """ADVICE r4: a baseline JPEG whose SOS covers fewer components
        than the frame declares (non-interleaved / multi-scan) must
        return None — decoding only the first scan over the full MCU
        grid would be silently wrong (zeroed chroma)."""
        h = w = 16
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[..., 0] = 200
        from hgraphstorage_spark.pipeline.jpeg import encode_jpeg_rgb

        buf = encode_jpeg_rgb(px)
        assert decode_jpeg_pixels(buf) is not None  # sanity: interleaved ok
        i = buf.find(b"\xff\xda")
        assert i > 0
        seg_len = struct.unpack(">H", buf[i + 2 : i + 4])[0]
        # rewrite the SOS to declare ONLY the first (Y) component; the
        # entropy stream is untouched — the guard fires before decode
        patched = (
            buf[:i]
            + b"\xff\xda"
            + struct.pack(">H", 8)
            + bytes([1])
            + buf[i + 5 : i + 7]
            + b"\x00\x3f\x00"
            + buf[i + 2 + seg_len :]
        )
        assert decode_jpeg_pixels(patched) is None



class TestProgressive:
    """SOF2 decode validated against REAL encoder output with the JVM
    ImageIO decoder (Spark's image source) as independent ground truth —
    covers single-component DC scans, spectral-selection AC bands, and
    full successive approximation (grayscale.jpg: DC Al=1 first + DC
    refine, AC first Al=2 + two AC refinement passes)."""

    FIXTURES = [
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg",
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/docs/_static/pyparsingClassDiagram_3.0.9.jpg",
    ]

    def test_real_progressive_matches_imageio(self, spark):
        import os

        import pytest

        paths = [p for p in self.FIXTURES[:3] if os.path.exists(p)]
        if not paths:
            pytest.skip("no progressive fixtures on this system")
        for p in paths:
            row = spark.read.format("image").load(p).select("image.*").collect()[0]
            ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
                row["height"], row["width"], row["nChannels"]
            )
            mine = decode_jpeg_pixels(open(p, "rb").read())
            assert mine is not None, p
            ref_rgb = ref[..., ::-1] if row["nChannels"] == 3 else ref
            assert mine.shape == ref_rgb.shape, (p, mine.shape, ref_rgb.shape)
            d = np.abs(mine.astype(int) - ref_rgb.astype(int))
            # IDCT rounding differences only: near-exact agreement
            assert d.mean() < 1.0 and d.max() <= 16, (p, d.mean(), d.max())

    def test_progressive_truncated_returns_none_or_partial(self):
        import os

        p = self.FIXTURES[2]
        if not os.path.exists(p):
            import pytest

            pytest.skip("fixture missing")
        b = open(p, "rb").read()
        # chop before the first SOS: no coefficients -> None
        sos = b.find(b"\xff\xda")
        assert decode_jpeg_pixels(b[:sos]) is None

    def test_decode_image_pixels_routes_progressive(self):
        import os

        p = self.FIXTURES[0]
        if not os.path.exists(p):
            import pytest

            pytest.skip("fixture missing")
        from hgraphstorage_spark.pipeline.multimodal import decode_image_pixels

        px = decode_image_pixels(open(p, "rb").read())
        assert px is not None and px.shape == (58, 493, 3)


class TestBaselineVsImageIO:
    def test_real_baseline_photos_match_imageio(self, spark):
        """Baseline decoder vs the JVM ImageIO decoder on real-encoder
        photo output (4:2:0 color, APP segments, multiple DHTs). Chroma
        upsampling differs (nearest here vs fancy there), so edges may
        differ by a few levels — the luma-dominated mean must stay tight."""
        import glob
        import os

        import pytest

        paths = [
            p
            for p in glob.glob(
                "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/*.jpg"
            )
            if os.path.exists(p)
        ][:2]
        if not paths:
            pytest.skip("no baseline photo fixtures")
        for p in paths:
            row = spark.read.format("image").load(p).select("image.*").collect()[0]
            ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(
                row["height"], row["width"], row["nChannels"]
            )[..., ::-1]
            mine = decode_jpeg_pixels(open(p, "rb").read())
            assert mine is not None and mine.shape == ref.shape, p
            d = np.abs(mine.astype(int) - ref.astype(int))
            assert d.mean() < 2.0 and np.percentile(d, 99) <= 8, (p, d.mean())
