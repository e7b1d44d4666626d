"""Pure-python GIF decoder tests (pipeline.gif): round-trip against an
independent reference LZW compressor (dictionary growth, variable code
width, KwKwK case), interlace reordering, animated first-frame semantics,
honest None tier-outs, and decode_image_pixels routing."""

from __future__ import annotations

import struct

import numpy as np

from hgraphstorage_spark.pipeline.gif import decode_gif_pixels


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Reference GIF-LZW compressor: mirrors the spec's width-growth
    timing (grow after the dictionary add that reaches 2^cs)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    codes: list[tuple[int, int]] = []
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    codes.append((clear, code_size))
    w: tuple = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], code_size))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the encoder runs one dictionary-add AHEAD of the decoder
            # (it adds on emit; the decoder adds one code later), so its
            # width grows one entry later than the decoder's 2^cs rule
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (int(k),)
    if w:
        codes.append((table[w], code_size))
    codes.append((eoi, code_size))
    # LSB-first bit packing
    bitbuf = nbits = 0
    out = bytearray()
    for code, cs in codes:
        bitbuf |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_bytes(idx: np.ndarray, palette: np.ndarray, interlace: bool = False,
               animated_second_frame: bool = False) -> bytes:
    h, w = idx.shape
    n_colors = len(palette)
    bits = max(2, (n_colors - 1).bit_length())
    gct_bits = bits - 1
    gct_len = 2 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (gct_bits & 7), 0, 0])  # GCT flag + size
    table = np.zeros((gct_len, 3), dtype=np.uint8)
    table[:n_colors] = palette
    out += table.tobytes()
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = idx[order]  # stored in interlace pass order

    def image_block(rows_arr):
        blk = bytearray(b"\x2c")
        blk += struct.pack("<HHHH", 0, 0, w, h)
        blk += bytes([0x40 if interlace else 0])
        mcs = max(2, bits)
        blk += bytes([mcs])
        data = _lzw_encode(rows_arr.flatten(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            blk += bytes([len(chunk)]) + chunk
        blk += b"\x00"
        return blk

    # a graphic-control extension before the frame (decoder must skip it)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += image_block(rows)
    if animated_second_frame:
        out += image_block(np.zeros_like(rows))
    out += b"\x3b"
    return bytes(out)


PALETTE4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [20, 30, 40]], dtype=np.uint8)


def test_small_4color_roundtrip():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    got = decode_gif_pixels(_gif_bytes(idx, PALETTE4))
    assert got is not None and got.shape == (3, 4, 3)
    assert np.array_equal(got, PALETTE4[idx])


def test_runs_exercise_kwkwk():
    """Long constant runs hit the cScSc (code == next_code) LZW case."""
    idx = np.zeros((8, 32), dtype=np.uint8)
    idx[4:, :] = 1
    got = decode_gif_pixels(_gif_bytes(idx, PALETTE4))
    assert np.array_equal(got, PALETTE4[idx])


def test_large_random_forces_code_width_growth():
    rng = np.random.RandomState(7)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (80, 100)).astype(np.uint8)
    got = decode_gif_pixels(_gif_bytes(idx, palette))
    assert got is not None and got.shape == (80, 100, 3)
    assert np.array_equal(got, palette[idx])


def test_interlaced_rows_reordered():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 4, (16, 10)).astype(np.uint8)
    got = decode_gif_pixels(_gif_bytes(idx, PALETTE4, interlace=True))
    assert np.array_equal(got, PALETTE4[idx])


def test_animated_returns_first_frame():
    idx = np.array([[1, 2], [3, 0]], dtype=np.uint8)
    got = decode_gif_pixels(_gif_bytes(idx, PALETTE4, animated_second_frame=True))
    assert np.array_equal(got, PALETTE4[idx])


def test_honest_none_tiers():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    good = _gif_bytes(idx, PALETTE4)
    assert decode_gif_pixels(None) is None
    assert decode_gif_pixels(b"NOTGIF" + good[6:]) is None
    assert decode_gif_pixels(good[:20]) is None  # truncated mid-palette
    # giant declared frame: rejected before allocation
    big = bytearray(good)
    big[6:10] = struct.pack("<HH", 65535, 65535)
    assert decode_gif_pixels(bytes(big)) is None


def test_decode_image_pixels_routes_gif():
    from hgraphstorage_spark.pipeline.multimodal import decode_image_pixels

    idx = np.array([[0, 3], [1, 2]], dtype=np.uint8)
    got = decode_image_pixels(_gif_bytes(idx, PALETTE4))
    assert got is not None and np.array_equal(got, PALETTE4[idx])


def test_real_world_gifs_decode():
    """Ground truth beyond the self-paired test encoder: every system
    doc GIF (written by real encoders) must decode with the declared
    dimensions — a desynced LZW would cascade into invalid codes."""
    import glob

    paths = sorted(glob.glob("/usr/share/doc/*/html/*.gif"))
    if not paths:
        import pytest

        pytest.skip("no system GIFs present")
    for p in paths[:20]:
        b = open(p, "rb").read()
        w, h = struct.unpack("<HH", b[6:10])
        px = decode_gif_pixels(b)
        assert px is not None, p
        assert px.shape[2] == 3 and px.shape[0] <= h and px.shape[1] <= w, (p, px.shape)
