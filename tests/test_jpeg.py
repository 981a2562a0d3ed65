"""Baseline JPEG codec: each stage cross-checked against an independent
from-the-formula recompute, then full encode->decode round trips with
error bounded by the quantization step."""

import struct

import numpy as np
import pytest

from osm_poi_cloud_spark.functions import jpeg as J


# ---------------------------------------------------------------------------
# stage-level oracles (independent recomputes, not the codec's own code)
# ---------------------------------------------------------------------------

def test_zigzag_is_the_spec_order():
    """Independent derivation: walk the 8x8 grid by anti-diagonals,
    alternating direction (T.81 Figure A.6) — must equal the table."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            ij = ij[::-1]  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    assert order == list(J.ZIGZAG)
    assert sorted(J.ZIGZAG) == list(range(64))


def test_huffman_codes_canonical_and_prefix_free():
    for bits, vals in ((J._DC_LUMA_BITS, J._DC_LUMA_VALS),
                       (J._AC_LUMA_BITS, J._AC_LUMA_VALS),
                       (J._DC_CHROMA_BITS, J._DC_CHROMA_VALS),
                       (J._AC_CHROMA_BITS, J._AC_CHROMA_VALS)):
        codes = J.build_huffman_codes(bits, vals)
        assert len(codes) == sum(bits) == len(vals)
        # length histogram matches BITS
        from collections import Counter
        hist = Counter(ln for _, ln in codes.values())
        assert [hist.get(i, 0) for i in range(1, 17)] == list(bits)
        # prefix-free: no code is a prefix of another
        as_str = sorted(format(c, f"0{ln}b") for c, ln in codes.values())
        for a, b in zip(as_str, as_str[1:]):
            assert not b.startswith(a)


def test_dct_matches_direct_formula_and_inverts():
    """fdct/idct vs the textbook O(N^4) DCT-II double sum."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-128, 127, (8, 8))

    def alpha(k):
        return np.sqrt(0.5) if k == 0 else 1.0

    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for i in range(8):
                for j in range(8):
                    s += x[i, j] * np.cos((2 * i + 1) * u * np.pi / 16) \
                        * np.cos((2 * j + 1) * v * np.pi / 16)
            direct[u, v] = 0.25 * alpha(u) * alpha(v) * s

    got = J.fdct_blocks(x[None])[0]
    np.testing.assert_allclose(got, direct, atol=1e-9)
    np.testing.assert_allclose(J.idct_blocks(got[None])[0], x, atol=1e-9)


def test_color_transform_round_trip():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.float64)
    back = J.ycbcr_to_rgb(J.rgb_to_ycbcr(rgb))
    # JFIF publishes the inverse matrix rounded to 6 decimals, so the
    # round trip is ~1e-4, not exact
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_extend_matches_spec_table():
    """T.81 F.2.2.1: EXTEND(V, T) examples — category T encodes
    values in [-2^T+1, -2^(T-1)] u [2^(T-1), 2^T-1]."""
    for t in range(1, 12):
        lo, hi = 1 << (t - 1), (1 << t) - 1
        # positive side: raw bits == value
        assert J._extend(lo, t) == lo and J._extend(hi, t) == hi
        # negative side: bit pattern v encodes v - 2^T + 1
        assert J._extend(0, t) == -hi and J._extend(lo - 1, t) == -lo
    assert J._category(0) == 0
    for v in (1, -1, 2, 3, -3, 4, 255, -255, 1023):
        t = J._category(v)
        assert (1 << (t - 1)) <= abs(v) <= (1 << t) - 1


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_round_trip_rgb(subsampling):
    img = _gradient_rgb(40, 56)
    blob = J.encode_jpeg(img, quality=95, subsampling=subsampling)
    out = J.decode_jpeg(blob)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth gradient at q95: reconstruction well within a few levels
    assert err.mean() < 3.0 and err.max() <= 40


def test_round_trip_gray_and_odd_dims():
    rng = np.random.RandomState(11)
    # noise is the worst case for DCT quantization; bound loosely
    img = (rng.uniform(0, 255, (23, 17)) * 0.5 + 64).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12


def test_round_trip_restart_markers():
    img = _gradient_rgb(48, 32)
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=92, subsampling="4:2:0"))
    rst = J.encode_jpeg(img, quality=92, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI marker present
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    out = J.decode_jpeg(rst)
    # restart markers change framing, not content
    np.testing.assert_array_equal(out, plain)


def test_quality_ladder_monotone():
    """Lower quality must not beat higher quality on the same image."""
    img = _gradient_rgb(32, 32)
    errs = []
    for q in (95, 75, 40, 10):
        out = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs == sorted(errs)
    # and sizes shrink as quality drops
    sizes = [len(J.encode_jpeg(img, quality=q)) for q in (95, 75, 40, 10)]
    assert sizes == sorted(sizes, reverse=True)


def test_flat_image_is_near_exact():
    img = np.full((24, 24, 3), 130, np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quality=85))
    assert np.abs(out.astype(int) - 130).max() <= 2


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_progressive_matches_baseline_bit_exact(subsampling):
    """Both encoders quantize identically, so progressive scans
    (spectral selection + successive approximation + EOB runs) must
    reconstruct the EXACT same coefficients as the single baseline
    scan — decoded pixels bit-identical."""
    rng = np.random.RandomState(21)
    img = np.clip(_gradient_rgb(41, 53).astype(int)
                  + rng.randint(-25, 25, (41, 53, 3)), 0, 255).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=80, subsampling=subsampling))
    prog_blob = J.encode_jpeg_progressive(img, quality=80, subsampling=subsampling)
    assert b"\xff\xc2" in prog_blob  # really SOF2
    assert prog_blob.count(b"\xff\xda") >= 6  # multi-scan
    np.testing.assert_array_equal(J.decode_jpeg(prog_blob), base)


def test_progressive_gray_and_spectral_splits():
    rng = np.random.RandomState(9)
    img = (rng.uniform(0, 255, (26, 34)) * 0.6 + 40).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=88))
    for split in (1, 5, 20, 63):
        prog = J.encode_jpeg_progressive(img, quality=88, spectral_split=split)
        np.testing.assert_array_equal(J.decode_jpeg(prog), base)


def test_progressive_restart_markers():
    img = _gradient_rgb(40, 40)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling="4:2:0"))
    prog = J.encode_jpeg_progressive(img, quality=85, subsampling="4:2:0",
                                     restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in prog for i in range(8))
    np.testing.assert_array_equal(J.decode_jpeg(prog), base)


def test_progressive_low_quality_stress():
    """Low quality -> dense zero runs, ZRL paths, long EOB tails."""
    rng = np.random.RandomState(33)
    img = np.clip(rng.uniform(0, 255, (24, 56, 3)), 0, 255).astype(np.uint8)
    for q in (10, 35):
        base = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        prog = J.encode_jpeg_progressive(img, quality=q)
        np.testing.assert_array_equal(J.decode_jpeg(prog), base)


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_decoder_guards():
    img = _gradient_rgb(16, 16)
    blob = bytearray(J.encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"JUNK" + bytes(blob))
    # flipping SOF0 -> SOF2 makes the full-band scan spec-invalid for a
    # progressive frame: explicit refusal, not garbage output
    sof0 = bytes(blob).find(b"\xff\xc0")
    prog = bytes(blob[:sof0]) + b"\xff\xc2" + bytes(blob[sof0 + 2:])
    with pytest.raises(ValueError, match="progressive DC scan"):
        J.decode_jpeg(prog)
    # arithmetic-coded SOF9 stays an explicit refusal
    arith = bytes(blob[:sof0]) + b"\xff\xc9" + bytes(blob[sof0 + 2:])
    with pytest.raises(ValueError, match="unsupported SOF"):
        J.decode_jpeg(arith)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(bytes(blob[:40]))


def test_dims_bomb_guard():
    import tracemalloc

    img = _gradient_rgb(8, 8)
    blob = bytearray(J.encode_jpeg(img))
    sof0 = bytes(blob).find(b"\xff\xc0")
    # rewrite declared dims to 60000 x 60000 (3.6 GP)
    struct.pack_into(">HH", blob, sof0 + 5, 60000, 60000)
    tracemalloc.start()
    with pytest.raises(ValueError, match="bomb"):
        J.decode_jpeg(bytes(blob))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 1024 * 1024


def test_parse_jpeg_dims():
    img = _gradient_rgb(31, 47)
    assert J.parse_jpeg_dims(J.encode_jpeg(img)) == (47, 31)
    assert J.parse_jpeg_dims(b"\x89PNG") is None
