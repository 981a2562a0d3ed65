"""Adversarial-input fuzz for the media codecs: random blobs and
bit-flipped valid files must produce clean ValueErrors (or valid
decodes), never uncaught exceptions, hangs, or huge allocations —
these decoders run inside executors on untrusted crawl bytes.

Deterministic seeds: failures reproduce exactly.
"""

import zlib

import numpy as np
import pytest

from osm_poi_cloud_spark.functions import gif as G
from osm_poi_cloud_spark.functions import jpeg as J
from osm_poi_cloud_spark.functions import png as P
from osm_poi_cloud_spark.functions import wav as W

#: exception classes a decoder is ALLOWED to raise on junk — the same
#: set operators/multimodal.py catches on its fallback path
ALLOWED = (ValueError, zlib.error, IndexError)
import struct as _struct  # noqa: E402

ALLOWED = ALLOWED + (_struct.error,)


def _decoders():
    return [
        ("png", P.decode_png),
        ("jpeg", J.decode_jpeg),
        ("gif", G.decode_gif),
        ("wav", lambda b: W.decode_wav(b)),
    ]


def _valid_samples():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (12, 17, 3)).astype(np.uint8)
    tone = 0.4 * np.sin(np.arange(600) / 9.0)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (9, 14)).astype(np.uint8)
    return [
        ("png", P.encode_png(img)),
        ("jpeg", J.encode_jpeg(img, quality=80)),
        ("jpeg_prog", J.encode_jpeg_progressive(img, quality=80)),
        ("gif", G.encode_gif(idx, pal)),
        ("wav", W.encode_wav(tone)),
    ]


def test_random_blobs_never_crash():
    rng = np.random.RandomState(11)
    magics = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a", b"RIFF", b""]
    for trial in range(200):
        blob = bytes(rng.randint(0, 256, rng.randint(0, 400), dtype=np.uint8))
        blob = magics[trial % len(magics)] + blob
        for name, dec in _decoders():
            try:
                dec(blob)
            except ALLOWED:
                pass  # clean refusal is the contract
            # anything else (segfault-adjacent numpy errors, KeyError,
            # RecursionError, MemoryError...) fails the test loudly


def test_bit_flipped_valid_files_never_crash():
    rng = np.random.RandomState(23)
    dec_by_name = dict(_decoders())
    dec_by_name["jpeg_prog"] = dec_by_name["jpeg"]
    for name, blob in _valid_samples():
        dec = dec_by_name[name]
        for _ in range(120):
            b = bytearray(blob)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
            try:
                dec(bytes(b))
            except ALLOWED:
                pass


def test_truncations_never_crash():
    dec_by_name = dict(_decoders())
    dec_by_name["jpeg_prog"] = dec_by_name["jpeg"]
    for name, blob in _valid_samples():
        dec = dec_by_name[name]
        for cut in range(0, len(blob), max(len(blob) // 40, 1)):
            try:
                dec(blob[:cut])
            except ALLOWED:
                pass


def test_edge_dimension_sweep():
    """Classic decoder killers: 1x1, single-row/column, exact-MCU and
    off-by-one dims — every codec must round-trip all of them (and
    progressive JPEG must stay bit-equal to baseline at each)."""
    rng = np.random.RandomState(1)
    for h, w in [(1, 1), (1, 17), (17, 1), (7, 9), (8, 8), (16, 16),
                 (8, 1), (1, 8), (9, 8), (3, 3)]:
        img3 = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        img1 = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert (P.decode_png(P.encode_png(img3)) == img3).all(), (h, w)
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            assert J.decode_jpeg(J.encode_jpeg(img3, quality=90, subsampling=sub)).shape == img3.shape
        base = J.decode_jpeg(J.encode_jpeg(img3, quality=90, subsampling="4:2:0"))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(img3, quality=90, subsampling="4:2:0"))
        np.testing.assert_array_equal(prog, base)
        assert J.decode_jpeg(J.encode_jpeg(img1, quality=90)).shape == img1.shape
        pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
        idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
        np.testing.assert_array_equal(G.decode_gif(G.encode_gif(idx, pal, interlace=True)), pal[idx])
    for frames, ch in [(1, 1), (1, 2), (3, 5), (2, 1)]:
        x = rng.uniform(-1, 1, (frames, ch))
        out, _ = W.decode_wav(W.encode_wav(x, bits=16))
        assert out.shape == (frames, ch)
