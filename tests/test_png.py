"""Pure-stdlib PNG codec: encode/decode round trips, every row filter,
CRC verification, and the real multimodal pixel-decode path."""

import struct
import zlib

import numpy as np
import pytest

from osm_poi_cloud_spark.functions import png as P


def _rand_img(rng, h, w, c):
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.int64).astype(np.uint8)
    return a[:, :, 0] if c == 1 else a


def test_round_trip_all_color_types():
    rng = np.random.RandomState(5)
    for c in (1, 3, 4):
        img = _rand_img(rng, 23, 17, c)
        out = P.decode_png(P.encode_png(img))
        expect = img[:, :, None] if c == 1 else img
        assert out.shape == expect.shape
        assert (out == expect).all()


def _encode_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-rolled encoder applying a chosen filter per row — exercises
    the decoder's Sub/Up/Average/Paeth reconstruction paths."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ft = filters[y % len(filters)]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + P._chunk(b"IEND", b"")
    )


def test_decode_every_filter_type():
    rng = np.random.RandomState(9)
    img = _rand_img(rng, 10, 8, 3)
    blob = _encode_with_filters(img, [0, 1, 2, 3, 4])
    assert (P.decode_png(blob) == img).all()


def test_crc_and_format_guards():
    img = np.zeros((4, 4), np.uint8)
    blob = bytearray(P.encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JUNK" + bytes(blob)[4:])
    blob[40] ^= 0xFF  # corrupt inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        P.decode_png(bytes(blob))


def test_palette_png_all_depths():
    """Color type 3 at depths 1/2/4/8: hand-built PLTE images with the
    pixel oracle being the palette lookup itself; tRNS adds alpha."""
    rng = np.random.RandomState(13)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
        w, h = 13, 7  # odd width: exercises partial final byte
        idx = rng.randint(0, n, (h, w)).astype(np.uint8)
        # pack rows MSB-first at the given depth, filter 0
        raw = bytearray()
        for y in range(h):
            raw.append(0)
            bits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - depth:]
            packed = np.packbits(bits.ravel())
            raw += packed.tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        blob = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                + P._chunk(b"PLTE", pal.tobytes())
                + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
                + P._chunk(b"IEND", b""))
        np.testing.assert_array_equal(P.decode_png(blob), pal[idx])
        # with transparency on index 0
        trns = bytes([0])
        blob_t = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                  + P._chunk(b"PLTE", pal.tobytes())
                  + P._chunk(b"tRNS", trns)
                  + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
                  + P._chunk(b"IEND", b""))
        out = P.decode_png(blob_t)
        assert out.shape == (h, w, 4)
        np.testing.assert_array_equal(out[..., :3], pal[idx])
        np.testing.assert_array_equal(out[..., 3] == 0, idx == 0)


def test_real_world_palette_pngs():
    """System files written by real encoders pin the sub-byte packing
    and PLTE handling externally."""
    import glob
    import os

    found = [f for f in ("/usr/share/gitweb/static/git-logo.png",
                         "/usr/share/gitweb/static/git-favicon.png")
             if os.path.exists(f)]
    if not found:
        pytest.skip("no system palette PNGs")
    for f in found:
        arr = P.decode_png(open(f, "rb").read())
        assert arr.ndim == 3 and arr.shape[2] in (3, 4)
        assert arr.shape[0] > 0 and arr.shape[1] > 0


def test_decompression_bomb_guards():
    """Untrusted crawl media: attacker-declared dims and oversized
    deflate streams must fail cheaply, before any huge allocation."""
    import tracemalloc

    # (a) tiny file declaring a 100k x 100k image -> rejected at IHDR
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0)
    bomb_dims = (
        b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bomb"):
        P.decode_png(bomb_dims)

    # (b) dims under the cap but IDAT secretly inflating to ~256 MB ->
    # bounded decompressobj stops at expected+1 bytes (tracemalloc-pinned)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb_stream = (
        b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"\x00" * (256 * 1024 * 1024), 9))
        + P._chunk(b"IEND", b"")
    )
    tracemalloc.start()
    with pytest.raises(ValueError, match="bomb"):
        P.decode_png(bomb_stream)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 32 * 1024 * 1024, f"bomb guard allocated {peak/1e6:.0f} MB"

    # (c) zero-dimension guard
    ihdr0 = struct.pack(">IIBBBBB", 0, 5, 8, 0, 0, 0, 0)
    zero = b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr0) + P._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bomb"):
        P.decode_png(zero)

    # (d) a legitimate image still decodes under a tight custom cap
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (P.decode_png(P.encode_png(img), max_pixels=16) == img).all()


def test_multimodal_pixels_and_features_real(spark):
    from osm_poi_cloud_spark.operators import multimodal as mm

    from osm_poi_cloud_spark.functions import gif as G
    from osm_poi_cloud_spark.functions import jpeg as J

    media = mm.make_synthetic_media(spark, 32)
    pix = mm.decode_image_pixels(media).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    by_mime = {m: [i for i in src.index if src.loc[i, "mime"] == f"image/{m}"]
               for m in ("png", "jpeg", "gif")}
    codec = {"png": P.decode_png, "jpeg": J.decode_jpeg, "gif": G.decode_gif}
    assert (len(by_mime["png"]), len(by_mime["jpeg"]), len(by_mime["gif"])) == (8, 4, 4)
    for m, ids in by_mime.items():
        assert pix.loc[ids, "ok"].all(), m
        for mid in ids:  # operator pixels bit-equal to the direct codec
            row = pix.loc[mid]
            arr = np.frombuffer(bytes(row["pixels"]), np.uint8).reshape(
                row["height"], row["width"], row["channels"])
            expect = codec[m](bytes(src.loc[mid, "payload"]))
            if expect.ndim == 2:
                expect = expect[:, :, None]
            assert (arr == expect).all(), mid
    # undecodable rows (video/compressed audio) are marked not-ok, not crashed
    decodable = {i for ids in by_mime.values() for i in ids}
    assert not pix.loc[[i for i in src.index if i not in decodable], "ok"].any()

    feats = mm.extract_image_features(media, dim=64).toPandas().set_index("media_id")
    png0 = by_mime["png"][0]
    f0 = np.array(feats.loc[png0, "feature"])
    exp = P.decode_png(bytes(src.loc[png0, "payload"])).astype(np.float32) / 255.0
    lum = exp.mean(axis=2)
    assert f0[3] == pytest.approx(lum.mean(), abs=1e-6)  # real pixel stat
    assert len(f0) == 64
