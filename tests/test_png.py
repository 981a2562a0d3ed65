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

    from osm_poi_cloud_spark.functions import jpeg as J

    media = mm.make_synthetic_media(spark, 32)
    pix = mm.decode_image_pixels(media).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    png_ids = [i for i in src.index if src.loc[i, "mime"] == "image/png"]
    jpeg_ids = [i for i in src.index if src.loc[i, "mime"] == "image/jpeg"]
    assert len(png_ids) == 8 and pix.loc[png_ids, "ok"].all()
    assert len(jpeg_ids) == 4 and pix.loc[jpeg_ids, "ok"].all()
    for mid in png_ids:
        row = pix.loc[mid]
        arr = np.frombuffer(bytes(row["pixels"]), np.uint8).reshape(
            row["height"], row["width"], row["channels"])
        expect = P.decode_png(bytes(src.loc[mid, "payload"]))
        assert (arr == expect).all()
    for mid in jpeg_ids:  # real JPEG pixels, bit-equal to the codec
        row = pix.loc[mid]
        arr = np.frombuffer(bytes(row["pixels"]), np.uint8).reshape(
            row["height"], row["width"], row["channels"])
        expect = J.decode_jpeg(bytes(src.loc[mid, "payload"]))
        assert (arr == expect).all()
    # undecodable rows (GIF/video/audio) are marked not-ok, not crashed
    decodable = set(png_ids) | set(jpeg_ids)
    assert not pix.loc[[i for i in src.index if i not in decodable], "ok"].any()

    feats = mm.extract_image_features(media, dim=64).toPandas().set_index("media_id")
    f0 = np.array(feats.loc[png_ids[0], "feature"])
    exp = P.decode_png(bytes(src.loc[png_ids[0], "payload"])).astype(np.float32) / 255.0
    lum = exp.mean(axis=2)
    assert f0[3] == pytest.approx(lum.mean(), abs=1e-6)  # real pixel stat
    assert len(f0) == 64
