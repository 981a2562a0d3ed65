"""GIF decoder: LZW unit oracle, round trips (plain, interlaced,
transparent, local-palette stress), real-world files from the system
doc tree as external validation, and container guards."""

import glob
import struct

import numpy as np
import pytest

from osm_poi_cloud_spark.functions import gif as G


def test_lzw_round_trip_and_width_growth():
    rng = np.random.RandomState(3)
    # enough symbols to push the code width through several growths
    for alphabet, mcs in ((4, 2), (16, 4), (256, 8)):
        data = rng.randint(0, alphabet, 5000).astype(np.uint8).tobytes()
        comp = G.lzw_compress(data, mcs)
        assert G.lzw_decompress(comp, mcs, len(data)) == data
        assert len(comp) < len(data) * 1.5


def test_lzw_table_full_and_clear():
    # highly varied data at mcs=2 fills the 4096-entry table fast and
    # forces the encoder's mid-stream CLEAR path
    rng = np.random.RandomState(7)
    data = rng.randint(0, 4, 60000).astype(np.uint8).tobytes()
    comp = G.lzw_compress(data, 2)
    assert G.lzw_decompress(comp, 2, len(data)) == data


def test_lzw_output_cap_is_a_bomb_guard():
    data = bytes([1]) * 100000
    comp = G.lzw_compress(data, 2)
    with pytest.raises(ValueError, match="bomb"):
        G.lzw_decompress(comp, 2, 50)


def _checker(h, w, n_colors):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx // 3 + yy // 2) % n_colors).astype(np.uint8)


def test_round_trip_plain_and_interlaced():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (7, 3)).astype(np.uint8)
    idx = _checker(23, 31, 7)
    for interlace in (False, True):
        blob = G.encode_gif(idx, pal, interlace=interlace)
        out = G.decode_gif(blob)
        np.testing.assert_array_equal(out, pal[idx])
    assert G.parse_gif_dims(G.encode_gif(idx, pal)) == (31, 23)


def test_round_trip_transparency():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = _checker(10, 12, 3)
    out = G.decode_gif(G.encode_gif(idx, pal, transparent_index=1))
    assert out.shape == (10, 12, 4)
    np.testing.assert_array_equal(out[..., :3], pal[idx])
    np.testing.assert_array_equal(out[..., 3] == 0, idx == 1)


def test_round_trip_full_palette_noise():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (40, 40)).astype(np.uint8)  # worst case
    np.testing.assert_array_equal(G.decode_gif(G.encode_gif(idx, pal)), pal[idx])


_SYSTEM_GIFS = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))


@pytest.mark.skipif(not _SYSTEM_GIFS, reason="no system GIFs available")
def test_decodes_real_world_gifs():
    """Files produced by real encoders (giflib-era tooling) — a wrong
    LZW width-growth convention desyncs within a few codes, so clean
    structured decode of all of them pins the convention externally."""
    for f in _SYSTEM_GIFS:
        data = open(f, "rb").read()
        arr = G.decode_gif(data)
        assert arr.ndim == 3 and arr.shape[2] in (3, 4)
        assert arr.shape[0] > 0 and arr.shape[1] > 0
        # offset/undersized frames are composited onto the logical
        # screen, so the decode is exactly canvas-sized
        w, h = G.parse_gif_dims(data)
        assert (arr.shape[1], arr.shape[0]) == (w, h)


def test_offset_frame_composited_onto_canvas():
    """A first frame smaller than and offset within the logical screen
    must land at (ix, iy) on a background-filled canvas of the declared
    screen size — built by patching the encoder's descriptor bytes."""
    import struct
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = (np.arange(12, dtype=np.uint8) % 4).reshape(4, 3)
    blob = bytearray(G.encode_gif(idx, pal))
    blob[6:10] = struct.pack("<HH", 10, 8)   # logical screen 10x8
    blob[11] = 1                              # background index -> green
    desc = 13 + 3 * 4                         # header + 4-entry GCT
    assert blob[desc] == 0x2C
    blob[desc + 1:desc + 5] = struct.pack("<HH", 2, 3)  # ix=2, iy=3
    arr = G.decode_gif(bytes(blob))
    assert arr.shape == (8, 10, 3)
    assert (arr[0, 0] == pal[1]).all()                      # background fill
    assert (arr[3:7, 2:5] == pal[idx]).all()                # frame placement
    assert (arr[:3] == pal[1]).all() and (arr[7:] == pal[1]).all()


def test_guards():
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"NOPE" + b"\x00" * 20)
    # dimension bomb: tiny file declaring a huge screen
    blob = bytearray(G.encode_gif(_checker(4, 4, 2),
                                  np.zeros((2, 3), np.uint8)))
    struct.pack_into("<HH", blob, 6, 60000, 60000)
    with pytest.raises(ValueError, match="bomb"):
        G.decode_gif(bytes(blob))
    with pytest.raises(ValueError, match="no image frame"):
        G.decode_gif(b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0, 0, 0]) + b"\x3b")


def test_subframe_background_uses_global_table():
    """The logical-screen background index refers to the GLOBAL color
    table even when the frame carries a LOCAL one (GIF89a spec §18) —
    built by grafting a local table onto the encoder's output under a
    different global table."""
    import struct
    L = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    GT = np.array([[1, 2, 3], [200, 100, 50], [4, 5, 6], [7, 8, 9]], np.uint8)
    idx = (np.arange(12, dtype=np.uint8) % 4).reshape(4, 3)
    blob = bytearray(G.encode_gif(idx, L))
    desc = 13 + 3 * 4
    assert blob[desc] == 0x2C
    new = bytearray()
    new += blob[:6] + struct.pack("<HH", 10, 8)          # screen 10x8
    new += bytes([blob[10], 1, blob[12]])                # bg index 1 (global)
    new += GT.tobytes()                                  # GLOBAL table
    d = bytearray(blob[desc:desc + 10])
    d[1:5] = struct.pack("<HH", 2, 3)                    # ix=2, iy=3
    d[9] |= 0x80 | 0x01                                  # LOCAL table, 4 entries
    new += d + L.tobytes() + blob[desc + 10:]
    arr = G.decode_gif(bytes(new))
    assert arr.shape == (8, 10, 3)
    assert (arr[0, 0] == GT[1]).all()                    # fill from GLOBAL
    assert (arr[3:7, 2:5] == L[idx]).all()               # pixels from LOCAL
