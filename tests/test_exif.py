"""EXIF TIFF-IFD reader/writer: round-trip, real-world external pins,
fuzz (never raise on untrusted bytes), and the Spark GPS operator."""

import glob
import random

import pytest

from osm_poi_cloud_spark.functions import exif as ex

_REAL_GLOB = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/**/*.jpg"


def _jpeg_with_gps(lat_dms, lat_ref, lon_dms, lon_ref, bo="II"):
    app1 = ex.build_exif_gps_app1(lat_dms, lat_ref, lon_dms, lon_ref,
                                  byte_order=bo)
    return ex.insert_app1(b"\xff\xd8\xff\xd9", app1)


def test_gps_roundtrip_both_endians():
    for bo in ("II", "MM"):
        jpg = _jpeg_with_gps(((42, 1), (30, 1), (5130, 100)), "N",
                             ((12, 1), (4, 1), (0, 1)), "W", bo)
        tags = ex.parse_exif(jpg)
        assert tags["byte_order"] == bo
        lat, lon = ex.exif_gps_latlon(jpg)
        # fixed left-assoc chain: 42 + (30/1)/60 + (5130/100)/3600
        assert lat == 42 + (30 / 1) / 60.0 + (5130 / 100) / 3600.0
        assert lon == -(12 + (4 / 1) / 60.0 + (0 / 1) / 3600.0)


def test_real_world_exif_external_pins():
    """Real camera/tool EXIF shipped with Spark — pins byte order,
    IFD walking, sub-IFD pointers, ASCII + RATIONAL decoding against
    bytes this repo did not write."""
    files = {p.split("/")[-1]: p for p in glob.glob(_REAL_GLOB, recursive=True)}
    assert len(files) >= 5
    for name, p in files.items():
        tags = ex.parse_exif(open(p, "rb").read())
        assert tags is not None and tags["byte_order"] == "MM", name
        assert tags["ifd0:0x0112"] == 1, name  # Orientation top-left
    nikon = ex.parse_exif(open(files["chr30.4.184.jpg"], "rb").read())
    assert nikon["ifd0:0x010f"] == "NIKON"
    assert nikon["ifd0:0x0110"] == "COOLPIX P4"
    assert nikon["ifd0:0x0132"] == "2007:10:15 11:38:01"
    assert nikon["ifd0:0x011a"] == (72, 1)  # XResolution RATIONAL
    assert nikon["exif:0x9003"] == "2007:05:19 09:15:25"  # sub-IFD reached
    # none of them carry GPS
    for p in files.values():
        assert ex.exif_gps_latlon(open(p, "rb").read()) is None


def test_missing_and_malformed_never_raise():
    assert ex.parse_exif(b"") is None
    assert ex.parse_exif(b"\xff\xd8\xff\xd9") is None
    assert ex.exif_gps_latlon(b"not a jpeg") is None
    # zero denominator -> rejected, not ZeroDivisionError
    jpg = _jpeg_with_gps(((42, 0), (0, 1), (0, 1)), "N",
                         ((12, 1), (0, 1), (0, 1)), "E")
    assert ex.exif_gps_latlon(jpg) is None
    # out-of-range coordinates rejected
    jpg = _jpeg_with_gps(((300, 1), (0, 1), (0, 1)), "N",
                         ((12, 1), (0, 1), (0, 1)), "E")
    assert ex.exif_gps_latlon(jpg) is None

    base = _jpeg_with_gps(((1, 1), (2, 1), (3, 1)), "S",
                          ((4, 1), (5, 1), (6, 1)), "E")
    for cut in range(len(base)):          # every truncation
        ex.exif_gps_latlon(base[:cut])
    rng = random.Random(1)                # seeded corruption sweep
    for _ in range(3000):
        b = bytearray(base)
        for _ in range(6):
            b[rng.randrange(len(b))] = rng.randrange(256)
        got = ex.exif_gps_latlon(bytes(b))
        if got is not None:
            lat, lon = got
            assert -90 <= lat <= 90 and -180 <= lon <= 180


def test_writer_validation():
    with pytest.raises(ValueError):
        ex.build_exif_gps_app1(((1, 1),), "N", ((1, 1),) * 3, "E")
    with pytest.raises(ValueError):
        ex.build_exif_gps_app1(((1, 1),) * 3, "X", ((1, 1),) * 3, "E")
    with pytest.raises(ValueError):
        ex.build_exif_gps_app1(((1, 1),) * 3, "N", ((1, 1),) * 3, "E",
                               byte_order="XX")
    with pytest.raises(ValueError):
        ex.insert_app1(b"nope", b"Exif\x00\x00")


def test_app1_composes_with_real_codec():
    """Splicing APP1 into an engine-encoded JPEG keeps it decodable and
    the GPS readable — metadata and pixels coexist."""
    import numpy as np

    from osm_poi_cloud_spark.functions import jpeg as jc

    arr = (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3) * 3) % 256
    enc = jc.encode_jpeg(arr)
    app1 = ex.build_exif_gps_app1(((51, 1), (30, 1), (0, 1)), "N",
                                  ((0, 1), (7, 1), (3900, 100)), "W")
    tagged = ex.insert_app1(enc, app1)
    lat, lon = ex.exif_gps_latlon(tagged)
    assert lat == 51 + (30 / 1) / 60.0 + 0.0
    import numpy.testing as npt
    npt.assert_array_equal(jc.decode_jpeg(tagged), jc.decode_jpeg(enc))


def test_spark_extract_exif_gps(spark):
    rows = []
    for i in range(40):
        c = (i * 7) % 90
        jpg = _jpeg_with_gps(((c, 1), (15, 1), (0, 1)), "N" if i % 2 else "S",
                             ((i, 1), (0, 1), (0, 1)), "E",
                             bo="II" if i % 3 else "MM")
        rows.append((f"m{i}", bytearray(jpg)))
    rows.append(("nogps", bytearray(b"\xff\xd8\xff\xd9")))
    rows.append(("junk", bytearray(b"garbage")))
    rows.append(("null", None))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    from osm_poi_cloud_spark.operators.multimodal import extract_exif_gps

    got = {r["media_id"]: r for r in extract_exif_gps(df).collect()}
    assert len(got) == 43
    for i in range(40):
        r = got[f"m{i}"]
        c = (i * 7) % 90
        mag = c + (15 / 1) / 60.0 + 0.0
        assert r["has_gps"] and r["lon"] == float(i)
        assert r["lat"] == (mag if i % 2 else -mag)
        assert r["byte_order"] == ("II" if i % 3 else "MM")
    for bad in ("nogps", "junk", "null"):
        assert not got[bad]["has_gps"] and got[bad]["lat"] is None
