"""WAV codec + audio features: round trips across PCM depths, an
independent from-the-formula feature oracle, container guards, and the
Spark operator over the synthetic media fixture."""

import struct

import numpy as np
import pytest

from osm_poi_cloud_spark.functions import wav as W


def _tone(n=1600, rate=16000, f=440.0):
    t = np.arange(n) / rate
    return 0.6 * np.sin(2 * np.pi * f * t)


@pytest.mark.parametrize("bits,tol", [(16, 1e-4), (8, 1e-2), (32, 1e-8), (-32, 1e-6)])
def test_round_trip_depths(bits, tol):
    x = _tone()
    out, rate = W.decode_wav(W.encode_wav(x, 16000, bits=bits))
    assert rate == 16000 and out.shape == (len(x), 1)
    np.testing.assert_allclose(out[:, 0], x, atol=tol)


def test_round_trip_stereo_and_24bit():
    rng = np.random.RandomState(7)
    x = rng.uniform(-0.9, 0.9, (500, 2))
    out, rate = W.decode_wav(W.encode_wav(x, 8000, bits=16))
    assert out.shape == (500, 2)
    np.testing.assert_allclose(out, x, atol=1e-4)

    # hand-build a 24-bit PCM file (encoder doesn't emit 24-bit; the
    # decoder must still read it — it's common in the wild)
    vals = np.round(x[:, 0] * (2 ** 23 - 1)).astype(np.int64)
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out24, _ = W.decode_wav(blob)
    np.testing.assert_allclose(out24[:, 0], x[:, 0], atol=1e-6)


def test_extensible_wrapper_and_skipped_chunks():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) + a LIST chunk before data —
    the layout real encoders produce for multichannel files."""
    x = _tone(400)
    pcm = np.round(x * 32767).astype("<i2").tobytes()
    guid = struct.pack("<H", 1) + b"\x00" * 14  # sub-format tag = PCM
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16) \
        + struct.pack("<H", 22) + struct.pack("<HI", 16, 0x4) + guid
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = W.decode_wav(blob)
    assert rate == 16000
    np.testing.assert_allclose(out[:, 0], x, atol=1e-4)


def test_guards():
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_wav(b"\x89PNG" + b"\x00" * 40)
    # mu-law (format 7) -> explicit refusal
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="unsupported"):
        W.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # frame-count bomb guard
    x = _tone(200)
    with pytest.raises(ValueError, match="bomb"):
        W.decode_wav(W.encode_wav(x), max_frames=100)


def test_audio_features_independent_oracle():
    """Features vs direct recomputation from the same samples."""
    rate = 16000
    x = _tone(3200, rate, f=500.0)
    feat = W.audio_features(x, rate, n_bands=8)
    assert len(feat) == 13
    assert feat[0] == pytest.approx(0.2, abs=1e-6)            # duration
    assert feat[1] == pytest.approx(np.sqrt((x ** 2).mean()), rel=1e-5)
    assert feat[2] == pytest.approx(0.6, rel=1e-5)            # peak
    # a 500 Hz tone crosses zero 2*500 times/sec -> zcr ~ 1000/16000
    assert feat[3] == pytest.approx(1000 / rate, rel=0.05)
    # spectral centroid of a pure tone ~ its frequency (scaled by Nyquist)
    assert feat[4] == pytest.approx(500.0 / 8000.0, rel=0.05)
    # band energies: a 500 Hz tone lives in the first of 8 bands
    assert np.argmax(feat[5:]) == 0


def test_spark_audio_features_operator(spark):
    from osm_poi_cloud_spark.operators import multimodal as mm

    media = mm.make_synthetic_media(spark, 32)
    src = media.toPandas().set_index("media_id")
    out = mm.extract_audio_features(media).toPandas().set_index("media_id")
    wav_ids = [i for i in src.index if src.loc[i, "mime"] == "audio/wav"]
    assert len(wav_ids) == 4 and out.loc[wav_ids, "ok"].all()
    for mid in wav_ids:  # operator == direct codec, bit-equal
        samples, rate = W.decode_wav(bytes(src.loc[mid, "payload"]))
        expect = W.audio_features(samples, rate, 8)
        got = np.array(out.loc[mid, "feature"], dtype=np.float32)
        np.testing.assert_array_equal(got, expect)
        assert out.loc[mid, "sample_rate"] == rate
    # everything non-WAV (images, video, compressed audio) is ok=false
    assert not out.loc[[i for i in src.index if i not in wav_ids], "ok"].any()


def test_spark_audio_samples_operator(spark):
    from osm_poi_cloud_spark.operators import multimodal as mm

    media = mm.make_synthetic_media(spark, 32)
    src = media.toPandas().set_index("media_id")
    out = mm.decode_audio_samples(media).toPandas().set_index("media_id")
    wav_ids = [i for i in src.index if src.loc[i, "mime"] == "audio/wav"]
    assert len(wav_ids) == 4 and out.loc[wav_ids, "ok"].all()
    for mid in wav_ids:  # canonical float64 LE bytes == direct codec
        samples, rate = W.decode_wav(bytes(src.loc[mid, "payload"]))
        got = np.frombuffer(bytes(out.loc[mid, "samples"]), dtype="<f8") \
            .reshape(out.loc[mid, "n_frames"], out.loc[mid, "n_channels"])
        np.testing.assert_array_equal(got, samples)
        assert out.loc[mid, "sample_rate"] == rate
    assert not out.loc[[i for i in src.index if i not in wav_ids], "ok"].any()
