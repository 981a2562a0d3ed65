"""Minimal real WAV (RIFF/WAVE PCM) codec — pure stdlib struct + numpy.

Closes the audio third of the multimodal codec seam the way
``functions/png.py`` and ``functions/jpeg.py`` closed the raster
formats: RIFF is a public container (Microsoft/IBM WAVE spec, also
RFC 2361 for format tags) and integer PCM needs no entropy decoding at
all — parsing it honestly requires only byte math.

Scope (documented, checked, raising on anything else):
* RIFF/WAVE container, ``fmt `` + ``data`` chunks (extra chunks such
  as LIST/fact/cue are skipped by their declared size, like any
  well-behaved reader)
* format 1 (integer PCM: unsigned 8-bit, signed 16/24/32-bit) and
  format 3 (IEEE float32), including the WAVE_FORMAT_EXTENSIBLE
  (0xFFFE) wrapper that real encoders emit for >2 channels
* any channel count / sample rate; samples come back as float64 in
  [-1, 1], shape (frames, channels)

Compressed formats (MP3/AAC/Vorbis inside RIFF, a-law/mu-law) raise —
they are the remaining audio seam, honestly marked.

Decode ceiling: ``max_frames`` caps the declared data size before any
allocation (same untrusted-crawl-media rationale as ``png.MAX_PIXELS``).
"""

from __future__ import annotations

import struct

import numpy as np

#: 10 minutes of stereo 48 kHz — far above any crawl asset, far below OOM
MAX_FRAMES = 48_000 * 600

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16) -> bytes:
    """(frames,) or (frames, channels) float in [-1, 1] -> WAV bytes
    (integer PCM at ``bits`` in {8, 16, 32}, or IEEE float32 with
    ``bits=-32``)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[0] == 0:
        raise ValueError("samples must be (frames,) or (frames, channels), non-empty")
    frames, nch = x.shape
    x = np.clip(x, -1.0, 1.0)
    if bits == -32:
        fmt_tag, bps, payload = 3, 32, x.astype("<f4").tobytes()
    elif bits == 8:
        fmt_tag, bps = 1, 8
        payload = np.round((x + 1.0) * 127.5).astype(np.uint8).tobytes()
    elif bits in (16, 32):
        fmt_tag, bps = 1, bits
        scale = float(2 ** (bits - 1) - 1)
        payload = np.round(x * scale).astype(f"<i{bits // 8}").tobytes()
    else:
        raise ValueError("bits must be 8, 16, 32 or -32 (float32)")
    block = nch * bps // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, nch, sample_rate,
                      sample_rate * block, block, bps)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes, max_frames: int = MAX_FRAMES) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1, 1] shaped (frames,
    channels), sample_rate). Raises ValueError on anything outside the
    documented scope or past ``max_frames``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag in GUID
                if len(chunk) < 40:
                    raise ValueError("truncated extensible fmt chunk")
                (sub_tag,) = struct.unpack("<H", chunk[24:26])
                fmt = (sub_tag,) + fmt[1:]
        elif tag == b"data":
            if len(chunk) != size:
                raise ValueError("truncated data chunk")
            payload = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    fmt_tag, nch, rate, _byte_rate, _block, bps = fmt
    if nch == 0 or rate == 0:
        raise ValueError("zero channels or sample rate")
    if fmt_tag == 1 and bps in (8, 16, 24, 32):
        bytes_per = bps // 8
    elif fmt_tag == 3 and bps == 32:
        bytes_per = 4
    else:
        raise ValueError(
            f"unsupported WAV format tag {fmt_tag} / {bps}-bit "
            "(integer PCM 8/16/24/32 or float32 only — compressed audio "
            "is the remaining seam)")
    frames = len(payload) // (bytes_per * nch)
    if frames > max_frames:
        raise ValueError(
            f"refusing {frames} frames (> {max_frames} cap — bomb guard)")
    payload = payload[:frames * bytes_per * nch]
    if fmt_tag == 3:
        x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    elif bps == 24:  # no native int24: widen via byte tricks
        b = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        x = (b[:, 0].astype(np.int32)
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int8).astype(np.int32) << 16)).astype(np.float64)
        x /= float(2 ** 23 - 1)
    else:
        raw = np.frombuffer(payload, dtype=_PCM_DTYPES[bps])
        if bps == 8:
            x = raw.astype(np.float64) / 127.5 - 1.0
        else:
            x = raw.astype(np.float64) / float(2 ** (bps - 1) - 1)
    return np.clip(x, -1.0, 1.0).reshape(frames, nch), rate


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """Deterministic per-clip features from REAL decoded samples:
    [duration_sec, rms, peak, zero_crossing_rate, spectral_centroid_hz
    (scaled by Nyquist), n_bands log-power band energies]. float32,
    length 5 + n_bands."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(5 + n_bands, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono ** 2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = float(spec.sum())
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    nyquist = rate / 2.0
    edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
    bands = np.array([
        np.log1p(spec[a:b].sum()) for a, b in zip(edges[:-1], edges[1:])
    ])
    return np.concatenate([
        [n / rate, rms, peak, zcr, centroid / nyquist], bands
    ]).astype(np.float32)
