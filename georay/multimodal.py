"""Multimodal binary columns — audio/video payloads as opaque ``binary``
with typed metadata, decode/feature stages as actor pools (repo charter:
the decode itself is STUBBED — no av libs in this container — behind
import-try / NotImplementedError, while the Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested).

Image decode is the REAL implementation in :mod:`georay.codecs`; this
module extends the same table shape to the other modalities.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["AUDIO_SCHEMA", "VIDEO_SCHEMA", "audio_table", "video_table",
           "AudioFeatures", "VideoFrameSampler", "fake_pcm_encode",
           "fake_pcm_decode"]

AUDIO_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("bytes", pa.binary()),            # encoded payload (opaque)
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int32()),
    ("codec", pa.string()),            # "pcm16" (decodable) | "opus" (stub)
    ("transcript", pa.string()),
])

VIDEO_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("n_frames", pa.int32()),
    ("fps", pa.float32()),
    ("codec", pa.string()),            # "rawrgb" (decodable) | "h264" (stub)
    ("caption", pa.string()),
])

_PCM_MAGIC = b"GPA1"


def fake_pcm_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Deterministic int16 PCM container (the in-repo decodable codec)."""
    s16 = np.clip(np.asarray(samples) * 32767.0, -32768, 32767)\
        .astype("<i2")
    return _PCM_MAGIC + struct.pack("<Ii", sample_rate, len(s16)) + s16.tobytes()


def fake_pcm_decode(data: bytes) -> tuple:
    data = bytes(data)
    if data[:4] != _PCM_MAGIC:
        raise ValueError("not a GPA1 payload")
    rate, n = struct.unpack_from("<Ii", data, 4)
    samples = np.frombuffer(data, dtype="<i2", count=n, offset=12)
    return samples.astype(np.float64) / 32767.0, rate


def audio_table(n: int) -> pa.Table:
    """Deterministic audio fixtures: sine mixtures, pure function of i."""
    rows = []
    for i in range(n):
        rate = 16000
        t = np.arange(rate // 4) / rate  # 250 ms
        f0 = 110.0 * (1 + (i % 13))
        sig = 0.6 * np.sin(2 * np.pi * f0 * t) \
            + 0.3 * np.sin(2 * np.pi * 2.5 * f0 * t)
        rows.append((f"aud{i:06d}", fake_pcm_encode(sig, rate), rate,
                     len(t), "pcm16" if i % 2 == 0 else "opus",
                     f"transcript of aud{i:06d}"))
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.binary()),
         pa.array(cols[2], pa.int32()), pa.array(cols[3], pa.int32()),
         pa.array(cols[4], pa.string()), pa.array(cols[5], pa.string())],
        schema=AUDIO_SCHEMA)


def video_table(n: int, w: int = 32, h: int = 24, frames: int = 8) -> pa.Table:
    """Deterministic video fixtures: raw RGB frame stacks."""
    rows = []
    for i in range(n):
        arr = ((np.arange(frames * h * w * 3) * (i + 7)) % 251)\
            .astype(np.uint8)
        rows.append((f"vid{i:06d}", arr.tobytes(), w, h, frames,
                     np.float32(12.0),
                     "rawrgb" if i % 2 == 0 else "h264",
                     f"caption of vid{i:06d}"))
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.binary()),
         pa.array(cols[2], pa.int32()), pa.array(cols[3], pa.int32()),
         pa.array(cols[4], pa.int32()), pa.array(cols[5], pa.float32()),
         pa.array(cols[6], pa.string()), pa.array(cols[7], pa.string())],
        schema=VIDEO_SCHEMA)


try:
    import soundfile as _sf  # noqa: F401  (absent in this container)
    _HAVE_AUDIO_LIB = True
except ImportError:
    _HAVE_AUDIO_LIB = False


class AudioFeatures:
    """Actor-pool stage: decode + spectral features (rms, zero-crossing
    rate, dominant-frequency bin via FFT).  ``codec="pcm16"`` decodes for
    real; compressed codecs raise NotImplementedError unless an audio lib
    is importable — the plumbing (schema, batch flow) is identical."""

    def __init__(self, n_fft: int = 1024):
        self.n_fft = n_fft
        self.window = np.hanning(n_fft)  # per-actor state

    def _decode(self, data: bytes, codec: str):
        if codec == "pcm16":
            return fake_pcm_decode(data)
        if _HAVE_AUDIO_LIB:
            raise NotImplementedError("wire soundfile decode here")
        raise NotImplementedError(
            f"codec {codec!r} needs an audio library (absent); "
            "fixtures use the decodable pcm16 container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        domf = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                sig, rate = self._decode(batch["bytes"][i].as_py(),
                                         batch["codec"][i].as_py())
            except NotImplementedError:
                continue
            ok[i] = True
            rms[i] = float(np.sqrt(np.mean(sig ** 2)))
            zcr[i] = float((np.diff(np.signbit(sig)) != 0).mean())
            seg = sig[:self.n_fft]
            if len(seg) < self.n_fft:
                seg = np.pad(seg, (0, self.n_fft - len(seg)))
            spec = np.abs(np.fft.rfft(seg * self.window))
            domf[i] = float(np.argmax(spec[1:]) + 1) * rate / self.n_fft
        for name, arr in [("decoded", ok), ("rms", rms), ("zcr", zcr),
                          ("dominant_hz", domf)]:
            batch = batch.append_column(name, pa.array(arr))
        return batch.drop_columns(["bytes"])


class VideoFrameSampler:
    """Actor-pool stage: sample every k-th frame and emit per-frame rows
    with a frame checksum — the frame-extraction layout for downstream
    vision stages.  ``rawrgb`` decodes for real; compressed codecs stub."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .stats import gdal_checksum
        vids, frames, sums = [], [], []
        for i in range(batch.num_rows):
            codec = batch["codec"][i].as_py()
            if codec != "rawrgb":
                continue  # stub: compressed video needs an av lib
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            nf = batch["n_frames"][i].as_py()
            arr = np.frombuffer(batch["bytes"][i].as_buffer(),
                                dtype=np.uint8).reshape(nf, h, w, 3)
            for f in range(0, nf, self.k):
                vids.append(batch["video_id"][i].as_py())
                frames.append(f)
                sums.append(int(gdal_checksum(arr[f, :, :, 0])))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame": pa.array(frames, pa.int64()),
            "frame_checksum": pa.array(sums, pa.int64()),
        })
