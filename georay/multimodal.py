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
           "fake_pcm_decode", "wav_encode", "wav_decode", "mulaw_encode",
           "mulaw_decode", "flac_audio_encode", "flac_audio_decode",
           "decode_audio", "mel_filterbank",
           "MelSpectrogram", "AugmentAudio", "AugmentVideo"]

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
        # cycle REAL codecs (wav RIFF, pcm16 container, G.711 μ-law,
        # from-scratch FLAC) with the opus stub — decoded count = 4n/5
        codec = ("wav", "pcm16", "mulaw", "flac", "opus")[i % 5]
        enc = {"wav": wav_encode, "pcm16": fake_pcm_encode,
               "mulaw": mulaw_encode,
               "flac": flac_audio_encode}.get(codec, fake_pcm_encode)
        rows.append((f"aud{i:06d}", enc(sig, rate), rate,
                     len(t), codec, f"transcript of aud{i:06d}"))
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.binary()),
         pa.array(cols[2], pa.int32()), pa.array(cols[3], pa.int32()),
         pa.array(cols[4], pa.string()), pa.array(cols[5], pa.string())],
        schema=AUDIO_SCHEMA)


def mjpeg_encode(frames: np.ndarray, quality: int = 92) -> bytes:
    """(nf, h, w, 3) uint8 → concatenated JFIF frames (the Motion-JPEG
    essence: every frame is a complete baseline JPEG from the
    from-scratch codec in georay/jpeg.py)."""
    from .jpeg import jpeg_encode
    return b"".join(jpeg_encode(f, quality=quality) for f in frames)


def _jpeg_end(data: bytes, pos: int) -> int:
    """Index just past the EOI of the JPEG starting at ``pos`` — a real
    marker walk (length-prefixed segments skipped wholesale, entropy
    data scanned with byte-stuffing/restart awareness), never a naive
    EOI byte search (segment payloads may contain FF D9)."""
    p = pos + 2                               # past SOI
    while True:
        if data[p] != 0xFF:
            raise ValueError("mjpeg: marker desync")
        m = data[p + 1]
        if m == 0xD9:                         # EOI
            return p + 2
        if m == 0x01 or 0xD0 <= m <= 0xD7:    # TEM / RSTn: bare markers
            p += 2
            continue
        ln = int.from_bytes(data[p + 2:p + 4], "big")
        p += 2 + ln
        if m == 0xDA:                         # SOS: skip entropy bytes
            while True:
                q = data.index(b"\xff", p)
                m2 = data[q + 1]
                if m2 == 0x00 or 0xD0 <= m2 <= 0xD7:
                    p = q + 2                 # stuffed FF / restart
                    continue
                p = q
                break


def mjpeg_decode(data: bytes, n_frames: int) -> np.ndarray:
    """Concatenated JFIF stream → (nf, h, w, 3) uint8."""
    from .jpeg import jpeg_decode
    data = bytes(data)
    outs = []
    pos = 0
    for _ in range(n_frames):
        if data[pos:pos + 2] != b"\xff\xd8":
            raise ValueError("mjpeg: lost SOI sync")
        end = _jpeg_end(data, pos)
        outs.append(jpeg_decode(data[pos:end]))
        pos = end
    return np.stack(outs)


def video_table(n: int, w: int = 32, h: int = 24, frames: int = 8) -> pa.Table:
    """Deterministic video fixtures: raw RGB frame stacks, Motion-JPEG
    through the from-scratch JPEG codec, and the h264 native-lib stub."""
    rows = []
    for i in range(n):
        arr = ((np.arange(frames * h * w * 3) * (i + 7)) % 251)\
            .astype(np.uint8)
        codec = ("rawrgb", "mjpeg", "h264")[i % 3]
        payload = mjpeg_encode(
            arr.reshape(frames, h, w, 3)) if codec == "mjpeg" \
            else arr.tobytes()
        rows.append((f"vid{i:06d}", payload, w, h, frames,
                     np.float32(12.0), codec,
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
        # wav / pcm16 / mulaw decode for real (see decode_audio below);
        # compressed codecs raise unless an audio lib is importable
        return decode_audio(data, codec)

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
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            nf = batch["n_frames"][i].as_py()
            if codec == "rawrgb":
                arr = np.frombuffer(batch["bytes"][i].as_buffer(),
                                    dtype=np.uint8).reshape(nf, h, w, 3)
            elif codec == "mjpeg":
                arr = mjpeg_decode(batch["bytes"][i].as_py(), nf)
            else:
                continue  # stub: h264 needs an av lib
            for f in range(0, nf, self.k):
                vids.append(batch["video_id"][i].as_py())
                frames.append(f)
                sums.append(int(gdal_checksum(arr[f, :, :, 0])))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame": pa.array(frames, pa.int64()),
            "frame_checksum": pa.array(sums, pa.int64()),
        })


# ---------------------------------------------------------------------------
# REAL audio codecs: RIFF/WAVE PCM and G.711 μ-law (both public formats,
# implementable without any audio library — the opus/h264 stubs above are
# for codecs that genuinely need native libs)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float[-1,1] mono → 16-bit PCM RIFF/WAVE bytes (canonical 44-byte
    header; any standard reader decodes this)."""
    s16 = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0,
                  -32768, 32767).astype("<i2")
    data = s16.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" \
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16) \
        + b"data" + struct.pack("<I", len(data))
    return hdr + data


def wav_decode(data: bytes):
    """RIFF/WAVE → (float64 mono samples in [-1,1], sample_rate).
    Supports PCM 8/16-bit, any channel count (averaged to mono), and
    walks chunks properly (fmt may not precede data directly)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            samples = body
        pos += 8 + size + (size & 1)
    if fmt is None or samples is None:
        raise ValueError("truncated WAVE (missing fmt/data)")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 3:              # IEEE float (WAVE_FORMAT_IEEE_FLOAT)
        if bits == 32:
            arr = np.frombuffer(samples, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(samples, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float WAVE")
    elif audio_fmt != 1:
        raise NotImplementedError("only PCM/IEEE-float WAVE supported")
    elif bits == 16:
        arr = np.frombuffer(samples, dtype="<i2").astype(np.float64) \
            / 32767.0
    elif bits == 8:
        arr = (np.frombuffer(samples, dtype=np.uint8)
               .astype(np.float64) - 128.0) / 127.0
    elif bits == 24:
        # 3-byte little-endian signed → int32 (sign via arithmetic shift)
        raw = np.frombuffer(samples, dtype=np.uint8)
        raw = raw[: len(raw) // 3 * 3].reshape(-1, 3).astype(np.uint32)
        u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        arr = (u.astype(np.int32) << 8 >> 8).astype(np.float64) / 8388607.0
    elif bits == 32:
        arr = np.frombuffer(samples, dtype="<i4").astype(np.float64) \
            / 2147483647.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    if n_ch > 1:
        arr = arr[: len(arr) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr, rate


_MULAW_MU = 255.0


def mulaw_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """G.711 μ-law companding (real lossy audio codec, ~48 dB SNR on
    speech-level signals): float[-1,1] → 8-bit codes with a tiny header."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MULAW_MU * np.abs(x)) / np.log1p(_MULAW_MU)
    codes = np.round((y + 1.0) * 127.5).astype(np.uint8)
    return b"GMU1" + struct.pack("<Ii", sample_rate, len(codes)) \
        + codes.tobytes()


def mulaw_decode(data: bytes):
    data = bytes(data)
    if data[:4] != b"GMU1":
        raise ValueError("not a GMU1 payload")
    rate, n = struct.unpack_from("<Ii", data, 4)
    codes = np.frombuffer(data, dtype=np.uint8, count=n, offset=12)
    y = codes.astype(np.float64) / 127.5 - 1.0
    x = np.sign(y) * (np.power(1.0 + _MULAW_MU, np.abs(y)) - 1.0) / _MULAW_MU
    return x, rate


def flac_audio_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float[-1,1] mono → FLAC bytes (the from-scratch spec codec in
    georay/flac.py), quantized to 16-bit like ``wav_encode`` so the two
    lossless paths decode to identical floats."""
    from .flac import flac_encode
    s16 = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0,
                  -32768, 32767).astype(np.int64)
    return flac_encode(s16, sample_rate, bps=16)


def flac_audio_decode(data: bytes):
    from .flac import flac_decode
    arr, rate = flac_decode(bytes(data))
    return arr.mean(axis=1) / 32767.0, rate


def decode_audio(data: bytes, codec: str):
    """Dispatch: wav/pcm16/mulaw/flac decode for real; compressed codecs
    that need native libs raise NotImplementedError (stub documented)."""
    if codec == "wav":
        return wav_decode(data)
    if codec == "pcm16":
        return fake_pcm_decode(data)
    if codec == "mulaw":
        return mulaw_decode(data)
    if codec == "flac":
        return flac_audio_decode(data)
    raise NotImplementedError(
        f"codec {codec!r} needs an audio library (absent in this "
        "container); wav/pcm16/mulaw/flac decode for real")


def mel_filterbank(n_mels: int, n_fft: int, rate: float) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale) — (n_mels, n_fft//2+1)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64)
                                 / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(rate / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / rate).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ce, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ce):
            if ce > lo:
                fb[m - 1, k] = (k - lo) / (ce - lo)
        for k in range(ce, hi):
            if hi > ce:
                fb[m - 1, k] = (hi - k) / (hi - ce)
    return fb


class MelSpectrogram:
    """Actor-pool stage: decode → STFT (hann window, hop n_fft//2) → mel
    power spectrogram → log; emits per-row mean mel vector + frame count.
    The filterbank and window build ONCE per actor (stateful-stage
    discipline); all per-batch math is numpy FFT."""

    def __init__(self, n_fft: int = 512, n_mels: int = 20,
                 rate: float = 16000.0):
        self.n_fft = n_fft
        self.n_mels = n_mels
        self.window = np.hanning(n_fft)
        self.fb = mel_filterbank(n_mels, n_fft, rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        means = np.zeros((n, self.n_mels))
        frames_n = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        hop = self.n_fft // 2
        for i in range(n):
            try:
                sig, rate = decode_audio(batch["bytes"][i].as_py(),
                                         batch["codec"][i].as_py())
            except NotImplementedError:
                continue
            ok[i] = True
            if len(sig) < self.n_fft:
                sig = np.pad(sig, (0, self.n_fft - len(sig)))
            n_frames = 1 + (len(sig) - self.n_fft) // hop
            idx = (np.arange(self.n_fft)[None, :]
                   + hop * np.arange(n_frames)[:, None])
            frames = sig[idx] * self.window[None, :]
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            mel = np.log10(np.maximum(spec @ self.fb.T, 1e-12))
            means[i] = mel.mean(axis=0)
            frames_n[i] = n_frames
        batch = batch.append_column("decoded", pa.array(ok))
        batch = batch.append_column(
            "mel_mean", pa.array(list(means),
                                 pa.list_(pa.float64(), self.n_mels)))
        batch = batch.append_column("n_frames_stft", pa.array(frames_n))
        return batch.drop_columns(["bytes"])


class SceneDetect:
    """Actor-pool stage: shot-boundary detection per video — the frame
    sampler's sibling for shot-aware frame extraction (training
    pipelines sample per SHOT, not per fixed stride, so near-duplicate
    frames inside a shot don't dominate).

    Method: per-frame 3×16-bin RGB histograms (vectorized bincount over
    the whole frame stack), L1 distance between consecutive frames
    normalized to [0, 2]; a boundary where the distance exceeds
    ``threshold``.  Emits one row per scene: (video_id, scene,
    start_frame, n_frames).  ``rawrgb``/``mjpeg`` decode for real,
    stub codecs pass (no rows)."""

    def __init__(self, threshold: float = 0.5, bins: int = 16):
        self.threshold = float(threshold)
        self.bins = int(bins)

    def _hists(self, arr: np.ndarray) -> np.ndarray:
        nf = arr.shape[0]
        q = (arr.astype(np.int64) >> 4) if self.bins == 16 else \
            (arr.astype(np.int64) * self.bins) >> 8
        # offset per (frame, channel) so ONE bincount does everything
        offs = (np.arange(nf)[:, None, None, None] * 3
                + np.arange(3)[None, None, None, :]) * self.bins
        flat = (q + offs).ravel()
        h = np.bincount(flat, minlength=nf * 3 * self.bins)
        h = h.reshape(nf, 3 * self.bins).astype(np.float64)
        return h / h.sum(axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, scenes, starts, lens = [], [], [], []
        for i in range(batch.num_rows):
            codec = batch["codec"][i].as_py()
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            nf = batch["n_frames"][i].as_py()
            if codec == "rawrgb":
                arr = np.frombuffer(batch["bytes"][i].as_buffer(),
                                    dtype=np.uint8).reshape(nf, h, w, 3)
            elif codec == "mjpeg":
                arr = mjpeg_decode(batch["bytes"][i].as_py(), nf)
            else:
                continue                     # stub: h264 needs an av lib
            hists = self._hists(arr)
            d = np.abs(np.diff(hists, axis=0)).sum(axis=1)
            cuts = np.flatnonzero(d > self.threshold) + 1
            bounds = np.concatenate([[0], cuts, [nf]])
            vid = batch["video_id"][i].as_py()
            for s in range(len(bounds) - 1):
                vids.append(vid)
                scenes.append(s)
                starts.append(int(bounds[s]))
                lens.append(int(bounds[s + 1] - bounds[s]))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "scene": pa.array(scenes, pa.int64()),
            "start_frame": pa.array(starts, pa.int64()),
            "n_frames": pa.array(lens, pa.int64()),
        })


class AudioResample:
    """Actor-pool stage: sample-rate conversion by windowed-sinc
    interpolation with anti-alias cutoff scaling (the standard public
    bandlimited-resampling construction, Smith's resample algorithm).

    Stateful-stage discipline: taps/cutoff constants and the Hann
    window are fixed per actor in ``__init__``; per row the kernel is
    one vectorized gather + weighted sum (n_out × taps), no Python
    sample loop.  Output replaces ``bytes`` with a wav at
    ``target_rate`` and records ``orig_rate`` as an audit column; rows
    whose codec is a stub pass through untouched (null audit)."""

    def __init__(self, target_rate: int, taps: int = 32,
                 cutoff: float = 0.95):
        self.target_rate = int(target_rate)
        self.taps = int(taps)
        self.cutoff = float(cutoff)

    def _resample(self, x: np.ndarray, rate_in: int) -> np.ndarray:
        if rate_in == self.target_rate:
            return x.astype(np.float64)
        ratio = self.target_rate / rate_in
        n_out = int(round(len(x) * ratio))
        # anti-alias: cutoff at the narrower Nyquist
        fc = 0.5 * self.cutoff * min(1.0, ratio)
        pos = np.arange(n_out) / ratio          # output n -> input pos
        base = np.floor(pos).astype(np.int64)
        half = self.taps // 2
        offs = np.arange(-half + 1, half + 1)
        idx = base[:, None] + offs[None, :]
        frac = pos[:, None] - idx               # signed distances
        # Hann-windowed sinc, window spanning the tap range
        w = (np.sinc(2.0 * fc * frac) * 2.0 * fc
             * (0.5 + 0.5 * np.cos(np.pi * frac / half)))
        w[np.abs(frac) >= half] = 0.0
        w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        xp = np.pad(x.astype(np.float64), (half, half), mode="edge")
        return (xp[idx + half] * w).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_b, out_c, orig = [], [], []
        for i in range(batch.num_rows):
            codec = batch["codec"][i].as_py()
            if codec not in ("wav", "pcm16", "mulaw", "flac"):
                out_b.append(batch["bytes"][i].as_py())
                out_c.append(codec)
                orig.append(None)
                continue
            samples, rate = decode_audio(batch["bytes"][i].as_py(), codec)
            y = self._resample(np.asarray(samples, np.float64), rate)
            # decode_audio and wav_encode both speak normalized [-1, 1]
            out_b.append(wav_encode(y, self.target_rate))
            out_c.append("wav")
            orig.append(rate)
        names = batch.column_names
        batch = batch.set_column(names.index("bytes"), "bytes",
                                 pa.array(out_b, pa.binary()))
        batch = batch.set_column(names.index("codec"), "codec",
                                 pa.array(out_c, pa.string()))
        return batch.append_column("orig_rate", pa.array(orig, pa.int64()))


class AugmentAudio:
    """Deterministic audio augmentation stage — the audio sibling of
    georay.augment.AugmentImages: per-row gain, circular time shift and
    additive noise, every parameter a splitmix64 function of
    ``(audio_id hash, seed)`` (reproducible on any cluster size), with
    the applied parameters emitted as audit columns.

    Input rows: ``audio_id, bytes, codec`` (any codec the dispatch
    knows: wav/mulaw/pcm16 — the audio_table layout); output replaces
    ``bytes`` with the augmented wav and adds
    ``aug_gain, aug_shift, aug_noise``."""

    def __init__(self, seed: int = 0, gain_db: float = 6.0,
                 max_shift: float = 0.25, noise_amp: float = 0.01):
        from .util import hash_strings
        self._hash = hash_strings
        self.seed = seed
        self.gain_db = float(gain_db)
        self.max_shift = float(max_shift)
        self.noise_amp = float(noise_amp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .augment import _splitmix
        h = _splitmix(self._hash(batch["audio_id"])
                      ^ np.uint64(self.seed))
        u = lambda sh: ((h >> np.uint64(sh)) & np.uint64(0xFFFF)) / 65535.0
        gains = 10.0 ** (((u(1) * 2 - 1) * self.gain_db) / 20.0)
        shifts = u(17) * self.max_shift
        namps = u(33) * self.noise_amp
        fmts = batch["codec"].to_pylist()
        out_b, out_c, out_g, out_s, out_n = [], [], [], [], []
        for i in range(batch.num_rows):
            if fmts[i] not in ("wav", "pcm16", "mulaw"):
                # stub codecs (opus/h264 need native libs): pass the row
                # through untouched with null audit params
                out_b.append(batch["bytes"][i].as_py())
                out_c.append(fmts[i])
                out_g.append(None)
                out_s.append(None)
                out_n.append(None)
                continue
            samples, rate = decode_audio(batch["bytes"][i].as_py(),
                                         fmts[i])
            x = samples.astype(np.float64)
            k = int(round(shifts[i] * len(x)))
            if k:
                x = np.roll(x, k)
            x = x * gains[i]
            # deterministic "noise": a fixed-phase sine per row (seeded
            # frequency) — reproducible without any RNG state
            f = 200.0 + (float(h[i] >> np.uint64(49)) % 1800.0)
            t = np.arange(len(x)) / rate
            x = x + namps[i] * np.sin(2 * np.pi * f * t)
            x = np.clip(x, -1.0, 1.0)
            out_b.append(wav_encode(x, rate))
            out_c.append("wav")
            out_g.append(float(gains[i]))
            out_s.append(k)
            out_n.append(float(namps[i]))
        keep = [c for c in batch.schema.names
                if c not in ("bytes", "codec")]
        out = pa.table({c: batch[c] for c in keep})
        out = out.append_column("bytes", pa.array(out_b, pa.binary()))
        out = out.append_column("codec", pa.array(out_c, pa.string()))
        out = out.append_column("aug_gain",
                                pa.array(out_g, pa.float64()))
        out = out.append_column("aug_shift",
                                pa.array(out_s, pa.int64()))
        out = out.append_column("aug_noise",
                                pa.array(out_n, pa.float64()))
        return out


class AugmentVideo:
    """Deterministic video augmentation — the temporal sibling of
    AugmentImages/AugmentAudio: per-row temporal crop (keep a contiguous
    ``keep_frac`` window at a hash-chosen start), frame stride, and
    horizontal flip, all parameters splitmix64 functions of
    ``(video_id, seed)``; stub codecs (h264) pass through untouched with
    null audit params.  Emits ``aug_t0, aug_stride, aug_flip``."""

    def __init__(self, seed: int = 0, keep_frac: float = 0.5,
                 max_stride: int = 2):
        from .util import hash_strings
        self._hash = hash_strings
        self.seed = seed
        self.keep_frac = float(keep_frac)
        self.max_stride = int(max_stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .augment import _splitmix
        h = _splitmix(self._hash(batch["video_id"])
                      ^ np.uint64(self.seed))
        u = lambda sh: ((h >> np.uint64(sh)) & np.uint64(0xFFFF)) / 65535.0
        codecs_l = batch["codec"].to_pylist()
        w_arr = batch["w"].to_numpy()
        h_arr = batch["h"].to_numpy()
        nf_arr = batch["n_frames"].to_numpy()
        out_b, out_nf, out_t0, out_st, out_fl = [], [], [], [], []
        for i in range(batch.num_rows):
            codec = codecs_l[i]
            if codec not in ("rawrgb", "mjpeg"):
                out_b.append(batch["bytes"][i].as_py())
                out_nf.append(int(nf_arr[i]))
                out_t0.append(None)
                out_st.append(None)
                out_fl.append(None)
                continue
            W, H, F = int(w_arr[i]), int(h_arr[i]), int(nf_arr[i])
            if codec == "mjpeg":
                vid = mjpeg_decode(batch["bytes"][i].as_py(), F)
            else:
                vid = np.frombuffer(batch["bytes"][i].as_buffer(),
                                    dtype=np.uint8).reshape(F, H, W, 3)
            keep = max(1, int(round(F * self.keep_frac)))
            t0 = min(int(u(1)[i] * F), F - keep)
            stride = (1 + int(u(17)[i] * self.max_stride)
                      % self.max_stride) if self.max_stride > 1 else 1
            flip = bool((h[i] & np.uint64(1)) == 1)
            sel = vid[t0:t0 + keep:stride]
            if flip:
                sel = sel[:, :, ::-1]
            sel = np.ascontiguousarray(sel)
            out_b.append(mjpeg_encode(sel) if codec == "mjpeg"
                         else sel.tobytes())
            out_nf.append(sel.shape[0])
            out_t0.append(t0)
            out_st.append(stride)
            out_fl.append(flip)
        keep_cols = [c for c in batch.schema.names
                     if c not in ("bytes", "n_frames")]
        out = pa.table({c: batch[c] for c in keep_cols})
        out = out.append_column("bytes", pa.array(out_b, pa.binary()))
        out = out.append_column("n_frames",
                                pa.array(out_nf, pa.int32()))
        out = out.append_column("aug_t0", pa.array(out_t0, pa.int64()))
        out = out.append_column("aug_stride",
                                pa.array(out_st, pa.int64()))
        out = out.append_column("aug_flip", pa.array(out_fl, pa.bool_()))
        return out
