"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode support is tiered by what this environment can honestly do:

* **REAL decode** for ``audio/wav`` (PCM via the stdlib ``wave``
  module) and ``image/bmp`` (24-bit uncompressed via ``struct`` header
  parsing) — actual byte-level codecs, no external libraries, used by
  ``MediaFeatureExtractor(mode="real")`` and checked against an
  independent straight-line decoder in the frozen-golden harness.
* **REAL decode** also for ``image/png`` (zlib inflate + filter
  reconstruction) and ``image/jpeg`` (baseline Huffman + DCT) via the
  pure-stdlib codecs in ``functions/codecs.py`` (round-3 addition) —
  scope per their docstring (8-bit non-interlaced PNG; baseline 4:4:4 /
  grayscale JPEG), out-of-scope payloads raise ``NotImplementedError``
  naming the feature.
* **REAL container-level parsing** for ``video/mp4`` (round-4):
  ``codecs.parse_mp4`` walks the ISO-BMFF box tree (ftyp/moov/trak/
  stbl sample tables) for per-track codec id, dimensions, duration,
  sample counts/sizes — everything a curation pipeline filters on.
  Only FRAME decode (H.264 entropy) remains a declared stub
  (``codecs.decode_mp4_frames`` raises naming ffmpeg); ``mode="fake"``
  still produces a deterministic byte-histogram feature so
  arbitrary-format pipelines stay testable end-to-end.

The Ray-side plumbing — schema, actor-pool stage signature, per-batch
layout, byte-budgeted batch sizing — is identical across all tiers.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),       # opaque encoded bytes
        pa.field("media_type", pa.string()),    # image/jpeg, audio/wav, ...
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def fake_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(64, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(
                [("image/jpeg", "audio/wav")[i % 2] for i in range(n)]
            ),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# real codecs (stdlib-only): PCM WAV and 24-bit BMP
# ---------------------------------------------------------------------------


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """PCM16 mono samples (int16 ndarray) → WAV container bytes. The
    single encoder shared by synth_wav and resample_wav (goldens compare
    md5 of emitted bytes, so there must be exactly one writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def encode_bmp(px_rgb: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → uncompressed 24-bit BMP bytes (BGR,
    bottom-up, 4-byte-aligned rows). The single encoder shared by
    synth_bmp and resize_bmp — exact inverse of decode_bmp."""
    height, width, _ = px_rgb.shape
    bgr = px_rgb[..., ::-1]
    pad = (-(width * 3)) % 4
    body = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(height - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def synth_wav(seed: int, duration_ms: int = 250, rate: int = 8000) -> bytes:
    """Valid PCM16 mono WAV bytes: a seeded sine + noise mixture."""
    rng = np.random.default_rng(seed)
    n = max(1, rate * duration_ms // 1000)
    t = np.arange(n, dtype=np.float64) / rate
    freq = 200.0 + float(rng.integers(0, 2000))
    x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    return encode_wav(pcm, rate)


def synth_bmp(seed: int, width: int = 32, height: int = 24) -> bytes:
    """Valid uncompressed 24-bit BMP bytes with seeded pixels (the rng
    block is in BGR layout, matching the on-disk order)."""
    rng = np.random.default_rng(seed)
    px_bgr = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return encode_bmp(px_bgr[..., ::-1])


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """(float64 mono samples in [-1, 1], sample_rate, n_channels)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw != 2:
        raise ValueError(f"only PCM16 wav supported, got sampwidth={sw}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate, nch


def decode_bmp(payload: bytes) -> np.ndarray:
    """uint8 RGB pixel array (height, width, 3) from a 24-bit BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_offset
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR -> RGB


def real_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media rows whose payloads are REAL WAV/BMP bytes."""
    rng = np.random.default_rng(seed)
    ids, payloads, types, widths, heights, durs = [], [], [], [], [], []
    for i in range(n):
        ids.append(f"m-{i:06d}")
        if i % 2 == 0:
            w = int(rng.integers(8, 64))
            h = int(rng.integers(8, 64))
            payloads.append(synth_bmp(seed * 1_000_003 + i, w, h))
            types.append("image/bmp")
            widths.append(w); heights.append(h); durs.append(0)
        else:
            dur = int(rng.integers(50, 500))
            payloads.append(synth_wav(seed * 1_000_003 + i, dur))
            types.append("audio/wav")
            widths.append(0); heights.append(0); durs.append(dur)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "duration_ms": pa.array(np.array(durs, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def png_jpeg_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media rows whose payloads are REAL PNG/JPEG bytes
    (functions/codecs.py synth_* fixtures): even rows PNG, odd JPEG."""
    from vector_ray.functions.codecs import synth_jpeg, synth_png

    rng = np.random.default_rng(seed)
    ids, payloads, types, widths, heights = [], [], [], [], []
    for i in range(n):
        ids.append(f"m-{i:06d}")
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        if i % 2 == 0:
            payloads.append(synth_png(seed * 1_000_003 + i, w, h))
            types.append("image/png")
        else:
            payloads.append(synth_jpeg(seed * 1_000_003 + i, w, h))
            types.append("image/jpeg")
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "duration_ms": pa.array(np.zeros(n, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def wav_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """16-dim audio descriptor: 8 segment-RMS values + global stats."""
    x, rate, nch = decode_wav(payload)
    segs = np.array_split(x, 8)
    f = np.zeros(dim, np.float64)
    f[:8] = [np.sqrt(np.mean(s * s)) if len(s) else 0.0 for s in segs]
    f[8] = 1.0  # audio flag
    f[9] = nch
    f[10] = rate / 48000.0
    f[11] = len(x) / rate
    f[12] = np.sqrt(np.mean(x * x)) if len(x) else 0.0
    f[13] = np.max(np.abs(x)) if len(x) else 0.0
    f[14] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    return f.astype(np.float32)


def image_features(px_rgb: np.ndarray, dim: int = 16) -> np.ndarray:
    """16-dim image descriptor over decoded RGB pixels: 8-bin luminance
    histogram + shape/colour — shared by every image format's decoder."""
    px = px_rgb.astype(np.float64)
    h, w, _ = px.shape
    lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    f = np.zeros(dim, np.float64)
    f[:8] = hist / lum.size
    f[8] = 2.0  # image flag
    f[9] = w / 1024.0
    f[10] = h / 1024.0
    f[11] = w / h
    f[12:15] = px.reshape(-1, 3).mean(axis=0) / 255.0
    return f.astype(np.float32)


def bmp_features(payload: bytes, dim: int = 16) -> np.ndarray:
    return image_features(decode_bmp(payload), dim)


def mp4_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """16-dim video-container descriptor from the ISO-BMFF sample
    tables (codecs.parse_mp4 — no frame decode): movie duration, track
    mix, and the first video/audio tracks' sample-count / byte / rate
    statistics. The shape a curation pipeline filters on (drop clips
    shorter than X, bitrate outliers, missing audio)."""
    from vector_ray.functions.codecs import parse_mp4

    info = parse_mp4(payload)
    f = np.zeros(dim, np.float64)
    dur_s = info["duration"] / info["timescale"] if info["timescale"] else 0.0
    f[0] = 3.0  # video flag (1=audio, 2=image)
    f[1] = dur_s
    f[2] = len(info["tracks"])
    vid = next((t for t in info["tracks"] if t["handler"] == "vide"), None)
    aud = next((t for t in info["tracks"] if t["handler"] == "soun"), None)
    if vid is not None:
        tdur = vid["duration"] / vid["timescale"] if vid["timescale"] else 0.0
        f[3] = vid["width"] / 1024.0
        f[4] = vid["height"] / 1024.0
        f[5] = vid["n_samples"] / tdur if tdur else 0.0       # fps
        f[6] = vid["sample_bytes"] / 1e6
        f[7] = vid["sample_bytes"] / vid["n_samples"] / 1e3 if vid["n_samples"] else 0.0
        f[8] = vid["max_sample_bytes"] / 1e3
        f[9] = 8.0 * vid["sample_bytes"] / tdur / 1e6 if tdur else 0.0  # Mbps
    if aud is not None:
        adur = aud["duration"] / aud["timescale"] if aud["timescale"] else 0.0
        f[10] = 1.0
        f[11] = adur
        f[12] = aud["n_samples"] / 1e3
        f[13] = aud["sample_bytes"] / 1e6
    f[14] = sum(t["n_chunks"] for t in info["tracks"])
    f[15] = len(payload) / 1e6
    return f.astype(np.float32)


def mp4_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media rows whose payloads are REAL ISO-BMFF bytes
    (codecs.synth_mp4: avc1 video shell, odd seeds add an mp4a audio
    track)."""
    from vector_ray.functions.codecs import parse_mp4, synth_mp4

    ids, payloads, widths, heights, durs = [], [], [], [], []
    for i in range(n):
        p = synth_mp4(seed * 1_000_003 + i)
        info = parse_mp4(p)
        vid = next(t for t in info["tracks"] if t["handler"] == "vide")
        ids.append(f"m-{i:06d}")
        payloads.append(p)
        widths.append(vid["width"])
        heights.append(vid["height"])
        durs.append(
            int(1000 * info["duration"] / info["timescale"])
            if info["timescale"]
            else 0
        )
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video/mp4"] * n),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "duration_ms": pa.array(np.array(durs, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def fmp4_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media rows whose payloads are REAL fragmented
    ISO-BMFF bytes (codecs.synth_fmp4: empty moov sample tables + mvex
    defaults, samples in moof/mdat fragments — the streaming-video
    shape; round-5). ``mp4_features`` consumes them through the same
    ``parse_mp4``, which folds the fragment runs into the sample
    statistics."""
    from vector_ray.functions.codecs import parse_mp4, synth_fmp4

    ids, payloads, widths, heights, durs = [], [], [], [], []
    for i in range(n):
        p = synth_fmp4(seed * 1_000_003 + i)
        info = parse_mp4(p)
        vid = next(t for t in info["tracks"] if t["handler"] == "vide")
        ids.append(f"f-{i:06d}")
        payloads.append(p)
        widths.append(vid["width"])
        heights.append(vid["height"])
        durs.append(
            int(1000 * info["duration"] / info["timescale"])
            if info["timescale"]
            else 0
        )
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video/mp4"] * n),
            "width": pa.array(np.array(widths, np.int32)),
            "height": pa.array(np.array(heights, np.int32)),
            "duration_ms": pa.array(np.array(durs, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``mode="real"`` runs the stdlib WAV/BMP codecs above (raises for
    media types that need an absent library — honest scope);
    ``mode="stub"`` raises NotImplementedError for everything;
    ``mode="fake"`` produces a deterministic 16-dim byte-histogram
    feature so arbitrary-format pipelines are testable end-to-end.
    """

    FEATURE_DIM = 16

    def __init__(self, mode: str = "fake"):
        # per-actor setup: a real impl loads the codec / model here, once
        if mode not in ("real", "fake", "stub"):
            raise ValueError(f"unknown media decode mode {mode!r}")
        self.mode = mode

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "stub":
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this environment; use mode='fake' for plumbing tests"
            )
        if self.mode == "real":
            if media_type == "audio/wav":
                return wav_features(payload, self.FEATURE_DIM)
            if media_type == "image/bmp":
                return bmp_features(payload, self.FEATURE_DIM)
            if media_type == "image/png":
                from vector_ray.functions.codecs import decode_png

                return image_features(decode_png(payload), self.FEATURE_DIM)
            if media_type == "image/jpeg":
                from vector_ray.functions.codecs import decode_jpeg

                return image_features(decode_jpeg(payload), self.FEATURE_DIM)
            if media_type == "video/mp4":
                # container-level features are REAL (parse_mp4: sample
                # tables, duration, codec ids); FRAME decode remains
                # the declared stub (codecs.decode_mp4_frames raises)
                return mp4_features(payload, self.FEATURE_DIM)
            raise NotImplementedError(
                f"no stdlib codec for {media_type}; mp4 FRAME decode "
                "needs an external library (ffmpeg) not present here "
                "(container-level video/mp4 features ARE supported)"
            )
        # deterministic fake: histogram of byte values folded to 16 bins
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self.FEATURE_DIM, range=(0, 256))
        return (hist / max(len(arr), 1)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack(
            [self._decode(p, t) for p, t in zip(payloads, types)]
        ) if payloads else np.zeros((0, self.FEATURE_DIM), np.float32)
        features = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": features,
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )


def extract_features(ds, mode: str = "fake", concurrency: int = 4,
                     batch_size: int = 64):
    """Feature-extraction stage. ``batch_size`` is deliberately small:
    media payloads are large, so batch bytes — not rows — bound memory
    (SURVEY.md §7.4 'very wide rows')."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, re-encoded as BMP.

    Pure numpy integer-gather (no per-pixel loop): source row/col for
    each output pixel is ``floor(i * src / dst)``.
    """
    px = decode_bmp(payload)  # (h, w, 3) RGB
    h, w, _ = px.shape
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return encode_bmp(px[rows][:, cols])


def resample_wav(payload: bytes, out_rate: int) -> bytes:
    """Nearest-sample rate conversion of a PCM16 WAV, re-encoded.

    ``out[i] = x[i * in_rate // out_rate]`` — a pure numpy gather (the
    zero-order-hold resampler; a real deployment swaps in a polyphase
    kernel, the stage contract is identical).
    """
    x, rate, _ = decode_wav(payload)  # mono float64 in [-1, 1]
    n_out = max(1, len(x) * out_rate // rate)
    idx = (np.arange(n_out, dtype=np.int64) * rate) // out_rate
    y = x[np.minimum(idx, len(x) - 1)]
    pcm = np.clip(y * 32768.0, -32768, 32767).astype("<i2")
    return encode_wav(pcm, out_rate)


class AudioResampler:
    """Actor-pool stage: resample audio/wav payloads to ``out_rate``;
    non-WAV rows pass through with ``resampled=False``."""

    def __init__(self, out_rate: int):
        self.out_rate = out_rate

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads, types = t["payload"].to_pylist(), t["media_type"].to_pylist()
        outs, rates, flags = [], [], []
        for p, mt in zip(payloads, types):
            if mt == "audio/wav":
                outs.append(resample_wav(p, self.out_rate))
                rates.append(self.out_rate)
                flags.append(True)
            else:
                outs.append(p)
                rates.append(0)
                flags.append(False)
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "payload": pa.array(outs, pa.binary()),
                "sample_rate": pa.array(np.array(rates, np.int32)),
                "resampled": pa.array(flags, pa.bool_()),
            }
        )


def resample_audio(ds, out_rate: int = 16000, concurrency: int = 4,
                   batch_size: int = 64):
    """Audio-resample stage (byte-budgeted batching, actor pool)."""
    return ds.map_batches(
        AudioResampler,
        fn_constructor_kwargs={"out_rate": out_rate},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor PNG resize: real decode → numpy gather →
    re-encode (filter-0 RGB, the single encode_png writer)."""
    from vector_ray.functions.codecs import decode_png, encode_png

    px = decode_png(payload)
    h, w, _ = px.shape
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return encode_png(np.ascontiguousarray(px[rows][:, cols]))


def resize_jpeg(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor JPEG resize: real baseline decode → numpy
    gather → re-encode (baseline 4:4:4, the single encode_jpeg writer)."""
    from vector_ray.functions.codecs import decode_jpeg, encode_jpeg

    px = decode_jpeg(payload)
    h, w, _ = px.shape
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return encode_jpeg(np.ascontiguousarray(px[rows][:, cols]))


_RESIZERS = {
    "image/bmp": resize_bmp,
    "image/png": resize_png,
    "image/jpeg": resize_jpeg,
}


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize of image payloads
    (bmp/png/jpeg — all REAL stdlib codecs) to a fixed (width, height);
    other rows pass through unchanged with ``resized=False``."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads, types = t["payload"].to_pylist(), t["media_type"].to_pylist()
        new_payloads, widths, heights, resized = [], [], [], []
        for p, mt in zip(payloads, types):
            kernel = _RESIZERS.get(mt)
            if kernel is not None:
                new_payloads.append(kernel(p, self.out_w, self.out_h))
                widths.append(self.out_w)
                heights.append(self.out_h)
                resized.append(True)
            else:
                new_payloads.append(p)
                widths.append(0)
                heights.append(0)
                resized.append(False)
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "payload": pa.array(new_payloads, pa.binary()),
                "width": pa.array(np.array(widths, np.int32)),
                "height": pa.array(np.array(heights, np.int32)),
                "resized": pa.array(resized, pa.bool_()),
            }
        )


def resize_images(ds, out_w: int = 16, out_h: int = 16, concurrency: int = 4,
                  batch_size: int = 64):
    """Image-resize stage (same byte-budgeted batching rationale as
    extract_features)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def frame_sample(ds, every_ms: int = 1000):
    """Video frame-sampling plumbing: expands each row into frame-time
    offsets (the decode itself is the stubbed kernel above)."""

    def expand(t: pa.Table) -> pa.Table:
        ids, types, offs = [], [], []
        for mid, mtype, dur in zip(
            t["media_id"].to_pylist(),
            t["media_type"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            n = max(1, (dur or 0) // every_ms)
            ids.extend([mid] * n)
            types.extend([mtype] * n)
            offs.extend(range(0, n * every_ms, every_ms))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "media_type": pa.array(types, pa.string()),
                "frame_offset_ms": pa.array(offs, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=64)
