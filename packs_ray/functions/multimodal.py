"""Multimodal column stages (image/audio/video as opaque binary columns).

The container has no image/audio codecs, so the DECODE kernels are
deterministic fakes behind ``_decode_*`` seams (clearly marked; swap for
Pillow/torchaudio/PyAV in production) — but the Ray-side plumbing is
real and tested: typed binary+metadata schema, actor-pool map_batches
with small byte-budgeted batches, fixed-shape feature output columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from packs_ray.stages.util import round_half_away as _r

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # images/video
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),      # audio/video
])


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 4096, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(kinds.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array([f"application/x-fake-{k}" for k in kinds], type=pa.string()),
        "width": pa.array(rng.integers(64, 1920, n).astype(np.int32)),
        "height": pa.array(rng.integers(64, 1080, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
    })


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload digest.
    Production: PIL.Image.open(io.BytesIO(payload)) — NotImplemented here
    because no codec library ships in this container."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)  # "thumbnail"


def _decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """STUB decode: deterministic 16-bit-PCM-style samples k/32768
    (k int in [-32768, 32767]) from the payload digest.  Production:
    soundfile/torchaudio decode.  Quantized samples are exactly
    representable in float32/float64, so downstream sums are
    order-independent and bit-exact vs the SQL oracle replica."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    n = min(max(duration_ms, 1), 1000)
    k = rng.integers(-32768, 32768, size=n, dtype=np.int32)
    return (k.astype(np.float32)) / np.float32(32768.0)


class ImageFeatureStage:
    """Actor stage: decode → 8x8 thumbnail → mean-channel features.
    batch_size should be small (payloads are large); state (any model)
    loads once per actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        feats = np.zeros((len(payloads), 3), dtype=np.float64)
        for i, p in enumerate(payloads):
            px = _decode_image(p, int(widths[i]), int(heights[i]))
            # integer pixel sum / 64: exact in float64, any order
            feats[i] = px.reshape(-1, 3).astype(np.int64).sum(axis=0) / 64.0
        return pa.table({
            "media_id": batch.column("media_id"),
            "mean_r": pa.array(_r(feats[:, 0], 4)),
            "mean_g": pa.array(_r(feats[:, 1], 4)),
            "mean_b": pa.array(_r(feats[:, 2], 4)),
        })


class AudioFeatureStage:
    """Actor stage: decode → RMS/zero-crossing features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        rms = np.zeros(len(payloads))
        zc = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            w = _decode_audio(p, int(durs[i])).astype(np.float64)
            # k²/2³⁰ terms sum exactly in float64 (≤1000 samples), so
            # the RMS is bit-identical to SQL sqrt(sum(v*v)/count(*))
            rms[i] = float(np.sqrt((w * w).sum() / len(w)))
            zc[i] = int((np.diff(np.signbit(w)) != 0).sum())
        return pa.table({
            "media_id": batch.column("media_id"),
            "rms": pa.array(_r(rms, 4)),
            "zero_crossings": pa.array(zc),
        })


class VideoFrameSampleStage:
    """Actor stage: sample ``n_frames`` evenly-spaced frames per video and
    emit one row per (media_id, frame_idx, frame_ms) with thumbnail mean
    features.  STUB decode (PyAV in production); the fan-out row layout,
    byte-budgeted batches and actor signature are the real plumbing."""

    def __init__(self, n_frames: int = 4) -> None:
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        durs = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        out_id, out_fi, out_ms, out_mean = [], [], [], []
        for i, p in enumerate(payloads):
            dur = max(int(durs[i]), 1)
            for fi in range(self.n_frames):
                ms = (dur * fi) // self.n_frames
                # STUB: hash-derived frame; production decodes frame at `ms`
                px = _decode_image(p + ms.to_bytes(4, "little"), 8, 8)
                out_id.append(int(ids[i]))
                out_fi.append(fi)
                out_ms.append(ms)
                # integer pixel sum / 192: exact float64, any order
                out_mean.append(int(px.astype(np.int64).sum()) / 192.0)
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_fi, type=pa.int32()),
            "frame_ms": pa.array(out_ms, type=pa.int32()),
            "frame_mean": pa.array(_r(np.asarray(out_mean), 4),
                                   type=pa.float64()),
        })


def _kind_filter(kind: str):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), kind))

    return fn


def image_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    imgs = ds.map_batches(_kind_filter("image"), batch_format="pyarrow")
    return imgs.map_batches(ImageFeatureStage, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)


def audio_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    aud = ds.map_batches(_kind_filter("audio"), batch_format="pyarrow")
    return aud.map_batches(AudioFeatureStage, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=concurrency)


def video_frames(ds, n_frames: int = 4, batch_size: int = 16, concurrency=(1, 4)):
    vid = ds.map_batches(_kind_filter("video"), batch_format="pyarrow")
    return vid.map_batches(VideoFrameSampleStage, fn_constructor_args=(n_frames,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=concurrency)
