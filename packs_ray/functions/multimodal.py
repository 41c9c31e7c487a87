"""Multimodal column stages (image/audio/video as opaque binary columns).

Real decode, no codec libraries: the container ships neither Pillow nor
PyAV, so the pipeline standardises on the codec-free members of each
family and decodes them with pure struct/numpy parsing:

- image: BMP (24-bit uncompressed, BITMAPINFOHEADER, bottom-up rows,
  4-byte row padding) — ``decode_bmp``
- audio: WAV (RIFF, PCM16 mono) with proper chunk walking — ``decode_wav``
- video: Y4M (YUV4MPEG2, C444 — full-resolution planes, no chroma
  subsampling) — ``decode_y4m``

Compressed formats (JPEG/MP3/H.264) remain the documented swap point:
replace the ``decode_*`` calls inside the stages with
PIL/soundfile/PyAV and everything downstream (schema, byte-budgeted
actor batches, fan-out layout, feature math) is unchanged.

Correctness is checked end-to-end, not circularly: the synthetic
fixture ENCODES deterministic ground-truth arrays into real format
bytes; the stages DECODE those bytes; the DuckDB oracle computes the
same features from the ground-truth arrays persisted independently of
the decoder (__ray_entry__._ensure_media_artifacts).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from packs_ray.stages.util import round_half_away as _r

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # encoded bytes (BMP / WAV / Y4M)
    ("mime", pa.string()),
    ("width", pa.int32()),            # images/video
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),      # audio/video
])

AUDIO_RATE = 8000                     # fixture sample rate (Hz)
VIDEO_FPS = 25                        # fixture frame rate


# --------------------------------------------------------------------------
# encoders (fixture side) and decoders (pipeline side)

def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 -> 24-bit uncompressed BMP bytes."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    bgr = px[:, :, ::-1]              # BMP stores BGR
    pad = b"\x00" * (stride - w * 3)
    for r in range(h - 1, -1, -1):    # bottom-up
        rows += bgr[r].tobytes() + pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) RGB uint8."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_sz, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    flip = h > 0                       # positive height = bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()     # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes -> (int16 samples, sample_rate).
    Walks chunks properly (tolerates extra chunks before data)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = payload[pos:pos + 4], struct.unpack_from("<I", payload,
                                                           pos + 4)[0]
        if cid == b"fmt ":
            afmt, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
            if (afmt, ch, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV: fmt={afmt} ch={ch} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2",
                                    count=sz // 2, offset=pos + 8)
        pos += 8 + sz + (sz & 1)       # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return samples, rate


def encode_y4m(frames: np.ndarray) -> bytes:
    """(F, 3, H, W) uint8 YUV444 planes -> YUV4MPEG2 C444 bytes."""
    f, _, h, w = frames.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{VIDEO_FPS}:1 Ip A1:1 C444\n"
                    .encode())
    for fr in frames:
        out += b"FRAME\n" + fr.tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 C444 bytes -> (F, 3, H, W) uint8 planes."""
    nl = payload.index(b"\n")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a Y4M payload")
    w = h = None
    for t in tokens[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"C" and t != b"C444":
            raise ValueError(f"unsupported Y4M colorspace {t!r}")
    frame_sz = 3 * h * w
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        start = fnl + 1
        frames.append(np.frombuffer(payload, dtype=np.uint8,
                                    count=frame_sz, offset=start)
                      .reshape(3, h, w))
        pos = start + frame_sz
    return np.stack(frames) if frames else np.zeros((0, 3, h, w), np.uint8)


# --------------------------------------------------------------------------
# deterministic fixture: ground-truth arrays -> real encoded payloads

def _truth_rng(media_id: int, seed: int) -> np.random.Generator:
    return np.random.default_rng((seed << 32) ^ media_id)


def truth_image(media_id: int, seed: int = 42) -> np.ndarray:
    rng = _truth_rng(media_id, seed)
    h, w = int(rng.integers(6, 25)), int(rng.integers(6, 25))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def truth_audio(media_id: int, seed: int = 42) -> np.ndarray:
    rng = _truth_rng(media_id, seed)
    n = int(rng.integers(200, 2001))
    return rng.integers(-32768, 32768, size=n).astype(np.int16)


def truth_video(media_id: int, seed: int = 42) -> np.ndarray:
    rng = _truth_rng(media_id, seed)
    f = int(rng.integers(4, 11))
    h, w = int(rng.integers(6, 17)), int(rng.integers(6, 17))
    return rng.integers(0, 256, size=(f, 3, h, w), dtype=np.uint8)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL encoded payloads (BMP / WAV /
    Y4M of the ground-truth arrays)."""
    kind_rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[kind_rng.integers(0, 3, n)]
    payloads, mimes, widths, heights, durs = [], [], [], [], []
    for mid, kind in enumerate(kinds):
        if kind == "image":
            px = truth_image(mid, seed)
            payloads.append(encode_bmp(px))
            mimes.append("image/bmp")
            heights.append(px.shape[0])
            widths.append(px.shape[1])
            durs.append(0)
        elif kind == "audio":
            s = truth_audio(mid, seed)
            payloads.append(encode_wav(s))
            mimes.append("audio/wav")
            widths.append(0)
            heights.append(0)
            durs.append(len(s) * 1000 // AUDIO_RATE)
        else:
            fr = truth_video(mid, seed)
            payloads.append(encode_y4m(fr))
            mimes.append("video/x-yuv4mpeg")
            heights.append(fr.shape[2])
            widths.append(fr.shape[3])
            durs.append(fr.shape[0] * 1000 // VIDEO_FPS)
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(kinds.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(mimes, type=pa.string()),
        "width": pa.array(np.asarray(widths, dtype=np.int32)),
        "height": pa.array(np.asarray(heights, dtype=np.int32)),
        "duration_ms": pa.array(np.asarray(durs, dtype=np.int32)),
    })


# --------------------------------------------------------------------------
# actor-pool feature stages (decode happens here, once per payload)

class ImageFeatureStage:
    """Actor stage: BMP decode -> per-channel mean features.  Integer
    pixel sums divide by the exact pixel count, so the float result is
    one deterministic IEEE division the SQL oracle replicates."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), 3), dtype=np.float64)
        for i, p in enumerate(payloads):
            px = decode_bmp(p).reshape(-1, 3).astype(np.int64)
            feats[i] = px.sum(axis=0) / px.shape[0]
        return pa.table({
            "media_id": batch.column("media_id"),
            "mean_r": pa.array(_r(feats[:, 0], 4)),
            "mean_g": pa.array(_r(feats[:, 1], 4)),
            "mean_b": pa.array(_r(feats[:, 2], 4)),
        })


class ImageResizeStage:
    """Actor stage: BMP decode -> nearest-neighbor resize -> BMP
    re-encode.  Emits a media-table-shaped batch (payload = thumbnail
    BMP), so downstream stages (ImageFeatureStage, another resize)
    compose directly.  Source pixel for target (i, j) is
    ((i*H)//th, (j*W)//tw) — pure integer math, replicated by the SQL
    oracle against the ground-truth pixel table."""

    def __init__(self, th: int = 4, tw: int = 4) -> None:
        self.th, self.tw = th, tw

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        thumbs = []
        for p in payloads:
            px = decode_bmp(p)
            h, w, _ = px.shape
            rows = (np.arange(self.th) * h) // self.th
            cols = (np.arange(self.tw) * w) // self.tw
            thumbs.append(encode_bmp(px[rows][:, cols]))
        n = len(payloads)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload": pa.array(thumbs, type=pa.binary()),
            "mime": batch.column("mime"),
            "width": pa.array(np.full(n, self.tw, dtype=np.int32)),
            "height": pa.array(np.full(n, self.th, dtype=np.int32)),
            "duration_ms": batch.column("duration_ms"),
        })


class AudioFeatureStage:
    """Actor stage: WAV decode -> RMS / zero-crossing features.  k/32768
    samples are exact dyadic floats; k^2/2^30 terms sum exactly in
    float64 at fixture lengths, keeping the RMS bit-identical to the SQL
    sqrt(sum(v*v)/count(*))."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        rms = np.zeros(len(payloads))
        zc = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            k, _rate = decode_wav(p)
            w = k.astype(np.float64) / np.float64(32768.0)
            rms[i] = float(np.sqrt((w * w).sum() / len(w)))
            zc[i] = int((np.diff(np.signbit(w)) != 0).sum())
        return pa.table({
            "media_id": batch.column("media_id"),
            "rms": pa.array(_r(rms, 4)),
            "zero_crossings": pa.array(zc),
        })


class VideoFrameSampleStage:
    """Actor stage: Y4M decode -> sample ``n_frames`` evenly-spaced
    frames per video, one output row per (media_id, frame_idx, frame_ms)
    with the frame's mean plane value."""

    def __init__(self, n_frames: int = 4) -> None:
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        durs = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        out_id, out_fi, out_ms, out_mean = [], [], [], []
        for i, p in enumerate(payloads):
            frames = decode_y4m(p)
            f = frames.shape[0]
            dur = max(int(durs[i]), 1)
            for fi in range(self.n_frames):
                src = (f * fi) // self.n_frames
                fr = frames[src].astype(np.int64)
                out_id.append(int(ids[i]))
                out_fi.append(fi)
                out_ms.append((dur * fi) // self.n_frames)
                out_mean.append(int(fr.sum()) / fr.size)
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


def image_resize(ds, th: int = 4, tw: int = 4, batch_size: int = 64,
                 concurrency=(1, 4)):
    imgs = ds.map_batches(_kind_filter("image"), batch_format="pyarrow")
    return imgs.map_batches(ImageResizeStage, fn_constructor_args=(th, tw),
                            batch_format="pyarrow", batch_size=batch_size,
                            concurrency=concurrency)


def audio_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    aud = ds.map_batches(_kind_filter("audio"), batch_format="pyarrow")
    return aud.map_batches(AudioFeatureStage, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=concurrency)


def video_frames(ds, n_frames: int = 4, batch_size: int = 16, concurrency=(1, 4)):
    vid = ds.map_batches(_kind_filter("video"), batch_format="pyarrow")
    return vid.map_batches(VideoFrameSampleStage, fn_constructor_args=(n_frames,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=concurrency)


# --------------------------------------------------------------------------
# perceptual hashing (dHash) + Hamming-banded near-duplicate mining

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (shared byte-table kernel)."""
    from packs_ray.functions.neardup import _popcount64 as _pc

    return _pc(x).astype(np.int64)


def dhash64(px: np.ndarray) -> np.uint64:
    """64-bit difference hash of an HxWx3 uint8 image — the classic
    near-duplicate image fingerprint (gradient signs survive re-encode,
    resize and small edits; Krawetz's public dHash recipe), specified
    here in EXACT integer arithmetic so the SQL oracle reproduces every
    bit from the ground-truth pixels:

    - gray(y, x) = r + g + b (int, no luma weights — keeps both sides
      on a pure-integer grid)
    - 8x9 grid pooling by integer cell assignment
      (row y -> y*8//H, col x -> x*9//W; cells may be empty when
      H < 8 or W < 9 — handled below without division)
    - bit(r, c) = mean(cell r,c) > mean(cell r,c+1), compared as
      cross-multiplied integer sums (sum_l*n_r > sum_r*n_l) so empty
      cells and uneven cell sizes stay exact
    - hash = sum of bit << (r*8 + c), c in 0..7
    """
    gray = px.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    ry = (np.arange(h, dtype=np.int64) * 8) // h
    cx = (np.arange(w, dtype=np.int64) * 9) // w
    idx = (ry[:, None] * 9 + cx[None, :]).ravel()
    s = np.bincount(idx, weights=gray.ravel(), minlength=72) \
        .astype(np.int64).reshape(8, 9)      # cell sums <= 24*24*765
    n = np.bincount(idx, minlength=72).astype(np.int64).reshape(8, 9)
    bits = s[:, :8] * n[:, 1:] > s[:, 1:] * n[:, :8]
    pos = (np.arange(8)[:, None] * 8 + np.arange(8)[None, :])
    return np.uint64((bits.astype(np.uint64)
                      << pos.astype(np.uint64)).sum(dtype=np.uint64))


def neardup_truth_pixels(n: int = 96, seed: int = 7,
                         dup_rate: float = 0.3) -> list[np.ndarray]:
    """Ground-truth pixel arrays for the planted near-duplicate corpus —
    a pure function of (n, seed, dup_rate), exposed separately so the
    SQL oracle can persist these values WITHOUT touching the BMP
    encode/decode path under test."""
    pxs: list[np.ndarray] = []
    for i in range(n):
        rng = np.random.default_rng((seed << 20) ^ (i * 2654435761 % (1 << 31)))
        if i > 0 and rng.random() < dup_rate:
            src = int(rng.integers(0, i))
            px = pxs[src].copy()
            hh, ww, _ = px.shape
            for _ in range(int(rng.integers(1, 4))):
                y, x, c = (int(rng.integers(0, hh)), int(rng.integers(0, ww)),
                           int(rng.integers(0, 3)))
                px[y, x, c] = np.uint8((int(px[y, x, c])
                                        + int(rng.integers(-8, 9))) % 256)
        else:
            hh, ww = int(rng.integers(8, 25)), int(rng.integers(9, 25))
            px = rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        pxs.append(px)
    return pxs


def synth_neardup_images(n: int = 96, seed: int = 7,
                         dup_rate: float = 0.3) -> pa.Table:
    """Deterministic image corpus WITH planted near-duplicates: each row
    is either a fresh random image or a copy of an earlier one with a
    handful of pixels nudged (the crawl-reality of re-hosted thumbnails
    and recompressed copies).  Payloads are real encoded BMPs of
    ``neardup_truth_pixels``."""
    pxs = neardup_truth_pixels(n, seed, dup_rate)
    payloads = [encode_bmp(px) for px in pxs]
    heights = [px.shape[0] for px in pxs]
    widths = [px.shape[1] for px in pxs]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(["image"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/bmp"] * n, type=pa.string()),
        "width": pa.array(np.asarray(widths, dtype=np.int32)),
        "height": pa.array(np.asarray(heights, dtype=np.int32)),
        "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
    })


class ImageDHashStage:
    """Actor stage: BMP decode -> 64-bit dHash (emitted as the int64
    two's-complement view so the value survives Arrow/SQL round-trips
    bit-for-bit)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hashes = np.zeros(len(payloads), dtype=np.uint64)
        for i, p in enumerate(payloads):
            hashes[i] = dhash64(decode_bmp(p))
        return pa.table({
            "media_id": batch.column("media_id"),
            "phash": pa.array(hashes.view(np.int64)),
        })


def image_dhash(ds, batch_size: int = 64, concurrency=(1, 4)):
    imgs = ds.map_batches(_kind_filter("image"), batch_format="pyarrow")
    return imgs.map_batches(ImageDHashStage, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency)


def _band_widths(bands: int) -> list[tuple[int, int]]:
    """(shift, width) per band, splitting 64 bits as evenly as possible."""
    base, extra = divmod(64, bands)
    out, shift = [], 0
    for i in range(bands):
        w = base + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def phash_pairs(hash_ds, *, max_hamming: int = 10, bands: int = 11,
                group_cap: int = 512):
    """Near-duplicate image pairs by banded Hamming-LSH over dHash
    values: two hashes within ``max_hamming`` bits differ in at most
    ``max_hamming`` bands, so with ``bands > max_hamming`` they MUST
    agree exactly on at least one band (pigeonhole — exact recall, same
    guarantee as the MinHash band construction in neardup.py).

    Scale shape: explode each hash into ``bands`` (band, value) keys
    (9 B/row), groupby band-key, all-pairs verify only INSIDE a band
    bucket (uniform hashes -> tiny buckets; pathological pile-ups are
    capped at ``group_cap`` members with the skip surfaced, the
    minhash convention), popcount-verify vectorized, dedup via a final
    (id_a, id_b) groupby.  Output: (id_a, id_b, hamming) sorted."""
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    widths = _band_widths(bands)

    def explode(batch: pa.Table) -> pa.Table:
        mid = batch.column("media_id").to_numpy(zero_copy_only=False)
        hv = batch.column("phash").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        outs = {"band": [], "val": [], "media_id": [], "phash": []}
        for b, (shift, w) in enumerate(widths):
            mask = np.uint64((1 << w) - 1)
            outs["band"].append(np.full(len(hv), b, dtype=np.int64))
            outs["val"].append(((hv >> np.uint64(shift)) & mask)
                               .astype(np.int64))
            outs["media_id"].append(mid)
            outs["phash"].append(hv.view(np.int64))
        return pa.table({k: pa.array(np.concatenate(v))
                         for k, v in outs.items()})

    def bucket_pairs(g) -> "object":
        import pandas as pd

        g = g.drop_duplicates("media_id").sort_values("media_id")
        m = len(g)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if m < 2:
            return empty
        if m > group_cap:
            print(f"phash_pairs: skipping over-sized band bucket "
                  f"({m} > {group_cap})")
            return empty
        ids = g["media_id"].to_numpy(np.int64)
        hv = g["phash"].to_numpy(np.int64).view(np.uint64)
        ia, ib = np.triu_indices(m, k=1)
        d = _popcount64(hv[ia] ^ hv[ib])
        keep = d <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": d[keep]})

    def dedup(g) -> "object":
        return g.head(1)

    return (hash_ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["band", "val"])
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["id_a", "id_b"])
            .map_groups(dedup, batch_format="pandas")
            .sort(["id_a", "id_b"]))
