"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBS (no image/audio libraries ship
in this environment — see the module-level ``HAVE_*`` gates): each stage
either routes through a real library if one ever becomes importable, or
falls back to a deterministic fake that preserves the *real* Ray-side
contract — schema in/out, small ``batch_size`` for wide binary rows,
actor-pool construction, zero-copy Arrow batches.  The plumbing is what
is tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - not present in this environment
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: payload bytes are seeded noise,
    metadata is consistent with the payload."""
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, mimes, ws, hs, durs = [], [], [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = kinds[i % 3]
        size = int(rng.integers(2_000, 20_000))
        ids.append(i)
        kind_col.append(kind)
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        ws.append(int(rng.integers(64, 1920)) if kind != "audio" else 0)
        hs.append(int(rng.integers(64, 1080)) if kind != "audio" else 0)
        durs.append(int(rng.integers(1_000, 60_000)) if kind != "image" else 0)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeAndFeaturize:
    """Actor-pool stage: binary payload -> fixed-size feature vector +
    content hash.  With a real decoder installed this is decode → resize
    → embed; without one it is a deterministic fake featurizer (byte
    histogram), keeping schema and actor lifecycle identical."""

    FEATURE_DIM = 32

    def __init__(self):
        # per-actor warm state: with PIL this would be model/codec setup
        self.have_decoder = HAVE_PIL

    def _features(self, payload: bytes) -> np.ndarray:
        if self.have_decoder:  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL at runtime")
        hist = np.bincount(
            np.frombuffer(payload, dtype=np.uint8) >> 3, minlength=self.FEATURE_DIM
        )[: self.FEATURE_DIM]
        total = hist.sum() or 1
        return (hist / total).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._features(p) for p in payloads]
        shas = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array([f.tolist() for f in feats],
                                     pa.list_(pa.float32())),
                "payload_sha256": pa.array(shas, pa.string()),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage for video rows: emit one row per sampled frame
    index (a flat-map done batch-wise).  Frame *decode* is stubbed; the
    sampling arithmetic, schema and row expansion are real."""

    def __init__(self, fps_out: float = 1.0):
        self.fps_out = fps_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts_ms = [], [], []
        for mid, kind, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if kind != "video":
                continue
            step = int(1000 / self.fps_out)
            for k, t in enumerate(range(0, dur, step)):
                ids.append(mid)
                frame_idx.append(k)
                ts_ms.append(t)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int32()),
            }
        )


def _media_blocks(n: int, n_blocks: int = 8) -> rd.Dataset:
    """Synthesized media table pre-split into blocks so the actor pool
    has parallel inputs from the start (a single from_arrow block would
    feed only one actor — at real scale the read_parquet sharding does
    this for free)."""
    tbl = synthesize_media(n)
    step = max(1, (tbl.num_rows + n_blocks - 1) // n_blocks)
    return rd.from_arrow(
        [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]
    )


def media_pipeline(n: int = 300) -> rd.Dataset:
    """Synthesize → decode/featurize (actor pool, small batches for wide
    binary rows) — the multimodal flagship."""
    return _media_blocks(n).map_batches(
        DecodeAndFeaturize,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16,  # binary rows are wide; keep batch bytes bounded
        concurrency=(1, 2),
    )


def frame_sample_pipeline(n: int = 300, fps_out: float = 1.0) -> rd.Dataset:
    return _media_blocks(n).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=(1, 2),
        fn_constructor_args=(fps_out,),
    )


class AudioFeatures:
    """Actor-pool stage for audio rows: frame-level energy + spectral
    centroid.  The DSP is real (numpy rFFT over int8 frames —
    deterministic, vectorized); only the *codec* is faked, since no
    audio library ships in this environment: payload bytes stand in for
    PCM samples.  With a real decoder the ``_pcm`` hook is the only
    thing that changes."""

    FRAME = 512  # samples per analysis frame

    def __init__(self):
        # per-actor warm state: the rFFT bin index vector
        self.bins = np.arange(self.FRAME // 2 + 1, dtype=np.float64)

    def _pcm(self, payload: bytes) -> np.ndarray:
        # fake decode: bytes as int8 PCM; a real build decodes here
        return np.frombuffer(payload, dtype=np.int8).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, rms_m, cent_m = [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            pcm = self._pcm(payload)
            usable = (len(pcm) // self.FRAME) * self.FRAME
            if usable == 0:
                continue
            frames = pcm[:usable].reshape(-1, self.FRAME)
            rms = np.sqrt((frames**2).mean(axis=1))
            spec = np.abs(np.fft.rfft(frames, axis=1))
            denom = spec.sum(axis=1)
            denom[denom == 0.0] = 1.0
            centroid = (spec * self.bins).sum(axis=1) / denom
            ids.append(mid)
            n_frames.append(frames.shape[0])
            rms_m.append(int(rms.mean() * 1000))
            cent_m.append(int(centroid.mean() * 1000))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "rms_milli": pa.array(rms_m, pa.int64()),
                "centroid_milli": pa.array(cent_m, pa.int64()),
            }
        )


def audio_features_pipeline(n: int = 300) -> rd.Dataset:
    """Synthesize -> audio feature extraction (actor pool; one output
    row per audio item, image/video rows dropped in-stage)."""
    return _media_blocks(n).map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16,
        concurrency=(1, 2),
    )
