"""Multimodal (media) stages: decode / feature-extract / resize / frame-sample.

Media in this engine is an opaque reference riding in `media` spans
(media_ref column; identity-only for ER parity — SURVEY.md §2.11 "no media").
These stages give the Ray-side plumbing for a real media pipeline — schema,
actor signature, batch sizing, output layout — with the codec layer STUBBED:
the image/audio libraries are not in this container, so `DecodeMedia`
dispatches to a deterministic fake decoder by default and raises
NotImplementedError when a real codec is requested.

Batch-size guidance (Ray guide "Memory-aware"): media payload rows are large
binaries — run these pools with SMALL batch_size (e.g. 8-32) and bounded
concurrency so batch × concurrency fits worker heap; blocks of wide binary
rows should use a larger target_max_block_size rather than tiny blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURES = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video (from the ref scheme)
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # embedding-like feature vector
    ]
)


def _fake_pixels(ref: str, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic fake decode: pixels derived from the ref hash — stands in
    for a real codec so downstream stages are exercised end-to-end."""
    seed = int.from_bytes(hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeMedia:
    """Actor-pool stage: (doc_id, media_ref) rows → decoded feature rows.

    codec="fake" (default) uses the deterministic fake decoder; any other
    codec raises NotImplementedError (no image/audio libs in this container).
    """

    def __init__(self, codec: str = "fake", feature_dim: int = 16, resize: int = 8):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real decoders (PIL/ffmpeg/torchvision) are "
                "not available in this environment — wire them here"
            )
        self.codec = codec
        self.feature_dim = feature_dim
        self.resize = resize

    def _feature(self, pixels: np.ndarray) -> np.ndarray:
        """Resize (block-mean) then channel-mean histogram as a stand-in
        feature extractor — deterministic, vectorized."""
        h, w, _ = pixels.shape
        r = self.resize
        ph, pw = h // r, w // r
        small = pixels[: ph * r, : pw * r].reshape(ph, r, pw, r, 3).mean(axis=(1, 3))
        flat = small.mean(axis=2).ravel().astype(np.float32)
        if len(flat) >= self.feature_dim:
            return flat[: self.feature_dim] / 255.0
        return np.pad(flat, (0, self.feature_dim - len(flat))) / 255.0

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, ref in zip(t["doc_id"].to_pylist(), t["media_ref"].to_pylist()):
            pixels = _fake_pixels(ref)
            rows.append(
                {
                    "media_ref": ref,
                    "doc_id": doc_id,
                    "kind": "image",
                    "width": pixels.shape[1],
                    "height": pixels.shape[0],
                    "n_frames": 1,
                    "feature": self._feature(pixels).tolist(),
                }
            )
        if not rows:
            return MEDIA_FEATURES.empty_table()
        return pa.Table.from_pylist(rows, schema=MEDIA_FEATURES)


FRAME_FEATURES = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("pts_ms", pa.int64()),  # presentation timestamp of the frame
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def _fake_video_meta(ref: str) -> tuple[int, float]:
    """Deterministic fake video container probe: (n_frames, fps) from the
    ref hash — 24-240 frames at 24 or 30 fps."""
    seed = int.from_bytes(
        hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    return int(rng.integers(24, 241)), float(rng.choice([24.0, 30.0]))


class FrameSampleMedia(DecodeMedia):
    """Actor-pool stage: (doc_id, media_ref) rows → one feature row per
    SAMPLED video frame (the brief's frame-sample op).

    strategy="uniform" picks n_frames evenly spaced frames (first frame
    always included); strategy="stride" picks every `stride`-th frame.
    Output is FRAME_FEATURES — frame_idx + pts_ms carry the temporal
    position so downstream stages (dedup across frames, scene features)
    can window on it.  Codec layer stubbed exactly as DecodeMedia: each
    sampled frame decodes via the deterministic fake decoder (a real
    pipeline swaps _fake_pixels for an ffmpeg/PyAV seek+decode); the
    actor/batch plumbing is the real, tested part.

    Scale note: output rows = inputs × samples — keep batch_size small
    (frames are the wide payload) and let sampling happen INSIDE the
    decode actor (never decode-all-then-filter)."""

    def __init__(self, codec: str = "fake", feature_dim: int = 16,
                 resize: int = 8, strategy: str = "uniform",
                 n_frames: int = 4, stride: int = 10):
        super().__init__(codec=codec, feature_dim=feature_dim, resize=resize)
        if strategy not in ("uniform", "stride"):
            raise ValueError(f"unknown sampling strategy {strategy!r}")
        self.strategy = strategy
        self.n_frames = n_frames
        self.stride = stride

    def _sample_indices(self, total: int) -> np.ndarray:
        if self.strategy == "stride":
            return np.arange(0, total, self.stride, dtype=np.int64)
        n = min(self.n_frames, total)
        # evenly spaced, first frame included, deterministic rounding
        return np.unique((np.linspace(0, total - 1, n)).astype(np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, ref in zip(t["doc_id"].to_pylist(),
                               t["media_ref"].to_pylist()):
            total, fps = _fake_video_meta(ref)
            for idx in self._sample_indices(total):
                pixels = _fake_pixels(f"{ref}#frame{int(idx)}")
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "frame_idx": int(idx),
                        "pts_ms": int(idx / fps * 1000),
                        "width": pixels.shape[1],
                        "height": pixels.shape[0],
                        "feature": self._feature(pixels).tolist(),
                    }
                )
        if not rows:
            return FRAME_FEATURES.empty_table()
        return pa.Table.from_pylist(rows, schema=FRAME_FEATURES)


def extract_media_refs(docs):
    """documents(spans) → (doc_id, media_ref) rows for media spans.

    The narrow projection happens HERE, before any actor pool — the wide
    spans column never reaches the media stage."""

    def f(t: pa.Table) -> pa.Table:
        doc_ids, refs = [], []
        spans_col = t.column("spans")
        ids = t["doc_id"].to_pylist()
        chunks = spans_col.chunks if isinstance(spans_col, pa.ChunkedArray) else [spans_col]
        row = 0
        for chunk in chunks:
            flat = chunk.flatten()
            kinds = flat.field("kind").to_pylist()
            mrefs = flat.field("media_ref").to_pylist()
            offs = chunk.offsets.to_pylist()
            for i in range(len(chunk)):
                for j in range(offs[i], offs[i + 1]):
                    if kinds[j] == "media":
                        doc_ids.append(ids[row])
                        refs.append(mrefs[j])
                row += 1
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.string()), "media_ref": pa.array(refs, pa.string())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def media_features(docs, *, concurrency=2, batch_size: int = 32):
    """End-to-end media path: extract refs → decode/feature actor pool."""
    refs = extract_media_refs(docs)
    return refs.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def video_frame_features(docs, *, concurrency=2, batch_size: int = 16,
                         **sample_kwargs):
    """End-to-end frame-sampling path: extract refs → per-frame features.
    batch_size defaults smaller than media_features — each input row fans
    out into several decoded frames."""
    refs = extract_media_refs(docs)
    return refs.map_batches(
        FrameSampleMedia,
        fn_constructor_kwargs=sample_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
