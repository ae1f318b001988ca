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
