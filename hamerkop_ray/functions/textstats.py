"""Text-quality / token statistics kernels — training-data-pipeline ops.

Vectorized over pandas Series (string kernels in C where possible); used by
pipelines.text as map_batches stages over the documents table.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on "
    "as at by from not but they their there what which when who how all".split()
)

# BPE-ish token pattern: words, numbers, or single non-space symbols
_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT_RE = re.compile(r"[^\w\s]")
_DIGIT_RE = re.compile(r"\d")

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_U64 = (1 << 64) - 1


def whitespace_token_count(texts: pd.Series) -> pd.Series:
    """Number of whitespace-delimited tokens (python str.split semantics)."""
    return texts.str.split().str.len().fillna(0).astype("int64")


def regex_token_count(texts: pd.Series) -> pd.Series:
    """BPE-ish token count: words + numbers + individual symbols."""
    return texts.str.count(_TOKEN_RE).astype("int64")


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality-scoring features (length / punctuation / stopword
    ratios — the standard web-corpus filters)."""
    n_chars = texts.str.len().astype("int64")
    tokens = texts.str.split()
    n_tokens = tokens.str.len().fillna(0).astype("int64")
    mean_tok = (
        tokens.map(lambda ts: float(np.mean([len(t) for t in ts])) if ts else 0.0)
    )
    stop_ratio = tokens.map(
        lambda ts: sum(t.lower() in STOPWORDS for t in ts) / len(ts) if ts else 0.0
    )
    punct_ratio = texts.str.count(_PUNCT_RE) / n_chars.clip(lower=1)
    digit_ratio = texts.str.count(_DIGIT_RE) / n_chars.clip(lower=1)
    uniq_ratio = tokens.map(lambda ts: len(set(ts)) / len(ts) if ts else 0.0)
    score = (
        (n_tokens.clip(upper=256) / 256.0) * 0.25
        + (1 - punct_ratio.clip(upper=1)) * 0.2
        + (1 - digit_ratio.clip(upper=1)) * 0.15
        + stop_ratio.clip(upper=0.5) * 2 * 0.2
        + uniq_ratio * 0.2
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "uniq_token_ratio": uniq_ratio,
            "quality_score": score,
        }
    )


def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> str:
    """Winnowing-style document fingerprint: FNV-1a rolling over normalized
    text windows, keep the `keep` smallest hashes, hex-joined.  Deterministic,
    whitespace-insensitive."""
    norm = " ".join(text.lower().split())
    if len(norm) < window:
        norm = norm + " " * (window - len(norm))
    hashes = []
    for i in range(len(norm) - window + 1):
        h = _FNV_OFFSET
        for ch in norm[i : i + window]:
            h = ((h ^ (ord(ch) & 0xFF)) * _FNV_PRIME) & _U64
        hashes.append(h)
    hashes = sorted(set(hashes))[:keep]
    return "-".join(f"{h:016x}" for h in hashes)


def fingerprints(texts: pd.Series, window: int = 8, keep: int = 4) -> pd.Series:
    return texts.map(lambda t: rolling_fingerprint(t, window, keep))
