"""Text-analysis pipelines over a documents table (doc_id, text, ...).

Training-data-pipeline staples: token counting, quality scoring, language
id, document fingerprinting.  Each is a vectorized map_batches (language id
is an actor pool — profiles compile once per actor).
"""

from __future__ import annotations

import pandas as pd

from ..functions import textstats
from ..functions.langid import NgramLangDetector


def token_counts(docs):
    """(doc_id, n_tokens, n_tokens_regex) — whitespace + BPE-ish regex."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": textstats.whitespace_token_count(df["text"]),
                "n_tokens_regex": textstats.regex_token_count(df["text"]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def quality(docs):
    """(doc_id, n_chars, n_tokens, ..., quality_score)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = textstats.quality_features(df["text"])
        out.insert(0, "doc_id", df["doc_id"].values)
        return out

    return docs.map_batches(f, batch_format="pandas")


class LangIdStage:
    """Actor-pool stage: adds detected_lang (profiles built once per actor)."""

    def __init__(self):
        self.detector = NgramLangDetector()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "detected_lang": df["text"].map(self.detector.detect_text),
            }
        )


def lang_id(docs, concurrency=4):
    return docs.map_batches(
        LangIdStage, batch_format="pandas", concurrency=concurrency, num_cpus=1
    )


def fingerprints(docs, window: int = 8, keep: int = 4):
    """(doc_id, fingerprint) — winnowing-style rolling-hash fingerprint."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": textstats.fingerprints(df["text"], window, keep),
            }
        )

    return docs.map_batches(f, batch_format="pandas")
