"""Language identification — character n-gram heuristic + script detection.

Analog of the reference's NgramLangDetector (lang.py:423-437), which wraps
the langdetect library (not vendored here).  This detector is self-contained:
  1. script detection by Unicode ranges (mirrors the reference's use of
     script ranges, io.py:615-620) for languages with unique scripts;
  2. for Latin text, cosine similarity of character trigram frequencies
     against small built-in profiles.

Profiles are compiled once per instance — run as an actor-pool stage
(map_batches(LangIdStage, concurrency=N)) so that cost is per actor.
Returns ISO 639-3 codes (reference Lang enum convention, lang.py:198-397).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

# tiny per-language seed text (handwritten function-word-heavy snippets)
_PROFILE_TEXT = {
    "eng": "the quick brown fox jumps over the lazy dog and the people with "
           "that this have from they would there their what about which when",
    "deu": "der die das und ist nicht von mit sich auf für als auch werden "
           "aus bei nach wird sind oder aber eine einer ihre durch über",
    "fra": "le la les des une est pas pour que dans qui avec sur sont était "
           "plus cette mais nous vous leur bien tout comme deux fait",
    "spa": "el la los las una es no por que en con para como más pero sus "
           "fue este entre cuando todo también años hasta desde está",
    "ita": "il la che di non per una sono con del più anche come questo "
           "nella gli dalla essere stato hanno quando molto dove",
}

_SCRIPT_RANGES = [
    ((0x0600, 0x06FF), "ara"),  # Arabic
    ((0x1200, 0x137F), "tir"),  # Ge'ez (Tigrinya/Amharic range)
    ((0x0D80, 0x0DFF), "sin"),  # Sinhala
    ((0x0B00, 0x0B7F), "ori"),  # Odia
    ((0x4E00, 0x9FFF), "zho"),  # CJK unified
    ((0x0400, 0x04FF), "rus"),  # Cyrillic
    ((0x0900, 0x097F), "hin"),  # Devanagari
]

# map common 639-1 labels to 639-3 (for datasets carrying 2-letter labels)
ISO1_TO_3 = {"en": "eng", "de": "deu", "fr": "fra", "es": "spa", "it": "ita",
             "zh": "zho", "ru": "rus", "ar": "ara", "hi": "hin", "si": "sin"}


def _trigram_vector(text: str, vocab: dict[str, int]) -> np.ndarray:
    v = np.zeros(len(vocab))
    t = f" {text.lower()} "
    for i in range(len(t) - 2):
        g = t[i : i + 3]
        j = vocab.get(g)
        if j is not None:
            v[j] += 1
    n = np.linalg.norm(v)
    return v / n if n else v


class NgramLangDetector:
    """detect(doc_id, tokens) -> ISO 639-3 code (LangDetector contract,
    lang.py:400-410)."""

    def __init__(self):
        grams: set[str] = set()
        for text in _PROFILE_TEXT.values():
            t = f" {text} "
            grams.update(t[i : i + 3] for i in range(len(t) - 2))
        self.vocab = {g: i for i, g in enumerate(sorted(grams))}
        self.langs = sorted(_PROFILE_TEXT)
        self.profiles = np.stack(
            [_trigram_vector(_PROFILE_TEXT[l], self.vocab) for l in self.langs]
        )

    def detect_text(self, text: str) -> str:
        if not text:
            return "und"
        counts = Counter()
        for ch in text:
            cp = ord(ch)
            for (lo, hi), lang in _SCRIPT_RANGES:
                if lo <= cp <= hi:
                    counts[lang] += 1
                    break
        if counts:
            lang, n = counts.most_common(1)[0]
            if n >= max(3, 0.3 * len(text)):
                return lang
        sims = self.profiles @ _trigram_vector(text, self.vocab)
        return self.langs[int(np.argmax(sims))]

    def detect(self, doc_id: str, tokens: list[str]) -> str:
        return self.detect_text(" ".join(tokens))


class FixedLang:
    """Constant language (reference FixedLang, lang.py:412-418)."""

    def __init__(self, lang: str):
        self.lang = lang

    def detect(self, doc_id, tokens):
        return self.lang

    def detect_text(self, text):
        return self.lang
