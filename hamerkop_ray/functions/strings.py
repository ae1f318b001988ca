"""String kernels mirroring hamerkop's String utilities (string.py:17-74).

All functions are pure; translate tables / regexes are built once at import
(matching the reference, string.py:21-34) so that per-batch application inside
map_batches does no setup work.
"""

from __future__ import annotations

import re
import string as _string
import sys
import unicodedata

PUNCT_TABLE = str.maketrans("", "", _string.punctuation)
PUNCT_SPACE_TABLE = str.maketrans(_string.punctuation, " " * len(_string.punctuation))

# Unicode P-category table, built once (reference string.py:23-25).
_UNICODE_PUNCT_STR = "".join(
    chr(i) for i in range(sys.maxunicode) if unicodedata.category(chr(i)).startswith("P")
)
UNICODE_PUNCT_TABLE = str.maketrans("", "", _UNICODE_PUNCT_STR)
UNICODE_PUNCT_SPACE_TABLE = str.maketrans(_UNICODE_PUNCT_STR, " " * len(_UNICODE_PUNCT_STR))

# Emoji codepoint ranges (reference string.py:26-34).
EMOJI_REGEX = re.compile(
    "["
    "\U0001f170-\U0001f19a"  # buttons
    "\U0001f200-\U0001f235"  # japanese buttons
    "\U0001f300-\U0001f5ff"  # symbols & pictographs
    "\U0001f600-\U0001f64f"  # emoticons
    "\U0001f680-\U0001f6ff"  # transport & map symbols
    "\U0001f1e0-\U0001f1ff"  # flags
    "\U0001f900-\U0001f9ff"  # faces added in unicode 8
    "]+"
)

# Smart quotes / em-dash / ellipsis → ascii (reference preprocessor.py:193).
SMART_PUNCT_TABLE = str.maketrans("‘’“”—…", "''\"\"-.")

_WS_RE = re.compile(r"\s+")
_DOUBLE_LETTER_RE = re.compile(r"([a-zA-Z])\1+")


def remove_punct(s: str) -> str:
    """Removes ASCII punctuation (string.py:36-39)."""
    return s.translate(PUNCT_TABLE)


def replace_punct(s: str) -> str:
    """Replaces ASCII punctuation with spaces (string.py:41-44)."""
    return s.translate(PUNCT_SPACE_TABLE).strip()


def remove_unicode_punct(s: str) -> str:
    """Removes Unicode punctuation (string.py:46-49)."""
    return s.translate(UNICODE_PUNCT_TABLE)


def replace_unicode_punct(s: str) -> str:
    """Replaces Unicode punctuation with spaces (string.py:51-54)."""
    return s.translate(UNICODE_PUNCT_SPACE_TABLE).strip()


def remove_emojis(s: str) -> str:
    return EMOJI_REGEX.sub("", s)


def single_space(s: str) -> str:
    return _WS_RE.sub(" ", s)


def remove_double_letter(s: str) -> str:
    """Remove the second letter of double letters (string.py:66-69)."""
    return _DOUBLE_LETTER_RE.sub(r"\1", s)


def ngrams(s: str, n: int = 2) -> list[str]:
    """Character n-grams, sliding window (string.py:71-74)."""
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def ngram_format(s: str) -> str:
    """Name formatting for the char-ngram index (kb.py:260-264):
    strip unicode punct, lowercase, join tokens with '_', pad with '_'."""
    s = replace_unicode_punct(s).lower()
    s = "_".join(s.split(" "))
    return "_" + s + "_"


def shingles(s: str, n: int = 3) -> list[str]:
    """Character n-gram shingles over the lowercased, space-normalized string
    (feeds MinHash; distinct from the index's ngram_format)."""
    s = single_space(s.lower()).strip()
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]
