"""Translators / transliterators (reference string.py:77-155).

Translator contract: translate(s, lang) -> str | None.

  DictTranslator        CI full-string map (string.py:92-102)
  MemoryCachedTranslator LRU wrapper (string.py:105-114)
  PersistentCachedTranslator cache-table wrapper (string.py:117-132);
                        pair it with state.kvcache.PersistentKVCache
  AccentStripRomanizer  pure-python romanizer for Latin-extended scripts:
                        NFKD-decompose and drop combining marks.  The
                        reference shells out to the uroman Perl script per
                        string (string.py:135-155) — not available here, so
                        non-Latin scripts raise NotImplementedError unless
                        ``strict=False`` (then returns None = no projection),
                        keeping the stage contract of NameProjector
                        (preprocessor.py:278-299).

At scale a translator is actor-pool state: construct once per actor inside a
map_batches class, never per batch.
"""

from __future__ import annotations

import functools
import unicodedata


class DictTranslator:
    """Case-insensitive full-string map; None when absent."""

    def __init__(self, mapping: dict[str, str]):
        self.map = {k.lower(): v for k, v in mapping.items()}

    def translate(self, s: str, lang: str | None = None) -> str | None:
        return self.map.get(s.lower())


class MemoryCachedTranslator:
    """LRU memory cache over another translator."""

    def __init__(self, translator, size: int = 1000):
        self.translator = translator
        self._cached = functools.lru_cache(maxsize=size)(self._translate)

    def _translate(self, s: str, lang: str | None) -> str | None:
        return self.translator.translate(s, lang)

    def translate(self, s: str, lang: str | None = None) -> str | None:
        return self._cached(s, lang)


class PersistentCachedTranslator:
    """Write-through persistent cache (dict-like backend, e.g.
    state.kvcache.PersistentKVCache)."""

    def __init__(self, translator, cache):
        self.translator = translator
        self.cache = cache

    def translate(self, s: str, lang: str | None = None) -> str | None:
        if s in self.cache:
            return self.cache[s]
        t = self.translator.translate(s, lang)
        if t:
            self.cache[s] = t
        return t


def _is_ascii(s: str) -> bool:
    return all(ord(c) < 128 for c in s)


class AccentStripRomanizer:
    """translate() -> romanized string for Latin-extended input.

    Mirrors URoman's gating (string.py:145-150): English or pure-ASCII
    strings are skipped (returns None = nothing to project)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def translate(self, s: str, lang: str | None = None) -> str | None:
        if lang == "eng" or _is_ascii(s):
            return None
        decomposed = unicodedata.normalize("NFKD", s)
        stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
        if _is_ascii(stripped):
            return stripped
        if self.strict:
            raise NotImplementedError(
                "non-Latin romanization needs uroman (perl) — not available "
                "in this environment"
            )
        return None
