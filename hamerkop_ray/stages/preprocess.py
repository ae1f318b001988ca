"""Stage 2 — preprocess: vectorized mention normalization/filter cascade.

Each reference Preprocessor (preprocessor.py:21-368) mutates mentions of one
document in place.  All of them are per-mention maps or filters, so here each
becomes a vectorized function ``pa.Table -> pa.Table`` over the mentions table
(rewriting the ``norm`` column or dropping rows), and a cascade is plain
function composition fused into ONE map_batches — no shuffle, no extra passes.

Removal/modification counting (reference PreprocessorReporter,
preprocessor.py:40-154) is kept as per-batch counters returned alongside the
table when ``report`` is enabled; at scale these are additive and are summed
into the run metrics (see state.metrics).
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import strings

ENTITY_TYPES = ("PER", "ORG", "GPE", "LOC")

Step = Callable[[pa.Table], pa.Table]


class Reporter:
    """Additive removal/modification counters (PreprocessorReporter analog).

    An instance lives inside each map_batches worker; counts are merged
    driver-side by summing counters (they are additive across batches/docs).
    """

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.removals: Counter = Counter()
        self.modifications: Counter = Counter()

    def removal(self, name: str, before: int, after: int):
        if self.enabled and before != after:
            self.removals[name] += before - after

    def modification(self, name: str, changed: int):
        if self.enabled and changed:
            self.modifications[name] += changed


def _count_changed(before: pa.Array, after: pa.Array) -> int:
    return len(after) - pc.sum(
        pc.cast(pc.equal(before, after), pa.int32())
    ).as_py() if len(after) else 0


# --- filters (row removals) -------------------------------------------------


def type_validator(reporter: Reporter | None = None) -> Step:
    """Drop mentions with type not in {PER,ORG,GPE,LOC} (preprocessor.py:176-183)."""

    def step(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["entity_type"], value_set=pa.array(ENTITY_TYPES))
        out = t.filter(mask)
        if reporter:
            reporter.removal("TypeValidator", t.num_rows, out.num_rows)
        return out

    return step


def garbage_remover(reporter: Reporter | None = None) -> Step:
    """Drop urls and empty strings (preprocessor.py:202-213)."""

    def step(t: pa.Table) -> pa.Table:
        s = t["norm"]
        bad = pc.or_(
            pc.or_(
                pc.match_substring(s, "www."),
                pc.match_substring(s, "http:"),
            ),
            pc.match_substring(s, "https:"),
        )
        mask = pc.and_(pc.invert(bad), pc.not_equal(s, ""))
        out = t.filter(mask)
        if reporter:
            reporter.removal("GarbageRemover", t.num_rows, out.num_rows)
        return out

    return step


def too_long_mention_remover(max_tokens: int = 6, reporter: Reporter | None = None) -> Step:
    """Drop mentions with >= max_tokens tokens, counted as spaces
    (preprocessor.py:230-241: ``string.count(' ') < max_tokens``)."""

    def step(t: pa.Table) -> pa.Table:
        mask = pc.less(pc.count_substring(t["norm"], " "), max_tokens)
        out = t.filter(mask)
        if reporter:
            reporter.removal("TooLongMentionRemover", t.num_rows, out.num_rows)
        return out

    return step


def blacklist(names: Sequence[str], reporter: Reporter | None = None) -> Step:
    """Drop mentions whose lowercase string is blacklisted (preprocessor.py:244-254;
    case-insensitive semantics = equality on lowered keys, utilities.py:12-46)."""
    lowered = pa.array(sorted({n.lower() for n in names}))

    def step(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(pc.utf8_lower(t["norm"]), value_set=lowered))
        out = t.filter(mask)
        if reporter:
            reporter.removal("Blacklist", t.num_rows, out.num_rows)
        return out

    return step


# --- maps (norm-column rewrites) -------------------------------------------


def _rewrite_norm(t: pa.Table, new: pa.Array) -> pa.Table:
    i = t.schema.get_field_index("norm")
    return t.set_column(i, "norm", new)


def text_normalizer(reporter: Reporter | None = None) -> Step:
    """Smart quotes/em-dash/ellipsis → ascii; strip emoji (preprocessor.py:186-199)."""

    def step(t: pa.Table) -> pa.Table:
        vals = t["norm"].to_pylist()
        new = [
            strings.remove_emojis(v.translate(strings.SMART_PUNCT_TABLE)) for v in vals
        ]
        arr = pa.array(new, type=pa.string())
        if reporter:
            reporter.modification("TextNormalizer", _count_changed(t["norm"].combine_chunks(), arr))
        return _rewrite_norm(t, arr)

    return step


def fix_type(type_map: dict[str, str]) -> Step:
    """Override entity_type by lowercase-name lookup (preprocessor.py:216-227)."""
    lowered = {k.lower(): v for k, v in type_map.items()}

    def step(t: pa.Table) -> pa.Table:
        keys = pc.utf8_lower(t["norm"]).to_pylist()
        cur = t["entity_type"].to_pylist()
        new = [lowered.get(k, c) for k, c in zip(keys, cur)]
        i = t.schema.get_field_index("entity_type")
        return t.set_column(i, "entity_type", pa.array(new, type=pa.string()))

    return step


def acronym_replacer(acronym_map: dict[str, str], ci: bool = False,
                     reporter: Reporter | None = None) -> Step:
    """Replace whole string via acronym→name map (preprocessor.py:257-275)."""
    amap = {k.lower(): v for k, v in acronym_map.items()} if ci else dict(acronym_map)

    def step(t: pa.Table) -> pa.Table:
        vals = t["norm"].to_pylist()
        if ci:
            new = [amap.get(v.lower(), v) for v in vals]
        else:
            new = [amap.get(v, v) for v in vals]
        arr = pa.array(new, type=pa.string())
        if reporter:
            reporter.modification("AcronymReplacer", _count_changed(t["norm"].combine_chunks(), arr))
        return _rewrite_norm(t, arr)

    return step


def name_stemmer(stem_map: dict[str, str]) -> Step:
    """Per-token stem via dictionary (preprocessor.py:302-318 + DictStemmer
    string.py:171-180; case-insensitive keys)."""
    smap = {k.lower(): v for k, v in stem_map.items()}

    def step(t: pa.Table) -> pa.Table:
        vals = t["norm"].to_pylist()
        new = [
            " ".join(smap.get(w.lower(), w) for w in v.split()) for v in vals
        ]
        return _rewrite_norm(t, pa.array(new, type=pa.string()))

    return step


def name_projector(func: Callable[[str, str], str | None], var: str = "translit") -> Step:
    """Fill translit/translate column = f(norm, lang), only when the result
    differs from the input (preprocessor.py:278-299).  ``func`` must be
    serializable; for model-backed projection wrap this step in an actor-pool
    class so the model loads once per actor."""
    assert var in ("translit", "translate")

    def step(t: pa.Table) -> pa.Table:
        vals = t["norm"].to_pylist()
        langs = t["lang"].to_pylist()
        cur = t[var].to_pylist()
        new = []
        for v, lg, c in zip(vals, langs, cur):
            p = func(v, lg)
            new.append(p if (p and p != v) else c)
        i = t.schema.get_field_index(var)
        return t.set_column(i, var, pa.array(new, type=pa.string()))

    return step


def twitter_username_replacer(username_map: dict[str, str],
                              reporter: Reporter | None = None) -> Step:
    """@username → screen name, tweets only (preprocessor.py:321-345)."""

    def fix(v: str) -> str:
        if v and v[0] == "@":
            s = strings.remove_emojis(v[1:])
            if s and not (s[-1].isalpha() or s[-1].isdigit() or s[-1] == "_"):
                s = s[:-1]
            if s in username_map:
                return username_map[s]
        return v

    def step(t: pa.Table) -> pa.Table:
        is_tweet = pc.equal(t["doc_type"], "twitter").to_pylist()
        vals = t["norm"].to_pylist()
        new = [fix(v) if tw else v for v, tw in zip(vals, is_tweet)]
        arr = pa.array(new, type=pa.string())
        if reporter:
            reporter.modification("TwitterUsernameReplacer",
                                  _count_changed(t["norm"].combine_chunks(), arr))
        return _rewrite_norm(t, arr)

    return step


def twitter_hashtag_processor(reporter: Reporter | None = None) -> Step:
    """#CamelCase → 'Camel Case' (preprocessor.py:348-368).  Note the reference
    applies this to ALL doc types (no tweet gate), so we do too."""
    import re

    rx = re.compile("[A-Z]*[a-z]*")

    def fix(v: str) -> str:
        if v and v[0] == "#":
            v = v[1:]
            parts = [m for m in rx.findall(v) if m]
            if parts:
                return " ".join(parts)
        return v

    def step(t: pa.Table) -> pa.Table:
        vals = t["norm"].to_pylist()
        new = [fix(v) for v in vals]
        arr = pa.array(new, type=pa.string())
        if reporter:
            reporter.modification("TwitterHashtagProcessor",
                                  _count_changed(t["norm"].combine_chunks(), arr))
        return _rewrite_norm(t, arr)

    return step


def passthru() -> Step:
    return lambda t: t


def cascade(steps: Sequence[Step]) -> Step:
    """CascadePreprocessor (preprocessor.py:163-173): ordered composition,
    fused into one batch function."""

    def step(t: pa.Table) -> pa.Table:
        for s in steps:
            t = s(t)
        return t

    return step


def default_cascade(reporter: Reporter | None = None) -> Step:
    """The canonical wiring (reference README.md:32-58 spirit): validate types,
    normalize text, drop garbage/too-long, process twitter forms."""
    return cascade(
        [
            type_validator(reporter),
            text_normalizer(reporter),
            twitter_username_replacer({}, reporter),
            twitter_hashtag_processor(reporter),
            garbage_remover(reporter),
            too_long_mention_remover(6, reporter),
        ]
    )
