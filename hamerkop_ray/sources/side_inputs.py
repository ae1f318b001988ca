"""Small broadcast side-input loaders (reference DictionaryLoader /
SetLoader, utilities.py:127-151).

These produce plain python dict/set objects meant to be shipped ONCE via
ray.put and materialized per actor — never reloaded per batch.
"""

from __future__ import annotations

import csv


def load_tsv_dict(path: str, lowercase_keys: bool = False) -> dict[str, str]:
    """2-column TSV → dict (utilities.py:127-138)."""
    out: dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="\t", quoting=csv.QUOTE_NONE):
            if len(row) < 2:
                continue
            key = row[0].lower() if lowercase_keys else row[0]
            out[key] = row[1]
    return out


def load_set(path: str, lowercase: bool = False) -> set[str]:
    """Line file → set (utilities.py:141-151)."""
    out: set[str] = set()
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.add(line.lower() if lowercase else line)
    return out
