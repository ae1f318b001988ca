"""LoReHLT KB ingestion: entities.tab + alternate_names.tab → KB arrow table.

Reference: EntityCreator / EntityLoader / entity & name filters
(io.py:335-673).  The 47-column positional layout is preserved; only the
consumed columns are materialized (ENTITY_KEYS + per-type context columns,
io.py:388-403).  In the new engine this is a one-time KB-prep job producing
a parquet/arrow KB table (SURVEY.md §3.2) that the pipeline broadcasts or
joins against; no pickle caches (the table IS the cache).

Filters keep tri-state cascade semantics (True keep / False drop / None defer;
nobody votes keep ⇒ drop, io.py:525-537), applied per row while the KB file
is parsed — a one-time prep job over a dimension-sized table, where parse
cost dominates and per-row predicates are fine (they would NOT be fine in a
per-batch pipeline stage).
"""

from __future__ import annotations

import csv
import io as _io
import re

import pyarrow as pa

from ..functions import strings
from ..schemas import KB

# column indices (LoReHLT layout, io.py:340-386)
ORIGIN = 0
ENTITY_TYPE = 1
ENTITY_ID = 2
NAME = 3
LATITUDE = 5
LONGITUDE = 6
FEATURE_CODE_NAME = 10
COUNTRY_CODE = 12
POPULATION = 21
PER_GPE_LOC_OF_ASSOCIATION = 26
PER_TITLE_OR_POSITION = 27
PER_ORG_OF_ASSOCIATION = 28
ORG_GPE_LOC_OF_ASSOCIATION = 39
EXTERNAL_LINK = 46
N_COLUMNS = 47


def _float(v: str):
    try:
        return float(v)
    except (ValueError, TypeError):
        return None


def _int(v: str):
    try:
        return int(v)
    except (ValueError, TypeError):
        return None


# --- tri-state filters ------------------------------------------------------


class CascadeFilter:
    """First non-None vote wins; default drop (io.py:525-537)."""

    def __init__(self, filters):
        self.filters = filters

    def __call__(self, row) -> bool:
        for f in self.filters:
            v = f(row)
            if v is not None:
                return v
        return False


def origin_filter(*origins: str):
    """Keep if origin prefix ∈ origins (io.py:540-550)."""

    def f(row):
        return True if row[ORIGIN][:3] in origins else None

    return f


def link_filter():
    """Keep if external_link non-empty (io.py:553-557)."""

    def f(row):
        return True if row[EXTERNAL_LINK] else None

    return f


def country_filter(*cc: str):
    """Keep if country code ∈ set (io.py:560-569)."""
    codes = {c.upper() for c in cc}

    def f(row):
        return True if row[COUNTRY_CODE] in codes else None

    return f


# name filters (io.py:573-673)

SCRIPT_REGEXES = {
    "ge'ez": re.compile(r"^[ሀ-፿]+$"),
    "arabic": re.compile(r"^[؀-ۿ]+$"),
    "sinhala": re.compile(r"^[඀-෿]+$"),
    "odia": re.compile(r"^[଀-୿]+$"),
}


def script_name_filter(*scripts: str):
    """Keep English (all codepoints ≤127 after punct strip) or configured
    scripts (io.py:604-637)."""
    wanted = [s.lower() for s in scripts]

    def f(name: str):
        s = strings.replace_unicode_punct(name)
        s = strings.replace_punct(s)
        if all(ord(c) <= 127 for c in s):
            return True
        for sc in wanted:
            if SCRIPT_REGEXES[sc].match(s):
                return True
        return False

    return f


def language_name_filter(name_langs: dict[str, str], lang: str):
    """Drop a name whose known language ∉ {en, target, ''} (io.py:640-672).
    ``name_langs`` is the lowercase name→lang map (geonames-style side input,
    broadcast at scale)."""
    allowed = {"en", lang.lower(), ""}

    def f(name: str):
        known = name_langs.get(name.lower())
        if known is not None and known not in allowed:
            return False
        return True

    return f


def cascade_name_filter(filters):
    return CascadeFilter(filters)


# --- parsing ----------------------------------------------------------------


def parse_entities_text(
    text: str, entity_filter=None, include_header: bool = True
) -> list[dict]:
    """entities.tab rows → KB dicts (names = [canonical] initially)."""
    reader = csv.reader(_io.StringIO(text), delimiter="\t", quoting=csv.QUOTE_NONE)
    rows = list(reader)
    if include_header and rows:
        rows = rows[1:]
    out = []
    for row in rows:
        if len(row) < N_COLUMNS:
            row = row + [""] * (N_COLUMNS - len(row))
        if entity_filter and not entity_filter(row):
            continue
        etype = row[ENTITY_TYPE]
        links = row[EXTERNAL_LINK].split("|") if row[EXTERNAL_LINK] else []
        if etype == "PER":
            locs = row[PER_GPE_LOC_OF_ASSOCIATION].split("|")
            country = locs[0] if locs and locs[0] else ""
        elif etype == "ORG":
            locs = row[ORG_GPE_LOC_OF_ASSOCIATION].split("|")
            country = locs[0] if locs and locs[0] else ""
        else:
            country = row[COUNTRY_CODE]
        out.append(
            {
                "entity_id": row[ENTITY_ID],
                "entity_type": etype,
                "name": row[NAME],
                "names": [row[NAME]],
                "origin": row[ORIGIN],
                "urls": links,
                "country": country or "",
                "latitude": _float(row[LATITUDE]),
                "longitude": _float(row[LONGITUDE]),
                "population": _int(row[POPULATION]),
            }
        )
    return out


def parse_alt_names_text(text: str, include_header: bool = True) -> list[tuple[str, str]]:
    reader = csv.reader(_io.StringIO(text), delimiter="\t", quoting=csv.QUOTE_NONE)
    rows = list(reader)
    if include_header and rows:
        rows = rows[1:]
    return [(r[0], r[1]) for r in rows if len(r) >= 2]


def load_kb_table(
    entities_path: str,
    alt_names_path: str | None = None,
    *,
    entity_filter=None,
    name_filter=None,
) -> pa.Table:
    """Full KB load (EntityLoader semantics, io.py:465-504): entities →
    filter → merge alternate names (names for absent entities dropped)."""
    with open(entities_path, "r", encoding="utf-8") as f:
        ents = parse_entities_text(f.read(), entity_filter)
    by_id = {e["entity_id"]: e for e in ents}
    if alt_names_path:
        with open(alt_names_path, "r", encoding="utf-8") as f:
            for eid, alt in parse_alt_names_text(f.read()):
                e = by_id.get(eid)
                if e is None:
                    continue  # names for absent entities dropped (io.py:495)
                if name_filter and not name_filter(alt):
                    continue
                if alt not in e["names"]:
                    e["names"].append(alt)
    return pa.Table.from_pylist(list(by_id.values()), schema=KB)


def kb_recall(kb_table: pa.Table, gt_kb_ids: set[str]) -> tuple[float, set[str]]:
    """KBLoadingScorer analog (kb.py:59-81): recall of GT ids present in the
    KB + the missed set — an anti-join, not a loop, at scale."""
    have = set(kb_table["entity_id"].to_pylist())
    linked = {i for i in gt_kb_ids if "NIL" not in i}
    missed = linked - have
    recall = 1 - len(missed) / len(linked) if linked else 1.0
    return recall, missed
