"""Double Metaphone phonetic codes — blocking keys for fuzzy name matching.

Implementation of Lawrence Philips' Double Metaphone algorithm (published in
C/C++ Users Journal, 2000; widely re-implemented public algorithm), written
from the published rules.  Produces a (primary, secondary) code pair; the
secondary differs only for ambiguous spellings.  Used as a composite blocking
key per BASELINE.json north_star; the reference has no phonetic blocking
(SURVEY.md §2.11), so there is no parity constraint — only determinism and
reasonable phonetic clustering of Latin-script names.

Covers the core consonant rules (CH/SH/TH/PH/GH/CK/SC/X/Z/J/W, silent
letters, Slavo-Germanic detection).  Names are uppercased and stripped of
non-alpha characters first; multi-token names are coded per token and joined
so token order matters (callers may sort tokens first for order-free keys).
"""

from __future__ import annotations

VOWELS = set("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def double_metaphone(word: str, max_len: int = 6) -> tuple[str, str]:
    """Return (primary, secondary) metaphone codes for one token."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return "", ""
    length = len(s)
    sg = _slavo_germanic(s)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, q: str | None = None):
        pri.append(p)
        sec.append(p if q is None else q)

    i = 0
    # initial silent letters: GN, KN, PN, WR, PS
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X sounds like S
    if s[0] == "X":
        add("S")
        i = max(i, 1)

    while i < length and (len("".join(pri)) < max_len or len("".join(sec)) < max_len):
        c = s[i]
        nxt = s[i + 1] if i + 1 < length else ""
        nxt2 = s[i + 2] if i + 2 < length else ""

        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if nxt == "B" else 1
            continue
        if c == "C":
            if s[i : i + 2] == "CH":
                if i == 0 and s[i : i + 4] != "CHIA" and not sg:
                    add("X", "K")  # church vs character
                elif s[i : i + 4] in ("CHAE",) or sg:
                    add("K")
                else:
                    add("X", "K")
                i += 2
                continue
            if s[i : i + 2] in ("CZ",):
                add("S", "X")
                i += 2
                continue
            if s[i : i + 2] == "CC" and nxt2 in "IEH":
                add("KS")
                i += 3
                continue
            if s[i : i + 2] in ("CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if nxt in "IEY":
                add("S", "X" if s[i : i + 3] == "CIO" else "S")
                i += 2
                continue
            add("K")
            i += 2 if nxt == "C" else 1
            continue
        if c == "D":
            if s[i : i + 2] == "DG":
                if nxt2 in "IEY":
                    add("J")  # edge
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if nxt in ("D", "T") else 1
            continue
        if c == "F":
            add("F")
            i += 2 if nxt == "F" else 1
            continue
        if c == "G":
            if nxt == "H":
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                elif i == 0:
                    add("J" if nxt2 == "I" else "K")
                else:
                    pass  # silent GH (night, laugh handled loosely)
                i += 2
                continue
            if nxt == "N":
                if i == 1 and _is_vowel(s, 0) and not sg:
                    add("KN", "N")
                elif s[i + 2 : i + 4] != "EY" and nxt2 != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if nxt in "IEY":
                add("K" if sg else "J", "K")
                i += 2
                continue
            add("K")
            i += 2 if nxt == "G" else 1
            continue
        if c == "H":
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue
        if c == "J":
            if s[i : i + 4] == "JOSE" or s[:4] == "SAN ":
                add("H")
            elif i == 0:
                add("J", "A")
            else:
                add("J", "H" if _is_vowel(s, i - 1) and not sg else "J")
            i += 2 if nxt == "J" else 1
            continue
        if c == "K":
            add("K")
            i += 2 if nxt == "K" else 1
            continue
        if c == "L":
            add("L")
            i += 2 if nxt == "L" else 1
            continue
        if c == "M":
            add("M")
            i += 2 if nxt == "M" or s[i - 1 : i + 3] == "UMB" else 1
            continue
        if c == "N":
            add("N")
            i += 2 if nxt == "N" else 1
            continue
        if c == "P":
            if nxt == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if nxt in ("P", "B") else 1
            continue
        if c == "Q":
            add("K")
            i += 2 if nxt == "Q" else 1
            continue
        if c == "R":
            add("R")
            i += 2 if nxt == "R" else 1
            continue
        if c == "S":
            if s[i : i + 2] == "SH":
                add("X")
                i += 2
                continue
            if s[i : i + 3] in ("SIO", "SIA"):
                add("S", "X" if not sg else "S")
                i += 3
                continue
            if s[i : i + 2] == "SC":
                if nxt2 == "H":
                    add("X", "SK")
                    i += 3
                elif nxt2 in "IEY":
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
                continue
            add("S")
            i += 2 if nxt in ("S", "Z") else 1
            continue
        if c == "T":
            if s[i : i + 2] == "TH" or s[i : i + 3] == "TTH":
                if s[i : i + 3] in ("TOM", "TAM") or sg:
                    add("T")
                else:
                    add("0", "T")  # 'th' phoneme
                i += 2
                continue
            if s[i : i + 3] in ("TIA", "TCH") or s[i : i + 3] == "TIO":
                add("X")
                i += 3
                continue
            add("T")
            i += 2 if nxt in ("T", "D") else 1
            continue
        if c == "V":
            add("F")
            i += 2 if nxt == "V" else 1
            continue
        if c == "W":
            if nxt == "R":
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(s, 1) or s[i : i + 2] == "WH"):
                add("A", "F")
            elif _is_vowel(s, i - 1) and _is_vowel(s, i + 1):
                add("", "F")  # e.g. Thurow -> sec F
            i += 1
            continue
        if c == "X":
            add("KS")
            i += 2 if nxt in ("C", "X") else 1
            continue
        if c == "Z":
            if nxt == "H":
                add("J")
                i += 2
                continue
            add("S", "TS" if sg else "S")
            i += 2 if nxt == "Z" else 1
            continue
        i += 1  # anything else: skip

    p = "".join(pri)[:max_len]
    q = "".join(sec)[:max_len]
    return p, q if q != p else p


def name_metaphone(name: str, max_len: int = 6) -> tuple[str, str]:
    """Code a (possibly multi-token) name: per-token codes joined by '_'."""
    toks = [t for t in name.split() if t]
    if not toks:
        return "", ""
    pris, secs = zip(*(double_metaphone(t, max_len) for t in toks))
    return "_".join(pris), "_".join(secs)
