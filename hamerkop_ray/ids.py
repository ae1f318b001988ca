"""Deterministic, content-derived identifiers.

The reference uses a global sequential counter explicitly documented as
"Non-parallel processing safe" (utilities.py:92-100).  For a distributed,
retry-safe engine every id must be a pure function of content so that any
partitioning / retry / resume produces identical ids.  The reference's own
coref scorer already keys mentions by offsets (coref.py:174-176), so
offset-derived ids are parity-safe.
"""

from __future__ import annotations

import hashlib


def mention_id(doc_id: str, char_start: int, char_stop: int) -> str:
    return f"M-{doc_id}-{char_start}-{char_stop}"


def chain_id(doc_id: str, min_char_start: int) -> str:
    """Chain id = doc-scoped, keyed by the chain's earliest mention offset."""
    return f"C-{doc_id}-{min_char_start}"


def node_id(doc_id: str, chain: str) -> str:
    """Global graph-node id for a within-doc chain."""
    return f"{doc_id}\x1f{chain}"


def entity_node_id(kb_entity_id: str) -> str:
    return f"E\x1f{kb_entity_id}"


def stable_hash64(s: str, salt: str = "") -> int:
    """Deterministic 64-bit hash (python's hash() is per-process salted)."""
    h = hashlib.blake2b(f"{salt}\x00{s}".encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "little")


def stable_bucket(s: str, n: int, salt: str = "") -> int:
    return stable_hash64(s, salt) % n
