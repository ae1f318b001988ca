"""LoReHLT submission / ground-truth tab format (8 columns).

Reference OutputWriter (io.py:269-297) and OutputReader (io.py:300-332).
Line shape (golden in reference tests/test_io.py:105-128):
  system_run_id \t mention_id \t mention_text \t doc:start-stop \t kb_id
  \t entity_type \t mention_type \t confidence
kb_id containing "NIL" ⇒ NIL link with that cluster id; otherwise a
'|'-joined list of KB entity ids.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import LINKS


def format_line(
    system_run_id: str,
    mention_id: str,
    mention_text: str,
    doc_id: str,
    char_start: int,
    char_stop: int,
    kb_id: str,
    entity_type: str,
    mention_type: str = "NAM",
    confidence: float = 1.0,
) -> str:
    return (
        f"{system_run_id}\t{mention_id}\t{mention_text}\t"
        f"{doc_id}:{char_start}-{char_stop}\t{kb_id}\t{entity_type}\t"
        f"{mention_type}\t{confidence}"
    )


def write_submission_batch(t: pa.Table, system_run_id: str = "hamerkop_ray") -> pa.Table:
    """mentions-output batch → one formatted line per row (column 'line') —
    feed to Dataset.write_csv/write_text or join for a golden compare."""
    lines = []
    for r in t.to_pylist():
        kb_id = r["entity_id"] if r["entity_id"] else r["cluster_id"]
        lines.append(
            format_line(
                system_run_id,
                r["mention_id"],
                r["mention_text"],
                r["doc_id"],
                r["char_start"],
                r["char_stop"],
                kb_id,
                r["entity_type"],
            )
        )
    return pa.table({"line": pa.array(lines, pa.string())})


def parse_submission_text(text: str) -> pa.Table:
    """Submission/GT text → LINKS table (OutputReader semantics,
    io.py:300-332: kb_id containing NIL ⇒ cluster id, else '|'-joined ids —
    we keep kb_id verbatim; split on use)."""
    rows = []
    for line in text.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t")
        if len(parts) < 8:
            continue
        doc_part, offsets = parts[3].rsplit(":", 1)
        start_s, stop_s = offsets.split("-")
        rows.append(
            {
                "system_run_id": parts[0],
                "mention_id": parts[1],
                "mention_text": parts[2],
                "doc_id": doc_part,
                "char_start": int(start_s),
                "char_stop": int(stop_s),
                "kb_id": parts[4],
                "entity_type": parts[5],
                "mention_type": parts[6],
                "confidence": float(parts[7]),
            }
        )
    return pa.Table.from_pylist(rows, schema=LINKS)


def is_nil(kb_id: str) -> bool:
    return "NIL" in kb_id


def link_ids(kb_id: str) -> list[str]:
    return [] if is_nil(kb_id) else kb_id.split("|")
