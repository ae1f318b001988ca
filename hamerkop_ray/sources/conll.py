"""CoNLL TSV ⇄ documents(spans) conversion.

The reference ingests 7-column CoNLL (`token tag token doc_id start stop
sentence`, io.py:50-93) and builds mentions with a BIO state machine
(io.py:122-141).  In the new engine the canonical input is the documents
table (doc_id, spans); this module converts between the two:

  read_conll_text / read_conll_dataset — CoNLL → documents table.  The BIO
  state machine runs at ingest (B starts a mention, I extends it, anything
  else ends it; the tag suffix is the entity type; consecutive B tags start
  new mentions; a trailing I is closed at end of doc).  Mention tokens are
  folded into a single mention/TYPE span (see stages.parse contract).

  to_conll_text — documents table → CoNLL text (used by differential tests to
  feed the importable reference the exact same corpus).  Media spans have no
  CoNLL representation and are skipped — the reference never sees media, and
  media contributes no chars/tokens on our side either, so offsets agree.
"""

from __future__ import annotations

import io as _io

import pyarrow as pa

from ..schemas import DOCUMENTS


def _doc_rows_to_spans(rows: list[tuple[str, str, int, int]]) -> list[dict]:
    """rows: (token, tag, start, stop) for one document → span dicts.

    BIO semantics of io.py:122-141: I continues a mention only while in one;
    B always starts a new mention (closing any open one).
    """
    spans: list[dict] = []
    open_toks: list[tuple[str, int, int]] = []  # (token, start, stop)
    open_type = ""

    def close():
        nonlocal open_toks, open_type
        if open_toks:
            surface = " ".join(t for t, _, _ in open_toks)
            spans.append(
                {
                    "kind": f"mention/{open_type}" if open_type else "mention",
                    "text": surface,
                    "media_ref": "",
                    "offset": open_toks[0][1],
                }
            )
            open_toks = []
            open_type = ""

    for token, tag, start, stop in rows:
        head = tag[0] if tag else "O"
        if head == "I" and open_toks:
            open_toks.append((token, start, stop))
            continue
        close()
        if head == "B":
            open_type = tag[2:]
            open_toks = [(token, start, stop)]
        else:
            spans.append({"kind": "token", "text": token, "media_ref": "", "offset": start})
    close()
    return spans


def read_conll_text(text: str) -> pa.Table:
    """Parse CoNLL TSV text into a documents table (doc boundaries at
    consecutive doc_id changes, io.py:84-87; <6-column lines are sentence
    breaks and skipped, io.py:74-76)."""
    docs: list[dict] = []
    cur_id: str | None = None
    cur_rows: list[tuple[str, str, int, int]] = []

    def flush():
        nonlocal cur_rows, cur_id
        if cur_id is not None and cur_rows:
            docs.append({"doc_id": cur_id, "spans": _doc_rows_to_spans(cur_rows)})
        cur_rows = []

    for line in text.splitlines():
        parts = line.split("\t")
        if len(parts) < 6:
            continue
        tag, token, doc_id = parts[1], parts[2], parts[3]
        if not tag:
            raise ValueError(f"Bad conll format data: {parts}")
        if doc_id != cur_id:
            flush()
            cur_id = doc_id
        cur_rows.append((token, tag, int(parts[4]), int(parts[5])))
    flush()
    return pa.Table.from_pylist(docs, schema=DOCUMENTS)


def read_conll_files(paths: list[str]):
    """CoNLL files → ray.data.Dataset of documents.  Each file is one read
    task (doc boundaries are intra-file, so files shard safely)."""
    import ray.data as rd

    tables = []
    for p in paths:
        with open(p, "r", encoding="utf-8") as f:
            tables.append(read_conll_text(f.read()))
    return rd.from_arrow(pa.concat_tables(tables))


def to_conll_text(docs: pa.Table, sent_id: str = "segment-0") -> str:
    """documents table → 7-col CoNLL text (inverse of read_conll_text)."""
    buf = _io.StringIO()
    for row in docs.to_pylist():
        doc_id = row["doc_id"]
        for span in row["spans"]:
            kind = span["kind"]
            if kind == "token":
                tok = span["text"]
                start = span["offset"]
                stop = start + len(tok) - 1
                buf.write(f"{tok}\tO\t{tok}\t{doc_id}\t{start}\t{stop}\t{sent_id}\n")
            elif kind.startswith("mention"):
                etype = kind[8:] if len(kind) > 8 and kind[7] == "/" else "MISC"
                toks = span["text"].split(" ")
                pos = span["offset"]
                for i, tok in enumerate(toks):
                    tag = ("B-" if i == 0 else "I-") + etype
                    start = pos
                    stop = start + len(tok) - 1
                    buf.write(f"{tok}\t{tag}\t{tok}\t{doc_id}\t{start}\t{stop}\t{sent_id}\n")
                    pos = stop + 2  # inclusive stop + space
            # media spans: no CoNLL representation
    return buf.getvalue()
