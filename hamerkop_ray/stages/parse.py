"""Stage 1 — parse: documents(spans) → mentions table.

Re-expresses hamerkop's InputReader/DocumentPreparer (io.py:21-164) as a
stateless, embarrassingly-parallel map_batches over the documents table: every
input row (one document) yields its mention rows inside the same task, so doc
locality is free and no shuffle happens.

Span encoding contract (see schemas.SPAN_TYPE):
  kind='token'          one document token (text = token).
  kind='mention/TYPE'   one tagged mention (text = full surface form, possibly
                        multi-token; its tokens ARE document tokens and are not
                        repeated as token spans — mirrors CoNLL BIO where
                        mention tokens are document tokens, io.py:122-141).
                        TYPE carries the NER tag suffix like BIO 'B-PER'.
                        Bare 'mention' means unknown type.
  kind='media'          interleaved opaque media; identity-only passthrough,
                        contributes no chars/tokens.
  offset                1-based char start in the implicit document text
                        (' '-joined tokens), hamerkop convention core.py:155.

The spans column itself is never modified anywhere in the engine; the per-row
span-sequence invariant required by BASELINE.json holds by construction.
"""

from __future__ import annotations

import pyarrow as pa

from .. import ids
from ..schemas import MENTIONS

# DocType detection from doc_id substring (reference core.py:50-70).
_DOC_TYPES = [
    ("_SN_", "twitter"),
    ("_WL_", "blog"),
    ("_RF_", "reference"),
    ("_DF_", "discussion forum"),
    ("_NW_", "newswire"),
]


def detect_doc_type(doc_id: str) -> str:
    for marker, dt in _DOC_TYPES:
        if marker in doc_id:
            return dt
    return "unknown"  # reference raises (core.py:70); we degrade gracefully


def doc_text_and_tokens(kinds: list[str], texts: list[str]) -> tuple[str, list[str]]:
    """Reconstruct the implicit document text and token stream of one row."""
    tokens: list[str] = []
    for k, t in zip(kinds, texts):
        if k == "token":
            tokens.append(t)
        elif k.startswith("mention"):
            tokens.extend(t.split(" "))
    return " ".join(tokens), tokens


class ParseDocuments:
    """spans → mentions, for map_batches(batch_format="pyarrow").

    Usable as a plain task (stateless) or, with a language detector, as an
    actor-pool class so the detector's profiles load once per actor.
    """

    def __init__(self, lang_detector=None, default_lang: str = "eng"):
        self.lang_detector = lang_detector
        self.default_lang = default_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the vectorized fast path covers the default configuration; the
        # row-wise path remains for language detection (needs per-doc token
        # lists) and for subclasses that override _parse_one (GT parse)
        if type(self) is ParseDocuments and self.lang_detector is None:
            return self._call_vectorized(batch)
        return self._call_rowwise(batch)

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        """Arrow/numpy kernels end-to-end: the spans column never becomes
        python objects (the to_pylist conversion was ~60% of the whole fused
        ER stage's CPU and its memory-bandwidth hot spot)."""
        import numpy as np
        import pyarrow.compute as pc

        spans = batch.column("spans").combine_chunks()
        chunk = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        n_docs = len(chunk)
        if n_docs == 0:
            return MENTIONS.empty_table()
        flat = chunk.flatten()
        kinds = flat.field("kind")
        texts = flat.field("text")
        offs = flat.field("offset")
        parents = np.asarray(pc.list_parent_indices(chunk)).astype(np.int64)
        n_spans = len(parents)
        if n_spans == 0:
            return MENTIONS.empty_table()

        is_token = np.asarray(pc.equal(kinds, "token"))
        is_mention = np.asarray(pc.starts_with(kinds, "mention"))
        nsp = np.asarray(pc.count_substring(texts, " ")).astype(np.int64)

        # per-span token contribution → exclusive running count within doc
        tok_counts = np.where(is_token, 1, 0) + np.where(is_mention, nsp + 1, 0)
        cum = np.concatenate([[0], np.cumsum(tok_counts)])
        first_span = np.searchsorted(parents, np.arange(n_docs))  # per-doc start
        tok_before = cum[:-1] - cum[first_span][parents]

        # mention ordinal within its doc
        mcum = np.concatenate([[0], np.cumsum(is_mention.astype(np.int64))])
        mention_idx_all = mcum[:-1] - mcum[first_span][parents]

        sel = np.nonzero(is_mention)[0]
        if len(sel) == 0:
            return MENTIONS.empty_table()
        sel_arr = pa.array(sel)
        m_texts = pc.take(texts, sel_arr)
        m_kinds = pc.take(kinds, sel_arr)
        m_par = parents[sel]

        doc_id_col = batch.column("doc_id").combine_chunks()
        m_doc_ids = pc.take(doc_id_col, pa.array(m_par))
        char_start = pc.cast(pc.take(offs, sel_arr), pa.int32())
        char_stop = pc.cast(
            pc.add(
                pc.cast(char_start, pa.int64()),
                pc.subtract(pc.cast(pc.utf8_length(m_texts), pa.int64()), 1),
            ),
            pa.int32(),
        )
        etype = pc.utf8_slice_codeunits(m_kinds, 8)  # '' for bare 'mention'
        n_toks = nsp[sel] + 1
        tok_start = tok_before[sel]
        mention_ids = pc.binary_join_element_wise(
            "M", pc.cast(m_doc_ids, pa.string()),
            pc.cast(char_start, pa.string()), pc.cast(char_stop, pa.string()),
            "-",
        )

        # doc_type per doc (n_docs python calls on short ids — dimension-cheap)
        dt = pa.array(
            [detect_doc_type(d) for d in doc_id_col.to_pylist()], pa.string()
        )
        m_doc_types = pc.take(dt, pa.array(m_par))
        n_m = len(sel)
        const_empty = pa.nulls(n_m, pa.string()).fill_null("")
        return pa.Table.from_arrays(
            [
                mention_ids,
                m_doc_ids,
                pa.array(mention_idx_all[sel].astype(np.int32)),
                m_texts,  # surface
                m_texts,  # norm starts equal to surface
                const_empty,  # translit
                const_empty,  # translate
                etype,
                char_start,
                char_stop,
                pa.array(tok_start.astype(np.int32)),
                pa.array((tok_start + n_toks).astype(np.int32)),
                pa.nulls(n_m, pa.string()).fill_null(self.default_lang),
                m_doc_types,
            ],
            schema=MENTIONS,
        )

    def _call_rowwise(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans")
        # Flatten once per batch: one ListArray → offsets + child struct arrays.
        rows: list[tuple] = []
        for chunk_doc_offset, chunk in self._chunks(spans_col):
            flat = chunk.flatten()  # StructArray of all spans in this chunk
            kinds = flat.field("kind").to_pylist()
            texts = flat.field("text").to_pylist()
            offs = flat.field("offset").to_pylist()
            # rebase: for a SLICED ListArray view, .offsets values index the
            # original child while flatten() returns a rebased child — without
            # subtracting offsets[0] every span list reads as empty/garbage
            raw = chunk.offsets.to_pylist()
            base = raw[0]
            list_offsets = [o - base for o in raw]
            for i in range(len(chunk)):
                lo, hi = list_offsets[i], list_offsets[i + 1]
                doc_id = doc_ids[chunk_doc_offset + i]
                rows.extend(
                    self._parse_one(
                        doc_id, kinds[lo:hi], texts[lo:hi], offs[lo:hi]
                    )
                )
        if not rows:
            return MENTIONS.empty_table()
        cols = list(zip(*rows))
        arrays = [
            pa.array(cols[j], type=MENTIONS.field(j).type)
            for j in range(len(MENTIONS.names))
        ]
        return pa.Table.from_arrays(arrays, schema=MENTIONS)

    @staticmethod
    def _chunks(col):
        """Yield (row_offset, ListArray) over a possibly-chunked column."""
        if isinstance(col, pa.ChunkedArray):
            off = 0
            for chunk in col.chunks:
                yield off, chunk
                off += len(chunk)
        else:
            yield 0, col

    def _parse_one(self, doc_id, kinds, texts, offs) -> list[tuple]:
        doc_type = detect_doc_type(doc_id)
        lang = self.default_lang
        if self.lang_detector is not None:
            tokens = [t for k, t in zip(kinds, texts) if k == "token" and t]
            lang = self.lang_detector.detect(doc_id, tokens)
        out = []
        tok_cursor = 0
        mention_idx = 0
        for kind, text, offset in zip(kinds, texts, offs):
            if kind == "token":
                tok_cursor += 1
            elif kind.startswith("mention"):
                etype = kind[8:] if len(kind) > 8 and kind[7] == "/" else ""
                n_toks = text.count(" ") + 1
                char_start = int(offset)
                char_stop = char_start + len(text) - 1  # inclusive
                out.append(
                    (
                        ids.mention_id(doc_id, char_start, char_stop),
                        doc_id,
                        mention_idx,
                        text,  # surface
                        text,  # norm starts equal to surface
                        "",  # translit
                        "",  # translate
                        etype,
                        char_start,
                        char_stop,
                        tok_cursor,
                        tok_cursor + n_toks,
                        lang,
                        doc_type,
                    )
                )
                tok_cursor += n_toks
                mention_idx += 1
            # media spans: no chars, no tokens, identity-only
        return out


class ParseDocumentsWithGroundTruth(ParseDocuments):
    """GT-driven mention extraction (DocumentPreparerUsingGroundTruth,
    io.py:167-254): mention boundaries & types come from the ground-truth
    link table keyed by (doc_id, char_start, char_stop) instead of span
    markers; documents absent from the GT are dropped.

    gt: {doc_id: {(start, stop): entity_type}} — broadcast via ray.put and
    materialized once per actor when used in an actor pool.
    """

    def __init__(self, gt, lang_detector=None, default_lang: str = "eng"):
        super().__init__(lang_detector, default_lang)
        try:
            import ray

            if isinstance(gt, ray.ObjectRef):
                gt = ray.get(gt)
        except ImportError:
            pass
        self.gt = gt

    def _parse_one(self, doc_id, kinds, texts, offs) -> list[tuple]:
        doc_gt = self.gt.get(doc_id)
        if not doc_gt:
            return []  # docs absent from GT are dropped (io.py:237-240)
        doc_type = detect_doc_type(doc_id)
        lang = self.default_lang
        if self.lang_detector is not None:
            tokens = [t for k, t in zip(kinds, texts) if k == "token" and t]
            lang = self.lang_detector.detect(doc_id, tokens)
        # reconstruct text + per-token char/token offsets
        text_parts: list[str] = []
        tok_char_starts: list[int] = []
        cursor = 0
        for k, t in zip(kinds, texts):
            if k == "token":
                toks = [t]
            elif k.startswith("mention"):
                toks = t.split(" ")
            else:
                continue
            for tok in toks:
                tok_char_starts.append(cursor + 1)
                text_parts.append(tok)
                cursor += len(tok) + 1
        text = " ".join(text_parts)
        out = []
        for mention_idx, ((start, stop), etype) in enumerate(
            sorted(doc_gt.items())
        ):
            surface = text[start - 1 : stop]
            # token offsets from char offsets (0-based excl., core.py:156)
            tok_start = next(
                (i for i, cs in enumerate(tok_char_starts) if cs >= start), 0
            )
            n_toks = surface.count(" ") + 1
            out.append(
                (
                    ids.mention_id(doc_id, start, stop),
                    doc_id,
                    mention_idx,
                    surface,
                    surface,
                    "",
                    "",
                    etype,
                    start,
                    stop,
                    tok_start,
                    tok_start + n_toks,
                    lang,
                    doc_type,
                )
            )
        return out
