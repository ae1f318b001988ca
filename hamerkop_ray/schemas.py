"""Declared Arrow schemas for every logical table.

The reference (hamerkop) has implicit schemas fixed by constructor signatures
(core.py:149-277) and TSV column positions (io.py:53, io.py:340-386).  Here
every table is a declared pyarrow.Schema so map_batches(batch_format="pyarrow")
stays zero-copy end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# documents — primary pipeline input (BASELINE.json input_hint).
# One row per document; per-row invariant through the whole pipeline: the span
# sequence (kind, text, media_ref, order) is preserved verbatim.
#
# Span encoding:
#   kind='token'   one document token; text = token text, media_ref=''.
#   kind='mention' one tagged mention; text = full surface form (may be
#                  multi-token; its tokens are part of the token stream and
#                  are NOT repeated as token spans); media_ref=''.
#   kind='media'   interleaved opaque media; text='', media_ref=ref.
#                  Contributes no characters / tokens.
#   offset         1-based char start in the implicit document text
#                  (' '-joined tokens), mirroring hamerkop's 1-based inclusive
#                  char offsets (core.py:155).
# ---------------------------------------------------------------------------
SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),  # encodes DocType via _SN_/_WL_/_RF_/_DF_/_NW_
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# ---------------------------------------------------------------------------
# mentions — exploded per-mention table (reference Mention, core.py:149-175).
# Produced by stages.parse; chain_id filled by stages.coref; entity_id by
# stages.scoring; cluster_id by stages.cluster.
# ---------------------------------------------------------------------------
MENTIONS = pa.schema(
    [
        ("mention_id", pa.string()),  # deterministic "M-<doc>-<start>-<stop>"
        ("doc_id", pa.string()),
        ("mention_idx", pa.int32()),  # position among the doc's mentions
        ("surface", pa.string()),  # original_string (core.py:170)
        ("norm", pa.string()),  # post-preprocessing string
        ("translit", pa.string()),  # '' if none (translit_string)
        ("translate", pa.string()),  # '' if none
        ("entity_type", pa.string()),  # PER|ORG|GPE|LOC (or raw NER tag)
        ("char_start", pa.int32()),  # 1-based inclusive
        ("char_stop", pa.int32()),
        ("tok_start", pa.int32()),  # 0-based, exclusive stop
        ("tok_stop", pa.int32()),
        ("lang", pa.string()),  # ISO 639-3
        ("doc_type", pa.string()),
    ]
)

CHAINED_MENTIONS = MENTIONS.append(pa.field("chain_id", pa.string()))

# ---------------------------------------------------------------------------
# chains — one row per within-doc mention chain (reference MentionChain,
# core.py:178-240). Rollups follow the reference: name = longest mention
# string; names = distinct strings; type = first mention's type.
#
# The chain row CONTAINS its mentions as a nested list column so that a chain
# is always complete within its row — chain integrity never depends on Ray
# block boundaries, and downstream blocking/scoring are strictly per-row.
# The wide ``spans`` column of the documents table is never carried here
# (SURVEY.md §7 hard part 6: keep spans out of shuffles).
# ---------------------------------------------------------------------------
CHAIN_MENTION_TYPE = pa.struct(
    [
        ("mention_id", pa.string()),
        ("mention_idx", pa.int32()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("translit", pa.string()),
        ("translate", pa.string()),
        ("entity_type", pa.string()),
        ("char_start", pa.int32()),
        ("char_stop", pa.int32()),
        ("tok_start", pa.int32()),
        ("tok_stop", pa.int32()),
    ]
)

CHAINS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chain_id", pa.string()),
        ("name", pa.string()),  # longest mention string (core.py:192-198)
        ("names", pa.list_(pa.string())),  # distinct mention strings
        ("all_strings", pa.list_(pa.string())),  # names + translit + translate
        ("translit", pa.string()),  # longest translit string or ''
        ("translate", pa.string()),  # longest translate string or ''
        ("entity_type", pa.string()),  # first mention's type (core.py:232-234)
        ("lang", pa.string()),
        ("doc_type", pa.string()),
        ("n_mentions", pa.int32()),
        ("mentions", pa.list_(CHAIN_MENTION_TYPE)),
    ]
)

# ---------------------------------------------------------------------------
# kb — knowledge-base entities (reference Entity, core.py:122-146; 47-col
# LoReHLT entities.tab of which these are the consumed columns, io.py:388-403).
# ---------------------------------------------------------------------------
KB = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("name", pa.string()),  # canonical
        ("names", pa.list_(pa.string())),  # canonical + alternates
        ("origin", pa.string()),
        ("urls", pa.list_(pa.string())),
        ("country", pa.string()),  # GeoContext.country / Org/Per location
        ("latitude", pa.float64()),
        ("longitude", pa.float64()),
        ("population", pa.int64()),
    ]
)

# candidates — blocking output at chain granularity: the chain row plus its
# ordered candidate list (reference chain.candidates, candidates.py:83-89).
# Keeping candidates nested preserves per-row locality for the scoring stage
# (no shuffle between blocking and scoring).
CANDIDATE_TYPE = pa.struct(
    [
        ("entity_id", pa.string()),
        ("rank", pa.int32()),
        ("source", pa.string()),
    ]
)

CANDIDATES = CHAINS.append(pa.field("candidates", pa.list_(CANDIDATE_TYPE)))

# candidate pairs — exploded form: one row per (chain, candidate entity).
PAIRS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chain_id", pa.string()),
        ("entity_id", pa.string()),
        ("rank", pa.int32()),  # candidate order (generator priority, score)
        ("source", pa.string()),  # which generator produced it
    ]
)

# resolved — scoring output: one row per chain.
RESOLVED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chain_id", pa.string()),
        ("entity_id", pa.string()),  # '' == NIL
        ("score", pa.float64()),
        ("method", pa.string()),  # resolver that decided
    ]
)

# clusters — transitive-clustering output: one row per chain.
CLUSTERS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chain_id", pa.string()),
        ("entity_id", pa.string()),
        ("cluster_id", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# ground truth / submission — 8-col LoReHLT tab (io.py:257-266).
# ---------------------------------------------------------------------------
LINKS = pa.schema(
    [
        ("system_run_id", pa.string()),
        ("mention_id", pa.string()),
        ("mention_text", pa.string()),
        ("doc_id", pa.string()),
        ("char_start", pa.int32()),
        ("char_stop", pa.int32()),
        ("kb_id", pa.string()),  # '|'-joined ids, or NIL cluster id
        ("entity_type", pa.string()),
        ("mention_type", pa.string()),
        ("confidence", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
