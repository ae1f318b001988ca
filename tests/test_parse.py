"""Parse stage: spans → mentions (reference DocumentPreparer, io.py:96-164)."""

import pyarrow as pa

from hamerkop_ray.schemas import DOCUMENTS, MENTIONS
from hamerkop_ray.stages.parse import ParseDocuments, detect_doc_type, doc_text_and_tokens


def make_doc(doc_id, spans):
    return pa.Table.from_pylist(
        [{"doc_id": doc_id,
          "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans]}],
        schema=DOCUMENTS,
    )


def test_doc_type_detection():
    assert detect_doc_type("SYN_SN_00000001") == "twitter"
    assert detect_doc_type("SYN_WL_00000001") == "blog"
    assert detect_doc_type("SYN_NW_00000001") == "newswire"
    assert detect_doc_type("SYN_RF_x") == "reference"
    assert detect_doc_type("SYN_DF_x") == "discussion forum"
    assert detect_doc_type("nothing") == "unknown"


def test_parse_single_mention():
    # text: "hello Henry Smith world" ; mention at chars 7..17
    doc = make_doc(
        "D_NW_1",
        [
            ("token", "hello", "", 1),
            ("mention/PER", "Henry Smith", "", 7),
            ("token", "world", "", 19),
        ],
    )
    out = ParseDocuments()(doc)
    assert out.schema.equals(MENTIONS)
    row = out.to_pylist()[0]
    assert row["surface"] == "Henry Smith"
    assert row["entity_type"] == "PER"
    assert (row["char_start"], row["char_stop"]) == (7, 17)
    assert (row["tok_start"], row["tok_stop"]) == (1, 3)  # 0-based, exclusive
    assert row["mention_id"] == "M-D_NW_1-7-17"
    assert row["doc_type"] == "newswire"


def test_parse_media_identity_only():
    doc = make_doc(
        "D_WL_2",
        [
            ("token", "a", "", 1),
            ("media", "", "media://2/0", 3),
            ("mention/ORG", "Acme Corp", "", 3),
        ],
    )
    out = ParseDocuments()(doc)
    row = out.to_pylist()[0]
    # media span contributed no tokens/chars
    assert (row["tok_start"], row["tok_stop"]) == (1, 3)
    assert row["char_start"] == 3


def test_parse_empty_and_no_mentions():
    doc = make_doc("D_NW_3", [("token", "just", "", 1), ("token", "text", "", 6)])
    out = ParseDocuments()(doc)
    assert out.num_rows == 0
    assert out.schema.equals(MENTIONS)


def test_doc_text_reconstruction():
    kinds = ["token", "mention/PER", "token"]
    texts = ["hello", "Henry Smith", "world"]
    text, tokens = doc_text_and_tokens(kinds, texts)
    assert text == "hello Henry Smith world"
    assert tokens == ["hello", "Henry", "Smith", "world"]


def test_synth_world_offsets_consistent(small_world):
    """Every synthesized mention's offset must equal its position in the
    reconstructed document text (the invariant parse relies on)."""
    docs, kb, links = small_world
    parsed = ParseDocuments()(docs)
    by_doc = {}
    for row in docs.to_pylist():
        kinds = [s["kind"] for s in row["spans"]]
        texts = [s["text"] for s in row["spans"]]
        by_doc[row["doc_id"]], _ = doc_text_and_tokens(kinds, texts)
    for m in parsed.to_pylist():
        text = by_doc[m["doc_id"]]
        assert text[m["char_start"] - 1 : m["char_stop"]] == m["surface"]


def test_synth_links_align_with_parse(small_world):
    docs, kb, links = small_world
    parsed = ParseDocuments()(docs)
    assert set(parsed.column("mention_id").to_pylist()) == set(
        links.column("mention_id").to_pylist()
    )
