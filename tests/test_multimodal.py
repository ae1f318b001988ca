"""Media stage plumbing: ref extraction, fake decode determinism, stub gate."""

import pytest

from hamerkop_ray.stages.multimodal import (
    DecodeMedia,
    MEDIA_FEATURES,
    extract_media_refs,
    media_features,
)


def test_decode_stub_gate():
    with pytest.raises(NotImplementedError):
        DecodeMedia(codec="pillow")


def test_fake_decode_deterministic():
    import pyarrow as pa

    t = pa.table({"doc_id": ["d1", "d2"], "media_ref": ["media://1/0", "media://2/0"]})
    dec = DecodeMedia()
    a = dec(t).to_pylist()
    b = DecodeMedia()(t).to_pylist()
    assert a == b
    assert a[0]["feature"] != a[1]["feature"]
    assert len(a[0]["feature"]) == 16
    assert dec(t).schema.equals(MEDIA_FEATURES)


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_over_synth_world(small_world):
    import ray.data as rd

    docs, kb, links = small_world
    n_media = sum(
        1 for r in docs.to_pylist() for s in r["spans"] if s["kind"] == "media"
    )
    ds = rd.from_arrow(docs)
    refs = extract_media_refs(ds)
    assert refs.count() == n_media
    if n_media:
        feats = media_features(ds).take_all()
        assert len(feats) == n_media
        assert all(len(f["feature"]) == 16 for f in feats)
