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


def test_frame_sample_uniform_and_stride():
    import pyarrow as pa

    from hamerkop_ray.stages.multimodal import (
        FRAME_FEATURES,
        FrameSampleMedia,
        _fake_video_meta,
    )

    t = pa.table({"doc_id": ["d1"], "media_ref": ["media://9/0"]})
    total, fps = _fake_video_meta("media://9/0")

    uni = FrameSampleMedia(strategy="uniform", n_frames=4)(t)
    assert uni.schema.equals(FRAME_FEATURES)
    rows = uni.to_pylist()
    assert len(rows) == min(4, total)
    idxs = [r["frame_idx"] for r in rows]
    assert idxs[0] == 0 and idxs[-1] == total - 1  # endpoints included
    assert idxs == sorted(idxs)
    # pts tracks frame index at the fake fps
    assert rows[-1]["pts_ms"] == int((total - 1) / fps * 1000)
    # deterministic across instances
    assert FrameSampleMedia(strategy="uniform", n_frames=4)(t).to_pylist() == rows

    st = FrameSampleMedia(strategy="stride", stride=25)(t).to_pylist()
    assert [r["frame_idx"] for r in st] == list(range(0, total, 25))
    # different frames get different features
    assert rows[0]["feature"] != rows[-1]["feature"]


def test_frame_sample_codec_gate():
    import pytest as _pytest

    from hamerkop_ray.stages.multimodal import FrameSampleMedia

    with _pytest.raises(NotImplementedError):
        FrameSampleMedia(codec="pyav")
    with _pytest.raises(ValueError):
        FrameSampleMedia(strategy="random")


@pytest.mark.usefixtures("ray_session")
def test_video_frame_pipeline_over_synth_world(small_world):
    import ray.data as rd

    from hamerkop_ray.stages.multimodal import video_frame_features

    docs, kb, links = small_world
    n_media = sum(
        1 for r in docs.to_pylist() for s in r["spans"] if s["kind"] == "media"
    )
    if not n_media:
        pytest.skip("no media spans in this world")
    ds = rd.from_arrow(docs)
    feats = video_frame_features(ds, n_frames=3).take_all()
    per_ref: dict[str, int] = {}
    for f in feats:
        per_ref[f["media_ref"]] = per_ref.get(f["media_ref"], 0) + 1
    assert len(per_ref) == n_media
    assert all(1 <= c <= 3 for c in per_ref.values())
