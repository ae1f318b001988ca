"""Checkpoint/resume: kill-at-stage-boundary and config-invalidation tests."""

import json
import os
import shutil

import pytest

import ray.data as rd


@pytest.fixture()
def world_small():
    from hamerkop_ray.synth import synth_world

    return synth_world(n_docs=40, n_entities=60, seed=9)


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_run_and_resume(world_small, tmp_path):
    from hamerkop_ray.state.checkpoint import run_flagship_checkpointed

    docs, kb, links = world_small
    run_dir = str(tmp_path / "run1")

    out1 = run_flagship_checkpointed(rd.from_arrow(docs), kb, run_dir)
    rows1 = sorted(
        (r["mention_id"], r["entity_id"], r["cluster_id"])
        for b in out1["mentions"].iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    assert all(not s["skipped"] for s in out1["run"]["stages"])
    assert os.path.exists(os.path.join(run_dir, "stage1_chains.manifest.json"))

    # simulate a crash after stage 2: delete later stage outputs + manifests
    for stage in ["stage3_resolved", "stage4_mentions"]:
        shutil.rmtree(os.path.join(run_dir, stage), ignore_errors=True)
        mp = os.path.join(run_dir, f"{stage}.manifest.json")
        if os.path.exists(mp):
            os.remove(mp)

    out2 = run_flagship_checkpointed(rd.from_arrow(docs), kb, run_dir)
    skipped = {s["name"]: s["skipped"] for s in out2["run"]["stages"]}
    assert skipped["stage1_chains"] and skipped["stage2_candidates"]
    assert not skipped["stage3_resolved"] and not skipped["stage4_mentions"]

    rows2 = sorted(
        (r["mention_id"], r["entity_id"], r["cluster_id"])
        for b in out2["mentions"].iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    assert rows1 == rows2  # resume produces identical output


@pytest.mark.usefixtures("ray_session")
def test_config_change_invalidates_stage(world_small, tmp_path):
    from hamerkop_ray.state.checkpoint import run_flagship_checkpointed

    docs, kb, links = world_small
    run_dir = str(tmp_path / "run2")
    run_flagship_checkpointed(rd.from_arrow(docs), kb, run_dir)

    out = run_flagship_checkpointed(
        rd.from_arrow(docs), kb, run_dir, gen_config=[("exact", "name")]
    )
    skipped = {s["name"]: s["skipped"] for s in out["run"]["stages"]}
    assert skipped["stage1_chains"]  # unchanged config → reused
    assert not skipped["stage2_candidates"]  # gen config changed → recomputed
    # fingerprint chain: downstream stages recomputed too
    assert not skipped["stage3_resolved"]


@pytest.mark.usefixtures("ray_session")
def test_manifest_lineage_fields(world_small, tmp_path):
    from hamerkop_ray.state.checkpoint import run_flagship_checkpointed

    docs, kb, links = world_small
    run_dir = str(tmp_path / "run3")
    run_flagship_checkpointed(rd.from_arrow(docs), kb, run_dir, input_fingerprint="fp0")
    with open(os.path.join(run_dir, "stage1_chains.manifest.json")) as f:
        m1 = json.load(f)
    with open(os.path.join(run_dir, "stage2_candidates.manifest.json")) as f:
        m2 = json.load(f)
    assert m1["input_fingerprint"] == "fp0"
    assert m2["input_fingerprint"] == m1["fingerprint"]  # lineage chain
    assert m1["rows"] > 0 and m1["seconds"] >= 0 and m1["files"]


@pytest.mark.usefixtures("ray_session")
def test_stage_partitioned_output_and_skip(tmp_path):
    import os

    import ray.data as rd

    from hamerkop_ray.state.checkpoint import CheckpointedRun

    run_dir = str(tmp_path / "run")
    items = [{"lang": "en", "v": 1}, {"lang": "fr", "v": 2},
             {"lang": "en", "v": 3}]

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return rd.from_items(items)

    cm = CheckpointedRun(run_dir)
    out = cm.stage("part", build, config={"x": 1},
                   partition_cols=["lang"])
    assert sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow")) == 3
    sd = os.path.join(run_dir, "part")
    subdirs = {d for d in os.listdir(sd) if os.path.isdir(os.path.join(sd, d))}
    assert {"lang=en", "lang=fr"} <= subdirs
    # resume: identical config + input -> stage skipped, same rows
    cm2 = CheckpointedRun(run_dir)
    out2 = cm2.stage("part", build, config={"x": 1},
                     partition_cols=["lang"])
    assert calls["n"] == 1
    assert sum(b.num_rows for b in out2.iter_batches(batch_format="pyarrow")) == 3
