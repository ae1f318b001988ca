"""Smoke the ray-job entry point (tools/run_job.py) end-to-end in a
subprocess — the north_rule's `ray job submit` path."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_job_direct(tmp_path):
    from hamerkop_ray.synth import synth_world

    docs, kb, _ = synth_world(n_docs=20, n_entities=40, seed=9)
    docs_p = str(tmp_path / "docs.parquet")
    kb_p = str(tmp_path / "kb.parquet")
    out_p = str(tmp_path / "out")
    pq.write_table(docs, docs_p)
    pq.write_table(kb, kb_p)

    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"  # the job supervisor would set the cluster
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_job.py"),
         "--input", docs_p, "--kb", kb_p, "--output", out_p],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["metric"] == "er_job"
    assert rep["mention_rows"] > 0
    assert rep["n_docs"] == 20
    # partitioned parquet actually landed
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(out_p) for f in fs if f.endswith(".parquet")
    ]
    assert files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == rep["mention_rows"]
