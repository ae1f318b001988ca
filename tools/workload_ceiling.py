"""Workload-specific hardware-contention control (no Ray): run the ACTUAL
fused ER batch function (FusedERStage.__call__) over identical pre-built
batches in N side-by-side processes and compare per-process wall time.

If per-process time at 16 procs ≈ at 4 procs, the box scales this workload
and any Ray-pipeline inefficiency is engine overhead; if per-process time
inflates, that inflation is same-box contention (memory bandwidth /
allocator) that distinct cluster nodes do not share — the honest ceiling to
correct the measured pipeline efficiency by (BASELINE.md caveat #1).

Usage: python tools/workload_ceiling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BATCH_PATH = "/tmp/workload_ceiling_batches.parquet"


def _prepare(n_docs: int = 4096) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hamerkop_ray.synth import SynthDocsFromText, make_kb

    base = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, n_docs)
    kb = make_kb(400, 42)
    docs = SynthDocsFromText(kb_ref=kb)(base)
    pq.write_table(docs, _BATCH_PATH)


def _work(args) -> float:
    """One worker: build the index state (as an actor __init__ would), then
    run the fused stage over the shared batches `reps` times."""
    reps, batch_size = args
    import pyarrow.parquet as pq

    from hamerkop_ray.pipelines.flagship import FULL_GEN_CONFIG, FusedERStage
    from hamerkop_ray.synth import make_kb

    kb = make_kb(400, 42)
    stage = FusedERStage(
        index=__import__(
            "hamerkop_ray.stages.blocking", fromlist=["NameIndexData"]
        ).NameIndexData(kb),
        kb={e["entity_id"]: e for e in kb.to_pylist()},
        gen_config=FULL_GEN_CONFIG,
    )
    docs = pq.read_table(_BATCH_PATH)
    batches = [
        docs.slice(i, batch_size) for i in range(0, docs.num_rows, batch_size)
    ]
    t0 = time.perf_counter()
    for _ in range(reps):
        for b in batches:
            stage(b)
    return time.perf_counter() - t0


def measure(n_procs: int, reps: int = 8, batch_size: int = 512) -> float:
    with mp.Pool(n_procs) as pool:
        times = pool.map(_work, [(reps, batch_size)] * n_procs)
    return sum(times) / len(times)


def main() -> None:
    mp.set_start_method("spawn", force=True)
    _prepare()
    out = {}
    for n in (2, 4, 8, 16):
        out[f"per_proc_sec_{n}"] = round(measure(n), 3)
    out["hw_ceiling_4_to_16"] = round(
        out["per_proc_sec_4"] / out["per_proc_sec_16"], 4
    )
    out["hw_ceiling_2_to_8"] = round(
        out["per_proc_sec_2"] / out["per_proc_sec_8"], 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
