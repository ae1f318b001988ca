"""Phase-level profiling for the scaling protocol: where does wall time go
at each num_cpus level?

Usage:  RAY_GRAFT_CPUS=4 GRAFT_REPLICATE=48 python tools/profile_scaling.py

Phases (corpus prep/materialization excluded — same as bench's timed window):
  index_build   NameIndexData + kb dict build + ray.put (driver, serial)
  fused_map     the fused ER actor-pool map alone (do_cluster=False), count()
  full          the whole flagship incl. clustering, fresh run
Prints one JSON line with all phase timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("GRAFT_REPLICATE", "48"))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__  # noqa: F401  (registers package by-value)
    from hamerkop_ray.pipelines.flagship import (
        FULL_GEN_CONFIG,
        run_flagship,
    )
    from hamerkop_ray.stages.blocking import NameIndexData
    from hamerkop_ray.synth import SynthDocsFromText, make_kb

    kb = make_kb(400, 42)
    kb_ref0 = ray.put(kb)

    base = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=num_cpus * 2,
    )

    def replicate_rows(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("doc_id")
        parts = []
        for r in range(replicate):
            shifted = pa.compute.add(t["doc_id"], pa.scalar(r * 10_000_000, pa.int64()))
            parts.append(t.set_column(idx, "doc_id", shifted))
        return pa.concat_tables(parts)

    docs = (
        base.map_batches(replicate_rows, batch_format="pyarrow")
        .map_batches(
            SynthDocsFromText,
            fn_constructor_kwargs=dict(kb_ref=kb_ref0),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=(2, max(4, num_cpus // 2)),
        )
        .materialize()
        .repartition(num_cpus * 4)
        .materialize()
    )
    n_docs = docs.count()

    out: dict = {"num_cpus": num_cpus, "n_docs": n_docs}

    t0 = time.perf_counter()
    index = NameIndexData(kb)
    index_ref = ray.put(index)
    kb_dict_ref = ray.put({e["entity_id"]: e for e in kb.to_pylist()})
    out["index_build_sec"] = round(time.perf_counter() - t0, 3)
    del index_ref, kb_dict_ref

    # warmup: small run spins worker processes / imports / duckdb conns
    warm = docs.limit(4000).materialize()
    t0 = time.perf_counter()
    run_flagship(warm, kb, gen_config=FULL_GEN_CONFIG,
                 concurrency=num_cpus, batch_size=512)["mentions"].count()
    out["warmup_sec"] = round(time.perf_counter() - t0, 3)

    # fused map only (no clustering) — isolates the actor-pool map scaling
    for i in (1, 2):
        t0 = time.perf_counter()
        r = run_flagship(docs, kb, gen_config=FULL_GEN_CONFIG,
                         concurrency=num_cpus, batch_size=512, do_cluster=False)
        n = r["mentions"].count()
        sec = time.perf_counter() - t0
        out[f"fused_map_sec_{i}"] = round(sec, 3)
        out[f"fused_map_docs_per_sec_{i}"] = round(n_docs / sec, 1)

    # full pipeline (fresh actors), matches the bench timed window
    for i in (1, 2):
        t0 = time.perf_counter()
        r = run_flagship(docs, kb, gen_config=FULL_GEN_CONFIG,
                         concurrency=num_cpus, batch_size=512)
        n = r["mentions"].count()
        sec = time.perf_counter() - t0
        out[f"full_sec_{i}"] = round(sec, 3)
        out[f"full_docs_per_sec_{i}"] = round(n_docs / sec, 1)
    out["n_mentions"] = n

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
