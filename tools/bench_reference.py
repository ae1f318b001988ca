"""Measure the reference engine's single-thread throughput on the identical
corpus the flagship bench uses (sf-derived span docs + synthetic KB).

This produces the BASELINE.md 'reference docs/sec' number that the Ray
engine must match or beat at the same data scale.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join("/root/repo", "tests"))


def main():
    import pyarrow.parquet as pq

    from hamerkop_ray.synth import SynthDocsFromText, make_kb
    from hamerkop_ray.sources.conll import to_conll_text
    from reference_shim import import_reference
    from test_differential_e2e import build_reference_kb, run_reference_pipeline

    hk = import_reference()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    kb = make_kb(400, 42)

    t0 = time.perf_counter()
    docs = SynthDocsFromText(kb)(base)
    synth_sec = time.perf_counter() - t0

    conll = to_conll_text(docs)
    n_docs = docs.num_rows

    t0 = time.perf_counter()
    ref_kb = build_reference_kb(kb)
    assignment, surfaces, types = run_reference_pipeline(conll, ref_kb)
    ref_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf": sf_dir,
                "n_docs": n_docs,
                "n_mentions": len(assignment),
                "reference_pipeline_sec": round(ref_sec, 3),
                "reference_docs_per_sec": round(n_docs / ref_sec, 2),
                "synth_sec": round(synth_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
