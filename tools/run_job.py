"""Cluster job entry point for the flagship ER pipeline (north_rule: "run
via ray job submit on a fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- \
        python tools/run_job.py \
            --input  /data/documents.lance      # Lance table (parquet fallback)
            --kb     /data/kb.parquet           # KB table or parquet dir
            --output /data/out/mentions         # partitioned parquet
            --run-dir /data/ckpt/run1           # optional: per-stage checkpoints

Behavior:
  * connects to the running cluster (the job supervisor sets RAY_ADDRESS;
    falls back to a local session for smoke runs — guarded, never re-inits);
  * reads the interleaved documents table via sources.lance_io (real Lance
    when the wheel is present, parquet fallback otherwise — same schema);
  * runs run_flagship: broadcast actor-pool path for small KBs, the
    partitioned shuffle-join path automatically above KB_BROADCAST_LIMIT_BYTES
    (or --partitioned always);
  * with --run-dir, every stage boundary checkpoints to parquet with config
    + input fingerprints (kill/re-run resumes; state/checkpoint.py);
  * writes the per-mention output as PARTITIONED parquet (one file per
    block — a failed run's completed partitions are skippable) and prints
    ONE JSON metrics line (rows, wall seconds, docs/sec, per-stage counters
    when checkpointed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="documents table: .lance dir or parquet file/dir")
    ap.add_argument("--kb", required=True, help="KB parquet file or dir")
    ap.add_argument("--output", required=True,
                    help="output dir for partitioned mention parquet")
    ap.add_argument("--run-dir", default=None,
                    help="checkpoint dir (enables per-stage resume)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--full-blocking", action="store_true",
                    help="composite blocking stack (exact+translit+ngram+"
                         "metaphone+LSH) instead of the default")
    ap.add_argument("--partitioned", choices=["auto", "always", "never"],
                    default="auto",
                    help="KB distribution strategy (auto = by KB size)")
    ap.add_argument("--concurrency", type=int, default=0,
                    help="actor-pool max size (0 = cluster CPUs)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # job supervisor sets RAY_ADDRESS; "auto" attaches to the cluster.
        # With no cluster running "auto" raises ConnectionError — fall back
        # to a local session so smoke runs work out of the box (ADVICE r4).
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     ignore_reinit_error=True)

    import pyarrow.parquet as pq

    from hamerkop_ray.pipelines.flagship import (
        DEFAULT_GEN_CONFIG,
        FULL_GEN_CONFIG,
        run_flagship,
    )
    from hamerkop_ray.sources.lance_io import read_documents
    from hamerkop_ray.state.checkpoint import run_flagship_checkpointed

    t0 = time.time()
    docs = read_documents(args.input)
    kb = pq.read_table(args.kb)

    gen_config = FULL_GEN_CONFIG if args.full_blocking else DEFAULT_GEN_CONFIG
    ncpu = args.concurrency or int(ray.cluster_resources().get("CPU", 8))

    report = None
    if args.run_dir:
        out = run_flagship_checkpointed(
            docs, kb, args.run_dir,
            gen_config=gen_config,
            concurrency=(1, ncpu),
            batch_size=args.batch_size,
            input_fingerprint=args.input,
        )
        mentions = out["mentions"]
        report = out["run"]
    else:
        partitioned = {"auto": None, "always": True, "never": False}[
            args.partitioned]
        mentions = run_flagship(
            docs, kb,
            gen_config=gen_config,
            concurrency=(1, ncpu),
            batch_size=args.batch_size,
            partitioned=partitioned,
        )["mentions"]

    # snapshot pre-existing parquet so a reused output dir doesn't inflate
    # the reported row count (ADVICE r4) — only files THIS run wrote count
    def _parquet_files(root_dir):
        out = set()
        for root, _dirs, files in os.walk(root_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    out.add(os.path.join(root, fn))
        return out

    pre_existing = _parquet_files(args.output) if os.path.isdir(args.output) else set()
    if pre_existing:
        print(f"warning: output dir {args.output} already holds "
              f"{len(pre_existing)} parquet file(s); counting only files "
              "written by this run", file=sys.stderr)
    mentions.write_parquet(args.output)
    # count from the written output (cheap metadata reads, no recompute)
    total = 0
    for path in sorted(_parquet_files(args.output) - pre_existing):
        total += pq.read_metadata(path).num_rows
    wall = time.time() - t0
    n_docs = None
    try:
        n_docs = docs.count()
    except Exception:
        pass
    print(json.dumps({
        "metric": "er_job",
        "mention_rows": total,
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1) if n_docs else None,
        "output": args.output,
        "checkpoint_report": report,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
