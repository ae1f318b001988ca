"""Hardware-contention control: how much does ONE process slow down when
N copies of a Ray-free, pure-python workload run side by side?

This bounds the achievable same-box scaling efficiency: distinct cluster
NODES each bring their own memory buses/allocators, so this term vanishes on
a real cluster — it is measured here to separate engine scaling from
hardware contention (BASELINE.md caveat #1).

Usage: python tools/hw_ceiling.py            # measures 1, 4, 16 procs
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _work(n_iter: int) -> float:
    """Dict/string-heavy kernel shaped like the fused ER stage's python work."""
    t0 = time.perf_counter()
    d: dict[str, int] = {}
    for i in range(n_iter):
        k = f"key-{i % 10007}-{i % 613}"
        d[k] = d.get(k, 0) + i
        if i % 97 == 0:
            _ = sorted(k)
    return time.perf_counter() - t0


def measure(n_procs: int, n_iter: int = 3_000_000) -> float:
    """Mean per-process wall time with n_procs concurrent workers."""
    with mp.Pool(n_procs) as pool:
        times = pool.map(_work, [n_iter] * n_procs)
    return sum(times) / len(times)


def main() -> None:
    mp.set_start_method("spawn", force=True)
    out = {}
    for n in (1, 4, 16):
        out[f"per_proc_sec_{n}"] = round(measure(n), 3)
    base = out["per_proc_sec_4"]
    out["slowdown_16_vs_4"] = round(out["per_proc_sec_16"] / base, 4)
    # ceiling on measured 4→16 efficiency from hardware alone
    out["hw_ceiling_4_to_16"] = round(base / out["per_proc_sec_16"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
