"""Run-level metrics: a named counter actor every stage can increment.

The reference aggregates per-stage counters in-process (Reporter objects,
preprocessor.py report() methods); in a distributed run the counters live in
ONE named Ray actor so that map_batches workers on any node can increment
them and the driver can snapshot them into run reports / checkpoint
manifests.  Increments are fire-and-forget (remote call, result ignored) so
the hot path never blocks on the actor; a final ray.get in get_counters()
barriers on the actor's mailbox, so every increment issued before the
snapshot is included.

All helpers degrade to no-ops when Ray is not initialised or the actor was
never started — metrics are observability, never a correctness dependency.

Scoping & semantics (ADVICE r2): the actor name embeds the Ray JOB id, which
driver and workers compute locally — so two runs sharing one cluster get two
actors and never pollute each other's counters, and the actor (no longer
detached) dies with its driver instead of leaking.  Counting is
AT-LEAST-ONCE: fire-and-forget increments from a retried map task are
re-issued, so counters are diagnostics (orders of magnitude, drop detection),
not exact accounting.
"""

from __future__ import annotations

_NAMESPACE = "hamerkop_metrics"


def _actor_name() -> str:
    """Job-scoped actor name, computable without coordination on both the
    driver and every worker of the same run."""
    try:
        import ray

        return f"counters-{ray.get_runtime_context().get_job_id()}"
    except Exception:
        return "counters"

# per-process cache of the actor handle (ray.get_actor is a GCS lookup)
_handle = None
_handle_missing = False


def _actor(create: bool = False):
    global _handle, _handle_missing
    if _handle is not None:
        return _handle
    if _handle_missing and not create:
        return None
    try:
        import ray

        if not ray.is_initialized():
            return None

        @ray.remote(num_cpus=0)
        class _Counters:
            def __init__(self):
                self.c: dict[str, int] = {}

            def incr(self, name: str, n: int = 1) -> None:
                self.c[name] = self.c.get(name, 0) + n

            def snapshot(self) -> dict[str, int]:
                return dict(self.c)

            def reset(self) -> None:
                self.c = {}

        if create:
            # NOT detached: a job-scoped metrics actor should die with its
            # driver (the detached round-2 actor leaked across runs)
            _handle = _Counters.options(
                name=_actor_name(),
                namespace=_NAMESPACE,
                get_if_exists=True,
            ).remote()
        else:
            _handle = ray.get_actor(_actor_name(), namespace=_NAMESPACE)
        _handle_missing = False
        return _handle
    except Exception:
        _handle_missing = True
        return None


def start_metrics():
    """Create (or attach to) the run's counter actor.  Call once on the
    driver before stages that emit counters; workers then find it by name."""
    return _actor(create=True)


def incr(name: str, n: int = 1) -> None:
    """Fire-and-forget counter increment; no-op without a running actor.
    Call ONLY for exceptional events (truncations, drops) — not per row."""
    if n == 0:
        return
    a = _actor()
    if a is not None:
        try:
            a.incr.remote(name, int(n))
        except Exception:
            pass


def get_counters() -> dict[str, int]:
    """Snapshot all counters (barriers on in-flight increments)."""
    a = _actor()
    if a is None:
        return {}
    try:
        import ray

        return ray.get(a.snapshot.remote())
    except Exception:
        return {}


def reset_counters() -> None:
    a = _actor()
    if a is not None:
        try:
            import ray

            ray.get(a.reset.remote())
        except Exception:
            pass


def stop_metrics() -> None:
    """Kill the named actor (detached actors outlive the driver otherwise)."""
    global _handle, _handle_missing
    a = _actor()
    if a is not None:
        try:
            import ray

            ray.kill(a)
        except Exception:
            pass
    _handle = None
    _handle_missing = True
