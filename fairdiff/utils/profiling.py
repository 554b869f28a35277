"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has only
tqdm + wall-clock prints; here: JAX profiler traces + phase timers).

Usage:
    with trace_to("outputs/trace"):         # xplane trace for Perfetto/TB
        state, logs = trainer.train_step(...)

    timers = PhaseTimers()
    with timers("phase1"):
        ...
    print(timers.summary())
"""

from __future__ import annotations

import collections
import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace_to(log_dir: str | Path):
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Wall-clock accumulation per named phase.

    JAX dispatch is async: a block that only launches work times in
    microseconds. To attribute device time to a phase, the timed block
    itself must force a host-visible result (np.asarray of an output,
    jax.block_until_ready, a scalar fetch) — exactly what the trainer's
    phase blocks do at their drain points. On the remote-tunnel backend
    block_until_ready is dispatch-only, so prefer a value fetch.
    """

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }


def tree_fingerprint(tree) -> dict[str, float]:
    """Cheap cross-host/device sanity fingerprint — the TPU analogue of the
    reference's `model_sanity_print` (exp-1:1635-1637): first element and
    global norm of the first leaf plus the tree-wide L2."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return {"first": 0.0, "norm": 0.0}
    first = leaves[0].reshape(-1)[0]
    total = jnp.sqrt(sum((l.astype(jnp.float32) ** 2).sum() for l in leaves))
    return {"first": float(first), "norm": float(total)}
