"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5 item 1 — print
statements only). Here: jax.profiler trace capture, per-phase wall timers
that force device sync (the axon platform's block_until_ready does not
synchronize — timings must pull a scalar to host), and named scopes for
XLA-visible annotations.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import numpy as np
import jax


def sync(tree) -> None:
    """Force completion of all computations in a pytree by pulling one scalar
    of each leaf to host (works on platforms where block_until_ready lies)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "reshape"):
            np.asarray(leaf.reshape(-1)[0], np.float32)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # re-export for layer annotations


class PhaseTimer:
    """Accumulating per-phase wall timers with device sync at boundaries."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result_tree=None):
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            sync(holder.get("out", result_tree))
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return json.dumps(
            {k: {"total_s": round(v, 4), "n": self.counts[k]} for k, v in rows}
        )
