"""Lightweight host-side phase accounting for the mission runner.

The reference keeps per-stage wall-clock accounting inside the node
(sloamNode.cpp:845-897, inputNode.cpp:232-317). Here one process drives all
robots, so phases are accumulated in a process-global table that the bench
publishes as `mission_phase_ms` — the breakdown VERDICT r2 ask #1 requires.

Usage:
    from .profiling import phase, phase_report, phase_reset
    with phase("replay_pack"):
        ...
Overhead is two perf_counter calls per enter/exit — negligible next to the
device dispatches being measured.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

_ACC: Dict[str, float] = defaultdict(float)
_CNT: Dict[str, int] = defaultdict(int)

# When set, maybe_block() synchronizes inside phases so host wall time is
# attributed to the phase that *enqueued* the device work instead of the
# next unlucky blocking fetch. Diagnostic only — it defeats pipelining.
SYNC = bool(int(os.environ.get("SLIDE_SLAM_PROFILE_SYNC", "0")))


def maybe_block(x):
    """Block on a jax array (or pytree) when SYNC profiling is on."""
    if SYNC:
        import jax
        jax.block_until_ready(x)
    return x


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _ACC[name] += time.perf_counter() - t0
        _CNT[name] += 1


def phase_add(name: str, seconds: float):
    _ACC[name] += seconds
    _CNT[name] += 1


def phase_reset():
    _ACC.clear()
    _CNT.clear()


def phase_report() -> Dict[str, float]:
    """Total milliseconds per phase (sorted descending)."""
    return {k: round(v * 1000.0, 1)
            for k, v in sorted(_ACC.items(), key=lambda kv: -kv[1])}


def phase_counts() -> Dict[str, int]:
    return dict(_CNT)
