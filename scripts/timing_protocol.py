"""The repo's canonical RTT-cancelling measurement primitive (one copy).

This chip sits behind a tunnel with ~30 ms host-sync RTT and an unreliable
``block_until_ready`` (CLAUDE.md "Timing on this TPU"); honest per-call
timing therefore dispatches ``reps`` calls asynchronously and forces ONE
host fetch at the end, and per-call cost is taken as a **pipeline slope**
``(T(reps_hi) - T(reps_lo)) / (reps_hi - reps_lo)`` so the single RTT and
dispatch ramp cancel (validated against ``jax.profiler`` device time —
docs/PROFILE.md section 1).  Import this from measurement scripts instead of
re-deriving it; drift between copies makes recorded results mutually
inconsistent.
"""

from __future__ import annotations

import time

import numpy as np


def pipeline_ms(fn, args_fn, reps: int, trials: int = 3) -> float:
    """Wall ms for ``reps`` asynchronously-dispatched calls + one final fetch
    (best of ``trials`` — guards against ambient contention on the shared
    chip).  ``args_fn(i)`` must return fresh args per call so nothing caches.
    """
    import jax

    best = np.inf
    for trial in range(trials):
        t0 = time.perf_counter()
        out = None
        for r in range(reps):
            out = fn(*args_fn(trial * 1000 + r))
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def pipeline_slope_ms(fn, args_fn, reps_lo: int = 4, reps_hi: int = 12,
                      trials: int = 3) -> float:
    """Per-call ms by pipeline slope — the production protocol."""
    lo = pipeline_ms(fn, args_fn, reps_lo, trials)
    hi = pipeline_ms(fn, args_fn, reps_hi, trials)
    return (hi - lo) / (reps_hi - reps_lo)


def measure_select(select, state, *, reps_lo: int = 4, reps_hi: int = 12,
                   trials: int = 3) -> tuple[float, float]:
    """(first_call_s, slope_ms) for a jitted ``(state, key) -> batch`` fn.

    The one measurement shape every selection-timing study uses: first call
    timed alone (compile / cache load / transfer, reported separately per the
    PROFILE.md section 6 rule), then the per-call pipeline slope on fresh
    fold_in keys.  Studies must call THIS rather than re-deriving the
    first/slope split (code-review round 4: three drifting copies).
    """
    import jax

    t0 = time.perf_counter()
    out = select(state, jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    first_s = time.perf_counter() - t0
    key0 = jax.random.PRNGKey(1)
    slope = pipeline_slope_ms(
        select, lambda r: (state, jax.random.fold_in(key0, r)),
        reps_lo, reps_hi, trials,
    )
    return first_s, slope
