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


def _final_fetch(out) -> None:
    """Await the dispatched pipeline by fetching ONE SCALAR of the last call.

    The fetch must be tiny: every jit output is fully materialized on device
    regardless of what the host reads (no dead-code risk — DCE is decided by
    what the jitted fn RETURNS, not by what the host fetches), but fetching a
    large leaf ships it through the ~30 ms tunnel, and that transfer's
    variance swamps sub-ms slopes.  Measured failure mode: the first
    round_term_split run fetched ``tree_leaves(out)[0]`` — the full corpus
    ``x`` for state-returning terms (51 MB at 25k, 2 GB at 1M) — and produced
    NEGATIVE slopes and an 18.5 ms "update" against a 1.66 ms full round.
    Device-stream ordering makes the scalar gather await all prior work.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)


def pipeline_ms(fn, args_fn, reps: int, trials: int = 3) -> float:
    """Wall ms for ``reps`` asynchronously-dispatched calls + one final
    scalar fetch (best of ``trials`` — guards against ambient contention on
    the shared chip).  ``args_fn(i)`` must return fresh args per call so
    nothing caches.
    """
    best = np.inf
    for trial in range(trials):
        t0 = time.perf_counter()
        out = None
        for r in range(reps):
            out = fn(*args_fn(trial * 1000 + r))
        _final_fetch(out)
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
    _final_fetch(out)
    first_s = time.perf_counter() - t0
    key0 = jax.random.PRNGKey(1)
    slope = pipeline_slope_ms(
        select, lambda r: (state, jax.random.fold_in(key0, r)),
        reps_lo, reps_hi, trials,
    )
    return first_s, slope
