#!/usr/bin/env python
"""Per-term device-cost split of the production interactive round (SOL anchor).

docs/ARCHITECTURE.md's speed-of-light accounting needs MEASURED per-term
costs, not just full-round totals: the recorded full interactive round
(results/scale1m.json ``full_round_ms``, results/scale100k_profile.json
``sharded_round_ms``) bundles selection + user simulation + gp_update + the
AP evaluation — and AP is a device argsort over the WHOLE corpus, an
EVALUATION cost the reference's experimental protocol shares but a
production serving round never pays.  This script measures each term alone
with the pipeline-slope protocol (scripts/timing_protocol.py), plus the full
round and the round WITHOUT the AP eval, so the floor-vs-measured table in
ARCHITECTURE.md attributes the round to terms instead of guessing.

Terms (each one jitted program; selection uses the production config of
record — ``bench.select_kwargs()`` + ``configs/mirflickr_production.ini``'s
pool_size=4096):

  update       gp_update of a b=4 feedback block   (HBM-bandwidth floor:
               streams x (N x D) for the cross-kernel row block and v
               (cap x N) for the whitened extension)
  rank         lax.top_k(mu, 4096)                 (pool formation)
  ap           average_precision(mu, ...)          (eval-only corpus argsort)
  select       select_ital, production config      (VPU QMC floor)
  round_full   select -> feedback -> update -> ap  (the recorded round shape)
  round_serve  the same minus ap                   (the serving analog)

Scales: MIRFLICKR 25k (bench workload of record, via bench.build_state) and
1M x 512 (``--skip-1m`` to omit; first call at 1M pays the ~2 GB corpus
transfer + remote compile).  Writes results/round_term_split.json, partial
after each scale so a dropped tunnel keeps what finished.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (workload of record: state, params, select config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "round_term_split.json")
POOL = 4096


def _write(report: dict, out: str = OUT) -> None:
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"   wrote {out}", flush=True)


def _measure(label: str, fn, state) -> dict:
    """(first_call_s, slope_ms) for a jitted ``(state, key) -> out`` term.

    Uses measure_select (the canonical first/slope split).  The protocol's
    final fetch is ONE SCALAR of the last output — essential here: terms
    returning the updated state (update, round_serve, round_full) would
    otherwise ship the full corpus through the tunnel per trial (51 MB at
    25k, 2 GB at 1M), and that transfer's variance produced the negative
    slopes of the first (discarded) run of this study.
    """
    from scripts.timing_protocol import measure_select

    first_s, slope = measure_select(fn, state)
    rec = {"first_call_s": round(first_s, 2), "slope_ms": round(slope, 3)}
    print(f"   {label}: {rec['slope_ms']} ms (first {first_s:.2f}s)",
          flush=True)
    return rec


def _measure_chain(label: str, make_fn, state, *, donate: bool,
                   reps_lo: int = 4, reps_hi: int = 12, trials: int = 3) -> dict:
    """Pipeline slope of a CHAINED ``st = fn(st, key)`` update loop.

    ``measure_select`` re-passes the same input state every rep, which is the
    right shape for selection (a pure function of the round's state) but NOT
    for the serving update loop, where each update consumes the previous
    state — and where buffer donation (session.py round 5) lets XLA extend
    the (cap, N) whitened buffer in place instead of copying it.  Donation is
    only legal when each input is used once, so this protocol chains the
    carry like the real loop does, restarting from a fresh on-device COPY of
    ``state`` per trial (the copy is forced resident before t0).  The
    donate=False variant is the same chain without donation — the paired
    difference isolates the donation copy.
    """
    import jax
    import jax.numpy as jnp
    import time as _time

    fn = jax.jit(make_fn, donate_argnums=(0,) if donate else ())

    def run(reps: int) -> float:
        best = np.inf
        for trial in range(trials):
            st = jax.tree_util.tree_map(jnp.copy, state)
            np.asarray(st.mu[0])  # copy resident before the clock starts
            key0 = jax.random.PRNGKey(100 + trial)
            t0 = _time.perf_counter()
            for r in range(reps):
                st = fn(st, jax.random.fold_in(key0, r))
            _measure_scalar(st)
            best = min(best, _time.perf_counter() - t0)
        return best * 1e3

    # First call compiles (timed alone, reported separately).
    st0 = jax.tree_util.tree_map(jnp.copy, state)
    np.asarray(st0.mu[0])
    t0 = _time.perf_counter()
    st0 = fn(st0, jax.random.PRNGKey(0))
    _measure_scalar(st0)
    first_s = _time.perf_counter() - t0
    lo, hi = run(reps_lo), run(reps_hi)
    slope = (hi - lo) / (reps_hi - reps_lo)
    rec = {"first_call_s": round(first_s, 2), "slope_ms": round(slope, 3)}
    print(f"   {label}: {rec['slope_ms']} ms (first {first_s:.2f}s)",
          flush=True)
    return rec


def _measure_scalar(st) -> None:
    import jax

    leaf = jax.tree_util.tree_leaves(st)[-1]
    if getattr(leaf, "ndim", 0):
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)


def _terms_for(state, relevant, exclude, params) -> dict:
    import jax
    import jax.numpy as jnp

    from ital_tpu.data.user import simulate_feedback
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.ital import select_ital
    from ital_tpu.utils.metrics import average_precision

    n = state.x.shape[0]
    kw = dict(bench.select_kwargs(), pool_size=POOL)

    def _feedback_block(st, key):
        # A fresh random b=4 block per dispatch (same cost as a real one;
        # labels from the ground-truth relevance like the runner's user).
        idx = jax.random.randint(key, (bench.BATCH,), 0, n)
        y = jnp.where(relevant[idx], 1.0, -1.0)
        return idx, y, jnp.ones((bench.BATCH,), bool)

    @jax.jit
    def update(st, key):
        idx, y, valid = _feedback_block(st, key)
        return gp_mod.gp_update(st, idx, y, valid)

    @jax.jit
    def rank(st, key):
        del key
        return jax.lax.top_k(st.mu, POOL)[1]

    @jax.jit
    def ap(st, key):
        del key
        return average_precision(st.mu, relevant, exclude)

    @jax.jit
    def select(st, key):
        return select_ital(st, bench.BATCH, key, params, **kw)

    def _round(st, key, *, with_ap: bool):
        k_sel, k_user = jax.random.split(key)
        batch = select_ital(st, bench.BATCH, k_sel, params, **kw)
        y, valid = simulate_feedback(
            k_user, batch, relevant, params.label_prob, params.mistake_prob)
        st = gp_mod.gp_update(st, batch, y, valid)
        # Return the FULL updated state: in a real round it is the carry the
        # next round reads (mu for ranking/pool, sig2/v for scoring), so every
        # gp_update output is live.  Returning a scalar instead lets XLA
        # dead-code-eliminate the (cap, N) v extension and the sig2 refresh
        # and slice the mu chain to one element — the same
        # measurement-fiction class as the scan-hoisting hole this round's
        # bench protocol fix closed (docs/PROFILE.md section 9).
        if with_ap:
            return average_precision(st.mu, relevant, exclude), st
        return st

    round_full = jax.jit(lambda st, key: _round(st, key, with_ap=True))
    round_serve = jax.jit(lambda st, key: _round(st, key, with_ap=False))

    return {
        "update": (update,), "rank": (rank,), "ap": (ap,),
        "select": (select,), "round_full": (round_full,),
        "round_serve": (round_serve,),
    }


def run_scale_25k(report: dict, out: str = OUT) -> None:
    import jax.numpy as jnp

    print("== 25k (bench workload of record)", flush=True)
    rng = np.random.default_rng(7)
    ds = bench._corpus()
    idx, ys = bench._labeled_history(ds, rng)
    state = bench.build_state(ds, idx, ys)
    q = idx[0]
    cls = int(np.argmax(ds.relevance[q])) if ds.relevance[q].any() else 0
    relevant = jnp.asarray(ds.relevance[:, cls].astype(bool))
    exclude = jnp.zeros((ds.n,), bool).at[jnp.asarray(q)].set(True)
    params = bench.bench_params()

    terms = _terms_for(state, relevant, exclude, params)
    report["scale_25k"] = {
        name: _measure(name, fn, state) for name, (fn,) in terms.items()}
    _write(report, out)


def run_scale_1m(report: dict, out: str = OUT,
                 corpus_dtype: str | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from ital_tpu.data.datasets import corpus100k
    from ital_tpu.models import gp as gp_mod

    print("== 1M x 512 (scale1m workload, production selection)", flush=True)
    ds = corpus100k(n=1_000_000, dim=512)
    rng = np.random.default_rng(7)
    q = int(rng.integers(0, ds.n))
    cls = int(ds.labels[q])
    relevant = jnp.asarray(ds.relevance[:, cls].astype(bool))
    exclude = jnp.zeros((ds.n,), bool).at[q].set(True)

    state = gp_mod.gp_init(jnp.asarray(ds.x), bench.LS, bench.VAR,
                           bench.NOISE, bench.CAP,
                           corpus_dtype=corpus_dtype)
    state = gp_mod.gp_set_query(state, jnp.asarray(q))
    warm = rng.permutation(ds.n)[:8].astype(np.int32)
    ys = np.where(ds.relevance[warm, cls], 1.0, -1.0).astype(np.float32)
    state = gp_mod.gp_update(
        state, jnp.asarray(warm), jnp.asarray(ys), jnp.ones(8, bool))
    np.asarray(state.mu[:1])
    print("   corpus resident", flush=True)

    params = bench.bench_params()
    terms = _terms_for(state, relevant, exclude, params)
    rec = {name: _measure(name, fn, state) for name, (fn,) in terms.items()}

    # Chained update loop (the serving shape): donated vs copied carry.
    # Max labels consumed: 8 warm + 12 reps x b=4 = 56 < cap=64.
    def _chain_update(st, key):
        idx = jax.random.randint(key, (bench.BATCH,), 0, ds.n)
        y = jnp.where(relevant[idx], 1.0, -1.0)
        return gp_mod.gp_update(st, idx, y,
                                jnp.ones((bench.BATCH,), bool))

    rec["update_chain_donate"] = _measure_chain(
        "update_chain_donate", _chain_update, state, donate=True)
    rec["update_chain_copy"] = _measure_chain(
        "update_chain_copy", _chain_update, state, donate=False)
    report["scale_1m"] = rec
    _write(report, out)


def main() -> int:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--skip-25k", action="store_true")
    ap.add_argument("--out", default=OUT, help="record path (off-path for "
                    "non-chip smoke runs; the committed record is the chip one)")
    ap.add_argument("--corpus-dtype", default="", help="GP.corpus_dtype for "
                    "the 1M workload (e.g. bfloat16 — halves the dominant "
                    "corpus HBM stream of gp_update); use a distinct --out")
    args = ap.parse_args()

    report = {
        "platform": jax.devices()[0].platform,
        "protocol": "pipeline slope (scripts/timing_protocol.py); "
                    "first_call_s separate per PROFILE.md section 6",
        "select_config": dict(bench.select_kwargs(), pool_size=POOL),
        "batch": bench.BATCH, "cap": bench.CAP,
    }
    if args.corpus_dtype:
        report["corpus_dtype"] = args.corpus_dtype
    if not args.skip_25k:
        run_scale_25k(report, args.out)
    if not args.skip_1m:
        run_scale_1m(report, args.out, corpus_dtype=args.corpus_dtype or None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
