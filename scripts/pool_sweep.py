#!/usr/bin/env python
"""Measure the compact-pool tractability knob (VERDICT r3 item 1).

Two phases, one long-lived chip process (lease discipline — CLAUDE.md):

1. **Timing**: ITAL selection ms/round vs ``pool_size`` in {1k, 4k, 16k,
   full} at MIRFLICKR-25K scale and at 100k x 512, by the RTT-cancelling
   pipeline-slope protocol (docs/PROFILE.md section 1).  Done = selection
   cost scales with the pool, not the corpus.
2. **MAP tradeoff** (``--map``): MIRFLICKR scenario (14 topic sessions,
   cohort-fused) at pool_size in {0, 4096, 1024} x ``--seeds`` — what the
   speed knob costs in retrieval quality, with cross-seed std so orderings
   aren't read into noise (docs/NOISE_ANALYSIS.md).

Writes results/pool_sweep.json (timing) and results/pool_tradeoff.json (MAP).
Run on the real TPU: ``python scripts/pool_sweep.py [--skip-100k] [--map]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, N_QMC, CAP = 4, 128, 64
POOLS = (1024, 4096, 16384, 0)  # 0 = unrestricted full scan
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mid_session_state(ds, ls, var, noise):
    import jax.numpy as jnp

    from ital_tpu.models import gp as gp_mod

    rng = np.random.default_rng(7)
    q = int(rng.integers(0, ds.n))
    cls = int(np.argmax(ds.relevance[q])) if ds.relevance[q].any() else 0
    idx = [q] + [int(i) for i in rng.permutation(ds.n)[: 5 * BATCH]]
    ys = [1.0] + [1.0 if ds.relevance[i, cls] else -1.0 for i in idx[1:]]
    state = gp_mod.gp_init(jnp.asarray(ds.x), ls, var, noise, CAP)
    k = len(idx)
    return gp_mod.gp_fit(
        state.replace(
            idx=state.idx.at[:k].set(jnp.asarray(idx, jnp.int32)),
            y=state.y.at[:k].set(jnp.asarray(ys, jnp.float32)),
            valid=state.valid.at[:k].set(True),
            count=jnp.asarray(k, jnp.int32),
        )
    )


from scripts.timing_protocol import measure_select


def _time_scale(name, ds, report):
    import jax
    import jax.numpy as jnp

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ls = 50.0  # feature-scale appropriate for the 512-d surrogates
    state = _mid_session_state(ds, ls, 1.0, 0.1)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    rows = {}
    for pool in POOLS:
        if pool and pool >= ds.n:
            continue
        select = jax.jit(
            lambda s, key, _p=pool: select_ital(
                s, BATCH, key, params, n_qmc=N_QMC, pool_size=_p
            )
        )
        first_s, slope = measure_select(select, state)
        rows[str(pool) if pool else "full"] = {
            "ms_per_round": round(slope, 2),
            "first_call_s": round(first_s, 1),
        }
        print(f"  {name} pool={pool or 'full':>6}: {slope:.2f} ms/round "
              f"(first call {first_s:.1f}s)", flush=True)
    report[name] = {"n": ds.n, "dim": ds.x.shape[1], "pools": rows}


def run_timing(skip_100k: bool) -> None:
    import jax

    from ital_tpu.data.datasets import corpus100k, mirflickr

    report = {"platform": jax.devices()[0].platform, "batch": BATCH,
              "n_qmc": N_QMC, "protocol": "pipeline slope (12-4)/8, best of 3"}
    print("== timing: mirflickr 25k", flush=True)
    _time_scale("mirflickr25k", mirflickr(), report)
    if not skip_100k:
        print("== timing: corpus 100k", flush=True)
        _time_scale("corpus100k", corpus100k(n=100_000, dim=512), report)
    out = os.path.join(REPO, "results", "pool_sweep.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)


def run_map(seeds: list[int]) -> None:
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    record: dict = {}
    for pool in (0, 4096, 1024):
        curves, walls = [], []
        for seed in seeds:
            overrides = (
                f"EXPERIMENT.seed={seed}",
                "EXPERIMENT.query_batch=7",
                "EXPERIMENT.fused_sessions=true",
                f"METHOD.pool_size={pool}",
            )
            cfg = load_config(os.path.join(REPO, "configs", "mirflickr.ini"),
                              overrides)
            t0 = time.time()
            res = run_experiment(cfg)
            walls.append(round(time.time() - t0, 1))
            curves.append([round(float(v), 4) for v in res["map"]])
            print(f"  pool={pool or 'full'} seed={seed}: final "
                  f"{curves[-1][-1]:.4f} ({walls[-1]}s)", flush=True)
        arr = np.asarray(curves)
        record[str(pool) if pool else "full"] = {
            "map": [round(float(v), 4) for v in arr.mean(axis=0)],
            "map_std": [round(float(v), 4) for v in arr.std(axis=0)],
            "map_by_seed": {str(s): c for s, c in zip(seeds, curves)},
            "final_map_by_seed": [c[-1] for c in curves],
            "seeds": seeds,
            "sessions": len(res["sessions"]),
            "wall_s_per_seed": walls,
            "mode": "cohort-fused (query_batch=7)",
        }
    out = os.path.join(REPO, "results", "pool_tradeoff.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {out}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-100k", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--map", action="store_true",
                    help="also record the MAP-vs-pool tradeoff (slower)")
    ap.add_argument("--seeds", default="0,1,2")
    args = ap.parse_args()
    if not args.skip_timing:
        run_timing(args.skip_100k)
    if args.map:
        run_map([int(s) for s in args.seeds.split(",")])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
