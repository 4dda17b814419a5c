#!/usr/bin/env python
"""Measure the two-stage (coarse base + top-T refined) MI scoring knob.

The motivating regression: n_qmc=64 alone is ~2x cheaper than the production
128 but cost 0.03 MAP on the MIRFLICKR scenario (docs/PROFILE.md section 5's
n_qmc note).  Two-stage scoring claims to recover that: the base scan only
has to land the true winner inside the top ``refine_top``, and the pick is
then made at ``refine_n_qmc`` accuracy.  Two phases, one chip process
(lease discipline — CLAUDE.md):

1. **Timing**: ITAL selection ms/round at MIRFLICKR-25K and 100k scale for a
   (base n_qmc x refinement) matrix, pipeline-slope protocol.
2. **MAP** (``--map``): the MIRFLICKR scenario (14 topic sessions,
   cohort-fused) per configuration x seeds — does the coarse base cost
   retrieval quality once refinement is on?

Writes results/refine_study.json.  Run on the real TPU:
``python scripts/refine_study.py [--skip-100k] [--map] [--seeds 0,..]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, CAP = 4, 64
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (base n_qmc, refine_top, refine_n_qmc); refine_top=0 = single-stage.
CONFIGS = (
    (128, 0, 0),      # production single-stage
    (64, 0, 0),       # the known-regressed cheap base
    (64, 64, 512),    # two-stage: cheap base, refined decision
    (32, 64, 512),    # aggressive base
)

from scripts.pool_sweep import _mid_session_state  # noqa: E402
from scripts.timing_protocol import measure_select  # noqa: E402


def _time_scale(name, ds, report):
    import jax
    import jax.numpy as jnp

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ls = 50.0
    state = _mid_session_state(ds, ls, 1.0, 0.1)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    rows = {}
    for base, rt, rq in CONFIGS:
        tag = f"{base}" if not rt else f"{base}+top{rt}@{rq}"
        select = jax.jit(
            lambda s, key, _b=base, _t=rt, _q=rq: select_ital(
                s, BATCH, key, params, n_qmc=_b,
                refine_top=_t, refine_n_qmc=_q or 512,
            )
        )
        first_s, slope = measure_select(select, state)
        rows[tag] = {"ms_per_round": round(slope, 2),
                     "first_call_s": round(first_s, 1)}
        print(f"  {name} {tag:>16}: {slope:.2f} ms/round "
              f"(first call {first_s:.1f}s)", flush=True)
    report[name] = {"n": ds.n, "dim": ds.x.shape[1], "configs": rows}


def run_timing(skip_100k: bool) -> dict:
    import jax

    from ital_tpu.data.datasets import corpus100k, mirflickr

    report = {"platform": jax.devices()[0].platform, "batch": BATCH,
              "protocol": "pipeline slope (12-4)/8, best of 3"}
    print("== timing: mirflickr 25k", flush=True)
    _time_scale("mirflickr25k", mirflickr(), report)
    if not skip_100k:
        print("== timing: corpus 100k", flush=True)
        _time_scale("corpus100k", corpus100k(n=100_000, dim=512), report)
    return report


def run_map(seeds: list[int], *, heavy: bool = False,
            configs=CONFIGS) -> dict:
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    record: dict = {}
    for base, rt, rq in configs:
        tag = f"{base}" if not rt else f"{base}+top{rt}@{rq}"
        curves, walls = [], []
        for seed in seeds:
            overrides = (
                f"EXPERIMENT.seed={seed}",
                "EXPERIMENT.query_batch=7",
                "EXPERIMENT.fused_sessions=true",
                f"METHOD.n_qmc={base}",
                f"METHOD.refine_top={rt}",
                f"METHOD.refine_n_qmc={rq or 512}",
            ) + ((
                # The flagship-claim regime (docs/NOISE_ANALYSIS.md): the
                # two-stage config must hold MAP parity here too before it
                # can be a production default.
                "USER.label_prob=0.6",
                "USER.mistake_prob=0.15",
            ) if heavy else ())
            cfg = load_config(os.path.join(REPO, "configs", "mirflickr.ini"),
                              overrides)
            t0 = time.time()
            res = run_experiment(cfg)
            walls.append(round(time.time() - t0, 1))
            curves.append([round(float(v), 4) for v in res["map"]])
            print(f"  {tag} seed={seed}: final {curves[-1][-1]:.4f} "
                  f"({walls[-1]}s)", flush=True)
        arr = np.asarray(curves)
        record[tag] = {
            "map": [round(float(v), 4) for v in arr.mean(axis=0)],
            "map_std": [round(float(v), 4) for v in arr.std(axis=0)],
            "final_map_by_seed": [c[-1] for c in curves],
            "seeds": seeds,
            "wall_s_per_seed": walls,
            "mode": "cohort-fused (query_batch=7)",
        }
    return record


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-100k", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--map", action="store_true")
    ap.add_argument("--map-heavy", action="store_true",
                    help="heavy-noise MAP parity (128 vs 32+top64@512 only)")
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    args = ap.parse_args()
    out_path = os.path.join(REPO, "results", "refine_study.json")
    report = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            report = json.load(fh)
    if not args.skip_timing:
        report["timing"] = run_timing(args.skip_100k)
    if args.map:
        report["map"] = run_map([int(s) for s in args.seeds.split(",")])
    if args.map_heavy:
        report["map_heavy"] = run_map(
            [int(s) for s in args.seeds.split(",")], heavy=True,
            configs=((128, 0, 0), (32, 64, 512)),
        )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
