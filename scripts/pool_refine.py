#!/usr/bin/env python
"""Measure the COMBINED production selection config: compact pool x two-stage.

Round 4 built two independent selection-cost levers, each measured alone:

- compact-pool scan (``pool_size`` — `scripts/pool_sweep.py`): cost scales
  with the pool, and the top-ranked restriction WINS MAP 8/8 seeds;
- two-stage scoring (``refine_top`` — `scripts/refine_study.py`): ~4x at
  MAP parity (8 seeds, both noise regimes).

Production records already stack them (the bigcap fast-selection session and
the serving measurement run pool 4096 + base 32 + top-64 @ 512), but the
combination itself had no direct evidence: no selection ms/round row and —
the part that matters — no multi-seed MAP measurement.  Interaction risk is
real in both directions: the refined pick can only choose within the pool, so
a coarse base scan *inside a 4096-item pool* discards different candidates
than inside the full corpus.  This study measures the combination directly.

1. **Timing**: selection ms/round at MIRFLICKR-25K and 100k scale for the
   combined config vs the single-lever anchors, in ONE chip process so rows
   are mutually comparable (pipeline-slope protocol, CLAUDE.md timing note).
2. **MAP** (``--map``): MIRFLICKR scenario (14 topic sessions, cohort-fused)
   x 8 seeds, combined config vs the full-scan n_qmc=128 reference, at
   standard AND (``--map-heavy``) heavy user noise, with the paired
   per-seed deltas recorded.

Writes results/pool_refine.json.  Run on the real TPU:
``python scripts/pool_refine.py [--skip-100k] [--map] [--map-heavy]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (tag, pool_size, base n_qmc, refine_top, refine_n_qmc).  Anchors re-measure
# the single-lever rows in this process so the combined rows are read against
# same-session tunnel conditions, not against older records.
CONFIGS = (
    ("full 128", 0, 128, 0, 0),                      # round-3 production
    ("full 32+top64@512", 0, 32, 64, 512),           # refine alone (bench)
    ("pool4096 128", 4096, 128, 0, 0),               # pool alone
    ("pool4096 32+top64@512", 4096, 32, 64, 512),    # PRODUCTION COMBINED
    ("pool1024 32+top64@512", 1024, 32, 64, 512),
)

from scripts.pool_sweep import _mid_session_state  # noqa: E402
from scripts.timing_protocol import measure_select  # noqa: E402


def _time_scale(name, ds, report):
    import jax
    import jax.numpy as jnp

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    state = _mid_session_state(ds, 50.0, 1.0, 0.1)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    rows = {}
    for tag, pool, base, rt, rq in CONFIGS:
        select = jax.jit(
            lambda s, key, _p=pool, _b=base, _t=rt, _q=rq: select_ital(
                s, BATCH, key, params, n_qmc=_b, pool_size=_p,
                refine_top=_t, refine_n_qmc=_q or 512,
            )
        )
        first_s, slope = measure_select(select, state)
        rows[tag] = {"ms_per_round": round(slope, 2),
                     "first_call_s": round(first_s, 1)}
        print(f"  {name} {tag:>24}: {slope:.2f} ms/round "
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


MAP_CONFIGS = (
    ("full 128", 0, 128, 0, 0),
    ("pool4096 32+top64@512", 4096, 32, 64, 512),
)


def run_map(seeds: list[int], *, heavy: bool = False) -> dict:
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    record: dict = {}
    for tag, pool, base, rt, rq in MAP_CONFIGS:
        curves, walls = [], []
        for seed in seeds:
            overrides = (
                f"EXPERIMENT.seed={seed}",
                "EXPERIMENT.query_batch=7",
                "EXPERIMENT.fused_sessions=true",
                f"METHOD.pool_size={pool}",
                f"METHOD.n_qmc={base}",
                f"METHOD.refine_top={rt}",
                f"METHOD.refine_n_qmc={rq or 512}",
            ) + ((
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
    # Paired per-seed deltas of the combined config vs the reference config
    # (the ordering claim must never be read off single-seed noise —
    # docs/NOISE_ANALYSIS.md).
    ref = np.asarray(record[MAP_CONFIGS[0][0]]["final_map_by_seed"])
    new = np.asarray(record[MAP_CONFIGS[1][0]]["final_map_by_seed"])
    d = new - ref
    n = len(d)
    t = (float(d.mean() / (d.std(ddof=1) / np.sqrt(n)))
         if n > 1 and d.std(ddof=1) > 0 else 0.0)
    record["paired"] = {
        "delta_mean": round(float(d.mean()), 4),
        "delta_by_seed": [round(float(v), 4) for v in d],
        "wins": int((d > 0).sum()),
        "t_stat": round(t, 2),
    }
    print(f"  paired: delta {d.mean():+.4f}, {int((d > 0).sum())}/{n} wins, "
          f"t={t:.2f}", flush=True)
    return record


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-100k", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--map", action="store_true")
    ap.add_argument("--map-heavy", action="store_true")
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--out", default=None,
                    help="output record path (default results/pool_refine.json"
                         "; use a distinct path for CPU-backend MAP-only runs "
                         "so the default path stays the chip-study completion "
                         "marker the retry supervisor watches)")
    args = ap.parse_args()
    out_path = args.out or os.path.join(REPO, "results", "pool_refine.json")
    report = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            report = json.load(fh)
    seeds = [int(s) for s in args.seeds.split(",")]
    # Completed sections land in the .partial file as they finish (an hour of
    # chip work must survive a mid-run tunnel drop); the final path doubles
    # as the retry-supervisor's completion marker, so it is written only at
    # the end.
    partial = out_path.replace(".json", ".partial.json")

    def _checkpoint():
        with open(partial, "w") as fh:
            json.dump(report, fh, indent=1)

    if not args.skip_timing:
        report["timing"] = run_timing(args.skip_100k)
        _checkpoint()
    if args.map:
        report["map"] = run_map(seeds)
        _checkpoint()
    if args.map_heavy:
        report["map_heavy"] = run_map(seeds, heavy=True)
        _checkpoint()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    if os.path.exists(partial):
        os.remove(partial)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
