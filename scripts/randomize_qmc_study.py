#!/usr/bin/env python
"""Does randomized-QMC selection (randomize_qmc) cost any MAP?

`randomize_qmc` applies per-round, per-greedy-step Cranley-Patterson lattice
shifts (docs/PROFILE.md section 9 — built as the scanned-bench hoisting
guard, surfaced as a user knob).  Each shifted lattice is an equally valid
orthant estimator, so selection quality should be statistically unchanged —
this study measures that claim instead of assuming it: the production
combined config (pool 4096 + base 32 + top-64 @ 512) with and without
randomize_qmc, MIRFLICKR scenario, 8 seeds, cohort-fused, standard AND heavy
user noise, paired per-seed deltas.

Writes results/randomize_qmc_map*.json (suffix `_cpu` on the CPU backend).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = (
    ("deterministic", "false"),
    ("randomized", "true"),
)


def run_map(seeds, *, heavy: bool) -> dict:
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    record: dict = {}
    for tag, flag in CONFIGS:
        curves, walls = [], []
        for seed in seeds:
            overrides = (
                f"EXPERIMENT.seed={seed}",
                "EXPERIMENT.query_batch=7",
                "EXPERIMENT.fused_sessions=true",
                "METHOD.pool_size=4096",
                "METHOD.n_qmc=32",
                "METHOD.refine_top=64",
                "METHOD.refine_n_qmc=512",
                f"METHOD.randomize_qmc={flag}",
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
            "seeds": list(seeds),
            "wall_s_per_seed": walls,
        }
    det = np.asarray(record["deterministic"]["final_map_by_seed"])
    rnd = np.asarray(record["randomized"]["final_map_by_seed"])
    d = rnd - det
    n = len(d)
    t = float(d.mean() / (d.std(ddof=1) / np.sqrt(n))) if n > 1 and d.std(ddof=1) > 0 else 0.0
    record["paired"] = {
        "delta_mean": round(float(d.mean()), 4),
        "delta_by_seed": [round(float(v), 4) for v in d],
        "wins": int((d > 0).sum()),
        "t_stat": round(t, 2),
    }
    print(f"  paired (randomized - deterministic): delta {d.mean():+.4f}, "
          f"{int((d > 0).sum())}/{n} wins, t={t:.2f}", flush=True)
    return record


def main() -> int:
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    report = {"platform": jax.devices()[0].platform,
              "config": "pool4096 32+top64@512 (production combined)"}
    print("== standard noise", flush=True)
    report["map"] = run_map(seeds, heavy=False)
    print("== heavy noise", flush=True)
    report["map_heavy"] = run_map(seeds, heavy=True)

    suffix = "_cpu" if report["platform"] == "cpu" else ""
    out = os.path.join(REPO, "results", f"randomize_qmc_map{suffix}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
