#!/usr/bin/env python
"""MIRFLICKR-scale method comparison under label noise (reproducible).

Regenerates ``results/mirflickr_methods.json`` and (with ``--heavy``)
``results/mirflickr_methods_heavynoise.json`` — the round-1 numbers were
produced by an ad-hoc session; this script pins the protocol: ITAL vs
uncertainty vs random on the MIRFLICKR corpus (stored features or flagged
surrogate), noisy user, all 14 topic-class sessions per method, cohort-fused
execution (one dispatch per cohort of 7 sessions).

Usage: python scripts/method_comparison.py [--heavy] [--seeds 0,1,2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = ["ital", "uncertainty_sampling", "random"]


def run_one(method: str, label_prob: float, mistake_prob: float, seed: int):
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "mirflickr.ini"),
        (f"EXPERIMENT.method={method}",
         f"EXPERIMENT.seed={seed}",
         "EXPERIMENT.query_batch=7",
         "EXPERIMENT.fused_sessions=true",
         f"USER.label_prob={label_prob}",
         f"USER.mistake_prob={mistake_prob}"),
    )
    t0 = time.time()
    res = run_experiment(cfg)
    return res, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--heavy", action="store_true",
                    help="label_prob=0.6 mistake_prob=0.15 (heavy noise)")
    ap.add_argument("--seeds", default="0",
                    help="comma-separated seeds; >1 adds a cross-seed note")
    args = ap.parse_args()

    lp, mp = (0.6, 0.15) if args.heavy else (0.8, 0.05)
    seeds = [int(s) for s in args.seeds.split(",")]
    # Anchor outputs to the repo, not the cwd (the config path already is).
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = os.path.join(
        repo, "results",
        "mirflickr_methods_heavynoise.json" if args.heavy
        else "mirflickr_methods.json",
    )

    record: dict = {}
    per_seed: dict = {m: [] for m in METHODS}
    for m in METHODS:
        for seed in seeds:
            print(f"== {m} seed={seed}", flush=True)
            res, wall = run_one(m, lp, mp, seed)
            per_seed[m].append([round(float(v), 4) for v in res["map"]])
            if seed == seeds[0]:
                record[m] = {
                    "map": per_seed[m][0],
                    "sessions": len(res["sessions"]),
                    "wall_s": round(wall, 1),
                    "n_rounds": len(res["map"]),
                    "user": f"label_prob={lp}, mistake_prob={mp}",
                    "mode": "cohort-fused (query_batch=7)",
                }
            print(f"   final MAP {res['map'][-1]:.4f} ({wall:.1f}s)", flush=True)
    if len(seeds) > 1:
        record["_note"] = {
            m: {"final_map_by_seed": [c[-1] for c in per_seed[m]],
                "mean_final": round(sum(c[-1] for c in per_seed[m]) / len(seeds), 4)}
            for m in METHODS
        }
    os.makedirs(os.path.dirname(out_name), exist_ok=True)
    with open(out_name, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {out_name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
