#!/usr/bin/env python
"""MIRFLICKR-scale method comparison under label noise (reproducible).

Regenerates ``results/mirflickr_methods.json`` and (with ``--heavy``)
``results/mirflickr_methods_heavynoise.json``: ITAL vs uncertainty vs random
on the MIRFLICKR corpus (stored features or flagged surrogate), noisy user,
all 14 topic-class sessions per method, cohort-fused execution (one dispatch
per cohort of 7 sessions).

Every recorded MAP row is a mean +/- std over ``--seeds`` (default 0,1,2):
single-seed MAP differences at this scale are 0.003-0.14 — smaller than
cross-seed spread — so ordering claims need the uncertainty (VERDICT round 2,
weak item 3).

``--gp-noise`` overrides the GP noise hyperparameter and suffixes the output
file (``…_gpnoise0.5.json``) — used by the heavy-noise robustness analysis
(docs/NOISE_ANALYSIS.md) to separate the user-model story from GP
regularization.

``--dataset digits`` runs the same comparison on scikit-learn's bundled 8x8
digits — REAL features, no surrogate — so the flagship ordering claim is
also pinned on non-synthetic data (output ``results/digits_methods*.json``).

Usage: python scripts/method_comparison.py [--heavy] [--seeds 0,1,2]
       [--gp-noise 0.5] [--methods ital,uncertainty_sampling,random]
       [--dataset digits] [--query-batch 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_METHODS = ["ital", "uncertainty_sampling", "random"]


def run_one(method: str, label_prob: float, mistake_prob: float, seed: int,
            gp_noise: float | None, learn_every: int = 0,
            method_overrides: tuple = (), dataset: str = "mirflickr",
            query_batch: int = 7, gp_overrides: tuple = ()):
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    overrides = [
        f"EXPERIMENT.method={method}",
        f"EXPERIMENT.seed={seed}",
        f"EXPERIMENT.query_batch={query_batch}",
        "EXPERIMENT.fused_sessions=true",
        f"USER.label_prob={label_prob}",
        f"USER.mistake_prob={mistake_prob}",
    ]
    overrides += [f"METHOD.{kv}" for kv in method_overrides]
    if gp_noise is not None:
        overrides.append(f"GP.noise={gp_noise}")
    if learn_every:
        overrides.append(f"GP.learn_every={learn_every}")
    overrides += [f"GP.{kv}" for kv in gp_overrides]
    cfg = load_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", f"{dataset}.ini"),
        tuple(overrides),
    )
    t0 = time.time()
    res = run_experiment(cfg)
    return res, time.time() - t0


def main() -> int:
    import numpy as np

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--heavy", action="store_true",
                    help="label_prob=0.6 mistake_prob=0.15 (heavy noise)")
    ap.add_argument("--seeds", default="0,1,2",
                    help="comma-separated seeds; recorded rows are mean+/-std")
    ap.add_argument("--gp-noise", type=float, default=None,
                    help="override GP noise (suffixes the output filename)")
    ap.add_argument("--learn-every", type=int, default=0,
                    help="GP.learn_every: online type-II-ML hyperparameter "
                         "relearn cadence (suffixes the output filename) — "
                         "the misspecification-recovery experiment of "
                         "docs/NOISE_ANALYSIS.md Finding 4")
    ap.add_argument("--methods", default=",".join(DEFAULT_METHODS))
    ap.add_argument("--dataset", default="mirflickr",
                    help="config stem under configs/ (e.g. digits for the "
                         "REAL offline dataset — the flagship ordering on "
                         "non-surrogate features); output stem follows")
    ap.add_argument("--query-batch", type=int, default=None,
                    help="cohort width (must divide total sessions); default "
                         "7 for mirflickr's 14 topics, 5 otherwise")
    ap.add_argument("--ital-kwargs", default="",
                    help="comma-separated k=v [METHOD] overrides applied to "
                         "the ITAL runs ONLY (other strategies reject unknown "
                         "kwargs), e.g. the production combined config "
                         "'pool_size=4096,n_qmc=32,refine_top=64,"
                         "refine_n_qmc=512' — the NOISE_ANALYSIS Finding-5 "
                         "lever; suffixes the output filename")
    ap.add_argument("--tag", default="",
                    help="extra output-filename suffix (e.g. 'cpu' to record "
                         "a same-config run on another backend WITHOUT "
                         "overwriting the original — ordering claims pair "
                         "within one backend, docs/NOISE_ANALYSIS.md caveats)")
    ap.add_argument("--gp-overrides", default="",
                    help="comma-separated k=v [GP] overrides applied to ALL "
                         "methods, e.g. 'learn_prior_strength=1.0,"
                         "learn_noise_floor=0.05' (the MAP-type-II knobs, "
                         "NOISE_ANALYSIS Finding 7); suffixes the output "
                         "filename")
    args = ap.parse_args()

    lp, mp = (0.6, 0.15) if args.heavy else (0.8, 0.05)
    seeds = [int(s) for s in args.seeds.split(",")]
    methods = [m for m in args.methods.split(",") if m]
    query_batch = args.query_batch if args.query_batch is not None else (
        7 if args.dataset == "mirflickr" else 5)
    # Anchor outputs to the repo, not the cwd (the config path already is).
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stem = f"{args.dataset}_methods"
    if args.heavy:
        stem += "_heavynoise"
    if args.gp_noise is not None:
        stem += f"_gpnoise{args.gp_noise:g}"
    if args.learn_every:
        stem += f"_learn{args.learn_every}"
    ital_kwargs = tuple(kv for kv in args.ital_kwargs.split(",") if kv)
    if ital_kwargs:
        stem += "_italpool" if any(
            kv.startswith("pool_size") for kv in ital_kwargs) else "_italkw"
    gp_overrides = tuple(kv for kv in args.gp_overrides.split(",") if kv)
    if gp_overrides:
        stem += "_" + "-".join(
            kv.replace("learn_", "").replace("=", "") for kv in gp_overrides)
    if args.tag:
        stem += f"_{args.tag}"
    out_name = os.path.join(repo, "results", stem + ".json")

    record: dict = {}
    for m in methods:
        curves, walls = [], []
        for seed in seeds:
            print(f"== {m} seed={seed}", flush=True)
            res, wall = run_one(m, lp, mp, seed, args.gp_noise,
                                args.learn_every,
                                ital_kwargs if m == "ital" else (),
                                args.dataset, query_batch, gp_overrides)
            curves.append([round(float(v), 4) for v in res["map"]])
            walls.append(round(wall, 1))
            print(f"   final MAP {res['map'][-1]:.4f} ({wall:.1f}s)", flush=True)
        arr = np.asarray(curves)
        record[m] = {
            # "map" stays the headline (mean) curve for existing readers.
            "map": [round(float(v), 4) for v in arr.mean(axis=0)],
            "map_std": [round(float(v), 4) for v in arr.std(axis=0)],
            "map_by_seed": {str(s): c for s, c in zip(seeds, curves)},
            "final_map_by_seed": [c[-1] for c in curves],
            "seeds": seeds,
            "sessions": len(res["sessions"]),
            "wall_s_per_seed": walls,
            "n_rounds": len(res["map"]),
            "user": f"label_prob={lp}, mistake_prob={mp}",
            "gp_noise": args.gp_noise,
            "learn_every": args.learn_every,
            "gp_overrides": list(gp_overrides),
            "ital_kwargs": list(ital_kwargs) if m == "ital" else [],
            "mode": f"cohort-fused (query_batch={query_batch})",
            "dataset": args.dataset,
            # Ordering claims pair within one backend (bf16 trajectories
            # diverge across backends like a seed change) — record it.
            "platform": __import__("jax").devices()[0].platform,
        }
    os.makedirs(os.path.dirname(out_name), exist_ok=True)
    with open(out_name, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {out_name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
