#!/usr/bin/env python
"""Hyperparameter learning on the regression task — the well-specified case.

NOISE_ANALYSIS Finding 4 measured that online type-II ML FAILS on heavily
flipped ±1 retrieval labels (likelihood misspecification).  The regression
variant (reference C7) is the task its Gaussian likelihood is actually
specified for; this study records the positive counterpart: starting from a
20x-wrong GP noise (init 1.0, generative USER.obs_noise 0.05), does
``GP.learn_every`` close the RMSE gap to the well-specified run?

Three configs x --seeds, ital_regression, regression_toy (n=300, dim=2):
  fixed-wrong      GP.noise=1.0
  learned          GP.noise=1.0 + learn_every=2 (learn_steps=40)
  well-specified   GP.noise=0.05 (the floor)

Writes results/regression_learning.json (mean/std final RMSE per config +
per-seed curves + learned hyperparameters).  CPU-safe: the statistics are
platform-agnostic; run with ITAL_TPU_PLATFORM=cpu during tunnel outages.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "regression_learning.json")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--rounds", type=int, default=10)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    import jax

    from ital_tpu.runner import run_regression_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    base = ExperimentConfig(
        dataset="regression_toy",
        dataset_kwargs=dict(n=300, dim=2, seed=1, noise=0.0),
        method="ital_regression", batch_size=4, n_rounds=args.rounds,
        repetitions=1,
        gp=GPConfig(length_scale=1.0, var=1.0, noise=1.0, cap=48),
        user=UserConfig(label_prob=1.0, obs_noise=0.05),
    )
    configs = {
        "fixed_wrong": {},
        "learned": dict(learn_every=2, learn_steps=40),
        "well_specified": dict(noise=0.05),
    }

    record: dict = {
        "task": "regression_toy n=300 dim=2, ital_regression b=4, "
                f"{args.rounds} rounds; generative obs_noise=0.05, "
                "model init noise=1.0 (20x wrong)",
        "platform": jax.devices()[0].platform,
        "configs": {},
    }
    for name, gp_kw in configs.items():
        finals, curves, hypers = [], [], []
        for seed in seeds:
            cfg = dataclasses.replace(
                base, seed=seed,
                gp=dataclasses.replace(base.gp, **gp_kw),
            )
            res = run_regression_experiment(cfg)
            curve = [round(float(v), 4) for v in res["mean_rmse"]]
            curves.append(curve)
            finals.append(curve[-1])
            if "hyper" in res:
                hypers.append({k: round(v, 4) for k, v in res["hyper"].items()})
            print(f"== {name} seed={seed} final RMSE {curve[-1]:.4f}",
                  flush=True)
        arr = np.asarray(finals)
        record["configs"][name] = {
            "final_rmse_mean": round(float(arr.mean()), 4),
            "final_rmse_std": round(float(arr.std()), 4),
            "final_rmse_by_seed": finals,
            "rmse_curves_by_seed": {str(s): c for s, c in zip(seeds, curves)},
            "gp_overrides": gp_kw,
            "learned_hyper_by_seed": hypers,
        }

    fw = np.asarray(record["configs"]["fixed_wrong"]["final_rmse_by_seed"])
    le = np.asarray(record["configs"]["learned"]["final_rmse_by_seed"])
    d = fw - le
    sd = d.std(ddof=1)
    record["paired_fixed_minus_learned"] = {
        "mean": round(float(d.mean()), 4),
        "wins": int((d > 0).sum()),
        "n": len(d),
        "t": round(float(d.mean() / (sd / np.sqrt(len(d)))), 2)
        if sd > 0 else None,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
