#!/usr/bin/env python
"""Run the BASELINE.json scenario configs and record results under results/.

Writes one JSON per scenario (MAP curve, timing, metadata) plus a combined
summary — the round's evidence that every headline scenario executes end to
end.  Scenario 5 (8-chip mesh) runs on however many devices exist; pass
--quick to shrink rounds/queries for a smoke pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENARIOS = [
    ("config1_toy_b1", "configs/toy.ini", ()),
    ("config2_digits_b4_noiseless", "configs/digits.ini", ()),
    ("config3_parity_uncertainty", "configs/parity_suite.ini",
     ("EXPERIMENT.method=uncertainty_sampling",)),
    ("config3_parity_borderline", "configs/parity_suite.ini",
     ("EXPERIMENT.method=borderline_sampling",)),
    ("config3_parity_variance", "configs/parity_suite.ini",
     ("EXPERIMENT.method=variance_sampling",)),
    ("config3_parity_random", "configs/parity_suite.ini",
     ("EXPERIMENT.method=random",)),
    ("config3_parity_ital", "configs/parity_suite.ini",
     ("EXPERIMENT.method=ital",)),
    ("config4_mirflickr_b4_noisy", "configs/mirflickr.ini",
     ("EXPERIMENT.max_classes=2",)),
    ("config5_scale100k_sharded", "configs/scale100k.ini",
     ("EXPERIMENT.n_rounds=3", "EXPERIMENT.max_classes=1")),
    # Paper datasets beyond the 5 BASELINE scenarios (surrogate-flagged).
    ("usps_b4", "configs/usps.ini", ("EXPERIMENT.max_classes=4",)),
    ("natural_scenes_b4", "configs/natural_scenes.ini",
     ("EXPERIMENT.max_classes=4",)),
]

QUICK_OVERRIDES = ("EXPERIMENT.n_rounds=3", "EXPERIMENT.queries_per_class=1")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--out", default="results")
    parser.add_argument("--only", default=None, help="substring filter on scenario name")
    parser.add_argument(
        "--seeds", default="0,1,2",
        help="comma-separated seeds; recorded MAP rows are mean +/- std over "
             "them (single-seed ordering claims are noise at this scale — "
             "VERDICT r2).  Pass one seed for a smoke pass.",
    )
    args = parser.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    os.makedirs(args.out, exist_ok=True)
    # Merge into any existing summary so partial (--only) runs don't clobber
    # previously recorded scenarios.
    summary_path = os.path.join(args.out, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            summary = json.load(fh)
    for name, cfg_path, overrides in SCENARIOS:
        if args.only and args.only not in name:
            continue
        ov = overrides + (QUICK_OVERRIDES if args.quick else ())
        cfg = load_config(cfg_path, ov)
        print(f"== {name} ({cfg.dataset}, {cfg.method}, b={cfg.batch_size}, "
              f"{cfg.n_rounds} rounds, seeds={seeds})")
        t0 = time.time()
        curves, select_ms, steady_ms, first_ms = [], [], [], []
        try:
            for seed in seeds:
                res = run_experiment(
                    load_config(cfg_path, ov + (f"EXPERIMENT.seed={seed}",))
                )
                curves.append([round(float(v), 4) for v in res["map"]])
                select_ms.append(res["select_ms"])
                if res.get("select_ms_steady") is not None:
                    # None = no steady span recorded (e.g. a single cohort);
                    # excluded rather than aggregated as a bogus 0.
                    steady_ms.append(res["select_ms_steady"])
                first_ms.append(res.get("first_round_ms", 0.0))
        except Exception as exc:  # record the failure, keep going
            summary[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"   ERROR {exc}")
            continue
        import numpy as np

        arr = np.asarray(curves)
        rec = {
            "dataset": res["dataset"],
            "method": res["method"],
            "sessions": len(res["sessions"]),
            # Headline "map" is the cross-seed mean; std quantifies it.
            "map": [round(float(v), 4) for v in arr.mean(axis=0)],
            "map_std": [round(float(v), 4) for v in arr.std(axis=0)],
            "map_by_seed": {str(s): c for s, c in zip(seeds, curves)},
            # Headline timing is the STEADY-STATE median; the first round's
            # compile/cache-load/transfer cost is a separate field, never
            # averaged in (PROFILE.md section 6 recording rule; the round-3
            # config-5 record violated it with a compile-polluted mean).
            "select_ms_steady": (round(float(np.median(steady_ms)), 2)
                                 if steady_ms else None),
            "first_round_ms": round(float(np.median(first_ms)), 2),
            "select_ms_mean_DEPRECATED": round(float(np.mean(select_ms)), 2),
            "wall_s": round(time.time() - t0, 1),
            # Full provenance so smoke runs are distinguishable from evidence.
            "n_rounds": cfg.n_rounds,
            "batch_size": cfg.batch_size,
            "queries_per_class": cfg.queries_per_class,
            "seeds": seeds,
            "quick": bool(args.quick),
            "overrides": list(ov),
            # Execution provenance (VERDICT r2: the config-5 record must say
            # how many devices actually ran).
            **{k: res[k] for k in ("mesh_devices", "query_batch", "fused",
                                   "chol2d") if k in res},
        }
        summary[name] = rec
        with open(os.path.join(args.out, f"{name}.json"), "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"   MAP {rec['map']}  ({rec['wall_s']}s)")

    with open(summary_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {summary_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
