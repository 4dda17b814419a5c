#!/usr/bin/env python
"""Regenerate tests/golden/*.json from the CURRENT code (deliberately).

The golden files pin end-to-end MAP/AP curves on the 8-virtual-device CPU
platform (the test platform — tests/conftest.py).  They are secondary evidence
to the NumPy-oracle parity tests; regenerate them ONLY when a deliberate
behavior change shifts the curves, then eyeball the diff and commit both the
new goldens and the change that caused them (VERDICT round 2, weak item 7:
this script replaces the "script shape in git history" folklore).

Each golden gains a ``_provenance`` header (generator, git commit, platform)
so a future reader can tell how it was made.  The experiment configs here are
copied verbatim from the tests that consume the files:

- toy_b1_map.json    <- tests/test_runner.py::test_golden_toy_curve
- digits_b2_map.json <- tests/test_runner.py::test_golden_digits_batch_curve

Usage: python scripts/regen_goldens.py [--check]
  --check: regenerate in memory and compare against the checked-in files
           (exit 1 on drift) without writing anything.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# Pin the test platform BEFORE jax initializes (same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def _provenance() -> dict:
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    return {
        "generator": "scripts/regen_goldens.py",
        "git_commit": commit,
        "platform": f"cpu x {jax.device_count()} virtual devices",
    }


def golden_toy_b1() -> dict:
    """tests/test_runner.py::test_golden_toy_curve — config copied verbatim."""
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    cfg = ExperimentConfig(
        dataset="toy",
        dataset_kwargs=dict(n_per_class=80, n_classes=3, dim=2, seed=0),
        method="ital", batch_size=1, n_rounds=6, repetitions=1,
        queries_per_class=1, seed=0,
        gp=GPConfig(length_scale=1.5, var=1.0, noise=0.1, cap=16),
        user=UserConfig(label_prob=0.8, mistake_prob=0.1),
    )
    res = run_experiment(cfg)
    return {"map": [float(v) for v in res["map"]],
            "ap": np.asarray(res["ap"]).tolist()}


def golden_digits_b2() -> dict:
    """tests/test_runner.py::test_golden_digits_batch_curve — copied verbatim."""
    from ital_tpu.data.datasets import Dataset, digits
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    ds = digits()
    keep = np.arange(0, 1797, 3)
    ds_small = Dataset("digits600", ds.x[keep], ds.labels[keep],
                       ds.relevance[keep], ds.classes)
    cfg = ExperimentConfig(
        dataset="digits", method="ital", batch_size=2, n_rounds=5, repetitions=1,
        queries_per_class=1, max_classes=3, seed=0,
        gp=GPConfig(length_scale=2.2, var=1.0, noise=0.1, cap=16),
        user=UserConfig(label_prob=0.9, mistake_prob=0.05),
    )
    res = run_experiment(cfg, dataset=ds_small)
    return {"map": [float(v) for v in res["map"]],
            "ap": np.asarray(res["ap"]).tolist()}


GOLDENS = {
    "toy_b1_map.json": golden_toy_b1,
    "digits_b2_map.json": golden_digits_b2,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true",
                    help="compare against checked-in goldens, write nothing")
    args = ap.parse_args()

    prov = _provenance()
    drift = False
    for name, fn in GOLDENS.items():
        path = os.path.join(GOLDEN_DIR, name)
        print(f"== {name}", flush=True)
        fresh = fn()
        if args.check:
            with open(path) as fh:
                old = json.load(fh)
            close = np.allclose(fresh["map"], old["map"], atol=1e-6) and \
                np.allclose(fresh["ap"], old["ap"], atol=1e-6)
            print(f"   {'OK (matches)' if close else 'DRIFT'}")
            drift |= not close
        else:
            fresh["_provenance"] = prov
            with open(path, "w") as fh:
                json.dump(fresh, fh, indent=1)
            print(f"   wrote {path}")
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
