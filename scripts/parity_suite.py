#!/usr/bin/env python
"""BASELINE config 3 parity suite in ONE process.

Runs every baseline selector with identical seeds through the same JAX
runtime (one startup, one device lease — the per-method-subprocess variant
pays a multi-minute device-lease handoff per method on tunneled dev chips),
writes one JSONL per method, and renders the MAP-vs-rounds comparison plot.

Usage: python scripts/parity_suite.py [out_dir]    (default out/parity)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = ["uncertainty_sampling", "borderline_sampling", "variance_sampling",
           "random", "ital"]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "out/parity"
    os.makedirs(out, exist_ok=True)

    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "parity_suite.ini")
    logs = []
    for m in METHODS:
        log = os.path.join(out, f"{m}.jsonl")
        if os.path.exists(log):
            os.remove(log)  # JsonlLogger appends; stale rounds skew the plot
        print(f"== {m}", flush=True)
        cfg = load_config(cfg_path, (f"EXPERIMENT.method={m}",
                                     f"EXPERIMENT.log_jsonl={log}"))
        res = run_experiment(cfg)
        print(f"   final MAP {res['map'][-1]:.4f}", flush=True)
        logs.append(log)

    from plot_results import main as plot_main

    png = os.path.join(out, "parity.png")
    plot_main([*logs, "-o", png, "--title", "Baseline parity suite (digits)"])
    print(f"wrote {png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
