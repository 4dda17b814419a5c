#!/usr/bin/env python
"""One-time FULL-FIDELITY CPU oracle round (VERDICT r1 item 7 / weak 2).

Runs the dense f64 NumPy/SciPy oracle (tests/oracle/numpy_oracle.py — the
reference's computational shape: full N x N kernel, per-candidate Python loop
over scipy's Fortran MVNDST) for ONE complete greedy ITAL selection round on
the FULL MIRFLICKR-25K-scale corpus with ALL candidates scored at every greedy
step — no subsampling, no extrapolation.  Uses the exact same labeled history
and hyperparameters as bench.py (seed 7), so the result pins bench.py's
extrapolated CPU denominator against a measured number.

Also measures the ACTUAL multiprocessing.Pool speedup on this host (bench.py
credits an ideal 16-way pool; this records what a pool really delivers here).

Writes results/cpu_full_round.json.  Expected runtime: ~30-40 min single-core.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle.numpy_oracle import OracleGP, mutual_information  # noqa: E402

BATCH = 4
LS, VAR, NOISE = 50.0, 1.0, 0.1
LABEL_PROB, MISTAKE_PROB = 0.8, 0.05

_GP = None  # worker-global (fork inherits)


def _score_one(args):
    batch, c = args
    sel = batch + [c]
    mu = _GP.predict_mean(sel)
    cov = _GP.predict_cov(sel) + 1e-6 * np.eye(len(sel))
    return mutual_information(mu, cov, LABEL_PROB, MISTAKE_PROB)


def main() -> int:
    global _GP
    from ital_tpu.data.datasets import mirflickr

    ds = mirflickr()
    rng = np.random.default_rng(7)  # same history derivation as bench.py
    q = int(rng.integers(0, ds.n))
    cls = int(np.argmax(ds.relevance[q])) if ds.relevance[q].any() else 0
    idx = [q] + [int(i) for i in rng.permutation(ds.n)[: 5 * BATCH]]
    ys = [1.0] + [1.0 if ds.relevance[i, cls] else -1.0 for i in idx[1:]]

    t0 = time.perf_counter()
    gp = OracleGP(ds.x, LS, VAR, NOISE)  # full dense N x N f64 kernel build
    kernel_s = time.perf_counter() - t0
    gp.fit(idx, ys)
    _GP = gp

    labeled = set(idx)
    candidates = [c for c in range(ds.n) if c not in labeled]

    # --- full greedy round, single process, ALL candidates per step ---
    batch: list[int] = []
    step_s = []
    for t in range(BATCH):
        t0 = time.perf_counter()
        best, best_score = None, -np.inf
        for c in candidates:
            if c in batch:
                continue
            score = _score_one((batch, c))
            if score > best_score:
                best, best_score = c, score
        batch.append(best)
        step_s.append(time.perf_counter() - t0)
        print(f"# step {t}: {step_s[-1]:.1f} s, picked {best}", flush=True)

    total_s = float(sum(step_s))

    # --- measured Pool scaling on THIS host (subset; same work per task) ---
    n_pool_sample = 256
    sub = candidates[:n_pool_sample]
    tasks = [(batch[:3], c) for c in sub]
    t0 = time.perf_counter()
    for task in tasks:
        _score_one(task)
    serial_s = time.perf_counter() - t0
    nproc = os.cpu_count() or 1
    # fork explicitly: workers read the module-global _GP, which spawn/
    # forkserver start methods (macOS default, py>=3.14 Linux) don't inherit.
    with mp.get_context("fork").Pool(nproc) as pool:
        t0 = time.perf_counter()
        pool.map(_score_one, tasks, chunksize=16)
        pool_s = time.perf_counter() - t0
    measured_speedup = serial_s / pool_s if pool_s > 0 else 1.0

    out = {
        "corpus": {"name": ds.name, "n": int(ds.n), "dim": int(ds.x.shape[1]),
                   "synthetic": bool(getattr(ds, "synthetic", False))},
        "labeled_history": len(idx),
        "batch_size": BATCH,
        "kernel_build_s": round(kernel_s, 2),
        "step_s": [round(s, 2) for s in step_s],
        "full_round_single_core_s": round(total_s, 2),
        "selected_batch": [int(b) for b in batch],
        "pool": {"nproc": nproc, "serial_s": round(serial_s, 3),
                 "pool_s": round(pool_s, 3),
                 "measured_speedup": round(measured_speedup, 2)},
        "ideal_16way_round_s": round(total_s / 16, 2),
        "note": "dense f64 oracle, ALL candidates each greedy step, no "
                "extrapolation; bench.py's per-candidate extrapolation is "
                "cross-checked against full_round_single_core_s",
    }
    os.makedirs("results", exist_ok=True)
    with open("results/cpu_full_round.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
