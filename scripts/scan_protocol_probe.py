#!/usr/bin/env python
"""Validate bench.py's scanned-rounds protocol on the real chip (one lease).

Four measurements on the exact bench workload — state, selection config, and
scan body are all imported FROM bench.py (``build_state`` / ``bench_params``
/ ``select_kwargs`` / ``make_scan_run``), so the probe can never drift into
validating a different workload than the bench measures:

1. ``det_per_call``   — per-call pipeline slope of the DETERMINISTIC
                        production selection (the round-4 pre-scan headline
                        protocol).
2. ``keyed_per_call`` — same, with ``qmc_key`` (randomized-QMC lattice
                        shifts).  keyed - det isolates what tracing the
                        lattice shift costs on this backend (CPU measured
                        ~+30%; the direction is conservative — the scanned
                        bench can only overstate per-round cost).
3. ``scan.keyed_reps16`` / ``scan.keyed_reps64`` — bench.py's actual
                        protocol: one lax.scan of ``reps`` keyed rounds, ONE
                        dispatch + ONE fetch, ``per_round_ms`` = total/reps.
                        reps-independence of the per-round figure is the
                        protocol working as designed (device time + RTT/reps).
4. ``scan.det_reps16`` / ``scan.det_reps64`` — the HOISTING EVIDENCE: the
                        same scan WITHOUT qmc_key is loop-invariant (the
                        deterministic lattice ignores the round key over a
                        frozen state), so XLA hoists the whole selection out
                        of the while loop and ``total_s`` goes flat in reps
                        (``checks.det_total_reps_ratio`` ~1 instead of ~4).
                        Recorded so the guard in bench.py cites a measured
                        TPU number, not only the CPU one.

Writes results/scan_protocol_probe.json.  Runs on whatever platform JAX
picks (the axon TPU unless forced); the record carries ``platform`` so
consumers can tell — the CPU-backend record of the same schema is
results/scan_protocol_probe_cpu.json (docs/PROFILE.md section 9).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module: the workload of record)
from scripts.timing_protocol import measure_select  # noqa: E402


def main() -> int:
    import jax

    from ital_tpu.select.ital import select_ital

    rng = np.random.default_rng(7)
    ds = bench._corpus()
    idx, ys = bench._labeled_history(ds, rng)
    state = bench.build_state(ds, idx, ys)
    params = bench.bench_params()
    kw = bench.select_kwargs()
    report = {"platform": jax.devices()[0].platform, "batch": bench.BATCH,
              "config": kw}

    sel_det = jax.jit(lambda st, k_: select_ital(st, bench.BATCH, k_, params,
                                                 **kw))
    sel_key = jax.jit(lambda st, k_: select_ital(st, bench.BATCH, k_, params,
                                                 qmc_key=k_, **kw))
    first, slope = measure_select(sel_det, state)
    report["det_per_call"] = {"first_s": round(first, 3),
                              "slope_ms": round(slope, 3)}
    first, slope = measure_select(sel_key, state)
    report["keyed_per_call"] = {"first_s": round(first, 3),
                                "slope_ms": round(slope, 3)}

    key = jax.random.PRNGKey(0)
    scan = {}
    for keyed in (True, False):
        run = bench.make_scan_run(params, keyed=keyed)
        for reps in (16, 64):
            keys = jax.random.split(key, reps)
            t0 = time.perf_counter()
            np.asarray(run(state, keys))  # compile + sync
            first_s = time.perf_counter() - t0
            trials = []
            for trial in range(3):
                ks = jax.random.split(jax.random.fold_in(key, trial + 1), reps)
                t0 = time.perf_counter()
                out = run(state, ks)
                np.asarray(out)
                trials.append(time.perf_counter() - t0)
            total = float(np.median(trials))
            scan[f"{'keyed' if keyed else 'det'}_reps{reps}"] = {
                "first_s": round(first_s, 3),
                "total_s": round(total, 4),
                "per_round_ms": round(total / reps * 1e3, 3),
            }
    report["scan"] = scan
    # The protocol is sound iff keyed per-round is ~reps-independent AND the
    # det scan's TOTAL is ~flat in reps (hoisted — which is why bench.py must
    # use qmc_key).
    k16, k64 = scan["keyed_reps16"], scan["keyed_reps64"]
    d16, d64 = scan["det_reps16"], scan["det_reps64"]
    report["checks"] = {
        "keyed_per_round_reps_ratio": round(
            k64["per_round_ms"] / max(k16["per_round_ms"], 1e-9), 3),
        "det_total_reps_ratio": round(
            d64["total_s"] / max(d16["total_s"], 1e-9), 3),
    }

    suffix = "" if report["platform"] != "cpu" else "_cpu"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        f"scan_protocol_probe{suffix}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
