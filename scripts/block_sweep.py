#!/usr/bin/env python
"""Candidate-streaming block-width sweep at the production n_qmc (chip study).

`block=1024` was profile-tuned at n_qmc=128 (docs/PROFILE.md section 5),
where larger blocks spill the QMC working set out of VMEM.  The round-4
production config scans the base stage at n_qmc=32 — a 4x smaller per-block
working set — so larger blocks fit the same VMEM budget and cut the
``lax.map`` sequentialism (a pool-4096 scan at block=1024 is 4 sequential
block steps; at block=4096 it is one parallel call).  Selection values are
block-invariant to ~1 ULP (tests/test_ital.py::test_block_size_is_value_
invariant), so this is purely a locality measurement.

Measures the pipeline-slope selection cost on the bench workload of record
(25k, b=4) for block in {512, 1024, 2048, 4096} x {production pool config,
full-scan two-stage}.  Writes results/block_sweep.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (workload of record)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "block_sweep.json")
BLOCKS = (512, 1024, 2048, 4096)


def main() -> int:
    import jax

    from ital_tpu.select.ital import select_ital
    from scripts.timing_protocol import measure_select

    rng = np.random.default_rng(7)
    ds = bench._corpus()
    idx, ys = bench._labeled_history(ds, rng)
    state = bench.build_state(ds, idx, ys)
    params = bench.bench_params()

    report = {
        "platform": jax.devices()[0].platform,
        "workload": "bench state of record (25k, b=4)",
        "protocol": "pipeline slope; first_call_s separate",
        "configs": {},
    }
    for tag, extra in (
        ("pool4096_refine", dict(bench.select_kwargs(), pool_size=4096)),
        ("fullscan_refine", bench.select_kwargs()),
    ):
        rows = {}
        for blk in BLOCKS:
            fn = jax.jit(lambda st, key, kw=dict(extra, block=blk):
                         select_ital(st, bench.BATCH, key, params, **kw))
            first_s, slope = measure_select(fn, state)
            rows[str(blk)] = {"slope_ms": round(slope, 3),
                              "first_call_s": round(first_s, 2)}
            print(f"{tag} block={blk}: {slope:.3f} ms (first {first_s:.1f}s)",
                  flush=True)
        report["configs"][tag] = rows
        with open(OUT, "w") as fh:
            json.dump(report, fh, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
