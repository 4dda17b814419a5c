#!/usr/bin/env python
"""Selection cost vs MI batch size m — the raised MAX_MI_BATCH=8, timed.

Round 4 raised ``MAX_MI_BATCH`` from 6 to 8 on measured ACCURACY evidence
(scripts/qmc_error_study.py, docs/PROFILE.md section 7: fixed-lattice MI error
< ~1% of the MI scale through m=8), but never recorded what an m=7-8 round
COSTS — the greedy loop is unrolled over m steps and step t scores 2^(t+1)
orthants, so the per-round cost grows ~2^m.  This study times a full greedy
selection at m = 4 / 6 / 8 at MIRFLICKR-25K scale on the real chip for:

- ``full 128``      — single-stage n_qmc=128 full-corpus scan (the BASELINE
                      scenario fidelity);
- ``full 256``      — the n_qmc >= 256 setting PROFILE section 7 recommends
                      at m >= 7;
- ``pool4096 32+top64@512`` — the round-4 production combination.

All rows come from ONE chip process (pipeline-slope protocol,
scripts/timing_protocol.py) so they are mutually comparable.  Writes
results/batch_size_timing.json.  Run: ``python scripts/batch_size_timing.py``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH_SIZES = (4, 6, 8)
# (tag, pool_size, base n_qmc, refine_top, refine_n_qmc)
CONFIGS = (
    ("full 128", 0, 128, 0, 0),
    ("full 256", 0, 256, 0, 0),
    ("pool4096 32+top64@512", 4096, 32, 64, 512),
)

from scripts.timing_protocol import measure_select  # noqa: E402


def _state(ds):
    """The bench workload of record — built THROUGH bench.build_state so these
    rows stay comparable to bench/pool_refine rows if the canonical workload
    ever changes (the drifting-copies failure mode this repo keeps fixing)."""
    import bench

    rng = np.random.default_rng(7)
    idx, ys = bench._labeled_history(ds, rng)
    return bench.build_state(ds, idx, ys)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ital_tpu.data.datasets import mirflickr
    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds = mirflickr()
    state = _state(ds)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    report = {
        "platform": jax.devices()[0].platform,
        "n": ds.n,
        "dim": int(ds.x.shape[1]),
        "protocol": "pipeline slope (12-4)/8, best of 3; first call separate",
        "rows": {},
    }
    for m in BATCH_SIZES:
        rows = {}
        for tag, pool, base, rt, rq in CONFIGS:
            select = jax.jit(
                lambda s, key, _m=m, _p=pool, _b=base, _t=rt, _q=rq: select_ital(
                    s, _m, key, params, n_qmc=_b, pool_size=_p,
                    refine_top=_t, refine_n_qmc=_q or 512,
                )
            )
            first_s, slope = measure_select(select, state)
            rows[tag] = {"ms_per_round": round(slope, 2),
                         "first_call_s": round(first_s, 1)}
            print(f"  m={m} {tag:>24}: {slope:.2f} ms/round "
                  f"(first call {first_s:.1f}s)", flush=True)
        report["rows"][f"m{m}"] = rows
    out = os.path.join(REPO, "results", "batch_size_timing.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
