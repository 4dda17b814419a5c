#!/usr/bin/env python
"""Explain the 100k-corpus round cost (VERDICT r2, next-round item 3).

Round 2 recorded 953.9 ms/round for config 5 at 100k x 512 on a 1-device
mesh — 136x the 25k cost for 4x the corpus — with no profile at that scale.
This script measures, on the real chip:

1. **Pipelined selection slope** at 100k (the RTT-cancelling protocol of
   scripts/profile_selection.py) — the true per-round device+dispatch cost.
2. **First-call vs steady-state** of the sharded round (the hypothesis: the
   recorded 3-round mean folded one-time corpus transfer/warmup into every
   round: one ~2.8 s first call + ~30 ms warm rounds averages to ~950 ms).
3. **Candidate block-size sweep** (512/1024/2048) at 100k — is the
   25k-profile-tuned block=1024 still right at 4x the rows?
4. **xplane device time** for the steady-state round (ground truth).

Writes results/scale100k_profile.json; summarized in docs/PROFILE.md section 6.
Run on the real TPU (plain ``python``, not pytest).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_selection import _device_ms_from_trace  # noqa: E402

BATCH, N_QMC, CAP = 4, 128, 64
LS, VAR, NOISE = 50.0, 1.0, 0.1
N, DIM = 100_000, 512


def _setup_state():
    import jax.numpy as jnp

    from ital_tpu.data.datasets import corpus100k
    from ital_tpu.models import gp as gp_mod

    ds = corpus100k(n=N, dim=DIM)
    rng = np.random.default_rng(7)
    q = int(rng.integers(0, ds.n))
    cls = int(ds.labels[q])
    idx = [q] + [int(i) for i in rng.permutation(ds.n)[: 5 * BATCH]]
    ys = [1.0] + [1.0 if ds.relevance[i, cls] else -1.0 for i in idx[1:]]
    state = gp_mod.gp_init(jnp.asarray(ds.x), LS, VAR, NOISE, CAP)
    k = len(idx)
    state = gp_mod.gp_fit(
        state.replace(
            idx=state.idx.at[:k].set(jnp.asarray(idx, jnp.int32)),
            y=state.y.at[:k].set(jnp.asarray(ys, jnp.float32)),
            valid=state.valid.at[:k].set(True),
            count=jnp.asarray(k, jnp.int32),
        )
    )
    return ds, state, cls


from scripts.timing_protocol import measure_select, pipeline_slope_ms


def main() -> int:
    global jax
    import jax
    import jax.numpy as jnp

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import mi_scores_from_moments, select_ital

    report = {"platform": jax.devices()[0].platform, "n": N, "dim": DIM}

    ds, state, cls = _setup_state()
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )

    # --- 1. selection pipeline slope at 100k (block=1024 production path) ---
    select = jax.jit(
        lambda s, key: select_ital(s, BATCH, key, params, n_qmc=N_QMC)
    )
    first_call_s, slope = measure_select(select, state)
    key0 = jax.random.PRNGKey(1)
    report["select_first_call_s"] = round(first_call_s, 2)
    report["select_pipeline_slope_ms"] = round(slope, 2)

    # --- 2. sharded round (the config-5 code path), first vs steady ---
    from ital_tpu.parallel import make_mesh, shard_state
    from ital_tpu.parallel.sharded import make_masks, make_sharded_round
    from ital_tpu.models import gp as gp_mod

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev)
    round_fn = make_sharded_round(
        mesh, strategy="ital", batch_size=BATCH, n_qmc=N_QMC, recall_ks=(10, 50)
    )
    relevant = jnp.asarray(ds.relevance[:, cls])
    sel_forbid, ap_exclude = make_masks(ds.n, ds.n, int(np.asarray(state.idx)[0]))
    st = shard_state(state, mesh)
    per_round = []
    for rnd in range(6):
        t0 = time.perf_counter()
        st, batch, ap, recalls = round_fn(
            st, jax.random.fold_in(jax.random.PRNGKey(2), rnd),
            relevant, sel_forbid, ap_exclude, params,
        )
        ap.block_until_ready()
        np.asarray(ap)  # force a real fetch (block_until_ready unreliable here)
        per_round.append(round(1e3 * (time.perf_counter() - t0), 1))
    report["sharded_round_ms"] = {
        "mesh_devices": n_dev,
        "per_round": per_round,
        "first": per_round[0],
        "steady_median": float(np.median(per_round[1:])),
        "round2_recorded_mean": 953.88,
    }

    # --- 3. candidate block-size sweep at 100k -----------------------------
    from ital_tpu.models.gp import gp_posterior_cov_columns, gp_predict_full

    sweep = {}
    for block in (512, 1024, 2048, 4096):
        t = 1
        bsel = state.idx[:1]

        def scores_fn(s, key, _block=block):
            mu_b = s.mu[bsel]
            _, cov_bb = gp_predict_full(s, bsel)
            cov_bb = cov_bb + params.jitter * jnp.eye(t, dtype=cov_bb.dtype)
            cross = gp_posterior_cov_columns(s, bsel)
            return mi_scores_from_moments(
                s.mu, s.sig2 + params.jitter, cross, mu_b, cov_bb, params,
                t=t, n_qmc=N_QMC, block=_block,
            ) + 0.0 * jax.random.uniform(key, ())

        fn = jax.jit(scores_fn)
        np.asarray(fn(state, jax.random.PRNGKey(0)))  # compile
        sweep[str(block)] = round(pipeline_slope_ms(
            fn, lambda r: (state, jax.random.fold_in(key0, r))
        ), 2)
    report["mi_scan_block_sweep_ms"] = sweep

    # --- 4. device time via xplane for steady-state rounds ------------------
    trace_dir = "/tmp/ital_tpu_profile_100k"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    out = None
    for r in range(3):
        out = select(state, jax.random.fold_in(jax.random.PRNGKey(5), r))
    np.asarray(out)
    jax.profiler.stop_trace()
    report["profiler"] = _device_ms_from_trace(trace_dir)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "scale100k_profile.json",
    )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
