#!/usr/bin/env python
"""One ITAL session at 1M x 512 on a single chip (VERDICT r3 item 9).

The blockwise design's scale claim, demonstrated: the RBF kernel never
materializes (``ops/blocking.py`` streams candidate blocks; ``gp_fit``'s
(cap, N) cross-kernel is the largest transient), so HBM holds

    x       1M x 512 f32   = 2.05 GB
    v       cap x 1M f32   = cap/256 GB  (4.1 GB at cap=1024)
    k_l,all cap x 1M f32     transient during fit/update (peak overlaps v)
    mu/sig2 1M f32         = 8 MB

— a 1M-row interactive session on one v5e chip.  Measures, with the
RTT-cancelling pipeline-slope protocol (docs/PROFILE.md section 1):

  * full-scan ITAL selection ms/round,
  * compact-pool (4096) selection ms/round — the tractability knob at the
    scale it exists for,
  * full interactive rounds (select + update + rank + AP), first vs steady,
  * device memory in use.

Writes results/scale1m.json.  Run on the real TPU; the first compiles go to
the remote compile service (minutes, once per cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM = 1_000_000, 512
BATCH, N_QMC, CAP = 4, 128, 64  # cap=64: session memory; scale is in x/v
POOL = 4096
LS, VAR, NOISE = 50.0, 1.0, 0.1
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


from scripts.timing_protocol import measure_select


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ital_tpu.data.datasets import corpus100k
    from ital_tpu.data.user import simulate_feedback
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital
    from ital_tpu.utils.logging import device_mem_mb
    from ital_tpu.utils.metrics import average_precision

    report = {"platform": jax.devices()[0].platform, "n": N, "dim": DIM,
              "cap": CAP, "batch": BATCH, "pool": POOL}
    print(f"== building {N} x {DIM} corpus on host", flush=True)
    ds = corpus100k(n=N, dim=DIM)  # same synthetic family as config 5
    rng = np.random.default_rng(7)
    q = int(rng.integers(0, ds.n))
    cls = int(ds.labels[q])
    relevant = jnp.asarray(ds.relevance[:, cls])
    exclude = jnp.zeros((ds.n,), bool).at[q].set(True)

    t0 = time.perf_counter()
    state = gp_mod.gp_init(jnp.asarray(ds.x), LS, VAR, NOISE, CAP)
    state = gp_mod.gp_set_query(state, jnp.asarray(q))
    np.asarray(state.mu[:1])
    report["init_plus_query_s"] = round(time.perf_counter() - t0, 1)
    report["device_mem_mb_after_fit"] = round(device_mem_mb(), 1)
    print(f"   corpus resident; device mem "
          f"{report['device_mem_mb_after_fit']} MB", flush=True)

    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )

    # Warm the posterior so MI ties don't depend on ULP noise (CLAUDE.md).
    warm = rng.permutation(ds.n)[:8].astype(np.int32)
    ys = np.where(ds.relevance[warm, cls], 1.0, -1.0).astype(np.float32)
    state = gp_mod.gp_update(
        state, jnp.asarray(warm), jnp.asarray(ys), jnp.ones(8, bool)
    )

    for label, pool in (("select_full", 0), ("select_pool4096", POOL)):
        select = jax.jit(
            lambda s, key, _p=pool: select_ital(
                s, BATCH, key, params, n_qmc=N_QMC, pool_size=_p
            )
        )
        first_s, slope = measure_select(select, state)
        report[label] = {
            "first_call_s": round(first_s, 1),
            "ms_per_round": round(slope, 2),
        }
        print(f"   {label}: {report[label]['ms_per_round']} ms/round "
              f"(first {first_s:.1f}s)", flush=True)

    # Full interactive rounds: select(pool) -> user -> update -> rank -> AP.
    @jax.jit
    def round_step(st, key):
        k_sel, k_user = jax.random.split(key)
        batch = select_ital(st, BATCH, k_sel, params, n_qmc=N_QMC,
                            pool_size=POOL)
        y, valid = simulate_feedback(
            k_user, batch, relevant, params.label_prob, params.mistake_prob
        )
        st = gp_mod.gp_update(st, batch, y, valid)
        ap = average_precision(st.mu, relevant, exclude)
        return st, ap

    # First round alone (compile/cache-load), fetched; then the steady rounds
    # dispatch back-to-back with ONE final fetch so the ~30 ms tunnel RTT
    # amortizes (CLAUDE.md timing protocol — per-round host syncs inflated
    # the previous record's steady state ~2x).  The per-round aps are device
    # arrays collected during the timed window and fetched afterwards.
    key2 = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    st, ap0 = round_step(state, jax.random.fold_in(key2, 0))
    first_ms = 1e3 * (time.perf_counter() - t0)
    ap0 = float(np.asarray(ap0))
    steady_rounds = 7
    aps_dev = []
    t0 = time.perf_counter()
    for rnd in range(1, 1 + steady_rounds):
        st, ap = round_step(st, jax.random.fold_in(key2, rnd))
        aps_dev.append(ap)
    np.asarray(aps_dev[-1])  # the one sync inside the timed window
    steady_ms = 1e3 * (time.perf_counter() - t0) / steady_rounds
    report["full_round_ms"] = {
        "first": round(first_ms, 1),
        "steady_amortized": round(steady_ms, 2),
        "steady_rounds": steady_rounds,
        "protocol": "async dispatch, one fetch (CLAUDE.md)",
    }
    report["ap_curve"] = [round(ap0, 4)] + [
        round(float(np.asarray(a)), 4) for a in aps_dev
    ]
    report["device_mem_mb_peak"] = round(device_mem_mb(), 1)
    print(f"   full rounds: first {report['full_round_ms']['first']} ms, "
          f"steady {report['full_round_ms']['steady_amortized']} ms "
          f"(amortized over {steady_rounds}); device mem "
          f"{report['device_mem_mb_peak']} MB", flush=True)

    out = os.path.join(REPO, "results", "scale1m.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
