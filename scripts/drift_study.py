#!/usr/bin/env python
"""Long-horizon f32 drift of the incremental Cholesky append (VERDICT r3 item 4).

SURVEY.md section 7 hard part 3 asks how the f32 whitened-state design holds
up against the reference's f64 refits.  Short sessions are pinned by oracle
parity tests (<= 10 rounds, cap <= 512); this script measures the regime
``parallel/bigcap.py`` exists for: a cap-1024 session run for hundreds of
rounds, where the per-round ``gp_update`` block append (ops/chol.py) has
hundreds of chances to accumulate error.

Protocol: one session on the MIRFLICKR-scale surrogate (25k x 512), batch 4,
``--rounds`` (default 250) rounds of uncertainty selection + noiseless
feedback.  Every ``--every`` (default 20) rounds, from the SAME label
buffers:

  * ``inc``   — the incrementally-appended posterior (production path),
  * ``refit`` — ``gp_fit`` from scratch in f32 (what a re-factorization
    policy would produce),
  * ``oracle``— dense f64 NumPy posterior (ground truth),

and record ||mu_inc - mu_oracle||_inf, ||sig2_inc - sig2_oracle||_inf, the
same for refit, and the AP each mean induces.  The verdict of the study —
does the append need periodic re-factorization? — goes to
docs/ARCHITECTURE.md ("Long-horizon drift").

Writes results/drift_study.json.  Run on the real TPU (or CPU: ~same f32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
CAP = 1024
LS, VAR, NOISE = 50.0, 1.0, 0.1
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def oracle_posterior(x64, idx, y, valid, count, block=4096):
    """Dense f64 posterior (mu, sig2) from the padded label buffers.

    Same masking semantics as ``gp_fit`` (inert slots absent), dense LAPACK
    solves, never materializing more than (active, block) of the cross
    kernel.  This is the reference's computational shape (per-round f64
    refit) without OracleGP's N x N precompute (5 GB at 25k).
    """
    from scipy.linalg import cho_factor, cho_solve, solve_triangular

    act = (np.arange(idx.shape[0]) < count) & valid
    li = idx[act]
    xl = x64[li]
    yl = y[act].astype(np.float64)

    def rbf(a, b):
        d2 = (
            np.sum(a * a, axis=1)[:, None]
            + np.sum(b * b, axis=1)[None, :]
            - 2.0 * a @ b.T
        )
        return VAR * np.exp(-np.maximum(d2, 0.0) / (2.0 * LS * LS))

    k_ll = rbf(xl, xl) + NOISE * np.eye(xl.shape[0])
    cho = cho_factor(k_ll, lower=True)
    alpha = cho_solve(cho, yl)
    n = x64.shape[0]
    mu = np.empty(n)
    sig2 = np.empty(n)
    for s in range(0, n, block):
        kb = rbf(xl, x64[s : s + block])  # (active, nb)
        mu[s : s + block] = kb.T @ alpha
        v = solve_triangular(cho[0], kb, lower=True)
        sig2[s : s + block] = VAR - np.sum(v * v, axis=0)
    return mu, np.maximum(sig2, 0.0)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=250)
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noisy", action="store_true",
                    help="lp=0.8/mp=0.05 user (AP stays un-saturated, so the "
                         "ranking-effect columns are informative)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (same f32 math; never "
                         "competes for the chip lease)")
    ap.add_argument("--matmul-precision", default="",
                    choices=("", "default", "high", "highest"),
                    help="force the XLA matmul precision (the GP."
                         "matmul_precision knob): on TPU, 'highest' should "
                         "collapse the measured 6e-2 bf16 reading back to "
                         "the ~4e-5 exact-f32 floor — the one-command "
                         "verification of ARCHITECTURE 'Long-horizon "
                         "drift''s attribution; suffixes the output file")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    import jax.numpy as jnp

    from ital_tpu.data.datasets import mirflickr
    from ital_tpu.data.user import simulate_feedback
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.base import StrategyParams, get_strategy
    from ital_tpu.utils.metrics import average_precision

    assert 1 + args.rounds * BATCH <= CAP, "cap cannot hold the session"
    ds = mirflickr()
    x64 = np.asarray(ds.x, np.float64)
    rng = np.random.default_rng(args.seed)
    q = int(rng.integers(0, ds.n))
    cls = int(np.argmax(ds.relevance[q])) if ds.relevance[q].any() else 0
    relevant = jnp.asarray(ds.relevance[:, cls])
    exclude = jnp.zeros((ds.n,), bool).at[q].set(True)

    state = gp_mod.gp_set_query(
        gp_mod.gp_init(jnp.asarray(ds.x), LS, VAR, NOISE, CAP), jnp.asarray(q)
    )
    lp, mp = (0.8, 0.05) if args.noisy else (1.0, 0.0)
    params = StrategyParams(
        label_prob=jnp.asarray(lp), mistake_prob=jnp.asarray(mp)
    )
    select = get_strategy("uncertainty_sampling")

    @jax.jit
    def round_step(st, key):
        k_sel, k_user = jax.random.split(key)
        batch = select(st, BATCH, k_sel, params)
        yb, valid = simulate_feedback(
            k_user, batch, relevant, params.label_prob, params.mistake_prob
        )
        return gp_mod.gp_update(st, batch, yb, valid)

    refit = jax.jit(gp_mod.gp_fit)
    key = jax.random.PRNGKey(args.seed)
    rows = []
    t0 = time.time()
    for rnd in range(1, args.rounds + 1):
        state = round_step(state, jax.random.fold_in(key, rnd))
        if rnd % args.every and rnd != args.rounds:
            continue
        idx = np.asarray(state.idx)
        yv = np.asarray(state.y)
        valid = np.asarray(state.valid)
        count = int(np.asarray(state.count))
        mu_inc = np.asarray(state.mu, np.float64)
        s2_inc = np.asarray(state.sig2, np.float64)
        st_re = refit(state)
        mu_re = np.asarray(st_re.mu, np.float64)
        s2_re = np.asarray(st_re.sig2, np.float64)
        mu_or, s2_or = oracle_posterior(x64, idx, yv, valid, count)

        # Ranking effect beyond (possibly saturated) AP: fraction of the
        # oracle's top-100 unlabeled items that each f32 ranking reproduces.
        labeled_rows = np.zeros(ds.n, bool)
        labeled_rows[idx[(np.arange(CAP) < count) & valid]] = True

        def top100(mu):
            m = np.where(labeled_rows, -np.inf, mu)
            return set(np.argsort(-m)[:100].tolist())

        t_or = top100(mu_or)
        row = {
            "top100_overlap_inc": len(top100(mu_inc) & t_or) / 100.0,
            "top100_overlap_refit": len(top100(mu_re) & t_or) / 100.0,
        }
        row |= {
            "round": rnd,
            "labeled": count,
            "mu_inf_inc": float(np.max(np.abs(mu_inc - mu_or))),
            "mu_inf_refit": float(np.max(np.abs(mu_re - mu_or))),
            "sig2_inf_inc": float(np.max(np.abs(s2_inc - s2_or))),
            "sig2_inf_refit": float(np.max(np.abs(s2_re - s2_or))),
            "mu_inf_inc_vs_refit": float(np.max(np.abs(mu_inc - mu_re))),
            "ap_inc": float(average_precision(jnp.asarray(mu_inc.astype(np.float32)), relevant, exclude)),
            "ap_refit": float(average_precision(jnp.asarray(mu_re.astype(np.float32)), relevant, exclude)),
            "ap_oracle": float(average_precision(jnp.asarray(mu_or.astype(np.float32)), relevant, exclude)),
        }
        rows.append(row)
        print(f"round {rnd:4d} labeled {count:4d}  "
              f"|dmu|inf inc {row['mu_inf_inc']:.2e} refit "
              f"{row['mu_inf_refit']:.2e}  ap d "
              f"{row['ap_inc'] - row['ap_oracle']:+.2e}", flush=True)

    out = {
        "corpus": ds.name, "n": ds.n, "dim": int(ds.x.shape[1]),
        "cap": CAP, "batch": BATCH, "rounds": args.rounds,
        "seed": args.seed, "strategy": "uncertainty_sampling",
        "user": {"label_prob": lp, "mistake_prob": mp},
        "platform": jax.devices()[0].platform,
        "matmul_precision": args.matmul_precision or "backend default",
        "hyper": {"length_scale": LS, "var": VAR, "noise": NOISE},
        "wall_s": round(time.time() - t0, 1),
        "rows": rows,
    }
    name = "drift_study_noisy.json" if args.noisy else "drift_study.json"
    if args.matmul_precision:
        name = name.replace(".json", f"_{args.matmul_precision}.json")
    path = os.path.join(REPO, "results", name)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
