#!/usr/bin/env python
"""Measure the fixed-lattice QMC error of the MI pipeline — where is the m wall?

VERDICT r3 weak items 5/6: ``MAX_MI_BATCH = 6`` was a guard with no
measurement behind it, and the pipeline had no internal error estimate (the
reference's Fortran MVNDST returns one and adapts).  This script produces
both measurements:

1. **Self-estimate validity** — the Cranley-Patterson across-shift standard
   error (``ops.mvn.orthant_probs_with_error`` / ``select.ital.mi_with_error``)
   is compared against the TRUE error (vs scipy's adaptive MVNDST and the
   dense-oracle MI) on random posterior-shaped problems.  Done = the internal
   estimate tracks the true error, so production can bound its own QMC noise
   without an oracle.
2. **The m / n_qmc accuracy table** — true MI error of the production
   single-lattice estimator for m = 2..8 x n_qmc = {64, 128, 256, 512}.
   This is the measurement behind ``MAX_MI_BATCH`` (docs/PROFILE.md
   section 7).

Runs on CPU (forced — never competes for the TPU lease; the QMC chain is
identical math on either backend).  Writes results/qmc_error_study.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MS = (2, 3, 4, 5, 6, 7, 8)
NQMCS = (64, 128, 256, 512)
N_PROBLEMS = 16
N_SHIFTS = 8
LABEL_PROB, MISTAKE_PROB = 0.8, 0.05
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def random_problem(rng, m):
    """Posterior-shaped (mu, cov): correlated, variances ~U(0.2, 1), means
    within a couple of posterior stds of the decision boundary (the regime MI
    selection actually scores)."""
    a = rng.normal(size=(m, m + 2)) / np.sqrt(m + 2)
    cov = a @ a.T
    d = np.sqrt(np.diag(cov))
    scale = rng.uniform(0.45, 1.0, size=m) / d
    cov = cov * np.outer(scale, scale) + 1e-6 * np.eye(m)
    mu = rng.normal(size=m) * 0.7
    return mu, cov


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ital_tpu.ops.mvn import (
        orthant_probs_all_configs_tree,
        orthant_probs_with_error,
        small_cholesky,
    )
    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import mi_with_error, sign_table
    from tests.oracle.numpy_oracle import mutual_information, mvn_orthant

    params = StrategyParams(
        label_prob=jnp.asarray(LABEL_PROB), mistake_prob=jnp.asarray(MISTAKE_PROB)
    )
    rng = np.random.default_rng(17)
    report: dict = {
        "n_problems": N_PROBLEMS, "n_shifts": N_SHIFTS,
        "label_prob": LABEL_PROB, "mistake_prob": MISTAKE_PROB,
        "by_m": {},
    }
    t00 = time.time()
    for m in MS:
        probs_true, mi_true, problems = [], [], []
        for _ in range(N_PROBLEMS):
            mu, cov = random_problem(rng, m)
            problems.append((mu, cov))
            st = np.asarray(sign_table(m), np.float64)
            p = np.maximum([mvn_orthant(mu, cov, s) for s in st], 0.0)
            probs_true.append(p / max(p.sum(), 1e-12))
            mi_true.append(
                mutual_information(mu, cov, LABEL_PROB, MISTAKE_PROB)
            )
        row: dict = {"mi_scale": float(np.mean(mi_true))}
        for n_qmc in NQMCS:
            orth_err, orth_self, orth_multi = [], [], []
            mi_err, mi_self, mi_multi_err = [], [], []
            for (mu, cov), pt, mt in zip(problems, probs_true, mi_true):
                muj = jnp.asarray(mu, jnp.float32)
                chol = small_cholesky(jnp.asarray(cov, jnp.float32))
                # Production single-lattice estimate.
                p1 = np.asarray(
                    orthant_probs_all_configs_tree(muj, chol, n_points=n_qmc),
                    np.float64,
                )
                orth_err.append(np.max(np.abs(p1 - pt)))
                # Multi-shift mean + internal error estimate.
                pm, pe = orthant_probs_with_error(
                    muj, chol, n_points=n_qmc, n_shifts=N_SHIFTS
                )
                pm, pe = np.asarray(pm, np.float64), np.asarray(pe, np.float64)
                orth_multi.append(np.max(np.abs(pm - pt)))
                orth_self.append(np.max(pe))
                mi1, mie = mi_with_error(
                    muj, chol, params, n_qmc=n_qmc, n_shifts=N_SHIFTS
                )
                mi_multi_err.append(abs(float(mi1) - mt))
                mi_self.append(float(mie))
                # Single-lattice MI — the production estimator.
                from ital_tpu.select.ital import (
                    feedback_given_relevance,
                    mutual_information_from_relevance,
                )

                mi_single = float(
                    mutual_information_from_relevance(
                        orthant_probs_all_configs_tree(
                            muj, chol, n_points=n_qmc
                        ),
                        feedback_given_relevance(
                            m, params.label_prob, params.mistake_prob
                        ),
                    )
                )
                mi_err.append(abs(mi_single - mt))
            row[str(n_qmc)] = {
                "orthant_max_abs_err": round(float(np.max(orth_err)), 6),
                "orthant_mean_abs_err": round(float(np.mean(orth_err)), 6),
                "orthant_multishift_max_err": round(float(np.max(orth_multi)), 6),
                "orthant_self_estimate_mean": round(float(np.mean(orth_self)), 6),
                "mi_max_abs_err": round(float(np.max(mi_err)), 6),
                "mi_mean_abs_err": round(float(np.mean(mi_err)), 6),
                "mi_multishift_max_err": round(float(np.max(mi_multi_err)), 6),
                "mi_self_estimate_mean": round(float(np.mean(mi_self)), 6),
            }
            print(f"m={m} n_qmc={n_qmc}: MI err mean "
                  f"{row[str(n_qmc)]['mi_mean_abs_err']:.1e} max "
                  f"{row[str(n_qmc)]['mi_max_abs_err']:.1e} "
                  f"(self-est {row[str(n_qmc)]['mi_self_estimate_mean']:.1e}; "
                  f"MI scale {row['mi_scale']:.3f})", flush=True)
        report["by_m"][str(m)] = row
    report["wall_s"] = round(time.time() - t00, 1)
    path = os.path.join(REPO, "results", "qmc_error_study.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
