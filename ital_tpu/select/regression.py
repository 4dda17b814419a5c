"""ITAL for active GP *regression* — the reference's regression variant.

Reference parity: ``italia/regression.py`` / ``italia/regression_base.py``
(SURVEY.md C7, confidence [L] — the exact reference shape could not be verified
against the empty mount; this implements the standard information-theoretic
criterion for GP regression with the same session/strategy API as the
classification path).

For continuous targets observed through Gaussian noise sn^2, the mutual
information between the latent function at a candidate batch B and the noisy
observations there is closed form — no orthant integrals needed:

    I(f_B; y_B | A) = 1/2 log det( I + Sigma_B / sn^2 )

Greedy maximization picks, at each step, the candidate with the largest
*conditional* variance given the batch chosen so far:

    score(c | B) = 1/2 log(1 + (sig2_c - k_cB Sigma_BB^-1 k_Bc) / sn^2)

which is exactly the greedy determinant-maximization update (each step adds the
Schur complement's log term).  The user model for regression is "reports y with
probability label_prob, with observation noise sn^2" — skips are handled by the
session's inert slots like in classification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ital_tpu.models.gp import GPState, gp_posterior_cov_columns, gp_predict_full
from ital_tpu.select.base import StrategyParams, greedy_argmax_batch, register


@register("ital_regression")
def select_ital_regression(
    state: GPState, batch_size: int, key: jax.Array, params: StrategyParams
) -> jax.Array:
    """Greedy batch maximizing I(f_B; y_B | A) = 1/2 log det(I + Sigma_B / sn^2)."""
    del key
    noise = state.hyper.noise

    def score(batch, t):
        if t == 0:
            cond_var = state.sig2
        else:
            bsel = batch[:t]
            _, cov_bb = gp_predict_full(state, bsel)
            cov_bb = cov_bb + (noise + params.jitter) * jnp.eye(t, dtype=cov_bb.dtype)
            cross = gp_posterior_cov_columns(state, bsel)  # (N, t)
            # Schur complement per candidate: sig2_c - k_cB (Sigma_BB+sn^2 I)^-1 k_Bc
            chol = jnp.linalg.cholesky(cov_bb)
            w = jax.lax.linalg.triangular_solve(
                chol, cross.T, left_side=True, lower=True
            )  # (t, N)
            cond_var = jnp.maximum(state.sig2 - jnp.sum(w * w, axis=0), 1e-10)
        return 0.5 * jnp.log1p(cond_var / noise)

    return greedy_argmax_batch(score, state, batch_size)
