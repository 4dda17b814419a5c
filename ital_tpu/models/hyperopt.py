"""GP hyperparameter learning by marginal-likelihood ascent.

The reference fixes RBF hyperparameters per dataset (ctor args of
``italia/gp.py :: GaussianProcess``; SURVEY.md C1) — tuning was done offline.
This module adds what the reference never had: **online type-II maximum
likelihood** on the session's own labeled set, differentiating the log
marginal likelihood through the padded Cholesky (autodiff through
``jnp.linalg.cholesky`` is exact and cheap at cap <= a few hundred) and
ascending with Adam in log-parameter space (positivity by construction).

Everything is static-shape and jit-once: the labeled set is the usual padded
(cap,) buffer with an ``active`` mask, inactive slots are identity-padded so
they contribute ``log 1 = 0`` to the log-determinant and zero to the
quadratic form, and the optimization loop is a ``lax.scan``.  Cost per call is
O(steps * cap^3) — microseconds next to one MI scan.

Enable in the harness with ``[GP] learn_every = k`` (re-learn every k feedback
rounds from the labels collected so far, then refit the posterior).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ital_tpu.models.gp import GPHyper
from ital_tpu.ops.chol import padded_cholesky, tri_solve
from ital_tpu.ops.kernels import rbf_kernel

_LOG2PI = 1.8378770664093453


def log_marginal_likelihood(
    xl: jax.Array, y: jax.Array, active: jax.Array, hyper: GPHyper
) -> jax.Array:
    """log p(y | X, theta) of the active labeled slots under the RBF GP.

    Args:
      xl: (cap, D) labeled-slot features (padding rows may be garbage).
      y: (cap,) labels; ignored on inactive slots.
      active: (cap,) bool participation mask.

    Identity padding makes the padded system block-diagonal with an identity
    block on inactive slots, so ``logdet`` and the quadratic form reduce to
    the active principal block exactly.
    """
    y = jnp.where(active, y, 0.0)
    k_ll = rbf_kernel(xl, xl, hyper.length_scale, hyper.var)
    l = padded_cholesky(k_ll, active, hyper.noise)
    alpha = tri_solve(l, y[:, None])[:, 0]  # L^-1 y
    quad = jnp.sum(alpha * alpha)  # y^T K^-1 y
    logdet = 2.0 * jnp.sum(jnp.where(active, jnp.log(jnp.diagonal(l)), 0.0))
    n = jnp.sum(active).astype(y.dtype)
    return -0.5 * (quad + logdet + n * _LOG2PI)


@functools.partial(
    jax.jit,
    static_argnames=("steps", "learn_noise", "lr", "prior_strength",
                     "noise_floor"),
)
def fit_hyperparams(
    xl: jax.Array,
    y: jax.Array,
    active: jax.Array,
    hyper0: GPHyper,
    *,
    steps: int = 50,
    lr: float = 0.05,
    learn_noise: bool = True,
    prior_strength: float = 0.0,
    prior_center: GPHyper | None = None,
    noise_floor: float = 0.0,
) -> GPHyper:
    """Adam ascent of the log marginal likelihood from ``hyper0``.

    Returns new hyperparameters (same dtypes); ``learn_noise=False`` pins the
    observation noise and learns only length_scale/var.  The whole loop is one
    ``lax.scan`` — one compilation, reusable every round of every session.

    ``prior_strength > 0`` switches the objective from type-II ML to
    **MAP type-II**: independent Gaussian priors on the LOG hyperparameters
    (i.e. log-normal priors, sd = 1/sqrt(prior_strength)) centered at
    ``prior_center`` (default: ``hyper0`` — callers that relearn repeatedly
    should pass the SESSION-INITIAL hyperparameters, or the anchor
    random-walks with the estimate).  Motivation, measured: with tens of
    ±1 labels of which ~15% are flips, unregularized type-II ML collapses
    the noise 1.0 → 0.006 (interpolating the flipped labels) and then
    oscillates (docs/NOISE_ANALYSIS.md Finding 4).  The prior does not
    encode the right answer — it removes the degenerate collapse direction
    while leaving the likelihood free to move within a few log-units.

    ``noise_floor > 0`` additionally projects the noise iterate onto
    ``log(noise) >= log(noise_floor)`` after every step (projected ascent) —
    the blunt instrument when only the collapse, not the wander, must be
    prevented.  Both knobs default off; the defaults reproduce plain
    type-II ML exactly.
    """
    import optax

    dt = y.dtype
    theta0 = jnp.stack(
        [
            jnp.log(hyper0.length_scale.astype(jnp.float32)),
            jnp.log(hyper0.var.astype(jnp.float32)),
            jnp.log(hyper0.noise.astype(jnp.float32)),
        ]
    )
    if prior_strength:
        center = prior_center if prior_center is not None else hyper0
        theta_c = jnp.stack(
            [
                jnp.log(center.length_scale.astype(jnp.float32)),
                jnp.log(center.var.astype(jnp.float32)),
                jnp.log(center.noise.astype(jnp.float32)),
            ]
        )
    opt = optax.adam(lr)

    def unpack(theta):
        return GPHyper(
            length_scale=jnp.exp(theta[0]).astype(dt),
            var=jnp.exp(theta[1]).astype(dt),
            noise=jnp.exp(theta[2]).astype(dt),
        )

    def neg_obj(theta):
        neg = -log_marginal_likelihood(xl, y, active, unpack(theta))
        if prior_strength:
            neg = neg + 0.5 * prior_strength * jnp.sum((theta - theta_c) ** 2)
        return neg

    def step(carry, _):
        theta, opt_state = carry
        g = jax.grad(neg_obj)(theta)
        if not learn_noise:
            g = g.at[2].set(0.0)
        updates, opt_state = opt.update(g, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        # Keep parameters in a sane band: ridiculous length-scales / vanishing
        # noise make the Cholesky ill-conditioned mid-ascent.
        theta = jnp.clip(theta, -7.0, 9.0)
        if noise_floor:
            theta = theta.at[2].max(jnp.log(jnp.float32(noise_floor)))
        return (theta, opt_state), None

    (theta, _), _ = jax.lax.scan(
        step, (theta0, opt.init(theta0)), None, length=steps
    )
    h = unpack(theta)
    if not learn_noise:
        h = h.replace(noise=hyper0.noise)  # bit-exact pin (exp/log roundtrips)
    return h
