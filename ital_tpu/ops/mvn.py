"""Multivariate-normal orthant probabilities via Genz's sequentially-conditioned QMC.

Reference parity: the reference's single hottest native call is
``scipy.stats.mvn.mvnun`` — Fortran MVNDST (Genz quasi-Monte-Carlo rectangle
probabilities) — invoked O(candidates x 2^b x greedy-steps) times per feedback
round from ``italia/ital.py`` (SURVEY.md section 2.2 N3).  There is no scipy on
TPU, so this module implements the same algorithm (Genz 1992, "Numerical
computation of multivariate normal probabilities") in pure JAX with **static
shapes** so it vmaps over thousands of candidates and all sign configurations at
once, replacing the reference's per-call Fortran dispatch + multiprocessing fan-out.

Algorithm (m-dimensional rectangle P(a < z < b), z ~ N(0, Sigma), C = chol(Sigma)):

    d_1 = Phi(a_1 / c_11), e_1 = Phi(b_1 / c_11)
    for each QMC point w in [0,1]^(m-1):
        for i = 2..m:
            y_{i-1} = Phi^-1(d_{i-1} + w_{i-1} * (e_{i-1} - d_{i-1}))
            t_i     = (limit_i - sum_{j<i} c_ij y_j) / c_ii
            d_i, e_i = Phi(t_i at a), Phi(t_i at b)
        accumulate prod_i (e_i - d_i)

The dimension loop is unrolled in Python (m is small and static: the ITAL batch
size), the QMC-point axis is vectorized, and the whole function is vmappable
over (mu, signs) pairs sharing one Cholesky factor per candidate — which is how
the 2^m orthants of one candidate reuse a single factorization.

QMC point set: a Richtmyer rank-1 lattice (frac(k * sqrt(prime_j))), optionally
with a Cranley-Patterson random shift for seeded replication — deterministic by
default so runs are exactly reproducible (SURVEY.md section 5 "--deterministic").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

# First 32 primes — square roots seed the Richtmyer lattice directions.
_PRIMES = np.array(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
     71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131],
    dtype=np.float64,
)

# Keep Phi outputs strictly inside (0, 1) so ndtri stays finite in f32.
_EPS = 1e-6


def _phi(x: jax.Array) -> jax.Array:
    """Standard normal CDF, clamped away from {0, 1}."""
    p = 0.5 * jax.lax.erfc(-x * (1.0 / np.sqrt(2.0)))
    return jnp.clip(p, _EPS, 1.0 - _EPS)


def richtmyer_lattice(n_points: int, dim: int) -> np.ndarray:
    """(n_points, dim) Richtmyer rank-1 lattice in [0, 1)^dim (host-side, static)."""
    if dim == 0:
        return np.zeros((n_points, 0), dtype=np.float32)
    k = np.arange(1, n_points + 1, dtype=np.float64)[:, None]
    alphas = np.sqrt(_PRIMES[:dim])[None, :]
    return np.modf(k * alphas)[0].astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_points",))
def mvn_orthant_prob(
    mu: jax.Array,
    chol_cov: jax.Array,
    signs: jax.Array,
    *,
    n_points: int = 128,
    shift: jax.Array | None = None,
) -> jax.Array:
    """P(signs_i * z_i > 0 for all i), z ~ N(mu, C C^T), with C = ``chol_cov``.

    Args:
      mu: (m,) mean of the joint GP predictive at the candidate batch.
      chol_cov: (m, m) lower Cholesky factor of the predictive covariance —
        shared across all 2^m sign configurations of one candidate.
      signs: (m,) in {-1., +1.} — the relevance configuration r.
      n_points: static QMC sample count (accuracy knob; 128 gives ~1e-3 abs
        error at m <= 6, see tests/test_mvn.py).
      shift: optional (m-1,) Cranley-Patterson shift in [0,1) for randomized QMC.

    Returns a scalar probability.  Fully differentiable and vmappable; m = 1
    needs no sampling and reduces to the closed-form Phi.

    The orthant {s_i z_i > 0} is the rectangle with, per dimension, lower limit
    -mu_i (s=+1, upper +inf) or upper limit -mu_i (s=-1, lower -inf) after
    centering.  One-sided limits make each conditional factor a single Phi.
    """
    m = mu.shape[0]
    c = chol_cov
    dt = mu.dtype
    # Centered one-sided limit per dimension: the finite boundary is -mu_i.
    lim = -mu

    w = jnp.asarray(richtmyer_lattice(n_points, m - 1), dt)  # (P, m-1)
    if shift is not None:
        w = jnp.mod(w + shift[None, :], 1.0)

    # Guard degenerate (near-singular) factors: callers add jitter, but a
    # candidate coinciding with a labeled point can still drive c_ii ~ 0.
    cdiag = jnp.maximum(jnp.diag(c), 1e-6)

    # i = 0: no conditioning.
    t0 = lim[0] / cdiag[0]
    p0 = _phi(t0)
    # d/e: running lower/upper CDF bounds of the current dimension.
    d = jnp.where(signs[0] > 0, p0, 0.0)
    e = jnp.where(signs[0] > 0, 1.0, p0)
    d = jnp.broadcast_to(d, (n_points,))
    e = jnp.broadcast_to(e, (n_points,))
    f = e - d  # (P,) running product of conditional probabilities

    ys = []
    for i in range(1, m):
        # Sample y_{i-1} within its conditional band via inverse CDF.
        u = d + w[:, i - 1] * (e - d)
        ys.append(ndtri(jnp.clip(u, _EPS, 1.0 - _EPS)))
        y = jnp.stack(ys, axis=-1)  # (P, i)
        t = (lim[i] - y @ c[i, :i]) / cdiag[i]  # (P,)
        pi = _phi(t)
        d = jnp.where(signs[i] > 0, pi, 0.0)
        e = jnp.where(signs[i] > 0, jnp.ones_like(pi), pi)
        f = f * (e - d)

    return jnp.mean(f)


def orthant_probs_all_configs(
    mu: jax.Array,
    chol_cov: jax.Array,
    sign_table: jax.Array,
    *,
    n_points: int = 128,
    shift: jax.Array | None = None,
    normalize: bool = True,
) -> jax.Array:
    """Probabilities of every sign configuration in ``sign_table`` (2^m, m).

    One Cholesky factor, vmapped over configurations; optionally normalized to
    sum to 1 (the 2^m orthants partition R^m, so normalization absorbs QMC
    error — this is what ITAL's MI uses as P(R=r)).
    """
    probs = jax.vmap(
        lambda s: mvn_orthant_prob(mu, chol_cov, s, n_points=n_points, shift=shift)
    )(sign_table)
    if normalize:
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-12)
    return probs
