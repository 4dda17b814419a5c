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


def norm_cdf(x: jax.Array, *, eps: float = _EPS) -> jax.Array:
    """Standard normal CDF via erfc, clamped to ``[eps, 1 - eps]``.

    The one shared Phi of the codebase (the QMC chain uses the default
    ``eps`` so ``fast_ndtri`` stays finite in f32; the baselines pass a
    looser clip) — keep clamping policy here, not in per-module copies.
    """
    p = 0.5 * jax.lax.erfc(-x * (1.0 / np.sqrt(2.0)))
    return jnp.clip(p, eps, 1.0 - eps)


def _phi(x: jax.Array) -> jax.Array:
    return norm_cdf(x)


# Acklam's rational approximation to the inverse normal CDF: ~1.2e-9 relative
# error, branchless (central + tail evaluated and selected), an order of
# magnitude fewer ops than jax.scipy.special.ndtri — which dominates both
# compile and run time of the QMC chain when batched over 10^4-10^5 candidates.
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
          1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
          6.680131188771972e+01, -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
          -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
          3.754408661907416e+00)


def fast_ndtri(p: jax.Array) -> jax.Array:
    """Branchless inverse standard-normal CDF (Acklam), for p in (0, 1).

    Inputs are expected pre-clipped to [_EPS, 1 - _EPS] (the QMC chain does);
    accuracy ~1e-7 absolute in f32 over that range — far inside the QMC noise
    floor of the orthant estimates.
    """
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D
    plow = 0.02425

    # Central region.
    q = p - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    x_central = num * q / den

    # Tails (evaluated on the folded lower-tail variable).
    p_tail = jnp.minimum(p, 1.0 - p)
    ql = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(p_tail, 1e-38)))
    num_t = ((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]
    den_t = (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1.0
    x_tail = num_t / den_t
    x_tail = jnp.where(p < 0.5, x_tail, -x_tail)

    return jnp.where(p_tail < plow, x_tail, x_central)


def small_cholesky(a: jax.Array, *, eps: float = 1e-10) -> jax.Array:
    """Unrolled Cholesky-Crout for tiny (m, m) SPD matrices, m <= ~8.

    ``jnp.linalg.cholesky`` lowers to a loop-based unblocked kernel that is slow
    when vmapped over tens of thousands of tiny matrices (the per-candidate
    batch covariances of the MI scan); this explicit unroll is pure elementwise
    arithmetic, fuses completely, and costs microseconds across the whole
    corpus.  Diagonal pivots are clamped at ``eps`` so near-singular candidate
    covariances (duplicate points) stay finite; callers add jitter for accuracy.
    """
    m = a.shape[-1]
    l = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                l[i][j] = s / l[j][j]
    rows = [
        jnp.stack([l[i][j] if j <= i else jnp.zeros_like(a[..., 0, 0])
                   for j in range(m)], axis=-1)
        for i in range(m)
    ]
    return jnp.stack(rows, axis=-2)


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
    if m == 1:
        # Closed form — no sampling needed for a univariate orthant.
        return e - d
    d = jnp.broadcast_to(d, (n_points,))
    e = jnp.broadcast_to(e, (n_points,))
    f = e - d  # (P,) running product of conditional probabilities

    # Sequential conditioning over dims 1..m-1 as a lax.scan: one ndtri/phi in
    # the compiled graph regardless of m (the unrolled form made the TPU
    # compiler chew for minutes once batched over candidates x configs), with
    # a zero-padded y buffer standing in for the growing prefix.  INVARIANT:
    # at step i, ybuf slots >= i-1 are still zero when the row dot runs —
    # y_{i-1} is written and THEN t_i is computed against c-row slice
    # c[i, :m-1], whose slot i-1 is c[i, i-1] (sub-diagonal, legitimately
    # nonzero); slots >= i hold zeros in ybuf, not in c, so reordering the
    # body (updating ybuf late, or pre-filling it) silently corrupts t_i.
    ybuf0 = jnp.zeros((n_points, m - 1), dt)
    xs = (
        w.T,  # (m-1, P) QMC coordinates per dim
        c[1:, : m - 1],  # (m-1, m-1) conditioning rows
        lim[1:],
        cdiag[1:],
        signs[1:],
        jnp.eye(m - 1, dtype=dt),  # one-hot rows to place y_{i-1}
    )

    def body(carry, inp):
        d, e, f, ybuf = carry
        w_i, c_row, lim_i, cd_i, s_i, hot = inp
        u = jnp.clip(d + w_i * (e - d), _EPS, 1.0 - _EPS)
        y = fast_ndtri(u)
        ybuf = ybuf + y[:, None] * hot[None, :]
        t = (lim_i - ybuf @ c_row) / cd_i
        pi = _phi(t)
        d = jnp.where(s_i > 0, pi, 0.0)
        e = jnp.where(s_i > 0, jnp.ones_like(pi), pi)
        return (d, e, f * (e - d), ybuf), None

    (_, _, f, _), _ = jax.lax.scan(body, (d, e, f, ybuf0), xs)
    return jnp.mean(f)


@functools.partial(jax.jit, static_argnames=("n_points", "normalize"))
def orthant_probs_all_configs_tree(
    mu: jax.Array,
    chol_cov: jax.Array,
    *,
    n_points: int = 128,
    shift: jax.Array | None = None,
    normalize: bool = True,
) -> jax.Array:
    """All 2^m orthant probabilities via a sign-prefix tree — shared conditioning.

    The 2^m sign configurations form a binary tree over prefixes
    (s_0, .., s_i): two configurations that agree on the first i signs share
    the identical Genz conditioning chain up to dimension i.  Evaluating level
    by level (2^i nodes at level i, each a (n_points,) lane) costs
    sum_i 2^i = 2^m - 2 sampled-dimension evaluations instead of the naive
    (m-1) * 2^m — a ~3.4x reduction of the ndtri/Phi chain at m=4, which
    dominates the MI scan's device time.

    Returns probabilities in the ``sign_table(m)`` order (itertools.product
    with -1 before +1, first dimension varying slowest); exact same estimator
    as vmapping :func:`mvn_orthant_prob` over the table (tested to fp
    tolerance).  Vmappable over candidates.
    """
    m = mu.shape[0]
    c = chol_cov
    dt = mu.dtype
    lim = -mu
    cdiag = jnp.maximum(jnp.diag(c), 1e-6)

    t0 = lim[0] / cdiag[0]
    p0 = _phi(t0)
    zero = jnp.zeros((), dt)
    one = jnp.ones((), dt)
    # Node order [s_0 = -1, s_0 = +1] matches sign_table's slowest-first bit.
    d = jnp.stack([zero, p0])  # (2,)
    e = jnp.stack([p0, one])
    f = e - d
    if m == 1:
        return f / jnp.maximum(jnp.sum(f), 1e-12) if normalize else f

    w = jnp.asarray(richtmyer_lattice(n_points, m - 1), dt)  # (P, m-1)
    if shift is not None:
        w = jnp.mod(w + shift[None, :], 1.0)

    nodes = 2
    d = jnp.broadcast_to(d[:, None], (nodes, n_points))
    e = jnp.broadcast_to(e[:, None], (nodes, n_points))
    f = jnp.broadcast_to(f[:, None], (nodes, n_points))
    yh = jnp.zeros((nodes, n_points, 0), dt)

    for i in range(1, m):
        u = jnp.clip(d + w[None, :, i - 1] * (e - d), _EPS, 1.0 - _EPS)
        y = fast_ndtri(u)  # (nodes, P)
        yh = jnp.concatenate([yh, y[..., None]], axis=-1)  # (nodes, P, i)
        t = (lim[i] - yh @ c[i, :i]) / cdiag[i]  # (nodes, P)
        p = _phi(t)
        # Split each node into (s_i = -1, s_i = +1) children, flat order 2n+b.
        d = jnp.stack([jnp.zeros_like(p), p], axis=1).reshape(2 * nodes, n_points)
        e = jnp.stack([p, jnp.ones_like(p)], axis=1).reshape(2 * nodes, n_points)
        band = e - d
        f = jnp.repeat(f, 2, axis=0) * band
        yh = jnp.repeat(yh, 2, axis=0)
        nodes *= 2

    probs = jnp.mean(f, axis=-1)  # (2^m,)
    if normalize:
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-12)
    return probs


@functools.lru_cache(maxsize=None)
def shift_table(n_shifts: int, dim: int, seed: int = 0) -> np.ndarray:
    """(n_shifts, dim) deterministic Cranley-Patterson shifts (host-side).

    Fixed by ``seed`` so multi-shift runs stay exactly reproducible
    (SURVEY.md section 5 "--deterministic"); shift 0 is the zero shift, so the
    first replicate is the production unshifted lattice estimate.
    """
    rng = np.random.default_rng(seed)
    t = rng.random((n_shifts, max(dim, 1))).astype(np.float32)[:, :dim]
    if n_shifts:
        t[0] = 0.0
    return t


@functools.partial(
    jax.jit, static_argnames=("n_points", "n_shifts", "seed", "normalize")
)
def orthant_probs_with_error(
    mu: jax.Array,
    chol_cov: jax.Array,
    *,
    n_points: int = 128,
    n_shifts: int = 4,
    seed: int = 0,
    normalize: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """All 2^m orthant probabilities plus an internal QMC error estimate.

    Randomized-QMC error estimation by Cranley-Patterson rotation — the same
    mechanism Genz's Fortran MVNDST uses for its returned error bound
    (SURVEY.md section 2.2 N3: the reference's MVNDST adapts its sample count
    to an error estimate; this is the rebuild's equivalent, measured rather
    than adaptive): the lattice is evaluated under the table's
    ``n_shifts - 1`` RANDOM shifts (shift 0 — the deterministic zero shift —
    is excluded from the statistics: it is not a draw from the shift family,
    and including it with a population std biased the estimate ~10% low);
    their replicates are i.i.d. unbiased, and the returned ``err`` is the
    sample standard error of their mean,

        err_k = std_{random shifts}(p_k; ddof=1) / sqrt(n_shifts - 1).

    Returns ``(probs (2^m,), err (2^m,))`` with ``probs`` the mean over the
    random shifts (a strictly better estimate than any single replicate).
    With ``n_shifts = 1`` only the zero shift runs: ``probs`` equals the
    production unshifted estimate exactly and ``err`` is 0.  ``n_shifts = 2``
    is rejected: one random replicate admits no ddof=1 std (the old code
    returned NaN error bars there — code-review round 4).  Cost is
    ``n_shifts - 1`` tree evaluations for ``n_shifts >= 3`` (the discarded
    zero-shift replicate is not evaluated); production selection keeps the
    single unshifted lattice (err is a diagnostic/validation surface — see
    scripts/qmc_error_study.py and docs/PROFILE.md section 7).
    """
    if n_shifts == 2:
        raise ValueError(
            "n_shifts=2 leaves a single random replicate — no sample std "
            "exists; use n_shifts=1 (unshifted, err=0) or n_shifts >= 3"
        )
    m = mu.shape[0]
    shifts = jnp.asarray(shift_table(n_shifts, m - 1, seed), mu.dtype)
    if n_shifts < 2:
        p = orthant_probs_all_configs_tree(
            mu, chol_cov, n_points=n_points, shift=shifts[0],
            normalize=normalize,
        )
        return p, jnp.zeros_like(p)
    rand = jax.vmap(
        lambda sh: orthant_probs_all_configs_tree(
            mu, chol_cov, n_points=n_points, shift=sh, normalize=normalize
        )
    )(shifts[1:])
    err = jnp.std(rand, axis=0, ddof=1) / np.sqrt(n_shifts - 1)
    return jnp.mean(rand, axis=0), err


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
