"""Padded Cholesky + incremental block-append update vs from-scratch refactorization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.ops import chol as chol_ops
from ital_tpu.ops.kernels import rbf_kernel


def _spd_kernel(rng, n, d=5, ls=1.5):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return np.asarray(rbf_kernel(jnp.asarray(x), jnp.asarray(x), ls, 1.0))


def test_padded_cholesky_matches_dense_on_active_block(rng):
    cap, count = 16, 9
    k = _spd_kernel(rng, cap)
    active = np.zeros(cap, dtype=bool)
    active[:count] = True
    active[3] = False  # an inert (skipped) slot inside the counted range
    l = np.asarray(chol_ops.padded_cholesky(jnp.asarray(k), jnp.asarray(active), 0.1))

    sub = np.ix_(np.where(active)[0], np.where(active)[0])
    dense = np.linalg.cholesky(k[sub] + 0.1 * np.eye(active.sum()))
    # Active rows/cols of L restricted to active slots == dense Cholesky.
    np.testing.assert_allclose(l[sub], dense, rtol=1e-4, atol=1e-5)
    # Inactive slots are exactly identity rows/cols.
    inact = ~active
    np.testing.assert_allclose(l[inact][:, inact], np.eye(inact.sum()), atol=0)
    assert np.all(l[inact][:, active] == 0)
    assert np.all(l[active][:, inact] == 0)


@pytest.mark.parametrize("with_inert", [False, True])
def test_append_block_equals_refactorize(rng, with_inert):
    cap, count, b = 24, 7, 4
    noise = 0.05
    k = _spd_kernel(rng, cap)

    active_old = np.zeros(cap, dtype=bool)
    active_old[:count] = True
    l_old = chol_ops.padded_cholesky(jnp.asarray(k), jnp.asarray(active_old), noise)

    active_new = np.ones(b, dtype=bool)
    if with_inert:
        active_new[1] = False

    k_lb = np.where(active_old[:, None], k[:, count : count + b], 0.0)
    k_bb = k[count : count + b, count : count + b]

    l_inc, s, l_b = chol_ops.chol_append_block(
        l_old,
        jnp.asarray(k_lb),
        jnp.asarray(k_bb),
        jnp.asarray(count, jnp.int32),
        jnp.asarray(active_new),
        noise,
    )

    active_full = np.zeros(cap, dtype=bool)
    active_full[: count + b] = True
    active_full[count : count + b] = active_new
    l_ref = chol_ops.padded_cholesky(jnp.asarray(k), jnp.asarray(active_full), noise)

    np.testing.assert_allclose(np.asarray(l_inc), np.asarray(l_ref), atol=5e-3)
    # The meaningful invariant: both factors reconstruct the padded matrix.
    k_pad = np.where(
        active_full[:, None] & active_full[None, :], k + noise * np.eye(cap), np.eye(cap)
    )
    li = np.asarray(l_inc)
    np.testing.assert_allclose(li @ li.T, k_pad, atol=5e-3)
    # The intermediates have the documented shapes.
    assert s.shape == (cap, b) and l_b.shape == (b, b)


def test_cho_solve_roundtrip(rng):
    cap = 12
    k = _spd_kernel(rng, cap) + 0.3 * np.eye(cap, dtype=np.float32)
    active = np.ones(cap, dtype=bool)
    l = chol_ops.padded_cholesky(jnp.asarray(k - 0.3 * np.eye(cap, dtype=np.float32)),
                                 jnp.asarray(active), 0.3)
    y = rng.normal(size=(cap,)).astype(np.float32)
    x = chol_ops.cho_solve(l, jnp.asarray(y)[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(jnp.asarray(k) @ x), y, rtol=2e-3, atol=2e-3)
