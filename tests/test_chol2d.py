"""Cap-sharded (TP-analog) Cholesky/solves == single-device padded path.

SURVEY.md section 2.3 TP row; layout and algorithms in
``ital_tpu/parallel/chol2d.py``.  Runs on the 8-virtual-device CPU mesh the
conftest provisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.ops.chol import cho_solve, padded_cholesky, tri_solve
from ital_tpu.parallel.chol2d import (
    make_sharded_cho_solve,
    make_sharded_cholesky,
    make_sharded_whiten,
    shard_rows,
)
from ital_tpu.parallel.mesh import CORPUS_AXIS, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _spd(rng, cap):
    a = rng.normal(size=(cap, cap)).astype(np.float32)
    return (a @ a.T / cap + np.eye(cap, dtype=np.float32)).astype(np.float32)


@pytest.mark.parametrize("cap", [16, 64])
def test_sharded_cholesky_matches_padded(rng, mesh, cap):
    k = _spd(rng, cap)
    # Mixed active pattern: padding tail + an inert hole in the middle.
    active = np.ones(cap, bool)
    active[cap // 2] = False
    active[cap - 3 :] = False
    noise = 0.1

    ref = np.asarray(padded_cholesky(jnp.asarray(k), jnp.asarray(active), noise))
    ours = np.asarray(
        make_sharded_cholesky(mesh)(
            shard_rows(jnp.asarray(k), mesh), jnp.asarray(active), jnp.float32(noise)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_sharded_cho_solve_matches(rng, mesh):
    cap, r = 32, 5
    k = _spd(rng, cap)
    active = np.ones(cap, bool)
    active[-4:] = False
    b = rng.normal(size=(cap, r)).astype(np.float32)
    b[~active] = 0.0  # padded-slot RHS rows are zero by construction upstream

    l_ref = padded_cholesky(jnp.asarray(k), jnp.asarray(active), 0.05)
    x_ref = np.asarray(cho_solve(l_ref, jnp.asarray(b)))

    l_sh = make_sharded_cholesky(mesh)(
        shard_rows(jnp.asarray(k), mesh), jnp.asarray(active), jnp.float32(0.05)
    )
    x = np.asarray(make_sharded_cho_solve(mesh)(l_sh, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, atol=5e-5)
    # Solves against zero-on-inactive RHS stay zero there (identity rows).
    np.testing.assert_allclose(x[~np.asarray(active)], 0.0, atol=1e-6)


def test_sharded_whiten_matches(rng, mesh):
    """2-D solve: L row-sharded x RHS column-sharded (the GP whitening V)."""
    cap, n = 24, 40  # n divides 8
    k = _spd(rng, cap)
    active = np.ones(cap, bool)
    active[-2:] = False
    kx = rng.normal(size=(cap, n)).astype(np.float32)
    kx[~active] = 0.0

    l_ref = padded_cholesky(jnp.asarray(k), jnp.asarray(active), 0.0)
    v_ref = np.asarray(tri_solve(l_ref, jnp.asarray(kx)))

    from jax.sharding import NamedSharding, PartitionSpec as P

    l_sh = make_sharded_cholesky(mesh)(
        shard_rows(jnp.asarray(k), mesh), jnp.asarray(active), jnp.float32(0.0)
    )
    kx_sh = jax.device_put(
        jnp.asarray(kx), NamedSharding(mesh, P(None, CORPUS_AXIS))
    )
    v = np.asarray(make_sharded_whiten(mesh)(l_sh, kx_sh))
    np.testing.assert_allclose(v, v_ref, atol=5e-5)


def test_sharded_fit_pipeline_end_to_end(rng, mesh):
    """chol2d as a large-cap GP fit: mu from the sharded factor == gp_fit's mu."""
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.ops.kernels import rbf_kernel

    n, d, cap = 64, 6, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), 2.0, 1.0, 0.1, cap)
    idx = rng.choice(n, size=9, replace=False)
    y = rng.choice([-1.0, 1.0], size=9).astype(np.float32)
    state = gp_mod.gp_update(state, jnp.asarray(idx), jnp.asarray(y),
                             jnp.ones(9, bool))

    # Rebuild the same posterior through the sharded factor/solves.
    k_ll = rbf_kernel(state.x[state.idx], state.x[state.idx],
                      state.hyper.length_scale, state.hyper.var)
    active = state.active
    l_sh = make_sharded_cholesky(mesh)(
        shard_rows(k_ll, mesh), active, state.hyper.noise
    )
    yv = jnp.where(active, state.y, 0.0)[:, None]
    alpha = make_sharded_cho_solve(mesh)(l_sh, yv)[:, 0]  # K_ll^-1 y
    k_lx = rbf_kernel(state.x[state.idx], state.x,
                      state.hyper.length_scale, state.hyper.var)
    k_lx = jnp.where(active[:, None], k_lx, 0.0)
    mu = k_lx.T @ alpha
    np.testing.assert_allclose(np.asarray(mu), np.asarray(state.mu), atol=1e-4)


def test_indivisible_cap_raises(rng, mesh):
    k = _spd(rng, 20)  # 20 % 8 != 0
    active = np.ones(20, bool)
    import pytest

    with pytest.raises(ValueError, match="divide evenly"):
        # Unsharded on purpose: device_put would reject the layout first.
        make_sharded_cholesky(mesh)(
            jnp.asarray(k), jnp.asarray(active), jnp.float32(0.1)
        )


def test_sharded_cholesky_large_cap(rng, mesh):
    """cap=512 on the 8-device mesh — the 'very large labeled set' regime the
    TP-analog exists for (64-row panels per device), full equality."""
    cap = 512
    k = _spd(rng, cap)
    active = np.ones(cap, bool)
    active[500:] = False
    ref = np.asarray(padded_cholesky(jnp.asarray(k), jnp.asarray(active), 0.1))
    ours = np.asarray(
        make_sharded_cholesky(mesh)(
            shard_rows(jnp.asarray(k), mesh), jnp.asarray(active),
            jnp.float32(0.1),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)
