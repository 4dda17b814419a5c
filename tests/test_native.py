"""Native C++ MVNDST vs scipy and vs the JAX implementation."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.ops.mvn import mvn_orthant_prob
from ital_tpu.utils.native import load_mvndst, mvn_orthant_probs_native
from tests.oracle.numpy_oracle import mvn_orthant

pytestmark = pytest.mark.skipif(
    load_mvndst() is None, reason="no C++ toolchain available"
)


def _case(rng, m):
    a = rng.normal(size=(m, m))
    cov = a @ a.T + m * np.eye(m)
    mu = rng.normal(size=(m,)) * 0.7
    return mu, cov, np.linalg.cholesky(cov)


@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_native_matches_scipy(rng, m):
    mu, cov, chol = _case(rng, m)
    signs = np.asarray(list(itertools.product([-1.0, 1.0], repeat=m)))
    ours = mvn_orthant_probs_native(mu, chol, signs, n_points=512)
    for row, s in zip(ours, signs):
        ref = mvn_orthant(mu, cov, s)
        assert row == pytest.approx(ref, abs=3e-3), s


@pytest.mark.parametrize("m", [2, 3, 4])
def test_native_matches_jax_same_lattice(rng, m):
    """Same algorithm + same lattice -> near-identical results (fp only)."""
    mu, cov, chol = _case(rng, m)
    signs = np.asarray(list(itertools.product([-1.0, 1.0], repeat=m)))
    native = mvn_orthant_probs_native(mu, chol, signs, n_points=128)
    for row, s in zip(native, signs):
        jax_p = float(
            mvn_orthant_prob(
                jnp.asarray(mu, jnp.float32),
                jnp.asarray(chol, jnp.float32),
                jnp.asarray(s, jnp.float32),
                n_points=128,
            )
        )
        assert row == pytest.approx(jax_p, abs=5e-4), s
