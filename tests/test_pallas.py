"""Pallas fused RBF kernel vs the lax path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.ops.kernels import rbf_kernel
from ital_tpu.ops import pallas_rbf


def test_pallas_rbf_matches_lax_interpret(rng, monkeypatch):
    """Run the Pallas kernel in interpreter mode (no TPU in CI) vs lax."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    a = rng.normal(size=(256, 32)).astype(np.float32)
    b = rng.normal(size=(512, 32)).astype(np.float32)
    ours = pallas_rbf.rbf_kernel_pallas.__wrapped__(
        jnp.asarray(a), jnp.asarray(b), 1.7, 0.9, tile_m=256, tile_n=256
    )
    ref = rbf_kernel(jnp.asarray(a), jnp.asarray(b), 1.7, 0.9)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_rbf_internal_padding_on_ragged_shapes(rng, monkeypatch):
    """Non-tile-multiple shapes are padded internally and sliced back."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    a = rng.normal(size=(100, 8)).astype(np.float32)  # not tileable
    b = rng.normal(size=(300, 8)).astype(np.float32)
    out = pallas_rbf.rbf_kernel_pallas.__wrapped__(
        jnp.asarray(a), jnp.asarray(b), 1.0, 1.0, tile_m=64, tile_n=128
    )
    ref = rbf_kernel(jnp.asarray(a), jnp.asarray(b), 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
