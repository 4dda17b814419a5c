"""bf16 corpus storage (GP.corpus_dtype): dtypes, numerics, end-to-end.

The knob quantizes only the corpus STORAGE; posterior buffers stay f32 and
kernel norms accumulate in f32 (ops/kernels.py).  On TPU the default matmul
already multiplies in bf16 passes, so the bf16 corpus adds input-side
quantization only — these tests pin (a) the dtype contract, (b) closeness
to the f32 path at interactive scales, and (c) that an end-to-end noisy
session still learns.  Beyond reference scope (the reference is f64 NumPy
throughout — SURVEY.md §6 perf levers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.models import gp as gp_mod
from ital_tpu.ops.kernels import rbf_kernel, sqdist

LS, VAR, NOISE = 1.5, 1.0, 0.1


def _states(rng, n=120, d=8, cap=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    st32 = gp_mod.gp_init(jnp.asarray(x), LS, VAR, NOISE, cap)
    st16 = gp_mod.gp_init(jnp.asarray(x), LS, VAR, NOISE, cap,
                          corpus_dtype="bfloat16")
    return x, st32, st16


def test_dtype_contract(rng):
    _, st32, st16 = _states(rng)
    assert st16.x.dtype == jnp.bfloat16
    # Posterior buffers and cached norms stay f32 regardless of storage.
    for st in (st32, st16):
        assert st.mu.dtype == jnp.float32
        assert st.v.dtype == jnp.float32
        assert st.sig2.dtype == jnp.float32
        assert st.x2.dtype == jnp.float32
    # An already-quantized corpus (the serving layer casts its one shared
    # copy once) keeps f32 posterior buffers too.
    st_pre = gp_mod.gp_init(st16.x, LS, VAR, NOISE, 16)
    assert st_pre.x.dtype == jnp.bfloat16
    assert st_pre.mu.dtype == jnp.float32


def test_self_distance_is_zero_bf16(rng):
    x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32),
                    ).astype(jnp.bfloat16)
    d2 = sqdist(x, x)
    assert d2.dtype == jnp.float32
    # Norms are computed in f32 from the STORED values, so the diagonal
    # cancels exactly (the clamp handles only rounding in the cross term).
    np.testing.assert_allclose(np.asarray(jnp.diag(d2)), 0.0, atol=1e-3)


def test_posterior_close_to_f32(rng):
    _, st32, st16 = _states(rng)
    lab = jnp.asarray([3, 17, 42, 55], jnp.int32)
    ys = jnp.asarray([1.0, -1.0, 1.0, -1.0], jnp.float32)
    valid = jnp.ones(4, bool)
    a = gp_mod.gp_update(st32, lab, ys, valid)
    b = gp_mod.gp_update(st16, lab, ys, valid)
    # bf16 input quantization: ~8-bit mantissa on the features; the kernel
    # and posterior follow smoothly.  1e-2 on mu (range ~[-1, 1]).
    np.testing.assert_allclose(np.asarray(b.mu), np.asarray(a.mu), atol=2e-2)
    np.testing.assert_allclose(np.asarray(b.sig2), np.asarray(a.sig2), atol=2e-2)
    # update == refit still holds WITHIN the bf16 path.
    refit = gp_mod.gp_fit(b)
    np.testing.assert_allclose(np.asarray(b.mu), np.asarray(refit.mu), atol=2e-3)


def test_end_to_end_learns(tmp_path):
    from ital_tpu.data import datasets as ds_mod
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    cfg = load_config(None, (
        "EXPERIMENT.dataset=toy", "EXPERIMENT.n_rounds=6",
        "EXPERIMENT.repetitions=2", "EXPERIMENT.batch_size=3",
        "GP.length_scale=1.5", "GP.corpus_dtype=bfloat16",
        "METHOD.n_qmc=16",
    ))
    ds = ds_mod.load_dataset(cfg.dataset, **cfg.dataset_kwargs)
    res = run_experiment(cfg, ds)
    curve = res["map"]
    assert curve[-1] > 0.5  # learns well past the random floor
    assert curve[-1] >= curve[0] - 0.05


def test_config_validation():
    from ital_tpu.utils.config import load_config

    with pytest.raises(ValueError, match="corpus_dtype"):
        load_config(None, ("GP.corpus_dtype=float16",))
    with pytest.warns(UserWarning, match="cannot recover f32"):
        load_config(None, ("GP.corpus_dtype=bfloat16",
                           "GP.matmul_precision=highest"))
