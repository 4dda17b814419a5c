"""Fused RBF-kernel Pallas tile kernel: distances + exp in one VMEM pass.

SURVEY.md section 2.2 N2: the reference's ``scipy.spatial.distance.cdist`` (C)
becomes a blockwise fused tile kernel — each (TM, TN) output tile computes
``|a|^2 + |b|^2 - 2 a b^T`` on the MXU and applies the ``exp`` epilogue on the
VPU before the tile ever leaves VMEM, so HBM sees exactly one write of the
kernel block and no distance intermediate.

The lax path (:func:`ital_tpu.ops.kernels.rbf_kernel`) produces the same values
(XLA usually fuses the epilogue too); this kernel exists for the large-corpus
regime where control over tiling matters, and is validated against the lax path
in ``tests/test_pallas.py``.  Falls back to the lax path on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ital_tpu.ops.kernels import rbf_kernel as _rbf_lax

# Upper bound of the Pallas route's measured win region (see
# rbf_kernel_auto): pallas_call must materialize the (M, N) output, so past
# ~1 GB f32 per block the mandatory HBM write loses to XLA's fused tiled
# reduction (chip A/B 2026-08-19: wins at 100k x 2048 = 205M elems, loses
# 1.4x at 1M x 2048 = 2G — results/pallas_ab*.json, PROFILE.md section 11).
MAX_PALLAS_ELEMS = 1 << 28


def _rbf_tile_kernel(a_ref, b_ref, inv2l2_ref, var_ref, out_ref):
    """One (TM, TN) tile: k = var * exp(-(|a|^2 + |b|^2 - 2ab) * inv2l2)."""
    a = a_ref[:]  # (TM, D)
    b = b_ref[:]  # (TN, D)
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, TN)
    # Norms in f32 even for bf16-stored corpora (GP.corpus_dtype): the MXU
    # contraction above already accumulates f32; a bf16 VPU norm sum would
    # not, and self-distances would stop cancelling to zero.
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    a2 = jnp.sum(af * af, axis=1, keepdims=True)
    b2 = jnp.sum(bf * bf, axis=1, keepdims=True).T
    d2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    out_ref[:] = var_ref[0, 0] * jnp.exp(-d2 * inv2l2_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def rbf_kernel_pallas(
    a: jax.Array,
    b: jax.Array,
    length_scale: jax.Array | float,
    var: jax.Array | float = 1.0,
    *,
    tile_m: int = 256,
    tile_n: int = 256,
) -> jax.Array:
    """RBF kernel block (M, N) via the fused Pallas tile kernel.

    Requires M % tile_m == 0 and N % tile_n == 0 (callers pad; corpus arrays in
    this framework are already padded to TPU-friendly multiples).  The feature
    axis D is kept whole per tile — VMEM holds (tile_m + tile_n) x D inputs plus
    the (tile_m, tile_n) output tile; defaults fit easily at D <= 2048.
    """
    m, d = a.shape
    n = b.shape[0]
    pad_m = (-m) % tile_m
    pad_n = (-n) % tile_n
    if pad_m or pad_n:
        # Pad to tile multiples; the padded rows produce garbage kernel values
        # (k(0, x) != 0) that are sliced away below.
        out = rbf_kernel_pallas(
            jnp.pad(a, ((0, pad_m), (0, 0))),
            jnp.pad(b, ((0, pad_n), (0, 0))),
            length_scale, var, tile_m=tile_m, tile_n=tile_n,
        )
        return out[:m, :n]

    inv2l2 = jnp.asarray(
        1.0 / (2.0 * jnp.asarray(length_scale, jnp.float32) ** 2), jnp.float32
    ).reshape(1, 1)
    var_arr = jnp.asarray(var, jnp.float32).reshape(1, 1)

    grid = (m // tile_m, n // tile_n)
    return pl.pallas_call(
        _rbf_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d + 4 * m * n,
            bytes_accessed=4 * (m * d + n * d + m * n),
            transcendentals=m * n,
        ),
    )(a, b, inv2l2, var_arr)


def rbf_kernel_auto(a, b, length_scale, var=1.0):
    """Fused Pallas tile kernel on TPU inside its measured win region; lax elsewhere.

    Chip-measured routing (results/pallas_ab.json + pallas_ab_1m.json,
    PROFILE.md §11, 2026-08-19): the Pallas path wins on the REDUCE-ABS
    consumers — the (N, 2048) EMOC/entropy cross-kernel blocks of
    ``ops.kernels.blockwise_reduce_abs_kpost`` and ``select/baselines.py``
    — 2.2x at N=25k (1.54 vs 3.46 ms/block) and 1.12x at N=100k (4.57 vs
    5.11), but LOSES 1.4x at N=1M (41.8 vs 30.1): ``pallas_call`` must
    materialize the (M, N) tile output (8 GB/block at 1M) while XLA tiles
    the reduction without it — hence the ``MAX_PALLAS_ELEMS`` cap (2^28
    elems = 1 GB f32; 100k x 2048 = 205M inside, 1M x 2048 outside).  It
    also LOSES 2.1x on the row-mean density stream at 100k (the mean fuses
    even better), so ``models/gp.py::corpus_density`` deliberately calls
    the lax path and does NOT route here.  Small per-candidate blocks
    (< 512 on either dim) can't amortize tile padding — lax.
    """
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and a.shape[0] >= 512
        and b.shape[0] >= 512
        and a.shape[0] * b.shape[0] <= MAX_PALLAS_ELEMS
    ):
        return rbf_kernel_pallas(a, b, length_scale, var)
    return _rbf_lax(a, b, length_scale, var)
