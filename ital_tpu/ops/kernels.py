"""Blockwise RBF kernel ops.

The corpus feature matrix lives in HBM; kernel blocks are computed on demand on
the MXU (``||a||^2 + ||b||^2 - 2 a b^T`` as a matmul plus a fused elementwise
``exp`` epilogue) instead of materializing the full N x N Gram matrix like the
reference does (reference: ``italia/gp.py :: GaussianProcess`` precomputes
``K(X, X)`` once via ``scipy.spatial.distance.cdist``; see SURVEY.md section 2.2
N2).  A fused Pallas tile kernel for the same contraction lives in
``ital_tpu.ops.pallas_rbf`` — this module is the lax/XLA path and the common API.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sqdist(
    a: jax.Array,
    b: jax.Array,
    *,
    a2: Optional[jax.Array] = None,
    b2: Optional[jax.Array] = None,
) -> jax.Array:
    """Pairwise squared Euclidean distances between rows of ``a`` (M,D) and ``b`` (N,D).

    Uses the expansion ``||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b`` so the dominant
    cost is a single (M,D)x(D,N) matmul on the MXU.  Clamped at zero against
    cancellation error.

    ``a2`` / ``b2`` optionally supply PRECOMPUTED squared row norms ((M,) /
    (N,)).  When one side is the whole HBM-resident corpus, recomputing its
    norms costs a full ``N x D`` read per call — at 1M x 512 that second 2 GB
    pass was ~2.5 ms of the measured 13.3 ms ``gp_update`` slope
    (results/round_term_split.json); ``GPState.x2`` caches them once at init.
    """
    # Norms accumulate in (at least) f32 regardless of the storage dtype:
    # with a bf16-stored corpus (GP.corpus_dtype) a bf16 norm sum would lose
    # ~3 decimal digits on D~512 features, while the matmul below already
    # accumulates in f32 via preferred_element_type.
    nt = jnp.promote_types(a.dtype, jnp.float32)
    if a2 is None:
        af = a.astype(nt)
        a2 = jnp.sum(af * af, axis=-1)  # (M,)
    if b2 is None:
        bf = b.astype(nt)
        b2 = jnp.sum(bf * bf, axis=-1)  # (N,)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * ab, 0.0)


def rbf_kernel(
    a: jax.Array,
    b: jax.Array,
    length_scale: jax.Array | float,
    var: jax.Array | float = 1.0,
    *,
    a2: Optional[jax.Array] = None,
    b2: Optional[jax.Array] = None,
) -> jax.Array:
    """RBF (squared-exponential) kernel block ``var * exp(-||a-b||^2 / (2 ls^2))``.

    Matches the reference kernel (``italia/gp.py :: GaussianProcess``) exactly;
    the noise term is NOT included here — it is added on the labeled diagonal by
    the Cholesky fit (:mod:`ital_tpu.ops.chol`).  ``a2``/``b2``: optional
    precomputed squared row norms (see :func:`sqdist`).
    """
    d2 = sqdist(a, b, a2=a2, b2=b2)
    return var * jnp.exp(-d2 / (2.0 * length_scale**2))


@functools.partial(jax.jit, static_argnames=("block_rows",))
def rbf_kernel_blockwise(
    a: jax.Array,
    b: jax.Array,
    length_scale: jax.Array | float,
    var: jax.Array | float = 1.0,
    *,
    block_rows: int = 1024,
) -> jax.Array:
    """RBF kernel computed in row blocks of ``a`` via ``lax.map``.

    Functionally identical to :func:`rbf_kernel`; bounds peak memory for the
    intermediate distance computation when M is large (streaming over HBM).
    """
    from ital_tpu.ops.blocking import blocked_map

    return blocked_map(
        lambda blk: rbf_kernel(blk, b, length_scale, var), (a,), block=block_rows
    )


def blockwise_reduce_abs_kpost(
    x: jax.Array,
    v: jax.Array,
    cand_idx: jax.Array,
    length_scale: jax.Array | float,
    var: jax.Array | float,
    *,
    weights: Optional[jax.Array] = None,
    block: int = 2048,
) -> jax.Array:
    """For each candidate c: ``sum_x w(x) * |k_post(x, c)|`` without materializing N x N.

    ``k_post(x, c) = k(x, c) - V[:, x] . V[:, c]`` is the GP posterior covariance
    between corpus point x and candidate c (``v`` is the (cap, N) whitened
    cross-kernel ``L^-1 K_l,corpus``; see :mod:`ital_tpu.models.gp`).  Used by the
    EMOC baseline (reference: ``italia/baseline_methods.py :: EMOC``) whose
    expected model-output change is ``E_y |Delta mu|``, a column-abs-sum of the
    posterior covariance.  Streams over candidate blocks to keep the (N, block)
    intermediate in VMEM-sized chunks; kernel blocks go through the fused
    Pallas tile kernel on TPU (:mod:`ital_tpu.ops.pallas_rbf`).
    """
    from ital_tpu.ops.blocking import blocked_map
    from ital_tpu.ops.pallas_rbf import rbf_kernel_auto

    n = x.shape[0]
    w = jnp.ones((n,), x.dtype) if weights is None else weights

    def one_block(idx_blk):
        xc = x[idx_blk]  # (block, D)
        k_cross = rbf_kernel_auto(x, xc, length_scale, var)  # (N, block)
        vc = v[:, idx_blk]  # (cap, block)
        k_post = k_cross - jnp.dot(v.T, vc, preferred_element_type=jnp.float32)
        return jnp.sum(jnp.abs(k_post) * w[:, None], axis=0)  # (block,)

    return blocked_map(one_block, (cand_idx,), block=block)
