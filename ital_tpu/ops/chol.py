"""Padded Cholesky factorization and incremental low-rank (block-append) updates.

The reference refits its GP from scratch every feedback round
(``italia/gp.py :: GaussianProcess.fit`` -> ``scipy.linalg.cho_factor``; SURVEY.md
section 3.3).  Here the labeled set lives in a fixed-capacity padded buffer so
everything jits once with static shapes:

* slots ``>= count`` are *padding*: the kernel matrix is forced to the identity
  there, so the Cholesky factor is the identity on the padded block and zero on
  the cross blocks, and triangular solves against right-hand sides that are zero
  on padded rows stay zero there;
* slots ``< count`` with ``valid == False`` are *occupied-but-inert* (a user
  skipped that item): they are also forced to identity rows, so they occupy a
  slot without influencing the posterior.  This keeps the per-round append a
  fixed-size block of exactly ``batch_size`` slots — static shapes, no
  recompilation — while matching the reference semantics that skipped items do
  not enter the labeled set.

The block-append update is the "rank-1/low-rank posterior update" of the north
star (BASELINE.md): appending a block B to a factored system costs
O(b * cap^2) instead of the O(cap^3) refactorization, via the Schur complement

    K_new = [[K_ll, K_lB], [K_Bl, K_BB]]
    L_new = [[L, 0], [S^T, L_B]],  S = L^-1 K_lB,  L_B = chol(K_BB - S^T S)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _identity_pad(k: jax.Array, active: jax.Array) -> jax.Array:
    """Replace rows/cols of ``k`` where ``active`` is False with identity rows.

    ``active``: (cap,) bool — True for slots that really participate.  The
    result is positive-definite whenever the active principal block is.
    """
    m2 = active[:, None] & active[None, :]
    eye = jnp.eye(k.shape[0], dtype=k.dtype)
    return jnp.where(m2, k, eye)


def padded_cholesky(k_ll: jax.Array, active: jax.Array, noise: jax.Array | float) -> jax.Array:
    """Cholesky of ``k_ll + noise*I`` restricted to ``active`` slots, identity elsewhere.

    Reference parity: ``cho_factor(K[labeled][:, labeled] + noise * eye)`` in
    ``italia/gp.py :: GaussianProcess.fit``, generalized to padded buffers.
    """
    k = k_ll + noise * jnp.eye(k_ll.shape[0], dtype=k_ll.dtype)
    k = _identity_pad(k, active)
    return jnp.linalg.cholesky(k)


def tri_solve(l: jax.Array, b: jax.Array, *, trans: bool = False) -> jax.Array:
    """Solve ``L x = b`` (or ``L^T x = b``) with ``L`` lower triangular."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=trans
    )


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L L^T x = b``."""
    return tri_solve(l, tri_solve(l, b), trans=True)


def chol_append_block(
    l: jax.Array,
    k_lb: jax.Array,
    k_bb: jax.Array,
    count: jax.Array,
    active_new: jax.Array,
    noise: jax.Array | float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Append a block of ``b`` slots at position ``count`` to a padded Cholesky factor.

    Args:
      l: (cap, cap) current factor with identity padding from slot ``count`` on.
      k_lb: (cap, b) kernel between existing slots and the new block, already
        zeroed on rows ``>= count`` and on rows of inert slots (the caller masks).
      k_bb: (b, b) kernel among the new block's points.
      count: scalar int32 — first free slot; the block lands at
        ``[count, count+b)``.  Must satisfy ``count + b <= cap`` (caller checks).
      active_new: (b,) bool — False entries become identity (inert) slots.
      noise: observation noise added to the active diagonal of the new block.

    Returns ``(new_l, s, l_b)``: the updated (cap, cap) factor — identical (to
    numerical tolerance) to refactorizing from scratch with
    :func:`padded_cholesky`, asserted by ``tests/test_chol.py`` — plus the
    intermediates ``s = L^-1 K_lB`` (cap, b) and ``l_b = chol(Schur)`` (b, b)
    that callers need to extend whitened quantities (e.g. the GP's ``V`` and
    ``beta``) by the same block without re-solving.
    """
    cap = l.shape[0]
    b = k_bb.shape[0]
    dtype = l.dtype

    # Mask inert columns of the cross block and inert rows/cols of K_BB.
    k_lb = jnp.where(active_new[None, :], k_lb, 0.0)
    k_bb = _identity_pad(k_bb + noise * jnp.eye(b, dtype=dtype), active_new)

    # S = L^-1 K_lB. Rows >= count of K_lB are zero and L is identity there,
    # so S is zero on those rows too.
    s = tri_solve(l, k_lb)  # (cap, b)
    c_b = k_bb - jnp.dot(s.T, s, preferred_element_type=jnp.float32).astype(dtype)
    c_b = _identity_pad(c_b, active_new)
    l_b = jnp.linalg.cholesky(c_b)  # (b, b)

    # Row block to write at rows [count, count+b): [S^T | L_B] laid out in the
    # full cap-wide coordinate system (L_B starts at column `count`).
    row_block = jnp.zeros((b, cap), dtype)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, cap), 1)
    row_block = jnp.where(col_ids < count, s.T, row_block)
    row_block = jax.lax.dynamic_update_slice(row_block, l_b, (0, count))

    new_l = jax.lax.dynamic_update_slice(l, row_block, (count, 0))
    # Columns [count, count+b) above row `count` must be 0 — they already are,
    # because the identity padding of the old factor has zeros off-diagonal.
    return new_l, s, l_b
