"""Cap-axis-sharded Cholesky + triangular solves — the tensor-parallel analog.

SURVEY.md section 2.3's TP row: ITAL has no weight matrices, so the
tensor-parallel slot of this framework is sharding the *labeled-block kernel
matrix* over the mesh for the Cholesky/solve at very large labeled-set
capacities.  The reference factorizes K_ll on one host
(``italia/gp.py :: GaussianProcess.fit`` -> LAPACK ``potrf``, SURVEY.md
section 3.3); here the (cap, cap) system is distributed block-row over the
same 1-D device mesh the corpus is sharded on, so a session whose labeled set
outgrows one chip's HBM (cap in the tens of thousands: K_ll alone is
cap^2 * 4 bytes) factorizes in parallel with O(cap^2) total ICI traffic.

Layout (mesh axis ``CORPUS_AXIS``, n_dev devices, cb = cap / n_dev):

    device d owns block-row d of every (cap, ...) operand:
      K_ll, L            (cb, cap)   row-sharded
      right-hand sides   (cap, r)    replicated  (labels, small blocks)
      whitening RHS      (cap, n_loc) column-sharded (the corpus axis)

Algorithms (all static-shape, fully jittable inside ``shard_map``):

* **Cholesky** — right-looking blocked factorization unrolled over the n_dev
  panels: at panel j the owner's current block-row is broadcast (one ``psum``
  of a (cb, cap) tile), every device factorizes the (cb, cb) diagonal block
  redundantly (replicated flops are cheaper than a second collective), solves
  its own panel block L_ij = A_ij L_jj^-T locally, and applies the trailing
  update A -= L_:j L_:j^T to the columns right of the panel after one
  ``all_gather`` of the (cap, cb) panel column.
* **Forward/transpose solves** — block substitution over panels; the only
  traffic per panel is the (cb, r) solved block (``psum`` from its owner).
  The transpose solve exploits lower-triangularity: unsolved x-blocks are
  still zero and L_ij = 0 for i < j, so each device's local
  ``L[:, panel]^T @ x_own`` term psums to exactly the solved-suffix
  correction — no masking needed.
* **2-D whitening solve** — ``V = L^-1 K_l,corpus`` with L row-sharded and
  the RHS *column*-sharded (the corpus axis of the GP state,
  ``parallel/sharded.py``): panels of L are broadcast once and every device
  substitutes its own column shard — a genuinely 2-D (TP-row x DP-column)
  operation, the "2-D kernel sharding" of SURVEY.md section 2.3.

Padding follows ``ops/chol.py`` semantics: inactive slots are forced to
identity rows so the factor is identity there and solves against
zero-on-inactive RHS stay zero.  Equality with the single-device
``padded_cholesky`` / ``cho_solve`` / whitening path is pinned in
``tests/test_chol2d.py`` on the 8-virtual-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ital_tpu.parallel.mesh import CORPUS_AXIS

AXIS = CORPUS_AXIS


def _me() -> jax.Array:
    return jax.lax.axis_index(AXIS)


def _identity_pad_local(a: jax.Array, active: jax.Array, noise) -> jax.Array:
    """Local block-row view of ``ops.chol._identity_pad(k + noise*I, active)``.

    ``a``: (cb, cap) block-row; ``active``: (cap,) replicated mask.
    """
    cb, cap = a.shape
    r0 = _me() * cb
    rows = jax.lax.dynamic_slice(active, (r0,), (cb,))  # my rows' active flags
    eye_rows = (jnp.arange(cap)[None, :] == (r0 + jnp.arange(cb))[:, None]).astype(
        a.dtype
    )
    a = a + noise * eye_rows
    keep = rows[:, None] & active[None, :]
    return jnp.where(keep, a, eye_rows)


def chol2d_local(a: jax.Array, active: jax.Array, noise) -> jax.Array:
    """Row-sharded padded Cholesky; call inside ``shard_map`` over ``AXIS``.

    Args:
      a: (cb, cap) this device's block-row of the symmetric kernel matrix.
      active: (cap,) replicated participation mask (see ops/chol.py).
      noise: scalar ridge added to the diagonal before padding.

    Returns this device's (cb, cap) block-row of the lower factor L.
    """
    n_dev = jax.lax.axis_size(AXIS)
    cb, cap = a.shape
    assert cb * n_dev == cap, "cap must divide evenly across the mesh"
    me = _me()
    a = _identity_pad_local(a, active, noise)
    l = jnp.zeros_like(a)

    col = jnp.arange(cap)
    for j in range(n_dev):  # n_dev is static: unrolled panel loop
        c0 = j * cb
        # Panel owner's current block-row, replicated via one ICI psum.
        aj = jax.lax.psum(jnp.where(me == j, a, 0.0), AXIS)  # (cb, cap)
        # Replicated (cb, cb) diagonal factor (redundant flops < a collective).
        djj = jnp.linalg.cholesky(aj[:, c0 : c0 + cb])
        # My panel block: L_ij = A_ij L_jj^-T.  For i == j this evaluates to
        # L_jj itself (A_jj L_jj^-T = L_jj); rows i < j are masked out below.
        lij = jax.lax.linalg.triangular_solve(
            djj, a[:, c0 : c0 + cb], left_side=False, lower=True, transpose_a=True
        )
        # Rows i < j are above the panel's diagonal block: their factor
        # entries in these columns are zero, so the masked write is exact.
        lij = jnp.where(me >= j, lij, 0.0)
        l = jax.lax.dynamic_update_slice(l, lij, (0, c0))
        # Full panel column L_{:, j} (cap, cb) for the trailing update.
        panel = jax.lax.all_gather(lij, AXIS)  # (n_dev, cb, cb)
        panel = panel.reshape(cap, cb)
        upd = jnp.dot(lij, panel.T, preferred_element_type=jnp.float32).astype(
            a.dtype
        )  # (cb, cap)
        trailing = (col >= c0 + cb)[None, :]
        a = a - jnp.where((me > j) & trailing, upd, 0.0)
    return l


def solve2d_local(l: jax.Array, b: jax.Array, *, trans: bool = False) -> jax.Array:
    """Solve L x = b (or L^T x = b) with L row-sharded, b/x replicated.

    ``l``: (cb, cap) my block-row of the factor; ``b``: (cap, r) replicated.
    Returns the replicated (cap, r) solution (identical on every device).
    Traffic: one (cb, r) psum per panel — O(cap * r) total.
    """
    n_dev = jax.lax.axis_size(AXIS)
    cb, cap = l.shape
    me = _me()
    x = jnp.zeros_like(b)

    if not trans:
        for j in range(n_dev):  # forward substitution over panels
            c0 = j * cb
            # Owner's rhs correction uses only already-solved x blocks
            # (x is zero on unsolved blocks, L columns >= c0+cb are zero on
            # the owner's rows, so the full-width dot equals the prefix dot).
            rhs = b[c0 : c0 + cb] - jnp.dot(
                l, x, preferred_element_type=jnp.float32
            ).astype(b.dtype)
            xj = jax.lax.linalg.triangular_solve(
                l[:, c0 : c0 + cb], rhs, left_side=True, lower=True
            )
            xj = jax.lax.psum(jnp.where(me == j, xj, 0.0), AXIS)
            x = jax.lax.dynamic_update_slice(x, xj, (c0, 0))
        return x

    for j in reversed(range(n_dev)):  # backward substitution for L^T
        c0 = j * cb
        # Each device's L_{me,j}^T x_{me} term: zero for me < j (lower
        # triangular) and for unsolved me == j (x block still zero), so the
        # psum is exactly the solved-suffix correction sum_{i>j} L_ij^T x_i.
        x_own = jax.lax.dynamic_slice(x, (me * cb, 0), (cb, x.shape[1]))
        term = jnp.dot(
            l[:, c0 : c0 + cb].T, x_own, preferred_element_type=jnp.float32
        ).astype(b.dtype)
        corr = jax.lax.psum(term, AXIS)
        rhs = b[c0 : c0 + cb] - corr
        xj = jax.lax.linalg.triangular_solve(
            l[:, c0 : c0 + cb], rhs, left_side=True, lower=True, transpose_a=True
        )
        xj = jax.lax.psum(jnp.where(me == j, xj, 0.0), AXIS)
        x = jax.lax.dynamic_update_slice(x, xj, (c0, 0))
    return x


def whiten2d_local(l: jax.Array, k_cols: jax.Array) -> jax.Array:
    """2-D whitening solve: V = L^-1 K with L row-sharded, K column-sharded.

    ``l``: (cb, cap) my block-row of the factor.
    ``k_cols``: (cap, n_loc) my *column* shard of the cross-kernel
    K_l,corpus — the layout ``parallel/sharded.py`` keeps ``v`` in.

    Each panel of L is broadcast once ((cb, cap) psum, O(cap^2) total — the
    same order as the factorization itself) and every device forward-
    substitutes its own columns; no traffic is proportional to the corpus.
    Returns my (cap, n_loc) column shard of V.
    """
    n_dev = jax.lax.axis_size(AXIS)
    cb, cap = l.shape
    me = _me()
    v = jnp.zeros_like(k_cols)
    for j in range(n_dev):
        c0 = j * cb
        lj = jax.lax.psum(jnp.where(me == j, l, 0.0), AXIS)  # (cb, cap)
        rhs = k_cols[c0 : c0 + cb] - jnp.dot(
            lj, v, preferred_element_type=jnp.float32
        ).astype(k_cols.dtype)
        vj = jax.lax.linalg.triangular_solve(
            lj[:, c0 : c0 + cb], rhs, left_side=True, lower=True
        )
        v = jax.lax.dynamic_update_slice(v, vj, (c0, 0))
    return v


# ---------------------------------------------------------------------------
# Host-facing factories
# ---------------------------------------------------------------------------


def _check_divisible(cap: int, mesh) -> None:
    n_dev = mesh.shape[AXIS]
    if cap % n_dev != 0:
        raise ValueError(
            f"cap={cap} must divide evenly over the {n_dev}-device mesh for "
            f"the block-row layout; round the capacity up to a multiple of "
            f"{n_dev} (GPConfig.cap already pads to a multiple of 8)"
        )


def make_sharded_cholesky(mesh):
    """jitted ``(k_ll (cap,cap) row-sharded, active (cap,), noise) -> L row-sharded``."""
    sm = jax.shard_map(
        chol2d_local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(), P()),
        out_specs=P(AXIS, None),
    )

    @jax.jit
    def fn(k_ll, active, noise):
        _check_divisible(k_ll.shape[0], mesh)
        return sm(k_ll, active, noise)

    return fn


def make_sharded_cho_solve(mesh):
    """jitted ``(L row-sharded, b (cap,r) replicated) -> K_ll^-1 b replicated``."""

    def cho_solve_local(l, b):
        return solve2d_local(l, solve2d_local(l, b), trans=True)

    fn = jax.shard_map(
        cho_solve_local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def make_sharded_whiten(mesh):
    """jitted ``(L row-sharded, K (cap,N) column-sharded) -> V column-sharded``."""
    fn = jax.shard_map(
        whiten2d_local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS)),
        out_specs=P(None, AXIS),
    )
    return jax.jit(fn)


def shard_rows(a, mesh):
    """Lay a (cap, ...) array out block-row over the mesh."""
    return jax.device_put(a, NamedSharding(mesh, P(AXIS, *([None] * (a.ndim - 1)))))
