"""TPU-native Gaussian-process relevance model.

Reference parity: ``italia/gp.py :: GaussianProcess`` (SURVEY.md C1) — an exact
GP over a fixed corpus with an RBF kernel, fit on user labels in {-1, +1} (the
query counts as +1), exposing predictive mean/variance/covariance for arbitrary
index subsets and hypothetical posterior updates.

TPU-first design (NOT a port):

* The corpus feature matrix ``x`` (N, D) is HBM-resident; kernel blocks are
  computed on demand on the MXU (the reference materializes the full N x N Gram
  matrix up front — O(N^2) memory — and indexes into it).
* The labeled set lives in **fixed-capacity padded buffers** (``cap`` slots,
  ``count`` used) so ``fit``/``update``/``predict`` trace and compile exactly
  once — no recompiles as the labeled set grows (SURVEY.md section 7 "static-shape
  discipline").
* The state carries the *whitened cross-kernel* ``v = L^-1 K_l,corpus`` (cap, N)
  instead of the Gram matrix: every quantity other layers need — posterior mean,
  variance, covariance between any subset, hypothetical one-point updates — is a
  cheap contraction against ``v``:

      mu      = v^T beta              (beta = L^-1 y)
      sig2    = k(x,x) - sum_r v_r^2
      cov(i,j)= k(x_i,x_j) - v_i . v_j

* New labels are absorbed with an **incremental block Cholesky append**
  (O(b * cap * N)) rather than the reference's per-round refit
  (O(cap^3 + cap^2 * N)); ``gp_fit`` (from scratch) and ``gp_update``
  (incremental) are equal to tolerance — tested.
* For multi-chip runs, ``x`` / ``v`` / ``mu`` / ``sig2`` hold this chip's corpus
  shard while ``l`` / ``beta`` / the label buffers are replicated; the only
  cross-chip dependency of a fit is gathering the (cap, D) labeled features,
  injected via the ``gather`` argument (see ``ital_tpu.parallel``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ital_tpu.ops import chol as chol_ops
from ital_tpu.ops.kernels import rbf_kernel


@struct.dataclass
class GPHyper:
    """RBF-GP hyperparameters (reference ctor args of ``GaussianProcess``)."""

    length_scale: jax.Array  # scalar
    var: jax.Array  # scalar kernel variance sigma^2
    noise: jax.Array  # scalar observation noise added on the labeled diagonal


@struct.dataclass
class GPState:
    """Padded, jit-once GP posterior state over a (possibly sharded) corpus.

    Shapes (cap = labeled-slot capacity, N = corpus rows on this chip):
      x (N, D) | idx (cap,) | y (cap,) | valid (cap,) | count () |
      l (cap, cap) | beta (cap,) | v (cap, N) | mu (N,) | sig2 (N,)

    ``valid`` marks slots that carry a real label; slots < ``count`` with
    ``valid == False`` are occupied-but-inert (the simulated user skipped that
    item) — they consume capacity but are mathematically absent, which keeps the
    per-round append a fixed-size block (static shapes).
    """

    x: jax.Array
    idx: jax.Array
    y: jax.Array
    valid: jax.Array
    count: jax.Array
    l: jax.Array
    beta: jax.Array
    v: jax.Array
    mu: jax.Array
    sig2: jax.Array
    hyper: GPHyper
    # Optional corpus information-density vector (N,), used by density-weighted
    # baselines — compute once per dataset via ``corpus_density`` and attach
    # with ``state.replace(density=...)``.
    density: Optional[jax.Array] = None
    # Cached corpus squared row norms (N,), computed once by ``gp_init``.
    # Every corpus-side kernel block reuses them instead of re-reading the
    # whole (N, D) feature matrix for its norm pass — at 1M x 512 that pass
    # is 2 GB (~2.5 ms of the 13.3 ms measured gp_update slope,
    # results/round_term_split.json).  Optional so restored/hand-built states
    # without it still work (kernels fall back to recomputing).
    x2: Optional[jax.Array] = None

    @property
    def active(self) -> jax.Array:
        """(cap,) bool — slots that really participate in the posterior."""
        slot_ids = jnp.arange(self.idx.shape[0])
        return (slot_ids < self.count) & self.valid

    @property
    def cap(self) -> int:
        return self.idx.shape[0]


GatherFn = Callable[[jax.Array], jax.Array]  # global idx (k,) -> features (k, D)


def gp_init(
    x: jax.Array,
    length_scale: float,
    var: float,
    noise: float,
    cap: int,
    *,
    corpus_dtype: Optional[str] = None,
) -> GPState:
    """Fresh GP over corpus ``x`` with an empty labeled set.

    Reference parity: ``GaussianProcess.__init__`` minus the eager N x N kernel
    precomputation (deliberately dropped — see module docstring).

    ``corpus_dtype`` (e.g. ``"bfloat16"``) stores the CORPUS in a narrower
    dtype while the posterior buffers (``v``/``mu``/``sig2``/...) keep the
    input dtype: on TPU the default f32 matmul already multiplies in bf16
    passes (docs/ARCHITECTURE.md "Long-horizon drift"), so bf16 corpus
    storage costs little extra precision on the MXU cross-kernels while
    halving both the dominant HBM read of gp_update (the (N, D) corpus
    stream) and the corpus footprint per chip.  ``x2`` norms are computed in
    f32 from the STORED values, so self-distances stay exactly zero.  Note
    ``GP.matmul_precision=highest`` cannot restore f32 inputs once the
    corpus is stored bf16 — pick one or the other.
    """
    n = x.shape[0]
    # Posterior-state dtype, independent of the corpus storage: at least f32
    # even when the corpus arrives pre-quantized (the serving layer casts its
    # one shared copy ONCE and every session init sees bf16 input).
    dt = jnp.promote_types(x.dtype, jnp.float32)
    if corpus_dtype is not None:
        x = x.astype(jnp.dtype(corpus_dtype))
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    hyper = GPHyper(
        length_scale=jnp.asarray(length_scale, dt),
        var=jnp.asarray(var, dt),
        noise=jnp.asarray(noise, dt),
    )
    return GPState(
        x=x,
        idx=jnp.zeros((cap,), jnp.int32),
        y=jnp.zeros((cap,), dt),
        valid=jnp.zeros((cap,), bool),
        count=jnp.zeros((), jnp.int32),
        l=jnp.eye(cap, dtype=dt),
        beta=jnp.zeros((cap,), dt),
        v=jnp.zeros((cap, n), dt),
        mu=jnp.zeros((n,), dt),
        sig2=jnp.full((n,), var, dt),
        hyper=hyper,
        x2=jnp.sum(xf * xf, axis=-1),
    )


def _labeled_features(state: GPState, gather: Optional[GatherFn]) -> jax.Array:
    if gather is None:
        return state.x[state.idx]
    return gather(state.idx)


def gp_fit(state: GPState, *, gather: Optional[GatherFn] = None) -> GPState:
    """Refit the posterior from the label buffers (from-scratch Cholesky).

    Reference parity: ``GaussianProcess.fit`` (SURVEY.md section 3.3).  ``gather``
    overrides how labeled features are fetched (cross-chip collective gather in
    the sharded path); everything downstream is shard-local.
    """
    h = state.hyper
    active = state.active
    xl = _labeled_features(state, gather)  # (cap, D)

    k_ll = rbf_kernel(xl, xl, h.length_scale, h.var)
    l = chol_ops.padded_cholesky(k_ll, active, h.noise)

    k_l_all = rbf_kernel(xl, state.x, h.length_scale, h.var, b2=state.x2)  # (cap, N)
    k_l_all = jnp.where(active[:, None], k_l_all, 0.0)
    v = chol_ops.tri_solve(l, k_l_all)
    beta = chol_ops.tri_solve(l, jnp.where(active, state.y, 0.0)[:, None])[:, 0]

    mu = jnp.dot(v.T, beta, preferred_element_type=jnp.float32).astype(state.mu.dtype)
    sig2 = jnp.maximum(h.var - jnp.sum(v * v, axis=0), 1e-8)
    return state.replace(l=l, beta=beta, v=v, mu=mu, sig2=sig2)


def gp_set_query(
    state: GPState, query_idx: jax.Array, *, gather: Optional[GatherFn] = None
) -> GPState:
    """Reset the session to a single positive label at the query image.

    Reference parity: ``ActiveRetrievalBase.update_query`` — the query counts as
    a relevant (+1) annotation (SURVEY.md section 3.1).
    """
    cap = state.cap
    dt = state.mu.dtype
    state = state.replace(
        idx=jnp.zeros((cap,), jnp.int32).at[0].set(query_idx.astype(jnp.int32)),
        y=jnp.zeros((cap,), dt).at[0].set(1.0),
        valid=jnp.zeros((cap,), bool).at[0].set(True),
        count=jnp.ones((), jnp.int32),
    )
    return gp_fit(state, gather=gather)


def gp_update(
    state: GPState,
    new_idx: jax.Array,
    new_y: jax.Array,
    new_valid: jax.Array,
    *,
    gather: Optional[GatherFn] = None,
) -> GPState:
    """Absorb a feedback block of ``b`` slots with an incremental Cholesky append.

    This is the "rank-1/low-rank posterior update" of the north star
    (BASELINE.md): O(b * cap * N) instead of the reference's per-round refit.
    Produces the same state as appending to the buffers and calling
    :func:`gp_fit` (tested to tolerance).

    Args:
      new_idx: (b,) global corpus indices shown to the user this round.
      new_y: (b,) labels in {-1, +1} (ignored where ``new_valid`` is False).
      new_valid: (b,) bool — False where the user skipped the item.

    Capacity: callers must ensure ``count + b <= cap`` — ``count`` is traced,
    so this cannot raise under jit; past capacity, ``dynamic_update_slice``
    clamps the write offset and would silently overwrite the last slots.  Both
    host-side entry points enforce it: the runner validates
    ``1 + n_rounds * batch_size <= cap`` up front and the interactive session
    API checks per update (``ActiveRetrieval.update``).
    """
    h = state.hyper
    b = new_idx.shape[0]
    active_old = state.active
    new_idx = new_idx.astype(jnp.int32)
    new_y = jnp.where(new_valid, new_y, 0.0).astype(state.mu.dtype)

    xl = _labeled_features(state, gather)  # (cap, D) current slots
    xb = state.x[new_idx] if gather is None else gather(new_idx)  # (b, D)

    k_lb = rbf_kernel(xl, xb, h.length_scale, h.var)
    k_lb = jnp.where(active_old[:, None], k_lb, 0.0)
    k_bb = rbf_kernel(xb, xb, h.length_scale, h.var)

    l_new, s, l_b = chol_ops.chol_append_block(
        state.l, k_lb, k_bb, state.count, new_valid, h.noise
    )

    # Extend whitened quantities by the same block.
    k_b_all = rbf_kernel(xb, state.x, h.length_scale, h.var, b2=state.x2)  # (b, N)
    k_b_all = jnp.where(new_valid[:, None], k_b_all, 0.0)
    stv = jnp.dot(s.T, state.v, preferred_element_type=jnp.float32).astype(state.mu.dtype)
    v_b = chol_ops.tri_solve(l_b, k_b_all - stv)  # (b, N)
    beta_b = chol_ops.tri_solve(
        l_b,
        (new_y - jnp.dot(s.T, state.beta,
                         preferred_element_type=jnp.float32).astype(state.mu.dtype)
         )[:, None],
    )[:, 0]

    v = jax.lax.dynamic_update_slice(state.v, v_b, (state.count, 0))
    beta = jax.lax.dynamic_update_slice(state.beta, beta_b, (state.count,))
    mu = state.mu + jnp.dot(
        v_b.T, beta_b, preferred_element_type=jnp.float32
    ).astype(state.mu.dtype)
    sig2 = jnp.maximum(state.sig2 - jnp.sum(v_b * v_b, axis=0), 1e-8)

    return state.replace(
        idx=jax.lax.dynamic_update_slice(state.idx, new_idx, (state.count,)),
        y=jax.lax.dynamic_update_slice(state.y, new_y, (state.count,)),
        valid=jax.lax.dynamic_update_slice(state.valid, new_valid, (state.count,)),
        count=state.count + b,
        l=l_new,
        beta=beta,
        v=v,
        mu=mu,
        sig2=sig2,
    )


def stack_session_states(states, *, with_density: bool = True) -> GPState:
    """Batch K same-corpus session states on a leading cohort axis.

    The canonical cohort stacker shared by the serving endpoints
    (``ital_tpu.serve``) and the mesh-sharded cohort programs
    (``ital_tpu.parallel.sharded``).  Call INSIDE a jitted program only: on
    the host each leaf stack is its own device dispatch, which measured
    slower than per-session work behind a high-RTT link (serve.py docstring).

    The corpus buffer ``x`` and its cached norms ``x2`` are corpus-shared and
    stay unbatched; hyperparameters batch (sessions may have learned
    different values).  ``with_density=False`` drops the density vector from
    the batched state — correct for programs that never read it
    (``gp_update``), which lets mixed-density cohorts batch; callers reattach
    each session's own vector on unstack.  With ``with_density=True`` the
    caller must have verified the group shares ONE density vector
    (``serve._density_compatible``).
    """
    sts = tuple(states)
    stack = lambda leaves: jnp.stack(leaves)
    return GPState(
        x=sts[0].x,
        idx=stack([t.idx for t in sts]),
        y=stack([t.y for t in sts]),
        valid=stack([t.valid for t in sts]),
        count=stack([t.count for t in sts]),
        l=stack([t.l for t in sts]),
        beta=stack([t.beta for t in sts]),
        v=stack([t.v for t in sts]),
        mu=stack([t.mu for t in sts]),
        sig2=stack([t.sig2 for t in sts]),
        hyper=GPHyper(
            length_scale=stack([t.hyper.length_scale for t in sts]),
            var=stack([t.hyper.var for t in sts]),
            noise=stack([t.hyper.noise for t in sts]),
        ),
        density=(sts[0].density if with_density else None),
        x2=sts[0].x2,
    )


# ---------------------------------------------------------------------------
# Prediction surface (reference: GaussianProcess.predict_stored /
# updated_prediction; SURVEY.md sections 3.3-3.4).
# ---------------------------------------------------------------------------


def gp_predict_mean(state: GPState, ind: jax.Array) -> jax.Array:
    """Posterior mean at corpus indices ``ind`` (local to this chip's shard)."""
    return state.mu[ind]


def gp_predict_diag(state: GPState, ind: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Posterior mean and marginal variance at ``ind``."""
    return state.mu[ind], state.sig2[ind]


def gp_predict_full(state: GPState, ind: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Posterior mean and full covariance over the subset ``ind`` (k,).

    ``cov = K(ind, ind) - V[:, ind]^T V[:, ind]`` — the ``cov_mode='full'`` path
    of the reference's ``predict_stored``.
    """
    xi = state.x[ind]
    k_ii = rbf_kernel(xi, xi, state.hyper.length_scale, state.hyper.var)
    vi = state.v[:, ind]
    cov = k_ii - jnp.dot(vi.T, vi, preferred_element_type=jnp.float32).astype(
        state.mu.dtype
    )
    return state.mu[ind], cov


def gp_posterior_cov_columns(state: GPState, ind: jax.Array) -> jax.Array:
    """Posterior covariance between every corpus point and each of ``ind`` (N, k).

    ``k_post(x, i) = k(x, x_i) - V[:, x] . V[:, i]``.  Used by EMOC-style
    baselines and by ITAL's joint candidate/batch covariance assembly.
    """
    xi = state.x[ind]
    k_cross = rbf_kernel(state.x, xi, state.hyper.length_scale, state.hyper.var,
                         a2=state.x2)
    return k_cross - jnp.dot(
        state.v.T, state.v[:, ind], preferred_element_type=jnp.float32
    ).astype(state.mu.dtype)


def corpus_density(state: GPState, *, block_rows: int = 2048) -> jax.Array:
    """(N,) information density: mean RBF similarity of each point to the corpus.

    Used by density-weighted baselines (SUD / TCAL / AdaptAL; reference:
    ``italia/baseline_methods.py``).  Depends only on the features, so callers
    should compute it once per dataset and reuse it.  Blockwise — never
    materializes N x N at once.

    Routing (measured): the lax path, NOT the Pallas tile kernel — XLA fuses
    the row-mean into the kernel stream, while ``pallas_call`` must write the
    (block, N) tile to HBM first: chip A/B at N=100k measured the Pallas route
    2.1x SLOWER here (2.55 vs 5.27 ms/block — results/pallas_ab.json,
    PROFILE.md §11).  The cached ``x2`` norms ride along as ``a2``/``b2``.
    """
    from ital_tpu.ops.blocking import blocked_map

    x = state.x
    return blocked_map(
        lambda blk, blk2: jnp.mean(
            rbf_kernel(blk, x, state.hyper.length_scale, 1.0,
                       a2=blk2, b2=state.x2), axis=1
        ),
        (x, state.x2),
        block=block_rows,
    )


def gp_updated_whitening(
    state: GPState,
    ind: jax.Array,
    y_hyp: jax.Array,
    valid: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Whitened form of the k-point block hypothetical update (no mutation).

    Adding hypothetical observations ``(ind, y_hyp)`` with the GP's noise is,
    in the whitened representation, just k extra rows on ``v``:

        A  = K_post(ind, ind) + noise * I = La La^T        (k, k)
        w  = La^-1 K_post(ind, corpus)                      (k, N)
        g  = La^-1 (y_hyp - mu[ind])                        (k,)
        mu'   = mu   + w^T g
        sig2' = sig2 - sum_r w_r^2
        K_post'(x, z) = k(x, z) - v_aug[:, x] . v_aug[:, z],
                        v_aug = concat([v, w], axis=0)

    so every downstream consumer of ``(mu, sig2, v)`` — EMOC column reductions,
    MI joint covariances, further one-point updates — works unchanged on the
    hypothetical posterior by substituting ``(mu', sig2', v_aug)``.  This is
    the TPU-native generalization of the reference's ``updated_prediction``
    (SURVEY.md section 3.4) from one point to arbitrary index blocks.

    Args:
      ind: (k,) corpus indices to hypothetically label.
      y_hyp: (k,) hypothetical labels.
      valid: optional (k,) bool — False rows are excluded (their ``w`` row and
        mean shift are exactly zero), mirroring ``gp_update``'s skip semantics.

    Returns ``(g, w)``; combine as above or use :func:`gp_updated_prediction`.
    """
    h = state.hyper
    _, cov = gp_predict_full(state, ind)  # (k, k) posterior block
    cross = gp_posterior_cov_columns(state, ind).T  # (k, N)
    resid = y_hyp.astype(state.mu.dtype) - state.mu[ind]
    if valid is None:
        valid = jnp.ones(ind.shape[0], bool)
    cross = jnp.where(valid[:, None], cross, 0.0)
    resid = jnp.where(valid, resid, 0.0)
    la = chol_ops.padded_cholesky(cov, valid, h.noise)
    w = chol_ops.tri_solve(la, cross)
    g = chol_ops.tri_solve(la, resid[:, None])[:, 0]
    return g, w


def gp_updated_prediction(
    state: GPState,
    ind: jax.Array,
    y_hyp: jax.Array,
    valid: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Corpus-wide ``(mu', sig2')`` if the block ``(ind, y_hyp)`` were labeled.

    Reference parity: ``GaussianProcess.updated_prediction`` over an arbitrary
    index set (SURVEY.md section 3.4) — the reference's batch hypothetical
    posterior, here in closed form against the whitened state (no refit, no
    mutation).  Equals refitting with the block appended (tested vs the f64
    oracle and vs ``gp_update``).
    """
    g, w = gp_updated_whitening(state, ind, y_hyp, valid)
    mu = state.mu + jnp.dot(w.T, g, preferred_element_type=jnp.float32).astype(
        state.mu.dtype
    )
    sig2 = jnp.maximum(state.sig2 - jnp.sum(w * w, axis=0), 1e-8)
    return mu, sig2


def gp_updated_mean_delta(
    state: GPState, cand: jax.Array, y_hyp: jax.Array
) -> jax.Array:
    """Change of the posterior mean over the whole corpus if ``cand`` were labeled.

    Closed-form one-point hypothetical update (reference:
    ``GaussianProcess.updated_prediction``, SURVEY.md section 3.4): adding
    observation (x_c, y) with noise sn^2 shifts the mean by

        delta_mu(x) = k_post(x, c) * (y - mu_c) / (sig2_c + sn^2)

    Returns (N,) — no state is mutated.
    """
    kcol = gp_posterior_cov_columns(state, cand[None])[:, 0]
    gain = (y_hyp - state.mu[cand]) / (state.sig2[cand] + state.hyper.noise)
    return kcol * gain
