"""Sharded feedback rounds: corpus-parallel MI scan with explicit ICI collectives.

BASELINE.json config 5: "100k-image corpus: blockwise RBF kernel + MI scoring
sharded across v5e-8 via ICI psum".  The corpus axis is sharded over the mesh:

=====================  =========================  =======================
array                  shape                      sharding (axis 'data')
=====================  =========================  =======================
features ``x``         (N, D)                     rows sharded
whitened kernel ``v``  (cap, N)                   columns sharded
``mu`` / ``sig2``      (N,)                       sharded
label buffers, ``l``,  (cap, ...), scalars        replicated
``beta``, ``count``
=====================  =========================  =======================

Each chip scores ITS corpus shard's candidates (the same
:func:`ital_tpu.select.ital.mi_scores_from_moments` core as the single-device
path); the only cross-chip traffic per greedy step is an O(cap x b) feature/
kernel-column gather (``psum`` of masked local contributions) and an O(n_dev)
``all_gather`` of per-shard argmax winners — all over ICI.  The GP update runs
through the regular :func:`ital_tpu.models.gp.gp_update` with a collective
``gather`` closure injected, so sharded and single-device posteriors are the
same code path (tested bit-close in ``tests/test_sharded.py``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ital_tpu.data.user import simulate_feedback
from ital_tpu.models import gp as gp_mod
from ital_tpu.models.gp import GPState
from ital_tpu.parallel.mesh import CORPUS_AXIS
from ital_tpu.select.base import StrategyParams
from ital_tpu.select.ital import _step_shift, mi_scores_from_moments
from ital_tpu.utils.metrics import average_precision, recall_at_k


class LearnConfig(NamedTuple):
    """Online hyperparameter-learning knobs threaded into fused/cohort device
    programs (mirrors the ``[GP] learn_*`` config keys; see GPConfig).

    ``prior_strength``/``center`` select MAP type-II (log-normal priors
    anchored at ``center`` = the config-initial (ls, var, noise) floats);
    ``noise_floor`` projects the learned noise onto a lower bound.  All
    plain Python numbers — they close over the traced program as constants,
    exactly like ``steps``/``lr``."""

    every: int
    steps: int = 50
    lr: float = 0.05
    learn_noise: bool = True
    prior_strength: float = 0.0
    noise_floor: float = 0.0
    center: tuple = ()  # (length_scale, var, noise) when prior_strength > 0


def pad_to_devices(x, n_dev: int, *, axis: int = 0):
    """Pad ``x`` with zero rows so axis 0 divides evenly across ``n_dev`` shards.

    Returns ``(padded, n_real)``; callers must mask the pad positions out of
    selection and metrics (see ``make_masks``).
    """
    import numpy as np

    n = x.shape[axis]
    n_pad = (-n) % n_dev
    if n_pad == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, n_pad)
    return np.pad(np.asarray(x), pad_width), n


def make_masks(n_padded: int, n_real: int, query: int):
    """(sel_forbid, ap_exclude): pad rows are unselectable and outside the metric;
    the query is additionally excluded from the AP ranking (reference protocol)."""
    pad = jnp.arange(n_padded) >= n_real
    ap_exclude = pad.at[query].set(True)
    return pad, ap_exclude


def state_pspecs(state: GPState) -> GPState:
    """PartitionSpec pytree matching the table in the module docstring."""
    ax = CORPUS_AXIS
    return GPState(
        x=P(ax, None),
        idx=P(), y=P(), valid=P(), count=P(),
        l=P(), beta=P(),
        v=P(None, ax),
        mu=P(ax), sig2=P(ax),
        hyper=gp_mod.GPHyper(length_scale=P(), var=P(), noise=P()),
        density=None if state.density is None else P(ax),
        x2=None if state.x2 is None else P(ax),
    )


def shard_state(state: GPState, mesh) -> GPState:
    """Lay the state out over the mesh (corpus axis sharded, rest replicated)."""
    specs = state_pspecs(state)
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        state, specs,
    )


# ---------------------------------------------------------------------------
# Collective helpers (inside shard_map; axis = CORPUS_AXIS)
# ---------------------------------------------------------------------------


def _offset(shard_n: int) -> jax.Array:
    return jax.lax.axis_index(CORPUS_AXIS) * shard_n


def gather_rows(x_local: jax.Array, gidx: jax.Array) -> jax.Array:
    """(k,) global corpus indices -> (k, D) replicated rows, via masked psum.

    Each chip contributes the rows it owns (zeros elsewhere); one ICI psum
    assembles the full block on every chip.
    """
    shard_n = x_local.shape[0]
    rel = gidx.astype(jnp.int32) - _offset(shard_n)
    ok = (rel >= 0) & (rel < shard_n)
    rows = x_local[jnp.clip(rel, 0, shard_n - 1)]
    rows = jnp.where(ok[:, None], rows, 0)
    return jax.lax.psum(rows, CORPUS_AXIS)


def gather_cols(v_local: jax.Array, gidx: jax.Array) -> jax.Array:
    """(k,) global indices -> (cap, k) replicated columns of the sharded ``v``."""
    shard_n = v_local.shape[1]
    rel = gidx.astype(jnp.int32) - _offset(shard_n)
    ok = (rel >= 0) & (rel < shard_n)
    cols = v_local[:, jnp.clip(rel, 0, shard_n - 1)]
    cols = jnp.where(ok[None, :], cols, 0)
    return jax.lax.psum(cols, CORPUS_AXIS)


def gather_scalars(s_local: jax.Array, gidx: jax.Array) -> jax.Array:
    """(k,) global indices -> (k,) replicated entries of a sharded vector."""
    shard_n = s_local.shape[0]
    rel = gidx.astype(jnp.int32) - _offset(shard_n)
    ok = (rel >= 0) & (rel < shard_n)
    vals = jnp.where(ok, s_local[jnp.clip(rel, 0, shard_n - 1)], 0)
    return jax.lax.psum(vals, CORPUS_AXIS)


def global_argmax(scores_local: jax.Array) -> jax.Array:
    """Argmax over the full sharded vector; ties break to the lowest index,
    matching ``jnp.argmax`` on the unsharded array."""
    shard_n = scores_local.shape[0]
    li = jnp.argmax(scores_local)
    lv = scores_local[li]
    gi = (li + _offset(shard_n)).astype(jnp.int32)
    vs = jax.lax.all_gather(lv, CORPUS_AXIS)  # (n_dev,)
    gs = jax.lax.all_gather(gi, CORPUS_AXIS)
    return gs[jnp.argmax(vs)]


def local_slot_mask(state: GPState, *, extra_forbid: jax.Array) -> jax.Array:
    """This shard's 'do not select' mask: labeled slots owned here + pad rows."""
    shard_n = state.x.shape[0]
    rel = state.idx - _offset(shard_n)
    ok = (rel >= 0) & (rel < shard_n)
    slot_ids = jnp.arange(state.cap)
    slot_excl = ok & (slot_ids < state.count) & state.valid
    mask = (
        jnp.zeros((shard_n,), jnp.int32)
        .at[jnp.clip(rel, 0, shard_n - 1)]
        .add(slot_excl.astype(jnp.int32))
        > 0
    )
    return mask | extra_forbid


# ---------------------------------------------------------------------------
# Sharded selection strategies (local scores -> collective greedy argmax)
# ---------------------------------------------------------------------------


def _sharded_ital_scores(state, batch, t, params, n_qmc, shift=None,
                         block=1024):
    """Local-shard MI scores for greedy step t — the sharded MI scan.

    ``shift`` (replicated — every chip must score with the SAME lattice for
    the collective argmax to agree) mirrors the single-device randomized-QMC
    option (:func:`ital_tpu.select.ital.select_ital` ``qmc_key``)."""
    h = state.hyper
    from ital_tpu.ops.kernels import rbf_kernel

    bsel = batch[:t]
    if t > 0:
        xb = gather_rows(state.x, bsel)  # (t, D) replicated
        vb = gather_cols(state.v, bsel)  # (cap, t) replicated
        mu_b = gather_scalars(state.mu, bsel)  # (t,) replicated
        k_bb = rbf_kernel(xb, xb, h.length_scale, h.var)
        cov_bb = k_bb - vb.T @ vb + params.jitter * jnp.eye(t, dtype=state.mu.dtype)
        k_cb = rbf_kernel(state.x, xb, h.length_scale, h.var,
                          a2=state.x2)  # (shard_n, t)
        cross = k_cb - jnp.dot(
            state.v.T, vb, preferred_element_type=jnp.float32
        ).astype(state.mu.dtype)
    else:
        dt = state.mu.dtype
        mu_b = jnp.zeros((0,), dt)
        cov_bb = jnp.zeros((0, 0), dt)
        cross = jnp.zeros((state.x.shape[0], 0), dt)
    return mi_scores_from_moments(
        state.mu, state.sig2 + params.jitter, cross, mu_b, cov_bb, params,
        t=t, n_qmc=n_qmc, block=block, shift=shift,
    )


def _sharded_refined_pick(
    state: GPState,
    batch: jax.Array,
    t: int,
    params: StrategyParams,
    scores_masked_local: jax.Array,
    forbid_local: jax.Array,
    refine_top: int,
    refine_n_qmc: int,
    shift: jax.Array | None = None,
) -> jax.Array:
    """Two-stage greedy pick on the mesh — sharded mirror of
    :func:`ital_tpu.select.ital.refined_pick`.

    The global top-``refine_top`` candidates by base-scan score are assembled
    exactly as the single-device ``top_k`` would order them
    (:func:`_sharded_pool_indices` with the scores as ranking), their moments
    gathered with the usual collectives, and the refined ``refine_n_qmc``
    re-score runs REPLICATED on every chip (O(refine_top x 2^m x n_qmc) —
    negligible against the O(N/p) base scan, and replication avoids a second
    collective argmax: every chip computes the same winner).
    """
    from ital_tpu.ops.kernels import rbf_kernel

    h = state.hyper
    dt = state.mu.dtype
    top_gidx, top_forbid = _sharded_pool_indices(
        state, forbid_local, refine_top, refine_top, scores_masked_local
    )
    xc = gather_rows(state.x, top_gidx)  # (T, D) replicated
    vc = gather_cols(state.v, top_gidx)  # (cap, T) replicated
    mu_c = gather_scalars(state.mu, top_gidx)
    sig2_c = gather_scalars(state.sig2, top_gidx) + params.jitter
    bsel = batch[:t]
    if t > 0:
        xb = gather_rows(state.x, bsel)
        vb = gather_cols(state.v, bsel)
        mu_b = gather_scalars(state.mu, bsel)
        k_bb = rbf_kernel(xb, xb, h.length_scale, h.var)
        cov_bb = k_bb - vb.T @ vb + params.jitter * jnp.eye(t, dtype=dt)
        k_cb = rbf_kernel(xc, xb, h.length_scale, h.var)
        cross = k_cb - jnp.dot(
            vc.T, vb, preferred_element_type=jnp.float32
        ).astype(dt)
    else:
        mu_b = jnp.zeros((0,), dt)
        cov_bb = jnp.zeros((0, 0), dt)
        cross = jnp.zeros((refine_top, 0), dt)
    refined = mi_scores_from_moments(
        mu_c, sig2_c, cross, mu_b, cov_bb, params, t=t, n_qmc=refine_n_qmc,
        shift=shift,
    )
    refined = jnp.where(top_forbid, -jnp.inf, refined)
    return top_gidx[jnp.argmax(refined)].astype(jnp.int32)


def _ring_colabs(state: GPState, v: jax.Array, pad_local: jax.Array) -> jax.Array:
    """``sum_x |k_post(x, c)|`` for this shard's candidates, via a ring pass.

    Each chip keeps its candidate columns ``v[:, local]`` fixed and
    accumulates the posterior-covariance column-abs-sums as every
    (x block, v block) pair visits over the ICI ring — the O(N^2) interaction
    split p ways (:mod:`ital_tpu.parallel.ring`).  ``v`` may be the state's
    whitened cross-kernel or a hypothetical augmentation of it (batch EMOC).
    ``pad_local`` flags this shard's pad rows; the mask travels the ring so
    pad rows never contribute (they would otherwise skew scores whenever
    N % n_dev != 0).
    """
    from ital_tpu.ops.kernels import rbf_kernel
    from ital_tpu.parallel.ring import ring_reduce_over_corpus

    h = state.hyper
    xc = state.x
    valid_local = 1.0 - pad_local.astype(state.mu.dtype)

    def acc_fn(acc, blk):
        xb, vtb, valid_b = blk
        k = rbf_kernel(xb, xc, h.length_scale, h.var)  # (blk_n, n_loc)
        k_post = k - jnp.dot(vtb, v, preferred_element_type=jnp.float32).astype(
            state.mu.dtype
        )
        return acc + jnp.sum(jnp.abs(k_post) * valid_b[:, None], axis=0)

    return ring_reduce_over_corpus(
        (state.x, v.T, valid_local),
        acc_fn,
        jnp.zeros(xc.shape[0], state.mu.dtype),
    )


def _sharded_emoc_scores(
    state: GPState, params: StrategyParams, pad_local: jax.Array
) -> jax.Array:
    """EMOC over the sharded corpus (mirror of ``select_emoc``)."""
    from ital_tpu.select.baselines import emoc_scores_from_moments

    colabs = _ring_colabs(state, state.v, pad_local)
    return emoc_scores_from_moments(
        state.mu, state.sig2, state.hyper.noise, colabs
    )


def _sharded_emoc_batch_scores(
    state: GPState, batch: jax.Array, t: int, params: StrategyParams,
    pad_local: jax.Array,
) -> jax.Array:
    """Batch EMOC on the mesh (mirror of ``select_emoc_batch``).

    The block hypothetical update runs shard-locally from replicated gathered
    block quantities: the (t, t) posterior block and its Cholesky are
    replicated (psum gathers), while the whitening extension ``w`` is computed
    per shard against the local columns — exactly the layout of
    ``gp_updated_whitening`` with ``v`` corpus-column-sharded.  The column
    reduction then rides the same ICI ring as one-point EMOC, with ``v``
    augmented by the ``w`` rows.
    """
    from ital_tpu.ops.chol import padded_cholesky, tri_solve
    from ital_tpu.ops.kernels import rbf_kernel
    from ital_tpu.select.baselines import emoc_scores_from_moments

    if t == 0:
        return _sharded_emoc_scores(state, params, pad_local)

    h = state.hyper
    bsel = batch[:t]
    xb = gather_rows(state.x, bsel)  # (t, D) replicated
    vb = gather_cols(state.v, bsel)  # (cap, t) replicated
    mu_b = gather_scalars(state.mu, bsel)  # (t,) replicated
    cov_bb = rbf_kernel(xb, xb, h.length_scale, h.var) - vb.T @ vb
    k_bc = rbf_kernel(xb, state.x, h.length_scale, h.var,
                      b2=state.x2)  # (t, shard_n)
    cross = k_bc - jnp.dot(
        vb.T, state.v, preferred_element_type=jnp.float32
    ).astype(state.mu.dtype)

    y_hyp = jnp.where(mu_b >= 0.0, 1.0, -1.0)
    la = padded_cholesky(cov_bb, jnp.ones(t, bool), h.noise)  # replicated
    w = tri_solve(la, cross)  # (t, shard_n) local
    g = tri_solve(la, (y_hyp - mu_b)[:, None])[:, 0]  # replicated
    mu_h = state.mu + jnp.dot(
        w.T, g, preferred_element_type=jnp.float32
    ).astype(state.mu.dtype)
    sig2_h = jnp.maximum(state.sig2 - jnp.sum(w * w, axis=0), 1e-8)
    v_aug = jnp.concatenate([state.v, w], axis=0)  # (cap + t, shard_n)

    colabs = _ring_colabs(state, v_aug, pad_local)
    return emoc_scores_from_moments(mu_h, sig2_h, h.noise, colabs)


def _sharded_mcmi_scores(
    state: GPState, params: StrategyParams, pad_local: jax.Array
) -> jax.Array:
    """MCMI[min] over the sharded corpus: hypothetical-entropy sums via the ring.

    For each local candidate c and both hypothetical labels y, accumulates the
    binary entropy of the one-point-updated posterior over every visiting
    corpus block (pad rows masked out via the traveling ``pad_local`` flags);
    the score is ``-max_y`` of the total (same math as the single-device
    ``select_mcmi_min``).
    """
    from ital_tpu.ops.kernels import rbf_kernel
    from ital_tpu.parallel.ring import ring_reduce_over_corpus
    from ital_tpu.select.baselines import _binary_entropy, _phi

    h = state.hyper
    xc, vc = state.x, state.v
    denom = state.sig2 + h.noise  # (n_loc,) per candidate
    gain_pos = (1.0 - state.mu) / denom
    gain_neg = (-1.0 - state.mu) / denom
    valid_local = 1.0 - pad_local.astype(state.mu.dtype)

    def acc_fn(acc, blk):
        xb, vtb, mu_b, sig2_b, valid_b = blk
        k = rbf_kernel(xb, xc, h.length_scale, h.var)
        k_post = k - jnp.dot(vtb, vc, preferred_element_type=jnp.float32).astype(
            state.mu.dtype
        )  # (blk_n, n_loc)
        sig2_new = jnp.maximum(sig2_b[:, None] - k_post**2 / denom[None, :], 1e-8)
        sig_new = jnp.sqrt(sig2_new)

        def ent(gain):
            mu_new = mu_b[:, None] + k_post * gain[None, :]
            return jnp.sum(
                _binary_entropy(_phi(mu_new / sig_new)) * valid_b[:, None], axis=0
            )

        return acc[0] + ent(gain_pos), acc[1] + ent(gain_neg)

    zero = jnp.zeros(xc.shape[0], state.mu.dtype)
    h_pos, h_neg = ring_reduce_over_corpus(
        (state.x, state.v.T, state.mu, state.sig2, valid_local), acc_fn, (zero, zero)
    )
    return -jnp.maximum(h_pos, h_neg)


def _local_score_fn(strategy: str, n_dev: int) -> Callable:
    """Batch-independent local scores for the cheap baselines."""
    from ital_tpu.select.baselines import _binary_entropy, _density, _p_relevant

    def fn(state, key, params):
        if strategy == "topscoring":
            return state.mu
        if strategy == "variance_sampling":
            return state.sig2
        if strategy == "uncertainty_sampling":
            return -jnp.abs(state.mu) / jnp.sqrt(state.sig2)
        if strategy == "borderline_sampling":
            return -jnp.abs(state.mu)
        if strategy == "entropy_sampling":
            return _binary_entropy(_p_relevant(state))
        if strategy == "sud":
            return _binary_entropy(_p_relevant(state)) * _density(state)
        if strategy == "adapt_al":
            eps = 1e-12
            ent = _binary_entropy(_p_relevant(state))
            beta = params.tradeoff
            return jnp.power(ent + eps, beta) * jnp.power(
                _density(state) + eps, 1.0 - beta
            )
        if strategy == "random":
            # Each shard takes its slice of the SAME global (N,) draw the
            # single-device select_random makes — threefry is counter-based
            # per element, so both paths pick identical batches under one
            # seed (cross-path reproducibility, advisor round-1 finding).
            shard_n = state.x.shape[0]
            full = jax.random.uniform(key, (shard_n * n_dev,), state.mu.dtype)
            return jax.lax.dynamic_slice(full, (_offset(shard_n),), (shard_n,))
        raise NotImplementedError(
            f"strategy {strategy!r} has no sharded implementation yet"
        )

    return fn


# ---------------------------------------------------------------------------
# Batch-dependent strategies (diversity / RBMAL / regression) on the shard
# ---------------------------------------------------------------------------


def _sharded_max_sim_to_labeled(state: GPState) -> jax.Array:
    """(n_loc,) max RBF similarity of each local row to any labeled point.

    Labeled features are assembled once per call with a collective gather
    (O(cap x D) over ICI); the similarity matmul itself is shard-local —
    mirrors the single-device ``baselines._max_sim_to_labeled`` exactly.
    """
    from ital_tpu.ops.kernels import rbf_kernel

    xl = gather_rows(state.x, state.idx)  # (cap, D) replicated
    sims = rbf_kernel(state.x, xl, state.hyper.length_scale, 1.0,
                      a2=state.x2)  # (n_loc, cap)
    sims = jnp.where(state.active[None, :], sims, -jnp.inf)
    return jnp.max(sims, axis=1)


def _sharded_batch_max_sim(state: GPState, batch: jax.Array, t: int) -> jax.Array:
    """(n_loc,) max RBF similarity of each local row to the partial batch."""
    from ital_tpu.ops.kernels import rbf_kernel

    xb = gather_rows(state.x, batch[:t])  # (t, D) replicated
    sims = rbf_kernel(state.x, xb, state.hyper.length_scale, 1.0, a2=state.x2)
    return jnp.max(sims, axis=1)


def _sharded_diversity_scores(
    state: GPState, batch: jax.Array, t: int, base: jax.Array,
    weight: jax.Array, sim_lab: jax.Array,
) -> jax.Array:
    """Sharded mirror of ``baselines._diversity_greedy``'s per-step score.

    ``sim_lab`` is the labeled-similarity vector, computed ONCE per round by
    the caller (it is invariant across greedy steps; recomputing it per step
    would repeat its collective gather, which XLA cannot CSE across
    shard_map channel ids).  The penalty is the max over the UNION of labeled
    and chosen items, matching the single-device ``_diversity_greedy``.
    """
    sim = sim_lab
    if t > 0:
        sim = jnp.maximum(sim, _sharded_batch_max_sim(state, batch, t))
    return base - weight * sim


def _sharded_rbmal_scores(
    state: GPState, batch: jax.Array, t: int, n_corpus: jax.Array,
    sim_lab: jax.Array,
) -> jax.Array:
    """Sharded RBMAL step score (mirror of ``baselines.select_rbmal``).

    ``n_corpus`` is the number of REAL corpus rows (rows flagged in the
    caller's forbid mask — e.g. shard padding — are treated as outside the
    corpus for the |U| / (|U| + |L|) trade-off, matching the single-device
    run on the unpadded corpus).  ``sim_lab`` is hoisted by the caller as in
    :func:`_sharded_diversity_scores`.
    """
    n_lab = jnp.sum(state.active.astype(jnp.int32))  # buffers replicated
    unc = 1.0 - jnp.abs(jnp.tanh(state.mu))
    sim = sim_lab
    if t > 0:
        sim = jnp.maximum(sim, _sharded_batch_max_sim(state, batch, t))
    alpha = (n_corpus - n_lab - t) / n_corpus.astype(state.mu.dtype)
    return alpha * (1.0 - sim) + (1.0 - alpha) * unc


def _sharded_regression_scores(
    state: GPState, batch: jax.Array, t: int, params: StrategyParams
) -> jax.Array:
    """Sharded greedy log-det MI for regression (mirror of
    ``select.regression.select_ital_regression``): conditional variance of each
    local candidate given ``batch[:t]``, via the same collective batch-block
    gathers as the sharded ITAL scan."""
    from ital_tpu.ops.kernels import rbf_kernel

    h = state.hyper
    noise = h.noise
    if t == 0:
        cond_var = state.sig2
    else:
        bsel = batch[:t]
        xb = gather_rows(state.x, bsel)  # (t, D) replicated
        vb = gather_cols(state.v, bsel)  # (cap, t) replicated
        k_bb = rbf_kernel(xb, xb, h.length_scale, h.var)
        cov_bb = (
            k_bb
            - vb.T @ vb
            + (noise + params.jitter) * jnp.eye(t, dtype=state.mu.dtype)
        )
        k_cb = rbf_kernel(state.x, xb, h.length_scale, h.var,
                          a2=state.x2)  # (n_loc, t)
        cross = k_cb - jnp.dot(
            state.v.T, vb, preferred_element_type=jnp.float32
        ).astype(state.mu.dtype)
        chol = jnp.linalg.cholesky(cov_bb)
        w = jax.lax.linalg.triangular_solve(
            chol, cross.T, left_side=True, lower=True
        )  # (t, n_loc)
        cond_var = jnp.maximum(state.sig2 - jnp.sum(w * w, axis=0), 1e-10)
    return 0.5 * jnp.log1p(cond_var / noise)


def _sharded_pool_indices(
    state: GPState, forbid_local: jax.Array, pool_size: int, pool_padded: int,
    ranking_local: jax.Array = None,
) -> tuple[jax.Array, jax.Array]:
    """Replicated ``(pool_gidx, pool_forbid)`` — the global top-``pool_size``
    candidates by ``ranking_local`` (default: posterior mean — the reference's
    top-ranked restriction; the random-subsample mode passes a seeded uniform
    draw), padded to ``pool_padded`` slots (pad slots flagged forbidden) so the
    pool divides the mesh.

    Every shard contributes its local top-k; the global pool is the stable
    sort of the gathered (value, index) pairs, which reproduces
    ``jax.lax.top_k``'s lowest-index tie-breaking on the unsharded array
    (shards gather in axis order and local lists are index-ascending among
    ties) — so the pool equals the single-device
    :func:`ital_tpu.select.ital.candidate_pool_indices` pool exactly.  Rows in
    ``forbid_local`` (labeled slots, shard padding) rank ``-inf``; slots that
    land on them (pool larger than the candidate set) come back flagged.
    """
    shard_n = state.mu.shape[0]
    k_local = min(pool_size, shard_n)
    ranking = state.mu if ranking_local is None else ranking_local
    masked = jnp.where(forbid_local, -jnp.inf, ranking)
    vals_l, idx_l = jax.lax.top_k(masked, k_local)
    gidx_l = idx_l.astype(jnp.int32) + _offset(shard_n)
    vals = jax.lax.all_gather(vals_l, CORPUS_AXIS).reshape(-1)
    gidx = jax.lax.all_gather(gidx_l, CORPUS_AXIS).reshape(-1)
    order = jnp.argsort(-vals, stable=True)[:pool_size]
    pool_gidx = gidx[order]
    pool_forbid = ~jnp.isfinite(vals[order])
    pad = pool_padded - pool_gidx.shape[0]
    if pad > 0:
        pool_gidx = jnp.concatenate(
            [pool_gidx, jnp.broadcast_to(pool_gidx[0], (pad,))]
        )
        pool_forbid = jnp.concatenate([pool_forbid, jnp.ones((pad,), bool)])
    return pool_gidx, pool_forbid


def _sharded_ital_pool_greedy(
    state: GPState,
    params: StrategyParams,
    pool_gidx: jax.Array,
    pool_forbid: jax.Array,
    batch_size: int,
    n_qmc: int,
    n_dev: int,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    qmc_key: jax.Array | None = None,
    block: int = 1024,
) -> jax.Array:
    """Compact-pool greedy ITAL on the mesh — cost scales with the pool.

    Sharded mirror of :func:`ital_tpu.select.ital._select_ital_pool`: the
    pool's posterior moments are assembled ONCE per round with collective
    gathers (O(pool x D) + O(cap x pool) ICI bytes), split evenly across the
    mesh (``pool_padded / n_dev`` candidates per chip), and each greedy step
    scores only this chip's pool slice — O(pool/p * 2^m * n_qmc) device work
    per step regardless of corpus size.  The greedy argmax runs in pool-
    position space (all_gather of per-shard winners), so tie-breaking matches
    the single-device compact path (lowest pool position wins).
    """
    from ital_tpu.ops.kernels import rbf_kernel

    h = state.hyper
    dt = state.mu.dtype
    pool_padded = pool_gidx.shape[0]
    pp = pool_padded // n_dev
    start = jax.lax.axis_index(CORPUS_AXIS) * pp

    x_pool = gather_rows(state.x, pool_gidx)  # (Pp, D) replicated
    v_pool = gather_cols(state.v, pool_gidx)  # (cap, Pp) replicated
    mu_pool = gather_scalars(state.mu, pool_gidx)
    sig2_pool = gather_scalars(state.sig2, pool_gidx) + params.jitter

    x_my = jax.lax.dynamic_slice(x_pool, (start, 0), (pp, x_pool.shape[1]))
    v_my = jax.lax.dynamic_slice(v_pool, (0, start), (v_pool.shape[0], pp))
    mu_my = jax.lax.dynamic_slice(mu_pool, (start,), (pp,))
    sig2_my = jax.lax.dynamic_slice(sig2_pool, (start,), (pp,))

    batch = jnp.zeros((batch_size,), jnp.int32)
    forbid = pool_forbid  # replicated (Pp,)
    neg = jnp.asarray(-jnp.inf, dt)
    for t in range(batch_size):
        # Replicated shift (qmc_key is replicated): every chip's slice scores
        # with the SAME randomized lattice, so the collective argmax agrees.
        shift = _step_shift(qmc_key, t, dt)
        bsel = batch[:t]
        if t > 0:
            xb = gather_rows(state.x, bsel)  # (t, D) replicated
            vb = gather_cols(state.v, bsel)  # (cap, t) replicated
            mu_b = gather_scalars(state.mu, bsel)
            k_bb = rbf_kernel(xb, xb, h.length_scale, h.var)
            cov_bb = k_bb - vb.T @ vb + params.jitter * jnp.eye(t, dtype=dt)
            k_pb = rbf_kernel(x_my, xb, h.length_scale, h.var)
            cross = k_pb - jnp.dot(
                v_my.T, vb, preferred_element_type=jnp.float32
            ).astype(dt)
        else:
            mu_b = jnp.zeros((0,), dt)
            cov_bb = jnp.zeros((0, 0), dt)
            cross = jnp.zeros((pp, 0), dt)
        scores = mi_scores_from_moments(
            mu_my, sig2_my, cross, mu_b, cov_bb, params, t=t, n_qmc=n_qmc,
            block=block, shift=shift,
        )
        scores = jnp.where(
            jax.lax.dynamic_slice(forbid, (start,), (pp,)), neg, scores
        )
        if refine_top:
            # Two-stage pick (mirror of the single-device refined_pick): the
            # pool's moments are already replicated, so the full score vector
            # is one all_gather away and the refined re-score runs replicated
            # on every chip — same top_k tie order as the single-device
            # compact path (one contiguous pool-position vector).
            scores_full = jax.lax.all_gather(scores, CORPUS_AXIS).reshape(-1)
            k_top = min(refine_top, pool_padded)
            vals, top = jax.lax.top_k(scores_full, k_top)
            if t > 0:
                k_tb = rbf_kernel(x_pool[top], xb, h.length_scale, h.var)
                cross_top = k_tb - jnp.dot(
                    v_pool[:, top].T, vb, preferred_element_type=jnp.float32
                ).astype(dt)
            else:
                cross_top = jnp.zeros((k_top, 0), dt)
            refined = mi_scores_from_moments(
                mu_pool[top], sig2_pool[top], cross_top, mu_b, cov_bb,
                params, t=t, n_qmc=refine_n_qmc, shift=shift,
            )
            refined = jnp.where(jnp.isfinite(vals), refined, neg)
            win = top[jnp.argmax(refined)].astype(jnp.int32)
        else:
            # Collective argmax in POOL-POSITION space (lowest position on
            # ties, matching the single-device argmax over the pool vector).
            li = jnp.argmax(scores)
            lv = scores[li]
            gpos = (li + start).astype(jnp.int32)
            vs = jax.lax.all_gather(lv, CORPUS_AXIS)
            ps = jax.lax.all_gather(gpos, CORPUS_AXIS)
            win = ps[jnp.argmax(vs)]
        batch = batch.at[t].set(pool_gidx[win])
        forbid = forbid.at[win].set(True)
    return batch


def _sharded_density_local(state: GPState, pad_local: jax.Array) -> jax.Array:
    """(n_loc,) mean RBF similarity to every REAL corpus row — ring pass.

    Sharded equivalent of :func:`ital_tpu.models.gp.corpus_density`: the corpus
    blocks travel the ICI ring (like EMOC/MCMI) so no chip ever sees more than
    its shard; pad rows are masked out of both the sum and the denominator, so
    the result equals the single-device density on the unpadded corpus.
    """
    from ital_tpu.ops.kernels import rbf_kernel
    from ital_tpu.parallel.ring import ring_reduce_over_corpus

    h = state.hyper
    valid_local = 1.0 - pad_local.astype(state.mu.dtype)

    def acc_fn(acc, blk):
        xb, valid_b = blk
        k = rbf_kernel(xb, state.x, h.length_scale, 1.0,
                       b2=state.x2)  # (blk_n, n_loc)
        return (
            acc[0] + jnp.sum(k * valid_b[:, None], axis=0),
            acc[1] + jnp.sum(valid_b),
        )

    s, cnt = ring_reduce_over_corpus(
        (state.x, valid_local),
        acc_fn,
        (jnp.zeros(state.x.shape[0], state.mu.dtype), jnp.zeros((), state.mu.dtype)),
    )
    return s / jnp.maximum(cnt, 1.0)


def make_sharded_density(mesh):
    """Jitted ``fn(state_sharded, pad_mask) -> (N,) sharded density vector``.

    ``pad_mask`` is the replicated (N,) bool flagging shard-padding rows.
    Compute once per dataset and attach with ``state.replace(density=...)``
    (the density-weighted baselines read it exactly like the single-device
    path does).
    """

    def _local(state, pad_full):
        shard_n = state.x.shape[0]
        pad_local = jax.lax.dynamic_slice(pad_full, (_offset(shard_n),), (shard_n,))
        return _sharded_density_local(state, pad_local)

    def wrapped(state, pad_full):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=P(CORPUS_AXIS),
            check_vma=False,
        )
        return fn(state, pad_full)

    return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# The sharded round
# ---------------------------------------------------------------------------


# Strategies whose per-step score is ``base - tradeoff * max-sim`` diversity
# greedy (mirrors ``baselines._diversity_greedy``).  Values build the base.
_DIVERSITY_BASES = {
    "borderline_diversity_sampling": lambda state, dens: -jnp.abs(state.mu),
    "usdm": lambda state, dens: -jnp.abs(state.mu) / jnp.sqrt(state.sig2),
    "tcal": lambda state, dens: -jnp.abs(state.mu) * dens,
}


def _check_mi_batch(strategy: str, batch_size: int) -> None:
    if strategy == "ital":
        from ital_tpu.select.ital import MAX_MI_BATCH

        if batch_size > MAX_MI_BATCH:
            raise ValueError(
                f"ITAL batch_size={batch_size} exceeds the supported maximum "
                f"{MAX_MI_BATCH} (3^m feedback table + QMC accuracy; see "
                f"select/ital.py)"
            )


def _make_round_body(mesh, strategy, batch_size, n_qmc, pool_size, recall_ks,
                     block=1024,
                     *, subsample_size=0, defer_update=False,
                     refine_top=0, refine_n_qmc=512, randomize_qmc=False,
                     select_only=False):
    """The shard-local feedback-round body shared by the per-round and
    fused-session entry points (call only inside ``shard_map``).

    ``defer_update=True`` stops after user feedback and returns
    ``(batch, y, valid)`` (all replicated) instead of updating the GP — the
    large-cap path (:mod:`ital_tpu.parallel.bigcap`) absorbs the labels with a
    distributed chol2d refit outside this shard_map, since its ``l`` factor is
    row-sharded rather than replicated.

    ``randomize_qmc=True`` (ITAL only) applies per-greedy-step
    Cranley-Patterson lattice shifts derived from the round's selection key —
    the sharded mirror of ``select_ital(qmc_key=k_sel)``, picking the
    identical batch (the key is replicated, so every chip shifts the same
    way; tested in tests/test_sharded.py).

    ``select_only=True`` is the interactive-serving mode: the body stops at
    the greedy batch (no simulated user, no update, no metrics) and the key
    is used DIRECTLY as the selection key (no internal split), so a session
    driving it with the same key stream as the single-device
    ``ActiveRetrieval.fetch_unlabelled`` picks identical batches (tested in
    tests/test_serve_sharded.py).  ``relevant``/``ap_exclude`` are unused."""

    n_dev = mesh.size

    def _round(state, key, relevant, sel_forbid, ap_exclude, params):
        if select_only:
            k_sel, k_user = key, None
        else:
            k_sel, k_user = jax.random.split(key)

        # --- greedy selection with collective argmax ---
        pad_local = _sel_forbid_local(state, sel_forbid)
        forbid = local_slot_mask(state, extra_forbid=pad_local)
        if strategy == "ital" and (pool_size or subsample_size):
            # COMPACT pool path: gather the pool's moments once, score only
            # the pool — selection cost scales with the pool, not the corpus.
            if subsample_size:
                # Same per-element threefry draw as the single-device path
                # (the full-length uniform is counter-based, so each shard
                # slices its rows of the identical global sample —
                # cross-path reproducible).
                shard_n = state.mu.shape[0]
                full = jax.random.uniform(
                    k_sel, (shard_n * n_dev,), state.mu.dtype
                )
                ranking_local = jax.lax.dynamic_slice(
                    full, (_offset(shard_n),), (shard_n,)
                )
                psize = subsample_size
            else:
                ranking_local = None
                psize = pool_size
            pool_padded = -(-psize // n_dev) * n_dev
            pool_gidx, pool_forbid = _sharded_pool_indices(
                state, forbid, psize, pool_padded, ranking_local
            )
            batch = _sharded_ital_pool_greedy(
                state, params, pool_gidx, pool_forbid, batch_size, n_qmc,
                n_dev, refine_top=refine_top, refine_n_qmc=refine_n_qmc,
                qmc_key=k_sel if randomize_qmc else None, block=block,
            )
            if select_only:
                return batch
            return _finish_round(state, k_user, batch, relevant, ap_exclude,
                                 params)
        if strategy == "rbmal":
            shard_n = state.x.shape[0]
            n_corpus = shard_n * jax.lax.axis_size(CORPUS_AXIS) - jax.lax.psum(
                jnp.sum(pad_local.astype(jnp.int32)), CORPUS_AXIS
            )
        batch = jnp.zeros((batch_size,), jnp.int32)
        neg = jnp.asarray(-jnp.inf, state.mu.dtype)
        from ital_tpu.select.baselines import _density

        # Hoist greedy-step invariants: the labeled-similarity collective and
        # the diversity base depend only on ``state``, which is fixed during
        # selection — one gather per round, not one per step (the
        # single-device mirrors hoist the same way).
        if strategy in _DIVERSITY_BASES or strategy == "rbmal":
            sim_lab = jnp.maximum(_sharded_max_sim_to_labeled(state), 0.0)
        if strategy in _DIVERSITY_BASES:
            div_base = _DIVERSITY_BASES[strategy](state, _density(state))

        for t in range(batch_size):
            if strategy == "ital":
                qmc_shift = _step_shift(
                    k_sel if randomize_qmc else None, t, state.mu.dtype
                )
                scores = _sharded_ital_scores(state, batch, t, params, n_qmc,
                                              shift=qmc_shift, block=block)
            elif strategy == "ital_regression":
                scores = _sharded_regression_scores(state, batch, t, params)
            elif strategy == "emoc":
                scores = _sharded_emoc_scores(state, params, pad_local) if t == 0 else scores
            elif strategy == "emoc_batch":
                scores = _sharded_emoc_batch_scores(state, batch, t, params, pad_local)
            elif strategy == "mcmi_min":
                scores = _sharded_mcmi_scores(state, params, pad_local) if t == 0 else scores
            elif strategy in _DIVERSITY_BASES:
                scores = _sharded_diversity_scores(
                    state, batch, t, div_base, params.tradeoff, sim_lab
                )
            elif strategy == "rbmal":
                scores = _sharded_rbmal_scores(
                    state, batch, t, n_corpus, sim_lab
                )
            else:
                scores = _local_score_fn(strategy, mesh.size)(state, k_sel, params)
            scores = jnp.where(forbid, neg, scores)
            if strategy == "ital" and refine_top:
                shard_n = state.mu.shape[0]
                nxt = _sharded_refined_pick(
                    state, batch, t, params, scores, forbid,
                    min(refine_top, shard_n * n_dev), refine_n_qmc,
                    shift=qmc_shift,
                )
            else:
                nxt = global_argmax(scores)
            batch = batch.at[t].set(nxt)
            # Mark the winner on its owner shard.
            shard_n = state.x.shape[0]
            rel_pos = nxt - _offset(shard_n)
            owned = (rel_pos >= 0) & (rel_pos < shard_n)
            forbid = forbid.at[jnp.clip(rel_pos, 0, shard_n - 1)].set(
                forbid[jnp.clip(rel_pos, 0, shard_n - 1)] | owned
            )

        if select_only:
            return batch
        return _finish_round(state, k_user, batch, relevant, ap_exclude, params)

    def _finish_round(state, k_user, batch, relevant, ap_exclude, params):
        """Shared round tail: simulate user -> GP update (or defer) -> metrics."""
        # --- user feedback (replicated: same key everywhere) ---
        y, valid = simulate_feedback(
            k_user, batch, relevant, params.label_prob, params.mistake_prob
        )

        if defer_update:
            return batch, y, valid

        # --- GP update through the regular code path, collective gather ---
        state = gp_mod.gp_update(
            state, batch, y, valid, gather=lambda gidx: gather_rows(state.x, gidx)
        )

        # --- rank + AP/recall@k (scores all_gather'd; metrics replicated) ---
        mu_full = jax.lax.all_gather(state.mu, CORPUS_AXIS, tiled=True)
        ap = average_precision(mu_full, relevant, ap_exclude)
        n_full = mu_full.shape[0]
        recalls = jnp.stack(
            [
                recall_at_k(mu_full, relevant, min(k, n_full), ap_exclude)
                for k in recall_ks
            ]
        ) if recall_ks else jnp.zeros((0,), state.mu.dtype)
        return state, batch, ap, recalls

    return _round


def _sel_forbid_local(state, sel_forbid_full):
    """Slice the replicated (N,) forbid mask down to this shard's rows."""
    shard_n = state.x.shape[0]
    start = _offset(shard_n)
    return jax.lax.dynamic_slice(sel_forbid_full, (start,), (shard_n,))


_PARAM_PSPECS = StrategyParams(
    label_prob=P(), mistake_prob=P(), jitter=P(), tradeoff=P()
)


def make_sharded_round(
    mesh,
    *,
    strategy: str = "ital",
    batch_size: int = 4,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    recall_ks: tuple = (),
    randomize_qmc: bool = False,
):
    """Build the jitted sharded feedback-round step.

    Returns ``round_fn(state, key, relevant, sel_forbid, ap_exclude, params)
    -> (state, batch, ap, recalls)`` where ``state`` is sharded (see
    :func:`shard_state`), ``relevant``/masks are replicated (N,) bools, and one
    call runs select -> simulate user -> GP update -> rank -> AP/recall@k
    entirely on the mesh.  Every registered retrieval strategy is supported
    (diversity/density baselines included); ``pool_size`` restricts ITAL's
    candidates to the global top-ranked pool like the single-device path.
    ``recalls`` is ``(len(recall_ks),)`` (empty when no ks are requested).
    """
    _check_mi_batch(strategy, batch_size)
    _round = _make_round_body(mesh, strategy, batch_size, n_qmc, pool_size,
                              recall_ks, block=block,
                              subsample_size=subsample_size,
                              refine_top=refine_top,
                              refine_n_qmc=refine_n_qmc,
                              randomize_qmc=randomize_qmc)

    def wrapped(state, key, relevant, sel_forbid, ap_exclude, params):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _round,
            mesh=mesh,
            in_specs=(specs, P(), P(), P(), P(), _PARAM_PSPECS),
            out_specs=(specs, P(), P(), P()),
            check_vma=False,
        )
        return fn(state, key, relevant, sel_forbid, ap_exclude, params)

    return jax.jit(wrapped)


def make_sharded_select(
    mesh,
    *,
    strategy: str = "ital",
    batch_size: int = 4,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    randomize_qmc: bool = False,
):
    """Interactive SELECT-ONLY step on the mesh (the sharded serving surface).

    Returns ``select_fn(state, key, sel_forbid, params) -> batch`` with
    ``batch`` the replicated ``(batch_size,)`` global indices.  Unlike the
    experiment round, the key is used DIRECTLY as the selection key (no
    internal split): a session feeding it the same key stream as the
    single-device ``ActiveRetrieval.fetch_unlabelled`` selects identical
    batches — the serving parity test relies on this.  ``sel_forbid`` is a
    replicated (N,) bool mask of rows that must never be selected (corpus
    padding; labeled slots are excluded internally like every other path).
    """
    _check_mi_batch(strategy, batch_size)
    body = _make_round_body(
        mesh, strategy, batch_size, n_qmc, pool_size, recall_ks=(),
        block=block, subsample_size=subsample_size, refine_top=refine_top,
        refine_n_qmc=refine_n_qmc, randomize_qmc=randomize_qmc,
        select_only=True,
    )

    def _select(state, key, sel_forbid, params):
        return body(state, key, None, sel_forbid, None, params)

    def wrapped(state, key, sel_forbid, params):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _select, mesh=mesh,
            in_specs=(specs, P(), P(), _PARAM_PSPECS),
            out_specs=P(), check_vma=False,
        )
        return fn(state, key, sel_forbid, params)

    return jax.jit(wrapped)


def make_sharded_update(mesh):
    """Jitted sharded ``gp_update`` for REAL feedback (serving): absorb a
    labeled block on the mesh without the experiment round's simulated user.
    ``(state, idx, y, valid) -> state``; feature rows cross chips via the
    same collective gather the round body uses."""

    def _update(state, idx, y, valid):
        return gp_mod.gp_update(
            state, idx, y, valid,
            gather=lambda gidx: gather_rows(state.x, gidx),
        )

    def wrapped(state, idx, y, valid):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _update, mesh=mesh, in_specs=(specs, P(), P(), P()),
            out_specs=specs, check_vma=False,
        )
        return fn(state, idx, y, valid)

    return jax.jit(wrapped)


def make_sharded_set_query(mesh):
    """Jitted sharded ``gp_set_query`` (query counts as a +1 label):
    ``(state, query_idx) -> state``."""

    def _setq(state, q):
        return gp_mod.gp_set_query(
            state, q, gather=lambda gidx: gather_rows(state.x, gidx)
        )

    def wrapped(state, q):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _setq, mesh=mesh, in_specs=(specs, P()), out_specs=specs,
            check_vma=False,
        )
        return fn(state, q)

    return jax.jit(wrapped)


def make_sharded_fit(mesh):
    """Jitted sharded from-scratch refit (``gp_fit`` with collective gather)
    — the serving ``/learn`` endpoint's posterior rebuild after a
    hyperparameter change.  ``(state,) -> state``."""

    def _fit(state):
        return gp_mod.gp_fit(
            state, gather=lambda gidx: gather_rows(state.x, gidx)
        )

    def wrapped(state):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _fit, mesh=mesh, in_specs=(specs,), out_specs=specs,
            check_vma=False,
        )
        return fn(state)

    return jax.jit(wrapped)


def make_sharded_session(
    mesh,
    *,
    strategy: str = "ital",
    batch_size: int = 4,
    n_rounds: int = 10,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    learn=None,
    randomize_qmc: bool = False,
):
    """Whole SESSION fused on the mesh: all ``n_rounds`` in one device program.

    The sharded analog of the single-device ``fused_sessions`` mode
    (``runner.make_fused_session_fn``): selection, the simulated user, the GP
    update, ranking, and AP for every round run inside one ``shard_map`` +
    ``lax.fori_loop`` — one dispatch and one host sync per session, with all
    cross-chip traffic (psum gathers, collective argmax, all_gather ranking)
    riding ICI inside the loop.  Returns
    ``session_fn(state, skey, relevant, sel_forbid, ap_exclude, params)
    -> (state, aps)`` with ``aps`` the replicated (n_rounds,) AP curve.
    Identical per-round PRNG derivation to the per-round sharded path
    (``fold_in(skey, round)``), so curves match it exactly (tested).

    The greedy selection is Python-unrolled over ``batch_size`` (static) but
    the ROUND axis is a ``fori_loop``: per-round state (labeled buffers,
    Cholesky factor, whitened block rows) lives in fixed-capacity padded
    buffers, which is what makes the loop-carried state static-shaped.
    """
    _check_mi_batch(strategy, batch_size)
    inner_round = _make_round_body(
        mesh, strategy, batch_size, n_qmc, pool_size, recall_ks=(),
        block=block, subsample_size=subsample_size,
        refine_top=refine_top, refine_n_qmc=refine_n_qmc,
        randomize_qmc=randomize_qmc,
    )
    _session = _fused_session_body(inner_round, n_rounds, learn=learn)

    def session(state, skey, relevant, sel_forbid, ap_exclude, params):
        specs = state_pspecs(state)
        fn = jax.shard_map(
            _session,
            mesh=mesh,
            in_specs=(specs, P(), P(), P(), P(), _PARAM_PSPECS),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return fn(state, skey, relevant, sel_forbid, ap_exclude, params)

    return jax.jit(session)


def _fused_session_body(inner_round, n_rounds: int, learn=None):
    """Shared fused-session body: ``fori_loop`` over rounds with
    ``fold_in(skey, round)`` key derivation — the ONE place the per-round key
    and AP accumulation are defined for both the fused-session and cohort
    entry points (their tested 'identical curves' invariant depends on it).

    ``learn`` (a :class:`LearnConfig`) enables online type-II-ML
    hyperparameter relearning inside the fused loop (VERDICT r2 item 6): the
    labeled features are assembled with the same collective gather the round
    body uses, the ascent runs replicated (identical inputs on every chip),
    and the refit is ``gp_fit`` with the collective gather — same cadence and
    position (after the round's AP) as the serial path."""
    learn_every = int(learn.every) if learn else 0

    def _relearn(st):
        from ital_tpu.models.hyperopt import fit_hyperparams

        xl = gather_rows(st.x, st.idx)
        kw = {}
        if float(learn.prior_strength or 0.0):
            ls, var, noise = learn.center
            dt = st.mu.dtype
            kw["prior_strength"] = float(learn.prior_strength)
            kw["prior_center"] = gp_mod.GPHyper(
                length_scale=jnp.asarray(ls, dt),
                var=jnp.asarray(var, dt),
                noise=jnp.asarray(noise, dt),
            )
        if float(learn.noise_floor or 0.0):
            kw["noise_floor"] = float(learn.noise_floor)
        hyper = fit_hyperparams(
            xl, st.y, st.active, st.hyper,
            steps=int(learn.steps), lr=float(learn.lr),
            learn_noise=bool(learn.learn_noise), **kw,
        )
        return gp_mod.gp_fit(
            st.replace(hyper=hyper),
            gather=lambda gidx: gather_rows(st.x, gidx),
        )

    def _session(state, skey, relevant, sel_forbid, ap_exclude, params):
        def body(rnd, carry):
            st, aps = carry
            rkey = jax.random.fold_in(skey, rnd)
            st, _batch, ap, _ = inner_round(
                st, rkey, relevant, sel_forbid, ap_exclude, params
            )
            if learn_every:
                st = jax.lax.cond(
                    (rnd + 1) % learn_every == 0, _relearn, lambda s: s, st
                )
            return st, aps.at[rnd].set(ap)

        aps0 = jnp.zeros((n_rounds,), state.mu.dtype)
        return jax.lax.fori_loop(0, n_rounds, body, (state, aps0))

    return _session


# ---------------------------------------------------------------------------
# Sharded cohorts: query_batch x fused_sessions x mesh_devices composed
# ---------------------------------------------------------------------------


def _cohort_state_axes(learn: bool = False) -> GPState:
    """vmap axes for a cohort of sessions sharing one corpus shard: every
    per-session leaf batches on axis 0; the shard's feature rows and density
    are shared.  Hyperparameters are shared scalars normally, but become
    per-session (batched) when online hyperparameter learning is on."""
    hyper = (gp_mod.GPHyper(length_scale=0, var=0, noise=0) if learn
             else gp_mod.GPHyper(length_scale=None, var=None, noise=None))
    return GPState(
        x=None, idx=0, y=0, valid=0, count=0, l=0, beta=0, v=0, mu=0, sig2=0,
        hyper=hyper,
        density=None,
        x2=None,
    )


def cohort_pspecs(state: GPState) -> GPState:
    """PartitionSpecs for a session-batched GPState: corpus axes shift one
    position right of the leading cohort axis; ``x``/``density`` stay
    unbatched (shared across the cohort)."""
    ax = CORPUS_AXIS
    return GPState(
        x=P(ax, None),
        idx=P(), y=P(), valid=P(), count=P(),
        l=P(), beta=P(),
        v=P(None, None, ax),
        mu=P(None, ax), sig2=P(None, ax),
        hyper=gp_mod.GPHyper(length_scale=P(), var=P(), noise=P()),
        density=None if state.density is None else P(ax),
        x2=None if state.x2 is None else P(ax),
    )


def shard_cohort_state(state: GPState, mesh) -> GPState:
    """Lay a session-batched state out over the mesh (cohort axis replicated,
    corpus axis sharded)."""
    specs = cohort_pspecs(state)
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        state, specs,
    )


def make_sharded_cohort(
    mesh,
    *,
    strategy: str = "ital",
    batch_size: int = 4,
    n_rounds: int = 10,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    learn=None,
    randomize_qmc: bool = False,
):
    """COHORT of fused sessions on the mesh: ``query_batch`` retrieval sessions,
    each running ALL ``n_rounds`` of feedback, in ONE device program.

    This composes every throughput axis the framework has: the corpus is
    sharded over the mesh (data parallelism, ICI collectives), the rounds are
    fused into a ``fori_loop`` (one dispatch + one host sync per cohort), and
    the session axis is a ``vmap`` INSIDE the ``shard_map`` — XLA batches the
    per-round collectives (psum gathers, collective argmax, all_gather
    ranking) across the cohort, so cross-chip latency is paid once per round
    for the whole cohort rather than once per session.

    Returns ``cohort_fn(state_batched, skeys (K,), relevant (K, N),
    sel_forbid (N,), ap_exclude (K, N), params) -> (state_batched,
    aps (K, n_rounds))``.  Per-session key derivation matches the serial and
    per-round sharded paths (``fold_in(skey, round)``), so each session's
    curve equals its individually-run counterpart (tested).
    """
    _check_mi_batch(strategy, batch_size)
    inner_round = _make_round_body(
        mesh, strategy, batch_size, n_qmc, pool_size, recall_ks=(),
        block=block, subsample_size=subsample_size,
        refine_top=refine_top, refine_n_qmc=refine_n_qmc,
        randomize_qmc=randomize_qmc,
    )
    axes = _cohort_state_axes(learn=bool(learn and learn.every))
    _cohort_local = jax.vmap(
        _fused_session_body(inner_round, n_rounds, learn=learn),
        in_axes=(axes, 0, 0, None, 0, None),
        out_axes=(axes, 0),
    )

    def cohort(state, skeys, relevant, sel_forbid, ap_exclude, params):
        specs = cohort_pspecs(state)
        fn = jax.shard_map(
            _cohort_local,
            mesh=mesh,
            in_specs=(specs, P(), P(), P(), P(), _PARAM_PSPECS),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return fn(state, skeys, relevant, sel_forbid, ap_exclude, params)

    return jax.jit(cohort)


# ---------------------------------------------------------------------------
# Serving-side sharded cohorts: K live sessions batched through ONE mesh
# program per endpoint call (select-only / update-only, no simulated user) —
# the mesh counterpart of serve.RetrievalService's single-device vmapped
# cohort endpoints.  States are stacked INSIDE the jitted program
# (gp_mod.stack_session_states), so the whole call is one dispatch.
# ---------------------------------------------------------------------------


def make_sharded_cohort_select(
    mesh,
    *,
    strategy: str = "ital",
    batch_size: int = 4,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    randomize_qmc: bool = False,
):
    """SELECT for a COHORT of serving sessions in one mesh program.

    ``select_fn(states, keys (K,), sel_forbid, params_b) -> (K, batch_size)``
    — ``states`` is a tuple of K per-session mesh-sharded GPStates over the
    SAME corpus buffer (and, for density strategies, the same density
    vector), ``params_b`` a leading-K-stacked StrategyParams.  Semantics
    match K individual :func:`make_sharded_select` calls with the same keys
    exactly (the select-only round body is vmapped over the cohort axis
    inside the shard_map, so per-session math is unchanged and the per-round
    collectives batch across the cohort — tested in
    tests/test_serve_sharded.py).  jit re-specializes per cohort size K.
    """
    _check_mi_batch(strategy, batch_size)
    body = _make_round_body(
        mesh, strategy, batch_size, n_qmc, pool_size, recall_ks=(),
        block=block, subsample_size=subsample_size, refine_top=refine_top,
        refine_n_qmc=refine_n_qmc, randomize_qmc=randomize_qmc,
        select_only=True,
    )
    # learn=True axes: hyperparameters batch — serving sessions may have
    # learned different values (POST /learn is per-session).
    axes = _cohort_state_axes(learn=True)
    # params axis is a plain 0: EVERY StrategyParams leaf is stacked by the
    # caller (serve stacks the whole params pytree, jitter included).
    _sel_v = jax.vmap(
        lambda st, key, fb, p: body(st, key, None, fb, None, p),
        in_axes=(axes, 0, None, 0),
    )

    def wrapped(states, keys, sel_forbid, params_b):
        stb = gp_mod.stack_session_states(states)
        specs = cohort_pspecs(stb)
        fn = jax.shard_map(
            _sel_v, mesh=mesh,
            in_specs=(specs, P(), P(), _PARAM_PSPECS),
            out_specs=P(), check_vma=False,
        )
        return fn(stb, keys, sel_forbid, params_b)

    return jax.jit(wrapped)


def make_sharded_cohort_update(mesh):
    """Vmapped sharded ``gp_update`` for K serving sessions in one program.

    ``update_fn(states, idx (K, b), y (K, b), valid (K, b)) ->
    (per-session states tuple, counts (K,))`` — the mesh counterpart of
    serve.RetrievalService._cohort_update.  The density vector is dropped
    from the batched state (a GP update never reads it, so mixed-density
    cohorts batch) and each output state gets ITS OWN density back; ``x`` /
    ``x2`` stay the shared corpus buffers.  Per-session results equal K
    individual :func:`make_sharded_update` calls (tested).  jit
    re-specializes per (K, b, cap) signature.
    """
    axes = _cohort_state_axes(learn=True)
    _upd_v = jax.vmap(
        lambda st, idx, y, valid: gp_mod.gp_update(
            st, idx, y, valid,
            gather=lambda gidx: gather_rows(st.x, gidx),
        ),
        in_axes=(axes, 0, 0, 0), out_axes=axes,
    )

    def wrapped(states, idx, y, valid):
        states = tuple(states)
        stb = gp_mod.stack_session_states(states, with_density=False)
        specs = cohort_pspecs(stb)
        fn = jax.shard_map(
            _upd_v, mesh=mesh, in_specs=(specs, P(), P(), P()),
            out_specs=specs, check_vma=False,
        )
        nb = fn(stb, idx, y, valid)
        outs = tuple(
            GPState(
                x=states[0].x,
                idx=nb.idx[j], y=nb.y[j], valid=nb.valid[j],
                count=nb.count[j], l=nb.l[j], beta=nb.beta[j], v=nb.v[j],
                mu=nb.mu[j], sig2=nb.sig2[j],
                hyper=gp_mod.GPHyper(
                    length_scale=nb.hyper.length_scale[j],
                    var=nb.hyper.var[j],
                    noise=nb.hyper.noise[j],
                ),
                density=states[j].density,  # each session's own vector
                x2=states[0].x2,
            )
            for j in range(len(states))
        )
        return outs, nb.count

    return jax.jit(wrapped)
