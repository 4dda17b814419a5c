"""Classical active-learning baseline selectors (the reference's parity suite).

Reference parity: ``italia/baseline_methods.py`` (SURVEY.md C4) — one strategy
per class there, one registered function here.  The roster covers the methods
the ITAL paper (arXiv:1809.02337) compares against: random, top-scoring
(exploitation), variance sampling, uncertainty sampling, border(line) sampling
and its diversity-augmented variant, entropy, EMOC, MCMI[min], SUD, TCAL,
RBMAL, AdaptAL, USDM.  The exact reference roster could not be confirmed (the
reference mount was empty — SURVEY.md header); these implementations follow the
published algorithms.

All strategies are pure jittable functions of the GP posterior; the heavier
ones (EMOC, MCMI) replace the reference's per-candidate Python loops with
blockwise whole-corpus computations on the MXU.

Density-weighted strategies (SUD/TCAL/AdaptAL) take the corpus density vector
through ``state.density`` — compute it once per dataset with
:func:`ital_tpu.models.gp.corpus_density` and attach via ``dataclasses.replace``
-like ``state.replace(...)``; if absent they fall back to uniform density.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ital_tpu.models.gp import GPState
from ital_tpu.ops.kernels import blockwise_reduce_abs_kpost, rbf_kernel
from ital_tpu.select.base import (
    StrategyParams,
    greedy_argmax_batch,
    labeled_mask,
    register,
)

_EPS = 1e-12


def _phi(z):
    from ital_tpu.ops.mvn import norm_cdf

    return norm_cdf(z, eps=1e-7)


def _binary_entropy(p):
    return -(p * jnp.log(p + _EPS) + (1 - p) * jnp.log(1 - p + _EPS))


def _p_relevant(state: GPState) -> jax.Array:
    """P(R=+1) per corpus point: Phi(mu / sigma) under the latent GP."""
    return _phi(state.mu / jnp.sqrt(state.sig2))


def _density(state: GPState) -> jax.Array:
    d = getattr(state, "density", None)
    if d is None:
        return jnp.ones_like(state.mu)
    return d


def _max_sim_to_labeled(state: GPState) -> jax.Array:
    """(N,) max RBF similarity of each point to any currently-labeled point."""
    xl = state.x[state.idx]
    sims = rbf_kernel(state.x, xl, state.hyper.length_scale, 1.0,
                      a2=state.x2)  # (N, cap)
    active = state.active
    sims = jnp.where(active[None, :], sims, -jnp.inf)
    return jnp.max(sims, axis=1)


# ---------------------------------------------------------------------------
# Cheap posterior-statistic strategies
# ---------------------------------------------------------------------------


@register("random")
def select_random(state, batch_size, key, params: StrategyParams):
    """Uniform random among unlabeled items (reference ``RandomRetrieval``)."""
    scores = jax.random.uniform(key, (state.x.shape[0],), state.mu.dtype)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


@register("topscoring")
def select_topscoring(state, batch_size, key, params: StrategyParams):
    """Pure exploitation: highest posterior relevance mean."""
    del key
    return greedy_argmax_batch(lambda b, t: state.mu, state, batch_size)


@register("variance_sampling")
def select_variance(state, batch_size, key, params: StrategyParams):
    """Maximum posterior variance (reference ``VarianceSampling``)."""
    del key
    return greedy_argmax_batch(lambda b, t: state.sig2, state, batch_size)


@register("uncertainty_sampling")
def select_uncertainty(state, batch_size, key, params: StrategyParams):
    """Minimum |mu|/sigma — closest to the boundary in units of uncertainty
    (reference ``UncertaintySampling``)."""
    del key
    scores = -jnp.abs(state.mu) / jnp.sqrt(state.sig2)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


@register("borderline_sampling")
def select_borderline(state, batch_size, key, params: StrategyParams):
    """Minimum |mu| — closest to the decision boundary (reference
    ``BorderlineSampling``)."""
    del key
    scores = -jnp.abs(state.mu)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


@register("entropy_sampling")
def select_entropy(state, batch_size, key, params: StrategyParams):
    """Maximum binary entropy of P(R=+1) (entropy baseline of the paper)."""
    del key
    scores = _binary_entropy(_p_relevant(state))
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


# ---------------------------------------------------------------------------
# Diversity-augmented strategies (greedy with a similarity penalty)
# ---------------------------------------------------------------------------


def _diversity_greedy(state, batch_size, base_scores, weight):
    """Greedy argmax of ``base - weight * max_sim(candidate, chosen + labeled)``.

    The penalty is the max over the UNION of labeled and already-chosen items
    (Brinker-style diversity; same convention as ``select_rbmal``) — summing
    the two maxes would double-penalize candidates near both sets.
    """
    sim_lab = jnp.maximum(_max_sim_to_labeled(state), 0.0)

    def score(batch, t):
        sim = sim_lab
        if t > 0:
            xb = state.x[batch[:t]]
            sims = rbf_kernel(state.x, xb, state.hyper.length_scale, 1.0,
                              a2=state.x2)
            sim = jnp.maximum(sim, jnp.max(sims, axis=1))
        return base_scores - weight * sim

    return greedy_argmax_batch(score, state, batch_size)


@register("borderline_diversity_sampling")
def select_borderline_diversity(state, batch_size, key, params: StrategyParams):
    """Borderline sampling with a redundancy penalty against labeled and
    already-chosen items (reference's diversity-augmented border variant)."""
    del key
    return _diversity_greedy(state, batch_size, -jnp.abs(state.mu), params.tradeoff)


@register("usdm")
def select_usdm(state, batch_size, key, params: StrategyParams):
    """Uncertainty sampling with diversity maximization (Yang et al. style):
    uncertainty minus max-similarity to the growing batch."""
    del key
    unc = -jnp.abs(state.mu) / jnp.sqrt(state.sig2)
    return _diversity_greedy(state, batch_size, unc, params.tradeoff)


@register("rbmal")
def select_rbmal(state, batch_size, key, params: StrategyParams):
    """Ranked batch-mode AL (Cardoso et al. 2017):
    score = alpha * (1 - max_sim_to_labeled_or_chosen) + (1 - alpha) * uncertainty,
    with alpha = |U| / (|U| + |L|) recomputed as the batch grows."""
    del key
    n = state.x.shape[0]
    n_lab = jnp.sum(state.active.astype(jnp.int32))
    unc = 1.0 - jnp.abs(jnp.tanh(state.mu))  # uncertainty in [0, 1]
    sim_lab = jnp.maximum(_max_sim_to_labeled(state), 0.0)

    def score(batch, t):
        alpha = (n - n_lab - t) / jnp.asarray(n, state.mu.dtype)
        sim = sim_lab
        if t > 0:
            xb = state.x[batch[:t]]
            sims = rbf_kernel(state.x, xb, state.hyper.length_scale, 1.0,
                              a2=state.x2)
            sim = jnp.maximum(sim, jnp.max(sims, axis=1))
        return alpha * (1.0 - sim) + (1.0 - alpha) * unc

    return greedy_argmax_batch(score, state, batch_size)


# ---------------------------------------------------------------------------
# Density-weighted strategies
# ---------------------------------------------------------------------------


@register("sud")
def select_sud(state, batch_size, key, params: StrategyParams):
    """Sampling by uncertainty and density: entropy x density."""
    del key
    scores = _binary_entropy(_p_relevant(state)) * _density(state)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


@register("tcal")
def select_tcal(state, batch_size, key, params: StrategyParams):
    """Density-weighted border sampling with a diversity-greedy batch
    (triple-criteria AL: uncertainty, density, diversity)."""
    del key
    base = -jnp.abs(state.mu) * _density(state)
    return _diversity_greedy(state, batch_size, base, params.tradeoff)


@register("adapt_al")
def select_adapt_al(state, batch_size, key, params: StrategyParams):
    """Adaptive AL (Li & Guo 2013 style): entropy^beta * density^(1-beta) with
    ``beta = params.tradeoff``."""
    del key
    ent = _binary_entropy(_p_relevant(state))
    beta = params.tradeoff
    scores = jnp.power(ent + _EPS, beta) * jnp.power(_density(state) + _EPS, 1.0 - beta)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


# ---------------------------------------------------------------------------
# Hypothetical-update strategies (use the GP's closed-form one-point update)
# ---------------------------------------------------------------------------


def emoc_scores_from_moments(mu, sig2, noise, colabs):
    """EMOC scores from posterior moments + covariance column-abs-sums.

    EMOC(c) = E_{y ~ P(R_c)} || mu' - mu ||_1
            = [ P(+1) |1 - mu_c| + P(-1) |-1 - mu_c| ] / (sig2_c + noise)
              * sum_x |k_post(x, c)|

    The ONE place the formula lives — shared by the one-point and batch
    variants and their sharded ring mirrors (the moments are the current or
    the block-hypothetical posterior respectively), so the oracle-checked
    denominator/probability conventions cannot drift between them.
    """
    p_pos = _phi(mu / jnp.sqrt(sig2))
    exp_change = p_pos * jnp.abs(1.0 - mu) + (1 - p_pos) * jnp.abs(-1.0 - mu)
    return exp_change / (sig2 + noise) * colabs


@register("emoc")
def select_emoc(state, batch_size, key, params: StrategyParams):
    """Expected model output change (reference ``EMOC``).

    The reference loops candidates and calls ``updated_prediction``; here the
    column-abs-sums of the posterior covariance stream blockwise over the MXU
    (:func:`blockwise_reduce_abs_kpost`).
    """
    del key
    n = state.x.shape[0]
    colabs = blockwise_reduce_abs_kpost(
        state.x, state.v, jnp.arange(n), state.hyper.length_scale, state.hyper.var
    )
    scores = emoc_scores_from_moments(
        state.mu, state.sig2, state.hyper.noise, colabs
    )
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)


@register("emoc_batch")
def select_emoc_batch(state, batch_size, key, params: StrategyParams):
    """Batch EMOC: greedy expected-model-output-change given the partial batch.

    Each greedy step re-scores every candidate against the posterior as if the
    already-chosen batch members were labeled with their most-probable labels
    (``sign(mu)``), via the block hypothetical update
    (:func:`ital_tpu.models.gp.gp_updated_whitening` — reference
    ``updated_prediction`` over an index block, SURVEY.md section 3.4).  In
    the whitened representation the hypothetical posterior is just ``t`` extra
    rows on ``v``, so the step cost stays one blockwise column reduction; at
    t=0 this is exactly :func:`select_emoc` (tested).
    """
    del key
    from ital_tpu.models.gp import gp_updated_whitening

    n = state.x.shape[0]

    def score(batch, t):
        if t == 0:
            mu_h, sig2_h, v_aug = state.mu, state.sig2, state.v
        else:
            ind = batch[:t]
            y_hyp = jnp.where(state.mu[ind] >= 0.0, 1.0, -1.0)
            g, w = gp_updated_whitening(state, ind, y_hyp)
            mu_h = state.mu + jnp.dot(
                w.T, g, preferred_element_type=jnp.float32
            ).astype(state.mu.dtype)
            sig2_h = jnp.maximum(state.sig2 - jnp.sum(w * w, axis=0), 1e-8)
            v_aug = jnp.concatenate([state.v, w], axis=0)
        colabs = blockwise_reduce_abs_kpost(
            state.x, v_aug, jnp.arange(n),
            state.hyper.length_scale, state.hyper.var,
        )
        return emoc_scores_from_moments(mu_h, sig2_h, state.hyper.noise, colabs)

    return greedy_argmax_batch(score, state, batch_size)


@register("mcmi_min")
def select_mcmi_min(state, batch_size, key, params: StrategyParams, *, block: int = 512):
    """MCMI[min] (Guo & Greiner): pick the candidate whose worst-case label
    most reduces the total (marginal) label entropy of the corpus.

    score(c) = min_{y in {-1,+1}} [ -sum_x H_b( Phi(mu'_x / sigma'_x) ) ]

    with (mu', sigma') the closed-form one-point hypothetical posterior.  The
    whole-corpus entropy per candidate is an N x N computation; it streams in
    candidate blocks like EMOC.
    """
    del key
    n = state.x.shape[0]
    noise = state.hyper.noise

    from ital_tpu.ops.blocking import blocked_map

    def one_block(cands):
        from ital_tpu.ops.pallas_rbf import rbf_kernel_auto

        xc = state.x[cands]
        k_cross = rbf_kernel_auto(state.x, xc, state.hyper.length_scale, state.hyper.var)
        k_post = k_cross - jnp.dot(
            state.v.T, state.v[:, cands], preferred_element_type=jnp.float32
        ).astype(state.mu.dtype)  # (N, block)
        denom = state.sig2[cands] + noise  # (block,)
        # Variance shrink is label-independent.
        sig2_new = jnp.maximum(
            state.sig2[:, None] - k_post**2 / denom[None, :], 1e-8
        )
        sig_new = jnp.sqrt(sig2_new)

        def total_entropy(y):
            gain = (y - state.mu[cands]) / denom  # (block,)
            mu_new = state.mu[:, None] + k_post * gain[None, :]
            return jnp.sum(_binary_entropy(_phi(mu_new / sig_new)), axis=0)

        return -jnp.maximum(total_entropy(1.0), total_entropy(-1.0))  # min over y

    scores = blocked_map(one_block, (jnp.arange(n),), block=block)
    return greedy_argmax_batch(lambda b, t: scores, state, batch_size)
