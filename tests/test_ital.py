"""ITAL MI scoring + greedy selection vs the brute-force NumPy oracle."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.models import gp as gp_mod
from ital_tpu.select.base import StrategyParams
from ital_tpu.select.ital import (
    feedback_given_relevance,
    mutual_information_from_relevance,
    score_candidates_mi,
    select_ital,
)
from tests.oracle import numpy_oracle as oracle

LS, VAR, NOISE = 1.0, 1.0, 0.1


def _fitted_pair(rng, n=40, d=3, cap=16, labeled=((3, 1.0), (17, -1.0), (29, 1.0))):
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), LS, VAR, NOISE, cap)
    idx = [i for i, _ in labeled]
    ys = [y for _, y in labeled]
    state = state.replace(
        idx=state.idx.at[: len(idx)].set(jnp.asarray(idx, jnp.int32)),
        y=state.y.at[: len(idx)].set(jnp.asarray(ys, jnp.float32)),
        valid=state.valid.at[: len(idx)].set(True),
        count=jnp.asarray(len(idx), jnp.int32),
    )
    state = gp_mod.gp_fit(state)
    ogp = oracle.OracleGP(x, LS, VAR, NOISE)
    ogp.fit(idx, ys)
    return state, ogp


@pytest.mark.parametrize("m,label_prob,mistake_prob", [
    (1, 1.0, 0.0), (2, 0.8, 0.1), (3, 0.6, 0.2),
])
def test_mi_formula_matches_oracle(rng, m, label_prob, mistake_prob):
    """MI from relevance-config probabilities == oracle's double enumeration."""
    a = rng.normal(size=(m, m))
    cov = a @ a.T + np.eye(m)
    mu = rng.normal(size=(m,)) * 0.5

    ours_pr = np.array(
        [oracle.mvn_orthant(mu, cov, s)
         for s in itertools.product([-1, 1], repeat=m)]
    )
    ours_pr = ours_pr / ours_pr.sum()
    pfr = feedback_given_relevance(m, jnp.asarray(label_prob), jnp.asarray(mistake_prob))
    mi = float(mutual_information_from_relevance(jnp.asarray(ours_pr, jnp.float32), pfr))

    ref = oracle.mutual_information(mu, cov, label_prob, mistake_prob)
    assert mi == pytest.approx(ref, abs=2e-4)


def test_candidate_scores_match_oracle_singletons(rng):
    """Greedy step 0: per-candidate singleton MI vs oracle enumeration."""
    state, ogp = _fitted_pair(rng)
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.1)
    )
    batch = jnp.zeros((2,), jnp.int32)
    scores = np.asarray(score_candidates_mi(state, batch, 0, params, n_qmc=64))

    for c in [0, 7, 22, 35]:
        mu = ogp.predict_mean([c])
        cov = ogp.predict_cov([c]) + 1e-6
        ref = oracle.mutual_information(mu, cov, 0.9, 0.1)
        assert scores[c] == pytest.approx(ref, abs=2e-3), c


def test_candidate_scores_match_oracle_pairs(rng):
    """Greedy step 1 (batch of one already chosen): joint MI vs oracle."""
    state, ogp = _fitted_pair(rng)
    params = StrategyParams(label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05))
    first = 11
    batch = jnp.zeros((2,), jnp.int32).at[0].set(first)
    scores = np.asarray(score_candidates_mi(state, batch, 1, params, n_qmc=256))

    for c in [2, 19, 33]:
        sel = [first, c]
        mu = ogp.predict_mean(sel)
        cov = ogp.predict_cov(sel) + 1e-6 * np.eye(2)
        ref = oracle.mutual_information(mu, cov, 0.8, 0.05)
        assert scores[c] == pytest.approx(ref, abs=5e-3), c


def test_greedy_selection_matches_oracle(rng):
    """Full greedy batch construction picks the same batch as the oracle."""
    state, ogp = _fitted_pair(rng, n=30)
    params = StrategyParams(label_prob=jnp.asarray(1.0), mistake_prob=jnp.asarray(0.0))
    batch = np.asarray(
        select_ital(state, 3, jax.random.PRNGKey(0), params, n_qmc=256)
    )

    candidates = [i for i in range(30) if i not in (3, 17, 29)]
    ref_batch = oracle.ital_select(ogp, candidates, 3, 1.0, 0.0)
    assert list(batch) == ref_batch


def test_noiseless_user_mi_reduces_to_relevance_entropy(rng):
    """With label_prob=1, mistake_prob=0: I(R;F) = H(R) exactly."""
    m = 2
    pr = np.asarray([0.1, 0.25, 0.6, 0.05], np.float32)
    pfr = feedback_given_relevance(m, jnp.asarray(1.0), jnp.asarray(0.0))
    mi = float(mutual_information_from_relevance(jnp.asarray(pr), pfr))
    h_r = float(-(pr * np.log(pr)).sum())
    assert mi == pytest.approx(h_r, abs=1e-5)


def test_batch_size_guard():
    """MI batches above MAX_MI_BATCH fail fast (3^m table + QMC accuracy
    cliff — VERDICT r1 item 9) on both the single-device and sharded paths."""
    import numpy as np

    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.ital import MAX_MI_BATCH

    rng = np.random.default_rng(0)
    state = gp_mod.gp_init(
        jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32)), 1.0, 1.0, 0.1, 64
    )
    state = gp_mod.gp_set_query(state, jnp.asarray(0))
    params = StrategyParams()
    with pytest.raises(ValueError, match="batch_size"):
        select_ital(state, MAX_MI_BATCH + 1, jax.random.PRNGKey(0), params)

    from ital_tpu.parallel import make_mesh, make_sharded_round

    with pytest.raises(ValueError, match="batch_size"):
        make_sharded_round(make_mesh(2), strategy="ital",
                           batch_size=MAX_MI_BATCH + 1)


def test_greedy_selection_matches_oracle_b5(rng):
    """Greedy batch parity at b=5 — exercises the m=5 orthant tree (the
    largest routinely-used batch; the guard sits at the measured
    MAX_MI_BATCH=8) with a noisy user model so MI scores stay off the
    saturated-tie plateau."""
    state, ogp = _fitted_pair(
        rng, n=24, labeled=((3, 1.0), (17, -1.0), (9, 1.0), (20, -1.0))
    )
    params = StrategyParams(label_prob=jnp.asarray(0.8),
                            mistake_prob=jnp.asarray(0.1))
    batch = np.asarray(
        select_ital(state, 5, jax.random.PRNGKey(0), params, n_qmc=256)
    )
    candidates = [i for i in range(24) if i not in (3, 17, 9, 20)]
    ref_batch = oracle.ital_select(ogp, candidates, 5, 0.8, 0.1)
    assert list(batch) == ref_batch


def test_regression_greedy_matches_dense_logdet_oracle(rng):
    """C7: the regression MI selector (greedy log-det, select/regression.py)
    == a dense f64 NumPy oracle doing literal conditional-variance greedy."""
    from ital_tpu.select.regression import select_ital_regression

    n, d = 26, 3
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), LS, VAR, NOISE, 16)
    lab_idx, lab_y = [2, 11, 19], [0.5, -1.2, 0.3]
    state = gp_mod.gp_update(
        state, jnp.asarray(lab_idx, jnp.int32),
        jnp.asarray(lab_y, jnp.float32), jnp.ones(3, bool),
    )
    params = StrategyParams(label_prob=jnp.asarray(1.0),
                            mistake_prob=jnp.asarray(0.0))
    batch = list(np.asarray(
        select_ital_regression(state, 4, jax.random.PRNGKey(0), params)
    ))

    # Dense f64 oracle: posterior covariance over the corpus, then greedy
    # conditional-variance argmax with explicit matrix solves.
    d2 = ((x[:, None].astype(np.float64) - x[None, :].astype(np.float64)) ** 2).sum(-1)
    k = VAR * np.exp(-d2 / (2 * LS**2))
    kll = k[np.ix_(lab_idx, lab_idx)] + NOISE * np.eye(3)
    kl = k[lab_idx]  # (3, N)
    sigma = k - kl.T @ np.linalg.solve(kll, kl)  # posterior cov (N, N)

    chosen: list = []
    excluded = set(lab_idx)
    for _ in range(4):
        best, best_v = None, -np.inf
        for c in range(n):
            if c in excluded:
                continue
            if chosen:
                s_bb = sigma[np.ix_(chosen, chosen)] + NOISE * np.eye(len(chosen))
                s_cb = sigma[c, chosen]
                v = sigma[c, c] - s_cb @ np.linalg.solve(s_bb, s_cb)
            else:
                v = sigma[c, c]
            if v > best_v:
                best, best_v = c, v
        chosen.append(best)
        excluded.add(best)
    assert batch == chosen


def test_subsample_restricts_to_random_pool():
    """subsample_size (reference: random candidate subsampling for
    tractability) restricts selection to the seeded random subset — the batch
    is inside the subset, deterministic given the key, and different keys
    draw different pools."""
    import jax

    from ital_tpu.data.datasets import toy_gaussians
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.base import StrategyParams, labeled_mask
    from ital_tpu.select.ital import candidate_pool_mask, select_ital

    ds = toy_gaussians(n_per_class=60, n_classes=3, dim=2, seed=4)
    state = gp_mod.gp_init(jnp.asarray(ds.x), 1.5, 1.0, 0.1, cap=16)
    state = gp_mod.gp_set_query(state, jnp.asarray(5))
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(3)
    batch = np.asarray(select_ital(state, 3, key, params, n_qmc=32,
                                   subsample_size=25))
    # Recompute the expected pool with the same draw.
    u = jax.random.uniform(key, (ds.n,), state.mu.dtype)
    outside = np.asarray(candidate_pool_mask(state, u, 25))
    assert not outside[batch].any(), "batch left the random subsample"
    assert outside.sum() == ds.n - 25

    again = np.asarray(select_ital(state, 3, key, params, n_qmc=32,
                                   subsample_size=25))
    np.testing.assert_array_equal(batch, again)
    other = np.asarray(select_ital(state, 3, jax.random.PRNGKey(4), params,
                                   n_qmc=32, subsample_size=25))
    # Different key, different pool: batches are allowed to differ (and
    # typically do); at minimum the pools differ.
    u2 = jax.random.uniform(jax.random.PRNGKey(4), (ds.n,), state.mu.dtype)
    assert (np.asarray(candidate_pool_mask(state, u2, 25)) != outside).any()


def _warmed_state(seed=4, n_per_class=60, cap=16):
    """Posterior with a query + a few labels so MI scores are distinct (the
    uninformative posterior saturates MI at log 2^m and ties are
    ULP-sensitive — CLAUDE.md)."""
    import jax

    from ital_tpu.data.datasets import toy_gaussians
    from ital_tpu.models import gp as gp_mod

    ds = toy_gaussians(n_per_class=n_per_class, n_classes=3, dim=2, seed=seed)
    state = gp_mod.gp_init(jnp.asarray(ds.x), 1.5, 1.0, 0.1, cap=cap)
    state = gp_mod.gp_set_query(state, jnp.asarray(5))
    cls = int(ds.labels[5])
    picks = [p % ds.n for p in (11, 40, 90, 130)]
    ys = [1.0 if ds.relevance[i, cls] else -1.0 for i in picks]
    state = gp_mod.gp_update(
        state,
        jnp.asarray(picks, jnp.int32),
        jnp.asarray(ys, jnp.float32),
        jnp.ones(len(picks), bool),
    )
    return ds, state


@pytest.mark.parametrize("mode", ["pool", "subsample"])
def test_compact_pool_matches_masked_full_scan(mode):
    """The COMPACT pool scan (scores only the pool — VERDICT r3 item 1) picks
    the same batch as masking a full-corpus scan to the same pool — the
    round-3 semantics, now reproduced at pool-sized cost."""
    import jax

    from ital_tpu.select.base import StrategyParams, greedy_argmax_batch
    from ital_tpu.select.ital import (
        candidate_pool_mask,
        score_candidates_mi,
        select_ital,
    )

    ds, state = _warmed_state()
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(3)
    pool = 25
    kwargs = {"pool_size": pool} if mode == "pool" else {"subsample_size": pool}
    batch = np.asarray(select_ital(state, 3, key, params, n_qmc=32, **kwargs))

    # Masked full scan over the identical pool (the round-3 implementation).
    ranking = (
        state.mu if mode == "pool"
        else jax.random.uniform(key, (ds.n,), state.mu.dtype)
    )
    outside = candidate_pool_mask(state, ranking, pool)

    def score(b, t):
        s = score_candidates_mi(state, b, t, params, n_qmc=32)
        return jnp.where(outside, -jnp.inf, s)

    batch_masked = np.asarray(greedy_argmax_batch(score, state, 3))
    np.testing.assert_array_equal(batch, batch_masked)


def test_compact_pool_oversized_pool_matches_unrestricted():
    """pool_size >= number of candidates degenerates to the unrestricted scan
    (every candidate is in the pool); oversized pools clamp to N."""
    import jax

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds, state = _warmed_state(n_per_class=12)
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(0)
    full = np.asarray(select_ital(state, 2, key, params, n_qmc=32))
    pooled = np.asarray(
        select_ital(state, 2, key, params, n_qmc=32, pool_size=10 * ds.n)
    )
    np.testing.assert_array_equal(full, pooled)


@pytest.mark.slow
def test_greedy_selection_matches_oracle_b7(rng):
    """Greedy batch parity at b=7 — above the OLD m=6 guard, inside the
    round-4 measured MAX_MI_BATCH=8 (docs/PROFILE.md section 7): the full
    greedy pipeline (joint covariances, 3^7 feedback table, prefix-tree
    orthants) still reproduces the scipy/f64 oracle's batch."""
    state, ogp = _fitted_pair(
        rng, n=14, labeled=((3, 1.0), (9, -1.0), (11, 1.0))
    )
    params = StrategyParams(label_prob=jnp.asarray(0.8),
                            mistake_prob=jnp.asarray(0.1))
    batch = np.asarray(
        select_ital(state, 7, jax.random.PRNGKey(0), params, n_qmc=256)
    )
    candidates = [i for i in range(14) if i not in (3, 9, 11)]
    ref_batch = oracle.ital_select(ogp, candidates, 7, 0.8, 0.1)
    assert list(batch) == ref_batch


def test_refined_covering_all_equals_single_stage_high_nqmc():
    """Two-stage refinement that covers EVERY candidate (refine_top >= N) at
    ``refine_n_qmc = q`` selects the same batch as a plain single-stage scan
    at ``n_qmc = q``: with full coverage the coarse base scan only orders the
    candidates and every argmax is taken over the refined estimates — the
    coarse stage cannot change the decision."""
    import jax

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds, state = _warmed_state(n_per_class=20)
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(0)
    single = np.asarray(select_ital(state, 3, key, params, n_qmc=128))
    two_stage = np.asarray(
        select_ital(state, 3, key, params, n_qmc=16,
                    refine_top=ds.n, refine_n_qmc=128)
    )
    np.testing.assert_array_equal(two_stage, single)


def test_refined_pool_covering_pool_equals_unrefined_pool():
    """Inside the compact-pool path, refinement that covers the whole pool at
    the SAME n_qmc is the identity (same estimator, argmax over a gather)."""
    import jax

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds, state = _warmed_state()
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(1)
    plain = np.asarray(
        select_ital(state, 3, key, params, n_qmc=32, pool_size=25)
    )
    refined = np.asarray(
        select_ital(state, 3, key, params, n_qmc=32, pool_size=25,
                    refine_top=25, refine_n_qmc=32)
    )
    np.testing.assert_array_equal(refined, plain)


def test_refined_coarse_base_recovers_high_nqmc_batch():
    """The production use: a COARSE base scan (n_qmc=8) plus top-10
    refinement at 256 points reproduces the single-stage n_qmc=256 batch —
    the base scan only needs to land the true winner inside the top-10, and
    the decision is then made at full accuracy (the static-shape analog of
    MVNDST's adaptive sample count, SURVEY.md section 2.2 N3)."""
    import jax

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds, state = _warmed_state(n_per_class=20)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.1)
    )
    key = jax.random.PRNGKey(2)
    accurate = np.asarray(select_ital(state, 3, key, params, n_qmc=256))
    coarse_refined = np.asarray(
        select_ital(state, 3, key, params, n_qmc=8,
                    refine_top=10, refine_n_qmc=256)
    )
    np.testing.assert_array_equal(coarse_refined, accurate)


def test_refined_coarse_base_inside_pool_recovers_high_nqmc_batch():
    """The PRODUCTION combination (compact pool x two-stage): a coarse base
    scan (n_qmc=8) over the pool plus top-10 refinement at 256 points
    reproduces the pool's single-stage n_qmc=256 batch — the same
    adaptive-sample-count recovery as the full-corpus analog above, composed
    with the tractability restriction (scripts/pool_refine.py measures the
    same combination's cost and MAP on the chip)."""
    import jax

    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds, state = _warmed_state(n_per_class=20)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.1)
    )
    key = jax.random.PRNGKey(3)
    accurate = np.asarray(
        select_ital(state, 3, key, params, n_qmc=256, pool_size=25)
    )
    coarse_refined = np.asarray(
        select_ital(state, 3, key, params, n_qmc=8, pool_size=25,
                    refine_top=10, refine_n_qmc=256)
    )
    np.testing.assert_array_equal(coarse_refined, accurate)


def test_pool_and_subsample_mutually_exclusive():
    import jax
    import pytest

    from ital_tpu.data.datasets import toy_gaussians
    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.base import StrategyParams
    from ital_tpu.select.ital import select_ital

    ds = toy_gaussians(n_per_class=20, n_classes=2, dim=2, seed=0)
    state = gp_mod.gp_set_query(
        gp_mod.gp_init(jnp.asarray(ds.x), 1.5, 1.0, 0.1, cap=8), jnp.asarray(0)
    )
    params = StrategyParams(label_prob=jnp.asarray(1.0),
                            mistake_prob=jnp.asarray(0.0))
    with pytest.raises(ValueError, match="mutually exclusive"):
        select_ital(state, 2, jax.random.PRNGKey(0), params,
                    pool_size=8, subsample_size=8)


def test_zero_shift_bit_identical_to_default(rng):
    """A zero Cranley-Patterson shift must be BIT-identical to shift=None:
    jnp.mod(w + 0, 1) == w exactly for lattice points in [0, 1), so the
    qmc_key plumbing cannot disturb the deterministic production path."""
    state, _ = _fitted_pair(rng)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    for t in (0, 1, 2):
        batch = jnp.zeros((3,), jnp.int32).at[0].set(11).at[1].set(22)
        base = np.asarray(
            score_candidates_mi(state, batch, t, params, n_qmc=64)
        )
        zeroed = np.asarray(
            score_candidates_mi(state, batch, t, params, n_qmc=64,
                                shift=jnp.zeros((t,), jnp.float32))
        )
        np.testing.assert_array_equal(base, zeroed)


def test_qmc_key_selection_deterministic_and_valid(rng):
    """Randomized-QMC selection (qmc_key): same key -> same batch, different
    keys generally differ in scores (estimator randomization), and labeled
    items are never selected — across all three dispatch paths (full scan,
    refined full scan, compact pool)."""
    state, _ = _fitted_pair(rng)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    labeled = {3, 17, 29}
    key = jax.random.PRNGKey(42)
    for kwargs in (
        {},  # full scan
        {"refine_top": 8, "refine_n_qmc": 64},  # two-stage full scan
        {"pool_size": 20},  # compact pool
        {"subsample_size": 20, "refine_top": 8, "refine_n_qmc": 64},
    ):
        a = np.asarray(select_ital(state, 3, key, params, n_qmc=32,
                                   qmc_key=key, **kwargs))
        b = np.asarray(select_ital(state, 3, key, params, n_qmc=32,
                                   qmc_key=key, **kwargs))
        np.testing.assert_array_equal(a, b)
        assert not (set(a.tolist()) & labeled), kwargs
        assert len(set(a.tolist())) == 3, kwargs


def test_qmc_key_selection_matches_oracle(rng):
    """A randomly shifted lattice is an equally valid estimator: at n_qmc=256
    the greedy selection under qmc_key still matches the exact-enumeration
    oracle batch (deterministic given the fixed key)."""
    state, ogp = _fitted_pair(rng, n=30)
    params = StrategyParams(
        label_prob=jnp.asarray(1.0), mistake_prob=jnp.asarray(0.0)
    )
    batch = np.asarray(
        select_ital(state, 3, jax.random.PRNGKey(0), params, n_qmc=256,
                    qmc_key=jax.random.PRNGKey(123))
    )
    candidates = [i for i in range(30) if i not in (3, 17, 29)]
    ref_batch = oracle.ital_select(ogp, candidates, 3, 1.0, 0.0)
    assert list(batch) == ref_batch


def test_nonzero_shift_changes_scores(rng):
    """A keyed (nonzero) shift must actually move the QMC estimates — the
    counterpart of the zero-shift bit-equality test, and the estimator-level
    evidence behind the runner's randomize_qmc plumbing test."""
    state, _ = _fitted_pair(rng)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    from ital_tpu.select.ital import _step_shift

    batch = jnp.zeros((2,), jnp.int32).at[0].set(11)
    base = np.asarray(score_candidates_mi(state, batch, 1, params, n_qmc=8))
    shifted = np.asarray(score_candidates_mi(
        state, batch, 1, params, n_qmc=8,
        shift=_step_shift(jax.random.PRNGKey(3), 1, jnp.float32),
    ))
    assert np.abs(shifted - base).max() > 1e-6


def test_block_size_is_value_invariant(rng):
    """The candidate-streaming ``block`` width is a pure locality/perf knob:
    each candidate's QMC chain runs entirely within its own block, so scores
    agree across block sizes to fp associativity (~1 ULP — XLA vectorizes
    reductions differently per block shape; measured 2.4e-7 max) and the
    selected batches match (this is what licenses chip-side block sweeps at
    the production n_qmc without re-validating selection semantics)."""
    state, _ = _fitted_pair(rng, n=70, cap=16)
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    batch = jnp.zeros((2,), jnp.int32).at[0].set(11)
    s_small = np.asarray(score_candidates_mi(
        state, batch, 1, params, n_qmc=16, block=16))
    s_big = np.asarray(score_candidates_mi(
        state, batch, 1, params, n_qmc=16, block=4096))
    np.testing.assert_allclose(s_small, s_big, atol=2e-6, rtol=1e-5)

    key = jax.random.PRNGKey(5)
    b_small = np.asarray(select_ital(
        state, 3, key, params, n_qmc=16, block=16,
        pool_size=24, refine_top=6, refine_n_qmc=32))
    b_big = np.asarray(select_ital(
        state, 3, key, params, n_qmc=16, block=4096,
        pool_size=24, refine_top=6, refine_n_qmc=32))
    np.testing.assert_array_equal(b_small, b_big)
