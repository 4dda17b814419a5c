"""Strategy-registry-wide properties: every selector returns valid batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.data.datasets import toy_gaussians
from ital_tpu.models import gp as gp_mod
from ital_tpu.select import STRATEGIES
from ital_tpu.select.base import StrategyParams, labeled_mask


@pytest.fixture(scope="module")
def fitted_state():
    ds = toy_gaussians(n_per_class=50, n_classes=3, dim=2, seed=2)
    state = gp_mod.gp_init(jnp.asarray(ds.x), 1.5, 1.0, 0.1, cap=16)
    state = gp_mod.gp_set_query(state, jnp.asarray(7))
    state = gp_mod.gp_update(
        state,
        jnp.asarray([20, 80, 110], jnp.int32),
        jnp.asarray([1.0, -1.0, -1.0], jnp.float32),
        jnp.ones(3, bool),
    )
    return state.replace(density=gp_mod.corpus_density(state))


@pytest.mark.parametrize("name", sorted(STRATEGIES))
def test_strategy_returns_valid_unlabeled_batch(fitted_state, name):
    state = fitted_state
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    batch = np.asarray(STRATEGIES[name](state, 3, jax.random.PRNGKey(1), params))
    assert batch.shape == (3,)
    assert len(set(batch.tolist())) == 3, "duplicate selections"
    assert (batch >= 0).all() and (batch < state.x.shape[0]).all()
    labeled = set(np.flatnonzero(np.asarray(labeled_mask(state))).tolist())
    assert not (set(batch.tolist()) & labeled), "selected an already-labeled item"


@pytest.mark.parametrize("name", sorted(s for s in STRATEGIES if s != "random"))
def test_strategy_deterministic_given_key(fitted_state, name):
    params = StrategyParams(label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05))
    b1 = np.asarray(STRATEGIES[name](fitted_state, 2, jax.random.PRNGKey(0), params))
    b2 = np.asarray(STRATEGIES[name](fitted_state, 2, jax.random.PRNGKey(0), params))
    np.testing.assert_array_equal(b1, b2)


def test_diversity_penalty_is_max_over_union():
    """The diversity penalty is max-sim over labeled UNION chosen — summing
    the two maxes would double-penalize and flip this selection (regression
    test for the round-2 review finding)."""
    import jax.numpy as jnp
    import numpy as np

    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.baselines import _diversity_greedy

    # 1-D geometry (ls=1): labeled L at 0; C is forced first pick; A is near
    # both L (sim .9) and C (sim .8); B is nearer L (sim .95) but far from C.
    # max-over-union prefers A (0.9 < 0.95); a summed penalty would prefer B
    # (1.7 > ~1.3).
    x = np.array([[0.0], [1.127], [0.459], [-0.320]], np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), 1.0, 1.0, 0.1, cap=4)
    state = gp_mod.gp_update(state, jnp.asarray([0], jnp.int32),
                             jnp.asarray([1.0], jnp.float32),
                             jnp.ones(1, bool))
    base = jnp.asarray([0.0, 100.0, 0.0, 0.0], jnp.float32)  # C first
    batch = np.asarray(_diversity_greedy(state, 2, base, jnp.asarray(1.0)))
    assert list(batch) == [1, 2], batch


def test_emoc_batch_first_pick_matches_emoc(fitted_state):
    """At t=0 batch EMOC is exactly one-point EMOC (empty hypothetical batch),
    so the two strategies' first greedy picks must coincide; later picks use
    the block hypothetical update and may legitimately differ."""
    from ital_tpu.select.baselines import select_emoc, select_emoc_batch

    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    key = jax.random.PRNGKey(0)
    b_one = np.asarray(select_emoc(fitted_state, 3, key, params))
    b_blk = np.asarray(select_emoc_batch(fitted_state, 3, key, params))
    assert b_one[0] == b_blk[0]


def test_emoc_batch_matches_dense_oracle():
    """Independent f64 oracle for batch EMOC (code-review round 3): the t>0
    greedy pick must equal a dense NumPy implementation that refits the
    oracle GP with the first pick's most-probable label appended — catching
    any shared-formula error in the TPU scoring path (CLAUDE.md: new selector
    behavior needs an oracle comparison)."""
    from scipy.stats import norm

    from ital_tpu.select.baselines import select_emoc_batch
    from tests.oracle.numpy_oracle import OracleGP

    ds = toy_gaussians(n_per_class=50, n_classes=3, dim=2, seed=9)
    n = ds.n
    ls, var, noise = 1.5, 1.0, 0.1
    query = 4
    cls = int(ds.labels[query])
    labeled = [query, 30, 75, 120]
    ys = [1.0] + [1.0 if ds.relevance[i, cls] else -1.0 for i in labeled[1:]]

    state = gp_mod.gp_init(jnp.asarray(ds.x), ls, var, noise, cap=16)
    state = gp_mod.gp_set_query(state, jnp.asarray(query))
    state = gp_mod.gp_update(
        state, jnp.asarray(labeled[1:], jnp.int32),
        jnp.asarray(ys[1:], jnp.float32), jnp.ones(3, bool),
    )
    params = StrategyParams(
        label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05)
    )
    batch = np.asarray(select_emoc_batch(state, 2, jax.random.PRNGKey(0), params))

    def oracle_emoc_scores(gp):
        mu, sig2 = gp.predict_diag()
        k_li = gp.k_all[np.ix_(gp.labeled, range(n))]
        from scipy.linalg import solve_triangular

        v = solve_triangular(gp._cho[0], k_li, lower=True)
        k_post = gp.k_all - v.T @ v  # (N, N) dense hypothetical-free posterior
        colabs = np.abs(k_post).sum(axis=0)
        p_pos = norm.cdf(mu / np.sqrt(sig2))
        exp_change = p_pos * np.abs(1.0 - mu) + (1 - p_pos) * np.abs(-1.0 - mu)
        return exp_change / (sig2 + gp.noise) * colabs

    gp = OracleGP(ds.x, ls, var, noise)
    gp.fit(labeled, ys)
    s0 = oracle_emoc_scores(gp)
    s0[labeled] = -np.inf
    c1 = int(np.argmax(s0))
    assert batch[0] == c1

    y1 = 1.0 if gp.predict_mean([c1])[0] >= 0 else -1.0
    gp.fit(labeled + [c1], ys + [y1])  # hypothetical refit == block update
    s1 = oracle_emoc_scores(gp)
    s1[labeled + [c1]] = -np.inf
    assert batch[1] == int(np.argmax(s1))
