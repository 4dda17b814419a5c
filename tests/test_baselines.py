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
