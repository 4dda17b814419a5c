"""GP relevance model vs the dense NumPy oracle; incremental update vs refit."""

import jax
import jax.numpy as jnp
import numpy as np

from ital_tpu.models import gp as gp_mod
from tests.oracle.numpy_oracle import OracleGP

LS, VAR, NOISE = 1.2, 1.0, 0.1


def _setup(rng, n=80, d=6, cap=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), LS, VAR, NOISE, cap)
    oracle = OracleGP(x, LS, VAR, NOISE)
    return x, state, oracle


def test_fit_matches_oracle(rng):
    x, state, oracle = _setup(rng)
    lab = [3, 17, 42, 55]
    ys = [1.0, -1.0, 1.0, -1.0]

    state = state.replace(
        idx=state.idx.at[: len(lab)].set(jnp.asarray(lab, jnp.int32)),
        y=state.y.at[: len(lab)].set(jnp.asarray(ys, jnp.float32)),
        valid=state.valid.at[: len(lab)].set(True),
        count=jnp.asarray(len(lab), jnp.int32),
    )
    state = gp_mod.gp_fit(state)
    oracle.fit(lab, ys)

    mu_o, sig2_o = oracle.predict_diag()
    np.testing.assert_allclose(np.asarray(state.mu), mu_o, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.sig2), sig2_o, rtol=5e-3, atol=1e-2)

    sel = [0, 9, 3, 61]
    mu_full, cov_full = gp_mod.gp_predict_full(state, jnp.asarray(sel))
    np.testing.assert_allclose(np.asarray(mu_full), oracle.predict_mean(sel), atol=5e-3)
    np.testing.assert_allclose(np.asarray(cov_full), oracle.predict_cov(sel), atol=5e-3)


def test_set_query_then_update_matches_oracle(rng):
    x, state, oracle = _setup(rng)
    q = 7
    state = gp_mod.gp_set_query(state, jnp.asarray(q))
    oracle.fit([q], [1.0])
    np.testing.assert_allclose(np.asarray(state.mu), oracle.predict_mean(), atol=5e-3)

    # Round 1: user labels 2 of 3 shown items (one skip).
    shown = [12, 30, 51]
    labels = [1.0, -1.0, 1.0]
    valid = [True, False, True]
    state = gp_mod.gp_update(
        state,
        jnp.asarray(shown, jnp.int32),
        jnp.asarray(labels, jnp.float32),
        jnp.asarray(valid),
    )
    oracle.fit([q, 12, 51], [1.0, 1.0, 1.0])
    mu_o, sig2_o = oracle.predict_diag()
    np.testing.assert_allclose(np.asarray(state.mu), mu_o, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.sig2), sig2_o, rtol=5e-3, atol=5e-3)

    # Round 2: more labels; incremental must still track the oracle.
    state = gp_mod.gp_update(
        state,
        jnp.asarray([2, 64], jnp.int32),
        jnp.asarray([-1.0, -1.0], jnp.float32),
        jnp.asarray([True, True]),
    )
    oracle.fit([q, 12, 51, 2, 64], [1.0, 1.0, 1.0, -1.0, -1.0])
    mu_o, _ = oracle.predict_diag()
    np.testing.assert_allclose(np.asarray(state.mu), mu_o, rtol=5e-3, atol=5e-3)


def test_incremental_update_equals_refit(rng):
    x, state, _ = _setup(rng)
    state = gp_mod.gp_set_query(state, jnp.asarray(5))
    new_idx = jnp.asarray([10, 20, 33, 47], jnp.int32)
    new_y = jnp.asarray([1.0, -1.0, 1.0, -1.0], jnp.float32)
    new_valid = jnp.asarray([True, True, False, True])

    inc = gp_mod.gp_update(state, new_idx, new_y, new_valid)

    appended = state.replace(
        idx=jax.lax.dynamic_update_slice(state.idx, new_idx, (state.count,)),
        y=jax.lax.dynamic_update_slice(
            state.y, jnp.where(new_valid, new_y, 0.0), (state.count,)
        ),
        valid=jax.lax.dynamic_update_slice(state.valid, new_valid, (state.count,)),
        count=state.count + 4,
    )
    ref = gp_mod.gp_fit(appended)

    np.testing.assert_allclose(np.asarray(inc.l), np.asarray(ref.l), atol=1e-3)
    np.testing.assert_allclose(np.asarray(inc.beta), np.asarray(ref.beta), atol=1e-3)
    np.testing.assert_allclose(np.asarray(inc.v), np.asarray(ref.v), atol=1e-3)
    np.testing.assert_allclose(np.asarray(inc.mu), np.asarray(ref.mu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(inc.sig2), np.asarray(ref.sig2), atol=1e-3)


def test_updated_mean_delta_matches_oracle_refit(rng):
    x, state, oracle = _setup(rng)
    state = gp_mod.gp_set_query(state, jnp.asarray(5))
    oracle.fit([5], [1.0])

    cand, y_hyp = 22, -1.0
    delta = np.asarray(gp_mod.gp_updated_mean_delta(state, jnp.asarray(cand), y_hyp))

    mu_before = oracle.predict_mean()
    oracle.fit([5, cand], [1.0, y_hyp])
    mu_after = oracle.predict_mean()
    np.testing.assert_allclose(delta, mu_after - mu_before, rtol=5e-3, atol=5e-3)


def test_fit_functions_jit_once(rng):
    """fit/update must not recompile as count grows (static-shape discipline)."""
    x, state, _ = _setup(rng)
    update = jax.jit(gp_mod.gp_update)
    state = gp_mod.gp_set_query(state, jnp.asarray(0))
    for r in range(3):
        state = update(
            state,
            jnp.asarray([1 + 3 * r, 2 + 3 * r, 3 + 3 * r], jnp.int32),
            jnp.asarray([1.0, -1.0, 1.0], jnp.float32),
            jnp.asarray([True, True, True]),
        )
    assert update._cache_size() == 1
    assert int(state.count) == 10


def test_update_fills_capacity_exactly(rng):
    """count + b == cap is legal and matches a refit at the boundary."""
    x, state, _ = _setup(rng, cap=8)
    state = gp_mod.gp_set_query(state, jnp.asarray(0))  # 1 slot used
    state = gp_mod.gp_update(  # 1 + 3 = 4
        state, jnp.asarray([1, 2, 3], jnp.int32),
        jnp.asarray([1.0, -1.0, 1.0], jnp.float32), jnp.ones(3, bool),
    )
    inc = gp_mod.gp_update(  # 4 + 4 = 8 == cap
        state, jnp.asarray([4, 5, 6, 7], jnp.int32),
        jnp.asarray([1.0, 1.0, -1.0, -1.0], jnp.float32), jnp.ones(4, bool),
    )
    assert int(inc.count) == 8
    ref = gp_mod.gp_fit(inc)
    np.testing.assert_allclose(np.asarray(inc.mu), np.asarray(ref.mu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(inc.sig2), np.asarray(ref.sig2), atol=1e-3)


def test_block_updated_prediction_matches_oracle_refit(rng):
    """VERDICT r2 item 8: gp_updated_prediction over an arbitrary k-point block
    equals the f64 oracle refit with the block appended (SURVEY section 3.4 —
    the reference's updated_prediction takes index sets, not just one point)."""
    x, state, oracle = _setup(rng)
    lab = [3, 17, 42, 55, 70]
    ys = [1.0, -1.0, 1.0, -1.0, 1.0]
    state = state.replace(
        idx=state.idx.at[: len(lab)].set(jnp.asarray(lab, jnp.int32)),
        y=state.y.at[: len(lab)].set(jnp.asarray(ys, jnp.float32)),
        valid=state.valid.at[: len(lab)].set(True),
        count=jnp.asarray(len(lab), jnp.int32),
    )
    state = gp_mod.gp_fit(state)
    oracle.fit(lab, ys)

    block = [8, 25, 61]
    y_hyp = [1.0, 1.0, -1.0]
    mu_h, sig2_h = gp_mod.gp_updated_prediction(
        state, jnp.asarray(block, jnp.int32), jnp.asarray(y_hyp, jnp.float32)
    )
    oracle.fit(lab + block, ys + y_hyp)
    mu_o, sig2_o = oracle.predict_diag()
    np.testing.assert_allclose(np.asarray(mu_h), mu_o, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sig2_h), sig2_o, rtol=5e-3, atol=1e-2)


def test_block_updated_prediction_valid_mask(rng):
    """Invalid rows of the hypothetical block are mathematically absent."""
    x, state, oracle = _setup(rng)
    state = gp_mod.gp_set_query(state, jnp.asarray(5))

    block = jnp.asarray([20, 33, 47], jnp.int32)
    y_hyp = jnp.asarray([1.0, -1.0, 1.0], jnp.float32)
    valid = jnp.asarray([True, False, True])
    mu_m, sig2_m = gp_mod.gp_updated_prediction(state, block, y_hyp, valid)
    mu_s, sig2_s = gp_mod.gp_updated_prediction(
        state, block[jnp.asarray([0, 2])], y_hyp[jnp.asarray([0, 2])]
    )
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig2_m), np.asarray(sig2_s), atol=1e-5)


def test_block_updated_prediction_one_point_consistency(rng):
    """k=1 block update reproduces the closed-form one-point mean delta."""
    x, state, oracle = _setup(rng)
    state = gp_mod.gp_set_query(state, jnp.asarray(2))
    cand = jnp.asarray(40)
    delta = gp_mod.gp_updated_mean_delta(state, cand, jnp.asarray(1.0))
    mu_h, _ = gp_mod.gp_updated_prediction(
        state, cand[None], jnp.ones((1,), jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(mu_h - state.mu), np.asarray(delta), atol=1e-5
    )


def test_block_updated_whitening_composes(rng):
    """The augmented whitened state (v + w rows) reproduces the updated
    posterior covariance: a second hypothetical update on top of the first
    equals one update with the union block — the property batch-EMOC uses."""
    x, state, oracle = _setup(rng)
    state = gp_mod.gp_set_query(state, jnp.asarray(9))

    b1 = jnp.asarray([14, 28], jnp.int32)
    y1 = jnp.asarray([1.0, -1.0], jnp.float32)
    g1, w1 = gp_mod.gp_updated_whitening(state, b1, y1)
    state_h = state.replace(
        v=jnp.concatenate([state.v, w1], axis=0),
        l=jnp.eye(state.cap + 2, dtype=state.l.dtype),  # placeholder (unused)
        beta=jnp.zeros((state.cap + 2,), state.beta.dtype),  # placeholder
        mu=state.mu + w1.T @ g1,
        sig2=jnp.maximum(state.sig2 - jnp.sum(w1 * w1, axis=0), 1e-8),
    )
    b2 = jnp.asarray([52], jnp.int32)
    y2 = jnp.asarray([1.0], jnp.float32)
    mu_seq, sig2_seq = gp_mod.gp_updated_prediction(state_h, b2, y2)
    mu_joint, sig2_joint = gp_mod.gp_updated_prediction(
        state, jnp.concatenate([b1, b2]), jnp.concatenate([y1, y2])
    )
    np.testing.assert_allclose(np.asarray(mu_seq), np.asarray(mu_joint), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sig2_seq), np.asarray(sig2_joint), atol=1e-4)
