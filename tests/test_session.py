"""User-facing ActiveRetrieval session API + checkpoint/resume."""

import numpy as np

from ital_tpu.data.datasets import toy_gaussians
from ital_tpu.models.session import ActiveRetrieval
from ital_tpu.utils.checkpoint import load_session, save_session


def _session(strategy="ital", **kw):
    ds = toy_gaussians(n_per_class=60, n_classes=3, dim=2, seed=3)
    sess = ActiveRetrieval(
        ds.x, length_scale=1.5, var=1.0, noise=0.1, cap=16, strategy=strategy, **kw
    )
    return ds, sess


def test_session_feedback_loop_improves_ranking():
    ds, sess = _session()
    c = int(ds.labels[5])
    sess.update_query(5)
    for _ in range(3):
        batch = sess.fetch_unlabelled(2)
        fb = {int(i): (1 if ds.relevance[i, c] else -1) for i in batch}
        sess.update(fb)
    top = sess.top_k(10)
    frac_rel = ds.relevance[top, c].mean()
    assert frac_rel >= 0.8
    assert set(sess.relevant_ids) >= {5}


def test_session_skip_handling():
    ds, sess = _session(strategy="uncertainty_sampling")
    sess.update_query(0)
    batch = sess.fetch_unlabelled(3)
    sess.update({int(batch[0]): 1, int(batch[1]): None, int(batch[2]): 0})
    assert len(sess.relevant_ids) == 2  # query + one labeled
    assert len(sess.irrelevant_ids) == 0


def test_checkpoint_roundtrip(tmp_path):
    ds, sess = _session()
    sess.update_query(7)
    batch = sess.fetch_unlabelled(2)
    c = int(ds.labels[7])
    sess.update({int(i): (1 if ds.relevance[i, c] else -1) for i in batch})

    path = str(tmp_path / "sess.npz")
    save_session(path, sess.state, extra={"curve": np.asarray([0.5, 0.6])})

    _, fresh = _session()
    restored, extras = load_session(path, fresh.state)
    np.testing.assert_array_equal(np.asarray(restored.idx), np.asarray(sess.state.idx))
    np.testing.assert_allclose(np.asarray(restored.mu), np.asarray(sess.state.mu))
    np.testing.assert_allclose(extras["curve"], [0.5, 0.6])

    # The restored session keeps working (posterior is fully reconstructed).
    fresh.state = restored
    batch2 = fresh.fetch_unlabelled(2)
    assert batch2.shape == (2,)


def test_capacity_overflow_raises():
    ds, sess = _session(strategy="random")
    sess.state = sess.state.replace(count=sess.state.count + 14)  # 14/16 used
    sess.update_query(0)  # resets to 1 used
    sess.state = sess.state.replace(count=sess.state.count + 14)  # 15/16
    import pytest

    with pytest.raises(ValueError, match="capacity exceeded"):
        sess.update({1: 1, 2: -1})


def test_posterior_variance_monotone_in_labels():
    """Property: marginal variance never increases as labels accumulate."""
    import jax.numpy as jnp

    from ital_tpu.models import gp as gp_mod

    ds, sess = _session(strategy="random")
    sess.update_query(3)
    prev = np.asarray(sess.state.sig2)
    for r in range(4):
        batch = sess.fetch_unlabelled(2)
        c = int(ds.labels[3])
        sess.update({int(i): (1 if ds.relevance[i, c] else -1) for i in batch})
        cur = np.asarray(sess.state.sig2)
        assert (cur <= prev + 1e-4).all(), f"variance increased at round {r}"
        prev = cur


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Checkpoints gather sharded arrays and reload onto a fresh mesh."""
    import jax
    import jax.numpy as jnp

    from ital_tpu.models import gp as gp_mod
    from ital_tpu.parallel import make_mesh, pad_to_devices, shard_state
    from ital_tpu.utils.checkpoint import load_session, save_session

    ds, _ = _session()
    x_pad, _ = pad_to_devices(ds.x, 8)
    mesh = make_mesh(8)
    state = gp_mod.gp_init(jnp.asarray(x_pad), 1.5, 1.0, 0.1, cap=16)
    state = shard_state(gp_mod.gp_set_query(state, jnp.asarray(2)), mesh)

    path = str(tmp_path / "sharded.npz")
    save_session(path, state)

    template = gp_mod.gp_init(jnp.asarray(x_pad), 1.5, 1.0, 0.1, cap=16)
    restored, _ = load_session(path, template)
    np.testing.assert_allclose(
        np.asarray(restored.mu), np.asarray(state.mu), atol=1e-6
    )
    # And it can be re-sharded and keep running.
    resharded = shard_state(restored, mesh)
    assert int(resharded.count) == 1


def test_session_learn_hyperparams():
    """Interactive hyperparameter learning: hypers move, ranking stays sane."""
    import numpy as np

    from ital_tpu.models.session import ActiveRetrieval

    rng = np.random.default_rng(0)
    x = rng.normal(size=(80, 4)).astype(np.float32)
    sess = ActiveRetrieval(x, length_scale=0.5, noise=0.3, cap=16)
    sess.update_query(3)
    sess.update({10: 1, 20: -1, 30: 1, 40: -1, 50: 1})
    before = sess.scores().copy()
    h = sess.learn_hyperparams(steps=40, lr=0.08)
    assert h["length_scale"] != 0.5 and h["noise"] > 0
    after = sess.scores()
    assert np.isfinite(after).all() and not np.allclose(after, before)
    # Labeled signs are still respected by the refit posterior.
    assert after[10] > after[20] and after[50] > after[40]


def test_method_kwargs_non_scalar_fails_fast():
    """Static strategy options are jit cache keys; a list/dict value must be
    rejected at construction with a clear message, not a TypeError at the
    first fetch_unlabelled."""
    import numpy as np
    import pytest

    from ital_tpu.models.session import ActiveRetrieval

    x = np.random.default_rng(0).normal(size=(40, 4)).astype(np.float32)
    with pytest.raises(TypeError, match="scalar"):
        ActiveRetrieval(x, length_scale=1.0, cap=16,
                        method_kwargs={"pool_size": [16, 32]})


def test_method_kwargs_string_value_fails_fast():
    """No registered strategy declares a string option; a JSON client's
    '"n_qmc": "32"' must be rejected at construction, not surface as an
    opaque trace-time error at the first fetch_unlabelled."""
    import numpy as np
    import pytest

    from ital_tpu.models.session import ActiveRetrieval

    x = np.random.default_rng(0).normal(size=(40, 4)).astype(np.float32)
    with pytest.raises(TypeError, match="scalar"):
        ActiveRetrieval(x, length_scale=1.0, cap=16,
                        method_kwargs={"n_qmc": "32"})


def test_method_kwargs_unknown_name_fails_fast():
    """A typo'd option silently dropped would no-op at full cost; the
    user-facing ctor rejects undeclared names with the valid-names list."""
    import numpy as np
    import pytest

    from ital_tpu.models.session import ActiveRetrieval

    x = np.random.default_rng(0).normal(size=(40, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="pool_siez"):
        ActiveRetrieval(x, length_scale=1.0, cap=16,
                        method_kwargs={"pool_siez": 16})
