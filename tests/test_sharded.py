"""Sharded (8-virtual-device mesh) round vs single-device round — SURVEY.md section 4 item 5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ital_tpu.data.datasets import toy_gaussians
from ital_tpu.models import gp as gp_mod
from ital_tpu.parallel import make_mesh, make_sharded_round, pad_to_devices, shard_state
from ital_tpu.parallel.sharded import make_masks
from ital_tpu.select.base import StrategyParams
from ital_tpu.select.ital import select_ital
from ital_tpu.data.user import simulate_feedback
from ital_tpu.utils.metrics import average_precision

LS, VAR, NOISE = 1.5, 1.0, 0.1


def _setup(n_dev=8, strategy="ital", batch_size=2):
    assert jax.device_count() >= n_dev, "conftest must provide 8 virtual devices"
    ds = toy_gaussians(n_per_class=77, n_classes=3, dim=2, seed=5)  # 231 rows: pads to 232
    x_pad, n_real = pad_to_devices(ds.x, n_dev)
    mesh = make_mesh(n_dev)
    state = gp_mod.gp_init(jnp.asarray(x_pad), LS, VAR, NOISE, cap=16)
    query = 4
    cls = int(ds.labels[query])
    relevant = jnp.asarray(
        np.pad(ds.relevance[:, cls], (0, x_pad.shape[0] - n_real))
    )
    sel_forbid, ap_exclude = make_masks(x_pad.shape[0], n_real, query)
    # Noisy user model: keeps MI scores away from the saturated log(2^m)
    # plateau where exact ties would make argmax comparisons ULP-sensitive.
    params = StrategyParams(label_prob=jnp.asarray(0.9), mistake_prob=jnp.asarray(0.05))
    return ds, mesh, state, query, relevant, sel_forbid, ap_exclude, params


def _warmed(state0, ds, query):
    """Posterior with the query + a few labels so candidate scores are distinct."""
    state = gp_mod.gp_set_query(state0, jnp.asarray(query))
    cls = int(ds.labels[query])
    picks = [11, 40, 90, 150]
    ys = [1.0 if ds.relevance[i, cls] else -1.0 for i in picks]
    return gp_mod.gp_update(
        state,
        jnp.asarray(picks, jnp.int32),
        jnp.asarray(ys, jnp.float32),
        jnp.ones(len(picks), bool),
    )


@pytest.mark.parametrize("strategy", ["ital", "uncertainty_sampling"])
def test_sharded_round_matches_single_device(strategy):
    ds, mesh, state0, query, relevant, sel_forbid, ap_exclude, params = _setup(
        strategy=strategy
    )
    batch_size = 2
    key = jax.random.PRNGKey(7)

    # --- single-device reference path ---
    state_s = _warmed(state0, ds, query)
    if strategy == "ital":
        batch_s = select_ital(state_s, batch_size, key, params, n_qmc=64)
    else:
        # Reference greedy with the same forbid mask the sharded path applies.
        from ital_tpu.select.base import labeled_mask

        scores0 = -jnp.abs(state_s.mu) / jnp.sqrt(state_s.sig2)
        forbid = labeled_mask(state_s) | sel_forbid
        picks = []
        for _ in range(batch_size):
            s = jnp.where(forbid, -jnp.inf, scores0)
            nxt = int(jnp.argmax(s))
            picks.append(nxt)
            forbid = forbid.at[nxt].set(True)
        batch_s = jnp.asarray(picks, jnp.int32)
    k_sel, k_user = jax.random.split(key)
    y, valid = simulate_feedback(
        k_user, batch_s, relevant, params.label_prob, params.mistake_prob
    )
    state_s = gp_mod.gp_update(state_s, batch_s, y, valid)
    ap_s = average_precision(state_s.mu, relevant, ap_exclude)

    # --- sharded path ---
    state_m = shard_state(_warmed(state0, ds, query), mesh)
    round_fn = make_sharded_round(
        mesh, strategy=strategy, batch_size=batch_size, n_qmc=64
    )
    state_m, batch_m, ap_m = round_fn(
        state_m, key, relevant, sel_forbid, ap_exclude, params
    )

    if strategy == "ital":
        np.testing.assert_array_equal(np.asarray(batch_m), np.asarray(batch_s))
    np.testing.assert_allclose(float(ap_m), float(ap_s), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(state_m.mu), np.asarray(state_s.mu), atol=2e-3
    )


def test_sharded_multi_round_session():
    """Three consecutive sharded rounds keep improving and stay finite."""
    ds, mesh, state0, query, relevant, sel_forbid, ap_exclude, params = _setup()
    state = shard_state(gp_mod.gp_set_query(state0, jnp.asarray(query)), mesh)
    round_fn = make_sharded_round(mesh, strategy="ital", batch_size=2, n_qmc=32)
    aps = []
    for r in range(3):
        key = jax.random.fold_in(jax.random.PRNGKey(0), r)
        state, batch, ap = round_fn(
            state, key, relevant, sel_forbid, ap_exclude, params
        )
        aps.append(float(ap))
        # Selected batch is within the real corpus, never the pad rows.
        assert (np.asarray(batch) < ds.n).all()
    assert np.isfinite(aps).all()
    assert int(state.count) == 1 + 3 * 2


def test_uncertainty_masking_note():
    """uncertainty baseline masks pad rows via sig2=-inf trick in the test above;
    the sharded path's own forbid-mask handles it — both must agree on batch
    membership being in the real corpus."""
    ds, mesh, state0, query, relevant, sel_forbid, ap_exclude, params = _setup()
    state = shard_state(gp_mod.gp_set_query(state0, jnp.asarray(query)), mesh)
    round_fn = make_sharded_round(mesh, strategy="random", batch_size=4)
    _, batch, _ = round_fn(state, jax.random.PRNGKey(1), relevant, sel_forbid,
                           ap_exclude, params)
    assert (np.asarray(batch) < ds.n).all()


@pytest.mark.parametrize("strategy", ["emoc", "mcmi_min"])
def test_ring_strategies_match_single_device(strategy):
    """Ring-pass EMOC/MCMI over 8 shards == the single-device blockwise scores."""
    from ital_tpu.select.base import get_strategy, labeled_mask

    ds, mesh, state0, query, relevant, sel_forbid, ap_exclude, params = _setup()
    state_s = _warmed(state0, ds, query)

    # Single-device reference batch with the same pad-forbid mask.
    from ital_tpu.select.baselines import select_emoc, select_mcmi_min

    ref_fn = select_emoc if strategy == "emoc" else select_mcmi_min
    # Compute reference scores on the unsharded state, then greedy with mask.
    key = jax.random.PRNGKey(3)
    # Reference full greedy (its own mask excludes labeled only) — emulate the
    # sharded mask by scoring then masking manually.
    pad = sel_forbid  # make_masks: sel_forbid flags exactly the pad rows

    if strategy == "emoc":
        from ital_tpu.ops.kernels import blockwise_reduce_abs_kpost
        from ital_tpu.select.baselines import _p_relevant

        n = state_s.x.shape[0]
        # Pad rows weighted out of the corpus reduction, like the ring does.
        colabs = blockwise_reduce_abs_kpost(
            state_s.x, state_s.v, jnp.arange(n),
            state_s.hyper.length_scale, state_s.hyper.var,
            weights=1.0 - pad.astype(state_s.mu.dtype),
        )
        p_pos = _p_relevant(state_s)
        exp_change = p_pos * jnp.abs(1 - state_s.mu) + (1 - p_pos) * jnp.abs(-1 - state_s.mu)
        scores_ref = exp_change / (state_s.sig2 + state_s.hyper.noise) * colabs
    else:
        # 1-device mesh run of the same ring code (the 8-shard run must agree).
        mesh1 = make_mesh(1)
        from ital_tpu.parallel.sharded import _sharded_mcmi_scores, state_pspecs
        from jax.sharding import PartitionSpec as P

        specs = state_pspecs(state_s)
        pspecs = jax.tree.map(lambda _: P(), params,
                              is_leaf=lambda v: not isinstance(v, type(params)))
        fn1 = jax.shard_map(
            _sharded_mcmi_scores,
            mesh=mesh1, in_specs=(specs, pspecs, P("data")), out_specs=P("data"),
            check_vma=False,
        )
        scores_ref = fn1(jax.device_put(state_s), params, pad)

    # Sharded scores over the 8-device mesh.
    from ital_tpu.parallel.sharded import (
        _sharded_emoc_scores, _sharded_mcmi_scores, state_pspecs,
    )
    from jax.sharding import PartitionSpec as P

    specs = state_pspecs(state_s)
    pspecs = jax.tree.map(lambda _: P(), params,
                          is_leaf=lambda v: not isinstance(v, type(params)))
    fn = jax.shard_map(
        (_sharded_emoc_scores if strategy == "emoc" else _sharded_mcmi_scores),
        mesh=mesh, in_specs=(specs, pspecs, P("data")), out_specs=P("data"),
        check_vma=False,
    )
    scores_m = fn(shard_state(state_s, mesh), params, pad)

    np.testing.assert_allclose(
        np.asarray(scores_m), np.asarray(scores_ref), rtol=2e-3, atol=2e-3
    )


def test_sharded_round_emoc_runs():
    ds, mesh, state0, query, relevant, sel_forbid, ap_exclude, params = _setup()
    state = shard_state(_warmed(state0, ds, query), mesh)
    round_fn = make_sharded_round(mesh, strategy="emoc", batch_size=3)
    _, batch, ap = round_fn(state, jax.random.PRNGKey(0), relevant, sel_forbid,
                            ap_exclude, params)
    assert (np.asarray(batch) < ds.n).all() and np.isfinite(float(ap))
