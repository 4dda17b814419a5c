"""GP hyperparameter learning: MLL correctness + ascent recovery + runner hook."""

import jax.numpy as jnp
import numpy as np

from ital_tpu.models.gp import GPHyper
from ital_tpu.models.hyperopt import fit_hyperparams, log_marginal_likelihood


def _hyper(ls, var, noise):
    return GPHyper(
        length_scale=jnp.asarray(ls, jnp.float32),
        var=jnp.asarray(var, jnp.float32),
        noise=jnp.asarray(noise, jnp.float32),
    )


def test_mll_matches_dense_numpy(rng):
    """Padded MLL == textbook formula on the active principal block."""
    cap, d, n_act = 12, 3, 7
    xl = rng.normal(size=(cap, d)).astype(np.float32)
    y = rng.choice([-1.0, 1.0], size=cap).astype(np.float32)
    active = np.zeros(cap, bool)
    active[rng.choice(cap, size=n_act, replace=False)] = True
    ls, var, noise = 1.5, 0.8, 0.2

    ours = float(
        log_marginal_likelihood(
            jnp.asarray(xl), jnp.asarray(y), jnp.asarray(active),
            _hyper(ls, var, noise),
        )
    )

    xa, ya = xl[active], y[active]
    d2 = ((xa[:, None] - xa[None, :]) ** 2).sum(-1)
    k = var * np.exp(-d2 / (2 * ls**2)) + noise * np.eye(n_act)
    sign, logdet = np.linalg.slogdet(k)
    ref = -0.5 * (
        ya @ np.linalg.solve(k, ya) + logdet + n_act * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_ascent_improves_mll_and_recovers_scale(rng):
    """Data drawn from a known-ls GP: ascent raises MLL and moves ls toward it."""
    cap, d, n_act, true_ls = 32, 2, 28, 2.0
    xl = rng.normal(size=(cap, d)).astype(np.float32) * 3.0
    d2 = ((xl[:n_act, None] - xl[None, :n_act]) ** 2).sum(-1)
    k = np.exp(-d2 / (2 * true_ls**2)) + 0.05 * np.eye(n_act)
    y = np.zeros(cap, np.float32)
    y[:n_act] = np.linalg.cholesky(k) @ rng.normal(size=n_act)
    active = np.arange(cap) < n_act

    h0 = _hyper(0.4, 1.0, 0.3)  # deliberately bad init
    args = (jnp.asarray(xl), jnp.asarray(y), jnp.asarray(active))
    h1 = fit_hyperparams(*args, h0, steps=120, lr=0.08)

    mll0 = float(log_marginal_likelihood(*args, h0))
    mll1 = float(log_marginal_likelihood(*args, h1))
    assert mll1 > mll0 + 1.0, (mll0, mll1)
    ls1 = float(h1.length_scale)
    assert abs(np.log(ls1 / true_ls)) < abs(np.log(0.4 / true_ls)), ls1
    assert float(h1.noise) > 0.0 and float(h1.var) > 0.0


def test_learn_noise_false_pins_noise(rng):
    cap, d = 16, 2
    xl = rng.normal(size=(cap, d)).astype(np.float32)
    y = rng.choice([-1.0, 1.0], size=cap).astype(np.float32)
    active = np.ones(cap, bool)
    h0 = _hyper(1.0, 1.0, 0.17)
    h1 = fit_hyperparams(
        jnp.asarray(xl), jnp.asarray(y), jnp.asarray(active), h0,
        steps=40, lr=0.1, learn_noise=False,
    )
    assert float(h1.noise) == np.float32(0.17)


def _flippy(rng, cap=48, d=4, n_act=40):
    """±1 labels with 15% flips — the NOISE_ANALYSIS Finding-4 regime where
    plain type-II ML pulls the noise far from its init."""
    xl = rng.normal(size=(cap, d)).astype(np.float32)
    y = np.sign(xl[:, 0] + 1e-3).astype(np.float32)
    y[rng.random(cap) < 0.15] *= -1
    active = np.arange(cap) < n_act
    return jnp.asarray(xl), jnp.asarray(y), jnp.asarray(active)


def test_map_prior_pulls_toward_center(rng):
    """MAP type-II: the log-normal prior bounds how far the estimate strays
    from its anchor; infinite strength pins the anchor exactly."""
    args = _flippy(rng)
    h0 = _hyper(2.0, 1.0, 1.0)
    kw = dict(steps=120, lr=0.08)
    ml = fit_hyperparams(*args, h0, **kw)
    map2 = fit_hyperparams(*args, h0, prior_strength=2.0, **kw)
    pinned = fit_hyperparams(*args, h0, prior_strength=1e4, **kw)

    # ML must actually move the noise for this test to mean anything.
    d_ml = abs(np.log(float(ml.noise) / 1.0))
    d_map = abs(np.log(float(map2.noise) / 1.0))
    assert d_ml > 0.8, float(ml.noise)
    assert d_map < d_ml, (float(map2.noise), float(ml.noise))
    for got, want in ((pinned.length_scale, 2.0), (pinned.var, 1.0),
                      (pinned.noise, 1.0)):
        np.testing.assert_allclose(float(got), want, rtol=2e-3)


def test_map_prior_center_defaults_to_init_and_can_differ(rng):
    """prior_center defaults to hyper0; an explicit anchor wins over it."""
    args = _flippy(rng)
    h0 = _hyper(2.0, 1.0, 1.0)
    anchored_at_init = fit_hyperparams(
        *args, h0, steps=60, lr=0.08, prior_strength=1e4
    )
    other = _hyper(0.7, 0.5, 0.2)
    anchored_elsewhere = fit_hyperparams(
        *args, h0, steps=400, lr=0.08, prior_strength=1e4, prior_center=other
    )
    np.testing.assert_allclose(float(anchored_at_init.noise), 1.0, rtol=1e-2)
    np.testing.assert_allclose(
        float(anchored_elsewhere.noise), 0.2, rtol=2e-2
    )


def test_noise_floor_is_respected(rng):
    """Projected ascent: the learned noise never drops below the floor —
    in a regime where the unregularized estimate provably would."""
    args = _flippy(rng)
    h0 = _hyper(2.0, 1.0, 1.0)
    kw = dict(steps=120, lr=0.08)
    ml = fit_hyperparams(*args, h0, **kw)
    floored = fit_hyperparams(*args, h0, noise_floor=0.3, **kw)
    assert float(ml.noise) < 0.3, float(ml.noise)  # the floor binds
    assert float(floored.noise) >= 0.3 * (1 - 1e-5), float(floored.noise)


def test_regularizers_off_is_bit_identical(rng):
    """strength=0 must ignore prior_center entirely (the defaults reproduce
    plain type-II ML bit-for-bit)."""
    args = _flippy(rng)
    h0 = _hyper(2.0, 1.0, 1.0)
    plain = fit_hyperparams(*args, h0, steps=40, lr=0.08)
    with_center = fit_hyperparams(
        *args, h0, steps=40, lr=0.08, prior_strength=0.0,
        prior_center=_hyper(9.0, 9.0, 9.0), noise_floor=0.0,
    )
    for f in ("length_scale", "var", "noise"):
        assert float(getattr(plain, f)) == float(getattr(with_center, f)), f


def test_runner_learns_hyperparams(tmp_path):
    """GP.learn_every wired through the serial harness: runs, finite, hypers move."""
    import json

    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    log = tmp_path / "rounds.jsonl"
    cfg = ExperimentConfig(
        dataset="toy",
        dataset_kwargs={"n_per_class": 40, "n_classes": 3, "seed": 0},
        method="ital",
        method_kwargs={"n_qmc": 32},
        batch_size=2,
        n_rounds=4,
        repetitions=1,
        queries_per_class=1,
        max_classes=1,
        gp=GPConfig(length_scale=1.0, var=1.0, noise=0.1, cap=16,
                    learn_every=2, learn_steps=20, learn_lr=0.05),
        user=UserConfig(label_prob=1.0, mistake_prob=0.0),
        log_jsonl=str(log),
    )
    res = run_experiment(cfg)
    assert np.isfinite(res["map"]).all()
    rows = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert "length_scale" in rows[-1]
    # After the round-2 re-learn the hyperparameters must have moved.
    assert rows[-1]["length_scale"] != 1.0 or rows[-1]["gp_noise"] != 0.1


def test_sharded_runner_learns_hyperparams(tmp_path):
    """GP.learn_every on the per-round sharded path: the learned
    hyperparameter trajectory matches the serial path (the labeled buffers
    are replicated, so learning sees identical data)."""
    import json

    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    logs = {}
    for mode, mesh in (("serial", 0), ("sharded", 8)):
        log = tmp_path / f"{mode}.jsonl"
        cfg = ExperimentConfig(
            dataset="toy",
            dataset_kwargs={"n_per_class": 40, "n_classes": 3, "seed": 0},
            method="ital",
            method_kwargs={"n_qmc": 32},
            batch_size=2,
            n_rounds=4,
            repetitions=1,
            queries_per_class=1,
            max_classes=1,
            gp=GPConfig(length_scale=1.0, var=1.0, noise=0.1, cap=16,
                        learn_every=2, learn_steps=20, learn_lr=0.05),
            user=UserConfig(label_prob=1.0, mistake_prob=0.0),
            log_jsonl=str(log),
            mesh_devices=mesh,
        )
        res = run_experiment(cfg)
        assert np.isfinite(res["map"]).all()
        logs[mode] = [json.loads(ln) for ln in log.read_text().splitlines()]

    ls_serial = [r["length_scale"] for r in logs["serial"]]
    ls_sharded = [r["length_scale"] for r in logs["sharded"]]
    assert ls_sharded[-1] != 1.0  # learning actually ran
    np.testing.assert_allclose(ls_sharded, ls_serial, rtol=2e-2)


def _learn_cfg(**kw):
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    base = dict(
        dataset="toy",
        dataset_kwargs={"n_per_class": 40, "n_classes": 3, "seed": 0},
        method="ital",
        method_kwargs={"n_qmc": 32},
        batch_size=2, n_rounds=4, repetitions=1,
        queries_per_class=1, max_classes=2, seed=0,
        gp=GPConfig(length_scale=1.0, var=1.0, noise=0.1, cap=16,
                    learn_every=2, learn_steps=20, learn_lr=0.05),
        user=UserConfig(label_prob=0.9, mistake_prob=0.05),
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_fused_session_learns_hyperparams_matches_serial():
    """VERDICT r2 item 6: GP.learn_every inside the fused device program —
    identical curves to the serial path (same cadence, same position)."""
    from ital_tpu.runner import run_experiment

    serial = run_experiment(_learn_cfg())
    fused = run_experiment(_learn_cfg(fused_sessions=True))
    np.testing.assert_allclose(fused["ap"], serial["ap"], atol=1e-4)
    # Learning must actually change behavior vs the fixed-hyper fused run.
    from ital_tpu.utils.config import GPConfig

    fixed = run_experiment(_learn_cfg(
        fused_sessions=True,
        gp=GPConfig(length_scale=1.0, var=1.0, noise=0.1, cap=16),
    ))
    assert not np.allclose(fused["ap"], fixed["ap"])


def test_cohort_learns_hyperparams_matches_serial():
    """Per-session hyperparameter learning under the vmapped cohort (hyper
    batched on the session axis): curves equal serial."""
    from ital_tpu.runner import run_experiment

    serial = run_experiment(_learn_cfg())
    cohort = run_experiment(_learn_cfg(query_batch=2, fused_sessions=True))
    np.testing.assert_allclose(cohort["ap"], serial["ap"], atol=1e-4)


def test_sharded_fused_session_learns_hyperparams():
    """learn_every inside the sharded fused session (collective-gather refit):
    curves match the serial learning path."""
    from ital_tpu.runner import run_experiment

    serial = run_experiment(_learn_cfg())
    sharded = run_experiment(_learn_cfg(mesh_devices=8, fused_sessions=True))
    np.testing.assert_allclose(sharded["ap"], serial["ap"], atol=2e-3)


def test_sharded_cohort_learns_hyperparams():
    """learn_every inside the sharded cohort (query_batch x fused x mesh)."""
    from ital_tpu.runner import run_experiment

    serial = run_experiment(_learn_cfg())
    cohort = run_experiment(_learn_cfg(
        mesh_devices=8, fused_sessions=True, query_batch=2
    ))
    np.testing.assert_allclose(cohort["ap"], serial["ap"], atol=2e-3)


def _map_learn_cfg(**kw):
    """_learn_cfg with the MAP-type-II knobs on (prior anchored at the
    config's initial hyperparameters + a noise floor)."""
    from ital_tpu.utils.config import GPConfig

    return _learn_cfg(
        gp=GPConfig(length_scale=1.0, var=1.0, noise=0.1, cap=16,
                    learn_every=2, learn_steps=20, learn_lr=0.05,
                    learn_prior_strength=1.0, learn_noise_floor=0.05),
        **kw,
    )


def test_map_type2_knobs_run_identically_across_modes():
    """The regularized estimator rides BOTH relearn code paths — the runner's
    _relearn_hyperparams (serial/fused) and the sharded LearnConfig closure —
    so their curves must agree, and must differ from the unregularized run
    (proving the knobs reached the device program)."""
    from ital_tpu.runner import run_experiment

    serial = run_experiment(_map_learn_cfg())
    fused = run_experiment(_map_learn_cfg(fused_sessions=True))
    sharded = run_experiment(_map_learn_cfg(mesh_devices=8,
                                            fused_sessions=True))
    np.testing.assert_allclose(fused["ap"], serial["ap"], atol=1e-4)
    np.testing.assert_allclose(sharded["ap"], serial["ap"], atol=2e-3)
    plain = run_experiment(_learn_cfg())
    assert not np.allclose(serial["ap"], plain["ap"])


def test_map_type2_config_validation(tmp_path):
    """Negative regularizer values fail fast at config load."""
    import pytest

    from ital_tpu.utils.config import load_config

    ini = tmp_path / "bad.ini"
    ini.write_text(
        "[EXPERIMENT]\nmethod = ital\ndataset = toy\n"
        "[GP]\nlearn_prior_strength = -1.0\n"
    )
    with pytest.raises(ValueError, match="learn_prior_strength"):
        load_config(str(ini))
