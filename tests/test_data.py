"""Dataset loaders, simulated user, config system."""

import jax
import jax.numpy as jnp
import numpy as np

from ital_tpu.data import datasets as ds_mod
from ital_tpu.data.user import simulate_feedback
from ital_tpu.utils.config import load_config


def test_toy_dataset_shapes():
    ds = ds_mod.toy_gaussians(n_per_class=50, n_classes=3, dim=4, seed=1)
    assert ds.x.shape == (150, 4) and ds.x.dtype == np.float32
    assert ds.relevance.shape == (150, 3)
    assert (ds.relevance.sum(0) == 50).all()
    q = ds.queries_for_class(1, np.random.default_rng(0), 5)
    assert ds.relevance[q, 1].all()


def test_digits_dataset_offline():
    ds = ds_mod.digits()
    assert ds.x.shape == (1797, 64)
    assert ds.relevance.shape == (1797, 10)


def test_stored_fallback_is_flagged(tmp_path):
    ds = ds_mod.mirflickr(path=str(tmp_path))  # files absent -> surrogate
    assert ds.synthetic and ds.x.shape == (25000, 512)


def test_stored_loader_reads_files(tmp_path):
    x = np.random.default_rng(0).normal(size=(30, 8)).astype(np.float32)
    lab = np.random.default_rng(1).integers(0, 3, size=30)
    np.save(tmp_path / "usps_features.npy", x)
    np.save(tmp_path / "usps_labels.npy", lab)
    ds = ds_mod.usps(path=str(tmp_path))
    assert not ds.synthetic
    np.testing.assert_array_equal(ds.x, x)
    assert ds.relevance.shape == (30, 3)


def test_multilabel_topic_matrix(tmp_path):
    x = np.zeros((10, 4), np.float32)
    topics = np.random.default_rng(0).random((10, 5)) < 0.4
    np.save(tmp_path / "mirflickr_features.npy", x)
    np.save(tmp_path / "mirflickr_labels.npy", topics)
    ds = ds_mod.mirflickr(path=str(tmp_path))
    np.testing.assert_array_equal(ds.relevance, topics)


def test_simulated_user_statistics():
    key = jax.random.PRNGKey(0)
    n, b = 1000, 1000
    relevant = jnp.ones((n,), bool)
    batch = jnp.arange(b)
    y, valid = simulate_feedback(key, batch, relevant, 0.7, 0.2)
    labeled_frac = float(valid.mean())
    assert 0.65 < labeled_frac < 0.75
    flipped_frac = float((y[valid] == -1).mean())
    assert 0.15 < flipped_frac < 0.25
    # Deterministic given the key.
    y2, valid2 = simulate_feedback(key, batch, relevant, 0.7, 0.2)
    assert (y == y2).all() and (valid == valid2).all()


def test_config_roundtrip(tmp_path):
    ini = tmp_path / "exp.ini"
    ini.write_text(
        "[EXPERIMENT]\ndataset = digits\nmethod = ital\nbatch_size = 4\n"
        "n_rounds = 7\n"
        "[METHOD]\nn_qmc = 64\n"
        "[GP]\nlength_scale = 2.5\ncap = 0\n"
        "[USER]\nlabel_prob = 0.8\n"
        "[DATA]\nnormalize = false\n"
    )
    cfg = load_config(str(ini), ("EXPERIMENT.n_rounds=3", "GP.noise=0.25"))
    assert cfg.dataset == "digits" and cfg.batch_size == 4
    assert cfg.n_rounds == 3  # override wins
    assert cfg.gp.noise == 0.25 and cfg.gp.length_scale == 2.5
    assert cfg.user.label_prob == 0.8
    assert cfg.method_kwargs["n_qmc"] == 64  # [METHOD] keys -> strategy kwargs
    assert cfg.dataset_kwargs["normalize"] is False
    assert cfg.cap == 16  # auto: 1 + 3*4 = 13 -> padded to 16


def test_config_unknown_experiment_key_fails_fast(tmp_path):
    """A typo'd runner knob must not silently become a strategy kwarg (it used
    to surface as a confusing TypeError deep inside the jitted selector)."""
    import pytest

    with pytest.raises(ValueError, match="unknown key 'n_repetitions'"):
        load_config(None, ("EXPERIMENT.n_repetitions=5",))
