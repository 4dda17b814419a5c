"""End-to-end experiment harness: determinism + golden toy curve (BASELINE config 1)."""

import dataclasses

import numpy as np
import pytest

from ital_tpu.data.datasets import load_dataset
from ital_tpu.runner import run_experiment
from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig, load_config


def _toy_cfg(**kw):
    base = dict(
        dataset="toy",
        dataset_kwargs=dict(n_per_class=80, n_classes=3, dim=2, seed=0),
        method="ital",
        batch_size=1,
        n_rounds=4,
        repetitions=1,
        queries_per_class=1,
        seed=0,
        gp=GPConfig(length_scale=1.5, var=1.0, noise=0.1, cap=16),
        user=UserConfig(label_prob=1.0, mistake_prob=0.0),
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_toy_experiment_learns():
    res = run_experiment(_toy_cfg())
    assert res["ap"].shape == (3, 4)
    # Active learning must help: final MAP above first-round MAP - slack.
    assert res["map"][-1] > res["map"][0] - 0.05
    assert res["map"][-1] > 0.5


def test_experiment_deterministic():
    r1 = run_experiment(_toy_cfg(user=UserConfig(label_prob=0.7, mistake_prob=0.1)))
    r2 = run_experiment(_toy_cfg(user=UserConfig(label_prob=0.7, mistake_prob=0.1)))
    np.testing.assert_array_equal(r1["ap"], r2["ap"])


def test_noisy_user_changes_curve():
    r1 = run_experiment(_toy_cfg())
    r2 = run_experiment(_toy_cfg(user=UserConfig(label_prob=0.6, mistake_prob=0.3)))
    assert not np.array_equal(r1["ap"], r2["ap"])


def test_jsonl_logging(tmp_path):
    import json

    log = tmp_path / "log.jsonl"
    run_experiment(_toy_cfg(log_jsonl=str(log), n_rounds=2))
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(lines) == 3 * 2  # sessions x rounds
    assert {"ap", "round", "select_ms", "labeled"} <= set(lines[0])


def test_config_file_end_to_end(tmp_path):
    ini = tmp_path / "toy.ini"
    ini.write_text(
        "[EXPERIMENT]\ndataset = toy\nmethod = borderline_sampling\n"
        "batch_size = 2\nn_rounds = 2\nqueries_per_class = 1\n"
        "[DATA]\nn_per_class = 40\nn_classes = 2\ndim = 2\nseed = 1\n"
        "[GP]\nlength_scale = 1.5\ncap = 8\n"
    )
    res = run_experiment(load_config(str(ini)))
    assert res["ap"].shape == (2, 2)


def test_sharded_runner_end_to_end():
    """cfg.mesh_devices routes through the shard_map round (BASELINE config 5 shape)."""
    cfg = _toy_cfg(batch_size=2, n_rounds=3, mesh_devices=4)
    res = run_experiment(cfg)
    assert res["mesh_devices"] == 4
    assert res["ap"].shape == (3, 3)
    assert np.isfinite(res["ap"]).all()
    # Sharded and single-device runs agree on the learning signal (same
    # protocol, same seeds; scores may differ at fp tie level, so compare MAP
    # loosely).
    res_single = run_experiment(_toy_cfg(batch_size=2, n_rounds=3))
    assert abs(res["map"][-1] - res_single["map"][-1]) < 0.1


def test_golden_toy_curve():
    """BASELINE config 1 (seeded, CPU): frozen golden MAP-vs-rounds curve.

    Guards the whole pipeline (GP fit -> MI selection -> noisy user -> update ->
    AP) against silent behavior drift.  Regenerate deliberately via the script
    in git history if an intentional change shifts the curve.
    """
    import json
    import os

    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "golden", "toy_b1_map.json"))
    )
    cfg = _toy_cfg(
        batch_size=1, n_rounds=6,
        user=UserConfig(label_prob=0.8, mistake_prob=0.1),
    )
    res = run_experiment(cfg)
    np.testing.assert_allclose(res["map"], golden["map"], atol=1e-6)
    np.testing.assert_allclose(res["ap"], golden["ap"], atol=1e-6)


def test_regression_experiment_reduces_rmse():
    """Active GP regression (reference C7): RMSE falls as labels accumulate,
    and MI-greedy (ital_regression) beats random selection."""
    import dataclasses

    cfg = ExperimentConfig(
        dataset="regression_toy",
        dataset_kwargs=dict(n=300, dim=1, seed=0),
        method="ital_regression", batch_size=3, n_rounds=6, repetitions=2,
        seed=0, gp=GPConfig(length_scale=0.6, var=1.0, noise=0.05, cap=24),
        user=UserConfig(label_prob=1.0),
    )
    from ital_tpu.runner import run_regression_experiment

    res = run_regression_experiment(cfg)
    assert res["rmse"].shape == (2, 6)
    assert res["mean_rmse"][-1] < res["mean_rmse"][0] * 0.7

    res_rand = run_regression_experiment(dataclasses.replace(cfg, method="random"))
    assert res["mean_rmse"][-1] <= res_rand["mean_rmse"][-1] + 0.02


def test_vmapped_query_batch_matches_serial():
    """query_batch mode: identical per-session AP curves to the serial path."""
    import dataclasses

    base = _toy_cfg(batch_size=2, n_rounds=3,
                    user=UserConfig(label_prob=0.8, mistake_prob=0.1))
    serial = run_experiment(base)
    batched = run_experiment(dataclasses.replace(base, query_batch=2))
    assert batched["query_batch"] == 2
    np.testing.assert_allclose(batched["ap"], serial["ap"], atol=1e-5)


def test_golden_digits_batch_curve():
    """Batch-path golden (b=2 on a 600-image digit subset, noisy user)."""
    import json
    import os

    from ital_tpu.data.datasets import Dataset, digits

    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "golden", "digits_b2_map.json"))
    )
    ds = digits()
    keep = np.arange(0, 1797, 3)
    ds_small = Dataset("digits600", ds.x[keep], ds.labels[keep],
                       ds.relevance[keep], ds.classes)
    cfg = ExperimentConfig(
        dataset="digits", method="ital", batch_size=2, n_rounds=5, repetitions=1,
        queries_per_class=1, max_classes=3, seed=0,
        gp=GPConfig(length_scale=2.2, var=1.0, noise=0.1, cap=16),
        user=UserConfig(label_prob=0.9, mistake_prob=0.05),
    )
    res = run_experiment(cfg, dataset=ds_small)
    np.testing.assert_allclose(res["map"], golden["map"], atol=1e-6)


def test_fused_sessions_match_serial():
    """fused_sessions mode (whole session = one device program): identical curves."""
    import dataclasses

    base = _toy_cfg(batch_size=2, n_rounds=3,
                    user=UserConfig(label_prob=0.8, mistake_prob=0.1))
    serial = run_experiment(base)
    fused = run_experiment(dataclasses.replace(base, fused_sessions=True))
    assert fused["fused"] is True
    np.testing.assert_allclose(fused["ap"], serial["ap"], atol=1e-5)


def test_vmapped_fused_cohort_matches_serial():
    """query_batch + fused_sessions: K sessions x all rounds in one dispatch."""
    import dataclasses

    base = _toy_cfg(batch_size=2, n_rounds=3,
                    user=UserConfig(label_prob=0.8, mistake_prob=0.1))
    serial = run_experiment(base)
    combo = run_experiment(
        dataclasses.replace(base, query_batch=2, fused_sessions=True)
    )
    np.testing.assert_allclose(combo["ap"], serial["ap"], atol=1e-5)


def test_profile_dir_writes_trace(tmp_path):
    """profile_dir produces a jax.profiler trace (SURVEY section 5 tracing row)."""
    import os

    cfg = _toy_cfg(batch_size=1, n_rounds=1, profile_dir=str(tmp_path / "prof"))
    run_experiment(cfg)
    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found += [f for f in files if f.endswith((".xplane.pb", ".json.gz", ".trace.json.gz"))]
    assert found, "no profiler artifacts written"
