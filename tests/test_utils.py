"""Utility-layer units: per-round timer semantics + result-record plotting."""

import json

import numpy as np


class _FakeClock:
    """Deterministic stand-in for time.perf_counter: each span lasts exactly
    the next queued duration.  Real sleeps made these tests flaky under host
    contention (a 2 ms sleep measured 74 ms while the full suite shared the
    box with a chip job) — the semantics under test are purely which recorded
    span each accessor reports, so the clock is the thing to fake."""

    def __init__(self, durations_s):
        self._pending = list(durations_s)
        self._now = 0.0
        self._in_span = False

    def __call__(self) -> float:
        # Called once on span enter and once on exit: advance on exit only.
        if self._in_span:
            self._now += self._pending.pop(0)
        self._in_span = not self._in_span
        return self._now


def test_timer_last_vs_mean(monkeypatch):
    """Per-round JSONL rows carry the LAST span (Timer.last_ms), not the
    running mean — the round-2 953.9 ms confusion came from averaging a
    first-call compile round into every row (docs/PROFILE.md section 6)."""
    from ital_tpu.utils import logging as tlog

    monkeypatch.setattr(tlog.time, "perf_counter", _FakeClock([0.05, 0.005]))
    t = tlog.Timer()
    with t.span("round"):
        pass  # 50 ms "compile" round per the fake clock
    with t.span("round"):
        pass  # 5 ms steady round
    assert abs(t.last_ms("round") - 5.0) < 1e-9  # the most recent (fast) round
    assert abs(t.ms("round") - 27.5) < 1e-9  # mean is dragged by the first
    assert t.last_ms("missing") == 0.0 and t.ms("missing") == 0.0


def test_timer_steady_median_excludes_first(monkeypatch):
    """Steady-state medians (round 4): first_ms separates the compile round,
    median_ms skips it; with ONLY the first span recorded there is no steady
    measurement and median_ms reports None (code-review round 4: the old
    fallback relabeled the compile span as 'steady' — the exact pollution
    the field exists to prevent)."""
    from ital_tpu.utils import logging as tlog

    monkeypatch.setattr(tlog.time, "perf_counter",
                        _FakeClock([0.05] + [0.002, 0.001, 0.002, 0.003]))
    t = tlog.Timer()
    with t.span("round"):
        pass  # "compile" round (50 ms per the fake clock)
    assert t.median_ms("round") is None  # only the compile span exists
    for _ in range(4):
        with t.span("round"):
            pass
    assert abs(t.first_ms("round") - 50.0) < 1e-9
    assert abs(t.median_ms("round") - 2.0) < 1e-9  # first round excluded
    assert t.median_ms("missing") is None and t.first_ms("missing") == 0.0


def test_runner_reports_steady_and_first_round_timing():
    """Every run_experiment result carries select_ms_steady + first_round_ms
    (the PROFILE.md section 6 recording rule, machine-enforced for scenario
    records)."""
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import ExperimentConfig, GPConfig, UserConfig

    cfg = ExperimentConfig(
        dataset="toy",
        dataset_kwargs=dict(n_per_class=20, n_classes=2, dim=2, seed=0),
        method="uncertainty_sampling", batch_size=2, n_rounds=3,
        repetitions=1, queries_per_class=1, max_classes=1, seed=0,
        user=UserConfig(label_prob=1.0, mistake_prob=0.0),
        gp=GPConfig(length_scale=1.5, var=1.0, noise=0.1, cap=16),
    )
    res = run_experiment(cfg)
    assert res["first_round_ms"] > 0
    assert 0 < res["select_ms_steady"] <= res["select_ms"] * 1.5
    # The first (compile) round must not be inside the steady median.
    assert res["select_ms_steady"] < res["first_round_ms"]


def test_plot_results_loads_record_formats(tmp_path):
    """plot_results.load_records handles all three input schemas: runner
    JSONL, single-scenario records, and method-comparison records (with and
    without map_std)."""
    import plot_results as pr

    jl = tmp_path / "log.jsonl"
    jl.write_text(
        json.dumps({"round": 0, "ap": 0.5}) + "\n"
        + json.dumps({"round": 1, "ap": 0.7}) + "\n"
        + json.dumps({"ap_curve": [0.4, 0.6]}) + "\n"
    )
    series = pr.load_records(str(jl), "log")
    assert len(series) == 1
    label, rounds, curve, std = series[0]
    assert rounds == [1, 2] and std is None
    np.testing.assert_allclose(curve, [0.45, 0.65])

    scen = tmp_path / "scenario.json"
    scen.write_text(json.dumps({"map": [0.3, 0.4], "map_std": [0.01, 0.02]}))
    [(label, rounds, curve, std)] = pr.load_records(str(scen), "scenario")
    assert label == "scenario" and std == [0.01, 0.02]

    comp = tmp_path / "methods.json"
    comp.write_text(json.dumps({
        "ital": {"map": [0.5, 0.6], "map_std": [0.1, 0.1]},
        "random": {"map": [0.2, 0.3]},
        "_note": {"whatever": 1},
    }))
    series = pr.load_records(str(comp), "methods")
    assert {s[0] for s in series} == {"ital", "random"}
    assert dict((s[0], s[3]) for s in series)["random"] is None


def test_all_shipped_configs_load_and_declare_valid_method_kwargs():
    """Every configs/*.ini parses, names a registered strategy/dataset, and
    its [METHOD] keys exist in the strategy's signature — a typo'd knob in a
    shipped config (e.g. refine_tops) must fail here, not at first use."""
    import glob
    import inspect
    import os

    from ital_tpu.select.base import STRATEGIES, get_strategy
    from ital_tpu.utils.config import load_config
    # Populate the registry.
    import ital_tpu.select.baselines  # noqa: F401
    import ital_tpu.select.ital  # noqa: F401
    import ital_tpu.select.regression  # noqa: F401

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.ini")))
    assert paths, "no shipped configs found"
    for path in paths:
        cfg = load_config(path)
        fn = get_strategy(cfg.method)
        params = inspect.signature(fn).parameters
        for key in cfg.method_kwargs:
            if key == "tradeoff":  # rides in StrategyParams, not a kwarg
                continue
            assert key in params, (
                f"{os.path.basename(path)}: [METHOD] {key} is not an option "
                f"of strategy {cfg.method!r} ({sorted(params)})"
            )


def test_matmul_precision_validation_and_application():
    """GP.matmul_precision: bad values fail at load; valid ones are applied
    process-wide by apply_matmul_precision (trace-time XLA knob — the
    control for the documented bf16-vs-f32 cross-backend trajectory
    divergence)."""
    import jax
    import pytest

    from ital_tpu.utils.config import apply_matmul_precision, load_config

    with pytest.raises(ValueError, match="matmul_precision"):
        load_config(None, ("GP.matmul_precision=bf17",))

    cfg = load_config(None, ("GP.matmul_precision=highest",))
    before = jax.config.jax_default_matmul_precision
    try:
        apply_matmul_precision(cfg)
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", before)

    # Unset (empty / None after coercion) is a no-op.
    cfg2 = load_config(None, ("GP.matmul_precision=",))
    assert cfg2.gp.matmul_precision in (None, "")
    apply_matmul_precision(cfg2)
    assert jax.config.jax_default_matmul_precision == before


def test_matmul_precision_toy_run_matches_default_on_cpu():
    """On the CPU backend f32 dots are already exact-precision, so the knob
    must be behavior-neutral there — this pins the PLUMBING (the runner
    applies it and the experiment still runs) without claiming a CPU effect;
    the knob's semantics are a TPU matter (ARCHITECTURE 'Long-horizon
    drift')."""
    import jax
    import numpy as np

    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    base = ("EXPERIMENT.repetitions=1", "EXPERIMENT.queries_per_class=1",
            "EXPERIMENT.n_rounds=2", "DATA.n_per_class=40")
    before = jax.config.jax_default_matmul_precision
    try:
        cfg = load_config("configs/toy.ini", base)
        r_default = run_experiment(cfg)
        cfg_hi = load_config("configs/toy.ini",
                             base + ("GP.matmul_precision=highest",))
        r_hi = run_experiment(cfg_hi)
    finally:
        jax.config.update("jax_default_matmul_precision", before)
    np.testing.assert_allclose(r_hi["map"], r_default["map"], atol=1e-6)


def test_coarse_lattice_warning_at_large_mi_batch():
    """batch_size >= 7 with a coarse decision-stage lattice warns, citing the
    measured m-wall (docs/PROFILE.md §7: n_qmc >= 256 recommended at m >= 7);
    fine lattices — directly or via the refine stage — stay silent, and
    non-QMC strategies never warn (VERDICT round 4 item 8)."""
    import warnings

    import ital_tpu.select.ital  # noqa: F401  (populate the registry)
    from ital_tpu.utils.config import load_config

    def msgs(overrides):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            load_config(None, overrides)
        return [str(w.message) for w in rec
                if "coarse QMC lattice" in str(w.message)]

    # Default n_qmc=128 at m=7: warn.
    assert msgs(("EXPERIMENT.batch_size=7",))
    # Explicit coarse base scan at m=8: warn.
    assert msgs(("EXPERIMENT.batch_size=8", "METHOD.n_qmc=64"))
    # Fine base lattice: silent.
    assert not msgs(("EXPERIMENT.batch_size=7", "METHOD.n_qmc=256"))
    # Two-stage with a fine refine stage decides at refine_n_qmc: silent.
    assert not msgs((
        "EXPERIMENT.batch_size=7", "METHOD.n_qmc=32",
        "METHOD.refine_top=64", "METHOD.refine_n_qmc=512",
    ))
    # ... but a coarse refine stage still warns.
    assert msgs((
        "EXPERIMENT.batch_size=7", "METHOD.n_qmc=512",
        "METHOD.refine_top=64", "METHOD.refine_n_qmc=128",
    ))
    # Small batches and non-QMC strategies: silent.
    assert not msgs(("EXPERIMENT.batch_size=6",))
    assert not msgs((
        "EXPERIMENT.batch_size=8", "EXPERIMENT.method=uncertainty_sampling",
    ))
