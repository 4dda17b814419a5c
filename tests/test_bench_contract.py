"""bench.py driver contract: recorded denominator + output schema (no TPU)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_recorded_cpu_denominator_is_used():
    sys.path.insert(0, REPO)
    import bench

    ms = bench.recorded_cpu_ms()
    # results/cpu_full_round.json is committed: the measured full-fidelity
    # round must be picked up (93.21 s ideal-16-way credit).
    assert ms is not None and 50_000 < ms < 200_000, ms


def test_recorded_denominator_matches_json():
    with open(os.path.join(REPO, "results", "cpu_full_round.json")) as fh:
        rec = json.load(fh)
    sys.path.insert(0, REPO)
    import bench

    assert bench.recorded_cpu_ms() == rec["ideal_16way_round_s"] * 1e3
    # The recording is a genuine full-fidelity round: all four greedy steps
    # timed, single-core total equals their sum (kernel build excluded).
    assert len(rec["step_s"]) == rec["batch_size"] == 4
    assert abs(sum(rec["step_s"]) - rec["full_round_single_core_s"]) < 1.0


def test_resolve_platform_falls_back_to_cpu(monkeypatch):
    """A dead chip tunnel raises RuntimeError from backend init; bench must
    fall back to the CPU platform (and flag it) instead of crashing — the
    driver's round-end run then records an honest CPU measurement."""
    sys.path.insert(0, REPO)
    import jax

    import bench

    real_devices = jax.devices
    calls = {"n": 0}

    def flaky_devices(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Unable to initialize backend 'axon': "
                               "UNAVAILABLE (simulated dead tunnel)")
        return real_devices(*a, **kw)

    monkeypatch.setattr(jax, "devices", flaky_devices)
    assert bench._resolve_platform() == "cpu"
    assert calls["n"] == 2  # errored once, resolved after the fallback


def _fake_run(script):
    """A subprocess.run stand-in driven by a list of outcomes."""
    calls = []

    def run(cmd, env=None, timeout=None, **kw):
        calls.append(dict(env or {}))
        outcome = script[len(calls) - 1]
        if outcome == "hang":
            raise subprocess.TimeoutExpired(cmd, timeout)

        class R:
            returncode = outcome

        return R()

    return run, calls


def test_bench_supervisor_falls_back_on_hang(monkeypatch):
    """The 2026-08-18 outage mode HANGS backend setup (no error to catch, and
    the hung init holds jax's backend lock in-process) — bench supervises a
    child with a deadline and re-runs it pinned to CPU on timeout."""
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.delenv("ITAL_TPU_PLATFORM", raising=False)
    monkeypatch.delenv("ITAL_TPU_BENCH_CHILD", raising=False)
    run, calls = _fake_run(["hang", 0])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench.main() == 0
    assert len(calls) == 2
    assert "ITAL_TPU_PLATFORM" not in calls[0]  # chip attempt first
    assert calls[0]["ITAL_TPU_BENCH_CHILD"] == "1"  # no recursion
    assert calls[1]["ITAL_TPU_PLATFORM"] == "cpu"  # honest CPU re-run


def test_bench_supervisor_passthrough_on_success(monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.delenv("ITAL_TPU_PLATFORM", raising=False)
    monkeypatch.delenv("ITAL_TPU_BENCH_CHILD", raising=False)
    run, calls = _fake_run([0])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench.main() == 0
    assert len(calls) == 1  # one init, no extra lease handoff


def _bench_like_state_and_params(n=300, d=8):
    import jax.numpy as jnp
    import numpy as np

    from ital_tpu.models import gp as gp_mod
    from ital_tpu.select.base import StrategyParams

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    state = gp_mod.gp_init(jnp.asarray(x), 2.0, 1.0, 0.1, 16)
    idx, ys = [3, 10, 20, 30, 40], [1.0, 1.0, -1.0, 1.0, -1.0]
    k = len(idx)
    state = gp_mod.gp_fit(state.replace(
        idx=state.idx.at[:k].set(jnp.asarray(idx, jnp.int32)),
        y=state.y.at[:k].set(jnp.asarray(ys, jnp.float32)),
        valid=state.valid.at[:k].set(True),
        count=jnp.asarray(k, jnp.int32),
    ))
    params = StrategyParams(
        label_prob=jnp.asarray(0.8), mistake_prob=jnp.asarray(0.05)
    )
    return state, params


def test_scanned_rounds_match_per_call():
    """bench.time_tpu streams rounds under one lax.scan (one dispatch per
    trial); the scanned rounds must select the same batches as per-call
    dispatch with identical keys — the protocol amortizes dispatch, it must
    not change the computation.  Both paths pass ``qmc_key=key`` exactly as
    the bench does (the hoisting guard — see the companion test below)."""
    import jax
    import numpy as np

    from ital_tpu.select.ital import select_ital

    state, params = _bench_like_state_and_params()

    def _round(st, key):
        return st, select_ital(st, 4, key, params, n_qmc=32,
                               refine_top=16, refine_n_qmc=64, qmc_key=key)

    run = jax.jit(lambda st, keys: jax.lax.scan(_round, st, keys)[1])
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    scanned = np.asarray(run(state, keys))
    sel1 = jax.jit(lambda st, kk: select_ital(st, 4, kk, params, n_qmc=32,
                                              refine_top=16, refine_n_qmc=64,
                                              qmc_key=kk))
    singles = np.stack([np.asarray(sel1(state, kk)) for kk in keys])
    np.testing.assert_array_equal(scanned, singles)


def test_scan_not_hoisted_with_qmc_key():
    """The hoisting guard itself: the bench scans SELECTION ONLY over a frozen
    GP state, and without ``qmc_key`` the round is loop-invariant — XLA's
    while-loop invariant code motion hoists the whole selection out of the
    loop and total time goes FLAT in the number of rounds (measured; the
    "per-round" figure would be total/reps, pure fiction).  With ``qmc_key``
    each round's lattice shift is key-dependent, so work must stay inside the
    loop: total time must scale with reps.  Expected ratio at 16x the rounds
    is ~16 (hoisted: ~1); assert > 3 to stay far from both CI noise and the
    failure mode."""
    import time

    import jax
    import numpy as np

    from ital_tpu.select.ital import select_ital

    state, params = _bench_like_state_and_params(n=1500, d=16)

    def _round(st, key):
        return st, select_ital(st, 4, key, params, n_qmc=32,
                               refine_top=16, refine_n_qmc=64, qmc_key=key)

    def total_seconds(reps: int) -> float:
        run = jax.jit(lambda st, keys: jax.lax.scan(_round, st, keys)[1])
        keys = jax.random.split(jax.random.PRNGKey(0), reps)
        np.asarray(run(state, keys))  # compile + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(state, keys))
            best = min(best, time.perf_counter() - t0)
        return best

    ratio = total_seconds(32) / total_seconds(2)
    assert ratio > 3.0, (
        f"scan total time is flat in reps (ratio {ratio:.2f}) — the "
        f"selection was hoisted out of the loop; the bench protocol is "
        f"measuring fiction"
    )


def test_bench_record_schema():
    """The driver gate parses ONE JSON line with these exact keys (ADVICE r4:
    a missing/renamed bench must not pass vacuously — repo-side, the schema
    itself is pinned so a refactor can't silently drop a contract field)."""
    sys.path.insert(0, REPO)
    import bench

    assert os.path.exists(os.path.join(REPO, "bench.py"))
    rec = bench.bench_record(1.55, 93210.0, "tpu")
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "platform"}
    assert rec["unit"] == "ms" and rec["value"] == 1.55
    assert rec["vs_baseline"] == round(93210.0 / 1.55, 2)
    json.dumps(rec)  # one parseable JSON object
