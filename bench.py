#!/usr/bin/env python
"""Headline benchmark: ITAL MI batch-selection ms/round on MIRFLICKR-25K scale.

BASELINE.md operative target: >=10x faster MI batch selection per round than the
CPU reference on MIRFLICKR-25K (25 000 images, CNN features, batch_size=4) at
identical MAP-vs-rounds curves on TPU.  The reference publishes no numbers
(``BASELINE.json "published": {}``), so the CPU denominator is measured here,
every run, from the NumPy/SciPy oracle implementation (tests/oracle) that
mirrors the reference's computational shape — per-candidate Python loop over
scipy's Fortran MVNDST, fanned out over a ``multiprocessing.Pool`` like the
reference's ``parallelized`` mode.  The CPU cost is measured on a candidate
subsample and scaled linearly (the loop is embarrassingly parallel and
per-candidate-dominated); the TPU number is measured in full.

Production selection config (round 4): two-stage scoring — base scan at
n_qmc=32 over every candidate, then the top-64 re-scored at n_qmc=512 before
each greedy argmax (`refine_top`; the static-shape equivalent of the
reference MVNDST's adaptive sample count).  MAP equality with the old
single-stage n_qmc=128 setting is MEASURED, not assumed: 8-seed MIRFLICKR
scenario at standard AND heavy user noise, paired deltas ~0
(results/refine_study.json, docs/PROFILE.md section 8); the CPU denominator
is unchanged (full-fidelity scipy-MVNDST oracle round).

Prints ONE JSON line:
  {"metric": "mi_selection_ms_per_round_mirflickr25k_b4",
   "value": <tpu ms/round>, "unit": "ms", "vs_baseline": <cpu_ms / tpu_ms>}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Honor the platform escape hatch BEFORE any JAX backend initializes: bench
# touches jax.devices() before it ever imports ital_tpu (whose package init
# applies the same override), so without this the knob would be dead for the
# one script it matters most for — a hang-mode tunnel outage hangs backend
# setup before _resolve_platform's error fallback can fire.
_plat = os.environ.get("ITAL_TPU_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

BATCH = 4
N_QMC = 32
REFINE_TOP = 64
REFINE_N_QMC = 512
CAP = 64
CPU_SAMPLE = 96  # candidates per greedy step timed on CPU, then scaled
LS, VAR, NOISE = 50.0, 1.0, 0.1
LABEL_PROB, MISTAKE_PROB = 0.8, 0.05


def _corpus():
    from ital_tpu.data.datasets import mirflickr

    ds = mirflickr()  # stored features if present, surrogate otherwise
    return ds


def _labeled_history(ds, rng):
    """A mid-session labeled set: query + 5 rounds x 4 labels."""
    q = int(rng.integers(0, ds.n))
    cls = int(np.argmax(ds.relevance[q])) if ds.relevance[q].any() else 0
    idx = [q]
    ys = [1.0]
    pool = rng.permutation(ds.n)[: 5 * BATCH]
    for i in pool:
        idx.append(int(i))
        ys.append(1.0 if ds.relevance[i, cls] else -1.0)
    return idx, ys


def select_kwargs() -> dict:
    """The production selection config of record (one copy — the probe and
    the contract tests import this rather than re-listing the constants)."""
    return dict(n_qmc=N_QMC, refine_top=REFINE_TOP, refine_n_qmc=REFINE_N_QMC)


def build_state(ds, idx, ys):
    """The benchmark GP state of record: seed-7 mid-session labeled history
    fitted on the full corpus.  One copy — time_tpu, main's CPU-comparison
    pass, and scripts/scan_protocol_probe.py all build state THROUGH here so
    the probe can never validate a different workload than the bench
    measures (the drifting-copies failure mode of scripts/timing_protocol.py's
    docstring)."""
    import jax.numpy as jnp

    from ital_tpu.models import gp as gp_mod

    state = gp_mod.gp_init(jnp.asarray(ds.x), LS, VAR, NOISE, CAP)
    k = len(idx)
    state = state.replace(
        idx=state.idx.at[:k].set(jnp.asarray(idx, jnp.int32)),
        y=state.y.at[:k].set(jnp.asarray(ys, jnp.float32)),
        valid=state.valid.at[:k].set(True),
        count=jnp.asarray(k, jnp.int32),
    )
    return gp_mod.gp_fit(state)


def bench_params():
    import jax.numpy as jnp

    from ital_tpu.select.base import StrategyParams

    return StrategyParams(
        label_prob=jnp.asarray(LABEL_PROB), mistake_prob=jnp.asarray(MISTAKE_PROB)
    )


def make_scan_run(params, *, keyed: bool = True):
    """The scanned-rounds protocol body: jitted ``run(state, keys (R,2))`` of
    R selection rounds under one lax.scan.  ``keyed=True`` is the production
    protocol (per-round Cranley-Patterson shifts — the hoisting guard);
    ``keyed=False`` exists ONLY so the probe can record the hoisted flat-total
    evidence."""
    import jax

    from ital_tpu.select.ital import select_ital

    def _round(st, key):
        return st, select_ital(st, BATCH, key, params,
                               qmc_key=key if keyed else None,
                               **select_kwargs())

    return jax.jit(lambda st, keys: jax.lax.scan(_round, st, keys)[1])


def time_tpu(ds, idx, ys) -> float:
    import jax

    state = build_state(ds, idx, ys)
    params = bench_params()
    # This TPU sits behind a tunnel with ~30 ms host-sync RTT and ~3 ms of
    # host dispatch cost per executed program, and block_until_ready does not
    # reliably wait on this backend.  Production streams rounds INSIDE one
    # compiled program (the runner's fused mode scans whole sessions; the
    # serving cohort endpoints keep select/update in-program for the same
    # reason), so the bench does the same: `reps` selection rounds under one
    # lax.scan with ONE dispatch and ONE host fetch.  The result is per-round
    # device time + (dispatch + RTT)/reps.  Median of 3 trials guards against
    # ambient contention on the shared chip.
    #
    # HOISTING GUARD — load-bearing: the scan deliberately times SELECTION
    # ONLY, so the GP state is frozen across rounds, and ITAL's deterministic
    # lattice ignores the round key — a naive scan body is therefore
    # loop-INVARIANT and XLA's while-loop invariant code motion hoists the
    # entire selection out of the loop (measured on CPU: total time flat at
    # reps=4/16/64 — the "per-round" number was total/reps, pure fiction).
    # `qmc_key=key` applies a per-round Cranley-Patterson lattice shift
    # (randomized QMC, identical per-round cost, equally valid estimates), so
    # every round's orthant chain is genuinely key-dependent and stays inside
    # the loop.  tests/test_bench_contract.py pins both properties: scanned
    # batches == per-call batches with the same keys, and the hoisting guard
    # itself.  Cross-check: the per-call pipeline-slope protocol
    # (scripts/timing_protocol.py) reads the same device time plus the
    # per-call dispatch floor (docs/PROFILE.md).
    # reps amortizes the fixed ~45 ms dispatch+RTT: §9's chip table measured
    # 3.17 ms/round at reps=16 -> 1.85 at reps=64 (device estimate ~1.4);
    # reps=256 pushes the fixed term to ~0.2 ms/round, approaching steady
    # production streaming (total wall/trial still < 1 s).  The env override
    # exists for protocol probes (reps sweeps through the EXACT bench path);
    # the default is the protocol of record.
    reps = int(os.environ.get("ITAL_TPU_BENCH_REPS", 256))
    run = make_scan_run(params)
    key = jax.random.PRNGKey(0)
    np.asarray(run(state, jax.random.split(key, reps)))  # compile + real sync
    trials = []
    for trial in range(3):
        keys = jax.random.split(jax.random.fold_in(key, trial + 1), reps)
        t0 = time.perf_counter()
        out = run(state, keys)
        np.asarray(out)  # single true sync
        trials.append((time.perf_counter() - t0) / reps)
    return float(np.median(trials)) * 1e3


def recorded_cpu_ms() -> float | None:
    """Measured full-fidelity CPU round, if one has been recorded.

    ``scripts/cpu_full_round.py`` runs the dense f64 oracle for one COMPLETE
    greedy round (all candidates, every greedy step, no extrapolation) on this
    exact workload (same corpus, seed-7 labeled history, hyperparameters) and
    records it in ``results/cpu_full_round.json``.  When present, that
    measurement is the denominator — it replaces the per-candidate
    extrapolation below (which over-credited the CPU by ~1.4x when
    cross-checked; see BASELINE.md).  The ideal-16-way Pool credit is kept.
    """
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "cpu_full_round.json")
    try:
        with open(path) as fh:
            rec = json.load(fh)
        return float(rec["ideal_16way_round_s"]) * 1e3
    except (OSError, KeyError, ValueError):
        return None


def time_cpu(ds, idx, ys, tpu_batch) -> float:
    """CPU reference ms/round: oracle per-candidate scoring cost, extrapolated.

    The reference's per-round selection cost is the candidate loop (O(n_cand)
    per greedy step); the per-candidate MI cost does not depend on corpus size,
    so the oracle runs on a subset corpus (the labeled set + the batch + random
    rows) to avoid the reference's one-time O(N^2) kernel build, times
    ``CPU_SAMPLE`` candidates per greedy step, scales to the full pool, and
    assumes an IDEAL linear Pool speedup over all cores — every assumption
    favors the CPU baseline.
    """
    from tests.oracle.numpy_oracle import OracleGP, mutual_information

    rng = np.random.default_rng(0)
    n_sub = 2048
    keep = np.unique(
        np.concatenate([np.asarray(idx), np.asarray(tpu_batch),
                        rng.choice(ds.n, size=n_sub, replace=False)])
    )
    remap = {int(g): i for i, g in enumerate(keep)}
    gp = OracleGP(ds.x[keep], LS, VAR, NOISE)
    gp.fit([remap[int(i)] for i in idx], ys)
    n_cand = ds.n - len(idx)

    total_s = 0.0
    # Credit the CPU baseline with an ideal 16-way multiprocessing Pool even
    # when this host has fewer cores (the reference's `parallelized` mode on a
    # typical workstation) — keeps the reported speedup conservative.
    nproc = 16
    for t in range(BATCH):
        batch = [remap[int(b)] for b in tpu_batch[:t]]
        cands = rng.choice(len(keep), size=CPU_SAMPLE, replace=False)
        sels = [batch + [int(c)] for c in cands]
        t0 = time.perf_counter()
        for sel in sels:
            mu = gp.predict_mean(sel)
            cov = gp.predict_cov(sel) + 1e-6 * np.eye(len(sel))
            mutual_information(mu, cov, LABEL_PROB, MISTAKE_PROB)
        dt = time.perf_counter() - t0
        total_s += dt * (n_cand / CPU_SAMPLE) / nproc
    return total_s * 1e3


def _resolve_platform() -> str:
    """Initialize the JAX backend, falling back to CPU if the chip is gone.

    The axon chip sits behind a tunnel that has been observed down for
    multi-hour windows (docs/PROFILE.md section 9 history); backend setup
    then raises UNAVAILABLE — sometimes quickly, sometimes after a long
    hang in the setup RPC.  A dead tunnel should record an HONEST
    CPU-backend measurement (flagged via the ``platform`` output field)
    rather than crash the bench run: the protocol, workload, and
    denominator are identical, only the device changes.
    """
    import jax

    def _cpu_cache_hygiene():
        # Same rule as __graft_entry__._provision_devices: XLA:CPU AOT cache
        # entries embed host machine features, and a cache written on a
        # different machine can SIGILL on load — on any CPU path, drop the
        # persistent cache (compiles here are seconds; it buys nothing).
        os.environ["ITAL_TPU_NO_CACHE"] = "1"
        jax.config.update("jax_compilation_cache_dir", None)

    if os.environ.get("ITAL_TPU_PLATFORM") == "cpu":
        _cpu_cache_hygiene()
    try:
        return jax.devices()[0].platform
    except RuntimeError as exc:
        sys.stderr.write(
            f"bench: device backend unavailable ({exc}); "
            "falling back to the CPU platform\n")
        _cpu_cache_hygiene()
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform


def _supervised_main() -> int:
    """Hang-proof entry: run the real bench as a child with a deadline.

    ``_resolve_platform`` handles the tunnel outage mode that ERRORS, but the
    2026-08-18 outage showed backend setup can HANG in the setup RPC instead
    — unrecoverable in-process (the hung init holds jax's backend lock, so
    no CPU fallback can run afterwards).  So: supervise.  The child inherits
    stdout (the one-JSON-line contract flows through); if it exceeds
    ``ITAL_TPU_BENCH_TIMEOUT`` seconds (default 2400 — above a cold remote
    compile + a bad-day lease handoff, far below a multi-hour outage) or
    fails, it is re-run once with ``ITAL_TPU_PLATFORM=cpu`` for an honest
    flagged CPU measurement.  Healthy path: ONE backend init, no extra lease
    handoff.  Direct child/caller-pinned runs skip supervision entirely.
    """
    import subprocess

    budget = float(os.environ.get("ITAL_TPU_BENCH_TIMEOUT", 2400))
    env = dict(os.environ, ITAL_TPU_BENCH_CHILD="1")
    me = os.path.abspath(__file__)
    try:
        if subprocess.run([sys.executable, me], env=env,
                          timeout=budget).returncode == 0:
            return 0
        sys.stderr.write("bench: chip-backend child failed; "
                         "re-running on the CPU platform\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench: chip-backend child exceeded {budget:.0f}s "
                         "(hang-mode tunnel outage?); re-running on the "
                         "CPU platform\n")
    env["ITAL_TPU_PLATFORM"] = "cpu"
    return subprocess.run([sys.executable, me], env=env,
                          timeout=budget).returncode


def main() -> int:
    if not (os.environ.get("ITAL_TPU_BENCH_CHILD")
            or os.environ.get("ITAL_TPU_PLATFORM")):
        return _supervised_main()
    platform = _resolve_platform()
    rng = np.random.default_rng(7)
    ds = _corpus()
    idx, ys = _labeled_history(ds, rng)

    tpu_ms = time_tpu(ds, idx, ys)

    # The CPU pass reuses the final TPU-selected batch as the greedy
    # trajectory (deterministic production lattice — no qmc_key here).
    import jax

    from ital_tpu.select.ital import select_ital

    state = build_state(ds, idx, ys)
    batch = np.asarray(select_ital(state, BATCH, jax.random.PRNGKey(0),
                                   bench_params(), **select_kwargs()))

    cpu_ms = recorded_cpu_ms()
    if cpu_ms is None:
        cpu_ms = time_cpu(ds, idx, ys, batch)

    print(json.dumps(bench_record(tpu_ms, cpu_ms, platform)))
    return 0


def bench_record(tpu_ms: float, cpu_ms: float, platform: str) -> dict:
    """The driver-contract output record — exactly the keys the gate parses
    (one JSON line: metric/value/unit/vs_baseline).  Kept as a function so
    tests/test_bench_contract.py can pin the schema without running the
    full MIRFLICKR-scale benchmark."""
    return {
        "metric": "mi_selection_ms_per_round_mirflickr25k_b4",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 2),
        "platform": platform,
    }


if __name__ == "__main__":
    sys.exit(main())
