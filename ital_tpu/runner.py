"""Experiment harness: simulated-feedback retrieval experiments, MAP-vs-rounds.

Reference parity: ``run_experiment.py`` (SURVEY.md C6, section 3.1) — for each
repetition x query: draw a query, init the learner, then loop
``fetch_unlabelled -> simulate user -> update -> rank -> AP``; aggregate to a
MAP-vs-rounds curve with per-round timing.

TPU-first: selection and (update + rank + AP) are two jitted steps that compile
once per experiment (static shapes via the padded GP state); per-round PRNG keys
are derived by ``fold_in`` so runs are deterministic and resumable mid-way.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ital_tpu.data import datasets as ds_mod
from ital_tpu.data.user import simulate_feedback
from ital_tpu.models import gp as gp_mod
from ital_tpu.select.base import StrategyParams, get_strategy
from ital_tpu.utils.config import ExperimentConfig, apply_matmul_precision
from ital_tpu.utils.logging import JsonlLogger, Timer, device_mem_mb
from ital_tpu.utils.metrics import average_precision, recall_at_k

# Strategies that consult the corpus density vector (computed once per dataset).
DENSITY_STRATEGIES = {"sud", "tcal", "adapt_al"}

# Recall@k cutoffs logged alongside AP each round (BASELINE.md "Recall@k").
RECALL_KS = (10, 50)

# Process-wide jitted from-scratch refit (GPConfig.refit_every drift refresh).
_jit_refit = jax.jit(gp_mod.gp_fit)



def _steady_ms(val, div: int = 1):
    """round(val/div, 3), passing through None (no steady span recorded)."""
    return None if val is None else round(val / max(div, 1), 3)

def _check_capacity(cfg: ExperimentConfig, *, query_slots: int = 1) -> None:
    """Fail fast when the labeled buffers cannot hold the whole experiment.

    The jitted update cannot check (``count`` is traced) and
    ``dynamic_update_slice`` would clamp the offset and silently corrupt the
    last slots, so every host-side entry point enforces it up front
    (``query_slots=0`` for the regression task, which has no query image).
    """
    needed = query_slots + cfg.n_rounds * cfg.batch_size
    if needed > cfg.cap:
        raise ValueError(
            f"labeled-slot capacity too small: {query_slots} query slot(s) + "
            f"{cfg.n_rounds} rounds x batch {cfg.batch_size} needs {needed} "
            f"slots but GP.cap={cfg.cap}; set [GP] cap >= {needed} "
            f"(or cap = 0 for auto-sizing)"
        )


def make_step_fns(cfg: ExperimentConfig):
    """Build the two jitted per-round step functions (select / absorb+score)."""
    select = get_strategy(cfg.method)
    static_kwargs = dict(cfg.method_kwargs)

    @jax.jit
    def select_step(state, key, params):
        return select(state, cfg.batch_size, key, params, **static_kwargs)

    @jax.jit
    def absorb_step(state, key, batch, relevant, exclude, label_prob, mistake_prob):
        y, valid = simulate_feedback(key, batch, relevant, label_prob, mistake_prob)
        state = gp_mod.gp_update(state, batch, y, valid)
        ap = average_precision(state.mu, relevant, exclude)
        n = state.mu.shape[0]
        recalls = jnp.stack(
            [recall_at_k(state.mu, relevant, min(k, n), exclude) for k in RECALL_KS]
        )
        return state, ap, recalls

    return select_step, absorb_step


def run_experiment(
    cfg: ExperimentConfig, dataset: Optional[ds_mod.Dataset] = None
) -> Dict[str, Any]:
    """Run the full experiment; returns curves + timing and logs JSONL per round.

    Returns dict with ``ap`` (n_sessions, n_rounds) per-round AP after feedback,
    ``map`` (n_rounds,) mean curve, ``select_ms``/``update_ms`` mean
    wall-clock, and the session list.
    """
    if dataset is None:
        dataset = ds_mod.load_dataset(cfg.dataset, **cfg.dataset_kwargs)
    _check_capacity(cfg)
    apply_matmul_precision(cfg)
    if cfg.mesh_devices:
        return run_experiment_sharded(cfg, dataset)
    if cfg.query_batch and cfg.query_batch > 1:
        return run_experiment_vmapped(cfg, dataset)
    if cfg.fused_sessions:
        if cfg.checkpoint_dir or cfg.resume or cfg.profile_dir:
            print("# fused_sessions runs each session as one device program; "
                  "checkpoint_dir/resume/profile_dir are serial-mode features "
                  "and are ignored here")
        return run_experiment_fused(cfg, dataset)
    x = jnp.asarray(dataset.x)

    state0 = gp_mod.gp_init(x, cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise, cfg.cap,
                              corpus_dtype=cfg.gp.corpus_dtype or None)
    if cfg.method in DENSITY_STRATEGIES:
        state0 = state0.replace(density=gp_mod.corpus_density(state0))

    # "tradeoff" rides in StrategyParams (traced); the rest of method_kwargs are
    # static strategy arguments (e.g. n_qmc).
    params = StrategyParams(
        label_prob=jnp.asarray(cfg.user.label_prob),
        mistake_prob=jnp.asarray(cfg.user.mistake_prob),
        tradeoff=jnp.asarray(float(cfg.method_kwargs.get("tradeoff", 0.5))),
    )
    cfg = dataclasses.replace(
        cfg,
        method_kwargs={k: v for k, v in cfg.method_kwargs.items() if k != "tradeoff"},
    )
    select_step, absorb_step = make_step_fns(cfg)

    label_prob = jnp.asarray(cfg.user.label_prob)
    mistake_prob = jnp.asarray(cfg.user.mistake_prob)

    classes = dataset.classes
    if cfg.max_classes:
        classes = classes[: cfg.max_classes]

    logger = JsonlLogger(cfg.log_jsonl)
    timer = Timer()
    rng = np.random.default_rng(cfg.seed)
    base_key = jax.random.PRNGKey(cfg.seed)

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    sessions = []
    ap_curves = []
    try:
        for rep in range(cfg.repetitions):
            for ci, c in enumerate(classes):
                queries = dataset.queries_for_class(int(c), rng, cfg.queries_per_class)
                for qi, q in enumerate(queries):
                    curve = _run_session(
                        cfg, state0, params, select_step, absorb_step,
                        dataset, rep, int(c), int(q), base_key,
                        label_prob, mistake_prob, timer, logger,
                    )
                    ap_curves.append(curve)
                    sessions.append({"rep": rep, "cls": int(c), "query": int(q)})
    finally:
        if cfg.profile_dir:
            jax.profiler.stop_trace()
        logger.close()

    ap = np.asarray(ap_curves)
    return {
        "ap": ap,
        "map": ap.mean(axis=0) if ap.size else np.zeros(cfg.n_rounds),
        "select_ms": timer.ms("select"),
        "update_ms": timer.ms("update"),
        # Steady-state medians + the separated first-round cost (PROFILE.md
        # section 6 recording rule): the mean above folds the first round's
        # compile/cache-load/transfer into every per-round claim.
        "select_ms_steady": _steady_ms(timer.median_ms("select")),
        "update_ms_steady": _steady_ms(timer.median_ms("update")),
        "first_round_ms": round(
            timer.first_ms("select") + timer.first_ms("update"), 3),
        "sessions": sessions,
        "dataset": dataset.name,
        "method": cfg.method,
    }


def _run_session(
    cfg, state0, params, select_step, absorb_step, dataset,
    rep, c, q, base_key, label_prob, mistake_prob, timer, logger,
):
    """One query session (n_rounds of feedback), with checkpoint/resume.

    When ``cfg.checkpoint_dir`` is set, every round snapshots the full session
    state; ``cfg.resume`` continues an interrupted session from its last
    completed round (bit-identical to an uninterrupted run — per-round PRNG
    keys are derived by fold_in, never carried).
    """
    import os

    from ital_tpu.utils import checkpoint as ckpt

    n = dataset.n
    relevant = jnp.asarray(dataset.relevance[:, c])
    exclude = jnp.zeros((n,), bool).at[q].set(True)
    skey = jax.random.fold_in(
        jax.random.fold_in(jax.random.fold_in(base_key, rep), c), q
    )

    state = gp_mod.gp_set_query(state0, jnp.asarray(q))
    curve: list[float] = []
    start_round = 0

    ckpt_path = None
    if cfg.checkpoint_dir:
        ckpt_path = os.path.join(cfg.checkpoint_dir, f"r{rep}_c{c}_q{q}.npz")
        if cfg.resume and os.path.exists(ckpt_path):
            state, extras = ckpt.load_session(ckpt_path, state)
            curve = [float(v) for v in extras["curve"]]
            start_round = int(extras["next_round"])

    for rnd in range(start_round, cfg.n_rounds):
        rkey = jax.random.fold_in(skey, rnd)
        k_sel, k_user = jax.random.split(rkey)
        with timer.span("select"):
            batch = select_step(state, k_sel, params)
            batch.block_until_ready()
        with timer.span("update"):
            state, ap, recalls = absorb_step(
                state, k_user, batch, relevant, exclude, label_prob, mistake_prob
            )
            ap.block_until_ready()
        if cfg.gp.learn_every and (rnd + 1) % cfg.gp.learn_every == 0:
            state = _relearn_hyperparams(state, cfg)
        elif cfg.gp.refit_every and (rnd + 1) % cfg.gp.refit_every == 0:
            # Periodic drift refresh (GPConfig.refit_every): from-scratch
            # refit bounds long-horizon f32 append error (drift_study.json).
            state = _jit_refit(state)
        curve.append(float(ap))
        logger.log(
            rep=rep, cls=c, query=q, round=rnd, ap=float(ap),
            select_ms=timer.last_ms("select"), update_ms=timer.last_ms("update"),
            labeled=int(np.asarray(state.active).sum()),
            device_mem_mb=round(device_mem_mb(), 1),
            **{f"recall@{k}": float(r) for k, r in zip(RECALL_KS, np.asarray(recalls))},
            **_hyper_log_fields(state, cfg),
        )
        if ckpt_path:
            ckpt.save_session(
                ckpt_path, state,
                extra={"curve": np.asarray(curve), "next_round": rnd + 1},
            )
        _maybe_inject_fault(rnd)
    return curve


def _learn_kwargs(cfg: ExperimentConfig, dtype) -> Dict[str, Any]:
    """``fit_hyperparams`` options from the config (one place for all modes).

    The MAP-type-II prior (``GP.learn_prior_strength``) is anchored at the
    CONFIG's initial hyperparameters, not the current iterate — relearning
    repeatedly from a random-walking anchor would defeat the prior."""
    kw: Dict[str, Any] = dict(
        steps=cfg.gp.learn_steps, lr=cfg.gp.learn_lr,
        learn_noise=cfg.gp.learn_noise,
        prior_strength=float(cfg.gp.learn_prior_strength),
        noise_floor=float(cfg.gp.learn_noise_floor),
    )
    if kw["prior_strength"]:
        kw["prior_center"] = gp_mod.GPHyper(
            length_scale=jnp.asarray(cfg.gp.length_scale, dtype),
            var=jnp.asarray(cfg.gp.var, dtype),
            noise=jnp.asarray(cfg.gp.noise, dtype),
        )
    return kw


def _relearn_hyperparams(state, cfg: ExperimentConfig, refit=None):
    """Online type-II ML (or MAP type-II when ``GP.learn_prior_strength`` is
    set): re-learn hyperparameters from the session's labels so far, then
    refit the posterior (models/hyperopt.py).  Shared by the serial and
    per-round sharded paths — their trajectory equality is tested
    (tests/test_hyperopt.py), so keep them on this one code path.  ``refit``
    overrides the posterior refit (the large-cap path substitutes its
    distributed chol2d fit)."""
    from ital_tpu.models.hyperopt import fit_hyperparams

    hyper = fit_hyperparams(
        state.x[state.idx], state.y, state.active, state.hyper,
        **_learn_kwargs(cfg, state.mu.dtype),
    )
    refit = refit or gp_mod.gp_fit
    return refit(state.replace(hyper=hyper))


def _hyper_log_fields(state, cfg: ExperimentConfig) -> Dict[str, float]:
    """Learned-hyperparameter JSONL fields (empty when learning is off)."""
    if not cfg.gp.learn_every:
        return {}
    return {
        "length_scale": round(float(state.hyper.length_scale), 4),
        "gp_var": round(float(state.hyper.var), 4),
        "gp_noise": round(float(state.hyper.noise), 4),
    }


def _maybe_inject_fault(rnd: int) -> None:
    """Fault injection (SURVEY.md section 5): ``ITAL_TPU_FAULT_AFTER_ROUND=r``
    hard-kills the process (``os._exit``, exit code 17 — no cleanup, no
    flushing beyond what already happened) after round ``r`` completes.  Used
    by the crash-resume test to prove ``--resume`` recovers from a real crash,
    not just a polite early return; available for manual recovery drills."""
    import os

    fault = os.environ.get("ITAL_TPU_FAULT_AFTER_ROUND")
    if fault is not None and rnd == int(fault):
        print(f"# fault injection: dying after round {rnd}", flush=True)
        os._exit(17)


def _session_plan(cfg: ExperimentConfig, dataset: ds_mod.Dataset):
    """The (rep, class, query) list and per-session PRNG keys — shared by the
    serial and vmapped paths so their results are bit-identical."""
    classes = dataset.classes
    if cfg.max_classes:
        classes = classes[: cfg.max_classes]
    rng = np.random.default_rng(cfg.seed)
    base_key = jax.random.PRNGKey(cfg.seed)
    plan = []
    for rep in range(cfg.repetitions):
        for c in classes:
            for q in dataset.queries_for_class(int(c), rng, cfg.queries_per_class):
                skey = jax.random.fold_in(
                    jax.random.fold_in(jax.random.fold_in(base_key, rep), int(c)),
                    int(q),
                )
                plan.append((rep, int(c), int(q), skey))
    return plan


def run_experiment_vmapped(cfg: ExperimentConfig, dataset: ds_mod.Dataset) -> Dict[str, Any]:
    """Multi-session throughput mode: ``cfg.query_batch`` sessions per vmap.

    The corpus is shared; per-session state (label buffers, Cholesky factor,
    whitened kernel, posterior) gains a leading session axis.  Selection, the
    simulated user, the GP update, ranking, and AP all vmap — one device
    program advances a whole cohort of retrieval sessions per round, which is
    the serving-throughput story (the reference can only loop sessions in
    Python).  Uses the same per-session key derivation as the serial path, so
    per-session curves are identical to serial runs (tested).
    """
    if cfg.gp.refit_every:
        print("# GP.refit_every is a serial/per-round-sharded feature; the "
              "fused/cohort device programs keep the pure incremental append "
              "(drift measured benign - ARCHITECTURE.md) and ignore it")
    x = jnp.asarray(dataset.x)
    n = dataset.n
    state0 = gp_mod.gp_init(x, cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise, cfg.cap,
                              corpus_dtype=cfg.gp.corpus_dtype or None)
    if cfg.method in DENSITY_STRATEGIES:
        state0 = state0.replace(density=gp_mod.corpus_density(state0))

    params = StrategyParams(
        label_prob=jnp.asarray(cfg.user.label_prob),
        mistake_prob=jnp.asarray(cfg.user.mistake_prob),
        tradeoff=jnp.asarray(float(cfg.method_kwargs.get("tradeoff", 0.5))),
    )
    method_kwargs = {k: v for k, v in cfg.method_kwargs.items() if k != "tradeoff"}
    select = get_strategy(cfg.method)
    label_prob = jnp.asarray(cfg.user.label_prob)
    mistake_prob = jnp.asarray(cfg.user.mistake_prob)

    # Per-session state axes: every leaf of GPState EXCEPT the shared corpus x
    # and the hyperparameters — which become PER-SESSION (batched) when online
    # hyperparameter learning is on, since each session then learns its own.
    learn_every = int(cfg.gp.learn_every or 0)
    hyper_axes = (
        gp_mod.GPHyper(length_scale=0, var=0, noise=0)
        if learn_every
        else gp_mod.GPHyper(length_scale=None, var=None, noise=None)
    )
    state_axes = gp_mod.GPState(
        x=None, idx=0, y=0, valid=0, count=0, l=0, beta=0, v=0, mu=0, sig2=0,
        hyper=hyper_axes,
        density=None,  # shared (unbatched) when present
        x2=None,  # shared corpus norms, unbatched
    )

    # The template state is shared (in_axes None); batching enters through the
    # per-session query indices and flows into the label buffers / posterior.
    set_query_v = jax.jit(
        jax.vmap(gp_mod.gp_set_query, in_axes=(None, 0), out_axes=state_axes)
    )

    if cfg.fused_sessions:
        # Cohort-of-fused-sessions: K sessions x ALL rounds in one dispatch.
        session_fn = make_fused_session_fn(cfg)
        fused_v = jax.jit(
            jax.vmap(
                session_fn, in_axes=(state_axes, 0, 0, 0, None),
                out_axes=(state_axes, 0),
            )
        )

    def one_round(state, key, relevant, exclude, do_learn):
        k_sel, k_user = jax.random.split(key)
        batch = select(state, cfg.batch_size, k_sel, params, **method_kwargs)
        y, valid = simulate_feedback(k_user, batch, relevant, label_prob, mistake_prob)
        state = gp_mod.gp_update(state, batch, y, valid)
        ap = average_precision(state.mu, relevant, exclude)
        if learn_every:
            # Same cadence/position as the serial path (after this round's AP).
            state = jax.lax.cond(
                do_learn,
                lambda s: _relearn_hyperparams(s, cfg),
                lambda s: s,
                state,
            )
        return state, ap

    round_v = jax.jit(
        jax.vmap(
            one_round,
            in_axes=(state_axes, 0, 0, 0, None),
            out_axes=(state_axes, 0),
        )
    )

    plan = _session_plan(cfg, dataset)
    logger = JsonlLogger(cfg.log_jsonl)
    timer = Timer()
    ap_rows = np.zeros((len(plan), cfg.n_rounds))

    qb = cfg.query_batch
    for chunk_start in range(0, len(plan), qb):
        chunk = plan[chunk_start : chunk_start + qb]
        k = len(chunk)
        # Pad the last chunk by repeating its first session (results discarded).
        padded = chunk + [chunk[0]] * (qb - k)
        qs = jnp.asarray([q for _, _, q, _ in padded], jnp.int32)
        relevant = jnp.asarray(
            np.stack([dataset.relevance[:, c] for _, c, _, _ in padded])
        )
        exclude = jnp.zeros((qb, n), bool).at[jnp.arange(qb), qs].set(True)
        skeys = jnp.stack([sk for *_, sk in padded])

        state = set_query_v(state0, qs)
        if cfg.fused_sessions:
            t0 = time.perf_counter()
            with timer.span("round"):
                _, aps = fused_v(state, skeys, relevant, exclude, params)
                aps = np.asarray(aps)  # (qb, n_rounds); the one host sync
            chunk_ms = 1e3 * (time.perf_counter() - t0)  # THIS chunk's time
            ap_rows[chunk_start : chunk_start + k] = aps[:k]
            for j, (rep, c, q, _) in enumerate(chunk):
                logger.log(rep=rep, cls=c, query=q,
                           ap_curve=[float(v) for v in aps[j]],
                           cohort_ms=round(chunk_ms, 3), query_batch=qb)
            continue
        for rnd in range(cfg.n_rounds):
            rkeys = jax.vmap(lambda sk: jax.random.fold_in(sk, rnd))(skeys)
            do_learn = jnp.asarray(
                bool(learn_every) and (rnd + 1) % learn_every == 0
            )
            with timer.span("round"):
                state, ap = round_v(state, rkeys, relevant, exclude, do_learn)
                ap.block_until_ready()
            ap_rows[chunk_start : chunk_start + k, rnd] = np.asarray(ap)[:k]
            for j, (rep, c, q, _) in enumerate(chunk):
                logger.log(rep=rep, cls=c, query=q, round=rnd,
                           ap=float(np.asarray(ap)[j]),
                           round_ms=timer.last_ms("round"), query_batch=qb)
    logger.close()

    return {
        "ap": ap_rows,
        "map": ap_rows.mean(axis=0) if ap_rows.size else np.zeros(cfg.n_rounds),
        "select_ms": timer.ms("round"),
        "update_ms": 0.0,
        "select_ms_steady": _steady_ms(timer.median_ms("round")),
        "first_round_ms": round(timer.first_ms("round"), 3),
        "sessions": [{"rep": r, "cls": c, "query": q} for r, c, q, _ in plan],
        "dataset": dataset.name,
        "method": cfg.method,
        "query_batch": cfg.query_batch,
    }


def make_fused_session_fn(cfg: ExperimentConfig):
    """One compiled program per SESSION: all n_rounds fused via lax.fori_loop.

    The whole interactive loop — greedy MI selection, simulated user, GP
    update, ranking, AP — runs as a single device program with one dispatch
    and one host fetch per session (the serving-latency mode; per-round JSONL
    observability is the trade-off).  Returns
    ``session_fn(state_after_query, skey, relevant, exclude) -> (state, aps)``
    with ``aps`` the (n_rounds,) AP curve.

    ``GP.learn_every`` is supported inside the fused program (VERDICT r2
    item 6): the type-II-ML ascent is a ``lax.scan`` and the refit a plain
    ``gp_fit``, so the relearn rides in a ``lax.cond`` on the round index —
    same cadence and position as the serial path (after the round's AP is
    computed), so curves match serial runs exactly (tested).
    """
    select = get_strategy(cfg.method)
    static_kwargs = {k: v for k, v in cfg.method_kwargs.items() if k != "tradeoff"}
    learn_every = int(cfg.gp.learn_every or 0)

    def session_fn(state, skey, relevant, exclude, params):
        def body(rnd, carry):
            state, aps = carry
            rkey = jax.random.fold_in(skey, rnd)
            k_sel, k_user = jax.random.split(rkey)
            batch = select(state, cfg.batch_size, k_sel, params, **static_kwargs)
            y, valid = simulate_feedback(
                k_user, batch, relevant, params.label_prob, params.mistake_prob
            )
            state = gp_mod.gp_update(state, batch, y, valid)
            ap = average_precision(state.mu, relevant, exclude)
            if learn_every:
                state = jax.lax.cond(
                    (rnd + 1) % learn_every == 0,
                    lambda s: _relearn_hyperparams(s, cfg),
                    lambda s: s,
                    state,
                )
            return state, aps.at[rnd].set(ap)

        aps0 = jnp.zeros((cfg.n_rounds,), state.mu.dtype)
        return jax.lax.fori_loop(0, cfg.n_rounds, body, (state, aps0))

    return jax.jit(session_fn)


def run_experiment_fused(cfg: ExperimentConfig, dataset: ds_mod.Dataset) -> Dict[str, Any]:
    """Experiment driver for the fused-session mode (``fused_sessions = true``).

    Same protocol and PRNG derivation as the serial path — identical AP curves
    (tested) — at one device dispatch + one host sync per session.
    """
    if cfg.gp.refit_every:
        print("# GP.refit_every is a serial/per-round-sharded feature; the "
              "fused/cohort device programs keep the pure incremental append "
              "(drift measured benign - ARCHITECTURE.md) and ignore it")
    x = jnp.asarray(dataset.x)
    state0 = gp_mod.gp_init(x, cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise, cfg.cap,
                              corpus_dtype=cfg.gp.corpus_dtype or None)
    if cfg.method in DENSITY_STRATEGIES:
        state0 = state0.replace(density=gp_mod.corpus_density(state0))
    params = StrategyParams(
        label_prob=jnp.asarray(cfg.user.label_prob),
        mistake_prob=jnp.asarray(cfg.user.mistake_prob),
        tradeoff=jnp.asarray(float(cfg.method_kwargs.get("tradeoff", 0.5))),
    )
    session_fn = make_fused_session_fn(cfg)
    set_query = jax.jit(gp_mod.gp_set_query)

    logger = JsonlLogger(cfg.log_jsonl)
    timer = Timer()
    n = dataset.n
    sessions, ap_curves = [], []
    for rep, c, q, skey in _session_plan(cfg, dataset):
        relevant = jnp.asarray(dataset.relevance[:, c])
        exclude = jnp.zeros((n,), bool).at[q].set(True)
        t0 = time.perf_counter()
        with timer.span("session"):
            state, aps = session_fn(
                set_query(state0, jnp.asarray(q)), skey, relevant, exclude, params
            )
            aps = np.asarray(aps)  # the one host sync
        ap_curves.append([float(v) for v in aps])
        sessions.append({"rep": rep, "cls": c, "query": q})
        logger.log(rep=rep, cls=c, query=q, ap_curve=ap_curves[-1],
                   session_ms=round(1e3 * (time.perf_counter() - t0), 3))
    logger.close()

    ap = np.asarray(ap_curves)
    return {
        "ap": ap,
        "map": ap.mean(axis=0) if ap.size else np.zeros(cfg.n_rounds),
        "select_ms": timer.ms("session") / max(cfg.n_rounds, 1),
        "update_ms": 0.0,
        "select_ms_steady": _steady_ms(timer.median_ms("session"),
                                       cfg.n_rounds),
        "first_round_ms": round(timer.first_ms("session"), 3),
        "sessions": sessions,
        "dataset": dataset.name,
        "method": cfg.method,
        "fused": True,
    }


def run_regression_experiment(cfg: ExperimentConfig) -> Dict[str, Any]:
    """Active GP-regression experiment (reference C7, ``regression*`` modules).

    No query image: the session starts with an empty labeled set; each round the
    strategy (``ital_regression`` by default, any registered strategy works)
    picks a batch, the simulated user reports the true value with probability
    ``label_prob`` plus N(0, USER.obs_noise) observation error (defaulting to
    GP.noise — set it differently to create a misspecified model), and the
    metric is the corpus-wide RMSE of the posterior mean — reported per round.

    ``GP.learn_every`` relearns hyperparameters from the labels collected so
    far (same cadence/position as the retrieval paths, via
    ``_relearn_hyperparams`` — the MAP-type-II knobs ride along); the result
    carries the final learned values under ``"hyper"``.
    """
    _check_capacity(cfg, query_slots=0)
    apply_matmul_precision(cfg)
    ds = ds_mod.regression_toy(**cfg.dataset_kwargs)
    x = jnp.asarray(ds.x)
    y_true = jnp.asarray(ds.y)

    state0 = gp_mod.gp_init(x, cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise, cfg.cap,
                              corpus_dtype=cfg.gp.corpus_dtype or None)
    select = get_strategy(cfg.method)
    params = StrategyParams(
        label_prob=jnp.asarray(cfg.user.label_prob),
        mistake_prob=jnp.asarray(cfg.user.mistake_prob),
    )

    # Generative observation noise is a CONSTANT of the simulation
    # (USER.obs_noise, defaulting to the config's GP.noise) — never the
    # model's current hyper.noise, which GP.learn_every may move.
    gen_sd = jnp.sqrt(jnp.asarray(cfg.user.obs_noise or cfg.gp.noise,
                                  state0.mu.dtype))

    @jax.jit
    def round_step(state, key):
        k_sel, k_lab, k_eps = jax.random.split(key, 3)
        batch = select(state, cfg.batch_size, k_sel, params)
        labeled = jax.random.uniform(k_lab, (cfg.batch_size,)) < params.label_prob
        y_obs = y_true[batch] + gen_sd * jax.random.normal(
            k_eps, (cfg.batch_size,)
        )
        state = gp_mod.gp_update(state, batch, y_obs, labeled)
        rmse = jnp.sqrt(jnp.mean((state.mu - y_true) ** 2))
        return state, rmse

    curves = []
    for rep in range(cfg.repetitions):
        state = state0
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), rep)
        curve = []
        for rnd in range(cfg.n_rounds):
            state, rmse = round_step(state, jax.random.fold_in(key, rnd))
            curve.append(float(rmse))
            # Online type-II ML — the task its Gaussian likelihood is
            # actually specified for (continuous targets; contrast
            # docs/NOISE_ANALYSIS.md Finding 4's retrieval collapse).
            if cfg.gp.learn_every and (rnd + 1) % cfg.gp.learn_every == 0:
                state = _relearn_hyperparams(state, cfg)
        curves.append(curve)
    rmse = np.asarray(curves)
    out: Dict[str, Any] = {
        "rmse": rmse,
        "mean_rmse": rmse.mean(axis=0),
        "dataset": ds.name,
        "method": cfg.method,
    }
    if cfg.gp.learn_every:
        out["hyper"] = {  # last repetition's final learned values
            "length_scale": float(state.hyper.length_scale),
            "var": float(state.hyper.var),
            "noise": float(state.hyper.noise),
        }
    return out


def run_experiment_sharded(cfg: ExperimentConfig, dataset: ds_mod.Dataset) -> Dict[str, Any]:
    """Corpus-sharded experiment over a device mesh (BASELINE.json config 5).

    Same protocol and feature surface as :func:`run_experiment` — recall@k
    logging, density-weighted strategies (ring-computed density), ``pool_size``,
    per-round checkpoint/resume — with the per-round step being the
    ``shard_map`` round of :mod:`ital_tpu.parallel.sharded`: feature rows, the
    whitened kernel, and the MI scan sharded over ``cfg.mesh_devices`` chips.
    """
    import os

    from ital_tpu.parallel import make_mesh, make_sharded_round, pad_to_devices, shard_state
    from ital_tpu.parallel.sharded import make_masks, make_sharded_density
    from ital_tpu.utils import checkpoint as ckpt

    # Fall back to the devices that exist (configs promise single-chip dev
    # boxes still run the sharded path, just on a smaller mesh).
    n_dev = min(cfg.mesh_devices, jax.device_count())
    if n_dev < cfg.mesh_devices:
        print(f"# mesh_devices={cfg.mesh_devices} requested, "
              f"{jax.device_count()} available -> using {n_dev}")
    mesh = make_mesh(n_dev)
    x_pad, n_real = pad_to_devices(dataset.x, n_dev)
    n_pad = x_pad.shape[0]
    pad_mask = jnp.arange(n_pad) >= n_real

    state0 = gp_mod.gp_init(
        jnp.asarray(x_pad), cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise, cfg.cap,
        corpus_dtype=cfg.gp.corpus_dtype or None,
    )
    if cfg.method in DENSITY_STRATEGIES:
        # Ring-pass density over the mesh (== single-device corpus_density on
        # the real rows); computed once per dataset, rides in the state.
        dens = make_sharded_density(mesh)(shard_state(state0, mesh), pad_mask)
        state0 = state0.replace(density=dens)
    params = StrategyParams(
        label_prob=jnp.asarray(cfg.user.label_prob),
        mistake_prob=jnp.asarray(cfg.user.mistake_prob),
        tradeoff=jnp.asarray(float(cfg.method_kwargs.get("tradeoff", 0.5))),
    )
    fused = bool(cfg.fused_sessions)
    if fused and (cfg.checkpoint_dir or cfg.resume):
        print("# fused_sessions runs each session as one device program; "
              "checkpoint_dir/resume are per-round features and are ignored")
    # Online hyperparameter learning rides inside the fused/cohort device
    # programs too (lax.cond on the round index; VERDICT r2 item 6).
    from ital_tpu.parallel.sharded import LearnConfig

    learn = (
        LearnConfig(cfg.gp.learn_every, cfg.gp.learn_steps, cfg.gp.learn_lr,
                    cfg.gp.learn_noise,
                    prior_strength=float(cfg.gp.learn_prior_strength),
                    noise_floor=float(cfg.gp.learn_noise_floor),
                    center=(cfg.gp.length_scale, cfg.gp.var, cfg.gp.noise))
        if cfg.gp.learn_every else None
    )

    qb = int(cfg.query_batch or 0)
    # Large-cap routing guard: fused/cohort programs absorb labels with the
    # replicated incremental append INSIDE their device program, so a cap that
    # crossed chol2d_threshold cannot take the distributed refit there — every
    # chip (and in cohort mode every SESSION slot on every chip) would carry
    # its own (cap, cap) factor.  Say so loudly instead of silently keeping
    # the exact blow-up the threshold exists to avoid (VERDICT r3 weak 2).
    crossed = bool(cfg.gp.chol2d_threshold
                   and cfg.cap >= cfg.gp.chol2d_threshold)
    if crossed and (fused or qb > 1):
        per_chip_mb = cfg.cap * cfg.cap * 4 / 1e6 * max(qb, 1)
        print(f"# WARNING: cap={cfg.cap} crossed chol2d_threshold="
              f"{cfg.gp.chol2d_threshold} but fused/cohort sessions cannot "
              f"use the distributed chol2d refit (the factor must stay "
              f"replicated inside the fused program): "
              f"~{per_chip_mb:.0f} MB of Cholesky factor per chip"
              + (f" ({qb} cohort sessions x cap^2)" if qb > 1 else "")
              + ". Unset fused_sessions/query_batch to enable the "
              f"distributed refit (parallel/bigcap.py), or raise "
              f"GP.chol2d_threshold to silence this.")
    if cfg.gp.refit_every and (fused or qb > 1):
        print("# GP.refit_every is a serial/per-round-sharded feature; the "
              "fused/cohort device programs keep the pure incremental append "
              "(drift measured benign - ARCHITECTURE.md) and ignore it")
    if qb > 1:
        # Cohort mode on the mesh: query_batch x fused_sessions x mesh_devices
        # composed — K sessions x ALL rounds per dispatch, collectives batched
        # across the cohort (parallel/sharded.py::make_sharded_cohort).
        from ital_tpu.parallel.sharded import (
            _cohort_state_axes, make_sharded_cohort, shard_cohort_state,
        )

        if not fused:
            print("# sharded cohorts run fused (all rounds in one device "
                  "program); per-round JSONL granularity is traded away")
        cohort_fn = make_sharded_cohort(
            mesh,
            strategy=cfg.method,
            batch_size=cfg.batch_size,
            n_rounds=cfg.n_rounds,
            n_qmc=int(cfg.method_kwargs.get("n_qmc", 128)),
            block=int(cfg.method_kwargs.get("block", 1024)),
            pool_size=int(cfg.method_kwargs.get("pool_size", 0)),
            subsample_size=int(cfg.method_kwargs.get("subsample_size", 0)),
            refine_top=int(cfg.method_kwargs.get("refine_top", 0)),
            refine_n_qmc=int(cfg.method_kwargs.get("refine_n_qmc", 512)),
            randomize_qmc=bool(cfg.method_kwargs.get("randomize_qmc", False)),
            learn=learn,
        )
        set_query_v = jax.jit(
            jax.vmap(gp_mod.gp_set_query, in_axes=(None, 0),
                     out_axes=_cohort_state_axes(learn=bool(learn)))
        )
        plan = _session_plan(cfg, dataset)
        logger = JsonlLogger(cfg.log_jsonl)
        timer = Timer()
        sessions, ap_curves = [], []
        for chunk_start in range(0, len(plan), qb):
            chunk = plan[chunk_start : chunk_start + qb]
            # Pad the last chunk by repeating its first session (discarded).
            padded = chunk + [chunk[0]] * (qb - len(chunk))
            qs = jnp.asarray([q for _, _, q, _ in padded], jnp.int32)
            relevant = jnp.asarray(np.stack(
                [np.pad(dataset.relevance[:, c], (0, n_pad - n_real))
                 for _, c, _, _ in padded]
            ))
            ap_exclude = jnp.stack(
                [make_masks(n_pad, n_real, int(q))[1] for _, _, q, _ in padded]
            )
            skeys = jnp.stack([sk for *_, sk in padded])
            stateb = shard_cohort_state(set_query_v(state0, qs), mesh)
            t0 = time.perf_counter()
            with timer.span("cohort"):
                _, aps = cohort_fn(
                    stateb, skeys, relevant, pad_mask, ap_exclude, params
                )
                aps = np.asarray(aps)  # the one host sync per cohort
            chunk_ms = 1e3 * (time.perf_counter() - t0)  # THIS chunk's time
            for j, (rep, c, q, _) in enumerate(chunk):
                curve = [float(v) for v in aps[j]]
                logger.log(rep=rep, cls=c, query=q, ap_curve=curve,
                           cohort_ms=round(chunk_ms, 3), sharded=n_dev,
                           query_batch=qb)
                ap_curves.append(curve)
                sessions.append({"rep": rep, "cls": c, "query": q})
        logger.close()
        ap = np.asarray(ap_curves)
        return {
            "ap": ap,
            "map": ap.mean(axis=0) if ap.size else np.zeros(cfg.n_rounds),
            "select_ms": timer.ms("cohort") / max(cfg.n_rounds, 1),
            "update_ms": 0.0,
            "select_ms_steady": _steady_ms(timer.median_ms("cohort"),
                                           cfg.n_rounds),
            "first_round_ms": round(timer.first_ms("cohort"), 3),
            "sessions": sessions,
            "dataset": dataset.name,
            "method": cfg.method,
            "mesh_devices": n_dev,
            "query_batch": qb,
            "fused": True,
        }

    # Large-cap mode: at/above GPConfig.chol2d_threshold the per-round step
    # absorbs labels via the distributed chol2d refit (parallel/bigcap.py) —
    # the production caller of the TP-analog (VERDICT r2 item 4).
    want_bigcap = bool(
        not fused
        and cfg.gp.chol2d_threshold
        and cfg.cap >= cfg.gp.chol2d_threshold
    )
    bigcap = want_bigcap and cfg.cap % n_dev == 0
    if want_bigcap and not bigcap:
        # Don't silently hand a huge replicated factor to every chip — the
        # exact blow-up the distributed path exists to avoid.
        print(f"# WARNING: cap={cfg.cap} crossed chol2d_threshold="
              f"{cfg.gp.chol2d_threshold} but does not divide the {n_dev}-"
              f"device mesh; using the REPLICATED factor path "
              f"(~{cfg.cap * cfg.cap * 4 / 1e6:.0f} MB per chip). Round "
              f"GP.cap up to a multiple of {n_dev} to enable the "
              f"distributed refit.")
    bigcap_refit = None
    if fused:
        from ital_tpu.parallel.sharded import make_sharded_session

        session_fn = make_sharded_session(
            mesh,
            strategy=cfg.method,
            batch_size=cfg.batch_size,
            n_rounds=cfg.n_rounds,
            n_qmc=int(cfg.method_kwargs.get("n_qmc", 128)),
            block=int(cfg.method_kwargs.get("block", 1024)),
            pool_size=int(cfg.method_kwargs.get("pool_size", 0)),
            subsample_size=int(cfg.method_kwargs.get("subsample_size", 0)),
            refine_top=int(cfg.method_kwargs.get("refine_top", 0)),
            refine_n_qmc=int(cfg.method_kwargs.get("refine_n_qmc", 512)),
            randomize_qmc=bool(cfg.method_kwargs.get("randomize_qmc", False)),
            learn=learn,
        )
    elif bigcap:
        from ital_tpu.parallel.bigcap import (
            make_bigcap_fit, make_bigcap_round, shard_state_bigcap,
        )

        print(f"# cap={cfg.cap} >= chol2d_threshold={cfg.gp.chol2d_threshold}: "
              f"distributed chol2d refit path (l row-sharded over {n_dev} devices)")
        round_fn = make_bigcap_round(
            mesh,
            strategy=cfg.method,
            batch_size=cfg.batch_size,
            n_qmc=int(cfg.method_kwargs.get("n_qmc", 128)),
            block=int(cfg.method_kwargs.get("block", 1024)),
            pool_size=int(cfg.method_kwargs.get("pool_size", 0)),
            subsample_size=int(cfg.method_kwargs.get("subsample_size", 0)),
            refine_top=int(cfg.method_kwargs.get("refine_top", 0)),
            refine_n_qmc=int(cfg.method_kwargs.get("refine_n_qmc", 512)),
            randomize_qmc=bool(cfg.method_kwargs.get("randomize_qmc", False)),
            recall_ks=RECALL_KS,
        )
        bigcap_refit = make_bigcap_fit(mesh)
    else:
        round_fn = make_sharded_round(
            mesh,
            strategy=cfg.method,
            batch_size=cfg.batch_size,
            n_qmc=int(cfg.method_kwargs.get("n_qmc", 128)),
            block=int(cfg.method_kwargs.get("block", 1024)),
            pool_size=int(cfg.method_kwargs.get("pool_size", 0)),
            subsample_size=int(cfg.method_kwargs.get("subsample_size", 0)),
            refine_top=int(cfg.method_kwargs.get("refine_top", 0)),
            refine_n_qmc=int(cfg.method_kwargs.get("refine_n_qmc", 512)),
            randomize_qmc=bool(cfg.method_kwargs.get("randomize_qmc", False)),
            recall_ks=RECALL_KS,
        )

    classes = dataset.classes
    if cfg.max_classes:
        classes = classes[: cfg.max_classes]
    logger = JsonlLogger(cfg.log_jsonl)
    timer = Timer()
    rng = np.random.default_rng(cfg.seed)
    base_key = jax.random.PRNGKey(cfg.seed)

    sessions, ap_curves = [], []
    for rep in range(cfg.repetitions):
        for c in classes:
            queries = dataset.queries_for_class(int(c), rng, cfg.queries_per_class)
            for q in queries:
                c, q = int(c), int(q)
                relevant = jnp.asarray(
                    np.pad(dataset.relevance[:, c], (0, n_pad - n_real))
                )
                sel_forbid, ap_exclude = make_masks(n_pad, n_real, q)
                state = gp_mod.gp_set_query(state0, jnp.asarray(q))
                skey = jax.random.fold_in(
                    jax.random.fold_in(jax.random.fold_in(base_key, rep), c), q
                )
                if fused:
                    t0 = time.perf_counter()
                    with timer.span("session"):
                        state, aps = session_fn(
                            shard_state(state, mesh), skey, relevant,
                            sel_forbid, ap_exclude, params,
                        )
                        aps = np.asarray(aps)  # the one host sync
                    curve = [float(v) for v in aps]
                    logger.log(rep=rep, cls=c, query=q, ap_curve=curve,
                               session_ms=round(
                                   1e3 * (time.perf_counter() - t0), 3),
                               sharded=n_dev)
                    ap_curves.append(curve)
                    sessions.append({"rep": rep, "cls": c, "query": q})
                    continue
                curve: list = []
                start_round = 0
                ckpt_path = None
                if cfg.checkpoint_dir:
                    ckpt_path = os.path.join(
                        cfg.checkpoint_dir, f"r{rep}_c{c}_q{q}.npz"
                    )
                    if cfg.resume and os.path.exists(ckpt_path):
                        state, extras = ckpt.load_session(ckpt_path, state)
                        curve = [float(v) for v in extras["curve"]]
                        start_round = int(extras["next_round"])
                state = (shard_state_bigcap(state, mesh) if bigcap
                         else shard_state(state, mesh))
                for rnd in range(start_round, cfg.n_rounds):
                    rkey = jax.random.fold_in(skey, rnd)
                    with timer.span("round"):
                        state, batch, ap, recalls = round_fn(
                            state, rkey, relevant, sel_forbid, ap_exclude, params
                        )
                        ap.block_until_ready()
                    if cfg.gp.learn_every and (rnd + 1) % cfg.gp.learn_every == 0:
                        # Same relearn as the serial path — the labeled
                        # buffers are replicated and x's rows auto-gather
                        # under jit — then re-shard the refit output to the
                        # round_fn's expected layout.  The bigcap path refits
                        # with its distributed chol2d fit (layouts preserved).
                        if bigcap:
                            state = _relearn_hyperparams(
                                state, cfg, refit=bigcap_refit
                            )
                        else:
                            state = shard_state(
                                _relearn_hyperparams(state, cfg), mesh
                            )
                    elif (cfg.gp.refit_every and not bigcap
                          and (rnd + 1) % cfg.gp.refit_every == 0):
                        # Drift refresh; the bigcap path already refits
                        # every round by construction.
                        state = shard_state(_jit_refit(state), mesh)
                    curve.append(float(ap))
                    logger.log(
                        rep=rep, cls=c, query=q, round=rnd, ap=float(ap),
                        round_ms=timer.last_ms("round"), sharded=n_dev,
                        labeled=int(np.asarray(state.active).sum()),
                        **{f"recall@{k}": float(r)
                           for k, r in zip(RECALL_KS, np.asarray(recalls))},
                        **_hyper_log_fields(state, cfg),
                    )
                    if ckpt_path:
                        ckpt.save_session(
                            ckpt_path, state,
                            extra={"curve": np.asarray(curve), "next_round": rnd + 1},
                        )
                ap_curves.append(curve)
                sessions.append({"rep": rep, "cls": c, "query": q})
    logger.close()

    ap = np.asarray(ap_curves)
    return {
        "ap": ap,
        "map": ap.mean(axis=0) if ap.size else np.zeros(cfg.n_rounds),
        "select_ms": (timer.ms("session") / max(cfg.n_rounds, 1)
                      if fused else timer.ms("round")),
        "update_ms": 0.0,
        "select_ms_steady": (_steady_ms(timer.median_ms("session"),
                                        cfg.n_rounds)
                             if fused
                             else _steady_ms(timer.median_ms("round"))),
        "first_round_ms": round(
            timer.first_ms("session") if fused else timer.first_ms("round"),
            3),
        "sessions": sessions,
        "dataset": dataset.name,
        "method": cfg.method,
        "mesh_devices": n_dev,
        **({"fused": True} if fused else {}),
        **({"chol2d": True} if bigcap else {}),
    }
