"""Experiment configuration: typed dataclasses + .ini files + CLI overrides.

Reference parity: the reference drives experiments with ``configs/*.ini`` read
by ``configparser``, with CLI overrides of section keys (SURVEY.md C9 and the
config row of section 5).  The same UX is kept: ``run_experiment.py
configs/foo.ini EXPERIMENT.n_rounds=5 GP.noise=0.2``; the typed layer here is
dataclasses instead of ad-hoc getters.
"""

from __future__ import annotations

import configparser
import dataclasses
import warnings
from typing import Any, Dict, Optional


@dataclasses.dataclass
class GPConfig:
    length_scale: float = 1.0
    var: float = 1.0
    noise: float = 0.1
    cap: int = 64  # labeled-slot capacity; 0 = auto (1 + n_rounds * batch_size)
    # Labeled-slot capacity at/above which the sharded per-round path absorbs
    # labels with the DISTRIBUTED chol2d refit (l row-sharded over the mesh,
    # parallel/bigcap.py) instead of the replicated incremental append.
    # 0 disables.  Only the per-round sharded mode switches; fused/cohort
    # modes keep the replicated append (their per-session factor is small).
    chol2d_threshold: int = 1024
    # Online type-II ML (models/hyperopt.py): re-learn hyperparameters from the
    # session's labels every ``learn_every`` feedback rounds (0 = fixed, the
    # reference behavior), then refit the posterior.  Supported on the serial
    # and per-round sharded paths; ignored (with a notice) on vmapped/fused/
    # cohort modes.
    learn_every: int = 0
    learn_steps: int = 50
    learn_lr: float = 0.05
    learn_noise: bool = True
    # MAP type-II instead of plain type-II ML: log-normal priors on the
    # hyperparameters (sd = 1/sqrt(strength) in log space) anchored at THIS
    # config's initial length_scale/var/noise.  0 (default) = off, the plain
    # ML estimator.  Motivation: under heavy label noise the unregularized
    # estimator collapses the noise onto the flipped labels and oscillates
    # (docs/NOISE_ANALYSIS.md Finding 4); the prior removes the collapse
    # direction without encoding the "right" value.
    learn_prior_strength: float = 0.0
    # Projected ascent: keep the learned noise >= this floor (0 = off).
    learn_noise_floor: float = 0.0
    # Periodic from-scratch re-factorization: every ``refit_every`` feedback
    # rounds the incremental-append posterior is replaced by a full gp_fit
    # from the label buffers, bounding long-horizon f32 drift.  0 = never —
    # the measured default: over 250 rounds at cap=1024 the append's error
    # saturates at ~8x the refit's own f32 floor with no ranking effect
    # (results/drift_study.json; docs/ARCHITECTURE.md "Long-horizon drift"),
    # so refreshing is insurance, not a need.  Serial and per-round sharded
    # modes only (fused/cohort programs keep the pure append; the bigcap
    # path refits every round by construction).
    refit_every: int = 0
    # XLA matmul precision for every dot in the program ("", the default,
    # keeps the backend's own default — bf16-multiply on TPU).  "highest"
    # forces f32-accurate matmuls on TPU: the measured 6e-2-vs-4e-5
    # TPU-vs-CPU posterior gap is bf16 matmul precision, not a bug
    # (docs/ARCHITECTURE.md "Long-horizon drift"), and active-learning
    # trajectories diverge across backends like a seed change
    # (docs/NOISE_ANALYSIS.md caveats) — this knob is the control when
    # cross-backend trajectory pairing matters more than speed.  Applied
    # process-wide by the runner/service at startup.
    matmul_precision: str = ""
    # Corpus STORAGE dtype ("" = keep the dataset's dtype, i.e. float32).
    # "bfloat16" halves the corpus HBM footprint and the dominant (N, D)
    # corpus read of gp_update/gp_fit; on TPU the default matmul already
    # multiplies in bf16 passes, so the extra quantization is input-side
    # only (norms stay f32 — ops/kernels.py).  Mutually exclusive with
    # matmul_precision="highest": storage quantization cannot be undone by
    # a higher matmul precision.
    corpus_dtype: str = ""


@dataclasses.dataclass
class UserConfig:
    label_prob: float = 1.0
    mistake_prob: float = 0.0
    # Regression task only: variance of the GENERATIVE observation noise the
    # simulated labeler adds to y_true (0 = default to GP.noise, the
    # well-specified case).  Setting it differently from GP.noise creates a
    # misspecified model — the regime GP.learn_every is for on this task
    # (continuous targets, well-specified Gaussian likelihood; contrast
    # docs/NOISE_ANALYSIS.md Finding 4).  Kept out of GPConfig on purpose:
    # the model's belief must never leak into the data-generating process.
    obs_noise: float = 0.0


@dataclasses.dataclass
class ExperimentConfig:
    task: str = "retrieval"  # "retrieval" | "regression"
    dataset: str = "toy"
    dataset_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    method: str = "ital"
    method_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    batch_size: int = 4
    n_rounds: int = 10
    repetitions: int = 1
    queries_per_class: int = 1
    max_classes: int = 0  # 0 = all classes
    seed: int = 0
    gp: GPConfig = dataclasses.field(default_factory=GPConfig)
    user: UserConfig = dataclasses.field(default_factory=UserConfig)
    # Auxiliary subsystems (SURVEY.md section 5).
    log_jsonl: Optional[str] = None  # per-round structured metrics
    checkpoint_dir: Optional[str] = None  # per-round session snapshots
    resume: bool = False
    deterministic: bool = True  # pin seeds / QMC lattices
    profile_dir: Optional[str] = None  # jax.profiler trace output
    # Parallelism (SURVEY.md section 2.3): number of mesh devices (0 = single).
    mesh_devices: int = 0
    # Sessions processed simultaneously via vmap (0/1 = serial).  Multiplies
    # experiment/serving throughput; bit-identical per-session results to the
    # serial path (same fold_in key derivation).  Checkpoint/resume is only
    # supported in serial mode.
    query_batch: int = 0
    # Fuse all n_rounds of a session into ONE device program (lax.fori_loop):
    # one dispatch + one host sync per session — the serving-latency mode.
    # Identical curves to serial; per-round JSONL granularity is traded away.
    fused_sessions: bool = False

    @property
    def cap(self) -> int:
        if self.gp.cap:
            return self.gp.cap
        raw = 1 + self.n_rounds * self.batch_size
        return -(-raw // 8) * 8  # round up to a multiple of 8 (TPU sublane)


def _coerce(value: str) -> Any:
    """str -> bool/int/float/str by trial (ini values are untyped)."""
    low = value.strip().lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("none", ""):
        return None
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            continue
    return value


def _apply_section(obj: Any, section: configparser.SectionProxy):
    for key, raw in section.items():
        if not hasattr(obj, key):
            valid = ", ".join(sorted(f.name for f in dataclasses.fields(obj)))
            raise ValueError(
                f"unknown key {key!r} in [{section.name}] — valid keys: {valid}. "
                f"Strategy kwargs (n_qmc, pool_size, ...) belong in [METHOD], "
                f"dataset loader kwargs in [DATA]."
            )
        setattr(obj, key, _coerce(raw))


def load_config(path: Optional[str] = None, overrides: tuple[str, ...] = ()) -> ExperimentConfig:
    """Read an .ini experiment config and apply ``SECTION.key=value`` overrides.

    Sections: ``[EXPERIMENT]`` (runner knobs — unknown keys are a hard error,
    so typos can't silently leak into strategy kwargs), ``[GP]``, ``[USER]``,
    ``[DATA]`` (dataset loader kwargs), ``[METHOD]`` (strategy kwargs).
    """
    cfg = ExperimentConfig()
    parser = configparser.ConfigParser()
    parser.optionxform = str  # keep key case
    if path is not None:
        with open(path) as fh:
            parser.read_file(fh)
    for ov in overrides:
        if "=" not in ov or "." not in ov.split("=", 1)[0]:
            raise ValueError(f"override must look like SECTION.key=value, got {ov!r}")
        lhs, value = ov.split("=", 1)
        section, key = lhs.split(".", 1)
        if not parser.has_section(section):
            parser.add_section(section)
        parser.set(section, key, value)

    if parser.has_section("EXPERIMENT"):
        _apply_section(cfg, parser["EXPERIMENT"])
    if parser.has_section("GP"):
        _apply_section(cfg.gp, parser["GP"])
    if parser.has_section("USER"):
        _apply_section(cfg.user, parser["USER"])
    if parser.has_section("DATA"):
        for key, raw in parser["DATA"].items():
            cfg.dataset_kwargs[key] = _coerce(raw)
    if parser.has_section("METHOD"):
        for key, raw in parser["METHOD"].items():
            cfg.method_kwargs[key] = _coerce(raw)
    if cfg.gp.learn_prior_strength < 0 or cfg.gp.learn_noise_floor < 0:
        raise ValueError(
            "GP.learn_prior_strength and GP.learn_noise_floor must be >= 0, "
            f"got {cfg.gp.learn_prior_strength!r} / "
            f"{cfg.gp.learn_noise_floor!r}"
        )
    if cfg.gp.matmul_precision not in (None, "", "default", "high", "highest"):
        raise ValueError(
            f"GP.matmul_precision must be one of default/high/highest (or "
            f"empty for the backend default), got "
            f"{cfg.gp.matmul_precision!r}"
        )
    if cfg.gp.corpus_dtype not in ("", "float32", "bfloat16"):
        raise ValueError(
            f"GP.corpus_dtype must be empty, float32 or bfloat16, got "
            f"{cfg.gp.corpus_dtype!r}"
        )
    if cfg.gp.corpus_dtype == "bfloat16" and cfg.gp.matmul_precision == "highest":
        warnings.warn(
            "GP.corpus_dtype=bfloat16 with GP.matmul_precision=highest: the "
            "corpus is quantized at STORAGE, so the highest-precision matmul "
            "cannot recover f32 inputs — you pay the slow matmul without the "
            "precision.  Pick one: bf16 storage (halved HBM) or highest "
            "precision (f32-accurate cross-kernels).",
            stacklevel=2,
        )
    _warn_coarse_mi_lattice(cfg)
    return cfg


def _warn_coarse_mi_lattice(cfg: ExperimentConfig) -> None:
    """Warn loudly when a large MI batch meets a coarse QMC lattice.

    The m-wall is MEASURED (scripts/qmc_error_study.py →
    results/qmc_error_study.json, docs/PROFILE.md §7): the fixed-lattice MI
    estimator's true error stays under ~1% of the MI scale through m = 8 at
    n_qmc = 128, but at m ≥ 7 the measurement recommends n_qmc ≥ 256 at the
    stage where the greedy decision is made.  A config with batch_size = 7/8
    and default lattices previously sailed through silently (VERDICT round 4
    item 8) — this check warns, citing the table, without changing behavior.

    The stage that decides is the refine stage when two-stage scoring is on
    (``refine_top`` > 0 re-scores the greedy finalists at ``refine_n_qmc``);
    otherwise the base scan's ``n_qmc``.
    """
    if cfg.task != "retrieval" or cfg.batch_size < 7:
        return
    try:
        from ital_tpu.select.base import declared_method_kwargs

        declared = declared_method_kwargs(cfg.method)
    except Exception:
        return  # unknown strategy name fails loudly at runner dispatch
    if "n_qmc" not in declared:
        return
    base = int(cfg.method_kwargs.get("n_qmc", 128) or 0)
    refine_top = int(cfg.method_kwargs.get("refine_top", 0) or 0)
    refine_n_qmc = int(cfg.method_kwargs.get("refine_n_qmc", 512) or 0)
    decision_n_qmc = refine_n_qmc if refine_top > 0 else base
    if decision_n_qmc < 256:
        warnings.warn(
            f"batch_size={cfg.batch_size} with a coarse QMC lattice: the "
            f"greedy decision stage runs at n_qmc={decision_n_qmc}, but the "
            f"measured accuracy table (results/qmc_error_study.json, "
            f"docs/PROFILE.md §7) recommends n_qmc >= 256 at m >= 7 (~0.5% "
            f"MI error vs ~1% at 128).  Raise [METHOD] n_qmc, or enable "
            f"two-stage scoring (refine_top > 0, refine_n_qmc >= 256) to pay "
            f"the finer lattice only on the finalists.",
            stacklevel=2,
        )


def apply_matmul_precision(cfg: ExperimentConfig) -> None:
    """Apply ``GP.matmul_precision`` process-wide (no-op when unset).

    Called by the runner and the serving daemon at startup: the knob is a
    trace-time XLA setting, so it must be in force before the experiment's
    programs are traced.
    """
    p = cfg.gp.matmul_precision
    if p:
        import jax

        jax.config.update("jax_default_matmul_precision", p)
