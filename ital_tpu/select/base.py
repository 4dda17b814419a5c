"""Strategy interface and registry.

Reference parity: each selection strategy in the reference subclasses
``ActiveRetrievalBase`` and overrides ``fetch_unlabelled(k)`` (SURVEY.md C2/C4).
Here a strategy is a pure function over the GP state — jit/vmap/shard friendly:

    select(state: GPState, batch_size, key, params: StrategyParams) -> (b,) int32

returning the next batch of candidate indices to show the user.  ``key`` feeds
strategies with random components (random sampling, QMC shifts); deterministic
strategies ignore it.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct

from ital_tpu.models.gp import GPState


@struct.dataclass
class StrategyParams:
    """Per-strategy hyperparameters (the reference passes these as ctor kwargs).

    All fields are traced scalars so changing them never recompiles.
    """

    label_prob: jax.Array = struct.field(default_factory=lambda: jnp.asarray(1.0))
    mistake_prob: jax.Array = struct.field(default_factory=lambda: jnp.asarray(0.0))
    jitter: jax.Array = struct.field(default_factory=lambda: jnp.asarray(1e-6))
    # Trade-off weight used by density/diversity-combination baselines.
    tradeoff: jax.Array = struct.field(default_factory=lambda: jnp.asarray(0.5))


SelectFn = Callable[..., jax.Array]

STRATEGIES: Dict[str, SelectFn] = {}


def register(name: str):
    def deco(fn: SelectFn) -> SelectFn:
        STRATEGIES[name] = fn
        return fn

    return deco


def get_strategy(name: str) -> SelectFn:
    try:
        return STRATEGIES[name]
    except KeyError:
        raise KeyError(
            f"unknown strategy {name!r}; available: {sorted(STRATEGIES)}"
        ) from None


def declared_method_kwargs(name: str) -> frozenset:
    """Names of the static per-strategy options ``name`` declares.

    Strategy options are keyword-only by convention (everything after ``*`` in
    the ``select(state, batch_size, key, params, *, ...)`` signature) — the
    reference passes these as per-learner ctor kwargs (SURVEY.md C3's
    tractability/accuracy knobs).
    """
    import inspect

    sig = inspect.signature(get_strategy(name))
    return frozenset(n for n, p in sig.parameters.items()
                     if p.kind is inspect.Parameter.KEYWORD_ONLY)


def filter_method_kwargs(name: str, kwargs: dict) -> dict:
    """Drop options strategy ``name`` does not declare.

    For SERVICE-LEVEL defaults shared across strategies (a service-wide ITAL
    option set must not break a session created with strategy=random) and for
    snapshots restored onto a server with a different default strategy.
    Per-session/user-supplied options should go through
    :func:`validate_method_kwargs` instead — silent drops hide typos.
    """
    declared = declared_method_kwargs(name)
    return {k: v for k, v in kwargs.items() if k in declared}


def validate_method_kwargs(name: str, kwargs: dict) -> None:
    """Reject options strategy ``name`` does not declare (loud, not a no-op).

    A typo'd option (``pool_siez``) that is silently dropped leaves the
    session running at full cost while the caller believes the restriction is
    in force — fail with the valid-names list instead (mirrors the config
    loader's unknown-[METHOD]-key error).
    """
    declared = declared_method_kwargs(name)
    unknown = sorted(set(kwargs) - declared)
    if unknown:
        raise ValueError(
            f"unknown method_kwargs for strategy {name!r}: {unknown}; "
            f"declared options: {sorted(declared)}"
        )


def labeled_mask(state: GPState, *, include_inert: bool = False) -> jax.Array:
    """(N,) bool — True at corpus indices that must not be selected again.

    By default only *valid* labels are excluded — the reference keeps skipped
    (shown-but-unlabeled) items in the candidate pool.  ``include_inert=True``
    additionally excludes items the user already skipped.
    """
    n = state.x.shape[0]
    slot_ids = jnp.arange(state.cap)
    slot_used = slot_ids < state.count
    slot_excl = slot_used & (state.valid | include_inert)
    return jnp.zeros((n,), jnp.int32).at[state.idx].add(slot_excl.astype(jnp.int32)) > 0


def greedy_argmax_batch(score_fn, state: GPState, batch_size: int) -> jax.Array:
    """Generic greedy batch construction: repeatedly argmax a per-candidate score.

    ``score_fn(batch, t) -> (N,) scores`` may depend on the partial batch
    (``batch[:t]`` valid).  The loop is unrolled in Python — ``batch_size`` is
    static — so each step traces with static shapes; already-picked and labeled
    candidates are masked to -inf.
    """
    n = state.x.shape[0]
    excluded = labeled_mask(state)
    batch = jnp.zeros((batch_size,), jnp.int32)
    neg = jnp.asarray(-jnp.inf, state.mu.dtype)
    for t in range(batch_size):
        scores = score_fn(batch, t)
        scores = jnp.where(excluded, neg, scores)
        nxt = jnp.argmax(scores).astype(jnp.int32)
        batch = batch.at[t].set(nxt)
        excluded = excluded.at[nxt].set(True)
    return batch
