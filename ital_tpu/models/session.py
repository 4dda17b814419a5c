"""Interactive retrieval session — the user-facing API.

Reference parity: ``italia/retrieval_base.py :: ActiveRetrievalBase`` (SURVEY.md
C2): holds the dataset + GP + current query + labeled sets, applies feedback
rounds, ranks the corpus, and exposes ``fetch_unlabelled(k)`` through the
configured selection strategy.

This is the convenience wrapper for interactive use; the experiment runner
(:mod:`ital_tpu.runner`) bypasses it and fuses whole rounds into single
compiled steps.  The underlying state is the functional ``GPState``; this class
only adds bookkeeping and index conversion, so sessions remain serializable and
the hot path stays jitted.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ital_tpu.models import gp as gp_mod
from ital_tpu.select.base import StrategyParams, get_strategy

# Jitted once per process (per shape): the interactive surface dispatches ONE
# compiled program per call instead of op-by-op — behind a ~30 ms-RTT tunnel
# the difference is ~1.2 s vs ~40 ms per request (round-3 serving
# measurement, results/serve_throughput.json).
_jit_set_query = jax.jit(gp_mod.gp_set_query)
# The update CONSUMES the session's posterior buffers (callers always rebind
# ``self.state``), so donate them: XLA then extends the (cap, N) whitened
# buffer ``v`` in place instead of copying it per update — ~0.25 GB of HBM
# traffic at 1M x 512 x cap=64, where gp_update dominates the serving round
# (results/round_term_split.json).  Only the per-session OWNED leaves are
# donated: the corpus ``x`` (and ``density``/``x2``) is one device-resident
# array SHARED by every session over the same dataset (serve.py), and
# donating a shared buffer invalidates every other holder's reference on
# backends that honor donation (TPU does; CPU silently ignores it, so CPU
# tests cannot catch that bug — split the args instead of trusting them).
# ``x``/``hyper``/``density``/``x2`` pass through gp_update untouched, so
# they cost no copy without donation either.
_UPDATE_OWNED = ("idx", "y", "valid", "count", "l", "beta", "v", "mu", "sig2")


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_donated(owned, x, hyper, density, x2, b_idx, b_y, b_valid):
    st = gp_mod.GPState(x=x, hyper=hyper, density=density, x2=x2, **owned)
    new = gp_mod.gp_update(st, b_idx, b_y, b_valid)
    return {f: getattr(new, f) for f in _UPDATE_OWNED}

# Feedback blocks are padded up to a multiple of this width (valid=False on
# the pad slots — mathematically absent, but they do consume capacity slots
# like any skipped item).  Keeps the jitted update's shape stable across
# rounds with different label counts: distinct shapes would each recompile
# the whole O(cap x N) program (minutes at MIRFLICKR scale via the remote
# compile service — CLAUDE.md "static shapes are load-bearing").
_UPDATE_BUCKET = 4


@functools.lru_cache(maxsize=None)
def _jit_select(strategy_name: str, k: int, kw_items: tuple = ()):
    """Process-wide jitted selection, shared by every session with the same
    (strategy, batch size, static kwargs) — new sessions over the same corpus
    reuse the compiled program instead of re-tracing per instance.
    ``kw_items`` is the sorted tuple of static strategy kwargs (n_qmc,
    pool_size, refine_top, ...) so it is hashable for the cache; kwargs the
    strategy's signature does not declare are dropped here as a final guard
    (snapshots restored onto a server with a different default strategy carry
    the ORIGINAL strategy's options) — user-supplied options are validated
    loudly at session construction."""
    from ital_tpu.select.base import filter_method_kwargs

    sel = get_strategy(strategy_name)
    kw = filter_method_kwargs(strategy_name, dict(kw_items))
    return jax.jit(lambda st, key, pp: sel(st, k, key, pp, **kw))


class ActiveRetrieval:
    """One interactive retrieval session over a fixed corpus.

    Usage (mirrors the reference's loop, SURVEY.md section 3.1)::

        sess = ActiveRetrieval(x, length_scale=2.0, var=1.0, noise=0.1, cap=64)
        sess.update_query(q)
        batch = sess.fetch_unlabelled(4)          # show these to the user
        sess.update({batch[0]: 1, batch[1]: -1})  # feedback (missing = skipped)
        ranking = sess.top_k(20)
    """

    def __init__(
        self,
        x,
        *,
        length_scale: float,
        var: float = 1.0,
        noise: float = 0.1,
        cap: int = 64,
        strategy: str = "ital",
        label_prob: float = 1.0,
        mistake_prob: float = 0.0,
        tradeoff: float = 0.5,
        with_density: bool = False,
        seed: int = 0,
        method_kwargs: Optional[dict] = None,
        corpus_dtype: Optional[str] = None,
    ):
        x = jnp.asarray(x)
        self.state = gp_mod.gp_init(x, length_scale, var, noise, cap,
                                    corpus_dtype=corpus_dtype or None)
        if with_density:
            self.state = self.state.replace(density=gp_mod.corpus_density(self.state))
        self.strategy_name = strategy
        # Static per-strategy options (the reference passes these as ctor
        # kwargs too — e.g. ITAL's tractability/accuracy knobs n_qmc,
        # pool_size, subsample_size, refine_top, refine_n_qmc).  They become
        # part of the jit cache key, so values must be hashable scalars —
        # fail here with a clear message instead of a TypeError at the first
        # fetch_unlabelled (the HTTP surface feeds raw JSON into this dict).
        self.method_kwargs = dict(method_kwargs or {})
        for name, v in self.method_kwargs.items():
            # str is rejected too: no registered strategy declares a
            # string-typed option, so a JSON client's "32" would otherwise
            # surface only as an opaque trace-time error inside jit.
            if isinstance(v, str) or not isinstance(
                    v, (int, float, bool, type(None))):
                raise TypeError(
                    f"method_kwargs[{name!r}] must be a numeric/bool scalar "
                    f"(int/float/bool/None), got {type(v).__name__}: "
                    f"these are static compile-time options"
                )
        get_strategy(strategy)  # fail fast on unknown strategy names
        # Undeclared option names are a hard error on this user-facing ctor
        # (a silently dropped typo'd option no-ops at full cost); service
        # layers merging strategy-agnostic DEFAULTS filter them first with
        # select.base.filter_method_kwargs.
        from ital_tpu.select.base import validate_method_kwargs

        validate_method_kwargs(strategy, self.method_kwargs)
        self.params = StrategyParams(
            label_prob=jnp.asarray(label_prob),
            mistake_prob=jnp.asarray(mistake_prob),
            tradeoff=jnp.asarray(tradeoff),
        )
        self._key = jax.random.PRNGKey(seed)
        self.query: Optional[int] = None

    # -- reference-parity surface ------------------------------------------

    def update_query(self, query_idx: int) -> None:
        """Reset the session to a new query image (counted as a +1 label)."""
        self.query = int(query_idx)
        self.state = _jit_set_query(self.state, jnp.asarray(query_idx))

    def fetch_unlabelled(self, k: int) -> np.ndarray:
        """Next batch of k candidate indices to show the user."""
        self._key, sub = jax.random.split(self._key)
        fn = _jit_select(self.strategy_name, int(k),
                         tuple(sorted(self.method_kwargs.items())))
        return np.asarray(fn(self.state, sub, self.params))

    def update(self, feedback: Dict[int, int]) -> None:
        """Apply one round of user feedback and refresh the posterior.

        ``feedback``: corpus index -> label in {-1, +1}; items shown but absent
        from the dict (or mapped to 0/None) are treated as skipped.  Matches the
        reference's ``ActiveRetrievalBase.update(feedback_dict)``.
        """
        if not feedback:
            return
        used = int(np.asarray(self.state.count))
        if used + len(feedback) > self.state.cap:
            raise ValueError(
                f"labeled-slot capacity exceeded: {used} used + {len(feedback)} new "
                f"> cap={self.state.cap}; construct the session with a larger `cap`"
            )
        # Pad the block up to the bucket width so the jitted update compiles
        # once per bucket, not once per feedback-dict size (pad slots carry
        # valid=False — inert — and, like skips, consume capacity); clamped
        # to the remaining capacity so the check above stays exact.
        b = min(-(-len(feedback) // _UPDATE_BUCKET) * _UPDATE_BUCKET,
                self.state.cap - used)
        idx = np.zeros(b, dtype=np.int32)
        idx[: len(feedback)] = np.fromiter(feedback.keys(), dtype=np.int32)
        y = np.zeros(b, dtype=np.float32)
        y[: len(feedback)] = [0 if v is None else int(v)
                              for v in feedback.values()]
        valid = y != 0
        st = self.state
        new_owned = _update_donated(
            {f: getattr(st, f) for f in _UPDATE_OWNED},
            st.x, st.hyper, st.density, st.x2,
            jnp.asarray(idx), jnp.asarray(y), jnp.asarray(valid),
        )
        self.state = st.replace(**new_owned)

    def scores(self) -> np.ndarray:
        """Relevance scores (GP posterior mean) for the whole corpus."""
        return np.asarray(self.state.mu)

    def top_k(self, k: int, exclude_labeled: bool = True) -> np.ndarray:
        """Top-k retrieval by posterior mean (the reference's ranking step)."""
        scores = self.state.mu
        if exclude_labeled:
            from ital_tpu.select.base import labeled_mask

            scores = jnp.where(labeled_mask(self.state), -jnp.inf, scores)
        return np.asarray(jax.lax.top_k(scores, k)[1])

    @property
    def relevant_ids(self) -> np.ndarray:
        """Indices the user has labeled relevant (reference attribute)."""
        st = self.state
        act = np.asarray(st.active)
        return np.asarray(st.idx)[act & (np.asarray(st.y) > 0)]

    @property
    def irrelevant_ids(self) -> np.ndarray:
        st = self.state
        act = np.asarray(st.active)
        return np.asarray(st.idx)[act & (np.asarray(st.y) < 0)]

    # -- beyond-parity surface ---------------------------------------------

    def learn_hyperparams(
        self,
        *,
        steps: int = 50,
        lr: float = 0.05,
        learn_noise: bool = True,
        prior_strength: float = 0.0,
        noise_floor: float = 0.0,
    ) -> Dict[str, float]:
        """Re-learn GP hyperparameters from this session's labels (type-II ML).

        Ascends the log marginal likelihood of the labeled set
        (:mod:`ital_tpu.models.hyperopt`) and refits the posterior.  Returns
        the new hyperparameters.  The reference fixes hyperparameters per
        dataset; this is the interactive counterpart of the harness's
        ``GP.learn_every``.  ``prior_strength``/``noise_floor`` select the
        regularized MAP-type-II estimator (anchored at the CURRENT
        hyperparameters — call it once per session, or keep your own anchor;
        see ``fit_hyperparams``).
        """
        from ital_tpu.models.hyperopt import fit_hyperparams

        st = self.state
        hyper = fit_hyperparams(
            st.x[st.idx], st.y, st.active, st.hyper,
            steps=steps, lr=lr, learn_noise=learn_noise,
            prior_strength=prior_strength, noise_floor=noise_floor,
        )
        self.state = gp_mod.gp_fit(st.replace(hyper=hyper))
        return {
            "length_scale": float(hyper.length_scale),
            "var": float(hyper.var),
            "noise": float(hyper.noise),
        }
