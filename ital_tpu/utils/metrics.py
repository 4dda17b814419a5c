"""Retrieval metrics: average precision, MAP, recall@k — on-device.

Reference parity: the reference computes AP per round via scikit-learn's
``average_precision_score`` on the GP posterior-mean ranking (SURVEY.md C6).
Here AP is a fixed chain of sort + cumsum on the device so the whole experiment
round stays compiled; the host only sees scalar curves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def average_precision(
    scores: jax.Array, relevant: jax.Array, exclude: jax.Array | None = None
) -> jax.Array:
    """AP of ranking ``scores`` (desc) against boolean ``relevant``.

    ``exclude``: optional (N,) bool — items removed from the ranking (the query
    itself, per the reference's protocol).  Ties broken by index (stable sort),
    matching the NumPy oracle.
    """
    if exclude is not None:
        scores = jnp.where(exclude, -jnp.inf, scores)
        relevant = relevant & ~exclude
    order = jnp.argsort(-scores, stable=True)
    # Excluded items sank to the bottom with -inf scores and rel=False — they
    # pad the tail and contribute nothing to either sum.
    rel_sorted = relevant[order].astype(scores.dtype)
    cum = jnp.cumsum(rel_sorted)
    ranks = jnp.arange(1, scores.shape[0] + 1, dtype=scores.dtype)
    precision_at_hit = cum / ranks * rel_sorted
    n_rel = jnp.maximum(jnp.sum(rel_sorted), 1.0)
    return jnp.sum(precision_at_hit) / n_rel


def recall_at_k(
    scores: jax.Array, relevant: jax.Array, k: int, exclude: jax.Array | None = None
) -> jax.Array:
    """Fraction of relevant items in the top k of the ranking."""
    if exclude is not None:
        scores = jnp.where(exclude, -jnp.inf, scores)
        relevant = relevant & ~exclude
    _, top = jax.lax.top_k(scores, k)
    hits = jnp.sum(relevant[top].astype(scores.dtype))
    return hits / jnp.maximum(jnp.sum(relevant.astype(scores.dtype)), 1.0)
