"""The seeded noisy/skipping simulated user.

Reference parity: the user-simulation logic of ``run_experiment.py`` (SURVEY.md
C6): for each item shown, the user annotates with probability ``label_prob``
(otherwise the item is skipped) and an annotation is flipped with probability
``mistake_prob``.  Pure jittable function of a PRNG key so whole experiment
rounds fuse into a single compiled step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def simulate_feedback(
    key: jax.Array,
    batch: jax.Array,
    relevant: jax.Array,
    label_prob: jax.Array | float,
    mistake_prob: jax.Array | float,
) -> tuple[jax.Array, jax.Array]:
    """Noisy feedback for the shown ``batch``.

    Args:
      key: PRNG key for this round.
      batch: (b,) corpus indices shown to the user.
      relevant: (N,) bool ground-truth relevance for the current query's class.

    Returns ``(y, valid)``: (b,) labels in {-1, +1} (garbage where invalid) and
    (b,) bool mask of items the user actually annotated.
    """
    k_label, k_flip = jax.random.split(key)
    b = batch.shape[0]
    truth = jnp.where(relevant[batch], 1.0, -1.0)
    labeled = jax.random.uniform(k_label, (b,)) < label_prob
    flipped = jax.random.uniform(k_flip, (b,)) < mistake_prob
    y = jnp.where(flipped, -truth, truth)
    return y.astype(jnp.float32), labeled
