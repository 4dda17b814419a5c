"""Ring passes over the sharded corpus axis (the CP/ring-attention analog).

SURVEY.md section 2.3 / section 5 "long-context" row: strategies whose score
needs an O(N^2) interaction between every candidate and every corpus point
(EMOC's column-abs-sums, MCMI's whole-corpus hypothetical entropy) cannot keep
either side replicated at large N.  The sharded form rotates per-shard corpus
blocks around the ICI ring with ``lax.ppermute`` — flash-attention style: each
chip holds its candidates fixed and accumulates partial reductions against
every visiting block, so the full N^2 work is split p ways with only O(N/p)
bytes moving per step and no N^2 materialization anywhere.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from ital_tpu.parallel.mesh import CORPUS_AXIS


def ring_reduce_over_corpus(
    blocks: Any,
    accumulate: Callable[[Any, Any], Any],
    init: Any,
) -> Any:
    """Accumulate ``accumulate(acc, blocks)`` over every corpus shard's blocks.

    Args:
      blocks: pytree of this chip's per-corpus-row arrays (leading dim n_loc) —
        e.g. ``(x_shard, v_shard.T, mu_shard, sig2_shard)``.  The whole pytree
        travels the ring together.
      accumulate: ``(acc, blocks) -> acc``; called once per ring step.  The
        blocks visiting at step s originate from chip ``(me + s) % p``.
      init: initial accumulator, resident on this chip.

    Only valid inside ``shard_map`` over the corpus axis.
    """
    p = jax.lax.axis_size(CORPUS_AXIS)
    perm = [(i, (i - 1) % p) for i in range(p)]  # receive from the right

    def body(s, carry):
        acc, blk = carry
        acc = accumulate(acc, blk)
        blk = jax.lax.cond(
            s < p - 1,
            lambda b: jax.tree.map(
                lambda o: jax.lax.ppermute(o, CORPUS_AXIS, perm), b
            ),
            lambda b: b,
            blk,
        )
        return acc, blk

    acc, _ = jax.lax.fori_loop(0, p, body, (init, blocks))
    return acc
