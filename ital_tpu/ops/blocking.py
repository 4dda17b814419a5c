"""Shared streaming helper: apply a function over fixed-size row blocks.

One implementation of the pad -> reshape -> ``lax.map`` -> slice-back pattern
used by every corpus-streaming computation (blockwise kernels, density, EMOC
column sums, the MI scan), so padding constants and the slice arithmetic live
in exactly one place.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def blocked_map(
    fn: Callable[..., jax.Array],
    arrays: Sequence[jax.Array],
    *,
    block: int,
    pad_values: Sequence[Any] | None = None,
) -> jax.Array:
    """``concat([fn(*blk) for blk in row-blocks of arrays])[:n]`` via ``lax.map``.

    Args:
      fn: maps per-block slices (leading dim ``block``, or ``n`` when the
        whole input fits in one block — fn must not rely on a fixed leading
        dim) to an array with the same leading dim.
      arrays: same leading dim ``n``; streamed together.
      block: rows per block; the last block is zero-padded (or per-array
        ``pad_values``) and the padded outputs sliced away.
      pad_values: optional per-array pad constants (e.g. 1.0 for a variance
        vector so downstream sqrt/division stays finite on pad rows); must
        match ``arrays`` in length.

    Returns the concatenated outputs with leading dim ``n``.
    """
    n = arrays[0].shape[0]
    if pad_values is not None and len(pad_values) != len(arrays):
        raise ValueError(
            f"pad_values has {len(pad_values)} entries for {len(arrays)} "
            f"arrays — a silent zip truncation would drop streamed inputs"
        )
    if n <= block:
        return fn(*arrays)
    nblocks = -(-n // block)
    pad = nblocks * block - n
    if pad_values is None:
        pad_values = [0.0] * len(arrays)

    def to_blocks(a, pv):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a, widths, constant_values=pv)
        return a.reshape(nblocks, block, *a.shape[1:])

    blocks = tuple(to_blocks(a, pv) for a, pv in zip(arrays, pad_values))
    out = jax.lax.map(lambda blk: fn(*blk), blocks)
    out = out.reshape(nblocks * block, *out.shape[2:])
    return out[:n]
