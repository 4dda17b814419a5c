"""Device mesh construction.

The reference has no distributed backend at all — its only parallelism is a
single-host ``multiprocessing.Pool`` fan-out over candidates (SURVEY.md section
2.3).  The TPU rebuild's data parallelism shards the corpus axis (rows of the
feature matrix, columns of the whitened cross-kernel, the candidate axis of the
MI scan) over a 1-D mesh; all cross-chip traffic is XLA collectives over ICI
(``psum`` for feature/label gathers and metric reductions, ``all_gather`` for
the per-shard argmax exchange).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

CORPUS_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, *, axis: str = CORPUS_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
