"""Session checkpoint / resume.

Reference parity: the reference has no session persistence — results are saved
only at experiment end (SURVEY.md section 5).  Here every feedback round can
snapshot the full session state (label buffers, Cholesky factor, whitened
cross-kernel, metric curves, RNG state) as a single ``.npz`` blob, and the
runner's ``--resume`` continues an interrupted experiment mid-query.  The corpus
features are NOT stored (they are reloadable from the dataset); everything else
is exact, so a resumed run is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ital_tpu.models.gp import GPState

_STATE_FIELDS = ("idx", "y", "valid", "count", "l", "beta", "v", "mu", "sig2")


def save_session(path: str, state: GPState, extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a session snapshot (everything except the corpus features)."""
    payload: Dict[str, np.ndarray] = {
        f"state_{name}": np.asarray(getattr(state, name)) for name in _STATE_FIELDS
    }
    payload["hyper"] = np.asarray(
        [state.hyper.length_scale, state.hyper.var, state.hyper.noise], np.float64
    )
    if state.density is not None:
        payload["density"] = np.asarray(state.density)
    for key, val in (extra or {}).items():
        payload[f"extra_{key}"] = np.asarray(val)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)  # atomic — a crash never leaves a torn checkpoint


def load_session(path: str, template: GPState) -> tuple[GPState, Dict[str, np.ndarray]]:
    """Rebuild a ``GPState`` from a snapshot + the corpus-bearing ``template``.

    ``template`` supplies ``x`` (and dtype/shapes); saved hyperparameters
    override the template's.  Returns the state and any ``extra`` arrays.
    """
    blob = np.load(path)
    kwargs = {name: jnp.asarray(blob[f"state_{name}"]) for name in _STATE_FIELDS}
    ls, var, noise = blob["hyper"]
    state = template.replace(
        **kwargs,
        hyper=template.hyper.replace(
            length_scale=jnp.asarray(ls, template.mu.dtype),
            var=jnp.asarray(var, template.mu.dtype),
            noise=jnp.asarray(noise, template.mu.dtype),
        ),
    )
    if "density" in blob:
        state = state.replace(density=jnp.asarray(blob["density"]))
    extras = {k[len("extra_"):]: blob[k] for k in blob.files if k.startswith("extra_")}
    return state, extras
