"""Build + ctypes bindings for the native C++ components (ital_tpu/native/mvndst.cpp).

The shared library is compiled on first use with the system ``g++`` and cached
next to the XLA compilation cache; everything degrades gracefully (``None``)
when no compiler is available, and callers fall back to scipy/JAX paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> Optional[str]:
    """Locate ``mvndst.cpp`` — shipped as package data (works for wheel
    installs, not just repo checkouts; advisor round-1 finding)."""
    try:
        from importlib import resources

        p = resources.files("ital_tpu").joinpath("native/mvndst.cpp")
        # str(p) must be a REAL on-disk path (g++ and getmtime consume it);
        # under zipped installs is_file() can be True for an in-zip resource.
        if p.is_file() and os.path.exists(str(p)):
            return str(p)
    except Exception:
        pass
    # Fallback: repo-checkout layout relative to this module.
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(root, "ital_tpu", "native", "mvndst.cpp")
    return cand if os.path.exists(cand) else None


def _build_dir() -> str:
    d = os.environ.get(
        "ITAL_TPU_NATIVE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ital_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_mvndst() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libmvndst; returns None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    if src is None:
        return None
    so = os.path.join(_build_dir(), "libmvndst.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so + ".tmp", src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(so + ".tmp", so)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.mvn_orthant_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # mu
        ctypes.POINTER(ctypes.c_double),  # chol
        ctypes.POINTER(ctypes.c_double),  # signs
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),  # out
    ]
    lib.mvn_orthant_batch.restype = None
    _LIB = lib
    return _LIB


def mvn_orthant_probs_native(
    mu: np.ndarray, chol: np.ndarray, signs: np.ndarray, n_points: int = 128
) -> Optional[np.ndarray]:
    """Orthant probabilities for every row of ``signs`` (n_cfg, m); None if no lib.

    Same algorithm and lattice as :func:`ital_tpu.ops.mvn.mvn_orthant_prob`, in
    double precision on the host CPU.
    """
    lib = load_mvndst()
    if lib is None:
        return None
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    chol = np.ascontiguousarray(chol, dtype=np.float64)
    signs = np.ascontiguousarray(signs, dtype=np.float64)
    n_cfg, m = signs.shape
    out = np.empty(n_cfg, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mvn_orthant_batch(
        mu.ctypes.data_as(dp), chol.ctypes.data_as(dp), signs.ctypes.data_as(dp),
        m, n_cfg, n_points, out.ctypes.data_as(dp),
    )
    return out
