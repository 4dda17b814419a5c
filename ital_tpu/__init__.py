"""ital_tpu — a TPU-native framework for interactive content-based image retrieval
with information-theoretic active learning.

A from-scratch, TPU-first rebuild of the capabilities of the reference framework
``cvjena/ITAL`` (Barz, Käding, Denzler: "Information-Theoretic Active Learning for
Content-Based Image Retrieval", GCPR 2018).  Nothing here is a port: the compute
path is JAX/XLA/Pallas with static shapes, vmapped candidate scoring, and
``shard_map`` data parallelism over a TPU mesh instead of the reference's
NumPy/SciPy + multiprocessing design.

Package layout
--------------
``ops``       TPU compute primitives: blockwise/fused RBF kernel, padded Cholesky
              with incremental low-rank updates, Genz QMC multivariate-normal
              orthant probabilities, masked top-k.
``models``    The GP relevance model (``GPState``) and the active-retrieval
              session state built on it.
``select``    Selection strategies: ITAL mutual-information batch selection, the
              classical active-learning baselines, and the regression variant.
``parallel``  Device mesh construction, sharded per-round computation, collective
              argmax/top-k over ICI.
``data``      Dataset loaders (toy Gaussians, digits/USPS, MIRFLICKR-25K
              features) and the seeded noisy/skipping simulated user.
``utils``     Configs, metrics (AP/MAP/recall), JSONL logging, checkpointing.

Reference parity map (reference paths are ``file :: symbol`` in cvjena/ITAL; see
SURVEY.md — the reference mount was empty, so citations are to the public repo):

=====================  ==========================================
ital_tpu module        reference counterpart
=====================  ==========================================
models.gp              italia/gp.py :: GaussianProcess
models.session         italia/retrieval_base.py :: ActiveRetrievalBase
select.ital            italia/ital.py :: ITAL
select.baselines       italia/baseline_methods.py
select.regression      italia/regression.py (regression variant)
data.datasets          italia/datasets.py
data.user              run_experiment.py (simulated user)
runner                 run_experiment.py
=====================  ==========================================
"""

__version__ = "0.1.0"

import os as _os

# Platform escape hatch: ITAL_TPU_PLATFORM=cpu forces the JAX platform before
# any backend initializes.  The JAX_PLATFORMS env var alone is ignored on this
# host (the axon TPU plugin self-registers), and a dead chip tunnel can HANG
# backend setup rather than error — this knob lets every CLI/script run
# against the CPU backend during an outage (tests force it via conftest).
_plat = _os.environ.get("ITAL_TPU_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

# Persistent XLA compilation cache: the fused selection/update steps take
# minutes to compile at MIRFLICKR scale; caching makes every process after the
# first start warm.  Opt out with ITAL_TPU_NO_CACHE=1.
if not _os.environ.get("ITAL_TPU_NO_CACHE"):
    import hashlib as _hashlib
    import platform as _platform

    import jax as _jax

    # Scope the cache by a host fingerprint: CPU AOT artifacts compiled with
    # different machine features SIGILL when loaded on another host.  The
    # fingerprint takes every stable identity field cpuinfo offers (flags +
    # model name + stepping + microcode) plus the jax version — but note it
    # CANNOT capture LLVM-detected tuning preferences (prefer-no-scatter/
    # gather), so gate paths (__graft_entry__) disable the cache outright on
    # CPU instead of trusting this scoping.
    try:
        with open("/proc/cpuinfo") as _fh:
            _id_fields = ("flags", "model name", "stepping", "microcode")
            _seen = set()
            for _l in _fh:
                if _l.split(":")[0].strip() in _id_fields:
                    _seen.add(_l.strip())
            _flags = "|".join(sorted(_seen)) or _platform.machine()
    except OSError:
        _flags = _platform.machine()
    _fp = _hashlib.sha1(f"{_flags}|jax={_jax.__version__}".encode()).hexdigest()[:10]
    _cache_dir = _os.environ.get(
        "ITAL_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", f"ital_tpu_xla_{_fp}"),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
