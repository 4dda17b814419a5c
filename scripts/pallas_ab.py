#!/usr/bin/env python
"""Pallas-vs-lax RBF A/B at the shapes ``rbf_kernel_auto`` actually routes.

Round-4 VERDICT weak 4: ``ops/pallas_rbf.py``'s routing (TPU + both dims
>= 512 -> hand-written tile kernel) shipped on the CLAIM that the large-block
regime is "where Pallas genuinely pays", with interpret-mode value equality
as the only test.  This script measures the claim on the chip so the routing
can be kept, retuned, or deleted (PROFILE.md section 5's rule: re-measure
after every locality change; the tree-Genz history shows such assumptions
flipping sign).

What the router actually serves (grep ``rbf_kernel_auto``):

  emoc_block     ``ops/kernels.py::blockwise_reduce_abs_kpost`` — one
                 (N, 2048) cross-kernel block, posterior correction with the
                 (cap, N) whitened v, then a column abs-sum -> (2048,).
                 Also the shape of ``select/baselines.py`` entropy blocks.
  density_block  ``models/gp.py::corpus_density`` — one (2048, N) block,
                 row-mean -> (2048,).
  materialized   the raw (N, 2048) kernel block written to HBM (upper bound
                 on what the Pallas kernel's one-write promise can buy; no
                 routed consumer actually materializes, so this is context,
                 not a routing criterion).  Skipped at 1M (an 8 GB output per
                 pipelined call).

The (cap x N) fit/refit cross-kernels and (b, N) prediction rows do NOT go
through the router (they call ``ops.kernels.rbf_kernel`` directly), so they
are not measured here.

The fused-consumer cases are the honest criterion: on the lax path XLA fuses
``exp`` + the reduction so the (N, block) intermediate may never hit HBM,
while ``pallas_call`` MUST write its output block — the routing can therefore
LOSE in exactly the consumers it was built for.  Each variant is a fresh
jitted wrapper calling the implementation directly: the router's two branches
ARE these implementations, so A/B-ing them A/Bs the routing.

Writes results/pallas_ab.json (partial after each scale).  Protocol:
pipeline slope (scripts/timing_protocol.py), first call reported separately.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "pallas_ab.json")

BLOCK = 2048  # the consumers' streaming block (kernels.py / gp.py defaults)
CAP = 64     # production labeled-set capacity (bench.CAP)
D = 512      # production feature dim


def _write(report: dict, out: str) -> None:
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"   wrote {out}", flush=True)


def _slope(fn, args_fn, reps_lo: int, reps_hi: int) -> dict:
    import jax

    from scripts.timing_protocol import pipeline_ms

    t0 = time.perf_counter()
    out = fn(*args_fn(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    first_s = time.perf_counter() - t0
    lo = pipeline_ms(fn, args_fn, reps_lo)
    hi = pipeline_ms(fn, args_fn, reps_hi)
    slope = (hi - lo) / (reps_hi - reps_lo)
    return {"first_call_s": round(first_s, 2), "slope_ms": round(slope, 3)}


def run_scale(report: dict, n: int, out: str, *, mat_reps=(2, 6)) -> None:
    import jax
    import jax.numpy as jnp

    from ital_tpu.ops import pallas_rbf
    from ital_tpu.ops.kernels import rbf_kernel as rbf_lax

    print(f"== N = {n}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(CAP, n)).astype(np.float32) * 0.05)
    np.asarray(x[:1])  # corpus resident before timing
    ls, var = 6.0, 1.0

    key0 = jax.random.PRNGKey(3)

    def idx_args(r):
        # Fresh candidate block per dispatch so nothing is loop-invariant.
        # x/v ride along as ARGUMENTS: closure capture would lower them as
        # 2.3 GB of embedded constants at 1M, which the remote compile
        # service rejects (broken pipe, observed 2026-08-19).
        return (jax.random.randint(jax.random.fold_in(key0, r),
                                   (BLOCK,), 0, n), x, v)

    scale_rec: dict = {}

    for impl_name, impl in (("lax", rbf_lax),
                            ("pallas", pallas_rbf.rbf_kernel_pallas)):
        @jax.jit
        def emoc_block(idx, x, v, _impl=impl):
            xc = x[idx]
            k_cross = _impl(x, xc, ls, var)                # (N, BLOCK)
            k_post = k_cross - jnp.dot(
                v.T, v[:, idx], preferred_element_type=jnp.float32)
            return jnp.sum(jnp.abs(k_post), axis=0)        # (BLOCK,)

        @jax.jit
        def density_block(idx, x, v, _impl=impl):
            xc = x[idx]
            return jnp.mean(_impl(xc, x, ls, 1.0), axis=1)  # (BLOCK,)

        rec = {
            "emoc_block": _slope(emoc_block, idx_args, 4, 12),
            "density_block": _slope(density_block, idx_args, 4, 12),
        }

        if n * BLOCK * 4 <= 1 << 31:  # skip the 8 GB-per-call case at 1M
            @jax.jit
            def materialized(idx, x, v, _impl=impl):
                k = _impl(x, x[idx], ls, var)               # (N, BLOCK) to HBM
                # Return k itself so neither path can elide the write; the
                # scalar leaf is first so the protocol fetches 4 bytes.
                return k.sum(), k

            rec["materialized"] = _slope(materialized, idx_args, *mat_reps)

        scale_rec[impl_name] = rec
        print(f"   {impl_name}: {json.dumps(rec)}", flush=True)

    report["scales"][str(n)] = scale_rec
    _write(report, out)


def main() -> int:
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scales", default="25000,100000,1000000")
    ap.add_argument("--out", default=OUT, help="record path (off-path for "
                    "non-chip smoke runs; the committed record is the chip one)")
    args = ap.parse_args()

    report = {
        "platform": jax.devices()[0].platform,
        "protocol": "pipeline slope (scripts/timing_protocol.py); "
                    "first_call_s separate per PROFILE.md section 6",
        "block": BLOCK, "cap": CAP, "d": D,
        "tile": "pallas default 256x256 (the router's configuration)",
        "scales": {},
    }
    for n in (int(s) for s in args.scales.split(",") if s):
        run_scale(report, n, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
