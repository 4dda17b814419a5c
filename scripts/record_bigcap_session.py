#!/usr/bin/env python
"""Record a large-cap (distributed chol2d refit) session at 100k scale.

VERDICT r2 item 4 asked for "a recorded large-cap session" on top of the
production wiring: this runs BASELINE config 5's corpus (100k x 512) with
cap=1024 — above GPConfig.chol2d_threshold, so the sharded runner absorbs
labels through the distributed refit (``l`` row-sharded; on this 1-chip host
the mesh degenerates to 1 device, which exercises the same code path with
local-only panels; the 8-way distribution equality is pinned on the virtual
mesh in tests/test_bigcap.py).  Writes results/bigcap_session_100k.json with
per-round timings so first-call compile/transfer is distinguishable from
steady state (docs/PROFILE.md section 6 recording rule).

Run on the real TPU (plain ``python``); first compile of the 100k bigcap
program is minutes on the remote compile service.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from ital_tpu.runner import run_experiment
    from ital_tpu.utils.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Extra SECTION.key=value overrides on argv record a tagged variant
    # (e.g. METHOD.pool_size=4096 METHOD.refine_top=64 --tag fast) without
    # overwriting the baseline record.
    argv = sys.argv[1:]
    tag = ""
    if "--tag" in argv:
        i = argv.index("--tag")
        if i + 1 >= len(argv):
            sys.exit("--tag requires a value (the record-filename suffix)")
        tag = "_" + argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    stem = f"bigcap_session_100k{tag}"
    log = os.path.join(repo, "results", f"{stem}.jsonl")
    if os.path.exists(log):
        os.unlink(log)
    cfg = load_config(
        os.path.join(repo, "configs", "scale100k.ini"),
        ("EXPERIMENT.n_rounds=3", "EXPERIMENT.max_classes=1",
         "GP.cap=1024", "GP.chol2d_threshold=1024",
         f"EXPERIMENT.log_jsonl={log}") + tuple(argv),
    )
    t0 = time.time()
    res = run_experiment(cfg)
    wall = time.time() - t0

    rounds = []
    with open(log) as fh:
        for line in fh:
            rec = json.loads(line)
            rounds.append({"round": rec["round"], "ap": rec["ap"],
                           "round_ms": rec.get("round_ms")})
    record = {
        "dataset": res["dataset"],
        "method": res["method"],
        "method_kwargs": dict(cfg.method_kwargs),
        "cap": cfg.cap,
        "chol2d": bool(res.get("chol2d")),
        "mesh_devices": res.get("mesh_devices"),
        "map": [round(float(v), 4) for v in res["map"]],
        "per_round": rounds,
        "wall_s": round(wall, 1),
        "note": "cap=1024 crosses chol2d_threshold: label absorption is the "
                "distributed chol2d refit (parallel/bigcap.py); per-round "
                "timings separate first-call compile/transfer from steady "
                "state",
    }
    out = os.path.join(repo, "results", f"{stem}.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record, indent=1))
    assert record["chol2d"], "bigcap path was not taken!"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
