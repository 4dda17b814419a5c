#!/usr/bin/env python
"""Measure serving latency/throughput, incl. the cohort endpoint (round 3).

Spins up the HTTP daemon in-process on the digits corpus and measures, over
the wire (localhost):

1. per-request latency of the single-session surface (batch -> feedback),
2. `POST /batch_select` for K sessions vs K individual `GET /batch` calls —
   the cohort-over-HTTP claim (one vmapped device program for the group).

Writes results/serve_throughput.json.  Run on the real TPU.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8  # cohort size
CORPUS = os.environ.get("SERVE_TP_CORPUS", "digits")  # digits|mirflickr|corpus100k
# SERVE_TP_MESH=N serves through the mesh-sharded service (corpus padded and
# sharded over an N-device mesh, ShardedRetrieval sessions) — the round-5
# sharded-serving throughput record (round-4 VERDICT weak 6).  N=1 on the
# real chip measures the shard_map serving path's overhead vs the plain
# service at the same scale.
MESH = int(os.environ.get("SERVE_TP_MESH", "0") or "0")


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        # The daemon puts the handler exception in the 500 body — surface it
        # (a bare HTTPError hides the one line that says WHY, e.g. the 1M
        # cohort-update RESOURCE_EXHAUSTED this script first found).
        sys.stderr.write(f"{url}: HTTP {exc.code}: "
                         f"{exc.read().decode(errors='replace')[:2000]}\n")
        raise


def main() -> int:
    from ital_tpu.data.datasets import corpus100k, digits, mirflickr
    from ital_tpu.serve import RetrievalService, make_server

    if CORPUS == "mirflickr":
        ds, ls = mirflickr(), 50.0
    elif CORPUS == "corpus100k":
        ds, ls = corpus100k(), 50.0  # scripts/profile_100k.py conventions
    elif CORPUS == "corpus1m":
        # The 1M serving record (scale1m.py's workload behind HTTP).  The
        # production pool restriction is what makes 1M interactive (full-scan
        # MI is ~205 ms/round there — results/scale1m.json).
        ds, ls = corpus100k(n=1_000_000, dim=512), 50.0
    else:
        ds, ls = digits(), 2.2
    # SERVE_TP_FASTSEL=1 serves the round-4 production selection config
    # (coarse base + refined top-T, pool restriction at 1M) service-wide,
    # like `METHOD.n_qmc=32 METHOD.refine_top=64` in a server config.
    mkw = ({"n_qmc": 32, "refine_top": 64, "refine_n_qmc": 512}
           if os.environ.get("SERVE_TP_FASTSEL") else {})
    if mkw and CORPUS == "corpus1m":
        mkw["pool_size"] = 4096
    # SERVE_TP_CORPUS_DTYPE=bfloat16 quantizes the service's one shared
    # corpus copy (GP.corpus_dtype): the 1M HBM/bandwidth lever.
    cdt = os.environ.get("SERVE_TP_CORPUS_DTYPE", "")
    svc = RetrievalService(
        ds.x, length_scale=ls, var=1.0, noise=0.1, cap=64,
        strategy="ital", label_prob=0.9, mistake_prob=0.05,
        corpus_name=CORPUS, method_kwargs=mkw, mesh_devices=MESH,
        corpus_dtype=cdt,
    )
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    rng = np.random.default_rng(0)
    sids = []
    for _ in range(K):
        sid = _req(f"{base}/sessions", "POST", {})["session_id"]
        q = int(rng.integers(0, ds.n))
        _req(f"{base}/sessions/{sid}/query", "POST", {"index": q})
        # A couple of labels so MI scores separate (and jit warms).
        labs = {str(int(i)): (1 if ds.labels[i] == ds.labels[q] else -1)
                for i in rng.integers(0, ds.n, size=4)}
        _req(f"{base}/sessions/{sid}/feedback", "POST", {"labels": labs})
        sids.append(sid)

    # Warm both compiled paths.
    _req(f"{base}/sessions/{sids[0]}/batch?k=4")
    _req(f"{base}/batch_select", "POST", {"session_ids": sids, "k": 4})

    def timed(fn, reps=5):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(1e3 * (time.perf_counter() - t0))
        return float(np.median(times))

    single_ms = timed(lambda: [
        _req(f"{base}/sessions/{s}/batch?k=4") for s in sids
    ])  # K sequential individual requests
    cohort_ms = timed(lambda: _req(
        f"{base}/batch_select", "POST", {"session_ids": sids, "k": 4}
    ))
    one_ms = timed(lambda: _req(f"{base}/sessions/{sids[0]}/batch?k=4"))

    # Full cohort ROUND trip: batched selection + batched absorption (round
    # 4's POST /batch_feedback — one vmapped gp_update for the group) vs the
    # same round driven per-session.  This is the gateway's whole-round cost.
    def full_round_cohort():
        r = _req(f"{base}/batch_select", "POST",
                 {"session_ids": sids, "k": 4})
        fb = {sid: {str(i): (1 if ds.labels[i] == ds.labels[int(b[0])] else -1)
                    for i in b}
              for sid, b in r["batches"].items()}
        _req(f"{base}/batch_feedback", "POST", {"feedback": fb})

    def full_round_individual():
        for s in sids:
            b = _req(f"{base}/sessions/{s}/batch?k=4")["batch"]
            labs = {str(i): (1 if ds.labels[i] == ds.labels[int(b[0])] else -1)
                    for i in b}
            _req(f"{base}/sessions/{s}/feedback", "POST", {"labels": labs})

    full_round_cohort()  # warm the batched update program
    round_cohort_ms = timed(full_round_cohort, reps=4)
    round_indiv_ms = timed(full_round_individual, reps=4)

    report = {
        "corpus": f"{CORPUS} ({ds.n} x {ds.x.shape[1]})",
        "k_sessions": K,
        "single_request_ms": round(one_ms, 1),
        "k_individual_requests_ms": round(single_ms, 1),
        "batch_select_ms_total": round(cohort_ms, 1),
        "batch_select_ms_per_session": round(cohort_ms / K, 2),
        "speedup_vs_individual": round(single_ms / cohort_ms, 2),
        "full_round_cohort_ms_total": round(round_cohort_ms, 1),
        "full_round_cohort_ms_per_session": round(round_cohort_ms / K, 2),
        "full_round_individual_ms": round(round_indiv_ms, 1),
        "full_round_speedup": round(round_indiv_ms / round_cohort_ms, 2),
    }
    report["method_kwargs"] = mkw
    report["mesh_devices"] = MESH
    if cdt:
        report["corpus_dtype"] = cdt
    report["platform"] = __import__("jax").devices()[0].platform
    stem = ("serve_throughput" if CORPUS == "digits"
            else f"serve_throughput_{CORPUS}")
    name = (stem + (f"_mesh{MESH}" if MESH else "")
            + ("_fastsel" if mkw else "")
            + (f"_{cdt}" if cdt else "") + ".json")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", name)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    srv.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
