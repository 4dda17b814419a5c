"""HTTP serving daemon: full client-driven retrieval session over the wire."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from ital_tpu.serve import RetrievalService, make_server


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 6)) * 4
    x = np.concatenate([c + rng.normal(size=(40, 6)) for c in centers])
    svc = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="ital", label_prob=1.0, mistake_prob=0.0,
        corpus_name="toy3x40",
    )
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_full_session_over_http(server):
    code, h = _req(f"{server}/healthz")
    assert code == 200 and h["ok"] and h["n"] == 120

    code, r = _req(f"{server}/sessions", "POST", {})
    assert code == 200
    sid = r["session_id"]

    code, _ = _req(f"{server}/sessions/{sid}/query", "POST", {"index": 5})
    assert code == 200

    # Two feedback rounds driven purely over the wire.
    for _ in range(2):
        code, b = _req(f"{server}/sessions/{sid}/batch?k=3")
        assert code == 200 and len(b["batch"]) == 3
        labels = {str(i): (1 if i < 40 else -1) for i in b["batch"]}
        code, fb = _req(f"{server}/sessions/{sid}/feedback", "POST",
                        {"labels": labels})
        assert code == 200 and fb["labeled"] >= 4

    code, rk = _req(f"{server}/sessions/{sid}/ranking?k=10")
    assert code == 200
    in_class = sum(1 for i in rk["top"] if i < 40)
    assert in_class >= 8, rk  # query's class dominates the ranking

    code, learned = _req(f"{server}/sessions/{sid}/learn", "POST", {"steps": 20})
    assert code == 200 and learned["length_scale"] > 0

    # Regularized (MAP type-II) learning over the wire: the noise floor binds
    # the result, and negative regularizers are a 400.
    code, learned = _req(f"{server}/sessions/{sid}/learn", "POST",
                         {"steps": 20, "prior_strength": 1.0,
                          "noise_floor": 0.07})
    assert code == 200 and learned["noise"] >= 0.07 * (1 - 1e-5), learned
    code, err = _req(f"{server}/sessions/{sid}/learn", "POST",
                     {"steps": 5, "prior_strength": -1.0})
    assert code == 400 and "prior_strength" in err["error"]

    code, _ = _req(f"{server}/sessions/{sid}", "DELETE")
    assert code == 200
    code, err = _req(f"{server}/sessions/{sid}/ranking?k=5")
    assert code == 404 and "no such session" in err["error"]


def test_session_overrides_and_errors(server):
    # Per-session strategy override.
    code, r = _req(f"{server}/sessions", "POST",
                   {"strategy": "uncertainty_sampling", "cap": 16})
    assert code == 200
    sid = r["session_id"]
    _req(f"{server}/sessions/{sid}/query", "POST", {"index": 50})
    code, b = _req(f"{server}/sessions/{sid}/batch?k=2")
    assert code == 200 and len(b["batch"]) == 2

    # Unknown routes and sessions are 404, malformed bodies 400/500 json.
    code, _ = _req(f"{server}/nope")
    assert code == 404
    code, _ = _req(f"{server}/sessions/does-not-exist/batch?k=2")
    assert code == 404


def test_concurrent_clients(server):
    """Two client threads drive independent sessions concurrently; the
    service lock serializes device work and every response stays consistent."""
    import threading

    errors = []

    def client(query, lo, hi):
        try:
            _, r = _req(f"{server}/sessions", "POST", {})
            sid = r["session_id"]
            code, _ = _req(f"{server}/sessions/{sid}/query", "POST",
                           {"index": query})
            assert code == 200
            for _ in range(2):
                code, b = _req(f"{server}/sessions/{sid}/batch?k=2")
                assert code == 200 and len(b["batch"]) == 2
                _req(f"{server}/sessions/{sid}/feedback", "POST",
                     {"labels": {str(i): (1 if lo <= i < hi else -1)
                                 for i in b["batch"]}})
            code, rk = _req(f"{server}/sessions/{sid}/ranking?k=5")
            assert code == 200 and len(rk["top"]) == 5
        except Exception as e:  # surface thread failures to the main thread
            errors.append(e)

    threads = [threading.Thread(target=client, args=(5, 0, 40)),
               threading.Thread(target=client, args=(45, 40, 80))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors


def test_snapshot_restore_over_http(server):
    """Serving failover: snapshot a mid-session state, delete the session,
    restore from the bytes — ranking identical."""
    _, r = _req(f"{server}/sessions", "POST", {})
    sid = r["session_id"]
    _req(f"{server}/sessions/{sid}/query", "POST", {"index": 5})
    _, b = _req(f"{server}/sessions/{sid}/batch?k=3")
    _req(f"{server}/sessions/{sid}/feedback", "POST",
         {"labels": {str(i): (1 if i < 40 else -1) for i in b["batch"]}})
    _, before = _req(f"{server}/sessions/{sid}/ranking?k=10")

    with urllib.request.urlopen(f"{server}/sessions/{sid}/snapshot") as resp:
        blob = resp.read()
    assert resp.headers["Content-Type"] == "application/octet-stream"
    _req(f"{server}/sessions/{sid}", "DELETE")

    req = urllib.request.Request(f"{server}/sessions/restore", data=blob,
                                 method="POST")
    with urllib.request.urlopen(req) as resp2:
        sid2 = json.loads(resp2.read())["session_id"]
    _, after = _req(f"{server}/sessions/{sid2}/ranking?k=10")
    assert after == before
    # Restored sessions keep working: another feedback round applies cleanly.
    code, b2 = _req(f"{server}/sessions/{sid2}/batch?k=2")
    assert code == 200 and len(b2["batch"]) == 2


def test_batch_select_cohort_matches_individual(server):
    """POST /batch_select (vmapped cohort selection over HTTP) returns the
    same batches as per-session GET /batch for identically-prepared sessions
    (ital selection is deterministic given the posterior)."""
    sids, singles = [], {}
    for q in (3, 47, 85):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        # Warm the posterior with several spread labels so MI scores separate
        # beyond fp noise (saturated-plateau argmax ties are ULP-sensitive
        # between the vmapped and serial programs — CLAUDE.md "MI ties").
        _req(f"{server}/sessions/{sid}/feedback", "POST",
             {"labels": {str((q + 11) % 120): 1, str((q + 31) % 120): 1,
                         str((q + 60) % 120): -1, str((q + 90) % 120): -1}})
        sids.append(sid)

    # Reference: individual per-session selection on three twin sessions
    # (prepared identically; selection does not mutate state).
    for sid, q in zip(sids, (3, 47, 85)):
        code, r = _req(f"{server}/sessions/{sid}/batch?k=3")
        assert code == 200
        singles[sid] = r["batch"]

    code, r = _req(f"{server}/batch_select", "POST",
                   {"session_ids": sids, "k": 3})
    assert code == 200
    assert r["batches"] == singles

    # Unknown session id in the group -> 404, not a server error.
    code, _ = _req(f"{server}/batch_select", "POST",
                   {"session_ids": ["nope"], "k": 2})
    assert code == 404


def test_batch_select_mixed_capacity_falls_back(server):
    """Sessions with different caps can't stack; the endpoint silently falls
    back to per-session selection with identical semantics."""
    _, r1 = _req(f"{server}/sessions", "POST", {})
    _, r2 = _req(f"{server}/sessions", "POST", {"cap": 16})
    for sid, q in ((r1["session_id"], 7), (r2["session_id"], 90)):
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
    code, r = _req(f"{server}/batch_select", "POST",
                   {"session_ids": [r1["session_id"], r2["session_id"]],
                    "k": 2})
    assert code == 200
    assert set(r["batches"]) == {r1["session_id"], r2["session_id"]}
    for b in r["batches"].values():
        assert len(b) == 2


def test_batch_feedback_cohort_matches_individual(server):
    """POST /batch_feedback (one vmapped gp_update for K sessions — the other
    half of the cohort round, VERDICT r3 weak 4) produces the same posterior
    as per-session POST /feedback on identically-prepared twin sessions."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        return sid

    queries = (3, 47, 85)
    batched = [make(q) for q in queries]
    singles = [make(q) for q in queries]
    # Different label-dict sizes exercise the shared pad width (incl. skips).
    labels = [
        {"11": 1, "55": -1, "99": 1},
        {"20": 1},
        {"70": -1, "90": 1, "100": 0, "30": 1, "31": -1},
    ]
    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": dict(zip(batched, labels))})
    assert code == 200
    for sid in batched:
        assert r["sessions"][sid]["labeled"] >= 2
    for sid, lab in zip(singles, labels):
        _req(f"{server}/sessions/{sid}/feedback", "POST", {"labels": lab})
    for sb, ss in zip(batched, singles):
        _, rb = _req(f"{server}/sessions/{sb}/ranking?k=15")
        _, rs = _req(f"{server}/sessions/{ss}/ranking?k=15")
        assert rb["top"] == rs["top"]
        np.testing.assert_allclose(rb["scores"], rs["scores"], atol=1e-4)


def test_batch_feedback_mixed_capacity_falls_back(server):
    """Different caps can't stack; the endpoint falls back per-session with
    identical results."""
    _, r1 = _req(f"{server}/sessions", "POST", {})
    _, r2 = _req(f"{server}/sessions", "POST", {"cap": 16})
    s1, s2 = r1["session_id"], r2["session_id"]
    _req(f"{server}/sessions/{s1}/query", "POST", {"index": 7})
    _req(f"{server}/sessions/{s2}/query", "POST", {"index": 90})
    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": {s1: {"11": 1}, s2: {"95": 1}}})
    assert code == 200
    assert r["sessions"][s1]["labeled"] >= 2
    assert r["sessions"][s2]["labeled"] >= 2


def test_batch_select_density_sessions_batch():
    """Density-strategy sessions share ONE corpus density vector (computed
    once per length-scale by the service), so the cohort endpoint genuinely
    BATCHES them — no silent per-session fallback (VERDICT r3 weak 4) — and
    returns the same batches as individual selection."""
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 6)) * 4
    x = np.concatenate([c + rng.normal(size=(40, 6)) for c in centers])
    svc = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="sud", label_prob=1.0, mistake_prob=0.0,
    )
    sids = [svc.create_session() for _ in range(2)]
    for sid, q in zip(sids, (3, 47)):
        svc.set_query(sid, q)
        svc.feedback(sid, {str((q + 11) % 120): 1, str((q + 60) % 120): -1})
    # One shared density across the group (same construction length-scale).
    states = [svc._entry(sid)[0].state for sid in sids]
    assert states[0].density is not None and states[1].density is not None
    np.testing.assert_allclose(np.asarray(states[0].density),
                               np.asarray(states[1].density))
    singles = {sid: svc.next_batch(sid, 3) for sid in sids}
    # Spy: the vmapped group program must be used (not the fallback).
    calls = []
    orig = svc._batched_select

    def spy(strategy, k, kw_items=()):
        calls.append((strategy, k))
        return orig(strategy, k, kw_items)

    svc._batched_select = spy
    assert svc.next_batch_many(sids, 3) == singles
    assert calls == [("sud", 3)]


def test_batch_feedback_empty_labels_is_noop(server):
    """A session submitting an EMPTY label dict inside a cohort is a no-op:
    it must not burn padded capacity slots in the stacked update (code-review
    round 4), and the other sessions still take the batched path."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        return sid

    s_empty, s_a, s_b = make(3), make(47), make(85)
    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": {s_empty: {},
                                 s_a: {"50": 1, "60": -1},
                                 s_b: {"90": 1}}})
    assert code == 200
    # The empty session reports its unchanged count (query label only).
    assert r["sessions"][s_empty]["labeled"] == 1
    # "labeled" is state.count, which INCLUDES inert bucket-pad slots
    # (_UPDATE_BUCKET=4): query + padded block = 1 + 4 — identical to what
    # the per-session path reports for the same feedback.
    assert r["sessions"][s_a]["labeled"] == 5
    assert r["sessions"][s_b]["labeled"] == 5
    # Repeating an all-empty cohort never errors or consumes capacity.
    for _ in range(3):
        code, r = _req(f"{server}/batch_feedback", "POST",
                       {"feedback": {s_empty: {}}})
        assert code == 200 and r["sessions"][s_empty]["labeled"] == 1


def test_batch_feedback_per_session_widths_match_individual(server):
    """Cohort absorption must preserve PER-SESSION capacity semantics
    (code-review round 4): each session pads to its OWN bucket width, so a
    1-label session in a cohort with a 5-label session burns 4 slots — not
    the cohort max of 8 — and 'labeled' is identical to what individual
    POST /feedback calls produce."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        return sid

    s_small, s_big = make(3), make(47)
    # Reference: the same feedback via the per-session endpoint.
    s_small_ref, s_big_ref = make(3), make(47)
    _req(f"{server}/sessions/{s_small_ref}/feedback", "POST",
         {"labels": {"50": 1}})
    _req(f"{server}/sessions/{s_big_ref}/feedback", "POST",
         {"labels": {str(i): 1 for i in (60, 61, 62, 63, 64)}})
    _, r_small = _req(f"{server}/sessions/{s_small_ref}/batch?k=1")

    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": {s_small: {"50": 1},
                                 s_big: {str(i): 1
                                         for i in (60, 61, 62, 63, 64)}}})
    assert code == 200
    # small: 1 (query) + own bucket 4 = 5; big: 1 + bucket(5)=8 -> 9.
    assert r["sessions"][s_small]["labeled"] == 5
    assert r["sessions"][s_big]["labeled"] == 9


def test_batch_feedback_capacity_error_is_per_session(server):
    """A session whose labels would overflow its capacity gets a per-session
    {'error': ...} entry; the rest of the cohort is still absorbed (the old
    code raised mid-loop, leaving the caller unable to tell which sessions
    were updated — code-review round 4)."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        return sid

    s_full, s_ok = make(3), make(47)
    # The server fixture's cap is 32; seven 1-label feedbacks (4 padded slots
    # each) bring s_full to 1 + 28 = 29 used slots.
    for j in range(7):
        _, rr = _req(f"{server}/sessions/{s_full}/feedback", "POST",
                     {"labels": {str(10 + j): 1}})
    assert rr["labeled"] == 29

    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": {s_full: {str(i): 1 for i in range(90, 99)},
                                 s_ok: {"50": 1}}})
    assert code == 200
    assert "error" in r["sessions"][s_full]
    assert "capacity" in r["sessions"][s_full]["error"]
    assert r["sessions"][s_ok]["labeled"] == 5


def test_batch_feedback_malformed_input_is_atomic(server):
    """A malformed label key anywhere in the cohort rejects the WHOLE request
    (400) with NO session updated — not a partial application."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        return sid

    s_a, s_b = make(3), make(47)
    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": {s_a: {"50": 1},
                                 s_b: {"not-an-index": 1}}})
    assert code == 400
    # s_a must NOT have been updated before the rejection.
    _, r = _req(f"{server}/batch_feedback", "POST", {"feedback": {s_a: {}}})
    assert r["sessions"][s_a]["labeled"] == 1


def test_restored_density_session_excluded_from_cohort():
    """A restored density session's vector may have been built at a different
    length-scale than this server's default; restore marks it with a unique
    sentinel so cohort batching (which assumes ONE shared vector) skips it
    (code-review round 4) — results must still match individual selection."""
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(3, 6)) * 4
    x = np.concatenate([c + rng.normal(size=(40, 6)) for c in centers])
    svc = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="sud", label_prob=1.0, mistake_prob=0.0,
    )
    s1 = svc.create_session()
    svc.set_query(s1, 3)
    svc.feedback(s1, {"14": 1, "63": -1})
    blob = svc.snapshot(s1)
    s_restored = svc.restore(blob)
    s2 = svc.create_session()
    svc.set_query(s2, 47)
    svc.feedback(s2, {"58": 1, "107": -1})

    singles = {sid: svc.next_batch(sid, 3) for sid in (s_restored, s2)}
    calls = []
    orig = svc._batched_select

    def spy(strategy, k, kw_items=()):
        calls.append((strategy, k))
        return orig(strategy, k, kw_items)

    svc._batched_select = spy
    assert svc.next_batch_many([s_restored, s2], 3) == singles
    assert calls == []  # fell back per-session: no batched program was built


def test_service_method_kwargs_reach_selection():
    """Service-level [METHOD] options (n_qmc / pool_size / refine_top —
    ITAL's tractability and accuracy knobs) flow into every session's
    compiled selection, including the batched cohort path; sessions created
    with a strategy that does not declare them (random) drop them instead of
    crashing."""
    import jax

    rng = np.random.default_rng(2)
    centers = rng.normal(size=(3, 6)) * 4
    x = np.concatenate([c + rng.normal(size=(40, 6)) for c in centers])
    svc = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="ital", label_prob=0.9, mistake_prob=0.05,
        method_kwargs={"n_qmc": 32, "pool_size": 20,
                       "refine_top": 8, "refine_n_qmc": 64,
                       "randomize_qmc": True},
    )
    sids = []
    for q in (3, 47):
        sid = svc.create_session()
        svc.set_query(sid, q)
        svc.feedback(sid, {"14": 1, "63": -1})
        sids.append(sid)

    # Per-session and cohort selection both run under the kwargs and agree.
    singles = {sid: svc.next_batch(sid, 3) for sid in sids}
    # Rewind the per-session PRNG keys so the cohort draw matches.
    for sid in sids:
        s, _ = svc._entry(sid)
        s._key = jax.random.PRNGKey(0)
    a = {sid: svc.next_batch(sid, 3) for sid in sids}
    for sid in sids:
        s, _ = svc._entry(sid)
        s._key = jax.random.PRNGKey(0)
    b = svc.next_batch_many(sids, 3)
    assert a == b
    # The pool restriction is real: every pick is inside the top-20 pool
    # by posterior mean (excluding labeled), per session.
    from ital_tpu.select.ital import candidate_pool_indices

    for sid in sids:
        s, _ = svc._entry(sid)
        pool, _forbid = candidate_pool_indices(s.state, s.state.mu, 20)
        assert set(singles[sid]) <= {int(i) for i in np.asarray(pool)}

    # A random-strategy session under the same service must not receive the
    # ITAL-only kwargs.
    sid_r = svc.create_session(strategy="random")
    svc.set_query(sid_r, 3)
    assert len(svc.next_batch(sid_r, 3)) == 3


def test_per_session_method_kwargs():
    """Per-session static strategy options (``create_session(method_kwargs=…)``
    / the POST /sessions ``method_kwargs`` body field) layer over the
    service-level [METHOD] defaults; the cohort endpoint batches only
    same-kwargs groups (the options are part of the compiled program) and a
    snapshot/restore round-trip preserves the session's effective options."""
    import jax

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(3, 6)) * 4
    x = np.concatenate([c + rng.normal(size=(40, 6)) for c in centers])
    svc = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="ital", label_prob=0.9, mistake_prob=0.05,
        method_kwargs={"n_qmc": 32},
    )
    s_default = svc.create_session()
    s_pool = svc.create_session(method_kwargs={"pool_size": 16})
    s_pool2 = svc.create_session(method_kwargs={"pool_size": 16})
    for sid, q in ((s_default, 3), (s_pool, 47), (s_pool2, 47)):
        svc.set_query(sid, q)
        svc.feedback(sid, {"14": 1, "63": -1})

    # The override merged over the service default (n_qmc stays).
    sess_p, _ = svc._entry(s_pool)
    assert sess_p.method_kwargs == {"n_qmc": 32, "pool_size": 16}

    # The pool restriction is actually in force for the pool session only.
    from ital_tpu.select.ital import candidate_pool_indices

    picks = svc.next_batch(s_pool, 3)
    pool, _ = candidate_pool_indices(sess_p.state, sess_p.state.mu, 16)
    assert set(picks) <= {int(i) for i in np.asarray(pool)}

    # Mixed-kwargs group falls back per-session; same-kwargs group batches.
    calls = []
    orig = svc._batched_select

    def spy(strategy, k, kw_items=()):
        calls.append(kw_items)
        return orig(strategy, k, kw_items)

    svc._batched_select = spy
    svc.next_batch_many([s_default, s_pool], 3)
    assert calls == []  # incompatible: no batched program
    for sid in (s_pool, s_pool2):
        s, _ = svc._entry(sid)
        s._key = jax.random.PRNGKey(7)
    singles = {sid: svc.next_batch(sid, 3) for sid in (s_pool, s_pool2)}
    for sid in (s_pool, s_pool2):
        s, _ = svc._entry(sid)
        s._key = jax.random.PRNGKey(7)
    grouped = svc.next_batch_many([s_pool, s_pool2], 3)
    assert grouped == singles
    assert calls == [(("n_qmc", 32), ("pool_size", 16))]
    svc._batched_select = orig

    # Snapshot/restore preserves the session's effective options even when
    # the restoring service has different [METHOD] defaults.
    blob = svc.snapshot(s_pool)
    svc2 = RetrievalService(
        x.astype(np.float32), length_scale=2.5, noise=0.1, cap=32,
        strategy="ital", label_prob=0.9, mistake_prob=0.05,
        method_kwargs={"n_qmc": 128},
    )
    s_restored = svc2.restore(blob)
    sess_r, _ = svc2._entry(s_restored)
    assert sess_r.method_kwargs == {"n_qmc": 32, "pool_size": 16}


def test_http_session_method_kwargs(server):
    """POST /sessions accepts method_kwargs and the session runs under them."""
    code, r = _req(f"{server}/sessions", "POST",
                   {"method_kwargs": {"n_qmc": 32, "pool_size": 12}})
    assert code == 200
    sid = r["session_id"]
    code, _ = _req(f"{server}/sessions/{sid}/query", "POST", {"index": 5})
    assert code == 200
    code, b = _req(f"{server}/sessions/{sid}/batch?k=3")
    assert code == 200 and len(b["batch"]) == 3
    code, _ = _req(f"{server}/sessions/{sid}", "DELETE")
    assert code == 200


def test_http_session_method_kwargs_non_scalar_rejected(server):
    """Non-scalar method_kwargs values (raw JSON lists/objects) are the
    client's error: 400 at session creation, not a TypeError at the first
    /batch dispatch (the options are jit cache keys, so they must be
    hashable scalars)."""
    code, r = _req(f"{server}/sessions", "POST",
                   {"method_kwargs": {"pool_size": [16, 32]}})
    assert code == 400
    assert "scalar" in r["error"]


def test_http_session_method_kwargs_unknown_rejected(server):
    """A typo'd per-session option name is the client's error -> 400 with the
    offending name, NOT a silent drop that leaves the session running the
    full-corpus scan while the client believes it is pool-restricted."""
    code, r = _req(f"{server}/sessions", "POST",
                   {"method_kwargs": {"pool_siez": 12}})
    assert code == 400
    assert "pool_siez" in r["error"]


def test_batch_select_duplicate_ids_no_deadlock(server):
    """Duplicate session ids in the group must not re-acquire the same
    per-session lock (code-review round 3: reproduced permanent deadlock)."""
    _, r = _req(f"{server}/sessions", "POST", {})
    sid = r["session_id"]
    _req(f"{server}/sessions/{sid}/query", "POST", {"index": 12})
    code, r = _req(f"{server}/batch_select", "POST",
                   {"session_ids": [sid, sid], "k": 2})
    assert code == 200 and len(r["batches"][sid]) == 2
    # The session is still usable afterwards (lock released).
    code, r = _req(f"{server}/sessions/{sid}/batch?k=2")
    assert code == 200


def test_cohort_chunking_matches_unchunked(server, monkeypatch):
    """HBM-budget chunking (ITAL_TPU_COHORT_STATE_BYTES) splits oversized
    cohort groups into several stacked programs with IDENTICAL per-session
    results.  The knob exists because the unchunked 8-session batch_feedback
    RESOURCE_EXHAUSTED on the chip at 1M x 512 (stacked update holds ~3
    copies of the (k, cap, N) whitened buffer) while the same cohort's
    batch_select ran — results/serve_throughput_corpus1m log, 2026-08-19."""
    def make(q):
        _, r = _req(f"{server}/sessions", "POST", {})
        sid = r["session_id"]
        _req(f"{server}/sessions/{sid}/query", "POST", {"index": q})
        _req(f"{server}/sessions/{sid}/feedback", "POST",
             {"labels": {str((q + 13) % 120): 1, str((q + 41) % 120): 1,
                         str((q + 67) % 120): -1, str((q + 95) % 120): -1}})
        return sid

    queries = (2, 29, 51, 76, 103)
    chunked = [make(q) for q in queries]
    twins = [make(q) for q in queries]

    # cap=32, N=120: one stacked-select copy is 32*120*4 = 15360 B/session.
    # Budget for exactly 2 sessions per select program -> 3 chunks of (2,2,1).
    monkeypatch.setenv("ITAL_TPU_COHORT_STATE_BYTES", str(2 * 32 * 120 * 4))
    code, r = _req(f"{server}/batch_select", "POST",
                   {"session_ids": chunked, "k": 3})
    assert code == 200
    monkeypatch.delenv("ITAL_TPU_COHORT_STATE_BYTES")
    code2, r2 = _req(f"{server}/batch_select", "POST",
                     {"session_ids": twins, "k": 3})
    assert code2 == 200
    for sc, st in zip(chunked, twins):
        assert r["batches"][sc] == r2["batches"][st]

    # Update chunking: ~3 copies/session -> budget for 2 sessions/program.
    labels = [{str((q + 7) % 120): 1, str((q + 88) % 120): -1}
              for q in queries]
    monkeypatch.setenv("ITAL_TPU_COHORT_STATE_BYTES",
                       str(2 * 3 * 32 * 120 * 4))
    code, r = _req(f"{server}/batch_feedback", "POST",
                   {"feedback": dict(zip(chunked, labels))})
    assert code == 200
    monkeypatch.delenv("ITAL_TPU_COHORT_STATE_BYTES")
    code2, r2 = _req(f"{server}/batch_feedback", "POST",
                     {"feedback": dict(zip(twins, labels))})
    assert code2 == 200
    for sc, st in zip(chunked, twins):
        assert r["sessions"][sc] == r2["sessions"][st]
        _, rc = _req(f"{server}/sessions/{sc}/ranking?k=15")
        _, rt = _req(f"{server}/sessions/{st}/ranking?k=15")
        assert rc["top"] == rt["top"]
        np.testing.assert_allclose(rc["scores"], rt["scores"], atol=1e-4)
