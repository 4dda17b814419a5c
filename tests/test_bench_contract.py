"""bench.py driver contract: recorded denominator + output schema (no TPU)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_recorded_cpu_denominator_is_used():
    sys.path.insert(0, REPO)
    import bench

    ms = bench.recorded_cpu_ms()
    # results/cpu_full_round.json is committed: the measured full-fidelity
    # round must be picked up (93.21 s ideal-16-way credit).
    assert ms is not None and 50_000 < ms < 200_000, ms


def test_recorded_denominator_matches_json():
    with open(os.path.join(REPO, "results", "cpu_full_round.json")) as fh:
        rec = json.load(fh)
    sys.path.insert(0, REPO)
    import bench

    assert bench.recorded_cpu_ms() == rec["ideal_16way_round_s"] * 1e3
    # The recording is a genuine full-fidelity round: all four greedy steps
    # timed, single-core total equals their sum (kernel build excluded).
    assert len(rec["step_s"]) == rec["batch_size"] == 4
    assert abs(sum(rec["step_s"]) - rec["full_round_single_core_s"]) < 1.0
