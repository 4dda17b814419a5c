#!/usr/bin/env python
"""Plot MAP-vs-rounds curves from experiment logs or result records.

Reference parity: the reference's result-plotting script (SURVEY.md C8).
Accepts, per input file:

- runner JSONL (``log_jsonl``) — AP aggregated per round;
- result-record JSON (``results/*.json`` from ``scripts/run_scenarios.py`` /
  ``scripts/method_comparison.py``) — the ``map`` curve, with a shaded
  ``map_std`` band when present (the multi-seed records of round 3); method-
  comparison files (one record per method) expand into one curve per method.

::

    python plot_results.py out/ital.jsonl results/mirflickr_methods.json -o map.png
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys


def load_curve(path: str):
    """Aggregate AP per round from either JSONL schema: per-round records
    (``round``/``ap``, serial and per-round modes) or per-session records
    (``ap_curve``, fused modes)."""
    per_round = collections.defaultdict(list)
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if "ap_curve" in rec:
                for rnd, ap in enumerate(rec["ap_curve"]):
                    per_round[rnd].append(ap)
            elif "round" in rec and "ap" in rec:
                per_round[rec["round"]].append(rec["ap"])
    rounds = sorted(per_round)
    return [r + 1 for r in rounds], [
        sum(per_round[r]) / len(per_round[r]) for r in rounds
    ]


def load_records(path: str, base_label: str):
    """(label, rounds, map, map_std|None) series from one input file.

    Result-record JSONs yield one series per method (or one for a scenario
    record); JSONL logs yield a single aggregated series with no band.
    """
    try:
        with open(path) as fh:
            doc = json.load(fh)  # one JSON document = a result record
    except json.JSONDecodeError:  # multiple documents = runner JSONL
        rounds, curve = load_curve(path)
        return [(base_label, rounds, curve, None)]
    if "map" in doc:  # one scenario record
        doc = {base_label: doc}
    series = []
    for name, rec in doc.items():
        if not isinstance(rec, dict) or "map" not in rec:
            continue  # skip _note/metadata entries
        curve = rec["map"]
        series.append((name, list(range(1, len(curve) + 1)),
                       curve, rec.get("map_std")))
    if not series:  # e.g. a one-line JSONL parses as a single JSON object
        rounds, curve = load_curve(path)
        return [(base_label, rounds, curve, None)]
    return series


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("logs", nargs="+", help="JSONL files from the runner")
    parser.add_argument("-o", "--out", default="map_vs_rounds.png")
    parser.add_argument("--title", default="MAP over feedback rounds")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    many_files = len(args.logs) > 1
    for path in args.logs:
        base = os.path.splitext(os.path.basename(path))[0]
        for label, rounds, curve, std in load_records(path, base):
            if many_files and label != base:
                label = f"{label} [{base}]"  # disambiguate across files
            (line,) = ax.plot(rounds, curve, marker="o", markersize=3,
                              label=label)
            if std:  # multi-seed record: shade +/- one cross-seed std
                lo = [m - s for m, s in zip(curve, std)]
                hi = [m + s for m, s in zip(curve, std)]
                ax.fill_between(rounds, lo, hi, color=line.get_color(),
                                alpha=0.15, linewidth=0)
    ax.set_xlabel("feedback round")
    ax.set_ylabel("MAP")
    ax.set_title(args.title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
