#!/usr/bin/env python
"""Plot MAP-vs-rounds curves from experiment JSONL logs.

Reference parity: the reference's result-plotting script (SURVEY.md C8).
Reads one or more JSONL files written by the runner (``log_jsonl``), aggregates
AP per round per file, and writes a MAP-vs-rounds figure::

    python plot_results.py out/ital.jsonl out/random.jsonl -o map.png
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
    for path in args.logs:
        rounds, curve = load_curve(path)
        label = os.path.splitext(os.path.basename(path))[0]
        ax.plot(rounds, curve, marker="o", markersize=3, label=label)
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
