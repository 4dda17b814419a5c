#!/usr/bin/env python
"""Regenerate the round-4 study figures from their result records.

Checked-in generator (the round-3 verdict flagged figures without one):

- ``results/pool_tradeoff.png`` from ``results/pool_sweep.json`` (timing:
  ms/round vs candidate-pool size, pipeline-slope protocol on the chip) and
  ``results/pool_tradeoff.json`` (quality: 8-seed MAP curves per pool).
- ``results/refine_study.png`` from ``results/refine_study.json`` (two-stage
  scoring: coarse-scan n_qmc + top-T refinement — timing and 8-seed MAP).
- ``results/pool_refine.png`` from ``results/pool_refine.json`` (the COMBINED
  production config: compact pool x two-stage — timing anchors and the paired
  8-seed MAP comparison at standard and heavy user noise).

Each figure pairs the speed panel with the quality panel so the knob's
tradeoff is one glance. Usage::

    python scripts/plot_studies.py            # writes every PNG whose record exists
    python scripts/plot_studies.py --only pool
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")

# Fixed categorical order (entity -> hue, never cycled): the same config
# keeps its color across both panels and both figures.
PALETTE = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#9c6b4e"]


def _map_panel(ax, records, order, colors, title):
    """MAP-vs-round curves with +/- one cross-seed std bands."""
    for name, color in zip(order, colors):
        rec = records[name]
        curve = rec["map"]
        rounds = list(range(1, len(curve) + 1))
        ax.plot(rounds, curve, marker="o", markersize=3, color=color,
                label=name, linewidth=2)
        std = rec.get("map_std")
        if std:
            lo = [m - s for m, s in zip(curve, std)]
            hi = [m + s for m, s in zip(curve, std)]
            ax.fill_between(rounds, lo, hi, color=color, alpha=0.15,
                            linewidth=0)
    n_seeds = max(len(records[n].get("seeds", [])) for n in order)
    ax.set_xlabel("feedback round")
    ax.set_ylabel(f"MAP (mean of {n_seeds} seeds, band = ±1 std)")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend(frameon=False)


def plot_pool_tradeoff():
    with open(os.path.join(RESULTS, "pool_sweep.json")) as fh:
        sweep = json.load(fh)
    with open(os.path.join(RESULTS, "pool_tradeoff.json")) as fh:
        quality = json.load(fh)

    fig, (ax_t, ax_q) = plt.subplots(1, 2, figsize=(11, 4.2))

    # Timing: one line per corpus size, pool size on a log x-axis ("full"
    # plotted at the corpus size itself).
    for (key, label), color in zip(
            [("mirflickr25k", "MIRFLICKR 25k"), ("corpus100k", "corpus 100k")],
            PALETTE):
        block = sweep[key]
        xs, ys = [], []
        for pool, rec in block["pools"].items():
            xs.append(block["n"] if pool == "full" else int(pool))
            ys.append(rec["ms_per_round"])
        xs, ys = zip(*sorted(zip(xs, ys)))
        ax_t.plot(xs, ys, marker="o", markersize=5, color=color, label=label,
                  linewidth=2)
        ax_t.annotate("full", (xs[-1], ys[-1]), textcoords="offset points",
                      xytext=(0, 7), ha="center", fontsize=8, color="#555")
    ax_t.set_xscale("log")
    ax_t.set_xlabel("candidate pool size (log)")
    ax_t.set_ylabel("selection ms/round (pipeline slope)")
    ax_t.set_title("Compact-pool scan: cost scales with the pool")
    ax_t.grid(True, alpha=0.3)
    ax_t.legend(frameon=False)

    order = [k for k in ("full", "16384", "4096", "1024") if k in quality]
    labels = {"full": "full corpus", "16384": "pool 16384",
              "4096": "pool 4096", "1024": "pool 1024"}
    recs = {labels[k]: quality[k] for k in order}
    _map_panel(ax_q, recs, [labels[k] for k in order], PALETTE,
               "MAP vs pool size (MIRFLICKR scenario)")

    fig.tight_layout()
    out = os.path.join(RESULTS, "pool_tradeoff.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def plot_refine_study():
    with open(os.path.join(RESULTS, "refine_study.json")) as fh:
        study = json.load(fh)

    fig, (ax_t, ax_q) = plt.subplots(1, 2, figsize=(11, 4.2))

    configs = list(study["map"].keys())  # fixed insertion order from the study
    colors = PALETTE[: len(configs)]

    # Timing: grouped horizontal bars per corpus, one hue per config (same
    # hue carries the config into the MAP panel).
    corpora = [("mirflickr25k", "25k"), ("corpus100k", "100k")]
    height = 0.8 / len(configs)
    for ci, (cfg, color) in enumerate(zip(configs, colors)):
        ys, xs = [], []
        for gi, (key, _) in enumerate(corpora):
            rec = study["timing"][key]["configs"].get(cfg)
            if rec is None:
                continue
            ys.append(gi + (ci - (len(configs) - 1) / 2) * height)
            xs.append(rec["ms_per_round"])
        bars = ax_t.barh(ys, xs, height=height * 0.9, color=color, label=cfg)
        for bar, x in zip(bars, xs):
            ax_t.annotate(f"{x:.2f}", (x, bar.get_y() + bar.get_height() / 2),
                          textcoords="offset points", xytext=(4, 0),
                          va="center", fontsize=8, color="#333")
    max_ms = max(rec["ms_per_round"] for key, _ in corpora
                 for rec in study["timing"][key]["configs"].values())
    ax_t.set_xlim(0, max_ms * 1.18)  # headroom for the value labels
    ax_t.set_yticks(range(len(corpora)))
    ax_t.set_yticklabels([f"corpus {lbl}" for _, lbl in corpora])
    ax_t.invert_yaxis()
    ax_t.set_xlabel("selection ms/round (pipeline slope)")
    ax_t.set_title("Two-stage scoring: coarse n_qmc + top-T refine")
    ax_t.grid(True, alpha=0.3, axis="x")
    ax_t.legend(frameon=False, fontsize=8)

    _map_panel(ax_q, study["map"], configs, colors,
               "MAP is config-insensitive (quality held)")

    fig.tight_layout()
    out = os.path.join(RESULTS, "refine_study.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def _plot_pool_refine_quality(ax_q, study):
    """Quality panel: the combined config vs the full-fidelity reference,
    both noise regimes on one axis (solid = standard, dashed = heavy)."""
    drawn = False
    for key, suffix, dash in (("map", " (standard)", "-"),
                              ("map_heavy", " (heavy noise)", "--")):
        block = study.get(key)
        if not block:
            continue
        names = [n for n in block if n != "paired"]
        for name, color in zip(names, PALETTE):
            rec = block[name]
            curve = rec["map"]
            rounds = list(range(1, len(curve) + 1))
            ax_q.plot(rounds, curve, dash, marker="o", markersize=3,
                      color=color, linewidth=2, label=name + suffix)
            std = rec.get("map_std")
            if std:
                lo = [m - s for m, s in zip(curve, std)]
                hi = [m + s for m, s in zip(curve, std)]
                ax_q.fill_between(rounds, lo, hi, color=color, alpha=0.12,
                                  linewidth=0)
        drawn = True
        paired = block.get("paired")
        if paired:
            y = 0.03 if key == "map" else 0.10
            ax_q.text(0.02, y,
                      f"{suffix.strip(' ()')}: paired Δ "
                      f"{paired['delta_mean']:+.4f}, "
                      f"{paired['wins']}/{len(paired['delta_by_seed'])} wins, "
                      f"t={paired['t_stat']:.2f}",
                      transform=ax_q.transAxes, fontsize=8, color="#333")
    if drawn:
        n_seeds = len(next(iter(study.get("map", study.get("map_heavy"))
                                .values()))["seeds"])
        ax_q.set_xlabel("feedback round")
        ax_q.set_ylabel(f"MAP (mean of {n_seeds} seeds, band = ±1 std)")
        ax_q.set_title("Combined config holds MAP in both noise regimes")
        ax_q.grid(True, alpha=0.3)
        ax_q.legend(frameon=False, fontsize=8)
    else:
        ax_q.set_axis_off()
        ax_q.text(0.5, 0.5, "no MAP block recorded yet\n"
                  "(scripts/pool_refine.py --map --map-heavy)",
                  ha="center", va="center", fontsize=9, color="#666")


def _flagship_figure(files_titles, out_png, ital_label, missing_hint,
                     methods=("ital", "uncertainty_sampling")):
    """Two-panel (standard/heavy noise) flagship-ordering figure with the
    paired final-round delta annotated per panel."""
    panels = []
    for fname, title in files_titles:
        path = os.path.join(RESULTS, fname)
        if os.path.exists(path):
            with open(path) as fh:
                panels.append((json.load(fh), title))
    if not panels:
        print(missing_hint, file=sys.stderr)
        return

    fig, axes = plt.subplots(1, len(panels), figsize=(6 * len(panels), 4.4),
                             squeeze=False)
    labels = {"ital": ital_label,
              "uncertainty_sampling": "uncertainty sampling",
              "random": "random"}
    for ax, (record, title) in zip(axes[0], panels):
        recs = {labels[m]: record[m] for m in methods if m in record}
        _map_panel(ax, recs, list(recs), PALETTE, title)
        import numpy as np
        i = np.asarray(record["ital"]["final_map_by_seed"])
        u = np.asarray(record["uncertainty_sampling"]["final_map_by_seed"])
        d = i - u
        sd = d.std(ddof=1)
        t = float(d.mean() / (sd / np.sqrt(len(d)))) if sd > 0 else 0.0
        ax.text(0.02, 0.03,
                f"paired final Δ {d.mean():+.4f}, "
                f"{int((d > 0).sum())}/{len(d)} wins, t={t:.1f}",
                transform=ax.transAxes, fontsize=8, color="#333")

    fig.tight_layout()
    out = os.path.join(RESULTS, out_png)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def plot_flagship_production():
    """MAP curves of the flagship ordering at the PRODUCTION config
    (NOISE_ANALYSIS Finding 5): ital (pool 4096 + two-stage) vs uncertainty
    sampling, standard and heavy user noise side by side."""
    _flagship_figure(
        (("mirflickr_methods_italpool.json",
          "standard noise (lp=.8/mp=.05)"),
         ("mirflickr_methods_heavynoise_italpool.json",
          "heavy noise (lp=.6/mp=.15)")),
        "flagship_production.png",
        "ital (production: pool 4096 + two-stage)",
        "no flagship-production records yet "
        "(scripts/method_comparison.py --ital-kwargs ...)",
    )


def plot_flagship_digits():
    """The flagship ordering on REAL (non-surrogate) data: scikit-learn's
    bundled digits corpus (method_comparison.py --dataset digits), both user
    -noise regimes, random included for context."""
    _flagship_figure(
        (("digits_methods.json", "digits — standard noise (lp=.8/mp=.05)"),
         ("digits_methods_heavynoise.json",
          "digits — heavy noise (lp=.6/mp=.15)")),
        "flagship_digits.png",
        "ital",
        "no digits records yet "
        "(scripts/method_comparison.py --dataset digits [--heavy])",
        methods=("ital", "uncertainty_sampling", "random"),
    )


def plot_pool_refine():
    chip_path = os.path.join(RESULTS, "pool_refine.json")
    if os.path.exists(chip_path):
        with open(chip_path) as fh:
            study = json.load(fh)
    else:
        # Tunnel-outage fallback: the CPU-backend MAP-only record
        # (PROFILE.md section 10) — quality panel only, timing chip-pending.
        with open(os.path.join(RESULTS, "pool_refine_map_cpu.json")) as fh:
            study = json.load(fh)

    fig, (ax_t, ax_q) = plt.subplots(1, 2, figsize=(12, 4.4))

    if "timing" not in study:
        ax_t.set_axis_off()
        ax_t.text(0.5, 0.5, "timing rows chip-pending\n"
                  "(tunnel outage — scripts/pool_refine.py on the chip)",
                  ha="center", va="center", fontsize=9, color="#666")
        _plot_pool_refine_quality(ax_q, study)
        fig.tight_layout()
        out = os.path.join(RESULTS, "pool_refine.png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")
        return

    # Timing: grouped horizontal bars per corpus — the combined config read
    # against its single-lever anchors, all measured in one chip session.
    configs = list(study["timing"]["mirflickr25k"]["configs"])
    colors = PALETTE[: len(configs)]
    corpora = [(k, l) for k, l in (("mirflickr25k", "25k"),
                                   ("corpus100k", "100k"))
               if k in study["timing"]]
    height = 0.8 / len(configs)
    for ci, (cfg, color) in enumerate(zip(configs, colors)):
        ys, xs = [], []
        for gi, (key, _) in enumerate(corpora):
            rec = study["timing"][key]["configs"].get(cfg)
            if rec is None:
                continue
            ys.append(gi + (ci - (len(configs) - 1) / 2) * height)
            xs.append(rec["ms_per_round"])
        bars = ax_t.barh(ys, xs, height=height * 0.9, color=color, label=cfg)
        for bar, x in zip(bars, xs):
            ax_t.annotate(f"{x:.2f}", (x, bar.get_y() + bar.get_height() / 2),
                          textcoords="offset points", xytext=(4, 0),
                          va="center", fontsize=8, color="#333")
    max_ms = max(rec["ms_per_round"] for key, _ in corpora
                 for rec in study["timing"][key]["configs"].values())
    ax_t.set_xlim(0, max_ms * 1.18)
    ax_t.set_yticks(range(len(corpora)))
    ax_t.set_yticklabels([f"corpus {lbl}" for _, lbl in corpora])
    ax_t.invert_yaxis()
    ax_t.set_xlabel("selection ms/round (pipeline slope)")
    ax_t.set_title("Pool x two-stage: combined vs single-lever anchors")
    ax_t.grid(True, alpha=0.3, axis="x")
    ax_t.legend(frameon=False, fontsize=8)

    _plot_pool_refine_quality(ax_q, study)

    fig.tight_layout()
    out = os.path.join(RESULTS, "pool_refine.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def plot_hyperopt_rescue():
    """NOISE_ANALYSIS Finding 7: does REGULARIZED hyperparameter learning
    (MAP type-II prior / noise floor) rescue the misspecified GP noise init
    (1.0) under heavy label noise, where plain type-II ML fails (Finding 4)?

    Panel A: ital MAP curves across the five estimator configs (all CPU
    backend — ordering claims pair within one backend).  Panel B: the
    flagship ital-vs-uncertainty ordering for the best regularized config,
    paired stats annotated."""
    base = "mirflickr_methods_heavynoise_gpnoise1"
    configs = [
        (f"{base}_cpu.json", "noise=1.0 fixed (no learning)"),
        (f"{base}_learn2_cpu.json", "learn (plain type-II ML, Finding 4)"),
        (f"{base}_learn2_prior_strength1.0.json", "learn + prior (s=1)"),
        (f"{base}_learn2_noise_floor0.05.json", "learn + floor (0.05)"),
        (f"{base}_learn2_prior_strength1.0-noise_floor0.05.json",
         "learn + prior + floor"),
    ]
    loaded = []
    for fname, label in configs:
        path = os.path.join(RESULTS, fname)
        if os.path.exists(path):
            with open(path) as fh:
                loaded.append((label, fname, json.load(fh)))
    if len(loaded) < 2:
        print("not enough hyperopt-rescue records yet "
              "(scripts/method_comparison.py --heavy --gp-noise 1.0 "
              "--learn-every 2 --gp-overrides ...)", file=sys.stderr)
        return

    import numpy as np

    fig, (ax_a, ax_b) = plt.subplots(1, 2, figsize=(12, 4.4))
    recs = {label: rec["ital"] for label, _, rec in loaded}
    _map_panel(ax_a, recs, list(recs), PALETTE,
               "ital under misspecified GP noise init 1.0 (heavy user noise)")

    regularized = [e for e in loaded if "prior" in e[0] or "floor" in e[0]]
    if regularized:
        label, _, best = max(
            regularized, key=lambda e: e[2]["ital"]["map"][-1]
        )
        pair = {f"ital ({label})": best["ital"],
                "uncertainty sampling": best["uncertainty_sampling"]}
        _map_panel(ax_b, pair, list(pair), [PALETTE[0], PALETTE[2]],
                   "flagship ordering, best regularized config")
        i = np.asarray(best["ital"]["final_map_by_seed"])
        u = np.asarray(best["uncertainty_sampling"]["final_map_by_seed"])
        d = i - u
        sd = d.std(ddof=1)
        t = float(d.mean() / (sd / np.sqrt(len(d)))) if sd > 0 else 0.0
        ax_b.text(0.02, 0.03,
                  f"paired final Δ {d.mean():+.4f}, "
                  f"{int((d > 0).sum())}/{len(d)} wins, t={t:.1f}",
                  transform=ax_b.transAxes, fontsize=8, color="#333")

    fig.tight_layout()
    out = os.path.join(RESULTS, "hyperopt_rescue.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def plot_regression_learning():
    """Hyperparameter learning on the regression task (the well-specified
    counterpart of NOISE_ANALYSIS Finding 4): RMSE-vs-round curves for the
    fixed-wrong / learned / well-specified configs, ±1 cross-seed std."""
    path = os.path.join(RESULTS, "regression_learning.json")
    if not os.path.exists(path):
        print("no results/regression_learning.json yet "
              "(scripts/regression_learning_study.py)", file=sys.stderr)
        return
    with open(path) as fh:
        record = json.load(fh)

    import numpy as np

    labels = {
        "fixed_wrong": "noise=1.0 fixed (20x wrong)",
        "learned": "noise=1.0 + learn_every=2",
        "well_specified": "noise=0.05 (well-specified floor)",
    }
    fig, ax = plt.subplots(figsize=(6.5, 4.4))
    for (name, cfg), color in zip(record["configs"].items(), PALETTE):
        curves = np.asarray(list(cfg["rmse_curves_by_seed"].values()))
        rounds = np.arange(1, curves.shape[1] + 1)
        mean, std = curves.mean(0), curves.std(0)
        ax.plot(rounds, mean, marker="o", markersize=3, linewidth=2,
                color=color, label=labels.get(name, name))
        ax.fill_between(rounds, mean - std, mean + std, color=color,
                        alpha=0.15, linewidth=0)
    p = record["paired_fixed_minus_learned"]
    ax.text(0.02, 0.03,
            f"paired final Δ(fixed−learned) {p['mean']:+.4f}, "
            f"{p['wins']}/{p['n']} wins, t={p['t']}",
            transform=ax.transAxes, fontsize=8, color="#333")
    ax.set_xlabel("feedback round")
    ax.set_ylabel(f"corpus RMSE (mean of {p['n']} seeds, band = ±1 std)")
    ax.set_title("GP regression: type-II ML recovers a misspecified noise")
    ax.grid(True, alpha=0.3)
    ax.legend(frameon=False)
    fig.tight_layout()
    out = os.path.join(RESULTS, "regression_learning.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--only", choices=["pool", "refine", "pool_refine",
                                           "flagship", "digits", "rescue",
                                           "regression"])
    args = parser.parse_args(argv)
    if args.only in (None, "pool"):
        plot_pool_tradeoff()
    if args.only in (None, "refine"):
        plot_refine_study()
    if args.only in (None, "pool_refine"):
        if (os.path.exists(os.path.join(RESULTS, "pool_refine.json"))
                or os.path.exists(os.path.join(RESULTS,
                                               "pool_refine_map_cpu.json"))):
            plot_pool_refine()
        elif args.only == "pool_refine":
            print("results/pool_refine.json not recorded yet "
                  "(scripts/pool_refine.py)", file=sys.stderr)
            return 1
    if args.only in (None, "flagship"):
        plot_flagship_production()
    if args.only in (None, "digits"):
        plot_flagship_digits()
    if args.only in (None, "rescue"):
        plot_hyperopt_rescue()
    if args.only in (None, "regression"):
        plot_regression_learning()
    return 0


if __name__ == "__main__":
    sys.exit(main())
