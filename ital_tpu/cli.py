"""Installed-package entry point (``ital-tpu`` console script).

Thin wrapper over the repo-root ``run_experiment.py`` so the framework behaves
the same whether run from a checkout or an installed wheel.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="ital-tpu",
        description="Run a simulated-feedback retrieval/regression experiment.",
    )
    parser.add_argument("config", nargs="?", default=None, help=".ini config file")
    parser.add_argument("overrides", nargs="*", help="SECTION.key=value overrides")
    parser.add_argument("--list-strategies", action="store_true")
    parser.add_argument("--list-datasets", action="store_true")
    args = parser.parse_args(argv)

    # With no config file given, argparse binds the first SECTION.key=value
    # override to the optional ``config`` positional; reinterpret it so
    # ``ital-tpu EXPERIMENT.method=ital`` means defaults + override.
    if args.config and "=" in args.config and "." in args.config.split("=", 1)[0]:
        args.overrides = [args.config, *args.overrides]
        args.config = None

    if args.list_strategies:
        from ital_tpu.select import STRATEGIES

        print("\n".join(sorted(STRATEGIES)))
        return 0
    if args.list_datasets:
        from ital_tpu.data.datasets import _FACTORIES

        print("\n".join(sorted(_FACTORIES)))
        return 0

    from ital_tpu.runner import run_experiment, run_regression_experiment
    from ital_tpu.utils.config import load_config

    cfg = load_config(args.config, tuple(args.overrides))
    if cfg.task == "regression":
        result = run_regression_experiment(cfg)
        print(f"# dataset={result['dataset']} method={result['method']}")
        print("round  RMSE")
        for rnd, m in enumerate(result["mean_rmse"]):
            print(f"{rnd + 1:5d}  {m:.4f}")
        return 0

    result = run_experiment(cfg)
    print(f"# dataset={result['dataset']} method={result['method']} "
          f"sessions={len(result['sessions'])}")
    print(f"# mean select {result['select_ms']:.2f} ms/round, "
          f"update+rank+AP {result['update_ms']:.2f} ms/round")
    print("round  MAP")
    for rnd, m in enumerate(result["map"]):
        print(f"{rnd + 1:5d}  {m:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
