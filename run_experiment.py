#!/usr/bin/env python
"""CLI entry point: run a simulated-feedback retrieval experiment.

Reference parity: ``run_experiment.py`` at the reference repo root (SURVEY.md
L5) — same UX: an .ini config plus ``SECTION.key=value`` overrides::

    python run_experiment.py configs/toy.ini
    python run_experiment.py configs/usps.ini EXPERIMENT.method=uncertainty_sampling

Delegates to :mod:`ital_tpu.cli` (the same logic backs the installed
``ital-tpu`` console script).
"""

import sys

from ital_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
