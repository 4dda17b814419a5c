#!/usr/bin/env bash
# BASELINE.json config 3: the baseline parity suite on the digit corpus.
# Single-process runner (one JAX startup/device lease for all five methods);
# see scripts/parity_suite.py for details.
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/parity_suite.py "${1:-out/parity}"
