#!/usr/bin/env bash
# BASELINE.json config 3: the baseline parity suite on the digit corpus.
# Runs each selector with identical seeds, logs JSONL per method, and renders
# the MAP-vs-rounds comparison plot.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-out/parity}"
mkdir -p "$out"
for m in uncertainty_sampling borderline_sampling variance_sampling random ital; do
  echo "== $m"
  rm -f "$out/$m.jsonl"  # JsonlLogger appends; stale rounds would skew the plot
  python run_experiment.py configs/parity_suite.ini \
      EXPERIMENT.method="$m" EXPERIMENT.log_jsonl="$out/$m.jsonl"
done
python plot_results.py "$out"/*.jsonl -o "$out/parity.png" \
    --title "Baseline parity suite (digits)"
echo "wrote $out/parity.png"
