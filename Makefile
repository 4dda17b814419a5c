# Convenience targets; see README.md for details.
.PHONY: test bench scenarios parity toy

test:
	python -m pytest tests/ -q

bench:
	python bench.py

scenarios:
	python scripts/run_scenarios.py

parity:
	bash scripts/parity_suite.sh

toy:
	python run_experiment.py configs/toy.ini
