"""On-device AP / recall@k vs sklearn and the NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import average_precision_score

from ital_tpu.utils.metrics import average_precision, recall_at_k
from tests.oracle.numpy_oracle import average_precision as oracle_ap


def test_ap_matches_sklearn(rng):
    for _ in range(5):
        scores = rng.normal(size=200).astype(np.float32)
        rel = rng.random(200) < 0.2
        if not rel.any():
            continue
        ours = float(average_precision(jnp.asarray(scores), jnp.asarray(rel)))
        ref = average_precision_score(rel, scores)
        assert ours == pytest.approx(ref, abs=1e-5)


def test_ap_with_exclusion_matches_oracle(rng):
    scores = rng.normal(size=100).astype(np.float32)
    rel = rng.random(100) < 0.3
    rel[7] = True
    excl = np.zeros(100, bool)
    excl[7] = True
    ours = float(
        average_precision(jnp.asarray(scores), jnp.asarray(rel), jnp.asarray(excl))
    )
    ref = oracle_ap(rel, scores, exclude=[7])
    assert ours == pytest.approx(ref, abs=1e-5)


def test_recall_at_k():
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1, 0.05])
    rel = jnp.asarray([True, False, True, True, False])
    assert float(recall_at_k(scores, rel, 3)) == pytest.approx(2 / 3)
